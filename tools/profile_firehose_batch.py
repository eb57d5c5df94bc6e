import os, sys, time, tempfile, shutil
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
from storm_dynamic_spout_spark.engine import EngineConfig, build_session
cfg = EngineConfig({"spark.master": "local[32]", "spark.shuffle_partitions": 32})
spark = build_session(cfg)
spark.sparkContext.setLogLevel("ERROR")
from storm_dynamic_spout_spark.streaming import FileTopic, FilterChain, Firehose
from storm_dynamic_spout_spark.streaming import firehose as fhmod
from storm_dynamic_spout_spark.streaming.sideline import SidelineController

orig_pb = Firehose._process_batch
def timed_pb(self, batch_df, batch_id):
    t0 = time.perf_counter()
    chain = self._refresh_chain()
    t1 = time.perf_counter()
    kept = chain.keep(batch_df)
    fhmod.write_sink_batch(kept, self.output_dir)
    t2 = time.perf_counter()
    self.recorder.count("firehose.batches")
    if self.on_batch is not None: self.on_batch(batch_id)
    print(f"  batch {batch_id}: refresh={t1-t0:.3f} write={t2-t1:.3f}")
Firehose._process_batch = timed_pb

def drain(n_records, n_batches):
    d = tempfile.mkdtemp(prefix="fhprof-")
    topic = FileTopic(os.path.join(d, "t"), num_partitions=32)
    per = n_records // n_batches
    for _ in range(n_batches):
        topic.append((f"k{i % 997}", f"v{i}") for i in range(per))
    ctl = SidelineController(topic, FilterChain(), os.path.join(d, "s"))
    fh = Firehose(spark, topic, ctl, os.path.join(d, "out"), os.path.join(d, "ck"))
    t0 = time.perf_counter()
    fh.start(max_files_per_trigger=1)
    fh.process_all_available()
    total = time.perf_counter() - t0
    fh.stop(); shutil.rmtree(d, ignore_errors=True)
    return total

drain(200, 1)
print("total:", round(drain(100_000, 4), 2))
spark.stop()
