import os, sys, time, tempfile, shutil
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
from storm_dynamic_spout_spark.engine import EngineConfig, build_session

cpus = sys.argv[1]
cfg = EngineConfig({"spark.master": f"local[{cpus}]", "spark.shuffle_partitions": int(cpus)})
spark = build_session(cfg)
spark.sparkContext.setLogLevel("ERROR")

from storm_dynamic_spout_spark.streaming import FileTopic, FilterChain, Firehose
from storm_dynamic_spout_spark.streaming.sideline import SidelineController

def drain(n_records, n_batches):
    d = tempfile.mkdtemp(prefix="fhprof-")
    topic = FileTopic(os.path.join(d, "t"), num_partitions=32)
    per = n_records // n_batches
    for _ in range(n_batches):
        topic.append((f"k{i % 997}", f"v{i}") for i in range(per))
    stamps = []
    ctl = SidelineController(topic, FilterChain(), os.path.join(d, "s"))
    fh = Firehose(spark, topic, ctl, os.path.join(d, "out"), os.path.join(d, "ck"),
                  on_batch=lambda b: stamps.append((b, time.perf_counter())))
    t0 = time.perf_counter()
    fh.start(max_files_per_trigger=1)
    fh.process_all_available()
    total = time.perf_counter() - t0
    fh.stop()
    shutil.rmtree(d, ignore_errors=True)
    rel = [f"b{b}@{ts-t0:.2f}" for b, ts in stamps]
    return total, rel

drain(200, 1)  # warmup
for _ in range(3):
    total, rel = drain(100_000, 4)
    print(f"cpus={cpus} total={total:.2f} batches={rel}")
spark.stop()
