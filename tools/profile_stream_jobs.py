import sys, tempfile, time
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
from pyspark.sql import functions as F
from storm_dynamic_spout_spark.engine import EngineConfig, build_session
from storm_dynamic_spout_spark.streaming.bm25_stream import StreamingBm25Index
from storm_dynamic_spout_spark.streaming.state_report import state_table_report

cfg = EngineConfig({"spark.master": "local[8]", "spark.shuffle_partitions": 8})
spark = build_session(cfg)
spark.sparkContext.setLogLevel("ERROR")
jid = lambda: spark.sparkContext._jsc.sc().dagScheduler().nextJobId()

d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").select("doc_id", "text")
idx = StreamingBm25Index(tempfile.mkdtemp(prefix="srj-"))
for name, fn in [
    ("batch1 ", lambda: idx.process_batch(d.filter(F.col("doc_id") % 2 == 0))),
    ("batch2 ", lambda: idx.process_batch(d.filter(F.col("doc_id") % 2 == 1))),
    ("compact", lambda: idx.compact_index(spark, target_files=1)),
    ("report ", lambda: state_table_report(spark, {"postings": idx.postings_dir, "stats": idx.stats_dir, "df": idx.df_dir}, compact_threshold=1).collect()),
]:
    j0, t0 = jid(), time.perf_counter()
    fn()
    print(f"{name} jobs={jid()-j0:3d} wall={time.perf_counter()-t0:.2f}s")
spark.stop()
