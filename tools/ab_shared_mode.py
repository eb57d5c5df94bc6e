"""Interleaved A/B: localCheckpoint(eager=False) vs persist(MEMORY_AND_DISK)
as the shared-subtree mechanism, per r15 verdict item 4."""
import sys, time
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel
from storm_dynamic_spout_spark.engine import EngineConfig, build_session
from storm_dynamic_spout_spark.queries import QUERIES

cfg = EngineConfig({"spark.master": "local[32]", "spark.shuffle_partitions": 32})
spark = build_session(cfg)
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.1"
real_lc = DataFrame.localCheckpoint

def as_persist(self, eager=False):
    out = self.persist(StorageLevel.MEMORY_AND_DISK)
    if eager:
        out.count()
    return out

def rep(name, mode):
    DataFrame.localCheckpoint = real_lc if mode == "lc" else as_persist
    try:
        t0 = time.perf_counter()
        QUERIES[name](spark, SF).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0
    finally:
        DataFrame.localCheckpoint = real_lc
        spark.catalog.clearCache()

for name in sys.argv[1:]:
    rep(name, "lc")  # warmup
    lc, pe = [], []
    for i in range(8):
        (lc if i % 2 == 0 else pe).append(rep(name, "lc" if i % 2 == 0 else "persist"))
    lc, pe = sorted(lc), sorted(pe)
    print(f"{name:28s} LOCALCKPT best={lc[0]:.2f} med={lc[2]:.2f} | PERSIST best={pe[0]:.2f} med={pe[2]:.2f}")
spark.stop()
