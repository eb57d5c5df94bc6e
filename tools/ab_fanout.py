"""Single-session interleaved A/B: fan_out_narrow real vs identity."""
import sys, time
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
from pyspark.sql import functions as F
from storm_dynamic_spout_spark.engine import EngineConfig, build_session
import storm_dynamic_spout_spark.operators.dedup as dmod
import storm_dynamic_spout_spark.operators.corpus as cmod
from storm_dynamic_spout_spark.operators.skew import fan_out_narrow as real_fan
from storm_dynamic_spout_spark.queries import QUERIES

identity = lambda df, n=None: df
import storm_dynamic_spout_spark.operators.similarity as smod
import storm_dynamic_spout_spark.catalog.llm as lmod
import storm_dynamic_spout_spark.catalog.ranking as rmod
MODS = [dmod, cmod, smod, lmod, rmod]

def set_fan(on):
    for m in MODS:
        m.fan_out_narrow = real_fan if on else identity

cfg = EngineConfig({"spark.master": "local[32]", "spark.shuffle_partitions": 32})
spark = build_session(cfg)
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.1"

def rep(name):
    t0 = time.perf_counter()
    QUERIES[name](spark, SF).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0

names = sys.argv[1:]
for name in names:
    rep(name)  # warmup
    on, off = [], []
    for i in range(8):
        set_fan(i % 2 == 0)
        (on if i % 2 == 0 else off).append(rep(name))
    on, off = sorted(on), sorted(off)
    print(f"{name:28s} FAN best={on[0]:.2f} med={on[2]:.2f} | OFF best={off[0]:.2f} med={off[2]:.2f}")
spark.stop()
