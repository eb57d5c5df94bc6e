import sys, time
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
from pyspark.sql import functions as F
from storm_dynamic_spout_spark.engine import EngineConfig, build_session
spark = build_session(EngineConfig({"spark.master": "local[32]", "spark.shuffle_partitions": 32}))
spark.sparkContext.setLogLevel("ERROR")
li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
def noop(df):
    t0 = time.perf_counter(); df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0
# q1-like aggregate
def q1(d):
    return (d.filter(F.col("l_shipdate") <= "1998-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum("l_quantity"), F.sum("l_extendedprice"), F.avg("l_discount"), F.count("*")))
noop(q1(li))
for name, d in [("narrow", li), ("fanned", li.repartition(32))]:
    reps = sorted(noop(q1(d)) for _ in range(5))
    print(f"q1-agg {name}: best={reps[0]:.2f} med={reps[2]:.2f}")
spark.stop()
