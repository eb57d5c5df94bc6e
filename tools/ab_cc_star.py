"""Loop-level A/B of star-contraction variants on the sf0.1 spatial graph."""
import sys, time
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
from pyspark.sql import functions as F
from storm_dynamic_spout_spark.engine import EngineConfig, build_session
from storm_dynamic_spout_spark.operators import dedup as D
from storm_dynamic_spout_spark.operators.spatial import grid_neighbor_pairs
from storm_dynamic_spout_spark.catalog.joins import _spatial_coord
from storm_dynamic_spout_spark.catalog.analytics import _TRI_RADIUS

cfg = EngineConfig({"spark.master": "local[32]", "spark.shuffle_partitions": 32})
spark = build_session(cfg)
spark.sparkContext.setLogLevel("ERROR")
st = spark.sparkContext.statusTracker()

def edges():
    pts = spark.read.parquet("/root/testdata/sf0.1/customer.parquet").select(
        F.col("c_custkey").alias("id"), _spatial_coord("x").alias("ux"), _spatial_coord("y").alias("uy"))
    return grid_neighbor_pairs(pts, "id", "ux", "uy", _TRI_RADIUS)

def large_window(canon):
    from pyspark.sql import Window
    sym = canon.unionByName(canon.select(F.col("__d").alias("__s"), F.col("__s").alias("__d")))
    w = Window.partitionBy("__s")
    return (sym.withColumn("__m", F.least(F.min("__d").over(w), F.col("__s")))
            .filter(F.col("__d") > F.col("__s"))
            .select(F.col("__d").alias("__s"), F.col("__m").alias("__d"))
            .filter(F.col("__s") != F.col("__d")))

def small_window(canon):
    from pyspark.sql import Window
    w = Window.partitionBy("__s")
    wm = canon.withColumn("__m", F.min("__d").over(w))
    to_min = wm.filter(F.col("__d") != F.col("__m")).select(F.col("__d").alias("__s"), F.col("__m").alias("__d"))
    se = wm.select("__s", F.col("__m").alias("__d")).dropDuplicates(["__s"])
    return to_min.unionByName(se).filter(F.col("__s") != F.col("__d")).distinct()

def large_join(canon, ckpt):
    sym = canon.unionByName(canon.select(F.col("__d").alias("__s"), F.col("__s").alias("__d")))
    mins = sym.groupBy("__s").agg(F.min("__d").alias("__m0"))
    if ckpt: mins = mins.localCheckpoint(eager=False)
    probe = canon.select(F.col("__d").alias("__s"), F.col("__s").alias("__d"))
    return (probe.join(mins, "__s")
            .select(F.col("__d").alias("__s"), F.least(F.col("__m0"), F.col("__s")).alias("__d"))
            .filter(F.col("__s") != F.col("__d")))

def small_join(canon, ckpt):
    mins = canon.groupBy("__s").agg(F.min("__d").alias("__m"))
    if ckpt: mins = mins.localCheckpoint(eager=False)
    to_min = (canon.join(mins, "__s").filter(F.col("__d") != F.col("__m"))
              .select(F.col("__d").alias("__s"), F.col("__m").alias("__d")))
    se = mins.select("__s", F.col("__m").alias("__d"))
    return to_min.unionByName(se).filter(F.col("__s") != F.col("__d")).distinct()

def run_cc(round_fn):
    canon = D._canonical_edges(edges(), "id_a", "id_b").localCheckpoint(eager=True)
    n_prev = canon.count()
    for i in range(30):
        canon2 = round_fn(canon).localCheckpoint(eager=True)
        n_new = canon2.count()
        same = n_new == n_prev and canon2.join(canon, ["__s", "__d"], "left_anti").isEmpty()
        canon, n_prev = canon2, n_new
        if same: break
    lab = canon.groupBy("__s").agg(F.min("__d").alias("__l"))
    return lab.count(), i + 1

VARIANTS = {
    "window      ": lambda c: small_window(large_window(c)),
    "join_nockpt ": lambda c: small_join(large_join(c, False), False),
    "join_ckpt   ": lambda c: small_join(large_join(c, True), True),
}
import itertools
order = ["window      ", "join_nockpt ", "join_ckpt   "] * 3
results = {k: [] for k in VARIANTS}
jobs = {k: [] for k in VARIANTS}
# warmup
run_cc(VARIANTS["window      "])
for name in order:
    j0 = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
    t0 = time.perf_counter()
    n, rounds = run_cc(VARIANTS[name])
    dt = time.perf_counter() - t0
    j1 = spark.sparkContext._jsc.sc().dagScheduler().nextJobId()
    results[name].append(dt); jobs[name].append(j1 - j0)
for name in VARIANTS:
    r = sorted(results[name])
    print(f"{name} best={r[0]:.2f} med={r[len(r)//2]:.2f} all={[f'{x:.2f}' for x in r]} jobs={jobs[name][0]}")
spark.stop()
