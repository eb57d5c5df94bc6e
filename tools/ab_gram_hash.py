import sys, time
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
from pyspark.sql import functions as F
from storm_dynamic_spout_spark.engine import EngineConfig, build_session
from storm_dynamic_spout_spark.operators.corpus import token_ngrams, md5_int

cfg = EngineConfig({"spark.master": "local[32]", "spark.shuffle_partitions": 32})
spark = build_session(cfg)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

def noop(df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0

N = 3
cases = {
    "grams_only  ": lambda: docs.select(F.explode(token_ngrams(F.col("text"), 3)).alias("g")),
    "md5_int     ": lambda: docs.select(F.explode(F.transform(token_ngrams(F.col("text"), 3), lambda g: md5_int(g))).alias("g")),
    "xxhash64    ": lambda: docs.select(F.explode(F.transform(token_ngrams(F.col("text"), 3), lambda g: F.xxhash64(g))).alias("g")),
}
# warmup
noop(cases["grams_only  "]())
for name, fn in cases.items():
    reps = sorted(noop(fn()) for _ in range(N))
    print(f"{name} best={reps[0]:.2f} med={reps[N//2]:.2f}")
# full eval_contamination-ish pipeline A/B: vocab distinct + join + agg
spark.stop()
