import sys
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
from pyspark.sql import functions as F
from storm_dynamic_spout_spark.engine import EngineConfig, build_session

spark = build_session(EngineConfig({"spark.master": "local[32]", "spark.shuffle_partitions": 32}))
spark.sparkContext.setLogLevel("ERROR")
OUT = "/tmp/sf1x"
docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
cust = spark.read.parquet("/root/testdata/sf0.1/customer.parquet")
DOC_OFF = 1_000_000  # even: preserves doc_id parity per copy
CUST_OFF = 10_000_000

dparts = []
for i in range(10):
    d = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * DOC_OFF))
    # per-copy token salt (cross-copy Jaccard 0, vocabulary 10x) — the
    # sf1_rehearsal recipe
    d = d.withColumn(
        "text",
        F.array_join(
            F.transform(F.split("text", r"\s+"), lambda t: F.concat(F.lit(f"c{i}x"), t)),
            " ",
        ),
    )
    dparts.append(d)
big_docs = dparts[0]
for d in dparts[1:]:
    big_docs = big_docs.unionByName(d)
big_docs.repartition(32).write.mode("overwrite").parquet(f"{OUT}/documents.parquet")

cparts = [cust.withColumn("c_custkey", F.col("c_custkey") + F.lit(i * CUST_OFF)) for i in range(10)]
big_cust = cparts[0]
for c in cparts[1:]:
    big_cust = big_cust.unionByName(c)
big_cust.repartition(32).write.mode("overwrite").parquet(f"{OUT}/customer.parquet")
print("rows:", spark.read.parquet(f"{OUT}/documents.parquet").count(),
      spark.read.parquet(f"{OUT}/customer.parquet").count())
spark.stop()
