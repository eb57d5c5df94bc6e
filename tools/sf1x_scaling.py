"""8 vs 32 core scaling at the sf1-equivalent (10x) corpus for the
five heavy paths (r15 verdict item 5)."""
import sys, time
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
from storm_dynamic_spout_spark.engine import EngineConfig, build_session
from storm_dynamic_spout_spark.queries import QUERIES

cpus = sys.argv[1]
names = sys.argv[2:]
spark = build_session(EngineConfig({"spark.master": f"local[{cpus}]", "spark.shuffle_partitions": int(cpus)}))
spark.sparkContext.setLogLevel("ERROR")
SF = "/tmp/sf1x"
for name in names:
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        QUERIES[name](spark, SF).write.format("noop").mode("overwrite").save()
        reps.append(time.perf_counter() - t0)
    reps.sort()
    print(f"cpus={cpus} {name:30s} best={reps[0]:.2f} med={reps[1]:.2f}")
spark.stop()
