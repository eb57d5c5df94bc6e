"""Runnable walkthrough of the decontamination stack, both directions
plus the composition readout — the decision pipeline an eval-suite and
corpus owner run together before a training export:

    python examples/decontamination_demo.py

1. TRAIN-side screen (`contamination`): which training documents share
   a hashed token n-gram with the eval set — the rows a pretraining
   pipeline drops or down-weights before every export.
2. EVAL-side fractions (`eval_contamination`, round 14): per eval
   document, what fraction of its distinct n-grams appears anywhere in
   the train corpus — the drop-decision statistic for leaked eval
   items (NULL for sub-gram-width docs: no evidence either way).
3. Composition attribution (`decontamination_report`, staged for the
   round-15 catalog): the leak joined back to ingest sources — which
   source do I have to scrub, and what leaked-token budget does it
   carry.
4. Ends with the scale story: both sides deduplicate before the
   gram-hash equi-join (the vocabulary hashes once per distinct gram),
   and the plan is asserted free of any train×eval document product.

Every stage is the same library operator the oracle-checked catalog
queries wrap (`corpus_contamination`, `corpus_eval_contamination`).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from storm_dynamic_spout_spark.engine import EngineConfig, build_session, load_table
from storm_dynamic_spout_spark.operators.corpus import (
    contamination,
    decontamination_report,
    eval_contamination,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
NGRAM = 3


def main() -> None:
    spark = build_session(EngineConfig({"spark.shuffle_partitions": 8}))
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, SF, "documents")
    is_eval = F.col("doc_id") % 2 == 1
    train, ev = docs.filter(~is_eval), docs.filter(is_eval)
    print(f"corpus: {train.count()} train docs, {ev.count()} eval docs "
          f"({NGRAM}-gram unit)\n")

    print("1. train-side screen: most-contaminated training docs")
    screen = contamination(train, ev, ngram=NGRAM)
    screen.orderBy(F.desc("n_shared_grams")).show(5)

    print("2. eval-side fractions: the drop decisions (threshold 0.5)")
    fr = eval_contamination(train, ev, ngram=NGRAM, threshold=0.5)
    fr.orderBy(F.desc("overlap_frac"), "doc_id").show(5)
    n_flagged = fr.filter("flagged").count()
    n_eval = fr.count()
    print(f"   -> {n_flagged}/{n_eval} eval docs flagged for removal\n")

    print("3. composition attribution: per-source leaked-token budget")
    rep = decontamination_report(train, ev, ngram=NGRAM)
    rep.orderBy(F.desc("leaked_token_budget")).show(5)

    print("4. scale check: no train x eval doc product in any plan")
    for name, df in (("screen", screen), ("fractions", fr), ("report", rep)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        print(f"   {name}: equi-join only — OK")
    print("\ndemo complete")


if __name__ == "__main__":
    main()
