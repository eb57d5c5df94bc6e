"""Plan guards: assertions on the PHYSICAL PLANS of representative
queries, locking in the properties that matter at 100 TB — filters
pushed to the parquet scan, small dims broadcast, candidate generation
never cartesian, Python kept off the relational hot path. A regression
that silently de-optimizes a plan fails here even though results stay
correct."""

from __future__ import annotations

from storm_dynamic_spout_spark.queries import QUERIES


def _plan(spark, sf_dir, name: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_filters_pushed_to_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_q6")
    # all four predicates reach the reader as PushedFilters
    assert "PushedFilters:" in plan
    pushed = plan.split("PushedFilters:")[1].split("]")[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed down: {pushed}"


def test_q6_scan_prunes_columns(spark, sf_dir):
    plan = _plan(spark, sf_dir, "tpch_q6")
    # ReadSchema holds only the 4 needed columns — not the full table
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_extendedprice" in read_schema
    assert "l_returnflag" not in read_schema
    assert "l_orderkey" not in read_schema


def test_star_join_broadcasts_dims(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_star")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_minhash_pipeline_never_cartesian(spark, sf_dir):
    for name in ("dedup_minhash_pairs", "dedup_ngram_jaccard", "embedding_near_pairs"):
        plan = _plan(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, f"{name} went all-pairs"
        assert "BroadcastNestedLoopJoin" not in plan, f"{name} went all-pairs"


def test_ann_ivf_joins_on_bucket(spark, sf_dir):
    # the IVF variant must be an equi-join (bucket key), not a cross join
    plan = _plan(spark, sf_dir, "ann_topk_ivf")
    assert "CartesianProduct" not in plan
    # brute-force baseline IS allowed to broadcast-cross the tiny query set
    brute = _plan(spark, sf_dir, "ann_topk_bruteforce")
    assert "Join" in brute or "CartesianProduct" in brute or "BroadcastNestedLoopJoin" in brute


def test_relational_queries_stay_jvm_side(spark, sf_dir):
    """No Python evaluation nodes in the relational/TPC-H plans — the
    hot path must be whole-stage-codegen'd built-ins."""
    for name in ("q1_pricing_summary", "tpch_q3", "tpch_q5", "tpch_q10",
                 "window_ranking", "agg_rollup", "scalar_json"):
        plan = _plan(spark, sf_dir, name)
        assert "BatchEvalPython" not in plan, f"{name} fell back to row-Python"
        assert "ArrowEvalPython" not in plan, f"{name} uses a pandas UDF"


def test_udf_queries_use_arrow_not_row_python(spark, sf_dir):
    """Where Python IS the point (§2.11), it must be the Arrow path."""
    plan = _plan(spark, sf_dir, "udf_pandas_scalar")
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
    plan = _plan(spark, sf_dir, "udaf_apply_in_pandas")
    assert "FlatMapGroupsInPandas" in plan


def test_partition_filter_on_offset_range(spark, tmp_path):
    """read_range compiles per-partition offset bounds into one
    predicate that reaches the parquet scan (row-group pruning)."""
    from storm_dynamic_spout_spark.streaming import FileTopic

    topic = FileTopic(str(tmp_path / "t"), num_partitions=2)
    topic.append([("a", "1"), ("b", "2"), ("c", "3")])
    df = topic.read_range(spark, start_offsets={0: 0, 1: -1}, end_offsets={0: 5, 1: 5})
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters:" in plan
    assert "offset" in plan.split("PushedFilters:")[1].split("]")[0]


def test_runtime_bloom_filter_prunes_shuffle_join(spark, sf_dir):
    """Runtime Bloom-filter join pruning — at 100 TB a selective dim
    filter should semi-filter the fact scan BEFORE the shuffle, not
    after. Catalyst injects bloom_filter_agg/might_contain when the
    creation side is selective and the application side is a big scan;
    thresholds here are lowered so local-mode data sizes qualify, the
    same way production sets creationSideThreshold relative to executor
    memory. Broadcast is disabled to force the shuffle-join path the
    optimization exists for (a broadcast join already prunes)."""
    from pyspark.sql import functions as F

    from storm_dynamic_spout_spark.engine import load_table

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
        "spark.sql.optimizer.runtimeFilter.number.threshold": "10",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        o = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = load_table(spark, sf_dir, "lineitem")
        joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.sum("l_quantity").alias("q"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, f"no bloom filter injected:\n{plan[:2000]}"
        # and it still computes the right thing
        assert joined.collect()[0]["o_orderpriority"] == "1-URGENT"
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_q8_deep_join_tree_all_broadcast(spark, sf_dir):
    # 8-relation join: every dim side must broadcast — a single
    # SortMergeJoin here means a dim lost its broadcast hint and the
    # fact would shuffle 7 ways at 100 TB
    plan = _plan(spark, sf_dir, "tpch_q8")
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") == 7


def test_q17_decorrelated_subquery_no_cartesian(spark, sf_dir):
    # the scalar-subquery rewrite must stay an equi-join on l_partkey
    plan = _plan(spark, sf_dir, "tpch_q17")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q21_lineitem_single_wide_shuffle(spark, sf_dir):
    # the EXISTS/NOT-EXISTS decorrelation reads lineitem, never
    # cartesian, and co-shuffles fact and per-order aggregate on the
    # same key (SortMergeJoin allowed; nested-loop not)
    plan = _plan(spark, sf_dir, "tpch_q21")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_derived_partsupp_queries_never_cartesian(spark, sf_dir):
    # q2/q11/q16/q20 generate partsupp from part x supplier-count (a
    # broadcast 1-row cross join + explode — NOT a cartesian product of
    # two real relations) and must join everything else on keys
    for name in ("tpch_q2", "tpch_q11", "tpch_q16", "tpch_q20"):
        plan = _plan(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, f"{name}:\n{plan[:2000]}"


def test_q2_min_cost_is_partitioned_window_min(spark, sf_dir):
    # the decorrelated per-part MIN is a window over the ps_partkey
    # partition on the already-part-filtered probe (r15: replaces the
    # aggregate-then-rejoin that evaluated the partsupp⋈supplier
    # subtree twice); dims broadcast, and the only nested-loop joins
    # allowed are the 1-row supplier-count broadcasts the partsupp
    # generator uses (IdentityBroadcastMode Cross — a scalar, not a
    # relation pair)
    plan = _plan(spark, sf_dir, "tpch_q2")
    bnlj = [ln for ln in plan.splitlines() if "BroadcastNestedLoopJoin" in ln]
    assert all("Cross" in ln for ln in bnlj), plan[:2000]
    assert "min(ps_supplycost" in plan and "windowspecdefinition(ps_partkey" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan, plan[:2000]
    assert plan.count("BroadcastHashJoin") >= 3, plan[:2000]


def test_q11_total_is_broadcast_not_reshuffle(spark, sf_dir):
    # the one-row grand total joins back via broadcast; the grouped
    # relation must not shuffle a second time for the HAVING filter
    plan = _plan(spark, sf_dir, "tpch_q11")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan[:2000]
    assert "CartesianProduct" not in plan


def test_contamination_is_gram_hash_equi_join(spark, sf_dir):
    # the train x eval screen must join exploded gram HASHES, never
    # compare document pairs: no cartesian, no nested loop over docs
    plan = _plan(spark, sf_dir, "corpus_contamination")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_packing_and_shuffle_have_no_global_sort_stage(spark, sf_dir):
    # packing windows per lang stream and export shuffling per shard:
    # every Sort in the plan must be preceded by a hash-partitioned
    # Exchange (parallel), not a SinglePartition collapse
    for name in ("sequence_packing", "training_export_shuffle"):
        plan = _plan(spark, sf_dir, name)
        # the final presentation orderBy is allowed to range-partition;
        # a SinglePartition exchange feeding a Sort is the smell
        assert "Exchange SinglePartition" not in plan, f"{name}:\n{plan[:2000]}"


def test_funnel_single_exchange(spark, sf_dir):
    """The four funnel stages are conditional window-mins over one
    partitionBy(user_id) — adding a stage must not add a shuffle, and
    the closing per-user aggregate reuses the same partitioning."""
    plan = _plan(spark, sf_dir, "events_funnel")
    assert plan.count("Exchange") == 1, plan


def test_retention_one_scan_two_exchanges(spark, sf_dir):
    """Cohort retention reads events ONCE (per-user min+collect_set),
    then aggregates the tiny exploded cells: one events scan, two
    exchanges. The naive first-seen-join-activity plan (two scans,
    four exchanges) is the regression this guards against."""
    plan = _plan(spark, sf_dir, "events_retention")
    assert plan.count("Exchange") == 2, plan
    assert plan.count("Scan parquet") == 1, plan


def test_histogram_partial_aggregates(spark, sf_dir):
    """The histogram's map-side combine collapses the scan to ~20 rows
    before the shuffle: two HashAggregate phases around one Exchange."""
    plan = _plan(spark, sf_dir, "agg_histogram")
    assert plan.count("HashAggregate") == 2, plan
    assert plan.count("Exchange") == 1, plan


def test_rollup_partial_aggregates_map_side(spark, sf_dir):
    """ContinuousRollup's per-batch partial must be a two-phase hash
    aggregate (partial before the exchange, final after) — at 100 TB
    the map-side combine collapses a batch to |keys| rows before the
    single shuffle on the rollup keys."""
    from pyspark.sql import functions as F

    from storm_dynamic_spout_spark.streaming.rollup import ContinuousRollup

    import tempfile

    e = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            "event_type",
            F.col("ts").cast("timestamp").alias("ts"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    r = ContinuousRollup(tempfile.mkdtemp(), ["event_type"], "cents")
    plan = r._partial(e)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 2, plan  # partial + final
    assert "Exchange" in plan
    # exactly ONE shuffle: the rollup-key exchange, nothing else
    assert plan.count("Exchange") == 1, plan


def test_binned_range_join_is_equi_not_nested_loop(spark, sf_dir):
    """The keyless big-big range join must execute as an equi-join on
    the bin id with the range as residual — never a nested loop over
    both sides (the naive plan at 100 TB)."""
    plan = _plan(spark, sf_dir, "join_range_binned")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Join" in plan  # hash or sort-merge on __bin


def test_round5_lsh_pipelines_never_cartesian(spark, sf_dir):
    """SRP-LSH and containment candidates must come from bucket
    equi-joins (band key / shared 8-gram), never an all-pairs product."""
    for name in ("embedding_lsh_pairs", "dedup_containment"):
        plan = _plan(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, f"{name} went all-pairs"
        assert "BroadcastNestedLoopJoin" not in plan, f"{name} went all-pairs"


def test_merge_upsert_single_join_on_key(spark, sf_dir):
    """The SCD-1 merge is ONE outer join on the merge key — no window
    functions, no nested loop (a small source side may broadcast)."""
    plan = _plan(spark, sf_dir, "corpus_merge_upsert")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" not in plan


def test_quantile_gate_threshold_is_broadcast(spark, sf_dir):
    """The P75 threshold is a one-row aggregate broadcast back over the
    scan — the scalar-subquery pattern, not a shuffled join."""
    plan = _plan(spark, sf_dir, "text_quality_gate_quantile")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_hard_negatives_broadcasts_queries(spark, sf_dir):
    """Query set is broadcast; corpus is scanned once."""
    plan = _plan(spark, sf_dir, "ann_hard_negatives")
    assert "BroadcastExchange" in plan
    assert plan.count("FileScan") <= 2  # corpus + broadcast query scan


def test_weighted_sample_is_topk_not_global_sort(spark, sf_dir):
    """A-ES weighted sampling must plan as TakeOrderedAndProject
    (per-partition top-k + driver merge), never a full sort shuffle."""
    plan = _plan(spark, sf_dir, "sample_weighted")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_keep_best_dedup_aggregates_map_side(spark, sf_dir):
    """max_by canonicalization must two-phase: partial agg before the
    fingerprint shuffle so each task pre-reduces its clusters."""
    plan = _plan(spark, sf_dir, "dedup_keep_best")
    assert plan.count("Exchange") == 1
    # plans print top-down: the partial aggregate sits BELOW the
    # exchange (later in the text), the final aggregate above it
    _, _, below = plan.partition("Exchange")
    assert "partial_max_by" in below
    assert "Window" not in plan  # the non-map-side formulation


def test_bigram_logprob_count_joins_never_cartesian(spark, sf_dir):
    """LM-score joins are equi-joins on bigram/unigram keys plus one
    single-row vocab broadcast — no cartesian product."""
    plan = _plan(spark, sf_dir, "text_bigram_logprob")
    assert "CartesianProduct" not in plan
    # the only nested-loop is the 1-row vocab scalar broadcast
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_token_budget_prefix_sum_is_bucket_parallel(spark, sf_dir):
    """The corpus-wide running sum must window over quality BUCKETS
    (hash-partitioned, parallel); only the 20-row bucket-offset prefix
    sum and the 1-row total may be SinglePartition."""
    plan = _plan(spark, sf_dir, "corpus_token_budget")
    first_window = next(l for l in plan.splitlines() if "Window" in l)
    assert "windowspecdefinition(__b" in first_window
    assert "Exchange hashpartitioning(__b" in plan
    assert plan.count("SinglePartition") <= 2


def test_top_paths_prunes_window_and_stays_keyed(spark, sf_dir):
    """Per-user first-5 selection must plan as WindowGroupLimit (rows
    past rank 5 pruned before the path aggregation), with no cartesian
    anywhere."""
    plan = _plan(spark, sf_dir, "events_top_paths")
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_ann_recall_joins_results_never_cartesian(spark, sf_dir):
    """The recall join matches (query_id, neighbor_id) keys; the only
    nested-loop is the declared broadcast of the tiny query panel."""
    plan = _plan(spark, sf_dir, "ann_recall_report")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 2


def test_histogram_rollup_merges_map_side(spark, sf_dir):
    """Daily histograms must partial-aggregate before their shuffle;
    the only single-partition / nested-loop pieces are the one-row
    min-max range broadcasts."""
    plan = _plan(spark, sf_dir, "agg_histogram_percentile_rollup")
    assert "CartesianProduct" not in plan
    assert "partial" in plan.lower()


def test_attribution_single_user_window_no_self_join(spark, sf_dir):
    """Attribution must be ONE user-partitioned window pass — no
    purchase-against-click join of any kind."""
    plan = _plan(spark, sf_dir, "events_attribution")
    assert "Join" not in plan
    assert "Window" in plan
    assert plan.count("Exchange") <= 2  # window shuffle (+AQE read)


def test_interpolate_windows_partition_by_series_key(spark, sf_dir):
    """Both wall windows partition by event_type — no global-order
    window over the whole grid."""
    plan = _plan(spark, sf_dir, "events_interpolate")
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "event_type" in line
    assert "CartesianProduct" not in plan


def test_semantic_clusters_and_funnel_never_cartesian(spark, sf_dir):
    for name in ("dedup_semantic_clusters", "corpus_dedup_funnel"):
        plan = _plan(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name


def test_mode_aggregate_is_two_phase_no_window(spark, sf_dir):
    """agg_mode must stay a partial-aggregable min_by argmax — a window
    formulation would single-reduce each group's full value list."""
    plan = _plan(spark, sf_dir, "agg_mode")
    assert "Window" not in plan
    assert "partial_min_by" in plan or "partial" in plan.lower()


def test_term_freq_is_topk_not_global_window(spark, sf_dir):
    """text_term_freq's top-50 must plan as TakeOrderedAndProject
    (per-partition heap + driver merge) — the r5-flagged unpartitioned
    row_number moved the ENTIRE distinct-term table to one partition,
    a scale-killer at web-corpus vocabulary sizes."""
    plan = _plan(spark, sf_dir, "text_term_freq")
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_rfm_scores_without_global_sorts(spark, sf_dir):
    """orders_rfm must score against broadcast quartile cut values — the
    r5-flagged triple unpartitioned ntile moved all customers through
    three single-partition windows.  Zero Sort/Window nodes; the cuts
    and max-date rows arrive via broadcast."""
    plan = _plan(spark, sf_dir, "orders_rfm")
    assert "Window" not in plan
    assert "Sort" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan


def test_skew_report_is_partial_aggregates_only(spark, sf_dir):
    """table_skew_report must stay three independent two-phase count
    aggregates (map-side partials, |keys|-sized shuffles) — no joins,
    no windows, no cartesian."""
    plan = _plan(spark, sf_dir, "table_skew_report")
    assert "Join" not in plan
    assert "Window" not in plan
    assert "partial" in plan.lower()


def test_catalog_source_has_no_driver_collects():
    """Catalog builders must stay lazy end to end (r8 verdict item 2
    closed the last exception — stream_heavy_hitters' driver-side MG
    merge is now the relational mg_truncate fold).  Any
    ``.collect()`` / ``.toPandas()`` over partition-scaled data in
    catalog source would silently turn an operator non-distributed, so
    the class is pinned extinct at the source level (collect_set /
    collect_list are Spark aggregates, not driver collects, and don't
    match)."""
    import pathlib
    import re

    cat = pathlib.Path(__file__).resolve().parent.parent / (
        "storm_dynamic_spout_spark/catalog"
    )
    offenders = []
    for py in sorted(cat.glob("*.py")):
        for i, line in enumerate(py.read_text().splitlines(), 1):
            code = line.split("#", 1)[0]
            # require a receiver before the dot so prose mentions in
            # docstrings (``.collect()``) don't trip the guard
            if re.search(r"[\w)\]]\.collect\(\)|[\w)\]]\.toPandas\(\)", code):
                offenders.append(f"{py.name}:{i}: {line.strip()}")
    assert not offenders, "driver-side collects in catalog code:\n" + "\n".join(
        offenders
    )


def test_whitening_is_broadcast_stats_map_only(spark, sf_dir):
    """embedding_whitening (r10): the per-dimension mu/sd arrays must
    return as a one-row BROADCAST — never a shuffle join keyed on the
    vectors — and the whitening itself stays JVM-side (zip_with, no
    Python nodes).  At 100 TB the only exchange is d rows wide."""
    plan = _plan(spark, sf_dir, "embedding_whitening")
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Python" not in plan


def test_ab_test_aggregates_events_once(spark, sf_dir):
    """events_ab_test (r10): the (user, type) aggregate is lazily
    checkpointed, so the final plan re-reads the checkpoint — NOT the
    events parquet — for its four downstream branches, and the
    exposure-frame threshold comes back as a broadcast of |types|
    rows, never a window over the frame."""
    plan = _plan(spark, sf_dir, "events_ab_test")
    assert "Scan parquet" not in plan, "events re-scanned past the checkpoint"
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert "Python" not in plan


def test_staged_round10_queries_plan_shapes(spark, sf_dir):
    """Late-round-10 staged queries: the tuned IVF-PQ scan must stay a
    bucket equi-join (never cartesian against the corpus) with no
    Python nodes; the CUPED readout is pure aggregates + a one-row
    broadcast (no window, no Python); the k-means assignment never
    goes cartesian against anything bigger than the k-row centroid
    broadcast."""
    plan = _plan(spark, sf_dir, "ann_topk_ivfpq_tuned")
    assert "CartesianProduct" not in plan
    assert "Python" not in plan
    plan = _plan(spark, sf_dir, "events_ab_cuped")
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert "Python" not in plan
    plan = _plan(spark, sf_dir, "ann_ivf_train_assign")
    assert "CartesianProduct" not in plan
    assert "Python" not in plan
