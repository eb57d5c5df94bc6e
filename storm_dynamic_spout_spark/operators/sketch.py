"""Mergeable frequency summaries: Misra-Gries heavy-hitter candidate
generation and the exact two-pass heavy-hitters operator built on it.

Reference parity: the reference engine's approximate frequency path
(SURVEY §2 A2/A4 partial-aggregate family) — re-expressed Spark-first
as the classic two-pass distributed heavy hitters: a per-partition
Misra-Gries summary (Arrow-batched, O(k) memory per partition) emits a
tiny candidate set whose union provably contains every item with
global frequency > n/(k+1) (mergeable-summaries bound, Agarwal et al.
2012, PODS); an exact semi-join count over just those candidates then
removes false positives.  Only candidate rows ever shuffle — the raw
value stream never does.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries(values: Iterable, k: int) -> dict:
    """Classic Misra-Gries summary with ``k`` counters.

    Guarantee: for every item x, ``count(x) - est(x) <= n/(k+1)`` where
    n is the stream length; any item absent from the summary therefore
    has ``count(x) <= n/(k+1)``.
    """
    counters: dict = {}
    for v in values:
        if v in counters:
            counters[v] += 1
        elif len(counters) < k:
            counters[v] = 1
        else:
            dead = [key for key in counters if counters[key] == 1]
            for key in counters:
                counters[key] -= 1
            for key in dead:
                del counters[key]
    return counters


def _key_schema(df: DataFrame, col: str) -> str:
    """Output-schema fragment preserving the key column's Spark type
    (a hard-coded string key would make integral-keyed callers fail at
    Arrow conversion or join on mismatched types)."""
    return f"{col} {df.schema[col].dataType.simpleString()}"


def partition_heavy_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries over ``col``: each task streams its
    partition through a k-counter summary and emits at most k candidate
    rows plus ONE summary row (``col`` NULL) carrying the partition's
    row count — the only place Python touches the data, O(k) state,
    Arrow batches in, k+1 rows out.  Piggybacking the count means the
    caller's global total needs no second pass over the stream.

    NULL keys are REJECTED loudly (the summary row reuses NULL as its
    marker, and the verify pass's equi-join could never match a NULL
    candidate anyway) — callers must pre-map NULL to a sentinel value
    if it is a legitimate key."""
    import pandas as pd

    out_schema = f"{_key_schema(df, col)}, part_rows long"

    def _mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0

        def stream():
            nonlocal n
            for b in batches:
                if b[col].isna().any():
                    raise ValueError(
                        f"NULL key in heavy-hitter column {col!r}: map it "
                        "to a sentinel before the sketch pass"
                    )
                n += len(b)
                yield from b[col]

        cands = list(misra_gries(stream(), k))
        yield pd.DataFrame(
            {
                col: pd.Series(cands + [None], dtype=object),
                "part_rows": [0] * len(cands) + [n],
            }
        )

    return df.select(col).mapInPandas(_mg, out_schema)


def partition_mg_summaries(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries WITH counter estimates:
    (col, est, part_rows) — at most k counter rows plus one NULL-key
    row carrying the partition row count.  The counter values let a
    driver-side fold (``merge_summaries``) maintain one k-counter
    summary across micro-batches, the streaming form of the two-pass
    plan; ``partition_heavy_candidates`` stays the keys-only batch
    variant.  NULL keys are rejected loudly (same contract and reason
    as ``partition_heavy_candidates``)."""
    import pandas as pd

    out_schema = f"{_key_schema(df, col)}, est long, part_rows long"

    def _mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0

        def stream():
            nonlocal n
            for b in batches:
                if b[col].isna().any():
                    raise ValueError(
                        f"NULL key in heavy-hitter column {col!r}: map it "
                        "to a sentinel before the sketch pass"
                    )
                n += len(b)
                yield from b[col]

        counters = misra_gries(stream(), k)
        yield pd.DataFrame(
            {
                col: pd.Series(list(counters) + [None], dtype=object),
                "est": list(counters.values()) + [0],
                "part_rows": [0] * len(counters) + [n],
            }
        )

    return df.select(col).mapInPandas(_mg, out_schema)


def merge_summaries(a: dict, b: dict, k: int) -> dict:
    """Merge two Misra-Gries summaries into one with ≤ k counters
    (Agarwal et al. 2012: summing counters then subtracting the
    (k+1)-st largest keeps the n/(k+1) error bound additive across
    merges).  Used by the streaming heavy-hitter path to fold
    per-micro-batch summaries without ever revisiting a batch."""
    merged: dict = dict(a)
    for key, c in b.items():
        merged[key] = merged.get(key, 0) + c
    if len(merged) > k:
        cut = sorted(merged.values(), reverse=True)[k]
        merged = {key: c - cut for key, c in merged.items() if c > cut}
    return merged


def mg_truncate(counters: DataFrame, key_col: str, k: int) -> DataFrame:
    """Relational Misra-Gries merge truncation: reduce a summed
    counter relation ``(key_col, est)`` to ≤ k counters by subtracting
    the (k+1)-st largest estimate and keeping the positives — the
    exact relational mirror of ``merge_summaries``'s dict fold, so the
    Agarwal et al. 2012 mergeability bound carries over unchanged.

    The cut lookup is a TakeOrdered over the counter relation (k+1
    rows via per-partition heaps — never a global sort or a
    single-partition window) aggregated to ONE row and broadcast back,
    so the fold is fully distributed: no driver-side dict, no
    ``.collect()``, state bounded at k rows regardless of how many
    partition summaries merged into ``counters``."""
    cut = (
        counters.orderBy(F.desc("est"))
        .limit(k + 1)
        .agg(
            F.when(F.count(F.lit(1)) == k + 1, F.min("est"))
            .otherwise(F.lit(0))
            .alias("__cut")
        )
    )
    return (
        counters.crossJoin(F.broadcast(cut))
        .select(key_col, (F.col("est") - F.col("__cut")).alias("est"))
        .filter(F.col("est") > 0)
    )


def _h60(col, seed: str = ""):
    """60-bit md5-derived hash as BIGINT — identical to the DuckDB
    expression CAST(('0x' || substr(md5(<seed:>x), 1, 15)) AS BIGINT),
    the engine-portable hash every sketch here is built on."""
    prefixed = F.concat(F.lit(f"{seed}:"), col.cast("string")) if seed else col.cast("string")
    return F.conv(F.substring(F.md5(prefixed.cast("binary")), 1, 15), 16, 10).cast("long")


def countmin_bucket(col, d: int, width: int):
    """Depth-``d`` count-min bucket: 20-bit chunk ``d`` of ONE md5 per
    row, mod width — one hash per row instead of one per depth (the
    md5 chunks are independent enough for the CM overestimate bound,
    and the 3x hash saving dominates the sketch's cost at scale).
    DuckDB mirror: CAST(('0x' || substr(md5(x), 1+5*d, 5)) AS BIGINT)
    % width."""
    chunk = F.substring(F.md5(col.cast("string").cast("binary")), 1 + 5 * d, 5)
    return (F.conv(chunk, 16, 10).cast("long") % width).alias(f"__b{d}")


def countmin_table(df: DataFrame, col: str, depth: int, width: int) -> DataFrame:
    """Count-min sketch as a relation: ``depth × width`` cells
    (``__d``, ``__bucket``, ``c``).  Each input row increments one
    cell per depth; the groupBy is map-side combinable, so at most
    depth·width rows ever shuffle regardless of input size — the
    mergeable-summary contract (cells add) that lets sketches from
    disjoint partitions/days union with a second tiny groupBy.
    Buckets for all depths derive from one md5 (``countmin_bucket``);
    the row explodes AFTER hashing, so the expensive step runs once."""
    assert depth <= 6, "md5 yields 32 hex chars = six 5-hex chunks"
    hashed = df.select(
        *[countmin_bucket(F.col(col), d, width) for d in range(depth)]
    )
    pairs = F.array(
        *[
            F.struct(F.lit(d).alias("__d"), F.col(f"__b{d}").alias("__bucket"))
            for d in range(depth)
        ]
    )
    return (
        hashed.select(F.explode(pairs).alias("__c"))
        .select("__c.__d", "__c.__bucket")
        .groupBy("__d", "__bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def kmv_sketch(df: DataFrame, col: str, k: int, pre_trim: bool = False) -> DataFrame:
    """K-minimum-values (theta) distinct sketch: the ``k`` smallest
    distinct 60-bit hashes of ``col``, one row each.  Built with a
    distinct + TakeOrdered top-k.  The TakeOrdered step is k-bounded
    (per-partition heap, driver merge — never a global sort); the
    distinct's exchange, however, carries every PER-PARTITION-DISTINCT
    hash, which at extreme scale dominates.

    ``pre_trim=True`` is the production refinement that bounds that
    exchange: an Arrow pass keeps only each partition's k smallest
    DISTINCT hashes (a bounded heap over the partition stream, the
    Misra-Gries shape above), so at most k·partitions rows reach the
    global distinct.  Output-identical to the pure-relational path —
    the global k minima are each a partition-local minimum-k member —
    pinned by tests/test_round9_properties.py.  Default stays the
    pure-relational plan (the fixture-sized catalog path).

    Two sketches intersect by equi-join below the shared
    theta = min(max_a, max_b)."""
    hashes = df.select(_h60(F.col(col)).alias("h"))
    if pre_trim:
        import heapq

        import pandas as pd

        def _trim(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            # max-heap of the k smallest distinct values seen so far
            # (negated), with a set for O(1) membership — O(k) state
            heap: list = []
            members: set = set()
            for b in batches:
                for h in b["h"]:
                    h = int(h)
                    if h in members:
                        continue
                    if len(heap) < k:
                        heapq.heappush(heap, -h)
                        members.add(h)
                    elif h < -heap[0]:
                        members.discard(-heapq.heappushpop(heap, -h))
                        members.add(h)
            yield pd.DataFrame({"h": sorted(members)})

        hashes = hashes.mapInPandas(_trim, "h long")
    return hashes.distinct().orderBy("h").limit(k)


def heavy_hitters_exact(df: DataFrame, col: str, k: int) -> DataFrame:
    """Exact heavy hitters (items with ``count * (k+1) > n``) without
    ever shuffling the raw stream: pass 1 generates per-partition
    Misra-Gries candidates (union provably complete for the n/(k+1)
    threshold) AND the per-partition row counts, pass 2 exact-counts
    ONLY rows matching a broadcast of the candidate set and filters on
    the true total — exactly two scans of the stream, the two-pass
    minimum.

    Output: (col, n_occurrences, n_total) ordered by count desc."""
    # collapse the ≤(k+1)·partitions summary rows to ONE row holding
    # the deduped candidate set and the global total, then re-explode:
    # a single lineage consumer, so the Python sketch pass runs
    # exactly once (two branches would each recompute it — column
    # pruning diverges their subtrees and defeats exchange reuse) and
    # the total rides the broadcast join instead of a second pass
    one = partition_heavy_candidates(df, col, k).agg(
        F.collect_set(col).alias("__cands"),
        F.sum("part_rows").alias("n_total"),
    )
    cand_rows = one.select(F.explode("__cands").alias(col), "n_total")
    return (
        df.join(F.broadcast(cand_rows), col)
        .groupBy(col, "n_total")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") * (k + 1) > F.col("n_total"))
        .orderBy(F.desc("n_occurrences"), col)
        .select(col, "n_occurrences", "n_total")
    )
