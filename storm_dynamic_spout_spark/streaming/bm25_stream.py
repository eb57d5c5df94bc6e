"""Streaming incremental BM25 postings index over a document stream.

``streaming/ann_stream.py`` answers the incremental similarity
question for the DENSE leg — "what does this NEW vector match among
everything indexed so far?" — per micro-batch, against state that
outlives any one batch.  This module is its sparse/lexical twin: each
new document is BM25-scored against the postings index built so far,
closing the streaming half of the batch retrieval stack
(``text_bm25_rank`` / ``search_hybrid_rrf`` in catalog/llm.py).

Engine mapping:

- **State**: a parquet postings table of (doc id, token, tf, doc len)
  appended once per micro-batch.  The token IS the shuffle key:
  matching a batch against N indexed documents is an equi-join on
  token touching only same-token postings, never a scan of N.
- **Per micro-batch**: documents whose id is already indexed are
  dropped first (anti-join on id), making at-least-once re-delivery a
  complete no-op for both the match log and the index.  Surviving NEW
  documents expose their distinct tokens as query terms, probe the
  PRE-BATCH postings, and keep top-k indexed documents per query.
- **Cross-engine float discipline** (tighter than the batch scorer):
  each (query, doc, term) BM25 contribution — idf·tf·(k1+1)/(tf +
  k1·(1−b+b·dl/avgdl)) — is rounded to an integer MICRO-UNIT before
  the per-pair sum, so the sum is exact integer arithmetic:
  order-independent across partitions and identical in the DuckDB
  oracle regardless of either engine's addition order.  Ranking
  compares (micro-score desc, doc id); the reported score is
  micro/1e6.
- **Statistics**: N, Σdl and per-token df come from the pre-batch
  postings at match time — idf therefore reflects the index AS OF the
  batch, exactly reproducible from the batch schedule.
- **Growth**: the index grows by exactly the unique documents
  ingested; per-batch cost is Σ_t q_t·df_t over the batch's tokens,
  independent of history length beyond posting-list occupancy.  At
  scale, stopword-cap the probe (drop tokens above a df ceiling) to
  bound the heaviest lists — the batch BM25's idf already zeroes
  their contribution asymptotically.

The final match log of a deterministic batch schedule is
SQL-expressible (staged half-corpus CTEs — catalog/llm.py
``_stream_bm25_sql``), so the catalog entry carries a full DuckDB
oracle; multi-batch stateful mechanics get scenario coverage in
tests/test_bm25_stream.py, mirroring tests/test_ann_stream.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

#: Okapi BM25 constants — same values as the batch scorer
#: (catalog/llm.py BM25_K1/BM25_B) so the two legs rank consistently.
BM25_STREAM_K1 = 1.2
BM25_STREAM_B = 0.75
BM25_STREAM_K = 5


def score_against_postings(
    postings: DataFrame,
    q_terms: DataFrame,
    k: int = BM25_STREAM_K,
    max_df_frac: float | None = None,
) -> DataFrame:
    """Top-k BM25 matches of query-term rows (query_id, __tok) against
    a postings table (__id, __dl, __tok, __tf) — the pure per-batch
    probe plan, shared by :class:`StreamingBm25Index.process_batch`
    and the scale-smoke shape (examples/scale_smoke.py
    bm25_stream_probe).  Statistics (N, Σdl, df) come from the
    postings argument itself — the caller decides what "the index so
    far" means.

    ``max_df_frac`` is the SCALE knob: tokens appearing in more than
    that fraction of indexed documents are elided from the probe
    (Lucene-style stopword ceiling).  The probe join's output is
    Σ_t q_t·df_t — dominated by exactly the near-stopword tokens whose
    idf ≈ ln(1 + ~0.5/N) contributes least to the score — so the cap
    bounds the heaviest posting lists while the ranking over
    discriminative terms survives.  ``None`` (the default, and what
    the oracle-matched catalog query uses) scores exactly."""
    stats = (
        postings.select("__id", "__dl")
        .distinct()
        .agg(
            F.count(F.lit(1)).cast("long").alias("__n_docs"),
            F.sum("__dl").cast("long").alias("__sum_dl"),
        )
    )
    dfx = postings.groupBy("__tok").agg(
        F.count(F.lit(1)).cast("long").alias("__df")
    )
    if max_df_frac is not None:
        # the df table is vocab-sized and stats is one row: the filter
        # runs broadcast-side, and the INNER dfx join below then prunes
        # the capped tokens out of the probe before the heavy join
        dfx = (
            dfx.crossJoin(F.broadcast(stats))
            .filter(F.col("__df") <= F.lit(max_df_frac) * F.col("__n_docs"))
            .select("__tok", "__df")
        )
    avgdl = F.col("__sum_dl").cast("double") / F.col("__n_docs")
    idf = F.log(
        1 + (F.col("__n_docs") - F.col("__df") + 0.5) / (F.col("__df") + 0.5)
    )
    part = (
        idf
        * F.col("__tf")
        * (BM25_STREAM_K1 + 1)
        / (
            F.col("__tf")
            + BM25_STREAM_K1
            * (1 - BM25_STREAM_B + BM25_STREAM_B * F.col("__dl") / avgdl)
        )
    )
    # integer micro-units BEFORE the sum: exact, order-free
    micro = F.round(part * 1_000_000).cast("long")
    w = W.partitionBy("query_id").orderBy(F.desc("__ms"), "__id")
    # dfx joins FIRST: inner, so a capped df table prunes stopword
    # postings before they ever meet the query side
    return (
        postings.join(dfx, "__tok")
        .join(F.broadcast(q_terms), "__tok")
        .crossJoin(F.broadcast(stats))
        .withColumn("__micro", micro)
        .groupBy("query_id", "__id")
        .agg(
            F.sum("__micro").cast("long").alias("__ms"),
            F.count(F.lit(1)).cast("long").alias("n_terms"),
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("__id").alias("doc_id"),
            "n_terms",
            (F.col("__ms") / F.lit(1_000_000.0)).alias("score"),
            "rank",
        )
    )


class StreamingBm25Index:
    """The persistent postings index + the per-batch match step."""

    def __init__(
        self,
        workdir: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        k: int = BM25_STREAM_K,
    ) -> None:
        self.postings_dir = os.path.join(workdir, "postings")
        self.match_dir = os.path.join(workdir, "matches")
        self.id_col = id_col
        self.text_col = text_col
        self.k = k
        os.makedirs(self.postings_dir, exist_ok=True)
        os.makedirs(self.match_dir, exist_ok=True)
        # heal a crash inside a previous compact_index swap — without
        # this, the makedirs above would present a silently-empty index
        from storm_dynamic_spout_spark.streaming.dirswap import (
            recover_interrupted_swap,
        )

        recover_interrupted_swap(self.postings_dir)

    # -- state ---------------------------------------------------------------

    def _has_files(self, d: str) -> bool:
        return any(f.endswith(".parquet") for f in os.listdir(d))

    def postings_df(self, spark: SparkSession) -> DataFrame | None:
        if not self._has_files(self.postings_dir):
            return None
        return spark.read.parquet(self.postings_dir)

    def matches(self, spark: SparkSession) -> DataFrame | None:
        if not self._has_files(self.match_dir):
            return None
        return spark.read.parquet(self.match_dir)

    def compact_index(self, spark: SparkSession, target_files: int = 1) -> int:
        """Merge the per-batch postings files into ``target_files``,
        dedup-by-(id, token) in the process — same maintenance-window
        contract as StreamingAnnIndex.compact_index.  Returns the
        postings row count after compaction.  Crash-safe via
        streaming/dirswap.py."""
        from storm_dynamic_spout_spark.streaming.dirswap import swap_publish

        pos = self.postings_df(spark)
        if pos is None:
            return 0
        merged = pos.dropDuplicates(["__id", "__tok"]).repartition(target_files)
        swap_publish(
            self.postings_dir,
            lambda tmp: merged.write.mode("overwrite").parquet(tmp),
        )
        return self.postings_df(spark).count()

    # -- the per-batch step --------------------------------------------------

    def _prepared(self, df: DataFrame) -> DataFrame:
        """Postings rows (__id, __dl, __tok, __tf) for one batch — the
        same whitespace tokenization as the batch BM25 scorer."""
        toks = df.select(
            F.col(self.id_col).alias("__id"),
            F.split(F.col(self.text_col), r"\s+").alias("__t"),
        )
        return (
            toks.select(
                "__id",
                F.size("__t").cast("long").alias("__dl"),
                F.explode("__t").alias("__tok"),
            )
            .groupBy("__id", "__dl", "__tok")
            .agg(F.count(F.lit(1)).cast("long").alias("__tf"))
        )

    def process_batch(self, batch_df: DataFrame) -> None:
        """Score one micro-batch against the pre-batch postings, append
        the match log and the new postings.

        The match log materializes BEFORE the postings append so its
        lineage reads the pre-append index files; already-indexed ids
        are dropped first, so re-delivered batches are a complete
        no-op (idempotent under at-least-once)."""
        spark = batch_df.sparkSession
        new = self._prepared(batch_df)
        seen = self.postings_df(spark)
        if seen is not None:
            new = new.join(
                seen.select("__id").distinct(), "__id", "left_anti"
            )
        new = new.localCheckpoint(eager=True)
        if seen is not None:
            # statistics AS OF the pre-batch index: score_against_
            # postings derives (N, Σdl, df) from `seen` itself
            q = new.select(F.col("__id").alias("query_id"), "__tok")
            matches = score_against_postings(seen, q, self.k)
            matches.write.mode("append").parquet(self.match_dir)
        new.write.mode("append").parquet(self.postings_dir)
