"""Corpus-level training-data operators: contamination screening,
sequence packing, deterministic export shuffling (north-star extension
beyond the reference's operator set — BASELINE.json pipeline family).

All three are built to the same 100 TB rules as operators/dedup.py:
- candidate generation is an EQUI-JOIN on md5-derived integer keys,
  never an all-pairs comparison (contamination joins train n-grams to
  the eval gram set on the gram hash);
- nothing depends on nondeterminism — hashes, not rand(), drive
  sampling/shuffling, so re-runs, resumed jobs, and different engines
  agree row-for-row;
- global orderings are avoided: packing runs per language stream
  (Window.partitionBy), export shuffling per shard, so no stage
  collapses to a single task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from storm_dynamic_spout_spark.operators.skew import fan_out_narrow


#: Fraction-rounding scale for engine-portable ratio reports.
_FRAC_MICRO = 1_000_000


def md5_int(col: Column) -> Column:
    """Engine-portable 60-bit integer hash: first 15 hex digits of md5
    (DuckDB twin: ``CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)``)."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 15), 16, 10).cast("long")


def token_ngrams(text: Column, n: int) -> Column:
    """Distinct token ``n``-gram STRINGS of a document — the pre-hash
    form of :func:`token_ngram_hashes`, for call sites that deduplicate
    ACROSS documents before hashing (one md5 per distinct vocabulary
    gram instead of one per gram instance — measured ~40% off the
    contamination vocab build on the fixtures' repeat-heavy corpus)."""
    toks = F.split(text, r"\s+")
    # short-doc guard: Spark's sequence(1, 0) DESCENDS ([1, 0]), so a
    # doc with fewer than n tokens would hit slice(start=0) — a runtime
    # error, not an empty gram set
    grams = F.when(
        F.size(toks) < n, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
    )
    return F.array_distinct(grams)


def token_ngram_hashes(text: Column, n: int) -> Column:
    """Distinct hashed token ``n``-grams of a document — the
    contamination / overlap unit. Token n-grams (not char shingles)
    because eval-set leakage is verbatim phrase reuse. Hashed to int64
    so the explode+join shuffles 8-byte keys, not strings; the hash
    runs AFTER the per-doc distinct (distinct strings ↔ distinct
    hashes, so the output is unchanged — md5 is applied once per
    distinct gram)."""
    return F.transform(token_ngrams(text, n), lambda g: md5_int(g))


def contamination(
    train: DataFrame,
    eval_set: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 8,
) -> DataFrame:
    """Train documents sharing >=1 hashed token n-gram with the eval
    set: ``(doc_id, n_shared_grams)``, one row per contaminated doc.

    Scale shape: explode both sides to (doc, gram_hash), equi-join on
    the hash (the eval gram set is typically small enough that AQE
    broadcasts it), aggregate per train doc. Work is linear in total
    grams; there is no train×eval document cross product anywhere.
    """
    # the gram build is the CPU-heavy per-row pass; a one-row-group
    # input would otherwise run it on one core (fan_out_narrow note)
    train_grams = fan_out_narrow(train).select(
        F.col(id_col), F.explode(token_ngram_hashes(F.col(text_col), ngram)).alias("__g")
    )
    # gram-set side: dedup raw strings first, hash once per distinct
    # gram (the token_ngrams/md5_int split — see eval_contamination)
    eval_grams = (
        fan_out_narrow(eval_set)
        .select(F.explode(token_ngrams(F.col(text_col), ngram)).alias("__gs"))
        .distinct()
        .select(md5_int(F.col("__gs")).alias("__g"))
    )
    return (
        train_grams.join(eval_grams, "__g")
        .groupBy(id_col)
        .agg(F.countDistinct("__g").alias("n_shared_grams"))
    )


def eval_contamination(
    train: DataFrame,
    eval_set: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """The EVAL-side contamination readout, complementing
    :func:`contamination` (which screens the train side): per eval
    document, what fraction of its distinct token n-grams appears
    ANYWHERE in the train corpus — the decision statistic an eval-suite
    owner uses to drop leaked items (the n-gram-overlap
    decontamination convention of large-LM training reports).

    Returns ``(doc_id, n_grams, n_overlapping, overlap_frac, flagged)``
    with ``overlap_frac`` micro-rounded (exact integer counts over a
    correctly-rounded division, engine-portable) and NULL for eval
    docs shorter than ``ngram`` tokens (no grams — no evidence either
    way; ``flagged`` is false for them).

    Scale shape: both sides explode to (doc, gram_hash); the TRAIN
    gram VOCABULARY deduplicates first (one hash aggregate — it is the
    big side's distinct gram set, far smaller than its gram
    instances), then a left semi-style membership join on the 8-byte
    hash feeds one per-eval-doc aggregate.  No train×eval document
    product anywhere; eval is typically tiny next to train, so the
    join's probe side is eval-gram-sized."""
    # explode_outer keeps zero-gram eval docs as a single NULL-gram row
    # (a NULL key never matches the membership join, and count(__g)
    # skips it), so every eval doc reaches the one per-doc aggregate —
    # no separate reattach join of the eval id list afterwards (was:
    # a second eval scan + an extra doc_id exchange + sort-merge join)
    # gram builds are the CPU-heavy per-row passes; one-row-group
    # inputs would otherwise run them on one core (fan_out_narrow note)
    eval_grams = fan_out_narrow(eval_set).select(
        F.col(id_col),
        F.explode_outer(token_ngram_hashes(F.col(text_col), ngram)).alias("__g"),
    )
    # vocabulary side: dedup the raw gram strings FIRST, hash once per
    # distinct gram — the corpus-sized md5 work drops to vocab-sized
    train_vocab = (
        fan_out_narrow(train)
        .select(
            F.explode(token_ngrams(F.col(text_col), ngram)).alias("__gs")
        )
        .distinct()
        .select(md5_int(F.col("__gs")).alias("__g"))
        .withColumn("__hit", F.lit(1))
    )
    per_doc = (
        eval_grams.join(train_vocab, "__g", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.col("__g")).cast("long").alias("n_grams"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
            .cast("long")
            .alias("n_overlapping"),
        )
    )
    frac = F.round(
        F.col("n_overlapping") / F.col("n_grams") * F.lit(_FRAC_MICRO)
    ) / F.lit(_FRAC_MICRO)
    return per_doc.select(
        id_col,
        "n_grams",
        "n_overlapping",
        F.when(F.col("n_grams") > 0, frac).alias("overlap_frac"),
        F.when(
            F.col("n_grams") > 0, frac >= F.lit(threshold)
        ).otherwise(F.lit(False)).alias("flagged"),
    )


def pack_sequences(
    docs: DataFrame,
    budget: int,
    stream_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Offset-based sequence packing: concatenate each stream's
    documents in id order and cut every ``budget`` tokens — the
    standard LLM-pretraining packing layout, computed as metadata
    (start offset, sequence index, sequences spanned) without moving
    any text.

    One window per stream (no global ordering): cumulative token sums
    run per ``stream_col`` partition, so the operator parallelizes
    across streams and a 100 TB corpus packs shard-by-shard.
    """
    n_tok = F.size(F.split(F.col(text_col), r"\s+")).cast("long")
    win = (
        Window.partitionBy(stream_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("__n").over(win), F.lit(0)).cast("long")
    out = docs.withColumn("__n", n_tok).withColumn("start_offset", start)
    seq = F.expr(f"start_offset div {budget}")
    last_seq = F.expr(f"(start_offset + greatest(__n, 1) - 1) div {budget}")
    return out.select(
        F.col(id_col),
        F.col(stream_col),
        F.col("__n").alias("n_tokens"),
        "start_offset",
        seq.cast("long").alias("seq_index"),
        (last_seq - seq + 1).cast("long").alias("n_seqs"),
    )


def export_shuffle(
    docs: DataFrame, n_shards: int, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic training-export shuffle: md5(doc_id) assigns every
    document a shard and a rank within it — a reproducible global
    permutation with no rand() and no global sort (each shard orders
    independently; ``write_clustered(partition_by=['shard'])`` then
    lands one directory per shard)."""
    h = md5_int(F.col(id_col).cast("string"))
    win = Window.partitionBy("shard").orderBy("__h", id_col)
    return (
        docs.select(F.col(id_col))
        .withColumn("__h", h)
        .withColumn("shard", F.pmod(F.col("__h"), F.lit(n_shards)).cast("long"))
        .withColumn("shuffle_rank", F.row_number().over(win).cast("long"))
        .drop("__h")
    )


def decontamination_report(
    train: DataFrame,
    eval_set: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    ngram: int = 8,
) -> DataFrame:
    """Per-TRAIN-SOURCE leakage budget — the decontamination readout a
    corpus owner acts on (staged for the round-15 catalog): where
    :func:`eval_contamination` scores each eval document, this
    attributes the leak back to corpus COMPOSITION, answering "which
    ingest source do I have to scrub, and how much eval text does it
    leak?".

    One row per train source with ≥1 shared gram:

    - ``n_shared_grams`` — distinct gram hashes in the source's train
      vocabulary that also appear anywhere in the eval set;
    - ``n_eval_docs_touched`` — eval documents sharing ≥1 gram with
      the source;
    - ``n_leaked_gram_slots`` — distinct (eval doc, gram) pairs covered
      by the source: the same gram leaking into three eval docs is
      three slots (the per-doc drop decisions it influences);
    - ``leaked_token_budget`` — ``n_leaked_gram_slots * ngram``, the
      standard upper bound on leaked eval tokens attributable to the
      source (distinct grams overlap, so it is a budget, not a count).

    Scale shape: both sides explode to gram hashes and DEDUPLICATE
    before the join — train to (source, gram) (one hash aggregate; far
    smaller than the gram instances), eval to (doc, gram).  The join
    is a gram-hash equi-join (eval-gram-sized probe side), then one
    per-source aggregate.  No train×eval doc product; attribution adds
    one |sources| fan-out ONLY on grams that actually leak."""
    # gram builds are the CPU-heavy per-row passes (fan_out_narrow note)
    train_vocab = (
        fan_out_narrow(train)
        .select(
            F.col(source_col).alias("source"),
            F.explode(token_ngrams(F.col(text_col), ngram)).alias("__gs"),
        )
        .dropDuplicates(["source", "__gs"])
        .select("source", md5_int(F.col("__gs")).alias("__g"))
    )
    eval_grams = fan_out_narrow(eval_set).select(
        F.col(id_col).alias("__eid"),
        F.explode(token_ngram_hashes(F.col(text_col), ngram)).alias("__g"),
    )
    return (
        eval_grams.join(train_vocab, "__g")
        .groupBy("source")
        .agg(
            F.count_distinct("__g").cast("long").alias("n_shared_grams"),
            F.count_distinct("__eid").cast("long").alias("n_eval_docs_touched"),
            F.count(F.lit(1)).cast("long").alias("n_leaked_gram_slots"),
            (F.count(F.lit(1)) * F.lit(ngram))
            .cast("long")
            .alias("leaked_token_budget"),
        )
    )
