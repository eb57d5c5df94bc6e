"""Text-analysis operators: tokenization, quality scoring, language ID,
fingerprinting (north-star extension; SURVEY §2.11 engine mapping).

Everything is built-in `pyspark.sql.functions` — no Python UDFs — so the
expressions stay inside whole-stage codegen and scale linearly with the
scan. Each operator has a deterministic SQL-portable definition so the
DuckDB oracle can replicate it exactly (constants shared from here).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: BPE-ish token pattern: word pieces or single non-space symbols.
TOKEN_PATTERN = r"[a-zA-Z0-9]+|[^a-zA-Z0-9\s]"

#: Stopword lists for the language-ID heuristic (tiny, deterministic).
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it"),
    "es": ("el", "la", "de", "y", "que", "en", "un", "es"),
    "fr": ("le", "la", "de", "et", "que", "en", "un", "est"),
    "de": ("der", "die", "das", "und", "zu", "in", "ein", "ist"),
}

#: Stopwords used for the quality score (English core).
QUALITY_STOPWORDS = STOPWORDS["en"]


def tokens(col: Column) -> Column:
    """Whitespace tokens (the corpus fixture is space-separated)."""
    return F.split(col, r"\s+")


def bpe_ish_tokens(col: Column) -> Column:
    """Regex token split approximating a BPE pre-tokenizer (group 0 =
    whole match; pyspark defaults to group 1)."""
    return F.regexp_extract_all(col, F.lit(TOKEN_PATTERN), F.lit(0))


def token_count(col: Column) -> Column:
    return F.size(tokens(col)).cast("long")


def distinct_tokens(col: Column) -> Column:
    return F.array_distinct(tokens(col))


def stopword_ratio(col: Column, words: tuple[str, ...] = QUALITY_STOPWORDS) -> Column:
    """Fraction of tokens that are stopwords (0 when empty)."""
    toks = tokens(col)
    hits = F.size(F.filter(toks, lambda x: x.isin(*words)))
    return (hits.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double"))


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are neither alphanumeric nor space."""
    stripped = F.regexp_replace(col, r"[a-zA-Z0-9\s]", "")
    return F.length(stripped).cast("double") / F.greatest(F.length(col), F.lit(1)).cast(
        "double"
    )


def avg_token_len(col: Column) -> Column:
    toks = tokens(col)
    return F.length(F.regexp_replace(col, r"\s+", "")).cast("double") / F.greatest(
        F.size(toks), F.lit(1)
    ).cast("double")


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: long enough, low punctuation,
    some (but not all) stopwords — the standard cheap pre-filter in
    training-data pipelines."""
    len_score = F.least(F.length(col).cast("double") / F.lit(500.0), F.lit(1.0))
    punct_pen = F.lit(1.0) - F.least(punct_ratio(col) * 5, F.lit(1.0))
    sw = stopword_ratio(col)
    sw_score = F.lit(1.0) - F.abs(sw - F.lit(0.4))
    return (len_score + punct_pen + sw_score) / F.lit(3.0)


def lang_scores(col: Column) -> dict[str, Column]:
    """Per-language stopword hit-rate."""
    toks = tokens(col)
    denom = F.greatest(F.size(toks), F.lit(1)).cast("double")
    def hit(words: tuple[str, ...]):
        # closure factory: a (x, w=words) default-arg lambda would be
        # mis-detected as pyspark's 2-arg (element, index) lambda form
        return lambda x: x.isin(*words)

    return {
        lang: F.size(F.filter(toks, hit(words))).cast("double") / denom
        for lang, words in STOPWORDS.items()
    }


def lang_id(col: Column) -> Column:
    """Argmax language by stopword hit-rate, alphabetical tie-break,
    'und' (undetermined) when no list scores > 0."""
    scores = lang_scores(col)
    best = F.lit("und")
    best_score = F.lit(0.0)
    for lang in sorted(STOPWORDS, reverse=True):
        s = scores[lang]
        # >= so the alphabetically-earliest language wins ties
        best = F.when(s >= best_score, F.lit(lang)).otherwise(best)
        best_score = F.greatest(s, best_score)
    return F.when(best_score > 0, best).otherwise(F.lit("und"))


def normalize_text(col: Column) -> Column:
    """Canonical form for exact-dup hashing: lowercase, collapse runs of
    whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def content_fingerprint(col: Column) -> Column:
    """MD5 of normalized text — parity with the reference's use of MD5
    identity hashing (dynamic/Tools.java:139 makeMd5Hash)."""
    return F.md5(normalize_text(col).cast("binary"))


def token_hash(col: Column) -> Column:
    """Deterministic 60-bit integer hash of a token, identical in Spark
    and DuckDB: first 15 hex chars of md5 → bigint."""
    return F.conv(F.substring(F.md5(col.cast("binary")), 1, 15), 16, 10).cast("long")


# --- SQL (DuckDB) mirrors of the above, for oracle construction --------


def sql_tokens(expr: str) -> str:
    return f"regexp_split_to_array({expr}, '\\s+')"


def sql_stopword_ratio(expr: str, words: tuple[str, ...]) -> str:
    in_list = ", ".join(f"'{w}'" for w in words)
    toks = sql_tokens(expr)
    return (
        f"(CAST(len(list_filter({toks}, x -> x IN ({in_list}))) AS DOUBLE)"
        f" / CAST(greatest(len({toks}), 1) AS DOUBLE))"
    )


def sql_punct_ratio(expr: str) -> str:
    return (
        f"(CAST(length(regexp_replace({expr}, '[a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)"
        f" / CAST(greatest(length({expr}), 1) AS DOUBLE))"
    )


def sql_token_hash(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


# -- PII scrubbing (pipeline redaction pass) --------------------------------

#: RE2-compatible patterns (run on both Spark/Java regex and DuckDB/RE2)
PII_EMAIL_PATTERN = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_NUMBER_PATTERN = "[0-9]{6,}"


def pii_scrub(col: Column) -> Column:
    """Redact emails then long digit runs (order matters: an email may
    contain digits). Pure regexp_replace — JVM-side, no UDF."""
    out = F.regexp_replace(col, PII_EMAIL_PATTERN, "<EMAIL>")
    return F.regexp_replace(out, PII_NUMBER_PATTERN, "<NUM>")


def pii_counts(col: Column) -> tuple[Column, Column]:
    """(n_emails, n_numbers) found in the column."""
    return (
        F.size(F.regexp_extract_all(col, F.lit(PII_EMAIL_PATTERN), F.lit(0))).cast("long"),
        F.size(F.regexp_extract_all(col, F.lit(PII_NUMBER_PATTERN), F.lit(0))).cast("long"),
    )


def fuzzy_string_join(
    dirty,
    clean,
    dirty_id: str,
    dirty_name: str,
    clean_id: str,
    clean_name: str,
    block_len: int = 3,
    max_dist: int = 1,
):
    """Approximate string join for entity resolution: candidates must
    share a ``block_len``-char prefix AND be within ``max_dist`` of
    each other in length (both necessary conditions for edit distance
    ≤ max_dist when the edit sits past the prefix), then the exact
    Levenshtein verify runs only inside the blocks — the standard
    blocked fuzzy-match, never all-pairs.

    Why at 100 TB: the block key is an equi-join column, so candidates
    co-locate in one hash exchange and the quadratic Levenshtein work
    is bounded per block (pick block_len so blocks stay ~constant
    size; longer prefixes trade recall on early typos for smaller
    blocks).  Levenshtein is a JVM intrinsic — no Python."""
    d = dirty.select(
        F.col(dirty_id),
        F.col(dirty_name),
        F.substring(dirty_name, 1, block_len).alias("__blk"),
        F.length(dirty_name).alias("__dl"),
    )
    c = clean.select(
        F.col(clean_id),
        F.col(clean_name),
        F.substring(clean_name, 1, block_len).alias("__blk"),
        F.length(clean_name).alias("__cl"),
    )
    return (
        d.join(c, "__blk")
        .filter(F.abs(F.col("__dl") - F.col("__cl")) <= max_dist)
        .withColumn(
            "edit_distance",
            F.levenshtein(F.col(dirty_name), F.col(clean_name)).cast("long"),
        )
        .filter(F.col("edit_distance") <= max_dist)
        .select(dirty_id, clean_id, "edit_distance")
    )


def chars(col: Column) -> Column:
    """A word's character-symbol array — the BPE symbol start state.

    Pure Column ops (no rendered-SQL splicing): works for arbitrary
    column expressions — quotes, literals, nested functions — and
    under Spark Connect, where ``Column._jc`` does not exist.  The
    empty-string guard matters: Spark's sequence(1, 0) DESCENDS
    ([1, 0]), so '' would otherwise yield ['', ''] instead of []."""
    return F.when(
        F.length(col) < 1, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length(col)),
            lambda i: col.substr(i, F.lit(1)),
        )
    )


def apply_bpe_merge(syms: Column, a: Column | str, b: Column | str) -> Column:
    """One greedy left-to-right BPE merge over a symbol array: whenever
    the accumulated tail equals ``a`` and the next symbol is ``b``,
    replace the tail with ``a||b`` — the EXACT fold
    ``text_bpe_learn_merges`` trains with (catalog/llm.py), exposed so
    tokenizer APPLICATION shares the trainer's semantics symbol for
    symbol.  Pure column expression: map-only, codegen-friendly."""
    a = F.lit(a) if isinstance(a, str) else a
    b = F.lit(b) if isinstance(b, str) else b
    return F.when(F.size(syms) <= 1, syms).otherwise(
        F.aggregate(
            F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0))),
            F.array(F.element_at(syms, 1)),
            lambda acc, x: F.when(
                (F.element_at(acc, -1) == a) & (x == b),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(F.concat(a, b)),
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )
    )


def apply_bpe_merges(syms: Column, merges: "list[tuple[str, str]]") -> Column:
    """Tokenizer APPLICATION: run an ordered learned-merge table over a
    symbol array, one greedy pass per merge in training order — the
    standard BPE encode for a small merge table (each merge is one
    map-only fold; the expression tree grows linearly in |merges|, so
    for vocab-scale tables batch the corpus through a pandas-UDF trie
    instead — this form is for the first-K-merges analyses the
    training queries report on)."""
    out = syms
    for a, b in merges:
        out = apply_bpe_merge(out, a, b)
    return out


def _bpe_encode_one(word: str, merge_index: "dict[tuple[str, str], int]") -> "list[str]":
    """Encode ONE word under the trainer's pass semantics — each merge
    gets exactly one greedy left-to-right non-overlapping pass, in
    training order — in time independent of the merge-table size.

    A rank-heap schedules only the merges whose pair is actually
    adjacent in this word: pop the smallest un-run rank, run its pass,
    rescan for newly-adjacent pairs and push their ranks IF GREATER
    than the current one (a pass whose turn already went never re-runs
    — the semantic difference from the iterative lowest-rank-anywhere
    encode, pinned by the 'xab' fixture in tests/test_round14_ops.py).
    Work is O(len(word)^2 log len) worst case and zero merges-table
    scans, vs O(|merges| * len) for the pass-by-pass fold — the
    vocab-scale path (50k-merge tables) the expression-tree form
    explicitly scopes itself away from."""
    import heapq

    syms = list(word)
    if len(syms) < 2:
        return syms
    heap: list[int] = []
    pushed: set[int] = set()

    def push_adjacent(min_exclusive: int) -> None:
        for i in range(len(syms) - 1):
            r = merge_index.get((syms[i], syms[i + 1]))
            if r is not None and r > min_exclusive and r not in pushed:
                pushed.add(r)
                heapq.heappush(heap, r)

    push_adjacent(-1)
    merges_by_rank = {r: ab for ab, r in merge_index.items()}
    while heap:
        r = heapq.heappop(heap)
        a, b = merges_by_rank[r]
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
        push_adjacent(r)
    return syms


def collect_merge_table(tops: "list[DataFrame]") -> "list[tuple[str, str]]":
    """Materialize a learned merge schedule (one 1-row ``(merge_rank,
    pair_a, pair_b, cnt)`` frame per training iteration, in training
    order) into the plain ``[(a, b), ...]`` table
    :func:`bpe_encode_words` ships to executors.

    This is the engine's one deliberate tokenizer-model collect — the
    bloom-gauge class: MODEL-sized (|merges| rows: 3 in the catalog
    fixture, ~50k in production), never corpus-sized, and paid once per
    encode job.  Lives here rather than in catalog code so the
    catalog-stays-lazy source guard
    (tests/test_plan_guards.py::test_catalog_source_has_no_driver_collects)
    keeps its zero-exception contract."""
    return [
        (str(r["pair_a"]), str(r["pair_b"]))
        for top in tops
        for r in top.collect()
    ]


def bpe_encode_words(
    df: DataFrame,
    word_col: str,
    merges: "list[tuple[str, str]]",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Vocab-scale tokenizer APPLICATION: encode every word under an
    ordered learned-merge table via Arrow-batched ``mapInPandas`` — the
    documented scale path `apply_bpe_merges` defers to (its expression
    tree grows linearly in |merges|, unusable for a 50k-merge vocab).
    Appends ``out_col: array<string>`` to the input schema.  Semantics
    are EXACTLY the trainer's fold — one greedy left-to-right pass per
    merge in training order — pinned against `apply_bpe_merges` on
    overlapping-run and rank-revisit words in tests/test_round14_ops.py.

    Why at 100 TB: map-only (narrow — partitioning is preserved, no
    shuffle), the merge table rides the closure ONCE per executor as a
    plain dict (model-sized; for multi-GB vocabs ship it via
    SparkFiles instead), and each Arrow batch amortizes the Python
    crossing — the same pattern as the multimodal codec decodes, the
    only other Python stages in the engine."""
    from pyspark.sql.types import (
        ArrayType,
        StringType,
        StructField,
        StructType,
    )

    merge_index = {
        (str(a), str(b)): r for r, (a, b) in enumerate(merges)
    }
    # build a FRESH StructType: StructType.add mutates in place, and
    # df.schema is the live analyzed schema — appending to it makes the
    # DataFrame claim a column its plan doesn't have
    schema = StructType(
        list(df.schema.fields)
        + [StructField(out_col, ArrayType(StringType()))]
    )

    def encode(batches):
        for pdf in batches:
            pdf[out_col] = [
                _bpe_encode_one("" if w is None else str(w), merge_index)
                for w in pdf[word_col]
            ]
            yield pdf

    return df.mapInPandas(encode, schema)
