"""Scalar function surface (SURVEY §2.8 — declared).

The reference's only scalar computations are MD5 of serialized filters
(dynamic/Tools.java:139) and Gson JSON (de)serialization
(dynamic/JSON.java:42-92); the engine declares the standard Spark
function families. Everything here is JVM-side whole-stage-codegen —
no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from storm_dynamic_spout_spark.catalog.registry import query, t


@query(
    "scalar_string",
    oracle="""
    SELECT p_partkey,
           upper(p_brand)                              AS brand_upper,
           lower(p_type)                               AS type_lower,
           concat(p_brand, ':', p_type)                AS brand_type,
           substring(p_name, 1, 8)                     AS name_prefix,
           CAST(length(p_name) AS BIGINT)              AS name_len,
           replace(p_name, ' ', '_')                   AS name_snake,
           md5(p_name)                                 AS name_md5,
           CAST(length(p_name) - length(replace(p_name, ' ', '')) + 1 AS BIGINT) AS n_words
    FROM part
    """,
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: case, concat, substring, length, replace, md5
    (md5 parity with the reference's Tools.makeMd5Hash)."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.regexp_replace(F.col("p_name"), " ", "_").alias("name_snake"),
        F.md5(F.col("p_name").cast("binary")).alias("name_md5"),
        (F.length("p_name") - F.length(F.regexp_replace(F.col("p_name"), " ", "")) + 1)
        .cast("long")
        .alias("n_words"),
    )


@query(
    "scalar_regex",
    oracle="""
    SELECT p_partkey, p_type,
           regexp_extract(p_type, '^([a-z]+)', 1)         AS first_word,
           CASE WHEN regexp_matches(p_type, 'br') THEN 1 ELSE 0 END AS has_br,
           regexp_replace(p_type, '[aeiou]', '*', 'g')    AS devoweled
    FROM part
    """,
)
def scalar_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex family: extract / match-test / global replace.

    Note: Spark regexp_replace is global by default; DuckDB needs the
    'g' flag — the oracle encodes that.
    """
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        "p_type",
        F.regexp_extract("p_type", "^([a-z]+)", 1).alias("first_word"),
        F.when(F.col("p_type").rlike("br"), 1).otherwise(0).alias("has_br"),
        F.regexp_replace("p_type", "[aeiou]", "*").alias("devoweled"),
    )


@query(
    "scalar_date",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(YEAR  FROM o_orderdate) AS BIGINT) AS order_year,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS order_month,
           CAST(EXTRACT(DAY   FROM o_orderdate) AS BIGINT) AS order_day,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS BIGINT) AS days_since_95,
           CAST(EXTRACT(EPOCH FROM o_orderdate) AS BIGINT) AS epoch_s
    FROM orders
    """,
)
def scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: extract, trunc, diff, epoch."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp"))
        .cast("long")
        .alias("days_since_95"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    )


@query(
    "scalar_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount) * 100) / 100 AS net_price,
           floor(l_quantity)   AS qty_floor,
           ceil(l_discount * 100) AS disc_pct_ceil,
           abs(l_quantity - 25)   AS qty_dev,
           power(l_quantity, 2)   AS qty_sq,
           ln(l_extendedprice)    AS log_price,
           sqrt(l_quantity)       AS qty_sqrt
    FROM lineitem
    WHERE l_extendedprice > 0
    """,
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family.

    Round-to-cents is written ``round(x*100)/100``, not ``round(x, 2)``:
    Spark's 2-arg round on doubles rounds the exact binary expansion
    while DuckDB rounds the shortest decimal representation, so they
    disagree on ...4999999996-style products; the scale-then-round form
    computes identical doubles in both engines.
    """
    li = t(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_extendedprice") > 0).select(
        "l_orderkey",
        "l_linenumber",
        (F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100) / 100).alias(
            "net_price"
        ),
        F.floor("l_quantity").cast("double").alias("qty_floor"),
        F.ceil(F.col("l_discount") * 100).cast("double").alias("disc_pct_ceil"),
        F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
        F.pow("l_quantity", F.lit(2)).alias("qty_sq"),
        F.log(F.col("l_extendedprice")).alias("log_price"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
    )


@query(
    "scalar_conditional",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debtor'
                WHEN c_acctbal < 5000 THEN 'regular'
                ELSE 'premium' END             AS tier,
           coalesce(nullif(c_mktsegment, 'AUTOMOBILE'), 'CAR') AS segment_renamed,
           greatest(c_acctbal, 0.0)            AS bal_clamped,
           least(c_acctbal, 1000.0)            AS bal_capped
    FROM customer
    """,
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE / COALESCE / NULLIF / GREATEST / LEAST."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debtor")
        .when(F.col("c_acctbal") < 5000, "regular")
        .otherwise("premium")
        .alias("tier"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("AUTOMOBILE")), F.lit("CAR")).alias(
            "segment_renamed"
        ),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_clamped"),
        F.least(F.col("c_acctbal"), F.lit(1000.0)).alias("bal_capped"),
    )


@query(
    "scalar_json",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
    FROM events
    """,
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family over events.props (JSON-in-string fixture column) —
    the engine's deserializer-parse operator (P1,
    kafka/deserializer/Deserializer.java:36-50 → from_json/get_json_object)."""
    e = t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("k_value"),
    )


@query(
    "scalar_json_schema",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           avg(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS avg_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def scalar_json_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON parse via from_json + downstream agg (the P1 parse
    operator feeding the declared aggregate surface)."""
    e = t(spark, sf_dir, "events")
    parsed = e.select(
        "event_type", F.from_json("props", "k BIGINT").alias("p")
    )
    return (
        parsed.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.avg(F.col("p.k")).alias("avg_k"))
        .orderBy("event_type")
    )


@query(
    "scalar_array",
    oracle="""
    SELECT vec_id, label,
           CAST(len(embedding) AS BIGINT)                             AS dim,
           CAST(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS DOUBLE) AS sq_norm,
           CAST(embedding[1] AS DOUBLE)                               AS first_elem,
           CAST(list_sum(list_transform(embedding[1:8], x -> CAST(x AS DOUBLE))) AS DOUBLE) AS head_sum
    FROM embeddings
    """,
)
def scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family over embeddings.embedding (ARRAY<FLOAT>): size,
    higher-order transform/aggregate, indexing, slice. These are the
    building blocks of the cosine-similarity operators (§ llm)."""
    e = t(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").cast("long").alias("dim"),
        F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x * x).alias("sq_norm"),
        F.col("embedding")[0].cast("double").alias("first_elem"),
        F.aggregate(
            F.slice(dbl, 1, 8), F.lit(0.0), lambda acc, x: acc + x
        ).alias("head_sum"),
    )


@query(
    "scalar_array_explode",
    oracle="""
    SELECT vec_id, u.x AS elem
    FROM embeddings, UNNEST(embedding[1:4]) AS u(x)
    """,
)
def scalar_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode/UNNEST of an array column (UDTF-shaped generator op)."""
    e = t(spark, sf_dir, "embeddings")
    return e.select("vec_id", F.explode(F.slice("embedding", 1, 4)).alias("elem"))


@query(
    "scalar_map",
    oracle="""
    SELECT event_id,
           'et,uid' AS map_keys_sorted,
           CAST(2 AS BIGINT) AS map_size,
           CAST(user_id AS VARCHAR) AS uid_val,
           event_type AS et_val
    FROM events
    """,
)
def scalar_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family (SURVEY §2.8): create_map, map_keys (sorted for
    determinism), size, element_at lookup. The oracle states the
    expected values directly — it checks the map ops round-trip, not
    DuckDB's own MAP type. Keys are emitted as one joined string:
    the driver's canonical row sort can't factorize list-typed cells
    (CORRECTNESS_r02 scalar_map err), so hashable scalars only."""
    e = t(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("et"), F.col("event_type"),
        F.lit("uid"), F.col("user_id").cast("string"),
    )
    return e.select(
        "event_id",
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("map_keys_sorted"),
        F.size(m).cast("long").alias("map_size"),
        F.element_at(m, "uid").alias("uid_val"),
        F.element_at(m, "et").alias("et_val"),
    )


@query(
    "scalar_map_explode",
    oracle="""
    SELECT event_id, 'et' AS k, event_type AS v FROM events
    UNION ALL
    SELECT event_id, 'uid' AS k, CAST(user_id AS VARCHAR) AS v FROM events
    """,
)
def scalar_map_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode of a map column → (key, value) rows (map-side UNNEST,
    SURVEY §2.8 explode_outer family)."""
    e = t(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("et"), F.col("event_type"),
        F.lit("uid"), F.col("user_id").cast("string"),
    )
    return e.select("event_id", F.explode(m).alias("k", "v"))


@query(
    "scalar_string_distance",
    oracle="""
    SELECT p_partkey,
           CAST(levenshtein(p_brand, p_type) AS BIGINT) AS brand_type_dist,
           CAST(levenshtein(lower(p_name), lower(p_type)) AS BIGINT) AS name_type_dist
    FROM part
    """,
)
def scalar_string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance scalar (levenshtein) — the fuzzy-match primitive
    for entity resolution; identical definition in Spark and DuckDB."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.levenshtein("p_brand", "p_type").cast("long").alias("brand_type_dist"),
        F.levenshtein(F.lower("p_name"), F.lower("p_type")).cast("long").alias("name_type_dist"),
    )


@query(
    "scalar_bitops",
    oracle="""
    SELECT event_id,
           CAST(event_id & 255 AS BIGINT)        AS low_byte,
           CAST(event_id | 4096 AS BIGINT)       AS with_flag,
           CAST(xor(event_id, 1365) AS BIGINT)   AS xored,
           CAST(event_id << 3 AS BIGINT)         AS shifted_l,
           CAST(event_id >> 2 AS BIGINT)         AS shifted_r,
           CAST(bit_count(event_id) AS BIGINT)   AS popcount
    FROM events
    """,
)
def scalar_bitops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family: and/or/xor/shifts/popcount — exact integer ops
    (the primitives behind simhash/bloom/partition math)."""
    e = t(spark, sf_dir, "events")
    eid = F.col("event_id")
    return e.select(
        "event_id",
        eid.bitwiseAND(F.lit(255)).alias("low_byte"),
        eid.bitwiseOR(F.lit(4096)).alias("with_flag"),
        eid.bitwiseXOR(F.lit(1365)).alias("xored"),
        F.shiftleft(eid, 3).cast("long").alias("shifted_l"),
        F.shiftright(eid, 2).cast("long").alias("shifted_r"),
        F.bit_count(eid).cast("long").alias("popcount"),
    )


@query(
    "scalar_trig",
    oracle="""
    SELECT event_id,
           round(sin(radians(value))       * 1000000) / 1000000 AS sin_v,
           round(cos(radians(value))       * 1000000) / 1000000 AS cos_v,
           round(atan2(value, event_id + 1) * 1000000) / 1000000 AS angle,
           round(degrees(atan(value))      * 1000000) / 1000000 AS deg_v
    FROM events
    """,
)
def scalar_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigonometric family, rounded 1e-6 in-query (libm results can
    differ in the last ulp across engines)."""
    e = t(spark, sf_dir, "events")
    v, eid = F.col("value"), F.col("event_id")

    def r6(c):
        return F.round(c * 1_000_000) / 1_000_000

    return e.select(
        "event_id",
        r6(F.sin(F.radians(v))).alias("sin_v"),
        r6(F.cos(F.radians(v))).alias("cos_v"),
        r6(F.atan2(v, eid + 1)).alias("angle"),
        r6(F.degrees(F.atan(v))).alias("deg_v"),
    )


@query(
    "scalar_null_handling",
    oracle="""
    SELECT event_id,
           coalesce(nullif(event_type, 'error'), 'unknown') AS et_or_unknown,
           CAST(coalesce(CASE WHEN value >= 50 THEN value END, 0.0) AS DOUBLE) AS big_or_zero,
           (CASE WHEN value >= 50 THEN value END) IS NULL AS was_null,
           ifnull(CASE WHEN value >= 50 THEN value END, -1.0) AS big_or_neg1
    FROM events
    """,
)
def scalar_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling family: nullif / coalesce / ifnull / IS NULL —
    three-valued-logic plumbing every pipeline leans on."""
    e = t(spark, sf_dir, "events")
    big = F.when(F.col("value") >= 50, F.col("value"))
    return e.select(
        "event_id",
        F.coalesce(F.nullif(F.col("event_type"), F.lit("error")), F.lit("unknown")).alias(
            "et_or_unknown"
        ),
        F.coalesce(big, F.lit(0.0)).alias("big_or_zero"),
        big.isNull().alias("was_null"),
        F.ifnull(big, F.lit(-1.0)).alias("big_or_neg1"),
    )
