"""Deserializer operators (SURVEY §2.2 P1).

The reference delegates all typing to a pluggable ``Deserializer``
(``kafka/deserializer/Deserializer.java:36-50``): ``byte[] key,value →
Values``; returning null drops + auto-acks the record
(``kafka/Consumer.java:351-360``). The shipped impl yields UTF-8
strings (``Utf8StringDeserializer.java:38-49``).

Engine mapping: each deserializer is a *projection* built from Catalyst
expressions (cast / ``from_json`` / ``from_csv``) — JVM-side,
whole-stage-codegen'd, never a Python row loop. The null-drop contract
becomes an explicit filter the caller composes (dropped rows commit
with the batch — P8 semantics are automatic).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def utf8_deserializer(df: DataFrame, key_col: str = "key", value_col: str = "value") -> DataFrame:
    """bytes/str → (key STRING nullable, value STRING): the
    Utf8StringDeserializer contract (null key allowed, value required)."""
    return df.withColumn(key_col, F.col(key_col).cast("string")).withColumn(
        value_col, F.col(value_col).cast("string")
    )


def json_deserializer(
    df: DataFrame,
    schema: T.StructType | str,
    value_col: str = "value",
    out_prefix: str = "",
) -> DataFrame:
    """value JSON-string → typed columns; unparseable rows get a null
    struct (filter with :func:`drop_undeserializable` for the
    reference's null ⇒ drop contract)."""
    parsed = F.from_json(F.col(value_col).cast("string"), schema)
    df = df.withColumn("_parsed", parsed)
    fields = (
        schema.fieldNames()
        if isinstance(schema, T.StructType)
        else T._parse_datatype_string(schema).fieldNames()  # type: ignore[attr-defined]
    )
    for name in fields:
        df = df.withColumn(f"{out_prefix}{name}", F.col("_parsed").getField(name))
    return df.drop("_parsed")


def csv_deserializer(
    df: DataFrame,
    schema: str,
    value_col: str = "value",
    sep: str = ",",
) -> DataFrame:
    """value CSV-line → typed columns via ``from_csv`` (schema is a DDL
    string, e.g. ``"a INT, b STRING"``)."""
    parsed = F.from_csv(F.col(value_col).cast("string"), schema, {"sep": sep})
    df = df.withColumn("_parsed", parsed)
    for name in T._parse_datatype_string(schema).fieldNames():  # type: ignore[attr-defined]
        df = df.withColumn(name, F.col("_parsed").getField(name))
    return df.drop("_parsed")


def drop_undeserializable(df: DataFrame, probe: Column) -> DataFrame:
    """null-deserialize ⇒ drop (kafka/Consumer.java:351-360): keep rows
    where the parse probe is non-null. Offsets still commit for dropped
    rows — the micro-batch is the ack unit."""
    return df.filter(probe.isNotNull())


#: name → callable registry (FactoryManager analogue for parse plugins)
DESERIALIZERS: dict[str, Callable[..., DataFrame]] = {
    "utf8": utf8_deserializer,
    "json": json_deserializer,
    "csv": csv_deserializer,
}
