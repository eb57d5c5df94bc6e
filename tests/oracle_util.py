"""Local mirror of the driver's Spark-vs-DuckDB comparison.

Sorts columns by name, rows canonically, rounds floats, then compares —
so a mismatch here predicts a CORRECTNESS_r{N}.json hash mismatch.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal


def _canon(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return 0.0
        # ~9 significant digits: tolerant of accumulation-order noise,
        # strict enough to catch real errors
        return float(f"{v:.9g}")
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    return v


def _rows_canon(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return out


def compare_spark_duck(spark_df, duck_con, sql: str) -> None:
    """Assert Spark DataFrame result matches DuckDB oracle result.

    Rejects array/map/struct result columns outright: the driver's
    canonicalizer sorts rows with pandas, where list cells raise
    ``TypeError: unhashable type`` — a query that returns one would be
    green here and red in CORRECTNESS_r{N}.json (the embedding_quantize
    r4 failure).  CSV-join arrays (``F.array_join`` /
    ``array_to_string``) before returning them.
    """
    complex_cols = [
        f.name
        for f in spark_df.schema.fields
        if f.dataType.typeName() in ("array", "map", "struct")
    ]
    assert not complex_cols, (
        f"driver-unhashable result columns {complex_cols}: the driver's "
        "pandas canonical sort crashes on list cells — CSV-join arrays "
        "(array_join / array_to_string) in both engines instead"
    )
    # Reject HUGEINT oracle columns: DuckDB sum(BIGINT) returns HUGEINT
    # (int128), which the driver's canonicalizer hashes differently from
    # Spark's BIGINT even when every value is identical (the r5
    # join_skew_salted / source_csv_roundtrip / source_json_roundtrip
    # reds).  Python int comparison below would silently pass, so check
    # the declared types, not the values.  Fix: wrap the aggregate in
    # CAST(... AS BIGINT) on the oracle side.
    try:
        odesc = duck_con.execute(f"DESCRIBE {sql}").fetchall()
    except Exception:  # DESCRIBE can choke on exotic statements; skip
        odesc = []
    huge = [name for name, typ, *_ in odesc if "HUGEINT" in str(typ).upper()]
    assert not huge, (
        f"driver-unhashable HUGEINT oracle columns {huge}: DuckDB "
        "sum(BIGINT/INT) widens to int128, which hash-mismatches Spark's "
        "BIGINT in the driver canonicalizer — wrap the aggregate in "
        "CAST(... AS BIGINT) in the oracle SQL"
    )
    sp_cols = [c.lower() for c in spark_df.columns]
    sp_rows = [tuple(r) for r in spark_df.collect()]
    res = duck_con.execute(sql)
    dk_cols = [d[0].lower() for d in res.description]
    dk_rows = [tuple(r) for r in res.fetchall()]

    assert sorted(sp_cols) == sorted(dk_cols), (
        f"column mismatch: spark={sorted(sp_cols)} duck={sorted(dk_cols)}"
    )
    assert len(sp_rows) == len(dk_rows), (
        f"row count mismatch: spark={len(sp_rows)} duck={len(dk_rows)}"
    )
    sp_c = _rows_canon(sp_cols, sp_rows)
    dk_c = _rows_canon(dk_cols, dk_rows)
    for i, (a, b) in enumerate(zip(sp_c, dk_c)):
        assert a == b, f"value mismatch at canonical row {i}:\n spark={a}\n duck ={b}"
