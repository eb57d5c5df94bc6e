"""Write-side data layout for 100 TB tables: partitioned + clustered
parquet.

The reference writes nothing (its sink is Storm's collector,
``DynamicSpout.java:224-256``); at the north star's scale the engine
must also own how results land on storage, because layout decides the
cost of every later read:

- **Hive partitioning** (``partitionBy``) turns equality/range filters
  on the partition column into directory pruning — a scan of one day
  out of three years touches 0.1% of files before a single row group
  is opened.
- **Within-file clustering** (``sortWithinPartitions``) tightens the
  parquet row-group min/max stats on the sort keys, so selective
  point/range predicates skip whole row groups (the same property
  :meth:`FileTopic.compact` maintains for offset ranges).
- **File sizing**: one shuffle partition per output file — callers
  pick ``target_files`` from data volume (see ``tuning.py``) so files
  land near the 128 MB–1 GB sweet spot instead of thousands of
  KB-scale fragments that crush a 1000-executor driver's listing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_clustered(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    cluster_by: list[str] | None = None,
    target_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet with directory partitioning + row-group
    clustering.

    ``partition_by``: hive-style directory keys (low cardinality —
    dates, regions). ``cluster_by``: sort keys within each task's
    output file (high cardinality — ids, timestamps). ``target_files``:
    repartition count *per partition value set* before the sort; with
    hash partitioning on the partition keys, each output directory is
    written by few tasks, avoiding the small-files explosion of
    ``partitionBy`` over arbitrarily-partitioned input.
    """
    out = df
    if target_files is not None:
        if partition_by:
            out = out.repartition(target_files, *[F.col(c) for c in partition_by])
        else:
            out = out.repartition(target_files)
    if cluster_by:
        out = out.sortWithinPartitions(*cluster_by)
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def zorder_key(cols: list[str], bits: int = 16) -> F.Column:
    """Morton (Z-order) key over numeric columns: each column is
    range-normalized by the caller to ``[0, 2^bits)`` and the bits are
    interleaved JVM-side (shiftleft/or loops — no UDF).

    Why at 100 TB: a linear sort clusters only its FIRST key — a filter
    on the second key reads every file.  Interleaving bits makes every
    file's min/max box tight in ALL dimensions, so multi-dimensional
    range predicates skip files/row-groups on any filtered column (the
    Delta/Iceberg OPTIMIZE ZORDER technique, built from public
    bit-interleaving).  Use with :func:`write_clustered` as
    ``cluster_by=["__z"]`` or ``repartitionByRange`` on the key.

    ``bits`` per dimension: 16 bits x 2 cols = 32-bit key.  The key
    must fit a signed LONG (``len(cols) * bits <= 63``), so at 16 bits
    up to 3 columns are supported; 4 columns need ``bits <= 15``.
    Callers quantize: ``((col - min) * (2^bits - 1) /
    (max - min)).cast("long")``.
    """
    if not 1 <= len(cols) * bits <= 63:
        raise ValueError(f"{len(cols)} cols x {bits} bits exceeds a LONG")
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            # bit b of column i lands at interleaved position
            # b * n_cols + i
            src_bit = F.shiftright(F.col(c).cast("long"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(
                F.shiftleft(src_bit, b * len(cols) + i).cast("long")
            )
    return z


def quantize_for_zorder(col: F.Column, lo: float, hi: float, bits: int = 16) -> F.Column:
    """Range-normalize a numeric column to ``[0, 2^bits)`` for
    :func:`zorder_key`.  Bounds come from table stats (min/max) — at
    scale these are already in the catalog; clamping keeps stragglers
    outside the stated range in the edge cells instead of corrupting
    the interleave."""
    span = (hi - lo) or 1.0
    scaled = (col.cast("double") - F.lit(float(lo))) / F.lit(span) * F.lit(
        float(2**bits - 1)
    )
    clamped = F.least(F.greatest(scaled, F.lit(0.0)), F.lit(float(2**bits - 1)))
    return F.round(clamped).cast("long")


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_by: list[str],
    bounds: dict[str, tuple[float, float]],
    target_files: int = 8,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """OPTIMIZE ZORDER: range-partition the table by the Morton key of
    ``zorder_by`` (each file owns one contiguous z-range = a tight box
    in every dimension), sort within files by the key, drop the helper
    column on write."""
    quantized = [
        quantize_for_zorder(F.col(c), *bounds[c], bits=bits).alias(f"__q_{c}")
        for c in zorder_by
    ]
    out = df.select("*", *quantized).withColumn(
        "__z", zorder_key([f"__q_{c}" for c in zorder_by], bits=bits)
    )
    out = (
        out.repartitionByRange(target_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z", *[f"__q_{c}" for c in zorder_by])
    )
    out.write.mode(mode).parquet(path)


def hilbert_key(x_col: str, y_col: str, bits: int = 16) -> F.Column:
    """2-D Hilbert-curve index over two pre-quantized columns (range
    [0, 2^bits) each, via :func:`quantize_for_zorder`) — built entirely
    from JVM-side bit expressions (per-bit unrolled rotation steps, no
    UDF).

    Why over Z-order: the Hilbert curve has no long jumps — every
    consecutive pair of cells is adjacent — so a contiguous key range
    maps to a MORE compact spatial region than the Morton curve's
    quadrant seams, touching fewer files for the same 2-D range
    predicate (the curve Delta OPTIMIZE moved to for its clustered
    writes).  Standard public iterative x/y-rotation formulation of
    the d2xy/xy2d algorithm, unrolled per bit."""
    if not 1 <= 2 * bits <= 62:
        raise ValueError(f"2 x {bits} bits exceeds a LONG")
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    d = F.lit(0).cast("long")
    for i in range(bits - 1, -1, -1):
        s = F.lit(1 << i).cast("long")
        rx = F.shiftright(x, i).bitwiseAND(F.lit(1))
        ry = F.shiftright(y, i).bitwiseAND(F.lit(1))
        d = d + s * s * ((F.lit(3) * rx).bitwiseXOR(ry))
        # rotate the quadrant: if ry == 0 then (swap x/y, and if rx == 1
        # also reflect both within the s-sized cell)
        flip = (ry == 0) & (rx == 1)
        nx = F.when(flip, s - 1 - y).otherwise(y)
        ny = F.when(flip, s - 1 - x).otherwise(x)
        x, y = (
            F.when(ry == 0, nx).otherwise(x),
            F.when(ry == 0, ny).otherwise(y),
        )
    return d


def attach_hilbert_key(
    df: DataFrame, x_col: str, y_col: str, bits: int = 16, out: str = "__h"
) -> DataFrame:
    """DataFrame-level Hilbert index: same algorithm as
    :func:`hilbert_key` but each rotation step lands in NAMED
    intermediate columns.  The single-Column form nests every step
    inside the next (each level references x and y several times), so
    its expression tree grows ~6^bits nodes and Catalyst planning
    melts at realistic widths; per-step projections keep the plan
    linear in ``bits`` — use this for real writes, the Column form for
    small-bits checks."""
    if not 1 <= 2 * bits <= 62:
        raise ValueError(f"2 x {bits} bits exceeds a LONG")
    d = df.withColumn("__hx", F.col(x_col).cast("long")).withColumn(
        "__hy", F.col(y_col).cast("long")
    ).withColumn(out, F.lit(0).cast("long"))
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        d = (
            d.withColumn("__rx", F.shiftright("__hx", i).bitwiseAND(F.lit(1)))
            .withColumn("__ry", F.shiftright("__hy", i).bitwiseAND(F.lit(1)))
            .withColumn(
                out,
                F.col(out)
                + F.lit(s * s).cast("long")
                * (F.lit(3) * F.col("__rx")).bitwiseXOR(F.col("__ry")),
            )
            .withColumn("__flip", (F.col("__ry") == 0) & (F.col("__rx") == 1))
            .withColumn(
                "__nx",
                F.when(F.col("__flip"), F.lit(s - 1) - F.col("__hy")).otherwise(
                    F.col("__hy")
                ),
            )
            .withColumn(
                "__ny",
                F.when(F.col("__flip"), F.lit(s - 1) - F.col("__hx")).otherwise(
                    F.col("__hx")
                ),
            )
            .withColumn(
                "__hx", F.when(F.col("__ry") == 0, F.col("__nx")).otherwise(F.col("__hx"))
            )
            .withColumn(
                "__hy", F.when(F.col("__ry") == 0, F.col("__ny")).otherwise(F.col("__hy"))
            )
        )
    return d.drop("__hx", "__hy", "__rx", "__ry", "__flip", "__nx", "__ny")


def write_hilbert_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    bounds: dict[str, tuple[float, float]],
    target_files: int = 8,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """OPTIMIZE by Hilbert index (2-D): range-partition by the Hilbert
    key so each file owns one contiguous curve segment — a compact
    spatial patch — then sort within files by the key."""
    if len(cluster_cols) != 2:
        raise ValueError("hilbert clustering is 2-D: pass exactly two columns")
    quantized = [
        quantize_for_zorder(F.col(c), *bounds[c], bits=bits).alias(f"__q_{c}")
        for c in cluster_cols
    ]
    out = attach_hilbert_key(
        df.select("*", *quantized),
        f"__q_{cluster_cols[0]}",
        f"__q_{cluster_cols[1]}",
        bits=bits,
    )
    out = (
        out.repartitionByRange(target_files, "__h")
        .sortWithinPartitions("__h")
        .drop("__h", *[f"__q_{c}" for c in cluster_cols])
    )
    out.write.mode(mode).parquet(path)
