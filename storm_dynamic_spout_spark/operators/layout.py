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
