"""Multi-dimensional data layout: Z-order (Morton) clustering.

Why: at 100 TB, scan cost is dominated by how much data a filter can
SKIP. Sorting by one column gives perfect min/max pruning on that
column and none on any other; interleaving the bits of several columns
(Z-order) gives every interleaved dimension partial locality, so
parquet row-group / file min-max stats prune multi-dimensional
predicates (the Delta/Iceberg OPTIMIZE ZORDER pattern, public
literature: Morton 1966). The key is a pure integer Column expression
— codegen'd, exact, replayable by any engine with shift/mask ops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def zorder_key(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of each column (cast to
    long, clamped non-negative) into one z-value: bit ``i`` of column
    ``j`` lands at position ``i * d + j``.

    ``bits * len(cols)`` must fit in a long (<= 63). Inputs are
    expected to be small non-negative ints (bucket ids, day numbers,
    small keys); values >= 2**bits wrap by masking — quantize or
    width-bucket wider domains first.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in cols]
    d = len(cols)
    if d < 2:
        raise ValueError("zorder_key() needs at least 2 columns")
    if bits * d > 63:
        raise ValueError(f"bits * ncols = {bits * d} exceeds a long")
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        v = F.greatest(c.cast("long"), F.lit(0))
        for i in range(bits):
            z = z + F.shiftleft(
                F.shiftright(v, i).bitwiseAND(F.lit(1)), i * d + j
            )
    return z


def write_zordered(
    df: DataFrame,
    zcols: list[str],
    path: str,
    bits: int = 16,
    partitions: int | None = None,
    target_mb: int = 256,
    mode: str = "overwrite",
) -> dict:
    """Range-partition + sort the dataset by its Z-order key, then
    write size-bounded parquet: every output file covers a narrow
    z-range, so its min/max stats are tight on EVERY interleaved
    dimension and a reader's multi-dim predicate skips most files.

    Scale shape: ONE range exchange on the z-key (driver-side sampled
    boundaries — balanced even on skewed key distributions) + a
    per-partition sort; file sizes bounded via write_dataset's sampled
    maxRecordsPerFile (no full pre-count). The z-key column itself is
    dropped before writing — it is derivable, not payload.
    """
    from .sinks import estimate_row_bytes

    import math

    zk = zorder_key(zcols, bits=bits).alias("__ek_z")
    parted = (
        df.withColumn("__ek_z", zk)
        .repartitionByRange(*( [partitions] if partitions else [] ), F.col("__ek_z"))
        .sortWithinPartitions("__ek_z")
        .drop("__ek_z")
    )
    est = estimate_row_bytes(df)
    rows_per_file = max(1, math.ceil(target_mb * 1024 * 1024 / est))
    (
        parted.write.mode(mode)
        .option("maxRecordsPerFile", rows_per_file)
        .parquet(path)
    )
    return {"rows_per_file": rows_per_file, "est_row_bytes": est}
