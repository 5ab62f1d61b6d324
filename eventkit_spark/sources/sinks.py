"""Dataset export: the training-data write path.

The reference's terminal ops stop at connect/emit callbacks; a corpus
engine also needs to WRITE datasets back out — partitioned, with
bounded file sizes (the small-files problem is the classic 100 TB
export failure: one file per task per partition-value explodes the
object store; unbounded files break downstream shard loaders).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame


def estimate_row_bytes(df: DataFrame, sample_rows: int = 1000) -> int:
    """Average serialized row size estimated from a bounded head sample
    (LIMIT pushes into the scan and stops early — no full pass). The
    pickled-row proxy over-counts parquet's encoded size, which biases
    toward MORE files of SMALLER size — the safe direction for both
    failure modes."""
    import pickle

    rows = df.limit(sample_rows).collect()
    if not rows:
        return 1
    raw = sum(len(pickle.dumps(tuple(r))) for r in rows)
    return max(1, raw // len(rows))


def write_dataset(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] | list[str] = (),
    target_mb: int = 256,
    mode: str = "overwrite",
    fmt: str = "parquet",
    sample_rows: int = 1000,
    salt: int = 0,
) -> dict:
    """Write a size-targeted dataset without a full pre-count.

    Files are bounded via ``maxRecordsPerFile`` = target_bytes /
    estimated row bytes (one bounded LIMIT sample, no extra corpus
    scan); ``partition_by`` columns become directory partitions AND the
    data is hash-repartitioned on them first so each partition value is
    written by as few tasks as possible (otherwise every task writes a
    sliver into every partition directory — tasks x values files).
    ``salt > 1`` splits each partition VALUE across that many write
    tasks (repartition on the columns plus a row-hash bucket): the cure
    when one hot value — one language, one source domain — would
    otherwise funnel through a single task while 999 executors idle.
    File sizes stay bounded by ``maxRecordsPerFile`` either way.

    Returns the write plan actually used ({rows_per_file, est_row_bytes})
    for observability.
    """
    from pyspark.sql import functions as F

    est = estimate_row_bytes(df, sample_rows)
    rows_per_file = max(1, math.ceil(target_mb * 1024 * 1024 / est))
    out = df
    if partition_by:
        if salt and salt > 1:
            # explicit-count RANGE partitioning on (cols..., bucket):
            # each (value, bucket) pair owns a partition, so a hot value
            # fans out across exactly `salt` write tasks. The explicit
            # numPartitions survives AQE coalescing (a hash repartition
            # of a small-looking shuffle gets merged back to one task —
            # which is precisely the skew being cured). The distinct
            # count of the partition columns is one tiny aggregate next
            # to the write itself.
            bucket = F.pmod(
                F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(int(salt))
            ).alias("__ek_salt")
            nvals = out.select(*partition_by).distinct().count()
            writer_df = out.repartitionByRange(
                int(salt) * max(1, nvals),
                *[F.col(c) for c in partition_by],
                bucket,
            )
        else:
            writer_df = out.repartition(*partition_by)
    else:
        writer_df = out
    w = (
        writer_df.write.mode(mode)
        .option("maxRecordsPerFile", rows_per_file)
        .format(fmt)
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)
    return {"rows_per_file": rows_per_file, "est_row_bytes": est}
