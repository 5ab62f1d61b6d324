"""Scale hardening utilities: skew-safe aggregation and co-located joins.

These are the knobs a 100 TB deployment turns when AQE alone isn't
enough (SURVEY.md §4.2): hot keys in groupBy (a user with 1e9 events),
and repeated joins on the same key that shouldn't re-shuffle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation: partial-aggregate on
    (keys, salt), then final-aggregate on keys.

    ``aggs`` maps output name -> (input column, kind) with kind in
    {sum, count, min, max}. A hot key's rows spread over
    ``salt_buckets`` reducers in phase 1, so no single task receives the
    whole key. (mean = sum/count composed by the caller; algebraic
    aggregates only — holistic ones need different machinery.)
    """
    partial_fns = {
        "sum": F.sum,
        "count": F.count,
        "min": F.min,
        "max": F.max,
    }
    merge_fns = {
        "sum": F.sum,
        "count": F.sum,  # counts add up across salt buckets
        "min": F.min,
        "max": F.max,
    }
    salt = (F.spark_partition_id() * 31 + F.crc32(F.concat_ws("", *keys))) % salt_buckets
    phase1 = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*[partial_fns[kind](col).alias(name) for name, (col, kind) in aggs.items()])
    )
    return phase1.groupBy(*keys).agg(
        *[merge_fns[kind](name).alias(name) for name, (_, kind) in aggs.items()]
    )


def colocate(df: DataFrame, keys: Sequence[str], partitions: int | None = None) -> DataFrame:
    """Hash-partition by join/agg keys once so downstream joins and
    window functions over the same keys reuse the exchange (Catalyst's
    output-partitioning matching removes the second shuffle)."""
    if partitions:
        return df.repartition(partitions, *[F.col(k) for k in keys])
    return df.repartition(*[F.col(k) for k in keys])


def explain_skew(df: DataFrame, keys: Sequence[str], top: int = 10) -> DataFrame:
    """Per-key row counts, heaviest first — the first thing to look at
    when a stage straggles."""
    return (
        df.groupBy(*keys)
        .agg(F.count("*").alias("rows"))
        .orderBy(F.col("rows").desc())
        .limit(top)
    )
