"""Table-backed sources: parquet scans wrapped as EventFrames.

The driver's ``events`` table (TESTDATA.md) is the canonical keyed event
stream: ``user_id`` is the partition key, ``event_id`` the emit order,
``ts`` event time. Reading through ``spark.read.parquet`` keeps predicate
pushdown and column pruning — operators downstream select only the
columns they touch, and Catalyst prunes the scan accordingly.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import TimestampNTZType

from ..frame import EventFrame


@lru_cache(maxsize=256)
def _nano_ts_cols(path: str) -> tuple[str, ...]:
    """Columns stored as parquet TIMESTAMP(NANOS) (footer read, driver-side).

    The driver's testdata uses nano timestamps, which Spark only reads via
    ``spark.sql.legacy.parquet.nanosAsLong`` (set in session.py); those
    longs are converted back to timestamps here.
    """
    import pyarrow.dataset as ds
    import pyarrow as pa

    schema = ds.dataset(path, format="parquet").schema
    return tuple(
        name
        for name, typ in zip(schema.names, schema.types)
        if pa.types.is_timestamp(typ) and typ.unit == "ns"
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    # self-sufficient vs caller-created sessions (the driver builds its
    # own SparkSession without our session.py defaults): nanos timestamps
    # are unreadable without this runtime-settable SQL conf, and the UTC
    # session tz makes the NTZ->LTZ normalization below value-preserving
    # (and epoch math identical to the DuckDB oracle's naive timestamps)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(path)
    for c in _nano_ts_cols(path):
        # integer div: truncate ns->us exactly like DuckDB/pandas (float
        # division rounds the 16th digit and drifts by 1us)
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    # Parquet written with isAdjustedToUTC=false (pandas/pyarrow default,
    # and the driver's testdata since round 3) loads as TIMESTAMP_NTZ,
    # which unix_micros / double casts reject at analysis time. The
    # session timezone is pinned UTC (session.py), so reinterpreting NTZ
    # as LTZ is value-preserving — every downstream event-time expression
    # then sees one type.
    for fld in df.schema.fields:
        if isinstance(fld.dataType, TimestampNTZType):
            df = df.withColumn(fld.name, F.col(fld.name).cast("timestamp"))
    return df


def load_events(
    spark: SparkSession,
    sf_dir: str,
    keyed: bool = True,
    value_col: str = "value",
) -> EventFrame:
    """The events table as a stream: seq=event_id, ts=ts, key=user_id."""
    df = load_table(spark, sf_dir, "events")
    return EventFrame(
        df,
        value_cols=[value_col],
        seq_col="event_id",
        ts_col="ts",
        key_cols=["user_id"] if keyed else [],
    )


def from_dataframe(
    df: DataFrame,
    value_cols=("value",),
    seq_col: str = "seq",
    ts_col: str | None = "ts",
    key_cols=(),
) -> EventFrame:
    return EventFrame(df, value_cols=value_cols, seq_col=seq_col, ts_col=ts_col, key_cols=key_cols)
