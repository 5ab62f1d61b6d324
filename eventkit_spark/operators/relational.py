"""Relational extras the reference lacks (SURVEY.md §2.9): the as-of
join, exposed as a first-class DataFrame operator.

The scale-correct formulation is NOT a range join (O(n·m) comparisons,
un-broadcastable at 100 TB): union the two tagged streams and take one
running ``last(ignorenulls)`` window per key — exactly one shuffle on
the `by` key, linear in total rows, the same shape `timing.sample` and
TakeUntil use internally. Right-side payloads ride a single struct so N
carried columns still cost one window expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by: list[str] | str | None = None,
    right_cols: list[str] | None = None,
    tolerance: float | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` (per ``by`` key group) — a LEFT as-of join:
    left rows with no prior right row keep NULLs.

    ``right_cols`` limits which right columns are carried (default: all
    non-key, non-ts). ``tolerance`` (seconds) drops matches older than
    ``left.ts - tolerance``. Right rows at exactly left.ts ARE visible
    (ties resolve right-before-left, the <= convention of e.g. DuckDB's
    ASOF JOIN). If several right rows share one (key, ts), the one with
    the highest tie-break order (later union position) wins — pre-
    aggregate the right side if that matters.
    """
    by = [] if by is None else ([by] if isinstance(by, str) else list(by))
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in by and c != ts_col]
    payload = F.struct(
        F.col(ts_col).alias("__asof_ts"), *[F.col(c) for c in right_cols]
    )
    l_tag = left.select(
        F.lit(1).alias("__tag"),
        *[F.col(c) for c in left.columns],
        F.lit(None).cast(
            right.select(payload.alias("p")).schema["p"].dataType
        ).alias("__p"),
    )
    r_tag = right.select(
        F.lit(0).alias("__tag"),
        *[
            F.col(c) if c in by or c == ts_col else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
        ],
        payload.alias("__p"),
    )
    u = r_tag.unionByName(l_tag)
    w = (
        (W.partitionBy(*by) if by else W.partitionBy(F.lit(0)))
        .orderBy(F.col(ts_col), F.col("__tag"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    u = u.withColumn(
        "__m", F.last(F.when(F.col("__tag") == 0, F.col("__p")), ignorenulls=True).over(w)
    )
    out = u.filter(F.col("__tag") == 1)
    if tolerance is not None:
        fresh = (
            F.unix_micros(F.col(ts_col)) - F.unix_micros(F.col("__m.__asof_ts"))
        ) <= int(tolerance * 1_000_000)
        out = out.withColumn("__m", F.when(fresh, F.col("__m")))
    keep = [F.col(c) for c in left.columns]
    keep += [F.col(f"__m.{c}").alias(c + suffix if c in left.columns else c) for c in right_cols]
    keep.append(F.col("__m.__asof_ts").alias(ts_col + suffix))
    return out.select(*keep)
