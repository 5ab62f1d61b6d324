"""Event-time timing operators: delay / timeout / debounce / sample.

Reference semantics: eventkit/ops/timing.py (SURVEY.md §2.6). The
reference schedules on the asyncio wall clock; the engine re-bases the
same observable semantics on the stream's event-time column, which makes
every op deterministic over recorded data (no sleeps) and identical in
meaning for replayed streams. Throttle (the one inherently sequential
re-timestamping op) lives in ``state.py`` as a pandas kernel.
"""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from .common import RN, meta_cols, ts_micros, ts_seconds, wcum, wkey, worder


def _shift(ts_col, seconds: float):
    # timestamp + fractional-second interval, JVM-side (NTZ-safe)
    return F.timestamp_micros(
        (ts_micros(F.col(ts_col)) + F.lit(int(round(seconds * 1e6)))).cast("long")
    )


def delay(ef, seconds: float):
    """Shift every emit later by ``seconds`` (timing.py:8-28) — a pure
    event-time shift; order and payload are untouched."""
    if not ef.ts_col:
        raise ValueError("delay() needs an event-time column")
    df = ef.df.withColumn(ef.ts_col, _shift(ef.ts_col, seconds))
    return ef._with(df=df)


def timeout(ef, seconds: float, emit_sentinel: bool = False):
    """Cut the stream at the first inter-event gap > ``seconds``
    (timing.py:31-64). The reference then emits one empty value and
    ends; with ``emit_sentinel=True`` the engine appends that empty
    emit as a NULL-payload row at last_ts + timeout per key."""
    if not ef.ts_col:
        raise ValueError("timeout() needs an event-time column")
    w = worder(ef)
    t = ts_seconds(F.col(ef.ts_col))
    gap = t - F.lag(t).over(w)
    ok = F.when(gap.isNull() | (gap <= seconds), 1).otherwise(0)
    flag = F.min(ok).over(wcum(ef))
    df = ef.df.withColumn(RN, flag)
    kept = ef._with(df=df.filter(F.col(RN) == 1).drop(RN))
    if not emit_sentinel:
        return kept
    # sentinel: one NULL row per key at last-kept-ts + timeout, only if
    # the stream was actually cut (a gap exceeded the budget)
    cut_happened = df.groupBy(*[F.col(k) for k in ef.key_cols]).agg(
        F.min(RN).alias("__ek_anycut")
    )
    last_rows = (
        kept.df.groupBy(*[F.col(k) for k in ef.key_cols])
        .agg(F.max(ef.ts_col).alias("__ek_last"), F.max(ef.seq_col).alias("__ek_seq"))
    )
    cols = []
    for c in kept.df.columns:
        if c in ef.key_cols:
            cols.append(F.col(c))
        elif c == ef.seq_col:
            cols.append((F.col("__ek_seq") + 1).alias(c))
        elif c == ef.ts_col:
            cols.append(_shift("__ek_last", seconds).alias(c))
        else:
            cols.append(F.lit(None).cast(ef.df.schema[c].dataType).alias(c))
    if ef.key_cols:
        joined = last_rows.join(cut_happened, on=list(ef.key_cols), how="inner")
    else:
        joined = last_rows.crossJoin(cut_happened)
    sent = joined.filter(F.col("__ek_anycut") == 0).select(*cols)
    return ef._with(df=kept.df.unionByName(sent))


def debounce(ef, seconds: float, on_first: bool = False):
    """Drop rapid-succession rows (timing.py:67-101).

    ``on_first=True``: emit the first row of each burst (gap from the
    previous row >= interval), drop the rest — a pure lag compare.
    ``on_first=False`` (default): emit only the last row of each burst,
    re-stamped ``seconds`` later (the reference's delayed emit at
    time+interval) — a pure lead compare.
    """
    if not ef.ts_col:
        raise ValueError("debounce() needs an event-time column")
    w = worder(ef)
    t = ts_seconds(F.col(ef.ts_col))
    if on_first:
        gap = t - F.lag(t).over(w)
        keep = gap.isNull() | (gap >= seconds)
        df = ef.df.withColumn(RN, keep)
        return ef._with(df=df.filter(F.col(RN)).drop(RN))
    nxt = F.lead(t).over(w)
    keep = nxt.isNull() | ((nxt - t) >= seconds)
    df = ef.df.withColumn(RN, keep)
    df = df.filter(F.col(RN)).drop(RN)
    df = df.withColumn(ef.ts_col, _shift(ef.ts_col, seconds))
    return ef._with(df=df)


def sample(ef, timer):
    """At each tick of the ``timer`` stream, emit the source's latest
    value (timing.py:187-211); no emit before the source's first value
    (reference guards on NO_VALUE, timing.py:201-203).

    This is an as-of join, built shuffle-once: union the tagged streams,
    one running ``last(ignorenulls)`` window, keep timer rows. Source rows
    at the same ts as a tick are visible to it (the reference's listener
    ordering delivers source-then-timer).
    """
    if not ef.ts_col or not timer.ts_col:
        raise ValueError("sample() needs event-time on both streams")
    if list(timer.key_cols) != list(ef.key_cols):
        raise ValueError("sample() streams must share key columns")
    v = F.col(ef.value_cols[0])
    src = ef.df.select(
        F.lit(0).alias("__ek_tag"),
        F.col(ef.seq_col).alias("seq"),
        F.col(ef.ts_col).alias("ts"),
        *[F.col(k) for k in ef.key_cols],
        v.alias("value"),
    )
    tick = timer.df.select(
        F.lit(1).alias("__ek_tag"),
        F.col(timer.seq_col).alias("seq"),
        F.col(timer.ts_col).alias("ts"),
        *[F.col(k) for k in timer.key_cols],
        F.lit(None).cast(ef.df.schema[ef.value_cols[0]].dataType).alias("value"),
    )
    u = src.unionByName(tick)
    w = (
        (W.partitionBy(*ef.key_cols) if ef.key_cols else W.partitionBy(F.lit(0)))
        .orderBy(F.col("ts"), F.col("__ek_tag"), F.col("seq"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    u = u.withColumn("__ek_latest", F.last(F.when(F.col("__ek_tag") == 0, F.col("value")), ignorenulls=True).over(w))
    out = u.filter((F.col("__ek_tag") == 1) & F.col("__ek_latest").isNotNull())
    cols = [F.col("seq"), F.col("ts"), *[F.col(k) for k in ef.key_cols], F.col("__ek_latest").alias("value")]
    return ef._with(
        df=out.select(*cols), value_cols=["value"], seq_col="seq", ts_col="ts",
        key_cols=list(ef.key_cols),
    )


def chunkwith(ef, timer, emit_empty: bool = True):
    """Buffer rows and flush the list at each tick of ``timer``
    (eventkit/ops/transform.py:179-211). Each source row is assigned to
    the first tick at-or-after it (as-of bucketing), then one hash
    aggregate per (key, tick).
    """
    if not ef.ts_col or not timer.ts_col:
        raise ValueError("chunkwith() needs event-time on both streams")
    v = F.col(ef.value_cols[0])
    src = ef.df.select(
        F.lit(0).alias("__ek_tag"),
        F.col(ef.seq_col).alias("seq"),
        F.col(ef.ts_col).alias("ts"),
        *[F.col(k) for k in ef.key_cols],
        v.alias("value"),
        F.lit(None).cast("long").alias("__ek_tick"),
    )
    tick = timer.df.select(
        F.lit(1).alias("__ek_tag"),
        F.col(timer.seq_col).alias("seq"),
        F.col(timer.ts_col).alias("ts"),
        *[F.col(k) for k in timer.key_cols],
        F.lit(None).cast(ef.df.schema[ef.value_cols[0]].dataType).alias("value"),
        F.col(timer.seq_col).cast("long").alias("__ek_tick"),
    )
    u = src.unionByName(tick)
    # first tick at-or-after each row: look *forward* — reverse running first
    w = (
        (W.partitionBy(*ef.key_cols) if ef.key_cols else W.partitionBy(F.lit(0)))
        .orderBy(F.col("ts").desc(), F.col("__ek_tag").desc(), F.col("seq").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    u = u.withColumn("__ek_bucket", F.last(F.col("__ek_tick"), ignorenulls=True).over(w))
    rows = u.filter((F.col("__ek_tag") == 0) & F.col("__ek_bucket").isNotNull())
    agg = rows.groupBy(*ef.key_cols, "__ek_bucket").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("seq").alias("s"), F.col("value").alias("v")))),
            lambda p: p.getField("v"),
        ).alias("value")
    )
    ticks = timer.df.select(
        F.col(timer.seq_col).cast("long").alias("__ek_bucket"),
        F.col(timer.ts_col).alias("ts"),
        *[F.col(k) for k in timer.key_cols],
    )
    joined = ticks.join(agg, on=[*ef.key_cols, "__ek_bucket"], how="left" if emit_empty else "inner")
    if emit_empty:
        joined = joined.withColumn(
            "value",
            F.coalesce(
                F.col("value"),
                F.array().cast(f"array<{ef.df.schema[ef.value_cols[0]].dataType.simpleString()}>"),
            ),
        )
    out = joined.select(
        F.col("__ek_bucket").alias("seq"), F.col("ts"),
        *[F.col(k) for k in ef.key_cols], F.col("value"),
    )
    return ef._with(df=out, value_cols=["value"], seq_col="seq", ts_col="ts", key_cols=list(ef.key_cols))


def sessionize(ef, gap: float, session_col: str = "session"):
    """Assign an inactivity-gap session id per key: a row whose
    event-time gap from the previous row exceeds ``gap`` seconds starts
    a new session; ids count up from 0 within each key.

    The classic event-analytics primitive the reference's single-stream
    model never needed (its timeout/debounce cut or thin the stream;
    sessionize LABELS it). Two window passes over ONE key shuffle: a
    lag-compare flags session starts, a cumulative sum numbers them —
    the same plan shape as `changes` + `running_sum`, fully
    partition-parallel per key. Streaming twin: F.session_window /
    the session debounce kernel (streaming/stream.py).
    """
    if not ef.ts_col:
        raise ValueError("sessionize() needs an event-time column")
    w = worder(ef)
    t = ts_seconds(F.col(ef.ts_col))
    gap_prev = t - F.lag(t).over(w)
    new_s = F.when(gap_prev.isNull() | (gap_prev > gap), 1).otherwise(0)
    df = ef.df.withColumn(RN, new_s)
    df = df.withColumn(
        session_col,
        F.sum(RN).over(wcum(ef)) - 1,
    ).drop(RN)
    return ef._with(df=df, value_cols=[*ef.value_cols, session_col])


def resample(ef, every: float, origin: float = 0.0):
    """Downsample the stream into fixed ``every``-second event-time
    buckets per key — the OHLC/candlestick primitive: one row per
    (key, bucket) with ``open``/``high``/``low``/``close`` of the value
    column plus ``n`` and ``vsum``.

    ONE partial-combined hash aggregate on (key, bucket) — min_by/
    max_by ordered by (event-time, seq) pick the endpoints without any
    per-key sort or window, so the map side reduces every bucket to a
    constant-size cell before the shuffle: at 100 TB the exchange
    carries only #buckets rows. Bucket ids are integer floors of epoch
    micros, exact across engines.

    Reference analog: none (the reference's timing ops cut or thin the
    stream; resample AGGREGATES it — the natural batch/stream rollup
    Spark adds).
    """
    if not ef.ts_col:
        raise ValueError("resample() needs an event-time column")
    ev = int(round(every * 1e6))
    org = int(round(origin * 1e6))
    b = F.floor((ts_micros(F.col(ef.ts_col)) - F.lit(org)) / F.lit(ev)).cast("long")
    v = F.col(ef.value_cols[0])
    ordc = F.struct(ts_micros(F.col(ef.ts_col)).alias("t"), F.col(ef.seq_col).alias("s"))
    out = (
        ef.df.groupBy(*[F.col(k) for k in ef.key_cols], b.alias("bucket"))
        .agg(
            F.min_by(v, ordc).alias("open"),
            F.max(v).alias("high"),
            F.min(v).alias("low"),
            F.max_by(v, ordc).alias("close"),
            F.count("*").alias("n"),
            F.round(F.sum(v), 6).alias("vsum"),
        )
        .withColumn(
            "bucket_ts",
            F.timestamp_micros((F.col("bucket") * ev + org).cast("long")),
        )
    )
    return out


def rollup_cascade(
    ef, levels=(60.0, 3600.0, 86400.0), origin: float = 0.0, materialize: bool = True
):
    """Multi-resolution OHLC rollup — the hypertable / continuous-
    aggregate cascade: the FINEST level aggregates the raw stream once
    (``resample``); every coarser level aggregates the PREVIOUS level's
    cells, never the raw stream. Returns the union of all levels with a
    ``level`` column (bucket width in seconds).

    Scale shape: with ``materialize=True`` (default) each cell level is
    ``persist()``-ed, so the 100 TB fact stream is scanned exactly once
    and every coarser exchange carries only #cells rows (minute cells →
    hour cells → day cells) — Catalyst does NOT reuse the finest
    aggregate across the union's branches on its own (verified: the
    lazy plan re-scans the fact table per level; the exchanges don't
    canonicalize equal), and cells are metadata-sized, which is exactly
    the case executor caching exists for. ``materialize=False`` keeps
    the plan fully lazy at the cost of one fact scan per level.
    open/close roll up exactly via min_by/max_by over child bucket ids;
    n/vsum are associative sums — the same cell algebra that makes the
    cascade incrementally maintainable under streaming (append-only
    finest level, re-aggregate touched parents).

    Levels must be ascending and each an integer multiple of the
    previous (the cell lattice must nest). Reference analog: none — the
    reference's timing ops cut or thin streams; this is the rollup
    surface a Spark-native engine adds on top of ``resample``.

    Retention: materialized cell levels stay cached for the session
    (LRU-evictable, #cells-sized; release with ``df.unpersist()`` on
    the returned frame's parents or ``spark.catalog.clearCache()``).
    A side effect worth knowing: Spark's cache manager will serve any
    LOGICALLY EQUAL sub-plan (e.g. a separate ``resample`` call at the
    same width) from these cells — a free cross-query speedup.
    """
    levels = [float(x) for x in levels]
    if len(levels) < 1 or any(b <= a for a, b in zip(levels, levels[1:])):
        raise ValueError("levels must be ascending")
    for a, b in zip(levels, levels[1:]):
        ratio = b / a
        if abs(ratio - round(ratio)) > 1e-9:
            raise ValueError(f"level {b} is not a multiple of {a}")
    cells = resample(ef, levels[0], origin)
    if materialize and len(levels) > 1:
        # persist AND build the cache now (one tiny count job): within a
        # single action, union branches that both need an un-built cache
        # RACE to compute it — each branch would re-scan the 100 TB fact
        # table once (verified via BlockManager 'already exists' on the
        # lazy variant). Forcing the finest level here pins the fact
        # scan count to exactly one; everything above reads cells.
        cells = cells.persist()
        cells.count()
    out = cells.withColumn("level", F.lit(levels[0]))
    keys = [F.col(k) for k in ef.key_cols]
    for prev, nxt in zip(levels, levels[1:]):
        mult = int(round(nxt / prev))
        parent = (
            cells.groupBy(*keys, F.floor(F.col("bucket") / mult).alias("bucket"))
            .agg(
                F.min_by("open", F.col("bucket")).alias("open"),
                F.max("high").alias("high"),
                F.min("low").alias("low"),
                F.max_by("close", F.col("bucket")).alias("close"),
                F.sum("n").alias("n"),
                F.round(F.sum("vsum"), 6).alias("vsum"),
            )
            .withColumn(
                "bucket_ts",
                F.timestamp_micros(
                    (F.col("bucket") * int(round(nxt * 1e6)) + int(round(origin * 1e6))).cast("long")
                ),
            )
        )
        if materialize and nxt != levels[-1]:
            parent = parent.persist()
        out = out.unionByName(parent.withColumn("level", F.lit(nxt)))
        cells = parent
    return out


def rolling(ef, seconds: float, min_periods: int = 1):
    """Trailing event-time window aggregates per key: for every row,
    the sum/count/mean of the value column over ``[ts - seconds, ts]``
    (closed bounds, current row included) — the moving-average /
    rolling-volume primitive.

    ONE key shuffle with a RANGE frame over epoch micros: Spark keeps a
    sliding frame per partition (no per-row rescan), fully parallel per
    key. The frame bound is integer micros so both engines cut the
    window identically. ``min_periods`` NULLs the outputs until the
    frame holds that many rows (pandas convention).

    Adds ``roll_sum`` / ``roll_n`` / ``roll_mean`` columns; when the
    value column is integral, roll_sum is exact (contracts feed
    cents-scaled longs for bit-stable float-free comparison).
    """
    if not ef.ts_col:
        raise ValueError("rolling() needs an event-time column")
    rng = int(round(seconds * 1e6))
    w = (
        wkey(ef)
        .orderBy(ts_micros(F.col(ef.ts_col)))
        .rangeBetween(-rng, 0)
    )
    v = F.col(ef.value_cols[0])
    df = ef.df.withColumn("roll_n", F.count(v).over(w))
    gate = F.when(F.col("roll_n") >= int(min_periods), F.lit(True))
    df = df.withColumn("roll_sum", F.when(gate, F.sum(v).over(w)))
    df = df.withColumn(
        "roll_mean",
        F.when(gate, F.round(F.col("roll_sum") / F.col("roll_n"), 6)),
    )
    df = df.withColumn("roll_n", F.when(gate, F.col("roll_n")))
    return ef._with(df=df, value_cols=[*ef.value_cols, "roll_sum", "roll_n", "roll_mean"])


def anomaly(ef, seconds: float, z: float = 3.0, min_periods: int = 2):
    """Trailing-window z-score anomaly flags per key: each row scored
    against the mean/population-std of its own trailing
    ``[ts - seconds, ts]`` event-time window (current row included —
    the streaming-monitor convention), flagged when |z| crosses ``z``.

    Adds ``roll_n`` / ``zscore`` / ``is_anomaly``; zscore is NULL (and
    the flag false) until the frame holds ``min_periods`` rows or while
    the window is constant (std = 0). zscore is rounded to 6 BEFORE the
    threshold compare so engines agree at the boundary.

    Scale shape: ONE key shuffle with a sliding RANGE frame over
    integer epoch micros (same exchange as ``rolling`` — Spark
    maintains the frame incrementally per partition). No self-join, no
    per-row rescan; fully parallel per key.

    Reference analog: none (the reference's timing ops cut or thin the
    stream); this is the event-analytics alarm primitive the batch/
    streaming engine adds.
    """
    if not ef.ts_col:
        raise ValueError("anomaly() needs an event-time column")
    rng = int(round(seconds * 1e6))
    w = wkey(ef).orderBy(ts_micros(F.col(ef.ts_col))).rangeBetween(-rng, 0)
    v = F.col(ef.value_cols[0])
    df = ef.df.withColumn("roll_n", F.count(v).over(w))
    mean = F.avg(v).over(w)
    std = F.stddev_pop(v).over(w)
    zc = F.when(
        (F.col("roll_n") >= int(min_periods)) & (std > 0),
        F.round((v - mean) / std, 6),
    )
    df = df.withColumn("zscore", zc)
    df = df.withColumn(
        "is_anomaly",
        F.coalesce(F.abs(F.col("zscore")) >= float(z), F.lit(False)),
    )
    return ef._with(df=df, value_cols=[*ef.value_cols, "zscore", "is_anomaly"])
