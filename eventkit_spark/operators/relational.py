"""Relational extras the reference lacks (SURVEY.md §2.9): the as-of
join and the binned point-in-interval join (``interval_join``), exposed
as first-class DataFrame operators.

The scale-correct formulation is NOT a range join (O(n·m) comparisons,
un-broadcastable at 100 TB): union the two tagged streams and take one
running ``last(ignorenulls)`` window per key — exactly one shuffle on
the `by` key, linear in total rows, the same shape `timing.sample` and
TakeUntil use internally. Right-side payloads ride a single struct so N
carried columns still cost one window expression.

The UNKEYED case (``by=None``) cannot ride a key shuffle — a naive
global window serializes everything through one task. It instead runs
the classic two-pass carry-forward: fix range boundaries once with a
driver-side quantile sketch, assign every row a deterministic bucket id
from the broadcast boundary array, compute the running last WITHIN each
bucket (a window keyed on the bucket id — balanced, parallel), then
broadcast each bucket's closing right-row so later buckets coalesce
their leading unmatched rows against the carry-in. One shuffle (bucket
id) plus a P-row broadcast instead of one single-task sort — and no
``localCheckpoint`` materialization: bucket ids are pure expressions, so
the plan stays lazy, fault-tolerant, and re-computable (the r3 design
pinned ``spark_partition_id`` over a sampled range exchange, which
required eagerly checkpointing the whole union — ADVICE.md r3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType

from ..session import session_width

from .common import memo_range_bounds, range_bucket_id


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by: list[str] | str | None = None,
    right_cols: list[str] | None = None,
    tolerance: float | None = None,
    suffix: str = "_r",
    partitions: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` (per ``by`` key group) — a LEFT as-of join:
    left rows with no prior right row keep NULLs.

    ``direction`` follows pandas ``merge_asof``: ``"backward"`` (the
    default above), ``"forward"`` (EARLIEST right row with ``right.ts
    >= left.ts``) or ``"nearest"`` (whichever of the two is closer in
    time; exact ties resolve backward). All three ride the SAME single
    key shuffle — forward is just a second window expression with a
    following frame over the same partitioning (one extra sort, no
    extra exchange), and nearest coalesces the pair by time distance.

    ``right_cols`` limits which right columns are carried (default: all
    non-key, non-ts). ``tolerance`` drops matches farther than
    ``tolerance`` from ``left.ts`` on the match's side of it — in
    SECONDS when ``ts_col`` is a timestamp, in the column's own units
    when it is numeric (any orderable numeric ts works; only the
    timestamp case converts via ``unix_micros``). Rows at exactly
    left.ts ARE visible from both directions (the <= / >= convention of
    e.g. DuckDB's ASOF JOIN). If several right rows share one
    (key, ts), the one with the highest tie-break order wins for
    backward, the lowest for forward — pre-aggregate the right side if
    that matters.

    ``partitions`` sizes the unkeyed range partitioning (default:
    ``spark.sql.shuffle.partitions``); ignored when ``by`` is given.

    Plan-time note (unkeyed form only): the range boundaries come from
    ONE driver-side ``approxQuantile`` sketch, which runs a cheap Spark
    job when the join is CONSTRUCTED (not at first action) — the
    literal boundaries are what make every branch that re-reads the
    union recompute identical bucket ids with no checkpoint. Repeat
    constructions over the same input plan hit a memo cache
    (semantic-hash keyed), so building a pipeline twice triggers no
    second job.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest, got {direction!r}")
    by = [] if by is None else ([by] if isinstance(by, str) else list(by))
    # normalize event-time flavor first: TIMESTAMP_NTZ (naive parquet,
    # pandas default) is reinterpreted as LTZ in the session tz (pinned
    # UTC) so ordering/epoch expressions are legal and both sides union
    # to one type
    if isinstance(left.schema[ts_col].dataType, TimestampNTZType):
        left = left.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if isinstance(right.schema[ts_col].dataType, TimestampNTZType):
        right = right.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
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
    right_mark = F.when(F.col("__tag") == 0, F.col("__p"))
    need_back = direction in ("backward", "nearest")
    need_fwd = direction in ("forward", "nearest")
    if by:
        if need_back:
            wb = (
                W.partitionBy(*by)
                .orderBy(F.col(ts_col), F.col("__tag"))
                .rowsBetween(W.unboundedPreceding, W.currentRow)
            )
            u = u.withColumn("__mb", F.last(right_mark, ignorenulls=True).over(wb))
        if need_fwd:
            # tag DESC puts an equal-ts right row AFTER the left row, so
            # the following frame sees it (>= convention); same
            # partitioning as the backward window — one shuffle total
            wf = (
                W.partitionBy(*by)
                .orderBy(F.col(ts_col), F.col("__tag").desc())
                .rowsBetween(W.currentRow, W.unboundedFollowing)
            )
            u = u.withColumn("__mf", F.first(right_mark, ignorenulls=True).over(wf))
    else:
        # deterministic two-pass carry-forward (module docstring):
        # boundaries come from ONE driver-side quantile sketch (a single
        # cheap pass, no materialization), and the bucket id is a pure
        # expression over the broadcast literal array — every branch
        # that re-reads ``u`` recomputes the SAME ids, so no pinning /
        # checkpoint is needed and executor loss just recomputes.
        n_part = partitions or session_width(u.sparkSession)
        tnum = F.col(ts_col).cast("double")
        # memo the sketch by the semantic hash of the projected plan:
        # constructing the same join twice (or fanning one join out to
        # several downstream pipelines) must not re-run the plan-time
        # quantile job
        bounds = memo_range_bounds(u.select(tnum.alias("__t")), n_part)
        pid = range_bucket_id(tnum, bounds)
        u = u.withColumn("__pid", pid)
        pids = (
            u.sparkSession.range(len(bounds) + 1)
            .select(F.col("id").cast("int").alias("__pid"))
        )
        if need_back:
            wloc = (
                W.partitionBy("__pid")
                .orderBy(F.col(ts_col), F.col("__tag"))
                .rowsBetween(W.unboundedPreceding, W.currentRow)
            )
            u = u.withColumn("__mb", F.last(right_mark, ignorenulls=True).over(wloc))
            # carry-ins: each bucket's closing right payload, lagged
            # forward across the (len(bounds)+1)-row bucket table,
            # broadcast back
            closing = (
                u.filter(F.col("__tag") == 0)
                .groupBy("__pid")
                .agg(F.max_by("__p", F.struct(F.col(ts_col))).alias("__pl"))
            )
            wcarry = W.orderBy("__pid").rowsBetween(W.unboundedPreceding, -1)
            carry = (
                pids.join(closing, "__pid", "left")
                .withColumn("__carry", F.last("__pl", ignorenulls=True).over(wcarry))
                .select("__pid", "__carry")
            )
            u = u.join(F.broadcast(carry), "__pid", "left").withColumn(
                "__mb", F.coalesce(F.col("__mb"), F.col("__carry"))
            ).drop("__carry")
        if need_fwd:
            wlocf = (
                W.partitionBy("__pid")
                .orderBy(F.col(ts_col), F.col("__tag").desc())
                .rowsBetween(W.currentRow, W.unboundedFollowing)
            )
            u = u.withColumn("__mf", F.first(right_mark, ignorenulls=True).over(wlocf))
            # mirrored carry: each bucket's OPENING right payload, pulled
            # backward from later buckets
            opening = (
                u.filter(F.col("__tag") == 0)
                .groupBy("__pid")
                .agg(F.min_by("__p", F.struct(F.col(ts_col))).alias("__pf"))
            )
            wcarryf = W.orderBy("__pid").rowsBetween(1, W.unboundedFollowing)
            carryf = (
                pids.join(opening, "__pid", "left")
                .withColumn("__carry_f", F.first("__pf", ignorenulls=True).over(wcarryf))
                .select("__pid", "__carry_f")
            )
            u = u.join(F.broadcast(carryf), "__pid", "left").withColumn(
                "__mf", F.coalesce(F.col("__mf"), F.col("__carry_f"))
            ).drop("__carry_f")
    out = u.filter(F.col("__tag") == 1)
    is_ts = isinstance(left.schema[ts_col].dataType, TimestampType)

    def _dist(match):
        # non-negative time distance from left.ts to the match's ts
        if is_ts:
            return F.abs(
                F.unix_micros(F.col(ts_col)) - F.unix_micros(match["__asof_ts"])
            )
        return F.abs(F.col(ts_col) - match["__asof_ts"])

    def _fresh(match):
        if tolerance is None:
            return F.lit(True)
        if is_ts:
            return _dist(match) <= int(tolerance * 1_000_000)
        return _dist(match) <= F.lit(tolerance)

    if direction == "backward":
        out = out.withColumn("__m", F.when(_fresh(F.col("__mb")), F.col("__mb")))
    elif direction == "forward":
        out = out.withColumn("__m", F.when(_fresh(F.col("__mf")), F.col("__mf")))
    else:  # nearest: tolerance applies per side, then closer wins (tie -> backward)
        mb = F.when(_fresh(F.col("__mb")), F.col("__mb"))
        mf = F.when(_fresh(F.col("__mf")), F.col("__mf"))
        take_back = mf.isNull() | (mb.isNotNull() & (_dist(mb) <= _dist(mf)))
        out = out.withColumn("__m", F.when(take_back, mb).otherwise(mf))
    keep = [F.col(c) for c in left.columns]
    keep += [F.col(f"__m.{c}").alias(c + suffix if c in left.columns else c) for c in right_cols]
    keep.append(F.col("__m.__asof_ts").alias(ts_col + suffix))
    return out.select(*keep)


def _tnum(col: F.Column) -> F.Column:
    """Orderable numeric surrogate for a time-ish column: timestamps
    (either flavor) become epoch seconds, numerics cast to double.

    The numeric branch is detected FIRST, via a string hop (numerics
    render as parseable numbers, timestamps don't): routing numerics
    through ``cast(timestamp)`` instead would interpret epoch-micros
    longs as epoch SECONDS and SATURATE at the timestamp range limit
    (collapsing every large value to one constant and breaking range
    filters — the multi_touch interval-join regression; try_cast
    saturates the same way rather than yielding NULL). Timestamps of
    either flavor fall through to the epoch-seconds cast, which is
    legal for NTZ only via the timestamp hop (common.py)."""
    return F.coalesce(
        col.cast("string").try_cast("double"),
        col.cast("timestamp").cast("double"),
    )


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    by: list[str] | str | None = None,
    bucket_width: float | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Point-in-interval join: each event row pairs with every interval
    row where ``start <= ts <= end`` (and the ``by`` keys match).

    Vanilla Spark plans an inequality-only join as
    BroadcastNestedLoopJoin — O(events x intervals) comparisons, a
    scale cliff the moment neither side broadcasts. This is the binned
    range join instead (the same strategy as Databricks' range-join
    hint and genomics overlap joins): bucket time into fixed-width
    bins, events land in ONE bin, each interval explodes into every
    bin it covers, and the pair space shrinks to an EQUI-join on
    (by..., bin) + the exact range filter. An event's bin is unique, so
    no pair dedup is needed. Cost: shuffle O(events + sum(interval
    length / width)); a width near the median interval length keeps the
    per-interval explosion ~O(1).

    ``bucket_width`` defaults to the median interval length via one
    cheap driver-side quantile sketch (seconds for timestamps, column
    units for numerics). Intervals with ``end < start`` are dropped
    (Spark's ``sequence`` would silently generate DESCENDING bins for
    them). Timestamps of either flavor (LTZ / NTZ) and plain numerics
    all work — comparisons ride a numeric surrogate column.

    Returns events.* plus the intervals' payload columns
    (``right_cols``, default all non-key/non-bound), suffixed on
    collision. Inner join: events matching no interval are dropped
    (wrap with a left anti-join against the result keys for the outer
    variant).
    """
    by = [] if by is None else ([by] if isinstance(by, str) else list(by))
    if right_cols is None:
        right_cols = [
            c for c in intervals.columns if c not in by and c not in (start_col, end_col)
        ]
    ev = events.withColumn("__t", _tnum(F.col(ts_col)))
    iv = (
        intervals.withColumn("__s", _tnum(F.col(start_col)))
        .withColumn("__e", _tnum(F.col(end_col)))
        .filter(F.col("__s") <= F.col("__e"))
    )
    if bucket_width is None:
        med = iv.select((F.col("__e") - F.col("__s")).alias("__len")).approxQuantile(
            "__len", [0.5], 0.01
        )
        bucket_width = float(med[0]) if med and med[0] and med[0] > 0 else 1.0
    w = float(bucket_width)
    ev = ev.withColumn("__b", F.floor(F.col("__t") / w))
    iv = iv.withColumn(
        "__b", F.explode(F.sequence(F.floor(F.col("__s") / w), F.floor(F.col("__e") / w)))
    )
    keep_r = [
        F.col(c).alias(c + suffix if c in events.columns else c) for c in right_cols
    ]
    iv = iv.select(*[F.col(c) for c in by], F.col("__b"), F.col("__s"), F.col("__e"), *keep_r)
    joined = ev.join(iv, on=[*by, "__b"], how="inner").filter(
        (F.col("__s") <= F.col("__t")) & (F.col("__t") <= F.col("__e"))
    )
    out_cols = [F.col(c) for c in events.columns]
    out_cols += [
        F.col(c + suffix if c in events.columns else c)
        for c in right_cols
    ]
    return joined.select(*out_cols)


# Poisson(1) inverse-CDF thresholds scaled to the u ~ uniform[0, 1e6)
# integer grid: weight k iff u < cum[k]*1e6 (cum = e^-1 * sum 1/j!).
_POIS1_CUM = [367879, 735759, 919699, 980980, 996300, 999406, 999917]


def _mix31(v):
    """Nonlinear 31-bit mixer expressible in ANSI SQL: multiply, then
    shift-xor, then multiply again (Wang-hash style) — pure */>>/xor/%
    integer ops, byte-identical in Spark and DuckDB. Affine-only maps
    (the plain Knuth multiply) leave per-row replicate streams with a
    CONSTANT stride, which correlates bootstrap weights; the shift-xor
    breaks the stride.

    Overflow contract: the input folds to 31 bits BEFORE the first
    multiply — (v mod 2^31) * c mod 2^31 == v * c mod 2^31, so the
    value is unchanged, but every intermediate stays < 2^62 and the
    mixer survives ANSI mode at any seq id (v*2654435761 alone would
    raise ARITHMETIC_OVERFLOW once v >= ~3.47e9, i.e. seq ids >= ~54M
    at replicas=64 — exactly the scale the bootstrap targets)."""
    v31 = v.cast("long") % F.lit(1 << 31)
    a = (v31 * F.lit(2654435761)) % F.lit(1 << 31)
    b = F.shiftright(a, 15).bitwiseXOR(a)
    return (b * F.lit(2246822519)) % F.lit(1 << 31)


def bootstrap_ci(
    df: DataFrame,
    value_col: str,
    by: str | list[str],
    seq_col: str = "event_id",
    replicas: int = 64,
    lo: float = 0.025,
    hi: float = 0.975,
    seed: int = 0,
) -> DataFrame:
    """Per-group mean with Poisson-bootstrap confidence intervals — the
    A/B-testing uncertainty primitive done the 100 TB way: instead of
    resampling rows (a shuffle per replica), every row fans out to
    ``replicas`` deterministic Poisson(1) weights derived from a
    nonlinear integer hash of (row id, replica, seed), and ALL replicas
    ride two small hash aggregates (per (group, replica), then per
    group) — the streaming-bootstrap trick used by large-scale
    experimentation platforms (Chamandy et al. 2012).

    Plan shape note: the replica fan-out is an EXPLODE over a sequence
    literal, NOT 2R aggregate expressions in one agg — hundreds of
    aggregate buffers push the operator past the whole-stage-codegen
    field limit and the giant CASE forest evaluates interpreted
    (measured 11 s -> sub-second at sf0.1 for this rewrite). The
    exploded rows partial-aggregate map-side, so the exchange carries
    #groups x replicas cells only.

    Determinism contract: values aggregate in integer cents
    (``sum(w * cents)`` is an exact long, so accumulation order cannot
    drift between engines), replicate means are exact-int divisions,
    and the CI cut is explicit linear interpolation over the sorted
    replicate means — every step replays bit-identically in ANSI SQL.
    Empty replicas (all weights 0 — possible in tiny groups) are
    excluded from the quantile, matching the oracle.

    Returns (by..., n, mean, ci_lo, ci_hi) — mean/CI rounded to 6.
    """
    by = [by] if isinstance(by, str) else list(by)
    if not 0.0 <= lo < hi <= 1.0:
        raise ValueError(f"need 0 <= lo < hi <= 1, got {lo}, {hi}")
    cents = F.round(F.col(value_col) * 100, 0).cast("long")
    rep = df.select(
        *[F.col(k) for k in by],
        cents.alias("__c"),
        F.col(seq_col).cast("long").alias("__i"),
        F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("__b"),
    )
    u = _mix31(
        F.col("__i") * F.lit(replicas) + (F.col("__b") + F.lit(replicas * seed))
    ) % F.lit(1_000_000)
    w = F.lit(len(_POIS1_CUM))
    for k in reversed(range(len(_POIS1_CUM))):
        w = F.when(u < _POIS1_CUM[k], k).otherwise(w)
    per = (
        rep.withColumn("__w", w)
        .groupBy(*[F.col(k) for k in by], F.col("__b"))
        .agg(
            F.sum(F.col("__w") * F.col("__c")).alias("__ws"),
            F.sum("__w").alias("__wn"),
            F.count("*").cast("long").alias("__n"),
            F.sum("__c").alias("__s0"),
        )
    )
    g = per.groupBy(*[F.col(k) for k in by]).agg(
        F.min("__n").alias("__n"),
        F.min("__s0").alias("__s0"),
        F.array_sort(
            F.collect_list(
                F.when(F.col("__wn") > 0, F.col("__ws").cast("double") / F.col("__wn"))
            )
        ).alias("__means"),
    )
    means = F.col("__means")

    def interp(q):
        n = F.size(means)
        idx = (n - 1).cast("double") * F.lit(float(q))
        i0 = F.floor(idx).cast("int")
        frac = idx - i0
        a = F.element_at(means, i0 + 1)
        b_ = F.element_at(means, F.least(i0 + 2, n))
        return a * (1 - frac) + b_ * frac

    return g.select(
        *[F.col(k) for k in by],
        F.col("__n").alias("n"),
        F.round(F.col("__s0").cast("double") / F.col("__n") / 100.0, 6).alias("mean"),
        F.round(interp(lo) / 100.0, 6).alias("ci_lo"),
        F.round(interp(hi) / 100.0, 6).alias("ci_hi"),
    )


def ab_lift(
    df: DataFrame,
    value_col: str,
    variant_col: str,
    treat,
    control,
    seq_col: str = "event_id",
    replicas: int = 64,
    lo: float = 0.025,
    hi: float = 0.975,
    seed: int = 0,
) -> DataFrame:
    """A/B lift with a PAIRED Poisson-bootstrap CI on the
    treatment-minus-control mean difference — the experiment readout
    primitive on top of ``bootstrap_ci``'s machinery: both arms reuse
    the SAME replica index per resample (paired replicates), the lift
    distribution is the per-replica difference of arm means, and
    ``significant`` is true when the CI excludes zero.

    Scale shape: the replica fan-out is an EXPLODE (the bootstrap_ci
    plan-shape note — hundreds of conditional aggregate buffers in one
    agg fall out of whole-stage codegen and evaluate interpreted;
    measured 37 s -> ~1 s at sf0.1 for this rewrite), then a per-replica
    conditional aggregate (64 cells, map-side combined) and a one-row
    finisher. The same determinism contract as bootstrap_ci:
    integer-cents accumulators, explicit interpolation, ANSI-replayable
    mixer.

    Returns ONE row: (n_treat, n_control, mean_treat, mean_control,
    lift, ci_lo, ci_hi, significant) — means/lift/CI rounded to 6.
    """
    if not 0.0 <= lo < hi <= 1.0:
        raise ValueError(f"need 0 <= lo < hi <= 1, got {lo}, {hi}")
    v = F.col(variant_col)
    sub = df.filter(v.isin([treat, control]))
    cents = F.round(F.col(value_col) * 100, 0).cast("long")
    rep = sub.select(
        (v == F.lit(treat)).alias("__t"),
        cents.alias("__c"),
        F.col(seq_col).cast("long").alias("__i"),
        F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("__b"),
    )
    u = _mix31(
        F.col("__i") * F.lit(replicas) + (F.col("__b") + F.lit(replicas * seed))
    ) % F.lit(1_000_000)
    w = F.lit(len(_POIS1_CUM))
    for k in reversed(range(len(_POIS1_CUM))):
        w = F.when(u < _POIS1_CUM[k], k).otherwise(w)
    is_t = F.col("__t")
    per = (
        rep.withColumn("__w", w)
        .groupBy("__b")
        .agg(
            F.sum(F.when(is_t, F.col("__w") * F.col("__c")).otherwise(0)).alias("__wst"),
            F.sum(F.when(is_t, F.col("__w")).otherwise(0)).alias("__wnt"),
            F.sum(F.when(~is_t, F.col("__w") * F.col("__c")).otherwise(0)).alias("__wsc"),
            F.sum(F.when(~is_t, F.col("__w")).otherwise(0)).alias("__wnc"),
            F.sum(F.when(is_t, 1).otherwise(0)).cast("long").alias("__nt"),
            F.sum(F.when(~is_t, 1).otherwise(0)).cast("long").alias("__nc"),
            F.sum(F.when(is_t, F.col("__c")).otherwise(0)).alias("__st"),
            F.sum(F.when(~is_t, F.col("__c")).otherwise(0)).alias("__sc"),
        )
    )
    g = per.agg(
        F.min("__nt").alias("__nt"),
        F.min("__nc").alias("__nc"),
        F.min("__st").alias("__st"),
        F.min("__sc").alias("__sc"),
        F.array_sort(
            F.collect_list(
                F.when(
                    (F.col("__wnt") > 0) & (F.col("__wnc") > 0),
                    F.col("__wst").cast("double") / F.col("__wnt")
                    - F.col("__wsc").cast("double") / F.col("__wnc"),
                )
            )
        ).alias("__lifts"),
    )
    lifts = F.col("__lifts")

    def interp(q):
        n = F.size(lifts)
        idx = (n - 1).cast("double") * F.lit(float(q))
        i0 = F.floor(idx).cast("int")
        frac = idx - i0
        a = F.element_at(lifts, i0 + 1)
        b_ = F.element_at(lifts, F.least(i0 + 2, n))
        return a * (1 - frac) + b_ * frac

    mt = F.col("__st").cast("double") / F.col("__nt") / 100.0
    mc = F.col("__sc").cast("double") / F.col("__nc") / 100.0
    cl, ch = interp(lo) / 100.0, interp(hi) / 100.0
    return g.select(
        F.col("__nt").alias("n_treat"),
        F.col("__nc").alias("n_control"),
        F.round(mt, 6).alias("mean_treat"),
        F.round(mc, 6).alias("mean_control"),
        F.round(mt - mc, 6).alias("lift"),
        F.round(cl, 6).alias("ci_lo"),
        F.round(ch, 6).alias("ci_hi"),
        ((cl > 0) | (ch < 0)).alias("significant"),
    )


def cuped(
    df: DataFrame,
    y_col: str,
    x_col: str,
    variant_col: str,
    treat,
    control,
) -> DataFrame:
    """CUPED variance reduction (Deng et al. 2013): adjust the
    experiment metric ``y`` by its pre-period covariate ``x``
    (``y_adj = y - theta (x - mean_x)``, theta = cov(x,y)/var(x)) and
    report the raw vs adjusted lift plus the variance-reduction factor
    — the standard trick that shrinks A/B confidence intervals without
    more traffic.

    Input is a UNIT-level table (one row per randomization unit with
    its metric and covariate — aggregate events to users first).

    Scale shape: because the adjusted arm mean expands in closed form
    (``mean(y|arm) - theta (mean(x|arm) - mean_x)``), the WHOLE readout
    is ONE map-side-combined global aggregate (global co-moments +
    per-arm conditional sums) and pure driver-free arithmetic — no
    second adjusted-data pass, no shuffle of units. Variance reduction
    = corr(x,y)^2 (population moments).

    Returns ONE row: (n_treat, n_control, lift_raw, lift_cuped, theta,
    var_reduction_pct) — round 6; theta/adjustment degrade to 0 when
    var(x) = 0.
    """
    v = F.col(variant_col)
    sub = df.filter(v.isin([treat, control]))
    x, y = F.col(x_col).cast("double"), F.col(y_col).cast("double")
    is_t = v == F.lit(treat)
    g = sub.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
        F.sum(y * y).alias("syy"),
        F.sum(F.when(is_t, 1).otherwise(0)).cast("long").alias("nt"),
        F.sum(F.when(is_t, x).otherwise(0.0)).alias("sxt"),
        F.sum(F.when(is_t, y).otherwise(0.0)).alias("syt"),
        F.sum(F.when(~is_t, 1).otherwise(0)).cast("long").alias("nc"),
        F.sum(F.when(~is_t, x).otherwise(0.0)).alias("sxc"),
        F.sum(F.when(~is_t, y).otherwise(0.0)).alias("syc"),
    )
    n = F.col("n").cast("double")
    mx = F.col("sx") / n
    var_x = F.col("sxx") / n - mx * mx
    cov = F.col("sxy") / n - mx * (F.col("sy") / n)
    var_y = F.col("syy") / n - (F.col("sy") / n) * (F.col("sy") / n)
    theta = F.when(var_x > 0, cov / var_x).otherwise(F.lit(0.0))
    myt = F.col("syt") / F.col("nt")
    myc = F.col("syc") / F.col("nc")
    mxt = F.col("sxt") / F.col("nt")
    mxc = F.col("sxc") / F.col("nc")
    lift_raw = myt - myc
    lift_cuped = (myt - theta * (mxt - mx)) - (myc - theta * (mxc - mx))
    vr = F.when(
        (var_x > 0) & (var_y > 0), (cov * cov) / (var_x * var_y) * 100.0
    ).otherwise(F.lit(0.0))
    return g.select(
        F.col("nt").alias("n_treat"),
        F.col("nc").alias("n_control"),
        F.round(lift_raw, 6).alias("lift_raw"),
        F.round(lift_cuped, 6).alias("lift_cuped"),
        F.round(theta, 6).alias("theta"),
        F.round(vr, 6).alias("var_reduction_pct"),
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on,
    how: str = "inner",
    salt: int = 16,
    hot_keys: DataFrame | None = None,
    min_count: int = 1_000_000,
    sample_fraction: float = 0.001,
) -> DataFrame:
    """Equi-join with explicit hot-key salting — the straggler/OOM fix
    for skewed join keys at 100 TB.

    Why not rely on AQE alone: AQE's skew-join splits oversized
    SortMergeJoin partitions AFTER the shuffle files exist, which helps
    with partition-level skew but still funnels each single key through
    one mapper-side stream and does nothing for broadcast-ineligible
    hash joins or for skew the stats miss.  Salting splits ONE key
    across ``salt`` reducer tasks deterministically, bounded and
    plan-visible.

    Mechanics: hot keys (caller-supplied DataFrame, or detected from a
    seeded sample when ``hot_keys=None`` — keys whose extrapolated
    count ≥ ``min_count``) are broadcast.  Cold rows take the plain
    equi-join.  Hot LEFT rows get a deterministic per-row salt
    (xxhash64 of the row, so task retries re-derive the same salt — a
    rand() salt breaks exactly-once under retry); the hot RIGHT slice
    replicates ``salt``× via explode; the branches union.  Result ==
    the plain join, row for row (the oracle checks exactly that), for
    ``how`` in {'inner', 'left'}.

    Cost model: replication is ``salt × |right ∩ hot|`` rows — keep the
    hot set tight (it is the point: salt ONLY what skews).
    """
    on = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how in {'inner','left'}")
    if salt < 2:
        raise ValueError("salt must be >= 2")
    if hot_keys is None:
        est = (
            left.sample(fraction=sample_fraction, seed=7)
            .groupBy(*on)
            .agg((F.count("*") / sample_fraction).alias("__est"))
        )
        hot = est.filter(F.col("__est") >= min_count).select(*on)
    else:
        hot = hot_keys.select(*on)
    hot = F.broadcast(hot.distinct())
    left_cold = left.join(hot, on, "left_anti")
    left_hot = left.join(hot, on, "left_semi")
    cold = left_cold.join(right, on, how)
    sid = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    lh = left_hot.withColumn("__salt", sid)
    rh = right.join(hot, on, "left_semi").withColumn(
        "__salt", F.explode(F.array([F.lit(i) for i in range(salt)]))
    )
    hotj = lh.join(rh, [*on, "__salt"], how).drop("__salt")
    return cold.unionByName(hotj)


def funnel(
    df: DataFrame,
    steps: list,
    ts_col: str = "ts",
    by: list[str] | str = "user_id",
    within: float | None = None,
) -> DataFrame:
    """Ordered conversion funnel per key: the earliest chain of rows
    matching ``steps`` in order (step k at-or-after step k-1's earliest
    completion), one output row per key that reached step 1.

    ``steps`` is a list of Column predicates (or SQL strings); the
    output carries ``t1..tn`` (each step's earliest qualifying event
    time, NULL once the chain breaks), ``steps_completed``, and — when
    ``within`` seconds is given — ``converted`` (all steps within the
    window of t1). Greedy-earliest is the standard funnel semantics
    (Amplitude/Mixpanel "first conversion"): matching earliest step-1
    maximizes nothing in general, but gives deterministic, explainable
    results and is the convention analytics engines document.

    Scale shape: step k is ONE filtered partial aggregate keyed on
    ``by`` joined back to the (#keys)-row funnel table — k small
    hash-agg + key-join rounds, never a window over the event stream
    and never a per-key sort. At 100 TB each round shuffles only
    matching events' (key, ts) pairs; AQE broadcasts the funnel table
    side when #keys is small.

    No reference analog (eventkit has no multi-step pattern matching);
    SQL oracle: chained min-aggregate subqueries.
    """
    by = [by] if isinstance(by, str) else list(by)
    preds = [F.expr(p) if isinstance(p, str) else p for p in steps]
    if not preds:
        raise ValueError("funnel() needs at least one step predicate")
    t = F.col(ts_col)
    cur = (
        df.filter(preds[0])
        .groupBy(*by)
        .agg(F.min(t).alias("t1"))
    )
    for k, p in enumerate(preds[1:], start=2):
        nxt = (
            df.join(cur.select(*by, F.col(f"t{k-1}")), on=by)
            .filter(p & (t >= F.col(f"t{k-1}")))
            .groupBy(*by)
            .agg(F.min(t).alias(f"t{k}"))
        )
        cur = cur.join(nxt, on=by, how="left")
    n = len(preds)
    completed = F.lit(1)
    for k in range(2, n + 1):
        completed = completed + F.when(F.col(f"t{k}").isNotNull(), 1).otherwise(0)
    out = cur.withColumn("steps_completed", completed.cast("int"))
    if within is not None:
        last = F.col(f"t{n}")
        span_ok = (
            last.isNotNull()
            & (
                last.cast("timestamp").cast("double")
                - F.col("t1").cast("timestamp").cast("double")
                <= float(within)
            )
        )
        out = out.withColumn("converted", span_ok)
    return out


def attribution(
    df: DataFrame,
    touch,
    conversion,
    ts_col: str = "ts",
    seq_col: str = "event_id",
    by: list[str] | str = "user_id",
    lookback: float | None = None,
) -> DataFrame:
    """Last-touch attribution: attach to every conversion event the most
    recent prior touch event by the same key (the marketing-analytics
    primitive — "which click gets credit for this purchase").

    ``touch`` / ``conversion`` are Column predicates (or SQL strings)
    over the event rows. A touch at the conversion's exact timestamp
    counts (the as-of <= convention); among same-timestamp touches the
    highest ``seq_col`` wins — fully deterministic. With ``lookback``
    seconds set, touches older than the window are not credited (the
    conversion row survives with NULL credit).

    Output: one row per conversion — key cols, ``conv_id``,
    ``touch_id`` (NULL if unattributed), ``delta_us`` (conversion
    minus touch time, integer micros, NULL if unattributed).

    Scale shape: ONE scan (both predicates tag the same pass — no
    per-predicate re-scan), ONE key shuffle, ONE running
    last(ignorenulls) window — the same union-window shape as the
    keyed as-of join, linear in events. The naive formulation is a
    range self-join (quadratic per hot key); this is the one to run at
    100 TB. Oracle: per-conversion arg_max over the bounded range join.
    """
    from .common import ts_micros

    by = [by] if isinstance(by, str) else list(by)
    tp = F.expr(touch) if isinstance(touch, str) else touch
    cp = F.expr(conversion) if isinstance(conversion, str) else conversion
    t_us = ts_micros(F.col(ts_col))
    tag = F.when(tp, F.lit(0)).when(cp, F.lit(1))
    tagged = (
        df.withColumn("__tag", tag)
        .filter(F.col("__tag").isNotNull())
        .select(*by, F.col(seq_col).alias("__id"), t_us.alias("__t"), "__tag")
    )
    w = (
        W.partitionBy(*by)
        .orderBy("__t", "__tag", "__id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    last_touch = F.last(
        F.when(F.col("__tag") == 0, F.struct(F.col("__t").alias("t"), F.col("__id").alias("i"))),
        ignorenulls=True,
    ).over(w)
    conv = (
        tagged.withColumn("__lt", last_touch)
        .filter(F.col("__tag") == 1)
    )
    delta = F.col("__t") - F.col("__lt.t")
    credited = F.col("__lt").isNotNull() & (
        F.lit(True)
        if lookback is None
        else (delta <= F.lit(int(round(lookback * 1e6))))
    )
    return conv.select(
        *by,
        F.col("__id").alias("conv_id"),
        F.when(credited, F.col("__lt.i")).alias("touch_id"),
        F.when(credited, delta).cast("long").alias("delta_us"),
    )


def multi_touch(
    df: DataFrame,
    touch,
    conversion,
    lookback: float,
    ts_col: str = "ts",
    seq_col: str = "event_id",
    by: list[str] | str = "user_id",
) -> DataFrame:
    """Multi-touch (linear) attribution: EVERY touch inside the
    conversion's ``lookback`` window shares the credit equally — the
    companion to ``attribution``'s winner-take-all last-touch view.
    Credits are integer ppm (``1e6 div n`` with the remainder on the
    LAST touch, so each conversion's credits sum to exactly 1e6 — no
    float split to drift).

    Output: one row per (conversion, touch) pair — key cols,
    ``conv_id``, ``touch_id``, ``delta_us``, ``n_touches``,
    ``credit_ppm``, plus ``is_first`` / ``is_last`` position flags
    (position-based models reweight on these).

    Scale shape: the pair space is the binned interval join
    (``interval_join``'s bucket trick — each conversion is a
    ``lookback``-long interval, each touch lands in one bin), so the
    join is an EQUI-join on (key, bin), never an inequality nested
    loop; the per-conversion counts/positions are one window over the
    conversion-id exchange of the (bounded) pair table.
    """
    by = [by] if isinstance(by, str) else list(by)
    tp = F.expr(touch) if isinstance(touch, str) else touch
    cp = F.expr(conversion) if isinstance(conversion, str) else conversion
    from .common import ts_micros

    t_us = ts_micros(F.col(ts_col))
    touches = df.filter(tp).select(
        *by, F.col(seq_col).alias("touch_id"), t_us.alias("ts")
    )
    lb = int(round(lookback * 1e6))
    convs = df.filter(cp).select(
        *by,
        F.col(seq_col).alias("conv_id"),
        (t_us - F.lit(lb)).alias("start"),
        t_us.alias("end"),
    )
    pairs = interval_join(
        touches,
        convs,
        ts_col="ts",
        by=by,
        bucket_width=float(lb),
        right_cols=["conv_id", "end"],
    )
    w = W.partitionBy("conv_id")
    wo = w.orderBy(F.col("ts"), F.col("touch_id"))
    n = F.count("*").over(w)
    pos = F.row_number().over(wo)
    base = F.expr("1000000 div __n")
    out = (
        pairs.withColumn("__n", n)
        .withColumn("__pos", pos)
        .select(
            *by,
            "conv_id",
            "touch_id",
            (F.col("end") - F.col("ts")).cast("long").alias("delta_us"),
            F.col("__n").cast("long").alias("n_touches"),
            F.when(F.col("__pos") == F.col("__n"), F.lit(1000000) - base * (F.col("__n") - 1))
            .otherwise(base)
            .cast("long")
            .alias("credit_ppm"),
            (F.col("__pos") == 1).alias("is_first"),
            (F.col("__pos") == F.col("__n")).alias("is_last"),
        )
    )
    return out


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    start_col: str = "start",
    end_col: str = "end",
    by: list[str] | str | None = None,
    bucket_width: float | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Interval x interval overlap join: each left interval pairs with
    every right interval sharing the ``by`` keys whose ranges overlap
    (``l.start <= r.end AND r.start <= l.end``, closed bounds — the
    genomics/temporal-overlap convention).

    Same binning strategy as ``interval_join``, extended to the
    two-sided case: BOTH sides explode into the fixed-width bins their
    range covers, pairs meet on an EQUI-join over (by..., bin), and —
    because two overlapping intervals can now share MANY bins — each
    pair is kept only in the FIRST bin both cover
    (``bin == floor(max(l.start, r.start) / width)``), which dedups
    without a distinct/shuffle. Cost: shuffle O(sum(len/width)) per
    side; width near the median interval length keeps the explosion
    ~O(1) per row. Vanilla Spark would plan the raw inequality join as
    BroadcastNestedLoop — the same scale cliff interval_join avoids.

    ``bucket_width`` defaults to the pooled median interval length via
    one driver-side quantile sketch. Degenerate (end < start) intervals
    are dropped on both sides. Timestamps (either flavor) and numerics
    both work. Returns left.* plus the right payload columns
    (``right_cols``, default all non-key/non-bound), suffixed on
    collision.
    """
    by = [] if by is None else ([by] if isinstance(by, str) else list(by))
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in by and c not in (start_col, end_col)
        ]
    lv = (
        left.withColumn("__ls", _tnum(F.col(start_col)))
        .withColumn("__le", _tnum(F.col(end_col)))
        .filter(F.col("__ls") <= F.col("__le"))
    )
    rv = (
        right.withColumn("__rs", _tnum(F.col(start_col)))
        .withColumn("__re", _tnum(F.col(end_col)))
        .filter(F.col("__rs") <= F.col("__re"))
    )
    if bucket_width is None:
        meds = []
        for d, s, e in ((lv, "__ls", "__le"), (rv, "__rs", "__re")):
            q = d.select((F.col(e) - F.col(s)).alias("__len")).approxQuantile(
                "__len", [0.5], 0.01
            )
            if q and q[0] and q[0] > 0:
                meds.append(float(q[0]))
        bucket_width = sum(meds) / len(meds) if meds else 1.0
    w = float(bucket_width)
    lv = lv.withColumn(
        "__b", F.explode(F.sequence(F.floor(F.col("__ls") / w), F.floor(F.col("__le") / w)))
    )
    rv = rv.withColumn(
        "__b", F.explode(F.sequence(F.floor(F.col("__rs") / w), F.floor(F.col("__re") / w)))
    )
    keep_r = [
        F.col(c).alias(c + suffix if c in left.columns else c) for c in right_cols
    ]
    rv = rv.select(*[F.col(c) for c in by], "__b", "__rs", "__re", *keep_r)
    joined = lv.join(rv, on=[*by, "__b"], how="inner").filter(
        (F.col("__ls") <= F.col("__re"))
        & (F.col("__rs") <= F.col("__le"))
        # keep each pair only in the first shared bin: no distinct pass
        & (F.col("__b") == F.floor(F.greatest(F.col("__ls"), F.col("__rs")) / w))
    )
    out_cols = [F.col(c) for c in left.columns]
    out_cols += [F.col(c + suffix if c in left.columns else c) for c in right_cols]
    return joined.select(*out_cols)


def topk_per_group(
    df: DataFrame,
    by: list[str] | str,
    order_col,
    k: int = 3,
    descending: bool = True,
    tie_cols: list | None = None,
) -> DataFrame:
    """Top-``k`` rows per group by ``order_col`` — the per-entity
    leaderboard primitive (top products per region, top terms per doc).

    ONE window ``row_number`` over the group shuffle: with many groups
    this is fully parallel (each partition sorts only its groups), the
    right 100 TB shape as long as no single group dominates — for a
    known-hot group set, pre-filter with an aggregate max/approx
    threshold first. ``tie_cols`` (default: the remaining columns in
    order) break ranking ties deterministically so results are stable
    across runs and engines.

    Returns df.* plus ``rank`` (1-based).
    """
    by = [by] if isinstance(by, str) else list(by)
    oc = F.col(order_col) if isinstance(order_col, str) else order_col
    oc = oc.desc() if descending else oc.asc()
    ties = [F.col(c) if isinstance(c, str) else c for c in (tie_cols or [])]
    w = W.partitionBy(*by).orderBy(oc, *ties)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def retention(
    df: DataFrame,
    ts_col: str = "ts",
    by: str = "user_id",
    period: float = 86400.0,
) -> DataFrame:
    """Cohort retention triangle: entities grouped by their FIRST-seen
    period (cohort), counted by how many were active again ``offset``
    periods later. Output: (cohort, offset, n_active) with offset 0 =
    cohort size.

    Scale shape: the first-seen table is one partial-combined aggregate
    on ``by`` (shuffles only distinct keys), joined back to the
    per-(key, period) distinct activity — both shuffles carry key+int
    pairs, never payloads, and the final (cohort, offset) aggregate is
    tiny. No window over the event stream. Periods are
    ``floor(epoch / period)`` so cohorts are stable across engines.
    """
    p = F.floor(_tnum(F.col(ts_col)) / float(period))
    acts = df.select(F.col(by).alias("k"), p.alias("__p")).distinct()
    first = acts.groupBy("k").agg(F.min("__p").alias("__c"))
    return (
        acts.join(first, "k")
        .groupBy(F.col("__c").alias("cohort"), (F.col("__p") - F.col("__c")).alias("offset"))
        .agg(F.count("*").alias("n_active"))
    )


def histogram(
    df: DataFrame,
    col,
    lo: float,
    hi: float,
    nbins: int = 10,
    by: list[str] | str | None = None,
) -> DataFrame:
    """Fixed-width histogram of a numeric column (optionally per ``by``
    group): bin ``i`` covers ``[lo + i*wd, lo + (i+1)*wd)``; values
    below ``lo`` clamp to bin 0, at-or-above ``hi`` to bin nbins-1
    (numpy.histogram edge convention for the last bin). Output:
    (by..., bin, bin_lo, n, lo_val, hi_val).

    ONE partial-combined hash aggregate over at most nbins*#groups
    cells — the canonical map-side-combine shape; at 100 TB the shuffle
    carries only the cell table. Bin ids are exact integer floors of
    ``(x - lo) / wd`` so both engines agree without float-boundary
    drift (callers pick lo/hi/nbins so data doesn't sit exactly on an
    edge... as with any float histogram).
    """
    by = [] if by is None else ([by] if isinstance(by, str) else list(by))
    x = (F.col(col) if isinstance(col, str) else col).cast("double")
    wd = (float(hi) - float(lo)) / int(nbins)
    raw = F.floor((x - float(lo)) / wd)
    b = F.least(F.greatest(raw, F.lit(0)), F.lit(int(nbins) - 1)).cast("long")
    return (
        df.groupBy(*[F.col(c) for c in by], b.alias("bin"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.min(x), 6).alias("lo_val"),
            F.round(F.max(x), 6).alias("hi_val"),
        )
        .withColumn("bin_lo", F.round(F.lit(float(lo)) + F.col("bin") * wd, 6))
    )


def rfm(
    df: DataFrame,
    ts_col: str = "ts",
    by: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """RFM segmentation aggregate: per entity, Recency (seconds from
    the entity's last event to the corpus's last event), Frequency
    (event count) and Monetary (value sum) — the classic
    behavioral-cohort primitive next to ``retention``/``funnel``.

    Output: (key, recency_s, frequency, monetary) — recency as whole
    seconds (integer micros difference, floor-divided, exact across
    engines), monetary rounded to 6.

    Scale shape: ONE partial-combined hash aggregate on the key (the
    shuffle carries one cell per entity) plus a 1-row corpus-max
    aggregate broadcast back — no windows, no event-stream sort. Scores
    /quintiles are downstream composition (``histogram`` or ntile over
    the ALREADY-AGGREGATED entity table, never the event stream).
    """
    t = _tnum(F.col(ts_col))
    per = df.groupBy(F.col(by).alias("key")).agg(
        F.max(t).alias("__last"),
        F.count("*").alias("frequency"),
        F.round(F.sum(F.col(value_col)), 6).alias("monetary"),
    )
    corpus_max = df.agg(F.max(t).alias("__cmax"))
    return (
        per.crossJoin(F.broadcast(corpus_max))
        .select(
            "key",
            F.floor(F.col("__cmax") - F.col("__last")).cast("long").alias("recency_s"),
            "frequency",
            "monetary",
        )
    )


def twap(
    df: DataFrame,
    ts_col: str = "ts",
    by: str = "user_id",
    value_col: str = "value",
    order_col: str = "event_id",
) -> DataFrame:
    """Time-weighted average value per entity (TWAP): each event's value
    holds until the next event and is weighted by that interval; the
    final (open-ended) observation carries no weight. The event-time
    companion to the plain ``mean`` aggregate — robust to burst
    sampling, the standard fair-average for irregular series.

    Values are scaled to cents (round-half-up, long) and intervals to
    integer micros, so both sums are EXACT under any partial-aggregation
    order — the result is bit-stable across engines and cluster sizes.

    Scale shape: the ``lead`` window and the aggregate share ONE key
    exchange; the shuffle carries (long, long) per event. Zero-length
    intervals (duplicate timestamps) drop out with zero weight.
    """
    from .common import ts_micros

    w = W.partitionBy(by).orderBy(order_col)
    d = (
        df.withColumn("__t_us", ts_micros(F.col(ts_col)))
        .withColumn("__cents", F.round(F.col(value_col) * 100, 0).cast("long"))
        .withColumn("__dt_us", F.lead("__t_us").over(w) - F.col("__t_us"))
        .filter(F.col("__dt_us").isNotNull() & (F.col("__dt_us") > 0))
    )
    return d.groupBy(by).agg(
        F.round(
            F.sum(F.col("__cents") * F.col("__dt_us")) / (100.0 * F.sum("__dt_us")),
            6,
        ).alias("twap"),
        F.count("*").alias("n_intervals"),
    )


def interarrival(
    df: DataFrame,
    ts_col: str = "ts",
    by: str = "user_id",
    group_col: str = "event_type",
    order_col: str = "event_id",
) -> DataFrame:
    """Inter-arrival gap statistics per event class over each entity's
    stream: gaps are lagged differences WITHIN (entity, class), stats
    aggregate ACROSS entities per class — the arrival-process view
    (rate, burstiness ceiling) next to ``sessionize``'s burst cut.

    Integer-micros gaps keep the sums exact; the mean divides two exact
    integers so it is bit-stable across engines.

    Scale shape: one (entity, class) exchange shared by the lag window,
    then a partial-combined aggregate whose shuffle carries one cell per
    class.
    """
    from .common import ts_micros

    w = W.partitionBy(by, group_col).orderBy(order_col)
    g = (
        df.withColumn("__t_us", ts_micros(F.col(ts_col)))
        .withColumn("__gap_us", F.col("__t_us") - F.lag("__t_us").over(w))
        .filter(F.col("__gap_us").isNotNull())
    )
    return g.groupBy(group_col).agg(
        F.count("*").alias("n_gaps"),
        F.sum("__gap_us").alias("sum_gap_us"),
        F.max("__gap_us").alias("max_gap_us"),
        F.round(F.sum("__gap_us") / (1000000.0 * F.count("*")), 6).alias("mean_gap_s"),
    )


def rollup_timeseries(
    df: DataFrame,
    ts_col: str = "ts",
    by: list[str] | str | None = None,
    grains: tuple[str, ...] = ("hour", "day"),
    value_col: str = "value",
) -> DataFrame:
    """Multi-granularity time rollup — the hypertable "continuous
    aggregate" shape — in ONE scan: per (grain, bucket, by...) emit
    count / exact-cents sum / min / max of ``value_col``.

    The naive form runs one aggregate job per grain (G scans of a
    100 TB fact table). This uses GROUPING SETS: Catalyst plans a
    single scan + Expand (one replica per grain, each carrying only its
    truncated bucket) + ONE partial-combined hash aggregate, so the
    shuffle carries at most sum over grains of #buckets x #groups cells
    — aggregate-sized, never event-sized. Adding a grain adds an Expand
    replica, not a scan.

    Values sum in half-away-from-zero cents (long) so partial
    aggregation order cannot change the result; ``sum_value`` is
    returned at original scale rounded to 2. Grains are ``date_trunc``
    units (year/quarter/month/week/day/hour/minute...). Output:
    (grain string, bucket timestamp, by..., n, sum_value, min_value,
    max_value).
    """
    from .common import as_ts

    by = [] if by is None else ([by] if isinstance(by, str) else list(by))
    ts = as_ts(F.col(ts_col))
    v = F.col(value_col)
    cents = F.signum(v) * F.floor(F.abs(v) * 100 + F.lit(0.5))
    staged = df.select(
        *[F.col(c) for c in by],
        cents.cast("long").alias("__cents"),
        v.alias("__v"),
        *[F.date_trunc(g, ts).alias(f"__g_{g}") for g in grains],
    )
    grouped = staged.groupingSets(
        [[*by, f"__g_{g}"] for g in grains],
        *[F.col(c) for c in by],
        *[F.col(f"__g_{g}") for g in grains],
    ).agg(
        F.count("*").alias("n"),
        F.round(F.sum("__cents") / 100.0, 2).alias("sum_value"),
        F.round(F.min("__v"), 6).alias("min_value"),
        F.round(F.max("__v"), 6).alias("max_value"),
    )
    grain_lbl = F.coalesce(
        *[
            F.when(F.col(f"__g_{g}").isNotNull(), F.lit(g))
            for g in grains
        ]
    )
    bucket = F.coalesce(*[F.col(f"__g_{g}") for g in grains])
    return grouped.select(
        grain_lbl.alias("grain"),
        bucket.alias("bucket"),
        *[F.col(c) for c in by],
        "n",
        "sum_value",
        "min_value",
        "max_value",
    )


def pivot_agg(
    df: DataFrame,
    key: str,
    pivot_col: str,
    values: list[str],
    value_col: str = "value",
    agg: str = "sum",
) -> DataFrame:
    """Wide pivot: one row per ``key``, one column per DECLARED pivot
    value (``{pivot_col}_{v}``) holding ``agg`` of ``value_col``
    (sum/count/min/max/avg), plus ``n_other`` counting rows whose pivot
    value is outside ``values`` (so nothing silently disappears).

    ``values`` must be declared by the caller: Spark's ``pivot()``
    without a value list runs a DISTINCT discovery job over the fact
    table before planning — a hidden extra 100 TB scan. With declared
    values this is a conditional-aggregate projection: ONE scan, ONE
    partial-combined aggregate keyed on ``key``, the shuffle carrying
    #values cells per key. Sums are exact-cents (long) rescaled, so
    partial-aggregation order is immaterial.
    """
    aggs = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max, "avg": F.avg}
    if agg not in aggs:
        raise ValueError(f"agg must be one of {sorted(aggs)}, got {agg!r}")
    fn = aggs[agg]
    v = F.col(value_col)
    cents = (F.signum(v) * F.floor(F.abs(v) * 100 + F.lit(0.5))).cast("long")
    cols = []
    for val in values:
        m = F.when(F.col(pivot_col) == val, cents if agg == "sum" else v)
        out = fn(m)
        if agg == "sum":
            out = F.round(out / 100.0, 2)
        elif agg == "avg":
            out = F.round(out, 6)
        cols.append(out.alias(f"{pivot_col}_{val}"))
    # NULL pivot keys: isin() is NULL (not False) for NULL, so ~isin
    # alone would drop NULL-keyed rows from BOTH the declared columns
    # and n_other — count them as "other" explicitly.
    other = F.sum(
        F.when(
            ~F.col(pivot_col).isin(*values) | F.col(pivot_col).isNull(), 1
        ).otherwise(0)
    ).alias("n_other")
    return df.groupBy(F.col(key)).agg(*cols, other)


def seasonal_decompose(
    df: DataFrame,
    index_col: str,
    value_col: str,
    period: int,
    by: str | None = None,
    normalize: bool = False,
) -> DataFrame:
    """Classical additive seasonal decomposition (the moving-average
    recipe every stats package ships): ``value = trend + seasonal +
    resid`` over a REGULAR integer-indexed series — trend from a
    centered moving average (the 2x-MA endpoint-halving form for even
    ``period``), seasonal as the per-phase mean of the detrended
    values, residual as the remainder. Returns
    ``(by?, index, value, trend, seasonal, resid)``; trend (and hence
    seasonal contributions / resid) is NULL where the centered window
    is incomplete (the series' edges). A phase with NO complete-window
    row anywhere (series shorter than ~2 periods) has no seasonal mean,
    and its rows drop from the output entirely — decomposing a series
    that short is undefined in the classical recipe anyway.

    Cross-engine determinism: values quantize to exact integer cents;
    the trend numerator and the per-phase detrended sums are INTEGER
    window/group sums (exact under any partial-aggregation order), and
    every double appears only in a final fixed-order division — so a
    SQL oracle replays the doubles bit-identically. ``normalize=True``
    additionally re-centers the seasonal means to sum to zero
    (statsmodels' convention); that pass sums ``period`` doubles and is
    deterministic only per engine, so contract queries pin the
    unnormalized form.

    Scale shape: one key exchange carries the whole thing — the
    centered windows and the final projection ride it, the per-phase
    means are a ``period``-sized broadcast join back. ``by=None``
    windows over one partition (a single series is one task's worth of
    data by definition; decompose per entity with ``by=``).
    """
    if period < 2:
        raise ValueError(f"need period >= 2, got {period}")
    keys = [by] if by else []
    wpart = W.partitionBy(*keys) if keys else W.partitionBy(F.lit(0))
    half = period // 2
    even = period % 2 == 0
    cents = F.round(F.col(value_col) * 100, 0).cast("long")
    d = df.select(
        *keys, F.col(index_col).alias("__i"), cents.alias("__c")
    )
    w_full = wpart.orderBy("__i").rowsBetween(-half, half)
    if even:
        w_int = wpart.orderBy("__i").rowsBetween(-half + 1, half - 1)
        t_num = F.sum("__c").over(w_full) + F.sum("__c").over(w_int)
        t_den = 2 * period
        n_need = period + 1
    else:
        t_num = F.sum("__c").over(w_full)
        t_den = period
        n_need = period
    complete = F.count("__c").over(w_full) == n_need
    d = d.withColumn("__tnum", F.when(complete, t_num)).withColumn(
        "__phase", F.pmod(F.col("__i"), F.lit(period)).cast("int")
    )
    # exact detrended numerator: value - trend scaled by 100 * t_den
    d = d.withColumn("__dnum", F.col("__c") * t_den - F.col("__tnum"))
    seas = (
        d.filter(F.col("__dnum").isNotNull())
        .groupBy(*keys, "__phase")
        .agg(
            F.sum("__dnum").alias("__snum"),
            F.count("*").alias("__sn"),
        )
        .withColumn(
            "__seasonal",
            F.col("__snum") / (F.col("__sn") * F.lit(float(t_den * 100))),
        )
    )
    if normalize:
        wk = W.partitionBy(*keys) if keys else W.partitionBy(F.lit(0))
        seas = seas.withColumn(
            "__seasonal",
            F.col("__seasonal")
            - F.avg("__seasonal").over(wk),
        )
    j = d.join(F.broadcast(seas.select(*keys, "__phase", "__seasonal")),
               [*keys, "__phase"])
    value = F.col("__c") / 100.0
    trend = F.col("__tnum") / F.lit(float(t_den * 100))
    return j.select(
        *keys,
        F.col("__i").alias(index_col),
        F.round(value, 6).alias("value"),
        F.round(trend, 6).alias("trend"),
        F.round(F.when(trend.isNotNull(), F.col("__seasonal")), 6).alias(
            "seasonal"
        ),
        F.round(value - trend - F.col("__seasonal"), 6).alias("resid"),
    )
