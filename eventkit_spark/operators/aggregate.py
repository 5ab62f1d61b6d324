"""Running (cumulative) and trailing-window aggregates.

Reference semantics: eventkit/ops/aggregate.py + eventkit/ops/array.py
(SURVEY.md §2.4). All reference aggregates emit on every input row, i.e.
cumulative window aggregates (``rowsBetween(unboundedPreceding,
currentRow)``); the Array* family are trailing-``n`` frames.

Scale design: every op here is a plain window aggregate over
``partitionBy(key).orderBy(seq)`` — one shuffle on the key, then a single
ordered pass per partition with partial aggregation where Spark supports
it. Product and EMA, which have no built-in running form, are decomposed
into window sums (log-space / closed-form geometric scan) so they stay
JVM-side and O(n) instead of a Python loop or an O(n^2) collected-array
fold.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .common import RN, meta_cols, value_col, wcum, worder, wtrail


def _running(ef, agg_fn, name="value", frame=None):
    v = value_col(ef)
    w = frame if frame is not None else wcum(ef)
    out = agg_fn(v, w)
    cols = [F.col(c) for c in meta_cols(ef)] + [out.alias(name)]
    return ef._with(df=ef.df.select(*cols), value_cols=[name])


def min_(ef):
    """Running minimum (aggregate.py:39-43)."""
    return _running(ef, lambda v, w: F.min(v).over(w))


def max_(ef):
    """Running maximum (aggregate.py:46-50)."""
    return _running(ef, lambda v, w: F.max(v).over(w))


def sum_(ef, start=0):
    """Running sum plus ``start`` (aggregate.py:53-57)."""
    return _running(ef, lambda v, w: F.sum(v).over(w) + F.lit(start))


def mean(ef):
    """Running arithmetic mean (aggregate.py:67-78)."""
    return _running(ef, lambda v, w: F.avg(v).over(w))


def any_(ef):
    """Running boolean OR of truthiness (aggregate.py:81-85)."""
    return _running(
        ef, lambda v, w: (F.max(v.cast("boolean").cast("int")).over(w) == 1)
    )


def all_(ef):
    """Running boolean AND of truthiness (aggregate.py:88-92)."""
    return _running(
        ef, lambda v, w: (F.min(v.cast("boolean").cast("int")).over(w) == 1)
    )


def _product_expr(v, w, start):
    """Running product via sign/zero/log decomposition (aggregate.py:60-64).

    No built-in product aggregate exists; exp(sum(ln|x|)) with separate
    running zero-count and negative-sign parity keeps it a pure window sum
    (parallel, partial-aggregated) instead of an O(n^2) array fold.
    """
    zeros = F.sum(F.when(v == 0, 1).otherwise(0)).over(w)
    negs = F.sum(F.when(v < 0, 1).otherwise(0)).over(w)
    mag = F.exp(F.sum(F.when(v != 0, F.log(F.abs(v))).otherwise(F.lit(0.0))).over(w))
    signed = F.when(negs % 2 == 1, -mag).otherwise(mag)
    return F.when(zeros > 0, F.lit(0.0)).otherwise(signed) * F.lit(start)


def product(ef, start=1):
    """Running product times ``start`` (aggregate.py:60-64)."""
    return _running(ef, lambda v, w: _product_expr(v, w, start))


def ema(ef, n: int | None = None, weight: float | None = None):
    """Exponential moving average (aggregate.py:95-111).

    Reference recurrence: ema_0 = x_0; ema_t = (1-w)*ema_{t-1} + w*x_t,
    w = weight or 2/(n+1). Rewritten as a closed-form geometric scan —
    ema_i = q^i * sum_{j<=i}(c_j x_j q^{-j}), c_0 = 1, c_j = w — which is
    a single window sum (JVM-side, partition-parallel), not a sequential
    Python loop. Numerics: q^{-j} grows ~ e^{|ln q| j}; safe for streams
    up to ~6000 rows per key at w=0.1 (double overflows past q^-j ~ 1e300).
    For longer per-key streams use a segmented-scan/applyInPandas variant.
    """
    w_ = weight if weight is not None else 2.0 / (n + 1)
    q = 1.0 - w_
    if q == 0.0:
        # w=1 (n=1): ema_t = x_t — the closed form would divide by q^i
        return _running(ef, lambda v, win: v * 1.0)

    def expr(v, win):
        i = F.row_number().over(worder(ef)) - 1
        coeff = F.when(i == 0, F.lit(1.0)).otherwise(F.lit(w_))
        term = coeff * v * F.pow(F.lit(q), -i)
        s = F.sum(term).over(win)
        return F.pow(F.lit(q), i) * s

    return _running(ef, expr)


_MULTI_KINDS = {
    "min": lambda v, w, ef: F.min(v).over(w),
    "max": lambda v, w, ef: F.max(v).over(w),
    "sum": lambda v, w, ef: F.sum(v).over(w),
    "mean": lambda v, w, ef: F.avg(v).over(w),
    "count": lambda v, w, ef: F.count(v).over(w),
    "product": lambda v, w, ef: _product_expr(v, w, 1),
    "any": lambda v, w, ef: F.max(v.cast("boolean").cast("int")).over(w) == 1,
    "all": lambda v, w, ef: F.min(v.cast("boolean").cast("int")).over(w) == 1,
}


def running_multi(ef, *kinds: str, ema_n: int | None = None):
    """N running aggregates side by side in ONE window pass — the
    optimized form of ``fork(...).zip()`` over aggregate branches
    (tests/event_test.py:148-152). All expressions share one window
    spec, so Catalyst plans a single exchange + a single Window node
    (asserted in tests/test_plans.py), where the general fork_zip pays a
    join per branch."""
    v = value_col(ef)
    w = wcum(ef)
    cols = [F.col(c) for c in meta_cols(ef)]
    names = []
    for kind in kinds:
        if kind == "ema":
            i = F.row_number().over(worder(ef)) - 1
            w_ = 2.0 / ((ema_n or 10) + 1)
            q = 1.0 - w_
            if q == 0.0:
                out = v * 1.0
            else:
                coeff = F.when(i == 0, F.lit(1.0)).otherwise(F.lit(w_))
                out = F.pow(F.lit(q), i) * F.sum(coeff * v * F.pow(F.lit(q), -i)).over(w)
        else:
            out = _MULTI_KINDS[kind](v, w, ef)
        cols.append(out.alias(kind))
        names.append(kind)
    return ef._with(df=ef.df.select(*cols), value_cols=names)


def pairwise(ef):
    """Emit (previous, current) pairs from the 2nd row on
    (aggregate.py:114-127)."""
    w = worder(ef)
    v = value_col(ef)
    prev = F.lag(v, 1).over(w)
    df = ef.df.select(
        *[F.col(c) for c in meta_cols(ef)],
        prev.alias("prev"),
        v.alias("cur"),
        F.row_number().over(w).alias(RN),
    )
    return ef._with(df=df.filter(F.col(RN) > 1).drop(RN), value_cols=["prev", "cur"])


def reduce_(ef, merge_expr, initializer=None, result_type="double"):
    """Generic running fold (aggregate.py:18-36).

    ``merge_expr(acc, x) -> Column`` folds over the cumulative collected
    array via the ``aggregate`` higher-order function. O(n^2) work per
    stream — correct for arbitrary folds, but prefer the specific running
    aggregates above (O(n)) whenever the fold is one of them.
    """
    v = value_col(ef)
    arr = F.collect_list(v).over(wcum(ef))
    init = F.lit(initializer).cast(result_type)
    if initializer is None:
        # without initializer the first element seeds the fold
        out = F.aggregate(
            F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))),
            F.element_at(arr, 1).cast(result_type),
            merge_expr,
        )
    else:
        out = F.aggregate(arr, init, merge_expr)
    cols = [F.col(c) for c in meta_cols(ef)] + [out.alias("value")]
    return ef._with(df=ef.df.select(*cols), value_cols=["value"])


def list_(ef):
    """Collect the whole stream into one ordered array per key, emitted
    once at end (aggregate.py:130-143)."""
    v = value_col(ef)
    pairs = F.array_sort(
        F.collect_list(F.struct(F.col(ef.seq_col).alias("s"), v.alias("v")))
    )
    aggs = [F.max(ef.seq_col).alias(ef.seq_col), pairs.alias("__ek_pairs")]
    if ef.ts_col:
        aggs.insert(1, F.max(ef.ts_col).alias(ef.ts_col))
    if ef.key_cols:
        grouped = ef.df.groupBy(*ef.key_cols).agg(*aggs)
    else:
        grouped = ef.df.groupBy().agg(*aggs)
    value = F.transform(F.col("__ek_pairs"), lambda p: p.getField("v")).alias("value")
    cols = [F.col(c) for c in meta_cols(ef)] + [value]
    return ef._with(df=grouped.select(*cols), value_cols=["value"])


def deque(ef, count: int = 0):
    """Trailing window of the last ``count`` values (or all so far) as an
    array, emitted every row (aggregate.py:146-159; numpy twin
    array.py:9-22). collect_list over a rows frame preserves emit order."""
    v = value_col(ef)
    w = wtrail(ef, count) if count else wcum(ef)
    out = F.collect_list(v).over(w)
    cols = [F.col(c) for c in meta_cols(ef)] + [out.alias("value")]
    return ef._with(df=ef.df.select(*cols), value_cols=["value"])


# -- Array* reductions (eventkit/ops/array.py:73-126): the reference
# materializes a trailing numpy array then reduces it; we fuse both steps
# into one windowed aggregate over the trailing frame (no array built).

def _trail_frame(ef, n: int):
    return wtrail(ef, n) if n else wcum(ef)


def array_min(ef, n: int = 0):
    return _running(ef, lambda v, w: F.min(v).over(w), frame=_trail_frame(ef, n))


def array_max(ef, n: int = 0):
    return _running(ef, lambda v, w: F.max(v).over(w), frame=_trail_frame(ef, n))


def array_sum(ef, n: int = 0):
    return _running(ef, lambda v, w: F.sum(v).over(w), frame=_trail_frame(ef, n))


def array_mean(ef, n: int = 0):
    return _running(ef, lambda v, w: F.avg(v).over(w), frame=_trail_frame(ef, n))


def array_prod(ef, n: int = 0):
    return _running(
        ef, lambda v, w: _product_expr(v, w, 1), frame=_trail_frame(ef, n)
    )


def array_std(ef, n: int = 0):
    """Sample std (ddof=1) over the trailing frame; NULL when n<2 — the
    engine's NULL stands in for numpy NaN (array.py:108-112)."""
    return _running(ef, lambda v, w: F.stddev_samp(v).over(w), frame=_trail_frame(ef, n))


def array_any(ef, n: int = 0):
    return _running(
        ef,
        lambda v, w: (F.max(v.cast("boolean").cast("int")).over(w) == 1),
        frame=_trail_frame(ef, n),
    )


def array_all(ef, n: int = 0):
    return _running(
        ef,
        lambda v, w: (F.min(v.cast("boolean").cast("int")).over(w) == 1),
        frame=_trail_frame(ef, n),
    )
