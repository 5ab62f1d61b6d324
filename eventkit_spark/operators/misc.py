"""Error-channel operators: errors / end_on_error, plus try_map.

Reference semantics: eventkit/ops/misc.py:5-27 (SURVEY.md §2.7). The
reference gives every Event an ``error_event`` side channel; the engine's
convention (SURVEY.md §1.3) is a nullable ``error`` string column that
riding alongside the payload — populated by ``try_map`` (the fallible-UDF
wrapper) or by sources that ingest dirty data.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .common import RN, meta_cols, wcum


ERROR_COL = "error"
ERROR_SRC_COL = "error_src"


def try_map_pandas(ef, fn, return_type, name: str = "value", src: str | None = None):
    """Arrow-batched map that captures per-row exceptions into the
    ``error`` column instead of failing the job (the reference emits
    (source, exception) on error_event, eventkit/ops/op.py:29-33).
    ``src`` tags WHICH map site raised — the reference pair's ``source``
    half — into the ``error_src`` column (default: the callable's
    name); a constant per site, zero runtime cost."""
    import pandas as pd
    from pyspark.sql.types import StringType, StructField, StructType

    out_schema = StructType(
        [StructField("v", return_type), StructField("e", StringType())]
    )

    def _kernel(*cols):
        vals, errs = [], []
        for xs in zip(*cols):
            try:
                vals.append(fn(*xs))
                errs.append(None)
            except Exception as exc:  # noqa: BLE001 - error channel semantics
                vals.append(None)
                errs.append(f"{type(exc).__name__}: {exc}")
        return pd.DataFrame({"v": vals, "e": errs})

    _udf = F.pandas_udf(_kernel, out_schema)

    src = src or getattr(fn, "__name__", None) or "map"
    packed = _udf(*[F.col(c) for c in ef.value_cols])
    cols = [F.col(c) for c in meta_cols(ef)]
    df = ef.df.select(*cols, packed.alias("__ek_packed")).select(
        *[F.col(c) for c in meta_cols(ef)],
        F.col("__ek_packed.v").alias(name),
        F.col("__ek_packed.e").alias(ERROR_COL),
        F.when(F.col("__ek_packed.e").isNotNull(), F.lit(src)).alias(ERROR_SRC_COL),
    )
    return ef._with(df=df, value_cols=[name])


def try_map_cols(ef, fn, names=None, error_msg: str = "map failed",
                 src: str | None = None):
    """Fallible COLUMN-expression map with error-channel semantics.

    The reference propagates exceptions from every operator on
    ``error_event`` (eventkit/ops/op.py:29-33). Spark expressions never
    raise row-wise — the ``try_*`` family (try_cast, try_divide,
    try_element_at) and path extractors (get_json_object) return NULL on
    failure instead. This wrapper turns that convention into the error
    channel: a row whose RESULT is NULL while every input was non-null
    gets ``error`` populated (composed with any pre-existing error via
    coalesce), so e.g. ``try_map(lambda v: F.get_json_object(v, path))``
    is the fallible pluck. Stays fully JVM-side."""
    out = fn(*[F.col(c) for c in ef.value_cols])
    if not isinstance(out, (list, tuple)):
        out = [out]
    if names is None:
        names = ["value"] if len(out) == 1 else [f"v{i}" for i in range(len(out))]
    inputs_ok = F.lit(True)
    for c in ef.value_cols:
        inputs_ok = inputs_ok & F.col(c).isNotNull()
    failed = inputs_ok
    for o in out:
        failed = failed & o.isNull()
    src = src or getattr(fn, "__name__", None) or "map"
    err = F.when(failed, F.lit(error_msg))
    src_col = F.when(failed, F.lit(src))
    if ERROR_COL in ef.df.columns:
        # a pre-existing error wins — keep ITS source tag too
        prior_src = (
            F.col(ERROR_SRC_COL)
            if ERROR_SRC_COL in ef.df.columns
            else F.when(F.col(ERROR_COL).isNotNull(), F.lit("upstream"))
        )
        src_col = F.coalesce(prior_src, src_col)
        err = F.coalesce(F.col(ERROR_COL), err)
    cols = [F.col(c) for c in meta_cols(ef)]
    cols += [o.alias(n) for o, n in zip(out, names)]
    cols.append(err.alias(ERROR_COL))
    cols.append(src_col.alias(ERROR_SRC_COL))
    return ef._with(df=ef.df.select(*cols), value_cols=list(names))


def errors(ef):
    """The error side-channel as a stream (misc.py:5-15). The
    reference emits (source, exception) PAIRS; the engine carries the
    exception text as the stream value and the raising site as the
    ``error_src`` column riding alongside (NULL when the error was
    injected without a tag) — value semantics unchanged, the pair's
    source half recoverable from the frame."""
    if ERROR_COL not in ef.df.columns:
        raise ValueError("stream has no error column; use try_map_pandas first")
    src_col = (
        F.col(ERROR_SRC_COL)
        if ERROR_SRC_COL in ef.df.columns
        else F.lit(None).cast("string")
    )
    df = ef.df.filter(F.col(ERROR_COL).isNotNull()).select(
        *[F.col(c) for c in meta_cols(ef)],
        F.col(ERROR_COL).alias("value"),
        src_col.alias(ERROR_SRC_COL),
    )
    return ef._with(df=df, value_cols=["value"])


def end_on_error(ef):
    """Terminate the stream at the first error row (misc.py:17-27):
    cumulative all-clear flag, then filter."""
    if ERROR_COL not in ef.df.columns:
        raise ValueError("stream has no error column; use try_map_pandas first")
    ok = F.when(F.col(ERROR_COL).isNull(), 1).otherwise(0)
    flag = F.min(ok).over(wcum(ef))
    df = ef.df.withColumn(RN, flag)
    return ef._with(df=df.filter(F.col(RN) == 1).drop(RN))
