"""Higher-order stream operators: emap + the four join disciplines
(mergemap / chainmap / concatmap / switchmap).

Reference: eventkit/ops/transform.py:291-346 — ``emap`` constructs a
child Event per source row and a joiner flattens the child streams
(SURVEY.md §2.3). In the engine, the child generator is a Column
expression producing ``array<struct<dt: double, value: T>>`` per parent
row: ``dt`` is the child emit's event-time offset (seconds) from the
parent row's ts. Children are realized with one ``posexplode`` — fully
distributed, no per-row Python.

Join disciplines (validated against the reference's marble goldens,
tests/transform_test.py:117-166):
- mergemap: interleave children by child event time (transform.py:321-325)
- chainmap: strict parent order, children buffered (transform.py:328-332)
- concatmap: a child stream's first emit disconnects all earlier
  children; rows of child k survive only before the first emit of any
  child j>k (transform.py:335-339 + Concat's popleft discipline)
- switchmap: each child is live from its first emit until the first
  emit of the next child to start (transform.py:342-346 + Switch)

Scale: the only shuffle is the final per-key re-sequencing window; the
concat/switch cut tables are per-(key, parent) aggregates joined back —
these grow with parent count, so they're plain shuffled joins (not
broadcast) and AQE picks the strategy.
"""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from .common import ts_micros

PSEQ = "__ek_pseq"
CIDX = "__ek_cidx"


def _explode_children(ef, child_gen):
    """One row per child emit: (keys, parent_seq, child_idx, ts, value)."""
    if not ef.ts_col:
        raise ValueError("emap needs an event-time column")
    children = child_gen(*[F.col(c) for c in ef.value_cols])
    df = ef.df.select(
        *[F.col(k) for k in ef.key_cols],
        F.col(ef.seq_col).alias(PSEQ),
        F.col(ef.ts_col).alias("__ek_pts"),
        F.posexplode(children).alias(CIDX, "__ek_child"),
    )
    child_ts = F.timestamp_micros(
        (
            ts_micros(F.col("__ek_pts"))
            + (F.col("__ek_child.dt") * 1e6).cast("long")
        )
    )
    return df.select(
        *[F.col(k) for k in ef.key_cols],
        F.col(PSEQ),
        F.col(CIDX),
        child_ts.alias("ts"),
        F.col("__ek_child.value").alias("value"),
    )


def _reseq(ef, df, order_cols):
    keys = ef.key_cols
    w = (W.partitionBy(*keys) if keys else W.partitionBy(F.lit(0))).orderBy(*order_cols)
    df = df.withColumn("seq", F.row_number().over(w) - 1)
    return ef._with(
        df=df.select("seq", "ts", *[F.col(k) for k in keys], "value"),
        value_cols=["value"],
        seq_col="seq",
        ts_col="ts",
        key_cols=list(keys),
    )


def mergemap(ef, child_gen):
    """emap + Merge: children interleaved by event time."""
    rows = _explode_children(ef, child_gen)
    return _reseq(ef, rows, [F.col("ts"), F.col(PSEQ), F.col(CIDX)])


def chainmap(ef, child_gen):
    """emap + Chain: all of child 0, then child 1, ... (buffered)."""
    rows = _explode_children(ef, child_gen)
    return _reseq(ef, rows, [F.col(PSEQ), F.col(CIDX)])


def _first_emits(ef, rows):
    group = [*ef.key_cols, PSEQ]
    return rows.groupBy(*group).agg(
        F.min(F.struct(F.col("ts"), F.col(PSEQ), F.col(CIDX))).alias("__ek_first")
    )


def concatmap(ef, child_gen):
    """emap + Concat: child k's rows survive until the first emit of any
    later-started child (which disconnects k); tie goes to the earlier
    child via the (ts, parent_seq, child_idx) struct compare."""
    rows = _explode_children(ef, child_gen)
    firsts = _first_emits(ef, rows)
    wlater = (
        W.partitionBy(*ef.key_cols) if ef.key_cols else W.partitionBy(F.lit(0))
    ).orderBy(PSEQ).rowsBetween(1, W.unboundedFollowing)
    cuts = firsts.withColumn("__ek_kill", F.min("__ek_first").over(wlater)).drop("__ek_first")
    joined = rows.join(cuts, on=[*ef.key_cols, PSEQ], how="left")
    row_key = F.struct(F.col("ts"), F.col(PSEQ), F.col(CIDX))
    kept = joined.filter(F.col("__ek_kill").isNull() | (row_key < F.col("__ek_kill")))
    return _reseq(ef, kept.drop("__ek_kill"), [F.col("ts"), F.col(PSEQ), F.col(CIDX)])


def switchmap(ef, child_gen):
    """emap + Switch: a child is live from its first emit until the first
    emit of the next child to start; replaced children never resume."""
    rows = _explode_children(ef, child_gen)
    firsts = _first_emits(ef, rows)
    wnext = (
        W.partitionBy(*ef.key_cols) if ef.key_cols else W.partitionBy(F.lit(0))
    ).orderBy(F.col("__ek_first"))
    cuts = firsts.withColumn("__ek_next", F.lead("__ek_first").over(wnext)).drop("__ek_first")
    joined = rows.join(cuts, on=[*ef.key_cols, PSEQ], how="left")
    row_key = F.struct(F.col("ts"), F.col(PSEQ), F.col(CIDX))
    kept = joined.filter(F.col("__ek_next").isNull() | (row_key < F.col("__ek_next")))
    return _reseq(ef, kept.drop("__ek_next"), [F.col("ts"), F.col(PSEQ), F.col(CIDX)])


def emap(ef, child_gen, joiner="merge"):
    """Generic emap (reference event.py:865-879): construct a child
    stream per source row and flatten with ``joiner``.

    ``joiner`` is one of the four named disciplines ("merge" / "chain" /
    "concat" / "switch") or a callable — the engine analog of the
    reference's user-supplied ``AddableJoinOp``. A callable joiner
    receives ``(ef, rows)`` where ``rows`` is the exploded child
    DataFrame (key columns, ``__ek_pseq`` parent seq, ``__ek_cidx``
    child emit index, ``ts``, ``value``); it selects/filters rows and
    returns the finished frame — use ``resequence(ef, df, order_cols)``
    for the standard tail."""
    if callable(joiner):
        rows = _explode_children(ef, child_gen)
        return joiner(ef, rows)
    try:
        fn = {
            "merge": mergemap,
            "chain": chainmap,
            "concat": concatmap,
            "switch": switchmap,
        }[joiner]
    except KeyError:
        raise ValueError(
            f"joiner must be merge/chain/concat/switch or a callable, got {joiner!r}"
        ) from None
    return fn(ef, child_gen)


def resequence(ef, df, order_cols):
    """Public tail for custom emap joiners: deterministic per-key
    re-sequencing of flattened child rows."""
    return _reseq(ef, df, order_cols)


def marble_children(marbles: list[str], interval: float = 1.0):
    """Child-generator builder for tests: parent value v selects
    ``marbles[v]`` (reference marble grammar: '_' stripped, '-'/' '
    skipped, '|' ends) as array<struct<dt, value>>."""
    arrays = []
    for s in marbles:
        s = s.replace("_", "")
        items = []
        for pos, ch in enumerate(s):
            if ch == "|":
                break
            if ch in "- ":
                continue
            items.append(
                F.struct(
                    F.lit(pos * interval).alias("dt"), F.lit(ch).alias("value")
                )
            )
        arrays.append(F.array(*items))
    lookup = F.array(*arrays)

    def gen(v):
        return F.element_at(lookup, v.cast("int") + 1)

    return gen
