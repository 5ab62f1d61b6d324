"""Multi-stream combinators: merge / chain / concat / switch / zip /
ziplatest / fork.

Reference semantics: eventkit/ops/combine.py (SURVEY.md §2.5). The
reference keys these on arrival order in a single-process loop; the engine
re-bases them on event time (``ts``) with (ts, source-index, seq) as the
deterministic tiebreak, which gives identical results on recorded streams.

Scale design: merge/chain are a union + one ordered window (shuffle on the
stream key only). concat/switch need each source's first/last emit time —
tiny per-source aggregates that are broadcast, so the big fact streams are
never shuffled twice. zip joins on per-source row index (one shuffle per
side, AQE picks the join strategy). Nothing here collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from .common import RN, TAG, value_col, worder


def _aligned_union(efs) -> tuple[DataFrame, list[str], str, str | None]:
    """Tag each source stream and union with a common payload column."""
    base = efs[0]
    key_cols = base.key_cols
    for ef in efs:
        if ef.key_cols != key_cols:
            raise ValueError("combined streams must share key columns")
    parts = []
    for i, ef in enumerate(efs):
        v = value_col(ef)
        cols = [F.lit(i).alias(TAG), F.col(ef.seq_col).alias("seq")]
        cols.append(
            F.col(ef.ts_col).alias("ts") if ef.ts_col else F.lit(None).cast("timestamp").alias("ts")
        )
        cols += [F.col(k) for k in ef.key_cols]
        cols.append(v.alias("value"))
        parts.append(ef.df.select(*cols))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out, list(key_cols), "seq", "ts"


def _finish(base_ef, df: DataFrame, order_cols, key_cols) -> "object":
    """Re-sequence the combined stream deterministically."""
    w = (
        W.partitionBy(*key_cols) if key_cols else W.partitionBy(F.lit(0))
    ).orderBy(*order_cols)
    df = df.withColumn("__ek_newseq", F.row_number().over(w) - 1)
    cols = [F.col("__ek_newseq").alias("seq"), F.col("ts")]
    cols += [F.col(k) for k in key_cols]
    cols.append(F.col("value"))
    return base_ef._with(
        df=df.select(*cols), value_cols=["value"], seq_col="seq", ts_col="ts",
        key_cols=list(key_cols),
    )


def merge(*efs):
    """Interleave all sources by event time (combine.py:97-102)."""
    df, keys, _, _ = _aligned_union(efs)
    return _finish(efs[0], df, [F.col("ts"), F.col(TAG), F.col("seq")], keys)


def chain(*efs):
    """Strict sequential: all of source 0, then source 1, ...
    (combine.py:177-216). Pure sort by (source index, seq) — nothing is
    dropped; the reference buffers later sources, we reorder."""
    df, keys, _, _ = _aligned_union(efs)
    return _finish(efs[0], df, [F.col(TAG), F.col("seq"), F.col("ts")], keys)


def concat(*efs):
    """Source i's rows pass until the first emit of any later-listed
    source, which disconnects all sources before it
    (combine.py:142-174 ``_on_source_s`` popleft loop; golden:
    tests/combine_test.py:26-31 — concat(e1, e2) drops e1's remaining
    rows the moment e2 starts. The event.py:1147-1160 docstring marble
    contradicts the code and the tests; the tests win).

    kill-time(i) = min first-emit key over sources j>i — per-source
    scalar aggregates, broadcast. A row at exactly the kill time is kept
    (the earlier-listed source's emit is delivered first in the
    reference's synchronous loop); the (ts, tag, seq) struct compare
    encodes that tie-break.
    """
    df, keys, _, _ = _aligned_union(efs)
    group = [TAG, *keys]
    firsts = df.groupBy(*group).agg(
        F.min(F.struct(F.col("ts"), F.col(TAG), F.col("seq"))).alias("__ek_first")
    )
    wlater = (
        W.partitionBy(*keys) if keys else W.partitionBy(F.lit(0))
    ).orderBy(TAG).rowsBetween(1, W.unboundedFollowing)
    # cut table is O(keys x sources): broadcast-hint only the unkeyed case
    # (a handful of rows); keyed streams let AQE decide at runtime so a
    # high-cardinality key can't blow the driver (round-1 ADVICE, low)
    cuts = firsts.withColumn("__ek_kill", F.min("__ek_first").over(wlater)).drop("__ek_first")
    joined = df.join(cuts if keys else F.broadcast(cuts), on=group, how="left")
    row_key = F.struct(F.col("ts"), F.col(TAG), F.col("seq"))
    kept = joined.filter(F.col("__ek_kill").isNull() | (row_key < F.col("__ek_kill")))
    return _finish(efs[0], kept.drop("__ek_kill"), [F.col("ts"), F.col(TAG), F.col("seq")], keys)


def switch(*efs):
    """Each source is live from its first emit until the first emit of the
    next source to start; a replaced source never re-activates
    (combine.py:105-139: the newly emitting source steals the stream and
    the previous active source is disconnected).

    Batch formulation: rank sources by first-emit time; source s's rows
    are kept on the half-open interval [first(s), first(next_started(s)))
    with (ts, source index, seq) lexicographic tie-break.
    """
    df, keys, _, _ = _aligned_union(efs)
    group = [TAG, *keys]
    firsts = df.groupBy(*group).agg(
        F.min(F.struct(F.col("ts"), F.col(TAG), F.col("seq"))).alias("__ek_first")
    )
    wnext = (
        W.partitionBy(*keys) if keys else W.partitionBy(F.lit(0))
    ).orderBy(F.col("__ek_first"))
    # same broadcast policy as concat: hint only when unkeyed
    cuts = firsts.withColumn("__ek_next", F.lead("__ek_first").over(wnext))
    joined = df.join(cuts if keys else F.broadcast(cuts), on=group, how="left")
    row_key = F.struct(F.col("ts"), F.col(TAG), F.col("seq"))
    kept = joined.filter(
        F.col("__ek_next").isNull() | (row_key < F.col("__ek_next"))
    )
    return _finish(
        efs[0], kept.drop("__ek_first", "__ek_next"),
        [F.col("ts"), F.col(TAG), F.col("seq")], keys,
    )


def zip_(*efs):
    """Positional zip: i-th output pairs the i-th value of every source;
    ends at the shortest source (combine.py:219-261) — an inner equi-join
    on per-source row index."""
    base = efs[0]
    keys = list(base.key_cols)
    out = None
    for i, ef in enumerate(efs):
        v = value_col(ef)
        rn = F.row_number().over(worder(ef)) - 1
        cols = [rn.alias(RN)]
        cols += [F.col(k) for k in ef.key_cols]
        cols.append(v.alias(f"v{i}"))
        if i == 0:
            cols.insert(1, F.col(ef.ts_col).alias("ts") if ef.ts_col else F.lit(None).cast("timestamp").alias("ts"))
        part = ef.df.select(*cols)
        out = part if out is None else out.join(part, on=[RN, *keys], how="inner")
    names = [f"v{i}" for i in range(len(efs))]
    cols = [F.col(RN).alias("seq"), F.col("ts"), *[F.col(k) for k in keys], *[F.col(n) for n in names]]
    return base._with(
        df=out.select(*cols), value_cols=names, seq_col="seq", ts_col="ts",
        key_cols=keys,
    )


def ziplatest(*efs, partial: bool = True):
    """On any source emit, emit the latest value of every source
    (combine.py:264-302). ``partial=False`` waits until all sources have
    emitted (reference fills NO_VALUE -> our NULL).

    Union + per-source running ``last(ignorenulls)`` over one ordered
    window: a single shuffle on the stream key.
    """
    base = efs[0]
    keys = list(base.key_cols)
    parts = []
    for i, ef in enumerate(efs):
        if list(ef.key_cols) != keys:
            raise ValueError("combined streams must share key columns")
        v = value_col(ef)
        cols = [F.lit(i).alias(TAG), F.col(ef.seq_col).alias("seq")]
        cols.append(
            F.col(ef.ts_col).alias("ts") if ef.ts_col else F.lit(None).cast("timestamp").alias("ts")
        )
        cols += [F.col(k) for k in ef.key_cols]
        # one column per source: payload types stay independent
        for j, other in enumerate(efs):
            if j == i:
                cols.append(v.alias(f"v{j}"))
            else:
                cols.append(
                    F.lit(None)
                    .cast(other.df.schema[other.value_cols[0]].dataType)
                    .alias(f"v{j}")
                )
        parts.append(ef.df.select(*cols))
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    w = (
        W.partitionBy(*keys) if keys else W.partitionBy(F.lit(0))
    ).orderBy(F.col("ts"), F.col(TAG), F.col("seq")).rowsBetween(W.unboundedPreceding, W.currentRow)
    names = []
    for i in range(len(efs)):
        df = df.withColumn(f"v{i}", F.last(F.col(f"v{i}"), ignorenulls=True).over(w))
        names.append(f"v{i}")
    if not partial:
        cond = F.lit(True)
        for n in names:
            cond = cond & F.col(n).isNotNull()
        df = df.filter(cond)
    wseq = (
        W.partitionBy(*keys) if keys else W.partitionBy(F.lit(0))
    ).orderBy(F.col("ts"), F.col(TAG), F.col("seq"))
    df = df.withColumn("__ek_newseq", F.row_number().over(wseq) - 1)
    cols = [F.col("__ek_newseq").alias("seq"), F.col("ts"), *[F.col(k) for k in keys], *[F.col(n) for n in names]]
    return efs[0]._with(
        df=df.select(*cols), value_cols=names, seq_col="seq", ts_col="ts",
        key_cols=list(keys),
    )


class AddableJoin:
    """Join builder whose source list can grow after construction — the
    engine analog of the reference's ``AddableJoinOp.add_source``
    (eventkit/ops/combine.py:54-94: Merge/Chain/Concat/Switch accept new
    sources while live, e.g. from an emap parent).

    Batch semantics: the combinator is a lazy plan, so "adding a source
    mid-stream" simply rebuilds the plan over the current source deque
    the next time ``frame()`` is read — the observable result over
    recorded streams is identical to the reference's live attachment
    (its joiners, too, order solely by emit time/arrival, not by WHEN
    the source was attached). Like the reference, the same source may be
    added multiple times. ``set_parent``/``parent_done`` bookkeeping has
    no batch analog (plans have no liveness); the emap family covers the
    higher-order construction path statically.
    """

    _JOINERS = {"merge": None, "chain": None, "concat": None, "switch": None}

    def __init__(self, joiner: str = "merge", *sources):
        if joiner not in self._JOINERS:
            raise ValueError(f"joiner must be one of {sorted(self._JOINERS)}")
        self._joiner = joiner
        self._sources = []
        for s in sources:
            self.add_source(s)

    def add_source(self, source) -> "AddableJoin":
        from ..frame import EventFrame

        self._sources.append(EventFrame.create(source))
        return self

    def frame(self):
        """The joined stream over the sources added so far."""
        if not self._sources:
            raise ValueError("AddableJoin has no sources")
        fn = {"merge": merge, "chain": chain, "concat": concat, "switch": switch}[
            self._joiner
        ]
        return fn(*self._sources)


class Fork(list):
    """Result of ``EventFrame.fork(*branch_fns)``: the N branch frames,
    awaiting a join discipline (combine.py:10-37 ``Fork``: the reference
    joins forked branches back through ANY combinator —
    ``ev[Min, Max].merge()`` etc., event.py:284-307).

    Each method routes the branches through the module's existing
    combinator, so a fork join costs exactly what that combinator costs
    on N independent streams; no extra machinery. ``join`` accepts any
    callable taking ``*frames`` for custom disciplines (the reference's
    ``Fork.join(joiner)``)."""

    def join(self, joiner):
        return joiner(*self)

    def merge(self):
        return merge(*self)

    def chain(self):
        return chain(*self)

    def concat(self):
        return concat(*self)

    def switch(self):
        return switch(*self)

    def zip(self):
        return zip_(*self)

    def ziplatest(self, partial: bool = True):
        return ziplatest(*self, partial=partial)


def fork(ef, *branch_fns):
    """``ef.fork(fn, fn, ...)`` — run N operator branches off one source;
    join them back with any ``Fork`` method (event.py:284-307).

    All branches derive from the same scan, so Catalyst plans the source
    once per branch but AQE/exchange reuse collapses identical subtrees;
    branches that are pure window aggregates should prefer
    ``running_multi`` (single shuffle) when zipping."""
    return Fork(fn(ef) for fn in branch_fns)


def fork_zip(ef, *branch_fns):
    """``fork(a, b, c).zip()`` (combine.py:10-37 + event.py:284-307): run N
    operator branches off one source and zip them positionally by seq.

    Length-preserving branches (the reference's tested use: running
    aggregates side by side, tests/event_test.py:148-152) join back on
    (keys, seq). Since every branch derives from the same scan, Catalyst
    collapses identical window specs, and for the common case of pure
    window-agg branches callers should prefer a single ``map_cols`` select
    — this general form pays one join per branch.
    """
    branches = [fn(ef) for fn in branch_fns]
    names = []
    out = ef.df.select(
        F.col(ef.seq_col),
        *([F.col(ef.ts_col)] if ef.ts_col else []),
        *[F.col(k) for k in ef.key_cols],
    )
    for i, bef in enumerate(branches):
        if len(bef.value_cols) != 1:
            raise ValueError("fork_zip branches must be unary")
        names.append(f"v{i}")
        side = bef.df.select(
            F.col(bef.seq_col).alias("__ek_bseq"),
            *[F.col(k).alias(f"__ek_bk{j}") for j, k in enumerate(bef.key_cols)],
            F.col(bef.value_cols[0]).alias(f"v{i}"),
        )
        cond = [F.col(ef.seq_col) == F.col("__ek_bseq")] + [
            F.col(k) == F.col(f"__ek_bk{j}") for j, k in enumerate(ef.key_cols)
        ]
        out = out.join(side, on=cond, how="inner").drop(
            "__ek_bseq", *[f"__ek_bk{j}" for j in range(len(ef.key_cols))]
        )
    return ef._with(df=out, value_cols=names)
