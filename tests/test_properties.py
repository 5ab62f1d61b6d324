"""Property-based tests: EventFrame operators vs pure-Python semantic
models on random streams (the reference has no property tests —
SURVEY.md §5; these harden the engine beyond the golden lists)."""

import itertools

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

streams = st.lists(st.integers(min_value=-50, max_value=50), min_size=0, max_size=25)
SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _seq(spark, xs):
    from eventkit_spark.sources.create import sequence

    return sequence(spark, xs, interval=0.01)


@given(xs=streams, n=st.integers(0, 30))
@SET
def test_skip_take_model(spark, xs, n):
    assert _seq(spark, xs).skip(n).to_list() == xs[n:]
    assert _seq(spark, xs).take(n).to_list() == xs[:n]


@given(xs=streams, pivot=st.integers(-50, 50))
@SET
def test_takewhile_dropwhile_model(spark, xs, pivot):
    got_tw = _seq(spark, xs).takewhile(lambda v: v < pivot).to_list()
    assert got_tw == list(itertools.takewhile(lambda x: x < pivot, xs))
    got_dw = _seq(spark, xs).dropwhile(lambda v: v < pivot).to_list()
    assert got_dw == list(itertools.dropwhile(lambda x: x < pivot, xs))


@given(xs=streams)
@SET
def test_changes_unique_model(spark, xs):
    exp_changes = [x for i, x in enumerate(xs) if i == 0 or x != xs[i - 1]]
    assert _seq(spark, xs).changes().to_list() == exp_changes
    exp_unique = list(dict.fromkeys(xs))
    assert _seq(spark, xs).unique().to_list() == exp_unique


@given(xs=streams)
@SET
def test_running_aggs_model(spark, xs):
    if not xs:
        return
    ef = _seq(spark, xs).running_multi("min", "max", "sum")
    rows = ef.to_list()
    accs_min = list(itertools.accumulate(xs, min))
    accs_max = list(itertools.accumulate(xs, max))
    accs_sum = list(itertools.accumulate(xs))
    assert rows == list(zip(accs_min, accs_max, accs_sum))


@given(xs=streams, size=st.integers(1, 7))
@SET
def test_chunk_model(spark, xs, size):
    exp = [list(xs[i : i + size]) for i in range(0, len(xs), size)]
    assert _seq(spark, xs).chunk(size).to_list() == exp


@given(xs=streams, n=st.integers(1, 6))
@SET
def test_deque_model(spark, xs, n):
    exp = [list(xs[max(0, i - n + 1) : i + 1]) for i in range(len(xs))]
    assert _seq(spark, xs).deque(n).to_list() == exp


@given(a=streams, b=streams)
@SET
def test_zip_chain_model(spark, a, b):
    ea, eb = _seq(spark, a), _seq(spark, b)
    assert ea.zip(eb).to_list() == list(zip(a, b))
    assert ea.chain(eb).to_list() == a + b


@given(xs=st.lists(st.floats(min_value=-100, max_value=100, allow_nan=False), min_size=1, max_size=20), n=st.integers(1, 10))
@SET
def test_ema_recurrence_model(spark, xs, n):
    w = 2.0 / (n + 1)
    exp = [xs[0]]
    for x in xs[1:]:
        exp.append((1 - w) * exp[-1] + w * x)
    got = _seq(spark, xs).ema(n=n).to_list()
    assert got == pytest.approx(exp, rel=1e-9, abs=1e-9)


@given(
    vals=st.lists(
        st.one_of(st.none(), st.floats(-100, 100, allow_nan=False)),
        min_size=1, max_size=25,
    ),
    L=st.integers(2, 5),
    n=st.integers(2, 10),
)
@SET
def test_ema_segmented_handoff_model(spark, vals, L, n):
    """_ema_staged's segment hand-off algebra vs a pure-Python replay
    of the SAME truncated segmented scan (the seg_len override makes
    boundaries reachable at fuzz sizes; the truncation — carries older
    than one segment dropped — is shared by both sides, numerically
    exact only at the production L). Catches coalesce / hand-off /
    NULL-mask defects: the r11 stale-boundary bug fails this within a
    few examples."""
    from pyspark.sql import functions as F

    from eventkit_spark.frame import EventFrame
    from eventkit_spark.operators.aggregate import _ema_staged

    w = 2.0 / (n + 1)
    q = 1.0 - w
    rows = [(0, i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k long, seq long, value double")
    ef = EventFrame(
        df, value_cols=["value"], seq_col="seq", ts_col=None,
        key_cols=["k"],
    )
    sdf, col = _ema_staged(ef, w, q, seg_len=L)
    got = [
        r["e"]
        for r in sdf.select("seq", col.alias("e")).orderBy("seq").collect()
    ]

    exp = []
    prev_boundary = 0.0  # mark of the last COMPLETED earlier segment
    cur_boundary = 0.0
    ssum, has, nval = 0.0, False, 0
    for i, v in enumerate(vals):
        j = i % L
        if j == 0 and i > 0:
            prev_boundary = cur_boundary
        if j == 0:
            ssum, has = 0.0, False
        if v is not None:
            c = 1.0 if i == 0 else w
            ssum += c * v * q ** (-j)
            has = True
            nval += 1
        locv = (q ** j) * ssum if has else None
        if j == L - 1:
            cur_boundary = locv if locv is not None else 0.0
        if nval == 0:
            exp.append(None)
        else:
            exp.append(
                (locv if locv is not None else 0.0)
                + prev_boundary * q ** (j + 1)
            )
    assert len(got) == len(exp)
    for g, e in zip(got, exp):
        if e is None:
            assert g is None
        else:
            assert g == pytest.approx(e, rel=1e-9, abs=1e-9)


@given(
    vals=st.lists(
        st.one_of(st.none(), st.floats(-100, 100, allow_nan=False)),
        min_size=2, max_size=40,
    ),
    parts=st.integers(2, 5),
    n=st.integers(2, 10),
)
@SET
def test_ema_scaled_bucket_fold_model(spark, vals, parts, n):
    """ema_scaled's cross-bucket carry fold vs the sequential
    SUM-algebra model on NULL-bearing streams: NULL-led buckets,
    all-NULL buckets (a NULL tail used to crash the driver fold), and
    NULL prefixes after a carry must all match the pinned missing-
    value semantics. At fuzz sizes every bucket is one segment, so
    the sequential model is exact up to carry re-association."""
    from eventkit_spark.frame import EventFrame

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "seq long, value double")
    ef = EventFrame(
        df, value_cols=["value"], seq_col="seq", ts_col=None, key_cols=[]
    )
    got = [
        r["value"]
        for r in ef.ema(n=n, scaled=True, partitions=parts).df
        .orderBy("seq").collect()
    ]
    from conftest import seq_ema_model

    exp = seq_ema_model(vals, n=n)
    assert len(got) == len(exp)
    for g, e in zip(got, exp):
        if e is None:
            assert g is None
        else:
            assert g == pytest.approx(e, rel=1e-9, abs=1e-9)


@given(a=streams, b=streams, off=st.floats(0.001, 0.009))
@SET
def test_merge_concat_switch_models(spark, a, b, off):
    """Python simulators of the reference disciplines over two streams:
    stream A at t=i*10ms, stream B at t=off+i*10ms (off < 10ms)."""
    ta = [i * 0.01 for i in range(len(a))]
    tb = [off + i * 0.01 for i in range(len(b))]
    ea, eb = _seq(spark, a), _seq(spark, b)
    from eventkit_spark.sources.create import sequence

    eb = sequence(spark, b, times=tb)
    # merge: interleave by time (A wins ties: earlier-listed tag)
    tagged = [(t, 0, v) for t, v in zip(ta, a)] + [(t, 1, v) for t, v in zip(tb, b)]
    exp_merge = [v for _, _, v in sorted(tagged)]
    assert ea.merge(eb).to_list() == exp_merge
    # concat: B's first emit kills A (code semantics)
    if b:
        exp_concat = [v for t, v in zip(ta, a) if t <= tb[0]] + b
    else:
        exp_concat = a
    assert ea.concat(eb).to_list() == exp_concat
    # switch: A live until B's first emit, then B forever
    if b and a:
        exp_switch = [v for t, v in zip(ta, a) if t < tb[0]] + b
    elif a:
        exp_switch = a
    else:
        exp_switch = b
    assert ea.switch(eb).to_list() == exp_switch


@given(xs=streams)
@SET
def test_ziplatest_model(spark, xs):
    if not xs:
        return
    got = _seq(spark, xs).ziplatest(_seq(spark, xs).map(lambda v: v * 2)).to_list()
    # both streams share the ts grid; at equal ts the first-listed source
    # sorts first, so its row sees the second source's OLD value
    exp = []
    for i, x in enumerate(xs):
        prev_b = 2 * xs[i - 1] if i > 0 else None
        exp.append((x, prev_b))
        exp.append((x, 2 * x))
    assert got == exp


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 14), st.integers(0, 14)).filter(lambda e: e[0] != e[1]),
        min_size=0,
        max_size=20,
    )
)
@SET
def test_dedup_clusters_union_find_model(spark, edges):
    """Connected-component labels must match a pure-Python union-find on
    the same random pair graph (min id labels each component)."""
    from eventkit_spark.llm.dedup import dedup_clusters

    n = 15
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {i: find(i) for i in range(n)}

    docs = spark.createDataFrame([(i, "d") for i in range(n)], "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges] or [(0, 0)],
        "id_a long, id_b long",
    )
    if not edges:
        pairs = pairs.filter("id_a <> id_b")
    got = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(docs, pairs).collect()}
    assert got == expected


@given(
    left=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 50)), min_size=1, max_size=15),
    right=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 50)), min_size=0, max_size=15),
)
@SET
def test_asof_join_model(spark, left, right):
    """asof_join vs a pure-Python latest-right<=ts model per key.
    Right rows get distinct ts per key so the tie-break is determined."""
    from datetime import datetime

    from eventkit_spark.operators.relational import asof_join

    right = list({(k, t) for k, t in right})  # unique (key, ts) on the right
    T = lambda s: datetime(2024, 1, 1, 0, 0, 0, s)
    ldf = spark.createDataFrame(
        [(i, f"k{k}", T(t), float(i)) for i, (k, t) in enumerate(left)],
        "id long, k string, ts timestamp, value double",
    )
    rdf = spark.createDataFrame(
        [(f"k{k}", T(t), float(t)) for k, t in right] or [("zz", T(0), 0.0)],
        "k string, ts timestamp, q double",
    )
    if not right:
        rdf = rdf.filter("k <> 'zz'")
    got = {r["id"]: r["q"] for r in asof_join(ldf, rdf, "ts", by="k", right_cols=["q"]).collect()}
    exp = {}
    for i, (k, t) in enumerate(left):
        cands = [rt for rk, rt in right if rk == k and rt <= t]
        exp[i] = float(max(cands)) if cands else None
    assert got == exp


@given(
    toks=st.lists(st.integers(1, 40), min_size=1, max_size=30),
    budget=st.integers(5, 60),
)
@SET
def test_pack_sequences_model(spark, toks, budget):
    """pack_sequences vs a pure-Python streaming-fill model (single
    shard so the shard hash doesn't partition the stream)."""
    from eventkit_spark.llm.sampling import pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in enumerate(toks)],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["pack_no"], r["offset"]) for r in
           pack_sequences(docs, budget=budget, n_shards=1).collect()}
    cum = 0
    for i, n in enumerate(toks):
        assert got[i] == (cum // budget, cum)
        cum += n


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "dd", "ee"]), min_size=1, max_size=5),
        min_size=1,
        max_size=6,
    )
)
@SET
def test_line_dedup_model(spark, docs):
    """vs a pure-Python keep-first model: survivors == distinct lines,
    each at its first (doc, pos); per-doc order preserved."""
    from eventkit_spark.llm.text import line_dedup

    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in line_dedup(df).collect()}

    seen, model = set(), {}
    for i, lines in enumerate(docs):
        kept = []
        for ln in lines:
            if ln not in seen:
                seen.add(ln)
                kept.append(ln)
        model[i] = (len(lines), len(kept), "\n".join(kept))
    for i in model:
        assert (got[i]["n_lines"], got[i]["n_kept"], got[i]["text"]) == model[i]


@given(
    parts=st.lists(
        st.sampled_from(
            ["plain words", "x@y.io", "1.2.3.4", "+44 20 7946 0958", "no pii here 9"]
        ),
        min_size=1,
        max_size=5,
    )
)
@SET
def test_redact_pii_properties(spark, parts):
    """After redaction no pattern matches the output (idempotence), and
    each count equals the number of inserted typed tokens."""
    import re

    from eventkit_spark.llm.text import PII_PATTERNS, redact_pii

    text = " | ".join(parts)
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    r = redact_pii(df).collect()[0]
    for name, pat in PII_PATTERNS.items():
        assert not re.search(pat, r["text"]), (name, r["text"])
        assert r[f"n_{name}"] == r["text"].count(f"<{name.upper()}>")
    # idempotence: redacting the redacted text changes nothing
    df2 = spark.createDataFrame([(0, r["text"])], "doc_id long, text string")
    r2 = redact_pii(df2).collect()[0]
    assert r2["text"] == r["text"]


asof_ts = st.lists(st.integers(min_value=0, max_value=60), min_size=0, max_size=30)


@given(lts=asof_ts, rts=asof_ts, tol=st.one_of(st.none(), st.integers(1, 20)))
@SET
def test_asof_join_unkeyed_model(spark, lts, rts, tol):
    """Unkeyed as-of (the r4 deterministic-boundary path) vs a pure
    model: for each left ts, the latest right ts <= it (<= convention,
    duplicate timestamps allowed), NULL when none, tolerance expiring
    stale matches in column units. Small `partitions` forces real
    cross-bucket carry-ins on these sizes."""
    from eventkit_spark.operators.relational import asof_join

    left = spark.createDataFrame(
        [(i, t) for i, t in enumerate(lts)], "id long, ts long"
    )
    right = spark.createDataFrame(
        [(t, t * 10.0) for t in rts], "ts long, q double"
    )
    out = asof_join(left, right, "ts", right_cols=["q"], tolerance=tol, partitions=3)
    got = {r["id"]: r["q"] for r in out.collect()}
    assert len(got) == len(lts)
    for i, t in enumerate(lts):
        prior = [rt for rt in rts if rt <= t]
        if tol is not None:
            prior = [rt for rt in prior if t - rt <= tol]
        exp = max(prior) * 10.0 if prior else None
        assert got[i] == exp, (i, t, got[i], exp)


@given(lts=asof_ts, rts=asof_ts)
@SET
def test_asof_join_keyed_model(spark, lts, rts):
    """Keyed as-of: same model per key; keys never cross."""
    from eventkit_spark.operators.relational import asof_join

    left = spark.createDataFrame(
        [(i, "k" if t % 2 else "j", t) for i, t in enumerate(lts)],
        "id long, k string, ts long",
    )
    right = spark.createDataFrame(
        [("k" if t % 3 else "j", t, t * 10.0) for t in rts],
        "k string, ts long, q double",
    )
    out = asof_join(left, right, "ts", by="k", right_cols=["q"])
    got = {r["id"]: r["q"] for r in out.collect()}
    for i, t in enumerate(lts):
        key = "k" if t % 2 else "j"
        prior = [rt for rt in rts if ("k" if rt % 3 else "j") == key and rt <= t]
        exp = max(prior) * 10.0 if prior else None
        assert got[i] == exp, (i, t, key, got[i], exp)


@given(
    xs=st.lists(st.integers(-30, 30), min_size=1, max_size=20),
    target=st.integers(-10, 10),
    h=st.integers(5, 40),
    slack=st.integers(0, 5),
)
@SET
def test_cusum_model(spark, xs, target, h, slack):
    """CUSUM kernel vs the recurrence replayed in pure Python
    (reset-on-alarm convention, emitted values pre-reset)."""
    hi = lo = 0.0
    exp = []
    for x in xs:
        nh = max(0.0, hi + (x - target) - slack)
        nl = max(0.0, lo - (x - target) - slack)
        a = nh > h or nl > h
        exp.append((round(nh, 6), round(nl, 6), a))
        hi, lo = (0.0, 0.0) if a else (nh, nl)
    ef = _seq(spark, xs).cusum(float(target), h=float(h), slack=float(slack))
    rows = ef.df.orderBy("seq").collect()
    got = [(r["cusum_hi"], r["cusum_lo"], r["alarm"]) for r in rows]
    assert got == exp


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=1, max_size=8).map(
            lambda ws: " ".join(ws)
        ),
        min_size=1, max_size=6,
    )
)
@SET
def test_novelty_model(spark, docs):
    """ngram_novelty (k=1: unigram shingles) vs a pure first-seen-set
    model over doc ids in order."""
    from eventkit_spark.llm.dedup import ngram_novelty

    seen = set()
    exp = {}
    for i, d in enumerate(docs):
        toks = set(d.split())
        fresh = toks - seen
        exp[i] = (len(toks), round(len(fresh) / len(toks), 6))
        seen |= toks
    sdf = spark.createDataFrame(list(enumerate(docs)), ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_shingles"], r["novelty"])
        for r in ngram_novelty(sdf, k=1).collect()
    }
    assert got == exp


@given(
    gaps=st.lists(st.floats(0.0, 3.0, allow_nan=False), min_size=1, max_size=25),
    m=st.integers(1, 4),
    iv=st.floats(0.5, 5.0, allow_nan=False),
)
@SET
def test_throttle_unit_cost_closed_form(spark, gaps, m, iv):
    """The recursive-CTE oracle rests on the closed form
    emit_i = max(ts_i, emit_{i-1}, emit_{i-m} + interval) for unit
    costs; prove it against the deque kernel on adversarial bursts
    (zero gaps, duplicate times, varying budget/interval)."""
    import datetime as dt

    from eventkit_spark.sources.tables import from_dataframe

    t0 = dt.datetime(2024, 1, 1)
    times, acc = [], 0.0
    for g in gaps:
        acc += g
        times.append(acc)
    rows = [
        (i, t0 + dt.timedelta(seconds=s), 1, float(i)) for i, s in enumerate(times)
    ]
    df = spark.createDataFrame(rows, ["seq", "ts", "k", "value"])
    ef = from_dataframe(df, value_cols=["value"], seq_col="seq", ts_col="ts", key_cols=["k"])
    out = ef.throttle(maximum=m, interval=iv)
    got = [
        (r["ts"] - t0).total_seconds()
        for r in out.df.orderBy("seq").collect()
    ]
    emits = []
    for i, t in enumerate(times):
        e = t
        if emits:
            e = max(e, emits[-1])
        if len(emits) >= m:
            e = max(e, emits[-m] + iv)
        emits.append(e)
    # the kernel stores each emit as a whole-microsecond TIMESTAMP
    # (state.py ~178), so a chain of i dependent emits accumulates up
    # to ~0.5us of rounding per step; the float model doesn't. Scale
    # the tolerance with chain depth (hypothesis found an 18-deep
    # zero-gap chain at 2.1us against the old flat 2us bound).
    for i, (g, e) in enumerate(zip(got, emits)):
        assert abs(g - e) < 2e-6 + 6e-7 * i, (i, got, emits)


@given(
    gaps=st.lists(st.integers(1, 2000), min_size=2, max_size=18),
    vals=st.lists(st.integers(-20, 20), min_size=18, max_size=18),
    win=st.integers(100, 3000),
)
@SET
def test_anomaly_model(spark, gaps, vals, win):
    """anomaly() vs a pure-Python trailing-window z-score model
    (inclusive [t-win, t] bounds, population std, round-6 cut)."""
    import datetime as dt
    import math

    from eventkit_spark.sources.tables import from_dataframe

    t0 = dt.datetime(2024, 1, 1)
    times, acc = [], 0
    for g in gaps:
        acc += g
        times.append(acc)
    vals = vals[: len(times)]
    rows = [(i, t0 + dt.timedelta(seconds=s), 1, float(v))
            for i, (s, v) in enumerate(zip(times, vals))]
    df = spark.createDataFrame(rows, ["seq", "ts", "k", "value"])
    ef = from_dataframe(df, value_cols=["value"], seq_col="seq", ts_col="ts", key_cols=["k"])
    got = {r["seq"]: (r["roll_n"], r["zscore"], r["is_anomaly"])
           for r in ef.anomaly(float(win), z=1.5).df.collect()}
    for i, (t, x) in enumerate(zip(times, vals)):
        wnd = [v for s, v in zip(times, vals) if t - win <= s <= t]
        n = len(wnd)
        mean = sum(wnd) / n
        sd = math.sqrt(sum((v - mean) ** 2 for v in wnd) / n)
        if n >= 2 and sd > 0:
            z = round((x - mean) / sd, 6)
            exp = (n, z, abs(z) >= 1.5)
        else:
            exp = (n, None, False)
        gn, gz, ga = got[i]
        assert gn == exp[0] and ga == exp[2]
        if exp[1] is None:
            assert gz is None
        else:
            assert abs(gz - exp[1]) <= 2e-6


@given(
    xs=st.lists(st.integers(0, 30), min_size=1, max_size=300),
    k=st.integers(2, 12),
    cuts=st.lists(st.integers(0, 300), max_size=3),
)
@SET
def test_misra_gries_kernel_superset_property(xs, k, cuts):
    """Kernel-level MG invariants on arbitrary streams and arbitrary
    Arrow batch splits: (1) every item with count > n/k survives,
    (2) never more than k-1 counters, (3) batch boundaries don't change
    the guarantee (the kernel carries state across batches)."""
    from collections import Counter

    import pandas as pd

    from eventkit_spark.llm.sketch import _mg_kernel

    vals = [f"v{x}" for x in xs]
    bounds = sorted({min(c, len(vals)) for c in cuts} | {0, len(vals)})
    batches = [
        pd.DataFrame({"item": vals[a:b]})
        for a, b in zip(bounds, bounds[1:])
        if b > a
    ] or [pd.DataFrame({"item": vals})]
    out = list(_mg_kernel(k, "item")(iter(batches)))[0]
    survivors = set(out["item"])
    assert len(survivors) <= k - 1
    n = len(vals)
    for item, cnt in Counter(vals).items():
        if cnt * k > n:
            assert item in survivors


@given(
    evs=st.lists(
        st.tuples(
            st.integers(0, 2),            # user
            st.integers(0, 59),           # second offset
            st.sampled_from(["t", "c"]),  # touch / conversion
        ),
        min_size=0,
        max_size=30,
    ),
    lookback=st.integers(1, 40),
)
@SET
def test_attribution_model(spark, evs, lookback):
    """Last-touch attribution vs a pure-Python replay: for each
    conversion, the max-(ts, id) touch with ts <= conv ts within the
    lookback window, per user."""
    from datetime import datetime

    from eventkit_spark.operators.relational import attribution

    rows = [
        (i, u, datetime(2024, 1, 1, 0, 0, s), kind)
        for i, (u, s, kind) in enumerate(evs)
    ]
    if not rows:
        return
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "k"])
    got = {
        r["conv_id"]: r["touch_id"]
        for r in attribution(
            df, "k = 't'", "k = 'c'", lookback=float(lookback)
        ).collect()
    }
    want = {}
    for i, (u, s, kind) in enumerate(evs):
        if kind != "c":
            continue
        cands = [
            (s2, j)
            for j, (u2, s2, k2) in enumerate(evs)
            if k2 == "t" and u2 == u and s2 <= s and s - s2 <= lookback
        ]
        want[i] = max(cands)[1] if cands else None
    assert got == want


@given(
    toks=st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=20),
    phrase=st.lists(st.sampled_from(["a", "b"]), min_size=1, max_size=3),
)
@SET
def test_phrase_search_model(spark, toks, phrase):
    """phrase_search vs naive sliding-window comparison on random
    token streams (repeats and overlaps included)."""
    from eventkit_spark.llm.text import phrase_search

    text = " ".join(toks) if toks else ""
    docs = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    got = {r["doc_id"]: r["n_matches"] for r in phrase_search(docs, " ".join(phrase)).collect()}
    n = len(phrase)
    want = sum(1 for i in range(len(toks) - n + 1) if toks[i : i + n] == phrase)
    assert got.get(1, 0) == want


@given(
    a=st.text(alphabet="abcdef ", min_size=0, max_size=60),
    b=st.text(alphabet="abcdef ", min_size=0, max_size=60),
    shared=st.text(alphabet="xyz", min_size=10, max_size=16),
)
@SET
def test_winnow_guarantee_property(spark, a, b, shared):
    """The winnowing guarantee (Schleimer et al. 2003): two documents
    sharing a substring of length >= w+k-1 (k=5, w=4 -> 8; `shared` is
    >= 10 over a disjoint alphabet) must share at least one fingerprint
    regardless of surrounding text."""
    from eventkit_spark.llm.text import winnow_fingerprints

    docs = spark.createDataFrame(
        [(0, a + shared + b), (1, b + shared + a)], ["doc_id", "text"]
    )
    rows = winnow_fingerprints(docs, k=5, w=4).collect()
    f0 = {r["fp"] for r in rows if r["doc_id"] == 0}
    f1 = {r["fp"] for r in rows if r["doc_id"] == 1}
    assert f0 & f1, (a, b, shared)


@given(
    xs=st.lists(st.integers(-9, 9), min_size=1, max_size=60),
    nparts=st.integers(2, 6),
    cut=st.integers(-9, 9),
)
@settings(SET, max_examples=4)  # 12 collects per example (r12); fixed-corpus twin: test_selection_scaled_matches_sequential
def test_scaled_selection_property(spark, xs, nparts, cut):
    """Random streams x random bucket counts: every scaled selection op
    equals its sequential window form — bucket boundaries must never
    leak into values."""
    from eventkit_spark.sources.create import sequence

    ef = sequence(spark, xs, interval=0.001)
    for op, kwargs in [
        ("takewhile", dict(predicate=f"value > {cut}")),
        ("dropwhile", dict(predicate=f"value > {cut}")),
        ("skip", dict(count=max(1, len(xs) // 3))),
        ("changes", dict()),
        ("chunk", dict(size=5)),
        ("unique", dict()),
    ]:
        seq_out = getattr(ef, op)(**kwargs).to_list()
        got = getattr(ef, op)(**kwargs, scaled=True, partitions=nparts).to_list()
        assert got == seq_out, (op, xs, nparts)


VOCAB = ["alpha", "beta", "gamma", "delta", "x"]
docs_strat = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=0, max_size=12),
    min_size=1, max_size=6,
)


@given(
    docs=docs_strat,
    terms=st.lists(st.sampled_from(VOCAB), min_size=1, max_size=2, unique=True),
    phrase=st.tuples(st.sampled_from(VOCAB), st.sampled_from(VOCAB)),
)
@settings(
    max_examples=4,  # two broadcast dims + anchor agg per example — pricey
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_blocklist_verdicts_model(spark, docs, terms, phrase):
    """blocklist_verdicts == the obvious pure-Python count of term
    occurrences + (overlapping) phrase occurrences, flagged docs only."""
    from eventkit_spark.llm.text import blocklist_verdicts

    phrases = [" ".join(phrase)]
    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["term_hits"], r["phrase_hits"])
        for r in blocklist_verdicts(df, terms, phrases).collect()
    }
    exp = {}
    pw = list(phrase)
    for i, words in enumerate(docs):
        th = sum(words.count(t) for t in terms)
        ph = sum(
            1
            for j in range(len(words) - 1)
            if words[j : j + 2] == pw
        )
        if th or ph:
            exp[i] = (th, ph)
    assert got == exp


@given(
    docs=st.lists(
        st.text(
            alphabet="ab1 .é",  # letters + digit + punct + non-ASCII
            min_size=0,
            max_size=24,
        ),
        min_size=1,
        max_size=6,
    ),
    vocab_size=st.integers(1, 12),
)
@settings(
    max_examples=3,  # vocab agg + packed-map DP per example — pricey (r12: halved, VERDICT item 2)
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_unigram_encode_model(spark, docs, vocab_size):
    """unigram_vocab + unigram_encode == the pure-Python integer
    Viterbi on arbitrary text (mixed letter/digit/punct/non-ASCII
    pretokens exercise the substring grid and the regex family)."""
    import re

    from eventkit_spark.llm.unigram import (
        COST_BASE,
        SCORE_CLAMP,
        unigram_encode,
    )

    rx = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
    INF = 1 << 62

    freq = {}
    for t in docs:
        for w in rx.findall(t):
            freq[w] = freq.get(w, 0) + 1
    raw, chars = {}, {}
    for w, f in freq.items():
        for l in range(2, 5):
            for s in range(len(w) - l + 1):
                p = w[s : s + l]
                raw[p] = raw.get(p, 0) + f
        for c in w:
            chars[c] = chars.get(c, 0) + f
    top = sorted(raw.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    vocab = {p: min(r, SCORE_CLAMP) for p, r in top}
    vocab.update({c: min(r, SCORE_CLAMP) for c, r in chars.items()})
    L = max((len(p) for p in vocab), default=1)

    def cost(word):
        dp = [0] + [INF] * len(word)
        for i in range(1, len(word) + 1):
            best = INF
            for l in range(1, min(L, i) + 1):
                sc = vocab.get(word[i - l : i])
                if sc is None and l == 1:
                    sc = 0
                if sc is None:
                    continue
                best = min(best, dp[i - l] + COST_BASE - sc)
            dp[i] = best
        return dp[len(word)]

    exp = {}
    for i, t in enumerate(docs):
        p = s = 0
        for w in rx.findall(t):
            d = cost(w)
            pieces = (d + COST_BASE - 1) // COST_BASE
            p += pieces
            s += pieces * COST_BASE - d
        exp[i] = (p, s)

    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["score_sum"])
        for r in unigram_encode(df, vocab_size=vocab_size).collect()
    }
    assert got == exp

    # the inference walk must tile the pretokens exactly and agree
    # with the DP count on the same random corpus
    from eventkit_spark.llm.unigram import unigram_tokenize

    toks = {
        r["doc_id"]: list(r["tokens"])
        for r in unigram_tokenize(df, vocab_size=vocab_size).collect()
    }
    for i, t in enumerate(docs):
        assert "".join(toks[i]) == "".join(rx.findall(t))
        assert len(toks[i]) == exp[i][0]


# ---- combinator disciplines under RANDOM multi-stream timings ----
# (r8 VERDICT item 7: the golden tests pin reference marbles on fixed
# grids; these sweep arbitrary interleavings, cross-stream ties, empty
# sources, and 3-source rank orders against pure-Python simulators of
# the (ts, source index, seq) lexicographic discipline.)

timed_src = st.lists(
    st.tuples(st.integers(-50, 50), st.integers(1, 4)),
    min_size=0,
    max_size=8,
)
offsets = st.integers(0, 3)


def _ticks(src, off):
    """(value, gap) pairs -> (value, tick-time, seq) with strictly
    increasing per-source times; `off` shifts the whole source so
    cross-source ties are common."""
    t, out = off, []
    for seq, (v, gap) in enumerate(src):
        out.append((v, t, seq))
        t += gap
    return out


def _timed_seq(spark, evs):
    from eventkit_spark.sources.create import sequence

    return sequence(
        spark, [v for v, _, _ in evs], times=[t * 0.01 for _, t, _ in evs]
    )


def _sim_events(srcs):
    """All events as (t, tag, seq, value), the engine's order key."""
    return sorted(
        (t, tag, seq, v)
        for tag, evs in enumerate(srcs)
        for (v, t, seq) in evs
    )


def _sim_concat(srcs):
    firsts = {
        tag: (evs[0][1], tag, evs[0][2])
        for tag, evs in enumerate(srcs)
        if evs
    }
    out = []
    for t, tag, seq, v in _sim_events(srcs):
        kills = [firsts[j] for j in firsts if j > tag]
        if not kills or (t, tag, seq) < min(kills):
            out.append(v)
    return out


def _sim_switch(srcs):
    firsts = sorted(
        ((evs[0][1], tag, evs[0][2]), tag)
        for tag, evs in enumerate(srcs)
        if evs
    )
    nxt = {
        tag: firsts[i + 1][0] if i + 1 < len(firsts) else None
        for i, (_, tag) in enumerate(firsts)
    }
    out = []
    for t, tag, seq, v in _sim_events(srcs):
        if nxt.get(tag, None) is None or (t, tag, seq) < nxt[tag]:
            out.append(v)
    return out


def _sim_ziplatest(srcs):
    last = [None] * len(srcs)
    out = []
    for t, tag, seq, v in _sim_events(srcs):
        last[tag] = v
        out.append(tuple(last))
    return out


@given(a=timed_src, b=timed_src, c=timed_src, oa=offsets, ob=offsets, oc=offsets)
@settings(SET, max_examples=4)  # 3 sources x 3 ops per example -- priciest property test (r12)
def test_concat_switch_random_timings(spark, a, b, c, oa, ob, oc):
    srcs = [_ticks(a, oa), _ticks(b, ob), _ticks(c, oc)]
    ea, eb, ec = (_timed_seq(spark, evs) for evs in srcs)
    assert ea.concat(eb, ec).to_list() == _sim_concat(srcs)
    assert ea.switch(eb, ec).to_list() == _sim_switch(srcs)
    # merge: pure (ts, tag, seq) interleave
    assert ea.merge(eb, ec).to_list() == [v for _, _, _, v in _sim_events(srcs)]


@given(a=timed_src, b=timed_src, oa=offsets, ob=offsets)
@SET
def test_zip_ziplatest_random_timings(spark, a, b, oa, ob):
    srcs = [_ticks(a, oa), _ticks(b, ob)]
    ea, eb = (_timed_seq(spark, evs) for evs in srcs)
    # zip is positional: timing must be IRRELEVANT
    assert ea.zip(eb).to_list() == list(
        zip([v for v, _, _ in srcs[0]], [v for v, _, _ in srcs[1]])
    )
    got = ea.ziplatest(eb).to_list()
    exp = _sim_ziplatest(srcs)
    # single-column frames yield bare values; 2-source ziplatest yields
    # 2-tuples, so compare directly
    assert got == exp


@given(
    ref=st.lists(
        st.lists(st.sampled_from("ab cd ef gh".split()), min_size=0, max_size=8),
        min_size=1, max_size=6,
    ),
    docs=st.lists(
        st.lists(st.sampled_from("ab cd ef gh zz".split()), min_size=0, max_size=8),
        min_size=1, max_size=6,
    ),
)
@settings(SET, max_examples=4)  # fit + per-branch scoring per example (r12)
def test_stupid_backoff_property(spark, ref, docs):
    """Random small-alphabet corpora vs the pure-Python stupid-backoff
    model: every branch (trigram / bigram backoff / OOV floor) must
    match, including the bo_ppm integer division."""
    import collections
    import math

    from eventkit_spark.llm.text import stupid_backoff_logprob

    ref_texts = [" ".join(w) for w in ref]
    doc_texts = [" ".join(w) for w in docs]
    rdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ref_texts)], "doc_id long, text string"
    )
    ddf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(doc_texts)], "doc_id long, text string"
    )
    u, b, t = collections.Counter(), collections.Counter(), collections.Counter()
    for s in ref_texts:
        w = s.split()
        u.update(w)
        b.update(zip(w, w[1:]))
        t.update(zip(w, w[1:], w[2:]))
    N = sum(u.values())
    if N == 0:
        return  # degenerate empty reference: engine yields NULL scores
    want = {}
    for i, s in enumerate(doc_texts):
        w = s.split()
        tris = list(zip(w, w[1:], w[2:]))
        if not tris:
            continue
        tot, bo = 0.0, 0
        for tg in tris:
            if t[tg] > 0:
                sc = t[tg] / b[(tg[0], tg[1])]
            elif b[(tg[1], tg[2])] > 0:
                sc = 0.4 * b[(tg[1], tg[2])] / u[tg[1]]
                bo += 1
            else:
                sc = 0.4 * 0.4 * max(u[tg[2]], 0.5) / N
                bo += 1
            tot += math.log(sc)
        want[i] = (len(tris), round(tot / len(tris), 6), bo * 1000000 // len(tris))
    got = {
        r["doc_id"]: (r["n_trigrams"], r["avg_logprob"], r["bo_ppm"])
        for r in stupid_backoff_logprob(ddf, rdf).collect()
    }
    assert got == want


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 10)),
        min_size=0, max_size=30,
    ),
    budget=st.integers(0, 60),
)
@SET
def test_token_quota_property(spark, rows, budget):
    """Random (source, token-count) corpora vs the strict-prefix model:
    kept set == the maximal hash-order prefix whose inclusive running
    token total stays within the budget, per source."""
    from eventkit_spark.llm.sampling import token_quota

    data = [
        (i, f"s{src}", " ".join(["w"] * n) if n else "")
        for i, (src, n) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "doc_id long, source string, text string")
    KNUTH = 2654435761

    def h(k):
        return (k % 2**31) * KNUTH % 2**31 % 1_000_000

    want = set()
    for s in {r[1] for r in data}:
        cum = 0
        for did, _, txt in sorted(
            (r for r in data if r[1] == s), key=lambda r: (h(r[0]), r[0])
        ):
            cum += len(txt.split()) if txt.strip() else 0
            if cum <= budget:
                want.add(did)
    got = {r["doc_id"] for r in token_quota(df, budget, "doc_id").collect()}
    assert got == want


# ---- r11: pure-Python hypothesis models for the vectorized stateful
# kernel scans (no Spark session — these pin the numpy index/scan
# algebra against brutally simple sequential loops, across arbitrary
# chunk splits, so the cross-batch carry path is fuzzed rather than
# sampled) ----


def _split_at(seq, cuts):
    """Split a sequence into non-empty 'micro-batch' pieces at the
    hypothesis-drawn cut points (out-of-range/duplicate cuts drop)."""
    bounds = sorted({c for c in cuts if 0 < c < len(seq)})
    pieces, prev = [], 0
    for c in bounds + [len(seq)]:
        if c > prev:
            pieces.append(seq[prev:c])
            prev = c
    return pieces


@given(
    vals=st.lists(
        st.one_of(st.none(), st.floats(-1e3, 1e3, allow_nan=False)),
        min_size=1, max_size=60,
    ),
    cuts=st.lists(st.integers(0, 59), max_size=4),
    n=st.integers(1, 20),
)
@settings(deadline=None, max_examples=200)
def test_running_scan_model(vals, cuts, n):
    """_running_scan (streaming/stream.py) vs the sequential SQL-window
    reference: NULL until the key's first value; NULL rows keep
    sum/min/max and decay the ema by (1-w); a non-NULL literal first
    row seeds the ema full-weight; rcount counts rows. The value list
    is split at arbitrary points into 'micro-batches' and the carried
    state threaded through — results must be split-invariant AND match
    the reference."""
    import math

    import numpy as np

    from eventkit_spark.streaming.stream import _running_scan

    w = 2.0 / (n + 1)
    # sequential reference (the closed-form SUM semantics, looped)
    exp, seen = [], False
    cnt = 0
    s = 0.0
    mn = mx = ema = None
    for v in vals:
        cnt += 1
        if v is not None:
            if not seen:
                ema = v if cnt == 1 else w * v
                mn = mx = v
                seen = True
            else:
                ema = (1 - w) * ema + w * v
                mn, mx = min(mn, v), max(mx, v)
            s += v
        elif seen:
            ema = (1 - w) * ema
        exp.append(
            (cnt, s if seen else None, mn, mx, ema if seen else None)
        )

    pieces = _split_at(vals, cuts)
    state = (0, 0.0, None, None, None)
    got = []
    for piece in pieces:
        x = np.array(
            [np.nan if v is None else v for v in piece], dtype=np.float64
        )
        cols, state = _running_scan(x, w, *state)
        for i in range(len(piece)):
            got.append(
                tuple(
                    None if (val := cols[k][i]) is None else val
                    for k in ("rcount", "rsum", "rmin", "rmax", "ema")
                )
            )

    assert len(got) == len(exp)
    for g, e in zip(got, exp):
        assert g[0] == e[0]
        for gi, ei in zip(g[1:], e[1:]):
            if ei is None:
                # a masked output must be a true None (SQL NULL), not
                # a NaN smuggled through a float column
                assert gi is None
            else:
                assert gi is not None and not math.isnan(gi)
                assert abs(gi - ei) < 1e-9 * max(1.0, abs(ei))


@given(
    vals=st.lists(st.integers(-50, 50), min_size=1, max_size=60),
    size=st.integers(1, 9),
    cuts=st.lists(st.integers(1, 59), max_size=4),
)
@settings(deadline=None, max_examples=200)
def test_chunk_index_arithmetic_model(vals, size, cuts):
    """The vectorized chunk flush rule — m = (carry+n)//size chunks,
    emitted at chunk-relative rows (j+1)*size-1-carry — vs the obvious
    append/flush loop, across arbitrary micro-batch splits. Emitted
    chunk CONTENTS and the emitting row indices must both match."""
    exp_chunks, exp_rows, buf = [], [], []
    for i, v in enumerate(vals):
        buf.append(v)
        if len(buf) == size:
            exp_chunks.append(list(buf))
            exp_rows.append(i)
            buf = []

    pieces = _split_at(vals, cuts)
    got_chunks, got_rows, carry = [], [], []
    base = 0
    import numpy as np

    for piece in pieces:
        total = carry + list(piece)
        b, n = len(carry), len(piece)
        m = (b + n) // size
        if m:
            emit = (np.arange(1, m + 1) * size - 1) - b
            got_rows.extend((base + e) for e in emit.tolist())
            got_chunks.extend(
                total[j * size : (j + 1) * size] for j in range(m)
            )
        carry = total[m * size:]
        base += n
    assert got_chunks == exp_chunks and got_rows == exp_rows
    assert carry == buf


@given(
    evs=st.lists(
        st.tuples(
            st.integers(0, 40),   # ts
            st.booleans(),        # is_right
            st.integers(-99, 99), # payload
        ),
        min_size=1, max_size=60,
    ),
    cuts=st.lists(st.integers(1, 59), max_size=3),
)
@settings(deadline=None, max_examples=200)
def test_asof_position_scan_model(evs, cuts):
    """The vectorized asof_join scan — cummax over guarded right-row
    positions, carry patched at -1 — vs the sequential guard loop,
    across arbitrary micro-batch splits of the (ts, tag)-sorted
    union. Ties at equal ts deliver right-before-left in both."""
    import numpy as np

    # (ts, tag) sort with right (tag 0) first at ties, stable on input
    rows = sorted(
        [(ts, 0 if isr else 1, p) for (ts, isr, p) in evs],
        key=lambda r: (r[0], r[1]),
    )
    # sequential reference
    exp = []
    r_ts = r_v = None
    for ts, tag, p in rows:
        if tag == 0:
            if r_ts is None or ts >= r_ts:
                r_ts, r_v = ts, p
        else:
            exp.append((ts, p, r_v, r_ts))

    pieces = _split_at(rows, cuts)
    got = []
    r_ts = r_v = None
    for piece in pieces:
        ts = np.array([r[0] for r in piece])
        tag = np.array([r[1] for r in piece])
        pay = np.array([r[2] for r in piece])
        isr = tag == 0
        ok = isr.copy()
        if r_ts is not None:
            ok &= ts >= r_ts
        pos = np.where(ok, np.arange(len(piece)), -1)
        last_r = np.maximum.accumulate(pos)
        for i in np.flatnonzero(~isr):
            sel = last_r[i]
            if sel >= 0:
                got.append((int(ts[i]), int(pay[i]), int(pay[sel]), int(ts[sel])))
            else:
                got.append((int(ts[i]), int(pay[i]), r_v, r_ts))
        ridx = np.flatnonzero(ok)
        if ridx.size:
            r_ts, r_v = int(ts[ridx[-1]]), int(pay[ridx[-1]])
    assert got == exp
