"""Combinator golden tests, mirroring /root/reference/tests/combine_test.py
(streams offset in value and slightly in time: combine_test.py:12-14)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def abc(spark):
    """Three 5-value streams: values 0-4 / 100-104 / 200-204; stream i
    shifted +i ms (reference uses +1ms delays to fix interleave order)."""
    from eventkit_spark.sources.create import sequence

    def mk(offset, shift):
        return sequence(
            spark,
            [offset + i for i in range(5)],
            times=[i * 0.01 + shift for i in range(5)],
        )

    return mk(0, 0.0), mk(100, 0.001), mk(200, 0.002)


def test_merge(abc):
    a, b, c = abc
    got = a.merge(b, c).to_list()
    exp = []
    for i in range(5):
        exp += [i, 100 + i, 200 + i]
    assert got == exp


def test_chain(abc):
    a, b, c = abc
    got = a.chain(b, c).to_list()
    assert got == list(range(5)) + [100 + i for i in range(5)] + [200 + i for i in range(5)]


def test_zip(spark, abc):
    from eventkit_spark.sources.create import sequence

    a, b, _ = abc
    short = sequence(spark, ["x", "y", "z"])
    got = a.zip(b, short).to_list()
    assert got == [(0, 100, "x"), (1, 101, "y"), (2, 102, "z")]


def test_ziplatest(spark):
    from eventkit_spark.sources.create import sequence

    # source 1: a at t=0, b at t=2; source 2: 1 at t=1
    s1 = sequence(spark, ["a", "b"], times=[0.0, 2.0])
    s2 = sequence(spark, [1], times=[1.0])
    got = s1.ziplatest(s2).to_list()
    assert got == [("a", None), ("a", 1), ("b", 1)]
    got2 = s1.ziplatest(s2, partial=False).to_list()
    assert got2 == [("a", 1), ("b", 1)]


def test_concat_reference_golden(spark):
    """tests/combine_test.py:26-31: concat(e1, e2) — e2's first emit at
    t=0.07 disconnects e1 (the code's popleft discipline; the event.py
    docstring marble contradicts the code and the test — the test wins).
    """
    from eventkit_spark.sources.create import sequence

    e1 = sequence(spark, list(range(10)), interval=0.02)
    e2 = sequence(spark, list(range(100, 110)), times=[0.07 + 0.02 * i for i in range(10)])
    got = e1.concat(e2).to_list()
    assert got == [0, 1, 2, 3] + list(range(100, 110))


def test_switch_docstring_marble(spark):
    """event.py:1162-1175 marble:
    s1: -a----b---c-----d---|  s2: -----------x---y-|  s3: ---------1----2----3-----|
    output: -a----b--1----2--x---y---|
    """
    from eventkit_spark.sources.create import marble

    s1 = marble(spark, "-a----b---c-----d---|")
    s2 = marble(spark, "-----------------x---y-|")
    s3 = marble(spark, "---------1----2----3-----|")
    # first emits: s1@1, s3@9, s2@17. s1 active [1,9): a,b (c@10 dropped);
    # s3 active [9,17): 1@9, 2@14 (3@19 dropped); s2 active from 17: x,y.
    got = s1.switch(s2, s3).to_list()
    assert got == ["a", "b", "1", "2", "x", "y"]


def test_switch_reference_golden(spark):
    """tests/combine_test.py:19-24: switch(e1, e2, e3) with staggered
    first emits -> [0, 100] + array3."""
    from eventkit_spark.sources.create import sequence

    a1 = list(range(10))
    a2 = list(range(100, 110))
    a3 = list(range(200, 210))
    e1 = sequence(spark, a1, interval=0.01)
    e2 = sequence(spark, a2, times=[0.001 + 0.01 * i for i in range(10)])
    e3 = sequence(spark, a3, times=[0.002 + 0.01 * i for i in range(10)])
    assert e1.switch(e2, e3).to_list() == [0, 100] + a3


def test_merge_keeps_ts_order(abc):
    a, b, c = abc
    m = a.merge(b, c)
    rows = m.df.orderBy("seq").collect()
    ts = [r["ts"] for r in rows]
    assert ts == sorted(ts)


def test_fork_join_disciplines(spark):
    """Generic fork: branches join back through ANY combinator, mirroring
    /root/reference/tests/event_test.py:148-152 (zip golden) and
    ops/combine.py:10-37 (Fork.merge/chain/join)."""
    from eventkit_spark.sources.create import range_

    ev = range_(spark, 4, 10, interval=0.01)
    # the reference's own fork golden: range(4,10)[Min, Max, Sum].zip()
    got = ev[lambda e: e.min(), lambda e: e.max(), lambda e: e.sum()].zip().to_list()
    assert got == [(4, 4, 4), (4, 5, 9), (4, 6, 15), (4, 7, 22), (4, 8, 30), (4, 9, 39)]

    # non-zip joiner: merge interleaves branch emits at equal ts by
    # branch index (min first, then max) — pairwise per tick
    merged = ev.fork(lambda e: e.min(), lambda e: e.max()).merge().to_list()
    exp = []
    for i in range(4, 10):
        exp += [4, i]
    assert merged == exp

    # chain: all of branch 0, then all of branch 1
    chained = ev.fork(lambda e: e.min(), lambda e: e.max()).chain().to_list()
    assert chained == [4] * 6 + list(range(4, 10))

    # custom joiner callable (the reference's Fork.join(JoinOp))
    from eventkit_spark.operators import combine as C

    joined = ev.fork(lambda e: e.min(), lambda e: e.max()).join(C.zip_).to_list()
    assert joined == [(4, i) for i in range(4, 10)]

    # ziplatest over fork branches keeps the partial NULL convention:
    # at t0 branch 0 emits first (tag order), branch 1 not yet seen
    zl = ev.fork(lambda e: e.take(1), lambda e: e.max()).ziplatest().to_list()
    assert zl[0] == (4, None) and zl[1] == (4, 4) and zl[-1] == (4, 9)


def test_addable_join_dynamic_sources(spark):
    """AddableJoinOp.add_source analog (reference combine.py:54-94):
    sources attach after construction, the same source may attach twice,
    and each frame() read reflects the sources added so far."""
    import pytest

    from eventkit_spark.operators.combine import AddableJoin
    from eventkit_spark.sources.create import sequence

    a = sequence(spark, [1, 2], interval=0.01)
    b = sequence(spark, [10], times=[0.005])

    j = AddableJoin("merge", a)
    assert j.frame().to_list() == [1, 2]
    j.add_source(b)
    assert j.frame().to_list() == [1, 10, 2]
    j.add_source(b)  # same source twice, like the reference
    assert j.frame().to_list() == [1, 10, 10, 2]

    # chain discipline keeps strict source order regardless of ts
    jc = AddableJoin("chain", b).add_source(a)
    assert jc.frame().to_list() == [10, 1, 2]

    # coercion through EventFrame.create: raw iterables need a spark kwarg,
    # so pre-coerced frames are the expected input; bad joiner rejects
    with pytest.raises(ValueError):
        AddableJoin("nope")
    with pytest.raises(ValueError):
        AddableJoin("merge").frame()
