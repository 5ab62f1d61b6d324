"""emap join-discipline goldens, replicated 1:1 from
/root/reference/tests/transform_test.py:117-166 (marble timing re-based
on event time: parent k at ts=k s, child char position = +1 s each)."""

import pytest

from eventkit_spark.operators.higher_order import marble_children


@pytest.fixture(scope="module")
def parents(spark):
    from eventkit_spark.sources.create import sequence

    return sequence(spark, [0, 1, 2], interval=1.0)


def test_mergemap(parents):
    marbles = [
        "A   B    C    D",
        "_1   2  3    4",
        "__K   L     M   N",
    ]
    got = parents.mergemap(marble_children(marbles)).to_list()
    assert got == ["A", "1", "K", "B", "2", "L", "3", "C", "M", "4", "D", "N"]


def test_concatmap(parents):
    marbles = [
        "A    B    C    D",
        "_       1    2    3    4",
        "__                  K    L      M   N",
    ]
    got = parents.concatmap(marble_children(marbles)).to_list()
    assert got == ["A", "B", "1", "2", "3", "K", "L", "M", "N"]


def test_chainmap(parents):
    marbles = [
        "A    B    C    D           ",
        "_       1    2    3    4",
        "__                  K    L      M   N",
    ]
    got = parents.chainmap(marble_children(marbles)).to_list()
    assert got == ["A", "B", "C", "D", "1", "2", "3", "4", "K", "L", "M", "N"]


def test_switchmap(parents):
    marbles = [
        "A    B    C    D           ",
        "_                 K    L      M   N",
        "__      1    2      3    4",
    ]
    got = parents.switchmap(marble_children(marbles)).to_list()
    assert got == ["A", "B", "1", "2", "K", "L", "M", "N"]


def test_emap_named_joiners(parents):
    """emap(gen, joiner) dispatches to the four disciplines
    (event.py:865-879)."""
    marbles = [
        "A   B    C    D",
        "_1   2  3    4",
        "__K   L     M   N",
    ]
    assert parents.emap(marble_children(marbles), "merge").to_list() == \
        parents.mergemap(marble_children(marbles)).to_list()
    assert parents.emap(marble_children(marbles), "chain").to_list() == \
        parents.chainmap(marble_children(marbles)).to_list()
    with pytest.raises(ValueError):
        parents.emap(marble_children(marbles), "zipper")


def test_emap_custom_joiner(parents):
    """A user-supplied joiner (the reference's AddableJoinOp hook):
    reverse-chain — children flattened in REVERSE parent order."""
    from pyspark.sql import functions as F

    from eventkit_spark.operators.higher_order import CIDX, PSEQ, resequence

    marbles = [
        "AB",
        "_12",
        "__KL",
    ]

    def reverse_chain(ef, rows):
        return resequence(ef, rows, [F.col(PSEQ).desc(), F.col(CIDX)])

    got = parents.emap(marble_children(marbles), reverse_chain).to_list()
    assert got == ["K", "L", "1", "2", "A", "B"]
