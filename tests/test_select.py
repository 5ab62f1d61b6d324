"""Golden-list selection tests, mirroring /root/reference/tests/select_test.py."""

from pyspark.sql import functions as F


def test_filter(ints):
    # reference: .filter() keeps truthy → drops 0 (select_test.py)
    assert ints.filter().to_list() == list(range(1, 10))
    assert ints.filter(lambda v: v % 2 == 0).to_list() == [0, 2, 4, 6, 8]
    assert ints.filter("value > 6").to_list() == [7, 8, 9]


def test_skip_take(ints):
    assert ints.skip(5).to_list() == [5, 6, 7, 8, 9]
    assert ints.take(3).to_list() == [0, 1, 2]
    assert ints.skip(2).take(2).to_list() == [2, 3]


def test_takewhile_dropwhile(ints):
    assert ints.takewhile(lambda v: v < 5).to_list() == [0, 1, 2, 3, 4]
    assert ints.dropwhile(lambda v: v < 5).to_list() == [5, 6, 7, 8, 9]
    # non-monotone predicate: stops at first failure for good
    assert ints.map(lambda v: v % 3).takewhile(lambda v: v < 2).to_list() == [0, 1]


def test_changes(dups):
    assert dups.changes().to_list() == [1, 2, 1, 2, 3, 1, 4]


def test_unique(dups):
    assert dups.unique().to_list() == [1, 2, 3, 4]


def test_unique_by_key(ints):
    assert ints.unique(by=lambda v: v % 3).to_list() == [0, 1, 2]


def test_last(ints):
    assert ints.last().to_list() == [9]


def test_takeuntil(spark, ints):
    from eventkit_spark.sources.create import sequence

    notifier = sequence(spark, ["x"], times=[0.045])
    assert ints.takeuntil(notifier).to_list() == [0, 1, 2, 3, 4]
