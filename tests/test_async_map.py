"""Async map tests, mirroring /root/reference/tests/transform_test.py:
test_async_map (ordered, 20 concurrent sleeps), test_async_map_unordered
(completion order -> set equality), plus timeout/failure -> NULL."""

import asyncio

import pytest


def test_async_map_ordered(spark):
    from eventkit_spark.sources.create import range_

    async def coro(x):
        await asyncio.sleep(0.02)
        return x * x

    ef = range_(spark, 10).map_async(coro, "bigint", task_limit=20)
    assert ef.to_list() == [i * i for i in range(10)]


def test_async_map_unordered_set(spark):
    from eventkit_spark.sources.create import range_

    # decreasing sleeps -> later rows complete first (the reference's
    # unordered test shape, transform_test.py:100-115)
    async def coro(x):
        await asyncio.sleep(0.1 - 0.01 * float(x % 10))
        return x * x

    ef = range_(spark, 10).map_async(coro, "bigint", ordered=False, task_limit=20)
    assert set(ef.to_list()) == {i * i for i in range(10)}


def test_async_map_timeout_and_errors(spark):
    from eventkit_spark.sources.create import range_

    async def coro(x):
        if x == 3:
            raise ValueError("boom")
        await asyncio.sleep(0.5 if x == 5 else 0.0)
        return x + 100

    ef = range_(spark, 8).map_async(coro, "bigint", timeout=0.2, task_limit=8)
    got = ef.to_list()
    assert got[3] is None  # exception -> NO_VALUE/NULL
    assert got[5] is None  # timeout -> NULL
    assert [g for i, g in enumerate(got) if i not in (3, 5)] == [
        100, 101, 102, 104, 106, 107,
    ]


def test_create_wait_value_first(spark):
    from eventkit_spark.frame import EventFrame
    from eventkit_spark.sources.create import wait

    ef = EventFrame.create([5, 6, 7], spark=spark)
    assert ef.first() == 5
    assert ef.value() == 7
    assert wait(spark, 42).to_list() == [42]
