"""EventFrame.create coercion ladder + Event.init analog.

Reference: ``Event.create`` (event.py:484-506) coerces event /
constructor-callable / async-iterator / awaitable; ``Event.init``
(event.py:470-480) attaches named empty events. The engine resolves
async objects at plan time (batch semantics, sources/create.py:38-57).
"""

import pytest

from eventkit_spark.frame import EventFrame


def test_create_passthrough_and_dataframe(spark, ints):
    assert EventFrame.create(ints) is ints
    df = ints.df
    ef = EventFrame.create(df, value_cols=["value"], seq_col="seq", ts_col="ts")
    assert isinstance(ef, EventFrame) and ef.df is df


def test_create_iterable(spark):
    ef = EventFrame.create([1, 2, 3], spark=spark)
    assert ef.to_list() == [1, 2, 3]


def test_create_async_iterator(spark):
    async def gen():
        for i in range(4):
            yield i * 10

    ef = EventFrame.create(gen(), spark=spark)
    assert ef.to_list() == [0, 10, 20, 30]


def test_create_awaitable(spark):
    async def coro():
        return 42

    ef = EventFrame.create(coro(), spark=spark)
    assert ef.to_list() == [42]


def test_create_constructor_callable(spark):
    # reference event.py:495-497: a zero-arg constructor is called and
    # its result re-coerced (here: a callable returning an async gen)
    def make():
        async def gen():
            yield 7
            yield 8

        return gen()

    ef = EventFrame.create(make, spark=spark)
    assert ef.to_list() == [7, 8]


def test_create_invalid(spark):
    with pytest.raises(ValueError):
        EventFrame.create(object(), spark=spark)
    with pytest.raises(ValueError):
        EventFrame.create([1, 2], spark=None)


def test_event_init_analog(spark):
    class Holder:
        pass

    h = Holder()
    EventFrame.init(h, ["alpha", "beta"], spark)
    assert isinstance(h.alpha, EventFrame) and isinstance(h.beta, EventFrame)
    assert h.alpha.to_list() == []
    # usable as a merge operand straight away
    merged = EventFrame.create([1.0, 2.0], spark=spark).merge(h.alpha)
    assert merged.to_list() == [1.0, 2.0]
