"""Plan-shape assertions: the scale contract (pushdown, broadcast,
bounded shuffle counts) verified from the physical plan."""

import pytest
from pyspark.sql import Window as W, functions as F

from eventkit_spark.plans import (
    assert_broadcast_join,
    assert_pushed_filter,
)
from eventkit_spark.plans.audit import count_shuffles


SF = "/root/testdata/sf0.001"


def test_filter_pushdown_reaches_scan(spark):
    from eventkit_spark.sources.tables import load_events

    ef = load_events(spark, SF).filter("value > 100")
    assert_pushed_filter(ef.df, "GreaterThan(value,100.0)")


def test_column_pruning(spark):
    from eventkit_spark.sources.tables import load_events
    from eventkit_spark.plans.audit import physical_plan

    ef = load_events(spark, SF)
    out = ef.df.select("event_id", "user_id")
    plan = physical_plan(out)
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "event_type" not in scan and "props" not in scan


def test_small_dim_join_broadcasts(spark):
    import __spark_entry__ as e

    assert_broadcast_join(e.q_region_revenue(spark, SF))


def test_running_aggs_single_shuffle(spark):
    """fork of 2 running aggs over the same keyed window must cost ONE
    shuffle (same window spec -> one Window node after the key
    exchange), not one per branch."""
    from eventkit_spark.sources.tables import load_events

    ef = load_events(spark, SF)
    w = W.partitionBy("user_id").orderBy("event_id").rowsBetween(W.unboundedPreceding, 0)
    out = ef.df.select(
        "user_id",
        "event_id",
        F.sum("value").over(w).alias("a"),
        F.avg("value").over(w).alias("b"),
    )
    assert count_shuffles(out) <= 1


def test_running_multi_single_shuffle(spark):
    """running_multi must plan ONE exchange for N aggregates."""
    from eventkit_spark.sources.tables import load_events

    ef = load_events(spark, SF).running_multi("min", "max", "sum", "mean", "ema")
    assert count_shuffles(ef.df) <= 1


def test_takeuntil_no_fact_reshuffle(spark):
    """takeuntil's notifier aggregate joins broadcast at runtime: the
    engine no longer force-hints keyed cut tables (high-cardinality keys
    could blow the driver), so AQE must still discover the small side
    from runtime stats — assert on the executed final plan."""
    import __spark_entry__ as e

    assert_broadcast_join(e.q_takeuntil(spark, SF), execute=True)
