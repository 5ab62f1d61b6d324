"""Skew/scale utility tests: salted aggregation must equal the plain
aggregation; colocate must remove the downstream shuffle."""

from pyspark.sql import functions as F

from eventkit_spark.operators.scale import colocate, explain_skew, salted_agg
from eventkit_spark.plans.audit import count_shuffles
from eventkit_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_salted_agg_equals_plain(spark):
    ev = load_table(spark, SF, "events")
    salted = salted_agg(
        ev, ["user_id"],
        {"total": ("value", "sum"), "n": ("event_id", "count"),
         "vmin": ("value", "min"), "vmax": ("value", "max")},
        salt_buckets=8,
    )
    plain = ev.groupBy("user_id").agg(
        F.sum("value").alias("total"), F.count("event_id").alias("n"),
        F.min("value").alias("vmin"), F.max("value").alias("vmax"),
    )
    a = {r["user_id"]: (round(r["total"], 6), r["n"], r["vmin"], r["vmax"]) for r in salted.collect()}
    b = {r["user_id"]: (round(r["total"], 6), r["n"], r["vmin"], r["vmax"]) for r in plain.collect()}
    assert a == b


def test_colocate_reuses_exchange(spark):
    ev = load_table(spark, SF, "events")
    co = colocate(ev, ["user_id"], partitions=8)
    agg = co.groupBy("user_id").agg(F.sum("value").alias("s"))
    # repartition provides the exchange; the aggregate must not add one
    assert count_shuffles(agg) == 1


def test_explain_skew(spark):
    ev = load_table(spark, SF, "events")
    rows = explain_skew(ev, ["user_id"], top=3).collect()
    assert len(rows) == 3
    assert rows[0]["rows"] >= rows[1]["rows"] >= rows[2]["rows"]
