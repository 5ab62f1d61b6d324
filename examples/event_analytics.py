"""Event-stream analytics walkthrough on eventkit_spark.

The keyed-stream side of the engine: reference-style stream operators
(ema / unique / throttle) next to the event-time analytics the engine
adds (sessionize -> funnel -> retention -> OHLC resample -> trailing
z-score + CUSUM alarms -> RFM segments), all over the same events
table, all driver-contract-verified operators.

Run:  python examples/event_analytics.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def run(spark, sf_dir: str, report=print) -> dict:
    from eventkit_spark.operators.relational import funnel, retention, rfm
    from eventkit_spark.sources.tables import load_events, load_table

    out = {}
    ev = load_events(spark, sf_dir)

    # reference-surface stream ops: smoothed values, change stream
    smoothed = ev.ema(n=10)
    out["ema_rows"] = smoothed.df.count()

    # sessionize by 30-minute inactivity, then a session count per user
    sess = ev.sessionize(1800.0)
    out["sessions"] = (
        sess.df.select("user_id", "session").distinct().count()
    )

    # k-step conversion funnel click -> view -> purchase within 1 day
    fun = funnel(
        load_table(spark, sf_dir, "events"),
        steps=[
            "event_type = 'view'",
            "event_type = 'click'",
            "event_type = 'purchase'",
        ],
        within=86400.0,
    )
    out["funnel_entered"] = fun.count()
    out["funnel_converted"] = fun.filter("converted").count()

    # daily cohort retention (offset 0 = cohort sizes)
    ret = retention(load_table(spark, sf_dir, "events"), period=86400.0)
    out["cohorts"] = ret.filter(F.col("offset") == 0).count()

    # OHLC rollup into 6h bars
    bars = ev.resample(21600.0)
    out["bars"] = bars.count()

    # alarms: trailing z-score and CUSUM drift detection
    out["z_alarms"] = ev.anomaly(86400.0, z=2.0).df.filter("is_anomaly").count()
    out["cusum_alarms"] = ev.cusum(50.0, h=150.0, slack=15.0).df.filter("alarm").count()

    # RFM segmentation table
    out["rfm_rows"] = rfm(load_table(spark, sf_dir, "events")).count()

    # marketing attribution: last-touch credit + linear multi-touch
    from eventkit_spark.operators.relational import attribution, multi_touch

    raw = load_table(spark, sf_dir, "events")
    att = attribution(
        raw, "event_type = 'click'", "event_type = 'purchase'",
        lookback=7 * 86400.0,
    )
    out["attributed"] = att.filter("touch_id is not null").count()
    mt = multi_touch(
        raw, "event_type = 'click'", "event_type = 'purchase'",
        lookback=7 * 86400.0,
    )
    out["touch_pairs"] = mt.count()

    # forecasting/tracking trio over the smoothed stream
    out["holt_rows"] = ev.holt(alpha=0.5, beta=0.3).df.count()
    out["kalman_rows"] = ev.kalman1d().df.count()

    # ops hygiene: which users dominate the stream?
    from eventkit_spark.plans.audit import skew_report

    out["hot_keys"] = skew_report(raw, ["user_id"], top=5).count()

    # experimentation readouts: bootstrap CIs per segment, an A/B lift
    # with a paired-bootstrap interval, and CUPED variance reduction
    from eventkit_spark.operators.relational import ab_lift, bootstrap_ci, cuped

    cis = bootstrap_ci(raw, "value", by="event_type")
    out["ci_rows"] = cis.count()
    lift = ab_lift(raw, "value", "event_type", treat="purchase", control="view")
    out["ab_significant"] = int(lift.collect()[0]["significant"])
    cents = F.round(F.col("value") * 100, 0).cast("long")
    pre = F.col("ts") < F.lit("2024-01-16").cast("timestamp")
    units = (
        raw.groupBy("user_id")
        .agg(
            (F.sum(F.when(pre, cents)).cast("double")
             / F.count(F.when(pre, F.lit(1)))).alias("x"),
            (F.sum(F.when(~pre, cents)).cast("double")
             / F.count(F.when(~pre, F.lit(1)))).alias("y"),
        )
        .filter(F.col("x").isNotNull() & F.col("y").isNotNull())
        .withColumn("arm", F.when(F.col("user_id") % 2 == 0, "t").otherwise("c"))
    )
    out["cuped_rows"] = cuped(units, "y", "x", "arm", "t", "c").count()

    for k, v in out.items():
        report(f"  {k}: {v}")
    return out


if __name__ == "__main__":
    from eventkit_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    print(f"event analytics over {sf}:")
    run(get_spark("event-analytics-example"), sf)
