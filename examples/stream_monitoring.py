"""Streaming observability pipeline on eventkit_spark.

Bounded-state monitoring of an unbounded event stream, composed from
the engine's streaming twins: Count-Min cells (frequency-per-item),
HyperLogLog registers (distinct users), and a Misra-Gries-backed exact
heavy-hitter recount on the sunk snapshot — the "what is this stream
doing right now" stack whose state never grows past kilobytes no
matter how long the stream runs.

The sinks are memory tables (availableNow drains the backlog); in
production the same queries write to a dashboard store per trigger.

Run:  python examples/stream_monitoring.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def run(spark, src_dir: str, report=print) -> dict:
    from eventkit_spark.llm.sketch import (
        count_min_estimate,
        heavy_hitters,
        hll_estimate,
    )
    from eventkit_spark.streaming import file_stream

    sf = file_stream(
        spark, src_dir,
        schema=("event_id long, ts timestamp, user_id long, "
                "event_type string, value double, props string"),
        value_cols=["value"], ts_col="ts", key_cols=["user_id"],
    )
    stats: dict = {}

    # 1. event-type frequencies: d x w CMS cells, one bounded aggregate
    cms_q = (
        sf.count_min("event_type", d=4, w=64)
        .writeStream.format("memory").queryName("mon_cms")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    # 2. distinct active users: 2^p HLL registers
    hll_q = (
        sf.hll("user_id", p=9)
        .writeStream.format("memory").queryName("mon_hll")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    cms_q.awaitTermination()
    hll_q.awaitTermination()

    cells = spark.sql("SELECT * FROM mon_cms")
    stats["cms_cells"] = cells.count()

    batch = spark.read.parquet(src_dir)
    types = batch.select("event_type").distinct()
    est = count_min_estimate(cells, types, "event_type", d=4, w=64)
    stats["types_estimated"] = est.count()

    regs = spark.sql("SELECT * FROM mon_hll")
    users = hll_estimate(regs, p=9).first()
    stats["distinct_users_est"] = int(users["est"])

    # 3. exact heavy hitters over the drained data (MG prefilter +
    # exact recount — the batch leg of the monitoring stack)
    hh = heavy_hitters(batch, "event_type", k=8)
    stats["heavy_hitters"] = hh.count()

    for k_, v in stats.items():
        report(f"  {k_}: {v}")
    return stats


if __name__ == "__main__":
    from eventkit_spark.session import get_spark

    spark = get_spark("stream-monitoring-example")
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mon_src"
    if not os.path.exists(src):
        from eventkit_spark.sources.tables import load_table

        load_table(spark, "/root/testdata/sf0.001", "events").write.mode(
            "overwrite"
        ).parquet(src)
    print(f"stream monitoring over {src}:")
    run(spark, src)
