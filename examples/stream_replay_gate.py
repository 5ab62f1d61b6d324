"""Replay-gated streaming kernels: batch/stream parity you can run.

The engine's streaming operators are applyInPandasWithState kernels
(vectorized seeded scans since r10) whose semantics are pinned two
ways: pytest parity suites, and — since r10 — TEN driver contracts
that replay a bounded table through REAL availableNow structured-
streaming queries and hash-compare against batch SQL oracles.

This example shows the replay pattern on its own, outside the
contract harness: write a bounded frame as ONE parquet file, stream
it back (one file -> one micro-batch -> deterministic event-time
order per key), run a stateful kernel, and check the result against
the equivalent batch computation. Swap maxFilesPerTrigger=1 over a
multi-file directory to exercise cross-micro-batch state carries
(tests/test_streaming.py::test_streaming_cross_batch_state_parity
does exactly that for 17 kernels).

Run:  python examples/stream_replay_gate.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W, functions as F


def run(spark, sf_dir: str) -> dict:
    from eventkit_spark.sources.tables import load_table
    from eventkit_spark.streaming import file_stream

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )

    replay = tempfile.mkdtemp(prefix="ek_replay_")
    ev.coalesce(1).write.mode("overwrite").parquet(replay)
    sfr = file_stream(
        spark,
        replay,
        schema=(
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double"
        ),
        value_cols=["value"],
        ts_col="ts",
        key_cols=["user_id"],
    )

    # 1. cost-capped ingest (the batch token_quota discipline, live)
    stream_kept = sfr.run_available_now(
        sink_df=sfr.take_budget(1500.0), name="ex_budget"
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    batch_kept = (
        ev.withColumn("__cum", F.sum("value").over(w))
        .filter(F.col("__cum") <= 1500.0)
    )
    ns, nb = stream_kept.count(), batch_kept.count()
    assert ns == nb, (ns, nb)
    print(f"take_budget: stream kept {ns} rows == batch window cumsum {nb}")

    # 2. running aggregates (count/sum/min/max/ema in one stateful hop)
    ra = sfr.run_available_now(sink_df=sfr.running_agg(ema_n=10), name="ex_ra")
    last = (
        ra.groupBy("user_id")
        .agg(
            F.max("rcount").alias("n"),
            F.max_by("rsum", "rcount").alias("total"),  # the FINAL total
        )
        .orderBy("user_id")
        .limit(3)
        .collect()
    )
    for r in last:
        print(f"running_agg: user {r['user_id']}: {r['n']} events, "
              f"running total {r['total']:.2f}")

    # 3. native streaming aggregation: per-user latest (complete mode)
    q = (
        sfr.last()
        .writeStream.format("memory")
        .queryName("ex_last")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_users = spark.sql("SELECT count(*) c FROM ex_last").first()["c"]
    print(f"last: {n_users} users with a latest-value row (complete mode)")
    return {"budget_kept": ns, "budget_kept_batch": nb, "n_users": n_users}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from eventkit_spark.session import get_spark

    run(get_spark("stream-replay-example"), sf_dir)


if __name__ == "__main__":
    main()
