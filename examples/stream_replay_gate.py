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
the equivalent batch computation. The final section swaps in a
ts-range-partitioned multi-file directory with maxFilesPerTrigger=1
— K files -> K micro-batches — and shows the cross-batch state
carries land on exactly the same rows (the r11 driver contract
running_agg_stream_multibatch is this shape; the pytest matrix
tests/test_streaming.py::test_streaming_cross_batch_state_parity
pins it for 19 kernels).

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

    # 4. cross-micro-batch carries (r11): split the same table into 4
    # ts-range files, drain them one per trigger, and the running
    # aggregates — whose count/sum/min/max/ema state hands off across
    # 3 micro-batch boundaries per key — equal the single-batch drain
    # row-for-row. Range-splitting on (ts, event_id) preserves each
    # key's arrival order, which is what makes the comparison exact.
    import shutil
    import time as _time

    multi = tempfile.mkdtemp(prefix="ek_replay_multi_")
    ranked = ev.withColumn(
        "__q", F.ntile(4).over(W.orderBy("ts", "event_id"))
    ).localCheckpoint()
    t0 = _time.time()
    for i in range(1, 5):
        stage = f"{multi}__stage_{i}"
        ranked.filter(F.col("__q") == i).drop("__q").coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
        dst = os.path.join(multi, f"f{i}.parquet")
        shutil.copyfile(os.path.join(stage, part), dst)
        os.utime(dst, (t0 + i, t0 + i))  # oldest-first pickup order
        shutil.rmtree(stage, ignore_errors=True)
    sfm = file_stream(
        spark,
        multi,
        schema=(
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double"
        ),
        value_cols=["value"],
        ts_col="ts",
        key_cols=["user_id"],
        max_files_per_trigger=1,
    )
    qm = (
        sfm.running_agg(ema_n=10)
        .writeStream.format("memory")
        .queryName("ex_multi")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    qm.awaitTermination()
    n_batches = len([p for p in qm.recentProgress if p["numInputRows"] > 0])
    multi_rows = sorted(
        tuple(r) for r in spark.sql("SELECT * FROM ex_multi").collect()
    )
    single_rows = sorted(tuple(r) for r in ra.collect())
    assert n_batches >= 4 and multi_rows == single_rows, n_batches
    print(f"multibatch: {n_batches} micro-batches, state carries exact "
          f"({len(multi_rows)} rows == single-batch drain)")
    return {
        "budget_kept": ns,
        "budget_kept_batch": nb,
        "n_users": n_users,
        "n_batches": n_batches,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from eventkit_spark.session import get_spark

    run(get_spark("stream-replay-example"), sf_dir)


if __name__ == "__main__":
    main()
