"""Sink surface: batch parquet round-trip, streaming foreachBatch and
parquet sink (the reference's connect/emit + run terminal paths)."""

from pyspark.sql import functions as F


def test_batch_parquet_roundtrip(spark, tmp_path, ints):
    path = str(tmp_path / "out")
    ints.sum().to_parquet(path)
    back = spark.read.parquet(path)
    assert back.count() == 10
    assert back.agg(F.max("value")).first()[0] == 45


def test_streaming_foreach_batch(spark, tmp_path):
    from eventkit_spark.sources.tables import load_table
    from eventkit_spark.streaming import file_stream

    src_dir = str(tmp_path / "src")
    load_table(spark, "/root/testdata/sf0.001", "events").limit(50).write.parquet(src_dir)
    sf = file_stream(
        spark, src_dir,
        schema="event_id long, ts timestamp, user_id long, event_type string, value double, props string",
        key_cols=["user_id"],
    )
    seen = []
    q = sf.filter("value > 0").foreach_batch(
        lambda bdf, bid: seen.append((bid, bdf.count()))
    )
    # availableNow not set: stop after first batch processes everything queued
    q.processAllAvailable()
    q.stop()
    assert sum(n for _, n in seen) == 50


def test_streaming_parquet_sink(spark, tmp_path):
    from eventkit_spark.sources.tables import load_table
    from eventkit_spark.streaming import file_stream

    src_dir = str(tmp_path / "src2")
    load_table(spark, "/root/testdata/sf0.001", "events").limit(40).write.parquet(src_dir)
    sf = file_stream(
        spark, src_dir,
        schema="event_id long, ts timestamp, user_id long, event_type string, value double, props string",
        key_cols=["user_id"],
    )
    out_dir = str(tmp_path / "out2")
    ck = str(tmp_path / "ck")
    q = sf.to_parquet_stream(out_dir, ck)
    q.processAllAvailable()
    q.stop()
    assert spark.read.parquet(out_dir).count() == 40
