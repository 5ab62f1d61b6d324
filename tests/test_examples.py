"""The examples must actually run: the end-to-end curation pipeline is
the engine's composition showcase and doubles as an integration test."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"))


def test_curation_pipeline_end_to_end(spark, tmp_path):
    import curation_pipeline

    out = str(tmp_path / "curated")
    stats = curation_pipeline.run(spark, "/root/testdata/sf0.001", out, report=lambda *_: None)
    # every stage only removes docs (monotone funnel) ...
    order = ["load", "c4_clean", "exact_dedup", "fuzzy_dedup",
             "decontaminated", "quality_filtered", "temperature_mix",
             "dsir_selected"]
    for a, b in zip(order, order[1:]):
        assert stats[b] <= stats[a], (a, b, stats)
    # ... but the funnel doesn't collapse, and what was selected is
    # exactly what was written, with the training columns present
    assert stats["dsir_selected"] > 50
    assert stats["written"] == stats["dsir_selected"]
    back = spark.read.parquet(out)
    assert {"doc_id", "source", "text", "pack_no", "rank"} <= set(back.columns)
    n = back.count()
    ranks = [r["rank"] for r in back.select("rank").collect()]
    assert sorted(ranks) == list(range(n))  # dense seeded train order


def test_event_analytics_example(spark):
    import event_analytics

    out = event_analytics.run(spark, "/root/testdata/sf0.001", report=lambda *_: None)
    assert out["ema_rows"] == 1000
    assert out["funnel_converted"] <= out["funnel_entered"] <= out["rfm_rows"]
    assert out["bars"] > 0 and out["sessions"] > 0
    assert out["z_alarms"] > 0 and out["cusum_alarms"] > 0
