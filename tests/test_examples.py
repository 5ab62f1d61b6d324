"""The examples must actually run: the end-to-end curation pipeline is
the engine's composition showcase and doubles as an integration test."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"))


def test_stream_monitoring_end_to_end(spark, tmp_path):
    import stream_monitoring
    from pyspark.sql import functions as F

    from eventkit_spark.sources.tables import load_table

    src = str(tmp_path / "mon_src")
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    ev.write.mode("overwrite").parquet(src)

    stats = stream_monitoring.run(spark, src, report=lambda *_: None)
    n_types = ev.select("event_type").distinct().count()
    true_users = ev.select("user_id").distinct().count()
    assert stats["types_estimated"] == n_types
    assert stats["cms_cells"] > 0
    # HLL estimate of distinct users within the fat 20% gate
    assert abs(stats["distinct_users_est"] - true_users) <= 0.2 * true_users
    # heavy hitters: exactly the true > n/k set
    exact_hh = (
        ev.groupBy("event_type").agg(F.count("*").alias("c"))
        .filter(F.col("c") * 8 > ev.count()).count()
    )
    assert stats["heavy_hitters"] == exact_hh


def test_retrieval_pipeline_end_to_end(spark):
    import retrieval_pipeline
    from pyspark.sql import functions as F

    from eventkit_spark.llm.sampling import bm25_search, rrf_fuse
    from eventkit_spark.llm.similarity import brute_force_topk, hard_negatives
    from eventkit_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    stats = retrieval_pipeline.run(spark, sf, report=lambda *_: None)
    assert stats["lexical"] > 0 and stats["dense"] == 20
    assert stats["fused"] == 10 and stats["reranked"] > 0
    assert stats["negatives"] == 8

    # the fused list must draw from BOTH retrievers and respect RRF:
    # a doc ranked top by both lists outranks a doc in only one list
    docs = load_table(spark, sf, "documents")
    emb = load_table(spark, sf, "embeddings")
    lex = {r["doc_id"] for r in bm25_search(docs, "spark hash join stream", k=20).collect()}
    q = emb.filter(F.col("vec_id") == 0)
    dense = {r["neighbor_id"] for r in brute_force_topk(emb, q, k=20).collect()}
    fused = rrf_fuse(
        [
            bm25_search(docs, "spark hash join stream", k=20).select("doc_id", "rank"),
            brute_force_topk(emb, q, k=20).select(
                F.col("neighbor_id").alias("doc_id"), "rank"
            ),
        ],
        k=60, topn=10,
    ).collect()
    fused_ids = {r["doc_id"] for r in fused}
    assert fused_ids <= (lex | dense)
    both = {r["doc_id"] for r in fused if r["n_lists"] == 2}
    if both:  # docs found by both retrievers lead the fusion
        best_both = min(r["fused_rank"] for r in fused if r["doc_id"] in both)
        assert best_both == 1

    # mined negatives never contain a positive
    pos = {r["doc_id"] for r in fused if r["fused_rank"] <= 3}
    negs = hard_negatives(
        emb, q,
        spark.createDataFrame(
            [(0, d) for d in pos], "query_id long, neighbor_id long"
        ),
        k=8,
    )
    assert not ({r["neighbor_id"] for r in negs.collect()} & pos)


def test_curation_pipeline_end_to_end(spark, tmp_path):
    import curation_pipeline

    out = str(tmp_path / "curated")
    stats = curation_pipeline.run(spark, "/root/testdata/sf0.001", out, report=lambda *_: None)
    # every stage only removes docs (monotone funnel) ...
    order = ["load", "c4_clean", "exact_dedup", "fuzzy_dedup",
             "decontaminated", "quality_filtered", "temperature_mix",
             "dsir_selected", "token_quota"]
    for a, b in zip(order, order[1:]):
        assert stats[b] <= stats[a], (a, b, stats)
    # ... but the funnel doesn't collapse, and what was selected is
    # exactly what was written, with the training columns present
    assert stats["token_quota"] > 50
    assert stats["written"] == stats["token_quota"]
    # the novelty diagnostic ran over the final selection
    assert 0 <= stats["novelty_bo_ppm"] <= 1_000_000
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


def test_multimodal_shards_example(spark, tmp_path):
    import multimodal_shards

    from eventkit_spark.sources.tables import load_table

    stats = multimodal_shards.run(
        spark, "/root/testdata/sf0.001", str(tmp_path / "mm"),
        report=lambda *_: None,
    )
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    n = docs.count()
    n_distinct = docs.select("text").distinct().count()
    assert stats["in_shards"] >= 1
    assert stats["after_dedup"] == n_distinct <= n
    assert stats["feature_rows"] == stats["after_dedup"]
    assert stats["out_samples"] == stats["after_dedup"]


def test_content_moderation_end_to_end(spark):
    import content_moderation

    stats = content_moderation.run(
        spark, "/root/testdata/sf0.001", report=lambda *_: None
    )
    assert 0 < stats["kept"] < stats["input"]  # the gate actually fires
    assert stats["flagged_terms"] > 0 and stats["flagged_phrases"] > 0
    assert stats["profiled_columns"] >= 4


def test_tokenizer_training_end_to_end(spark):
    import tokenizer_training

    stats = tokenizer_training.run(
        spark, "/root/testdata/sf0.001", report=lambda *_: None
    )
    assert stats["seed"] > stats["batch"] > 0
    # a trained multi-char vocab must beat 1 char/token on the batch
    assert 0 < stats["uni_tokens"] and 0 < stats["bpe_tokens"]
    assert stats["unigram_pieces"] > 0
    assert stats["langs"] >= 1


def test_stream_replay_gate_end_to_end(spark):
    """r10: the streaming replay example — availableNow kernels checked
    against batch forms inline, plus a complete-mode native agg."""
    import stream_replay_gate

    from eventkit_spark.sources.tables import load_table

    stats = stream_replay_gate.run(spark, "/root/testdata/sf0.001")
    assert stats["budget_kept"] == stats["budget_kept_batch"] > 0
    true_users = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .select("user_id").distinct().count()
    )
    assert stats["n_users"] == true_users
