"""LLM-extension operator tests: near-dup blocking correctness, LSH
prefilter recall, IVF plan shape, Jaccard df-pruning."""

import pytest
from pyspark.sql import functions as F

from eventkit_spark.llm.similarity import embedding_near_dups, ivf_topk
from eventkit_spark.plans.audit import physical_plan
from eventkit_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
THRESH = 0.35


def _pairs(df):
    return {(r["id_a"], r["id_b"]): round(r["cos"], 6) for r in df.collect()}


def test_neardup_multiblock_equals_singleblock(spark):
    """block_size small enough to force many blocks must return the SAME
    pair set as the single-block path (round-1 ADVICE high: cross-block
    cells silently dropped pairs whose block-a member had the larger id)."""
    emb = load_table(spark, SF, "embeddings")
    single = _pairs(embedding_near_dups(emb, threshold=THRESH, block_size=1_000_000))
    multi = _pairs(embedding_near_dups(emb, threshold=THRESH, block_size=16))
    assert multi == single
    assert len(single) > 0  # the fixture actually exercises the threshold


def test_neardup_lsh_prefilter_subset_and_recall(spark):
    """rp_lsh-prefiltered near-dups must be a subset of the exact pairs
    (every emitted cos is exact-verified) with auto-sized bits/tables
    hitting the recall target even at this low threshold."""
    emb = load_table(spark, SF, "embeddings")
    exact = _pairs(embedding_near_dups(emb, threshold=THRESH, block_size=1_000_000))
    lsh = _pairs(embedding_near_dups(emb, threshold=THRESH, prefilter="rp_lsh"))
    assert set(lsh) <= set(exact)
    for k, v in lsh.items():
        assert abs(v - exact[k]) < 1e-6
    recall = len(lsh) / max(1, len(exact))
    assert recall >= 0.9, f"LSH prefilter recall {recall:.2f} below 0.9"


def test_neardup_lsh_planted_high_threshold(spark):
    """The true near-dup regime (threshold 0.92): planted perturbed
    copies must all be found, with real pruning (bits > 1)."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.normal(size=(200, 64))
    dup = base[:40] + rng.normal(scale=0.05, size=(40, 64))  # cos ~ 0.995
    vecs = np.vstack([base, dup])
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = _pairs(embedding_near_dups(emb, threshold=0.92, block_size=1_000_000))
    lsh = _pairs(embedding_near_dups(emb, threshold=0.92, prefilter="rp_lsh"))
    planted = {(i, 200 + i) for i in range(40)}
    assert planted <= set(exact)
    assert set(lsh) <= set(exact)
    recall = len(lsh) / len(exact)
    assert recall >= 0.95, f"planted-dup recall {recall:.2f}"


def test_ivf_no_global_window(spark):
    """Centroid seeding must not plan an unpartitioned window or a
    full-corpus single task (round-1 VERDICT fix #4): every Window in
    the final plan is keyed by query_id."""
    emb = load_table(spark, SF, "embeddings")
    out = ivf_topk(emb, emb.filter(F.col("vec_id") < 5), k=3, n_cells=8, nprobe=3)
    plan = physical_plan(out)
    for ln in plan.splitlines():
        if "Window" in ln:
            assert "query_id" in ln, f"unpartitioned window in IVF plan:\n{ln}"
    rows = out.collect()
    assert len(rows) > 0
    # every query got at most k neighbors, ranked
    from collections import Counter

    per_q = Counter(r["query_id"] for r in rows)
    assert all(c <= 3 for c in per_q.values())


def test_default_filter_truthiness(spark):
    """filter() with no predicate keeps Python-truthy payloads: non-empty
    strings survive (a bare boolean cast NULLed them out — round-1
    VERDICT wrong-list #3), zeros and empties drop."""
    from eventkit_spark.sources.create import sequence

    strs = sequence(spark, ["a", "", "0", "b"])
    assert strs.filter().to_list() == ["a", "0", "b"]
    nums = sequence(spark, [1.0, 0.0, 2.0])
    assert nums.filter().to_list() == [1.0, 2.0]
    from eventkit_spark.frame import EventFrame

    adf = spark.createDataFrame(
        [(0, [1]), (1, []), (2, [2, 3])], "seq long, value array<int>"
    )
    arrs = EventFrame(adf, value_cols=["value"], seq_col="seq", ts_col=None)
    assert arrs.filter().to_list() == [[1], [2, 3]]


def test_jaccard_max_df_prunes_only_downward(spark):
    """df-pruning may drop pairs or lower scores, never invent them."""
    from eventkit_spark.llm.dedup import ngram_jaccard_pairs

    docs = load_table(spark, SF, "documents")
    full = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
            ngram_jaccard_pairs(docs, k=3, threshold=0.3).collect()}
    pruned = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
              ngram_jaccard_pairs(docs, k=3, threshold=0.3, max_df=64).collect()}
    assert set(pruned) <= set(full)
    for k, v in pruned.items():
        assert v <= full[k] + 1e-9
