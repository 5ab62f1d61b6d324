"""End-to-end hybrid retrieval pipeline on eventkit_spark.

The standard two-tower serving chain, composed purely from engine
operators: BM25 lexical candidates + dense cosine candidates ->
Reciprocal Rank Fusion -> exact cosine rerank of the fused short list
-> hard-negative mining for the next training round. Every stage is
the same code the driver contracts verify one-by-one (bm25_search,
embed_topk, hybrid_rrf, hard_negatives).

Scale notes: both candidate stages are top-k (TakeOrdered) — the
corpus is scanned, never globally sorted; fusion and rerank operate on
lists-sized frames, so their cost is independent of corpus size; the
mining stage is the documented eval-scale exact form (swap in
rp_lsh_topk / ivf_topk candidates at corpus scale).

Run:  python examples/retrieval_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def run(spark, sf_dir: str, query_text: str = "spark hash join stream", report=print) -> dict:
    from eventkit_spark.llm.sampling import bm25_search, rrf_fuse
    from eventkit_spark.llm.similarity import brute_force_topk, hard_negatives
    from eventkit_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    stats: dict = {}

    # 1. lexical candidates: Okapi BM25 top-20 for the query text
    lex = bm25_search(docs, query_text, k=20)
    stats["lexical"] = lex.count()

    # 2. dense candidates: cosine top-20 for the query vector (vec 0
    # stands in for the encoded query; the id spaces are shared)
    q = emb.filter(F.col("vec_id") == 0)
    dense = brute_force_topk(emb, q, k=20)
    dense_r = dense.select(F.col("neighbor_id").alias("doc_id"), "rank")
    stats["dense"] = dense_r.count()

    # 3. Reciprocal Rank Fusion of the two lists (exact integer
    # micro-unit contributions), keep the fused top-10
    fused = rrf_fuse([lex.select("doc_id", "rank"), dense_r], k=60, topn=10)
    stats["fused"] = fused.count()

    # 4. exact cosine rerank of the fused short list only
    cand = emb.join(
        fused.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
    )
    rerank = brute_force_topk(cand, q, k=10)
    stats["reranked"] = rerank.count()

    # 5. hard negatives for the next training round: the fused top-3
    # are the labeled positives; mine the 8 highest-similarity
    # non-positives (excluded BEFORE the rank cut)
    pos = fused.filter(F.col("fused_rank") <= 3).select(
        F.lit(0).cast("long").alias("query_id"),
        F.col("doc_id").alias("neighbor_id"),
    )
    negs = hard_negatives(emb, q, pos, k=8)
    stats["negatives"] = negs.count()

    for k_, v in stats.items():
        report(f"  {k_}: {v}")
    return stats


if __name__ == "__main__":
    from eventkit_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    print(f"retrieval pipeline over {sf}:")
    run(get_spark("retrieval-example"), sf)
