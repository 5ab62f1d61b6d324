"""Tokenizer-training pipeline on eventkit_spark.

The standard pre-training tokenizer workflow, composed from the
engine's operators: normalize the corpus -> train BOTH tokenizer
families on the same text (BPE merge rules and a unigram-LM
vocabulary) -> persist each as a store -> encode a fresh batch with
each store without refitting -> compare compression and per-language
fertility, the report that actually drives the vocab-size /
family decision.

Every stage is the same code the driver contracts verify one-by-one
(normalize_text, bpe_train / bpe_encode_with_store, unigram_vocab /
unigram_encode_with_store, unigram_fertility's aggregation shape).

Run:  python examples/tokenizer_training.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def run(spark, sf_dir: str, report=print) -> dict:
    from eventkit_spark.llm.text import BPE_REGEX, normalize_text
    from eventkit_spark.llm.tokenize import (
        bpe_encode_with_store, bpe_store_init,
    )
    from eventkit_spark.llm.unigram import (
        unigram_encode_with_store, unigram_store_init, unigram_train,
    )
    from eventkit_spark.sources.tables import load_table

    stats = {}
    docs = load_table(spark, sf_dir, "documents")

    # 1. one canonical byte form before any counting: a tokenizer
    # trained on mixed NFC/NFD text learns duplicate pieces
    clean = docs.drop("text").join(normalize_text(docs, form="NFKC"), "doc_id")

    # train/serve split: fit on 2/3, encode the held-out 1/3 — the
    # nightly-batch shape both stores exist for
    seed = clean.filter(F.col("doc_id") % 3 != 0)
    batch = clean.filter(F.col("doc_id") % 3 == 0)
    stats["seed"], stats["batch"] = seed.count(), batch.count()
    report(f"seed docs: {stats['seed']}, batch docs: {stats['batch']}")

    root = tempfile.mkdtemp(prefix="eventkit_tok_")

    # 2a. BPE: distributed count pass + driver merge loop, persisted
    bpe_store_init(seed, f"{root}/bpe", n_merges=24)
    # 2b. unigram-LM: seed-then-prune EM on the word-type table
    vocab = unigram_train(seed, vocab_size=48, start_size=192, iters=2)
    unigram_store_init(vocab, f"{root}/uni")
    stats["unigram_pieces"] = vocab.count()
    report(f"unigram vocab rows: {stats['unigram_pieces']}")

    # 3. encode the SAME fresh batch with each store (no refitting;
    # characters the seed never saw fall back per-family: BPE keeps
    # them as seed symbols, unigram uses the 0-score <unk> char)
    bpe = bpe_encode_with_store(batch, f"{root}/bpe")
    uni = unigram_encode_with_store(batch, f"{root}/uni")

    # 4. the decision report: compression (chars per token) and
    # per-language fertility for both families from ONE joined frame
    chars = (
        batch.select(
            "doc_id",
            F.explode(
                F.regexp_extract_all(F.col("text"), F.lit(BPE_REGEX), 0)
            ).alias("word"),
        )
        .groupBy("doc_id")
        .agg(F.sum(F.length("word")).alias("n_chars"))
    )
    both = (
        # bpe_encode_with_store returns the materialized token arrays;
        # the unigram store path returns counts directly
        bpe.select("doc_id", F.size("tokens").alias("bpe_tokens"))
        .join(uni.select("doc_id", F.col("n_tokens").alias("uni_tokens")), "doc_id")
        .join(chars, "doc_id", "left")
        .join(batch.select("doc_id", "lang"), "doc_id")
    )
    fert = both.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.expr(
            "sum(coalesce(n_chars, 0)) * 1000"
            " DIV greatest(sum(bpe_tokens), 1)"
        ).alias("bpe_cpt_milli"),
        F.expr(
            "sum(coalesce(n_chars, 0)) * 1000"
            " DIV greatest(sum(uni_tokens), 1)"
        ).alias("uni_cpt_milli"),
    )
    rows = {r["lang"]: r for r in fert.collect()}
    stats["langs"] = len(rows)
    for lang in sorted(rows):
        r = rows[lang]
        report(
            f"lang={lang}: docs={r['n_docs']} chars/token "
            f"bpe={r['bpe_cpt_milli'] / 1000:.3f} "
            f"unigram={r['uni_cpt_milli'] / 1000:.3f}"
        )
    totals = both.agg(
        F.sum("bpe_tokens").alias("b"), F.sum("uni_tokens").alias("u")
    ).first()
    stats["bpe_tokens"], stats["uni_tokens"] = int(totals["b"]), int(totals["u"])
    report(
        f"batch totals: bpe={stats['bpe_tokens']} tokens, "
        f"unigram={stats['uni_tokens']} tokens"
    )
    return stats


if __name__ == "__main__":
    from eventkit_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    run(get_spark("tokenizer_training"), sf)
