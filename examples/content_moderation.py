"""Corpus moderation / policy-tagging pipeline on eventkit_spark.

The standard pre-training content gate, composed from the engine's
text operators: unicode normalization (so blocklists can't be dodged
with decomposed accents or width variants) -> single-term blocklist
tagging (one broadcast dim, one scan) -> multi-word phrase blocklist
(one scan for the WHOLE phrase list via the anchor aggregate) ->
drop / keep verdicts -> a per-column profile of the surviving corpus.

Every stage is the same code the driver contracts verify one-by-one
(normalize_text, keyword_hits, phrase_hits, profile).

Run:  python examples/content_moderation.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

# toy policy lists over the synthetic corpus vocabulary — swap for a
# real taxonomy table (keyword_hits/phrase_hits also accept DataFrames)
BLOCK_TERMS = ["vector", "stream"]
BLOCK_PHRASES = ["table table", "fast table"]


def run(spark, sf_dir: str, report=print) -> dict:
    from eventkit_spark.llm.text import blocklist_verdicts, normalize_text
    from eventkit_spark.plans.audit import profile_table
    from eventkit_spark.sources.tables import load_table

    stats = {}
    docs = load_table(spark, sf_dir, "documents")
    stats["input"] = docs.count()
    report(f"input docs: {stats['input']}")

    # 1. canonical byte form first: NFC + whitespace collapse, so the
    # term/phrase matchers below see one representation of the text
    clean = normalize_text(docs, form="NFKC")
    docs = docs.drop("text").join(clean, "doc_id")

    # 2+3. both blocklists in ONE corpus scan: terms and phrases ride a
    # unified broadcast dim through the anchor-vote aggregate
    # (blocklist_verdicts == keyword_hits + phrase_hits per doc,
    # without planning the text scan twice)
    flags = blocklist_verdicts(docs, BLOCK_TERMS, BLOCK_PHRASES)

    verdicts = (
        docs.select("doc_id")
        .join(flags, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("term_hits", F.lit(0)).alias("term_hits"),
            F.coalesce("phrase_hits", F.lit(0)).alias("phrase_hits"),
        )
        .withColumn(
            "keep", (F.col("term_hits") == 0) & (F.col("phrase_hits") == 0)
        )
    )
    stats["flagged_terms"] = verdicts.filter(F.col("term_hits") > 0).count()
    stats["flagged_phrases"] = verdicts.filter(F.col("phrase_hits") > 0).count()
    report(
        f"flagged: {stats['flagged_terms']} by terms, "
        f"{stats['flagged_phrases']} by phrases"
    )

    kept = docs.join(verdicts.filter("keep").select("doc_id"), "doc_id")
    stats["kept"] = kept.count()
    report(f"kept docs: {stats['kept']}")

    # 4. profile the survivors — the first query anyone runs on the
    # gated corpus before committing it downstream
    prof = {r["column"]: r for r in profile_table(kept).collect()}
    stats["profiled_columns"] = len(prof)
    report(f"profiled {stats['profiled_columns']} columns; "
           f"text n_null={prof['text']['n_null']}")
    return stats


if __name__ == "__main__":
    from eventkit_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    run(get_spark("content_moderation"), sf)
