"""End-to-end training-data curation pipeline on eventkit_spark.

The full public-recipe chain (C4/Gopher cleaning -> PII redaction ->
exact + fuzzy dedup -> component-keyed leak-safe split ->
decontamination -> learned quality filter -> source temperature
mixing -> DSIR target selection -> per-source token budgets +
stupid-backoff novelty diagnostic -> sequence packing -> seeded
train-order shuffle -> size-targeted partitioned export),
composed purely from the engine's operators — every stage is the same
code the driver contracts verify one-by-one.

Run:  python examples/curation_pipeline.py [sf_dir] [out_dir]
Each stage prints its surviving row count; the result is a partitioned
parquet dataset ready for a shard loader.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def run(spark, sf_dir: str, out_dir: str, report=print) -> dict:
    from eventkit_spark.llm.dedup import contamination, exact_dedup, fuzzy_dedup
    from eventkit_spark.llm.sampling import (
        dedup_safe_split,
        dsir_logratio,
        pack_sequences,
        temperature_mix,
        train_order,
    )
    from eventkit_spark.llm.text import c4_filters, linear_quality_classifier, redact_pii
    from eventkit_spark.sources.sinks import write_dataset
    from eventkit_spark.sources.tables import load_table

    stats = {}

    def stage(name, df):
        n = df.count()
        stats[name] = n
        report(f"  {name}: {n} docs")
        return df

    docs = stage("load", load_table(spark, sf_dir, "documents"))

    # 1. heuristic cleaning: the C4 DOC-level rules (lorem-ipsum /
    # brace drops; the synthetic corpus has no terminal punctuation, so
    # the line rules would empty every doc — keep original text and
    # semi-join the survivors)
    survivors = c4_filters(docs, min_kept_lines=0).select("doc_id")
    clean = stage("c4_clean", docs.join(survivors, "doc_id", "left_semi").select(
        "doc_id", "lang", "source", "text"
    ))

    # 2. PII scrub (pure projection; redact_pii returns scrub counts +
    # text — carry lang/source back alongside)
    meta = clean.select("doc_id", "lang", "source")
    clean = redact_pii(clean).select("doc_id", "text").join(meta, "doc_id")

    # 3. exact dedup: keep the lowest-id representative of each text
    keep_exact = exact_dedup(clean).select("doc_id")
    clean = stage("exact_dedup", clean.join(keep_exact, "doc_id", "left_semi"))

    # 4. fuzzy dedup: minhash candidates -> exact jaccard verify ->
    # components -> keep-list
    fz = fuzzy_dedup(clean, threshold=0.5)
    keep_fuzzy = fz.filter(F.col("keep")).select("doc_id")
    clean = stage("fuzzy_dedup", clean.join(keep_fuzzy, "doc_id", "left_semi"))

    # 5. leak-safe split KEYED BY THE NEAR-DUP COMPONENT (reusing the
    # fuzzy-dedup cluster labels already computed): a doc-id-keyed
    # split lets a paraphrase of a train doc land in test; the
    # component key makes that impossible by construction. Then drop
    # train docs contaminated against the test split anyway (exact
    # k-gram decontamination catches sub-document leaks the near-dup
    # graph doesn't model).
    split = clean.join(
        dedup_safe_split(clean, clusters=fz).select("doc_id", "split"),
        "doc_id",
    )
    train = split.filter(F.col("split") == "train")
    test = split.filter(F.col("split") == "test")
    dirty = contamination(train, test, k=5, min_overlap=1).select("doc_id")
    train = stage("decontaminated", train.join(dirty, "doc_id", "left_anti"))

    # 6. learned quality filter (fastText-style linear head over
    # hash-embed features; weights would come from a trained model —
    # here the driver contract's fixed demo head)
    import __spark_entry__ as entry

    scored = linear_quality_classifier(
        train, weights=entry._LQC_WEIGHTS, bias=0.1, threshold=0.3
    )
    train = stage(
        "quality_filtered",
        train.join(scored.filter(F.col("keep")).select("doc_id"), "doc_id", "left_semi"),
    )

    # 7. source temperature mixing (alpha<1 upweights small sources)
    mixed = stage(
        "temperature_mix",
        temperature_mix(
            train,
            total=min(300, stats["quality_filtered"]),
            key_col="doc_id",
            alpha=0.7,
        ),
    )

    # 8. DSIR: score the mix against the held-out target distribution,
    # keep the target-like half
    w = dsir_logratio(mixed, test, buckets=256)
    med = w.approxQuantile("logw", [0.5], 0.0)[0]
    sel = stage(
        "dsir_selected",
        mixed.join(w.filter(F.col("logw") >= med).select("doc_id"), "doc_id", "left_semi"),
    )

    # 9. per-source TOKEN budgets (r9): training mixes are specified in
    # tokens, not documents — cap every source's hash-prefix at a token
    # budget so no domain exceeds its share regardless of doc lengths
    from eventkit_spark.llm.sampling import token_quota

    sel = stage("token_quota", token_quota(sel, 2000, "doc_id"))

    # diagnostics (r9): trigram stupid-backoff novelty of the selection
    # vs the held-out target — a high mean backoff rate means the
    # selected mix is lexically far from the target distribution
    from eventkit_spark.llm.text import stupid_backoff_logprob

    sb = stupid_backoff_logprob(sel, ref=test)
    row = sb.agg(
        F.avg("bo_ppm").alias("bo"), F.avg("avg_logprob").alias("lp")
    ).first()
    stats["novelty_bo_ppm"] = int(row["bo"] or 0)
    report(
        f"  novelty vs target: mean backoff {stats['novelty_bo_ppm']} ppm, "
        f"mean logprob {row['lp']}"
    )

    # 10. pack into fixed token budgets, stamp a seeded global train order
    packed = pack_sequences(sel, budget=512)
    ordered = train_order(packed, key_col="doc_id", seed=7)
    final = sel.join(
        ordered.select("doc_id", "pack_no", "rank"), "doc_id"
    ).select("doc_id", "lang", "source", "text", "pack_no", "rank")

    # 11. size-targeted partitioned export
    plan = write_dataset(final, out_dir, partition_by=("lang",), target_mb=64)
    stats["written"] = spark.read.parquet(out_dir).count()
    report(f"  written: {stats['written']} docs -> {out_dir} ({plan})")
    return stats


if __name__ == "__main__":
    from eventkit_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated_dataset"
    print(f"curation pipeline over {sf}:")
    run(get_spark("curation-example"), sf, out)
