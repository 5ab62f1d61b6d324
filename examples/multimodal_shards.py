"""Multimodal shard pipeline: WebDataset tars in, features + clean
shards out — the compose story for the engine's multimodal lane.

Stages, every one an operator the driver contracts verify separately:

1. ``write_webdataset`` / ``load_webdataset``: tar shards <-> (shard,
   key, parts) samples, one kernel task per shard, zero read shuffle
   (sources/formats.py).
2. Typed projection: the ``parts`` map -> text / image-bytes columns.
3. Text-side curation: exact dedup on the caption text (llm/dedup) —
   representatives join back to keep full samples.
4. Feature extraction on the binary part: ``image_features``
   (llm/multimodal — decode is the deterministic stub; the container
   has no codecs, but the Spark plumbing is the real path).
5. Re-shard the survivors with ``write_webdataset``.

Run:  python examples/multimodal_shards.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def run(spark, sf_dir: str, out_dir: str, report=print) -> dict:
    from eventkit_spark.llm.dedup import exact_dedup
    from eventkit_spark.llm.multimodal import image_features
    from eventkit_spark.sources.formats import load_webdataset, write_webdataset
    from eventkit_spark.sources.tables import load_table

    stats: dict = {}

    # --- build the input shards from the documents table (stand-in for
    # a crawler's output): caption text + a fake image payload per doc
    # (utf8 text bytes — the same deterministic stand-in the multimodal
    # contracts use)
    docs = load_table(spark, sf_dir, "documents")
    samples = docs.select(
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("key"),
        F.create_map(
            F.lit("txt"), F.encode(F.col("text"), "UTF-8"),
            F.lit("img"), F.encode(F.col("text"), "UTF-8"),
        ).alias("parts"),
    )
    src = os.path.join(out_dir, "in")
    manifest = write_webdataset(samples, src, samples_per_shard=100).collect()
    stats["in_shards"] = len(manifest)
    report("input shards:", stats["in_shards"])

    # --- 1-2. read back and project typed columns
    wds = load_webdataset(spark, src)
    typed = wds.select(
        "key",
        F.decode(F.element_at("parts", F.lit("txt")), "UTF-8").alias("text"),
        F.element_at("parts", F.lit("img")).alias("img"),
        "parts",
    )

    # --- 3. caption dedup: representatives (min key per exact text)
    # join back to keep whole samples
    reps = exact_dedup(typed, text_col="text", id_col="key").select("key")
    kept = typed.join(reps, "key")
    stats["after_dedup"] = kept.count()
    report("samples after exact dedup:", stats["after_dedup"])

    # --- 4. image features over the binary part (stubbed decode): the
    # media-table shape the feature kernels take everywhere
    media = kept.select(
        F.col("key").cast("long").alias("asset_id"),
        F.col("img").alias("payload"),
        F.struct(
            F.lit("image/png").alias("media_type"),
            (F.length("text") % 640 + 16).cast("int").alias("width"),
            (F.length("text") % 480 + 16).cast("int").alias("height"),
            F.length("img").cast("int").alias("n_bytes"),
        ).alias("meta"),
    )
    feats = image_features(media)
    stats["feature_rows"] = feats.count()
    report("feature rows:", stats["feature_rows"])

    # --- 5. re-shard survivors
    out = write_webdataset(
        kept.select("key", "parts"), os.path.join(out_dir, "clean"),
        samples_per_shard=100,
    ).collect()
    stats["out_samples"] = sum(m["n_samples"] for m in out)
    report("re-sharded samples:", stats["out_samples"])
    return stats


if __name__ == "__main__":
    from eventkit_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/eventkit_mm_shards"
    run(get_spark("multimodal-shards"), sf, out)
