"""Interleaved A/B for the size-conditional shared-subtree boundary
(r11 VERDICT item 4 evidence): at an inflated super-SF corpus, time the
duplicated-subtree trio (dedup_jaccard-shape, containment-shape,
winnow_overlap) with the boundary OFF and FORCED ON, alternating arms
inside ONE session so the sandbox's machine-period swings cancel
(OPTIMIZATION_r11 "health warning").

Usage: python scripts/boundary_ab.py [N] [rounds]
  N       replica factor over sf0.1 (default 20; the corpus is built by
          scripts/scale_smoke.build_scaled and reused)
  rounds  A/B alternations per query (default 3)

The boundary knob is flipped via SPARK_GRAFT_SUBTREE_MATERIALIZE, which
`materialize_threshold()` reads at query-construction time: "0" forces
the boundary on, a huge value forces it off. Also prints the DEFAULT
decision for the scaled corpus (whether 64 MiB would engage), so the
default threshold is justified by measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    out_dir = f"/tmp/eventkit_scale_x{n}"

    from eventkit_spark.session import get_spark
    from scripts.scale_smoke import build_scaled

    spark = get_spark("boundary-ab")
    if not os.path.exists(f"{out_dir}/documents.parquet/_SUCCESS"):
        build_scaled(spark, "/root/testdata/sf0.1", n, out_dir)
    docs = spark.read.parquet(f"{out_dir}/documents.parquet")
    spark.range(1000).selectExpr("sum(id)").collect()

    from eventkit_spark.llm._spread import materialize_threshold, source_bytes
    from eventkit_spark.llm.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )
    from eventkit_spark.llm.text import winnow_overlap

    print(json.dumps({
        "scale": n,
        "docs_source_bytes": source_bytes(docs),
        "default_threshold": materialize_threshold(),
        "default_engages": (source_bytes(docs) or 0) >= materialize_threshold(),
    }), flush=True)

    builders = {
        "dedup_jaccard_x": lambda: ngram_jaccard_pairs(
            docs, k=3, threshold=0.3, max_df=64),
        "containment_x": lambda: ngram_containment_pairs(
            docs, k=3, threshold=0.4, max_df=64),
        "winnow_overlap_x": lambda: winnow_overlap(
            docs.filter(F.col("doc_id") % 2 == 0),
            docs.filter(F.col("doc_id") % 2 == 1),
            k=5, w=4, max_df=1000),
    }

    key = "SPARK_GRAFT_SUBTREE_MATERIALIZE"
    times: dict[str, dict[str, list[float]]] = {
        q: {"off": [], "on": []} for q in builders
    }
    for r in range(rounds):
        for qname, mk in builders.items():
            for arm, knob in (("off", str(1 << 50)), ("on", "0")):
                os.environ[key] = knob
                try:
                    spark.sparkContext.setJobDescription(
                        f"boundary_ab:{qname}:{arm}#{r}")
                    t0 = time.perf_counter()
                    mk().write.mode("overwrite").format("noop").save()
                    times[qname][arm].append(
                        round(time.perf_counter() - t0, 3))
                finally:
                    del os.environ[key]
            spark.sparkContext.setJobDescription(None)
        print(json.dumps({"round": r, "times": times}), flush=True)
    summary = {
        q: {a: {"min": min(v), "all": v} for a, v in arms.items()}
        for q, arms in times.items()
    }
    print(json.dumps({"scale": n, "summary": summary}), flush=True)


if __name__ == "__main__":
    main()
