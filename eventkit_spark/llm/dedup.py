"""Deduplication operators over document tables.

Scale design notes (the whole point of these):
- exact_dedup: one hash aggregate on the text hash — the canonical
  100 TB dedup first pass. Never groups on raw text at scale; a 128-bit
  hash collides ~never and shuffles 16 bytes instead of documents.
- ngram_jaccard_pairs: exact pairwise Jaccard via shingle inverted index
  (explode -> self-join on shingle -> count). Quadratic in the worst
  case; use it as the verify stage AFTER candidate generation, or on
  bounded corpora. The driver's correctness oracle runs it exactly.
- minhash_lsh_candidates: the scale path. P minhash values per doc
  (JVM-side xxhash64 over the shingle array), grouped into bands;
  candidate pairs share any band bucket. Shuffle cost is O(docs * bands),
  each row a few longs; skew-safe because bucket ids are hashes.
- simhash64: 64-bit fingerprint via vectorized pandas UDF (numpy
  bit-count matrix); near-dup = hamming distance <= k, found by pivoting
  on 4 16-bit chunks (any exact-match chunk => candidate, k<=3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from ..session import session_width
from ._spread import boundary_if_large


def _shingles(text_col, k: int = 3):
    """Word k-grams as an array column, via ONE regex pass.

    A lookahead capture at every word start extracts overlapping k-grams
    in a single codegen'd regexp_extract_all — the equivalent
    sequence+slice+concat_ws higher-order chain runs interpreted
    (HOFs have no whole-stage codegen) and measured ~10x slower.
    Whitespace is canonicalized first so shingles are single-spaced.
    May contain duplicates; consumers that need set semantics
    de-duplicate downstream (min-aggregates don't care).
    """
    norm = F.regexp_replace(F.lower(F.trim(text_col)), r"\s+", " ")
    pattern = "(?=(" + r"\S+" + (r" \S+" * (k - 1)) + r"))\S+"
    grams = F.regexp_extract_all(norm, F.lit(pattern), 1)
    return F.when(F.size(grams) > 0, grams).otherwise(F.array(norm))


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id representative of each exact-duplicate group.

    Returns (doc_id, n_dups): one row per distinct text, doc_id = min id,
    n_dups = group size. Groups on xxhash64+md5 of the text, not the text
    itself, so the shuffle carries hashes (constant width) at 100 TB.
    """
    h = F.xxhash64(F.col(text_col))
    h2 = F.md5(F.col(text_col))  # belt & braces vs 64-bit collisions
    return (
        docs.groupBy(h.alias("__h"), h2.alias("__h2"))
        .agg(
            F.min(id_col).alias(id_col),
            F.count("*").alias("n_dups"),
        )
        .drop("__h", "__h2")
    )


def exact_dedup_store_init(
    docs: DataFrame,
    store_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Initialize a PERSISTED exact-dedup fingerprint store from a seed
    corpus: one (xxhash64, md5) row per distinct text (the exact_dedup
    hash pair — 64-bit + 128-bit, so the store carries constant-width
    fingerprints, never text). The store is the cross-batch state of
    ``exact_dedup_incremental`` — the nightly-ingest lifecycle where
    each new crawl slice dedups against everything already accepted."""
    h = F.xxhash64(F.col(text_col)).alias("h")
    h2 = F.md5(F.col(text_col)).alias("h2")
    docs.select(h, h2).distinct().write.mode("overwrite").parquet(
        f"{store_path}/hashes"
    )


def exact_dedup_incremental(
    new_docs: DataFrame,
    store_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Batch-incremental exact dedup: keep the rows of ``new_docs``
    whose text was seen NEITHER in the persisted store NOR earlier in
    this batch (lowest id is the batch's first occurrence), then COMMIT
    the survivors' fingerprints back to the store — the accept-then-
    commit pattern of production ingest (survivors are written before
    the store append, so the returned frame re-reads a stable snapshot
    and a recompute cannot double-filter against its own commit).

    Returns (id_col, n_dups_in_batch) for the surviving rows. Scale
    shape: the batch aggregates to one row per distinct hash (map-side
    combined), the store probe is a LEFT ANTI join on the hash pair
    (the store side is hashes-only, AQE broadcasts it while small,
    shuffles when it outgrows that — both correct), and only survivor
    fingerprints append. No text ever enters an exchange or the store.
    """
    spark = new_docs.sparkSession
    h = F.xxhash64(F.col(text_col)).alias("h")
    h2 = F.md5(F.col(text_col)).alias("h2")
    batch = new_docs.select(h, h2, F.col(id_col)).groupBy("h", "h2").agg(
        F.min(id_col).alias(id_col), F.count("*").alias("n_dups_in_batch")
    )
    from pyspark.errors import AnalysisException

    try:
        store = spark.read.parquet(f"{store_path}/hashes")
        fresh = batch.join(store, ["h", "h2"], "left_anti")
    except AnalysisException as e:
        # ONLY a missing store means "first batch". Any other analysis
        # failure — an empty/corrupt store dir (UNABLE_TO_INFER_SCHEMA),
        # a schema-drifted store breaking the join — must raise:
        # silently treating it as empty would re-accept every duplicate
        # of previously committed text.
        cls = ""
        try:
            cls = e.getErrorClass() or ""
        except Exception:  # noqa: BLE001 — older error objects
            cls = ""
        if "PATH_NOT_FOUND" not in cls and "PATH_NOT_FOUND" not in str(e):
            raise
        fresh = batch
    fresh.write.mode("overwrite").parquet(f"{store_path}/last_batch")
    accepted = spark.read.parquet(f"{store_path}/last_batch")
    accepted.select("h", "h2").write.mode("append").parquet(f"{store_path}/hashes")
    return accepted.select(id_col, "n_dups_in_batch")


def ngram_jaccard_pairs(
    docs: DataFrame,
    k: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs above ``threshold``.

    Inverted-index join: explode distinct shingles, self-join on shingle,
    |A∩B| = joined count, |A∪B| = |A|+|B|-|A∩B|. Emits (id_a, id_b,
    jaccard) with id_a < id_b. This is the exact verify stage; generate
    candidates with minhash_lsh_candidates first at scale.

    ``max_df`` caps posting-list fan-out: shingles appearing in more than
    ``max_df`` documents (boilerplate) are dropped BEFORE the self-join,
    so one hot shingle can't make the join quadratic in corpus size —
    standard df-pruning. Note document shingle-set sizes are computed
    before pruning, so a surviving pair's jaccard is computed over
    slightly understated intersections (pruned shingles count toward the
    union, not the intersection) — i.e. pruning can only lower a pair's
    score, never promote a non-pair. Pick max_df >> expected duplicate
    group size so true near-dup pairs keep their discriminative shingles.
    """
    inter = _pair_counts(docs, k, text_col, id_col, max_df)
    return (
        inter.withColumn(
            "jaccard", F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _pair_counts(docs, k, text_col, id_col, max_df):
    """Shared posting-list core: (id_a, id_b, na, nb, common) for every
    document pair sharing >=1 (surviving) shingle — the intersection
    table jaccard/containment scores are pure arithmetic over.
    """
    from pyspark.sql import Window as W

    # Posting-list formulation: shingle the corpus ONCE (the regex pass
    # over document text is the expensive part — the naive a⋈b self-join
    # plans SIX copies of the scan+shingle subtree with no exchange
    # reuse), carry per-doc set sizes and per-shingle document frequency
    # as windows over the same exchanges, then expand pairs from each
    # shingle's sorted posting list. The shuffles carry 64-bit hashes,
    # not shingle strings (collision odds over n shingles ~ n^2/2^64).
    sh = docs.select(
        F.col(id_col).alias("id"),
        F.explode(_shingles(F.col(text_col), k)).alias("__s"),
    ).select("id", F.xxhash64("__s").alias("shingle")).distinct()
    # set sizes BEFORE df-pruning (pruning can then only lower a pair's
    # score, never promote a non-pair): one window riding an id exchange
    sh = sh.withColumn("n", F.count("*").over(W.partitionBy("id")))
    if max_df is not None:
        # sh feeds BOTH the hot-set aggregate and the anti-join probe
        # side, so the scan+shingle subtree is planned twice. r11
        # measured an UNCONDITIONAL localCheckpoint here 3x slower on
        # pagerank/central_dedup (1.5 s -> 4.8 s) and ~15% slower on
        # dedup_jaccard: at sub-MB corpus sizes the duplicated legs
        # execute as PARALLEL stages of one job, while a checkpoint
        # serializes them and strips size statistics. At corpus scale
        # the re-executed leg re-pays corpus-scale shuffles and the
        # trade flips (the jaccard_verify precedent wins ~30%), so the
        # boundary is SIZE-CONDITIONAL (r11 VERDICT item 4): it engages
        # only above the _spread.materialize_threshold() source size.
        sh = boundary_if_large(sh, docs)
        # df-pruning BOUNDS every collect_list at max_df entries. The
        # guard must not itself shuffle on the hot key: a count WINDOW
        # over the shingle put every copy of a boilerplate shingle into
        # one un-splittable window task before dropping it. Instead,
        # aggregate the hot set (map-side partial combine collapses hot
        # shingles per input partition; output = only the shingles OVER
        # the cap, a tiny table) and anti-join it — AQE broadcasts the
        # hot table, so hot rows drop map-side with no hot-key exchange.
        hot = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") > max_df)
            .select("shingle")
        )
        sh = sh.join(hot, "shingle", "left_anti")
    posts = (
        sh.groupBy("shingle")
        .agg(F.array_sort(F.collect_list(F.struct("id", "n"))).alias("lst"))
        .filter(F.size("lst") >= 2)
    )
    # expand each posting list to its (i < j) pairs — O(sum df^2), the
    # same pair multiset the self-join produced, without the second
    # (third, …) shingle pass
    lst = F.col("lst")
    pairs = F.flatten(
        F.transform(
            lst,
            lambda x, i: F.transform(
                F.slice(lst, i + 2, F.greatest(F.size(lst), F.lit(1))),
                lambda y: F.struct(
                    x.getField("id").alias("id_a"),
                    x.getField("n").alias("na"),
                    y.getField("id").alias("id_b"),
                    y.getField("n").alias("nb"),
                ),
            ),
        )
    )
    return (
        posts.select(F.explode(pairs).alias("p"))
        .groupBy("p.id_a", "p.id_b", "p.na", "p.nb")
        .agg(F.count("*").alias("common"))
    )


def ngram_containment_pairs(
    docs: DataFrame,
    k: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = None,
) -> DataFrame:
    """Asymmetric n-gram CONTAINMENT pairs (Broder 1997's containment
    coefficient): c(A in B) = |A∩B| / |A|.

    Catches what Jaccard structurally can't: a short document embedded
    verbatim in a much longer one scores containment ~1 while its
    Jaccard ~|A|/|B| vanishes — the quote/boilerplate/subset-dup case
    in pretraining corpora. Emits (id_a, id_b, cont_ab, cont_ba) with
    id_a < id_b for pairs where EITHER direction crosses ``threshold``
    (both directions reported, rounded to 6 before the cut so engines
    agree at the boundary).

    Same posting-list plan as ``ngram_jaccard_pairs`` (shared core):
    one shingle scan, df-pruning via ``max_df`` (prune only LOWERS
    containment — set sizes are pre-prune), pair exchange carries
    hashes + counts only.
    """
    inter = _pair_counts(docs, k, text_col, id_col, max_df)
    out = inter.select(
        "id_a",
        "id_b",
        F.round(F.col("common") / F.col("na"), 6).alias("cont_ab"),
        F.round(F.col("common") / F.col("nb"), 6).alias("cont_ba"),
    )
    return out.filter(
        (F.col("cont_ab") >= threshold) | (F.col("cont_ba") >= threshold)
    )


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 32,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = False,
) -> DataFrame:
    """(id, array<long> minhash signature). Hash family:
    xxhash64(shingle, seed_i) — JVM-side, no UDF (default), or the
    engine-portable universal family with ``portable=True``.

    Formulated as explode + num_hashes min-aggregates rather than
    higher-order array functions: HOFs run interpreted (no whole-stage
    codegen) and were ~10x slower; hash-aggregate gets codegen and
    map-side partial aggregation, so the shuffle carries one row per doc.
    """
    mh = _minhash_cols(docs, num_hashes, k, text_col, id_col, portable)
    sig = F.array(*[F.col(f"__m{i}") for i in range(num_hashes)])
    return mh.select("id", sig.alias("signature"))


# portable universal-hash family over a 31-bit shingle fold:
# h_i = (A_i * h + B_i) mod P with P = 2^31 - 1 — every product fits
# int64, the same arithmetic in ANSI SQL (the dedup_simhash trick
# applied to minhash, which is what gives dedup_minhash a full oracle)
_MH_P = (1 << 31) - 1
_MH_A = [(2654435761 * (i + 1)) % _MH_P for i in range(64)]
_MH_B = [(2246822519 * (i + 1)) % _MH_P for i in range(64)]


def _minhash_cols(docs, num_hashes, k, text_col, id_col, portable=False):
    exploded = docs.select(
        F.col(id_col).alias("id"),
        F.explode(_shingles(F.col(text_col), k)).alias("__sh"),
    )
    if portable:
        # md5 is built into BOTH engines (identical by definition) and
        # codegen'd JVM-side: fold the first 60 md5 bits to 31 via a
        # hex->long conv — no interpreted per-char HOF, so no vocab
        # distinct + broadcast join to amortize it (the r4 form's extra
        # exchange put dedup_minhash at 1.8x its r1 cost; this rewrite
        # makes the portable family a pure per-row projection like the
        # xxhash64 production path)
        sh_fold = (
            F.conv(F.substring(F.md5(F.col("__sh")), 1, 15), 16, 10).cast("long")
            % F.lit(1 << 31)
        )
        hashed = exploded.select("id", sh_fold.alias("__sh64"))
        mins = [
            F.min(
                (F.lit(_MH_A[i]) * F.col("__sh64") + F.lit(_MH_B[i])) % F.lit(_MH_P)
            ).alias(f"__m{i}")
            for i in range(num_hashes)
        ]
    else:
        hashed = exploded.select("id", F.xxhash64("__sh").alias("__sh64"))
        mins = [
            F.min(F.xxhash64("__sh64", F.lit(i))).alias(f"__m{i}")
            for i in range(num_hashes)
        ]
    return hashed.groupBy("id").agg(*mins)


def _band_buckets(docs, num_hashes, bands, k, text_col, id_col, portable=False):
    """(id, band, bucket) LSH banding rows: bucket = xxhash64 of the
    band's ``r = num_hashes/bands`` concatenated minhashes, so two docs
    land in the same (band, bucket) iff that band's signatures agree
    (modulo negligible 64-bit collisions). Shared by the pair expander
    (``minhash_lsh_candidates``) and the persisted incremental store
    (``minhash_store_init`` / ``minhash_dedup_incremental``)."""
    r = num_hashes // bands
    mh = _minhash_cols(docs, num_hashes, k, text_col, id_col, portable)
    return mh.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(",", *[F.col(f"__m{b * r + j}") for j in range(r)])
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")


def minhash_store_init(
    docs: DataFrame,
    store_path: str,
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = False,
) -> None:
    """Initialize a PERSISTED MinHash/LSH bucket store from a seed
    corpus — the cross-batch state of ``minhash_dedup_incremental``
    (the near-dup sibling of ``exact_dedup_store_init``): the
    nightly-crawl lifecycle where each new slice near-dedups against
    everything already accepted WITHOUT rescanning the accepted corpus.

    The store carries only DISTINCT ``(band, bucket)`` rows (two 64-bit
    ints per occupied bucket, never text or signatures), written
    partitioned by band, plus a one-row ``meta`` table pinning the hash
    family parameters — an incremental probe with mismatched params
    would compare garbage, so probes read the params from the store
    rather than trusting the caller to repeat them.
    """
    banded = _band_buckets(docs, num_hashes, bands, k, text_col, id_col, portable)
    banded.select("band", "bucket").distinct().write.mode("overwrite").partitionBy(
        "band"
    ).parquet(f"{store_path}/buckets")
    meta = docs.sparkSession.createDataFrame(
        [(num_hashes, bands, k, bool(portable))],
        "num_hashes int, bands int, k int, portable boolean",
    )
    meta.write.mode("overwrite").parquet(f"{store_path}/meta")


def minhash_dedup_incremental(
    new_docs: DataFrame,
    store_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    commit: bool = True,
) -> DataFrame:
    """Batch-incremental NEAR-dup dedup against a persisted LSH store
    (init with ``minhash_store_init``). Returns one row per batch doc:
    ``(id_col, status)`` with status

    - ``dup_store``: some band bucket of the doc is already occupied in
      the store — a near-dup of a previously accepted doc (LSH
      candidate semantics: same recall/precision contract as
      ``minhash_lsh_candidates``; run ``jaccard_verify`` over kept
      pairs downstream if exact verification is required).
    - ``dup_batch``: store-clean, but some bucket holds a SMALLER
      store-clean batch id — the bucket-min rule: each bucket admits
      only its minimum store-clean id, so a doc survives iff it is the
      min in EVERY bucket it occupies. Deterministic and one-pass
      (order-free), at the cost of over-dropping on bucket chains
      a~b~c — the same transitive-collapse direction ``dedup_clusters``
      applies deliberately.
    - ``kept``: accepted; its buckets are COMMITTED back to the store.

    Accept-then-commit: statuses are materialized to
    ``{store}/last_batch`` BEFORE the survivors' buckets append, and
    the returned frame re-reads that snapshot — a recompute of the
    result cannot double-filter against its own commit (the
    ``exact_dedup_incremental`` pattern).

    ``commit=False`` is the DRY-RUN probe (r11, the
    ``simhash_dedup_incremental`` shape — r10 VERDICT item 3): same
    statuses, store untouched — the "what would tonight's dedup drop"
    preview, and the form repeated benchmarks run against one shared
    seed store without mutating it. The dry run skips both parquet
    writes and returns the status frame lazily; the batch band-bucket
    pass is ``localCheckpoint(eager=False)``-ed so the hits /
    bucket-competition / status branches all read ONE banding pass.
    The checkpoint RDD is released by the ContextCleaner when the
    returned frame is GC'd (drop probe-frame references promptly);
    after it materializes, an executor loss fails the in-flight job —
    acceptable for a bounded read-only probe, re-invoke it.

    Scale shape: one shingle+minhash pass over the batch (persisted and
    reused across the probe/competition/commit consumers, then
    unpersisted), store probe is a bucket equi-join (hashes only; AQE
    broadcasts a small store, shuffles a grown one — both correct), the
    bucket-min competition is a map-side-combinable min aggregate plus
    an equi-join AQE skew-splits on pathological buckets, and only
    survivors' distinct buckets append. No text ever enters an exchange
    or the store.
    """
    spark = new_docs.sparkSession
    m = spark.read.parquet(f"{store_path}/meta").first()
    banded = _band_buckets(
        new_docs, m.num_hashes, m.bands, m.k, text_col, id_col, m.portable
    )
    banded = banded.persist() if commit else banded.localCheckpoint(eager=False)
    store = spark.read.parquet(f"{store_path}/buckets").select("band", "bucket")
    hits = (
        banded.join(store, ["band", "bucket"], "left_semi").select("id").distinct()
    )
    clean = banded.join(hits, "id", "left_anti")
    bmin = clean.groupBy("band", "bucket").agg(F.min("id").alias("__minid"))
    batch_dup = (
        clean.join(bmin, ["band", "bucket"])
        .filter(F.col("id") > F.col("__minid"))
        .select("id")
        .distinct()
    )
    res = (
        new_docs.select(F.col(id_col).alias("id"))
        .join(hits.withColumn("__hit", F.lit(1)), "id", "left")
        .join(batch_dup.withColumn("__bdup", F.lit(1)), "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.when(F.col("__hit") == 1, F.lit("dup_store"))
            .when(F.col("__bdup") == 1, F.lit("dup_batch"))
            .otherwise(F.lit("kept"))
            .alias("status"),
        )
    )
    if not commit:
        return res
    res.write.mode("overwrite").parquet(f"{store_path}/last_batch")
    accepted = spark.read.parquet(f"{store_path}/last_batch")
    kept = accepted.filter(F.col("status") == "kept").select(
        F.col(id_col).alias("id")
    )
    (
        banded.join(kept, "id", "left_semi")
        .select("band", "bucket")
        .distinct()
        .write.mode("append")
        .partitionBy("band")
        .parquet(f"{store_path}/buckets")
    )
    banded.unpersist()
    return accepted


def minhash_lsh_candidates(
    docs: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int | None = None,
    portable: bool = False,
) -> DataFrame:
    """Near-dup candidate pairs: docs sharing any LSH band bucket.

    rows-per-band r = num_hashes/bands; candidate iff some band's r
    minhashes all agree. Returns distinct (id_a, id_b), id_a < id_b.
    Verify candidates with ngram_jaccard_pairs or cosine.

    ``max_bucket`` (optional) drops buckets larger than the cap BEFORE
    collecting their posting list — the memory guard for pathological
    duplication (a million-copy document makes a million-entry bucket
    whose quadratic pair output is unpayable anyway; route such groups
    through exact_dedup first, which collapses them in one aggregate).
    Capping trades recall on mega-clusters for bounded executors —
    the same contract as jaccard's ``max_df``.

    ``portable=True`` swaps the xxhash64 family for the universal
    (A*h+B) mod P family over the 31-bit shingle fold — byte-identical
    reproducible in ANSI SQL, which gives ``dedup_minhash`` a FULL
    driver oracle (DuckDB recomputes every signature and band). Same
    banding semantics; only the hash family differs (the dedup_simhash
    pattern).
    """
    banded = _band_buckets(docs, num_hashes, bands, k, text_col, id_col, portable)
    # posting-list pair expansion per (band, bucket): the banded a⋈b
    # self-join planned the shingle + minhash-aggregate pipeline TWICE
    # with no exchange reuse; grouping each bucket once halves the heavy
    # part. Bucket membership ~ near-dup groups + rare hash collisions.
    if max_bucket is not None:
        # oversized buckets drop BEFORE any list is built — via a hot-set
        # aggregate + anti-join, NOT a count window: the window form
        # shuffled every member of the hot bucket into one un-splittable
        # task first (the exact skew the guard exists for); the hot
        # table is tiny and AQE broadcasts it, so hot rows drop map-side
        hot = (
            banded.groupBy("band", "bucket")
            .agg(F.count("*").alias("__bn"))
            .filter(F.col("__bn") > max_bucket)
            .select("band", "bucket")
        )
        banded = banded.join(hot, ["band", "bucket"], "left_anti")
    posts = (
        banded.groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_list("id")).alias("lst"))
        .filter(F.size("lst") >= 2)
    )
    lst = F.col("lst")
    pairs = F.flatten(
        F.transform(
            lst,
            lambda x, i: F.transform(
                F.slice(lst, i + 2, F.greatest(F.size(lst), F.lit(1))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    return (
        posts.select(F.explode(pairs).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )


def _cc_driver_labels(edges, spark, id_type: str):
    """Vectorized driver-side union-find for SMALL edge sets: numpy
    min-label propagation + pointer jumping over index arrays — the
    same algorithm as the distributed loop, collapsed to O(E) numpy
    passes with zero per-round Spark jobs. Returns the (id, cluster)
    labels frame (edge-touched nodes only, like the loop)."""
    import numpy as np
    import pandas as pd

    pdf = edges.toPandas()
    if not len(pdf):
        return spark.createDataFrame([], f"id {id_type}, cluster {id_type}")
    ids = np.unique(pdf["src"].to_numpy())  # symmetrized: src covers all
    s = np.searchsorted(ids, pdf["src"].to_numpy())
    d = np.searchsorted(ids, pdf["dst"].to_numpy())
    label = np.arange(len(ids))
    while True:
        m = label.copy()
        np.minimum.at(m, d, label[s])  # one hop along every edge
        m = m[m]                       # pointer jump (label composition)
        if np.array_equal(m, label):
            break
        label = m
    return spark.createDataFrame(
        pd.DataFrame({"id": ids, "cluster": ids[label]})
    )


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 25,
    on_nonconverged: str = "raise",
    driver_edges_max: int = 2_000_000,
) -> DataFrame:
    """Connected components over near-dup ``pairs`` -> (id, cluster_id).

    cluster_id = the smallest doc id reachable through the pair graph, so
    transitive near-dups (a~b, b~c) land in one cluster even when a and c
    are not directly similar — the standard "keep one per component"
    contract of corpus dedup. Docs in no pair are singletons
    (cluster_id = own id), so the output covers the whole corpus and
    `filter(id == cluster_id)` IS the deduplicated keep-list.

    Pregel-shaped min-label propagation WITH pointer jumping: each round
    does (a) one equi-join (labels ⋈ edges) + min-aggregate — one hop of
    propagation — then (b) a label-table self-join rewriting
    ``cluster -> label(cluster)`` — path compression, the halving step of
    the public two-phase CC algorithms (Kiveris et al.'s star
    contractions compress the same way). A labels-only hop is valid
    because every label IS a reachable node id, so composing two labels
    is still a reachable, smaller id. Rounds drop from O(diameter) to
    O(log diameter): a 1000-hop template chain (boilerplate corpora
    produce exactly these) converges in ~11 rounds, not 1000, and
    ``max_iter=25`` covers diameters past 2^24.

    Convergence is CHECKED, not assumed: exhausting ``max_iter`` with
    labels still moving raises (``on_nonconverged="warn"`` downgrades to
    a warning) — a silently split cluster would poison the keep-list
    downstream (round-2 ADVICE, medium).

    Scale notes: propagation runs ONLY over edge-touched nodes —
    everything else is a singleton by construction, so each round's
    join/aggregate/count is O(|edges|), ~100x less than whole-corpus
    labels at ~1% near-dups. `localCheckpoint` truncates lineage so plan
    size stays constant across rounds; the per-round `count()` is one
    job over that same bounded delta.
    """
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    edges = (
        edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    # SMALL-GRAPH FAST PATH: the checkpoint just materialized the edge
    # set, so its count is free — when the (already LSH-thinned,
    # symmetrized) graph fits ``driver_edges_max`` rows (~32 MB of int
    # pairs at the default), a vectorized driver union-find replaces the
    # whole round loop: identical min-reachable-id labels, no per-round
    # join/checkpoint jobs. Near-dup graphs are pair-table-sized, not
    # corpus-sized (~1% of docs at sane thresholds), so even very large
    # corpora often land here; past the cap the distributed
    # pointer-jumping loop below is the scale path.
    id_type = docs.schema[id_col].dataType.simpleString()
    spark_s = docs.sparkSession
    if edges.count() <= driver_edges_max:
        labels = _cc_driver_labels(edges, spark_s, id_type)
        ids = docs.select(F.col(id_col).alias("id"))
        return ids.join(labels, "id", "left").select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("cluster"), F.col("id")).alias("cluster_id"),
        )
    # init one hop ahead: label(id) = min(id, min neighbor) costs the
    # same single aggregate as a distinct-ids init but starts the loop
    # with round 1 already applied — pair/star clusters (the bulk of
    # near-dup graphs) converge immediately and only pay the confirm
    # round
    labels = (
        edges.groupBy(F.col("src").alias("id"))
        .agg(F.least(F.col("src"), F.min("dst")).alias("cluster"))
        .localCheckpoint()
    )
    ctype = dict(labels.dtypes)["cluster"]
    moving = False
    for _ in range(max_iter):
        prop = edges.join(labels, edges.src == labels.id).select(
            F.col("dst").alias("id"), F.col("cluster")
        )
        # the round's OLD label rides the same min-aggregate as the hop:
        # labels contributes exactly one row per id with __old set (prop
        # rows carry NULL), so min(__old) IS the pre-round label and the
        # convergence compare needs no separate labels join — the r4
        # form paid a third shuffle join per round just to fetch it
        hopped = (
            labels.select("id", "cluster", F.col("cluster").alias("__old"))
            .unionByName(
                prop.withColumn("__old", F.lit(None).cast(ctype))
            )
            .groupBy("id")
            .agg(F.min("cluster").alias("cluster"), F.min("__old").alias("__old"))
        )
        # pointer jump: cluster <- label(cluster). label(x) <= x always,
        # so the left join misses only already-root labels (coalesce);
        # the moved flag compares the POST-jump label against __old and
        # rides the same checkpointed materialization, so the
        # convergence check is a filter-isEmpty over local partitions
        lut = hopped.select(
            F.col("id").alias("__cid"), F.col("cluster").alias("__cc")
        )
        stepped = F.coalesce(F.col("__cc"), F.col("cluster"))
        new_labels = (
            hopped.join(lut, hopped.cluster == F.col("__cid"), "left")
            .select(
                "id",
                stepped.alias("cluster"),
                (stepped != F.col("__old")).cast("int").alias("__moved"),
            )
            .localCheckpoint()
        )
        # isEmpty (take-1 over checkpointed partitions) instead of a
        # full count: the loop only needs a moved/settled bit
        moving = not new_labels.filter(F.col("__moved") == 1).isEmpty()
        labels = new_labels.select("id", "cluster")
        if not moving:
            break
    if moving:
        changed = new_labels.filter(F.col("__moved") == 1).count()
        msg = (
            f"dedup_clusters did not converge in {max_iter} rounds "
            f"({changed} labels still moving) — clusters would be split; "
            "raise max_iter"
        )
        if on_nonconverged == "warn":
            import warnings

            warnings.warn(msg, RuntimeWarning, stacklevel=2)
        else:
            raise RuntimeError(msg)
    ids = docs.select(F.col(id_col).alias("id"))
    return (
        ids.join(labels, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("cluster"), F.col("id")).alias("cluster_id"),
        )
    )


def _plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's optimizer estimate of the plan's output bytes — free
    (no job; file sources report size from footers). -1 if unavailable."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # noqa: BLE001 — py4j / non-classic sessions
        return -1


#: corpora above this optimizer-estimated size route method="auto" to
#: the bloom form (zero corpus-side exchange); below it the join form's
#: simpler plan wins (no eager bloom-build jobs at operator-construction
#: time). 1 GiB: far below any corpus where the (id, shingle) distinct
#: exchange could hurt, far above every test SF.
AUTO_BLOOM_BYTES = 1 << 30


def contamination(
    docs: DataFrame,
    heldout: DataFrame,
    k: int = 5,
    min_overlap: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    method: str = "auto",
    fpp: float = 1e-4,
    auto_bloom_bytes: int = AUTO_BLOOM_BYTES,
) -> DataFrame:
    """Train/test decontamination: (id, n_shared) for docs sharing at
    least ``min_overlap`` distinct word ``k``-grams with ANY heldout doc.

    ``method="auto"`` (default): picks ``"bloom"`` when Catalyst's free
    size estimate of the corpus plan exceeds ``auto_bloom_bytes`` (or is
    unavailable — at real scale, unknown means big), else ``"join"`` —
    so the default plan never shuffles a 100 TB corpus's shingles, and
    small/test corpora skip the bloom-build jobs. Both forms return
    identical rows.

    ``method="join"``: the heldout shingle set is deduplicated to
    distinct 64-bit hashes and eagerly materialized (localCheckpoint —
    a benchmark/test corpus's hash set is tiny next to training data),
    mirroring the bloom form's eager heldout processing: the RESULT
    plan then carries exactly ONE corpus scan at any size — including
    when train and heldout are filtered splits of the same table, which
    previously planned that table's scan twice (r6 ROADMAP; plan-pinned
    in ``test_contamination_join_single_corpus_scan``). AQE broadcasts
    the checkpointed set and the training scan streams map-side with no
    shuffle of document text (the join carries 8-byte hashes); the
    training side still pays one (id, shingle) ``distinct`` exchange.

    NOT LAZY: like the bloom form, ``method="join"`` (and ``"auto"``
    when it routes there) runs Spark jobs AT CALL TIME — the heldout
    shingle pass executes before this function returns. And
    ``localCheckpoint`` is NOT fault-tolerant: the checkpointed heldout
    set lives in executor block storage, so an executor loss after the
    call invalidates the returned plan (re-call to rebuild). For
    long-running pipelines on preemptible nodes, either set a reliable
    ``spark.sparkContext.setCheckpointDir`` and swap in
    ``checkpoint(eager=True)``, or collect the heldout hashes to a
    broadcast literal when they fit on the driver. The default favors
    the common shape — short decontamination jobs where a re-run is
    cheaper than HDFS checkpoint writes.

    ``method="bloom"``: the 100 TB form. Heldout distinct shingle hashes
    are packed into a Bloom filter sized for ``fpp`` BY A DISTRIBUTED
    bit_or AGGREGATE (per-batch partial blooms OR-merged map-side; the
    driver receives only the packed bitset it must broadcast anyway,
    never the raw hash stream), broadcast, and probed per document with
    a vectorized Arrow UDF over the in-place shingle-hash array — the
    corpus branch is a pure scan with ZERO exchanges. Only the flagged
    residue (true positives + ~fpp of the corpus) enters the exact
    verify join against the distributed heldout hash frame (broadcast
    hint), so the result is IDENTICAL to ``method="join"`` while the
    shuffle is bounded by the contaminated fraction instead of the
    corpus size. Note: constructing the operator runs the sizing count
    and the bloom-build job eagerly (the bitset must exist to ship in
    the probe closure).

    Filter training data with an anti-join on the result. No reference
    analog — standard practice from public LLM-data pipelines (e.g.
    GPT-3 appendix C / Dolma decontamination; bloom prefilters per
    CCNet/Dolma taggers).
    """
    if method == "auto":
        size = _plan_size_bytes(docs)
        method = "bloom" if (size < 0 or size > auto_bloom_bytes) else "join"
    if method == "bloom":
        return _contamination_bloom(docs, heldout, k, min_overlap, text_col, id_col, fpp)
    if method != "join":
        raise ValueError(f"contamination: unknown method {method!r}")
    sh = docs.select(
        F.col(id_col).alias("id"),
        F.explode(_shingles(F.col(text_col), k)).alias("__s"),
    ).select("id", F.xxhash64("__s").alias("shingle")).distinct()
    held = (
        heldout.select(F.explode(_shingles(F.col(text_col), k)).alias("__s"))
        .select(F.xxhash64("__s").alias("shingle"))
        .distinct()
        # eager: the result plan must not re-derive the heldout branch —
        # when heldout is a filtered split of the SAME table as docs,
        # the lazy form planned that table's scan twice
        .localCheckpoint(eager=True)
    )
    return (
        sh.join(held, "shingle")
        .groupBy("id")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_overlap)
        .select(F.col("id").alias(id_col), "n_shared")
    )


_BLOOM_MIX = 0x9E3779B97F4A7C15  # odd golden-ratio constant -> full-period double hashing


def _bloom_build(hashes, fpp: float):
    """Pack 64-bit hashes into a double-hashed Bloom filter.

    Standard sizing: m = -n ln(fpp)/ln(2)^2 bits, k = (m/n) ln(2)
    probes; probe i lands at (h + i * mix(h)) mod m (Kirsch-Mitzenmacher
    double hashing, public construction).
    """
    import math

    import numpy as np

    h = np.asarray(hashes, dtype=np.int64).view(np.uint64)
    n = max(len(h), 1)
    m_bits = max(64, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
    n_probes = max(1, int(round(m_bits / n * math.log(2))))
    words = np.zeros((m_bits + 63) // 64, dtype=np.uint64)
    step = (h * np.uint64(_BLOOM_MIX)) | np.uint64(1)
    for i in range(n_probes):
        idx = (h + np.uint64(i) * step) % np.uint64(m_bits)
        np.bitwise_or.at(
            words, (idx >> np.uint64(6)).astype(np.int64), np.uint64(1) << (idx & np.uint64(63))
        )
    return words, m_bits, n_probes


def _bloom_build_distributed(held, fpp: float):
    """Distributed twin of ``_bloom_build``: ``held`` is a DataFrame of
    distinct 64-bit hashes (column ``shingle``). Each Arrow batch
    computes its probe positions and OR-collapses them to sparse
    (word_idx, word) partials; a map-side-combined ``bit_or`` aggregate
    merges the partials and the driver receives only the packed nonzero
    words — bounded by the bitset it must broadcast anyway, NEVER the
    raw hash stream (the r4 form pulled every heldout hash through
    toPandas, a driver bottleneck once heldout grows with the corpus).
    Same double-hashed format, so the probe kernel is unchanged."""
    import math

    import numpy as np
    import pandas as pd

    n = held.count()
    n_eff = max(n, 1)
    m_bits = max(64, int(math.ceil(-n_eff * math.log(fpp) / (math.log(2) ** 2))))
    n_probes = max(1, int(round(m_bits / n_eff * math.log(2))))
    n_words = (m_bits + 63) // 64

    def part(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            h = pdf["shingle"].to_numpy(dtype="int64").view(np.uint64)
            step = (h * np.uint64(_BLOOM_MIX)) | np.uint64(1)
            idx = np.concatenate(
                [(h + np.uint64(i) * step) % np.uint64(m_bits) for i in range(n_probes)]
            )
            widx = (idx >> np.uint64(6)).astype(np.int64)
            bits = (np.uint64(1) << (idx & np.uint64(63))).view(np.int64)
            agg = (
                pd.DataFrame({"idx": widx, "w": bits})
                .groupby("idx")["w"]
                .agg(lambda s: np.bitwise_or.reduce(s.to_numpy()))
            )
            yield pd.DataFrame({"idx": agg.index.to_numpy(), "w": agg.to_numpy()})

    rows = (
        held.mapInPandas(part, "idx long, w long")
        .groupBy("idx")
        .agg(F.expr("bit_or(w)").alias("w"))
        .collect()
    )
    words = np.zeros(n_words, dtype=np.uint64)
    if rows:
        widx = np.array([r["idx"] for r in rows], dtype=np.int64)
        ws = np.array([r["w"] for r in rows], dtype=np.int64).view(np.uint64)
        words[widx] = ws
    return words, m_bits, n_probes


# Below this many distinct heldout hashes the bloom builds DRIVER-side
# from one collect of the cached hash frame: the raw hashes (8 B each)
# are only ~3x the packed bitset the driver must hold and broadcast
# anyway (~2.4 B/hash at fpp=1e-4), and the distributed OR-merge's two
# extra jobs (mapInPandas partials + bit_or shuffle + collect) cost more
# wall-clock than they save until the heldout set is huge. 20M hashes
# = ~160 MB transient driver memory; real benchmark suites are far
# smaller, web-scale heldouts route to the distributed build.
_DRIVER_BLOOM_MAX_HASHES = 20_000_000


def _contamination_bloom(docs, heldout, k, min_overlap, text_col, id_col, fpp):
    held = (
        heldout.select(F.explode(_shingles(F.col(text_col), k)).alias("__s"))
        .select(F.xxhash64("__s").alias("shingle"))
        .distinct()
        # three consumers read this pipeline — the sizing count, the
        # bloom-build job, and the exact-verify join at action time;
        # persist so the heldout explode+distinct runs ONCE (the sizing
        # count materializes the cache). No explicit unpersist: the
        # result plan holds the cached relation, and the context
        # cleaner drops it when the result is released — the persisted
        # store path (contamination_store_init) is the
        # rescan-never answer for long-lived suites.
        .persist()
    )
    n = held.count()
    if n <= _DRIVER_BLOOM_MAX_HASHES:
        arr = held.toPandas()["shingle"].to_numpy()  # cached: one cheap job
        bloom = _bloom_build(arr, fpp)
    else:
        bloom = _bloom_build_distributed(held, fpp)
    return _bloom_probe(docs, bloom, held, k, min_overlap, text_col, id_col)


def _bloom_probe(docs, bloom_tuple, held_df, k, min_overlap, text_col, id_col):
    """Shared probe kernel: broadcast-bloom map-side prune of the corpus
    (zero exchanges on the corpus branch), then exact verify of the
    flagged residue against the distributed heldout hash frame. Used by
    the in-memory bloom path and the persisted contamination store."""
    import pandas as pd

    spark = docs.sparkSession
    bloom = spark.sparkContext.broadcast(bloom_tuple)

    def _bloom_hits(arrs):
        import numpy as np

        words, m_bits, n_probes = bloom.value
        lens = arrs.map(lambda a: 0 if a is None else len(a)).to_numpy(dtype="int64")
        if lens.sum() == 0:
            return pd.Series(np.zeros(len(arrs), dtype="int32"))
        flat = np.concatenate(
            [np.asarray(a, dtype=np.int64) for a in arrs if a is not None and len(a)]
        ).view(np.uint64)
        step = (flat * np.uint64(_BLOOM_MIX)) | np.uint64(1)
        hit = np.ones(len(flat), dtype=bool)
        for i in range(n_probes):
            idx = (flat + np.uint64(i) * step) % np.uint64(m_bits)
            hit &= (
                (words[(idx >> np.uint64(6)).astype(np.int64)] >> (idx & np.uint64(63)))
                & np.uint64(1)
            ) != 0
        offsets = np.zeros(len(arrs), dtype=np.int64)
        np.cumsum(lens[:-1], out=offsets[1:])
        per_doc = np.add.reduceat(hit.astype(np.int64), np.minimum(offsets, len(flat) - 1))
        per_doc[lens == 0] = 0  # reduceat repeats a neighbor segment for empty ones
        return pd.Series(per_doc.astype("int32"))

    bloom_hits = F.pandas_udf(_bloom_hits, "int")

    # Distinct shingle hashes per doc, in place (no explode, no exchange).
    hashes = F.filter(
        F.array_distinct(F.transform(_shingles(F.col(text_col), k), lambda s: F.xxhash64(s))),
        lambda h: h.isNotNull(),
    )
    flagged = (
        docs.select(F.col(id_col).alias("id"), hashes.alias("__hs"))
        .withColumn("__hits", bloom_hits("__hs"))
        .filter(F.col("__hits") >= min_overlap)
    )
    # Exact verify on the flagged residue: __hs is already distinct, so a
    # broadcast semi-count needs no distinct exchange; the groupBy
    # shuffles only flagged ids. The heldout side stays a DISTRIBUTED
    # frame under a broadcast hint (Spark torrent-broadcasts the small
    # side) — no createDataFrame from a driver-side hash list.
    held_df = F.broadcast(held_df)
    # explode_outer, not explode: an inner explode lets Catalyst infer a
    # size(__hs)>0 constraint and push the WHOLE regex/shingle chain into
    # the scan filter, re-evaluating it for every corpus row. Outer
    # explode keeps the corpus-side cost at exactly one evaluation (the
    # UDF input); the inner join drops the null rows it adds.
    return (
        flagged.select("id", F.explode_outer("__hs").alias("shingle"))
        .join(held_df, "shingle")
        .groupBy("id")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_overlap)
        .select(F.col("id").alias(id_col), "n_shared")
    )


def contamination_store_init(
    heldout: DataFrame,
    store_path: str,
    k: int = 5,
    fpp: float = 0.001,
    text_col: str = "text",
) -> None:
    """Persist the decontamination state of a benchmark/eval suite so
    every future crawl batch probes it WITHOUT rescanning the suite —
    the decontamination member of the persisted-store lifecycle family
    (``exact_dedup_store_init`` / ``minhash_store_init`` /
    ``ivf_index_build``):

    - ``hashes/``: the suite's distinct 64-bit k-gram hashes (the exact
      verify set — constant-width, never text),
    - ``bloom/``: the packed bloom words as sparse (idx, word) rows,
      built distributively FROM the persisted hashes so bloom and exact
      set are the same snapshot,
    - ``meta/``: (k, fpp, m_bits, n_probes) pinning the probe params.
    """
    import numpy as np

    spark = heldout.sparkSession
    (
        heldout.select(F.explode(_shingles(F.col(text_col), k)).alias("__s"))
        .select(F.xxhash64("__s").alias("shingle"))
        .distinct()
        .write.mode("overwrite")
        .parquet(f"{store_path}/hashes")
    )
    held = spark.read.parquet(f"{store_path}/hashes")
    words, m_bits, n_probes = _bloom_build_distributed(held, fpp)
    nz = np.flatnonzero(words)
    signed = words.view(np.int64)
    spark.createDataFrame(
        [(int(i), int(signed[i])) for i in nz] or [(0, 0)], "idx long, w long"
    ).write.mode("overwrite").parquet(f"{store_path}/bloom")
    spark.createDataFrame(
        [(int(k), float(fpp), int(m_bits), int(n_probes))],
        "k int, fpp double, m_bits long, n_probes int",
    ).write.mode("overwrite").parquet(f"{store_path}/meta")


def decontaminate_incremental(
    docs: DataFrame,
    store_path: str,
    min_overlap: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Probe a persisted contamination store (init with
    ``contamination_store_init``): load the packed bloom words (driver
    read bounded by the FIXED bloom size chosen at init — the bitset
    must live in the broadcast anyway), broadcast, map-side prune the
    corpus with zero exchanges, then exact-verify the flagged residue
    against the PERSISTED hash set — so the result is IDENTICAL to
    ``contamination(docs, suite, method="join")``, with the suite never
    rescanned and the shuffle bounded by the contaminated fraction.
    """
    import numpy as np

    spark = docs.sparkSession
    m = spark.read.parquet(f"{store_path}/meta").first()
    rows = spark.read.parquet(f"{store_path}/bloom").collect()
    words = np.zeros((m.m_bits + 63) // 64, dtype=np.uint64)
    if rows:
        widx = np.array([r["idx"] for r in rows], dtype=np.int64)
        ws = np.array([r["w"] for r in rows], dtype=np.int64).view(np.uint64)
        words[widx] |= ws
    held = spark.read.parquet(f"{store_path}/hashes")
    return _bloom_probe(
        docs, (words, m.m_bits, m.n_probes), held, m.k, min_overlap,
        text_col, id_col,
    )


def simhash64(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = False,
) -> DataFrame:
    """64-bit SimHash fingerprint per document.

    Pure JVM formulation: explode tokens, hash each, then 64 codegen'd
    sign-sum aggregates (one per bit) with map-side partial aggregation
    — the shuffle carries one row per doc. (A pandas-UDF version
    measured ~2x slower and kept Python in the hot path.)

    ``portable=False`` (default, production): token hash = xxhash64 —
    fastest, JVM-only. ``portable=True``: token hash packs two
    independent 31-bit polynomial folds (``text.fingerprint`` bases
    31/37) into bits 0..61 — byte-identical reproducible in ANSI
    SQL/DuckDB, which is what lets ``dedup_simhash`` carry an EXACT
    driver oracle (brute-force bit_count(xor) pairs) instead of a
    rows-only check. Same SimHash semantics either way; only the token
    hash family differs.
    """
    tokens_raw = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok"),
    )
    if portable:
        from .text import fingerprint

        # the polynomial fold is an interpreted higher-order aggregate
        # (per char) — folding every token INSTANCE measured 6.6 s vs
        # xxhash64's 2.8 s at sf0.1. Fold the DISTINCT vocabulary once
        # and broadcast-join the hashes back: Zipf makes |vocab| tiny
        # relative to instances, and the fact side stays shuffle-free.
        # Raw folds of short tokens leave the high-order bits ZERO
        # (base^len*127 << 2^31), which collapses the SimHash Hamming
        # space (37k vs 525 pairs at sf0.1); a Knuth multiplicative
        # scramble (odd constant, mod 2^31 — overflow-free int64, the
        # same arithmetic in any SQL engine) diffuses every fold across
        # all 31 bits of each half.
        f1 = (fingerprint(F.col("tok"), base=31) * F.lit(2654435761)) % F.lit(1 << 31)
        f2 = (fingerprint(F.col("tok"), base=37) * F.lit(2246822519)) % F.lit(1 << 31)
        vocab = tokens_raw.select("tok").distinct().select(
            "tok", (f1 + f2 * F.lit(1 << 31)).alias("h")
        )
        tokens = tokens_raw.join(F.broadcast(vocab), "tok").select("id", "h")
    else:
        tokens = tokens_raw.select("id", F.xxhash64("tok").alias("h"))
    # sum the RAW bit (no when/otherwise conditional) and carry one
    # count: bit i of the fingerprint is set iff ones_i > zeros_i, i.e.
    # 2*sum_i > n — identical sign semantics (ties -> 0) at ~35% less
    # aggregate expression work per token row
    aggs = [
        F.sum(F.shiftrightunsigned(F.col("h"), i).bitwiseAND(F.lit(1))).alias(
            f"__b{i}"
        )
        for i in range(64)
    ] + [F.count("*").alias("__n")]
    v = tokens.groupBy("id").agg(*aggs)
    fp = F.lit(0).cast("long")
    for i in range(64):
        fp = fp.bitwiseOR(
            F.when(
                F.col(f"__b{i}") * 2 > F.col("__n"),
                F.shiftleft(F.lit(1).cast("long"), i),
            ).otherwise(F.lit(0).cast("long"))
        )
    return v.select("id", fp.alias("simhash"))


def _simhash_chunks(sh):
    """(id, simhash, chunk, val): the 4 x 16-bit pigeonhole blocking
    keys of each fingerprint — hamming <= 3 implies at least one chunk
    matches exactly. Shared by the in-memory pair search and the
    persisted-store probe so the blocking can never drift between them.
    """
    return sh.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned(F.col("simhash"), 16 * c)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("cc"),
    ).select("id", "simhash", "cc.chunk", "cc.val")


def simhash_near_dups(
    docs: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int | None = None,
    portable: bool = False,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance <= ``max_hamming``.

    Pigeonhole blocking: split the 64-bit fingerprint into 4 16-bit
    chunks; distance<=3 implies at least one chunk matches exactly, so
    candidates = equi-join per chunk (shuffle on 16-bit chunk values),
    then exact popcount filter. No quadratic pass.

    ``max_bucket`` (optional, default unbounded) is the executor-memory
    guard against pathological duplication: buckets larger than the cap
    are dropped before their posting list is collected (their quadratic
    pair output would be unpayable anyway — collapse exact duplicates
    with exact_dedup first). Unset, every true pair is emitted.
    """
    # posting-list formulation: the 64-aggregate fingerprint pipeline is
    # the expensive part — a chunks⋈chunks self-join planned it twice
    # with no exchange reuse. Group each (chunk, val) bucket's members
    # once and expand (i < j) pairs from the sorted posting list instead.
    # Bucket sizes are ~n/2^16 for unrelated docs plus the near-dup
    # groups themselves.
    sh = simhash64(docs, text_col, id_col, portable=portable)
    chunks = _simhash_chunks(sh)
    if max_bucket is not None:
        cw = W.partitionBy("chunk", "val")
        chunks = chunks.withColumn("__bn", F.count("*").over(cw)).filter(
            F.col("__bn") <= max_bucket
        ).drop("__bn")
    posts = (
        chunks.groupBy("chunk", "val")
        .agg(F.array_sort(F.collect_list(F.struct("id", "simhash"))).alias("lst"))
        .filter(F.size("lst") >= 2)
    )
    lst = F.col("lst")
    pairs = F.flatten(
        F.transform(
            lst,
            lambda x, i: F.transform(
                F.slice(lst, i + 2, F.greatest(F.size(lst), F.lit(1))),
                lambda y: F.struct(
                    x.getField("id").alias("id_a"),
                    x.getField("simhash").alias("ha"),
                    y.getField("id").alias("id_b"),
                    y.getField("simhash").alias("hb"),
                ),
            ),
        )
    )
    # hamming filter BEFORE the dedup shuffle: far pairs never ride the
    # exchange; distinct then only de-dups true near-dups that collided
    # in several chunks
    dist = F.bit_count(F.col("p.ha").bitwiseXOR(F.col("p.hb")))
    return (
        posts.select(F.explode(pairs).alias("p"))
        .select("p.id_a", "p.id_b", dist.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_store_init(
    docs: DataFrame,
    store_path: str,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = False,
) -> None:
    """Initialize a PERSISTED SimHash store from a seed corpus — the
    Hamming-distance member of the persisted-store lifecycle family
    (``exact_dedup_store_init`` / ``minhash_store_init`` /
    ``contamination_store_init``): each nightly slice near-dedups
    against everything accepted WITHOUT rescanning the accepted corpus.

    The store carries one row per (chunk, val, simhash) posting of the
    accepted fingerprints (three ints, never text), written partitioned
    by chunk so a probe's equi-join prunes to the 4 chunk partitions,
    plus a one-row ``meta`` table pinning (max_hamming, portable) — a
    probe with mismatched params would compare garbage, so probes read
    them from the store. Unlike the MinHash store (bucket-occupancy
    candidates), carrying the full fingerprint lets every probe verify
    EXACT Hamming distance, so statuses are true near-dup verdicts, not
    LSH candidate verdicts.
    """
    sh = simhash64(docs, text_col, id_col, portable=portable)
    (
        _simhash_chunks(sh)
        .select("chunk", "val", "simhash")
        .distinct()
        .write.mode("overwrite")
        .partitionBy("chunk")
        .parquet(f"{store_path}/postings")
    )
    docs.sparkSession.createDataFrame(
        [(int(max_hamming), bool(portable))], "max_hamming int, portable boolean"
    ).write.mode("overwrite").parquet(f"{store_path}/meta")


def simhash_dedup_incremental(
    new_docs: DataFrame,
    store_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    commit: bool = True,
) -> DataFrame:
    """Batch-incremental near-dup dedup against a persisted SimHash
    store (init with ``simhash_store_init``). Returns one row per batch
    doc: ``(id_col, status)`` with status

    - ``dup_store``: VERIFIED Hamming <= max_hamming to some accepted
      fingerprint (pigeonhole candidates via the chunk equi-join, then
      exact ``bit_count(xor)`` — no false positives, unlike the LSH
      bucket-occupancy store),
    - ``dup_batch``: store-clean but verified-near some SMALLER
      store-clean batch id (greedy min-keeps; chains a~b~c over-drop in
      the transitive-collapse direction ``dedup_clusters`` applies
      deliberately),
    - ``kept``: accepted; its postings are COMMITTED back to the store.

    Accept-then-commit like the exact/minhash stores: statuses
    materialize to ``{store}/last_batch`` BEFORE survivors' postings
    append, so a recompute cannot double-filter against its own commit.

    ``commit=False`` is the DRY-RUN probe: same statuses, store
    untouched — the "what would tonight's dedup drop" preview, and the
    probe-only form repeated benchmarks can run against one shared
    seed store without mutating it (r8 VERDICT item 6). The dry run
    skips both parquet commits and returns the status frame lazily;
    the batch fingerprints are ``localCheckpoint(eager=False)``-ed so
    the hits / batch-competition / status branches all read ONE batch
    fingerprint pass (r9 VERDICT item 4 — the persist-free form paid up
    to 3 batch-text scans per probe). Unlike a persist, the checkpoint
    RDD is released by the ContextCleaner when the returned frame is
    garbage collected — callers should drop references to probe frames
    promptly, since a harness that keeps them alive pins that executor
    storage across probes. The lineage cut has a cost: after the
    checkpoint materializes, an executor loss FAILS the in-flight job
    (no lineage to recompute from) and the caller must re-invoke the
    probe — acceptable here because a probe is a bounded read-only job
    with no side effects to unwind.

    Scale shape: one fingerprint pass over the batch (persisted, reused
    by probe/competition/commit, then unpersisted); the store probe is
    a (chunk, val) equi-join carrying ints only (chunk partitioning
    prunes the scan; AQE broadcasts a small store, shuffles a grown
    one); batch competition reuses the posting-list pair expansion with
    the Hamming filter BEFORE any exchange; only survivors' distinct
    postings append. No text ever enters an exchange or the store.
    """
    spark = new_docs.sparkSession
    m = spark.read.parquet(f"{store_path}/meta").first()
    # commit path: persist (materialize, reuse for the append,
    # unpersist at the end — an explicit release point exists).
    # dry run: lazy localCheckpoint — one shared fingerprint pass for
    # all three probe branches, storage freed when the frame is GC'd.
    sh = simhash64(new_docs, text_col, id_col, portable=m.portable)
    if commit:
        sh = sh.persist()
    else:
        sh = sh.localCheckpoint(eager=False)
    chunks = _simhash_chunks(sh)
    store = spark.read.parquet(f"{store_path}/postings")
    hits = (
        chunks.join(
            store.withColumnRenamed("simhash", "__sfp"), ["chunk", "val"]
        )
        .filter(
            F.bit_count(F.col("simhash").bitwiseXOR(F.col("__sfp")))
            <= m.max_hamming
        )
        .select("id")
        .distinct()
    )
    clean = chunks.join(hits, "id", "left_anti")
    posts = (
        clean.groupBy("chunk", "val")
        .agg(F.array_sort(F.collect_list(F.struct("id", "simhash"))).alias("lst"))
        .filter(F.size("lst") >= 2)
    )
    lst = F.col("lst")
    pairs = F.flatten(
        F.transform(
            lst,
            lambda x, i: F.transform(
                F.slice(lst, i + 2, F.greatest(F.size(lst), F.lit(1))),
                lambda y: F.struct(
                    x.getField("id").alias("id_a"),
                    x.getField("simhash").alias("ha"),
                    y.getField("id").alias("id_b"),
                    y.getField("simhash").alias("hb"),
                ),
            ),
        )
    )
    batch_dup = (
        posts.select(F.explode(pairs).alias("p"))
        .filter(
            F.bit_count(F.col("p.ha").bitwiseXOR(F.col("p.hb"))) <= m.max_hamming
        )
        .select(F.col("p.id_b").alias("id"))
        .distinct()
    )
    res = (
        new_docs.select(F.col(id_col).alias("id"))
        .join(hits.withColumn("__hit", F.lit(1)), "id", "left")
        .join(batch_dup.withColumn("__bdup", F.lit(1)), "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.when(F.col("__hit") == 1, F.lit("dup_store"))
            .when(F.col("__bdup") == 1, F.lit("dup_batch"))
            .otherwise(F.lit("kept"))
            .alias("status"),
        )
    )
    if not commit:
        return res.select(id_col, "status")
    res.write.mode("overwrite").parquet(f"{store_path}/last_batch")
    accepted = spark.read.parquet(f"{store_path}/last_batch")
    kept = accepted.filter(F.col("status") == "kept").select(
        F.col(id_col).alias("id")
    )
    (
        chunks.join(kept, "id", "left_semi")
        .select("chunk", "val", "simhash")
        .distinct()
        .write.mode("append")
        .partitionBy("chunk")
        .parquet(f"{store_path}/postings")
    )
    sh.unpersist()
    return accepted.select(id_col, "status")


def substring_dedup(
    docs: DataFrame,
    window: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact duplicated-SPAN removal (the ExactSubstr dedup of Lee et
    al. 2022, "Deduplicating Training Data Makes Language Models
    Better", re-expressed relationally): every token covered by a
    length-``window`` token run whose exact content appears earlier in
    the corpus (first occurrence = smallest (doc, position)) is deleted,
    and documents are reassembled from the surviving tokens. Any
    duplicated span of >= ``window`` tokens contains a duplicated
    window, so all long exact duplicates are caught; the first copy
    survives intact.

    Returns (id, n_tokens, n_removed, text) for EVERY input doc.

    Scale shape: the paper's suffix array is a single-machine
    construction; the relational equivalent is rolling window hashes.
    Window hashes are built IN PLACE on the token array (one xxhash64
    per position — no token explode for candidate generation), then:
    (1) groupBy(hash) -> min(id, pos) with map-side partials (a
    boilerplate span is a hot key and collapses per partition — same
    guard as line_dedup); (2) join-back marks later occurrences;
    (3) their covered positions explode + distinct (overlapping spans
    merge for free); (4) one anti-join removes them from the token
    stream and one groupBy(id) rebuilds text. Everything shuffles
    8-byte hashes or (id, pos) ints, never window text. Two corpus
    scans (window pass + rebuild pass), the documented dedup trade.
    64-bit window-hash collisions are the standard corpus-dedup
    assumption (cf. exact_dedup).
    """
    # NULL text would otherwise poison the rebuild: split(NULL) is NULL,
    # size(NULL) is -1/NULL, and F.sequence(0, n_tok - 1) with a negative
    # stop infers step=-1 and fabricates positions (round-7 ADVICE, low).
    # Normalize to an empty token array so degenerate docs flow through
    # every arm as n_tok=0 -> no windows, no removals, empty text.
    toks_raw = F.split(F.trim(F.col(text_col)), r"\s+")
    toks = F.coalesce(toks_raw, F.array().cast("array<string>"))
    base = docs.select(
        F.col(id_col).alias("id"),
        toks.alias("__toks"),
        F.size(toks).alias("n_tok"),
    )
    # window identity = xxhash64 over the window's TOKEN HASHES (each
    # token hashed once, then a long-array slice) instead of re-joining
    # the window's text per position: same 64-bit collision contract,
    # ~1.5x faster candidate pass at sf0.1 (r7 profile — string
    # building amplified every token ``window``-fold)
    th = F.transform("__toks", lambda t: F.xxhash64(t))
    base = base.withColumn("__th", th)
    windows = F.when(
        F.col("n_tok") >= window,
        F.transform(
            F.sequence(F.lit(0), F.col("n_tok") - window),
            lambda i: F.xxhash64(F.slice("__th", i + 1, window)),
        ),
    ).otherwise(F.array().cast("array<long>"))
    occ = base.select("id", F.posexplode(windows).alias("p", "h"))
    firsts = occ.groupBy("h").agg(F.min(F.struct("id", "p")).alias("f"))
    dups = (
        occ.join(firsts, "h")
        .filter(~((F.col("f.id") == F.col("id")) & (F.col("f.p") == F.col("p"))))
        .select("id", "p")
    )
    # rebuild IN-ROW: removed positions aggregate to one set per
    # AFFECTED doc (collect_set dedups overlapping spans; bounded by
    # the doc's own length, which already lives in one row), then
    # array_except keeps surviving positions in order and the text
    # re-joins inside the row. The previous form posexploded EVERY
    # token of EVERY doc through an anti-join + collect_list sort —
    # two corpus-token-count exchanges that this shape never pays
    # (r7: 3.5 s -> measured below in bench; shuffles now carry only
    # removed (id, pos) ints).
    rem_by_doc = (
        dups.select(
            "id",
            F.explode(
                F.sequence(F.col("p"), F.col("p") + F.lit(window - 1))
            ).alias("pos"),
        )
        .groupBy("id")
        .agg(F.collect_set("pos").alias("__rem"))
    )
    # guard n_tok > 0: sequence(0, -1) would infer step=-1 -> [0, -1]
    kept_pos = F.array_except(
        F.when(
            F.col("n_tok") > 0, F.sequence(F.lit(0), F.col("n_tok") - 1)
        ).otherwise(F.array().cast("array<int>")),
        F.coalesce(F.col("__rem"), F.array().cast("array<int>")),
    )
    return (
        base.join(rem_by_doc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.col("n_tok").alias("n_tokens"),
            (F.col("n_tok") - F.size(kept_pos)).alias("n_removed"),
            F.array_join(
                F.transform(
                    kept_pos, lambda p: F.element_at("__toks", p + 1)
                ),
                " ",
            ).alias("text"),
        )
    )


def fuzzy_dedup(
    docs: DataFrame,
    k: int = 3,
    threshold: float = 0.5,
    max_df: int | None = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefilter: str | None = "minhash",
    num_hashes: int = 32,
    bands: int = 16,
    max_iter: int = 25,
) -> DataFrame:
    """End-to-end fuzzy document dedup — the RefinedWeb/Dolma recipe as
    one composition: candidate pairs -> exact n-gram Jaccard verify ->
    connected components -> keep the smallest doc id per cluster.

    Returns the WHOLE corpus annotated ``(doc_id, cluster_id, keep)``:
    ``filter(keep)`` is the deduplicated corpus, and keeping the
    annotations (instead of dropping rows) lets pipelines audit cluster
    sizes and removal rates before committing — the shape production
    dedup jobs actually want.

    ``prefilter="minhash"`` (the 100 TB path): candidates come from the
    banded MinHash posting lists FIRST, and exact Jaccard runs ONLY on
    those candidate pairs (``jaccard_verify``) — the corpus's exact
    pair set is never materialized, so the quadratic sum-df^2 posting
    expansion of the full inverted index is replaced by
    O(candidate pairs x shingles/doc) verify joins restricted to docs
    that appear in a candidate at all. At the default r=2x16 bands the
    band-collision probability at jaccard 0.5 is ~0.99 per pair and
    recall 1.0 is PROVEN at test SFs by the dedup_minhash_recall
    containment contract, which is what makes the full value oracle of
    the fuzzy_dedup contract valid. ``prefilter=None`` skips the
    candidate stage (exact inverted-index pairs only — the verify/test
    path).

    Reference analog: none — eventkit has no corpus ops; this composes
    the engine's LLM extension set (SURVEY.md §2 extension table).
    """
    if prefilter == "minhash":
        cand = minhash_lsh_candidates(
            docs, num_hashes=num_hashes, bands=bands, k=k,
            text_col=text_col, id_col=id_col,
        )
        pairs = jaccard_verify(
            docs, cand, k=k, threshold=threshold, text_col=text_col, id_col=id_col
        )
    elif prefilter is None:
        pairs = ngram_jaccard_pairs(
            docs, k=k, threshold=threshold, text_col=text_col, id_col=id_col,
            max_df=max_df,
        )
    else:
        raise ValueError(f"prefilter must be 'minhash' or None, got {prefilter!r}")
    labels = dedup_clusters(docs, pairs, id_col=id_col, max_iter=max_iter)
    return labels.select(
        F.col(id_col),
        F.col("cluster_id"),
        (F.col(id_col) == F.col("cluster_id")).alias("keep"),
    )


def dedup_report(labels: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Cluster-size histogram of a dedup labeling — the removal-rate
    artifact a curator reviews BEFORE committing a dedup pass (how many
    exact/near-dup clusters exist, how big, how many docs a
    keep-one-per-cluster policy deletes). Takes any
    ``(id, cluster_id, ...)`` frame (``fuzzy_dedup`` /
    ``semantic_dedup`` / ``central_dedup`` output) and returns one row
    per cluster SIZE: ``(cluster_size, n_clusters, n_docs,
    n_removed)`` where n_removed assumes keep-one-per-cluster.

    Scale shape: two partial-combined hash aggregates — per-cluster
    count (one shuffle on cluster_id) then the per-size rollup
    (#distinct sizes rows, kilobytes at any corpus)."""
    per = labels.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return (
        per.groupBy("cluster_size")
        .agg(F.count("*").cast("long").alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters"))
            .cast("long")
            .alias("n_docs"),
            ((F.col("cluster_size") - 1) * F.col("n_clusters"))
            .cast("long")
            .alias("n_removed"),
        )
    )


def jaccard_verify(
    docs: DataFrame,
    pairs: DataFrame,
    k: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact n-gram Jaccard for a GIVEN candidate pair set — the verify
    stage of candidate-first dedup (fuzzy_dedup's 100 TB shape).

    Only documents that appear in some candidate pair are shingled
    (semi-join pushdown), then two equi-joins attach each pair's two
    distinct-shingle streams and one aggregate counts the overlap:
    cost O(|pairs| x shingles/doc), independent of corpus-wide shingle
    document frequencies — no sum-df^2 posting-list expansion, no
    max_df tuning. Returns (id_a, id_b, jaccard) at or above
    ``threshold``; jaccard is over DISTINCT shingles, identical to
    ``ngram_jaccard_pairs``.
    """
    # the candidate table feeds THREE subtrees (the id semi-join twice
    # via the union, and the pair join) and the candidate shingles feed
    # three more (sizes, the a-leg, the b-leg): without a
    # materialization boundary every leg re-runs the whole candidate
    # pipeline — for fuzzy_dedup that is the full minhash banding pass
    # x3 (guide §5: cache when re-use beats recompute; both tables are
    # pair-list-sized ints/hashes, never corpus-sized). localCheckpoint
    # computes each once per run — a per-run boundary, nothing persists
    # across calls.
    cand = pairs.select("id_a", "id_b").distinct().localCheckpoint(eager=False)
    ids = (
        cand.select(F.col("id_a").alias("id"))
        .union(cand.select(F.col("id_b").alias("id")))
        .distinct()
    )
    sh = (
        docs.join(ids.withColumnRenamed("id", id_col), id_col, "left_semi")
        .select(
            F.col(id_col).alias("id"),
            F.explode(_shingles(F.col(text_col), k)).alias("__s"),
        )
        .select("id", F.xxhash64("__s").alias("shingle"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    sizes = sh.groupBy("id").agg(F.count("*").alias("n"))
    a = cand.join(
        sh.select(F.col("id").alias("id_a"), "shingle"), "id_a"
    )
    inter = (
        a.join(
            sh.select(F.col("id").alias("id_b"), F.col("shingle")),
            ["id_b", "shingle"],
        )
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("common"))
    )
    return (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("n").alias("na")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("n").alias("nb")), "id_b")
        .withColumn(
            "jaccard", F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_novelty(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document n-gram novelty: the fraction of the doc's distinct
    word ``k``-grams whose FIRST corpus occurrence (min doc id) is this
    doc — the marginal-new-content signal curation pipelines use to
    down-rank shards that only restate earlier data (the doc-level twin
    of ``substring_dedup``'s span view).

    Returns (doc_id, n_shingles, novelty) with novelty in [0, 1]
    rounded to 6 (1.0 = every shingle first seen here; the lowest-id
    doc of any duplicate family scores 1 by construction).

    Scale shape: ONE distinct (id, shingle-hash) exchange; first
    occurrence is a min AGGREGATE on the shingle (map-side combined —
    never a window over the shingle: boilerplate shingles are the
    hottest keys in the corpus, the line_dedup lesson) joined back, and
    the per-doc fraction is one id-keyed aggregate. Shuffles carry
    64-bit hashes + ids only.
    """
    sh = (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(_shingles(F.col(text_col), k)).alias("__s"),
        )
        .select("id", F.xxhash64("__s").alias("shingle"))
        .distinct()
    )
    firsts = sh.groupBy("shingle").agg(F.min("id").alias("first_id"))
    return (
        sh.join(firsts, "shingle")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.round(
                F.sum(F.when(F.col("first_id") == F.col("id"), 1).otherwise(0))
                / F.count("*"),
                6,
            ).alias("novelty"),
        )
        .select(F.col("id").alias(id_col), "n_shingles", "novelty")
    )


def contamination_report(
    docs: DataFrame,
    heldout: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The heldout-side view of decontamination: for every BENCHMARK
    document, what fraction of its distinct word ``k``-grams also
    appears anywhere in the training corpus — the "is my eval already
    compromised" report (GPT-3 appendix C measures this direction;
    ``contamination`` flags the train side to drop).

    Returns (doc_id, n_shingles, n_leaked, leak_frac) per heldout doc,
    leak_frac rounded to 6.

    Scale shape: the train side is reduced to DISTINCT shingle hashes
    with NO doc ids (one hash-aggregate exchange — the only
    corpus-sized shuffle, 8 bytes/row); the heldout side is benchmark-
    sized. The semi-join marks leaked shingles, one id aggregate builds
    the report. AQE broadcasts the heldout side against the train hash
    table.
    """
    held = (
        heldout.select(
            F.col(id_col).alias("id"),
            F.explode(_shingles(F.col(text_col), k)).alias("__s"),
        )
        .select("id", F.xxhash64("__s").alias("shingle"))
        .distinct()
    )
    train = (
        docs.select(F.explode(_shingles(F.col(text_col), k)).alias("__s"))
        .select(F.xxhash64("__s").alias("shingle"))
        .distinct()
    )
    leaked = held.join(train, "shingle", "left_semi").groupBy("id").agg(
        F.count("*").alias("n_leaked")
    )
    totals = held.groupBy("id").agg(F.count("*").alias("n_shingles"))
    return (
        totals.join(leaked, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "n_shingles",
            F.coalesce("n_leaked", F.lit(0)).alias("n_leaked"),
            F.round(F.coalesce("n_leaked", F.lit(0)) / F.col("n_shingles"), 6).alias(
                "leak_frac"
            ),
        )
    )


def _bounded_levenshtein_kernel(max_dist: int):
    """Arrow kernel: banded Levenshtein (Ukkonen band |i-j| <= k),
    vectorized ACROSS the pair axis — returns the exact distance when
    <= ``max_dist``, else -1, matching ``F.levenshtein(a, b, k)``
    row-for-row (parity-pinned in test_bounded_levenshtein_kernel).

    Why not the builtin: Spark's threshold levenshtein still walks the
    full O(len^2) DP matrix per row with an early-exit check — ~1.1 ms
    per 300-char pair, which made the verify stage 3x the cost of
    candidate generation. Here the DP advances one (row, diagonal)
    cell at a time as a SINGLE numpy op over every pair in the Arrow
    batch: O(maxlen * (2k+1)) vector steps total, ~50x fewer cycles,
    per the repo rule that per-CHARACTER work belongs in a vectorized
    kernel. NULL inputs yield -1 (the callers' dist >= 0 filter drops
    them, same as the builtin's NULL)."""
    import numpy as np
    import pandas as pd

    k = int(max_dist)

    def _codes(strs, width):
        arr = np.zeros((len(strs), max(width, 1)), dtype=np.uint32)
        lens = np.zeros(len(strs), dtype=np.int64)
        for p, s in enumerate(strs):
            if s is None:
                lens[p] = -1  # NULL marker
                continue
            c = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
            lens[p] = len(c)
            arr[p, : len(c)] = c
        return arr, lens

    # no type hints: this module has `from __future__ import
    # annotations`, which stringifies them and pandas_udf rejects that
    def kernel(a, b):
        P = len(a)
        if P == 0:
            return pd.Series(np.zeros(0, dtype="int32"))
        alist, blist = a.tolist(), b.tolist()
        # Python len(s) counts code points == utf-32 units, so these
        # widths are exact for the padded code-point matrices
        amax = max((len(s) for s in alist if s is not None), default=0)
        bmax = max((len(s) for s in blist if s is not None), default=0)
        ac, n = _codes(alist, amax)
        bc, m = _codes(blist, bmax)
        W = 2 * k + 1
        INF = np.int16(k + 1)
        res = np.full(P, -1, dtype=np.int32)
        valid = (n >= 0) & (m >= 0) & (np.abs(n - m) <= k)
        dcap = np.clip(m - n + k, 0, W - 1)  # capture diagonal per pair
        # row i = 0: D[0][j] = j for the in-band j = d - k >= 0
        band = np.full((P, W), INF, dtype=np.int16)
        for d in range(k, W):
            j = d - k
            band[:, d] = np.where(j <= m, np.int16(min(j, k + 1)), INF)
        done = valid & (n == 0)
        res[done] = band[done, dcap[done]]
        nmax = int(n.max()) if P else 0
        for i in range(1, nmax + 1):
            prev = band
            band = np.full((P, W), INF, dtype=np.int16)
            ai = ac[:, i - 1]
            for d in range(W):
                j = i + d - k
                if j < 0:
                    continue
                if j == 0:
                    val = np.full(P, i if i <= k else int(INF), dtype=np.int16)
                else:
                    bj = bc[:, j - 1] if j - 1 < bc.shape[1] else np.zeros(P, dtype=np.uint32)
                    val = prev[:, d] + (ai != bj)  # substitute / match
                    if d + 1 < W:
                        np.minimum(val, prev[:, d + 1] + 1, out=val)  # delete
                    if d >= 1:
                        np.minimum(val, band[:, d - 1] + 1, out=val)  # insert
                    np.minimum(val, INF, out=val)
                band[:, d] = np.where(j <= m, val, INF)
            cap = valid & (n == i)
            if cap.any():
                res[cap] = band[cap, dcap[cap]]
        res[res > k] = -1
        return pd.Series(res)

    # asNondeterministic: the verify filter (dist <= max_dist) otherwise
    # pushes below the projection and the optimizer evaluates the banded
    # DP TWICE per candidate pair (two ArrowEvalPython nodes for one
    # kernel — the guide §4.4 duplication; the kernel is pure, the mark
    # only pins one evaluation)
    # Standing constraint of the mark (r11 ADVICE): the pinned
    # expression may only appear under Project/Filter/Generate —
    # Spark raises AnalysisException for nondeterministic
    # expressions in join conditions or aggregate arguments, and no
    # other filter will push below it. Keep call sites
    # projection-shaped.
    return F.pandas_udf(kernel, "int").asNondeterministic()


def edit_near_dups(
    docs: DataFrame,
    max_dist: int = 2,
    key=None,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_len_gap: bool = True,
) -> DataFrame:
    """Typo-level near-duplicates: pairs whose Levenshtein edit
    distance is at most ``max_dist`` — the record-linkage primitive the
    shingle family misses (a 1-char typo preserves edit distance but
    can shift every k-gram after it).

    Candidates come from sorted-neighborhood blocking on ``key``
    (default: the text itself — near-identical strings sort adjacently);
    the verify is the banded Levenshtein Arrow kernel on the candidate
    pairs only, O(len * max_dist) per pair vectorized across the batch
    (builtin-parity pinned), bounded by O(n * window) pairs instead of
    all-pairs. ``max_len_gap`` skips the verify when
    ``|len_a - len_b| > max_dist`` (a length gap is a lower bound on
    edit distance — free pruning). Returns ``(id_a, id_b, dist)`` with
    ``dist <= max_dist``.

    Caveat shared with every sorted-neighborhood design: only pairs
    within ``window`` sort positions are candidates — a typo in the
    FIRST character can sort the variant far away. Raise ``window``,
    block on a more robust key (e.g. ``F.reverse`` of the text as a
    second pass, unioning pairs), or use the shingle family when the
    miss matters.
    """
    if max_dist < 0:
        raise ValueError("edit_near_dups() needs max_dist >= 0")
    k = F.col(text_col) if key is None else (F.col(key) if isinstance(key, str) else key)
    # carry= threads each pair's texts through the neighborhood join —
    # the former two id-keyed join-backs re-planned the corpus scan
    # four more times (r8: 12 -> 4 FileScans on the doubled contract)
    j = sorted_neighborhood_pairs(
        docs, k, window=window, id_col=id_col, carry=[text_col]
    ).select(
        "id_a", "id_b",
        F.col(f"{text_col}_a").alias("__ta"),
        F.col(f"{text_col}_b").alias("__tb"),
    )
    if max_len_gap:
        j = j.filter(
            F.abs(F.length("__ta") - F.length("__tb")) <= max_dist
        )
    # r8: the banded Arrow kernel, not F.levenshtein(a, b, max_dist) —
    # the builtin's threshold form still walks the full O(len^2) DP per
    # row (verify stage was 3x the candidate stage at sf0.1); the
    # kernel advances the Ukkonen band as one numpy op across the whole
    # Arrow batch and is parity-pinned against the builtin
    d = _bounded_levenshtein_kernel(max_dist)(F.col("__ta"), F.col("__tb"))
    return (
        j.select("id_a", "id_b", d.alias("dist"))
        .filter((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
    )


def sorted_neighborhood_pairs(
    docs: DataFrame,
    key,
    window: int = 2,
    id_col: str = "doc_id",
    partitions: int | None = None,
    carry: list[str] | None = None,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernandez-Stolfo 1995): order the
    corpus by a blocking key and emit every pair within ``window``
    positions of each other as a dedup/linkage candidate — the classic
    alternative to LSH when a domain key (normalized name, sort-ready
    prefix) clusters duplicates adjacently. O(n * window) candidates
    instead of all-pairs.

    ``key`` is a Column or column name; string keys are ordered by an
    ASCII assumption (see below), numeric keys natively. Pair order is
    total and deterministic: (key, id) ascending, ties broken by id.

    Scale shape — a global row_number would serialize the corpus
    through one window task, so the rank is the deterministic two-phase
    form (the unkeyed as-of join's discipline): ONE driver-side
    approxQuantile sketch over an order-preserving numeric surrogate
    (first 8 ASCII chars base-256 for strings — monotone w.r.t. string
    order for ASCII keys; equal prefixes fall in one bucket and sort by
    the full key inside it) fixes bucket boundaries; the bucket id is a
    pure broadcast-literal expression (no checkpoint, recompute-safe);
    per-bucket row_numbers plus a #buckets-row offset prefix sum give
    the global rank. Neighbor pairs are ONE block-equi self-join (rank
    div window, probing own + next block) — never a cross join.

    Returns (id_a, id_b, dist) with dist = rank distance in [1, window];
    ``carry=`` payload columns ride through to the pair output as
    ``<col>_a`` / ``<col>_b`` — a verify stage that needs each pair's
    payloads (edit_near_dups' texts) gets them WITHOUT two id-keyed
    join-backs, each of which re-planned the corpus scan (r8: the
    edit_dedup contract went 12 -> 4 FileScans).
    Note: calling this runs the quantile sketch eagerly (one cheap
    driver action), like the unkeyed as-of join.
    """
    if window < 1:
        raise ValueError("sorted_neighborhood_pairs() needs window >= 1")
    k = F.col(key) if isinstance(key, str) else key
    from pyspark.sql.types import NumericType

    carry = list(carry or [])
    probe = docs.select(
        k.alias("__k"),
        F.col(id_col).alias("id"),
        *[F.col(c) for c in carry],
    )
    if isinstance(probe.schema["__k"].dataType, NumericType):
        # NULL keys would make the surrogate (and thus __bkt) NULL and
        # silently fall out of the bucket equi-join; pin them to -inf so
        # they land in bucket 0 and sort first — matching Spark's
        # NULLS FIRST ascending order used by the in-bucket row_number.
        sur = F.coalesce(F.col("__k").cast("double"), F.lit(float("-inf")))
    else:
        ks = F.coalesce(F.col("__k").cast("string"), F.lit(""))
        sur = sum(
            F.coalesce(F.ascii(F.substring(ks, i + 1, 1)), F.lit(0)).cast("double")
            * float(256 ** (7 - i))
            for i in range(8)
        )
    t = probe.withColumn("__sur", sur)
    spark = docs.sparkSession
    p = partitions or session_width(spark)
    probs = [i / p for i in range(1, p)]
    bounds = sorted(set(t.stat.approxQuantile("__sur", probs, 0.001))) if p > 1 else []
    bucket = F.lit(0)
    for bnd in bounds:
        bucket = bucket + (F.col("__sur") > F.lit(bnd)).cast("int")
    t = t.withColumn("__bkt", bucket)
    offs = (
        t.groupBy("__bkt")
        .agg(F.count("*").alias("__n"))
        .select(
            "__bkt",
            F.coalesce(
                F.sum("__n").over(
                    W.orderBy("__bkt").rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).alias("__off"),
        )
    )
    rn = F.row_number().over(W.partitionBy("__bkt").orderBy("__k", "id"))
    ranked = (
        t.join(F.broadcast(offs), "__bkt")
        .select(
            "id", (F.col("__off") + rn - 1).cast("long").alias("__r"), *carry
        )
    )
    blk = lambda c: F.expr(f"{c} div {int(window)}")
    a = ranked.select(
        F.col("id").alias("id_a"), F.col("__r").alias("__ra"), blk("__r").alias("__blk"),
        *[F.col(c).alias(f"{c}_a") for c in carry],
    )
    b = ranked.select(
        F.col("id").alias("id_b"), F.col("__r").alias("__rb"), blk("__r").alias("__b0"),
        *[F.col(c).alias(f"{c}_b") for c in carry],
    )
    b2 = b.select(
        "id_b", "__rb",
        F.explode(F.array(F.col("__b0"), F.col("__b0") - 1)).alias("__blk"),
        *[f"{c}_b" for c in carry],
    )
    return (
        a.join(b2, "__blk")
        .filter((F.col("__rb") > F.col("__ra")) & (F.col("__rb") <= F.col("__ra") + window))
        .select(
            "id_a", "id_b", (F.col("__rb") - F.col("__ra")).cast("long").alias("dist"),
            *[f"{c}_a" for c in carry], *[f"{c}_b" for c in carry],
        )
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Snapshot diff between two corpus versions: one row per doc id
    present in either, labeled ``added`` / ``removed`` / ``changed`` /
    ``unchanged`` — the audit step between pipeline runs (what did the
    recrawl/refilter actually touch?).

    Content comparison is by 64-bit content hash, never by shipping
    text across the join: ONE full-outer id-keyed join whose exchanges
    carry (id, hash) pairs only. Output: (id_col, status).
    """
    ho = old.select(
        F.col(id_col).alias("id"), F.xxhash64(F.col(text_col)).alias("__ho")
    )
    hn = new.select(
        F.col(id_col).alias("id"), F.xxhash64(F.col(text_col)).alias("__hn")
    )
    j = ho.join(hn, "id", "full_outer")
    status = (
        F.when(F.col("__ho").isNull(), F.lit("added"))
        .when(F.col("__hn").isNull(), F.lit("removed"))
        .when(F.col("__ho") == F.col("__hn"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(F.col("id").alias(id_col), status.alias("status"))


def cross_corpus_near_dups(
    corpus: DataFrame,
    heldout: DataFrame,
    k: int = 3,
    threshold: float = 0.5,
    max_df: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_heldout: bool = True,
) -> DataFrame:
    """FUZZY decontamination: corpus documents whose word-``k``-gram
    Jaccard against some heldout document clears ``threshold`` — the
    near-dup complement of ``contamination``'s exact-overlap test
    (catches light rephrasings/appends that shift every exact shingle
    window but leave the shingle SET mostly intact).

    Exact by construction (no LSH recall question): the pair space is
    an inverted-index R-S join on shingle hashes — each side reduces to
    DISTINCT (id, hash) rows, the heldout side (benchmark-sized)
    broadcasts, so corpus shingles never shuffle for the match; the
    only exchange is the (corpus_id, heldout_id) intersection count
    aggregate (map-side combined). ``max_df`` drops corpus-hot shingles
    (boilerplate) from BOTH sides before pairing — the same monotone
    guard as ``ngram_jaccard_pairs`` (sizes count pruned sets, so
    pruned-set Jaccard stays consistent).

    Returns (corpus id, heldout ``match_id``, jaccard round-6) — one
    row per qualifying pair; anti-join the corpus against it to clean.

    ``broadcast_heldout=False`` drops the broadcast hints for a
    corpus-vs-corpus run (two big sides): the match becomes a plain
    shuffle join on the shingle hash — still posting-list-shaped, just
    with both sides exchanged.
    """
    sa = (
        corpus.select(
            F.col(id_col).alias("id_a"),
            F.explode(_shingles(F.col(text_col), k)).alias("__s"),
        )
        .select("id_a", F.xxhash64("__s").alias("sh"))
        .distinct()
    )
    sb = (
        heldout.select(
            F.col(id_col).alias("id_b"),
            F.explode(_shingles(F.col(text_col), k)).alias("__s"),
        )
        .select("id_b", F.xxhash64("__s").alias("sh"))
        .distinct()
    )
    if max_df is not None:
        hot = (
            sa.groupBy("sh").agg(F.count("*").alias("__df"))
            .filter(F.col("__df") > max_df)
            .select("sh")
        )
        sa = sa.join(hot, "sh", "left_anti")
        sb = sb.join(F.broadcast(hot), "sh", "left_anti")
    maybe_bc = F.broadcast if broadcast_heldout else (lambda x: x)
    na = sa.groupBy("id_a").agg(F.count("*").alias("__na"))
    nb = sb.groupBy("id_b").agg(F.count("*").alias("__nb"))
    inter = (
        sa.join(maybe_bc(sb), "sh")
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("__common"))
    )
    jac = F.col("__common") / (F.col("__na") + F.col("__nb") - F.col("__common"))
    return (
        inter.join(na, "id_a")
        .join(maybe_bc(nb), "id_b")
        .filter(jac >= threshold)
        .select(
            F.col("id_a").alias(id_col),
            F.col("id_b").alias("match_id"),
            F.round(jac, 6).alias("jaccard"),
        )
    )
