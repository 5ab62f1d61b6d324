"""Graph analytics over candidate-pair graphs: PageRank.

Why here: near-dup clustering (llm/dedup.py) yields clusters; choosing
WHICH document to keep from each cluster is a ranking problem, and
PageRank over the similarity graph is the classic centrality answer
(keep the most-connected representative, drop satellites).  The same
kernel ranks hosts in a link graph for crawl prioritization.

Determinism contract: the whole power iteration is INTEGER arithmetic —
ranks live in micro-units (1e6 = mass 1), out-degree division and the
damping factor are integer div (``r div od``, ``(m * 85) div 100``), so
Spark and any ANSI engine produce bit-identical ranks and the driver
oracle can replay a fixed number of iterations as chained CTEs.  (A
float formulation would differ across engines in accumulation order
alone.)  Dangling mass is dropped, ranks are unnormalized — the
standard "personalization-free, fixed-iteration" variant used for
ranking, where only the ORDER of ranks matters.

Scale shape: per iteration ONE join of the edge list against the
current ranks (both sides hash-partitioned on the join key) and ONE
hash aggregate on the destination — the textbook Pregel exchange
pattern.  The out-degree-annotated edge list is computed once and
persisted (it is touched every iteration; re-deriving it would re-scan
the pair source each round).  Iterations are a fixed small count —
rank ordering stabilizes in a handful of rounds on similarity graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_MASS = 1_000_000  # initial rank per node, micro-units
_BASE = 150_000    # (1 - 0.85) * _MASS, written as the exact integer


def central_dedup(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    iters: int = 3,
) -> DataFrame:
    """Fuzzy dedup with CENTRALITY-chosen representatives: connected
    components over ``pairs`` pick the clusters (llm/dedup.py
    dedup_clusters), PageRank over the same graph picks WHICH member
    survives — the hub of each near-dup cluster (highest rank, doc id
    as tiebreak) instead of the arbitrary smallest-id doc.  Satellites
    of a template family are usually truncated/mutated copies; the hub
    is the canonical text.

    Returns one row per doc: (id_col, cluster_id, rank, keep) —
    ``filter(keep)`` IS the deduplicated corpus.

    Scale shape: the two graph passes share ONE materialization of the
    pair list (persist + eager build below — without it, components
    and PageRank each replay the full upstream pair-building pipeline:
    a similarity-graph input re-runs its posting-list scans twice);
    representative election is ONE max_by aggregate on the cluster id
    (constant-size cells, map-side combined) joined back — no window
    over members. Pairs are id-tuples — metadata-sized; release with
    ``spark.catalog.clearCache()``.
    """
    from .dedup import dedup_clusters

    pairs = pairs.persist()
    pairs.count()
    clusters = dedup_clusters(docs, pairs, id_col=id_col)
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    ranks = pagerank(
        edges, nodes=docs.select(F.col(id_col).alias("__n")), iters=iters,
        node_id="__n",
    ).select(F.col("__n").alias(id_col), "rank")
    j = clusters.join(ranks, id_col)
    rep = j.groupBy("cluster_id").agg(
        F.max_by(id_col, F.struct(F.col("rank"), -F.col(id_col))).alias("__keep_id")
    )
    return j.join(rep, "cluster_id").select(
        F.col(id_col),
        F.col("cluster_id"),
        F.col("rank"),
        (F.col(id_col) == F.col("__keep_id")).alias("keep"),
    )


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    materialize: bool = True,
) -> DataFrame:
    """Distributed triangle + wedge counting with the global clustering
    coefficient — the density diagnostic for a near-dup similarity
    graph (a corpus whose similarity graph closes many triangles is
    template-heavy; a low coefficient means isolated duplicate pairs).

    Algorithm: the degree-ordered "compact-forward" orientation — each
    undirected edge points from the lower (degree, id) endpoint to the
    higher, so every node's OUT-adjacency is O(sqrt(m)) and wedge
    enumeration never explodes on hub nodes (the naive apex join is
    quadratic in the hub degree; orientation caps total wedge work at
    O(m^1.5) — the textbook bound). Each triangle is counted exactly
    once, at its lowest-ranked apex: enumerate out-wedges (u→v, u→w)
    with rank(v) < rank(w), then ONE equi-join against the oriented
    edge list closes (v→w).

    Scale shape: canonical-edge distinct, two node-sized degree joins,
    the apex self-join on u, and the closing equi-join — every exchange
    carries ids and degrees only (no payload). The clustering
    coefficient is integer-exact: cc_ppm = (3·T·1e6) div W, so any
    ANSI engine replays it bit-identically.

    Returns ONE row: (triangles, wedges, global_cc_ppm) with
    cc NULL on wedge-free graphs.

    ``materialize=True`` (default) persists + eagerly builds the
    canonical edge list and its orientation (two tiny count() jobs):
    the edge table feeds SIX plan branches (degrees, both wedge sides,
    the closing probe), and without the pin each branch would replay
    the full upstream pair-building pipeline — e.g. a similarity-graph
    input re-runs its posting-list scans per branch (the same
    union-branch race rollup_cascade documents). Edges are id-pairs —
    metadata-sized next to the corpus that produced them. Release with
    ``spark.catalog.clearCache()``.
    """
    a, b = F.col(src), F.col(dst)
    und = (
        edges.select(F.least(a, b).alias("__a"), F.greatest(a, b).alias("__b"))
        .filter(F.col("__a") != F.col("__b"))
        .distinct()
    )
    if materialize:
        und = und.persist()
        und.count()
    deg = (
        und.select(F.col("__a").alias("__n"))
        .unionByName(und.select(F.col("__b").alias("__n")))
        .groupBy("__n")
        .agg(F.count("*").alias("__d"))
    )
    da = deg.select(F.col("__n").alias("__na"), F.col("__d").alias("__da"))
    db = deg.select(F.col("__n").alias("__nb"), F.col("__d").alias("__db"))
    ranked = (
        und.join(da, und["__a"] == da["__na"])
        .join(db, und["__b"] == db["__nb"])
    )
    a_lower = (F.col("__da") < F.col("__db")) | (
        (F.col("__da") == F.col("__db")) & (F.col("__a") < F.col("__b"))
    )
    oriented = ranked.select(
        F.when(a_lower, F.col("__a")).otherwise(F.col("__b")).alias("__u"),
        F.when(a_lower, F.col("__b")).otherwise(F.col("__a")).alias("__v"),
        F.when(a_lower, F.col("__db")).otherwise(F.col("__da")).alias("__dv"),
    )
    if materialize:
        oriented = oriented.persist()
        oriented.count()
    e1 = oriented.select(
        F.col("__u"), F.col("__v").alias("__v1"), F.col("__dv").alias("__d1")
    )
    e2 = oriented.select(
        F.col("__u"), F.col("__v").alias("__v2"), F.col("__dv").alias("__d2")
    )
    wedge_order = (F.col("__d1") < F.col("__d2")) | (
        (F.col("__d1") == F.col("__d2")) & (F.col("__v1") < F.col("__v2"))
    )
    wedges = e1.join(e2, "__u").filter(wedge_order).select("__v1", "__v2")
    closing = oriented.select(
        F.col("__u").alias("__v1"), F.col("__v").alias("__v2")
    )
    tri = wedges.join(closing, ["__v1", "__v2"], "left_semi").agg(
        F.count("*").cast("long").alias("triangles")
    )
    wed = deg.agg(
        F.sum(F.expr("__d * (__d - 1) div 2")).cast("long").alias("wedges")
    )
    return tri.crossJoin(wed).select(
        "triangles",
        "wedges",
        F.when(
            F.col("wedges") > 0,
            F.expr("3 * triangles * 1000000 div wedges"),
        ).cast("long").alias("global_cc_ppm"),
    )


def pagerank(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    iters: int = 3,
    src: str = "src",
    dst: str = "dst",
    node_id: str = "id",
) -> DataFrame:
    """Fixed-iteration integer PageRank.

    ``edges``: directed (src, dst) rows (symmetrize first for an
    undirected similarity graph).  ``nodes``: optional node universe
    (defaults to edge endpoints); isolated nodes settle at the base
    rank.  Returns (id, rank) with rank in integer micro-units.

    Recurrence per iteration (all integer ops)::

        msg(u→v) = rank(u) div outdeg(u)
        rank'(v) = 150000 + (85 * Σ msg(·→v)) div 100
    """
    if iters < 1:
        raise ValueError("pagerank needs iters >= 1")
    outdeg = edges.groupBy(src).agg(F.count("*").alias("__od"))
    e2 = (
        edges.join(outdeg, src)
        .select(F.col(src).alias("__s"), F.col(dst).alias("__d"), "__od")
        .persist()
    )
    if nodes is None:
        nodes = (
            edges.select(F.col(src).alias(node_id))
            .unionByName(edges.select(F.col(dst).alias(node_id)))
            .distinct()
        )
    base = nodes.select(F.col(node_id).alias("__id")).persist()
    ranks = base.withColumn("__r", F.lit(_MASS).cast("long"))
    for _ in range(iters):
        msgs = e2.join(ranks, e2["__s"] == ranks["__id"]).select(
            F.col("__d"), F.expr("__r div __od").alias("__m")
        )
        recv = msgs.groupBy("__d").agg(F.sum("__m").alias("__sum"))
        ranks = base.join(recv, base["__id"] == recv["__d"], "left").select(
            F.col("__id"),
            (
                F.lit(_BASE)
                + F.expr("coalesce(__sum, 0L) * 85 div 100")
            ).cast("long").alias("__r"),
        )
    return ranks.select(F.col("__id").alias(node_id), F.col("__r").alias("rank"))
