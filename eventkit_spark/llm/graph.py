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

    Scale shape: the two graph passes share the symmetrized edge list;
    representative election is ONE max_by aggregate on the cluster id
    (constant-size cells, map-side combined) joined back — no window
    over members.
    """
    from .dedup import dedup_clusters

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
