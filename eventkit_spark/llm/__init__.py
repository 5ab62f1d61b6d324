"""LLM-data-pipeline operators (BASELINE.json north star): dedup (exact,
MinHash/SimHash/Jaccard, connected-component clustering, decontamination),
similarity search, text analysis + repetition signals, sampling/packing,
multimodal columns — designed partition-parallel for 100 TB scale (no
global windows; the one driver-side loop is dedup_clusters' Pregel
iteration, O(graph diameter) rounds of one distributed join each).
"""

from . import (
    cluster,
    dedup,
    graph,
    linalg,
    multimodal,
    sampling,
    similarity,
    sketch,
    text,
    tokenize,
    web,
)

__all__ = [
    "cluster", "dedup", "graph", "linalg", "multimodal", "sampling",
    "similarity", "sketch", "text", "tokenize", "web",
]
