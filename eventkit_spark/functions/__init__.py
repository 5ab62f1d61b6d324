"""Column-function library: the engine's reusable Column expressions,
analogous to ``pyspark.sql.functions`` for eventkit-specific semantics.

These are the building blocks the operators compose; exposed here so
users can mix them into their own DataFrame code without going through
EventFrame.
"""

from ..llm.similarity import cosine, dot, norm
from ..llm.text import (
    BPE_REGEX,
    bpe_token_count,
    fingerprint,
    lang_id,
    mean_word_length,
    punct_ratio,
    quality_score,
    stopword_ratio,
    whitespace_token_count,
)
from ..llm.dedup import _shingles as shingles
from ..operators.aggregate import _product_expr as running_product_expr

__all__ = [
    "BPE_REGEX",
    "bpe_token_count",
    "cosine",
    "dot",
    "fingerprint",
    "lang_id",
    "mean_word_length",
    "norm",
    "punct_ratio",
    "quality_score",
    "running_product_expr",
    "shingles",
    "stopword_ratio",
    "whitespace_token_count",
]
