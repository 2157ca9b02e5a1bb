"""Shared Column-expression helpers (all JVM-side, whole-stage-codegen
friendly — no Python UDFs here)."""

from kevinlang_spark.functions.vectors import cosine_similarity, dot, l2_norm
from kevinlang_spark.functions.textexpr import (
    normalize_text,
    tokenize,
    token_count,
    word_shingles,
)

__all__ = [
    "cosine_similarity",
    "dot",
    "l2_norm",
    "normalize_text",
    "tokenize",
    "token_count",
    "word_shingles",
]
