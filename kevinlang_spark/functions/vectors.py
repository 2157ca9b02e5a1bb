"""Vector Column expressions over ``array<float/double>`` embeddings.

Built on Spark's higher-order functions (``zip_with`` + ``aggregate``) —
vectorized JVM execution, no UDF, no Python.  At 100 TB these run inside
the scan stage with full codegen; the only shuffle in a top-k similarity
query is the final TakeOrderedAndProject merge.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL-safe zero-norm → NULL."""
    d = dot(a, b)
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na == 0) | (nb == 0), F.lit(None)).otherwise(d / (na * nb))
