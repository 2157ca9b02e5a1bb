"""Vector Column expressions over ``array<float/double>`` embeddings.

Built on Spark's higher-order functions (``zip_with`` + ``aggregate``) —
vectorized JVM execution, no UDF, no Python.  At 100 TB these run inside
the scan stage with full codegen; the only shuffle in a top-k similarity
query is the final TakeOrderedAndProject merge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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


def quantize_int8(v: Column) -> tuple[Column, Column]:
    """Symmetric int8 scalar quantization: returns (codes, scale) with
    ``code = floor(x / scale + 0.5)`` and ``scale = max|x| / 127`` — the
    4× storage lever for embedding tables (float32 → int8).

    floor(x + 0.5) instead of round(): identical across engines (no
    HALF_UP-vs-banker's ambiguity), so quantized tables are reproducible
    bit-for-bit wherever they're built.  All-zero vectors get scale 0 and
    all-zero codes.  Pure codegen — runs in the scan stage.
    """
    mx = F.greatest(F.abs(F.array_max(v)), F.abs(F.array_min(v))).cast("double")
    scale = (mx / F.lit(127.0)).alias("scale")
    codes = F.when(mx == 0, F.transform(v, lambda x: F.lit(0))).otherwise(
        F.transform(
            v,
            lambda x: F.floor(x.cast("double") / (mx / F.lit(127.0)) + F.lit(0.5)).cast(
                "int"
            ),
        )
    )
    return codes, scale


def dequantize(codes: Column, scale: Column) -> Column:
    """Reconstruct approximate float vectors from int8 codes."""
    return F.transform(codes, lambda c: c.cast("double") * scale)


def label_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    decimals: int = 6,
) -> DataFrame:
    """Per-label mean vector — the centroid-recompute step of IVF/k-means
    maintenance and the class-prototype builder for dedup/classification.

    Shape: posexplode to (label, pos, val) — a NARROW row expansion that
    shuffles scalar triples with map-side partial AVG, never whole
    vectors — then the per-label array is reassembled ordered by
    position.  Both aggregations hash on the label (the second adds the
    position), so at any scale the state per task is one running mean
    per (label, dim).  Returns (label, centroid, n_vectors).
    """
    exploded = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("pos", "val"),
    )
    per_dim = exploded.groupBy("label", "pos").agg(
        F.avg("val").alias("m"), F.count("*").alias("n")
    )
    return (
        per_dim.groupBy("label")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", "m"))
                ),
                lambda s: F.round(s["m"], decimals),
            ).alias("centroid"),
            F.max("n").alias("n_vectors"),
        )
    )
