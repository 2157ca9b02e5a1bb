"""int8 embedding quantization + BPE-ish token estimator."""

from __future__ import annotations

from pyspark.sql import functions as F

from kevinlang_spark.functions.textexpr import bpe_ish_token_count, token_count
from kevinlang_spark.functions.vectors import dequantize, quantize_int8
from kevinlang_spark.plans.inspect import executed_plan


def test_quantize_roundtrip_error_bound(spark, sf_dir):
    """Reconstruction error of symmetric int8 is ≤ scale/2 per element."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    codes, scale = quantize_int8(F.col("embedding"))
    q = emb.select("vec_id", "embedding", codes.alias("codes"), scale)
    err = q.select(
        F.array_max(
            F.zip_with(
                dequantize(F.col("codes"), F.col("scale")),
                F.col("embedding"),
                lambda a, b: F.abs(a - b.cast("double")),
            )
        ).alias("max_err"),
        F.col("scale"),
    )
    bad = err.where(F.col("max_err") > F.col("scale") * 0.5 + 1e-12).count()
    assert bad == 0


def test_quantize_codes_in_int8_range(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    codes, _ = quantize_int8(F.col("embedding"))
    out = emb.select(F.explode(codes).alias("c"))
    mn, mx = out.agg(F.min("c"), F.max("c")).first()
    assert -127 <= mn and mx <= 127


def test_quantize_is_pure_codegen(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    codes, scale = quantize_int8(F.col("embedding"))
    plan = executed_plan(emb.select(codes.alias("c"), scale))
    assert "EvalPython" not in plan and "Exchange" not in plan, plan


def test_bpe_ish_counts_punctuation_separately(spark):
    df = spark.createDataFrame(
        [(1, "Hello, world! It's 2024... right?")], "id long, text string"
    )
    r = df.select(
        token_count(F.col("text")).alias("ws"),
        bpe_ish_token_count(F.col("text")).alias("bpe"),
    ).first()
    # alnum runs: hello world it s 2024 right = 6; plus , ! ' ... ? = 5
    assert r.ws == 6
    assert r.bpe == 11
    # plain prose with no punctuation: estimates agree
    p = spark.createDataFrame([(1, "plain words only here")], "id long, text string")
    r2 = p.select(
        token_count(F.col("text")).alias("ws"),
        bpe_ish_token_count(F.col("text")).alias("bpe"),
    ).first()
    assert r2.ws == r2.bpe == 4


def test_label_centroids_exact(spark):
    from kevinlang_spark.functions.vectors import label_centroids

    df = spark.createDataFrame(
        [
            (0, [1.0, 2.0, 3.0]),
            (0, [3.0, 4.0, 5.0]),
            (1, [10.0, 0.0, -2.0]),
        ],
        ["label", "embedding"],
    )
    out = {r.label: r for r in label_centroids(df).collect()}
    assert out[0].centroid == [2.0, 3.0, 4.0]
    assert out[0].n_vectors == 2
    assert out[1].centroid == [10.0, 0.0, -2.0]
    assert out[1].n_vectors == 1
