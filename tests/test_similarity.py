"""Similarity-search extension operators over the embeddings table."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kevinlang_spark.operators import similarity


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def query_vec(emb):
    return [float(v) for v in emb.where(F.col("vec_id") == 0).first()["embedding"]]


def _brute_py(rows, q, k):
    qn = math.sqrt(sum(v * v for v in q))
    out = []
    for r in rows:
        v = [float(x) for x in r["embedding"]]
        d = sum(a * b for a, b in zip(v, q))
        n = math.sqrt(sum(x * x for x in v))
        out.append((r["vec_id"], d / (n * qn)))
    out.sort(key=lambda t: (-t[1], t[0]))
    return out[:k]


def test_cosine_topk_matches_python(emb, query_vec):
    got = similarity.cosine_topk(emb, query_vec, k=10).collect()
    expected = _brute_py(emb.collect(), query_vec, 10)
    assert [r["vec_id"] for r in got] == [i for i, _ in expected]
    # vec_id 0 is the query itself → sim 1.0 at the top
    assert got[0]["vec_id"] == 0
    assert got[0]["sim"] == pytest.approx(1.0, abs=1e-5)
    for r, (_, s) in zip(got, expected):
        assert r["sim"] == pytest.approx(s, abs=1e-4)


def test_cosine_topk_no_udf_in_plan(emb, query_vec):
    plan = (
        similarity.cosine_topk(emb, query_vec, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan


def test_ann_lsh_recall_on_near_neighbors(spark, emb, query_vec):
    """LSH recall is defined for HIGH-similarity items (uniform-random
    vectors have top-cosine ~0.4 and scatter across buckets by design).
    Plant 20 strongly-perturbed copies of the query (cos ≈ 0.99) and
    require the probe to surface them."""
    import random

    # embeddings are unit-normalized → σ=0.01/dim ≈ 0.08 rad perturbation
    # (cos ≈ 0.997); σ=0.05 would be a 0.4-rad/cos 0.92 "neighbor", which
    # 8-plane LSH correctly scatters
    rng = random.Random(123)
    planted = [
        (10000 + i, [v + rng.gauss(0, 0.01) for v in query_vec], 0)
        for i in range(20)
    ]
    extra = spark.createDataFrame(planted, ["vec_id", "embedding", "label"]).select(
        "vec_id", F.col("embedding").cast("array<float>"), "label"
    )
    both = emb.unionByName(extra)
    approx = similarity.ann_topk_lsh(both, query_vec, k=21, n_planes=8, probe_hamming=1)
    got = {r["vec_id"] for r in approx.collect()}
    assert 0 in got  # the query itself
    found = sum(1 for i in range(20) if 10000 + i in got)
    assert found >= 16, f"only {found}/20 planted neighbors found: {sorted(got)}"


def test_ann_scans_fewer_rows(emb, query_vec):
    planes = similarity._planes(len(query_vec), 8, 7)
    bucketed = emb.withColumn(
        "b", similarity.hyperplane_signature(F.col("embedding"), planes)
    )
    total = emb.count()
    biggest = (
        bucketed.groupBy("b").count().agg(F.max("count").alias("m")).first()["m"]
    )
    # 8 planes → 256 buckets; even skewed buckets stay far below the table
    assert biggest < total / 2


def test_ivf_topk_recall(spark, emb, query_vec):
    """IVF (k-means coarse quantizer): planted near-copies of the query
    land in the query's cell; probing a few cells must surface them."""
    import random

    rng = random.Random(321)
    planted = [
        (20000 + i, [v + rng.gauss(0, 0.01) for v in query_vec], 0)
        for i in range(20)
    ]
    extra = spark.createDataFrame(planted, ["vec_id", "embedding", "label"]).select(
        "vec_id", F.col("embedding").cast("array<float>"), "label"
    )
    both = emb.unionByName(extra)
    assigned, centroids = similarity.ivf_index(both, nlist=16)
    got = {
        r["vec_id"]
        for r in similarity.ivf_topk(assigned, centroids, query_vec, k=21, nprobe=4).collect()
    }
    assert 0 in got
    found = sum(1 for i in range(20) if 20000 + i in got)
    assert found >= 18, f"IVF recall too low: {found}/20"


def test_ivf_scans_fraction(spark, emb):
    assigned, _ = similarity.ivf_index(emb, nlist=16)
    sizes = [r["count"] for r in assigned.groupBy("__cell").count().collect()]
    assert len(sizes) >= 8  # clustering actually spread the data
    assert max(sizes) < emb.count()  # no degenerate single cell


def test_embedding_neardup_self_duplicates(spark, emb):
    dup = emb.limit(10).select((F.col("vec_id") + 1000).alias("vec_id"), "embedding", "label")
    both = emb.limit(10).unionByName(dup)
    pairs = similarity.embedding_neardup_pairs(both, threshold=0.999)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    for i in range(10):
        assert (i, i + 1000) in got


def test_sign_bucket_pairs_matches_brute_within_buckets(spark, emb):
    """sign_bucket_pairs = (same sign pattern on first `bits` dims) AND
    (rounded cosine >= threshold), verified against a python recompute
    on a bounded subset."""
    sub = emb.where(F.col("vec_id") < 80)
    got = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in similarity.sign_bucket_pairs(sub, bits=4, threshold=0.2).collect()
    }
    rows = sub.select("vec_id", "embedding").collect()
    by_id = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}

    def bucket(v):
        return "".join("1" if x >= 0 else "0" for x in v[:4])

    want = {}
    ids = sorted(by_id)
    for i in ids:
        for j in ids:
            if i >= j or bucket(by_id[i]) != bucket(by_id[j]):
                continue
            vi, vj = by_id[i], by_id[j]
            d = sum(a * b for a, b in zip(vi, vj))
            n = math.sqrt(sum(x * x for x in vi)) * math.sqrt(
                sum(x * x for x in vj)
            )
            sim = round(d / n, 4)
            if sim >= 0.2:
                want[(i, j)] = sim
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=2e-4)


def test_sign_bucket_pairs_never_crosses_buckets(spark, emb):
    out = similarity.sign_bucket_pairs(emb, bits=6, threshold=-1.0)
    joined = (
        out.join(
            emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va")),
            "id_a",
        )
        .join(
            emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb")),
            "id_b",
        )
        .select(
            similarity.sign_bucket(F.col("va"), 6).alias("ba"),
            similarity.sign_bucket(F.col("vb"), 6).alias("bb"),
        )
    )
    assert joined.where(F.col("ba") != F.col("bb")).count() == 0
