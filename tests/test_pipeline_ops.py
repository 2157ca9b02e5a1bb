"""Training-pipeline operators beyond the reference surface: repetition
stats, deterministic hash sampling/splits, batch k-NN join, and n-gram
decontamination.  No counterpart in /root/reference (its engine stops at
tabular combinators); these are the large-corpus ops SURVEY.md §2's
extension inventory claims."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from kevinlang_spark.operators.sampling import (
    deterministic_sample,
    hash_bucket,
    hash_split,
    split_assignment,
)
from kevinlang_spark.operators.similarity import knn_join, knn_join_batched
from kevinlang_spark.operators.text import ngram_contamination, repetition_stats


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# ---------------------------------------------------------------- repetition


def test_repetition_stats_hand_case(spark):
    df = spark.createDataFrame(
        [
            # 4 non-empty lines, "dup dup" repeated → 2 distinct → frac 0.5
            Row(doc_id=1, text="dup dup\nother line\ndup dup\n\n  \nlast"),
            # one line, bigrams: "a b","b a","a b" → top 2/3
            Row(doc_id=2, text="a b a b"),
            Row(doc_id=3, text=""),
            Row(doc_id=4, text=None),
        ]
    )
    out = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert out[1]["n_lines"] == 4
    assert out[1]["dup_line_frac"] == pytest.approx(1 - 3 / 4)
    assert out[2]["n_lines"] == 1
    assert out[2]["dup_line_frac"] == 0.0
    assert out[2]["top_bigram_frac"] == pytest.approx(round(2 / 3, 4))
    # empty / NULL text → NULL features, rows preserved
    assert out[3]["n_lines"] == 0
    assert out[3]["top_bigram_frac"] is None
    assert out[4]["n_lines"] is None
    assert out[4]["dup_line_frac"] is None


def test_repetition_stats_row_preserving(docs):
    assert repetition_stats(docs).count() == docs.count()


def test_repetition_stats_no_udf(docs):
    from kevinlang_spark.plans.inspect import executed_plan

    explained = executed_plan(repetition_stats(docs))
    assert "BatchEvalPython" not in explained
    assert "ArrowEvalPython" not in explained


# ------------------------------------------------------------------ sampling


def test_hash_split_deterministic_and_partitions(docs):
    a = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
    assert a == b
    # every row gets exactly one label from the weight set
    assert set(a.values()) <= {"train", "val", "test"}
    n = len(a)
    frac_train = sum(1 for v in a.values() if v == "train") / n
    assert 0.8 < frac_train < 0.97


def test_split_weights_validation(docs):
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(docs, weights={"a": 0.5, "b": 0.1})


def test_deterministic_sample_is_stable_subset(docs):
    s1 = {r["doc_id"] for r in deterministic_sample(docs, 0.3).collect()}
    s2 = {r["doc_id"] for r in deterministic_sample(docs, 0.3).collect()}
    assert s1 == s2
    bigger = {r["doc_id"] for r in deterministic_sample(docs, 0.6).collect()}
    # nested: raising the fraction only ADDS ids (same hash ordering)
    assert s1 <= bigger
    n = docs.count()
    assert 0.15 < len(s1) / n < 0.45


def test_deterministic_sample_fraction_validation(docs):
    with pytest.raises(ValueError, match="fraction"):
        deterministic_sample(docs, 1.5)


def test_hash_bucket_matches_duckdb(spark):
    """Engine-portability contract: Spark bucket == DuckDB bucket."""
    duckdb = pytest.importorskip("duckdb")
    ids = list(range(100))
    sdf = spark.createDataFrame([(i,) for i in ids], "id long")
    got = {
        r["id"]: r["b"]
        for r in sdf.select(
            "id", hash_bucket(F.col("id")).alias("b")
        ).collect()
    }
    want = dict(
        duckdb.sql(
            "SELECT i, CAST('0x' || substr(md5(CAST(i AS VARCHAR)), 1, 15) AS BIGINT) % 10000 "
            "FROM range(100) t(i)"
        ).fetchall()
    )
    assert got == want


def test_sample_filter_is_scan_stage(docs):
    """The sample predicate is a pure expression — no shuffle in the plan."""
    from kevinlang_spark.plans.inspect import executed_plan

    plan = executed_plan(deterministic_sample(docs, 0.25))
    assert "Exchange" not in plan


# ------------------------------------------------------------------ knn join


def _py_topk(rows, qv, k):
    scored = []
    qn = math.sqrt(sum(x * x for x in qv))
    for r in rows:
        v = r["embedding"]
        n = math.sqrt(sum(x * x for x in v))
        if n == 0 or qn == 0:
            continue
        scored.append((sum(a * b for a, b in zip(v, qv)) / (n * qn), r["vec_id"]))
    scored.sort(key=lambda t: (-t[0], t[1]))
    return [vid for _, vid in scored[:k]]


def test_knn_join_matches_python(emb):
    probes = emb.where(F.col("vec_id") < 3)
    out = knn_join(emb, probes, k=5).collect()
    rows = emb.select("vec_id", "embedding").collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["qid"], []).append((r["rank"], r["vec_id"]))
    for q in probes.collect():
        want = _py_topk(rows, list(q["embedding"]), 5)
        got = [vid for _, vid in sorted(by_q[q["vec_id"]])]
        assert got == want, f"qid={q['vec_id']}"


def test_knn_join_batched_equals_window_form(emb):
    probes = emb.where(F.col("vec_id") < 4)
    qlist = [(r["vec_id"], list(r["embedding"])) for r in probes.collect()]
    a = {tuple(r) for r in knn_join(emb, probes, k=7).collect()}
    b = {tuple(r) for r in knn_join_batched(emb, qlist, k=7).collect()}
    assert a == b


def test_knn_join_broadcasts_probes(emb):
    probes = emb.where(F.col("vec_id") < 3)
    from kevinlang_spark.plans.inspect import executed_plan

    plan = executed_plan(knn_join(emb, probes, k=5))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_knn_join_batched_rejects_zero_query(emb):
    with pytest.raises(ValueError, match="zero-norm"):
        knn_join_batched(emb, [(0, [0.0, 0.0])], k=3)


# ------------------------------------------------------------ contamination


def test_contamination_hand_case(spark):
    corpus = spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox jumps over the lazy dog today"),
            Row(doc_id=2, text="completely different words with no overlap here at all"),
            Row(doc_id=3, text=None),
        ]
    )
    probes = spark.createDataFrame(
        [Row(doc_id=100, text="quick brown fox jumps over the lazy dog")]
    )
    out = {r["doc_id"]: r["n_shared_ngrams"] for r in
           ngram_contamination(corpus, probes, n=8).collect()}
    # doc 1 contains the probe's full 8-gram (2 windows of it match 1 distinct
    # probe gram each → both corpus grams hit)
    assert 1 in out and out[1] >= 1
    assert 2 not in out and 3 not in out


def test_contamination_probe_broadcast(docs):
    probes = docs.where(F.col("doc_id") < 5)
    from kevinlang_spark.plans.inspect import executed_plan

    plan = executed_plan(ngram_contamination(docs, probes, n=8))
    assert "BroadcastHashJoin" in plan


def test_repetition_methods_agree(docs):
    """The zero-shuffle in-row method and the relational twin must give
    identical profiles."""
    a = repetition_stats(docs, method="inrow")
    b = repetition_stats(docs, method="relational")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_repetition_inrow_stays_in_scan_stage(docs):
    from kevinlang_spark.plans.inspect import executed_plan

    plan = executed_plan(repetition_stats(docs, method="inrow"))
    # spread() may add one repartition on a single-file source; beyond
    # that the operator must not shuffle (no aggregation exchanges)
    assert plan.count("Exchange") <= 1, plan
    assert "HashAggregate" not in plan, plan


# ------------------------------------------------------------- stratified
def test_stratified_sample_exact_counts_and_determinism(docs):
    from kevinlang_spark.operators.sampling import stratified_sample

    out = stratified_sample(docs, ("source",), 5)
    counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    per_stratum = {r["source"]: r["n"] for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for s, n in counts.items():
        assert n == min(5, per_stratum[s]), (s, n)
    ids1 = sorted(r["doc_id"] for r in out.collect())
    ids2 = sorted(r["doc_id"] for r in stratified_sample(docs, ("source",), 5).collect())
    assert ids1 == ids2
