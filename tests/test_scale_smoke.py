"""Scale smoke: 10M synthetic rows through the engine's unordered
(cluster-mode) paths.  Catches accidental collect()s, single-partition
windows, or driver-side loops that small fixtures would hide."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kevinlang_spark.frame import KevinFrame, SortOrder
from kevinlang_spark.plans import executed_plan

N = 10_000_000


@pytest.fixture(scope="module")
def big(spark):
    return (
        spark.range(N, numPartitions=32)
        .select(
            F.col("id"),
            (F.col("id") % 1000).alias("k"),
            (F.pmod(F.xxhash64("id"), F.lit(10000)) / 100.0).alias("v"),
        )
    )


def test_big_groupby_aggregate(big):
    kf = KevinFrame.from_df(big, ordered=False)
    out = kf.groupby("k").aggregate("sum", "v", alias="s")
    rows = out.df.count()
    assert rows == 1000
    plan = executed_plan(out.df)
    assert "Window" not in plan


def test_big_join_and_filter(big, spark):
    kf = KevinFrame.from_df(big, ordered=False)
    dim = KevinFrame.from_df(
        spark.range(1000).select(F.col("id").alias("k"), (F.col("id") % 7).alias("grp")),
        ordered=False,
    )
    out = (
        kf.filter(F.col("v") > 50)
        .merge(dim, on="k", broadcast_other=True)
        .groupby("grp")
        .aggregate("count", "v", alias="n")
    )
    res = out.df.collect()
    assert len(res) == 7
    total = sum(r["n"] for r in res)
    assert total == big.where(F.col("v") > 50).count()
    plan = executed_plan(out.df)
    assert "BroadcastHashJoin" in plan


def test_big_topk_parallel(big):
    """take on an ordered big frame must be TakeOrderedAndProject, not a
    single-partition window."""
    kf = KevinFrame.from_df(big)  # ordered: __idx = mid(), no shuffle
    top = kf.sort("v", SortOrder.DESCENDING).take(5)
    plan = executed_plan(top.df)
    assert "TakeOrderedAndProject" in plan
    rows = top.select(["v"]).collect()
    assert len(rows) == 5
    assert rows[0]["v"] == 99.99


@pytest.fixture(scope="module")
def big_docs(spark):
    """2M synthetic docs (~40 tokens each) without any driver-side data."""
    words = F.array(*[F.lit(w) for w in "alpha beta gamma delta epsilon zeta eta theta".split()])
    return (
        spark.range(2_000_000, numPartitions=32)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.lit(40)),
                    lambda i: F.element_at(words, (F.pmod(F.xxhash64(F.col("id"), i), 8) + 1).cast("int")),
                ),
            ).alias("text"),
            F.concat(F.lit("src"), (F.col("id") % 16).cast("string")).alias("source"),
        )
    )


def test_big_chunk_tokens_no_shuffle(big_docs):
    from kevinlang_spark.operators.chunking import chunk_tokens

    out = chunk_tokens(big_docs, chunk_size=16)
    # 40 tokens / 16 → 3 chunks per doc, computed without any Exchange
    plan = executed_plan(out)
    assert "Exchange" not in plan, plan
    assert out.count() == 3 * 2_000_000


def test_big_pack_sequences_bounded_windows(big_docs):
    from kevinlang_spark.operators.chunking import pack_sequences

    out = pack_sequences(big_docs, max_tokens=2048, n_shards=64)
    plan = executed_plan(out)
    # sharded window: exactly one shuffle, never an unpartitioned sort
    assert plan.count("Exchange") == 1, plan
    assert "partitionBy=[]" not in plan.replace(" ", ""), plan
    agg = out.groupBy("source", "shard", "seq_id").agg(
        F.sum("n_tokens").alias("seq_tokens")
    )
    # every doc is 40 tokens; a 2048 budget holds ≤ 52 doc-starts, so no
    # sequence's token total can exceed budget + one straddling doc
    mx = agg.agg(F.max("seq_tokens")).first()[0]
    assert mx <= 2048 + 40, mx


def test_big_bloom_probe_broadcasts_filter(big, spark):
    from kevinlang_spark.operators.sketches import bloom_build, bloom_probe

    filt = bloom_build(big.where(F.col("k") < 100).select("k"), "k")
    probes = spark.range(1000).select(F.col("id").alias("k"))
    out = bloom_probe(filt, probes, "k")
    plan = executed_plan(out)
    # the filter side must broadcast — a billion probes never shuffle
    assert "BroadcastExchange" in plan
    res = {r.value: r.maybe_present for r in out.collect()}
    assert all(res[v] for v in range(100))  # no false negatives


def test_big_sorted_neighborhood_bounded_join(big_docs):
    """SN over 200k docs: the block join must be a hash join on
    (bucket, block) — never a sort-merge over whole buckets or a
    nested-loop — and finish in bounded time."""
    from kevinlang_spark.operators.dedup import sorted_neighborhood_pairs

    sample = big_docs.where(F.col("doc_id") % 10 == 0)
    out = sorted_neighborhood_pairs(sample, window=3, max_dist=24)
    plan = executed_plan(out)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert out.count() > 0  # 8-word vocab docs collide heavily


def test_big_adamic_adar_hub_cap_holds(big, spark):
    """Link prediction from a 10M-row scan: the two-hop join must be a
    hash join keyed on the middle node (no cartesian/nested-loop), and
    tightening the hub cap can only shrink the candidate set."""
    from kevinlang_spark.operators.graph import adamic_adar
    from kevinlang_spark.plans import executed_plan as _ep

    edges = big.select(
        (F.col("id") % 2000).alias("a"), (F.col("id") % 3000 + 10000).alias("b")
    ).distinct()
    out = adamic_adar(edges, k=5, max_deg=8)
    plan = _ep(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert out.count() <= 5
    # cap monotonicity: middles with deg > 1 are all deg in {2, 3} here,
    # so max_deg=1 must empty the candidate set entirely
    assert adamic_adar(edges, k=5, max_deg=2).count() <= 5
