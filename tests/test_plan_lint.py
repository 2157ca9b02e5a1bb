"""Fleet-wide plan lint: structural scale rules asserted over EVERY
driver query, not just hand-picked ones.

Rules (each with an explicit, reviewed whitelist):

1. No ``CartesianProduct`` anywhere — an all-pairs join is never the
   plan we want at 100 TB.
2. ``BroadcastNestedLoopJoin`` only where the broadcast side is a
   scalar/bounded aggregate (the "broadcast one tiny row to every row"
   pattern — O(rows), zero shuffle, scale-correct).  Any NEW query that
   introduces one fails this test until it is reviewed and listed.
3. No ``BatchEvalPython`` anywhere — row-at-a-time Python UDFs are
   banned outright; Python work must be Arrow-vectorized
   (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas).
"""

from __future__ import annotations

import __spark_entry__ as entrymod
from kevinlang_spark.plans.inspect import executed_plan

#: queries whose BroadcastNestedLoopJoin is the scalar-broadcast pattern
#: (build side is a ≤-few-rows aggregate/probe set, reviewed one by one),
#: mapped to the reviewed BUILD-SIDE ROW BOUND (VERDICT r9 item 8): the
#: lint asserts the executed exchange's numOutputRows metric stays at or
#: under it, so a whitelisted "1-row aggregate" that silently grows can
#: never pass on membership alone.  Bounds are deliberately a small
#: multiple of the observed count (sf-invariant fixed probe sets /
#: scalar aggregates), not equality — reviewed slack, not looseness.
BNLJ_OK = {
    "q_assoc_rules": 2048,  # broadcast per-item support counts (bounded by catalog)
    "q_backtest": 4,  # broadcast 1-row max-bucket bound
    "q_bm25_search": 4,  # broadcast 1-row corpus (N, avgdl) aggregate
    "q_source_kl": 4,  # broadcast 1-row (N, V) + 1-row L_all scalar aggregates
    "q_lm_perplexity": 4,  # broadcast 1-row N+V aggregate (the lazy replacement
    # for an eager driver collect — the oracle's own CROSS JOIN nv shape)
    "q_hybrid_retrieval": 64,  # 1-row stats + 20-row broadcast self-join ranks
    "q_chi_square": 16,  # 1-row grand-total + bounded contingency margins
    "q_emb_neardup_brute": 512,  # broadcast bounded probe subset
    "q_equidepth": 4,  # broadcast exact boundary row
    "q_retention_curve": 4,  # broadcast 1-row doc-count total (equidepth shape)
    "q_join_estimate": 4,  # 1-row × 1-row sketch crossJoin (scalar algebra)
    "q_lr_eval": 4,  # 1-row confusion × 1-row rank-sum crossJoin (scalar algebra)
    "q_intrinsic_dim": 256,  # broadcast bounded probe subset (TwoNN)
    "q_rank_overlap": 64,  # 10-row broadcast self-join rank (top-k lists)
    "q_rank_fusion": 64,  # 20-row broadcast self-join rank (RRF input lists)
    "q_knn_join": 64,  # broadcast k-probe set
    "q_bitext_mine": 64,  # broadcast 8-row source-probe set (knn_join shape;
    # the margin agg downstream is an ordinary keyed aggregation)
    "q_truncation_recall": 64,  # broadcast 4-row probe set (knn_join shape), per-dim rankings
    "q_jl_distortion": 64,  # 16-row broadcast sample self-join (bounded pair audit)
    "q_hard_negatives": 64,  # broadcast 8-row anchor probe set (knn_join shape;
    # label-mismatch is a scan-stage filter over the broadcast row, so the
    # physical join is the same bounded probe-set BNLJ reviewed for knn_join)
    "q_pagerank": 4,  # broadcast 1-row dangling-mass aggregate per iteration
    "q_crawl_pagerank": 4,  # same pagerank loop over the crawl link edges
    "q_hits": 4,  # broadcast 1-row L1-normalizer aggregate per iteration
    # (q_pca_top_component's 1-row mean broadcast never reaches the lint:
    # the returned frame is the post-collect local loadings table)
    "q_psi_drift": 4,  # broadcast 1-row baseline totals
    "q_rfm": 4,  # broadcast 1-row quintile boundary aggregate
    "q_target_encode": 4,  # broadcast 1-row global mean
    "q_token_pmi": 4,  # broadcast 1-row corpus-size aggregate (PMI denominator)
    "q_tpch_q11": 4,  # broadcast 1-row value-threshold aggregate
    "q_tpch_q22": 4,  # broadcast 1-row average-balance aggregate
    "q_zipf_fit": 4,  # 1-row corpus totals × 1-row in-row OLS fit crossJoin
    "q_heaps_fit": 4,  # broadcast 1-row (lo, hi) id-bounds aggregate
    "q_t_closeness": 16,  # broadcast 11-bin cumulated sensitive domain
    "q_kmeans_fit": 4,  # broadcast 1-row collapsed centroid table per round
}


def test_every_query_plan_obeys_scale_rules(spark, sf_dir):
    violations = {}
    for name, fn in sorted(entrymod.queries().items()):
        plan = executed_plan(fn(spark, sf_dir))
        flags = []
        if "CartesianProduct" in plan:
            flags.append("cartesian-product")
        if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_OK:
            flags.append("unreviewed-nested-loop-join")
        if "BatchEvalPython" in plan:
            flags.append("row-at-a-time-python-udf")
        if flags:
            violations[name] = flags
    assert not violations, violations


def test_bnlj_whitelist_is_tight_and_bounded(spark, sf_dir):
    """Two invariants per whitelist entry:

    1. The query still HAS its nested-loop join — entries whose plans
       improved past the pattern must be removed so the whitelist never
       masks a regression elsewhere.
    2. Every BNLJ's executed BUILD-SIDE row count (BroadcastExchange
       numOutputRows) stays at or under the reviewed bound — a
       whitelisted "1-row aggregate" whose build side grows can't pass
       on membership alone (VERDICT r9 item 8)."""
    from kevinlang_spark.plans.inspect import bnlj_build_row_counts

    stale, over = [], {}
    qs = entrymod.queries()
    for name, bound in sorted(BNLJ_OK.items()):
        df = qs[name](spark, sf_dir)
        if "BroadcastNestedLoopJoin" not in executed_plan(df):
            stale.append(name)
            continue
        counts = bnlj_build_row_counts(df)
        if any(c > bound for c in counts):
            over[name] = (counts, bound)
    assert not stale, f"remove from BNLJ_OK (no BNLJ in plan): {stale}"
    assert not over, f"BNLJ build side exceeds reviewed bound: {over}"
