"""Unit semantics for kcore peeling and reciprocal_rank_fusion."""

import pytest

from pyspark.sql import functions as F

from kevinlang_spark.operators.graph import kcore
from kevinlang_spark.operators.stats import reciprocal_rank_fusion


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "a bigint, b bigint")


def test_kcore_extracts_clique_and_peels_tail(spark):
    # K4 clique {1,2,3,4} + pendant chain 4-5-6: 2-core == the clique.
    pairs = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)]
    out = {r.node: r.degree for r in kcore(_edges(spark, pairs), k=2).collect()}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_cascade_needs_multiple_rounds(spark):
    # Path 1-2-3-4-5: every peel exposes new degree-1 endpoints; the
    # 2-core is empty but only after ~len(path)/2 cascading rounds.
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5)]
    assert kcore(_edges(spark, pairs), k=2, rounds=4).count() == 0


def test_kcore_bounded_rounds_stop_early(spark):
    # With rounds=1 the same path keeps its interior: one peel drops
    # nodes 1 and 5 only — fixed rounds are a documented contract.
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5)]
    alive = {
        r.node for r in kcore(_edges(spark, pairs), k=2, rounds=1).collect()
    }
    assert alive == {2, 3, 4}


def test_kcore_rejects_bad_params(spark):
    df = _edges(spark, [(1, 2)])
    with pytest.raises(ValueError):
        kcore(df, k=0)
    with pytest.raises(ValueError):
        kcore(df, k=2, rounds=0)


def test_rrf_matches_closed_form(spark):
    a = spark.createDataFrame([(10, 1), (11, 2), (12, 3)], "id bigint, rank int")
    b = spark.createDataFrame([(11, 1), (10, 2), (13, 3)], "id bigint, rank int")
    out = {
        r.id: (r.n_lists, r.rrf)
        for r in reciprocal_rank_fusion([a, b], "id").collect()
    }
    assert out[10] == (2, round(1 / 61 + 1 / 62, 6))
    assert out[11] == (2, round(1 / 62 + 1 / 61, 6))
    assert out[12] == (1, round(1 / 63, 6))  # missing from b: no penalty term
    assert out[13] == (1, round(1 / 63, 6))


def test_rrf_requires_a_ranking(spark):
    with pytest.raises(ValueError):
        reciprocal_rank_fusion([], "id")


def test_lpa_two_triangles(spark):
    from kevinlang_spark.operators.graph import label_propagation

    pairs = [(1, 2), (1, 3), (2, 3), (10, 11), (10, 12), (11, 12), (3, 10)]
    out = {
        r.node: r.label
        for r in label_propagation(_edges(spark, pairs), rounds=5).collect()
    }
    # each triangle converges to one label; the bridge does not merge them
    assert out[1] == out[2] == out[3]
    assert out[10] == out[11] == out[12]
    assert out[1] != out[10]


def test_lpa_isolated_pairs_keep_min_label(spark):
    from kevinlang_spark.operators.graph import label_propagation

    out = {
        r.node: r.label
        for r in label_propagation(
            _edges(spark, [(5, 9), (20, 21)]), rounds=2
        ).collect()
    }
    # a 2-node component oscillates label-swap each round; 2 rounds
    # returns each node its OWN label back — determinism is the contract
    assert out == {5: 5, 9: 9, 20: 20, 21: 21}


def test_lpa_rejects_bad_rounds(spark):
    from kevinlang_spark.operators.graph import label_propagation

    with pytest.raises(ValueError):
        label_propagation(_edges(spark, [(1, 2)]), rounds=0)


def test_hits_star_graph(spark):
    from kevinlang_spark.operators.graph import hits

    de = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (5, 2)], "src bigint, dst bigint"
    )
    out = {
        r.node: (round(r.hub, 4), round(r.auth, 4))
        for r in hits(de, iterations=8).collect()
    }
    hubs = sum(h for h, _ in out.values())
    auths = sum(a for _, a in out.values())
    assert abs(hubs - 1.0) < 1e-6 and abs(auths - 1.0) < 1e-6  # L1-normalized
    assert out[1][0] > out[5][0]  # 3-link hub beats 1-link hub
    assert out[2][1] > out[3][1]  # 2-in-link authority beats 1-in-link
    assert out[1][1] == 0.0 and out[2][0] == 0.0  # pure-hub / pure-auth sides


def test_hits_rejects_bad_iterations(spark):
    from kevinlang_spark.operators.graph import hits

    with pytest.raises(ValueError):
        hits(spark.createDataFrame([(1, 2)], "src bigint, dst bigint"), iterations=0)


def test_adamic_adar_scores_and_exclusions(spark):
    import math

    from kevinlang_spark.operators.graph import adamic_adar

    # path 1-2-3 plus hub 9 -> {1,3,4}
    e = _edges(spark, [(1, 2), (2, 3), (9, 1), (9, 3), (9, 4)])
    out = {(r.a, r.b): (r.n_common, r.score) for r in adamic_adar(e, k=10).collect()}
    # (1,3): common z=2 (deg 2) and z=9 (deg 3)
    assert out[(1, 3)] == (2, round(1 / math.log(2) + 1 / math.log(3), 6))
    assert out[(1, 4)] == (1, round(1 / math.log(3), 6))
    assert (1, 2) not in out  # existing edges never scored
    assert (9, 4) not in out


def test_adamic_adar_hub_cap_drops_big_neighbors(spark):
    from kevinlang_spark.operators.graph import adamic_adar

    # star hub 0 with 5 leaves: all leaf pairs share only the hub
    e = _edges(spark, [(0, i) for i in range(1, 6)])
    assert adamic_adar(e, k=100, max_deg=4).count() == 0  # hub deg 5 > cap
    assert adamic_adar(e, k=100, max_deg=5).count() == 10  # 5C2 pairs


def test_adamic_adar_param_guard(spark):
    from kevinlang_spark.operators.graph import adamic_adar

    with pytest.raises(ValueError):
        adamic_adar(_edges(spark, [(1, 2)]), k=0)


def test_wl_refinement_structural_fingerprints(spark):
    from kevinlang_spark.operators.graph import wl_refinement

    # two disjoint triangles (isomorphic) + a 3-path
    pairs = [(1, 2), (2, 3), (1, 3), (11, 12), (12, 13), (11, 13),
             (21, 22), (22, 23)]
    out = {
        r.node: r.wl_label
        for r in wl_refinement(_edges(spark, pairs), rounds=3).collect()
    }
    assert len({out[n] for n in (1, 2, 3, 11, 12, 13)}) == 1  # isomorphic
    assert out[21] == out[23] != out[22]  # path ends vs middle
    assert out[1] != out[21] and out[1] != out[22]  # distinct structures


def test_wl_refinement_param_guard(spark):
    from kevinlang_spark.operators.graph import wl_refinement

    with pytest.raises(ValueError):
        wl_refinement(_edges(spark, [(1, 2)]), rounds=0)


def test_shortest_paths_weighted_diamond(spark):
    from kevinlang_spark.operators.graph import shortest_paths

    e = spark.createDataFrame(
        [(1, 2, 1.0), (1, 3, 4.0), (2, 3, 1.0), (3, 4, 1.0)],
        "src bigint, dst bigint, w double",
    )
    out = {
        r.node: r.dist
        for r in shortest_paths(e, source=1, rounds=4, weight="w").collect()
    }
    assert out == {1: 0.0, 2: 1.0, 3: 2.0, 4: 3.0}  # 1->2->3 beats 1->3
    hops = {
        r.node: r.dist for r in shortest_paths(e, source=1, rounds=4).collect()
    }
    assert hops == {1: 0.0, 2: 1.0, 3: 1.0, 4: 2.0}


def test_shortest_paths_bounded_rounds_and_guard(spark):
    from kevinlang_spark.operators.graph import shortest_paths

    chain = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(5)], "src bigint, dst bigint, w double"
    )
    # 2 rounds reach only 2 hops
    out = {r.node: r.dist for r in shortest_paths(chain, 0, rounds=2, weight="w").collect()}
    assert out == {0: 0.0, 1: 1.0, 2: 2.0}
    with pytest.raises(ValueError):
        shortest_paths(chain, 0, rounds=0)


def test_harmonic_centrality_path_sources(spark):
    from kevinlang_spark.operators.graph import harmonic_centrality

    e = _edges(spark, [(1, 2), (2, 3), (3, 4)])
    out = {
        r.node: (r.n_reached, r.score)
        for r in harmonic_centrality(e, [1, 4], rounds=4).collect()
    }
    assert out[2] == (2, 1.5)  # d=1 from 1, d=2 from 4
    assert out[3] == (2, 1.5)
    assert out[1] == (1, round(1 / 3, 6))  # own source excluded
    with pytest.raises(ValueError):
        harmonic_centrality(e, [], rounds=2)


def test_kcore_early_exit_equals_full_unroll_random(spark):
    """The fixed-point break is result-identical to running every round:
    peeling is monotone, so once a round removes nothing the remaining
    rounds are no-ops.  Random graphs, python reference peeler."""
    import random

    rng = random.Random(7)
    for trial in range(3):
        pairs = sorted(
            {
                tuple(sorted(rng.sample(range(30), 2)))
                for _ in range(60 + trial * 20)
            }
        )
        got = {
            (r["node"], r["degree"])
            for r in kcore(_edges(spark, pairs), k=3, rounds=12).collect()
        }
        # reference: peel to true fixed point
        adj = {}
        for a, b in pairs:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        alive = set(adj)
        while True:
            drop = {n for n in alive if len(adj[n] & alive) < 3}
            if not drop:
                break
            alive -= drop
        want = {(n, len(adj[n] & alive)) for n in alive}
        assert got == want, f"trial {trial}"


def test_components_sum_invariant_on_random_graphs(spark):
    """neardup_components' label-sum convergence check terminates at the
    true fixed point: labels equal python union-find on random graphs
    (including a long path, the worst case for propagation rounds)."""
    import random

    from kevinlang_spark.operators.dedup import neardup_components

    rng = random.Random(13)
    cases = [
        [(i, i + 1) for i in range(15)],  # path: needs many rounds
        sorted({tuple(sorted(rng.sample(range(40), 2))) for _ in range(50)}),
    ]
    for pairs in cases:
        df = spark.createDataFrame(pairs, "id_a bigint, id_b bigint")
        got = {
            (r["id"], r["comp"]) for r in neardup_components(df).collect()
        }
        parent = {}

        def find(x):
            while parent.get(x, x) != x:
                parent[x] = parent.get(parent[x], parent[x])
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        nodes = {n for p in pairs for n in p}
        want = {(n, find(n)) for n in nodes}
        assert got == want
