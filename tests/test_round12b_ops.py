"""Round-12 second-wave operators: GRPO/RLOO advantages and the
reward-length-bias diagnostic."""

from __future__ import annotations

import math
import statistics

import pytest

from pyspark.sql import functions as F


def _collect(df):
    return [tuple(r) for r in df.collect()]


class TestGrpoAdvantages:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "prompt_id long, cand_id long, reward long"
        )

    def test_zscore_matches_population_stats(self, spark):
        from kevinlang_spark.operators.preference import grpo_advantages

        rows = [(1, 0, 10), (1, 1, 20), (1, 2, 30), (1, 3, 40)]
        out = {
            r["cand_id"]: r
            for r in grpo_advantages(self._df(spark, rows)).collect()
        }
        rewards = [10, 20, 30, 40]
        mu = statistics.mean(rewards)
        sd = statistics.pstdev(rewards)
        for cid, r in zip(range(4), rewards):
            got = out[cid]
            assert got["n_candidates"] == 4
            assert got["mean_reward"] == pytest.approx(mu)
            assert got["std_reward"] == pytest.approx(sd)
            assert got["advantage"] == pytest.approx((r - mu) / sd)

    def test_leave_one_out_baseline(self, spark):
        from kevinlang_spark.operators.preference import grpo_advantages

        rows = [(7, 0, 3), (7, 1, 9)]
        out = {
            r["cand_id"]: r
            for r in grpo_advantages(self._df(spark, rows)).collect()
        }
        # LOO baseline for each is the OTHER sample's reward
        assert out[0]["advantage_loo"] == pytest.approx(3 - 9)
        assert out[1]["advantage_loo"] == pytest.approx(9 - 3)

    def test_constant_rewards_zero_advantage(self, spark):
        from kevinlang_spark.operators.preference import grpo_advantages

        rows = [(1, 0, 5), (1, 1, 5), (1, 2, 5)]
        for r in grpo_advantages(self._df(spark, rows)).collect():
            assert r["std_reward"] == 0.0
            assert r["advantage"] == 0.0
            assert r["advantage_loo"] == pytest.approx(0.0)

    def test_singleton_group(self, spark):
        from kevinlang_spark.operators.preference import grpo_advantages

        rows = [(1, 0, 5)]
        (r,) = grpo_advantages(self._df(spark, rows)).collect()
        assert r["advantage"] == 0.0
        assert r["advantage_loo"] is None

    def test_null_rewards_dropped(self, spark):
        from kevinlang_spark.operators.preference import grpo_advantages

        df = spark.createDataFrame(
            [(1, 0, 10), (1, 1, None), (1, 2, 20)],
            "prompt_id long, cand_id long, reward long",
        )
        out = grpo_advantages(df).collect()
        assert {r["cand_id"] for r in out} == {0, 2}
        assert all(r["n_candidates"] == 2 for r in out)


class TestRewardLengthBias:
    def test_perfect_positive_correlation(self, spark):
        from kevinlang_spark.operators.preference import reward_length_bias

        rows = [("a", "x" * n, 2 * n + 1) for n in (5, 10, 15, 20)]
        df = spark.createDataFrame(
            rows, "source string, response string, reward long"
        )
        (r,) = reward_length_bias(df).collect()
        assert r["n_samples"] == 4
        assert r["pearson_r"] == pytest.approx(1.0)
        assert r["ols_slope"] == pytest.approx(2.0)
        assert r["mean_len"] == pytest.approx(12.5)

    def test_matches_statistics_module(self, spark):
        from kevinlang_spark.operators.preference import reward_length_bias

        lens = [3, 8, 21, 4, 17, 9]
        rewards = [40, 12, 99, 7, 63, 12]
        rows = [("s", "y" * n, rw) for n, rw in zip(lens, rewards)]
        df = spark.createDataFrame(
            rows, "source string, response string, reward long"
        )
        (r,) = reward_length_bias(df).collect()
        want_r = statistics.correlation(lens, rewards)
        want_slope = statistics.linear_regression(lens, rewards).slope
        assert r["pearson_r"] == pytest.approx(want_r)
        assert r["ols_slope"] == pytest.approx(want_slope)

    def test_zero_variance_yields_null(self, spark):
        from kevinlang_spark.operators.preference import reward_length_bias

        rows = [("a", "xxx", 1), ("a", "yyy", 9)]
        df = spark.createDataFrame(
            rows, "source string, response string, reward long"
        )
        (r,) = reward_length_bias(df).collect()
        assert r["pearson_r"] is None
        assert r["ols_slope"] is None
        # reward variance zero, length varying: same guard other side
        rows2 = [("a", "x", 5), ("a", "yy", 5)]
        df2 = spark.createDataFrame(
            rows2, "source string, response string, reward long"
        )
        (r2,) = reward_length_bias(df2).collect()
        assert r2["pearson_r"] is None
        assert r2["ols_slope"] == pytest.approx(0.0)


def _brute_ols(pts):
    """Reference OLS with the same left-fold accumulation order."""
    n = float(len(pts))
    sx = sy = sxy = sxx = syy = 0.0
    for x, y in pts:
        sx += x
        sy += y
        sxy += x * y
        sxx += x * x
        syy += y * y
    cov_n = n * sxy - sx * sy
    vx_n = n * sxx - sx * sx
    vy_n = n * syy - sy * sy
    slope = cov_n / vx_n if vx_n > 0 else None
    inter = (sy - slope * sx) / n if slope is not None else None
    r2 = (
        (cov_n * cov_n) / (vx_n * vy_n)
        if vx_n > 0 and vy_n > 0
        else None
    )
    return slope, inter, r2


class TestZipfFit:
    def test_exact_power_law_recovered(self, spark):
        from kevinlang_spark.operators.text import zipf_fit

        # freq(rank) = 2^(10-rank): ln f = 10 ln 2 - ln 2 * ... not a
        # power law in rank; instead construct freq = C / rank exactly:
        # rank 1..4 with freqs 12, 6, 4, 3 = 12/rank
        words = {"aa": 12, "bb": 6, "cc": 4, "dd": 3}
        rows = [
            (i, w) for i, (w, f) in enumerate(words.items())
            for _ in range(f)
        ]
        df = spark.createDataFrame(
            [(i, " ".join(w for _ in range(1)),) for i, w in rows],
            "doc_id long, text string",
        )
        (r,) = zipf_fit(df, top_k=10).collect()
        assert r["total_tokens"] == 25
        assert r["vocab_size"] == 4
        assert r["n_top"] == 4
        assert r["zipf_slope"] == pytest.approx(-1.0)
        assert r["zipf_r2"] == pytest.approx(1.0)

    def test_matches_brute_ols(self, spark):
        from kevinlang_spark.operators.text import zipf_fit

        corpus = ["the cat sat", "the cat ran", "the dog sat on the mat"]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(corpus)],
            "doc_id long, text string",
        )
        (r,) = zipf_fit(df).collect()
        from collections import Counter

        wc = Counter(w for t in corpus for w in t.split())
        ranked = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))
        pts = [
            (math.log(i + 1), math.log(f))
            for i, (_, f) in enumerate(ranked)
        ]
        slope, inter, r2 = _brute_ols(pts)
        assert r["zipf_slope"] == pytest.approx(slope)
        assert r["zipf_intercept"] == pytest.approx(inter)
        assert r["zipf_r2"] == pytest.approx(r2)

    def test_degenerate_single_word(self, spark):
        from kevinlang_spark.operators.text import zipf_fit

        df = spark.createDataFrame(
            [(1, "same same same")], "doc_id long, text string"
        )
        (r,) = zipf_fit(df).collect()
        assert r["vocab_size"] == 1
        assert r["zipf_slope"] is None  # single point: no x-variance
        assert r["zipf_r2"] is None


class TestHeapsFit:
    def test_matches_brute_curve(self, spark):
        from kevinlang_spark.operators.text import heaps_fit

        corpus = [
            (i, " ".join(f"w{j}" for j in range(0, i + 1)))
            for i in range(16)
        ]
        df = spark.createDataFrame(corpus, "doc_id long, text string")
        (r,) = heaps_fit(df, n_buckets=8).collect()
        # brute: bucket by ((id - 0) * 8) // 16
        from collections import defaultdict

        toks = defaultdict(int)
        first = {}
        for i, t in corpus:
            ws = t.split()
            toks[(i * 8) // 16] += len(ws)
            for w in ws:
                if w not in first:
                    first[w] = (i * 8) // 16
        newv = defaultdict(int)
        for w, b in first.items():
            newv[b] += 1
        ct = cv = 0
        pts = []
        for b in range(8):
            ct += toks[b]
            cv += newv[b]
            if ct > 0 and cv > 0:
                pts.append((math.log(ct), math.log(cv)))
        slope, inter, r2 = _brute_ols(pts)
        assert r["total_tokens"] == sum(toks.values())
        assert r["vocab_size"] == len(first)
        assert r["n_points"] == len(pts)
        assert r["heaps_beta"] == pytest.approx(slope)
        assert r["heaps_k"] == pytest.approx(math.exp(inter))
        assert r["heaps_r2"] == pytest.approx(r2)

    def test_linear_vocab_growth_beta_near_one(self, spark):
        from kevinlang_spark.operators.text import heaps_fit

        # every doc contributes exactly 4 brand-new words: V(n) = n
        corpus = [
            (i, " ".join(f"u{i}x{j}" for j in range(4))) for i in range(32)
        ]
        df = spark.createDataFrame(corpus, "doc_id long, text string")
        (r,) = heaps_fit(df, n_buckets=8).collect()
        assert r["heaps_beta"] == pytest.approx(1.0)
        assert r["heaps_r2"] == pytest.approx(1.0)


class TestScriptCensus:
    def test_mixed_script_counts(self, spark):
        from kevinlang_spark.operators.text import script_census

        rows = [
            ("a", "hello 世界 мир αβ 123"),
            ("a", "naïve café"),
            ("b", "مرحبا"),
        ]
        df = spark.createDataFrame(rows, "lang string, text string")
        out = {r["lang"]: r for r in script_census(df).collect()}
        a = out["a"]
        # doc1: latin 5, cjk 2, cyrillic 3, greek 2, digit 3, space 4
        # doc2: latin 8 (n-a-v-e-c-a-f (e is latin_ext? é yes)) ->
        #   "naïve café": n,a,v,e + c,a,f = 7 latin; ï, é latin_ext=2;
        #   space 1
        assert a["n_docs"] == 2
        assert a["cjk"] == 2
        assert a["cyrillic"] == 3
        assert a["greek"] == 2
        assert a["digit"] == 3
        assert a["latin"] == 5 + 7
        assert a["latin_ext"] == 2
        assert a["space"] == 4 + 1
        assert a["other"] == 0
        assert a["frac_cjk"] == pytest.approx(2 / a["n_chars"])
        b = out["b"]
        assert b["arabic"] == 5
        assert b["latin"] == 0
        assert b["frac_latin"] == 0.0

    def test_other_catches_uncovered(self, spark):
        from kevinlang_spark.operators.text import script_census

        df = spark.createDataFrame(
            [("x", "a,b;c!")], "lang string, text string"
        )
        (r,) = script_census(df).collect()
        assert r["latin"] == 3
        assert r["other"] == 3  # , ; ! are uncovered punctuation
        assert r["frac_other"] == pytest.approx(0.5)

    def test_empty_text_zero_chars(self, spark):
        from kevinlang_spark.operators.text import script_census

        df = spark.createDataFrame(
            [("x", "")], "lang string, text string"
        )
        (r,) = script_census(df).collect()
        assert r["n_chars"] == 0
        assert r["frac_latin"] is None


class TestLDiversity:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "q string, s string")

    def test_summary_counts(self, spark):
        from kevinlang_spark.operators.quality import l_diversity

        rows = (
            [("a", "x"), ("a", "y"), ("a", "z")]
            + [("b", "x"), ("b", "x"), ("b", "y")]
            + [("c", "x"), ("c", "x")]
        )
        (r,) = l_diversity(self._df(spark, rows), ["q"], "s", l=3).collect()
        assert r["l_diversity"] == 1  # group c has one distinct value
        assert r["n_groups"] == 3
        assert r["n_risky_groups"] == 2  # b (2 distinct), c (1)
        assert r["n_rows"] == 8
        assert r["n_risky_rows"] == 5
        assert r["min_entropy"] == pytest.approx(0.0)
        assert math.copysign(1.0, r["min_entropy"]) == 1.0  # +0.0, not -0.0

    def test_entropy_uniform_group(self, spark):
        from kevinlang_spark.operators.quality import l_diversity

        rows = [("a", v) for v in "wxyz"]
        (r,) = l_diversity(self._df(spark, rows), ["q"], "s", l=2).collect()
        assert r["l_diversity"] == 4
        assert r["n_risky_groups"] == 0
        assert r["min_entropy"] == pytest.approx(math.log(4))

    def test_invalid_l(self, spark):
        from kevinlang_spark.operators.quality import l_diversity

        with pytest.raises(ValueError):
            l_diversity(self._df(spark, [("a", "x")]), ["q"], "s", l=0)


class TestTCloseness:
    def test_identical_distribution_zero_emd(self, spark):
        from kevinlang_spark.operators.quality import t_closeness

        # both groups have the same 50/50 split -> EMD 0 for each
        rows = [("a", 1), ("a", 2), ("b", 1), ("b", 2)]
        df = spark.createDataFrame(rows, "q string, s long")
        out = {r["q"]: r for r in t_closeness(df, ["q"], "s").collect()}
        assert out["a"]["emd"] == pytest.approx(0.0)
        assert out["b"]["emd"] == pytest.approx(0.0)

    def test_brute_force_emd(self, spark):
        from kevinlang_spark.operators.quality import t_closeness

        rows = (
            [("a", 0)] * 3 + [("a", 1)] * 1
            + [("b", 1)] * 2 + [("b", 2)] * 2
            + [("c", 0)] * 1 + [("c", 2)] * 3
        )
        df = spark.createDataFrame(rows, "q string, s long")
        out = {r["q"]: r for r in t_closeness(df, ["q"], "s").collect()}
        # brute EMD per group over global dist of {0: 4, 1: 3, 2: 5}/12
        from collections import Counter

        glob = Counter(s for _, s in rows)
        dom = sorted(glob)
        G = sum(glob.values())
        by_g = {}
        for q, s in rows:
            by_g.setdefault(q, Counter())[s] += 1
        for q, cnt in by_g.items():
            n = sum(cnt.values())
            cp = cq = 0.0
            emd = 0.0
            for v in dom:
                cp += cnt.get(v, 0) / n
                cq += glob[v] / G
                emd += abs(cp - cq)
            emd /= len(dom) - 1
            assert out[q]["emd"] == pytest.approx(emd), q
            assert out[q]["n"] == n
            assert out[q]["n_distinct"] == len(cnt)

    def test_single_category_domain(self, spark):
        from kevinlang_spark.operators.quality import t_closeness

        rows = [("a", 5), ("b", 5)]
        df = spark.createDataFrame(rows, "q string, s long")
        for r in t_closeness(df, ["q"], "s").collect():
            assert r["emd"] == 0.0  # m = 1: no distance to move


class TestPrototypicality:
    def _df(self, spark, vecs):
        return spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<float>",
        )

    def test_centroid_nearest_ranks_first(self, spark):
        from kevinlang_spark.operators.similarity import prototypicality

        # one bucket (all positive first dims); v2 is the centroid-most
        vecs = [
            [1.0, 0.0, 0.0, 0.0],
            [0.0, 1.0, 0.0, 0.0],
            [0.5, 0.5, 0.0, 0.0],
        ]
        out = prototypicality(
            self._df(spark, vecs), bits=2, keep_num=1, keep_den=3
        ).collect()
        by_id = {r["id"]: r for r in out}
        assert by_id[2]["proto_rank"] == 1
        assert by_id[2]["is_prototype"]
        assert not by_id[0]["is_prototype"]
        assert all(r["n_bucket"] == 3 for r in out)

    def test_keep_fraction_integer_cut(self, spark):
        from kevinlang_spark.operators.similarity import prototypicality

        vecs = [[1.0, float(i) / 10.0] for i in range(8)]
        out = prototypicality(
            self._df(spark, vecs), bits=1, keep_num=1, keep_den=4
        ).collect()
        # ceil(8/4) = 2 prototypes
        assert sum(r["is_prototype"] for r in out) == 2

    def test_separate_buckets_independent(self, spark):
        from kevinlang_spark.operators.similarity import prototypicality

        vecs = [[1.0, 1.0], [1.0, 0.5], [-1.0, 1.0], [-1.0, 0.5]]
        out = prototypicality(self._df(spark, vecs), bits=1).collect()
        buckets = {r["bucket"] for r in out}
        assert buckets == {"1", "0"}
        for b in buckets:
            ranks = sorted(
                r["proto_rank"] for r in out if r["bucket"] == b
            )
            assert ranks == [1, 2]

    def test_invalid_fraction(self, spark):
        from kevinlang_spark.operators.similarity import prototypicality

        with pytest.raises(ValueError):
            prototypicality(self._df(spark, [[1.0]]), keep_den=0)


class TestUnimaxWeights:
    def _run(self, spark, rows, **kw):
        df = spark.createDataFrame(rows, "source string, n_tokens long")
        from kevinlang_spark.operators.sampling import unimax_weights

        return {
            r["source"]: r for r in unimax_weights(df, **kw).collect()
        }

    def test_matches_greedy_waterfill(self, spark):
        rows = [("a", 10), ("b", 100), ("c", 1000), ("d", 10000)]
        out = self._run(
            spark, rows, epoch_cap=2, budget_num=1, budget_den=2
        )
        # greedy reference
        total = sum(n for _, n in rows)
        B = total // 2
        rem, langs = float(B), sorted(rows, key=lambda r: (r[1], r[0]))
        allocs = {}
        for idx, (g, n) in enumerate(langs):
            fair = rem / (len(langs) - idx)
            a = min(fair, 2.0 * n)
            allocs[g] = a
            rem -= a
        for g, a in allocs.items():
            assert out[g]["alloc"] == pytest.approx(a), g
            assert out[g]["weight"] == pytest.approx(a / B)
            assert out[g]["epochs"] == pytest.approx(
                a / dict(rows)[g]
            )

    def test_budget_exceeds_caps(self, spark):
        # budget = total * 3 with cap 2: everyone capped at 2 epochs
        rows = [("a", 10), ("b", 20)]
        out = self._run(
            spark, rows, epoch_cap=2, budget_num=3, budget_den=1
        )
        assert all(r["capped"] for r in out.values())
        assert out["a"]["epochs"] == pytest.approx(2.0)
        assert out["b"]["epochs"] == pytest.approx(2.0)

    def test_uniform_when_no_cap_binds(self, spark):
        # equal-size groups, budget = half: fair share below cap
        rows = [("a", 100), ("b", 100), ("c", 100), ("d", 100)]
        out = self._run(
            spark, rows, epoch_cap=5, budget_num=1, budget_den=2
        )
        for r in out.values():
            assert not r["capped"]
            assert r["alloc"] == pytest.approx(200 / 4)

    def test_weights_sum_to_one_when_budget_binds(self, spark):
        rows = [("a", 7), ("b", 31), ("c", 997), ("d", 6007)]
        out = self._run(
            spark, rows, epoch_cap=3, budget_num=2, budget_den=3
        )
        assert sum(r["weight"] for r in out.values()) == pytest.approx(
            1.0
        )

    def test_invalid_params(self, spark):
        from kevinlang_spark.operators.sampling import unimax_weights

        df = spark.createDataFrame(
            [("a", 1)], "source string, n_tokens long"
        )
        with pytest.raises(ValueError):
            unimax_weights(df, epoch_cap=0)
        with pytest.raises(ValueError):
            unimax_weights(df, budget_den=0)


class TestClusteringCoefficient:
    def test_triangle_plus_tail(self, spark):
        from kevinlang_spark.operators.graph import clustering_coefficient

        # triangle 1-2-3 plus pendant 3-4
        edges = [(1, 2), (2, 3), (1, 3), (3, 4)]
        df = spark.createDataFrame(edges, "src long, dst long")
        out = {r["node"]: r for r in clustering_coefficient(df).collect()}
        assert out[1]["clustering_coef"] == pytest.approx(1.0)
        assert out[2]["clustering_coef"] == pytest.approx(1.0)
        # node 3: degree 3, 1 triangle -> 2*1/(3*2) = 1/3
        assert out[3]["degree"] == 3
        assert out[3]["clustering_coef"] == pytest.approx(1 / 3)
        assert out[4]["degree"] == 1
        assert out[4]["clustering_coef"] == 0.0

    def test_duplicate_and_reversed_edges_canonicalize(self, spark):
        from kevinlang_spark.operators.graph import clustering_coefficient

        edges = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (1, 1)]
        df = spark.createDataFrame(edges, "src long, dst long")
        out = {r["node"]: r for r in clustering_coefficient(df).collect()}
        assert all(r["triangles"] == 1 for r in out.values())
        assert all(
            r["clustering_coef"] == pytest.approx(1.0)
            for r in out.values()
        )

    def test_square_no_triangles(self, spark):
        from kevinlang_spark.operators.graph import clustering_coefficient

        edges = [(1, 2), (2, 3), (3, 4), (1, 4)]
        df = spark.createDataFrame(edges, "src long, dst long")
        for r in clustering_coefficient(df).collect():
            assert r["triangles"] == 0
            assert r["clustering_coef"] == 0.0


class TestBenfordAudit:
    def test_benford_perfect_sample(self, spark):
        from kevinlang_spark.operators.stats import benford_audit

        # construct counts proportional to Benford: 30,18,12,10,8,7,6,5,4
        counts = [30, 18, 12, 10, 8, 7, 6, 5, 4]
        rows = [
            (float(d + 1) * 10,)
            for d, c in enumerate(counts)
            for _ in range(c)
        ]
        df = spark.createDataFrame(rows, "v double")
        out = {r["digit"]: r for r in benford_audit(df, "v").collect()}
        assert len(out) == 9
        assert out[1]["n_obs"] == 30
        assert out[1]["frac"] == pytest.approx(0.3)
        assert out[9]["n_obs"] == 4
        # near-Benford: every digit's deviation small
        assert all(abs(r["deviation"]) < 0.01 for r in out.values())
        assert out[1]["chi2_total"] < 1.0
        assert out[1]["n_total"] == 100

    def test_missing_digits_report_zero(self, spark):
        from kevinlang_spark.operators.stats import benford_audit

        df = spark.createDataFrame([(1.0,), (1.5,)], "v double")
        out = {r["digit"]: r for r in benford_audit(df, "v").collect()}
        assert out[1]["n_obs"] == 2
        for d in range(2, 10):
            assert out[d]["n_obs"] == 0
            assert out[d]["chi2_contrib"] == pytest.approx(
                2 * math.log10(1 + 1 / d)
            )

    def test_scale_and_sign(self, spark):
        from kevinlang_spark.operators.stats import benford_audit

        # -0.07 at scale 100 -> 7; 0.001 at scale 100 -> 0 (dropped)
        df = spark.createDataFrame(
            [(-0.07,), (0.001,)], "v double"
        )
        out = {r["digit"]: r for r in benford_audit(df, "v").collect()}
        assert out[7]["n_obs"] == 1
        assert out[7]["n_total"] == 1

    def test_invalid_scale(self, spark):
        from kevinlang_spark.operators.stats import benford_audit

        df = spark.createDataFrame([(1.0,)], "v double")
        with pytest.raises(ValueError):
            benford_audit(df, "v", scale=0)


class TestRougeN:
    def _pairs(self, spark, rows):
        return spark.createDataFrame(
            rows, "doc_id long, candidate string, reference string"
        )

    def test_identical_texts_perfect(self, spark):
        from kevinlang_spark.operators.text import rouge_n

        df = self._pairs(spark, [(1, "the cat sat here", "the cat sat here")])
        (r,) = rouge_n(df, n=2).collect()
        assert r["cand_ngrams"] == r["ref_ngrams"] == r["overlap"] == 3
        assert r["precision"] == r["recall"] == r["f1"] == 1.0

    def test_clipping_limits_repeats(self, spark):
        from kevinlang_spark.operators.text import rouge_n

        # candidate repeats "a a" bigram 3x; reference has it once
        df = self._pairs(spark, [(1, "a a a a", "a a b")])
        (r,) = rouge_n(df, n=2).collect()
        assert r["cand_ngrams"] == 3
        assert r["ref_ngrams"] == 2
        assert r["overlap"] == 1  # min(3, 1)
        assert r["precision"] == pytest.approx(1 / 3)
        assert r["recall"] == pytest.approx(1 / 2)

    def test_short_side_yields_nulls(self, spark):
        from kevinlang_spark.operators.text import rouge_n

        df = self._pairs(spark, [(1, "word", "the cat sat")])
        (r,) = rouge_n(df, n=2).collect()
        assert r["cand_ngrams"] == 0
        assert r["precision"] is None
        assert r["f1"] is None


class TestCorpusBleu:
    def _pairs(self, spark, rows):
        return spark.createDataFrame(
            rows, "doc_id long, candidate string, reference string"
        )

    def test_identical_corpus_bleu_one(self, spark):
        from kevinlang_spark.operators.text import corpus_bleu

        rows = [(1, "the cat sat", "the cat sat"), (2, "a b c d", "a b c d")]
        (r,) = corpus_bleu(self._pairs(spark, rows), max_n=2).collect()
        assert r["bp"] == 1.0
        assert r["p1"] == 1.0
        assert r["p2"] == 1.0
        assert r["bleu"] == pytest.approx(1.0)

    def test_matches_reference_formula(self, spark):
        from kevinlang_spark.operators.text import corpus_bleu

        rows = [
            (1, "the the the cat", "the cat sat on the mat"),
            (2, "a b c", "a b c d e"),
        ]
        (r,) = corpus_bleu(self._pairs(spark, rows), max_n=2).collect()
        # by hand: cand1 unigrams {the:3, cat:1} ref1 {the:2, cat:1,...}
        # clipped: min(3,2) + min(1,1) = 3; cand2: a,b,c all match = 3
        # m1 = 6, t1 = 7
        # bigrams cand1: {the the:2, the cat:1}; ref1 has "the cat"? no:
        # "the cat" not in ref1 ("the mat","the cat"? ref1 = the cat sat
        # on the mat -> bigrams: the cat, cat sat, sat on, on the,
        # the mat -> "the cat" present once. m: the the: 0, the cat: 1
        # cand2 bigrams a b, b c both in ref2. m2 = 3, t2 = 3 + 2 = 5
        m1, t1, m2, t2 = 6, 7, 3, 5
        c_len, r_len = 7, 11
        bp = math.exp(1 - r_len / c_len)
        want = bp * math.exp(
            (math.log(m1 / t1) + math.log(m2 / t2)) / 2.0
        )
        assert r["cand_len"] == c_len and r["ref_len"] == r_len
        assert r["p1"] == pytest.approx(m1 / t1)
        assert r["p2"] == pytest.approx(m2 / t2)
        assert r["bleu"] == pytest.approx(want)

    def test_zero_overlap_bleu_zero(self, spark):
        from kevinlang_spark.operators.text import corpus_bleu

        rows = [(1, "x y z", "a b c")]
        (r,) = corpus_bleu(self._pairs(spark, rows), max_n=2).collect()
        assert r["bleu"] == 0.0


class TestCalibrationAudit:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "prob double, label int")

    def test_perfectly_calibrated_bins(self, spark):
        from kevinlang_spark.operators.stats import calibration_audit

        # bin [0.2, 0.3): 10 rows at p=0.25, exactly 2.5 avg -> use 4
        # rows at p=0.25 with 1 positive -> frac 0.25 == conf
        rows = [(0.25, 1)] + [(0.25, 0)] * 3 + [(0.75, 1)] * 3 + [
            (0.75, 0)
        ]
        out = {
            r["bin"]: r
            for r in calibration_audit(self._df(spark, rows)).collect()
        }
        assert out[2]["n_obs"] == 4
        assert out[2]["mean_prob"] == pytest.approx(0.25)
        assert out[2]["frac_pos"] == pytest.approx(0.25)
        assert out[2]["gap"] == pytest.approx(0.0)
        assert out[7]["frac_pos"] == pytest.approx(0.75)
        assert out[2]["ece"] == pytest.approx(0.0)
        # brier = mean of p(1-p)-style squared errors:
        # (0.25-1)^2 + 3*(0.25)^2 + 3*(0.75-1)^2 + 0.75^2 over 8
        want_brier = (
            0.75**2 + 3 * 0.25**2 + 3 * 0.25**2 + 0.75**2
        ) / 8
        assert out[2]["brier"] == pytest.approx(want_brier)

    def test_miscalibrated_gap_and_ece(self, spark):
        from kevinlang_spark.operators.stats import calibration_audit

        # all predictions 0.9 but only half positive
        rows = [(0.9, 1)] * 2 + [(0.9, 0)] * 2
        (r,) = {
            x["bin"]: x
            for x in calibration_audit(self._df(spark, rows)).collect()
        }.values()
        assert r["bin"] == 9
        assert r["gap"] == pytest.approx(0.5 - 0.9)
        assert r["ece"] == pytest.approx(0.4)

    def test_edge_prob_one_lands_in_last_bin(self, spark):
        from kevinlang_spark.operators.stats import calibration_audit

        rows = [(1.0, 1), (0.0, 0)]
        out = {
            r["bin"]: r
            for r in calibration_audit(self._df(spark, rows)).collect()
        }
        assert set(out) == {0, 9}
        assert out[9]["gap"] == pytest.approx(0.0)

    def test_invalid_params(self, spark):
        from kevinlang_spark.operators.stats import calibration_audit

        df = self._df(spark, [(0.5, 1)])
        with pytest.raises(ValueError):
            calibration_audit(df, n_bins=0)
        with pytest.raises(ValueError):
            calibration_audit(df, prob_scale=0)


class TestSpearmanCorr:
    def _df(self, spark, xs, ys):
        return spark.createDataFrame(
            [("g", float(x), float(y)) for x, y in zip(xs, ys)],
            "g string, x double, y double",
        )

    def test_monotone_nonlinear_is_one(self, spark):
        from kevinlang_spark.operators.stats import spearman_corr

        xs = [1, 2, 3, 4, 5]
        ys = [x**3 for x in xs]  # monotone, nonlinear
        (r,) = spearman_corr(self._df(spark, xs, ys), "g", "x", "y").collect()
        assert r["spearman_rho"] == pytest.approx(1.0)

    def test_matches_scipy_free_reference(self, spark):
        from kevinlang_spark.operators.stats import spearman_corr

        xs = [3, 1, 4, 1, 5, 9, 2, 6]
        ys = [2, 7, 1, 8, 2, 8, 1, 8]
        (r,) = spearman_corr(self._df(spark, xs, ys), "g", "x", "y").collect()

        def avg_ranks(vals):
            s = sorted(vals)
            return [
                (s.index(v) + 1 + len(s) - s[::-1].index(v)) / 2
                for v in vals
            ]

        rho = statistics.correlation(avg_ranks(xs), avg_ranks(ys))
        assert r["spearman_rho"] == pytest.approx(rho)

    def test_anticorrelated(self, spark):
        from kevinlang_spark.operators.stats import spearman_corr

        xs = [1, 2, 3, 4]
        ys = [9, 7, 5, 3]
        (r,) = spearman_corr(self._df(spark, xs, ys), "g", "x", "y").collect()
        assert r["spearman_rho"] == pytest.approx(-1.0)

    def test_constant_axis_null(self, spark):
        from kevinlang_spark.operators.stats import spearman_corr

        (r,) = spearman_corr(
            self._df(spark, [1, 2, 3], [5, 5, 5]), "g", "x", "y"
        ).collect()
        assert r["spearman_rho"] is None


class TestNeymanAllocation:
    def test_allocation_proportional_to_n_times_sd(self, spark):
        from kevinlang_spark.operators.sampling import neyman_allocation

        # stratum a: 4 rows spread wide; stratum b: 4 rows, no spread
        rows = [("a", 0.0), ("a", 10.0), ("a", 0.0), ("a", 10.0)] + [
            ("b", 5.0)
        ] * 4
        df = spark.createDataFrame(rows, "g string, v double")
        out = {
            r["g"]: r
            for r in neyman_allocation(df, "g", "v", 100).collect()
        }
        # S_a = 5, S_b = 0 -> everything goes to a
        assert out["a"]["stratum_sd"] == pytest.approx(5.0)
        assert out["b"]["stratum_sd"] == pytest.approx(0.0)
        assert out["a"]["weight"] == pytest.approx(1.0)
        assert out["a"]["alloc"] == 100
        assert out["b"]["alloc"] == 0

    def test_equal_strata_split_evenly(self, spark):
        from kevinlang_spark.operators.sampling import neyman_allocation

        rows = [(g, float(v)) for g in "ab" for v in (0, 10)]
        df = spark.createDataFrame(rows, "g string, v double")
        out = {
            r["g"]: r
            for r in neyman_allocation(df, "g", "v", 10).collect()
        }
        assert out["a"]["alloc"] == out["b"]["alloc"] == 5

    def test_all_constant_zero_weights(self, spark):
        from kevinlang_spark.operators.sampling import neyman_allocation

        rows = [("a", 1.0), ("b", 2.0)]
        df = spark.createDataFrame(rows, "g string, v double")
        for r in neyman_allocation(df, "g", "v", 10).collect():
            assert r["weight"] == 0.0
            assert r["alloc"] == 0

    def test_invalid_params(self, spark):
        from kevinlang_spark.operators.sampling import neyman_allocation

        df = spark.createDataFrame([("a", 1.0)], "g string, v double")
        with pytest.raises(ValueError):
            neyman_allocation(df, "g", "v", 0)
        with pytest.raises(ValueError):
            neyman_allocation(df, "g", "v", 10, value_scale=0)


class TestKmeansFit:
    def _df(self, spark, vecs):
        return spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<float>",
        )

    def test_two_obvious_clusters(self, spark):
        from kevinlang_spark.operators.similarity import kmeans_fit

        # ids 0 and 1 seed one blob each (seeds = k smallest ids)
        vecs = (
            [[0.0, 0.1], [5.0, 5.1], [0.1, 0.0], [0.05, 0.05]]
            + [[5.1, 5.0], [5.05, 5.05]]
        )
        out = {r["id"]: r for r in kmeans_fit(
            self._df(spark, vecs), k=2, n_iters=3
        ).collect()}
        low = {out[i]["cluster"] for i in (0, 2, 3)}
        high = {out[i]["cluster"] for i in (1, 4, 5)}
        assert len(low) == 1 and len(high) == 1 and low != high

    def test_matches_brute_lloyd(self, spark):
        from kevinlang_spark.operators.similarity import kmeans_fit

        vecs = [
            [0.3, 0.9], [0.1, 0.2], [0.8, 0.1], [0.9, 0.95],
            [0.45, 0.5], [0.2, 0.85],
        ]
        out = {r["id"]: r["cluster"] for r in kmeans_fit(
            self._df(spark, vecs), k=2, n_iters=2
        ).collect()}

        # brute replay with the same quantize/round/tie rules
        q = [[round(x * 1e6 + 0.5 - ((x * 1e6 + 0.5) % 1)) for x in v]
             for v in vecs]
        q = [[int(x * 1e6 + 0.5) for x in v] for v in vecs]
        cents = [[float(c) for c in q[0]], [float(c) for c in q[1]]]

        def assign(cents):
            res = {}
            for i, vec in enumerate(q):
                ds = []
                for ci, c in enumerate(cents):
                    d = 0.0
                    for a, b in zip(vec, c):
                        d += (a - b) * (a - b)
                    ds.append((round(d, 6), ci))
                res[i] = min(ds)[1]
            return res

        a1 = assign(cents)
        # update
        import collections

        sums = collections.defaultdict(lambda: [0, [0] * 2])
        for i, c in a1.items():
            sums[c][0] += 1
            for j, x in enumerate(q[i]):
                sums[c][1][j] += x
        new = {
            c: [s / n for s in sv] for c, (n, sv) in sums.items()
        }
        cents2 = [new[c] for c in sorted(new)]
        a2 = assign(cents2)
        assert out == a2

    def test_invalid_params(self, spark):
        from kevinlang_spark.operators.similarity import kmeans_fit

        df = self._df(spark, [[1.0]])
        with pytest.raises(ValueError):
            kmeans_fit(df, k=0)
        with pytest.raises(ValueError):
            kmeans_fit(df, n_iters=0)


class TestRankingMetrics:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "query_id long, rank long, rel long"
        )

    def test_hand_computed_metrics(self, spark):
        from kevinlang_spark.operators.stats import ranking_metrics

        rows = [(1, 1, 3), (1, 2, 0), (1, 3, 1), (1, 4, 0)]
        (r,) = ranking_metrics(self._df(spark, rows), k=3).collect()
        assert r["dcg"] == pytest.approx(3 / 1 + 1 / math.log2(4))
        assert r["idcg"] == pytest.approx(3 / 1 + 1 / math.log2(3))
        assert r["ndcg"] == pytest.approx(r["dcg"] / r["idcg"])
        assert r["mrr"] == 1.0
        assert r["ap"] == pytest.approx((1 / 1 + 2 / 3) / 2)
        assert r["n_rel"] == 2

    def test_perfect_ranking_ndcg_one(self, spark):
        from kevinlang_spark.operators.stats import ranking_metrics

        rows = [(1, i, 5 - i) for i in range(1, 5)]  # rel desc in rank
        (r,) = ranking_metrics(self._df(spark, rows), k=4).collect()
        assert r["ndcg"] == pytest.approx(1.0)

    def test_no_relevant_candidates(self, spark):
        from kevinlang_spark.operators.stats import ranking_metrics

        rows = [(1, 1, 0), (1, 2, 0)]
        (r,) = ranking_metrics(self._df(spark, rows), k=5).collect()
        assert r["ndcg"] == 0.0
        assert r["mrr"] is None
        assert r["ap"] is None

    def test_late_first_hit_mrr(self, spark):
        from kevinlang_spark.operators.stats import ranking_metrics

        rows = [(1, 1, 0), (1, 2, 0), (1, 3, 2)]
        (r,) = ranking_metrics(self._df(spark, rows), k=2).collect()
        assert r["mrr"] == pytest.approx(1 / 3)
        # dcg@2 is 0 but idcg@2 > 0 (ideal puts rel 2 first)
        assert r["dcg"] == 0.0
        assert r["ndcg"] == 0.0

    def test_invalid_k(self, spark):
        from kevinlang_spark.operators.stats import ranking_metrics

        with pytest.raises(ValueError):
            ranking_metrics(self._df(spark, [(1, 1, 1)]), k=0)


class TestCupedAbTest:
    def _units(self, spark, rows):
        return spark.createDataFrame(rows, "arm string, y double, x double")

    def test_perfect_covariate_kills_variance(self, spark):
        from kevinlang_spark.operators.experiments import cuped_ab_test

        # y = x exactly: theta = 1, adjusted variance ~ 0
        rows = [("control", float(v), float(v)) for v in (10, 20, 30)] + [
            ("treat", float(v) + 5, float(v)) for v in (10, 20, 30)
        ]
        out = {r["arm"]: r for r in cuped_ab_test(self._units(spark, rows)).collect()}
        assert out["treat"]["theta"] == pytest.approx(1.0)
        assert out["treat"]["var_y_adj"] == pytest.approx(0.0, abs=1e-9)
        assert out["treat"]["lift_adj"] == pytest.approx(5.0)
        assert out["treat"]["var_reduction"] == pytest.approx(1.0)
        assert out["treat"]["z_adj"] is None  # zero SE guard

    def test_useless_covariate_changes_nothing(self, spark):
        from kevinlang_spark.operators.experiments import cuped_ab_test

        rows = [("control", 10.0, 7.0), ("control", 20.0, 7.0),
                ("treat", 15.0, 7.0), ("treat", 25.0, 7.0)]
        out = {r["arm"]: r for r in cuped_ab_test(self._units(spark, rows)).collect()}
        # constant x: theta guard -> 0, adjusted == raw
        assert out["treat"]["theta"] == 0.0
        assert out["treat"]["mean_y_adj"] == out["treat"]["mean_y"]
        assert out["treat"]["z_adj"] == out["treat"]["z_raw"]

    def test_statistics_match_brute(self, spark):
        from kevinlang_spark.operators.experiments import cuped_ab_test

        import random

        rng = random.Random(7)
        rows = []
        for i in range(40):
            x = round(rng.uniform(0, 100), 2)
            noise = round(rng.uniform(-10, 10), 2)
            arm = "treat" if i % 2 else "control"
            y = round(0.8 * x + noise + (5 if arm == "treat" else 0), 2)
            rows.append((arm, y, x))
        out = {r["arm"]: r for r in cuped_ab_test(self._units(spark, rows)).collect()}
        # brute on quantized cents
        q = [(a, int(y * 100 + 0.5), int(x * 100 + 0.5)) for a, y, x in rows]
        N = len(q)
        gsx = sum(x for _, _, x in q)
        gsy = sum(y for _, y, _ in q)
        gsxx = sum(x * x for _, _, x in q)
        gsxy = sum(x * y for _, y, x in q)
        th = (gsxy * N - gsx * gsy) / (gsxx * N - gsx * gsx)
        assert out["treat"]["theta"] == pytest.approx(th)
        # adjusted variance must shrink for a strong covariate
        assert out["treat"]["var_y_adj"] < out["treat"]["var_y"]
        assert out["control"]["var_reduction"] > 0.5
        assert abs(out["treat"]["z_adj"]) > abs(out["treat"]["z_raw"])


class TestSrmCheck:
    def test_balanced_split_small_chi2(self, spark):
        from kevinlang_spark.operators.experiments import srm_check

        rows = [("a",)] * 500 + [("b",)] * 500
        df = spark.createDataFrame(rows, "arm string")
        out = {r["arm"]: r for r in srm_check(df).collect()}
        assert out["a"]["chi2_total"] == 0.0
        assert out["a"]["expected_n"] == 500.0

    def test_mismatch_flags_large_chi2(self, spark):
        from kevinlang_spark.operators.experiments import srm_check

        rows = [("a",)] * 600 + [("b",)] * 400
        df = spark.createDataFrame(rows, "arm string")
        out = {r["arm"]: r for r in srm_check(df).collect()}
        # chi2 = (600-500)^2/500 * 2 = 40
        assert out["a"]["chi2_total"] == pytest.approx(40.0)

    def test_designed_ratios(self, spark):
        from kevinlang_spark.operators.experiments import srm_check

        rows = [("a",)] * 90 + [("b",)] * 10
        df = spark.createDataFrame(rows, "arm string")
        out = {
            r["arm"]: r
            for r in srm_check(df, expected={"a": 0.9, "b": 0.1}).collect()
        }
        assert out["a"]["expected_n"] == pytest.approx(90.0)
        assert out["a"]["chi2_total"] == pytest.approx(0.0)


class TestRatioMetricTest:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "arm string, num double, den double")

    def test_ratio_is_sum_over_sum(self, spark):
        from kevinlang_spark.operators.experiments import ratio_metric_test

        rows = [("a", 1.0, 10.0), ("a", 3.0, 10.0),
                ("b", 4.0, 10.0), ("b", 4.0, 30.0)]
        out = {r["arm"]: r for r in ratio_metric_test(self._df(spark, rows)).collect()}
        assert out["a"]["ratio"] == pytest.approx(4 / 20)
        assert out["b"]["ratio"] == pytest.approx(8 / 40)
        # identical ratios -> z == 0
        assert out["a"]["z"] == pytest.approx(0.0)

    def test_matches_brute_delta_method(self, spark):
        from kevinlang_spark.operators.experiments import ratio_metric_test

        import random

        rng = random.Random(3)
        rows = []
        for i in range(60):
            d = round(rng.uniform(5, 50), 2)
            nmr = round(d * rng.uniform(0.1, 0.3), 2)
            rows.append(("t" if i % 2 else "c", nmr, d))
        out = {r["arm"]: r for r in ratio_metric_test(self._df(spark, rows)).collect()}
        for arm in ("c", "t"):
            q = [(int(n * 100 + 0.5), int(d * 100 + 0.5))
                 for a, n, d in rows if a == arm]
            cnt = len(q)
            sn = sum(n for n, _ in q); sd = sum(d for _, d in q)
            vn = (sum(n * n for n, _ in q) * cnt - sn * sn) / (cnt * cnt)
            vd = (sum(d * d for _, d in q) * cnt - sd * sd) / (cnt * cnt)
            cov = (sum(n * d for n, d in q) * cnt - sn * sd) / (cnt * cnt)
            R = sn / sd
            md = sd / cnt
            var_r = (vn - 2 * R * cov + R * R * vd) / (cnt * (md * md))
            assert out[arm]["ratio"] == pytest.approx(R)
            assert out[arm]["se"] == pytest.approx(math.sqrt(var_r))

    def test_zero_denominator_arm_null(self, spark):
        from kevinlang_spark.operators.experiments import ratio_metric_test

        rows = [("a", 1.0, 0.0), ("b", 2.0, 5.0)]
        out = {r["arm"]: r for r in ratio_metric_test(self._df(spark, rows)).collect()}
        assert out["a"]["ratio"] is None
        assert out["a"]["z"] is None


class TestGeohash:
    def test_canonical_vectors(self, spark):
        from kevinlang_spark.operators.spatial import geohash

        rows = [
            (57.64911, 10.40744, "u4pruydqqvj"),
            (42.6, -5.6, "ezs42e44yx9"),
            (-25.382708, -49.265506, "6gkzwgjzn82"),
            (0.0, 0.0, "s0000000000"),
        ]
        df = spark.createDataFrame(
            [(la, lo) for la, lo, _ in rows], "lat double, lon double"
        )
        got = [
            r[0]
            for r in df.select(
                geohash(F.col("lat"), F.col("lon"), 11)
            ).collect()
        ]
        assert got == [g for _, _, g in rows]

    def test_prefix_property(self, spark):
        from kevinlang_spark.operators.spatial import geohash

        df = spark.createDataFrame(
            [(57.64911, 10.40744)], "lat double, lon double"
        )
        (r,) = df.select(
            geohash(F.col("lat"), F.col("lon"), 4).alias("g4"),
            geohash(F.col("lat"), F.col("lon"), 8).alias("g8"),
        ).collect()
        assert r["g8"].startswith(r["g4"])

    def test_edge_clamp(self, spark):
        from kevinlang_spark.operators.spatial import geohash

        df = spark.createDataFrame(
            [(90.0, 180.0), (-90.0, -180.0)], "lat double, lon double"
        )
        got = [
            r[0]
            for r in df.select(
                geohash(F.col("lat"), F.col("lon"), 3)
            ).collect()
        ]
        assert got[0] == "zzz"
        assert got[1] == "000"

    def test_invalid_precision(self, spark):
        from kevinlang_spark.operators.spatial import geohash

        with pytest.raises(ValueError):
            geohash(F.lit(0.0), F.lit(0.0), 0)

    def test_census_counts_and_means(self, spark):
        from kevinlang_spark.operators.spatial import geohash_census

        rows = [(10.001, 20.001), (10.002, 20.003), (-40.0, -110.0)]
        df = spark.createDataFrame(rows, "lat double, lon double")
        out = {
            r["cell"]: r
            for r in geohash_census(df, "lat", "lon", 4).collect()
        }
        big = [c for c, r in out.items() if r["n_points"] == 2]
        assert len(big) == 1
        r = out[big[0]]
        assert r["mean_lat"] == pytest.approx(10.0015)
        assert r["mean_lon"] == pytest.approx(20.002)
