"""Preference-data (RLHF / DPO) assembly operators.

The post-SFT stage of an LLM data pipeline: n sampled responses per
prompt arrive scored by a reward model, and training needs (prompt,
chosen, rejected) pairs (DPO — Rafailov et al. 2023, arXiv:2305.18290)
or the top-1 survivor (rejection sampling / best-of-n — Touvron et al.
2023's Llama-2 RLHF recipe).  Both reduce to deterministic argmax /
argmin per prompt group, which Spark expresses as ONE keyed aggregation
with struct-ordered min/max — map-side combinable, no window sort, no
per-group explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dpo_pairs(
    df: DataFrame,
    prompt_col: str = "prompt_id",
    cand_col: str = "cand_id",
    text_col: str = "response",
    reward_col: str = "reward",
    min_margin: float = 0.0,
) -> DataFrame:
    """Assemble DPO preference pairs: per prompt, chosen = the highest-
    reward candidate, rejected = the lowest, with DETERMINISTIC
    tie-breaks (chosen: reward desc then cand_id ASC; rejected: reward
    asc then cand_id ASC) so the pair set replays bit-identically
    across engines.  Prompts whose reward spread is <= ``min_margin``
    are dropped — a pair with no margin teaches the DPO loss nothing
    (its gradient is the sigmoid at 0).

    Scale shape: one groupBy(prompt) with two struct-ordered extrema —
    partial aggregation runs map-side, the shuffle carries two structs
    per prompt per partition, never the full candidate fan-out.  NULL
    rewards or texts disqualify the candidate (dropped before the
    agg).

    Returns (prompt_col, chosen_id, rejected_id, chosen_text,
    rejected_text, chosen_reward, rejected_reward, margin)."""
    pid = F.col(prompt_col)
    r = F.col(reward_col)
    cid = F.col(cand_col)
    clean = df.where(
        r.isNotNull() & F.col(text_col).isNotNull() & cid.isNotNull()
    )
    # struct ordering is lexicographic; (reward, -cand_id) max picks the
    # SMALLEST cand_id among reward ties, (reward, cand_id) min likewise
    hi = F.max(
        F.struct(
            r.alias("r"), (-cid).alias("nid"), F.col(text_col).alias("t")
        )
    ).alias("hi")
    lo = F.min(
        F.struct(
            r.alias("r"), cid.alias("id"), F.col(text_col).alias("t")
        )
    ).alias("lo")
    agg = clean.groupBy(pid.alias(prompt_col)).agg(hi, lo)
    out = agg.select(
        prompt_col,
        (-F.col("hi.nid")).alias("chosen_id"),
        F.col("lo.id").alias("rejected_id"),
        F.col("hi.t").alias("chosen_text"),
        F.col("lo.t").alias("rejected_text"),
        F.col("hi.r").alias("chosen_reward"),
        F.col("lo.r").alias("rejected_reward"),
        (F.col("hi.r") - F.col("lo.r")).alias("margin"),
    )
    return out.where(F.col("margin") > min_margin)


def best_of_n(
    df: DataFrame,
    prompt_col: str = "prompt_id",
    cand_col: str = "cand_id",
    text_col: str = "response",
    reward_col: str = "reward",
) -> DataFrame:
    """Rejection sampling / best-of-n: keep ONLY the top-reward
    candidate per prompt (tie-break cand_id asc — deterministic), plus
    the group's candidate count and mean reward so the curation report
    can see selection pressure per prompt.  Same one-shuffle
    struct-extremum shape as :func:`dpo_pairs`.

    Returns (prompt_col, cand_id, response, reward, n_candidates,
    mean_reward)."""
    r = F.col(reward_col)
    cid = F.col(cand_col)
    clean = df.where(
        r.isNotNull() & F.col(text_col).isNotNull() & cid.isNotNull()
    )
    hi = F.max(
        F.struct(
            r.alias("r"), (-cid).alias("nid"), F.col(text_col).alias("t")
        )
    ).alias("hi")
    return (
        clean.groupBy(F.col(prompt_col).alias(prompt_col))
        .agg(
            hi,
            F.count("*").alias("n_candidates"),
            F.avg(r).alias("mean_reward"),
        )
        .select(
            prompt_col,
            (-F.col("hi.nid")).alias(cand_col),
            F.col("hi.t").alias(text_col),
            F.col("hi.r").alias(reward_col),
            "n_candidates",
            F.round("mean_reward", 6).alias("mean_reward"),
        )
    )


def reward_agreement(
    df: DataFrame,
    prompt_col: str = "prompt_id",
    cand_col: str = "cand_id",
    reward_a: str = "reward_a",
    reward_b: str = "reward_b",
) -> DataFrame:
    """Pairwise agreement between two reward models per prompt —
    Kendall's tau-a over the candidate set, plus the concordant /
    discordant / tied pair census.  The QC gate before trusting an RM
    (or an RM ensemble) to label preference data: prompts where two
    scorers invert each other's ranking are exactly the pairs DPO
    should not train on.

    Shape: ONE prompt-keyed aggregation collects the (cand, a, b)
    structs, then the O(n²) pair walk runs IN-ROW with higher-order
    functions — n is the samples-per-prompt constant (4-16), so the
    per-row work is bounded and there is no second shuffle and no
    self-join fan-out.  The pair-sign array is materialized in its own
    projection before the three counts read it (the CollapseProject
    re-inline trap).

    Pairs form by ARRAY POSITION over the deterministically sorted
    (cand, a, b) structs — not by ``y.c > x.c`` id inequality, which
    silently dropped pairs involving duplicate cand_id values while
    tau_a still divided by n(n-1), deflating tau (ADVICE r11).  With
    position pairing C + D + T == n(n-1)/2 holds for every input, and
    for unique cand_ids the census is unchanged.

    Returns (prompt_col, n_cands, concordant, discordant, tied,
    tau_a); prompts with fewer than 2 scored candidates are dropped;
    tau_a = 2(C - D) / (n(n-1))."""
    ok = df.where(
        F.col(reward_a).isNotNull()
        & F.col(reward_b).isNotNull()
        & F.col(cand_col).isNotNull()
    )
    g = ok.groupBy(prompt_col).agg(
        F.collect_list(
            F.struct(
                F.col(cand_col).alias("c"),
                F.col(reward_a).alias("a"),
                F.col(reward_b).alias("b"),
            )
        ).alias("xs"),
        F.count("*").alias("n_cands"),
    )
    xs = F.array_sort(F.col("xs"))
    signs = F.flatten(
        F.transform(
            xs,
            lambda x, i: F.transform(
                F.slice(xs, i + 2, F.greatest(F.size(xs) - i - 1, F.lit(0))),
                lambda y: (
                    F.signum(x["a"] - y["a"]) * F.signum(x["b"] - y["b"])
                ).cast("int"),
            ),
        )
    )
    staged = g.where(F.col("n_cands") >= 2).select(
        prompt_col, "n_cands", signs.alias("__ps")
    )
    ps = F.col("__ps")
    c = F.size(F.filter(ps, lambda s: s == 1))
    d = F.size(F.filter(ps, lambda s: s == -1))
    t = F.size(F.filter(ps, lambda s: s == 0))
    n = F.col("n_cands")
    return staged.select(
        prompt_col,
        "n_cands",
        c.alias("concordant"),
        d.alias("discordant"),
        t.alias("tied"),
        ((c - d) * 2.0 / (n * (n - 1))).alias("tau_a"),
    )
