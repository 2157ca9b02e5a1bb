"""Model-evaluation metrics over sampled generations.

The scoring half of an eval harness once per-sample correctness labels
exist: unbiased pass@k over n samples (Chen et al. 2021, arXiv:2107.03374
— the HumanEval estimator) and majority-vote / self-consistency accuracy
(Wang et al. 2022, arXiv:2203.11171).  Both are one keyed aggregation
plus closed-form in-row math — the evaluation tables are metadata-sized,
but the SAMPLES table (tasks × n generations) is corpus-scale and never
does anything but the one keyed shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pass_at_k(
    df: DataFrame,
    group_col: str = "suite",
    task_col: str = "task_id",
    correct_col: str = "correct",
    ks: "tuple[int, ...]" = (1, 10),
) -> DataFrame:
    """Unbiased pass@k (Chen et al. 2021 eq. 1): per task with n
    samples and c correct, ``pass@k = 1 − C(n−c,k)/C(n,k)``, averaged
    over the group's tasks — the number a code-eval leaderboard
    reports.  The naive "run k, count successes" estimator is biased;
    this is the combinatorial correction HumanEval standardized.

    Cross-engine math: the binomial ratio is computed as the product
    ``Π_{j=0..k−1} (n−c−j)/(n−j)`` via an in-row left fold over
    sequence(0, k−1) — identical IEEE ops in identical order on both
    engines (large n would overflow an integer C(n,k); the ratio
    product never does).  Each task's pass@k then quantizes to 1e-6
    integer micros BEFORE the group average, so the rollup is an
    exact integer SUM — a float AVG over tasks would depend on
    summation order and drift across engines/partitionings.  Tasks
    with n < k are NULL for that k (estimator undefined) and excluded
    from that k's average.

    Shape: ONE task-keyed aggregation (map-side combinable count/sum),
    then a group rollup over the metadata-sized task table.

    Returns (group_col, k, n_tasks, mean_pass_at_k) — the mean is the
    average of the micro-quantized per-task values (±5e-7 of the
    unquantized mean)."""
    if not ks or any(k < 1 for k in ks):
        raise ValueError(f"ks must all be >= 1, got {ks}")
    per_task = df.groupBy(group_col, task_col).agg(
        F.count("*").alias("__n"),
        F.sum(F.col(correct_col).cast("int")).alias("__c"),
    )
    n, c = F.col("__n"), F.col("__c")
    out = None
    for k in sorted(set(int(k) for k in ks)):
        ratio = F.aggregate(
            F.sequence(F.lit(0), F.lit(k - 1)),
            F.lit(1.0),
            lambda acc, j: acc * ((n - c - j) / (n - j)),
        )
        pk = F.when(n < k, F.lit(None)).otherwise(
            F.when(n - c < k, F.lit(1.0)).otherwise(F.lit(1.0) - ratio)
        )
        pk_q = F.round(pk * 1_000_000).cast("bigint")
        rolled = (
            per_task.select(group_col, pk_q.alias("__pkq"))
            .where(F.col("__pkq").isNotNull())
            .groupBy(group_col)
            .agg(
                F.count("*").alias("n_tasks"),
                F.sum("__pkq").alias("__s"),
            )
            .select(
                group_col,
                F.lit(k).alias("k"),
                "n_tasks",
                (
                    F.col("__s")
                    / (F.col("n_tasks") * F.lit(1_000_000))
                ).alias("mean_pass_at_k"),
            )
        )
        out = rolled if out is None else out.unionByName(rolled)
    return out


def majority_vote(
    df: DataFrame,
    group_col: str = "suite",
    task_col: str = "task_id",
    answer_col: str = "answer",
    ref_col: str = "reference",
) -> DataFrame:
    """Self-consistency / majority-vote accuracy (Wang et al. 2022):
    per task, the modal answer over n samples (ties broken by answer
    ascending — deterministic) is compared to the reference; the group
    rollup reports how often majority voting is right and how strong
    the vote was.

    Shape: one (group, task, answer) count, one task-keyed argmax via
    struct max (count desc, answer asc via the struct trick), one
    group rollup.  All map-side combinable; NULL answers are dropped,
    and the reference is assumed constant per task (MAX aggregates
    it).

    Returns (group_col, n_tasks, n_correct, accuracy,
    mean_vote_share) — vote share = modal count / n samples,
    floor-quantized to 1e-6 per task before the group average so the
    rollup is an exact integer SUM (the pass_at_k discipline)."""
    ok = df.where(
        F.col(answer_col).isNotNull() & F.col(task_col).isNotNull()
    )
    votes = ok.groupBy(group_col, task_col, answer_col).agg(
        F.count("*").alias("__v"),
        F.max(ref_col).alias("__ref"),
    )
    # struct-ordered argmax: max((v, negated-answer-rank)) — answers are
    # strings, so invert the tie ordering by taking the MIN answer among
    # max-count rows via a two-stage struct
    per_task = votes.groupBy(group_col, task_col).agg(
        F.max(F.struct(F.col("__v").alias("v"))).alias("__hi"),
        F.sum("__v").alias("__n"),
        F.max("__ref").alias("__ref2"),
    )
    top = votes.join(
        per_task.select(
            group_col, task_col,
            F.col("__hi.v").alias("__maxv"), "__n", "__ref2",
        ),
        [group_col, task_col],
    ).where(F.col("__v") == F.col("__maxv"))
    modal = top.groupBy(group_col, task_col).agg(
        F.min(answer_col).alias("__modal"),  # deterministic tie-break
        F.max("__maxv").alias("__mv"),
        F.max("__n").alias("__nn"),
        F.max("__ref2").alias("__r"),
    )
    share_q = F.floor(F.col("__mv") * 1_000_000 / F.col("__nn")).cast(
        "bigint"
    )
    return modal.groupBy(group_col).agg(
        F.count("*").alias("n_tasks"),
        F.count_if(F.col("__modal") == F.col("__r")).alias("n_correct"),
        (
            F.count_if(F.col("__modal") == F.col("__r"))
            / F.count("*")
        ).alias("accuracy"),
        (
            F.sum(share_q) / (F.count("*") * F.lit(1_000_000))
        ).alias("mean_vote_share"),
    )
