"""Deterministic sampling / split assignment for training pipelines.

Every operator keys off a cross-engine-reproducible content hash (md5 of
the id rendered as a string), NOT ``rand()``: the assignment is a pure
per-row expression — stable across runs, cluster sizes, and engines
(Spark md5 == DuckDB md5), requires no shuffle, and re-appending new data
never reshuffles existing rows between splits.  That idempotence is what
makes hash-splits the standard at 100 TB: the split of a document is a
property of the document, not of the job that assigned it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(col: Column, buckets: int = 10_000) -> Column:
    """Deterministic bucket in ``[0, buckets)`` from the md5 of the
    value's string rendering — 60 bits of the digest, engine-portable
    (DuckDB: ``CAST('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 15) AS
    BIGINT) % buckets``)."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )
    return h % F.lit(buckets)


def split_assignment(
    col: Column,
    weights: dict[str, float],
    buckets: int = 10_000,
) -> Column:
    """string split label for an id column, by cumulative weight over the
    hash-bucket space.  Weights must sum to ~1; the last split absorbs
    the rounding remainder."""
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1 (got {total})")
    b = hash_bucket(col, buckets)
    names = list(weights)
    out = F.lit(names[-1])
    cum = 0.0
    # build the when-chain from the first split: bucket < cum_i → name_i
    conds = []
    for name in names[:-1]:
        cum += weights[name]
        conds.append((int(round(cum * buckets)), name))
    for threshold, name in reversed(conds):
        out = F.when(b < threshold, F.lit(name)).otherwise(out)
    return out


def hash_split(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    buckets: int = 10_000,
) -> DataFrame:
    """df + a ``split`` column ('train'/'val'/'test' by default) assigned
    deterministically from the id hash.  Narrow projection — runs in the
    scan stage, zero shuffle at any scale."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    return df.withColumn("split", split_assignment(F.col(id_col), weights, buckets))


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    buckets: int = 10_000,
) -> DataFrame:
    """Reproducible ``fraction`` subsample by id hash: the same ids are
    selected on every run and on every engine — unlike ``df.sample``,
    whose output depends on partitioning.  Filter is a pure expression
    (pushed into the scan)."""
    if not 0 <= fraction <= 1:
        raise ValueError(f"fraction must be in [0, 1] (got {fraction})")
    return df.where(hash_bucket(F.col(id_col), buckets) < int(round(fraction * buckets)))


def stratified_sample(
    df: DataFrame,
    strata_cols: tuple[str, ...],
    n_per_stratum: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly-N-per-stratum deterministic sample: rank rows inside each
    stratum by their content hash (md5 of the id string — a fixed random
    permutation, engine-portable) and keep the first ``n_per_stratum``.

    Unlike ``df.sampleBy`` (fractions, nondeterministic counts), this
    gives exact per-stratum counts and the same rows on every run and
    engine.  One shuffle on the strata key; the per-stratum window ranks
    within bounded partitions (one stratum each), so no partition is
    global.  Ties are impossible — md5 over distinct ids collides with
    probability ~2^-128 — but the id itself is the final tiebreaker
    anyway, keeping the sample well-defined even with duplicate ids."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*strata_cols)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= n_per_stratum)
        .drop("__rk")
    )


def budget_sample(
    df: DataFrame,
    budgets: dict[str, int],
    group_col: str = "source",
    cost_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Mixture sampling to a per-group cost budget: within each group,
    rows are taken in content-hash order (a fixed random permutation —
    reruns and engines agree) until the running total of ``cost_col``
    reaches that group's budget; the first over-budget row is included so
    every non-empty group with a positive budget contributes at least one
    row and the realized total is the smallest hash-prefix ≥ budget.

    This is how training mixtures are drawn ("2B tokens of web, 500M of
    code"): the selection is a property of the data (hash order + running
    cost), not of the job.  One key shuffle; the cumulative-sum window
    runs inside each group's bounded partition.  Groups absent from
    ``budgets`` are dropped.
    """
    from pyspark.sql import Window

    bmap = F.create_map(
        *[x for k, v in budgets.items() for x in (F.lit(k), F.lit(int(v)))]
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(cost_col)).over(w)
    return (
        df.where(bmap[F.col(group_col)].isNotNull())
        .withColumn("__cum", cum)
        .where(
            F.col("__cum") - F.col(cost_col) < bmap[F.col(group_col)]
        )
        .drop("__cum")
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    buckets: int = 10_000,
) -> DataFrame:
    """Deterministic weighted sample of exactly ``k`` rows without
    replacement (Efraimidis–Spirakis A-ES): each row gets priority
    ``u^(1/w)`` where ``u`` is a uniform derived from the id's content
    hash, and the ``k`` highest priorities win.

    Pure per-row arithmetic plus one top-k (TakeOrderedAndProject — a
    per-partition heap then a k-row merge, never a global sort), so it
    scales to any corpus.  Like every sampler here the selection is a
    property of the row (hash-derived, not ``rand()``): reruns, engines,
    and cluster sizes all agree.  Rows with NULL or non-positive weight
    are excluded.  Ties (identical priority) break on the id.
    """
    w = F.col(weight_col).cast("double")
    u = (hash_bucket(F.col(id_col), buckets) + 1).cast("double") / F.lit(
        float(buckets)
    )
    pri = F.pow(u, F.lit(1.0) / w)
    return (
        df.where(w > 0)
        .withColumn("__pri", pri)
        .orderBy(F.col("__pri").desc(), F.col(id_col).asc())
        .limit(k)
        .drop("__pri")
    )


def mixture_weights(
    df: DataFrame,
    group_col: str = "source",
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-scaled corpus mixing weights: sampling weight
    ``w_g ∝ n_g^alpha`` per group (alpha = 1 reproduces natural
    proportions, alpha → 0 flattens toward uniform — the standard
    multilingual/multi-source rebalancing rule), plus the per-document
    oversampling factor ``epochs_g = w_g · N / n_g`` a sampler applies
    to each group's documents to hit the target mixture.

    One count aggregation to group cardinality (tiny), then the
    normalizing sum rides an unpartitioned window over the HANDFUL of
    group rows — never the documents themselves."""
    from pyspark.sql import Window

    if alpha < 0:
        raise ValueError(f"alpha must be >= 0 (got {alpha})")
    counts = df.groupBy(group_col).agg(F.count("*").alias("n_docs"))
    # group-count rows only (|groups| rows): a global window here is a
    # deliberate single-partition pass over a tiny frame, not a scale
    # hazard like a row-level global window
    w = Window.partitionBy()
    p = F.pow(F.col("n_docs").cast("double"), F.lit(float(alpha)))
    return (
        counts.withColumn("__p", p)
        .withColumn("__tot", F.sum("__p").over(w))
        .withColumn("__n", F.sum("n_docs").over(w))
        .select(
            group_col,
            "n_docs",
            F.round(F.col("__p") / F.col("__tot"), 6).alias("weight"),
            F.round(
                (F.col("__p") / F.col("__tot"))
                * F.col("__n")
                / F.col("n_docs"),
                6,
            ).alias("epochs"),
        )
    )


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    buckets: int = 10_000,
) -> DataFrame:
    """Train/val/test split that CANNOT leak near-duplicates across
    splits: documents are split by the hash of their near-dup COMPONENT
    label (min id of the cluster, from ``pairs`` — e.g.
    ``minhash_dedup_pairs`` output), so a document and its near-copies
    always land in the same split.  A plain per-doc hash split puts
    ~(1−Σwᵢ²) of every duplicate cluster's mass across split boundaries
    — the classic train/test contamination that inflates eval scores.

    Unpaired documents use their own id as the group (equivalent to
    ``hash_split``).  Cost over the pair graph: component propagation
    (O(diameter) key-shuffle rounds over PAIR rows, not the corpus) +
    one corpus-sized left join; the split expression itself is
    scan-stage.  Returns (id, split_group, split)."""
    from kevinlang_spark.operators.dedup import neardup_components

    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    comp = neardup_components(pairs)
    joined = df.select(id_col).join(
        comp, F.col(id_col) == comp["id"], "left"
    )
    grp = F.coalesce(comp["comp"], F.col(id_col))
    return joined.select(
        F.col(id_col),
        grp.alias("split_group"),
        split_assignment(grp, weights, buckets).alias("split"),
    )


def class_balanced_weights(
    df: DataFrame,
    label_col: str = "label",
    beta: float = 0.999,
) -> DataFrame:
    """Class-balanced loss weights via the effective number of samples
    (Cui et al. 2019): ``eff_n = (1 - beta^n) / (1 - beta)`` per class
    and ``weight ∝ 1 / eff_n``, normalized so weights sum to the class
    count — the standard reweighting for long-tailed label
    distributions, sharper than plain 1/n because near-duplicate
    samples add diminishing information as n grows.

    One count aggregation to class cardinality, then the normalizer
    rides an unpartitioned window over the HANDFUL of class rows (the
    mixture_weights pattern) — never the samples themselves.  Returns
    (label, n, eff_n, weight) with eff_n/weight rounded 6dp."""
    if not 0 < beta < 1:
        raise ValueError(f"beta must be in (0, 1) (got {beta})")
    from pyspark.sql import Window

    counts = df.groupBy(label_col).agg(F.count("*").alias("n"))
    eff = (
        F.lit(1.0) - F.pow(F.lit(float(beta)), F.col("n").cast("double"))
    ) / F.lit(1.0 - beta)
    w = Window.partitionBy()
    return (
        counts.withColumn("__eff", eff)
        .withColumn("__raw", F.lit(1.0) / F.col("__eff"))
        .withColumn("__tot", F.sum("__raw").over(w))
        .withColumn("__k", F.count("*").over(w))
        .select(
            F.col(label_col).alias("label"),
            F.col("n").cast("bigint").alias("n"),
            F.round("__eff", 6).alias("eff_n"),
            F.round(
                F.col("__raw") * F.col("__k").cast("double") / F.col("__tot"), 6
            ).alias("weight"),
        )
    )


def epoch_shuffle_keys(
    df: DataFrame,
    id_col: str = "doc_id",
    n_epochs: int = 3,
) -> DataFrame:
    """Deterministic per-epoch shuffle order — the data-loader
    permutation for multi-epoch training, as a PROPERTY of (document,
    epoch) rather than of the job that shuffled: shuffle_key =
    52-bit md5 of ``id || '#ep' || epoch``.  Sorting a shard by
    (epoch, shuffle_key, id) reproduces the same global order on any
    cluster size, any engine, any restart — and each epoch's order is
    independent of every other's, which is the property naive
    ``rand(seed+epoch)`` pipelines silently lose when partitioning
    changes.

    One map-side posexplode over the epoch sequence; zero shuffle (the
    SORT is the consumer's job, bounded per shard exactly like
    pack_sequences).  Returns (id_col, epoch, shuffle_key)."""
    if n_epochs < 1:
        raise ValueError("epoch_shuffle_keys: n_epochs must be >= 1")
    base = df.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.lit(n_epochs - 1))).alias("epoch"),
    )
    sid = F.concat(
        F.col(id_col).cast("string"), F.lit("#ep"),
        F.col("epoch").cast("string"),
    )
    key = F.conv(F.substring(F.md5(sid), 1, 13), 16, 10).cast("bigint")
    return base.select(id_col, "epoch", key.alias("shuffle_key"))


def unimax_weights(
    df: DataFrame,
    group_col: str = "source",
    tokens_col: str = "n_tokens",
    epoch_cap: int = 2,
    budget_num: int = 1,
    budget_den: int = 2,
) -> DataFrame:
    """UniMax corpus-sampling allocation (Chung et al. 2023,
    arXiv:2304.09151): distribute a token budget B = total ·
    budget_num/budget_den across groups as UNIFORMLY as possible
    subject to an ``epoch_cap`` on repetition — no group contributes
    more than ``epoch_cap`` epochs of its own tokens.  The published
    algorithm is a greedy ascending waterfill; this implementation
    uses its closed form, which needs NO sequential fold: with groups
    sorted by token count ascending, the cap binds for a prefix and
    every remaining group receives the same fair share

        alloc_i = E·n_i                         for i ≤ k*
        alloc_i = (B − E·Σ_{j≤k*} n_j)/(L − k*)  for i > k*

    where k* = #{i : E·n_i·(L−i+1) ≤ B − E·prefix_i} (monotone, so a
    count suffices).  Every comparison and prefix sum is INTEGER
    arithmetic — the only doubles are the final per-row divisions —
    so both engines replay exactly.

    Shape: expects the per-group token census (one row per group —
    build it with one corpus aggregation), then windows over the
    HANDFUL of group rows (the :func:`mixture_weights` deliberate
    tiny-frame pattern) — the corpus itself is never re-scanned or
    sorted.

    Returns (group_col, n_tokens, capped, alloc, weight, epochs)."""
    if epoch_cap < 1:
        raise ValueError(f"epoch_cap must be >= 1 (got {epoch_cap})")
    if budget_num < 0 or budget_den < 1:
        raise ValueError(
            f"invalid budget fraction {budget_num}/{budget_den}"
        )
    from pyspark.sql import Window

    n = F.col(tokens_col)
    counts = df.where(n.isNotNull() & (n > 0)).select(
        F.col(group_col), n.cast("bigint").alias("n")
    )
    # group-count rows only: deliberate tiny-frame global windows
    w_all = Window.partitionBy()
    w_ord = Window.partitionBy().orderBy("n", group_col)
    w_pre = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    e = F.lit(int(epoch_cap)).cast("bigint")
    staged = counts.select(
        group_col,
        "n",
        F.count("*").over(w_all).alias("L"),
        F.sum("n").over(w_all).alias("T"),
        F.row_number().over(w_ord).alias("i"),
        F.coalesce(F.sum("n").over(w_pre), F.lit(0).cast("bigint")).alias(
            "pre"
        ),
    ).select(
        group_col,
        "n",
        "L",
        "i",
        "pre",
        # integer floor division (div == DuckDB // on nonnegatives)
        F.expr(
            f"(T * {int(budget_num)}) div {int(budget_den)}"
        ).alias("B"),
    )
    capped = (
        e * F.col("n") * (F.col("L") - F.col("i") + 1)
        <= F.col("B") - e * F.col("pre")
    )
    marked = staged.select(
        group_col, "n", "L", "B", capped.alias("capped")
    )
    rolled = marked.select(
        group_col,
        "n",
        "L",
        "B",
        "capped",
        F.sum(F.col("capped").cast("bigint")).over(w_all).alias("k"),
        F.sum(F.when(F.col("capped"), F.col("n")).otherwise(0))
        .over(w_all)
        .alias("S"),
    )
    # greatest(..., 1): when EVERY group is capped (k == L) the
    # uncapped branch is unreachable, but ANSI Spark can still
    # evaluate the division speculatively — keep the divisor positive
    alloc = F.when(
        F.col("capped"), (e * F.col("n")).cast("double")
    ).otherwise(
        (F.col("B") - e * F.col("S")).cast("double")
        / F.greatest(F.col("L") - F.col("k"), F.lit(1).cast("bigint"))
    )
    out = rolled.select(
        group_col,
        F.col("n").alias(tokens_col),
        "capped",
        alloc.alias("alloc"),
        # a budget that floors to 0 tokens allocates nothing: weight 0
        F.when(F.col("B") > 0, alloc / F.col("B"))
        .otherwise(F.lit(0.0))
        .alias("weight"),
        (alloc / F.col("n")).alias("epochs"),
    )
    return out


def neyman_allocation(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    sample_size: int,
    value_scale: int = 100,
) -> DataFrame:
    """Neyman-optimal stratified sample allocation (Neyman 1934): for
    a fixed total sample size n, allocate n_h ∝ N_h·S_h — stratum
    population times stratum standard deviation — which minimizes the
    variance of the stratified mean estimator.  The planning step
    before any stratified corpus audit or labeling budget.

    Determinism: values quantize to ``value_scale`` integer units
    first, so each stratum's (n, Σv, Σv²) are BIGINT-exact in any
    order; S_h = sqrt((q·n − s²)/n²) is a fixed expression of those
    integers, and the normalizer Σ N_h·S_h folds IN-ROW over the
    stratum-sorted array (bounded strata, the t-closeness domain
    pattern).  Integer allocations use floor(x + 0.5) — engine-
    identical — and may differ from ``sample_size`` by the rounding
    remainder (documented survey-sampling behavior).

    Returns (stratum_col, n_pop, stratum_sd, weight, alloc_frac,
    alloc)."""
    if sample_size < 1:
        raise ValueError(f"sample_size must be >= 1 (got {sample_size})")
    if value_scale < 1:
        raise ValueError(f"value_scale must be >= 1 (got {value_scale})")
    s = int(value_scale)
    v = F.col(value_col)
    q = F.floor(v * F.lit(s) + F.lit(0.5)).cast("bigint")
    base = df.where(v.isNotNull()).select(
        F.col(stratum_col), q.alias("__q")
    )
    per = base.groupBy(stratum_col).agg(
        F.count("*").cast("bigint").alias("n_pop"),
        F.sum("__q").alias("__s"),
        F.sum(F.col("__q") * F.col("__q")).alias("__qq"),
    )
    nh = F.col("n_pop")
    var = (F.col("__qq") * nh - F.col("__s") * F.col("__s")).cast(
        "double"
    ) / (nh * nh)
    sd = F.sqrt(var) / F.lit(float(s))
    scored = per.select(
        stratum_col, "n_pop", sd.alias("stratum_sd")
    )
    one = scored.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(stratum_col).alias("g"),
                    F.col("n_pop").alias("np"),
                    F.col("stratum_sd").alias("sd"),
                )
            )
        ).alias("a")
    )
    a = F.col("a")
    tot = F.aggregate(
        a, F.lit(0.0), lambda acc, x: acc + x["np"] * x["sd"]
    )
    staged = one.select("a", tot.alias("__tot"))
    ex = staged.select("__tot", F.explode(a).alias("r"))
    r = F.col("r")
    w = F.when(
        F.col("__tot") > 0, r["np"] * r["sd"] / F.col("__tot")
    ).otherwise(F.lit(0.0))
    frac = w * F.lit(float(sample_size))
    return ex.select(
        r["g"].alias(stratum_col),
        r["np"].alias("n_pop"),
        r["sd"].alias("stratum_sd"),
        w.alias("weight"),
        frac.alias("alloc_frac"),
        F.floor(frac + F.lit(0.5)).cast("bigint").alias("alloc"),
    )
