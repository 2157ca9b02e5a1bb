"""Market-basket co-occurrence and association rules.

The classic retail-analytics pair: which items appear together in the
same basket, and which "A → B" rules have enough support/confidence/lift
to act on.  The reference has no multi-row-relationship operators at all
(its only combination op is the positional zip join, Combinator.hs:339);
this is part of the beyond-reference relational surface (SURVEY §2.6).

Scale design: the only data-sized shuffles are keyed —
(1) ``distinct()`` on (basket, item) to collapse repeat purchases,
(2) the self-join on the basket key (co-partitioned pair generation;
skew is bounded by the largest basket, quadratic in basket size, so a
``max_basket_size`` guard drops pathological baskets instead of melting
one reducer), and (3) the pair-count aggregation, which partial-aggs
map-side.  Item supports reuse the deduped (basket, item) table, and the
scalar basket count joins in as a broadcast — nothing lands on the
driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def basket_items(
    df: DataFrame, basket_col: str, item_col: str, max_basket_size: int | None = None
) -> DataFrame:
    """Deduped (basket, item) pairs; optionally drop baskets larger than
    ``max_basket_size`` (pair generation is quadratic in basket size)."""
    items = df.select(
        F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
    ).distinct()
    if max_basket_size is not None:
        sizes = items.groupBy("basket").agg(F.count("*").alias("__bsz"))
        items = (
            items.join(sizes, "basket")
            .where(F.col("__bsz") <= max_basket_size)
            .drop("__bsz")
        )
    return items


def cooccurrence_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 1,
    max_basket_size: int | None = None,
) -> DataFrame:
    """Canonical (item_a < item_b) co-occurrence counts across baskets.

    Returns (item_a, item_b, pair_support) with pair_support ≥
    ``min_support``.
    """
    items = basket_items(df, basket_col, item_col, max_basket_size)
    a = items.alias("a")
    b = items.alias("b")
    pairs = a.join(
        b,
        (F.col("a.basket") == F.col("b.basket")) & (F.col("a.item") < F.col("b.item")),
    ).select(F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b"))
    out = pairs.groupBy("item_a", "item_b").agg(F.count("*").alias("pair_support"))
    if min_support > 1:
        out = out.where(F.col("pair_support") >= min_support)
    return out


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket_size: int | None = None,
) -> DataFrame:
    """A→B association rules from pairwise co-occurrence.

    For every ordered pair with pair support ≥ ``min_support``:
    ``confidence = P(B | A) = supp(A,B) / supp(A)`` and
    ``lift = confidence / (supp(B) / n_baskets)`` (lift > 1: A lifts B
    above its base rate).  Both directions of each canonical pair are
    emitted.  Returns (antecedent, consequent, pair_support, confidence,
    lift) with ratios rounded to 6.
    """
    items = basket_items(df, basket_col, item_col, max_basket_size)
    pairs = cooccurrence_pairs(
        df, basket_col, item_col, min_support, max_basket_size
    )
    both = pairs.select(
        F.col("item_a").alias("antecedent"),
        F.col("item_b").alias("consequent"),
        "pair_support",
    ).unionByName(
        pairs.select(
            F.col("item_b").alias("antecedent"),
            F.col("item_a").alias("consequent"),
            "pair_support",
        )
    )
    supp = items.groupBy("item").agg(F.count("*").alias("item_support"))
    # the global basket count is a 1-row aggregate attached by broadcast —
    # the same plan Spark produces for a scalar subquery; every data-sized
    # join in this pipeline is keyed (basket, then item)
    n_baskets = items.agg(F.count_distinct("basket").alias("n_baskets"))
    out = (
        both.join(
            F.broadcast(supp).withColumnRenamed("item", "antecedent").withColumnRenamed(
                "item_support", "ante_support"
            ),
            "antecedent",
        )
        .join(
            F.broadcast(supp).withColumnRenamed("item", "consequent").withColumnRenamed(
                "item_support", "cons_support"
            ),
            "consequent",
        )
        .crossJoin(F.broadcast(n_baskets))
    )
    conf = F.col("pair_support") / F.col("ante_support")
    lift = conf / (F.col("cons_support") / F.col("n_baskets"))
    return out.select(
        "antecedent",
        "consequent",
        "pair_support",
        F.round(conf, 6).alias("confidence"),
        F.round(lift, 6).alias("lift"),
    )


def frequent_sequences(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    min_support: float = 0.5,
    max_pattern_length: int = 2,
) -> DataFrame:
    """Frequent sequential patterns over per-user event streams via
    distributed PrefixSpan (pyspark.ml.fpm — Pei et al. 2001): which
    ordered behaviors ("view → purchase") appear in at least
    ``min_support`` of user sequences.  The sequence-mining complement
    of :mod:`baskets`' association rules (which ignore order).

    Each user's events become one sequence of single-item itemsets,
    ordered by (ts, id) — assembled with one user-keyed aggregation and
    an in-row array_sort, so sequence build is a single shuffle;
    PrefixSpan's projected-database growth is then bounded by
    ``max_pattern_length`` (keep it small: the pattern lattice is the
    scale hazard, not the row count).  Support counts SEQUENCES
    (users), not occurrences — a user repeating view→purchase daily
    counts once, so at length ≤ 2 the result is reproducible as plain
    relational algebra (the oracle's form: first-position(a) <
    last-position(b)).

    Returns (pattern, freq): '→'-joined pattern string and the number
    of user sequences containing it."""
    from pyspark.ml.fpm import PrefixSpan

    seqs = (
        events.where(
            F.col(user_col).isNotNull()
            & F.col(type_col).isNotNull()
            & F.col(ts_col).isNotNull()
        )
        .groupBy(user_col)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col(ts_col), F.col(id_col), F.col(type_col))
                )
            ).alias("__ordered")
        )
        .select(
            F.transform(
                "__ordered", lambda s: F.array(s[type_col])
            ).alias("sequence")
        )
    )
    ps = PrefixSpan(
        minSupport=min_support,
        maxPatternLength=max_pattern_length,
        sequenceCol="sequence",
    )
    found = ps.findFrequentSequentialPatterns(seqs)
    return found.select(
        F.concat_ws("->", F.flatten("sequence")).alias("pattern"),
        F.col("freq"),
    )
