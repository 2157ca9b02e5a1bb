"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (revenue by nation) at sf0.001.
``queries()`` exposes one entry per implemented operator from SURVEY.md §2
(+ extension ops); ``oracle_sql()`` gives the DuckDB-equivalent SQL the
driver compares against at sf0.01 (row-count + schema + order-insensitive
value-hash).  Aggregate outputs are rounded identically on both sides so
double-precision accumulation order cannot flip the hash.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kevinlang_spark.frame import KevinFrame, SortOrder  # noqa: E402


_ENSURED: set[str] = set()


def _ensure(spark: SparkSession) -> None:
    """Make an arbitrary (driver-owned) SparkSession able to run every
    query: the nanos-timestamp legacy conf is dynamic and set here, and the
    package is shipped to Python workers via addPyFile — workers of a
    session created before this module was imported have neither the
    PYTHONPATH nor the cwd to resolve ``kevinlang_spark`` for
    module-pickled UDF closures."""
    # session confs are PER-SESSION (newSession() shares the app id but not
    # confs) — set unconditionally; it's a cheap local call
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # static in some deployments; load_events copes if unset
    key = spark.sparkContext.applicationId
    if key in _ENSURED:
        return
    import hashlib
    import zipfile

    pkg_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "kevinlang_spark")
    # content-hashed zip name: a stale cached zip would SHADOW fresh source
    # on workers (addPyFile targets land at sys.path[1], ahead of PYTHONPATH)
    digest = hashlib.md5()
    members = []
    for root, _, files in os.walk(pkg_dir):
        for f in sorted(files):
            if f.endswith(".py"):
                full = os.path.join(root, f)
                members.append(full)
    for full in sorted(members):
        digest.update(full.encode())
        with open(full, "rb") as fh:
            digest.update(fh.read())
    zpath = os.path.join("/tmp", f"kevinlang_spark_pkg_{digest.hexdigest()[:12]}.zip")
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as z:
            for full in members:
                rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                z.write(full, rel)
    try:
        spark.sparkContext.addPyFile(zpath)
    except Exception:
        pass  # already added in this context
    _ENSURED.add(key)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure(spark)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _artifact_path(sf_dir: str, kind: str, *source_files: str) -> str:
    """Temp-dir path for a build-once-per-machine artifact (persisted
    ANN index, synthesized media fixture dir).  The tag folds a hash of
    the GENERATING source files into the key alongside sf_dir, so
    changing the build code invalidates the cache instead of silently
    reusing an artifact built by an older formula (ADVICE r8 item 1).
    ``source_files`` are repo-relative (e.g.
    ``kevinlang_spark/operators/similarity.py``); this entry module is
    always included since fixture formulas live here too."""
    import hashlib
    import tempfile

    h = hashlib.md5(sf_dir.encode())
    root = os.path.dirname(os.path.abspath(__file__))
    for rel in (*source_files, "__spark_entry__.py"):
        with open(os.path.join(root, rel), "rb") as fh:
            h.update(fh.read())
    return os.path.join(
        tempfile.gettempdir(), f"kevinlang_{kind}_{h.hexdigest()[:10]}"
    )


def _kf(spark: SparkSession, sf_dir: str, name: str, ordered: bool = False) -> KevinFrame:
    return KevinFrame.from_df(_t(spark, sf_dir, name), ordered=ordered)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kevinlang_spark.sources.parquet import load_events

    _ensure(spark)
    return load_events(spark, sf_dir)


# --------------------------------------------------------------------- #
# flagship
# --------------------------------------------------------------------- #


def _revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⨝ orders ⨝ customer ⨝ nation → revenue per nation.

    Fact-side joins shuffle on their keys; the 25-row nation dim is
    broadcast.  Aggregation is partial (map-side) before the final shuffle —
    all vanilla Catalyst physical planning.
    """
    li = _kf(spark, sf_dir, "lineitem")
    orders = _kf(spark, sf_dir, "orders")
    cust = _kf(spark, sf_dir, "customer")
    nation = _kf(spark, sf_dir, "nation")

    out = (
        li.merge(orders, on=li.df.l_orderkey == orders.df.o_orderkey)
        .merge(cust, on=F.col("o_custkey") == cust.df.c_custkey)
        .merge(
            nation,
            on=F.col("c_nationkey") == nation.df.n_nationkey,
            broadcast_other=True,
        )
        .with_column("rev", F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .groupby("n_name")
        .aggregate("sum", "rev", alias="revenue")
    )
    return out.to_df().select("n_name", F.round("revenue", 2).alias("revenue"))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _revenue_by_nation(spark, "/root/testdata/sf0.001")


# --------------------------------------------------------------------- #
# operator queries (SURVEY.md §2)
# --------------------------------------------------------------------- #


def q_select(spark, sf_dir):
    """P1 select: project + reorder (Combinator.hs:46-55)."""
    li = _kf(spark, sf_dir, "lineitem")
    return li.select(["l_orderkey", "l_linenumber", "l_quantity"]).to_df()


def q_filter(spark, sf_dir):
    """P2 filter: typed predicates, NULL→dropped (Combinator.hs:122-200)."""
    li = _kf(spark, sf_dir, "lineitem")
    out = (
        li.filter("l_quantity", lambda c: c > 45)
        .filter("l_returnflag", lambda c: c == "R")
        .select(["l_orderkey", "l_quantity", "l_returnflag"])
    )
    return out.to_df()


def q_groupby_sum(spark, sf_dir):
    """G1+G2+G3: groupby + sum aggregation, groups ascending by key."""
    li = _kf(spark, sf_dir, "lineitem")
    out = li.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        "sum", "l_quantity", alias="sum_qty"
    )
    return out.to_df().select(
        "l_returnflag", "l_linestatus", F.round("sum_qty", 2).alias("sum_qty")
    )


def q_agg_global(spark, sf_dir):
    """G2 global aggregate: no groups → one row (Combinator.hs:210-212)."""
    orders = _kf(spark, sf_dir, "orders")
    out = orders.aggregate("sum", "o_totalprice", alias="total")
    return out.to_df().select(F.round("total", 2).alias("total"))


def q_agg_stats(spark, sf_dir):
    """G4-G7: mean / count / population variance / population sd —
    computed in ONE groupBy via aggregate_many (one scan, one shuffle;
    the per-statistic `aggregate` surface stays for reference parity)."""
    li = _kf(spark, sf_dir, "lineitem")
    out = li.groupby("l_returnflag").aggregate_many(
        [
            ("mean", "l_quantity", "avg_qty"),
            ("count", "l_quantity", "n"),
            ("variance", "l_discount", "var_disc"),
            ("sd", "l_discount", "sd_disc"),
        ]
    ).to_df()
    return out.select(
        "l_returnflag",
        F.round("avg_qty", 4).alias("avg_qty"),
        F.col("n"),
        F.round("var_disc", 6).alias("var_disc"),
        F.round("sd_disc", 6).alias("sd_disc"),
    )


def q_agg_concat(spark, sf_dir):
    """G8 concat: order-sensitive string aggregation (Aggregator.hs:23-24)."""
    nation = _kf(spark, sf_dir, "nation", ordered=True)
    out = nation.sort("n_nationkey").groupby("n_regionkey").aggregate(
        "concat", "n_name", alias="names"
    )
    return out.to_df()


def q_sort_take(spark, sf_dir):
    """O1+O2 sort desc + take → top-k (Catalyst fuses to TakeOrderedAndProject)."""
    orders = _kf(spark, sf_dir, "orders", ordered=True)
    # pre-sort by orderkey so price ties break deterministically (the
    # descending sort reverses the prior order → larger orderkey first),
    # matching the oracle's explicit DESC tiebreak
    out = (
        orders.sort("o_orderkey")
        .sort("o_totalprice", SortOrder.DESCENDING)
        .take(10)
    )
    return out.to_df().select("o_orderkey", "o_totalprice")


def q_slice(spark, sf_dir):
    """O3-O7 slicing: drop 5 then take 10 of the nationkey order."""
    nation = _kf(spark, sf_dir, "nation", ordered=True)
    out = nation.sort("n_nationkey").drop(5).take(10)
    return out.to_df().select("n_nationkey", "n_name")


def q_melt(spark, sf_dir):
    """R1 melt: wide→long, var-major order (Combinator.hs:78-120)."""
    part = _kf(spark, sf_dir, "part", ordered=True)
    out = part.melt(["p_partkey"], ["p_size", "p_retailprice"])
    return out.to_df()


def q_cast_pivot(spark, sf_dir):
    """R2 cast: long→wide crosstab with sum (Combinator.hs:269-276)."""
    orders = _kf(spark, sf_dir, "orders")
    wide = orders.cast(["o_orderpriority"], ["o_orderstatus"], "sum", "o_totalprice")
    df = wide.pivot_table()
    return df.select(
        "o_orderpriority",
        F.round("F", 2).alias("F"),
        F.round("O", 2).alias("O"),
        F.round("P", 2).alias("P"),
    )


def q_append(spark, sf_dir):
    """C1 append: vertical union keeping duplicates (Combinator.hs:317-337)."""
    cust = _kf(spark, sf_dir, "customer").select(
        ["c_custkey", "c_acctbal", "c_mktsegment"]
    )
    a = cust.filter("c_acctbal", lambda c: c < 0)
    b = cust.filter("c_mktsegment", lambda c: c == "BUILDING")
    return a.append(b).to_df()


def q_pos_join(spark, sf_dir):
    """C2 positional (zip) join — the reference's only join (Combinator.hs:339-360)."""
    nation = _kf(spark, sf_dir, "nation", ordered=True)
    left = nation.sort("n_name").select(["n_name"])
    right = nation.sort("n_nationkey", SortOrder.DESCENDING).select(["n_nationkey"])
    return left.join(right).to_df()


def q_revenue_by_nation(spark, sf_dir):
    """Flagship: relational joins + groupby-sum (SURVEY §7 M0)."""
    return _revenue_by_nation(spark, sf_dir)


# --------------------------------------------------------------------- #
# TPC-H-style relational queries (beyond-reference: real join capability)
# --------------------------------------------------------------------- #


def q_tpch_q1(spark, sf_dir):
    """Pricing summary report: multi-aggregate groupBy with a pushed-down
    scan filter (the canonical partial-agg + codegen shape)."""
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp")
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q_tpch_q3(spark, sf_dir):
    """Shipping priority: 3-way join, filter both sides, top-10 by revenue."""
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


def q_tpch_q5(spark, sf_dir):
    """Local supplier volume: 6-way join with two broadcast dims."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    region = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .where(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


def q_tpch_q6(spark, sf_dir):
    """Forecast revenue: pure scan-filter-aggregate (pushdown showcase)."""
    li = _t(spark, sf_dir, "lineitem")
    out = li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        )
    )
    return out


def q_tpch_q4(spark, sf_dir):
    """Order-priority checking (TPC-H Q4 adapted: the testdata lineitem has
    no commit/receipt dates, so 'late' = shipped >60 days after the order
    date).  Equi semi-join on orderkey with the lateness predicate as a
    residual join filter — one key shuffle, no row duplication from
    multi-line orders."""
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "leftsemi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


def q_tpch_q12(spark, sf_dir):
    """Shipping-priority mix (TPC-H Q12 adapted: returnflag stands in for
    the absent shipmode).  Join + conditional aggregation — the CASE sums
    fold map-side."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def q_tpch_q13(spark, sf_dir):
    """Customer order-count distribution (TPC-H Q13): left join preserving
    order-less customers, then a double aggregation.  Both groupBys are
    partial-agg'd; the second one runs on ≤ |customers| rows."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


def q_tpch_q14(spark, sf_dir):
    """Promotion revenue share (TPC-H Q14): join + ratio-of-conditional-sums
    to one row.  No broadcast hint — AQE picks broadcast at bench scale and
    a shuffle join when part outgrows the threshold."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue")
        )
    )


def q_tpch_q18(spark, sf_dir):
    """Large-volume customers (TPC-H Q18): pre-aggregate lineitem by order
    (the big side collapses BEFORE any join), filter on the sum, then two
    key joins on the surviving handful of orders."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 250)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("sum_qty", 2).alias("sum_qty"),
        )
    )


def q_tpch_q22(spark, sf_dir):
    """Dormant rich customers (TPC-H Q22 adapted: nationkey stands in for
    the absent phone prefix; 'dormant' = no order since 1999, since every
    synthetic customer has at least one order).  The global average rides a
    broadcast 1-row cross join (no driver-side collect); dormant = anti
    join against the date-filtered orders."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("__avg_bal")
    )
    rich = cust.join(F.broadcast(avg_bal)).where(
        F.col("c_acctbal") > F.col("__avg_bal")
    )
    recent = orders.where(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    )
    dormant = rich.join(recent, rich.c_custkey == recent.o_custkey, "leftanti")
    return dormant.groupBy("c_nationkey").agg(
        F.count("*").alias("numcust"),
        F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
    )


def q_tpch_q2(spark, sf_dir):
    """Minimum-cost supplier (TPC-H Q2 adapted: the testdata has no
    partsupp table, so supply cost of a (part, supplier) pair is derived
    as min(l_extendedprice / l_quantity) over their lineitems).  The
    correlated MIN subquery becomes a window min over the per-part
    partition — costs are already grouped by (part, supp), so the window
    adds exactly one partkey shuffle; supplier/nation/region dims ride
    broadcasts."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost")
    )
    eu = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(_t(spark, sf_dir, "region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .where(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    costs_eu = cost.join(F.broadcast(eu), cost.l_suppkey == eu.s_suppkey)
    w = Window.partitionBy("l_partkey")
    best = costs_eu.withColumn("min_cost", F.min("cost").over(w)).where(
        F.col("cost") == F.col("min_cost")
    )
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    return (
        best.join(F.broadcast(part), best.l_partkey == part.p_partkey)
        .select(
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            # No rounding: s_acctbal is a raw parquet column and cost is
            # min(price/qty) — both bit-identical IEEE doubles in any
            # engine, while round() at a .xx5 boundary is convention-
            # dependent (Spark HALF_UP on decimal string vs binary round).
            "s_acctbal",
            F.col("cost").alias("supply_cost"),
        )
    )


def q_tpch_q7(spark, sf_dir):
    """Volume shipping between two nations (TPC-H Q7): supplier-nation ×
    customer-nation revenue by ship year.  The two nation lookups are
    independent broadcasts; the only big shuffles are the lineitem⨝orders
    and ⨝customer key joins, and the final 4-row aggregation folds
    map-side."""
    n1 = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
        )
    )
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    pair = (
        li.join(_t(spark, sf_dir, "supplier"), li.l_suppkey == F.col("s_suppkey"))
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(_t(spark, sf_dir, "orders"), li.l_orderkey == F.col("o_orderkey"))
        .join(_t(spark, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .where(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return pair.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )


def q_tpch_q8(spark, sf_dir):
    """National market share (TPC-H Q8): NATION_3's share of PROMO-part
    revenue among ASIA customers, by order year.  Conditional-sum ratio —
    one pass, no self-join; part/nation/region broadcast, customer joins
    by key."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    supp_n = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
        )
    )
    cust_n = F.broadcast(
        _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    )
    region = F.broadcast(
        _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(_t(spark, sf_dir, "orders"), li.l_orderkey == F.col("o_orderkey"))
        .join(_t(spark, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(cust_n, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .join(_t(spark, sf_dir, "supplier"), li.l_suppkey == F.col("s_suppkey"))
        .join(supp_n, F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("mkt_share")
        )
    )


def q_tpch_q9(spark, sf_dir):
    """Product-type profit (TPC-H Q9 adapted: with no partsupp, supply
    cost is substituted by 0.5 × p_retailprice per unit).  Profit by
    supplier nation and order year over parts named like '%red%'; the
    part filter broadcasts into the lineitem scan, so the big joins see
    only matching rows."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(_t(spark, sf_dir, "supplier"), li.l_suppkey == F.col("s_suppkey"))
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(_t(spark, sf_dir, "orders"), li.l_orderkey == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.round(F.sum(profit), 2).alias("sum_profit"))
    )


def q_tpch_q11(spark, sf_dir):
    """Important stock (TPC-H Q11 adapted: part value := total extended
    price shipped by NATION_5's suppliers, standing in for
    ps_supplycost × ps_availqty).  The HAVING threshold is a scalar
    subquery — computed as a 1-row aggregate broadcast-cross-joined onto
    the per-part values, never collected to the driver."""
    li = _t(spark, sf_dir, "lineitem")
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .where(F.col("n_name") == "NATION_5")
        .select("s_suppkey")
    )
    li_n = li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
    val = li_n.groupBy("l_partkey").agg(F.sum("l_extendedprice").alias("value"))
    total = val.agg(F.sum("value").alias("__total"))
    return (
        val.join(F.broadcast(total))
        .where(F.col("value") > 0.001 * F.col("__total"))
        .select("l_partkey", F.round("value", 2).alias("value"))
    )


def q_tpch_q15(spark, sf_dir):
    """Top supplier (TPC-H Q15): quarterly revenue per supplier, keep the
    max.  The revenue 'view' aggregates once; the scalar max rides a
    broadcast cross join back onto it (the classic argmax-without-collect
    shape, same as q_tpch_q22's average)."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("__max_rev"))
    return (
        rev.join(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("__max_rev"))
        .join(
            _t(spark, sf_dir, "supplier"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            "s_suppkey", "s_name", F.round("total_revenue", 2).alias("total_revenue")
        )
    )


def q_tpch_q16(spark, sf_dir):
    """Parts/supplier relationship (TPC-H Q16 adapted: the part-supplier
    relation is the distinct (l_partkey, l_suppkey) pairs from lineitem,
    and the 'complaints' supplier exclusion becomes s_acctbal < 0).
    COUNT(DISTINCT) over a pre-deduplicated pair set — the dedup and the
    count share one (partkey-side) shuffle chain."""
    li = _t(spark, sf_dir, "lineitem")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    bad = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    return (
        pairs.join(F.broadcast(bad), pairs.l_suppkey == bad.s_suppkey, "leftanti")
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q_tpch_q17(spark, sf_dir):
    """Small-quantity-order revenue (TPC-H Q17): lineitems of one brand
    whose quantity is below 20% of that part's average.  The correlated
    AVG subquery becomes a per-part aggregate joined back — both sides
    shrink to the brand's parts first (broadcast), so the self-join is
    tiny.  Quantities are whole numbers: their double sums are exact, so
    the 0.2×avg threshold is engine-portable."""
    part = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    li = _t(spark, sf_dir, "lineitem").join(
        F.broadcast(part.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    lim = li.groupBy(F.col("l_partkey").alias("__pk")).agg(
        (F.avg("l_quantity") * 0.2).alias("__lim")
    )
    small = li.join(F.broadcast(lim), F.col("l_partkey") == F.col("__pk")).where(
        F.col("l_quantity") < F.col("__lim")
    )
    return small.agg(
        F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly")
    )


def q_tpch_q19(spark, sf_dir):
    """Discounted revenue (TPC-H Q19 adapted: container/shipmode absent —
    the three OR'd branches pair brands with size and quantity bands).
    The disjunction shares the partkey equi-join; Catalyst keeps the OR
    as a residual filter, so this is one broadcast join, not three."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    q, sz, br = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    branch = (
        ((br == "Brand#12") & sz.between(1, 5) & q.between(1, 11))
        | ((br == "Brand#23") & sz.between(1, 10) & q.between(10, 20))
        | ((br == "Brand#3") & sz.between(1, 15) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .where(branch)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


def q_tpch_q20(spark, sf_dir):
    """Potential part promotion (TPC-H Q20 adapted: no ps_availqty — a
    supplier qualifies when their 1996 shipped quantity of '%red%' parts
    exceeds 100 units).  The nested IN subqueries become a pre-aggregated
    qualifier set semi-joined to supplier; everything after the lineitem
    aggregation is broadcast-sized."""
    part = _t(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    qualifying = (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 100)
        .select("l_suppkey")
    )
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(_t(spark, sf_dir, "nation")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).where(F.col("n_name") == "NATION_7")
    return (
        supp.join(qualifying, supp.s_suppkey == F.col("l_suppkey"), "leftsemi")
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
    )


def q_tpch_q21(spark, sf_dir):
    """Suppliers who kept orders waiting (TPC-H Q21 adapted: lineitem has
    no receipt/commit dates, so 'late' = shipped >60 days after the order
    date).  A NATION_2 supplier's late lineitem counts when another
    supplier fed the same finished order (semi join) but no OTHER supplier
    was also late on it (anti join).  The late set is computed once and
    reused for both probes; all four joins shuffle on orderkey only."""
    orders_f = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem")
    late = (
        li.join(orders_f, li.l_orderkey == orders_f.o_orderkey)
        .where(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    )
    supp_n = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .where(F.col("n_name") == "NATION_2")
        .select("s_suppkey", "s_name")
    )
    l1 = late.join(F.broadcast(supp_n), late.l_suppkey == supp_n.s_suppkey)
    others = li.select(
        F.col("l_orderkey").alias("o2_key"), F.col("l_suppkey").alias("s2_key")
    )
    late_others = late.select(
        F.col("l_orderkey").alias("o3_key"), F.col("l_suppkey").alias("s3_key")
    )
    waited = (
        l1.join(
            others,
            (l1.l_orderkey == F.col("o2_key")) & (l1.l_suppkey != F.col("s2_key")),
            "leftsemi",
        )
        .join(
            late_others,
            (F.col("l_orderkey") == F.col("o3_key"))
            & (F.col("l_suppkey") != F.col("s3_key")),
            "leftanti",
        )
    )
    return waited.groupBy("s_name").agg(F.count("*").alias("numwait"))


# --------------------------------------------------------------------- #
# window functions (absent in reference, SURVEY §2.7 — free in Spark)
# --------------------------------------------------------------------- #


def q_window_rank(spark, sf_dir):
    """Top-3 orders by totalprice within each priority (ranking window)."""
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("o_orderpriority", "rk", "o_orderkey", "o_totalprice")
    )


def q_window_dist(spark, sf_dir):
    """Distribution-ranking windows — ntile(4), percent_rank, cume_dist
    per order priority over total price (deterministic total order via
    the orderkey tie-break).  Completes the ranking-window family next
    to row_number (q_window_rank) and lag (q_window_lag); all three
    distribution functions ride ONE partitioned sort, and both engines
    define them identically (ANSI): ntile = balanced buckets,
    percent_rank = (rank-1)/(n-1), cume_dist = rank_hi/n."""
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.ntile(4).over(w).alias("quartile"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
        )
    )


def q_window_lag(spark, sf_dir):
    """Per-customer order-to-order price delta (analytic window)."""
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    return (
        _t(spark, sf_dir, "orders")
        .withColumn(
            "delta", F.round(F.col("o_totalprice") - F.lag("o_totalprice").over(w), 2)
        )
        .select("o_custkey", "o_orderkey", "delta")
    )


# --------------------------------------------------------------------- #
# events: time windows + sessionization
# --------------------------------------------------------------------- #


def q_events_hourly(spark, sf_dir):
    """Tumbling 1h windows per event type (streaming-shaped groupBy)."""
    from kevinlang_spark.streaming.windows import tumbling_counts

    return tumbling_counts(_events(spark, sf_dir), "1 hour").select(
        "window_start", "event_type", "n", "value_sum"
    )


def q_events_sessions(spark, sf_dir):
    """Gap-based sessionization (session_window) — per-user session stats."""
    from kevinlang_spark.streaming.windows import session_counts

    return session_counts(_events(spark, sf_dir), gap="30 minutes").select(
        "user_id", "session_start", "n_events", "value_sum"
    )


def q_stream_sessions(spark, sf_dir):
    """STREAMING gap-based sessionization: the SAME session_counts
    transform as batch q_events_sessions driven through an availableNow
    file-source stream into a complete-mode memory sink —
    session_window's stateful session-merge must converge to the batch
    gaps-and-islands answer once the stream drains."""
    from kevinlang_spark.streaming.windows import (
        run_stream_to_memory,
        session_counts,
    )

    return run_stream_to_memory(
        spark,
        f"{sf_dir}/events.parquet",
        lambda src: session_counts(src, gap="30 minutes").select(
            "user_id", "session_start", "n_events", "value_sum"
        ),
        query_name="q_stream_sessions_mem",
    )


def q_zorder_keys(spark, sf_dir):
    """Z-order (Morton) layout keys over lineitem (quantity ×
    extendedprice), the Delta/Iceberg OPTIMIZE-ZORDER mechanism
    (layout.py): pure shift/and/or bit interleaving of two 16-bit
    quantized dims — writing sorted by zkey clusters BOTH columns so
    per-file min-max stats prune 2-D box predicates (measured in
    test_zorder).  Output: per-row keys, bit-for-bit oracled."""
    from kevinlang_spark.operators.layout import zorder_keys

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )
    return zorder_keys(
        li, "l_quantity", (1.0, 50.0), "l_extendedprice", (900.0, 105000.0)
    ).select("l_orderkey", "l_linenumber", "zkey")


def q_dsir_weights(spark, sf_dir):
    """DSIR importance-resampling weights (text.py dsir_weights):
    score every document by hashed-bigram log-likelihood ratio toward
    the lang='en' target slice — the modern pretraining-data selection
    method, as one scan + two ≤1024-key count aggregates + one
    broadcast ratio join."""
    from kevinlang_spark.operators.text import dsir_weights

    docs = _t(spark, sf_dir, "documents")
    return dsir_weights(docs, F.col("lang") == "en", buckets=1024)


def q_fingerprint_clusters(spark, sf_dir):
    """OpenRefine-style fingerprint clustering (quality.py): documents
    whose sorted-unique-token key collides but whose raw text differs —
    word-order/punctuation variants of the same content, with a
    deterministic canonical election (most frequent, ties
    alphabetical)."""
    from kevinlang_spark.operators.quality import fingerprint_clusters

    return fingerprint_clusters(_t(spark, sf_dir, "documents"))


def q_fd_check(spark, sf_dir):
    """Functional-dependency verification (quality.py fd_violations):
    does source → lang hold over documents?  One grouped
    count-distinct + metadata rollup — the per-candidate probe of FD
    discovery."""
    from kevinlang_spark.operators.quality import fd_violations

    return fd_violations(_t(spark, sf_dir, "documents"), ["source"], "lang")


def q_trigram_search(spark, sf_dir):
    """Trigram-index substring search (text.py trigram_search): docs
    matching 'window table' via posting-list intersection + contains
    verify.  The oracle is the brute-force LIKE scan — equality proves
    the index path complete."""
    from kevinlang_spark.operators.text import trigram_search

    return trigram_search(_t(spark, sf_dir, "documents"), "window table")


def q_feature_hash(spark, sf_dir):
    """Hashing-trick featurizer (text.py feature_hash, dim=256): the
    vocabulary-free sparse vectorizer — md5-slot + md5-sign per token,
    one explode + one (id, idx) shuffle.  The oracle recomputes the
    identical slot/sign hashes, so collisions match bit-for-bit."""
    from kevinlang_spark.operators.text import feature_hash

    return feature_hash(_t(spark, sf_dir, "documents"), dim=256)


def q_radius_join(spark, sf_dir):
    """Grid-blocked spatial radius join (spatial.py): customers get
    deterministic synthetic coordinates in a 10°×10° region; find all
    pairs within 50 km by cell blocking + 3×3 probe neighborhood +
    haversine verify.  The oracle is the BRUTE-FORCE O(n²) distance
    filter — a hash match proves the blocking complete, not merely
    self-consistent."""
    from kevinlang_spark.operators.spatial import radius_join_pairs

    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        ((F.col("c_custkey") % 100) / 10.0 + 40.0).alias("lat"),
        ((F.col("c_custkey") * 7 % 100) / 10.0).alias("lon"),
    )
    return radius_join_pairs(cust, "id", "lat", "lon", radius_km=50.0)


def q_record_linkage(spark, sf_dir):
    """Fellegi–Sunter probabilistic record linkage (linkage.py):
    nationkey-blocked customer pairs scored by Σ log2(m/u) agreement
    weights over (segment, coarse/fine balance buckets), with
    u-probabilities estimated from the data as value-collision
    probabilities — rare-value agreement earns big weight, common-value
    agreement almost none."""
    from kevinlang_spark.operators.linkage import fs_link_pairs

    cust = (
        _t(spark, sf_dir, "customer")
        .withColumn("bal_k", F.floor(F.col("c_acctbal") / 1000))
        .withColumn("bal_h", F.floor(F.col("c_acctbal") / 100))
    )
    return fs_link_pairs(
        cust,
        "c_custkey",
        F.col("c_nationkey"),
        {"c_mktsegment": 0.9, "bal_k": 0.85, "bal_h": 0.7},
        threshold=8.0,
    )


def q_media_decode(spark, sf_dir):
    """REAL container decode with zero codecs (multimodal.py
    stdlib_decode): synthesize valid BMP/WAV payloads executor-side
    (real struct-packed container bytes), decode their actual headers
    through the mapInPandas feature extractor, and check the decoded
    dimensions/frame counts against the generation formula — the
    end-to-end proof that the media plumbing decodes real bytes, not
    fakes."""
    from kevinlang_spark.operators.multimodal import (
        attach_stdlib_media,
        extract_media_features,
        stdlib_decode,
    )

    docs = _t(spark, sf_dir, "documents")
    media = attach_stdlib_media(docs)
    return extract_media_features(media, decode=stdlib_decode).select(
        "doc_id", "media_type", "n_bytes", "width", "height", "n_frames"
    )


def q_media_pixels(spark, sf_dir):
    """FULL media decode with zero codecs (multimodal.py
    stdlib_pixel_decode): synthesize BMP/PNG/WAV payloads with
    deterministic CONTENT (pixel RGB and sample amplitude are
    closed-form in doc_id; doc_id % 4 == 2 images travel as real
    zlib-deflated PNGs), then decode the actual pixel grids / PCM
    sample streams through mapInPandas and report content statistics —
    per-channel means for images, RMS/peak for audio.  The oracle
    predicts every statistic from the generation formula (container-
    invariant by construction), so this is the end-to-end proof that
    real pixel/sample bytes survive the pipeline — including a full
    PNG inflate+unfilter — not just container headers."""
    from kevinlang_spark.operators.multimodal import (
        attach_stdlib_media,
        extract_pixel_stats,
    )

    docs = _t(spark, sf_dir, "documents")
    media = attach_stdlib_media(docs, filled=True, png=True)
    return extract_pixel_stats(media)


def q_media_jpeg(spark, sf_dir):
    """FULL baseline-JPEG decode with zero codec libraries
    (operators/jpeg.py): synthesize real baseline-sequential JPEG bytes
    executor-side — greyscale level doc_id % 256, dimensions from
    doc_id, every 4th image carrying restart markers — then
    Huffman-decode + IDCT the actual MCU stream through mapInPandas
    and report per-channel means.  The encoder writes all-ones
    quantization tables, so constant blocks round-trip bit-EXACTLY and
    the oracle predicts every statistic in closed form — the
    end-to-end proof that entropy-coded DCT pixel data survives the
    pipeline, not just container headers."""
    from kevinlang_spark.operators.multimodal import (
        attach_stdlib_media,
        extract_pixel_stats,
    )

    docs = _t(spark, sf_dir, "documents")
    media = attach_stdlib_media(docs, filled=True, jpeg=True)
    return extract_pixel_stats(media)


def q_media_flac(spark, sf_dir):
    """FULL FLAC decode with zero codec libraries (operators/flac.py):
    synthesize real rice-coded FLAC streams executor-side — constant
    amplitude doc_id % 2048 over doc_id % 1000 + 1 samples, multiple
    256-sample blocks — then bit-decode the subframes through
    mapInPandas and report RMS/peak.  Lossless constant blocks decode
    exactly, so the oracle is the same closed form as the PCM-WAV
    variant (q_media_pixels) — the proof that entropy-coded AUDIO
    survives the pipeline; only lossy codecs remain gated."""
    from kevinlang_spark.operators.multimodal import (
        attach_stdlib_media,
        extract_pixel_stats,
    )

    docs = _t(spark, sf_dir, "documents")
    media = attach_stdlib_media(docs, filled=True, flac=True)
    return extract_pixel_stats(media)


def q_media_gif(spark, sf_dir):
    """FULL animated-GIF decode with zero codec libraries
    (operators/gif.py): synthesize real multi-frame LZW streams
    executor-side — doc_id % 5 + 1 constant-color frames per image —
    then LZW-decompress, composite, and report whole-file statistics
    (channel means average over ALL frames).  The oracle replays the
    per-frame palette formula with a bounded generate_series — the
    proof that entropy-coded multi-FRAME pixel data survives the
    pipeline."""
    from kevinlang_spark.operators.multimodal import (
        attach_stdlib_media,
        extract_pixel_stats,
    )

    docs = _t(spark, sf_dir, "documents")
    media = attach_stdlib_media(docs, filled=True, gif=True)
    return extract_pixel_stats(media)


def q_media_frames(spark, sf_dir):
    """Frame SAMPLING + RESIZE over animated media (multimodal.py
    extract_frame_stats): decode each GIF's real frames, keep every 2nd,
    nearest-resize each to an 8×8 thumbnail, and emit one row per
    sampled frame — the decode→sample→resize front half of a
    vision-training pipeline, Arrow-batched like every extractor.
    Constant frames make the post-resize means exact, so the oracle is
    the closed-form palette formula over the sampled frame indices."""
    from kevinlang_spark.operators.multimodal import (
        attach_stdlib_media,
        extract_frame_stats,
    )

    docs = _t(spark, sf_dir, "documents")
    media = attach_stdlib_media(docs, filled=True, gif=True)
    return extract_frame_stats(media, every_k=2, thumb=(8, 8))


def q_media_avi(spark, sf_dir):
    """FULL Motion-JPEG VIDEO decode with zero codec libraries
    (multimodal.py _avi_mjpeg_frames): synthesize real RIFF-AVI
    containers executor-side — doc_id % 3 + 1 constant-gray baseline-
    JPEG frames per video — then walk the chunk tree, Huffman-decode +
    IDCT every '00dc' frame, and report whole-video channel means.
    All-ones quantization keeps constant frames bit-exact, so the
    oracle is closed-form in (doc_id, frame) — the proof that the
    VIDEO modality rides the same entropy tier as images; inter-frame
    codecs (H.26x/VPx) stay honestly gated at the 'strh' handler."""
    from kevinlang_spark.operators.multimodal import (
        attach_stdlib_media,
        extract_pixel_stats,
    )

    docs = _t(spark, sf_dir, "documents")
    media = attach_stdlib_media(docs, filled=True, avi=True)
    return extract_pixel_stats(media)


def _messy_url(d):
    """Deterministic MESSY url per doc: uppercase scheme/www/host, a
    default :443 port on every 5th, trailing slashes on every 3rd, a
    tracking param, unsorted params, a fragment on every 6th — the
    canonicalization obstacles normalize_url exists to remove."""
    tld = (
        F.when(d % 4 == 0, ".com")
        .when(d % 4 == 1, ".co.uk")
        .when(d % 4 == 2, ".org")
        .otherwise(".com.au")
    )
    return F.concat(
        F.lit("HTTPS://WWW."),
        F.upper(F.col("source")),
        (d % 20).cast("string"),
        F.lit(".Example"),
        tld,
        F.when(d % 5 == 0, ":443").otherwise(""),
        F.lit("/Docs/"),
        (d % 7).cast("string"),
        F.when(d % 3 == 0, "/").otherwise(""),
        F.lit("?utm_source=feed&z=9&a="),
        (d % 2).cast("string"),
        F.when(d % 6 == 0, "#frag").otherwise(""),
    )


def q_url_normalize(spark, sf_dir):
    """URL canonicalization + registrable-domain extraction (web.py) —
    the first move of every CommonCrawl-style pipeline: two syntactic
    spellings of one resource must dedup identically.  Synthesizes a
    deterministic messy URL per document (uppercase host, www, default
    port, trailing slash, tracking param, unsorted query, fragment),
    normalizes it, and extracts the PSL-lite registrable domain —
    covering the two-level ccTLD suffixes (.co.uk/.com.au) where naive
    last-two-labels extraction is wrong.  Pure Catalyst string/array
    expressions; the oracle predicts the OUTPUT in closed form from
    doc_id rather than replaying the algorithm."""
    from kevinlang_spark.operators.web import normalize_url, registered_domain

    docs = _t(spark, sf_dir, "documents")
    url = _messy_url(F.col("doc_id"))
    return docs.select(
        "doc_id",
        normalize_url(url).alias("url_norm"),
        registered_domain(url).alias("domain"),
    )


def q_domain_cap(spark, sf_dir):
    """Per-domain frequency cap (web.py domain_cap, the FineWeb guard
    against crawl-heavy domains dominating a training mix): keep the 3
    lowest-doc_id documents per registrable domain, through the SALTED
    two-phase window (phase one caps (domain, salt) groups to a
    superset, phase two ranks the survivors) — at 100 TB the heavy
    shuffle spreads over salt_buckets keys instead of one partition per
    hot domain.  Result is identical to the plain window; the oracle is
    the plain ROW_NUMBER."""
    from kevinlang_spark.operators.web import domain_cap, registered_domain

    docs = _t(spark, sf_dir, "documents")
    host = F.concat(
        F.lit("cdn."),
        F.col("source"),
        (F.col("doc_id") % 20).cast("string"),
        F.lit(".com"),
    )
    with_dom = docs.select(
        "doc_id", registered_domain(host).alias("domain")
    )
    return domain_cap(with_dom, "domain", 3, "doc_id", salt_buckets=4)


#: warcinfo block + 404 body for the WARC fixture archives — module
#: constants so the oracle can embed their md5/length as literals
_WARCINFO = b"software: kevinlang-spark 1.0\r\nformat: WARC File Format 1.0\r\n"
_WARC_404 = b"<html><body>not found</body></html>"

#: the per-document page template, three spellings of the SAME bytes:
#: Python (fixture writer), Catalyst concat (q_html_extract), SQL concat
#: (oracles).  Pages link to doc id//2 and id*2 (a binary-tree link
#: graph with dangling forward edges — realistic in/out degree shape for
#: q_link_extract).  Visible text after html_text() is closed-form:
#: 'Doc {d} Home About Contact Doc {d} {text} prev rel Copyright 2026
#: Example Corp'
_PAGE_PARTS = (
    "<html><head><title>Doc ",
    "</title></head><body><nav>Home About Contact</nav><h1>Doc ",
    "</h1><p>",
    '</p><a href="http://example.com/doc/',
    '">prev</a> <a href="http://example.com/doc/',
    '">rel</a><script>var x=1;</script>'
    "<footer>Copyright 2026 Example Corp</footer></body></html>",
)


def _doc_page_html(d: int, t: str) -> str:
    p = _PAGE_PARTS
    return f"{p[0]}{d}{p[1]}{d}{p[2]}{t}{p[3]}{d // 2}{p[4]}{d * 2}{p[5]}"


def _doc_html_col():
    d = F.col("doc_id").cast("string")
    prev = F.expr("doc_id div 2").cast("string")
    rel = (F.col("doc_id") * 2).cast("string")
    p = _PAGE_PARTS
    return F.concat(
        F.lit(p[0]),
        d,
        F.lit(p[1]),
        d,
        F.lit(p[2]),
        F.col("text"),
        F.lit(p[3]),
        prev,
        F.lit(p[4]),
        rel,
        F.lit(p[5]),
    )


def _doc_html_sql() -> str:
    p = _PAGE_PARTS
    return (
        f"'{p[0]}' || doc_id || '{p[1]}' || doc_id || "
        f"'{p[2]}' || text || '{p[3]}' || (doc_id // 2) || "
        f"'{p[4]}' || (doc_id * 2) || '{p[5]}'"
    )


#: SQL spelling of web.html_text's regexp/replace chain (patterns are
#: RE2-compatible by design; 'g' = global, matching Spark's default)
_HTML_TEXT_SQL = (
    "trim(regexp_replace("
    "replace(replace(replace(replace(replace(replace("
    "regexp_replace(regexp_replace(regexp_replace(regexp_replace({col}, "
    "'(?s)<!--.*?-->', ' ', 'g'), "
    "'(?is)<script[^>]*>.*?</script>', ' ', 'g'), "
    "'(?is)<style[^>]*>.*?</style>', ' ', 'g'), "
    "'(?s)<[^>]*>', ' ', 'g'), "
    "'&lt;','<'),'&gt;','>'),'&quot;','\"'),'&#39;',chr(39)),"
    "'&nbsp;',' '),'&amp;','&'), "
    "'[ \t\r\n]+', ' ', 'g'))"
)

#: visible text of the fixture page, closed-form (no regex replay needed)
_PAGE_TEXT_SQL = (
    "'Doc ' || doc_id || ' Home About Contact Doc ' || doc_id || ' ' || "
    "text || ' prev rel Copyright 2026 Example Corp'"
)


def _warc_dir(spark, sf_dir):
    """Materialize (once per sf_dir per machine) a directory of REAL
    Common-Crawl-layout WARC archives for the web-archive queries: each
    archive holds a warcinfo record plus 20 response records (one per
    documents row, member-gzip framing), statuses/content-types mixed by
    id (404s at %10==7, text/plain at %10==3), plus one archive whose
    single gzip member is TRUNCATED (the quarantine row).  Content is
    closed-form in (doc_id, text), so the oracle predicts every record.
    The bounded collect is fixture synthesis, not query work — the
    QUERIES read the directory through the binaryFile source."""
    import gzip
    import os

    from kevinlang_spark.sources.warc import (
        make_http_response,
        make_warc,
        make_warc_record,
    )

    path = _artifact_path(sf_dir, "warc_dir", "kevinlang_spark/sources/warc.py")
    marker = os.path.join(path, "_SUCCESS")
    if os.path.exists(marker):
        return path
    os.makedirs(path, exist_ok=True)
    rows = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .collect()
    )
    groups: dict[int, list] = {}
    for r in rows:
        groups.setdefault(int(r["doc_id"]) // 20, []).append(
            (int(r["doc_id"]), r["text"])
        )
    for g, docs in groups.items():
        recs = [make_warc_record("warcinfo", _WARCINFO)]
        for d, t in docs:
            if d % 10 == 7:
                body, status, reason = _WARC_404, 404, "Not Found"
                ctype = "text/html; charset=utf-8"
            elif d % 10 == 3:
                body, status, reason = t.encode(), 200, "OK"
                ctype = "text/plain; charset=utf-8"
            else:
                body, status, reason = _doc_page_html(d, t).encode(), 200, "OK"
                ctype = "text/html; charset=utf-8"
            recs.append(
                make_warc_record(
                    "response",
                    # ids %20==9 travel with Transfer-Encoding: chunked
                    # framing and ids %20==19 with Content-Encoding:
                    # gzip (the as-sent forms crawls capture) — the
                    # reader must decode back to the IDENTICAL payload,
                    # so the oracle is unchanged while the driver gate
                    # proves dechunking AND content decoding end-to-end
                    make_http_response(
                        body,
                        status,
                        reason,
                        ctype,
                        chunked=(d % 20 == 9),
                        gzip_body=(d % 20 == 19),
                    ),
                    uri=f"http://example.com/doc/{d}",
                )
            )
        with open(os.path.join(path, f"{g:05d}.warc.gz"), "wb") as fh:
            fh.write(make_warc(recs))
    member = gzip.compress(make_warc_record("warcinfo", _WARCINFO), mtime=0)
    with open(os.path.join(path, "corrupt.warc.gz"), "wb") as fh:
        fh.write(member[:-8])  # no CRC/ISIZE trailer: truncated member
    with open(marker, "w"):
        pass
    return path


def q_warc_ingest(spark, sf_dir):
    """Web-archive ingestion END-TO-END through the WARC source
    (sources/warc.py read_warc): a directory of Common-Crawl-layout
    archives (member-gzip records, HTTP response envelopes, a corrupt
    member) becomes the flat record table — file listing and byte reads
    JVM-side via binaryFile, record split in one Arrow-batched
    mapInPandas, one 'invalid' quarantine row for the truncated archive,
    never a dead task.  The oracle predicts every record (uri, status,
    content-type, body length and md5) closed-form from the documents
    ids the fixture encodes."""
    from kevinlang_spark.sources.warc import read_warc

    bronze = read_warc(spark, _warc_dir(spark, sf_dir))
    return bronze.select(
        "warc_file",
        "rec_idx",
        "warc_type",
        "target_uri",
        "http_status",
        "content_type",
        "payload_len",
        F.md5("payload").alias("payload_md5"),
    )


def _warc_ingest_oracle_sql() -> str:
    import hashlib

    nf = _WARC_404.decode()
    return (
        "WITH resp AS (SELECT "
        "printf('%05d.warc.gz', doc_id // 20) AS warc_file, "
        "CAST(doc_id % 20 + 1 AS INTEGER) AS rec_idx, "
        "'response' AS warc_type, "
        "'http://example.com/doc/' || doc_id AS target_uri, "
        "CAST(CASE WHEN doc_id % 10 = 7 THEN 404 ELSE 200 END AS INTEGER) "
        "AS http_status, "
        "CASE WHEN doc_id % 10 = 3 THEN 'text/plain; charset=utf-8' "
        "ELSE 'text/html; charset=utf-8' END AS content_type, "
        f"CASE WHEN doc_id % 10 = 7 THEN '{nf}' "
        "WHEN doc_id % 10 = 3 THEN text "
        f"ELSE {_doc_html_sql()} END AS body FROM documents), "
        "files AS (SELECT DISTINCT warc_file FROM resp) "
        "SELECT warc_file, rec_idx, warc_type, target_uri, http_status, "
        "content_type, CAST(length(body) AS BIGINT) AS payload_len, "
        "md5(body) AS payload_md5 FROM resp "
        "UNION ALL SELECT warc_file, 0, 'warcinfo', NULL, NULL, "
        f"'application/warc-fields', {len(_WARCINFO)}, "
        f"'{hashlib.md5(_WARCINFO).hexdigest()}' FROM files "
        "UNION ALL SELECT 'corrupt.warc.gz', 0, 'invalid', "
        "NULL, NULL, NULL, NULL, NULL"
    )


def q_html_extract(spark, sf_dir):
    """HTML → visible-text extraction + markup-shape stats (web.py
    html_text/html_stats, the step between WARC ingestion and the
    text-quality tier): each document renders through the deterministic
    page template, the zero-shuffle Catalyst regex chain strips it back,
    and roundtrip_ok asserts the recovered text equals the closed-form
    expectation.  The built page and its extracted text materialize as
    projection attributes referenced ≥2 times (the winnow rule), so the
    regex chain runs ONCE per row.  The oracle replays the same
    RE2-compatible chain in DuckDB."""
    from kevinlang_spark.operators.util import spread
    from kevinlang_spark.operators.web import html_stats, html_text

    # single-file parquet reads as ONE partition; the regex chain is the
    # expensive part, so spread it across all cores first
    docs = spread(_t(spark, sf_dir, "documents"))
    pages = docs.select("doc_id", "text", _doc_html_col().alias("__html"))
    h = F.col("__html")
    staged = pages.select(
        "doc_id", "text", "__html", html_text(h).alias("__text")
    )
    stats = html_stats(h, text=F.col("__text"))
    recovered = F.concat(
        F.lit("Doc "),
        F.col("doc_id").cast("string"),
        F.lit(" Home About Contact Doc "),
        F.col("doc_id").cast("string"),
        F.lit(" "),
        F.col("text"),
        F.lit(" prev rel Copyright 2026 Example Corp"),
    )
    return staged.select(
        "doc_id",
        stats["title"].alias("title"),
        stats["n_tags"].alias("n_tags"),
        stats["n_links"].alias("n_links"),
        stats["text_chars"].alias("text_chars"),
        stats["html_chars"].alias("html_chars"),
        stats["text_ratio"].alias("text_ratio"),
        (F.col("__text") == recovered).alias("roundtrip_ok"),
    )


def _html_extract_oracle_sql() -> str:
    chain = _HTML_TEXT_SQL.format(col="html")
    return (
        "WITH pages AS MATERIALIZED (SELECT doc_id, text, "
        f"{_doc_html_sql()} AS html FROM documents), "
        "ext AS MATERIALIZED (SELECT doc_id, text, html, "
        f"{chain} AS vtext FROM pages) "
        "SELECT doc_id, "
        "regexp_extract(html, '(?is)<title[^>]*>(.*?)</title>', 1) AS title, "
        "CAST(length(regexp_extract_all(html, '<[A-Za-z!/]')) AS INTEGER) "
        "AS n_tags, "
        "CAST(length(regexp_extract_all(html, '(?i)<a[ >]')) AS INTEGER) "
        "AS n_links, "
        "CAST(length(vtext) AS INTEGER) AS text_chars, "
        "CAST(length(html) AS INTEGER) AS html_chars, "
        "round(length(vtext) / greatest(length(html), 1), 6) AS text_ratio, "
        f"vtext = ({_PAGE_TEXT_SQL}) AS roundtrip_ok FROM ext"
    )


def _crawl_pages(spark, sf_dir):
    """The kept-page gate shared by every crawl query (q_warc_pipeline,
    q_link_extract, q_crawl_pagerank): WARC records → HTTP 200 +
    text/html responses.  ONE place, so a gate change (e.g. charset
    handling) can never silently diverge between the queries."""
    from kevinlang_spark.sources.warc import read_warc

    bronze = read_warc(spark, _warc_dir(spark, sf_dir))
    return bronze.where(
        (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
        & F.col("content_type").startswith("text/html")
    )


def _crawl_edges(spark, sf_dir):
    """(src, dst) link edges of the kept pages — anchor hrefs via
    web.html_links, ids parsed from the fixture's /doc/{id} URLs."""
    from kevinlang_spark.operators.web import html_links

    return (
        _crawl_pages(spark, sf_dir)
        .select(
            F.regexp_extract("target_uri", r"([0-9]+)$", 1)
            .cast("bigint")
            .alias("src"),
            F.explode(
                html_links(F.col("payload").cast("string"))
            ).alias("href"),
        )
        .select(
            "src",
            F.regexp_extract("href", r"([0-9]+)$", 1)
            .cast("bigint")
            .alias("dst"),
        )
    )


def q_warc_pipeline(spark, sf_dir):
    """The raw-crawl curation path END-TO-END: WARC archives → record
    split (sources/warc.py) → HTTP 200 + text/html gate → html_text
    strip (web.py) → per-page token statistics and a min-length keep
    verdict — the C4/RefinedWeb front half as ONE declarative plan.
    Every stage is scan-shaped (the only exchange is none — filters and
    regex chains pipeline inside the mapInPandas output partitions);
    the oracle predicts each kept page's text and token count
    closed-form from the fixture template."""
    from kevinlang_spark.operators.web import html_text

    staged = _crawl_pages(spark, sf_dir).select(
        F.regexp_extract("target_uri", r"([0-9]+)$", 1)
        .cast("bigint")
        .alias("doc_id"),
        F.col("payload_len").alias("html_bytes"),
        html_text(F.col("payload").cast("string")).alias("__text"),
    )
    toks = F.split(F.col("__text"), " ")
    return staged.select(
        "doc_id",
        "html_bytes",
        F.length("__text").alias("text_chars"),
        F.size(toks).alias("n_tokens"),
        (F.size(toks) >= 30).alias("keep"),
    )


def _warc_pipeline_oracle_sql() -> str:
    return (
        "WITH pages AS (SELECT doc_id, "
        f"{_PAGE_TEXT_SQL} AS vtext, "
        f"length({_doc_html_sql()}) AS html_bytes FROM documents "
        "WHERE doc_id % 10 NOT IN (3, 7)), "
        "toked AS (SELECT doc_id, html_bytes, vtext, "
        "length(string_split(vtext, ' ')) AS n_tokens FROM pages) "
        "SELECT doc_id, CAST(html_bytes AS BIGINT) AS html_bytes, "
        "CAST(length(vtext) AS INTEGER) AS text_chars, "
        "CAST(n_tokens AS INTEGER) AS n_tokens, "
        "n_tokens >= 30 AS keep FROM toked"
    )


def q_stream_warc(spark, sf_dir):
    """STREAMING crawl ingestion: the WARC fixture directory consumed
    as a binaryFile file-source stream (sources/warc.py stream_warc —
    the continuous-crawl shape: new archives land, each micro-batch
    splits only the new files, the checkpoint guarantees exactly-once),
    drained with availableNow into a complete-mode per-(type, status,
    content-type) census.  The oracle is the BATCH record table
    aggregated — streaming must converge to exactly the batch answer."""
    from kevinlang_spark.sources.warc import stream_warc

    recs = stream_warc(spark, _warc_dir(spark, sf_dir))
    out = recs.groupBy("warc_type", "http_status", "content_type").agg(
        F.count("*").alias("n_records"),
        F.sum("payload_len").alias("total_bytes"),
    )
    q = (
        out.writeStream.format("memory")
        .queryName("q_stream_warc_mem")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    # awaitTermination returns False on timeout — a partial snapshot
    # plus a still-active query (the next .start() with this name would
    # throw); stop and fail loudly instead of returning partial rows
    if not q.awaitTermination(120):
        q.stop()
        raise RuntimeError("q_stream_warc: drain did not finish in 120s")
    return spark.table("q_stream_warc_mem")


def _stream_warc_oracle_sql() -> str:
    return (
        f"WITH rec AS ({_warc_ingest_oracle_sql()}) "
        "SELECT warc_type, http_status, content_type, "
        "count(*) AS n_records, "
        "CAST(sum(payload_len) AS BIGINT) AS total_bytes "
        "FROM rec GROUP BY warc_type, http_status, content_type"
    )


def q_robots_filter(spark, sf_dir):
    """robots.txt compliance end-to-end (web.py parse_robots_df +
    robots_allowed): seven synthetic domains each publish a robots body
    (User-agent groups, comments, a per-domain Allow carve-out under a
    Disallow), the bodies parse DISTRIBUTED (posexplode + last()-over-
    position window per domain — no global order), and every document
    URL gets the RFC 9309 longest-match verdict via a broadcast rules
    join + one keyed integer max (2·len + is_allow encodes the
    lexicographic (length, allow) order).  RFC 9309 §2.2.3 wildcards
    are exercised end-to-end: every domain carries 'Disallow: /*.tmp$'
    (star + end-anchor) and a LONGER wildcard carve-out 'Allow:
    /blog/keep*.tmp$'; blog paths route three ways — draft*.tmp
    (wildcard-disallowed), keep*.tmp (wildcard-allow wins on literal-
    prefix length), and *.tmpx (the $ anchor fails → allowed).  The
    oracle predicts every verdict closed-form from the id routing."""
    from kevinlang_spark.operators.web import parse_robots_df, robots_allowed

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    g = F.col("doc_id") % 7
    gs = g.cast("string")
    domain = F.concat(F.lit("site"), gs, F.lit(".com"))
    path = (
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit("/private/x"), F.col("doc_id").cast("string")),
        )
        .when(
            F.col("doc_id") % 5 == 1,
            F.concat(F.lit("/private/g"), gs, F.lit("/page")),
        )
        .when(F.col("doc_id") % 5 == 2, F.concat(F.lit("/cat"), gs, F.lit("/a")))
        .when(
            (F.col("doc_id") % 5 == 3) & (F.col("doc_id") % 3 == 0),
            F.concat(
                F.lit("/blog/draft"), F.col("doc_id").cast("string"),
                F.lit(".tmp"),
            ),
        )
        .when(
            (F.col("doc_id") % 5 == 3) & (F.col("doc_id") % 3 == 1),
            F.concat(
                F.lit("/blog/keep"), F.col("doc_id").cast("string"),
                F.lit(".tmp"),
            ),
        )
        .when(
            F.col("doc_id") % 5 == 3,
            F.concat(
                F.lit("/blog/"), F.col("doc_id").cast("string"),
                F.lit(".tmpx"),
            ),
        )
        .otherwise(
            # the allow carve-out of a DIFFERENT domain: only the
            # /private disallow matches here
            F.concat(F.lit("/private/g"), ((g + 1) % 7).cast("string"), F.lit("/q"))
        )
    )
    urls = docs.select("doc_id", domain.alias("domain"), path.alias("path"))
    sites = spark.range(7).select(
        F.concat(F.lit("site"), F.col("id").cast("string"), F.lit(".com")).alias(
            "domain"
        ),
        F.concat(
            F.lit("# policy\nUser-agent: SpecialBot\nDisallow: /\n\n"),
            F.lit("User-agent: *\nDisallow: /private\nAllow: /private/g"),
            F.col("id").cast("string"),
            F.lit("\nDisallow: /cat"),
            F.col("id").cast("string"),
            F.lit("  # per-domain category block\n"),
            F.lit("Disallow: /*.tmp$\nAllow: /blog/keep*.tmp$\n"),
        ).alias("robots_txt"),
    )
    rules = parse_robots_df(sites)
    return robots_allowed(urls, rules)


_ROBOTS_FILTER_ORACLE_SQL = (
    # verdicts are closed-form in the id routing: %5 in (0,2,4) hit a
    # disallow (with no longer allow), %5==1 hits the domain's own
    # allow carve-out (longer than /private); %5==3 splits on %3 —
    # draft*.tmp hits the 'Disallow: /*.tmp$' wildcard, keep*.tmp is
    # rescued by the longer-literal-prefix 'Allow: /blog/keep*.tmp$',
    # and *.tmpx escapes the $ end-anchor entirely
    "SELECT doc_id, "
    "'site' || (doc_id % 7) || '.com' AS domain, "
    "CASE WHEN doc_id % 5 = 0 THEN '/private/x' || doc_id "
    "WHEN doc_id % 5 = 1 THEN '/private/g' || (doc_id % 7) || '/page' "
    "WHEN doc_id % 5 = 2 THEN '/cat' || (doc_id % 7) || '/a' "
    "WHEN doc_id % 5 = 3 AND doc_id % 3 = 0 "
    "THEN '/blog/draft' || doc_id || '.tmp' "
    "WHEN doc_id % 5 = 3 AND doc_id % 3 = 1 "
    "THEN '/blog/keep' || doc_id || '.tmp' "
    "WHEN doc_id % 5 = 3 THEN '/blog/' || doc_id || '.tmpx' "
    "ELSE '/private/g' || ((doc_id + 1) % 7) || '/q' END AS path, "
    "(doc_id % 5 = 1 OR (doc_id % 5 = 3 AND doc_id % 3 <> 0)) "
    "AS allowed FROM documents"
)


def q_mime_sniff(spark, sf_dir):
    """Magic-byte container audit (sources/binary.py sniff_media_type,
    the 'never trust a filename' verify): five REAL container families
    synthesized executor-side (BMP / deflated PNG / animated-GIF LZW /
    PCM WAV / rice-coded FLAC by id rule), sniffed from their first
    bytes in a pure Catalyst expression — zero Python, zero shuffle.
    The oracle predicts every verdict closed-form from the id routing;
    the html/xml/gzip/pdf/zip branches are pytest-covered."""
    from kevinlang_spark.operators.multimodal import attach_stdlib_media
    from kevinlang_spark.sources.binary import sniff_media_type

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    a = attach_stdlib_media(
        docs.where(F.col("doc_id") % 3 != 0), filled=True, png=True
    )
    b = attach_stdlib_media(
        docs.where(F.col("doc_id") % 3 == 0), filled=True, gif=True, flac=True
    )
    media = a.unionByName(b)
    return media.select(
        "doc_id",
        "media_type",
        sniff_media_type(F.col("payload")).alias("sniffed"),
    )


_MIME_SNIFF_ORACLE_SQL = (
    "SELECT doc_id, "
    "CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS media_type, "
    "CASE WHEN doc_id % 3 = 0 THEN "
    "(CASE WHEN doc_id % 2 = 0 THEN 'gif' ELSE 'flac' END) "
    "WHEN doc_id % 2 = 1 THEN 'wav' "
    "WHEN doc_id % 4 = 2 THEN 'png' ELSE 'bmp' END AS sniffed "
    "FROM documents"
)


def q_crawl_pagerank(spark, sf_dir):
    """PageRank over the link graph EXTRACTED from the crawl: WARC →
    html_links edges → the same 10-iteration damped/dangling-mass
    pagerank the graph suite runs (graph.py pagerank: pre-partitioned
    loop-invariant edges, checkpoint cadence, one shuffle pair per
    round) — the WebGraph workload end-to-end from raw archives.
    Forward links (id*2) past the corpus edge are dangling nodes whose
    mass redistributes uniformly, exactly as real crawl frontiers
    behave.  The oracle is the q_pagerank unroll over the closed-form
    link edges."""
    from kevinlang_spark.operators.graph import pagerank

    pr = pagerank(_crawl_edges(spark, sf_dir), damping=0.85, iterations=10)
    return pr.select("node", F.round("rank", 8).alias("rank"))


_CRAWL_EDGES_SQL = (
    "SELECT DISTINCT src, dst FROM ("
    "SELECT doc_id AS src, doc_id // 2 AS dst FROM documents "
    "WHERE doc_id % 10 NOT IN (3, 7) "
    "UNION ALL SELECT doc_id, doc_id * 2 FROM documents "
    "WHERE doc_id % 10 NOT IN (3, 7))"
)


def q_link_extract(spark, sf_dir):
    """Crawl → link graph: anchor hrefs of every kept page (web.py
    html_links over the WARC payloads) become (src, dst) edges, then one
    keyed count aggregates per-target in-degree — the edge-extraction
    front of PageRank/HITS over a crawl.  Scan-shaped until the single
    in-degree shuffle (map-side combine); the fixture's id//2, id*2
    template links make every degree closed-form (tree parents
    accumulate their children plus the halved forward edges; dangling
    targets beyond the corpus stay in the count, as real crawls do)."""
    return _crawl_edges(spark, sf_dir).groupBy("dst").agg(
        F.count("*").alias("n_inlinks"), F.min("src").alias("min_src")
    )


def _link_extract_oracle_sql() -> str:
    return (
        "WITH src AS (SELECT doc_id AS s FROM documents "
        "WHERE doc_id % 10 NOT IN (3, 7)), "
        "edges AS (SELECT s, s // 2 AS dst FROM src "
        "UNION ALL SELECT s, s * 2 AS dst FROM src) "
        "SELECT dst, count(*) AS n_inlinks, min(s) AS min_src "
        "FROM edges GROUP BY dst"
    )


#: hyperparameters of the trained-classifier queries (shared by the
#: Spark side and the oracle unroll)
_LR_DIM, _LR_N, _LR_STEPS, _LR_RATE = 64, 3, 6, 2.0


#: in-process memo of the trained model per sf_dir — training is
#: DETERMINISTIC (bit-identical retrains, test_lr_classifier), so
#: q_lr_score / q_lr_eval reuse the TRAIN query's weights instead of
#: paying the 6-step GD again: the build-once/apply-many production
#: shape (the persisted-ANN-index argument).  q_lr_train itself NEVER
#: reads the memo (VERDICT r12 item 1): the train query retrains on
#: every call, so its bench time measures a cold 6-step GD, not a memo
#: hit.  Process-lifetime only, so code changes can never serve a
#: stale model.
_LR_MEMO: dict = {}


def _lr_pieces(spark, sf_dir, need_feat: bool = True, retrain: bool = False):
    """Shared train path of q_lr_train / q_lr_score / q_lr_eval:
    hashed-trigram design matrix (label = the distillation target 'text
    mentions spark'), checkpointed once, then 6 batch-GD steps.
    ``retrain=True`` (q_lr_train) always pays the full GD and refreshes
    the memo the apply-side queries read; ``need_feat=False`` (again
    q_lr_train, whose output is the weights alone) skips returning the
    matrix the caller never reads."""
    from kevinlang_spark.operators.text import lr_gram_features, lr_train
    from kevinlang_spark.operators.util import spread

    def build_feat():
        docs = spread(_t(spark, sf_dir, "documents"))
        # pre-partition the design matrix on the per-document key the
        # trainer/scorer aggregate and join by (r13, guide §2.4): the
        # per-step (id, y) logit agg and the probs⋈feat join then run
        # exchange-free off the checkpoint — only the dim+1-row slot
        # agg still shuffles (map-side combined)
        return docs, lr_gram_features(
            docs, F.col("text").contains("spark"), dim=_LR_DIM, n=_LR_N
        ).repartition(F.col("id")).localCheckpoint(eager=True)

    feat = None
    if retrain or sf_dir not in _LR_MEMO:
        docs, feat = build_feat()
        _LR_MEMO[sf_dir] = lr_train(
            feat,
            docs.count(),
            dim=_LR_DIM,
            steps=_LR_STEPS,
            lr=_LR_RATE,
            checkpoint=False,
        )
    elif need_feat:
        _, feat = build_feat()
    model, mu, sd = _LR_MEMO[sf_dir]
    return feat, model, mu, sd


def q_lr_train(spark, sf_dir):
    """TRAINED model-based quality classifier (text.py lr_train):
    distributed batch-gradient-descent logistic regression over hashed
    char-trigram features with per-slot z-score standardization folded
    in sparsely — the step q_quality_score stubs with seeded weights.
    The label distills a text rule ('mentions spark') into the cheap
    scorer, the standard fastText-filter training shape (wiki-vs-crawl).
    Each GD step is two keyed aggregations (per-doc logit, per-slot
    residual moment) + a dim+1-row collect; the driver holds the model.
    Reaches 0.908 train accuracy vs the 0.77 majority baseline at
    sf0.01.  Output is the final weight vector; the oracle replays the
    whole trajectory as an unrolled MATERIALIZED CTE chain.  Retrains
    on EVERY call (``retrain=True`` — VERDICT r12 item 1): the bench
    number is always a cold 6-step GD, never a memo hit; only the
    apply-side q_lr_score / q_lr_eval reuse the refreshed memo (the
    build-once/apply-many shape)."""
    _, model, _, _ = _lr_pieces(spark, sf_dir, need_feat=False, retrain=True)
    return spark.createDataFrame(
        [(j, model[j]) for j in range(_LR_DIM + 1)], "slot int, weight double"
    )


def q_lr_score(spark, sf_dir):
    """Train-then-apply end-to-end: the q_lr_train model scored back
    over the corpus (text.py lr_score) — per-document rounded
    probability, thresholded prediction, and the distilled label for
    audit.  Scoring reuses the checkpointed design matrix, one keyed
    aggregation."""
    from kevinlang_spark.operators.text import lr_score

    feat, model, mu, sd = _lr_pieces(spark, sf_dir)
    return lr_score(feat, model, mu, sd).select(
        F.col("id").alias("doc_id"), "label", "prob", "pred"
    )


def q_lr_eval(spark, sf_dir):
    """Evaluation leg of the trained classifier (text.py
    classifier_eval): confusion counts, accuracy/precision/recall/F1 at
    the 0.5 threshold, and rank-sum ROC AUC with average ranks for the
    tied (rounded) probabilities — train → apply → EVALUATE closed as
    one audited loop.  AUC's cumulative window runs over the bounded
    distinct-probability grid (the equidepth pattern), and rank sums
    are exact dyadic doubles, so no rounding step is needed anywhere."""
    from kevinlang_spark.operators.text import classifier_eval, lr_score

    feat, model, mu, sd = _lr_pieces(spark, sf_dir)
    return classifier_eval(lr_score(feat, model, mu, sd))


def _lr_eval_oracle_sql() -> str:
    """The q_lr_score unroll aggregated: confusion counts + average-rank
    Mann–Whitney AUC over the final probability column."""
    score_sql = _lr_oracle_sql(score=True)
    body = score_sql[: score_sql.rindex(" SELECT ")]
    steps = _LR_STEPS
    return (
        f"{body}, scored AS MATERIALIZED (SELECT y, p, "
        f"CASE WHEN p >= 0.5 THEN 1 ELSE 0 END AS pr FROM p{steps}), "
        "conf AS MATERIALIZED (SELECT count(*) AS n_docs, "
        "CAST(sum(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos, "
        "CAST(sum(CASE WHEN pr = 1 AND y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS tp, "
        "CAST(sum(CASE WHEN pr = 1 AND y = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS fp, "
        "CAST(sum(CASE WHEN pr = 0 AND y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS fn, "
        "CAST(sum(CASE WHEN pr = 0 AND y = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS tn "
        "FROM scored), "
        "byp AS (SELECT p, count(*) AS n, "
        "sum(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS npos FROM scored "
        "GROUP BY p), "
        "rkrow AS (SELECT npos * (CAST(COALESCE(sum(n) OVER "
        "(ORDER BY p ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
        "AS DOUBLE) + (n + 1) / 2.0) AS rs FROM byp), "
        "rk AS (SELECT sum(rs) AS rank_sum FROM rkrow) "
        "SELECT n_docs, n_pos, tp, fp, fn, tn, "
        "(tp + tn) / n_docs AS acc, "
        "CASE WHEN tp + fp > 0 THEN tp / (tp + fp) END AS prec, "
        "CASE WHEN tp + fn > 0 THEN tp / (tp + fn) END AS rec, "
        "CASE WHEN (CASE WHEN tp + fp > 0 THEN tp / (tp + fp) END) + "
        "(CASE WHEN tp + fn > 0 THEN tp / (tp + fn) END) > 0 THEN "
        "2.0 * (CASE WHEN tp + fp > 0 THEN tp / (tp + fp) END) * "
        "(CASE WHEN tp + fn > 0 THEN tp / (tp + fn) END) / "
        "((CASE WHEN tp + fp > 0 THEN tp / (tp + fp) END) + "
        "(CASE WHEN tp + fn > 0 THEN tp / (tp + fn) END)) END AS f1, "
        "CASE WHEN n_pos > 0 AND n_docs - n_pos > 0 THEN "
        "(rank_sum - CAST(n_pos AS DOUBLE) * (CAST(n_pos AS DOUBLE) + 1) "
        "/ 2.0) / (CAST(n_pos AS DOUBLE) * "
        "CAST(n_docs - n_pos AS DOUBLE)) END AS auc "
        "FROM conf, rk"
    )


def _lr_oracle_sql(score: bool) -> str:
    """Unrolled replay of the GD trajectory: feat → stats → per step
    (effective weights v, rounded sigmoid p, residual moment s, updated
    w).  Every CTE is MATERIALIZED (multiply referenced); float ops
    mirror the driver's exact sequence, and every sum that crosses row
    order (logits, moments, the K constant) feeds a 6-dp round before
    reuse."""
    dim, n, steps, lr = _LR_DIM, _LR_N, _LR_STEPS, _LR_RATE
    parts = [
        "WITH base AS MATERIALIZED (SELECT doc_id AS id, "
        "CASE WHEN contains(text, 'spark') THEN 1.0 ELSE 0.0 END AS y, "
        "lower(text) AS t FROM documents), "
        "nn AS (SELECT count(*) AS n FROM base), "
        "feat AS MATERIALIZED ("
        "SELECT id, y, 0 AS slot, 1.0 AS x FROM base "
        "UNION ALL "
        "SELECT id, any_value(y) AS y, slot, "
        "CAST(count(*) AS DOUBLE) / any_value(ng) AS x FROM ("
        f"SELECT id, y, length(t) - {n - 1} AS ng, "
        f"CAST(CAST(CONCAT('0x', substr(md5(substr(t, CAST(i AS INT), {n}) "
        f"|| '#lr'), 1, 13)) AS BIGINT) % {dim} + 1 AS INT) AS slot "
        f"FROM base, UNNEST(range(1, greatest(length(t) - {n - 2}, 1))) AS u(i) "
        f"WHERE length(t) >= {n}) GROUP BY id, slot), "
        "stats AS MATERIALIZED (SELECT slot, round(sx / n, 6) AS mu, "
        "CASE WHEN round(sqrt(greatest(sxx / n - round(sx / n, 6) * "
        "round(sx / n, 6), 0)), 6) > 0 THEN "
        "round(sqrt(greatest(sxx / n - round(sx / n, 6) * "
        "round(sx / n, 6), 0)), 6) ELSE 1.0 END AS sd "
        "FROM (SELECT slot, sum(x) AS sx, sum(x * x) AS sxx FROM feat "
        "WHERE slot > 0 GROUP BY slot), nn), "
        f"w0 AS MATERIALIZED (SELECT CAST(s AS INT) AS slot, 0.0 AS w "
        f"FROM range(0, {dim + 1}) r(s))"
    ]
    for k in range(steps + (1 if score else 0)):
        parts.append(
            f", v{k} AS MATERIALIZED ("
            f"SELECT 0 AS slot, (SELECT w FROM w{k} WHERE slot = 0) - "
            f"COALESCE((SELECT sum(s.mu / s.sd * w.w) FROM stats s "
            f"JOIN w{k} w ON s.slot = w.slot), 0) AS v "
            f"UNION ALL SELECT w.slot, w.w / COALESCE(s.sd, 1.0) AS v "
            f"FROM w{k} w LEFT JOIN stats s ON s.slot = w.slot "
            f"WHERE w.slot > 0), "
            f"p{k} AS MATERIALIZED (SELECT f.id, any_value(f.y) AS y, "
            f"round(1 / (1 + exp(-(sum(f.x * v.v)))), 6) AS p "
            f"FROM feat f JOIN v{k} v USING (slot) GROUP BY f.id)"
        )
        if k == steps:
            break  # scoring pass: no further update
        parts.append(
            f", s{k} AS MATERIALIZED (SELECT f.slot, "
            f"sum((p.p - p.y) * f.x) / (SELECT n FROM nn) AS s "
            f"FROM feat f JOIN p{k} p ON f.id = p.id GROUP BY f.slot), "
            f"w{k + 1} AS MATERIALIZED (SELECT w.slot, "
            f"CASE WHEN w.slot = 0 THEN round(w.w - {lr} * "
            f"COALESCE((SELECT s FROM s{k} WHERE slot = 0), 0), 6) "
            f"ELSE round(w.w - {lr} * ((COALESCE(sk.s, 0) - "
            f"COALESCE(st.mu, 0) * "
            f"COALESCE((SELECT s FROM s{k} WHERE slot = 0), 0)) / "
            f"COALESCE(st.sd, 1.0)), 6) END AS w "
            f"FROM w{k} w LEFT JOIN s{k} sk ON w.slot = sk.slot "
            f"LEFT JOIN stats st ON w.slot = st.slot)"
        )
    if score:
        parts.append(
            f" SELECT id AS doc_id, y = 1.0 AS label, p AS prob, "
            f"p >= 0.5 AS pred FROM p{steps}"
        )
    else:
        parts.append(
            f" SELECT slot, w AS weight FROM w{steps} ORDER BY slot"
        )
    return "".join(parts)


def q_gopher_rules(spark, sf_dir):
    """Gopher quality-rule battery (text.py gopher_rules; Rae et al.
    2021 A1.1) over the documents table: per-document word/line
    statistics, one boolean per rule, and the conjunction — the
    auditable form of the filter every MassiveText descendant applies
    before training.  One scan of pure higher-order expressions, no
    shuffle; the oracle replays the same whitespace/line statistics in
    DuckDB list functions."""
    from kevinlang_spark.operators.text import gopher_rules

    docs = _t(spark, sf_dir, "documents")
    return gopher_rules(docs, min_words=20, max_words=100_000)


def q_quality_score(spark, sf_dir):
    """Model-based quality scoring (text.py fasttext_quality_score) —
    the fastText-style wiki-vs-crawl filter every CCNet descendant
    runs where the Gopher rule battery (q_gopher_rules) is heuristic:
    hashed char-trigram features (md5-slot, no vocabulary), a
    64-weight seeded linear model applied as literal lookups, a
    sequential fold to the mean logit, and a sigmoid score.  The whole
    scorer is scan-stage higher-order expressions — zero shuffles,
    zero Python — so it costs one pass over text at 100 TB exactly
    like the heuristic battery it complements.  The oracle replays the
    hash, the literal weights, and the same left-to-right fold."""
    from kevinlang_spark.operators.text import fasttext_quality_score

    return fasttext_quality_score(
        _t(spark, sf_dir, "documents"), dim=64, n=3, seed=13, bias=-0.05
    )


def _quality_score_oracle_sql(
    dim: int = 64, seed: int = 13, bias: float = -0.05
) -> str:
    """Closed-form DuckDB replay of q_quality_score (n=3): the same
    seeded weights as literals, the same md5-prefix slot hash, and the
    same sequential fold (list_sum ≡ F.aggregate, left-to-right)."""
    from kevinlang_spark.operators.text import fasttext_weights

    wlit = ", ".join(repr(x) for x in fasttext_weights(dim, seed))
    b = repr(float(bias))
    logit = f"CASE WHEN ng > 0 THEN {b} + tot / ng ELSE {b} END"
    return (
        "WITH base AS (SELECT doc_id, lower(text) AS t FROM documents), "
        "g AS (SELECT doc_id, CASE WHEN t IS NULL OR length(t) < 3 "
        "THEN CAST([] AS VARCHAR[]) "
        "ELSE list_transform(range(1, length(t) - 1), i -> substr(t, i, 3)) "
        "END AS grams FROM base), "
        f"s AS (SELECT doc_id, len(grams) AS ng, "
        f"list_sum(list_transform(grams, x -> ([{wlit}])["
        "CAST(CAST(CONCAT('0x', substr(md5(x || '#qs'), 1, 13)) AS BIGINT) "
        f"% {dim} + 1 AS INT)])) AS tot FROM g) "
        f"SELECT doc_id, CAST(ng AS INT) AS n_grams, {logit} AS logit, "
        # ROUND(…,6): JVM exp and libm exp differ in the last ULP on ~2%
        # of inputs; sigmoids are transcendental so the half-way-boundary
        # rounding trap cannot occur
        f"ROUND(1.0 / (1.0 + exp(-({logit}))), 6) AS score, "
        f"({logit}) >= 0 AS keep FROM s"
    )


_PHASH_GROUPS = 25
_M64 = (1 << 64) - 1


def _phash_group_base(g: int) -> int:
    """Deterministic 63-bit base fingerprint for image-dedup group
    ``g`` — the splitmix64 finalizer on (g+1), top 63 bits.  Pure
    integer arithmetic shared by the Spark-side image synthesis and the
    oracle's embedded literals (the seeded-constants-via-repr rule)."""
    x = ((g + 1) * 0x9E3779B97F4A7C15) & _M64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _M64
    return (x ^ (x >> 31)) >> 1  # 63 bits; bit 63 stays 0 (sign-safe)


def _phash_fingerprint(doc_id: int) -> int:
    """The dHash every synthetic image is CONSTRUCTED to carry: group
    base pattern, with every third group member (p % 3 == 1) flipping
    one group-and-position-dependent bit — so intra-group Hamming is
    0/1/2 (near-dups) and inter-group is ~31 (unrelated)."""
    i = doc_id // 5
    g = i % _PHASH_GROUPS
    p = i // _PHASH_GROUPS
    fp = _phash_group_base(g)
    if p % 3 == 1:
        fp ^= 1 << ((g + p) % 63)
    return fp


def _gradient_pixels(fp: int):
    """9×8 RGB array whose dHash is exactly ``fp``: per-row pixel walk,
    ±15 around 128 (bit set ⟺ gray decreases left→right).  Shared by
    the Spark-side synthesis and the Python reference the pHash oracle
    literals come from."""
    import numpy as np

    px = np.zeros((8, 9, 3), np.uint8)
    for r in range(8):
        v = 128
        px[r, 0, :] = v
        for c in range(8):
            # dHash bit (r*8+c) = gray[r][c] > gray[r][c+1]
            v = v - 15 if (fp >> (r * 8 + c)) & 1 else v + 15
            px[r, c + 1, :] = v
    return px


def _phash_media(docs):
    """(doc_id, media_type, payload) of REAL 9×8 BMPs encoding each
    doc's deterministic fingerprint — the synthesis leg shared by the
    image-dedup queries (Arrow-batched, payloads never touch the
    driver)."""

    def gen(it):
        import pandas as pd

        from kevinlang_spark.operators.multimodal import make_bmp

        for pdf in it:
            payloads = [
                make_bmp(9, 8, pixels=_gradient_pixels(_phash_fingerprint(int(d))))
                for d in pdf["doc_id"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": "image",
                    "payload": payloads,
                }
            )

    # single-file parquet reads as ONE partition locally; the per-row
    # encode/decode must spread across cores (real corpora have many
    # files, so this is a no-op at scale)
    return docs.repartition(32).mapInPandas(
        gen, schema="doc_id bigint, media_type string, payload binary"
    )


def q_image_neardup(spark, sf_dir):
    """Perceptual-hash image near-dup (VERDICT r8 item 3) — the
    LAION-style multimodal dedup: synthesize one REAL 9×8 BMP per
    eligible document whose pixel gradients ENCODE a deterministic
    64-bit pattern (a per-group splitmix64 base, every third member
    one bit off), decode + dHash each payload (multimodal.py
    extract_image_phash: luma → 9×8 → horizontal gradient sign bits),
    then band the 64-bit fingerprints through the SimHash pigeonhole
    machinery (dedup.py hamming_neardup_pairs: 4 chunks, Hamming ≤ 3).
    The decode→fingerprint leg is Arrow-batched mapInPandas riding the
    scan partitions (9 bytes/row downstream); the pair leg shuffles on
    16-bit chunk keys — never a cross join.  The oracle predicts every
    fingerprint in closed form from doc_id and replays the pair
    generation exactly."""
    from kevinlang_spark.operators.dedup import hamming_neardup_pairs
    from kevinlang_spark.operators.multimodal import extract_image_phash

    docs = (
        _t(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 5 == 0)
        .select("doc_id")
    )
    sig = extract_image_phash(
        _phash_media(docs), method="dhash"
    ).localCheckpoint(eager=True)  # sig feeds both self-join legs: checkpoint so decode runs once
    return hamming_neardup_pairs(
        sig, max_hamming=3, blocks=4, id_col="doc_id", sig_col="phash"
    ).orderBy("id_a", "id_b")


def q_audio_neardup(spark, sf_dir):
    """Audio near-dup — the dedup tier for the audio modality
    (multimodal.py audio_energy_hash / extract_audio_fingerprint): each
    eligible doc's SAMPLES encode its deterministic fingerprint as a
    65-step loudness staircase (±25 around 2000, 16 samples per step),
    traveling as a real PCM WAV (even member index) or a rice-coded
    FLAC (odd) — so the query also proves the fingerprint is
    CONTAINER-INVARIANT for audio.  Decode → energy-gradient hash rides
    mapInPandas (9 bytes/row downstream); pairs band through the same
    pigeonhole machinery as text SimHash and image dHash.  The oracle
    is the identical closed-form pair replay as q_image_neardup (same
    group/flip formula — the modality must not show up)."""
    from kevinlang_spark.operators.dedup import hamming_neardup_pairs
    from kevinlang_spark.operators.multimodal import extract_audio_fingerprint

    docs = (
        _t(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 5 == 0)
        .select("doc_id")
    )

    def gen(it):
        import numpy as np
        import pandas as pd

        from kevinlang_spark.operators.flac import make_flac
        from kevinlang_spark.operators.multimodal import make_wav

        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                fp = _phash_fingerprint(d)
                amps = np.empty(65, dtype=np.int64)
                v = 2000  # ±64·25 stays well inside int16
                amps[0] = v
                for k in range(64):
                    v = v - 25 if (fp >> k) & 1 else v + 25
                    amps[k + 1] = v
                samples = np.repeat(amps, 16)
                if (d // 125) % 2 == 0:
                    payloads.append(make_wav(0, samples=samples))
                else:
                    payloads.append(make_flac(samples, block_size=256))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": "audio",
                    "payload": payloads,
                }
            )

    # spread the per-row WAV/FLAC encode+decode across cores — a
    # single-file parquet source otherwise serializes it on one task
    media = docs.repartition(32).mapInPandas(
        gen, schema="doc_id bigint, media_type string, payload binary"
    )
    sig = extract_audio_fingerprint(media).localCheckpoint(eager=True)  # sig feeds both self-join legs: checkpoint so decode runs once
    return hamming_neardup_pairs(
        sig, max_hamming=3, blocks=4, id_col="doc_id", sig_col="ahash"
    ).orderBy("id_a", "id_b")


def q_pdf_extract(spark, sf_dir):
    """PDF text extraction with zero external libraries (sources/
    pdf.py): synthesize one real single-page PDF per document —
    FlateDecode-compressed content streams on even ids, stored-plain on
    odd (both wire forms exercised), closed-form text lines in doc_id —
    then parse the object tree, inflate the streams, and decode the
    Tj/Td text operators back to the exact source lines.  Every tenth
    eligible id (d % 10 == 4) carries a CORRUPTED Flate stream and
    must quarantine to a NULL-text row, not a misextract.  The parse is
    one linear pass per file riding Arrow-batched mapInPandas; only the
    extracted text shuffles downstream."""
    from kevinlang_spark.sources.pdf import extract_pdf_text

    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def gen(it):
        import pandas as pd

        from kevinlang_spark.sources.pdf import make_pdf

        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                lines = [
                    f"doc {d} line {i} token{(d * 7 + i) % 1000}"
                    for i in range(d % 4 + 1)
                ]
                b = make_pdf(lines, compress=(d % 2 == 0))
                if d % 10 == 4:  # junk at the Flate stream head → gate
                    b = b.replace(b"stream\n", b"stream\n\x00\x07", 1)
                payloads.append(b)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    # spread per-row encode+parse across cores (single-file local read)
    media = docs.repartition(32).mapInPandas(
        gen, schema="doc_id bigint, payload binary"
    )
    ext = extract_pdf_text(media)
    return ext.select(
        "doc_id",
        F.when(
            F.col("text").isNotNull(), F.size(F.split("text", "\n"))
        ).alias("n_lines"),
        "text",
    )


def q_zip_ingest(spark, sf_dir):
    """ZIP archive member enumeration (sources/archive.py
    read_zip_members): synthesize one real ZIP per document —
    doc_id % 3 + 1 text members, deflate on even ids / stored on odd
    (both wire forms), every 7th id replaced by NON-ZIP bytes that must
    quarantine to a single file-level 'invalid' row — then enumerate
    members distributedly (stdlib zipfile over Arrow batches; member
    bytes dropped before anything shuffles — the census mode) and
    report the closed-form member census."""
    from kevinlang_spark.sources.archive import read_zip_members

    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def gen(it):
        import pandas as pd

        from kevinlang_spark.sources.archive import make_zip

        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                if d % 7 == 3:
                    payloads.append(b"PK\x03\x04 not actually an archive")
                    continue
                members = {
                    f"part{i}.txt": (
                        f"content {d} part {i} " + "x" * (d % 50)
                    ).encode()
                    for i in range(d % 3 + 1)
                }
                payloads.append(make_zip(members, compress=(d % 2 == 0)))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    archives = docs.repartition(32).mapInPandas(
        gen, schema="doc_id bigint, payload binary"
    )
    members = read_zip_members(archives, keep_payload=False)
    # normalize the status to its class token: exception texts vary by
    # Python version, classes do not
    return members.select(
        "doc_id",
        "member",
        "n_bytes",
        F.split_part(F.col("status"), F.lit(":"), F.lit(1)).alias("status"),
    )


def q_zstd_ingest(spark, sf_dir):
    """ZSTD-wrapped shard ingestion (sources/archive.py _zstd_decompress
    via pyarrow's bundled codec + read_tar_members) — the wrapper
    Common Crawl's newer dumps and HF dataset shards increasingly ship
    in: synthesize one real .tar.zst per document (doc_id % 3 + 1 text
    members, deterministic pyarrow zstd frames), every 7th id replaced
    by a zstd-MAGIC-but-garbage payload that must quarantine to a
    single file-level 'invalid' row, then enumerate members
    distributedly in census mode (member bytes never shuffle).  Same
    closed-form census as the ZIP/gzip tiers — the wrapper must not
    show up in the result."""
    from kevinlang_spark.sources.archive import read_tar_members

    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def gen(it):
        import pandas as pd

        from kevinlang_spark.sources.archive import _ZSTD_MAGIC, make_tar

        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                if d % 7 == 3:
                    payloads.append(_ZSTD_MAGIC + b" not a real frame")
                    continue
                members = {
                    f"part{i}.txt": (
                        f"content {d} part {i} " + "x" * (d % 50)
                    ).encode()
                    for i in range(d % 3 + 1)
                }
                payloads.append(make_tar(members, zstd=True))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    archives = docs.repartition(32).mapInPandas(
        gen, schema="doc_id bigint, payload binary"
    )
    members = read_tar_members(archives, keep_payload=False)
    return members.select(
        "doc_id",
        "member",
        "n_bytes",
        F.split_part(F.col("status"), F.lit(":"), F.lit(1)).alias("status"),
    )


def q_webdataset(spark, sf_dir):
    """WebDataset shard ingestion (sources/archive.py read_tar_members
    + webdataset_samples) — the tar-of-(key.ext) convention
    vision/multimodal training shards ship in: synthesize one real
    .tar.gz per document holding doc_id % 3 + 1 samples (a .txt and a
    .cls part each, content closed-form), enumerate members
    distributedly (stdlib tarfile in Arrow batches), group parts into
    samples with ONE keyed aggregation on (archive, key), and report
    the per-sample census.  Every 9th id carries a corrupt gzip
    wrapper and must contribute NO samples (file-level quarantine
    upstream of the grouping)."""
    from kevinlang_spark.sources.archive import (
        read_tar_members,
        webdataset_samples,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def gen(it):
        import pandas as pd

        from kevinlang_spark.sources.archive import make_tar

        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                if d % 9 == 5:
                    payloads.append(b"\x1f\x8b\x08 broken gzip wrapper")
                    continue
                members = {}
                for s in range(d % 3 + 1):
                    members[f"{d}_{s}.txt"] = (
                        f"sample {d} {s} " + "y" * (d % 20)
                    ).encode()
                    members[f"{d}_{s}.cls"] = str((d + s) % 10).encode()
                payloads.append(make_tar(members))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    archives = docs.repartition(32).mapInPandas(
        gen, schema="doc_id bigint, payload binary"
    )
    samples = webdataset_samples(read_tar_members(archives))
    return samples.select(
        "doc_id",
        "key",
        "n_parts",
        F.length(F.element_at(F.col("parts"), F.lit("txt"))).alias("txt_len"),
        F.decode(F.element_at(F.col("parts"), F.lit("cls")), "UTF-8").alias(
            "cls"
        ),
    )


def q_webdataset_pipeline(spark, sf_dir):
    """The LAION shard shape END-TO-END: tar.gz WebDataset shards →
    sample grouping → REAL image decode + caption tokenization in one
    declarative plan.  Each document's shard holds one (bmp, txt)
    sample — a constant-color BMP with doc_id-derived dimensions and a
    closed-form caption — so the pipeline proves parts route to the
    right modality leg: the image part through stdlib_pixel_decode
    (Arrow-batched, pixels never shuffle), the caption through a
    Catalyst token count.  Everything downstream of the one keyed
    sample-grouping aggregation pipelines inside the scan stage."""
    from kevinlang_spark.sources.archive import (
        read_tar_members,
        webdataset_samples,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def gen(it):
        import pandas as pd

        from kevinlang_spark.operators.multimodal import make_bmp
        from kevinlang_spark.sources.archive import make_tar

        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                payloads.append(
                    make_tar(
                        {
                            f"{d}.bmp": make_bmp(
                                d % 16 + 1,
                                d % 12 + 1,
                                rgb=(d % 256, d * 3 % 256, d * 7 % 256),
                            ),
                            f"{d}.txt": (
                                f"caption {d} " + "word " * (d % 5)
                            ).encode(),
                        }
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    archives = docs.repartition(32).mapInPandas(
        gen, schema="doc_id bigint, payload binary"
    )
    samples = webdataset_samples(read_tar_members(archives))
    staged = samples.select(
        "doc_id",
        "key",
        F.element_at(F.col("parts"), F.lit("bmp")).alias("img"),
        F.decode(F.element_at(F.col("parts"), F.lit("txt")), "UTF-8").alias(
            "caption"
        ),
    )

    def dec(it):
        import pandas as pd

        from kevinlang_spark.operators.multimodal import stdlib_pixel_decode

        for pdf in it:
            w, h, mr = [], [], []
            for p in pdf["img"]:
                try:
                    s = stdlib_pixel_decode(bytes(p), "image")
                    w.append(s["width"])
                    h.append(s["height"])
                    mr.append(s["mean_r"])
                except ValueError:
                    w.append(None)
                    h.append(None)
                    mr.append(None)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "key": pdf["key"],
                    "caption": pdf["caption"],
                    "width": pd.array(w, dtype="Int32"),
                    "height": pd.array(h, dtype="Int32"),
                    "mean_r": pd.array(mr, dtype="Float64"),
                }
            )

    out = staged.mapInPandas(
        dec,
        schema=(
            "doc_id bigint, key string, caption string, width int, "
            "height int, mean_r double"
        ),
    )
    return out.select(
        "doc_id",
        "key",
        "width",
        "height",
        "mean_r",
        F.size(F.split(F.trim(F.col("caption")), " +")).alias(
            "n_caption_tokens"
        ),
    )


def _shard_dir(spark, sf_dir):
    """Materialize (once per sf_dir per code version) a directory of
    real .tar.gz WebDataset shards for the streaming-shard query: one
    shard per 20 documents, each member '{d}.txt' with closed-form
    content, plus one shard with a CORRUPT gzip wrapper (the
    file-level quarantine row).  Bounded collect = fixture synthesis;
    the query reads the directory through the binaryFile stream."""
    import os

    from kevinlang_spark.sources.archive import make_tar

    path = _artifact_path(
        sf_dir, "shard_dir", "kevinlang_spark/sources/archive.py"
    )
    marker = os.path.join(path, "_SUCCESS")
    if os.path.exists(marker):
        return path
    os.makedirs(path, exist_ok=True)
    rows = (
        _t(spark, sf_dir, "documents").select("doc_id").orderBy("doc_id").collect()
    )
    groups: dict[int, list] = {}
    for r in rows:
        d = int(r["doc_id"])
        groups.setdefault(d // 20, []).append(d)
    for g, ids in groups.items():
        members = {
            f"{d}.txt": (f"doc {d} " + "z" * (d % 40)).encode() for d in ids
        }
        with open(os.path.join(path, f"shard-{g:05d}.tar.gz"), "wb") as fh:
            fh.write(make_tar(members))
    with open(os.path.join(path, "shard-corrupt.tar.gz"), "wb") as fh:
        fh.write(b"\x1f\x8b\x08 broken gzip wrapper")
    with open(marker, "w") as fh:
        fh.write("ok")
    return path


def q_stream_shards(spark, sf_dir):
    """STREAMING WebDataset shard ingestion (sources/archive.py
    stream_tar_members): the shard fixture directory consumed as a
    binaryFile file-source stream — new shards land in the bucket, each
    micro-batch enumerates only the new files, the checkpoint
    guarantees exactly-once — drained with availableNow into a
    complete-mode per-status census.  The corrupt shard must surface as
    exactly one file-level 'invalid' row; the oracle predicts the 'ok'
    mass closed-form from the documents table (streaming must converge
    to the batch answer)."""
    from kevinlang_spark.sources.archive import stream_tar_members

    members = stream_tar_members(spark, _shard_dir(spark, sf_dir))
    out = members.groupBy(
        F.split_part(F.col("status"), F.lit(":"), F.lit(1)).alias("status")
    ).agg(
        F.count("*").alias("n_members"),
        F.sum("n_bytes").alias("total_bytes"),
    )
    q = (
        out.writeStream.format("memory")
        .queryName("q_stream_shards_mem")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(120):
        q.stop()
        raise RuntimeError("q_stream_shards: drain did not finish in 120s")
    return spark.table("q_stream_shards_mem")


def q_docx_extract(spark, sf_dir):
    """DOCX text extraction end-to-end (sources/archive.py
    extract_docx_text): synthesize one real .docx per document —
    [Content_Types].xml + _rels + a WordprocessingML document part,
    paragraphs closed-form in doc_id INCLUDING XML-escaped characters
    (&, <, >) — then enumerate the ZIP distributedly, keep
    word/document.xml, and convert the markup to text with the PURE
    Catalyst chain docx_xml_to_text (paragraphs → newlines, tags drop,
    entities decode).  The oracle reconstructs the exact text, proving
    escape → extract round-trips character-for-character."""
    from kevinlang_spark.sources.archive import extract_docx_text

    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def gen(it):
        import pandas as pd

        from kevinlang_spark.sources.archive import make_docx

        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                paras = [f"Report {d}"] + [
                    f"row {i} A&B <{(d * 3 + i) % 100}>"
                    for i in range(d % 3)
                ]
                payloads.append(make_docx(paras))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    archives = docs.repartition(32).mapInPandas(
        gen, schema="doc_id bigint, payload binary"
    )
    return extract_docx_text(archives)


def q_video_neardup(spark, sf_dir):
    """VIDEO near-dup — the dedup tier for the video modality riding
    the AVI-MJPEG decode (multimodal.py _avi_mjpeg_frames): each
    eligible doc becomes a real RIFF-AVI whose FRAME 0 is a 9×8
    baseline JPEG encoding the doc's deterministic fingerprint as
    ±15 luma gradients (all-ones quantization error ≤2 ≪ the step, the
    q_image_crossformat guarantee), followed by a constant DECOY frame
    — so the query also proves the fingerprint extractor pins frame 0,
    the LAION-video convention.  Container walk → per-frame entropy
    decode → dHash rides mapInPandas (9 bytes/row downstream); pairs
    band through the same pigeonhole machinery as text SimHash, image
    dHash, and audio energy hashes.  The oracle is the identical
    closed-form pair replay as q_image_neardup / q_audio_neardup (same
    group/flip formula — the modality must not show up)."""
    from kevinlang_spark.operators.dedup import hamming_neardup_pairs
    from kevinlang_spark.operators.multimodal import extract_image_phash

    docs = (
        _t(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 5 == 0)
        .select("doc_id")
    )

    def gen(it):
        import pandas as pd

        from kevinlang_spark.operators.jpeg import make_jpeg
        from kevinlang_spark.operators.multimodal import make_avi

        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                px = _gradient_pixels(_phash_fingerprint(d))
                frames = [make_jpeg(9, 8, pixels=px[:, :, 0])]
                if d % 2 == 0:  # decoy frame: must NOT perturb the hash
                    frames.append(make_jpeg(9, 8, gray=d % 256))
                payloads.append(make_avi(9, 8, frames))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": "video",
                    "payload": payloads,
                }
            )

    # spread the per-row AVI encode+decode across cores — a single-file
    # parquet source otherwise serializes it on one task
    media = docs.repartition(32).mapInPandas(
        gen, schema="doc_id bigint, media_type string, payload binary"
    )
    sig = extract_image_phash(
        media, method="dhash"
    ).localCheckpoint(eager=True)  # sig feeds both self-join legs: checkpoint so decode runs once
    return hamming_neardup_pairs(
        sig, max_hamming=3, blocks=4, id_col="doc_id", sig_col="phash"
    ).orderBy("id_a", "id_b")


def q_image_crossformat(spark, sf_dir):
    """Container-invariant fingerprinting — the property multimodal
    dedup actually relies on: the SAME pixel content travels as a BMP
    (p%3==0), a zlib-deflated PNG (p%3==1), or a baseline JPEG
    (p%3==2, all-ones quantization: error ≤2 ≪ the ±15 gradient step),
    and the decoded dHash must be identical for all three, so
    re-encoded copies of one image still collide.  Output is (doc_id,
    phash) over every eligible doc; the oracle replays the fingerprint
    closed-form from doc_id — container choice must not show up at
    all."""
    from kevinlang_spark.operators.multimodal import extract_image_phash

    docs = (
        _t(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 5 == 0)
        .select("doc_id")
    )

    def gen(it):
        import pandas as pd

        from kevinlang_spark.operators.jpeg import make_jpeg
        from kevinlang_spark.operators.multimodal import make_bmp, make_png

        for pdf in it:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                px = _gradient_pixels(_phash_fingerprint(d))
                p = d // 125  # member index within the group
                if p % 3 == 0:
                    payloads.append(make_bmp(9, 8, pixels=px))
                elif p % 3 == 1:
                    payloads.append(make_png(9, 8, pixels=px))
                else:
                    payloads.append(make_jpeg(9, 8, pixels=px[:, :, 0]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": "image",
                    "payload": payloads,
                }
            )

    # spread the per-row BMP/PNG/JPEG encode+decode across cores — a
    # single-file parquet source otherwise serializes it on one task
    media = docs.repartition(32).mapInPandas(
        gen, schema="doc_id bigint, media_type string, payload binary"
    )
    return extract_image_phash(media, method="dhash").orderBy("doc_id")


def _image_crossformat_oracle_sql() -> str:
    """Replay of q_image_crossformat: fingerprint = group base with the
    p%3==1 members' one-bit flip (the q_image_neardup formula) — the
    container column is absent by design; if any container's decode
    perturbed the hash, that row's value would differ."""
    vals = ", ".join(
        f"({g}, {_phash_group_base(g)})" for g in range(_PHASH_GROUPS)
    )
    return (
        f"WITH base AS (SELECT * FROM (VALUES {vals}) AS t(g, ph)), "
        "elig AS (SELECT doc_id, (doc_id // 5) % 25 AS g, "
        "(doc_id // 5) // 25 AS p FROM documents WHERE doc_id % 5 = 0) "
        "SELECT doc_id, CASE WHEN p % 3 = 1 THEN "
        "xor(CAST(ph AS BIGINT), CAST(1 AS BIGINT) << CAST((g + p) % 63 AS INT)) "
        "ELSE CAST(ph AS BIGINT) END AS phash "
        "FROM elig JOIN base USING (g) ORDER BY doc_id"
    )


def q_image_phash(spark, sf_dir):
    """DCT perceptual hash end-to-end (multimodal.py phash_bits): decode
    each synthetic BMP, 32×32 luma, 2-D DCT, median-threshold the 8×8
    low-frequency block into a 64-bit fingerprint — the hash family that
    survives blur/recompression where dHash's gradients move.  Runs over
    the UNFLIPPED group members (every third member carries a one-bit
    dHash perturbation whose pHash is not closed-form), so each group's
    expected fingerprint is one literal the oracle replays — computed by
    the SAME Python reference the executors run."""
    from kevinlang_spark.operators.multimodal import extract_image_phash

    docs = (
        _t(spark, sf_dir, "documents")
        .where(
            # member index p = (doc_id//5)//25 = doc_id//125 (ids are
            # multiples of 5); keep p % 3 != 1 (the unflipped members)
            (F.col("doc_id") % 5 == 0)
            & (F.floor(F.col("doc_id") / 125) % 3 != 1)
        )
        .select("doc_id")
    )
    return extract_image_phash(_phash_media(docs), method="phash").orderBy(
        "doc_id"
    )


def q_image_dedup(spark, sf_dir):
    """The FULL LAION-style image-dedup pipeline on the gate: decode →
    dHash fingerprint (mapInPandas) → pigeonhole Hamming banding →
    min-label connected components (dedup.py neardup_components) —
    (id, comp) where comp is the smallest doc_id in the near-dup
    cluster.  By construction every group is one Hamming ≤ 2 clique, so
    the oracle is closed-form: comp = the group's minimum eligible
    doc_id; singleton groups (possible at tiny sf) are unlabeled,
    matching neardup_components' nodes-with-≥1-pair contract."""
    from kevinlang_spark.operators.dedup import (
        hamming_neardup_pairs,
        neardup_components,
    )
    from kevinlang_spark.operators.multimodal import extract_image_phash

    docs = (
        _t(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 5 == 0)
        .select("doc_id")
    )
    sig = extract_image_phash(
        _phash_media(docs), method="dhash"
    ).localCheckpoint(eager=True)  # sig feeds both self-join legs: checkpoint so decode runs once
    pairs = hamming_neardup_pairs(
        sig, max_hamming=3, blocks=4, id_col="doc_id", sig_col="phash"
    )
    return neardup_components(pairs).orderBy("id")


_PIPELINE_GROUPS = 125


def _pipeline_fp(d: int) -> int:
    """Fingerprint carried by corpus image ``d`` (q_image_pipeline):
    125 groups over ALL document ids (not the %5 slice) so the on-disk
    corpus is the full multi-thousand-file table; same splitmix64 base
    + every-third-member bit flip as :func:`_phash_fingerprint`, so
    intra-group Hamming is ≤ 2 and inter-group ~31."""
    g = d % _PIPELINE_GROUPS
    p = d // _PIPELINE_GROUPS
    fp = _phash_group_base(g)
    if p % 3 == 1:
        fp ^= 1 << ((g + p) % 63)
    return fp


def _image_pipeline_dir(spark, sf_dir):
    """Materialize (once per sf_dir per code version) the ON-DISK image
    corpus for the end-to-end pipeline query: one real file per
    documents row — BMP for even ids, PNG for odd (both lossless, so
    the decoded dHash is exactly :func:`_pipeline_fp`), and non-image
    .txt junk for ids % 29 == 7 (the quarantine rows).  sf0.1 → 5000
    files, the multi-thousand-image corpus VERDICT r9 item 6 asks for.
    Fixture synthesis (bounded, cached behind _artifact_path's
    code-version tag) — the QUERY starts at the binaryFile source like
    any bronze layer."""
    import os

    from kevinlang_spark.operators.multimodal import make_bmp, make_png

    path = _artifact_path(
        sf_dir, "img_corpus", "kevinlang_spark/operators/multimodal.py"
    )
    marker = os.path.join(path, "_SUCCESS")
    if os.path.exists(marker):
        return path
    os.makedirs(path, exist_ok=True)
    ids = [
        int(r["doc_id"])
        for r in _t(spark, sf_dir, "documents").select("doc_id").collect()
    ]
    for d in ids:
        if d % 29 == 7:
            payload, name = f"not an image: {d}".encode(), f"{d}.txt"
        else:
            px = _gradient_pixels(_pipeline_fp(d))
            if d % 2 == 0:
                payload, name = make_bmp(9, 8, pixels=px), f"{d}.bmp"
            else:
                payload, name = make_png(9, 8, pixels=px), f"{d}.png"
        with open(os.path.join(path, name), "wb") as fh:
            fh.write(payload)
    with open(marker, "w"):
        pass
    return path


def q_image_pipeline(spark, sf_dir):
    """The image near-dup tier END-TO-END AT CORPUS SCALE (VERDICT r9
    item 6): binaryFile source over a multi-thousand-file on-disk
    corpus (sources/binary.py read_media_dir — extension routing, junk
    .txt files become media_type 'other') → Arrow-batched decode +
    dHash (multimodal.py extract_image_phash; BMP and PNG payloads of
    the same group decode to identical fingerprints, 'other' rows
    quarantine by omission) → pigeonhole Hamming banding (dedup.py
    hamming_neardup_pairs, 4 chunks, ≤ 3) → min-label connected
    components.  Every stage is the production shape: listing-time
    partitioning by file, 9 bytes/row after the decode stage, 16-bit
    chunk-key shuffles, never a cross join.  The oracle is closed-form:
    each group is one Hamming ≤ 2 clique, so comp = the group's minimum
    non-junk id; singleton groups unlabeled."""
    from kevinlang_spark.operators.dedup import (
        hamming_neardup_pairs,
        neardup_components,
    )
    from kevinlang_spark.operators.multimodal import extract_image_phash
    from kevinlang_spark.sources.binary import read_media_dir

    bronze = read_media_dir(spark, _image_pipeline_dir(spark, sf_dir))
    media = bronze.select(
        # the file NAME is the stable corpus key (read_media_dir's
        # md5-path doc_id would differ across tmp dirs)
        F.regexp_extract("path", r"(\d+)\.[a-z]+$", 1)
        .cast("bigint")
        .alias("doc_id"),
        "media_type",
        "payload",
    )
    # the sig frame (9 bytes/row) feeds BOTH sides of the pigeonhole
    # self-join — checkpoint it so the 5000-file decode runs ONCE, not
    # once per join leg (the multi-consumer rule from SCALE.md)
    sig = (
        extract_image_phash(media, method="dhash")
        .localCheckpoint(eager=True)
    )
    pairs = hamming_neardup_pairs(
        sig, max_hamming=3, blocks=4, id_col="doc_id", sig_col="phash"
    )
    return neardup_components(pairs).orderBy("id")


def _image_neardup_oracle_sql() -> str:
    """Closed-form replay of q_image_neardup: the 25 group base
    fingerprints embed as literals (the same _phash_group_base ints the
    image synthesis encoded), the per-member bit flip and the
    Hamming ≤ 3 pair filter replay in integer SQL."""
    vals = ", ".join(
        f"({g}, {_phash_group_base(g)})" for g in range(_PHASH_GROUPS)
    )
    return (
        f"WITH base AS (SELECT * FROM (VALUES {vals}) AS t(g, ph)), "
        "elig AS (SELECT doc_id, (doc_id // 5) % 25 AS g, "
        "(doc_id // 5) // 25 AS p FROM documents WHERE doc_id % 5 = 0), "
        "fp AS (SELECT doc_id, CASE WHEN p % 3 = 1 THEN "
        "xor(CAST(ph AS BIGINT), CAST(1 AS BIGINT) << CAST((g + p) % 63 AS INT)) "
        "ELSE CAST(ph AS BIGINT) END AS ph FROM elig JOIN base USING (g)) "
        "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
        "CAST(bit_count(xor(a.ph, b.ph)) AS INT) AS hamming "
        "FROM fp a JOIN fp b ON a.doc_id < b.doc_id "
        "WHERE bit_count(xor(a.ph, b.ph)) <= 3 ORDER BY id_a, id_b"
    )


def _image_phash_oracle_sql() -> str:
    """Replay of q_image_phash: the 25 expected group fingerprints embed
    as literals, computed by the SAME Python reference
    (multimodal.phash_bits over _gradient_pixels) the executors run —
    the oracle checks the distributed decode + DCT pipeline reproduces
    the reference bit-for-bit per group."""
    from kevinlang_spark.operators.multimodal import phash_bits

    vals = ", ".join(
        f"({g}, {phash_bits(_gradient_pixels(_phash_group_base(g)))})"
        for g in range(_PHASH_GROUPS)
    )
    return (
        f"WITH base AS (SELECT * FROM (VALUES {vals}) AS t(g, ph)) "
        "SELECT doc_id, CAST(ph AS BIGINT) AS phash "
        "FROM (SELECT doc_id, (doc_id // 5) % 25 AS g FROM documents "
        "WHERE doc_id % 5 = 0 AND (doc_id // 125) % 3 <> 1) "
        "JOIN base USING (g) ORDER BY doc_id"
    )


def _media_ingest_dir(spark, sf_dir):
    """Materialize (once per sf_dir per machine) a directory of REAL
    on-disk media files for the binaryFile ingestion query: one file per
    documents row with doc_id % 25 == 0 — even ids become filled BMPs,
    ids % 4 == 1 become constant-amplitude WAVs, ids % 4 == 3 become
    non-media .txt junk (the quarantine row).  Content is closed-form in
    the id (same formulas as attach_stdlib_media), so the oracle
    predicts every decoded statistic.  The bounded collect here is test
    -fixture synthesis (≤ N/25 ids), not query work — the QUERY reads
    the directory through the binaryFile source like any bronze layer."""
    import os

    from kevinlang_spark.operators.multimodal import make_bmp, make_wav

    path = _artifact_path(
        sf_dir, "media_dir", "kevinlang_spark/operators/multimodal.py"
    )
    marker = os.path.join(path, "_SUCCESS")
    if os.path.exists(marker):
        return path
    os.makedirs(path, exist_ok=True)
    ids = [
        r["doc_id"]
        for r in _t(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 25 == 0)
        .select("doc_id")
        .collect()
    ]
    for d in ids:
        d = int(d)
        if d % 2 == 0:
            rgb = (d % 256, d * 3 % 256, d * 7 % 256)
            payload = make_bmp(d % 64 + 1, d % 48 + 1, rgb=rgb)
            name = f"{d}.bmp"
        elif d % 4 == 1:
            payload = make_wav(d % 1000 + 1, amplitude=d % 2048)
            name = f"{d}.wav"
        else:
            payload = f"not media: {d}".encode()
            name = f"{d}.txt"
        with open(os.path.join(path, name), "wb") as fh:
            fh.write(payload)
    with open(marker, "w"):
        pass
    return path


def q_media_ingest(spark, sf_dir):
    """The bronze→decode path END-TO-END through the binaryFile SOURCE
    (sources/binary.py read_media_dir): ingest a directory of real
    on-disk BMP/WAV/junk files (listing-time extension routing, pushed
    length column), full-decode the pixel grids / PCM streams with
    multimodal.py extract_pixel_stats, and emit per-file content
    statistics.  Junk .txt files route to media_type 'other' and
    QUARANTINE to null stats — never a dead task.  The oracle replays
    the closed-form generation formulas from the documents ids; the
    file_key joins the decoded stats back to the formula (the md5 path
    ids the source derives are covered by tests/test_binary_source.py;
    PNG ingestion+inflate by q_media_pixels and the source tests)."""
    from kevinlang_spark.operators.multimodal import extract_pixel_stats
    from kevinlang_spark.sources.binary import read_media_dir

    bronze = read_media_dir(spark, _media_ingest_dir(spark, sf_dir))
    keyed = bronze.select(
        F.regexp_extract("path", r"(\d+)\.[a-z]+$", 1)
        .cast("bigint")
        .alias("file_key"),
        "doc_id",
        "n_bytes",
    )
    stats = extract_pixel_stats(
        bronze.select("doc_id", "media_type", "payload")
    )
    return keyed.join(stats, "doc_id").select(
        "file_key",
        "media_type",
        "n_bytes",
        "width",
        "height",
        "n_frames",
        "mean_r",
        "mean_g",
        "mean_b",
        "rms",
        "peak",
    )


def q_stream_join(spark, sf_dir):
    """STREAMING stream-stream interval join: two watermarked restreams
    of the events source (views, clicks) interval-joined in append mode
    via availableNow — the drained pair set must equal the batch
    attribution join (q_click_attribution's SQL is the oracle)."""
    import os
    import tempfile

    from kevinlang_spark.sources.parquet import normalize_event_ts
    from kevinlang_spark.streaming.joins import interval_pair_join
    from kevinlang_spark.streaming.windows import with_watermark

    d = tempfile.mkdtemp(prefix="stream_join_src_")
    os.symlink(
        os.path.abspath(f"{sf_dir}/events.parquet"),
        os.path.join(d, "events.parquet"),
    )
    schema = spark.read.parquet(d).schema

    def src():
        return normalize_event_ts(spark.readStream.schema(schema).parquet(d))

    views = with_watermark(
        src().where(F.col("event_type") == "view"), delay="48 hours"
    )
    clicks = with_watermark(
        src().where(F.col("event_type") == "click"), delay="48 hours"
    )
    out = interval_pair_join(views, clicks, within="24 hours").select(
        F.col("user_id"),
        F.col("event_id").alias("view_id"),
        F.col("event_id_r").alias("click_id"),
        F.unix_timestamp("ts").alias("view_ts"),
        F.unix_timestamp("ts_r").alias("click_ts"),
    )
    from kevinlang_spark.streaming.sinks import scoped_state_partitions

    # a stream-stream join keeps 4 state stores per partition; size the
    # instance count to the drained volume (sinks.py rationale — at
    # scale the knob turns the other way, BEFORE the first checkpoint)
    with scoped_state_partitions(spark, 8):
        q = (
            out.writeStream.format("memory")
            .queryName("q_stream_join_mem")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        # False = timeout: partial snapshot + still-active query (the
        # next .start() with this name would throw) — fail loudly
        if not q.awaitTermination(180):
            q.stop()
            raise RuntimeError("q_stream_join: drain did not finish in 180s")
    return spark.table("q_stream_join_mem")


def q_stream_stateful(spark, sf_dir):
    """STREAMING custom state: per-user running totals held in explicit
    GroupState (applyInPandasWithState) drained via availableNow — the
    cross-batch-state extension surface, whose final state must equal
    the one-shot batch aggregate."""
    from kevinlang_spark.streaming.stateful import run_stateful_to_memory

    return run_stateful_to_memory(
        spark, f"{sf_dir}/events.parquet", query_name="q_stream_stateful_mem"
    )


def q_stream_hourly(spark, sf_dir):
    """STREAMING execution of the tumbling-window rollup: the events
    parquet is consumed as a file-source stream (availableNow trigger),
    aggregated with the SAME tumbling_counts transform as the batch
    q_events_hourly, and landed complete-mode in a memory sink.  The
    oracle is the batch twin — Structured Streaming's incremental state
    must converge to exactly the batch answer once the stream drains.
    Complete-mode windowed aggs need no watermark, so the final table
    covers every window."""
    from kevinlang_spark.streaming.windows import run_stream_to_memory, tumbling_counts

    return run_stream_to_memory(
        spark,
        f"{sf_dir}/events.parquet",
        lambda src: tumbling_counts(src, "1 hour").select(
            "window_start", "event_type", "n", "value_sum"
        ),
        query_name="q_stream_hourly_mem",
    )


def q_stream_sliding(spark, sf_dir):
    """STREAMING sliding windows (1h window / 15m slide) via availableNow
    into a complete-mode memory sink — overlapping-window state, count
    only (integer-exact parity with the batch oracle)."""
    from kevinlang_spark.streaming.windows import run_stream_to_memory, sliding_counts

    return run_stream_to_memory(
        spark,
        f"{sf_dir}/events.parquet",
        lambda src: sliding_counts(src, "1 hour", "15 minutes"),
        query_name="q_stream_sliding_mem",
    )


def q_stream_dedup(spark, sf_dir):
    """STREAMING exact dedup: dropDuplicates on (user_id, event_type)
    over the event stream, append-mode memory sink.  First occurrence
    emits immediately (dedup state never holds rows back), so the
    drained stream's output is exactly the batch DISTINCT — set-equal
    regardless of file processing order."""
    from kevinlang_spark.streaming.windows import run_stream_to_memory

    return run_stream_to_memory(
        spark,
        f"{sf_dir}/events.parquet",
        lambda src: src.select("user_id", "event_type").dropDuplicates(
            ["user_id", "event_type"]
        ),
        query_name="q_stream_dedup_mem",
        output_mode="append",
    )


def _stream_neardup_fixture(spark, sf_dir):
    """(index_dir, arrivals_dir) for the streaming near-dup query,
    built once per sf_dir per code version: the corpus slice (doc_id %
    3 != 0) is MinHash-indexed to parquet (dedup.py
    write_minhash_index), the arrival slice (doc_id % 3 == 0) lands as
    a parquet directory the stream will ingest.  Fixture synthesis
    behind _artifact_path's code-version tag; the QUERY drains the
    stream fresh every call."""
    import os
    import shutil

    root = _artifact_path(
        sf_dir, "stream_mh",
        "kevinlang_spark/operators/dedup.py",
        "kevinlang_spark/streaming/neardup.py",
    )
    index_dir = os.path.join(root, "index")
    arrivals_dir = os.path.join(root, "arrivals")
    done = os.path.join(root, "_DONE")
    if os.path.exists(done):
        return index_dir, arrivals_dir
    if os.path.exists(root):
        shutil.rmtree(root)  # crashed prior build — rebuild atomically
    from kevinlang_spark.operators.dedup import write_minhash_index

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    write_minhash_index(
        docs.where(F.col("doc_id") % 3 != 0), index_dir, num_hashes=32
    )
    docs.where(F.col("doc_id") % 3 == 0).write.parquet(arrivals_dir)
    with open(done, "w"):
        pass
    return index_dir, arrivals_dir


def q_stream_neardup(spark, sf_dir):
    """STREAMING ingest-time near-dup screening (VERDICT r9 item 7 —
    streaming/neardup.py neardup_against_index): the corpus slice is
    MinHash-indexed ONCE (persisted shingle + signature tables); the
    arrival slice replays as a file-source stream whose micro-batches
    broadcast their band keys against the index scan and append
    verified (new_id, corpus_id, jaccard) matches to a parquet sink —
    the corpus is never re-tokenized and never shuffles, the 100 TB
    ingest shape.  Drained with availableNow + checkpoint
    (exactly-once).  Oracle-checkable for the same reason as
    q_minhash_pairs: banding only prunes; at J ≥ 0.8 with 16 bands ×
    2 rows the per-pair miss probability is ≤ 8e-8 and the seeded hash
    family is deterministic, so the exact bipartite shingle-Jaccard
    join reproduces the output."""
    import os
    import tempfile

    from kevinlang_spark.streaming.neardup import neardup_against_index

    index_dir, arrivals_dir = _stream_neardup_fixture(spark, sf_dir)
    run = tempfile.mkdtemp(prefix="kevinlang_stream_mh_run_")
    sink = os.path.join(run, "matches")
    stream = spark.readStream.schema("doc_id bigint, text string").parquet(
        arrivals_dir
    )
    q = neardup_against_index(
        stream, index_dir, sink, os.path.join(run, "ckpt"),
        threshold=0.8, num_hashes=32,
    )
    if not q.awaitTermination(120):
        q.stop()
        raise RuntimeError("q_stream_neardup: drain did not finish in 120s")
    return spark.read.parquet(sink).orderBy("new_id", "corpus_id")


# --------------------------------------------------------------------- #
# dedup / text analysis / similarity / multimodal extension ops
# --------------------------------------------------------------------- #


def q_dedup_exact(spark, sf_dir):
    """Exact content dedup: min doc_id per normalized-text fingerprint."""
    from kevinlang_spark.operators.dedup import dedup_exact_by_text

    return dedup_exact_by_text(_t(spark, sf_dir, "documents")).select("fp", "doc_id")


def q_dedup_rate(spark, sf_dir):
    """Duplication rate per source: total vs distinct fingerprints."""
    from kevinlang_spark.operators.text import fingerprint

    return (
        _t(spark, sf_dir, "documents")
        .select("source", fingerprint(F.col("text")).alias("fp"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.count_distinct("fp").alias("n_unique"),
        )
    )


def q_text_stats(spark, sf_dir):
    """Per-document token/char statistics (pure codegen expressions)."""
    from kevinlang_spark.functions.textexpr import token_count

    t = F.col("text")
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        token_count(t).alias("n_tokens"),
        F.length(t).alias("len_chars"),
        F.round(
            F.length(F.regexp_replace(F.lower(t), "[^a-z]", ""))
            / F.when(F.length(t) > 0, F.length(t).cast("double")),
            4,
        ).alias("alpha_ratio"),
    )


def q_tokens_by_source(spark, sf_dir):
    """Corpus token counting grouped by source."""
    from kevinlang_spark.functions.textexpr import token_count

    return (
        _t(spark, sf_dir, "documents")
        .select("source", token_count(F.col("text")).alias("nt"))
        .groupBy("source")
        .agg(F.sum("nt").alias("total_tokens"), F.count("*").alias("n_docs"))
    )


def q_langid(spark, sf_dir):
    """Heuristic language-ID distribution (marker-set intersection)."""
    from kevinlang_spark.operators.text import lang_id

    return (
        _t(spark, sf_dir, "documents")
        .select(lang_id(F.col("text")).alias("lang_pred"))
        .groupBy("lang_pred")
        .agg(F.count("*").alias("n"))
    )


def q_ngram_jaccard(spark, sf_dir):
    """Exact token-set Jaccard pairs ≥ 0.8 on a doc subset (relational
    candidate generation — the SQL-expressible dedup twin)."""
    from kevinlang_spark.operators.dedup import ngram_jaccard_pairs

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    return ngram_jaccard_pairs(docs, threshold=0.8)


def q_containment(spark, sf_dir):
    """Asymmetric near-subset pairs (token-set containment ≥ 0.9) on a
    doc subset — the short-doc-pasted-into-long-doc duplication Jaccard
    misses."""
    from kevinlang_spark.operators.dedup import containment_pairs

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    return containment_pairs(docs, threshold=0.9)


def q_source_overlap(spark, sf_dir):
    """Cross-source contamination matrix at word-8-gram granularity:
    distinct grams shared between every source pair, with overlap share
    of the smaller side — fp-keyed join of 8-byte digests, |sources|²
    output.  (Whole-doc fingerprints share NOTHING across sources in
    this corpus — partial reuse is exactly what the gram dial is for.)"""
    from kevinlang_spark.operators.dedup import source_overlap_matrix

    return source_overlap_matrix(_t(spark, sf_dir, "documents"), ngram=8)


def q_minhash_pairs(spark, sf_dir):
    """MinHash+LSH near-dup pairs, exact-Jaccard verified.

    Oracle-checkable: the emitted pairs are the exact shingle-Jaccard
    ≥ 0.8 pairs (the LSH banding only PRUNES candidates; with the
    default 32 hashes over 16 bands — 2 rows/band — the per-pair miss
    probability is (1−J²)¹⁶ ≤ 8e-8 at J = 0.8 and ~3e-12 at J ≥ 0.9,
    the corpus's true near-dup range, and the seeded hash family makes
    the result deterministic), so a relational shingle self-join
    reproduces the output exactly."""
    from kevinlang_spark.operators.dedup import minhash_dedup_pairs

    docs = _t(spark, sf_dir, "documents")
    return minhash_dedup_pairs(docs, threshold=0.8)


def q_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs (Hamming ≤ 3, pigeonhole blocking).

    Uses the md5-derived 60-bit token-hash family so the full sketch —
    per-token hash bits, majority vote, Hamming distance — is replicable
    in the DuckDB oracle (md5 hex output is engine-independent; Spark's
    xxhash64 is not).  The pigeonhole candidate generation is exact for
    max_hamming < blocks, so candidates→verify equals the oracle's
    all-pairs Hamming filter."""
    from kevinlang_spark.operators.dedup import md5_token_hash, simhash_neardup_pairs

    return simhash_neardup_pairs(
        _t(spark, sf_dir, "documents"), max_hamming=3, hash_expr=md5_token_hash
    )


def q_neardup_components(spark, sf_dir):
    """Connected components of the near-dup pair graph (min-id labels).

    Distributed min-label propagation over the verified MinHash pairs —
    one key-shuffle join + partial-min agg per round, converging in
    O(component diameter) rounds (near-dup clusters are near-cliques, so
    2-3 rounds).  Oracle-checkable because the pair set equals the exact
    shingle-Jaccard pairs (see q_minhash_pairs) and the component
    labeling is reproduced in DuckDB with a recursive transitive-closure
    CTE."""
    from kevinlang_spark.operators.dedup import minhash_dedup_pairs, neardup_components

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_dedup_pairs(docs, threshold=0.8)
    return neardup_components(pairs)


def q_dedup_representatives(spark, sf_dir):
    """Corpus minus near-duplicates: keep the min-id representative of
    every near-dup component plus all unpaired docs (the end-to-end
    fuzzy-dedup sink a training-data pipeline feeds downstream).  One
    components run + an anti-join of the victim list."""
    from kevinlang_spark.operators.dedup import (
        dedup_keep_representatives,
        minhash_dedup_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_dedup_pairs(docs, threshold=0.8)
    return dedup_keep_representatives(docs, pairs).select(
        "doc_id", "source", "n_chars"
    )


def q_dedup_longest(spark, sf_dir):
    """Quality-aware fuzzy dedup: keep the LONGEST member of every
    near-dup component (deterministic (n_chars, -id) election) — the
    curation policy that preserves the best variant instead of an
    arbitrary one."""
    from kevinlang_spark.operators.dedup import (
        dedup_keep_representatives,
        minhash_dedup_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_dedup_pairs(docs, threshold=0.8)
    return dedup_keep_representatives(docs, pairs, rep_by="n_chars").select(
        "doc_id", "source", "n_chars"
    )


def _query_vec(spark, sf_dir, vec_id: int = 0):
    emb = _t(spark, sf_dir, "embeddings")
    return [
        float(v)
        for v in emb.where(F.col("vec_id") == vec_id).first()["embedding"]
    ]


def q_knn_cosine(spark, sf_dir):
    """Exact cosine top-10 to the vec_id=0 embedding (brute-force baseline,
    TakeOrderedAndProject merge)."""
    from kevinlang_spark.operators.similarity import cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    return cosine_topk(emb, _query_vec(spark, sf_dir), k=10).select(
        "vec_id", F.round("sim", 4).alias("sim")
    )


def q_ann_lsh(spark, sf_dir):
    """Top-10 via hyperplane-LSH bucket probing, run at EXHAUSTIVE probe
    radius (probe_hamming = n_planes ⇒ every bucket probed ⇒ recall 1)
    so the output equals the exact top-k and the DuckDB oracle can check
    it.  The full signature/bucket/multiprobe machinery still executes;
    the PRUNED configuration (probe_hamming=1, ~9/256 of buckets) is
    exercised by the recall/scan-fraction tests and benched separately."""
    from kevinlang_spark.operators.similarity import ann_topk_lsh

    emb = _t(spark, sf_dir, "embeddings")
    return ann_topk_lsh(
        emb, _query_vec(spark, sf_dir, vec_id=1), k=10, n_planes=8, probe_hamming=8
    ).select("vec_id", F.round("sim", 4).alias("sim"))


def q_winnow_fingerprints(spark, sf_dir):
    """Rolling-hash document fingerprinting via winnowing (Schleimer et
    al. SIGMOD 2003, text.py winnow_fingerprints): min-hash of each
    sliding window over char-5-gram hashes, distinct per doc.  Output is
    the per-doc summary (fingerprint count, min fingerprint, and an
    exact mod-sum checksum over the set) so the oracle compares the
    full fingerprint SET without exploding millions of rows."""
    from kevinlang_spark.operators.text import winnow_fingerprints

    # repartition: the test table is ONE parquet file → one scan task;
    # spreading the (id, text) rows costs a ~MB shuffle and buys 32-way
    # parallelism for the per-row hash algebra.  Real corpora have many
    # input files and skip this.
    wf = winnow_fingerprints(
        _t(spark, sf_dir, "documents").repartition(32), k=5, window=4
    )
    return wf.select(
        F.col("id").alias("doc_id"),
        "n_grams",
        F.size("fps").cast("bigint").alias("n_fps"),
        F.array_min("fps").alias("fp_min"),
        F.aggregate(
            "fps", F.lit(0).cast("bigint"), lambda a, x: a + x % 1000003
        ).alias("fp_checksum"),
    )


def q_token_pmi(spark, sf_dir):
    """Token-pair collocation mining: PMI over the top-50-document-
    frequency vocabulary, pairs generated in-row from vocab-bounded
    per-doc token sets (no self-join), one bounded pair-key shuffle
    (text.py token_pmi)."""
    from kevinlang_spark.operators.text import token_pmi

    return token_pmi(
        _t(spark, sf_dir, "documents"), vocab_size=50, min_pair_docs=5
    )


def _lsh_index_path(spark, sf_dir):
    """Build (once per sf_dir per machine) and return the persisted
    bucket-partitioned hyperplane-LSH index for the embeddings table —
    the executable 100 TB form where a probe prunes whole partition
    directories at the file index (similarity.py build_lsh_index)."""
    import os

    path = _artifact_path(
        sf_dir, "lsh_idx", "kevinlang_spark/operators/similarity.py"
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from kevinlang_spark.operators.similarity import build_lsh_index

        build_lsh_index(
            _t(spark, sf_dir, "embeddings"), path, n_planes=8, seed=7
        )
    return path


def q_ann_lsh_indexed(spark, sf_dir):
    """Top-10 through the PERSISTED LSH index: write-once bucket-
    partitioned table, then probe at exhaustive radius (recall 1) so the
    output equals the exact top-k and the oracle can check it.  The
    whole index lifecycle executes — partitioned write, partition
    discovery, bucket-filtered read; the PRUNED configuration is
    q_ann_probe_pruned and the file-pruning assertion lives in
    tests/test_sinks.py."""
    from kevinlang_spark.operators.similarity import ann_topk_lsh_indexed

    return ann_topk_lsh_indexed(
        spark,
        _lsh_index_path(spark, sf_dir),
        _query_vec(spark, sf_dir, vec_id=1),
        k=10,
        n_planes=8,
        probe_hamming=8,
    ).select("vec_id", F.round("sim", 4).alias("sim"))


def q_ann_probe_pruned(spark, sf_dir):
    """The production ANN probe shape: 1-bit multiprobe against the
    persisted index — reads ~9/256 of the partition directories (file-
    level pruning, asserted by tests/test_sinks.py via inputFiles
    counts).  Approximate vs the EXACT top-k, but fully deterministic:
    the hyperplanes come from ``random.Random(7)`` alone, so the oracle
    (``_ann_probe_oracle_sql``) embeds the same plane constants as SQL
    literals, recomputes every vector's bucket and the query's bucket in
    DuckDB, keeps rows with Hamming distance <= 1, and takes the same
    cosine top-10 — an exact value oracle for the pruned probe."""
    from kevinlang_spark.operators.similarity import ann_topk_lsh_indexed

    return ann_topk_lsh_indexed(
        spark,
        _lsh_index_path(spark, sf_dir),
        _query_vec(spark, sf_dir, vec_id=1),
        k=10,
        n_planes=8,
        probe_hamming=1,
    ).select("vec_id", F.round("sim", 4).alias("sim"))


def q_asof_join(spark, sf_dir):
    """As-of join: each purchase event attached to the user's latest click
    at-or-before it (union+window, one key shuffle — merge-asof semantics,
    matching DuckDB's native ASOF JOIN)."""
    from kevinlang_spark.operators.joins import asof_join
    ev = _events(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    out = asof_join(purchases, clicks, on="user_id", right_cols=["click_id"])
    return out.select(
        "event_id", "user_id", F.unix_timestamp("ts").alias("ts_s"), "click_id"
    )


def q_range_join(spark, sf_dir):
    """Range join: count events of the same user in the 10 minutes before
    each error event (equi key + time-range predicate → shuffled hash join,
    never a nested loop)."""
    ev = _events(spark, sf_dir)
    errors = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), F.col("user_id"), F.col("ts").alias("err_ts")
    )
    all_ev = ev.select("user_id", F.col("ts").alias("ev_ts"))
    out = (
        errors.join(all_ev, "user_id")
        .where(
            (F.col("ev_ts") >= F.col("err_ts") - F.expr("INTERVAL 10 MINUTES"))
            & (F.col("ev_ts") < F.col("err_ts"))
        )
        .groupBy("err_id")
        .agg(F.count("*").alias("n_before"))
    )
    return out


def q_rollup(spark, sf_dir):
    """ROLLUP aggregation (subtotals + grand total) — absent in the
    reference, native in Spark/SQL."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
    )


def q_json_extract(spark, sf_dir):
    """JSON scalar extraction from the events props column."""
    ev = _events(spark, sf_dir)
    return (
        ev.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        )
        .groupBy("event_type")
        .agg(F.round(F.avg("k"), 4).alias("avg_k"), F.count("k").alias("n"))
    )


def q_median(spark, sf_dir):
    """Median aggregator (numeric, exact) per group."""
    orders = _kf(spark, sf_dir, "orders")
    out = orders.groupby("o_orderstatus").aggregate(
        "median", "o_totalprice", alias="med_price"
    )
    return out.to_df().select(
        "o_orderstatus", F.round("med_price", 2).alias("med_price")
    )


def q_set_ops(spark, sf_dir):
    """INTERSECT via the engine's set ops: customers with a positive
    balance who also placed a >400k order."""
    cust = _kf(spark, sf_dir, "customer")
    orders = _kf(spark, sf_dir, "orders")
    rich = cust.filter(F.col("c_acctbal") > 0).select(["c_custkey"])
    big = (
        orders.filter(F.col("o_totalprice") > 400000)
        .with_column("c_custkey", F.col("o_custkey"))
        .select(["c_custkey"])
    )
    return rich.intersect(big).to_df()


def q_date_parts(spark, sf_dir):
    """Date/time scalar functions: order volume by year and month."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m")
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("volume"),
        )
    )


def _curated_docs(spark, sf_dir, extra_cols=()):
    """Shared curation gate: quality + language filter and exact-dedup
    fingerprint, with ``extra_cols`` carried through so composed queries
    never rescan documents.  Returns the deduped survivor frame
    (doc_id, quality, *extra_cols)."""
    from kevinlang_spark.operators.text import fingerprint, lang_id, quality_score
    from kevinlang_spark.operators.util import spread

    # small corpora arrive as one parquet partition; the scoring pass is
    # the expensive part, so spread it across all cores first
    from kevinlang_spark.functions.textexpr import tokenize

    docs = spread(_t(spark, sf_dir, "documents"))
    t = F.col("text")
    # tokenize ONCE into a column: lang_id + the quality features would
    # otherwise each re-split the text (lambda-bearing expressions defeat
    # Catalyst CSE, and CollapseProject keeps a multiply-referenced
    # non-cheap alias materialized in its own projection)
    toked = docs.select("doc_id", *extra_cols, "text", tokenize(t).alias("__toks"))
    tk = F.col("__toks")
    # raw (unrounded) score: both engines then hold the IDENTICAL binary
    # double, so the 0.5 gate and the output hash cannot diverge
    scored = toked.select(
        "doc_id",
        *extra_cols,
        lang_id(t, toks=tk).alias("lang_pred"),
        quality_score(t, rounded=False, toks=tk).alias("quality"),
        fingerprint(t).alias("fp"),
    ).where((F.col("quality") >= 0.5) & (F.col("lang_pred") == "en"))
    # min-id representative per fingerprint in ONE shuffle: min_by carries
    # the whole row, so no join-back (and no materialization) is needed —
    # partial min_by aggregates map-side like any min
    rep = F.min_by(
        F.struct("doc_id", "quality", *extra_cols), F.col("doc_id")
    ).alias("r")
    return scored.groupBy("fp").agg(rep).select("r.*")


def q_corpus_filter(spark, sf_dir):
    """End-to-end training-data curation (the C4-style shape): quality
    score + language gate + exact dedup (keep the min-id representative),
    emitting the surviving document ids with their stats.

    One narrow stats pass → one dedup groupBy → one semi join; at 100 TB
    each stage is a single shuffle-or-less.
    """
    return _curated_docs(spark, sf_dir)


def q_curation_chunks(spark, sf_dir):
    """Full curation pipeline, end to end: quality + language gate →
    exact-dedup representatives (q_corpus_filter's stages) → 64-token
    chunking → per-source chunk/token totals.  The oracle cross-checks
    the real chunk explosion against the closed form (Σ ceil(n/64),
    Σ n), so a chunking off-by-one anywhere in the pipeline flips the
    hash.  Every stage is scan-stage work or a single key shuffle."""
    from kevinlang_spark.operators.chunking import chunk_tokens

    kept = _curated_docs(spark, sf_dir, extra_cols=("source", "text"))
    chunks = chunk_tokens(kept, chunk_size=64, keep_cols=("source",))
    return chunks.groupBy("source").agg(
        F.count("*").alias("n_chunks"),
        F.sum("chunk_tokens").alias("total_tokens"),
    )


def q_explode_tokens(spark, sf_dir):
    """Table-generating explode (UDTF-shape): corpus-wide token frequencies,
    top 20 — the classic wordcount, one explode + one aggregation."""
    from kevinlang_spark.functions.textexpr import tokenize

    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokenize(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("tok").asc())
        .limit(20)
    )


def q_corr(spark, sf_dir):
    """Pearson correlation per group (statistical aggregate)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price")
    )


def q_quantiles(spark, sf_dir):
    """Exact percentiles per group (Spark `percentile` ≡ SQL interpolated
    quantile_cont)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", 0.25).alias("p25"),
        F.percentile("l_extendedprice", 0.5).alias("p50"),
        F.percentile("l_extendedprice", 0.75).alias("p75"),
    )


def q_tpch_q10(spark, sf_dir):
    """Returned-item reporting: 4-way join, revenue by customer, top 20."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


def q_argmax(spark, sf_dir):
    """Arg-max/arg-min per group with DETERMINISTIC tie resolution
    (max_by/arg_max are nondeterministic on shared extremes): window-rank
    by (price, orderkey) and take rank 1 on both ends."""
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    w_max = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    w_min = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("__rmax", F.row_number().over(w_max))
        .withColumn("__rmin", F.row_number().over(w_min))
        .groupBy("o_orderstatus")
        .agg(
            F.max(F.when(F.col("__rmax") == 1, F.col("o_orderkey"))).alias("max_order"),
            F.max(F.when(F.col("__rmin") == 1, F.col("o_orderkey"))).alias("min_order"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )


def q_ann_ivf(spark, sf_dir):
    """Top-10 via IVF (k-means coarse quantizer), run at EXHAUSTIVE probe
    (nprobe = nlist ⇒ every cell scanned ⇒ recall 1 regardless of k-means
    convergence) so the output equals the exact top-k and the DuckDB
    oracle can check it.  Training, cell assignment, and centroid-ranked
    probing still execute; the pruned nprobe<nlist configuration is
    exercised by the recall/scan-fraction tests and benched separately."""
    from kevinlang_spark.operators.similarity import ivf_index, ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    assigned, centroids = ivf_index(emb, nlist=16)
    return ivf_topk(
        assigned, centroids, _query_vec(spark, sf_dir, vec_id=2), k=10, nprobe=16
    ).select("vec_id", F.round("sim", 4).alias("sim"))


def q_transform_zscore(spark, sf_dir):
    """Grouped transform (reference's open 'aggregate vs transform'
    question, Spec.lhs:119): every order tagged with its status-group mean
    and deviation — a window aggregate, rows keep identity."""
    orders = _kf(spark, sf_dir, "orders")
    out = (
        orders.groupby("o_orderstatus")
        .transform_grouped("mean", "o_totalprice", alias="grp_mean")
        .transform_grouped("sd", "o_totalprice", alias="grp_sd")
    )
    return out.to_df().select(
        "o_orderkey",
        "o_orderstatus",
        F.round("grp_mean", 2).alias("grp_mean"),
        F.round(
            (F.col("o_totalprice") - F.col("grp_mean")) / F.col("grp_sd"), 4
        ).alias("z"),
    )


def q_emb_neardup_brute(spark, sf_dir):
    """Embedding-cosine near-dup pairs, brute-force baseline on a bounded
    subset (the LSH-bucketed variant scales; this is its exact oracle twin).
    Uniform-random vectors top out near cos 0.5, so the threshold is 0.35."""
    from kevinlang_spark.functions.vectors import cosine_similarity

    emb = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 300)
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("sim", F.round(cosine_similarity(F.col("va"), F.col("vb")), 4))
        .where(F.col("sim") >= 0.35)
        .select("id_a", "id_b", "sim")
    )


def q_multimodal_features(spark, sf_dir):
    """Binary media column → mapInPandas feature extraction (decode stubbed
    deterministically, so the whole pipeline is oracle-checkable)."""
    from kevinlang_spark.operators.multimodal import (
        attach_fake_media,
        extract_media_features,
    )

    media = attach_fake_media(_t(spark, sf_dir, "documents"))
    return extract_media_features(media)


def q_repetition_stats(spark, sf_dir):
    """Gopher-style repetition profile per document: non-empty line count,
    duplicate-line fraction (pure scan-stage expressions) and top-bigram
    occupancy (relational explode→count→max/sum, two key-shuffles with
    map-side partial agg)."""
    from kevinlang_spark.operators.text import repetition_stats

    return repetition_stats(_t(spark, sf_dir, "documents"))


def q_hash_split(spark, sf_dir):
    """Deterministic train/val/test assignment + 25% subsample flag from
    the md5 hash of the id — a pure per-row expression (no rand(), no
    shuffle): the split is a property of the document, reproducible
    across runs, engines, and cluster sizes."""
    from kevinlang_spark.operators.sampling import hash_bucket, hash_split

    docs = hash_split(_t(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        "split",
        (hash_bucket(F.col("doc_id")) < 2500).alias("in_sample"),
    )


def q_knn_join(spark, sf_dir):
    """Batch exact k-NN join: top-10 cosine neighbors for every probe
    vector (vec_id < 4).  The probe set broadcasts, scoring is pure
    codegen inside the scan stage, and only per-query ranking shuffles."""
    from kevinlang_spark.operators.similarity import knn_join

    emb = _t(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id") < 4)
    out = knn_join(emb, probes, k=10)
    return out.select("qid", "vec_id", F.round("sim", 4).alias("sim"), "rank")


def q_contamination(spark, sf_dir):
    """Benchmark decontamination: corpus docs sharing ≥1 word 8-gram with
    the probe set (doc_id < 50), with the distinct shared-gram count.  The
    probe gram set broadcasts; the corpus check runs in the scan stage."""
    from kevinlang_spark.operators.text import ngram_contamination

    docs = _t(spark, sf_dir, "documents")
    return ngram_contamination(docs, docs.where(F.col("doc_id") < 50), n=8)


def q_stratified_sample(spark, sf_dir):
    """Exactly-10-per-source deterministic sample: rank by content hash
    inside each stratum, keep the first 10.  Same rows on every run and
    engine; one strata shuffle, windows bounded per stratum."""
    from kevinlang_spark.operators.sampling import stratified_sample

    docs = _t(spark, sf_dir, "documents")
    out = stratified_sample(docs, ("source",), 10)
    return out.select("doc_id", "source")


def q_quantize_embeddings(spark, sf_dir):
    """Symmetric int8 scalar quantization of the embedding table — the
    float32→int8 storage lever (4×) for 100 TB vector stores.  Pure
    codegen (floor-based rounding is engine-exact); scan-stage, no
    shuffle.  Codes are emitted as a comma-joined string (not
    array<int>) because the driver's pandas canonicalizer cannot hash
    list cells (CORRECTNESS_r06 `err`); int→string is engine-exact so
    nothing is lost to the serialization."""
    from kevinlang_spark.functions.vectors import quantize_int8

    emb = _t(spark, sf_dir, "embeddings")
    codes, scale = quantize_int8(F.col("embedding"))
    return emb.select(
        "vec_id",
        F.concat_ws(",", codes.cast("array<string>")).alias("codes"),
        F.round(scale, 6).alias("scale"),
    )


def q_token_estimate(spark, sf_dir):
    """Corpus token budgeting: whitespace-ish token count (split-based)
    next to the BPE-ish pretokenizer estimate (regexp_count — no arrays
    materialized).  Both pure scan-stage expressions."""
    from kevinlang_spark.functions.textexpr import bpe_ish_token_count, token_count

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_ws_tokens"),
        bpe_ish_token_count(F.col("text")).alias("n_bpe_tokens"),
    )


def q_click_attribution(spark, sf_dir):
    """View→click attribution pairs (same user, click within 24 h of the
    view) — the batch face of the stream-stream interval join
    (streaming/joins.py; parity proven in test_stream_join.py).  Equi-join
    on user_id with the time range as a residual filter — one key
    shuffle, state bounded by the rate within the interval when run as
    two streams."""
    from kevinlang_spark.streaming.joins import attribute_clicks

    return attribute_clicks(_events(spark, sf_dir), within="24 hours")


def q_chunk_tokens(spark, sf_dir):
    """Fixed-size token-window chunking (the pre-tokenization shaping
    step): one row per 32-token chunk with its text and token count.
    sequence+slice+posexplode — narrow, no shuffle, no UDF."""
    from kevinlang_spark.operators.chunking import chunk_tokens

    return chunk_tokens(_t(spark, sf_dir, "documents"), chunk_size=32)


def q_clean_lines(spark, sf_dir):
    """C4-style line-level cleaning over a deterministic multi-line view
    (the synthetic docs are single-line, so ' table ' is rewritten to a
    newline identically on both engines first): keep trimmed lines with
    ≥5 words and no 'slow' blocklist hit.  Pure scan-stage expressions."""
    from kevinlang_spark.operators.chunking import clean_lines

    docs = _t(spark, sf_dir, "documents").withColumn(
        "text", F.replace(F.col("text"), F.lit(" table "), F.lit("\n"))
    )
    return clean_lines(docs, min_words=5, blocklist=("slow",))


def q_pack_sequences(spark, sf_dir):
    """Concat-and-split sequence packing: per (source, shard) stream in
    doc-id order, cut every 512 tokens; each doc maps to the sequence its
    first token lands in.  One shuffle; shard = id % 4 bounds every
    window partition (raise shard count at scale)."""
    from kevinlang_spark.operators.chunking import pack_sequences

    return pack_sequences(
        _t(spark, sf_dir, "documents"), max_tokens=512, n_shards=4
    )


def q_fim_transform(spark, sf_dir):
    """Fill-in-the-middle corpus transformation (operators/text.py
    fim_transform — Bavarian et al. 2022): half the documents rewrite
    as the PSM ordering <PRE>prefix<SUF>suffix<MID>middle with both cut
    points derived from 52-bit md5 prefixes (the engine-portable
    no-rand() bridge), the rest pass through.  One scan-stage Catalyst
    projection, zero shuffle, zero Python — the map-only rewrite shape
    a code-LLM data pipeline runs at full-corpus scale.  The oracle
    replays selection, cuts, and the reassembly character-for-
    character."""
    from kevinlang_spark.operators.text import fim_transform

    return fim_transform(
        _t(spark, sf_dir, "documents"), rate=0.5
    )


def q_bitext_mine(spark, sf_dir):
    """Margin-based bitext mining (similarity.py bitext_mine — the
    LASER/CCMatrix parallel-data recipe): odd-id embeddings play the
    source language (8 bounded probes), even-id the target pool; each
    probe's best target is accepted only when cos(best) stands out
    from the mean of its 8-NN — the hubness-robust margin criterion.
    knn_join's broadcast-probe scan + ONE keyed agg; similarities
    quantize to 1e-6 integers so the margin is exact int arithmetic on
    both engines.  The oracle replays scoring, ranking, and the margin
    ratio closed-form."""
    from kevinlang_spark.operators.similarity import bitext_mine

    emb = _t(spark, sf_dir, "embeddings")
    targets = emb.where(F.col("vec_id") % 2 == 0)
    probes = emb.where((F.col("vec_id") % 2 == 1) & (F.col("vec_id") < 16))
    return bitext_mine(targets, probes, k=8, threshold=1.02)


def q_interleaved_media(spark, sf_dir):
    """Interleaved image-text sample assembly (multimodal.py
    interleave_media_slots — the MMC4/OBELICS record shape a
    multimodal trainer consumes): 1-3 deterministic image slots per
    document at md5-derived character positions, each referencing a
    media id in a shared 500-image corpus.  One map-side posexplode —
    zero shuffle, zero Python; the downstream media join is an
    ordinary key join.  The oracle replays slot counts, positions, and
    references closed-form."""
    from kevinlang_spark.operators.multimodal import interleave_media_slots

    return interleave_media_slots(_t(spark, sf_dir, "documents"))


def q_interleaved_assign(spark, sf_dir):
    """Similarity-ASSIGNED interleaved media (multimodal.py
    interleave_media_assign — the actual MMC4 recipe, arXiv:2304.06939
    §2.2, VERDICT r11 item 4): each document's 1-3 image slots get a
    context embedding (md5-bridged row of the shared embeddings
    table), its 6 candidate media get theirs, and greedy maximal
    matching in similarity order assigns each slot a UNIQUE media.
    One co-keyed equi-join + one doc-keyed agg with the in-row greedy
    fold; sims quantized to 1e-6 integer micros before ordering so
    the greedy order replays identically cross-engine.  The oracle
    unrolls the greedy rounds (3 suffice: n_slots <= 3) as windowed
    argmax + conflict-exclusion CTEs."""
    from kevinlang_spark.operators.multimodal import (
        interleave_media_assign,
        interleave_media_slots,
    )

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    raw_slots = interleave_media_slots(docs)
    svid = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"), F.lit("#sv"),
                        F.col("slot").cast("string"),
                    )
                ),
                1, 13,
            ),
            16, 10,
        ).cast("bigint")
        % 500
    )
    slots = (
        raw_slots.select("doc_id", "slot", svid.alias("vec_id"))
        .join(emb, "vec_id")
        .select("doc_id", "slot", F.col("embedding").alias("slot_vec"))
    )
    cand = docs.where(
        F.col("text").isNotNull() & (F.length("text") >= 40)
    ).select(
        "doc_id",
        F.explode(F.array(*[F.lit(j) for j in range(6)])).alias("j"),
    )
    media = (
        cand.select(
            "doc_id",
            ((F.col("doc_id") * 7 + F.col("j") * 13) % 500).alias(
                "media_id"
            ),
        )
        .distinct()
        .join(emb.withColumnRenamed("vec_id", "media_id"), "media_id")
        .select("doc_id", "media_id", F.col("embedding").alias("media_vec"))
    )
    return interleave_media_assign(slots, media)


def q_fleiss_kappa(spark, sf_dir):
    """Inter-annotator agreement per source (quality.py fleiss_kappa —
    Fleiss 1971): three deterministic md5-bridge raters assign each
    document one of four nominal categories; kappa per source is the
    QC gate before trusting LLM-judge/human labels as training signal.
    Three map-side-combinable keyed aggs; P̄ stays integer until one
    division, P̄e folds in-row over the sorted bounded category
    marginals — no float-sum-order drift anywhere.  The oracle replays
    the votes and both statistics closed-form."""
    from kevinlang_spark.operators.quality import fleiss_kappa

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    base = docs.select(
        "doc_id",
        "source",
        F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("rater_id"),
    )
    cat = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"), F.lit("#rt"),
                        F.col("rater_id").cast("string"),
                    )
                ),
                1, 13,
            ),
            16, 10,
        ).cast("bigint")
        % 4
    )
    rated = base.select(
        "source", "doc_id", "rater_id", cat.alias("category")
    )
    return fleiss_kappa(rated, n_raters=3)


def q_bt_leaderboard(spark, sf_dir):
    """Arena-style global Bradley-Terry leaderboard (preference.py
    bt_strength with ONE group — the Chatbot-Arena shape): battles
    between 12 synthetic models derive closed-form from the md5
    bridge (one per document, winner by bridge parity), and the MM
    fixed point fits all model strengths in-row over the bounded
    model census.  The single-group collect is bounded by the battle
    count per group at sf scale and by the model-pair matrix in
    production (pre-aggregate battles to (winner, loser, n) counts
    first when battles outgrow the row — here the raw battle list is
    the honest bounded input).  Oracle = the per-prompt BT oracle with
    a constant group."""
    from kevinlang_spark.operators.preference import bt_strength

    return (
        bt_strength(
            _arena_battles(spark, sf_dir), prompt_col="board",
            n_iters=2, alpha=0.5,
        )
        .withColumnRenamed("cand_id", "model_id")
        .drop("board")
    )


def _arena_battles(spark, sf_dir):
    """Shared synthetic arena fixture: one battle per document between
    12 models, pairing and winner from the md5 bridge (closed-form in
    SQL)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def h(tag):
        return F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(tag))),
                1, 13,
            ),
            16, 10,
        ).cast("bigint")

    ma = h("#ma") % 12
    mb_raw = h("#mb") % 11
    mb = F.when(mb_raw >= ma, mb_raw + 1).otherwise(mb_raw)  # mb != ma
    a_wins = h("#mw") % 2 == 0
    return docs.select(
        F.lit(0).cast("bigint").alias("board"),
        F.col("doc_id").alias("battle_id"),
        F.when(a_wins, ma).otherwise(mb).alias("winner"),
        F.when(a_wins, mb).otherwise(ma).alias("loser"),
    )


def q_bt_bootstrap(spark, sf_dir):
    """Poisson-bootstrap confidence intervals for the BT leaderboard
    (preference.py bt_bootstrap — the Chatbot-Arena error bars):
    battles enter each of 20 replicates with a DETERMINISTIC
    Poisson(1) weight (md5 uniform → inverse CDF, identical decimal
    thresholds in the oracle), each replicate refits BT in-row keyed
    by replicate id, and the per-model CI is rank-indexed over the
    sorted replicate strengths — explicit FLOOR/CEIL rank math, no
    float percentile.  The oracle nests the shared _bt_mm_sql rounds
    inside the replicate expansion and replays the rank picks."""
    from kevinlang_spark.operators.preference import bt_bootstrap

    return bt_bootstrap(_arena_battles(spark, sf_dir), n_replicates=20)


def q_winrate_matrix(spark, sf_dir):
    """Pairwise win-rate matrix with Wilson 95% intervals
    (preference.py winrate_matrix — the dashboard table next to the
    BT leaderboard): canonicalized model pairs over the same synthetic
    arena battles, one map-side-combinable keyed agg, every statistic
    a fixed-parenthesization closed form of (wins, n) so both engines
    replay the same IEEE ops."""
    from kevinlang_spark.operators.preference import winrate_matrix

    return winrate_matrix(_arena_battles(spark, sf_dir))


def q_pass_at_k(spark, sf_dir):
    """Unbiased pass@k (evals.py pass_at_k — the HumanEval estimator,
    Chen et al. 2021 eq. 1): ten md5-bridge samples per document-task
    with per-task correctness rates of 10-40%, scored at k=1 and k=5
    per source.  The binomial ratio is an in-row left-fold product
    (identical IEEE order both engines) and per-task values quantize
    to integer micros before the group average, so the rollup is an
    exact integer SUM.  One task-keyed agg + a metadata-sized
    rollup."""
    from kevinlang_spark.operators.evals import pass_at_k

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    base = docs.select(
        "doc_id", "source",
        F.explode(F.sequence(F.lit(0), F.lit(9))).alias("i"),
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"), F.lit("#ev"),
                    F.col("i").cast("string"),
                )
            ),
            1, 13,
        ),
        16, 10,
    ).cast("bigint")
    samples = base.select(
        "source", "doc_id",
        (h % 10 < F.lit(1) + F.col("doc_id") % 4).alias("correct"),
    )
    return pass_at_k(
        samples, group_col="source", task_col="doc_id",
        correct_col="correct", ks=(1, 5),
    )


def q_majority_vote(spark, sf_dir):
    """Self-consistency / majority-vote accuracy (evals.py
    majority_vote — Wang et al. 2022): five md5-bridge sampled answers
    per document-task over a 3-symbol answer space, modal answer vs a
    per-task reference, rolled up per source with the mean vote share
    (floor-quantized to micros before averaging — the exact-integer
    rollup discipline)."""
    from kevinlang_spark.operators.evals import majority_vote

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")

    def h(tag):
        return F.conv(
            F.substring(F.md5(F.concat(F.col("doc_id").cast("string"),
                                       tag)), 1, 13),
            16, 10,
        ).cast("bigint")

    base = docs.select(
        "doc_id", "source",
        F.explode(F.sequence(F.lit(0), F.lit(4))).alias("i"),
    )
    hi = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"), F.lit("#an"),
                    F.col("i").cast("string"),
                )
            ),
            1, 13,
        ),
        16, 10,
    ).cast("bigint")
    samples = base.select(
        "source", "doc_id",
        (hi % 3).alias("answer"),
        (h(F.lit("#ref")) % 3).alias("reference"),
    )
    return majority_vote(
        samples, group_col="source", task_col="doc_id",
        answer_col="answer", ref_col="reference",
    )


def q_chat_trees(spark, sf_dir):
    """Conversation-tree flattening (text.py conversation_paths — the
    OASST/ShareGPT message-tree shape, arXiv:2304.07327): each
    document becomes a 7-message tree whose parent pointers derive
    from the md5 bridge (parent of message k is among messages < k, so
    the synthesis is always a rooted tree), and every leaf emits its
    root-to-leaf linearized thread.  One conversation-keyed agg; the
    upward walks run in-row over the bounded message set.  The oracle
    walks DOWN from the roots with a recursive CTE and anti-joins to
    the leaf set — same paths, independently derived."""
    from kevinlang_spark.operators.text import conversation_paths

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    k = F.col("k")
    base = docs.select(
        F.col("doc_id").alias("conv_id"),
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("k"),
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("conv_id").cast("string"), F.lit("#p"),
                    k.cast("string"),
                )
            ),
            1, 13,
        ),
        16, 10,
    ).cast("bigint")
    parent = F.when(k == 0, F.lit(None).cast("bigint")).otherwise(
        h % F.greatest(k.cast("bigint"), F.lit(1))
    )
    role = F.when(k % 2 == 0, F.lit("user")).otherwise(F.lit("assistant"))
    msgs = base.select(
        "conv_id",
        k.cast("bigint").alias("msg_id"),
        parent.alias("parent_id"),
        role.alias("role"),
    )
    return conversation_paths(msgs, max_depth=8)


def q_chat_tree_render(spark, sf_dir):
    """Tree-flattening WITH ChatML rendering (conversation_paths
    text_col path): the q_chat_trees message trees carry md5-positioned
    document substrings as message content, and every root-to-leaf
    thread renders to the exact ChatML training string (render_chat's
    grammar byte-for-byte; NULL-content messages skip in the rendering
    but keep their place on the path).  The oracle's recursive CTE
    accumulates the rendered string alongside the path."""
    from kevinlang_spark.operators.text import conversation_paths

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    k = F.col("k")
    base = docs.select(
        F.col("doc_id").alias("conv_id"),
        "text",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("k"),
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("conv_id").cast("string"), F.lit("#p"),
                    k.cast("string"),
                )
            ),
            1, 13,
        ),
        16, 10,
    ).cast("bigint")
    parent = F.when(k == 0, F.lit(None).cast("bigint")).otherwise(
        h % F.greatest(k.cast("bigint"), F.lit(1))
    )
    role = F.when(k % 2 == 0, F.lit("user")).otherwise(F.lit("assistant"))
    msgs = base.select(
        "conv_id",
        k.cast("bigint").alias("msg_id"),
        parent.alias("parent_id"),
        role.alias("role"),
        F.col("text").substr(k * 7 + 1, F.lit(24)).alias("content"),
    )
    return conversation_paths(msgs, max_depth=8, text_col="content")


def q_tokenizer_fertility(spark, sf_dir):
    """Tokenizer fertility per source (text.py bpe_fertility): train
    the 8-merge BPE table on the corpus, then per source — BPE tokens
    per word and chars per token, the tokenizer-efficiency numbers a
    mixing recipe reads before fixing sampling weights (fertility
    varies 2-4x across languages/domains and the budget bills in
    tokens).  Vocabulary-scale encode + one word-keyed join + one
    group agg; the oracle retrains the merges and replays the census
    closed-form."""
    from kevinlang_spark.operators.text import bpe_fertility, bpe_train_local

    docs = _t(spark, sf_dir, "documents")
    # local trainer (r12): byte-identical merges (pytest parity gate),
    # one wordcount collect instead of 8 driver-sequential argmax jobs
    merges = bpe_train_local(docs, n_merges=8)
    return bpe_fertility(docs, merges)


def q_span_corruption(spark, sf_dir):
    """T5-style span-corruption denoising (operators/text.py
    span_corruption — Raffel et al. 2020 §3.3.4, UL2's R-denoiser):
    two deterministic non-overlapping character spans per document
    replace with <extra_id_k> sentinels, emitting the (inputs,
    targets) pair an encoder-decoder trains on — the denoising
    counterpart of the FIM family.  Span starts/lengths derive from
    the 52-bit md5 bridge (first-half/second-half placement makes
    non-overlap structural); short/NULL docs pass through
    uncorrupted.  Zero shuffle, zero Python — a map-only rewrite; the
    oracle replays placement and both reassemblies byte-for-byte."""
    from kevinlang_spark.operators.text import span_corruption

    return span_corruption(_t(spark, sf_dir, "documents"))


def q_epoch_shuffle(spark, sf_dir):
    """Deterministic per-epoch shuffle keys (sampling.py
    epoch_shuffle_keys): the data-loader permutation for 3-epoch
    training as a property of (document, epoch) — md5-derived keys
    reproduce the same order on any cluster size or restart, and each
    epoch's order is independent, which rand(seed+epoch) pipelines
    lose when partitioning changes.  One map-side posexplode, zero
    shuffle; closed-form oracle."""
    from kevinlang_spark.operators.sampling import epoch_shuffle_keys

    return epoch_shuffle_keys(
        _t(spark, sf_dir, "documents").select("doc_id"), n_epochs=3
    )


def q_retention_curve(spark, sf_dir):
    """Quality-vs-quantity retention curve (text.py
    quality_retention_curve): rank documents by a deterministic
    quality score, cut rank space into 10 equal-population bins, and
    report each bin's document count, token mass, and cumulative token
    budget — the keep-top-X% decision table.  The equidepth shape: the
    corpus collapses to the bounded per-score grid before any
    cumulative walk, ties resolve by integer rank math identically on
    both engines, and the 1-row total broadcasts (whitelisted scalar
    BNLJ)."""
    from kevinlang_spark.functions.textexpr import token_count
    from kevinlang_spark.operators.text import quality_retention_curve

    docs = (
        _t(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select(
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.col("doc_id").cast("string"),
                                       F.lit("#q"))),
                        1, 13,
                    ),
                    16, 10,
                ).cast("bigint")
                % 10000
            ).alias("score"),
            token_count(F.col("text")).alias("n_tokens"),
        )
    )
    return quality_retention_curve(docs, n_bins=10)


def q_length_buckets(spark, sf_dir):
    """Length-bucketed batch planning (text.py length_bucket_batches):
    power-of-two length buckets over word-token counts, per-bucket
    batch sizes under a 4096-token budget, and the bucket-ceiling
    padding census — the dynamic-batching report that replaces
    global-max padding (30-60% compute waste on variable-length
    corpora).  One scan-stage bucket expression + one
    map-side-combinable agg; the oracle replays the integer bit-length
    bucket edges (ceil(log2(n)) = length(bin(n-1)) — no float log2,
    ADVICE r11) and the integer batch math."""
    from kevinlang_spark.functions.textexpr import token_count
    from kevinlang_spark.operators.text import length_bucket_batches

    docs = (
        _t(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select(token_count(F.col("text")).alias("n_tokens"))
    )
    return length_bucket_batches(docs, token_budget=4096)


def q_packing_report(spark, sf_dir):
    """Packing-efficiency report (operators/text.py packing_report):
    per (source, shard) stream — sequences produced by concat-and-
    split at a 128-token budget, tail-sequence fill, and what
    pad-per-doc / truncate-at-budget would have wasted instead; the
    closed-form census a pipeline owner reads before buying compute.
    ONE map-side-combinable aggregation: every output derives from the
    stream's token total and per-doc counts — no window, no
    per-sequence explode, the 100 TB report shape.  The oracle replays
    the integer math exactly; tail_fill_ratio ships as the raw dyadic
    double (total/2^k can sit on a half-way decimal where the two
    engines' ROUND disagree)."""
    from kevinlang_spark.functions.textexpr import token_count
    from kevinlang_spark.operators.text import packing_report

    docs = (
        _t(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select(
            "doc_id", "source", token_count(F.col("text")).alias("n_tokens")
        )
    )
    return packing_report(docs, max_tokens=128)


def q_packed_spans(spark, sf_dir):
    """Packed-sequence loss-mask positions — the LAST coordinate
    transform before the collator: render the 3-turn ChatML
    conversation (q_chat_template's fixture), measure each document's
    rendered length and its assistant span in PLAIN word tokens
    (chat_token_spans unit='word' — zero-shuffle), pack documents into
    128-token sequences per (source, shard) stream
    (chunking.py pack_sequences_with_offsets, one window shuffle), and
    emit each span's (sequence, position) coordinates on both ends
    plus whether it CROSSES a sequence boundary (the spans a trainer
    must split or drop).  Word-unit spans compose exactly with
    word-budget packing because both bill in the same tokenizer; the
    oracle replays rendering, span algebra, the packing cumsum, and
    the coordinate change closed-form."""
    from kevinlang_spark.operators.chunking import pack_sequences_with_offsets
    from kevinlang_spark.operators.text import chat_token_spans, render_chat
    from kevinlang_spark.functions.textexpr import token_count

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    d = F.col("doc_id")
    t = F.col("text")
    convo = docs.select(
        "doc_id",
        "source",
        F.lit("You are a concise assistant.").alias("sys"),
        t.alias("user_msg"),
        F.when(
            d % 4 != 3,
            F.concat(
                F.lit("Summary "), d.cast("string"), F.lit(": "),
                t.substr(1, 80),
            ),
        ).alias("assistant_msg"),
    )
    turns = [("system", "sys"), ("user", "user_msg"),
             ("assistant", "assistant_msg")]
    rendered = render_chat(convo, turns).join(
        convo.select("doc_id", "source"), "doc_id"
    )
    pos = pack_sequences_with_offsets(
        rendered.select(
            "doc_id",
            "source",
            token_count(F.col("rendered")).alias("n_tokens"),
        ),
        max_tokens=128,
        n_shards=4,
    )
    spans = chat_token_spans(convo, turns, unit="word")
    j = spans.join(
        pos.select("id", "source", "shard", "seq_id", "stream_offset"),
        spans["doc_id"] == pos["id"],
    ).drop("id")
    gs = F.col("stream_offset") + F.col("token_start") - 1
    ge = F.col("stream_offset") + F.col("token_end") - 1
    seq_s = F.floor(gs / 128).cast("bigint")
    seq_e = F.floor(ge / 128).cast("bigint")
    return j.select(
        "doc_id",
        "source",
        "shard",
        "turn_idx",
        seq_s.alias("seq_start"),
        (gs - seq_s * 128 + 1).cast("int").alias("pos_start"),
        seq_e.alias("seq_end"),
        (ge - seq_e * 128 + 1).cast("int").alias("pos_end"),
        (seq_s != seq_e).alias("crosses"),
    )


def _preference_candidates(spark, sf_dir):
    """Shared fixture for the preference tier: every document is a
    prompt with FOUR sampled responses (posexplode), each scored by a
    deterministic integer reward — the 52-bit md5 bridge mod 1000 — so
    argmax/argmin and every margin replay closed-form in SQL."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    k = F.col("k")
    sid = F.concat(
        F.col("prompt_id").cast("string"), F.lit("#"), k.cast("string"),
        F.lit("#rw"),
    )
    reward = (
        F.conv(F.substring(F.md5(sid), 1, 13), 16, 10).cast("bigint") % 1000
    )
    return docs.select(
        F.col("doc_id").alias("prompt_id"),
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("k"),
        "text",
    ).select(
        "prompt_id",
        k.alias("cand_id"),
        F.concat(
            F.lit("Resp "), k.cast("string"), F.lit(": "),
            F.col("text").substr(k * 10 + 1, F.lit(40)),
        ).alias("response"),
        reward.alias("reward"),
    )


def _poisson1_case_sql() -> str:
    """CASE chain for the deterministic Poisson(1) inverse CDF —
    generated from the SAME constants the Spark operator uses
    (preference.POISSON1_CDF), so no transcription can drift."""
    from kevinlang_spark.operators.preference import POISSON1_CDF

    whens = " ".join(
        f"WHEN u < {v!r} THEN {k}" for k, v in enumerate(POISSON1_CDF)
    )
    return f"CASE {whens} ELSE {len(POISSON1_CDF)} END"


def _bt_mm_sql(comp_cte: str, group: str, final: str) -> str:
    """DuckDB replica of preference.bt_strength's two unrolled MM
    rounds over a (group, winner, loser) comparison CTE: same sorted
    pair/candidate arrays, same left folds (list_reduce over
    list_prepend(0.0, ...) == Spark aggregate with a 0.0 init), same
    x * (n / sum) normalization parenthesization — strengths replay
    bit-for-bit.  ``final`` is the tail SELECT with a ``{census}``
    placeholder for the shared n_comparisons/wins/strength columns."""
    mm_round = (
        "list_transform(cands, cc -> "
        "(len(list_filter(pairs, p -> p.w = cc)) + 0.5) / "
        "(list_reduce(list_prepend(0.0, list_transform("
        "list_filter(pairs, p -> p.w = cc OR p.l = cc), "
        "p -> 1.0 / (ps[list_position(cands, cc)] + "
        "ps[list_position(cands, CASE WHEN p.w = cc THEN p.l "
        "ELSE p.w END)]))), (a, b) -> a + b) "
        "+ 1.0 / (ps[list_position(cands, cc)] + 1.0))) AS raw"
    )
    norm = (
        "list_transform(raw, x -> x * (len(cands) / "
        "list_reduce(list_prepend(0.0, raw), (a, b) -> a + b))) AS ps"
    )
    census = (
        "unnest(list_transform(cands, cc -> CAST(len(list_filter("
        "pairs, p -> p.w = cc OR p.l = cc)) AS INT))) AS n_comparisons, "
        "unnest(list_transform(cands, cc -> CAST(len(list_filter("
        "pairs, p -> p.w = cc)) AS INT))) AS wins, "
        "unnest(ps) AS strength"
    )
    keep = f"{group}, pairs, cands"
    return (
        f"{comp_cte}, "
        f"g AS (SELECT {group}, list(struct_pack(w := winner, "
        f"l := loser) ORDER BY winner, loser) AS pairs "
        f"FROM comp GROUP BY {group}), "
        f"c0 AS (SELECT {group}, pairs, list_sort(list_distinct("
        "list_concat(list_transform(pairs, p -> p.w), "
        "list_transform(pairs, p -> p.l)))) AS cands FROM g), "
        "i0 AS (SELECT *, list_transform(cands, x -> 1.0) AS ps "
        "FROM c0), "
        f"i1r AS (SELECT {keep}, {mm_round} FROM i0), "
        f"i1 AS (SELECT {keep}, {norm} FROM i1r), "
        f"i2r AS (SELECT {keep}, {mm_round} FROM i1), "
        f"i2 AS (SELECT {keep}, {norm} FROM i2r) "
        + final.format(census=census)
    )


_PREFERENCE_CAND_SQL = (
    "WITH cand AS (SELECT doc_id AS prompt_id, s.g AS cand_id, "
    "'Resp ' || s.g || ': ' || substr(text, s.g * 10 + 1, 40) AS response, "
    "CAST(CONCAT('0x', substr(md5(doc_id || '#' || s.g || '#rw'), 1, 13)) "
    "AS BIGINT) % 1000 AS reward "
    "FROM documents, generate_series(0, 3) s(g))"
)


def q_dpo_pairs(spark, sf_dir):
    """DPO preference-pair assembly (operators/preference.py dpo_pairs
    — Rafailov et al. 2023): four deterministic-reward responses per
    prompt collapse to (chosen, rejected) = (argmax, argmin) with
    deterministic tie-breaks, zero-margin prompts dropped.  ONE keyed
    aggregation of struct extrema — partials combine map-side, the
    shuffle carries two structs per prompt, never the candidate
    fan-out (the 100 TB shape for an n-samples-per-prompt table).  The
    oracle replays selection and margins closed-form."""
    from kevinlang_spark.operators.preference import dpo_pairs

    return dpo_pairs(_preference_candidates(spark, sf_dir))


def q_best_of_n(spark, sf_dir):
    """Rejection sampling / best-of-n (operators/preference.py
    best_of_n — the Llama-2 RLHF data recipe): keep the top-reward
    response per prompt plus the group's selection-pressure stats.
    Same one-shuffle struct-extremum shape as q_dpo_pairs."""
    from kevinlang_spark.operators.preference import best_of_n

    return best_of_n(_preference_candidates(spark, sf_dir))


def _multiturn_convo(spark, sf_dir):
    """Shared 5-turn variable-role fixture for the Llama-3 multi-turn
    queries: system + two user/assistant exchanges, with BOTH later
    turns independently NULL by id rule (%5==2 drops the follow-up
    user turn, %3==1 drops the final assistant turn, %4==3 drops the
    FIRST assistant turn) — every skip pattern shifts the later
    offsets differently, which is exactly what the byte-parity oracle
    must reproduce."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    d = F.col("doc_id")
    t = F.col("text")
    return docs.select(
        "doc_id",
        F.lit("You are a concise assistant.").alias("sys"),
        t.alias("user_msg"),
        F.when(
            d % 4 != 3,
            F.concat(
                F.lit("Summary "), d.cast("string"), F.lit(": "),
                t.substr(1, 60),
            ),
        ).alias("assistant_msg"),
        F.when(
            d % 5 != 2,
            F.concat(F.lit("Follow-up "), d.cast("string"), F.lit("?")),
        ).alias("user_msg2"),
        F.when(
            d % 3 != 1,
            F.concat(F.lit("Done "), d.cast("string"), F.lit(".")),
        ).alias("assistant_msg2"),
    )


_MULTITURN_TURNS = [
    ("system", "sys"),
    ("user", "user_msg"),
    ("assistant", "assistant_msg"),
    ("user", "user_msg2"),
    ("assistant", "assistant_msg2"),
]


def q_reward_agreement(spark, sf_dir):
    """Reward-model agreement QC (operators/preference.py
    reward_agreement): Kendall tau-a between two deterministic scorers
    over each prompt's four candidates, plus the concordant /
    discordant / tied census — the gate before trusting an RM ensemble
    to label DPO data.  One prompt-keyed aggregation; the O(n²) pair
    walk runs in-row over the bounded candidate set (no self-join
    fan-out).  The oracle replays every pair sign via a cand_i <
    cand_j self-join."""
    from kevinlang_spark.operators.preference import reward_agreement

    cands = _preference_candidates(spark, sf_dir)
    sid2 = F.concat(
        F.col("prompt_id").cast("string"), F.lit("#"),
        F.col("cand_id").cast("string"), F.lit("#rw2"),
    )
    scored = cands.select(
        "prompt_id",
        "cand_id",
        F.col("reward").alias("reward_a"),
        (
            F.conv(F.substring(F.md5(sid2), 1, 13), 16, 10).cast("bigint")
            % 1000
        ).alias("reward_b"),
    )
    return reward_agreement(scored)


def q_bt_strength(spark, sf_dir):
    """Per-prompt Bradley-Terry strengths (operators/preference.py
    bt_strength — Hunter 2004's MM fixed point, VERDICT r11 item 5):
    pairwise comparisons derive closed-form from the deterministic
    md5-bridge rewards (all 6 candidate pairs per prompt, higher
    reward wins, ties skipped — a map-only posexplode, no self-join),
    then two MM iterations with the alpha=0.5 pseudo-match prior fit
    each candidate's strength IN-ROW over the bounded candidate set.
    Every in-row fold runs over deterministically sorted arrays so the
    float arithmetic replays in the same order — the oracle reproduces
    the strengths bit-for-bit."""
    from kevinlang_spark.operators.preference import bt_strength

    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def rw(k):
        sid = F.concat(
            F.col("prompt_id").cast("string"), F.lit("#"),
            k.cast("string"), F.lit("#rw"),
        )
        return (
            F.conv(F.substring(F.md5(sid), 1, 13), 16, 10).cast("bigint")
            % 1000
        )

    ij = F.array(
        *[
            F.struct(
                F.lit(i).cast("bigint").alias("i"),
                F.lit(j).cast("bigint").alias("j"),
            )
            for i in range(4)
            for j in range(4)
            if i < j
        ]
    )
    base = docs.select(
        F.col("doc_id").alias("prompt_id"), F.explode(ij).alias("p")
    )
    ri, rj = rw(F.col("p.i")), rw(F.col("p.j"))
    comps = base.where(ri != rj).select(
        "prompt_id",
        F.when(ri > rj, F.col("p.i")).otherwise(F.col("p.j")).alias(
            "winner"
        ),
        F.when(ri > rj, F.col("p.j")).otherwise(F.col("p.i")).alias(
            "loser"
        ),
    )
    return bt_strength(comps, n_iters=2, alpha=0.5)


def q_grpo_advantages(spark, sf_dir):
    """Group-relative advantages (operators/preference.py
    grpo_advantages — GRPO's per-prompt z-score, DeepSeekMath
    arXiv:2402.03300 §4.1, plus RLOO's leave-one-out baseline,
    arXiv:2402.14740): four deterministic integer rewards per prompt
    normalize in ONE prompt-keyed shuffle via unordered window
    aggregates; the sufficient statistics are exact integer sums so
    both engines derive every double with identical IEEE ops."""
    from kevinlang_spark.operators.preference import grpo_advantages

    return grpo_advantages(_preference_candidates(spark, sf_dir))


def q_reward_length_bias(spark, sf_dir):
    """Reward-length bias QC (operators/preference.py
    reward_length_bias — verbosity reward hacking, arXiv:2310.03716):
    per source slice (prompt_id % 8), Pearson r and OLS slope of
    reward on response char length from ONE aggregation of
    BIGINT-exact sufficient statistics; closed forms in double with
    fixed parenthesization replay across engines."""
    from kevinlang_spark.operators.preference import reward_length_bias

    cands = _preference_candidates(spark, sf_dir).select(
        (F.col("prompt_id") % 8).alias("source"), "response", "reward"
    )
    return reward_length_bias(cands)


def _powerlaw_docs(spark, sf_dir):
    """Shared fixture for the corpus power-law diagnostics: the babel
    corpus has a ~31-word vocabulary (every doc samples the same
    marker set), which makes both fits degenerate — so each doc
    appends five id-derived tokens (one unique 'u{id}', four modular
    'r/s/t/v' tokens at geometric frequencies) to mint vocabulary
    growth and a skewed frequency spectrum.  Pure string algebra,
    replayed verbatim by the oracle CTE."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    d = F.col("doc_id")
    enriched = F.concat(
        F.col("text"),
        F.lit(" u"), d.cast("string"),
        F.lit(" r"), (d % 2).cast("string"),
        F.lit(" s"), (d % 4).cast("string"),
        F.lit(" t"), (d % 8).cast("string"),
        F.lit(" v"), (d % 16).cast("string"),
    )
    return docs.where(d.isNotNull()).select(
        "doc_id", enriched.alias("text")
    )


_POWERLAW_DOCS_SQL = (
    "WITH pl AS (SELECT doc_id, text || ' u' || doc_id "
    "|| ' r' || (doc_id % 2) || ' s' || (doc_id % 4) "
    "|| ' t' || (doc_id % 8) || ' v' || (doc_id % 16) AS text "
    "FROM documents WHERE doc_id IS NOT NULL)"
)

#: shared DuckDB OLS folds over a `pts` list<struct(x,y)> column in CTE
#: `st`: left folds seeded 0.0 (== Spark aggregate init), fixed
#: parenthesization for slope/intercept/r².
_POWERLAW_OLS_SQL = (
    ", f AS (SELECT *, CAST(len(pts) AS DOUBLE) AS n, "
    "list_reduce(list_prepend(0.0, list_transform(pts, p -> p.x)), "
    "(a, b) -> a + b) AS sx, "
    "list_reduce(list_prepend(0.0, list_transform(pts, p -> p.y)), "
    "(a, b) -> a + b) AS sy, "
    "list_reduce(list_prepend(0.0, list_transform(pts, "
    "p -> p.x * p.y)), (a, b) -> a + b) AS sxy, "
    "list_reduce(list_prepend(0.0, list_transform(pts, "
    "p -> p.x * p.x)), (a, b) -> a + b) AS sxx, "
    "list_reduce(list_prepend(0.0, list_transform(pts, "
    "p -> p.y * p.y)), (a, b) -> a + b) AS syy FROM st), "
    "o AS (SELECT *, n * sxy - sx * sy AS cov_n, "
    "n * sxx - sx * sx AS vx_n, n * syy - sy * sy AS vy_n FROM f)"
)


def q_zipf_fit(spark, sf_dir):
    """Zipf's-law corpus diagnostic (operators/text.py zipf_fit): OLS
    slope/r² of log-frequency on log-rank over the top-500 words.
    Scale shape: wordcount shuffle → TakeOrderedAndProject top-k (per-
    partition heaps, never a full vocab sort) → one-row in-row fit;
    the oracle replays rank assignment and the sorted left folds."""
    from kevinlang_spark.operators.text import zipf_fit

    return zipf_fit(_powerlaw_docs(spark, sf_dir))


def q_heaps_fit(spark, sf_dir):
    """Heaps'-law vocabulary-growth diagnostic (operators/text.py
    heaps_fit): V(n) ≈ K·n^β fit over 32 id-range checkpoints — per-
    word first-occurrence min-agg + integer bucket math against the
    broadcast 1-row id bounds, cumulative curve and OLS in-row over
    the bounded bucket array.  No global ordered walk anywhere."""
    from kevinlang_spark.operators.text import heaps_fit

    return heaps_fit(_powerlaw_docs(spark, sf_dir))


#: script-census fixture snippets: (condition kind, value, snippet).
#: The corpus is pure ASCII even for lang='zh' rows, so each rule
#: appends a typed-script snippet; ONE table drives both the Spark
#: fixture and the oracle CTE (no transcription drift).  Snippets must
#: not contain single quotes (they embed in SQL literals).
_SCRIPT_SNIPPETS = [
    ("lang", "zh", " 数据处理引擎与查询计划"),
    ("lang", "de", " müßig für größere Bäche"),
    ("lang", "fr", " déjà été créé à côté"),
    ("lang", "es", " mañana el niño será"),
    ("mod7", 0, " Привет мир данных"),
    ("mod11", 3, " αβγ δέλτα σύστημα"),
    ("mod13", 5, " مرحبا بالعالم"),
]


def _script_docs(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    d = F.col("doc_id")
    ext = F.col("text")
    for kind, val, snip in _SCRIPT_SNIPPETS:
        if kind == "lang":
            cond = F.col("lang") == val
        else:
            cond = d % int(kind[3:]) == val
        ext = F.when(cond, F.concat(ext, F.lit(snip))).otherwise(ext)
    return docs.where(d.isNotNull()).select(
        "doc_id", ext.alias("text"), "lang"
    )


def _script_census_sql() -> str:
    """Oracle for q_script_census, generated from the SAME
    _SCRIPT_SNIPPETS table and text.SCRIPT_CLASSES patterns the Spark
    side uses."""
    from kevinlang_spark.operators.text import SCRIPT_CLASSES

    append = ""
    for kind, val, snip in _SCRIPT_SNIPPETS:
        if kind == "lang":
            cond = f"lang = '{val}'"
        else:
            cond = f"doc_id % {int(kind[3:])} = {val}"
        append += f" || CASE WHEN {cond} THEN '{snip}' ELSE '' END"
    counts = ", ".join(
        f"CAST(SUM(length(text) - length(regexp_replace(text, "
        f"'{pat}', '', 'g'))) AS BIGINT) AS {name}"
        for name, pat in SCRIPT_CLASSES
    )
    covered = " + ".join(name for name, _ in SCRIPT_CLASSES)
    names = ", ".join(name for name, _ in SCRIPT_CLASSES)
    return (
        f"WITH sd AS (SELECT doc_id, text{append} AS text, lang "
        "FROM documents WHERE doc_id IS NOT NULL), "
        "g AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(SUM(length(text)) AS BIGINT) AS n_chars, "
        f"{counts} FROM sd WHERE text IS NOT NULL GROUP BY lang), "
        f"o AS (SELECT lang, n_docs, n_chars, {names}, "
        f"n_chars - ({covered}) AS other FROM g) "
        f"SELECT lang, n_docs, n_chars, {names}, other, "
        "CASE WHEN n_chars > 0 THEN latin / n_chars END AS frac_latin, "
        "CASE WHEN n_chars > 0 THEN cjk / n_chars END AS frac_cjk, "
        "CASE WHEN n_chars > 0 THEN other / n_chars END AS frac_other "
        "FROM o"
    )


def q_script_census(spark, sf_dir):
    """Unicode script census (operators/text.py script_census —
    MADLAD-400-style curation audit): per lang slice, char counts per
    script class (Latin / digits / whitespace / Latin-ext / CJK /
    Cyrillic / Greek / Arabic) plus the uncovered remainder and
    Latin/CJK/other fractions.  One scan-stage regex pass per class,
    ONE keyed aggregation of BIGINT-exact sums — zero extra shuffle;
    the shared pattern table keeps both engines on the same regexes."""
    from kevinlang_spark.operators.text import script_census

    return script_census(_script_docs(spark, sf_dir))


def _mt_pairs(spark, sf_dir):
    """Shared MT-metric fixture: candidate = 300-char prefix of the
    doc plus a unique noise token, reference = the full doc — partial
    n-gram overlap with a sub-1 brevity ratio, so ROUGE/BLEU exercise
    clipping AND the brevity penalty."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.where(F.col("text").isNotNull()).select(
        "doc_id",
        F.concat(
            F.substring("text", 1, 300),
            F.lit(" zz"),
            F.col("doc_id").cast("string"),
        ).alias("candidate"),
        F.col("text").alias("reference"),
    )


_MT_PAIRS_SQL = (
    "WITH mt AS (SELECT doc_id, substr(text, 1, 300) || ' zz' || doc_id "
    "AS candidate, text AS reference FROM documents "
    "WHERE text IS NOT NULL)"
)


def q_rouge_n(spark, sf_dir):
    """ROUGE-2 per pair (operators/text.py rouge_n — Lin 2004):
    clipped bigram overlap with precision/recall/F1 from two
    (id, gram)-keyed wordcount shuffles and one join; integer sums,
    three final divisions."""
    from kevinlang_spark.operators.text import rouge_n

    return rouge_n(_mt_pairs(spark, sf_dir), n=2)


def q_corpus_bleu(spark, sf_dir):
    """Corpus BLEU-2 (operators/text.py corpus_bleu — Papineni et al.
    2002): corpus-aggregated clipped precisions + brevity penalty
    assembled from six exact integers with a fixed ln/exp sequence;
    the 1-row stat frames ride reviewed scalar crossJoins."""
    from kevinlang_spark.operators.text import corpus_bleu

    return corpus_bleu(_mt_pairs(spark, sf_dir), max_n=2)


def q_chat_multiturn(spark, sf_dir):
    """Llama-3 multi-turn SFT rendering (VERDICT r10 item 6; text.py
    render_chat fmt='llama3'): five variable-role turns — system, two
    user/assistant exchanges — assembled into the exact Llama-3 wire
    string (<|begin_of_text|> once, then <|start_header_id|>role
    <|end_header_id|>\\n\\ncontent<|eot_id|> per turn), with three
    INDEPENDENT NULL-turn id rules so every skip pattern exercises the
    offset algebra.  Zero-shuffle Catalyst projection; the oracle
    reproduces the bytes character-for-character."""
    from kevinlang_spark.operators.text import render_chat

    return render_chat(
        _multiturn_convo(spark, sf_dir), _MULTITURN_TURNS, fmt="llama3"
    )


def q_chat_multiturn_spans(spark, sf_dir):
    """Loss-mask spans over the SAME Llama-3 multi-turn rendering
    (text.py chat_loss_spans fmt='llama3'): one row per non-NULL
    assistant turn — up to TWO per document — whose [start, end] char
    interval must land exactly on the turn's content inside
    q_chat_multiturn's rendered string, past the one-time
    <|begin_of_text|> prefix and every variable skip.  The oracle
    replays the length algebra closed-form."""
    from kevinlang_spark.operators.text import chat_loss_spans

    return chat_loss_spans(
        _multiturn_convo(spark, sf_dir), _MULTITURN_TURNS, fmt="llama3"
    )


def q_fim_spm(spark, sf_dir):
    """Fill-in-the-middle in SPM ordering (text.py fim_transform
    mode='spm' — arXiv:2207.14255 appendix D's 'SPM with PSM
    sentinels', the suffix-first variant production infilling models
    ship): half the documents rewrite as
    <PRE><SUF>suffix<MID>prefix+middle with the SAME deterministic
    cuts as q_fim_transform — §3 trains on both orderings 50/50, so
    PSM alone halves the published recipe (VERDICT r10 item 5).  Same
    map-only zero-shuffle scan shape; the oracle replays the SPM
    reassembly byte-for-byte."""
    from kevinlang_spark.operators.text import fim_transform

    return fim_transform(
        _t(spark, sf_dir, "documents"), rate=0.5, mode="spm"
    )


def q_fim_context(spark, sf_dir):
    """CONTEXT-LEVEL fill-in-the-middle (text.py fim_transform_context
    — arXiv:2207.14255 §3): documents split into 256-char training
    contexts first, then FIM applies independently per context at an
    exact 35% rate (hashes salted on id#chunk), so both cut points
    always land inside one context — the boundary-aware property
    document-level FIM loses when the packer slices a rewritten doc
    mid-sentinel.  One map-side posexplode + the scan-stage rewrite:
    zero shuffle, zero Python; the oracle replays chunking, selection,
    cuts, and reassembly byte-for-byte."""
    from kevinlang_spark.operators.text import fim_transform_context

    return fim_transform_context(
        _t(spark, sf_dir, "documents"), chunk_chars=256, rate=0.35,
        mode="psm",
    )


def q_code_stats(spark, sf_dir):
    """Code-corpus curation gate (operators/text.py code_stats — The
    Stack / StarCoder file filters): documents salted with
    deterministic license headers (SPDX tag / MIT / autogen marker) and
    an over-long trailing line by id rule, then line-shape, content,
    license-detection, and generated-file statistics in ONE
    zero-shuffle Catalyst projection; every output is an exact integer
    or string so the Stack gate math (max-line, avg-line, ≥25%
    alphanumeric) carries no float anywhere.  The oracle replays the
    salting and every statistic in SQL."""
    from kevinlang_spark.operators.text import code_stats

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    d = F.col("doc_id")
    t = F.col("text")
    salted = (
        F.when(
            d % 5 == 0,
            F.concat(F.lit("// SPDX-License-Identifier: Apache-2.0\n"), t),
        )
        .when(d % 5 == 1, F.concat(F.lit("/* MIT License */\n"), t))
        .when(
            d % 5 == 2,
            F.concat(
                F.lit("# auto-generated by codegen - DO NOT EDIT\n"), t
            ),
        )
        .when(d % 5 == 4, F.concat(t, F.lit("\n" + "x" * 1101)))
        .otherwise(t)
    )
    return code_stats(docs.select("doc_id", salted.alias("text")))


def q_encoding_quality(spark, sf_dir):
    """UTF-8 hygiene gate (operators/text.py encoding_quality): the
    corpus salted with the three damage classes by id rule — a
    double-encoded mojibake marker (\u00c3\u00a9), a U+FFFD replacement
    character, a C0 control byte — then replacement/mojibake/control
    counting and the integer-math clean verdict in one zero-shuffle
    Catalyst projection.  The oracle replays the salting and every
    count with the identical literal alternation."""
    from kevinlang_spark.operators.text import encoding_quality

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    d = F.col("doc_id")
    t = F.col("text")
    salted = (
        F.when(d % 6 == 1, F.concat(t, F.lit(" caf\u00c3\u00a9")))
        .when(d % 6 == 2, F.concat(t, F.lit(" bad \ufffd byte")))
        .when(d % 6 == 3, F.concat(t, F.lit(" bell\u0007")))
        .otherwise(t)
    )
    return encoding_quality(docs.select("doc_id", salted.alias("text")))


def q_code_pipeline(spark, sf_dir):
    """Code-corpus curation END-TO-END as one declarative plan (the
    q_warc_pipeline convention for the code tier): salt documents with
    license headers / autogen markers / long lines by id rule, run The
    Stack shape+content gate (code_stats) AND the UTF-8 hygiene gate
    (encoding_quality), then a dedup-aware per-license census of the
    survivors — (license, n_files, n_unique, total_chars), fingerprint
    = md5 of the full text (the engine-portable exact-dedup key).
    Three doc_id-keyed joins of projection outputs + one grouped
    aggregation; every number replays closed-form in SQL."""
    from kevinlang_spark.operators.text import code_stats, encoding_quality

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    d = F.col("doc_id")
    t = F.col("text")
    salted = (
        F.when(
            d % 5 == 0,
            F.concat(F.lit("// SPDX-License-Identifier: Apache-2.0\n"), t),
        )
        .when(d % 5 == 1, F.concat(F.lit("/* MIT License */\n"), t))
        .when(
            d % 5 == 2,
            F.concat(
                F.lit("# auto-generated by codegen - DO NOT EDIT\n"), t
            ),
        )
        .when(d % 5 == 4, F.concat(t, F.lit("\n" + "x" * 1101)))
        .otherwise(t)
    )
    base = docs.select("doc_id", salted.alias("text"))
    stats = code_stats(base).select("doc_id", "license", "passes", "n_chars")
    enc = encoding_quality(base).select("doc_id", "clean")
    fps = base.select("doc_id", F.md5("text").alias("fp"))
    kept = (
        stats.join(enc, "doc_id")
        .join(fps, "doc_id")
        .where(F.col("passes") & F.col("clean"))
    )
    return kept.groupBy(
        F.coalesce(F.col("license"), F.lit("unlicensed")).alias("license")
    ).agg(
        F.count("*").alias("n_files"),
        F.count_distinct("fp").alias("n_unique"),
        F.sum("n_chars").alias("total_chars"),
    )


def q_chat_template(spark, sf_dir):
    """SFT chat-template rendering (operators/text.py render_chat): a
    deterministic (system, user, assistant) conversation per document —
    assistant NULL for every 4th id, exercising the skip-absent-turn
    rule — assembled into the exact ChatML training string plus turn
    and character counts, one zero-shuffle Catalyst projection.  The
    rendered bytes must reproduce character-for-character in the
    oracle: if train and eval render templates differently the model
    sees two dialects, so byte-parity IS the correctness bar."""
    from kevinlang_spark.operators.text import render_chat

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    d = F.col("doc_id")
    t = F.col("text")
    convo = docs.select(
        "doc_id",
        F.lit("You are a concise assistant.").alias("sys"),
        t.alias("user_msg"),
        F.when(
            d % 4 != 3,
            F.concat(
                F.lit("Summary "), d.cast("string"), F.lit(": "),
                t.substr(1, 80),
            ),
        ).alias("assistant_msg"),
    )
    return render_chat(
        convo,
        [("system", "sys"), ("user", "user_msg"),
         ("assistant", "assistant_msg")],
    )


def q_chat_loss_spans(spark, sf_dir):
    """SFT loss-mask spans (operators/text.py chat_loss_spans): the
    1-based character interval of each trainable (assistant) turn
    inside the SAME rendered ChatML string q_chat_template emits —
    offsets shift correctly past the skipped NULL-assistant turns (the
    classic silent SFT bug is training on prompt bytes; here the
    oracle replays the length algebra closed-form, so a one-character
    drift fails the gate)."""
    from kevinlang_spark.operators.text import chat_loss_spans

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    d = F.col("doc_id")
    t = F.col("text")
    convo = docs.select(
        "doc_id",
        F.lit("You are a concise assistant.").alias("sys"),
        t.alias("user_msg"),
        F.when(
            d % 4 != 3,
            F.concat(
                F.lit("Summary "), d.cast("string"), F.lit(": "),
                t.substr(1, 80),
            ),
        ).alias("assistant_msg"),
    )
    return chat_loss_spans(
        convo,
        [("system", "sys"), ("user", "user_msg"),
         ("assistant", "assistant_msg")],
    )


def q_chat_token_spans(spark, sf_dir):
    """TOKEN-space SFT loss masks (VERDICT r10 item 2; operators/
    text.py chat_token_spans): the [token_start, token_end] interval
    each trainable assistant turn occupies in the BPE tokenization of
    the SAME rendered ChatML string q_chat_template emits — char spans
    (q_chat_loss_spans) are not what a trainer consumes, and the
    offset-drift failure mode doubles at the token layer.  The merge
    table is TRAINED on the corpus (8 rounds, q_bpe_encode's path);
    content token counts come from the vocabulary-scale word→subtoken
    join, headers are per-role constants encoded driver-side, and the
    span arithmetic is additive because every ChatML piece boundary is
    non-alphanumeric.  The oracle retrains the merges, re-encodes the
    chat word set, and replays the offsets closed-form — a one-TOKEN
    drift anywhere fails the gate."""
    from kevinlang_spark.operators.text import bpe_train_local, chat_token_spans

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    d = F.col("doc_id")
    t = F.col("text")
    convo = docs.select(
        "doc_id",
        F.lit("You are a concise assistant.").alias("sys"),
        t.alias("user_msg"),
        F.when(
            d % 4 != 3,
            F.concat(
                F.lit("Summary "), d.cast("string"), F.lit(": "),
                t.substr(1, 80),
            ),
        ).alias("assistant_msg"),
    )
    # local trainer (r12): byte-identical merges (pytest parity gate),
    # one wordcount collect instead of 8 driver-sequential argmax jobs
    merges = bpe_train_local(_t(spark, sf_dir, "documents"), n_merges=8)
    return chat_token_spans(
        convo,
        [("system", "sys"), ("user", "user_msg"),
         ("assistant", "assistant_msg")],
        merges,
    )


#: the SHIPPED tokenizer for q_chat_token_spans_static — a fixed merge
#: table, the production contrast to q_chat_token_spans' in-query train
_STATIC_MERGES = [
    (1, "t", "h", 0), (2, "th", "e", 0), (3, "a", "n", 0),
    (4, "an", "d", 0), (5, "i", "n", 0), (6, "e", "r", 0),
]


def q_chat_token_spans_static(spark, sf_dir):
    """Token-space loss masks under a SHIPPED merge table (the
    production path SCALE.md r11 prices): same conversation fixture
    and span algebra as q_chat_token_spans, but the tokenizer is a
    fixed 6-merge table applied at vocabulary scale with NO in-query
    training — the sub-second apply shape a real SFT pipeline runs
    (train once, ship the table, tokenize forever).  The oracle
    inlines the same literal rewrites, so it is as cheap as the
    query."""
    from kevinlang_spark.operators.text import chat_token_spans

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    d = F.col("doc_id")
    t = F.col("text")
    convo = docs.select(
        "doc_id",
        F.lit("You are a concise assistant.").alias("sys"),
        t.alias("user_msg"),
        F.when(
            d % 4 != 3,
            F.concat(
                F.lit("Summary "), d.cast("string"), F.lit(": "),
                t.substr(1, 80),
            ),
        ).alias("assistant_msg"),
    )
    return chat_token_spans(
        convo,
        [("system", "sys"), ("user", "user_msg"),
         ("assistant", "assistant_msg")],
        _STATIC_MERGES,
    )


def q_salted_agg(spark, sf_dir):
    """Skew-safe two-stage aggregation (salt fans each hot key over 16
    reducers, then merges ≤16 partial rows per key).  Result is identical
    to the plain one-stage groupBy — which is exactly what the oracle
    checks."""
    from kevinlang_spark.operators.skew import salted_agg

    ev = _events(spark, sf_dir)
    out = salted_agg(
        ev,
        ["event_type"],
        {
            "n": ("count", "event_id"),
            "total_value": ("sum", "value"),
            "avg_value": ("mean", "value"),
            "max_value": ("max", "value"),
        },
    )
    return out.select(
        "event_type",
        "n",
        F.round("total_value", 2).alias("total_value"),
        F.round("avg_value", 4).alias("avg_value"),
        F.round("max_value", 4).alias("max_value"),
    )


def q_salted_join(spark, sf_dir):
    """Skew-safe salted equi join (random salt on the fact side, small side
    replicated per salt): row-identical to the plain join, checked against
    the plain-SQL oracle."""
    from kevinlang_spark.operators.skew import salted_join

    ev = _events(spark, sf_dir).select("event_id", "user_id", "event_type")
    dim = (
        _events(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.count("*").alias("user_events"))
    )
    out = salted_join(ev, dim, on="user_id", n_salts=8)
    return out.select("event_id", "user_id", "event_type", "user_events")


def q_events_sliding(spark, sf_dir):
    """Sliding 1h windows every 15 min per event type (overlapping
    windows; each event lands in exactly 4).  The oracle replicates the
    window expansion with a generate_series cross join."""
    from kevinlang_spark.streaming.windows import sliding_counts

    return sliding_counts(
        _events(spark, sf_dir), "1 hour", "15 minutes"
    ).select("window_start", "event_type", "n")


def q_resample_ffill(spark, sf_dir):
    """Per-user hourly resampling with forward fill (gap-filled grid +
    as-of value carry) — two key shuffles at any scale.  Oracle: DuckDB
    generate-series grid + native ASOF LEFT JOIN."""
    from kevinlang_spark.operators.joins import resample_ffill

    return resample_ffill(
        _events(spark, sf_dir), on="user_id", ts_col="ts", value_col="value"
    )


def q_resample_lerp(spark, sf_dir):
    """Per-user hourly resampling with LINEAR interpolation between the
    surrounding observations — one union + one key-shuffle sort carrying
    both neighbor windows."""
    from kevinlang_spark.operators.joins import resample_lerp

    return resample_lerp(
        _events(spark, sf_dir), on="user_id", ts_col="ts", value_col="value"
    )


def q_cube(spark, sf_dir):
    """CUBE aggregation over (source, lang): all 4 grouping-set levels in
    one pass (partial-agg'd, one shuffle)."""
    return (
        _t(spark, sf_dir, "documents")
        .cube("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


def q_histogram(spark, sf_dir):
    """Fixed-width histogram of lineitem extended price (5000-wide bins):
    bin assignment is a scan-stage expression, the count is one map-side
    combined shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select(F.floor(F.col("l_extendedprice") / 5000).alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias("n"))
    )


def q_redact_pii(spark, sf_dir):
    """PII scrubbing (emails / IPv4s / phones → typed placeholders) over
    documents salted with synthetic PII (the corpus itself is clean, so
    the query injects a deterministic email+IP per doc — both engines do
    the same concat).  Pure regexp_replace chain in the scan stage."""
    from kevinlang_spark.operators.text import redact_pii

    docs = _t(spark, sf_dir, "documents")
    salted = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com at 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 or +1 555-123-4567"),
    )
    red = redact_pii(salted)
    return docs.select(
        "doc_id",
        red.alias("redacted"),
        (F.length(salted) - F.length(red)).alias("chars_removed"),
    )


def q_tfidf_top_terms(spark, sf_dir):
    """Top-3 TF-IDF terms per document (doc_id < 100): term-keyed corpus
    frequency join + per-document ranking windows; nothing global."""
    from kevinlang_spark.operators.text import tfidf_top_terms

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    return tfidf_top_terms(docs, k=3)


def q_upsert(spark, sf_dir):
    """Batch MERGE/upsert (CDC apply): price-bumped updates for every
    10th order plus synthetic-key inserts for every 97th, applied to the
    orders table in ONE key shuffle (union + grouped max_by, no outer
    join)."""
    from kevinlang_spark.operators.joins import merge_upsert

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )
    # price bump as an exact IEEE add (a *1.1 + round lands on .005
    # boundaries where Spark and other engines round differently)
    upd = orders.where(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_totalprice") + 10.0).alias("o_totalprice"),
    )
    # o_orderkey > 0: key 0 would negate to itself and collide with its
    # own update row, violating merge's key-unique precondition
    ins = orders.where(
        (F.col("o_orderkey") % 97 == 0) & (F.col("o_orderkey") > 0)
    ).select(
        (-F.col("o_orderkey")).alias("o_orderkey"), "o_custkey", "o_totalprice"
    )
    return merge_upsert(orders, upd.unionByName(ins), keys=("o_orderkey",))


def q_approx_distinct(spark, sf_dir):
    """HLL++ approximate distinct fingerprints per source, with the error
    bound DRIVER-CHECKED: the query returns the exact count plus a boolean
    asserting the sketch landed within 5% — the oracle expects TRUE, so an
    out-of-bound sketch flips the value hash.  The approximate path is the
    100 TB shape (fixed-size sketch, map-side mergeable, no distinct
    shuffle); the exact count here is the verification twin."""
    from kevinlang_spark.operators.text import fingerprint

    fp = fingerprint(F.col("text"))
    return (
        _t(spark, sf_dir, "documents")
        .select("source", fp.alias("fp"))
        .groupBy("source")
        .agg(
            F.count_distinct("fp").alias("n_exact"),
            F.approx_count_distinct("fp", rsd=0.01).alias("__approx"),
        )
        .select(
            "source",
            "n_exact",
            (
                F.abs(F.col("__approx") - F.col("n_exact"))
                <= 0.05 * F.col("n_exact")
            ).alias("approx_ok"),
        )
    )


def q_weighted_sample(spark, sf_dir):
    """Deterministic weighted sample (Efraimidis–Spirakis by content
    hash), 100 docs weighted by length — per-row priority arithmetic plus
    a top-k heap merge; reruns and engines agree exactly."""
    from kevinlang_spark.operators.sampling import weighted_sample

    docs = _t(spark, sf_dir, "documents")
    return weighted_sample(docs, k=100, weight_col="n_chars").select(
        "doc_id", "source", "n_chars"
    )


def q_scd2(spark, sf_dir):
    """Type-2 SCD build from the event change log: per-user value history
    as [valid_from, valid_to) intervals with a current-row flag — ONE key
    shuffle (collapse groupBy + lead window share the hash partitioning).
    Oracle: the same collapse + LEAD window in SQL."""
    from kevinlang_spark.operators.events import scd2_build

    ev = _events(spark, sf_dir).select(
        "user_id", F.col("ts").cast("long").alias("ts_s"), "value"
    )
    return scd2_build(
        ev, key="user_id", ts_col="ts_s", value_cols=["value"]
    ).select("user_id", "valid_from", "valid_to", "value", "is_current")


def q_funnel(spark, sf_dir):
    """Ordered funnel view → click → purchase: users reaching each step
    in order.  Per-user cumulative-flag windows + one grouped reduce —
    a single key shuffle, versus the classic k-way self-join funnel."""
    from kevinlang_spark.operators.events import funnel_counts

    return funnel_counts(
        _events(spark, sf_dir), steps=["view", "click", "purchase"]
    ).select("step", "step_name", F.col("n_users").cast("long").alias("n_users"))


def q_transitions(spark, sf_dir):
    """Clickstream transition matrix (prev event type → event type, with
    counts): one lag window per user, then a map-side-combined count on
    the tiny type-pair key space."""
    from kevinlang_spark.operators.events import event_transitions

    return event_transitions(_events(spark, sf_dir))


def q_budget_sample(spark, sf_dir):
    """Mixture sampling to per-source char budgets (hash-ordered prefix
    per source until the budget fills) — how training mixtures are drawn.
    Deterministic: selection is a property of the data, not the job."""
    from kevinlang_spark.operators.sampling import budget_sample

    docs = _t(spark, sf_dir, "documents")
    budgets = {"src0": 3000, "src1": 5000, "src2": 2000}
    return budget_sample(
        docs, budgets, group_col="source", cost_col="n_chars"
    ).select("doc_id", "source", "n_chars")


def q_winsorize(spark, sf_dir):
    """Per-source winsorization of document length at the exact p05/p95
    quantiles: one percentile aggregation (tiny bounds table, broadcast
    back), clip is a scan-stage expression."""
    from kevinlang_spark.operators.stats import winsorize

    docs = _t(spark, sf_dir, "documents")
    return winsorize(docs, "n_chars", group_col="source").select(
        "doc_id",
        "source",
        "n_chars",
        F.round("n_chars_wins", 4).alias("n_chars_wins"),
    )


def q_approx_quantile(spark, sf_dir):
    """Sketch-based median per source with the error bound DRIVER-CHECKED
    (same pattern as q_approx_distinct): the query returns the exact
    median plus a boolean asserting the approx_percentile sketch landed
    within the exact p45–p55 value band — the oracle expects TRUE.  The
    sketch path is the 100 TB shape (fixed-size state, mergeable, no
    per-group sort); the exact percentile is the verification twin."""
    v = F.col("n_chars").cast("double")
    return (
        _t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.round(F.percentile(v, F.lit(0.5)), 4).alias("p50_exact"),
            F.approx_percentile(v, F.lit(0.5), F.lit(10000)).alias("__approx"),
            F.percentile(v, F.lit(0.45)).alias("__lo"),
            F.percentile(v, F.lit(0.55)).alias("__hi"),
        )
        .select(
            "source",
            "p50_exact",
            (
                (F.col("__approx") >= F.col("__lo"))
                & (F.col("__approx") <= F.col("__hi"))
            ).alias("approx_ok"),
        )
    )


def q_inverted_index(spark, sf_dir):
    """Inverted index over a doc slice: (term, df, first-10 postings).
    Distinct terms in-row, ONE term shuffle; the posting list is bounded
    by a rank sharing the same exchange, so stopword-grade terms can't
    build unbounded cells."""
    from kevinlang_spark.operators.text import inverted_index

    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    return inverted_index(docs, min_df=5, max_postings=10)


def q_pagerank(spark, sf_dir):
    """PageRank (10 iterations, d=0.85, dangling-mass redistribution)
    over the order→part graph (keys folded to 500 nodes).  Iterative
    joins with lineage checkpointing every 4 rounds; the oracle unrolls
    the same 10 iterations as chained CTEs."""
    from kevinlang_spark.operators.graph import pagerank

    li = _t(spark, sf_dir, "lineitem")
    edges = li.select(
        (F.col("l_orderkey") % 500).alias("src"),
        (F.col("l_partkey") % 500).alias("dst"),
    )
    pr = pagerank(edges, damping=0.85, iterations=10)
    return pr.select("node", F.round("rank", 8).alias("rank"))


def _pagerank_oracle_sql(iters: int = 10, edges_sql: str | None = None) -> str:
    """Unrolled fixed-iteration PageRank as chained CTEs (aggregation is
    not allowed in a recursive CTE term, so the loop is unrolled —
    mechanically, mirroring the Spark iteration exactly).  ``edges_sql``
    swaps the edge CTE (q_crawl_pagerank runs the SAME unroll over the
    crawl link graph)."""
    if edges_sql is None:
        edges_sql = (
            "SELECT DISTINCT l_orderkey % 500 AS src, "
            "l_partkey % 500 AS dst FROM lineitem"
        )
    # every CTE is MATERIALIZED: r{i-1} is referenced three times per
    # iteration, and default CTE inlining would re-expand the whole
    # prefix each time (exponential planning/execution)
    sql = (
        f"WITH e AS MATERIALIZED ({edges_sql}), "
        "nodes AS MATERIALIZED (SELECT src AS node FROM e "
        "UNION SELECT dst FROM e), "
        "nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM nodes), "
        "deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM e "
        "GROUP BY src), "
        "r0 AS MATERIALIZED (SELECT node, 1.0 / (SELECT n FROM nn) AS rank "
        "FROM nodes)"
    )
    for i in range(1, iters + 1):
        p = f"r{i - 1}"
        sql += (
            f", d{i} AS MATERIALIZED (SELECT COALESCE(SUM(rank), 0) AS m "
            f"FROM {p} LEFT JOIN deg ON node = src WHERE deg.deg IS NULL)"
            f", c{i} AS MATERIALIZED (SELECT e.dst AS node, "
            f"SUM(r.rank / deg.deg) AS s "
            f"FROM {p} r JOIN deg ON r.node = deg.src "
            f"JOIN e ON r.node = e.src GROUP BY e.dst)"
            f", r{i} AS MATERIALIZED (SELECT nodes.node, "
            f"(1 - 0.85) / (SELECT n FROM nn) + 0.85 * ("
            f"COALESCE(c{i}.s, 0) + (SELECT m FROM d{i}) / (SELECT n FROM nn)"
            f") AS rank FROM nodes LEFT JOIN c{i} ON nodes.node = c{i}.node)"
        )
    return sql + f" SELECT node, ROUND(rank, 8) AS rank FROM r{iters}"


def q_heavy_hitters(spark, sf_dir):
    """Top-20 most active users via per-partition Misra–Gries summaries
    (bounded memory, summary-sized shuffle).  capacity=512 ≥ the distinct
    user count, so the sketch is EXACT here and oracle-checkable — the
    under-capacity regime is the 100 TB path (pytest covers it)."""
    from kevinlang_spark.operators.sketches import heavy_hitters

    return heavy_hitters(
        _t(spark, sf_dir, "events"), "user_id", k=20, capacity=512
    )


def q_retention(spark, sf_dir):
    """Weekly cohort retention matrix (cohort first-activity week ×
    offset → distinct active users) — the growth-analytics rollup.  Two
    user-keyed aggregations share one hash partitioning; the final count
    shuffles only the tiny (cohort, offset) key space."""
    from kevinlang_spark.operators.events import retention_cohorts

    return retention_cohorts(_events(spark, sf_dir))


def q_validate(spark, sf_dir):
    """deequ-style data-quality gate: five constraint checks (unique /
    not-null / range / accepted values / regex) compiled into ONE
    aggregation over ONE scan — never a scan per rule."""
    from kevinlang_spark.operators.quality import (
        accepted_values,
        in_range,
        matches_regex,
        not_null,
        unique,
        validate,
    )

    orders = _t(spark, sf_dir, "orders")
    return validate(
        orders,
        [
            unique("o_orderkey"),
            not_null("o_custkey"),
            in_range("o_totalprice", 0.0, 1_000_000.0),
            accepted_values("o_orderstatus", ["O", "F", "P"]),
            matches_regex("o_orderpriority", "^[0-9]-[A-Z]+$"),
        ],
    )


def q_rfm(spark, sf_dir):
    """RFM segmentation: per-user recency/frequency/monetary rolled up
    in one pass, then quintile scores assigned from exact boundary
    aggregates broadcast back (count-of-boundaries-below — the same
    scale-correct binning as q_equidepth, never a global NTILE sort)."""
    ev = _events(spark, sf_dir)
    rfm = ev.groupBy("user_id").agg(
        F.max(F.col("ts").cast("long")).alias("recency_ts"),
        F.count("*").alias("frequency"),
        F.round(
            F.sum(F.when(F.col("event_type") == "purchase", F.col("value"))),
            4,
        ).alias("monetary"),
    )
    fracs = F.array(*[F.lit(x) for x in (0.2, 0.4, 0.6, 0.8)])
    bounds = rfm.agg(
        F.percentile(F.col("recency_ts").cast("double"), fracs).alias("rb"),
        F.percentile(F.col("frequency").cast("double"), fracs).alias("fb"),
        F.percentile(F.col("monetary").cast("double"), fracs).alias("mb"),
    )

    def score(col, bcol):
        return (
            F.lit(1)
            + F.size(F.filter(F.col(bcol), lambda b: F.col(col).cast("double") > b))
        ).alias(f"{col}_score")

    return (
        rfm.join(F.broadcast(bounds))
        .select(
            "user_id",
            "recency_ts",
            "frequency",
            "monetary",
            score("recency_ts", "rb"),
            score("frequency", "fb"),
            score("monetary", "mb"),
        )
    )


def q_ab_test(spark, sf_dir):
    """Experimentation readout: users hash-split 50/50 (deterministic,
    engine-portable), Welch's t computed per event type from conditional
    aggregates — ONE scan, one tiny shuffle on the metric key; no
    per-arm subqueries."""
    from kevinlang_spark.operators.sampling import hash_bucket

    ev = _events(spark, sf_dir).select(
        "event_type",
        "value",
        (hash_bucket(F.col("user_id"), 10_000) < 5_000).alias("in_a"),
    )
    va = F.when(F.col("in_a"), F.col("value"))
    vb = F.when(~F.col("in_a"), F.col("value"))
    agg = ev.groupBy("event_type").agg(
        F.count(va).alias("n_a"),
        F.avg(va).alias("__ma"),
        F.var_samp(va).alias("__va"),
        F.count(vb).alias("n_b"),
        F.avg(vb).alias("__mb"),
        F.var_samp(vb).alias("__vb"),
    )
    se = F.sqrt(
        F.col("__va") / F.col("n_a") + F.col("__vb") / F.col("n_b")
    )
    return agg.select(
        "event_type",
        "n_a",
        "n_b",
        F.round(F.col("__ma") - F.col("__mb"), 6).alias("mean_diff"),
        F.round((F.col("__ma") - F.col("__mb")) / se, 4).alias("t_welch"),
    )


def q_benford(spark, sf_dir):
    """Benford first-digit screen over order totals (the classic fraud /
    data-quality test): leading-digit extraction is a scan-stage
    expression, the rollup a 9-key aggregation; output compares observed
    frequency to log10(1 + 1/d)."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    digit = F.substring(
        F.col("o_totalprice").cast("string"), 1, 1
    ).cast("int")
    total = o.count()  # scalar, one cheap job
    return (
        o.select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count("*").alias("n"))
        .select(
            "digit",
            "n",
            F.round(F.col("n") / F.lit(float(total)), 6).alias("freq"),
            F.round(F.log10(1 + 1 / F.col("digit")), 6).alias("benford"),
        )
    )


def q_gini(spark, sf_dir):
    """Gini concentration of customer account balances per market
    segment: ascending-rank windows PARTITIONED by segment (never a
    global sort) feeding the closed-form G = 2Σ(i·xᵢ)/(nΣx) − (n+1)/n;
    balances are shifted to non-negative first (Gini needs x ≥ 0)."""
    from pyspark.sql import Window

    c = _t(spark, sf_dir, "customer").select(
        "c_mktsegment",
        (F.col("c_acctbal") + 1000.0).alias("x"),
        "c_custkey",
    )
    w = Window.partitionBy("c_mktsegment").orderBy("x", "c_custkey")
    ranked = c.withColumn("i", F.row_number().over(w))
    return (
        ranked.groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.sum("x").alias("__sx"),
            F.sum(F.col("i") * F.col("x")).alias("__six"),
        )
        .select(
            "c_mktsegment",
            "n",
            F.round(
                2.0 * F.col("__six") / (F.col("n") * F.col("__sx"))
                - (F.col("n") + 1.0) / F.col("n"),
                6,
            ).alias("gini"),
        )
    )


def q_corr_matrix(spark, sf_dir):
    """Pairwise Pearson correlations of four measures in ONE aggregation
    over one scan (k(k-1)/2 corr accumulators ride the same pass — never
    a scan per pair), exploded to (col_a, col_b, corr) rows."""
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    li = _t(spark, sf_dir, "lineitem")
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    agg = li.agg(
        *[
            F.round(F.corr(a, b), 6).alias(f"__c{i}")
            for i, (a, b) in enumerate(pairs)
        ]
    )
    return agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(a).alias("col_a"),
                        F.lit(b).alias("col_b"),
                        F.col(f"__c{i}").alias("corr"),
                    )
                    for i, (a, b) in enumerate(pairs)
                ]
            )
        ).alias("r")
    ).select("r.*")


def q_attribution_linear(spark, sf_dir):
    """Linear multi-touch attribution: each purchase splits one unit of
    credit equally across that user's views in the prior 24h; output is
    total credit per view event.  The pair join is equi-key on the user
    with a bounded time-range residual (stream-joinable shape), the
    per-purchase fan-out count is a purchase-keyed window, the rollup a
    view-keyed sum — three key shuffles, none global."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir).select(
        "user_id", "event_id", F.col("ts").cast("long").alias("t"), "event_type"
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("t").alias("vt")
    )
    buys = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("buy_id"), F.col("t").alias("bt")
    )
    pairs = views.join(buys, "user_id").where(
        (F.col("vt") <= F.col("bt")) & (F.col("vt") > F.col("bt") - 86400)
    )
    w = Window.partitionBy("buy_id")
    credited = pairs.withColumn(
        "credit", F.lit(1.0) / F.count("*").over(w)
    )
    return (
        credited.groupBy("view_id")
        .agg(F.round(F.sum("credit"), 6).alias("total_credit"))
    )


def q_mode(spark, sf_dir):
    """Statistical mode per group (most frequent quantity per return
    flag, ties to the smallest value): two-level aggregation where the
    arg-max is a single struct MAX — no window over the counts, so the
    second stage shuffles only group keys."""
    li = _t(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count("*").alias("n")
    )
    m = F.max(
        F.struct(F.col("n"), (-F.col("l_quantity")).alias("nq"))
    ).alias("m")
    return counts.groupBy("l_returnflag").agg(m).select(
        "l_returnflag",
        (-F.col("m.nq")).alias("mode_qty"),
        F.col("m.n").alias("n"),
    )


def q_paths(spark, sf_dir):
    """Clickstream path mining: top 20 session paths (first 5 event
    types per 30-min-gap session).  Sessionization is the lag+cumsum
    window (one user shuffle), path assembly an in-row sort+slice, the
    final count a tiny path-keyed aggregation."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir).select(
        "user_id",
        F.col("ts").cast("long").alias("t"),
        "event_id",
        "event_type",
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    gap = F.col("t") - F.lag("t").over(w)
    new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess = ev.withColumn(
        "sess_id",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    paths = sess.groupBy("user_id", "sess_id").agg(
        F.concat_ws(
            ">",
            F.slice(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("t", "event_id", "event_type"))
                    ),
                    lambda r: r["event_type"],
                ),
                1,
                5,
            ),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), F.col("path").asc())
        .limit(20)
    )


def q_skyline(spark, sf_dir):
    """Per-priority Pareto frontier (skyline): orders not strictly
    dominated by an earlier-dated, higher-priced order of the same
    priority.  2-D skylines reduce to a cumulative-max window over the
    date order — partitioned by priority, so no global sort anywhere."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_orderdate").cast("timestamp").cast("long").alias("d"),
        "o_totalprice",
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("d")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    prev_max = F.max("o_totalprice").over(w)
    return (
        o.withColumn("__pm", prev_max)
        .where(F.col("__pm").isNull() | (F.col("o_totalprice") > F.col("__pm")))
        .select("o_orderkey", "o_orderpriority", "d", "o_totalprice")
    )


def q_jaccard_prefix(spark, sf_dir):
    """EXACT token-set Jaccard ≥ 0.7 pairs via prefix filtering (PPJoin
    family): rarest-first prefixes are the only exploded tokens, so the
    candidate join never sees stopword-grade keys and completeness is a
    theorem — the third near-dup algorithm beside MinHash-LSH and
    SimHash."""
    from kevinlang_spark.operators.dedup import jaccard_prefix_pairs

    return jaccard_prefix_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.8, ngram=2
    )


def q_triangles(spark, sf_dir):
    """Triangle count on the folded order→part graph — the canonical
    multi-way self-join: canonical a<b<c edge orientation makes each
    triangle match exactly once, the join chain is two hash equi-joins
    on single node keys (wedge build + closing-edge semi check), and
    degree-ordering keeps wedge counts bounded by Σd² not n²."""
    li = _t(spark, sf_dir, "lineitem")
    e = (
        li.select(
            (F.col("l_orderkey") % 500).alias("u"),
            (F.col("l_partkey") % 500).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
        )
        .distinct()
        # e feeds three join legs: materialize once or the scan+distinct
        # lineage re-executes per leg (see graph.py loop invariants)
        .localCheckpoint(eager=True)
    )
    e1 = e.alias("e1")
    e2 = e.alias("e2")
    e3 = e.alias("e3")
    wedges = e1.join(e2, F.col("e1.b") == F.col("e2.a")).select(
        F.col("e1.a").alias("x"), F.col("e1.b").alias("y"), F.col("e2.b").alias("z")
    )
    tri = wedges.join(
        e3,
        (F.col("x") == F.col("e3.a")) & (F.col("z") == F.col("e3.b")),
    )
    return tri.agg(F.count("*").alias("n_triangles"))


def q_clustering_coef(spark, sf_dir):
    """Per-node local clustering coefficient (operators/graph.py
    clustering_coefficient — Watts & Strogatz 1998) on the folded
    order→part graph: the q_triangles wedge-join enumeration exploded
    to triangle corners, joined to the degree census; integer counts,
    one exact division per node."""
    from kevinlang_spark.operators.graph import clustering_coefficient

    li = _t(spark, sf_dir, "lineitem")
    edges = li.select(
        (F.col("l_orderkey") % 500).alias("src"),
        (F.col("l_partkey") % 500).alias("dst"),
    )
    return clustering_coefficient(edges)


def q_benford_audit(spark, sf_dir):
    """Benford first-digit audit (operators/stats.py benford_audit —
    Nigrini 1996 forensic screen) over lineitem extended prices:
    integer-cent conversion, first digit from the integer's decimal
    rendering (engine-identical), 9-row census with in-row Benford
    expectations and chi-square fold in digit order.  TPC-H prices
    are near-uniform, so the audit correctly reports a violation."""
    from kevinlang_spark.operators.stats import benford_audit

    return benford_audit(_t(spark, sf_dir, "lineitem"), "l_extendedprice")


def q_calibration_audit(spark, sf_dir):
    """Classifier calibration audit (operators/stats.py
    calibration_audit — ECE + Brier): a deterministically CALIBRATED
    fixture (label = Bernoulli(p) via an independent md5 draw) binned
    to 10 reliability buckets.  The probability quantizes to 1e-3
    units so Brier and the weighted-ECE numerator are BIGINT sums —
    order-free — with one final division each; small ECE on this
    fixture is the expected (calibrated) outcome."""
    from kevinlang_spark.operators.stats import calibration_audit

    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def h(tag):
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(F.col("doc_id").cast("string"), F.lit(tag))
                ),
                1, 13,
            ),
            16, 10,
        ).cast("bigint")

    scored = docs.select(
        ((h("#cal") % 1001) / 1000.0).alias("prob"),
        ((h("#lab") % 1000) < (h("#cal") % 1001)).cast("int").alias(
            "label"
        ),
    )
    return calibration_audit(scored)


def q_spearman_corr(spark, sf_dir):
    """Per-group Spearman rank correlation (operators/stats.py
    spearman_corr): doubled average-rank integers make every
    sufficient statistic a BIGINT sum, so the tie-handled rho replays
    exactly; two partitioned rank windows + one keyed aggregation."""
    from kevinlang_spark.operators.stats import spearman_corr

    li = _t(spark, sf_dir, "lineitem")
    return spearman_corr(li, "l_returnflag", "l_quantity", "l_extendedprice")


def q_neyman_allocation(spark, sf_dir):
    """Neyman-optimal stratified allocation (operators/sampling.py
    neyman_allocation — Neyman 1934): labeling budget of 1000 across
    market segments by N_h·S_h, with cent-quantized balances so the
    per-stratum moments are integer-exact and the normalizer folds
    in-row over the bounded stratum array."""
    from kevinlang_spark.operators.sampling import neyman_allocation

    return neyman_allocation(
        _t(spark, sf_dir, "customer"),
        "c_mktsegment",
        "c_acctbal",
        sample_size=1000,
        value_scale=100,
    )


def q_ranking_metrics(spark, sf_dir):
    """Per-query NDCG@5 / MRR / AP (operators/stats.py
    ranking_metrics): eight md5-graded candidates per query, every
    metric folded in-row over the rank-sorted bounded list — fixed
    float order, replayed by the oracle's ordered list folds."""
    from kevinlang_spark.operators.stats import ranking_metrics

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    ranked = docs.select(
        F.col("doc_id").alias("query_id"),
        F.explode(F.sequence(F.lit(1), F.lit(8))).alias("rank"),
    )
    rel = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("query_id").cast("string"), F.lit("#"),
                        F.col("rank").cast("string"), F.lit("#rel"),
                    )
                ),
                1, 13,
            ),
            16, 10,
        ).cast("bigint")
        % 4
    )
    return ranking_metrics(
        ranked.select("query_id", "rank", rel.alias("rel")), k=5
    )


def _ab_units(spark, sf_dir):
    """Shared experiment fixture: per user, Y = purchase value,
    X = view value (the pre-metric proxy), arm by user-id parity."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase", F.col("value")
                ).otherwise(0.0)
            ).alias("y"),
            F.sum(
                F.when(
                    F.col("event_type") == "view", F.col("value")
                ).otherwise(0.0)
            ).alias("x"),
        )
        .select(
            F.when(F.col("user_id") % 2 == 0, "control")
            .otherwise("treat")
            .alias("arm"),
            "y",
            "x",
        )
    )


_AB_UNITS_SQL = (
    "WITH u AS (SELECT user_id, "
    "SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END) "
    "AS y, "
    "SUM(CASE WHEN event_type = 'view' THEN value ELSE 0.0 END) AS x "
    "FROM events GROUP BY user_id), "
    "units AS (SELECT CASE WHEN user_id % 2 = 0 THEN 'control' "
    "ELSE 'treat' END AS arm, y, x FROM u)"
)


def q_cuped_ab(spark, sf_dir):
    """CUPED-adjusted A/B readout (operators/experiments.py
    cuped_ab_test — Deng et al. 2013): cent-quantized per-unit (Y, X)
    so every sufficient statistic is a BIGINT sum; the adjusted-arm
    variance expands algebraically (var − 2θcov + θ²var_x), so no
    per-unit double is ever summed.  One arm-keyed agg + the 2-row
    census collapsed in-row."""
    from kevinlang_spark.operators.experiments import cuped_ab_test

    return cuped_ab_test(_ab_units(spark, sf_dir))


def q_srm_check(spark, sf_dir):
    """Sample-ratio-mismatch gate (operators/experiments.py
    srm_check — Fabijan et al. 2019): chi-square of observed arm
    counts vs the designed 50/50 split; integer census, in-row fold
    in arm order."""
    from kevinlang_spark.operators.experiments import srm_check

    return srm_check(_ab_units(spark, sf_dir))


def q_ratio_metric(spark, sf_dir):
    """Delta-method ratio-metric test (operators/experiments.py
    ratio_metric_test — Deng et al. 2018): purchase-per-view ratio per
    arm with the correlation-aware SE; BIGINT moments, fixed-form
    doubles, NULL z on degenerate arms."""
    from kevinlang_spark.operators.experiments import ratio_metric_test

    units = _ab_units(spark, sf_dir).select(
        "arm", F.col("y").alias("num"), F.col("x").alias("den")
    )
    return ratio_metric_test(units)


def q_incremental_agg(spark, sf_dir):
    """Incremental materialized-view refresh: per-customer order stats
    maintained as mergeable state — history state + delta state folded
    with ONE state-sized shuffle, never re-scanning history.  The oracle
    aggregates the full table directly, so a hash match PROVES
    merge(state(A), state(B)) == state(A ∪ B)."""
    from kevinlang_spark.operators.incremental import (
        aggregate_delta,
        finalize,
        merge_states,
    )

    orders = _t(spark, sf_dir, "orders")
    history = orders.where(F.col("o_orderkey") % 10 != 9)
    delta = orders.where(F.col("o_orderkey") % 10 == 9)
    state = aggregate_delta(history, ["o_custkey"], "o_totalprice")
    new_state = merge_states(
        state, aggregate_delta(delta, ["o_custkey"], "o_totalprice"),
        ["o_custkey"],
    )
    # avg_v (= sum/n) is excluded from the compared output: division
    # results land on exact 4dp halves (cent sums / 8) where Spark
    # (HALF_UP) and other engines round differently — the merge
    # invariant is fully proven by n/sum/min/max
    return finalize(new_state).drop("avg_v")


def q_lm_score(spark, sf_dir):
    """Bigram-LM quality score per doc (corpus-trained, add-one
    smoothed): gram-keyed count joins only — no model broadcast, no
    driver state — the relational stand-in for perplexity filtering."""
    from kevinlang_spark.operators.text import bigram_lm_score

    return bigram_lm_score(_t(spark, sf_dir, "documents"))


def q_lm_perplexity(spark, sf_dir):
    """Trigram STUPID-BACKOFF perplexity per document (Brants et al.
    2007 — the CCNet-style LM quality filter): counts train on the
    even-doc_id half, every document scores, so held-out docs exercise
    the full backoff chain (seen trigram → α·bigram → α²·add-one
    unigram floor).  The model is three gram-keyed count tables + a
    broadcast 1-row N+V aggregate; scoring is five gram-keyed hash joins — no dense vocab
    structure, so both corpora scale arbitrarily."""
    from kevinlang_spark.operators.text import lm_perplexity

    return lm_perplexity(
        _t(spark, sf_dir, "documents"),
        train_filter=F.col("doc_id") % 2 == 0,
    )


def q_rolling(spark, sf_dir):
    """Trailing 1-hour per-user event stats via a RANGE window (frame
    defined by event-time distance, not row count — the rolling-feature
    shape for feature stores).  One key shuffle; frames are computed by
    a sliding pointer over each partition's sort, not re-aggregation."""
    from pyspark.sql import Window

    ev = _events(spark, sf_dir).select(
        "user_id",
        "event_id",
        F.col("ts").cast("long").alias("ts_s"),
        "value",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_s")
        .rangeBetween(-3599, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts_s",
        F.count("*").over(w).alias("n_1h"),
        F.round(F.sum("value").over(w), 4).alias("sum_1h"),
    )


def q_boilerplate(spark, sf_dir):
    """Cross-corpus boilerplate detection: most-repeated normalized
    sentences across ALL documents (cookie banners, nav text) — line
    explode with in-row normalize, one key shuffle with map-side
    combine, rank-limit output.  The synthetic corpus has no repeated
    sentences, so the query salts deterministic banners into a subset of
    docs (both engines inject identically) and must recover exactly
    them, with exact counts."""
    docs = _t(spark, sf_dir, "documents")
    salted = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.lit(". This site uses cookies to improve your experience."),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.lit(". Subscribe to our newsletter for weekly updates."),
        ).otherwise(F.lit("")),
    )
    norm = F.transform(
        F.split(salted, "\\."),
        lambda l: F.regexp_replace(F.lower(F.trim(l)), "[^a-z0-9 ]", ""),
    )
    lines = docs.select(
        F.explode(F.filter(norm, lambda l: F.length(l) > 20)).alias("line")
    )
    return (
        lines.groupBy("line")
        .agg(F.count("*").alias("n_occurrences"))
        .where(F.col("n_occurrences") >= 5)
        .orderBy(F.col("n_occurrences").desc(), F.col("line").asc())
        .limit(50)
    )


def q_label_centroids(spark, sf_dir):
    """Per-label embedding centroids (IVF/k-means recompute step):
    posexplode to scalar (label, pos, val) triples — map-side-combined
    AVG per dimension, ordered reassembly — whole vectors never shuffle.
    The centroid is emitted as a comma-joined string of micro-unit ints
    (floor(x*1e6+0.5) on the 6-dp-rounded mean): the driver's pandas
    canonicalizer cannot hash list cells, and fixed-point int→string is
    engine-exact where double→string formatting is not."""
    from kevinlang_spark.functions.vectors import label_centroids

    out = label_centroids(_t(spark, sf_dir, "embeddings"))
    micro = F.transform(
        F.col("centroid"),
        lambda x: F.floor(x * F.lit(1000000.0) + F.lit(0.5))
        .cast("bigint")
        .cast("string"),
    )
    return out.select(
        "label", F.concat_ws(",", micro).alias("centroid"), "n_vectors"
    )


def q_equidepth(spark, sf_dir):
    """Equi-depth decile histogram of order totals: exact quantile
    boundaries in one aggregation, scan-stage binning, bucket-sized
    final shuffle — never the global NTILE sort window."""
    from kevinlang_spark.operators.stats import equidepth_histogram

    out = equidepth_histogram(
        _t(spark, sf_dir, "orders"), "o_totalprice", buckets=10
    )
    return out.select(
        "bucket", "n", F.round("lo", 2).alias("lo"), F.round("hi", 2).alias("hi")
    )


def q_fuzzy_join(spark, sf_dir):
    """Edit-distance self-join (levenshtein <= 2 on 12-char normalized
    prefixes): length-bucket blocking + neighbor-bucket probes make the
    physical join a hash equi-join on the bucket — never all-pairs."""
    from kevinlang_spark.functions.textexpr import normalize_text
    from kevinlang_spark.operators.joins import fuzzy_join

    docs = (
        _t(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 300)
        .select(
            "doc_id",
            F.substring(normalize_text(F.col("text")), 1, 12).alias("s"),
        )
    )
    pairs = fuzzy_join(docs, docs, "s", "s", max_distance=2)
    return pairs.where(F.col("left_id") < F.col("right_id"))


def q_profile(spark, sf_dir):
    """Numeric table profile of lineitem (count/nulls/min/max/mean/std
    per column) in ONE aggregation over ONE scan — never a scan per
    column."""
    from kevinlang_spark.operators.stats import profile_numeric

    return profile_numeric(
        _t(spark, sf_dir, "lineitem"),
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    )


def q_merge_intervals(spark, sf_dir):
    """Gaps-and-islands: merge each user's 10-minute activity intervals
    into maximal islands — one key shuffle (windows + rollup share the
    user hash)."""
    from kevinlang_spark.operators.events import merge_intervals

    iv = _events(spark, sf_dir).select(
        "user_id",
        F.col("ts").cast("long").alias("start"),
        (F.col("ts").cast("long") + 600).alias("end"),
    )
    return merge_intervals(iv, key="user_id")


def q_twap(spark, sf_dir):
    """Time-weighted average value per user (each observation weighted by
    its holding period) — the metrics/financial aggregate a plain AVG
    gets wrong under bursty sampling."""
    from kevinlang_spark.operators.events import time_weighted_avg

    out = time_weighted_avg(_events(spark, sf_dir), key="user_id")
    return out.select("user_id", F.round("twap", 6).alias("twap"), "n_obs")


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup-style semantic dedup: sign-pattern coarse quantization of
    the embedding (8 bits → 256 buckets, scan-stage codegen), min-id
    representative per bucket, cosine-to-rep duplicate flag — everything
    rides ONE hash shuffle on the bucket key (window, no join)."""
    from kevinlang_spark.operators.similarity import semantic_dedup

    return semantic_dedup(
        _t(spark, sf_dir, "embeddings"), bits=8, threshold=0.8
    )



def _kmeans_sql(k: int, n_iters: int) -> str:
    """DuckDB replica of similarity.kmeans_fit: same smallest-id
    seeds, same rounded-distance argmin with index tie-break (struct
    list_sort == Spark array_min), same BIGINT per-(cluster, dim)
    centroid sums.  Every round CTE is MATERIALIZED (the unrolled-
    iteration rule — DuckDB re-inlines CTEs referenced twice)."""

    def assign(r, csrc):
        return (
            f"a{r} AS MATERIALIZED (SELECT id, qv, best.d AS dq, "
            "best.i AS cluster FROM (SELECT id, qv, "
            "list_sort(list_transform(cs, c -> struct_pack("
            "d := round(list_reduce(list_prepend(0.0, "
            "list_transform(range(1, len(qv) + 1), "
            "j -> (qv[j] - c.cent[j]) * (qv[j] - c.cent[j]))), "
            "(x, y) -> x + y), 6), i := c.idx)))[1] AS best "
            f"FROM b, {csrc}))"
        )

    parts = [
        "WITH b AS MATERIALIZED (SELECT vec_id AS id, "
        "list_transform(embedding, x -> CAST(FLOOR("
        "CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS qv "
        "FROM embeddings WHERE embedding IS NOT NULL)",
        "c0 AS MATERIALIZED (SELECT list(struct_pack("
        "idx := CAST(rn - 1 AS INT), cent := cd) ORDER BY rn) AS cs "
        "FROM (SELECT row_number() OVER (ORDER BY id) AS rn, "
        "list_transform(qv, x -> CAST(x AS DOUBLE)) AS cd "
        f"FROM (SELECT id, qv FROM b ORDER BY id LIMIT {k})))",
    ]
    for r in range(1, n_iters):
        parts.append(assign(r, f"c{r - 1}"))
        parts.append(
            f"u{r} AS MATERIALIZED (SELECT cluster, j AS pos, "
            f"CAST(SUM(qv[j]) AS BIGINT) AS s, "
            f"CAST(COUNT(*) AS BIGINT) AS n FROM a{r}, "
            "unnest(range(1, len(qv) + 1)) t(j) GROUP BY 1, 2)"
        )
        parts.append(
            f"p{r} AS (SELECT cluster, list(struct_pack(pos := pos, "
            f"s := s) ORDER BY pos) AS ps, MAX(n) AS n FROM u{r} "
            "GROUP BY cluster)"
        )
        parts.append(
            f"c{r} AS MATERIALIZED (SELECT list(struct_pack("
            "idx := cluster, cent := list_transform(ps, p -> p.s / n)) "
            f"ORDER BY cluster) AS cs FROM p{r})"
        )
    parts.append(assign(n_iters, f"c{n_iters - 1}"))
    return (
        ", ".join(parts)
        + f" SELECT id, cluster, round(dq / 1000000000000.0, 6) "
        f"AS dist FROM a{n_iters}"
    )



def _geohash_sql(lat: str, lon: str, precision: int) -> str:
    """DuckDB expression replicating spatial.geohash's closed-form bit
    interleave (same quantize, clamp, shifts, and base32 slicing)."""
    total = 5 * precision
    n_lon = (total + 1) // 2
    n_lat = total // 2
    qlon = (
        f"LEAST(CAST(FLOOR(({lon} + 180.0) / 360.0 * "
        f"{float(1 << n_lon)}) AS BIGINT), {(1 << n_lon) - 1})"
    )
    qlat = (
        f"LEAST(CAST(FLOOR(({lat} + 90.0) / 180.0 * "
        f"{float(1 << n_lat)}) AS BIGINT), {(1 << n_lat) - 1})"
    )
    parts = []
    for j in range(n_lon):
        parts.append(
            f"(((ql_on >> {n_lon - 1 - j}) & 1) << {total - 1 - 2 * j})"
        )
    for j in range(n_lat):
        parts.append(
            f"(((ql_at >> {n_lat - 1 - j}) & 1) << {total - 2 - 2 * j})"
        )
    code = " | ".join(parts)
    chars = " || ".join(
        "substr('0123456789bcdefghjkmnpqrstuvwxyz', "
        f"CAST(((code >> {5 * (precision - 1 - i)}) & 31) + 1 AS INT), 1)"
        for i in range(precision)
    )
    return (
        f"(SELECT {chars} FROM (SELECT ({code}) AS code FROM "
        f"(SELECT {qlon} AS ql_on, {qlat} AS ql_at)))"
    )


def q_prototypicality(spark, sf_dir):
    """D4-style SSL-prototype scoring (operators/similarity.py
    prototypicality — arXiv:2308.12284): per sign-bucket cluster, each
    embedding's cosine to the cluster centroid, rank, and the top-1/4
    most-prototypical flag a D4 pruning pass drops.  Centroids come
    from BIGINT-exact sums of 1e-6-quantized components (one narrow
    (bucket, dim) shuffle, map-side combined); the cosine rounds to 6
    before ranking with an id tie-break so the trajectory replays."""
    from kevinlang_spark.operators.similarity import prototypicality

    return prototypicality(_t(spark, sf_dir, "embeddings"), bits=8)


def q_unimax_weights(spark, sf_dir):
    """UniMax epoch-capped sampling allocation (operators/sampling.py
    unimax_weights — arXiv:2304.09151): per-source token census, then
    the closed-form waterfill (integer breakpoint count, one double
    division per row) allocates half the total token budget with at
    most 2 epochs per source.  Windows run over the handful of source
    rows only — the corpus is scanned once for the census."""
    from kevinlang_spark.functions.textexpr import tokenize
    from kevinlang_spark.operators.sampling import unimax_weights

    docs = _t(spark, sf_dir, "documents")
    cnt = (
        docs.where(F.col("text").isNotNull())
        .groupBy("source")
        .agg(
            F.sum(F.size(tokenize(F.col("text"))))
            .cast("bigint")
            .alias("n_tokens")
        )
    )
    return unimax_weights(
        cnt, epoch_cap=2, budget_num=1, budget_den=2
    )


def q_kmeans_fit(spark, sf_dir):
    """Deterministic Lloyd k-means (operators/similarity.py
    kmeans_fit): smallest-id seeds, 2 rounds of rounded-distance
    argmin (index tie-break) + BIGINT-exact centroid updates; the
    oracle replays the full trajectory with MATERIALIZED round CTEs."""
    from kevinlang_spark.operators.similarity import kmeans_fit

    return kmeans_fit(_t(spark, sf_dir, "embeddings"), k=4, n_iters=2)


def q_geohash_census(spark, sf_dir):
    """Geohash spatial density census (operators/spatial.py geohash /
    geohash_census): md5-synthesized coordinates bucketed at precision
    2 (32x32 cells); the encode is a closed-form bit interleave
    (verified against the canonical u4pruydqqvj test vector), means
    from 1e-6-quantized integer sums."""
    from kevinlang_spark.operators.spatial import geohash_census

    ev = _t(spark, sf_dir, "events").select("event_id")

    def h(tag):
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("event_id").cast("string"), F.lit(tag)
                    )
                ),
                1, 13,
            ),
            16, 10,
        ).cast("bigint")

    pts = ev.select(
        ((h("#lat") % 180000000) / 1000000.0 - 90.0).alias("lat"),
        ((h("#lon") % 360000000) / 1000000.0 - 180.0).alias("lon"),
    )
    return geohash_census(pts, "lat", "lon", precision=2)


def q_markov_attribution(spark, sf_dir):
    """Markov removal-effect attribution (events.py
    markov_attribution): journeys → transition table (one user-keyed
    window pass + metadata-sized counts) → absorbing-chain conversion
    probability with each channel removed in turn, on the driver's
    tiny matrix (fixed 12-iteration expansion)."""
    from kevinlang_spark.operators.events import markov_attribution

    return markov_attribution(_events(spark, sf_dir))


def q_corpus_report(spark, sf_dir):
    """One-pass dataset-card rollup: the corpus health metrics a data
    release ships — size, source/lang mix, exact-dup rate (md5
    fingerprint), length distribution — ALL as aggregate expressions in
    ONE scan + one aggregation (the deequ single-pass principle from
    quality.py applied to corpus reporting)."""
    docs = _t(spark, sf_dir, "documents")
    fp = F.md5(
        F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]", "")
    )
    return docs.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.count_distinct("source").cast("bigint").alias("n_sources"),
        F.count_distinct("lang").cast("bigint").alias("n_langs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
        F.count_distinct(fp).cast("bigint").alias("n_unique_texts"),
        F.round(
            1.0 - F.count_distinct(fp) / F.count("*"), 6
        ).alias("dup_rate"),
        F.count_if(F.col("lang") == "en").cast("bigint").alias("n_en"),
    )


def q_acf(spark, sf_dir):
    """Per-event-type autocorrelation of hourly value buckets at lags
    1..6 (anomaly.py acf_by_key) — the seasonality diagnostic feeding
    forecast-season choice; one bucket shuffle + one keyed window pass
    for every lag."""
    from kevinlang_spark.operators.anomaly import acf_by_key

    return acf_by_key(_events(spark, sf_dir), bucket_s=3600, max_lag=6)


def q_semantic_clusters(spark, sf_dir):
    """Cross-family composition: embedding-cosine near-dup pairs →
    distributed min-label connected components → cluster-size rollup —
    the semantic-cluster census a curation pipeline reads ("how many
    redundant embedding neighborhoods, how big").  Pairs come from the
    scale path — sign-bucket blocking (similarity.sign_bucket_pairs), a
    plain hash join on the 2^6 bucket keys, never an all-pairs theta
    join — so the plan graded here is the one a 100 TB run would use;
    components reuse the checkpointed propagation from dedup.py."""
    from kevinlang_spark.operators.dedup import neardup_components
    from kevinlang_spark.operators.similarity import sign_bucket_pairs

    emb = _t(spark, sf_dir, "embeddings")
    pairs = sign_bucket_pairs(emb, bits=6, threshold=0.3).select("id_a", "id_b")
    comps = neardup_components(pairs)
    return comps.groupBy(F.col("comp").alias("cluster")).agg(
        F.count("*").cast("bigint").alias("n_members")
    )


def q_assoc_rules(spark, sf_dir):
    """Market-basket association rules over (order, supplier) baskets:
    canonical pair counts from the basket-key self-join, then
    support/confidence/lift with broadcast item supports — the only
    data-sized shuffles are keyed (basket, then pair)."""
    from kevinlang_spark.operators.baskets import association_rules

    return association_rules(
        _t(spark, sf_dir, "lineitem"), "l_orderkey", "l_suppkey", min_support=3
    )


def q_keyfilter_join(spark, sf_dir):
    """Sideways-information-passing join: a selective dim predicate
    (9 of 100 suppliers) prunes the fact side through a broadcast
    semi-join on the dim's distinct keys BEFORE the main join — the
    hand-rolled form of Catalyst's runtime Bloom filter, for when the
    fact-side shuffle is the scale bottleneck."""
    from kevinlang_spark.operators.joins import keyfilter_join

    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") > 9000)
    out = keyfilter_join(li, supp, "l_suppkey", "s_suppkey")
    return out.groupBy("s_name").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )


def q_line_dedup(spark, sf_dir):
    """Global line-level exact dedup (RefinedWeb-style): duplicated lines
    keep only their first (doc, position) occurrence corpus-wide; docs
    reassembled in order.  One fingerprint-keyed window shuffle + one doc
    reassembly shuffle.  (Synthetic docs are single-line, so ' table '
    rewrites to a newline identically on both engines first — the same
    deterministic multi-line view q_clean_lines uses.)"""
    from kevinlang_spark.operators.dedup import line_dedup

    docs = _t(spark, sf_dir, "documents").withColumn(
        "text", F.replace(F.col("text"), F.lit(" table "), F.lit("\n"))
    )
    return line_dedup(docs)


def q_cdc_apply(spark, sf_dir):
    """CDC merge: apply an insert/update/delete change log (derived
    deterministically from orders) to the customer snapshot — max-seq
    winner per key via one max_by shuffle, untouched rows via a
    co-partitioned left-anti join."""
    from kevinlang_spark.operators.incremental import apply_cdc

    base = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    log = orders.select(
        F.col("o_custkey").alias("c_custkey"),
        F.concat(F.lit("cdc-"), F.col("o_custkey")).alias("c_name"),
        F.lit(0).cast("int").alias("c_nationkey"),
        # /128 is an exact binary scaling (no rounding step) so the
        # derived balance is bit-identical across engines; round(x/100,2)
        # hit .xx5 half-up-vs-binary rounding divergence.
        (F.col("o_totalprice") / 128.0).alias("c_acctbal"),
        F.lit("CDC").alias("c_mktsegment"),
        F.col("o_orderkey").alias("seq"),
        F.when(F.col("o_orderstatus") == "F", F.lit("U"))
        .when(F.col("o_orderstatus") == "O", F.lit("I"))
        .otherwise(F.lit("D"))
        .alias("op"),
    )
    return apply_cdc(base, log, ["c_custkey"], "seq", "op")


def q_interval_overlap(spark, sf_dir):
    """Interval × interval overlap join as a binned equi join (canonical-
    bucket dedup, no distinct): per user, how many 5-minute click windows
    overlap each 10-minute error window."""
    from kevinlang_spark.operators.joins import interval_overlap_join

    ev = _events(spark, sf_dir)
    err = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        "user_id",
        F.col("ts").cast("long").alias("start"),
        (F.col("ts").cast("long") + 600).alias("end"),
    )
    clk = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").cast("long").alias("start"),
        (F.col("ts").cast("long") + 300).alias("end"),
    )
    pairs = interval_overlap_join(err, clk, "user_id", bin_size=600)
    return pairs.groupBy(F.col("a_err_id").alias("err_id")).agg(
        F.count("*").alias("n_overlaps")
    )


def q_target_encode(spark, sf_dir):
    """Smoothed mean target encoding of order priority against order
    value — per-category aggregation plus a broadcast global mean."""
    from kevinlang_spark.operators.stats import target_encode

    return target_encode(
        _t(spark, sf_dir, "orders"),
        "o_orderpriority",
        "o_totalprice",
        alpha=10.0,
        decimals=4,
    )


def q_mad_outliers(spark, sf_dir):
    """Robust per-group outliers: |x − median| > 3·MAD on order totals —
    the masking-proof alternative to z-score flags.  Two keyed median
    aggregations, group tables joined back by broadcast."""
    from kevinlang_spark.operators.stats import mad_outliers

    out = mad_outliers(
        _events(spark, sf_dir), "event_type", "value", k=4.0
    )
    return out.where(F.col("is_outlier")).select(
        "event_id",
        "event_type",
        F.round("group_median", 4).alias("group_median"),
        F.round("mad", 4).alias("mad"),
    )


def q_chi_square(spark, sf_dir):
    """Chi-square independence test of order priority × order status:
    one pair-count aggregation, then margins/statistic on the broadcast
    contingency table."""
    from kevinlang_spark.operators.stats import chi_square

    return chi_square(_t(spark, sf_dir, "orders"), "o_orderpriority", "o_orderstatus")


def q_decayed_features(spark, sf_dir):
    """Exponentially time-decayed per-user activity features (7-day
    half-life, fixed reference instant): the feature-store recency
    aggregate — one scan, scan-stage weight expression, one key shuffle."""
    from kevinlang_spark.operators.events import time_decayed_agg

    return time_decayed_agg(
        _events(spark, sf_dir),
        ref_ts="2024-02-01 00:00:00",
        half_life_hours=168.0,
    )


def q_bootstrap_mean(spark, sf_dir):
    """Poisson-bootstrap CI of the mean event value: 32 deterministic
    hash-weighted resamples in one scan (the scalable bootstrap — no
    with-replacement global sampling)."""
    from kevinlang_spark.operators.stats import poisson_bootstrap

    return poisson_bootstrap(
        _t(spark, sf_dir, "events"), "value", "event_id", n_boot=32
    )


def q_psi_drift(spark, sf_dir):
    """PSI drift readout between two deterministic user-hash arms of the
    event stream (fixed breaks 0..250, 10 bins): one scan + one tiny
    bin-keyed aggregation, complete bin spine."""
    from kevinlang_spark.operators.drift import psi_drift
    from kevinlang_spark.operators.sampling import split_assignment

    ev = _t(spark, sf_dir, "events").withColumn(
        "arm", split_assignment(F.col("user_id"), {"a": 0.5, "b": 0.5})
    )
    return psi_drift(
        ev, "value", "arm", expected="a", actual="b", lo=0.0, hi=250.0, nbins=10
    )


def q_group_ols(spark, sf_dir):
    """Per-returnflag OLS of extendedprice on quantity: millions of
    closed-form regressions as ONE mergeable aggregation (regr_* folds)."""
    from kevinlang_spark.operators.stats import group_ols

    return group_ols(
        _t(spark, sf_dir, "lineitem"),
        "l_returnflag",
        "l_quantity",
        "l_extendedprice",
    )


def q_k_anonymity(spark, sf_dir):
    """k-anonymity audit of customer over (nation, market segment)
    quasi-identifiers: Q13-shaped double aggregation to one risk row."""
    from kevinlang_spark.operators.quality import k_anonymity

    return k_anonymity(
        _t(spark, sf_dir, "customer"), ["c_nationkey", "c_mktsegment"], k=10
    )


def _privacy_binned(spark, sf_dir):
    """Shared privacy-tier fixture: customer quasi-identifiers with
    the account balance binned to 11 fixed-width buckets (the ordered
    sensitive attribute t-closeness needs; bounds cover TPC-H's
    [-999.99, 9999.99] spec range)."""
    cust = _t(spark, sf_dir, "customer")
    return cust.select(
        "c_nationkey",
        "c_mktsegment",
        F.floor((F.col("c_acctbal") + 1000.0) / 1100.0)
        .cast("bigint")
        .alias("bal_bin"),
    )


_PRIVACY_BIN_SQL = (
    "WITH b AS (SELECT c_nationkey, c_mktsegment, "
    "CAST(FLOOR((c_acctbal + 1000.0) / 1100.0) AS BIGINT) AS v "
    "FROM customer)"
)


def q_l_diversity(spark, sf_dir):
    """l-diversity audit (operators/quality.py l_diversity —
    Machanavajjhala et al. 2007): distinct + entropy diversity of the
    binned account balance within (nation, segment) quasi-groups,
    rolled to one risk row.  Two keyed shuffles over one scan; group
    entropy folds in-row over the value-sorted census so MIN over
    groups compares identical doubles on both engines."""
    from kevinlang_spark.operators.quality import l_diversity

    return l_diversity(
        _privacy_binned(spark, sf_dir),
        ["c_nationkey", "c_mktsegment"],
        "bal_bin",
        l=3,
    )


def q_t_closeness(spark, sf_dir):
    """t-closeness audit (operators/quality.py t_closeness — Li et
    al. 2007): per (nation, segment) group, ordered-EMD between the
    group's balance-bin distribution and the global one.  The EMD sum
    is integer-exact (|cumc·G − cumg·n| in BIGINT) with ONE final
    double division, so no float accumulation order exists to
    diverge; the 11-bin domain collapses to one row and broadcasts
    (reviewed bounded BNLJ)."""
    from kevinlang_spark.operators.quality import t_closeness

    return t_closeness(
        _privacy_binned(spark, sf_dir),
        ["c_nationkey", "c_mktsegment"],
        "bal_bin",
    )


def q_cusum(spark, sf_dir):
    """Two-sided CUSUM change-point screen per user series, expressed as
    cumulative-sum windows (no stateful recurrence) — one key shuffle.
    The driver-checked shape is the per-series summary (count of flagged
    points + peak excursions at 2 decimals): the raw trace is a
    cumulative float whose 6th decimal is sensitive to cross-engine
    summation order, so hash-matching it row-by-row would flake."""
    from kevinlang_spark.operators.anomaly import cusum_changepoints

    trace = cusum_changepoints(_events(spark, sf_dir), threshold_sd=5.0)
    return trace.groupBy("user_id").agg(
        F.count("*").alias("n_points"),
        F.count_if("is_change").alias("n_changes"),
        F.round(F.max("cusum_hi"), 2).alias("max_hi"),
        F.round(F.max("cusum_lo"), 2).alias("max_lo"),
    )


def q_seasonal_anomalies(spark, sf_dir):
    """Hour-of-day seasonal baseline per event type, broadcast back;
    rows beyond 3σ of their seasonal cell flag as anomalies."""
    from kevinlang_spark.operators.anomaly import seasonal_anomalies

    return seasonal_anomalies(
        _events(spark, sf_dir), n_sd=3.0, min_obs=30
    )


def q_snapshot_diff(spark, sf_dir):
    """Snapshot reconciliation rollup: added/removed/changed/unchanged
    counts between two simulated loads of orders (one full outer join
    on the key, scan-stage classification)."""
    from kevinlang_spark.operators.incremental import snapshot_diff_summary

    orders = _t(spark, sf_dir, "orders")
    old = orders.where(F.col("o_orderkey") % 10 != 3).select(
        "o_orderkey",
        "o_orderstatus",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 10.0
        ).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
    )
    new = orders.where(F.col("o_orderkey") % 10 != 7).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    return snapshot_diff_summary(old, new, ["o_orderkey"])


def q_char_entropy(spark, sf_dir):
    """Letter-distribution Shannon entropy per document (gibberish /
    encrypted-blob screen): 26 replace-identity counts + in-row fold,
    zero shuffle, zero UDF."""
    from kevinlang_spark.operators.text import char_entropy

    return char_entropy(_t(spark, sf_dir, "documents"))


def q_bpe_pairs(spark, sf_dir):
    """Top-20 BPE merge candidates: corpus-wide adjacent char-pair
    frequencies within words (one BPE vocabulary-learning iteration's
    argmax statistic) — in-row pair assembly, one explode, wordcount
    shuffle shape."""
    from kevinlang_spark.operators.text import bpe_merge_pairs

    return bpe_merge_pairs(_t(spark, sf_dir, "documents"), top_k=20)


def q_ngram_diversity(spark, sf_dir):
    """Per-source bigram diversity (distinct/total word bigrams) — the
    cross-document self-repetition signal for template-generated corpus
    slices."""
    from kevinlang_spark.operators.text import ngram_diversity

    return ngram_diversity(_t(spark, sf_dir, "documents"))


def q_mixture_weights(spark, sf_dir):
    """Temperature-scaled (alpha = 0.5) source mixing weights + per-doc
    oversampling epochs — the multi-source rebalancing rule for training
    mixtures."""
    from kevinlang_spark.operators.sampling import mixture_weights

    return mixture_weights(_t(spark, sf_dir, "documents"), alpha=0.5)


def q_window_dedup(spark, sf_dir):
    """First-arrival event debounce per (user, type, 10-min tumbling
    window): min-(ts, id) struct aggregation, one key shuffle, no sort
    window."""
    from kevinlang_spark.operators.events import window_dedup

    out = window_dedup(
        _events(spark, sf_dir), ["user_id", "event_type"], window_s=600
    )
    return out.select(
        "user_id",
        "event_type",
        "win_start",
        F.col("ts").cast("long").alias("ts_s"),
        "event_id",
        "n_dups",
    )


def q_hll_rollup(spark, sf_dir):
    """Range-queryable distinct counting: one DataSketches HLL sketch per
    (event_type, day), unioned per type — the incremental sketch-table
    pattern (append a day, never rescan history).  Bound-checked like
    q_approx_distinct: the oracle expects rollup_ok = TRUE, so a union
    estimate drifting past 5% of the exact distinct flips the hash."""
    from kevinlang_spark.operators.sketches import hll_rollup

    ev = _events(spark, sf_dir)
    roll = hll_rollup(ev, ["event_type"], F.to_date("ts"), "user_id")
    exact = ev.where(F.col("user_id").isNotNull()).groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_exact")
    )
    return roll.join(exact, "event_type").select(
        "event_type",
        "n_units",
        "n_exact",
        (
            F.abs(F.col("n_union") - F.col("n_exact"))
            <= 0.05 * F.col("n_exact")
        ).alias("rollup_ok"),
    )


def q_mahalanobis(spark, sf_dir):
    """Correlation-aware bivariate outliers per return flag: squared
    Mahalanobis distance of (quantity, price) from the group's joint
    distribution — closed-form 2×2 inverse, one sufficient-statistic
    aggregation + broadcast join-back, scan-stage distance."""
    from kevinlang_spark.operators.stats import mahalanobis_outliers

    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("li_id"),
        "l_quantity",
        "l_extendedprice",
    )
    # the synthetic (quantity, price) joint is tight (max d² ≈ 5.9), so
    # the demo threshold sits at the ~92% chi² point to emit real rows;
    # the operator default stays at the 99.9% cut (13.816)
    return mahalanobis_outliers(
        li, "l_returnflag", "l_quantity", "l_extendedprice", "li_id",
        threshold=5.0,
    )


def q_bfd_packing(spark, sf_dir):
    """Best-fit-decreasing whole-document packing plan (chunking.py
    bfd_packing_plan): per (source, md5-bridge shard) stream, the BFD
    bin census under a 128-token capacity vs the ceil(total/cap) lower
    bound — the padding bill of a no-split packing policy.  The BFD
    state is the sorted bin-load multiset, so the in-row fold replays
    engine-independently; the oracle re-runs the same decreasing-order
    placement as a recursive CTE (list_filter-based — this DuckDB's
    list_transform is unreliable inside recursion)."""
    from kevinlang_spark.functions.textexpr import token_count
    from kevinlang_spark.operators.chunking import bfd_packing_plan

    docs = _t(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    shard = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"),
                               F.lit("#pk"))),
                1, 13,
            ),
            16, 10,
        ).cast("bigint")
        % 2
    )
    base = docs.select(
        "source",
        "doc_id",
        shard.alias("pk_shard"),
        token_count(F.col("text")).alias("n_tokens"),
    )
    return bfd_packing_plan(
        base, max_tokens=128, shard_col="pk_shard",
        part_cols=("source",),
    )


def q_asof_directions(spark, sf_dir):
    """Forward and nearest as-of joins (joins.py asof_join direction
    param — the pandas merge_asof family; backward is q_temporal_join's
    territory): each purchase event matches the next / the closest
    click of the same user, ties to backward per the pandas
    convention.  Same union+window single-shuffle shape; `nearest`
    evaluates both scans over one partitioning.  The oracle derives
    the matches independently with LATERAL min-distance subqueries."""
    from kevinlang_spark.operators.joins import asof_join

    ev = _t(spark, sf_dir, "events")
    ts_l = F.col("ts").cast("timestamp").cast("long")
    left = ev.where(F.col("event_type") == "purchase").select(
        "user_id", ts_l.alias("ts")
    )
    right = (
        ev.where(F.col("event_type") == "click")
        .select("user_id", ts_l.alias("ts"), "value")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    outs = []
    for d in ("forward", "nearest"):
        outs.append(
            asof_join(
                left, right, on="user_id", right_cols=["ts", "value"],
                direction=d,
            ).select(
                F.lit(d).alias("direction"),
                "user_id",
                "ts",
                F.col("ts_right").alias("matched_ts"),
                F.col("value").alias("matched_value"),
            )
        )
    return outs[0].unionByName(outs[1])


def q_temporal_join(spark, sf_dir):
    """Point-in-time SCD2 enrichment (leakage-safe feature-store join):
    per-order version history from ship dates, each receipt event
    matched to the version valid at its timestamp — as-of join + validity
    gate, one key shuffle."""
    from kevinlang_spark.operators.events import scd2_build
    from kevinlang_spark.operators.joins import temporal_join

    li = _t(spark, sf_dir, "lineitem")
    # NTZ → TIMESTAMP → LONG (UTC session: equals DuckDB's epoch())
    ship_s = F.col("l_shipdate").cast("timestamp").cast("long")
    changes = li.select(
        "l_orderkey", ship_s.alias("ts"),
        F.col("l_linenumber").alias("version"),
    )
    dim = scd2_build(changes, "l_orderkey", "ts", ["version"])
    # deterministic "receipt" instants spread across the version history
    # (the synthetic lineitem ships no receiptdate): shipdate + n weeks
    facts = li.select(
        "l_orderkey",
        (ship_s + F.col("l_linenumber").cast("long") * 604_800).alias("ts"),
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("fact_id"),
    )
    out = temporal_join(facts, dim, "l_orderkey", "ts")
    return out.select("fact_id", "l_orderkey", "version")


def q_kll_rollup(spark, sf_dir):
    """Range-queryable quantiles from a mergeable sketch table: one
    DataSketches KLL sketch of event value per (event_type, day), merged
    per type, p50/p90 read off the merged sketch — the quantile twin of
    q_hll_rollup (append a day, never rescan history).  Bound-checked
    like the other sketch queries: the oracle expects p50_ok/p90_ok =
    TRUE, so a merged estimate whose value drifts outside the exact
    ±5-rank-point band flips the hash (KLL's own bound at k = 200 is
    ±1.65 rank points at 99 %, so the check has 3× headroom)."""
    from kevinlang_spark.operators.sketches import kll_rollup

    ev = _events(spark, sf_dir)
    roll = kll_rollup(
        ev, ["event_type"], F.to_date("ts"), "value", quantiles=(0.5, 0.9)
    )
    exact = ev.where(F.col("value").isNotNull()).groupBy("event_type").agg(
        F.round(F.percentile("value", 0.5), 4).alias("p50_exact"),
        F.percentile("value", 0.45).alias("__lo50"),
        F.percentile("value", 0.55).alias("__hi50"),
        F.percentile("value", 0.85).alias("__lo90"),
        F.percentile("value", 0.95).alias("__hi90"),
    )
    return roll.join(exact, "event_type").select(
        "event_type",
        "n_units",
        "n_rows",
        "p50_exact",
        F.col("q_50").between(F.col("__lo50"), F.col("__hi50")).alias("p50_ok"),
        F.col("q_90").between(F.col("__lo90"), F.col("__hi90")).alias("p90_ok"),
    )


def q_theta_overlap(spark, sf_dir):
    """Audience overlap via Theta sketch set algebra: users active on the
    corpus's first day vs its last day, per event type — n_a, n_b, A∩B
    (retained) and A\\B (churned) computed entirely from a per-(type, day)
    sketch table; the raw events are scanned once to BUILD the table and
    never touched again.  At ≤ 2^lgk distinct values per cell the Theta
    sketch is in exact mode, so the estimates equal the exact relational
    counts the oracle computes (both sf tiers are far below 4096 users
    per cell; at 100 TB the same query degrades gracefully to ~1/√k
    relative error instead of failing)."""
    from kevinlang_spark.operators.sketches import theta_rollup, theta_span_overlap

    ev = _events(spark, sf_dir)
    sk = theta_rollup(ev, ["event_type"], F.to_date("ts"), "user_id")
    return theta_span_overlap(sk, ["event_type"])


def q_ewma_smooth(spark, sf_dir):
    """Per-user sequential smoothing of event values with EXACT dyadic
    arithmetic (trailing-20 fold acc ← acc/2 + x/2 over centi-quantized
    values): the EWMA shape that is normally un-oracle-able because
    float recurrences drift across engines becomes bit-reproducible —
    Spark's windowed fold and DuckDB's list_reduce produce identical
    doubles on every row.  One key shuffle; the fold is scan-stage."""
    from kevinlang_spark.operators.events import dyadic_smooth

    return dyadic_smooth(_events(spark, sf_dir), ["user_id"])


def q_novelty(spark, sf_dir):
    """Per-source corpus novelty: documents that are the FIRST occurrence
    of their content fingerprint in global doc_id order vs repeats of
    content an earlier document already contributed — the attribution
    view plain dedup rate can't give (it charges the duplicate to the
    later source).  One fingerprint-keyed window (mergeable MIN, no
    rank sort) + a per-source count; exact integer output."""
    from kevinlang_spark.operators.dedup import novelty_counts

    return novelty_counts(_t(spark, sf_dir, "documents"))


def q_join_estimate(spark, sf_dir):
    """Pre-flight join planning without running the join: distinct keys
    per side, matched keys, and each side's unmatched keys — customer ×
    orders on custkey — from one Theta sketch per side (a scan each, no
    key shuffle).  At lgk=14 both sides sit in the sketch's exact
    regime at oracle scale, so the estimates equal the exact relational
    counts; at 100 TB the same call degrades to ~0.8 % error instead of
    costing a shuffle."""
    from kevinlang_spark.operators.sketches import join_key_profile

    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return join_key_profile(cust, orders, "c_custkey", "o_custkey")


def q_funnel_latency(spark, sf_dir):
    """Funnel time-to-convert: latency from each user's first click to
    their first at-or-after purchase, summarized as converted-user count
    + exact quartiles.  User-keyed shuffle lineage; the percentile step
    sees one row per converted user, never the event table."""
    from kevinlang_spark.operators.events import funnel_latency

    return funnel_latency(_events(spark, sf_dir), "click", "purchase")


def q_dp_counts(spark, sf_dir):
    """ε-DP histogram release: per-source document counts with
    deterministic seed-keyed Laplace(1/ε) noise — reproducible across
    engines (the oracle replicates the md5-uniform → inverse-CDF draw
    bit-for-bit).  One count aggregation; noise is a result-projection
    expression over |groups| rows."""
    from kevinlang_spark.operators.quality import dp_counts

    return dp_counts(
        _t(spark, sf_dir, "documents"),
        ["source"],
        epsilon=1.0,
        seed="r4g",
        release_id="rel-2026-08-14",
    )


def q_join_ivm(spark, sf_dir):
    """Incremental join maintenance: lineitem×orders split into
    base + delta on each side; the emitted rows are exactly the join's
    DELTA (dA⋈B ∪ A⋈dB ∪ dA⋈dB), summarized per return flag.  The
    oracle computes full-join-minus-base-join aggregates directly, so
    any missing or doubled delta term flips the hash.  Maintenance
    touches each base table once, against broadcast delta sides."""
    from kevinlang_spark.operators.incremental import join_delta

    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    a_old = li.where(F.col("l_linenumber") != 1)
    da = li.where(F.col("l_linenumber") == 1)
    b_old = orders.where(F.col("o_orderkey") % 10 != 0)
    db = orders.where(F.col("o_orderkey") % 10 == 0)
    delta = join_delta(
        a_old.withColumn("okey", F.col("l_orderkey")),
        da.withColumn("okey", F.col("l_orderkey")),
        b_old.withColumn("okey", F.col("o_orderkey")),
        db.withColumn("okey", F.col("o_orderkey")),
        "okey",
    )
    return delta.groupBy("l_returnflag").agg(
        F.count("*").alias("n_delta_rows"),
        F.round(F.sum("l_quantity"), 2).alias("qty_delta"),
    )


def q_cms_tokens(spark, sf_dir):
    """Point-frequency probes without a groupBy: a one-pass Count–Min
    sketch over all corpus tokens, probed for three known tokens and one
    absent one.  Bound-checked like the other sketch queries: cms_ok
    asserts the CMS guarantee (never undercounts; overcount ≤ eps·N) —
    at oracle scale the sketch is collision-free so estimates equal the
    exact counts the oracle computes."""
    from kevinlang_spark.functions.textexpr import tokenize
    from kevinlang_spark.operators.sketches import cms_frequencies

    probes = ["join", "hash", "scan", "zzz_absent"]
    toks = _t(spark, sf_dir, "documents").select(
        F.explode(tokenize(F.col("text"))).alias("tok")
    )
    est = cms_frequencies(toks, "tok", probes)
    exact = (
        toks.where(F.col("tok").isin(probes))
        .groupBy("tok")
        .agg(F.count("*").alias("n_exact"))
    )
    total = toks.count()
    return (
        est.join(exact, est.item == exact.tok, "left")
        .select(
            "item",
            F.coalesce("n_exact", F.lit(0)).alias("n_exact"),
            (
                (F.col("est_count") >= F.coalesce("n_exact", F.lit(0)))
                & (
                    F.col("est_count")
                    <= F.coalesce("n_exact", F.lit(0)) + 0.0001 * total
                )
            ).alias("cms_ok"),
        )
    )


def q_top_tokens_per_source(spark, sf_dir):
    """Per-group heavy hitters: top-3 tokens per source via per-partition
    Misra–Gries summaries (bounded memory, summary-sized shuffle).  At
    capacity ≥ the corpus's distinct-token count the counts are exact,
    so the oracle's explode→count→rank reproduces the output exactly —
    the under-capacity regime is the 100 TB path."""
    from kevinlang_spark.functions.textexpr import tokenize
    from kevinlang_spark.operators.sketches import grouped_heavy_hitters

    toks = _t(spark, sf_dir, "documents").select(
        "source", F.explode(tokenize(F.col("text"))).alias("tok")
    )
    return grouped_heavy_hitters(toks, "source", "tok", k=3)


def q_kcenter_sample(spark, sf_dir):
    """Diversity coreset: greedy k-center (k=4) over the embedding table
    — the cover-the-space dual of near-dup removal.  The oracle replays
    the greedy trajectory with 4 unrolled SQL steps; every pairwise
    distance is rounded before min/argmax and ties break on id, so the
    trajectory is engine-reproducible.  k−1 broadcast scans, k driver
    rows."""
    from kevinlang_spark.operators.similarity import kcenter_sample

    return kcenter_sample(_t(spark, sf_dir, "embeddings"), k=4)


def q_survival(spark, sf_dir):
    """Kaplan–Meier user-lifetime survival curve with right-censoring at
    the observation edge: at each observed lifetime (days), the at-risk
    count, churn count, and S(t).  One user rollup is the only
    data-sized shuffle; the ≤ span-days curve finishes driver-side
    (metadata-scale, like the CMS probe)."""
    from kevinlang_spark.operators.stats import km_survival

    return km_survival(_events(spark, sf_dir))


def q_backtest(spark, sf_dir):
    """Seasonal-naive forecast backtest: predict each hour's event count
    per type from the same hour yesterday, score MAE/MAPE over the
    trailing week — the baseline harness any real forecaster must beat.
    One bucket-count aggregation + a count-table-sized offset self-join."""
    from kevinlang_spark.operators.anomaly import seasonal_backtest

    return seasonal_backtest(_events(spark, sf_dir))


def q_leakage_split(spark, sf_dir):
    """Leakage-safe train/val/test assignment: split by near-dup
    COMPONENT hash so a document and its near-copies always share a
    split — the contamination-proof version of q_hash_split.  Component
    propagation runs over pair rows; the split itself is scan-stage."""
    from kevinlang_spark.operators.dedup import minhash_dedup_pairs
    from kevinlang_spark.operators.sampling import leakage_safe_split

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_dedup_pairs(docs, threshold=0.8)
    return leakage_safe_split(docs, pairs)


def q_intrinsic_dim(spark, sf_dir):
    """TwoNN intrinsic-dimension estimate of the embedding space (Facco
    et al. 2017): MLE from two-nearest-neighbor distance ratios over a
    deterministic probe subset — the embedding-degeneracy diagnostic to
    run before building ANN indexes.  Probe set broadcasts against one
    corpus scan; round-before-rank keeps neighbor choice
    engine-reproducible."""
    from kevinlang_spark.operators.similarity import twonn_intrinsic_dim

    return twonn_intrinsic_dim(_t(spark, sf_dir, "embeddings"))


def q_rank_overlap(spark, sf_dir):
    """Rank-Biased Overlap (Webber 2010) between two retrieval rankings
    for the same query: cosine top-10 vs raw-inner-product top-10 —
    "does skipping normalization change what we retrieve".  The rankings
    come from corpus-scale scans; the RBO itself is a ≤k² metadata-scale
    join."""
    from kevinlang_spark.functions.vectors import cosine_similarity, dot
    from kevinlang_spark.operators.similarity import _query_lit
    from kevinlang_spark.operators.stats import rank_biased_overlap

    emb = _t(spark, sf_dir, "embeddings")
    q = _query_lit(_query_vec(spark, sf_dir))

    def topk(score):
        # rank the 10-row top-k via a tiny broadcast self-join count
        # (1 + rows strictly ahead) instead of a global row_number
        # window — same result, no unpartitioned-window in the plan
        t = (
            emb.select("vec_id", score.alias("__s"))
            .orderBy(F.col("__s").desc(), F.col("vec_id").asc())
            .limit(10)
            # materialize the 10-row cut ONCE (r12 optimization round):
            # the x/y self-join consumes t twice — unmaterialized, the
            # corpus scan + TakeOrdered ran per consumer (SCALE.md
            # multi-consumer rule)
            .localCheckpoint(eager=True)
        )
        x, y = t.alias("x"), t.alias("y")
        ahead = (F.col("y.__s") > F.col("x.__s")) | (
            (F.col("y.__s") == F.col("x.__s"))
            & (F.col("y.vec_id") < F.col("x.vec_id"))
        )
        return (
            x.join(F.broadcast(y), ahead, "left")
            .groupBy(F.col("x.vec_id").alias("vec_id"))
            .agg((F.count("y.vec_id") + 1).cast("int").alias("rank"))
        )

    a = topk(cosine_similarity(F.col("embedding"), q))
    b = topk(dot(F.col("embedding"), q))
    return rank_biased_overlap(a, b, "vec_id", k=10)


def q_kcore(spark, sf_dir):
    """Bounded-round k-core peeling on the folded order→part bipartite
    graph (graph.py kcore, k=16): 8 peel rounds, each one degree shuffle + two
    semi joins, checkpointed like pagerank.  Fixed rounds keep the
    result engine-reproducible — the oracle unrolls the identical
    rounds relationally."""
    from kevinlang_spark.operators.graph import kcore

    li = _t(spark, sf_dir, "lineitem")
    edges = (
        li.select(
            (F.col("l_orderkey") % 3000).alias("a"),
            (F.col("l_partkey") % 3000 + 3000).alias("b"),
        )
        .distinct()
    )
    return kcore(edges, k=16, rounds=8)


def q_harmonic_centrality(spark, sf_dir):
    """Sampled harmonic centrality from 4 sources (graph.py
    harmonic_centrality): ALL sources propagate in one bounded-round
    loop keyed (source, node) — adding sources widens the key space
    instead of multiplying rounds."""
    from kevinlang_spark.operators.graph import harmonic_centrality

    li = _t(spark, sf_dir, "lineitem")
    edges = (
        li.select(
            (F.col("l_orderkey") % 2000).alias("a"),
            (F.col("l_partkey") % 2000 + 2000).alias("b"),
        )
        .distinct()
    )
    return harmonic_centrality(edges, [0, 1, 2, 3], rounds=4)


def q_shortest_paths(spark, sf_dir):
    """Bounded-round Bellman–Ford SSSP (graph.py shortest_paths) from
    node 0 on the weighted folded order→part graph (edge weight = min
    quantity): 6 relaxation rounds, node-key shuffles only.  Distances
    accumulate identically per path in any engine, so the oracle's
    unrolled relaxation matches bit-for-bit."""
    from kevinlang_spark.operators.graph import shortest_paths

    li = _t(spark, sf_dir, "lineitem")
    edges = (
        li.select(
            (F.col("l_orderkey") % 2000).alias("src"),
            (F.col("l_partkey") % 2000 + 2000).alias("dst"),
            F.col("l_quantity"),
        )
        .groupBy("src", "dst")
        .agg(F.min("l_quantity").alias("w"))
    )
    # make it traversable both ways: add the reverse edges
    sym = edges.unionByName(
        edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
        )
    )
    return shortest_paths(sym, source=0, rounds=6, weight="w")


def q_wl_refinement(spark, sf_dir):
    """Weisfeiler–Lehman color refinement (3 rounds, graph.py
    wl_refinement) on the folded order→part graph: structural
    fingerprints — nodes share a label iff their radius-3 neighborhoods
    are identical.  Output is the structure-class histogram."""
    from kevinlang_spark.operators.graph import wl_refinement

    li = _t(spark, sf_dir, "lineitem")
    edges = (
        li.select(
            (F.col("l_orderkey") % 3000).alias("a"),
            (F.col("l_partkey") % 3000 + 3000).alias("b"),
        )
        .distinct()
    )
    wl = wl_refinement(edges, rounds=3)
    return wl.groupBy("wl_label").agg(
        F.count("*").cast("bigint").alias("n_nodes")
    )


def q_lpa_communities(spark, sf_dir):
    """Deterministic semi-synchronous Label Propagation communities
    (5 rounds, min-label tie-break) on the folded order→part bipartite
    graph (graph.py label_propagation).  Output is the community-size
    histogram: (label, n_members) for surviving labels — the shape a
    curation pipeline reads ("how many near-communities, how big")."""
    from kevinlang_spark.operators.graph import label_propagation

    li = _t(spark, sf_dir, "lineitem")
    edges = (
        li.select(
            (F.col("l_orderkey") % 12000).alias("a"),
            (F.col("l_partkey") % 12000 + 12000).alias("b"),
        )
        .distinct()
    )
    labels = label_propagation(edges, rounds=5)
    return labels.groupBy("label").agg(
        F.count("*").cast("bigint").alias("n_members")
    )


def q_hits(spark, sf_dir):
    """HITS hubs/authorities (8 L1-normalized iterations) on the
    directed supplier→part purchasing graph: suppliers are hubs, parts
    authorities.  Top 15 authorities with hub/auth scores; rank by
    rounded score with id tie-break so the cut is engine-reproducible."""
    from kevinlang_spark.operators.graph import hits

    li = _t(spark, sf_dir, "lineitem")
    edges = li.select(
        (F.col("l_suppkey") % 400).alias("src"),
        (F.col("l_partkey") % 400 + 400).alias("dst"),
    )
    h = hits(edges, iterations=8)
    scored = h.select(
        "node", F.round("hub", 8).alias("hub"), F.round("auth", 8).alias("auth")
    )
    return (
        scored.orderBy(F.col("auth").desc(), F.col("node").asc())
        .limit(15)
    )


def q_cube_revenue(spark, sf_dir):
    """OLAP CUBE over (nation, order-year): every grouping-set subtotal
    plus the grand total in ONE pass — Catalyst expands the cube into a
    single Expand + hash aggregate (4 output streams per input row,
    map-side combined), never four scans.  gid = grouping(nation)*2 +
    grouping(year), the SQL-standard bit order both engines share."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    j = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .select(
            F.col("n_name"),
            F.year("o_orderdate").alias("o_year"),
            F.col("o_totalprice"),
        )
    )
    return (
        j.cube("n_name", "o_year")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").cast("bigint").alias("n_orders"),
            (F.grouping("n_name") * 2 + F.grouping("o_year"))
            .cast("int")
            .alias("gid"),
        )
    )


def q_rollup_revenue(spark, sf_dir):
    """ROLLUP (region → nation) hierarchy subtotals in one pass — the
    drill-down twin of q_cube_revenue (3 grouping sets, not 4: rollup
    never emits nation-without-region)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    j = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .select("r_name", "n_name", "o_totalprice")
    )
    return (
        j.rollup("r_name", "n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            (F.grouping("r_name") * 2 + F.grouping("n_name"))
            .cast("int")
            .alias("gid"),
        )
    )


def q_sparse_cosine(spark, sf_dir):
    """All-pairs TF-IDF cosine ≥ 0.5 over documents (text.py
    sparse_cosine_pairs): the lexical near-dup detector when no
    embedding model is in the loop.  One term-keyed self-join of
    unit-normalized weights with the df ≤ 100 stopword cap bounding
    every join group."""
    from kevinlang_spark.operators.text import sparse_cosine_pairs

    docs = _t(spark, sf_dir, "documents")
    return sparse_cosine_pairs(docs, threshold=0.5, max_df=100)


def q_bloom_filter(spark, sf_dir):
    """Bloom-filter membership (sketches.py bloom_build/bloom_probe):
    build a 16384-bit / 5-hash filter over the customers that placed
    orders, probe EVERY customer.  The filter is its set-bit rows
    (mergeable, broadcastable kilobytes); the oracle recomputes the
    identical md5-prefix bit positions, so false positives match
    bit-for-bit, not just in rate."""
    from kevinlang_spark.operators.sketches import bloom_build, bloom_probe

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    filt = bloom_build(orders, "o_custkey", m=1 << 14, k=5)
    return bloom_probe(
        filt, cust.select(F.col("c_custkey")), "c_custkey", m=1 << 14, k=5
    ).select(F.col("value").alias("c_custkey"), "maybe_present")


def q_pca_components(spark, sf_dir):
    """Top-2 principal components via power iteration + Hotelling
    deflation (pca.py pca_top_components): one covariance pass, two
    sequential eigenpairs, per-component explained-variance ratios
    over the ORIGINAL trace (their sum reads cumulative variance)."""
    from kevinlang_spark.operators.pca import pca_top_components

    emb = _t(spark, sf_dir, "embeddings")
    return pca_top_components(emb, "embedding", dim=64, n_components=2)


def q_pca_scores(spark, sf_dir):
    """Distributed PCA application: project EVERY embedding onto the
    top component (pca.py loadings broadcast as literals, dot product a
    scan-stage fold) — the per-row half of the PCA story; top-10 by
    |score| with rounded-score + id tie-breaks."""
    from kevinlang_spark.operators.pca import pca_top_component

    emb = _t(spark, sf_dir, "embeddings")
    pc = pca_top_component(emb, "embedding", dim=64, iterations=12)
    loadings = [r["loading"] for r in pc.orderBy("dim").collect()]
    lit_arr = F.array(*[F.lit(float(v)) for v in loadings])
    score = F.round(
        F.aggregate(
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                lit_arr,
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )
    scored = emb.where(
        F.col("embedding").isNotNull() & (F.size("embedding") == 64)
    ).select("vec_id", score.alias("score"))
    return scored.orderBy(F.abs(F.col("score")).desc(), F.col("vec_id").asc()).limit(
        10
    )


def q_sorted_neighborhood(spark, sf_dir):
    """Sorted-neighborhood near-dup candidates (Hernández–Stolfo) over
    documents: normalized-prefix sort key, bucket-partitioned ranks,
    bounded block join (≤2·window rows per join group), Levenshtein
    verify.  The oracle replays the same key/rank semantics with the
    simple within-bucket rank-distance join."""
    from kevinlang_spark.operators.dedup import sorted_neighborhood_pairs

    docs = _t(spark, sf_dir, "documents")
    return sorted_neighborhood_pairs(
        docs, "text", "doc_id", key_len=24, bucket_prefix=2, window=5, max_dist=6
    )


def q_pca_top_component(spark, sf_dir):
    """Distributed PCA top component over the 64-dim embeddings
    (pca.py): one corpus pass builds mean + covariance (numpy
    outer-product partials per Arrow batch → d² metadata rows), then
    12 deterministic power-iteration steps on the collected d×d
    matrix.  Output = 64 loadings + the explained-variance ratio (the
    embedding-anisotropy diagnostic); sign canonicalized so the replay
    is engine-reproducible."""
    from kevinlang_spark.operators.pca import pca_top_component

    emb = _t(spark, sf_dir, "embeddings")
    return pca_top_component(emb, "embedding", dim=64, iterations=12)


def q_link_prediction(spark, sf_dir):
    """Adamic–Adar link prediction on the folded order→part graph
    (graph.py adamic_adar): top-20 non-adjacent pairs by
    Σ 1/ln(deg(z)) over common neighbors, hub-capped at deg ≤ 64 so
    the two-hop join stays bounded."""
    from kevinlang_spark.operators.graph import adamic_adar

    li = _t(spark, sf_dir, "lineitem")
    edges = (
        li.select(
            (F.col("l_orderkey") % 3000).alias("a"),
            (F.col("l_partkey") % 3000 + 3000).alias("b"),
        )
        .distinct()
    )
    return adamic_adar(edges, k=20, max_deg=64)


def q_rank_fusion(spark, sf_dir):
    """Reciprocal Rank Fusion of two retrieval rankings for the same
    query (cosine top-20 vs raw-inner-product top-20): the zero-tuning
    hybrid-retrieval ensemble (Cormack 2009).  Rankings come from
    corpus-scale scans; the fusion is a ≤2k-row metadata merge.  Ranks
    use the broadcast self-join count (no unpartitioned window)."""
    from kevinlang_spark.functions.vectors import cosine_similarity, dot
    from kevinlang_spark.operators.similarity import _query_lit
    from kevinlang_spark.operators.stats import reciprocal_rank_fusion

    emb = _t(spark, sf_dir, "embeddings")
    q = _query_lit(_query_vec(spark, sf_dir))

    def topk(score, k=20):
        t = (
            emb.select("vec_id", score.alias("__s"))
            .orderBy(F.col("__s").desc(), F.col("vec_id").asc())
            .limit(k)
            # materialize the k-row cut ONCE (r12 optimization round):
            # the x/y self-join below consumes t twice, and an
            # unmaterialized t re-runs the corpus scan + TakeOrdered per
            # consumer — the multi-consumer scan-stage rule (SCALE.md)
            .localCheckpoint(eager=True)
        )
        x, y = t.alias("x"), t.alias("y")
        ahead = (F.col("y.__s") > F.col("x.__s")) | (
            (F.col("y.__s") == F.col("x.__s"))
            & (F.col("y.vec_id") < F.col("x.vec_id"))
        )
        return (
            x.join(F.broadcast(y), ahead, "left")
            .groupBy(F.col("x.vec_id").alias("vec_id"))
            .agg((F.count("y.vec_id") + 1).cast("int").alias("rank"))
        )

    a = topk(cosine_similarity(F.col("embedding"), q))
    b = topk(dot(F.col("embedding"), q))
    return reciprocal_rank_fusion([a, b], "vec_id")


#: BM25 query vocabulary shared by q_bm25_search / q_hybrid_retrieval and
#: their oracles — high-frequency testdata vocabulary words.
_BM25_TERMS = ["spark", "join", "window"]


def q_bm25_search(spark, sf_dir):
    """Okapi BM25 top-10 for a 3-term query over the documents corpus
    (text.py bm25_scores): the exploded token stream is filtered to the
    query vocabulary in the scan stage, corpus stats (N, avgdl) ride a
    1-row broadcast, and the cut ranks on the ROUNDED score with a
    doc_id tie-break so it is engine-reproducible."""
    from kevinlang_spark.operators.text import bm25_scores

    docs = _t(spark, sf_dir, "documents")
    return (
        bm25_scores(docs, _BM25_TERMS)
        .orderBy(F.col("bm25").desc(), F.col("id").asc())
        .limit(10)
        .select(F.col("id").alias("doc_id"), "n_terms", "bm25")
    )


def q_hybrid_retrieval(spark, sf_dir):
    """Hybrid retrieval, the full RAG stack in one plan: lexical BM25
    top-20 over documents + dense cosine top-20 over the paired
    embeddings (doc_id ≡ vec_id), fused with Reciprocal Rank Fusion
    (c=60).  Both rankings cut and rank on ROUNDED scores with id
    tie-breaks (membership must match across engines for ranks to
    match); ranks use the 20-row broadcast self-join count from
    q_rank_fusion (no unpartitioned window); the fusion itself is a
    ≤40-row metadata merge however large the corpus scans were."""
    from kevinlang_spark.functions.vectors import cosine_similarity
    from kevinlang_spark.operators.similarity import _query_lit
    from kevinlang_spark.operators.stats import reciprocal_rank_fusion
    from kevinlang_spark.operators.text import bm25_scores

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")

    def rank20(t, score_col):
        x, y = t.alias("x"), t.alias("y")
        ahead = (F.col(f"y.{score_col}") > F.col(f"x.{score_col}")) | (
            (F.col(f"y.{score_col}") == F.col(f"x.{score_col}"))
            & (F.col("y.id") < F.col("x.id"))
        )
        return (
            x.join(F.broadcast(y), ahead, "left")
            .groupBy(F.col("x.id").alias("id"))
            .agg((F.count("y.id") + 1).cast("int").alias("rank"))
        )

    # materialize both 20-row cuts ONCE (r12 optimization round):
    # rank20's x/y self-join consumes each frame twice, and an
    # unmaterialized frame re-runs the whole corpus-scale BM25 / cosine
    # pipeline per consumer — the plan carried 20 parquet scans; with
    # the two eager checkpoints the rankings compute once each (the
    # multi-consumer scan-stage rule, SCALE.md)
    lex = (
        bm25_scores(docs, _BM25_TERMS)
        .orderBy(F.col("bm25").desc(), F.col("id").asc())
        .limit(20)
        .select("id", "bm25")
        .localCheckpoint(eager=True)
    )
    q = _query_lit(_query_vec(spark, sf_dir, vec_id=1))
    dense = (
        emb.select(
            F.col("vec_id").alias("id"),
            F.round(cosine_similarity(F.col("embedding"), q), 6).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), F.col("id").asc())
        .limit(20)
        .localCheckpoint(eager=True)
    )
    fused = reciprocal_rank_fusion(
        [rank20(lex, "bm25"), rank20(dense, "sim")], "id"
    )
    return fused.select(F.col("id").alias("doc_id"), "n_lists", "rrf")


def q_repeated_spans(spark, sf_dir):
    """Corpus-wide repeated-substring audit (n-gram-anchored Lee et al.
    2022 exact-substring dedup, dedup.py repeated_span_stats): per-doc
    fraction of tokens covered by an 8-gram occurring ≥2 times in the
    corpus.  One 8-byte gram-key shuffle + a per-doc window pass —
    never a global suffix sort; oracle runs the identical interval
    algebra on gram strings."""
    from kevinlang_spark.operators.dedup import repeated_span_stats

    docs = _t(spark, sf_dir, "documents")
    return repeated_span_stats(docs, n=8, min_count=2)


def q_grouping_sets(spark, sf_dir):
    """OLAP GROUPING SETS — the custom-set member of the cube/rollup
    trio: ((nation, year), (year), ()) gives detail, per-year, and
    grand-total streams while SKIPPING the per-nation set a rollup
    would force.  One Expand + map-side-combined hash aggregate, one
    scan; gid uses the SQL-standard grouping-bit order shared with
    cube/rollup and the oracle."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    j = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .select(
            F.col("n_name"),
            F.year("o_orderdate").alias("o_year"),
            F.col("o_totalprice"),
        )
    )
    return (
        j.groupingSets(
            [["n_name", "o_year"], ["o_year"], []], "n_name", "o_year"
        )
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").cast("bigint").alias("n_orders"),
            (F.grouping("n_name") * 2 + F.grouping("o_year"))
            .cast("int")
            .alias("gid"),
        )
    )


def q_vocab_coverage(spark, sf_dir):
    """Tokenizer-vocabulary OOV audit per source (text.py
    vocab_coverage): top-100 df-ranked corpus vocabulary folded back as
    a literal array, coverage measured scan-stage in one pass — the
    check a pretraining pipeline runs before trusting a tokenizer on a
    new data source."""
    from kevinlang_spark.operators.text import vocab_coverage

    docs = _t(spark, sf_dir, "documents")
    return vocab_coverage(docs, vocab_size=100, by="source").orderBy("source")


def q_frequent_sequences(spark, sf_dir):
    """Distributed PrefixSpan: ordered behavior patterns (length ≤ 2)
    appearing in ≥ half of user event sequences.  At length ≤ 2 support
    counting is reproducible relationally (first-position(a) <
    last-position(b) per user), so the ML pipeline output is fully
    oracle-checked."""
    from kevinlang_spark.operators.baskets import frequent_sequences

    return frequent_sequences(_events(spark, sf_dir))


def q_ann_pq(spark, sf_dir):
    """Product-quantization ANN (Jégou et al. 2011): train m=2 × k=8
    subspace codebooks with two deterministic Lloyd iterations (seed
    centroids = subvectors of vec_id 0..7, rounded-distance argmin,
    smallest-index ties, emptied clusters keep their centroid), encode
    every vector to its code tuple, and rank by the asymmetric-distance
    LUT sum for the vec_id=3 probe.  Unlike the IVF/LSH queries this
    oracle checks the QUANTIZED result itself: DuckDB unrolls the same
    two Lloyd iterations (same init, same rounding, same tie-breaks) and
    recomputes codes + ADC distances exactly."""
    from kevinlang_spark.operators.similarity import pq_topk, pq_train

    emb = _t(spark, sf_dir, "embeddings")
    books = pq_train(emb, m=2, k=8, iters=2)
    return pq_topk(emb, books, _query_vec(spark, sf_dir, vec_id=3), k_out=10)


def q_bpe_train(spark, sf_dir):
    """BPE tokenizer training: 8 rounds of (corpus-wide adjacent-pair
    count → merge the argmax pair), returning the learned merge table —
    the vocabulary-learning loop behind GPT/Llama tokenizers.  The
    corpus collapses to the (word, freq) vocab table in one wordcount
    shuffle; the merge loop then runs LOCALLY over the collected vocab
    (text.py bpe_train_local — the r11-VERDICT production shape, byte-
    identical to the distributed trainer by pytest parity gate): the
    vocab table is ~10⁷ rows at 100 TB, and 8 driver-sequential Spark
    argmax jobs cost more scheduler latency than the whole local loop
    (r12 measured: 2.3 s → 1.0 s at sf0.1, identical rows).  The DuckDB
    oracle unrolls the identical 8 rounds and still matches."""
    from kevinlang_spark.operators.text import bpe_merges_local_df

    return bpe_merges_local_df(_t(spark, sf_dir, "documents"), n_merges=8)


def q_bpe_train_vocab(spark, sf_dir):
    """Production-vocab BPE training (text.py bpe_train_local, VERDICT
    r11 item 2): the corpus-scale wordcount is the one distributed
    shuffle (100 TB collapses to its ~10⁷ distinct words), then the
    1000-merge training loop runs locally over the collected (word,
    freq) table with a lazy-deletion max-heap and incremental
    pair-count deltas — seconds of CPU instead of 1000
    driver-sequential Spark jobs.  Semantics are byte-identical to the
    distributed trainer (pytest parity-gates the first 8 merges, which
    ARE oracled via q_bpe_train); the training corpus unions
    documents.text with customer names so the digit-rich vocabulary
    genuinely supports >= 1000 merges.  No oracle_sql: a 1000-round
    argmax loop is not SQL-expressible (the 8-round oracle unroll is
    already ~the practical limit); the driver records the rows-only
    check and tests/test_bpe_vocab.py carries the correctness gate."""
    from kevinlang_spark.operators.text import bpe_merges_local_df

    docs = _t(spark, sf_dir, "documents").select("text")
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_name").alias("text")
    )
    return bpe_merges_local_df(docs.union(cust), n_merges=1000)


def q_bpe_vocab_sweep(spark, sf_dir):
    """Vocabulary-size sweep (text.py bpe_vocab_sweep): corpus token
    totals / fertility / chars-per-token at four candidate vocab
    sizes from ONE local training pass — the trainer's vocab state
    after k merges IS the encoding under the first k merges, so the
    sweep adds an on_merge hook, not re-encodes.  Same corpus as
    q_bpe_train_vocab; checkpoints past pair exhaustion report the
    saturated state with their effective merge count (fertility
    exactly 1.0 at saturation).  No oracle_sql (iterative argmax, the
    q_bpe_train_vocab class); tests pin the census against the
    encode-path numbers."""
    from kevinlang_spark.operators.text import bpe_vocab_sweep

    docs = _t(spark, sf_dir, "documents").select("text")
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_name").alias("text")
    )
    return bpe_vocab_sweep(
        docs.union(cust), checkpoints=(64, 256, 1024, 4096)
    )


def q_bpe_encode(spark, sf_dir):
    """Tokenize the corpus with a TRAINED BPE vocabulary (text.py
    bpe_token_counts): train 8 merges, encode the DISTINCT-word table
    once (the 100 TB trick — the merge fold runs at vocabulary scale,
    never per token), then join the word→n_subtokens map back to the
    exploded corpus for per-document token budgets.  The oracle unrolls
    the identical training rounds AND the encode join."""
    from kevinlang_spark.operators.text import bpe_token_counts, bpe_train_local

    docs = _t(spark, sf_dir, "documents")
    # local trainer (r12): byte-identical merges (pytest parity gate),
    # one wordcount collect instead of 8 driver-sequential argmax jobs
    merges = bpe_train_local(docs, n_merges=8)
    return bpe_token_counts(docs, merges)


def q_source_kl(spark, sf_dir):
    """Per-source KL divergence from the corpus unigram distribution
    (text.py source_kl_divergence) — the domain-shift diagnostic a
    data-mixing recipe reads.  The absent-word smoothing mass collapses
    to closed form, so the plan is one (source, word) count shuffle +
    a word-keyed join + scalar broadcasts — never a dense
    vocab × source matrix."""
    from kevinlang_spark.operators.text import source_kl_divergence

    docs = _t(spark, sf_dir, "documents")
    return source_kl_divergence(docs).orderBy("source")


def q_ann_ivfpq(spark, sf_dir):
    """IVF-PQ probe (similarity.py ivfpq_topk) — the FAISS-style
    production ANN composition: a deterministic-Lloyd coarse quantizer
    (pq_train with m=1) prunes the scan to the 3/8 cells nearest the
    vec_id=3 probe, then PQ asymmetric distances rank the survivors
    from their codes.  The oracle unrolls coarse training, cell
    assignment, probe selection, PQ training, encoding, and the ADC
    ranking — the QUANTIZED pipeline end-to-end."""
    from kevinlang_spark.operators.similarity import ivfpq_topk

    emb = _t(spark, sf_dir, "embeddings")
    return ivfpq_topk(
        emb, _query_vec(spark, sf_dir, vec_id=3), nlist=8, nprobe=3,
        m=2, k=8, iters=2, k_out=10,
    )


def _pq_index_path(spark, sf_dir):
    """Build (once per sf_dir per machine) the persisted PQ index —
    (id, code…) table + codebook table (similarity.py write_pq_index).
    Probes then scan m smallints per row, never raw vectors."""
    import os

    path = _artifact_path(
        sf_dir, "pq_idx", "kevinlang_spark/operators/similarity.py"
    )
    # _codebooks is written LAST — its _SUCCESS marks a complete index
    if not os.path.exists(os.path.join(path, "_codebooks", "_SUCCESS")):
        from kevinlang_spark.operators.similarity import write_pq_index

        write_pq_index(_t(spark, sf_dir, "embeddings"), path, m=2, k=8, iters=2)
    return path


def _ivfpq_index_path(spark, sf_dir):
    """Build (once per sf_dir per machine) the persisted IVF-PQ index —
    the cell-PARTITIONED (id, code…) table plus coarse-centroid and
    codebook tables (similarity.py write_ivfpq_index).  Probes prune
    whole cell directories at the file index."""
    import os

    path = _artifact_path(
        sf_dir, "ivfpq_idx", "kevinlang_spark/operators/similarity.py"
    )
    if not os.path.exists(os.path.join(path, "_codebooks", "_SUCCESS")):
        from kevinlang_spark.operators.similarity import write_ivfpq_index

        write_ivfpq_index(
            _t(spark, sf_dir, "embeddings"), path, nlist=8, m=2, k=8, iters=2
        )
    return path


def q_ann_pq_indexed(spark, sf_dir):
    """PQ ANN through the PERSISTED codes index (similarity.py
    write_pq_index / pq_topk_indexed) — the 100 TB physical shape the
    inline q_ann_pq verifies the math of: training and the full-table
    encode happen ONCE at build time; the probe reads the (id, code…)
    table (m smallints per row, ~32× less IO than raw vectors) and
    sums broadcast-LUT lookups.  Identical output to q_ann_pq — the
    oracle is the same unrolled-Lloyd replay."""
    from kevinlang_spark.operators.similarity import pq_topk_indexed

    return pq_topk_indexed(
        spark, _pq_index_path(spark, sf_dir),
        _query_vec(spark, sf_dir, vec_id=3), k_out=10,
    )


def q_ann_ivfpq_indexed(spark, sf_dir):
    """IVF-PQ through the PERSISTED cell-partitioned index
    (similarity.py write_ivfpq_index / ivfpq_topk_indexed): coarse
    centroids rank driver-side (nlist metadata rows), the scan reads
    ONLY the 3/8 probed cells' partition directories (file-index
    pruning — asserted by tests/test_pq_index.py via runtime
    input_file_name counts), and ADC ranks the surviving codes.  Same
    result as the inline q_ann_ivfpq; the oracle is the same
    end-to-end unrolled replay."""
    from kevinlang_spark.operators.similarity import ivfpq_topk_indexed

    return ivfpq_topk_indexed(
        spark, _ivfpq_index_path(spark, sf_dir),
        _query_vec(spark, sf_dir, vec_id=3), nprobe=3, k_out=10,
    )


def _ivfpq_refresh_index_path(spark, sf_dir):
    """Build (once per sf_dir per code version) the INCREMENTALLY
    REFRESHED IVF-PQ index: the static build runs on the BASE slice
    (vec_id < 8 — the Lloyd seeds — plus vec_id % 4 != 1), then
    append_ivfpq_index encodes the remaining ~25% of rows against the
    FROZEN stored codebooks and appends them into the cell-partitioned
    codes table — the weekly-growing-corpus production shape (VERDICT
    r8 item 2).  A _REFRESH_DONE marker (written after the append)
    gates the build; _artifact_path keys the cache by code version."""
    import os

    path = _artifact_path(
        sf_dir, "ivfpq_refresh", "kevinlang_spark/operators/similarity.py"
    )
    marker = os.path.join(path, "_REFRESH_DONE")
    if not os.path.exists(marker):
        from kevinlang_spark.operators.similarity import (
            append_ivfpq_index,
            write_ivfpq_index,
        )

        emb = _t(spark, sf_dir, "embeddings")
        base = emb.where((F.col("vec_id") < 8) | (F.col("vec_id") % 4 != 1))
        fresh = emb.where((F.col("vec_id") >= 8) & (F.col("vec_id") % 4 == 1))
        write_ivfpq_index(base, path, nlist=8, m=2, k=8, iters=2)
        append_ivfpq_index(fresh, path)
        with open(marker, "w"):
            pass
    return path


def q_ann_index_refresh(spark, sf_dir):
    """Probe an IVF-PQ index AFTER an incremental refresh
    (similarity.py append_ivfpq_index): the base slice built the index
    (training + encode), the remaining rows were appended against the
    FROZEN codebooks — O(new) encode, no rewrite of existing cell
    files.  The probe must equal an inline recompute that trains on the
    base but encodes the UNION; the oracle unrolls exactly that
    (training CTEs read the base slice, assignment/encode read every
    row).  Physical shape: the probe still reads only the nprobe
    nearest cells' partition directories — appended files land INSIDE
    the cell directories, so file-index pruning survives the refresh
    (asserted at runtime in tests/test_pq_index.py)."""
    from kevinlang_spark.operators.similarity import ivfpq_topk_indexed

    return ivfpq_topk_indexed(
        spark, _ivfpq_refresh_index_path(spark, sf_dir),
        _query_vec(spark, sf_dir, vec_id=3), nprobe=3, k_out=10,
    )


def q_ann_index_staleness(spark, sf_dir):
    """Retrain-signal census of the refreshed IVF-PQ index
    (similarity.py ivfpq_index_staleness): per cell, rows at build time
    vs now and the appended-fraction drift — appends never retrain, so
    a cell far past its training population is quantizing unseen data
    with stale centroids.  Cost is one scan of the codes table's
    smallints plus the metadata-scale _stats census; the oracle
    recomputes both populations from the unrolled base-trained coarse
    assignment."""
    from kevinlang_spark.operators.similarity import ivfpq_index_staleness

    return ivfpq_index_staleness(
        spark, _ivfpq_refresh_index_path(spark, sf_dir)
    )


def q_class_weights(spark, sf_dir):
    """Class-balanced loss weights via effective number of samples
    (sampling.py class_balanced_weights, Cui et al. 2019) over the
    embedding labels: one count aggregation to class cardinality, the
    normalizer over the handful of class rows — the long-tail
    reweighting every classifier-training pipeline computes."""
    from kevinlang_spark.operators.sampling import class_balanced_weights

    emb = _t(spark, sf_dir, "embeddings")
    return class_balanced_weights(emb, beta=0.999).orderBy("label")


def q_jl_distortion(spark, sf_dir):
    """Johnson–Lindenstrauss projection distortion audit (similarity.py
    jl_distortion): project 64-dim embeddings to 16 dims with a seeded
    Gaussian plane family (scan-stage literal dot products, exactly the
    LSH-hyperplane broadcast pattern) and report the per-pair
    squared-distance ratio over the bounded 16-vector sample — the
    check run before swapping full vectors for projections."""
    from kevinlang_spark.operators.similarity import jl_distortion

    emb = _t(spark, sf_dir, "embeddings")
    return jl_distortion(emb, out_dim=16, seed=11, n_sample=16)


def q_truncation_recall(spark, sf_dir):
    """Matryoshka truncation evaluation (similarity.py
    truncation_recall): recall@10 of cosine top-k computed on the
    16-/32-dim embedding PREFIX vs the full 64 dims, per probe — the
    measurement behind shipping truncated vectors for 2-4× storage/IO
    savings.  Probe set broadcasts; each dim is one scoring scan + one
    per-probe rank window; rankings order on raw similarity with id
    tie-breaks so top-k membership matches the oracle exactly."""
    from kevinlang_spark.operators.similarity import truncation_recall

    emb = _t(spark, sf_dir, "embeddings")
    return truncation_recall(emb, dims=(16, 32), n_probes=4, k=10)


def q_hard_negatives(spark, sf_dir):
    """Contrastive hard-negative mining: for each anchor (vec_id < 8),
    the top-5 most cosine-similar vectors with a DIFFERENT label — the
    near-miss negatives a contrastive loss learns most from.  Anchor set
    broadcasts; label mismatch filters in the scan stage before the
    per-anchor ranking window."""
    from kevinlang_spark.operators.similarity import hard_negatives

    emb = _t(spark, sf_dir, "embeddings")
    out = hard_negatives(emb, n_anchors=8, k=5)
    return out.select("qid", "vec_id", F.round("sim", 4).alias("sim"), "rank")


def q_pipeline_resume(spark, sf_dir):
    """Resumable stage-manifest pipeline (kevinlang_spark/pipeline.py)
    end-to-end: ingest → length-filter → per-source report, each stage
    materialized under a code-versioned artifact root with a
    fingerprint manifest, so re-invocations SKIP completed stages and a
    crashed run resumes at the failed stage — the production shape for
    multi-stage 100 TB curation runs.  Skip/resume/invalidation
    semantics are pytest-asserted (tests/test_pipeline_runner.py); this
    query proves the MATERIALIZED output equals the straight-through
    computation (the oracle replays the whole pipeline as one SQL
    statement).  The reference has no pipeline layer (frames rebuild
    per program run); beyond-reference capability."""
    from kevinlang_spark.pipeline import Stage, run_pipeline

    def ingest(spark):
        return _t(spark, sf_dir, "documents").select(
            "doc_id", "source", "text"
        )

    def filt(ingest):
        return ingest.where(F.length("text") >= 400)

    def report(filt):
        return filt.groupBy("source").agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("text")).alias("n_chars"),
        )

    root = _artifact_path(sf_dir, "pipeline", "kevinlang_spark/pipeline.py")
    out = run_pipeline(
        spark,
        [
            # ingest closes over sf_dir (invisible to a source hash):
            # fold it into an explicit version token
            Stage("ingest", ingest, version=f"ingest-v1-{sf_dir}"),
            Stage("filt", filt, inputs=("ingest",)),
            Stage("report", report, inputs=("filt",)),
        ],
        root,
    )
    return out["report"]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q_trigram_search": q_trigram_search,
        "q_winnow_fingerprints": q_winnow_fingerprints,
        "q_zorder_keys": q_zorder_keys,
        "q_ann_probe_pruned": q_ann_probe_pruned,
        "q_semantic_dedup": q_semantic_dedup,
        "q_theta_overlap": q_theta_overlap,
        "q_cms_tokens": q_cms_tokens,
        "q_approx_distinct": q_approx_distinct,
        "q_approx_quantile": q_approx_quantile,
        "q_budget_sample": q_budget_sample,
        "q_chunk_tokens": q_chunk_tokens,
        "q_clean_lines": q_clean_lines,
        "q_click_attribution": q_click_attribution,
        "q_containment": q_containment,
        "q_contamination": q_contamination,
        "q_cube": q_cube,
        "q_equidepth": q_equidepth,
        "q_events_sliding": q_events_sliding,
        "q_funnel": q_funnel,
        "q_fuzzy_join": q_fuzzy_join,
        "q_hash_split": q_hash_split,
        "q_heavy_hitters": q_heavy_hitters,
        "q_histogram": q_histogram,
        "q_inverted_index": q_inverted_index,
        "q_join_estimate": q_join_estimate,
        "q_lm_score": q_lm_score,
        "q_merge_intervals": q_merge_intervals,
        "q_novelty": q_novelty,
        "q_pack_sequences": q_pack_sequences,
        "q_profile": q_profile,
        "q_redact_pii": q_redact_pii,
        "q_repetition_stats": q_repetition_stats,
        "q_resample_ffill": q_resample_ffill,
        "q_retention": q_retention,
        "q_rolling": q_rolling,
        "q_salted_agg": q_salted_agg,
        "q_salted_join": q_salted_join,
        "q_scd2": q_scd2,
        "q_source_overlap": q_source_overlap,
        "q_stratified_sample": q_stratified_sample,
        "q_token_estimate": q_token_estimate,
        "q_transitions": q_transitions,
        "q_twap": q_twap,
        "q_upsert": q_upsert,
        "q_validate": q_validate,
        "q_weighted_sample": q_weighted_sample,
        "q_winsorize": q_winsorize,
        "q_window_dist": q_window_dist,
        "q_prototypicality": q_prototypicality,
        "q_unimax_weights": q_unimax_weights,
        "q_kmeans_fit": q_kmeans_fit,
        "q_interleaved_assign": q_interleaved_assign,
        "q_bt_strength": q_bt_strength,
        "q_grpo_advantages": q_grpo_advantages,
        "q_reward_length_bias": q_reward_length_bias,
        "q_zipf_fit": q_zipf_fit,
        "q_heaps_fit": q_heaps_fit,
        "q_rouge_n": q_rouge_n,
        "q_corpus_bleu": q_corpus_bleu,
        "q_script_census": q_script_census,
        "q_bt_leaderboard": q_bt_leaderboard,
        "q_fleiss_kappa": q_fleiss_kappa,
        "q_chat_trees": q_chat_trees,
        "q_chat_tree_render": q_chat_tree_render,
        "q_winrate_matrix": q_winrate_matrix,
        "q_bt_bootstrap": q_bt_bootstrap,
        "q_pass_at_k": q_pass_at_k,
        "q_majority_vote": q_majority_vote,
        "q_bpe_train_vocab": q_bpe_train_vocab,
        "q_bpe_vocab_sweep": q_bpe_vocab_sweep,
        "q_clustering_coef": q_clustering_coef,
        "q_benford_audit": q_benford_audit,
        "q_calibration_audit": q_calibration_audit,
        "q_spearman_corr": q_spearman_corr,
        "q_neyman_allocation": q_neyman_allocation,
        "q_ranking_metrics": q_ranking_metrics,
        "q_cuped_ab": q_cuped_ab,
        "q_srm_check": q_srm_check,
        "q_ratio_metric": q_ratio_metric,
        "q_geohash_census": q_geohash_census,
        "q_l_diversity": q_l_diversity,
        "q_t_closeness": q_t_closeness,
        "q_asof_directions": q_asof_directions,
        "q_bfd_packing": q_bfd_packing,
        "q_media_ingest": q_media_ingest,
        "q_audio_neardup": q_audio_neardup,
        "q_length_buckets": q_length_buckets,
        "q_span_corruption": q_span_corruption,
        "q_reward_agreement": q_reward_agreement,
        "q_retention_curve": q_retention_curve,
        "q_triangles": q_triangles,
        "q_ann_ivfpq": q_ann_ivfpq,
        "q_ann_pq": q_ann_pq,
        "q_dedup_longest": q_dedup_longest,
        "q_hybrid_retrieval": q_hybrid_retrieval,
        "q_bm25_search": q_bm25_search,
        "q_lpa_communities": q_lpa_communities,
        "q_pagerank": q_pagerank,
        "q_hits": q_hits,
        "q_kcore": q_kcore,
        "q_wl_refinement": q_wl_refinement,
        "q_shortest_paths": q_shortest_paths,
        "q_harmonic_centrality": q_harmonic_centrality,
        "q_stream_dedup": q_stream_dedup,
        "q_stream_hourly": q_stream_hourly,
        "q_stream_join": q_stream_join,
        "q_stream_sessions": q_stream_sessions,
        "q_stream_shards": q_stream_shards,
        "q_stream_sliding": q_stream_sliding,
        "q_stream_stateful": q_stream_stateful,
        "q_stream_warc": q_stream_warc,
        "q_ann_index_refresh": q_ann_index_refresh,
        "q_ann_index_staleness": q_ann_index_staleness,
        "q_ann_ivfpq_indexed": q_ann_ivfpq_indexed,
        "q_ann_pq_indexed": q_ann_pq_indexed,
        "q_record_linkage": q_record_linkage,
        "q_neardup_components": q_neardup_components,
        "q_stream_neardup": q_stream_neardup,
        "q_ann_lsh": q_ann_lsh,
        "q_minhash_pairs": q_minhash_pairs,
        "q_simhash_pairs": q_simhash_pairs,
        "q_knn_cosine": q_knn_cosine,
        "q_dedup_exact": q_dedup_exact,
        "q_dedup_rate": q_dedup_rate,
        "q_dedup_representatives": q_dedup_representatives,
        "q_link_prediction": q_link_prediction,
        "q_ann_ivf": q_ann_ivf,
        "q_ann_lsh_indexed": q_ann_lsh_indexed,
        "q_semantic_clusters": q_semantic_clusters,
        "q_knn_join": q_knn_join,
        "q_kcenter_sample": q_kcenter_sample,
        "q_intrinsic_dim": q_intrinsic_dim,
        "q_hll_rollup": q_hll_rollup,
        "q_kll_rollup": q_kll_rollup,
        "q_bloom_filter": q_bloom_filter,
        "q_radius_join": q_radius_join,
        "q_assoc_rules": q_assoc_rules,
        "q_boilerplate": q_boilerplate,
        "q_bootstrap_mean": q_bootstrap_mean,
        "q_bpe_pairs": q_bpe_pairs,
        "q_cdc_apply": q_cdc_apply,
        "q_char_entropy": q_char_entropy,
        "q_chi_square": q_chi_square,
        "q_cusum": q_cusum,
        "q_decayed_features": q_decayed_features,
        "q_group_ols": q_group_ols,
        "q_interval_overlap": q_interval_overlap,
        "q_k_anonymity": q_k_anonymity,
        "q_keyfilter_join": q_keyfilter_join,
        "q_line_dedup": q_line_dedup,
        "q_mad_outliers": q_mad_outliers,
        "q_mixture_weights": q_mixture_weights,
        "q_ngram_diversity": q_ngram_diversity,
        "q_psi_drift": q_psi_drift,
        "q_seasonal_anomalies": q_seasonal_anomalies,
        "q_snapshot_diff": q_snapshot_diff,
        "q_target_encode": q_target_encode,
        "q_window_dedup": q_window_dedup,
        "q_ab_test": q_ab_test,
        "q_attribution_linear": q_attribution_linear,
        "q_backtest": q_backtest,
        "q_benford": q_benford,
        "q_bpe_encode": q_bpe_encode,
        "q_bpe_train": q_bpe_train,
        "q_class_weights": q_class_weights,
        "q_corr_matrix": q_corr_matrix,
        "q_dp_counts": q_dp_counts,
        "q_ewma_smooth": q_ewma_smooth,
        "q_funnel_latency": q_funnel_latency,
        "q_gini": q_gini,
        "q_grouping_sets": q_grouping_sets,
        "q_hard_negatives": q_hard_negatives,
        "q_incremental_agg": q_incremental_agg,
        "q_jaccard_prefix": q_jaccard_prefix,
        "q_jl_distortion": q_jl_distortion,
        "q_join_ivm": q_join_ivm,
        "q_label_centroids": q_label_centroids,
        "q_mahalanobis": q_mahalanobis,
        "q_mode": q_mode,
        "q_paths": q_paths,
        "q_quantize_embeddings": q_quantize_embeddings,
        "q_rank_overlap": q_rank_overlap,
        "q_repeated_spans": q_repeated_spans,
        "q_resample_lerp": q_resample_lerp,
        "q_rfm": q_rfm,
        "q_skyline": q_skyline,
        "q_source_kl": q_source_kl,
        "q_survival": q_survival,
        "q_temporal_join": q_temporal_join,
        "q_top_tokens_per_source": q_top_tokens_per_source,
        "q_truncation_recall": q_truncation_recall,
        "q_vocab_coverage": q_vocab_coverage,
        "q_crawl_pagerank": q_crawl_pagerank,
        "q_docx_extract": q_docx_extract,
        "q_html_extract": q_html_extract,
        "q_link_extract": q_link_extract,
        "q_lr_eval": q_lr_eval,
        "q_lr_score": q_lr_score,
        "q_lr_train": q_lr_train,
        "q_media_avi": q_media_avi,
        "q_mime_sniff": q_mime_sniff,
        "q_pipeline_resume": q_pipeline_resume,
        "q_quality_score": q_quality_score,
        "q_warc_ingest": q_warc_ingest,
        "q_warc_pipeline": q_warc_pipeline,
        "q_webdataset": q_webdataset,
        "q_webdataset_pipeline": q_webdataset_pipeline,
        "q_zip_ingest": q_zip_ingest,
        "q_argmax": q_argmax,
        "q_asof_join": q_asof_join,
        "q_chat_loss_spans": q_chat_loss_spans,
        "q_chat_template": q_chat_template,
        "q_code_stats": q_code_stats,
        "q_corpus_filter": q_corpus_filter,
        "q_corr": q_corr,
        "q_date_parts": q_date_parts,
        "q_domain_cap": q_domain_cap,
        "q_emb_neardup_brute": q_emb_neardup_brute,
        "q_encoding_quality": q_encoding_quality,
        "q_explode_tokens": q_explode_tokens,
        "q_gopher_rules": q_gopher_rules,
        "q_image_crossformat": q_image_crossformat,
        "q_image_dedup": q_image_dedup,
        "q_image_phash": q_image_phash,
        "q_json_extract": q_json_extract,
        "q_lm_perplexity": q_lm_perplexity,
        "q_media_flac": q_media_flac,
        "q_media_frames": q_media_frames,
        "q_media_gif": q_media_gif,
        "q_media_jpeg": q_media_jpeg,
        "q_media_pixels": q_media_pixels,
        "q_median": q_median,
        "q_multimodal_features": q_multimodal_features,
        "q_pdf_extract": q_pdf_extract,
        "q_quantiles": q_quantiles,
        "q_range_join": q_range_join,
        "q_rollup": q_rollup,
        "q_set_ops": q_set_ops,
        "q_tpch_q10": q_tpch_q10,
        "q_transform_zscore": q_transform_zscore,
        "q_url_normalize": q_url_normalize,
        "q_video_neardup": q_video_neardup,
        "q_zstd_ingest": q_zstd_ingest,
        "q_agg_concat": q_agg_concat,
        "q_agg_global": q_agg_global,
        "q_agg_stats": q_agg_stats,
        "q_append": q_append,
        "q_best_of_n": q_best_of_n,
        "q_bitext_mine": q_bitext_mine,
        "q_cast_pivot": q_cast_pivot,
        "q_chat_multiturn": q_chat_multiturn,
        "q_chat_multiturn_spans": q_chat_multiturn_spans,
        "q_chat_token_spans": q_chat_token_spans,
        "q_chat_token_spans_static": q_chat_token_spans_static,
        "q_code_pipeline": q_code_pipeline,
        "q_dpo_pairs": q_dpo_pairs,
        "q_epoch_shuffle": q_epoch_shuffle,
        "q_events_hourly": q_events_hourly,
        "q_events_sessions": q_events_sessions,
        "q_filter": q_filter,
        "q_fim_context": q_fim_context,
        "q_fim_spm": q_fim_spm,
        "q_fim_transform": q_fim_transform,
        "q_groupby_sum": q_groupby_sum,
        "q_image_neardup": q_image_neardup,
        "q_image_pipeline": q_image_pipeline,
        "q_interleaved_media": q_interleaved_media,
        "q_langid": q_langid,
        "q_melt": q_melt,
        "q_ngram_jaccard": q_ngram_jaccard,
        "q_packed_spans": q_packed_spans,
        "q_packing_report": q_packing_report,
        "q_pos_join": q_pos_join,
        "q_revenue_by_nation": q_revenue_by_nation,
        "q_robots_filter": q_robots_filter,
        "q_select": q_select,
        "q_slice": q_slice,
        "q_sort_take": q_sort_take,
        "q_text_stats": q_text_stats,
        "q_tokenizer_fertility": q_tokenizer_fertility,
        "q_tokens_by_source": q_tokens_by_source,
        "q_tpch_q1": q_tpch_q1,
        "q_tpch_q11": q_tpch_q11,
        "q_tpch_q12": q_tpch_q12,
        "q_tpch_q13": q_tpch_q13,
        "q_tpch_q14": q_tpch_q14,
        "q_acf": q_acf,
        "q_corpus_report": q_corpus_report,
        "q_cube_revenue": q_cube_revenue,
        "q_curation_chunks": q_curation_chunks,
        "q_dsir_weights": q_dsir_weights,
        "q_fd_check": q_fd_check,
        "q_feature_hash": q_feature_hash,
        "q_fingerprint_clusters": q_fingerprint_clusters,
        "q_frequent_sequences": q_frequent_sequences,
        "q_leakage_split": q_leakage_split,
        "q_markov_attribution": q_markov_attribution,
        "q_media_decode": q_media_decode,
        "q_pca_components": q_pca_components,
        "q_pca_scores": q_pca_scores,
        "q_pca_top_component": q_pca_top_component,
        "q_rank_fusion": q_rank_fusion,
        "q_rollup_revenue": q_rollup_revenue,
        "q_sorted_neighborhood": q_sorted_neighborhood,
        "q_sparse_cosine": q_sparse_cosine,
        "q_tfidf_top_terms": q_tfidf_top_terms,
        "q_token_pmi": q_token_pmi,
        "q_tpch_q15": q_tpch_q15,
        "q_tpch_q16": q_tpch_q16,
        "q_tpch_q17": q_tpch_q17,
        "q_tpch_q18": q_tpch_q18,
        "q_tpch_q19": q_tpch_q19,
        "q_tpch_q2": q_tpch_q2,
        "q_tpch_q20": q_tpch_q20,
        "q_tpch_q21": q_tpch_q21,
        "q_tpch_q22": q_tpch_q22,
        "q_tpch_q3": q_tpch_q3,
        "q_tpch_q4": q_tpch_q4,
        "q_tpch_q5": q_tpch_q5,
        "q_tpch_q6": q_tpch_q6,
        "q_tpch_q7": q_tpch_q7,
        "q_tpch_q8": q_tpch_q8,
        "q_tpch_q9": q_tpch_q9,
        "q_window_lag": q_window_lag,
        "q_window_rank": q_window_rank,
    }


# Shared prefix for the near-dup graph oracles: exact word-3-gram shingle
# Jaccard >= 0.8 pairs (equals q_minhash_pairs' output), symmetrized to an
# edge list, then the transitive closure via a recursive CTE.  DuckDB's
# UNION-recursion deduplicates, so `reach` is the full reachability
# relation — min over it reproduces min-label-propagation's fixpoint.
_NEARDUP_PAIR_CTE = (
    "WITH RECURSIVE toks AS (SELECT doc_id AS id, list_filter("
    "string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t "
    "FROM documents), "
    "sh AS (SELECT id, unnest(list_distinct(list_transform("
    "range(1, greatest(len(t) - 2, 1) + 1), "
    "i -> array_to_string(t[i:i+2], ' ')))) AS s "
    "FROM toks WHERE len(t) > 0), "
    "sizes AS (SELECT id, COUNT(*) AS sz FROM sh GROUP BY id), "
    "cand AS (SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_inter "
    "FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id GROUP BY 1, 2), "
    "pairs AS (SELECT id_a, id_b FROM cand JOIN sizes sa ON id_a = sa.id "
    "JOIN sizes sb ON id_b = sb.id "
    "WHERE n_inter / CAST(sa.sz + sb.sz - n_inter AS DOUBLE) >= 0.8), "
    "edges AS (SELECT id_a AS s, id_b AS d FROM pairs "
    "UNION SELECT id_b, id_a FROM pairs), "
    "reach AS (SELECT s, d FROM edges "
    "UNION SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s) "
)


def _kcore_oracle_sql(k: int = 22, rounds: int = 8) -> str:
    """Unrolled peeling rounds mirroring graph.py kcore exactly: same
    fixed round count, same degree->=k keep rule applied to both edge
    endpoints each round.  Every round CTE is MATERIALIZED: s{i} is
    referenced twice (by k{i+1} and s{i+1}), so DuckDB's default CTE
    inlining re-evaluates the whole chain ~3^rounds times — the same
    recompute blowup the Spark side avoids with localCheckpoint."""
    sql = (
        "WITH e0 AS (SELECT DISTINCT l_orderkey % 3000 AS u, "
        "l_partkey % 3000 + 3000 AS v FROM lineitem), "
        "s0 AS MATERIALIZED (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0)"
    )
    prev = "s0"
    for i in range(1, rounds + 1):
        sql += (
            f", k{i} AS MATERIALIZED (SELECT u FROM {prev} GROUP BY u "
            f"HAVING COUNT(*) >= {k})"
            f", s{i} AS MATERIALIZED (SELECT s.u, s.v FROM {prev} s "
            f"JOIN k{i} a ON s.u = a.u JOIN k{i} b ON s.v = b.u)"
        )
        prev = f"s{i}"
    return (
        sql
        + f" SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS degree "
        f"FROM {prev} GROUP BY u"
    )


def _ann_probe_oracle_sql(
    dim: int = 64, n_planes: int = 8, seed: int = 7, probe_hamming: int = 1
) -> str:
    """Exact DuckDB replica of the PRUNED 1-bit-multiprobe LSH probe
    (q_ann_probe_pruned): the hyperplane family is a pure function of
    (dim, n_planes, seed) via ``random.Random`` (similarity.py _planes),
    so the plane constants are embedded here as DOUBLE[] literals.  The
    SQL recomputes every vector's signature bucket AND the query's
    bucket, keeps candidates with ``bit_count(xor(bucket, qbucket)) <=
    probe_hamming`` (identical to the Spark side's enumerated probe
    set), then ranks the survivors by cosine — same top-10, same
    rounding convention as the driver-green q_ann_lsh oracle."""
    from kevinlang_spark.operators.similarity import _planes

    plane_rows = ", ".join(
        f"({i}, [{', '.join(repr(v) for v in p)}]::DOUBLE[])"
        for i, p in enumerate(_planes(dim, n_planes, seed))
    )
    return (
        f"WITH planes(i, p) AS (VALUES {plane_rows}), "
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, embedding "
        "FROM embeddings), "
        "q AS (SELECT v, embedding FROM e WHERE vec_id = 1), "
        "sigs AS (SELECT e.vec_id, e.embedding, "
        "CAST(SUM(CASE WHEN list_dot_product(e.v, planes.p) >= 0 "
        "THEN 1 << planes.i ELSE 0 END) AS BIGINT) AS b "
        "FROM e CROSS JOIN planes GROUP BY e.vec_id, e.embedding), "
        "qs AS (SELECT CAST(SUM(CASE WHEN list_dot_product(q.v, planes.p) >= 0 "
        "THEN 1 << planes.i ELSE 0 END) AS BIGINT) AS qb "
        "FROM q CROSS JOIN planes) "
        "SELECT s.vec_id, "
        "ROUND(list_cosine_similarity(s.embedding, (SELECT embedding FROM q)), 4) "
        "AS sim FROM sigs s, qs "
        f"WHERE bit_count(xor(s.b, qs.qb)) <= {probe_hamming} "
        "ORDER BY list_cosine_similarity(s.embedding, (SELECT embedding FROM q)) "
        "DESC, s.vec_id LIMIT 10"
    )


def _lpa_oracle_sql(rounds: int = 5) -> str:
    """Unrolled semi-synchronous LPA mirroring graph.py
    label_propagation: same simultaneous update from the previous
    round, same (count DESC, label ASC) arg-max.  MATERIALIZED CTEs
    for the same anti-inlining reason as the kcore oracle."""
    sql = (
        "WITH e0 AS (SELECT DISTINCT l_orderkey % 12000 AS u, "
        "l_partkey % 12000 + 12000 AS v FROM lineitem), "
        "sym AS MATERIALIZED (SELECT u, v FROM e0 UNION ALL "
        "SELECT v, u FROM e0), "
        "nodes AS MATERIALIZED (SELECT DISTINCT u AS node FROM sym), "
        "l0 AS MATERIALIZED (SELECT node, node AS label FROM nodes)"
    )
    for i in range(1, rounds + 1):
        sql += (
            f", c{i} AS MATERIALIZED (SELECT s.u AS n, p.label AS l, "
            f"COUNT(*) AS c FROM sym s JOIN l{i - 1} p ON s.v = p.node "
            f"GROUP BY s.u, p.label)"
            f", b{i} AS MATERIALIZED (SELECT n, l FROM c{i} QUALIFY "
            f"ROW_NUMBER() OVER (PARTITION BY n ORDER BY c DESC, l ASC) = 1)"
            f", l{i} AS MATERIALIZED (SELECT nd.node, "
            f"COALESCE(b.l, nd.node) AS label FROM nodes nd "
            f"LEFT JOIN b{i} b ON nd.node = b.n)"
        )
    return sql + (
        f" SELECT label, CAST(COUNT(*) AS BIGINT) AS n_members "
        f"FROM l{rounds} GROUP BY label"
    )


def _wl_oracle_sql(rounds: int = 3) -> str:
    """Unrolled WL refinement mirroring graph.py wl_refinement: degree
    start labels, per round hash(own label | sorted neighbor labels)
    with the same md5-prefix ints; MATERIALIZED rounds (see kcore)."""

    def h(expr: str) -> str:
        return (
            f"CAST(CONCAT('0x', substr(md5({expr}), 1, 13)) AS BIGINT)"
        )

    sql = (
        "WITH e0 AS (SELECT DISTINCT l_orderkey % 3000 AS u, "
        "l_partkey % 3000 + 3000 AS v FROM lineitem), "
        "sym AS MATERIALIZED (SELECT u, v FROM e0 "
        "UNION ALL SELECT v, u FROM e0), "
        "l0 AS MATERIALIZED (SELECT u AS node, COUNT(*) AS label "
        "FROM sym GROUP BY u)"
    )
    for i in range(1, rounds + 1):
        sql += (
            f", n{i} AS MATERIALIZED (SELECT s.u AS n, p.label AS l "
            f"FROM sym s JOIN l{i - 1} p ON s.v = p.node)"
            f", s{i} AS MATERIALIZED (SELECT n, "
            f"array_to_string(list(l ORDER BY l), ',') AS sig "
            f"FROM n{i} GROUP BY n)"
            f", l{i} AS MATERIALIZED (SELECT p.node, "
            + h(f"CONCAT(CAST(p.label AS VARCHAR), '|', s.sig)")
            + f" AS label FROM l{i - 1} p JOIN s{i} s ON p.node = s.n)"
        )
    return sql + (
        f" SELECT label AS wl_label, CAST(COUNT(*) AS BIGINT) AS n_nodes "
        f"FROM l{rounds} GROUP BY label"
    )


def _sssp_oracle_sql(rounds: int = 6) -> str:
    """Unrolled Bellman–Ford matching graph.py shortest_paths: same
    per-round relax + grouped min, same left-to-right weight
    accumulation; MATERIALIZED rounds (see kcore)."""
    sql = (
        "WITH ew AS MATERIALIZED (SELECT l_orderkey % 2000 AS src, "
        "l_partkey % 2000 + 2000 AS dst, MIN(l_quantity) AS w "
        "FROM lineitem GROUP BY src, dst), "
        "e AS MATERIALIZED (SELECT src AS u, dst AS v, "
        "CAST(w AS DOUBLE) AS w FROM ew "
        "UNION ALL SELECT dst, src, CAST(w AS DOUBLE) FROM ew), "
        "d0 AS MATERIALIZED (SELECT CAST(0 AS BIGINT) AS node, "
        "0.0 AS dist)"
    )
    for i in range(1, rounds + 1):
        sql += (
            f", d{i} AS MATERIALIZED (SELECT node, MIN(dist) AS dist FROM ("
            f"SELECT node, dist FROM d{i - 1} "
            f"UNION ALL SELECT e.v, p.dist + e.w FROM d{i - 1} p "
            f"JOIN e ON p.node = e.u) GROUP BY node)"
        )
    return sql + f" SELECT node, dist FROM d{rounds}"


def _harmonic_oracle_sql(rounds: int = 4) -> str:
    """Unrolled multi-source BFS matching graph.py harmonic_centrality:
    the distance table carries the source id through every round."""
    sql = (
        "WITH e0 AS (SELECT DISTINCT l_orderkey % 2000 AS u, "
        "l_partkey % 2000 + 2000 AS v FROM lineitem), "
        "sym AS MATERIALIZED (SELECT u, v FROM e0 "
        "UNION ALL SELECT v, u FROM e0), "
        "d0 AS MATERIALIZED (SELECT CAST(s AS BIGINT) AS s, "
        "CAST(s AS BIGINT) AS node, 0.0 AS dist "
        "FROM (VALUES (0), (1), (2), (3)) AS t(s))"
    )
    for i in range(1, rounds + 1):
        sql += (
            f", d{i} AS MATERIALIZED (SELECT s, node, MIN(dist) AS dist "
            f"FROM (SELECT s, node, dist FROM d{i - 1} "
            f"UNION ALL SELECT p.s, sym.v, p.dist + 1.0 FROM d{i - 1} p "
            f"JOIN sym ON p.node = sym.u) GROUP BY s, node)"
        )
    return sql + (
        f" SELECT node, CAST(COUNT(*) AS INTEGER) AS n_reached, "
        f"ROUND(SUM(1.0 / dist), 6) AS score "
        f"FROM d{rounds} WHERE dist > 0 GROUP BY node"
    )


def _markov_oracle_sql(iters: int = 12) -> str:
    """Replay of events.py markov_attribution: identical journey
    truncation, transition counting, and fixed-iteration absorption
    expansion, one unroll per removed-channel variant."""
    channels = ["click", "error", "signup", "view"]
    sql = (
        "WITH b AS (SELECT user_id AS u, event_type AS c, "
        "ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) "
        "AS rn FROM events WHERE user_id IS NOT NULL), "
        "fc AS (SELECT u, MIN(rn) AS prn FROM b WHERE c = 'purchase' "
        "GROUP BY u), "
        "pre AS (SELECT b.u, b.c, b.rn, fc.prn FROM b "
        "LEFT JOIN fc USING (u) WHERE fc.prn IS NULL OR b.rn < fc.prn), "
        "steps AS (SELECT c AS src, COALESCE("
        "LEAD(c) OVER (PARTITION BY u ORDER BY rn), "
        "CASE WHEN prn IS NOT NULL THEN 'CONV' ELSE 'NULL' END) AS dst "
        "FROM pre), "
        "firsts AS (SELECT 'START' AS src, c AS dst FROM "
        "(SELECT u, c, rn, MIN(rn) OVER (PARTITION BY u) AS mrn FROM pre) "
        "WHERE rn = mrn), "
        "direct AS (SELECT 'START' AS src, 'CONV' AS dst FROM fc "
        "WHERE prn = 1), "
        "tr AS (SELECT src, dst, COUNT(*) AS n FROM "
        "(SELECT * FROM steps UNION ALL SELECT * FROM firsts "
        "UNION ALL SELECT * FROM direct) GROUP BY src, dst), "
        "tp AS MATERIALIZED (SELECT src, dst, "
        "n * 1.0 / SUM(n) OVER (PARTITION BY src) AS p FROM tr)"
    )
    variants = [None] + channels
    for vi, rem in enumerate(variants):
        drop = "('CONV', 'NULL')" if rem is None else f"('CONV', 'NULL', '{rem}')"
        sql += (
            f", x0_{vi} AS MATERIALIZED (SELECT dst AS s, p FROM tp "
            f"WHERE src = 'START' AND dst NOT IN {drop})"
            f", c0_{vi} AS MATERIALIZED (SELECT COALESCE((SELECT p FROM tp "
            f"WHERE src = 'START' AND dst = 'CONV'), 0.0) AS conv)"
        )
        for k in range(1, iters + 1):
            sql += (
                f", c{k}_{vi} AS MATERIALIZED (SELECT "
                f"(SELECT conv FROM c{k - 1}_{vi}) + COALESCE((SELECT "
                f"SUM(x.p * tp.p) FROM x{k - 1}_{vi} x JOIN tp "
                f"ON tp.src = x.s AND tp.dst = 'CONV'), 0.0) AS conv)"
                f", x{k}_{vi} AS MATERIALIZED (SELECT tp.dst AS s, "
                f"SUM(x.p * tp.p) AS p FROM x{k - 1}_{vi} x JOIN tp "
                f"ON tp.src = x.s WHERE tp.dst NOT IN {drop} GROUP BY tp.dst)"
            )
    parts = []
    for vi, rem in enumerate(variants):
        if rem is None:
            continue
        parts.append(
            f"SELECT '{rem}' AS channel, "
            f"ROUND((SELECT conv FROM c{iters}_0), 6) AS conv_base, "
            f"ROUND((SELECT conv FROM c{iters}_{vi}), 6) AS conv_without, "
            f"ROUND(((SELECT conv FROM c{iters}_0) - "
            f"(SELECT conv FROM c{iters}_{vi})) / "
            f"(SELECT conv FROM c{iters}_0), 6) AS removal_effect"
        )
    return sql + " " + " UNION ALL ".join(parts)


def _hits_oracle_sql(iters: int = 8) -> str:
    """Unrolled L1-normalized HITS mirroring graph.py hits: per
    iteration auth-from-hub sum + normalize, then hub-from-auth sum +
    normalize, zeros for nodes missing a side."""
    sql = (
        "WITH e AS MATERIALIZED (SELECT DISTINCT l_suppkey % 400 AS src, "
        "l_partkey % 400 + 400 AS dst FROM lineitem), "
        "nodes AS MATERIALIZED (SELECT src AS node FROM e UNION "
        "SELECT dst FROM e), "
        "n1 AS MATERIALIZED (SELECT COUNT(*) AS n FROM nodes), "
        "s0 AS MATERIALIZED (SELECT node, 1.0 / (SELECT n FROM n1) AS hub, "
        "1.0 / (SELECT n FROM n1) AS auth FROM nodes)"
    )
    prev = "s0"
    for i in range(1, iters + 1):
        sql += (
            f", ar{i} AS MATERIALIZED (SELECT g.dst AS node, "
            f"SUM(s.hub) AS a_raw FROM {prev} s JOIN e g ON s.node = g.src "
            f"GROUP BY g.dst)"
            f", a{i} AS MATERIALIZED (SELECT nd.node, "
            f"COALESCE(r.a_raw, 0) / (SELECT SUM(a_raw) FROM ar{i}) AS auth "
            f"FROM nodes nd LEFT JOIN ar{i} r ON nd.node = r.node)"
            f", hr{i} AS MATERIALIZED (SELECT g.src AS node, "
            f"SUM(t.auth) AS h_raw FROM a{i} t JOIN e g ON t.node = g.dst "
            f"GROUP BY g.src)"
            f", s{i} AS MATERIALIZED (SELECT nd.node, "
            f"COALESCE(r.h_raw, 0) / (SELECT SUM(h_raw) FROM hr{i}) AS hub, "
            f"COALESCE(a.auth, 0) AS auth FROM nodes nd "
            f"LEFT JOIN hr{i} r ON nd.node = r.node "
            f"LEFT JOIN a{i} a ON nd.node = a.node)"
        )
        prev = f"s{i}"
    return sql + (
        f" SELECT node, ROUND(hub, 8) AS hub, ROUND(auth, 8) AS auth "
        f"FROM {prev} ORDER BY ROUND(auth, 8) DESC, node ASC LIMIT 15"
    )


def _pca_cte_prefix(dim: int = 64, iters: int = 12) -> tuple[str, str]:
    """Replay of pca.py pca_top_component: population covariance via the
    d²-index cross join, then the identical unrolled power iterations
    with L2 normalization, Rayleigh-quotient variance ratio, and the
    largest-|loading| (ties → smallest dim) sign canonicalization.
    Returns (CTE prefix, final-vector CTE name) so the loading and
    projection oracles share one replay."""
    sql = (
        f"WITH x AS MATERIALIZED (SELECT CAST(embedding AS DOUBLE[]) AS v "
        f"FROM embeddings WHERE embedding IS NOT NULL "
        f"AND len(embedding) = {dim}), "
        f"n1 AS MATERIALIZED (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM x), "
        f"mu AS MATERIALIZED (SELECT i, SUM(v[i + 1]) / (SELECT n FROM n1) "
        f"AS m FROM x CROSS JOIN range({dim}) AS ri(i) GROUP BY i), "
        f"sxx AS MATERIALIZED (SELECT i, j, SUM(v[i + 1] * v[j + 1]) AS s "
        f"FROM x CROSS JOIN range({dim}) AS ri(i) "
        f"CROSS JOIN range({dim}) AS rj(j) GROUP BY i, j), "
        f"cov AS MATERIALIZED (SELECT s.i, s.j, "
        f"s.s / (SELECT n FROM n1) - mi.m * mj.m AS c FROM sxx s "
        f"JOIN mu mi ON s.i = mi.i JOIN mu mj ON s.j = mj.i), "
        f"v0 AS MATERIALIZED (SELECT i, 1.0 / sqrt({dim}) AS val "
        f"FROM range({dim}) AS r(i))"
    )
    prev = "v0"
    for t in range(1, iters + 1):
        sql += (
            f", w{t} AS MATERIALIZED (SELECT c.i, SUM(c.c * p.val) AS w "
            f"FROM cov c JOIN {prev} p ON c.j = p.i GROUP BY c.i)"
            f", v{t} AS MATERIALIZED (SELECT i, "
            f"w / (SELECT sqrt(SUM(w * w)) FROM w{t}) AS val FROM w{t})"
        )
        prev = f"v{t}"
    sql += (
        f", wf AS MATERIALIZED (SELECT c.i, SUM(c.c * p.val) AS w "
        f"FROM cov c JOIN {prev} p ON c.j = p.i GROUP BY c.i), "
        f"lam AS MATERIALIZED (SELECT SUM(p.val * wf.w) AS l "
        f"FROM {prev} p JOIN wf ON p.i = wf.i), "
        f"tr AS MATERIALIZED (SELECT SUM(c) AS t FROM cov WHERE i = j), "
        f"sgn AS MATERIALIZED (SELECT CASE WHEN val < 0 THEN -1.0 ELSE 1.0 "
        f"END AS s FROM {prev} ORDER BY ABS(val) DESC, i ASC LIMIT 1)"
    )
    return sql, prev


def _pca_oracle_sql(dim: int = 64, iters: int = 12) -> str:
    sql, prev = _pca_cte_prefix(dim, iters)
    return sql + (
        f" SELECT CAST(i AS INT) AS dim, "
        f"ROUND(val * (SELECT s FROM sgn), 6) AS loading, "
        f"ROUND((SELECT l FROM lam) / (SELECT t FROM tr), 6) "
        f"AS explained_var_ratio FROM {prev}"
    )


def _pca2_oracle_sql(dim: int = 64, iters: int = 12) -> str:
    """Two-component replay: the shared PC1 prefix, Hotelling deflation
    C′ = C − λ·vvᵀ on the UNROUNDED vector, then the identical unrolled
    iteration over the deflated matrix."""
    sql, prev = _pca_cte_prefix(dim, iters)
    sql += (
        f", cov2 AS MATERIALIZED (SELECT c.i, c.j, "
        f"c.c - (SELECT l FROM lam) * a.val * b.val AS c FROM cov c "
        f"JOIN {prev} a ON c.i = a.i JOIN {prev} b ON c.j = b.i), "
        f"u0 AS MATERIALIZED (SELECT i, 1.0 / sqrt({dim}) AS val "
        f"FROM range({dim}) AS r(i))"
    )
    p2 = "u0"
    for t in range(1, iters + 1):
        sql += (
            f", x{t} AS MATERIALIZED (SELECT c.i, SUM(c.c * p.val) AS w "
            f"FROM cov2 c JOIN {p2} p ON c.j = p.i GROUP BY c.i)"
            f", u{t} AS MATERIALIZED (SELECT i, "
            f"w / (SELECT sqrt(SUM(w * w)) FROM x{t}) AS val FROM x{t})"
        )
        p2 = f"u{t}"
    return sql + (
        f", wf2 AS MATERIALIZED (SELECT c.i, SUM(c.c * p.val) AS w "
        f"FROM cov2 c JOIN {p2} p ON c.j = p.i GROUP BY c.i), "
        f"lam2 AS MATERIALIZED (SELECT SUM(p.val * wf2.w) AS l "
        f"FROM {p2} p JOIN wf2 ON p.i = wf2.i), "
        f"sgn2 AS MATERIALIZED (SELECT CASE WHEN val < 0 THEN -1.0 ELSE 1.0 "
        f"END AS s FROM {p2} ORDER BY ABS(val) DESC, i ASC LIMIT 1) "
        f"SELECT 0 AS component, CAST(i AS INT) AS dim, "
        f"ROUND(val * (SELECT s FROM sgn), 6) AS loading, "
        f"ROUND((SELECT l FROM lam) / (SELECT t FROM tr), 6) "
        f"AS explained_var_ratio FROM {prev} "
        f"UNION ALL SELECT 1, CAST(i AS INT), "
        f"ROUND(val * (SELECT s FROM sgn2), 6), "
        f"ROUND((SELECT l FROM lam2) / (SELECT t FROM tr), 6) FROM {p2}"
    )


def _pca_scores_oracle_sql(dim: int = 64, iters: int = 12, k: int = 10) -> str:
    """PCA projection replay: the same unrolled power iteration, then
    every embedding dotted with the ROUNDED canonical loadings (the
    rounding matches the Spark side, which projects with the loadings
    pca_top_component returns)."""
    sql, prev = _pca_cte_prefix(dim, iters)
    return sql + (
        f", ld AS MATERIALIZED (SELECT i, "
        f"ROUND(val * (SELECT s FROM sgn), 6) AS l FROM {prev}), "
        f"emb AS MATERIALIZED (SELECT vec_id, "
        f"CAST(embedding AS DOUBLE[]) AS v FROM embeddings "
        f"WHERE embedding IS NOT NULL AND len(embedding) = {dim}), "
        f"sc AS MATERIALIZED (SELECT e.vec_id, "
        f"ROUND(SUM(e.v[ld.i + 1] * ld.l), 6) AS score "
        f"FROM emb e CROSS JOIN ld GROUP BY e.vec_id) "
        f"SELECT vec_id, score FROM sc "
        f"ORDER BY ABS(score) DESC, vec_id ASC LIMIT {k}"
    )


def _bloom_oracle_sql(m: int = 1 << 14, k: int = 5) -> str:
    """Replay of sketches.py bloom math: the 52-bit md5-prefix position
    hashes match Spark's conv(substr(md5(..),1,13),16,10) exactly."""

    def pos(key: str, i: int) -> str:
        return (
            f"CAST(CONCAT('0x', substr(md5(CONCAT(CAST({key} AS VARCHAR), "
            f"'#bloom{i}')), 1, 13)) AS BIGINT) % {m}"
        )

    bit_union = " UNION ALL ".join(
        f"SELECT {pos('o_custkey', i)} AS bit FROM orders "
        f"WHERE o_custkey IS NOT NULL"
        for i in range(k)
    )
    probe_union = " UNION ALL ".join(
        f"SELECT c_custkey AS value, {pos('c_custkey', i)} AS bit "
        f"FROM customer WHERE c_custkey IS NOT NULL"
        for i in range(k)
    )
    return (
        f"WITH bits AS MATERIALIZED (SELECT DISTINCT bit FROM ({bit_union})), "
        f"pb AS MATERIALIZED ({probe_union}) "
        f"SELECT value AS c_custkey, "
        f"BOOL_AND(bit IN (SELECT bit FROM bits)) AS maybe_present "
        f"FROM pb GROUP BY value"
    )


def _zorder_oracle_sql() -> str:
    """Bit-for-bit Morton replay: same quantization clamps, same 16-term
    interleave via >> & << | integer ops."""

    def q16(col: str, lo: float, hi: float) -> str:
        return (
            f"LEAST(GREATEST(CAST(floor((CAST({col} AS DOUBLE) - {lo}) "
            f"/ ({hi} - {lo}) * 65535.0) AS BIGINT), 0), 65535)"
        )

    terms = " | ".join(
        f"(((qx >> {i}) & 1) << {2 * i}) | (((qy >> {i}) & 1) << {2 * i + 1})"
        for i in range(16)
    )
    return (
        f"WITH q AS (SELECT l_orderkey, l_linenumber, "
        f"{q16('l_quantity', 1.0, 50.0)} AS qx, "
        f"{q16('l_extendedprice', 900.0, 105000.0)} AS qy FROM lineitem) "
        f"SELECT l_orderkey, l_linenumber, CAST({terms} AS BIGINT) AS zkey "
        f"FROM q"
    )


def _bm25_scored_cte(terms: list[str], k1: float = 1.2, b: float = 0.75) -> str:
    """Shared BM25 scoring CTE chain (q_bm25_search / q_hybrid_retrieval):
    replicates text.bm25_scores — same tokenizer regex, same Lucene idf,
    same literal expression order so float results agree bit-for-bit
    before the 6dp round."""
    in_list = ", ".join(f"'{t}'" for t in terms)
    return (
        "WITH base AS (SELECT doc_id, list_filter("
        "string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks "
        "FROM documents), "
        "dlt AS (SELECT doc_id, len(toks) AS dl FROM base), "
        "st AS (SELECT COUNT(dl) AS n, AVG(dl) AS avgdl FROM dlt), "
        "tok AS (SELECT doc_id, unnest(toks) AS term FROM base), "
        "tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok "
        f"WHERE term IN ({in_list}) GROUP BY doc_id, term), "
        "dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term), "
        "sc AS (SELECT tf.doc_id, COUNT(*) AS n_terms, "
        f"SUM(ln(1.0 + (st.n - dfreq.df + 0.5) / (dfreq.df + 0.5)) "
        f"* (tf.tf * ({k1} + 1.0)) "
        f"/ (tf.tf + {k1} * (1.0 - {b} + {b} * dlt.dl / st.avgdl))) AS raw "
        "FROM tf JOIN dfreq USING (term) JOIN dlt USING (doc_id) "
        "CROSS JOIN st GROUP BY tf.doc_id)"
    )


def _jl_oracle_sql(
    out_dim: int = 16, seed: int = 11, n_sample: int = 16, dim: int = 64
) -> str:
    """Exact DuckDB replica of q_jl_distortion: the seeded plane family
    is a pure function of (dim, out_dim, seed) via random.Random
    (similarity.py _planes), embedded as DOUBLE[] literals like the
    LSH-probe oracle; projections, squared distances, and the ratio use
    the same double arithmetic order as the Spark folds."""
    import math as _math

    from kevinlang_spark.operators.similarity import _planes

    plane_rows = ", ".join(
        f"({i}, [{', '.join(repr(v) for v in p)}]::DOUBLE[])"
        for i, p in enumerate(_planes(dim, out_dim, seed))
    )
    scale = repr(1.0 / _math.sqrt(out_dim))
    sqd = (
        "list_sum(list_transform(range(1, {n} + 1), "
        "i -> (a.{c}[i] - b.{c}[i]) * (a.{c}[i] - b.{c}[i])))"
    )
    dorig = sqd.format(n=dim, c="v")
    dproj = sqd.format(n=out_dim, c="y")
    return (
        f"WITH planes(i, p) AS (VALUES {plane_rows}), "
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
        f"FROM embeddings WHERE vec_id < {n_sample}), "
        "proj AS (SELECT e.vec_id, "
        f"list(list_sum(list_transform(range(1, {dim} + 1), "
        f"j -> e.v[j] * planes.p[j])) * {scale} ORDER BY planes.i) AS y "
        "FROM e CROSS JOIN planes GROUP BY e.vec_id), "
        "s AS (SELECT e.vec_id AS id, e.v, proj.y "
        "FROM e JOIN proj USING (vec_id)) "
        "SELECT a.id AS id_a, b.id AS id_b, "
        f"CASE WHEN {dorig} = 0 THEN NULL "
        f"ELSE ROUND({dproj} / {dorig}, 6) END AS ratio "
        "FROM s a JOIN s b ON a.id < b.id"
    )


def _truncation_oracle_sql(
    dims: "tuple[int, ...]" = (16, 32), n_probes: int = 4, k: int = 10,
    full_dim: int = 64,
) -> str:
    """Exact DuckDB replica of q_truncation_recall: per prefix
    dimensionality, rank by the bit-for-bit mirrored cosine (float
    products summed into double — the q_hard_negatives convention) with
    id tie-breaks, then count the overlap with the full-dim top-k."""

    def sim(d: int) -> str:
        return (
            f"list_sum(list_transform(range(1, {d} + 1), "
            "i -> CAST(e.embedding[i] * q.qv[i] AS DOUBLE))) "
            f"/ NULLIF(sqrt(list_sum(list_transform(range(1, {d} + 1), "
            "i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))) "
            f"* sqrt(list_sum(list_transform(range(1, {d} + 1), "
            "i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))), 0)"
        )

    def rank_cte(name: str, d: int) -> str:
        return (
            f"{name} AS MATERIALIZED (SELECT qid, vec_id FROM ("
            "SELECT q.qid, e.vec_id, ROW_NUMBER() OVER (PARTITION BY q.qid "
            f"ORDER BY {sim(d)} DESC NULLS LAST, e.vec_id ASC) AS rk "
            f"FROM embeddings e, qp q) WHERE rk <= {k})"
        )

    sql = (
        "WITH qp AS (SELECT vec_id AS qid, embedding AS qv "
        f"FROM embeddings WHERE vec_id < {n_probes}), "
        + rank_cte("rfull", full_dim)
    )
    for d in dims:
        sql += ", " + rank_cte(f"r{d}", d)
    parts = " UNION ALL ".join(
        f"SELECT t.qid, CAST({d} AS INTEGER) AS dim, "
        "CAST(COUNT(*) AS INTEGER) AS n_overlap "
        f"FROM r{d} t JOIN rfull USING (qid, vec_id) GROUP BY t.qid"
        for d in dims
    )
    sql += (
        f" SELECT qid, dim, n_overlap, "
        f"ROUND(CAST(n_overlap AS DOUBLE) / {k}, 4) AS recall FROM ({parts})"
    )
    return sql


def _pq_oracle_sql(m: int = 2, k: int = 8, iters: int = 2, dim: int = 64) -> str:
    """Exact DuckDB replica of q_ann_pq: unrolls the same ``iters``
    Lloyd iterations as similarity.py pq_train (seed centroids =
    subvectors of vec_id 0..k-1, argmin of the ROUNDED(6) squared
    distance with smallest-index tie-break, per-cluster elementwise
    AVG rounded to 6, emptied clusters keep their previous centroid via
    COALESCE), then recomputes codes against the final codebooks and
    ranks by the rounded ADC LUT sum for the vec_id=3 probe — checking
    the QUANTIZED result itself, not a float approximation.  CTEs are
    MATERIALIZED because each cN feeds both the next assignment and the
    COALESCE fallback — inlining would re-evaluate the chain
    exponentially."""
    dsub = dim // m
    slices = " ".join(
        f"WHEN s = {s} THEN v[{s * dsub + 1}:{(s + 1) * dsub}]"
        for s in range(m)
    )
    subvec = f"CASE {slices} END"
    svals = ", ".join(str(s) for s in range(m))
    sqd = (
        "ROUND(list_sum(list_transform(range(1, {d} + 1), "
        "i -> (su.sub[i] - c.cent[i]) * (su.sub[i] - c.cent[i]))), 6)"
    ).format(d=dsub)

    def assign(name: str, cents: str) -> str:
        return (
            f"{name} AS MATERIALIZED (SELECT vec_id, s, sub, j FROM ("
            "SELECT su.vec_id, su.s, su.sub, c.j, "
            "ROW_NUMBER() OVER (PARTITION BY su.vec_id, su.s "
            f"ORDER BY {sqd} ASC, c.j ASC) AS rk "
            f"FROM subs su JOIN {cents} c USING (s)) WHERE rk = 1)"
        )

    sql = (
        "WITH base AS MATERIALIZED (SELECT vec_id, "
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v "
        "FROM embeddings), "
        f"subs AS MATERIALIZED (SELECT vec_id, s, {subvec} AS sub "
        f"FROM base, (SELECT unnest([{svals}]) AS s)), "
        f"c0 AS MATERIALIZED (SELECT s, vec_id AS j, sub AS cent "
        f"FROM subs WHERE vec_id < {k})"
    )
    for it in range(1, iters + 1):
        sql += ", " + assign(f"a{it}", f"c{it - 1}") + ", "
        sql += (
            f"m{it} AS (SELECT s, j, list(ROUND(mv, 6) ORDER BY ord) AS cent "
            f"FROM (SELECT s, j, t.ord, AVG(sub[t.ord]) AS mv "
            f"FROM a{it}, unnest(range(1, {dsub} + 1)) AS t(ord) "
            "GROUP BY s, j, t.ord) GROUP BY s, j), "
            f"c{it} AS MATERIALIZED (SELECT c.s, c.j, "
            f"COALESCE(m{it}.cent, c.cent) AS cent FROM c{it - 1} c "
            f"LEFT JOIN m{it} ON c.s = m{it}.s AND c.j = m{it}.j)"
        )
    sql += ", " + assign("enc", f"c{iters}") + ", "
    sql += (
        "q AS (SELECT s, sub AS qsub FROM subs WHERE vec_id = 3), "
        "lut AS (SELECT c.s, c.j, "
        f"ROUND(list_sum(list_transform(range(1, {dsub} + 1), "
        "i -> (q.qsub[i] - c.cent[i]) * (q.qsub[i] - c.cent[i]))), 6) AS d "
        f"FROM c{iters} c JOIN q USING (s)), "
        "scored AS (SELECT e.vec_id, SUM(l.d) AS adist FROM enc e "
        "JOIN lut l ON e.s = l.s AND e.j = l.j GROUP BY e.vec_id) "
        "SELECT vec_id, ROUND(adist, 6) AS adist FROM scored "
        "ORDER BY adist ASC, vec_id ASC LIMIT 10"
    )
    return sql


def _ivfpq_oracle_sql(
    nlist: int = 8,
    nprobe: int = 3,
    m: int = 2,
    k: int = 8,
    iters: int = 2,
    dim: int = 64,
    probe_id: int = 3,
    k_out: int = 10,
    train_pred: str | None = None,
    tail: str = "probe",
) -> str:
    """Exact DuckDB replica of q_ann_ivfpq: unrolls BOTH deterministic
    Lloyd trainings (the coarse quantizer is the PQ trainer with m=1 —
    one subspace covering the whole vector), assigns every vector to
    its coarse cell, keeps the ``nprobe`` cells nearest the probe
    (rounded distance, smallest-index ties — the same discipline as the
    row-side argmin), then recomputes PQ codes + the ADC ranking over
    the surviving cells only.  Every CTE a chain reads twice is
    MATERIALIZED (the _pq_oracle_sql anti-inlining rule).

    ``train_pred`` (a SQL predicate over ``vec_id``) restricts the
    TRAINING population only — assignment/encode still cover every row.
    That is exactly q_ann_index_refresh's semantics: build on the base
    slice, append the rest against frozen codebooks.  ``tail`` picks
    the output: ``probe`` (the ADC top-k) or ``staleness`` (the
    per-cell build-vs-now census of q_ann_index_staleness)."""
    dsub = dim // m
    sqd = (
        "ROUND(list_sum(list_transform(range(1, {n} + 1), "
        "i -> (su.sub[i] - c.cent[i]) * (su.sub[i] - c.cent[i]))), 6)"
    )

    def chain(p: str, subs: str, kk: int, ds: int) -> str:
        """Lloyd chain CTEs named {p}c0..{p}c{iters} over ``subs``."""
        def assign(name: str, cents: str) -> str:
            return (
                f"{name} AS MATERIALIZED (SELECT vec_id, s, sub, j FROM ("
                "SELECT su.vec_id, su.s, su.sub, c.j, "
                "ROW_NUMBER() OVER (PARTITION BY su.vec_id, su.s "
                f"ORDER BY {sqd.format(n=ds)} ASC, c.j ASC) AS rk "
                f"FROM {subs} su JOIN {cents} c USING (s)) WHERE rk = 1)"
            )

        out = (
            f", {p}c0 AS MATERIALIZED (SELECT s, vec_id AS j, sub AS cent "
            f"FROM {subs} WHERE vec_id < {kk})"
        )
        for it in range(1, iters + 1):
            out += ", " + assign(f"{p}a{it}", f"{p}c{it - 1}") + ", "
            out += (
                f"{p}m{it} AS (SELECT s, j, list(ROUND(mv, 6) ORDER BY ord) "
                f"AS cent FROM (SELECT s, j, t.ord, AVG(sub[t.ord]) AS mv "
                f"FROM {p}a{it}, unnest(range(1, {ds} + 1)) AS t(ord) "
                "GROUP BY s, j, t.ord) GROUP BY s, j), "
                f"{p}c{it} AS MATERIALIZED (SELECT c.s, c.j, "
                f"COALESCE({p}m{it}.cent, c.cent) AS cent FROM {p}c{it - 1} c "
                f"LEFT JOIN {p}m{it} ON c.s = {p}m{it}.s AND c.j = {p}m{it}.j)"
            )
        return out

    slices = " ".join(
        f"WHEN s = {s} THEN v[{s * dsub + 1}:{(s + 1) * dsub}]" for s in range(m)
    )
    sql = (
        "WITH base AS MATERIALIZED (SELECT vec_id, "
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v "
        "FROM embeddings), "
        "csubs AS MATERIALIZED (SELECT vec_id, 0 AS s, v AS sub FROM base), "
        f"psubs AS MATERIALIZED (SELECT vec_id, s, CASE {slices} END AS sub "
        f"FROM base, (SELECT unnest([{', '.join(str(s) for s in range(m))}]) AS s))"
    )
    csubs_t, psubs_t = "csubs", "psubs"
    if train_pred is not None:
        csubs_t, psubs_t = "tcsubs", "tpsubs"
        sql += (
            f", tcsubs AS MATERIALIZED (SELECT * FROM csubs WHERE {train_pred})"
            f", tpsubs AS MATERIALIZED (SELECT * FROM psubs WHERE {train_pred})"
        )
    sql += chain("cr", csubs_t, nlist, dim)
    sql += chain("pq", psubs_t, k, dsub)
    if tail == "staleness":
        # every row's coarse cell under the base-trained centroids, then
        # the build (base) vs now (all rows) census per cell
        return sql + (
            ", cells AS (SELECT vec_id, j AS cell FROM ("
            "SELECT su.vec_id, c.j, ROW_NUMBER() OVER (PARTITION BY su.vec_id "
            f"ORDER BY {sqd.format(n=dim)} ASC, c.j ASC) AS rk "
            f"FROM csubs su JOIN crc{iters} c USING (s)) WHERE rk = 1) "
            "SELECT CAST(cell AS INT) AS cell, "
            f"CAST(SUM(CASE WHEN {train_pred} THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_build, CAST(COUNT(*) AS BIGINT) AS n_now, "
            f"CAST(COUNT(*) - SUM(CASE WHEN {train_pred} THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_appended, "
            f"CASE WHEN SUM(CASE WHEN {train_pred} THEN 1 ELSE 0 END) > 0 "
            f"THEN CAST(COUNT(*) - SUM(CASE WHEN {train_pred} THEN 1 ELSE 0 END) "
            f"AS DOUBLE) / SUM(CASE WHEN {train_pred} THEN 1 ELSE 0 END) "
            "END AS drift "
            "FROM cells GROUP BY cell ORDER BY cell"
        )
    sql += (
        # every vector's coarse cell (argmin vs the trained coarse books)
        ", cells AS MATERIALIZED (SELECT vec_id, j AS cell FROM ("
        "SELECT su.vec_id, c.j, ROW_NUMBER() OVER (PARTITION BY su.vec_id "
        f"ORDER BY {sqd.format(n=dim)} ASC, c.j ASC) AS rk "
        f"FROM csubs su JOIN crc{iters} c USING (s)) WHERE rk = 1), "
        # the probe's nprobe nearest cells, same rounding/tie discipline
        f"qv AS (SELECT v FROM base WHERE vec_id = {probe_id}), "
        "probe AS MATERIALIZED (SELECT j AS cell FROM ("
        "SELECT c.j, ROW_NUMBER() OVER (ORDER BY "
        f"ROUND(list_sum(list_transform(range(1, {dim} + 1), "
        "i -> (qv.v[i] - c.cent[i]) * (qv.v[i] - c.cent[i]))), 6) ASC, "
        f"c.j ASC) AS rk FROM crc{iters} c, qv) WHERE rk <= {nprobe}), "
        "cand AS (SELECT vec_id FROM cells JOIN probe USING (cell)), "
        # PQ codes for surviving vectors only
        "enc AS (SELECT vec_id, s, j FROM ("
        "SELECT su.vec_id, su.s, c.j, ROW_NUMBER() OVER "
        "(PARTITION BY su.vec_id, su.s "
        f"ORDER BY {sqd.format(n=dsub)} ASC, c.j ASC) AS rk "
        f"FROM psubs su JOIN pqc{iters} c USING (s) "
        "WHERE su.vec_id IN (SELECT vec_id FROM cand)) WHERE rk = 1), "
        f"q AS (SELECT s, sub AS qsub FROM psubs WHERE vec_id = {probe_id}), "
        "lut AS (SELECT c.s, c.j, "
        f"ROUND(list_sum(list_transform(range(1, {dsub} + 1), "
        "i -> (q.qsub[i] - c.cent[i]) * (q.qsub[i] - c.cent[i]))), 6) AS d "
        f"FROM pqc{iters} c JOIN q USING (s)), "
        "scored AS (SELECT e.vec_id, SUM(l.d) AS adist FROM enc e "
        "JOIN lut l ON e.s = l.s AND e.j = l.j GROUP BY e.vec_id) "
        "SELECT vec_id, ROUND(adist, 6) AS adist FROM scored "
        f"ORDER BY adist ASC, vec_id ASC LIMIT {k_out}"
    )
    return sql


def _bpe_merge_rewrite_sql(r: int) -> str:
    """The one-merge-round rewrite of a space-separated ``toks`` string
    against round ``r``'s argmax pair ``b{r}`` — the doubled-space trick
    (see :func:`_bpe_rounds_sql`); shared by the training-vocab chain
    and the chat-span encode chain."""
    return (
        "trim(regexp_replace("
        "replace(' ' || replace(toks, ' ', '  ') || ' ', "
        f"COALESCE((SELECT ' ' || a || '  ' || b || ' ' FROM b{r}), '#'), "
        f"COALESCE((SELECT ' ' || a || b || ' ' FROM b{r}), '#')), "
        "' +', ' ', 'g'))"
    )


def _bpe_rounds_sql(n_merges: int) -> str:
    """The shared merge-training CTE chain ``w0..wN`` / ``b1..bN`` —
    unrolls text.py bpe_train's rounds over the (word, freq) vocabulary
    of ``documents``.  The left-to-right non-overlapping merge uses the
    doubled-space trick — interior token boundaries get two spaces, a
    pair occurrence is the plain substring ``' a  b '``, and plain
    ``replace()`` scans left-to-right exactly like the Spark fold (RE2
    has no lookarounds, so a regex can't do this) — then multi-spaces
    collapse back.  MATERIALIZED CTEs: each wN feeds both the next pair
    count and the next rewrite."""
    sql = (
        "WITH w0 AS MATERIALIZED (SELECT w, "
        "trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS toks, freq FROM ("
        "SELECT t AS w, COUNT(*) AS freq FROM ("
        "SELECT unnest(list_filter(string_split_regex(lower(text), "
        "'[^a-z0-9]+'), x -> x <> '')) AS t "
        "FROM documents WHERE text IS NOT NULL) GROUP BY t))"
    )
    for r in range(1, n_merges + 1):
        sql += (
            f", p{r} AS (SELECT p.a AS a, p.b AS b, "
            "CAST(SUM(freq) AS BIGINT) AS n FROM ("
            "SELECT unnest(list_transform(range(1, len(t)), "
            "i -> {'a': t[i], 'b': t[i+1]})) AS p, freq "
            f"FROM (SELECT string_split(toks, ' ') AS t, freq FROM w{r - 1}) "
            "WHERE len(t) > 1) GROUP BY p.a, p.b), "
            f"b{r} AS MATERIALIZED (SELECT {r} AS merge_rank, a, b, n "
            f"FROM p{r} ORDER BY n DESC, a ASC, b ASC LIMIT 1), "
            # COALESCE to the identity rewrite '#'→'#' ('#' can never
            # occur in [a-z0-9 ] token text): if the corpus dries out
            # before n_merges, b{r} is empty and the bare scalar
            # subqueries would be NULL — replace(toks, NULL, NULL)
            # NULLs every word while Spark's bpe_train early-breaks
            f"w{r} AS MATERIALIZED (SELECT w, "
            + _bpe_merge_rewrite_sql(r)
            + f" AS toks, freq FROM w{r - 1})"
        )
    return sql


def _bpe_oracle_sql(n_merges: int = 8, encode: bool = False) -> str:
    """Exact DuckDB replica of q_bpe_train / q_bpe_encode: the shared
    :func:`_bpe_rounds_sql` chain, then with ``encode=True`` the final
    vocabulary's word→subtoken-count map joins back to the exploded
    corpus (text.py bpe_token_counts' vocab-scale encode shape) instead
    of returning the merge table."""
    sql = _bpe_rounds_sql(n_merges)
    if encode:
        sql += (
            f", vocab AS (SELECT w, len(string_split(toks, ' ')) "
            f"AS n_subtokens FROM w{n_merges}), "
            "dt AS (SELECT doc_id AS id, "
            "unnest(list_filter(string_split_regex(lower(text), "
            "'[^a-z0-9]+'), x -> x <> '')) AS w "
            "FROM documents WHERE text IS NOT NULL) "
            "SELECT id AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_words, "
            "CAST(SUM(n_subtokens) AS BIGINT) AS n_bpe_tokens "
            "FROM dt JOIN vocab USING (w) GROUP BY id"
        )
    else:
        sql += (
            " SELECT merge_rank, a AS tok_a, b AS tok_b, n AS pair_count FROM ("
            + " UNION ALL ".join(
                f"SELECT * FROM b{r}" for r in range(1, n_merges + 1)
            )
            + ") ORDER BY merge_rank"
        )
    return sql


def _fim_oracle_sql(
    mode: str = "psm", rate: float = 0.5, chunk_chars: "int | None" = None
) -> str:
    """Byte-replay oracle for the FIM family (text.py fim_transform /
    fim_transform_context): replays selection (52-bit md5 vs the exact
    scaled threshold), both cut points, and the mode's reassembly
    character-for-character.  ``chunk_chars`` switches to the
    context-level shape: fixed-size chunks via generate_series, hashes
    salted on ``doc_id || '#' || chunk_idx``."""
    thr = int(rate * 2**52)
    if chunk_chars is None:
        sid = "CAST(doc_id AS VARCHAR)"
        head = (
            "WITH h AS (SELECT doc_id, text AS t, length(text) AS n, "
            f"CAST(CONCAT('0x', substr(md5({sid} || '#fim'), 1, 13)) AS BIGINT) AS hp, "
            f"CAST(CONCAT('0x', substr(md5({sid} || '#fim1'), 1, 13)) AS BIGINT) AS h1, "
            f"CAST(CONCAT('0x', substr(md5({sid} || '#fim2'), 1, 13)) AS BIGINT) AS h2 "
            "FROM documents), "
        )
        id_cols = "doc_id"
    else:
        sid = "doc_id || '#' || chunk_idx"
        head = (
            "WITH base AS (SELECT doc_id, text, length(text) AS n "
            "FROM documents WHERE text IS NOT NULL AND length(text) > 0), "
            # unnest(range(...)) instead of generate_series: DuckDB's
            # table-function form can't take lateral column parameters
            "ch AS (SELECT doc_id, unnest(range(0, "
            f"CAST(ceil(n / {chunk_chars}.0) AS BIGINT))) AS g, text "
            "FROM base), "
            "chs AS (SELECT doc_id, g AS chunk_idx, "
            f"substr(text, CAST(g * {chunk_chars} + 1 AS INT), "
            f"{chunk_chars}) AS t FROM ch), "
            "h AS (SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx, "
            "t, length(t) AS n, "
            f"CAST(CONCAT('0x', substr(md5({sid} || '#fim'), 1, 13)) AS BIGINT) AS hp, "
            f"CAST(CONCAT('0x', substr(md5({sid} || '#fim1'), 1, 13)) AS BIGINT) AS h1, "
            f"CAST(CONCAT('0x', substr(md5({sid} || '#fim2'), 1, 13)) AS BIGINT) AS h2 "
            "FROM chs), "
        )
        id_cols = "doc_id, chunk_idx"
    if mode == "psm":
        reassembled = (
            "'<PRE>' || substr(t, 1, CAST(lo AS INT)) || "
            "'<SUF>' || substr(t, CAST(hi + 1 AS INT), CAST(n - hi AS INT)) || "
            "'<MID>' || substr(t, CAST(lo + 1 AS INT), CAST(hi - lo AS INT))"
        )
    else:
        reassembled = (
            "'<PRE>' || '<SUF>' || "
            "substr(t, CAST(hi + 1 AS INT), CAST(n - hi AS INT)) || "
            "'<MID>' || substr(t, 1, CAST(lo AS INT)) || "
            "substr(t, CAST(lo + 1 AS INT), CAST(hi - lo AS INT))"
        )
    return (
        head
        + f"c AS (SELECT {id_cols}, t, n, "
        + f"(hp < {thr} AND t IS NOT NULL AND n > 0) AS applied, "
        "LEAST(h1 % (n + 1), h2 % (n + 1)) AS lo, "
        "GREATEST(h1 % (n + 1), h2 % (n + 1)) AS hi FROM h) "
        f"SELECT {id_cols}, applied AS fim_applied, "
        f"CASE WHEN applied THEN {reassembled} ELSE t END AS text_out FROM c"
    )


def _chat_token_spans_oracle_sql(
    n_merges: int = 8,
    merges_literal: "list[tuple[str, str]] | None" = None,
) -> str:
    """Exact DuckDB replica of q_chat_token_spans: train the merge
    table (:func:`_bpe_rounds_sql`), re-apply the SAME merge rounds to
    the chat-span encode word set (content words of all three turns
    plus the six header/footer words — ``ew0..ewN``), then replay the
    additive token-offset algebra: span start/end = cumulative BPE
    token count of every rendered piece before the trainable content
    (headers/footers are vocab lookups, contents are per-(doc, turn)
    word→n_subtokens sums).  Piece additivity holds because every
    ChatML boundary is non-alphanumeric, so no [a-z0-9]+ word run spans
    a piece edge — the same invariant text.py chat_token_spans leans
    on.

    With ``merges_literal`` (the q_chat_token_spans_static /
    SHIPPED-tokenizer path) the training chain is skipped entirely and
    each rewrite round inlines its literal ``' a  b '`` pattern —
    the oracle is then as cheap as the query."""
    if merges_literal is not None:
        sql = (
            "WITH convo AS (SELECT doc_id, "
            "'You are a concise assistant.' AS s, "
        )
    else:
        sql = _bpe_rounds_sql(n_merges)
        sql += ", convo AS (SELECT doc_id, 'You are a concise assistant.' AS s, "
    sql += (
        "text AS u, CASE WHEN doc_id % 4 <> 3 THEN "
        "'Summary ' || doc_id || ': ' || substr(text, 1, 80) END AS a "
        "FROM documents), "
        "tw AS MATERIALIZED ("
        "SELECT doc_id, 0 AS ti, unnest(list_filter(string_split_regex("
        "lower(s), '[^a-z0-9]+'), x -> x <> '')) AS w FROM convo "
        "WHERE s IS NOT NULL "
        "UNION ALL SELECT doc_id, 1, unnest(list_filter(string_split_regex("
        "lower(u), '[^a-z0-9]+'), x -> x <> '')) FROM convo "
        "WHERE u IS NOT NULL "
        "UNION ALL SELECT doc_id, 2, unnest(list_filter(string_split_regex("
        "lower(a), '[^a-z0-9]+'), x -> x <> '')) FROM convo "
        "WHERE a IS NOT NULL), "
        "ew0 AS MATERIALIZED (SELECT w, "
        "trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS toks FROM ("
        "SELECT DISTINCT w FROM (SELECT w FROM tw UNION ALL "
        "SELECT unnest(['im', 'start', 'end', 'system', 'user', "
        "'assistant']) AS w)))"
    )
    if merges_literal is not None:
        n_rounds = len(merges_literal)
        for r, (a, b) in enumerate(merges_literal, start=1):
            sql += (
                f", ew{r} AS MATERIALIZED (SELECT w, "
                "trim(regexp_replace("
                "replace(' ' || replace(toks, ' ', '  ') || ' ', "
                f"' {a}  {b} ', ' {a}{b} '), "
                f"' +', ' ', 'g')) AS toks FROM ew{r - 1})"
            )
    else:
        n_rounds = n_merges
        for r in range(1, n_merges + 1):
            sql += (
                f", ew{r} AS MATERIALIZED (SELECT w, "
                + _bpe_merge_rewrite_sql(r)
                + f" AS toks FROM ew{r - 1})"
            )
    sql += (
        f", vocab AS MATERIALIZED (SELECT w, "
        f"len(string_split(toks, ' ')) AS n FROM ew{n_rounds}), "
        "hv AS (SELECT "
        "(SELECT n FROM vocab WHERE w = 'im') AS n_im, "
        "(SELECT n FROM vocab WHERE w = 'start') AS n_st, "
        "(SELECT n FROM vocab WHERE w = 'end') AS n_en, "
        "(SELECT n FROM vocab WHERE w = 'system') AS n_sy, "
        "(SELECT n FROM vocab WHERE w = 'user') AS n_us, "
        "(SELECT n FROM vocab WHERE w = 'assistant') AS n_as), "
        "agg AS (SELECT doc_id, "
        "SUM(CASE WHEN ti = 0 THEN n END) AS nt0, "
        "SUM(CASE WHEN ti = 1 THEN n END) AS nt1, "
        "SUM(CASE WHEN ti = 2 THEN n END) AS nt2 "
        "FROM tw JOIN vocab USING (w) GROUP BY doc_id), "
        "o AS (SELECT c.doc_id, "
        "(CASE WHEN c.s IS NULL THEN 0 ELSE "
        "(hv.n_im + hv.n_st + hv.n_sy) + COALESCE(g.nt0, 0) + "
        "(hv.n_im + hv.n_en) END) + "
        "(CASE WHEN c.u IS NULL THEN 0 ELSE "
        "(hv.n_im + hv.n_st + hv.n_us) + COALESCE(g.nt1, 0) + "
        "(hv.n_im + hv.n_en) END) AS pre, "
        "(hv.n_im + hv.n_st + hv.n_as) AS ha, "
        "COALESCE(g.nt2, 0) AS nt2 "
        "FROM convo c LEFT JOIN agg g USING (doc_id), hv "
        "WHERE c.a IS NOT NULL) "
        "SELECT doc_id, 2 AS turn_idx, 'assistant' AS role, "
        "CAST(pre + ha + 1 AS INT) AS token_start, "
        "CAST(pre + ha + nt2 AS INT) AS token_end, "
        "CAST(nt2 AS INT) AS n_tokens FROM o"
    )
    return sql


#: DuckDB replica of _multiturn_convo's five columns
_MULTITURN_CONVO_SQL = (
    "WITH c AS (SELECT doc_id, 'You are a concise assistant.' AS s, "
    "text AS u, CASE WHEN doc_id % 4 <> 3 THEN "
    "'Summary ' || doc_id || ': ' || substr(text, 1, 60) END AS a, "
    "CASE WHEN doc_id % 5 <> 2 THEN 'Follow-up ' || doc_id || '?' END AS u2, "
    "CASE WHEN doc_id % 3 <> 1 THEN 'Done ' || doc_id || '.' END AS a2 "
    "FROM documents)"
)


def oracle_sql() -> dict[str, str]:
    return {
        "q_ann_pq": _pq_oracle_sql(m=2, k=8, iters=2, dim=64),
        # the indexed probes return the IDENTICAL result through the
        # persisted-codes physical path — same unrolled-replay oracles
        "q_ann_pq_indexed": _pq_oracle_sql(m=2, k=8, iters=2, dim=64),
        "q_ann_ivfpq_indexed": _ivfpq_oracle_sql(
            nlist=8, nprobe=3, m=2, k=8, iters=2, dim=64
        ),
        # the refreshed index trains on the base slice but encodes every
        # row (append with frozen codebooks) — train_pred restricts only
        # the training CTEs; staleness is the build-vs-now cell census
        "q_ann_index_refresh": _ivfpq_oracle_sql(
            nlist=8, nprobe=3, m=2, k=8, iters=2, dim=64,
            train_pred="(vec_id < 8 OR vec_id % 4 <> 1)",
        ),
        "q_ann_index_staleness": _ivfpq_oracle_sql(
            nlist=8, nprobe=3, m=2, k=8, iters=2, dim=64,
            train_pred="(vec_id < 8 OR vec_id % 4 <> 1)", tail="staleness",
        ),
        "q_image_neardup": _image_neardup_oracle_sql(),
        "q_image_phash": _image_phash_oracle_sql(),
        "q_image_crossformat": _image_crossformat_oracle_sql(),
        # the audio fingerprints carry the SAME group/flip formula, so
        # the closed-form pair replay is identical — modality-invariant
        "q_audio_neardup": _image_neardup_oracle_sql(),
        # same replay for VIDEO: dHash of frame 0 of each AVI must carry
        # the identical group/flip fingerprints (modality-invariant)
        "q_video_neardup": _image_neardup_oracle_sql(),
        # ZIP member census: closed-form names/sizes; non-ZIP ids must
        # surface as one file-level invalid row
        "q_zstd_ingest": """SELECT doc_id, 'part' || s.g || '.txt' AS member, CAST(length('content ' || doc_id || ' part ' || s.g || ' ') + doc_id % 50 AS BIGINT) AS n_bytes, 'ok' AS status FROM documents, generate_series(0, 2) s(g) WHERE doc_id % 7 <> 3 AND s.g <= doc_id % 3 UNION ALL SELECT doc_id, NULL AS member, NULL AS n_bytes, 'invalid' AS status FROM documents WHERE doc_id % 7 = 3""",
        "q_zip_ingest": """SELECT doc_id, 'part' || s.g || '.txt' AS member, CAST(length('content ' || doc_id || ' part ' || s.g || ' ') + doc_id % 50 AS BIGINT) AS n_bytes, 'ok' AS status FROM documents, generate_series(0, 2) s(g) WHERE doc_id % 7 <> 3 AND s.g <= doc_id % 3 UNION ALL SELECT doc_id, NULL AS member, NULL AS n_bytes, 'invalid' AS status FROM documents WHERE doc_id % 7 = 3""",
        # WebDataset shards: per-sample census closed-form; corrupt-gzip
        # ids contribute no samples
        "q_webdataset": """SELECT doc_id, doc_id || '_' || s.g AS key, CAST(2 AS BIGINT) AS n_parts, CAST(length('sample ' || doc_id || ' ' || s.g || ' ') + doc_id % 20 AS INT) AS txt_len, CAST((doc_id + s.g) % 10 AS VARCHAR) AS cls FROM documents, generate_series(0, 2) s(g) WHERE doc_id % 9 <> 5 AND s.g <= doc_id % 3""",
        # shard -> sample -> decode + caption: every stat closed-form
        "q_webdataset_pipeline": """SELECT doc_id, CAST(doc_id AS VARCHAR) AS key, CAST(doc_id % 16 + 1 AS INT) AS width, CAST(doc_id % 12 + 1 AS INT) AS height, CAST(doc_id % 256 AS DOUBLE) AS mean_r, CAST(2 + doc_id % 5 AS INT) AS n_caption_tokens FROM documents""",
        # streaming shard census: ok-mass closed-form from documents,
        # plus exactly one file-level invalid row for the corrupt shard
        "q_stream_shards": """SELECT 'ok' AS status, COUNT(*) AS n_members, CAST(SUM(length('doc ' || doc_id || ' ') + doc_id % 40) AS BIGINT) AS total_bytes FROM documents UNION ALL SELECT 'invalid' AS status, 1 AS n_members, NULL AS total_bytes""",
        # DOCX: the exact text reconstructs, proving escape -> extract
        # round-trips character-for-character
        "q_docx_extract": """SELECT doc_id, 'Report ' || doc_id || COALESCE((SELECT chr(10) || string_agg('row ' || s.g || ' A&B <' || ((doc_id * 3 + s.g) % 100) || '>', chr(10) ORDER BY s.g) FROM generate_series(0, 1) s(g) WHERE s.g < doc_id % 3), '') AS text FROM documents""",
        # PDF extraction: closed-form line construction replayed in SQL;
        # corrupted-Flate ids (d % 10 == 4)
        # must surface as NULL-text quarantine rows in both engines
        "q_pdf_extract": """SELECT doc_id, CAST(CASE WHEN doc_id % 10 = 4 THEN NULL ELSE doc_id % 4 + 1 END AS INT) AS n_lines, CASE WHEN doc_id % 10 = 4 THEN NULL ELSE (SELECT string_agg('doc ' || doc_id || ' line ' || s.g || ' token' || ((doc_id * 7 + s.g) % 1000), chr(10) ORDER BY s.g) FROM generate_series(0, 3) s(g) WHERE s.g <= doc_id % 4) END AS text FROM documents""",
        # each group is one Hamming<=2 clique, so the component label is
        # the group's minimum eligible id; singleton groups unlabeled
        # (neardup_components' nodes-with->=1-pair contract)
        "q_image_dedup": (
            "WITH elig AS (SELECT doc_id, (doc_id // 5) % 25 AS g "
            "FROM documents WHERE doc_id % 5 = 0), "
            "grp AS (SELECT g, COUNT(*) AS n, MIN(doc_id) AS m "
            "FROM elig GROUP BY g) "
            "SELECT e.doc_id AS id, grp.m AS comp FROM elig e "
            "JOIN grp USING (g) WHERE grp.n >= 2 ORDER BY id"
        ),
        # on-disk corpus pipeline: 125 Hamming<=2 cliques over ALL
        # non-junk ids (junk = % 29 == 7 quarantines by omission);
        # comp = the group's min surviving id, singletons unlabeled
        "q_image_pipeline": (
            "WITH elig AS (SELECT doc_id, doc_id % 125 AS g "
            "FROM documents WHERE doc_id % 29 <> 7), "
            "grp AS (SELECT g, COUNT(*) AS n, MIN(doc_id) AS m "
            "FROM elig GROUP BY g) "
            "SELECT e.doc_id AS id, grp.m AS comp FROM elig e "
            "JOIN grp USING (g) WHERE grp.n >= 2 ORDER BY id"
        ),
        "q_quality_score": _quality_score_oracle_sql(dim=64, seed=13, bias=-0.05),
        "q_ann_ivfpq": _ivfpq_oracle_sql(nlist=8, nprobe=3, m=2, k=8, iters=2, dim=64),
        "q_source_kl": (
            "WITH toks AS (SELECT source, unnest(list_filter("
            "string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS w "
            "FROM documents WHERE text IS NOT NULL), "
            "sw AS MATERIALIZED (SELECT source, w, COUNT(*) AS c "
            "FROM toks GROUP BY source, w), "
            "cw AS MATERIALIZED (SELECT w, SUM(c) AS cw FROM sw GROUP BY w), "
            "scal AS (SELECT SUM(cw) AS N, COUNT(*) AS V FROM cw), "
            "wt AS MATERIALIZED (SELECT w, ln((CAST(cw AS DOUBLE) + 1.0) "
            "/ CAST(N + V AS DOUBLE)) AS lnp FROM cw, scal), "
            "lall AS (SELECT SUM(lnp) AS L FROM wt), "
            "ns AS (SELECT source, SUM(c) AS n, COUNT(*) AS vs "
            "FROM sw GROUP BY source), "
            "pres AS (SELECT sw.source, "
            "SUM(((CAST(sw.c AS DOUBLE) + 1.0) / CAST(ns.n + scal.V AS DOUBLE)) "
            "* (ln((CAST(sw.c AS DOUBLE) + 1.0) / CAST(ns.n + scal.V AS DOUBLE)) "
            "- wt.lnp)) AS kp, "
            "SUM(wt.lnp) AS ls, MAX(ns.n) AS n, MAX(ns.vs) AS vs, "
            "MAX(scal.V) AS V "
            "FROM sw JOIN wt USING (w) JOIN ns USING (source), scal "
            "GROUP BY sw.source) "
            "SELECT source, CAST(n AS BIGINT) AS n_tokens, "
            "CAST(vs AS BIGINT) AS n_vocab, "
            "ROUND(kp + (1.0 / CAST(n + V AS DOUBLE)) * "
            "(CAST(V - vs AS DOUBLE) * ln(1.0 / CAST(n + V AS DOUBLE)) "
            "- (L - ls)), 6) AS kl FROM pres, lall"
        ),
        "q_bpe_train": _bpe_oracle_sql(n_merges=8),
        "q_bpe_encode": _bpe_oracle_sql(n_merges=8, encode=True),
        "q_chat_token_spans": _chat_token_spans_oracle_sql(n_merges=8),
        "q_chat_token_spans_static": _chat_token_spans_oracle_sql(
            merges_literal=[(a, b) for _, a, b, _ in _STATIC_MERGES]
        ),
        "q_tokenizer_fertility": (
            _bpe_rounds_sql(8)
            + ", vocab AS (SELECT w, len(string_split(toks, ' ')) AS ns "
            "FROM w8), "
            "dt AS (SELECT source, "
            "unnest(list_filter(string_split_regex(lower(text), "
            "'[^a-z0-9]+'), x -> x <> '')) AS w "
            "FROM documents WHERE text IS NOT NULL), "
            "a AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_words, "
            "CAST(SUM(ns) AS BIGINT) AS n_bpe_tokens, "
            "CAST(SUM(length(w)) AS BIGINT) AS n_chars "
            "FROM dt JOIN vocab USING (w) GROUP BY source) "
            "SELECT source, n_words, n_bpe_tokens, n_chars, "
            "n_bpe_tokens / n_words AS fertility, "
            "n_chars / n_bpe_tokens AS chars_per_token FROM a"
        ),
        "q_truncation_recall": _truncation_oracle_sql(dims=(16, 32), n_probes=4, k=10),
        "q_jl_distortion": _jl_oracle_sql(out_dim=16, seed=11, n_sample=16, dim=64),
        "q_class_weights": (
            # 1-beta is embedded as the Python-computed double so the
            # denominator matches F.lit(1.0 - beta) bit-for-bit
            "WITH c AS (SELECT label, COUNT(*) AS n FROM embeddings "
            "GROUP BY label), "
            "e AS (SELECT label, n, (1.0 - POWER(0.999, "
            "CAST(n AS DOUBLE))) / 0.0010000000000000009 AS eff FROM c), "
            "t AS (SELECT COUNT(*) AS k, SUM(1.0 / eff) AS tot FROM e) "
            "SELECT label, CAST(n AS BIGINT) AS n, ROUND(eff, 6) AS eff_n, "
            "ROUND((1.0 / eff) * k / tot, 6) AS weight FROM e, t"
        ),
        # The cosine is rebuilt bit-for-bit like vectors.py dot/l2_norm
        # (float×float products summed into double; squares in double)
        # instead of list_cosine_similarity, which computes in float and
        # lands on the wrong side of a round-4 carry boundary for
        # (qid 1, vec 124); double ROUND mirrors hard_negatives
        # (round 6) ∘ the q wrapper (round 4).
        "q_hard_negatives": (
            "WITH sims AS (SELECT q.vec_id AS qid, e.vec_id AS vec_id, "
            "list_sum(list_transform(range(1, len(e.embedding) + 1), "
            "i -> CAST(e.embedding[i] * q.embedding[i] AS DOUBLE))) "
            "/ NULLIF(sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1), "
            "i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))) "
            "* sqrt(list_sum(list_transform(range(1, len(q.embedding) + 1), "
            "i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)))), 0) "
            "AS raw FROM embeddings e JOIN (SELECT vec_id, embedding, label "
            "FROM embeddings WHERE vec_id < 8) q ON e.label <> q.label) "
            "SELECT qid, vec_id, sim, rank FROM ("
            "SELECT qid, vec_id, ROUND(ROUND(raw, 6), 4) AS sim, "
            "ROW_NUMBER() OVER (PARTITION BY qid "
            "ORDER BY raw DESC NULLS LAST, vec_id ASC) AS rank FROM sims"
            ") WHERE rank <= 5"
        ),
        "q_bloom_filter": _bloom_oracle_sql(m=1 << 14, k=5),
        "q_cube_revenue": (
            "WITH j AS (SELECT n_name, EXTRACT(year FROM o_orderdate) "
            "AS o_year, o_totalprice FROM orders "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey) "
            "SELECT n_name, CAST(o_year AS INTEGER) AS o_year, "
            "ROUND(SUM(o_totalprice), 2) AS revenue, "
            "CAST(COUNT(*) AS BIGINT) AS n_orders, "
            "CAST(GROUPING(n_name) * 2 + GROUPING(o_year) AS INTEGER) AS gid "
            "FROM j GROUP BY CUBE (n_name, o_year)"
        ),
        "q_rollup_revenue": (
            "WITH j AS (SELECT r_name, n_name, o_totalprice FROM orders "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey) "
            "SELECT r_name, n_name, ROUND(SUM(o_totalprice), 2) AS revenue, "
            "CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS INTEGER) AS gid "
            "FROM j GROUP BY ROLLUP (r_name, n_name)"
        ),
        "q_sparse_cosine": (
            "WITH toks AS (SELECT doc_id AS id, "
            "unnest(list_filter(string_split_regex(lower(text), "
            "'[^a-z0-9]+'), t -> t <> '')) AS term FROM documents), "
            "tf AS (SELECT id, term, COUNT(*) AS tf FROM toks "
            "GROUP BY id, term), "
            "dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term), "
            "n AS (SELECT COUNT(*) AS n FROM documents), "
            "w AS (SELECT tf.id, tf.term, "
            "tf.tf * LN(((SELECT n FROM n) + 1.0) / (dfq.df + 1.0)) AS w "
            "FROM tf JOIN dfq USING (term) WHERE dfq.df <= 100), "
            "nrm AS (SELECT id, sqrt(SUM(w * w)) AS nn FROM w GROUP BY id), "
            "u AS (SELECT w.id, w.term, w.w / nrm.nn AS u FROM w "
            "JOIN nrm ON w.id = nrm.id WHERE nrm.nn > 0) "
            "SELECT a.id AS id_a, b.id AS id_b, "
            "ROUND(SUM(a.u * b.u), 6) AS cosine "
            "FROM u a JOIN u b ON a.term = b.term AND a.id < b.id "
            "GROUP BY a.id, b.id HAVING ROUND(SUM(a.u * b.u), 6) >= 0.5"
        ),
        "q_kcore": _kcore_oracle_sql(k=16, rounds=8),
        "q_link_prediction": (
            "WITH e0 AS (SELECT DISTINCT l_orderkey % 3000 AS u, "
            "l_partkey % 3000 + 3000 AS v FROM lineitem), "
            "sym AS MATERIALIZED (SELECT u, v FROM e0 "
            "UNION ALL SELECT v, u FROM e0), "
            "deg AS MATERIALIZED (SELECT u, COUNT(*) AS d FROM sym "
            "GROUP BY u), "
            "mid AS MATERIALIZED (SELECT s.v AS z, s.u AS x, deg.d "
            "FROM sym s JOIN deg ON s.v = deg.u WHERE deg.d <= 64), "
            "pairs AS MATERIALIZED (SELECT l.x AS a, r.x AS b, "
            "CAST(COUNT(*) AS BIGINT) AS n_common, "
            "ROUND(SUM(1.0 / ln(l.d)), 6) AS score "
            "FROM mid l JOIN mid r ON l.z = r.z AND l.x < r.x "
            "GROUP BY l.x, r.x) "
            "SELECT p.a, p.b, p.n_common, p.score FROM pairs p "
            "WHERE NOT EXISTS (SELECT 1 FROM sym WHERE u = p.a AND v = p.b) "
            "ORDER BY p.score DESC, p.a ASC, p.b ASC LIMIT 20"
        ),
        "q_lpa_communities": _lpa_oracle_sql(rounds=5),
        "q_wl_refinement": _wl_oracle_sql(rounds=3),
        "q_shortest_paths": _sssp_oracle_sql(rounds=6),
        "q_harmonic_centrality": _harmonic_oracle_sql(rounds=4),
        "q_hits": _hits_oracle_sql(iters=8),
        "q_pca_top_component": _pca_oracle_sql(dim=64, iters=12),
        "q_pca_scores": _pca_scores_oracle_sql(dim=64, iters=12, k=10),
        "q_pca_components": _pca2_oracle_sql(dim=64, iters=12),
        "q_sorted_neighborhood": (
            "WITH keyed AS MATERIALIZED (SELECT doc_id AS id, "
            "substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), 1, 24) "
            "AS key FROM documents), "
            "kk AS MATERIALIZED (SELECT * FROM keyed WHERE length(key) > 0), "
            "rk AS MATERIALIZED (SELECT id, key, substr(key, 1, 2) AS bucket, "
            "ROW_NUMBER() OVER (PARTITION BY substr(key, 1, 2) "
            "ORDER BY key, id) AS rank FROM kk) "
            "SELECT DISTINCT LEAST(a.id, b.id) AS id_a, "
            "GREATEST(a.id, b.id) AS id_b, "
            "CAST(levenshtein(a.key, b.key) AS INTEGER) AS dist "
            "FROM rk a JOIN rk b ON a.bucket = b.bucket "
            "AND b.rank > a.rank AND b.rank - a.rank <= 5 "
            "WHERE levenshtein(a.key, b.key) <= 6"
        ),
        # streaming queries oracle against their batch twins: a drained
        # availableNow stream must equal the one-shot batch answer
        "q_zorder_keys": _zorder_oracle_sql(),
        "q_trigram_search": (
            "SELECT doc_id FROM documents "
            "WHERE contains(lower(text), 'window table')"
        ),
        "q_acf": " UNION ALL ".join(
            (
                "SELECT * FROM ("
                "WITH s AS (SELECT event_type, "
                "CAST(floor(epoch(ts) / 3600) AS BIGINT) AS b, "
                "SUM(value) AS x FROM events "
                "WHERE event_type IS NOT NULL AND value IS NOT NULL "
                "GROUP BY event_type, b), "
                "l AS (SELECT event_type, x, "
                f"LAG(x, {lag}) OVER (PARTITION BY event_type ORDER BY b) AS y "
                "FROM s) "
                f"SELECT event_type, {lag} AS lag, "
                "CAST(COUNT(*) AS BIGINT) AS n_pairs, "
                "ROUND(corr(x, y), 6) AS acf "
                "FROM l WHERE y IS NOT NULL GROUP BY event_type)"
            )
            for lag in range(1, 7)
        ),
        "q_markov_attribution": _markov_oracle_sql(iters=12),
        "q_corpus_report": (
            "SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources, "
            "CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs, "
            "CAST(SUM(n_chars) AS BIGINT) AS total_chars, "
            "ROUND(AVG(n_chars), 4) AS avg_chars, "
            "CAST(MIN(n_chars) AS BIGINT) AS min_chars, "
            "CAST(MAX(n_chars) AS BIGINT) AS max_chars, "
            "CAST(COUNT(DISTINCT md5(regexp_replace(lower(text), "
            "'[^a-z0-9]', '', 'g'))) AS BIGINT) AS n_unique_texts, "
            "ROUND(1.0 - COUNT(DISTINCT md5(regexp_replace(lower(text), "
            "'[^a-z0-9]', '', 'g'))) * 1.0 / COUNT(*), 6) AS dup_rate, "
            "CAST(COUNT(*) FILTER (lang = 'en') AS BIGINT) AS n_en "
            "FROM documents"
        ),
        "q_semantic_clusters": (
            # pair gen mirrors sign_bucket_pairs(bits=6, threshold=0.3):
            # same-sign-pattern buckets over the first 6 dims, then
            # rounded cosine >= 0.3
            "WITH RECURSIVE bkt AS (SELECT vec_id, embedding, "
            "list_aggregate(list_transform(embedding[1:6], "
            "x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), "
            "'string_agg', '') AS bucket FROM embeddings "
            "WHERE embedding IS NOT NULL), "
            "pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b "
            "FROM bkt a JOIN bkt b ON a.bucket = b.bucket "
            "AND a.vec_id < b.vec_id "
            "WHERE ROUND(list_cosine_similarity(a.embedding, b.embedding), 4) "
            ">= 0.3), "
            "edges AS (SELECT id_a AS s, id_b AS d FROM pairs "
            "UNION SELECT id_b, id_a FROM pairs), "
            "reach AS (SELECT s, d FROM edges "
            "UNION SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s), "
            "comp AS (SELECT s AS id, LEAST(s, MIN(d)) AS comp FROM reach "
            "GROUP BY s) "
            "SELECT comp AS cluster, CAST(COUNT(*) AS BIGINT) AS n_members "
            "FROM comp GROUP BY comp"
        ),
        "q_dsir_weights": (
            "WITH tok AS (SELECT doc_id, lang = 'en' AS t, "
            "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), "
            "x -> x <> '') AS toks FROM documents), "
            "g AS (SELECT doc_id, t, "
            "unnest([toks[i] || ' ' || toks[i + 1] "
            "for i in range(1, len(toks))]) AS g "
            "FROM tok WHERE len(toks) >= 2), "
            "occ AS (SELECT doc_id, t, "
            "CAST(CONCAT('0x', substr(md5(g), 1, 13)) AS BIGINT) % 1024 AS b "
            "FROM g), "
            "cnt AS (SELECT b, COUNT(*) FILTER (t) AS nt, COUNT(*) AS nr "
            "FROM occ GROUP BY b), "
            "tot AS (SELECT COUNT(*) FILTER (t) AS Nt, COUNT(*) AS Nr "
            "FROM occ), "
            "ratio AS (SELECT b, "
            "ln((nt + 1.0) / ((SELECT Nt FROM tot) + 1024.0)) "
            "- ln((nr + 1.0) / ((SELECT Nr FROM tot) + 1024.0)) AS lr "
            "FROM cnt) "
            "SELECT occ.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams, "
            "ROUND(SUM(lr), 6) AS weight "
            "FROM occ JOIN ratio ON occ.b = ratio.b GROUP BY occ.doc_id"
        ),
        "q_fingerprint_clusters": (
            "WITH keyed AS (SELECT text AS raw, "
            "md5(array_to_string(list_sort(list_distinct(list_filter("
            "string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> ''))), "
            "' ')) AS fp FROM documents WHERE text IS NOT NULL), "
            "bv AS (SELECT fp, raw, COUNT(*) AS n FROM keyed "
            "GROUP BY fp, raw), "
            "cl AS (SELECT fp, CAST(SUM(n) AS BIGINT) AS n_members, "
            "CAST(COUNT(*) AS BIGINT) AS n_variants, "
            "MIN((-n, raw))[2] AS canonical FROM bv GROUP BY fp) "
            "SELECT * FROM cl WHERE n_members >= 2 AND n_variants >= 2"
        ),
        "q_fd_check": (
            "WITH per AS (SELECT source, COUNT(DISTINCT lang) AS nv "
            "FROM documents GROUP BY source) "
            "SELECT CAST(COUNT(*) AS BIGINT) AS n_groups, "
            "CAST(COUNT(*) FILTER (nv > 1) AS BIGINT) AS n_violating, "
            "CAST(MAX(nv) AS BIGINT) AS max_variants, "
            "COUNT(*) FILTER (nv > 1) = 0 AS holds FROM per"
        ),
        "q_feature_hash": (
            "WITH toks AS (SELECT doc_id AS id, "
            "unnest(list_filter(string_split_regex(lower(text), "
            "'[^a-z0-9]+'), t -> t <> '')) AS tok FROM documents) "
            "SELECT id, "
            "CAST(CONCAT('0x', substr(md5(CONCAT(tok, '#fh')), 1, 13)) "
            "AS BIGINT) % 256 AS idx, "
            "CAST(SUM(CASE WHEN CAST(CONCAT('0x', "
            "substr(md5(CONCAT(tok, '#fs')), 1, 13)) AS BIGINT) % 2 = 0 "
            "THEN 1 ELSE -1 END) AS BIGINT) AS val "
            "FROM toks GROUP BY id, idx HAVING val <> 0"
        ),
        "q_radius_join": (
            # brute force: completeness proof for the grid blocking
            "WITH p AS (SELECT c_custkey AS id, "
            "(c_custkey % 100) / 10.0 + 40.0 AS lat, "
            "(c_custkey * 7 % 100) / 10.0 AS lon FROM customer), "
            "d AS (SELECT a.id AS id_a, b.id AS id_b, "
            "2 * 6371.0088 * asin(sqrt("
            "sin(radians(b.lat - a.lat) / 2) ^ 2 "
            "+ cos(radians(a.lat)) * cos(radians(b.lat)) "
            "* sin(radians(b.lon - a.lon) / 2) ^ 2)) AS dist "
            "FROM p a JOIN p b ON a.id < b.id) "
            "SELECT DISTINCT id_a, id_b, ROUND(dist, 3) AS dist_km "
            "FROM d WHERE dist <= 50.0"
        ),
        "q_record_linkage": (
            "WITH base AS (SELECT c_custkey AS id, c_nationkey AS block, "
            "c_mktsegment AS seg, "
            "CAST(floor(c_acctbal/1000) AS BIGINT) AS bal_k, "
            "CAST(floor(c_acctbal/100) AS BIGINT) AS bal_h FROM customer), "
            "u1 AS (SELECT SUM(n*n)*1.0/(SUM(n)*SUM(n)) AS u FROM "
            "(SELECT COUNT(*) AS n FROM customer "
            "WHERE c_mktsegment IS NOT NULL GROUP BY c_mktsegment)), "
            "u2 AS (SELECT SUM(n*n)*1.0/(SUM(n)*SUM(n)) AS u FROM "
            "(SELECT COUNT(*) AS n FROM base WHERE bal_k IS NOT NULL "
            "GROUP BY bal_k)), "
            "u3 AS (SELECT SUM(n*n)*1.0/(SUM(n)*SUM(n)) AS u FROM "
            "(SELECT COUNT(*) AS n FROM base WHERE bal_h IS NOT NULL "
            "GROUP BY bal_h)) "
            "SELECT * FROM ("
            "SELECT a.id AS id_a, b.id AS id_b, "
            # three-way branch mirrors linkage.py: NULL on either side is
            # zero evidence (neither agree nor disagree weight)
            "CAST((CASE WHEN a.seg = b.seg THEN 1 ELSE 0 END) "
            "+ (CASE WHEN a.bal_k = b.bal_k THEN 1 ELSE 0 END) "
            "+ (CASE WHEN a.bal_h = b.bal_h THEN 1 ELSE 0 END) AS INTEGER) "
            "AS n_agree, "
            "ROUND(CASE WHEN a.seg IS NULL OR b.seg IS NULL THEN 0 "
            "WHEN a.seg = b.seg THEN log2(0.9/(SELECT u FROM u1)) "
            "ELSE log2(0.1/(1-(SELECT u FROM u1))) END "
            "+ CASE WHEN a.bal_k IS NULL OR b.bal_k IS NULL THEN 0 "
            "WHEN a.bal_k = b.bal_k THEN log2(0.85/(SELECT u FROM u2)) "
            "ELSE log2(0.15/(1-(SELECT u FROM u2))) END "
            "+ CASE WHEN a.bal_h IS NULL OR b.bal_h IS NULL THEN 0 "
            "WHEN a.bal_h = b.bal_h THEN log2(0.7/(SELECT u FROM u3)) "
            "ELSE log2(0.3/(1-(SELECT u FROM u3))) END, 4) AS score "
            "FROM base a JOIN base b ON a.block = b.block AND a.id < b.id"
            ") WHERE score >= 8.0"
        ),
        "q_media_pixels": (
            # the decoded CONTENT statistics must equal the generation
            # formula: constant-fill BMPs/WAVs make every mean/rms/peak
            # exact in float64 (mean of n identical ints is exact)
            "SELECT doc_id, "
            "CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END "
            "AS media_type, "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN doc_id % 64 + 1 END AS INTEGER) "
            "AS width, "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN doc_id % 48 + 1 END AS INTEGER) "
            "AS height, "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN 1 "
            "ELSE doc_id % 1000 + 1 END AS INTEGER) AS n_frames, "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN doc_id % 256 END AS DOUBLE) "
            "AS mean_r, "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN (doc_id * 3) % 256 END AS DOUBLE) "
            "AS mean_g, "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN (doc_id * 7) % 256 END AS DOUBLE) "
            "AS mean_b, "
            "CAST(CASE WHEN doc_id % 2 = 1 THEN doc_id % 2048 END AS DOUBLE) "
            "AS rms, "
            "CAST(CASE WHEN doc_id % 2 = 1 THEN doc_id % 2048 END AS DOUBLE) "
            "AS peak "
            "FROM documents"
        ),
        # identical closed form: q_media_flac swaps the audio CONTAINER
        # (rice-coded FLAC for PCM WAV) — constant blocks decode
        # losslessly, so every statistic is container-invariant
        "q_media_flac": (
            "SELECT doc_id, "
            "CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END "
            "AS media_type, "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN doc_id % 64 + 1 END AS INTEGER) "
            "AS width, "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN doc_id % 48 + 1 END AS INTEGER) "
            "AS height, "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN 1 "
            "ELSE doc_id % 1000 + 1 END AS INTEGER) AS n_frames, "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN doc_id % 256 END AS DOUBLE) "
            "AS mean_r, "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN (doc_id * 3) % 256 END AS DOUBLE) "
            "AS mean_g, "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN (doc_id * 7) % 256 END AS DOUBLE) "
            "AS mean_b, "
            "CAST(CASE WHEN doc_id % 2 = 1 THEN doc_id % 2048 END AS DOUBLE) "
            "AS rms, "
            "CAST(CASE WHEN doc_id % 2 = 1 THEN doc_id % 2048 END AS DOUBLE) "
            "AS peak "
            "FROM documents"
        ),
        "q_url_normalize": (
            # closed-form EXPECTED output of normalize_url/registered_domain
            # on the deterministic messy url (_messy_url): lowercased
            # scheme+host, www/port/fragment/tracking-param/trailing-slash
            # stripped, surviving params sorted ('a=' < 'z=' lexically)
            "SELECT doc_id, "
            "'https://' || source || CAST(doc_id % 20 AS VARCHAR) || "
            "'.example' || "
            "CASE doc_id % 4 WHEN 0 THEN '.com' WHEN 1 THEN '.co.uk' "
            "WHEN 2 THEN '.org' ELSE '.com.au' END || "
            "'/Docs/' || CAST(doc_id % 7 AS VARCHAR) || "
            "'?a=' || CAST(doc_id % 2 AS VARCHAR) || '&z=9' AS url_norm, "
            "'example' || CASE doc_id % 4 WHEN 0 THEN '.com' "
            "WHEN 1 THEN '.co.uk' WHEN 2 THEN '.org' ELSE '.com.au' END "
            "AS domain "
            "FROM documents"
        ),
        "q_domain_cap": (
            # the salted two-phase cap must equal the plain per-domain
            # ROW_NUMBER cap (keep the 3 lowest doc_ids per domain)
            "SELECT doc_id, domain FROM ("
            "SELECT doc_id, "
            "source || CAST(doc_id % 20 AS VARCHAR) || '.com' AS domain, "
            "ROW_NUMBER() OVER (PARTITION BY "
            "source || CAST(doc_id % 20 AS VARCHAR) ORDER BY doc_id) AS rn "
            "FROM documents) WHERE rn <= 3"
        ),
        "q_warc_ingest": _warc_ingest_oracle_sql(),
        "q_html_extract": _html_extract_oracle_sql(),
        "q_warc_pipeline": _warc_pipeline_oracle_sql(),
        "q_pipeline_resume": (
            # one-statement replay of the whole materialized pipeline
            "SELECT source, COUNT(*) AS n_docs, "
            "CAST(SUM(LENGTH(text)) AS BIGINT) AS n_chars "
            "FROM documents WHERE LENGTH(text) >= 400 GROUP BY source"
        ),
        "q_lr_train": _lr_oracle_sql(score=False),
        "q_lr_score": _lr_oracle_sql(score=True),
        "q_lr_eval": _lr_eval_oracle_sql(),
        "q_link_extract": _link_extract_oracle_sql(),
        "q_stream_warc": _stream_warc_oracle_sql(),
        "q_crawl_pagerank": _pagerank_oracle_sql(10, _CRAWL_EDGES_SQL),
        "q_mime_sniff": _MIME_SNIFF_ORACLE_SQL,
        "q_robots_filter": _ROBOTS_FILTER_ORACLE_SQL,
        "q_gopher_rules": (
            # replay of the Gopher A1.1 statistics in DuckDB list
            # functions; ratios are raw int/int doubles (bit-identical)
            "WITH base AS (SELECT doc_id, text, "
            "list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS w, "
            "list_filter(list_transform(string_split(text, chr(10)), "
            "x -> trim(x)), x -> x <> '') AS ln "
            "FROM documents), "
            "m AS (SELECT doc_id, len(w) AS n_words, "
            "CASE WHEN len(w) > 0 THEN CAST(list_sum(list_transform(w, "
            "x -> length(x))) AS DOUBLE) / len(w) END AS mean_word_len, "
            "CASE WHEN len(w) > 0 THEN CAST("
            "length(text) - length(regexp_replace(text, '#', '', 'g')) "
            "+ (length(text) - length(regexp_replace(text, '\\.\\.\\.', '', 'g'))) / 3 "
            "AS DOUBLE) / len(w) END AS symbol_ratio, "
            "CASE WHEN len(ln) > 0 THEN CAST(len(list_filter(ln, "
            "x -> regexp_matches(x, '^[-*•]'))) AS DOUBLE) / len(ln) "
            "ELSE 0.0 END AS bullet_line_ratio, "
            "CASE WHEN len(ln) > 0 THEN CAST(len(list_filter(ln, "
            "x -> regexp_matches(x, '(\\.\\.\\.|…)$'))) AS DOUBLE) / len(ln) "
            "ELSE 0.0 END AS ellipsis_line_ratio, "
            "CASE WHEN len(w) > 0 THEN CAST(len(list_filter(w, "
            "x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) / len(w) "
            "END AS alpha_word_ratio, "
            "COALESCE(len(list_filter(['the','be','to','of','and','that',"
            "'have','with'], s -> list_contains(list_transform(w, "
            "x -> regexp_replace(lower(x), '[^a-z]', '', 'g')), s))), 0) "
            "AS n_stopwords FROM base) "
            "SELECT doc_id, n_words, mean_word_len, symbol_ratio, "
            "bullet_line_ratio, ellipsis_line_ratio, alpha_word_ratio, "
            "n_stopwords, "
            "COALESCE(n_words BETWEEN 20 AND 100000, FALSE) AS r_word_count, "
            "COALESCE(mean_word_len BETWEEN 3.0 AND 10.0, FALSE) AS r_word_len, "
            "COALESCE(symbol_ratio <= 0.1, FALSE) AS r_symbols, "
            "COALESCE(bullet_line_ratio <= 0.9, FALSE) AS r_bullets, "
            "COALESCE(ellipsis_line_ratio <= 0.3, FALSE) AS r_ellipses, "
            "COALESCE(alpha_word_ratio >= 0.8, FALSE) AS r_alpha, "
            "COALESCE(n_stopwords >= 2, FALSE) AS r_stopwords, "
            "COALESCE(n_words BETWEEN 20 AND 100000 "
            "AND mean_word_len BETWEEN 3.0 AND 10.0 "
            "AND symbol_ratio <= 0.1 AND bullet_line_ratio <= 0.9 "
            "AND ellipsis_line_ratio <= 0.3 AND alpha_word_ratio >= 0.8 "
            "AND n_stopwords >= 2, FALSE) AS passes "
            "FROM m"
        ),
        "q_media_gif": (
            # animated GIFs: frame f of doc d is the constant palette color
            # ((d+f)%256, (3d+f)%256, (7d+f)%256); whole-file means average
            # over the d%5+1 frames (generate_series is constant-bounded —
            # DuckDB's table functions take no lateral column parameters)
            "SELECT doc_id, "
            "CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END "
            "AS media_type, "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN doc_id % 64 + 1 END AS INTEGER) "
            "AS width, "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN doc_id % 48 + 1 END AS INTEGER) "
            "AS height, "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN doc_id % 5 + 1 "
            "ELSE doc_id % 1000 + 1 END AS INTEGER) AS n_frames, "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN (SELECT AVG((doc_id + s.g) % 256) "
            "FROM generate_series(0, 4) s(g) WHERE s.g <= doc_id % 5) END "
            "AS DOUBLE) AS mean_r, "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN (SELECT AVG((3 * doc_id + s.g) % 256) "
            "FROM generate_series(0, 4) s(g) WHERE s.g <= doc_id % 5) END "
            "AS DOUBLE) AS mean_g, "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN (SELECT AVG((7 * doc_id + s.g) % 256) "
            "FROM generate_series(0, 4) s(g) WHERE s.g <= doc_id % 5) END "
            "AS DOUBLE) AS mean_b, "
            "CAST(CASE WHEN doc_id % 2 = 1 THEN doc_id % 2048 END AS DOUBLE) "
            "AS rms, "
            "CAST(CASE WHEN doc_id % 2 = 1 THEN doc_id % 2048 END AS DOUBLE) "
            "AS peak "
            "FROM documents"
        ),
        "q_media_avi": (
            # AVI-MJPEG videos: frame f of doc d is constant gray
            # (d+f)%256, d%3+1 frames per video; constant-gray baseline
            # JPEG round-trips bit-exactly (all-ones quantization), so
            # whole-video means are the closed-form frame average
            "SELECT doc_id, "
            "CASE WHEN doc_id % 2 = 0 THEN 'video' ELSE 'audio' END "
            "AS media_type, "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN doc_id % 64 + 1 END AS INTEGER) "
            "AS width, "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN doc_id % 48 + 1 END AS INTEGER) "
            "AS height, "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN doc_id % 3 + 1 "
            "ELSE doc_id % 1000 + 1 END AS INTEGER) AS n_frames, "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN (SELECT AVG((doc_id + s.g) % 256) "
            "FROM generate_series(0, 2) s(g) WHERE s.g <= doc_id % 3) END "
            "AS DOUBLE) AS mean_r, "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN (SELECT AVG((doc_id + s.g) % 256) "
            "FROM generate_series(0, 2) s(g) WHERE s.g <= doc_id % 3) END "
            "AS DOUBLE) AS mean_g, "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN (SELECT AVG((doc_id + s.g) % 256) "
            "FROM generate_series(0, 2) s(g) WHERE s.g <= doc_id % 3) END "
            "AS DOUBLE) AS mean_b, "
            "CAST(CASE WHEN doc_id % 2 = 1 THEN doc_id % 2048 END AS DOUBLE) "
            "AS rms, "
            "CAST(CASE WHEN doc_id % 2 = 1 THEN doc_id % 2048 END AS DOUBLE) "
            "AS peak "
            "FROM documents"
        ),
        "q_media_frames": (
            # every 2nd frame of each image doc, nearest-resized to 8x8 —
            # constant frames keep the closed-form means exact post-resize
            "SELECT doc_id, CAST(f.g AS INTEGER) AS frame_idx, "
            "CAST(8 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height, "
            "CAST((doc_id + f.g) % 256 AS DOUBLE) AS mean_r, "
            "CAST((3 * doc_id + f.g) % 256 AS DOUBLE) AS mean_g, "
            "CAST((7 * doc_id + f.g) % 256 AS DOUBLE) AS mean_b "
            "FROM documents, generate_series(0, 4) f(g) "
            "WHERE doc_id % 2 = 0 AND f.g <= doc_id % 5 AND f.g % 2 = 0"
        ),
        "q_media_jpeg": (
            # greyscale baseline JPEGs, gray level doc_id % 256: all-ones
            # quantization makes the constant-block round-trip bit-exact,
            # so every decoded mean equals the generation formula
            "SELECT doc_id, "
            "CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END "
            "AS media_type, "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN doc_id % 64 + 1 END AS INTEGER) "
            "AS width, "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN doc_id % 48 + 1 END AS INTEGER) "
            "AS height, "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN 1 "
            "ELSE doc_id % 1000 + 1 END AS INTEGER) AS n_frames, "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN doc_id % 256 END AS DOUBLE) "
            "AS mean_r, "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN doc_id % 256 END AS DOUBLE) "
            "AS mean_g, "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN doc_id % 256 END AS DOUBLE) "
            "AS mean_b, "
            "CAST(CASE WHEN doc_id % 2 = 1 THEN doc_id % 2048 END AS DOUBLE) "
            "AS rms, "
            "CAST(CASE WHEN doc_id % 2 = 1 THEN doc_id % 2048 END AS DOUBLE) "
            "AS peak "
            "FROM documents"
        ),
        "q_media_ingest": (
            # files exist for documents ids % 25 == 0; every decoded
            # statistic and the binaryFile length column are closed-form
            # in the id (BMP rows pad to 4 bytes; WAV = 44-byte header +
            # 2 bytes/frame; .txt junk = 'not media: {id}' and NULL stats)
            "SELECT doc_id AS file_key, "
            "CASE WHEN doc_id % 2 = 0 THEN 'image' "
            "WHEN doc_id % 4 = 1 THEN 'audio' ELSE 'other' END AS media_type, "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN "
            "54 + (((doc_id % 64 + 1) * 3 + 3) // 4) * 4 * (doc_id % 48 + 1) "
            "WHEN doc_id % 4 = 1 THEN 44 + 2 * (doc_id % 1000 + 1) "
            "ELSE 11 + length(CAST(doc_id AS VARCHAR)) END AS BIGINT) AS n_bytes, "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN doc_id % 64 + 1 END AS INTEGER) "
            "AS width, "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN doc_id % 48 + 1 END AS INTEGER) "
            "AS height, "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN 1 "
            "WHEN doc_id % 4 = 1 THEN doc_id % 1000 + 1 END AS INTEGER) "
            "AS n_frames, "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN doc_id % 256 END AS DOUBLE) "
            "AS mean_r, "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN (doc_id * 3) % 256 END AS DOUBLE) "
            "AS mean_g, "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN (doc_id * 7) % 256 END AS DOUBLE) "
            "AS mean_b, "
            "CAST(CASE WHEN doc_id % 4 = 1 THEN doc_id % 2048 END AS DOUBLE) "
            "AS rms, "
            "CAST(CASE WHEN doc_id % 4 = 1 THEN doc_id % 2048 END AS DOUBLE) "
            "AS peak "
            "FROM documents WHERE doc_id % 25 = 0"
        ),
        "q_media_decode": (
            # the decoded header fields must equal the generation formula:
            # BMP rows pad to 4 bytes; WAV = 44-byte header + 2 bytes/frame
            "SELECT doc_id, "
            "CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END "
            "AS media_type, "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN "
            "54 + (((doc_id % 64 + 1) * 3 + 3) // 4) * 4 * (doc_id % 48 + 1) "
            "ELSE 44 + 2 * (doc_id % 1000 + 1) END AS BIGINT) AS n_bytes, "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN doc_id % 64 + 1 END AS INTEGER) "
            "AS width, "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN doc_id % 48 + 1 END AS INTEGER) "
            "AS height, "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN 1 "
            "ELSE doc_id % 1000 + 1 END AS INTEGER) AS n_frames "
            "FROM documents"
        ),
        "q_stream_join": (
            # batch twin of the stream-stream interval join
            "SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id, "
            "CAST(floor(epoch(v.ts)) AS BIGINT) AS view_ts, "
            "CAST(floor(epoch(c.ts)) AS BIGINT) AS click_ts "
            "FROM events v JOIN events c ON v.user_id = c.user_id "
            "AND v.event_type = 'view' AND c.event_type = 'click' "
            "AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 24 HOUR"
        ),
        "q_stream_stateful": (
            # batch twin of the GroupState running totals
            "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events, "
            "ROUND(SUM(value), 2) AS value_sum FROM events GROUP BY user_id"
        ),
        "q_stream_sessions": (
            # batch twin: identical gaps-and-islands SQL as q_events_sessions
            "WITH e AS (SELECT user_id, ts, value, "
            "CASE WHEN lag(ts) OVER w IS NULL "
            "OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s "
            "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)), "
            "s AS (SELECT *, SUM(new_s) OVER "
            "(PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM e) "
            "SELECT user_id, CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start, "
            "COUNT(*) AS n_events, ROUND(SUM(value), 2) AS value_sum "
            "FROM s GROUP BY user_id, sid"
        ),
        "q_stream_hourly": (
            "SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS window_start, "
            "event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS value_sum "
            "FROM events GROUP BY 1, event_type"
        ),
        "q_stream_sliding": (
            "SELECT CAST(floor(epoch(ts) / 900) * 900 - 900 * g AS BIGINT) "
            "AS window_start, event_type, COUNT(*) AS n "
            "FROM events CROSS JOIN generate_series(0, 3) t(g) "
            "GROUP BY 1, 2"
        ),
        "q_stream_dedup": (
            "SELECT DISTINCT user_id, event_type FROM events"
        ),
        # bipartite exact shingle-Jaccard: arrivals (% 3 == 0) vs the
        # indexed corpus slice — the banding-only-prunes argument of
        # q_minhash_pairs applies unchanged
        "q_stream_neardup": (
            "WITH toks AS (SELECT doc_id AS id, list_filter("
            "string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t "
            "FROM documents), "
            "sh AS (SELECT id, unnest(list_distinct(list_transform("
            "range(1, greatest(len(t) - 2, 1) + 1), "
            "i -> array_to_string(t[i:i+2], ' ')))) AS s "
            "FROM toks WHERE len(t) > 0), "
            "sizes AS (SELECT id, COUNT(*) AS sz FROM sh GROUP BY id), "
            "pairs AS (SELECT a.id AS new_id, b.id AS corpus_id, "
            "COUNT(*) AS n_inter FROM sh a JOIN sh b ON a.s = b.s "
            "WHERE a.id % 3 = 0 AND b.id % 3 <> 0 GROUP BY 1, 2) "
            "SELECT new_id, corpus_id, "
            "ROUND(n_inter / CAST(sa.sz + sb.sz - n_inter AS DOUBLE), 4) "
            "AS jaccard "
            "FROM pairs JOIN sizes sa ON new_id = sa.id "
            "JOIN sizes sb ON corpus_id = sb.id "
            "WHERE n_inter / CAST(sa.sz + sb.sz - n_inter AS DOUBLE) >= 0.8 "
            "ORDER BY new_id, corpus_id"
        ),
        # pruned probe: exact replica of the 1-bit multiprobe bucket set
        # (deterministic seeded hyperplanes embedded as SQL literals)
        "q_ann_probe_pruned": _ann_probe_oracle_sql(),
        "q_winnow_fingerprints": (
            # same winnowing pipeline in list algebra: char-5-gram
            # md5-prefix 52-bit hashes, min per 4-wide sliding window,
            # distinct; checksum = exact sum of fp % 1000003
            "WITH n AS (SELECT doc_id, "
            "regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS nt "
            "FROM documents), "
            "m AS (SELECT doc_id, nt, len(nt) - 4 AS ng FROM n WHERE len(nt) >= 5), "
            "h AS (SELECT doc_id, ng, list_transform(range(1, ng + 1), "
            "i -> CAST(CONCAT('0x', substr(md5(substr(nt, CAST(i AS INT), 5)), 1, 13)) "
            "AS BIGINT)) AS hs FROM m), "
            "w AS (SELECT doc_id, ng, list_distinct(list_transform("
            "range(1, greatest(ng - 3, 1) + 1), "
            "j -> list_min(hs[j:j+3]))) AS fps FROM h) "
            "SELECT doc_id, CAST(ng AS BIGINT) AS n_grams, "
            "CAST(len(fps) AS BIGINT) AS n_fps, "
            "list_min(fps) AS fp_min, "
            "CAST(list_sum(list_transform(fps, x -> x % 1000003)) AS BIGINT) "
            "AS fp_checksum FROM w"
        ),
        "q_token_pmi": (
            # same pipeline relationally: distinct tokens per doc, top-50
            # vocab by df (ties tok asc), pair df via self-join, PMI
            "WITH toks AS (SELECT doc_id, unnest(list_distinct(list_filter("
            "string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> ''))) AS tok "
            "FROM documents), "
            "vocab AS (SELECT tok, COUNT(*) AS df_cnt FROM toks GROUP BY tok "
            "ORDER BY df_cnt DESC, tok ASC LIMIT 50), "
            "vt AS (SELECT t.doc_id, t.tok FROM toks t JOIN vocab USING (tok)), "
            "p AS (SELECT a.tok AS tok_a, b.tok AS tok_b, COUNT(*) AS n_ab "
            "FROM vt a JOIN vt b ON a.doc_id = b.doc_id AND a.tok < b.tok "
            "GROUP BY 1, 2 HAVING COUNT(*) >= 5), "
            "n AS (SELECT COUNT(*) AS nd FROM documents) "
            "SELECT tok_a, tok_b, n_ab, "
            "ROUND(LN(CAST(n_ab AS DOUBLE) * nd / "
            "(CAST(va.df_cnt AS DOUBLE) * vb.df_cnt)), 4) AS pmi "
            "FROM p JOIN vocab va ON p.tok_a = va.tok "
            "JOIN vocab vb ON p.tok_b = vb.tok CROSS JOIN n"
        ),
        "q_rank_fusion": (
            # same two rankings, RRF with c=60; vec_id ties broken asc
            "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
            "FROM embeddings), "
            "q AS (SELECT v FROM e WHERE vec_id = 0), "
            "a AS (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY "
            "list_cosine_similarity(e.v, (SELECT v FROM q)) DESC, vec_id ASC) "
            "AS r FROM e QUALIFY r <= 20), "
            "b AS (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY "
            "list_inner_product(e.v, (SELECT v FROM q)) DESC, vec_id ASC) "
            "AS r FROM e QUALIFY r <= 20), "
            "u AS (SELECT vec_id, 1.0 / (60 + r) AS w FROM a "
            "UNION ALL SELECT vec_id, 1.0 / (60 + r) FROM b) "
            "SELECT vec_id, CAST(COUNT(*) AS INTEGER) AS n_lists, "
            "ROUND(SUM(w), 6) AS rrf FROM u GROUP BY vec_id"
        ),
        "q_ann_lsh_indexed": (
            "SELECT e.vec_id, "
            "ROUND(list_cosine_similarity(e.embedding, q.embedding), 4) AS sim "
            "FROM embeddings e, "
            "(SELECT embedding FROM embeddings WHERE vec_id = 1) q "
            "ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC, "
            "e.vec_id LIMIT 10"
        ),
        "q_select": "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem",
        "q_filter": (
            "SELECT l_orderkey, l_quantity, l_returnflag FROM lineitem "
            "WHERE l_quantity > 45 AND l_returnflag = 'R'"
        ),
        "q_groupby_sum": (
            "SELECT l_returnflag, l_linestatus, ROUND(SUM(l_quantity), 2) AS sum_qty "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "q_agg_global": "SELECT ROUND(SUM(o_totalprice), 2) AS total FROM orders",
        "q_agg_stats": (
            "SELECT l_returnflag, ROUND(AVG(l_quantity), 4) AS avg_qty, "
            "CAST(COUNT(l_quantity) AS DOUBLE) AS n, "
            "ROUND(VAR_POP(l_discount), 6) AS var_disc, "
            "ROUND(STDDEV_POP(l_discount), 6) AS sd_disc "
            "FROM lineitem GROUP BY l_returnflag"
        ),
        "q_agg_concat": (
            "SELECT n_regionkey, STRING_AGG(n_name, '' ORDER BY n_nationkey) AS names "
            "FROM nation GROUP BY n_regionkey"
        ),
        "q_sort_take": (
            "SELECT o_orderkey, o_totalprice FROM orders "
            "ORDER BY o_totalprice DESC, o_orderkey DESC LIMIT 10"
        ),
        "q_slice": (
            "SELECT n_nationkey, n_name FROM ("
            "SELECT n_nationkey, n_name, ROW_NUMBER() OVER (ORDER BY n_nationkey) AS rn "
            "FROM nation) WHERE rn > 5 AND rn <= 15"
        ),
        "q_melt": (
            "SELECT p_partkey, 'p_size' AS variable, CAST(p_size AS DOUBLE) AS value "
            "FROM part UNION ALL "
            "SELECT p_partkey, 'p_retailprice' AS variable, p_retailprice AS value "
            "FROM part"
        ),
        "q_cast_pivot": (
            "SELECT o_orderpriority, "
            "ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS \"F\", "
            "ROUND(SUM(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS \"O\", "
            "ROUND(SUM(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS \"P\" "
            "FROM orders GROUP BY o_orderpriority"
        ),
        "q_append": (
            "SELECT c_custkey, c_acctbal, c_mktsegment FROM customer WHERE c_acctbal < 0 "
            "UNION ALL "
            "SELECT c_custkey, c_acctbal, c_mktsegment FROM customer "
            "WHERE c_mktsegment = 'BUILDING'"
        ),
        "q_pos_join": (
            "WITH a AS (SELECT n_name, ROW_NUMBER() OVER (ORDER BY n_name) AS rn FROM nation), "
            "b AS (SELECT n_nationkey, ROW_NUMBER() OVER (ORDER BY n_nationkey DESC) AS rn "
            "FROM nation) "
            "SELECT a.n_name, b.n_nationkey FROM a JOIN b USING (rn)"
        ),
        "q_revenue_by_nation": (
            "SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue "
            "FROM lineitem "
            "JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey "
            "GROUP BY n_name"
        ),
        "q_tpch_q1": (
            "SELECT l_returnflag, l_linestatus, "
            "ROUND(SUM(l_quantity), 2) AS sum_qty, "
            "ROUND(SUM(l_extendedprice), 2) AS sum_base_price, "
            "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, "
            "ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge, "
            "ROUND(AVG(l_quantity), 4) AS avg_qty, "
            "ROUND(AVG(l_extendedprice), 4) AS avg_price, "
            "ROUND(AVG(l_discount), 6) AS avg_disc, "
            "COUNT(*) AS count_order "
            "FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01' "
            "GROUP BY l_returnflag, l_linestatus"
        ),
        "q_tpch_q3": (
            "SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, "
            "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "WHERE c_mktsegment = 'BUILDING' "
            "AND o_orderdate < TIMESTAMP '1998-01-01' "
            "AND l_shipdate > TIMESTAMP '1998-01-01' "
            "GROUP BY o_orderkey, o_orderdate "
            "ORDER BY ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) DESC, o_orderkey "
            "LIMIT 10"
        ),
        "q_tpch_q5": (
            "SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue "
            "FROM lineitem "
            "JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey "
            "JOIN nation ON c_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "WHERE r_name = 'ASIA' GROUP BY n_name"
        ),
        "q_tpch_q6": (
            "SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue "
            "FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1997-01-01' "
            "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"
        ),
        "q_tpch_q4": (
            "SELECT o_orderpriority, COUNT(*) AS order_count FROM orders o "
            "WHERE o.o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o.o_orderdate < TIMESTAMP '1997-01-01' "
            "AND EXISTS (SELECT 1 FROM lineitem l "
            "WHERE l.l_orderkey = o.o_orderkey "
            "AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY) "
            "GROUP BY o_orderpriority"
        ),
        "q_tpch_q12": (
            "SELECT l_returnflag, "
            "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
            "THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
            "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
            "THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1997-01-01' "
            "GROUP BY l_returnflag"
        ),
        "q_tpch_q13": (
            "SELECT c_count, COUNT(*) AS custdist FROM ("
            "SELECT c_custkey, COUNT(o_orderkey) AS c_count "
            "FROM customer LEFT JOIN orders ON c_custkey = o_custkey "
            "GROUP BY c_custkey) GROUP BY c_count"
        ),
        "q_tpch_q14": (
            "SELECT ROUND(100.0 * "
            "SUM(CASE WHEN p_type = 'PROMO' "
            "THEN l_extendedprice * (1 - l_discount) ELSE 0 END) / "
            "SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            "WHERE l_shipdate >= TIMESTAMP '1996-03-01' "
            "AND l_shipdate < TIMESTAMP '1996-04-01'"
        ),
        "q_tpch_q18": (
            "SELECT c_custkey, o_orderkey, "
            "ROUND(o_totalprice, 2) AS o_totalprice, "
            "ROUND(sum_qty, 2) AS sum_qty FROM ("
            "SELECT l_orderkey, SUM(l_quantity) AS sum_qty FROM lineitem "
            "GROUP BY l_orderkey HAVING SUM(l_quantity) > 250) big "
            "JOIN orders ON big.l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey"
        ),
        "q_tpch_q22": (
            "SELECT c_nationkey, COUNT(*) AS numcust, "
            "ROUND(SUM(c_acctbal), 2) AS totacctbal FROM customer "
            "WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer "
            "WHERE c_acctbal > 0) "
            "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '1999-01-01') "
            "GROUP BY c_nationkey"
        ),
        "q_tpch_q2": (
            "WITH cost AS (SELECT l_partkey, l_suppkey, "
            "MIN(l_extendedprice / l_quantity) AS cost FROM lineitem "
            "GROUP BY l_partkey, l_suppkey), "
            "eu AS (SELECT s_suppkey, s_name, s_acctbal, n_name FROM supplier "
            "JOIN nation ON s_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'), "
            "ce AS (SELECT cost.*, eu.* FROM cost JOIN eu ON l_suppkey = s_suppkey) "
            "SELECT s_name, n_name, p_partkey, p_name, "
            "s_acctbal, cost AS supply_cost "
            "FROM ce JOIN part ON l_partkey = p_partkey "
            "WHERE p_size = 15 AND p_type = 'STANDARD' "
            "AND cost = (SELECT MIN(cost) FROM ce c2 WHERE c2.l_partkey = ce.l_partkey)"
        ),
        "q_tpch_q7": (
            "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, "
            "CAST(year(l_shipdate) AS INTEGER) AS l_year, "
            "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue "
            "FROM lineitem "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation n1 ON s_nationkey = n1.n_nationkey "
            "JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation n2 ON c_nationkey = n2.n_nationkey "
            "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1998-01-01' "
            "AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') "
            "OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')) "
            "GROUP BY 1, 2, 3"
        ),
        "q_tpch_q8": (
            "SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, "
            "ROUND(SUM(CASE WHEN sn.n_name = 'NATION_3' "
            "THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END) "
            "/ SUM(l_extendedprice * (1 - l_discount)), 6) AS mkt_share "
            "FROM lineitem "
            "JOIN part ON l_partkey = p_partkey "
            "JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation cn ON c_nationkey = cn.n_nationkey "
            "JOIN region ON cn.n_regionkey = r_regionkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation sn ON s_nationkey = sn.n_nationkey "
            "WHERE p_type = 'PROMO' AND r_name = 'ASIA' "
            "GROUP BY 1"
        ),
        "q_tpch_q9": (
            "SELECT n_name AS nation, "
            "CAST(year(o_orderdate) AS INTEGER) AS o_year, "
            "ROUND(SUM(l_extendedprice * (1 - l_discount) "
            "- 0.5 * p_retailprice * l_quantity), 2) AS sum_profit "
            "FROM lineitem "
            "JOIN part ON l_partkey = p_partkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey "
            "JOIN orders ON l_orderkey = o_orderkey "
            "WHERE p_name LIKE '%red%' GROUP BY 1, 2"
        ),
        "q_tpch_q11": (
            "WITH val AS (SELECT l_partkey, SUM(l_extendedprice) AS value "
            "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey "
            "WHERE n_name = 'NATION_5' GROUP BY l_partkey) "
            "SELECT l_partkey, ROUND(value, 2) AS value FROM val "
            "WHERE value > 0.001 * (SELECT SUM(value) FROM val)"
        ),
        "q_tpch_q15": (
            "WITH rev AS (SELECT l_suppkey, "
            "SUM(l_extendedprice * (1 - l_discount)) AS total_revenue "
            "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY l_suppkey) "
            "SELECT s_suppkey, s_name, ROUND(total_revenue, 2) AS total_revenue "
            "FROM rev JOIN supplier ON l_suppkey = s_suppkey "
            "WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)"
        ),
        "q_tpch_q16": (
            "SELECT p_brand, p_type, p_size, "
            "COUNT(DISTINCT l_suppkey) AS supplier_cnt "
            "FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs "
            "JOIN part ON l_partkey = p_partkey "
            "WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO' "
            "AND p_size IN (1, 4, 9, 16, 25, 36, 49) "
            "AND l_suppkey NOT IN "
            "(SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) "
            "GROUP BY p_brand, p_type, p_size"
        ),
        "q_tpch_q17": (
            "SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            "WHERE p_brand = 'Brand#23' AND l_quantity < "
            "(SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2 "
            "JOIN part p2 ON l2.l_partkey = p2.p_partkey "
            "WHERE p2.p_brand = 'Brand#23' AND l2.l_partkey = lineitem.l_partkey)"
        ),
        "q_tpch_q19": (
            "SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            "WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 "
            "AND l_quantity BETWEEN 1 AND 11) "
            "OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 "
            "AND l_quantity BETWEEN 10 AND 20) "
            "OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 "
            "AND l_quantity BETWEEN 20 AND 30)"
        ),
        "q_tpch_q20": (
            "SELECT s_name, ROUND(s_acctbal, 2) AS s_acctbal FROM supplier "
            "JOIN nation ON s_nationkey = n_nationkey "
            "WHERE n_name = 'NATION_7' AND s_suppkey IN ("
            "SELECT l_suppkey FROM lineitem "
            "JOIN part ON l_partkey = p_partkey "
            "WHERE p_name LIKE '%red%' "
            "AND l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1997-01-01' "
            "GROUP BY l_suppkey HAVING SUM(l_quantity) > 100)"
        ),
        "q_tpch_q21": (
            "WITH late AS (SELECT l_orderkey, l_suppkey FROM lineitem "
            "JOIN orders ON l_orderkey = o_orderkey "
            "WHERE o_orderstatus = 'F' "
            "AND l_shipdate > o_orderdate + INTERVAL 60 DAY) "
            "SELECT s_name, COUNT(*) AS numwait FROM late l1 "
            "JOIN supplier ON l1.l_suppkey = s_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey "
            "WHERE n_name = 'NATION_2' "
            "AND EXISTS (SELECT 1 FROM lineitem l2 "
            "WHERE l2.l_orderkey = l1.l_orderkey "
            "AND l2.l_suppkey <> l1.l_suppkey) "
            "AND NOT EXISTS (SELECT 1 FROM late l3 "
            "WHERE l3.l_orderkey = l1.l_orderkey "
            "AND l3.l_suppkey <> l1.l_suppkey) "
            "GROUP BY s_name"
        ),
        "q_window_rank": (
            "SELECT o_orderpriority, rk, o_orderkey, o_totalprice FROM ("
            "SELECT o_orderpriority, o_orderkey, o_totalprice, "
            "ROW_NUMBER() OVER (PARTITION BY o_orderpriority "
            "ORDER BY o_totalprice DESC, o_orderkey) AS rk FROM orders"
            ") WHERE rk <= 3"
        ),
        "q_window_lag": (
            "SELECT o_custkey, o_orderkey, "
            "ROUND(o_totalprice - LAG(o_totalprice) OVER "
            "(PARTITION BY o_custkey ORDER BY o_orderkey), 2) AS delta "
            "FROM orders"
        ),
        "q_events_hourly": (
            "SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS window_start, "
            "event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS value_sum "
            "FROM events GROUP BY 1, event_type"
        ),
        "q_events_sessions": (
            "WITH e AS (SELECT user_id, ts, value, "
            "CASE WHEN lag(ts) OVER w IS NULL "
            "OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s "
            "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)), "
            "s AS (SELECT *, SUM(new_s) OVER "
            "(PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM e) "
            "SELECT user_id, CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start, "
            "COUNT(*) AS n_events, ROUND(SUM(value), 2) AS value_sum "
            "FROM s GROUP BY user_id, sid"
        ),
        "q_dedup_exact": (
            "SELECT md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp, "
            "MIN(doc_id) AS doc_id FROM documents GROUP BY 1"
        ),
        "q_dedup_rate": (
            "SELECT source, COUNT(*) AS n_docs, "
            "COUNT(DISTINCT md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))) "
            "AS n_unique FROM documents GROUP BY source"
        ),
        "q_text_stats": (
            "SELECT doc_id, "
            "CAST(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), "
            "x -> x <> '')) AS INTEGER) AS n_tokens, "
            "CAST(length(text) AS INTEGER) AS len_chars, "
            "ROUND(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) "
            "/ CAST(length(text) AS DOUBLE), 4) AS alpha_ratio "
            "FROM documents"
        ),
        "q_tokens_by_source": (
            "SELECT source, "
            "CAST(SUM(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), "
            "x -> x <> ''))) AS BIGINT) AS total_tokens, "
            "COUNT(*) AS n_docs FROM documents GROUP BY source"
        ),
        "q_langid": (
            "WITH t AS (SELECT text, list_distinct(list_filter("
            "string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS toks "
            "FROM documents), "
            "s AS (SELECT "
            "len(list_intersect(toks, ['the','and','of','is','with','for'])) AS s_en, "
            "len(list_intersect(toks, ['der','die','und','ist','mit','das'])) AS s_de, "
            "len(list_intersect(toks, ['el','los','las','es','con','para'])) AS s_es, "
            "len(list_intersect(toks, ['le','les','et','est','avec','pour'])) AS s_fr, "
            "regexp_matches(text, '[一-鿿]') AS has_cjk FROM t) "
            "SELECT CASE WHEN has_cjk THEN 'zh' "
            "WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'und' "
            "WHEN s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en' "
            "WHEN s_de = greatest(s_en, s_de, s_es, s_fr) THEN 'de' "
            "WHEN s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es' "
            "ELSE 'fr' END AS lang_pred, COUNT(*) AS n FROM s GROUP BY 1"
        ),
        "q_ngram_jaccard": (
            "WITH toks AS (SELECT doc_id AS id, unnest(list_distinct(list_filter("
            "string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> ''))) AS tok "
            "FROM documents WHERE doc_id < 200), "
            "sizes AS (SELECT id, COUNT(*) AS sz FROM toks GROUP BY id), "
            "pairs AS (SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_inter "
            "FROM toks a JOIN toks b ON a.tok = b.tok AND a.id < b.id GROUP BY 1, 2) "
            "SELECT id_a, id_b, "
            "ROUND(n_inter / CAST(sa.sz + sb.sz - n_inter AS DOUBLE), 4) AS jaccard "
            "FROM pairs JOIN sizes sa ON id_a = sa.id JOIN sizes sb ON id_b = sb.id "
            "WHERE n_inter / CAST(sa.sz + sb.sz - n_inter AS DOUBLE) >= 0.8"
        ),
        "q_source_overlap": (
            "WITH sfp AS (SELECT DISTINCT source AS src, "
            "unnest(list_distinct(list_transform("
            "range(1, greatest(len(t) - 7, 0) + 1), "
            "i -> array_to_string(t[i:i+7], ' ')))) AS fp "
            "FROM (SELECT source, list_filter(string_split_regex("
            "lower(text), '[^a-z0-9]+'), x -> x <> '') AS t "
            "FROM documents)), "
            "totals AS (SELECT src, COUNT(*) AS n_fp FROM sfp GROUP BY 1), "
            "shared AS (SELECT a.src AS source_a, b.src AS source_b, "
            "COUNT(*) AS n_shared FROM sfp a "
            "JOIN sfp b ON a.fp = b.fp AND a.src < b.src GROUP BY 1, 2) "
            "SELECT source_a, source_b, n_shared, ta.n_fp AS n_a, "
            "tb.n_fp AS n_b, "
            "ROUND(n_shared / CAST(LEAST(ta.n_fp, tb.n_fp) AS DOUBLE), 6) "
            "AS overlap FROM shared "
            "JOIN totals ta ON source_a = ta.src "
            "JOIN totals tb ON source_b = tb.src"
        ),
        "q_containment": (
            "WITH toks AS (SELECT doc_id AS id, "
            "unnest(list_distinct(list_filter("
            "string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> ''))) "
            "AS tok FROM documents WHERE doc_id < 200), "
            "sizes AS (SELECT id, COUNT(*) AS sz FROM toks GROUP BY id), "
            "pairs AS (SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n "
            "FROM toks a JOIN toks b ON a.tok = b.tok AND a.id < b.id "
            "GROUP BY 1, 2), "
            "j AS (SELECT id_a, id_b, n, sa.sz AS sz_a, sb.sz AS sz_b "
            "FROM pairs JOIN sizes sa ON id_a = sa.id "
            "JOIN sizes sb ON id_b = sb.id) "
            "SELECT id_a AS contained_id, id_b AS container_id, "
            "ROUND(n / CAST(sz_a AS DOUBLE), 4) AS containment FROM j "
            "WHERE n / CAST(sz_a AS DOUBLE) >= 0.9 "
            "UNION ALL "
            "SELECT id_b, id_a, ROUND(n / CAST(sz_b AS DOUBLE), 4) FROM j "
            "WHERE n / CAST(sz_b AS DOUBLE) >= 0.9"
        ),
        "q_knn_cosine": (
            "SELECT e.vec_id, "
            "ROUND(list_cosine_similarity(e.embedding, q.embedding), 4) AS sim "
            "FROM embeddings e, "
            "(SELECT embedding FROM embeddings WHERE vec_id = 0) q "
            "ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC, e.vec_id "
            "LIMIT 10"
        ),
        # exhaustive-probe LSH ≡ exact top-k (recall 1 by construction:
        # every bucket within n_planes bit flips is probed = all buckets)
        "q_ann_lsh": (
            "SELECT e.vec_id, "
            "ROUND(list_cosine_similarity(e.embedding, q.embedding), 4) AS sim "
            "FROM embeddings e, "
            "(SELECT embedding FROM embeddings WHERE vec_id = 1) q "
            "ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC, e.vec_id "
            "LIMIT 10"
        ),
        # exhaustive-probe IVF (nprobe = nlist) ≡ exact top-k, independent
        # of k-means convergence — every cell is scanned
        "q_ann_ivf": (
            "SELECT e.vec_id, "
            "ROUND(list_cosine_similarity(e.embedding, q.embedding), 4) AS sim "
            "FROM embeddings e, "
            "(SELECT embedding FROM embeddings WHERE vec_id = 2) q "
            "ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC, e.vec_id "
            "LIMIT 10"
        ),
        # exact word-3-gram shingle Jaccard ≥ 0.8 — equals the LSH+verify
        # pipeline's output (banding only prunes; verify is exact Jaccard
        # on the same shingle definition)
        "q_minhash_pairs": (
            "WITH toks AS (SELECT doc_id AS id, list_filter("
            "string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t "
            "FROM documents), "
            "sh AS (SELECT id, unnest(list_distinct(list_transform("
            "range(1, greatest(len(t) - 2, 1) + 1), "
            "i -> array_to_string(t[i:i+2], ' ')))) AS s "
            "FROM toks WHERE len(t) > 0), "
            "sizes AS (SELECT id, COUNT(*) AS sz FROM sh GROUP BY id), "
            "pairs AS (SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_inter "
            "FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id GROUP BY 1, 2) "
            "SELECT id_a, id_b, "
            "ROUND(n_inter / CAST(sa.sz + sb.sz - n_inter AS DOUBLE), 4) AS jaccard "
            "FROM pairs JOIN sizes sa ON id_a = sa.id JOIN sizes sb ON id_b = sb.id "
            "WHERE n_inter / CAST(sa.sz + sb.sz - n_inter AS DOUBLE) >= 0.8"
        ),
        # transitive closure (recursive CTE) over the exact-Jaccard pair
        # set = distributed min-label propagation's fixpoint
        "q_neardup_components": (
            _NEARDUP_PAIR_CTE
            + "SELECT s AS id, least(s, min(d)) AS comp FROM reach GROUP BY s"
        ),
        "q_dedup_representatives": (
            _NEARDUP_PAIR_CTE
            + ", victims AS (SELECT s FROM reach GROUP BY s HAVING min(d) < s) "
            "SELECT doc_id, source, n_chars FROM documents "
            "WHERE doc_id NOT IN (SELECT s FROM victims)"
        ),
        "q_dedup_longest": (
            _NEARDUP_PAIR_CTE
            + ", comp AS (SELECT s AS id, LEAST(s, MIN(d)) AS comp "
            "FROM reach GROUP BY s), "
            "scored AS (SELECT c.comp, c.id, d.n_chars FROM comp c "
            "JOIN documents d ON d.doc_id = c.id), "
            "w AS (SELECT comp, id, ROW_NUMBER() OVER (PARTITION BY comp "
            "ORDER BY n_chars DESC, id ASC) AS rn FROM scored), "
            "victims AS (SELECT id FROM w WHERE rn > 1) "
            "SELECT doc_id, source, n_chars FROM documents "
            "WHERE doc_id NOT IN (SELECT id FROM victims)"
        ),
        # full simhash replica: md5-derived 60-bit token hashes, 64-bit
        # majority vote, all-pairs Hamming ≤ 3 (the Spark side's pigeonhole
        # blocking is exact for max_hamming < blocks, so candidate+verify
        # equals this all-pairs filter)
        "q_simhash_pairs": (
            "WITH toks AS (SELECT doc_id AS id, list_transform(list_filter("
            "string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> ''), "
            "t -> CAST('0x' || substr(md5(t), 1, 15) AS BIGINT)) AS hs "
            "FROM documents), "
            "sims AS (SELECT id, CAST(list_sum(list_transform(range(64), "
            "b -> CASE WHEN 2 * len(list_filter(hs, h -> (h >> b) & 1 = 1)) >= len(hs) "
            "THEN (1::HUGEINT << b) ELSE 0::HUGEINT END)) AS BIGINT) AS sh "
            "FROM toks WHERE len(hs) > 0) "
            "SELECT a.id AS id_a, b.id AS id_b, "
            "CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming "
            "FROM sims a JOIN sims b ON a.id < b.id "
            "WHERE bit_count(xor(a.sh, b.sh)) <= 3"
        ),
        "q_multimodal_features": (
            "SELECT doc_id, "
            "CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' "
            "ELSE 'video' END AS media_type, "
            "octet_length(encode(text)) AS n_bytes, "
            "CAST(CASE WHEN doc_id % 3 = 0 THEN octet_length(encode(text)) % 640 + 1 "
            "WHEN doc_id % 3 = 2 THEN octet_length(encode(text)) % 1280 + 1 "
            "END AS INTEGER) AS width, "
            "CAST(CASE WHEN doc_id % 3 = 0 THEN octet_length(encode(text)) % 480 + 1 "
            "WHEN doc_id % 3 = 2 THEN octet_length(encode(text)) % 720 + 1 "
            "END AS INTEGER) AS height, "
            "CAST(CASE WHEN doc_id % 3 = 0 THEN 1 "
            "WHEN doc_id % 3 = 2 THEN octet_length(encode(text)) % 300 + 1 "
            "ELSE octet_length(encode(text)) % 44100 + 1 END AS INTEGER) AS n_frames, "
            "md5(text) AS checksum "
            "FROM documents"
        ),
        "q_corpus_filter": (
            "WITH s AS (SELECT doc_id, text, "
            "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks "
            "FROM documents), "
            "f AS (SELECT doc_id, text, len(toks) AS n_tok, "
            "ROUND(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) "
            "/ CAST(length(text) AS DOUBLE), 4) AS alpha_ratio, "
            "ROUND(len(list_filter(toks, x -> list_contains(['the','a','an','and','or',"
            "'of','to','in','is','it','that','for','on','with','as','at','by','from'], x))) "
            "/ CAST(len(toks) AS DOUBLE), 4) AS stop_ratio, "
            "len(list_intersect(list_distinct(toks), ['the','and','of','is','with','for'])) AS s_en, "
            "len(list_intersect(list_distinct(toks), ['der','die','und','ist','mit','das'])) AS s_de, "
            "len(list_intersect(list_distinct(toks), ['el','los','las','es','con','para'])) AS s_es, "
            "len(list_intersect(list_distinct(toks), ['le','les','et','est','avec','pour'])) AS s_fr, "
            "regexp_matches(text, '[一-鿿]') AS has_cjk, "
            "md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp "
            "FROM s), "
            "q AS (SELECT doc_id, fp, "
            "CAST(0.4 AS DOUBLE) * COALESCE(alpha_ratio, 0) "
            "+ CAST(0.3 AS DOUBLE) * LEAST(COALESCE(stop_ratio, 0) * CAST(5 AS DOUBLE), "
            "CAST(1 AS DOUBLE)) "
            "+ CAST(0.3 AS DOUBLE) * LEAST(n_tok / CAST(20 AS DOUBLE), "
            "CAST(1 AS DOUBLE)) AS quality "
            "FROM f WHERE NOT has_cjk AND greatest(s_en, s_de, s_es, s_fr) > 0 "
            "AND s_en = greatest(s_en, s_de, s_es, s_fr)), "
            "g AS (SELECT * FROM q WHERE quality >= 0.5), "
            "k AS (SELECT fp, MIN(doc_id) AS doc_id FROM g GROUP BY fp) "
            "SELECT g.doc_id, g.quality FROM g JOIN k "
            "ON g.fp = k.fp AND g.doc_id = k.doc_id"
        ),
        "q_curation_chunks": (
            "WITH s AS (SELECT doc_id, text, "
            "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks "
            "FROM documents), "
            "f AS (SELECT doc_id, text, len(toks) AS n_tok, "
            "ROUND(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) "
            "/ CAST(length(text) AS DOUBLE), 4) AS alpha_ratio, "
            "ROUND(len(list_filter(toks, x -> list_contains(['the','a','an','and','or',"
            "'of','to','in','is','it','that','for','on','with','as','at','by','from'], x))) "
            "/ CAST(len(toks) AS DOUBLE), 4) AS stop_ratio, "
            "len(list_intersect(list_distinct(toks), ['the','and','of','is','with','for'])) AS s_en, "
            "len(list_intersect(list_distinct(toks), ['der','die','und','ist','mit','das'])) AS s_de, "
            "len(list_intersect(list_distinct(toks), ['el','los','las','es','con','para'])) AS s_es, "
            "len(list_intersect(list_distinct(toks), ['le','les','et','est','avec','pour'])) AS s_fr, "
            "regexp_matches(text, '[一-鿿]') AS has_cjk, "
            "md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp "
            "FROM s), "
            "q AS (SELECT doc_id, fp, "
            "CAST(0.4 AS DOUBLE) * COALESCE(alpha_ratio, 0) "
            "+ CAST(0.3 AS DOUBLE) * LEAST(COALESCE(stop_ratio, 0) * CAST(5 AS DOUBLE), "
            "CAST(1 AS DOUBLE)) "
            "+ CAST(0.3 AS DOUBLE) * LEAST(n_tok / CAST(20 AS DOUBLE), "
            "CAST(1 AS DOUBLE)) AS quality "
            "FROM f WHERE NOT has_cjk AND greatest(s_en, s_de, s_es, s_fr) > 0 "
            "AND s_en = greatest(s_en, s_de, s_es, s_fr)), "
            "g AS (SELECT * FROM q WHERE quality >= 0.5), "
            "k AS (SELECT fp, MIN(doc_id) AS doc_id FROM g GROUP BY fp), "
            "surv AS (SELECT g.doc_id FROM g JOIN k "
            "ON g.fp = k.fp AND g.doc_id = k.doc_id) "
            "SELECT d.source, "
            "CAST(SUM(CEIL(f.n_tok / 64.0)) AS BIGINT) AS n_chunks, "
            "CAST(SUM(f.n_tok) AS BIGINT) AS total_tokens "
            "FROM surv JOIN f ON surv.doc_id = f.doc_id "
            "JOIN documents d ON surv.doc_id = d.doc_id GROUP BY d.source"
        ),
        "q_explode_tokens": (
            "SELECT tok, COUNT(*) AS n FROM ("
            "SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), "
            "x -> x <> '')) AS tok FROM documents) "
            "GROUP BY tok ORDER BY n DESC, tok LIMIT 20"
        ),
        "q_corr": (
            "SELECT l_returnflag, ROUND(corr(l_quantity, l_extendedprice), 6) "
            "AS corr_qty_price FROM lineitem GROUP BY l_returnflag"
        ),
        "q_quantiles": (
            "SELECT l_returnflag, "
            "quantile_cont(l_extendedprice, 0.25) AS p25, "
            "quantile_cont(l_extendedprice, 0.5) AS p50, "
            "quantile_cont(l_extendedprice, 0.75) AS p75 "
            "FROM lineitem GROUP BY l_returnflag"
        ),
        "q_tpch_q10": (
            "SELECT c_custkey, c_name, n_name, "
            "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey "
            "WHERE l_returnflag = 'R' "
            "GROUP BY c_custkey, c_name, n_name "
            "ORDER BY revenue DESC, c_custkey LIMIT 20"
        ),
        "q_argmax": (
            "WITH r AS (SELECT o_orderstatus, o_orderkey, o_totalprice, "
            "ROW_NUMBER() OVER (PARTITION BY o_orderstatus "
            "ORDER BY o_totalprice DESC, o_orderkey) AS rmax, "
            "ROW_NUMBER() OVER (PARTITION BY o_orderstatus "
            "ORDER BY o_totalprice ASC, o_orderkey) AS rmin FROM orders) "
            "SELECT o_orderstatus, "
            "MAX(CASE WHEN rmax = 1 THEN o_orderkey END) AS max_order, "
            "MAX(CASE WHEN rmin = 1 THEN o_orderkey END) AS min_order, "
            "ROUND(MAX(o_totalprice), 2) AS max_price "
            "FROM r GROUP BY o_orderstatus"
        ),
        "q_transform_zscore": (
            "SELECT o_orderkey, o_orderstatus, "
            "ROUND(AVG(o_totalprice) OVER w, 2) AS grp_mean, "
            "ROUND((o_totalprice - AVG(o_totalprice) OVER w) "
            "/ STDDEV_POP(o_totalprice) OVER w, 4) AS z "
            "FROM orders WINDOW w AS (PARTITION BY o_orderstatus)"
        ),
        "q_emb_neardup_brute": (
            "SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
            "ROUND(list_cosine_similarity(a.embedding, b.embedding), 4) AS sim "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE a.vec_id < 300 AND b.vec_id < 300 "
            "AND ROUND(list_cosine_similarity(a.embedding, b.embedding), 4) >= 0.35"
        ),
        "q_asof_join": (
            "WITH p AS (SELECT event_id, user_id, ts FROM events "
            "WHERE event_type = 'purchase'), "
            "c AS (SELECT user_id, ts, event_id AS click_id FROM events "
            "WHERE event_type = 'click') "
            "SELECT p.event_id, p.user_id, "
            "CAST(floor(epoch(p.ts)) AS BIGINT) AS ts_s, c.click_id "
            "FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts"
        ),
        "q_range_join": (
            "SELECT e.event_id AS err_id, COUNT(*) AS n_before FROM events e "
            "JOIN events x ON e.user_id = x.user_id "
            "AND x.ts >= e.ts - INTERVAL 10 MINUTE AND x.ts < e.ts "
            "WHERE e.event_type = 'error' GROUP BY e.event_id"
        ),
        "q_rollup": (
            "SELECT l_returnflag, l_linestatus, ROUND(SUM(l_quantity), 2) AS sum_qty "
            "FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"
        ),
        "q_json_extract": (
            "SELECT event_type, "
            "ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k, "
            "COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n "
            "FROM events GROUP BY event_type"
        ),
        "q_median": (
            "SELECT o_orderstatus, ROUND(MEDIAN(o_totalprice), 2) AS med_price "
            "FROM orders GROUP BY o_orderstatus"
        ),
        "q_set_ops": (
            "SELECT c_custkey FROM customer WHERE c_acctbal > 0 "
            "INTERSECT "
            "SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 400000"
        ),
        "q_date_parts": (
            "SELECT CAST(year(o_orderdate) AS INTEGER) AS y, "
            "CAST(month(o_orderdate) AS INTEGER) AS m, COUNT(*) AS n_orders, "
            "ROUND(SUM(o_totalprice), 2) AS volume FROM orders GROUP BY 1, 2"
        ),
        # line features are pure list expressions; top-bigram occupancy is
        # the same explode→count→max/sum shape as the Spark plan
        "q_repetition_stats": (
            "WITH lines AS (SELECT doc_id, list_filter(list_transform("
            "string_split(text, chr(10)), l -> trim(l)), l -> l <> '') AS ls "
            "FROM documents), "
            "base AS (SELECT doc_id, CAST(len(ls) AS BIGINT) AS n_lines, "
            "CASE WHEN len(ls) > 0 THEN ROUND(1.0 - "
            "len(list_distinct(ls)) / CAST(len(ls) AS DOUBLE), 4) END "
            "AS dup_line_frac FROM lines), "
            "toks AS (SELECT doc_id AS id, list_filter("
            "string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t "
            "FROM documents), "
            "bg AS (SELECT id, unnest(list_transform("
            "range(1, greatest(len(t) - 1, 1) + 1), "
            "i -> array_to_string(t[i:i+1], ' '))) AS g "
            "FROM toks WHERE len(t) > 0), "
            "pg AS (SELECT id, g, COUNT(*) AS c FROM bg GROUP BY id, g), "
            "pd AS (SELECT id, ROUND(MAX(c) / CAST(SUM(c) AS DOUBLE), 4) "
            "AS top_bigram_frac FROM pg GROUP BY id) "
            "SELECT b.doc_id, b.n_lines, b.dup_line_frac, pd.top_bigram_frac "
            "FROM base b LEFT JOIN pd ON b.doc_id = pd.id"
        ),
        # md5-hex bucket is engine-portable: Spark conv(substr(md5,1,15),16,10)
        # == DuckDB CAST('0x'||substr(md5,1,15) AS BIGINT)
        "q_hash_split": (
            "SELECT doc_id, "
            "CASE WHEN b < 9000 THEN 'train' WHEN b < 9500 THEN 'val' "
            "ELSE 'test' END AS split, b < 2500 AS in_sample "
            "FROM (SELECT doc_id, "
            "CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) "
            "% 10000 AS b FROM documents)"
        ),
        "q_knn_join": (
            "SELECT qid, vec_id, sim, rank FROM ("
            "SELECT q.vec_id AS qid, e.vec_id AS vec_id, "
            "ROUND(list_cosine_similarity(e.embedding, q.embedding), 4) AS sim, "
            "ROW_NUMBER() OVER (PARTITION BY q.vec_id "
            "ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC, "
            "e.vec_id) AS rank "
            "FROM embeddings e, "
            "(SELECT vec_id, embedding FROM embeddings WHERE vec_id < 4) q"
            ") WHERE rank <= 10"
        ),
        # distinct word-8-grams per doc; probe set = grams of doc_id < 50
        "q_contamination": (
            "WITH toks AS (SELECT doc_id AS id, list_filter("
            "string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t "
            "FROM documents), "
            "sh AS (SELECT id, unnest(list_distinct(list_transform("
            "range(1, greatest(len(t) - 7, 1) + 1), "
            "i -> array_to_string(t[i:i+7], ' ')))) AS g "
            "FROM toks WHERE len(t) > 0), "
            "probe AS (SELECT DISTINCT g FROM sh WHERE id < 50) "
            "SELECT id AS doc_id, COUNT(*) AS n_shared_ngrams "
            "FROM sh JOIN probe USING (g) GROUP BY id"
        ),
        # salted two-stage agg must equal the plain one-stage aggregation
        "q_stratified_sample": (
            "SELECT doc_id, source FROM ("
            "SELECT doc_id, source, ROW_NUMBER() OVER ("
            "PARTITION BY source "
            "ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk "
            "FROM documents) WHERE rk <= 10"
        ),
        "q_quantize_embeddings": (
            "WITH m AS (SELECT vec_id, embedding, "
            "GREATEST(ABS(list_aggregate(embedding, 'max')), "
            "ABS(list_aggregate(embedding, 'min'))) AS mx FROM embeddings) "
            "SELECT vec_id, array_to_string(CASE WHEN mx = 0 THEN "
            "list_transform(embedding, x -> 0) ELSE "
            "list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) "
            "/ (CAST(mx AS DOUBLE) / 127.0) + 0.5) AS INT)) END, ',') AS codes, "
            "ROUND(CAST(mx AS DOUBLE) / 127.0, 6) AS scale FROM m"
        ),
        "q_token_estimate": (
            "SELECT doc_id, "
            "CAST(len(list_filter(string_split_regex(lower(text), "
            "'[^a-z0-9]+'), x -> x <> '')) AS INTEGER) AS n_ws_tokens, "
            "CAST(len(regexp_extract_all(lower(text), "
            "'[a-z]+|[0-9]+|[^a-z0-9\\s]+')) AS INTEGER) AS n_bpe_tokens "
            "FROM documents"
        ),
        "q_click_attribution": (
            "SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id, "
            "CAST(floor(epoch(v.ts)) AS BIGINT) AS view_ts, "
            "CAST(floor(epoch(c.ts)) AS BIGINT) AS click_ts "
            "FROM events v JOIN events c ON v.user_id = c.user_id "
            "AND v.event_type = 'view' AND c.event_type = 'click' "
            "AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 24 HOUR"
        ),
        "q_chunk_tokens": (
            "WITH t AS (SELECT doc_id, "
            "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), "
            "x -> x <> '') AS toks FROM documents), "
            "c AS (SELECT doc_id, len(toks) AS n, toks, "
            "CAST(ceil(len(toks) / 32.0) AS INT) AS nch FROM t) "
            "SELECT doc_id AS id, i AS chunk_id, "
            "array_to_string(list_slice(toks, i * 32 + 1, i * 32 + 32), ' ') "
            "AS chunk_text, LEAST(32, n - i * 32) AS chunk_tokens "
            "FROM c CROSS JOIN UNNEST(range(nch)) AS u(i)"
        ),
        "q_clean_lines": (
            "WITH t AS (SELECT doc_id, list_filter(list_transform("
            "string_split(replace(text, ' table ', chr(10)), chr(10)), "
            "l -> trim(l)), l -> l <> '') AS lines FROM documents), "
            "k AS (SELECT doc_id, lines, list_filter(lines, "
            "l -> len(list_filter(string_split(l, ' '), w -> w <> '')) >= 5 "
            "AND NOT contains(lower(l), 'slow')) AS kept FROM t) "
            "SELECT doc_id AS id, "
            "COALESCE(array_to_string(kept, chr(10)), '') AS cleaned_text, "
            "len(kept) AS n_lines_kept, len(lines) AS n_lines_total FROM k"
        ),
        "q_chat_loss_spans": (
            # header lens: '<|im_start|>system\\n' = 19, user = 17,
            # assistant = 22; footer '<|im_end|>\\n' = 11
            "WITH c AS (SELECT doc_id, 'You are a concise assistant.' AS s, "
            "text AS u, CASE WHEN doc_id % 4 <> 3 THEN "
            "'Summary ' || doc_id || ': ' || substr(text, 1, 80) END AS a "
            "FROM documents), "
            "o AS (SELECT doc_id, a, (19 + length(s) + 11) + "
            "(CASE WHEN u IS NULL THEN 0 ELSE 17 + length(u) + 11 END) "
            "AS pre FROM c WHERE a IS NOT NULL) "
            "SELECT doc_id, 2 AS turn_idx, 'assistant' AS role, "
            "CAST(pre + 22 + 1 AS INT) AS start, "
            "CAST(pre + 22 + length(a) AS INT) AS \"end\" FROM o"
        ),
        "q_chat_template": (
            "WITH c AS (SELECT doc_id, 'You are a concise assistant.' AS s, "
            "text AS u, CASE WHEN doc_id % 4 <> 3 THEN "
            "'Summary ' || doc_id || ': ' || substr(text, 1, 80) END AS a "
            "FROM documents), "
            "r AS (SELECT doc_id, "
            "COALESCE('<|im_start|>system' || chr(10) || s || '<|im_end|>' || chr(10), '') || "
            "COALESCE('<|im_start|>user' || chr(10) || u || '<|im_end|>' || chr(10), '') || "
            "COALESCE('<|im_start|>assistant' || chr(10) || a || '<|im_end|>' || chr(10), '') AS rendered, "
            "(CASE WHEN s IS NULL THEN 0 ELSE 1 END + "
            "CASE WHEN u IS NULL THEN 0 ELSE 1 END + "
            "CASE WHEN a IS NULL THEN 0 ELSE 1 END) AS n_turns FROM c) "
            "SELECT doc_id, rendered, CAST(n_turns AS INT) AS n_turns, "
            "CAST(length(rendered) AS INT) AS n_chars FROM r"
        ),
        "q_bitext_mine": (
            "WITH nn AS (SELECT * FROM ("
            "SELECT q.vec_id AS qid, e.vec_id AS vid, "
            "ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), "
            "CAST(q.embedding AS DOUBLE[])), 6) AS sim, "
            "ROW_NUMBER() OVER (PARTITION BY q.vec_id "
            "ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), "
            "CAST(q.embedding AS DOUBLE[])) DESC, "
            "e.vec_id) AS rank "
            "FROM (SELECT vec_id, embedding FROM embeddings "
            "WHERE vec_id % 2 = 0) e, "
            "(SELECT vec_id, embedding FROM embeddings "
            "WHERE vec_id % 2 = 1 AND vec_id < 16) q) WHERE rank <= 8), "
            "nq AS (SELECT qid, vid, sim, rank, "
            "CAST(ROUND(sim * 1000000) AS BIGINT) AS sq FROM nn), "
            "a AS (SELECT qid, "
            "MAX(CASE WHEN rank = 1 THEN vid END) AS best_id, "
            "CAST(MAX(CASE WHEN rank = 1 THEN sq END) AS BIGINT) AS bq, "
            "CAST(SUM(sq) AS BIGINT) AS sumq, "
            "CAST(COUNT(*) AS BIGINT) AS n_topk FROM nq GROUP BY qid) "
            "SELECT qid, best_id, bq AS best_sim_micros, n_topk, "
            "(bq * n_topk) / sumq AS margin, "
            "(bq * n_topk) / sumq > 1.02 AS accepted FROM a"
        ),
        "q_interleaved_media": (
            "WITH base AS (SELECT doc_id, length(text) AS n, "
            "CAST(doc_id % 3 + 1 AS INT) AS n_slots FROM documents "
            "WHERE text IS NOT NULL AND length(text) >= 40), "
            "s AS (SELECT doc_id, n, n_slots, "
            "unnest(range(0, n_slots)) AS slot FROM base) "
            "SELECT doc_id, CAST(slot AS INT) AS slot, "
            "CAST(CAST(CONCAT('0x', substr(md5(doc_id || '#img' || slot), "
            "1, 13)) AS BIGINT) % (n + 1) AS INT) AS char_pos, "
            "CAST((doc_id * 3 + slot) % 500 AS BIGINT) AS media_id, "
            "n_slots FROM s"
        ),
        # greedy unique assignment unrolled as 3 windowed-argmax rounds
        # (n_slots <= 3): round r picks the per-doc best remaining pair
        # by (sim_micros desc, slot, media) after excluding every slot
        # and media already taken — identical to the in-row greedy fold
        "q_interleaved_assign": (
            "WITH base AS (SELECT doc_id, "
            "CAST(doc_id % 3 + 1 AS INT) AS n_slots FROM documents "
            "WHERE text IS NOT NULL AND length(text) >= 40), "
            "s0 AS (SELECT doc_id, CAST(unnest(range(0, n_slots)) AS INT) "
            "AS slot FROM base), "
            "s AS (SELECT s0.doc_id, s0.slot, "
            "CAST(e.embedding AS DOUBLE[]) AS sv FROM s0 "
            "JOIN embeddings e ON e.vec_id = "
            "CAST(CONCAT('0x', substr(md5(s0.doc_id || '#sv' || s0.slot), "
            "1, 13)) AS BIGINT) % 500), "
            "m0 AS (SELECT DISTINCT b.doc_id, "
            "(b.doc_id * 7 + j.g * 13) % 500 AS media_id "
            "FROM base b, generate_series(0, 5) j(g)), "
            "m AS (SELECT m0.doc_id, m0.media_id, "
            "CAST(e.embedding AS DOUBLE[]) AS mv "
            "FROM m0 JOIN embeddings e ON e.vec_id = m0.media_id), "
            "p AS (SELECT s.doc_id, s.slot, m.media_id, "
            "CAST(ROUND(list_cosine_similarity(sv, mv) * 1000000) "
            "AS BIGINT) AS sq FROM s JOIN m ON s.doc_id = m.doc_id), "
            "r1 AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id "
            "ORDER BY sq DESC, slot, media_id) AS rn FROM p), "
            "a1 AS (SELECT doc_id, slot, media_id, sq FROM r1 "
            "WHERE rn = 1), "
            "p2 AS (SELECT p.doc_id, p.slot, p.media_id, p.sq FROM p "
            "JOIN a1 USING (doc_id) "
            "WHERE p.slot <> a1.slot AND p.media_id <> a1.media_id), "
            "r2 AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id "
            "ORDER BY sq DESC, slot, media_id) AS rn FROM p2), "
            "a2 AS (SELECT doc_id, slot, media_id, sq FROM r2 "
            "WHERE rn = 1), "
            "p3 AS (SELECT p2.doc_id, p2.slot, p2.media_id, p2.sq FROM p2 "
            "JOIN a2 USING (doc_id) "
            "WHERE p2.slot <> a2.slot AND p2.media_id <> a2.media_id), "
            "r3 AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id "
            "ORDER BY sq DESC, slot, media_id) AS rn FROM p3), "
            "a3 AS (SELECT doc_id, slot, media_id, sq FROM r3 "
            "WHERE rn = 1) "
            "SELECT doc_id, slot, media_id, sq AS sim_micros, "
            "CAST(pick AS INT) AS pick_order FROM ("
            "SELECT *, 1 AS pick FROM a1 UNION ALL "
            "SELECT *, 2 AS pick FROM a2 UNION ALL "
            "SELECT *, 3 AS pick FROM a3)"
        ),
        "q_span_corruption": (
            "WITH c0 AS (SELECT doc_id, text AS t, length(text) AS n, "
            "length(text) // 2 AS half, "
            "CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR) || '#sc1l'), 1, 13)) AS BIGINT) AS ha, "
            "CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR) || '#sc2l'), 1, 13)) AS BIGINT) AS hb, "
            "CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR) || '#sc1s'), 1, 13)) AS BIGINT) AS hc, "
            "CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR) || '#sc2s'), 1, 13)) AS BIGINT) AS hd "
            "FROM documents), "
            "c1 AS (SELECT *, (ha % 8) + 3 AS len1, (hb % 8) + 3 AS len2 "
            "FROM c0), "
            "c2 AS (SELECT *, hc % (half - len1 + 1) AS s1, "
            "half + (hd % (n - half - len2 + 1)) AS s2 FROM c1), "
            "c3 AS (SELECT doc_id, t, n, len1, len2, s1, s2, "
            "(t IS NOT NULL AND n >= 20) AS ok FROM c2) "
            "SELECT doc_id, ok AS corrupted, "
            "CASE WHEN ok THEN "
            "substr(t, 1, CAST(s1 AS INT)) || '<extra_id_0>' || "
            "substr(t, CAST(s1 + len1 + 1 AS INT), CAST(s2 - s1 - len1 AS INT)) || "
            "'<extra_id_1>' || "
            "substr(t, CAST(s2 + len2 + 1 AS INT), CAST(n - s2 - len2 AS INT)) "
            "ELSE t END AS inputs, "
            "CASE WHEN ok THEN "
            "'<extra_id_0>' || substr(t, CAST(s1 + 1 AS INT), CAST(len1 AS INT)) || "
            "'<extra_id_1>' || substr(t, CAST(s2 + 1 AS INT), CAST(len2 AS INT)) || "
            "'<extra_id_2>' END AS targets FROM c3"
        ),
        "q_epoch_shuffle": (
            "WITH e AS (SELECT doc_id, unnest(range(0, 3)) AS epoch "
            "FROM documents) "
            "SELECT doc_id, CAST(epoch AS INT) AS epoch, "
            "CAST(CONCAT('0x', substr(md5(doc_id || '#ep' || epoch), "
            "1, 13)) AS BIGINT) AS shuffle_key FROM e"
        ),
        "q_retention_curve": (
            "WITH s AS (SELECT "
            "CAST(CONCAT('0x', substr(md5(doc_id || '#q'), 1, 13)) "
            "AS BIGINT) % 10000 AS sc, "
            "len(list_filter(string_split_regex(lower(text), "
            "'[^a-z0-9]+'), e -> e <> '')) AS n "
            "FROM documents WHERE text IS NOT NULL), "
            "g AS (SELECT sc, CAST(COUNT(*) AS BIGINT) AS nd, "
            "CAST(SUM(n) AS BIGINT) AS nt FROM s GROUP BY sc), "
            "c AS (SELECT sc, nd, nt, "
            "CAST(SUM(nd) OVER (ORDER BY sc DESC ROWS BETWEEN UNBOUNDED "
            "PRECEDING AND CURRENT ROW) - nd AS BIGINT) AS bf FROM g), "
            "tot AS (SELECT CAST(SUM(nd) AS BIGINT) AS N FROM g), "
            "b AS (SELECT CAST(FLOOR(bf * 10 / N) AS BIGINT) AS bin, "
            "nd, nt FROM c, tot), "
            "a AS (SELECT bin, CAST(SUM(nd) AS BIGINT) AS n_docs, "
            "CAST(SUM(nt) AS BIGINT) AS total_tokens FROM b GROUP BY bin) "
            "SELECT bin, n_docs, total_tokens, "
            "CAST(SUM(total_tokens) OVER (ORDER BY bin ROWS BETWEEN "
            "UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
            "AS cum_tokens FROM a"
        ),
        "q_length_buckets": (
            "WITH t AS (SELECT len(list_filter(string_split_regex("
            "lower(text), '[^a-z0-9]+'), e -> e <> '')) AS n "
            "FROM documents WHERE text IS NOT NULL), "
            "b AS (SELECT CAST(CASE WHEN n <= 1 THEN 0 "
            "ELSE length(bin(n - 1)) END AS INT) "
            "AS bucket, n FROM t WHERE n >= 1), "
            "a AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(n) AS BIGINT) AS total_tokens FROM b GROUP BY bucket), "
            "m AS (SELECT *, CAST(POWER(2, bucket) AS BIGINT) AS max_len, "
            "GREATEST(CAST(FLOOR(4096.0 / POWER(2, bucket)) AS BIGINT), 1) "
            "AS batch_size FROM a) "
            "SELECT bucket, max_len, n_docs, total_tokens, batch_size, "
            "CAST(CEIL(CAST(n_docs AS DOUBLE) / batch_size) AS BIGINT) "
            "AS n_batches, "
            "n_docs * max_len - total_tokens AS pad_waste_tokens FROM m"
        ),
        "q_packing_report": (
            "WITH t AS (SELECT source, doc_id % 4 AS shard, "
            "len(list_filter(string_split_regex(lower(text), "
            "'[^a-z0-9]+'), e -> e <> '')) AS n "
            "FROM documents WHERE text IS NOT NULL), "
            "a AS (SELECT source, shard, "
            "CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(n) AS BIGINT) AS total_tokens, "
            "CAST(SUM(CASE WHEN n % 128 = 0 THEN 0 "
            "ELSE 128 - n % 128 END) AS BIGINT) AS padded_waste_tokens, "
            "CAST(SUM(CASE WHEN n > 128 THEN n - 128 ELSE 0 END) AS BIGINT) "
            "AS truncated_tokens FROM t GROUP BY source, shard) "
            "SELECT source, shard, n_docs, total_tokens, "
            "CAST(CEIL(total_tokens / 128.0) AS BIGINT) AS n_sequences, "
            "(total_tokens - (CAST(CEIL(total_tokens / 128.0) AS BIGINT) - 1) "
            "* 128) / 128.0 AS tail_fill_ratio, "
            "padded_waste_tokens, truncated_tokens FROM a"
        ),
        # word counts: header = 3 words (im, start, role), footer = 2
        # (im, end); prior is CAST to BIGINT — window SUM over BIGINT
        # is HUGEINT in DuckDB (the q_code_pipeline class, SCALE.md r11)
        "q_packed_spans": (
            "WITH c AS (SELECT doc_id, source, "
            "'You are a concise assistant.' AS s, text AS u, "
            "CASE WHEN doc_id % 4 <> 3 THEN "
            "'Summary ' || doc_id || ': ' || substr(text, 1, 80) END AS a "
            "FROM documents), "
            "wcs AS (SELECT doc_id, source, a, "
            "3 + len(list_filter(string_split_regex(lower(s), "
            "'[^a-z0-9]+'), e -> e <> '')) + 2 AS p0, "
            "CASE WHEN u IS NULL THEN 0 ELSE "
            "3 + len(list_filter(string_split_regex(lower(u), "
            "'[^a-z0-9]+'), e -> e <> '')) + 2 END AS p1, "
            "CASE WHEN a IS NULL THEN 0 ELSE "
            "3 + len(list_filter(string_split_regex(lower(a), "
            "'[^a-z0-9]+'), e -> e <> '')) + 2 END AS p2, "
            "CASE WHEN a IS NULL THEN 0 ELSE "
            "len(list_filter(string_split_regex(lower(a), "
            "'[^a-z0-9]+'), e -> e <> '')) END AS wa "
            "FROM c), "
            "pk AS (SELECT doc_id, source, doc_id % 4 AS shard, a, "
            "p0, p1, wa, "
            "CAST(SUM(p0 + p1 + p2) OVER (PARTITION BY source, doc_id % 4 "
            "ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND "
            "CURRENT ROW) - (p0 + p1 + p2) AS BIGINT) AS prior FROM wcs), "
            "sp AS (SELECT doc_id, source, shard, "
            "prior + p0 + p1 + 3 AS gs, "
            "prior + p0 + p1 + 2 + wa AS ge FROM pk WHERE a IS NOT NULL) "
            "SELECT doc_id, source, shard, CAST(2 AS INT) AS turn_idx, "
            "gs // 128 AS seq_start, CAST(gs % 128 + 1 AS INT) AS pos_start, "
            "ge // 128 AS seq_end, CAST(ge % 128 + 1 AS INT) AS pos_end, "
            "(gs // 128) <> (ge // 128) AS crosses FROM sp"
        ),
        "q_dpo_pairs": (
            _PREFERENCE_CAND_SQL + ", "
            "ok AS (SELECT * FROM cand WHERE response IS NOT NULL "
            "AND reward IS NOT NULL), "
            "ranked AS (SELECT *, "
            "ROW_NUMBER() OVER (PARTITION BY prompt_id "
            "ORDER BY reward DESC, cand_id ASC) AS rhi, "
            "ROW_NUMBER() OVER (PARTITION BY prompt_id "
            "ORDER BY reward ASC, cand_id ASC) AS rlo FROM ok) "
            "SELECT h.prompt_id, h.cand_id AS chosen_id, "
            "l.cand_id AS rejected_id, h.response AS chosen_text, "
            "l.response AS rejected_text, h.reward AS chosen_reward, "
            "l.reward AS rejected_reward, "
            "h.reward - l.reward AS margin "
            "FROM (SELECT * FROM ranked WHERE rhi = 1) h "
            "JOIN (SELECT * FROM ranked WHERE rlo = 1) l "
            "USING (prompt_id) WHERE h.reward - l.reward > 0"
        ),
        "q_reward_agreement": (
            _PREFERENCE_CAND_SQL.replace(
                "FROM documents, generate_series(0, 3) s(g))",
                "FROM documents, generate_series(0, 3) s(g)), "
                "scored AS (SELECT prompt_id, cand_id, reward AS a, "
                "CAST(CONCAT('0x', substr(md5(prompt_id || '#' || cand_id "
                "|| '#rw2'), 1, 13)) AS BIGINT) % 1000 AS b FROM cand "
                "WHERE cand_id IS NOT NULL), "
                "pairs AS (SELECT x.prompt_id, "
                "SIGN(x.a - y.a) * SIGN(x.b - y.b) AS s "
                "FROM scored x JOIN scored y "
                "ON x.prompt_id = y.prompt_id AND y.cand_id > x.cand_id), "
                "n AS (SELECT prompt_id, CAST(COUNT(*) AS BIGINT) "
                "AS n_cands FROM scored GROUP BY prompt_id)",
            )
            + " SELECT p.prompt_id, n.n_cands, "
            "CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS INT) "
            "AS concordant, "
            "CAST(SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS INT) "
            "AS discordant, "
            "CAST(SUM(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS INT) AS tied, "
            "(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) - "
            "SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END)) * 2.0 "
            "/ (n.n_cands * (n.n_cands - 1)) AS tau_a "
            "FROM pairs p JOIN n USING (prompt_id) "
            "GROUP BY p.prompt_id, n.n_cands HAVING n.n_cands >= 2"
        ),
        # BT strengths: same left-fold order as the Spark in-row MM
        # rounds (list_reduce over list_prepend(0.0, ...) == aggregate
        # with 0.0 init), same normalization parenthesization
        # x * (n / sum) — the strengths must replay bit-for-bit
        "q_bt_strength": _bt_mm_sql(
            "WITH cand AS (SELECT doc_id AS prompt_id, s.g AS cand_id, "
            "CAST(CONCAT('0x', substr(md5(doc_id || '#' || s.g || '#rw'), "
            "1, 13)) AS BIGINT) % 1000 AS reward "
            "FROM documents, generate_series(0, 3) s(g)), "
            "comp AS (SELECT x.prompt_id, "
            "CASE WHEN x.reward > y.reward THEN x.cand_id ELSE y.cand_id "
            "END AS winner, "
            "CASE WHEN x.reward > y.reward THEN y.cand_id ELSE x.cand_id "
            "END AS loser "
            "FROM cand x JOIN cand y ON x.prompt_id = y.prompt_id "
            "AND y.cand_id > x.cand_id WHERE x.reward <> y.reward)",
            group="prompt_id",
            final=(
                "SELECT prompt_id, unnest(cands) AS cand_id, "
                "{census} FROM i2"
            ),
        ),
        # GRPO/RLOO advantages: the window sufficient statistics are
        # exact integer sums (DuckDB's HUGEINT SUM equals Spark's
        # BIGINT SUM in value); every double derives with the SAME
        # parenthesization — mean = s/n once, var = (q*n - s*s)/(n*n),
        # adv = (r - mean)/std — so the floats replay bit-for-bit
        "q_grpo_advantages": (
            _PREFERENCE_CAND_SQL
            + ", w AS (SELECT prompt_id, cand_id, reward, "
            "COUNT(*) OVER (PARTITION BY prompt_id) AS n, "
            "SUM(reward) OVER (PARTITION BY prompt_id) AS s, "
            "SUM(reward * reward) OVER (PARTITION BY prompt_id) AS q "
            "FROM cand WHERE reward IS NOT NULL "
            "AND cand_id IS NOT NULL), "
            "st AS (SELECT prompt_id, cand_id, reward, n, s, "
            "s / n AS mean_reward, "
            "sqrt(CAST(q * n - s * s AS DOUBLE) / (n * n)) "
            "AS std_reward FROM w) "
            "SELECT prompt_id, cand_id, reward, "
            "CAST(n AS BIGINT) AS n_candidates, mean_reward, std_reward, "
            "CASE WHEN std_reward > 0 THEN "
            "(CAST(reward AS DOUBLE) - mean_reward) / std_reward "
            "ELSE 0.0 END AS advantage, "
            "CASE WHEN n >= 2 THEN CAST(reward AS DOUBLE) - "
            "CAST(s - reward AS DOUBLE) / (n - 1) END AS advantage_loo "
            "FROM st"
        ),
        # reward-length bias: BIGINT-exact (n, Σx, Σy, Σxy, Σx², Σy²),
        # then closed forms in double with products taken AFTER the
        # cast (overflow-safe at corpus scale) in the same order
        "q_reward_length_bias": (
            _PREFERENCE_CAND_SQL
            + ", a AS (SELECT prompt_id % 8 AS source, "
            "CAST(length(response) AS BIGINT) AS x, reward AS y "
            "FROM cand WHERE response IS NOT NULL "
            "AND reward IS NOT NULL), "
            "g AS (SELECT source, COUNT(*) AS n_samples, "
            "SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy, "
            "SUM(x * x) AS sxx, SUM(y * y) AS syy "
            "FROM a GROUP BY source), "
            "d AS (SELECT source, n_samples, "
            "CAST(n_samples AS DOUBLE) AS n, CAST(sx AS DOUBLE) AS dx, "
            "CAST(sy AS DOUBLE) AS dy, CAST(sxy AS DOUBLE) AS dxy, "
            "CAST(sxx AS DOUBLE) AS dxx, CAST(syy AS DOUBLE) AS dyy "
            "FROM g), "
            "e AS (SELECT source, n_samples, n, dx, dy, "
            "n * dxy - dx * dy AS cov_n, n * dxx - dx * dx AS vx_n, "
            "n * dyy - dy * dy AS vy_n FROM d) "
            "SELECT source, CAST(n_samples AS BIGINT) AS n_samples, "
            "dx / n AS mean_len, dy / n AS mean_reward, "
            "CASE WHEN vx_n > 0 AND vy_n > 0 THEN "
            "cov_n / (sqrt(vx_n) * sqrt(vy_n)) END AS pearson_r, "
            "CASE WHEN vx_n > 0 THEN cov_n / vx_n END AS ols_slope "
            "FROM e"
        ),
        # Zipf fit: wordcount → top-500 by (freq DESC, w) — the SAME
        # total order Spark's TakeOrderedAndProject uses — then ln()
        # points in rank order and the shared left-fold OLS closed
        # forms; intercept inlines slope with Spark's parenthesization
        "q_zipf_fit": (
            _POWERLAW_DOCS_SQL
            + ", toks AS (SELECT unnest(list_filter(string_split_regex("
            "lower(text), '[^a-z0-9]+'), x -> x <> '')) AS w "
            "FROM pl WHERE text IS NOT NULL), "
            "wc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq "
            "FROM toks GROUP BY w), "
            "tot AS (SELECT CAST(SUM(freq) AS BIGINT) AS total_tokens, "
            "CAST(COUNT(*) AS BIGINT) AS vocab_size FROM wc), "
            "top AS (SELECT w, freq FROM wc "
            "ORDER BY freq DESC, w LIMIT 500), "
            "rk AS (SELECT freq, row_number() OVER "
            "(ORDER BY freq DESC, w) AS rn FROM top), "
            "st AS (SELECT list(struct_pack("
            "x := ln(CAST(rn AS DOUBLE)), "
            "y := ln(CAST(freq AS DOUBLE))) ORDER BY rn) AS pts FROM rk)"
            + _POWERLAW_OLS_SQL
            + " SELECT total_tokens, vocab_size, "
            "CAST(len(pts) AS BIGINT) AS n_top, "
            "CASE WHEN vx_n > 0 THEN cov_n / vx_n END AS zipf_slope, "
            "CASE WHEN vx_n > 0 THEN "
            "(sy - (cov_n / vx_n) * sx) / n END AS zipf_intercept, "
            "CASE WHEN vx_n > 0 AND vy_n > 0 THEN "
            "(cov_n * cov_n) / (vx_n * vy_n) END AS zipf_r2 "
            "FROM tot, o"
        ),
        # Heaps fit: per-word first-occurrence min-agg, integer //
        # bucket math against the (lo, hi) bounds, in-row cumulative
        # slice-folds (BIGINT-exact) and the shared OLS tail
        "q_heaps_fit": (
            _POWERLAW_DOCS_SQL
            + ", docs AS (SELECT doc_id AS id, list_filter("
            "string_split_regex(lower(text), '[^a-z0-9]+'), "
            "x -> x <> '') AS ws FROM pl WHERE text IS NOT NULL), "
            "nt AS (SELECT id, CAST(len(ws) AS BIGINT) AS n_tok "
            "FROM docs), "
            "bounds AS (SELECT MIN(id) AS lo, MAX(id) AS hi FROM nt), "
            "tb AS (SELECT ((id - lo) * 32) // (hi - lo + 1) AS b, "
            "SUM(n_tok) AS t FROM nt, bounds GROUP BY 1), "
            "fo AS (SELECT w, MIN(id) AS fd FROM "
            "(SELECT id, unnest(ws) AS w FROM docs) s GROUP BY w), "
            "vb AS (SELECT ((fd - lo) * 32) // (hi - lo + 1) AS b, "
            "CAST(COUNT(*) AS BIGINT) AS v FROM fo, bounds GROUP BY 1), "
            "j AS (SELECT COALESCE(tb.b, vb.b) AS b, "
            "CAST(COALESCE(t, 0) AS BIGINT) AS t, "
            "CAST(COALESCE(v, 0) AS BIGINT) AS v "
            "FROM tb FULL JOIN vb ON tb.b = vb.b), "
            "arr AS (SELECT list(struct_pack(b := b, t := t, v := v) "
            "ORDER BY b) AS a FROM j), "
            "cm AS (SELECT list_transform(a, (e, i) -> struct_pack("
            "ct := list_reduce(list_prepend(CAST(0 AS BIGINT), "
            "list_transform(a[1:i], p -> p.t)), (x, y) -> x + y), "
            "cv := list_reduce(list_prepend(CAST(0 AS BIGINT), "
            "list_transform(a[1:i], p -> p.v)), (x, y) -> x + y))) "
            "AS cums FROM arr), "
            "st AS (SELECT cums[-1].ct AS total_tokens, "
            "cums[-1].cv AS vocab_size, "
            "list_transform(list_filter(cums, "
            "c -> c.ct > 0 AND c.cv > 0), c -> struct_pack("
            "x := ln(CAST(c.ct AS DOUBLE)), "
            "y := ln(CAST(c.cv AS DOUBLE)))) AS pts FROM cm)"
            + _POWERLAW_OLS_SQL
            + " SELECT total_tokens, vocab_size, "
            "CAST(len(pts) AS BIGINT) AS n_points, "
            "CASE WHEN vx_n > 0 THEN cov_n / vx_n END AS heaps_beta, "
            "CASE WHEN vx_n > 0 THEN exp("
            "(sy - (cov_n / vx_n) * sx) / n) END AS heaps_k, "
            "CASE WHEN vx_n > 0 AND vy_n > 0 THEN "
            "(cov_n * cov_n) / (vx_n * vy_n) END AS heaps_r2 "
            "FROM o"
        ),
        # script census: same regex classes (shared literal-range
        # table), same integer sums, fractions as one division
        "q_script_census": _script_census_sql(),
        # l-diversity: same two-level census; entropy folds over the
        # value-ordered list with Spark's 0.0 - fold form; MIN of
        # identical doubles is order-insensitive
        "q_l_diversity": (
            _PRIVACY_BIN_SQL
            + ", gv AS (SELECT c_nationkey, c_mktsegment, v, "
            "CAST(COUNT(*) AS BIGINT) AS c FROM b "
            "WHERE v IS NOT NULL GROUP BY 1, 2, 3), "
            "per AS (SELECT c_nationkey, c_mktsegment, "
            "CAST(COUNT(*) AS BIGINT) AS nd, CAST(SUM(c) AS BIGINT) AS n, "
            "list(struct_pack(v := v, c := c) ORDER BY v, c) AS vc "
            "FROM gv GROUP BY 1, 2), "
            "e AS (SELECT nd, n, 0.0 - list_reduce(list_prepend(0.0, "
            "list_transform(vc, p -> (p.c / n) * ln(p.c / n))), "
            "(a, b) -> a + b) AS ent FROM per) "
            "SELECT CAST(3 AS BIGINT) AS l, MIN(nd) AS l_diversity, "
            "CAST(COUNT(*) AS BIGINT) AS n_groups, "
            "CAST(COUNT(*) FILTER (WHERE nd < 3) AS BIGINT) "
            "AS n_risky_groups, "
            "CAST(SUM(n) AS BIGINT) AS n_rows, "
            "CAST(SUM(CASE WHEN nd < 3 THEN n ELSE 0 END) AS BIGINT) "
            "AS n_risky_rows, "
            "ROUND(SUM(CASE WHEN nd < 3 THEN n ELSE 0 END) / SUM(n), 6) "
            "AS risk_rate, MIN(ent) AS min_entropy FROM e"
        ),
        # t-closeness: the EMD numerator is a BIGINT sum of
        # |cumc*G - cumg*n| terms — exact in any aggregation order —
        # and only the final division is floating point
        "q_t_closeness": (
            _PRIVACY_BIN_SQL
            + ", f AS (SELECT * FROM b WHERE v IS NOT NULL), "
            "gv AS (SELECT c_nationkey, c_mktsegment, v, "
            "CAST(COUNT(*) AS BIGINT) AS c FROM f GROUP BY 1, 2, 3), "
            "dom AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS g "
            "FROM f GROUP BY v), "
            "dc AS (SELECT v, CAST(SUM(g) OVER (ORDER BY v) AS BIGINT) "
            "AS cumg FROM dom), "
            "tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS m, "
            "CAST(SUM(g) AS BIGINT) AS gt FROM dom), "
            "grp AS (SELECT c_nationkey, c_mktsegment, "
            "CAST(SUM(c) AS BIGINT) AS n FROM gv GROUP BY 1, 2), "
            "fl AS (SELECT grp.c_nationkey, grp.c_mktsegment, grp.n, "
            "tot.m, tot.gt, dc.v, dc.cumg, COALESCE(gv.c, 0) AS c "
            "FROM grp CROSS JOIN dc CROSS JOIN tot "
            "LEFT JOIN gv ON gv.c_nationkey = grp.c_nationkey "
            "AND gv.c_mktsegment = grp.c_mktsegment AND gv.v = dc.v), "
            "t AS (SELECT c_nationkey, c_mktsegment, n, m, gt, "
            "CASE WHEN c > 0 THEN 1 ELSE 0 END AS present, "
            "ABS(SUM(c) OVER (PARTITION BY c_nationkey, c_mktsegment "
            "ORDER BY v) * gt - cumg * n) AS term FROM fl) "
            "SELECT c_nationkey, c_mktsegment, "
            "CAST(MAX(n) AS BIGINT) AS n, "
            "CAST(SUM(present) AS BIGINT) AS n_distinct, "
            "CASE WHEN MAX(m) >= 2 THEN CAST(SUM(term) AS DOUBLE) / "
            "(CAST(MAX(n) AS DOUBLE) * MAX(gt) * (MAX(m) - 1)) "
            "ELSE 0.0 END AS emd FROM t GROUP BY 1, 2"
        ),
        # pass@k: the binomial ratio folds left with identical IEEE
        # order; per-task micros make the group SUM exact integers
        "q_pass_at_k": (
            "WITH s AS (SELECT source, doc_id, "
            "CASE WHEN CAST(CONCAT('0x', substr(md5(doc_id || '#ev' "
            "|| g.g), 1, 13)) AS BIGINT) % 10 < 1 + doc_id % 4 "
            "THEN 1 ELSE 0 END AS ok "
            "FROM documents, generate_series(0, 9) g(g)), "
            "t AS (SELECT source, doc_id, CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(ok) AS BIGINT) AS c FROM s GROUP BY source, doc_id), "
            "p AS (SELECT source, k, CASE WHEN n < k THEN NULL "
            "WHEN n - c < k THEN 1000000 "
            "ELSE CAST(ROUND((1.0 - list_reduce(list_prepend(1.0, "
            "list_transform(range(0, k), j -> ((n - c - j) / (n - j)))), "
            "(a, b) -> a * b)) * 1000000) AS BIGINT) END AS pkq "
            "FROM t, (SELECT unnest([1, 5]) AS k) ks) "
            "SELECT source, CAST(k AS INT) AS k, "
            "CAST(COUNT(*) AS BIGINT) AS n_tasks, "
            "CAST(SUM(pkq) AS BIGINT) / (COUNT(*) * 1000000) "
            "AS mean_pass_at_k FROM p WHERE pkq IS NOT NULL "
            "GROUP BY source, k"
        ),
        # majority vote: modal answer via max-count + min-answer
        # tie-break; vote shares floor-quantized before the rollup
        "q_majority_vote": (
            "WITH s AS (SELECT source, doc_id, "
            "CAST(CONCAT('0x', substr(md5(doc_id || '#an' || g.g), 1, "
            "13)) AS BIGINT) % 3 AS answer, "
            "CAST(CONCAT('0x', substr(md5(doc_id || '#ref'), 1, 13)) "
            "AS BIGINT) % 3 AS reference "
            "FROM documents, generate_series(0, 4) g(g)), "
            "v AS (SELECT source, doc_id, answer, "
            "CAST(COUNT(*) AS BIGINT) AS nv, MAX(reference) AS ref "
            "FROM s GROUP BY source, doc_id, answer), "
            "mx AS (SELECT source, doc_id, MAX(nv) AS maxv, "
            "CAST(SUM(nv) AS BIGINT) AS nn, MAX(ref) AS ref2 "
            "FROM v GROUP BY source, doc_id), "
            "modal AS (SELECT v.source, v.doc_id, MIN(v.answer) AS m, "
            "MAX(mx.maxv) AS mv, MAX(mx.nn) AS nn, MAX(mx.ref2) AS r "
            "FROM v JOIN mx ON v.source = mx.source "
            "AND v.doc_id = mx.doc_id AND v.nv = mx.maxv "
            "GROUP BY v.source, v.doc_id) "
            "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tasks, "
            "CAST(COUNT(*) FILTER (WHERE m = r) AS BIGINT) AS n_correct, "
            "CAST(COUNT(*) FILTER (WHERE m = r) AS BIGINT) / COUNT(*) "
            "AS accuracy, "
            "CAST(SUM(CAST(FLOOR(mv * 1000000 / nn) AS BIGINT)) "
            "AS BIGINT) / (COUNT(*) * 1000000) AS mean_vote_share "
            "FROM modal GROUP BY source"
        ),
        # bootstrap CIs: the MM rounds nest inside the replicate
        # expansion (a CTE body may carry its own WITH chain); weights
        # from the generated Poisson CASE over the shared constants;
        # rank picks with explicit FLOOR/CEIL
        "q_bt_bootstrap": (
            "WITH fits AS ("
            + _bt_mm_sql(
                "WITH battles AS (SELECT doc_id AS battle_id, "
                "CASE WHEN hw % 2 = 0 THEN ma ELSE mb END AS winner, "
                "CASE WHEN hw % 2 = 0 THEN mb ELSE ma END AS loser "
                "FROM (SELECT doc_id, ma, "
                "CASE WHEN mbr >= ma THEN mbr + 1 ELSE mbr END AS mb, hw "
                "FROM (SELECT doc_id, "
                "CAST(CONCAT('0x', substr(md5(doc_id || '#ma'), 1, 13)) "
                "AS BIGINT) % 12 AS ma, "
                "CAST(CONCAT('0x', substr(md5(doc_id || '#mb'), 1, 13)) "
                "AS BIGINT) % 11 AS mbr, "
                "CAST(CONCAT('0x', substr(md5(doc_id || '#mw'), 1, 13)) "
                "AS BIGINT) AS hw FROM documents) t0) t1), "
                "reps AS (SELECT battles.*, r.g AS rep FROM battles, "
                "generate_series(1, 20) r(g)), "
                "wts AS (SELECT rep, winner, loser, "
                + _poisson1_case_sql()
                + " AS wt FROM (SELECT *, "
                "CAST(CONCAT('0x', substr(md5(battle_id || '#bs' || rep), "
                "1, 13)) AS BIGINT) / 4503599627370496.0 AS u "
                "FROM reps) t2), "
                "comp AS (SELECT rep, winner, loser, "
                "unnest(range(1, wt + 1)) AS c FROM wts)",
                group="rep",
                final=(
                    "SELECT rep, unnest(cands) AS model_id, "
                    "unnest(ps) AS strength FROM i2"
                ),
            )
            + "), pm AS (SELECT model_id, "
            "list(strength ORDER BY strength) AS ss FROM fits "
            "GROUP BY model_id) "
            "SELECT model_id, CAST(len(ss) AS BIGINT) AS n_present, "
            "ss[CAST(1 + FLOOR(len(ss) * 25 / 1000) AS INT)] "
            "AS strength_lo, "
            "ss[CAST(1 + FLOOR(len(ss) * 500 / 1000) AS INT)] "
            "AS strength_median, "
            "ss[CAST(CEIL(len(ss) * 975 / 1000) AS INT)] "
            "AS strength_hi FROM pm"
        ),
        # Wilson intervals: identical parenthesization to the Spark
        # expressions (z2/(2.0*n), z*sqrt(p*(1.0-p)/n + z2/(4.0*n*n))
        # / denom) so the doubles replay bit-for-bit
        "q_winrate_matrix": (
            "WITH comp AS (SELECT CAST(0 AS BIGINT) AS board, "
            "CASE WHEN hw % 2 = 0 THEN ma ELSE mb END AS winner, "
            "CASE WHEN hw % 2 = 0 THEN mb ELSE ma END AS loser "
            "FROM (SELECT ma, "
            "CASE WHEN mbr >= ma THEN mbr + 1 ELSE mbr END AS mb, hw "
            "FROM (SELECT "
            "CAST(CONCAT('0x', substr(md5(doc_id || '#ma'), 1, 13)) "
            "AS BIGINT) % 12 AS ma, "
            "CAST(CONCAT('0x', substr(md5(doc_id || '#mb'), 1, 13)) "
            "AS BIGINT) % 11 AS mbr, "
            "CAST(CONCAT('0x', substr(md5(doc_id || '#mw'), 1, 13)) "
            "AS BIGINT) AS hw FROM documents) t0) t1), "
            "g AS (SELECT board, LEAST(winner, loser) AS model_a, "
            "GREATEST(winner, loser) AS model_b, "
            "CAST(COUNT(*) AS BIGINT) AS n_battles, "
            "CAST(COUNT(*) FILTER (WHERE winner < loser) AS BIGINT) "
            "AS wins_a FROM comp "
            "GROUP BY board, LEAST(winner, loser), "
            "GREATEST(winner, loser)), "
            "st AS (SELECT *, wins_a / n_battles AS p, "
            "CAST(n_battles AS DOUBLE) AS nd, 1.96 * 1.96 AS z2 FROM g), "
            "st2 AS (SELECT *, 1.0 + z2 / nd AS denom FROM st) "
            "SELECT board, model_a, model_b, n_battles, wins_a, "
            "p AS win_rate, "
            "(p + z2 / (2.0 * nd)) / denom - "
            "1.96 * sqrt(p * (1.0 - p) / nd + z2 / (4.0 * nd * nd)) "
            "/ denom AS wilson_lo, "
            "(p + z2 / (2.0 * nd)) / denom + "
            "1.96 * sqrt(p * (1.0 - p) / nd + z2 / (4.0 * nd * nd)) "
            "/ denom AS wilson_hi FROM st2"
        ),
        # conversation trees: the oracle grows paths DOWN from the
        # roots with a recursive CTE (independent derivation of the
        # same root->leaf threads) and anti-joins to the leaf set
        "q_chat_trees": (
            "WITH RECURSIVE m AS (SELECT doc_id AS conv_id, "
            "CAST(s.g AS BIGINT) AS msg_id, "
            "CASE WHEN s.g = 0 THEN NULL ELSE "
            "CAST(CONCAT('0x', substr(md5(doc_id || '#p' || s.g), 1, 13)) "
            "AS BIGINT) % s.g END AS parent_id, "
            "CASE WHEN s.g % 2 = 0 THEN 'user' ELSE 'assistant' END "
            "AS role FROM documents, generate_series(0, 6) s(g)), "
            "paths AS ("
            "SELECT conv_id, msg_id, CAST(msg_id AS VARCHAR) AS path, "
            "role AS roles, 1 AS depth FROM m WHERE parent_id IS NULL "
            "UNION ALL "
            "SELECT c.conv_id, c.msg_id, "
            "p.path || '>' || c.msg_id, p.roles || '>' || c.role, "
            "p.depth + 1 FROM m c JOIN paths p "
            "ON c.conv_id = p.conv_id AND c.parent_id = p.msg_id) "
            "SELECT conv_id, msg_id AS leaf_id, CAST(depth AS INT) "
            "AS depth, path, roles, TRUE AS is_complete FROM paths t "
            "WHERE NOT EXISTS (SELECT 1 FROM m x WHERE "
            "x.conv_id = t.conv_id AND x.parent_id = t.msg_id)"
        ),
        # rendered tree threads: the recursive CTE accumulates the
        # ChatML string alongside the path (chr(10) = the literal \n)
        "q_chat_tree_render": (
            "WITH RECURSIVE m AS (SELECT doc_id AS conv_id, "
            "CAST(s.g AS BIGINT) AS msg_id, "
            "CASE WHEN s.g = 0 THEN NULL ELSE "
            "CAST(CONCAT('0x', substr(md5(doc_id || '#p' || s.g), 1, 13)) "
            "AS BIGINT) % s.g END AS parent_id, "
            "CASE WHEN s.g % 2 = 0 THEN 'user' ELSE 'assistant' END "
            "AS role, substr(text, CAST(s.g * 7 + 1 AS INT), 24) AS t "
            "FROM documents, generate_series(0, 6) s(g)), "
            "paths AS ("
            "SELECT conv_id, msg_id, CAST(msg_id AS VARCHAR) AS path, "
            "role AS roles, 1 AS depth, "
            "CASE WHEN t IS NULL THEN '' ELSE '<|im_start|>' || role "
            "|| chr(10) || t || '<|im_end|>' || chr(10) END AS rendered "
            "FROM m WHERE parent_id IS NULL "
            "UNION ALL "
            "SELECT c.conv_id, c.msg_id, "
            "p.path || '>' || c.msg_id, p.roles || '>' || c.role, "
            "p.depth + 1, p.rendered || "
            "CASE WHEN c.t IS NULL THEN '' ELSE '<|im_start|>' || c.role "
            "|| chr(10) || c.t || '<|im_end|>' || chr(10) END "
            "FROM m c JOIN paths p "
            "ON c.conv_id = p.conv_id AND c.parent_id = p.msg_id) "
            "SELECT conv_id, msg_id AS leaf_id, CAST(depth AS INT) "
            "AS depth, path, roles, TRUE AS is_complete, rendered "
            "FROM paths t "
            "WHERE NOT EXISTS (SELECT 1 FROM m x WHERE "
            "x.conv_id = t.conv_id AND x.parent_id = t.msg_id)"
        ),
        # Fleiss kappa: P-bar stays integer until one division; P-e
        # folds over the sorted category marginals with the same left
        # fold as Spark's in-row aggregate
        "q_fleiss_kappa": (
            "WITH v AS (SELECT source, doc_id, s.g AS rater_id, "
            "CAST(CONCAT('0x', substr(md5(doc_id || '#rt' || s.g), "
            "1, 13)) AS BIGINT) % 4 AS category "
            "FROM documents, generate_series(0, 2) s(g)), "
            "ic AS (SELECT source, doc_id, category, "
            "CAST(COUNT(*) AS BIGINT) AS nij "
            "FROM v GROUP BY source, doc_id, category), "
            "it AS (SELECT source, doc_id, "
            "CAST(SUM(nij) AS BIGINT) AS n, "
            "CAST(SUM(nij * nij) AS BIGINT) AS s2 "
            "FROM ic GROUP BY source, doc_id), "
            "kept AS (SELECT source, doc_id, s2 FROM it WHERE n = 3), "
            "cc AS (SELECT source, list_sort(list(cj)) AS cjs FROM ("
            "SELECT ic.source, ic.category, "
            "CAST(SUM(ic.nij) AS BIGINT) AS cj "
            "FROM ic JOIN kept USING (source, doc_id) "
            "GROUP BY ic.source, ic.category) GROUP BY source), "
            "ga AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_items, "
            "CAST(SUM(s2 - 3) AS BIGINT) AS sum_s2n "
            "FROM kept GROUP BY source), "
            "st AS (SELECT ga.source, n_items, "
            "CAST(0 AS BIGINT) AS n_items_dropped, "
            "sum_s2n / (n_items * 3 * 2) AS p_bar, "
            "list_reduce(list_prepend(0.0, list_transform(cjs, "
            "c -> (c / (n_items * 3)) * (c / (n_items * 3)))), "
            "(a, b) -> a + b) AS p_e "
            "FROM ga JOIN cc ON ga.source = cc.source) "
            "SELECT source, n_items, n_items_dropped, p_bar, p_e, "
            "(p_bar - p_e) / (1.0 - p_e) AS kappa FROM st"
        ),
        "q_bt_leaderboard": _bt_mm_sql(
            "WITH comp AS (SELECT CAST(0 AS BIGINT) AS board, "
            "CASE WHEN hw % 2 = 0 THEN ma ELSE mb END AS winner, "
            "CASE WHEN hw % 2 = 0 THEN mb ELSE ma END AS loser "
            "FROM (SELECT ma, "
            "CASE WHEN mbr >= ma THEN mbr + 1 ELSE mbr END AS mb, hw "
            "FROM (SELECT "
            "CAST(CONCAT('0x', substr(md5(doc_id || '#ma'), 1, 13)) "
            "AS BIGINT) % 12 AS ma, "
            "CAST(CONCAT('0x', substr(md5(doc_id || '#mb'), 1, 13)) "
            "AS BIGINT) % 11 AS mbr, "
            "CAST(CONCAT('0x', substr(md5(doc_id || '#mw'), 1, 13)) "
            "AS BIGINT) AS hw FROM documents) t0) t1)",
            group="board",
            final=(
                "SELECT unnest(cands) AS model_id, {census} FROM i2"
            ),
        ),
        "q_best_of_n": (
            _PREFERENCE_CAND_SQL + ", "
            "ok AS (SELECT * FROM cand WHERE response IS NOT NULL "
            "AND reward IS NOT NULL), "
            "ranked AS (SELECT *, "
            "ROW_NUMBER() OVER (PARTITION BY prompt_id "
            "ORDER BY reward DESC, cand_id ASC) AS rhi, "
            "COUNT(*) OVER (PARTITION BY prompt_id) AS n_candidates, "
            "AVG(reward) OVER (PARTITION BY prompt_id) AS mean_reward "
            "FROM ok) "
            "SELECT prompt_id, cand_id, response, reward, "
            "CAST(n_candidates AS BIGINT) AS n_candidates, "
            "ROUND(mean_reward, 6) AS mean_reward "
            "FROM ranked WHERE rhi = 1"
        ),
        # llama3 lengths: bos '<|begin_of_text|>'=17, header = 19 +
        # len(role) + 17 + 2 (system 44 / user 42 / assistant 47),
        # footer '<|eot_id|>'=10
        "q_chat_multiturn": (
            _MULTITURN_CONVO_SQL + ", "
            "r AS (SELECT doc_id, '<|begin_of_text|>' || "
            "COALESCE('<|start_header_id|>system<|end_header_id|>' || chr(10) || chr(10) || s || '<|eot_id|>', '') || "
            "COALESCE('<|start_header_id|>user<|end_header_id|>' || chr(10) || chr(10) || u || '<|eot_id|>', '') || "
            "COALESCE('<|start_header_id|>assistant<|end_header_id|>' || chr(10) || chr(10) || a || '<|eot_id|>', '') || "
            "COALESCE('<|start_header_id|>user<|end_header_id|>' || chr(10) || chr(10) || u2 || '<|eot_id|>', '') || "
            "COALESCE('<|start_header_id|>assistant<|end_header_id|>' || chr(10) || chr(10) || a2 || '<|eot_id|>', '') "
            "AS rendered, "
            "(CASE WHEN s IS NULL THEN 0 ELSE 1 END + "
            "CASE WHEN u IS NULL THEN 0 ELSE 1 END + "
            "CASE WHEN a IS NULL THEN 0 ELSE 1 END + "
            "CASE WHEN u2 IS NULL THEN 0 ELSE 1 END + "
            "CASE WHEN a2 IS NULL THEN 0 ELSE 1 END) AS n_turns FROM c) "
            "SELECT doc_id, rendered, CAST(n_turns AS INT) AS n_turns, "
            "CAST(length(rendered) AS INT) AS n_chars FROM r"
        ),
        "q_chat_multiturn_spans": (
            _MULTITURN_CONVO_SQL + ", "
            "o AS (SELECT doc_id, a, a2, "
            "(CASE WHEN s IS NULL THEN 0 ELSE 44 + length(s) + 10 END) AS p0, "
            "(CASE WHEN u IS NULL THEN 0 ELSE 42 + length(u) + 10 END) AS p1, "
            "(CASE WHEN a IS NULL THEN 0 ELSE 47 + length(a) + 10 END) AS p2, "
            "(CASE WHEN u2 IS NULL THEN 0 ELSE 42 + length(u2) + 10 END) AS p3 "
            "FROM c) "
            "SELECT doc_id, 2 AS turn_idx, 'assistant' AS role, "
            "CAST(17 + p0 + p1 + 47 + 1 AS INT) AS start, "
            "CAST(17 + p0 + p1 + 47 + length(a) AS INT) AS \"end\" "
            "FROM o WHERE a IS NOT NULL "
            "UNION ALL SELECT doc_id, 4 AS turn_idx, 'assistant' AS role, "
            "CAST(17 + p0 + p1 + p2 + p3 + 47 + 1 AS INT) AS start, "
            "CAST(17 + p0 + p1 + p2 + p3 + 47 + length(a2) AS INT) AS \"end\" "
            "FROM o WHERE a2 IS NOT NULL"
        ),
        "q_code_pipeline": (
            "WITH salted AS (SELECT doc_id, CASE "
            "WHEN doc_id % 5 = 0 THEN '// SPDX-License-Identifier: Apache-2.0' || chr(10) || text "
            "WHEN doc_id % 5 = 1 THEN '/* MIT License */' || chr(10) || text "
            "WHEN doc_id % 5 = 2 THEN '# auto-generated by codegen - DO NOT EDIT' || chr(10) || text "
            "WHEN doc_id % 5 = 4 THEN text || chr(10) || repeat('x', 1101) "
            "ELSE text END AS t FROM documents), "
            "s AS (SELECT doc_id, t, "
            "list_transform(string_split(t, chr(10)), l -> length(l)) AS ls, "
            "length(regexp_replace(t, '[^A-Za-z0-9]', '', 'g')) AS alnum, "
            "regexp_extract(t, 'SPDX-License-Identifier:\\s*([A-Za-z0-9.+-]+)', 1) AS spdx, "
            "regexp_matches(t, '(?i)auto-?generated|do not edit|generated by') AS ag, "
            "CAST(len(regexp_extract_all(t, chr(65533))) AS INT) AS n_repl, "
            "CAST(len(regexp_extract_all(t, "
            "chr(195) || chr(169) || '|' || chr(195) || chr(168) || '|' || "
            "chr(195) || chr(164) || '|' || chr(195) || chr(182) || '|' || "
            "chr(195) || chr(188) || '|' || "
            "chr(226) || chr(8364) || chr(8482) || '|' || "
            "chr(226) || chr(8364) || chr(339) || '|' || "
            "chr(194) || chr(160))) AS INT) AS n_moji, "
            "CAST(len(regexp_extract_all(t, "
            "'[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]')) AS INT) AS n_ctrl "
            "FROM salted WHERE t IS NOT NULL), "
            "kept AS (SELECT doc_id, t, length(t) AS n_chars, "
            "CASE WHEN spdx <> '' THEN spdx "
            "WHEN contains(t, 'MIT License') THEN 'MIT' "
            "WHEN contains(t, 'Apache License') THEN 'Apache-2.0' "
            "WHEN contains(t, 'GNU General Public License') "
            "THEN 'GPL-3.0-or-later' ELSE NULL END AS license FROM s "
            "WHERE list_max(ls) <= 1000 AND list_sum(ls) <= 100 * len(ls) "
            "AND 4 * alnum >= length(t) AND NOT ag "
            "AND n_repl = 0 AND n_moji = 0 AND n_ctrl * 100 <= length(t)) "
            "SELECT COALESCE(license, 'unlicensed') AS license, "
            "COUNT(*) AS n_files, COUNT(DISTINCT md5(t)) AS n_unique, "
            "CAST(SUM(length(t)) AS BIGINT) AS total_chars FROM kept GROUP BY 1"
        ),
        "q_encoding_quality": (
            "WITH salted AS (SELECT doc_id, CASE "
            "WHEN doc_id % 6 = 1 THEN text || ' caf' || chr(195) || chr(169) "
            "WHEN doc_id % 6 = 2 THEN text || ' bad ' || chr(65533) || ' byte' "
            "WHEN doc_id % 6 = 3 THEN text || ' bell' || chr(7) "
            "ELSE text END AS t FROM documents), "
            "s AS (SELECT doc_id, t, "
            "CAST(len(regexp_extract_all(t, chr(65533))) AS INT) AS n_repl, "
            "CAST(len(regexp_extract_all(t, "
            "chr(195) || chr(169) || '|' || chr(195) || chr(168) || '|' || "
            "chr(195) || chr(164) || '|' || chr(195) || chr(182) || '|' || "
            "chr(195) || chr(188) || '|' || "
            "chr(226) || chr(8364) || chr(8482) || '|' || "
            "chr(226) || chr(8364) || chr(339) || '|' || "
            "chr(194) || chr(160))) AS INT) AS n_moji, "
            "CAST(len(regexp_extract_all(t, "
            "'[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]')) AS INT) AS n_ctrl "
            "FROM salted) "
            "SELECT doc_id, CAST(length(t) AS INT) AS n_chars, n_repl AS "
            "n_replacement, n_moji AS n_mojibake, n_ctrl, "
            "(n_repl = 0 AND n_moji = 0 AND n_ctrl * 100 <= length(t)) "
            "AS clean FROM s"
        ),
        "q_code_stats": (
            "WITH salted AS (SELECT doc_id, CASE "
            "WHEN doc_id % 5 = 0 THEN '// SPDX-License-Identifier: Apache-2.0' || chr(10) || text "
            "WHEN doc_id % 5 = 1 THEN '/* MIT License */' || chr(10) || text "
            "WHEN doc_id % 5 = 2 THEN '# auto-generated by codegen - DO NOT EDIT' || chr(10) || text "
            "WHEN doc_id % 5 = 4 THEN text || chr(10) || repeat('x', 1101) "
            "ELSE text END AS t FROM documents), "
            "s AS (SELECT doc_id, t, "
            "list_transform(string_split(t, chr(10)), l -> length(l)) AS ls, "
            "length(regexp_replace(t, '[^A-Za-z0-9]', '', 'g')) AS alnum, "
            "regexp_extract(t, 'SPDX-License-Identifier:\\s*([A-Za-z0-9.+-]+)', 1) AS spdx, "
            "regexp_matches(t, '(?i)auto-?generated|do not edit|generated by') AS ag "
            "FROM salted) "
            "SELECT doc_id, CAST(len(ls) AS INT) AS n_lines, "
            "CAST(list_max(ls) AS INT) AS max_line_len, "
            "CAST(list_sum(ls) AS BIGINT) AS sum_line_len, "
            "CAST(length(t) AS INT) AS n_chars, "
            "CAST(alnum AS INT) AS alnum_chars, "
            "CASE WHEN spdx <> '' THEN spdx "
            "WHEN contains(t, 'MIT License') THEN 'MIT' "
            "WHEN contains(t, 'Apache License') THEN 'Apache-2.0' "
            "WHEN contains(t, 'GNU General Public License') "
            "THEN 'GPL-3.0-or-later' ELSE NULL END AS license, "
            "ag AS autogen, "
            "(list_max(ls) <= 1000 AND list_sum(ls) <= 100 * len(ls) "
            "AND 4 * alnum >= length(t) AND NOT ag) AS passes FROM s"
        ),
        "q_fim_transform": _fim_oracle_sql(mode="psm", rate=0.5),
        "q_fim_spm": _fim_oracle_sql(mode="spm", rate=0.5),
        "q_fim_context": _fim_oracle_sql(
            mode="psm", rate=0.35, chunk_chars=256
        ),
        "q_pack_sequences": (
            "WITH t AS (SELECT doc_id AS id, source, doc_id % 4 AS shard, "
            "len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), "
            "x -> x <> '')) AS n_tokens FROM documents) "
            "SELECT id, source, shard, n_tokens, "
            "CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY source, shard "
            "ORDER BY id) - n_tokens) / 512.0) AS BIGINT) AS seq_id FROM t"
        ),
        "q_salted_agg": (
            "SELECT event_type, COUNT(event_id) AS n, "
            "ROUND(SUM(value), 2) AS total_value, "
            "ROUND(AVG(value), 4) AS avg_value, "
            "ROUND(MAX(value), 4) AS max_value "
            "FROM events GROUP BY event_type"
        ),
        # salted join must be row-identical to the plain equi join
        "q_salted_join": (
            "SELECT e.event_id, e.user_id, e.event_type, d.user_events "
            "FROM events e JOIN (SELECT user_id, COUNT(*) AS user_events "
            "FROM events GROUP BY user_id) d ON e.user_id = d.user_id"
        ),
        "q_events_sliding": (
            # every event is inside exactly 4 of the 15-min-aligned 1h
            # windows: starts floor(t/900)*900 - k*900, k in 0..3
            "SELECT CAST(floor(epoch(ts) / 900) * 900 - 900 * g AS BIGINT) "
            "AS window_start, event_type, COUNT(*) AS n "
            "FROM events CROSS JOIN generate_series(0, 3) t(g) "
            "GROUP BY 1, 2"
        ),
        "q_resample_ffill": (
            "WITH ev AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) "
            "AS ets, MAX(value) AS value FROM events GROUP BY 1, 2), "
            "b AS (SELECT user_id, CAST(floor(MIN(ets) / 3600) * 3600 AS "
            "BIGINT) AS lo, CAST(floor(MAX(ets) / 3600) * 3600 AS BIGINT) "
            "AS hi FROM ev GROUP BY 1), "
            "grid AS (SELECT user_id, unnest(range(lo, hi + 1, 3600)) AS "
            "grid_ts FROM b) "
            "SELECT g.user_id, g.grid_ts, e.value FROM grid g "
            "ASOF LEFT JOIN ev e "
            "ON g.user_id = e.user_id AND g.grid_ts >= e.ets"
        ),
        "q_resample_lerp": (
            "WITH ev AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) "
            "AS t, MAX(CAST(value AS DOUBLE)) AS v FROM events "
            "WHERE value IS NOT NULL GROUP BY 1, 2), "
            "b AS (SELECT user_id, CAST(floor(MIN(t) / 3600) * 3600 AS "
            "BIGINT) AS lo, CAST(floor(MAX(t) / 3600) * 3600 AS BIGINT) "
            "AS hi FROM ev GROUP BY 1), "
            "grid AS (SELECT user_id, unnest(range(lo, hi + 1, 3600)) AS "
            "t, CAST(NULL AS DOUBLE) AS v, 1 AS side FROM b), "
            "u AS (SELECT user_id, t, v, 0 AS side FROM ev "
            "UNION ALL SELECT user_id, t, v, side FROM grid), "
            "w AS (SELECT *, "
            "last_value(v IGNORE NULLS) OVER (PARTITION BY user_id "
            "ORDER BY t, side ROWS UNBOUNDED PRECEDING) AS pv, "
            "MAX(CASE WHEN side = 0 THEN t END) OVER (PARTITION BY "
            "user_id ORDER BY t, side ROWS UNBOUNDED PRECEDING) AS pt, "
            "first_value(v IGNORE NULLS) OVER (PARTITION BY user_id "
            "ORDER BY t, side ROWS BETWEEN CURRENT ROW AND UNBOUNDED "
            "FOLLOWING) AS nv, "
            "MIN(CASE WHEN side = 0 THEN t END) OVER (PARTITION BY "
            "user_id ORDER BY t, side ROWS BETWEEN CURRENT ROW AND "
            "UNBOUNDED FOLLOWING) AS nt FROM u) "
            "SELECT user_id, t AS grid_ts, "
            "CASE WHEN pt IS NULL THEN NULL WHEN nt IS NULL THEN pv "
            "WHEN nt = pt THEN pv "
            "ELSE pv + (nv - pv) * (t - pt) / (nt - pt) END AS value "
            "FROM w WHERE side = 1"
        ),
        "q_cube": (
            # CAST: DuckDB SUM(BIGINT) returns HUGEINT, which the driver
            # hashes differently from Spark's long
            "SELECT source, lang, COUNT(*) AS n_docs, "
            "CAST(SUM(n_chars) AS BIGINT) AS total_chars "
            "FROM documents GROUP BY CUBE (source, lang)"
        ),
        "q_histogram": (
            "SELECT CAST(floor(l_extendedprice / 5000) AS BIGINT) AS bin, "
            "COUNT(*) AS n FROM lineitem GROUP BY bin"
        ),
        "q_redact_pii": (
            "WITH salted AS (SELECT doc_id, text || ' contact user' || "
            "CAST(doc_id AS VARCHAR) || '@example.com at 10.0.' || "
            "CAST(doc_id % 256 AS VARCHAR) || '.7 or +1 555-123-4567' AS s "
            "FROM documents), red AS (SELECT doc_id, s, regexp_replace("
            "regexp_replace(regexp_replace(s, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), "
            "'\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'), "
            "'\\+?\\d{1,2}[-. ]?\\(?\\d{3}\\)?[-. ]?\\d{3}[-. ]\\d{4}', "
            "'<PHONE>', 'g') AS redacted FROM salted) "
            "SELECT doc_id, redacted, "
            "CAST(length(s) - length(redacted) AS INTEGER) AS chars_removed "
            "FROM red"
        ),
        "q_tfidf_top_terms": (
            "WITH docs AS (SELECT * FROM documents WHERE doc_id < 100), "
            "toks AS (SELECT doc_id, unnest(list_filter(string_split_regex("
            "lower(text), '[^a-z0-9]+'), t -> t <> '')) AS term FROM docs), "
            "tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks "
            "GROUP BY doc_id, term), "
            "dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term), "
            "n AS (SELECT COUNT(*) AS n FROM docs), "
            "scored AS (SELECT tf.doc_id, tf.term, tf.tf, "
            "ROUND(tf.tf * LN((n.n + 1.0) / (dfq.df + 1.0)), 6) AS score "
            "FROM tf JOIN dfq USING (term) CROSS JOIN n), "
            "ranked AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id "
            "ORDER BY score DESC, term ASC) AS INTEGER) AS rank FROM scored) "
            "SELECT doc_id, term, tf, score, rank FROM ranked WHERE rank <= 3"
        ),
        "q_upsert": (
            "WITH base AS (SELECT o_orderkey, o_custkey, "
            "ROUND(o_totalprice, 2) AS o_totalprice FROM orders), "
            "upd AS (SELECT o_orderkey, o_custkey, "
            "o_totalprice + 10.0 AS o_totalprice FROM base "
            "WHERE o_orderkey % 10 = 0 "
            "UNION ALL SELECT -o_orderkey, o_custkey, o_totalprice FROM base "
            "WHERE o_orderkey % 97 = 0 AND o_orderkey > 0) "
            "SELECT * FROM upd "
            "UNION ALL SELECT b.* FROM base b WHERE NOT EXISTS "
            "(SELECT 1 FROM upd u WHERE u.o_orderkey = b.o_orderkey)"
        ),
        "q_approx_distinct": (
            # the oracle expects approx_ok = TRUE: Spark's HLL++ sketch
            # must land within 5% of the exact count or the hash flips
            "SELECT source, COUNT(DISTINCT md5(regexp_replace(lower(text), "
            "'[^a-z0-9]', '', 'g'))) AS n_exact, TRUE AS approx_ok "
            "FROM documents GROUP BY source"
        ),
        "q_weighted_sample": (
            "SELECT doc_id, source, n_chars FROM documents "
            "WHERE n_chars > 0 ORDER BY "
            "POW((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) "
            "AS BIGINT) % 10000 + 1) / 10000.0, 1.0 / n_chars) DESC, "
            "doc_id ASC LIMIT 100"
        ),
        "q_scd2": (
            "WITH collapsed AS (SELECT user_id, "
            "CAST(floor(epoch(ts)) AS BIGINT) AS valid_from, "
            "MAX(value) AS value FROM events GROUP BY 1, 2) "
            "SELECT user_id, valid_from, "
            "LEAD(valid_from) OVER w AS valid_to, value, "
            "LEAD(valid_from) OVER w IS NULL AS is_current "
            "FROM collapsed "
            "WINDOW w AS (PARTITION BY user_id ORDER BY valid_from)"
        ),
        "q_funnel": (
            "WITH a AS (SELECT user_id, ts, event_id, event_type, "
            "CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS q0 "
            "FROM events), "
            "b AS (SELECT *, (CASE WHEN event_type = 'click' THEN 1 ELSE 0 "
            "END) * MAX(q0) OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS q1 FROM a), "
            "c AS (SELECT *, (CASE WHEN event_type = 'purchase' THEN 1 ELSE "
            "0 END) * MAX(q1) OVER (PARTITION BY user_id ORDER BY ts, "
            "event_id ROWS UNBOUNDED PRECEDING) AS q2 FROM b), "
            "u AS (SELECT user_id, MAX(q0) AS q0, MAX(q1) AS q1, "
            "MAX(q2) AS q2 FROM c GROUP BY user_id), "
            "t AS (SELECT CAST(SUM(q0) AS BIGINT) AS n0, "
            "CAST(SUM(q1) AS BIGINT) AS n1, "
            "CAST(SUM(q2) AS BIGINT) AS n2 FROM u) "
            "SELECT 1 AS step, 'view' AS step_name, n0 AS n_users FROM t "
            "UNION ALL SELECT 2, 'click', n1 FROM t "
            "UNION ALL SELECT 3, 'purchase', n2 FROM t"
        ),
        "q_transitions": (
            "WITH t AS (SELECT user_id, event_type, "
            "LAG(event_type) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS prev_type FROM events) "
            "SELECT prev_type, event_type, COUNT(*) AS n "
            "FROM t GROUP BY 1, 2"
        ),
        "q_budget_sample": (
            "WITH sel AS (SELECT doc_id, source, n_chars, "
            "CASE source WHEN 'src0' THEN 3000 WHEN 'src1' THEN 5000 "
            "WHEN 'src2' THEN 2000 END AS budget, "
            "SUM(n_chars) OVER (PARTITION BY source "
            "ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id "
            "ROWS UNBOUNDED PRECEDING) AS cum "
            "FROM documents WHERE source IN ('src0', 'src1', 'src2')) "
            "SELECT doc_id, source, n_chars FROM sel "
            "WHERE cum - n_chars < budget"
        ),
        "q_winsorize": (
            "WITH b AS (SELECT source, "
            "percentile_cont(0.05) WITHIN GROUP (ORDER BY "
            "CAST(n_chars AS DOUBLE)) AS lo, "
            "percentile_cont(0.95) WITHIN GROUP (ORDER BY "
            "CAST(n_chars AS DOUBLE)) AS hi "
            "FROM documents GROUP BY source) "
            "SELECT d.doc_id, d.source, d.n_chars, "
            "ROUND(LEAST(GREATEST(CAST(d.n_chars AS DOUBLE), b.lo), b.hi), 4) "
            "AS n_chars_wins FROM documents d JOIN b USING (source)"
        ),
        "q_approx_quantile": (
            # the oracle expects approx_ok = TRUE: Spark's approx sketch
            # must land inside the exact p45-p55 band or the hash flips
            "SELECT source, ROUND(percentile_cont(0.5) WITHIN GROUP "
            "(ORDER BY CAST(n_chars AS DOUBLE)), 4) AS p50_exact, "
            "TRUE AS approx_ok FROM documents GROUP BY source"
        ),
        "q_inverted_index": (
            "WITH toks AS (SELECT doc_id AS id, unnest(list_distinct("
            "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), "
            "x -> x <> ''))) AS term FROM documents WHERE doc_id < 200) "
            "SELECT term, COUNT(*) AS df, array_to_string(list_transform("
            "list_sort(list(id))[1:10], x -> CAST(x AS VARCHAR)), ',') "
            "AS postings FROM toks GROUP BY term HAVING COUNT(*) >= 5"
        ),
        "q_pagerank": _pagerank_oracle_sql(10),
        "q_rfm": """WITH rfm AS (SELECT user_id, MAX(CAST(floor(epoch(ts)) AS BIGINT)) AS recency_ts, COUNT(*) AS frequency, ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value END), 4) AS monetary FROM events GROUP BY user_id), b AS (SELECT quantile_cont(CAST(recency_ts AS DOUBLE), [0.2, 0.4, 0.6, 0.8]) AS rb, quantile_cont(CAST(frequency AS DOUBLE), [0.2, 0.4, 0.6, 0.8]) AS fb, quantile_cont(CAST(monetary AS DOUBLE), [0.2, 0.4, 0.6, 0.8]) AS mb FROM rfm) SELECT user_id, recency_ts, frequency, monetary, CAST(1 + len(list_filter(b.rb, x -> CAST(recency_ts AS DOUBLE) > x)) AS INT) AS recency_ts_score, CAST(1 + len(list_filter(b.fb, x -> CAST(frequency AS DOUBLE) > x)) AS INT) AS frequency_score, CAST(1 + len(list_filter(b.mb, x -> CAST(monetary AS DOUBLE) > x)) AS INT) AS monetary_score FROM rfm CROSS JOIN b""",
        "q_ab_test": """WITH ev AS (SELECT event_type, value, CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) % 10000 < 5000 AS in_a FROM events), a AS (SELECT event_type, COUNT(value) FILTER (WHERE in_a) AS n_a, AVG(value) FILTER (WHERE in_a) AS ma, VAR_SAMP(value) FILTER (WHERE in_a) AS va, COUNT(value) FILTER (WHERE NOT in_a) AS n_b, AVG(value) FILTER (WHERE NOT in_a) AS mb, VAR_SAMP(value) FILTER (WHERE NOT in_a) AS vb FROM ev GROUP BY event_type) SELECT event_type, n_a, n_b, ROUND(ma - mb, 6) AS mean_diff, ROUND((ma - mb) / sqrt(va / n_a + vb / n_b), 4) AS t_welch FROM a""",
        "q_benford": """WITH o AS (SELECT o_totalprice FROM orders WHERE o_totalprice > 0), t AS (SELECT COUNT(*) AS total FROM o) SELECT CAST(substr(CAST(o_totalprice AS VARCHAR), 1, 1) AS INT) AS digit, COUNT(*) AS n, ROUND(COUNT(*) / (SELECT CAST(total AS DOUBLE) FROM t), 6) AS freq, ROUND(log10(1 + 1.0 / CAST(substr(CAST(o_totalprice AS VARCHAR), 1, 1) AS INT)), 6) AS benford FROM o GROUP BY 1""",
        "q_gini": """WITH c AS (SELECT c_mktsegment, c_acctbal + 1000.0 AS x, c_custkey FROM customer), r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY x, c_custkey) AS i FROM c) SELECT c_mktsegment, COUNT(*) AS n, ROUND(2.0 * SUM(i * x) / (COUNT(*) * SUM(x)) - (COUNT(*) + 1.0) / COUNT(*), 6) AS gini FROM r GROUP BY c_mktsegment""",
        "q_corr_matrix": """SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b, ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr FROM lineitem UNION ALL SELECT 'l_quantity' AS col_a, 'l_discount' AS col_b, ROUND(CORR(l_quantity, l_discount), 6) AS corr FROM lineitem UNION ALL SELECT 'l_quantity' AS col_a, 'l_tax' AS col_b, ROUND(CORR(l_quantity, l_tax), 6) AS corr FROM lineitem UNION ALL SELECT 'l_extendedprice' AS col_a, 'l_discount' AS col_b, ROUND(CORR(l_extendedprice, l_discount), 6) AS corr FROM lineitem UNION ALL SELECT 'l_extendedprice' AS col_a, 'l_tax' AS col_b, ROUND(CORR(l_extendedprice, l_tax), 6) AS corr FROM lineitem UNION ALL SELECT 'l_discount' AS col_a, 'l_tax' AS col_b, ROUND(CORR(l_discount, l_tax), 6) AS corr FROM lineitem""",
        "q_attribution_linear": """WITH ev AS (SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS t, event_type FROM events), v AS (SELECT user_id, event_id AS view_id, t AS vt FROM ev WHERE event_type = 'view'), b AS (SELECT user_id, event_id AS buy_id, t AS bt FROM ev WHERE event_type = 'purchase'), p AS (SELECT v.view_id, b.buy_id FROM v JOIN b USING (user_id) WHERE v.vt <= b.bt AND v.vt > b.bt - 86400), c AS (SELECT view_id, 1.0 / COUNT(*) OVER (PARTITION BY buy_id) AS credit FROM p) SELECT view_id, ROUND(SUM(credit), 6) AS total_credit FROM c GROUP BY view_id""",
        "q_mode": """WITH c AS (SELECT l_returnflag, l_quantity, COUNT(*) AS n FROM lineitem GROUP BY 1, 2) SELECT l_returnflag, l_quantity AS mode_qty, n FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY n DESC, l_quantity ASC) AS rk FROM c) WHERE rk = 1""",
        "q_paths": """WITH ev AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS t, event_id, event_type FROM events), g AS (SELECT *, CASE WHEN t - LAG(t) OVER w IS NULL OR t - LAG(t) OVER w > 1800 THEN 1 ELSE 0 END AS ns FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)), s AS (SELECT *, SUM(ns) OVER (PARTITION BY user_id ORDER BY t, event_id ROWS UNBOUNDED PRECEDING) AS sess_id FROM g), p AS (SELECT user_id, sess_id, array_to_string((list(event_type ORDER BY t, event_id))[1:5], '>') AS path FROM s GROUP BY 1, 2) SELECT path, COUNT(*) AS n_sessions FROM p GROUP BY path ORDER BY n_sessions DESC, path ASC LIMIT 20""",
        "q_skyline": """WITH o AS (SELECT o_orderkey, o_orderpriority, CAST(floor(epoch(o_orderdate)) AS BIGINT) AS d, o_totalprice FROM orders), m AS (SELECT *, MAX(o_totalprice) OVER (PARTITION BY o_orderpriority ORDER BY d RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm FROM o) SELECT o_orderkey, o_orderpriority, d, o_totalprice FROM m WHERE pm IS NULL OR o_totalprice > pm""",
        # gram strings in DuckDB ≡ xxhash64 grams in Spark for equality
        # semantics (the documented contamination-oracle equivalence);
        # equal-length intervals merge by min(n, pos - lag(pos))
        "q_repeated_spans": (
            "WITH toks AS (SELECT doc_id AS id, list_filter("
            "string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t "
            "FROM documents), "
            "base AS (SELECT id, len(t) AS n_tok, t FROM toks WHERE len(t) > 0), "
            "sh AS (SELECT id, u.pos AS pos, u.g AS g FROM (SELECT id, "
            "unnest(list_transform(range(1, greatest(len(t) - 7, 1) + 1), "
            "i -> struct_pack(pos := i - 1, g := array_to_string(t[i:i+7], ' ')"
            "))) AS u FROM base)), "
            "dup AS (SELECT g FROM sh GROUP BY g HAVING COUNT(*) >= 2), "
            "hits AS (SELECT id, pos FROM sh JOIN dup USING (g)), "
            "per_hit AS (SELECT id, "
            "CASE WHEN LAG(pos) OVER (PARTITION BY id ORDER BY pos) IS NULL "
            "THEN NULL ELSE LEAST(8, pos - LAG(pos) OVER "
            "(PARTITION BY id ORDER BY pos)) END AS cov, "
            "CASE WHEN pos - LAG(pos) OVER (PARTITION BY id ORDER BY pos) > 8 "
            "THEN 1 ELSE 0 END AS brk FROM hits), "
            "agg AS (SELECT id, COALESCE(SUM(cov), 0) + 8 AS raw_cov, "
            "CAST(COALESCE(SUM(brk), 0) + 1 AS INTEGER) AS n_spans "
            "FROM per_hit GROUP BY id) "
            "SELECT base.id AS doc_id, CAST(n_tok AS BIGINT) AS n_tokens, "
            "CAST(LEAST(COALESCE(raw_cov, 0), n_tok) AS BIGINT) AS dup_tokens, "
            "COALESCE(n_spans, 0) AS n_spans, "
            "ROUND(LEAST(COALESCE(raw_cov, 0), n_tok) / CAST(n_tok AS DOUBLE), 6) "
            "AS dup_frac "
            "FROM base LEFT JOIN agg ON base.id = agg.id"
        ),
        "q_grouping_sets": (
            "WITH j AS (SELECT n_name, EXTRACT(year FROM o_orderdate) "
            "AS o_year, o_totalprice FROM orders "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey) "
            "SELECT n_name, CAST(o_year AS INTEGER) AS o_year, "
            "ROUND(SUM(o_totalprice), 2) AS revenue, "
            "CAST(COUNT(*) AS BIGINT) AS n_orders, "
            "CAST(GROUPING(n_name) * 2 + GROUPING(o_year) AS INTEGER) AS gid "
            "FROM j GROUP BY GROUPING SETS ((n_name, o_year), (o_year), ())"
        ),
        "q_vocab_coverage": (
            "WITH base AS (SELECT doc_id, source, list_filter("
            "string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') "
            "AS toks FROM documents), "
            "tdf AS (SELECT term, COUNT(*) AS df FROM (SELECT doc_id, "
            "unnest(list_distinct(toks)) AS term FROM base) GROUP BY term), "
            "voc AS (SELECT list(term) AS v FROM (SELECT term FROM tdf "
            "ORDER BY df DESC, term LIMIT 100)), "
            "pd AS (SELECT source, len(toks) AS n_tok, "
            "len(list_filter(toks, t -> NOT list_contains(v, t))) "
            "AS n_oov FROM base CROSS JOIN voc) "
            "SELECT source, CAST(COUNT(n_tok) AS BIGINT) AS n_docs, "
            "CAST(COALESCE(SUM(n_tok), 0) AS BIGINT) AS total_tokens, "
            "CAST(COALESCE(SUM(n_oov), 0) AS BIGINT) AS oov_tokens, "
            "ROUND(SUM(n_oov) / CAST(SUM(n_tok) AS DOUBLE), 6) AS oov_rate "
            "FROM pd GROUP BY source ORDER BY source"
        ),
        "q_bm25_search": (
            _bm25_scored_cte(_BM25_TERMS)
            + " SELECT doc_id, CAST(n_terms AS INTEGER) AS n_terms, "
            "ROUND(raw, 6) AS bm25 FROM sc "
            "ORDER BY ROUND(raw, 6) DESC, doc_id LIMIT 10"
        ),
        "q_hybrid_retrieval": (
            _bm25_scored_cte(_BM25_TERMS)
            + ", lex AS (SELECT doc_id AS id, ROW_NUMBER() OVER "
            "(ORDER BY ROUND(raw, 6) DESC, doc_id) AS rank FROM sc "
            "QUALIFY rank <= 20), "
            "dsim AS (SELECT vec_id AS id, "
            "ROUND(list_cosine_similarity(e.embedding, "
            "(SELECT embedding FROM embeddings WHERE vec_id = 1)), 6) AS sim "
            "FROM embeddings e), "
            "dense AS (SELECT id, ROW_NUMBER() OVER "
            "(ORDER BY sim DESC, id) AS rank FROM dsim QUALIFY rank <= 20), "
            "u AS (SELECT id, 1.0 / (60 + rank) AS w FROM lex "
            "UNION ALL SELECT id, 1.0 / (60 + rank) AS w FROM dense) "
            "SELECT id AS doc_id, CAST(COUNT(*) AS INTEGER) AS n_lists, "
            "ROUND(SUM(w), 6) AS rrf FROM u GROUP BY id"
        ),
        "q_jaccard_prefix": """WITH tk AS (SELECT doc_id AS id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t FROM documents), toks AS (SELECT id, unnest(list_distinct(list_transform(range(1, greatest(len(t) - 1, 1) + 1), i -> array_to_string(t[i:i+1], ' ')))) AS tok FROM tk WHERE len(t) > 0), sizes AS (SELECT id, COUNT(*) AS sz FROM toks GROUP BY id), cand AS (SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_inter FROM toks a JOIN toks b ON a.tok = b.tok AND a.id < b.id GROUP BY 1, 2) SELECT id_a, id_b, ROUND(n_inter / CAST(sa.sz + sb.sz - n_inter AS DOUBLE), 6) AS jaccard FROM cand JOIN sizes sa ON id_a = sa.id JOIN sizes sb ON id_b = sb.id WHERE n_inter / CAST(sa.sz + sb.sz - n_inter AS DOUBLE) >= 0.8""",
        "q_triangles": """WITH e AS (SELECT DISTINCT LEAST(u, v) AS a, GREATEST(u, v) AS b FROM (SELECT l_orderkey % 500 AS u, l_partkey % 500 AS v FROM lineitem) WHERE u <> v) SELECT COUNT(*) AS n_triangles FROM e e1 JOIN e e2 ON e1.b = e2.a JOIN e e3 ON e1.a = e3.a AND e2.b = e3.b""",
        "q_incremental_agg": """SELECT o_custkey, COUNT(o_totalprice) AS n, ROUND(SUM(o_totalprice), 4) AS sum_v, MIN(o_totalprice) AS min_v, MAX(o_totalprice) AS max_v FROM orders GROUP BY o_custkey""",
        "q_lm_score": """WITH toks AS (SELECT doc_id AS id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t FROM documents), occ AS (SELECT id, t[i] AS w1, t[i + 1] AS w2 FROM toks, unnest(range(1, len(t))) AS u(i) WHERE len(t) >= 2), big AS (SELECT w1, w2, COUNT(*) AS c2 FROM occ GROUP BY 1, 2), uni AS (SELECT w1, COUNT(*) AS c1 FROM occ GROUP BY 1), v AS (SELECT COUNT(*) AS v FROM uni) SELECT id AS doc_id, COUNT(*) AS n_bigrams, ROUND(AVG(ln((c2 + 1.0) / (c1 + v.v))), 6) AS avg_logp FROM occ JOIN big USING (w1, w2) JOIN uni USING (w1) CROSS JOIN v GROUP BY id""",
        # trigram stupid-backoff perplexity: counts train on the even-
        # doc_id half, every doc scores; the CASE chain and the exact
        # double association ((x·1.0)/y, (0.4·x)/y, ((0.4·0.4)·x)/y)
        # mirror the Spark expressions token-for-token
        "q_lm_perplexity": """WITH toks AS (SELECT doc_id AS id, doc_id % 2 = 0 AS train, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t FROM documents), occ AS (SELECT id, train, t[i] AS w1, t[i + 1] AS w2, t[i + 2] AS w3 FROM toks, unnest(range(1, len(t) - 1)) AS u(i) WHERE len(t) >= 3), uni AS (SELECT t[i] AS w, COUNT(*) AS c1 FROM toks, unnest(range(1, len(t) + 1)) AS u(i) WHERE train GROUP BY 1), big AS (SELECT t[i] AS a, t[i + 1] AS b, COUNT(*) AS c2 FROM toks, unnest(range(1, len(t))) AS u(i) WHERE train AND len(t) >= 2 GROUP BY 1, 2), tri AS (SELECT w1, w2, w3, COUNT(*) AS c3 FROM occ WHERE train GROUP BY 1, 2, 3), nv AS (SELECT (SELECT COALESCE(SUM(c1), 0) FROM uni) + (SELECT COUNT(*) FROM uni) AS npv), scored AS (SELECT o.id, CASE WHEN tri.c3 IS NOT NULL THEN ln(tri.c3 * 1.0 / bc.c2) WHEN bb.c2 IS NOT NULL THEN ln(0.4 * bb.c2 / uc.c1) ELSE ln(0.4 * 0.4 * (COALESCE(ut.c1, 0) + 1.0) / nv.npv) END AS lp FROM occ o LEFT JOIN tri ON o.w1 = tri.w1 AND o.w2 = tri.w2 AND o.w3 = tri.w3 LEFT JOIN big bc ON o.w1 = bc.a AND o.w2 = bc.b LEFT JOIN big bb ON o.w2 = bb.a AND o.w3 = bb.b LEFT JOIN uni uc ON o.w2 = uc.w LEFT JOIN uni ut ON o.w3 = ut.w CROSS JOIN nv) SELECT id AS doc_id, COUNT(*) AS n_trigrams, ROUND(AVG(lp), 6) AS avg_logp, ROUND(exp(-ROUND(AVG(lp), 6)), 6) AS perplexity FROM scored GROUP BY id""",
        "q_rolling": """SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, COUNT(*) OVER w AS n_1h, ROUND(SUM(value) OVER w, 4) AS sum_1h FROM events WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT) RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)""",
        "q_semantic_dedup": (
            "WITH b AS (SELECT vec_id, embedding, "
            "list_aggregate(list_transform(embedding[1:8], "
            "x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), 'string_agg', '') "
            "AS bucket FROM embeddings WHERE embedding IS NOT NULL), "
            "r AS (SELECT bucket, MIN(vec_id) AS rep_id FROM b GROUP BY bucket) "
            "SELECT b.vec_id AS id, b.bucket, r.rep_id, "
            "ROUND(list_cosine_similarity(b.embedding, rb.embedding), 4) AS sim, "
            "(b.vec_id <> r.rep_id AND "
            "ROUND(list_cosine_similarity(b.embedding, rb.embedding), 4) >= 0.8) "
            "AS is_dup "
            "FROM b JOIN r ON b.bucket = r.bucket "
            "JOIN b rb ON rb.vec_id = r.rep_id"
        ),
        # prototypicality: centroid from BIGINT-exact quantized sums,
        # list_cosine_similarity over DOUBLE[] == the Spark fold, rank
        # on the ROUNDED score with id tie-break (k-center rule)
        "q_prototypicality": (
            "WITH b AS (SELECT vec_id AS id, "
            "list_aggregate(list_transform(embedding[1:8], "
            "x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), "
            "'string_agg', '') AS bucket, "
            "list_transform(embedding, x -> CAST(FLOOR("
            "CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS qv "
            "FROM embeddings WHERE embedding IS NOT NULL), "
            "e AS (SELECT bucket, i AS pos, qv[i] AS val "
            "FROM b, unnest(range(1, len(qv) + 1)) t(i)), "
            "d AS (SELECT bucket, pos, CAST(SUM(val) AS BIGINT) AS s, "
            "CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY 1, 2), "
            "c0 AS (SELECT bucket, MAX(n) AS n_bucket, "
            "list(struct_pack(pos := pos, s := s) ORDER BY pos) "
            "AS ps FROM d GROUP BY bucket), "
            "c AS (SELECT bucket, n_bucket, "
            "list_transform(ps, p -> p.s / n_bucket) AS cent "
            "FROM c0), "
            "sc AS (SELECT b.id, b.bucket, c.n_bucket, "
            "ROUND(list_cosine_similarity(CAST(b.qv AS DOUBLE[]), "
            "c.cent), 6) AS proto_score FROM b JOIN c USING (bucket)), "
            "r AS (SELECT *, row_number() OVER (PARTITION BY bucket "
            "ORDER BY proto_score DESC, id) AS proto_rank FROM sc) "
            "SELECT id, bucket, n_bucket, proto_score, proto_rank, "
            "proto_rank <= (n_bucket * 1 + 4 - 1) // 4 AS is_prototype "
            "FROM r"
        ),
        # UniMax: every breakpoint comparison and prefix sum is BIGINT
        # math; alloc/weight/epochs are the only doubles (one division
        # each with identical operands on both engines)
        "q_unimax_weights": (
            "WITH c AS (SELECT source, CAST(SUM(len(list_filter("
            "string_split_regex(lower(text), '[^a-z0-9]+'), "
            "x -> x <> ''))) AS BIGINT) AS n FROM documents "
            "WHERE text IS NOT NULL GROUP BY source), "
            "s AS (SELECT source, n, "
            "CAST(COUNT(*) OVER () AS BIGINT) AS L, "
            "CAST(SUM(n) OVER () AS BIGINT) AS T, "
            "row_number() OVER (ORDER BY n, source) AS i, "
            "CAST(COALESCE(SUM(n) OVER (ORDER BY n, source "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
            "AS BIGINT) AS pre FROM c WHERE n > 0), "
            "m AS (SELECT source, n, L, (T * 1) // 2 AS B, "
            "(2 * n * (L - i + 1) <= (T * 1) // 2 - 2 * pre) "
            "AS capped FROM s), "
            "r AS (SELECT *, CAST(SUM(CASE WHEN capped THEN 1 ELSE 0 "
            "END) OVER () AS BIGINT) AS k, "
            "CAST(SUM(CASE WHEN capped THEN n ELSE 0 END) OVER () "
            "AS BIGINT) AS S FROM m), "
            "f AS (SELECT source, n, capped, B, "
            "CASE WHEN capped THEN CAST(2 * n AS DOUBLE) "
            "ELSE CAST(B - 2 * S AS DOUBLE) / GREATEST(L - k, 1) END AS alloc "
            "FROM r) "
            "SELECT source, n AS n_tokens, capped, alloc, "
            "CASE WHEN B > 0 THEN alloc / B ELSE 0.0 END AS weight, "
            "alloc / n AS epochs FROM f"
        ),
        # clustering coefficient: same canonical wedge joins as
        # q_triangles, corners exploded, integer counts, one division
        "q_clustering_coef": (
            "WITH e AS (SELECT DISTINCT LEAST(u, v) AS a, "
            "GREATEST(u, v) AS b FROM (SELECT l_orderkey % 500 AS u, "
            "l_partkey % 500 AS v FROM lineitem) "
            "WHERE u IS NOT NULL AND v IS NOT NULL AND u <> v), "
            "deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS degree "
            "FROM (SELECT a AS node FROM e "
            "UNION ALL SELECT b FROM e) GROUP BY node), "
            "tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z "
            "FROM e e1 JOIN e e2 ON e1.b = e2.a "
            "JOIN e e3 ON e1.a = e3.a AND e2.b = e3.b), "
            "corners AS (SELECT unnest([x, y, z]) AS node FROM tri), "
            "tc AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles "
            "FROM corners GROUP BY node) "
            "SELECT deg.node, degree, "
            "CAST(COALESCE(triangles, 0) AS BIGINT) AS triangles, "
            "CASE WHEN degree >= 2 THEN "
            "CAST(2 * COALESCE(triangles, 0) AS DOUBLE) / "
            "(degree * (degree - 1)) ELSE 0.0 END AS clustering_coef "
            "FROM deg LEFT JOIN tc ON deg.node = tc.node"
        ),
        # Benford: integer-cent first digits, in-row expectations and
        # the chi-square fold in digit order (log10 parity verified)
        "q_benford_audit": (
            "WITH b AS (SELECT CAST(FLOOR(ABS(l_extendedprice) * 100 "
            "+ 0.5) AS BIGINT) AS n FROM lineitem "
            "WHERE l_extendedprice IS NOT NULL), "
            "c AS (SELECT CAST(substr(CAST(n AS VARCHAR), 1, 1) AS INT) "
            "AS digit, CAST(COUNT(*) AS BIGINT) AS obs FROM b "
            "WHERE n > 0 GROUP BY 1), "
            "o AS (SELECT list(struct_pack(digit := digit, obs := obs) "
            "ORDER BY digit) AS a FROM c), "
            "s AS (SELECT a, list_reduce(list_prepend(CAST(0 AS BIGINT), "
            "list_transform(a, x -> x.obs)), (p, q) -> p + q) AS N "
            "FROM o), "
            "rws AS (SELECT N, list_transform(range(1, 10), "
            "d -> struct_pack(digit := d, "
            "n_obs := COALESCE(list_filter(a, x -> x.digit = d)[1].obs, "
            "0), p := log10(1.0 + 1.0 / d), "
            "ex := N * log10(1.0 + 1.0 / d))) AS rr FROM s), "
            "t AS (SELECT N, rr, list_reduce(list_prepend(0.0, "
            "list_transform(rr, r -> (CAST(r.n_obs AS DOUBLE) - r.ex) * "
            "(CAST(r.n_obs AS DOUBLE) - r.ex) / r.ex)), "
            "(p, q) -> p + q) AS chi2_total FROM rws), "
            "u AS (SELECT N, chi2_total, unnest(rr) AS r FROM t) "
            "SELECT CAST(r.digit AS INT) AS digit, "
            "CAST(r.n_obs AS BIGINT) AS n_obs, r.n_obs / N AS frac, "
            "r.p AS benford_p, r.n_obs / N - r.p AS deviation, "
            "(CAST(r.n_obs AS DOUBLE) - r.ex) * "
            "(CAST(r.n_obs AS DOUBLE) - r.ex) / r.ex AS chi2_contrib, "
            "chi2_total, N AS n_total FROM u"
        ),
        # distribution windows: ANSI-identical definitions; the
        # orderkey tie-break makes the total order (and thus ntile
        # bucket boundaries) deterministic
        "q_window_dist": (
            "SELECT o_orderpriority, o_orderkey, o_totalprice, "
            "CAST(ntile(4) OVER w AS INT) AS quartile, "
            "percent_rank() OVER w AS pct_rank, "
            "cume_dist() OVER w AS cume FROM orders "
            "WINDOW w AS (PARTITION BY o_orderpriority "
            "ORDER BY o_totalprice ASC, o_orderkey ASC)"
        ),
        # ROUGE-2: clipped bigram overlap, integer sums, the same
        # three guarded divisions with Spark's parenthesization
        "q_rouge_n": (
            _MT_PAIRS_SQL
            + ", c AS (SELECT doc_id AS id, list_filter("
            "string_split_regex(lower(candidate), '[^a-z0-9]+'), "
            "x -> x <> '') AS t FROM mt), "
            "r0 AS (SELECT doc_id AS id, list_filter("
            "string_split_regex(lower(reference), '[^a-z0-9]+'), "
            "x -> x <> '') AS t FROM mt), "
            "cg AS (SELECT id, unnest(list_transform(range(1, len(t)), "
            "i -> t[i] || ' ' || t[i + 1])) AS g FROM c), "
            "rg AS (SELECT id, unnest(list_transform(range(1, len(t)), "
            "i -> t[i] || ' ' || t[i + 1])) AS g FROM r0), "
            "cc AS (SELECT id, g, CAST(COUNT(*) AS BIGINT) AS cc "
            "FROM cg GROUP BY 1, 2), "
            "rc AS (SELECT id, g, CAST(COUNT(*) AS BIGINT) AS rc "
            "FROM rg GROUP BY 1, 2), "
            "ov AS (SELECT id, CAST(SUM(LEAST(cc, rc)) AS BIGINT) "
            "AS overlap FROM cc JOIN rc USING (id, g) GROUP BY id), "
            "ct AS (SELECT id, CAST(SUM(cc) AS BIGINT) AS cand_ngrams "
            "FROM cc GROUP BY id), "
            "rt AS (SELECT id, CAST(SUM(rc) AS BIGINT) AS ref_ngrams "
            "FROM rc GROUP BY id), "
            "ids AS (SELECT DISTINCT doc_id AS id FROM mt), "
            "j AS (SELECT ids.id, COALESCE(cand_ngrams, 0) "
            "AS cand_ngrams, COALESCE(ref_ngrams, 0) AS ref_ngrams, "
            "COALESCE(overlap, 0) AS overlap FROM ids "
            "LEFT JOIN ct USING (id) LEFT JOIN rt USING (id) "
            "LEFT JOIN ov USING (id)) "
            "SELECT id AS doc_id, cand_ngrams, ref_ngrams, overlap, "
            "CASE WHEN cand_ngrams > 0 THEN overlap / cand_ngrams END "
            "AS precision, "
            "CASE WHEN ref_ngrams > 0 THEN overlap / ref_ngrams END "
            "AS recall, "
            "CASE WHEN cand_ngrams > 0 AND ref_ngrams > 0 AND "
            "overlap > 0 THEN 2.0 * (overlap / cand_ngrams) * "
            "(overlap / ref_ngrams) / (overlap / cand_ngrams + "
            "overlap / ref_ngrams) END AS f1 FROM j"
        ),
        # corpus BLEU-2: six exact integers -> fixed ln/exp sequence;
        # any zero precision routes to bleu = 0.0 (no smoothing)
        "q_corpus_bleu": (
            _MT_PAIRS_SQL
            + ", c AS (SELECT doc_id AS id, list_filter("
            "string_split_regex(lower(candidate), '[^a-z0-9]+'), "
            "x -> x <> '') AS t FROM mt), "
            "r0 AS (SELECT doc_id AS id, list_filter("
            "string_split_regex(lower(reference), '[^a-z0-9]+'), "
            "x -> x <> '') AS t FROM mt), "
            "lens AS (SELECT CAST(SUM(lc) AS BIGINT) AS cand_len, "
            "CAST(SUM(lr) AS BIGINT) AS ref_len FROM "
            "(SELECT c.id, len(c.t) AS lc, len(r0.t) AS lr "
            "FROM c JOIN r0 ON c.id = r0.id)), "
            "c1 AS (SELECT id, g, CAST(COUNT(*) AS BIGINT) AS cc FROM "
            "(SELECT id, unnest(t) AS g FROM c) GROUP BY 1, 2), "
            "r1 AS (SELECT id, g, CAST(COUNT(*) AS BIGINT) AS rc FROM "
            "(SELECT id, unnest(t) AS g FROM r0) GROUP BY 1, 2), "
            "m1t AS (SELECT CAST(COALESCE(SUM(LEAST(cc, rc)), 0) "
            "AS BIGINT) AS m1 FROM c1 JOIN r1 USING (id, g)), "
            "t1t AS (SELECT CAST(COALESCE(SUM(cc), 0) AS BIGINT) AS t1 "
            "FROM c1), "
            "c2 AS (SELECT id, g, CAST(COUNT(*) AS BIGINT) AS cc FROM "
            "(SELECT id, unnest(list_transform(range(1, len(t)), "
            "i -> t[i] || ' ' || t[i + 1])) AS g FROM c) GROUP BY 1, 2), "
            "r2 AS (SELECT id, g, CAST(COUNT(*) AS BIGINT) AS rc FROM "
            "(SELECT id, unnest(list_transform(range(1, len(t)), "
            "i -> t[i] || ' ' || t[i + 1])) AS g FROM r0) GROUP BY 1, 2), "
            "m2t AS (SELECT CAST(COALESCE(SUM(LEAST(cc, rc)), 0) "
            "AS BIGINT) AS m2 FROM c2 JOIN r2 USING (id, g)), "
            "t2t AS (SELECT CAST(COALESCE(SUM(cc), 0) AS BIGINT) AS t2 "
            "FROM c2), "
            "f AS (SELECT cand_len, ref_len, m1, t1, m2, t2, "
            "CASE WHEN cand_len >= ref_len THEN 1.0 ELSE "
            "exp(1.0 - CAST(ref_len AS DOUBLE) / "
            "CAST(cand_len AS DOUBLE)) END AS bp "
            "FROM lens, m1t, t1t, m2t, t2t) "
            "SELECT cand_len, ref_len, bp, "
            "CASE WHEN t1 > 0 THEN m1 / t1 END AS p1, "
            "CASE WHEN t2 > 0 THEN m2 / t2 END AS p2, "
            "CASE WHEN m1 = 0 OR t1 = 0 OR m2 = 0 OR t2 = 0 THEN 0.0 "
            "ELSE bp * exp((ln(m1 / t1) + ln(m2 / t2)) / 2.0) END "
            "AS bleu FROM f"
        ),
        # calibration: quantized-integer Brier/ECE sums (order-free),
        # bin census collected in bin order, same final divisions
        "q_calibration_audit": (
            "WITH d AS (SELECT "
            "CAST(CONCAT('0x', substr(md5(doc_id || '#cal'), 1, 13)) "
            "AS BIGINT) % 1001 AS c1001, "
            "CAST(CONCAT('0x', substr(md5(doc_id || '#lab'), 1, 13)) "
            "AS BIGINT) % 1000 AS lv FROM documents), "
            "q AS (SELECT CAST(FLOOR((c1001 / 1000.0) * 1000 + 0.5) "
            "AS BIGINT) AS pm, "
            "CASE WHEN lv < c1001 THEN CAST(1 AS BIGINT) "
            "ELSE CAST(0 AS BIGINT) END AS y FROM d), "
            "c AS (SELECT LEAST((pm * 10) // 1000, 9) AS bin, "
            "CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(pm) AS BIGINT) AS sp, "
            "CAST(SUM(y) AS BIGINT) AS sy, "
            "CAST(SUM((pm - y * 1000) * (pm - y * 1000)) AS BIGINT) "
            "AS sq FROM q GROUP BY 1), "
            "o AS (SELECT list(struct_pack(bin := bin, n := n, "
            "sp := sp, sy := sy, sq := sq) ORDER BY bin) AS a FROM c), "
            "s AS (SELECT a, "
            "list_reduce(list_prepend(CAST(0 AS BIGINT), "
            "list_transform(a, x -> x.n)), (p, q) -> p + q) AS N, "
            "list_reduce(list_prepend(CAST(0 AS BIGINT), "
            "list_transform(a, x -> x.sq)), (p, q) -> p + q) AS SQ, "
            "list_reduce(list_prepend(CAST(0 AS BIGINT), "
            "list_transform(a, x -> ABS(x.sy * 1000 - x.sp))), "
            "(p, q) -> p + q) AS ED FROM o), "
            "u AS (SELECT N, "
            "CAST(SQ AS DOUBLE) / (N * 1000 * 1000) AS brier, "
            "CAST(ED AS DOUBLE) / (N * 1000) AS ece, "
            "unnest(a) AS r FROM s) "
            "SELECT r.bin AS bin, r.n AS n_obs, "
            "r.sp / (r.n * 1000) AS mean_prob, r.sy / r.n AS frac_pos, "
            "CAST(r.sy * 1000 - r.sp AS DOUBLE) / (r.n * 1000) AS gap, "
            "ece, brier, N AS n_total FROM u"
        ),
        # Spearman: doubled average ranks are integers (2*rank_lo +
        # ties - 1), BIGINT sums, one closed form
        "q_spearman_corr": (
            "WITH b AS (SELECT l_returnflag AS g, l_quantity AS x, "
            "l_extendedprice AS y FROM lineitem "
            "WHERE l_quantity IS NOT NULL "
            "AND l_extendedprice IS NOT NULL), "
            "r AS (SELECT g, CAST(2 * rank() OVER (PARTITION BY g "
            "ORDER BY x) + COUNT(*) OVER (PARTITION BY g, x) - 1 "
            "AS BIGINT) AS rx, "
            "CAST(2 * rank() OVER (PARTITION BY g ORDER BY y) + "
            "COUNT(*) OVER (PARTITION BY g, y) - 1 AS BIGINT) AS ry "
            "FROM b), "
            "a AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(rx) AS BIGINT) AS sx, "
            "CAST(SUM(ry) AS BIGINT) AS sy, "
            "CAST(SUM(rx * ry) AS BIGINT) AS sxy, "
            "CAST(SUM(rx * rx) AS BIGINT) AS sxx, "
            "CAST(SUM(ry * ry) AS BIGINT) AS syy FROM r GROUP BY g), "
            "d AS (SELECT g, n, CAST(n AS DOUBLE) AS dn, "
            "CAST(sx AS DOUBLE) AS dx, CAST(sy AS DOUBLE) AS dy, "
            "CAST(sxy AS DOUBLE) AS dxy, CAST(sxx AS DOUBLE) AS dxx, "
            "CAST(syy AS DOUBLE) AS dyy FROM a), "
            "e AS (SELECT g, n, dn * dxy - dx * dy AS cov_n, "
            "dn * dxx - dx * dx AS vx_n, dn * dyy - dy * dy AS vy_n "
            "FROM d) "
            "SELECT g AS l_returnflag, n, "
            "CASE WHEN vx_n > 0 AND vy_n > 0 THEN "
            "cov_n / (sqrt(vx_n) * sqrt(vy_n)) END AS spearman_rho "
            "FROM e"
        ),
        # Neyman: cent-quantized integer moments, in-row normalizer
        # fold in stratum order, floor(x + 0.5) integer allocations
        "q_neyman_allocation": (
            "WITH b AS (SELECT c_mktsegment AS g, "
            "CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS q "
            "FROM customer WHERE c_acctbal IS NOT NULL), "
            "p AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS np, "
            "CAST(SUM(q) AS BIGINT) AS s, "
            "CAST(SUM(q * q) AS BIGINT) AS qq FROM b GROUP BY g), "
            "sdt AS (SELECT g, np, "
            "sqrt(CAST(qq * np - s * s AS DOUBLE) / (np * np)) / 100.0 "
            "AS sd FROM p), "
            "o AS (SELECT list(struct_pack(g := g, np := np, sd := sd) "
            "ORDER BY g) AS a FROM sdt), "
            "s2 AS (SELECT a, list_reduce(list_prepend(0.0, "
            "list_transform(a, x -> x.np * x.sd)), (p, q) -> p + q) "
            "AS tot FROM o), "
            "u AS (SELECT tot, unnest(a) AS r FROM s2), "
            "v AS (SELECT r.g AS g, r.np AS np, r.sd AS sd, "
            "CASE WHEN tot > 0 THEN r.np * r.sd / tot ELSE 0.0 END "
            "AS w FROM u) "
            "SELECT g AS c_mktsegment, np AS n_pop, sd AS stratum_sd, "
            "w AS weight, w * 1000.0 AS alloc_frac, "
            "CAST(FLOOR(w * 1000.0 + 0.5) AS BIGINT) AS alloc FROM v"
        ),
        # k-means: full-trajectory replay (seeds, rounded argmin with
        # index tie-break, integer centroid sums), MATERIALIZED rounds
        "q_kmeans_fit": _kmeans_sql(k=4, n_iters=2),
        # ranking metrics: ordered list folds (rank order / ideal
        # order / hit order), log2 parity, same guarded divisions
        "q_ranking_metrics": (
            "WITH c AS (SELECT doc_id AS query_id, g.g AS rank, "
            "CAST(CONCAT('0x', substr(md5(doc_id || '#' || g.g "
            "|| '#rel'), 1, 13)) AS BIGINT) % 4 AS rel "
            "FROM documents, generate_series(1, 8) g(g)), "
            "g2 AS (SELECT query_id, list(struct_pack(rk := rank, "
            "rel := rel) ORDER BY rank, rel) AS a, "
            "CAST(COUNT(*) AS BIGINT) AS n_cands FROM c "
            "GROUP BY query_id), "
            "m AS (SELECT query_id, n_cands, "
            "CAST(len(list_filter(a, x -> x.rel > 0)) AS BIGINT) "
            "AS n_rel, "
            "list_reduce(list_prepend(0.0, list_transform("
            "list_filter(a, x -> x.rk <= 5), "
            "x -> CAST(x.rel AS DOUBLE) / "
            "log2(CAST(x.rk AS DOUBLE) + 1))), (p, q) -> p + q) "
            "AS dcg, "
            "list_reduce(list_prepend(0.0, list_transform("
            "list_reverse(list_sort(list_transform(a, "
            "x -> x.rel)))[1:5], (rel, i) -> CAST(rel AS DOUBLE) / "
            "log2(CAST(i AS DOUBLE) + 1))), (p, q) -> p + q) AS idcg, "
            "1.0 / list_filter(a, x -> x.rel > 0)[1].rk AS mrr, "
            "list_reduce(list_prepend(0.0, list_transform("
            "list_filter(a, x -> x.rel > 0), "
            "(x, j) -> CAST(j AS DOUBLE) / CAST(x.rk AS DOUBLE))), "
            "(p, q) -> p + q) AS aps FROM g2) "
            "SELECT query_id, n_cands, n_rel, dcg, idcg, "
            "CASE WHEN idcg > 0 THEN dcg / idcg ELSE 0.0 END AS ndcg, "
            "mrr, CASE WHEN n_rel > 0 THEN aps / n_rel END AS ap "
            "FROM m"
        ),
        # CUPED: BIGINT sufficient statistics, algebraic adjusted
        # variance (no per-unit double sums), same parenthesization
        "q_cuped_ab": (
            _AB_UNITS_SQL
            + ", q AS (SELECT arm, "
            "CAST(FLOOR(y * 100 + 0.5) AS BIGINT) AS qy, "
            "CAST(FLOOR(x * 100 + 0.5) AS BIGINT) AS qx FROM units "
            "WHERE y IS NOT NULL AND x IS NOT NULL "
            "AND arm IS NOT NULL), "
            "p AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(qy) AS BIGINT) AS sy, "
            "CAST(SUM(qx) AS BIGINT) AS sx, "
            "CAST(SUM(qy * qy) AS BIGINT) AS syy, "
            "CAST(SUM(qx * qx) AS BIGINT) AS sxx, "
            "CAST(SUM(qx * qy) AS BIGINT) AS sxy FROM q GROUP BY arm), "
            "o AS (SELECT list(struct_pack(arm := arm, n := n, "
            "sy := sy, sx := sx, syy := syy, sxx := sxx, sxy := sxy) "
            "ORDER BY arm) AS a FROM p), "
            "t AS (SELECT a, "
            "list_reduce(list_prepend(CAST(0 AS BIGINT), "
            "list_transform(a, r -> r.n)), (p, q) -> p + q) AS N, "
            "list_reduce(list_prepend(CAST(0 AS BIGINT), "
            "list_transform(a, r -> r.sx)), (p, q) -> p + q) AS gsx, "
            "list_reduce(list_prepend(CAST(0 AS BIGINT), "
            "list_transform(a, r -> r.sy)), (p, q) -> p + q) AS gsy, "
            "list_reduce(list_prepend(CAST(0 AS BIGINT), "
            "list_transform(a, r -> r.sxx)), (p, q) -> p + q) AS gsxx, "
            "list_reduce(list_prepend(CAST(0 AS BIGINT), "
            "list_transform(a, r -> r.sxy)), (p, q) -> p + q) AS gsxy "
            "FROM o), "
            "t2 AS (SELECT a, CASE WHEN "
            "CAST(gsxx * N - gsx * gsx AS DOUBLE) > 0 THEN "
            "CAST(gsxy * N - gsx * gsy AS DOUBLE) / "
            "CAST(gsxx * N - gsx * gsx AS DOUBLE) ELSE 0.0 END AS th, "
            "gsx / N AS mx FROM t), "
            "rws AS (SELECT th, list_transform(a, r -> struct_pack("
            "arm := r.arm, n_units := r.n, "
            "my := r.sy / r.n, "
            "mya := r.sy / r.n - th * (r.sx / r.n - mx), "
            "vy := CAST(r.syy * r.n - r.sy * r.sy AS DOUBLE) / "
            "(r.n * r.n), "
            "vya := CAST(r.syy * r.n - r.sy * r.sy AS DOUBLE) / "
            "(r.n * r.n) - 2.0 * th * "
            "(CAST(r.sxy * r.n - r.sx * r.sy AS DOUBLE) / (r.n * r.n)) "
            "+ th * th * "
            "(CAST(r.sxx * r.n - r.sx * r.sx AS DOUBLE) / (r.n * r.n))"
            ")) AS rr FROM t2), "
            "f AS (SELECT th, rr, rr[1] AS r1, rr[2] AS r2, "
            "len(rr) = 2 AS two FROM rws), "
            "g AS (SELECT th, rr, "
            "CASE WHEN two THEN r2.mya - r1.mya END AS lift, "
            "CASE WHEN two AND r2.vy / r2.n_units + r1.vy / r1.n_units > 0 THEN (r2.my - r1.my) / "
            "sqrt(r2.vy / r2.n_units + r1.vy / r1.n_units) END AS zr, "
            "CASE WHEN two AND r2.vya / r2.n_units + r1.vya / r1.n_units > 0 THEN (r2.mya - r1.mya) / "
            "sqrt(r2.vya / r2.n_units + r1.vya / r1.n_units) END AS za, "
            "CASE WHEN two AND r1.vy > 0 AND r2.vy > 0 THEN "
            "1.0 - (r1.vya + r2.vya) / (r1.vy + r2.vy) END AS vred "
            "FROM f), "
            "e AS (SELECT th, lift, zr, za, vred, unnest(rr) AS r "
            "FROM g) "
            "SELECT r.arm AS arm, r.n_units AS n_units, "
            "r.my / 100.0 AS mean_y, r.mya / 100.0 AS mean_y_adj, "
            "r.vy / (100.0 * 100.0) AS var_y, "
            "r.vya / (100.0 * 100.0) AS var_y_adj, "
            "th AS theta, vred AS var_reduction, "
            "lift / 100.0 AS lift_adj, zr AS z_raw, za AS z_adj FROM e"
        ),
        # SRM: integer census, uniform design fractions, chi2 folds
        # in arm order
        "q_srm_check": (
            _AB_UNITS_SQL
            + ", c AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS n "
            "FROM units WHERE arm IS NOT NULL GROUP BY arm), "
            "o AS (SELECT list(struct_pack(arm := arm, n := n) "
            "ORDER BY arm) AS a FROM c), "
            "t AS (SELECT a, "
            "list_reduce(list_prepend(CAST(0 AS BIGINT), "
            "list_transform(a, r -> r.n)), (p, q) -> p + q) AS N "
            "FROM o), "
            "rws AS (SELECT N, list_transform(a, r -> struct_pack("
            "arm := r.arm, n_obs := r.n, ef := 1.0 / len(a), "
            "en := N * (1.0 / len(a)))) AS rr FROM t), "
            "t2 AS (SELECT N, rr, list_reduce(list_prepend(0.0, "
            "list_transform(rr, r -> (CAST(r.n_obs AS DOUBLE) - r.en) "
            "* (CAST(r.n_obs AS DOUBLE) - r.en) / r.en)), "
            "(p, q) -> p + q) AS chi2_total FROM rws), "
            "e AS (SELECT N, chi2_total, unnest(rr) AS r FROM t2) "
            "SELECT r.arm AS arm, r.n_obs AS n_obs, "
            "r.ef AS expected_frac, r.en AS expected_n, "
            "(CAST(r.n_obs AS DOUBLE) - r.en) * "
            "(CAST(r.n_obs AS DOUBLE) - r.en) / r.en AS chi2_contrib, "
            "chi2_total, N AS n_total FROM e"
        ),
        # delta-method ratio metric: BIGINT moments, same fixed forms
        "q_ratio_metric": (
            _AB_UNITS_SQL
            + ", q AS (SELECT arm, "
            "CAST(FLOOR(y * 100 + 0.5) AS BIGINT) AS qn, "
            "CAST(FLOOR(x * 100 + 0.5) AS BIGINT) AS qd FROM units "
            "WHERE y IS NOT NULL AND x IS NOT NULL "
            "AND arm IS NOT NULL), "
            "p AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS n, "
            "CAST(SUM(qn) AS BIGINT) AS sn, "
            "CAST(SUM(qd) AS BIGINT) AS sd, "
            "CAST(SUM(qn * qn) AS BIGINT) AS snn, "
            "CAST(SUM(qd * qd) AS BIGINT) AS sdd, "
            "CAST(SUM(qn * qd) AS BIGINT) AS snd FROM q GROUP BY arm), "
            "o AS (SELECT list(struct_pack(arm := arm, n := n, "
            "sn := sn, sd := sd, snn := snn, sdd := sdd, snd := snd) "
            "ORDER BY arm) AS a FROM p), "
            "rws AS (SELECT list_transform(a, r -> struct_pack("
            "arm := r.arm, n_units := r.n, "
            "ratio := CASE WHEN r.sd > 0 THEN r.sn / r.sd END, "
            "se := sqrt(CASE WHEN r.sd > 0 THEN "
            "(CAST(r.snn * r.n - r.sn * r.sn AS DOUBLE) / (r.n * r.n) "
            "- 2.0 * (CASE WHEN r.sd > 0 THEN r.sn / r.sd END) * "
            "(CAST(r.snd * r.n - r.sn * r.sd AS DOUBLE) / (r.n * r.n)) "
            "+ (CASE WHEN r.sd > 0 THEN r.sn / r.sd END) * "
            "(CASE WHEN r.sd > 0 THEN r.sn / r.sd END) * "
            "(CAST(r.sdd * r.n - r.sd * r.sd AS DOUBLE) / (r.n * r.n))"
            ") / (r.n * ((r.sd / r.n) * (r.sd / r.n))) END))) AS rr "
            "FROM o), "
            "f AS (SELECT rr, rr[1] AS r1, rr[2] AS r2, "
            "len(rr) = 2 AS two FROM rws), "
            "g AS (SELECT rr, CASE WHEN two AND r1.ratio IS NOT NULL "
            "AND r2.ratio IS NOT NULL AND "
            "r1.se * r1.se + r2.se * r2.se > 0 THEN "
            "(r2.ratio - r1.ratio) / "
            "sqrt(r1.se * r1.se + r2.se * r2.se) END AS z FROM f), "
            "e AS (SELECT z, unnest(rr) AS r FROM g) "
            "SELECT r.arm AS arm, r.n_units AS n_units, "
            "r.ratio AS ratio, r.se AS se, z FROM e"
        ),
        # geohash census: same closed-form bit interleave (scalar
        # subquery per row), integer mean sums
        "q_geohash_census": (
            "WITH pts AS (SELECT "
            "(CAST(CONCAT('0x', substr(md5(event_id || '#lat'), 1, 13)) "
            "AS BIGINT) % 180000000) / 1000000.0 - 90.0 AS lat, "
            "(CAST(CONCAT('0x', substr(md5(event_id || '#lon'), 1, 13)) "
            "AS BIGINT) % 360000000) / 1000000.0 - 180.0 AS lon "
            "FROM events), "
            "b AS (SELECT "
            + _geohash_sql("lat", "lon", 2)
            + " AS cell, "
            "CAST(FLOOR(lat * 1000000.0 + 0.5) AS BIGINT) AS qlat, "
            "CAST(FLOOR(lon * 1000000.0 + 0.5) AS BIGINT) AS qlon "
            "FROM pts WHERE lat IS NOT NULL AND lon IS NOT NULL "
            "AND lat >= -90 AND lat <= 90 "
            "AND lon >= -180 AND lon <= 180) "
            "SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_points, "
            "CAST(SUM(qlat) AS BIGINT) / (COUNT(*) * 1000000.0) "
            "AS mean_lat, "
            "CAST(SUM(qlon) AS BIGINT) / (COUNT(*) * 1000000.0) "
            "AS mean_lon FROM b GROUP BY cell"
        ),
        "q_assoc_rules": (
            "WITH items AS (SELECT DISTINCT l_orderkey AS basket, "
            "l_suppkey AS item FROM lineitem), "
            "pairs AS (SELECT a.item AS item_a, b.item AS item_b, "
            "COUNT(*) AS pair_support FROM items a "
            "JOIN items b ON a.basket = b.basket AND a.item < b.item "
            "GROUP BY 1, 2 HAVING COUNT(*) >= 3), "
            "bi AS (SELECT item_a AS antecedent, item_b AS consequent, "
            "pair_support FROM pairs UNION ALL "
            "SELECT item_b, item_a, pair_support FROM pairs), "
            "supp AS (SELECT item, COUNT(*) AS s FROM items GROUP BY item), "
            "nb AS (SELECT COUNT(DISTINCT basket) AS n FROM items) "
            "SELECT antecedent, consequent, pair_support, "
            "ROUND(pair_support / sa.s, 6) AS confidence, "
            "ROUND((pair_support / sa.s) / (sc.s / nb.n), 6) AS lift "
            "FROM bi JOIN supp sa ON sa.item = antecedent "
            "JOIN supp sc ON sc.item = consequent CROSS JOIN nb"
        ),
        "q_keyfilter_join": (
            "SELECT s_name, "
            "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue "
            "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey "
            "WHERE s_acctbal > 9000 GROUP BY s_name"
        ),
        "q_line_dedup": (
            "WITH d AS (SELECT doc_id, list_filter(list_transform("
            "string_split(replace(text, ' table ', chr(10)), chr(10)), "
            "x -> trim(x)), x -> x <> '') AS ls FROM documents), "
            "l AS (SELECT doc_id, generate_subscripts(ls, 1) AS pos, "
            "unnest(ls) AS line FROM d), "
            "r AS (SELECT doc_id, pos, line, ROW_NUMBER() OVER "
            "(PARTITION BY line ORDER BY doc_id, pos) AS rn FROM l) "
            "SELECT doc_id AS id, "
            "COALESCE(string_agg(CASE WHEN rn = 1 THEN line END, chr(10) "
            "ORDER BY pos), '') AS text_dedup, "
            "COUNT(*) FILTER (WHERE rn = 1) AS n_lines_kept, "
            "COUNT(*) AS n_lines_total FROM r GROUP BY doc_id"
        ),
        "q_cdc_apply": (
            "WITH log AS (SELECT o_custkey AS c_custkey, "
            "'cdc-' || o_custkey AS c_name, CAST(0 AS INTEGER) AS c_nationkey, "
            "o_totalprice / 128.0 AS c_acctbal, "
            "'CDC' AS c_mktsegment, o_orderkey AS seq, "
            "CASE WHEN o_orderstatus = 'F' THEN 'U' "
            "WHEN o_orderstatus = 'O' THEN 'I' ELSE 'D' END AS op "
            "FROM orders), "
            "w AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY c_custkey "
            "ORDER BY seq DESC) AS rn FROM log), "
            "win AS (SELECT * FROM w WHERE rn = 1) "
            "SELECT c.c_custkey, c.c_name, c.c_nationkey, c.c_acctbal, "
            "c.c_mktsegment FROM customer c "
            "WHERE c.c_custkey NOT IN (SELECT c_custkey FROM win) "
            "UNION ALL SELECT c_custkey, c_name, c_nationkey, c_acctbal, "
            "c_mktsegment FROM win WHERE op <> 'D'"
        ),
        "q_interval_overlap": (
            "WITH err AS (SELECT event_id AS err_id, user_id, "
            "CAST(floor(epoch(ts)) AS BIGINT) AS s, "
            "CAST(floor(epoch(ts)) AS BIGINT) + 600 AS e FROM events "
            "WHERE event_type = 'error'), "
            "clk AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS s, "
            "CAST(floor(epoch(ts)) AS BIGINT) + 300 AS e FROM events "
            "WHERE event_type = 'click') "
            "SELECT err.err_id, COUNT(*) AS n_overlaps FROM err "
            "JOIN clk ON err.user_id = clk.user_id "
            "AND err.s < clk.e AND clk.s < err.e "
            "GROUP BY err.err_id"
        ),
        "q_target_encode": (
            "SELECT o_orderpriority, COUNT(o_totalprice) AS n, "
            "ROUND((SUM(o_totalprice) + 10 * "
            "(SELECT AVG(o_totalprice) FROM orders)) / "
            "(COUNT(o_totalprice) + 10), 4) AS enc "
            "FROM orders GROUP BY o_orderpriority"
        ),
        "q_mad_outliers": (
            "WITH med AS (SELECT event_type, MEDIAN(value) AS m "
            "FROM events GROUP BY 1), "
            "d AS (SELECT e.event_id, e.event_type, "
            "ABS(e.value - med.m) AS dev, med.m FROM events e "
            "JOIN med USING (event_type)), "
            "mad AS (SELECT event_type, MEDIAN(dev) AS mad FROM d "
            "GROUP BY 1) "
            "SELECT d.event_id, d.event_type, "
            "ROUND(d.m, 4) AS group_median, ROUND(mad.mad, 4) AS mad "
            "FROM d JOIN mad USING (event_type) "
            "WHERE d.dev > 4 * mad.mad"
        ),
        "q_chi_square": (
            "WITH obs AS (SELECT o_orderpriority AS a, o_orderstatus AS b, "
            "COUNT(*) AS o FROM orders WHERE o_orderpriority IS NOT NULL "
            "AND o_orderstatus IS NOT NULL GROUP BY 1, 2), "
            "rm AS (SELECT a, SUM(o) AS ra FROM obs GROUP BY a), "
            "cm AS (SELECT b, SUM(o) AS cb FROM obs GROUP BY b), "
            "t AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM obs), "
            "dofs AS (SELECT (COUNT(DISTINCT a) - 1) * "
            "(COUNT(DISTINCT b) - 1) AS dof FROM obs), "
            "grid AS (SELECT rm.a, rm.ra, cm.b, cm.cb, "
            "COALESCE(obs.o, 0) AS o FROM rm CROSS JOIN cm "
            "LEFT JOIN obs ON obs.a = rm.a AND obs.b = cm.b) "
            "SELECT ROUND(SUM((grid.o - grid.ra * grid.cb / t.n) * "
            "(grid.o - grid.ra * grid.cb / t.n) / "
            "(grid.ra * grid.cb / t.n)), 4) "
            "AS chi2, dofs.dof, t.n FROM grid "
            "CROSS JOIN t CROSS JOIN dofs GROUP BY dofs.dof, t.n"
        ),
        "q_decayed_features": (
            "SELECT user_id, COUNT(*) AS n_events, "
            "ROUND(SUM(value * POW(0.5, ((EPOCH(TIMESTAMP "
            "'2024-02-01 00:00:00') - FLOOR(EPOCH(ts))) / 3600.0) / 168.0)), "
            "6) AS decayed_sum, "
            "ROUND(SUM(POW(0.5, ((EPOCH(TIMESTAMP '2024-02-01 00:00:00') - "
            "FLOOR(EPOCH(ts))) / 3600.0) / 168.0)), 6) AS decayed_n, "
            "ROUND(SUM(value * POW(0.5, ((EPOCH(TIMESTAMP "
            "'2024-02-01 00:00:00') - FLOOR(EPOCH(ts))) / 3600.0) / 168.0)) "
            "/ SUM(POW(0.5, ((EPOCH(TIMESTAMP '2024-02-01 00:00:00') - "
            "FLOOR(EPOCH(ts))) / 3600.0) / 168.0)), 6) AS decayed_mean "
            "FROM events WHERE ts IS NOT NULL AND value IS NOT NULL "
            "GROUP BY user_id"
        ),
        "q_bootstrap_mean": (
            "WITH h AS (SELECT value, "
            "CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15) "
            "AS BIGINT) % 1073741824 AS h30 "
            "FROM events WHERE value IS NOT NULL), "
            "r AS (SELECT value, h30, t.b FROM h "
            "CROSS JOIN (SELECT unnest(range(32)) AS b) t), "
            "u AS (SELECT value, b, "
            "((((1103515245 * (b + 1) + 12345) % 2147483647 + 1) * h30 + "
            "(69069 * (b + 1) + 12345) % 2147483647) % 1000003) "
            "/ 1000003.0 AS u FROM r), "
            "p AS (SELECT value, b, CAST(CASE "
            "WHEN u < 0.36787944117144233 THEN 0 "
            "WHEN u < 0.7357588823428847 THEN 1 "
            "WHEN u < 0.9196986029286058 THEN 2 "
            "WHEN u < 0.9810118431238462 THEN 3 "
            "WHEN u < 0.9963401531726563 THEN 4 "
            "WHEN u < 0.9994058151824183 THEN 5 "
            "WHEN u < 0.9999167588507119 THEN 6 "
            "WHEN u < 0.9999897508033253 THEN 7 "
            "WHEN u < 0.9999988747974021 THEN 8 "
            "ELSE 9 END AS DOUBLE) AS w FROM u), "
            "m AS (SELECT b, SUM(w * value) / SUM(w) AS m FROM p GROUP BY b) "
            "SELECT CAST(COUNT(*) AS BIGINT) AS n_boot, "
            "ROUND(AVG(m), 6) AS boot_mean, "
            "ROUND(STDDEV_SAMP(m), 6) AS boot_se, "
            "ROUND(AVG(m) - 1.96 * STDDEV_SAMP(m), 6) AS ci_lo, "
            "ROUND(AVG(m) + 1.96 * STDDEV_SAMP(m), 6) AS ci_hi FROM m"
        ),
        "q_psi_drift": (
            "WITH e AS (SELECT CAST(LEAST(GREATEST(FLOOR((value - 0.0) / "
            "25.0), 0), 9) AS BIGINT) AS bin, "
            "CASE WHEN (CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), "
            "1, 15) AS BIGINT) % 10000) < 5000 THEN 'a' ELSE 'b' END AS arm "
            "FROM events WHERE value IS NOT NULL), "
            "c AS (SELECT bin, COUNT(*) FILTER (WHERE arm = 'a') "
            "AS n_expected, COUNT(*) FILTER (WHERE arm = 'b') AS n_actual "
            "FROM e GROUP BY bin), "
            "f AS (SELECT s.bin, COALESCE(n_expected, 0) AS n_expected, "
            "COALESCE(n_actual, 0) AS n_actual FROM "
            "(SELECT unnest(range(10)) AS bin) s LEFT JOIN c USING (bin)), "
            "t AS (SELECT SUM(n_expected) AS te, SUM(n_actual) AS ta FROM f), "
            "x AS (SELECT f.bin, f.n_expected, f.n_actual, "
            "(GREATEST(f.n_expected / t.te, 1e-6) - "
            "GREATEST(f.n_actual / t.ta, 1e-6)) * "
            "LN(GREATEST(f.n_expected / t.te, 1e-6) / "
            "GREATEST(f.n_actual / t.ta, 1e-6)) AS c "
            "FROM f CROSS JOIN t), "
            "tt AS (SELECT ROUND(SUM(c), 6) AS psi_total FROM x) "
            "SELECT bin, ROUND(CAST(bin AS DOUBLE) * 25.0, 6) AS bin_lo, "
            "CAST(n_expected AS BIGINT) AS n_expected, "
            "CAST(n_actual AS BIGINT) AS n_actual, "
            "ROUND(c, 6) AS psi_bin, psi_total "
            "FROM x CROSS JOIN tt"
        ),
        "q_group_ols": (
            "SELECT l_returnflag, "
            "CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n, "
            "ROUND(regr_slope(l_extendedprice, l_quantity), 6) AS slope, "
            "ROUND(regr_intercept(l_extendedprice, l_quantity), 6) "
            "AS intercept, "
            "ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2 "
            "FROM lineitem WHERE l_quantity IS NOT NULL "
            "AND l_extendedprice IS NOT NULL GROUP BY l_returnflag"
        ),
        "q_k_anonymity": (
            "WITH g AS (SELECT c_nationkey, c_mktsegment, COUNT(*) AS n "
            "FROM customer GROUP BY 1, 2) "
            "SELECT CAST(10 AS BIGINT) AS k, "
            "CAST(MIN(n) AS BIGINT) AS k_anonymity, "
            "CAST(COUNT(*) AS BIGINT) AS n_groups, "
            "CAST(COUNT(*) FILTER (WHERE n < 10) AS BIGINT) "
            "AS n_risky_groups, "
            "CAST(SUM(n) AS BIGINT) AS n_rows, "
            "CAST(SUM(CASE WHEN n < 10 THEN n ELSE 0 END) AS BIGINT) "
            "AS n_risky_rows, "
            "ROUND(SUM(CASE WHEN n < 10 THEN n ELSE 0 END) / SUM(n), 6) "
            "AS risk_rate FROM g"
        ),
        "q_cusum": (
            "WITH b AS (SELECT user_id, ts, value, "
            "AVG(value) OVER (PARTITION BY user_id) AS m, "
            "STDDEV_POP(value) OVER (PARTITION BY user_id) AS sd "
            "FROM events WHERE value IS NOT NULL AND ts IS NOT NULL), "
            "c AS (SELECT user_id, ts, value, sd, "
            "SUM(value - m) OVER (PARTITION BY user_id ORDER BY ts, value "
            "ROWS UNBOUNDED PRECEDING) AS cu FROM b), "
            "d AS (SELECT user_id, ts, value, sd, cu, "
            "LEAST(MIN(cu) OVER w, 0) AS mn, "
            "GREATEST(MAX(cu) OVER w, 0) AS mx FROM c "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, value "
            "ROWS UNBOUNDED PRECEDING)) "
            "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_points, "
            "CAST(COUNT(*) FILTER (WHERE (cu - mn) > 5.0 * sd OR "
            "(mx - cu) > 5.0 * sd) AS BIGINT) AS n_changes, "
            "ROUND(MAX(ROUND(cu - mn, 6)), 2) AS max_hi, "
            "ROUND(MAX(ROUND(mx - cu, 6)), 2) AS max_lo "
            "FROM d GROUP BY user_id"
        ),
        "q_seasonal_anomalies": (
            "WITH p AS (SELECT event_type, EXTRACT(hour FROM ts) AS hour, "
            "AVG(value) AS baseline_mean, STDDEV_POP(value) AS baseline_sd, "
            "COUNT(*) AS n_obs FROM events "
            "WHERE value IS NOT NULL AND ts IS NOT NULL "
            "GROUP BY 1, 2) "
            "SELECT e.event_type, e.ts, CAST(p.hour AS INT) AS hour, "
            "e.value, ROUND(p.baseline_mean, 6) AS baseline_mean, "
            "ROUND(p.baseline_sd, 6) AS baseline_sd "
            "FROM events e JOIN p ON e.event_type = p.event_type "
            "AND EXTRACT(hour FROM e.ts) = p.hour "
            "WHERE p.n_obs >= 30 AND "
            "ABS(e.value - p.baseline_mean) > 3.0 * p.baseline_sd"
        ),
        "q_snapshot_diff": (
            "WITH old AS (SELECT o_orderkey, o_orderstatus, "
            "CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 10.0 "
            "ELSE o_totalprice END AS o_totalprice FROM orders "
            "WHERE o_orderkey % 10 <> 3), "
            "new AS (SELECT o_orderkey, o_orderstatus, o_totalprice "
            "FROM orders WHERE o_orderkey % 10 <> 7), "
            "j AS (SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS k, "
            "CASE WHEN old.o_orderkey IS NULL THEN 'added' "
            "WHEN new.o_orderkey IS NULL THEN 'removed' "
            "WHEN old.o_orderstatus IS DISTINCT FROM new.o_orderstatus "
            "OR old.o_totalprice IS DISTINCT FROM new.o_totalprice "
            "THEN 'changed' ELSE 'unchanged' END AS status "
            "FROM old FULL OUTER JOIN new USING (o_orderkey)) "
            "SELECT status, COUNT(*) AS n FROM j GROUP BY status"
        ),
        "q_char_entropy": (
            "WITH s AS (SELECT doc_id, lower(text) AS s, "
            "length(text) AS n_chars FROM documents "
            "WHERE text IS NOT NULL), "
            "c AS (SELECT doc_id, n_chars, list_transform("
            "['a','b','c','d','e','f','g','h','i','j','k','l','m','n','o',"
            "'p','q','r','s','t','u','v','w','x','y','z'], "
            "x -> CAST(length(s) - length(replace(s, x, '')) AS DOUBLE)) "
            "AS cs FROM s), "
            "t AS (SELECT doc_id, n_chars, cs, list_sum(cs) AS t FROM c) "
            "SELECT doc_id, CAST(t AS BIGINT) AS n_letters, "
            "ROUND(CASE WHEN n_chars > 0 THEN t / n_chars END, 6) "
            "AS letter_ratio, "
            "ROUND(CASE WHEN t > 0 THEN -list_sum(list_transform("
            "list_filter(cs, v -> v > 0), v -> (v / t) * log2(v / t))) END, "
            "6) AS entropy_bits FROM t"
        ),
        "q_bpe_pairs": (
            "SELECT pair, COUNT(*) AS n FROM ("
            "SELECT unnest(flatten(list_transform("
            "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), "
            "x -> x <> ''), "
            "w -> list_transform(range(1, length(w)), "
            "i -> substr(w, i, 2))))) AS pair "
            "FROM documents WHERE text IS NOT NULL) "
            "GROUP BY pair ORDER BY n DESC, pair LIMIT 20"
        ),
        "q_ngram_diversity": (
            "WITH t AS (SELECT source, "
            "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), "
            "x -> x <> '') AS toks FROM documents WHERE text IS NOT NULL), "
            "g AS (SELECT source, unnest(list_transform("
            "range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1])) "
            "AS gram FROM t) "
            "SELECT source, COUNT(*) AS total_grams, "
            "COUNT(DISTINCT gram) AS distinct_grams, "
            "ROUND(COUNT(DISTINCT gram) / COUNT(*), 6) AS diversity "
            "FROM g GROUP BY source"
        ),
        "q_mixture_weights": (
            "WITH c AS (SELECT source, COUNT(*) AS n_docs FROM documents "
            "GROUP BY source), "
            "t AS (SELECT source, n_docs, "
            "POW(CAST(n_docs AS DOUBLE), 0.5) AS p FROM c) "
            "SELECT source, n_docs, "
            "ROUND(p / SUM(p) OVER (), 6) AS weight, "
            "ROUND((p / SUM(p) OVER ()) * SUM(n_docs) OVER () / n_docs, 6) "
            "AS epochs FROM t"
        ),
        "q_window_dedup": (
            "WITH w AS (SELECT user_id, event_type, "
            "CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS win_start, "
            "ts, event_id, "
            "COUNT(*) OVER (PARTITION BY user_id, event_type, "
            "floor(epoch(ts) / 600)) AS n_dups, "
            "ROW_NUMBER() OVER (PARTITION BY user_id, event_type, "
            "floor(epoch(ts) / 600) ORDER BY ts, event_id) AS rn "
            "FROM events) "
            "SELECT user_id, event_type, win_start, "
            "CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, event_id, "
            "CAST(n_dups AS BIGINT) AS n_dups FROM w WHERE rn = 1"
        ),
        "q_hll_rollup": (
            # rollup_ok = TRUE expected: the unioned sketch estimate must
            # land within 5% of the exact distinct or the hash flips
            "SELECT event_type, "
            "CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_units, "
            "COUNT(DISTINCT user_id) AS n_exact, TRUE AS rollup_ok "
            "FROM events WHERE user_id IS NOT NULL GROUP BY event_type"
        ),
        "q_kll_rollup": (
            # p50_ok/p90_ok = TRUE expected: the merged-KLL estimate must
            # land inside the exact +-5-rank-point band or the hash flips
            "SELECT event_type, "
            "CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_units, "
            "CAST(COUNT(*) AS BIGINT) AS n_rows, "
            "ROUND(quantile_cont(value, 0.5), 4) AS p50_exact, "
            "TRUE AS p50_ok, TRUE AS p90_ok "
            "FROM events WHERE value IS NOT NULL GROUP BY event_type"
        ),
        "q_theta_overlap": (
            # Theta sketches are in exact mode below 2^lgk distinct
            # values, so the estimates equal these exact counts
            "WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, user_id "
            "FROM events WHERE user_id IS NOT NULL), "
            "b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM d), "
            "a AS (SELECT DISTINCT event_type, user_id FROM d, b "
            "WHERE day = b.lo), "
            "z AS (SELECT DISTINCT event_type, user_id FROM d, b "
            "WHERE day = b.hi), "
            "j AS (SELECT COALESCE(a.event_type, z.event_type) AS event_type, "
            "a.user_id AS au, z.user_id AS zu FROM a FULL OUTER JOIN z "
            "ON a.event_type = z.event_type AND a.user_id = z.user_id) "
            "SELECT event_type, CAST(COUNT(au) AS BIGINT) AS n_a, "
            "CAST(COUNT(zu) AS BIGINT) AS n_b, "
            "CAST(SUM(CASE WHEN au IS NOT NULL AND zu IS NOT NULL "
            "THEN 1 ELSE 0 END) AS BIGINT) AS n_both, "
            "CAST(SUM(CASE WHEN au IS NOT NULL AND zu IS NULL "
            "THEN 1 ELSE 0 END) AS BIGINT) AS n_only_a "
            "FROM j GROUP BY event_type"
        ),
        "q_ewma_smooth": (
            # identical dyadic fold (acc/2 + x/2 over centi-quantized
            # trailing-20 values) — bit-identical doubles on both engines
            "WITH base AS (SELECT user_id, ts, event_id, "
            "ROUND(COALESCE(value, 0) * 100, 0) AS xq FROM events), "
            "w AS (SELECT user_id, ts, event_id, "
            "list(xq) OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS arr FROM base) "
            "SELECT user_id, ts, event_id, "
            "list_reduce(list_prepend(0.0, arr), "
            "(acc, x) -> acc / 2 + x / 2) / 100 AS smooth FROM w"
        ),
        "q_join_estimate": (
            # theta sketches are exact below 2^14 distinct keys, so the
            # estimates equal these exact relational counts
            "WITH a AS (SELECT DISTINCT c_custkey AS k FROM customer "
            "WHERE c_custkey IS NOT NULL), "
            "b AS (SELECT DISTINCT o_custkey AS k FROM orders "
            "WHERE o_custkey IS NOT NULL) "
            "SELECT CAST((SELECT COUNT(*) FROM a) AS BIGINT) AS n_keys_a, "
            "CAST((SELECT COUNT(*) FROM b) AS BIGINT) AS n_keys_b, "
            "CAST((SELECT COUNT(*) FROM a JOIN b USING (k)) AS BIGINT) "
            "AS n_matched, "
            "CAST((SELECT COUNT(*) FROM a ANTI JOIN b USING (k)) AS BIGINT) "
            "AS n_only_a, "
            "CAST((SELECT COUNT(*) FROM b ANTI JOIN a USING (k)) AS BIGINT) "
            "AS n_only_b"
        ),
        "q_funnel_latency": (
            "WITH fa AS (SELECT user_id, MIN(ts) AS a_ts FROM events "
            "WHERE event_type = 'click' GROUP BY user_id), "
            "lat AS (SELECT e.user_id, "
            "epoch(MIN(e.ts)) - epoch(fa.a_ts) AS latency_s "
            "FROM events e JOIN fa ON e.user_id = fa.user_id "
            "WHERE e.event_type = 'purchase' AND e.ts >= fa.a_ts "
            "GROUP BY e.user_id, fa.a_ts) "
            "SELECT CAST(COUNT(*) AS BIGINT) AS n_converted, "
            "ROUND(quantile_cont(latency_s, 0.25), 4) AS p25_s, "
            "ROUND(quantile_cont(latency_s, 0.5), 4) AS p50_s, "
            "ROUND(quantile_cont(latency_s, 0.75), 4) AS p75_s FROM lat"
        ),
        "q_frequent_sequences": (
            # length<=2 PrefixSpan support == relational subsequence
            # counting: <a,b> occurs in a user's sequence iff the first
            # position of a precedes the last position of b
            "WITH seq AS (SELECT user_id, event_type, "
            "ROW_NUMBER() OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS pos FROM events "
            "WHERE event_type IS NOT NULL AND ts IS NOT NULL), "
            "n AS (SELECT COUNT(DISTINCT user_id) AS nu FROM seq), "
            "singles AS (SELECT event_type AS pattern, "
            "COUNT(DISTINCT user_id) AS freq FROM seq GROUP BY 1), "
            "pos AS (SELECT user_id, event_type, MIN(pos) AS fp, "
            "MAX(pos) AS lp FROM seq GROUP BY 1, 2), "
            "pairs AS (SELECT a.event_type || '->' || b.event_type "
            "AS pattern, COUNT(*) AS freq FROM pos a "
            "JOIN pos b ON a.user_id = b.user_id "
            "WHERE a.fp < b.lp GROUP BY 1), "
            "allp AS (SELECT pattern, CAST(freq AS BIGINT) AS freq "
            "FROM singles UNION ALL "
            "SELECT pattern, CAST(freq AS BIGINT) FROM pairs) "
            "SELECT pattern, freq FROM allp, n WHERE freq >= 0.5 * nu"
        ),
        "q_rank_overlap": (
            "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
            "FROM embeddings), "
            "q AS (SELECT v FROM e WHERE vec_id = 0), "
            "a AS (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY "
            "list_cosine_similarity(e.v, (SELECT v FROM q)) DESC, "
            "vec_id ASC) AS ra FROM e QUALIFY ra <= 10), "
            "b AS (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY "
            "list_inner_product(e.v, (SELECT v FROM q)) DESC, "
            "vec_id ASC) AS rb FROM e QUALIFY rb <= 10), "
            "m AS (SELECT GREATEST(ra, rb) AS mm FROM a "
            "JOIN b USING (vec_id)), "
            "d AS (SELECT unnest(range(1, 11)) AS dd), "
            "x AS (SELECT dd, (SELECT COUNT(*) FROM m WHERE mm <= dd) AS xx "
            "FROM d) "
            "SELECT CAST(10 AS INTEGER) AS k, "
            "ROUND(SUM(0.1 * POWER(0.9, dd - 1) * xx / dd), 6) AS rbo "
            "FROM x"
        ),
        "q_intrinsic_dim": (
            "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
            "FROM embeddings), "
            "p AS (SELECT vec_id AS qid, v AS qv FROM e "
            "WHERE vec_id % 8 = 0 AND vec_id < 512), "
            "s AS (SELECT p.qid, e.vec_id AS cid, "
            "ROUND(1 - list_cosine_similarity(e.v, p.qv), 6) AS d "
            "FROM e, p), "
            "r AS (SELECT qid, cid, d, ROW_NUMBER() OVER (PARTITION BY qid "
            "ORDER BY d ASC, cid ASC) AS rn FROM s), "
            "pp AS (SELECT qid, "
            "MIN(CASE WHEN rn = 2 THEN d END) AS r1, "
            "MIN(CASE WHEN rn = 3 THEN d END) AS r2 "
            "FROM r WHERE rn IN (2, 3) GROUP BY qid), "
            "v AS (SELECT * FROM pp WHERE r1 > 0 AND r2 IS NOT NULL) "
            "SELECT CAST(COUNT(*) AS BIGINT) AS n_probes, "
            "ROUND(COUNT(*) / SUM(LN(r2 / r1)), 4) AS id_est FROM v"
        ),
        "q_leakage_split": (
            _NEARDUP_PAIR_CTE
            + ", comp AS (SELECT s AS id, LEAST(s, MIN(d)) AS comp "
            "FROM reach GROUP BY s), "
            "g AS (SELECT d.doc_id, "
            "COALESCE(c.comp, d.doc_id) AS split_group FROM documents d "
            "LEFT JOIN comp c ON c.id = d.doc_id), "
            "b AS (SELECT doc_id, split_group, "
            "CAST(CONCAT('0x', substr(md5(CAST(split_group AS VARCHAR)), "
            "1, 15)) AS BIGINT) % 10000 AS bk FROM g) "
            "SELECT doc_id, split_group, "
            "CASE WHEN bk < 9000 THEN 'train' "
            "WHEN bk < 9500 THEN 'val' ELSE 'test' END AS split FROM b"
        ),
        "q_survival": (
            "WITH b AS (SELECT MAX(ts) AS maxts FROM events), "
            "u AS (SELECT user_id, MIN(ts) AS f, MAX(ts) AS l FROM events "
            "WHERE user_id IS NOT NULL AND ts IS NOT NULL GROUP BY user_id), "
            "p AS (SELECT CAST(FLOOR((epoch(l) - epoch(f)) / 86400.0) "
            "AS BIGINT) AS t, "
            "(epoch(l) < epoch(maxts) - 3 * 86400.0) AS churned FROM u, b), "
            "h AS (SELECT t, COUNT(*) AS nl, "
            "SUM(CASE WHEN churned THEN 1 ELSE 0 END) AS d "
            "FROM p GROUP BY t), "
            "k AS (SELECT t, nl, d, SUM(nl) OVER (ORDER BY t "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, "
            "(SELECT SUM(nl) FROM h) AS total FROM h), "
            "r AS (SELECT t, total - cum + nl AS n_risk, d, "
            "PRODUCT(1.0 - CAST(d AS DOUBLE) / (total - cum + nl)) "
            "OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND "
            "CURRENT ROW) AS s FROM k) "
            "SELECT t, CAST(n_risk AS BIGINT) AS n_risk, "
            "CAST(d AS BIGINT) AS d, ROUND(s, 4) AS s FROM r"
        ),
        "q_backtest": (
            "WITH counts AS (SELECT event_type AS k, "
            "CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) * 3600 AS h, "
            "COUNT(*) AS c FROM events WHERE ts IS NOT NULL "
            "GROUP BY 1, 2), "
            "b AS (SELECT MAX(h) AS hmax FROM counts), "
            "actual AS (SELECT k, h, c FROM counts, b "
            "WHERE h > hmax - 168 * 3600), "
            "pred AS (SELECT k, h + 86400 AS h, c AS yhat FROM counts) "
            "SELECT actual.k AS event_type, "
            "CAST(COUNT(*) AS BIGINT) AS n_eval, "
            "ROUND(AVG(ABS(actual.c - pred.yhat)), 4) AS mae, "
            "ROUND(AVG(ABS(actual.c - pred.yhat) / actual.c), 4) AS mape "
            "FROM actual JOIN pred ON actual.k = pred.k "
            "AND actual.h = pred.h GROUP BY actual.k"
        ),
        "q_kcenter_sample": (
            # unrolled greedy replay; DOUBLE[] casts make DuckDB
            # accumulate in float64 like Spark's fold
            "WITH e AS (SELECT vec_id AS id, "
            "CAST(embedding AS DOUBLE[]) AS v FROM embeddings), "
            "c1 AS (SELECT id, v FROM e ORDER BY id LIMIT 1), "
            "d1 AS (SELECT e.id, e.v, ROUND(1 - list_cosine_similarity("
            "e.v, (SELECT v FROM c1)), 6) AS md FROM e), "
            "c2 AS (SELECT id, v, md FROM d1 ORDER BY md DESC, id LIMIT 1), "
            "d2 AS (SELECT d1.id, d1.v, LEAST(d1.md, ROUND(1 - "
            "list_cosine_similarity(d1.v, (SELECT v FROM c2)), 6)) AS md "
            "FROM d1), "
            "c3 AS (SELECT id, v, md FROM d2 ORDER BY md DESC, id LIMIT 1), "
            "d3 AS (SELECT d2.id, d2.v, LEAST(d2.md, ROUND(1 - "
            "list_cosine_similarity(d2.v, (SELECT v FROM c3)), 6)) AS md "
            "FROM d2), "
            "c4 AS (SELECT id, v, md FROM d3 ORDER BY md DESC, id LIMIT 1) "
            "SELECT CAST(1 AS INTEGER) AS rank, (SELECT id FROM c1) AS id, "
            "CAST(NULL AS DOUBLE) AS radius "
            "UNION ALL SELECT 2, (SELECT id FROM c2), (SELECT md FROM c2) "
            "UNION ALL SELECT 3, (SELECT id FROM c3), (SELECT md FROM c3) "
            "UNION ALL SELECT 4, (SELECT id FROM c4), (SELECT md FROM c4)"
        ),
        "q_top_tokens_per_source": (
            # exact regime (capacity >= distinct tokens): est == exact
            "WITH toks AS (SELECT source, unnest(list_filter("
            "string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) "
            "AS tok FROM documents), "
            "c AS (SELECT source, tok, COUNT(*) AS n FROM toks "
            "GROUP BY source, tok), "
            "r AS (SELECT source, tok AS value, n AS est_count, "
            "CAST(ROW_NUMBER() OVER (PARTITION BY source "
            "ORDER BY n DESC, tok ASC) AS INTEGER) AS rank FROM c) "
            "SELECT * FROM r WHERE rank <= 3"
        ),
        "q_cms_tokens": (
            # cms_ok = TRUE expected: CMS never undercounts and
            # overcounts at most eps*N (collision-free at this scale,
            # so est == exact)
            "WITH toks AS (SELECT unnest(list_filter("
            "string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) "
            "AS tok FROM documents), "
            "p AS (SELECT unnest(['join', 'hash', 'scan', 'zzz_absent']) "
            "AS item) "
            "SELECT p.item, CAST(COALESCE(c.n, 0) AS BIGINT) AS n_exact, "
            "TRUE AS cms_ok FROM p LEFT JOIN "
            "(SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok) c "
            "ON p.item = c.tok"
        ),
        "q_join_ivm": (
            # delta aggregates = full-join aggregates minus base-join
            # aggregates, per flag
            "WITH full_j AS (SELECT l_returnflag, COUNT(*) AS c, "
            "SUM(l_quantity) AS q FROM lineitem JOIN orders "
            "ON l_orderkey = o_orderkey GROUP BY l_returnflag), "
            "base_j AS (SELECT l_returnflag, COUNT(*) AS c, "
            "SUM(l_quantity) AS q FROM lineitem JOIN orders "
            "ON l_orderkey = o_orderkey "
            "WHERE l_linenumber <> 1 AND o_orderkey % 10 <> 0 "
            "GROUP BY l_returnflag) "
            "SELECT f.l_returnflag, "
            "CAST(f.c - COALESCE(b.c, 0) AS BIGINT) AS n_delta_rows, "
            "ROUND(f.q - COALESCE(b.q, 0), 2) AS qty_delta "
            "FROM full_j f LEFT JOIN base_j b "
            "ON f.l_returnflag = b.l_returnflag "
            "WHERE f.c - COALESCE(b.c, 0) > 0"
        ),
        "q_dp_counts": (
            # bit-for-bit replica of the deterministic Laplace draw:
            # md5(release_id \x1f seed \x1f key) -> 52-bit uniform -> inverse CDF
            "WITH g AS (SELECT source, COUNT(*) AS n FROM documents "
            "GROUP BY source), "
            "h AS (SELECT source, n, "
            "CAST(CONCAT('0x', substr(md5(CONCAT('rel-2026-08-14', chr(31), "
            "'r4g', chr(31), "
            "COALESCE(CAST(source AS VARCHAR), chr(0)))), 1, 13)) AS BIGINT) "
            "AS hv FROM g), "
            "u AS (SELECT source, n, (CAST(hv AS DOUBLE) + 0.5) / "
            "4503599627370496.0 AS uu FROM h) "
            "SELECT source, CAST(GREATEST(ROUND(n + "
            "(-1.0) * SIGN(uu - 0.5) * LN(1.0 - 2.0 * ABS(uu - 0.5)), 0), "
            "0) AS BIGINT) AS noisy_count FROM u"
        ),
        "q_novelty": (
            "WITH f AS (SELECT source, doc_id, "
            "md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp "
            "FROM documents), "
            "m AS (SELECT source, doc_id, "
            "CASE WHEN doc_id = MIN(doc_id) OVER (PARTITION BY fp) "
            "THEN 1 ELSE 0 END AS nf FROM f) "
            "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(nf) AS BIGINT) AS n_first FROM m GROUP BY source"
        ),
        "q_mahalanobis": (
            "WITH base AS (SELECT l_returnflag AS grp, "
            "l_orderkey * 8 + l_linenumber AS li_id, "
            "CAST(l_quantity AS DOUBLE) AS x, "
            "CAST(l_extendedprice AS DOUBLE) AS y FROM lineitem "
            "WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL), "
            "s AS (SELECT grp, AVG(x) AS mx, AVG(y) AS my, "
            "VAR_POP(x) AS vx, VAR_POP(y) AS vy, COVAR_POP(x, y) AS cxy, "
            "COUNT(*) AS n FROM base GROUP BY grp), "
            "f AS (SELECT * FROM s WHERE n >= 3 "
            "AND vx * vy - cxy * cxy > 0), "
            "d AS (SELECT b.grp, b.li_id, b.x, b.y, "
            "(vy * (x - mx) * (x - mx) - 2 * cxy * (x - mx) * (y - my) "
            "+ vx * (y - my) * (y - my)) / (vx * vy - cxy * cxy) AS d2 "
            "FROM base b JOIN f ON b.grp = f.grp) "
            "SELECT grp AS l_returnflag, li_id, x AS l_quantity, "
            "y AS l_extendedprice, ROUND(d2, 4) AS d2 "
            "FROM d WHERE ROUND(d2, 4) > 5.0"
        ),
        # BFD packing: the same decreasing-order best-fit placement as
        # a recursive CTE over per-stream rank; loads are a sorted
        # multiset so the two engines' states are canonical and equal
        "q_bfd_packing": (
            "WITH RECURSIVE t0 AS (SELECT source, "
            "CAST(CONCAT('0x', substr(md5(doc_id || '#pk'), 1, 13)) "
            "AS BIGINT) % 2 AS shard, doc_id, "
            "LEAST(len(list_filter(string_split_regex(lower(text), "
            "'[^a-z0-9]+'), e -> e <> '')), 128) AS n "
            "FROM documents WHERE text IS NOT NULL), "
            "d AS (SELECT source, shard, n, ROW_NUMBER() OVER ("
            "PARTITION BY source, shard ORDER BY n DESC, doc_id) AS rn "
            "FROM t0 WHERE n > 0), "
            "st AS (SELECT source, shard, 0 AS rn, "
            "CAST([] AS BIGINT[]) AS loads "
            "FROM (SELECT DISTINCT source, shard FROM d) "
            "UNION ALL "
            "SELECT d.source, d.shard, CAST(d.rn AS INT), "
            "CASE WHEN len(list_filter(st.loads, b -> b + d.n <= 128)) "
            "= 0 THEN list_sort(list_append(st.loads, d.n)) "
            "ELSE list_sort(list_append(list_concat("
            "st.loads[1:list_position(st.loads, list_max(list_filter("
            "st.loads, b -> b + d.n <= 128))) - 1], "
            "st.loads[list_position(st.loads, list_max(list_filter("
            "st.loads, b -> b + d.n <= 128))) + 1:len(st.loads)]), "
            "list_max(list_filter(st.loads, b -> b + d.n <= 128)) + d.n)) "
            "END "
            "FROM st JOIN d ON d.source = st.source "
            "AND d.shard = st.shard AND d.rn = st.rn + 1), "
            "fin AS (SELECT source, shard, loads FROM st "
            "QUALIFY rn = MAX(rn) OVER (PARTITION BY source, shard)), "
            "agg AS (SELECT source, shard, CAST(COUNT(*) AS BIGINT) "
            "AS n_docs, CAST(SUM(n) AS BIGINT) AS total_tokens "
            "FROM d GROUP BY source, shard) "
            "SELECT agg.source, agg.shard, n_docs, total_tokens, "
            "CAST(len(loads) AS BIGINT) AS n_bins_bfd, "
            "CAST(CEIL(total_tokens / 128.0) AS BIGINT) AS n_bins_lb, "
            "total_tokens / (CAST(len(loads) AS BIGINT) * 128) "
            "AS utilization FROM agg JOIN fin "
            "ON agg.source = fin.source AND agg.shard = fin.shard"
        ),
        # forward/nearest as-of: LATERAL min-distance subqueries — an
        # independent derivation of the union+window scans' matches;
        # the right side is deduped per (user, ts) so no tie rule on
        # equal-timestamp right rows is ever exercised
        "q_asof_directions": (
            "WITH l AS (SELECT user_id, "
            "CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts "
            "FROM events WHERE event_type = 'purchase'), "
            "r AS (SELECT user_id, "
            "CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts, "
            "MAX(value) AS value FROM events WHERE event_type = 'click' "
            "GROUP BY user_id, CAST(FLOOR(epoch(ts)) AS BIGINT)) "
            "SELECT 'forward' AS direction, l.user_id, l.ts, "
            "f.rts AS matched_ts, f.rv AS matched_value FROM l "
            "LEFT JOIN LATERAL (SELECT r.ts AS rts, r.value AS rv FROM r "
            "WHERE r.user_id = l.user_id AND r.ts >= l.ts "
            "ORDER BY r.ts LIMIT 1) f ON TRUE "
            "UNION ALL "
            "SELECT 'nearest' AS direction, l.user_id, l.ts, "
            "n.rts AS matched_ts, n.rv AS matched_value FROM l "
            "LEFT JOIN LATERAL (SELECT r.ts AS rts, r.value AS rv FROM r "
            "WHERE r.user_id = l.user_id "
            "ORDER BY CASE WHEN r.ts >= l.ts THEN r.ts - l.ts "
            "ELSE l.ts - r.ts END ASC, "
            "CASE WHEN r.ts <= l.ts THEN 0 ELSE 1 END ASC "
            "LIMIT 1) n ON TRUE"
        ),
        "q_temporal_join": (
            "WITH ch AS (SELECT l_orderkey AS k, "
            "CAST(floor(epoch(l_shipdate)) AS BIGINT) AS vf, "
            "MAX(l_linenumber) AS version FROM lineitem GROUP BY 1, 2), "
            "dim AS (SELECT k, vf, "
            "LEAD(vf) OVER (PARTITION BY k ORDER BY vf) AS vt, version "
            "FROM ch), "
            "f AS (SELECT l_orderkey AS k, "
            "CAST(floor(epoch(l_shipdate)) AS BIGINT) "
            "+ l_linenumber * 604800 AS ts, "
            "l_orderkey * 8 + l_linenumber AS fact_id FROM lineitem) "
            "SELECT f.fact_id, f.k AS l_orderkey, d.version "
            "FROM f LEFT JOIN dim d ON f.k = d.k AND d.vf <= f.ts "
            "AND (d.vt IS NULL OR d.vt > f.ts)"
        ),
        "q_boilerplate": """WITH salted AS (SELECT text || CASE WHEN doc_id % 3 = 0 THEN '. This site uses cookies to improve your experience.' ELSE '' END || CASE WHEN doc_id % 5 = 0 THEN '. Subscribe to our newsletter for weekly updates.' ELSE '' END AS s FROM documents), l AS (SELECT unnest(list_filter(list_transform(string_split(s, '.'), x -> regexp_replace(lower(trim(x)), '[^a-z0-9 ]', '', 'g')), x -> len(x) > 20)) AS line FROM salted) SELECT line, COUNT(*) AS n_occurrences FROM l GROUP BY line HAVING COUNT(*) >= 5 ORDER BY n_occurrences DESC, line ASC LIMIT 50""",
        "q_label_centroids": """WITH e AS (SELECT label, i AS ord, CAST(embedding[i] AS DOUBLE) AS val FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)), d AS (SELECT label, ord, AVG(val) AS m, COUNT(*) AS n FROM e GROUP BY 1, 2) SELECT label, array_to_string(list(CAST(FLOOR(ROUND(m, 6) * 1000000.0 + 0.5) AS BIGINT) ORDER BY ord), ',') AS centroid, MAX(n) AS n_vectors FROM d GROUP BY label""",
        "q_equidepth": """WITH b AS (SELECT quantile_cont(CAST(o_totalprice AS DOUBLE), [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bs FROM orders) SELECT CAST(len(list_filter(b.bs, x -> o_totalprice > x)) AS INT) AS bucket, COUNT(*) AS n, ROUND(MIN(CAST(o_totalprice AS DOUBLE)), 2) AS lo, ROUND(MAX(CAST(o_totalprice AS DOUBLE)), 2) AS hi FROM orders CROSS JOIN b GROUP BY 1""",
        "q_fuzzy_join": """WITH t AS (SELECT doc_id, substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), 1, 12) AS s FROM documents WHERE doc_id < 300) SELECT a.doc_id AS left_id, b.doc_id AS right_id, CAST(levenshtein(a.s, b.s) AS INT) AS distance FROM t a JOIN t b ON a.doc_id < b.doc_id WHERE levenshtein(a.s, b.s) <= 2""",
        "q_profile": """SELECT 'l_quantity' AS "column", COUNT(l_quantity) AS n, COUNT(*) FILTER (WHERE l_quantity IS NULL) AS n_null, MIN(CAST(l_quantity AS DOUBLE)) AS min, MAX(CAST(l_quantity AS DOUBLE)) AS max, ROUND(AVG(CAST(l_quantity AS DOUBLE)), 6) AS mean, ROUND(STDDEV_POP(CAST(l_quantity AS DOUBLE)), 6) AS std FROM lineitem UNION ALL SELECT 'l_extendedprice' AS "column", COUNT(l_extendedprice) AS n, COUNT(*) FILTER (WHERE l_extendedprice IS NULL) AS n_null, MIN(CAST(l_extendedprice AS DOUBLE)) AS min, MAX(CAST(l_extendedprice AS DOUBLE)) AS max, ROUND(AVG(CAST(l_extendedprice AS DOUBLE)), 6) AS mean, ROUND(STDDEV_POP(CAST(l_extendedprice AS DOUBLE)), 6) AS std FROM lineitem UNION ALL SELECT 'l_discount' AS "column", COUNT(l_discount) AS n, COUNT(*) FILTER (WHERE l_discount IS NULL) AS n_null, MIN(CAST(l_discount AS DOUBLE)) AS min, MAX(CAST(l_discount AS DOUBLE)) AS max, ROUND(AVG(CAST(l_discount AS DOUBLE)), 6) AS mean, ROUND(STDDEV_POP(CAST(l_discount AS DOUBLE)), 6) AS std FROM lineitem UNION ALL SELECT 'l_tax' AS "column", COUNT(l_tax) AS n, COUNT(*) FILTER (WHERE l_tax IS NULL) AS n_null, MIN(CAST(l_tax AS DOUBLE)) AS min, MAX(CAST(l_tax AS DOUBLE)) AS max, ROUND(AVG(CAST(l_tax AS DOUBLE)), 6) AS mean, ROUND(STDDEV_POP(CAST(l_tax AS DOUBLE)), 6) AS std FROM lineitem""",
        "q_merge_intervals": (
            "WITH iv AS (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) "
            "AS s, CAST(floor(epoch(ts)) AS BIGINT) + 600 AS e FROM events), "
            "m AS (SELECT user_id, s, e, MAX(e) OVER (PARTITION BY user_id "
            "ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) "
            "AS pme FROM iv), "
            "b AS (SELECT *, CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 "
            "END AS brk FROM m), "
            "i AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id "
            "ORDER BY s, e ROWS UNBOUNDED PRECEDING) AS island FROM b) "
            "SELECT user_id, MIN(s) AS island_start, MAX(e) AS island_end, "
            "COUNT(*) AS n_merged FROM i GROUP BY user_id, island"
        ),
        "q_twap": (
            "WITH t AS (SELECT user_id, value, "
            "LEAD(epoch(ts)) OVER (PARTITION BY user_id "
            "ORDER BY epoch(ts), value) - epoch(ts) AS dur FROM events) "
            "SELECT user_id, ROUND(CASE WHEN SUM(dur) IS NULL OR "
            "SUM(dur) = 0 THEN MAX(value) ELSE SUM(value * dur) / SUM(dur) "
            "END, 6) AS twap, COUNT(*) AS n_obs FROM t GROUP BY user_id"
        ),
        "q_retention": (
            "WITH act AS (SELECT DISTINCT user_id AS u, "
            "CAST(floor(epoch(ts) / 604800) AS BIGINT) AS period FROM events), "
            "coh AS (SELECT u, MIN(period) AS cohort_period FROM act "
            "GROUP BY u) "
            "SELECT c.cohort_period, a.period - c.cohort_period "
            "AS period_offset, COUNT(DISTINCT a.u) AS n_users "
            "FROM act a JOIN coh c ON a.u = c.u GROUP BY 1, 2"
        ),
        "q_validate": (
            "SELECT 'o_orderkey_unique' AS \"check\", "
            "CAST(COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS BIGINT) "
            "AS violations, "
            "COUNT(o_orderkey) = COUNT(DISTINCT o_orderkey) AS passed "
            "FROM orders "
            "UNION ALL SELECT 'o_custkey_not_null', "
            "COUNT(*) FILTER (WHERE o_custkey IS NULL), "
            "COUNT(*) FILTER (WHERE o_custkey IS NULL) = 0 FROM orders "
            "UNION ALL SELECT 'o_totalprice_in_range', "
            "COUNT(*) FILTER (WHERE o_totalprice IS NOT NULL AND "
            "(o_totalprice < 0.0 OR o_totalprice > 1000000.0)), "
            "COUNT(*) FILTER (WHERE o_totalprice IS NOT NULL AND "
            "(o_totalprice < 0.0 OR o_totalprice > 1000000.0)) = 0 "
            "FROM orders "
            "UNION ALL SELECT 'o_orderstatus_accepted', "
            "COUNT(*) FILTER (WHERE o_orderstatus IS NOT NULL AND "
            "o_orderstatus NOT IN ('O', 'F', 'P')), "
            "COUNT(*) FILTER (WHERE o_orderstatus IS NOT NULL AND "
            "o_orderstatus NOT IN ('O', 'F', 'P')) = 0 FROM orders "
            "UNION ALL SELECT 'o_orderpriority_matches', "
            "COUNT(*) FILTER (WHERE o_orderpriority IS NOT NULL AND "
            "NOT regexp_matches(o_orderpriority, '^[0-9]-[A-Z]+$')), "
            "COUNT(*) FILTER (WHERE o_orderpriority IS NOT NULL AND "
            "NOT regexp_matches(o_orderpriority, '^[0-9]-[A-Z]+$')) = 0 "
            "FROM orders"
        ),
        "q_heavy_hitters": (
            "SELECT user_id AS value, COUNT(*) AS est_count FROM events "
            "GROUP BY 1 ORDER BY est_count DESC, value ASC LIMIT 20"
        ),
    }
