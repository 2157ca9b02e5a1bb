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


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _kf(spark: SparkSession, sf_dir: str, name: str, ordered: bool = False) -> KevinFrame:
    return KevinFrame.from_df(_t(spark, sf_dir, name), ordered=ordered)


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
    """G4-G7: mean / count / population variance / population sd."""
    li = _kf(spark, sf_dir, "lineitem")
    base = li.groupby("l_returnflag")
    mean = base.aggregate("mean", "l_quantity", alias="avg_qty").to_df()
    cnt = base.aggregate("count", "l_quantity", alias="n").to_df()
    var = base.aggregate("variance", "l_discount", alias="var_disc").to_df()
    sd = base.aggregate("sd", "l_discount", alias="sd_disc").to_df()
    out = (
        mean.join(cnt, "l_returnflag").join(var, "l_returnflag").join(sd, "l_returnflag")
    )
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
    out = orders.sort("o_totalprice", SortOrder.DESCENDING).take(10)
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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q_select": q_select,
        "q_filter": q_filter,
        "q_groupby_sum": q_groupby_sum,
        "q_agg_global": q_agg_global,
        "q_agg_stats": q_agg_stats,
        "q_agg_concat": q_agg_concat,
        "q_sort_take": q_sort_take,
        "q_slice": q_slice,
        "q_melt": q_melt,
        "q_cast_pivot": q_cast_pivot,
        "q_append": q_append,
        "q_pos_join": q_pos_join,
        "q_revenue_by_nation": q_revenue_by_nation,
    }


def oracle_sql() -> dict[str, str]:
    return {
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
            "ORDER BY o_totalprice DESC LIMIT 10"
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
    }
