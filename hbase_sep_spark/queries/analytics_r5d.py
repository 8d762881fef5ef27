"""Round-5 fourth-wave extensions: TPC-H composite variants.

The single-operator queries prove each relational primitive in
isolation; these four prove the COMPOSITIONS the benchmark suite
that inspired the fixtures is actually famous for: Q3 (shipping
priority — selective 3-way join + grouped revenue + top-k), Q5
(local supplier volume — 6-way snowflake join with a cycle-closing
equi-constraint), Q10 (returned-item customer ranking), and a SQL
LATERAL correlated-subquery join (per-row dependent top-1 — the
form every "latest order per customer" report takes in ANSI SQL).

Revenue terms l_extendedprice*(1-l_discount) carry ≤4 true decimal
digits (2-dec price × 2-dec factor), so the DECIMAL(18,6) cast
recovers them exactly and sums are order-independent
(functions/portable.py's dsum rule). Top-k orderings tie-break on
the group key. Dates are emitted as yyyy-MM-dd strings.

Reference parity: the reference (prazanna/hbase-sep [R: path-level
UNVERIFIED per SURVEY §0]) has no relational layer at all — these
establish that the re-expressed engine covers the standard
analytic-join repertoire a warehouse consumer of its feed would run.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from hbase_sep_spark.functions.portable import DEC
from hbase_sep_spark.io import t
from hbase_sep_spark.registry import register


def _revenue() -> Column:
    """Exact-decimal per-lineitem revenue: the double product has ≤4
    true decimals, DECIMAL(18,6) recovers it exactly on both engines."""
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)


_REV_SQL = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))"


@register(
    "tpch_q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           CAST(round(sum({_REV_SQL}), 2) AS DOUBLE) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS o_date,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate  > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_date, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    section="2.3",
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 variant (shipping priority): the 10 highest-revenue
    unshipped orders for one market segment — selective dim filter,
    fact⋈fact join, grouped exact-decimal revenue, deterministic
    top-k (revenue DESC, l_orderkey tiebreak).

    Scale shape: both date predicates push to the parquet scans;
    the filtered customer dim broadcasts into orders (semi-form);
    the only big shuffle is lineitem⋈orders on the order key, whose
    partitioning the groupBy(l_orderkey, ...) then REUSES (no second
    fact shuffle); the top-10 is TakeOrderedAndProject — per
    partition heaps, no global sort. That plan is SF-invariant."""
    cutoff = F.lit("1998-01-01").cast("timestamp")
    cust = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < cutoff)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"), "left_semi")
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
            "o_orderpriority",
        )
        .agg(F.round(F.sum(_revenue()), 2).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_date", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "tpch_q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(round(sum({_REV_SQL}), 2) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey  = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
    section="2.3",
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 variant (local supplier volume): revenue per nation
    where customer and supplier share the nation, one region, one
    order-year — the 6-way snowflake join whose cycle-closing
    constraint (c_nationkey = s_nationkey) defeats naive star
    planning.

    Scale shape: region→nation→supplier collapse into one broadcast
    chain (dims); the year predicate pushes to the orders scan; the
    two fact joins shuffle on their keys and the cycle constraint is
    applied as a cheap post-join filter on two already-present int
    columns, never a second join. Aggregate output is
    nation-cardinality — trivially small."""
    cutoff_lo = F.lit("1996-01-01").cast("timestamp")
    cutoff_hi = F.lit("1997-01-01").cast("timestamp")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = t(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    supp = t(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= cutoff_lo) & (F.col("o_orderdate") < cutoff_hi)
    )
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
    )
    return joined.groupBy("n_name").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        F.round(F.sum(_revenue()), 2).cast("double").alias("revenue"),
    )


@register(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           CAST(round(sum({_REV_SQL}), 2) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-07-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    section="2.3",
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 variant (returned-item ranking): the 20 customers
    who returned the most revenue in a half-year — the churn-risk
    report. Same portability discipline as Q3: exact-decimal revenue,
    deterministic (revenue DESC, c_custkey) top-k.

    Scale shape: returnflag + date predicates push to both fact
    scans; nation broadcasts; the customer join shuffles on
    c_custkey and the groupBy reuses that partitioning; top-20 via
    TakeOrderedAndProject."""
    lo = F.lit("1997-01-01").cast("timestamp")
    hi = F.lit("1997-07-01").cast("timestamp")
    li = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    orders = (
        t(spark, sf_dir, "orders")
        .filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .select("o_orderkey", "o_custkey")
    )
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    nation = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(_revenue()), 2).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "join_lateral_topk",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey AS top_orderkey,
           t.o_totalprice AS top_totalprice
    FROM customer c,
         LATERAL (SELECT o_orderkey, o_totalprice
                  FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                  ORDER BY o_totalprice DESC, o_orderkey
                  LIMIT 1) t
    WHERE c.c_mktsegment = 'MACHINERY'
    """,
    section="2.3",
)
def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL LATERAL correlated-subquery join: per customer, the top
    order by price — the dependent-subquery form of topk_per_group,
    exercised through the SQL surface (Spark 4's LATERAL support)
    rather than the DataFrame window API. Deterministic: price ties
    break on o_orderkey, per the repo-wide tie-break rule.

    Scale shape: Catalyst DECORRELATES the lateral — the per-row
    subquery becomes one orders-side partial top-1 per custkey
    (window group-limit) joined back on the key; never a re-executed
    subquery per probe row. The decorrelated plan shuffles each side
    once — identical asymptotics to the window formulation."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("lateral_customer_v")
    t(spark, sf_dir, "orders").createOrReplaceTempView("lateral_orders_v")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey AS top_orderkey,
               t.o_totalprice AS top_totalprice
        FROM lateral_customer_v c,
             LATERAL (SELECT o_orderkey, o_totalprice
                      FROM lateral_orders_v o
                      WHERE o.o_custkey = c.c_custkey
                      ORDER BY o_totalprice DESC, o_orderkey
                      LIMIT 1) t
        WHERE c.c_mktsegment = 'MACHINERY'
        """
    )
