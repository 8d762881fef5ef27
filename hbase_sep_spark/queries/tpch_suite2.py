"""Round-5 TPC-H completion, part 2: the partsupp-dependent five.

With this module every one of the 22 TPC-H queries has a
re-expressed form in the registry. Q6 is exact; Q2/Q9/Q16/Q20 need
the partsupp table (absent from the reduced fixture schema —
FIXTURES.md) and are adapted shape-preservingly, deriving the
part-supplier relationships from lineitem and substituting
retail-price-based cost proxies; each docstring states its
deviation:

- Q2  minimum-cost supplier   → per-(part, supplier) min shipped
  price stands in for ps_supplycost
- Q6  forecast revenue change → exact (pure scan predicate + sum)
- Q9  product-type profit     → 0.6·p_retailprice·qty stands in for
  ps_supplycost·qty in the profit term
- Q16 parts/supplier counts   → supplier set per part derives from
  lineitem; the comment-based complaint exclusion is dropped (no
  comment columns)
- Q20 excess-stock suppliers  → "holds >half the shipped volume of
  a part" replaces the available-quantity predicate; selectivity
  comes from a scale-invariant ≥1.2×-mean dominance-count bar

Portability: same discipline as tpch_suite — decimal-exact sums,
BIGINT quantity arithmetic, integer threshold compares, top-k with
unique tiebreaks, dates as strings.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

from hbase_sep_spark.functions.portable import DEC
from hbase_sep_spark.io import t
from hbase_sep_spark.registry import register


def _ts(lit: str) -> Column:
    return F.lit(lit).cast("timestamp")


@register(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
        SELECT l_partkey AS pk, l_suppkey AS sk,
               min(CAST(l_extendedprice AS DECIMAL(18,6))) AS cost
        FROM lineitem GROUP BY pk, sk
    ),
    eur AS (
        SELECT s_suppkey, s_name, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    ),
    cand AS (
        SELECT pk, sk, cost, s_name, n_name,
               min(cost) OVER (PARTITION BY pk) AS best
        FROM ps JOIN eur ON sk = s_suppkey
    )
    SELECT c.pk AS p_partkey, c.s_name, c.n_name,
           CAST(round(c.cost, 2) AS DOUBLE) AS min_cost
    FROM cand c JOIN part ON c.pk = p_partkey
    WHERE p_size = 25 AND c.cost = c.best
    ORDER BY min_cost DESC, p_partkey, s_name
    LIMIT 20
    """,
    section="2.3",
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 variant (minimum-cost supplier): for each size-25
    part, the EUROPE supplier(s) with the lowest observed cost —
    ps_supplycost is absent, so the min shipped extended price per
    (part, supplier) stands in. The min-equality compares EXACT
    decimals (never rounded doubles), ties surface all suppliers,
    and the top-20 breaks ties on (p_partkey, s_name).

    Scale shape: one lineitem shuffle builds the derived partsupp;
    the EUROPE filter collapses into a broadcast supplier dim BEFORE
    the per-part min window (so the window ranks only qualifying
    rows — Q2's correlated subquery decorrelated by hand); the part
    size filter broadcasts onto the winner set."""
    ps = (
        t(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
        )
        .agg(F.min(F.col("l_extendedprice").cast(DEC)).alias("cost"))
    )
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eur = (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "n_name")
    )
    cand = ps.join(F.broadcast(eur), F.col("sk") == F.col("s_suppkey")).withColumn(
        "best", F.min("cost").over(Window.partitionBy("pk"))
    )
    part25 = (
        t(spark, sf_dir, "part").filter(F.col("p_size") == 25).select("p_partkey")
    )
    return (
        cand.filter(F.col("cost") == F.col("best"))
        .join(F.broadcast(part25), F.col("pk") == F.col("p_partkey"))
        .select(
            F.col("pk").alias("p_partkey"),
            "s_name",
            "n_name",
            F.round(F.col("cost"), 2).cast("double").alias("min_cost"),
        )
        .orderBy(F.col("min_cost").desc(), "p_partkey", "s_name")
        .limit(20)
    )


@register(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice * l_discount
                              AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    section="2.4",
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change), exact: the revenue
    that would vanish if small-quantity mid-discount orders were
    dropped — one ship year, discount band, quantity cap. The
    price×discount product carries ≤4 true decimals, recovered
    exactly by the decimal cast.

    Scale shape: the purest pushdown showcase in the suite — all
    three predicates reach the parquet scan as PushedFilters, a
    two-column read feeds one map-side-combined global sum, nothing
    shuffles but 1-row partials (pinned in tests/test_plans.py)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast(DEC)),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "tpch_q9_product_profit",
    oracle="""
    SELECT n_name AS supp_nation,
           CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                               - 0.6 * p_retailprice * l_quantity
                              AS DECIMAL(18,6))), 2) AS DOUBLE) AS profit
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN part     ON l_partkey = p_partkey
    WHERE p_name LIKE '%widget%'
    GROUP BY supp_nation, o_year
    """,
    section="2.4",
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 variant (product-type profit): profit on widget
    parts per supplier nation and order year. ps_supplycost is
    absent, so cost is proxied as 0.6·p_retailprice·quantity — the
    profit expression keeps Q9's exact shape (revenue minus
    cost-by-quantity). The term carries ≤4 true decimals
    (2-dec·2-dec and 1-dec·2-dec·int), exactly recovered by the
    decimal cast.

    Scale shape: the name filter broadcasts from part and prunes
    the fact FIRST; supplier→nation collapse into one broadcast;
    the only big shuffle is lineitem⋈orders; nation×year output."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
    )
    part = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    ).cast(DEC)
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("supp_nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).cast("double").alias("profit"))
    )


@register(
    "tpch_q16_parts_supplier_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#45'
      AND p_type <> 'ECONOMY'
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    LIMIT 20
    """,
    section="2.4",
)
def tpch_q16_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 variant (parts/supplier relationship): how many
    distinct suppliers ship each (brand, type, size) combination,
    excluding one brand and one type — the supplier set derives
    from lineitem (no partsupp) and the comment-based complaint
    exclusion is dropped (no comment columns). Deterministic top-20
    with the full key as tiebreak.

    Scale shape: the negative predicates + size IN-list broadcast
    from part and prune the fact before the shuffle; the distinct
    count expands to a two-level aggregate (distinct pairs, then
    counts) — both map-side combinable; TakeOrderedAndProject."""
    part = (
        t(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#45")
            & (F.col("p_type") != "ECONOMY")
            & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    li = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).cast("bigint").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
        .limit(20)
    )


@register(
    "tpch_q20_excess_stock_suppliers",
    oracle="""
    WITH shipped AS (
        SELECT l_partkey AS pk, l_suppkey AS sk,
               CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT) AS sq
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY pk, sk
    ),
    tot AS (SELECT pk, CAST(sum(sq) AS BIGINT) AS t FROM shipped GROUP BY pk),
    dom AS (
        SELECT sk, CAST(count(*) AS BIGINT) AS ndom
        FROM shipped JOIN tot USING (pk)
        WHERE 2 * sq > t
        GROUP BY sk
    ),
    bar AS (SELECT CAST(sum(ndom) AS BIGINT) AS td,
                   CAST(count(*) AS BIGINT) AS ns FROM dom)
    SELECT s_suppkey, s_name, ndom AS n_dominated_parts
    FROM dom
    JOIN supplier ON sk = s_suppkey
    CROSS JOIN bar
    WHERE ndom * ns * 10 >= 12 * td
    ORDER BY n_dominated_parts DESC, s_suppkey
    LIMIT 20
    """,
    section="2.3",
)
def tpch_q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 variant (excess-stock suppliers): suppliers who
    dominate the shipped volume of unusually many parts — "held
    more than half a part's availability" is re-anchored to "shipped
    more than half a part's 1997 volume" (no partsupp availqty), and
    the final bar is a scale-invariant ≥1.2×-mean dominance count
    in EXACT integer arithmetic (ndom·ns·10 ≥ 12·Σndom — no
    division). Top-20 with the s_suppkey tiebreak.

    Scale shape: one fact shuffle to (part, supplier) grain; the
    per-part totals reuse the pk partitioning; the dominance filter
    is a broadcast-total compare; the supplier dim broadcasts onto
    the bounded dominator set."""
    lo, hi = _ts("1997-01-01"), _ts("1998-01-01")
    orders = (
        t(spark, sf_dir, "orders")
        .filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .select("o_orderkey")
    )
    shipped = (
        t(spark, sf_dir, "lineitem")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk"))
        .agg(F.sum(F.round(F.col("l_quantity"), 0).cast("bigint")).cast("bigint").alias("sq"))
    )
    tot = shipped.groupBy("pk").agg(F.sum("sq").cast("bigint").alias("t"))
    dom = (
        shipped.join(tot, "pk")
        .filter(2 * F.col("sq") > F.col("t"))
        .groupBy("sk")
        .agg(F.count(F.lit(1)).cast("bigint").alias("ndom"))
    )
    bar = dom.agg(
        F.sum("ndom").cast("bigint").alias("td"),
        F.count(F.lit(1)).cast("bigint").alias("ns"),
    )
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        dom.crossJoin(F.broadcast(bar))
        .filter(F.col("ndom") * F.col("ns") * 10 >= 12 * F.col("td"))
        .join(F.broadcast(supp), F.col("sk") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", F.col("ndom").alias("n_dominated_parts"))
        .orderBy(F.col("n_dominated_parts").desc(), "s_suppkey")
        .limit(20)
    )
