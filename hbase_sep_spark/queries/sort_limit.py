"""§2.6 Sort / limit / top-k.

Global sorts use Spark's range-partitioned TakeOrderedAndProject for
LIMIT (no full sort materialization — each partition keeps only its
top-N, then the driver merges N*P rows, which is what survives at
100 TB). Per-group top-k is the window row_number pattern: one
shuffle on the group key, no global sort at all.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hbase_sep_spark.io import t
from hbase_sep_spark.registry import register

SECTION = "2.6"


@register(
    "sort_multi_nulls",
    oracle="""
    SELECT c_custkey,
           nullif(c_mktsegment, 'BUILDING') AS seg_or_null,
           c_acctbal
    FROM customer
    ORDER BY seg_or_null DESC NULLS LAST, c_acctbal ASC NULLS FIRST, c_custkey
    """,
    section=SECTION,
)
def sort_multi_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column sort with explicit NULLS FIRST/LAST (nulls
    injected via nullif — base tables are null-free). The driver's
    hash is order-insensitive; the sort is still exercised in the
    plan (Sort node with the null-ordering spec)."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_or_null"),
        "c_acctbal",
    ).orderBy(
        F.col("seg_or_null").desc_nulls_last(),
        F.col("c_acctbal").asc_nulls_first(),
        F.col("c_custkey"),
    )


@register(
    "limit_topn",
    oracle="""
    SELECT l_orderkey,
           l_linenumber,
           CAST(l_extendedprice AS DOUBLE) * (1 - CAST(l_discount AS DOUBLE)) AS revenue
    FROM lineitem
    ORDER BY revenue DESC, l_orderkey, l_linenumber
    LIMIT 10
    """,
    section=SECTION,
)
def limit_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 by revenue, fully tie-broken. Plan check:
    TakeOrderedAndProject (per-partition top-10 + driver merge), not
    a global Sort."""
    li = t(spark, sf_dir, "lineitem")
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    return (
        li.select("l_orderkey", "l_linenumber", revenue)
        .orderBy(F.desc("revenue"), "l_orderkey", "l_linenumber")
        .limit(10)
    )


@register(
    "topk_per_group",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM (
        SELECT l_orderkey, l_linenumber, l_extendedprice,
               row_number() OVER (PARTITION BY l_orderkey
                                  ORDER BY l_extendedprice DESC, l_linenumber) AS rn
        FROM lineitem
    )
    WHERE rn <= 3
    """,
    section=SECTION,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 lineitems per order by price: the scalable per-group
    top-k (window + filter; Spark pushes a per-partition limit into
    the sort via WindowGroupLimit)."""
    w = Window.partitionBy("l_orderkey").orderBy(F.desc("l_extendedprice"), "l_linenumber")
    li = t(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )
