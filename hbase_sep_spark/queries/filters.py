"""§2.2 Projection / filter / predicates.

Every query here compiles to a single parquet scan with the predicate
and projection pushed into the reader (verify: .explain('formatted')
shows PushedFilters + a pruned ReadSchema). No shuffle at all except
select_distinct (hash aggregate on the projected columns).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hbase_sep_spark.functions import json_int, json_int_sql
from hbase_sep_spark.io import t
from hbase_sep_spark.registry import register

SECTION = "2.2"


@register(
    "project_alias",
    oracle="""
    SELECT l_orderkey,
           l_linenumber,
           CAST(l_extendedprice AS DOUBLE) * (1 - CAST(l_discount AS DOUBLE)) AS revenue,
           l_quantity AS qty
    FROM lineitem
    """,
    section=SECTION,
)
def project_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column select + rename + computed expression. ReadSchema prunes
    to the 4 source columns.

    Deliberately UNrounded: per-row IEEE double arithmetic is bitwise
    deterministic across engines, while round() half-boundary modes
    differ (Spark HALF_UP on decimal repr vs DuckDB binary-nearest) —
    rounding is reserved for order-sensitive aggregates only.
    """
    return t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.col("l_quantity").alias("qty"),
    )


@register(
    "filter_eq",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE c_mktsegment = 'BUILDING'
    """,
    section=SECTION,
)
def filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


@register(
    "filter_range_between",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_date,
           l_quantity
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
      AND l_quantity BETWEEN 10 AND 20
    """,
    section=SECTION,
)
def filter_range_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range + BETWEEN on dates; both predicates push to parquet
    row-group stats, so non-matching row groups are skipped at scan.

    Output convention (engine-portable): DATE-typed result columns are
    emitted as ISO 'yyyy-MM-dd' strings — pandas date/datetime64
    coercion differs between engines and would break the value hash.
    """
    li = t(spark, sf_dir, "lineitem")
    ship_date = F.col("l_shipdate").cast("date")
    return (
        li.filter(
            ship_date.between(F.lit("1996-01-01").cast("date"), F.lit("1996-12-31").cast("date"))
            & F.col("l_quantity").between(10, 20)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
            "l_quantity",
        )
    )


@register(
    "filter_in",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_orderstatus
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
    section=SECTION,
)
def filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_orderkey", "o_orderpriority", "o_orderstatus")
    )


@register(
    "filter_like",
    oracle="""
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE p_type LIKE 'PROMO%' AND p_name LIKE '%ol%'
    """,
    section=SECTION,
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE predicates: prefix LIKE pushes down as StringStartsWith;
    infix LIKE evaluates in the scan stage (still one pass)."""
    return (
        t(spark, sf_dir, "part")
        .filter(F.col("p_type").like("PROMO%") & F.col("p_name").like("%ol%"))
        .select("p_partkey", "p_name", "p_type")
    )


@register(
    "filter_null_handling",
    oracle=f"""
    SELECT event_id,
           user_id,
           {json_int_sql()} AS k_val,
           CASE WHEN {json_int_sql()} IS NULL
                THEN 'missing' ELSE 'present' END AS k_state
    FROM events
    WHERE {json_int_sql()} IS NULL
       OR {json_int_sql()} > 50
    """,
    section=SECTION,
)
def filter_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS NULL / three-valued logic over a nullable JSON extraction
    (the reference's payloads are optional blobs — SURVEY §1.1)."""
    ev = t(spark, sf_dir, "events")
    k = json_int("props")
    return ev.select(
        "event_id",
        "user_id",
        k.alias("k_val"),
        F.when(k.isNull(), F.lit("missing")).otherwise(F.lit("present")).alias("k_state"),
    ).filter(F.col("k_val").isNull() | (F.col("k_val") > 50))


@register(
    "filter_boolean_combo",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity, l_discount
    FROM lineitem
    WHERE (l_returnflag = 'R' OR l_returnflag = 'A')
      AND NOT (l_discount < 0.02)
      AND (l_quantity > 45 OR (l_quantity < 5 AND l_linestatus = 'F'))
    """,
    section=SECTION,
)
def filter_boolean_combo(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        ((F.col("l_returnflag") == "R") | (F.col("l_returnflag") == "A"))
        & ~(F.col("l_discount") < 0.02)
        & ((F.col("l_quantity") > 45) | ((F.col("l_quantity") < 5) & (F.col("l_linestatus") == "F")))
    ).select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity", "l_discount")


@register(
    "select_distinct",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus
    FROM lineitem
    """,
    section=SECTION,
)
def select_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct projection → hash aggregate on the two columns; the
    partial aggregate collapses duplicates map-side before shuffle."""
    return t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()
