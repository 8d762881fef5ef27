"""§2.7 Set operations.

UNION ALL is a zero-shuffle concatenation of children; the
distinct/intersect/except variants hash-aggregate on the full row —
Catalyst plans partial aggregation map-side so the shuffle carries
only distinct rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hbase_sep_spark.io import t
from hbase_sep_spark.registry import register

SECTION = "2.7"


def _purchases(spark, sf_dir):
    return (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "event_type")
    )


def _clicks(spark, sf_dir):
    return (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .select("user_id", "event_type")
    )


@register(
    "set_union_all",
    oracle="""
    SELECT user_id, event_type FROM events WHERE event_type = 'purchase'
    UNION ALL
    SELECT user_id, event_type FROM events WHERE event_type = 'click'
    """,
    section=SECTION,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _purchases(spark, sf_dir).unionByName(_clicks(spark, sf_dir))


@register(
    "set_union_distinct",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    UNION
    SELECT user_id FROM events WHERE event_type = 'click'
    """,
    section=SECTION,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _purchases(spark, sf_dir)
        .select("user_id")
        .union(_clicks(spark, sf_dir).select("user_id"))
        .distinct()
    )


@register(
    "set_intersect",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
    section=SECTION,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users who both purchased and hit errors (INTERSECT is
    set-semantics: deduplicated)."""
    purchases = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase").select("user_id")
    errors = t(spark, sf_dir, "events").filter(F.col("event_type") == "error").select("user_id")
    return purchases.intersect(errors)


@register(
    "set_except",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
    section=SECTION,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no pending orders (EXCEPT — the anti-join as a
    set op; compare join_left_anti for the join form). The status
    filter keeps the difference non-empty at every SF."""
    custs = t(spark, sf_dir, "customer").select("c_custkey")
    pending_custs = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "P")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return custs.exceptAll(pending_custs).distinct()


@register(
    "set_intersect_all",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    INTERSECT ALL
    SELECT user_id FROM events WHERE event_type = 'click'
    """,
    section=SECTION,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag intersect: per-user multiplicity = min(#purchases, #clicks)."""
    return (
        _purchases(spark, sf_dir)
        .select("user_id")
        .intersectAll(_clicks(spark, sf_dir).select("user_id"))
    )


@register(
    "set_except_all",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    EXCEPT ALL
    SELECT user_id FROM events WHERE event_type = 'click'
    """,
    section=SECTION,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag difference (EXCEPT ALL), completing the multiset pair
    with set_intersect_all: per-user multiplicity =
    max(0, #purchases − #clicks). Spark plans exceptAll as a
    count-and-replicate aggregate (sum of signed multiplicities then
    generate), not a per-row anti join — the same shape DuckDB uses,
    map-side-combinable and skew-tolerant at any scale."""
    return (
        _purchases(spark, sf_dir)
        .select("user_id")
        .exceptAll(_clicks(spark, sf_dir).select("user_id"))
    )
