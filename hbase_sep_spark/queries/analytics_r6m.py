"""Round-6 lead-in, thirteenth block: consumer rebalance planning.

`events_consumer_rebalance_plan` — the SEP-operations planning op:
assign per-key feed volumes to 8 consumer slots by sorted
round-robin (heaviest keys dealt first, one per slot, then wrap) —
the classic LPT-flavored heuristic that a consumer-group
coordinator runs before repartitioning a hot feed. Reports each
slot's key count, total load, and the fleet imbalance factor
(max slot load ÷ ideal).

Portability: loads are exact integer counts; the global volume rank
rides the two-level bucket decomposition; slot assignment is pure
modular arithmetic; the imbalance ratio is the only rounded float.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hbase_sep_spark.io import t
from hbase_sep_spark.registry import register

_SLOTS = 8


@register(
    "events_consumer_rebalance_plan",
    oracle=f"""
    WITH vol AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS x
        FROM events GROUP BY user_id
    ),
    ranked AS (
        SELECT x,
               row_number() OVER (ORDER BY x DESC, user_id) AS r
        FROM vol
    ),
    slotted AS (
        SELECT CAST((r - 1) % {_SLOTS} AS INT) AS slot, x
        FROM ranked
    ),
    agg AS (
        SELECT slot, CAST(count(*) AS BIGINT) AS n_keys,
               CAST(sum(x) AS BIGINT) AS load
        FROM slotted GROUP BY slot
    )
    SELECT slot, n_keys, load,
           round(CAST(max(load) OVER () AS DOUBLE) * {_SLOTS}
                 / CAST(sum(load) OVER () AS BIGINT), 4) + 0.0
               AS imbalance
    FROM agg
    """,
    section="2.4",
)
def events_consumer_rebalance_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consumer-group rebalance plan: deal per-key volumes across 8
    slots in descending-volume round-robin (rank r → slot
    (r−1) mod 8) and report each slot's key count, load, and the
    common imbalance factor max·slots/total (1.0 = perfect). The
    heuristic guarantees no slot carries two of the top-8 keys —
    what a naive hash assignment cannot promise on a skewed feed.

    Scale shape: one per-key aggregate; the descending volume rank
    uses the two-level bucket decomposition (bucket counts →
    bucket-frame cumulative → broadcast offsets → parallel
    within-bucket rank — a global ordered window over keys would
    serialize); slot arithmetic and the 8-row imbalance windows are
    constant-space."""
    vol = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    # Descending two-level rank: bucket by -x so bucket order matches
    # the descending sort, offsets count the keys in heavier buckets.
    bucketed = vol.withColumn("bucket", F.floor(-F.col("x") / 16.0).cast("long"))
    bcounts = bucketed.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = bcounts.select(
        "bucket",
        F.coalesce(F.sum("cnt").over(w_cum), F.lit(0)).cast("bigint").alias("before"),
    )
    w_in = Window.partitionBy("bucket").orderBy(F.col("x").desc(), "user_id")
    ranked = bucketed.join(F.broadcast(offsets), "bucket").select(
        "x",
        (F.row_number().over(w_in) + F.col("before")).cast("bigint").alias("r"),
    )
    slotted = ranked.select(
        ((F.col("r") - 1) % _SLOTS).cast("int").alias("slot"), "x"
    )
    agg = slotted.groupBy("slot").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("x").cast("bigint").alias("load"),
    )
    wall = Window.partitionBy()
    return agg.select(
        "slot",
        "n_keys",
        "load",
        (
            F.round(
                F.max("load").over(wall).cast("double")
                * _SLOTS
                / F.sum("load").over(wall).cast("bigint"),
                4,
            )
            + F.lit(0.0)
        ).alias("imbalance"),
    )
