"""Round-5 fifth-wave extensions: modern-surface coverage.

Three operators closing API-surface gaps the registry didn't yet
exercise: schema-evolution UNION (Spark `unionByName(
allowMissingColumns=True)` ↔ DuckDB `UNION ALL BY NAME` — the only
union form that survives a column being added mid-stream, which is
exactly what happens to a long-lived CDC feed), map higher-order
lambdas (map_zip_with / map_filter over a column-built map — the
dynamic-cell-bag algebra), and a leave-one-out window average
(DuckDB frames support `EXCLUDE CURRENT ROW`; Spark 4.1 does not —
probed this session — so the portable form subtracts the current
row from the inclusive frame, bit-equal on both engines via exact
integer-micros sums).

Every query follows functions/portable.py's rules; map/array values
never reach the output unserialized.

Reference parity: the reference (prazanna/hbase-sep [R: path-level
UNVERIFIED per SURVEY §0]) models rows as dynamic cell bags and its
feeds outlive schema changes; these are the consumer-side forms of
both properties.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hbase_sep_spark.functions import json_int, json_int_sql
from hbase_sep_spark.io import t
from hbase_sep_spark.registry import register


@register(
    "set_union_by_name_evolved",
    oracle="""
    WITH unioned AS (
        SELECT event_id, user_id, value
        FROM events WHERE event_id % 2 = 0
        UNION ALL BY NAME
        SELECT event_id, user_id, value, event_type AS channel
        FROM events WHERE event_id % 2 = 1
    )
    SELECT coalesce(channel, 'legacy') AS channel,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS total_value
    FROM unioned
    GROUP BY coalesce(channel, 'legacy')
    """,
    section="2.7",
)
def set_union_by_name_evolved(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: a feed's old epoch (3 columns) and new
    epoch (4 columns — `channel` was added mid-stream) union BY NAME
    with the missing column null-filled, then aggregate per channel
    with the legacy rows bucketed explicitly. Positional UNION would
    silently misalign or reject here; by-name union is the only form
    that survives additive schema evolution — the normal lifecycle of
    a long-lived CDC subscription.

    Scale shape: both branches are predicate-pushed scans of the same
    file (no shuffle to union — it's a bag concat), and the single
    aggregate is map-side combinable on the low-cardinality channel
    key."""
    ev = t(spark, sf_dir, "events")
    old = ev.filter(F.col("event_id") % 2 == 0).select("event_id", "user_id", "value")
    new = (
        ev.filter(F.col("event_id") % 2 == 1)
        .select("event_id", "user_id", "value", F.col("event_type").alias("channel"))
    )
    unioned = old.unionByName(new, allowMissingColumns=True)
    return unioned.groupBy(
        F.coalesce(F.col("channel"), F.lit("legacy")).alias("channel")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
        .cast("double")
        .alias("total_value"),
    )


@register(
    "map_lambda_ops",
    oracle=f"""
    WITH base AS (
        SELECT event_id,
               {json_int_sql(sql_type="BIGINT")} * 2 AS kk,
               CAST(user_id % 100 AS BIGINT) * 3 AS uu,
               TRY_CAST(floor(value) AS BIGINT) * 5 AS vv
        FROM events WHERE event_id <= 3000
    )
    SELECT event_id,
           coalesce(array_to_string(
               list_filter(
                   [CASE WHEN kk >= 100 THEN 'k:' || CAST(kk AS VARCHAR) END,
                    CASE WHEN uu >= 100 THEN 'u:' || CAST(uu AS VARCHAR) END,
                    CASE WHEN vv >= 100 THEN 'v:' || CAST(vv AS VARCHAR) END],
                   x -> x IS NOT NULL),
               ','), '') AS kept_entries,
           CAST(coalesce(kk >= 100, FALSE) AS INT)
               + CAST(coalesce(uu >= 100, FALSE) AS INT)
               + CAST(coalesce(vv >= 100, FALSE) AS INT) AS n_kept
    FROM base
    """,
    section="2.9",
)
def map_lambda_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order lambdas over the dynamic cell bag: build a
    3-entry map from columns, element-wise combine it with a literal
    weight map (map_zip_with), drop small entries (map_filter), and
    emit the survivors as a sorted `key:value` CSV (maps can't cross
    the driver canonicalizer). The oracle replays the same algebra on
    the flat columns — which is the point: the lambda pipeline is
    pure per-row codegen, semantically equal to the unrolled CASE
    form but written once against the bag, not once per key.

    Scale shape: zero shuffles — scan, per-row lambda evaluation in
    codegen (no Python), projection. Keys sort deterministically
    ('k' < 'u' < 'v' matches the unrolled oracle order)."""
    ev = t(spark, sf_dir, "events").filter(F.col("event_id") <= 3000)
    m = F.map_from_arrays(
        F.array(F.lit("k"), F.lit("u"), F.lit("v")),
        # BIGINT cell values + tolerant extraction: an int32 map cell
        # overflows under ANSI once value*weight passes 2^31 (round-6
        # extreme-value sweep — a 1e9-scale feed value is realistic),
        # and a mistyped payload must degrade to NULL, not crash.
        F.array(
            json_int("props", typ="long"),
            (F.col("user_id") % 100).cast("long"),
            F.floor(F.col("value")).try_cast("long"),
        ),
    )
    weights = F.map_from_arrays(
        F.array(F.lit("k"), F.lit("u"), F.lit("v")),
        F.array(F.lit(2).cast("long"), F.lit(3).cast("long"), F.lit(5).cast("long")),
    )
    zipped = F.map_zip_with(m, weights, lambda _k, a, b: a * b)
    kept = F.map_filter(zipped, lambda _k, x: x >= 100)
    entries = F.transform(
        F.array_sort(F.map_entries(kept)),
        lambda e: F.concat_ws(":", e["key"], e["value"].cast("string")),
    )
    return ev.select(
        "event_id",
        F.array_join(entries, ",").alias("kept_entries"),
        F.size(kept).cast("int").alias("n_kept"),
    )


@register(
    "win_leave_one_out_avg",
    oracle="""
    WITH f AS (
        SELECT user_id, event_id,
               sum(CAST(round(value * 1000000, 0) AS BIGINT)) OVER w
                   - CAST(round(value * 1000000, 0) AS BIGINT) AS loo_us,
               count(*) OVER w - 1 AS loo_n
        FROM events
        WHERE ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    )
    SELECT user_id, event_id,
           CASE WHEN loo_n > 0
                THEN CAST(round(CAST(CAST(CAST(loo_us AS DOUBLE) / 1000000.0 / loo_n AS VARCHAR) AS DECIMAL(38,18)), 4) AS DOUBLE) + 0.0
           END AS loo_avg
    FROM f
    """,
    section="2.5",
)
def win_leave_one_out_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out neighborhood average: each event's ±3-row frame
    mean EXCLUDING the event itself — the baseline every 'is this
    point anomalous vs its neighbors' check wants (including the
    point biases the baseline toward it). ANSI frames express this
    with EXCLUDE CURRENT ROW; DuckDB has it, Spark 4.1 does not
    (probed) — the portable decomposition subtracts the current row
    from the inclusive frame: sum(frame) - x over count(frame) - 1,
    with the sums in exact int64 micros (functions/portable's msum
    argument) so both engines compute identical integers before the
    single rounded division.

    Scale shape: one user_id shuffle, one sort, both frame aggregates
    evaluated in the same Window operator, O(frame) state per row.
    Null-time rows are dead-lettered on both sides (round-8 null-ts
    sweep)."""
    ev = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, 3)
    )
    micros = F.round(F.col("value") * F.lit(1000000), 0).cast("long")
    loo_sum = (F.sum(micros).over(w) - micros).cast("double")
    loo_cnt = F.count(F.lit(1)).over(w) - 1
    # Singleton partitions have no neighbors: guard the /0 (ANSI) and
    # emit NULL, mirrored by the oracle's CASE.
    loo = F.when(
        loo_cnt > 0,
        F.round(loo_sum / F.lit(1000000.0) / loo_cnt, 4) + F.lit(0.0),
    )
    return ev.select("user_id", "event_id", loo.alias("loo_avg"))
