"""§2.1-adjacent: Put vs Delete mutation semantics (tombstones).

The reference's event unit carries a KeyValue mutation type — Put,
DeleteColumn, DeleteFamily ([R: KeyValue.Type via
sep-api/.../SepEvent.java — UNVERIFIED]; SURVEY §1.1 'Mutation
types'). A real CDC consumer sees deletes constantly: the snapshot
views here implement HBase read-path masking — a newer tombstone
hides every older put of what it names; a put newer than the
tombstone revives the cell.

The synthetic feed has no op column, so the mutation type is derived
deterministically: `error` events are the tombstones (documented
mapping, same on both engines). All snapshots are single-window
plans — the same one-shuffle shape as latest-per-key, so deletes add
zero scale cost.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hbase_sep_spark.io import t
from hbase_sep_spark.operators.sep_model import from_sep_events, latest_op_wins, to_sep_events
from hbase_sep_spark.registry import register

SECTION = "2.1"

# The deterministic op derivation for the synthetic feed. A function,
# not a module-level Column: building expressions requires an active
# SparkContext, which doesn't exist at registration time.
def _op() -> F.Column:
    return F.when(F.col("event_type") == "error", F.lit("delete_family")).otherwise(F.lit("put"))


_OP_SQL = "CASE WHEN event_type = 'error' THEN 'delete_family' ELSE 'put' END"


@register(
    "events_latest_op_wins",
    oracle=f"""
    SELECT user_id, event_id, event_type, value
    FROM (
        SELECT user_id, event_id, event_type, value,
               {_OP_SQL} AS op,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    WHERE rn = 1 AND op = 'put'
    """,
    section=SECTION,
)
def events_latest_op_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level tombstone snapshot: per key keep the newest mutation;
    if it is a delete the key is absent (a user whose last event is a
    tombstone has no current row). The delete-aware twin of
    events_latest_per_key."""
    ev = t(spark, sf_dir, "events").withColumn("op", _op())
    return latest_op_wins(ev).select("user_id", "event_id", "event_type", "value")


@register(
    "events_delete_column_mask",
    oracle=f"""
    WITH e AS (
        SELECT user_id, event_id, event_type, value, ts,
               {_OP_SQL.replace("'delete_family'", "'delete_column'")} AS op,
               max(CASE WHEN event_type = 'error' THEN ts END)
                   OVER (PARTITION BY user_id) AS max_del_ts
        FROM events
    )
    SELECT user_id, event_id, event_type,
           CASE WHEN max_del_ts IS NULL OR ts > max_del_ts THEN value END AS value
    FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM e WHERE op = 'put'
    )
    WHERE rn = 1
    """,
    section=SECTION,
)
def events_delete_column_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level tombstone (DeleteColumn): an `error` event kills
    only the `value` qualifier. The current row per user still comes
    from its newest put, but its value is NULL unless that put is
    newer than the newest tombstone (ties go to the delete, as in
    HBase). Both windows share one partition key → one shuffle."""
    op = F.when(F.col("event_type") == "error", F.lit("delete_column")).otherwise(F.lit("put"))
    wk = Window.partitionBy("user_id")
    ev = (
        t(spark, sf_dir, "events")
        .withColumn("op", op)
        .withColumn("max_del_ts", F.max(F.when(F.col("op") == "delete_column", F.col("ts"))).over(wk))
    )
    wo = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    live_value = F.when(
        F.col("max_del_ts").isNull() | (F.col("ts") > F.col("max_del_ts")), F.col("value")
    )
    return (
        ev.filter(F.col("op") == "put")
        .withColumn("rn", F.row_number().over(wo))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", live_value.alias("value"))
    )


@register(
    "events_tombstone_cell_model",
    oracle=f"""
    SELECT user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
           {_OP_SQL} AS op,
           CASE WHEN event_type = 'error' THEN NULL ELSE event_id END AS event_id,
           CASE WHEN event_type = 'error' THEN NULL ELSE value END AS value,
           CASE WHEN event_type = 'error' THEN NULL ELSE props END AS props
    FROM events
    """,
    section=SECTION,
)
def events_tombstone_cell_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SepEvent cell-model roundtrip WITH tombstones: delete events
    become value-less tombstone cells (operators/sep_model.py), and
    the inverse mapping surfaces them as NULL typed fields with the
    op preserved — proving the cell model carries mutation types
    losslessly, not just puts."""
    ev = t(spark, sf_dir, "events")
    back = from_sep_events(to_sep_events(ev, op=_op()))
    return back.select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        "op",
        "event_id",
        "value",
        "props",
    )
