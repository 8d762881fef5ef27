"""SepEvent cell-model mapping (SURVEY §1.1).

The reference's data unit ([R: sep-api/.../SepEvent.java —
UNVERIFIED]) is `SepEvent(table, row, keyValues, payload)` where
keyValues are HBase cells (row, column-family, qualifier, timestamp,
value, type) and type is the KeyValue mutation type — Put,
DeleteColumn, or DeleteFamily ([R: KeyValue.Type via
sep-api/.../SepEvent.java — UNVERIFIED]). `to_sep_events`
re-expresses the flat events feed in exactly that shape — one struct
row per event with its typed fields exploded into a cell bag — so
consumers written against the reference's model have a drop-in
DataFrame view.

All BinaryType values (HBase cells are untyped bytes; typing is the
consumer's job — SURVEY §1.1 'Untyped values'). Delete cells carry a
NULL value, exactly like an HBase tombstone: the mutation names the
(row, cf[, qualifier]) it kills, never a payload.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

OPS = ("put", "delete_column", "delete_family")


def to_sep_events(events: DataFrame, table_name: str = "events", op: Column | None = None) -> DataFrame:
    """events feed → SepEvent shape:
    (table, row_key, ts, op, key_values: array<struct<cf, qualifier,
    ts, value:binary, type>>, payload: binary).

    `op` is a Column evaluating to one of OPS per event (default: all
    puts). Put events carry their typed fields as cells under column
    family 'd' (data), each value UTF-8 bytes of its canonical string
    form, with the props blob as the payload (the PayloadExtractor's
    designated cell). A delete_family event carries ONE tombstone cell
    (cf='d', qualifier NULL, value NULL) and no payload; a
    delete_column event carries one NULL-valued tombstone per named
    qualifier. This mirrors HBase WAL entries, where a Delete is a
    mutation with row key + ts and value-less KeyValues.
    """
    if op is None:
        op = F.lit("put")

    def cell(qualifier: str, value_col):
        return F.struct(
            F.lit("d").alias("cf"),
            F.lit(qualifier).alias("qualifier"),
            F.col("ts").alias("cell_ts"),
            F.encode(value_col.cast("string"), "utf-8").alias("value"),
            F.lit("put").alias("type"),
        )

    def tombstone(qualifier, cell_type: str):
        return F.struct(
            F.lit("d").alias("cf"),
            qualifier.alias("qualifier"),
            F.col("ts").alias("cell_ts"),
            F.lit(None).cast("binary").alias("value"),
            F.lit(cell_type).alias("type"),
        )

    put_cells = F.array(
        cell("event_id", F.col("event_id")),
        cell("event_type", F.col("event_type")),
        cell("value", F.col("value")),
    )
    delete_family_cells = F.array(tombstone(F.lit(None).cast("string"), "delete_family"))
    delete_column_cells = F.array(tombstone(F.lit("value"), "delete_column"))

    return events.select(
        F.lit(table_name).alias("table"),
        F.col("user_id").cast("string").alias("row_key"),
        F.col("ts"),
        op.alias("op"),
        F.when(op == "delete_family", delete_family_cells)
        .when(op == "delete_column", delete_column_cells)
        .otherwise(put_cells)
        .alias("key_values"),
        F.when(op == "put", F.encode("props", "utf-8")).alias("payload"),
    )


def from_sep_events(sep: DataFrame) -> DataFrame:
    """Inverse mapping: SepEvent shape → typed flat feed (proves the
    cell model is lossless for puts; tombstones surface as NULL typed
    fields with their op preserved)."""

    def cell_value(qualifier: str):
        matches = F.filter(
            "key_values", lambda c: (c["qualifier"] == qualifier) & (c["type"] == "put")
        )
        # try_element_at: tombstone events have no put cells, and the
        # empty-array lookup must yield NULL, not an ANSI index error.
        return F.decode(F.try_element_at(matches, F.lit(1))["value"], "utf-8")

    return sep.select(
        cell_value("event_id").cast("long").alias("event_id"),
        F.col("ts"),
        F.col("row_key").cast("long").alias("user_id"),
        F.col("op"),
        cell_value("event_type").alias("event_type"),
        cell_value("value").cast("double").alias("value"),
        F.decode("payload", "utf-8").alias("props"),
    )


def latest_op_wins(
    df: DataFrame,
    key_cols=("user_id",),
    order_cols=("ts", "event_id"),
    op_col: str = "op",
) -> DataFrame:
    """Latest-op-wins snapshot of a mutation feed: per key, keep only
    the newest mutation; if that mutation is any delete, the key is
    ABSENT from the snapshot (HBase read-path semantics: a newer
    tombstone masks every older put). One window shuffle on the key —
    the same shape as latest-per-key, so it scales identically."""
    w = Window.partitionBy(*key_cols).orderBy(*[F.desc(c) for c in order_cols])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col(op_col) == "put"))
        .drop("_rn")
    )
