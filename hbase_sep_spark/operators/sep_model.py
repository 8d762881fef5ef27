"""SepEvent cell-model mapping (SURVEY §1.1).

The reference's data unit ([R: sep-api/.../SepEvent.java —
UNVERIFIED]) is `SepEvent(table, row, keyValues, payload)` where
keyValues are HBase cells (row, column-family, qualifier, timestamp,
value, type). `to_sep_events` re-expresses the flat events feed in
exactly that shape — one struct row per event with its typed fields
exploded into a cell bag — so consumers written against the
reference's model have a drop-in DataFrame view.

All BinaryType values (HBase cells are untyped bytes; typing is the
consumer's job — SURVEY §1.1 'Untyped values').
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def to_sep_events(events: DataFrame, table_name: str = "events") -> DataFrame:
    """events feed → SepEvent shape:
    (table, row_key, ts, key_values: array<struct<cf, qualifier,
    ts, value:binary, type>>, payload: binary).

    The payload carries the props blob (the PayloadExtractor's
    designated cell); the remaining typed fields become cells under
    column family 'd' (data), each value encoded as UTF-8 bytes of
    its canonical string form.
    """

    def cell(qualifier: str, value_col):
        return F.struct(
            F.lit("d").alias("cf"),
            F.lit(qualifier).alias("qualifier"),
            F.col("ts").alias("cell_ts"),
            F.encode(value_col.cast("string"), "utf-8").alias("value"),
            F.lit("put").alias("type"),
        )

    return events.select(
        F.lit(table_name).alias("table"),
        F.col("user_id").cast("string").alias("row_key"),
        F.col("ts"),
        F.array(
            cell("event_id", F.col("event_id")),
            cell("event_type", F.col("event_type")),
            cell("value", F.col("value")),
        ).alias("key_values"),
        F.encode("props", "utf-8").alias("payload"),
    )


def from_sep_events(sep: DataFrame) -> DataFrame:
    """Inverse mapping: SepEvent shape → typed flat feed (proves the
    cell model is lossless for this table)."""

    def cell_value(qualifier: str):
        matches = F.filter("key_values", lambda c: c["qualifier"] == qualifier)
        return F.decode(F.element_at(matches, 1)["value"], "utf-8")

    return sep.select(
        cell_value("event_id").cast("long").alias("event_id"),
        F.col("ts"),
        F.col("row_key").cast("long").alias("user_id"),
        cell_value("event_type").alias("event_type"),
        cell_value("value").cast("double").alias("value"),
        F.decode("payload", "utf-8").alias("props"),
    )
