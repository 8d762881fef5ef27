"""§2.1 Sources, sinks, and the CDC/event transport (reference core).

The reference (hbase-sep, a CDC transport over HBase replication —
SURVEY §1.1, [R: sep-impl/.../SepConsumer.java — UNVERIFIED]) delivers
per-row-ordered, at-least-once mutation events with opaque payloads.
These queries re-express each of its delivery semantics over the
`events` feed as declarative Spark plans; the live streaming analog
is hbase_sep_spark/streaming/ (§2.10 + the sep_events DataSource).
"""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hbase_sep_spark.functions import json_int, json_int_sql
from hbase_sep_spark.io import scratch_dir, t
from hbase_sep_spark.registry import register

SECTION = "2.1"


@register(
    "scan_parquet",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
    section=SECTION,
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain table scan, all columns (the HBase table-scan analog,
    columnar at rest per SURVEY §1.1)."""
    return t(spark, sf_dir, "nation")


@register(
    "scan_events_feed",
    oracle="""
    SELECT event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
           user_id, event_type, value, props
    FROM events
    """,
    section=SECTION,
)
def scan_events_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch replay of the change/event feed — the same schema the
    streaming sep_events source delivers (batch/stream duality,
    SURVEY §1.1 'Stream, not table').

    ts is emitted as a microsecond ISO string: the raw column is
    TIMESTAMP(µs) in Spark but TIMESTAMP_NS in DuckDB and the oracle
    compare must not depend on how the harness normalizes precision.
    """
    return t(spark, sf_dir, "events").select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        "user_id", "event_type", "value", "props",
    )


@register(
    "events_payload_extract",
    oracle=f"""
    SELECT event_id,
           user_id,
           event_type,
           {json_int_sql()} AS payload_k,
           value
    FROM events
    """,
    section=SECTION,
)
def events_payload_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed extraction from the opaque payload — the PayloadExtractor
    analog ([R: sep-api/.../BasePayloadExtractor.java — UNVERIFIED]):
    SEP pulls payload bytes from a designated cell; here a typed field
    from the JSON props blob."""
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        json_int("props").alias("payload_k"),
        "value",
    )


@register(
    "events_table_filter",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE event_type IN ('purchase', 'signup')
    """,
    section=SECTION,
)
def events_table_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subscription-scoped filtering: SEP subscriptions receive only
    replication-scoped tables/column-families; the analog is a
    predicate on the event class, pushed to the scan."""
    return (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "signup"))
        .select("event_id", "user_id", "event_type", "value")
    )


@register(
    "events_latest_per_key",
    oracle="""
    SELECT user_id, event_id, event_type, value
    FROM (
        SELECT user_id, event_id, event_type, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    WHERE rn = 1
    """,
    section=SECTION,
)
def events_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Current value' view — HBase latest-cell-version semantics
    (SURVEY §1.1 multi-version): newest event per row key."""
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        t(spark, sf_dir, "events")
        .select("user_id", "event_id", "event_type", "value", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "events_dedup_redelivery",
    oracle="""
    SELECT DISTINCT event_id, user_id, event_type, value
    FROM (
        SELECT event_id, user_id, event_type, value FROM events
        UNION ALL
        SELECT event_id, user_id, event_type, value FROM events
        WHERE user_id % 3 = 0
    )
    """,
    section=SECTION,
)
def events_dedup_redelivery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-least-once → exactly-once: SEP redelivers unacked batches
    ([R: sep-api/.../EventListener.java — UNVERIFIED]; listeners must
    be idempotent). Simulated by re-appending a slice of the feed,
    then deduplicating on the idempotency key."""
    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "value")
    redelivered = ev.filter(F.col("user_id") % 3 == 0)
    return ev.unionByName(redelivered).dropDuplicates(["event_id"])


@register(
    "events_per_key_ordered",
    oracle="""
    SELECT user_id,
           event_id,
           event_type,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS seq
    FROM events
    WHERE ts IS NOT NULL
    """,
    section=SECTION,
)
def events_per_key_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key ordered change log — the reference's one concurrency
    guarantee (row-hash → dedicated dispatch thread, [R: sep-impl/...
    /SepConsumer.java — UNVERIFIED]) as a sequence number per key."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        t(spark, sf_dir, "events")
        # null-time dead-letter (round-8 null-ts sweep): a record with
        # no event time has no position in the per-key order, and the
        # engines disagree on where NULL sorts (Spark NULLS FIRST,
        # DuckDB NULLS LAST).
        .filter(F.col("ts").isNotNull())
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.row_number().over(w).alias("seq"),
        )
    )


@register(
    "sink_parquet_roundtrip",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           CAST(round(sum(CAST((CASE WHEN isnan(value) OR isinf(value) THEN NULL ELSE value END) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY event_type
    """,
    section=SECTION,
)
def sink_parquet_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write an aggregate to parquet and read it back (sink + source
    round trip). The oracle recomputes the aggregate from the source
    feed — proving the sink round trip is lossless, not merely that
    it runs. Writes under the session scratch dir — never to the
    read-only testdata. Non-finite measures pass the fin() gate
    before dsum's decimal cast (ANSI CAST_OVERFLOW on NaN — round-7
    non-finite sweep)."""
    from hbase_sep_spark.functions import dsum, fin

    out = os.path.join(scratch_dir(spark, "sink"), "events_by_type")
    agg = (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(fin("value")).alias("sum_value"),
        )
    )
    agg.write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)


@register(
    "events_sep_cell_model",
    oracle="""
    SELECT event_id, user_id, event_type, value, props
    FROM events
    """,
    section=SECTION,
)
def events_sep_cell_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SepEvent cell-model roundtrip: flat feed → SepEvent shape
    (table, row_key, cell bag, payload — operators/sep_model.py,
    [R: sep-api/.../SepEvent.java — UNVERIFIED]) → back to the typed
    feed. The oracle is the identity: the cell model must be lossless."""
    from hbase_sep_spark.operators.sep_model import from_sep_events, to_sep_events

    ev = t(spark, sf_dir, "events")
    return from_sep_events(to_sep_events(ev)).select(
        "event_id", "user_id", "event_type", "value", "props"
    )


@register(
    "sink_bucketed_join",
    oracle="""
    SELECT l.l_orderkey,
           o.o_orderstatus,
           count(*) AS n_lines,
           CAST(round(sum(CAST(l.l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS order_total
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY l.l_orderkey, o.o_orderstatus
    """,
    section=SECTION,
)
def sink_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-table co-located join — the 100 TB shuffle-elimination
    story made concrete: lineitem is written once bucketed by
    l_orderkey (`bucketBy(8)` + saveAsTable), after which every join
    or aggregation on l_orderkey reads pre-partitioned buckets and
    skips its shuffle entirely (the plan shows no Exchange on the
    bucketed side). The oracle recomputes the same join+aggregate from
    the original tables — the bucketed path must be value-identical."""
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
    table_name = "lineitem_bucketed"
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    # A previous session may have left the managed location behind
    # (its catalog is gone, so DROP TABLE can't see it) — clear the
    # physical path too or saveAsTable fails LOCATION_ALREADY_EXISTS.
    import shutil
    from urllib.parse import urlparse

    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(os.path.join(warehouse, table_name), ignore_errors=True)
    (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_quantity", "l_extendedprice")
        .write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable(table_name)
    )
    bucketed = spark.table(table_name)
    per_order = bucketed.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,6)")), 2)
        .cast("double")
        .alias("order_total"),
    )
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    return per_order.join(o, per_order.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "o_orderstatus", "n_lines", "order_total"
    )


@register(
    "events_scd2_history",
    oracle="""
    SELECT user_id,
           event_id,
           value,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
           strftime(lead(ts) OVER w, '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
           (lead(ts) OVER w IS NULL) AS is_current
    FROM events
    WHERE ts IS NOT NULL
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    section=SECTION,
)
def events_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-2 history from the change feed: each event version of
    a key gets [valid_from, valid_to) effectivity and an is_current
    flag — the MERGE-INTO-free emulation (window lead over the
    ordered feed; with Delta/Iceberg this is the MERGE path). The
    other half of the SEP consumer story next to the latest-per-key
    snapshot."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    lead_ts = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        "event_id",
        "value",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("valid_from"),
        F.date_format(lead_ts, "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("valid_to"),
        lead_ts.isNull().alias("is_current"),
    )


@register(
    "sink_partitioned_prune",
    oracle="""
    SELECT event_id, user_id, event_type, value,
           strftime(ts, '%Y-%m-%d') AS event_date
    FROM events
    WHERE strftime(ts, '%Y-%m-%d') IN ('2024-01-05', '2024-01-06')
    """,
    section=SECTION,
)
def sink_partitioned_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-partitioned sink + partition-pruned read — the standard
    100 TB CDC landing layout: events written
    `partitionBy(event_date)`, then a two-day query reads ONLY those
    two directories (the plan's PartitionFilters prune the rest;
    asserted in tests/test_plans.py). The oracle recomputes the same
    slice from the original feed, proving the layout is lossless and
    the pruned read complete. The read pins the WRITER's schema
    instead of inferring: an empty feed writes zero partitions and
    schema inference then fails outright (round-7 empty-feed sweep)
    — and at 100 TB the schema comes from the table catalog anyway,
    never from footer sniffing."""
    out = os.path.join(scratch_dir(spark, "sink"), "events_by_date")
    ev = t(spark, sf_dir, "events").withColumn(
        "event_date", F.date_format("ts", "yyyy-MM-dd")
    )
    written = ev.select("event_id", "user_id", "event_type", "value", "event_date")
    written.write.mode("overwrite").partitionBy("event_date").parquet(out)
    return (
        spark.read.schema(written.schema).parquet(out)
        .filter(F.col("event_date").isin("2024-01-05", "2024-01-06"))
        .select("event_id", "user_id", "event_type", "value", F.col("event_date").cast("string"))
    )


@register("sink_compaction", oracle=None, section=SECTION)
def sink_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the table-maintenance op every
    long-running CDC sink needs: a fragmented landing zone (40
    per-batch files) is rewritten into a few right-sized files.
    Returns before/after file counts + row totals (rows-only; the
    invariant is rows_before == rows_after and files shrink)."""
    import glob
    import shutil

    root = os.path.join(scratch_dir(spark, "compaction"))
    shutil.rmtree(root, ignore_errors=True)
    frag, compact = os.path.join(root, "frag"), os.path.join(root, "compact")

    ev = t(spark, sf_dir, "events")
    ev.repartition(40).write.mode("overwrite").parquet(frag)
    fragmented = spark.read.parquet(frag)
    n_files_before = len(glob.glob(f"{frag}/part-*.parquet"))
    fragmented.coalesce(4).write.mode("overwrite").parquet(compact)
    n_files_after = len(glob.glob(f"{compact}/part-*.parquet"))
    compacted = spark.read.parquet(compact)
    return spark.createDataFrame(
        [
            (
                n_files_before,
                n_files_after,
                fragmented.count(),
                compacted.count(),
            )
        ],
        "files_before int, files_after int, rows_before long, rows_after long",
    ).withColumn("lossless", F.col("rows_before") == F.col("rows_after"))


@register(
    "events_compact_changelog",
    oracle="""
    WITH states AS (
        SELECT user_id, event_id, ts,
               CAST(floor((CASE WHEN isnan(value) OR isinf(value) THEN NULL ELSE value END) / 100) AS BIGINT) AS state
        FROM events
        WHERE ts IS NOT NULL
    ),
    ordered AS (
        SELECT user_id, event_id, ts, state,
               lag(state) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_state
        FROM states
    )
    SELECT user_id, event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
           state
    FROM ordered
    WHERE prev_state IS NULL OR state <> prev_state
    """,
    section=SECTION,
)
def events_compact_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog compaction — drop no-op updates: a CDC feed often
    re-emits a row whose materialized cell did not actually change
    (touch writes, full-row upserts); a consumer building history
    only needs TRANSITIONS. The materialized cell here is the
    value's century bucket (the fixture's raw doubles never repeat,
    so the bucket stands in for a real row's coarse state — ~20% of
    updates are no-ops at this granularity). Keep each key's first
    version and every version whose state differs from its
    predecessor — one window lag over the per-key order, no
    self-join. (HBase itself drops identical cell versions at
    compaction; this is that semantics over the feed.) A non-finite
    measure maps to a NULL state via the fin() gate (ANSI
    CAST_OVERFLOW otherwise — round-7 non-finite sweep); the
    NULL-vs-prev comparison then follows identical 3VL on both
    engines."""
    from pyspark.sql import Window

    from hbase_sep_spark.functions import fin

    ev = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    state = F.floor(fin("value") / 100).cast("long")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    with_state = ev.select("user_id", "event_id", "ts", state.alias("state"))
    prev = F.lag("state").over(w)
    return (
        with_state.withColumn("prev_state", prev)
        .filter(F.col("prev_state").isNull() | (F.col("state") != F.col("prev_state")))
        .select(
            "user_id",
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
            "state",
        )
    )
