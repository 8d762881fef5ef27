"""Round-5 analytics + pipeline extensions.

Five sql-hash operators extending the graded surface along axes the
existing registry does not yet cover: a running-distinct window (the
cardinality-over-time view of the change feed), feed inter-arrival
statistics (CDC health: how bursty is each key's event stream),
OHLC-style weekly resampling (the time-series downsampling primitive
behind every metrics rollup), a multi-rule corpus quality-gate
report (the per-rule rejection funnel a training-data pipeline
publishes with every snapshot), and a feed-offset contiguity audit
whose global rank is computed with the two-level bucket
decomposition instead of the oracle's single-partition window.

Every query has a full DuckDB oracle and follows
functions/portable.py's rules: integer/exact-decimal sums, rounded
aggregates only, deterministic composite tie-break keys, no per-row
rounding of exact arithmetic, no array/map output columns, identical
aliases both sides.

Reference parity: the reference (prazanna/hbase-sep, a CDC transport
library [R: path-level UNVERIFIED per SURVEY §0]) delivers ordered
per-key event streams; these operators re-express consumer-side
analytics a SEP subscriber would run over that feed.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hbase_sep_spark.io import t
from hbase_sep_spark.registry import register


@register(
    "win_running_distinct",
    oracle="""
    WITH flagged AS (
        SELECT user_id, event_id, ts,
               CASE WHEN row_number() OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts, event_id) = 1
                    THEN 1 ELSE 0 END AS f
        FROM events
    )
    SELECT user_id, event_id,
           CAST(sum(f) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT)
               AS n_distinct_types
    FROM flagged
    """,
    section="2.5",
)
def win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running distinct-count over a window — the one distinct form
    window frames can't express directly (COUNT(DISTINCT) OVER is
    unsupported in both engines): per user, how many distinct event
    types have been seen up to and including each event. Classic
    first-occurrence decomposition: flag each (user, type)'s first
    event, then running-sum the flags — integer arithmetic end to
    end, so the result is exact and order-independent.

    Scale shape: ONE user_id shuffle. The first-occurrence flag uses
    a lag() over (user_id ORDER BY event_type, ts, event_id) rather
    than the oracle's (user_id, event_type)-partitioned row_number,
    so both windows share the same hash partitioning and Catalyst
    plans a single Exchange with two sorts (pinned in
    tests/test_plans.py). State per row is O(1) in both passes."""
    ev = t(spark, sf_dir, "events")
    w_flag = Window.partitionBy("user_id").orderBy("event_type", "ts", "event_id")
    prev_type = F.lag("event_type").over(w_flag)
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        (prev_type.isNull() | (prev_type != F.col("event_type")))
        .cast("int")
        .alias("f"),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return flagged.select(
        "user_id",
        "event_id",
        F.sum("f").over(w_run).cast("int").alias("n_distinct_types"),
    )


@register(
    "events_interarrival_stats",
    oracle="""
    WITH g AS (
        SELECT user_id,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        FROM events
    )
    SELECT user_id,
           CAST(count(gap_us) AS BIGINT) AS n_gaps,
           CAST(min(gap_us) AS BIGINT) AS min_gap_us,
           CAST(max(gap_us) AS BIGINT) AS max_gap_us,
           round(CAST(sum(gap_us) AS BIGINT) / 1000000.0 / count(gap_us), 3)
               + 0.0 AS avg_gap_s
    FROM g WHERE gap_us IS NOT NULL
    GROUP BY user_id
    """,
    section="2.1",
)
def events_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key inter-arrival statistics over the change feed — the
    CDC burstiness profile (is this key a steady trickle or a bursty
    batch producer?) that sizes consumer buffers and watermark
    delays. Gaps are computed in integer microseconds (exact, no
    float drift); only the final average touches doubles.

    Scale shape: one user_id window (lag) feeding one
    map-side-combinable aggregate on the same key — Catalyst reuses
    the window's hash partitioning for the groupBy, so the plan has
    a single Exchange. The long-typed gap sum is exact at any count,
    order-independent by construction."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    g = ev.select(
        "user_id", (us - F.lag(us).over(w)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    return g.groupBy("user_id").agg(
        F.count("gap_us").cast("bigint").alias("n_gaps"),
        F.min("gap_us").cast("bigint").alias("min_gap_us"),
        F.max("gap_us").cast("bigint").alias("max_gap_us"),
        (
            F.round(
                F.sum("gap_us").cast("double")
                / F.lit(1000000.0)
                / F.count("gap_us"),
                3,
            )
            + F.lit(0.0)
        ).alias("avg_gap_s"),
    )


@register(
    "ts_weekly_ohlc",
    oracle="""
    SELECT user_id,
           strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
           arg_min(value, printf('%020d-%010d', epoch_us(ts), event_id))
               AS open_v,
           arg_max(value, printf('%020d-%010d', epoch_us(ts), event_id))
               AS close_v,
           min(value) AS low_v,
           max(value) AS high_v,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    section="2.5",
)
def ts_weekly_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC weekly resampling — the downsampling primitive behind
    every metrics rollup and candlestick view: per (user, week),
    the first (open) and last (close) observed value plus min/max
    and exact-decimal volume. First/last are picked by a composite
    '%020d-%010d' (epoch_us, event_id) string key, so ties on ts are
    broken identically on both engines and the pick is fully
    deterministic (the repo-wide event_id tie-break rule); open and
    close are raw per-row values (never rounded), the volume sum
    runs in exact decimal.

    Both engines' date_trunc('week') snaps to Monday, and the week
    is emitted as a yyyy-MM-dd STRING per the no-DATE-outputs rule.

    Scale shape: ONE map-side-combinable aggregate keyed
    (user_id, week) — min_by/max_by partials carry (value, key)
    pairs, so the shuffle moves one fixed-width pair per group per
    mapper, never the events. Single Exchange, pinned."""
    ev = t(spark, sf_dir, "events")
    okey = F.format_string("%020d-%010d", F.unix_micros("ts"), F.col("event_id"))
    return ev.groupBy(
        "user_id",
        F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd").alias("week"),
    ).agg(
        F.min_by("value", okey).alias("open_v"),
        F.max_by("value", okey).alias("close_v"),
        F.min("value").alias("low_v"),
        F.max("value").alias("high_v"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
        .cast("double")
        .alias("total_value"),
    )


@register(
    "pipeline_quality_gate_report",
    oracle="""
    WITH flags AS (
        SELECT doc_id,
               CASE WHEN n_chars < 80 THEN 1 ELSE 0 END AS too_short,
               CASE WHEN len(string_split(text, ' ')) < 25
                    THEN 1 ELSE 0 END AS too_few_tokens,
               CASE WHEN len(list_distinct(string_split(text, ' '))) * 1.0
                         / len(string_split(text, ' ')) < 0.4
                    THEN 1 ELSE 0 END AS low_diversity
        FROM documents
    ),
    agg AS (
        SELECT CAST(count(*) AS BIGINT) AS total,
               CAST(sum(too_short) AS BIGINT) AS r1,
               CAST(sum(too_few_tokens) AS BIGINT) AS r2,
               CAST(sum(low_diversity) AS BIGINT) AS r3,
               CAST(sum(CASE WHEN too_short = 0 AND too_few_tokens = 0
                                  AND low_diversity = 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS passed
        FROM flags
    )
    SELECT 'too_short' AS rule, r1 AS n_docs,
           round(r1 * 100.0 / total, 3) + 0.0 AS pct FROM agg
    UNION ALL SELECT 'too_few_tokens', r2,
           round(r2 * 100.0 / total, 3) + 0.0 FROM agg
    UNION ALL SELECT 'low_diversity', r3,
           round(r3 * 100.0 / total, 3) + 0.0 FROM agg
    UNION ALL SELECT 'passed_all', passed,
           round(passed * 100.0 / total, 3) + 0.0 FROM agg
    """,
    section="2.11",
)
def pipeline_quality_gate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus quality-gate report — the per-rule rejection funnel a
    training-data pipeline publishes with every snapshot: how many
    documents each filter rule rejects (length floor, token floor,
    lexical-diversity floor) and how many pass every gate. Rules are
    evaluated independently (a doc can fail several), so the counts
    diagnose WHICH gate dominates — the number the pipeline owner
    actually tunes.

    Scale shape: one pass over the corpus with per-row flag
    expressions (pure codegen — split/array_distinct/size, no UDF),
    one global map-side-combinable aggregate producing a 1-row
    partial per mapper, then a 4-row stack() pivot of that single
    row. Nothing after the aggregate is data-sized; at 100 TB the
    whole report costs one scan."""
    docs = t(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    flags = docs.select(
        F.when(F.col("n_chars") < 80, 1).otherwise(0).alias("too_short"),
        F.when(F.size(words) < 25, 1).otherwise(0).alias("too_few_tokens"),
        F.when(
            F.size(F.array_distinct(words)) * 1.0 / F.size(words) < 0.4, 1
        )
        .otherwise(0)
        .alias("low_diversity"),
    )
    agg = flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("total"),
        F.sum("too_short").cast("bigint").alias("r1"),
        F.sum("too_few_tokens").cast("bigint").alias("r2"),
        F.sum("low_diversity").cast("bigint").alias("r3"),
        F.sum(
            F.when(
                (F.col("too_short") == 0)
                & (F.col("too_few_tokens") == 0)
                & (F.col("low_diversity") == 0),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("passed"),
    )
    return agg.select(
        F.expr(
            "stack(4, 'too_short', r1, 'too_few_tokens', r2, "
            "'low_diversity', r3, 'passed_all', passed) AS (rule, n_docs)"
        ),
        "total",
    ).select(
        "rule",
        "n_docs",
        (F.round(F.col("n_docs") * 100.0 / F.col("total"), 3) + F.lit(0.0)).alias(
            "pct"
        ),
    )


@register(
    "events_offset_islands",
    oracle="""
    WITH received AS (
        SELECT event_id FROM events WHERE event_type <> 'error'
    ),
    r AS (
        SELECT event_id,
               event_id - row_number() OVER (ORDER BY event_id) AS k
        FROM received
    )
    SELECT CAST(min(event_id) AS BIGINT) AS island_start,
           CAST(max(event_id) AS BIGINT) AS island_end,
           CAST(count(*) AS BIGINT) AS n_offsets
    FROM r GROUP BY k
    """,
    section="2.1",
)
def events_offset_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguity audit of the feed's offset sequence — the CDC
    bookkeeping query behind every at-least-once consumer: which runs
    of offsets have been received (here: non-error events, errors
    standing in for unacked deliveries) and where the holes are.
    Classic gaps-and-islands: offset − global_rank is constant within
    a contiguous run.

    Scale shape — the point of this operator: the oracle's
    `row_number() OVER (ORDER BY event_id)` is a SINGLE-PARTITION
    window (the one window shape that cannot scale), so the impl
    computes the global rank with the two-level decomposition
    instead: per-bucket row_number (bucket = offset div 4096,
    partition-parallel) plus each bucket's cumulative predecessor
    count. The cumulative counts come from a window over the
    BUCKET-cardinality aggregate — 4096× smaller than the data, and
    at extreme scale the same decomposition recurses. The
    bucket-offset table broadcasts back; no data-sized single
    partition anywhere (pinned in tests/test_plans.py)."""
    ev = t(spark, sf_dir, "events")
    received = ev.filter(F.col("event_type") != "error").select("event_id")
    bucketed = received.withColumn("bucket", (F.col("event_id") / 4096).cast("long"))
    counts = bucketed.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "bucket",
        F.coalesce(F.sum("cnt").over(w_cum), F.lit(0)).alias("rank_before"),
    )
    w_bucket = Window.partitionBy("bucket").orderBy("event_id")
    ranked = bucketed.join(F.broadcast(offsets), "bucket").select(
        "event_id",
        (
            F.col("event_id")
            - (F.row_number().over(w_bucket) + F.col("rank_before"))
        ).alias("k"),
    )
    return ranked.groupBy("k").agg(
        F.min("event_id").cast("bigint").alias("island_start"),
        F.max("event_id").cast("bigint").alias("island_end"),
        F.count(F.lit(1)).cast("bigint").alias("n_offsets"),
    ).drop("k")
