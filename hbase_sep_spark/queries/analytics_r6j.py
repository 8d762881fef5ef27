"""Round-6 lead-in, tenth block: co-occurrence lift / Spearman ρ.

- `events_type_cooccurrence_lift` — association-rule lift between
  event types co-occurring in the same (user, minute) basket:
  lift > 1 ⇒ the types travel together (the market-basket
  primitive, here reading "which feed operations cluster in time").
- `agg_spearman_corr` — Spearman rank correlation between each
  feed's daily value and time: the MONOTONIC-trend test that
  complements Pearson (agg_corr, linear) and Theil-Sen (slope
  magnitude) — ρ near ±1 with a small Pearson r flags a nonlinear
  but monotone drift.

Portability: lift's supports are exact integer basket counts (the
only float is the final ratio, 4 dp); Spearman's tie-averaged ranks
ride the rank()+(ties−1)/2 half-integer grid computed identically
on both engines, and the Pearson fold over 30 bounded points rounds
at 4 dp.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hbase_sep_spark.functions.portable import DEC, fin
from hbase_sep_spark.io import t
from hbase_sep_spark.registry import register


@register(
    "events_type_cooccurrence_lift",
    oracle="""
    WITH items AS (
        SELECT DISTINCT user_id,
               CAST(floor(epoch(ts) / 60) AS BIGINT) AS minute,
               event_type
        FROM events
    ),
    baskets AS (
        SELECT CAST(count(DISTINCT (user_id, minute)) AS BIGINT) AS nb
        FROM items
    ),
    per_type AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS nt
        FROM items GROUP BY event_type
    ),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(count(*) AS BIGINT) AS n_ab
        FROM items a JOIN items b
          ON a.user_id = b.user_id AND a.minute = b.minute
         AND a.event_type < b.event_type
        GROUP BY type_a, type_b
    )
    SELECT type_a, type_b, n_ab,
           round(CAST(n_ab AS DOUBLE) * nb / (CAST(x.nt AS DOUBLE) * y.nt), 4)
               + 0.0 AS lift
    FROM pairs
    JOIN per_type x ON type_a = x.event_type
    JOIN per_type y ON type_b = y.event_type
    CROSS JOIN baskets
    """,
    section="2.4",
)
def events_type_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket lift over (user, minute) baskets: for each
    unordered type pair, P(A∩B)/(P(A)·P(B)) — which operations
    cluster in the same instant of the same key's activity. All
    supports are exact integer basket counts; lift is the single
    rounded ratio.

    Scale shape: the basket item set is a distinct aggregate; the
    pair self-join is equi on the basket key with fan-out bounded
    by the TYPE-DOMAIN size per basket (≤C(5,2) pairs), never row
    count; per-type supports and the basket total broadcast onto
    the ≤10-row pair frame."""
    items = (
        t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.floor(F.col("ts").cast("long") / 60).cast("bigint").alias("minute"),
            "event_type",
        )
        .distinct()
    )
    baskets = items.select("user_id", "minute").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("nb")
    )
    per_type = items.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("nt")
    )
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.minute") == F.col("b.minute"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
    )
    px = per_type.select(F.col("event_type").alias("ta"), F.col("nt").alias("na"))
    py = per_type.select(F.col("event_type").alias("tb"), F.col("nt").alias("nb_t"))
    return (
        pairs.join(F.broadcast(px), F.col("type_a") == F.col("ta"))
        .join(F.broadcast(py), F.col("type_b") == F.col("tb"))
        .crossJoin(F.broadcast(baskets))
        .select(
            "type_a",
            "type_b",
            "n_ab",
            (
                F.round(
                    F.col("n_ab").cast("double")
                    * F.col("nb")
                    / (F.col("na").cast("double") * F.col("nb_t")),
                    4,
                )
                + F.lit(0.0)
            ).alias("lift"),
        )
    )


@register(
    "agg_spearman_corr",
    oracle="""
    WITH daily AS (
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS d,
               CAST(sum(CAST((CASE WHEN isnan(value) OR isinf(value)
                                   THEN NULL ELSE value END)
                             AS DECIMAL(18,6))) AS DOUBLE) AS v
        FROM events WHERE ts IS NOT NULL GROUP BY event_type, d
        HAVING v IS NOT NULL
    ),
    ranked AS (
        SELECT event_type,
               CAST(row_number() OVER (PARTITION BY event_type ORDER BY d)
                    AS DOUBLE) AS i,
               CAST(rank() OVER (PARTITION BY event_type ORDER BY v)
                    AS DOUBLE)
               + (CAST(count(*) OVER (PARTITION BY event_type, v) AS DOUBLE)
                  - 1) / 2 AS r
        FROM daily
    ),
    guarded AS (
        SELECT event_type, i, r,
               count(*) OVER wt >= 2
                 AND min(r) OVER wt <> max(r) OVER wt AS ok
        FROM ranked WINDOW wt AS (PARTITION BY event_type)
    )
    SELECT event_type,
           round(corr(CASE WHEN ok THEN i END, CASE WHEN ok THEN r END), 4)
               + 0.0 AS spearman_rho,
           CAST(count(*) AS BIGINT) AS n_days
    FROM guarded GROUP BY event_type
    """,
    section="2.4",
)
def agg_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between time and each feed's daily
    value: Pearson corr of (day index, tie-averaged value rank) —
    the monotonic-trend detector. Ranks use rank() + (ties−1)/2
    (exact half-integer grid, identical both engines); the corr
    fold spans the 30-row bounded daily frame and rounds at 4 dp;
    degenerate groups (one day, or all ranks tied) are nulled out
    before corr on both sides — ANSI Spark corr would otherwise
    throw where DuckDB returns NULL.

    Scale shape: daily-grain aggregate, then windows over the
    CALENDAR-BOUNDED per-type frame (30 rows/key) sharing one
    event_type exchange; the corr aggregate reuses the same
    partitioning.

    Non-finite measures pass the fin() gate before the decimal cast
    (ANSI CAST_OVERFLOW on NaN — round-7 non-finite sweep), and a day
    whose measures were ALL garbage (v IS NULL) is dropped before
    ranking on both sides: a NULL rank key would otherwise sort
    NULLS FIRST on Spark and NULLS LAST on DuckDB."""
    daily = (
        t(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())  # null-time dead-letter (round-8)
        .groupBy("event_type", F.date_format("ts", "yyyy-MM-dd").alias("d"))
        .agg(F.sum(fin("value").cast(DEC)).cast("double").alias("v"))
        .filter(F.col("v").isNotNull())
    )
    ranked = daily.select(
        "event_type",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("d"))
        .cast("double")
        .alias("i"),
        (
            F.rank()
            .over(Window.partitionBy("event_type").orderBy("v"))
            .cast("double")
            + (
                F.count(F.lit(1))
                .over(Window.partitionBy("event_type", "v"))
                .cast("double")
                - 1
            )
            / 2
        ).alias("r"),
    )
    # Degenerate-group guard (the ts_autocorrelation pattern): ANSI
    # corr throws DIVIDE_BY_ZERO on a 1-row or all-tied-rank group;
    # nulling both inputs degrades those to the safe n=0 → NULL case
    # identically on both engines. Same event_type exchange, no extra
    # shuffle; i = row_number always varies when n ≥ 2.
    wt = Window.partitionBy("event_type")
    ok = (F.count(F.lit(1)).over(wt) >= 2) & (
        F.min("r").over(wt) != F.max("r").over(wt)
    )
    guarded = ranked.select("event_type", "i", "r", ok.alias("ok"))
    return guarded.groupBy("event_type").agg(
        (
            F.round(
                F.corr(
                    F.when(F.col("ok"), F.col("i")),
                    F.when(F.col("ok"), F.col("r")),
                ),
                4,
            )
            + F.lit(0.0)
        ).alias("spearman_rho"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    )
