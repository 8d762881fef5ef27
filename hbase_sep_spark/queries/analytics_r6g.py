"""Round-6 lead-in, seventh block: Kolmogorov-Smirnov drift test.

`agg_ks_test` completes the two-sample drift-test trio — χ²
(categorical mix), Mann-Whitney U (location / AUC), and now KS
(ANY distributional difference: the sup-norm gap between the two
empirical CDFs). KS is the test feed-monitoring reaches for when it
can't name the alternative: location, scale, or shape shifts all
move D.

Portability: the empirical CDFs evaluate on exact integer
cumulative counts via the two-level bucket decomposition; the CDF
gap and the 5% critical value derive with identical double
expressions on both engines, so the max, the 6-dp round, and the
reject flag cannot diverge.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hbase_sep_spark.functions.portable import fin
from hbase_sep_spark.io import t
from hbase_sep_spark.registry import register


@register(
    "agg_ks_test",
    oracle="""
    WITH vals AS (
        SELECT value AS v,
               CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS a
        FROM events
        WHERE value IS NOT NULL AND NOT (isnan(value) OR isinf(value))
    ),
    grouped AS (
        SELECT v, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(a) AS BIGINT) AS na
        FROM vals GROUP BY v
    ),
    ranked AS (
        SELECT CAST(sum(na) OVER w AS BIGINT) AS cuma,
               CAST(sum(n - na) OVER w AS BIGINT) AS cumb
        FROM grouped
        WINDOW w AS (ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    tot AS (
        SELECT CAST(max(cuma) AS BIGINT) AS n1,
               CAST(max(cumb) AS BIGINT) AS n2
        FROM ranked
    ),
    d AS (
        SELECT max(CASE WHEN n1 > 0 AND n2 > 0
                   THEN abs(CAST(cuma AS DOUBLE) / n1
                            - CAST(cumb AS DOUBLE) / n2)
                   ELSE 0.0 END) AS ks
        FROM ranked, tot
    )
    SELECT n1 AS n_weekend, n2 AS n_weekday,
           round(ks, 6) + 0.0 AS ks_d,
           CASE WHEN n1 > 0 AND n2 > 0
                THEN round(1.358 * sqrt((CAST(n1 AS DOUBLE) + n2)
                                        / (CAST(n1 AS DOUBLE) * n2)),
                           6) + 0.0
                ELSE CAST(NULL AS DOUBLE) END AS crit_5pct,
           CAST(CASE WHEN n1 > 0 AND n2 > 0
                      AND ks > 1.358 * sqrt((CAST(n1 AS DOUBLE) + n2)
                                            / (CAST(n1 AS DOUBLE) * n2))
                     THEN 1 ELSE 0 END AS INT) AS reject_5pct
    FROM d, tot
    """,
    section="2.4",
)
def agg_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test, weekend vs weekday event
    values: D = sup|F̂₁ − F̂₂| over the pooled support, against the
    1.358·√((n₁+n₂)/(n₁n₂)) large-sample 5% critical value. The CDF
    gap only changes at observed values, so evaluating at each
    distinct value is exact, and both CDFs come from integer
    cumulative counts; gap, critical value, and flag use mirrored
    double arithmetic, all guarded on n1>0 AND n2>0 so an
    empty-class fixture degrades identically (Spark nulls a zero
    division where DuckDB yields inf/NaN).

    Scale shape: ties collapse in the per-value aggregate; the
    data-sized cumulative window partitions by value-range bucket
    with broadcast bucket offsets (the gini/Mann-Whitney two-level
    pattern — the oracle's single global ordered window is the
    thing that cannot scale); the final fold carries four numbers."""
    weekend = F.dayofweek("ts").isin(1, 7)
    # NULL and non-finite values drop on BOTH sides (the Mann-Whitney
    # rationale: the bucket equi-join would silently drop the NULL
    # bucket while the oracle's global window ranks it; and the
    # engines disagree on WHERE NaN ranks — Spark IEEE vs DuckDB
    # total order. A rank statistic over garbage is meaningless:
    # skip, don't guess).
    grouped = (
        t(spark, sf_dir, "events")
        .filter(fin("value").isNotNull())
        .select(F.col("value").alias("v"), F.when(weekend, 1).otherwise(0).alias("a"))
        .groupBy("v")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("a").cast("bigint").alias("na"),
        )
    )
    bucketed = grouped.withColumn("bucket", F.floor(F.col("v") / 16.0).cast("long"))
    bcounts = bucketed.groupBy("bucket").agg(
        F.sum("na").alias("ba"), F.sum(F.col("n") - F.col("na")).alias("bb")
    )
    w_cum = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = bcounts.select(
        "bucket",
        F.coalesce(F.sum("ba").over(w_cum), F.lit(0)).cast("bigint").alias("beforea"),
        F.coalesce(F.sum("bb").over(w_cum), F.lit(0)).cast("bigint").alias("beforeb"),
    )
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = bucketed.join(F.broadcast(offsets), "bucket").select(
        (F.sum("na").over(w_in) + F.col("beforea")).cast("bigint").alias("cuma"),
        (F.sum(F.col("n") - F.col("na")).over(w_in) + F.col("beforeb"))
        .cast("bigint")
        .alias("cumb"),
    )
    tot = ranked.agg(
        F.max("cuma").cast("bigint").alias("n1"),
        F.max("cumb").cast("bigint").alias("n2"),
    )
    both = (F.col("n1") > 0) & (F.col("n2") > 0)
    d = (
        ranked.crossJoin(F.broadcast(tot))
        .agg(
            F.max(
                F.when(
                    both,
                    F.abs(
                        F.col("cuma").cast("double") / F.col("n1")
                        - F.col("cumb").cast("double") / F.col("n2")
                    ),
                ).otherwise(F.lit(0.0))
            ).alias("ks"),
            F.max("n1").alias("n1"),
            F.max("n2").alias("n2"),
        )
    )
    crit = 1.358 * F.sqrt(
        (F.col("n1").cast("double") + F.col("n2"))
        / (F.col("n1").cast("double") * F.col("n2"))
    )
    return d.select(
        F.col("n1").alias("n_weekend"),
        F.col("n2").alias("n_weekday"),
        (F.round(F.col("ks"), 6) + F.lit(0.0)).alias("ks_d"),
        F.when(both, F.round(crit, 6) + F.lit(0.0))
        .otherwise(F.lit(None).cast("double"))
        .alias("crit_5pct"),
        F.when(both & (F.col("ks") > crit), 1)
        .otherwise(0)
        .cast("int")
        .alias("reject_5pct"),
    )
