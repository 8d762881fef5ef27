"""Round-6 lead-in, eleventh block: profiling / OLS / drawdown.

- `scan_table_profile` — the ANALYZE-style column profile every
  engine ships: per-column null count, distinct count, min, max as
  one narrow (column, …) report over lineitem's measure columns.
- `agg_ols_two_factor` — two-predictor least squares (extended
  price ~ quantity + discount) solved in closed form from exact
  decimal moment sums via Cramer's rule — the multi-factor upgrade
  of agg_regr_slope, still with zero iteration and zero UDFs.
- `ts_max_drawdown` — per-feed maximum drawdown (largest peak-to-
  trough drop of the daily value series): the worst-case-decline
  lens on feed volume that complements CUSUM's mean-shift lens.

Portability: profile min/max format at the input's own 2-decimal
precision; all OLS moments are ≤4-decimal products recovered
exactly by DECIMAL(18,6), and the Cramer determinants evaluate
with mirrored double expressions; drawdown differences sit on the
2-decimal grid and the peak-equality filter compares identically-
derived doubles.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hbase_sep_spark.functions.portable import DEC, fin
from hbase_sep_spark.io import t
from hbase_sep_spark.registry import register


def _fmt2(col: F.Column) -> F.Column:
    """2-dp string formatting via round-then-decimal-cast, NOT printf:
    Java format_string %.2f rounds HALF_UP where DuckDB printf is C
    round-half-even, so a .xx5 tie would diverge. round() first (Spark
    HALF_UP == DuckDB half-away-from-zero on an exact grid point, and
    never a tie on ≤2-decimal inputs), nz the -0.0, then DECIMAL(18,2)
    → string renders the fixed 2-dp form identically on both engines.
    SQL mirror: CAST(CAST(round(x, 2) + 0.0 AS DECIMAL(18,2)) AS VARCHAR).
    """
    return (F.round(col, 2) + F.lit(0.0)).cast("decimal(18,2)").cast("string")


@register(
    "scan_table_profile",
    oracle="""
    WITH s AS (
        SELECT CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS q_null,
               CAST(count(DISTINCT l_quantity) AS BIGINT) AS q_dist,
               CAST(CAST(round(min(l_quantity), 2) + 0.0 AS DECIMAL(18,2)) AS VARCHAR) AS q_min,
               CAST(CAST(round(max(l_quantity), 2) + 0.0 AS DECIMAL(18,2)) AS VARCHAR) AS q_max,
               CAST(sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS p_null,
               CAST(count(DISTINCT l_extendedprice) AS BIGINT) AS p_dist,
               CAST(CAST(round(min(l_extendedprice), 2) + 0.0 AS DECIMAL(18,2)) AS VARCHAR) AS p_min,
               CAST(CAST(round(max(l_extendedprice), 2) + 0.0 AS DECIMAL(18,2)) AS VARCHAR) AS p_max,
               CAST(sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS d_null,
               CAST(count(DISTINCT l_discount) AS BIGINT) AS d_dist,
               CAST(CAST(round(min(l_discount), 2) + 0.0 AS DECIMAL(18,2)) AS VARCHAR) AS d_min,
               CAST(CAST(round(max(l_discount), 2) + 0.0 AS DECIMAL(18,2)) AS VARCHAR) AS d_max,
               CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS f_null,
               CAST(count(DISTINCT l_returnflag) AS BIGINT) AS f_dist,
               min(l_returnflag) AS f_min,
               max(l_returnflag) AS f_max
        FROM lineitem
    )
    SELECT 'l_quantity' AS col, q_null AS n_null, q_dist AS n_distinct,
           q_min AS min_val, q_max AS max_val FROM s
    UNION ALL SELECT 'l_extendedprice', p_null, p_dist, p_min, p_max FROM s
    UNION ALL SELECT 'l_discount', d_null, d_dist, d_min, d_max FROM s
    UNION ALL SELECT 'l_returnflag', f_null, f_dist, f_min, f_max FROM s
    """,
    section="2.1",
)
def scan_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profile of lineitem's measure columns:
    null count, exact distinct count, min, max — the
    data-quality/table-stats report that seeds CBO statistics and
    ingest validation. Doubles format at their native 2-decimal
    precision via `_fmt2` (round-then-decimal-cast — printf tie
    semantics differ between engines); strings pass through.

    Scale shape: ONE scan, one global aggregate carrying all 16
    statistics (distinct counts expand to grouping sets internally
    but stay map-side partial), then a constant 4-row stack —
    per-column scans would read the table four times."""
    li = t(spark, sf_dir, "lineitem")
    s = li.agg(
        F.sum(F.when(F.col("l_quantity").isNull(), 1).otherwise(0)).cast("bigint").alias("q_null"),
        F.count_distinct(F.col("l_quantity")).cast("bigint").alias("q_dist"),
        _fmt2(F.min("l_quantity")).alias("q_min"),
        _fmt2(F.max("l_quantity")).alias("q_max"),
        F.sum(F.when(F.col("l_extendedprice").isNull(), 1).otherwise(0)).cast("bigint").alias("p_null"),
        F.count_distinct(F.col("l_extendedprice")).cast("bigint").alias("p_dist"),
        _fmt2(F.min("l_extendedprice")).alias("p_min"),
        _fmt2(F.max("l_extendedprice")).alias("p_max"),
        F.sum(F.when(F.col("l_discount").isNull(), 1).otherwise(0)).cast("bigint").alias("d_null"),
        F.count_distinct(F.col("l_discount")).cast("bigint").alias("d_dist"),
        _fmt2(F.min("l_discount")).alias("d_min"),
        _fmt2(F.max("l_discount")).alias("d_max"),
        F.sum(F.when(F.col("l_returnflag").isNull(), 1).otherwise(0)).cast("bigint").alias("f_null"),
        F.count_distinct(F.col("l_returnflag")).cast("bigint").alias("f_dist"),
        F.min("l_returnflag").alias("f_min"),
        F.max("l_returnflag").alias("f_max"),
    )
    return s.select(
        F.expr(
            "stack(4, "
            "'l_quantity', q_null, q_dist, q_min, q_max, "
            "'l_extendedprice', p_null, p_dist, p_min, p_max, "
            "'l_discount', d_null, d_dist, d_min, d_max, "
            "'l_returnflag', f_null, f_dist, f_min, f_max) "
            "AS (col, n_null, n_distinct, min_val, max_val)"
        )
    )


@register(
    "agg_ols_two_factor",
    oracle="""
    WITH s AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sx1,
               CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) AS sx2,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sy,
               CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS s11,
               CAST(sum(CAST(l_quantity * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS s12,
               CAST(sum(CAST(l_discount * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS s22,
               CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS s1y,
               CAST(sum(CAST(l_discount * l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS s2y
        FROM lineitem
    ),
    d AS (
        SELECT *,
               n * (s11 * s22 - s12 * s12)
               - sx1 * (sx1 * s22 - s12 * sx2)
               + sx2 * (sx1 * s12 - s11 * sx2) AS det
        FROM s
    )
    SELECT round((sy * (s11 * s22 - s12 * s12)
                  - sx1 * (s1y * s22 - s12 * s2y)
                  + sx2 * (s1y * s12 - s11 * s2y)) / det, 4) + 0.0
               AS intercept,
           round((n * (s1y * s22 - s12 * s2y)
                  - sy * (sx1 * s22 - s12 * sx2)
                  + sx2 * (sx1 * s2y - s1y * sx2)) / det, 4) + 0.0
               AS beta_qty,
           round((n * (s11 * s2y - s1y * s12)
                  - sx1 * (sx1 * s2y - s1y * sx2)
                  + sy * (sx1 * s12 - s11 * sx2)) / det, 4) + 0.0
               AS beta_disc
    FROM d
    """,
    section="2.4",
)
def agg_ols_two_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-predictor least squares in closed form: fit
    extendedprice ~ quantity + discount from the nine moment sums
    and solve the 3×3 normal equations by Cramer's rule — multiple
    regression as ONE aggregate pass, no iteration, no UDF. Every
    moment is a ≤4-decimal product recovered exactly by the decimal
    cast (order-independent); the determinant arithmetic mirrors
    expression-for-expression on both engines so the 4-dp rounds
    see identical doubles.

    Scale shape: one scan, one global 9-sum aggregate (map-side
    combined), constant-space solve."""
    li = t(spark, sf_dir, "lineitem")
    q, dc, y = F.col("l_quantity"), F.col("l_discount"), F.col("l_extendedprice")
    s = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(q.cast(DEC)).cast("double").alias("sx1"),
        F.sum(dc.cast(DEC)).cast("double").alias("sx2"),
        F.sum(y.cast(DEC)).cast("double").alias("sy"),
        F.sum((q * q).cast(DEC)).cast("double").alias("s11"),
        F.sum((q * dc).cast(DEC)).cast("double").alias("s12"),
        F.sum((dc * dc).cast(DEC)).cast("double").alias("s22"),
        F.sum((q * y).cast(DEC)).cast("double").alias("s1y"),
        F.sum((dc * y).cast(DEC)).cast("double").alias("s2y"),
    )
    n, sx1, sx2, sy = F.col("n"), F.col("sx1"), F.col("sx2"), F.col("sy")
    s11, s12, s22 = F.col("s11"), F.col("s12"), F.col("s22")
    s1y, s2y = F.col("s1y"), F.col("s2y")
    det = (
        n * (s11 * s22 - s12 * s12)
        - sx1 * (sx1 * s22 - s12 * sx2)
        + sx2 * (sx1 * s12 - s11 * sx2)
    )
    intercept = (
        sy * (s11 * s22 - s12 * s12)
        - sx1 * (s1y * s22 - s12 * s2y)
        + sx2 * (s1y * s12 - s11 * s2y)
    ) / det
    beta_qty = (
        n * (s1y * s22 - s12 * s2y)
        - sy * (sx1 * s22 - s12 * sx2)
        + sx2 * (sx1 * s2y - s1y * sx2)
    ) / det
    beta_disc = (
        n * (s11 * s2y - s1y * s12)
        - sx1 * (sx1 * s2y - s1y * sx2)
        + sy * (sx1 * s12 - s11 * sx2)
    ) / det
    return s.select(
        (F.round(intercept, 4) + F.lit(0.0)).alias("intercept"),
        (F.round(beta_qty, 4) + F.lit(0.0)).alias("beta_qty"),
        (F.round(beta_disc, 4) + F.lit(0.0)).alias("beta_disc"),
    )


@register(
    "ts_max_drawdown",
    oracle="""
    WITH daily AS (
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS d,
               CAST(sum(CAST((CASE WHEN isnan(value) OR isinf(value)
                                   THEN NULL ELSE value END)
                             AS DECIMAL(18,6))) AS DOUBLE) AS v
        FROM events WHERE ts IS NOT NULL GROUP BY event_type, d
        HAVING v IS NOT NULL
    ),
    dd AS (
        SELECT event_type, d,
               max(v) OVER w - v AS drawdown
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    pk AS (
        SELECT event_type, d, drawdown,
               max(drawdown) OVER (PARTITION BY event_type) AS mx
        FROM dd
    )
    SELECT event_type, min(d) AS trough_date,
           round(max(drawdown), 2) + 0.0 AS max_drawdown
    FROM pk WHERE drawdown = mx
    GROUP BY event_type
    """,
    section="2.4",
)
def ts_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per feed: the largest peak-to-trough decline
    of the daily value series (running max minus current, maximized)
    with the earliest trough date — the worst-case-drop lens on
    volume that CUSUM's mean-shift scan doesn't capture. Drawdowns
    are differences of exact-decimal-derived doubles (on the
    2-decimal grid), so the peak-equality filter and the 2-dp round
    cannot diverge.

    Scale shape: daily-grain aggregate, then one event_type exchange
    shared by the running-max window, the per-type peak window, and
    the final aggregate — one scan, no joins (the CUSUM discipline).
    Non-finite measures pass the fin() gate before the decimal cast
    and all-garbage days drop (round-7 non-finite sweep; the
    analytics_r6d._DAILY_SQL rationale)."""
    daily = (
        t(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())  # null-time dead-letter (round-8)
        .groupBy("event_type", F.date_format("ts", "yyyy-MM-dd").alias("d"))
        .agg(F.sum(fin("value").cast(DEC)).cast("double").alias("v"))
        .filter(F.col("v").isNotNull())
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = Window.partitionBy("event_type")
    dd = daily.select(
        "event_type",
        "d",
        (F.max("v").over(w) - F.col("v")).alias("drawdown"),
    )
    pk = dd.select(
        "event_type", "d", "drawdown", F.max("drawdown").over(wf).alias("mx")
    )
    return (
        pk.filter(F.col("drawdown") == F.col("mx"))
        .groupBy("event_type")
        .agg(
            F.min("d").alias("trough_date"),
            (F.round(F.max("drawdown"), 2) + F.lit(0.0)).alias("max_drawdown"),
        )
    )
