"""Round-6 lead-in, fourth block: robust trend / outlier / card.

- `agg_theil_sen_slope`  — Theil–Sen robust trend per feed: the
  median of all pairwise daily slopes. One bad day corrupts an OLS
  slope (agg_regr_slope); the pairwise median shrugs off ~29%
  contamination.
- `win_hampel_outlier`   — the Hampel filter: flag days deviating
  more than 3 scaled-MADs from the rolling 7-day median (the
  robust spike detector; z-scores mask outliers by inflating their
  own σ).
- `pipeline_dataset_card_report` — the one-query dataset card: the
  (metric, value) summary table a corpus release ships (doc/token
  counts, language share, exact-dup rate, vocab size, length
  percentiles).

Portability: Theil–Sen and Hampel compute on the bounded DAILY
frame (30 rows per key at any SF — pairwise O(d²) and sorted-frame
picks are calendar-bounded, never data-bounded); slopes/medians
round one digit past intrinsic precision; the card's percentiles
use the shared position-(n−1)·p linear interpolation definition
(Spark `percentile` ≡ DuckDB `quantile_cont`).

Reference parity: the reference (prazanna/hbase-sep [R: path-level
UNVERIFIED per SURVEY §0]) is a CDC transport; these are its
consumers' monitoring and release-audit workloads.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hbase_sep_spark.functions.portable import DEC, ascii_lower, fin
from hbase_sep_spark.io import t
from hbase_sep_spark.operators import text as T
from hbase_sep_spark.registry import register

# Non-finite measures pass the fin() gate before the decimal cast
# (ANSI CAST_OVERFLOW on NaN — round-7 non-finite sweep), and a day
# whose measures were ALL garbage (v IS NULL) drops before the
# rank/median/frame logic downstream: a NULL sort key would otherwise
# place NULLS FIRST on Spark and NULLS LAST on DuckDB.
_DAILY_SQL = """
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS d,
               CAST(sum(CAST((CASE WHEN isnan(value) OR isinf(value)
                                   THEN NULL ELSE value END)
                             AS DECIMAL(18,6))) AS DOUBLE) AS v
        FROM events WHERE ts IS NOT NULL GROUP BY event_type, d
        HAVING v IS NOT NULL
"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ts IS NOT NULL = the null-time dead-letter (round-8 null-ts
    # sweep): a NULL day would sort differently per engine downstream.
    return (
        t(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .groupBy("event_type", F.date_format("ts", "yyyy-MM-dd").alias("d"))
        .agg(F.sum(fin("value").cast(DEC)).cast("double").alias("v"))
        .filter(F.col("v").isNotNull())
    )


@register(
    "agg_theil_sen_slope",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    idx AS (
        SELECT event_type, v,
               row_number() OVER (PARTITION BY event_type ORDER BY d) AS i
        FROM daily
    ),
    slopes AS (
        SELECT a.event_type,
               (b.v - a.v) / (b.i - a.i) AS s
        FROM idx a JOIN idx b
          ON a.event_type = b.event_type AND b.i > a.i
    ),
    agg AS (
        SELECT event_type, list_sort(list(s)) AS arr,
               CAST(count(*) AS BIGINT) AS n
        FROM slopes GROUP BY event_type
    )
    SELECT event_type,
           round((arr[CAST((n + 1) // 2 AS INT)]
                  + arr[CAST(n // 2 + 1 AS INT)]) / 2, 4) + 0.0
               AS ts_slope,
           n AS n_pairs
    FROM agg
    """,
    section="2.4",
)
def agg_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend per feed: the median over all pairwise
    slopes (vⱼ−vᵢ)/(j−i) of the daily series — the slope estimate
    that survives ~29% contaminated days where agg_regr_slope's OLS
    fit chases every spike. Median via sorted-array middle picks
    (even counts average the two middles; 4-dp round, one digit past
    any tie).

    Scale shape: the O(d²) pair join runs on the DAILY frame — d is
    calendar-bounded (30/key here, 365/key for a year), so pairs per
    key are bounded regardless of data SF; the join is equi on
    event_type with the i<j band as a residual filter, and the
    per-type collect is over the bounded pair set. The data-sized
    work is only the daily aggregate."""
    idx = _daily(spark, sf_dir).select(
        "event_type",
        "v",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("d"))
        .alias("i"),
    )
    a = idx.alias("a")
    b = idx.alias("b")
    slopes = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("b.i") > F.col("a.i")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        ((F.col("b.v") - F.col("a.v")) / (F.col("b.i") - F.col("a.i"))).alias("s"),
    )
    agg = slopes.groupBy("event_type").agg(
        F.array_sort(F.collect_list("s")).alias("arr"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    lo = F.element_at("arr", F.expr("CAST((n + 1) DIV 2 AS INT)"))
    hi = F.element_at("arr", F.expr("CAST(n DIV 2 + 1 AS INT)"))
    return agg.select(
        "event_type",
        (F.round((lo + hi) / 2, 4) + F.lit(0.0)).alias("ts_slope"),
        F.col("n").alias("n_pairs"),
    )


@register(
    "win_hampel_outlier",
    oracle=f"""
    WITH daily AS ({_DAILY_SQL}),
    rolled AS (
        SELECT event_type, d, v,
               list_sort(list(v) OVER w) AS arr,
               len(list(v) OVER w) AS n
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY d
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    ),
    med AS (
        SELECT event_type, d, v,
               (arr[CAST((n + 1) // 2 AS INT)]
                + arr[CAST(n // 2 + 1 AS INT)]) / 2 AS m
        FROM rolled
    ),
    dev AS (
        SELECT event_type, d, v, m,
               list_sort(list(abs(v - m)) OVER w) AS darr,
               len(list(abs(v - m)) OVER w) AS dn
        FROM med
        WINDOW w AS (PARTITION BY event_type ORDER BY d
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, d,
           round(abs(v - m), 4) + 0.0 AS abs_dev,
           CAST(CASE WHEN abs(v - m) > 3 * 1.4826 *
                          ((darr[CAST((dn + 1) // 2 AS INT)]
                            + darr[CAST(dn // 2 + 1 AS INT)]) / 2)
                     THEN 1 ELSE 0 END AS INT) AS is_outlier
    FROM dev
    """,
    section="2.5",
)
def win_hampel_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel filter per feed day: flag |v − rollmed₇| > 3·1.4826·
    rollMAD₇ (MAD scaled to σ-equivalent) — the robust spike
    detector. A rolling z-score (ts_rolling_zscore) inflates its own
    σ with the spike it's testing; median/MAD don't. Emits every day
    with its deviation and flag (not only outliers, so the result is
    non-empty at every SF). The flag compares identically-derived
    doubles, so it cannot straddle engines.

    Scale shape: daily grain, then TWO constant-frame (7-row) window
    passes sharing the event_type partitioning — per-row state O(7),
    one shuffle after the aggregate."""
    daily = _daily(spark, sf_dir)
    w7 = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-6, Window.currentRow)
    )
    arr = F.array_sort(F.collect_list("v").over(w7))
    n = F.size(arr)
    med = daily.select(
        "event_type",
        "d",
        "v",
        (
            (
                F.element_at(arr, ((n + 1) / 2).cast("int"))
                + F.element_at(arr, (n / 2 + 1).cast("int"))
            )
            / 2
        ).alias("m"),
    )
    darr = F.array_sort(F.collect_list(F.abs(F.col("v") - F.col("m"))).over(w7))
    dn = F.size(darr)
    dev = med.select(
        "event_type",
        "d",
        "v",
        "m",
        (
            (
                F.element_at(darr, ((dn + 1) / 2).cast("int"))
                + F.element_at(darr, (dn / 2 + 1).cast("int"))
            )
            / 2
        ).alias("mad"),
    )
    return dev.select(
        "event_type",
        "d",
        (F.round(F.abs(F.col("v") - F.col("m")), 4) + F.lit(0.0)).alias("abs_dev"),
        F.when(
            F.abs(F.col("v") - F.col("m")) > 3 * 1.4826 * F.col("mad"), 1
        )
        .otherwise(0)
        .cast("int")
        .alias("is_outlier"),
    )


@register(
    "pipeline_dataset_card_report",
    oracle="""
    WITH base AS (
        SELECT CAST(count(*) AS DOUBLE) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS DOUBLE)
                   AS total_tokens,
               CASE WHEN count(*) > 0 THEN
                   CAST(round(CAST(CAST(CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT))
                               AS DOUBLE) / count(*) AS VARCHAR) AS DECIMAL(38,18)), 2) AS DOUBLE) END AS mean_doc_tokens,
               CASE WHEN count(*) > 0 THEN
                   CAST(round(CAST(CAST(CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                               AS DOUBLE) / count(*) AS VARCHAR) AS DECIMAL(38,18)), 4) AS DOUBLE) + 0.0 END AS en_share,
               round(quantile_cont(n_chars, 0.5), 2) AS p50_chars,
               round(quantile_cont(n_chars, 0.9), 2) AS p90_chars
        FROM documents
    ),
    dup AS (
        SELECT CASE WHEN count(*) > 0 THEN
                   CAST(round(CAST(CAST(CAST(count(*) - count(DISTINCT sha256(
                               translate(trim(text), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                                         'abcdefghijklmnopqrstuvwxyz')))
                               AS DOUBLE) / count(*) AS VARCHAR) AS DECIMAL(38,18)), 4) AS DOUBLE) + 0.0 END AS dup_rate
        FROM documents
    ),
    vocab AS (
        SELECT CAST(count(DISTINCT w) AS DOUBLE) AS vocab_size
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
    )
    SELECT 'n_docs' AS metric, n_docs AS value FROM base
    UNION ALL SELECT 'total_tokens', total_tokens FROM base
    UNION ALL SELECT 'mean_doc_tokens', mean_doc_tokens FROM base
    UNION ALL SELECT 'en_share', en_share FROM base
    UNION ALL SELECT 'p50_chars', p50_chars FROM base
    UNION ALL SELECT 'p90_chars', p90_chars FROM base
    UNION ALL SELECT 'exact_dup_rate', dup_rate FROM dup
    UNION ALL SELECT 'vocab_size', vocab_size FROM vocab
    """,
    section="2.11",
)
def pipeline_dataset_card_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-query dataset card: the (metric, value) table a corpus
    release publishes — document/token counts, mean length, English
    share, exact-duplicate rate, vocabulary size, and length
    percentiles. Percentiles use the position-(n−1)·p linear
    interpolation both engines define identically; integer inputs
    make the interpolated values ≤1-decimal, so the 2-dp round never
    ties. Values widen to double so one narrow (metric, value)
    schema carries every row. Every ratio is guarded on count(*)>0
    on BOTH sides (round-7 empty-feed sweep: a day-1/empty corpus is
    0/0 — ANSI DIVIDE_BY_ZERO on Spark, engine-specific NaN/NULL in
    DuckDB; the card publishes NULL for undefined ratios instead).

    Scale shape: THREE scans total, each aggregating to a scalar —
    the six base metrics share ONE pass (single aggregate, map-side
    combined); the dup rate is a digest distinct-count; the vocab
    size is an explode + distinct-count (the only shuffle-heavy leg,
    and exactly pipeline_vocab_coverage's proven shape). No per-doc
    rows survive to the union."""
    d = t(spark, sf_dir, "documents")
    base = d.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.sum(T.token_count_ws()).cast("double").alias("total_tokens"),
        F.when(
            F.count(F.lit(1)) > 0,
            F.round(
                F.sum(T.token_count_ws().cast("bigint")).cast("double")
                / F.count(F.lit(1)),
                2,
            ),
        ).alias("mean_doc_tokens"),
        F.when(
            F.count(F.lit(1)) > 0,
            F.round(
                F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).cast(
                    "double"
                )
                / F.count(F.lit(1)),
                4,
            )
            + F.lit(0.0),
        ).alias("en_share"),
        F.round(F.expr("percentile(n_chars, 0.5)"), 2).alias("p50_chars"),
        F.round(F.expr("percentile(n_chars, 0.9)"), 2).alias("p90_chars"),
    )
    dup = d.agg(
        F.when(
            F.count(F.lit(1)) > 0,
            F.round(
                (
                    F.count(F.lit(1))
                    - F.count_distinct(F.sha2(ascii_lower(F.trim(F.col("text"))), 256))
                ).cast("double")
                / F.count(F.lit(1)),
                4,
            )
            + F.lit(0.0),
        ).alias("dup_rate")
    )
    vocab = (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("w"))
        .agg(F.count_distinct(F.col("w")).cast("double").alias("vocab_size"))
    )
    card = base.select(
        F.expr(
            "stack(6, 'n_docs', n_docs, 'total_tokens', total_tokens, "
            "'mean_doc_tokens', mean_doc_tokens, 'en_share', en_share, "
            "'p50_chars', p50_chars, 'p90_chars', p90_chars) "
            "AS (metric, value)"
        )
    )
    return card.unionByName(
        dup.select(F.lit("exact_dup_rate").alias("metric"), F.col("dup_rate").alias("value"))
    ).unionByName(
        vocab.select(F.lit("vocab_size").alias("metric"), F.col("vocab_size").alias("value"))
    )
