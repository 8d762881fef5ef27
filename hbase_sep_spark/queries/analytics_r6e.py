"""Round-6 lead-in, fifth block: similarity matrix / chi² / WAU.

- `text_source_similarity_matrix` — cosine similarity between every
  pair of sources' unigram count vectors via the sparse postings
  equi-join (the corpus-mixing "which sources overlap" matrix; a
  dense vector form would materialize |vocab|-wide rows)
- `agg_chi_square_independence` — χ² statistic for the event-type ×
  day-of-week contingency (is the type mix independent of weekday?
  the categorical drift test behind seasonality triage)
- `events_rolling_wau` — rolling 7-day active users per day (the
  WAU curve), via the constant-offset explode that turns a sliding
  DISTINCT — inexpressible as a window frame — into one exact
  distinct-count aggregate

Portability: dots and norms are exact int64 sums of count products;
cosine divides identically-derived doubles (IEEE sqrt is correctly
rounded on both engines) and rounds at 4 dp; χ² derives from exact
counts with mirrored double arithmetic; WAU is an exact distinct
count. The day-of-week key uses each engine's own encoding (Spark
1-7, DuckDB 0-6) — a bijection, so the contingency structure and
the statistic are identical; the key itself never reaches the
output.

Reference parity: the reference (prazanna/hbase-sep [R: path-level
UNVERIFIED per SURVEY §0]) has no analytic layer; these are its
consumers' corpus and feed-health workloads.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hbase_sep_spark.io import t
from hbase_sep_spark.registry import register


@register(
    "text_source_similarity_matrix",
    oracle="""
    WITH wc AS (
        SELECT source, w, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT source, unnest(string_split(text, ' ')) AS w
              FROM documents)
        GROUP BY source, w
    ),
    norms AS (
        SELECT source, CAST(sum(c * c) AS BIGINT) AS n2
        FROM wc GROUP BY source
    ),
    dots AS (
        SELECT x.source AS s1, y.source AS s2,
               CAST(sum(x.c * y.c) AS BIGINT) AS dot
        FROM wc x JOIN wc y ON x.w = y.w AND x.source < y.source
        GROUP BY x.source, y.source
    )
    SELECT s1, s2,
           round(CAST(dot AS DOUBLE)
                 / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))),
                 4) + 0.0 AS cosine
    FROM dots
    JOIN norms a ON s1 = a.source
    JOIN norms b ON s2 = b.source
    """,
    section="2.11",
)
def text_source_similarity_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine similarity between sources' unigram count
    vectors — the corpus-overlap matrix that decides which sources a
    mixture can treat as near-interchangeable. Computed SPARSE: the
    postings (source, word, count) join on the word key, so only
    co-occurring words generate work and nothing |vocab|-wide ever
    materializes. Dots and squared norms are exact int64; the final
    cosine divides identically-derived doubles (IEEE-exact sqrt)
    and rounds at 4 dp. The s1 < s2 triangle keeps each pair once.

    Scale shape: one explode + (source, word) aggregate; the
    self-join is hash equi on word — fan-out per word is bounded by
    sources sharing it (≤ source count), never document count; the
    20-row norms broadcast onto the 190-row triangle. The postings
    subtree plans four times (x, y, both norm sides) but EXECUTES
    once — 3 ReusedExchanges in the adaptive plan, verified."""
    wc = (
        t(spark, sf_dir, "documents")
        .select("source", F.explode(F.split(F.col("text"), " ")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    norms = wc.groupBy("source").agg(
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("n2")
    )
    x, y = wc.alias("x"), wc.alias("y")
    dots = (
        x.join(
            y,
            (F.col("x.w") == F.col("y.w"))
            & (F.col("x.source") < F.col("y.source")),
        )
        .groupBy(
            F.col("x.source").alias("s1"), F.col("y.source").alias("s2")
        )
        .agg(F.sum(F.col("x.c") * F.col("y.c")).cast("bigint").alias("dot"))
    )
    na = norms.select(F.col("source").alias("sa"), F.col("n2").alias("na2"))
    nb = norms.select(F.col("source").alias("sb"), F.col("n2").alias("nb2"))
    return (
        dots.join(F.broadcast(na), F.col("s1") == F.col("sa"))
        .join(F.broadcast(nb), F.col("s2") == F.col("sb"))
        .select(
            "s1",
            "s2",
            (
                F.round(
                    F.col("dot").cast("double")
                    / (
                        F.sqrt(F.col("na2").cast("double"))
                        * F.sqrt(F.col("nb2").cast("double"))
                    ),
                    4,
                )
                + F.lit(0.0)
            ).alias("cosine"),
        )
    )


@register(
    "agg_chi_square_independence",
    oracle="""
    WITH cell AS (
        SELECT event_type, dayofweek(ts) AS dow,
               CAST(count(*) AS BIGINT) AS o
        FROM events GROUP BY event_type, dow
    ),
    m AS (
        SELECT event_type, dow, o,
               CAST(sum(o) OVER (PARTITION BY event_type) AS BIGINT) AS rt,
               CAST(sum(o) OVER (PARTITION BY dow) AS BIGINT) AS ct,
               CAST(sum(o) OVER () AS BIGINT) AS n
        FROM cell
    )
    SELECT round(sum((CAST(o AS DOUBLE)
                      - CAST(rt AS DOUBLE) * ct / n)
                     * (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * ct / n)
                     / (CAST(rt AS DOUBLE) * ct / n)), 4) AS chi2,
           CAST((count(DISTINCT event_type) - 1)
                * (count(DISTINCT dow) - 1) AS INT) AS dof,
           CAST(max(n) AS BIGINT) AS n_events
    FROM m
    """,
    section="2.4",
)
def agg_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson χ² independence test, event type × day-of-week: is
    the feed's type mix a function of weekday? The categorical
    drift statistic behind seasonality triage (large χ² at 24 dof →
    route to per-weekday monitoring). Expected counts derive from
    exact margin sums with mirrored double arithmetic; the cell sum
    spans 35 bounded terms; 4-dp round. The weekday key uses each
    engine's native encoding — a bijection that changes no margin,
    so the statistic is identical and the key never leaves the
    query.

    Scale shape: one scan to the 35-cell contingency aggregate
    (map-side combined); margins come from windows over the bounded
    cell frame; the statistic is a constant-space fold."""
    cell = (
        t(spark, sf_dir, "events")
        .groupBy("event_type", F.dayofweek("ts").alias("dow"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    )
    m = cell.select(
        "event_type",
        "dow",
        "o",
        F.sum("o").over(Window.partitionBy("event_type")).cast("bigint").alias("rt"),
        F.sum("o").over(Window.partitionBy("dow")).cast("bigint").alias("ct"),
        F.sum("o").over(Window.partitionBy()).cast("bigint").alias("n"),
    )
    e = F.col("rt").cast("double") * F.col("ct") / F.col("n")
    dev = F.col("o").cast("double") - e
    return m.agg(
        F.round(F.sum(dev * dev / e), 4).alias("chi2"),
        (
            (F.count_distinct(F.col("event_type")) - 1)
            * (F.count_distinct(F.col("dow")) - 1)
        )
        .cast("int")
        .alias("dof"),
        F.max("n").cast("bigint").alias("n_events"),
    )


@register(
    "events_rolling_wau",
    oracle="""
    WITH pairs AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    days AS (SELECT DISTINCT d FROM pairs),
    hits AS (
        SELECT p.user_id, p.d + CAST(o.off AS INT) AS td
        FROM pairs p, (SELECT unnest(generate_series(0, 6)) AS off) o
    )
    SELECT strftime(h.td, '%Y-%m-%d') AS day,
           CAST(count(DISTINCT h.user_id) AS BIGINT) AS wau
    FROM hits h JOIN days dd ON h.td = dd.d
    GROUP BY h.td
    """,
    section="2.4",
)
def events_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users for every day the feed covers —
    the WAU curve. A sliding DISTINCT has no window-frame form
    (distinct isn't decomposable over frames), so each (user, day)
    activity pair is exploded to the 7 future days it keeps the
    user "active" for, and one exact distinct-count aggregate per
    target day does the rest; the day spine semi-join trims the
    tail days past the feed's range.

    Scale shape: the distinct pair set is users × days (itself a
    map-side-combined aggregate); the ×7 explode is a constant
    fan-out projection, not a join; the final count-distinct
    shuffles (day, user) once. At 100 TB this beats the
    self-join-range form by never producing a data × data join."""
    pairs = (
        t(spark, sf_dir, "events")
        .select("user_id", F.col("ts").cast("date").alias("d"))
        .distinct()
    )
    days = pairs.select("d").distinct().select(F.col("d").alias("dd"))
    hits = pairs.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"),
        "d",
    ).select("user_id", F.date_add(F.col("d"), F.col("off")).alias("td"))
    return (
        hits.join(F.broadcast(days), F.col("td") == F.col("dd"), "left_semi")
        .groupBy("td")
        .agg(F.count_distinct(F.col("user_id")).cast("bigint").alias("wau"))
        .select(F.date_format("td", "yyyy-MM-dd").alias("day"), "wau")
    )
