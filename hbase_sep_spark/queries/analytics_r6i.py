"""Round-6 lead-in, ninth block: quality-weighted sampling / uptime.

- `sample_quality_weighted` — deterministic REJECTION sampling with
  per-document acceptance probability proportional to the quality
  heuristic: the corpus-filtering step that keeps MORE of the good
  text instead of Bernoulli's flat coin, yet stays hash-reproducible
  (rand()-based importance sampling is unauditable and changes
  under repartitioning).
- `events_uptime_pct` — per-type feed uptime: the share of
  wall-clock minutes in the feed's span with at least one event —
  the SLA number a CDC operator reports (complements
  events_silence_alert's WHERE-are-the-gaps with HOW-MUCH-uptime).

Portability: the sampler compares an exact integer Knuth hash
against quality × 2³²⁄₂ where quality is a 4-dp-rounded band sum —
identical doubles both engines; uptime counts distinct epoch
minutes (exact integers) against an exact integer span.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hbase_sep_spark.functions.portable import knuth_hash
from hbase_sep_spark.io import t
from hbase_sep_spark.operators import text as T
from hbase_sep_spark.registry import register

# The ONE DuckDB mirror of operators/text.quality_score — shared
# with pipeline_training_prep's oracle so a band/weight/stopword
# tweak can never desynchronize the two.
from hbase_sep_spark.queries.llm_extras import _DUCK_QUALITY as _QUALITY_SQL


@register(
    "sample_quality_weighted",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang, {_QUALITY_SQL} AS quality
        FROM documents
    )
    SELECT doc_id, lang, quality
    FROM scored
    WHERE CAST(((CAST(doc_id AS BIGINT) % 2147483648) * 2654435761) % 4294967296
               AS DOUBLE)
          < quality * 0.5 * 4294967296
    """,
    section="2.11",
)
def sample_quality_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted deterministic sampling: accept each document
    with probability quality/2 by comparing its Knuth hash to a
    quality-scaled threshold — high-quality docs survive at ~2× the
    rate of low-quality ones, and the decision is a pure function of
    (doc_id, text), so the sample is reproducible anywhere and
    re-joinable downstream. The hash is exact integer arithmetic;
    the threshold multiplies a 4-dp-exact band score identically on
    both engines.

    Scale shape: one scan, one filter — the quality expression and
    the hash are both scan-level codegen; no shuffle, no state."""
    d = t(spark, sf_dir, "documents")
    h = knuth_hash("doc_id").cast("double")
    q = T.quality_score()
    return (
        d.select("doc_id", "lang", q.alias("quality"))
        .withColumn("h", h)
        .filter(F.col("h") < F.col("quality") * 0.5 * 4294967296)
        .select("doc_id", "lang", "quality")
    )


@register(
    "events_uptime_pct",
    oracle="""
    WITH span AS (
        SELECT CAST(floor(epoch(min(ts)) / 60) AS BIGINT) AS m0,
               CAST(floor(epoch(max(ts)) / 60) AS BIGINT) AS m1
        FROM events
    ),
    active AS (
        SELECT event_type,
               CAST(count(DISTINCT CAST(floor(epoch(ts) / 60) AS BIGINT))
                    AS BIGINT) AS active_min
        FROM events GROUP BY event_type
    )
    SELECT event_type, active_min,
           CAST(m1 - m0 + 1 AS BIGINT) AS span_min,
           round(CAST(active_min AS DOUBLE) / (m1 - m0 + 1), 4) + 0.0
               AS uptime_pct
    FROM active, span
    """,
    section="2.4",
)
def events_uptime_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type feed uptime: distinct active epoch-minutes over the
    feed's total minute span — the SLA availability number. Minutes
    are exact integers (floor of epoch seconds / 60), the span is an
    exact integer difference, and only the final ratio is a rounded
    double.

    Scale shape: one distinct-minute aggregate per type (map-side
    combined — minute cardinality is wall-clock-bounded however big
    the feed) plus a 1-row global span broadcast; the span subtree
    re-plans the scan but re-executes nothing data-sized beyond a
    min/max fold."""
    ev = t(spark, sf_dir, "events")
    minute = F.floor(F.col("ts").cast("long") / 60).cast("bigint")
    span = ev.agg(
        F.floor(F.min(F.col("ts").cast("long")) / 60).cast("bigint").alias("m0"),
        F.floor(F.max(F.col("ts").cast("long")) / 60).cast("bigint").alias("m1"),
    )
    active = ev.groupBy("event_type").agg(
        F.count_distinct(minute).cast("bigint").alias("active_min")
    )
    return active.crossJoin(F.broadcast(span)).select(
        "event_type",
        "active_min",
        (F.col("m1") - F.col("m0") + 1).cast("bigint").alias("span_min"),
        (
            F.round(
                F.col("active_min").cast("double")
                / (F.col("m1") - F.col("m0") + 1),
                4,
            )
            + F.lit(0.0)
        ).alias("uptime_pct"),
    )
