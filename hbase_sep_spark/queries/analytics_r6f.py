"""Round-6 lead-in, sixth block: BPE pair stats / Mann-Whitney U.

- `text_bpe_pair_stats` — the first step of BPE vocabulary
  training: corpus-weighted adjacent character-pair counts, top
  merge candidates. Computed the way real BPE trainers do — on the
  VOCABULARY weighted by word frequency, never on raw text (the
  corpus-size → vocab-size reduction is what makes BPE training
  tractable at 100 TB).
- `agg_mannwhitney_u` — the Mann-Whitney U test (weekend vs weekday
  event values): the nonparametric two-sample location test, with
  exact tie-averaged ranks. Complements agg_chi_square_independence
  (categorical) with the ordinal drift test; U/(n₁n₂) is also the
  AUC of "value separates weekend from weekday".

Portability: both are exact-integer pipelines — pair counts are
int64; tie-averaged ranks ride a ×2 integer grid (2·rank is always
integral) so U arrives exact, and the only float is the final AUC
ratio. Ranking uses the two-level bucket decomposition
(agg_gini_activity's pattern), never a global data-sized window.

Reference parity: the reference (prazanna/hbase-sep [R: path-level
UNVERIFIED per SURVEY §0]) has no analytic layer; these are
training-pipeline and feed-drift consumer workloads.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hbase_sep_spark.functions.portable import fin
from hbase_sep_spark.io import t
from hbase_sep_spark.registry import register


@register(
    "text_bpe_pair_stats",
    oracle="""
    WITH wf AS (
        SELECT w, CAST(count(*) AS BIGINT) AS f
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE len(w) >= 2
        GROUP BY w
    ),
    pairs AS (
        SELECT unnest(list_transform(range(1, len(w)),
                                     i -> substr(w, CAST(i AS INT), 2)))
                   AS pair,
               f
        FROM wf
    )
    SELECT pair, CAST(sum(f) AS BIGINT) AS cnt
    FROM pairs
    GROUP BY pair
    ORDER BY cnt DESC, pair
    LIMIT 20
    """,
    section="2.11",
)
def text_bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge-candidate statistics: the 20 most frequent adjacent
    character pairs across the corpus, weighted by word frequency —
    byte-pair-encoding training's first merge decision. Computed on
    the VOCABULARY (distinct words × frequency), the real trainer's
    trick: the bigram explode runs over ~|vocab| rows however large
    the corpus is, because the corpus collapses to word counts
    first. Deterministic top-k: count DESC, pair ASC.

    Scale shape: corpus → word-frequency aggregate (map-side
    combined, the only data-sized op), then a bounded explode of
    ≤(word length) bigrams per vocab entry, a pair aggregate, and
    TakeOrderedAndProject for the top-20."""
    wf = (
        t(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.col("text"), " ")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    )
    pairs = wf.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair"),
        "f",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("f").cast("bigint").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "pair")
        .limit(20)
    )


@register(
    "agg_mannwhitney_u",
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
        SELECT v, n, na,
               CAST(sum(n) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cumn
        FROM grouped
    ),
    s AS (
        SELECT CAST(sum(na) AS BIGINT) AS n1,
               CAST(sum(n - na) AS BIGINT) AS n2,
               CAST(sum(na * (2 * cumn - n + 1)) AS BIGINT) AS r2
        FROM ranked
    )
    SELECT n1 AS n_weekend, n2 AS n_weekday,
           CAST(r2 - n1 * (n1 + 1) AS BIGINT) AS u2_weekend,
           CASE WHEN n1 > 0 AND n2 > 0
                THEN CAST(round(CAST(CAST(CAST(r2 - n1 * (n1 + 1) AS DOUBLE)
                                / (2.0 * n1 * n2) AS VARCHAR) AS DECIMAL(38,18)), 4) AS DOUBLE) + 0.0
                ELSE CAST(NULL AS DOUBLE) END AS auc_weekend
    FROM s
    """,
    section="2.4",
)
def agg_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (weekend vs weekday event values): the
    nonparametric "did the value distribution shift" test, with
    exact tie handling — tied values share their block's average
    rank. Everything rides a ×2 integer grid (2·avg_rank =
    2·cum − n + 1 is always integral), so U is EXACT int64 on both
    engines and the AUC ratio U/(n₁n₂) is the only float (4 dp,
    NULL-guarded against an empty class: Spark nulls the zero
    division where DuckDB yields inf/NaN, so the guard makes the
    degenerate fixture case degrade identically).
    AUC ≈ 0.5 ⇒ no weekend shift; the same statistic read as
    P(weekend value > weekday value).

    Scale shape: the oracle's global ordered window is the one
    thing that cannot scale, so the impl ranks with the two-level
    bucket decomposition (agg_gini_activity's pattern): per-value
    grouping first (ties collapse), value-range buckets, a
    bucket-frame cumulative for each bucket's predecessor count,
    broadcast offsets, then a fully parallel within-bucket
    cumulative. The final aggregate carries three int64s."""
    weekend = F.dayofweek("ts").isin(1, 7)
    # Rank tests are defined over observed values: drop NULLs AND
    # non-finites on BOTH sides (a null-bearing fixture would
    # otherwise diverge — the impl's bucket equi-join silently drops
    # the NULL bucket while the oracle's global window ranks it; a
    # NaN-bearing one diverges on WHERE NaN ranks, Spark IEEE vs
    # DuckDB total order — round-7 non-finite sweep).
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
    bcounts = bucketed.groupBy("bucket").agg(F.sum("n").alias("bn"))
    w_cum = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = bcounts.select(
        "bucket",
        F.coalesce(F.sum("bn").over(w_cum), F.lit(0)).cast("bigint").alias("before"),
    )
    w_in = (
        Window.partitionBy("bucket")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = bucketed.join(F.broadcast(offsets), "bucket").select(
        "n",
        "na",
        (F.sum("n").over(w_in) + F.col("before")).cast("bigint").alias("cumn"),
    )
    s = ranked.agg(
        F.sum("na").cast("bigint").alias("n1"),
        F.sum(F.col("n") - F.col("na")).cast("bigint").alias("n2"),
        F.sum(F.col("na") * (2 * F.col("cumn") - F.col("n") + 1))
        .cast("bigint")
        .alias("r2"),
    )
    u2 = F.col("r2") - F.col("n1") * (F.col("n1") + 1)
    return s.select(
        F.col("n1").alias("n_weekend"),
        F.col("n2").alias("n_weekday"),
        u2.cast("bigint").alias("u2_weekend"),
        F.when(
            (F.col("n1") > 0) & (F.col("n2") > 0),
            F.round(u2.cast("double") / (2.0 * F.col("n1") * F.col("n2")), 4)
            + F.lit(0.0),
        )
        .otherwise(F.lit(None).cast("double"))
        .alias("auc_weekend"),
    )
