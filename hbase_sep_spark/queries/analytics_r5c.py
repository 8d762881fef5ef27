"""Round-5 third-wave extensions.

Four operators: a feed order-repair audit (how far does commit order
diverge from event-time order — the number that sizes every reorder
buffer and watermark delay), a corpus unigram-LM surprisal scorer
(the cheap perplexity proxy used to quality-rank web documents
against a reference distribution), an exact heavy-hitters / iceberg
aggregate (the hot-key detector behind skew-salting decisions), and
a conditional reset-sum window (running total that restarts at
marker events — the gas-gauge pattern no plain window frame
expresses, decomposed into segment-id + segmented sum).

Every sql-hash query follows functions/portable.py's rules.

Reference parity: the reference (prazanna/hbase-sep, a CDC transport
library [R: path-level UNVERIFIED per SURVEY §0]) delivers per-key
ordered event streams with commit-order offsets; the order-repair
audit is exactly the consumer-side check that its per-key ordering
guarantee holds end to end.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hbase_sep_spark.io import t
from hbase_sep_spark.registry import register


@register(
    "events_order_repair",
    oracle="""
    WITH r AS (
        SELECT user_id, event_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS r_ts,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY event_id) AS r_id
        FROM events
        WHERE ts IS NOT NULL
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(max(abs(r_ts - r_id)) AS BIGINT) AS max_displacement,
           CAST(round(CAST(CAST(sum(abs(r_ts - r_id)) * 1.0 / count(*) AS VARCHAR) AS DECIMAL(38,18)), 4) AS DOUBLE) + 0.0
               AS avg_displacement,
           CAST(round(CAST(CAST(100.0 * sum(CASE WHEN r_ts = r_id THEN 1 ELSE 0 END)
                      / count(*) AS VARCHAR) AS DECIMAL(38,18)), 3) AS DOUBLE) + 0.0 AS pct_in_place
    FROM r
    GROUP BY user_id
    """,
    section="2.1",
)
def events_order_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feed order-repair audit: per key, how far the feed's commit
    order (event_id) diverges from event-time order — each event's
    displacement is |rank-by-time − rank-by-id| within its key. The
    max displacement IS the reorder-buffer size a consumer needs for
    perfect replay, and avg/pct-in-place quantify how close the
    transport comes to the per-key ordering it promises. Pure
    integer rank math; doubles only in the two final rounded ratios.

    Scale shape: ONE user_id exchange feeding two sorts (one per
    rank order) and then a map-side-combinable aggregate on the same
    key — Catalyst reuses the window partitioning for all three, so
    the plan holds a single shuffle at any scale. Null-time rows are
    dead-lettered on both sides (round-8 null-ts sweep): an event
    with no time has no time-rank to displace from."""
    ev = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w_ts = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_id = Window.partitionBy("user_id").orderBy("event_id")
    disp = ev.select(
        "user_id",
        F.row_number().over(w_ts).alias("r_ts"),
        F.row_number().over(w_id).alias("r_id"),
    )
    d = F.abs(F.col("r_ts") - F.col("r_id"))
    return disp.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.max(d).cast("bigint").alias("max_displacement"),
        (F.round(F.sum(d) * 1.0 / F.count(F.lit(1)), 4) + F.lit(0.0)).alias(
            "avg_displacement"
        ),
        (
            F.round(
                100.0 * F.sum(F.when(F.col("r_ts") == F.col("r_id"), 1).otherwise(0))
                / F.count(F.lit(1)),
                3,
            )
            + F.lit(0.0)
        ).alias("pct_in_place"),
    )


@register(
    "text_unigram_logprob",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word
        FROM documents
    ),
    tok2 AS (SELECT doc_id, word FROM tok WHERE word <> ''),
    vocab AS (
        SELECT word, CAST(count(*) AS BIGINT) AS n FROM tok2 GROUP BY word
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM vocab),
    scored AS (
        SELECT tok2.doc_id,
               CAST(round(ln(t * 1.0 / n), 6) AS DECIMAL(18,6)) AS surprisal
        FROM tok2 JOIN vocab ON tok2.word = vocab.word CROSS JOIN tot
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(round(CAST(CAST(CAST(sum(surprisal) AS DOUBLE) / count(*) AS VARCHAR) AS DECIMAL(38,18)), 4) AS DOUBLE) + 0.0
               AS avg_surprisal
    FROM scored
    GROUP BY doc_id
    """,
    section="2.11",
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM surprisal scoring — the cheap perplexity proxy for
    quality-ranking documents against a reference distribution: score
    each document by the mean negative log-probability of its tokens
    under the corpus unigram model, ln(T/count(word)). Common-word
    documents score low, rare-word soup scores high; CCNet-style
    pipelines bucket the corpus by exactly this number.

    Portability: per-token surprisal is pre-rounded to 6 dp and cast
    to DECIMAL(18,6) (the arr_str doubles pattern), so the per-doc
    sum is EXACT and order-independent; only the final mean is a
    rounded double.

    Scale shape: token explode → word-count aggregate (map-side
    combinable — the model fits in a dim table of vocab size; the
    vocab subtree appears twice in the logical plan but executes
    ONCE — ReusedExchange dedupes it at runtime, verified), then
    tokens ⋈ vocab as a hash equi-join on word (broadcast here;
    shuffle-hash co-partitioned at 100 TB vocab) + the 1-row total
    broadcast, then a doc_id aggregate. No driver-side state."""
    docs = t(spark, sf_dir, "documents")
    tok = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
    )
    vocab = tok.groupBy("word").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    tot = vocab.agg(F.sum("n").cast("bigint").alias("t"))
    scored = (
        tok.crossJoin(F.broadcast(tot))
        .join(vocab.withColumnRenamed("word", "vword"), F.col("word") == F.col("vword"))
        .select(
            "doc_id",
            F.round(F.log(F.col("t") * 1.0 / F.col("n")), 6)
            .cast("decimal(18,6)")
            .alias("surprisal"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        (
            F.round(F.sum("surprisal").cast("double") / F.count(F.lit(1)), 4)
            + F.lit(0.0)
        ).alias("avg_surprisal"),
    )


@register(
    "agg_heavy_hitters_exact",
    oracle="""
    WITH pairs AS (
        SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY user_id, event_type
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS t,
                   CAST(count(*) AS BIGINT) AS np FROM pairs)
    SELECT user_id, event_type, n,
           round(100.0 * n / t, 4) + 0.0 AS share_pct
    FROM pairs, tot
    WHERE n * np * 10 > 13 * t
    """,
    section="2.4",
)
def agg_heavy_hitters_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy-hitters (iceberg aggregate): every (user, type)
    pair holding more than 1.3× the MEAN pair volume, with its
    share. This is the hot-key detector that DECIDES skew handling —
    the keys it returns are the ones join_skew_salted's salting
    exists for. The relative-to-mean threshold is scale-invariant
    (an absolute share cutoff returns nothing once cardinality
    grows — verified empty at sf0.1 — while ×mean tracks the
    distribution at every SF), and the compare is exact integer
    math (n·np·10 > 13·t — no division); the share is the only
    rounded double.

    Scale shape: one map-side-combinable pair aggregate (the iceberg
    property: partials shrink to the distinct-pair count per mapper;
    the pair subtree appears twice in the plan but executes once —
    ReusedExchange at runtime, verified), a 1-row total broadcast,
    then a non-shuffling filter. The heavy tail never materializes
    anywhere."""
    ev = t(spark, sf_dir, "events")
    pairs = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = pairs.agg(
        F.sum("n").cast("bigint").alias("t"),
        F.count(F.lit(1)).cast("bigint").alias("np"),
    )
    return (
        pairs.crossJoin(F.broadcast(tot))
        .filter(F.col("n") * F.col("np") * 10 > 13 * F.col("t"))
        .select(
            "user_id",
            "event_type",
            "n",
            (F.round(100.0 * F.col("n") / F.col("t"), 4) + F.lit(0.0)).alias(
                "share_pct"
            ),
        )
    )


@register(
    "win_conditional_reset_sum",
    oracle="""
    WITH seg AS (
        SELECT user_id, event_id, ts, value,
               sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS segment_id
        FROM events
        WHERE ts IS NOT NULL
    )
    SELECT user_id, event_id, CAST(segment_id AS BIGINT) AS segment_id,
           round(sum(CAST(round(value * 1000000, 0) AS BIGINT))
                 OVER (PARTITION BY user_id, segment_id
                       ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 / 1000000.0, 2) AS run_sum
    FROM seg
    """,
    section="2.5",
)
def win_conditional_reset_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum that RESETS at marker events (each 'purchase'
    closes a segment) — the gas-gauge / odometer pattern. No window
    frame expresses a conditional reset directly; the classic
    decomposition is two stacked windows: a running marker count
    assigns each row its segment id, then the running sum restarts
    per (key, segment). The sum itself uses the int64-micros portable
    form (functions/portable.msum_window — exact, order-independent).

    Scale shape: both windows order by (ts, event_id) and the second
    partitions by a superset key of the first, so Catalyst plans ONE
    user_id exchange; the segment re-partition is satisfied by the
    existing distribution (pinned in tests/test_plans.py). Null-time
    rows are dead-lettered on both sides (round-8 null-ts sweep)."""
    from hbase_sep_spark.functions.portable import msum_window

    ev = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w1 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seg = ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .over(w1)
        .cast("bigint")
        .alias("segment_id"),
    )
    w2 = (
        Window.partitionBy("user_id", "segment_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return seg.select(
        "user_id",
        "event_id",
        "segment_id",
        msum_window("value", w2, 2).alias("run_sum"),
    )
