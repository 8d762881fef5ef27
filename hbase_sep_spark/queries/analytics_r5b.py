"""Round-5 second-wave extensions (this session's additions).

Seven operators extending the graded surface along axes the registry
does not yet cover: a bloom-prefiltered semi-join (THE shuffle-
reduction pattern for selective big-table joins at 100 TB), an
exactly-portable EWMA smoother over the per-key change feed, a Zipf
law fit over the corpus vocabulary (the distribution-shape audit a
tokenizer team runs on every snapshot), a domain-mixture rebalancing
report (the sampling-weight table a training-data pipeline feeds its
mixer), a file-sizing / small-files layout audit, a feed-freshness /
watermark-lag audit per event type, and an explicit shuffle-hash-join
strategy demonstration (hint-forced, plan-pinned).

Every sql-hash query follows functions/portable.py's rules: integer
or exact-decimal sums, rounding only at the final projection,
deterministic composite tie-break keys, no array/map output columns,
identical aliases on both sides.

Reference parity: the reference (prazanna/hbase-sep, a CDC transport
library [R: path-level UNVERIFIED per SURVEY §0]) delivers ordered
per-key event streams; these operators re-express consumer-side
analytics and the table-maintenance audits a SEP subscriber would
run over the materialized feed.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hbase_sep_spark.functions.portable import dsum
from hbase_sep_spark.io import t
from hbase_sep_spark.registry import register

# Bloom geometry for join_bloom_prefilter: 2^16 bits in 1024 longs.
_BLOOM_BITS = 1 << 16


def _bloom_pos(key, seed: int):
    """Bit position of `key` under hash-seed `seed`, in [0, 2^16)."""
    return F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(_BLOOM_BITS))


def bloom_build(keys: DataFrame, key_col: str) -> DataFrame:
    """1-row DataFrame with a `bloom` map<int,bigint> column: the
    2-hash bloom bitmap of `key_col`, bit_or-merged map-side."""
    pos = keys.select(
        F.explode(
            F.array(_bloom_pos(F.col(key_col), 1), _bloom_pos(F.col(key_col), 77))
        ).alias("p")
    )
    words = pos.groupBy((F.col("p") / 64).cast("int").alias("idx")).agg(
        F.expr("bit_or(shiftleft(1L, CAST(p % 64 AS INT)))").alias("bits")
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("idx", "bits"))).alias("bloom")
    )


def bloom_member(pname: str):
    """Membership predicate for a position column `pname` against the
    cross-joined `bloom` map column (missing word ⇒ empty word)."""
    word = F.coalesce(
        F.element_at(F.col("bloom"), (F.col(pname) / 64).cast("int")),
        F.lit(0).cast("bigint"),
    )
    return word.bitwiseAND(F.expr(f"shiftleft(1L, CAST({pname} % 64 AS INT))")) != 0


@register(
    "join_bloom_prefilter",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2)
                AS DOUBLE) AS total_price
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer
                        WHERE c_mktsegment = 'BUILDING')
    GROUP BY o_orderpriority
    """,
    section="2.3",
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered semi-join: build a 2^16-bit / 2-hash bloom
    filter over the selective build side (BUILDING customers), push
    it to the probe scan as a cheap bitmap membership test, then run
    the exact semi-join only on survivors. Semantically identical to
    the plain semi-join (the final exact join removes bloom false
    positives), so the oracle is the plain IN-subquery aggregate.

    Scale shape: this is the pattern that makes selective joins
    viable at 100 TB — the bloom bitmap is 8 KiB regardless of build
    cardinality bucketing (1024 longs, bit_or-merged map-side), ships
    to every probe task as a 1-row broadcast, and eliminates most
    non-matching probe rows BEFORE the join (here before the
    broadcast-hash probe; on a cluster, before the shuffle). Bit math
    is all codegen: xxhash64 → pmod → shiftleft/bitwise AND against a
    map<int,bigint> lookup. Spark's own runtime bloom-join injection
    does this invisibly; the explicit form makes the mechanics
    gradeable and pinnable (tests/test_plans.py)."""
    cust = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    # Build: each key sets 2 bits; bits OR-combine per 64-bit word.
    bloom = bloom_build(cust, "c_custkey")

    orders = t(spark, sf_dir, "orders")
    prefiltered = (
        orders.crossJoin(F.broadcast(bloom))
        .withColumn("p1", _bloom_pos(F.col("o_custkey"), 1))
        .withColumn("p2", _bloom_pos(F.col("o_custkey"), 77))
        .filter(bloom_member("p1") & bloom_member("p2"))
        .drop("bloom", "p1", "p2")
    )
    exact = prefiltered.join(
        F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"), "left_semi"
    )
    return exact.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        dsum("o_totalprice").alias("total_price"),
    )


@register(
    "ts_ewma_halflife",
    oracle="""
    WITH w AS (
        SELECT user_id, event_id, ts, value,
               lag(value, 1) OVER win AS l1,
               lag(value, 2) OVER win AS l2,
               lag(value, 3) OVER win AS l3,
               lag(value, 4) OVER win AS l4,
               lag(value, 5) OVER win AS l5
        FROM events
        WHERE ts IS NOT NULL
        WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id,
           round((value * 1.0
                  + coalesce(l1, 0) * 0.5
                  + coalesce(l2, 0) * 0.25
                  + coalesce(l3, 0) * 0.125
                  + coalesce(l4, 0) * 0.0625
                  + coalesce(l5, 0) * 0.03125)
                 / (1.0
                    + CASE WHEN l1 IS NULL THEN 0 ELSE 0.5 END
                    + CASE WHEN l2 IS NULL THEN 0 ELSE 0.25 END
                    + CASE WHEN l3 IS NULL THEN 0 ELSE 0.125 END
                    + CASE WHEN l4 IS NULL THEN 0 ELSE 0.0625 END
                    + CASE WHEN l5 IS NULL THEN 0 ELSE 0.03125 END),
                 4) + 0.0 AS ewma
    FROM w
    """,
    section="2.5",
)
def ts_ewma_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average with half-life decay
    (alpha = 1/2, depth 6) over each key's event stream — the
    smoother behind every anomaly baseline and rate limiter. True
    EWMA is a recursion no window frame expresses; the half-life
    truncated form is a fixed lag-combination, which IS expressible
    — and with alpha = 1/2 every weight is a power of two, so each
    product is an EXACT binary scaling of the stored double and the
    fixed-order sum is bit-identical across engines and runs (no
    decimal casts needed: there is no data-order-dependent
    summation anywhere). Early rows renormalize over the weights
    actually present.

    Scale shape: one user_id shuffle, one sort, six lags over the
    same window — Catalyst evaluates all six in a single Window
    operator pass, O(1) state per row. Null-time rows are
    dead-lettered on both sides (round-8 null-ts sweep)."""
    ev = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lags = [F.col("value")] + [F.lag("value", i).over(w) for i in range(1, 6)]
    weights = [1.0, 0.5, 0.25, 0.125, 0.0625, 0.03125]
    num = lags[0] * weights[0]
    den = F.lit(1.0)
    for lg, wt in zip(lags[1:], weights[1:]):
        num = num + F.coalesce(lg, F.lit(0.0)) * wt
        den = den + F.when(lg.isNull(), F.lit(0.0)).otherwise(F.lit(wt))
    return ev.select(
        "user_id",
        "event_id",
        (F.round(num / den, 4) + F.lit(0.0)).alias("ewma"),
    )


@register(
    "text_zipf_fit",
    oracle="""
    WITH tok AS (
        SELECT unnest(string_split(text, ' ')) AS word
        FROM documents
    ),
    cnt AS (
        SELECT word, CAST(count(*) AS BIGINT) AS n
        FROM tok WHERE word <> '' GROUP BY word
    ),
    top AS (
        SELECT word, n,
               row_number() OVER (ORDER BY n DESC, word) AS rnk
        FROM cnt ORDER BY n DESC, word LIMIT 1000
    ),
    fit AS (
        SELECT round(regr_slope(ln(n), ln(rnk)), 4) + 0.0 AS zipf_slope,
               CAST(count(*) AS BIGINT) AS n_top,
               max(CASE WHEN rnk = 1 THEN word END) AS top_word,
               max(CASE WHEN rnk = 1 THEN n END) AS top_count
        FROM top
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n_vocab,
               CAST(sum(n) AS BIGINT) AS n_tokens
        FROM cnt
    )
    SELECT n_vocab, n_tokens, top_word, top_count, zipf_slope
    FROM fit, tot
    """,
    section="2.11",
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary: log-log slope of
    word frequency vs frequency rank, plus vocabulary size, token
    count, and the top word. The slope (~ -1 on natural text) is the
    distribution-shape audit a tokenizer team runs on every corpus
    snapshot — a big deviation means boilerplate or spam flooded the
    crawl.

    Scale shape: the word count is a map-side-combinable aggregate
    (the only data-sized shuffle); ONLY the top-1000 words cross
    into the single-partition rank window (orderBy+limit plans as
    TakeOrderedAndProject, so the global sort never materializes),
    and the regression runs over ≤1000 rows. Vocabulary totals come
    from a separate 1-row aggregate (the word-count subtree appears
    twice in the plan but executes once — ReusedExchange at
    runtime, verified); both 1-row sides meet in a broadcast cross
    join. Rounding regr_slope over the ≤1000 ln
    pairs to 4 dp follows the agg_regr_slope portability precedent
    (round-6 there) with extra margin."""
    docs = t(spark, sf_dir, "documents")
    cnt = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    top = cnt.orderBy(F.col("n").desc(), "word").limit(1000)
    wr = Window.orderBy(F.col("n").desc(), "word")
    ranked = top.select("word", "n", F.row_number().over(wr).alias("rnk"))
    fit = ranked.agg(
        (F.round(F.regr_slope(F.log("n"), F.log("rnk")), 4) + F.lit(0.0)).alias(
            "zipf_slope"
        ),
        F.count(F.lit(1)).cast("bigint").alias("n_top"),
        F.max(F.when(F.col("rnk") == 1, F.col("word"))).alias("top_word"),
        F.max(F.when(F.col("rnk") == 1, F.col("n"))).alias("top_count"),
    )
    glob = cnt.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vocab"),
        F.sum("n").cast("bigint").alias("n_tokens"),
    )
    return fit.crossJoin(F.broadcast(glob)).select(
        "n_vocab", "n_tokens", "top_word", "top_count", "zipf_slope"
    )


@register(
    "pipeline_domain_mix_report",
    oracle="""
    WITH per_src AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source
    )
    SELECT source, n_docs, n_tokens,
           round(n_tokens * 100.0 / sum(n_tokens) OVER (), 3) + 0.0
               AS token_share_pct,
           round(sum(n_tokens) OVER ()
                 / (count(*) OVER () * 1.0 * n_tokens), 4) + 0.0
               AS mix_weight
    FROM per_src
    """,
    section="2.11",
)
def pipeline_domain_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture rebalancing report — the sampling-weight table
    a training-data pipeline feeds its mixer: per source domain, the
    document/token counts, the token share of the corpus, and the
    up/down-sampling weight that would equalize the mixture across
    domains (weight = uniform-target share / actual share; >1 means
    upsample). Weights computed from exact integer token counts;
    doubles appear only in the two final rounded projections.

    Scale shape: one map-side-combinable aggregate keyed by source
    (the only data-sized shuffle — token counting is a per-row
    split+size expression, no explode), then window totals over the
    per-domain rows (one row per domain — trivially small at any
    corpus scale)."""
    docs = t(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("n_tokens"),
    )
    wall = Window.partitionBy()
    total = F.sum("n_tokens").over(wall)
    n_src = F.count(F.lit(1)).over(wall)
    return per_src.select(
        "source",
        "n_docs",
        "n_tokens",
        (F.round(F.col("n_tokens") * 100.0 / total, 3) + F.lit(0.0)).alias(
            "token_share_pct"
        ),
        (F.round(total / (n_src * 1.0 * F.col("n_tokens")), 4) + F.lit(0.0)).alias(
            "mix_weight"
        ),
    )


@register(
    "layout_file_sizing_audit",
    oracle="""
    WITH per_src AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_bytes,
               CAST(max(n_chars) AS BIGINT) AS max_doc_bytes
        FROM documents GROUP BY source
    )
    SELECT source, n_docs, total_bytes, max_doc_bytes,
           CAST(greatest(1, ceil(total_bytes / 16384.0)) AS BIGINT)
               AS target_files,
           round(total_bytes * 1.0 / n_docs, 2) + 0.0 AS avg_doc_bytes,
           round(total_bytes * (count(*) OVER ()) * 1.0
                 / sum(total_bytes) OVER (), 4) + 0.0 AS skew_vs_mean
    FROM per_src
    """,
    section="2.6",
)
def layout_file_sizing_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-sizing / small-files layout audit — the table-maintenance
    report behind every compaction scheduler: per write-partition
    (source), the row count, byte volume, the target output-file
    count at a fixed file-size budget (16 KiB here, standing in for
    the production 128 MiB), the mean document size, and the skew of
    this partition's volume vs the mean partition (compaction
    priority: skew ≫ 1 needs splitting, many partitions with
    target_files = 1 and tiny volume are the small-files problem).
    All counts exact integers; doubles only in final rounded ratios.

    Scale shape: one aggregate keyed by the write-partition column,
    then window totals over one row per partition. This is the audit
    that DECIDES repartition(n) before a write — sizing output files
    to the budget is what keeps a 100 TB table scannable."""
    docs = t(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_bytes"),
        F.max("n_chars").cast("bigint").alias("max_doc_bytes"),
    )
    wall = Window.partitionBy()
    return per_src.select(
        "source",
        "n_docs",
        "total_bytes",
        "max_doc_bytes",
        F.greatest(F.lit(1), F.ceil(F.col("total_bytes") / 16384.0))
        .cast("bigint")
        .alias("target_files"),
        (F.round(F.col("total_bytes") * 1.0 / F.col("n_docs"), 2) + F.lit(0.0)).alias(
            "avg_doc_bytes"
        ),
        (
            F.round(
                F.col("total_bytes")
                * F.count(F.lit(1)).over(wall)
                * 1.0
                / F.sum("total_bytes").over(wall),
                4,
            )
            + F.lit(0.0)
        ).alias("skew_vs_mean"),
    )


@register(
    "events_watermark_lag_audit",
    oracle="""
    WITH head AS (SELECT max(epoch_us(ts)) AS gmax FROM events)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS latest_ts,
           CAST(max(gmax) - max(epoch_us(ts)) AS BIGINT) AS staleness_us,
           CAST(round(CAST(CAST(100.0 * sum(CASE WHEN epoch_us(ts) >= gmax - 86400000000
                                       THEN 1 ELSE 0 END) / count(*) AS VARCHAR) AS DECIMAL(38,18)), 3) AS DOUBLE) + 0.0
               AS pct_last_day
    FROM events, head
    GROUP BY event_type, gmax
    """,
    section="2.1",
)
def events_watermark_lag_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feed-freshness / watermark-lag audit per event type — the CDC
    health dashboard row: how far each type's newest event trails
    the feed head (staleness), and what share of its volume arrived
    in the head's trailing day. A type with large staleness means a
    stuck producer or a dropped subscription — the first thing a SEP
    operator checks. All time math in exact integer microseconds;
    the only double is the final rounded percentage.

    Scale shape: the global head timestamp is a 1-row aggregate
    broadcast to the scan (no second pass over the data), then one
    map-side-combinable aggregate keyed by event_type. Two scans
    total at any scale — and the first reads only `ts`."""
    ev = t(spark, sf_dir, "events")
    glob = ev.agg(F.max(F.unix_micros("ts")).alias("gmax"))
    day_us = 86400000000
    return (
        ev.crossJoin(F.broadcast(glob))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("latest_ts"),
            (F.max("gmax") - F.max(F.unix_micros("ts")))
            .cast("bigint")
            .alias("staleness_us"),
            (
                F.round(
                    100.0
                    * F.sum(
                        F.when(
                            F.unix_micros("ts") >= F.col("gmax") - F.lit(day_us), 1
                        ).otherwise(0)
                    )
                    / F.count(F.lit(1)),
                    3,
                )
                + F.lit(0.0)
            ).alias("pct_last_day"),
        )
    )


@register(
    "join_shuffle_hash_hint",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,6))), 2)
                AS DOUBLE) AS total_price
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    """,
    section="2.3",
)
def join_shuffle_hash_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-hash-join strategy selection via hint — the third
    physical join strategy beside broadcast (join_inner_broadcast)
    and sort-merge (join_inner_shuffle): when both sides are too big
    to broadcast but one side's PER-PARTITION slice fits in memory,
    hashing that side skips BOTH sort passes of sort-merge. The
    SHUFFLE_HASH hint on orders forces it (pinned: the physical plan
    must show ShuffledHashJoin, tests/test_plans.py); results are
    strategy-independent, so the oracle is the plain join aggregate.

    Scale shape: same single co-partitioning shuffle as sort-merge
    on l_orderkey/o_orderkey, minus two sorts — the right pick at
    100 TB when the build side partitions are bounded (AQE can also
    pick it dynamically; the hint makes the choice explicit and
    testable)."""
    orders = t(spark, sf_dir, "orders").hint("shuffle_hash")
    li = t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            dsum("l_extendedprice").alias("total_price"),
        )
    )
