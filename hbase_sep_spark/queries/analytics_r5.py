"""Round-5 analytics + pipeline extensions.

Twelve operators extending the graded surface along axes the
existing registry does not yet cover: a running-distinct window (the
cardinality-over-time view of the change feed), feed inter-arrival
statistics (CDC health: how bursty is each key's event stream),
OHLC-style weekly resampling (the time-series downsampling primitive
behind every metrics rollup), a multi-rule corpus quality-gate
report (the per-rule rejection funnel a training-data pipeline
publishes with every snapshot), a feed-offset contiguity audit
whose global rank is computed with the two-level bucket
decomposition instead of the oracle's single-partition window,
bitmap OR-aggregation exact distinct (mergeable AND exact for dense
integer keys), a two-stage int8-shortlist → exact-rerank ANN
searcher (rows-only, recall-gated in tests/test_ann.py), a trailing
time-interval RANGE frame, a deterministic per-epoch training
shuffle with sharded read positions, and the end-to-end NEAR-dup
corpus prep pipeline (MinHash→LSH→connected components→keep-best,
rows-only, invariant-gated), an incremental snapshot⊕delta aggregate
merge proven equal to direct recompute, and a z-order (Morton)
clustering audit with per-bucket pruning envelopes.

Every sql-hash query here has a full DuckDB oracle and follows
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
        FROM events WHERE ts IS NOT NULL
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
    tests/test_plans.py). State per row is O(1) in both passes.
    Null-time rows are dead-lettered on both sides (round-8 null-ts
    sweep). The first-occurrence flag is NULL-SAFE (round-8
    null-keys sweep): an unclassified (NULL event_type) stream
    counts as ONE distinct type — the oracle's (user_id, event_type)
    partition puts all NULLs in one group natively, and the Spark
    flag uses row_number==1 OR NOT eqNullSafe(prev, cur) so a NULL
    block is flagged exactly once (the old `prev IS NULL OR prev <>
    cur` form re-flagged EVERY NULL-type row: `prev <> NULL` is
    unknown and lag's missing-first-row NULL is indistinguishable
    from a NULL type)."""
    ev = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w_flag = Window.partitionBy("user_id").orderBy("event_type", "ts", "event_id")
    prev_type = F.lag("event_type").over(w_flag)
    first_row = F.row_number().over(w_flag) == 1
    flagged = ev.select(
        "user_id",
        "event_id",
        "ts",
        (first_row | ~prev_type.eqNullSafe(F.col("event_type")))
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
           CAST(round(CAST(CAST(CAST(sum(gap_us) AS BIGINT) / 1000000.0 / count(gap_us) AS VARCHAR) AS DECIMAL(38,18)), 3) AS DOUBLE)
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
           arg_min(value, printf('%020d-%010d', epoch_us(ts) + 4611686018427387904, CAST(event_id AS BIGINT)))
               AS open_v,
           arg_max(value, printf('%020d-%010d', epoch_us(ts) + 4611686018427387904, CAST(event_id AS BIGINT)))
               AS close_v,
           min(value) AS low_v,
           max(value) AS high_v,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS total_value
    FROM events
    WHERE ts IS NOT NULL
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
    deterministic (the repo-wide event_id tie-break rule); the epoch
    is biased by 2^62 so a pre-1970 row (negative epoch) can never
    format with a sign, which would lexically invert the order among
    such rows on BOTH engines (agreeing but wrong picks); open and
    close are raw per-row values (never rounded), the volume sum
    runs in exact decimal.

    Both engines' date_trunc('week') snaps to Monday, and the week
    is emitted as a yyyy-MM-dd STRING per the no-DATE-outputs rule.

    Scale shape: ONE map-side-combinable aggregate keyed
    (user_id, week) — min_by/max_by partials carry (value, key)
    pairs, so the shuffle moves one fixed-width pair per group per
    mapper, never the events. Single Exchange, pinned. Null-time
    rows are dead-lettered on both sides (round-8 null-ts sweep): a
    timeless observation has no week and no open/close position."""
    ev = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    okey = F.format_string(
        "%020d-%010d",
        F.unix_micros("ts") + F.lit(4611686018427387904),
        F.col("event_id"),
    )
    # NULL-value rows must not win open/close: DuckDB arg_min/arg_max
    # skip rows whose VALUE argument is NULL, but Spark min_by/max_by
    # return them (probed, round-6 null sweep). Nulling the ORDER key
    # for null values makes Spark skip the same rows.
    vkey = F.when(F.col("value").isNotNull(), okey)
    return ev.groupBy(
        "user_id",
        F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd").alias("week"),
    ).agg(
        F.min_by("value", vkey).alias("open_v"),
        F.max_by("value", vkey).alias("close_v"),
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
           CAST(round(CAST(CAST(r1 * 100.0 / total AS VARCHAR) AS DECIMAL(38,18)), 3) AS DOUBLE) + 0.0 AS pct FROM agg
    UNION ALL SELECT 'too_few_tokens', r2,
           CAST(round(CAST(CAST(r2 * 100.0 / total AS VARCHAR) AS DECIMAL(38,18)), 3) AS DOUBLE) + 0.0 FROM agg
    UNION ALL SELECT 'low_diversity', r3,
           CAST(round(CAST(CAST(r3 * 100.0 / total AS VARCHAR) AS DECIMAL(38,18)), 3) AS DOUBLE) + 0.0 FROM agg
    UNION ALL SELECT 'passed_all', passed,
           CAST(round(CAST(CAST(passed * 100.0 / total AS VARCHAR) AS DECIMAL(38,18)), 3) AS DOUBLE) + 0.0 FROM agg
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


@register(
    "agg_bitmap_distinct_users",
    oracle="""
    WITH b AS (
        SELECT event_type,
               strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               (user_id - ((user_id % 32) + 32) % 32) // 32 AS bucket,
               bit_or(1::BIGINT << CAST(((user_id % 32) + 32) % 32 AS INT)) AS bm,
               count(*) AS n
        FROM events GROUP BY 1, 2, 3
    )
    SELECT event_type, day,
           CAST(sum(bit_count(bm)) AS BIGINT) AS n_users,
           CAST(sum(n) AS BIGINT) AS n_events
    FROM b GROUP BY 1, 2
    """,
    section="2.4",
)
def agg_bitmap_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct count via bitmap OR-aggregation — the
    roaring-bitmap pattern for dense integer keys, and the third
    point on the repo's distinct-count spectrum (exact expansion:
    agg_count_distinct; mergeable estimate: agg_hll_sketch_union;
    exact AND mergeable when keys are dense ints: this). Each
    (group, key-chunk) partial is ONE long whose bits mark present
    keys; bit_or partials merge associatively and commutatively, so
    the shuffle carries fixed-width longs and the result is exact —
    COUNT(DISTINCT)'s two-phase row expansion never happens.

    Chunks are 32 bits wide so the shift distance stays ≤ 31 on both
    engines (DuckDB raises on 1::BIGINT << 63 overflow; Spark wraps).
    Bit index and bucket both use the FLOOR-mod pair (round-8
    negative-id sweep): a negative user_id makes plain `%` negative
    on both engines — DuckDB then ERRORS on the negative shift while
    Spark silently wraps, and Spark's trunc-division bucket disagrees
    with DuckDB's floor `//`. `((uid % 32) + 32) % 32` plus the
    exactly-divisible `(uid - pmod) / 32` bucket keep (bucket, bit)
    a bijection over ALL longs, identically on both engines.

    Scale shape: two map-side-combinable aggregates, both keyed by
    (event_type, day[, bucket]) — the second input is already
    bucket-level, orders of magnitude smaller than the events. At
    100 TB with user ids up to 2^40 this exact shape still works:
    bitmap partials stay proportional to live chunks, not key
    range."""
    ev = t(spark, sf_dir, "events")
    day = F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    b = ev.groupBy(
        "event_type",
        day.alias("day"),
        # integral `div` (not double /): the numerator is exactly
        # divisible, so trunc == floor at ANY id magnitude — a double
        # round-trip would lose exactness past 2^53.
        F.expr(
            "(user_id - (((user_id % 32) + 32) % 32)) div 32"
        ).alias("bucket"),
    ).agg(
        # PySpark's shiftleft() only takes a literal bit count, so the
        # per-row shift distance goes through the SQL form.
        F.bit_or(
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(((user_id % 32) + 32) % 32 AS INT))"
            )
        ).alias("bm"),
        F.count(F.lit(1)).alias("n"),
    )
    return b.groupBy("event_type", "day").agg(
        F.sum(F.bit_count("bm")).cast("bigint").alias("n_users"),
        F.sum("n").cast("bigint").alias("n_events"),
    )


@register("simsearch_quantized_rerank", oracle=None, memoize=True, section="2.11")
def simsearch_quantized_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage ANN: int8-quantized shortlist → exact float rerank —
    the production retrieval shape (FAISS/ScaNN style) missing
    between the repo's one-stage searchers: candidates come from the
    LSH bucket equi-join (sublinear, same machinery as
    simsearch_lsh_bucketed), stage 1 scores them with the INTEGER
    dot product of int8-quantized unit vectors (4 bytes/dim →
    1 byte/dim moving through the shuffle; exact long arithmetic, no
    float nondeterminism; proportional to cosine by construction)
    and keeps a 20-deep shortlist, stage 2 reranks ONLY the
    shortlist with full-precision cosine to top-5.
    tests/test_ann.py gates two invariants: the rerank is consistent
    (stage-2 top-5 ⊆ stage-1 shortlist, scores equal brute-force
    cosine on those pairs) and recall@5 vs exact brute force stays
    above the one-stage LSH searcher's floor. rows-only: xxhash64
    plane family + quantization grid are not oracle-expressible.

    Scale shape: quantization is a per-row expression (no stats
    pass, no shuffle); candidate generation is the bucketed
    equi-join, never all-pairs; the stage-2 rerank input is
    probes × 20 rows — at 100 TB the full-precision arithmetic
    touches a vanishing fraction of the corpus.

    Scan applies the V.is_valid gate (round-7 hostile-embeddings
    sweep: the symmetric int8 grid divides by the vector norm, so
    zero-norm / ragged / non-finite rows must not reach
    quantization)."""
    from hbase_sep_spark.operators import vectors as V

    e = t(spark, sf_dir, "embeddings").filter(V.is_valid("embedding"))

    # Symmetric int8 grid over the UNIT-normalized vector: q_i =
    # round(v_i / ||v|| × 127). The integer dot of two such vectors
    # is then proportional to their cosine (an affine per-dim grid
    # would rank by unnormalized offset dot and wreck the shortlist).
    def quantize(vec_col):
        norm = V.l2_norm(vec_col)
        return F.transform(
            vec_col,
            lambda x: F.round(x.cast("double") / norm * 127.0, 0).cast("long"),
        )

    q = e.select("vec_id", "embedding", quantize(F.col("embedding")).alias("qvec"))

    keys = V.lsh_tables("embedding", n_tables=8, n_planes=4)
    probe_keys = V.lsh_multiprobe_tables("embedding", n_tables=8, n_planes=4)
    bucketed = q.select("vec_id", "embedding", "qvec", F.explode(keys).alias("k")).select(
        "vec_id", "embedding", "qvec",
        F.col("k.table").alias("table"), F.col("k.bucket").alias("bucket"),
    )
    probes = (
        q.filter(F.col("vec_id") < 20)
        .select(
            F.col("vec_id").alias("probe_id"),
            F.col("embedding").alias("probe_emb"),
            F.col("qvec").alias("probe_q"),
            F.explode(probe_keys).alias("k"),
        )
        .select(
            "probe_id", "probe_emb", "probe_q",
            F.col("k.table").alias("table"), F.col("k.bucket").alias("bucket"),
        )
    )
    candidates = (
        bucketed.join(F.broadcast(probes), ["table", "bucket"])
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id", "probe_emb", "probe_q",
            F.col("vec_id").alias("neighbor_id"), "embedding", "qvec",
        )
        .distinct()
    )

    # Stage 1: integer dot product of the quantized vectors (exact
    # long arithmetic — deterministic shortlist), keep top 20.
    qdot = F.aggregate(
        F.zip_with("qvec", "probe_q", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    w1 = Window.partitionBy("probe_id").orderBy(F.desc("qscore"), "neighbor_id")
    shortlist = (
        candidates.select(
            "probe_id", "probe_emb", "neighbor_id", "embedding", qdot.alias("qscore")
        )
        .withColumn("srank", F.row_number().over(w1))
        .filter(F.col("srank") <= 20)
    )

    # Stage 2: exact cosine rerank of the 20-deep shortlist only.
    cos = V.dot("embedding", "probe_emb") / (
        V.l2_norm("embedding") * V.l2_norm("probe_emb")
    )
    w2 = Window.partitionBy("probe_id").orderBy(F.desc("cos_raw"), "neighbor_id")
    return (
        shortlist.select("probe_id", "neighbor_id", cos.alias("cos_raw"))
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= 5)
        .select(
            "probe_id", "neighbor_id",
            (F.round("cos_raw", 4) + F.lit(0.0)).alias("cos_sim"), "rank",
        )
    )


@register(
    "win_trailing_time_frame",
    oracle="""
    SELECT user_id, event_id,
           CAST(count(*) OVER w AS BIGINT) AS n_1h,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))) OVER w, 2) AS DOUBLE)
               AS sum_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
    section="2.5",
)
def win_trailing_time_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing TIME-interval window frame — the value-based RANGE
    frame over event time ('activity in the last hour, per event')
    that complements win_range_frame's numeric ordering and
    ts_rolling_zscore's row-count frame. The frame bound is integer
    microseconds (3 600 000 000 µs), so frame membership is exact —
    no float time arithmetic — and same-timestamp peers enter the
    frame together under identical RANGE semantics in both engines.
    The windowed sum runs in exact decimal, making it
    order-independent across shuffle configs.

    Scale shape: one user_id shuffle; the running frame is
    incremental (Spark's bounded-preceding RANGE frame slides two
    pointers over the sorted partition, O(1) amortized per row, O(
    frame) memory)."""
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3600000000, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_1h"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")).over(w), 2)
        .cast("double")
        .alias("sum_1h"),
    )


@register(
    "pipeline_epoch_shuffle",
    oracle="""
    WITH keyed AS (
        SELECT d.doc_id, e.epoch,
               md5(CAST(d.doc_id AS VARCHAR) || ':'
                   || CAST(e.epoch AS VARCHAR)) AS skey
        FROM documents d
        CROSS JOIN (SELECT unnest([0, 1]) AS epoch) e
    )
    SELECT doc_id, CAST(epoch AS INT) AS epoch,
           CAST(doc_id % 8 AS INT) AS shard,
           CAST(row_number() OVER (
               PARTITION BY epoch, doc_id % 8 ORDER BY skey) AS INT) AS pos
    FROM keyed
    """,
    section="2.11",
)
def pipeline_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch training-data shuffle — the data-
    loader contract a reproducible training run needs: every epoch
    re-orders the corpus by a seeded hash (md5 of doc_id:epoch —
    portable across engines, unlike xxhash), docs are routed to
    fixed shards, and each doc gets its position in its (epoch,
    shard) read order. Re-running the pipeline bit-reproduces every
    epoch's order; no RNG state anywhere.

    Scale shape: the epoch fan-out is a generated-column explode (no
    join against an epoch table at scale — it's a constant array);
    positions come from one (epoch, shard) window whose partition
    count scales with shards × epochs, each sorted independently.
    The md5 sort key is computed per row in codegen; at 100 TB the
    only shuffle is the final per-shard ordering — exactly the write
    pattern of sharded training files."""
    docs = t(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        F.explode(F.array(F.lit(0), F.lit(1))).alias("epoch"),
    ).select(
        "doc_id",
        "epoch",
        F.md5(
            F.concat(
                F.col("doc_id").cast("string"),
                F.lit(":"),
                F.col("epoch").cast("string"),
            )
        ).alias("skey"),
        (F.col("doc_id") % 8).alias("shard"),
    )
    w = Window.partitionBy("epoch", "shard").orderBy("skey")
    return keyed.select(
        "doc_id",
        F.col("epoch").cast("int").alias("epoch"),
        F.col("shard").cast("int").alias("shard"),
        F.row_number().over(w).cast("int").alias("pos"),
    )


@register("pipeline_neardup_prep", oracle=None, memoize=True, section="2.11")
def pipeline_neardup_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end NEAR-dup corpus prep — the fuzzy twin of
    pipeline_training_prep's exact-digest pipeline, composing the
    operator library the way a production corpus snapshot does:
    MinHash+LSH candidate pairs (operators/dedup.py, threshold 0.5)
    → connected components → quality-aware canonical selection (best
    quality, doc_id tiebreak, per cluster) → per-language corpus
    report: docs seen, docs kept, near-dups dropped, whitespace
    tokens and mean quality of the KEPT corpus. rows-only: the
    xxhash64 MinHash family is not oracle-expressible; invariants
    (kept + dropped == total, one keeper per cluster, near-dup drops
    ⊇ exact-dup drops) are gated in tests/test_operators.py.

    Scale shape: every stage is the library's bucketed-equi-join /
    per-round-persisted shape — signatures shuffle fixed-width longs,
    LSH banding never goes all-pairs, CC materializes per round; the
    final report aggregates doc-cardinality rows. The text column
    never shuffles."""
    from hbase_sep_spark.operators import dedup as D
    from hbase_sep_spark.operators import text as T

    docs = t(spark, sf_dir, "documents")
    pairs = D.minhash_near_dup_pairs(docs, threshold=0.5)
    comp = D.connected_components(pairs, docs.select("doc_id"))
    scored = docs.select(
        "doc_id",
        "lang",
        T.quality_score().alias("quality"),
        T.token_count_ws().cast("long").alias("n_tokens"),
    )
    labeled = scored.join(comp.select("doc_id", "cluster_id"), "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(F.desc("quality"), "doc_id")
    flagged = labeled.withColumn("rn", F.row_number().over(w))
    return flagged.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_kept"),
        F.sum(F.when(F.col("rn") > 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_neardups_dropped"),
        F.sum(F.when(F.col("rn") == 1, F.col("n_tokens")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("total_tokens_kept"),
        F.round(
            F.sum(
                F.when(F.col("rn") == 1, F.col("quality").cast("decimal(18,6)"))
            ).cast("double")
            / F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)),
            4,
        ).alias("avg_quality_kept"),
    )


@register(
    "events_incremental_agg_merge",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS total_value
    FROM events WHERE ts IS NOT NULL GROUP BY 1
    """,
    section="2.4",
)
def events_incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance — the delta-merge ETL
    pattern: a stored daily snapshot (here: partials over everything
    older than head−66h) is merged with the fresh tail's partials by
    RE-AGGREGATING the union, not recomputing history. The 66-hour
    seam deliberately splits a day across snapshot and delta, so the
    merge is a real partial-combine, not a disjoint union. The
    ORACLE is the direct one-shot aggregate: the query proves
    snapshot ⊕ delta == recompute — the associativity contract
    incremental pipelines rely on — because count and decimal-sum
    partials merge exactly.

    Scale shape: at 100 TB the snapshot side is a stored
    day-cardinality table (read, not recomputed); only the tail
    scans raw events. Both partial aggregates are map-side
    combinable; the merge re-aggregate runs over day-cardinality
    rows. Null-time rows are dead-lettered on both sides (round-8
    null-ts sweep) — the explicit filter makes the policy visible;
    the seam comparisons would silently drop them anyway (NULL < seam
    and NULL >= seam are both unknown), which is how the 30-vs-31
    group-count divergence surfaced."""
    ev = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    head = ev.agg(F.max("ts").alias("head_ts"))
    seam = F.col("head_ts") - F.expr("INTERVAL 66 HOURS")
    day = F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")

    def partials(df):
        return df.groupBy(day).agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("pv"),
        )

    with_seam = ev.crossJoin(F.broadcast(head))
    snapshot = partials(with_seam.filter(F.col("ts") < seam))
    delta = partials(with_seam.filter(F.col("ts") >= seam))
    return (
        snapshot.unionByName(delta)
        .groupBy("day")
        .agg(
            F.sum("pn").cast("bigint").alias("n_events"),
            F.round(F.sum("pv"), 2).cast("double").alias("total_value"),
        )
    )


_Z_BITS = 8
_DUCK_Z = " | ".join(
    f"(((u >> {i}) & 1) << {2 * i}) | (((v >> {i}) & 1) << {2 * i + 1})"
    for i in range(_Z_BITS)
)


@register(
    "layout_zorder_stats",
    oracle=f"""
    WITH keyed AS (
        SELECT CAST(user_id % 256 AS BIGINT) AS u,
               CAST(CAST(floor(value) AS BIGINT) % 256 AS BIGINT) AS v
        FROM events
    ),
    z AS (SELECT u, v, {_DUCK_Z} AS zval FROM keyed)
    SELECT CAST(zval // 256 AS BIGINT) AS zbucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(u) AS BIGINT) AS u_min, CAST(max(u) AS BIGINT) AS u_max,
           CAST(min(v) AS BIGINT) AS v_min, CAST(max(v) AS BIGINT) AS v_max
    FROM z GROUP BY 1
    """,
    section="2.6",
)
def layout_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering audit — the data-layout primitive
    behind multi-dimensional file skipping: interleaving the bits of
    two sort dimensions gives a 1-D sort key whose contiguous ranges
    cover SMALL rectangles in both dimensions at once, so min/max
    file stats prune on either predicate. The query computes the
    16-bit Morton code of (user_id, value) per row — pure integer
    shift/mask expressions, exact on both engines — then reports
    each 256-wide z-range's row count and per-dimension min/max
    envelope: the exact numbers a writer would place in parquet
    footer stats after a z-order rewrite.

    Scale shape: per-row codegen bit math + one map-side-combinable
    aggregate on the z-bucket; at 100 TB this IS the clustering job's
    statistics pass (the rewrite itself is a repartitionByRange on
    zval). The bounded envelopes (u_max−u_min, v_max−v_min ≪ 255
    per bucket) are the measurable pruning guarantee."""
    ev = t(spark, sf_dir, "events")
    u = (F.col("user_id") % 256).cast("long")
    v = (F.floor("value").cast("long") % 256).cast("long")
    keyed = ev.select(u.alias("u"), v.alias("v"))
    zval = F.lit(0).cast("long")
    for i in range(_Z_BITS):
        zval = zval.bitwiseOR(
            F.shiftleft(F.shiftright("u", i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright("v", i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    z = keyed.select("u", "v", zval.alias("zval"))
    return z.groupBy((F.col("zval") / 256).cast("bigint").alias("zbucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min("u").cast("bigint").alias("u_min"),
        F.max("u").cast("bigint").alias("u_max"),
        F.min("v").cast("bigint").alias("v_min"),
        F.max("v").cast("bigint").alias("v_max"),
    )
