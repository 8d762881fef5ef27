"""Round-6 lead-in, second block: drift / sampling / allocation ops.

Five operators a feed-monitoring + training-data pipeline needs that
the registry didn't yet cover:

- `ts_autocorrelation`     — lag-k ACF of the per-type daily series
  (seasonality detection beyond the fixed-profile hourly op)
- `ts_cusum_drift`         — CUSUM change-point scan: where does a
  feed's level drift from its mean, and by how much
- `agg_jensen_shannon_drift` — JS divergence between the weekday and
  weekend event-type mixes (distribution-drift scalar; the symmetric
  bounded cousin of KL the mixture-monitoring literature uses)
- `sample_reservoir_topk_hash` — fixed-size-per-key deterministic
  sample (the auditable reservoir-sampling replacement: smallest-k
  Knuth-hash order statistics per key)
- `pipeline_token_budget_alloc` — largest-remainder apportionment of
  a global token budget across sources ∝ √tokens (the sampling-
  temperature allocation step of corpus mixing), in EXACT integer
  arithmetic so allocations sum to the budget on every engine

Portability notes: CUSUM works on micros-integer prefix sums (exact
under any association — immune to DuckDB's segment-tree window
combine order), with the drift formula written with the SAME
operation order on both sides so the doubles are bit-identical;
the budget allocator is pure int64 arithmetic (sqrt is IEEE
correctly-rounded on both engines, then snapped to a micros grid);
ACF/JS round to 4 dp with the -0.0 guard.

Reference parity: the reference (prazanna/hbase-sep [R: path-level
UNVERIFIED per SURVEY §0]) delivers per-key ordered CDC events;
drift scans and mix allocation are what its monitoring consumers
compute downstream.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hbase_sep_spark.functions.portable import DEC, fin, knuth_hash
from hbase_sep_spark.io import t
from hbase_sep_spark.operators import text as T
from hbase_sep_spark.registry import register


@register(
    "ts_autocorrelation",
    oracle="""
    WITH daily AS (
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS d,
               CAST(sum(CAST((CASE WHEN isnan(value) OR isinf(value)
                                   THEN NULL ELSE value END)
                             AS DECIMAL(18,6))) AS DOUBLE) AS v
        FROM events WHERE ts IS NOT NULL GROUP BY event_type, d
        HAVING v IS NOT NULL
    ),
    lagged AS (
        SELECT event_type, v,
               lag(v, 1) OVER w AS l1,
               lag(v, 2) OVER w AS l2,
               lag(v, 3) OVER w AS l3
        FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY d)
    ),
    guarded AS (
        SELECT event_type, v, l1, l2, l3,
               count(l1) OVER wt >= 2
                 AND min(CASE WHEN l1 IS NOT NULL THEN v END) OVER wt
                     <> max(CASE WHEN l1 IS NOT NULL THEN v END) OVER wt
                 AND min(l1) OVER wt <> max(l1) OVER wt AS ok1,
               count(l2) OVER wt >= 2
                 AND min(CASE WHEN l2 IS NOT NULL THEN v END) OVER wt
                     <> max(CASE WHEN l2 IS NOT NULL THEN v END) OVER wt
                 AND min(l2) OVER wt <> max(l2) OVER wt AS ok2,
               count(l3) OVER wt >= 2
                 AND min(CASE WHEN l3 IS NOT NULL THEN v END) OVER wt
                     <> max(CASE WHEN l3 IS NOT NULL THEN v END) OVER wt
                 AND min(l3) OVER wt <> max(l3) OVER wt AS ok3
        FROM lagged WINDOW wt AS (PARTITION BY event_type)
    ),
    per AS (
        SELECT event_type,
               round(corr(CASE WHEN ok1 THEN v END,
                          CASE WHEN ok1 THEN l1 END), 4) + 0.0 AS a1,
               round(corr(CASE WHEN ok2 THEN v END,
                          CASE WHEN ok2 THEN l2 END), 4) + 0.0 AS a2,
               round(corr(CASE WHEN ok3 THEN v END,
                          CASE WHEN ok3 THEN l3 END), 4) + 0.0 AS a3
        FROM guarded GROUP BY event_type
    )
    SELECT event_type, CAST(1 AS INT) AS lag_k, a1 AS acf FROM per
    UNION ALL
    SELECT event_type, CAST(2 AS INT) AS lag_k, a2 AS acf FROM per
    UNION ALL
    SELECT event_type, CAST(3 AS INT) AS lag_k, a3 AS acf FROM per
    """,
    section="2.4",
)
def ts_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-k autocorrelation (k = 1..3) of each event type's daily
    value series: Pearson corr between the series and its k-day lag —
    the seasonality/persistence detector. Daily sums are exact
    decimals cast to double (unrounded — full precision feeds the
    corr); corr rounds to 4 dp with the -0.0 guard; lag-undefined
    head rows drop out of corr as null pairs on both engines; a
    degenerate group (one pair, or zero variance) is nulled out
    before corr on BOTH sides — ANSI Spark corr would otherwise
    throw DIVIDE_BY_ZERO where DuckDB returns NULL.

    Scale shape: one shuffle to daily grain, ONE window pass produces
    all three lag columns (shared sort), and the per-type corr
    aggregate reuses the window's hash partitioning. Corr itself is
    a streaming moment merge — no materialized pair list.

    Non-finite measures pass the fin() gate before the decimal cast
    (ANSI CAST_OVERFLOW on NaN — round-7 non-finite sweep); all-
    garbage days drop before the lag windows on both sides (a NULL
    sort/lag input would place differently per engine). Null-time
    rows are dead-lettered on both sides too (round-8 null-ts sweep:
    a NULL day would sort differently per engine in the lag order)."""
    daily = (
        t(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .groupBy("event_type", F.date_format("ts", "yyyy-MM-dd").alias("d"))
        .agg(F.sum(fin("value").cast(DEC)).cast("double").alias("v"))
        .filter(F.col("v").isNotNull())
    )
    w = Window.partitionBy("event_type").orderBy("d")
    lagged = daily.select(
        "event_type",
        "v",
        F.lag("v", 1).over(w).alias("l1"),
        F.lag("v", 2).over(w).alias("l2"),
        F.lag("v", 3).over(w).alias("l3"),
    )
    # Degenerate-group guard (same hazard family as ADVICE r5): ANSI
    # corr THROWS DIVIDE_BY_ZERO on a 1-pair or zero-variance group
    # (probed: n=1 and constant-input both raise; n=0 returns NULL on
    # both engines). A regenerated short-span fixture could leave a
    # type with a single lag-k pair, crashing the whole job. Nulling
    # both corr inputs on unsafe groups turns those into the safe
    # n=0 case; min≠max is an exact zero-variance test. The guard
    # windows ride the SAME event_type exchange — no extra shuffle.
    wt = Window.partitionBy("event_type")

    def ok(lk: str):
        vp = F.when(F.col(lk).isNotNull(), F.col("v"))
        return (
            (F.count(lk).over(wt) >= 2)
            & (F.min(vp).over(wt) != F.max(vp).over(wt))
            & (F.min(lk).over(wt) != F.max(lk).over(wt))
        )

    guarded = lagged.select(
        "event_type",
        "v",
        "l1",
        "l2",
        "l3",
        ok("l1").alias("ok1"),
        ok("l2").alias("ok2"),
        ok("l3").alias("ok3"),
    )
    per = guarded.groupBy("event_type").agg(
        (
            F.round(
                F.corr(
                    F.when(F.col("ok1"), F.col("v")),
                    F.when(F.col("ok1"), F.col("l1")),
                ),
                4,
            )
            + F.lit(0.0)
        ).alias("a1"),
        (
            F.round(
                F.corr(
                    F.when(F.col("ok2"), F.col("v")),
                    F.when(F.col("ok2"), F.col("l2")),
                ),
                4,
            )
            + F.lit(0.0)
        ).alias("a2"),
        (
            F.round(
                F.corr(
                    F.when(F.col("ok3"), F.col("v")),
                    F.when(F.col("ok3"), F.col("l3")),
                ),
                4,
            )
            + F.lit(0.0)
        ).alias("a3"),
    )
    return per.select(
        "event_type",
        F.expr("stack(3, 1, a1, 2, a2, 3, a3) AS (lag_k, acf)"),
    ).select("event_type", F.col("lag_k").cast("int").alias("lag_k"), "acf")


@register(
    "ts_cusum_drift",
    oracle="""
    WITH daily AS (
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS d,
               CAST(sum(CAST((CASE WHEN isnan(value) OR isinf(value)
                                   THEN NULL ELSE value END)
                             AS DECIMAL(18,6))) * 1000000 AS BIGINT)
                   AS vm
        FROM events WHERE ts IS NOT NULL GROUP BY event_type, d
        HAVING vm IS NOT NULL
    ),
    cs AS (
        SELECT event_type, d,
               (CAST(sum(vm) OVER w AS DOUBLE)
                - CAST(CAST(row_number() OVER w AS BIGINT) AS DOUBLE)
                  * (CAST(sum(vm) OVER wf AS DOUBLE)
                     / CAST(count(*) OVER wf AS BIGINT))) / 1000000.0
                   AS cusum
        FROM daily
        WINDOW w AS (PARTITION BY event_type ORDER BY d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wf AS (PARTITION BY event_type)
    ),
    pk AS (
        SELECT event_type, d, cusum,
               max(abs(cusum)) OVER (PARTITION BY event_type) AS peak
        FROM cs
    )
    SELECT event_type, min(d) AS peak_date,
           round(max(abs(cusum)), 2) + 0.0 AS max_abs_cusum
    FROM pk WHERE abs(cusum) = peak
    GROUP BY event_type
    """,
    section="2.4",
)
def ts_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point scan per event type: cumulative deviation
    of the daily series from its mean, C_n = S_n − n·μ; the peak
    |C_n| locates the strongest level shift and measures its
    magnitude (Page's CUSUM without the reset clamp, which no SQL
    engine can express — the unclamped scan is the standard batch
    screening form).

    Portability: prefix sums run over EXACT micros integers, so any
    window-combine association (Spark running state vs DuckDB
    segment tree) yields the identical long; the drift double is
    then derived with the same operation order on both engines —
    bit-identical, so the peak-equality filter and the earliest-date
    tiebreak can never diverge.

    Scale shape: ONE scan, two exchanges total — the daily-grain
    aggregate, then one event_type exchange that every window
    (running sum, partition totals, peak) and the final per-type
    aggregate all share; no joins, no subtree re-computation (the
    aggregate+join form scanned the feed four times). Null-time rows
    are dead-lettered on both sides (round-8 null-ts sweep)."""
    daily = (
        t(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .groupBy("event_type", F.date_format("ts", "yyyy-MM-dd").alias("d"))
        .agg(
            (F.sum(fin("value").cast(DEC)) * 1000000)
            .cast("bigint")
            .alias("vm")
        )
        .filter(F.col("vm").isNotNull())
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy("event_type").orderBy("d")
    wf = Window.partitionBy("event_type")
    cs = daily.select(
        "event_type",
        "d",
        (
            (
                F.sum("vm").over(w).cast("double")
                - F.row_number().over(wn).cast("bigint").cast("double")
                * (
                    F.sum("vm").over(wf).cast("double")
                    / F.count(F.lit(1)).over(wf).cast("bigint")
                )
            )
            / F.lit(1000000.0)
        ).alias("cusum"),
    )
    pk = cs.select(
        "event_type",
        "d",
        "cusum",
        F.max(F.abs(F.col("cusum"))).over(wf).alias("peak"),
    )
    return (
        pk.filter(F.abs(F.col("cusum")) == F.col("peak"))
        .groupBy("event_type")
        .agg(
            F.min("d").alias("peak_date"),
            (F.round(F.max(F.abs(F.col("cusum"))), 2) + F.lit(0.0)).alias(
                "max_abs_cusum"
            ),
        )
    )


@register(
    "agg_jensen_shannon_drift",
    oracle="""
    WITH cnts AS (
        SELECT event_type,
               CAST(sum(CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END)
                    AS BIGINT) AS we,
               CAST(sum(CASE WHEN dayofweek(ts) IN (0, 6) THEN 0 ELSE 1 END)
                    AS BIGINT) AS wd
        FROM events GROUP BY event_type
    ),
    pq AS (
        SELECT CASE WHEN CAST(sum(wd) OVER () AS BIGINT) > 0
                    THEN CAST(wd AS DOUBLE) / CAST(sum(wd) OVER () AS BIGINT)
                    ELSE 0.0 END AS p,
               CASE WHEN CAST(sum(we) OVER () AS BIGINT) > 0
                    THEN CAST(we AS DOUBLE) / CAST(sum(we) OVER () AS BIGINT)
                    ELSE 0.0 END AS q
        FROM cnts
    ),
    pqm AS (SELECT p, q, (p + q) / 2 AS m FROM pq)
    SELECT round(sum(0.5 * (CASE WHEN p > 0 THEN p * ln(p / m) ELSE 0 END)
                    + 0.5 * (CASE WHEN q > 0 THEN q * ln(q / m) ELSE 0 END)),
                 4) + 0.0 AS js_nats
    FROM pqm
    """,
    section="2.4",
)
def agg_jensen_shannon_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between the weekday and weekend
    event-type distributions — the bounded symmetric drift scalar
    (0 = identical mixes, ln 2 = disjoint) that mixture-monitoring
    uses where KL's asymmetry and unboundedness hurt. Zero-mass
    guards on both terms AND on both class totals (an all-weekday
    fixture must degrade to p=0 identically on both engines —
    Spark nulls a double division by zero where DuckDB yields
    inf/NaN); probabilities are exact count ratios; the final
    5-term sum rounds at 4 dp.

    Scale shape: ONE scan — a conditional-count aggregate over the
    feed (the weekend test folds into map-side partials); the totals
    come from unbounded windows over the TYPE-CARDINALITY grouped
    frame (bounded domain, so the single-partition window is a no-op
    — and it avoids the aggregate-branch re-scan a crossJoin of a
    derived total would cost); divergence arithmetic never touches
    data-sized rows."""
    weekend = F.dayofweek("ts").isin(1, 7)
    cnts = (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.sum(F.when(weekend, 1).otherwise(0)).cast("bigint").alias("we"),
            F.sum(F.when(weekend, 0).otherwise(1)).cast("bigint").alias("wd"),
        )
    )
    wall = Window.partitionBy()
    swd = F.sum("wd").over(wall).cast("bigint")
    swe = F.sum("we").over(wall).cast("bigint")
    p = F.when(swd > 0, F.col("wd").cast("double") / swd).otherwise(F.lit(0.0))
    q = F.when(swe > 0, F.col("we").cast("double") / swe).otherwise(F.lit(0.0))
    pq = cnts.select(p.alias("p"), q.alias("q")).select(
        "p", "q", ((F.col("p") + F.col("q")) / 2).alias("m")
    )
    term_p = F.when(F.col("p") > 0, F.col("p") * F.log(F.col("p") / F.col("m"))).otherwise(0.0)
    term_q = F.when(F.col("q") > 0, F.col("q") * F.log(F.col("q") / F.col("m"))).otherwise(0.0)
    return pq.agg(
        (F.round(F.sum(0.5 * term_p + 0.5 * term_q), 4) + F.lit(0.0)).alias("js_nats")
    )


@register(
    "sample_reservoir_topk_hash",
    oracle="""
    SELECT event_type, event_id, CAST(rk AS INT) AS sample_rank
    FROM (
        SELECT event_type, event_id,
               row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY ((CAST(event_id AS BIGINT) % 2147483648) * 2654435761)
                            % 4294967296, event_id
               ) AS rk
        FROM events
    )
    WHERE rk <= 20
    """,
    section="2.11",
)
def sample_reservoir_topk_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size-per-key deterministic sample: the 20 events per
    type with the smallest Knuth-hash value — distributionally a
    uniform without-replacement reservoir sample, but reproducible
    across engines, runs, and repartitionings (rand()-based
    reservoirs are none of these), so the sample is auditable and
    re-joinable downstream. Overflow-safe exact integer hash
    (portable.knuth_hash: id reduced mod 2^31 before the multiply,
    so ANSI can never overflow at any id scale); hash ties break on
    event_id.

    Scale shape: one hash-partitioned window per key with the
    rk ≤ 20 predicate — Spark plans WindowGroupLimit, so each map
    partition keeps a 20-row heap per key BEFORE the shuffle;
    per-key state is O(k), never the key's full row set."""
    h = knuth_hash("event_id")
    w = Window.partitionBy("event_type").orderBy(h.asc(), F.col("event_id").asc())
    return (
        t(spark, sf_dir, "events")
        .select("event_type", "event_id", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 20)
        .select("event_type", "event_id", F.col("rk").cast("int").alias("sample_rank"))
    )


@register(
    "pipeline_token_budget_alloc",
    oracle="""
    WITH tok AS (
        SELECT source,
               CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
        FROM documents GROUP BY source
    ),
    w AS (
        SELECT source, tokens,
               CAST(round(sqrt(tokens) * 1000000, 0) AS BIGINT) AS wm
        FROM tok
    ),
    b AS (
        SELECT source, tokens, wm,
               (100000 * wm) // CAST(sum(wm) OVER () AS BIGINT) AS base,
               (100000 * wm) %  CAST(sum(wm) OVER () AS BIGINT) AS rem
        FROM w
    ),
    r AS (
        SELECT source, tokens, base, rem,
               CAST(100000 - sum(base) OVER () AS BIGINT) AS leftover,
               row_number() OVER (ORDER BY rem DESC, source) AS rk
        FROM b
    )
    SELECT source, tokens,
           CAST(base + (CASE WHEN rk <= leftover THEN 1 ELSE 0 END)
                AS BIGINT) AS alloc_tokens
    FROM r
    """,
    section="2.11",
)
def pipeline_token_budget_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder apportionment of a 100k-token training
    budget across sources, proportional to √tokens (the sub-linear
    upweighting of small sources that corpus-mixing recipes use):
    integer floor shares first, then the leftover tokens go to the
    largest remainders (source-name tiebreak). Allocations sum to
    EXACTLY the budget — guaranteed by construction, not rounding.

    Portability: weights snap to a micros grid after an IEEE
    correctly-rounded sqrt, and every subsequent op is int64
    (floor-div, mod, compare) — no float crosses an engine boundary.

    Scale shape: ONE scan — the only data-sized op is the per-source
    token count (map-side-combined sum of per-doc split sizes); all
    apportionment arithmetic (totals, floor shares, remainder rank)
    runs in unbounded windows over the SOURCE-CARDINALITY frame — a
    bounded domain, so the single-partition window is a no-op, and
    it avoids the data re-scan per crossJoin'd derived total."""
    tok = (
        t(spark, sf_dir, "documents")
        .select("source", T.token_count_ws().alias("nw"))
        .groupBy("source")
        .agg(F.sum("nw").cast("bigint").alias("tokens"))
    )
    wall = Window.partitionBy()
    tw = F.sum("wm").over(wall).cast("bigint")
    b = (
        tok.withColumn(
            "wm", F.round(F.sqrt(F.col("tokens")) * 1000000, 0).cast("bigint")
        )
        .withColumn("tw", tw)
        .withColumn("base", F.expr("(100000 * wm) DIV tw"))
        .withColumn("rem", (100000 * F.col("wm")) % F.col("tw"))
    )
    r = b.select(
        "source",
        "tokens",
        "base",
        (F.lit(100000) - F.sum("base").over(wall)).cast("bigint").alias("leftover"),
        F.row_number()
        .over(Window.orderBy(F.col("rem").desc(), F.col("source")))
        .alias("rk"),
    )
    return r.select(
        "source",
        "tokens",
        (
            F.col("base")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("alloc_tokens"),
    )
