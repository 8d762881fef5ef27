"""Round-4 analytics + training-pipeline extensions.

Seven sql-hash operators widening the graded surface along the axes a
100 TB training-data engine gets used for daily: cohort retention and
activity streaks (event analytics over the CDC feed — re-expresses
the reference's consumer-side analytics surface, [R: path-level
UNVERIFIED per SURVEY §0]), token-entropy and repetition quality
signals (corpus filtering), curriculum mixture sampling, k-means
E-step centroid distances, and quality-aware canonical selection for
exact dedup groups.

Every query here has a full DuckDB oracle (sql-hash regime) and
follows functions/portable.py's portability rules: integer or
hash-deterministic keys, rounded aggregates only, no per-row rounding
of exact arithmetic, no array/map output columns, identical aliases
both sides.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hbase_sep_spark.functions.portable import ascii_lower, knuth_hash
from hbase_sep_spark.io import t
from hbase_sep_spark.operators import text as T
from hbase_sep_spark.operators import vectors as V
from hbase_sep_spark.registry import register


@register(
    "events_retention_cohort",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
    ),
    coh AS (
        SELECT user_id, min(day) AS cohort_day FROM days GROUP BY user_id
    )
    SELECT strftime(c.cohort_day, '%Y-%m-%d') AS cohort_day,
           CAST(date_diff('day', c.cohort_day, d.day) AS INT) AS day_offset,
           CAST(count(DISTINCT d.user_id) AS BIGINT) AS n_users
    FROM days d JOIN coh c ON d.user_id = c.user_id
    GROUP BY 1, 2
    """,
    section="2.5",
)
def events_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle — the canonical product-analytics
    rollup: users are cohorted by first-active day, and each
    (cohort, day-offset) cell counts distinct users still active that
    many days later.

    Scale shape: the distinct-day set shuffles once on
    (user_id, day); the cohort min and the self-join both key on
    user_id, so Catalyst reuses one hash partitioning for the
    aggregate and the join (no broadcast needed — both sides are
    user-cardinality and co-partitioned); the final cell aggregate is
    map-side-combinable into a tiny (cohorts × offsets) result."""
    ev = t(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).distinct()
    coh = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        days.join(coh, "user_id")
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff(F.to_date("day"), F.to_date("cohort_day"))
            .cast("int")
            .alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_users"))
    )


@register(
    "win_streak_longest",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
        FROM events WHERE ts IS NOT NULL
    ),
    r AS (
        SELECT user_id, day,
               CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS INT) AS rn
        FROM days
    ),
    g AS (
        SELECT user_id, day - rn AS anchor, count(*) AS len
        FROM r GROUP BY user_id, day - rn
    )
    SELECT user_id,
           CAST(max(len) AS INT) AS longest_streak,
           CAST(sum(len) AS BIGINT) AS n_active_days,
           CAST(count(*) AS INT) AS n_streaks
    FROM g GROUP BY user_id
    """,
    section="2.5",
)
def win_streak_longest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the classic
    gaps-and-islands pattern: rank active days per user, subtract the
    rank from the date so each consecutive run collapses to one
    anchor, then count runs.

    Scale shape: one shuffle on user_id serves the distinct, the
    window, and both aggregates (all key on user_id or a superset);
    the window state is one row_number counter, O(1) per user.
    Null-time rows are dead-lettered on both sides (round-8 null-ts
    sweep): a NULL day would rank differently per engine."""
    ev = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    days = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).distinct()
    rn = F.row_number().over(Window.partitionBy("user_id").orderBy("day")).cast("int")
    runs = (
        days.withColumn("rn", rn)
        .withColumn("anchor", F.date_sub(F.col("day"), F.col("rn")))
        .groupBy("user_id", "anchor")
        .agg(F.count(F.lit(1)).alias("len"))
    )
    return runs.groupBy("user_id").agg(
        F.max("len").cast("int").alias("longest_streak"),
        F.sum("len").cast("bigint").alias("n_active_days"),
        F.count(F.lit(1)).cast("int").alias("n_streaks"),
    )


@register(
    "text_entropy_score",
    oracle="""
    WITH tok AS (
        SELECT doc_id,
               unnest(regexp_extract_all(
                   translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                                   'abcdefghijklmnopqrstuvwxyz'),
                   '[a-z0-9]+')) AS w
        FROM documents
    ),
    freq AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY doc_id, w)
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_unique,
           round(log2(CAST(sum(c) AS DOUBLE))
                 - sum(c * log2(CAST(c AS DOUBLE))) / CAST(sum(c) AS DOUBLE),
                 4) + 0.0 AS token_entropy
    FROM freq GROUP BY doc_id
    """,
    section="2.11",
)
def text_entropy_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution Shannon entropy per document — the quality
    signal that separates natural prose (high entropy) from boilerplate
    and keyword-stuffed spam (low entropy); a standard pre-training
    corpus filter alongside length/stopword heuristics.

    Computed in the integer-weighted form H = log2(n) − Σ c·log2(c)/n
    so the per-token work is exact integer counting; only the final
    O(unique-tokens) reduction touches floats (rounded, aggregate-side
    per the portability rules).  Scale shape: explode + two
    map-side-combinable hash aggregates keyed on doc_id — text itself
    never shuffles, only (doc_id, token) pairs."""
    d = t(spark, sf_dir, "documents")
    # ascii_lower, not lower(): full-Unicode lowering diverges between
    # engines on full-vs-simple case mappings (İ → "i̇" vs "i", round-6
    # unicode sweep); the A-Z fold is engine-identical and equivalent
    # here since the token class is ASCII anyway.
    tok = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "regexp_extract_all(translate(text,"
                " 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'),"
                " '[a-z0-9]+', 0)"
            )
        ).alias("w"),
    )
    freq = tok.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    n = F.sum("c").cast("double")
    ent = F.log2(n) - F.sum(F.col("c") * F.log2(F.col("c").cast("double"))) / n
    return freq.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_unique"),
        (F.round(ent, 4) + F.lit(0.0)).alias("token_entropy"),
    )


@register(
    "text_repetition_ratio",
    oracle="""
    WITH w AS (
        SELECT doc_id, string_split(coalesce(text, ''), ' ') AS ws
        FROM documents
    ),
    sh AS (
        SELECT doc_id,
               unnest(CASE WHEN len(ws) >= 5
                           THEN list_transform(range(1, len(ws) - 3),
                                i -> array_to_string(list_slice(ws, i, i + 4), ' '))
                           ELSE [array_to_string(ws, ' ')] END) AS shingle
        FROM w
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(count(DISTINCT shingle) AS BIGINT) AS n_unique,
           CAST(round(CAST(CAST(1.0 - CAST(count(DISTINCT shingle) AS DOUBLE) / count(*) AS VARCHAR) AS DECIMAL(38,18)), 4) AS DOUBLE) + 0.0
               AS rep_ratio
    FROM sh GROUP BY doc_id
    """,
    section="2.11",
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition ratio over word 5-shingles — the
    Gopher-style duplicate-n-gram fraction that flags looping or
    template-generated text: 1 − unique/total shingles.

    Scale shape: shingling is a per-row lambda (codegen, no shuffle);
    the count + count-distinct aggregate keys on doc_id so partial
    aggregation collapses each document locally — at 100 TB the
    shuffle carries one row per (doc, distinct-shingle) at worst, and
    the distinct would run on xxhash64(shingle) digests (kept as
    strings here so the oracle replays equality exactly)."""
    d = t(spark, sf_dir, "documents")
    # NULL text → '' on BOTH sides (round-6 null sweep: a NULL doc
    # otherwise yields a NULL shingle in DuckDB but '' in Spark).
    sh = d.select(
        "doc_id",
        F.explode(T.shingles(F.coalesce(F.col("text"), F.lit("")), 5)).alias(
            "shingle"
        ),
    )
    ratio = 1.0 - F.count_distinct("shingle").cast("double") / F.count(F.lit(1))
    return sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
        F.count_distinct("shingle").cast("bigint").alias("n_unique"),
        (F.round(ratio, 4) + F.lit(0.0)).alias("rep_ratio"),
    )


_MIX_RATE_SQL = "CASE lang WHEN 'en' THEN 0.3 WHEN 'zh' THEN 0.8 ELSE 1.0 END"


@register(
    "pipeline_mixture_sample",
    oracle=f"""
    WITH flagged AS (
        SELECT lang,
               ((CAST(doc_id AS BIGINT) % 2147483648) * 2654435761) % 4294967296
                   < ({_MIX_RATE_SQL}) * 4294967296 AS kept
        FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
           CAST(round(CAST(CAST(CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS DOUBLE)
                      / count(*) AS VARCHAR) AS DECIMAL(38,18)), 4) AS DOUBLE) AS achieved_rate
    FROM flagged GROUP BY lang
    """,
    section="2.11",
)
def pipeline_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum mixture sampling — hit a per-language target mix by
    deterministically downsampling over-represented sources (en→30 %,
    zh→80 %, rest kept whole) with a Knuth multiplicative hash
    threshold on the stable id, and report achieved vs target rates.

    Unlike rand()-based sampling the mixture is reproducible across
    runs, engines, and repartitionings — the property that makes a
    training-data mix auditable.  Overflow-safe exact integer
    arithmetic throughout (portable.knuth_hash: id reduced mod 2^31
    before the multiply).  Scale shape: the keep decision is a scan
    predicate (no shuffle); the report is one tiny hash aggregate."""
    d = t(spark, sf_dir, "documents")
    rate = (
        F.when(F.col("lang") == "en", 0.3)
        .when(F.col("lang") == "zh", 0.8)
        .otherwise(1.0)
    )
    kept = knuth_hash("doc_id") < rate * 4294967296
    return (
        d.select("lang", kept.alias("kept"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_total"),
            F.sum(F.when(F.col("kept"), 1).otherwise(0)).cast("bigint").alias("n_sampled"),
            F.round(
                F.sum(F.when(F.col("kept"), 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)),
                4,
            ).alias("achieved_rate"),
        )
    )


@register(
    "vec_centroid_distance",
    oracle=f"""
    WITH x AS (
        SELECT vec_id, label, i AS pos, CAST(embedding[i] AS DOUBLE) AS x
        FROM embeddings CROSS JOIN generate_series(1, 64) t(i)
        WHERE {V.valid_sql('embedding', require_nonzero=False)}
    ),
    cent AS (SELECT label, pos, avg(x) AS cx FROM x GROUP BY label, pos)
    SELECT x.vec_id, x.label,
           round(sqrt(sum((x.x - c.cx) * (x.x - c.cx))), 4) + 0.0 AS centroid_dist
    FROM x JOIN cent c ON x.label = c.label AND x.pos = c.pos
    GROUP BY x.vec_id, x.label
    """,
    section="2.11",
)
def vec_centroid_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-means E-step: per-label centroid, then each vector's L2
    distance to its label's centroid — the building block of IVF
    training, cluster-quality audits, and outlier mining over
    embedding corpora.

    Scale shape (two-phase, no big-side shuffle): (1) the centroid
    pass posexplodes to (label, pos, x) — a map-side-combinable avg
    whose shuffle carries only labels × dim partial sums per task;
    (2) centroids fold back to one array row per label (tiny) and
    BROADCAST against the corpus, where zip_with + aggregate compute
    the distance inside codegen — the embedding array itself never
    shuffles.  The oracle replays the same math relationally.

    Scan applies the V.is_valid gate without the nonzero requirement
    (distance needs no division; zero vectors are legitimate
    outliers) — NULL/ragged arrays would skew the per-position
    centroid and NaN components poison every distance in the label
    (round-7 hostile-embeddings sweep)."""
    e = t(spark, sf_dir, "embeddings").filter(
        V.is_valid("embedding", require_nonzero=False)
    )
    x = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "x")
    ).withColumn("x", F.col("x").cast("double"))
    cent = x.groupBy("label", "pos").agg(F.avg("x").alias("cx"))
    cent_arr = cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cx"))), lambda s: s.cx
        ).alias("centroid")
    )
    diff2 = F.zip_with(
        F.col("embedding").cast("array<double>"),
        "centroid",
        lambda a, b: (a - b) * (a - b),
    )
    dist = F.sqrt(F.aggregate(diff2, F.lit(0.0), lambda acc, v: acc + v))
    return (
        e.join(F.broadcast(cent_arr), "label")
        .select(
            "vec_id",
            "label",
            (F.round(dist, 4) + F.lit(0.0)).alias("centroid_dist"),
        )
    )


@register(
    "dedup_keep_best",
    oracle="""
    WITH g AS (
        SELECT doc_id, lang, n_chars, sha256(text) AS h,
               count(*) OVER (PARTITION BY sha256(text)) AS n_copies,
               row_number() OVER (PARTITION BY sha256(text)
                                  ORDER BY n_chars DESC, doc_id) AS rk
        FROM documents
    )
    SELECT doc_id, lang, CAST(n_copies AS BIGINT) AS n_copies
    FROM g WHERE rk = 1
    """,
    section="2.11",
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection for exact-duplicate groups:
    within each sha256(text) group keep the highest-quality copy
    (longest, then lowest id — in production: quality score, source
    priority), not an arbitrary first-seen row.  The difference
    matters: exact dedup that keeps a random copy loses metadata of
    the better-provenanced duplicate.

    Scale shape: one shuffle on the 32-byte digest (text never
    moves — n_chars rides as a tiny payload); both window functions
    share the digest partitioning, and the winner filter is a
    group-local top-1, no second pass."""
    d = t(spark, sf_dir, "documents")
    h = F.sha2(F.col("text"), 256)
    wh = Window.partitionBy("h")
    rk = F.row_number().over(wh.orderBy(F.desc("n_chars"), "doc_id"))
    return (
        d.select("doc_id", "lang", "n_chars", h.alias("h"))
        .withColumn("n_copies", F.count(F.lit(1)).over(wh).cast("bigint"))
        .withColumn("rk", rk)
        .filter(F.col("rk") == 1)
        .select("doc_id", "lang", "n_copies")
    )
