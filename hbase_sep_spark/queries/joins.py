"""§2.3 Joins.

Physical-strategy posture for 100 TB (verified via .explain on each):
- dims (region 5, nation 25, supplier ≤1k rows) → explicit
  `broadcast()` — no shuffle of the fact side's join column at all;
- fact⋈fact (lineitem⋈orders) → shuffle join on the key, AQE picks
  sort-merge vs shuffled-hash and handles skew at runtime;
- theta/non-equi → BroadcastNestedLoopJoin with the SMALL side
  broadcast and pre-filtered (never NLJ two fact tables);
- as-of → the union+window trick: ONE shuffle on (key), no pairwise
  blow-up — the scalable form of DuckDB's ASOF JOIN.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hbase_sep_spark.functions import dsum
from hbase_sep_spark.io import t
from hbase_sep_spark.registry import register

SECTION = "2.3"

def _revenue():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "join_inner_broadcast",
    oracle="""
    SELECT n_nationkey, n_name, r_name
    FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
    section=SECTION,
)
def join_inner_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name", "r_name"
    )


@register(
    "join_inner_shuffle",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus,
           count(*) AS n_lines,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS order_revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderkey, o_orderstatus
    """,
    section=SECTION,
)
def join_inner_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈fact equi join. The o_orderstatus filter is pushed below
    the join (Catalyst), shrinking the shuffled build side; the
    post-join aggregate reuses the join's hash partitioning on
    o_orderkey — no second shuffle."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(_revenue()).alias("order_revenue"),
        )
    )


@register(
    "join_multiway_star",
    oracle="""
    SELECT n_name,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
    section=SECTION,
)
def join_multiway_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 5-way star join → revenue by nation.

    Join order is fact-first: lineitem picks up supplier nation via a
    broadcast, shuffles once against orders, then the customer dim
    (with the c_nationkey = s_nationkey correlation) and nation attach
    as broadcasts — the big fact table is shuffled exactly once and
    never carried through a dim-side shuffle. At full 100 TB scale
    AQE demotes the customer broadcast to a shuffle join on o_custkey
    automatically if it exceeds the broadcast threshold; the plan
    shape stays valid.
    """
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    joined = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(
            F.broadcast(c),
            (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    )
    return joined.groupBy("n_name").agg(
        dsum(_revenue()).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c_custkey,
           c_name,
           CAST(count(o_orderkey) AS BIGINT) AS n_orders,
           coalesce(CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE), 0.0) AS total_spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
    section=SECTION,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer with null-fill: customers with zero orders appear
    with n_orders=0 (count skips nulls) and total_spend=0."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dsum("o_totalprice"), F.lit(0.0)).alias("total_spend"),
        )
    )


@register(
    "join_right_outer",
    oracle="""
    SELECT o_orderkey,
           o_totalprice,
           l_linenumber,
           l_quantity
    FROM (SELECT * FROM lineitem WHERE l_quantity > 45) big
    RIGHT JOIN orders ON big.l_orderkey = o_orderkey
    """,
    section=SECTION,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer: every order kept; orders with no high-quantity
    lines get null lineitem columns."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    o = t(spark, sf_dir, "orders")
    return li.join(o, li.l_orderkey == o.o_orderkey, "right").select(
        "o_orderkey", "o_totalprice", "l_linenumber", "l_quantity"
    )


@register(
    "join_full_outer",
    oracle="""
    SELECT coalesce(p.user_id, c.user_id) AS user_id,
           p.n_purchases,
           c.n_clicks
    FROM (SELECT user_id, count(*) AS n_purchases FROM events
          WHERE event_type = 'purchase' GROUP BY user_id) p
    FULL OUTER JOIN
         (SELECT user_id, count(*) AS n_clicks FROM events
          WHERE event_type = 'click' GROUP BY user_id) c
    ON p.user_id = c.user_id
    """,
    section=SECTION,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_purchases"))
        .alias("p")
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_clicks"))
        .alias("c")
    )
    return p.join(c, F.col("p.user_id") == F.col("c.user_id"), "full").select(
        F.coalesce(F.col("p.user_id"), F.col("c.user_id")).alias("user_id"),
        "n_purchases",
        "n_clicks",
    )


@register(
    "join_left_semi",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    """,
    section=SECTION,
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS-style semi join: customers with ≥1 urgent order. Semi
    join shuffles only the distinct keys of the right side."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@register(
    "join_left_anti",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
    """,
    section=SECTION,
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS anti join: customers with no pending orders (the
    unfiltered variant is empty at this SF — every customer has
    orders — so the filter keeps the check non-trivial)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "join_cross",
    oracle="""
    SELECT r_name, s.o_orderstatus
    FROM region
    CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    """,
    section=SECTION,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of two bounded sets (5 × 3 rows). Cross joins are
    only ever sane when one side is provably tiny — this one is."""
    r = t(spark, sf_dir, "region").select("r_name")
    statuses = t(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return r.crossJoin(F.broadcast(statuses))


@register(
    "join_theta_range",
    oracle="""
    SELECT a.p_partkey AS anchor_key,
           b.p_partkey AS similar_key,
           a.p_retailprice AS anchor_price,
           b.p_retailprice AS similar_price
    FROM (SELECT * FROM part WHERE p_partkey <= 20) a
    JOIN part b
      ON b.p_partkey <> a.p_partkey
     AND b.p_retailprice >= a.p_retailprice * 0.95
     AND b.p_retailprice <= a.p_retailprice * 1.05
    """,
    section=SECTION,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta) join: parts within ±5% of an anchor part's
    price. The anchor side is pre-filtered tiny and broadcast →
    BroadcastNestedLoopJoin; at scale this is the banded-join pattern
    (a range-bucket equi-key would be added to make it an equi join)."""
    a = t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 20).alias("a")
    b = t(spark, sf_dir, "part").alias("b")
    cond = (
        (F.col("b.p_partkey") != F.col("a.p_partkey"))
        & (F.col("b.p_retailprice") >= F.col("a.p_retailprice") * 0.95)
        & (F.col("b.p_retailprice") <= F.col("a.p_retailprice") * 1.05)
    )
    return F.broadcast(a).join(b, cond).select(
        F.col("a.p_partkey").alias("anchor_key"),
        F.col("b.p_partkey").alias("similar_key"),
        F.col("a.p_retailprice").alias("anchor_price"),
        F.col("b.p_retailprice").alias("similar_price"),
    )


@register(
    "join_range_binned",
    oracle="""
    SELECT a.p_partkey AS anchor_key,
           b.p_partkey AS similar_key,
           a.p_retailprice AS anchor_price,
           b.p_retailprice AS similar_price
    FROM (SELECT * FROM part WHERE p_size = 1) a
    JOIN (SELECT * FROM part WHERE p_size = 1) b
      ON b.p_partkey <> a.p_partkey
     AND b.p_retailprice >= a.p_retailprice * 0.95
     AND b.p_retailprice <= a.p_retailprice * 1.05
    """,
    section=SECTION,
)
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join made equi: the large×large form of join_theta_range
    (which broadcasts a tiny anchor side and nested-loops — fine there,
    fatal when both sides are big; vanilla Spark has no native range
    join optimization). Build side bins by floor(price/W); probe side
    explodes the ≤2 bins its [0.95p, 1.05p] band can touch (W ≥ the
    widest band); the join is then a plain shuffled EQUI join on the
    bin key with the exact range predicate as a post-filter — no
    nested loop anywhere (asserted in tests/test_plans.py). Same
    pattern as the LSH band join: candidates from buckets, exactness
    from a cheap filter."""
    W = 120.0  # ≥ widest band: 0.10 × max(p_retailprice) ≈ 105
    p = t(spark, sf_dir, "part").filter(F.col("p_size") == 1).select(
        "p_partkey", "p_retailprice"
    )
    probe = p.select(
        F.col("p_partkey").alias("anchor_key"),
        F.col("p_retailprice").alias("anchor_price"),
        F.explode(
            F.sequence(
                F.floor(F.col("p_retailprice") * 0.95 / W),
                F.floor(F.col("p_retailprice") * 1.05 / W),
            )
        ).alias("bin"),
    )
    build = p.select(
        F.col("p_partkey").alias("similar_key"),
        F.col("p_retailprice").alias("similar_price"),
        F.floor(F.col("p_retailprice") / W).alias("bin"),
    )
    return (
        probe.join(build, "bin")
        .filter(
            (F.col("similar_key") != F.col("anchor_key"))
            & (F.col("similar_price") >= F.col("anchor_price") * 0.95)
            & (F.col("similar_price") <= F.col("anchor_price") * 1.05)
        )
        .select("anchor_key", "similar_key", "anchor_price", "similar_price")
    )


@register(
    "join_interval_events",
    oracle="""
    SELECT e1.user_id,
           e1.event_id AS first_id,
           e2.event_id AS next_id,
           e1.event_type AS first_type,
           e2.event_type AS next_type
    FROM events e1
    JOIN events e2
      ON e1.user_id = e2.user_id
     AND e1.event_id < e2.event_id
     AND e2.ts >= e1.ts
     AND e2.ts <= e1.ts + INTERVAL 1 HOUR
    """,
    section=SECTION,
)
def join_interval_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval self-join: pairs of events by the same user within one
    hour (batch form of the streaming interval join). Equi key
    user_id bounds the pair space; the time predicate filters within
    each key group."""
    ev = t(spark, sf_dir, "events")
    e1 = ev.alias("e1")
    e2 = ev.alias("e2")
    return e1.join(
        e2,
        (F.col("e1.user_id") == F.col("e2.user_id"))
        & (F.col("e1.event_id") < F.col("e2.event_id"))
        & (F.col("e2.ts") >= F.col("e1.ts"))
        & (F.col("e2.ts") <= F.col("e1.ts") + F.expr("INTERVAL 1 HOUR")),
    ).select(
        F.col("e1.user_id").alias("user_id"),
        F.col("e1.event_id").alias("first_id"),
        F.col("e2.event_id").alias("next_id"),
        F.col("e1.event_type").alias("first_type"),
        F.col("e2.event_type").alias("next_type"),
    )


@register(
    "join_asof_latest_event",
    oracle="""
    WITH clicks AS (
        SELECT user_id, ts, max(event_id) AS click_id
        FROM events WHERE event_type = 'click' AND ts IS NOT NULL
              AND user_id IS NOT NULL
        GROUP BY user_id, ts
    ),
    purchases AS (
        SELECT user_id, ts, event_id AS purchase_id, value AS purchase_value
        FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
              AND user_id IS NOT NULL
    )
    SELECT p.user_id, p.purchase_id, p.purchase_value, c.click_id AS last_click_id
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    section=SECTION,
)
def join_asof_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's latest click at
    or before it (DuckDB expresses this as ASOF JOIN).

    Spark-first construction — the scalable union+window trick:
    union both sides with a marker, ONE shuffle on user_id, then
    last(click-id-when-click, ignoreNulls) over (ts, marker,
    event_id) gives the prevailing click for every purchase row. No
    pairwise join blow-up; state per key is one value — this survives
    100 TB where a naive join-then-max would not.

    Round-9 plan fix (VERDICT-r8 item 4 — this was the one non-UDF
    query >2x DuckDB at 10x scale): the old form pre-deduped clicks
    to one per (user, ts) via groupBy(user_id, ts) + max(event_id),
    which cost a SECOND full exchange before the window. The dedup is
    unnecessary: with event_id as the third sort key, clicks at the
    same (user, ts) sort in event_id order inside the ONE window,
    so last() naturally resolves an exact-ts tie to the max event_id
    — exactly DuckDB ASOF's pick against the oracle's max(event_id)
    dedup (event_id is unique, pinned by
    tests/test_fixture_assumptions.py, so the order is total). The
    plan is now scan -> union -> one Exchange(user_id) -> one Sort ->
    Window, pinned by tests/test_plans.py.

    marker=0 sorts clicks before purchases at equal ts, so a click at
    exactly the purchase ts is visible to it (ASOF '>=' semantics).
    Null-time AND null-key dead-letter on both sides (round-8
    null-ts/null-keys sweeps): a NULL-ts purchase has no as-of
    position, a NULL-ts click no recency, and a NULL-user record no
    match key — DuckDB's ASOF equi-join drops NULL keys while the
    union+window form would happily match inside a NULL partition.
    """
    ev = t(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(None).cast("double").alias("purchase_value"),
        F.lit(0).alias("marker"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.col("value").alias("purchase_value"),
        F.lit(1).alias("marker"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "marker", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_id = F.when(F.col("marker") == 0, F.col("event_id"))
    return (
        clicks.unionByName(purchases)
        .withColumn("last_click_id", F.last(click_id, ignorenulls=True).over(w))
        .filter(F.col("marker") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            "purchase_value",
            "last_click_id",
        )
    )


@register(
    "join_skew_salted",
    oracle="""
    WITH fact AS (
        SELECT CASE WHEN user_id < 30 THEN 0 ELSE user_id END AS hot_key, value
        FROM events
    ),
    dim AS (
        SELECT user_id AS hot_key, count(*) AS n_user_events
        FROM events GROUP BY user_id
    )
    SELECT f.hot_key,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(round(sum(CAST(f.value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value,
           max(d.n_user_events) AS dim_attr
    FROM fact f JOIN dim d ON f.hot_key = d.hot_key
    GROUP BY f.hot_key
    """,
    section=SECTION,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated join via salting — the manual pattern for when
    AQE's runtime skew split isn't available (e.g. bucketed inputs).

    A synthetic hot key (a fifth of all events collapse onto key 0)
    would put the whole hot partition on one task in a plain shuffle
    join. Mitigation: the fact side gets a deterministic salt
    (event_id % N_SALT) appended to the key; the dim side is exploded
    across all N_SALT salt values; the join key becomes (key, salt) →
    the hot key's rows spread over N_SALT tasks. The salt never leaks
    into the result — the oracle is the UNsalted join, proving
    semantic equivalence.
    """
    N_SALT = 8
    ev = t(spark, sf_dir, "events")
    fact = ev.select(
        F.when(F.col("user_id") < 30, F.lit(0)).otherwise(F.col("user_id")).alias("hot_key"),
        "value",
        # floor-mod, not %: a negative event_id would salt into
        # {-7..-1}, which the dim side's explode(0..7) never matches —
        # the salted join SILENTLY DROPS those fact rows (round-8
        # negative-id sweep). Salting correctness rule: the fact-side
        # salt must land in exactly the dim side's replicated domain
        # for every possible key.
        (((F.col("event_id") % N_SALT) + N_SALT) % N_SALT).alias("salt"),
    )
    dim = (
        ev.groupBy(F.col("user_id").alias("hot_key"))
        .agg(F.count(F.lit(1)).alias("n_user_events"))
        .withColumn("salt", F.explode(F.array(*[F.lit(i) for i in range(N_SALT)])))
    )
    joined = fact.join(dim, ["hot_key", "salt"])
    return joined.groupBy("hot_key").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("value").alias("sum_value"),
        F.max("n_user_events").alias("dim_attr"),
    )


@register(
    "join_asof_tolerance",
    oracle="""
    WITH clicks AS (
        SELECT user_id, ts, max(event_id) AS click_id
        FROM events WHERE event_type = 'click'
        GROUP BY user_id, ts
    ),
    purchases AS (
        SELECT user_id, ts, event_id AS purchase_id
        FROM events WHERE event_type = 'purchase'
    )
    SELECT p.user_id, p.purchase_id,
           CASE WHEN c.ts >= p.ts - INTERVAL 1 HOUR THEN c.click_id END
               AS click_id_within_1h
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    section=SECTION,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a tolerance bound (pandas merge_asof's
    `tolerance=`): each purchase takes the user's latest click at or
    before it ONLY if that click is within the preceding hour,
    else NULL — the feature-store freshness rule ("use the feature
    snapshot unless it's stale").

    Same single-shuffle union+window construction as
    join_asof_latest_event; the tolerance is a post-window mask on
    the prevailing click's timestamp (carried by a second
    last(ignorenulls) over the same frame — no extra shuffle,
    Catalyst evaluates both lasts in one window pass)."""
    ev = t(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
        .select(
            "user_id",
            "ts",
            F.lit(None).cast("long").alias("purchase_id"),
            "click_id",
            F.col("ts").alias("click_ts"),
            F.lit(0).alias("marker"),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("purchase_id"),
        F.lit(None).cast("long").alias("click_id"),
        F.lit(None).cast("timestamp").alias("click_ts"),
        F.lit(1).alias("marker"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "marker", "purchase_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = clicks.unionByName(purchases)
    prevailing_id = F.last("click_id", ignorenulls=True).over(w)
    prevailing_ts = F.last("click_ts", ignorenulls=True).over(w)
    fresh = F.col("last_click_ts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR")
    return (
        unioned.select(
            "user_id",
            "ts",
            "purchase_id",
            prevailing_id.alias("last_click_id"),
            prevailing_ts.alias("last_click_ts"),
            "marker",
        )
        .filter(F.col("marker") == 1)
        .select(
            "user_id",
            "purchase_id",
            F.when(fresh, F.col("last_click_id")).alias("click_id_within_1h"),
        )
    )


@register(
    "join_nullsafe_eq",
    oracle="""
    WITH ev AS (
        SELECT nullif(event_type, 'error') AS k, value FROM events
    ),
    d AS (
        SELECT DISTINCT nullif(event_type, 'error') AS k FROM events
    )
    SELECT coalesce(d.k, '<null>') AS join_key,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(round(sum(CAST(ev.value AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS sum_value
    FROM ev JOIN d ON ev.k IS NOT DISTINCT FROM d.k
    GROUP BY 1
    """,
    section=SECTION,
)
def join_nullsafe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL
    join keys MATCH each other instead of silently dropping — the
    semantics a CDC pipeline needs when the join key itself can be a
    deleted/absent attribute (here errors are mapped to NULL). A
    plain equi-join would lose every error event; the null-safe join
    keeps them under the '<null>' key. Catalyst still plans this as a
    hash join (null-safe equality is a valid equi-key)."""
    ev = t(spark, sf_dir, "events").select(
        F.nullif(F.col("event_type"), F.lit("error")).alias("k"), "value"
    )
    d = ev.select("k").distinct().select(F.col("k").alias("dk"))
    return (
        ev.join(F.broadcast(d), ev.k.eqNullSafe(F.col("dk")))
        .groupBy(F.coalesce("dk", F.lit("<null>")).alias("join_key"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
    )
