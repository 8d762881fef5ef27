"""Property-based semantics tests (SURVEY §5.4, hypothesis).

Invariants of the operator library on random small inputs:
dedup idempotence, union additivity, top-k ⊆ sort prefix, window
recompute vs brute force, and the SEP at-least-once invariant
(processing a feed with injected duplicates == processing the clean
feed). One shared SparkSession; data sizes kept tiny so the suite
stays fast while hypothesis explores the edge space (empty groups,
all-equal keys, duplicate join keys, ties).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window

from hbase_sep_spark.operators.dedup import exact_dedup_groups, minhash_signatures

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

texts = st.lists(
    st.text(alphabet="ab c", min_size=1, max_size=20).map(lambda s: s.strip() or "x"),
    min_size=1,
    max_size=12,
)
values = st.lists(st.integers(min_value=-5, max_value=5), min_size=0, max_size=20)


@given(texts=texts)
@settings(**SETTINGS)
def test_exact_dedup_idempotent(spark, texts):
    """f(f(x)) == f(x): deduping an already-deduped corpus is a
    no-op (canonical ids survive, every multiplicity collapses to 1)."""
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    once = exact_dedup_groups(df).select(
        F.col("canonical_doc_id").alias("doc_id"),
    )
    docs_once = df.join(once, "doc_id", "left_semi")
    twice = exact_dedup_groups(docs_once)
    assert twice.filter(F.col("n_copies") != 1).count() == 0
    assert twice.count() == once.count()


@given(a=values, b=values)
@settings(**SETTINGS)
def test_union_all_count_additive(spark, a, b):
    schema = "v int"
    da = spark.createDataFrame([(x,) for x in a], schema)
    db = spark.createDataFrame([(x,) for x in b], schema)
    assert da.unionAll(db).count() == len(a) + len(b)


@given(vals=st.lists(st.integers(0, 100), min_size=1, max_size=30), k=st.integers(1, 5))
@settings(**SETTINGS)
def test_topk_is_sort_prefix(spark, vals, k):
    """orderBy().limit(k) == first k of the full sort (with unique
    tie-break, so the prefix is well-defined)."""
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], ["id", "v"])
    full = [(r["v"], r["id"]) for r in df.orderBy(F.desc("v"), "id").collect()]
    topk = [(r["v"], r["id"]) for r in df.orderBy(F.desc("v"), "id").limit(k).collect()]
    assert topk == full[:k]


@given(vals=st.lists(st.tuples(st.integers(0, 3), st.integers(-10, 10)), min_size=0, max_size=25))
@settings(**SETTINGS)
def test_running_sum_matches_bruteforce(spark, vals):
    """Window cumulative sum per key == per-key Python prefix sums."""
    rows = [(i, k, v) for i, (k, v) in enumerate(vals)]
    if not rows:
        return
    df = spark.createDataFrame(rows, ["id", "k", "v"])
    w = Window.partitionBy("k").orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    got = {
        r["id"]: r["rs"]
        for r in df.select("id", "k", F.sum("v").over(w).alias("rs")).collect()
    }
    acc: dict[int, int] = {}
    for i, k, v in rows:
        acc[k] = acc.get(k, 0) + v
        assert got[i] == acc[k]


@given(dup_mod=st.integers(2, 5))
@settings(max_examples=5, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_at_least_once_invariant(spark, dup_mod):
    """SEP redelivery invariant: dedup(feed + duplicated slice) ==
    feed, whatever slice got redelivered."""
    feed = spark.range(0, 50).select(
        F.col("id").alias("event_id"), (F.col("id") % 7).alias("user_id")
    )
    redelivered = feed.filter(F.col("event_id") % dup_mod == 0)
    merged = feed.unionAll(redelivered).dropDuplicates(["event_id"])
    got = sorted(r["event_id"] for r in merged.collect())
    want = sorted(r["event_id"] for r in feed.collect())
    # (compared via collect: exceptAll over a self-unioned range hits
    # a Spark analyzer bug — INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND)
    assert got == want


@given(texts=texts)
@settings(**SETTINGS)
def test_minhash_identical_docs_identical_signatures(spark, texts):
    """MinHash signatures are a pure function of text: exact copies
    always collide on every component."""
    rows = [(i, t) for i, t in enumerate(texts)]
    rows += [(1000 + i, t) for i, t in enumerate(texts)]  # exact copies
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sig = minhash_signatures(df, n_hashes=8)
    by_id = {r["doc_id"]: tuple(r["minhash"]) for r in sig.collect()}
    for i in range(len(texts)):
        assert by_id[i] == by_id[1000 + i]


@given(
    ops=st.lists(
        st.tuples(st.integers(0, 4), st.sampled_from(["put", "delete_family"])),
        min_size=1,
        max_size=25,
    )
)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_latest_op_wins_matches_sequential_replay(spark, ops):
    """latest_op_wins == replaying the mutation log in order into a
    dict and dropping tombstoned keys — for ANY interleaving of puts
    and deletes."""
    import datetime as dt

    from hbase_sep_spark.operators.sep_model import latest_op_wins

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(seconds=i), key, op, float(i))
        for i, (key, op) in enumerate(ops)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, op string, value double"
    )
    got = {r.user_id: r.value for r in latest_op_wins(df).collect()}

    state = {}
    for i, (key, op) in enumerate(ops):
        if op == "put":
            state[key] = float(i)
        else:
            state.pop(key, None)
    assert got == state


@given(n_chars=st.integers(1, 2000))
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_chunking_tiles_every_document(spark, n_chars):
    """Chunk starts (stride 150, size 200) must cover every character:
    chunk i covers [150i, 150i+200), consecutive chunks overlap 50,
    and the last chunk reaches the end of the doc."""
    starts = list(range(0, max(n_chars, 1), 150))
    assert starts[0] == 0
    covered_to = 0
    for s in starts:
        assert s <= covered_to  # no gap
        covered_to = max(covered_to, min(s + 200, n_chars))
    assert covered_to == min(n_chars, starts[-1] + 200)
    assert covered_to >= n_chars or starts[-1] + 200 >= n_chars


def test_funnel_stages_are_monotone(spark):
    """Funnel counts must shrink (or hold) down the funnel, and the
    conversion ratio must be consistent with the stage counts."""
    from hbase_sep_spark.registry import load_all
    from tests.conftest import SF_UNIT

    REGISTRY = load_all()

    r = REGISTRY["win_funnel_conversion"].fn(spark, SF_UNIT).collect()[0]
    assert r.n_sessions >= r.n_viewed >= r.n_clicked_after_view >= r.n_converted >= 0
    assert abs(r.view_to_purchase_rate - round(r.n_converted / r.n_viewed, 4)) < 1e-9


def test_asof_tolerance_is_subset_of_asof(spark):
    """Every tolerance-bounded match must equal the unbounded as-of
    match for that purchase; tolerance can only null matches out,
    never invent or change one."""
    from hbase_sep_spark.registry import load_all
    from tests.conftest import SF_UNIT

    REGISTRY = load_all()

    base = {
        r.purchase_id: r.last_click_id
        for r in REGISTRY["join_asof_latest_event"].fn(spark, SF_UNIT).collect()
    }
    tol = {
        r.purchase_id: r.click_id_within_1h
        for r in REGISTRY["join_asof_tolerance"].fn(spark, SF_UNIT).collect()
    }
    assert set(tol) == set(base)
    n_nulled = 0
    for pid, cid in tol.items():
        if cid is None:
            n_nulled += 1  # stale or absent — either way null is legal
        else:
            assert cid == base[pid]  # fresh match == unbounded match
    assert 0 < n_nulled < len(tol)  # the bound actually bites, but not everywhere


def test_sequence_pack_is_contiguous_per_shard(spark):
    """Within every shard, token offsets must tile the concatenated
    token belt exactly (offset_{i+1} = offset_i + n_tokens_i) and
    pack_ids must be non-decreasing with bounded width."""
    from collections import defaultdict

    from hbase_sep_spark.registry import load_all
    from tests.conftest import SF_UNIT

    REGISTRY = load_all()

    rows = REGISTRY["pipeline_sequence_pack"].fn(spark, SF_UNIT).collect()
    by_shard = defaultdict(list)
    for r in rows:
        by_shard[r.shard].append(r)
    assert len(by_shard) > 1
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r.doc_id)
        off = 0
        prev_pack = 0
        for r in rs:
            assert r.token_offset == off, (shard, r.doc_id)
            assert r.pack_id == off // 512
            assert r.pack_id >= prev_pack
            off += r.n_tokens
            prev_pack = r.pack_id


# --- round-4 time-series invariants -------------------------------

_daily = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),     # user
        st.integers(min_value=0, max_value=14),    # day offset
        st.integers(min_value=-500, max_value=500) # centi-value
    ),
    min_size=1,
    max_size=24,
)


def _series_df(spark, rows):
    """(user_id, day, v) with one row per (user, day) — v has 2dp."""
    import datetime as dt

    dedup = {}
    for u, d, cv in rows:
        dedup[(u, d)] = cv / 100.0
    data = [
        (u, dt.date(2024, 3, 1) + dt.timedelta(days=d), v)
        for (u, d), v in dedup.items()
    ]
    return spark.createDataFrame(data, "user_id long, day date, v double")


@given(rows=_daily)
@settings(**SETTINGS)
def test_interpolation_bounded_by_neighbors(spark, rows):
    """Linear interpolation never escapes the [prev, next] envelope,
    and observed days pass through unchanged — on random sparse
    per-user daily series (ties, negatives, single-point users)."""
    daily = _series_df(spark, rows)
    span = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    cal = span.select(
        "user_id", F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day")
    )
    j = cal.join(daily, ["user_id", "day"], "left")
    past = Window.partitionBy("user_id").orderBy("day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    future = Window.partitionBy("user_id").orderBy("day").rowsBetween(
        1, Window.unboundedFollowing
    )
    obs_day = F.when(F.col("v").isNotNull(), F.col("day"))
    pv = F.last("v", ignorenulls=True).over(past)
    pd_ = F.last(obs_day, ignorenulls=True).over(past)
    nv = F.first("v", ignorenulls=True).over(future)
    nd = F.first(obs_day, ignorenulls=True).over(future)
    interp = pv + (nv - pv) * F.datediff(F.col("day"), pd_) / F.datediff(nd, pd_)
    out = j.select(
        "user_id",
        "day",
        "v",
        F.when(F.col("v").isNotNull(), F.col("v")).otherwise(interp).alias("x"),
        F.least(pv, nv).alias("lo"),
        F.greatest(pv, nv).alias("hi"),
    ).collect()
    for r in out:
        if r.v is not None:
            assert r.x == r.v
        else:
            assert r.lo - 1e-9 <= r.x <= r.hi + 1e-9, r


@given(rows=_daily)
@settings(**SETTINGS)
def test_gapfill_idempotent_on_dense_series(spark, rows):
    """Forward-filling an already-dense (gap-free) series is the
    identity: fill values equal the originals on every row."""
    daily = _series_df(spark, rows)
    # densify first: forward-fill once…
    w = Window.partitionBy("user_id").orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    span = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    cal = span.select(
        "user_id", F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day")
    )
    dense = (
        cal.join(daily, ["user_id", "day"], "left")
        .select("user_id", "day", F.last("v", ignorenulls=True).over(w).alias("v"))
    )
    # …then fill the dense series again: must be the identity.
    refill = dense.select(
        "user_id", "day", "v", F.last("v", ignorenulls=True).over(w).alias("v2")
    )
    assert refill.filter(F.col("v") != F.col("v2")).count() == 0


@given(
    received=st.sets(st.integers(min_value=0, max_value=40), min_size=0, max_size=30)
)
@settings(**SETTINGS)
def test_offset_islands_match_reference(spark, received):
    """The distributed gaps-and-islands decomposition (per-bucket
    row_number + cumulative bucket offsets) equals the obvious
    sequential reference on arbitrary received-offset sets — bucket
    boundaries, empty sets, singleton islands and all."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window as W

    rows = [(i,) for i in sorted(received)]
    if not rows:
        return
    df = spark.createDataFrame(rows, ["event_id"])
    # same construction as events_offset_islands, bucket width 8 to
    # force multi-bucket coverage on tiny inputs
    bucketed = df.withColumn("bucket", (F.col("event_id") / 8).cast("long"))
    counts = bucketed.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt"))
    w_cum = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, -1)
    offsets = counts.select(
        "bucket", F.coalesce(F.sum("cnt").over(w_cum), F.lit(0)).alias("rank_before")
    )
    w_bucket = W.partitionBy("bucket").orderBy("event_id")
    ranked = bucketed.join(F.broadcast(offsets), "bucket").select(
        "event_id",
        (F.col("event_id") - (F.row_number().over(w_bucket) + F.col("rank_before"))).alias("k"),
    )
    got = {
        (r.s, r.e, r.n)
        for r in ranked.groupBy("k")
        .agg(F.min("event_id").alias("s"), F.max("event_id").alias("e"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # sequential reference
    want = set()
    run = []
    for i in sorted(received):
        if run and i == run[-1] + 1:
            run.append(i)
        else:
            if run:
                want.add((run[0], run[-1], len(run)))
            run = [i]
    if run:
        want.add((run[0], run[-1], len(run)))
    assert got == want


def test_ewma_constant_series_is_identity(spark):
    """Property: EWMA of a constant series equals the constant at
    every row (weights renormalize over available lags, so even the
    warm-up rows are exact)."""
    import pyspark.sql.functions as F

    from hbase_sep_spark.io import t
    from hbase_sep_spark.registry import load_all
    from tests.conftest import SF_UNIT

    reg = load_all()
    # Rebuild the operator over a constant-value projection of the
    # fixture via its raw builder semantics: run the registered query
    # and check the bound instead on real data, then check the
    # constant identity on a hand frame with the same expression.
    df = spark.createDataFrame(
        [(1, i, float(7.25)) for i in range(1, 12)],
        ["user_id", "event_id", "value"],
    ).withColumn("ts", F.timestamp_seconds(F.col("event_id") * 60))
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lags = [F.col("value")] + [F.lag("value", i).over(w) for i in range(1, 6)]
    weights = [1.0, 0.5, 0.25, 0.125, 0.0625, 0.03125]
    num = lags[0] * weights[0]
    den = F.lit(1.0)
    for lg, wt in zip(lags[1:], weights[1:]):
        num = num + F.coalesce(lg, F.lit(0.0)) * wt
        den = den + F.when(lg.isNull(), F.lit(0.0)).otherwise(F.lit(wt))
    rows = df.select((F.round(num / den, 4) + F.lit(0.0)).alias("e")).collect()
    assert all(r.e == 7.25 for r in rows)

    # And on the fixture: every EWMA lies within the per-user value
    # envelope (convexity: it is a weighted mean of observed values).
    got = reg["ts_ewma_halflife"].fn(spark, SF_UNIT)
    ev = t(spark, SF_UNIT, "events")
    env = ev.groupBy("user_id").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    bad = (
        got.join(env, "user_id")
        .filter((F.col("ewma") < F.col("lo") - 1e-4) | (F.col("ewma") > F.col("hi") + 1e-4))
        .count()
    )
    assert bad == 0
