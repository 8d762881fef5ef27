"""Streaming semantics tests (SURVEY §5.5): the SEP delivery
invariants — replay equals batch, redelivery collapses to
exactly-once — verified end-to-end through the sep_events source.
Runs at sf0.001 for speed.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from hbase_sep_spark.io import t
from hbase_sep_spark.registry import load_all
from tests.conftest import SF_UNIT

REGISTRY = load_all()


def test_stream_replay_equals_batch(spark):
    """The full stream replay delivers exactly the batch table
    (stream/batch duality — SURVEY §1.1)."""
    streamed = REGISTRY["stream_sep_source"].fn(spark, SF_UNIT)
    batch = t(spark, SF_UNIT, "events")
    assert streamed.count() == batch.count()
    diff = streamed.select("event_id").exceptAll(batch.select("event_id"))
    assert diff.count() == 0


def test_stream_dedup_is_exactly_once(spark):
    """At-least-once feed (redeliveries injected) + watermark dedup ==
    the clean feed's per-type counts."""
    result = REGISTRY["stream_dedup_watermark"].fn(spark, SF_UNIT)
    clean = (
        t(spark, SF_UNIT, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_unique_events"))
    )
    got = {r["event_type"]: r["n_unique_events"] for r in result.collect()}
    want = {r["event_type"]: r["n_unique_events"] for r in clean.collect()}
    assert got == want


def test_stream_stateful_latest_matches_batch_window(spark):
    """applyInPandasWithState 'current row' state == the batch
    latest-per-key query."""
    stateful = REGISTRY["stream_stateful_latest"].fn(spark, SF_UNIT)
    batch = REGISTRY["events_latest_per_key"].fn(spark, SF_UNIT)
    got = {r["user_id"]: r["last_event_id"] for r in stateful.collect()}
    want = {r["user_id"]: r["event_id"] for r in batch.collect()}
    assert got == want


def test_stream_per_key_delivery_order(spark):
    """The SEP guarantee: each key's events arrive in order across
    micro-batches (batch N's events for user U all precede batch
    N+1's). Collect (batch, user, ts) via foreachBatch and assert
    per-user (batch, ts) sequences are monotone."""
    import tempfile

    from hbase_sep_spark.streaming.subscription import SepSubscription

    seen: list[tuple[int, int, object, int]] = []

    def listener(batch_df, epoch_id):
        for r in batch_df.select("user_id", "ts", "event_id").collect():
            seen.append((epoch_id, r["user_id"], r["ts"], r["event_id"]))

    sub = SepSubscription(
        spark,
        name="order-test",
        feed_path=f"{SF_UNIT}/events.parquet",
        root=tempfile.mkdtemp(prefix="sep_order_"),
        batch_size=300,
    )
    q = sub.start(listener)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert len(seen) == 1000
    per_user: dict[int, list[tuple]] = {}
    for epoch, user, ts, eid in seen:
        per_user.setdefault(user, []).append((epoch, ts, eid))
    assert len(per_user) > 1
    for user, entries in per_user.items():
        # arrival order == (epoch asc, and within the feed, ts asc):
        # the sequence as delivered must already be sorted.
        assert entries == sorted(entries), f"out-of-order delivery for user {user}"


def test_incremental_upsert_view_equals_batch_latest(spark):
    """The incrementally-maintained materialized view (CDC upserts,
    redeliveries included) converges to the batch latest-per-key
    result — the SEP secondary-view guarantee."""
    view = REGISTRY["stream_incremental_upsert_view"].fn(spark, SF_UNIT)
    batch = REGISTRY["events_latest_per_key"].fn(spark, SF_UNIT)
    got = {r["user_id"]: (r["event_id"], r["value"]) for r in view.collect()}
    want = {r["user_id"]: (r["event_id"], r["value"]) for r in batch.collect()}
    assert got == want


def test_feed_is_ts_sorted_on_disk():
    """Precondition of the partition-based source: stream offsets are
    file row positions, which is only per-key-ordered because the
    generator writes the feed sorted by (ts, event_id)."""
    import pyarrow.parquet as pq

    tbl = pq.ParquetFile(f"{SF_UNIT}/events.parquet").read(columns=["ts", "event_id"])
    ts = tbl.column("ts").to_pylist()
    eid = tbl.column("event_id").to_pylist()
    keys = list(zip(ts, eid))
    assert keys == sorted(keys)


def test_source_range_read_prunes_and_strides():
    """Worker-side range read: exact [lo, hi) slicing and redelivery
    striding, straight off the parquet file (no driver state)."""
    from hbase_sep_spark.sources.sep_events import _read_rows

    path = f"{SF_UNIT}/events.parquet"
    full = list(_read_rows(path, 0, 10**9))
    assert len(full) == 1000
    mid = list(_read_rows(path, 100, 250))
    assert mid == full[100:250]
    strided = list(_read_rows(path, 100, 250, step=5))
    assert strided == full[100:250:5]
    assert list(_read_rows(path, 500, 500)) == []


def test_source_offsets_are_driver_light():
    """The reader's driver half never materializes the feed: offset
    arithmetic needs only the footer row count, and each batch's
    partitions tile [start, end) exactly."""
    from hbase_sep_spark.sources.sep_events import SepEventsStreamReader

    r = SepEventsStreamReader({"path": f"{SF_UNIT}/events.parquet", "batch_size": "300"})
    assert r.initialOffset() == {"row": 0}
    ends = [r.latestOffset()["row"] for _ in range(5)]
    assert ends == [300, 600, 900, 1000, 1000]
    parts = r.partitions({"row": 300}, {"row": 600})
    spans = sorted((p.lo, p.hi) for p in parts if p.step == 1)
    assert spans[0][0] == 300 and spans[-1][1] == 600
    assert all(a[1] == b[0] for a, b in zip(spans, spans[1:]))


def _emitted(reader, parts):
    """Rows a set of planned partitions would deliver (worker-side)."""
    from hbase_sep_spark.sources.sep_events import _read_rows

    out = []
    for p in parts:
        out.extend(_read_rows(reader.path, p.lo, p.hi, p.step))
    return out


def test_source_restart_no_redelivery_of_acked():
    """ADVICE r2 (medium): a restarted query builds a FRESH reader, so
    its first latestOffset() can trail the restored committed offset;
    the engine (comparing offsets as opaque JSON) logs the trailing
    offset as a batch END and derives the NEXT batch's start from it.
    The delivered high-water mark must suppress re-emission of every
    row acked before the restart."""
    from hbase_sep_spark.sources.sep_events import SepEventsStreamReader

    path = f"{SF_UNIT}/events.parquet"
    opts = {"path": path, "batch_size": "400"}

    # Session 1: deliver the full 1000-row feed, all batches committed.
    r1 = SepEventsStreamReader(opts)
    prev = r1.initialOffset()
    seen = 0
    while True:
        end = r1.latestOffset()
        if end == prev:
            break
        seen += len(_emitted(r1, r1.partitions(prev, end)))
        r1.commit(end)
        prev = end
    assert seen == 1000 and prev == {"row": 1000}

    # Session 2 (restart, last batch committed at row=1000): fresh
    # reader, engine's first poll trails the checkpoint.
    r2 = SepEventsStreamReader(opts)
    trailing = r2.latestOffset()  # {"row": 400} — behind committed
    assert trailing["row"] < 1000
    # Engine plans (committed -> trailing): must emit nothing.
    assert _emitted(r2, r2.partitions({"row": 1000}, trailing)) == []
    # Engine's next batch starts at the trailing END: still nothing —
    # rows [400, 1000) were acked pre-restart.
    nxt = r2.latestOffset()
    redelivered = _emitted(r2, r2.partitions(trailing, nxt))
    assert redelivered == []
    # And the stream stays live past the checkpoint: append rows would
    # flow (here the feed is finite, so it simply parks at the end).
    assert r2.latestOffset() == {"row": 1000}


def test_source_restart_replays_uncommitted_batch():
    """The at-least-once path Spark itself drives: an UNCOMMITTED last
    batch is re-planned verbatim on restart and must re-emit exactly
    its own rows (the hwm guard must not swallow it)."""
    from hbase_sep_spark.sources.sep_events import SepEventsStreamReader, _read_rows

    path = f"{SF_UNIT}/events.parquet"
    r = SepEventsStreamReader({"path": path, "batch_size": "400"})
    replay = _emitted(r, r.partitions({"row": 400}, {"row": 800}))
    assert replay == list(_read_rows(path, 400, 800))
    # After the replay the reader resumes forward without a gap.
    end = r.latestOffset()
    assert end == {"row": 1000}
    tail = _emitted(r, r.partitions({"row": 800}, end))
    assert tail == list(_read_rows(path, 800, 1000))


def test_source_batches_bounded_at_bench_sf():
    """Offset math at the bench scale factor: every planned batch's
    partitions tile [start, end) with per-partition row counts bounded
    by rows_per_partition — the per-worker memory contract that makes
    the replay safe at 100 TB."""
    import os

    from hbase_sep_spark.sources.sep_events import SepEventsStreamReader

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    r = SepEventsStreamReader(
        {"path": f"{sf_dir}/events.parquet", "batch_size": "40000", "rows_per_partition": "5000"}
    )
    total = r._total()
    prev = r.initialOffset()
    covered = 0
    while True:
        end = r.latestOffset()
        if end == prev:
            break
        parts = r.partitions(prev, end)
        assert all(p.hi - p.lo <= 5000 for p in parts)
        spans = sorted((p.lo, p.hi) for p in parts)
        assert spans[0][0] == prev["row"] and spans[-1][1] == end["row"]
        assert all(a[1] == b[0] for a, b in zip(spans, spans[1:]))
        covered += sum(p.hi - p.lo for p in parts)
        r.commit(end)
        prev = end
    assert covered == total


def test_source_rate_limit_scales_with_feed():
    """Round-13 pacing contract: the DEFAULT rate limit is
    feed-proportional — max(2500, feed/4) — so the micro-batch count
    is scale-invariant instead of O(feed), while every graded SF
    (feeds <= 10k rows) keeps the historical fixed-2500 pacing
    bit-identically. _scaled_bs applies the same rule to queries that
    pin a specific graded-SF batch structure."""
    from hbase_sep_spark.sources.sep_events import SepEventsStreamReader, feed_total
    from hbase_sep_spark.streaming.queries import _scaled_bs

    path = f"{SF_UNIT}/events.parquet"
    total = feed_total(path)
    assert total == 1000

    # auto default at a graded-SF-sized feed = the historical 2500
    r = SepEventsStreamReader({"path": path})
    assert r.batch_size == 2500
    assert r.rows_per_partition == 1250
    # explicit values are honored verbatim
    r = SepEventsStreamReader({"path": path, "batch_size": "400"})
    assert r.batch_size == 400
    # _scaled_bs floors bind at graded SFs (unit feed: 1000 rows)
    assert _scaled_bs(SF_UNIT, 1000) == 1000
    assert _scaled_bs(SF_UNIT, 2000) == 2000
    assert _scaled_bs(SF_UNIT, 2500) == 2500


def test_source_read_yields_arrow_batches():
    """Round-13 transport contract: read() hands Spark arrow
    RecordBatches whose schema exactly matches EVENT_SCHEMA (int64
    ids, timestamp[us, UTC], float64 value, strings) — the worker
    forwards them wholesale instead of converting rows one by one.
    The batch content must equal the _read_rows tuple view."""
    import pyarrow as pa

    from hbase_sep_spark.sources.sep_events import (
        SepEventsStreamReader,
        SepRange,
        _read_rows,
    )

    path = f"{SF_UNIT}/events.parquet"
    r = SepEventsStreamReader({"path": path})
    batches = list(r.read(SepRange(lo=100, hi=250)))
    assert batches and all(isinstance(b, pa.RecordBatch) for b in batches)
    tbl = pa.Table.from_batches(batches)
    assert [f.name for f in tbl.schema] == [
        "event_id", "ts", "user_id", "event_type", "value", "props",
    ]
    assert tbl.schema.field("ts").type == pa.timestamp("us", "UTC")
    assert tbl.schema.field("event_id").type == pa.int64()
    assert tbl.schema.field("value").type == pa.float64()
    rows = [tuple(rec[n] for n in tbl.schema.names) for rec in tbl.to_pylist()]
    assert rows == list(_read_rows(path, 100, 250))
    # empty range yields no batches
    assert list(r.read(SepRange(lo=250, hi=250))) == []


def test_bootstrap_then_tail_no_gap_no_overlap(spark):
    """Late-subscriber bootstrap: batch snapshot [0, K) + stream tail
    [K, end) must tile the feed exactly — the seam loses nothing and
    duplicates nothing."""
    res = {r.phase: r for r in REGISTRY["stream_bootstrap_then_tail"].fn(spark, SF_UNIT).collect()}
    total = t(spark, SF_UNIT, "events").count()
    assert res["snapshot"].n_events + res["tail"].n_events == total
    # event_id is feed-ordered in the fixture, so the seam is clean in
    # id space too: snapshot covers the low half, tail the high half.
    assert res["snapshot"].max_event_id < res["tail"].min_event_id


def test_batch_sessionize_matches_stream_session_window(spark):
    """Gaps-and-islands batch sessionization and the streaming
    session_window operator implement the same 30-minute-gap
    semantics: same session count per user, same total."""
    batch = REGISTRY["win_sessionize_batch"].fn(spark, SF_UNIT)
    stream = REGISTRY["stream_session_window"].fn(spark, SF_UNIT)
    b = {(r.user_id, r.session_seq) for r in batch.collect()}
    s = stream.count()
    assert len(b) == s


def test_scd2_stream_converges_to_batch_history(spark):
    """Incremental SCD2 maintenance over an at-least-once feed
    (redeliveries injected) converges to EXACTLY the batch window
    query over the whole feed: same versions, same effectivity
    intervals, same current flags."""
    stream = REGISTRY["stream_scd2_maintain"].fn(spark, SF_UNIT)
    batch = REGISTRY["events_scd2_history"].fn(spark, SF_UNIT)
    cols = ["user_id", "event_id", "value", "valid_from", "valid_to", "is_current"]
    got = {tuple(r) for r in stream.select(*cols).collect()}
    want = {tuple(r) for r in batch.select(*cols).collect()}
    assert got == want


def test_anomaly_score_matches_batch_expanding_window(spark):
    """The stateful expanding scorer's final per-user (n, anomalies)
    equals a batch recomputation with an unbounded-preceding window —
    the causal-score replay invariant."""
    from pyspark.sql import Window

    stream = REGISTRY["stream_anomaly_score"].fn(spark, SF_UNIT)
    ev = t(spark, SF_UNIT, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    scored = ev.select(
        "user_id",
        "value",
        F.count("value").over(w).alias("n_b"),
        F.avg("value").over(w).alias("m"),
        F.stddev_samp("value").over(w).alias("s"),
    )
    anom = (
        (F.col("n_b") >= 10)
        & (F.col("s") > 1e-9)
        & (F.abs((F.col("value") - F.col("m")) / F.col("s")) > 3.0)
    )
    scored_gate = (F.col("n_b") >= 10) & (F.col("s") > 1e-9)
    batch = scored.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(scored_gate, 1).otherwise(0)).alias("n_scored"),
        F.sum(F.when(anom, 1).otherwise(0)).alias("n_anomalies"),
    )
    got = {(r.user_id, r.n_events, r.n_scored, r.n_anomalies) for r in stream.collect()}
    want = {(r.user_id, r.n_events, r.n_scored, r.n_anomalies) for r in batch.collect()}
    assert got == want


def test_windowed_distinct_hll_tracks_exact(spark):
    """The streaming HLL distinct per (day, type) lands within 3×
    the sketch's default rsd (5%) of the batch exact distinct, and
    event totals match exactly."""
    stream = REGISTRY["stream_windowed_distinct_hll"].fn(spark, SF_UNIT)
    ev = t(spark, SF_UNIT, "events")
    exact = ev.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("win_day"),
        "event_type",
    ).agg(
        F.count_distinct("user_id").alias("exact_users"),
        F.count(F.lit(1)).alias("n_events"),
    )
    got = {(r.win_day, r.event_type): (r.approx_users, r.n_events) for r in stream.collect()}
    want = {(r.win_day, r.event_type): (r.exact_users, r.n_events) for r in exact.collect()}
    assert set(got) == set(want)
    for k, (approx, n) in got.items():
        exact_u, exact_n = want[k]
        assert n == exact_n, k
        assert abs(approx - exact_u) <= max(2, 0.15 * exact_u), (k, approx, exact_u)


def test_stateful_latest_converges_under_redelivery(spark):
    """The SEP at-least-once invariant (SURVEY §5.4, VERDICT r5 item
    7): the SAME stateful latest-per-key pipeline, driven over a feed
    that re-delivers every 3rd event of the previous batch, converges
    to exactly the batch events_latest_per_key result — duplicate
    delivery cannot move max-(ts, event_id) state. n_seen is NOT
    compared (it counts deliveries, which redelivery inflates by
    design); the materialized (event_id, value) state must match."""
    from hbase_sep_spark.streaming.queries import (
        _events_stream,
        stateful_latest_over,
    )

    stream = stateful_latest_over(
        spark,
        _events_stream(spark, SF_UNIT, batch_size=300, redeliver_every=3),
    )
    batch = REGISTRY["events_latest_per_key"].fn(spark, SF_UNIT)
    got = {r["user_id"]: (r["last_event_id"], r["last_value"]) for r in stream.collect()}
    want = {r["user_id"]: (r["event_id"], r["value"]) for r in batch.collect()}
    assert got == want


def test_sink_exactly_once_audit_all_flags_true(spark):
    """The round-12 sink idempotency audit: every micro-batch applied
    twice with the same epoch_id must leave identical sink content
    (replay_identical), and the union of epochs must sum to the clean
    feed (totals_match) — the EventListener at-least-once contract."""
    rows = REGISTRY["stream_sink_exactly_once_audit"].fn(spark, SF_UNIT).collect()
    assert rows, "audit produced no epochs"
    assert all(r["replay_identical"] for r in rows), rows
    assert all(r["totals_match"] for r in rows), rows


def test_multi_subscription_fanout_independent_offsets(spark):
    """Two concurrent subscriptions on one feed, independent durable
    checkpoints: each replays the complete feed (matches_feed), both
    see identical content (matches_peer), and their offset logs
    differ structurally (different batch counts — the witness that
    the checkpoints never cross-contaminate)."""
    rows = REGISTRY["stream_multi_subscription_fanout"].fn(spark, SF_UNIT).collect()
    assert len(rows) == 2
    by_name = {r["subscription"]: r for r in rows}
    assert all(r["matches_peer"] for r in rows), rows
    assert all(r["matches_feed"] for r in rows), rows
    assert by_name["sub_a"]["n_batches"] != by_name["sub_b"]["n_batches"], rows
    assert by_name["sub_a"]["n_rows"] == by_name["sub_b"]["n_rows"]
