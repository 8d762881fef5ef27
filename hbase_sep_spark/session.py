"""SparkSession factory with scale-aware defaults.

Local testing runs on local[N]; the configs below are chosen so the
same logical plans survive a 1000-executor / 100 TB deployment:
AQE handles skew + partition coalescing at runtime, shuffle partition
count is a starting hint that AQE re-plans, and the session timezone
is pinned to UTC so date semantics are deterministic across engines.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "hbase-sep-spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", cpus))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE SMJ→SHJ rewrite threshold — measured round 13 and left
        # OFF (the Spark default, 0). Solo A/B at sf10 it cut the
        # fact⋈fact join 40%+ (BENCH_local_r13_shj_ab.json,
        # fingerprint-identical), but in the full bench session the
        # no-spill hash-relation build hit execution-memory exhaustion
        # ("Can't acquire 4194304 bytes to build hash relation") once
        # cache-holding queries (pagerank edges) shared the pool —
        # the §3.1 documented SHJ hazard, reproduced twice. A
        # deployment with per-task memory to spare can opt in via
        # $SPARK_GRAFT_SHJ_THRESHOLD; a sort-merge join spills and
        # never fails this way, which is worth more at 100 TB than
        # 40% on one join. (OPTIMIZATION_r13.md C6.)
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            os.environ.get("SPARK_GRAFT_SHJ_THRESHOLD", "0"),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Bigger Arrow batches amortize the Python-worker transfer:
        # the round-10 sweep on Spark 4.1.2 measured the pandas-UDF
        # specimen at 0.209 s (default 10k rows/batch) vs 0.160 s
        # (200k) at sf0.1 — and a 100k-row batch of a few numeric
        # columns is ~MBs, trivially inside executor memory at any
        # deployment size. Value semantics are batch-size-invariant.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "100000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
