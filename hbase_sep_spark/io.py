"""Table loading helpers.

All graded queries read the driver-generated parquet tables
(TESTDATA.md). `t()` is the single scan entry point so predicate
pushdown / column pruning behavior is uniform: callers apply
`.select`/`.filter` immediately after and Catalyst pushes both into
the parquet scan (verify with `.explain('formatted')` → PushedFilters,
ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# (applicationId, path) → DataFrame. The inputs are immutable
# read-only files, so reusing the analyzed scan (and its
# InMemoryFileIndex / parquet footer metadata) across queries in the
# same session is safe and removes repeated driver-side listing —
# the same effect a catalog table's cached metadata gives at cluster
# scale. Plans only, no data is cached.
_SCAN_CACHE: dict[tuple[str, str], DataFrame] = {}


def scratch_dir(spark: SparkSession, *parts: str) -> str:
    """Session-scoped scratch path for sink/roundtrip artifacts:
    <tmp>/hbase_sep_spark/<applicationId>/<parts...>.

    Scoping by applicationId keeps concurrent harness/driver runs (or
    other users on a shared machine) from clobbering each other's
    files between an eager write and a lazy read-back — the same
    reason the streaming checkpoints already use mkdtemp."""
    import os
    import tempfile

    path = os.path.join(
        tempfile.gettempdir(), "hbase_sep_spark", spark.sparkContext.applicationId, *parts
    )
    os.makedirs(path, exist_ok=True)
    return path


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one driver table. At cluster scale these would be
    partitioned/bucketed catalog tables; the reader API is identical.

    `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects; we read it as nanos-since-epoch long and rebuild a
    TimestampType column (lossless here — the generator emits
    microsecond precision; verified sub-us component is always 0).

    NOTE: this flips `spark.sql.legacy.parquet.nanosAsLong` for the
    WHOLE session and deliberately does not restore it — the conf is
    consulted at scan execution time, so restoring it after planning
    would break re-execution of this very DataFrame. Consequence: any
    OTHER nanos-timestamp parquet read in the same session also comes
    back as longs (none of the driver tables besides events carries
    nanos; documented in CLAUDE.md sharp edges).
    """
    path = f"{sf_dir}/{name}.parquet"
    key = (spark.sparkContext.applicationId, path)
    cached = _SCAN_CACHE.get(key)
    if cached is not None:
        return cached
    if name == "events":
        from pyspark.sql import functions as F

        raw = events_raw(spark, sf_dir)
        df = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        df = spark.read.parquet(path)
    _SCAN_CACHE[key] = df
    return df


def events_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events scan with `ts` left as raw int64 nanos-since-epoch.

    This is the pushdown-friendly form: `t()`'s TimestampType `ts` is
    a PROJECTION over this column (`timestamp_micros(ts div 1000)`),
    and Catalyst does not rewrite predicates through it — a filter on
    the converted column never reaches the parquet scan. Time-range
    scans that must prune at the source (e.g. a CDC bootstrap
    snapshot below a seam offset) filter HERE on int64 ns, then
    convert."""
    path = f"{sf_dir}/events.parquet"
    key = (spark.sparkContext.applicationId, path + "#raw")
    cached = _SCAN_CACHE.get(key)
    if cached is not None:
        return cached
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    _SCAN_CACHE[key] = df
    return df
