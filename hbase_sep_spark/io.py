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


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one driver table. At cluster scale these would be
    partitioned/bucketed catalog tables; the reader API is identical.

    `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects; we read it as nanos-since-epoch long and rebuild a
    TimestampType column (lossless here — the generator emits
    microsecond precision; verified sub-us component is always 0).
    """
    path = f"{sf_dir}/{name}.parquet"
    key = (spark.sparkContext.applicationId, path)
    cached = _SCAN_CACHE.get(key)
    if cached is not None:
        return cached
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        raw = spark.read.parquet(path)
        df = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        df = spark.read.parquet(path)
    _SCAN_CACHE[key] = df
    return df
