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


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one driver table. At cluster scale these would be
    partitioned/bucketed catalog tables; the reader API is identical.

    `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects; we read it as nanos-since-epoch long and rebuild a
    TimestampType column (lossless here — the generator emits
    microsecond precision; verified sub-us component is always 0).
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        raw = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
