"""Round-6 lead-in, twelfth block: Benford first-digit audit.

`agg_benford_price_audit` — the fraud/synthetic-data screen:
compare the first-significant-digit distribution of order totals
against Benford's law log₁₀(1+1/d). Natural multiplicative data
follows it; fabricated or uniformly-generated values don't — which
makes it equally useful as a fixture-realism probe.

Portability: the first digit derives from the CENTS INTEGER's
decimal string (price × 100 is exact at 2 decimals), never from
floor(log10(x)) — which can put an exact power of ten on different
sides of the floor on different libm implementations. Expected
shares are log10 constants evaluated identically; shares round at
4 dp.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hbase_sep_spark.io import t
from hbase_sep_spark.registry import register


@register(
    "agg_benford_price_audit",
    oracle="""
    WITH digits AS (
        SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT)
                                AS VARCHAR), 1, 1) AS INT) AS d
        FROM orders
        WHERE o_totalprice > 0
    ),
    cnt AS (
        SELECT d, CAST(count(*) AS BIGINT) AS observed
        FROM digits GROUP BY d
    )
    SELECT d AS first_digit, observed,
           round(CAST(observed AS DOUBLE)
                 / CAST(sum(observed) OVER () AS BIGINT), 4) + 0.0
               AS obs_share,
           round(log10(1 + 1.0 / d), 4) + 0.0 AS benford_share
    FROM cnt
    """,
    section="2.4",
)
def agg_benford_price_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of order totals: observed vs
    theoretical log₁₀(1+1/d) share per leading digit — the
    synthetic-data / fraud screen. The digit comes from the exact
    cents integer's decimal string (round(price·100) is exact for
    2-decimal money), sidestepping floor(log10) ulp hazards; the
    only floats are the two rounded shares.

    Scale shape: one scan, a 9-group aggregate (map-side combined),
    and the total from an unbounded window over the 9-row frame."""
    digits = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 0)
        .select(
            F.substring(
                F.round(F.col("o_totalprice") * 100, 0)
                .cast("bigint")
                .cast("string"),
                1,
                1,
            )
            .cast("int")
            .alias("d")
        )
    )
    cnt = digits.groupBy("d").agg(F.count(F.lit(1)).cast("bigint").alias("observed"))
    wall = Window.partitionBy()
    return cnt.select(
        F.col("d").alias("first_digit"),
        "observed",
        (
            F.round(
                F.col("observed").cast("double")
                / F.sum("observed").over(wall).cast("bigint"),
                4,
            )
            + F.lit(0.0)
        ).alias("obs_share"),
        (F.round(F.log10(1 + 1.0 / F.col("d")), 4) + F.lit(0.0)).alias(
            "benford_share"
        ),
    )
