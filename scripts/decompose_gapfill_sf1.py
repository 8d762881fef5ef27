#!/usr/bin/env python
"""Cost decomposition of ts_daily_gapfill_ffill at sf1 (VERDICT-r10
item 4): isolate the daily aggregate, the span+calendar-spine left
join, the forward-fill window, and result materialization, solo and
warmed, median of 5 — the win_running_sum methodology (BASELINE.md).

Run on an IDLE machine:  python scripts/decompose_gapfill_sf1.py [SF_DIR]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from hbase_sep_spark.io import t
from hbase_sep_spark.session import get_spark


def timed(label: str, build, runs: int = 5) -> float:
    build().toArrow()  # warm
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        build().toArrow()
        samples.append(time.perf_counter() - t0)
    med = statistics.median(samples)
    print(f"{label:40s} {med:.3f}s  (min {min(samples):.3f} max {max(samples):.3f})")
    return med


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sparkgraft_sf1"
    spark = get_spark()
    ev = t(spark, sf_dir, "events")

    def daily():
        return ev.groupBy(
            "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
        ).agg(F.sum("value").alias("v"), F.count(F.lit(1)).alias("n"))

    def spine_join():
        d = daily()
        span = d.groupBy("user_id").agg(
            F.min("day").alias("d0"), F.max("day").alias("d1")
        )
        cal = span.select(
            "user_id",
            F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day"),
        )
        return cal.join(d, ["user_id", "day"], "left")

    def full():
        j = spine_join()
        w = (
            Window.partitionBy("user_id")
            .orderBy("day")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return j.select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n_events"),
            (F.round(F.last("v", ignorenulls=True).over(w), 2) + F.lit(0.0)).alias(
                "value_filled"
            ),
            F.when(F.col("v").isNull(), 1).otherwise(0).cast("int").alias("is_gap"),
        )

    n_daily = daily().count()
    n_full = full().count()
    print(f"rows: daily={n_daily}  output={n_full}  sf_dir={sf_dir}")
    a = timed("daily aggregate alone", daily)
    b = timed("+ span + calendar spine left join", spine_join)
    c = timed("full (+ ffill window + format)", full)
    print(
        f"marginal: spine join +{b - a:.3f}s, window/format +{c - b:.3f}s "
        f"(of {c:.3f}s total)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
