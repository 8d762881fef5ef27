#!/usr/bin/env python
"""Round-13 A/B harness for a session-config experiment: time a set
of queries solo (bench protocol — suite warmed twice, median of N
timed runs, full toArrow materialization) under the session defaults
PLUS any --conf overrides, in THIS fresh process. Drive it twice from
the shell (baseline vs candidate) so configs never bleed between legs.

Also prints a content fingerprint per query (order-insensitive sum of
xxhash64 over all columns, decimal(38,0) — the streaming fingerprint
idiom) so the two legs can be checked value-identical.

Usage:
  python scripts/ab_conf_r13.py --sf DIR [--runs 3] [--conf k=v ...] names...
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", required=True)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--conf", action="append", default=[])
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from hbase_sep_spark.registry import load_all
    from hbase_sep_spark.session import get_spark

    registry = load_all()
    spark = get_spark("ab-conf-r13")
    for kv in args.conf:
        k, v = kv.split("=", 1)
        spark.conf.set(k, v)

    for _ in range(2):  # warm
        for name in args.names:
            registry[name].fn(spark, args.sf).toArrow()

    times: dict[str, float] = {}
    prints: dict[str, str] = {}
    for name in args.names:
        fn = registry[name].fn
        spark.sparkContext.setJobDescription(f"ab-conf: {name}")
        samples = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            fn(spark, args.sf).toArrow()
            samples.append(time.perf_counter() - t0)
        times[name] = round(statistics.median(samples), 3)
        df = fn(spark, args.sf)
        fp = df.select(
            F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)")).alias("fp"),
            F.count(F.lit(1)).alias("n"),
        ).first()
        prints[name] = f"{fp['fp']}/{fp['n']}"
    print(json.dumps({"sf": args.sf, "conf": args.conf, "queries": times, "fingerprints": prints}))


if __name__ == "__main__":
    main()
