#!/usr/bin/env python
"""Round-13 streaming-transport measurement: solo wall-clock of
streaming replays at a given fixture (default the /tmp sf1 10x
fixture, where the old per-row-tuple transport and O(feed)
micro-batch count dominated). Run once on round-12 code (the
9cc4f31 worktree) and once on HEAD to produce the before/after pair
for OPTIMIZATION_r13.md — the streaming queries' SQL plans are
unchanged (the rewrite lives in the Python DataSource's read() and
rate-limit defaults), so wall-clock + batch structure IS the
evidence, not an explain diff.

Usage: python scripts/measure_streaming_transport_r13.py [--sf DIR] [names...]
Prints one JSON line: {"sf_dir": ..., "queries": {name: sec}, "rows": {name: n}}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = ["stream_sep_source", "stream_tumbling_count", "stream_dedup_watermark"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/tmp/sparkgraft_sf1")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    names = args.names or DEFAULT

    from hbase_sep_spark.registry import load_all
    from hbase_sep_spark.session import get_spark

    registry = load_all()
    spark = get_spark("stream-transport-r13")
    out_t: dict[str, float] = {}
    out_r: dict[str, int] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"transport-r13: {name}")
        t0 = time.perf_counter()
        df = registry[name].fn(spark, args.sf)
        rows = df.count()
        out_t[name] = round(time.perf_counter() - t0, 2)
        out_r[name] = rows
    print(json.dumps({"sf_dir": args.sf, "queries": out_t, "rows": out_r}))


if __name__ == "__main__":
    main()
