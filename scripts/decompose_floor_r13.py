#!/usr/bin/env python
"""Cost decomposition of the three remaining sf0.1 >2×/flip-flop
bench members (VERDICT-r12 items 3-4): `simsearch_cosine_topk`,
`win_running_sum`, `filter_range_between`. Splits each into

  floor   — an end-to-end 1-row job + Arrow collect (`spark.range`),
            the irreducible per-query session cost the bench pays;
  scan    — the query's parquet scan alone, materialized to the noop
            sink (no result shipping);
  compute — the FULL plan to the noop sink (scan + operators, still
            no result shipping);
  total   — the full plan via `.toArrow()` (the bench protocol);
            total - compute = the Arrow materialization of the
            result set, which for the two full-row-output queries is
            the documented "materialization floor".

Solo, warmed, median of 5 — the gapfill/win_running_sum methodology
(BASELINE.md). Run on an IDLE machine:

    python scripts/decompose_floor_r13.py [SF_DIR] [OUT_JSON]

When OUT_JSON is given, the medians are also written as one JSON
object (the committed-capture form BASELINE.md cites).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hbase_sep_spark.io import t
from hbase_sep_spark.session import get_spark


def timed(label: str, run, runs: int = 5) -> float:
    run()  # warm
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        run()
        samples.append(time.perf_counter() - t0)
    med = statistics.median(samples)
    print(f"  {label:34s} {med:.4f}s  (min {min(samples):.4f} max {max(samples):.4f})")
    return med


def noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark()

    from hbase_sep_spark.registry import load_all

    reg = load_all()

    print(f"sf_dir={sf_dir}")
    floor = timed("floor: range(1) toArrow", lambda: spark.range(1).toArrow())

    cases = {
        # query name -> (scan builder, full-plan builder)
        "simsearch_cosine_topk": (
            lambda: t(spark, sf_dir, "embeddings"),
            lambda: reg["simsearch_cosine_topk"].fn(spark, sf_dir),
        ),
        "win_running_sum": (
            lambda: t(spark, sf_dir, "orders").select(
                "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
            ),
            lambda: reg["win_running_sum"].fn(spark, sf_dir),
        ),
        "filter_range_between": (
            lambda: t(spark, sf_dir, "lineitem").select(
                "l_orderkey", "l_linenumber", "l_shipdate", "l_quantity"
            ),
            lambda: reg["filter_range_between"].fn(spark, sf_dir),
        ),
    }

    results = {"sf_dir": sf_dir, "floor_range1_toarrow_sec": round(floor, 4)}
    for name, (scan, full) in cases.items():
        n = full().count()
        print(f"{name} ({n} output rows):")
        s = timed("scan -> noop", lambda: noop(scan()))
        c = timed("full plan -> noop", lambda: noop(full()))
        tot = timed("full plan -> toArrow (bench)", lambda: full().toArrow())
        print(
            f"  breakdown: floor {floor:.4f}s | scan +{s - floor:.4f}s | "
            f"operators +{c - s:.4f}s | arrow materialization +{tot - c:.4f}s "
            f"= {tot:.4f}s total"
        )
        results[name] = {
            "output_rows": n,
            "scan_noop_sec": round(s, 4),
            "full_noop_sec": round(c, 4),
            "full_toarrow_sec": round(tot, 4),
        }

    if out_json:
        with open(out_json, "w") as fh:
            json.dump(results, fh, indent=1)
            fh.write("\n")
        print(f"wrote {out_json}")

    spark.stop()


if __name__ == "__main__":
    main()
