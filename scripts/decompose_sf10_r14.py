#!/usr/bin/env python
"""Round-14 cost decomposition for the sf10 headline absolutes
(VERDICT-r13 items 3/5): split each query's bench time into

  compute — the FULL plan to the noop sink (guide §1.4: every column
            of every row computed, nothing shipped);
  total   — the full plan via `.toArrow()` (the bench protocol);
            total - compute ≈ the Arrow materialization of the
            result set on the driver.

Solo process, suite warmed twice, median of N (default 3). Run on an
IDLE machine:

    python scripts/decompose_sf10_r14.py SF_DIR [OUT_JSON] names...
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(run, runs: int = 3) -> float:
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        run()
        samples.append(time.perf_counter() - t0)
    return round(statistics.median(samples), 4)


def main() -> None:
    sf_dir = sys.argv[1]
    out_json = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2] in ("-",) else None
    names = sys.argv[3:] if out_json else sys.argv[2:]

    from hbase_sep_spark.registry import load_all
    from hbase_sep_spark.session import get_spark

    reg = load_all()
    spark = get_spark("decompose-r14")

    def noop(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    # Warm both actions for every query first (codegen, workers, JIT).
    for _ in range(2):
        for name in names:
            df = reg[name].fn(spark, sf_dir)
            noop(df)
            df.toArrow()

    out: dict[str, dict[str, float]] = {}
    for name in names:
        fn = reg[name].fn
        spark.sparkContext.setJobDescription(f"decompose r14: {name} noop")
        compute = timed(lambda: noop(fn(spark, sf_dir)))
        spark.sparkContext.setJobDescription(f"decompose r14: {name} toArrow")
        total = timed(lambda: fn(spark, sf_dir).toArrow())
        out[name] = {
            "compute_noop": compute,
            "total_toarrow": total,
            "arrow_ship": round(total - compute, 4),
        }
        print(f"{name:28s} compute={compute:.3f}s total={total:.3f}s ship={total-compute:.3f}s")

    result = {"sf_dir": sf_dir, "loadavg_1m": round(os.getloadavg()[0], 2), "queries": out}
    if out_json:
        with open(out_json, "w") as f:
            json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
