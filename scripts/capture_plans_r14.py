#!/usr/bin/env python
"""Round-14 plan capture: write `plans/r14/<name>_{before,after}.txt`
for the queries this round touches.

"before" files are copied from the round-13 full-registry explains
(`plans/r13/explains/<name>.txt`) when present — no code changed
between that capture and the round-14 start commit (16819bd), so they
ARE the before-plans; pass --fresh to re-explain from current code
instead (used for the "after" side).

Usage:
  python scripts/capture_plans_r14.py --suffix after [--sf DIR] names...
  python scripts/capture_plans_r14.py --suffix before --from-r13 names...
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14")
R13 = os.path.join(os.path.dirname(OUT), "r13", "explains")


def explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--from-r13", action="store_true")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()
    os.makedirs(OUT, exist_ok=True)

    if args.from_r13:
        for name in args.names:
            src = os.path.join(R13, f"{name}.txt")
            dst = os.path.join(OUT, f"{name}_{args.suffix}.txt")
            shutil.copy(src, dst)
            print(f"copied r13 explain -> {dst}")
        return

    from hbase_sep_spark.registry import load_all
    from hbase_sep_spark.session import get_spark

    registry = load_all()
    spark = get_spark("plan-capture-r14")
    spark.sparkContext.setJobDescription("r14 plan capture")
    for name in args.names:
        q = registry[name]
        df = (q.raw or q.fn)(spark, args.sf)
        path = os.path.join(OUT, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(explain_str(df))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
