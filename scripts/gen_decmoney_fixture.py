"""Build the decimal-money hostile fixture (round-10 sweep).

The fixture ships money as DOUBLE, but TPC-H's CANONICAL encoding is
DECIMAL(12,2) — the single most likely physical-type regeneration.
Reading it raw broke 29 of the 100 money-table queries:

  - Spark surfaces DecimalType columns, so every money output
    renders Decimal('104700.97') where the oracle's pandas frame
    holds 104700.97 (hash mismatch), and decimal→object dtype
    crashes the pandas-UDF operators;
  - pyarrow cannot DECODE row-group statistics for DECIMAL
    (ArrowNotImplementedError in the footer audit);
  - DuckDB computes per-row and quantile arithmetic in EXACT decimal
    where Spark uses doubles — l_extendedprice*(1-l_discount) is
    '20548.9465' exactly vs 20548.946500000002.

Fixes (round 10): io._normalize_unsigned casts scan-edge decimals to
DOUBLE (decimal(20,0) → BIGINT stays the unsigned-id path) — this
reproduces the double-fixture semantics bit-for-bit, since a 2-dp
decimal converts to the same nearest-double the generator wrote and
the dsum/davg DECIMAL(18,6) casts recover identical exact values on
both engines; six oracles gained CAST(x AS DOUBLE) so DuckDB's
arithmetic runs in doubles like Spark's (math_basic, project_alias,
limit_topn, agg_median_percentile, agg_median_abs_deviation,
agg_trimmed_mean — no-ops on the double fixture); the footer audit
degrades undecodable statistics to the stats-less branch. Full
registry 279/279 after.

    python scripts/gen_decmoney_fixture.py /root/testdata/sf0.01 /tmp/decmoney
    python -m tests.harness --sf /tmp/decmoney

The mutation is imported by tests/test_decmoney_fixture.py so the
sweep fixture and the pin test can never drift apart.
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

# Money columns per table — the columns TPC-H defines as DECIMAL(12,2).
MONEY = {
    "customer": ["c_acctbal"],
    "supplier": ["s_acctbal"],
    "part": ["p_retailprice"],
    "orders": ["o_totalprice"],
    "lineitem": ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
}
COPY_TABLES = "region nation events documents embeddings".split()


def build(src_dir: str, dst_dir: str) -> None:
    os.makedirs(dst_dir, exist_ok=True)
    for t in COPY_TABLES:
        shutil.copy(f"{src_dir}/{t}.parquet", f"{dst_dir}/{t}.parquet")
    con = duckdb.connect()
    for t, cols in MONEY.items():
        repl = ", ".join(f"CAST({c} AS DECIMAL(12,2)) AS {c}" for c in cols)
        con.execute(
            f"COPY (SELECT * REPLACE ({repl}) FROM '{src_dir}/{t}.parquet') "
            f"TO '{dst_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()


if __name__ == "__main__":
    src, dst = sys.argv[1], sys.argv[2]
    build(src, dst)
    print(f"wrote decimal-money fixture to {dst}")
