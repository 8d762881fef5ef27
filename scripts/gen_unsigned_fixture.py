"""Build the unsigned-integer hostile fixture (round-10 sweep).

The fixture's ids are signed int64 (pandas/pyarrow default), but a
C++/Rust writer — the reference transport's native ecosystem — or a
space-optimizing regeneration legitimately ships parquet UNSIGNED
logical types. Unsignedness exposes two divergence families, one per
engine:

  - Spark maps parquet UINT64 to DecimalType(20,0) (the only exact
    container): printf('%0Nd', id) composite pick keys CRASH in
    codegen (IllegalFormatConversionException: d != Decimal), and
    every id output column renders Decimal('101') where the oracle
    renders 101 — 31 hash-risk warns across the registry. UINT8/16/32
    widen to signed int/bigint natively and are invisible.
  - DuckDB keeps UINT32 NARROW through arithmetic: the knuth-hash
    SQL mirror's `(id % 2147483648) * 2654435761` stays UINT32×UINT32
    and OVERFLOWS (Out of Range), and printf('%d', UBIGINT) errors
    outright ("Invalid type specifier for a value of type string").

Fixes (round 10): io._normalize_unsigned casts any decimal(20,0)
scan column to BIGINT (generic, metadata-only, exact below 2^63,
ANSI-loud above); the knuth-hash oracle mirror and the %020d-%010d
printf pick keys gained CAST(id AS BIGINT) — no-ops on signed data,
hash-verified. Sweep result: 120-query events probe found 7, the
full-registry unsigned-everything sweep (every non-negative int64
column re-typed UINTEGER, event_id UBIGINT) found the 2 printf
oracle sites, then 279/279.

    python scripts/gen_unsigned_fixture.py /root/testdata/sf0.01 /tmp/uintall
    python -m tests.harness --sf /tmp/uintall

The mutation is imported by tests/test_unsigned_fixture.py so the
sweep fixture and the pin test can never drift apart.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pyarrow.parquet as pq

ALL_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def build(src_dir: str, dst_dir: str) -> None:
    os.makedirs(dst_dir, exist_ok=True)
    con = duckdb.connect()
    for t in ALL_TABLES:
        s = pq.read_schema(f"{src_dir}/{t}.parquet")
        int_cols = [n for n in s.names if str(s.field(n).type) == "int64"]
        repl = []
        for c in int_cols:
            mx, mn = con.sql(
                f"SELECT max({c}), min({c}) FROM '{src_dir}/{t}.parquet'"
            ).fetchone()
            if mn is not None and mn < 0:
                continue  # unsigned can't represent it — leave signed
            # event_id goes UBIGINT to hit Spark's decimal(20,0) path;
            # everything else takes the narrowest unsigned container,
            # which is where DuckDB's arithmetic stays narrow.
            ty = "UBIGINT" if c == "event_id" or (mx or 0) >= 2**31 else "UINTEGER"
            repl.append(f"CAST({c} AS {ty}) AS {c}")
        sel = (
            f"SELECT * REPLACE ({', '.join(repl)}) FROM '{src_dir}/{t}.parquet'"
            if repl
            else f"SELECT * FROM '{src_dir}/{t}.parquet'"
        )
        con.execute(f"COPY ({sel}) TO '{dst_dir}/{t}.parquet' (FORMAT PARQUET)")
    con.close()


if __name__ == "__main__":
    src, dst = sys.argv[1], sys.argv[2]
    build(src, dst)
    print(f"wrote unsigned fixture to {dst}")
