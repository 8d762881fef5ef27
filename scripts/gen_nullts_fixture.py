"""Build the NULL-event-time hostile fixture (round-8 null-ts sweep).

The fixture's time columns are never NULL. A real merged 100 TB feed's
are: late-joined enrichments, tombstones, and schema-evolved epochs
all ship records with no event time — and the engines disagree about
them wherever time orders anything (Spark default-sorts ASC NULLS
FIRST, DuckDB NULLS LAST; DuckDB's min_by/arg_min skip NULL keys where
the ordering key expression can go NULL; Spark's Python streaming
DataSource crashed outright converting NaT). The round-8 sweep over
this fixture failed 52 of 279 registered queries (36 batch mismatches,
15 streaming crashes, 1 boundary-read crash).

Policy adopted everywhere: time-ordered operators DROP null-time rows
on BOTH sides — the dead-letter route; a record without an event time
has no position in any time order, no window, no as-of match, and no
replay offset (the SEP source dead-letters them at the transport
edge, mirroring the watermark's own isnotnull filter). The drop is a
no-op on clean feeds, so every prior green holds.

    python scripts/gen_nullts_fixture.py /root/testdata/sf0.01 /tmp/nullts_sf
    python -m tests.harness --sf /tmp/nullts_sf

The mutation function is imported by tests/test_nullts_fixture.py so
the sweep fixture and the pin test can never drift apart.
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

COPY_TABLES = "region nation customer supplier part documents embeddings".split()


def null_out(src_path: str, key_col: str, cols: set, residue: int, mod: int):
    """NULL the given columns on rows where key % mod == residue
    (~2.5% of rows — enough to land NULLs in every window partition
    at sf0.01, sparse enough that every group keeps timed rows)."""
    t = pq.read_table(src_path)
    keys = t.column(key_col).to_pylist()
    mask = [k is not None and k % mod == residue for k in keys]
    arrays = {}
    for n in t.schema.names:
        if n in cols:
            vals = t.column(n).to_pylist()
            arrays[n] = pa.array(
                [None if m else v for v, m in zip(vals, mask)],
                t.schema.field(n).type,
            )
        else:
            arrays[n] = t.column(n)
    return pa.table(arrays)


def build(src_dir: str, dst_dir: str) -> None:
    for name in COPY_TABLES:
        shutil.copy(f"{src_dir}/{name}.parquet", f"{dst_dir}/{name}.parquet")
    pq.write_table(
        null_out(f"{src_dir}/events.parquet", "event_id", {"ts"}, 5, 37),
        f"{dst_dir}/events.parquet",
    )
    pq.write_table(
        null_out(f"{src_dir}/orders.parquet", "o_orderkey", {"o_orderdate"}, 7, 41),
        f"{dst_dir}/orders.parquet",
    )
    pq.write_table(
        null_out(
            f"{src_dir}/lineitem.parquet",
            "l_orderkey",
            {"l_shipdate", "l_commitdate", "l_receiptdate"},
            11,
            43,
        ),
        f"{dst_dir}/lineitem.parquet",
    )


if __name__ == "__main__":
    src, dst = sys.argv[1], sys.argv[2]
    os.makedirs(dst, exist_ok=True)
    build(src, dst)
    print(f"wrote null-ts fixture to {dst}")
