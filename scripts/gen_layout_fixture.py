#!/usr/bin/env python
"""Physical-layout mutation of a testdata dir: every table becomes a
DIRECTORY of 3 parquet part files, and non-feed tables additionally
get their rows deterministically PERMUTED across and within parts.

Why this is a real class: a regenerated fixture (or any production
dataset) can ship multi-file tables with arbitrary row order. Engine
results must be invariant to physical layout — a query whose answer
depends on scan order (bare first()/limit without a total order,
positional assumptions) passes forever on a single sorted file and
silently diverges the day the layout changes. Spark reads a directory
natively; the DuckDB oracle needs a glob (tests/harness.duck_connection
dispatches on isdir).

The events FEED is the exception to permutation: the SEP transport
contract is a (ts, event_id)-ordered feed (tests/test_streaming.py
asserts it on disk), so events is split into 3 CONTIGUOUS segments in
feed order — the WAL/Kafka-segment shape a real 100 TB feed has —
named so sorted-filename order IS feed order. That exercises the
segment-dir path in sources/sep_events.py (_feed_segments) while
keeping every replay-offset semantic intact.

Usage: python scripts/gen_layout_fixture.py [SRC] [DST]
Defaults: SRC=/root/testdata/sf0.01, DST=/tmp/sparkgraft_layout
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow.parquet as pq

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

N_PARTS = 3


def mutate(src: str, dst: str) -> None:
    """Write the layout-mutated copy of `src` into `dst` (created;
    must not exist). Importable by tests/test_layout_fixture.py."""
    if os.path.exists(dst):
        shutil.rmtree(dst)
    os.makedirs(dst)
    for name in TABLES:
        path = f"{src}/{name}.parquet"
        if not os.path.exists(path):
            continue
        tbl = pq.read_table(path)
        n = tbl.num_rows
        if name != "events" and n > 1:
            # Deterministic permutation (seeded per table) — scan
            # order must not matter for any batch query.
            import zlib

            rng = np.random.default_rng(zlib.crc32(name.encode()))
            tbl = tbl.take(rng.permutation(n))
        out_dir = f"{dst}/{name}.parquet"
        os.makedirs(out_dir)
        # Uneven split so no code can rely on equal part sizes.
        cuts = [0, n // 5, n // 2, n]
        for i in range(N_PARTS):
            lo, hi = cuts[i], cuts[i + 1]
            part = tbl.slice(lo, hi - lo)
            # Small row groups in the feed so the range reader's
            # row-group slicing is exercised across group boundaries.
            rg = max(1, (hi - lo) // 4) if name == "events" else None
            pq.write_table(
                part,
                f"{out_dir}/part-{i:03d}.parquet",
                **({"row_group_size": rg} if rg else {}),
            )
        print(f"{name}: {n} rows -> {N_PARTS} files")


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sparkgraft_layout"
    mutate(src, dst)


if __name__ == "__main__":
    main()
