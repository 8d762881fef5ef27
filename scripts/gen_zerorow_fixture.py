"""Build zero-row-table hostile fixtures (round-10 extension sweep).

The round-10 empty-feed probe covered a 0-row events.parquet through
the 16 streaming queries + the scan audits only.  But ANY table can
legitimately arrive empty — a new tenant's feed, a total tombstone
compaction, a filter job that dropped every row, or a regeneration
bug — and the BATCH surface over empty documents/embeddings/lineitem
has never run on empty input.  Empty input exercises paths hidden at
every tested SF:

  - global aggregates over zero rows (one all-NULL row on both
    engines — but every downstream expression must survive the NULLs),
  - divide-by-count guards where count = 0 (the ANSI class),
  - pandas-UDF operators whose driver-side state is built from
    collected partials (k-means centroid seeding, PCA moments,
    quantile histograms) — a zero-partial collect can crash,
  - joins where one side is empty (inner → 0 rows; left outer with
    an empty RIGHT side → the NULL-fill path for every probe row).

Two fixture shapes:

  - ALL variant: every table zero-row (crash class — every query runs
    on fully empty input).
  - per-table variant: ONE table zero-row, the rest real (the
    join-mix class — real facts against an empty dim exercises
    NULL-fill downstream; an empty fact against real dims exercises
    empty-left-side plans).

Empty files preserve the source schema exactly (footer-only read →
schema.empty_table()), so physical-type dispatch (io.t()'s ts
handling) behaves as on the real fixture.

    python scripts/gen_zerorow_fixture.py /root/testdata/sf0.01 /tmp/zr ALL
    python -m tests.harness --sf /tmp/zr/ALL
    python scripts/gen_zerorow_fixture.py /root/testdata/sf0.01 /tmp/zr documents
    python -m tests.harness --sf /tmp/zr/documents <names touching documents>

The mutation function is imported by tests/test_zerorow_fixture.py so
the sweep fixture and the pin test can never drift apart.
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow.parquet as pq

ALL_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def write_empty_table(src_path: str, dst_path: str) -> None:
    """Zero-row parquet with the source file's exact schema.

    Footer-only: pq.read_schema never touches row groups, so this is
    cheap at any SF and cannot perturb the schema the way a
    read-filter-write roundtrip could (e.g. arrow large_string
    promotion).
    """
    schema = pq.read_schema(src_path)
    pq.write_table(schema.empty_table(), dst_path)


def build(src_dir: str, dst_dir: str, empty_tables: tuple[str, ...]) -> None:
    os.makedirs(dst_dir, exist_ok=True)
    for name in ALL_TABLES:
        src = f"{src_dir}/{name}.parquet"
        dst = f"{dst_dir}/{name}.parquet"
        if name in empty_tables:
            write_empty_table(src, dst)
        else:
            shutil.copy(src, dst)


if __name__ == "__main__":
    src, dst_root, which = sys.argv[1], sys.argv[2], sys.argv[3]
    empties = tuple(ALL_TABLES) if which == "ALL" else (which,)
    for t in empties:
        if t not in ALL_TABLES:
            sys.exit(f"unknown table {t}")
    dst = os.path.join(dst_root, which)
    build(src, dst, empties)
    print(f"wrote zero-row fixture ({which}) to {dst}")
