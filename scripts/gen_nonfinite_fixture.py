"""Build the non-finite-values hostile fixture (round-7 sweep).

The fixture's events feed carries only finite money-like doubles in
`value`. A real 100 TB metric/sensor feed does not: upstream division
by zero, overflow, and sentinel encodings ship NaN, +Inf, -Inf, and
negative zero. This script copies one SF dir and injects those into
~4% of events.value (deterministic by event_id residue, the
hostile-embeddings pattern) so the full registry can be swept through
the spark-vs-DuckDB compare:

    python scripts/gen_nonfinite_fixture.py /root/testdata/sf0.01 /tmp/nonfinite_sf
    python -m tests.harness --sf /tmp/nonfinite_sf

Money columns (lineitem/orders/part/*acctbal) are NOT mutated: the
2-dp money envelope is a pinned fixture assumption
(tests/test_fixture_assumptions.py::test_money_columns_are_two_decimal)
because decimal-exact sums REQUIRE it; `events.value` has no such
envelope and must tolerate garbage.
"""

from __future__ import annotations

import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = (
    "region nation customer supplier part orders lineitem documents embeddings"
).split()


def write_nonfinite_events(src: str, dst_path: str) -> None:
    """The canonical non-finite mutation — imported by
    tests/test_nonfinite_fixture.py so the sweep fixture and the pin
    test can never drift apart."""
    t = pq.read_table(src)
    cols = {n: t.column(n) for n in t.schema.names}
    ids = cols["event_id"].to_pylist()
    vals = cols["value"].to_pylist()
    out = []
    for i, v in zip(ids, vals):
        if i % 23 == 3:
            out.append(float("nan"))
        elif i % 29 == 5:
            out.append(float("inf"))
        elif i % 31 == 7:
            out.append(float("-inf"))
        elif i % 37 == 11:
            out.append(-0.0)
        else:
            out.append(v)
    arrays = []
    for n in t.schema.names:
        if n == "value":
            arrays.append(pa.array(out, pa.float64()))
        else:
            arrays.append(cols[n])
    pq.write_table(pa.table(dict(zip(t.schema.names, arrays))), dst_path)


def main() -> None:
    src_dir, dst_dir = sys.argv[1], sys.argv[2]
    import os

    os.makedirs(dst_dir, exist_ok=True)
    for name in TABLES:
        shutil.copy(f"{src_dir}/{name}.parquet", f"{dst_dir}/{name}.parquet")
    write_nonfinite_events(f"{src_dir}/events.parquet", f"{dst_dir}/events.parquet")
    print(f"wrote {dst_dir}")


if __name__ == "__main__":
    main()
