"""Build the negative-epoch (pre-1970) hostile fixture (round-10 sweep).

The fixture's events all sit after 2020 — every epoch is positive. A
real merged feed's are not: digitized archives, legacy system
migrations, and sentinel conventions ship records timestamped before
1970, making epoch_us/unix_micros NEGATIVE. Positive-epoch data hides
two divergence families:

  - floor-vs-trunc: DuckDB's integer `//` floors while Spark's `div`
    truncates — identical on positive epochs, off-by-one-bucket on
    every negative one, so any epoch-arithmetic bucketing (session
    gaps, tumbling alignment, histogram bins) can silently disagree.
  - lexical composite keys: printf('%020d', epoch) sorts negatives
    before positives (the '-' prefix) but REVERSES order within
    negatives. Probed: both engines render the padded string
    identically, so tie-break picks still agree — but any query whose
    PRIMARY ordering is the composite string (not the ts column)
    would pick a semantically wrong row on both sides.

The mutation is a pure translation: every events.ts shifts back 100
years (exact micros), landing the whole feed pre-1970 while keeping
every gap, tie, and NULL exactly as the source fixture had them — so
sessionization structure, window frames, and ordering relations are
preserved and only the epoch sign flips.

    python scripts/gen_negepoch_fixture.py /root/testdata/sf0.01 /tmp/negepoch_sf
    python -m tests.harness --sf /tmp/negepoch_sf

The mutation function is imported by tests/test_negepoch_fixture.py so
the sweep fixture and the pin test can never drift apart.
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

COPY_TABLES = (
    "region nation customer supplier part orders lineitem documents embeddings"
).split()

# 100 Gregorian years of microseconds (exact: 100*365 days + 25 leap
# days — 1924..2024 and 1824..1924 both contain 25 leap days, so the
# translation is calendar-stable for the fixture's 2020s range).
SHIFT_US = (100 * 365 + 25) * 86_400_000_000


def shift_events_pre1970(src_path: str, dst_path: str) -> None:
    """The canonical negative-epoch mutation over events.ts."""
    t = pq.read_table(src_path)
    ts = t.column("ts")
    # Dispatch on the scanned physical type like io.t(): int64 nanos
    # (rounds 1-3 encoding) or timestamp (micros since round 4).
    if pa.types.is_integer(ts.type):
        shifted = pa.compute.subtract(ts, SHIFT_US * 1000)
    else:
        unit = ts.type.unit
        mult = {"s": 1_000_000, "ms": 1_000, "us": 1, "ns": 1 / 1000}[unit]
        ints = ts.cast(pa.int64())
        shifted = pa.compute.subtract(ints, int(SHIFT_US * mult)).cast(ts.type)
    arrays = [
        shifted if n == "ts" else t.column(n) for n in t.schema.names
    ]
    pq.write_table(pa.table(dict(zip(t.schema.names, arrays))), dst_path)


def build(src_dir: str, dst_dir: str) -> None:
    for name in COPY_TABLES:
        shutil.copy(f"{src_dir}/{name}.parquet", f"{dst_dir}/{name}.parquet")
    shift_events_pre1970(f"{src_dir}/events.parquet", f"{dst_dir}/events.parquet")


if __name__ == "__main__":
    src, dst = sys.argv[1], sys.argv[2]
    os.makedirs(dst, exist_ok=True)
    build(src, dst)
    print(f"wrote negative-epoch fixture to {dst}")
