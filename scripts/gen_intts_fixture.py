"""Build the raw-integer-epoch ts fixture (round-11 sweep).

Physical ts encodings MOVE between regenerations (TIMESTAMP(NANOS)
rounds 1-3 → TIMESTAMP(MICROS) since round 4 → INT96 probed round
10). The remaining realistic shape is the one with NO annotation at
all: a raw int64 epoch column — the Kafka/Debezium/CDC wire default,
written in seconds, milliseconds, microseconds, or nanoseconds with
nothing in the file saying which.

Before round 11, io.t() assumed any bigint ts was NANOS: an
int64-millis feed would have silently become 1970-era garbage
timestamps in every batch query, and the streaming transport crashed
outright (AttributeError on int.tzinfo). The fix classifies the unit
from footer statistics (magnitude bands 1000× apart — unambiguous
for any epoch between 1973 and 5138, by |value| for pre-1970 feeds)
in io.int_ts_unit, shared by io.t(), the bootstrap seam literal, the
streaming transport, and the harness's DuckDB view rebuild.

The mutation converts events.ts (timestamp[us]) to a plain int64
epoch of the requested unit. For 'ms' and 's' this FLOORS sub-unit
digits — both engines then see identical coarser instants, and the
tie-class rules (every pick key carries an event_id tie-break) keep
results deterministic.

    python scripts/gen_intts_fixture.py /root/testdata/sf0.01 /tmp/intts_sf ms
    python -m tests.harness --sf /tmp/intts_sf

Imported by tests/test_intts_fixture.py so the sweep fixture and the
pin test can never drift apart.
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


def mutate_events(
    tbl: pa.Table, unit: str, unsigned: bool = False, narrow: bool = False
) -> pa.Table:
    """events.ts (timestamp) → plain unannotated int64 epoch in
    `unit`. safe=False floors sub-unit digits for coarse units (the
    real coarse feed never had them). unsigned=True writes UINT64
    instead (a C++ writer's uint64_t — Spark scans it as
    DecimalType(20,0), the unsigned-id class applied to time), or
    UINT32 for the seconds unit (time_t's historical width).
    narrow=True writes SIGNED INT32 (only meaningful for the seconds
    unit — the classic 32-bit time_t; Spark scans it as IntegerType,
    which io.t()/the bootstrap widen to bigint before unit dispatch,
    round-12 ADVICE)."""
    i = tbl.schema.get_field_index("ts")
    col = (
        tbl.column("ts")
        .cast(pa.timestamp("us"))
        .cast(pa.timestamp(unit), safe=False)
        .cast(pa.int64())
    )
    typ = pa.int64()
    if unsigned:
        typ = pa.uint32() if unit == "s" else pa.uint64()
        col = col.cast(typ)
    elif narrow:
        assert unit == "s", "int32 epochs only hold the seconds unit"
        typ = pa.int32()
        col = col.cast(typ)
    return tbl.set_column(i, pa.field("ts", typ, True), col)


def build(
    src: str, dst: str, unit: str = "ms", unsigned: bool = False, narrow: bool = False
) -> str:
    os.makedirs(dst, exist_ok=True)
    for t in COPY_TABLES:
        shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    pq.write_table(
        mutate_events(pq.read_table(f"{src}/events.parquet"), unit, unsigned, narrow),
        f"{dst}/events.parquet",
    )
    return dst


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/intts_sf"
    unit = sys.argv[3] if len(sys.argv) > 3 else "ms"
    build(src, dst, unit)
    print(f"wrote {dst} (events.ts = int64 epoch-{unit})")
