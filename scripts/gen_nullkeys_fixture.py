"""Build the NULL-key hostile fixture (round-8 null-keys sweep).

The null-ts sweep's sibling: the OTHER nullable key axes. A merged
100 TB feed ships records with NULL user_id (keyless/anonymous
events) and NULL event_type (unclassified events), and a document
store ships NULL lang. The engines disagree on them in several
distinct ways the round-8 sweep surfaced (23 of 279 queries failed):

- the Python streaming source crashed: pandas widens a nullable
  int64 user_id to float64 (every id a float, NULL a NaN) and
  Spark's LongType row converter rejects the NaN — _read_rows now
  emits Python-native rows via to_pylist;
- DuckDB's ASOF JOIN drops NULL equi-keys while the Spark
  union+window form matched inside the NULL-user partition — the
  as-of/PIT family now dead-letters NULL user_id on both sides
  (a keyless record has no match key);
- DuckDB arg_min/arg_max SKIP rows whose VALUE argument is NULL
  while Spark min_by/max_by return them — agg_argmax_misc now nulls
  the ordering key for NULL-type rows (the ts_weekly_ohlc pattern);
- a NULL hash sorts INTO Spark's bottom-k (NULLS FIRST) but OUT of
  DuckDB's (NULLS LAST) — agg_kmv_distinct_sketch excludes NULL
  keys from the sketch;
- Spark's array_join SKIPS NULL elements while DuckDB concat renders
  '' — map_keys_values coalesces map values before serialization;
- the non-null-safe first-occurrence flag (`prev IS NULL OR prev <>
  cur`) re-flagged EVERY NULL-type row — win_running_distinct uses
  row_number==1 OR NOT eqNullSafe.

    python scripts/gen_nullkeys_fixture.py /root/testdata/sf0.01 /tmp/nullkeys_sf
    python -m tests.harness --sf /tmp/nullkeys_sf

The mutation function is imported by tests/test_nullts_fixture.py so
the sweep fixture and the pin tests can never drift apart.
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

COPY_TABLES = (
    "region nation customer supplier part orders lineitem embeddings"
).split()


def _null_col(table: pa.Table, keycol: str, col: str, residue: int, mod: int):
    keys = table.column(keycol).to_pylist()
    arrays = {}
    for n in table.schema.names:
        if n == col:
            vals = table.column(n).to_pylist()
            arrays[n] = pa.array(
                [
                    None if (k is not None and k % mod == residue) else v
                    for k, v in zip(keys, vals)
                ],
                table.schema.field(n).type,
            )
        else:
            arrays[n] = table.column(n)
    return pa.table(arrays)


def build(src_dir: str, dst_dir: str) -> None:
    for name in COPY_TABLES:
        shutil.copy(f"{src_dir}/{name}.parquet", f"{dst_dir}/{name}.parquet")
    ev = pq.read_table(f"{src_dir}/events.parquet")
    ev = _null_col(ev, "event_id", "event_type", 4, 31)
    ev = _null_col(ev, "event_id", "user_id", 3, 29)
    pq.write_table(ev, f"{dst_dir}/events.parquet")
    d = _null_col(pq.read_table(f"{src_dir}/documents.parquet"), "doc_id", "lang", 5, 17)
    pq.write_table(d, f"{dst_dir}/documents.parquet")


if __name__ == "__main__":
    src, dst = sys.argv[1], sys.argv[2]
    os.makedirs(dst, exist_ok=True)
    build(src, dst)
    print(f"wrote null-keys fixture to {dst}")
