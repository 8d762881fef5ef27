"""Build the total-collapse hostile fixture (round-10 sweep).

The round-6 hot-key sweep collapsed HALF of the keys; this is the
endpoint: EVERY event on one user, one type, one second and one
(decimal-typed) value, every document byte-identical, every embedding
the same vector. The regime probes degenerate math (zero variance
everywhere, all-tied picks), within-bucket pair blowups (every doc
pair is a dedup candidate, every embedding pair cosine-1), and —
because the collapsed value is written as DECIMAL(3,2), the natural
type of a literal — the decimal-money class through the STREAMING
transport, which the batch-side io normalization does not cover.

Sweep result (full registry vs oracle): the transport crashed all 16
streaming queries (pyarrow to_pylist yields decimal.Decimal, which
Spark's arrow converter cannot coerce to the declared DoubleType) —
fixed by the feed-edge cast in sources/sep_events.py:_read_rows
mirroring io._normalize_unsigned. After the fix: 278/279; the one
non-pass is join_interval_events, whose output on this input is
GENUINELY quadratic (every event falls in every interval → ~30 M
correct rows on both engines) and exceeds the compare harness's
driver collect (spark.driver.maxResultSize) — a compare-envelope
limit, not a divergence.

    python scripts/gen_collapse_fixture.py /root/testdata/sf0.01 /tmp/collapse
    python -m tests.harness --sf /tmp/collapse

The mutation is imported by tests/test_collapse_fixture.py so the
sweep fixture and the pin test can never drift apart.
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

COPY_TABLES = "region nation customer supplier part orders lineitem".split()


def build(src_dir: str, dst_dir: str) -> None:
    os.makedirs(dst_dir, exist_ok=True)
    for t in COPY_TABLES:
        shutil.copy(f"{src_dir}/{t}.parquet", f"{dst_dir}/{t}.parquet")
    con = duckdb.connect()
    # value deliberately lands as DECIMAL(3,2) — the literal's natural
    # type — to drive the decimal class through the transport.
    con.execute(
        f"""COPY (SELECT event_id,
        TIMESTAMP '2024-06-01 12:00:00' AS ts,
        42 AS user_id, 'click' AS event_type, 7.25 AS value,
        '{{"k": 3}}' AS props
      FROM '{src_dir}/events.parquet')
      TO '{dst_dir}/events.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (SELECT doc_id,
        'the same document text repeated everywhere for the collapse probe' AS text,
        'en' AS lang, 'web' AS source, 63 AS n_chars
      FROM '{src_dir}/documents.parquet')
      TO '{dst_dir}/documents.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (SELECT vec_id,
        (SELECT embedding FROM '{src_dir}/embeddings.parquet' LIMIT 1) AS embedding,
        1 AS label
      FROM '{src_dir}/embeddings.parquet')
      TO '{dst_dir}/embeddings.parquet' (FORMAT PARQUET)"""
    )
    con.close()


if __name__ == "__main__":
    src, dst = sys.argv[1], sys.argv[2]
    build(src, dst)
    print(f"wrote total-collapse fixture to {dst}")
