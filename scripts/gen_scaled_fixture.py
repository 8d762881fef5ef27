#!/usr/bin/env python
"""Synthesize a 10x scaled fixture (sf1-equivalent) from sf0.1 by
key-shifted replication, for scale-stress runs OUTSIDE the graded
testdata tree (writes to /tmp, never /root/testdata).

Replication model: fact tables (events, orders, lineitem, customer,
documents, embeddings) are copied K times with their primary/foreign
keys offset per copy, so key cardinality grows K-fold while per-key
row counts stay constant — the realistic scale-up (more users, more
orders), not hotter keys. Dimension tables (region, nation, supplier,
part) are shared, as they would be at any SF. Timestamps are left
unchanged (same time window, K x denser feed — also the realistic
shape for a busier cluster).

Usage: python scripts/gen_scaled_fixture.py [K] [SRC] [DST]
Defaults: K=10, SRC=/root/testdata/sf0.1, DST=/tmp/sparkgraft_sf1
"""

from __future__ import annotations

import os
import sys

import duckdb


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sparkgraft_sf1"
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    def copy(table: str) -> None:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{table}.parquet') TO "
            f"'{dst}/{table}.parquet' (FORMAT PARQUET)"
        )

    def scale(table: str, shifts: dict[str, str]) -> None:
        """Replicate `table` K times; each listed key column gets
        `col + i * span` where span = 1 + max(col) over the source
        (keeps copies disjoint, preserves join consistency as long as
        both sides of an FK use the same span expression)."""
        spans = {
            c: con.sql(
                f"SELECT 1 + max({expr}) FROM '{src}/{table}.parquet'"
            ).fetchone()[0]
            for c, expr in shifts.items()
        }
        cols = [r[0] for r in con.sql(
            f"DESCRIBE SELECT * FROM '{src}/{table}.parquet'"
        ).fetchall()]
        sel = ", ".join(
            f"{c} + i * {spans[c]} AS {c}" if c in shifts else c for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} FROM '{src}/{table}.parquet', "
            f"range({k}) t(i)) TO '{dst}/{table}.parquet' (FORMAT PARQUET)"
        )

    # Shared FK spans must match across tables: compute from the
    # REFERENCED table's key domain.
    cust_span = con.sql(f"SELECT 1 + max(c_custkey) FROM '{src}/customer.parquet'").fetchone()[0]
    order_span = con.sql(f"SELECT 1 + max(o_orderkey) FROM '{src}/orders.parquet'").fetchone()[0]

    for d in ("region", "nation", "supplier", "part"):
        copy(d)

    scale("customer", {"c_custkey": "c_custkey"})
    # orders: own key by its span, custkey by CUSTOMER's span.
    cols = [r[0] for r in con.sql(f"DESCRIBE SELECT * FROM '{src}/orders.parquet'").fetchall()]
    sel = ", ".join(
        {
            "o_orderkey": f"o_orderkey + i * {order_span} AS o_orderkey",
            "o_custkey": f"o_custkey + i * {cust_span} AS o_custkey",
        }.get(c, c)
        for c in cols
    )
    con.execute(
        f"COPY (SELECT {sel} FROM '{src}/orders.parquet', range({k}) t(i)) "
        f"TO '{dst}/orders.parquet' (FORMAT PARQUET)"
    )
    # lineitem: FK shift must use ORDERS' key domain, not its own max.
    cols = [r[0] for r in con.sql(f"DESCRIBE SELECT * FROM '{src}/lineitem.parquet'").fetchall()]
    sel = ", ".join(
        f"l_orderkey + i * {order_span} AS l_orderkey" if c == "l_orderkey" else c
        for c in cols
    )
    con.execute(
        f"COPY (SELECT {sel} FROM '{src}/lineitem.parquet', range({k}) t(i)) "
        f"TO '{dst}/lineitem.parquet' (FORMAT PARQUET)"
    )
    scale("events", {"event_id": "event_id", "user_id": "user_id"})
    scale("documents", {"doc_id": "doc_id"})
    scale("embeddings", {"vec_id": "vec_id"})

    for t in ("customer", "orders", "lineitem", "events", "documents", "embeddings"):
        n = con.sql(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    main()
