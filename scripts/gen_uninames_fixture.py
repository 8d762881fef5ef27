"""Build the unicode-enum/name hostile fixture (round-10 sweep).

The round-6 unicode sweep mutated the DOCUMENTS corpus only. But
every OTHER string column — customer/supplier names, TPC-H enums
(mktsegment, orderstatus, orderpriority, returnflag, linestatus,
p_type/brand/name), region/nation names, event_type, documents
lang/source — comes from the same generator that already regenerated
once, and a non-ASCII refresh of any of them exposes the engines'
case-mapping and code-unit gaps:

  - full-vs-simple case mappings: Java/Spark lower('İ') =
    "i"+COMBINING DOT and upper('ß') = "SS" (full mappings) where
    DuckDB's utf8proc applies the simple ones ("i", 'ß' unchanged) —
    any upper()/lower() OUTPUT column diverges byte-for-byte;
  - edit-unit counting: levenshtein counts UTF-16 code units /
    full-mapped units on the JVM vs UTF-8 codepoints in DuckDB —
    distances disagree on any name carrying CJK or non-BMP chars.

The mutation suffixes/extends every string column in every table
with the probe set {İ, ß, ẞ-case pairs, CJK, combining dot, emoji
(non-BMP)} while PRESERVING cardinality and join keys, so grouping
structure and join results are unchanged and only the string
surfaces shift.

Sweep result (full registry vs oracle): 3 fixes —
  - str_basic: upper(c_name)/lower(c_mktsegment) → ascii_upper/
    ascii_lower (portable translate forms, new ASCII_UPPER_SQL);
  - str_levenshtein: both inputs pass the ASCII_FOLD_RE run-collapse
    (every non-ASCII RUN → one '#', identical on both engines,
    identity on ASCII corpora) before measuring;
  - udf_python_scalar: Python str.lower() is a FULL-Unicode mapping
    like Java's — the rot13 table now folds A-Z/a-z in one
    translate, no lower() on either side.
Everything else (grouping/equality on unicode enums, substring/
length/trim — codepoint-identical, regex classes like [A-Z] —
ASCII-only in both dialects) agreed with zero fixes: 279/279.

    python scripts/gen_uninames_fixture.py /root/testdata/sf0.01 /tmp/uniall
    python -m tests.harness --sf /tmp/uniall

The mutation is imported by tests/test_uninames_fixture.py so the
sweep fixture and the pin test can never drift apart.
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb


def build(src_dir: str, dst_dir: str) -> None:
    os.makedirs(dst_dir, exist_ok=True)
    shutil.copy(f"{src_dir}/embeddings.parquet", f"{dst_dir}/embeddings.parquet")
    con = duckdb.connect()
    copies = {
        "customer": """SELECT c_custkey,
             c_name || CASE c_custkey % 5
               WHEN 0 THEN ' İstanbul' WHEN 1 THEN ' straße'
               WHEN 2 THEN ' 北京' WHEN 3 THEN ' café' ELSE ' 🚀' END AS c_name,
             c_nationkey, c_acctbal,
             CASE c_custkey % 5
               WHEN 0 THEN 'BİNA' WHEN 1 THEN 'STRAẞE' WHEN 2 THEN '建筑'
               WHEN 3 THEN 'MÖBEL' ELSE c_mktsegment END AS c_mktsegment
           FROM '{src}/customer.parquet'""",
        "supplier": """SELECT s_suppkey,
             s_name || CASE s_suppkey % 5
               WHEN 0 THEN ' İzmir' WHEN 1 THEN ' größe'
               WHEN 2 THEN ' 東京' WHEN 3 THEN ' noël' ELSE ' ✨' END AS s_name,
             s_nationkey, s_acctbal
           FROM '{src}/supplier.parquet'""",
        "region": """SELECT r_regionkey, r_name || ' İß北️🚀' AS r_name
           FROM '{src}/region.parquet'""",
        "nation": """SELECT n_nationkey, n_name || ' straße' AS n_name, n_regionkey
           FROM '{src}/nation.parquet'""",
        "part": """SELECT p_partkey, p_name || ' 配件İ' AS p_name,
             p_brand || '#ß' AS p_brand, p_type || ' ✨' AS p_type,
             p_size, p_retailprice
           FROM '{src}/part.parquet'""",
        "orders": """SELECT o_orderkey, o_custkey,
             o_orderstatus || 'İ' AS o_orderstatus, o_totalprice,
             o_orderdate, o_orderpriority || ' ß北' AS o_orderpriority
           FROM '{src}/orders.parquet'""",
        "lineitem": """SELECT * REPLACE (l_returnflag || '̇İ' AS l_returnflag,
             l_linestatus || '🚀' AS l_linestatus)
           FROM '{src}/lineitem.parquet'""",
        "events": """SELECT * REPLACE (event_type || '·ß' AS event_type)
           FROM '{src}/events.parquet'""",
        "documents": """SELECT * REPLACE (lang || 'İ' AS lang,
             source || ' ße🚀' AS source)
           FROM '{src}/documents.parquet'""",
    }
    for name, sel in copies.items():
        con.execute(
            f"COPY ({sel.format(src=src_dir)}) "
            f"TO '{dst_dir}/{name}.parquet' (FORMAT PARQUET)"
        )
    con.close()


if __name__ == "__main__":
    src, dst = sys.argv[1], sys.argv[2]
    build(src, dst)
    print(f"wrote unicode-enum fixture to {dst}")
