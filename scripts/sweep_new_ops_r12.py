"""Round-12 hostile-class sweep for the newly-added / helper-changed
queries (standing discipline: every NEW query runs the swept classes
before its first driver grade; the per-class pin tests keep
representatives, this drives the round's changed set over every
fixture generator).

Queries: the three round-12 ops + the four dedup-refactor consumers
+ the AST-changed bootstrap.

    python scripts/sweep_new_ops_r12.py [src_sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NAMES = [
    "dedup_minhash_incremental_upsert",
    "stream_sink_exactly_once_audit",
    "stream_multi_subscription_fanout",
    "dedup_minhash_near",
    "dedup_clusters",
    "pipeline_neardup_prep",
    "pipeline_split_leakage_audit",
    "stream_bootstrap_then_tail",
]


def fixtures(src: str):
    """Yield (tag, dir) for every hostile class with a generator."""
    from scripts import (
        gen_collapse_fixture,
        gen_decmoney_fixture,
        gen_jsonhostile_fixture,
        gen_negepoch_fixture,
        gen_nullkeys_fixture,
        gen_nullts_fixture,
        gen_uninames_fixture,
        gen_unsigned_fixture,
        gen_zerorow_fixture,
    )
    from scripts.gen_intts_fixture import build as intts_build
    from scripts.gen_layout_fixture import mutate as layout_mutate

    root = tempfile.mkdtemp(prefix="sweep_r12_")
    simple = {
        "nullts": gen_nullts_fixture.build,
        "nullkeys": gen_nullkeys_fixture.build,
        "uninames": gen_uninames_fixture.build,
        "unsigned": gen_unsigned_fixture.build,
        "decmoney": gen_decmoney_fixture.build,
        "collapse": gen_collapse_fixture.build,
        "negepoch": gen_negepoch_fixture.build,
        "jsonhostile": gen_jsonhostile_fixture.build,
    }
    for tag, build in simple.items():
        dst = os.path.join(root, tag)
        os.makedirs(dst, exist_ok=True)
        build(src, dst)
        yield tag, dst
    dst = os.path.join(root, "layout")
    os.makedirs(dst, exist_ok=True)
    layout_mutate(src, dst)
    yield "layout", dst
    for tag, empties in (
        ("zerorow_all", tuple(
            "region nation customer supplier part orders lineitem "
            "events documents embeddings".split()
        )),
        ("zerorow_docs", ("documents",)),
        ("zerorow_events", ("events",)),
    ):
        dst = os.path.join(root, tag)
        os.makedirs(dst, exist_ok=True)
        gen_zerorow_fixture.build(src, dst, empties)
        yield tag, dst
    dst = os.path.join(root, "intts_ms")
    intts_build(src, dst, "ms")
    yield "intts_ms", dst


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from hbase_sep_spark.registry import load_all
    from hbase_sep_spark.session import get_spark
    from tests.harness import check_query, duck_connection

    reg = load_all()
    spark = get_spark("sweep_r12", shuffle_partitions=8)
    failures = []
    for tag, sf in fixtures(src):
        con = duck_connection(sf)
        try:
            for name in NAMES:
                try:
                    res = check_query(name, reg[name], spark, con, sf)
                    ok = res["status"] in ("ok", "ok-rows-only")
                except Exception:  # noqa: BLE001
                    res = {"status": "EXC", "detail": traceback.format_exc(limit=3)}
                    ok = False
                print(f"{'✓' if ok else '✗'} {tag:14s} {name:34s} {res['status']}"
                      + ("" if ok else f"  {res['detail'][:300]}"), flush=True)
                if not ok:
                    failures.append((tag, name, res["detail"][:500]))
        finally:
            con.close()
        shutil.rmtree(sf, ignore_errors=True)
    print(f"\n{'FAILURES: ' + str(len(failures)) if failures else 'ALL CLEAN'}")
    for f in failures:
        print(" ", f[0], f[1])


if __name__ == "__main__":
    main()
