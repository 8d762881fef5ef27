"""Unsigned-id regression tests (round-10 adversarial sweep).

A parquet feed from a C++/Rust writer legitimately carries unsigned
integer ids. Spark maps UINT64 to DecimalType(20,0) — crashing
printf composite pick keys and diverging every id repr — while
DuckDB keeps UINT32 narrow through arithmetic, overflowing the
knuth-hash mirror, and rejects printf('%d', UBIGINT). See
scripts/gen_unsigned_fixture.py for the class write-up; 279/279
after the fixes.

RULES going forward: io.t() normalizes decimal(20,0) scan columns
to BIGINT (don't read tables around it); the knuth-hash SQL mirror
is `((CAST(id AS BIGINT) % 2147483648) * K) % M` (the CAST is
mandatory — portable.knuth_hash docstring); any printf('%..d') over
an id in an oracle casts the id to BIGINT first.
"""

from __future__ import annotations

import pytest

from hbase_sep_spark.registry import load_all
from scripts.gen_unsigned_fixture import build
from tests.conftest import SF_UNIT
from tests.harness import check_query, duck_connection

REGISTRY = load_all()

# The nine fixed names (printf pick keys, knuth consumers) plus the
# id-repr surfaces the Decimal(20,0) mapping diverged on (as-of /
# PIT join outputs) and a latest-per-key pick over the uint feed.
PINNED = [
    "agg_argmax_misc",
    "ts_weekly_ohlc",
    "agg_cms_freq_sketch",
    "agg_kmv_distinct_sketch",
    "pipeline_dataset_split",
    "pipeline_mixture_sample",
    "sample_bernoulli_hash",
    "sample_quality_weighted",
    "sample_reservoir_topk_hash",
    "join_asof_latest_event",
    "join_pit_scd2",
    "events_latest_per_key",
]


@pytest.fixture(scope="module")
def unsigned_sf(tmp_path_factory):
    dst = tmp_path_factory.mktemp("unsigned_sf")
    build(SF_UNIT, str(dst))
    return str(dst)


@pytest.mark.parametrize("name", PINNED)
def test_unsigned_fixture_matches_oracle(name, spark, unsigned_sf):
    con = duck_connection(unsigned_sf)
    try:
        res = check_query(name, REGISTRY[name], spark, con, unsigned_sf)
    finally:
        con.close()
    assert res["status"] in ("ok", "ok-rows-only"), f"{name}: {res['status']}: {res['detail']}"


def test_knuth_mirror_carries_bigint_cast():
    """Drift guard: every knuth-hash oracle site must cast the id to
    BIGINT before the mod-multiply (DuckDB UINT32 arithmetic stays
    narrow and overflows otherwise), and every printf('%..d') id
    argument must be BIGINT-cast (printf rejects UBIGINT)."""
    import re

    bad = []
    for name, q in REGISTRY.items():
        if not q.oracle:
            continue
        for m in re.finditer(r"\(\s*(\w+(?:\.\w+)?)\s*%\s*2147483648", q.oracle):
            if not re.match(r"(?i)cast", m.group(1)):
                bad.append((name, "knuth-no-cast", m.group(0)))
        for m in re.finditer(r"%010d'[^)]*?,\s*([A-Za-z_.]+)\)", q.oracle):
            if "CAST" not in q.oracle[m.start() : m.end()].upper() and m.group(
                1
            ).endswith("_id"):
                bad.append((name, "printf-no-cast", m.group(0)))
    assert not bad, f"unsigned-unsafe oracle arithmetic: {bad}"
