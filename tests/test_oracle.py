"""The correctness gate, run locally: every registered query vs its
DuckDB oracle at sf0.01 — the same comparison the driver performs.
"""

from __future__ import annotations

import pytest

from hbase_sep_spark.registry import load_all
from tests.conftest import SF_ORACLE
from tests.harness import check_query

REGISTRY = load_all()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_oracle(name, spark, duck):
    res = check_query(name, REGISTRY[name], spark, duck, SF_ORACLE)
    assert res["status"] in ("ok", "ok-rows-only"), f"{name}: {res['status']}: {res['detail']}"


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "l_returnflag"


def test_registry_oracle_consistency():
    """Every sql-hash query has oracle SQL; names are §2 inventory keys."""
    for name, q in REGISTRY.items():
        assert q.fn is not None
        if q.oracle is not None:
            assert "SELECT" in q.oracle.upper()
