from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.harness import DEFAULT_SF, duck_connection  # noqa: E402

# Unit/smoke tests use sf0.001 for speed; the oracle gate runs sf0.01
# (override with HARNESS_SF_DIR).
SF_UNIT = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("HARNESS_SF_DIR", DEFAULT_SF)


@pytest.fixture(scope="session")
def spark():
    from hbase_sep_spark.session import get_spark

    s = get_spark("pytest", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duck_connection(SF_ORACLE)
    yield con
    con.close()
