"""Skew-safety and exactness tests for operators/quantiles.py
(VERDICT r3 item 4: the statistics-assisted exact percentile must
survive pathological bin skew without a big in-leaf sort).

``heavy`` is forced tiny so refinement actually triggers on the small
fixtures: a bin over the threshold must either recurse into
sub-histograms or collapse to a point mass — never sort more than
``heavy`` rows in one task.  Exactness oracle is the quantile_cont
formula computed brute-force in Python on the sorted values.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hbase_sep_spark.operators import quantiles

QS = {"median": 0.5, "p90": 0.9}


def brute(vals: list[float], q: float) -> float:
    """DuckDB / ANSI quantile_cont on a sorted copy."""
    s = sorted(vals)
    n = len(s)
    pos = 1 + q * (n - 1)
    k = int(pos)
    frac = pos - k
    lo = s[k - 1]
    hi = s[k] if frac > 0 and k < n else lo
    return lo + frac * (hi - lo)


def run(spark, rows, heavy=8, bins=16):
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        (r["g"], r["qname"]): r["value"]
        for r in quantiles.exact_percentiles(
            spark, df, "v", "g", QS, bins=bins, heavy=heavy
        ).collect()
    }
    by_g: dict[str, list[float]] = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, vals in by_g.items():
        for qname, q in QS.items():
            want = brute(vals, q)
            assert math.isclose(got[(g, qname)], want, rel_tol=1e-12, abs_tol=1e-12), (
                g,
                qname,
                got[(g, qname)],
                want,
            )


def test_point_mass_99pct(spark):
    """99% of rows are one exact value (the VERDICT scenario): the
    heavy bin collapses to min==max and resolves with ZERO sort."""
    rows = [("A", 42.0)] * 990 + [("A", float(i)) for i in range(10)]
    run(spark, rows)


def test_narrow_range_99pct(spark):
    """99% of rows concentrated in one narrow range: refinement must
    descend O(log_bins) levels and still answer exactly."""
    rows = [("A", 100.0 + i * 1e-6) for i in range(990)]
    rows += [("A", float(i) * 1000) for i in range(10)]
    run(spark, rows)


def test_two_groups_mixed_skew(spark):
    """One skewed group + one uniform group share a histogram pass."""
    rows = [("A", 7.0)] * 500 + [("B", float(i)) for i in range(200)]
    run(spark, rows)


def test_all_equal_single_bin(spark):
    """Degenerate: every value identical (w collapses to the 1.0
    fallback; the single bin is a point mass)."""
    rows = [("A", 5.5)] * 300
    run(spark, rows)


def test_no_refinement_small(spark):
    """Below-threshold bins take the direct path (no recursion)."""
    rows = [("A", float(i)) for i in range(30)]
    run(spark, rows, heavy=1000)


@given(
    base=st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
    n_heavy=st.integers(min_value=50, max_value=200),
    tail=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_subnormal=False),
        min_size=1,
        max_size=10,
    ),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_property_skewed_exact(spark, base, n_heavy, tail):
    """Random point-mass-plus-tail distributions stay exact under a
    tiny heavy threshold (refinement always triggered)."""
    rows = [("G", base)] * n_heavy + [("G", v) for v in tail]
    run(spark, rows, heavy=8, bins=8)
