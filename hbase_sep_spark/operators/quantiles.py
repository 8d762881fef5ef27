"""Statistics-assisted EXACT percentiles with skew-safe refinement.

The at-scale shape for exact interpolated quantiles (== DuckDB / ANSI
``quantile_cont``), replacing the per-group sort buffer entirely:

1. A coarse equi-width histogram of the value column (``bins`` ×
   group: tiny integer aggregates) is computed once — the
   ANALYZE-statistics analog; callers cache it per (session, table).
2. The histogram's cumulative counts locate, per group and quantile,
   the BIN holding each needed order statistic and its rank WITHIN
   that bin — driver state is O(bins × groups).
3. **Skew refinement** (new in round 4): any needed bin whose count
   exceeds ``heavy`` is re-histogrammed over its OWN value range —
   each level narrows the candidate range ~``bins``× — until either
   the leaf is small enough to sort in one task, or the leaf's
   min == max (a point mass: the order statistic's value is then
   known exactly with NO sort at all).  A 99 %-of-rows-in-one-value
   distribution therefore resolves in one extra aggregate pass and
   zero big sorts; a 99 %-in-one-narrow-range distribution resolves
   in O(log_bins(skew)) aggregate passes.  Driver state stays
   O(bins) per refinement step.
4. The only data-sized work is a scan FILTERED to the few needed
   value ranges (pushed down to parquet), a row_number within each
   ≤``heavy``-row leaf, and a broadcast join against the
   (leaf, rank) spec.  Interpolation replicates quantile_cont's
   formula (v_lo + frac·(v_hi − v_lo), same IEEE ops).

Exactness: bin membership only ROUTES rows (counts and ranks are
integers); tied values land in the same bin at every level, and any
within-tie rank permutation selects the same value.  Range
pre-filters are widened one bin each side so FP boundary effects can
never exclude a member row — exact membership is re-decided by the
same bin expression.  No per-group value buffer ever exists, so
memory per task is O(heavy) at any scale.

100 TB posture: histogram passes are map-side-combinable integer
aggregates; refinement triggers only on skew and touches only the
skewed range (predicate pushdown narrows each pass); the final sort
is bounded by ``heavy`` rows per leaf by construction.  The sketch
alternative (``approx_percentile``) remains the one-pass option when
rank-error tolerance is acceptable.

Re-expresses the percentile surface of the reference analytics
engine (reference: query/aggregates percentile path, path-level
UNVERIFIED per SURVEY §0) in Spark-first form.
"""

from __future__ import annotations

import bisect

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

DEFAULT_BINS = 1024
DEFAULT_HEAVY = 200_000  # max rows a single in-leaf sort task may see
_MAX_DEPTH = 64  # doubles exhaust their mantissa long before this


def bin_expr(col, mn: float, w: float, bins: int):
    """Equi-width bin of ``col`` — shared verbatim by the stats pass,
    the refinement passes, and the selection pass so routing is
    self-consistent (same IEEE ops → same bin, every time)."""
    return F.least(
        F.floor((col - F.lit(mn)) / F.lit(w)).cast("int"),
        F.lit(bins - 1),
    )


def compute_stats(
    df: DataFrame, value_col: str, group_col: str, bins: int = DEFAULT_BINS
) -> dict:
    """Coarse per-(group, bin) histogram of ``value_col`` — table
    statistics, not row data: O(bins × groups) integers on the driver
    regardless of table size."""
    vc = F.col(value_col)
    g = df.agg(F.min(vc).alias("mn"), F.max(vc).alias("mx")).collect()[0]
    if g["mn"] is None:
        return {"mn": 0.0, "w": 1.0, "hist": {}}
    mn, mx = float(g["mn"]), float(g["mx"])
    w = (mx - mn) / bins or 1.0
    rows = (
        df.groupBy(group_col, bin_expr(vc, mn, w, bins).alias("bin"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    hist: dict = {}
    for r in rows:
        hist.setdefault(r[group_col], {})[r["bin"]] = r["c"]
    return {"mn": mn, "w": w, "hist": hist}


def _refine(df, vc, group_col, group, pred, rank, count, bins, heavy):
    """Descend into a heavy leaf until it is sortable or a point mass.

    Returns (pred, rank, exact_value, path, range): ``exact_value``
    is not None when the leaf collapsed to a single value (the order
    statistic IS that value — no sort); otherwise ``pred`` selects
    ≤ ``heavy`` rows (best effort; see depth guard) with residual
    ``rank`` inside, ``path`` is a hashable identity for leaf dedupe,
    and ``range`` a (lo, hi) superset of the leaf's values for
    parquet pushdown."""
    path: list = []
    rng = None
    for _ in range(_MAX_DEPTH):
        if count <= heavy:
            return pred, rank, None, tuple(path), rng
        r = df.filter(pred).agg(
            F.min(vc).alias("mn"), F.max(vc).alias("mx")
        ).collect()[0]
        mn2, mx2 = float(r["mn"]), float(r["mx"])
        if mn2 == mx2:
            # Point mass: every row in the leaf holds the same value,
            # so ANY rank inside it selects mn2.  Zero sort.
            return None, None, mn2, tuple(path), None
        w2 = (mx2 - mn2) / bins or 1.0
        sub = bin_expr(vc, mn2, w2, bins)
        counts = {
            row["b"]: row["c"]
            for row in df.filter(pred)
            .groupBy(sub.alias("b"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        cum = 0
        for b in range(bins):
            nb = counts.get(b, 0)
            if cum + nb >= rank:
                rank -= cum
                pred = pred & (sub == b)
                path.append((mn2, w2, b))
                rng = (mn2 + (b - 1) * w2, mn2 + (b + 2) * w2)
                count = nb
                break
            cum += nb
    # Depth guard tripped (pathological FP landscape): fall back to
    # sorting whatever remains — correctness preserved, speed degraded.
    return pred, rank, None, tuple(path), rng


def exact_percentiles(
    spark: SparkSession,
    df: DataFrame,
    value_col: str,
    group_col: str,
    quantiles: dict[str, float],
    stats: dict | None = None,
    bins: int = DEFAULT_BINS,
    heavy: int = DEFAULT_HEAVY,
) -> DataFrame:
    """Exact interpolated percentiles per group: returns a DataFrame
    (group_col, qname, value:double), one row per group × quantile,
    matching ``quantile_cont`` bit-for-bit on the interpolation."""
    if stats is None:
        stats = compute_stats(df, value_col, group_col, bins)
    mn, w, hist = stats["mn"], stats["w"], stats["hist"]
    vc = F.col(value_col)
    gc = F.col(group_col)

    # Driver-side rank arithmetic per (group, quantile): bin + local
    # rank of the two order statistics around pos = 1 + q(n-1).
    needs = []  # (group, qname, kind, frac, top_bin, local_rank, bin_count)
    for group, bcounts in hist.items():
        n = sum(bcounts.values())
        cum = []
        total = 0
        for b in range(bins):
            total += bcounts.get(b, 0)
            cum.append(total)

        def bin_of_rank(r):
            b = bisect.bisect_left(cum, r)
            before = cum[b - 1] if b else 0
            return b, r - before

        for qname, q in quantiles.items():
            pos = 1 + q * (n - 1)
            k_lo = int(pos)
            frac = pos - k_lo
            b, lr = bin_of_rank(k_lo)
            needs.append((group, qname, "lo", frac, b, lr, bcounts.get(b, 0)))
            if frac > 0 and k_lo + 1 <= n:
                b2, lr2 = bin_of_rank(k_lo + 1)
                needs.append((group, qname, "hi", frac, b2, lr2, bcounts.get(b2, 0)))

    # Resolve each need to a leaf (refining heavy bins) or an exact value.
    leaves: dict = {}  # (group, top_bin, path) -> [leaf_id, pred, (lo, hi)]
    spec_rows = []  # (leaf_id, local_rank, group, qname, kind, frac)
    exact_rows = []  # (group, qname, kind, frac, value)
    for group, qname, kind, frac, b, lr, bcount in needs:
        top_pred = (gc == group) & (bin_expr(vc, mn, w, bins) == b)
        top_rng = (mn + (b - 1) * w, mn + (b + 2) * w)
        if bcount <= heavy:
            pred, rank, val, path, rng = top_pred, lr, None, (), top_rng
        else:
            pred, rank, val, path, rng = _refine(
                df, vc, group_col, group, top_pred, lr, bcount, bins, heavy
            )
        if val is not None:
            exact_rows.append((group, qname, kind, frac, val))
            continue
        key = (group, b, path)
        if key not in leaves:
            leaves[key] = [len(leaves), pred, rng or top_rng]
        spec_rows.append((leaves[key][0], rank, group, qname, kind, frac))

    picked = None
    if spec_rows:
        # Pushed-down pre-filter: union of needed value ranges, widened
        # one bin each side (superset; the exact leaf predicate decides).
        scan_pred = None
        for leaf_id, pred, (lo_v, hi_v) in leaves.values():
            c = vc.between(lo_v, hi_v)
            scan_pred = c if scan_pred is None else (scan_pred | c)
        # Leaf assignment: leaves are pairwise disjoint by construction
        # (distinct groups, distinct top bins, or divergent refinement
        # paths), so a first-match when-chain is a total routing.
        assign = None
        for leaf_id, pred, _ in leaves.values():
            assign = (
                F.when(pred, leaf_id) if assign is None else assign.when(pred, leaf_id)
            )
        spec = spark.createDataFrame(
            spec_rows,
            "leaf_id int, local_rank int, grp string, qname string, kind string, frac double",
        )
        data = (
            df.filter(scan_pred)
            .withColumn("__leaf", assign)
            .filter(F.col("__leaf").isNotNull())
        )
        rn = F.row_number().over(Window.partitionBy("__leaf").orderBy(vc))
        picked = (
            data.withColumn("__rn", rn)
            .join(
                F.broadcast(spec),
                (F.col("__leaf") == F.col("leaf_id"))
                & (F.col("__rn") == F.col("local_rank")),
            )
            .select(
                F.col("grp").alias("__grp"),
                F.col("qname"),
                F.col("kind"),
                F.col("frac"),
                vc.cast("double").alias("__val"),
            )
        )
    if exact_rows:
        exact_df = spark.createDataFrame(
            exact_rows,
            "__grp string, qname string, kind string, frac double, __val double",
        )
        picked = exact_df if picked is None else picked.unionByName(exact_df)
    if picked is None:
        return spark.createDataFrame(
            [], f"{group_col} string, qname string, value double"
        )

    per_q = picked.groupBy("__grp", "qname").agg(
        F.max(F.when(F.col("kind") == "lo", F.col("__val"))).alias("v_lo"),
        F.max(F.when(F.col("kind") == "hi", F.col("__val"))).alias("v_hi"),
        F.max("frac").alias("frac"),
    )
    val = F.col("v_lo") + F.col("frac") * (F.coalesce("v_hi", "v_lo") - F.col("v_lo"))
    return per_q.select(
        F.col("__grp").alias(group_col), "qname", val.alias("value")
    )
