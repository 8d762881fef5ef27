"""Round-6 lead-in, eighth block: full Lloyd k-means iteration.

`vec_kmeans_lloyd` upgrades the registry's k-means E-step
(vec_centroid_distance assigns points to FIXED centroids) to the
full Lloyd loop: assign → recompute means → repeat. This is the
canonical iterative-ML workload on the embedding table — the
clustering behind IVF list construction (simsearch_ivf_coarse uses
exactly such centroids) and corpus topic bucketing.

Rows-only by design (SURVEY §2 check column: iterative ops): no
SQL engine replays a data-dependent fixed-point loop; the
convergence property (inertia non-increasing per Lloyd's theorem)
is pinned by tests/test_operators.py instead, and determinism holds
because init is the first-k-by-vec_id rule and ties break on
centroid id.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Row, SparkSession, Window

from hbase_sep_spark.io import t
from hbase_sep_spark.registry import register

_K = 8
_ITERS = 3


@register("vec_kmeans_lloyd", oracle=None, section="2.11")
def vec_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means (k = 8, 3 iterations) over the embedding
    table, reporting the inertia trajectory — one row per iteration
    with the post-assignment total squared distance and the largest
    cluster's size. Deterministic: centroids initialize to the
    first k vectors by vec_id; distance ties assign to the lowest
    centroid id; means and inertia come from decimal-cast sums
    (order-independent across partitionings), summed driver-side in
    cid order and rounded at 4 dp.

    Scale shape: the E-step is a broadcast of k·d floats against
    the point table (constant ×k fan-out, never a shuffled
    pairwise join — the same broadcast-centroid discipline as
    simsearch_ivf_coarse); the M-step is a posexplode +
    (cluster, dim) aggregate — map-side combined, k·d output rows.
    Driver state per round is the k×d centroid matrix (bounded, the
    PCA-moment precedent); no data-sized collect anywhere.

    Scan applies the V.is_valid gate without the nonzero requirement
    (L2 distance needs no division; the zero vector is a legitimate
    point) — a NULL embedding among the first k rows crashed the
    seed collect, and ragged arrays NULL-poison zip_with distances
    (round-7 hostile-embeddings sweep)."""
    from hbase_sep_spark.operators import vectors as V

    emb = (
        t(spark, sf_dir, "embeddings")
        .filter(V.is_valid("embedding", require_nonzero=False))
        .select("vec_id", "embedding")
    )
    cents = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.orderBy("vec_id").limit(_K).collect()
    ]
    if not cents:  # day-1/empty feed: nothing to cluster, no trajectory
        return spark.createDataFrame(
            [], "iteration int, inertia double, largest_cluster bigint"
        )
    out_rows = []
    for it in range(_ITERS):
        # cid is the seeding vec_id — BIGINT, not int: a 100 TB
        # embedding table has ids past 2^31 (the big-id sweep caught
        # the int schema overflowing at vec_id = 5e9).
        cdf = F.broadcast(
            spark.createDataFrame(
                [Row(cid=c, cvec=v) for c, v in cents],
                "cid bigint, cvec array<double>",
            )
        )
        d2 = F.aggregate(
            F.zip_with(
                F.col("embedding"),
                F.col("cvec"),
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        scored = emb.crossJoin(cdf).select(
            "vec_id", "embedding", "cid", d2.alias("d2")
        )
        # min_by aggregation instead of a per-point window: the
        # argmin combines MAP-SIDE (each mapper emits one candidate
        # per point), so the shuffle carries one row per point, not
        # k — and there's no per-key sort. Ties break on (d2, cid).
        # Persist: both the stats fold and the M-step read the
        # assignment; without the cache the E-step executes twice
        # per round.
        assigned = (
            scored.groupBy("vec_id")
            .agg(
                F.min_by(
                    F.struct("cid", "embedding", "d2"),
                    F.struct("d2", "cid"),
                ).alias("s")
            )
            .select(
                "vec_id",
                F.col("s.embedding").alias("embedding"),
                F.col("s.cid").alias("cid"),
                F.col("s.d2").alias("d2"),
            )
            .persist()
        )
        # One action per round: the per-cluster stats (size, inertia)
        # and the M-step centroid join before a single collect of
        # k bounded rows.
        # Decimal-cast sums (the portable.dsum discipline): each d2 /
        # coordinate snaps to a fixed decimal grid before summing, so
        # the aggregates are order-independent across shuffle configs
        # and partitionings (ADVICE r5: raw double F.sum/F.avg leak
        # combine-order low bits into the emitted inertia and the next
        # round's centroids).
        stats = assigned.groupBy("cid").agg(
            F.count(F.lit(1)).cast("bigint").alias("sz"),
            F.sum(F.col("d2").cast("decimal(38,8)")).cast("double").alias("inertia"),
        )
        newc = (
            assigned.select("cid", F.posexplode("embedding").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(
                (
                    F.sum(F.col("x").cast("decimal(38,12)"))
                    / F.count(F.lit(1))
                )
                .cast("double")
                .alias("m")
            )
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("cvec")
            )
        )
        rows = stats.join(newc, "cid").collect()
        # Sum in fixed cid order and round at 4 dp: collect() row
        # order is nondeterministic, and the emitted inertia must be
        # stable if rows-only outputs are ever diffed across runs.
        out_rows.append(
            (
                it,
                round(
                    float(
                        sum(
                            r["inertia"]
                            for r in sorted(rows, key=lambda r: int(r["cid"]))
                        )
                    ),
                    4,
                ),
                int(max(r["sz"] for r in rows)),
            )
        )
        # Lloyd's empty-cluster rule: a centroid that captured no
        # points keeps its previous position (dropping it would
        # silently shrink k for every later round).
        new_by_cid = {int(r["cid"]): [float(x) for x in r["cvec"]] for r in rows}
        cents = [(c, new_by_cid.get(c, v)) for c, v in cents]
        assigned.unpersist()
    return spark.createDataFrame(
        out_rows, "iteration int, inertia double, largest_cluster bigint"
    )
