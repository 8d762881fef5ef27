"""Measure the incremental minhash upsert against the from-scratch
run (round 12) — the claim behind dedup_minhash_incremental_upsert:
signature computation dominates the operator and is O(corpus) from
scratch but O(delta) maintained.

Method (solo, warmed, median of N): time
  (a) SCRATCH — signatures + LSH pairs + verify over corpus v2;
  (b) INCREMENTAL — signatures over the DELTA only, anti-join merge
      against the persisted v1 signature store (read from parquet,
      as production would), carried-forward pair filter, and the
      delta-bands × all-bands candidate join + verify.
Both are materialized to count() (pair-list cardinality, no Arrow
shipping). The v1 store and v1 pair list are built once OUTSIDE the
timed region — they are the state a production pipeline already has.

    python scripts/decompose_incremental_upsert.py [sf_dir] [runs]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    import pyspark.sql.functions as F

    from hbase_sep_spark.io import scratch_dir
    from hbase_sep_spark.operators import dedup as D
    from hbase_sep_spark.queries.analytics_r12 import (
        _corpus_v1,
        _corpus_v2,
        _delta,
        _fresh_id_offset,
    )
    from hbase_sep_spark.session import get_spark

    spark = get_spark("decompose_incr_upsert", shuffle_partitions=8)

    v1 = _corpus_v1(spark, sf_dir)
    offset = _fresh_id_offset(spark, sf_dir)
    delta = _delta(spark, sf_dir, offset)
    v2 = _corpus_v2(spark, sf_dir, offset)
    n_v1, n_delta, n_v2 = v1.count(), delta.count(), v2.count()

    # Pre-existing production state: the v1 signature store + pairs.
    store = scratch_dir(spark, "decompose_incr", os.path.basename(sf_dir.rstrip("/")))
    sig_path = os.path.join(store, "signatures")
    pairs_path = os.path.join(store, "pairs")
    D.minhash_signatures(v1).write.mode("overwrite").parquet(sig_path)
    sig_store = spark.read.parquet(sig_path)
    D.verify_candidate_pairs(sig_store, D.lsh_candidate_pairs(sig_store)).write.mode(
        "overwrite"
    ).parquet(pairs_path)

    delta_ids = delta.select("doc_id")
    ids_a = delta_ids.withColumnRenamed("doc_id", "id_a")
    ids_b = delta_ids.withColumnRenamed("doc_id", "id_b")

    def scratch() -> int:
        sig = D.minhash_signatures(v2)
        return D.verify_candidate_pairs(sig, D.lsh_candidate_pairs(sig)).count()

    def incremental() -> int:
        sig_delta = D.minhash_signatures(delta)
        merged = spark.read.parquet(sig_path).join(
            F.broadcast(delta_ids), "doc_id", "left_anti"
        ).unionByName(sig_delta)
        carried = (
            spark.read.parquet(pairs_path)
            .join(F.broadcast(ids_a), "id_a", "left_anti")
            .join(F.broadcast(ids_b), "id_b", "left_anti")
        )
        touched = D.verify_candidate_pairs(
            merged, D.lsh_candidate_pairs_touching(merged, delta_ids)
        )
        return carried.select("id_a", "id_b").unionByName(
            touched.select("id_a", "id_b")
        ).count()

    for fn in (scratch, incremental):  # warm plans + JIT
        fn()
        fn()
    out = {}
    for label, fn in (("scratch", scratch), ("incremental", incremental)):
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            n = fn()
            samples.append(time.perf_counter() - t0)
        out[label] = (round(statistics.median(samples), 4), n)

    print(
        f"sf_dir={sf_dir} docs_v1={n_v1} delta={n_delta} docs_v2={n_v2} "
        f"scratch={out['scratch'][0]}s ({out['scratch'][1]} pairs) "
        f"incremental={out['incremental'][0]}s ({out['incremental'][1]} pairs) "
        f"speedup={round(out['scratch'][0] / max(out['incremental'][0], 1e-9), 2)}x"
    )


if __name__ == "__main__":
    main()
