"""ANN quality gates: the scale-path variants (LSH buckets, IVF
coarse lists) must recover a meaningful fraction of the brute-force
top-5 — an ANN that never finds true neighbors is just a fast wrong
answer. Deterministic: fixed corpus + seeded hash planes.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from hbase_sep_spark.io import t
from hbase_sep_spark.operators import vectors as V
from hbase_sep_spark.registry import load_all
from tests.conftest import SF_ORACLE

REGISTRY = load_all()


def _brute_force_top5(spark):
    e = t(spark, SF_ORACLE, "embeddings")
    probes = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("probe_emb")
    )
    cos = V.dot("embedding", "probe_emb") / (V.l2_norm("embedding") * V.l2_norm("probe_emb"))
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos_raw"), "neighbor_id")
    return (
        e.join(F.broadcast(probes), F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cos_raw"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
    )


def _pairs(df):
    return {(r["probe_id"], r["neighbor_id"]) for r in df.collect()}


def _recall(ann, exact):
    return len(ann & exact) / len(exact)


def test_ivf_recall(spark):
    """nprobe=3 of 10 lists on random-ish vectors: must recover a
    clear majority of true top-5 neighbors."""
    exact = _pairs(_brute_force_top5(spark))
    ann = _pairs(REGISTRY["simsearch_ivf_coarse"].fn(spark, SF_ORACLE))
    assert _recall(ann, exact) >= 0.5, f"IVF recall {_recall(ann, exact):.2f}"


def test_lsh_recall(spark):
    """Multi-table LSH (8×4 planes) with probe-side multi-probe
    (Hamming-1 neighbor buckets): near-uniform embeddings are LSH's
    worst case, yet multi-probe must recover nearly all true top-5
    neighbors (measured 0.97 at sf0.01, up from 0.64 single-probe;
    asserted with margin for other corpora)."""
    exact = _pairs(_brute_force_top5(spark))
    ann = _pairs(REGISTRY["simsearch_lsh_bucketed"].fn(spark, SF_ORACLE))
    assert len(ann) > 0
    assert _recall(ann, exact) >= 0.8, f"LSH recall {_recall(ann, exact):.2f}"


def test_int8_quantization_fidelity(spark):
    """Dequantized int8 vectors must stay ≥0.995 cosine-faithful to
    the originals for every row (scalar quantization at 8 bits over
    a bounded range loses <0.5% angular fidelity)."""
    out = REGISTRY["vec_quantize_int8"].fn(spark, SF_ORACLE)
    worst = out.agg(F.min("fidelity_cos").alias("m")).collect()[0]["m"]
    assert worst >= 0.995, f"worst-case quantization fidelity {worst}"


def test_quantized_rerank_recall_and_consistency(spark):
    """Two-stage (int8 shortlist → exact rerank): recall@5 must not
    fall below the one-stage LSH searcher's gate, and every reranked
    score must equal the brute-force cosine for that exact pair —
    stage 2 is full precision, so the only loss is shortlist misses,
    never score drift."""
    exact_df = _brute_force_top5(spark)
    exact = _pairs(exact_df)
    got = REGISTRY["simsearch_quantized_rerank"].fn(spark, SF_ORACLE)
    ann = _pairs(got)
    assert len(ann) > 0
    assert _recall(ann, exact) >= 0.8, f"rerank recall {_recall(ann, exact):.2f}"
    # score consistency: reranked cosine == brute-force cosine per pair
    bf = {
        (r["probe_id"], r["neighbor_id"]): round(r["cos_raw"], 4)
        for r in exact_df.collect()
    }
    for r in got.collect():
        key = (r["probe_id"], r["neighbor_id"])
        if key in bf:
            assert abs(r["cos_sim"] - bf[key]) < 1e-9, key
