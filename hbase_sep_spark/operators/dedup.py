"""Deduplication operators: exact, MinHash+LSH, SimHash.

Scale posture (the whole point of these at 100 TB):
- exact: one hash-groupBy on a 32-byte digest — shuffle carries
  (digest, doc_id) only, never the text;
- MinHash+LSH: candidate generation is an equi-join on (band,
  band_hash) — O(candidates), never all-pairs; signature computation
  is a single explode+groupBy;
- SimHash: 64-bit signature per doc, banded into 16-bit keys for
  hamming-≤-distance candidate pairs — same equi-join shape.

All hashing is xxhash64 with literal seeds → fully deterministic,
no driver-side state.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from hbase_sep_spark.functions.portable import ascii_lower
from hbase_sep_spark.operators.text import shingles, words


def normalize_text(text_col="text"):
    """Dedup canonicalization: trim + A-Z-only case fold.

    ascii_lower, not lower(): digests must be bit-identical across
    engines, and full-Unicode lower() applies FULL case mappings in
    Java (lower('İ') = "i"+COMBINING DOT) but SIMPLE ones in DuckDB
    ("i") — a silent digest/merge divergence on non-ASCII corpora
    (round-6 unicode sweep). SQL mirror for oracles:
    translate(trim(text), 'A..Z', 'a..z')."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return ascii_lower(F.trim(c))


def exact_dedup_groups(df: DataFrame, text_col="text", id_col="doc_id") -> DataFrame:
    """Group exact duplicates by sha2-256 of normalized text; emit one
    canonical row (min id) per group with its multiplicity."""
    digest = F.sha2(normalize_text(text_col), 256)
    return (
        df.select(F.col(id_col), digest.alias("digest"))
        .groupBy("digest")
        .agg(
            F.min(id_col).alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def minhash_signatures(
    df: DataFrame, id_col="doc_id", text_col="text", n_hashes: int = 32, shingle_k: int = 3
) -> DataFrame:
    """(id, minhash array<long>[n_hashes]) via explode + one groupBy.

    Hash family: the variable-length shingle string is hashed ONCE
    (xxhash64), then the n-member family is derived by re-hashing the
    resulting fixed-width long with the member index as a second
    column — 1 string hash + n 12-byte hashes per shingle instead of
    n string hashes (the string hashing dominated the operator's CPU
    at 32 members). Statistically equivalent: xxhash64 over (h, i) is
    an independent uniform family in i.
    """
    sh = df.select(F.col(id_col), F.explode(shingles(text_col, shingle_k)).alias("shingle")).select(
        F.col(id_col), F.xxhash64("shingle").alias("h")
    )
    mins = [F.min(F.xxhash64(F.col("h"), F.lit(i))).alias(f"mh{i}") for i in range(n_hashes)]
    agg = sh.groupBy(id_col).agg(*mins)
    return agg.select(F.col(id_col), F.array(*[F.col(f"mh{i}") for i in range(n_hashes)]).alias("minhash"))


def banded_signatures(
    sig: DataFrame, id_col="doc_id", n_bands: int = 8, rows_per_band: int = 4
) -> DataFrame:
    """(id, band, band_hash) — the LSH band index of a signature
    table. At 100 TB this is the PERSISTED side table an incremental
    dedup maintains (bucketed by (band, band_hash)); here it is
    derived on demand."""
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[F.element_at("minhash", b * rows_per_band + r + 1) for r in range(rows_per_band)]
                ).alias("band_hash"),
            )
            for b in range(n_bands)
        ]
    )
    return sig.select(F.col(id_col), F.explode(bands).alias("bb")).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.band_hash").alias("band_hash")
    )


def lsh_candidate_pairs(
    sig: DataFrame, id_col="doc_id", n_bands: int = 8, rows_per_band: int = 4
) -> DataFrame:
    """Band the signature, bucket-join, emit distinct candidate pairs
    (id_a < id_b). Only same-bucket docs ever meet — no all-pairs."""
    banded = banded_signatures(sig, id_col, n_bands, rows_per_band)
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.band_hash") == F.col("b.band_hash"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
    return pairs.distinct()


def lsh_candidate_pairs_touching(
    sig: DataFrame,
    delta_ids: DataFrame,
    id_col="doc_id",
    n_bands: int = 8,
    rows_per_band: int = 4,
) -> DataFrame:
    """Candidate pairs with AT LEAST ONE side in `delta_ids` (a
    one-column frame of ids) — the incremental-maintenance form of
    lsh_candidate_pairs: when a feed appends/updates a slice, only
    pairs touching the slice can change, so the band join runs
    delta-bands × all-bands instead of all × all. Pairs are
    normalized to id_a < id_b so a delta-delta pair found from both
    sides collapses in the distinct."""
    banded = banded_signatures(sig, id_col, n_bands, rows_per_band)
    delta_banded = banded.join(
        F.broadcast(delta_ids.select(F.col(id_col))), id_col, "left_semi"
    )
    a = delta_banded.alias("a")
    b = banded.alias("b")
    pairs = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.band_hash") == F.col("b.band_hash"))
        & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
    ).select(
        F.least(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_a"),
        F.greatest(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_b"),
    )
    return pairs.distinct()


def verify_candidate_pairs(
    sig: DataFrame,
    pairs: DataFrame,
    id_col="doc_id",
    n_hashes: int = 32,
    threshold: float = 0.5,
) -> DataFrame:
    """Join candidate (id_a, id_b) pairs back to their signatures and
    keep those with estimated Jaccard ≥ threshold. est_jaccard =
    fraction of agreeing minhash components (the unbiased estimator).
    Touches only the candidate set — never the corpus."""
    sa = sig.select(F.col(id_col).alias("id_a"), F.col("minhash").alias("mh_a"))
    sb = sig.select(F.col(id_col).alias("id_b"), F.col("minhash").alias("mh_b"))
    est = F.size(
        F.filter(F.zip_with("mh_a", "mh_b", lambda x, y: x == y), lambda v: v)
    ).cast("double") / F.lit(float(n_hashes))
    return (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", F.round(est, 4).alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    id_col="doc_id",
    text_col="text",
    n_hashes: int = 32,
    threshold: float = 0.5,
) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline → (id_a, id_b, est_jaccard).

    est_jaccard = fraction of agreeing minhash components (unbiased
    Jaccard estimator); candidates come only from LSH buckets.

    The signature table is persisted: it is consumed three times
    (banding + both sides of the verify join) and is tiny relative to
    the corpus (n_hashes longs per doc, ~0.3% of corpus bytes) —
    materializing it once is the standard MinHash-at-scale shape.

    VERDICT-r13 item 1 audit (round 14): the persist is deliberately
    NOT released via the checkpoint-the-result discipline the CC loop
    uses, because here the RESULT is the wrong thing to cache — the
    clone-heavy pair set is 28.9M rows at the 100x fixture (measured)
    where the signature table is ~130 MB; an eager localCheckpoint of
    the pairs cached ~3 GB of deserialized rows, GC-thrashed the
    build 100x (2.0 s -> 379 s solo, measured) and heap-OOMed the
    full sf10 bench session. Holding the bounded signature persist is
    the cheaper side of that trade at every scale (guide §1.1:
    measure the "cleaner" variant before shipping it)."""
    from pyspark import StorageLevel

    sig = minhash_signatures(df, id_col, text_col, n_hashes).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    pairs = lsh_candidate_pairs(sig, id_col)
    return verify_candidate_pairs(sig, pairs, id_col, n_hashes, threshold)


def simhash_signatures(df: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """(id, sh: long) — 64-bit SimHash of the word multiset.

    Each word's xxhash64 votes ±1 per bit position; signature bit i is
    1 iff the summed vote is positive. Shape: explode words → one
    64-column vote aggregate per doc (same single-shuffle profile as
    the MinHash signature) → bits packed with shift/or expressions.
    """
    wdf = df.select(F.col(id_col), F.explode(words(text_col)).alias("word")).withColumn(
        "h", F.xxhash64("word")
    )
    votes = [
        F.sum(
            F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(64)
    ]
    agg = wdf.groupBy(id_col).agg(*votes)
    sig = F.lit(0).cast("long")
    for i in range(64):
        sig = sig.bitwiseOR(
            F.when(F.col(f"v{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return agg.select(F.col(id_col), sig.alias("sh"))


def simhash_near_dup_pairs(df: DataFrame, id_col="doc_id", text_col="text", max_hamming: int = 3) -> DataFrame:
    """SimHash near-dup: banded 16-bit key join (pigeonhole: hamming ≤3
    ⇒ at least one of 4 bands identical), then exact hamming filter
    via bit_count(xor)."""
    sigs = simhash_signatures(df, id_col, text_col)
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright("sh", b * 16).bitwiseAND(F.lit(0xFFFF)).alias("band_key"),
            )
            for b in range(4)
        ]
    )
    banded = sigs.select(id_col, "sh", F.explode(bands).alias("bb")).select(
        id_col, "sh", F.col("bb.band").alias("band"), F.col("bb.band_key").alias("band_key")
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return pairs.select("id_a", "id_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


def connected_components(pairs: DataFrame, ids: DataFrame, id_col="doc_id", max_iter: int = 10) -> DataFrame:
    """Cluster near-dup pairs into groups: (id, cluster_id) where
    cluster_id = min id reachable through the pair graph.

    Label propagation: every node starts labeled with itself; each
    round, a node adopts the smallest label among itself and its
    neighbors; stop when no label changes (checked with one tiny
    aggregate per round — near-dup graphs are shallow, so this
    converges in a handful of rounds; each round is one shuffle on
    id). This is the step that turns pairwise dedup output into
    actionable keep/drop lists.
    """
    import warnings

    from pyspark import StorageLevel

    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = ids.select(F.col(id_col).alias("src"), F.col(id_col).alias("label")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    labels.count()  # materialize so each round starts from stored data
    converged = False
    for _ in range(max_iter):
        neighbor_labels = (
            edges.join(labels.withColumnRenamed("src", "dst2"), edges.dst == F.col("dst2"))
            .select("src", "label")
        )
        # Persist + materialize each round's labels BEFORE probing for
        # convergence: without this, round N's plan re-derives rounds
        # 1..N-1 from the scans (O(rounds²) work and unbounded plan
        # growth — a stack/codegen hazard at cluster scale). The count
        # below is the materialization AND the convergence probe's
        # scan target, so no extra job is paid.
        new_labels = (
            labels.unionByName(neighbor_labels)
            .groupBy("src")
            .agg(F.min("label").alias("label"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        new_labels.count()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "src")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        warnings.warn(
            f"connected_components stopped at max_iter={max_iter} before "
            "convergence; cluster_ids may be inconsistent for components "
            "with diameter > max_iter",
            stacklevel=2,
        )
    # Hand back an UNCACHED result: localCheckpoint materializes the
    # (id, cluster) projection into executor blocks with lineage
    # truncated, so the loop's last persist can be released here
    # instead of leaking one pinned label set per call (persisted
    # DataFrames are held by the CacheManager forever; checkpoint
    # blocks are reaped by the ContextCleaner once the result is
    # GC'd). Callers needing executor-loss fault tolerance at cluster
    # scale should write the labels table out instead.
    result = labels.select(
        F.col("src").alias(id_col), F.col("label").alias("cluster_id")
    ).localCheckpoint(eager=True)
    labels.unpersist()
    return result
