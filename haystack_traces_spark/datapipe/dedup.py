"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale design (100 TB):
- exact: one hash-groupBy shuffle, map-side combinable.
- n-gram Jaccard: candidate pairs come from a JOIN ON SHARED SHINGLE —
  work scales with co-occurrence, never |docs|².
- MinHash+LSH: signatures are a narrow per-doc aggregate; candidates join
  on (band, band-hash) buckets; only candidates get verified with true
  Jaccard. Bands/rows tune recall vs candidate volume.
- SimHash: constant-width fingerprint per doc; near-dup candidates bucket
  on fingerprint prefixes (hamming ≤ k within buckets).
- embedding: brute-force pairs only under a semi-join/bucket; the ANN
  module provides the LSH-bucketed scale path.

Everything below is pure DataFrame expressions (no Python UDFs).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from haystack_traces_spark.datapipe.hashing import hash60, word_shingles

DEFAULT_MINHASH_SEEDS = 8
DEFAULT_BANDS = 4  # 4 bands x 2 rows


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """→ (doc_id, text_hash, keep_doc_id, group_size): canonical doc per
    exact-content group (keep = min doc_id)."""
    hashed = docs.select(
        "doc_id", F.md5(F.col(text_col)).alias("text_hash")
    )
    groups = hashed.groupBy("text_hash").agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count(F.lit(1)).alias("group_size"),
    )
    return hashed.join(groups, "text_hash").select(
        "doc_id", "text_hash", "keep_doc_id", "group_size"
    )


def shingle_rows(docs: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    return docs.select(
        "doc_id", F.explode(word_shingles(text_col, n)).alias("s")
    )


def ngram_jaccard_pairs(
    docs: DataFrame, threshold: float = 0.8, n: int = 3
) -> DataFrame:
    """→ (doc_a, doc_b, jaccard): pairs over the threshold, via shared-shingle
    join (the scalable candidate generator)."""
    sh = shingle_rows(docs, n=n)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signatures(
    docs: DataFrame, n_seeds: int = DEFAULT_MINHASH_SEEDS, n: int = 3
) -> DataFrame:
    """→ (doc_id, mh_0..mh_{k-1}): per-seed min of hash60 over shingles.

    One narrow aggregate per doc — at scale this is the only full scan."""
    sh = shingle_rows(docs, n=n)
    aggs = [
        F.min(hash60("s", seed=f"mh{i}:")).alias(f"mh_{i}") for i in range(n_seeds)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    n_seeds: int = DEFAULT_MINHASH_SEEDS,
    bands: int = DEFAULT_BANDS,
    n: int = 3,
) -> DataFrame:
    """MinHash → LSH banding → candidate join → exact-Jaccard verification.

    → (doc_a, doc_b, jaccard). Candidates whose true Jaccard < threshold are
    filtered out, so LSH affects only recall/cost, not output precision."""
    sig = minhash_signatures(docs, n_seeds, n)
    rows_per_band = n_seeds // bands
    # band key = the raw signature slice (engine-neutral — no internal hash
    # function, so the DuckDB oracle reproduces candidates exactly)
    band_cols = []
    for bi in range(bands):
        parts = [
            F.col(f"mh_{bi * rows_per_band + j}").alias(f"v{j}")
            for j in range(rows_per_band)
        ]
        band_cols.append(F.struct(F.lit(bi).alias("band"), *parts))
    buckets = sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bk")
    ).select("doc_id", "bk.*")

    a = buckets.alias("a")
    b = buckets.alias("b")
    join_cond = (F.col("a.band") == F.col("b.band")) & (
        F.col("a.doc_id") < F.col("b.doc_id")
    )
    for j in range(rows_per_band):
        join_cond = join_cond & (F.col(f"a.v{j}") == F.col(f"b.v{j}"))
    candidates = (
        a.join(b, join_cond)
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )

    verified = ngram_jaccard_pairs(docs, threshold=threshold, n=n)
    return candidates.join(verified, ["doc_a", "doc_b"]).select(
        "doc_a", "doc_b", "jaccard"
    )


def simhash_fingerprints(
    docs: DataFrame, bits: int = 16, text_col: str = "text"
) -> DataFrame:
    """→ (doc_id, simhash): bit-majority fingerprint over distinct tokens."""
    toks = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("w"),
    ).withColumn("h", hash60("w", seed="sh:"))
    bit_aggs = [
        F.when(
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            )
            >= 0,
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias(f"b{i}")
        for i in range(bits)
    ]
    per_doc = toks.groupBy("doc_id").agg(*bit_aggs)
    fp = per_doc.select(
        "doc_id",
        sum(
            (F.col(f"b{i}") * F.lit(1 << i)) for i in range(bits)
        ).cast("long").alias("simhash"),
    )
    return fp


def simhash_pairs(docs: DataFrame, max_hamming: int = 2, bits: int = 16) -> DataFrame:
    """→ (doc_a, doc_b, hamming): fingerprint pairs within hamming distance.

    Small-data form is an all-pairs join; the scale path buckets on
    fingerprint halves (a pair within hamming k must agree exactly on at
    least one of k+1 segments — pigeonhole)."""
    fp = simhash_fingerprints(docs, bits)
    a = fp.alias("a")
    b = fp.alias("b")
    ham = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    )
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def embedding_neardup_pairs(
    emb: DataFrame, threshold: float = 0.4, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """→ (id_a, id_b, cos): cosine near-duplicate pairs (exact, in-order fold
    for cross-engine float determinism). Brute-force form; the ANN module's
    hyperplane-LSH buckets are the 100 TB candidate generator."""
    from haystack_traces_spark.datapipe.similarity import cosine_expr, with_norm

    a = with_norm(emb, id_col, vec_col).alias("a")
    b = with_norm(emb, id_col, vec_col).alias("b")
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(cosine_expr("a.vec_d", "b.vec_d", "a.norm", "b.norm"), 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
