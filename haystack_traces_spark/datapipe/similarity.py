"""Similarity search over embedding columns.

- Brute-force cosine top-k (exact baseline): in-order `aggregate` fold over
  zipped arrays — JVM-side, deterministic summation order (so the DuckDB
  oracle matches bit-for-bit), no Python in the loop.
- Hyperplane-LSH buckets (scale path): sign-pattern of hash-derived
  pseudo-random hyperplanes buckets vectors; top-k within the probed bucket
  only. At 100 TB the bucket join replaces the all-pairs cross join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from haystack_traces_spark.datapipe.hashing import hash60_py


def with_norm(emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Cast to double + precompute L2 norm (one pass, reused by every pair)."""
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return emb.select(
        F.col(id_col),
        vec_d.alias("vec_d"),
    ).withColumn(
        "norm",
        F.sqrt(
            F.aggregate(
                "vec_d", F.lit(0.0), lambda acc, x: acc + x * x
            )
        ),
    )


def cosine_expr(a: str, b: str, norm_a: str, norm_b: str) -> Column:
    """Sequential in-index-order dot product — deterministic float result."""
    dot = F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return dot / (F.col(norm_a) * F.col(norm_b))


def brute_force_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (query_id, neighbor_id, cos, rank): exact top-k per query vector.

    Queries are broadcast (tiny side); ranking via window over cos desc with
    id tiebreak — deterministic across engines."""
    from pyspark.sql import Window

    base = with_norm(emb, id_col, vec_col)
    q = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("vec_d").alias("qvec"),
        F.col("norm").alias("qnorm"),
    )
    pairs = base.join(F.broadcast(q), F.col(id_col) != F.col("query_id"))
    dot = F.aggregate(
        F.zip_with(F.col("vec_d"), F.col("qvec"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = pairs.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        (dot / (F.col("norm") * F.col("qnorm"))).alias("cos_raw"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_raw").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos_raw", 6).alias("cos"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def hyperplane_buckets(
    emb: DataFrame,
    n_tables: int = 8,
    planes_per_table: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (id, table, bucket): multi-table sign-pattern LSH.

    Hyperplanes have deterministic hash-derived ±1 components (reproducible
    everywhere, no RNG state). One table of p planes collides ~(1-θ/π)^p;
    L independent tables lift recall to 1-(1-r)^L — the standard
    recall/cost dial. Candidates come from a bucket JOIN, never all pairs."""
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    tables = []
    for t in range(n_tables):
        bucket: Column = F.lit(0).cast("long")
        for p in range(planes_per_table):
            plane = [
                1.0 if (hash60_py(f"{t}:{p}:{d}") & 1) else -1.0 for d in range(dim)
            ]
            arr = F.array(*[F.lit(v) for v in plane])
            dot = F.aggregate(
                F.zip_with(vec_d, arr, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bucket = bucket + F.when(dot >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        tables.append(F.struct(F.lit(t).alias("table"), bucket.alias("bucket")))
    return emb.select(
        F.col(id_col), F.explode(F.array(*tables)).alias("tb")
    ).select(id_col, "tb.table", "tb.bucket")


def lsh_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_tables: int = 8,
    planes_per_table: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN: exact cosine ranking restricted to multi-table LSH candidates.

    Approximate by construction (bucket recall < 1); at 100 TB the bucket
    join replaces the all-pairs cross join and candidate volume is tuned by
    (n_tables, planes_per_table)."""
    from pyspark.sql import Window

    buckets = hyperplane_buckets(emb, n_tables, planes_per_table, dim, id_col)
    qb = buckets.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), "table", "bucket"
    )
    cand = (
        buckets.join(F.broadcast(qb), ["table", "bucket"])
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", F.col(id_col))
        .distinct()
    )

    base = with_norm(emb, id_col)
    q = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col("vec_id").alias("query_id") if id_col == "vec_id" else F.col(id_col).alias("query_id"),
        F.col("vec_d").alias("qvec"),
        F.col("norm").alias("qnorm"),
    )
    pairs = cand.join(base, id_col).join(F.broadcast(q), "query_id")
    dot = F.aggregate(
        F.zip_with(F.col("vec_d"), F.col("qvec"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = pairs.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        (dot / (F.col("norm") * F.col("qnorm"))).alias("cos_raw"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_raw").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos_raw", 6).alias("cos"),
            F.col("rank").cast("long").alias("rank"),
        )
    )
