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

from haystack_traces_spark.session import materialize
from pyspark.sql import Column, DataFrame, Window

from haystack_traces_spark.datapipe.caps import DEFAULT_MAX_BUCKET, cap_buckets
from haystack_traces_spark.datapipe.hashing import hash60_py


def _unrolled_sum(term) -> Column:
    """Left-associative chain of per-index terms — bit-identical to the
    sequential fold (0.0 + x == x; SQL + associates left) but whole-stage
    codegen instead of interpreted higher-order functions."""
    out = None
    for t in term:
        out = t if out is None else out + t
    return out


def with_norm(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Cast to double + precompute L2 norm (one pass, reused by every pair).
    ``dim`` statically known → unrolled codegen sum (see _unrolled_sum)."""
    vec_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    if dim is not None and dim <= _UNROLL_MAX_DIM:
        # Unroll over the RAW column, not vec_d — CollapseProject would
        # inline the transform(...) alias into every reference. Gated like
        # _sqdist: only small dims benefit (see _UNROLL_MAX_DIM).
        def term(i):
            x = F.element_at(F.col(vec_col), i).cast("double")
            return x * x
        sq = _unrolled_sum(term(i) for i in range(1, dim + 1))
        return emb.select(
            F.col(id_col), vec_d.alias("vec_d"), F.sqrt(sq).alias("norm")
        )
    return emb.select(F.col(id_col), vec_d.alias("vec_d")).withColumn(
        "norm",
        F.sqrt(F.aggregate("vec_d", F.lit(0.0), lambda acc, x: acc + x * x)),
    )


def cosine_expr(
    a: str, b: str, norm_a: str, norm_b: str, dim: int | None = None
) -> Column:
    """Sequential in-index-order dot product — deterministic float result.
    ``dim`` statically known → unrolled codegen sum (see _unrolled_sum)."""
    if dim is not None and dim <= _UNROLL_MAX_DIM:
        dot = _unrolled_sum(
            F.element_at(F.col(a), i) * F.element_at(F.col(b), i)
            for i in range(1, dim + 1)
        )
    else:
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
    rank_rounded: bool = False,
    filter_col: str | None = None,
    filter_mode: str = "match",
) -> DataFrame:
    """→ (query_id, neighbor_id[, flabel], cos, rank): exact top-k per
    query vector.

    Query vectors are a broadcast (tiny side); each Arrow batch is scored
    against all queries as ONE matrix multiply (the vectorized analog of a
    broadcast nested-loop join), then a window ranks cos desc with id
    tiebreak — deterministic across engines.

    ``rank_rounded``: rank on the 6dp-ROUNDED cosine instead of the raw
    double (the house rule for cross-engine rank-membership stability) —
    used by callers whose RESULT is set membership (dim ablation recall)
    rather than the scored list, where a last-ulp float-path difference
    between numpy GEMM and the oracle's sequential dot could flip the
    boundary neighbor.

    ``filter_col``: metadata-filtered search — each query ranks only
    candidates whose ``filter_col`` value equals the query's own (the
    filter lives INSIDE candidate generation as one more numpy mask on
    the score grid, so it costs nothing and never under-fills k the way
    post-filtering would); adds an ``flabel`` output column.
    ``filter_mode="differ"`` inverts the mask — each query ranks only
    candidates whose value DIFFERS from its own (the hard-negative face);
    same single scoring implementation either way."""
    import numpy as np
    from pyspark.sql import Window

    if filter_mode not in ("match", "differ"):
        raise ValueError(f"filter_mode must be match|differ, got {filter_mode!r}")
    spark = emb.sparkSession
    in_cols = [id_col, vec_col] + ([filter_col] if filter_col else [])
    q_pdf = emb.filter(F.col(id_col).isin(query_ids)).select(*in_cols).toPandas()
    Q = np.asarray(q_pdf[vec_col].tolist(), dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    qids = q_pdf[id_col].to_numpy(dtype=np.int64)
    qlabels = (
        q_pdf[filter_col].to_numpy(dtype=np.int64) if filter_col else None
    )
    bc = spark.sparkContext.broadcast((qids, Qn, qlabels))

    def score(batches):
        import pandas as pd

        qids_, Qn_, qlabels_ = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            An = A / np.linalg.norm(A, axis=1, keepdims=True)
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            qcos = An @ Qn_.T  # (n, n_q)
            mask = ids[:, None] != qids_[None, :]
            if qlabels_ is not None:
                labels = pdf[filter_col].to_numpy(dtype=np.int64)
                lmask = labels[:, None] == qlabels_[None, :]
                mask &= lmask if filter_mode == "match" else ~lmask
            ri, qi = np.nonzero(mask)
            out = {
                "query_id": qids_[qi],
                "neighbor_id": ids[ri],
                "cos_raw": qcos[ri, qi],
            }
            if qlabels_ is not None:
                out["flabel"] = labels[ri]
            yield pd.DataFrame(out)

    out_schema = "query_id long, neighbor_id long, cos_raw double" + (
        ", flabel long" if filter_col else ""
    )
    scored = emb.select(*in_cols).mapInPandas(score, schema=out_schema)
    rank_key = F.round("cos_raw", 6) if rank_rounded else F.col("cos_raw")
    w = Window.partitionBy("query_id").orderBy(
        rank_key.desc(), F.col("neighbor_id").asc()
    )
    sel = ["query_id", "neighbor_id"] + (["flabel"] if filter_col else [])
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            *sel,
            F.round("cos_raw", 6).alias("cos"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


DEFAULT_LSH_TABLES = 24
#: Query-ANN planes (lsh_topk): per-QUERY recall is the binding cost there,
#: so a fixed small p is the right default. The GRAPH family (lsh_knn_graph
#: / lsh_candidate_pairs) instead defaults to planes=None ("auto") — see
#: derive_planes: per-bucket PAIR volume binds, and a fixed p at a growing
#: corpus is corpus-quadratic (measured: 27x wall at 10x data with p fixed
#: vs 3.8x with occupancy held, SCALE.md §2 r8).
DEFAULT_LSH_PLANES = 5

#: The measured knn-graph operating point (SCALE.md §2 r8): hold per-bucket
#: occupancy ≈ this constant as the corpus grows. At the sf0.1 bench corpus
#: (2000 vectors) the derived p equals the previous fixed default (6).
KNN_TARGET_OCCUPANCY = 32
MIN_KNN_PLANES = 4   # below: buckets too few for the join to prune anything
MAX_KNN_PLANES = 16  # above: 2^16 buckets/table; raise n_tables instead


def derive_planes(
    n_vectors: int, target_occupancy: int = KNN_TARGET_OCCUPANCY
) -> int:
    """planes_per_table ≈ log2(n_vectors / target_occupancy) — the measured
    operating rule that keeps hyperplane-bucket occupancy (and therefore
    candidate-pair volume) ~constant per vector as the corpus grows
    (SCALE.md §2 r8: fixed planes at 10x data = 27x wall; occupancy held =
    3.8x). Integer bit-length, floor(log2)+1 — never float log2 (group
    keys / cross-engine rule 13), so the DuckDB oracle face derives the
    IDENTICAL count. Higher p trades threshold-edge recall (measured
    99.5% -> 84.5% at p=9 on the 10x corpus); buy it back with n_tables,
    the nearly-free lever (one shared GEMM per batch)."""
    return max(
        MIN_KNN_PLANES,
        min(MAX_KNN_PLANES, max(n_vectors // target_occupancy, 1).bit_length()),
    )


def hyperplane_buckets(
    emb: DataFrame,
    n_tables: int = DEFAULT_LSH_TABLES,
    planes_per_table: int = DEFAULT_LSH_PLANES,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (id, table, bucket): multi-table sign-pattern LSH.

    Hyperplanes have deterministic hash-derived ±1 components (reproducible
    everywhere, no RNG state). One table of p planes collides ~(1-θ/π)^p;
    L independent tables lift recall to 1-(1-r)^L — the standard
    recall/cost dial (defaults hit ≈0.85 recall@10 on the synthetic
    embeddings). All L·p plane dots are ONE matrix multiply per Arrow batch
    (numpy, vectorized) — adding tables is nearly free, unlike per-plane
    fold expressions."""
    import numpy as np
    import pandas as pd

    planes = np.array(
        [
            [
                1.0 if (hash60_py(f"{t}:{p}:{d}") & 1) else -1.0
                for d in range(dim)
            ]
            for t in range(n_tables)
            for p in range(planes_per_table)
        ]
    )  # (L*p, dim)
    weights = np.tile(1 << np.arange(planes_per_table), n_tables)  # bit weights
    table_ids = np.repeat(np.arange(n_tables), planes_per_table)

    def bucketize(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)  # (n, dim)
            signs = (A @ planes.T) >= 0  # (n, L*p)
            contrib = signs * weights  # bit contributions
            n = len(pdf)
            buckets = np.zeros((n, n_tables), dtype=np.int64)
            np.add.at(buckets.T, table_ids, contrib.T)
            ids = pdf[id_col].to_numpy()
            yield pd.DataFrame(
                {
                    id_col: np.repeat(ids, n_tables),
                    "table": np.tile(np.arange(n_tables), n),
                    "bucket": buckets.reshape(-1),
                }
            )

    return emb.select(id_col, vec_col).mapInPandas(
        bucketize, schema=f"{id_col} long, table int, bucket long"
    )


def kmeans_centroids(
    emb: DataFrame,
    n_cells: int,
    sample_size: int = 2048,
    n_iters: int = 10,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Spherical k-means on a DETERMINISTIC bounded sample → (n_cells, dim)
    unit centroids.

    The sample is the first ``sample_size`` rows under a hash(id, seed)
    ordering — stable across runs/engines, no RNG state — and is the only
    data that ever reaches the driver (bounded, not table-sized). Lloyd
    iterations run in numpy: assign to argmax-cosine centroid, re-mean,
    re-normalize; an emptied cell keeps its previous centroid. Deterministic
    end to end, so results are reproducible (though not oracle-SQL-mirrored —
    the registry keeps the lowest-id default for the oracle path)."""
    import numpy as np

    samp = (
        emb.select(id_col, vec_col)
        .orderBy(F.hash(F.col(id_col), F.lit(seed)).asc(), F.col(id_col).asc())
        .limit(sample_size)
        .toPandas()
    )
    X = np.asarray(samp[vec_col].tolist(), dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    # deterministic init: first n_cells sample rows (hash order ≈ random)
    C = Xn[:n_cells].copy()
    for _ in range(n_iters):
        assign = np.argmax(Xn @ C.T, axis=1)
        for c in range(n_cells):
            members = Xn[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    C[c] = m / n
    return C


def ivf_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: str = "lowest_id",
    rank_rounded: bool = False,
) -> DataFrame:
    """IVF ANN: coarse-quantize, probe the ``n_probe`` nearest cells per
    query, exact-rerank inside the probed cells only. ``rank_rounded``:
    rank on the 6dp-rounded cosine (see brute_force_topk) for callers
    whose result is set MEMBERSHIP rather than the scored list.

    ``centroids="lowest_id"`` (default) uses the ``n_cells`` lowest-id
    vectors — deterministic and oracle-reproducible. ``"kmeans"`` fits
    spherical k-means on a deterministic bounded sample (kmeans_centroids)
    — better-balanced cells at scale, same plan shape. Centroids + query
    vectors are a broadcast; ONE vectorized mapInPandas pass assigns each
    row to its argmax-cosine cell and scores it against every query probing
    that cell (cells are 1/(n_cells/n_probe) of the table — the IVF
    partial-scan win; written partitioned by cell the candidates arrive
    partition-pruned). Global top-k per query is a window over the scored
    survivors."""
    import numpy as np
    from pyspark.sql import Window

    spark = emb.sparkSession
    if centroids == "kmeans":
        Cn = kmeans_centroids(emb, n_cells, id_col=id_col, vec_col=vec_col)
        cids = np.arange(n_cells, dtype=np.int64)  # synthetic cell ids
    else:
        cent_pdf = (
            emb.select(id_col, vec_col)
            .orderBy(F.col(id_col).asc())
            .limit(n_cells)
            .toPandas()
        )
        C = np.asarray(cent_pdf[vec_col].tolist(), dtype=np.float64)
        Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
        cids = cent_pdf[id_col].to_numpy(dtype=np.int64)  # ascending (order-preserved)

    q_pdf = emb.filter(F.col(id_col).isin(query_ids)).select(id_col, vec_col).toPandas()
    Q = np.asarray(q_pdf[vec_col].tolist(), dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    qids = q_pdf[id_col].to_numpy(dtype=np.int64)

    # per-query probed cells: top n_probe centroid cosines (tie → lowest cid;
    # lexsort on (-cos, cid) gives exactly the oracle's ORDER BY cos DESC, cid)
    qc = Qn @ Cn.T  # (n_q, n_cells)
    probe_sets = []
    for r in range(len(qids)):
        order = np.lexsort((cids, -qc[r]))[:n_probe]
        probe_sets.append(set(cids[order].tolist()))
    bc = spark.sparkContext.broadcast((cids, Cn, qids, Qn, probe_sets))

    def score_cells(batches):
        import pandas as pd

        cids_, Cn_, qids_, Qn_, probes_ = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            An = A / np.linalg.norm(A, axis=1, keepdims=True)
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            cells = cids_[np.argmax(An @ Cn_.T, axis=1)]  # argmax: first (lowest cid) wins ties
            qcos = An @ Qn_.T  # (n, n_q)
            out = {"query_id": [], "neighbor_id": [], "cos_raw": []}
            for qi, qid in enumerate(qids_):
                sel = np.fromiter(
                    (c in probes_[qi] for c in cells), bool, len(cells)
                ) & (ids != qid)
                out["query_id"].append(np.full(sel.sum(), qid))
                out["neighbor_id"].append(ids[sel])
                out["cos_raw"].append(qcos[sel, qi])
            yield pd.DataFrame({k_: np.concatenate(v) for k_, v in out.items()})

    scored = emb.select(id_col, vec_col).mapInPandas(
        score_cells, schema="query_id long, neighbor_id long, cos_raw double"
    )
    rank_key = F.round("cos_raw", 6) if rank_rounded else F.col("cos_raw")
    w = Window.partitionBy("query_id").orderBy(
        rank_key.desc(), F.col("neighbor_id").asc()
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


def ivf_sweep_scored(
    emb: DataFrame,
    query_ids: list[int],
    n_cells: int = 16,
    max_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (query_id, neighbor_id, cos_raw, cell_rank): ONE pass of the
    :func:`ivf_topk` scan emitting every candidate inside the query's
    ``max_probe`` nearest cells, tagged with the 1-based rank of the
    candidate's cell in the query's centroid-cosine probe order (the
    identical ``(cos desc, cid asc)`` lexsort ivf_topk uses, lowest-id
    centroids). ``filter(cell_rank <= p)`` reproduces
    ``ivf_topk(n_probe=p)``'s candidate set EXACTLY — same coarse
    assignment (argmax, first-lowest-cid ties), same self-exclusion,
    same raw cosine — so a probe SWEEP prices one full-table GEMM scan
    total instead of one per swept setting (r12-opt; the sweep's |probes|
    rerank windows then run over this one materialized table). At 100 TB
    the emitted volume equals the single largest swept setting's
    candidate volume, strictly less than the per-probe-scan sum."""
    import numpy as np

    spark = emb.sparkSession
    cent_pdf = (
        emb.select(id_col, vec_col)
        .orderBy(F.col(id_col).asc())
        .limit(n_cells)
        .toPandas()
    )
    C = np.asarray(cent_pdf[vec_col].tolist(), dtype=np.float64)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)

    q_pdf = emb.filter(F.col(id_col).isin(query_ids)).select(id_col, vec_col).toPandas()
    Q = np.asarray(q_pdf[vec_col].tolist(), dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    qids = q_pdf[id_col].to_numpy(dtype=np.int64)

    # per-query probe ranks over cell INDICES: cent_pdf is id-ascending, so
    # index order == cid order and lexsort((indices, -cos)) is exactly
    # ivf_topk's lexsort((cids, -cos)); unprobed cells rank n_cells+1 (> any
    # swept p)
    qc = Qn @ Cn.T  # (n_q, n_cells)
    idx = np.arange(Cn.shape[0])
    ranks = np.full((len(qids), Cn.shape[0]), Cn.shape[0] + 1, dtype=np.int64)
    for r in range(len(qids)):
        order = np.lexsort((idx, -qc[r]))[:max_probe]
        ranks[r, order] = np.arange(1, len(order) + 1)
    bc = spark.sparkContext.broadcast((qids, Qn, Cn, ranks))

    def score_cells(batches):
        import pandas as pd

        qids_, Qn_, Cn_, ranks_ = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            An = A / np.linalg.norm(A, axis=1, keepdims=True)
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            cells = np.argmax(An @ Cn_.T, axis=1)  # first (lowest cid) wins ties
            qcos = An @ Qn_.T  # (n, n_q)
            out = {"query_id": [], "neighbor_id": [], "cos_raw": [], "cell_rank": []}
            for qi, qid in enumerate(qids_):
                cr = ranks_[qi, cells]
                sel = (cr <= ranks_.shape[1]) & (ids != qid)
                out["query_id"].append(np.full(sel.sum(), qid))
                out["neighbor_id"].append(ids[sel])
                out["cos_raw"].append(qcos[sel, qi])
                out["cell_rank"].append(cr[sel])
            yield pd.DataFrame({k_: np.concatenate(v) for k_, v in out.items()})

    return emb.select(id_col, vec_col).mapInPandas(
        score_cells,
        schema="query_id long, neighbor_id long, cos_raw double, cell_rank long",
    )


def lsh_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_tables: int = DEFAULT_LSH_TABLES,
    planes_per_table: int = DEFAULT_LSH_PLANES,
    dim: int = 64,
    id_col: str = "vec_id",
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
    rank_rounded: bool = False,
) -> DataFrame:
    """ANN: exact cosine ranking restricted to multi-table LSH candidates.

    Approximate by construction (bucket recall < 1); at 100 TB the bucket
    join replaces the all-pairs cross join and candidate volume is tuned by
    (n_tables, planes_per_table); ``max_bucket`` (caps.py) keeps a
    degenerate bucket from flooding every query's candidate set.
    ``rank_rounded``: rank on the 6dp-rounded cosine (the house
    rank-membership rule — see brute_force_topk)."""
    from pyspark.sql import Window

    # buckets feed the query-side filter AND the candidate join — persist so
    # the GEMM bucketing pass runs once
    buckets = materialize(
        hyperplane_buckets(emb, n_tables, planes_per_table, dim, id_col)
    )
    # query-side rows are read BEFORE the cap so a query sitting in a hot
    # bucket still resolves; only the candidate side is capped
    qb = buckets.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), "table", "bucket"
    )
    capped = cap_buckets(buckets, ["table", "bucket"], max_bucket, "lsh_topk")
    cand = (
        capped.join(F.broadcast(qb), ["table", "bucket"])
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", F.col(id_col))
        .distinct()
    )

    base = with_norm(emb, id_col, dim=dim)
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
    rank_key = F.round("cos_raw", 6) if rank_rounded else F.col("cos_raw")
    w = Window.partitionBy("query_id").orderBy(
        rank_key.desc(), F.col("neighbor_id").asc()
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


def lsh_candidate_pairs(
    emb: DataFrame,
    n_tables: int = DEFAULT_LSH_TABLES,
    planes_per_table: int | None = None,
    dim: int = 64,
    id_col: str = "vec_id",
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """→ distinct directed (vid, neighbor_id) candidate pairs from
    hyperplane-bucket co-occupancy — the candidate stage of
    :func:`lsh_knn_graph`, exposed on its own so the 10×-growth scale
    smoke can measure candidate VOLUME directly (VERDICT r5 ask #6).

    ``planes_per_table=None`` (the default) derives p from a cheap
    ``count()`` via :func:`derive_planes` — occupancy held as the corpus
    grows, so candidate volume stays ~linear instead of corpus-quadratic
    (VERDICT r8 ask #2). Pass an explicit int to pin geometry."""
    if planes_per_table is None:
        planes_per_table = derive_planes(emb.count())
    buckets = materialize(
        hyperplane_buckets(emb, n_tables, planes_per_table, dim, id_col)
    )
    buckets = cap_buckets(
        buckets, ["table", "bucket"], max_bucket, "lsh_knn_graph"
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("vid"),
            F.col(f"b.{id_col}").alias("neighbor_id"),
        )
        .distinct()
    )


def lsh_knn_graph(
    emb: DataFrame,
    k: int = 3,
    n_tables: int = DEFAULT_LSH_TABLES,
    planes_per_table: int | None = None,
    dim: int = 64,
    id_col: str = "vec_id",
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """→ (vec_id, neighbor_id, cos, rank): approximate K-NEAREST-NEIGHBOR
    GRAPH — top-k cosine neighbors for EVERY vector, not a query list.
    This is the primitive SemDeDup-style clustering and graph-ANN indexes
    (HNSW/NSG construction) start from.

    Candidates come from hyperplane-bucket co-occupancy expanded in BOTH
    directions (neighbor lists are asymmetric); ranking is exact cosine
    within each vector's candidate set via a per-vector top-k window —
    partition count = |vectors|, never global. At 100 TB the bucket join
    replaces the |emb|² cross join and (n_tables, planes_per_table) dials
    candidate volume; recall < 1 only for vectors whose true neighbors
    never share a bucket. ``planes_per_table=None`` (default) derives p
    from the corpus size via :func:`derive_planes` so occupancy — and
    per-vector candidate volume — holds as the corpus grows."""
    from pyspark.sql import Window

    cand = lsh_candidate_pairs(
        emb, n_tables, planes_per_table, dim, id_col, max_bucket
    )
    base = with_norm(emb, id_col, dim=dim)
    left = base.select(
        F.col(id_col).alias("vid"),
        F.col("vec_d").alias("va"),
        F.col("norm").alias("na"),
    )
    right = base.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("vec_d").alias("vb"),
        F.col("norm").alias("nb"),
    )
    scored = (
        cand.join(left, "vid")
        .join(right, "neighbor_id")
        .select("vid", "neighbor_id", cosine_expr("va", "vb", "na", "nb", dim).alias("cos_raw"))
    )
    w = Window.partitionBy("vid").orderBy(
        F.col("cos_raw").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("vid").alias(id_col),
            "neighbor_id",
            F.round("cos_raw", 6).alias("cos"),
            "rank",
        )
    )


# ------------------------------------------------------- product quant ----

PQ_M = 8       # subspaces
PQ_KSUB = 16   # codewords per subspace


def _assign_cells(
    emb: DataFrame,
    n_cells: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (id_col, cell, d): nearest-cell assignment against the
    deterministic lowest-id centroids (the IVF coarse quantizer) — the
    shared primitive under doc_clusters and embedding_outliers. Centroids
    broadcast; min-struct groupBy breaks distance ties on the lower cell."""
    from pyspark.sql import Window

    w = Window.orderBy(id_col)
    cents = (
        emb.orderBy(id_col)
        .limit(n_cells)
        .select(
            (F.row_number().over(w) - 1).cast("int").alias("cell"),
            F.col(vec_col).cast("array<double>").alias("cv"),
        )
    )
    vecs = emb.select(id_col, F.col(vec_col).cast("array<double>").alias("v"))
    return (
        vecs.join(F.broadcast(cents))
        .withColumn("d", _sqdist("v", "cv"))
        .groupBy(id_col)
        .agg(F.min(F.struct("d", "cell")).alias("mc"))
        .select(
            id_col,
            F.col("mc.cell").cast("long").alias("cell"),
            F.col("mc.d").alias("d"),
        )
    )


def doc_clusters(
    emb: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (cell, n_vecs, mean_dist, min_vec_id): corpus clustering summary —
    every vector assigned to its nearest of ``n_cells`` deterministic
    lowest-id centroids (the IVF coarse quantizer reused as a clustering),
    with per-cluster occupancy and mean squared-L2 spread. The per-cluster
    view is what a curator reads (topic balance, outlier cells) before
    deciding mix weights or semantic-dedup thresholds.

    Scale shape: centroids broadcast; assignment is one broadcast join +
    min-struct groupBy (shared :func:`_assign_cells`); the summary is a
    second tiny aggregate keyed by cell. Swap :func:`kmeans_centroids` in
    for trained centroids (not oracle-SQL-mirrored; same assignment
    plan)."""
    assign = _assign_cells(emb, n_cells, id_col, vec_col)
    return (
        assign.groupBy("cell")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.round(F.avg("d"), 6).alias("mean_dist"),
            F.min(id_col).alias("min_vec_id"),
        )
        .orderBy("cell")
    )


def embedding_outliers(
    emb: DataFrame,
    n_cells: int = 16,
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (vec_id, cell, dist, rank): the ``k`` vectors FARTHEST from their
    own nearest centroid — embedding-space data quality: encoder failures,
    corrupted inputs, and out-of-domain content all land far from every
    cluster. The triage list a curator inspects before trusting
    embedding-based dedup/mixing decisions.

    Same broadcast-centroid assignment as :func:`doc_clusters` (shared
    :func:`_assign_cells`); the global top-k is TakeOrderedAndProject over
    per-vector scalars (never a full sort). Ties break (dist desc, vec_id
    asc) on the 6dp-rounded distance so membership is engine-stable."""
    from pyspark.sql import Window

    assign = _assign_cells(emb, n_cells, id_col, vec_col).select(
        id_col, "cell", F.round("d", 6).alias("dist")
    )
    wr = Window.orderBy(F.col("dist").desc(), F.col(id_col).asc())
    return (
        assign.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select(id_col, "cell", "dist", F.col("rank").cast("long").alias("rank"))
    )


def pq_codebooks(
    emb: DataFrame,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "lowest_id",
) -> DataFrame:
    """→ (s, code, cw): per-subspace PQ codebooks (Jégou et al. 2011,
    "Product Quantization for Nearest Neighbor Search"). The vector space
    splits into ``m`` contiguous subspaces of dim/m dims; each gets
    ``ksub`` codewords.

    ``mode="lowest_id"`` (default, the oracle path): codewords are the
    subvectors of the ``ksub`` LOWEST-ID vectors — deterministic so the
    DuckDB oracle rebuilds identical codebooks. ``mode="kmeans"``: true
    per-subspace Lloyd k-means on a deterministic hash-ordered sample
    (same discipline as :func:`kmeans_centroids` — bounded driver sample,
    no RNG state, reproducible but not oracle-SQL-mirrored) — the quality
    path for real corpora. The codebook is tiny (m·ksub rows) and always
    broadcast."""
    from pyspark.sql import Window

    dsub = dim // m
    if mode == "kmeans":
        import numpy as np

        samp = (
            emb.select(id_col, vec_col)
            .orderBy(F.hash(F.col(id_col), F.lit(7)).asc(), F.col(id_col).asc())
            .limit(1024)
            .toPandas()
        )
        X = np.asarray(samp[vec_col].tolist(), dtype=np.float64)
        rows = kmeans_codebook_rows(X, m, ksub, dsub)
        return emb.sparkSession.createDataFrame(
            rows, "s int, code int, cw array<double>"
        )

    w = Window.orderBy(id_col)
    base = (
        emb.orderBy(id_col)
        .limit(ksub)
        .select(
            (F.row_number().over(w) - 1).cast("int").alias("code"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
    )
    subs = [
        F.struct(
            F.lit(s).cast("int").alias("s"),
            F.slice("v", s * dsub + 1, dsub).alias("cw"),
        )
        for s in range(m)
    ]
    return base.select("code", F.explode(F.array(*subs)).alias("x")).select(
        "x.s", "code", "x.cw"
    )


def kmeans_codebook_rows(X, m: int, ksub: int, dsub: int) -> list:
    """Per-subspace Lloyd k-means over the (already hash-ordered) sample
    matrix ``X`` → [(s, code, [codeword floats])]. Shared verbatim by the
    Spark operator (pq_codebooks) AND the driver-side oracle generator
    (sql_ivf_pq_residual), so both sides train bit-identical codebooks
    from the same sample — the fit itself stays un-oracled, but its
    OUTPUT is injected into the DuckDB mirror as literal VALUES."""
    import numpy as np

    rows = []
    # fewer sample vectors than ksub → emit that many codewords (the
    # lowest_id mode degrades the same way); range(ksub) over a short
    # C would IndexError
    keff = min(ksub, len(X))
    for s in range(m):
        S = X[:, s * dsub : (s + 1) * dsub]
        C = S[:keff].copy()  # deterministic init: first sample rows
        for _ in range(8):
            d = ((S[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            a = np.argmin(d, axis=1)
            for c in range(keff):
                mem = S[a == c]
                if len(mem):
                    C[c] = mem.mean(axis=0)
        rows += [(s, c, [float(x) for x in C[c]]) for c in range(keff)]
    return rows


def _sub_rows(emb, m, dsub, id_col, vec_col, out_id):
    subs = [
        F.struct(
            F.lit(s).cast("int").alias("s"),
            F.slice(F.col(vec_col).cast("array<double>"), s * dsub + 1, dsub).alias("sv"),
        )
        for s in range(m)
    ]
    return emb.select(
        F.col(id_col).alias(out_id), F.explode(F.array(*subs)).alias("x")
    ).select(out_id, "x.s", "x.sv")


_UNROLL_MAX_DIM = 16  # above this, generated code exceeds JIT method limits


def _sqdist(a: str, b: str, dim: int | None = None):
    """Sequential in-index-order squared L2 — deterministic float result,
    mirroring the oracle's left-fold list_sum.

    With ``dim`` statically known AND SMALL (≤ _UNROLL_MAX_DIM), the fold
    unrolls to a left-associative chain of (a[i]-b[i])² terms: bit-identical
    to the fold (0.0 + x == x for the non-negative squares, and SQL ``+``
    associates left) but pure codegen arithmetic instead of two nested
    interpreted higher-order functions — ~2x on the PQ encode/ADC profiles
    (dsub = 8). Large dims must NOT unroll: at dim 64 the ~128-element_at
    generated method blows past the JVM huge-method JIT limit and runs
    interpreted — measured 4-6x SLOWER than the fold on the
    candidate-verify joins."""
    if dim is not None and dim <= _UNROLL_MAX_DIM:
        terms = None
        for i in range(1, dim + 1):
            d = F.element_at(F.col(a), i) - F.element_at(F.col(b), i)
            t = d * d
            terms = t if terms is None else terms + t
        return terms
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_codes(
    emb: DataFrame,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: DataFrame | None = None,
) -> DataFrame:
    """→ (vec_id, s, code): PQ encoding — per subspace, the argmin-distance
    codeword (ties → lowest code via min-struct). 64 doubles compress to
    m codes; at 100 TB this is the representation that lets a billion-row
    ANN index fit in memory. One broadcast join (codebook) + one
    map-side-combinable min-struct groupBy; no Python.

    ``codebooks`` overrides the default lowest-id codebook — the residual
    IVF-PQ encoder passes residual-trained books here."""
    dsub = dim // m
    cb = codebooks if codebooks is not None else pq_codebooks(
        emb, m, ksub, dim, id_col, vec_col
    )
    sub = _sub_rows(emb, m, dsub, id_col, vec_col, "vid")
    joined = sub.join(F.broadcast(cb), "s").withColumn("d", _sqdist("sv", "cw", dsub))
    return (
        joined.groupBy("vid", "s")
        .agg(F.min(F.struct(F.col("d"), F.col("code"))).alias("mc"))
        .select(
            F.col("vid").alias(id_col),
            "s",
            F.col("mc.code").cast("long").alias("code"),
        )
    )


def pq_distortion(
    emb: DataFrame,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (s, n_vecs, avg_sq_err, max_sq_err): per-subspace PQ quantization
    DISTORTION — mean/max squared L2 between each subvector and its
    nearest codeword (Jégou 2011's quantization error, the quantity PQ
    training minimizes). The fidelity audit behind `pq_search`'s speed:
    a subspace whose distortion dwarfs the others is where ADC rankings
    go wrong first — rebalance dsub or retrain that codebook before
    trusting PQ-ranked retrieval.

    Scale shape: same broadcast-codebook join + min-struct groupBy as the
    encoder itself, then a tiny (s)-keyed combinable rollup — codes-only
    economics, no pair space."""
    dsub = dim // m
    cb = pq_codebooks(emb, m, ksub, dim, id_col, vec_col)
    sub = _sub_rows(emb, m, dsub, id_col, vec_col, "vid")
    joined = sub.join(F.broadcast(cb), "s").withColumn(
        "d", _sqdist("sv", "cw", dsub)
    )
    per_vec = joined.groupBy("vid", "s").agg(F.min("d").alias("md"))
    # integer-micro units for the mean (house rule): a float AVG over
    # per-vector doubles is summation-order-dependent at the last ulp, so
    # a mean landing on a .5e-7 boundary flips ROUND(...,6) between
    # engines; rounding each md to exact BIGINT micros first makes the
    # SUM order-free (max_sq_err is already order-independent)
    return (
        per_vec.select(
            "s", F.round(F.col("md") * 1_000_000).cast("long").alias("md_micro")
        )
        .groupBy("s")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.round(
                F.sum("md_micro") / (F.count(F.lit(1)) * F.lit(1_000_000.0)), 6
            ).alias("avg_sq_err"),
            F.round(F.max("md_micro") / F.lit(1_000_000.0), 6).alias("max_sq_err"),
        )
        .orderBy("s")
    )


def cluster_silhouette(
    emb: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (cell, n_vecs, mean_silhouette, min_silhouette): simplified
    (centroid-based) silhouette per cluster over the deterministic
    lowest-id-centroid assignment `doc_clusters` uses — for each vector,
    a = distance to its OWN centroid, b = distance to the nearest OTHER
    centroid, s = (b − a) / max(a, b). The standard "are these clusters
    real" audit (mean s near 0 ⇒ the cell boundary is arbitrary; negative
    ⇒ misassigned mass) a curator reads next to `cluster_purity` before
    trusting cluster-level curation decisions.

    Simplified-silhouette on purpose: the full formulation needs the n²
    point-to-point distances; the centroid form is O(n·k) — the only
    silhouette that exists at 100 TB (Hruschka 2004). Scale shape: one
    broadcast-centroid join, per-vector two-smallest pick via a bounded
    sort over k distances, tiny per-cell rollup. s uses EUCLIDEAN
    distances (sqrt of the squared form the assignment minimizes)."""
    from pyspark.sql import Window

    w = Window.orderBy(id_col)
    cents = (
        emb.orderBy(id_col)
        .limit(n_cells)
        .select(
            (F.row_number().over(w) - 1).cast("int").alias("cell"),
            F.col(vec_col).cast("array<double>").alias("cv"),
        )
    )
    vecs = emb.select(id_col, F.col(vec_col).cast("array<double>").alias("v"))
    dists = (
        vecs.join(F.broadcast(cents))
        .select(id_col, "cell", F.sqrt(_sqdist("v", "cv")).alias("d"))
    )
    # two smallest (d, cell) per vector: array_sort over ≤ n_cells structs
    two = dists.groupBy(id_col).agg(
        F.slice(
            F.array_sort(F.collect_list(F.struct(F.col("d"), F.col("cell")))),
            1,
            2,
        ).alias("t2")
    )
    # F.get (NULL out-of-bounds), NOT [1]: a single-centroid corpus has a
    # 1-element t2 and bracket indexing ABORTS under ANSI Spark
    a = F.get(F.col("t2"), 0)["d"]
    b = F.get(F.col("t2"), 1)["d"]
    # b NULL = only one centroid exists (n_cells > |corpus| degenerate):
    # silhouette is undefined with no "other" cluster — 0 by convention,
    # checked FIRST so it can't leak through greatest()'s NULL-skipping
    sil = (
        F.when(b.isNull(), F.lit(0.0))
        .when(F.greatest(a, b) > 0, (b - a) / F.greatest(a, b))
        .otherwise(F.lit(0.0))
    )
    # integer-micro units for the mean: per-row doubles are identical
    # cross-engine, but a float SUM's order is not — an AVG landing on a
    # .5e-7 boundary flipped the 6dp round between engines (observed at
    # sf0.001). Summing exact BIGINT micros removes the order dependence.
    per_vec = two.select(
        F.get(F.col("t2"), 0)["cell"].cast("long").alias("cell"),
        F.round(sil * 1_000_000).cast("long").alias("s_micro"),
    )
    return (
        per_vec.groupBy("cell")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.round(
                F.sum("s_micro") / (F.count(F.lit(1)) * F.lit(1_000_000.0)), 6
            ).alias("mean_silhouette"),
            F.round(F.min("s_micro") / F.lit(1_000_000.0), 6)
            .alias("min_silhouette"),
        )
        .orderBy("cell")
    )


def pq_search(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (query_id, neighbor_id, approx_dist, rank): asymmetric-distance
    (ADC) PQ search — each query's EXACT subvectors score against the
    codebook once (a per-query m×ksub distance table, broadcast), then
    every encoded vector's distance is m table lookups + a sum. The scan
    side never touches raw vectors: codes join the tiny distance table and
    aggregate — the 100 TB memory/IO win PQ exists for.

    approx_dist is rounded to 6dp BEFORE ranking (cross-engine float-sum
    reproducibility); ties break by neighbor_id."""
    from pyspark.sql import Window

    dsub = dim // m
    cb = pq_codebooks(emb, m, ksub, dim, id_col, vec_col)
    enc = pq_codes(emb, m, ksub, dim, id_col, vec_col)
    qsub = _sub_rows(
        emb.filter(F.col(id_col).isin(query_ids)), m, dsub, id_col, vec_col, "query_id"
    )
    dtable = qsub.join(F.broadcast(cb), "s").select(
        "query_id", "s", F.col("code").cast("long").alias("code"),
        _sqdist("sv", "cw", dsub).alias("d"),
    )
    scored = (
        enc.withColumnRenamed(id_col, "neighbor_id")
        .join(F.broadcast(dtable), ["s", "code"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.round(F.sum("d"), 6).alias("approx_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def ivf_pq_search(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    residual: bool = False,
    codebook_mode: str = "kmeans",
) -> DataFrame:
    """→ (query_id, neighbor_id, approx_dist, rank): the FAISS-style
    IVF-PQ composite — coarse cells bound the scan, PQ-ADC bounds the
    per-candidate cost.

    ``residual=False`` (default, the oracle path): codes quantize the raw
    vectors; cell assignment and probing are exact L2 against
    deterministic lowest-id centroids so the oracle rebuilds everything.

    ``residual=True`` (the FAISS-accuracy path): codes quantize the CELL
    RESIDUAL ``v − centroid(cell)`` — residuals concentrate around the
    origin so the same m·ksub codebook budget spends its resolution on a
    much smaller ball, and the ADC distance table becomes per
    (query, probed cell) on the query residual against that cell. Fully
    deterministic but not oracle-SQL-mirrored — the registry keeps the
    residual-free default for the oracle row. ``codebook_mode`` applies to
    the residual path only and defaults to per-subspace k-means: residual
    quantization only pays with TRAINED codebooks (measured recall@10 at
    sf0.01: raw 0.36, residual+lowest-id 0.24, residual+kmeans 0.40 — a
    lowest-id residual codebook wastes the codeword budget on arbitrary
    points of a distribution that k-means actually models).

    Scale shape: centroids and the per-query probe set are broadcasts;
    cell assignment is one broadcast join + min-struct groupBy; the
    candidate set is the probed cells' rows ONLY (n_probe/n_cells of the
    table), scored via m code lookups each. Written partitioned by cell,
    the candidate read is partition-pruned."""
    from pyspark.sql import Window

    w = Window.orderBy(id_col)
    cents = (
        emb.orderBy(id_col)
        .limit(n_cells)
        .select(
            (F.row_number().over(w) - 1).cast("int").alias("cell"),
            F.col(vec_col).cast("array<double>").alias("cv"),
        )
    )
    vecs = emb.select(id_col, F.col(vec_col).cast("array<double>").alias("v"))
    dfull = _sqdist("v", "cv", dim)
    assign = (
        vecs.join(F.broadcast(cents))
        .withColumn("d", dfull)
        .groupBy(id_col)
        .agg(F.min(F.struct("d", "cell")).alias("mc"))
        .select(id_col, F.col("mc.cell").alias("cell"))
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("d").asc(), F.col("cell").asc())
    qprobe = (
        vecs.filter(F.col(id_col).isin(query_ids))
        .select(F.col(id_col).alias("query_id"), "v")
        .join(F.broadcast(cents))
        .withColumn("d", dfull)
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "cell")
    )
    dsub = dim // m
    if residual:
        # assign feeds BOTH the residual build and the candidate join —
        # without a pin the vectors x centroids sweep evaluates twice
        assign = materialize(assign)
        # encode residuals: r = v − centroid(cell). One broadcast join to
        # stamp the centroid; the zip_with subtraction stays JVM-side. The
        # residual table feeds BOTH the codebook-training sample and the
        # encoding pass — materialize so it is computed once.
        rvec = materialize(
            vecs.join(assign, id_col)
            .join(F.broadcast(cents), "cell")
            .select(
                id_col,
                F.zip_with("v", "cv", lambda x, y: x - y).alias("rv"),
            )
        )
        cb = pq_codebooks(rvec, m, ksub, dim, id_col, "rv", mode=codebook_mode)
        enc = pq_codes(rvec, m, ksub, dim, id_col, "rv", codebooks=cb)
        # per-(query, probed cell) distance table on the QUERY residual
        qres = (
            vecs.filter(F.col(id_col).isin(query_ids))
            .select(F.col(id_col).alias("query_id"), "v")
            .join(F.broadcast(qprobe), "query_id")
            .join(F.broadcast(cents), "cell")
            .select(
                "query_id",
                "cell",
                F.zip_with("v", "cv", lambda x, y: x - y).alias("rq"),
            )
        )
        subs = [
            F.struct(
                F.lit(s).cast("int").alias("s"),
                F.slice("rq", s * dsub + 1, dsub).alias("sv"),
            )
            for s in range(m)
        ]
        qsub = qres.select(
            "query_id", "cell", F.explode(F.array(*subs)).alias("x")
        ).select("query_id", "cell", "x.s", "x.sv")
        dtable = qsub.join(F.broadcast(cb), "s").select(
            "query_id", "cell", "s",
            F.col("code").cast("long").alias("code"),
            _sqdist("sv", "cw", dsub).alias("d"),
        )
        cand = (
            assign.join(F.broadcast(qprobe), "cell")
            .filter(F.col(id_col) != F.col("query_id"))
            .select("query_id", "cell", F.col(id_col).alias("neighbor_id"))
        )
        scored = (
            cand.join(enc.withColumnRenamed(id_col, "neighbor_id"), "neighbor_id")
            .join(F.broadcast(dtable), ["query_id", "cell", "s", "code"])
            .groupBy("query_id", "neighbor_id")
            .agg(F.round(F.sum("d"), 6).alias("approx_dist"))
        )
    else:
        cand = (
            assign.join(F.broadcast(qprobe), "cell")
            .filter(F.col(id_col) != F.col("query_id"))
            .select("query_id", F.col(id_col).alias("neighbor_id"))
        )
        cb = pq_codebooks(emb, m, ksub, dim, id_col, vec_col)
        enc = pq_codes(emb, m, ksub, dim, id_col, vec_col)
        qsub = _sub_rows(
            emb.filter(F.col(id_col).isin(query_ids)), m, dsub, id_col, vec_col, "query_id"
        )
        dtable = qsub.join(F.broadcast(cb), "s").select(
            "query_id", "s", F.col("code").cast("long").alias("code"),
            _sqdist("sv", "cw", dsub).alias("d"),
        )
        scored = (
            cand.join(enc.withColumnRenamed(id_col, "neighbor_id"), "neighbor_id")
            .join(F.broadcast(dtable), ["query_id", "s", "code"])
            .groupBy("query_id", "neighbor_id")
            .agg(F.round(F.sum("d"), 6).alias("approx_dist"))
        )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("approx_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(wr).cast("long"))
        .filter(F.col("rank") <= k)
    )


def cluster_purity(
    emb: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """→ (cell, n_vecs, majority_label, n_majority, purity): label purity
    of the coarse embedding clustering — the quick "do my embeddings agree
    with my labels" diagnostic a curator runs before trusting
    embedding-space dedup/mixing decisions (low purity ⇒ either noisy
    labels or an encoder that doesn't separate the classes).

    Same deterministic lowest-id-centroid assignment as
    :func:`doc_clusters` (shared :func:`_assign_cells`, broadcast
    centroids); the rollup is two tiny aggregates keyed by cell — output
    is |cells| rows at any corpus scale. Majority ties break on the lower
    label for cross-engine determinism."""
    from pyspark.sql import Window

    assign = _assign_cells(emb, n_cells, id_col, vec_col).select(id_col, "cell")
    lab = emb.select(id_col, F.col(label_col).alias("label"))
    grp = (
        assign.join(lab, id_col)
        .groupBy("cell", "label")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("cell").orderBy(F.col("n").desc(), F.col("label").asc())
    tot = grp.groupBy("cell").agg(F.sum("n").alias("n_vecs"))
    return (
        grp.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .join(tot, "cell")
        .select(
            F.col("cell").cast("long").alias("cell"),
            F.col("n_vecs").cast("long").alias("n_vecs"),
            F.col("label").cast("long").alias("majority_label"),
            F.col("n").cast("long").alias("n_majority"),
            F.round(F.col("n") / F.col("n_vecs"), 6).alias("purity"),
        )
        .orderBy("cell")
    )


def knn_label_consistency(
    emb: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """→ (vec_id, label, n_same, consistency): label-noise detection — for
    each vector, the fraction of its ``k`` exact nearest neighbors
    (cosine) sharing its label. Low consistency flags probable
    mislabels / out-of-distribution rows (Northcutt 2021 confident-
    learning's cheap geometric cousin) — the triage list a curator
    inspects before training a classifier on the labels.

    EXACT face (this function, the oracle row): all-pairs cosine via the
    distributed block-grid GEMM (`embedding_neardup_pairs` at threshold
    −2, nothing driver-side), per-vector top-k window on the 6dp-ROUNDED
    cosine (house rank-on-rounded rule; ties → lower neighbor id).
    Exact kNN is inherently quadratic — at 100 TB the scale face is
    :func:`knn_graph`'s capped-LSH-bucket candidates joined to labels the
    same way (recall<1, SCALE.md dual-face table)."""
    from pyspark.sql import Window

    from haystack_traces_spark.datapipe.dedup import embedding_neardup_pairs
    from haystack_traces_spark.session import materialize

    # pinned: the pair table feeds BOTH directions of the undirected
    # union — unpinned, the block-grid GEMM sweep ran twice per action
    # (r12-opt). This is the documented inherently-quadratic EXACT face;
    # the 100 TB path is knn_graph's capped candidates.
    pairs = materialize(
        embedding_neardup_pairs(
            emb, threshold=-2.0, id_col=id_col, vec_col=vec_col
        )
    )
    und = pairs.select(
        F.col("id_a").alias(id_col), F.col("id_b").alias("nb"), "cos"
    ).unionByName(
        pairs.select(
            F.col("id_b").alias(id_col), F.col("id_a").alias("nb"), "cos"
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("cos").desc(), F.col("nb").asc()
    )
    top = und.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
    lab = emb.select(id_col, F.col(label_col).alias("label"))
    nb_lab = emb.select(
        F.col(id_col).alias("nb"), F.col(label_col).alias("nb_label")
    )
    return (
        top.join(lab, id_col)
        .join(nb_lab, "nb")
        .groupBy(id_col, "label")
        .agg(
            F.sum((F.col("nb_label") == F.col("label")).cast("long")).alias(
                "n_same"
            ),
            F.count(F.lit(1)).alias("k_eff"),
        )
        .select(
            id_col,
            F.col("label").cast("long").alias("label"),
            F.col("n_same").cast("long").alias("n_same"),
            F.round(F.col("n_same") / F.col("k_eff"), 6).alias("consistency"),
        )
    )


def knn_hubness(
    emb: DataFrame, graph: DataFrame, hub_degree: int
) -> DataFrame:
    """→ (vec_id, in_degree, is_hub): how often each vector appears as
    someone ELSE'S nearest neighbor in ``graph`` (a kNN edge table with a
    ``neighbor_id`` column) — the hubness pathology metric (Radovanović
    2010): in high dimensions a few points become near-universal
    neighbors, poisoning kNN graphs, dedup clustering and retrieval
    diversity. Vectors nobody cites (in-degree 0, the anti-hubs) are
    reported too via the left join.

    Scale shape: the graph is output-side (|vectors| × K edges); one
    combinable in-degree count + a left join keyed by vec_id."""
    indeg = graph.groupBy(F.col("neighbor_id").alias("vec_id")).agg(
        F.count(F.lit(1)).alias("d")
    )
    return (
        emb.select("vec_id")
        .join(indeg, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce(F.col("d"), F.lit(0)).cast("long").alias("in_degree"),
            (F.coalesce(F.col("d"), F.lit(0)) >= hub_degree).alias("is_hub"),
        )
        .orderBy("vec_id")
    )


def embedding_drift(emb: DataFrame) -> DataFrame:
    """→ (label, n_vecs, drift): L2 distance between each label's
    centroid and the global corpus centroid — the per-cohort embedding
    drift gauge (swap label for source/time-bucket in production: a
    cohort whose centroid wanders is delivering different content than
    the mix was tuned for; the vector-space sibling of
    token_dist_shift).

    Scale shape: one posexplode over vectors feeding two combinable
    (key, dim) mean aggregates (label and global), a dim-keyed broadcast
    join of the two tiny centroid tables, then a per-label sum. No
    Python, no windows, no |vectors|² anything."""
    parts = emb.select("label", F.posexplode("embedding").alias("i", "v"))
    lab = parts.groupBy("label", "i").agg(
        F.avg("v").alias("lv"), F.count(F.lit(1)).alias("n")
    )
    gcent = parts.groupBy("i").agg(F.avg("v").alias("gv"))
    return (
        lab.join(F.broadcast(gcent), "i")
        .groupBy("label")
        .agg(
            F.max("n").cast("long").alias("n_vecs"),
            F.round(
                F.sqrt(F.sum((F.col("lv") - F.col("gv")) ** 2)), 6
            ).alias("drift"),
        )
        .orderBy("label")
    )


def top_component(
    emb: DataFrame,
    dim: int = 64,
    iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ one row (dim, top_eigenvalue, top_var_share, diag_top_share):
    the TOP PRINCIPAL COMPONENT of the embedding cloud — largest
    eigenvalue of the covariance matrix via power iteration, its share
    of total variance, and beside it the share the DIAGONAL
    approximation (`effective_dim`'s basis) would report. A top_var_share
    far above diag_top_share means variance hides in CORRELATED
    directions — the diagonal participation ratio is then an
    overestimate of usable width, and distance thresholds calibrated
    per-dimension are wrong.

    Exactness/scale split: the covariance matrix is built DISTRIBUTED in
    ONE pass — per row, the d² upper-triangle products via a nested
    higher-order transform (map-side combinable aggregate; O(n·d²) work,
    linear in n) — and is then a BOUNDED d×d table (64² = 4 KB of
    doubles, data-size-independent by construction), so collecting it
    for the deterministic numpy power iteration is the sanctioned
    bounded-driver-sample pattern (same contract as IVF centroids / PQ
    codebooks). C = E[xxᵀ] − μμᵀ, so no centering pass touches the rows.
    Power iteration is CONTRACTIVE toward the top eigenvector, so the
    ulp-level float-sum-order differences between engines shrink instead
    of compounding — the 6dp-rounded outputs agree cross-engine."""
    import numpy as np

    def second_moments(batches):
        # one GEMM per Arrow batch → ONE (d², sums) partial per batch,
        # not per row — 8M interpreted-HOF struct rows become a few
        # dozen 64×64 partials (the block-GEMM house pattern)
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            A = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            M = A.T @ A  # (dim, dim)
            s = A.sum(axis=0)
            d1, d2 = np.meshgrid(
                np.arange(dim), np.arange(dim), indexing="ij"
            )
            yield pd.DataFrame(
                {
                    "d1": d1.reshape(-1),
                    "d2": d2.reshape(-1),
                    "sp": M.reshape(-1),
                    "sx": np.tile(s, dim),  # per-d2 sums ride along
                    "n": np.full(dim * dim, len(pdf), dtype=np.int64),
                }
            )

    partials = emb.select(vec_col).mapInPandas(
        second_moments, schema="d1 int, d2 int, sp double, sx double, n long"
    )
    stats = partials.groupBy("d1", "d2").agg(
        F.sum("sp").alias("sp"),
        F.sum("sx").alias("sx"),
        F.sum(F.when(F.col("d1") == 0, F.col("n"))).alias("n"),
    )
    rows = stats.collect()          # bounded: d² rows by construction
    spark = emb.sparkSession
    schema = (
        "dim long, top_eigenvalue double, top_var_share double, "
        "diag_top_share double"
    )
    mu = np.zeros(dim)
    C = np.zeros((dim, dim))
    n = 0
    for r in rows:
        C[r["d1"], r["d2"]] = r["sp"]
        if r["d1"] == 0:
            mu[r["d2"]] = r["sx"]
            if r["d2"] == 0:
                n = r["n"]
    if n == 0:
        # empty corpus: the SQL face's empty-input aggregates yield one
        # all-NULL row — mirror it (the empty-corpus parity class);
        # without this guard C /= 0 cascades NaNs into every output
        return spark.createDataFrame([(dim, None, None, None)], schema)
    C /= n
    mu /= n
    C -= np.outer(mu, mu)
    u = np.full(dim, 1.0 / np.sqrt(dim))
    for _ in range(iters):
        y = C @ u
        ny = float(np.linalg.norm(y))
        if ny == 0.0:  # C annihilates u (zero-variance cloud): stop
            break
        u = y / ny
    lam = float(u @ C @ u)
    total_var = float(np.trace(C))
    diag_top = float(np.max(np.diag(C)))
    # HALF_UP, not builtin round(): these three doubles face the oracle's
    # ROUND(x, 6) and banker's rounding flips on exact .5e-7 boundaries
    from haystack_traces_spark.functions.stats import round6_half_up

    return spark.createDataFrame(
        [(
            dim,
            round6_half_up(lam),
            round6_half_up(lam / total_var) if total_var > 0 else None,
            round6_half_up(diag_top / total_var) if total_var > 0 else None,
        )],
        schema,
    )


def filtered_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    filter_col: str = "label",
) -> DataFrame:
    """→ (query_id, neighbor_id, flabel, cos, rank): METADATA-FILTERED
    exact top-k — each query ranks only candidates sharing its
    ``filter_col`` value (self excluded). The vector-database staple
    ("nearest within this tenant/language/class"): filtering AFTER an
    unfiltered top-k silently under-fills k when the filter is selective,
    so the filter lives INSIDE :func:`brute_force_topk`'s candidate
    generation (this is that operator with ``filter_col`` set and the
    house rounded-rank rule on — ONE scoring/ranking implementation, so
    the exact and filtered faces cannot drift). At selective filters an
    IVF/LSH variant would prune further; this face is the exact baseline
    those would verify against."""
    return brute_force_topk(
        emb, query_ids, k, id_col, vec_col,
        rank_rounded=True, filter_col=filter_col,
    )


def hard_negative_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """→ (query_id, neighbor_id, neg_label, cos, margin, rank): HARD
    NEGATIVES per probe — the k most-similar vectors whose label DIFFERS
    from the probe's, plus ``margin`` = (probe's best same-label cosine)
    − (this negative's cosine). The contrastive-training staple: hard
    negatives (high cos, wrong label) carry the gradient signal random
    negatives don't, and a NEGATIVE margin — a wrong-label vector closer
    than the best right-label one — is a label-noise flag worth auditing
    before it poisons a triplet batch. Complements :func:`filtered_topk`
    (the positive-pool face) via the same single scoring implementation
    (``filter_mode="differ"``).

    Scale shape: two passes of the broadcast-queries one-GEMM-per-batch
    scan (negatives at k, positives at k=1); the join is |probes|-row
    broadcast. Margins on the 6dp-rounded cosines (house rank rule)."""
    neg = brute_force_topk(
        emb, query_ids, k, id_col, vec_col,
        rank_rounded=True, filter_col=label_col, filter_mode="differ",
    )
    pos_best = brute_force_topk(
        emb, query_ids, 1, id_col, vec_col,
        rank_rounded=True, filter_col=label_col,
    ).select("query_id", F.col("cos").alias("pos_cos"))
    # LEFT join: a probe with no same-label peer keeps its negatives with
    # a NULL margin (dropping them silently would hide exactly the probes
    # whose labels are rarest — the ones worth auditing)
    return (
        neg.join(F.broadcast(pos_best), "query_id", "left")
        .select(
            "query_id",
            "neighbor_id",
            F.col("flabel").alias("neg_label"),
            "cos",
            F.round(F.col("pos_cos") - F.col("cos"), 6).alias("margin"),
            "rank",
        )
        .orderBy("query_id", "rank")
    )


def pq_code_entropy(
    emb: DataFrame,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (s, n_vecs, n_codes_used, usage_ratio, code_entropy,
    top_code_share): CODEBOOK-HEALTH audit per PQ subspace — entropy of
    codeword usage (nats, the char_entropy construction), share of the
    ksub codewords actually used, and the hottest codeword's mass. A
    subspace whose usage collapses onto few codes (low entropy, high
    top share) wastes its bits and is where `pq_distortion` will show
    error first — retrain that codebook or rebalance dsub. Jégou 2011
    §III trains k-means precisely to flatten this distribution.

    Scale shape: rides the encoder's broadcast-codebook join, then two
    tiny combinable rollups over at most m × ksub cells — codes-only
    economics, no pair space, no new shuffle key."""
    codes = pq_codes(emb, m, ksub, dim, id_col, vec_col)
    cc = codes.groupBy("s", "code").agg(F.count(F.lit(1)).alias("cn"))
    n = F.sum("cn")
    # per-cell entropy terms rounded to exact BIGINT micro-units before the
    # SUM (house rule: a float SUM feeding ROUND(...,6) is summation-order-
    # dependent at the last ulp — the same class fixed in pq_distortion)
    term_micro = F.round(
        F.col("cn") * F.log(F.col("cn").cast("double")) * 1_000_000
    ).cast("long")
    return (
        cc.groupBy("s")
        .agg(
            n.cast("long").alias("n_vecs"),
            F.count(F.lit(1)).cast("long").alias("n_codes_used"),
            F.round(F.count(F.lit(1)) / F.lit(float(ksub)), 6).alias(
                "usage_ratio"
            ),
            F.round(
                F.log(n.cast("double"))
                - F.sum(term_micro) / (n * F.lit(1_000_000.0)),
                6,
            ).alias("code_entropy"),
            F.round(F.max("cn") / n, 6).alias("top_code_share"),
        )
        .select(
            F.col("s").cast("int").alias("s"),
            "n_vecs",
            "n_codes_used",
            "usage_ratio",
            "code_entropy",
            "top_code_share",
        )
        .orderBy("s")
    )


MMR_LAMBDA = 0.7


def mmr_diversify(
    emb: DataFrame,
    query_id: int = 0,
    k: int = 5,
    pool_size: int = 20,
    lam: float = MMR_LAMBDA,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (pick, vec_id, relevance, mmr_score): Maximal Marginal Relevance
    re-rank (Carbonell & Goldstein 1998) of the query's top-``pool_size``
    exact candidates — iteratively select the item maximizing
    λ·rel − (1−λ)·max_sim(item, already-selected), so the final k trade
    redundancy for coverage (a plain top-k returns five near-copies of
    the same document; MMR returns the five DISTINCT things closest to
    the query). The retrieval-diversification staple for RAG context
    packing and dedup-aware search UIs.

    Cross-engine discipline: relevance comes from brute_force_topk's
    rounded face; pairwise pool similarities are computed IN SPARK with
    the same sequential fold the oracle's list_dot_product uses, rounded
    6dp before selection; the selection itself runs driver-side over the
    BOUNDED pool (≤ pool_size rows, ≤ pool_size² sims — the codebook-
    training pattern) with HALF_UP output rounding (house rule 15) and
    lowest-id tiebreaks; the oracle unrolls the same k selection steps
    as chained CTEs.

    Scale shape: one exact top-k scan (the GEMM face) + one ≤pool_size²
    broadcast self-join; everything after is O(k·pool) driver arithmetic
    on a constant-bounded set."""
    from haystack_traces_spark.functions.stats import round6_half_up

    spark = emb.sparkSession
    pool_rows = (
        brute_force_topk(
            emb, [query_id], k=pool_size, rank_rounded=True,
            id_col=id_col, vec_col=vec_col,
        )
        .select("neighbor_id", "cos")
        .collect()
    )
    rel = {r["neighbor_id"]: r["cos"] for r in pool_rows}
    pool_ids = sorted(rel)
    pv = with_norm(
        emb.filter(F.col(id_col).isin(pool_ids)), id_col, vec_col
    )
    a = pv.select(
        F.col(id_col).alias("ca"),
        F.col("vec_d").alias("va"),
        F.col("norm").alias("na"),
    )
    b = pv.select(
        F.col(id_col).alias("cb"),
        F.col("vec_d").alias("vb"),
        F.col("norm").alias("nb"),
    )
    sim_rows = (
        a.join(F.broadcast(b), F.col("ca") != F.col("cb"))
        .select(
            "ca",
            "cb",
            F.round(cosine_expr("va", "vb", "na", "nb"), 6).alias("sim"),
        )
        .collect()
    )
    sim = {(r["ca"], r["cb"]): r["sim"] for r in sim_rows}

    selected: list[tuple[int, float, float]] = []  # (id, rel, score)
    remaining = set(pool_ids)
    while remaining and len(selected) < k:
        best = None
        for cand in sorted(remaining):  # ascending id = deterministic tie
            max_sim = max(
                (sim[(cand, sid)] for sid, _, _ in selected), default=0.0
            )
            score = lam * rel[cand] - (1.0 - lam) * max_sim
            if best is None or score > best[2]:
                best = (cand, rel[cand], score)
        selected.append(best)
        remaining.discard(best[0])
    return spark.createDataFrame(
        [
            (i + 1, cand, r, round6_half_up(s))
            for i, (cand, r, s) in enumerate(selected)
        ],
        "pick long, vec_id long, relevance double, mmr_score double",
    )


# ------------------------------------------ PQ dimension permutation ------

def dim_variance_order(
    emb: DataFrame,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[int]:
    """→ 0-based dims ordered by per-dimension variance DESC (index ASC
    tie-break) — computed as the EXACT integer second moment
    n·Σx² − (Σx)² over 6dp micro-unit elements, so both engine faces
    derive the identical ordering with no float-sum order dependence.
    A bounded |dim|-row driver aggregate (house-allowed collect class).
    Both the per-element SQUARE and the square-sum run in DECIMAL(38,0)
    (HUGEINT on the DuckDB twin) — a long xm² overflows int64 at element
    |x| ≥ ~3036 and a long SUM(xm²) at ~10⁷ unit-scale vectors, either
    aborting under ANSI (review r9 pass-2 + ADVICE r9 findings); the
    final moment n·Σx² − (Σx)² is then exact arbitrary-precision Python
    on the collected |dim| rows."""
    x = F.posexplode(
        F.transform(
            F.col(vec_col),
            lambda v: F.round(v.cast("double") * 1_000_000).cast("long"),
        )
    )
    rows = (
        emb.select(x.alias("pos", "xm"))
        .groupBy("pos")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("xm").alias("s1"),
            F.sum(
                F.col("xm").cast("decimal(38,0)") * F.col("xm").cast("decimal(38,0)")
            ).alias("s2"),
        )
        .collect()
    )
    assert len(rows) == dim, (len(rows), dim)
    ordered = sorted(
        rows,
        key=lambda r: (-(int(r["n"]) * int(r["s2"]) - int(r["s1"]) ** 2), r["pos"]),
    )
    return [r["pos"] for r in ordered]


def snake_assignment(order: list[int], m: int) -> list[list[int]]:
    """Balanced-variance subspace assignment (the OPQ-initialization
    trick, Ge et al. 2013 "Optimized Product Quantization" — the
    permutation-only baseline): deal the variance-ranked dims to the m
    subspaces in SNAKE order (left-to-right, then right-to-left), so
    every subspace gets one dim from each variance band and the
    sum-of-variance per subspace is near-equal. Returns per-subspace dim
    lists, each in rank order."""
    out: list[list[int]] = [[] for _ in range(m)]
    for r, d in enumerate(order):
        pas, pos = divmod(r, m)
        s = pos if pas % 2 == 0 else m - 1 - pos
        out[s].append(d)
    return out


def pq_dim_permutation_gain(
    emb: DataFrame,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (layout, s, n_vecs, avg_sq_err, max_sq_err): PQ distortion under
    the NATURAL contiguous-slice subspace layout vs the BALANCED
    variance-snake permutation — the cheap OPQ question ("does
    reordering dims alone buy distortion?") answered with measured rows
    before anyone reaches for a learned rotation. A natural layout whose
    high-variance dims cluster in one slice starves the other codebooks;
    the snake permutation equalizes per-subspace variance at zero
    runtime cost (a dimension permutation is free at encode time). On a
    corpus whose per-dim variances are already near-uniform the two
    layouts tie (measured: the synthetic bench embeddings tie within
    ~1-2% either way) — a tie is the audit SAYING the natural layout is
    fine; the face earns its keep on corpora with variance-concentrated
    dims (PCA-projected or whitened-then-truncated embeddings).

    Both layouts run the identical pq_distortion pipeline (lowest-id
    codebooks → broadcast join → min-struct encode → micro-integer
    rollup); the permutation itself is the exact-integer variance order,
    so the oracle rebuilds it bit-for-bit. Scale shape: one |dim|-row
    moment aggregate + 2× the codes-only distortion audit."""
    order = dim_variance_order(emb, dim, id_col, vec_col)
    flat = [d for sub in snake_assignment(order, m) for d in sub]
    permuted = F.array(
        *[F.element_at(F.col(vec_col), d + 1) for d in flat]
    ).cast("array<double>")
    nat = pq_distortion(
        emb.select(id_col, vec_col), m, ksub, dim, id_col, vec_col
    )
    bal = pq_distortion(
        emb.select(F.col(id_col), permuted.alias(vec_col)),
        m,
        ksub,
        dim,
        id_col,
        vec_col,
    )
    return (
        nat.select(F.lit("natural").alias("layout"), "*")
        .unionByName(bal.select(F.lit("balanced").alias("layout"), "*"))
        .orderBy("layout", "s")
    )


# ---------------------------------------------- scalar quantization -------

#: Bit-width ladder for the scalar-quantization faces: int8 is the standard
#: storage format (4x smaller than float32 on the scan path), int6/int4 map
#: the degradation curve so the "how low can we quantize" decision is read
#: off measured rows, not guessed.
QUANT_BITS = (8, 6, 4)


def _dequantized(
    emb: DataFrame,
    bits: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_cols: tuple = (),
) -> DataFrame:
    """→ (bits, id, *extra, v, deq): per-vector symmetric int quantization
    round-trip — scale = max|x| / (2^(bits-1)-1), deq_i = clamp(round(x_i /
    scale)) * scale. Everything is array Column expressions (map-only,
    whole-stage codegen, no Python); ROUND half-away-from-zero matches
    DuckDB's ROUND so both engine faces see identical dequantized doubles.
    A zero vector yields scale 0: deq is guarded to NULL as a WHOLE
    array on BOTH faces (Spark 4 runs ANSI mode, where a bare x/0 would
    ABORT the job; a per-ELEMENT guard is not enough because
    least/greatest IGNORE null arguments on both engines), so downstream
    dot products propagate NULL and the aggregate faces skip the row's
    metrics identically (review r9 finding; pinned by
    test_dequantized_zero_vector_yields_null)."""
    levels = F.lit(float(2 ** (bits - 1) - 1))
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = emb.select(F.col(id_col), *[F.col(c) for c in extra_cols], v.alias("v")).withColumn(
        "scale", F.array_max(F.transform(F.col("v"), lambda x: F.abs(x))) / levels
    )
    safe_scale = F.nullif(F.col("scale"), F.lit(0.0))
    deq = F.when(
        F.col("scale") > F.lit(0.0),
        F.transform(
            F.col("v"),
            lambda x: F.least(F.greatest(F.round(x / safe_scale), -levels), levels)
            * F.col("scale"),
        ),
    )
    return base.select(
        F.lit(bits).alias("bits"),
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        F.col("v"),
        deq.alias("deq"),
    )


def _arr_dot(a, b) -> Column:
    """Sequential in-order fold dot product over two array Columns —
    bit-identical to DuckDB's list_dot_product (same summation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def quantization_error(
    emb: DataFrame,
    bits: tuple = QUANT_BITS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """→ (bits, label, n_vecs, mean_cos, mean_rel_err, min_cos,
    max_rel_err): per-vector scalar-quantization distortion, aggregated per
    (bit-width, label) — cos(v, dequant(v)) and relative L2 error
    |v - deq| / |v|. The storage-planning face: int8 cuts ANN scan bytes 4x
    vs float32; these rows say what that costs in geometry before
    `ann_quantized_recall` says what it costs in retrieval.

    Per-vector values are rounded to 6dp micro-integers BEFORE the group
    aggregate, so sums are order-independent and both engine faces derive
    identical means. Map-only per bits level (|bits| passes over the
    vectors), then a tiny groupBy — linear in corpus, no joins."""
    out = None
    for b in bits:
        dq = _dequantized(emb, b, id_col, vec_col, extra_cols=(label_col,))
        diff_sq = _sqdist("v", "deq")
        per_vec = dq.select(
            "bits",
            F.col(label_col).cast("long").alias("label"),
            F.round(
                _arr_dot(F.col("v"), F.col("deq"))
                / (
                    F.sqrt(_arr_dot(F.col("v"), F.col("v")))
                    * F.sqrt(_arr_dot(F.col("deq"), F.col("deq")))
                ),
                6,
            ).alias("cos_sd"),
            F.round(
                F.sqrt(diff_sq) / F.sqrt(_arr_dot(F.col("v"), F.col("v"))), 6
            ).alias("rel_err"),
        ).select(
            "bits",
            "label",
            "cos_sd",
            "rel_err",
            F.round(F.col("cos_sd") * 1_000_000).cast("long").alias("cos_micro"),
            F.round(F.col("rel_err") * 1_000_000).cast("long").alias("rel_micro"),
        )
        out = per_vec if out is None else out.unionByName(per_vec)
    return (
        out.groupBy("bits", "label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            # means divide by the NON-NULL metric count, not the row
            # count — a zero vector (NULL metrics) must not deflate the
            # group mean below its own min (review r9 pass-2 finding)
            F.round(F.sum("cos_micro") / (F.count("cos_micro") * 1_000_000.0), 6).alias(
                "mean_cos"
            ),
            F.round(F.sum("rel_micro") / (F.count("rel_micro") * 1_000_000.0), 6).alias(
                "mean_rel_err"
            ),
            F.min("cos_sd").alias("min_cos"),
            F.max("rel_err").alias("max_rel_err"),
        )
        .select(
            F.col("bits").cast("int").alias("bits"),
            "label",
            "n_vecs",
            "mean_cos",
            "mean_rel_err",
            "min_cos",
            "max_rel_err",
        )
        .orderBy("bits", "label")
    )


def quantized_topk_recall(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    bits: tuple = QUANT_BITS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (bits, query_id, overlap, recall): recall@k of exact top-k under
    scalar quantization — rank every probe's neighbors by float cosine and
    by quantized cosine (both on the dequantized doubles), count the top-k
    overlap. THE acceptance gate for shipping an int8/int6/int4 scan path:
    the int8 row ≈ 1.0 licenses the 4x-smaller scan; the int4 row shows
    the cliff.

    Probe side is |query_ids| x |bits| rows → broadcast; the corpus side is
    one map-only pass per bits level — candidate volume is exactly
    |corpus| x |probes| per level (linear in corpus, probes bounded), the
    same cost class as the other exact-baseline ANN faces. Ranks use the
    house rank-membership rule (6dp-rounded cosine, id tiebreak), so rank
    sets are engine-stable."""
    dq = None
    for b in bits:
        d = _dequantized(emb, b, id_col, vec_col)
        dq = d if dq is None else dq.unionByName(d)
    dq = dq.select(
        "bits",
        F.col(id_col),
        "v",
        "deq",
        F.sqrt(_arr_dot(F.col("v"), F.col("v"))).alias("nv"),
        F.sqrt(_arr_dot(F.col("deq"), F.col("deq"))).alias("nd"),
    )
    probes = dq.filter(F.col(id_col).isin(query_ids)).select(
        F.col("bits").alias("qbits"),
        F.col(id_col).alias("query_id"),
        F.col("v").alias("qv"),
        F.col("deq").alias("qdeq"),
        F.col("nv").alias("qnv"),
        F.col("nd").alias("qnd"),
    )
    scored = (
        F.broadcast(probes)
        .join(
            dq.withColumnRenamed(id_col, "neighbor_id"),
            (F.col("qbits") == F.col("bits"))
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .select(
            "bits",
            "query_id",
            "neighbor_id",
            # NULLIF-guarded norms: a zero vector has nv = 0 (and a NULL
            # deq from the quantizer guard) — ANSI mode would abort on
            # the bare division; NULL cosines rank last on both engines
            F.round(
                _arr_dot(F.col("qv"), F.col("v"))
                / F.nullif(F.col("qnv") * F.col("nv"), F.lit(0.0)),
                6,
            ).alias("cos_e"),
            F.round(
                _arr_dot(F.col("qdeq"), F.col("deq"))
                / F.nullif(F.col("qnd") * F.col("nd"), F.lit(0.0)),
                6,
            ).alias("cos_q"),
        )
    )
    we = Window.partitionBy("bits", "query_id").orderBy(
        F.col("cos_e").desc(), F.col("neighbor_id").asc()
    )
    wq = Window.partitionBy("bits", "query_id").orderBy(
        F.col("cos_q").desc(), F.col("neighbor_id").asc()
    )
    ranked = scored.select(
        "bits",
        "query_id",
        F.row_number().over(we).alias("re"),
        F.row_number().over(wq).alias("rq"),
    )
    hit = (F.col("re") <= k) & (F.col("rq") <= k)
    return (
        ranked.filter((F.col("re") <= k) | (F.col("rq") <= k))
        .groupBy("bits", "query_id")
        .agg(F.sum(F.when(hit, 1).otherwise(0)).cast("long").alias("overlap"))
        .select(
            F.col("bits").cast("int").alias("bits"),
            "query_id",
            "overlap",
            F.round(F.col("overlap") / F.lit(k), 6).alias("recall"),
        )
        .orderBy("bits", "query_id")
    )


def kmeans_train(
    emb: DataFrame,
    k: int = 8,
    rounds: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (round, cell, n_members, inertia): the per-round convergence
    ledger of ``rounds`` DISTRIBUTED Lloyd iterations over the full
    embedding table — assign each vector to its nearest centroid, re-mean
    per cell, repeat. Unlike `kmeans_centroids` (a driver-side numpy fit
    on a bounded sample, used to SEED production indexes), this is the
    corpus-scale training loop itself: both stages are relational
    (broadcast-join argmin + per-dimension mean), so it scales to tables
    a driver sample can't represent and its whole fixed-point is
    SQL-mirrorable.

    Engine-portable determinism: seeds are the ``k`` lowest-id vectors
    (the ivf_topk convention) and every updated centroid coordinate is
    rounded to 6dp before the next round — the fixed point is then exact
    arithmetic on both faces instead of an accumulation-order race.
    Empty cells keep their previous centroid. Ties in the argmin break
    (distance asc, cell asc) via struct-min.

    100 TB shape, per round: the argmin is MAP-ONLY — all k centroids
    ride the plan as a literal array<struct<cell,cv>> (k·dim ≤ a few
    thousand doubles fits a plan comfortably) and array_min over a
    transform computes nearest-cell per input row in place; the ONE
    shuffle is a single map-side-combinable (cell, pos) aggregate that
    carries member counts, inertia AND the per-dimension means together
    (≤ k×dim groups), collected to the driver as ≤ k×dim rows per round.
    No vec_id-keyed shuffle, no full-table materialization ever happens
    (r12-opt: the former per-round localCheckpoint pair — assignment +
    centroids — cost 2 full-table jobs per round purely to let two
    aggregations share the assignment; folding stats and means into one
    aggregate removes the second consumer, and collecting the ≤ k×dim
    stats row is the driver-side analog of the broadcast a long-lived
    trainer would publish between rounds). All rounding stays in Spark
    expressions (F.round = HALF_UP) — the driver only ferries already-
    rounded values back as next-round literals, so the training
    trajectory is bit-identical to the checkpointed formulation.
    inertia sums squared L2 of members to their round-START centroid, so
    round 1 is the seed quality and the column is monotone
    non-increasing modulo rounding."""
    v = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    spark = emb.sparkSession
    # seeds: the k lowest-id vectors, coords rounded 6dp IN SPARK
    seed_rows = (
        v.orderBy(F.col("vec_id").asc())
        .limit(k)
        .select(F.transform("v", lambda x: F.round(x, 6)).alias("cv"))
        .collect()
    )
    cents: dict[int, list[float]] = {
        i: list(r["cv"]) for i, r in enumerate(seed_rows)
    }
    out_rows: list[tuple] = []
    for r in range(1, rounds + 1):
        # centroids ride ONE broadcast row rebuilt from the collected
        # stats (createDataFrame of a single pre-sorted array row), NOT a
        # literal array — a literal-laden plan would be rebuilt through
        # py4j (k·dim lit calls) and Janino-recompiled EVERY round
        # (different constants → different generated source), where this
        # plan's shape is round-invariant so codegen caches across
        # rounds. The row is assembled cell-ascending driver-side (the
        # exact order the former sort_array(collect_list(struct)) agg
        # produced), so the broadcast is a LocalTableScan with no
        # per-round aggregation job (r12-opt).
        cents_row = spark.createDataFrame(
            [([(cell, cv) for cell, cv in sorted(cents.items())],)],
            "cs array<struct<cell:int,cv:array<double>>>",
        )
        assign = v.crossJoin(F.broadcast(cents_row)).select(
            "v",
            F.array_min(
                F.transform(
                    "cs",
                    lambda c: F.struct(
                        F.aggregate(
                            F.zip_with(
                                F.col("v"),
                                c["cv"],
                                lambda x, y: (x - y) * (x - y),
                            ),
                            F.lit(0.0),
                            lambda acc, x: acc + x,
                        ).alias("d"),
                        c["cell"].alias("cell"),
                    ),
                )
            ).alias("m"),
        )
        stats = (
            assign.select(
                F.col("m.cell").alias("cell"),
                F.col("m.d").alias("d"),
                F.posexplode("v"),
            )
            .groupBy("cell", "pos")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_members"),
                F.round(F.sum("d"), 6).alias("inertia"),
                F.round(F.avg("col"), 6).alias("val"),
            )
            .collect()
        )
        new_cv: dict[int, dict[int, float]] = {}
        for row in stats:
            new_cv.setdefault(row["cell"], {})[row["pos"]] = row["val"]
            if row["pos"] == 0:
                out_rows.append(
                    (r, row["cell"], row["n_members"], row["inertia"])
                )
        for cell, by_pos in new_cv.items():
            cents[cell] = [by_pos[p] for p in sorted(by_pos)]
    return spark.createDataFrame(
        out_rows, "round int, cell int, n_members long, inertia double"
    ).orderBy("round", "cell")


def ivf_coarse_assign(
    emb: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (id_col, cell): the IVF coarse quantization under the
    deterministic lowest-id-centroid convention every ivf_* operator
    shares — nearest of the ``n_cells`` lowest-id vectors by squared L2,
    ties (d, cell) ascending. One broadcast of n_cells rows + a
    min-struct groupBy; no table-sized exchange."""
    w = Window.orderBy(id_col)
    cents = (
        emb.orderBy(id_col)
        .limit(n_cells)
        .select(
            (F.row_number().over(w) - 1).cast("int").alias("cell"),
            F.col(vec_col).cast("array<double>").alias("cv"),
        )
    )
    return (
        emb.select(id_col, F.col(vec_col).cast("array<double>").alias("v"))
        .join(F.broadcast(cents))
        .withColumn("d", _sqdist("v", "cv"))
        .groupBy(id_col)
        .agg(F.min(F.struct("d", "cell")).alias("mc"))
        .select(id_col, F.col("mc.cell").alias("cell"))
    )


def build_ivf_store(
    emb: DataFrame,
    path: str,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF index as a CELL-PARTITIONED parquet store:
    every vector row lands under its coarse cell's directory
    (``.../cell=<c>/``). This is the write side of the partition-pruning
    claim the ivf search docstrings make — with the store laid out by
    cell, a probed-cell read skips the other cells' files entirely
    (PartitionFilters, asserted in tests/test_plans.py), so candidate
    I/O is n_probe/n_cells of the table instead of a full scan with a
    post-read filter. ``repartition("cell")`` before the write keeps it
    to one file per cell per final task rather than n_tasks × n_cells
    small files."""
    assign = ivf_coarse_assign(emb, n_cells, id_col, vec_col)
    (
        emb.join(assign, id_col)
        .repartition("cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path)
    )


def ivf_store_candidates(spark, path: str, cells) -> DataFrame:
    """Candidate rows for a probed cell set from a cell-partitioned IVF
    store. The isin predicate is a partition filter (directory-level
    skip), never a row filter — the read-side half of build_ivf_store's
    contract."""
    return spark.read.parquet(path).filter(F.col("cell").isin(list(cells)))
