"""Scale-growth smoke: the ingest build and search path on a 10x
replication of the sf0.1 events (1M events -> 1M spans, 15k traces).

Not a micro-benchmark — a SHAPE check under growth: the build must stay
within a small multiple of the 1x wall time (parallelism absorbs the
volume; measured 20x -> <2x wall on local[32]), and the search path must
stay effectively flat (partition pruning + top-k touch only the matching
slice, never the grown table)."""

from __future__ import annotations

import shutil
import tempfile
import time

import pyspark.sql.functions as F
import pytest

from haystack_traces_spark import entry_queries as EQ
from haystack_traces_spark.operators import search as search_ops
from haystack_traces_spark.operators.expression import (
    EQUAL,
    GREATER_THAN,
    ExpressionTree,
    Field,
)
from haystack_traces_spark.operators.index import build_trace_index
from haystack_traces_spark.session import fan_out
from haystack_traces_spark.sources.events import spans_from_events
from haystack_traces_spark.sources.spans import build_trace_store

REPLICATION = 10


@pytest.mark.slow
def test_build_and_search_survive_10x_growth(spark):
    ev = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
    big = (
        ev.crossJoin(spark.range(REPLICATION).withColumnRenamed("id", "rep"))
        .withColumn("user_id", F.col("user_id") + F.col("rep") * 1_000_000)
        .withColumn("event_id", F.col("event_id") + F.col("rep") * 100_000_000)
        .drop("rep")
    )
    tmp = tempfile.mkdtemp(prefix="scale_smoke_")
    spans = None
    try:
        t0 = time.perf_counter()
        spans = spans_from_events(fan_out(big))
        spans.persist()
        build_trace_store(spans).write.mode("overwrite").parquet(f"{tmp}/store")
        idx = build_trace_index(spans, with_partition_cols=True)
        idx.repartition("dt", "hb").write.mode("overwrite").partitionBy(
            "dt", "hb"
        ).parquet(f"{tmp}/index")
        t_build = time.perf_counter() - t0

        trace_index = spark.read.parquet(f"{tmp}/index")
        trace_store = spark.read.parquet(f"{tmp}/store")
        req = search_ops.SearchRequest(
            EQ.T0,
            EQ.T1,
            50,
            ExpressionTree(
                (
                    Field("servicename", "error", EQUAL),
                    Field("duration", EQ.DUR_THRESHOLD, GREATER_THAN),
                )
            ),
        )
        t0 = time.perf_counter()
        assert search_ops.search_traces(trace_index, trace_store, req).count() == 50
        t_search = time.perf_counter() - t0

        plan = (
            search_ops.search_trace_ids(trace_index, req)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "TakeOrderedAndProject" in plan  # top-k, never a global sort
        # generous ceilings (box-load tolerant — the suite may run beside
        # another Spark session): the point is ORDER of magnitude — a
        # linear-in-replication build would be ~80 s on an idle box, a
        # full-scan search ~10 s
        assert t_build < 90, t_build
        assert t_search < 15, t_search
    finally:
        if spans is not None:
            spans.unpersist()
        shutil.rmtree(tmp, ignore_errors=True)


@pytest.mark.slow
def test_dedup_candidate_volume_stays_near_linear_at_10x(spark):
    """Replicating the corpus 10x (with distinct ids per replica) must
    grow MinHash-LSH candidate pairs ~quadratically ONLY within replica
    groups of true near-dups — i.e. bounded by ~replication^2 x the 1x
    count — never corpus-quadratically (the un-capped all-pairs blowup
    would be ~25,000,000 pairs here). Guards the bucketed-candidates +
    occupancy-cap design at growth."""
    from haystack_traces_spark.datapipe.dedup import minhash_candidates

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    n1 = minhash_candidates(docs).count()

    k = 10
    big = (
        docs.crossJoin(spark.range(k).withColumnRenamed("id", "rep"))
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * 1_000_000)
        .drop("rep")
    )
    t0 = time.perf_counter()
    nk = minhash_candidates(big).count()
    t = time.perf_counter() - t0
    # replicas are exact copies, so every cross-replica pair of a 1x
    # candidate collides too: expected ~ k^2 * n1 (plus the replica
    # identity pairs); corpus-quadratic would be ~(5000*10)^2/2.
    assert nk <= (k * k) * n1 + (k * k) * big.count() / k, (n1, nk)
    assert t < 240, t  # order-of-magnitude guard, load-tolerant


@pytest.mark.slow
def test_asof_join_growth_is_near_linear(spark):
    """The as-of linearization must scale like its ONE keyed window:
    replicating the key space 10x (10x rows, same per-key history) must
    grow wall time by far less than 10x on local[32], and the output
    must stay exactly per-key (replicas get identical attributions)."""
    from haystack_traces_spark.operators.asof import asof_join

    base_n = 20_000
    left1 = spark.range(base_n).select(
        (F.col("id") % 500).alias("k"), (F.col("id") * 7 % 10_000).alias("lts")
    )
    right1 = spark.range(base_n).select(
        (F.col("id") % 500).alias("k"), (F.col("id") * 11 % 10_000).alias("rts")
    )

    def run(rep, collect=False):
        reps = spark.range(rep).withColumnRenamed("id", "rep")
        l = left1.crossJoin(reps).withColumn(
            "k", F.col("k") + F.col("rep") * 1_000
        ).drop("rep")
        r = right1.crossJoin(reps).withColumn(
            "k", F.col("k") + F.col("rep") * 1_000
        ).drop("rep")
        joined = asof_join(
            l, r, on=["k"], left_ts="lts", right_ts="rts", value_cols=["rts"]
        )
        t0 = time.time()
        n = joined.count()
        dt = time.time() - t0
        return (n, dt, joined) if collect else (n, dt)

    n1, t1 = run(1)
    n10, t10, joined10 = run(10, collect=True)
    assert n1 == base_n and n10 == 10 * base_n
    # per-key isolation: every replica's attributions are the base
    # replica's, shifted — a window that dropped the key from its
    # partition would leak history across replicas
    from collections import Counter

    all_reps = Counter(
        (row["k"] % 1_000, row["lts"], row["rts"])
        for row in joined10.filter(F.col("k") % 1_000 < 5).collect()
    )
    base_rep = Counter(
        (row["k"], row["lts"], row["rts"])
        for row in joined10.filter(F.col("k") < 5).collect()
    )
    # every replica reproduces the base replica's attribution multiset
    assert all_reps == Counter(
        {key: 10 * n for key, n in base_rep.items()}
    )
    # generous ceiling for a loaded box: 10x rows must stay well under
    # 6x wall (measured ~1.5-2x on idle local[32])
    assert t10 < max(6 * t1, 10.0), (t1, t10)


@pytest.mark.slow
def test_exact_dedup_family_scales_linearly_with_distinct_content(spark):
    """10x corpus growth with DISTINCT content (per-replica token
    injection makes replicas shingle-disjoint): the EXACT-complete pair
    operators (ppjoin n-gram Jaccard, prefix-filtered containment) must
    find exactly 10x the single-replica pairs — candidate generation
    scales with rare-shingle CO-OCCURRENCE, never corpus² — and the
    wall time must stay within a small multiple of 1x."""
    from haystack_traces_spark.datapipe import dedup as D
    from haystack_traces_spark.session import release_materialized

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    reps = spark.range(10).withColumnRenamed("id", "rep")
    big = (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"),
            # inject a replica marker between every word: shingles become
            # replica-disjoint while each replica stays isomorphic to the
            # others (same token structure, renamed marker)
            F.regexp_replace(
                "text", " ", F.concat(F.lit(" x"), F.col("rep"), F.lit(" "))
            ).alias("text"),
        )
    )
    base = big.filter(F.col("doc_id") < 1_000_000)

    t0 = time.perf_counter()
    base_jac = D.ngram_jaccard_pairs(base, 0.8).count()
    base_cont = D.containment_pairs(base, 0.9).count()
    release_materialized()
    t_base = time.perf_counter() - t0

    t0 = time.perf_counter()
    full_jac = D.ngram_jaccard_pairs(big, 0.8).count()
    full_cont = D.containment_pairs(big, 0.9).count()
    release_materialized()
    t_full = time.perf_counter() - t0

    # exact-complete operators on isomorphic disjoint replicas: the pair
    # set is exactly 10 copies of the single-replica pair set
    assert full_jac == 10 * base_jac
    assert full_cont == 10 * base_cont
    # shape: 10x data within a small multiple of 1x wall (generous
    # ceiling for box-load variance; the failure mode being guarded is
    # quadratic candidate blowup, which would be 50-100x)
    assert t_full <= max(8 * t_base, 60), (t_base, t_full)


@pytest.mark.slow
def test_neardup_family_candidate_growth_at_10x(spark):
    """VERDICT r5 ask #6 — candidate-VOLUME growth for the near-dup
    family (the sf0.1 measured rows live in SCALE.md §6):

    * containment: replica-DISJOINT 10x growth → candidates exactly 10x
      (prefix-filter join volume is Σ df over prefix occurrences — df is
      per-shingle, so disjoint content adds, never multiplies).
    * kNN-graph LSH: IDENTICAL replicas (worst case — every replica
      collides with every other) → replica-quadratic ~k² x base, never
      more; and a cap dialed below the hottest 10x bucket ENGAGES,
      bounds the volume, and reports its drops via last_cap_stats."""
    from haystack_traces_spark.datapipe import caps
    from haystack_traces_spark.datapipe import dedup as D
    from haystack_traces_spark.datapipe import similarity as S
    from haystack_traces_spark.session import release_materialized

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    reps = spark.range(10).withColumnRenamed("id", "rep")

    # ---- containment: replica-disjoint content, exact 10x linearity ----
    big_docs = docs.crossJoin(reps).select(
        (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"),
        F.regexp_replace(
            "text", " ", F.concat(F.lit(" x"), F.col("rep"), F.lit(" "))
        ).alias("text"),
    )
    base_docs = big_docs.filter(F.col("doc_id") < 1_000_000)
    try:
        c1 = D.containment_candidates(
            D.materialize(D.shingle_rows(base_docs, "text", 3)), 0.9
        ).count()
        release_materialized()
        c10 = D.containment_candidates(
            D.materialize(D.shingle_rows(big_docs, "text", 3)), 0.9
        ).count()
        assert c10 == 10 * c1, (c1, c10)
    finally:
        release_materialized()

    # ---- kNN LSH: identical replicas, replica-quadratic bound ----
    big_emb = (
        emb.crossJoin(reps)
        .withColumn("vec_id", F.col("vec_id") + F.col("rep") * 1_000_000)
        .drop("rep")
    )
    # planes pinned to the old fixed default: this section measures the
    # FIXED-geometry worst case (auto-planes linearity has its own test)
    try:
        k1 = S.lsh_candidate_pairs(emb, planes_per_table=5).count()
        release_materialized()
        k10 = S.lsh_candidate_pairs(big_emb, planes_per_table=5).count()
        release_materialized()
        n_vec10 = big_emb.count()
        # every 1x candidate replicates 10x10 ways + replica-identity
        # pairs; corpus-quadratic would be ~n_vec10² = 4x10⁶ x per-table
        assert k10 <= 100 * k1 + 10 * 9 * (n_vec10 // 10), (k1, k10)

        # ---- cap engages at growth and reports its drops ----
        occ_max = (
            S.hyperplane_buckets(big_emb, planes_per_table=5)
            .groupBy("table", "bucket")
            .count()
            .agg(F.max("count"))
            .first()[0]
        )
        cap = max(1, int(occ_max * 0.6))
        k_capped = S.lsh_candidate_pairs(
            big_emb, planes_per_table=5, max_bucket=cap
        ).count()
        stats = dict(caps.last_cap_stats["lsh_knn_graph"])
        assert stats["n_buckets_dropped"] > 0, stats
        assert stats["n_rows_dropped"] >= cap + 1, stats
        assert k_capped < k10, (k_capped, k10)
    finally:
        release_materialized()


def test_auto_planes_hold_candidate_volume_near_linear_at_10x(spark):
    """VERDICT r8 ask #2: planes_per_table=None derives
    p ≈ log2(n/occupancy) (S.derive_planes), so per-bucket occupancy —
    and with it per-vector candidate volume — holds as the corpus grows.
    10x growth via per-replica deterministic sign flips (a diagonal
    isometry: within-replica geometry identical, cross-replica cosines
    pseudo-random ≈ 0 — the embedding analog of token-prefixing, rule 16).
    Fixed planes at this growth measured corpus-quadratic candidates /
    27x wall (SCALE.md §2 r8); derived planes must keep the 10x candidate
    count near 10x the base, not 100x."""
    from haystack_traces_spark.datapipe import similarity as S
    from haystack_traces_spark.session import release_materialized

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    n1 = emb.count()
    # the derived dial must move with the corpus (occupancy held)
    assert S.derive_planes(n1) < S.derive_planes(10 * n1)

    reps = spark.range(10).withColumnRenamed("id", "rep")
    flip = F.transform(
        "embedding",
        lambda x, i: F.when(
            F.pmod(F.hash(F.col("rep"), i), F.lit(2)) == 0, x
        ).otherwise(-x),
    )
    big_emb = emb.crossJoin(reps).select(
        (F.col("vec_id") + F.col("rep") * 1_000_000).alias("vec_id"),
        flip.alias("embedding"),
    )
    try:
        k1 = S.lsh_candidate_pairs(emb).count()
        release_materialized()
        k10 = S.lsh_candidate_pairs(big_emb).count()
    finally:
        release_materialized()
    # near-linear: the derived p quantizes to powers of two, so the ratio
    # wobbles around 10x — but it must stay O(n), nowhere near the ~100x
    # a fixed-p corpus-quadratic blowup produces on this growth
    assert k10 <= 30 * k1, (k1, k10)
    assert k10 >= 2 * k1, (k1, k10)


def _run_ingest_soak(spark, tmp_path, n_batches=20):
    """>=n_batches consecutive micro-batches through the FULL
    IngestTopology; returns {batchId: (rows, ms, state_rows)}."""
    import time as _t

    from haystack_traces_spark.sources.events import spans_from_events
    from haystack_traces_spark.session import fan_out
    from haystack_traces_spark.streaming.ingest import SPAN, IngestTopology

    spans = spans_from_events(
        fan_out(spark.read.parquet("/root/testdata/sf0.01/events.parquet"))
    )
    src_dir = str(tmp_path / "src")
    spans.select(*[f.name for f in SPAN.fields]).repartition(
        n_batches + 2
    ).write.json(src_dir)
    src = (
        spark.readStream.schema(SPAN)
        .option("maxFilesPerTrigger", 1)
        .json(src_dir)
    )
    topo = IngestTopology(str(tmp_path / "tables"), window_ms=10_000)
    q = topo.start(src, str(tmp_path / "ckpt"), trigger_sec=1)
    prog: dict[int, tuple[int, int, int]] = {}
    deadline = _t.time() + 300
    try:
        while _t.time() < deadline:
            for p in q.recentProgress:
                if p.get("numInputRows"):
                    prog[p["batchId"]] = (
                        p["numInputRows"],
                        p["durationMs"]["triggerExecution"],
                        sum(
                            s.get("numRowsTotal", 0)
                            for s in p.get("stateOperators") or []
                        ),
                    )
            if len(prog) >= n_batches:
                break
            _t.sleep(2)
    finally:
        q.stop()
    return prog


def _assert_soak_flat_and_bounded(prog, n_batches=20):
    assert len(prog) >= n_batches, f"only {len(prog)} data batches ran"
    ms = [v[1] for _, v in sorted(prog.items())]
    mid5 = sum(ms[8:13]) / 5
    last5 = sum(ms[-5:]) / 5
    assert last5 <= 3 * mid5, (mid5, last5, ms)
    # state bounded by open traces, far below total span volume
    n_spans = sum(v[0] for v in prog.values())
    assert max(v[2] for v in prog.values()) < n_spans / 2, (
        max(v[2] for v in prog.values()), n_spans)


@pytest.mark.slow
def test_sessionizer_soak_20_batches_flat_and_bounded(spark, tmp_path):
    """VERDICT r5 ask #8 (suite-sized pin of the SCALE.md §6 soak): >=20
    consecutive micro-batches through the FULL IngestTopology — state
    rows bounded, and batch wall time FLAT (last-5 average within 3x the
    middle-5 average; growth-with-batch-count would compound past that)."""
    _assert_soak_flat_and_bounded(_run_ingest_soak(spark, tmp_path))


@pytest.mark.slow
def test_sessionizer_soak_rocksdb_state_store(spark, tmp_path):
    """VERDICT r6 ask #4: the same soak on Spark's in-box
    RocksDBStateStoreProvider — the provider SCALE.md prescribes for
    cluster state. Same flat-and-bounded contract, same state-row count
    as the HDFS-backed default (the provider changes storage, not
    semantics); conf restored so other tests keep the default."""
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        prog = _run_ingest_soak(spark, tmp_path)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    _assert_soak_flat_and_bounded(prog)
