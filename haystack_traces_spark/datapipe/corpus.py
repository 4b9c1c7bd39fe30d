"""Corpus-preparation operators a large-scale training-data pipeline needs
beyond dedup/similarity: deterministic dataset splits, benchmark
decontamination, tokenizer-vocabulary coverage, token-budget shard packing,
and PII scanning. All pure Column expressions (zero Python in the loop) with
exact DuckDB oracle mirrors.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from haystack_traces_spark.datapipe.hashing import (
    hash60,
    ordered_word_shingles,
    word_shingles,
)

# ---------------------------------------------------------------- splits --

DEFAULT_SPLITS = (("train", 0.90), ("val", 0.05), ("test", 0.05))


def _split_case(bucket, splits: tuple):
    """The ONE bucket→split-name mapping (contiguous int(w*10000) ranges,
    rounding remainder → last split) shared by every split variant — a
    boundary change applied here cannot diverge the plain and
    duplicate-aware splits."""
    expr = None
    lo = 0
    for name, w in splits:
        hi = lo + int(w * 10000)
        cond = bucket < F.lit(hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    return expr.otherwise(splits[-1][0])


def _split_case_sql(splits: tuple) -> str:
    """DuckDB twin of :func:`_split_case` (a CASE over the same ranges)."""
    lo, cases = 0, []
    for name, w in splits:
        hi = lo + int(w * 10000)
        cases.append(f"WHEN bucket < {hi} THEN '{name}'")
        lo = hi
    return f"CASE {' '.join(cases)} ELSE '{splits[-1][0]}' END"


def split_assign(
    docs: DataFrame,
    splits: tuple = DEFAULT_SPLITS,
    seed: str = "split:",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (doc_id, bucket, split): deterministic train/val/test assignment.

    bucket = hash60(seed || id) % 10000 — a pure per-row expression, so the
    assignment is reproducible across engines/runs/cluster sizes and stable
    under re-partitioning (the property random() splits lack). Weights map to
    contiguous bucket ranges. No shuffle at any scale."""
    bucket = hash60(F.col(id_col).cast("string"), seed=seed) % 10000
    return docs.select(
        id_col,
        bucket.cast("long").alias("bucket"),
        _split_case(bucket, splits).alias("split"),
    )


def sql_split_assign(splits: tuple = DEFAULT_SPLITS, seed: str = "split:") -> str:
    from haystack_traces_spark.datapipe.hashing import hash60_sql

    b = f"{hash60_sql('CAST(doc_id AS VARCHAR)', seed=seed)} % 10000"
    return f"""
SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
       {_split_case_sql(splits)} AS split
FROM (SELECT doc_id, {b} AS bucket FROM documents)
"""


def leakage_safe_split(
    docs: DataFrame,
    clusters: DataFrame,
    splits: tuple = DEFAULT_SPLITS,
    seed: str = "split:",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (doc_id, group_id, bucket, split): DUPLICATE-AWARE train/val/test
    assignment — every member of a near-dup cluster hashes on the
    cluster's CANONICAL id, so duplicates can never straddle the
    train/test boundary (the classic eval-leakage hole a per-doc hash
    split leaves open: the test answer sits in train as a near-copy).
    Singletons hash on their own id, identical to :func:`split_assign`.

    ``clusters`` is `dup_clusters` output (doc_id, cluster). One left
    join + the same pure-expression bucketing — no extra shuffle beyond
    the cluster map, which near-dup dedup already computed. group_id is
    emitted as STRING: the id_col contract is type-generic (string ids
    hash fine), and a numeric cast would silently NULL non-numeric
    groups."""
    group = F.coalesce(
        F.col("cluster").cast("string"), F.col(id_col).cast("string")
    ).alias("group_id")
    based = docs.select(id_col).join(clusters, id_col, "left").select(
        id_col, group
    )
    bucket = hash60(F.col("group_id"), seed=seed) % 10000
    return based.select(
        id_col,
        "group_id",
        bucket.cast("long").alias("bucket"),
        _split_case(bucket, splits).alias("split"),
    )


# -------------------------------------------------------- decontamination --

def decontaminate(
    docs: DataFrame,
    probes: DataFrame,
    n: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, n_hits, contaminated): benchmark-overlap scan.

    A doc is contaminated when it shares ≥1 word n-gram with the probe
    (benchmark/eval) corpus — the standard train/test leakage gate. The
    probe shingle set is the SMALL side: distinct + broadcast, so the
    corpus-side scan is one map-side semi-match with no shuffle of the
    corpus; per-doc hit count = intersection size of its shingle set with
    the probe set (array_intersect against the broadcast-collected set
    would bloat the plan — the explode+join form lets Catalyst broadcast)."""
    probe_sh = (
        probes.select(F.explode(word_shingles(text_col, n)).alias("s")).distinct()
    )
    doc_sh = docs.select(
        "doc_id", F.explode(word_shingles(text_col, n)).alias("s")
    )
    hits = (
        doc_sh.join(F.broadcast(probe_sh), "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def decontaminate_neardup(
    docs: DataFrame,
    probes: DataFrame,
    n_seeds: int | None = None,
    bands: int | None = None,
    n: int = 3,
) -> DataFrame:
    """→ (doc_id, n_bands_hit, contaminated): NEAR-dup decontamination —
    flag training docs whose MinHash-LSH band keys collide with any
    benchmark/probe doc's bands. The exact-shingle gate
    (:func:`decontaminate`) misses lightly-edited benchmark copies
    (punctuation/casing tweaks, one-word paraphrases); band collision is
    the same signal the near-dup dedup family uses, applied train→probe.

    Scale shape: the probe band set is tiny (benchmarks are small) —
    distinct + broadcast, so the corpus-side pass is one map-side join on
    the band key with no corpus shuffle; ``n_bands_hit`` counts DISTINCT
    colliding bands (max = bands), a crude confidence score."""
    from haystack_traces_spark.datapipe.dedup import (
        DEFAULT_BANDS,
        DEFAULT_MINHASH_SEEDS,
        minhash_band_rows,
    )

    n_seeds = n_seeds or DEFAULT_MINHASH_SEEDS
    bands = bands or DEFAULT_BANDS
    rpb = n_seeds // bands
    key = ["band", *(f"v{j}" for j in range(rpb))]
    tb = minhash_band_rows(docs, n_seeds, bands, n)
    pb = minhash_band_rows(probes, n_seeds, bands, n).select(*key).distinct()
    hits = (
        tb.join(F.broadcast(pb), key)
        .groupBy("doc_id")
        .agg(F.countDistinct("band").alias("n_bands_hit"))
    )
    return (
        docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bands_hit", F.lit(0)).cast("long").alias("n_bands_hit"),
            (F.coalesce("n_bands_hit", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def dsir_weights(
    train: DataFrame,
    target: DataFrame,
    n_buckets: int = 64,
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, n_tokens, log_weight): DSIR-style importance weights
    (Xie et al. 2023, "Data Selection for Language Models via Importance
    Resampling") under a hashed unigram feature model: every lowercased
    token hashes into one of ``n_buckets`` feature buckets; the target
    (benchmark/domain) and raw (training) corpora each induce a
    Laplace-smoothed bucket distribution, and a doc's log weight is the
    summed log-likelihood ratio of its tokens' buckets. Resampling by
    ``exp(log_weight)`` (or ranking by it) tilts the raw corpus toward the
    target domain.

    Scale shape: both distributions are ``n_buckets``-row aggregates
    (map-side combinable) — broadcast; the per-doc pass is one explode +
    broadcast join + sum keyed by doc_id. No shuffle wider than the
    doc-level aggregate, target corpus never rides an exchange."""
    B = n_buckets

    def buckets(docs):
        return docs.select(
            "doc_id",
            F.explode(
                F.transform(F.split(F.col(text_col), " "), lambda w: F.lower(w))
            ).alias("w"),
        ).select("doc_id", F.pmod(hash60("w", seed="dsir:"), F.lit(B)).alias("b"))

    tb = buckets(train)
    gb = buckets(target)
    # tiny (≤ B rows) distributions; the log-ratio is computed ONCE per
    # bucket, so the per-token work is a lookup + add. Totals are window
    # SUMs over the ≤ B-row joined distribution (each side's bucket key is
    # unique, so the full join preserves every count exactly once and the
    # window total equals the per-side aggregate) — separate total
    # aggregates cross-joined back re-render each token-explode subtree per
    # branch (executed 2x each, no ReusedExchange; plan receipt: 9 → 6
    # scans, 20 → 16 Exchanges), and the whole weight table stays one lazy
    # plan either way.
    t_dist = gb.groupBy("b").agg(F.count(F.lit(1)).alias("ct"))
    r_dist = tb.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    w_all = Window.partitionBy()
    ratio = (
        r_dist.join(t_dist, "b", "full")
        .select(
            "b",
            "ct",
            "cr",
            F.sum("ct").over(w_all).alias("tt"),
            F.sum("cr").over(w_all).alias("rt"),
        )
        .select(
            "b",
            F.log(
                ((F.coalesce("ct", F.lit(0)) + 1) / (F.col("tt") + B))
                / ((F.coalesce("cr", F.lit(0)) + 1) / (F.col("rt") + B))
            ).alias("lr"),
        )
    )
    return (
        tb.join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(F.sum("lr"), 6).alias("log_weight"),
        )
    )


def decontaminate_semantic(
    train_emb: DataFrame,
    probe_emb: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (vec_id, max_cos, contaminated): EMBEDDING-space decontamination —
    flag training vectors whose cosine against ANY benchmark/probe vector
    reaches ``threshold``. Completes the decontamination triad: exact
    shingles (:func:`decontaminate`) catch copies, MinHash bands
    (:func:`decontaminate_neardup`) catch edits, and this catches
    PARAPHRASES — same meaning, different words — the other two are blind
    to.

    Scale shape: the probe matrix is a broadcast (benchmarks are small);
    each Arrow batch of the training side scores against all probes as ONE
    numpy GEMM and emits only (id, max_cos) — the train side never
    shuffles and the output is one row per train vector. The contaminated
    flag compares the ROUNDED cosine (house cross-engine float rule)."""
    import numpy as np

    spark = train_emb.sparkSession
    p_pdf = probe_emb.select(id_col, vec_col).toPandas()
    P = np.asarray(p_pdf[vec_col].tolist(), dtype=np.float64)
    Pn = P / np.linalg.norm(P, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast(Pn)

    def score(batches):
        import pandas as pd

        Pn_ = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            An = A / np.linalg.norm(A, axis=1, keepdims=True)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(dtype=np.int64),
                    "max_cos": (An @ Pn_.T).max(axis=1),
                }
            )

    scored = train_emb.select(id_col, vec_col).mapInPandas(
        score, schema=f"{id_col} long, max_cos double"
    )
    return scored.select(
        id_col,
        F.round("max_cos", 6).alias("max_cos"),
        (F.round("max_cos", 6) >= threshold).alias("contaminated"),
    )


# ------------------------------------------------------ vocabulary cover --

def vocab_coverage(
    docs: DataFrame, vocab_size: int = 100, text_col: str = "text"
) -> DataFrame:
    """→ (doc_id, n_tokens, in_vocab, oov_rate): per-doc coverage against
    the corpus top-``vocab_size`` vocabulary (tokenizer-fit proxy).

    Two passes: the vocabulary is a tiny top-N aggregate (broadcast); the
    coverage pass is then map-side only. Tie order in the vocabulary cut is
    (count desc, token asc) — deterministic."""
    from haystack_traces_spark.datapipe.text import token_histogram

    vocab = token_histogram(docs, vocab_size, text_col).select("token")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.transform(F.split(F.col(text_col), " "), lambda w: F.lower(w))
        ).alias("token"),
    )
    per_doc = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tokens"))
    in_vocab = (
        toks.join(F.broadcast(vocab), "token")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("in_vocab"))
    )
    return (
        per_doc.join(in_vocab, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce("in_vocab", F.lit(0)).cast("long").alias("in_vocab"),
            F.round(
                1.0 - F.coalesce("in_vocab", F.lit(0)) / F.col("n_tokens"), 6
            ).alias("oov_rate"),
        )
    )


# --------------------------------------------------------- shard packing --

def pack_grouped(
    docs: DataFrame, n_groups: int = 8, text_col: str = "text"
) -> DataFrame:
    """-> (doc_id, pack_group, n_tokens): THE pack-group assignment and
    token counting under the shipped packing — one definition shared by
    pack_shards and packing_waste_curve, so the waste curve always
    prices the packing the pipeline actually ships (seed, group count,
    and token rule cannot drift apart)."""
    n_tokens = F.size(F.split(F.col(text_col), " ")).cast("long")
    return docs.select(
        "doc_id",
        (hash60(F.col("doc_id").cast("string"), seed="pack:") % n_groups)
        .cast("long")
        .alias("pack_group"),
        n_tokens.alias("n_tokens"),
    )


def sql_pack_grouped(n_groups: int = 8) -> str:
    """DuckDB mirror of :func:`pack_grouped` — a full SELECT over
    ``documents`` (drop into a CTE)."""
    from haystack_traces_spark.datapipe.hashing import hash60_sql

    g = f"{hash60_sql('CAST(doc_id AS VARCHAR)', seed='pack:')} % {n_groups}"
    return (
        f"SELECT doc_id, {g} AS pack_group,\n"
        "         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens\n"
        "  FROM documents"
    )


def pack_shards(
    docs: DataFrame,
    token_budget: int = 2000,
    n_groups: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, pack_group, n_tokens, shard): token-budget shard
    assignment (the "fill ~N-token training files" step).

    Docs hash into ``n_groups`` independent pack groups; within a group a
    running token total (deterministic doc_id order) is chunked every
    ``token_budget`` tokens: shard = floor(exclusive-cumsum / budget). The
    group dimension is what scales — packing is inherently sequential, so
    the sequential window runs per group, never globally (one bounded-width
    window per group vs a single-reducer global sort). A doc longer than
    the budget gets its own shard(s) boundary — chunking is by running
    total, docs are never split."""
    grouped = pack_grouped(docs, n_groups, text_col)
    w = (
        Window.partitionBy("pack_group")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w) - F.col("n_tokens")  # exclusive cumsum
    return grouped.select(
        "doc_id",
        "pack_group",
        "n_tokens",
        F.floor(cum / token_budget).cast("long").alias("shard"),
    )


def sql_pack_shards(token_budget: int = 2000, n_groups: int = 8) -> str:
    from haystack_traces_spark.datapipe.hashing import hash60_sql

    g = f"{hash60_sql('CAST(doc_id AS VARCHAR)', seed='pack:')} % {n_groups}"
    return f"""
WITH grouped AS (
  SELECT doc_id, {g} AS pack_group,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT doc_id, CAST(pack_group AS BIGINT) AS pack_group, n_tokens,
       CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY pack_group ORDER BY doc_id
                    ROWS UNBOUNDED PRECEDING) - n_tokens) / {token_budget}) AS BIGINT) AS shard
FROM grouped
"""


# ------------------------------------------------------- duplication rate --

def dup_ngram_rate(docs: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """→ (doc_id, n_shingles, n_repeated, dup_rate): fraction of a doc's
    n-grams that occur in ANY other document — the per-document duplication
    signal used to rank removal candidates (finer than pair output: a doc
    30% covered by boilerplate scores 0.3 even if no single pair crosses a
    Jaccard threshold).

    Two aggregations over the shingle rows (per-shingle doc frequency, then
    per-doc rollup) — both map-side combinable; nothing quadratic."""
    sh = docs.select("doc_id", F.explode(word_shingles(text_col, n)).alias("s"))
    dfreq = sh.groupBy("s").agg(F.count_distinct("doc_id").alias("df"))
    per_doc = (
        sh.join(dfreq, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.when(F.col("df") > 1, 1).otherwise(0)).alias("n_repeated"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
            F.coalesce("n_repeated", F.lit(0)).cast("long").alias("n_repeated"),
            F.when(
                F.coalesce("n_shingles", F.lit(0)) > 0,
                F.round(F.col("n_repeated") / F.col("n_shingles"), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_rate"),
        )
    )


# ------------------------------------------------------- source rollup ----

def source_quality(docs: DataFrame) -> DataFrame:
    """→ per-``source`` corpus-health rollup: doc/token volume, mean quality,
    exact-duplicate rate — the dashboard a data curator reads before
    deciding which sources to keep, reweight, or drop. One groupBy over
    per-doc features (map-side combinable)."""
    from haystack_traces_spark.datapipe.text import text_stats

    feats = text_stats(docs).select("doc_id", "n_tokens", "quality_score")
    base = docs.select("doc_id", "source", F.md5("text").alias("h"))
    return (
        base.join(feats, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("quality_score"), 6).alias("mean_quality"),
            F.round(
                1 - F.count_distinct("h") / F.count(F.lit(1)), 6
            ).alias("exact_dup_rate"),
        )
        .orderBy("source")
    )


# --------------------------------------------------- within-doc repetition --

def repetition_stats(docs: DataFrame, n: int = 2, text_col: str = "text") -> DataFrame:
    """→ (doc_id, n_grams, n_distinct_grams, top_gram_frac, dup_gram_frac):
    WITHIN-document n-gram repetition — the Gopher-style repetition filter
    (docs dominated by one repeated phrase, or with a high fraction of
    repeated n-grams, are generation/boilerplate artifacts). Complements
    `dup_ngram_rate`, which measures CROSS-document duplication.

    Shuffle discipline: explode → one (doc_id, gram) count (map-side
    combinable, key cardinality ≤ total gram occurrences) → one per-doc
    rollup on the already-reduced rows. Nothing quadratic, no windows."""
    grams = docs.select(
        "doc_id", F.explode(ordered_word_shingles(text_col, n)).alias("g")
    )
    per_gram = grams.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
    per_doc = per_gram.groupBy("doc_id").agg(
        F.sum("c").alias("n_grams"),
        F.count(F.lit(1)).alias("n_distinct_grams"),
        F.max("c").alias("top_c"),
    )
    n_grams = F.coalesce("n_grams", F.lit(0))
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            n_grams.cast("long").alias("n_grams"),
            F.coalesce("n_distinct_grams", F.lit(0))
            .cast("long")
            .alias("n_distinct_grams"),
            F.when(n_grams > 0, F.round(F.col("top_c") / n_grams, 6))
            .otherwise(F.lit(0.0))
            .alias("top_gram_frac"),
            F.when(
                n_grams > 0,
                F.round((n_grams - F.col("n_distinct_grams")) / n_grams, 6),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_gram_frac"),
        )
    )


# ----------------------------------------------------- stratified sampling --

def stratified_sample(
    docs: DataFrame,
    per_stratum: int = 10,
    seed: str = "strat:",
    id_col: str = "doc_id",
    stratum_col: str = "source",
) -> DataFrame:
    """→ the sampled docs (doc_id, source): deterministic rate-based
    stratified sampling — keep ~``per_stratum`` docs from each stratum
    regardless of stratum size (the per-domain quota step of corpus
    construction).

    Each stratum's keep-threshold is floor(1e6·quota/|stratum|), clamped to
    1e6; a doc survives when hash60(seed‖id) % 1e6 falls below it. Rate
    sampling (expected quota, binomial spread) rather than exact-rank:
    exact top-k-per-stratum needs a per-stratum sort, rate needs only a
    tiny count aggregate broadcast back — one scan, no window, no skew
    sensitivity, and membership is stable when the corpus grows (a doc's
    fate never depends on other docs' hashes)."""
    counts = docs.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("n_s"))
    key = hash60(F.col(id_col).cast("string"), seed=seed) % 1_000_000
    thresh = F.least(
        F.lit(1_000_000).cast("long"),
        F.floor(F.lit(1_000_000 * per_stratum) / F.col("n_s")),
    )
    return (
        docs.select(id_col, stratum_col)
        .join(F.broadcast(counts), stratum_col)
        .filter(key < thresh)
        .select(id_col, stratum_col)
    )


def sql_stratified_sample(per_stratum: int = 10, seed: str = "strat:") -> str:
    from haystack_traces_spark.datapipe.hashing import hash60_sql

    key = f"{hash60_sql('CAST(doc_id AS VARCHAR)', seed=seed)} % 1000000"
    return f"""
WITH counts AS (SELECT source, COUNT(*) AS n_s FROM documents GROUP BY source)
SELECT d.doc_id, d.source
FROM documents d JOIN counts USING (source)
WHERE {key} < LEAST(1000000, CAST(FLOOR({1_000_000 * per_stratum} / n_s) AS BIGINT))
"""


# -------------------------------------------------------- source mixing ----

def mix_weights(
    docs: DataFrame,
    alpha: float = 0.5,
    budget: int = 100_000,
    stratum_col: str = "source",
) -> DataFrame:
    """→ (source, n_docs, share, weight, expected_docs): temperature-based
    source mixing — weight ∝ share^α normalized (α<1 upsamples small
    sources, α=1 is natural, α=0 uniform), the standard domain-reweighting
    recipe for assembling a training mix.

    One tiny groupBy, then global windows over the AGGREGATED table only
    (cardinality = #sources, never #docs) — scale-independent."""
    w = Window.partitionBy()
    agg = docs.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("n_docs"))
    shared = agg.select(
        stratum_col,
        "n_docs",
        (F.col("n_docs") / F.sum("n_docs").over(w)).alias("share_raw"),
    ).select(
        stratum_col,
        "n_docs",
        "share_raw",
        F.pow("share_raw", F.lit(alpha)).alias("w_raw"),
    )
    return shared.select(
        stratum_col,
        F.col("n_docs").cast("long").alias("n_docs"),
        F.round("share_raw", 6).alias("share"),
        F.round(F.col("w_raw") / F.sum("w_raw").over(w), 6).alias("weight"),
        F.floor(
            F.round(F.col("w_raw") / F.sum("w_raw").over(w), 6) * budget
        )
        .cast("long")
        .alias("expected_docs"),
    ).orderBy(stratum_col)


def sql_mix_weights(alpha: float = 0.5, budget: int = 100_000) -> str:
    return f"""
WITH agg AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
shared AS (
  SELECT source, n_docs,
         n_docs / SUM(n_docs) OVER () AS share_raw,
         POW(n_docs / SUM(n_docs) OVER (), {alpha}) AS w_raw
  FROM agg
)
SELECT source,
       CAST(n_docs AS BIGINT) AS n_docs,
       ROUND(share_raw, 6) AS share,
       ROUND(w_raw / SUM(w_raw) OVER (), 6) AS weight,
       CAST(FLOOR(ROUND(w_raw / SUM(w_raw) OVER (), 6) * {budget}) AS BIGINT)
         AS expected_docs
FROM shared
ORDER BY source
"""


def _tempered_weight(w: Window, raw_col: str = "w_raw"):
    """The ONE normalized-temperature-weight column (rule 19):
    6dp-rounded share of ``raw_col`` within the window. Consumed by
    :func:`_recipe_cols` and :func:`mix_dedup_shift`'s two branches."""
    return F.round(F.col(raw_col) / F.sum(raw_col).over(w), 6)


def _recipe_cols(w: Window, token_budget: int):
    """The ONE weight → target-tokens construction (rule 19): weight =
    :func:`_tempered_weight`, target = floor(weight·budget). Shared by
    :func:`epoch_plan` (global window) and :func:`mix_temperature_sweep`
    (per-α window) so the recipe a sweep row advertises for an α can
    never drift from the plan actually shipped for that α (review r9
    finding)."""
    weight = _tempered_weight(w)
    target = F.floor(weight * token_budget).cast("long")
    return weight, target


def sql_weight_expr(partition: str = "") -> str:
    """Oracle twin of _recipe_cols' weight column; ``partition`` is the
    window clause body ('' for the global recipe, 'PARTITION BY
    alpha_pct' for the sweep)."""
    return f"ROUND(w_raw / SUM(w_raw) OVER ({partition}), 6)"


def sql_recipe_select(budget: int) -> str:
    """Oracle twin of _recipe_cols' target + epochs columns, projected
    over a CTE exposing (n_tokens, weight)."""
    return (
        f"CAST(FLOOR(weight * {budget}) AS BIGINT) AS target_tokens,\n"
        f"       ROUND(CAST(FLOOR(weight * {budget}) AS BIGINT)"
        f" / CAST(n_tokens AS DOUBLE), 6) AS epochs"
    )


def epoch_plan(
    docs: DataFrame,
    token_budget: int = 1_000_000,
    alpha: float = 0.5,
    stratum_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """→ (source, n_tokens, weight, target_tokens, epochs): the data
    RECIPE — given a training token budget and temperature-mixing weights
    (weight ∝ token-share^α), how many tokens each source contributes and
    how many EPOCHS (passes, >1 = repetition) of that source that implies.
    The "repeat small domains how many times?" planning question every mix
    design answers before any sampling job runs (epochs ≫ 4-5 flags a
    source the budget will over-repeat, per the usual repetition-harm
    guidance).

    Token-share based (unlike :func:`mix_weights`'s doc-share) — budgets
    are in tokens. One tiny per-source aggregate, windows over the
    aggregated table only; scale-independent."""
    w = Window.partitionBy()
    agg = docs.groupBy(stratum_col).agg(
        F.sum(F.size(F.split(F.col(text_col), " "))).alias("n_tokens")
    )
    shared = agg.select(
        stratum_col,
        "n_tokens",
        F.pow(
            F.col("n_tokens") / F.sum("n_tokens").over(w), F.lit(alpha)
        ).alias("w_raw"),
    )
    weight, target = _recipe_cols(w, token_budget)
    return shared.select(
        stratum_col,
        F.col("n_tokens").cast("long").alias("n_tokens"),
        weight.alias("weight"),
        target.alias("target_tokens"),
        F.round(target / F.col("n_tokens"), 6).alias("epochs"),
    ).orderBy(stratum_col)


#: Temperature ladder for mix_temperature_sweep, in integer percent so the
#: row key is exact on both engine faces (0 = uniform, 100 = natural).
MIX_ALPHA_LADDER_PCT = (0, 25, 50, 75, 100)


def mix_temperature_sweep(
    docs: DataFrame,
    token_budget: int = 1_000_000,
    alphas_pct: tuple = MIX_ALPHA_LADDER_PCT,
    stratum_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """→ (alpha_pct, source, n_tokens, weight, target_tokens, epochs,
    mix_entropy): :func:`epoch_plan` swept across the temperature ladder —
    the "which α do I pick" table. Each α row-group is one candidate mix;
    ``epochs`` exposes which sources that α over-repeats (the usual ≫4-5
    repetition-harm flag) and ``mix_entropy`` (−Σ w·ln w of the 6dp
    weights, shared across the α group) scores how much source diversity
    the temperature buys.

    One per-source token aggregate crossed with the ladder — every window
    partitions by alpha over the AGGREGATED table (cardinality = #sources
    × #alphas, never #docs); scale-independent like epoch_plan. The
    entropy terms enter the window sum as 6dp micro-integers, so the
    group total is order-independent across engines."""
    w = Window.partitionBy("alpha_pct")
    agg = docs.groupBy(stratum_col).agg(
        F.sum(F.size(F.split(F.col(text_col), " "))).alias("n_tokens")
    )
    ladder = docs.sparkSession.createDataFrame(
        [(a,) for a in alphas_pct], "alpha_pct int"
    )
    swept = agg.crossJoin(F.broadcast(ladder)).select(
        "alpha_pct",
        stratum_col,
        "n_tokens",
        F.pow(
            F.col("n_tokens") / F.sum("n_tokens").over(w),
            F.col("alpha_pct") / F.lit(100.0),
        ).alias("w_raw"),
    )
    weight, target = _recipe_cols(w, token_budget)
    weighted = swept.select(
        "alpha_pct",
        stratum_col,
        "n_tokens",
        weight.alias("weight"),
        target.alias("target_tokens"),
    )
    ent_term = F.when(
        F.col("weight") > 0,
        F.round(-F.col("weight") * F.log(F.col("weight")) * 1_000_000)
        .cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    return (
        weighted.select(
            "alpha_pct",
            stratum_col,
            F.col("n_tokens").cast("long").alias("n_tokens"),
            "weight",
            "target_tokens",
            F.round(F.col("target_tokens") / F.col("n_tokens"), 6).alias(
                "epochs"
            ),
            ent_term.alias("ent_micro"),
        )
        .select(
            "alpha_pct",
            stratum_col,
            "n_tokens",
            "weight",
            "target_tokens",
            "epochs",
            F.round(F.sum("ent_micro").over(w) / 1_000_000.0, 6).alias(
                "mix_entropy"
            ),
        )
        .orderBy("alpha_pct", stratum_col)
    )


def mix_dedup_shift(
    docs: DataFrame,
    alpha: float = 0.5,
    stratum_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """→ (source, n_tokens_raw, n_tokens_dedup, dedup_token_share,
    weight_raw, weight_dedup, weight_shift): how exact-content dedup
    MOVES the training mix — the temperature weights (token-share^α,
    epoch_plan's recipe) recomputed on the SURVIVOR corpus (keep = min
    doc_id per md5 group, exact_dedup's rule, applied globally so a
    cross-source duplicate survives in exactly one source) vs the raw
    corpus. A source that is mostly duplicates loses weight;
    ``weight_shift`` is precisely what a mix tuned before dedup silently
    mis-allocates after it — the composition question dup_inflation
    (volume) and epoch_plan (recipe) each answer only half of.

    Scale shape: exact_dedup's one map-side-combinable md5 groupBy +
    hash equi-join back, a per-source conditional rollup, then windows
    over the AGGREGATED (|sources|-row) table only — the mix_weights
    cost class on top of the dedup_exact cost class."""
    w = Window.partitionBy()
    hashed = docs.select(
        stratum_col,
        "doc_id",
        F.size(F.split(F.col(text_col), " ")).alias("n_toks"),
        F.md5(F.col(text_col)).alias("h"),
    )
    keep = hashed.groupBy("h").agg(F.min("doc_id").alias("keep_id"))
    per = (
        hashed.join(keep, "h")
        .groupBy(stratum_col)
        .agg(
            F.sum("n_toks").cast("long").alias("n_tokens_raw"),
            F.sum(
                F.when(F.col("doc_id") == F.col("keep_id"), F.col("n_toks"))
                .otherwise(0)
            )
            .cast("long")
            .alias("n_tokens_dedup"),
        )
    )
    sw = per.select(
        stratum_col,
        "n_tokens_raw",
        "n_tokens_dedup",
        F.pow(
            F.col("n_tokens_raw") / F.sum("n_tokens_raw").over(w), F.lit(alpha)
        ).alias("wr"),
        F.pow(
            F.col("n_tokens_dedup") / F.sum("n_tokens_dedup").over(w),
            F.lit(alpha),
        ).alias("wd"),
    )
    wt = sw.select(
        stratum_col,
        "n_tokens_raw",
        "n_tokens_dedup",
        F.round(F.col("n_tokens_dedup") / F.col("n_tokens_raw"), 6).alias(
            "dedup_token_share"
        ),
        _tempered_weight(w, "wr").alias("weight_raw"),
        _tempered_weight(w, "wd").alias("weight_dedup"),
    )
    return wt.select(
        "*",
        F.round(F.col("weight_dedup") - F.col("weight_raw"), 6).alias(
            "weight_shift"
        ),
    ).orderBy(stratum_col)


CURRICULUM_STAGES = 4


def curriculum_plan(
    docs: DataFrame, stages: int = CURRICULUM_STAGES, text_col: str = "text"
) -> DataFrame:
    """→ (stage, tau, n_docs, n_tokens, mean_quality, token_share): a
    quality-ramp training curriculum — stage 1 trains on the WHOLE corpus,
    each later stage raises the quality floor linearly from the corpus MIN
    quality toward the MAX (τ_s = min + ((s−1)/S)·(max−min), i.e.
    τ_s = ((S+1−s)·min + (s−1)·max) / S for S stages; the final floor
    stops 1/S short of max so the last stage is a top band, not a single
    doc), the standard "anneal on high quality" schedule. Each row
    answers: at stage s, how much data is left, how many tokens, and how
    clean is it.

    The threshold test runs entirely in exact integer arithmetic on the
    6dp micro-unit quality scores (S·q ≥ (S+1−s)·min + (s−1)·max), so
    boundary docs land identically on both engine faces — no float τ
    comparison anywhere. One map-only feature pass, one 1-row corpus
    aggregate (broadcast), a ladder cross-join (S× map fan-out with
    map-side combine into S groups) — linear in corpus, no sort, no
    quantile shuffle."""
    from haystack_traces_spark.datapipe.text import text_stats

    feats = text_stats(docs, text_col).select(
        "doc_id",
        "n_tokens",
        F.round(F.col("quality_score") * 1_000_000).cast("long").alias("q_micro"),
    )
    tot = feats.agg(
        F.min("q_micro").cast("long").alias("min_q"),
        F.max("q_micro").cast("long").alias("max_q"),
        F.sum("n_tokens").cast("long").alias("tot_tokens"),
    )
    ladder = docs.sparkSession.createDataFrame(
        [(s,) for s in range(1, stages + 1)], "stage int"
    )
    s_col = F.col("stage").cast("long")
    keep = (F.lit(stages) * F.col("q_micro")) >= (
        (F.lit(stages + 1) - s_col) * F.col("min_q")
        + (s_col - 1) * F.col("max_q")
    )
    return (
        feats.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(ladder))
        .filter(keep)
        .groupBy("stage")
        .agg(
            F.round(
                (
                    (F.lit(stages + 1) - s_col) * F.first("min_q")
                    + (s_col - 1) * F.first("max_q")
                )
                / F.lit(float(stages))
                / 1_000_000.0,
                6,
            ).alias("tau"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.round(
                F.sum("q_micro") / (F.count(F.lit(1)) * 1_000_000.0), 6
            ).alias("mean_quality"),
            F.round(F.sum("n_tokens") / F.first("tot_tokens"), 6).alias(
                "token_share"
            ),
        )
        .select(
            "stage", "tau", "n_docs", "n_tokens", "mean_quality", "token_share"
        )
        .orderBy("stage")
    )


# -------------------------------------------- canonical doc per cluster ----

def canonical_docs(clusters: DataFrame, quality: DataFrame) -> DataFrame:
    """→ (cluster, canon_doc_id, n_members, canon_quality): pick ONE
    survivor per duplicate cluster — highest quality_score, doc_id as the
    deterministic tie-break — the "which copy do we keep" step that turns
    dedup output into an actionable drop list.

    ``clusters`` is `dup_clusters` output (doc_id, cluster); ``quality``
    any (doc_id, quality_score). Quality scores are compared at their
    ROUNDED 6-dp value (what `text_stats` emits) so the ordering is
    engine-stable. One window per cluster — partition count = #clusters,
    each a handful of rows; the heavy lifting already happened in pair
    generation."""
    j = clusters.join(quality.select("doc_id", "quality_score"), "doc_id")
    wc = Window.partitionBy("cluster")
    wr = Window.partitionBy("cluster").orderBy(
        F.col("quality_score").desc(), F.col("doc_id").asc()
    )
    return (
        j.select(
            "cluster",
            "doc_id",
            "quality_score",
            F.row_number().over(wr).alias("rk"),
            F.count(F.lit(1)).over(wc).alias("n_members"),
        )
        .filter(F.col("rk") == 1)
        .select(
            "cluster",
            F.col("doc_id").alias("canon_doc_id"),
            F.col("n_members").cast("long").alias("n_members"),
            F.col("quality_score").alias("canon_quality"),
        )
    )


# -------------------------------------------------------------- PII scan --

# Patterns restricted to syntax Java regex and RE2 (DuckDB) evaluate
# identically, so the oracle is exact.
PII_PATTERNS = {
    "emails": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    "phones": r"\d{3}[-.]\d{3}[-.]\d{4}",
    "ipv4s": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_scan(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """→ (doc_id, emails, phones, ipv4s, has_pii): per-doc PII pattern
    counts — the scrub/filter gate of a training pipeline. Counting (not
    just flagging) supports redaction-rate reporting. Pure regexp_count
    expressions; the redaction itself would be the same patterns through
    regexp_replace."""
    counts = {
        name: F.regexp_count(F.col(text_col), F.lit(pat)).cast("long")
        for name, pat in PII_PATTERNS.items()
    }
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return docs.select(
        "doc_id",
        *[c.alias(name) for name, c in counts.items()],
        (total > 0).alias("has_pii"),
    )


def sql_pii_scan() -> str:
    cols = ",\n       ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS {name}"
        for name, pat in PII_PATTERNS.items()
    )
    total = " + ".join(
        f"len(regexp_extract_all(text, '{pat}'))" for pat in PII_PATTERNS.values()
    )
    return f"""
SELECT doc_id,
       {cols},
       ({total}) > 0 AS has_pii
FROM documents
"""


def shuffle_order(
    docs: DataFrame,
    n_shards: int = 8,
    seed: str = "shuf:",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (doc_id, shard, pos): deterministic training-order shuffle.

    Training loaders need a reproducible random order that is stable
    across cluster sizes and re-partitioning; ``ORDER BY random()`` is
    neither. Here the order key is hash60(seed‖id): shard = key % n_shards
    spreads docs uniformly, pos = rank of the key WITHIN the shard. Epoch
    reshuffles are a seed change, not a data move.

    Scale shape: no global sort — ranking windows run per shard, so
    parallelism = n_shards and each partition sorts only its own slice
    (exactly how sharded training data is laid out anyway). Ties are
    impossible in practice (60-bit keys) but doc_id breaks them
    deterministically for the oracle."""
    from pyspark.sql import Window

    key = hash60(F.col(id_col).cast("string"), seed=seed)
    w = Window.partitionBy("shard").orderBy("key", id_col)
    return (
        docs.select(
            id_col,
            key.alias("key"),
            (key % n_shards).cast("long").alias("shard"),
        )
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select(id_col, "shard", "pos")
    )


def sql_shuffle_order(n_shards: int = 8, seed: str = "shuf:") -> str:
    from haystack_traces_spark.datapipe.hashing import hash60_sql

    k = hash60_sql("CAST(doc_id AS VARCHAR)", seed=seed)
    return f"""
SELECT doc_id, CAST({k} % {n_shards} AS BIGINT) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY {k} % {n_shards}
                               ORDER BY {k}, doc_id) AS BIGINT) AS pos
FROM documents
"""


def probe_overlap(
    docs: DataFrame,
    probes: DataFrame,
    n: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, best_probe, n_shared, overlap): GRADED contamination —
    per training doc, the probe (benchmark) document with the largest
    fraction of ITS n-grams present in the doc, and that fraction.
    :func:`decontaminate` answers "touched at all?" (any-shingle boolean);
    this is the Brown et al. 2020 style graded view that lets a curator
    set an overlap threshold instead of dropping on a single shared
    phrase. overlap = |shared n-grams| / |probe n-grams|.

    Scale shape: probe shingles are the SMALL side (distinct + broadcast
    with their per-probe sizes), the corpus never shuffles — one map-side
    join, one per-(doc, probe) count, one per-doc min-struct argmax on the
    6dp-ROUNDED overlap (house rank-on-rounded rule; ties → lower
    probe_id). Docs sharing nothing keep a NULL best_probe row."""
    from haystack_traces_spark.datapipe.hashing import word_shingles

    probe_sh = probes.select(
        F.col("doc_id").alias("best_probe"),
        F.explode(word_shingles(text_col, n)).alias("s"),
    )
    probe_sz = probe_sh.groupBy("best_probe").agg(
        F.count(F.lit(1)).alias("n_probe_sh")
    )
    doc_sh = docs.select(
        "doc_id", F.explode(word_shingles(text_col, n)).alias("s")
    )
    scored = (
        doc_sh.join(F.broadcast(probe_sh), "s")
        .groupBy("doc_id", "best_probe")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .join(F.broadcast(probe_sz), "best_probe")
        .withColumn("overlap", F.round(F.col("n_shared") / F.col("n_probe_sh"), 6))
    )
    best = (
        scored.groupBy("doc_id")
        .agg(
            F.min(
                F.struct(
                    (-F.col("overlap")).alias("no"),
                    F.col("best_probe").alias("bp"),
                    F.col("n_shared").alias("ns"),
                    F.col("overlap").alias("ov"),
                )
            ).alias("m")
        )
        .select(
            "doc_id",
            F.col("m.bp").alias("best_probe"),
            F.col("m.ns").cast("long").alias("n_shared"),
            F.col("m.ov").alias("overlap"),
        )
    )
    return (
        docs.select("doc_id")
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            "best_probe",
            F.coalesce("n_shared", F.lit(0)).cast("long").alias("n_shared"),
            F.coalesce("overlap", F.lit(0.0)).alias("overlap"),
        )
    )


def split_leak_audit(pairs: DataFrame, assign: DataFrame) -> DataFrame:
    """→ (split_a, split_b, n_leaky_pairs): near-duplicate pairs whose two
    endpoints landed in DIFFERENT splits of an assignment — the audit
    that catches eval leakage after the fact. Run against
    :func:`split_assign` it quantifies the hole (near-copies of test
    docs sitting in train); run against :func:`leakage_safe_split` it
    must return zero rows (pinned by test), because cluster members hash
    on their canonical id.

    ``pairs``: (doc_a, doc_b, …) flagged near-dup pairs. ``assign``:
    (doc_id, split, …). Split pairs are canonical (least/greatest).

    Scale shape: the pair table is output-side (small); it broadcasts
    onto the assignment twice — the corpus-sized assignment never
    shuffles."""
    a = assign.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sa"))
    b = assign.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sb"))
    with_a = a.join(F.broadcast(pairs.select("doc_a", "doc_b")), "doc_a")
    flagged = b.join(F.broadcast(with_a), "doc_b")
    return (
        flagged.filter(F.col("sa") != F.col("sb"))
        .select(
            F.least("sa", "sb").alias("split_a"),
            F.greatest("sa", "sb").alias("split_b"),
        )
        .groupBy("split_a", "split_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_leaky_pairs"))
        .orderBy("split_a", "split_b")
    )


def weighted_sample(
    docs: "DataFrame",
    k: int = 50,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
) -> "DataFrame":
    """→ (rank, doc_id, weight, race_key): deterministic weighted sample
    WITHOUT replacement — k docs drawn with probability proportional to
    ``weight_col`` by the exponential-race method (Efraimidis & Spirakis
    2006): each doc gets E = -ln(u)/w with u a uniform derived from its
    id hash, and the k SMALLEST E win. One pass, no RNG state, identical
    sample on every engine/run/partitioning — the "sample 1B docs
    proportional to quality score" primitive a training-data pipeline
    runs ahead of every expensive stage.

    Engine-exact ordering: u = (hash60(id)+1)/2^60 (identical md5-derived
    hash on both faces), ln(u) ROUNDED to 9dp before the division —
    Java's Math.log and DuckDB's std::log may differ in the last ulp, and
    the round quantizes both to the same grid (ln(u) ∈ (-42, 0), so 9dp
    keeps ~10 significant digits; a boundary flip needs the true value
    within 1e-16 of a grid edge). Division and comparison are then
    bit-identical IEEE ops. Ties (identical race keys) break on doc_id.

    Scale shape: map-only key computation + TakeOrderedAndProject top-k —
    no shuffle beyond the k-row ordered take; weights need w > 0 (rows
    with w ≤ 0 are excluded, matching the estimator's support)."""
    from haystack_traces_spark.datapipe.hashing import hash60

    u = (hash60(F.col(id_col).cast("string"), seed="ws:") + F.lit(1)) / F.lit(
        float(1 << 60)
    )
    e = F.round(F.log(u), 9) * F.lit(-1.0) / F.col(weight_col)
    return (
        docs.filter(F.col(weight_col) > 0)
        .select(
            F.col(id_col),
            F.col(weight_col).cast("long").alias("weight"),
            e.alias("race_key"),
        )
        .orderBy(F.col("race_key").asc(), F.col(id_col).asc())
        .limit(k)
        .select(
            F.row_number()
            .over(
                Window.orderBy(F.col("race_key").asc(), F.col(id_col).asc())
            )
            .cast("int")
            .alias("rank"),
            F.col(id_col),
            "weight",
            F.round("race_key", 12).alias("race_key"),
        )
    )
