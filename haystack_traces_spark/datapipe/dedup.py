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

from haystack_traces_spark.datapipe.caps import DEFAULT_MAX_BUCKET, cap_buckets
from haystack_traces_spark.datapipe.hashing import (
    hash60,
    ordered_word_shingles,
    word_shingles,
)
from haystack_traces_spark.session import materialize

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


def normalized_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """→ (doc_id, norm_hash, keep_doc_id, group_size): exact dedup over
    NORMALIZED text — lowercase, strip every char outside [a-z0-9 ],
    collapse whitespace runs, trim. Catches the near-copies that differ
    only in casing/punctuation/spacing (the RefinedWeb/Penedo et al. 2023
    "exact after normalization" stage between raw-exact and MinHash).

    Same scale shape as :func:`exact_dedup`: the md5 of the normalized
    text (never the text itself) rides the one map-side-combinable
    groupBy shuffle."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", ""),
            " +",
            " ",
        )
    )
    hashed = docs.select("doc_id", F.md5(norm).alias("norm_hash"))
    groups = hashed.groupBy("norm_hash").agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count(F.lit(1)).alias("group_size"),
    )
    return hashed.join(groups, "norm_hash").select(
        "doc_id", "norm_hash", "keep_doc_id", "group_size"
    )


def segment_dedup(
    docs: DataFrame, seg_tokens: int = 10, text_col: str = "text"
) -> DataFrame:
    """→ (doc_id, n_segs, n_kept, clean_text): C4-style duplicate-segment
    removal (Raffel et al. 2020, §2.2 "we removed all but one of any
    three-sentence span occurring more than once"). The corpus here has no
    sentence boundaries, so a "span" is a fixed window of ``seg_tokens``
    whitespace tokens; every repeated segment keeps only its first global
    occurrence (lowest (doc_id, position)), and each doc is reassembled
    from its surviving segments in order.

    Scale shape: one posexplode scan, one map-side-combinable min-struct
    groupBy on the segment HASH (md5 — the raw segment string never rides
    the shuffle twice), one hash join back, one per-doc regroup. No window
    functions, no Python."""
    toks = F.split(F.col(text_col), " ")
    n_segs = F.ceil(F.size(toks) / F.lit(seg_tokens)).cast("long")
    segs = F.transform(
        F.sequence(F.lit(0), (n_segs - 1).cast("int")),
        lambda i: F.array_join(
            F.slice(toks, i * seg_tokens + 1, seg_tokens), " "
        ),
    )
    inst = docs.select(
        "doc_id", F.posexplode(segs).alias("seg_idx", "seg")
    ).withColumn("seg_hash", F.md5("seg"))
    firsts = inst.groupBy("seg_hash").agg(
        F.min(F.struct("doc_id", "seg_idx")).alias("first")
    )
    kept = inst.join(firsts, "seg_hash").filter(
        (F.col("doc_id") == F.col("first.doc_id"))
        & (F.col("seg_idx") == F.col("first.seg_idx"))
    )
    per_doc = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg_idx", "seg"))),
                lambda s: s["seg"],
            ),
            " ",
        ).alias("clean_text"),
    )
    base = docs.select("doc_id", n_segs.alias("n_segs"))
    return base.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_segs",
        F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
    )


def shingle_rows(docs: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    return docs.select(
        "doc_id", F.explode(word_shingles(text_col, n)).alias("s")
    )


def _pair_shingle_sets(
    candidates: DataFrame,
    docs: DataFrame,
    n: int,
    text_col: str = "text",
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Join the per-doc DISTINCT shingle-set arrays onto candidate
    (doc_a, doc_b) pairs → + (sh_a, sh_b). The ONE exact-verify input
    builder shared by the Jaccard and containment verifiers — the
    distinct-per-doc invariant (counts are SET sizes, never multiset)
    lives here and only here.

    ``shingles``: optional pre-computed (doc_id, s) shingle ROWS (distinct
    per doc). When the caller already materialized them for candidate
    generation, regrouping those rows is far cheaper than re-running the
    word_shingles tokenization over the corpus (the tokenization pass was
    ~60% of verify wall-time at sf0.1)."""
    # the shingle-set table joins in as BOTH pair sides — materialize once
    if shingles is not None:
        sets_src = shingles.groupBy("doc_id").agg(
            F.collect_list("s").alias("sh")
        )
    else:
        sets_src = docs.select("doc_id", word_shingles(text_col, n).alias("sh"))
    sets_df = materialize(sets_src)
    a = sets_df.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sets_df.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    return candidates.join(a, "doc_a").join(b, "doc_b")


def _verify_jaccard(
    candidates: DataFrame, docs: DataFrame, threshold: float, n: int,
    text_col: str = "text",
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard for candidate (doc_a, doc_b) pairs via array_intersect
    over the full shingle sets — work scales with |candidates|, not |docs|²."""
    paired = _pair_shingle_sets(candidates, docs, n, text_col, shingles)
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    return (
        paired.withColumn(
            "jaccard",
            F.round(inter / (F.size("sh_a") + F.size("sh_b") - inter), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def containment_candidates(
    sh: DataFrame,
    threshold: float = 0.9,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """→ distinct (doc_a, doc_b) candidate pairs from the one-sided prefix
    filter over shingle ROWS ``sh`` (doc_id, s) — the candidate stage of
    :func:`containment_pairs`, exposed on its own so the 10×-growth scale
    smoke can measure candidate VOLUME directly (VERDICT r5 ask #6)."""
    dfreq = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    ranked = (
        sh.join(dfreq, "s")
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("df", "s"))).alias("arr"))
    )
    prefix_len = F.size("arr") - F.ceil(F.lit(threshold) * F.size("arr")) + 1
    prefix = materialize(
        ranked.select(
            F.col("doc_id").alias("doc_p"),
            F.explode(F.slice("arr", 1, prefix_len.cast("int"))).alias("x"),
        ).select("doc_p", hash60("x.s", seed="ct:").alias("h"))
    )
    full = cap_buckets(
        sh.select(
            F.col("doc_id").alias("doc_f"), hash60("s", seed="ct:").alias("h")
        ),
        ["h"],
        max_bucket,
        "containment_pairs",
    )
    return (
        prefix.join(full, "h")
        .filter(F.col("doc_p") != F.col("doc_f"))
        .select(
            F.least("doc_p", "doc_f").alias("doc_a"),
            F.greatest("doc_p", "doc_f").alias("doc_b"),
        )
        .distinct()
    )


def containment_pairs(
    docs: DataFrame,
    threshold: float = 0.9,
    n: int = 3,
    text_col: str = "text",
    shingles: DataFrame | None = None,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """→ (doc_a, doc_b, n_a, n_b, n_shared, cont_a_in_b, cont_b_in_a):
    ASYMMETRIC set containment C(A→B) = |A∩B| / |A| for pairs where
    either direction reaches ``threshold`` — the sub-document duplication
    Jaccard is blind to (a paragraph quoted inside a much longer doc has
    C ≈ 1 but J ≈ |A|/|B| ≈ 0, so it never crosses a Jaccard gate;
    cf. Broder 1997's resemblance-vs-containment split).

    Candidate generation: ONE-SIDED prefix filtering. ppjoin's LENGTH
    filter is unsound for containment (no size relation holds), but the
    prefix theorem itself is direction-local: C(A→B) ≥ t means
    |A∩B| ≥ t·|A|, so B must share one of A's first |A| − ⌈t·|A|⌉ + 1
    shingles under the global (df, s) order — regardless of |B|. So the
    PREFIX index of each doc joins against the FULL shingle table (not
    prefix × prefix as in Jaccard); either qualifying direction is
    caught with the flagged doc on the prefix side. EXACT: no recall
    contract — every qualifying pair shares a prefix shingle by
    pigeonhole, and candidates are verified over the full sets. The
    oracle is therefore the brute-force ground truth, not a mirror of
    the filter.

    Scale shape: prefix side is ≈(1−t) of shingle volume and df-ordered
    rarest-first, so join volume ≈ Σ over prefix occurrences of df(s) —
    rare-token co-occurrence, not corpus². The full side runs behind
    ``cap_buckets`` (a df-hot shingle — boilerplate — is dropped from
    candidate generation: logged, recall-only, inactive at test scale)."""
    if shingles is not None:
        sh = shingles
    else:
        sh = materialize(shingle_rows(docs, text_col, n))
    candidates = containment_candidates(sh, threshold, max_bucket)
    paired = _pair_shingle_sets(candidates, docs, n, text_col, shingles=sh)
    n_shared = F.size(F.array_intersect("sh_a", "sh_b"))
    return (
        paired.select(
            "doc_a",
            "doc_b",
            F.size("sh_a").cast("long").alias("n_a"),
            F.size("sh_b").cast("long").alias("n_b"),
            n_shared.cast("long").alias("n_shared"),
        )
        .withColumn("cont_a_in_b", F.round(F.col("n_shared") / F.col("n_a"), 6))
        .withColumn("cont_b_in_a", F.round(F.col("n_shared") / F.col("n_b"), 6))
        # gate on the UNROUNDED ratio: the prefix filter's pigeonhole
        # guarantee covers true containment ≥ t; gating on the rounded
        # value would ALSO admit true cont ∈ [t − 5e-7, t) — pairs the
        # candidate generation never promised to produce (an engine/
        # oracle boundary gap on very large docs). Output columns stay
        # rounded; both faces gate raw.
        .filter(
            (F.col("n_shared") / F.col("n_a") >= threshold)
            | (F.col("n_shared") / F.col("n_b") >= threshold)
        )
        .orderBy("doc_a", "doc_b")
    )


def bloom_position_array(key_col, m: int, k: int) -> F.Column:
    """The ONE Bloom position derivation (distinct positions of the k
    seeded hash60 probes mod m) — shared by the batch audit
    (:func:`bloom_probe`) and the streaming ingest gate
    (streaming/bloom_stream.py) so both faces screen against the SAME
    filter geometry; a doc admitted by one face hits in the other."""
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    return F.array_distinct(
        F.array(*[hash60(c, seed=f"bl{i}:") % m for i in range(k)])
    )


def _bloom_flags(
    docs: DataFrame, m: int, k: int, probe_mod: int, text_col: str = "text"
):
    """Shared build/probe/flag pipeline of the Bloom audit → (build,
    build_pos, flags) — one derivation of the filter geometry and the
    hit/exact flags, shared by the per-source report (:func:`bloom_probe`)
    and the (m, k) ladder (`queries.q_bloom_sizing_plan`)."""
    # COALESCE: NULL text keys as empty — the SAME rule as the streaming
    # gate's doc_positions, or the two faces would derive different
    # position sets for the same doc (breaking the shared-geometry
    # contract of bloom_position_array)
    keyed = docs.select(
        "doc_id",
        "source",
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("key"),
    )
    build = keyed.filter(F.col("doc_id") % probe_mod != 0)
    probe = keyed.filter(F.col("doc_id") % probe_mod == 0)
    pos_arr = bloom_position_array("key", m, k)
    build_pos = build.select(F.explode(pos_arr).alias("pos")).distinct()
    probed = probe.withColumn("pos_arr", pos_arr)
    matched = (
        probed.select("doc_id", F.explode("pos_arr").alias("pos"))
        .join(F.broadcast(build_pos), "pos")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    exact = build.select("key").distinct().withColumn("is_exact", F.lit(1))
    flags = (
        probed.join(matched, "doc_id", "left")
        .join(exact, "key", "left")
        .select(
            "doc_id",
            "source",
            (F.coalesce("n_matched", F.lit(0)) == F.size("pos_arr"))
            .cast("long")
            .alias("bloom_hit"),
            F.coalesce("is_exact", F.lit(0)).cast("long").alias("exact_hit"),
        )
    )
    return build, build_pos, flags


def bloom_probe(
    docs: DataFrame,
    m: int = 4096,
    k: int = 3,
    probe_mod: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """→ (source, n_probes, n_bloom_hits, n_exact_hits, n_false_pos,
    fp_rate): INCREMENTAL exact-dedup screening against a frozen corpus
    snapshot via a Bloom filter (Bloom 1970), audited against ground
    truth. Build side = docs with doc_id % probe_mod ≠ 0 (the "already
    ingested" snapshot), probe side = the rest (the "new batch").

    Each doc's key (md5 of text) maps to ``k`` positions
    (hash60(seed_i ‖ key) mod ``m``); a probe is a BLOOM HIT iff all its
    distinct positions exist in the build side's position set. The probe
    additionally exact-joins on the key so the report carries the
    REALIZED false-positive rate per source — the knob-tuning evidence
    for sizing m/k before trusting the filter at scale.

    Scale shape: this is why the operator exists at 100 TB — the
    position set is ≤ m rows (a BROADCAST, however big the snapshot
    corpus), so screening a new batch never shuffles the snapshot. The
    exact-hit audit join on the full key IS snapshot-sized and exists
    only to measure the FP rate; production callers drop it (or sample)
    once m/k are validated. Everything is hash-groupBy/broadcast-join —
    no windows, no Python."""
    build, build_pos, flags = _bloom_flags(docs, m, k, probe_mod, text_col)
    n_fp = F.sum("bloom_hit") - F.sum("exact_hit")
    denom = F.nullif(
        (F.count(F.lit(1)) - F.sum("exact_hit")).cast("double"), F.lit(0.0)
    )
    return (
        flags.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_probes"),
            F.sum("bloom_hit").cast("long").alias("n_bloom_hits"),
            F.sum("exact_hit").cast("long").alias("n_exact_hits"),
            n_fp.cast("long").alias("n_false_pos"),
            F.round(n_fp / denom, 6).alias("fp_rate"),
        )
        .orderBy("source")
    )


def ngram_jaccard_pairs(
    docs: DataFrame, threshold: float = 0.8, n: int = 3,
    text_col: str = "text",
    shingles: DataFrame | None = None,
) -> DataFrame:
    """→ (doc_a, doc_b, jaccard): exact pairs over the threshold.

    Candidate generation uses PREFIX FILTERING (ppjoin): shingles are
    globally ordered by document frequency (rarest first); a doc with k
    shingles indexes only its first k - ⌈t·k⌉ + 1 — any pair with
    J ≥ t must share a prefix shingle (i ≥ t·|A| ⟹ pigeonhole on the
    common total order), so the join volume scales with rare-token
    co-occurrence instead of blowing up on stop-phrases. Exact: candidates
    are then verified with true Jaccard over the full sets.

    ``shingles``: optional pre-materialized (doc_id, s) shingle rows (the
    session-cached / persisted-table case) — skips this function's own
    tokenize + materialize."""
    if shingles is not None:
        sh = shingles
    else:
        # sh feeds BOTH the document-frequency aggregate and the prefix
        # build — two independent subtrees Spark would otherwise recompute
        # (scan + shingle + explode twice); one materialization serves both
        sh = materialize(shingle_rows(docs, text_col, n))
    dfreq = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    # prefix = the first k - ⌈t·k⌉ + 1 shingles under the global (df, s)
    # total order. The theorem holds for ANY order both docs share, so the
    # per-doc sort runs as array_sort over a collected bounded array (one
    # hash aggregate) instead of TWO window passes over the shingle table —
    # no Window, no per-partition sort, ~40% cheaper at sf0.1. Shingle
    # sets are distinct per doc, so the struct sort is a strict order.
    ranked = (
        sh.join(dfreq, "s")
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("df", "s"))).alias("arr"))
    )
    prefix_len = F.size("arr") - F.ceil(F.lit(threshold) * F.size("arr")) + 1
    # self-join on the shingle's 60-bit hash, not the string: ~3× fewer
    # shuffle bytes on the widest exchange. A hash collision can only ADD a
    # candidate pair (never lose one — equal strings always share a hash),
    # and every candidate is exact-verified below, so output is unchanged.
    # The PREFIX INDEX (not just sh) is what feeds both self-join sides —
    # materialize it or the df-join + prefix tree evaluates per side.
    prefix = ranked.select(
        "doc_id",
        F.size("arr").alias("n_sh"),
        F.explode(F.slice("arr", 1, prefix_len.cast("int"))).alias("x"),
    ).select("doc_id", "n_sh", hash60("x.s", seed="pj:").alias("h"))
    prefix = materialize(prefix)
    a = prefix.alias("a")
    b = prefix.alias("b")
    # ppjoin LENGTH filter alongside the prefix match: J >= t forces
    # min(|A|,|B|) >= t * max(|A|,|B|) (|A∩B| <= min, |A∪B| >= max), so
    # size-mismatched pairs are provably below threshold and never reach
    # the verify join — at sf0.1 this cuts candidates ~2x and the verify
    # stage (which carries both full shingle arrays) with it.
    candidates = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("a.n_sh") >= F.lit(threshold) * F.col("b.n_sh"))
            & (F.col("b.n_sh") >= F.lit(threshold) * F.col("a.n_sh")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return _verify_jaccard(candidates, docs, threshold, n, text_col, shingles=sh)


def dup_pair_evidence(
    docs: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    k: int = 3,
    text_col: str = "text",
    pairs: DataFrame | None = None,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """→ (doc_a, doc_b, jaccard, n_shared, evidence): WHY a pair was
    flagged — the ``k`` globally-RAREST shingles the two docs share,
    joined into one string (rarest first; ties by shingle). Rare shared
    shingles are the strongest evidence of real duplication (everything
    shares stop-phrases); this is the curator's drill-down for auditing a
    dedup decision before deleting data.

    Composition: pairs from :func:`ngram_jaccard_pairs` (verified
    operator); shared shingles = the pair joined against the shingle rows
    on both sides; rarity from the same df aggregate the ppjoin prefix
    uses. Work scales with |pairs| x shared shingles, never |docs|².

    ``pairs`` / ``shingles`` let a caller holding persisted /
    session-cached stages (the same tables this would rebuild) skip the
    pair pipeline and the tokenization respectively."""
    if pairs is None:
        pairs = ngram_jaccard_pairs(docs, threshold, n, text_col, shingles)
    sh = (
        shingles
        if shingles is not None
        else materialize(shingle_rows(docs, text_col, n))
    )
    dfreq = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    shared = (
        pairs.join(sh.select(F.col("doc_id").alias("doc_a"), "s"), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), "s"), ["doc_b", "s"])
        .join(dfreq, "s")
    )
    top = F.array_join(
        F.transform(
            F.slice(F.array_sort(F.collect_list(F.struct("df", "s"))), 1, k),
            lambda x: x["s"],
        ),
        " | ",
    )
    return shared.groupBy("doc_a", "doc_b", "jaccard").agg(
        F.count(F.lit(1)).cast("long").alias("n_shared"),
        top.alias("evidence"),
    )


def substring_run_pairs(
    docs: DataFrame,
    k: int = 8,
    min_run: int = 10,
    max_df: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_a, doc_b, longest_run, n_runs): longest exact shared TOKEN
    RUN per doc pair — the exact-substring dedup signal of Lee et al. 2022
    ("Deduplicating Training Data Makes LMs Better", ExactSubstr), with
    the suffix array replaced by a relational equivalent: positional
    k-gram seeds join on gram hash, and maximal matches are recovered as
    consecutive-position islands along each (pa − pb) diagonal (a shared
    run of L ≥ k tokens appears as exactly L − k + 1 consecutive seeds).

    Scale shape: seed-join volume ∝ shared-gram co-occurrence, with a
    document-frequency guard dropping template grams (df > max_df) BEFORE
    the self-join; the islands window partitions by (pair, diagonal) —
    partition count = matched diagonals, each a handful of rows. Seeds
    join on hash60 (a collision can only merge runs, at ~2⁻⁶⁰ per gram
    pair). No Python anywhere."""
    from pyspark.sql import Window

    grams = docs.select(
        "doc_id",
        F.posexplode(ordered_word_shingles(text_col, k)).alias("pos", "g"),
    ).select("doc_id", "pos", hash60("g", seed="sr:").alias("h"))
    # feeds the df-guard aggregate AND both self-join sides
    grams = materialize(grams)
    rare = (
        grams.groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_df)
        .select("h")
    )
    g = grams.join(rare, "h")
    a, b = g.alias("a"), g.alias("b")
    matches = a.join(
        b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id"))
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.pos").alias("pa"),
        (F.col("a.pos") - F.col("b.pos")).alias("diag"),
    )
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    isl = matches.withColumn("isl", F.col("pa") - F.row_number().over(w))
    runs = isl.groupBy("doc_a", "doc_b", "diag", "isl").agg(
        (F.count(F.lit(1)) + F.lit(k - 1)).cast("long").alias("run")
    )
    return (
        runs.groupBy("doc_a", "doc_b")
        .agg(
            F.max("run").alias("longest_run"),
            F.count(F.lit(1)).cast("long").alias("n_runs"),
        )
        .filter(F.col("longest_run") >= min_run)
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


def minhash_band_rows(
    docs: DataFrame,
    n_seeds: int = DEFAULT_MINHASH_SEEDS,
    bands: int = DEFAULT_BANDS,
    n: int = 3,
) -> DataFrame:
    """→ (doc_id, band, v0..v{rows_per_band-1}): one row per (doc, band)
    with the raw signature slice as the band key (engine-neutral — no
    internal hash function, so the DuckDB oracle reproduces the keys
    exactly). Shared by the candidate self-join and the near-dup
    decontamination probe join."""
    # signatures feed both sides of the band self-join — materialize once
    # instead of recomputing the shingle scan + k min-aggregates per side
    sig = materialize(minhash_signatures(docs, n_seeds, n))
    rows_per_band = n_seeds // bands
    band_cols = []
    for bi in range(bands):
        parts = [
            F.col(f"mh_{bi * rows_per_band + j}").alias(f"v{j}")
            for j in range(rows_per_band)
        ]
        band_cols.append(F.struct(F.lit(bi).alias("band"), *parts))
    return sig.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bk")
    ).select("doc_id", "bk.*")


def minhash_band_pairs(
    docs: DataFrame,
    n_seeds: int = DEFAULT_MINHASH_SEEDS,
    bands: int = DEFAULT_BANDS,
    n: int = 3,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """→ distinct BAND-LABELED collision pairs (band, doc_a, doc_b) —
    the ONE definition of the band self-join, shared by
    minhash_candidates (which drops the band column) and the per-band
    economics audit (band_contribution), so band keying can never
    silently diverge between the generator and its audit (rule 19)."""
    rows_per_band = n_seeds // bands
    buckets = minhash_band_rows(docs, n_seeds, bands, n)
    buckets = cap_buckets(
        buckets,
        ["band", *(f"v{j}" for j in range(rows_per_band))],
        max_bucket,
        "minhash_candidates",
    )

    a = buckets.alias("a")
    b = buckets.alias("b")
    join_cond = (F.col("a.band") == F.col("b.band")) & (
        F.col("a.doc_id") < F.col("b.doc_id")
    )
    for j in range(rows_per_band):
        join_cond = join_cond & (F.col(f"a.v{j}") == F.col(f"b.v{j}"))
    # no distinct needed here: within one band a pair co-occupies exactly
    # one bucket (the join equates their full signature slice), so
    # (band, doc_a, doc_b) rows are unique by construction — the only
    # dedup that exists is ACROSS bands, and that stays in
    # minhash_candidates so this builder adds no extra exchange
    return a.join(b, join_cond).select(
        F.col("a.band").alias("band"),
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
    )


def minhash_candidates(
    docs: DataFrame,
    n_seeds: int = DEFAULT_MINHASH_SEEDS,
    bands: int = DEFAULT_BANDS,
    n: int = 3,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """→ distinct (doc_a, doc_b) candidate pairs from MinHash-LSH band
    collisions. Shared candidate generator for every fuzzy-dedup verifier
    (Jaccard, edit-distance): bands/rows tune recall vs candidate volume;
    the verify step downstream fixes precision. ``max_bucket`` guards the
    band self-join against hot buckets going quadratic (caps.py)."""
    return (
        minhash_band_pairs(docs, n_seeds, bands, n, max_bucket)
        .select("doc_a", "doc_b")
        .distinct()
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    n_seeds: int = DEFAULT_MINHASH_SEEDS,
    bands: int = DEFAULT_BANDS,
    n: int = 3,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """MinHash → LSH banding → candidate join → exact-Jaccard verification.

    → (doc_a, doc_b, jaccard). Candidates whose true Jaccard < threshold are
    filtered out, so LSH affects only recall/cost, not output precision."""
    candidates = minhash_candidates(docs, n_seeds, bands, n, max_bucket)
    # verify ONLY the LSH candidates (never the all-pairs shingle join) —
    # at scale the candidate set is the entire cost dial
    return _verify_jaccard(candidates, docs, threshold, n)


def fuzzy_dedup_pairs(
    docs: DataFrame,
    min_sim: float = 0.8,
    n_seeds: int = DEFAULT_MINHASH_SEEDS,
    bands: int = DEFAULT_BANDS,
    n: int = 3,
    text_col: str = "text",
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """→ (doc_a, doc_b, edit_dist, edit_sim): edit-distance-verified fuzzy
    dedup. Candidates come from MinHash-LSH band collisions (subquadratic);
    each candidate pair is verified with exact character-level Levenshtein,
    kept when ``edit_sim = 1 - dist / max(len_a, len_b) >= min_sim``.

    Scale shape: the only quadratic-looking step (Levenshtein, O(len²) per
    pair) runs on LSH candidates only, JVM-side via the built-in
    ``levenshtein`` expression — no Python, work ∝ |candidates|."""
    cand = minhash_candidates(docs, n_seeds, bands, n, max_bucket)
    a = docs.select(F.col("doc_id").alias("doc_a"), F.col(text_col).alias("ta"))
    b = docs.select(F.col("doc_id").alias("doc_b"), F.col(text_col).alias("tb"))
    scored = (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("ta", "tb").cast("long").alias("edit_dist"),
            F.greatest(F.length("ta"), F.length("tb")).alias("mx"),
        )
        .withColumn("sim_raw", F.lit(1.0) - F.col("edit_dist") / F.col("mx"))
    )
    return scored.filter(F.col("sim_raw") >= min_sim).select(
        "doc_a", "doc_b", "edit_dist", F.round("sim_raw", 6).alias("edit_sim")
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


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 2,
    bits: int = 16,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """→ (doc_a, doc_b, hamming): fingerprint pairs within hamming distance.

    Candidates come from PIGEONHOLE bucketing: the fingerprint is split
    into (max_hamming + 1) bit segments — a pair within hamming k must
    agree EXACTLY on at least one segment, so candidates are an equality
    join per segment, never all pairs. Exact: candidates are then verified
    with the true XOR popcount. (The oracle deliberately uses the naive
    all-pairs form — different algorithm, same result.)"""
    n_seg = max_hamming + 1
    seg_bits = bits // n_seg
    # fingerprints feed both sides of the segment self-join — one
    # materialization replaces two token-scan + bit-majority passes
    fp = materialize(simhash_fingerprints(docs, bits))

    segs = []
    for s in range(n_seg):
        lo = s * seg_bits
        width = bits - lo if s == n_seg - 1 else seg_bits  # last takes the remainder
        mask = ((1 << width) - 1) << lo
        segs.append(
            F.struct(
                F.lit(s).alias("seg"),
                F.col("simhash").bitwiseAND(F.lit(mask)).alias("val"),
            )
        )
    buckets = fp.select(
        "doc_id", "simhash", F.explode(F.array(*segs)).alias("sv")
    ).select("doc_id", "simhash", "sv.seg", "sv.val")
    buckets = cap_buckets(buckets, ["seg", "val"], max_bucket, "simhash_pairs")

    a = buckets.alias("a")
    b = buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.seg") == F.col("b.seg"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("ha"),
            F.col("b.simhash").alias("hb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cand.select("doc_a", "doc_b", ham.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def dup_clusters(pairs: DataFrame, max_rounds: int = 64) -> DataFrame:
    """→ (doc_id, cluster): connected components over duplicate pairs,
    cluster = min doc_id in the component (the canonical survivor).

    Iterative min-label propagation, with POINTER DOUBLING from round 4:
    early rounds join labels across edges and keep the min (dense
    near-dup families converge here — measured 3-5 rounds at every SF —
    at no extra per-round cost); graphs still unconverged after 3 rounds
    are deep, and later rounds additionally take the label of one's own
    label (every label value is itself a component-member node id, so
    chasing it one hop halves the remaining path like classic
    hash-to-min), turning the tail from diameter-many rounds into ~log2
    of it (r12-opt). The fixed point is UNCHANGED by the schedule —
    min-propagation converges to the component minimum whichever
    convergent operator reaches it, which is why this rewrite cannot
    move results (pinned by the 33-node-path unit test: converges inside
    a 12-round budget the edge-only loop would exhaust and RAISE on).
    Graphs exceeding ``max_rounds`` still RAISE instead of silently
    returning split components. Every round is a bounded set of
    distributed joins — no driver-side graph; the loop ends early when a
    round changes nothing. GraphFrames/Pregel would express the same
    thing; this stays dependency-free."""
    edges = (
        pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .union(pairs.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b")))
        .distinct()
    )
    # every round joins against edges — persist once or each iteration
    # re-runs the whole upstream pair-generation pipeline
    edges = materialize(edges)
    # seed with min(self, min neighbor) — one aggregation, equivalent to a
    # free first propagation round
    labels = edges.groupBy(F.col("a").alias("doc_id")).agg(
        F.least(F.col("a"), F.min("b")).alias("cluster")
    )
    labels = labels.localCheckpoint(eager=True)
    converged = False
    for rnd in range(max_rounds):
        neighbor_min = (
            edges.join(labels, edges["b"] == labels["doc_id"])
            .groupBy(F.col("a").alias("doc_id"))
            .agg(F.min("cluster").alias("nbr_min"))
        )
        step = labels.join(neighbor_min, "doc_id", "left")
        new_lbl = F.coalesce(F.col("nbr_min"), F.col("cluster"))
        if rnd >= 3:
            # pointer doubling from round 4 on: the label of one's own
            # label (always a node id of the same component, so joining it
            # back onto the label table is total — the left join +
            # coalesce is belt-and-braces). Dense near-dup families
            # converge inside the plain rounds at no extra per-round
            # join; only genuinely deep graphs (template CHAINS) reach
            # here and then halve their remaining diameter per round.
            lbl2 = labels.select(
                F.col("doc_id").alias("lbl_id"), F.col("cluster").alias("lbl2")
            )
            step = step.join(lbl2, F.col("cluster") == F.col("lbl_id"), "left")
            new_lbl = F.least(
                new_lbl, F.coalesce(F.col("lbl2"), F.col("cluster"))
            )
        # changed flag computed IN the update projection, so convergence is
        # read off the already-materialized checkpoint — one heavy action per
        # round instead of an extra join+count
        updated = step.select(
            "doc_id",
            F.least(F.col("cluster"), new_lbl).alias("cluster"),
            (new_lbl < F.col("cluster")).alias("changed"),
        )
        # localCheckpoint truncates lineage — without it every round's plan
        # embeds all prior rounds and planning time grows quadratically
        updated = updated.localCheckpoint(eager=True)
        labels = updated.drop("changed")
        if updated.filter("changed").isEmpty():
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"dup_clusters did not converge in {max_rounds} rounds — the "
            "component graph has a longer diameter than the budget; pass a "
            "larger max_rounds (silently returning split components would "
            "corrupt every downstream canonical/split decision)"
        )
    return labels.select("doc_id", "cluster")


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int | None = None,
) -> DataFrame:
    """→ (id_a, id_b, cos): exact cosine near-duplicate pairs via a
    DISTRIBUTED block-grid GEMM sweep.

    Rows are hashed into B blocks; the symmetric pair space becomes a
    triangular grid of B(B+1)/2 cells (bi ≤ bj), each unordered pair of rows
    landing in exactly one cell. Every row is replicated to its B cells
    (one shuffle, replication factor B); each cell is one `applyInPandas`
    group that sweeps its sub-matrix as a vectorized numpy GEMM. Nothing is
    ever materialized on the driver and per-task memory is bounded by
    ~2·|emb|/B rows, so B is the scale dial: at 100 TB grow B with the
    table (cells shrink quadratically). This is the exact-semantics
    baseline; `embedding_neardup_pairs_lsh` is the subquadratic candidate
    path when bucket recall < 1 is acceptable."""
    import numpy as np
    import pandas as pd

    spark = emb.sparkSession
    if n_blocks is None:
        # ~2 cells per core: B(B+1)/2 ≈ 2·parallelism
        par = max(spark.sparkContext.defaultParallelism, 1)
        n_blocks = max(2, int(np.ceil(2.0 * np.sqrt(par))))
    nb = n_blocks

    # block assignment only routes work — it never affects output values,
    # so Spark's internal hash is fine here (no oracle mirror needed)
    blk = F.pmod(F.hash(F.col(id_col)), F.lit(nb))
    grid = (
        emb.select(F.col(id_col), F.col(vec_col), blk.alias("blk"))
        .withColumn(
            "cell",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(nb - 1)),
                    lambda j: F.struct(
                        F.least(F.col("blk"), j).alias("gi"),
                        F.greatest(F.col("blk"), j).alias("gj"),
                    ),
                )
            ),
        )
        .select(
            id_col, vec_col, "blk",
            F.col("cell.gi").alias("gi"), F.col("cell.gj").alias("gj"),
        )
    )

    def sweep(keys, pdf):
        gi, gj = int(keys[0]), int(keys[1])
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        V = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        if gi == gj:  # diagonal cell: triangle of one block
            C = Vn @ Vn.T
            mask = (C >= threshold) & (ids[:, None] < ids[None, :])
            ai, bj = np.nonzero(mask)
            out_a, out_b, cos = ids[ai], ids[bj], C[ai, bj]
        else:  # off-diagonal: block gi × block gj, full rectangle
            la = pdf["blk"].to_numpy() == gi
            A, Bm = Vn[la], Vn[~la]
            ida, idb = ids[la], ids[~la]
            C = A @ Bm.T
            ai, bj = np.nonzero(C >= threshold)
            out_a = np.minimum(ida[ai], idb[bj])
            out_b = np.maximum(ida[ai], idb[bj])
            cos = C[ai, bj]
        return pd.DataFrame(
            {"id_a": out_a, "id_b": out_b, "cos": np.round(cos, 6)}
        )

    return grid.groupBy("gi", "gj").applyInPandas(
        sweep, schema="id_a long, id_b long, cos double"
    )


def embedding_neardup_pairs_lsh(
    emb: DataFrame,
    threshold: float = 0.4,
    n_tables: int = 24,
    planes_per_table: int = 6,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """→ (id_a, id_b, cos): near-duplicate pairs restricted to hyperplane-LSH
    bucket collisions — the subquadratic 100 TB path.

    Candidates = pairs sharing ≥1 (table, bucket); join volume scales with
    bucket co-occupancy, never |emb|². Approximate by construction (bucket
    recall < 1 — pairs that never collide are not emitted), but fully
    DETERMINISTIC: the hyperplanes are hash-derived, so the DuckDB oracle
    rebuilds the same planes, buckets, candidates, and cosines. Verification
    is an exact JVM-side cosine over candidates only (in-index-order fold,
    bit-identical to the oracle's list_dot_product)."""
    from haystack_traces_spark.datapipe.similarity import (
        cosine_expr,
        hyperplane_buckets,
        with_norm,
    )

    # bucket rows feed both sides of the collision self-join — persist so the
    # mapInPandas bucketing (a full GEMM over the table) runs once, not twice
    buckets = materialize(hyperplane_buckets(
        emb, n_tables, planes_per_table, dim, id_col, vec_col
    ))
    buckets = cap_buckets(
        buckets, ["table", "bucket"], max_bucket, "embedding_neardup_pairs_lsh"
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    base = with_norm(emb, id_col, vec_col, dim)
    left = base.select(
        F.col(id_col).alias("id_a"), F.col("vec_d").alias("va"), F.col("norm").alias("na")
    )
    right = base.select(
        F.col(id_col).alias("id_b"), F.col("vec_d").alias("vb"), F.col("norm").alias("nb")
    )
    cos = cosine_expr("va", "vb", "na", "nb", dim)
    return (
        cand.join(left, "id_a")
        .join(right, "id_b")
        .withColumn("cos_raw", cos)
        .filter(F.col("cos_raw") >= threshold)
        .select("id_a", "id_b", F.round("cos_raw", 6).alias("cos"))
    )


def semantic_dedup(
    emb: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    use_lsh: bool = True,
    n_tables: int = 24,
    planes_per_table: int = 6,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """→ (vec_id, kept, dup_of): SemDeDup-style semantic deduplication
    (Abbas et al. 2023, arXiv:2303.09540) — drop every vector that has a
    LOWER-id neighbor at cosine ≥ threshold; the lowest-id member of each
    neighborhood survives as the representative. ``dup_of`` names the
    smallest such neighbor (null for survivors), so the output doubles as
    a dedup map for joining the corpus down to canonical rows.

    The keep-lowest rule is non-iterative by design (same as the paper's
    within-cluster argmin): one candidate-pair generation, one groupBy
    min, one left join — no fixpoint loop. With use_lsh the candidate
    pairs come from hyperplane-bucket collisions (subquadratic, the
    100 TB path, deterministic hash-derived planes so an oracle can
    rebuild them); otherwise from the exact block-grid GEMM sweep."""
    if use_lsh:
        pairs = embedding_neardup_pairs_lsh(
            emb, threshold, n_tables, planes_per_table,
            id_col=id_col, vec_col=vec_col, max_bucket=max_bucket,
        )
    else:
        pairs = embedding_neardup_pairs(emb, threshold, id_col, vec_col)
    dup_of = (
        pairs.groupBy("id_b")
        .agg(F.min("id_a").alias("dup_of"))
        .withColumnRenamed("id_b", id_col)
    )
    return (
        emb.select(id_col)
        .join(dup_of, id_col, "left")
        .select(
            id_col,
            F.col("dup_of").isNull().alias("kept"),
            "dup_of",
        )
    )


def minhash_estimate_pairs(
    docs: DataFrame,
    n_seeds: int = DEFAULT_MINHASH_SEEDS,
    bands: int = DEFAULT_BANDS,
    n: int = 3,
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """→ (doc_a, doc_b, est_jaccard, jaccard, abs_err): sketch CALIBRATION
    — for every LSH candidate pair, the MinHash-estimated Jaccard
    (fraction of agreeing signature positions, the Broder 1997 estimator)
    next to the exact value and the absolute error. This is how a curator
    tunes seeds/bands before trusting the sketch at corpus scale: a fat
    error tail says the signature is too short for the doc-length mix.

    Scale shape: candidates from the capped band self-join (the existing
    subquadratic path); the signature agreement is one join against the
    tiny per-doc signature table; exact Jaccard runs on candidates only
    (:func:`_verify_jaccard` at threshold 0)."""
    # cand feeds the estimate join AND the exact verify — materialize or
    # the capped band self-join executes twice; the shingle rows go to
    # _verify_jaccard's fast path so the tokenization isn't re-run either
    cand = materialize(minhash_candidates(docs, n_seeds, bands, n, max_bucket))
    sh = shingle_rows(docs, text_col="text", n=n)
    sig = materialize(minhash_signatures(docs, n_seeds, n))
    sig_a = sig.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh_{i}").alias(f"a_{i}") for i in range(n_seeds)],
    )
    sig_b = sig.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh_{i}").alias(f"b_{i}") for i in range(n_seeds)],
    )
    agree = None
    for i in range(n_seeds):
        t = (F.col(f"a_{i}") == F.col(f"b_{i}")).cast("int")
        agree = t if agree is None else agree + t
    est = (
        cand.join(sig_a, "doc_a")
        .join(sig_b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(agree / F.lit(float(n_seeds)), 6).alias("est_jaccard"),
        )
    )
    exact = _verify_jaccard(cand, docs, 0.0, n, shingles=sh)
    return est.join(exact, ["doc_a", "doc_b"]).select(
        "doc_a",
        "doc_b",
        "est_jaccard",
        "jaccard",
        F.round(F.abs(F.col("est_jaccard") - F.col("jaccard")), 6).alias(
            "abs_err"
        ),
    )


def ngram_novelty(docs: DataFrame, n: int = 3) -> DataFrame:
    """→ (doc_id, n_shingles, n_unique, novelty): per-document originality
    — the fraction of the doc's distinct word ``n``-grams that appear in
    NO other document (global df = 1). The inverse view of the dedup
    family: dup_ngram_rate measures how much of the corpus is repeated,
    this scores each doc by how much of it is fresh — a curation signal
    (novelty ≈ 0 → boilerplate/syndication even when no single pair
    crosses the near-dup threshold; docs shorter than ``n`` words carry
    no shingles and are absent, same as the dedup operators).

    Scale shape: shingle rows feed BOTH the df count and the join-back
    left side — materialized once (query-scoped pin, the house pattern
    for corpus-sized intermediates) so the tokenization pass runs once,
    then one combinable df count keyed by shingle, the join back on the
    same key, and a per-doc rollup. Hot shingles skew the df JOIN's key
    distribution, but the df table's per-key row count is 1 by
    construction, so the join fan-out is bounded by the shingle rows
    themselves — no quadratic bucket."""
    sh = materialize(shingle_rows(docs, n=n))
    df_counts = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    return (
        sh.join(df_counts, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum((F.col("df") == 1).cast("long")).cast("long").alias("n_unique"),
        )
        .withColumn(
            "novelty", F.round(F.col("n_unique") / F.col("n_shingles"), 6)
        )
        .orderBy("doc_id")
    )


def cms_cells(key_col, depth: int, width: int) -> F.Column:
    """The ONE Count-Min-Sketch cell derivation: array of (r, c) structs,
    one per sketch row, c = seeded hash60 of the key mod ``width`` —
    shared by the batch estimate-quality audit
    (datapipe/queries.q_cms_estimate_quality) and the streaming
    heavy-hitters gate (streaming/cms_stream.py), so the offline accuracy
    measurement describes exactly the sketch the online gate maintains
    (the bloom_position_array contract, for counts)."""
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    return F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                (hash60(c, seed=f"cms{r}:") % width).alias("c"),
            )
            for r in range(depth)
        ]
    )


def lower_token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """→ (tok, tf): lowercased whitespace-token counts, NULL text out of
    contract — the ONE tokenize-and-count front end shared by the CMS
    batch audit and the streaming heavy-hitters gate (both sketch faces
    MUST count the same tokens or the offline accuracy measurement stops
    describing the online sketch)."""
    return (
        docs.filter(F.col(text_col).isNotNull())
        .select(F.explode(F.split(F.lower(text_col), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def cms_cell_counts(tf: DataFrame, depth: int, width: int) -> DataFrame:
    """→ (r, c, n): CMS cell counters from a (tok, tf) count table — the
    ONE sketch-build step shared by both CMS faces (fans the COUNTED
    table over the depth rows, never occurrence rows)."""
    return (
        tf.select("tf", F.explode(cms_cells("tok", depth, width)).alias("p"))
        .groupBy(F.col("p.r").alias("r"), F.col("p.c").alias("c"))
        .agg(F.sum("tf").cast("long").alias("n"))
    )
