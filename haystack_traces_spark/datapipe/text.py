"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting (winnowing). All pure Column expressions."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from haystack_traces_spark.datapipe.hashing import hash60, ordered_word_shingles
from haystack_traces_spark.session import materialize

EN_STOPWORDS = ("the", "a", "of", "and", "in", "to", "is")
# tiny marker lists for the n-gram/stopword language heuristic
LANG_MARKERS = {
    "en": ("the", "a", "and", "of"),
    "es": ("el", "la", "de", "que"),
    "de": ("der", "die", "und", "das"),
    "fr": ("le", "la", "et", "les"),
}


def _tokens(text_col: str = "text"):
    return F.split(F.col(text_col), " ")


def text_stats(
    docs: DataFrame, text_col: str = "text", extra_cols: tuple = ()
) -> DataFrame:
    """→ per-doc token counts + quality features + composite score.

    BPE-ish token estimate: whitespace tokens + one extra per 4 chars of
    long words (subword pieces), a cheap deterministic proxy.
    ``extra_cols``: input columns to carry through the projection (it is
    map-only, so passthrough beats a re-join for callers that need e.g.
    the source column alongside the score)."""
    toks = _tokens(text_col)
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col))
    n_distinct = F.size(F.array_distinct(toks))
    stop_hits = F.size(
        F.filter(toks, lambda w: F.lower(w).isin(list(EN_STOPWORDS)))
    )
    long_word_extra = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        # explicit floor: Spark double→int casts truncate but DuckDB rounds
        lambda acc, w: acc
        + F.when(F.length(w) > 4, F.floor((F.length(w) - 1) / F.lit(4)))
        .otherwise(F.lit(0))
        .cast("long"),
    )
    digit_chars = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[0-9]", ""))
    punct_chars = n_chars - F.length(
        F.regexp_replace(F.col(text_col), r"[^a-zA-Z0-9 ]", "")
    )
    return docs.select(
        "doc_id",
        *[F.col(c) for c in extra_cols],
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        n_distinct.cast("long").alias("n_distinct_tokens"),
        (n_tokens + long_word_extra).cast("long").alias("n_bpe_est"),
        F.round(stop_hits / n_tokens, 6).alias("stopword_ratio"),
        F.round(n_distinct / n_tokens, 6).alias("ttr"),
        F.round(digit_chars / n_chars, 6).alias("digit_ratio"),
        F.round(punct_chars / n_chars, 6).alias("punct_ratio"),
        F.round(
            (stop_hits / n_tokens) * 0.4
            + (n_distinct / n_tokens) * 0.4
            + F.when(n_tokens.between(10, 1000), 0.2).otherwise(0.0),
            6,
        ).alias("quality_score"),
    )


# Fixed public-style linear quality model (fasttext-classifier proxy): the
# weights are literals — deterministic everywhere, no training artifact to
# ship. Signs follow the usual curation priors: stopword density and lexical
# diversity up-weight prose; digit/punctuation density down-weight tables,
# code dumps and boilerplate; log length mildly favors fuller documents.
QUALITY_WEIGHTS = {
    "intercept": -3.0,
    "stopword_ratio": 8.0,
    "ttr": 2.0,
    "digit_ratio": -10.0,
    "punct_ratio": -5.0,
    "log1p_tokens": 0.5,
}


def quality_classifier(
    docs: DataFrame, text_col: str = "text", keep_cols: tuple = ()
) -> DataFrame:
    """→ (doc_id, score, keep[, *keep_cols]): logistic quality score from the
    :func:`text_stats` features with fixed literal weights
    (``QUALITY_WEIGHTS``) — the shape of a fasttext/linear quality
    classifier (CCNet, Brown et al. 2020 WebText filter) without a model
    artifact: score = σ(w·x), keep = score ≥ 0.5.

    Built ON the text_stats projection, so features are the same rounded
    values the oracle computes — map-only, one scan, no shuffle, and the
    logistic arithmetic is plain codegen math."""
    W = QUALITY_WEIGHTS
    feats = text_stats(docs, text_col)
    z = (
        F.lit(W["intercept"])
        + F.col("stopword_ratio") * W["stopword_ratio"]
        + F.col("ttr") * W["ttr"]
        + F.col("digit_ratio") * W["digit_ratio"]
        + F.col("punct_ratio") * W["punct_ratio"]
        + F.log1p(F.col("n_tokens")) * W["log1p_tokens"]
    )
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return feats.select(
        "doc_id",
        F.round(score, 6).alias("score"),
        (score >= 0.5).alias("keep"),
        # text_stats feature passthroughs (e.g. n_tokens) — map-only, so
        # carrying them beats a re-join for callers that weight by tokens
        *keep_cols,
    )


def gopher_rules(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """→ per-doc Gopher-style quality gate (Rae et al. 2021, "Scaling
    Language Models", table A1 filter heuristics): word-count bounds, mean
    word length in [3,10], symbol-to-word ratio (# and ... marks), ≥80%
    words containing an alphabetic char, and ≥2 distinct stopwords present.
    Emits each rule as its own flag plus the conjunctive ``keep`` so a
    curator can see WHICH rule kills a doc, not just that one did. The
    published line-level rules (bullet/ellipsis line starts) don't apply
    to this corpus's single-line docs and are intentionally out.

    Pure Column expressions end to end — one scan, no shuffle, fully
    codegen'd; this is a map-only operator at any scale."""
    toks = _tokens(text_col)
    n_words = F.size(toks)
    sum_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    mean_len = sum_len / n_words
    text = F.col(text_col)
    hash_marks = F.length(text) - F.length(F.translate(text, "#", ""))
    ellipses = (
        F.length(text) - F.length(F.expr(f"replace({text_col}, '...', '')"))
    ) / 3
    symbol_ratio = (hash_marks + ellipses) / n_words
    alpha_frac = F.size(F.filter(toks, lambda w: w.rlike("[A-Za-z]"))) / n_words
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(toks, lambda w: F.lower(w))),
            F.array(*[F.lit(s) for s in EN_STOPWORDS]),
        )
    )
    r_words = n_words.between(min_words, max_words)
    r_mean_len = (mean_len >= min_mean_len) & (mean_len <= max_mean_len)
    r_symbols = symbol_ratio < max_symbol_ratio
    r_alpha = alpha_frac >= min_alpha_frac
    r_stop = stop_hits >= min_stop_hits
    return docs.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        stop_hits.cast("long").alias("stop_hits"),
        r_words.alias("ok_word_count"),
        r_mean_len.alias("ok_mean_word_len"),
        r_symbols.alias("ok_symbol_ratio"),
        r_alpha.alias("ok_alpha_words"),
        r_stop.alias("ok_stopwords"),
        (r_words & r_mean_len & r_symbols & r_alpha & r_stop).alias("keep"),
    )


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """→ (doc_id, lang_pred, confidence): marker-word hit-count heuristic
    with deterministic tie order en>es>de>fr, 'und' (unknown) when no hits."""
    toks = F.transform(_tokens(text_col), lambda w: F.lower(w))

    def marker_filter(markers):
        # unary closure: PySpark HOF lambdas must take exactly one arg
        return lambda w: w.isin(list(markers))

    hit_cols = {
        lang: F.size(F.filter(toks, marker_filter(markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    best = F.greatest(*hit_cols.values())
    pred = F.lit("und")
    # reversed: earlier langs win ties via later .when precedence
    for lang in reversed(list(LANG_MARKERS)):
        pred = F.when(hit_cols[lang] == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best == 0, F.lit("und")).otherwise(pred)
    n_tokens = F.size(_tokens(text_col))
    return docs.select(
        "doc_id",
        pred.alias("lang_pred"),
        F.round(best / n_tokens, 6).alias("confidence"),
    )


def token_histogram(docs: DataFrame, top_n: int = 100, text_col: str = "text") -> DataFrame:
    """→ (token, n): top-N corpus token frequencies (lowercased).

    One explode + hash-agg with map-side combine — the canonical
    vocabulary-building pass; at 100 TB this is a single shuffle of
    pre-combined (token, partial-count) pairs, and top-N is
    TakeOrderedAndProject. Tie order (n desc, token asc) is deterministic."""
    return (
        docs.select(
            F.explode(F.transform(_tokens(text_col), lambda w: F.lower(w))).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(top_n)
    )


def token_percentiles(
    docs: DataFrame, text_col: str = "text", approx: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """→ per-language token-count percentiles (p50/p90/p99).

    Exact `percentile` (linear interpolation, identical to DuckDB
    quantile_cont) is the oracle face; ``approx=True`` is the 100 TB
    SCALE DEFAULT (SCALE.md §5 dual-face table): `percentile_approx` is a
    mergeable sketch whose partials combine map-side, where exact
    percentile buffers every group value. Same plan shape either way."""
    if approx:
        def q(p):
            return F.expr(
                f"percentile_approx(n_tokens, {p}, {accuracy})"
            ).cast("double")
    else:
        def q(p):
            return F.expr(f"percentile(n_tokens, {p})")

    n_tokens = F.size(_tokens(text_col)).cast("long")
    return (
        docs.select("lang", n_tokens.alias("n_tokens"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(q(0.5), 6).alias("p50"),
            F.round(q(0.9), 6).alias("p90"),
            F.round(q(0.99), 6).alias("p99"),
        )
        .orderBy("lang")
    )


def unigram_logprob(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """→ (doc_id, n_tokens, avg_logprob, ppl): unigram-LM pseudo-perplexity
    quality signal — the self-trained stand-in for a KenLM perplexity filter
    (CCNet-style): token probabilities come from the corpus's own unigram
    frequencies, each doc is scored by its mean token log-probability, and
    ``ppl = exp(-avg_logprob)`` (high = unusual token mix, low = stereotyped).

    Scale shape: ONE vocabulary aggregate (map-side-combined token counts —
    the token-histogram pass), the corpus total folded in as a broadcast
    single-row join, then a token→count join back to the exploded corpus and
    a per-doc average. At 100 TB the token join is the only wide shuffle and
    both sides are pre-combined; no Python in the loop."""
    toks = docs.select(
        "doc_id",
        F.explode(F.transform(_tokens(text_col), lambda w: F.lower(w))).alias("token"),
    )
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    total = counts.agg(F.sum("c").alias("total"))
    per_doc = (
        toks.join(counts, "token")
        .join(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.avg(F.log(F.col("c") / F.col("total"))).alias("alp"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        F.round("alp", 6).alias("avg_logprob"),
        F.round(F.exp(-F.col("alp")), 6).alias("ppl"),
    )


#: BPE-ish pretokenizer: letter runs, digit runs, punctuation runs — the
#: GPT-2-family pre-split shape, restricted to constructs Java regex and
#: DuckDB's RE2 evaluate identically (ASCII classes, no lookaround).
PRETOKEN_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+"


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """→ (doc_id, n_ws_tokens, n_re_tokens, tokens_per_word): whitespace
    token count vs BPE-ish pretokenizer count per doc. The ratio is the
    pre-split inflation a subword tokenizer would see (punctuation-dense
    or digit-dense text inflates most) — the standard cheap stand-in for
    "how many tokens will this cost" when no trained tokenizer is in the
    container. Pure per-row expressions: map-only, no shuffle, no Python."""
    ws = F.size(F.split(F.col(text_col), " "))
    re_toks = F.size(F.regexp_extract_all(text_col, F.lit(PRETOKEN_RE), F.lit(0)))
    return docs.select(
        "doc_id",
        ws.cast("long").alias("n_ws_tokens"),
        re_toks.cast("long").alias("n_re_tokens"),
        F.round(re_toks / ws, 6).alias("tokens_per_word"),
    )


def bigram_logprob(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """→ (doc_id, n_bigrams, avg_logprob, ppl): bigram-LM pseudo-perplexity —
    the next signal up from :func:`unigram_logprob`'s bag-of-words score:
    each doc is scored by the mean log MLE transition probability
    ``P(w2|w1) = c(w1 w2) / c(w1)`` over its adjacent lowercased token
    pairs (``c(w1)`` = corpus-wide token occurrences). Templated/repetitive
    text has near-deterministic transitions (ppl → 1); token-salad scores
    high even when its unigram mix looks normal. Docs with fewer than two
    tokens have no transitions and drop out (same on the oracle side).

    Scale shape: bigram + unigram counts are two map-side-combined
    aggregates; scoring is one hash join on the bigram key and one
    broadcast-friendly join on the first-token key, then a per-doc
    average — the unigram_logprob discipline with one extra join."""
    from haystack_traces_spark.datapipe.hashing import ordered_word_shingles

    bi = docs.select(
        "doc_id", F.explode(ordered_word_shingles(text_col, 2)).alias("p")
    ).select("doc_id", F.lower("p").alias("p"))
    toks = docs.select(
        F.explode(F.transform(_tokens(text_col), lambda w: F.lower(w))).alias("w1")
    )
    bc = bi.groupBy("p").agg(F.count(F.lit(1)).alias("cb"))
    uc = toks.groupBy("w1").agg(F.count(F.lit(1)).alias("cu"))
    probs = (
        bc.withColumn("w1", F.split("p", " ")[0])
        .join(uc, "w1")
        .select("p", F.log(F.col("cb") / F.col("cu")).alias("lp"))
    )
    per_doc = (
        bi.join(probs, "p")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.avg("lp").alias("alp"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_bigrams",
        F.round("alp", 6).alias("avg_logprob"),
        F.round(F.exp(-F.col("alp")), 6).alias("ppl"),
    )


def tfidf_keywords(
    docs: DataFrame, k: int = 3, text_col: str = "text"
) -> DataFrame:
    """→ (doc_id, term, tfidf, rank): the top-``k`` tf-idf terms per doc —
    classic keyword extraction / doc-representation primitive (topic
    bucketing, near-dup explanation, index enrichment all start here).

    tf = in-doc count of the lowercased token; idf = ln(N / df) with df =
    docs containing the term. Scale shape: the df table is one map-side-
    combinable distinct-aggregate keyed by term, joined back onto the
    per-doc term counts; ranking is a per-DOC window (never global). Ties
    break (tfidf desc, term asc) for cross-engine determinism; idf of an
    everywhere-term is 0, so such terms only surface when nothing else
    exists. Ranking runs on the 6dp-ROUNDED tfidf (the house
    round-before-any-cross-engine-compare rule, as in embedding_outliers):
    libm ln differs between the JVM and DuckDB in the last ulps, and an
    unrounded rank key would let those flip top-k membership."""
    from pyspark.sql import Window

    toks = docs.select(
        "doc_id",
        F.explode(
            F.transform(_tokens(text_col), lambda w: F.lower(w))
        ).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_t = toks.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        tf.join(df_t, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "doc_id",
            "term",
            "tfidf",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def ppl_buckets(
    docs: DataFrame,
    n_buckets: int = 3,
    text_col: str = "text",
    approx: bool = False,
) -> DataFrame:
    """→ (doc_id, ppl, bucket, label): CCNet-style perplexity bucketing
    (Wenzek et al. 2020) — every doc lands in one of ``n_buckets``
    equal-count quantile buckets of the :func:`bigram_logprob` pseudo-
    perplexity (bucket 0 = head/lowest ppl, last = tail). ``label`` names
    the classic head/middle/tail tertiles when n_buckets == 3.

    Default path (the oracle face): bucket = ⌊n_buckets·(rank−1)/n⌋ under
    the total order (ppl, doc_id) — integer-deterministic, no float
    boundary comparisons, but the rank is a GLOBAL window over the
    doc-level table. Fine for doc-level scalars into the billions-of-rows
    range only if you accept a single-partition sort stage, so
    ``approx=True`` is the 100 TB path: boundaries from percentile_approx
    on the ppl column (one aggregate, broadcast), assignment by
    comparison — no global window; buckets are approximately-equal-count,
    and the label semantics are identical."""
    from pyspark.sql import Window

    scored = bigram_logprob(docs, text_col).select("doc_id", "ppl")
    if approx:
        qs = [i / n_buckets for i in range(1, n_buckets)]
        bounds = scored.agg(
            F.percentile_approx("ppl", qs, 100_000).alias("bs")
        )
        bucket = F.lit(0)
        for i in range(n_buckets - 1):
            bucket = bucket + (F.col("ppl") > F.element_at("bs", i + 1)).cast("int")
        out = scored.crossJoin(F.broadcast(bounds)).select(
            "doc_id", "ppl", bucket.cast("long").alias("bucket")
        )
    else:
        w = Window.orderBy(F.col("ppl").asc(), F.col("doc_id").asc())
        # total count as a global window aggregate: same single-partition
        # stage the rank already pays, and `scored` (the whole
        # bigram_logprob subtree) is evaluated ONCE — the former separate
        # count branch + crossJoin re-executed it per action
        out = scored.select(
            "doc_id",
            "ppl",
            F.floor(
                F.lit(n_buckets)
                * (F.row_number().over(w) - 1)
                / F.count(F.lit(1)).over(Window.partitionBy())
            )
            .cast("long")
            .alias("bucket"),
        )
    if n_buckets == 3:
        label = (
            F.when(F.col("bucket") == 0, "head")
            .when(F.col("bucket") == 1, "middle")
            .otherwise("tail")
        )
    else:
        label = F.concat(F.lit("b"), F.col("bucket").cast("string"))
    return out.withColumn("label", label)


def bpe_pair_stats(
    docs: DataFrame, top_n: int = 50, text_col: str = "text"
) -> DataFrame:
    """→ (pair, n): most frequent adjacent-token pairs (lowercased) — the
    merge-candidate statistics of one BPE training round (Sennrich et al.
    2016), computed corpus-wide at the word level.

    Same shape as the token histogram: one explode of ordered 2-grams, one
    map-side-combined count, TakeOrderedAndProject top-N. Deterministic
    tie order (n desc, pair asc)."""
    return (
        docs.select(F.explode(ordered_word_shingles(text_col, 2)).alias("p"))
        .select(F.lower("p").alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair").asc())
        .limit(top_n)
    )


def pmi_collocations(
    docs: DataFrame,
    min_count: int = 5,
    top_n: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """→ (pair, n, pmi): top-``top_n`` adjacent-token collocations by
    pointwise mutual information — PMI(w1,w2) = ln(c(w1w2)·N / (c(w1)·c(w2)))
    over lowercased pairs seen ≥ ``min_count`` times (Church & Hanks 1990).
    The phrase-mining primitive: high-PMI pairs are multi-word units a
    tokenizer or n-gram blocklist should treat as one symbol.

    Scale shape: three map-side-combinable aggregates (pair counts, token
    counts, one-row total); token counts join the FILTERED pair table
    twice (first/second position) as broadcast-friendly equi-joins; top-N
    is TakeOrderedAndProject. Ties break (pmi desc, pair asc)."""
    toks = docs.select(
        F.explode(
            F.transform(_tokens(text_col), lambda w: F.lower(w))
        ).alias("w")
    )
    uc = toks.groupBy("w").agg(F.count(F.lit(1)).alias("cu"))
    n_tok = toks.agg(F.count(F.lit(1)).alias("n_tok"))
    pairs = (
        docs.select(F.explode(ordered_word_shingles(text_col, 2)).alias("p"))
        .select(F.lower("p").alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
    )
    split = F.split("pair", " ")
    return (
        pairs.withColumn("w1", split[0])
        .withColumn("w2", split[1])
        .join(uc.select(F.col("w").alias("w1"), F.col("cu").alias("c1")), "w1")
        .join(uc.select(F.col("w").alias("w2"), F.col("cu").alias("c2")), "w2")
        .crossJoin(F.broadcast(n_tok))
        .select(
            "pair",
            F.col("n").cast("long").alias("n"),
            # cast to double BEFORE multiplying: n * n_tok and c1 * c2
            # overflow bigint at real corpus scale (2e13 tokens x 1e9-count
            # pair ≈ 2e22 > 2^63 → ANSI ArithmeticException); double keeps
            # the 6dp-rounded PMI identical on both engines
            F.round(
                F.log(
                    (F.col("n").cast("double") * F.col("n_tok"))
                    / (F.col("c1").cast("double") * F.col("c2"))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), F.col("pair").asc())
        .limit(top_n)
    )


def bm25_search(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, n_hit_terms, score, rank): Okapi BM25 top-k ranked
    retrieval for a bag of query terms.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·len_d/avgdl)),
    idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)).

    Scale shape: the corpus scan filters to QUERY TERMS FIRST (an isin
    literal filter, pushed to the scan), so every downstream aggregate —
    per-(doc,term) tf, per-term df — runs on the tiny hit set; N/avgdl is
    a single-row broadcast; final ranking is top-k (TakeOrderedAndProject,
    never a global sort). Scores are rounded to 6dp BEFORE ranking so the
    float-sum ordering is reproducible across engines; ties break by
    doc_id."""
    terms = [t.lower() for t in query_terms]
    toks = docs.select(
        "doc_id",
        F.explode(F.transform(_tokens(text_col), lambda w: F.lower(w))).alias(
            "token"
        ),
    )
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size(_tokens(text_col))).alias("avgdl"),
    )
    doclen = docs.select("doc_id", F.size(_tokens(text_col)).alias("dl"))
    tf = (
        toks.filter(F.col("token").isin(terms))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    contrib = (
        tf.join(F.broadcast(dfreq), "token")
        .join(F.broadcast(stats))
        .join(doclen, "doc_id")
        .select(
            "doc_id",
            (
                idf
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("term_score"),
        )
    )
    scored = contrib.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_hit_terms"),
        F.round(F.sum("term_score"), 6).alias("score"),
    )
    from pyspark.sql import Window

    # top-k FIRST (TakeOrderedAndProject — per-partition heaps, never a
    # global sort); the rank window then runs over ≤ k rows
    topk = scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return topk.withColumn("rank", F.row_number().over(w).cast("long"))


def _winnow_fps(
    docs: DataFrame, text_col: str = "text", n: int = 3, window: int = 4
) -> DataFrame:
    """→ (doc_id, fps): each doc's DISTINCT winnowing fingerprint set.

    The hash array and the minima array are materialized as their own
    projection columns on purpose: the window-minima lambda references the
    hash array per position, and an inline expression tree there gets
    re-evaluated per position (|doc| md5 calls × |doc| positions — a
    measured ~500× blowup at 200-word docs). As separate projections each
    array is computed once per row, and CollapseProject will not inline an
    expensive producer that the consumer references more than once.

    The too-short-to-shingle docs (no fingerprint row, matching the SQL
    mirror where they never enter the positional-hash CTE) are dropped
    BEFORE the hash projection, on the equivalent cheap predicate
    "≥ n words": a trailing filter on n_fingerprints would be
    predicate-pushed through every projection, re-inlining the whole
    winnowing tree into one Filter over raw text — the same ~500×
    re-evaluation the projections exist to prevent."""
    hashed = docs.filter(
        F.size(F.split(F.col(text_col), " ")) >= n
    ).select(
        "doc_id",
        F.transform(
            ordered_word_shingles(text_col, n),
            lambda s: F.conv(
                F.substring(F.md5(F.concat(F.lit("fp:"), s)), 1, 15), 16, 10
            ).cast("long"),
        ).alias("h"),
    )
    h = F.col("h")
    n_h = F.size(h)
    win_idx = F.sequence(F.lit(0), F.greatest(n_h - window, F.lit(0)))
    minima = F.when(
        n_h >= window,
        F.array_distinct(
            F.transform(win_idx, lambda i: F.array_min(F.slice(h, i + 1, window)))
        ),
    ).otherwise(F.when(n_h > 0, F.array(F.array_min(h))).otherwise(F.array().cast("array<bigint>")))
    return hashed.select("doc_id", minima.alias("fps"))


def winnowing_fingerprints(
    docs: DataFrame, text_col: str = "text", n: int = 3, window: int = 4
) -> DataFrame:
    """Winnowing (local-minimum sampling of the rolling shingle-hash
    sequence): fingerprint set = distinct min-of-window over positional
    hashes. → (doc_id, n_fingerprints, min_fp, max_fp)."""
    return _winnow_fps(docs, text_col, n, window).select(
        "doc_id",
        F.size("fps").cast("long").alias("n_fingerprints"),
        F.array_min("fps").alias("min_fp"),
        F.array_max("fps").alias("max_fp"),
    )


def winnow_overlap_pairs(
    docs: DataFrame,
    min_shared: int = 2,
    text_col: str = "text",
    n: int = 3,
    window: int = 4,
    max_df: int = 100,
) -> DataFrame:
    """→ (doc_a, doc_b, n_shared, overlap): doc pairs sharing winnowing
    fingerprints — the MOSS-style LOCAL-overlap detector. Winnowing samples
    position-local minima, so a long doc QUOTING a passage of another
    still collides on that passage's fingerprints even when whole-set
    Jaccard is far below any dedup threshold (containment/excerpt cases
    the set-similarity family misses by construction). overlap =
    |shared| / min(|fps_a|, |fps_b|) — containment-normalized, so an
    excerpt wholly inside a bigger doc scores ~1.

    Same shape as every candidate-family operator: the fingerprint table
    joins itself on fp equality (join volume ∝ fingerprint co-occurrence,
    never |docs|²) and is materialized once for both sides.

    max_df drops fingerprints appearing in more than that many documents
    BEFORE the self-join (the df-filter join keys on fp, so it rides the
    same hash partitioning the self-join needs — one logical shuffle key
    end to end). Without it, one boilerplate passage shared by a million
    docs at corpus scale turns its fingerprints into 10^12 join rows; a
    fingerprint that common identifies template text, not interesting
    overlap. nf (the normalizer) deliberately counts the doc's FULL
    fingerprint set, so dropping hot fingerprints can only lower overlap
    scores, never inflate them."""
    # Persist the COMPACT per-doc fps arrays, and explode only on top of
    # the cache boundary. Explode is a Generate node, and Generate inlines
    # its child expression past the anti-collapse projections _winnow_fps
    # relies on — exploding the raw plan re-evaluates the positional hash
    # array per window position (measured 50×: 34 s → 0.7 s at sf0.01).
    # The cache is also the usual one-materialization-for-both-join-sides
    # barrier; at cluster scale swap persist for a checkpoint/table write.
    fps_tbl = materialize(_winnow_fps(docs, text_col, n, window))
    fp_rows = fps_tbl.select("doc_id", F.explode("fps").alias("fp"))
    # fps is already distinct per doc, so |fps| == the exploded row count
    sizes = fps_tbl.select("doc_id", F.size("fps").alias("nf"))
    rare = (
        fp_rows.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_df)
        .select("fp")
    )
    fp_join = fp_rows.join(rare, "fp")
    a = fp_join.alias("a")
    b = fp_join.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("nf").alias("nf_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("nf").alias("nf_b"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.col("n_shared").cast("long").alias("n_shared"),
            F.round(
                F.col("n_shared") / F.least("nf_a", "nf_b"), 6
            ).alias("overlap"),
        )
    )


def chunk_windows(
    docs: DataFrame,
    window: int = 64,
    overlap: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, chunk_idx, start_tok, chunk_tokens): fixed-width
    token-window chunking plan with overlap — the context-window prep step
    of an LLM training pipeline (each row is one training-example slice;
    the overlap keeps boundary context). Sibling of the media
    ``chunk_plan`` (multimodal.py) on the TEXT modality.

    Chunk k starts at ``k * (window - overlap)``; the last chunk is
    truncated to the doc tail; a doc shorter than one window yields one
    chunk (``''`` splits to one empty token, so it gets a 1-token chunk —
    both engines agree); a NULL text yields none (size(split(NULL)) is -1
    here; the oracle filters NULL text to match). Scale shape: pure
    per-row expressions
    (one sequence + explode) — map-only, zero shuffle, the plan parallels
    to however many executors scan the corpus."""
    if overlap >= window:
        # stride <= 0 would divide by zero (NULL under non-ANSI Spark —
        # silently collapsing every long doc to one chunk) or, negative,
        # emit negative start_tok rows (ADVICE r5)
        raise ValueError(
            f"overlap ({overlap}) must be < window ({window})"
        )
    stride = window - overlap
    n = F.size(_tokens(text_col))
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
        F.lit(1)
        + F.greatest(
            F.ceil((n - F.lit(window)) / F.lit(float(stride))), F.lit(0)
        )
    )
    base = docs.select(
        "doc_id",
        n.alias("n_toks"),
        n_chunks.cast("int").alias("k"),
    )
    start = (F.col("chunk_idx") * stride).cast("long")
    return (
        base.filter(F.col("k") > 0)
        .select(
            "doc_id",
            "n_toks",
            F.explode(F.sequence(F.lit(0), F.col("k") - 1)).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            start.alias("start_tok"),
            F.least(F.lit(window).cast("long"), F.col("n_toks") - start)
            .cast("long")
            .alias("chunk_tokens"),
        )
    )


def zipf_fit(
    docs: DataFrame, top_n: int = 1000, text_col: str = "text"
) -> DataFrame:
    """→ (source, n_vocab, zipf_slope, zipf_intercept): per-source OLS fit
    of ln(freq) ~ ln(rank) over the source's ``top_n`` most frequent
    lowercased tokens. Natural text tracks slope ≈ −1 (Zipf's law);
    machine-generated / templated / boilerplate-heavy feeds bend the
    curve — a flat head (slope ≫ −1) means token spam, a cliff
    (slope ≪ −1) means tiny effective vocabulary. A corpus-health
    fingerprint that needs no labels.

    Scale shape: one combinable (source, token) count shuffle, a rank
    window per SOURCE over its vocabulary (bounded by vocab, not corpus;
    pre-filter rare tokens to cap it further at extreme vocab), and a
    per-source OLS aggregate (sums/avgs — map-side combinable). Rank
    ties break (count desc, token asc) so the fitted set is
    deterministic cross-engine."""
    from pyspark.sql import Window

    toks = docs.select(
        "source",
        F.explode(
            F.transform(_tokens(text_col), lambda w: F.lower(w))
        ).alias("w"),
    )
    counts = toks.groupBy("source", "w").agg(F.count(F.lit(1)).alias("cn"))
    win = Window.partitionBy("source").orderBy(
        F.col("cn").desc(), F.col("w").asc()
    )
    ranked = counts.withColumn("r", F.row_number().over(win)).filter(
        F.col("r") <= top_n
    )
    x = F.log(F.col("r").cast("double"))
    y = F.log(F.col("cn").cast("double"))
    agg = ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(x).alias("mx"),
        F.avg(y).alias("my"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    slope = (F.col("sxy") - F.col("n") * F.col("mx") * F.col("my")) / (
        F.col("sxx") - F.col("n") * F.col("mx") * F.col("mx")
    )
    return agg.select(
        "source",
        F.col("n").cast("long").alias("n_vocab"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round(F.col("my") - slope * F.col("mx"), 6).alias("zipf_intercept"),
    ).orderBy("source")


def char_entropy(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """→ (doc_id, n_chars, n_distinct_chars, char_entropy): per-document
    Shannon entropy of the character distribution,
    H = ln(n) − Σ c·ln(c) / n (nats). The cheap gibberish detector:
    base64 blobs / hex dumps sit near the uniform ceiling, repeated-char
    spam near 0, natural language in a tight band — a standard fasttext-
    era quality feature computed without any model.

    Scale shape: one combinable (doc_id, char) count shuffle (per-doc
    alphabet is tiny, so partials collapse map-side) and one per-doc
    rollup. No windows, no Python."""
    ch = docs.select(
        "doc_id", F.explode(F.split(F.col(text_col), "")).alias("ch")
    ).filter(F.col("ch") != "")
    counts = ch.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("cn"))
    n = F.sum("cn")
    return (
        counts.groupBy("doc_id")
        .agg(
            n.cast("long").alias("n_chars"),
            F.count(F.lit(1)).cast("long").alias("n_distinct_chars"),
            F.round(
                F.log(n.cast("double"))
                - F.sum(F.col("cn") * F.log(F.col("cn").cast("double"))) / n,
                6,
            ).alias("char_entropy"),
        )
        .orderBy("doc_id")
    )


def window_cooccurrence(
    docs: DataFrame,
    window: int = 3,
    top_n: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """→ (w1, w2, n): top-``top_n`` unordered token co-occurrence pairs
    within a ±``window`` token window — the skip-gram count table
    (word2vec/GloVe input, association mining beyond pmi_collocations'
    adjacent bigrams). Pairs are canonical (w1 ≤ w2).

    Scale shape: the quadratic-looking window join is linearized — the
    left side explodes each position into its ``window`` forward target
    positions, turning proximity into an EQUI-join on (doc_id, pos)
    (co-partitioned, positions unique per doc → no skew); pair counts
    combine map-side; top-N is TakeOrderedAndProject. Work is
    window × tokens, never tokens². The positioned-token table feeds
    both join sides — materialized once so the corpus is scanned and
    tokenized once, not per side."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    toks = materialize(
        docs.select(
            "doc_id",
            F.posexplode(
                F.transform(_tokens(text_col), lambda w: F.lower(w))
            ).alias("pos", "w"),
        )
    )
    left = toks.select(
        "doc_id",
        F.explode(
            F.sequence(F.col("pos") + 1, F.col("pos") + window)
        ).alias("pos2"),
        F.col("w").alias("wa"),
    )
    right = toks.select(
        "doc_id", F.col("pos").alias("pos2"), F.col("w").alias("wb")
    )
    return (
        left.join(right, ["doc_id", "pos2"])
        .select(
            F.least("wa", "wb").alias("w1"),
            F.greatest("wa", "wb").alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.col("n").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(top_n)
    )


def token_burstiness(docs: DataFrame, top_n: int = 50) -> DataFrame:
    """→ (token, n_docs_with, total_cnt, burstiness): variance-to-mean
    ratio of per-document counts for the corpus's ``top_n`` tokens,
    zeros included — Church & Gale's burstiness. VMR ≈ 1 is Poisson
    scatter (function words); VMR ≫ 1 marks topical/bursty tokens that
    concentrate in few docs — a keyword-ness signal orthogonal to raw
    frequency, and a spam tell when a "stopword" turns bursty.

    Scale shape: top-N vocab via one combinable count + TakeOrdered
    (tiny, broadcast); per-(doc, token) counts ride one combinable
    shuffle restricted to the broadcast vocab; the VMR needs only
    Σx and Σx² per token (zeros contribute nothing to either sum —
    they enter through the global doc count D, a one-row broadcast)."""
    toks = docs.select(
        "doc_id",
        F.explode(
            F.transform(_tokens("text"), lambda w: F.lower(w))
        ).alias("token"),
    )
    top = materialize(
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cn"))
        .orderBy(F.col("cn").desc(), F.col("token").asc())
        .limit(top_n)
    )
    per_doc = (
        toks.join(F.broadcast(top.select("token")), "token")
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("D"))
    mean = F.col("s1") / F.col("D")
    var = F.col("s2") / F.col("D") - mean * mean
    return (
        per_doc.groupBy("token")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs_with"),
            F.sum("c").cast("long").alias("total_cnt"),
            F.sum("c").alias("s1"),
            F.sum(F.col("c") * F.col("c")).alias("s2"),
        )
        .crossJoin(F.broadcast(n_docs))
        .select(
            "token",
            "n_docs_with",
            "total_cnt",
            F.round(var / mean, 6).alias("burstiness"),
        )
        .orderBy("token")
    )


def _bpe_seqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Word-level symbol sequences for BPE training: lowercased,
    space-split, empties dropped (split on a leading/trailing/double
    space yields '' tokens that would make merged symbols ambiguous —
    a+'' == a breaks the fold's no-self-remerge invariant)."""
    return docs.select(
        "doc_id",
        F.filter(
            F.split(F.lower(F.col(text_col)), " "), lambda x: x != ""
        ).alias("toks"),
    )


def _bpe_merge_round(seqs: DataFrame):
    """One BPE training round over symbol sequences (doc_id, toks).

    Returns ((left, right, count) or None if no adjacent pair exists,
    rewritten-seqs DataFrame). The count stage is a single exploded
    2-gram aggregation (map-side combinable; overlapping occurrences
    count, per Sennrich et al. 2016); the argmax is a 1-row bounded
    collect (ties: count desc, left asc, right asc). The REWRITE is
    map-only: a per-row left-fold (F.aggregate) that replaces greedy
    leftmost non-overlapping (left,right) adjacencies with the merged
    symbol — no shuffle, so each round costs one aggregation plus one
    scan regardless of corpus size. Symbols are plain strings (merged =
    left||right); a merged symbol never re-merges as the LEFT side of
    the same round's pair because left||right != left for non-empty
    right, which the tokenizer guarantees."""
    n1 = F.greatest(F.size("toks") - 1, F.lit(0))
    top = (
        seqs.select(
            F.explode(
                F.zip_with(
                    F.slice("toks", 1, n1),
                    F.slice("toks", 2, n1),
                    lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                )
            ).alias("p")
        )
        .groupBy("p.a", "p.b")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("a").asc(), F.col("b").asc())
        .limit(1)
        .collect()
    )
    if not top:
        return None, seqs
    a, b, n = top[0]["a"], top[0]["b"], int(top[0]["n"])
    la, lb, lm = F.lit(a), F.lit(b), F.lit(a + b)
    rewritten = seqs.select(
        "doc_id",
        F.aggregate(
            "toks",
            F.expr("CAST(array() AS ARRAY<STRING>)"),
            # F.get (0-indexed, NULL out-of-range) not element_at: ANSI
            # element_at THROWS on the empty accumulator of the first step
            lambda acc, t: F.when(
                (F.get(acc, F.size(acc) - 1) == la) & (t == lb),
                F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(lm)),
            ).otherwise(F.concat(acc, F.array(t))),
        ).alias("toks"),
    )
    return (a, b, n), rewritten


def _bpe_loop(docs: DataFrame, rounds: int, text_col: str = "text"):
    """Run ``rounds`` BPE merge rounds; returns (merges, final_seqs,
    initial_seqs). merges = [(round, left, right, merged, count), ...].
    Each round's sequences are persist()-ed LAZILY — round k+1's
    pair-count job then materializes round k's rewrite as part of its own
    scan (ONE job per round instead of the former eager-localCheckpoint
    pair, r12-opt), while the cache still stops the count stage of round
    k+1 from recomputing every prior rewrite per action (the lineage
    quadratics dedup_clusters' label propagation guards against). The
    final round's rewrite stays lazy: bpe_train never evaluates it and
    bpe_compression's aggregates materialize it exactly once."""
    seqs0 = _bpe_seqs(docs, text_col).persist()
    seqs = seqs0
    merges: list[tuple] = []
    for k in range(1, rounds + 1):
        pick, rewritten = _bpe_merge_round(seqs)
        if pick is None:
            break  # corpus exhausted all adjacent pairs (tiny inputs)
        a, b, n = pick
        merges.append((k, a, b, a + b, n))
        seqs = rewritten.persist()
    return merges, seqs, seqs0


def bpe_train(
    docs: DataFrame,
    rounds: int = 6,
    text_col: str = "text",
    loop: tuple | None = None,
) -> DataFrame:
    """→ (round, left_tok, right_tok, merged_tok, pair_count): the learned
    merge table of ``rounds`` iterations of byte-pair-encoding tokenizer
    training at the word level (Sennrich et al. 2016) — count adjacent
    symbol pairs corpus-wide, merge the argmax pair everywhere, repeat.
    The iterative-relational shape: N rounds of (tree-aggregate → 1-row
    argmax → map-only rewrite), the training loop `bpe_pairs` computes
    one round of.

    100 TB shape: per round, ONE map-side-combinable pair count (the only
    shuffle) and ONE shuffle-free rewrite scan; the collected argmax is a
    single row per round. Production tokenizer training samples the
    corpus first (a `TABLESAMPLE`/filter upstream of this operator);
    rounds is small (vocab-size budget), so total cost is rounds × one
    aggregation over the sample.

    ``loop``: optional precomputed ``_bpe_loop`` result (the session-cached
    stage case — bpe_train and bpe_compression share one training run)."""
    merges, _, _ = loop if loop is not None else _bpe_loop(docs, rounds, text_col)
    spark = docs.sparkSession
    return spark.createDataFrame(
        merges,
        "round INT, left_tok STRING, right_tok STRING, merged_tok STRING, "
        "pair_count BIGINT",
    ).orderBy("round")


def bpe_compression(
    docs: DataFrame,
    rounds: int = 6,
    text_col: str = "text",
    loop: tuple | None = None,
) -> DataFrame:
    """→ 1 row (n_docs, tok_before, tok_after, compression, vocab_before,
    vocab_after): what ``rounds`` learned BPE merges buy on the training
    corpus — total symbol count before/after applying them (compression =
    after/before) and distinct-symbol vocabulary growth (each merge adds
    ≤1 new symbol but can retire its parts). The measured-payoff face of
    `bpe_train`, computed from the ACTUAL rewritten sequences (a real
    distributed aggregate, not the merge table). ``loop`` as in
    :func:`bpe_train`."""
    _, seqs_n, seqs_0 = loop if loop is not None else _bpe_loop(docs, rounds, text_col)

    def _tot(seqs, suffix):
        return seqs.select(
            F.sum(F.size("toks")).cast("long").alias(f"tok_{suffix}")
        )

    def _vocab(seqs, suffix):
        return (
            seqs.select(F.explode("toks").alias("t"))
            .agg(F.countDistinct("t").cast("long").alias(f"vocab_{suffix}"))
        )

    n_docs = seqs_0.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    return (
        n_docs.crossJoin(F.broadcast(_tot(seqs_0, "before")))
        .crossJoin(F.broadcast(_tot(seqs_n, "after")))
        .crossJoin(F.broadcast(_vocab(seqs_0, "before")))
        .crossJoin(F.broadcast(_vocab(seqs_n, "after")))
        .select(
            "n_docs",
            "tok_before",
            "tok_after",
            F.round(
                F.col("tok_after") / F.nullif(F.col("tok_before"), F.lit(0)), 6
            ).alias("compression"),
            "vocab_before",
            "vocab_after",
        )
    )


#: HLL register-count exponent: 2^8 = 256 registers ≈ 6.5% standard error
#: (1.04/sqrt(m)) — the accuracy face measures the realized error per group
HLL_P = 8
#: alpha_m bias constant for m ≥ 128 (Flajolet et al. 2007, Fig. 3) —
#: computed ONCE in Python and injected into both faces as the same
#: literal so neither engine re-derives it with different rounding
HLL_ALPHA = 0.7213 / (1 + 1.079 / (1 << HLL_P))


def hll_distinct(
    docs: DataFrame,
    p: int = HLL_P,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """→ (source, n_exact, n_hll, rel_err): per-group distinct-token
    cardinality by HyperLogLog (Flajolet et al. 2007) next to the exact
    count — the sketch AND its measured accuracy in one row. The
    cardinality counterpart of the CMS frequency sketch: at 100 TB the
    exact COUNT(DISTINCT) needs a full shuffle of every distinct token,
    while the HLL register table is a bounded (group × 2^p)-row
    aggregate that is MERGEABLE (max per register) across partitions,
    days, and sources — the shape you pre-aggregate and union later.

    Engine-exact: tokens hash through hash60 (md5-based, bit-identical
    on Spark/DuckDB/Python); register = low ``p`` bits, rho = leading
    zeros of the remaining 60-p bits + 1 via length(bin(w)) (the
    derive_planes trick); 2^-rho sums are exact powers of two; the
    small-range linear-counting correction (raw ≤ 2.5m with empty
    registers) applies identically on both faces. n_hll rounds to 3dp —
    summation-order noise is ~1e-12 relative, far under the quantum."""
    toks = docs.select(
        F.col(group_col).alias("g"),
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), " "), lambda x: x != "")
        ).alias("w"),
    )
    regs = hll_register_rows(toks, "w", ("g",), p).groupBy("g", "reg").agg(
        F.max("rho").alias("mr")
    )
    est = hll_estimate(regs, ("g",), p)
    exact = toks.groupBy("g").agg(
        F.countDistinct("w").cast("long").alias("n_exact")
    )
    return (
        est.join(exact, "g")
        .select(
            F.col("g").alias(group_col),
            "n_exact",
            F.round("e", 3).alias("n_hll"),
            F.round(
                (F.col("e") - F.col("n_exact"))
                / F.nullif(F.col("n_exact"), F.lit(0)),
                6,
            ).alias("rel_err"),
        )
        .orderBy(group_col)
    )


def hll_register_rows(
    df: DataFrame, value_col: str, group_cols: tuple, p: int = HLL_P
) -> DataFrame:
    """→ (*group_cols, reg, rho): one HLL register observation per input
    row — register index from the low ``p`` hash bits, rho = leading-zero
    rank of the remaining 60-p bits + 1. The pre-aggregation shape both
    the batch estimator and the streaming gate's moment log share."""
    m = 1 << p
    maxrho = 60 - p + 1
    return (
        df.select(*group_cols, hash60(F.col(value_col), seed="hll:").alias("h"))
        .select(
            *group_cols,
            F.pmod("h", F.lit(m)).alias("reg"),
            # integer div, NEVER `/`+cast: h is 60-bit and float division
            # is off-by-1 past the 53-bit mantissa (verify-skill rule)
            F.expr(f"h div {m}").alias("hw"),
        )
        .select(
            *group_cols,
            "reg",
            F.when(F.col("hw") == 0, F.lit(maxrho))
            .otherwise(F.lit(maxrho) - F.length(F.bin("hw")))
            .alias("rho"),
        )
    )


def hll_estimate(
    regs: DataFrame, group_cols: tuple, p: int = HLL_P
) -> DataFrame:
    """→ (*group_cols, e): the HLL cardinality estimate from max-rho
    register rows (*group_cols, reg, mr) — harmonic mean over 2^p
    registers (absent registers contribute 2^0) with the small-range
    linear-counting correction. Pure column arithmetic, identical on
    both faces."""
    m = 1 << p
    # same expression as the HLL_ALPHA module constant (bit-identical for
    # p=HLL_P), re-derived so callers may pass a different p
    alpha = 0.7213 / (1 + 1.079 / m)
    grp = regs.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("mr"))).alias("s_present"),
        F.count(F.lit(1)).alias("n_present"),
    )
    raw = (
        F.lit(alpha)
        * F.lit(float(m * m))
        / (F.col("s_present") + (F.lit(m) - F.col("n_present")))
    )
    v = F.lit(m) - F.col("n_present")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0), F.lit(float(m)) * F.log(F.lit(m) / v)
    ).otherwise(raw)
    return grp.select(*group_cols, est.alias("e"))
