"""Property-based invariants for the per-trace pipeline (SURVEY.md §5:
property-style additions the reference's test suite lacks).

Random trace forests — dangling parents, multi-root, duplicates, zero-length
spans — checked against the repair/ordering invariants. Pure-Python level
(the same functions the applyInPandas UDFs run), so hundreds of cases are
cheap.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from haystack_traces_spark.transform import transformers as T
from haystack_traces_spark.transform.model import (
    AUTOGEN_FLAG_TAG,
    contains_tag,
)
from haystack_traces_spark.transform.pipeline import TraceProcessor
from haystack_traces_spark.transform.spantree import Forest

T0 = 1_704_067_200_000_000


@st.composite
def traces(draw, min_spans=1, max_spans=12):
    """Random flat trace: parent links may dangle, self-reference is excluded
    (ParentIdValidator rejects those), roots may be 0 or many."""
    n = draw(st.integers(min_spans, max_spans))
    spans = []
    for i in range(n):
        # acyclic links only (parents point at earlier spans): cycles have no
        # tree at all in the reference's forest builder (SpanTree.scala:90-116)
        # and the whole trace is degenerate — out of scope for repair
        parent_choices = [""] + [f"s{j}" for j in range(i)]
        spans.append(
            {
                "trace_id": "t",
                "span_id": f"s{i}",
                "parent_span_id": draw(
                    st.one_of(
                        st.sampled_from(parent_choices),
                        st.just("dangling"),
                    )
                ),
                "service_name": draw(st.sampled_from(["a", "b", "c"])),
                "operation_name": "op",
                "start_time": T0 + draw(st.integers(0, 10_000_000)),
                "duration": draw(st.integers(0, 5_000_000)),
                "tags": [],
                "logs": [],
            }
        )
    return spans


@settings(max_examples=200, deadline=None)
@given(traces())
def test_invalid_root_yields_single_empty_parent(spans):
    """After invalid_root exactly ONE span has an empty parent id (the
    RootValidator criterion). Dangling trees are re-attached later by
    invalid_parent — the reference splits the work the same way."""
    forest = T.invalid_root(Forest(spans), span_id_factory=lambda: "autogen-id")
    empty_parents = [s for s in forest.spans if s["parent_span_id"] == ""]
    assert len(empty_parents) == 1
    root = empty_parents[0]
    if root["span_id"] == "autogen-id":  # synthesized roots must be marked
        assert contains_tag(root, AUTOGEN_FLAG_TAG)


@settings(max_examples=200, deadline=None)
@given(traces())
def test_invalid_root_then_parent_resolves_all_parents(spans):
    forest = T.invalid_parent(T.invalid_root(Forest(spans)))
    out = forest.spans
    ids = {s["span_id"] for s in out}
    roots = [s for s in out if s["parent_span_id"] == ""]
    assert len(roots) == 1
    for s in out:
        if s is not roots[0] and s["parent_span_id"] != "":
            assert s["parent_span_id"] in ids


@settings(max_examples=200, deadline=None)
@given(traces(min_spans=2))
def test_clamp_keeps_children_inside_parent_envelope(spans):
    forest = T.clock_skew_from_parent(T.invalid_root(Forest(spans)))
    by_id = {s["span_id"]: s for s in forest.spans}
    for s in forest.spans:
        p = by_id.get(s["parent_span_id"])
        if p is None:
            continue
        # child start is never before the parent's start, and whenever the
        # child FITS in the parent envelope its end stays inside too
        if s["duration"] <= p["duration"]:
            assert s["start_time"] >= p["start_time"]
            assert (
                s["start_time"] + s["duration"]
                <= p["start_time"] + p["duration"]
            )


@settings(max_examples=200, deadline=None)
@given(traces())
def test_dedup_idempotent(spans):
    # duplicate some spans
    doubled = spans + [dict(s) for s in spans[: len(spans) // 2]]
    once = T.dedup_spans(doubled)
    twice = T.dedup_spans(list(once))
    assert once == twice
    keys = [(s["span_id"], s["start_time"], s["duration"]) for s in once]
    assert len(keys) == len(set(keys))


@settings(max_examples=200, deadline=None)
@given(traces())
def test_sort_puts_root_first_then_ascending(spans):
    forest = T.sort_spans(T.invalid_parent(T.invalid_root(Forest(spans))))
    out = forest.spans
    assert out[0]["parent_span_id"] == ""
    rest = [s["start_time"] for s in out[1:]]
    assert rest == sorted(rest)


@settings(max_examples=150, deadline=None)
@given(traces())
def test_repair_pipeline_is_total_and_single_rooted(spans):
    """A processor whose post chain includes the repair transformers accepts
    ANY well-formed-id trace (no InvalidTraceError) and emits one root."""
    proc = TraceProcessor(
        pre=("dedup",),
        validators=(),  # repair handles root/parent anomalies
        post=("invalid_root", "invalid_parent", "clock_skew_from_parent", "sort"),
    )
    out = proc.process("t", spans)
    assert out, "repair pipeline must not drop the trace"
    assert sum(1 for s in out if s["parent_span_id"] == "") == 1


# ---- round-5 Spark-level policy properties (few examples, one job each) ----

def _spark():
    # session-scoped: reuse the engine session the other Spark tests built
    from haystack_traces_spark.session import get_spark

    return get_spark("haystack-tests", master="local[4]", shuffle_partitions=4)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**6),  # trace id
            st.booleans(),                              # has_error
            st.integers(min_value=0, max_value=3_000_000),  # trace duration
        ),
        min_size=1,
        max_size=120,
        unique_by=lambda t: t[0],
    )
)
def test_tail_sampling_policy_matches_python_mirror(cases):
    """For ANY trace population: error traces are always kept, slow traces
    are always kept, and the residual hash decision matches the pure-
    Python hash60 mirror bit-for-bit (no RNG, no engine dependence)."""
    import pyspark.sql.functions as F

    from haystack_traces_spark.datapipe.hashing import hash60_py
    from haystack_traces_spark.streaming.sampling_stream import (
        DEFAULT_RATE_PCT,
        DEFAULT_SLOW_US,
        sampling_reason,
    )

    spark = _spark()
    df = spark.createDataFrame(
        [(str(t), int(e), d) for t, e, d in cases],
        "trace_id string, has_error int, trace_dur long",
    )
    out = {
        r["trace_id"]: r["reason"]
        for r in df.select(
            "trace_id", sampling_reason().alias("reason")
        ).collect()
    }
    for t, e, d in cases:
        tid = str(t)
        if e:
            want = "error"
        elif d > DEFAULT_SLOW_US:
            want = "slow"
        elif hash60_py(tid, seed="tail:") % 100 < DEFAULT_RATE_PCT:
            want = "hash"
        else:
            want = "drop"
        assert out[tid] == want, (tid, e, d)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=60),
            st.integers(min_value=0, max_value=60),
        ).filter(lambda p: p[0] != p[1]),
        min_size=0,
        max_size=25,
    )
)
def test_leakage_safe_split_audit_zero_for_any_pair_set(raw_pairs):
    """For ANY near-dup pair structure, the duplicate-aware split must
    audit to ZERO leaky pairs — the end-to-end closure of dup_clusters →
    leakage_safe_split → split_leak_audit (transitive clusters included:
    pairs (a,b),(b,c) force a, b AND c into one split)."""
    import pyspark.sql.functions as F

    from haystack_traces_spark.datapipe import corpus as C
    from haystack_traces_spark.datapipe import dedup as D

    spark = _spark()
    pairs = [(min(a, b), max(a, b)) for a, b in raw_pairs]
    doc_ids = sorted({i for p in pairs for i in p} | set(range(5)))
    docs = spark.createDataFrame([(i,) for i in doc_ids], "doc_id long")
    pair_df = spark.createDataFrame(
        pairs or [(0, 0)], "doc_a long, doc_b long"
    ).filter(F.col("doc_a") != F.col("doc_b")).distinct()
    clusters = D.dup_clusters(pair_df)
    safe = C.leakage_safe_split(docs, clusters)
    assert C.split_leak_audit(pair_df, safe).count() == 0


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 1000)),
        min_size=1, max_size=40,
    ),
    st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 1000), st.integers(0, 99)),
        min_size=0, max_size=40,
        unique_by=lambda t: (t[0], t[1]),  # distinct (key, ts) on the right
    ),
)
def test_asof_join_matches_pandas_merge_asof(left_rows, right_rows):
    """The union+window linearization must agree with pandas.merge_asof
    (an INDEPENDENT as-of implementation) on arbitrary keyed frames."""
    import pandas as pd

    from haystack_traces_spark.operators.asof import asof_join

    spark = _spark()
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left_rows)],
        "k long, lts long, rowid long",
    )
    right = spark.createDataFrame(
        right_rows or [(99, 0, 0)], "k long, rts long, v long"
    )
    if not right_rows:
        right = right.filter("k < 0")
    got = {
        r["rowid"]: (r["rts"], r["v"])
        for r in asof_join(
            left, right, on=["k"], left_ts="lts", right_ts="rts",
            value_cols=["rts", "v"],
        ).collect()
    }

    lp = pd.DataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left_rows)],
        columns=["k", "lts", "rowid"],
    ).sort_values("lts", kind="stable")
    rp = pd.DataFrame(right_rows, columns=["k", "rts", "v"]).sort_values(
        "rts", kind="stable"
    )
    if len(rp):
        merged = pd.merge_asof(
            lp, rp, left_on="lts", right_on="rts", by="k",
            allow_exact_matches=True,
        )
        want = {
            int(r.rowid): (
                None if pd.isna(r.rts) else int(r.rts),
                None if pd.isna(r.v) else int(r.v),
            )
            for r in merged.itertuples()
        }
    else:
        want = {int(r.rowid): (None, None) for r in lp.itertuples()}
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 500)),
             min_size=1, max_size=30),
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 500), st.integers(1, 200)),
        min_size=1, max_size=10,
    ),
)
def test_interval_join_matches_brute_force(points, intervals):
    """The bucketized equi-join must return exactly the pairs a brute
    force containment sweep finds, for any bucket-straddling layout."""
    from haystack_traces_spark.operators.asof import interval_join

    spark = _spark()
    p = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(points)],
        "k long, ts long, pid long",
    )
    iv = spark.createDataFrame(
        [(k, s, s + ln, j) for j, (k, s, ln) in enumerate(intervals)],
        "k long, s long, e long, iid long",
    )
    got = {
        (r["pid"], r["iid"])
        for r in interval_join(
            p, iv, on=["k"], point_ts="ts", start_col="s", end_col="e",
            bucket=64,
        ).collect()
    }
    want = {
        (pi, ii)
        for pi, (pk, pt) in enumerate(points)
        for ii, (ik, s, ln) in enumerate(intervals)
        if pk == ik and s <= pt < s + ln
    }
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 1000), st.integers(0, 600)),
        min_size=1, max_size=15,
    )
)
def test_span_idle_gaps_matches_python_interval_union(children):
    """The running-max gaps-and-islands union must agree with a direct
    Python interval-union sweep for arbitrary (overlapping, nested,
    clipped, zero-length) child layouts under a fixed [0, 1000] parent."""
    from haystack_traces_spark import entry_queries as EQ

    spark = _spark()
    rows = [
        {
            "trace_id": "t", "span_id": "p", "parent_span_id": "",
            "service_name": "P", "operation_name": "op",
            "start_time": 0, "duration": 1000, "tags": [], "logs": [],
        }
    ] + [
        {
            "trace_id": "t", "span_id": f"c{i}", "parent_span_id": "p",
            "service_name": "x", "operation_name": "op",
            "start_time": s, "duration": d, "tags": [], "logs": [],
        }
        for i, (s, d) in enumerate(children)
    ]
    from haystack_traces_spark.schemas import SPAN

    spans = spark.createDataFrame(rows, SPAN)
    orig = EQ._spans
    EQ._spans = lambda _s, _d: spans
    try:
        out = {r["servicename"]: r.asDict()
               for r in EQ.q_span_idle_gaps(spark, "ignored").collect()}
    finally:
        EQ._spans = orig

    # Python ground truth: clip to [0, 1000], sweep-merge, union length
    ivs = sorted(
        (max(s, 0), min(s + d, 1000)) for s, d in children
    )
    union = 0
    cur_s, cur_e = None, None
    for s, e in ivs:
        if e <= s:
            continue
        if cur_s is None or s > cur_e:
            if cur_s is not None:
                union += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_s is not None:
        union += cur_e - cur_s
    expect_idle = 1000 - union
    assert out["p"]["avg_idle"] == float(expect_idle)
    assert out["p"]["avg_idle_frac"] == round(expect_idle / 1000, 6)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(
            st.one_of(
                st.floats(0.001, 1, allow_nan=False),
                st.floats(-1, -0.001, allow_nan=False),
            ),
            min_size=4, max_size=4,
        ),
        min_size=2, max_size=12,
    )
)
def test_embedding_isotropy_matches_bruteforce_pair_mean(vecs):
    """The ‖Σu‖² closed form must equal the brute-force mean pairwise
    cosine (within rounding) for arbitrary small vector sets."""
    import math

    from haystack_traces_spark.datapipe import queries as dp

    spark = _spark()
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(i, v, 0) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<float>, label int",
        ).write.parquet(os.path.join(d, "embeddings.parquet"))
        r = dp.q_embedding_isotropy(spark, d).collect()[0]

    # brute force on the SAME float32-rounded values spark read back
    f32 = [[float(__import__("numpy").float32(x)) for x in v] for v in vecs]
    units = []
    for v in f32:
        n = math.sqrt(sum(x * x for x in v))
        units.append([x / n for x in v])
    n = len(units)
    s = sum(
        sum(a * b for a, b in zip(units[i], units[j]))
        for i in range(n) for j in range(n) if i != j
    )
    want = s / (n * (n - 1))
    assert abs(r["avg_pair_cos"] - want) < 2e-6
    assert r["n_vectors"] == n and r["dim"] == 4


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.integers(1, 500), min_size=1, max_size=8),
)
def test_sampling_rate_plan_matches_python_water_filling(volumes):
    """The SQL/window water-filling must agree with a direct Python
    greedy water-fill for arbitrary service volumes: same whole-kept
    set, same waterline rates, and Σ kept ≤ budget always."""
    from haystack_traces_spark import entry_queries as EQ
    from haystack_traces_spark.schemas import SPAN

    spark = _spark()
    rows = []
    sid = 0
    for i, n in enumerate(volumes):
        for _ in range(n):
            rows.append(
                {
                    "trace_id": f"t{sid}", "span_id": f"s{sid}",
                    "parent_span_id": "", "service_name": f"svc{i:02d}",
                    "operation_name": "op", "start_time": T0 + sid,
                    "duration": 10, "tags": [], "logs": [],
                }
            )
            sid += 1
    spans = spark.createDataFrame(rows, SPAN)
    orig = EQ._spans
    EQ._spans = lambda _s, _d: spans
    try:
        out = {r["servicename"]: r.asDict()
               for r in EQ.q_sampling_rate_plan(spark, "ignored").collect()}
    finally:
        EQ._spans = orig

    # Python ground truth: greedy max-min water-filling
    total = sum(volumes)
    budget = float(int(total * EQ.SAMPLING_BUDGET_FRAC))
    svcs = sorted(
        ((n, f"svc{i:02d}") for i, n in enumerate(volumes))
    )
    m = len(svcs)
    remaining, whole = budget, set()
    waterline = None
    for k, (n, name) in enumerate(svcs):
        if n * (m - k) <= remaining:
            whole.add(name)
            remaining -= n
        else:
            waterline = remaining / (m - k)
            break
    for name, r in out.items():
        n = dict((s, v) for v, s in svcs)[name]
        if name in whole:
            assert r["keep_rate"] == 1.0 and r["kept_spans"] == n
        else:
            assert waterline is not None
            # HALF_UP like Spark's F.round / DuckDB ROUND — Python's
            # builtin round() is banker's and diverges on exact 6dp half
            # boundaries (hypothesis found volumes=[21, 64]: 8.5/64 =
            # 0.1328125 → Spark 0.132813, banker's 0.132812)
            from decimal import ROUND_HALF_UP, Decimal

            want = float(
                Decimal(repr(min(1.0, waterline / n))).quantize(
                    Decimal("0.000001"), rounding=ROUND_HALF_UP
                )
            )
            assert r["keep_rate"] == want
    assert sum(r["kept_spans"] for r in out.values()) <= budget


@settings(max_examples=6, deadline=None)
@given(traces(min_spans=2, max_spans=10))
def test_hot_call_paths_matches_python_walk(spans):
    """Path enumeration must agree with a direct Python walk (root-
    anchored prefixes up to the configured depth) on arbitrary forests
    with dangling parents."""
    from collections import Counter

    from haystack_traces_spark import entry_queries as EQ
    from haystack_traces_spark.schemas import SPAN

    spark = _spark()
    df = spark.createDataFrame(spans, SPAN)
    orig = EQ._spans
    EQ._spans = lambda _s, _d: df
    try:
        got = {
            r["path"]: r["n_occurrences"]
            for r in EQ.q_hot_call_paths(spark, "ignored").collect()
        }
    finally:
        EQ._spans = orig

    by_parent = {}
    for s in spans:
        by_parent.setdefault(s["parent_span_id"], []).append(s)
    want = Counter()

    def walk(span, prefix, depth):
        path = f"{prefix}>{span['service_name']}" if prefix else span["service_name"]
        want[path] += 1
        if depth < EQ.HOT_PATH_MAX_LEN:
            for c in by_parent.get(span["span_id"], []):
                walk(c, path, depth + 1)

    for root in by_parent.get("", []):
        walk(root, "", 1)
    assert got == dict(want)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 10_000),   # client start
            st.integers(1, 5_000),    # client duration
            st.integers(-2_000, 2_000),  # server start offset
            st.integers(1, 5_000),    # server duration
        ),
        min_size=1, max_size=10,
    ),
    st.integers(-1_000_000, 1_000_000),  # injected clock shift
)
def test_clock_skew_estimator_shift_linearity(rpcs, shift):
    """Shifting every server clock by a constant must move avg_skew by
    exactly that constant and leave the one-way delay untouched — the
    defining linearity of the NTP offset estimator."""
    from haystack_traces_spark import entry_queries as EQ
    from haystack_traces_spark.schemas import SPAN

    spark = _spark()

    def frame(server_shift):
        rows = []
        for i, (cs, cd, so, sd) in enumerate(rpcs):
            for svc, kind, start, dur in (
                ("caller", "client", cs, cd),
                ("callee", "server", cs + so + server_shift, sd),
            ):
                rows.append(
                    {
                        "trace_id": "t", "span_id": f"s{i}",
                        "parent_span_id": "", "service_name": svc,
                        "operation_name": "op", "start_time": start,
                        "duration": dur,
                        "tags": [{
                            "key": "span.kind", "vtype": "STRING",
                            "vstr": kind, "vlong": None, "vdouble": None,
                            "vbool": None, "vbytes": None,
                        }],
                        "logs": [],
                    }
                )
        return spark.createDataFrame(rows, SPAN)

    base = EQ.clock_skew(frame(0)).collect()[0]
    shifted = EQ.clock_skew(frame(shift)).collect()[0]
    assert round(shifted["avg_skew"] - base["avg_skew"], 4) == shift
    assert shifted["avg_delay"] == base["avg_delay"]
    assert shifted["max_delay"] == base["max_delay"]


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=3, max_size=12),
        min_size=2, max_size=10,
    ),
    st.sampled_from([0.5, 0.7, 0.9]),
)
def test_containment_prefix_filter_exact_on_random_corpora(word_lists, t):
    """The one-sided prefix filter must be EXACT-complete for any corpus
    and threshold: compare against brute-force containment over full
    3-gram shingle sets (tiny token alphabet → heavy overlap, the
    hardest case for candidate pruning)."""
    import itertools

    from haystack_traces_spark.datapipe import dedup as D
    from haystack_traces_spark.session import release_materialized

    spark = _spark()
    docs = [(i, " ".join(ws)) for i, ws in enumerate(word_lists)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"])
        for r in D.containment_pairs(df, threshold=t).collect()
    }
    release_materialized()

    def shingles(text):
        w = text.split(" ")
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    want = set()
    for (ia, ta), (ib, tb) in itertools.combinations(docs, 2):
        sa, sb = shingles(ta), shingles(tb)
        inter = len(sa & sb)
        if not inter:
            continue
        if inter / len(sa) >= t or inter / len(sb) >= t:
            want.add((min(ia, ib), max(ia, ib)))
    assert got == want


# ------------------------------------------ expression-tree fuzz (r6) -----
# VERDICT r5 ask #5: random depth-<=2 trees over all four operators x
# span/trace-level groups x typed whitelist fields (mirroring the shapes of
# reference reader/src/test/scala/.../helper/ExpressionTreeBuilder.scala:
# 27-106), compiled BOTH by operators/expression.py to Spark Columns AND --
# independently, from the documented reference semantics
# (SpansIndexQueryGenerator.scala:66-96,149-150: EXISTS per operand,
# co-occurring fields inside one nested group, mustNot-INSIDE-nested for
# NOT_EQUAL) -- to a DuckDB predicate over the flattened group table.
# The two compilers share no code; agreement over hundreds of random trees
# pins the compiler far beyond the 7 fixed fixtures.

_EXPR_STATE: dict = {}


def _expr_fixture():
    """Build the sf0.01 trace_index once; flatten its groups for DuckDB."""
    if _EXPR_STATE:
        return _EXPR_STATE
    import duckdb
    import pyspark.sql.functions as F

    from haystack_traces_spark.operators.index import build_trace_index
    from haystack_traces_spark.session import fan_out
    from haystack_traces_spark.sources.events import spans_from_events

    spark = _spark()
    spans = spans_from_events(
        fan_out(spark.read.parquet("/root/testdata/sf0.01/events.parquet"))
    )
    idx = build_trace_index(spans).localCheckpoint(eager=True)
    pidx = build_trace_index(spans, promote_whitelist=True).localCheckpoint(
        eager=True
    )
    flat = idx.select("traceid", F.explode("spans").alias("g")).select(
        "traceid", "g.servicename", "g.operationname",
        "g.starttime", "g.duration", "g.errorcode", "g.role",
    ).toPandas()
    con = duckdb.connect()
    con.register("groups", flat)
    # value pools drawn FROM the data so predicates are selective, plus
    # never-present sentinels so empty matches are exercised
    pools = {
        "servicename": sorted(flat["servicename"].unique())[:20] + ["zz-absent"],
        "operationname": sorted(flat["operationname"].unique())[:20] + ["zz-absent"],
        "role": sorted({v for arr in flat["role"] for v in arr})[:10] + ["zz-absent"],
        "errorcode": sorted({int(v) for arr in flat["errorcode"] for v in arr})[:10] + [999_999],
        "duration": sorted({int(v) for arr in flat["duration"] for v in arr})[:20] + [0, 10**12],
        "starttime": sorted({int(v) for arr in flat["starttime"] for v in arr})[:20],
    }
    _EXPR_STATE.update(
        {"spark": spark, "idx": idx, "pidx": pidx, "con": con, "pools": pools}
    )
    return _EXPR_STATE


_LONG_F = ("duration", "starttime", "errorcode")
_STR_SCALAR_F = ("servicename", "operationname")
_STR_SET_F = ("role",)


def _field_sql(name: str, op: str, value) -> str:
    """Independent DuckDB mirror of ONE field predicate over group g,
    written from the reference semantics (NOT the Spark compiler):
    scalar fields compare directly; set fields quantify over the set,
    with NOT_EQUAL = 'no occurrence of the value in this group'."""
    if name in _STR_SCALAR_F:
        v = f"'{str(value).lower()}'"
        return f"g.{name} {'=' if op == 'EQUAL' else '<>'} {v}"
    if name in _STR_SET_F:
        v = f"'{str(value).lower()}'"
        base = f"list_contains(g.{name}, {v})"
        return base if op == "EQUAL" else f"NOT {base}"
    v = int(value)
    if op == "EQUAL":
        return f"list_contains(g.{name}, {v})"
    if op == "NOT_EQUAL":
        return f"NOT list_contains(g.{name}, {v})"
    cmp = ">" if op == "GREATER_THAN" else "<"
    return f"len(list_filter(g.{name}, x -> x {cmp} {v})) > 0"


def _tree_sql(tree) -> str:
    """Trace predicate: AND of one EXISTS per operand; a span-level
    subtree's fields must co-occur on ONE group."""
    from haystack_traces_spark.operators.expression import Field

    parts = []
    for opnd in tree.operands:
        if isinstance(opnd, Field):
            inner = _field_sql(opnd.name, opnd.operator, opnd.value)
        else:
            inner = " AND ".join(
                _field_sql(f.name, f.operator, f.value) for f in opnd.operands
            )
        parts.append(
            "EXISTS (SELECT 1 FROM groups g WHERE g.traceid = t.traceid "
            f"AND ({inner}))"
        )
    return " AND ".join(parts) if parts else "TRUE"


@st.composite
def _expr_trees(draw, pools):
    from haystack_traces_spark.operators.expression import (
        EQUAL,
        GREATER_THAN,
        LESS_THAN,
        NOT_EQUAL,
        ExpressionTree,
        Field,
    )

    def field():
        name = draw(st.sampled_from(_LONG_F + _STR_SCALAR_F + _STR_SET_F))
        if name in _LONG_F:
            op = draw(st.sampled_from(
                (EQUAL, NOT_EQUAL, GREATER_THAN, LESS_THAN)))
            value = draw(st.one_of(
                st.sampled_from(pools[name]),
                st.integers(min_value=0, max_value=10**10),
            ))
        else:
            op = draw(st.sampled_from((EQUAL, NOT_EQUAL)))
            value = draw(st.sampled_from(pools[name]))
        return Field(name, value, op)

    operands = []
    for _ in range(draw(st.integers(1, 3))):
        if draw(st.booleans()):
            operands.append(field())
        else:
            sub = tuple(field() for _ in range(draw(st.integers(1, 3))))
            operands.append(ExpressionTree(sub, is_span_level=True))
    return ExpressionTree(tuple(operands))


@settings(max_examples=6, deadline=None)
@given(st.data())
def test_expression_compiler_matches_independent_sql_mirror(data):
    """>=240 random trees total (6 examples x 40 trees), each compiled by
    BOTH compilers; matching traceid sets on the sf0.01 index."""
    import pyspark.sql.functions as F

    from haystack_traces_spark.operators.expression import compile_expression

    state = _expr_fixture()
    idx, con, pools = state["idx"], state["con"], state["pools"]
    trees = [data.draw(_expr_trees(pools)) for _ in range(40)]
    # ONE Spark pass evaluates every tree (40 boolean projections)
    row_sets = idx.select(
        "traceid",
        *[compile_expression(t).alias(f"p{i}") for i, t in enumerate(trees)],
    ).collect()
    # same trees through the PROMOTED dispatch (search_trace_ids's rule:
    # exact -> unions alone; inexact -> union prefilter AND exists verify)
    from haystack_traces_spark.operators.expression import compile_promoted

    avail = frozenset(state["pidx"].columns)

    def promoted_pred(t):
        pre, exact = compile_promoted(t, available=avail)
        return pre if exact else (pre & compile_expression(t))

    prow_sets = state["pidx"].select(
        "traceid",
        *[promoted_pred(t).alias(f"p{i}") for i, t in enumerate(trees)],
    ).collect()
    for i, t in enumerate(trees):
        got = {r["traceid"] for r in row_sets if r[f"p{i}"]}
        want = {
            r[0]
            for r in con.execute(
                "SELECT traceid FROM (SELECT DISTINCT traceid FROM groups) t "
                f"WHERE {_tree_sql(t)}"
            ).fetchall()
        }
        assert got == want, (i, t)
        got_promoted = {r["traceid"] for r in prow_sets if r[f"p{i}"]}
        assert got_promoted == want, ("promoted", i, t)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abc XYZ", min_size=0, max_size=30),
        min_size=1,
        max_size=25,
    )
)
def test_cms_never_underestimates_any_corpus(texts):
    """For ANY corpus (mixed case, empty strings, repeated tokens): the
    CMS estimate of every token's count is >= its exact count — the
    structural Count-Min guarantee the heavy-hitters gate's semantics
    rest on — and the sketch built per-batch then merged equals the
    whole-corpus sketch (mergeability)."""
    from collections import Counter

    import pyspark.sql.functions as F

    from haystack_traces_spark.datapipe.dedup import (
        cms_cell_counts,
        lower_token_counts,
    )
    from haystack_traces_spark.datapipe.hashing import hash60_py
    from haystack_traces_spark.datapipe.queries import CMS_DEPTH, CMS_WIDTH

    spark = _spark()
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    cells = {
        (r["r"], r["c"]): r["n"]
        for r in cms_cell_counts(
            lower_token_counts(docs), CMS_DEPTH, CMS_WIDTH
        ).collect()
    }
    exact = Counter(
        tok for t in texts for tok in t.lower().split(" ")
    )
    for tok, n in exact.items():
        est = min(
            cells.get(
                (r, hash60_py(tok, seed=f"cms{r}:") % CMS_WIDTH), 0
            )
            for r in range(CMS_DEPTH)
        )
        assert est >= n, (tok, est, n)
    # mergeability: two half-corpus sketches sum to the whole sketch
    half = len(texts) // 2
    a = docs.filter(F.col("doc_id") < half)
    b = docs.filter(F.col("doc_id") >= half)
    merged = Counter()
    for part in (a, b):
        for r in cms_cell_counts(
            lower_token_counts(part), CMS_DEPTH, CMS_WIDTH
        ).collect():
            merged[(r["r"], r["c"])] += r["n"]
    assert dict(merged) == cells


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(0, 1_000), min_size=0, max_size=60),
    st.integers(1, 200),
    st.sampled_from(["gap", "anchored"]),
)
def test_split_islands_structural_invariants(ts_list, horizon, mode):
    """The ONE island-split core under both session faces (streaming
    event-time + batch anchored): for ANY event multiset and horizon,
    (a) islands partition the input exactly (no loss, no dup), (b) each
    island is internally rule-consistent (gap: consecutive deltas ≤
    horizon; anchored: every member < start + horizon), (c) adjacent
    islands are rule-separated (gap: boundary delta > horizon; anchored:
    next start ≥ prev start + horizon), (d) island starts are
    non-decreasing. A violation of any of these is a sessionization bug
    no oracle comparison on the synthetic corpus would localize."""
    from haystack_traces_spark.streaming.sessionize import _split_islands

    events = sorted((t, f"e{i}") for i, t in enumerate(ts_list))
    islands = _split_islands(events, mode, horizon)
    flat = [e for isl in islands for e in isl]
    assert flat == events  # exact partition, order preserved
    for isl in islands:
        assert isl, "empty island"
        if mode == "gap":
            assert all(
                b[0] - a[0] <= horizon for a, b in zip(isl, isl[1:])
            ), isl
        else:
            assert all(e[0] < isl[0][0] + horizon for e in isl), isl
    for prev, nxt in zip(islands, islands[1:]):
        if mode == "gap":
            assert nxt[0][0] - prev[-1][0] > horizon
        else:
            assert nxt[0][0] >= prev[0][0] + horizon
        assert nxt[0][0] >= prev[0][0]


@settings(max_examples=150, deadline=None)
@given(
    st.lists(st.integers(0, 500), min_size=1, max_size=40),
    st.integers(1, 120),
)
def test_gap_islands_match_lag_rule(ts_list, gap):
    """The streaming face's gap islands equal the batch gaps-and-islands
    LAG rule (new island iff delta > gap) computed independently — the
    pure-Python mirror of the Spark-level event_sessions equivalence."""
    from haystack_traces_spark.streaming.sessionize import _split_islands

    events = sorted((t, f"e{i}") for i, t in enumerate(ts_list))
    islands = _split_islands(events, "gap", gap)
    # independent LAG-rule recomputation
    want, cur = [], [events[0]]
    for prev, nxt in zip(events, events[1:]):
        if nxt[0] - prev[0] > gap:
            want.append(cur)
            cur = [nxt]
        else:
            cur.append(nxt)
    want.append(cur)
    assert islands == want


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(0, 3_000_000), min_size=6, max_size=18),
        min_size=3,
        max_size=8,
    )
)
def test_latency_changepoint_matches_python_mirror(series_list):
    """For ANY per-operation bucket-mean series (one span per bucket, so
    the bucket mean IS the drawn value): the shipped operator's split
    bucket, exact integer means, and gain share equal an independent
    pure-Python recomputation (anchored integer prefix sums, argmax on
    the HALF_UP-rounded gain with bucket tiebreak). One Spark pass for
    all drawn operations."""
    from haystack_traces_spark.entry_queries import (
        CP_BUCKET_US,
        CP_MIN_BUCKETS,
        latency_changepoint_from,
    )
    from haystack_traces_spark.functions.stats import round6_half_up
    from haystack_traces_spark.schemas import SPAN

    T0_ = 1_704_067_200_000_000
    spark = _spark()
    rows = []
    for i, series in enumerate(series_list):
        for b, dur in enumerate(series):
            rows.append(
                {
                    "trace_id": f"t{i}_{b}",
                    "span_id": f"s{i}_{b}",
                    "parent_span_id": "",
                    "service_name": "svc",
                    "operation_name": f"op{i}",
                    "start_time": T0_ + b * CP_BUCKET_US,
                    "duration": dur,
                    "tags": [],
                    "logs": [],
                }
            )
    spans = spark.createDataFrame(rows, SPAN)
    got = {
        r["operationname"]: r
        for r in latency_changepoint_from(spans).collect()
    }

    for i, series in enumerate(series_list):
        n = len(series)
        if n < CP_MIN_BUCKETS:
            assert f"op{i}" not in got
            continue
        mn = min(series)
        a = [v - mn for v in series]
        t1 = sum(a)
        t2 = sum(x * x for x in a)
        best = None  # (rounded_gain, bucket, k, s1)
        s1 = 0
        for k in range(1, n):  # split AFTER bucket k (1-based left size)
            s1 += a[k - 1]
            r1 = t1 - s1
            gain = (
                s1 * s1 / k + r1 * r1 / (n - k) - t1 * t1 / n
            )
            key = (-round6_half_up(gain), k)  # bucket asc == k asc here
            if best is None or key < best[0]:
                best = (key, k, s1, gain)
        _, k, s1, gain = best
        sst = t2 - t1 * t1 / n
        r = got[f"op{i}"]
        assert r["n_buckets"] == n
        assert r["split_bucket"] == T0_ + (k - 1) * CP_BUCKET_US
        assert r["mean_before_us"] == (s1 + k * mn) // k
        assert r["mean_after_us"] == (t1 - s1 + (n - k) * mn) // (n - k)
        if sst == 0:
            assert r["gain_share"] is None
        else:
            assert r["gain_share"] == round6_half_up(gain / sst)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),       # doc_id
            st.integers(min_value=0, max_value=5),        # ts (collisions!)
            st.sets(st.sampled_from("abcdefg"), max_size=4),  # band keys
        ),
        min_size=0,
        max_size=25,
        unique_by=lambda t: t[0],
    )
)
def test_event_time_verdicts_matches_python_mirror(rows):
    """For ANY (doc, ts, bands) population — ts collisions, bandless
    docs, shared holders — the shared verdict core equals the pure-
    Python mirror: holder = lexicographic min (ts, doc_id) per band, a
    doc is near-dup iff some band's holder strictly precedes it, dup_of
    is the earliest hitting holder, n_bands_hit counts hitting bands.
    The mirror is order-free, so this also pins arrival-order
    invariance (the property the event-time face exists for)."""
    from haystack_traces_spark.streaming.neardup_stream import (
        event_time_verdicts,
    )

    spark = _spark()
    doc_rows = spark.createDataFrame(
        [(d, t) for d, t, _ in rows] or [(0, 0)], "doc_id long, ts long"
    )
    if not rows:
        doc_rows = doc_rows.filter("doc_id < 0")  # empty, typed
    band_rows = spark.createDataFrame(
        [(d, t, b) for d, t, bs in rows for b in sorted(bs)]
        or [(0, 0, "x")],
        "doc_id long, ts long, band_key string",
    )
    if not any(bs for _, _, bs in rows):
        band_rows = band_rows.filter("doc_id < 0")
    got = {
        r["doc_id"]: (r["near_dup"], r["dup_of"], r["n_bands_hit"])
        for r in event_time_verdicts(doc_rows, band_rows).collect()
    }

    holder = {}
    for d, t, bs in rows:
        for b in bs:
            if b not in holder or (t, d) < holder[b]:
                holder[b] = (t, d)
    for d, t, bs in rows:
        hits = [holder[b] for b in bs if holder[b] < (t, d)]
        want = (
            (True, min(hits)[1], len(hits)) if hits else (False, None, 0)
        )
        assert got[d] == want, (d, t, sorted(bs), got[d], want)
    assert set(got) == {d for d, _, _ in rows}


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=7),
            st.integers(min_value=0, max_value=7),
        ),
        min_size=0,
        max_size=20,
    )
)
def test_blast_radius_matches_bfs_mirror(raw_edges):
    """For ANY directed service graph (cycles, self-loops, chains) the
    path-doubling closure equals a pure-Python BFS reachability mirror —
    including the self-exclusion rule and the zero-filled catalog."""
    from haystack_traces_spark.entry_queries import blast_radius_from

    spark = _spark()
    spans = []
    seen_services = set()
    for i, (a, b) in enumerate(raw_edges):
        spans.append(
            (f"t{i}", f"p{i}", "", f"svc{a}", "op", T0, 10, [], [])
        )
        spans.append(
            (f"t{i}", f"c{i}", f"p{i}", f"svc{b}", "op", T0, 5, [], [])
        )
        seen_services |= {a, b}
    if not spans:  # at least one isolated service so the frame is typed
        spans.append(("t0", "p0", "", "svc0", "op", T0, 10, [], []))
        seen_services = {0}
    df = spark.createDataFrame(
        spans,
        "trace_id string, span_id string, parent_span_id string, "
        "service_name string, operation_name string, start_time long, "
        "duration long, tags array<struct<key string>>, "
        "logs array<struct<timestamp long>>",
    )
    got = {
        r["service"]: (r["n_downstream"], r["downstream"])
        for r in blast_radius_from(df).collect()
    }

    adj = {}
    for a, b in raw_edges:
        adj.setdefault(f"svc{a}", set()).add(f"svc{b}")
    for s in sorted(seen_services):
        name = f"svc{s}"
        reach, frontier = set(), set(adj.get(name, ()))
        while frontier:
            reach |= frontier
            frontier = {
                n for f in frontier for n in adj.get(f, ()) if n not in reach
            }
        down = sorted(reach - {name})
        assert got[name] == (len(down), ",".join(down)), (name, got[name], down)
    assert set(got) == {f"svc{s}" for s in seen_services}


@given(st.integers(min_value=0, max_value=10**15))
@settings(max_examples=300, deadline=None)
def test_derive_planes_holds_occupancy_band(n):
    """The auto-planes rule (round 9): p is clamped to [MIN, MAX]; inside
    the unclamped regime the implied per-bucket occupancy n / 2^p sits in
    (target/2, target] — i.e. the dial actually holds occupancy, which is
    the whole point (fixed planes measured corpus-quadratic at 10x,
    SCALE.md §2). Also monotone non-decreasing in n."""
    from haystack_traces_spark.datapipe.similarity import (
        KNN_TARGET_OCCUPANCY,
        MAX_KNN_PLANES,
        MIN_KNN_PLANES,
        derive_planes,
    )

    p = derive_planes(n)
    assert MIN_KNN_PLANES <= p <= MAX_KNN_PLANES
    assert derive_planes(n + 1) >= p
    raw = max(n // KNN_TARGET_OCCUPANCY, 1).bit_length()
    if MIN_KNN_PLANES <= raw <= MAX_KNN_PLANES and n >= KNN_TARGET_OCCUPANCY:
        occ = n / (1 << p)
        # bitlen(m) = floor(log2 m)+1 => 2^p in (m, 2m], m = n // target
        assert occ <= KNN_TARGET_OCCUPANCY
        assert occ > KNN_TARGET_OCCUPANCY / 2 - 1  # integer-div slack


def _quantize_mirror(v, bits):
    """Independent numpy mirror of similarity._dequantized: symmetric
    scalar quantization round-trip with half-away-from-zero rounding.
    Ties (fractional part EXACTLY 0.5 — representable for |x| < 2^52)
    round away from zero on top of banker's np.round; the naive
    floor(|x| + 0.5) trick is deliberately avoided because the FP
    addition rounds x = k + 0.49999999999999994 UP across the boundary,
    diverging from Spark/DuckDB ROUND (review r9 finding)."""
    import numpy as np

    levels = float(2 ** (bits - 1) - 1)
    v = np.asarray(v, dtype=np.float64)
    scale = np.abs(v).max() / levels
    x = v / scale
    q = np.round(x)  # nearest for non-ties; banker's on exact .5
    tie = np.abs(x) % 1.0 == 0.5
    q[tie] = np.copysign(np.ceil(np.abs(x[tie])), x[tie])
    return np.clip(q, -levels, levels) * scale


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-100_000, max_value=100_000),
        min_size=2,
        max_size=64,
    ).filter(lambda xs: any(x != 0 for x in xs)),
    st.sampled_from([8, 6, 4]),
)
def test_scalar_quantization_error_bound_and_idempotence(milli, bits):
    """Round-9 batch C invariants, pinned on the mirror: (a) the
    round-trip error respects the theoretical per-element bound scale/2
    (clamping never activates because |x| <= levels*scale by
    construction), so L2(v-deq) <= sqrt(dim)*scale/2; (b) re-quantizing
    the dequantized vector at the same bit width is exactly idempotent
    (deq values are integer multiples of scale); (c) the bound — and
    with it the worst-case relative error — tightens as bits grow."""
    import numpy as np

    v = np.asarray(milli, dtype=np.float64) / 1000.0
    deq = _quantize_mirror(v, bits)
    levels = float(2 ** (bits - 1) - 1)
    scale = np.abs(v).max() / levels
    assert np.all(np.abs(v - deq) <= scale / 2 + 1e-12)
    assert np.linalg.norm(v - deq) <= np.sqrt(len(v)) * scale / 2 + 1e-9
    again = _quantize_mirror(deq, bits)
    # same scale: max|deq| can only shrink, but deq's max element is
    # +/-levels*scale only when no clamp occurred at the max — re-derive
    # scale from deq to assert idempotence of the VALUE grid
    assert np.allclose(again, deq, rtol=0, atol=1e-12)
