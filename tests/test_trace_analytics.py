"""Crafted-corpus semantics + plan-shape guards for the round-5 trace
analytics batch (retry_storms, error_propagation, service_entry_points,
operation_latency_trend, network_deltas).

Each operator already hash-matches its DuckDB oracle over the synthetic
corpus (test_entry_queries); these tests pin the SEMANTICS on frames the
synthetic generator cannot produce (retry bursts, orphaned error spans,
unmatched client/server halves) and the plan shapes the 100 TB design
depends on.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from haystack_traces_spark import entry_queries as EQ
from haystack_traces_spark.schemas import SPAN
from tests.fixtures import span as mk

T0 = EQ.T0
DAY_US = EQ.DAY_US


def _ltag(key: str, v: int) -> dict:
    return {
        "key": key,
        "vtype": "LONG",
        "vstr": None,
        "vlong": v,
        "vdouble": None,
        "vbool": None,
        "vbytes": None,
    }


def _stag(key: str, v: str) -> dict:
    return {
        "key": key,
        "vtype": "STRING",
        "vstr": v,
        "vlong": None,
        "vdouble": None,
        "vbool": None,
        "vbytes": None,
    }


def _with_spans(spark, rows):
    return spark.createDataFrame([dict(r) for r in rows], SPAN)


def _patched(spark, rows, fn):
    spans = _with_spans(spark, rows)
    orig = EQ._spans
    EQ._spans = lambda _spark, _sf: spans
    try:
        return fn()
    finally:
        EQ._spans = orig


def test_retry_storms_counts_repeats_per_trace(spark):
    rows = [
        # t1 repeats svc_a/op_a three times (burst 3, 2 extra calls)
        mk(trace_id="t1", span_id="a1", service="svc_a", operation="op_a"),
        mk(trace_id="t1", span_id="a2", service="svc_a", operation="op_a"),
        mk(trace_id="t1", span_id="a3", service="svc_a", operation="op_a"),
        # single call in t1 — never reported
        mk(trace_id="t1", span_id="b1", service="svc_b", operation="op_b"),
        # t2 repeats the same op twice (burst 2, 1 extra call)
        mk(trace_id="t2", span_id="a4", service="svc_a", operation="op_a"),
        mk(trace_id="t2", span_id="a5", service="svc_a", operation="op_a"),
    ]
    out = _patched(
        spark, rows, lambda: EQ.q_retry_storms(spark, "ignored").collect()
    )
    assert [r.asDict() for r in out] == [
        {
            "service_name": "svc_a",
            "operation_name": "op_a",
            "n_traces": 2,
            "max_repeats": 3,
            "extra_calls": 3,
        }
    ]


def test_error_propagation_separates_propagated_from_originated(spark):
    err = [_ltag("errorcode", 60)]
    ok = [_ltag("errorcode", 0)]
    rows = [
        # chain: root (error) -> c1 (error): propagated edge root->a
        mk(trace_id="t", span_id="r", service="svc_root", tags=err),
        mk(trace_id="t", span_id="c1", parent="r", service="svc_a", tags=err),
        # clean parent -> error child: originated edge ok->c (rate 0)
        mk(trace_id="t", span_id="p2", service="svc_ok", tags=ok),
        mk(trace_id="t", span_id="c2", parent="p2", service="svc_c", tags=err),
        # error child with a MISSING parent: dropped (no edge to attribute)
        mk(trace_id="t", span_id="c3", parent="ghost", service="svc_d", tags=err),
        # root error span itself (parent=''): not a child edge
    ]
    out = _patched(
        spark, rows, lambda: EQ.q_error_propagation(spark, "ignored").collect()
    )
    got = {
        (r["parent_svc"], r["child_svc"]): (
            r["n_child_errors"],
            r["n_propagated"],
            r["propagation_rate"],
        )
        for r in out
    }
    assert got == {
        ("svc_root", "svc_a"): (1, 1, 1.0),
        ("svc_ok", "svc_c"): (1, 0, 0.0),
    }


def test_service_entry_points_shares_sum_per_service(spark):
    rows = [
        mk(trace_id="t1", span_id="r1", service="svc_a", operation="op_1"),
        mk(trace_id="t2", span_id="r2", service="svc_a", operation="op_1"),
        mk(trace_id="t3", span_id="r3", service="svc_a", operation="op_1"),
        mk(trace_id="t4", span_id="r4", service="svc_a", operation="op_2"),
        # non-root svc_a span: excluded from the entry-point profile
        mk(trace_id="t1", span_id="x", parent="r1", service="svc_a",
           operation="op_3"),
        mk(trace_id="t5", span_id="r5", service="svc_b", operation="op_9"),
    ]
    out = _patched(
        spark, rows,
        lambda: EQ.q_service_entry_points(spark, "ignored").collect(),
    )
    got = {
        (r["service_name"], r["operation_name"]): (r["n_roots"], r["share"])
        for r in out
    }
    assert got == {
        ("svc_a", "op_1"): (3, 0.75),
        ("svc_a", "op_2"): (1, 0.25),
        ("svc_b", "op_9"): (1, 1.0),
    }


def test_operation_latency_trend_day_over_day_delta(spark):
    rows = [
        mk(trace_id="t1", span_id="a", service="s", operation="o",
           start=T0, duration=100),
        mk(trace_id="t1", span_id="b", service="s", operation="o",
           start=T0 + 1000, duration=200),
        mk(trace_id="t2", span_id="c", service="s", operation="o",
           start=T0 + DAY_US, duration=400),
    ]
    out = _patched(
        spark, rows,
        lambda: EQ.q_operation_latency_trend(spark, "ignored").collect(),
    )
    assert [(r["day_us"], r["n_spans"], r["p50"], r["p50_delta"]) for r in out] == [
        (T0, 2, 150.0, None),
        (T0 + DAY_US, 1, 400.0, 250.0),
    ]


def test_network_deltas_pairs_kinds_and_drops_unmatched(spark):
    rows = [
        # paired client/server halves of one span: delta = 120 - 100
        mk(trace_id="t", span_id="s1", service="caller", duration=120,
           tags=[_stag("span.kind", "client")]),
        mk(trace_id="t", span_id="s1", service="callee", duration=100,
           tags=[_stag("span.kind", "server")]),
        # root server-only span: no client half, excluded
        mk(trace_id="t", span_id="r", service="callee", duration=999,
           tags=[_stag("span.kind", "server")]),
    ]
    cs = _with_spans(spark, rows)
    out = EQ.network_deltas(cs).collect()
    assert [r.asDict() for r in out] == [
        {
            "client_svc": "caller",
            "server_svc": "callee",
            "n_calls": 1,
            "avg_delta": 20.0,
            "max_delta": 20,
        }
    ]


def test_operation_latency_trend_approx_face_close_to_exact(spark):
    """The 100 TB face (percentile_approx) tracks the exact p50 within the
    sketch accuracy on a group large enough for the sketch to matter.
    (On tiny groups the two faces legitimately diverge: exact interpolates
    between the two middle elements, approx returns an observed element —
    so the guarantee is rank-based, tested here at n=1001 where rank and
    value coincide.)"""
    rows = [
        mk(trace_id=f"t{i}", span_id=f"s{i}", service="s", operation="o",
           start=T0 + i, duration=1000 + i)
        for i in range(1001)
    ]
    exact, approx = _patched(
        spark,
        rows,
        lambda: (
            EQ.q_operation_latency_trend(spark, "ignored").collect(),
            EQ.q_operation_latency_trend(spark, "ignored", approx=True).collect(),
        ),
    )
    assert exact[0]["p50"] == 1500.0
    assert abs(approx[0]["p50"] - 1500.0) <= 1.0  # accuracy 10000, n 1001


def test_round5b_trace_operators_have_no_global_bottleneck(spark):
    """Plan guards for the batch: no cartesian products, no
    single-partition exchanges (every window/aggregate is keyed), and the
    error_propagation parent lookup is an equi-join."""
    from tests.test_plans import _plan

    sf = "/root/testdata/sf0.001"
    plans = {
        name: _plan(fn(spark, sf))
        for name, fn in {
            "retry_storms": EQ.q_retry_storms,
            "error_propagation": EQ.q_error_propagation,
            "service_entry_points": EQ.q_service_entry_points,
            "operation_latency_trend": EQ.q_operation_latency_trend,
            "network_deltas": EQ.q_network_deltas,
            "error_latency_tax": EQ.q_error_latency_tax,
            "span_mad_outliers": EQ.q_span_mad_outliers,
            "operation_first_seen": EQ.q_operation_first_seen,
            "parent_child_latency": EQ.q_parent_child_latency,
            "span_containment": EQ.q_span_containment,
            "service_scorecard": EQ.q_service_scorecard,
        }.items()
    }
    for name, plan in plans.items():
        assert "CartesianProduct" not in plan, name
        assert "Exchange SinglePartition" not in plan, (name, plan[:1500])
    # the parent lookup is an equi-join, not a nested loop
    assert "Join" in plans["error_propagation"]
    assert "BroadcastNestedLoopJoin" not in plans["error_propagation"]
    # the MAD stats tables join back onto the span scan as broadcasts
    assert "BroadcastHashJoin" in plans["span_mad_outliers"]


def test_error_latency_tax_ratio_and_null_for_error_free(spark):
    err = [{"key": "errorcode", "vtype": "LONG", "vstr": None, "vlong": 60,
            "vdouble": None, "vbool": None, "vbytes": None}]
    rows = [
        mk(trace_id="t", span_id="a", service="svc", duration=100),
        mk(trace_id="t", span_id="b", service="svc", duration=300, tags=err),
        mk(trace_id="t", span_id="c", service="svc", duration=100, tags=err),
        mk(trace_id="t", span_id="d", service="clean", duration=50),
    ]
    out = _patched(
        spark, rows, lambda: EQ.q_error_latency_tax(spark, "ignored").collect()
    )
    got = {r["servicename"]: r.asDict() for r in out}
    assert got["svc"]["n_ok"] == 1 and got["svc"]["n_err"] == 2
    assert got["svc"]["avg_ok"] == 100.0 and got["svc"]["avg_err"] == 200.0
    assert got["svc"]["tax_ratio"] == 2.0
    assert got["clean"]["n_err"] == 0
    assert got["clean"]["avg_err"] is None and got["clean"]["tax_ratio"] is None


def test_span_mad_outliers_robust_to_the_outlier_and_skips_mad_zero(spark):
    rows = [
        mk(trace_id="t", span_id=f"s{i}", service="s", operation="o",
           duration=d)
        for i, d in enumerate([8, 10, 10, 12, 1000])
    ] + [
        # constant-duration group: MAD 0, excluded even though every
        # deviation from a different center would be "infinite"
        mk(trace_id="t", span_id=f"c{i}", service="s", operation="const",
           duration=7)
        for i in range(3)
    ]
    out, out_approx = _patched(
        spark, rows,
        lambda: (
            EQ.q_span_mad_outliers(spark, "ignored").collect(),
            EQ.q_span_mad_outliers(spark, "ignored", approx=True).collect(),
        ),
    )
    assert [(r["span_id"], r["duration"], r["robust_z"]) for r in out] == [
        ("s4", 1000, 495.0)
    ]
    # odd-sized groups: both faces pick the same middle element, so the
    # 100 TB face is exactly equivalent here
    assert [r.asDict() for r in out_approx] == [r.asDict() for r in out]


def test_operation_first_seen_counts_only_debuts(spark):
    rows = [
        mk(trace_id="t1", span_id="a", service="s", operation="op_a", start=T0),
        mk(trace_id="t2", span_id="b", service="s", operation="op_a",
           start=T0 + DAY_US),  # repeat — not a debut
        mk(trace_id="t3", span_id="c", service="s", operation="op_b",
           start=T0 + DAY_US),
    ]
    out = _patched(
        spark, rows,
        lambda: EQ.q_operation_first_seen(spark, "ignored").collect(),
    )
    assert [(r["day_us"], r["n_new_ops"]) for r in out] == [
        (T0, 1),
        (T0 + DAY_US, 1),
    ]


def test_parent_child_latency_gap_stats(spark):
    rows = [
        mk(trace_id="t", span_id="p", service="up", start=100, duration=500),
        mk(trace_id="t", span_id="c1", parent="p", service="down",
           start=150, duration=10),
        mk(trace_id="t", span_id="c2", parent="p", service="down",
           start=250, duration=10),
        # orphan child: no parent row, excluded
        mk(trace_id="t", span_id="c3", parent="ghost", service="down",
           start=400, duration=10),
    ]
    out = _patched(
        spark, rows,
        lambda: EQ.q_parent_child_latency(spark, "ignored").collect(),
    )
    assert [r.asDict() for r in out] == [
        {"parent_svc": "up", "child_svc": "down", "n_calls": 2,
         "avg_gap": 100.0, "max_gap": 150}
    ]


def test_span_containment_flags_escaping_children(spark):
    rows = [
        mk(trace_id="t", span_id="p", service="up", start=100, duration=100),
        # contained: [120, 180] inside [100, 200]
        mk(trace_id="t", span_id="c1", parent="p", service="down",
           start=120, duration=60),
        # escapes: starts before the parent (clock skew)
        mk(trace_id="t", span_id="c2", parent="p", service="down",
           start=90, duration=50),
        # escapes: ends after the parent (async fire-and-forget)
        mk(trace_id="t", span_id="c3", parent="p", service="down",
           start=150, duration=100),
    ]
    out = _patched(
        spark, rows,
        lambda: EQ.q_span_containment(spark, "ignored").collect(),
    )
    assert [r.asDict() for r in out] == [
        {"parent_svc": "up", "child_svc": "down", "n_children": 3,
         "n_escaping": 2, "escape_rate": 0.666667}
    ]


def test_sampling_bias_report_shares_sum_to_one(spark):
    """On the real corpus the per-reason shares must partition the trace
    population, and the kept buckets must carry the slow/error tails
    (avg_dur(slow) above avg_dur(hash/drop))."""
    sf = "/root/testdata/sf0.001"
    rows = {r["reason"]: r.asDict()
            for r in EQ.q_sampling_bias_report(spark, sf).collect()}
    # each share is rounded to 6dp, so the sum may be off by up to
    # n_reasons * 5e-7 on a perfectly correct implementation
    assert abs(sum(r["share"] for r in rows.values()) - 1.0) < 1e-5
    if "slow" in rows and "drop" in rows:
        assert rows["slow"]["avg_dur"] > rows["drop"]["avg_dur"]


def test_service_scorecard_matches_component_operators(spark):
    """The scorecard's columns must agree with the dedicated operators
    they summarize (apdex vs q_apdex, error_rate vs operation-level sums)
    on the real corpus."""
    sf = "/root/testdata/sf0.001"
    card = {r["servicename"]: r.asDict()
            for r in EQ.q_service_scorecard(spark, sf).collect()}
    apdex = {r["servicename"]: r["apdex"] for r in EQ.q_apdex(spark, sf).collect()}
    assert set(card) == set(apdex)
    for svc, a in apdex.items():
        assert card[svc]["apdex"] == a, svc


def test_event_sessions_island_boundaries(spark):
    """Events 1h apart share a session; a gap over the threshold opens a
    new island; the boundary case (gap == threshold) stays INSIDE."""
    gap = 1000
    ev = spark.createDataFrame(
        [
            (1, 10, 0),
            (1, 11, 500),          # same session (gap 500)
            (1, 12, 500 + gap),    # boundary: gap == threshold, stays
            (1, 13, 500 + gap + gap + 1),  # new session (gap 1001)
            (2, 20, 0),            # another user: own island numbering
        ],
        "user_id long, event_id long, tus long",
    )
    out = [
        (r["user_id"], r["session_idx"], r["n_events"], r["session_dur"])
        for r in EQ.sessionize_events(ev, gap_us=gap)
        .orderBy("user_id", "session_idx")
        .collect()
    ]
    assert out == [(1, 1, 3, 1500), (1, 2, 1, 0), (2, 1, 1, 0)]


def test_funnel_steps_requires_strict_order(spark):
    """u1 converts through all 4 steps in order; u2 saw 'click' BEFORE
    'view' so it counts for step 1 only; u3 never clicked."""
    rows = []
    for i, s in enumerate(EQ.FUNNEL_STEPS):
        rows.append((1, s, 100 * (i + 1)))          # u1: in order
    rows += [(2, "click", 10), (2, "view", 20)]      # u2: out of order
    rows += [(3, "view", 5)]                         # u3: view only
    ev = spark.createDataFrame(rows, "user_id long, event_type string, tus long")
    out = {r["step"]: r.asDict() for r in EQ.funnel_counts(ev).collect()}
    assert out["view"]["n_users"] == 3 and out["view"]["conversion"] == 1.0
    assert out["click"]["n_users"] == 1
    assert out["purchase"]["n_users"] == 1
    assert out["purchase"]["conversion"] == 0.333333


def test_asof_join_semantics(spark):
    """Backward as-of: latest right ts <= left ts per key; equal-ts right
    rows MATCH (<= semantics); no prior right row → NULL; keys never
    bleed into each other; same-ts right duplicates resolve to the last
    under right_order."""
    from haystack_traces_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 100, "p1"), (1, 50, "p2"), (2, 10, "p3"), (3, 99, "p4")],
        "k long, lts long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 40, "a"), (1, 100, "b"), (2, 20, "x"), (1, 40, "z")],
        "k long, rts long, v string",
    )
    out = {
        r["tag"]: (r["rts"], r["v"])
        for r in asof_join(
            left, right, on=["k"], left_ts="lts", right_ts="rts",
            value_cols=["rts", "v"], right_order="v",
        ).collect()
    }
    assert out["p1"] == (100, "b")   # equal ts matches
    assert out["p2"] == (40, "z")    # same-ts dup: last by right_order
    assert out["p3"] == (None, None)  # right ts 20 > left ts 10: no prior
    assert out["p4"] == (None, None)  # key 3 has no right rows at all


def test_asof_join_plan_is_one_keyed_window(spark):
    """The linearization must run as window-over-union — no
    BroadcastNestedLoopJoin / CartesianProduct that a naive range join
    would produce."""
    from tests.test_plans import _plan

    plan = _plan(EQ.q_purchase_attribution(spark, "/root/testdata/sf0.001"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan


def test_interval_join_containment_and_bucketing(spark):
    """Half-open [start, end): boundary start matches, boundary end does
    not; intervals longer than one bucket still catch points in their
    later buckets; degenerate (empty) intervals match nothing; keys are
    isolated."""
    from haystack_traces_spark.operators.asof import interval_join

    points = spark.createDataFrame(
        [("a", 100), ("a", 250), ("a", 300), ("a", 99), ("b", 150)],
        "k string, ts long",
    )
    intervals = spark.createDataFrame(
        [("a", 100, 300, "w1"), ("a", 500, 500, "empty"), ("b", 0, 50, "w2")],
        "k string, s long, e long, w string",
    )
    out = sorted(
        (r["k"], r["ts"], r["w"])
        for r in interval_join(
            points, intervals, on=["k"], point_ts="ts",
            start_col="s", end_col="e", bucket=100,
        ).collect()
    )
    # ts=100 (== start) in; ts=250 (middle bucket) in; ts=300 (== end)
    # out; ts=99 out; b's point 150 is outside b's [0, 50)
    assert out == [("a", 100, "w1"), ("a", 250, "w1")]


def test_incident_windows_merges_consecutive_days(spark):
    """Crafted frame: a service with two hot days back-to-back and one
    isolated hot day later must yield exactly two windows (2-day and
    1-day), with quiet-day spans excluded from both."""
    err = [_ltag("errorcode", 60)]
    ok = [_ltag("errorcode", 0)]
    rows = []
    sid = 0

    def burst(day_offset, n_err, n_ok):
        nonlocal sid
        for i in range(n_err):
            sid += 1
            rows.append(mk(trace_id=f"t{sid}", span_id=f"s{sid}", service="svc",
                           start=T0 + day_offset * DAY_US + i, tags=err))
        for i in range(n_ok):
            sid += 1
            rows.append(mk(trace_id=f"t{sid}", span_id=f"s{sid}", service="svc",
                           start=T0 + day_offset * DAY_US + 1000 + i, tags=ok))

    burst(0, 6, 0)   # hot (mean 2.0 -> threshold 2.4)
    burst(1, 6, 2)   # hot, consecutive -> merges with day 0
    burst(2, 0, 4)   # quiet
    burst(3, 0, 4)   # quiet
    burst(4, 0, 4)   # quiet
    burst(5, 6, 0)   # hot, isolated
    burst(6, 0, 4)   # quiet

    out = _patched(
        spark, rows,
        lambda: EQ.q_incident_windows(spark, "ignored").collect(),
    )
    got = [(r["w_start"], r["n_days"], r["n_spans"], r["n_errors"])
           for r in out]
    assert got == [
        (T0, 2, 14, 12),             # days 0-1 merged: 6+6 err, 2 ok
        (T0 + 5 * DAY_US, 1, 6, 6),  # isolated day 5
    ]


def test_asof_join_single_row_semantics_and_null_ts(spark):
    """Fixed by review: (a) all value columns come from ONE right row —
    a NULL field in the latest match must NOT be backfilled from an
    older row; (b) right rows with NULL timestamps are dropped, not
    promoted to universal matches."""
    from haystack_traces_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 20, "p")], "k long, lts long, tag string")
    right = spark.createDataFrame(
        [(1, 5, "a"), (1, 10, None), (1, None, "ghost")],
        "k long, rts long, v string",
    )
    out = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        value_cols=["rts", "v"],
    ).collect()[0]
    assert out["rts"] == 10 and out["v"] is None  # latest row, intact

    # NULL-ts-only right side: no match at all
    right2 = spark.createDataFrame([(1, None, "ghost")], "k long, rts long, v string")
    out2 = asof_join(
        left, right2, on=["k"], left_ts="lts", right_ts="rts",
        value_cols=["rts", "v"],
    ).collect()[0]
    assert out2["rts"] is None and out2["v"] is None


def test_interval_join_rejects_column_collisions(spark):
    import pytest

    from haystack_traces_spark.operators.asof import interval_join

    points = spark.createDataFrame([("a", 1, 9)], "k string, ts long, n long")
    intervals = spark.createDataFrame(
        [("a", 0, 10, 3)], "k string, s long, e long, n long"
    )
    with pytest.raises(ValueError, match="share non-key columns"):
        interval_join(points, intervals, on=["k"], point_ts="ts",
                      start_col="s", end_col="e", bucket=10)


def test_user_kanonymity_and_retention_on_crafted_events(spark, tmp_path):
    """k-anonymity: a unique behavioral signature is flagged; a shared
    one is not. Retention: a user active in cohort period and one later
    period produces a retention fraction over the cohort size."""
    import pyspark.sql.functions as F

    d = str(tmp_path / "sf")
    rows = []
    # users 1-5 share signature {a}; user 6 is unique {a,b} -> at risk
    for uid in range(1, 6):
        rows.append((uid * 10, uid, "a", 0))
    rows += [(100, 6, "a", 0), (101, 6, "b", 0)]
    # retention: users 1 and 2 return in period 1; others do not
    rows += [(200, 1, "a", 1), (201, 2, "a", 1)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, period int"
    )
    ev = df.select(
        "event_id",
        "user_id",
        "event_type",
        F.timestamp_micros(
            F.lit(EQ.T0) + F.col("period") * EQ.PERIOD_US + F.col("event_id")
        ).alias("ts"),
        F.lit(1.0).alias("value"),
        F.lit('{"k": 1}').alias("props"),
    )
    ev.write.parquet(f"{d}/events.parquet")

    kanon = {r["signature"]: r.asDict()
             for r in EQ.q_user_kanonymity(spark, d).collect()}
    assert kanon["a"]["n_users"] == 5 and not kanon["a"]["at_risk"]
    assert kanon["a\x1fb"]["n_users"] == 1 and kanon["a\x1fb"]["at_risk"]

    ret = {(r["cohort"], r["periods_since"]): r.asDict()
           for r in EQ.q_retention_cohorts(spark, d).collect()}
    assert ret[(0, 0)]["n_active"] == 6 and ret[(0, 0)]["retention"] == 1.0
    assert ret[(0, 1)]["n_active"] == 2
    assert ret[(0, 1)]["retention"] == round(2 / 6, 6)


# ---------------------------------------------------------------- round-5c --


def test_slo_burn_rate_multiwindow_page(spark):
    """Hour 0: clean (burn 0). Hour 1: 100% errors — burn_short = 10,
    burn_long over the trailing window = (10 errors / 20 spans) / 0.1 = 5,
    both > 1 → page. Hour 0 never pages despite the long window."""
    H = 3_600_000_000
    err = [_ltag("errorcode", 99)]
    rows = []
    for i in range(10):
        rows.append(mk(trace_id=f"c{i}", span_id=f"c{i}", start=T0 + i))
        rows.append(
            mk(trace_id=f"e{i}", span_id=f"e{i}", start=T0 + H + i, tags=err)
        )
    out = _patched(
        spark, rows, lambda: EQ.q_slo_burn_rate(spark, "ignored").collect()
    )
    by_hour = {r["hour_us"]: r.asDict() for r in out}
    h0, h1 = by_hour[T0 - T0 % H], by_hour[(T0 + H) - (T0 + H) % H]
    assert h0["n_errors"] == 0 and h0["burn_short"] == 0.0 and h0["page"] == 0
    assert h1["n_errors"] == 10
    assert h1["burn_short"] == 10.0
    assert h1["burn_long"] == 5.0
    assert h1["page"] == 1


def test_slo_burn_rate_long_window_suppresses_blip(spark):
    """A single-span error hour after 5 clean high-traffic hours: the
    short burn fires (10 > 1) but the trailing 6 h burn stays under 1 —
    no page (the SRE blip-suppression property)."""
    H = 3_600_000_000
    rows = []
    for h in range(5):
        for i in range(30):
            rows.append(
                mk(trace_id=f"t{h}_{i}", span_id=f"s{h}_{i}", start=T0 + h * H + i)
            )
    rows.append(
        mk(
            trace_id="blip",
            span_id="blip",
            start=T0 + 5 * H,
            tags=[_ltag("errorcode", 99)],
        )
    )
    out = _patched(
        spark, rows, lambda: EQ.q_slo_burn_rate(spark, "ignored").collect()
    )
    blip = [r for r in out if r["hour_us"] == T0 + 5 * H - (T0 + 5 * H) % H][0]
    assert blip["burn_short"] == 10.0  # 1/1 errors over budget 0.1
    assert blip["burn_long"] < 1  # 1 error / 151 spans / 0.1
    assert blip["page"] == 0


def test_hedged_requests_overlap_vs_sequential(spark):
    rows = [
        mk(trace_id="t1", span_id="root", parent=""),
        # two concurrent copies of svc_a:op_a under root — a hedge
        mk(trace_id="t1", span_id="h1", parent="root", start=T0, duration=100),
        mk(trace_id="t1", span_id="h2", parent="root", start=T0 + 50, duration=100),
        # sequential retry pair of svc_b:op_b — reported, not concurrent
        mk(trace_id="t1", span_id="r1", parent="root", service="svc_b",
           operation="op_b", start=T0, duration=10),
        mk(trace_id="t1", span_id="r2", parent="root", service="svc_b",
           operation="op_b", start=T0 + 500, duration=10),
        # singleton — never reported
        mk(trace_id="t1", span_id="x1", parent="root", service="svc_c"),
    ]
    out = _patched(
        spark, rows, lambda: EQ.q_hedged_requests(spark, "ignored").collect()
    )
    by_svc = {r["servicename"]: r.asDict() for r in out}
    assert set(by_svc) == {"svc_a", "svc_b"}
    a = by_svc["svc_a"]
    # wall window [T0, T0+150), busy 200 → 50 µs duplicated work
    assert a["n_calls"] == 2 and a["span_micros"] == 150
    assert a["wasted_micros"] == 50 and a["concurrent"] == 1
    b = by_svc["svc_b"]
    assert b["concurrent"] == 0 and b["wasted_micros"] == 0


def test_operation_affinity_lift(spark):
    rows = [
        # A and B co-occur in both traces; C only in t1
        mk(trace_id="t1", span_id="1", service="a", operation="op"),
        mk(trace_id="t1", span_id="2", service="b", operation="op"),
        mk(trace_id="t1", span_id="3", service="c", operation="op"),
        mk(trace_id="t2", span_id="4", service="a", operation="op"),
        mk(trace_id="t2", span_id="5", service="b", operation="op"),
        # duplicate span of a:op in t2 must not inflate counts
        mk(trace_id="t2", span_id="6", service="a", operation="op"),
    ]
    out = _patched(
        spark, rows, lambda: EQ.q_operation_affinity(spark, "ignored").collect()
    )
    by_pair = {(r["op_a"], r["op_b"]): r.asDict() for r in out}
    ab = by_pair[("a:op", "b:op")]
    assert ab["n_both"] == 2 and ab["lift"] == 1.0  # 2*2/(2*2)
    ac = by_pair[("a:op", "c:op")]
    assert ac["n_both"] == 1 and ac["lift"] == 1.0  # 1*2/(2*1)


def test_trace_fingerprints_order_invariant_grouping(spark):
    rows = [
        # same shape, different span order / different span counts
        mk(trace_id="t1", span_id="1", service="a", operation="x", duration=100),
        mk(trace_id="t1", span_id="2", parent="1", service="b", operation="y"),
        mk(trace_id="t2", span_id="3", service="b", operation="y"),
        mk(trace_id="t2", span_id="4", parent="3", service="a", operation="x",
           duration=300),
        mk(trace_id="t2", span_id="5", parent="3", service="a", operation="x"),
        # distinct shape
        mk(trace_id="t3", span_id="6", service="a", operation="x", duration=700),
    ]
    out = _patched(
        spark, rows, lambda: EQ.q_trace_fingerprints(spark, "ignored").collect()
    )
    by_shape = {r["shape"]: r.asDict() for r in out}
    assert set(by_shape) == {"a:x|b:y", "a:x"}
    g = by_shape["a:x|b:y"]
    # roots: t1 → span 1 (duration 100), t2 → span 3 (default duration
    # 1000) → avg_root_duration = mean(100, 1000)
    assert g["n_traces"] == 2
    assert g["avg_spans"] == 2.5
    assert g["avg_root_duration"] == 550.0
    assert by_shape["a:x"]["max_root_duration"] == 700


def test_round5c_trace_operators_plan_shapes(spark):
    from tests.test_plans import _plan

    sf = "/root/testdata/sf0.001"
    plans = {
        name: _plan(fn(spark, sf))
        for name, fn in {
            "slo_burn_rate": EQ.q_slo_burn_rate,
            "hedged_requests": EQ.q_hedged_requests,
            "operation_affinity": EQ.q_operation_affinity,
            "trace_fingerprints": EQ.q_trace_fingerprints,
        }.items()
    }
    for name, plan in plans.items():
        assert "CartesianProduct" not in plan, name
        if name == "operation_affinity":
            # its ONE single-partition exchange is the scalar trace-total
            # aggregate (one partial-count row per partition in flight),
            # bounded by partition count, then broadcast — allowed
            continue
        assert "Exchange SinglePartition" not in plan, (name, plan[:1500])
    # the per-key totals join broadcast-side onto the pair counts
    assert "BroadcastHashJoin" in plans["operation_affinity"]


def test_bottleneck_ops_argmax_self_time_with_tiebreak(spark):
    rows = [
        # t1: root self = 1000-700 = 300, child self = 700 → child wins
        mk(trace_id="t1", span_id="r1", service="root", operation="r",
           duration=1000),
        mk(trace_id="t1", span_id="c1", parent="r1", service="leaf",
           operation="l", duration=700),
        # t2: single span → trivially the bottleneck, share 1.0
        mk(trace_id="t2", span_id="s1", service="leaf", operation="l",
           duration=50),
        # t3: two roots with EQUAL self time → smaller span_id (e1) wins
        mk(trace_id="t3", span_id="e1", service="a", operation="p",
           duration=500),
        mk(trace_id="t3", span_id="e2", service="b", operation="q",
           duration=500),
    ]
    out = _patched(
        spark, rows, lambda: EQ.q_bottleneck_ops(spark, "ignored").collect()
    )
    by_op = {(r["servicename"], r["operationname"]): r.asDict() for r in out}
    assert set(by_op) == {("leaf", "l"), ("a", "p")}
    leaf = by_op[("leaf", "l")]
    assert leaf["n_traces"] == 2
    assert leaf["avg_self_time"] == 375.0  # (700 + 50) / 2
    assert leaf["avg_share"] == 0.85  # (700/1000 + 50/50) / 2
    tie = by_op[("a", "p")]
    assert tie["n_traces"] == 1 and tie["avg_share"] == 0.5


def test_clock_skew_estimator_on_skewed_pair(spark):
    rows = [
        # client observes [1000, 1120]; server's clock reads [1050, 1150]
        # → NTP offset ((50)+(30))/2 = 40, one-way delay ((50)-(30))/2 = 10
        mk(trace_id="t", span_id="s1", service="caller", start=1000,
           duration=120, tags=[_stag("span.kind", "client")]),
        mk(trace_id="t", span_id="s1", service="callee", start=1050,
           duration=100, tags=[_stag("span.kind", "server")]),
        # server-only root: no client half, excluded from the estimator
        mk(trace_id="t", span_id="r", service="callee", start=0,
           duration=999, tags=[_stag("span.kind", "server")]),
    ]
    out = EQ.clock_skew(_with_spans(spark, rows)).collect()
    assert [r.asDict() for r in out] == [
        {
            "client_svc": "caller",
            "server_svc": "callee",
            "n_rpcs": 1,
            "avg_skew": 40.0,
            "max_abs_skew": 40.0,
            "avg_delay": 10.0,
            "max_delay": 10.0,
        }
    ]


def test_callgraph_drift_classifies_new_vanished_stable(spark):
    rows = [
        # span starts range [0, 1990] → midpoint 995
        mk(trace_id="t1", span_id="r1", service="a", start=0),
        mk(trace_id="t1", span_id="c1", parent="r1", service="b", start=10),
        mk(trace_id="t2", span_id="r2", service="a", start=1000),
        mk(trace_id="t2", span_id="c2", parent="r2", service="c", start=1990),
        mk(trace_id="t2", span_id="c4", parent="r2", service="b", start=1500),
    ]
    out = _patched(
        spark, rows, lambda: EQ.q_callgraph_drift(spark, "ignored").collect()
    )
    by_edge = {(r["from_service"], r["to_service"]): r.asDict() for r in out}
    assert set(by_edge) == {("a", "b"), ("a", "c")}
    ab = by_edge[("a", "b")]
    assert (ab["n_first"], ab["n_second"], ab["status"], ab["ratio"]) == (
        1, 1, "stable", 1.0,
    )
    ac = by_edge[("a", "c")]
    assert (ac["n_first"], ac["n_second"], ac["status"], ac["ratio"]) == (
        0, 1, "new", None,
    )


def test_round5d_trace_operators_plan_shapes(spark):
    from tests.test_plans import _plan

    sf = "/root/testdata/sf0.001"
    plans = {
        name: _plan(fn(spark, sf))
        for name, fn in {
            "bottleneck_ops": EQ.q_bottleneck_ops,
            "clock_skew": EQ.q_clock_skew,
            "callgraph_drift": EQ.q_callgraph_drift,
        }.items()
    }
    for name, plan in plans.items():
        assert "CartesianProduct" not in plan, name
        if name == "callgraph_drift":
            # its ONE single-partition exchange is the 1-row min/max
            # midpoint aggregate (one partial row per partition in
            # flight), then broadcast back onto the edge stream — allowed
            assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
            continue
        # bottleneck_ops / clock_skew ride the trace exchange end to end:
        # no global window, no single-partition exchange anywhere
        assert "Exchange SinglePartition" not in plan, (name, plan[:1500])


def test_span_idle_gaps_interval_union_and_clipping(spark):
    rows = [
        # parent [0, 1000]; children [0,300]+[200,500] merge to one
        # island of 500, [600,700] adds 100, [900,1200] clips to
        # [900,1000] adding 100 → union 700, idle 300 (frac 0.3)
        mk(trace_id="t", span_id="p", service="P", start=0, duration=1000),
        mk(trace_id="t", span_id="c1", parent="p", service="x", start=0,
           duration=300),
        mk(trace_id="t", span_id="c2", parent="p", service="x", start=200,
           duration=300),
        mk(trace_id="t", span_id="c3", parent="p", service="x", start=600,
           duration=100),
        mk(trace_id="t", span_id="c4", parent="p", service="x", start=900,
           duration=300),
    ]
    out = _patched(
        spark, rows, lambda: EQ.q_span_idle_gaps(spark, "ignored").collect()
    )
    assert [r.asDict() for r in out] == [
        {
            "servicename": "p",
            "n_parents": 1,
            "avg_children": 4.0,
            "avg_idle": 300.0,
            "avg_idle_frac": 0.3,
        }
    ]


def test_operation_cardinality_guard_debuts_and_rate(spark):
    rows = [
        # starts span [0, 1990] → midpoint 995
        mk(trace_id="t1", span_id="1", service="a", operation="o1", start=0),
        mk(trace_id="t2", span_id="2", service="a", operation="o1", start=1990),
        mk(trace_id="t3", span_id="3", service="a", operation="o2", start=1500),
        mk(trace_id="t4", span_id="4", service="b", operation="o3", start=10),
    ]
    out = _patched(
        spark, rows,
        lambda: EQ.q_operation_cardinality_guard(spark, "ignored").collect(),
    )
    by_svc = {r["servicename"]: r.asDict() for r in out}
    a = by_svc["a"]
    assert (a["n_spans"], a["n_ops"], a["new_ops"]) == (3, 2, 1)
    assert a["ops_per_1k_spans"] == 666.666667
    b = by_svc["b"]
    assert (b["n_spans"], b["n_ops"], b["new_ops"]) == (1, 1, 0)


def test_dependency_cycles_enumeration(spark):
    rows = [
        # self-loop a→a
        mk(trace_id="t1", span_id="p1", service="a"),
        mk(trace_id="t1", span_id="c1", parent="p1", service="a"),
        # mutual b⇄c (one edge each way, two traces)
        mk(trace_id="t2", span_id="p2", service="b"),
        mk(trace_id="t2", span_id="c2", parent="p2", service="c"),
        mk(trace_id="t3", span_id="p3", service="c"),
        mk(trace_id="t3", span_id="c3", parent="p3", service="b"),
        # triangle d→e→f→d
        mk(trace_id="t4", span_id="p4", service="d"),
        mk(trace_id="t4", span_id="c4", parent="p4", service="e"),
        mk(trace_id="t4", span_id="c5", parent="c4", service="f"),
        mk(trace_id="t4", span_id="c6", parent="c5", service="d"),
    ]
    out = _patched(
        spark, rows, lambda: EQ.q_dependency_cycles(spark, "ignored").collect()
    )
    got = {(r["cycle_type"], r["members"]): r["n_calls"] for r in out}
    assert got == {
        ("self", "a"): 1,
        ("mutual", "b>c"): 2,
        ("triangle", "d>e>f"): 3,
    }


def test_service_latency_coupling_perfect_corr(spark):
    rows = []
    for i, (x, y, z) in enumerate([(100, 200, 300), (200, 400, 200),
                                   (300, 600, 100)]):
        rows += [
            mk(trace_id=f"t{i}", span_id=f"x{i}", service="x", duration=x),
            mk(trace_id=f"t{i}", span_id=f"y{i}", service="y", duration=y),
            mk(trace_id=f"t{i}", span_id=f"z{i}", service="z", duration=z),
        ]
    out = _patched(
        spark, rows,
        lambda: EQ.q_service_latency_coupling(spark, "ignored").collect(),
    )
    by_pair = {(r["svc_a"], r["svc_b"]): r.asDict() for r in out}
    assert by_pair[("x", "y")]["latency_corr"] == 1.0
    assert by_pair[("x", "z")]["latency_corr"] == -1.0
    assert by_pair[("x", "y")]["n_traces"] == 3


def test_round5ef_trace_operators_plan_shapes(spark):
    from tests.test_plans import _plan

    sf = "/root/testdata/sf0.001"
    plans = {
        name: _plan(fn(spark, sf))
        for name, fn in {
            "span_idle_gaps": EQ.q_span_idle_gaps,
            "operation_cardinality_guard": EQ.q_operation_cardinality_guard,
            "dependency_cycles": EQ.q_dependency_cycles,
            "service_latency_coupling": EQ.q_service_latency_coupling,
        }.items()
    }
    for name, plan in plans.items():
        assert "CartesianProduct" not in plan, name
        if name == "operation_cardinality_guard":
            # its ONE single-partition exchange is the 1-row midpoint
            # aggregate, broadcast back — same allowance as callgraph_drift
            continue
        assert "Exchange SinglePartition" not in plan, (name, plan[:1500])


def test_cold_start_tax_first_k_vs_rest(spark):
    rows = [
        mk(trace_id=f"t{i}", span_id=f"s{i}", service="svc", operation="op",
           start=T0 + i, duration=1000 if i < 5 else 100)
        for i in range(7)
    ] + [
        mk(trace_id=f"u{i}", span_id=f"u{i}", service="svc", operation="tiny",
           start=T0 + i, duration=500)
        for i in range(3)
    ]
    out = _patched(
        spark, rows, lambda: EQ.q_cold_start_tax(spark, "ignored").collect()
    )
    by_op = {r["operationname"]: r.asDict() for r in out}
    op = by_op["op"]
    assert (op["avg_cold"], op["avg_warm"], op["cold_tax"]) == (
        1000.0, 100.0, 10.0,
    )
    tiny = by_op["tiny"]
    assert tiny["n_calls"] == 3
    assert tiny["avg_warm"] is None and tiny["cold_tax"] is None


def test_trace_parallelism_buckets(spark):
    rows = [
        # A: root 100 + two children 100 → path 200, total 300 → 1.5
        mk(trace_id="A", span_id="r", service="s", duration=100),
        mk(trace_id="A", span_id="c1", parent="r", service="s", duration=100),
        mk(trace_id="A", span_id="c2", parent="r", service="s", duration=100),
        # B: single span → factor exactly 1.0
        mk(trace_id="B", span_id="b", service="s", duration=50),
        # C: root 100 + three children 100 → path 200, total 400 → 2.0
        mk(trace_id="C", span_id="r2", service="s", duration=100),
        mk(trace_id="C", span_id="d1", parent="r2", service="s", duration=100),
        mk(trace_id="C", span_id="d2", parent="r2", service="s", duration=100),
        mk(trace_id="C", span_id="d3", parent="r2", service="s", duration=100),
    ]
    out = _patched(
        spark, rows, lambda: EQ.q_trace_parallelism(spark, "ignored").collect()
    )
    by_bucket = {r["parallelism_bucket"]: r.asDict() for r in out}
    assert by_bucket[1]["n_traces"] == 2 and by_bucket[1]["avg_factor"] == 1.25
    assert by_bucket[2]["n_traces"] == 1 and by_bucket[2]["avg_factor"] == 2.0


def test_error_recovery_time_next_success_gap(spark):
    err = [_ltag("errorcode", 500)]
    rows = [
        mk(trace_id="t1", span_id="e1", service="a", operation="o",
           start=100, tags=err),
        mk(trace_id="t2", span_id="k1", service="a", operation="o",
           start=300),
        # trailing error with no later success → counted, not recovered
        mk(trace_id="t3", span_id="e2", service="a", operation="o",
           start=500, tags=err),
    ]
    out = _patched(
        spark, rows,
        lambda: EQ.q_error_recovery_time(spark, "ignored").collect(),
    )
    assert [r.asDict() for r in out] == [
        {"servicename": "a", "n_errors": 2, "n_recovered": 1,
         "avg_recovery_us": 200.0, "max_recovery_us": 200}
    ]


def test_load_latency_curve_positive_corr(spark):
    H = EQ._HOUR_US
    rows = []
    # hour 0: 1 span @100; hour 1: 2 spans @200; hour 2: 3 spans @300
    sid = 0
    for h, (n, dur) in enumerate([(1, 100), (2, 200), (3, 300)]):
        for _ in range(n):
            rows.append(mk(trace_id=f"t{sid}", span_id=f"s{sid}",
                           service="svc", start=h * H + sid, duration=dur))
            sid += 1
    out = _patched(
        spark, rows,
        lambda: EQ.q_load_latency_curve(spark, "ignored").collect(),
    )
    assert [r.asDict() for r in out] == [
        {"servicename": "svc", "n_hours": 3, "total_spans": 6,
         "corr_load_latency": 1.0}
    ]


def test_sampling_rate_plan_water_filling(spark):
    rows = []
    sid = 0
    for svc, n in (("a", 2), ("b", 30), ("c", 68)):
        for _ in range(n):
            rows.append(mk(trace_id=f"t{sid}", span_id=f"s{sid}",
                           service=svc, start=T0 + sid))
            sid += 1
    out = _patched(
        spark, rows,
        lambda: EQ.q_sampling_rate_plan(spark, "ignored").collect(),
    )
    # budget = 0.2 * 100 = 20: a (2 spans) kept whole; waterline
    # (20-2)/2 = 9 splits between b and c
    by_svc = {r["servicename"]: r.asDict() for r in out}
    assert by_svc["a"] == {"servicename": "a", "n_spans": 2,
                           "keep_rate": 1.0, "kept_spans": 2}
    assert by_svc["b"]["keep_rate"] == 0.3 and by_svc["b"]["kept_spans"] == 9
    assert by_svc["c"]["keep_rate"] == round(9 / 68, 6)
    assert by_svc["c"]["kept_spans"] == 9
    assert sum(r["kept_spans"] for r in out) == 20  # hits the budget


def test_hot_call_paths_prefix_enumeration(spark):
    rows = [
        mk(trace_id="t1", span_id="r1", service="gw", duration=100),
        mk(trace_id="t1", span_id="a1", parent="r1", service="auth",
           duration=50),
        mk(trace_id="t1", span_id="d1", parent="a1", service="db",
           duration=20),
        mk(trace_id="t2", span_id="r2", service="gw", duration=300),
        mk(trace_id="t2", span_id="a2", parent="r2", service="auth",
           duration=150),
    ]
    out = _patched(
        spark, rows, lambda: EQ.q_hot_call_paths(spark, "ignored").collect()
    )
    got = {r["path"]: (r["n_occurrences"], r["avg_tail_duration"])
           for r in out}
    assert got == {
        "gw": (2, 200.0),
        "gw>auth": (2, 100.0),
        "gw>auth>db": (1, 20.0),
    }


def test_round5gh_trace_operators_plan_shapes(spark):
    from tests.test_plans import _plan

    sf = "/root/testdata/sf0.001"
    plans = {
        name: _plan(fn(spark, sf))
        for name, fn in {
            "cold_start_tax": EQ.q_cold_start_tax,
            "trace_parallelism": EQ.q_trace_parallelism,
            "error_recovery_time": EQ.q_error_recovery_time,
            "load_latency_curve": EQ.q_load_latency_curve,
            "hot_call_paths": EQ.q_hot_call_paths,
        }.items()
    }
    for name, plan in plans.items():
        assert "CartesianProduct" not in plan, name
        # all five ride per-group windows / the trace exchange; none may
        # collapse to a single partition
        assert "Exchange SinglePartition" not in plan, (name, plan[:1500])


def test_tag_value_stats_cardinality_and_nulls(spark):
    rows = [
        mk(trace_id="t1", span_id="1", tags=[_ltag("errorcode", 7),
                                              _stag("role", "haystack")]),
        mk(trace_id="t2", span_id="2", tags=[_ltag("errorcode", 7),
                                              _stag("role", "haystack")]),
        mk(trace_id="t3", span_id="3", tags=[_ltag("errorcode", 9)]),
        # NULL-valued occurrence: counts toward n_spans, not the values
        mk(trace_id="t4", span_id="4", tags=[{
            "key": "errorcode", "vtype": "LONG", "vstr": None,
            "vlong": None, "vdouble": None, "vbool": None, "vbytes": None,
        }]),
    ]
    out = _patched(
        spark, rows, lambda: EQ.q_tag_value_stats(spark, "ignored").collect()
    )
    by_key = {r["tag_key"]: r.asDict() for r in out}
    err = by_key["errorcode"]
    assert (err["n_spans"], err["n_values"]) == (4, 2)
    assert err["top_value"] == "7" and err["top_share"] == round(2 / 3, 6)
    role = by_key["role"]
    assert (role["n_spans"], role["n_values"], role["top_share"]) == (
        2, 1, 1.0,
    )


def test_timestamp_granularity_detects_truncated_clock(spark):
    rows = (
        # healthy µs clock: unaligned starts
        [mk(trace_id=f"a{i}", span_id=f"a{i}", service="healthy",
            start=T0 + 1_000 * i + 7) for i in range(5)]
        # ms-truncated instrumentation: every start % 1000 == 0
        + [mk(trace_id=f"b{i}", span_id=f"b{i}", service="coarse",
              start=T0 + 1_000 * i) for i in range(5)]
    )
    out = _patched(
        spark, rows,
        lambda: EQ.q_timestamp_granularity(spark, "ignored").collect(),
    )
    by_svc = {r["servicename"]: r.asDict() for r in out}
    assert by_svc["healthy"]["inferred_granularity"] == "microsecond"
    assert by_svc["healthy"]["frac_ms_aligned"] == 0.0
    coarse = by_svc["coarse"]
    assert coarse["frac_ms_aligned"] == 1.0
    # T0 is second-aligned, the others only ms-aligned
    assert coarse["inferred_granularity"] == "millisecond"


def test_concurrent_trace_load_minute_grid(spark):
    B = EQ.TRACE_LOAD_BUCKET_US
    rows = [
        # trace A spans buckets 0-2 (start bucket 0, end bucket 2)
        mk(trace_id="A", span_id="a1", start=10, duration=100),
        mk(trace_id="A", span_id="a2", start=2 * B + 5, duration=50),
        # trace B lives entirely in bucket 1
        mk(trace_id="B", span_id="b1", start=B + 100, duration=200),
    ]
    out = _patched(
        spark, rows,
        lambda: EQ.q_concurrent_trace_load(spark, "ignored").collect(),
    )
    by_bucket = {r["bucket_start"] // B: r.asDict() for r in out}
    assert by_bucket[0]["n_active"] == 1 and by_bucket[0]["n_starting"] == 1
    assert by_bucket[1]["n_active"] == 2
    assert by_bucket[1]["n_starting"] == 1 and by_bucket[1]["n_ending"] == 1
    assert by_bucket[2]["n_active"] == 1 and by_bucket[2]["n_ending"] == 1


# ------------------------------------------------- round-6 trace ops ------
def test_latency_variance_decomposition_linear_driver(spark):
    """svc_a's time varies and fully determines the trace envelope;
    svc_b contributes a constant 5 — so svc_a holds var_share 1 / corr 1
    and svc_b holds var_share 0 with NULL corr (zero variance)."""
    rows = []
    for i, da in enumerate((10, 20, 30, 40)):
        t = f"t{i}"
        rows.append(mk(trace_id=t, span_id=f"a{i}", service="svc_a",
                       start=T0, duration=da))
        rows.append(mk(trace_id=t, span_id=f"b{i}", service="svc_b",
                       start=T0 + da, duration=5))
    out = _patched(
        spark, rows,
        lambda: {r["svc"]: r.asDict()
                 for r in EQ.q_latency_variance_decomposition(
                     spark, "ignored").collect()},
    )
    a, b = out["svc_a"], out["svc_b"]
    assert (a["n_traces_present"], a["var_share"], a["corr"]) == (4, 1.0, 1.0)
    assert (b["n_traces_present"], b["var_share"]) == (4, 0.0)
    assert b["corr"] is None


def test_span_duration_modality_two_point_and_constant(spark):
    """A 50/50 two-point duration mix is maximally bimodal (g1=0,
    g2=-2, BC=1); constant durations have undefined shape (NULLs) on
    both faces."""
    rows = (
        [mk(trace_id=f"x{i}", span_id=f"x{i}", service="svc_a",
            operation="op_bi", duration=0) for i in range(3)]
        + [mk(trace_id=f"y{i}", span_id=f"y{i}", service="svc_a",
              operation="op_bi", duration=10) for i in range(3)]
        + [mk(trace_id=f"z{i}", span_id=f"z{i}", service="svc_a",
              operation="op_const", duration=7) for i in range(5)]
    )
    out = _patched(
        spark, rows,
        lambda: {r["operationname"]: r.asDict()
                 for r in EQ.q_span_duration_modality(
                     spark, "ignored").collect()},
    )
    bi, const = out["op_bi"], out["op_const"]
    assert bi["n"] == 6
    assert (bi["skewness"], bi["excess_kurtosis"], bi["bimodality"]) == (
        0.0, -2.0, 1.0)
    assert const["n"] == 5
    assert (const["skewness"], const["excess_kurtosis"],
            const["bimodality"]) == (None, None, None)


def test_span_duration_modality_near_constant_large_magnitude(spark):
    """Review-found instability: steady ~1e6 µs durations must produce
    the TRUE shape stats (computed exactly from the centered values),
    not raw-power-sum cancellation noise (unanchored g2 was ~1.5e9)."""
    durs = [1_000_000, 1_000_001, 1_000_002, 1_000_003, 1_000_001]
    rows = [mk(trace_id=f"t{i}", span_id=f"s{i}", service="svc_a",
               operation="op_steady", duration=d) for i, d in enumerate(durs)]
    out = _patched(
        spark, rows,
        lambda: EQ.q_span_duration_modality(spark, "ignored").collect(),
    )
    assert len(out) == 1
    r = out[0].asDict()
    c = [d - min(durs) for d in durs]
    n = len(c)
    mean = sum(c) / n
    m2 = sum(x * x for x in c) / n - mean * mean
    m3 = (sum(x**3 for x in c) / n - 3 * mean * sum(x * x for x in c) / n
          + 2 * mean**3)
    m4 = (sum(x**4 for x in c) / n - 4 * mean * sum(x**3 for x in c) / n
          + 6 * mean * mean * sum(x * x for x in c) / n - 3 * mean**4)
    g1, g2 = m3 / m2**1.5, m4 / m2**2 - 3
    assert r["skewness"] == round(g1, 6)
    assert r["excess_kurtosis"] == round(g2, 6)
    assert r["bimodality"] == round((g1 * g1 + 1) / (g2 + 3), 6)
    assert abs(r["excess_kurtosis"]) < 10  # the bug produced ~1.5e9


def test_service_overlap_time_interval_intersection(spark):
    """svc_a [0,10) and svc_b [5,15) overlap exactly 5 µs; svc_c starts
    after both end — pairs with zero overlap are dropped."""
    rows = [
        mk(trace_id="t1", span_id="a", service="svc_a", start=T0, duration=10),
        mk(trace_id="t1", span_id="b", service="svc_b", start=T0 + 5,
           duration=10),
        mk(trace_id="t1", span_id="c", service="svc_c", start=T0 + 100,
           duration=10),
    ]
    out = _patched(
        spark, rows,
        lambda: [r.asDict() for r in
                 EQ.q_service_overlap_time(spark, "ignored").collect()],
    )
    # (a,c) and (b,c) never overlap -> filtered; only (a,b) remains
    assert len(out) == 1
    r = out[0]
    assert (r["svc_a"], r["svc_b"]) == ("svc_a", "svc_b")
    assert (r["n_traces"], r["n_overlapping_pairs"],
            r["total_overlap_us"]) == (1, 1, 5)


def test_sampling_debias_weights_policy_arms(spark):
    """Weight arms follow the shared policy constants: kept strata get
    1, the hash stratum gets 100/rate, drops get 0; weighted_traces is
    the Horvitz-Thompson estimate n·w."""
    from haystack_traces_spark.datapipe.hashing import hash60_py
    from haystack_traces_spark.streaming.sampling_stream import (
        DEFAULT_RATE_PCT,
        DEFAULT_SLOW_US,
    )

    rows = [mk(trace_id="err", span_id="e", duration=10,
               tags=[_ltag("errorcode", 500)])]
    rows.append(mk(trace_id="slow", span_id="s", duration=DEFAULT_SLOW_US + 1))
    for i in range(30):
        rows.append(mk(trace_id=f"t{i}", span_id=f"n{i}", duration=100))
    out = _patched(
        spark, rows,
        lambda: {r["reason"]: r.asDict() for r in
                 EQ.q_sampling_debias_weights(spark, "ignored").collect()},
    )
    assert out["error"]["weight"] == 1.0 and out["error"]["n_traces"] == 1
    assert out["slow"]["weight"] == 1.0 and out["slow"]["n_traces"] == 1
    n_hash = sum(1 for i in range(30)
                 if hash60_py(f"t{i}", seed="tail:") % 100 < DEFAULT_RATE_PCT)
    if n_hash:
        h = out["hash"]
        assert h["weight"] == 100.0 / DEFAULT_RATE_PCT
        assert h["n_traces"] == n_hash
        assert h["weighted_traces"] == round(n_hash * h["weight"], 6)
    assert out["drop"]["weight"] == 0.0
    assert out["drop"]["n_traces"] == 30 - n_hash


def test_error_depth_profile_localizes_leaf_errors(spark):
    """Root (depth 0) clean, both leaves (depth 1) erroring → depth-1
    error_rate 1.0, depth-0 0.0."""
    rows = [
        mk(trace_id="t1", span_id="root"),
        mk(trace_id="t1", span_id="l1", parent="root",
           tags=[_ltag("errorcode", 500)]),
        mk(trace_id="t1", span_id="l2", parent="root",
           tags=[_ltag("errorcode", 503)]),
    ]
    out = _patched(
        spark, rows,
        lambda: {r["depth"]: r.asDict()
                 for r in EQ.q_error_depth_profile(spark, "ignored").collect()},
    )
    assert out[0]["n_spans"] == 1 and out[0]["error_rate"] == 0.0
    assert out[1] == {"depth": 1, "n_spans": 2, "n_errors": 2,
                      "error_rate": 1.0}


def test_tag_coverage_counts_usable_values_only(spark):
    """A present-but-NULL-valued errorcode tag is NOT coverage; role
    carries a value on one of two spans → 0.5."""
    null_err = dict(_ltag("errorcode", 0)); null_err["vlong"] = None
    rows = [
        mk(trace_id="t1", span_id="a", service="svc_a",
           tags=[_ltag("errorcode", 7), _stag("role", "edge")]),
        mk(trace_id="t2", span_id="b", service="svc_a", tags=[null_err]),
    ]
    out = _patched(
        spark, rows,
        lambda: {r["tag_key"]: r.asDict()
                 for r in EQ.q_tag_coverage(spark, "ignored").collect()},
    )
    err, role = out["errorcode"], out["role"]
    assert (err["n_spans"], err["n_tagged"], err["coverage"]) == (2, 1, 0.5)
    assert (role["n_spans"], role["n_tagged"], role["coverage"]) == (2, 1, 0.5)


def test_retry_effectiveness_final_attempt_decides(spark):
    """Chain A: error then clean retry → recovered. Chain B: error then
    error → not recovered. A clean repeat chain (no error) is NOT an
    error chain. A single error call (no retry) is NOT a chain."""
    err = [_ltag("errorcode", 500)]
    rows = [
        # chain A (recovers): error at t0, clean at t1
        mk(trace_id="t1", span_id="a1", operation="opA", start=T0, tags=err),
        mk(trace_id="t1", span_id="a2", operation="opA", start=T0 + 10),
        # chain B (doesn't): clean then error
        mk(trace_id="t2", span_id="b1", operation="opB", start=T0),
        mk(trace_id="t2", span_id="b2", operation="opB", start=T0 + 10,
           tags=err),
        # clean repeats: excluded
        mk(trace_id="t3", span_id="c1", operation="opC", start=T0),
        mk(trace_id="t3", span_id="c2", operation="opC", start=T0 + 10),
        # single error call: excluded
        mk(trace_id="t4", span_id="d1", operation="opD", start=T0, tags=err),
    ]
    out = _patched(
        spark, rows,
        lambda: {r["operationname"]: r.asDict()
                 for r in EQ.q_retry_effectiveness(spark, "ignored").collect()},
    )
    assert set(out) == {"opa", "opb"}
    assert (out["opa"]["n_error_chains"], out["opa"]["n_recovered"],
            out["opa"]["recovery_rate"]) == (1, 1, 1.0)
    assert (out["opb"]["n_error_chains"], out["opb"]["n_recovered"],
            out["opb"]["recovery_rate"]) == (1, 0, 0.0)


def test_index_partition_profile_bucket_boundaries(spark):
    """Traces at hour 0 and hour 6 of the same UTC day land in hb 0 and
    hb 1; a trace the next day opens a new day_us row; group counts roll
    up per bucket."""
    day0 = (T0 // EQ.DAY_US) * EQ.DAY_US
    rows = [
        mk(trace_id="t1", span_id="a", service="svc_a", start=day0 + 1),
        mk(trace_id="t1", span_id="b", service="svc_b", start=day0 + 2),
        mk(trace_id="t2", span_id="c", start=day0 + EQ.HB_US + 5),
        mk(trace_id="t3", span_id="d", start=day0 + EQ.DAY_US + 7),
    ]
    out = _patched(
        spark, rows,
        lambda: [r.asDict() for r in
                 EQ.q_index_partition_profile(spark, "ignored").collect()],
    )
    assert [(r["day_us"], r["hb"], r["n_traces"], r["n_groups_total"],
             r["max_groups_per_trace"]) for r in out] == [
        (day0, 0, 1, 2, 2),
        (day0, 1, 1, 1, 1),
        (day0 + EQ.DAY_US, 0, 1, 1, 1),
    ]


# ---------------------------------------------------- round-7 operators ----
class TestRound7Operators:
    def test_anchored_sessions_half_open_boundary(self, spark):
        """Anchored rule: the session admits [anchor, anchor+W); an event
        exactly AT anchor+W opens a NEW session (same boundary the
        streaming event-time face enforces — shared _split_islands core)."""
        W = EQ.ANCHOR_WINDOW_US
        rows = [
            # user 1: events at 0, W-1 (inside), W (boundary -> new), W+3
            (1, 10, T0),
            (1, 11, T0 + W - 1),
            (1, 12, T0 + W),
            (1, 13, T0 + W + 3),
            # user 2: single event
            (2, 20, T0 + 5),
        ]
        ev = spark.createDataFrame(rows, "user_id long, event_id long, tus long")
        got = [tuple(r) for r in EQ.anchored_sessions(ev).collect()]
        assert got == [
            (1, 1, 2, T0, T0 + W - 1),
            (1, 2, 2, T0 + W, T0 + W + 3),
            (2, 1, 1, T0 + 5, T0 + 5),
        ]

    def test_anchored_vs_gap_sessions_differ_on_slow_drift(self, spark):
        """A chain of events each spaced just under the horizon never gaps
        out (ONE gap-session) but anchored windows keep cutting — the
        semantic difference between the two faces, pinned."""
        W = EQ.ANCHOR_WINDOW_US
        step = W - 1
        rows = [(1, i, T0 + i * step) for i in range(5)]
        ev = spark.createDataFrame(rows, "user_id long, event_id long, tus long")
        anchored = EQ.anchored_sessions(ev, window_us=W).count()
        gap = EQ.sessionize_events(ev, gap_us=W).count()
        assert gap == 1
        assert anchored == 3  # [0, W-1], [2(W-1), 3(W-1)], [4(W-1)]

    def test_latency_changepoint_clean_step(self, spark):
        """12 hour-buckets of flat 1000 µs then flat 3000 µs: the split
        lands exactly on the last before-bucket, means are exact, and
        gain_share = 1 (the split explains all variance)."""
        B = EQ.CP_BUCKET_US
        rows = []
        for b in range(12):
            dur = 1000 if b < 7 else 3000
            for i in range(3):  # 3 spans per bucket
                rows.append(mk(
                    trace_id=f"t{b}_{i}", span_id=f"s{b}_{i}",
                    service="svc", operation="op",
                    start=T0 + b * B + i, duration=dur,
                ))
        spans = _with_spans(spark, rows)
        [r] = EQ.latency_changepoint_from(spans).collect()
        assert r["n_buckets"] == 12
        assert r["split_bucket"] == T0 + 6 * B  # last flat-1000 bucket
        assert r["mean_before_us"] == 1000
        assert r["mean_after_us"] == 3000
        assert r["gain_share"] == 1.0

    def test_latency_changepoint_flat_series_zero_gain(self, spark):
        """A constant series has SST = 0: gain_share must be NULL (not a
        div-by-zero abort), and short series are filtered out."""
        B = EQ.CP_BUCKET_US
        rows = [
            mk(trace_id=f"c{b}", span_id=f"c{b}", service="svc",
               operation="flat", start=T0 + b * B, duration=500)
            for b in range(8)
        ] + [
            mk(trace_id="s1", span_id="s1", service="svc",
               operation="short", start=T0, duration=100),
        ]
        out = {r["operationname"]: r for r in
               EQ.latency_changepoint_from(_with_spans(spark, rows)).collect()}
        assert "short" not in out  # < CP_MIN_BUCKETS buckets
        assert out["flat"]["gain_share"] is None

    def test_ann_filtered_excludes_other_labels(self, spark):
        """The global nearest neighbor has the WRONG label: filtered
        search must skip it and fill k from the probe's own label —
        the under-fill a post-filter would cause."""
        from haystack_traces_spark.datapipe import similarity as S

        def vec(x, y):
            return [x, y] + [0.0] * 62

        rows = [
            (0, vec(1.0, 0.0), 7),        # probe, label 7
            (1, vec(0.999, 0.04), 9),     # global top-1, WRONG label
            (2, vec(0.95, 0.3), 7),       # same-label nearest
            (3, vec(0.0, 1.0), 7),        # same-label far
        ]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        got = [(r["neighbor_id"], r["rank"], r["flabel"])
               for r in S.filtered_topk(emb, [0], k=2).collect()]
        assert got == [(2, 1, 7), (3, 2, 7)]

    def test_pq_code_entropy_uniform_vs_collapsed(self, spark):
        """Degenerate embeddings that all encode to one codeword per
        subspace: entropy 0, top share 1, one code used."""
        import math

        from haystack_traces_spark.datapipe import similarity as S

        emb = spark.createDataFrame(
            [(i, [float(i == 0)] * 64) for i in range(20)],
            "vec_id long, embedding array<float>",
        )
        # 20 near-identical vectors (only vec 0 differs): k-means codebooks
        # trained on the lowest-id sample still map the 19 identical ones
        # to one codeword; entropy must be near 0, never ln(ksub)
        out = {r["s"]: r for r in S.pq_code_entropy(emb, ksub=4).collect()}
        assert set(out) == set(range(S.PQ_M))
        for r in out.values():
            assert r["n_vecs"] == 20
            assert r["top_code_share"] >= 0.95
            assert r["code_entropy"] <= math.log(2)

    def test_mmr_diversify_skips_near_copy(self, spark):
        """The #2-by-relevance candidate is a near-copy of #1: plain
        top-2 would return both; MMR's second pick must be the DIVERSE
        third candidate instead."""
        from haystack_traces_spark.datapipe import similarity as S

        import math

        def unit(theta):
            return [math.cos(theta), math.sin(theta)] + [0.0] * 62

        rows = [
            (0, unit(0.0)),         # query
            (1, unit(0.7854)),      # most relevant (ties rel with 3 -> id)
            (2, unit(0.80)),        # near-copy of 1 (sim(1,2) ~ 0.9999)
            (3, unit(-0.7854)),     # same relevance, ORTHOGONAL to 1
        ]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        got = [(r["pick"], r["vec_id"]) for r in
               S.mmr_diversify(emb, query_id=0, k=2, pool_size=3).collect()]
        # pick 1: rel tie between 1 and 3 -> lowest id; pick 2: the
        # near-copy 2 scores 0.7*rel - 0.3*~1, the orthogonal 3 scores
        # 0.7*rel - 0, so diversity wins
        assert got == [(1, 1), (2, 3)]

    def test_session_paths_orders_steps_and_counts(self, spark):
        """Crafted sessions through the SHIPPED core (session_paths_from):
        path = first PATH_STEPS event types in (tus, event_id) order,
        truncated paths for short sessions, exact avg."""
        rows = [
            # user 1, one session of 4 events: view click view purchase
            (1, 1, "view", T0), (1, 2, "click", T0 + 1),
            (1, 3, "view", T0 + 2), (1, 4, "purchase", T0 + 3),
            # user 2, one 1-event session
            (2, 5, "view", T0),
        ]
        ev = spark.createDataFrame(
            rows, "user_id long, event_id long, etype string, tus long"
        )
        got = {r["path"]: (r["n_sessions"], r["avg_session_events"])
               for r in EQ.session_paths_from(ev).collect()}
        assert got == {
            "view>click>view": (1, 4.0),
            "view": (1, 1.0),
        }

    def test_index_salt_plan_flags_hot_partition(self, spark):
        """The SHIPPED operator over a crafted hot bucket: a (day, hb)
        partition holding SALT_TARGET_GROUPS + 1 index groups must report
        files_needed = 2 and salted = true, while a cool bucket reports
        1/false — exact at the integer-ceil boundary."""
        n_hot = EQ.SALT_TARGET_GROUPS + 1
        rows = [
            # hot bucket: one trace with n_hot distinct operations at T0
            mk(trace_id="hot", span_id=f"h{i}", service="svc",
               operation=f"op_{i}", start=T0 + i, duration=10)
            for i in range(n_hot)
        ] + [
            # cool bucket, next day: one group
            mk(trace_id="cool", span_id="c", service="svc",
               operation="op", start=T0 + DAY_US, duration=10),
        ]
        import haystack_traces_spark.entry_queries as EQm
        orig = EQm._spans
        EQm._spans = lambda _s, _d: _with_spans(spark, rows)
        try:
            got = {
                (r["day_us"], r["hb"]): (
                    r["n_groups_total"], r["files_needed"], r["salted"]
                )
                for r in EQm.q_index_salt_plan(spark, "crafted").collect()
            }
        finally:
            EQm._spans = orig
        hot = got[(T0 - T0 % DAY_US, (T0 % DAY_US) // (6 * 3_600_000_000))]
        cool_key = (
            T0 + DAY_US - (T0 + DAY_US) % DAY_US,
            ((T0 + DAY_US) % DAY_US) // (6 * 3_600_000_000),
        )
        assert hot == (n_hot, 2, True)
        assert got[cool_key] == (1, 1, False)

    def test_dedup_cascade_marginal_attribution(self, spark):
        """An exact copy is flagged by every stage but counted NEW only
        at stage 1; a containment-only dup (paragraph inside a longer
        doc) reaches stage 4 as new; marginal counts zero-fill."""
        from haystack_traces_spark.datapipe import queries as dp

        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        rows = [
            (0, base, "en", "s", len(base)),
            (1, base, "en", "s", len(base)),               # exact copy
            (2, base + " " + base + " lam mu nu xi omicron pi rho sigma tau "
                "upsilon phi chi psi omega one two three four five six",
             "en", "s", 0),                                # contains base
            (3, "totally different words nothing shared here at all "
                "seven eight nine ten eleven twelve thirteen fourteen",
             "en", "s", 0),                                # unique
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, "
            "n_chars long"
        )
        import haystack_traces_spark.datapipe.queries as Q
        orig = Q._docs
        Q._docs = lambda _s, _d: docs
        try:
            # unique sf_dir tag: the mh/ct branches ride session-cached
            # shared stages keyed by (appId, sf_dir, name) — a generic
            # tag could collide with another monkeypatched test
            out = {r["stage_name"]: r for r in
                   dp.q_dedup_cascade_yield(
                       spark, "crafted://cascade_yield").collect()}
        finally:
            Q._docs = orig
        assert out["exact"]["n_new"] == 1          # doc 1
        assert out["normalized"]["n_new"] == 0     # shadowed by exact
        assert out["minhash"]["n_flagged"] >= 1    # doc 1 again (J=1.0)
        assert out["minhash"]["n_new"] == 0
        # doc 2 contains doc 0's full shingle set but J << threshold:
        # containment is the first stage to flag it
        assert out["containment"]["n_new"] == 1
        assert sum(r["n_new"] for r in out.values()) == 2  # docs 1 and 2

    def test_ivf_cell_balance_counts_and_imbalance(self, spark):
        """Crafted 2-cell geometry: centroids are the two lowest-id
        vectors (orthogonal); remaining vectors split 3/1 -> shares,
        cumulative order, and imbalance = max/mean are exact."""
        from haystack_traces_spark.datapipe import queries as Q
        from haystack_traces_spark.datapipe import similarity  # noqa: F401

        def vec(x, y):
            return [x, y] + [0.0] * 62

        rows = [
            (0, vec(1.0, 0.0), 0),   # centroid cell 0
            (1, vec(0.0, 1.0), 0),   # centroid cell 1
            (2, vec(0.9, 0.1), 0),
            (3, vec(0.8, 0.2), 0),
            (4, vec(0.1, 0.9), 0),
        ]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        orig_cells, orig_emb = Q.IVF_CELLS, Q._emb
        Q.IVF_CELLS, Q._emb = 2, (lambda _s, _d: emb)
        try:
            got = [(r["cell"], r["n_vecs"], r["imbalance"])
                   for r in Q.q_ivf_cell_balance(spark, "crafted").collect()]
        finally:
            Q.IVF_CELLS, Q._emb = orig_cells, orig_emb
        # cell 0 holds vecs 0,2,3; cell 1 holds 1,4 -> max 3, mean 2.5
        assert got == [(0, 3, 1.2), (1, 2, 1.2)]

    def test_service_cost_pareto_exact_shares(self, spark):
        rows = [
            mk(trace_id="t1", span_id="a", service="big", duration=700),
            mk(trace_id="t1", span_id="b", service="small", duration=200),
            mk(trace_id="t2", span_id="c", service="tiny", duration=100),
        ]
        # drive through the core by monkeypatching the span reader
        import haystack_traces_spark.entry_queries as EQm
        orig = EQm._spans
        EQm._spans = lambda _s, _d: _with_spans(spark, rows)
        try:
            out = [tuple(r) for r in
                   EQm.q_service_cost_pareto(spark, "crafted").collect()]
        finally:
            EQm._spans = orig
        assert out == [
            ("big", 1, 700, 0.7, 0.7),
            ("small", 1, 200, 0.2, 0.9),
            ("tiny", 1, 100, 0.1, 1.0),
        ]

    def test_packing_waste_curve_matches_python_mirror(self, spark):
        """Crafted docs with known token counts: the curve equals a pure-
        Python recomputation of concat-and-chunk packing driven by the
        bit-exact hash60 mirror (same groups, same doc order)."""
        import math

        from haystack_traces_spark.datapipe import queries as Q
        from haystack_traces_spark.datapipe.hashing import hash60_py

        token_counts = [5, 600, 3, 1200, 512, 1, 900, 77, 513, 511]
        rows = [
            (i, " ".join(["w"] * n), "en", "s", 0)
            for i, n in enumerate(token_counts)
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, "
            "n_chars long"
        )
        orig = Q._docs
        Q._docs = lambda _s, _d: docs
        try:
            got = {r["context_len"]: tuple(r)[1:] for r in
                   Q.q_packing_waste_curve(spark, "crafted").collect()}
        finally:
            Q._docs = orig

        # pure-Python mirror
        groups: dict[int, list[int]] = {}
        for i, n in enumerate(token_counts):
            groups.setdefault(
                hash60_py(str(i), seed="pack:") % Q.PACK_GROUPS, []
            ).append(n)
        for L in Q.PACK_CONTEXTS:
            chunks = pad = split = 0
            for toks in groups.values():  # doc_id order preserved
                tg = sum(toks)
                chunks += math.ceil(tg / L)
                pad += math.ceil(tg / L) * L - tg
                cum = 0
                for n in toks:
                    if cum // L != (cum + n - 1) // L:
                        split += 1
                    cum += n
            from haystack_traces_spark.functions.stats import round6_half_up

            # HALF_UP, not builtin round (house rule 15: Python mirrors
            # of engine ROUND must not use banker's rounding)
            want = (
                chunks, pad, round6_half_up(pad / (chunks * L)),
                split, round6_half_up(split / len(token_counts)),
            )
            assert got[L] == want, (L, got[L], want)

    def test_sampling_fidelity_detects_tail_skew(self, spark):
        """Crafted population where the sampler drops exactly the fast
        traces of one service: kept percentiles skew high and the
        relative error is exact. Policy constants shared with the
        operator (error keeps, slow keeps, hash decides the rest)."""
        import haystack_traces_spark.entry_queries as EQm
        from haystack_traces_spark.datapipe.hashing import hash60_py

        # trace durations: 10 fast (100us) + 2 slow (keep: > slow
        # threshold) for service svc; hash decides the fast ones
        slow_us = EQm.SAMPLING_SLOW_US
        rows = []
        for i in range(10):
            rows.append(mk(trace_id=f"f{i}", span_id=f"f{i}",
                           service="svc", duration=100))
        for i in range(2):
            rows.append(mk(trace_id=f"s{i}", span_id=f"s{i}",
                           service="svc", duration=slow_us + 1_000))
        kept_fast = [
            f"f{i}" for i in range(10)
            if hash60_py(f"f{i}", seed="tail:") % 100
            < EQm.SAMPLING_RATE_PCT
        ]
        orig = EQm._spans
        EQm._spans = lambda _s, _d: _with_spans(spark, rows)
        try:
            [r] = EQm.q_sampling_fidelity(spark, "crafted").collect()
        finally:
            EQm._spans = orig
        assert r["n_full"] == 12
        assert r["n_kept"] == 2 + len(kept_fast)
        # full p95 is dominated by the slow pair only at the very tail;
        # kept set over-represents slow traces -> kept p50 must be >=
        # full p50 whenever most fast traces were dropped
        if len(kept_fast) <= 4:
            assert r["p50_kept"] >= r["p50_full"]
        assert r["p95_rel_err"] is not None and r["p95_rel_err"] >= 0.0


# ---------------------------- round-8 operators -----------------------------

def test_duration_heaping_pins_round_number_shares(spark):
    """Crafted durations with known mod-1000/mod-10000 structure: the
    shares and heap factor are exact rationals, and duration 0 counts as
    heaped (a zero-duration span IS a quantization artifact)."""
    rows = [
        mk(span_id="a1", service="svc_a", duration=1000),
        mk(span_id="a2", service="svc_a", duration=1500),
        mk(span_id="a3", service="svc_a", duration=20000),
        mk(span_id="a4", service="svc_a", duration=333),
        mk(span_id="b1", service="svc_b", duration=0),
    ]
    out = EQ.duration_heaping_from(_with_spans(spark, rows)).collect()
    got = {r["servicename"]: r.asDict() for r in out}
    a = got["svc_a"]
    assert (a["n_spans"], a["n_round_1ms"], a["n_round_10ms"]) == (4, 2, 1)
    assert a["share_1ms"] == 0.5 and a["heap_factor_1ms"] == 500.0
    b = got["svc_b"]
    assert (b["n_spans"], b["n_round_1ms"], b["n_round_10ms"]) == (1, 1, 1)
    assert b["heap_factor_1ms"] == 1000.0


def test_blast_radius_transitive_closure_and_cycle(spark):
    """Chain a→b→c plus a b→a back-edge: the closure must cross the
    cycle without looping forever, exclude self from the radius, and
    zero-fill leaf services from the catalog."""
    rows = [
        # t1: a -> b -> c
        mk(trace_id="t1", span_id="ra", service="svc_a"),
        mk(trace_id="t1", span_id="sb", parent="ra", service="svc_b"),
        mk(trace_id="t1", span_id="sc", parent="sb", service="svc_c"),
        # t2: b -> a (cycle edge)
        mk(trace_id="t2", span_id="rb", service="svc_b"),
        mk(trace_id="t2", span_id="sa", parent="rb", service="svc_a"),
        # t3: isolated leaf service
        mk(trace_id="t3", span_id="rd", service="svc_d"),
    ]
    out = EQ.blast_radius_from(_with_spans(spark, rows)).collect()
    got = {r["service"]: (r["n_downstream"], r["downstream"]) for r in out}
    assert got["svc_a"] == (2, "svc_b,svc_c")
    assert got["svc_b"] == (2, "svc_a,svc_c")
    assert got["svc_c"] == (0, "")
    assert got["svc_d"] == (0, "")


def test_tail_latency_attribution_pins_excess_shares(spark):
    """Nine fast single-span svc_a traces + one slow trace where svc_b
    owns 80% of span time: the p90 cut isolates the slow trace and the
    excess shares are exact rationals."""
    rows = []
    for i in range(9):
        rows.append(mk(trace_id=f"f{i}", span_id=f"s{i}", service="svc_a",
                       start=T0, duration=10))
    rows += [
        mk(trace_id="slow", span_id="p", service="svc_a", start=T0,
           duration=20),
        mk(trace_id="slow", span_id="c", parent="p", service="svc_b",
           start=T0 + 20, duration=80),
    ]
    out = {r["servicename"]: r.asDict()
           for r in EQ.tail_latency_attribution_from(
               _with_spans(spark, rows)).collect()}
    a, b = out["svc_a"], out["svc_b"]
    assert a["share_all"] == round(110 / 190, 6)
    assert b["share_all"] == round(80 / 190, 6)
    assert a["share_slow"] == 0.2 and b["share_slow"] == 0.8
    assert b["excess_share"] == round(0.8 - 80 / 190, 6)
    assert a["excess_share"] == round(0.2 - 110 / 190, 6)


def test_service_reach_depth_chain_diamond_and_cycle(spark):
    """Round-9 operator: downstream eccentricity = longest SHORTEST path.
    A diamond shortcut must SHORTEN the chain distance (min-plus, not
    longest-path), leaves report explicit 0 rows, and a call cycle stays
    finite (shortest distances converge; no divergence guard needed)."""
    rows = [
        # t1: chain a->b->c->d plus diamond a->e->d
        mk(trace_id="t1", span_id="s1", service="a"),
        mk(trace_id="t1", span_id="s2", parent="s1", service="b"),
        mk(trace_id="t1", span_id="s3", parent="s2", service="c"),
        mk(trace_id="t1", span_id="s4", parent="s3", service="d"),
        mk(trace_id="t1", span_id="s5", parent="s1", service="e"),
        mk(trace_id="t1", span_id="s6", parent="s5", service="d"),
        # t2: cycle f->g->f
        mk(trace_id="t2", span_id="s1", service="f"),
        mk(trace_id="t2", span_id="s2", parent="s1", service="g"),
        mk(trace_id="t2", span_id="s3", parent="s2", service="f"),
    ]
    out = {
        r["service"]: (r["max_hop"], r["n_at_max"])
        for r in EQ.service_reach_depth_from(_with_spans(spark, rows)).collect()
    }
    assert out == {
        "a": (2, 2),  # diamond: d reachable in 2, not 3; frontier {c, d}
        "b": (2, 1),
        "c": (1, 1),
        "d": (0, 0),  # leaf: zero-filled from the catalog
        "e": (1, 1),
        "f": (1, 1),  # cycle: self-distance excluded, g at 1
        "g": (1, 1),
    }


def test_error_budget_burn_multiwindow_alert_rule(spark):
    """Round-9 operator: the fast window alone must not page (slow
    window suppresses low-traffic blips), the slow window alone must not
    page (fast window gives detection latency), and a confirmed burn
    pages. Integer milli-burn pinned exactly."""
    H = EQ.HOUR_US
    rows = []

    def hour_of(tag, h_idx, n_ok, n_err):
        for i in range(n_ok):
            rows.append(mk(trace_id=f"{tag}ok{h_idx}_{i}", span_id="s",
                           service="svc", start=T0 + h_idx * H,
                           tags=[_ltag("errorcode", 0)]))
        for i in range(n_err):
            rows.append(mk(trace_id=f"{tag}er{h_idx}_{i}", span_id="s",
                           service="svc", start=T0 + h_idx * H,
                           tags=[_ltag("errorcode", 100)]))

    hour_of("a", 0, 10, 0)    # clean
    hour_of("b", 1, 8, 2)     # burn1=20000>14400, burn6=10000>6000 -> page
    hour_of("c", 2, 9, 1)     # burn1=10000<14400 -> no page (fast fails)
    # low-traffic blip after 4 heavy clean hours: fast window fires,
    # slow window suppresses
    for h in (16, 17, 18, 19):
        hour_of("d", h, 100, 0)
    hour_of("e", 20, 1, 1)    # burn1=50000; burn6=1e9 DIV 402*1e4=248

    out = {
        r["hour_start"]: r.asDict()
        for r in _patched(
            spark, rows, lambda: EQ.q_error_budget_burn(spark, "")
        ).collect()
    }
    assert out[T0]["alert"] is False and out[T0]["burn_1h_milli"] == 0
    h1 = out[T0 + H]
    assert (h1["burn_1h_milli"], h1["burn_6h_milli"]) == (20000, 10000)
    assert h1["alert"] is True
    h2 = out[T0 + 2 * H]
    assert h2["burn_1h_milli"] == 10000 and h2["alert"] is False
    blip = out[T0 + 20 * H]
    assert blip["burn_1h_milli"] == 50000  # fast window screams...
    assert blip["burn_6h_milli"] == 248    # ...slow window says blip
    assert blip["alert"] is False


def test_service_error_correlation_phase_and_gating(spark):
    """Round-9 batch B: in-phase hourly error series correlate at 1.0,
    anti-phase at -1.0, and a zero-variance (never-erroring) service is
    excluded by the NULL-correlation gate. The hour grid is zero-filled:
    service 'c' has spans only in hour 0, but its series still spans the
    full grid."""
    H = EQ.HOUR_US
    rows = []

    def spanrow(tag, svc, h_idx, err):
        rows.append(mk(trace_id=f"{tag}{svc}{h_idx}_{err}_{len(rows)}",
                       span_id="s", service=svc, start=T0 + h_idx * H,
                       tags=[_ltag("errorcode", 100 if err else 0)]))

    # a and b in phase: errors in hours 0 and 2; anti c: errors in 1 and 3
    for h, n_err in ((0, 3), (1, 0), (2, 3), (3, 0)):
        for i in range(n_err):
            spanrow("p", "a", h, True)
            spanrow("p", "b", h, True)
        spanrow("p", "a", h, False)  # keeps the service present every hour
        spanrow("p", "b", h, False)
    for h, n_err in ((0, 0), (1, 3), (2, 0), (3, 3)):
        for i in range(n_err):
            spanrow("p", "c", h, True)
        spanrow("p", "c", h, False)
    # d: zero errors everywhere -> zero variance -> excluded pairs
    spanrow("p", "d", 0, False)

    out = {
        (r["service_a"], r["service_b"]): r.asDict()
        for r in _patched(
            spark, rows, lambda: EQ.q_service_error_correlation(spark, "")
        ).collect()
    }
    assert out[("a", "b")]["corr"] == 1.0
    assert out[("a", "c")]["corr"] == -1.0
    assert out[("b", "c")]["corr"] == -1.0
    assert all(r["n_hours"] == 4 for r in out.values())
    # d pairs with anyone have zero variance on d's side -> NULL -> gone
    assert not any("d" in k for k in out)


def test_workload_drift_mix_shift_semantics(spark):
    """Round-9 batch C: identical halves -> jsd 0; fully disjoint
    operation mixes -> jsd = ln 2 with zero shared ops; a service seen
    in only one half is excluded (no distribution to compare)."""
    import math

    H = EQ.HOUR_US
    rows = []

    def op_span(svc, op, h_idx, i):
        rows.append(mk(trace_id=f"w{svc}{op}{h_idx}_{i}", span_id="s",
                       service=svc, operation=op, start=T0 + h_idx * H))

    # global range: hours 0..9; midpoint splits 0-4 / 5-9
    for h in (0, 9):
        for i in range(4):
            op_span("same", "op_x", h, i)
            op_span("same", "op_y", h, i + 10)
    for i in range(5):
        op_span("shift", "old_op", 0, i)
        op_span("shift", "new_op", 9, i)
    for i in range(3):
        op_span("early_only", "op_z", 0, i)

    out = {
        r["servicename"]: r.asDict()
        for r in _patched(
            spark, rows, lambda: EQ.q_workload_drift(spark, "")
        ).collect()
    }
    assert set(out) == {"same", "shift"}
    assert out["same"]["jsd"] == 0.0 and out["same"]["n_shared_ops"] == 2
    assert out["same"]["mass_a"] == 1.0 and out["same"]["mass_b"] == 1.0
    sh = out["shift"]
    assert sh["n_shared_ops"] == 0 and sh["mass_a"] == 0.0
    assert abs(sh["jsd"] - math.log(2.0)) < 1e-6


def test_index_ttl_plan_data_relative_horizon(spark):
    """Round-9 batch D: the TTL cost curve is measured against the
    newest trace start — crafted traces at known ages pin every rung,
    ppm is integer DIV of unrounded counts, and the curve is
    monotone non-decreasing in the TTL."""
    H = EQ.HOUR_US
    rows = []
    # ages (hours before the newest trace): 0, 48, 100, 500; span counts
    # 1, 2, 3, 4
    for i, (age_h, n_sp) in enumerate([(0, 1), (48, 2), (100, 3), (500, 4)]):
        for j in range(n_sp):
            rows.append(mk(trace_id=f"t{i}", span_id=f"s{j}",
                           service="svc", start=T0 + (600 - age_h) * H))
    out = {r["ttl_hours"]: r.asDict()
           for r in _patched(spark, rows,
                             lambda: EQ.q_index_ttl_plan(spark, "")).collect()}
    assert set(out) == {24, 72, 168, 720}
    # kept iff age < ttl (strict: t0 > now - ttl)
    assert (out[24]["n_traces"], out[24]["n_spans"]) == (1, 1)
    assert (out[72]["n_traces"], out[72]["n_spans"]) == (2, 3)
    assert (out[168]["n_traces"], out[168]["n_spans"]) == (3, 6)
    assert (out[720]["n_traces"], out[720]["n_spans"]) == (4, 10)
    assert out[72]["traces_ppm"] == 500000 and out[72]["spans_ppm"] == 300000
    assert out[168]["traces_ppm"] == 750000
    hours = sorted(out)
    assert all(out[a]["n_traces"] <= out[b]["n_traces"]
               for a, b in zip(hours, hours[1:]))


def test_critical_path_drift_shares_and_totals(spark, sf_dir):
    """Round-9 batch C: each half's shares sum to ~1 over the services
    present in it, the per-service early+late path time reconciles with
    critical_path_contrib's total on-path time, and drift is exactly the
    difference of the rounded shares."""
    rows = EQ.q_critical_path_drift(spark, sf_dir).collect()
    assert rows
    for half in ("share_early", "share_late"):
        tot = sum(r[half] for r in rows if r[half] is not None)
        assert abs(tot - 1.0) < 1e-4, (half, tot)
    contrib = {
        r["servicename"]: r["path_time"]
        for r in EQ.q_critical_path_contrib(spark, sf_dir).collect()
    }
    for r in rows:
        assert r["path_time_early"] + r["path_time_late"] == contrib[
            r["servicename"]
        ], r
        if r["share_early"] is not None and r["share_late"] is not None:
            want = round(r["share_late"] - r["share_early"], 6)
            assert abs(r["drift"] - want) < 1e-9, (r["drift"], want)


def test_latency_slo_fit_exact_rung_pick(spark):
    """Crafted operations pin the pick rule: the chosen rung is the
    TIGHTEST with 100*violations <= 5*n (exact integers, never float
    shares), NULL when even 20 s misses the budget, and the boundary
    case (exactly 5%) fits."""
    from haystack_traces_spark.entry_queries import latency_slo_fit_from

    rows = []
    # op A: 19/20 spans at 900us, 1 at 4ms -> 1/20 = 5% violate 1ms
    #       (boundary: fits 1ms exactly)
    rows += [("svc", "a", 900)] * 19 + [("svc", "a", 4_000)]
    # op B: 10/20 at 30ms -> 50% violate 25ms, 0% violate 50ms -> pick 50ms
    rows += [("svc", "b", 30_000)] * 10 + [("svc", "b", 1_000)] * 10
    # op C: 100% at 25s (> every rung) -> NULL slo
    rows += [("svc", "c", 25_000_000)] * 20
    # op D: below min-span floor -> absent
    rows += [("svc", "d", 1)] * 19
    spans = spark.createDataFrame(
        [(s, o, d) for s, o, d in rows],
        "service_name string, operation_name string, duration long",
    ).selectExpr("service_name", "operation_name", "duration")
    got = {
        r["operationname"]: r for r in latency_slo_fit_from(spans).collect()
    }
    assert set(got) == {"a", "b", "c"}
    assert got["a"]["slo_us"] == 1_000 and got["a"]["violation_share"] == 0.05
    assert got["b"]["slo_us"] == 50_000 and got["b"]["violation_share"] == 0.0
    assert got["c"]["slo_us"] is None and got["c"]["violation_share"] is None
    assert got["c"]["max_duration_us"] == 25_000_000


def test_ab_cohort_calibration_hash_split_is_null_experiment(spark, sf_dir):
    """On the real corpus the hash split must read as a NULL experiment:
    every service balanced, |z| < 5 on both readouts (the operator's
    whole point — a violation means the harness leaks); cohorts verified
    against the bit-exact python mirror of the assignment hash."""
    from haystack_traces_spark.datapipe.hashing import hash60_py
    from haystack_traces_spark.entry_queries import (
        AB_SEED,
        q_ab_cohort_calibration,
        _spans,
    )
    import pyspark.sql.functions as F

    rows = q_ab_cohort_calibration(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["balanced"] is True, r
        assert abs(r["z_mean"]) < 5 and abs(r["z_err"]) < 5, r
    # cohort counts match the python mirror of hash60(trace_id) % 2
    svc = rows[0]["servicename"]
    traces = (
        _spans(spark, sf_dir)
        .filter(F.lower("service_name") == svc)
        .select("trace_id")
        .collect()
    )
    n_a = sum(1 for t in traces if hash60_py(t[0], seed=AB_SEED) % 2 == 0)
    assert rows[0]["n_a"] == n_a
    assert rows[0]["n_b"] == len(traces) - n_a


def test_p99_confidence_exact_rank_arithmetic(spark):
    """Crafted 200-span operation with durations 1..200 pins every rank:
    p99 rank = ceil(0.99*200) = 198 -> value 198; CI offset =
    ceil(1.96*sqrt(200*0.0099)) = ceil(2.757) = 3 -> ranks 195/201->200,
    values 195/200; rel_width = 5/198; measurable since 2*5 <= 198.
    A 99-span operation sits under the min-span floor and is absent."""
    from haystack_traces_spark.entry_queries import p99_confidence_from

    rows = [("svc", "big", i + 1, str(i)) for i in range(200)]
    rows += [("svc", "tiny", 5, str(1000 + i)) for i in range(99)]
    spans = spark.createDataFrame(
        rows,
        "service_name string, operation_name string, duration long, span_id string",
    )
    got = {r["operationname"]: r for r in p99_confidence_from(spans).collect()}
    assert set(got) == {"big"}
    r = got["big"]
    assert r["n_spans"] == 200
    assert r["p99_us"] == 198
    assert (r["ci_lo_us"], r["ci_hi_us"]) == (195, 200)
    assert r["rel_width"] == round(5 / 198, 6)
    assert r["measurable"] is True


def test_p99_confidence_approx_face_close_to_exact(spark):
    """VERDICT r10 ask #3: the 100 TB face replaces the per-key rank sort
    with one mergeable percentile_approx grid sketch. On the crafted
    1..200 ramp (ranks == values) every snapped bound must land within 2
    ranks of the exact face, the CI must bracket the p99, and — the point
    of the face — the physical plan must contain NO window."""
    from haystack_traces_spark.entry_queries import p99_confidence_from

    spans = spark.createDataFrame(
        [("svc", "big", i + 1, str(i)) for i in range(200)],
        "service_name string, operation_name string, duration long, span_id string",
    )
    exact = p99_confidence_from(spans).collect()[0]
    approx_df = p99_confidence_from(spans, approx=True)
    plan = approx_df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    a = approx_df.collect()[0]
    assert a["n_spans"] == exact["n_spans"] == 200
    for col in ("p99_us", "ci_lo_us", "ci_hi_us"):
        assert abs(a[col] - exact[col]) <= 2, (col, a[col], exact[col])
    assert a["ci_lo_us"] <= a["p99_us"] <= a["ci_hi_us"]
    assert a["measurable"] == exact["measurable"]


def test_latency_hourly_percentiles_pins_bucket_walk(spark):
    """Crafted hour of durations 1..8: buckets {1:1, 2:2, 3:4, 4:1} →
    p50 = bucket-3 upper bound 7, p90/p99 = 15 (the same hand-pin the
    streaming gate test uses — one shared core, one expected answer).
    A second hour with a single 100 µs span pins per-hour independence."""
    rows = [
        mk(trace_id=f"t{i}", span_id=f"s{i}", service="Web", operation="get",
           start=T0 + i, duration=i + 1)
        for i in range(8)
    ] + [
        mk(trace_id="t9", span_id="s9", service="Web", operation="get",
           start=T0 + EQ.HOUR_US, duration=100)
    ]
    out = _patched(
        spark, rows,
        lambda: EQ.q_latency_hourly_percentiles(spark, "ignored").collect(),
    )
    h0 = T0 - T0 % EQ.HOUR_US
    got = {(r["hour_ts"], r["q"]): r["est_us"] for r in out}
    assert got == {
        (h0, 0.5): 7,
        (h0, 0.9): 15,
        (h0, 0.99): 15,
        (h0 + EQ.HOUR_US, 0.5): 127,   # bucket 7 (100 -> bit length 7)
        (h0 + EQ.HOUR_US, 0.9): 127,
        (h0 + EQ.HOUR_US, 0.99): 127,
    }
    assert all(r["servicename"] == "web" for r in out)


def test_field_entropy_pins_hand_distribution(spark):
    """Services [a, a, a, b]: H = ln4 − (3·ln3)/4, max ln2, top 0.75;
    a single operation value pins the degenerate H = 0 row."""
    import math

    rows = [
        mk(trace_id="t", span_id=f"s{i}", service=svc, operation="only_op")
        for i, svc in enumerate(["a", "a", "a", "b"])
    ]
    out = _patched(
        spark, rows, lambda: EQ.q_field_entropy(spark, "ignored").collect()
    )
    by = {r["field"]: r for r in out}
    assert set(by) == {"servicename", "operationname", "errorcode"}
    svc = by["servicename"]
    assert svc["n_values"] == 2
    assert svc["entropy"] == round(math.log(4) - (3 * math.log(3)) / 4, 6)
    assert svc["max_entropy"] == round(math.log(2), 6)
    assert svc["top_share"] == 0.75
    op = by["operationname"]
    assert (op["n_values"], op["entropy"], op["top_share"]) == (1, 0.0, 1.0)


def test_latency_hist_accuracy_bound_holds(spark, sf_dir):
    """The estimator promise true ≤ est < 2·true must hold on EVERY
    real-corpus operation (within_bound True, ratio in [1, 2)); a
    crafted ramp pins the exact numbers: durations 1..200 → exact p99 =
    rank 198 = 198, histogram bucket of 198 is 8 → est 255, ratio
    255/198."""
    for r in EQ.q_latency_hist_accuracy(spark, sf_dir).collect():
        assert r["within_bound"] is True, r
        assert 1.0 <= r["ratio"] < 2.0

    rows = [
        mk(trace_id=f"t{i}", span_id=f"{i}", service="s", operation="o",
           duration=i + 1)
        for i in range(200)
    ]
    out = _patched(
        spark, rows,
        lambda: EQ.q_latency_hist_accuracy(spark, "ignored").collect(),
    )
    assert len(out) == 1
    r = out[0]
    assert (r["exact_p99_us"], r["hist_p99_us"]) == (198, 255)
    assert r["ratio"] == round(255 / 198, 6)
    assert r["within_bound"] is True


def test_session_gap_sweep_ladder_invariants(spark, sf_dir):
    """A bigger gap can only MERGE sessions: n_sessions non-increasing in
    gap_us, in_session_us non-decreasing, events_per_session
    non-decreasing; the SESSION_GAP_US rung's session count equals the
    shipped event_sessions face's (one lag pass, same islands); floor:
    n_sessions >= n_users at every rung."""
    rows = {r["gap_us"]: r for r in EQ.q_session_gap_sweep(spark, sf_dir).collect()}
    assert set(rows) == set(EQ.SESSION_GAP_LADDER)
    ladder = sorted(rows)
    for a, b in zip(ladder, ladder[1:]):
        assert rows[a]["n_sessions"] >= rows[b]["n_sessions"]
        assert rows[a]["in_session_us"] <= rows[b]["in_session_us"]
        assert rows[a]["events_per_session"] <= rows[b]["events_per_session"]
    shipped = EQ.q_event_sessions(spark, sf_dir).count()
    assert rows[EQ.SESSION_GAP_US]["n_sessions"] == shipped


def test_arrival_burstiness_poisson_vs_bursty(spark, sf_dir):
    """On the real corpus every service emits a row with exact-moment
    fano/burstiness; sanity: fano > 0, burstiness in (-1, 1), and the
    identity burstiness = (sqrt(fano*mu) - mu) / (sqrt(fano*mu) + mu)
    recomputes from the row's own mean (shared integer moments)."""
    import math

    from haystack_traces_spark.entry_queries import q_arrival_burstiness

    rows = q_arrival_burstiness(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["fano"] > 0 and -1 < r["burstiness"] < 1
        sig = math.sqrt(r["fano"] * r["mean_hourly"])
        want = (sig - r["mean_hourly"]) / (sig + r["mean_hourly"])
        assert abs(r["burstiness"] - want) < 1e-4, r


def test_ab_cohort_constant_durations_yield_null_z_not_nan(spark):
    """Review r10: near-constant cohorts make ss/n - m*m fractionally
    NEGATIVE in float64 — unclamped, Spark emitted NaN z_mean and the
    DuckDB oracle ABORTED on sqrt(negative). Both faces now GREATEST-
    clamp; exactly-constant cohorts pin the limiting case: variance 0 →
    z_mean NULL (never NaN), z_err NULL when no errors differ."""
    import math

    from haystack_traces_spark.entry_queries import ab_cohort_calibration_from

    spans = spark.createDataFrame(
        [("svc", str(t), 17_922_960, 0) for t in range(100)],
        "service_name string, trace_id string, duration long, _k long",
    ).selectExpr(
        "service_name", "trace_id", "duration",
        "CAST(array(struct('errorcode' AS key, 'LONG' AS vtype, "
        "CAST(NULL AS STRING) AS vstr, _k AS vlong, CAST(NULL AS DOUBLE) AS vdouble, "
        "CAST(NULL AS BOOLEAN) AS vbool, CAST(NULL AS BINARY) AS vbytes)) "
        "AS array<struct<key:string,vtype:string,vstr:string,vlong:bigint,"
        "vdouble:double,vbool:boolean,vbytes:binary>>) AS tags",
    )
    rows = ab_cohort_calibration_from(spans).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["z_mean"] is None  # clamped 0 variance -> NULLIF -> NULL
    assert r["z_err"] is None  # both error rates 0 -> pooled p = 0
    assert r["mean_a_us"] == r["mean_b_us"] == 17_922_960
    for v in (r["err_rate_a"], r["err_rate_b"]):
        assert v == 0.0 and not math.isnan(v)


# ------------------------------------------------------- round 12b ops --


def test_scorecard_rollup_grains_are_consistent(spark, sf_dir):
    """The three ROLLUP grains must be internally consistent: leaf rows
    sum to their service subtotal, subtotals sum to the grand total, and
    the grain bitmask carries exactly the standard values (0 leaf,
    1 per-service, 3 total)."""
    rows = EQ.q_service_scorecard_rollup(spark, sf_dir).collect()
    by_grain: dict[int, list] = {}
    for r in rows:
        by_grain.setdefault(r["grain"], []).append(r)
    assert sorted(by_grain) == [0, 1, 3]
    assert len(by_grain[3]) == 1
    total = by_grain[3][0]
    assert total["servicename"] == total["operationname"] == "(all)"
    assert total["n_spans"] == sum(r["n_spans"] for r in by_grain[0])
    assert total["n_spans"] == sum(r["n_spans"] for r in by_grain[1])
    leaf_by_svc: dict[str, int] = {}
    for r in by_grain[0]:
        assert r["operationname"] != "(all)"
        leaf_by_svc[r["servicename"]] = (
            leaf_by_svc.get(r["servicename"], 0) + r["n_spans"]
        )
    for r in by_grain[1]:
        assert r["operationname"] == "(all)"
        assert r["n_spans"] == leaf_by_svc[r["servicename"]]


def test_duration_quickselect_matches_sorted_rank(spark, sf_dir):
    """The histogram-refinement selection must return EXACTLY the k-th
    smallest duration for k = ceil(p*n) — checked against a literal
    sort of the collected column (sf0.001 is small enough to sort
    driver-side; the operator never does)."""
    durs = sorted(
        r["duration"] for r in EQ._spans(spark, sf_dir).select("duration").collect()
    )
    n = len(durs)
    got = {r["p"]: r for r in EQ.q_duration_quickselect(spark, sf_dir).collect()}
    assert len(got) == len(EQ.QUICKSELECT_PS)
    for num, den in EQ.QUICKSELECT_PS:
        k = (num * n + den - 1) // den
        r = got[num / den]
        assert r["k"] == k
        assert r["value"] == durs[k - 1], (num, den)


def _morton_ref(t: int, s: int, bits: int = 8) -> int:
    out = 0
    for i in range(bits):
        out |= ((t >> i) & 1) << (2 * i)
        out |= ((s >> i) & 1) << (2 * i + 1)
    return out


def test_morton_terms_match_bit_interleave(spark):
    """The arithmetic Morton expression (engine-portable DIV/% form)
    equals the reference bit-interleave on a full sweep of 8-bit corner
    and random keys."""
    import random

    rng = random.Random(12)
    pairs = [(t, s) for t in (0, 1, 127, 128, 255) for s in (0, 1, 127, 128, 255)]
    pairs += [(rng.randrange(256), rng.randrange(256)) for _ in range(200)]
    df = spark.createDataFrame(pairs, "tkey long, skey long").withColumn(
        "morton", F.expr(EQ._morton_terms("DIV"))
    )
    for r in df.collect():
        assert r["morton"] == _morton_ref(r["tkey"], r["skey"]), r


def test_zorder_layout_plan_receipt_shape(spark, sf_dir):
    """Zone-map simulation invariants: all six (layout, qclass) rows
    present, file counts bounded by ZORDER_FILES, fractions in [0, 1],
    and the headline receipt — z-order prunes the mixed
    service+time class at least as well as EITHER single-sort layout
    on this corpus, while no layout reads more than everything."""
    rows = {(r["layout"], r["qclass"]): r for r in
            EQ.q_zorder_layout_plan(spark, sf_dir).collect()}
    assert len(rows) == 6
    for r in rows.values():
        assert 1 <= r["n_files"] <= EQ.ZORDER_FILES
        assert 0.0 <= r["rows_frac"] <= 1.0
        assert r["files_read_avg"] <= r["n_files"]
    z = rows[("zorder", "svc_time")]["rows_frac"]
    assert z <= rows[("time", "svc_time")]["rows_frac"] + 1e-9
    assert z <= rows[("service", "svc_time")]["rows_frac"] + 1e-9


def test_kmv_overlap_estimates_partial_intersection(spark):
    """Crafted partial overlap the synthetic corpus cannot produce (its
    every trace touches every service): A has traces 0..2999, B has
    2000..4999 → exact overlap 1000. With 3000 > KMV_K distinct ids per
    side the sketch path (theta < 2^60) must engage, and the theta
    estimate must land within 25% of truth at k=256."""
    rows = [("a", f"t{i}") for i in range(3000)]
    rows += [("b", f"t{i}") for i in range(2000, 5000)]
    spans = spark.createDataFrame(
        rows, "service_name string, trace_id string"
    )
    out = EQ.kmv_overlap_from(spans).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["s1"], r["s2"]) == ("a", "b")
    assert r["n_exact"] == 1000
    assert r["n_est"] != r["n_exact"]  # the sketch actually estimated
    assert abs(r["rel_err"]) < 0.25, r


def test_kmv_overlap_exact_when_sets_fit_in_sketch(spark):
    """Below KMV_K distinct traces per service, theta stays 2^60 and the
    estimator must DEGENERATE TO EXACT (matches == intersection)."""
    rows = [("a", f"t{i}") for i in range(100)]
    rows += [("b", f"t{i}") for i in range(60, 160)]
    spans = spark.createDataFrame(
        rows, "service_name string, trace_id string"
    )
    r = EQ.kmv_overlap_from(spans).collect()[0]
    assert r["n_exact"] == 40
    assert r["n_est"] == 40.0
    assert r["rel_err"] == 0.0


def test_native_session_windows_boundary_merges_exact_gap(spark):
    """Spark MERGES a session window whose start equals the previous
    window's end: an event EXACTLY gap after the previous stays in the
    session; one microsecond more opens a new one. Pins the > islands
    rule the oracle mirrors (same rule as q_event_sessions)."""
    gap = 1000
    ev = spark.createDataFrame(
        [("u1", 0), ("u1", 1001), ("u2", 0), ("u2", 1000)],
        "user_id string, tus long",
    )
    rows = EQ.native_sessions_from(ev, gap_us=gap).collect()
    u1 = [r for r in rows if r["user_id"] == "u1"]
    u2 = [r for r in rows if r["user_id"] == "u2"]
    assert len(u1) == 2 and all(r["n_events"] == 1 for r in u1)
    assert len(u2) == 1
    assert u2[0]["n_events"] == 2 and u2[0]["session_dur"] == 1000


def test_duration_quickselect_property_random_frames(spark):
    """Hypothesis fuzz of the histogram-refinement selection: on random
    duration multisets (duplicates, all-equal runs, huge spreads, NULLs
    mixed in) every target must come back as EXACTLY the k-th smallest
    non-null value for k = ceil(p * count(non-null)) — the NULL-guard
    regression (review fix: COUNT(duration), not COUNT(*)) is fuzzed,
    not just reasoned about."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=15, deadline=None)
    @given(
        vals=st.lists(
            st.one_of(
                st.none(),
                st.integers(0, 50),
                st.integers(0, 10**12),
            ),
            min_size=1,
            max_size=120,
        )
    )
    def check(vals):
        nn = sorted(v for v in vals if v is not None)
        df = spark.createDataFrame(
            [(v,) for v in vals], "duration long"
        )
        got = EQ.duration_quickselect_from(df).collect()
        if not nn:
            assert got == []
            return
        n = len(nn)
        assert len(got) == len(EQ.QUICKSELECT_PS)
        by_p = {r["p"]: r for r in got}
        for num, den in EQ.QUICKSELECT_PS:
            k = (num * n + den - 1) // den
            r = by_p[num / den]
            assert r["k"] == k and r["value"] == nn[k - 1], (vals, r)

    check()
