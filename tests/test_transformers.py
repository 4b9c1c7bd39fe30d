"""Golden unit tests for U1-U11 / V1-V3 — ports of the reference transformer
specs (reader/src/test/scala/.../unit/readers/transformers/*)."""

from __future__ import annotations

import pytest

from haystack_traces_spark.transform import merger
from haystack_traces_spark.transform import transformers as T
from haystack_traces_spark.transform import validators as V
from haystack_traces_spark.transform.model import (
    bool_tag,
    get_event_timestamp,
    log,
    string_tag,
    tag_long_value,
    tag_string_value,
)
from haystack_traces_spark.transform.spantree import Forest
from tests.fixtures import (
    T0,
    client_logs,
    partial_client_server,
    server_logs,
    span,
)


# ----------------------------------------------------------------- U1 -----
def test_dedup_removes_identical_spans():
    s = span()
    out = T.dedup_spans([s, dict(s), span(span_id="s2")])
    assert [x["span_id"] for x in out] == ["s1", "s2"]


def test_dedup_keeps_differing_spans():
    a = span()
    b = span(duration=2000)
    assert len(T.dedup_spans([a, b])) == 2


# ----------------------------------------------------------------- U2 -----
def test_client_server_event_log_synthesizes_markers():
    client = span(span_id="c", tags=[string_tag("span.kind", "client")])
    server = span(span_id="s", tags=[string_tag("span.kind", "server")], start=T0, duration=500)
    out = T.client_server_event_log([client, server])
    assert get_event_timestamp(out[0], "cs") == T0
    assert get_event_timestamp(out[0], "cr") == T0 + 1000
    assert get_event_timestamp(out[1], "sr") == T0
    assert get_event_timestamp(out[1], "ss") == T0 + 500


def test_client_server_event_log_noop_when_present():
    s = span(tags=[string_tag("span.kind", "client")], logs=client_logs(T0, T0 + 1))
    out = T.client_server_event_log([s])
    assert len(out[0]["logs"]) == 2  # unchanged


# ----------------------------------------------------------------- U3 -----
def test_infrastructure_tag_propagation():
    tagged = span(span_id="a", service="svc", tags=[string_tag("X-HAYSTACK-AWS-REGION", "us-west-2")])
    untagged = span(span_id="b", service="svc")
    other = span(span_id="c", service="other")
    out = T.infrastructure_tags([tagged, untagged, other])
    assert tag_string_value(out[1], "X-HAYSTACK-AWS-REGION") == "us-west-2"
    assert tag_string_value(out[2], "X-HAYSTACK-AWS-REGION") == ""


# ------------------------------------------------------------- U4 / J3 ----
def test_partial_span_merge_client_server():
    spans = partial_client_server()
    f = T.partial_span_merge(Forest(spans))
    merged = [s for s in f.spans if s["span_id"] == "x"]
    assert len(merged) == 1
    m = merged[0]
    # inherits server identity, client's parent id
    assert m["service_name"] == "svc_b"
    assert m["operation_name"] == "op_server"
    assert m["parent_span_id"] == "root"
    assert tag_string_value(m, "X-HAYSTACK-CLIENT-SERVICE-NAME") == "svc_a"
    assert tag_string_value(m, "X-HAYSTACK-SERVER-SERVICE-NAME") == "svc_b"
    # network delta = clientDur(1000) - serverDur(800)
    assert tag_long_value(m, "X-HAYSTACK-NETWORK-DELTA") == 200
    # client + server tags carried over
    assert tag_string_value(m, "ctag") == "cv"
    assert tag_string_value(m, "stag") == "sv"


def test_partial_span_merge_multi_collapse():
    a = span(span_id="x", operation="op1", start=T0, duration=100)
    b = span(span_id="x", operation="op2", start=T0 + 50, duration=200)
    c = span(span_id="x", operation="op3", start=T0 + 10, duration=20)
    f = T.partial_span_merge(Forest([a, b, c]))
    assert len(f.spans) == 1
    m = f.spans[0]
    assert m["operation_name"] == "op1 & op2 & op3"
    assert m["start_time"] == T0
    assert m["duration"] == (T0 + 50 + 200) - T0
    assert tag_long_value(m, "X-HAYSTACK-NETWORK-DELTA") == -1  # no c/s markers
    assert any(t["key"] == "X-HAYSTACK-ERR-IS-MULTI-PARTIAL-SPAN" for t in m["tags"])


def test_partial_merge_server_only_fallback():
    s = span(span_id="x", logs=server_logs(T0, T0 + 10))
    other = span(span_id="x", operation="nolog")
    m = merger.merge_spans([s, other])
    assert m["operation_name"] == s["operation_name"]  # server fallback wins


# ------------------------------------------------------------- U5 / J4 ----
def test_server_client_merge_single_child_cross_service():
    parent = span(span_id="p", parent="", service="svc_a", tags=[string_tag("span.kind", "client")])
    child = span(span_id="c", parent="p", service="svc_b", start=T0 + 10, duration=500,
                 tags=[string_tag("span.kind", "server")])
    grandchild = span(span_id="g", parent="c", service="svc_b", start=T0 + 20)
    f = T.server_client_span_merge(Forest([parent, child, grandchild]))
    assert len(f.spans) == 2
    m = next(s for s in f.spans if tag_string_value(s, "X-HAYSTACK-SERVER-SERVICE-NAME"))
    assert m["service_name"] == "svc_b"  # merged inherits server (child)
    assert m["parent_span_id"] == ""  # client's parent
    # grandchild re-parented under merged node in the tree walk
    trees = Forest(f.spans).trees()
    assert len(trees) == 1


def test_server_client_merge_skips_same_kind():
    parent = span(span_id="p", parent="", service="svc_a", tags=[string_tag("span.kind", "client")])
    child = span(span_id="c", parent="p", service="svc_b", tags=[string_tag("span.kind", "client")])
    f = T.server_client_span_merge(Forest([parent, child]))
    assert len(f.spans) == 2
    assert not any(tag_string_value(s, "X-HAYSTACK-SERVER-SERVICE-NAME") for s in f.spans)


def test_server_client_merge_skips_producer_consumer():
    parent = span(span_id="p", parent="", service="svc_a", tags=[string_tag("span.kind", "producer")])
    child = span(span_id="c", parent="p", service="svc_b", tags=[string_tag("span.kind", "consumer")])
    f = T.server_client_span_merge(Forest([parent, child]))
    assert len(f.spans) == 2


def test_server_client_merge_skips_multi_child():
    parent = span(span_id="p", parent="", service="svc_a")
    c1 = span(span_id="c1", parent="p", service="svc_b")
    c2 = span(span_id="c2", parent="p", service="svc_b")
    f = T.server_client_span_merge(Forest([parent, c1, c2]))
    assert len(f.spans) == 3


# ----------------------------------------------------------------- U6 -----
def test_clock_skew_adjustment():
    """Server [sr,ss] outside client [cs,cr] → skew applied to server service.

    cs=T0, cr=T0+1000 (clientDur=1000); sr=T0+2000, ss=T0+2600 (serverDur=600)
    latency=(1000-600)/2=200; delta=sr-latency-cs=2000-200=1800.
    """
    merged = span(
        span_id="m", parent="", service="svc_b", start=T0 + 2000, duration=600,
        logs=client_logs(T0, T0 + 1000) + server_logs(T0 + 2000, T0 + 2600),
    )
    child = span(span_id="ch", parent="m", service="svc_b", start=T0 + 2100)
    other = span(span_id="other", parent="m", service="svc_c", start=T0 + 2100)
    f = T.clock_skew(Forest([merged, child, other]))
    by_id = {s["span_id"]: s for s in f.spans}
    assert by_id["m"]["start_time"] == T0 + 2000 - 1800
    assert by_id["ch"]["start_time"] == T0 + 2100 - 1800  # same service: shifted
    assert by_id["other"]["start_time"] == T0 + 2100  # different service: untouched


def test_clock_skew_skips_ordered_logs():
    merged = span(
        span_id="m", parent="", service="svc_b", start=T0 + 100, duration=800,
        logs=client_logs(T0, T0 + 1000) + server_logs(T0 + 100, T0 + 900),
    )
    f = T.clock_skew(Forest([merged]))
    assert f.spans[0]["start_time"] == T0 + 100  # cs<sr && cr>ss → no skew


def test_clock_skew_skips_server_longer():
    merged = span(
        span_id="m", parent="", service="svc_b", start=T0, duration=2000,
        logs=client_logs(T0, T0 + 1000) + server_logs(T0 + 2000, T0 + 4000),
    )
    f = T.clock_skew(Forest([merged]))
    assert f.spans[0]["start_time"] == T0  # serverDur > clientDur → skip


# ----------------------------------------------------------------- U7 -----
def test_clock_skew_from_parent_clamps():
    parent = span(span_id="p", parent="", start=T0, duration=1000)
    early_child = span(span_id="c1", parent="p", start=T0 - 500, duration=300)
    late_child = span(span_id="c2", parent="p", start=T0 + 900, duration=500)
    f = T.clock_skew_from_parent(Forest([parent, early_child, late_child]))
    by_id = {s["span_id"]: s for s in f.spans}
    assert by_id["c1"]["start_time"] == T0  # shifted forward to parent start
    assert by_id["c2"]["start_time"] == T0 + 500  # end clamped to parent end


# ----------------------------------------------------------------- U8 -----
def test_invalid_root_multi_root_autogen():
    r1 = span(span_id="r1", parent="", start=T0, duration=100)
    r2 = span(span_id="r2", parent="", start=T0 + 50, duration=200)
    f = T.invalid_root(Forest([r1, r2]), span_id_factory=lambda: "fixed-id")
    roots = [s for s in f.spans if not s["parent_span_id"]]
    assert len(roots) == 1
    root = roots[0]
    assert root["span_id"] == "fixed-id"
    assert root["operation_name"] == "auto-generated"
    assert root["start_time"] == T0
    assert root["duration"] == (T0 + 50 + 200) - T0
    assert tag_long_value(root, "X-HAYSTACK-SPAN-ROOT-COUNT") == 2
    assert get_event_timestamp(root, "cs") is not None  # client log tag added
    # original roots re-parented
    others = [s for s in f.spans if s["span_id"] in ("r1", "r2")]
    assert all(s["parent_span_id"] == "fixed-id" for s in others)


def test_invalid_root_single_tree_promotes():
    a = span(span_id="a", parent="missing")
    b = span(span_id="b", parent="a")
    f = T.invalid_root(Forest([a, b]))
    assert [s for s in f.spans if not s["parent_span_id"]][0]["span_id"] == "a"


def test_invalid_root_loopback_promoted():
    loop = span(span_id="a", parent="a")
    other = span(span_id="b", parent="missing", start=T0 - 100)
    f = T.invalid_root(Forest([loop, other]))
    roots = [s for s in f.spans if not s["parent_span_id"]]
    assert [s["span_id"] for s in roots] == ["a"]


# ----------------------------------------------------------------- U9 -----
def test_invalid_parent_reparents_danglers():
    root = span(span_id="root", parent="")
    dangler = span(span_id="d", parent="nowhere")
    f = T.invalid_parent(Forest([root, dangler]))
    by_id = {s["span_id"]: s for s in f.spans}
    assert by_id["d"]["parent_span_id"] == "root"


# ---------------------------------------------------------------- U10 -----
def test_orphaned_shared_parent_autogen():
    a = span(trace_id="t9", span_id="a", parent="t9", start=T0, duration=10)
    b = span(trace_id="t9", span_id="b", parent="t9", start=T0 + 5, duration=10)
    f = T.orphaned_trace(Forest([a, b]))
    roots = [s for s in f.spans if not s["parent_span_id"]]
    assert len(roots) == 1 and roots[0]["span_id"] == "t9"
    assert roots[0]["operation_name"] == "auto-generated"


def test_orphaned_mixed_parents_drops_trace():
    a = span(trace_id="t9", span_id="a", parent="p1")
    b = span(trace_id="t9", span_id="b", parent="p2")
    f = T.orphaned_trace(Forest([a, b]))
    assert f.spans == []


# ---------------------------------------------------------------- U11 -----
def test_sort_root_first_then_start_time():
    root = span(span_id="root", parent="", start=T0 + 999)
    c1 = span(span_id="c1", parent="root", start=T0 + 300)
    c2 = span(span_id="c2", parent="root", start=T0 + 100)
    f = T.sort_spans(Forest([root, c1, c2]))
    assert [s["span_id"] for s in f.spans] == ["root", "c2", "c1"]


# ------------------------------------------------------------ V1-V3 -------
def test_validators():
    good = [span(span_id="r", parent=""), span(span_id="c", parent="r")]
    V.validate_trace_id("t1", good)
    V.validate_parent_ids(good)
    V.validate_single_root(good)

    with pytest.raises(T.InvalidTraceError):
        V.validate_trace_id("", good)
    with pytest.raises(T.InvalidTraceError):
        V.validate_trace_id("zz", good)
    with pytest.raises(T.InvalidTraceError):
        V.validate_parent_ids([span(span_id="a", parent="ghost")])
    with pytest.raises(T.InvalidTraceError):
        V.validate_parent_ids([span(span_id="a", parent="a")])
    with pytest.raises(T.InvalidTraceError):
        V.validate_single_root([span(span_id="a", parent=""), span(span_id="b", parent="")])
