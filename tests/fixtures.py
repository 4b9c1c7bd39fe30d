"""Deterministic trace fixtures — ports of the reference's test builders
(reader/src/test/scala/.../readers/builders/TraceBuilder.scala:9-40 and
siblings). Base time T = 150000000000 micros."""

from __future__ import annotations

from haystack_traces_spark.transform.model import (
    bool_tag,
    log,
    long_tag,
    string_tag,
)

T0 = 150_000_000_000


def span(
    trace_id="t1",
    span_id="s1",
    parent="",
    service="svc_a",
    operation="op_a",
    start=T0,
    duration=1000,
    tags=None,
    logs=None,
):
    return {
        "trace_id": trace_id,
        "span_id": span_id,
        "parent_span_id": parent,
        "service_name": service,
        "operation_name": operation,
        "start_time": start,
        "duration": duration,
        "tags": list(tags or []),
        "logs": list(logs or []),
    }


def client_logs(start, end):
    return [log(start, "cs"), log(end, "cr")]


def server_logs(start, end):
    return [log(start, "sr"), log(end, "ss")]


def valid_single_root(trace_id="t1", n_children=3):
    spans = [span(trace_id=trace_id, span_id="root", parent="", start=T0)]
    for i in range(n_children):
        spans.append(
            span(
                trace_id=trace_id,
                span_id=f"c{i}",
                parent="root",
                service=f"svc_{i}",
                operation=f"op_{i}",
                start=T0 + (i + 1) * 100,
            )
        )
    return spans


def partial_client_server(trace_id="t1"):
    """Two rows share span_id 'x': client side (svc_a) and server side (svc_b)."""
    client = span(
        trace_id=trace_id,
        span_id="x",
        parent="root",
        service="svc_a",
        operation="op_client",
        start=T0,
        duration=1000,
        logs=client_logs(T0, T0 + 1000),
        tags=[string_tag("ctag", "cv")],
    )
    server = span(
        trace_id=trace_id,
        span_id="x",
        parent="root",  # zipkin shared-span: both sides carry the client's parent
        service="svc_b",
        operation="op_server",
        start=T0 + 100,
        duration=800,
        logs=server_logs(T0 + 100, T0 + 900),
        tags=[string_tag("stag", "sv")],
    )
    root = span(trace_id=trace_id, span_id="root", parent="", start=T0 - 10)
    return [root, client, server]
