"""Span merging — J3 partial-span merge and J4 client/server merge cores.

Python analog of reader/.../readers/utils/SpanMerger.scala:34-157 (semantics
preserved, dict-based implementation).
"""

from __future__ import annotations

from haystack_traces_spark.transform import tags as aux
from haystack_traces_spark.transform.model import (
    CLIENT_RECV_EVENT,
    CLIENT_SEND_EVENT,
    SERVER_RECV_EVENT,
    SERVER_SEND_EVENT,
    Span,
    add_client_log,
    add_server_log,
    bool_tag,
    contains_client_log,
    contains_server_log,
    contains_tag,
    copy_span,
    end_time,
    get_event_timestamp,
    logs_of,
    long_tag,
    span_kind,
    string_tag,
    tag_string_value,
    tags_of,
)


def merge_parent_child_spans(parent: Span, child: Span) -> Span:
    """J4 core (SpanMerger.scala:28-33): parent is the client side, child the
    server side; synthesize missing cs/cr/sr/ss markers first."""
    client = parent if contains_client_log(parent) else add_client_log(parent)
    server = child if contains_server_log(child) else add_server_log(child)
    return _merge(client, server)


def merge_spans(spans: list[Span]) -> Span:
    """J3 core (SpanMerger.scala:34-51): ideal case one client + one server
    partial; degenerate cases collapse."""
    server = _collapse([s for s in spans if contains_server_log(s)])
    client = _collapse([s for s in spans if contains_client_log(s)])
    if client is not None and server is not None:
        return _merge(client, server)
    if server is not None:
        return server
    if client is not None:
        return client
    return _collapse(spans)


def _merge(client: Span, server: Span) -> Span:
    """SpanMerger.scala:53-64: result inherits the server span, parentSpanId
    from the client; tags = server's + client's + auxiliary; logs = client's
    + server's (server's sorted by timestamp)."""
    out = copy_span(server)
    out["parent_span_id"] = client["parent_span_id"]
    out["tags"] = (
        list(tags_of(server))
        + list(tags_of(client))
        + _aux_common(client, server)
        + _aux_client(client)
        + _aux_server(server)
    )
    out["logs"] = list(logs_of(client)) + sorted(
        logs_of(server), key=lambda l: l["timestamp"]
    )
    return out


def _collapse(spans: list[Span]) -> Span | None:
    """SpanMerger.scala:68-92: 0 → None, 1 → it, many → single span from
    [min start, max end] with ' & '-joined op names and an error marker."""
    if not spans:
        return None
    if len(spans) == 1:
        return spans[0]
    first = min(spans, key=lambda s: s["start_time"])
    last = max(spans, key=end_time)
    out = copy_span(first)
    out["operation_name"] = " & ".join(s["operation_name"] for s in spans)
    out["duration"] = end_time(last) - int(first["start_time"])
    out["tags"] = [t for s in spans for t in tags_of(s)] + [
        bool_tag(aux.ERR_IS_MULTI_PARTIAL_SPAN, True)
    ]
    out["logs"] = [l for s in spans for l in logs_of(s)]
    return out


def _network_delta(client: Span, server: Span) -> int:
    """clientDur - serverDur when positive, else -1 (SpanMerger.scala:96-106)."""
    client_dur = get_event_timestamp(client, CLIENT_RECV_EVENT) - get_event_timestamp(
        client, CLIENT_SEND_EVENT
    )
    server_dur = get_event_timestamp(server, SERVER_SEND_EVENT) - get_event_timestamp(
        server, SERVER_RECV_EVENT
    )
    return client_dur - server_dur if server_dur < client_dur else -1


def _aux_common(client: Span, server: Span) -> list:
    return [
        bool_tag(aux.IS_MERGED_SPAN, True),
        long_tag(aux.NETWORK_DELTA, _network_delta(client, server)),
    ]


def _aux_client(s: Span) -> list:
    return [
        string_tag(aux.CLIENT_SERVICE_NAME, s["service_name"]),
        string_tag(aux.CLIENT_OP_NAME, s["operation_name"]),
        string_tag(aux.CLIENT_SPAN_ID, s["span_id"]),
        string_tag(
            "X-HAYSTACK-CLIENT-INFRASTRUCTURE-PROVIDER",
            tag_string_value(s, aux.INFRASTRUCTURE_PROVIDER),
        ),
        string_tag(
            "X-HAYSTACK-CLIENT-INFRASTRUCTURE-LOCATION",
            tag_string_value(s, aux.INFRASTRUCTURE_LOCATION),
        ),
        long_tag(aux.CLIENT_START_TIME, s["start_time"]),
        long_tag(aux.CLIENT_DURATION, s["duration"]),
    ]


def _aux_server(s: Span) -> list:
    return [
        string_tag(aux.SERVER_SERVICE_NAME, s["service_name"]),
        string_tag(aux.SERVER_OP_NAME, s["operation_name"]),
        string_tag(
            "X-HAYSTACK-SERVER-INFRASTRUCTURE-PROVIDER",
            tag_string_value(s, aux.INFRASTRUCTURE_PROVIDER),
        ),
        string_tag(
            "X-HAYSTACK-SERVER-INFRASTRUCTURE-LOCATION",
            tag_string_value(s, aux.INFRASTRUCTURE_LOCATION),
        ),
        long_tag(aux.SERVER_START_TIME, s["start_time"]),
        long_tag(aux.SERVER_DURATION, s["duration"]),
    ]


def is_already_merged(span: Span) -> bool:
    return contains_tag(span, aux.IS_MERGED_SPAN)


def _is_producer_consumer(kind: str) -> bool:
    return kind.lower() in ("producer", "consumer")


def should_merge_span_kinds(a: Span, b: Span) -> bool:
    """No same-kind merges, no producer/consumer merges (SpanMerger.scala:136-157)."""
    ka, kb = span_kind(a), span_kind(b)
    if (ka != "" and kb != "" and ka == kb) or _is_producer_consumer(ka) or _is_producer_consumer(kb):
        return False
    return True
