"""Span-as-dict model for the per-trace pipeline.

Inside the `applyInPandas` UDFs a span is a plain dict mirroring
schemas.SPAN. This module is the Python analog of the reference's SpanUtils /
TagBuilders / TagExtractors (commons/.../utils/SpanUtils.scala:27-140,
reader/.../readers/utils/TagBuilders.scala, TagExtractors.scala) —
re-implemented for dicts, not translated.
"""

from __future__ import annotations

from typing import Any

Span = dict  # alias for readability

# SpanMarkers (commons/.../utils/SpanUtils.scala SpanMarkers object)
AUTOGEN_OPERATION_NAME = "auto-generated"
AUTOGEN_REASON_TAG = "X-HAYSTACK-AUTOGEN-REASON"
AUTOGEN_SPAN_ID_TAG = "X-HAYSTACK-AUTOGEN-SPAN-ID"
AUTOGEN_FLAG_TAG = "X-HAYSTACK-AUTOGEN"
LOG_EVENT_TAG_KEY = "event"
SERVER_SEND_EVENT = "ss"
SERVER_RECV_EVENT = "sr"
CLIENT_SEND_EVENT = "cs"
CLIENT_RECV_EVENT = "cr"
SPAN_KIND_TAG_KEY = "span.kind"
SERVER_SPAN_KIND = "server"
CLIENT_SPAN_KIND = "client"
URL_TAG_KEY = "url"


def tag(key: str, vtype: str, **vals: Any) -> dict:
    return {
        "key": key,
        "vtype": vtype,
        "vstr": vals.get("vstr"),
        "vlong": vals.get("vlong"),
        "vdouble": vals.get("vdouble"),
        "vbool": vals.get("vbool"),
        "vbytes": vals.get("vbytes"),
    }


def string_tag(key: str, value: str) -> dict:
    return tag(key, "STRING", vstr=value)


def long_tag(key: str, value: int) -> dict:
    return tag(key, "LONG", vlong=int(value))


def bool_tag(key: str, value: bool) -> dict:
    return tag(key, "BOOL", vbool=bool(value))


def log(timestamp: int, event: str) -> dict:
    return {
        "timestamp": int(timestamp),
        "fields": [{"key": LOG_EVENT_TAG_KEY, "vstr": event}],
    }


def tags_of(span: Span) -> list:
    return span.get("tags") or []


def logs_of(span: Span) -> list:
    return span.get("logs") or []


def contains_tag(span: Span, key: str) -> bool:
    return any(t["key"] == key for t in tags_of(span))


def tag_string_value(span: Span, key: str) -> str:
    for t in tags_of(span):
        if t["key"] == key:
            return t.get("vstr") or ""
    return ""


def tag_long_value(span: Span, key: str) -> int:
    for t in tags_of(span):
        if t["key"] == key:
            return int(t["vlong"]) if t.get("vlong") is not None else -1
    return -1


def get_event_timestamp(span: Span, event: str) -> int | None:
    """Timestamp of the first log carrying `event` (ci) — SpanUtils.scala:29-35."""
    ev = event.lower()
    for lg in logs_of(span):
        for f in lg.get("fields") or []:
            if (f.get("key") or "").lower() == LOG_EVENT_TAG_KEY and (
                f.get("vstr") or ""
            ).lower() == ev:
                return int(lg["timestamp"])
    return None


def contains_log_event(span: Span, event: str) -> bool:
    return get_event_timestamp(span, event) is not None


def contains_client_log(span: Span) -> bool:
    return contains_log_event(span, CLIENT_SEND_EVENT) and contains_log_event(
        span, CLIENT_RECV_EVENT
    )


def contains_server_log(span: Span) -> bool:
    return contains_log_event(span, SERVER_RECV_EVENT) and contains_log_event(
        span, SERVER_SEND_EVENT
    )


def is_merged_span(span: Span) -> bool:
    return contains_client_log(span) and contains_server_log(span)


def end_time(span: Span) -> int:
    return int(span["start_time"]) + int(span["duration"])


def span_kind(span: Span) -> str:
    """span.kind tag, else inferred from sr/ss vs cs/cr logs (SpanUtils.scala:45-55)."""
    kind = ""
    for t in tags_of(span):
        if t["key"] == SPAN_KIND_TAG_KEY:
            kind = t.get("vstr") or ""
            break
    if kind == "":
        if contains_server_log(span):
            return SERVER_SPAN_KIND
        if contains_client_log(span):
            return CLIENT_SPAN_KIND
    return kind


def copy_span(span: Span) -> Span:
    out = dict(span)
    out["tags"] = list(tags_of(span))
    out["logs"] = list(logs_of(span))
    return out


def add_client_log(span: Span) -> Span:
    """cs at start, cr at end (SpanUtils.scala:71-95)."""
    out = copy_span(span)
    out["logs"] = out["logs"] + [
        log(span["start_time"], CLIENT_SEND_EVENT),
        log(end_time(span), CLIENT_RECV_EVENT),
    ]
    return out


def add_server_log(span: Span) -> Span:
    """sr at start, ss at end."""
    out = copy_span(span)
    out["logs"] = out["logs"] + [
        log(span["start_time"], SERVER_RECV_EVENT),
        log(end_time(span), SERVER_SEND_EVENT),
    ]
    return out


def create_autogen_root(spans: list[Span], reason: str, root_span_id: str) -> Span:
    """Synthetic root spanning [min start, max end] (SpanUtils.scala:115-140)."""
    earliest = min(spans, key=lambda s: s["start_time"])
    latest = max(spans, key=end_time)
    start = int(earliest["start_time"])
    root = {
        "trace_id": earliest["trace_id"],
        "span_id": root_span_id,
        "parent_span_id": "",
        "service_name": earliest["service_name"],
        "operation_name": AUTOGEN_OPERATION_NAME,
        "start_time": start,
        "duration": end_time(latest) - start,
        "tags": [
            string_tag(AUTOGEN_REASON_TAG, reason),
            string_tag(AUTOGEN_SPAN_ID_TAG, root_span_id),
            bool_tag(AUTOGEN_FLAG_TAG, True),
        ],
        "logs": [],
    }
    for t in tags_of(earliest):
        if (t["key"] or "").lower() == URL_TAG_KEY:
            root["tags"].append(t)
            break
    return root


def span_key(span: Span) -> tuple:
    """Hashable full-value identity (proto value-equality analog) for dedup."""

    def freeze(x):
        if isinstance(x, dict):
            return tuple(sorted((k, freeze(v)) for k, v in x.items()))
        if isinstance(x, (list, tuple)):
            return tuple(freeze(v) for v in x)
        return x

    return freeze(span)
