"""Trace validators V1-V3 (SURVEY.md §2.7), run between the pre- and
post-transform chains (TraceProcessor.scala:33-36)."""

from __future__ import annotations

from haystack_traces_spark.transform.model import Span
from haystack_traces_spark.transform.transformers import InvalidTraceError


def validate_trace_id(trace_id: str, spans: list[Span]) -> None:
    """V1: non-empty traceId, all spans share it (TraceIdValidator.scala:29-37)."""
    if not trace_id:
        raise InvalidTraceError("invalid traceId")
    if not all(s["trace_id"] == trace_id for s in spans):
        raise InvalidTraceError(
            f"span with different traceId are not allowed for traceId={trace_id}"
        )


def validate_parent_ids(spans: list[Span]) -> None:
    """V2: every parentId resolves or is empty; no self-parent
    (ParentIdValidator.scala:30-43)."""
    ids = {s["span_id"] for s in spans}
    if not all((s["parent_span_id"] in ids) or not s["parent_span_id"] for s in spans):
        raise InvalidTraceError("spans without valid parent found")
    if any(s["span_id"] == s["parent_span_id"] for s in spans):
        raise InvalidTraceError("same parent and span id found")


def validate_single_root(spans: list[Span]) -> None:
    """V3: exactly one span with empty parentId (RootValidator.scala:30-38)."""
    roots = {s["span_id"] for s in spans if not s["parent_span_id"]}
    if len(roots) != 1:
        raise InvalidTraceError(f"found {len(roots)} roots")


DEFAULT_VALIDATORS = (
    lambda tid, spans: validate_trace_id(tid, spans),
    lambda tid, spans: validate_parent_ids(spans),
    lambda tid, spans: validate_single_root(spans),
)
