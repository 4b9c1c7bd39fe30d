"""Trace timeline (waterfall) rows: tree depth + start offset per span.

The reference UI renders every trace as a waterfall — spans ordered by
start time, indented by tree depth, offset from the trace's first span
(haystack-ui trace view; the reader feeds it the merged span list from
TraceReader.scala). This operator materializes exactly those rows.

Shape: one grouped-map pandas UDF per trace riding the same trace_id
exchange every per-trace operator shares (SCALE.md §2). Depth is hops
along in-trace parent links, memoized per group — a span whose parent is
empty or missing from the trace sits at depth 0, matching the SpanTree
root semantics the repair transformers enforce
(reader/.../transformers/SpanTreeBuilder, spantree.py)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

TIMELINE_SCHEMA = (
    "trace_id string, span_id string, depth long, offset_us long, "
    "duration long, servicename string"
)


def _depths(span_ids, parents) -> dict[str, int]:
    parent = dict(zip(span_ids, parents))
    memo: dict[str, int] = {}
    for s in span_ids:
        stack = []
        cur = s
        while cur not in memo:
            p = parent.get(cur, "")
            if p == "" or p not in parent:
                memo[cur] = 0
                break
            stack.append(cur)
            cur = p
        while stack:
            nxt = stack.pop()
            memo[nxt] = memo[parent[nxt]] + 1
    return memo


def trace_timeline(spans: DataFrame) -> DataFrame:
    """→ (trace_id, span_id, depth, offset_us, duration, servicename)."""

    def one(pdf: pd.DataFrame) -> pd.DataFrame:
        memo = _depths(pdf["span_id"].tolist(), pdf["parent_span_id"].tolist())
        t0 = int(pdf["start_time"].min())
        return pd.DataFrame(
            {
                "trace_id": pdf["trace_id"],
                "span_id": pdf["span_id"],
                "depth": [memo[s] for s in pdf["span_id"]],
                "offset_us": pdf["start_time"] - t0,
                "duration": pdf["duration"],
                "servicename": pdf["service_name"],
            }
        )

    return (
        spans.select(
            "trace_id",
            "span_id",
            "parent_span_id",
            "service_name",
            "start_time",
            "duration",
        )
        .groupBy("trace_id")
        .applyInPandas(one, TIMELINE_SCHEMA)
    )
