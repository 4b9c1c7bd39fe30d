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
        on_path: set[str] = set()
        cur = s
        while cur not in memo:
            # cycle guard: these operators consume RAW spans (the repair
            # transformers that fix cyclic parent links run downstream of
            # the tree builder, not here) — a corrupt parent cycle must not
            # spin the UDF forever. A cycle member becomes its own root
            # (depth 0), same fallback as a dangling parent.
            on_path.add(cur)
            p = parent.get(cur, "")
            if p == "" or p not in parent or p in on_path:
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


def span_self_time(spans: DataFrame) -> DataFrame:
    """→ (trace_id, span_id, servicename, duration, child_time, self_time):
    flamegraph feed — each span's duration minus the summed durations of
    its direct children (negative when children run concurrently / extend
    past the parent; kept raw, the flamegraph clamps at render time).

    Pure relational: ONE map-side-combinable child aggregate keyed by
    (trace_id, parent) joined back to the span row — both sides cluster on
    the trace exchange, no recursion, no Python."""
    import pyspark.sql.functions as F

    child = (
        spans.filter(F.col("parent_span_id") != "")
        .groupBy(
            "trace_id", F.col("parent_span_id").alias("span_id")
        )
        .agg(F.sum("duration").alias("child_time"))
    )
    return (
        spans.select(
            "trace_id",
            "span_id",
            F.col("service_name").alias("servicename"),
            "duration",
        )
        .join(child, ["trace_id", "span_id"], "left")
        .select(
            "trace_id",
            "span_id",
            "servicename",
            "duration",
            F.coalesce("child_time", F.lit(0)).cast("long").alias("child_time"),
            (F.col("duration") - F.coalesce("child_time", F.lit(0)))
            .cast("long")
            .alias("self_time"),
        )
    )


def critical_path(spans: DataFrame) -> DataFrame:
    """→ (trace_id, leaf_span_id, path_spans, path_duration): the
    root-to-leaf chain with the largest cumulative span duration — the
    classic "what should I optimize" trace question. Simplified additive
    model (sum of durations along the path; overlap-aware self-time models
    refine it — see span_self_time); ties break on leaf span_id.

    Same grouped-map shape as trace_timeline: one walk per trace on the
    shared trace exchange; the oracle accumulates paths with a recursive
    CTE and takes the per-trace argmax."""
    import pandas as pd

    def one(pdf: pd.DataFrame) -> pd.DataFrame:
        parent = dict(zip(pdf["span_id"], pdf["parent_span_id"]))
        dur = dict(zip(pdf["span_id"], pdf["duration"]))
        total: dict[str, tuple[int, int]] = {}  # span -> (path_dur, hops)

        def path_of(s):
            stack = []
            on_path = set()
            cur = s
            while cur not in total:
                # cycle guard — mirrors _depths: a cyclic parent link roots
                # the path at the cycle member instead of looping forever
                on_path.add(cur)
                p = parent.get(cur, "")
                if p == "" or p not in parent or p in on_path:
                    total[cur] = (int(dur[cur]), 1)
                    break
                stack.append(cur)
                cur = p
            while stack:
                nxt = stack.pop()
                pd_, hops = total[parent[nxt]]
                total[nxt] = (pd_ + int(dur[nxt]), hops + 1)
            return total[s]

        children = set(p for p in pdf["parent_span_id"] if p in parent)
        leaves = [s for s in pdf["span_id"] if s not in children]
        # an all-cycle trace has no leaves — rank every span instead
        leaves = leaves or list(pdf["span_id"])
        # tie-break: largest path_duration, then SMALLEST leaf span_id
        _, s0 = sorted((-path_of(s)[0], s) for s in leaves)[0]
        d, hops = path_of(s0)
        return pd.DataFrame(
            {
                "trace_id": [pdf["trace_id"].iloc[0]],
                "leaf_span_id": [s0],
                "path_spans": [hops],
                "path_duration": [d],
            }
        )

    return (
        spans.select("trace_id", "span_id", "parent_span_id", "duration")
        .groupBy("trace_id")
        .applyInPandas(
            one,
            "trace_id string, leaf_span_id string, path_spans long, "
            "path_duration long",
        )
    )


def critical_path_members(spans: DataFrame) -> DataFrame:
    """→ (trace_id, span_id): the MEMBER spans of each trace's critical
    path (the same argmax root-to-leaf chain :func:`critical_path`
    summarizes — ties break largest path_duration then smallest leaf
    span_id). Feeds the corpus-level "which service owns the critical
    path" rollup; same one-walk-per-trace grouped-map shape on the shared
    trace exchange, same cycle guard."""
    import pandas as pd

    def one(pdf: pd.DataFrame) -> pd.DataFrame:
        parent = dict(zip(pdf["span_id"], pdf["parent_span_id"]))
        dur = dict(zip(pdf["span_id"], pdf["duration"]))
        total: dict[str, tuple[int, int]] = {}

        def path_of(s):
            stack = []
            on_path = set()
            cur = s
            while cur not in total:
                on_path.add(cur)
                p = parent.get(cur, "")
                if p == "" or p not in parent or p in on_path:
                    total[cur] = (int(dur[cur]), 1)
                    break
                stack.append(cur)
                cur = p
            while stack:
                nxt = stack.pop()
                pd_, hops = total[parent[nxt]]
                total[nxt] = (pd_ + int(dur[nxt]), hops + 1)
            return total[s]

        children = set(p for p in pdf["parent_span_id"] if p in parent)
        leaves = [s for s in pdf["span_id"] if s not in children]
        leaves = leaves or list(pdf["span_id"])
        _, s0 = sorted((-path_of(s)[0], s) for s in leaves)[0]
        # walk the winning chain leaf→root (same guard as path_of)
        chain, seen = [], set()
        cur = s0
        while True:
            chain.append(cur)
            seen.add(cur)
            p = parent.get(cur, "")
            if p == "" or p not in parent or p in seen:
                break
            cur = p
        return pd.DataFrame(
            {
                "trace_id": [pdf["trace_id"].iloc[0]] * len(chain),
                "span_id": chain,
            }
        )

    return (
        spans.select("trace_id", "span_id", "parent_span_id", "duration")
        .groupBy("trace_id")
        .applyInPandas(one, "trace_id string, span_id string")
    )
