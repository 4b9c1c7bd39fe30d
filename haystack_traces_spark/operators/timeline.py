"""Trace timeline (waterfall) rows: tree depth + start offset per span.

The reference UI renders every trace as a waterfall — spans ordered by
start time, indented by tree depth, offset from the trace's first span
(haystack-ui trace view; the reader feeds it the merged span list from
TraceReader.scala). This operator materializes exactly those rows.

Shape: one Python walk per trace, streamed as a single mapInPandas pass
per partition over trace-sorted rows on the same trace_id exchange every
per-trace operator shares (SCALE.md §2; r12-opt — the former per-trace
applyInPandas grouped map paid one pandas/Arrow transition per trace).
Depth is hops along in-trace parent links, memoized per group — a span
whose parent is empty or missing from the trace sits at depth 0, matching
the SpanTree root semantics the repair transformers enforce
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


def _trace_stream(spans: DataFrame, cols, core, schema: str) -> DataFrame:
    """Run ``core(trace_id, *column_lists) -> list[tuple]`` once per trace
    as ONE mapInPandas stream per partition over trace-sorted rows
    (r12-opt, guide §4.1/§4.5) instead of a per-trace applyInPandas
    grouped map — the grouped map pays one pandas-frame construction and
    one Arrow transition PER TRACE (~10k tiny groups at sf0.1, where the
    per-trace Python walk itself is microseconds). Group boundaries are
    detected in-stream; a trace's rows never split across partitions
    (hash repartition on trace_id), and the tail trace's rows are carried
    across Arrow batch boundaries. Row order within a trace is arbitrary,
    exactly as applyInPandas delivered it — every core is order-invariant."""
    out_names = [c.strip().split()[0] for c in schema.split(",")]

    def stream(pdfs):
        out: list[tuple] = []
        pend_tid = None
        pend: list[list] = [[] for _ in cols]
        for pdf in pdfs:
            lists = [pdf[c].tolist() for c in ("trace_id", *cols)]
            for row in zip(*lists):
                if row[0] != pend_tid:
                    if pend_tid is not None:
                        out.extend(core(pend_tid, *pend))
                    pend_tid = row[0]
                    pend = [[] for _ in cols]
                for acc, v in zip(pend, row[1:]):
                    acc.append(v)
            if len(out) >= 65536:  # bound per-partition buffering
                yield pd.DataFrame(out, columns=out_names)
                out = []
        if pend_tid is not None:
            out.extend(core(pend_tid, *pend))
        if out:
            yield pd.DataFrame(out, columns=out_names)

    return (
        spans.select("trace_id", *cols)
        .repartition("trace_id")
        .sortWithinPartitions("trace_id")
        .mapInPandas(stream, schema)
    )


def _timeline_core(tid, sids, parents, services, starts, durs):
    memo = _depths(sids, parents)
    t0 = min(starts)
    return [
        (tid, s, memo[s], st - t0, d, sv)
        for s, sv, st, d in zip(sids, services, starts, durs)
    ]


def trace_timeline(spans: DataFrame) -> DataFrame:
    """→ (trace_id, span_id, depth, offset_us, duration, servicename)."""
    return _trace_stream(
        spans.withColumnRenamed("service_name", "servicename"),
        ("span_id", "parent_span_id", "servicename", "start_time", "duration"),
        _timeline_core,
        TIMELINE_SCHEMA,
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

    Same per-trace walk as trace_timeline, streamed through
    :func:`_trace_stream`; the oracle accumulates paths with a recursive
    CTE and takes the per-trace argmax."""
    return _trace_stream(
        spans,
        ("span_id", "parent_span_id", "duration"),
        _critical_path_core,
        "trace_id string, leaf_span_id string, path_spans long, "
        "path_duration long",
    )


def _heaviest_leaf(sids, parents, durs):
    """Shared argmax walk of the critical-path pair: → (winning leaf,
    (path_dur, hops) per reached span, parent map). Ties break largest
    path_duration then SMALLEST leaf span_id."""
    parent = dict(zip(sids, parents))
    dur = dict(zip(sids, durs))
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

    children = set(p for p in parents if p in parent)
    leaves = [s for s in sids if s not in children]
    # an all-cycle trace has no leaves — rank every span instead
    leaves = leaves or list(sids)
    _, s0 = sorted((-path_of(s)[0], s) for s in leaves)[0]
    return s0, total, parent


def _critical_path_core(tid, sids, parents, durs):
    s0, total, _ = _heaviest_leaf(sids, parents, durs)
    d, hops = total[s0]
    return [(tid, s0, hops, d)]


def critical_path_members(spans: DataFrame) -> DataFrame:
    """→ (trace_id, span_id): the MEMBER spans of each trace's critical
    path (the same argmax root-to-leaf chain :func:`critical_path`
    summarizes — ties break largest path_duration then smallest leaf
    span_id). Feeds the corpus-level "which service owns the critical
    path" rollup; same one-walk-per-trace core streamed through
    :func:`_trace_stream`, same cycle guard."""
    return _trace_stream(
        spans,
        ("span_id", "parent_span_id", "duration"),
        _members_core,
        "trace_id string, span_id string",
    )


def _members_core(tid, sids, parents, durs):
    s0, _, parent = _heaviest_leaf(sids, parents, durs)
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
    return [(tid, s) for s in chain]
