"""getTraceCallGraph (G1, SURVEY.md §2.8).

The reference derives edges from *merged* client/server spans of one
processed trace (TraceReader.scala:127-155): each merged span becomes
``Call{from: client node, to: server node, networkDelta}``.

Two Spark forms are provided:

- :func:`trace_call_graph` — faithful per-trace form over processed traces
  (spans carrying the X-HAYSTACK-* merge tags from the transform pipeline).
- :func:`span_call_edges` — the relational generalization over the flat
  spans table: parent-child service edges via a self-join on
  (trace_id, parent_span_id = span_id), aggregated to (from, to, calls).
  This is the whole-corpus call graph, shuffle-partitioned on trace_id so
  the self-join co-locates (same key as every other trace-level op).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from haystack_traces_spark.transform.tags import (
    IS_MERGED_SPAN,
    NETWORK_DELTA,
    tag_str,
)


def _parent_child_spans(spans: DataFrame) -> DataFrame:
    """Raw parent→child span edge rows (one per child span with a
    resolved parent): (from_service, to_service, child_duration). The
    self-join is on (trace_id, parent_span_id = span_id), co-located on
    the trace exchange like every other trace-level op."""
    child = spans.select(
        F.col("trace_id"),
        F.col("parent_span_id"),
        F.col("service_name").alias("to_service"),
        F.col("duration").alias("child_duration"),
    ).filter(F.col("parent_span_id") != "")
    parent = spans.select(
        F.col("trace_id"),
        F.col("span_id"),
        F.col("service_name").alias("from_service"),
    )
    return child.join(
        parent,
        (child["trace_id"] == parent["trace_id"])
        & (child["parent_span_id"] == parent["span_id"]),
        "inner",
    )


def span_call_edges(spans: DataFrame) -> DataFrame:
    """Corpus-level service call graph from the raw spans table.

    → (from_service, to_service, calls, avg_duration) for every parent→child
    span edge crossing services.
    """
    return (
        _parent_child_spans(spans)
        .groupBy("from_service", "to_service")
        .agg(
            F.count(F.lit(1)).alias("calls"),
            F.avg("child_duration").alias("avg_duration"),
        )
    )


def trace_call_graph(processed_trace_spans: DataFrame) -> DataFrame:
    """Faithful G1: edges from merged spans of processed traces.

    Input: flat spans (post transform-pipeline) with merge tags.
    → (trace_id, from_service, from_operation, to_service, to_operation,
       network_delta)
    """
    from haystack_traces_spark.transform.tags import (
        CLIENT_OP_NAME,
        CLIENT_SERVICE_NAME,
        SERVER_OP_NAME,
        SERVER_SERVICE_NAME,
    )

    merged = processed_trace_spans.filter(
        tag_str("tags", IS_MERGED_SPAN) == "true"
    )
    return merged.select(
        "trace_id",
        tag_str("tags", CLIENT_SERVICE_NAME).alias("from_service"),
        tag_str("tags", CLIENT_OP_NAME).alias("from_operation"),
        tag_str("tags", SERVER_SERVICE_NAME).alias("to_service"),
        tag_str("tags", SERVER_OP_NAME).alias("to_operation"),
        tag_str("tags", NETWORK_DELTA).try_cast("long").alias("network_delta"),
    )


def service_pagerank(
    spans,
    n_iters: int = 10,
    damping: float = 0.85,
) -> "DataFrame":
    """→ (servicename, pagerank): fixed-iteration PageRank over the
    service call graph — "which service is structurally most depended
    on", the prioritization signal service-dependency dashboards rank by.

    Variant notes (both deliberate, mirrored by the oracle): edge weights
    are call-count proportional (w(u→v) = calls(u→v) / out_calls(u)), and
    dangling-node mass (services that never call anyone) is dropped
    rather than redistributed — the simplest deterministic formulation.
    Exactly ``n_iters`` synchronous iterations from the uniform vector.

    Scale shape: ranks and edges are SERVICE-level tables (thousands of
    rows at any corpus size, by the same boundedness argument the oracle's
    CTE chain relies on) — the span table is touched once to build them
    (one distributed parent-child join + two combinable aggregates), then
    the fixed-point itself runs driver-side over the collected edge list
    (r12-opt, guide §1.2: the iterate is broadcast-scale, so N relational
    iterations were N join jobs moving kilobytes; one bounded collect +
    in-memory iteration + one createDataFrame computes the identical
    synchronous trajectory). Inflow sums accumulate in sorted-source
    order, a fixed order where Spark's shuffle sum had an arbitrary one —
    both faces round to 6dp at the end. The oracle mirrors the loop as an
    unrolled CTE chain."""
    sv_rows = (
        spans.select(F.lower("service_name").alias("s")).distinct().collect()
    )
    services = sorted(r["s"] for r in sv_rows)
    # re-group AFTER lowercasing so mixed-case duplicates merge BEFORE the
    # weight division — keeps the arithmetic identical to the oracle's
    # grouped-by-lowered-name edges
    edge_rows = (
        span_call_edges(spans)
        .groupBy(
            F.lower("from_service").alias("u"),
            F.lower("to_service").alias("v"),
        )
        .agg(F.sum("calls").cast("double").alias("calls"))
        .collect()
    )
    out_tot: dict[str, float] = {}
    for r in edge_rows:
        out_tot[r["u"]] = out_tot.get(r["u"], 0.0) + r["calls"]
    w = [(r["u"], r["v"], r["calls"] / out_tot[r["u"]]) for r in edge_rows]
    w.sort()  # deterministic inflow accumulation order
    n = len(services)
    rank = {s: 1.0 / n for s in services}
    base = (1.0 - damping) / n
    for _ in range(n_iters):
        inflow: dict[str, float] = {}
        for u, v, wt in w:
            inflow[v] = inflow.get(v, 0.0) + rank[u] * wt
        rank = {s: base + damping * inflow.get(s, 0.0) for s in services}
    spark = spans.sparkSession
    # rounding stays a Spark expression (HALF_UP, like the original
    # plan's F.round) — Python round() is banker's and could differ on
    # exact .5 ulps
    return (
        spark.createDataFrame(
            [(s, rank[s]) for s in services],
            "servicename string, pr double",
        )
        .select("servicename", F.round("pr", 6).alias("pagerank"))
        .orderBy("servicename")
    )


def service_cheapest_paths(spans: DataFrame, rounds: int = 8) -> DataFrame:
    """→ (servicename, cost): single-source cheapest cumulative-latency
    path from the ROOT service to every service reachable in ≤ ``rounds``
    hops — Bellman-Ford min-plus relaxation, run exactly ``rounds``
    synchronous rounds. The "what is the fastest dependency route to X"
    complement of `service_pagerank`'s structural ranking, and a second
    iterative-relational shape on the trace side (min-plus semiring vs
    pagerank's weighted-sum).

    Deterministic and engine-exact by construction: edge weight = the
    TRUNCATING integer mean child-span duration in µs per (caller,
    callee) — SUM accumulated in DECIMAL(38,0) (the r9 ANSI-overflow
    rule) then ``div`` count, bit-identical to the oracle's HUGEINT
    ``//`` — so the whole fixed point is int64 arithmetic with zero
    float-accumulation risk. Root = lexicographically smallest calling
    service (a scalar aggregate, data-derived on both faces). Edges are
    grouped on LOWERCASED names (the pagerank convention).

    Scale shape: the span table is touched once (the co-located
    parent-child self-join) to build a SERVICE-level edge table
    (thousands of rows at any corpus size, the same boundedness the
    oracle's unrolled CTEs rely on); the relaxation itself runs
    driver-side over the collected edge list (r12-opt, guide §1.2: each
    relational round was a join job + localCheckpoint moving kilobytes —
    8 rounds of pure job overhead; one bounded collect + in-memory
    min-plus + one createDataFrame computes the identical synchronous
    trajectory, and Python int arithmetic is exact int64-and-beyond, so
    the fixed point cannot drift)."""
    edge_rows = (
        _parent_child_spans(spans)
        .groupBy(
            F.lower("from_service").alias("u"),
            F.lower("to_service").alias("v"),
        )
        .agg(
            F.expr(
                "CAST(sum(CAST(child_duration AS DECIMAL(38,0))) "
                "div count(1) AS BIGINT)"
            ).alias("w")
        )
        .collect()
    )
    edges = [(r["u"], r["v"], r["w"]) for r in edge_rows]
    src = min((u for u, _, _ in edges), default=None)
    dist: dict = {src: 0}
    for _ in range(rounds):
        new = dict(dist)
        for u, v, wt in edges:
            if u in dist:
                c = dist[u] + wt
                if v not in new or c < new[v]:
                    new[v] = c
        dist = new
    spark = spans.sparkSession
    return spark.createDataFrame(
        sorted(dist.items()), "servicename string, cost long"
    ).orderBy("servicename")
