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


def span_call_edges(spans: DataFrame) -> DataFrame:
    """Corpus-level service call graph from the raw spans table.

    → (from_service, to_service, calls, avg_duration) for every parent→child
    span edge crossing services.
    """
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
    edges = child.join(
        parent,
        (child["trace_id"] == parent["trace_id"])
        & (child["parent_span_id"] == parent["span_id"]),
        "inner",
    )
    return (
        edges.groupBy("from_service", "to_service")
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
