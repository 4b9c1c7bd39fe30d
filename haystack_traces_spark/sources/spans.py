"""Trace store construction and key-lookup reads (S3/S7, SURVEY.md §2.1).

The reference stores one row per (traceId, ingest-ts) in Cassandra with the
spans as a compressed protobuf blob (GrpcTraceWriter.scala:57-63; DDL at
backends/cassandra/src/main/resources/config/base.conf:57). Here the blob is
a first-class nested array column in parquet — columnar, prunable, no custom
framing needed (zstd page compression subsumes the reference's packer,
commons/.../packer/Packer.scala:29-77).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from haystack_traces_spark.schemas import span_field_names


def build_trace_store(
    spans: DataFrame,
    ingest_ts_ms: int | None = None,
    salt_buckets: int = 0,
) -> DataFrame:
    """Group flat spans into one row per trace: (trace_id, ingest_ts, spans).

    One shuffle on trace_id; at scale write bucketed by trace_id so the
    search-phase semi-join and the re-group are co-located.

    ``salt_buckets``: skew guard for mega-traces (a runaway trace with
    millions of spans would otherwise funnel through ONE reducer's
    collect_list). With salting the collect happens in two phases —
    (trace_id, salt) partial lists, then flatten per trace — so a hot key
    fans out over ``salt_buckets`` reducers first. The final per-trace
    flatten is unavoidable data movement, but it moves pre-built arrays,
    not row-at-a-time structs. Off by default: the streaming path already
    caps spans per trace (T2), and salting costs an extra shuffle.
    """
    cols = [c for c in span_field_names() if c in spans.columns]
    span_struct = F.struct(*[F.col(c) for c in cols])
    if salt_buckets > 1:
        partial = (
            spans.withColumn(
                "_salt", F.pmod(F.crc32(F.col("span_id")), F.lit(salt_buckets))
            )
            .groupBy("trace_id", "_salt")
            .agg(F.collect_list(span_struct).alias("part"))
        )
        out = partial.groupBy("trace_id").agg(
            F.flatten(F.collect_list("part")).alias("spans")
        )
    else:
        out = spans.groupBy("trace_id").agg(F.collect_list(span_struct).alias("spans"))
    if ingest_ts_ms is not None:
        out = out.withColumn("ingest_ts", F.lit(ingest_ts_ms))
    return out


def write_trace_store(trace_store: DataFrame, path: str, buckets: int = 0) -> None:
    w = trace_store.write.mode("overwrite")
    if buckets:
        # bucketing co-locates the id semi-join + regroup without a shuffle
        (
            w.format("parquet")
            .bucketBy(buckets, "trace_id")
            .sortBy("trace_id")
            .option("path", path)
            .saveAsTable("trace_store")
        )
    else:
        w.parquet(path)


def read_trace_records(trace_store: DataFrame, trace_ids: list[str]) -> DataFrame:
    """S7 key lookup: all stored rows for the given ids (IN-list semantics,
    CassandraSession.scala:68-76). Multiple rows per id are preserved —
    callers re-union via groupBy (TraceMerger.scala:24-34)."""
    return trace_store.filter(F.col("trace_id").isin([str(t) for t in trace_ids]))


def read_traces_fanout(
    stores: list,
    trace_ids: list[str],
) -> DataFrame:
    """S7/O5 multi-backend fan-out with per-backend failure recovery
    (GrpcTraceReaders.scala:52-66): key-lookup every backend, union the
    per-backend results, and recover a FAILED backend to an empty
    contribution (`.recover { case _ => Seq.empty }`, :58-61) instead of
    failing the read. Rows are then merged to one per trace — the
    TraceMerger.merge step (J2, TraceMerger.scala:24-34).

    ``stores``: DataFrames or zero-arg callables returning one. A callable
    raising (unreachable path, missing table — the analog of a dead gRPC
    backend) is the recover boundary; like the reference, recovery applies
    per backend at call time, and only if EVERY backend is down does the
    read fail.

    Scale shape: each branch is a pruned key-lookup; the union is a no-
    shuffle concatenation and the final per-trace merge is one hash
    aggregation on trace_id (allowMissingColumns tolerates backends at
    different schema versions).
    """
    branches = []
    for s in stores:
        try:
            df = s() if callable(s) else s
            branches.append(read_trace_records(df, trace_ids))
        except Exception:
            continue  # failed backend recovered to empty
    if not branches:
        raise RuntimeError("all trace backends failed")
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b, allowMissingColumns=True)
    return out.groupBy("trace_id").agg(
        F.flatten(F.collect_list("spans")).alias("spans")
    )


def get_raw_trace(trace_store: DataFrame, trace_id: str) -> DataFrame:
    """getRawTrace: stored rows merged to one (trace_id, spans) row, no
    transform pipeline (TraceReader.scala:52-57)."""
    return (
        read_trace_records(trace_store, [trace_id])
        .groupBy("trace_id")
        .agg(F.flatten(F.collect_list("spans")).alias("spans"))
    )


def get_raw_span(trace_store: DataFrame, trace_id: str, span_id: str) -> DataFrame:
    """getRawSpan: the stored span rows for one (traceId, spanId) — may be
    several for partial spans (TraceReader.scala:58-68)."""
    return (
        get_raw_trace(trace_store, trace_id)
        .select(F.explode("spans").alias("s"))
        .filter(F.col("s.span_id") == span_id)
        .select("s.*")
    )
