"""Canonical schemas for the engine (SURVEY.md §1.2).

The reference's data model is protobuf ``Span`` / ``SpanBuffer`` /
``TraceIndexDoc`` (see /root/reference commons+indexer; field usage at
SpanUtils.scala:37-39,115-140 and IndexDocumentGenerator.scala:133-144).
Times are **microseconds since epoch** (int64); durations micros.
"""

from __future__ import annotations

import pyspark.sql.types as T

# Typed tag union — vtype selects which value field is populated
# (reference: 5-way match in IndexDocumentGenerator.scala:133-144).
TAG = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("vtype", T.StringType()),  # BOOL|STRING|LONG|DOUBLE|BINARY
        T.StructField("vstr", T.StringType()),
        T.StructField("vlong", T.LongType()),
        T.StructField("vdouble", T.DoubleType()),
        T.StructField("vbool", T.BooleanType()),
        T.StructField("vbytes", T.BinaryType()),
    ]
)

# Timestamped in-span event (zipkin cs/cr/sr/ss markers live here,
# reference: SpanUtils.scala:29-35,149-153).
LOG = T.StructType(
    [
        T.StructField("timestamp", T.LongType()),
        T.StructField(
            "fields",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("key", T.StringType()),
                        T.StructField("vstr", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)

SPAN = T.StructType(
    [
        T.StructField("trace_id", T.StringType()),
        T.StructField("span_id", T.StringType()),
        T.StructField("parent_span_id", T.StringType()),
        T.StructField("service_name", T.StringType()),
        T.StructField("operation_name", T.StringType()),
        T.StructField("start_time", T.LongType()),  # micros since epoch
        T.StructField("duration", T.LongType()),  # micros
        T.StructField("tags", T.ArrayType(TAG)),
        T.StructField("logs", T.ArrayType(LOG)),
    ]
)

# One row per trace: the SpanBuffer analog
# (reference: SpanBufferMemoryStore.scala:118).
TRACE = T.StructType(
    [
        T.StructField("trace_id", T.StringType()),
        T.StructField("spans", T.ArrayType(SPAN)),
    ]
)

# Streaming-side extras carried by the ingest source (FIXTURES.md §1):
# kafka record timestamp (ms) drives the T1 sessionization window; offset
# drives replay semantics.
SPAN_INGEST = T.StructType(
    SPAN.fields
    + [
        T.StructField("kafka_ts", T.LongType()),
        T.StructField("kafka_offset", T.LongType()),
    ]
)


def span_field_names() -> list[str]:
    return [f.name for f in SPAN.fields]
