"""Span-duration anomaly detection — the "which spans are abnormally slow"
reader-side diagnostic (the trends/anomaly surface haystack-ui layers on the
reader's metricpoints; reference signal source:
indexer/.../writers/es/IndexDocumentGenerator.scala's duration fields feeding
the trends pipeline).

Model: per-(service, operation) population mean/stddev of span duration, a
span is anomalous when its z-score exceeds the threshold. The stats table is
a tiny map-side-combinable aggregate (one row per operation) broadcast back
onto the span scan — no second shuffle of the spans, no window; the same
shape works when the stats come from a trailing window of a streaming
rollup instead.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

DEFAULT_Z = 3.0


def span_anomalies(
    spans: DataFrame,
    z_threshold: float = DEFAULT_Z,
) -> DataFrame:
    """→ (trace_id, span_id, servicename, operationname, duration, z):
    spans whose duration z-score within their (service, operation)
    population is ≥ ``z_threshold``.

    The comparison uses the ROUNDED z (6dp) so engine-order float-sum
    differences in stddev cannot flip membership at the boundary (house
    rule: round before any cross-engine compare). Operations with zero
    duration variance produce no anomalies (z undefined → NULL → filtered).
    """
    stats = (
        spans.groupBy(
            F.lower("service_name").alias("servicename"),
            F.lower("operation_name").alias("operationname"),
        )
        .agg(
            F.avg("duration").alias("mu"),
            F.stddev_pop("duration").alias("sigma"),
        )
        .filter(F.col("sigma") > 0)
    )
    z = F.round((F.col("duration") - F.col("mu")) / F.col("sigma"), 6)
    return (
        spans.select(
            "trace_id",
            "span_id",
            F.lower("service_name").alias("servicename"),
            F.lower("operation_name").alias("operationname"),
            "duration",
        )
        .join(F.broadcast(stats), ["servicename", "operationname"])
        .withColumn("z", z)
        .filter(F.col("z") >= z_threshold)
        .select(
            "trace_id", "span_id", "servicename", "operationname",
            F.col("duration").cast("long").alias("duration"), "z",
        )
    )
