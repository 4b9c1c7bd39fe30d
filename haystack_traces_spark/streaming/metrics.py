"""Event-time service metrics: watermarked windowed aggregation.

The reference ships span metrics to a companion trends pipeline off the
same span stream (indexer fan-out, StreamRunner.scala:56-69); here that
consumer is one idiomatic Structured Streaming windowed aggregation —
`withWatermark` + `window()` — the late-data pattern the rest of the
engine's stateful operators deliberately do NOT use (sessionization needs
window-from-first-SEEN processing time; metrics want true EVENT time).

Semantics:

- tumbling event-time windows on `start_time` (span begin), per service,
- watermark = how long to wait for stragglers: a span later than the
  watermark is DROPPED from its (already finalized) window — the bounded
  state/completeness trade, in contrast to the sessionizer's T4 contract
  where late spans re-open state and re-emit,
- append output: a window row is emitted exactly once, when the watermark
  passes its end — downstream sinks get finalized, immutable rows.

State per (window, service) is one running aggregate row, evicted at
finalization — bounded by (#services × windows-in-flight), independent of
span volume. The same function runs on a batch frame (watermark is a
streaming-only concept and is skipped), which is how the DuckDB oracle
verifies the aggregation arithmetic end-to-end.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

DEFAULT_WINDOW = "1 minute"
DEFAULT_WATERMARK = "1 minute"


def service_rate_metrics(
    spans: DataFrame,
    window_duration: str = DEFAULT_WINDOW,
    watermark_delay: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """→ (window_start, service_name, n_spans, total_duration, avg_duration,
    max_duration): per-service span-rate rollup on tumbling event-time
    windows. window_start is epoch MICROSECONDS (long) — the engine's span
    time unit — so batch/oracle comparison needs no timestamp-zone care."""
    ev = spans.withColumn("event_time", F.timestamp_micros(F.col("start_time")))
    if ev.isStreaming:
        ev = ev.withWatermark("event_time", watermark_delay)
    return (
        ev.groupBy(
            F.window("event_time", window_duration).alias("w"), "service_name"
        )
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum("duration").alias("total_duration"),
            F.round(F.avg("duration"), 6).alias("avg_duration"),
            F.max("duration").alias("max_duration"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start"),
            "service_name",
            F.col("n_spans").cast("long").alias("n_spans"),
            F.col("total_duration").cast("long").alias("total_duration"),
            "avg_duration",
            F.col("max_duration").cast("long").alias("max_duration"),
        )
    )


def service_latency_percentiles(
    spans: DataFrame, approx: bool = False, accuracy: int = 10000
) -> DataFrame:
    """→ (service_name, n_spans, p50, p90, p99): span-duration latency
    profile per service — the trends-side percentile rollup
    (StreamRunner.scala:56-69 forwards spans to exactly this kind of
    consumer) run directly on the span frame.

    Exact `percentile` (linear interpolation — arithmetic-identical to
    DuckDB quantile_cont) keeps the oracle hash-exact; ``approx=True``
    swaps in `percentile_approx` — a mergeable sketch whose partials
    combine map-side, the 100 TB path, with ``accuracy`` dialing the
    error/memory trade. Same plan shape either way: one map-side-combined
    hash aggregate keyed by service."""
    if approx:
        def q(p):
            return F.expr(
                f"percentile_approx(duration, {p}, {accuracy})"
            ).cast("double")
    else:
        def q(p):
            return F.expr(f"percentile(duration, {p})")

    return (
        spans.groupBy("service_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.round(q(0.5), 6).alias("p50"),
            F.round(q(0.9), 6).alias("p90"),
            F.round(q(0.99), 6).alias("p99"),
        )
        .orderBy("service_name")
    )


def start_metrics_sink(
    spans: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    window_duration: str = DEFAULT_WINDOW,
    watermark_delay: str = DEFAULT_WATERMARK,
    available_now: bool = True,
):
    """Append-mode parquet sink: one immutable row per finalized window."""
    writer = (
        service_rate_metrics(spans, window_duration, watermark_delay)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
