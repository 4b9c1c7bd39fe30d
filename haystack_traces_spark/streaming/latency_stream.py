"""Streaming latency percentiles from a mergeable log2-bucket histogram.

`service_latency_percentiles` (streaming/metrics.py) computes exact
percentiles per micro-batch — correct within a batch, but per-batch
percentiles cannot be MERGED into "p99 since yesterday": quantiles are not
additive. The mergeable-state answer is a fixed-bucket histogram: per
(service, operation, log2-duration-bucket) counts are pure sums, so the
state is an append-only log exactly like the anomaly gate's moments, and
any window of it folds into a percentile estimate with a bounded relative
error (the bucket upper bound is < 2x the true value — the same trade
HDR-histogram/t-digest-class systems make, with the dumbest possible
sketch).

    per micro-batch:   state[batch_id] = (svc, op, bit_length(duration), count)
                       (overwrite of the batch's own partition dir —
                        replay-idempotent under at-least-once foreachBatch)
    on read (any time): cumulative walk per operation -> smallest bucket
                        whose cumulative count reaches q * total; the
                        estimate is that bucket's inclusive upper bound
                        2^b - 1  (so true <= estimate < 2 * true).

The bucketing expression is shared with the batch `latency_heatmap` query:
integer bit length via base-2 string conversion — no float log anywhere.

:class:`EventTimeLatencyHistogram` (VERDICT r10 ask #6) is the EVENT-TIME
face: spans bucket into event-time hours, an hour's percentile rows are
emitted exactly once when the watermark passes the hour's end, late
arrivals route observably to ``late/`` — a pure function of the data that
equals :func:`hourly_latency_percentiles` under any batching (pinned by
the backfill==batch test). The arrival-time ingest above REMAINS the
"monitoring now" face: its reader answers "p99 since yesterday" over
whatever has arrived, a monitoring question where waiting out a watermark
delay is exactly wrong.

No SQL oracle (stateful streaming); covered by the error-bound and
merge-invariance tests.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from haystack_traces_spark.streaming.quality_stream import EventTimeHourGate


def dur_bucket(col: str = "duration"):
    """log2 bucket = bit length of the duration (== floor(log2 d) + 1 for
    d > 0; 0 -> 1). Integer-deterministic on every engine."""
    return F.length(F.conv(F.col(col).cast("string"), 10, 2)).cast("long")


def percentiles_from_hist(
    hist: DataFrame,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    keys: tuple[str, ...] = ("servicename", "operationname"),
) -> DataFrame:
    """SHARED CORE (rule 19): percentile estimates from a (keys..., bucket,
    n) histogram — smallest bucket whose cumulative count reaches q·total,
    estimate = that bucket's inclusive upper bound 2^b − 1 (true ≤ est <
    2·true). One window per key group over ≤64 bucket rows — the heavy
    data never re-sorts, only the tiny histogram does. Used by the
    arrival-time reader, the event-time hourly face, and the batch face."""
    from pyspark.sql import Window

    kl = list(keys)
    w = Window.partitionBy(*kl).orderBy("bucket")
    wt = Window.partitionBy(*kl)
    cum = hist.withColumn("cum", F.sum("n").over(w)).withColumn(
        "total", F.sum("n").over(wt)
    )
    outs = []
    for q in qs:
        est = (
            cum.filter(F.col("cum") >= F.lit(q) * F.col("total"))
            .groupBy(*kl)
            .agg(F.min("bucket").alias("b"))
            .select(
                *kl,
                F.lit(q).alias("q"),
                F.expr(
                    "shiftleft(CAST(1 AS BIGINT), CAST(b AS INT)) - 1"
                ).alias("est_us"),
            )
        )
        outs.append(est)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


class LatencyHistogramIngest:
    """foreachBatch histogram accumulator + percentile reader."""

    def __init__(self, state_dir: str):
        self.state_dir = state_dir

    def process_batch(self, spans: DataFrame, batch_id: int) -> None:
        # batch_id=<id> partition dir with OVERWRITE: foreachBatch is
        # at-least-once, and a replayed batch must land on its own prior
        # directory, not append its counts a second time
        (
            spans.groupBy(
                F.lower("service_name").alias("servicename"),
                F.lower("operation_name").alias("operationname"),
                dur_bucket().alias("bucket"),
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .write.mode("overwrite")
            .parquet(f"{self.state_dir.rstrip('/')}/batch_id={batch_id}")
        )

    def _hist(self, spark) -> DataFrame:
        return (
            spark.read.parquet(self.state_dir)
            .groupBy("servicename", "operationname", "bucket")
            .agg(F.sum("n").alias("n"))
        )

    def percentiles(self, spark, qs: tuple[float, ...] = (0.5, 0.9, 0.99)) -> DataFrame:
        """→ (servicename, operationname, q, est_us): percentile estimates
        from the accumulated histogram (shared cumulative-walk core)."""
        return percentiles_from_hist(self._hist(spark), qs)

    def start(self, source: DataFrame, checkpoint_dir: str, available_now: bool = True):
        writer = source.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()


HIST_HOUR_US = 3_600_000_000


class EventTimeLatencyHistogram(EventTimeHourGate):
    """EVENT-TIME face of the latency histogram (VERDICT r10 ask #6):
    hour-bucketed percentile estimates that FINALIZE when the gate's
    watermark passes the hour's end — the last arrival-time-only gate
    with a natural event-time reading. Rides :class:`EventTimeHourGate`
    (quality_stream) for ALL dedup / late-routing / watermark /
    single-shot-emission mechanics; this class only defines the moment
    rows (per-(service, operation, hour, log2-bucket) counts — pure
    associative sums, so replay/compaction stay lossless) and the verdict
    (the shared cumulative-walk percentile core, per finalized hour).

    Input rows: (doc_id long, ts long, servicename string,
    operationname string, duration long) — doc_id is the span's unique
    identity for redelivery dedup; ts its event time. Emitted verdicts:
    (servicename, operationname, hour_ts, q, est_us), equal to
    :func:`hourly_latency_percentiles` over the same corpus under ANY
    batching (pinned by the backfill==batch test)."""

    _INPUT_COLS = ("servicename", "operationname", "duration")
    _MOMENT_SCHEMA = (
        "servicename string, operationname string, hour_ts long, "
        "bucket long, n long"
    )
    _MOMENT_KEYS = ("servicename", "operationname", "hour_ts", "bucket")

    def __init__(
        self,
        state_dir: str,
        out_dir: str,
        delay_us: int,
        hour_us: int = HIST_HOUR_US,
        qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    ):
        super().__init__(state_dir, out_dir, delay_us, hour_us)
        self.qs = tuple(qs)

    def moment_rows(self, new: DataFrame) -> DataFrame:
        return new.groupBy(
            "servicename",
            "operationname",
            self._hour_col(),
            dur_bucket().alias("bucket"),
        ).agg(F.count(F.lit(1)).cast("long").alias("n"))

    def verdict_rows(self, final_moments: DataFrame) -> DataFrame:
        hist = final_moments.groupBy(
            "servicename", "operationname", "hour_ts", "bucket"
        ).agg(F.sum("n").alias("n"))
        return percentiles_from_hist(
            hist, self.qs, keys=("servicename", "operationname", "hour_ts")
        )


def hourly_latency_percentiles(
    rows: DataFrame,
    hour_us: int = HIST_HOUR_US,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """BATCH face of :class:`EventTimeLatencyHistogram` over an at-rest
    (ts, servicename, operationname, duration) frame — the same bucket
    moments and cumulative-walk core, so gate-emitted verdicts equal this
    under any batching. Scale shape: one combinable (svc, op, hour,
    bucket) rollup, then windows over the tiny histogram only."""
    hist = rows.groupBy(
        "servicename",
        "operationname",
        (F.col("ts") - F.col("ts") % hour_us).alias("hour_ts"),
        dur_bucket().alias("bucket"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    return percentiles_from_hist(
        hist, qs, keys=("servicename", "operationname", "hour_ts")
    )
