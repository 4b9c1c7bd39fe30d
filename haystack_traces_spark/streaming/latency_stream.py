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

No SQL oracle (stateful streaming); covered by the error-bound and
merge-invariance tests.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def dur_bucket(col: str = "duration"):
    """log2 bucket = bit length of the duration (== floor(log2 d) + 1 for
    d > 0; 0 -> 1). Integer-deterministic on every engine."""
    return F.length(F.conv(F.col(col).cast("string"), 10, 2)).cast("long")


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
        from the accumulated histogram. Per-operation window over ≤ 64
        bucket rows — the heavy data never re-sorts, only the tiny
        histogram does."""
        from pyspark.sql import Window

        w = Window.partitionBy("servicename", "operationname").orderBy("bucket")
        wt = Window.partitionBy("servicename", "operationname")
        cum = (
            self._hist(spark)
            .withColumn("cum", F.sum("n").over(w))
            .withColumn("total", F.sum("n").over(wt))
        )
        outs = []
        for q in qs:
            est = (
                cum.filter(F.col("cum") >= F.lit(q) * F.col("total"))
                .groupBy("servicename", "operationname")
                .agg(F.min("bucket").alias("b"))
                .select(
                    "servicename",
                    "operationname",
                    F.lit(q).alias("q"),
                    (F.pow(F.lit(2.0), F.col("b")) - 1).cast("long").alias("est_us"),
                )
            )
            outs.append(est)
        out = outs[0]
        for o in outs[1:]:
            out = out.unionByName(o)
        return out

    def start(self, source: DataFrame, checkpoint_dir: str, available_now: bool = True):
        writer = source.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
