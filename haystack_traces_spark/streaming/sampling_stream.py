"""Streaming tail-based sampling gate.

The batch `tail_sampling` registry query decides keep/drop once per
complete trace. In a stream, "complete" is never final — a late span can
arrive after the sessionizer emitted the trace, and a replayed micro-batch
must not flip decisions. So the gate follows the house mergeable-state
pattern (anomaly moments, latency histogram): per batch it writes PARTIAL
per-trace aggregates (error flag, min start, max end) to the batch's own
partition directory (overwrite → replay-idempotent under at-least-once
foreachBatch), and the decision table is computed ON READ from the merged
log — max/min/max are associative, so one trace split across any number of
batches folds to exactly the numbers the batch operator computes on the
full span set, and a late ERROR span upgrades the trace's decision
retroactively (the correct tail-sampling semantics: the keep set converges
to the batch answer as data completes).

The keep POLICY (error > slow > deterministic-hash precedence) lives here
once — :func:`sampling_reason` — and the batch query imports it, so the
two faces cannot drift.

No SQL oracle (stateful streaming); covered by batch-equivalence, replay
and late-upgrade tests. Reference analog: the span buffer's
keep-on-complete decision point (SpanBufferKeeper semantics), re-expressed
as Spark Structured Streaming state.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

DEFAULT_SLOW_US = 1_000_000
DEFAULT_RATE_PCT = 10


def sampling_reason(
    slow_us: int = DEFAULT_SLOW_US, rate_pct: int = DEFAULT_RATE_PCT
) -> F.Column:
    """The ONE tail-sampling policy expression (audit column): requires
    ``trace_id``, ``has_error`` (int 0/1) and ``trace_dur`` columns.
    Deterministic hash60 bucket — reproducible across engines, restarts
    and re-partitioning; no RNG state."""
    from haystack_traces_spark.datapipe.hashing import hash60

    bucket = hash60(F.col("trace_id"), seed="tail:") % 100
    return (
        F.when(F.col("has_error") == 1, F.lit("error"))
        .when(F.col("trace_dur") > slow_us, F.lit("slow"))
        .when(bucket < rate_pct, F.lit("hash"))
        .otherwise(F.lit("drop"))
    )


class TailSamplingIngest:
    """foreachBatch accumulator of per-trace partials + decision reader.

    ``spans`` batches need (trace_id, start_time, duration, is_error
    boolean). Callers with typed tags project ``is_error`` first (the
    batch side uses errorcode >= threshold); the gate itself is
    policy-only and does not parse tags.
    """

    def __init__(
        self,
        state_dir: str,
        slow_us: int = DEFAULT_SLOW_US,
        rate_pct: int = DEFAULT_RATE_PCT,
    ):
        self.state_dir = state_dir.rstrip("/")
        self.slow_us = slow_us
        self.rate_pct = rate_pct

    def process_batch(self, spans: DataFrame, batch_id: int) -> None:
        # one combinable per-trace aggregate; overwrite of the batch's own
        # partition dir keeps a replayed batch from double-entering state
        (
            spans.groupBy("trace_id")
            .agg(
                F.max(F.col("is_error").cast("int")).alias("err_part"),
                F.min("start_time").alias("min_start"),
                F.max(F.col("start_time") + F.col("duration")).alias("max_end"),
            )
            .write.mode("overwrite")
            .parquet(f"{self.state_dir}/batch_id={batch_id}")
        )

    def decisions(self, spark: SparkSession) -> DataFrame:
        """→ (trace_id, has_error, trace_dur, reason, sampled): the same
        schema and values the batch `tail_sampling` operator produces on
        the union of all ingested spans — max/min/max partials fold
        associatively, so batch boundaries are invisible."""
        merged = (
            spark.read.parquet(self.state_dir)
            .groupBy("trace_id")
            .agg(
                F.max("err_part").alias("has_error"),
                (F.max("max_end") - F.min("min_start")).alias("trace_dur"),
            )
        )
        reason = sampling_reason(self.slow_us, self.rate_pct)
        return (
            merged.select(
                "trace_id",
                (F.col("has_error") == 1).alias("has_error"),
                F.col("trace_dur").cast("long").alias("trace_dur"),
                reason.alias("reason"),
            )
            .withColumn("sampled", F.col("reason") != "drop")
            .orderBy("trace_id")
        )

    def start(self, source: DataFrame, checkpoint_dir: str, available_now: bool = True):
        writer = source.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
