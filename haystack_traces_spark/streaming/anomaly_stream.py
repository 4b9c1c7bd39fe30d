"""Streaming span-anomaly gate: duration z-scores against PRIOR-delivery
population moments.

The batch operator (operators/anomaly.span_anomalies) scores spans against
the same batch they arrive in — fine for offline sweeps, but an alerting
path must score an arriving span against what was NORMAL BEFORE it, and
must not rescan history per micro-batch. This gate keeps per-(service,
operation) population MOMENTS (n, Σd, Σd²) as state: mean/variance derive
from the prior state, each batch appends only its own tiny moment rows.

Shape (foreachBatch + append-only moment log, the merge-catalog pattern):

    per micro-batch:
      prior  = moment log compacted on read (SUM per operation — mergeable
               by construction, the same trick percentile_approx sketches
               and HLL registers use)
      z      = (duration - mu_prior) / sigma_prior   (broadcast join)
      out    = spans with z >= threshold AND prior n >= min_n
      state += this batch's per-operation (n, Σd, Σd²) rows

    Both the state and output writes go to a ``batch_id=<id>`` partition
    directory with OVERWRITE semantics: foreachBatch is at-least-once, and
    a replayed batch must land on the same directory it wrote before the
    crash instead of appending its rows a second time (double-counted
    moments would permanently skew mu/sigma). Replay-idempotence test
    pins this.

State grows one row per (operation, batch); compaction is an optional
offline rewrite of the log into one row per operation (same SUM). A
cold-start operation (absent or under ``min_n`` in the prior log) trains
silently — its first deliveries are never flagged, mirroring how the
near-dup gate admits first-seen content.

No SQL oracle (stateful streaming, SURVEY §2.2 class); covered by the
two-batch behavior test like the sessionizer and near-dup gates.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

DEFAULT_MIN_N = 30


def read_moment_log(
    spark,
    state_dir: str,
    key_cols: tuple,
    current_batch_id: int | None = None,
):
    """Compacted prior from a batch_id-partitioned moment log — the ONE
    implementation of the replay-purity rule shared by the anomaly and
    quality-drift gates: ``current_batch_id`` is EXCLUDED (an
    at-least-once replay already wrote the batch's own moments; a
    baseline polluted by the batch under test dilutes every z-score).

    Only spark.read sits inside the missing-path guard: a log that READS
    but lacks the batch_id partition column (e.g. hand-restored bare
    files) must RAISE, not silently re-train — the filter runs outside
    the try."""
    from pyspark.errors import AnalysisException

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    try:
        log = spark.read.parquet(state_dir)
    except AnalysisException:
        log = spark.createDataFrame(
            [],
            StructType(
                [StructField(c, StringType()) for c in key_cols]
                + [
                    StructField("n", LongType()),
                    StructField("s", DoubleType()),
                    StructField("ss", DoubleType()),
                    StructField("batch_id", LongType()),
                ]
            ),
        )
    if "batch_id" not in log.columns:
        # the docstring's promise must hold on EVERY path: without the
        # partition column, replay-idempotence (filter out the current
        # batch's own prior append) is impossible — a bare log silently
        # "working" here would double-count on the first replay, and
        # compact() (current_batch_id=None) would otherwise no-op the drop
        raise ValueError(
            f"moment log at {state_dir} lacks the batch_id partition "
            "column — not a log this gate wrote; refusing to score or "
            "compact it"
        )
    if current_batch_id is not None:
        log = log.filter(F.col("batch_id") != current_batch_id)
    log = log.drop("batch_id")
    return log.groupBy(*key_cols).agg(
        F.sum("n").alias("n"), F.sum("s").alias("s"), F.sum("ss").alias("ss")
    )


class AnomalyIngest:
    """foreachBatch z-score gate over an append-only moment log."""

    def __init__(
        self,
        state_dir: str,
        out_dir: str,
        z_threshold: float = 3.0,
        min_n: int = DEFAULT_MIN_N,
    ):
        self.state_dir = state_dir
        self.out_dir = out_dir
        self.z_threshold = z_threshold
        self.min_n = min_n

    def _prior(self, spark, current_batch_id: int | None = None) -> DataFrame:
        import os

        if not os.path.exists(self.state_dir) and os.path.exists(
            self.state_dir.rstrip("/") + ".old"
        ):
            raise RuntimeError(
                f"moment log {self.state_dir} missing but its .old sibling "
                "exists — a compaction swap was interrupted; restore "
                "manually instead of silently re-training"
            )
        return read_moment_log(
            spark,
            self.state_dir,
            ("servicename", "operationname"),
            current_batch_id,
        )

    def _batch_dir(self, root: str, batch_id: int) -> str:
        # partition-style naming: plain reads of the root see batch_id as a
        # partition column; a replayed batch OVERWRITES its own directory
        return f"{root.rstrip('/')}/batch_id={batch_id}"

    def _moments(self, spans: DataFrame) -> DataFrame:
        d = F.col("duration").cast("double")
        return spans.groupBy(
            F.lower("service_name").alias("servicename"),
            F.lower("operation_name").alias("operationname"),
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(d).alias("s"),
            F.sum(d * d).alias("ss"),
        )

    def process_batch(self, spans: DataFrame, batch_id: int) -> None:
        spark = spans.sparkSession
        prior = (
            self._prior(spark, batch_id)
            .filter(F.col("n") >= self.min_n)
            .withColumn("mu", F.col("s") / F.col("n"))
            .withColumn(
                "sigma",
                F.sqrt(F.col("ss") / F.col("n") - (F.col("s") / F.col("n")) ** 2),
            )
            .filter(F.col("sigma") > 0)
            .select("servicename", "operationname", "mu", "sigma")
        )
        scored = (
            spans.select(
                "trace_id",
                "span_id",
                F.lower("service_name").alias("servicename"),
                F.lower("operation_name").alias("operationname"),
                F.col("duration").cast("long").alias("duration"),
            )
            .join(F.broadcast(prior), ["servicename", "operationname"])
            .withColumn(
                "z", F.round((F.col("duration") - F.col("mu")) / F.col("sigma"), 6)
            )
            .filter(F.col("z") >= self.z_threshold)
            .select(
                "trace_id", "span_id", "servicename", "operationname",
                "duration", "z",
            )
        )
        scored.write.mode("overwrite").parquet(self._batch_dir(self.out_dir, batch_id))
        # record this batch's moments AFTER scoring — the batch never
        # contributes to its own baseline
        self._moments(spans).write.mode("overwrite").parquet(
            self._batch_dir(self.state_dir, batch_id)
        )

    def compact(self, spark) -> int:
        """Rewrite the moment log to ONE row per operation (same SUMs —
        the log is mergeable, so compaction is just the read-side
        aggregation made durable). OFFLINE maintenance only: run while the
        stream is stopped with its checkpoint committed — a batch replayed
        after compaction would re-add rows the compacted file already
        holds. Swap order is rename-old-aside → rename-staging-live →
        delete-aside; if a crash interrupts the window, _prior detects the
        orphaned .old sibling and refuses to silently re-train (on an
        object store this whole method is a Delta/Iceberg OPTIMIZE).
        Returns the compacted row count."""
        import os
        import shutil

        compacted = self._prior(spark)
        staging = self.state_dir.rstrip("/") + ".compact"
        shutil.rmtree(staging, ignore_errors=True)
        compacted.write.mode("overwrite").parquet(
            f"{staging}/batch_id=-1"
        )
        n = spark.read.parquet(staging).count()
        aside = self.state_dir.rstrip("/") + ".old"
        shutil.rmtree(aside, ignore_errors=True)
        # shutil.move, not os.rename: the staging/.old siblings are created
        # next to state_dir so this is normally an atomic same-fs rename,
        # but if the parent spans mounts (tmpfs state over a data volume)
        # rename raises EXDEV and the swap could never succeed — move
        # degrades to copy+delete and the .old guard still covers a crash
        # inside the widened window
        shutil.move(self.state_dir, aside)
        shutil.move(staging, self.state_dir)
        shutil.rmtree(aside)
        return n

    def start(self, source: DataFrame, checkpoint_dir: str, available_now: bool = True):
        writer = source.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
