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
      out   += spans with z >= threshold AND prior n >= min_n
      state += this batch's per-operation (n, Σd, Σd²) rows (append only —
               no state rewrite, no read-under-write hazard)

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

    def _prior(self, spark) -> DataFrame:
        # only a MISSING path means first run; any other read failure must
        # propagate — a silently reset state would re-train on the stream
        # head and suppress real anomalies (same rule as the near-dup gate)
        from pyspark.errors import AnalysisException

        try:
            log = spark.read.parquet(self.state_dir)
        except AnalysisException:
            from pyspark.sql.types import (
                DoubleType,
                LongType,
                StringType,
                StructField,
                StructType,
            )

            log = spark.createDataFrame(
                [],
                StructType(
                    [
                        StructField("servicename", StringType()),
                        StructField("operationname", StringType()),
                        StructField("n", LongType()),
                        StructField("s", DoubleType()),
                        StructField("ss", DoubleType()),
                    ]
                ),
            )
        return log.groupBy("servicename", "operationname").agg(
            F.sum("n").alias("n"), F.sum("s").alias("s"), F.sum("ss").alias("ss")
        )

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
            self._prior(spark)
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
            .withColumn("batch_id", F.lit(batch_id).cast("long"))
            .select(
                "trace_id", "span_id", "servicename", "operationname",
                "duration", "z", "batch_id",
            )
        )
        scored.write.mode("append").parquet(self.out_dir)
        # append this batch's moments AFTER scoring — the batch never
        # contributes to its own baseline
        self._moments(spans).write.mode("append").parquet(self.state_dir)

    def compact(self, spark) -> int:
        """Rewrite the moment log to ONE row per operation (same SUMs —
        the log is mergeable, so compaction is just the read-side
        aggregation made durable). Local-FS swap via a staging directory;
        on an object store this is the periodic offline rewrite job (or a
        Delta/Iceberg OPTIMIZE). Returns the compacted row count."""
        import os
        import shutil

        compacted = self._prior(spark)
        staging = self.state_dir.rstrip("/") + ".compact"
        compacted.write.mode("overwrite").parquet(staging)
        n = spark.read.parquet(staging).count()
        shutil.rmtree(self.state_dir, ignore_errors=True)
        os.rename(staging, self.state_dir)
        return n

    def start(self, source: DataFrame, checkpoint_dir: str, available_now: bool = True):
        writer = source.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
