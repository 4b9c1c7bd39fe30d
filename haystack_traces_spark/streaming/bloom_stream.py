"""Streaming Bloom ingest gate: EXACT-dup screening at arrival time
against a bounded position-set state.

No event-time face is needed here (VERDICT r8 ask #3): the position SET
is an order-insensitive union — any arrival order or replay batching of
the same rows converges to the same state; per-doc hit verdicts are
screening (probabilistic, re-checkable downstream), not provenance. The
provenance-bearing exact gate's event-time face is
neardup_stream.EventTimeExactDedup.

The exact first-seen gate (corpus_stream.dedup_gate) keys state by the
full content hash — state grows with distinct content. This gate keeps
the BLOOM POSITION SET instead: at most ``m`` rows, forever, however
much distinct content flows through. The price is the Bloom contract: a
hit is "probably seen" (false positives at the designed rate, measured
offline by the batch face `datapipe.dedup.bloom_probe`), a miss is
"definitely new". The two faces share `bloom_position_array`, so the
streaming filter IS the filter the batch audit sized.

Shape (foreachBatch + persisted position table, the merge-catalog
pattern shared with the near-dup band gate):

    per micro-batch:
      positions  = md5(text) -> k seeded hash60 probes mod m  (one scan)
      prior hits = batch positions JOIN position state        (hash join)
      batch firsts = min(doc_id) per position within batch    (map-side agg)
      verdict    = per doc: hit iff EVERY position is prior-held or
                   held by a lower-id doc in this batch
      state[batch_id]  = positions of ADMITTED (miss) docs, anti-joined
                         against PRIOR batches (overwrite per batch dir)
      out[batch_id]    = (doc_id, bloom_hit, n_pos, n_matched)

Within-batch semantics mirror sequential ingestion in doc_id order
(batch-first = min doc_id per position) — deterministic and
replay-stable, same rule as the near-dup gate's band holder. Replay
idempotence is structural: screening reads batch_id < current only, and
both writes are per-batch-dir OVERWRITES, so an at-least-once
redelivery reproduces the first run's files bit-for-bit instead of
appending contradictory verdicts.

State is bounded by ``m`` — the defining property: at 100 TB the state
table is STILL ≤ m rows and the screening join broadcasts it; nothing
in this gate scales with corpus size except the per-batch scan.

No SQL oracle (stateful streaming, SURVEY §2.2 class); covered by
two-batch + restart behavior tests, like the sessionizer and band gate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from haystack_traces_spark.datapipe.dedup import bloom_position_array
from haystack_traces_spark.datapipe.queries import BLOOM_K, BLOOM_M

#: Default geometry — IMPORTED from the batch audit's registry constants
#: so a re-sized filter (after an FP-rate study with bloom_probe) cannot
#: silently diverge between the offline measurement and the online gate.
DEFAULT_BLOOM_M = BLOOM_M
DEFAULT_BLOOM_K = BLOOM_K


def doc_positions(
    docs: DataFrame,
    m: int = DEFAULT_BLOOM_M,
    k: int = DEFAULT_BLOOM_K,
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, n_pos, pos): one row per distinct Bloom position of
    each doc's content key — the state/probe unit of the gate."""
    # NULL text keys as empty (md5(NULL) is NULL → explode would silently
    # DROP the doc from the gate; the gate must verdict every doc)
    key = F.md5(F.coalesce(F.col(text_col), F.lit("")))
    keyed = docs.select(
        "doc_id", bloom_position_array(key, m, k).alias("pos_arr")
    )
    return keyed.select(
        "doc_id",
        F.size("pos_arr").cast("long").alias("n_pos"),
        F.explode("pos_arr").alias("pos"),
    )


class BloomIngest:
    """foreachBatch Bloom gate over a persisted ≤m-row position table."""

    def __init__(
        self,
        state_dir: str,
        out_dir: str,
        m: int = DEFAULT_BLOOM_M,
        k: int = DEFAULT_BLOOM_K,
        text_col: str = "text",
    ):
        self.state_dir = state_dir
        self.out_dir = out_dir
        self.m = m
        self.k = k
        self.text_col = text_col

    def _state(self, spark, current_batch_id: int) -> DataFrame:
        # only a MISSING path means first run; any other read failure
        # (corrupt file, permissions) must propagate — silently resetting
        # state would re-admit previously-seen content. PRIOR deliveries
        # only: the batch_id partition filter makes an at-least-once
        # replay re-score against exactly the state the first run saw.
        from pyspark.errors import AnalysisException

        try:
            log = spark.read.parquet(self.state_dir)
        except AnalysisException:
            from pyspark.sql.types import LongType, StructField, StructType

            return spark.createDataFrame(
                [], StructType([StructField("pos", LongType())])
            )
        assert "batch_id" in log.columns, (
            f"{self.state_dir} is not a batch_id-partitioned position log"
        )
        return log.filter(F.col("batch_id") < current_batch_id).select("pos")

    def process_batch(self, docs: DataFrame, batch_id: int) -> None:
        spark = docs.sparkSession
        # distinct(): an at-least-once source can duplicate a (doc, text)
        # row WITHIN a batch — duplicated position rows would double
        # n_matched past n_pos and misreport a held doc as a miss
        pos = (
            doc_positions(docs, self.m, self.k, self.text_col)
            .distinct()
            .persist()
        )
        state = self._state(spark, batch_id).withColumn("in_state", F.lit(1))
        batch_first = pos.groupBy("pos").agg(
            F.min("doc_id").alias("batch_first")
        )
        joined = (
            pos.join(F.broadcast(state), "pos", "left")
            .join(batch_first, "pos")
            .select(
                "doc_id",
                "n_pos",
                "pos",
                (
                    F.col("in_state").isNotNull()
                    | (F.col("batch_first") < F.col("doc_id"))
                )
                .cast("long")
                .alias("held"),
            )
        )
        verdict = (
            joined.groupBy("doc_id", "n_pos")
            .agg(F.sum("held").cast("long").alias("n_matched"))
            .select(
                "doc_id",
                (F.col("n_matched") == F.col("n_pos")).alias("bloom_hit"),
                "n_pos",
                "n_matched",
            )
        )
        # batch_id-keyed overwrite dirs (the quality/anomaly-gate pattern):
        # an at-least-once replay rewrites the SAME verdict and state
        # files — screening above reads prior batches only, so the replay
        # reproduces the first run bit-for-bit instead of contradicting it
        verdict.write.mode("overwrite").parquet(
            f"{self.out_dir.rstrip('/')}/batch_id={batch_id}"
        )
        # admit: positions of miss docs not already held by a PRIOR batch
        # (the anti-join keeps the log a set across batches, so total log
        # size stays ≤ m rows)
        admitted = (
            pos.join(
                verdict.filter(~F.col("bloom_hit")).select("doc_id"),
                "doc_id",
            )
            .select("pos")
            .distinct()
            .join(state.select("pos"), "pos", "left_anti")
        )
        admitted.write.mode("overwrite").parquet(
            f"{self.state_dir.rstrip('/')}/batch_id={batch_id}"
        )
        pos.unpersist()

    def start(
        self, source: DataFrame, checkpoint_dir: str, available_now: bool = True
    ):
        writer = source.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
