"""Streaming heavy-hitters gate: a Count-Min Sketch of arriving token
traffic, maintained as bounded mergeable state.

No event-time face is needed here (VERDICT r8 ask #3): CMS cells are
commutative counter sums, so the merged sketch is ORDER-INSENSITIVE —
any arrival order or replay batching of the same rows yields the
identical merged state, with no provenance to anchor.

The exact token-frequency table grows with VOCABULARY; this gate keeps a
CMS instead — at most ``depth × width`` cells, forever, however much
distinct content flows through. Estimates only ever OVERESTIMATE (CMS
contract); the batch face `datapipe.queries.q_cms_estimate_quality`
measures the overestimate this exact geometry carries (shared
`dedup.cms_cells` derivation, the bloom_position_array contract for
counts), so the offline accuracy audit sizes the online sketch.

Shape (foreachBatch + batch_id-partitioned cell partials, the Bloom-gate
pattern):

    per micro-batch:
      cells[batch_id] = per-(r, c) token-occurrence counts of this
                        batch's docs (OVERWRITE of the batch's own dir)
    read side:
      merged sketch = SUM over all batch dirs per (r, c)   — CMS cells
                      are counters, so the merge is exact associative
                      addition (sketch mergeability is the whole point)
      estimate(tok) = min over r of merged[r, hash_r(tok)]

Replay idempotence is structural: the per-batch write is a pure function
of the batch's rows into its OWN overwritten directory — an
at-least-once redelivery reproduces the first run's files instead of
double-counting. State is ≤ depth×width rows per batch dir and ≤ depth×width after
merge; the DIRECTORY count grows per batch until :meth:`compact` folds
the log (offline-only, anomaly-gate swap semantics) — row bound per
read is always ≤ depth×width, file-count maintenance is the operator's
scheduled job.

No SQL oracle (stateful streaming, SURVEY §2.2 class); covered by
merge-invariance (2 batches ≡ batch face on the union), replay, and
writeStream E2E tests.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from haystack_traces_spark.datapipe.dedup import (
    cms_cell_counts,
    cms_cells,
    lower_token_counts,
)
from haystack_traces_spark.datapipe.queries import CMS_DEPTH, CMS_WIDTH

#: Geometry imported from the batch audit's registry constants — a
#: re-sized sketch cannot silently diverge between the offline accuracy
#: measurement and the online gate.
DEFAULT_CMS_DEPTH = CMS_DEPTH
DEFAULT_CMS_WIDTH = CMS_WIDTH


def batch_cell_counts(
    docs: DataFrame,
    depth: int = DEFAULT_CMS_DEPTH,
    width: int = DEFAULT_CMS_WIDTH,
    text_col: str = "text",
) -> DataFrame:
    """→ (r, c, n): this batch's CMS cell increments — token counts
    aggregated FIRST (combinable), then fanned out over the depth rows,
    so the sketch builds from the counted table, not occurrence rows."""
    # the SHARED tokenize+count and sketch-build steps (datapipe.dedup)
    # — both CMS faces run literally the same code, so the offline
    # accuracy audit cannot drift from the online sketch
    return cms_cell_counts(
        lower_token_counts(docs, text_col), depth, width
    )


class HeavyHittersIngest:
    """foreachBatch CMS accumulator + estimate reader."""

    def __init__(
        self,
        state_dir: str,
        depth: int = DEFAULT_CMS_DEPTH,
        width: int = DEFAULT_CMS_WIDTH,
        text_col: str = "text",
    ):
        self.state_dir = state_dir.rstrip("/")
        self.depth = depth
        self.width = width
        self.text_col = text_col

    def process_batch(self, docs: DataFrame, batch_id: int) -> None:
        (
            batch_cell_counts(docs, self.depth, self.width, self.text_col)
            .write.mode("overwrite")
            .parquet(f"{self.state_dir}/batch_id={batch_id}")
        )

    def merged_sketch(self, spark: SparkSession) -> DataFrame:
        """→ (r, c, n): the whole-stream sketch — exact associative SUM
        of the per-batch partials (≤ depth×width rows out). A missing
        state dir means NO batch has run yet: empty sketch (estimate 0 =
        definitely unseen), not an error — the BloomIngest._state
        missing-path contract. An interrupted compaction (state missing
        but its .old sibling present) must RAISE, not silently reset."""
        import os

        from pyspark.errors import AnalysisException
        from pyspark.sql.types import IntegerType, LongType, StructField, StructType

        if not os.path.exists(self.state_dir) and os.path.exists(
            self.state_dir + ".old"
        ):
            raise RuntimeError(
                f"CMS state {self.state_dir} missing but its .old sibling "
                "exists — a compaction swap was interrupted; restore "
                "manually instead of silently resetting the sketch"
            )
        try:
            log = spark.read.parquet(self.state_dir)
        except AnalysisException:
            log = spark.createDataFrame(
                [],
                StructType(
                    [
                        StructField("r", IntegerType()),
                        StructField("c", LongType()),
                        StructField("n", LongType()),
                    ]
                ),
            )
        return log.groupBy("r", "c").agg(F.sum("n").cast("long").alias("n"))

    def compact(self, spark: SparkSession) -> int:
        """Fold every batch dir into ONE (cell counters are mergeable, so
        compaction is the read-side SUM made durable). OFFLINE
        maintenance only — run while the stream is stopped with its
        checkpoint committed: a batch replayed after compaction would
        re-add counts the compacted file already holds (the anomaly
        gate's compact() contract, same rename-aside swap + interrupted-
        window detection). Returns the compacted row count."""
        import shutil

        compacted = self.merged_sketch(spark)
        staging = self.state_dir + ".compact"
        shutil.rmtree(staging, ignore_errors=True)
        compacted.write.mode("overwrite").parquet(f"{staging}/batch_id=-1")
        n = spark.read.parquet(staging).count()
        aside = self.state_dir + ".old"
        shutil.rmtree(aside, ignore_errors=True)
        shutil.move(self.state_dir, aside)
        shutil.move(staging, self.state_dir)
        shutil.rmtree(aside)
        return n

    def estimates(self, spark: SparkSession, tokens: list[str]) -> DataFrame:
        """→ (token, cms_estimate): stream-lifetime count estimates for
        the probe ``tokens`` — min over the sketch rows' hashed cells
        (0 for a token whose cells were never touched: definitely
        unseen). Probe side is tiny and broadcasts."""
        # probes lowercase to match the sketch's token normalization —
        # an as-given probe for 'Hot' would silently read collision noise
        probes = (
            spark.createDataFrame([(t,) for t in tokens], "token string")
            .select(
                "token",
                F.explode(
                    cms_cells(F.lower(F.col("token")), self.depth, self.width)
                ).alias("p"),
            )
            .select("token", "p.r", "p.c")
        )
        merged = self.merged_sketch(spark)
        return (
            F.broadcast(probes)
            .join(merged, ["r", "c"], "left")
            .groupBy("token")
            .agg(
                F.min(F.coalesce("n", F.lit(0)))
                .cast("long")
                .alias("cms_estimate")
            )
            .orderBy("token")
        )

    def start(self, source: DataFrame, checkpoint_dir: str,
              available_now: bool = True):
        writer = source.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
