"""Streaming heavy-hitters gate: a Count-Min Sketch of arriving token
traffic, maintained as bounded mergeable state.

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
double-counting. State is ≤ depth×width rows per batch dir and ≤
depth×width after merge; compact by rewriting the SUM when dir count
grows (same lever as the anomaly gate's moment-log compaction).

No SQL oracle (stateful streaming, SURVEY §2.2 class); covered by
merge-invariance (2 batches ≡ batch face on the union), replay, and
writeStream E2E tests.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from haystack_traces_spark.datapipe.dedup import cms_cells
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
    tf = (
        docs.filter(F.col(text_col).isNotNull())
        .select(F.explode(F.split(F.lower(text_col), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return (
        tf.select("tf", F.explode(cms_cells("tok", depth, width)).alias("p"))
        .groupBy(F.col("p.r").alias("r"), F.col("p.c").alias("c"))
        .agg(F.sum("tf").cast("long").alias("n"))
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
        of the per-batch partials (≤ depth×width rows out)."""
        return (
            spark.read.parquet(self.state_dir)
            .groupBy("r", "c")
            .agg(F.sum("n").cast("long").alias("n"))
        )

    def estimates(self, spark: SparkSession, tokens: list[str]) -> DataFrame:
        """→ (token, cms_estimate): stream-lifetime count estimates for
        the probe ``tokens`` — min over the sketch rows' hashed cells
        (0 for a token whose cells were never touched: definitely
        unseen). Probe side is tiny and broadcasts."""
        probes = (
            spark.createDataFrame([(t,) for t in tokens], "token string")
            .select(
                "token",
                F.explode(
                    cms_cells("token", self.depth, self.width)
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
