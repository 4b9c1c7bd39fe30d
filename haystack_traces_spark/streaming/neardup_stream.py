"""Streaming NEAR-duplicate gate: MinHash-LSH band state at arrival time.

The exact first-seen gate (corpus_stream.dedup_gate) admits a doc whose
text differs by one token; real feeds are full of such near-copies
(templated re-crawls, boilerplate edits), and running batch MinHash over
the whole corpus per delivery is O(corpus). This gate keeps the BAND
INDEX as state instead: per minhash band key, the first doc that ever
produced it. An arriving doc collides if ANY of its bands is already
held — by an earlier delivery or by a lower-id doc in the same batch —
which is exactly the batch LSH candidate rule, applied incrementally.

Shape (foreachBatch + persisted band table, the merge-catalog pattern):

    per micro-batch:
      band keys  = minhash signatures -> banded key strings   (one scan)
      prior hits = batch bands  JOIN  band-state table        (hash join)
      batch hits = min(doc_id) per band within the batch      (map-side agg)
      verdict    = per doc: near_dup = any hit; dup_of = min colliding first
      state     += bands of ADMITTED (non-dup) docs, anti-joined
      out       += (doc_id, near_dup, dup_of, n_bands_hit)

State grows with DISTINCT admitted content (bands of admitted docs only —
duplicates add nothing), partitioned by band key; at cluster scale the
band table is a bucketed/Delta table and the join is shuffle-free on the
band-key bucketing.

Precision note: the batch pipeline VERIFIES candidates with exact Jaccard
(datapipe.dedup.minhash_lsh_pairs); an arrival-time gate cannot afford to
re-read admitted text, so a band collision alone flags the doc and
``dup_of`` carries provenance for offline exact verification. Bands/rows
dial the false-flag rate exactly as they dial batch candidate volume.

No SQL oracle (stateful streaming, SURVEY §2.2 class); covered by the
two-batch + restart behavior tests, like the sessionizer.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from haystack_traces_spark.datapipe.dedup import (
    DEFAULT_BANDS,
    DEFAULT_MINHASH_SEEDS,
    minhash_signatures,
)


def band_keys(
    docs: DataFrame,
    n_seeds: int = DEFAULT_MINHASH_SEEDS,
    bands: int = DEFAULT_BANDS,
    n: int = 3,
) -> DataFrame:
    """→ (doc_id, band_key): one string key per (band, signature-slice) —
    the same banding as minhash_candidates, keyed for a state table."""
    sig = minhash_signatures(docs, n_seeds, n)
    rpb = n_seeds // bands
    keys = [
        F.concat_ws(
            ":",
            F.lit(str(b)),
            *[F.col(f"mh_{b * rpb + j}").cast("string") for j in range(rpb)],
        )
        for b in range(bands)
    ]
    return sig.select(
        "doc_id", F.explode(F.array(*keys)).alias("band_key")
    )


class NearDupIngest:
    """foreachBatch near-dup gate over a persisted band-state table."""

    def __init__(
        self,
        state_dir: str,
        out_dir: str,
        n_seeds: int = DEFAULT_MINHASH_SEEDS,
        bands: int = DEFAULT_BANDS,
        n: int = 3,
    ):
        self.state_dir = state_dir
        self.out_dir = out_dir
        self.n_seeds = n_seeds
        self.bands = bands
        self.n = n

    def _state(self, spark) -> DataFrame:
        # only a MISSING path means first run; any other read failure
        # (corrupt file, permissions) must propagate — silently resetting
        # state would re-admit previously-seen near-duplicates
        from pyspark.errors import AnalysisException

        try:
            return spark.read.parquet(self.state_dir)
        except AnalysisException:
            from pyspark.sql.types import (
                LongType,
                StringType,
                StructField,
                StructType,
            )

            return spark.createDataFrame(
                [],
                StructType(
                    [
                        StructField("band_key", StringType()),
                        StructField("first_doc_id", LongType()),
                    ]
                ),
            )

    def process_batch(self, docs: DataFrame, batch_id: int) -> None:
        spark = docs.sparkSession
        bands_df = band_keys(docs, self.n_seeds, self.bands, self.n).persist()
        state = self._state(spark)
        batch_first = bands_df.groupBy("band_key").agg(
            F.min("doc_id").alias("batch_first")
        )
        joined = (
            bands_df.join(state, "band_key", "left")
            .join(batch_first, "band_key")
            .select(
                "doc_id",
                "band_key",
                # colliding "first": a prior delivery's holder, or a
                # lower-id doc in this batch
                F.when(
                    F.col("first_doc_id").isNotNull(), F.col("first_doc_id")
                )
                .when(
                    F.col("batch_first") < F.col("doc_id"),
                    F.col("batch_first"),
                )
                .alias("hit"),
            )
        )
        verdict = joined.groupBy("doc_id").agg(
            F.max(F.col("hit").isNotNull()).alias("near_dup"),
            F.min("hit").alias("dup_of"),
            F.sum(F.col("hit").isNotNull().cast("long")).alias("n_bands_hit"),
        )
        # a doc with < n tokens has no shingles, hence no band rows and no
        # verdict aggregate — it must still be ADMITTED, not silently
        # dropped from the output stream (the exact md5 gate covers every
        # doc; this gate must too)
        verdict = (
            docs.select("doc_id")
            .join(verdict, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("near_dup", F.lit(False)).alias("near_dup"),
                "dup_of",
                F.coalesce("n_bands_hit", F.lit(0)).cast("long").alias("n_bands_hit"),
            )
        )
        verdict.write.mode("append").parquet(self.out_dir)
        # admit: bands of non-dup docs not already in state. state must be
        # fully materialized BEFORE overwrite reads-under-write — stage via
        # the verdict join then append (append never rewrites prior files)
        admitted = (
            joined.join(
                verdict.filter(~F.col("near_dup")).select("doc_id"), "doc_id"
            )
            .groupBy("band_key")
            .agg(F.min("doc_id").alias("first_doc_id"))
            .join(state.select("band_key"), "band_key", "left_anti")
        )
        admitted.write.mode("append").parquet(self.state_dir)
        bands_df.unpersist()

    def start(self, source: DataFrame, checkpoint_dir: str, available_now: bool = True):
        writer = source.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
