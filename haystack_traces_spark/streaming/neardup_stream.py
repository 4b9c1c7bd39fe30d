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


# --------------------- event-time face (round 8, VERDICT r7 ask #7) ---------
#
# The arrival-time gate above assigns ``dup_of`` to whichever doc ARRIVED
# first — replaying the same corpus with different batching flips the
# provenance (exactly the property the trace sessionizer fixed with
# sessionize_event_time). The event-time face makes the verdict a pure
# function of the DATA: every doc carries an event timestamp ``ts``, a
# band's holder is the lexicographically smallest (ts, doc_id) that ever
# produced it, and a doc is a near-dup iff one of its bands has a STRICTLY
# earlier holder. Verdicts are emitted only when the gate's own event-time
# watermark (max seen ts − delay) passes the doc, so every earlier doc is
# already in the band log — any batching of the same rows yields identical
# output (pinned), and a backfill over the at-rest corpus equals the batch
# face EXACTLY (the run_backfill equivalence, pinned).
#
# Semantics trade vs the arrival gate: holders are mins over ALL docs (no
# admitted-only cascade), which is what makes the batch face one groupBy
# + join (order-free, SQL-oracle-able: the neardup_event_provenance
# registry entry) — the price is a band log that grows with all distinct
# bands, not just admitted docs' (compaction = min-holder per band; the
# log is band-keyed and mergeable, the same table a production gate would
# keep bucketed).

#: reserved sentinel doc id for run_neardup_backfill's flush tick — never
#: a real doc id (doc ids are non-negative in every corpus this reads)
BACKFILL_FLUSH_DOC_ID = -(1 << 60)


def event_time_verdicts(doc_rows: DataFrame, band_rows: DataFrame) -> DataFrame:
    """SHARED CORE (rule 19: the streaming gate and the batch/oracle face
    must use the same verdict arithmetic). → (doc_id, ts, near_dup,
    dup_of, n_bands_hit) from (doc_id, ts) docs and (doc_id, ts,
    band_key) band rows. Holder per band = min (ts, doc_id) struct; a
    band hits iff its holder is strictly earlier than the doc; dup_of is
    the earliest hitting holder's doc. Docs with no bands (short text)
    are admitted, never dropped.

    Scale shape: one band-keyed aggregate (map-side combinable min), one
    equi-join back on band_key, one doc-keyed rollup — no pair
    enumeration anywhere."""
    holder = band_rows.groupBy("band_key").agg(
        F.min(F.struct("ts", "doc_id")).alias("h")
    )
    hits = (
        band_rows.join(holder, "band_key")
        .filter(F.col("h") < F.struct(F.col("ts"), F.col("doc_id")))
        .groupBy("doc_id")
        .agg(
            F.min("h").alias("hmin"),
            F.count(F.lit(1)).cast("long").alias("n_bands_hit"),
        )
    )
    return doc_rows.join(hits, "doc_id", "left").select(
        "doc_id",
        "ts",
        F.col("hmin").isNotNull().alias("near_dup"),
        F.col("hmin.doc_id").alias("dup_of"),
        F.coalesce("n_bands_hit", F.lit(0)).cast("long").alias("n_bands_hit"),
    )


class EventTimeNearDup:
    """foreachBatch event-time near-dup gate over batch-keyed parquet logs.

    Input rows: (doc_id long, ts long, text string) — ``ts`` in the
    corpus's own event-time unit (comparisons only; the gate never does
    time arithmetic beyond the delay subtraction). Both state logs and
    the verdict output are ``batch_id=N`` OVERWRITE dirs and every read
    filters to prior/current batches, so an at-least-once replay rewrites
    the first run's files bit-for-bit (the bloom-gate idempotence
    pattern). Rows older than the watermark at arrival are late-dropped
    into ``<out_dir>/late`` — observable, never silently verdicted from
    an incomplete holder log."""

    def __init__(
        self,
        state_dir: str,
        out_dir: str,
        delay_us: int,
        n_seeds: int = DEFAULT_MINHASH_SEEDS,
        bands: int = DEFAULT_BANDS,
        n: int = 3,
    ):
        self.state_dir = state_dir.rstrip("/")
        self.out_dir = out_dir.rstrip("/")
        self.delay_us = int(delay_us)
        self.n_seeds = n_seeds
        self.bands = bands
        self.n = n

    def _log(self, spark, sub: str, schema: str, upto_incl: int) -> DataFrame:
        # only a MISSING/EMPTY path means empty; any other failure
        # propagates (a corrupt holder log must never silently reset
        # provenance — the same contract as the ingest layout guard)
        from haystack_traces_spark.streaming.ingest import (
            read_parquet_if_exists,
        )

        df = read_parquet_if_exists(spark, f"{self.state_dir}/{sub}")
        if df is None:
            return spark.createDataFrame([], schema + ", batch_id long")
        assert "batch_id" in df.columns, f"{self.state_dir}/{sub}: no batch_id"
        return df.filter(F.col("batch_id") <= upto_incl)

    def _band_rows(self, new: DataFrame) -> DataFrame:
        """(doc_id, ts, band_key) rows for a deduped new-doc batch — the
        ONE place collision keys are built (rule 19/21); the event-time
        exact-dedup gate overrides this with the content hash."""
        return band_keys(new, self.n_seeds, self.bands, self.n).join(
            new.select("doc_id", "ts"), "doc_id"
        )

    def process_batch(self, docs: DataFrame, batch_id: int) -> None:
        spark = docs.sparkSession
        prior_docs = self._log(
            spark, "docs", "doc_id long, ts long", batch_id - 1
        )
        # at-least-once sources can duplicate rows within a batch AND
        # across batches: dedupe in-batch, then drop docs already logged
        # by an earlier delivery (a cross-batch redelivery would
        # double-write band rows and emit a second verdict row)
        new = (
            docs.select("doc_id", "ts", "text")
            .dropDuplicates(["doc_id"])
            .join(prior_docs.select("doc_id"), "doc_id", "left_anti")
        )
        hi_prev = prior_docs.agg(F.max("ts")).first()[0]
        w_prev = None if hi_prev is None else hi_prev - self.delay_us
        if w_prev is not None:
            late = new.filter(F.col("ts") <= F.lit(w_prev))
            late.select("doc_id", "ts").write.mode("overwrite").parquet(
                f"{self.out_dir}/late/batch_id={batch_id}"
            )
            new = new.filter(F.col("ts") > F.lit(w_prev))
        new = new.persist()

        self._band_rows(new).select("doc_id", "ts", "band_key").write.mode(
            "overwrite"
        ).parquet(f"{self.state_dir}/bands/batch_id={batch_id}")
        new.select("doc_id", "ts").write.mode("overwrite").parquet(
            f"{self.state_dir}/docs/batch_id={batch_id}"
        )
        new.unpersist()

        all_docs = self._log(spark, "docs", "doc_id long, ts long", batch_id)
        hi = all_docs.agg(F.max("ts")).first()[0]
        if hi is None:
            return  # nothing seen yet
        w = hi - self.delay_us
        # emit docs the watermark just passed: ts <= W, minus docs already
        # emitted by an earlier batch (arrived before N and ts <= W_prev;
        # W is monotone, so that condition is exactly "emitted before")
        flush = all_docs.filter(F.col("ts") <= F.lit(w))
        if w_prev is not None:
            flush = flush.filter(
                ~((F.col("batch_id") < batch_id) & (F.col("ts") <= F.lit(w_prev)))
            )
        flush = flush.filter(F.col("doc_id") != BACKFILL_FLUSH_DOC_ID)
        flushed_bands = self._log(
            spark, "bands", "doc_id long, ts long, band_key string", batch_id
        ).filter(F.col("ts") <= F.lit(w))
        event_time_verdicts(
            flush.select("doc_id", "ts"), flushed_bands
        ).write.mode("overwrite").parquet(
            f"{self.out_dir}/verdicts/batch_id={batch_id}"
        )

    def start(self, source: DataFrame, checkpoint_dir: str, available_now: bool = True):
        writer = source.writeStream.foreachBatch(self.process_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def compact_state(self, spark) -> tuple[int, int]:
        """OFFLINE band-log compaction (the cms/anomaly-gate contract:
        stream stopped, checkpoint committed). Band rows at or below the
        current watermark collapse to ONE min-holder row per band —
        lossless for every future verdict, because a holder is a
        mergeable min: min(compacted-min ∪ later rows) is the true min,
        and already-emitted docs are never re-verdicted so their other
        rows carry no information. Rows above the watermark (pending
        docs) stay raw — they are both future holder candidates and the
        pending docs' own verdict-join rows. Both logs land in a single
        ``batch_id=-1`` dir (always "prior" to any future batch — the
        emitted-before rule stays exact: a compacted doc with
        ts ≤ W_prev was emitted pre-compact by the same rule). The swap
        is staged + rename-aside, so an interrupted compact leaves
        either the old state or a detectable ``.old`` remnant, never a
        mix. A crash in the swap window (live dir moved aside, staging
        not yet moved in) is detected at the START of the next
        compact_state and raises with the recovery step — restore by
        renaming ``<state>/bands.old`` (or ``docs.old``) back to the
        live name; never delete the .old remnant without restoring.
        → (band rows after, doc rows after)."""
        import os
        import shutil

        for sub in ("bands", "docs"):
            live = f"{self.state_dir}/{sub}"
            if not os.path.exists(live) and os.path.exists(live + ".old"):
                raise RuntimeError(
                    f"near-dup state {live} missing but its .old sibling "
                    "exists — a prior compact_state was interrupted in its "
                    f"swap window; recover by renaming {live}.old back to "
                    f"{live} (a leftover {live}.compact is incomplete and "
                    "can be deleted), then re-run compact_state"
                )

        bands = self._log(
            spark, "bands", "doc_id long, ts long, band_key string", 1 << 62
        )
        all_docs = self._log(spark, "docs", "doc_id long, ts long", 1 << 62)
        hi = all_docs.agg(F.max("ts")).first()[0]
        if hi is None:
            return 0, 0  # nothing to compact
        w = hi - self.delay_us
        flushed_min = (
            bands.filter(F.col("ts") <= F.lit(w))
            .groupBy("band_key")
            .agg(F.min(F.struct("ts", "doc_id")).alias("h"))
            .select(
                F.col("h.doc_id").alias("doc_id"),
                F.col("h.ts").alias("ts"),
                "band_key",
            )
        )
        pending = bands.filter(F.col("ts") > F.lit(w)).select(
            "doc_id", "ts", "band_key"
        )
        out = (flushed_min.unionByName(pending), all_docs.select("doc_id", "ts"))
        counts = []
        for sub, df in zip(("bands", "docs"), out):
            live = f"{self.state_dir}/{sub}"
            staging = live + ".compact"
            shutil.rmtree(staging, ignore_errors=True)
            df.write.mode("overwrite").parquet(f"{staging}/batch_id=-1")
            counts.append(spark.read.parquet(staging).count())
            aside = live + ".old"
            shutil.rmtree(aside, ignore_errors=True)
            shutil.move(live, aside)
            shutil.move(staging, live)
            shutil.rmtree(aside)
        return counts[0], counts[1]


class EventTimeExactDedup(EventTimeNearDup):
    """Event-time EXACT first-seen dedup — corpus_stream.dedup_gate's
    provenance made a pure function of the data (VERDICT r8 ask #3: the
    arrival-time gate assigns first_doc_id to whichever doc ARRIVED
    first, so replaying the same corpus with different batching flips
    it — the same defect the near-dup gate fixed in round 8).

    The collision key is the md5 content hash: each doc contributes
    exactly ONE "band", the band's holder min is the event-time-first
    occurrence of the content, and event_time_verdicts' near_dup /
    dup_of / n_bands_hit collapse to is-duplicate / first-seen-doc /
    0-or-1. Everything else — watermark arithmetic, batch-keyed
    replay-idempotent logs, late routing, cross-batch redelivery
    anti-join, compact_state — is inherited UNCHANGED from the near-dup
    gate (rule 19: one implementation of the event-time machinery).
    State after compaction is one row per distinct content hash at or
    below the watermark — the same bound as the arrival gate's
    per-hash state."""

    def __init__(self, state_dir: str, out_dir: str, delay_us: int):
        super().__init__(state_dir, out_dir, delay_us)

    def _band_rows(self, new: DataFrame) -> DataFrame:
        return new.select("doc_id", "ts", F.md5("text").alias("band_key"))


def read_verdicts(spark, out_dir: str) -> DataFrame:
    """All emitted verdicts across batches (each doc appears exactly
    once: the emission rule partitions docs across batches)."""
    return spark.read.parquet(f"{out_dir.rstrip('/')}/verdicts").drop("batch_id")


def run_neardup_backfill(
    spark,
    src_dir: str,
    state_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    delay_us: int | None = None,
    timeout_sec: float = 120.0,
    gate_cls: type = None,
    schema: str = "doc_id long, ts long, text string",
    **gate_kwargs,
):
    """Deterministic near-dup backfill of an at-rest (doc_id, ts, text)
    JSON corpus through the event-time gate — the corpus-gate analog of
    ingest.run_backfill, same two-run sentinel design: run 1 drains every
    data file with delay >= the corpus time span (files stream in mtime
    order, not event order, so nothing may late-drop mid-backfill), then
    a flush tick with ts far past the corpus lands in a side dir and
    run 2 advances the gate's watermark over every pending doc. The
    result equals event_time_verdicts over the whole corpus EXACTLY
    (pinned in test_streaming.py). ``gate_cls`` swaps the gate
    (EventTimeExactDedup for the exact-dedup backfill,
    EventTimeQualityDrift with a source column in ``schema`` for the
    quality backfill) — the sentinel / watermark mechanics are
    gate-independent, and the flush tick carries every ``schema`` column
    (extra JSON keys are ignored by schemas that omit them)."""
    import json as _json
    from pathlib import Path

    row = (
        spark.read.schema(schema)
        .json(src_dir)
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
        .first()
    )
    gate = (gate_cls or EventTimeNearDup)(state_dir, out_dir, 0, **gate_kwargs)
    if row["hi"] is None:
        return gate  # empty corpus
    if delay_us is None:
        delay_us = int(row["hi"] - row["lo"]) + 1
    gate.delay_us = int(delay_us)
    flush_dir = Path(f"{checkpoint_dir}_flush")
    flush_dir.mkdir(parents=True, exist_ok=True)

    def drain(tag: str) -> None:
        stream = (
            spark.readStream.schema(schema)
            .json(src_dir)
            .unionByName(spark.readStream.schema(schema).json(str(flush_dir)))
        )
        q = gate.start(stream, checkpoint_dir)
        if not q.awaitTermination(timeout_sec):
            q.stop()
            raise TimeoutError(
                f"near-dup backfill {tag} did not drain within {timeout_sec}s"
            )

    drain("data run")
    tick = {
        "doc_id": BACKFILL_FLUSH_DOC_ID,
        "ts": int(row["hi"]) + 2 * int(delay_us) + 1,
        "text": "",
        "source": "",
    }
    tmp = flush_dir / "flush.json.tmp"
    tmp.write_text(_json.dumps(tick) + "\n")
    tmp.rename(flush_dir / "flush.json")
    drain("flush run")
    return gate
