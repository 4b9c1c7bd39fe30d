"""Streaming ingest topology (SURVEY.md §3.1 Spark shape).

Reference write path: Kafka 'proto-spans' → sessionize by traceId → fan-out
to trace store / search index / service catalog / optional Kafka re-publish
(indexer/.../StreamRunner.scala:56-69). Spark shape:

    readStream (kafka|files) → sessionize (applyInPandasWithState)
      → foreachBatch:
          append trace_store rows      (S3)
          append trace_index rows      (S4)
          merge  service_catalog       (S6)
          optional kafka span-buffer   (S5)

foreachBatch gives per-batch transactional appends + checkpoint-based
recovery — the reference's at-least-once offset math (T3) for free. The
whitelist config is re-read each batch (the reference's 60 s hot reload,
SURVEY §2.1 S9).
"""

from __future__ import annotations

import json
from pathlib import Path

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from haystack_traces_spark.config import DEFAULT_WHITELIST, WhitelistConfig
from haystack_traces_spark.operators.field_values import build_service_catalog
from haystack_traces_spark.operators.index import build_trace_index
from haystack_traces_spark.schemas import SPAN
from haystack_traces_spark.streaming.sessionize import (
    DEFAULT_WINDOW_MS,
    buffers_to_spans,
    sessionize,
)


def read_parquet_if_exists(spark: SparkSession, path: str) -> DataFrame | None:
    """`spark.read.parquet(path)`, returning None ONLY when the path does
    not exist yet (the legitimate first-batch state). Any other failure —
    corrupt footer, permission error, transient FS fault — re-raises:
    swallowing it would bypass guards like _check_index_layout and
    recreate exactly the silent mixed-state writes they exist to prevent
    (ADVICE r7)."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException as e:
        # PySpark 4.x renamed getErrorClass() -> getCondition() (the old
        # name is deprecated and slated for removal) — prefer the new
        # accessor, fall back to the old, then to string matching (ADVICE r8)
        if hasattr(e, "getCondition"):
            cls = e.getCondition()
        elif hasattr(e, "getErrorClass"):
            cls = e.getErrorClass()
        else:
            cls = None
        # PATH_NOT_FOUND: no dir yet. UNABLE_TO_INFER_SCHEMA: dir exists
        # but holds no parquet files (a zero-row first append writes only
        # _SUCCESS) — both are the empty-table state, nothing to guard.
        if cls in ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA") or any(
            m in str(e) for m in ("[PATH_NOT_FOUND]", "[UNABLE_TO_INFER_SCHEMA]")
        ):
            return None
        raise


#: the column contract of Spark's kafka source (what .format("kafka")
#: .load() yields) — the stub source reproduces it exactly so everything
#: downstream of the source swap is the SAME code path
KAFKA_WIRE_SCHEMA = (
    "key binary, value binary, topic string, partition int, offset long, "
    "timestamp timestamp, timestampType int"
)


def _decode_kafka_values(raw: DataFrame, value_format: str) -> DataFrame:
    """Shared S2 decode stage: kafka-wire rows → span rows.

    - ``proto`` (reference wire format, SpanDeserializer.scala:39-47):
      Arrow-batched decode via sources/proto.py; undecodable values skipped.
    - ``json``: dev/test payloads."""
    if value_format == "proto":
        from haystack_traces_spark.sources.proto import proto_to_spans_df

        return proto_to_spans_df(raw.select("value"))
    return raw.select(
        F.from_json(F.col("value").cast("string"), SPAN).alias("s")
    ).select("s.*")


def kafka_span_source(
    spark: SparkSession,
    brokers: str,
    topic: str = "proto-spans",
    value_format: str = "proto",
) -> DataFrame:
    """S1/S2: Kafka source → decoded span rows.

    The broker-facing half is exactly Spark's kafka connector options; the
    decode half is :func:`_decode_kafka_values`, shared with
    :func:`kafka_wire_stub_source` so the full post-source pipeline has an
    automated smoke without a broker (no broker OR kafka connector jar in
    the test container — test_kafka_span_source_requires_connector pins
    the env-block, test_kafka_wire_stub_* exercise the shared path)."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .load()
    )
    return _decode_kafka_values(raw, value_format)


def kafka_wire_stub_source(
    spark: SparkSession, path: str, value_format: str = "proto"
) -> DataFrame:
    """File-backed Kafka-API stub (VERDICT r4 #8): parquet files carrying
    the EXACT kafka source schema (:data:`KAFKA_WIRE_SCHEMA` — key/value
    binary, topic/partition/offset metadata) stream through the same
    decode stage as :func:`kafka_span_source`. Everything downstream of
    the ``.format("kafka")`` source swap — value decode, sessionize,
    foreachBatch fan-out — is the production code path; only the broker
    I/O itself stays env-blocked."""
    raw = spark.readStream.schema(KAFKA_WIRE_SCHEMA).parquet(path)
    return _decode_kafka_values(raw, value_format)


def file_span_source(spark: SparkSession, path: str) -> DataFrame:
    """Test/dev source: JSON span files appearing in a directory."""
    return spark.readStream.schema(SPAN).json(path)


def proto_file_span_source(spark: SparkSession, path: str) -> DataFrame:
    """Test/dev source with the KAFKA wire shape: parquet files carrying a
    binary ``value`` column of protobuf-encoded Spans — the same decode path
    as kafka_span_source(value_format='proto') without a broker."""
    from haystack_traces_spark.sources.proto import proto_to_spans_df

    raw = spark.readStream.schema("value binary").parquet(path)
    return proto_to_spans_df(raw)


class IngestTopology:
    def __init__(
        self,
        tables_dir: str,
        window_ms: int = DEFAULT_WINDOW_MS,
        max_spans: int | None = None,
        whitelist_path: str | None = None,
        global_span_budget: int | None = None,
        span_buffer_topic: str | None = None,
        span_buffer_brokers: str | None = None,
        span_buffer_dir: str | None = None,
        promote_whitelist: bool | tuple[str, ...] = False,
    ):
        self.tables_dir = tables_dir
        self.window_ms = window_ms
        # S4 index layout: write the promoted wl_<name> value unions
        # (build_trace_index docstring / SCALE.md §2) — compact_trace_index
        # preserves them, so the read path's fast dispatch works on
        # streamed tables too
        self.promote_whitelist = promote_whitelist
        self.max_spans = max_spans
        self.whitelist_path = whitelist_path
        # T2 full semantics: global spans-in-state cap divided across state
        # partitions (maxEntriesAllStores, indexer base.conf:7-8)
        self.global_span_budget = global_span_budget
        # S5 re-publish sink — gated on topic config exactly like the
        # reference (StreamRunner.scala:65-67 only builds the KafkaWriter
        # when the producer topic is configured). span_buffer_dir is the
        # broker-less stand-in: same (key, value) wire rows to parquet.
        self.span_buffer_topic = span_buffer_topic
        self.span_buffer_brokers = span_buffer_brokers
        self.span_buffer_dir = span_buffer_dir

    @staticmethod
    def _check_index_layout(
        spark: SparkSession, path: str, batch_cols: list[str]
    ) -> None:
        """Refuse to append a batch whose PROMOTED wl_<name> column set
        differs from the existing trace_index's. Promotion is a
        TABLE-level layout: parquet appends with a different top-level
        column set read back as NULL unions on the other rows, and the
        promoted search dispatch would silently drop those traces from
        every result (wrong answers, no error). Flipping
        promote_whitelist — or hot-reloading a whitelist that changes
        the promoted tag set — therefore requires a rebuild/backfill of
        the table, and this guard turns the silent-wrongness state into
        a loud write-time error. Footer-only schema read: O(one file).
        Only a genuinely-missing path skips the check (first batch);
        corrupt/unreadable tables re-raise rather than bypass it."""
        from haystack_traces_spark.operators.index import PROMOTED_PREFIX

        table = read_parquet_if_exists(spark, path)
        if table is None:
            return  # first batch: no table yet
        existing = table.columns
        have = {c for c in existing if c.startswith(PROMOTED_PREFIX)}
        want = {c for c in batch_cols if c.startswith(PROMOTED_PREFIX)}
        if have != want:
            raise ValueError(
                f"trace_index promoted-layout mismatch at {path}: table has "
                f"{sorted(have) or 'no promoted columns'}, batch would write "
                f"{sorted(want) or 'no promoted columns'} — promotion is a "
                "table-level layout; rebuild/backfill the index instead of "
                "appending mixed schemas (readers would silently drop the "
                "rows whose unions read back as NULL)"
            )

    def _load_whitelist(self) -> WhitelistConfig:
        """Re-read per micro-batch — the reference's hot reload (S9)."""
        if self.whitelist_path and Path(self.whitelist_path).exists():
            return WhitelistConfig.from_json(Path(self.whitelist_path).read_text())
        return DEFAULT_WHITELIST

    def process_batch(self, buffers: DataFrame, batch_id: int) -> None:
        """foreachBatch body: buffers → three table appends."""
        spark = buffers.sparkSession
        d = self.tables_dir
        buffers.persist()
        try:
            # S3: trace_store — one row per emitted buffer (late-data buffers
            # append additional rows for the same trace_id = T4 semantics)
            spans = buffers_to_spans(buffers, SPAN)
            store_rows = (
                spans.groupBy("trace_id")
                .agg(F.collect_list(F.struct(*[f.name for f in SPAN.fields])).alias("spans"))
                .withColumn("ingest_batch", F.lit(batch_id))
            )
            store_rows.write.mode("append").parquet(f"{d}/trace_store")

            # S4: trace_index rows for this batch's buffers
            idx = build_trace_index(
                spans,
                self._load_whitelist(),
                with_partition_cols=True,
                promote_whitelist=self.promote_whitelist,
            )
            self._check_index_layout(spark, f"{d}/trace_index", idx.columns)
            idx.repartition("dt", "hb").write.mode("append").partitionBy("dt", "hb").parquet(f"{d}/trace_index")

            # S6: service catalog merge (distinct new pairs only)
            fresh = build_service_catalog(spans)
            cat_path = f"{d}/service_catalog"
            existing = read_parquet_if_exists(spark, cat_path)
            if existing is not None:  # else first batch: no catalog yet
                fresh = fresh.join(
                    existing, ["servicename", "operationname"], "left_anti"
                )
            fresh.write.mode("append").parquet(cat_path)

            # S5: optional span-buffer re-publish — ONE message per emitted
            # buffer, keyed by trace_id, value = SpanBuffer proto
            # (KafkaWriter.scala:36-50 keying; a late buffer is a second
            # message for the same key, as in the reference)
            if self.span_buffer_topic or self.span_buffer_dir:
                from haystack_traces_spark.sources.proto import (
                    spans_df_to_buffer_proto,
                )

                per_buffer = buffers.select(
                    "trace_id",
                    F.transform(
                        "spans_json", lambda j: F.from_json(j, SPAN)
                    ).alias("spans"),
                )
                wire = spans_df_to_buffer_proto(per_buffer)
                if self.span_buffer_dir:
                    wire.write.mode("append").parquet(self.span_buffer_dir)
                else:
                    (
                        wire.write.format("kafka")
                        .option(
                            "kafka.bootstrap.servers", self.span_buffer_brokers
                        )
                        .option("topic", self.span_buffer_topic)
                        .save()
                    )
        finally:
            buffers.unpersist()

    def start(self, span_stream: DataFrame, checkpoint_dir: str, trigger_sec: int = 2):
        buffers = sessionize(
            span_stream, self.window_ms, self.max_spans, self.global_span_budget
        )
        return (
            buffers.writeStream.outputMode("append")
            .foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(processingTime=f"{trigger_sec} seconds")
            .start()
        )

    def start_backfill(
        self,
        span_stream: DataFrame,
        checkpoint_dir: str,
        watermark_delay: str = "1 hour",
    ):
        """DETERMINISTIC replay/backfill face of the topology (round 7):
        the event-time ANCHORED sessionizer (T1's window-from-first-seen
        rule on the EVENT clock, `sessionize_event_time`) feeds the
        identical foreachBatch fan-out as the live path — same sinks,
        same compaction story — but emission keys on the watermark, so
        the produced tables are a pure function of the corpus (pinned:
        `test_backfill_topology_reproduces_batch_build` — the compacted
        backfill index equals the batch build exactly). availableNow
        drains an at-rest corpus and stops; `run_backfill` below handles
        the final-watermark flush. Contract: `watermark_delay` must
        cover the source's event-time disorder (SCALE.md §6)."""
        from haystack_traces_spark.streaming.sessionize import (
            sessionize_event_time,
        )

        buffers = sessionize_event_time(
            span_stream,
            "start_time",
            key_col="trace_id",
            mode="anchored",
            horizon_us=self.window_ms * 1000,
            watermark_delay=watermark_delay,
        )
        # null-safe: a NULL trace_id (PERMISSIVE decode of a malformed
        # row) must flow to the sinks like the live path and the batch
        # build, not vanish into the NULL-comparison hole
        mapped = buffers.filter(
            ~F.col("trace_id").eqNullSafe(BACKFILL_FLUSH_TRACE_ID)
        ).select("trace_id", F.col("events_json").alias("spans_json"))
        return (
            mapped.writeStream.outputMode("append")
            .foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )


#: Reserved trace id of the watermark-flush sentinel run_backfill injects;
#: filtered out of every sink before process_batch (leading NUL cannot
#: collide with a real trace id from the decoders).
BACKFILL_FLUSH_TRACE_ID = "\x00backfill-flush"


def run_backfill(
    spark: SparkSession,
    src_dir: str,
    tables_dir: str,
    checkpoint_dir: str,
    window_ms: int = DEFAULT_WINDOW_MS,
    watermark_delay_sec: int | None = None,
    timeout_sec: int = 600,
    max_files_per_trigger: int | None = None,
    **topology_kwargs,
) -> "IngestTopology":
    """One-call deterministic backfill of an at-rest JSON span corpus:
    builds trace_store / trace_index / service_catalog through the full
    streaming topology with EVENT-time semantics, so a re-run over the
    same corpus writes the same tables (batching-invariance pinned in
    test_streaming.py).

    ``watermark_delay_sec=None`` (default) derives the delay from the
    CORPUS ITSELF: the files of an at-rest corpus stream in mtime order,
    not event-time order, so a span in a later batch can be arbitrarily
    older than an earlier batch's max — the delay must cover the whole
    corpus time span or the watermark late-drops real spans mid-backfill
    (state then holds everything until the flush, bounded by the corpus,
    exactly like the batch build it reproduces). Pass an explicit delay
    only when the source files are KNOWN time-ordered and state should
    stay bounded by that horizon. ``max_files_per_trigger`` bounds the
    per-batch file count for giant backfills.

    The final sessions only close when the watermark passes them; for
    at-rest data nothing would advance it past the last close. So the
    backfill is TWO sequential availableNow runs on one checkpoint:
    run 1 drains every data file (the watermark never exceeds
    corpus-max − delay ≤ corpus-min, so no real span can be
    late-dropped regardless of file order), then a flush sentinel far
    ahead of the corpus (max + window + 2·delay) lands in a side
    directory and run 2 picks it up — the watermark jumps past every
    pending close and Spark's run-another-batch logic fires all
    event-time timers before stopping. Injecting the sentinel only
    AFTER run 1 is what makes this safe: a sentinel visible in the
    first micro-batch would advance the watermark past the whole corpus
    and late-drop every later batch. The sentinel's reserved trace id
    is filtered (null-safely) before the sinks.

    Raises TimeoutError if a run has not drained within ``timeout_sec``
    (the query is stopped first — never returns while the sinks are
    still being appended to)."""
    batch = spark.read.schema(SPAN).json(src_dir)
    row = batch.agg(
        F.min("start_time").alias("lo"), F.max("start_time").alias("hi")
    ).first()
    topo = IngestTopology(tables_dir, window_ms=window_ms, **topology_kwargs)
    if row["hi"] is None:
        return topo  # empty corpus: nothing to backfill
    if watermark_delay_sec is None:
        # corpus time span + one window + 1 s margin, in whole seconds
        watermark_delay_sec = (
            int(row["hi"] - row["lo"]) // 1_000_000 + window_ms // 1000 + 1
        )
    flush_dir = Path(f"{checkpoint_dir}_flush")
    flush_dir.mkdir(parents=True, exist_ok=True)

    def source(path: str) -> DataFrame:
        reader = spark.readStream.schema(SPAN)
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        return reader.json(path)

    def drain(tag: str) -> None:
        stream = source(src_dir).unionByName(source(str(flush_dir)))
        q = topo.start_backfill(
            stream,
            checkpoint_dir,
            watermark_delay=f"{watermark_delay_sec} seconds",
        )
        if not q.awaitTermination(timeout_sec):
            q.stop()
            raise TimeoutError(
                f"backfill {tag} did not drain within {timeout_sec}s — "
                f"tables under {tables_dir} are PARTIAL; re-run with a "
                "larger timeout_sec (the checkpoint resumes where it "
                "stopped)"
            )

    drain("data run")
    flush_ts = (
        int(row["hi"]) + window_ms * 1000 + 2 * watermark_delay_sec * 1_000_000
    )
    sentinel = {
        "trace_id": BACKFILL_FLUSH_TRACE_ID,
        "span_id": "flush",
        "parent_span_id": "",
        "service_name": "",
        "operation_name": "",
        "start_time": flush_ts,
        "duration": 0,
        "tags": [],
        "logs": [],
    }
    tmp = flush_dir / "flush.json.tmp"
    tmp.write_text(json.dumps(sentinel) + "\n")
    tmp.rename(flush_dir / "flush.json")
    drain("flush run")
    return topo
