"""T1/T2/T4 sessionization tests: state function unit tests + a live
file-source streaming integration run (mirror of the reference's
MultipleTraceIndexing / PartialTraceIndexing / EvictedSpanBuffer specs)."""

from __future__ import annotations

import json
import time
from pathlib import Path

import pandas as pd
import pytest

from haystack_traces_spark.streaming.sessionize import (
    _pack_spans,
    _unpack_spans,
    make_session_fn,
)


class FakeState:
    """Minimal GroupState stand-in for unit-testing the session function."""

    def __init__(self, value=None, timed_out=False):
        self._value = value
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_ms = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        if self._value is None:
            raise ValueError("no state")
        return self._value

    def update(self, v):
        self._value = v

    def remove(self):
        self._value = None
        self.removed = True

    def setTimeoutDuration(self, ms):
        self.timeout_ms = ms


def _pdf(spans):
    return pd.DataFrame({"span_json": [json.dumps(s) for s in spans]})


def test_first_span_opens_buffer_with_anchored_timeout():
    fn = make_session_fn(window_ms=10_000)
    st = FakeState()
    out = list(fn(("t1",), iter([_pdf([{"a": 1}])]), st))
    assert st.timeout_ms == 10_000  # anchored at first-seen
    assert st.exists
    assert sum(len(p) for p in out) == 0  # nothing emitted yet


def test_subsequent_spans_rearm_remaining_window_only():
    """Anchored window: later spans re-arm with the REMAINING time, never a
    fresh full window (fixed-from-first-seen, not an inactivity gap)."""
    fn = make_session_fn(window_ms=10_000)
    now = int(time.time() * 1000)
    st = FakeState(value=(now - 4_000, _pack_spans(["x"])))  # opened 4s ago
    list(fn(("t1",), iter([_pdf([{"b": 2}])]), st))
    assert st.timeout_ms is not None and st.timeout_ms <= 6_100  # remaining, not 10s
    first_seen, packed = st.get
    assert first_seen == now - 4_000 and len(_unpack_spans(packed)) == 2


def test_span_after_expiry_emits_inclusive_buffer():
    """A span landing between window expiry and the sweep is appended, then
    the buffer emits (reference sweep-order semantics)."""
    fn = make_session_fn(window_ms=10_000)
    now = int(time.time() * 1000)
    st = FakeState(value=(now - 60_000, _pack_spans(["x"])))
    out = pd.concat(list(fn(("t1",), iter([_pdf([{"b": 2}])]), st)))
    assert len(out) == 1 and out.iloc[0]["n_spans"] == 2
    assert out.iloc[0]["emit_reason"] == "window"
    assert st.removed


def test_timeout_emits_buffer_and_clears_state():
    fn = make_session_fn(window_ms=10_000)
    st = FakeState(value=(123, _pack_spans(["x", "y"])), timed_out=True)
    out = pd.concat(list(fn(("t1",), iter([]), st)))
    assert st.removed
    assert len(out) == 1
    row = out.iloc[0]
    assert row["trace_id"] == "t1"
    assert row["n_spans"] == 2
    assert row["emit_reason"] == "window"
    assert row["first_seen_ms"] == 123


def test_overflow_force_emits():
    """T2 eviction-pressure analog (EvictedSpanBufferSpec: cap 1 ⇒
    single-span buffers)."""
    fn = make_session_fn(window_ms=10_000, max_spans=1)
    st = FakeState()
    out = pd.concat(list(fn(("t1",), iter([_pdf([{"a": 1}])]), st)))
    assert len(out) == 1 and out.iloc[0]["emit_reason"] == "overflow"
    assert not st.exists


def test_late_span_reopens_buffer():
    """T4: arrival after emission opens a NEW buffer."""
    fn = make_session_fn(window_ms=10_000)
    st = FakeState()  # state was cleared by earlier emission
    list(fn(("t1",), iter([_pdf([{"late": True}])]), st))
    assert st.exists and st.timeout_ms == 10_000


@pytest.mark.slow
def test_streaming_topology_end_to_end(spark, tmp_path):
    """Live run: file source → sessionize → foreachBatch table appends."""
    from haystack_traces_spark.streaming.ingest import IngestTopology, file_span_source
    from tests.fixtures import span, valid_single_root

    src = tmp_path / "src"
    tables = tmp_path / "tables"
    ckpt = tmp_path / "ckpt"
    src.mkdir()

    def write_file(name, spans):
        p = src / name
        tmp = src / (name + ".tmp")
        with open(tmp, "w") as f:
            for s in spans:
                f.write(json.dumps(s) + "\n")
        tmp.rename(p)

    write_file("f1.json", valid_single_root("stream_a") + valid_single_root("stream_b"))

    topo = IngestTopology(str(tables), window_ms=3000)
    q = topo.start(file_span_source(spark, str(src)), str(ckpt), trigger_sec=1)

    def store_rows():
        try:
            return spark.read.parquet(str(tables / "trace_store")).collect()
        except Exception:
            return []

    nudge_i = [0]

    def wait_for(pred, timeout=60):
        # processing-time timers only fire when a batch RUNS (the reference's
        # poll-driven sweep analog) — so every poll also writes an unrelated
        # nudge trace to guarantee traffic, else an idle source stalls the
        # timers forever and the wait deadlines under load
        deadline = time.time() + timeout
        while time.time() < deadline:
            if pred(store_rows()):
                return True
            time.sleep(2)
            nudge_i[0] += 1
            write_file(
                f"nudge{nudge_i[0]}.json", valid_single_root(f"nudge_{nudge_i[0]}")
            )
        return False

    try:
        time.sleep(4)
        assert wait_for(
            lambda rows: {"stream_a", "stream_b"}
            <= {r["trace_id"] for r in rows}
        ), f"first buffers never emitted: {[r['trace_id'] for r in store_rows()]}"

        # T4: a LATE span for stream_a after its buffer emitted → reopened
        # buffer → second store row
        write_file("late.json", [span(trace_id="stream_a", span_id="late", parent="root")])
        time.sleep(4)
        assert wait_for(
            lambda rows: len([r for r in rows if r["trace_id"] == "stream_a"]) >= 2
        ), "late-data re-emission (T4) did not produce a second row"
    finally:
        q.stop()

    rows = spark.read.parquet(str(tables / "trace_store")).collect()
    by_trace = {}
    for r in rows:
        by_trace.setdefault(r["trace_id"], []).append(r)
    assert {"stream_a", "stream_b"} <= set(by_trace)
    # T4: late span produced a SECOND store row for stream_a
    assert len(by_trace["stream_a"]) >= 2
    # index rows written with partition cols
    idx = spark.read.parquet(str(tables / "trace_index"))
    assert idx.count() >= 3
    cat = spark.read.parquet(str(tables / "service_catalog"))
    assert cat.count() >= 1


def test_streaming_topology_proto_wire_format(spark, tmp_path):
    """S1/S2 wire parity: binary proto values → decode → sessionize →
    trace_store, end to end (the Kafka path minus the broker)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from haystack_traces_spark.sources.proto import encode_span
    from haystack_traces_spark.streaming.ingest import (
        IngestTopology,
        proto_file_span_source,
    )
    from tests.fixtures import valid_single_root

    src = tmp_path / "src"
    tables = tmp_path / "tables"
    ckpt = tmp_path / "ckpt"
    src.mkdir()

    def write_proto_file(name, spans):
        tmp = src / (name + ".tmp")
        pq.write_table(
            pa.table({"value": [encode_span(s) for s in spans]}), tmp
        )
        tmp.rename(src / name)

    write_proto_file("p1.parquet", valid_single_root("proto_a"))

    topo = IngestTopology(str(tables), window_ms=3000)
    q = topo.start(proto_file_span_source(spark, str(src)), str(ckpt), trigger_sec=1)

    def store_rows():
        try:
            return spark.read.parquet(str(tables / "trace_store")).collect()
        except Exception:
            return []

    try:
        deadline = time.time() + 45
        seen = set()
        nudge = 0
        while time.time() < deadline:
            seen = {r["trace_id"] for r in store_rows()}
            if "proto_a" in seen:
                break
            time.sleep(3)
            nudge += 1
            write_proto_file(f"nudge{nudge}.parquet", valid_single_root(f"n{nudge}"))
        assert "proto_a" in seen, f"proto trace never emitted: {seen}"
        # decoded spans survive the round-trip with their ids intact
        row = [r for r in store_rows() if r["trace_id"] == "proto_a"][0]
        assert {s["span_id"] for s in row["spans"]} == {
            s["span_id"] for s in valid_single_root("proto_a")
        }
    finally:
        q.stop()


def test_streaming_restart_from_checkpoint(spark, tmp_path):
    """T3: stop the topology and restart against the SAME checkpoint — the
    stream resumes (new data lands) and already-committed traces are not
    reprocessed into duplicates (FailedTopologyRecoverySpec mirror)."""
    from haystack_traces_spark.streaming.ingest import IngestTopology, file_span_source
    from tests.fixtures import valid_single_root

    src = tmp_path / "src"
    tables = tmp_path / "tables"
    ckpt = tmp_path / "ckpt"
    src.mkdir()

    def write_file(name, spans):
        tmp = src / (name + ".tmp")
        with open(tmp, "w") as f:
            for s in spans:
                f.write(json.dumps(s) + "\n")
        tmp.rename(src / name)

    def store_rows():
        try:
            return spark.read.parquet(str(tables / "trace_store")).collect()
        except Exception:
            return []

    def wait_for_trace(tid, timeout=45, nudge_prefix="n"):
        deadline = time.time() + timeout
        i = 0
        while time.time() < deadline:
            if tid in {r["trace_id"] for r in store_rows()}:
                return True
            time.sleep(3)
            i += 1
            write_file(f"{nudge_prefix}{i}.json", valid_single_root(f"{nudge_prefix}_{i}"))
        return False

    topo = IngestTopology(str(tables), window_ms=2000)

    write_file("a.json", valid_single_root("ckpt_a"))
    q = topo.start(file_span_source(spark, str(src)), str(ckpt), trigger_sec=1)
    try:
        assert wait_for_trace("ckpt_a", nudge_prefix="p")
    finally:
        q.stop()

    rows_before = len([r for r in store_rows() if r["trace_id"] == "ckpt_a"])

    # restart from the same checkpoint; feed a NEW trace
    write_file("b.json", valid_single_root("ckpt_b"))
    q2 = topo.start(file_span_source(spark, str(src)), str(ckpt), trigger_sec=1)
    try:
        assert wait_for_trace("ckpt_b", nudge_prefix="q")
    finally:
        q2.stop()

    # T3 contract: at-least-once. A batch in flight at stop() may replay on
    # restart (the reference explicitly tolerates duplicate buffers,
    # indexer/README.md:18-20) — so the first trace must still be present,
    # bounded by one replayed emission, never silently lost.
    rows_after = len([r for r in store_rows() if r["trace_id"] == "ckpt_a"])
    assert rows_before <= rows_after <= rows_before + 1


def test_streaming_span_buffer_sink_round_trip(spark, tmp_path):
    """S5: with the span-buffer sink configured, every emitted buffer is
    re-published as (trace_id key, packed SpanBuffer proto value) — mirrored
    here to parquet (no broker in the container). The bytes must round-trip
    through sources/proto.py decode with span ids intact
    (KafkaWriter.scala:36-50 keying, gated like StreamRunner.scala:65-67)."""
    from haystack_traces_spark.sources.proto import decode_span_buffer
    from haystack_traces_spark.streaming.ingest import IngestTopology, file_span_source
    from tests.fixtures import valid_single_root

    src = tmp_path / "src"
    tables = tmp_path / "tables"
    ckpt = tmp_path / "ckpt"
    buf_dir = tmp_path / "span_buffer"
    src.mkdir()

    def write_file(name, spans):
        tmp = src / (name + ".tmp")
        with open(tmp, "w") as f:
            for s in spans:
                f.write(json.dumps(s) + "\n")
        tmp.rename(src / name)

    def wire_rows():
        try:
            return spark.read.parquet(str(buf_dir)).collect()
        except Exception:
            return []

    write_file("a.json", valid_single_root("buf_a"))
    topo = IngestTopology(
        str(tables), window_ms=2000, span_buffer_dir=str(buf_dir)
    )
    q = topo.start(file_span_source(spark, str(src)), str(ckpt), trigger_sec=1)
    try:
        deadline = time.time() + 45
        i = 0
        while time.time() < deadline:
            if any(r["key"] == "buf_a" for r in wire_rows()):
                break
            time.sleep(3)
            i += 1
            write_file(f"n{i}.json", valid_single_root(f"nudge_{i}"))
        rows = wire_rows()
        assert any(r["key"] == "buf_a" for r in rows), (
            f"span-buffer message never published: {[r['key'] for r in rows]}"
        )
    finally:
        q.stop()

    msg = [r for r in wire_rows() if r["key"] == "buf_a"][0]
    trace_id, spans = decode_span_buffer(bytes(msg["value"]))
    assert trace_id == "buf_a"
    assert {s["span_id"] for s in spans} == {
        s["span_id"] for s in valid_single_root("buf_a")
    }
    assert all(s["trace_id"] == "buf_a" for s in spans)


def test_span_buffer_sink_not_wired_without_topic(spark, tmp_path):
    """Gating parity: no topic/dir configured → no sink output path even
    after batches run (StreamRunner.scala:65-67)."""
    from haystack_traces_spark.streaming.ingest import IngestTopology

    topo = IngestTopology(str(tmp_path / "tables"), window_ms=2000)
    assert topo.span_buffer_topic is None and topo.span_buffer_dir is None


def test_budget_evicts_partial_buffer_under_pressure():
    """T2 global-budget unit semantics (EvictedSpanBufferSpec cap=1 mirror):
    with a 1-span partition budget, the first buffer occupies the budget and
    every further insert force-emits as an 'evicted' partial instead of
    growing state."""
    from haystack_traces_spark.streaming.sessionize import reset_budget_tracker

    reset_budget_tracker()
    fn = make_session_fn(window_ms=600_000, partition_span_budget=1)

    st1 = FakeState()
    out1 = list(fn(("t1",), iter([_pdf([{"a": 1}])]), st1))
    assert st1.exists  # first buffer fits the budget exactly
    assert sum(len(p) for p in out1) == 0

    st2 = FakeState()
    out2 = pd.concat(list(fn(("t2",), iter([_pdf([{"b": 2}])]), st2)))
    assert not st2.exists
    assert len(out2) == 1
    assert out2.iloc[0]["emit_reason"] == "evicted"
    assert out2.iloc[0]["n_spans"] == 1  # partial single-span emission

    # emission releases budget: after t1's window fires, new keys fit again
    st1.hasTimedOut = True
    pd.concat(list(fn(("t1",), iter([]), st1)))
    st3 = FakeState()
    list(fn(("t3",), iter([_pdf([{"c": 3}])]), st3))
    assert st3.exists
    reset_budget_tracker()


def test_budget_accounts_growth_of_existing_key():
    """Appending to an existing buffer charges only the increment; eviction
    of that key refunds its full footprint."""
    from haystack_traces_spark.streaming.sessionize import (
        _PARTITION_SPANS,
        reset_budget_tracker,
    )

    reset_budget_tracker()
    fn = make_session_fn(window_ms=600_000, partition_span_budget=3)
    st = FakeState()
    list(fn(("t1",), iter([_pdf([{"a": 1}])]), st))
    list(fn(("t1",), iter([_pdf([{"b": 2}])]), st))
    assert _PARTITION_SPANS.get(-1) == 2  # one key, two spans — not double-counted
    # third span for the same key would total 3 == budget: still fits
    list(fn(("t1",), iter([_pdf([{"c": 3}])]), st))
    assert st.exists and _PARTITION_SPANS.get(-1) == 3
    # a second key now cannot fit: evicted, tracker unchanged
    st2 = FakeState()
    out = pd.concat(list(fn(("t2",), iter([_pdf([{"d": 4}])]), st2)))
    assert out.iloc[0]["emit_reason"] == "evicted"
    assert _PARTITION_SPANS.get(-1) == 3
    reset_budget_tracker()


@pytest.mark.slow
def test_streaming_budget_forces_emission_live(spark, tmp_path):
    """Live T2: with a tiny global budget and a huge window, buffers can ONLY
    reach the store via forced partial emission — rows appearing in
    trace_store prove the budget path fires under real streaming."""
    from haystack_traces_spark.streaming.ingest import IngestTopology, file_span_source
    from tests.fixtures import valid_single_root

    src = tmp_path / "src"
    tables = tmp_path / "tables"
    ckpt = tmp_path / "ckpt"
    src.mkdir()

    def write_file(name, spans):
        tmp = src / (name + ".tmp")
        with open(tmp, "w") as f:
            for s in spans:
                f.write(json.dumps(s) + "\n")
        tmp.rename(src / name)

    def store_traces():
        try:
            return {
                r["trace_id"]
                for r in spark.read.parquet(str(tables / "trace_store")).collect()
            }
        except Exception:
            return set()

    # window far beyond the test horizon: only eviction can emit
    topo = IngestTopology(str(tables), window_ms=600_000, global_span_budget=1)
    write_file("a.json", valid_single_root("bgt_a"))
    q = topo.start(file_span_source(spark, str(src)), str(ckpt), trigger_sec=1)
    try:
        deadline = time.time() + 45
        i = 0
        while time.time() < deadline:
            if store_traces():
                break
            time.sleep(3)
            i += 1
            write_file(f"n{i}.json", valid_single_root(f"bgt_n{i}"))
        assert store_traces(), "budget pressure never forced an emission"
    finally:
        q.stop()


def test_state_packing_round_trips_and_compresses():
    import json as _json

    spans = [
        _json.dumps({"trace_id": "t", "span_id": str(i), "service_name": "svc",
                     "operation_name": "op", "start_time": 1000 + i, "duration": 5})
        for i in range(100)
    ]
    packed = _pack_spans(spans)
    assert _unpack_spans(packed) == spans
    assert _unpack_spans(None) == []
    assert len(packed) * 3 < sum(len(s) for s in spans)  # ≥3x smaller


def test_corpus_dedup_gate_flags_and_survives_restart(spark, tmp_path):
    """Streaming corpus ingest: the content-hash gate admits first-seen
    docs, flags repeats with provenance (first_doc_id), rejects junk on the
    quality gate — and the seen-set SURVIVES a query restart (checkpointed
    state), so a duplicate arriving in a later delivery is still caught."""
    from haystack_traces_spark.streaming.corpus_stream import (
        CorpusIngestTopology,
        file_doc_source,
    )

    src = tmp_path / "docs_src"
    out = tmp_path / "gated"
    ckpt = tmp_path / "ckpt"
    src.mkdir()

    def write_docs(name, docs):
        tmp = src / (name + ".tmp")
        with open(tmp, "w") as f:
            for d in docs:
                f.write(json.dumps(d) + "\n")
        tmp.rename(src / name)

    def gated_rows():
        try:
            return {r["doc_id"]: r for r in spark.read.parquet(str(out)).collect()}
        except Exception:
            return {}

    topo = CorpusIngestTopology(str(out), min_tokens=3)
    body = "a genuinely long enough document body"

    # delivery 1: two distinct docs + one too short for the quality gate
    write_docs(
        "d1.json",
        [
            {"doc_id": 1, "text": body, "lang": "en", "source": "s1"},
            {"doc_id": 2, "text": "another distinct document body", "lang": "en", "source": "s1"},
            {"doc_id": 3, "text": "short", "lang": "en", "source": "s1"},
        ],
    )
    q = topo.start(file_doc_source(spark, str(src)), str(ckpt))
    q.awaitTermination(120)
    rows = gated_rows()
    assert set(rows) == {1, 2}, rows  # 3 rejected by quality gate
    assert not rows[1]["is_duplicate"] and not rows[2]["is_duplicate"]

    # delivery 2 AFTER restart: a byte-identical repeat of doc 1 + a new doc
    write_docs(
        "d2.json",
        [
            {"doc_id": 10, "text": body, "lang": "en", "source": "s2"},
            {"doc_id": 11, "text": "a fresh never seen document", "lang": "en", "source": "s2"},
        ],
    )
    q2 = topo.start(file_doc_source(spark, str(src)), str(ckpt))
    q2.awaitTermination(120)
    rows = gated_rows()
    assert set(rows) == {1, 2, 10, 11}
    assert rows[10]["is_duplicate"] and rows[10]["first_doc_id"] == 1
    assert rows[10]["source"] == "s2"  # provenance of the REPEAT, not the original
    assert not rows[11]["is_duplicate"]


def test_corpus_dedup_fn_unit():
    """Direct unit test of the gate function: first-seen vs repeats inside
    one batch, and accumulation across calls via injected state."""
    import pandas as pd

    from haystack_traces_spark.streaming.corpus_stream import make_dedup_fn

    class FakeState:
        def __init__(self):
            self._v = None
            self.hasTimedOut = False

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

        def remove(self):
            self._v = None

        def setTimeoutDuration(self, ms):
            self.timeout_set = ms

    fn = make_dedup_fn()
    st = FakeState()
    batch = pd.DataFrame(
        {"doc_id": [7, 5], "source": ["a", "b"], "n_tokens": [4, 4]}
    )
    [out] = list(fn(("h",), iter([batch]), st))
    # lowest doc_id in the batch is first-seen; the other is a duplicate
    assert out.loc[out.doc_id == 5, "is_duplicate"].item() is False
    assert out.loc[out.doc_id == 7, "is_duplicate"].item() is True
    assert (out.first_doc_id == 5).all()
    assert st.get == (5, 2)

    batch2 = pd.DataFrame({"doc_id": [9], "source": ["c"], "n_tokens": [4]})
    [out2] = list(fn(("h",), iter([batch2]), st))
    assert out2.is_duplicate.item() is True and out2.first_doc_id.item() == 5
    assert st.get == (5, 3)


def test_service_metrics_watermark_finalizes_and_drops_late(spark, tmp_path):
    """Event-time windowed metrics (streaming/metrics.py): a window row is
    emitted exactly once when the watermark passes its end, and a span
    arriving LATER than the watermark is dropped — never mutating the
    finalized row (the opposite trade from the sessionizer's T4 re-emit,
    by design). Watermark state survives the checkpointed restart."""
    from haystack_traces_spark.streaming.ingest import file_span_source
    from haystack_traces_spark.streaming.metrics import start_metrics_sink
    from tests.fixtures import T0, span

    MIN = 60_000_000  # one minute in micros
    src = tmp_path / "src"
    out = tmp_path / "metrics"
    ckpt = tmp_path / "ckpt"
    src.mkdir()

    def write_spans(name, spans):
        tmp = src / (name + ".tmp")
        with open(tmp, "w") as f:
            for s in spans:
                f.write(json.dumps(s) + "\n")
        tmp.rename(src / name)

    def metric_rows():
        try:
            return spark.read.parquet(str(out)).collect()
        except Exception:
            return []

    def run_once():
        q = start_metrics_sink(
            file_span_source(spark, str(src)), str(out), str(ckpt),
            window_duration="1 minute", watermark_delay="1 minute",
        )
        q.awaitTermination(120)

    # run 1: two spans in minute 0, one in minute 3 (advances the watermark
    # to 02:00 → minute-0 window finalizes; minute-3 stays in flight)
    write_spans(
        "w1.json",
        [
            span(trace_id="m1", span_id="a", start=T0 + 5, duration=100),
            span(trace_id="m1", span_id="b", start=T0 + 10, duration=300),
            span(trace_id="m2", span_id="c", start=T0 + 3 * MIN + 5, duration=50),
        ],
    )
    run_once()
    rows = metric_rows()
    assert {r["window_start"] for r in rows} == {T0}, rows
    [w0] = [r for r in rows if r["service_name"] == "svc_a"]
    assert w0["n_spans"] == 2 and w0["total_duration"] == 400
    assert w0["max_duration"] == 300 and w0["avg_duration"] == 200.0

    # run 2 (restart): a LATE span for minute 0 (behind the checkpointed
    # watermark → dropped) + a minute-6 span (finalizes minute 3)
    write_spans(
        "w2.json",
        [
            span(trace_id="m3", span_id="late", start=T0 + 30, duration=999),
            span(trace_id="m4", span_id="d", start=T0 + 6 * MIN, duration=70),
        ],
    )
    run_once()
    rows = metric_rows()
    assert {r["window_start"] for r in rows} == {T0, T0 + 3 * MIN}, rows
    w0_rows = [r for r in rows if r["window_start"] == T0]
    assert len(w0_rows) == 1 and w0_rows[0]["n_spans"] == 2  # late span dropped
    [w3] = [r for r in rows if r["window_start"] == T0 + 3 * MIN]
    assert w3["n_spans"] == 1 and w3["total_duration"] == 50


def test_neardup_gate_flags_near_copies_across_batches(spark, tmp_path):
    """The MinHash band-state gate flags NEAR-copies (one token changed)
    within a batch and across deliveries, names the original via dup_of,
    and only admitted docs' bands enter state (a dup adds nothing)."""
    from haystack_traces_spark.streaming.neardup_stream import NearDupIngest

    state = tmp_path / "band_state"
    out = tmp_path / "verdicts"
    base = " ".join(f"w{i}" for i in range(40))
    gate = NearDupIngest(str(state), str(out))

    # batch 1: original + in-batch near-copy + unrelated
    b1 = spark.createDataFrame(
        [
            (1, base),
            (2, base.replace("w20", "x20")),
            (3, " ".join(f"zz{i}" for i in range(40))),
        ],
        "doc_id long, text string",
    )
    gate.process_batch(b1, 0)
    rows = {r["doc_id"]: r for r in spark.read.parquet(str(out)).collect()}
    assert not rows[1]["near_dup"] and not rows[3]["near_dup"]
    assert rows[2]["near_dup"] and rows[2]["dup_of"] == 1

    # batch 2: near-copy of the batch-1 original + fresh doc
    b2 = spark.createDataFrame(
        [
            (10, base.replace("w30", "y30")),
            (11, " ".join(f"qq{i}" for i in range(40))),
        ],
        "doc_id long, text string",
    )
    gate.process_batch(b2, 1)
    rows = {r["doc_id"]: r for r in spark.read.parquet(str(out)).collect()}
    assert rows[10]["near_dup"] and rows[10]["dup_of"] == 1
    assert not rows[11]["near_dup"]
    # state holds only admitted docs' bands: dup docs 2/10 contributed none
    firsts = {
        r["first_doc_id"]
        for r in spark.read.parquet(str(state)).collect()
    }
    assert firsts <= {1, 3, 11}, firsts


def _evt_corpus():
    base = " ".join(f"w{i}" for i in range(40))
    return [
        # d5 has the EARLIEST event time but arrives LAST in some
        # layouts: event-time provenance must still name it the holder
        {"doc_id": 5, "ts": 500, "text": base.replace("w10", "v10")},
        {"doc_id": 1, "ts": 1000, "text": base},
        {"doc_id": 3, "ts": 1500, "text": " ".join(f"zz{i}" for i in range(40))},
        {"doc_id": 2, "ts": 2000, "text": base.replace("w20", "x20")},
        {"doc_id": 4, "ts": 3000, "text": "a b"},  # bandless short doc
    ]


def _evt_batch_face(spark, recs):
    from haystack_traces_spark.streaming.neardup_stream import (
        band_keys,
        event_time_verdicts,
    )

    docs = spark.createDataFrame(
        [(r["doc_id"], r["ts"], r["text"]) for r in recs],
        "doc_id long, ts long, text string",
    )
    doc_rows = docs.select("doc_id", "ts")
    bands = band_keys(docs).join(doc_rows, "doc_id")
    return sorted(
        tuple(r) for r in event_time_verdicts(doc_rows, bands).collect()
    )


def test_neardup_event_backfill_equals_batch(spark, tmp_path):
    """run_neardup_backfill over an at-rest corpus (files NOT in event
    order — the mtime-vs-event-time hazard run_backfill documents)
    produces EXACTLY the shared-core batch verdicts: deterministic
    dup_of provenance pointing at the earliest (ts, doc_id) holder, the
    bandless doc admitted, the flush tick absent from the output."""
    import json

    from haystack_traces_spark.streaming.neardup_stream import (
        read_verdicts,
        run_neardup_backfill,
    )

    recs = _evt_corpus()
    src = tmp_path / "src"
    src.mkdir()
    # three files, deliberately out of event-time order
    for i, chunk in enumerate([recs[3:4], recs[0:2], recs[2:3] + recs[4:]]):
        with open(src / f"part{i}.json", "w") as f:
            for r in chunk:
                f.write(json.dumps(r) + "\n")
    run_neardup_backfill(
        spark, str(src), str(tmp_path / "state"), str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    got = sorted(
        tuple(r) for r in read_verdicts(spark, str(tmp_path / "out")).collect()
    )
    want = _evt_batch_face(spark, recs)
    assert got == want
    by_id = {r[0]: r for r in got}
    # earliest-holder provenance: d1 and d2 are near-copies of d5 (the
    # earliest ts), so BOTH name 5 — an arrival-order gate would have
    # named whichever copy arrived first
    assert by_id[5][2] is False
    assert by_id[1][2] is True and by_id[1][3] == 5
    assert by_id[2][2] is True and by_id[2][3] == 5
    assert by_id[3][2] is False and by_id[4][2] is False  # bandless admitted
    assert set(by_id) == {1, 2, 3, 4, 5}  # no flush tick in the output


def test_exact_dedup_event_backfill_equals_batch(spark, tmp_path):
    """EventTimeExactDedup (VERDICT r8 ask #3): the exact first-seen
    gate's event-time face, backfilled over an at-rest corpus whose
    files are NOT in event order, equals the shared-core batch face
    (dedup_event_provenance) EXACTLY — first-seen provenance is the
    event-time-earliest (ts, doc_id) holder of the content hash, which
    arrival order cannot flip; ts ties break on doc_id."""
    import json

    import pyspark.sql.functions as F

    from haystack_traces_spark.streaming.neardup_stream import (
        EventTimeExactDedup,
        event_time_verdicts,
        read_verdicts,
        run_neardup_backfill,
    )

    recs = [
        {"doc_id": 5, "ts": 1_000, "text": "alpha beta gamma"},
        {"doc_id": 1, "ts": 5_000, "text": "alpha beta gamma"},
        {"doc_id": 2, "ts": 3_000, "text": "alpha beta gamma"},
        {"doc_id": 3, "ts": 2_000, "text": "unique content here"},
        {"doc_id": 6, "ts": 1_500, "text": "tied content"},
        {"doc_id": 7, "ts": 1_500, "text": "tied content"},
    ]
    src = tmp_path / "src"
    src.mkdir()
    # three files, deliberately out of event-time order
    for i, chunk in enumerate([recs[1:3], recs[0:1], recs[3:]]):
        with open(src / f"part{i}.json", "w") as f:
            for r in chunk:
                f.write(json.dumps(r) + "\n")
    run_neardup_backfill(
        spark, str(src), str(tmp_path / "state"), str(tmp_path / "out"),
        str(tmp_path / "ckpt"), gate_cls=EventTimeExactDedup,
    )
    got = sorted(
        tuple(r) for r in read_verdicts(spark, str(tmp_path / "out")).collect()
    )
    docs = spark.createDataFrame(
        [(r["doc_id"], r["ts"], r["text"]) for r in recs],
        "doc_id long, ts long, text string",
    )
    doc_rows = docs.select("doc_id", "ts")
    bands = docs.select("doc_id", F.md5("text").alias("band_key")).join(
        doc_rows, "doc_id"
    )
    want = sorted(
        tuple(r) for r in event_time_verdicts(doc_rows, bands).collect()
    )
    assert got == want
    by_id = {r[0]: r for r in got}
    # earliest-holder provenance: both copies name doc 5, not whichever
    # copy a replay happened to deliver first
    assert by_id[1][2] is True and by_id[1][3] == 5
    assert by_id[2][2] is True and by_id[2][3] == 5
    assert by_id[5][2] is False and by_id[3][2] is False
    # ts tie breaks on doc_id: 6 holds, 7 duplicates
    assert by_id[6][2] is False
    assert by_id[7][2] is True and by_id[7][3] == 6
    assert set(by_id) == {1, 2, 3, 5, 6, 7}  # no flush tick in the output


def test_neardup_event_gate_batching_invariant_and_late_drop(spark, tmp_path):
    """The same corpus pushed through EventTimeNearDup under different
    micro-batch layouts emits IDENTICAL verdict rows (the determinism
    contract the arrival-time gate cannot have); a row older than the
    watermark at arrival is routed to the late dir, never verdicted."""
    from haystack_traces_spark.streaming.neardup_stream import (
        EventTimeNearDup,
        read_verdicts,
    )

    recs = _evt_corpus()
    tick = [{"doc_id": -(1 << 60), "ts": 10_000_000, "text": ""}]

    def run(tag, layouts):
        gate = EventTimeNearDup(
            str(tmp_path / f"state_{tag}"), str(tmp_path / f"out_{tag}"),
            delay_us=100_000,
        )
        for i, chunk in enumerate(layouts):
            gate.process_batch(
                spark.createDataFrame(
                    [(r["doc_id"], r["ts"], r["text"]) for r in chunk],
                    "doc_id long, ts long, text string",
                ),
                i,
            )
        return sorted(
            tuple(r)
            for r in read_verdicts(spark, str(tmp_path / f"out_{tag}")).collect()
        )

    one = run("one", [recs, tick])
    scrambled = run("scr", [recs[3:], recs[:3], tick])
    assert one == scrambled == _evt_batch_face(spark, recs)

    # cross-batch redelivery: the same doc (ts above the watermark at
    # first arrival) delivered again in a later batch must NOT produce a
    # second docs/bands log row or a second verdict
    gate_r = EventTimeNearDup(
        str(tmp_path / "state_r"), str(tmp_path / "out_r"), delay_us=100_000,
    )
    d7 = [(7, 5_000, " ".join(f"w{i}" for i in range(40)))]
    gate_r.process_batch(
        spark.createDataFrame(d7, "doc_id long, ts long, text string"), 0
    )
    gate_r.process_batch(  # redelivery of the SAME doc
        spark.createDataFrame(d7, "doc_id long, ts long, text string"), 1
    )
    gate_r.process_batch(
        spark.createDataFrame(
            [(-(1 << 60), 10_000_000, "")], "doc_id long, ts long, text string"
        ),
        2,
    )
    vr = read_verdicts(spark, str(tmp_path / "out_r")).collect()
    assert [(r["doc_id"], r["near_dup"], r["n_bands_hit"]) for r in vr] == [
        (7, False, 0)
    ]
    docs_log = spark.read.parquet(str(tmp_path / "state_r" / "docs"))
    assert docs_log.filter("doc_id = 7").count() == 1

    # late drop: watermark after the tick is 10_000_000 - 100_000; a doc
    # arriving below it lands in late/, and the verdict table is unchanged
    gate = EventTimeNearDup(
        str(tmp_path / "state_one"), str(tmp_path / "out_one"),
        delay_us=100_000,
    )
    gate.process_batch(
        spark.createDataFrame(
            [(99, 1200, "late doc text")], "doc_id long, ts long, text string"
        ),
        2,
    )
    late = spark.read.parquet(str(tmp_path / "out_one" / "late"))
    assert [(r["doc_id"], r["ts"]) for r in late.collect()] == [(99, 1200)]
    assert sorted(
        tuple(r) for r in read_verdicts(spark, str(tmp_path / "out_one")).collect()
    ) == one


def test_neardup_event_gate_compaction_preserves_verdicts(spark, tmp_path):
    """Offline band-log compaction mid-stream is LOSSLESS: two gates see
    identical batches, one compacts between deliveries; their final
    verdict tables are identical, the compacted band log holds one
    min-holder row per flushed band, and an arriving doc can still
    collide with a holder known only through the compacted row."""
    from haystack_traces_spark.streaming.neardup_stream import (
        EventTimeNearDup,
        read_verdicts,
    )

    base = " ".join(f"w{i}" for i in range(40))
    b0 = [
        (1, 1_000, base),
        (3, 1_500, " ".join(f"zz{i}" for i in range(40))),
        (9, 400_000, base.replace("w5", "p5")),  # pending at compact time
    ]
    b1 = [(2, 350_000, base.replace("w20", "x20"))]  # near-copy of doc 1
    tick = [(-(1 << 60), 10_000_000, "")]
    schema = "doc_id long, ts long, text string"

    def run(tag, compact_after_0):
        gate = EventTimeNearDup(
            str(tmp_path / f"st_{tag}"), str(tmp_path / f"o_{tag}"),
            delay_us=200_000,
        )
        gate.process_batch(spark.createDataFrame(b0, schema), 0)
        if compact_after_0:
            nb, nd = gate.compact_state(spark)
            assert nd == 3
            # doc 1 + doc 3 are flushed (ts <= W = 400k-200k): their bands
            # collapse to min-holder rows; doc 9's rows stay raw
            bands = spark.read.parquet(str(tmp_path / f"st_{tag}" / "bands"))
            flushed = bands.filter("ts <= 200000")
            assert flushed.count() == flushed.select("band_key").distinct().count()
        gate.process_batch(spark.createDataFrame(b1, schema), 1)
        gate.process_batch(spark.createDataFrame(tick, schema), 2)
        return sorted(
            tuple(r)
            for r in read_verdicts(spark, str(tmp_path / f"o_{tag}")).collect()
        )

    plain = run("plain", False)
    compacted = run("comp", True)
    assert plain == compacted
    by_id = {r[0]: r for r in compacted}
    # doc 2 collides with doc 1 purely via compacted holder rows
    assert by_id[2][2] is True and by_id[2][3] == 1
    assert set(by_id) == {1, 2, 3, 9}


def test_neardup_event_gate_interrupted_compact_detected(spark, tmp_path):
    """ADVICE r8: compact_state's two-move swap has a crash window where
    the live state dir is moved aside but staging is not yet moved in.
    The next compact_state must DETECT the leftover .old remnant and
    raise with the recovery step, not rebuild from a missing log."""
    import shutil

    import pytest

    from haystack_traces_spark.streaming.neardup_stream import EventTimeNearDup

    gate = EventTimeNearDup(
        str(tmp_path / "state"), str(tmp_path / "out"), delay_us=100_000
    )
    gate.process_batch(
        spark.createDataFrame(
            [(1, 1_000, " ".join(f"w{i}" for i in range(40)))],
            "doc_id long, ts long, text string",
        ),
        0,
    )
    # simulate the crash window: bands moved aside, staging never landed
    shutil.move(str(tmp_path / "state" / "bands"), str(tmp_path / "state" / "bands.old"))
    with pytest.raises(RuntimeError, match="interrupted .* renaming"):
        gate.compact_state(spark)
    # recovery per the message restores normal operation
    shutil.move(str(tmp_path / "state" / "bands.old"), str(tmp_path / "state" / "bands"))
    nb, nd = gate.compact_state(spark)
    assert nd == 1


def test_neardup_gate_admits_bandless_short_docs(spark, tmp_path):
    """ADVICE r3: a doc with fewer tokens than the shingle width produces
    no band rows — it must still be ADMITTED with an explicit verdict row,
    not silently vanish from the output stream."""
    from haystack_traces_spark.streaming.neardup_stream import NearDupIngest

    gate = NearDupIngest(str(tmp_path / "state"), str(tmp_path / "out"))
    batch = spark.createDataFrame(
        [(1, "hi"), (2, " ".join(f"w{i}" for i in range(40)))],
        "doc_id long, text string",
    )
    gate.process_batch(batch, 0)
    rows = {r["doc_id"]: r for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert set(rows) == {1, 2}
    assert not rows[1]["near_dup"] and rows[1]["n_bands_hit"] == 0
    assert rows[1]["dup_of"] is None


def test_neardup_gate_corrupt_state_propagates(spark, tmp_path):
    """ADVICE r3: a corrupt band-state file must RAISE, not silently reset
    state (which would re-admit previously-seen near-duplicates). Only a
    missing path means first run."""
    import pytest

    from haystack_traces_spark.streaming.neardup_stream import NearDupIngest

    state = tmp_path / "state"
    state.mkdir()
    (state / "part-00000.parquet").write_bytes(b"this is not parquet")
    gate = NearDupIngest(str(state), str(tmp_path / "out"))
    batch = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(40)))], "doc_id long, text string"
    )
    with pytest.raises(Exception) as ei:
        gate.process_batch(batch, 0)
    # the real read error surfaces (SparkException via py4j), and it is NOT
    # the AnalysisException first-run path that resets state
    assert type(ei.value).__name__ != "AnalysisException"
    # silent reset would have written a verdict — nothing may exist
    assert not (tmp_path / "out").exists()


def test_streaming_anomaly_gate_scores_against_prior_batches_only(spark, tmp_path):
    """Batch 1 trains (no prior state -> nothing flagged, even an extreme
    value); batch 2's outlier is flagged against batch 1's population;
    batch 2's normal spans are not; batch 2's own outlier never poisons
    the baseline it is judged by."""
    from haystack_traces_spark.streaming.anomaly_stream import AnomalyIngest

    gate = AnomalyIngest(
        str(tmp_path / "moments"), str(tmp_path / "anomalies"), 3.0, min_n=30
    )
    schema = (
        "trace_id string, span_id string, service_name string, "
        "operation_name string, duration long"
    )
    b1 = spark.createDataFrame(
        [("t%d" % i, "s%d" % i, "svc", "op", 100 + (i % 5)) for i in range(40)]
        + [("tBig", "sBig", "svc", "op", 50_000)],  # extreme but UNTRAINED
        schema,
    )
    gate.process_batch(b1, 0)
    out1 = spark.read.parquet(str(tmp_path / "anomalies"))
    assert out1.count() == 0  # nothing flagged on a cold state

    b2 = spark.createDataFrame(
        [("u%d" % i, "r%d" % i, "svc", "op", 101 + (i % 5)) for i in range(10)]
        + [("uX", "rX", "svc", "op", 60_000)],
        schema,
    )
    gate.process_batch(b2, 1)
    flagged = spark.read.parquet(str(tmp_path / "anomalies")).collect()
    # batch-1's 50_000 value inflates the prior sigma to ~7.7k around a
    # ~1.3k mean, so only a far-out value clears z >= 3 — 60_000 does
    # (z ~ 7.6), the batch's normal spans do not
    assert [r["span_id"] for r in flagged] == ["rX"]
    assert flagged[0]["batch_id"] == 1 and flagged[0]["z"] >= 3.0


def test_streaming_anomaly_gate_corrupt_state_propagates(spark, tmp_path):
    """A corrupt (non-parquet) moment log must raise, not silently retrain."""
    from haystack_traces_spark.streaming.anomaly_stream import AnomalyIngest

    state = tmp_path / "moments"
    state.mkdir()
    (state / "part-00000.parquet").write_bytes(b"not parquet")
    gate = AnomalyIngest(str(state), str(tmp_path / "out"))
    batch = spark.createDataFrame(
        [("t", "s", "svc", "op", 100)],
        "trace_id string, span_id string, service_name string, "
        "operation_name string, duration long",
    )
    with pytest.raises(Exception):
        gate.process_batch(batch, 0)


def test_streaming_anomaly_gate_compaction_preserves_baseline(spark, tmp_path):
    """Compacting the moment log to one row per operation must not change
    any subsequent verdict — the log is mergeable, compaction is just the
    read-side SUM made durable."""
    from haystack_traces_spark.streaming.anomaly_stream import AnomalyIngest

    schema = (
        "trace_id string, span_id string, service_name string, "
        "operation_name string, duration long"
    )

    def batches(gate):
        for b in range(3):
            gate.process_batch(
                spark.createDataFrame(
                    [
                        ("t%d_%d" % (b, i), "s%d_%d" % (b, i), "svc", "op",
                         100 + ((b * 17 + i) % 7))
                        for i in range(20)
                    ],
                    schema,
                ),
                b,
            )

    gate_a = AnomalyIngest(str(tmp_path / "ma"), str(tmp_path / "oa"), 3.0, min_n=30)
    gate_b = AnomalyIngest(str(tmp_path / "mb"), str(tmp_path / "ob"), 3.0, min_n=30)
    batches(gate_a)
    batches(gate_b)
    n = gate_b.compact(spark)
    assert n == 1  # one operation
    probe = spark.createDataFrame([("tX", "sX", "svc", "op", 9_999)], schema)
    gate_a.process_batch(probe, 3)
    gate_b.process_batch(probe, 3)
    za = {r["span_id"]: r["z"] for r in spark.read.parquet(str(tmp_path / "oa")).collect()}
    zb = {r["span_id"]: r["z"] for r in spark.read.parquet(str(tmp_path / "ob")).collect()}
    assert za == zb and "sX" in za


def test_streaming_latency_histogram_bounds_and_merge_invariance(spark, tmp_path):
    """The histogram percentile estimate must bracket the true percentile
    (true <= est < 2*true, the log2-bucket bound), and feeding the same
    spans as one batch or split across two must give IDENTICAL estimates
    (the state is mergeable by construction)."""
    import math

    from haystack_traces_spark.streaming.latency_stream import (
        LatencyHistogramIngest,
    )

    schema = (
        "trace_id string, span_id string, service_name string, "
        "operation_name string, duration long"
    )
    durs = [int(100 * (1.07 ** i)) for i in range(100)]  # 100 .. ~86k us
    rows = [("t%d" % i, "s%d" % i, "svc", "op", d) for i, d in enumerate(durs)]

    one = LatencyHistogramIngest(str(tmp_path / "h1"))
    one.process_batch(spark.createDataFrame(rows, schema), 0)
    two = LatencyHistogramIngest(str(tmp_path / "h2"))
    two.process_batch(spark.createDataFrame(rows[:37], schema), 0)
    two.process_batch(spark.createDataFrame(rows[37:], schema), 1)

    est1 = {r["q"]: r["est_us"] for r in one.percentiles(spark).collect()}
    est2 = {r["q"]: r["est_us"] for r in two.percentiles(spark).collect()}
    assert est1 == est2  # merge invariance

    sd = sorted(durs)
    for q, est in est1.items():
        true = sd[min(len(sd) - 1, math.ceil(q * len(sd)) - 1)]
        assert true <= est < 2 * true, (q, true, est)


def test_streaming_gates_are_replay_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: reprocessing the SAME batch id must
    not double-count state in either the anomaly moment log or the
    latency histogram."""
    from haystack_traces_spark.streaming.anomaly_stream import AnomalyIngest
    from haystack_traces_spark.streaming.latency_stream import (
        LatencyHistogramIngest,
    )

    schema = (
        "trace_id string, span_id string, service_name string, "
        "operation_name string, duration long"
    )
    batch = spark.createDataFrame(
        [("t%d" % i, "s%d" % i, "svc", "op", 100 + i) for i in range(40)], schema
    )
    gate = AnomalyIngest(str(tmp_path / "m"), str(tmp_path / "o"), 3.0, min_n=30)
    gate.process_batch(batch, 0)
    gate.process_batch(batch, 0)  # replay
    prior = gate._prior(spark).collect()
    assert len(prior) == 1 and prior[0]["n"] == 40  # not 80

    hist = LatencyHistogramIngest(str(tmp_path / "h"))
    hist.process_batch(batch, 0)
    hist.process_batch(batch, 0)  # replay
    total = sum(r["n"] for r in hist._hist(spark).collect())
    assert total == 40


def test_streaming_anomaly_gate_interrupted_compaction_detected(spark, tmp_path):
    """state_dir missing while its .old sibling exists = a compaction swap
    died mid-window; the gate must refuse to silently re-train."""
    from haystack_traces_spark.streaming.anomaly_stream import AnomalyIngest

    (tmp_path / "m.old").mkdir()
    gate = AnomalyIngest(str(tmp_path / "m"), str(tmp_path / "o"))
    batch = spark.createDataFrame(
        [("t", "s", "svc", "op", 100)],
        "trace_id string, span_id string, service_name string, "
        "operation_name string, duration long",
    )
    with pytest.raises(RuntimeError, match="compaction swap"):
        gate.process_batch(batch, 0)


def test_streaming_quality_drift_flags_degraded_source(spark, tmp_path):
    """A source whose quality distribution collapses must be flagged
    against its prior deliveries; a healthy same-distribution source must
    not; batch 1 (cold state) emits no verdicts at all."""
    from haystack_traces_spark.streaming.quality_stream import QualityDriftIngest

    good = "the cat sat on the mat and the dog is in the house of a king"
    bad = "#### 404 404 #### !!! 000 ### ... ### !!! 404 404 000 111 222"

    mon = QualityDriftIngest(
        str(tmp_path / "qs"), str(tmp_path / "qo"), 3.0, min_n=30
    )
    b1 = spark.createDataFrame(
        [(i, good + (" extra" * (i % 3)), "web") for i in range(40)],
        "doc_id long, text string, source string",
    )
    mon.process_batch(b1, 0)
    assert spark.read.parquet(str(tmp_path / "qo")).count() == 0

    # healthy batch, same distribution: verdict row, NOT drifted
    b2 = spark.createDataFrame(
        [(100 + i, good + (" extra" * (i % 3)), "web") for i in range(20)],
        "doc_id long, text string, source string",
    )
    mon.process_batch(b2, 1)
    r2 = [r for r in spark.read.parquet(str(tmp_path / "qo")).collect()
          if r["batch_id"] == 1]
    assert len(r2) == 1 and not r2[0]["drifted"]

    # degraded batch: flagged, downward
    b3 = spark.createDataFrame(
        [(300 + i, bad, "web") for i in range(20)],
        "doc_id long, text string, source string",
    )
    mon.process_batch(b3, 2)
    r3 = [r for r in spark.read.parquet(str(tmp_path / "qo")).collect()
          if r["batch_id"] == 2]
    assert len(r3) == 1 and r3[0]["drifted"] and r3[0]["z"] < 0


def test_streaming_drift_and_anomaly_replay_verdicts_identical(spark, tmp_path):
    """At-least-once replay: re-running a batch AFTER its first attempt
    already wrote state must produce the IDENTICAL verdict — the prior
    excludes the batch's own moments, so a real alert can't dilute into
    not-drifted / not-anomalous on replay."""
    from haystack_traces_spark.streaming.anomaly_stream import AnomalyIngest
    from haystack_traces_spark.streaming.quality_stream import QualityDriftIngest

    good = "the cat sat on the mat and the dog is in the house of a king"
    bad = "#### 404 404 #### !!! 000 ### ... ### !!! 404 404 000 111 222"
    dschema = "doc_id long, text string, source string"
    mon = QualityDriftIngest(str(tmp_path / "qs"), str(tmp_path / "qo"), 3.0, min_n=30)
    mon.process_batch(
        spark.createDataFrame(
            [(i, good + (" x" * (i % 3)), "web") for i in range(40)], dschema
        ),
        0,
    )
    degraded = spark.createDataFrame(
        [(100 + i, bad, "web") for i in range(20)], dschema
    )
    mon.process_batch(degraded, 1)
    v1 = {r["source"]: (r["z"], r["drifted"])
          for r in spark.read.parquet(str(tmp_path / "qo")).collect()
          if r["batch_id"] == 1}
    mon.process_batch(degraded, 1)  # replay after state write
    v2 = {r["source"]: (r["z"], r["drifted"])
          for r in spark.read.parquet(str(tmp_path / "qo")).collect()
          if r["batch_id"] == 1}
    assert v1 == v2 and v1["web"][1] and v1["web"][0] < 0

    sschema = (
        "trace_id string, span_id string, service_name string, "
        "operation_name string, duration long"
    )
    gate = AnomalyIngest(str(tmp_path / "am"), str(tmp_path / "ao"), 3.0, min_n=30)
    gate.process_batch(
        spark.createDataFrame(
            [("t%d" % i, "s%d" % i, "svc", "op", 100 + (i % 5)) for i in range(40)],
            sschema,
        ),
        0,
    )
    outlier = spark.createDataFrame(
        [("uX", "rX", "svc", "op", 60_000)], sschema
    )
    gate.process_batch(outlier, 1)
    z1 = {r["span_id"]: r["z"]
          for r in spark.read.parquet(str(tmp_path / "ao")).collect()}
    gate.process_batch(outlier, 1)  # replay
    z2 = {r["span_id"]: r["z"]
          for r in spark.read.parquet(str(tmp_path / "ao")).collect()}
    # exactly the outlier — if the batch baselined itself, the batch-0
    # spans (s0..s39) would be judged against a polluted prior and appear
    assert z1 == z2 and set(z1) == {"rX"}


def test_moment_log_without_batch_id_column_raises(spark, tmp_path):
    """A hand-restored moment log written as bare files (no batch_id
    partition) must RAISE when the replay filter needs the column — not
    silently reset to first-run (the filter lives outside the
    missing-path guard)."""
    from haystack_traces_spark.streaming.anomaly_stream import AnomalyIngest

    state = tmp_path / "m"
    spark.createDataFrame(
        [("svc", "op", 40, 4000.0, 400000.0)],
        "servicename string, operationname string, n long, s double, ss double",
    ).write.parquet(str(state))
    gate = AnomalyIngest(str(state), str(tmp_path / "o"), 3.0, min_n=30)
    batch = spark.createDataFrame(
        [("t", "s", "svc", "op", 100)],
        "trace_id string, span_id string, service_name string, "
        "operation_name string, duration long",
    )
    with pytest.raises(Exception, match="batch_id"):
        gate.process_batch(batch, 1)


def test_kafka_wire_stub_streams_through_full_topology(spark, tmp_path):
    """VERDICT r4 #8 / S1: parquet files carrying the EXACT kafka source
    schema (key/value binary + topic/partition/offset/timestamp metadata)
    stream through the SAME decode stage kafka_span_source uses
    (_decode_kafka_values) into the full ingest fan-out — the broker I/O
    is the only line this smoke cannot cover."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from haystack_traces_spark.sources.proto import encode_span
    from haystack_traces_spark.streaming.ingest import (
        IngestTopology,
        kafka_wire_stub_source,
    )
    from tests.fixtures import valid_single_root

    src = tmp_path / "wire"
    tables = tmp_path / "tables"
    ckpt = tmp_path / "ckpt"
    src.mkdir()
    ts = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)

    def write_wire_file(name, spans, offset0=0):
        tmp = src / (name + ".tmp")
        pq.write_table(
            pa.table(
                {
                    "key": [s["trace_id"].encode() for s in spans],
                    "value": [encode_span(s) for s in spans],
                    "topic": ["proto-spans"] * len(spans),
                    "partition": pa.array([0] * len(spans), pa.int32()),
                    "offset": pa.array(
                        range(offset0, offset0 + len(spans)), pa.int64()
                    ),
                    "timestamp": pa.array([ts] * len(spans),
                                          pa.timestamp("us", tz="UTC")),
                    "timestampType": pa.array([0] * len(spans), pa.int32()),
                }
            ),
            tmp,
        )
        tmp.rename(src / name)

    write_wire_file("w1.parquet", valid_single_root("kwire_a"))
    topo = IngestTopology(str(tables), window_ms=3000)
    q = topo.start(
        kafka_wire_stub_source(spark, str(src)), str(ckpt), trigger_sec=1
    )

    def store_rows():
        try:
            return spark.read.parquet(str(tables / "trace_store")).collect()
        except Exception:
            return []

    try:
        deadline = time.time() + 45
        seen = set()
        nudge = 0
        while time.time() < deadline:
            seen = {r["trace_id"] for r in store_rows()}
            if "kwire_a" in seen:
                break
            time.sleep(3)
            nudge += 1
            write_wire_file(
                f"nudge{nudge}.parquet",
                valid_single_root(f"kn{nudge}"),
                offset0=100 * nudge,
            )
        assert "kwire_a" in seen, f"kafka-wire trace never emitted: {seen}"
        row = [r for r in store_rows() if r["trace_id"] == "kwire_a"][0]
        assert {s["span_id"] for s in row["spans"]} == {
            s["span_id"] for s in valid_single_root("kwire_a")
        }
    finally:
        q.stop()


def test_kafka_span_source_option_plumbing_or_env_block(spark):
    """The broker-facing half: building kafka_span_source must either get
    as far as Spark's datasource resolution and fail on the ABSENT kafka
    connector (the documented env-block — no broker, no connector jar in
    the container), or — if a connector is ever deployed — yield the
    decoded span schema without touching a broker (source construction is
    lazy). Either way the option-building code path itself runs."""
    from haystack_traces_spark.schemas import SPAN
    from haystack_traces_spark.streaming.ingest import kafka_span_source

    try:
        df = kafka_span_source(spark, "localhost:19092")
    except Exception as e:  # no connector jar: resolution fails by name
        assert "kafka" in str(e).lower(), e
    else:  # connector present: the decode contract must hold
        assert set(df.columns) == set(SPAN.fieldNames())


def test_streaming_tail_sampling_matches_batch_operator(spark, tmp_path):
    """Feeding the corpus spans through the gate in two arbitrary batches
    must reproduce the batch tail_sampling decision table EXACTLY (the
    partials are associative; the policy expression is shared)."""
    import pyspark.sql.functions as F

    from haystack_traces_spark import entry_queries as EQ
    from haystack_traces_spark.streaming.sampling_stream import (
        TailSamplingIngest,
    )

    sf = "/root/testdata/sf0.001"
    spans = EQ._spans(spark, sf).select(
        "trace_id",
        "start_time",
        "duration",
        (EQ._errorcode() >= EQ.ERROR_THRESHOLD).alias("is_error"),
        F.col("span_id").cast("long").alias("sid"),
    )
    gate = TailSamplingIngest(str(tmp_path / "ts"))
    gate.process_batch(spans.filter(F.col("sid") % 2 == 0), 0)
    gate.process_batch(spans.filter(F.col("sid") % 2 == 1), 1)

    got = [r.asDict() for r in gate.decisions(spark).collect()]
    want = [r.asDict() for r in EQ.q_tail_sampling(spark, sf).collect()]
    assert got == want and len(want) > 0


def test_streaming_tail_sampling_replay_and_late_error_upgrade(spark, tmp_path):
    """A replayed batch must not change state; a LATE error span must
    retroactively upgrade its trace's decision to 'error' (the whole
    point of tail-based over head-based sampling)."""
    from haystack_traces_spark.streaming.sampling_stream import (
        TailSamplingIngest,
    )

    schema = "trace_id string, start_time long, duration long, is_error boolean"
    gate = TailSamplingIngest(str(tmp_path / "ts"))
    b0 = spark.createDataFrame([("t1", 0, 100, False)], schema)
    gate.process_batch(b0, 0)
    gate.process_batch(b0, 0)  # replay — overwrite, not double-entry
    first = gate.decisions(spark).collect()
    assert len(first) == 1 and first[0]["reason"] in ("hash", "drop")
    assert not first[0]["has_error"]

    # late error span for the same trace in a later batch
    gate.process_batch(
        spark.createDataFrame([("t1", 50, 10, True)], schema), 1
    )
    upgraded = gate.decisions(spark).collect()
    assert upgraded[0]["has_error"] and upgraded[0]["reason"] == "error"
    assert upgraded[0]["sampled"]


def test_streaming_tail_sampling_end_to_end_available_now(spark, tmp_path):
    """Full writeStream round-trip: parquet file source → foreachBatch
    state → decisions — the gate's start() wiring, not just
    process_batch called by hand."""
    from haystack_traces_spark.streaming.sampling_stream import (
        TailSamplingIngest,
    )

    schema = "trace_id string, start_time long, duration long, is_error boolean"
    src = tmp_path / "src"
    spark.createDataFrame(
        [("e1", 0, 100, True), ("ok1", 0, 100, False)], schema
    ).write.parquet(str(src))

    gate = TailSamplingIngest(str(tmp_path / "state"))
    q = gate.start(
        spark.readStream.schema(schema).parquet(str(src)),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(90)
    got = {r["trace_id"]: r["reason"] for r in gate.decisions(spark).collect()}
    assert got["e1"] == "error"
    assert got["ok1"] in ("hash", "drop")


def test_bloom_gate_flags_exact_dups_across_batches(spark, tmp_path):
    """The Bloom position gate flags exact dups within a batch (lower id
    wins) and across deliveries; only miss docs' positions enter state."""
    from haystack_traces_spark.streaming.bloom_stream import BloomIngest

    state = tmp_path / "pos_state"
    out = tmp_path / "verdicts"
    gate = BloomIngest(str(state), str(out))

    b1 = spark.createDataFrame(
        [(1, "alpha bravo charlie"), (2, "alpha bravo charlie"),
         (3, "totally different words")],
        "doc_id long, text string",
    )
    gate.process_batch(b1, 0)
    rows = {r["doc_id"]: r for r in spark.read.parquet(str(out)).collect()}
    assert not rows[1]["bloom_hit"] and not rows[3]["bloom_hit"]
    assert rows[2]["bloom_hit"] and rows[2]["n_matched"] == rows[2]["n_pos"]

    b2 = spark.createDataFrame(
        [(10, "alpha bravo charlie"), (11, "fresh new content here")],
        "doc_id long, text string",
    )
    gate.process_batch(b2, 1)
    rows = {r["doc_id"]: r for r in spark.read.parquet(str(out)).collect()}
    assert rows[10]["bloom_hit"]
    assert not rows[11]["bloom_hit"]
    # state = union of miss docs' position sets, nothing from dups —
    # and never more than m rows
    n_state = spark.read.parquet(str(state)).count()
    assert n_state <= 3 * 3  # ≤ |miss docs| * k
    # replay of batch 2 (at-least-once redelivery): overwrite-per-batch
    # dirs + prior-batches-only screening → same state, same verdicts
    # (doc 11 stays a MISS on replay — its own positions must not
    # count against it), no duplicate verdict rows
    gate.process_batch(b2, 1)
    assert spark.read.parquet(str(state)).count() == n_state
    verdicts = spark.read.parquet(str(out)).collect()
    assert len(verdicts) == 5
    rows = {r["doc_id"]: r for r in verdicts}
    assert not rows[11]["bloom_hit"] and rows[10]["bloom_hit"]


def test_bloom_gate_state_bounded_by_m_and_saturates(spark, tmp_path):
    """The defining property: state never exceeds m rows however much
    distinct content flows through; a saturated filter (every position
    held) flags EVERYTHING — the designed degradation, loud not silent."""
    from haystack_traces_spark.streaming.bloom_stream import BloomIngest

    gate = BloomIngest(str(tmp_path / "state"), str(tmp_path / "out"), m=8)
    b1 = spark.createDataFrame(
        [(i, f"doc number {i} unique content") for i in range(50)],
        "doc_id long, text string",
    )
    gate.process_batch(b1, 0)
    assert spark.read.parquet(str(tmp_path / "state")).count() <= 8
    # filter is saturated (50 docs x 3 probes over 8 cells): new distinct
    # content now collides on every position
    b2 = spark.createDataFrame(
        [(100, "never seen before text")], "doc_id long, text string"
    )
    gate.process_batch(b2, 1)
    rows = {r["doc_id"]: r for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert rows[100]["bloom_hit"]  # false positive by design at this load


def test_bloom_gate_corrupt_state_propagates(spark, tmp_path):
    """A corrupt position-state file must RAISE, not silently reset (a
    reset filter would re-admit all previously-seen content)."""
    import pytest

    from haystack_traces_spark.streaming.bloom_stream import BloomIngest

    state = tmp_path / "state"
    state.mkdir()
    (state / "part-00000.parquet").write_bytes(b"this is not parquet")
    gate = BloomIngest(str(state), str(tmp_path / "out"))
    batch = spark.createDataFrame(
        [(1, "some text")], "doc_id long, text string"
    )
    with pytest.raises(Exception) as ei:
        gate.process_batch(batch, 0)
    assert type(ei.value).__name__ != "AnalysisException"
    assert not (tmp_path / "out").exists()


def test_bloom_gate_e2e_writestream(spark, tmp_path):
    """Full writeStream round-trip: parquet file source → foreachBatch
    position state → verdicts, via the gate's start() wiring."""
    from haystack_traces_spark.streaming.bloom_stream import BloomIngest

    schema = "doc_id long, text string"
    src = tmp_path / "src"
    spark.createDataFrame(
        [(1, "alpha bravo"), (2, "alpha bravo"), (3, "charlie delta")],
        schema,
    ).write.parquet(str(src))

    gate = BloomIngest(str(tmp_path / "state"), str(tmp_path / "out"))
    q = gate.start(
        spark.readStream.schema(schema).parquet(str(src)),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(90)
    rows = {r["doc_id"]: r["bloom_hit"]
            for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert rows == {1: False, 2: True, 3: False}


def test_bloom_gate_restart_from_checkpoint(spark, tmp_path):
    """T3 for the Bloom gate: stop after batch 1, restart with the SAME
    checkpoint on new source files — only the new batch is processed,
    prior verdicts survive untouched, and content admitted before the
    restart still screens as a hit after it."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from haystack_traces_spark.streaming.bloom_stream import BloomIngest

    schema = "doc_id long, text string"
    src = tmp_path / "src"
    src.mkdir()

    def write_file(name, rows):
        # single FILES at the source root (the file stream does not
        # recurse into Spark-written .parquet directories)
        pq.write_table(
            pa.table(
                {"doc_id": [r[0] for r in rows],
                 "text": [r[1] for r in rows]},
                schema=pa.schema(
                    [("doc_id", pa.int64()), ("text", pa.string())]
                ),
            ),
            str(src / name),
        )

    write_file("f1.parquet", [(1, "alpha bravo"), (2, "charlie delta")])

    gate = BloomIngest(str(tmp_path / "state"), str(tmp_path / "out"))
    q = gate.start(
        spark.readStream.schema(schema).parquet(str(src)),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(90)
    first = {r["doc_id"]: r["bloom_hit"]
             for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert first == {1: False, 2: False}

    # new delivery after "restart": a dup of pre-restart content + fresh
    write_file("f2.parquet", [(10, "alpha bravo"), (11, "echo foxtrot")])
    q2 = gate.start(
        spark.readStream.schema(schema).parquet(str(src)),
        str(tmp_path / "ckpt"),
    )
    q2.awaitTermination(90)
    rows = {r["doc_id"]: r["bloom_hit"]
            for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    # pre-restart verdicts intact, pre-restart content HITS, fresh misses
    assert rows == {1: False, 2: False, 10: True, 11: False}


def test_cms_gate_merge_matches_batch_face_and_estimates_bound(spark, tmp_path):
    """Two micro-batches through the heavy-hitters gate: the merged
    sketch equals the batch face built on the UNION (cell counters are
    exactly associative — sketch mergeability), every estimate bounds
    the exact count from above (CMS contract), and an unseen token
    estimates 0 (definitely-unseen)."""
    from haystack_traces_spark.streaming.cms_stream import (
        HeavyHittersIngest,
        batch_cell_counts,
    )

    schema = "doc_id long, text string, lang string, source string"
    b1 = spark.createDataFrame(
        [(1, "alpha alpha beta", "en", "s"), (2, "alpha gamma", "en", "s")],
        schema,
    )
    b2 = spark.createDataFrame(
        [(3, "beta beta delta", "en", "s"), (4, None, "en", "s")], schema
    )
    gate = HeavyHittersIngest(str(tmp_path / "cms"))
    gate.process_batch(b1, 0)
    gate.process_batch(b2, 1)

    merged = {(r["r"], r["c"]): r["n"]
              for r in gate.merged_sketch(spark).collect()}
    whole = {(r["r"], r["c"]): r["n"]
             for r in batch_cell_counts(b1.unionByName(b2)).collect()}
    assert merged == whole

    est = {r["token"]: r["cms_estimate"]
           for r in gate.estimates(
               spark, ["alpha", "beta", "gamma", "neverseen"]).collect()}
    exact = {"alpha": 3, "beta": 3, "gamma": 1}
    for tok, ex in exact.items():
        assert est[tok] >= ex, (tok, est[tok], ex)
    assert est["neverseen"] >= 0  # may collide, but present in output
    # replay idempotence: re-running batch 1 must not double-count
    gate.process_batch(b2, 1)
    replayed = {(r["r"], r["c"]): r["n"]
                for r in gate.merged_sketch(spark).collect()}
    assert replayed == whole


def test_cms_gate_writestream_end_to_end(spark, tmp_path):
    """Live availableNow run: file doc source → CMS gate → bounded state;
    estimates reflect the drained stream."""
    import json as _json

    from haystack_traces_spark.streaming.corpus_stream import file_doc_source
    from haystack_traces_spark.streaming.cms_stream import (
        DEFAULT_CMS_DEPTH,
        DEFAULT_CMS_WIDTH,
        HeavyHittersIngest,
    )

    src = tmp_path / "src"
    src.mkdir()
    with open(src / "d1.json", "w") as f:
        for i in range(20):
            f.write(_json.dumps(
                {"doc_id": i, "text": "hot hot cold", "lang": "en",
                 "source": "s"}) + "\n")
    gate = HeavyHittersIngest(str(tmp_path / "cms"))
    q = gate.start(file_doc_source(spark, str(src)), str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    est = {r["token"]: r["cms_estimate"]
           for r in gate.estimates(spark, ["hot", "cold"]).collect()}
    assert est["hot"] >= 40 and est["cold"] >= 20
    n_state = spark.read.parquet(str(tmp_path / "cms")).count()
    assert n_state <= DEFAULT_CMS_DEPTH * DEFAULT_CMS_WIDTH


def test_cms_gate_empty_state_compact_and_probe_normalization(spark, tmp_path):
    """Before any batch: estimates are 0 (definitely unseen), no crash.
    compact() folds N batch dirs into one with identical estimates.
    Mixed-case probes read the lowercased sketch. An interrupted
    compaction (.old orphan) refuses to silently reset."""
    import pytest

    from haystack_traces_spark.streaming.cms_stream import HeavyHittersIngest

    gate = HeavyHittersIngest(str(tmp_path / "cms"))
    pre = {r["token"]: r["cms_estimate"]
           for r in gate.estimates(spark, ["anything"]).collect()}
    assert pre == {"anything": 0}

    schema = "doc_id long, text string, lang string, source string"
    gate.process_batch(spark.createDataFrame(
        [(1, "Hot hot thing", "en", "s")], schema), 0)
    gate.process_batch(spark.createDataFrame(
        [(2, "hot again", "en", "s")], schema), 1)
    before = {(r["r"], r["c"]): r["n"]
              for r in gate.merged_sketch(spark).collect()}
    est_mixed = {r["token"]: r["cms_estimate"]
                 for r in gate.estimates(spark, ["HOT", "hot"]).collect()}
    assert est_mixed["HOT"] == est_mixed["hot"] >= 3

    n = gate.compact(spark)
    assert n <= len(before) and n > 0
    after = {(r["r"], r["c"]): r["n"]
             for r in gate.merged_sketch(spark).collect()}
    assert after == before

    # interrupted swap: state gone, .old present -> loud refusal
    import shutil
    shutil.move(str(tmp_path / "cms"), str(tmp_path / "cms.old"))
    with pytest.raises(RuntimeError, match="compaction"):
        gate.merged_sketch(spark)


# ------------------------------------------------- event-time face (r7) ----
class FakeEventState(FakeState):
    """FakeState + the event-time surface (watermark + timestamp timer)."""

    def __init__(self, value=None, timed_out=False, watermark_ms=0):
        super().__init__(value, timed_out)
        self._wm = watermark_ms
        self.timeout_ts = None

    def getCurrentWatermarkMs(self):
        return self._wm

    def setTimeoutTimestamp(self, ms):
        self.timeout_ts = ms


def _ev_pdf(events):
    """events: list of (ts_us, payload_dict)"""
    return pd.DataFrame(
        {
            "ts_us": [ts for ts, _ in events],
            "span_json": [json.dumps(p) for _, p in events],
        }
    )


def _run_event_fn(fn, key, events, state):
    return list(fn((key,), iter([_ev_pdf(events)]), state))


def test_event_islands_split_rules():
    from haystack_traces_spark.streaming.sessionize import _split_islands

    evs = [(0, "a"), (5, "b"), (12, "c"), (30, "d")]
    # gap 10: 12-5=7 joins, 30-12=18 splits
    gap = _split_islands(evs, "gap", 10)
    assert [[t for t, _ in i] for i in gap] == [[0, 5, 12], [30]]
    # anchored 10: island [0,10) -> 12 opens new [12,22) -> 30 new
    anc = _split_islands(evs, "anchored", 10)
    assert [[t for t, _ in i] for i in anc] == [[0, 5], [12], [30]]
    # anchored half-open boundary: ts exactly at t0+horizon opens NEW island
    anc2 = _split_islands([(0, "a"), (10, "b")], "anchored", 10)
    assert [[t for t, _ in i] for i in anc2] == [[0], [10]]


def test_event_fn_emits_only_watermark_closed_islands():
    from haystack_traces_spark.streaming.sessionize import (
        make_event_session_fn,
    )

    fn = make_event_session_fn("gap", 10_000_000)  # 10 s gap
    # two islands: [0s,5s] and [60s]; watermark 20s: first island's close
    # = 5s+10s = 15s < 20s -> emitted; second stays, timer armed at its close
    st = FakeEventState(watermark_ms=20_000)
    out = _run_event_fn(
        fn,
        "u1",
        [(0, {"e": 1}), (5_000_000, {"e": 2}), (60_000_000, {"e": 3})],
        st,
    )
    assert len(out) == 1 and len(out[0]) == 1
    row = out[0].iloc[0]
    assert (row["session_start"], row["session_end"], row["n_events"]) == (
        0, 5_000_000, 2,
    )
    assert st.exists and not st.removed
    # close = 60s + 10s = 70s -> timer strictly past it (ceil ms + 1)
    assert st.timeout_ts == 70_000 + 1


def test_event_fn_gap_boundary_is_strict():
    """An event exactly AT last_ts + gap still joins its island, so the
    watermark must be strictly past the close threshold to emit."""
    from haystack_traces_spark.streaming.sessionize import (
        make_event_session_fn,
    )

    fn = make_event_session_fn("gap", 10_000_000)
    # close threshold = 10s exactly; wm == 10s must NOT emit
    st = FakeEventState(watermark_ms=10_000)
    out = _run_event_fn(fn, "u1", [(0, {"e": 1})], st)
    assert out == [] and st.exists
    # wm just past -> emits, state cleared
    st2 = FakeEventState(watermark_ms=10_001)
    out2 = _run_event_fn(fn, "u1", [(0, {"e": 1})], st2)
    assert len(out2) == 1 and st2.removed


def test_event_fn_timeout_path_flushes_state():
    from haystack_traces_spark.streaming.sessionize import (
        _pack_spans,
        make_event_session_fn,
    )

    fn = make_event_session_fn("anchored", 10_000_000)
    packed = _pack_spans([f"0 {json.dumps({'e': 1})}"])
    st = FakeEventState(value=(packed,), timed_out=True, watermark_ms=10_000)
    out = list(fn(("u1",), iter([]), st))
    assert len(out) == 1 and out[0].iloc[0]["n_events"] == 1
    assert st.removed


def test_event_time_gap_face_matches_batch_event_sessions(spark, tmp_path):
    """VERDICT r6 ask #2, the equivalence pin: the event-time streaming
    face in gap mode, replayed over the sf0.001 events corpus, emits
    EXACTLY the sessions the batch gaps-and-islands operator
    (`sessionize_events`) computes — same corpus, same buffers. Two
    sentinel drops advance the watermark so every real island provably
    closes; sentinel rows are filtered from the comparison."""
    from haystack_traces_spark.entry_queries import (
        SESSION_GAP_US,
        sessionize_events,
    )
    from haystack_traces_spark.sources.events import _epoch_micros
    from haystack_traces_spark.streaming.sessionize import (
        sessionize_event_time,
    )

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev = events.select(
        "user_id", "event_id", _epoch_micros(events).alias("tus")
    )
    batch = sessionize_events(ev).collect()
    rows = ev.collect()  # bounded: 1000 events at sf0.001
    max_tus = max(r["tus"] for r in rows)

    src = tmp_path / "src"
    src.mkdir()

    def write(name, recs):
        tmp = src / (name + ".tmp")
        with open(tmp, "w") as f:
            for r in recs:
                f.write(json.dumps(r) + "\n")
        tmp.rename(src / name)

    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    schema = "user_id long, event_id long, tus long"

    def run_once():
        stream = spark.readStream.schema(schema).json(str(src))
        q = (
            sessionize_event_time(
                stream,
                "tus",
                key_col="user_id",
                mode="gap",
                horizon_us=SESSION_GAP_US,
                watermark_delay="1 second",
            )
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    write(
        "f1.json",
        [
            {"user_id": r["user_id"], "event_id": r["event_id"], "tus": r["tus"]}
            for r in rows
        ],
    )
    run_once()
    write(
        "f2.json",
        [{"user_id": -1, "event_id": -1,
          "tus": max_tus + SESSION_GAP_US + 10_000_000}],
    )
    run_once()
    write(
        "f3.json",
        [{"user_id": -1, "event_id": -2,
          "tus": max_tus + 2 * SESSION_GAP_US + 20_000_000}],
    )
    run_once()

    # key type preserved: the replay face emits user_id as LONG like the
    # batch face (no string workaround needed for the comparison)
    got = [
        r
        for r in spark.read.parquet(str(out)).collect()
        if r["user_id"] != -1
    ]
    assert all(isinstance(r["user_id"], int) for r in got)
    from collections import defaultdict

    per = defaultdict(list)
    for r in got:
        per[r["user_id"]].append(r)
    stream_rows = set()
    for u, lst in per.items():
        for i, r in enumerate(sorted(lst, key=lambda x: x["session_start"]), 1):
            stream_rows.add(
                (u, i, r["n_events"],
                 r["session_start"], r["session_end"] - r["session_start"])
            )
    batch_rows = {
        (r["user_id"], r["session_idx"], r["n_events"],
         r["session_start"], r["session_dur"])
        for r in batch
    }
    assert stream_rows == batch_rows


def test_event_time_anchored_face_end_to_end(spark, tmp_path):
    """Anchored mode live: window-from-first-EVENT islands (T1's rule on
    the event clock) cut at exactly the crafted boundaries, and the
    emitted rows carry no wall-clock column — replay-deterministic."""
    from haystack_traces_spark.streaming.sessionize import (
        sessionize_event_time,
    )

    src = tmp_path / "src"
    src.mkdir()
    out, ckpt = tmp_path / "out", tmp_path / "ckpt"
    schema = "trace_id string, span_id string, start_time long"
    S = 1_000_000  # 1 s in µs

    def write(name, recs):
        tmp = src / (name + ".tmp")
        with open(tmp, "w") as f:
            for r in recs:
                f.write(json.dumps(r) + "\n")
        tmp.rename(src / name)

    def run_once():
        stream = spark.readStream.schema(schema).json(str(src))
        q = (
            sessionize_event_time(
                stream, "start_time", key_col="trace_id",
                mode="anchored", horizon_us=10 * S,
                watermark_delay="1 second",
            )
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    T = 1_700_000_000 * S
    write(
        "f1.json",
        [
            {"trace_id": "tA", "span_id": "a1", "start_time": T},
            {"trace_id": "tA", "span_id": "a2", "start_time": T + 5 * S},
            # exactly at the half-open boundary -> NEW island
            {"trace_id": "tA", "span_id": "a3", "start_time": T + 10 * S},
            {"trace_id": "tB", "span_id": "b1", "start_time": T + 2 * S},
        ],
    )
    run_once()
    write("f2.json", [{"trace_id": "__wm__", "span_id": "s",
                       "start_time": T + 100 * S}])
    run_once()
    write("f3.json", [{"trace_id": "__wm__", "span_id": "s2",
                       "start_time": T + 200 * S}])
    run_once()

    got = sorted(
        (r["trace_id"], r["session_start"], r["n_events"])
        for r in spark.read.parquet(str(out)).collect()
        if r["trace_id"] != "__wm__"
    )
    assert got == [
        ("tA", T, 2),
        ("tA", T + 10 * S, 1),
        ("tB", T + 2 * S, 1),
    ]


def test_event_time_face_is_batching_invariant(spark, tmp_path):
    """The determinism CONTRACT, pinned directly: the same corpus pushed
    through sessionize_event_time under two different micro-batch
    layouts (whole corpus in one file vs one file per event chunk,
    maxFilesPerTrigger=1) emits EXACTLY the same session rows. This is
    the property the processing-time face cannot have, and the reason
    the event-time face is the backfill/replay face (SCALE.md §6)."""
    import itertools

    from haystack_traces_spark.streaming.sessionize import (
        sessionize_event_time,
    )

    S = 1_000_000
    T = 1_700_000_000 * S
    events = [
        {"trace_id": "a", "span_id": f"a{i}", "start_time": T + i * 4 * S}
        for i in range(6)
    ] + [
        {"trace_id": "b", "span_id": f"b{i}", "start_time": T + i * 11 * S}
        for i in range(4)
    ]

    def run(layout_tag, chunks):
        src = tmp_path / f"src_{layout_tag}"
        out = tmp_path / f"out_{layout_tag}"
        ckpt = tmp_path / f"ckpt_{layout_tag}"
        src.mkdir()
        schema = "trace_id string, span_id string, start_time long"

        def write(name, recs):
            tmp = src / (name + ".tmp")
            with open(tmp, "w") as f:
                for r in recs:
                    f.write(json.dumps(r) + "\n")
            tmp.rename(src / name)

        def run_once():
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .json(str(src))
            )
            q = (
                sessionize_event_time(
                    stream, "start_time", key_col="trace_id",
                    mode="gap", horizon_us=10 * S,
                    # the determinism contract's one premise: the delay
                    # must cover the source's event-time disorder (the
                    # scrambled layout interleaves the full 33 s corpus)
                    watermark_delay="60 seconds",
                )
                .writeStream.outputMode("append")
                .format("parquet")
                .option("path", str(out))
                .option("checkpointLocation", str(ckpt))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)

        for i, chunk in enumerate(chunks):
            write(f"f{i}.json", chunk)
        run_once()
        write("wm1.json", [{"trace_id": "__wm__", "span_id": "s",
                            "start_time": T + 1000 * S}])
        run_once()
        write("wm2.json", [{"trace_id": "__wm__", "span_id": "s2",
                            "start_time": T + 2000 * S}])
        run_once()
        return sorted(
            (r["trace_id"], r["session_start"], r["session_end"],
             r["n_events"], tuple(sorted(r["events_json"])))
            for r in spark.read.parquet(str(out)).collect()
            if r["trace_id"] != "__wm__"
        )

    # layout A: the whole corpus in one micro-batch
    a = run("one", [events])
    # layout B: four files of 2-3 events each, one per micro-batch, with
    # event times fully interleaved across batches (disorder bounded by
    # the watermark delay)
    chunks = [events[i::4] for i in range(4)]
    b = run("four", chunks)
    assert a == b and len(a) > 0


def test_backfill_topology_reproduces_batch_build(spark, tmp_path):
    """THE round-7 capstone equivalence: an at-rest corpus backfilled
    through the FULL streaming topology with event-time semantics
    (run_backfill: decode → anchored event-time sessionize → the same
    foreachBatch sinks as live ingest), then compacted, produces EXACTLY
    the trace_index the one-shot batch build produces — streaming
    backfill and batch build are two routes to one table. Also checks
    the trace_store covers every span exactly once."""
    import pyspark.sql.functions as F

    from haystack_traces_spark.entry_queries import _spans
    from haystack_traces_spark.operators.index import (
        build_trace_index,
        compact_trace_index,
    )
    from haystack_traces_spark.streaming.ingest import run_backfill

    spans = _spans(spark, "/root/testdata/sf0.001")
    src = tmp_path / "src"
    spans.repartition(3).write.json(str(src))

    # maxFilesPerTrigger=1 forces a GENUINE multi-batch run: files are
    # randomly partitioned, so later batches carry spans far older than
    # earlier batches' max event time — the auto-derived watermark delay
    # (corpus span + window) must keep them from being late-dropped, and
    # the flush sentinel (newest mtime -> last batch) must still close
    # every session
    run_backfill(
        spark,
        str(src),
        str(tmp_path / "tables"),
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )

    streamed = compact_trace_index(
        spark.read.parquet(str(tmp_path / "tables" / "trace_index"))
    )
    full = build_trace_index(spans, with_partition_cols=True)

    def canon(df):
        rows = {}
        for r in df.collect():
            groups = {}
            for grp in r["spans"]:
                d = grp.asDict()
                key = (d.pop("servicename"), d.pop("operationname"))
                groups[key] = {
                    k: tuple(sorted(x for x in v if x is not None)) if v else ()
                    for k, v in d.items()
                }
            rows[r["traceid"]] = (
                r["starttime"], r["rootduration"], r["dt"], r["hb"], groups
            )
        return rows

    cs, cf = canon(streamed), canon(full)
    assert cs.keys() == cf.keys()
    assert cs == cf
    # store coverage: every span of every trace landed exactly once
    store = spark.read.parquet(str(tmp_path / "tables" / "trace_store"))
    n_store_spans = store.select(F.explode("spans")).count()
    assert n_store_spans == spans.count()


def test_backfill_with_promotion_and_layout_guard(spark, tmp_path):
    """The promoted layout through the STREAMING write path: a promoted
    backfill writes wl_ columns on every row (never NULL), the compacted
    result equals the promoted batch build including the unions, the
    promoted search over the streamed table matches the plain search,
    and appending an UNPROMOTED batch onto the promoted table is refused
    loudly (mixed schemas read back as NULL unions that the promoted
    dispatch would silently drop)."""
    import pyspark.sql.functions as F
    import pytest

    from haystack_traces_spark import entry_queries as EQ
    from haystack_traces_spark.entry_queries import _spans
    from haystack_traces_spark.operators import search as search_ops
    from haystack_traces_spark.operators.expression import (
        EQUAL,
        GREATER_THAN,
        ExpressionTree,
        Field,
    )
    from haystack_traces_spark.operators.index import (
        build_trace_index,
        compact_trace_index,
    )
    from haystack_traces_spark.streaming.ingest import (
        IngestTopology,
        run_backfill,
    )

    spans = _spans(spark, "/root/testdata/sf0.001")
    src = tmp_path / "src"
    spans.write.json(str(src))
    run_backfill(
        spark,
        str(src),
        str(tmp_path / "tables"),
        str(tmp_path / "ckpt"),
        promote_whitelist=True,
    )
    raw = spark.read.parquet(str(tmp_path / "tables" / "trace_index"))
    wl_cols = [c for c in raw.columns if c.startswith("wl_")]
    assert wl_cols, raw.columns
    for c in wl_cols:  # every streamed row carries its union
        assert raw.filter(F.col(c).isNull()).count() == 0, c

    streamed = compact_trace_index(raw)
    full = build_trace_index(spans, promote_whitelist=True)

    def canon_unions(df):
        return {
            r["traceid"]: tuple(tuple(sorted(r[c])) for c in sorted(wl_cols))
            for r in df.select("traceid", *wl_cols).collect()
        }

    assert canon_unions(streamed) == canon_unions(full)

    # promoted search over the streamed table == plain search over batch
    req = search_ops.SearchRequest(
        EQ.T0, EQ.T1, 20,
        ExpressionTree((
            Field("servicename", "error", EQUAL),
            Field("duration", EQ.DUR_THRESHOLD, GREATER_THAN),
        )),
    )
    got = sorted(
        (r["traceid"], r["starttime"])
        for r in search_ops.search_trace_ids(streamed, req).collect()
    )
    want = sorted(
        (r["traceid"], r["starttime"])
        for r in search_ops.search_trace_ids(
            build_trace_index(spans), req
        ).collect()
    )
    assert got == want and len(got) > 0

    # layout guard: an unpromoted append onto the promoted table refuses
    topo = IngestTopology(str(tmp_path / "tables"))  # promote off
    buffers = spark.createDataFrame(
        [("tX", 0, 0, 1, "window",
          ['{"trace_id":"tX","span_id":"s","parent_span_id":"",'
           '"service_name":"svc","operation_name":"op",'
           '"start_time":1704067200000000,"duration":5,'
           '"tags":[],"logs":[]}'])],
        "trace_id string, first_seen_ms long, emitted_ms long, "
        "n_spans int, emit_reason string, spans_json array<string>",
    )
    with pytest.raises(ValueError, match="promoted-layout mismatch"):
        topo.process_batch(buffers, 0)


def test_layout_guard_raises_on_corrupt_table(spark, tmp_path):
    """ADVICE r7: a corrupt (or otherwise unreadable) existing
    trace_index must NOT be mistaken for 'first batch' — that would
    bypass the promoted-layout guard and append mixed schemas silently.
    Only a genuinely-missing path skips the check."""
    import pytest

    from haystack_traces_spark.streaming.ingest import (
        IngestTopology,
        read_parquet_if_exists,
    )

    # missing path → None (first batch)
    assert read_parquet_if_exists(spark, str(tmp_path / "nope")) is None
    IngestTopology._check_index_layout(
        spark, str(tmp_path / "nope"), ["traceid"]
    )  # no raise

    # corrupt table → loud failure, not a bypassed guard
    bad = tmp_path / "trace_index"
    bad.mkdir()
    (bad / "part-00000.parquet").write_bytes(b"not a parquet footer")
    with pytest.raises(Exception, match="(?i)parquet|footer|PAR1"):
        IngestTopology._check_index_layout(spark, str(bad), ["traceid"])


def _quality_evt_corpus():
    """4 event-time "hours" (hour_us=1000) x 2 sources; the `web` source's
    final hour collapses to junk (token-salad repetition) so the z-test
    must flag it; `books` stays stable. Enough docs per hour that the
    DRIFT_MIN_PRIOR=10 gate opens from hour 2 on."""
    recs, did = [], 0
    goods = (
        "the quick brown fox jumps over the lazy dog near the river bank",
        "a short clean sentence with plain words and a final stop mark here",
        "many different tokens keep the prior variance strictly positive now",
    )
    junk = "zz zz zz zz zz zz zz zz zz zz zz zz"
    for h in range(4):
        for i in range(12):
            base = junk if (h == 3 and i < 10) else goods[i % 3]
            recs.append(
                {"doc_id": did, "ts": h * 1000 + i * 7 + 1,
                 "text": base + f" tail{did}", "source": "web"}
            )
            did += 1
        for i in range(11):
            recs.append(
                {"doc_id": did, "ts": h * 1000 + i * 11 + 3,
                 "text": goods[i % 3] + f" extra words here {did}",
                 "source": "books"}
            )
            did += 1
    return recs


def test_quality_drift_event_backfill_equals_batch(spark, tmp_path):
    """EventTimeQualityDrift (VERDICT r9 ask #6): the event-time drift
    gate, backfilled over an at-rest corpus whose files are NOT in event
    order, equals the shared-core batch face (quality_drift_windows'
    arithmetic) EXACTLY — per-hour verdicts are a pure function of the
    data, so two different file batchings emit identical rows, and the
    engineered hour-3 quality collapse is flagged with the same z on
    every path."""
    import json

    import pyspark.sql.functions as F

    from haystack_traces_spark.datapipe.text import text_stats
    from haystack_traces_spark.streaming.neardup_stream import (
        read_verdicts,
        run_neardup_backfill,
    )
    from haystack_traces_spark.streaming.quality_stream import (
        EventTimeQualityDrift,
    )

    recs = _quality_evt_corpus()
    hour_us, min_prior, z_thr = 1000, 10, 3.0
    schema = "doc_id long, ts long, text string, source string"

    def backfill(splits, tag):
        src = tmp_path / f"src_{tag}"
        src.mkdir()
        for i, chunk in enumerate(splits):
            with open(src / f"part{i}.json", "w") as f:
                for r in chunk:
                    f.write(json.dumps(r) + "\n")
        run_neardup_backfill(
            spark, str(src), str(tmp_path / f"state_{tag}"),
            str(tmp_path / f"out_{tag}"), str(tmp_path / f"ckpt_{tag}"),
            gate_cls=EventTimeQualityDrift, schema=schema,
            hour_us=hour_us, min_prior=min_prior, z_threshold=z_thr,
        )
        return sorted(
            tuple(r)
            for r in read_verdicts(spark, str(tmp_path / f"out_{tag}")).collect()
        )

    # deliberately out of event-time order, and a second, different split
    got_a = backfill([recs[60:], recs[:25], recs[25:60]], "a")
    got_b = backfill([recs[40:41], recs[41:], recs[:40]], "b")

    docs = spark.createDataFrame(
        [(r["doc_id"], r["ts"], r["text"], r["source"]) for r in recs], schema
    )
    scored = text_stats(docs, extra_cols=("source", "ts")).select(
        "source",
        (F.col("ts") - F.col("ts") % hour_us).alias("hour_ts"),
        F.round(F.col("quality_score") * 1_000_000).cast("long").alias("q_micro"),
    )
    from haystack_traces_spark.streaming.quality_stream import (
        drift_verdicts_from_moments,
    )

    hourly = scored.groupBy("source", "hour_ts").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("q_micro").alias("s_micro"),
        F.sum(F.col("q_micro") * F.col("q_micro")).alias("ss_micro"),
    )
    want = sorted(
        tuple(r)
        for r in drift_verdicts_from_moments(hourly, min_prior, z_thr).collect()
    )
    assert got_a == want
    assert got_b == want  # batching-invariant
    by_key = {(r[0], r[1]): r for r in got_a}
    # hour 3's web collapse drifts; books' hour 3 does not
    assert by_key[("web", 3000)][6] is True
    assert by_key[("books", 3000)][6] is False
    # hours 0-1 never reach min_prior=10 prior docs -> gated out
    assert ("web", 0) not in by_key and ("books", 0) not in by_key


def test_latency_hist_event_backfill_equals_batch(spark, tmp_path):
    """EventTimeLatencyHistogram (VERDICT r10 ask #6): the event-time
    hourly percentile gate, backfilled over span files NOT in event
    order, equals the hourly_latency_percentiles batch face EXACTLY and
    is batching-invariant — per-hour estimates are a pure function of
    the data."""
    import json

    from haystack_traces_spark.streaming.latency_stream import (
        EventTimeLatencyHistogram,
        hourly_latency_percentiles,
    )
    from haystack_traces_spark.streaming.neardup_stream import (
        read_verdicts,
        run_neardup_backfill,
    )

    hour_us = 1000
    schema = (
        "doc_id long, ts long, servicename string, operationname string, "
        "duration long"
    )
    recs = []
    i = 0
    for hour in range(4):
        for svc, op, durs in (
            ("web", "get", [1, 2, 3, 4, 5, 6, 7, 8 + hour * 100]),
            ("db", "query", [10, 20, 40, 80]),
        ):
            for d in durs:
                recs.append(
                    {"doc_id": i, "ts": hour * hour_us + (i % 9) * 100 + 1,
                     "servicename": svc, "operationname": op, "duration": d}
                )
                i += 1

    def backfill(splits, tag):
        src = tmp_path / f"src_{tag}"
        src.mkdir()
        for j, chunk in enumerate(splits):
            with open(src / f"part{j}.json", "w") as f:
                for r in chunk:
                    f.write(json.dumps(r) + "\n")
        run_neardup_backfill(
            spark, str(src), str(tmp_path / f"state_{tag}"),
            str(tmp_path / f"out_{tag}"), str(tmp_path / f"ckpt_{tag}"),
            gate_cls=EventTimeLatencyHistogram, schema=schema,
            hour_us=hour_us,
        )
        return sorted(
            tuple(r)
            for r in read_verdicts(spark, str(tmp_path / f"out_{tag}")).collect()
        )

    got_a = backfill([recs[50:], recs[:20], recs[20:50]], "a")
    got_b = backfill([recs[33:34], recs[34:], recs[:33]], "b")
    frame = spark.createDataFrame(
        [(r["doc_id"], r["ts"], r["servicename"], r["operationname"],
          r["duration"]) for r in recs],
        schema,
    )
    want = sorted(
        tuple(r) for r in hourly_latency_percentiles(frame, hour_us).collect()
    )
    assert got_a == want
    assert got_b == want  # batching-invariant
    # hand-pinned hour-0 web row: durations 1..8 bucket to counts
    # {1:1, 2:2, 3:4, 4:1}; q=0.5 -> bucket 3 -> 7; q=0.9/0.99 -> 15
    by_key = {(r[0], r[1], r[2], r[3]): r[4] for r in got_a}
    assert by_key[("web", "get", 0, 0.5)] == 7
    assert by_key[("web", "get", 0, 0.9)] == 15
    assert by_key[("web", "get", 0, 0.99)] == 15


def test_latency_hist_gate_routes_late_and_emits_once(spark, tmp_path):
    """Direct process_batch drive of EventTimeLatencyHistogram: an hour's
    percentile rows are emitted exactly once (when the watermark passes
    the hour end), a straggler for a finalized hour routes to late/ and
    neither the verdicts nor the moment log change."""
    import pyspark.sql.functions as F

    from haystack_traces_spark.streaming.latency_stream import (
        EventTimeLatencyHistogram,
    )
    from haystack_traces_spark.streaming.neardup_stream import read_verdicts

    gate = EventTimeLatencyHistogram(
        str(tmp_path / "state"), str(tmp_path / "out"),
        delay_us=100, hour_us=1000,
    )
    schema = (
        "doc_id long, ts long, servicename string, operationname string, "
        "duration long"
    )

    # hour 0 split across two deliveries; nothing final while w < 999
    gate.process_batch(
        spark.createDataFrame(
            [(i, 1 + i * 100, "web", "get", i + 1) for i in range(4)], schema
        ),
        0,
    )
    gate.process_batch(
        spark.createDataFrame(
            [(i, 1 + i * 100, "web", "get", i + 1) for i in range(4, 8)], schema
        ),
        1,
    )
    assert read_verdicts(spark, str(tmp_path / "out")).count() == 0

    # hour 1 pushes the watermark past hour 0's end -> hour 0 emitted once,
    # with moments MERGED across the two deliveries (durations 1..8)
    gate.process_batch(
        spark.createDataFrame([(10, 1500, "web", "get", 50)], schema), 2
    )
    v = {
        (r["servicename"], r["operationname"], r["hour_ts"], r["q"]): r["est_us"]
        for r in read_verdicts(spark, str(tmp_path / "out")).collect()
    }
    assert v == {
        ("web", "get", 0, 0.5): 7,
        ("web", "get", 0, 0.9): 15,
        ("web", "get", 0, 0.99): 15,
    }

    # straggler for finalized hour 0: late-routed, verdicts + moments frozen
    gate.process_batch(
        spark.createDataFrame([(99, 5, "web", "get", 9999)], schema), 3
    )
    late = spark.read.parquet(str(tmp_path / "out" / "late"))
    assert [(r["doc_id"], r["ts"]) for r in late.collect()] == [(99, 5)]
    v2 = {
        (r["servicename"], r["operationname"], r["hour_ts"], r["q"]): r["est_us"]
        for r in read_verdicts(spark, str(tmp_path / "out")).collect()
    }
    assert v2 == v
    moments = spark.read.parquet(str(tmp_path / "state" / "moments"))
    assert moments.agg(F.sum("n")).first()[0] == 9  # 4 + 4 + 1 admitted


def test_hour_gate_compact_state_mid_stream_equivalence(spark, tmp_path):
    """EventTimeHourGate.compact_state: compacting the latency gate's
    moment + docs logs mid-stream changes NOTHING downstream — later
    batches emit the same verdicts, stragglers still late-route (the
    dedup set and watermark survive), and the moment log shrinks to one
    row per (svc, op, hour, bucket)."""
    import pyspark.sql.functions as F

    from haystack_traces_spark.streaming.latency_stream import (
        EventTimeLatencyHistogram,
    )
    from haystack_traces_spark.streaming.neardup_stream import read_verdicts

    schema = (
        "doc_id long, ts long, servicename string, operationname string, "
        "duration long"
    )

    def run(tag, compact_after_batch1):
        gate = EventTimeLatencyHistogram(
            str(tmp_path / f"state_{tag}"), str(tmp_path / f"out_{tag}"),
            delay_us=100, hour_us=1000,
        )
        # hour 0 split across two deliveries (same-hour moments split
        # across batches — exactly what compaction merges)
        gate.process_batch(
            spark.createDataFrame(
                [(i, 1 + i * 100, "web", "get", i + 1) for i in range(4)],
                schema,
            ),
            0,
        )
        gate.process_batch(
            spark.createDataFrame(
                [(i, 1 + i * 100, "web", "get", i + 1) for i in range(4, 8)],
                schema,
            ),
            1,
        )
        if compact_after_batch1:
            n_moments, n_docs = gate.compact_state(spark)
            assert n_moments == 4  # buckets {1,2,3,4} of hour 0, merged
            assert n_docs == 8
            # a redelivered doc AND a pre-watermark straggler after the
            # compact: dedup set + watermark must have survived
            gate.process_batch(
                spark.createDataFrame(
                    [(3, 301, "web", "get", 4), (99, 1, "web", "get", 9)],
                    schema,
                ),
                2,
            )
        gate.process_batch(
            spark.createDataFrame([(10, 1500, "web", "get", 50)], schema), 3
        )
        return sorted(
            tuple(r)
            for r in read_verdicts(spark, str(tmp_path / f"out_{tag}")).collect()
        )

    plain = run("plain", False)
    compacted = run("compact", True)
    assert plain == compacted
    # the straggler (doc 99, ts 1 <= watermark 301-100) was late-routed
    late = spark.read.parquet(str(tmp_path / "out_compact" / "late"))
    assert [(r["doc_id"], r["ts"]) for r in late.collect()] == [(99, 1)]
    # moments stayed compact: 4 merged rows + batch-2 empties + batch-3 row
    moments = spark.read.parquet(str(tmp_path / "state_compact" / "moments"))
    assert moments.count() == 5


def test_quality_drift_gate_routes_late_and_emits_once(spark, tmp_path):
    """Direct process_batch drive of EventTimeQualityDrift: an hour's
    verdict is emitted exactly once (in the batch whose watermark passes
    the hour end), a later arrival for an already-final hour is routed
    to late/ and the verdict table is unchanged, and moments split
    across deliveries of the SAME hour merge exactly (associative
    integer moments)."""
    import pyspark.sql.functions as F

    from haystack_traces_spark.streaming.neardup_stream import read_verdicts
    from haystack_traces_spark.streaming.quality_stream import (
        EventTimeQualityDrift,
    )

    gate = EventTimeQualityDrift(
        str(tmp_path / "state"), str(tmp_path / "out"),
        delay_us=100, hour_us=1000, min_prior=5, z_threshold=3.0,
    )
    schema = "doc_id long, ts long, text string, source string"
    texts = [
        "the quick brown fox jumps over a lazy dog",
        "a different clean sentence with several plain words here",
        "many other tokens keep variance strictly positive now",
    ]

    def rows(hour, ids):
        return [
            (i, hour * 1000 + (i % 7) * 100 + 1, texts[i % 3] + f" t{i}", "web")
            for i in ids
        ]

    # hour 0 split across TWO deliveries; nothing final yet (w < 999).
    # Doc 7's ts (1) sits below batch 0's watermark (301 - 100) when it
    # arrives in batch 1 -> CROSS-BATCH late routing, admitted docs = 7
    gate.process_batch(spark.createDataFrame(rows(0, range(4)), schema), 0)
    gate.process_batch(spark.createDataFrame(rows(0, range(4, 8)), schema), 1)
    assert read_verdicts(spark, str(tmp_path / "out")).count() == 0

    # hour 1 arrivals push the watermark past hour 0's end -> hour 0 is
    # final but has no prior -> still no verdict rows; hour 2 arrivals
    # finalize hour 1, whose prior (hour 0: 8 docs) passes min_prior=5
    gate.process_batch(spark.createDataFrame(rows(1, range(10, 18)), schema), 2)
    gate.process_batch(spark.createDataFrame(rows(2, range(20, 26)), schema), 3)
    v = read_verdicts(spark, str(tmp_path / "out")).collect()
    assert [(r["source"], r["hour_ts"], r["n_docs"]) for r in v] == [
        ("web", 1000, 8)
    ]

    # a straggler for the FINAL hour 0 must late-route, not mutate state
    gate.process_batch(
        spark.createDataFrame([(99, 5, texts[0], "web")], schema), 4
    )
    late = spark.read.parquet(str(tmp_path / "out" / "late"))
    assert sorted((r["doc_id"], r["ts"]) for r in late.collect()) == [
        (7, 1),   # the cross-batch straggler from delivery 1
        (99, 5),  # the post-verdict straggler
    ]
    v2 = read_verdicts(spark, str(tmp_path / "out")).collect()
    assert sorted(map(tuple, v2)) == sorted(map(tuple, v))
    # neither straggler entered the moment log (7 + 8 + 6 admitted docs)
    moments = spark.read.parquet(str(tmp_path / "state" / "moments"))
    assert moments.agg(F.sum("n_docs")).first()[0] == 7 + 8 + 6


def test_hll_distinct_event_backfill_equals_batch(spark, tmp_path):
    """EventTimeDistinct (r12): the event-time hourly HLL cardinality
    gate, backfilled over files NOT in event order, equals the
    hourly_distinct_hll batch face EXACTLY and is batching-invariant —
    the per-hour estimate is a pure function of the data. Redelivered
    doc_ids must not inflate the registers."""
    import json

    from haystack_traces_spark.streaming.hll_stream import (
        EventTimeDistinct,
        hourly_distinct_hll,
    )
    from haystack_traces_spark.streaming.neardup_stream import (
        read_verdicts,
        run_neardup_backfill,
    )

    hour_us = 1000
    schema = "doc_id long, ts long, value string"
    recs = []
    i = 0
    for hour in range(3):
        # per-hour values: 13 distinct names repeated, plus hour-unique tails
        for j in range(30 + hour * 5):
            recs.append(
                {"doc_id": i, "ts": hour * hour_us + (j % 9) * 100 + 1,
                 "value": f"v{j % 13}" if j % 3 else f"u{hour}_{j}"}
            )
            i += 1

    def backfill(splits, tag):
        src = tmp_path / f"src_{tag}"
        src.mkdir()
        for j, chunk in enumerate(splits):
            with open(src / f"part{j}.json", "w") as f:
                for r in chunk:
                    f.write(json.dumps(r) + "\n")
        run_neardup_backfill(
            spark, str(src), str(tmp_path / f"state_{tag}"),
            str(tmp_path / f"out_{tag}"), str(tmp_path / f"ckpt_{tag}"),
            gate_cls=EventTimeDistinct, schema=schema, hour_us=hour_us,
        )
        return sorted(
            tuple(r)
            for r in read_verdicts(spark, str(tmp_path / f"out_{tag}")).collect()
        )

    # split B redelivers a chunk (overlap) — dedup must absorb it
    got_a = backfill([recs[40:], recs[:15], recs[15:40]], "a")
    got_b = backfill([recs[:50], recs[30:], recs[:10]], "b")
    frame = spark.createDataFrame(
        [(r["doc_id"], r["ts"], r["value"]) for r in recs], schema
    )
    want = sorted(
        tuple(r) for r in hourly_distinct_hll(frame, hour_us).collect()
    )
    assert got_a == want
    assert got_b == want
    assert len(want) == 3 and all(v[1] > 0 for v in want)


def test_hll_gate_compact_state_mid_stream_equivalence(spark, tmp_path):
    """EventTimeDistinct keeps the hour-gate compaction contract by
    putting (reg, rho) in _MOMENT_KEYS (a max column would break the
    per-key-SUM losslessness proof): compacting mid-stream changes no
    later verdict, and same-(hour, reg, rho) rows from different batches
    merge to one."""
    from haystack_traces_spark.streaming.hll_stream import EventTimeDistinct
    from haystack_traces_spark.streaming.neardup_stream import read_verdicts

    schema = "doc_id long, ts long, value string"

    def run(tag, compact):
        gate = EventTimeDistinct(
            str(tmp_path / f"s_{tag}"), str(tmp_path / f"o_{tag}"),
            delay_us=100, hour_us=1000,
        )
        gate.process_batch(
            spark.createDataFrame(
                [(i, 1 + i * 100, f"v{i % 5}") for i in range(4)], schema
            ),
            0,
        )
        gate.process_batch(
            spark.createDataFrame(
                [(i, 1 + i * 100, f"v{i % 5}") for i in range(4, 8)], schema
            ),
            1,
        )
        if compact:
            gate.compact_state(spark)
        gate.process_batch(
            spark.createDataFrame([(10, 1500, "x")], schema), 2
        )
        return sorted(
            tuple(r)
            for r in read_verdicts(spark, str(tmp_path / f"o_{tag}")).collect()
        )

    assert run("plain", False) == run("compact", True)


def test_kmv_overlap_event_backfill_equals_batch(spark, tmp_path):
    """EventTimeServiceOverlap (r12b): the event-time pairwise service-
    overlap KMV gate, backfilled over files NOT in event order with a
    redelivered chunk, equals the hourly_kmv_overlap batch face EXACTLY
    and is batching-invariant. k=4 forces the min-k TRUNCATION path (the
    per-batch min-k union must still contain the global min-k), verified
    by at least one engaged (estimating, theta < 2^60) pair."""
    import json

    from haystack_traces_spark.streaming.kmv_stream import (
        EventTimeServiceOverlap,
        hourly_kmv_overlap,
    )
    from haystack_traces_spark.streaming.neardup_stream import (
        read_verdicts,
        run_neardup_backfill,
    )

    hour_us = 1000
    k = 4
    schema = "doc_id long, ts long, svc string, value string"
    recs = []
    i = 0
    for hour in range(3):
        for j in range(24):
            # traces t{hour}_{j%12}: services a and b share the even
            # ones, c shares a disjoint half — >k distinct per (hour,svc)
            t = f"t{hour}_{j % 12}"
            for svc in (["a", "b"] if j % 2 == 0 else ["a", "c"]):
                recs.append(
                    {"doc_id": i, "ts": hour * hour_us + (j % 7) * 100 + 1,
                     "svc": svc, "value": t}
                )
                i += 1

    def backfill(splits, tag):
        src = tmp_path / f"src_{tag}"
        src.mkdir()
        for j, chunk in enumerate(splits):
            with open(src / f"part{j}.json", "w") as f:
                for r in chunk:
                    f.write(json.dumps(r) + "\n")
        run_neardup_backfill(
            spark, str(src), str(tmp_path / f"state_{tag}"),
            str(tmp_path / f"out_{tag}"), str(tmp_path / f"ckpt_{tag}"),
            gate_cls=EventTimeServiceOverlap, schema=schema,
            hour_us=hour_us, k=k,
        )
        return sorted(
            tuple(r)
            for r in read_verdicts(
                spark, str(tmp_path / f"out_{tag}")
            ).collect()
        )

    got_a = backfill([recs[60:], recs[:25], recs[25:60]], "a")
    got_b = backfill([recs[:80], recs[40:], recs[:15]], "b")
    frame = spark.createDataFrame(
        [(r["doc_id"], r["ts"], r["svc"], r["value"]) for r in recs], schema
    )
    want = sorted(
        tuple(r) for r in hourly_kmv_overlap(frame, hour_us, k=k).collect()
    )
    assert got_a == want
    assert got_b == want
    # 3 hours x 3 service pairs, every pair row present
    assert len(want) == 9
    # truncation engaged: with 12 distinct traces per (hour, svc) and
    # k=4 the estimator must actually estimate somewhere (non-integer
    # n_est betrays the 2^60/theta scaling), and a<b overlap is nonzero
    assert any(v[3] != int(v[3]) for v in want)
    assert all(v[3] >= 0 for v in want)


def test_kmv_gate_compact_state_mid_stream_equivalence(spark, tmp_path):
    """EventTimeServiceOverlap keeps the hour-gate compaction contract
    ((hour_ts, svc, h) are moment KEYS, delivery count the summed
    moment): compacting mid-stream changes no later verdict, even with
    per-batch min-k truncation in play (k=2)."""
    from haystack_traces_spark.streaming.kmv_stream import (
        EventTimeServiceOverlap,
    )
    from haystack_traces_spark.streaming.neardup_stream import read_verdicts

    schema = "doc_id long, ts long, svc string, value string"

    def run(tag, compact):
        gate = EventTimeServiceOverlap(
            str(tmp_path / f"s_{tag}"), str(tmp_path / f"o_{tag}"),
            delay_us=100, hour_us=1000, k=2,
        )
        gate.process_batch(
            spark.createDataFrame(
                [(i, 1 + i * 60, "a" if i % 2 else "b", f"t{i % 4}")
                 for i in range(8)],
                schema,
            ),
            0,
        )
        gate.process_batch(
            spark.createDataFrame(
                [(i, 1 + i * 60, "a", f"t{i % 4}") for i in range(8, 14)],
                schema,
            ),
            1,
        )
        if compact:
            gate.compact_state(spark)
        gate.process_batch(
            spark.createDataFrame([(20, 2500, "b", "t9")], schema), 2
        )
        return sorted(
            tuple(r)
            for r in read_verdicts(
                spark, str(tmp_path / f"o_{tag}")
            ).collect()
        )

    assert run("plain", False) == run("compact", True)
