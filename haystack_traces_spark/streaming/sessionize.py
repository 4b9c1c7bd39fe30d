"""T1/T2/T4 — trace sessionization as a custom stateful streaming operator
(SURVEY.md §2.2).

Reference semantics (indexer/.../store/impl/SpanBufferMemoryStore.scala:78-126,
SpanIndexProcessor.scala:69-128, indexer/README.md:1-20):

- key = traceId; the first span opens a buffer stamped firstSpanSeenAt,
- the buffer EMITS when `now - window > firstSpanSeenAt` — a fixed window
  anchored at first-seen processing time, NOT an inactivity gap,
- spans arriving after emission reopen a fresh buffer → a second emitted
  row for the same traceId (T4 late data); readers re-union via groupBy,
- optional max-spans cap force-emits oversized buffers (T2 per-key guard),
- optional GLOBAL span budget (T2 full semantics): the reference divides
  ``maxEntriesAllStores`` evenly across live stores
  (indexer/.../store/DynamicCacheSizer.scala:26-66) and LRU-evicts, force-
  emitting partial buffers (SpanBufferMemoryStore.scala:55-65). Here the
  "stores" are the state partitions: the global budget divides evenly by
  shuffle partition, each partition tracks its aggregate spans-in-state,
  and an insert that would exceed the budget force-emits that buffer as a
  partial ("evicted"). Victim choice differs from the reference (the
  inserting key sheds, not the LRU eldest — per-key state functions cannot
  reach other keys' state), but the pressure-relief contract is identical:
  over-budget partitions emit partials instead of growing without bound.
  The counter lives in the (reused) Python worker process keyed by
  partition id; a partition's task can land on a different worker in a
  later micro-batch (or the worker can restart), which orphans previously
  counted spans — so enforcement is really per (worker, partition)
  fragment, bounded in the worst case by workers × budget rather than the
  budget exactly. Approximate accounting is accepted the same way the
  reference's even division ignores actual per-store skew; the guarantee
  that matters — state pressure always produces partial emission instead
  of unbounded growth — holds per fragment.

Spark mapping: ``groupBy(trace_id).applyInPandasWithState`` with
ProcessingTimeTimeout. State holds the buffered spans; the timeout is
re-armed to the REMAINING anchored window on every invocation (GroupState
clears timers each call). Timers fire when a micro-batch runs — under
continuous traffic that is every trigger; with a fully idle source, emission
waits for the next arriving batch, the same way the reference's sweep only
runs on its consumer poll loop (SpanIndexProcessor.scala:108-128). This runs identically on
one executor or a thousand — state is partitioned by the shuffle on
trace_id and checkpointed (the reference's hand-rolled offset math becomes
Structured Streaming's WAL, SURVEY §2.2 T3).
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEFAULT_WINDOW_MS = 10_000  # span.accumulate.window.ms (indexer base.conf:10)

# Emitted SpanBuffer row (flat JSON-encoded spans keep state/output schemas
# simple and engine-version stable; downstream re-parses into SPAN structs).
BUFFER_SCHEMA = T.StructType(
    [
        T.StructField("trace_id", T.StringType()),
        T.StructField("first_seen_ms", T.LongType()),
        T.StructField("emitted_ms", T.LongType()),
        T.StructField("n_spans", T.IntegerType()),
        T.StructField("emit_reason", T.StringType()),  # window | overflow | final
        T.StructField("spans_json", T.ArrayType(T.StringType())),
    ]
)

# State holds the buffered spans as ONE zlib-compressed blob of
# RS-delimited JSON rather than an array of JSON strings: span JSON is
# highly repetitive (schema keys, shared trace_id), so the blob is
# typically 3-10x smaller — directly shrinking RocksDB state, checkpoint
# IO, and the per-batch state (de)serialization at scale. The compression
# boundary is invisible outside this module (emitted buffers still carry
# plain spans_json).
STATE_SCHEMA = T.StructType(
    [
        T.StructField("first_seen_ms", T.LongType()),
        T.StructField("packed", T.BinaryType()),
    ]
)

_RS = "\x1e"  # ASCII record separator — never appears in JSON output


def _pack_spans(spans: list[str]) -> bytes:
    import zlib

    return zlib.compress(_RS.join(spans).encode("utf-8"), 1)


def _unpack_spans(blob) -> list[str]:
    import zlib

    if blob is None:
        return []
    text = zlib.decompress(bytes(blob)).decode("utf-8")
    return text.split(_RS) if text else []


# Per-partition aggregate spans-in-state, keyed by state partition id. Lives
# in the (reused) Python worker process — the DynamicCacheSizer analog.
_PARTITION_SPANS: dict[int, int] = {}


def _partition_id() -> int:
    from pyspark import TaskContext

    ctx = TaskContext.get()
    return ctx.partitionId() if ctx is not None else -1


def _track(pid: int, delta: int) -> None:
    _PARTITION_SPANS[pid] = max(0, _PARTITION_SPANS.get(pid, 0) + delta)


def reset_budget_tracker() -> None:
    """Test hook: clear the per-partition accounting."""
    _PARTITION_SPANS.clear()


def make_session_fn(
    window_ms: int = DEFAULT_WINDOW_MS,
    max_spans: int | None = None,
    partition_span_budget: int | None = None,
):
    """Build the stateful function; extracted for direct unit testing."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        trace_id = key[0]
        now_ms = int(time.time() * 1000)
        pid = _partition_id()

        if state.hasTimedOut:
            first_seen, packed = state.get
            spans = _unpack_spans(packed)
            state.remove()
            _track(pid, -len(spans))
            yield _buffer_pdf(trace_id, first_seen, now_ms, spans, "window")
            return

        new_spans: list[str] = []
        for pdf in pdfs:
            new_spans.extend(pdf["span_json"].tolist())

        if state.exists:
            first_seen, packed = state.get
            held_spans = _unpack_spans(packed)
            held = len(held_spans)
            spans = held_spans + new_spans
        else:
            first_seen, spans, held = now_ms, new_spans, 0

        if max_spans is not None and len(spans) >= max_spans:
            state.remove()
            _track(pid, -held)
            yield _buffer_pdf(trace_id, first_seen, now_ms, spans, "overflow")
            return

        # T2 global budget: if storing this buffer would push the partition
        # over its share of the global cap, force-emit it now as a partial
        # (DynamicCacheSizer pressure semantics; see module docstring for the
        # victim-choice difference vs the reference's LRU eldest)
        if (
            partition_span_budget is not None
            and _PARTITION_SPANS.get(pid, 0) - held + len(spans)
            > partition_span_budget
        ):
            state.remove()
            _track(pid, -held)
            yield _buffer_pdf(trace_id, first_seen, now_ms, spans, "evicted")
            return

        # Anchored window: emit `window_ms` after FIRST-seen, never extended
        # by later spans. GroupState clears the timer on every invocation, so
        # re-arm with the REMAINING window; if already expired (a span landed
        # between expiry and the sweep — the reference appends then emits,
        # SpanIndexProcessor.scala:108-128), emit right away.
        remaining = first_seen + window_ms - now_ms
        if remaining <= 0:
            state.remove()
            _track(pid, -held)
            yield _buffer_pdf(trace_id, first_seen, now_ms, spans, "window")
            return

        state.update((first_seen, _pack_spans(spans)))
        _track(pid, len(spans) - held)
        state.setTimeoutDuration(int(remaining))
        yield _empty_buffer_pdf()

    return fn


def _buffer_pdf(trace_id, first_seen, now_ms, spans, reason) -> pd.DataFrame:
    return pd.DataFrame(
        [
            {
                "trace_id": trace_id,
                "first_seen_ms": int(first_seen),
                "emitted_ms": int(now_ms),
                "n_spans": len(spans),
                "emit_reason": reason,
                "spans_json": list(spans),
            }
        ]
    )


def _empty_buffer_pdf() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "trace_id": pd.Series(dtype="object"),
            "first_seen_ms": pd.Series(dtype="int64"),
            "emitted_ms": pd.Series(dtype="int64"),
            "n_spans": pd.Series(dtype="int32"),
            "emit_reason": pd.Series(dtype="object"),
            "spans_json": pd.Series(dtype="object"),
        }
    )


def sessionize(
    span_stream: DataFrame,
    window_ms: int = DEFAULT_WINDOW_MS,
    max_spans: int | None = None,
    global_span_budget: int | None = None,
) -> DataFrame:
    """spans stream (any schema with trace_id) → emitted SpanBuffer stream.

    Input rows are JSON-packed per span so arbitrary span schemas flow
    through one stable state schema. ``global_span_budget`` mirrors the
    reference's ``maxEntriesAllStores`` (20 000 spans, indexer base.conf:7-8),
    divided evenly across state partitions like DynamicCacheSizer divides it
    across stores.
    """
    partition_budget = None
    if global_span_budget is not None:
        n_parts = int(
            span_stream.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
        partition_budget = max(1, global_span_budget // max(n_parts, 1))
    packed = span_stream.select(
        F.col("trace_id"),
        F.to_json(F.struct(*[c for c in span_stream.columns])).alias("span_json"),
    )
    return packed.groupBy("trace_id").applyInPandasWithState(
        make_session_fn(window_ms, max_spans, partition_budget),
        outputStructType=BUFFER_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# ---------------------------------------------------------------- event-time
# VERDICT r6 ask #2: the reference's T1 is PROCESSING-time
# (SpanIndexProcessor.scala:108-128 sweeps on the consumer poll clock), which
# is the right trade for live indexing but NON-deterministic — two replays of
# the same corpus batch differently and cut different buffers. A 100 TB
# backfill needs a face whose output is a pure function of the DATA, so this
# face keys every decision on EVENT time + the watermark:
#
# - an island's membership is decided by event timestamps alone
#   ("anchored" = the T1 window-from-first-seen rule transplanted onto event
#   time: island = [t0, t0 + horizon); "gap" = classic inactivity-gap
#   sessionization, the exact rule of the `event_sessions` batch operator),
# - an island EMITS only when the watermark proves no admissible event can
#   still join it — never on a wall clock,
# - replay determinism contract: the emitted (key, session_start,
#   session_end, n_events, events) multiset equals the batch recomputation
#   on the same corpus, as long as the watermark delay covers the source's
#   event-time disorder (events later than the watermark are dropped by
#   Spark before the operator — the same bounded-lateness trade as
#   streaming/metrics.py, and the reason the PROCESSING-time face stays the
#   live default: it never drops, it re-emits (T4)).
#
# Which face replays deterministically and why → SCALE.md §6.

EVENT_SESSION_SCHEMA = T.StructType(
    [
        T.StructField("skey", T.StringType()),
        T.StructField("session_start", T.LongType()),  # event µs
        T.StructField("session_end", T.LongType()),    # event µs
        T.StructField("n_events", T.IntegerType()),
        T.StructField("events_json", T.ArrayType(T.StringType())),
    ]
)

EVENT_STATE_SCHEMA = T.StructType([T.StructField("packed", T.BinaryType())])

_TS_SEP = " "  # packed line = "<ts_us> <json>"; JSON never starts with space


def _split_islands(
    events: list[tuple[int, str]], mode: str, horizon_us: int
) -> list[list[tuple[int, str]]]:
    """Sorted (ts, json) events → islands under the mode's rule. Pure —
    the single definition both emission and close-threshold logic use."""
    islands: list[list[tuple[int, str]]] = []
    for ev in events:
        if not islands:
            islands.append([ev])
            continue
        cur = islands[-1]
        if mode == "gap":
            splits = ev[0] - cur[-1][0] > horizon_us
        else:  # anchored: island = [t0, t0 + horizon)
            splits = ev[0] >= cur[0][0] + horizon_us
        (islands.append([ev]) if splits else cur.append(ev))
    return islands


def _close_threshold_us(island: list[tuple[int, str]], mode: str, horizon_us: int) -> int:
    """Earliest event time at which NO admissible future event could still
    join this island: gap → last_ts + horizon (an event exactly at the
    threshold still joins, hence strict compare at the call site);
    anchored → t0 + horizon (membership is [t0, t0+horizon))."""
    if mode == "gap":
        return island[-1][0] + horizon_us
    return island[0][0] + horizon_us


def make_event_session_fn(mode: str, horizon_us: int):
    """Build the event-time stateful function (extracted for unit tests).

    One path for data and timeout: merge held+new events, split into
    islands, emit every island the CURRENT WATERMARK has definitively
    closed, keep the rest, arm the timer at the earliest future close.
    The watermark is the only clock touched — output is replayable."""
    if mode not in ("gap", "anchored"):
        raise ValueError(f"unknown event-time session mode {mode!r}")

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        skey = key[0]
        events: list[tuple[int, str]] = []
        if state.exists:
            for line in _unpack_spans(state.get[0]):
                ts, j = line.split(_TS_SEP, 1)
                events.append((int(ts), j))
        if not state.hasTimedOut:
            for pdf in pdfs:
                events.extend(
                    zip(pdf["ts_us"].astype("int64").tolist(), pdf["span_json"].tolist())
                )
        # total order (ts, json) — deterministic islands at equal timestamps
        events.sort()
        wm_us = state.getCurrentWatermarkMs() * 1000
        out_rows = []
        keep: list[tuple[int, str]] = []
        next_close: int | None = None
        for island in _split_islands(events, mode, horizon_us):
            close = _close_threshold_us(island, mode, horizon_us)
            # gap: an event exactly AT last+gap still joins → close only
            # when the watermark is strictly past; anchored: membership is
            # half-open, an event at t0+horizon opens a NEW island → >= is
            # enough. Closing exactly at the provable boundary is what
            # makes replay equal the batch recomputation.
            closed = (wm_us > close) if mode == "gap" else (wm_us >= close)
            if closed:
                out_rows.append(
                    {
                        "skey": skey,
                        "session_start": island[0][0],
                        "session_end": island[-1][0],
                        "n_events": len(island),
                        "events_json": [j for _, j in island],
                    }
                )
            else:
                keep.extend(island)
                if next_close is None:
                    next_close = close
        if keep:
            state.update(
                (_pack_spans([f"{ts}{_TS_SEP}{j}" for ts, j in keep]),)
            )
            # ceil to ms and land strictly past the close boundary: the
            # timer must fire only once the watermark PROVES closure under
            # the compares above (gap needs strictly-greater)
            timeout_ms = -(-(next_close) // 1000) + 1
            state.setTimeoutTimestamp(max(timeout_ms, state.getCurrentWatermarkMs() + 1))
        else:
            state.remove()
        if out_rows:
            yield pd.DataFrame(out_rows, columns=[f.name for f in EVENT_SESSION_SCHEMA.fields])

    return fn


def sessionize_event_time(
    stream: DataFrame,
    ts_us_col: str,
    key_col: str = "trace_id",
    mode: str = "anchored",
    horizon_us: int = DEFAULT_WINDOW_MS * 1000,
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """EVENT-time sessionization face (deterministic replay/backfill).

    ``mode="anchored"`` transplants T1's window-from-first-seen onto event
    time (island = [first_event, first_event + horizon)); ``mode="gap"``
    is inactivity-gap sessionization — bit-equal to the batch
    `event_sessions` operator on the same corpus (pinned by
    test_streaming.py). Output: (key_col, session_start, session_end,
    n_events, events_json), all event-time µs — no wall-clock column, so
    two replays produce identical rows. key_col keeps the INPUT's type
    (the state key rides as a string internally, but a replay face whose
    key type differed from the batch face's would break the union/join
    interchangeability the face exists for)."""
    key_type = stream.schema[key_col].dataType
    packed = stream.select(
        F.col(key_col).cast("string").alias("skey"),
        F.col(ts_us_col).cast("long").alias("ts_us"),
        F.to_json(F.struct(*stream.columns)).alias("span_json"),
        F.timestamp_micros(F.col(ts_us_col).cast("long")).alias("event_time"),
    ).withWatermark("event_time", watermark_delay)
    out = packed.groupBy("skey").applyInPandasWithState(
        make_event_session_fn(mode, horizon_us),
        outputStructType=EVENT_SESSION_SCHEMA,
        stateStructType=EVENT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    return out.select(
        F.col("skey").cast(key_type).alias(key_col),
        "session_start",
        "session_end",
        "n_events",
        "events_json",
    )


def buffers_to_spans(buffers: DataFrame, span_schema: T.StructType) -> DataFrame:
    """Emitted buffers → flat spans (for writing trace_store/trace_index)."""
    return buffers.select(
        "trace_id",
        F.explode("spans_json").alias("j"),
    ).select(F.from_json("j", span_schema).alias("s")).select("s.*")
