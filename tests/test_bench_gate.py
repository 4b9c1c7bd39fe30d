"""Bench harness gates — pure-Python, no Spark session needed.

VERDICT r10 asks #1/#2: the interleaved box-speed normalizer and the
per-line regression gate. These tests pin the detection logic with
synthetic histories so a regression in the gate itself is caught
without running the 300-line sf0.1 bench.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import (
    CALIBRATION_WARM_REF_SEC,
    Calibrator,
    adjudicate_regressions,
    detect_regressions,
    load_history,
    quiet_floor,
    ref_drift,
)


def _hist(*maps):
    return [dict(m) for m in maps]


class TestDetectRegressions:
    def test_synthetic_slowdown_detected(self):
        # three committed rounds at ~2 s; current capture at 5 s → >2× median
        history = _hist({"q1": 2.0, "q2": 1.0}, {"q1": 2.1, "q2": 1.1}, {"q1": 1.9, "q2": 0.9})
        current = {"q1": 5.0, "q2": 1.0}
        assert detect_regressions(current, history) == ["q1"]

    def test_flat_lines_not_flagged(self):
        history = _hist({"q1": 2.0}, {"q1": 2.2}, {"q1": 1.8})
        assert detect_regressions({"q1": 2.3}, history) == []

    def test_debut_line_has_no_baseline(self):
        # <2 history observations → never flagged (a new operator's first
        # capture IS its baseline)
        history = _hist({"q1": 2.0}, {"q1": 2.0}, {"q1": 2.0, "new_op": 1.0})
        assert detect_regressions({"new_op": 9.0, "q1": 2.0}, history) == []

    def test_subsecond_noise_floor(self):
        # 0.1 s → 0.4 s is 4× but below the absolute floor: scheduler noise
        history = _hist({"tiny": 0.1}, {"tiny": 0.12}, {"tiny": 0.1})
        assert detect_regressions({"tiny": 0.4}, history) == []

    def test_stage_lines_excluded(self):
        history = _hist({"stage:x": 2.0}, {"stage:x": 2.0})
        assert detect_regressions({"stage:x": 9.0}, history) == []

    def test_median_of_last_three_only(self):
        # older-than-3 entries must not dilute the median: the last three
        # all sit at 1.0, so 2.5 s regresses even though ancient history
        # had a 10 s era
        history = _hist({"q": 10.0}, {"q": 10.0}, {"q": 1.0}, {"q": 1.0}, {"q": 1.0})
        assert detect_regressions({"q": 2.5}, history) == ["q"]

    def test_multiple_sorted(self):
        history = _hist({"b": 1.0, "a": 1.0}, {"b": 1.0, "a": 1.0})
        assert detect_regressions({"b": 3.0, "a": 3.0}, history) == ["a", "b"]


class TestAdjudication:
    """VERDICT r11 ask #1: the rerun verdict. A persistent slowdown keeps
    its flag; a one-off spike (rerun back under threshold) loses it."""

    HIST = [{"q1": 2.0, "q2": 2.0}, {"q1": 2.1, "q2": 2.1}, {"q1": 1.9, "q2": 1.9}]

    def test_persistent_slowdown_keeps_flag(self):
        first = {"q1": 8.0}
        kept, recs = adjudicate_regressions(["q1"], first, {"q1": 7.5}, self.HIST)
        assert kept == ["q1"]
        assert recs == [
            {"line": "q1", "first_sec": 8.0, "rerun_sec": 7.5, "verdict": "persistent"}
        ]

    def test_load_transient_spike_loses_flag(self):
        # first sample 8 s (load burst inside one probe bracket), rerun
        # 2.2 s — under 2× the 2.0 s median → cleared
        kept, recs = adjudicate_regressions(["q1"], {"q1": 8.0}, {"q1": 2.2}, self.HIST)
        assert kept == []
        assert recs[0]["verdict"] == "load-transient"
        assert recs[0]["rerun_sec"] == 2.2

    def test_missing_rerun_fails_loud(self):
        # the operator raised on rerun (or the line has no rerun thunk):
        # the flag must SURVIVE — never silently cleared
        kept, recs = adjudicate_regressions(["q1"], {"q1": 8.0}, {}, self.HIST)
        assert kept == ["q1"]
        assert recs[0]["rerun_sec"] is None
        assert recs[0]["verdict"] == "persistent"

    def test_mixed_verdicts(self):
        kept, recs = adjudicate_regressions(
            ["q1", "q2"], {"q1": 8.0, "q2": 9.0}, {"q1": 2.0, "q2": 8.8}, self.HIST
        )
        assert kept == ["q2"]
        assert [r["verdict"] for r in recs] == ["load-transient", "persistent"]

    def test_rerun_exactly_at_threshold_clears(self):
        # boundary: detection requires STRICTLY > factor × median; a rerun
        # landing exactly at 2× median is therefore under the gate
        kept, recs = adjudicate_regressions(["q1"], {"q1": 8.0}, {"q1": 4.0}, self.HIST)
        assert kept == []


class TestRefDriftGuard:
    """VERDICT r11 ask #2: the pinned warm REF vs the run's own quiet
    floor — box-era drift must flag instead of silently rescaling."""

    def test_quiet_floor_is_median_of_three_fastest(self):
        # probes sorted: [0.20, 0.22, 0.24, 0.9, 1.5] → 3 fastest
        # [0.20, 0.22, 0.24] → median 0.22 (loaded probes ignored)
        assert quiet_floor([0.9, 0.22, 1.5, 0.20, 0.24]) == 0.22

    def test_quiet_floor_short_and_empty(self):
        assert quiet_floor([]) is None
        assert quiet_floor([0.3]) == 0.3
        assert quiet_floor([0.3, 0.2]) == 0.25  # median of 2 = mean

    def test_no_drift_inside_tolerance(self):
        r = CALIBRATION_WARM_REF_SEC
        assert not ref_drift(r)
        assert not ref_drift(r * 1.15)
        assert not ref_drift(r * 0.85)
        assert not ref_drift(None)

    def test_drift_flags_beyond_tolerance(self):
        r = CALIBRATION_WARM_REF_SEC
        assert ref_drift(r * 1.3)  # box got 30% slower at its quiet floor
        assert ref_drift(r * 0.7)  # or 30% faster (new hardware era)


class TestSectionNormalization:
    def _cal(self, probes):
        c = Calibrator.__new__(Calibrator)  # no Spark: inject probes directly
        c.probes = list(probes)
        c.cold_sec = None
        c.overhead = 0.0
        c.enabled = True
        return c

    def test_ratio_uses_bracketing_probes(self):
        # section 1 sits between probes[0]=0.34 and probes[1]=0.68:
        # mean 0.51 → ratio 0.34/0.51
        c = self._cal([CALIBRATION_WARM_REF_SEC, 2 * CALIBRATION_WARM_REF_SEC])
        assert abs(c.ratio_for_section(1) - CALIBRATION_WARM_REF_SEC / (1.5 * CALIBRATION_WARM_REF_SEC)) < 1e-9

    def test_loaded_middle_section_discounted(self):
        # quiet → loaded → quiet box: lines in the loaded era scale DOWN,
        # quiet-era lines stay ~1× — the exact r10 driver-capture failure
        # (a single quiet-moment probe inflated the whole run by 39%)
        r = CALIBRATION_WARM_REF_SEC
        c = self._cal([r, 3 * r, r])
        assert c.ratio_for_section(1) < 0.6  # bracketed by quiet+loaded
        assert c.ratio_for_section(2) < 0.6
        # median ratio is robust to the single loaded probe
        assert abs(c.median_ratio() - 1.0) < 1e-9

    def test_clamps_out_of_range_sections(self):
        c = self._cal([CALIBRATION_WARM_REF_SEC])
        assert c.ratio_for_section(0) == 1.0
        assert c.ratio_for_section(99) == 1.0

    def test_spread_flags_noisy_capture(self):
        r = CALIBRATION_WARM_REF_SEC
        assert self._cal([r, 3 * r, r]).spread() == 3.0
        assert self._cal([]).spread() is None


class TestHistoryFile:
    def test_load_history_roundtrip(self, tmp_path):
        p = tmp_path / "bench_history.jsonl"
        p.write_text(
            json.dumps({"queries_normalized": {"q1": 1.5}}) + "\n"
            + "not json\n"
            + json.dumps({"no_queries": True}) + "\n"
            + json.dumps({"queries_normalized": {"q1": 1.7, "q2": 0.4}}) + "\n"
        )
        hist = load_history(p)
        assert hist == [{"q1": 1.5}, {"q1": 1.7, "q2": 0.4}]

    def test_load_history_missing_file(self, tmp_path):
        assert load_history(tmp_path / "absent.jsonl") == []

    def test_committed_seed_history_parses(self):
        # the repo-tracked seed (r09/r10 captures) must stay loadable —
        # it is the gate's baseline until new sf0.1 captures append
        hist = load_history(Path(__file__).resolve().parent.parent / "bench_history.jsonl")
        assert len(hist) >= 3
        assert all("search_traces" in h for h in hist)
