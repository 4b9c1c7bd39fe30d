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

from bench import CALIBRATION_WARM_REF_SEC, Calibrator, detect_regressions, load_history


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
