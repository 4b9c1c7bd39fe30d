"""Partition-drop retention (TTL analog) tests."""

from __future__ import annotations

from pathlib import Path

from haystack_traces_spark.operators.retention import (
    drop_expired_partitions,
    expired_partitions,
)

# fixed "now": 2024-01-10 00:00 UTC
NOW_MS = 1_704_844_800_000


def _mk_index(tmp_path: Path) -> Path:
    idx = tmp_path / "trace_index"
    for dt in ["2024-01-01", "2024-01-06", "2024-01-09"]:
        for hb in ["0", "2"]:
            d = idx / f"dt={dt}" / f"hb={hb}"
            d.mkdir(parents=True)
            (d / "part-0.parquet").write_bytes(b"x")
    return idx


def test_expired_partitions_respects_horizon(tmp_path):
    idx = _mk_index(tmp_path)
    # 72h horizon from 2024-01-10 → 2024-01-07; the 01 and 06 partitions expire
    exp = [p.name for p in expired_partitions(str(idx), 72, NOW_MS)]
    assert exp == ["dt=2024-01-01", "dt=2024-01-06"]


def test_drop_is_idempotent_and_preserves_live_data(tmp_path):
    idx = _mk_index(tmp_path)
    dropped = drop_expired_partitions(str(idx), 72, NOW_MS)
    assert dropped == ["dt=2024-01-01", "dt=2024-01-06"]
    assert (idx / "dt=2024-01-09" / "hb=0" / "part-0.parquet").exists()
    assert drop_expired_partitions(str(idx), 72, NOW_MS) == []


def test_missing_path_is_noop(tmp_path):
    assert drop_expired_partitions(str(tmp_path / "nope"), 72, NOW_MS) == []
