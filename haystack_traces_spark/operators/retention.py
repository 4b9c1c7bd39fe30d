"""Retention — the engine's analog of the reference's TTLs (SURVEY.md §6):
Cassandra writes carry a per-record TTL (CassandraSession.scala:78-90, DDL at
backends/cassandra/src/main/resources/config/base.conf:57) and the ES spans
index expires after ``hour.ttl`` = 72 h (reader base.conf:38-39).

With time-partitioned parquet (dt, hb), expiry is a metadata operation:
drop whole partition directories older than the horizon. No compaction, no
tombstones, no scan — at 100 TB this is the entire point of partitioning the
index by time.
"""

from __future__ import annotations

import shutil
from datetime import datetime, timedelta, timezone
from pathlib import Path


def expired_partitions(
    index_path: str, ttl_hours: int = 72, now_ms: int | None = None
) -> list[Path]:
    """List dt=... partition directories entirely older than the TTL."""
    now = (
        datetime.fromtimestamp(now_ms / 1e3, tz=timezone.utc)
        if now_ms is not None
        else datetime.now(tz=timezone.utc)
    )
    horizon = (now - timedelta(hours=ttl_hours)).strftime("%Y-%m-%d")
    out = []
    root = Path(index_path)
    if not root.exists():
        return out
    for p in sorted(root.glob("dt=*")):
        if p.is_dir() and p.name.split("=", 1)[1] < horizon:
            out.append(p)
    return out


def drop_expired_partitions(
    index_path: str, ttl_hours: int = 72, now_ms: int | None = None
) -> list[str]:
    """Drop expired dt partitions; returns the dropped directory names.

    Idempotent; safe to run as a periodic maintenance job (the Spark analog
    of ES index deletion / Cassandra TTL reaping).
    """
    dropped = []
    for p in expired_partitions(index_path, ttl_hours, now_ms):
        shutil.rmtree(p, ignore_errors=True)
        dropped.append(p.name)
    return dropped
