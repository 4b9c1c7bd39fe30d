"""Bucket-occupancy guard for the LSH-family candidate self-joins.

Every near-dup / ANN candidate generator in this package joins bucket rows
against themselves on a bucket key (MinHash band, SimHash segment,
hyperplane bucket). Candidate volume out of that join is Σ m_b² over bucket
occupancies m_b — one degenerate bucket (boilerplate / near-constant text,
zero vectors) makes the join OUTPUT quadratic in that bucket's size, which
no amount of AQE skew-splitting fixes (AQE re-plans the shuffle, not the
row count). Invisible at sf0.1; the classic near-dup-pipeline incident at
100 TB.

:func:`cap_buckets` is the shared guard, mirroring the ``max_df`` gram
guard in ``substring_run_pairs`` (dedup.py): buckets whose occupancy
exceeds ``max_bucket`` are dropped from candidate generation BEFORE the
self-join, and the drop is logged + recorded (no silent caps — SCALE.md).
Dropping a bucket costs recall only, never precision: every emitted
candidate is still exact-verified downstream, and a bucket that hot is
near-useless for discrimination anyway (its members collide on everything).

The default cap is sized to be inactive at the driver's test scales
(≤5k docs / ≤2k vectors through sf0.1) so the DuckDB oracles — which do
not model the cap — stay exact; a 100 TB deployment should dial it down
to ~1–10k alongside bands/planes.
"""

from __future__ import annotations

import logging
from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from haystack_traces_spark.session import materialize

log = logging.getLogger(__name__)

DEFAULT_MAX_BUCKET = 50_000

#: test/ops-visible record of the last cap decision per call-site label
last_cap_stats: dict[str, dict] = {}


def cap_buckets(
    buckets: DataFrame,
    key_cols: Sequence[str],
    max_bucket: int | None,
    label: str,
) -> DataFrame:
    """Drop bucket rows belonging to buckets with occupancy > ``max_bucket``.

    One aggregate pass computes occupancies; the hot set (≤ N/cap buckets,
    tiny in practice) is materialized, its size logged, and removed with a
    broadcast anti-join. When no bucket is hot — the overwhelmingly common
    case — the input plan is returned UNCHANGED, so the guard adds one
    small aggregate job and zero join overhead.
    """
    if not max_bucket:
        return buckets
    keys = list(key_cols)
    occ = buckets.groupBy(*keys).agg(F.count(F.lit(1)).alias("_occ"))
    hot = occ.filter(F.col("_occ") > max_bucket)
    # ONE eager job on the common (no hot bucket) path; the hot set is only
    # materialized for the anti-join when it is non-empty (rare path)
    stats = hot.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.coalesce(F.sum("_occ"), F.lit(0)).cast("long").alias("n_rows"),
    ).first()
    last_cap_stats[label] = {
        "max_bucket": max_bucket,
        "n_buckets_dropped": stats["n_buckets"],
        "n_rows_dropped": stats["n_rows"],
    }
    if stats["n_buckets"]:
        log.warning(
            "%s: dropped %d hot buckets (%d bucket rows) over occupancy cap %d"
            " — lost recall, not precision (candidates are exact-verified)",
            label,
            stats["n_buckets"],
            stats["n_rows"],
            max_bucket,
        )
        return buckets.join(
            F.broadcast(materialize(hot.select(*keys))), keys, "left_anti"
        )
    return buckets
