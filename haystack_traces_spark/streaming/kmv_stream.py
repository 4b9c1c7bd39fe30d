"""Event-time service-overlap monitoring: hour-bucketed K-minimum-values
(theta) sketches riding :class:`EventTimeHourGate` — "how many distinct
traces did services A and B SHARE in hour H", finalized when the
watermark passes H's end. The intersection cardinality HLL gates cannot
give (register maxima only merge as unions); the coupling-drift signal
("these two services stopped sharing traffic") without keeping any trace
id in state beyond the k smallest hashes.

Why per-batch min-k truncation is lossless for the verdict: every member
of the GLOBAL k-minimum set of (hour, svc) is also in the k-minimum set
of whichever batch delivered it, so the union of per-batch min-k moment
rows is a superset of the global min-k — re-truncating the merged state
at verdict time recovers the at-rest sketch EXACTLY, which is why the
gate equals the batch face under ANY batching (pinned by test). State
per (hour, svc) is ≤ k rows per delivering batch, and the base's per-key
SUM compaction applies unchanged ((hour_ts, svc, h) are moment KEYS; the
delivery count is the summed moment).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from haystack_traces_spark.datapipe.hashing import hash60
from haystack_traces_spark.streaming.quality_stream import EventTimeHourGate

KMV_HOUR_US = 3_600_000_000
KMV_STREAM_K = 256
_H_MAX = 1 << 60  # hash60 range; theta of an exact (un-truncated) sketch


def _min_k(rows: DataFrame, k: int, keys: tuple) -> DataFrame:
    """(keys..., svc, h) → the k smallest h per (keys, svc), with rn."""
    w = Window.partitionBy(*keys, "svc").orderBy("h")
    return rows.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )


def kmv_pair_estimates(
    sk: DataFrame, k: int, keys: tuple = ("hour_ts",)
) -> DataFrame:
    """Min-k sketch rows (keys..., svc, h, rn) → per-key pairwise theta
    intersection estimates (keys..., s1, s2, n_est). Same estimator as
    the corpus-wide registry face (entry_queries.kmv_overlap_from):
    theta = min of the two services' k-th smallest hashes (2^60 when a
    sketch holds its whole set), scale the sub-theta hash matches by
    2^60/theta. Pairs with zero matches are kept at 0.0 via the full
    service-pair grid."""
    kcols = list(keys)
    thetas = sk.groupBy(*kcols, "svc").agg(
        F.coalesce(
            F.max(F.when(F.col("rn") == k, F.col("h"))), F.lit(_H_MAX)
        ).alias("theta")
    )
    a, b = thetas.alias("a"), thetas.alias("b")
    cond = F.col("a.svc") < F.col("b.svc")
    for c in kcols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    # explicit broadcast: with keys=() the condition is inequality-only
    # and thetas descends from a localCheckpoint with unknown stats —
    # without the hint the planner may pick CartesianProduct
    grid = a.join(F.broadcast(b), cond).select(
        *[F.col(f"a.{c}") for c in kcols],
        F.col("a.svc").alias("s1"),
        F.col("b.svc").alias("s2"),
        F.least("a.theta", "b.theta").alias("theta"),
    )
    sa, sb = sk.alias("sa"), sk.alias("sb")
    mcond = (F.col("sa.h") == F.col("sb.h")) & (
        F.col("sa.svc") < F.col("sb.svc")
    )
    for c in kcols:
        mcond = mcond & (F.col(f"sa.{c}") == F.col(f"sb.{c}"))
    matches = (
        sa.join(sb, mcond)
        .select(
            *[F.col(f"sa.{c}") for c in kcols],
            F.col("sa.svc").alias("s1"),
            F.col("sb.svc").alias("s2"),
            F.col("sa.h").alias("h"),
        )
        .join(grid, kcols + ["s1", "s2"])
        .filter(F.col("h") < F.col("theta"))
        .groupBy(*kcols, "s1", "s2")
        .agg(F.count(F.lit(1)).cast("long").alias("matches"))
    )
    return grid.join(matches, kcols + ["s1", "s2"], "left").select(
        *kcols,
        "s1",
        "s2",
        F.round(
            F.coalesce("matches", F.lit(0)).cast("double")
            * F.lit(float(_H_MAX))
            / F.col("theta").cast("double"),
            3,
        ).alias("n_est"),
    )


class EventTimeServiceOverlap(EventTimeHourGate):
    """EVENT-TIME pairwise service-overlap gate: per finalized hour, the
    KMV estimate of distinct shared trace ids for every service pair —
    the streaming face of :func:`hourly_kmv_overlap` (equal under ANY
    batching, pinned by the backfill==batch test).

    Input rows: (doc_id long, ts long, svc string, value string) —
    doc_id is the delivery identity for redelivery dedup, svc the
    service, value the trace id. Emitted verdicts:
    (hour_ts, s1, s2, n_est)."""

    _INPUT_COLS = ("svc", "value")
    _MOMENT_SCHEMA = "hour_ts long, svc string, h long, n long"
    _MOMENT_KEYS = ("hour_ts", "svc", "h")

    def __init__(
        self,
        state_dir: str,
        out_dir: str,
        delay_us: int,
        hour_us: int = KMV_HOUR_US,
        k: int = KMV_STREAM_K,
    ):
        super().__init__(state_dir, out_dir, delay_us, hour_us)
        self.k = int(k)

    def moment_rows(self, new: DataFrame) -> DataFrame:
        # NULL trace ids hash to NULL, and NULLS FIRST ranking would let
        # one occupy a sketch slot and shrink theta — drop them up front
        hashed = new.filter(F.col("value").isNotNull()).select(
            self._hour_col(),
            "svc",
            hash60(F.col("value"), seed="kmv:").alias("h"),
        )
        dedup = hashed.groupBy("hour_ts", "svc", "h").agg(
            F.count(F.lit(1)).cast("long").alias("n")
        )
        # per-batch min-k truncation: state stays ~k rows per (hour, svc)
        # per batch; the global min-k survives (see module docstring)
        return _min_k(dedup, self.k, ("hour_ts",)).drop("rn")

    def verdict_rows(self, final_moments: DataFrame) -> DataFrame:
        sk = _min_k(
            final_moments.select("hour_ts", "svc", "h").distinct(),
            self.k,
            ("hour_ts",),
        )
        return kmv_pair_estimates(sk, self.k).select(
            "hour_ts", "s1", "s2", "n_est"
        )


def hourly_kmv_overlap(
    rows: DataFrame,
    hour_us: int = KMV_HOUR_US,
    k: int = KMV_STREAM_K,
    svc_col: str = "svc",
    value_col: str = "value",
    ts_col: str = "ts",
) -> DataFrame:
    """BATCH face of :class:`EventTimeServiceOverlap` over an at-rest
    frame — identical hashing, min-k sketch and estimator; gate-emitted
    verdicts equal this under any batching. → (hour_ts, s1, s2, n_est)."""
    hours = (
        rows.filter(F.col(value_col).isNotNull())
        .select(
            (F.col(ts_col) - F.col(ts_col) % hour_us).alias("hour_ts"),
            F.col(svc_col).alias("svc"),
            hash60(F.col(value_col), seed="kmv:").alias("h"),
        )
        .distinct()
    )
    sk = _min_k(hours, k, ("hour_ts",))
    return kmv_pair_estimates(sk, k).select("hour_ts", "s1", "s2", "n_est")
