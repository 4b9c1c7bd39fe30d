"""Event-time distinct-cardinality monitoring: an hour-bucketed
HyperLogLog gate riding :class:`EventTimeHourGate` — "how many distinct
X arrived for hour H", finalized when the watermark passes H's end.

The state trick that keeps the hour-gate compaction contract intact:
register observations ride in the moment log as KEYED rows
(hour_ts, reg, rho) with a summed count, NOT as a max column — max is
associative but the base's lossless-compaction proof is written for
per-key SUMs, so the max moves into the verdict (which takes
max(rho) per (hour, reg) over the final moment rows). Worst-case state
per hour is the tiny 2^p × (60-p+1) key grid, usually far less.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from haystack_traces_spark.datapipe.text import (
    HLL_P,
    hll_estimate,
    hll_register_rows,
)
from haystack_traces_spark.streaming.quality_stream import EventTimeHourGate

HLL_HOUR_US = 3_600_000_000


class EventTimeDistinct(EventTimeHourGate):
    """EVENT-TIME distinct-cardinality gate: per finalized hour, the HLL
    estimate of distinct ``value`` strings — the streaming face of
    :func:`hourly_distinct_hll` (equal under ANY batching, pinned by the
    backfill==batch test). Monitoring shape: distinct trace ids, users,
    or tokens per hour without keeping any of them in state.

    Input rows: (doc_id long, ts long, value string) — doc_id is the
    delivery identity for redelivery dedup, value the thing being
    counted. Emitted verdicts: (hour_ts, n_hll)."""

    _INPUT_COLS = ("value",)
    _MOMENT_SCHEMA = "hour_ts long, reg int, rho int, n long"
    _MOMENT_KEYS = ("hour_ts", "reg", "rho")

    def __init__(
        self,
        state_dir: str,
        out_dir: str,
        delay_us: int,
        hour_us: int = HLL_HOUR_US,
        p: int = HLL_P,
    ):
        super().__init__(state_dir, out_dir, delay_us, hour_us)
        self.p = int(p)

    def moment_rows(self, new: DataFrame) -> DataFrame:
        return (
            hll_register_rows(
                new.select(self._hour_col(), "value"),
                "value",
                ("hour_ts",),
                self.p,
            )
            .groupBy("hour_ts", "reg", "rho")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )

    def verdict_rows(self, final_moments: DataFrame) -> DataFrame:
        regs = final_moments.groupBy("hour_ts", "reg").agg(
            F.max("rho").alias("mr")
        )
        return hll_estimate(regs, ("hour_ts",), self.p).select(
            "hour_ts", F.round("e", 3).alias("n_hll")
        )


def hourly_distinct_hll(
    rows: DataFrame,
    hour_us: int = HLL_HOUR_US,
    p: int = HLL_P,
    value_col: str = "value",
    ts_col: str = "ts",
) -> DataFrame:
    """BATCH face of :class:`EventTimeDistinct` over an at-rest frame —
    identical register rows, max-per-register, estimator; gate-emitted
    verdicts equal this under any batching. → (hour_ts, n_hll)."""
    hours = rows.select(
        (F.col(ts_col) - F.col(ts_col) % hour_us).alias("hour_ts"),
        F.col(value_col).alias("value"),
    )
    regs = hll_register_rows(hours, "value", ("hour_ts",), p).groupBy(
        "hour_ts", "reg"
    ).agg(F.max("rho").alias("mr"))
    return hll_estimate(regs, ("hour_ts",), p).select(
        "hour_ts", F.round("e", 3).alias("n_hll")
    )
