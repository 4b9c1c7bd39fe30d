"""getTraceCounts — fixed-interval histogram (A3, SURVEY.md §3.3).

Replicates ES ``histogram`` agg semantics (TraceCountsQueryGenerator.scala:76-99
+ ResponseParser.scala:58-69):

- bucket key = floor(starttime / interval) * interval,
- extendedBounds: every bucket between the bounds is emitted even when empty,
- buckets are then **clipped** to [start, end] — a leading partial bucket
  (key < start) is dropped even though matching traces contributed to it.

The empty-bucket frame is a generated sequence (no data shuffle); counts join
into it broadcast.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from haystack_traces_spark.config import DEFAULT_WHITELIST, WhitelistConfig
from haystack_traces_spark.operators.expression import ExpressionTree, compile_expression


@dataclass(frozen=True)
class TraceCountsRequest:
    start_time: int  # micros
    end_time: int
    interval: int  # micros
    expression: ExpressionTree = dc_field(default_factory=ExpressionTree)

    def validate(self) -> None:
        # TraceCountsQueryGenerator.scala:43-45,58-60
        if self.start_time <= 0 or self.end_time <= 0 or self.interval <= 0:
            raise ValueError("start_time, end_time, interval must be > 0")


def trace_counts(
    trace_index: DataFrame,
    req: TraceCountsRequest,
    whitelist: WhitelistConfig = DEFAULT_WHITELIST,
) -> DataFrame:
    """→ (timestamp long, count long), one row per bucket inside [start, end]."""
    req.validate()
    i = req.interval
    bucket = (F.col("starttime") - (F.col("starttime") % i)).cast("long")

    counts = (
        trace_index.filter(F.col("starttime").between(req.start_time, req.end_time))
        .filter(compile_expression(req.expression, whitelist))
        .groupBy(bucket.alias("timestamp"))
        .agg(F.count(F.lit(1)).alias("count"))
    )

    spark = trace_index.sparkSession
    first = (req.start_time // i) * i
    last = (req.end_time // i) * i
    frame = spark.range(first, last + 1, i).select(F.col("id").alias("timestamp"))

    out = (
        frame.join(counts, "timestamp", "left_outer")
        .select(
            "timestamp", F.coalesce(F.col("count"), F.lit(0)).cast("long").alias("count")
        )
        # clip to [start, end] (ResponseParser.scala:63)
        .filter(F.col("timestamp").between(req.start_time, req.end_time))
    )
    return out
