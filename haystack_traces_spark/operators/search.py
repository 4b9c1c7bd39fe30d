"""searchTraces — the reference's main analytical query (SURVEY.md §3.2).

Two-phase index-then-fetch (J1, EsIndexedTraceStore.scala:62-88) expressed as
one Spark job:

  1. predicate + mandatory time-range filter over ``trace_index``
     (partition-pruned by (dt, hb) when present),
  2. top-k by starttime desc (TakeOrderedAndProject — Spark's pushdown of
     the reference's ES sort+size, TraceSearchQueryGenerator.scala:89-97),
  3. broadcast left-semi join into ``trace_store`` — the point-lookup phase,
  4. re-group per trace (J2, TraceMerger.scala:24-34) to merge late-data rows.

At 100 TB the id set after limit(k) is tiny → the semi-join is always a
broadcast hash join, never a shuffle of trace_store.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from haystack_traces_spark.config import DEFAULT_WHITELIST, WhitelistConfig
from haystack_traces_spark.operators.expression import ExpressionTree, compile_expression
from haystack_traces_spark.operators.index import HOURS_PER_BUCKET


@dataclass(frozen=True)
class SearchRequest:
    start_time: int  # micros, inclusive
    end_time: int  # micros, inclusive
    limit: int
    expression: ExpressionTree = dc_field(default_factory=ExpressionTree)

    def validate(self) -> None:
        # fail-fast request validation (TraceSearchQueryGenerator.scala:37-39)
        if self.start_time <= 0 or self.end_time <= 0:
            raise ValueError("start_time and end_time must be > 0")
        if self.limit <= 0:
            raise ValueError("limit must be > 0")


def search_trace_ids(
    trace_index: DataFrame,
    req: SearchRequest,
    whitelist: WhitelistConfig = DEFAULT_WHITELIST,
    use_root_doc_starttime: bool = True,
) -> DataFrame:
    """Phase 1: matching (traceid, starttime), newest `limit` first.

    Ties broken by traceid desc so results are deterministic (the reference
    inherits ES's unspecified tie order; determinism is required for the
    oracle hash-compare).
    """
    req.validate()
    # Partition pruning: when the index table carries the (dt, hb) layout
    # (write_trace_index), derive partition predicates from the time range —
    # the Spark analog of the reference's time-range -> concrete-ES-index-name
    # mapping (SpansIndexQueryGenerator.scala:181-215). String comparison on
    # yyyy-MM-dd is order-correct; Catalyst prunes whole directories before
    # any file is opened.
    if "dt" in trace_index.columns:
        from datetime import datetime, timezone

        lo = datetime.fromtimestamp(req.start_time / 1e6, tz=timezone.utc)
        hi = datetime.fromtimestamp(req.end_time / 1e6, tz=timezone.utc)
        trace_index = trace_index.filter(
            F.col("dt").between(lo.strftime("%Y-%m-%d"), hi.strftime("%Y-%m-%d"))
        )
        if "hb" in trace_index.columns and lo.date() == hi.date():
            # same-day range: also prune the 6 h hour-buckets (the reference
            # addresses individual haystack-traces-{date}-{hour/6} indexes)
            trace_index = trace_index.filter(
                F.col("hb").between(lo.hour // HOURS_PER_BUCKET, hi.hour // HOURS_PER_BUCKET)
            )
    if use_root_doc_starttime:
        time_pred = F.col("starttime").between(req.start_time, req.end_time)
    else:
        # nested variant (reader base.conf:40 use.root.doc.starttime=false)
        time_pred = F.exists(
            F.col("spans"),
            lambda g: F.exists(
                g["starttime"], lambda s: s.between(req.start_time, req.end_time)
            ),
        )
    # Promoted-union fast path (round 7, measured in SCALE.md §2): when the
    # index carries the wl_<name> trace-wide value unions
    # (build_trace_index(promote_whitelist=True)), compile against them.
    # Exact compilations answer the search from the slim top-level arrays —
    # the scan never projects the fat nested spans column; inexact ones
    # (span-level co-occurrence, NOT_EQUAL) become a pre-filter with the
    # exists() verifier running on survivors only. Plain indexes take the
    # original exists()-only path — same results either way (plan-tested).
    from haystack_traces_spark.operators.expression import compile_promoted
    from haystack_traces_spark.operators.index import PROMOTED_PREFIX

    cols = frozenset(trace_index.columns)
    has_promoted = any(c.startswith(PROMOTED_PREFIX) for c in cols)
    if has_promoted:
        pre, exact = compile_promoted(req.expression, whitelist, available=cols)
        expr_pred = pre if exact else (
            pre & compile_expression(req.expression, whitelist)
        )
    else:
        expr_pred = compile_expression(req.expression, whitelist)
    return (
        trace_index.filter(time_pred)
        .filter(expr_pred)
        .select("traceid", "starttime")
        .orderBy(F.col("starttime").desc(), F.col("traceid").desc())
        .limit(req.limit)
    )


def fetch_traces(trace_store: DataFrame, ids: DataFrame) -> DataFrame:
    """Phase 2: point-fetch + per-trace re-union of multiple stored rows
    (late-data re-emissions land as extra rows, SURVEY §2.2 T4)."""
    matched = trace_store.join(
        F.broadcast(ids.select("traceid").distinct()),
        trace_store["trace_id"] == F.col("traceid"),
        "left_semi",
    )
    return matched.groupBy("trace_id").agg(
        F.flatten(F.collect_list("spans")).alias("spans")
    )


def search_traces(
    trace_index: DataFrame,
    trace_store: DataFrame,
    req: SearchRequest,
    whitelist: WhitelistConfig = DEFAULT_WHITELIST,
) -> DataFrame:
    ids = search_trace_ids(trace_index, req, whitelist)
    return fetch_traces(trace_store, ids)
