"""TraceProcessor — the config-ordered per-trace pipeline, distributed via
``applyInPandas`` (SURVEY.md §2.7 mapping).

The reference instantiates transformer chains by class name from config
(reader base.conf:70-87; TraceProcessor.scala:25-37). Here chains are lists
of names resolved against registries — same pluggability, plain Python.

Distribution: ``spans.groupBy("trace_id").applyInPandas(...)`` — one Arrow
batch per trace group, per-trace tree logic in memory (traces are small);
embarrassingly parallel across traces, shuffle key identical to every other
trace-level operator so the exchange is shared. This is the idiomatic Spark
treatment of recursive tree logic SQL can't express.
"""

from __future__ import annotations

import functools
from typing import Callable

import pandas as pd

from haystack_traces_spark.schemas import SPAN
from haystack_traces_spark.transform import transformers as T
from haystack_traces_spark.transform import validators as V
from haystack_traces_spark.transform.model import Span
from haystack_traces_spark.transform.spantree import Forest

PRE_TRANSFORMERS: dict[str, Callable[[list], list]] = {
    "dedup": T.dedup_spans,
    "client_server_event_log": T.client_server_event_log,
    "infrastructure_tags": T.infrastructure_tags,
}

POST_TRANSFORMERS: dict[str, Callable[[Forest], Forest]] = {
    "orphaned_trace": T.orphaned_trace,
    "partial_span_merge": T.partial_span_merge,
    "server_client_span_merge": T.server_client_span_merge,
    "clock_skew": T.clock_skew,
    "clock_skew_from_parent": T.clock_skew_from_parent,
    "invalid_root": T.invalid_root,
    "invalid_parent": T.invalid_parent,
    "sort": T.sort_spans,
}

# reader base.conf:70-87 default sequences
DEFAULT_PRE = ("dedup", "client_server_event_log", "infrastructure_tags")
DEFAULT_POST = ("partial_span_merge", "server_client_span_merge", "clock_skew", "sort")


class TraceProcessor:
    def __init__(
        self,
        pre: tuple[str, ...] = DEFAULT_PRE,
        validators=V.DEFAULT_VALIDATORS,
        post: tuple[str, ...] = DEFAULT_POST,
        span_id_factory: Callable[[], str] | None = None,
    ):
        self.pre = [PRE_TRANSFORMERS[n] for n in pre]
        self.validators = list(validators)
        self.post = []
        for n in post:
            fn = POST_TRANSFORMERS[n]
            if n == "invalid_root" and span_id_factory is not None:
                fn = functools.partial(fn, span_id_factory=span_id_factory)
            self.post.append(fn)

    def process(self, trace_id: str, spans: list[Span]) -> list[Span]:
        """pre → validate → post; raises InvalidTraceError on rejection
        (TraceProcessor.scala:33-36)."""
        for fn in self.pre:
            spans = fn(spans)
        for v in self.validators:
            v(trace_id, spans)
        forest = Forest(spans)
        for fn in self.post:
            forest = fn(forest)
        return forest.spans


# ------------------------------------------------------------ DataFrame --

_SPAN_COLS = [f.name for f in SPAN.fields]


def _row_to_span(row: dict) -> Span:
    s = dict(row)
    tags = s.get("tags")
    logs = s.get("logs")
    s["tags"] = [dict(t) for t in tags] if tags is not None and len(tags) else []
    s["logs"] = [
        {
            "timestamp": l["timestamp"],
            "fields": [dict(f) for f in (l["fields"] if l["fields"] is not None else [])],
        }
        for l in (logs if logs is not None and len(logs) else [])
    ]
    s["start_time"] = int(s["start_time"])
    s["duration"] = int(s["duration"])
    return s


def spans_pdf_to_dicts(pdf: pd.DataFrame) -> list[Span]:
    return [_row_to_span(r) for r in pdf.to_dict("records")]


def spans_dicts_to_pdf(spans: list[Span]) -> pd.DataFrame:
    if not spans:
        return pd.DataFrame({c: pd.Series(dtype="object") for c in _SPAN_COLS})
    return pd.DataFrame([{c: s.get(c) for c in _SPAN_COLS} for s in spans])


def transform_traces(spans_df, processor: TraceProcessor | None = None, with_pos: bool = False):
    """Distributed pipeline: flat spans in → flat processed spans out.

    Invalid traces are dropped (search semantics, TraceReader.scala:82-90);
    use :func:`process_single` for the getTrace fail-fast path.

    with_pos=True appends a ``pos`` column: the 1-based position of each span
    in the pipeline's OUTPUT order (i.e. the U11 sort order — root first,
    rest by start time), so order semantics survive order-insensitive
    row-hash comparison.
    """
    proc = processor or TraceProcessor()

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            out_pdf = spans_dicts_to_pdf([])
        else:
            trace_id = pdf.iloc[0]["trace_id"]
            spans = spans_pdf_to_dicts(pdf)
            try:
                out = proc.process(trace_id, spans)
            except T.InvalidTraceError:
                out = []
            out_pdf = spans_dicts_to_pdf(out)
        if with_pos:
            out_pdf["pos"] = range(1, len(out_pdf) + 1)
        return out_pdf

    schema = SPAN
    if with_pos:
        import pyspark.sql.types as T_

        schema = T_.StructType(SPAN.fields + [T_.StructField("pos", T_.LongType())])
    return spans_df.select(_SPAN_COLS).groupBy("trace_id").applyInPandas(run, schema)


def process_single(
    trace_id: str, spans: list[Span], processor: TraceProcessor | None = None
) -> list[Span]:
    """getTrace path: propagate InvalidTraceError to the caller
    (TraceReader.scala:44-51)."""
    return (processor or TraceProcessor()).process(trace_id, spans)
