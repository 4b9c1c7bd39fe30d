"""TraceEngine — facade mirroring the reference's 9 gRPC endpoints
(reader/.../services/TraceService.scala:50-134) as Python functions returning
DataFrames (SURVEY.md §7.0).

Endpoints: get_trace, get_raw_trace, get_raw_span, search_traces,
get_field_names, get_field_values, get_trace_counts, get_raw_traces,
get_trace_call_graph.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from haystack_traces_spark.config import DEFAULT_WHITELIST, WhitelistConfig
from haystack_traces_spark.operators import search as search_ops
from haystack_traces_spark.operators.callgraph import trace_call_graph
from haystack_traces_spark.operators.counts import TraceCountsRequest, trace_counts
from haystack_traces_spark.operators.expression import Field
from haystack_traces_spark.operators.field_values import (
    catalog_operations,
    catalog_services,
    field_names,
    field_values,
)
from haystack_traces_spark.operators.index import build_trace_index
from haystack_traces_spark.sources.spans import (
    build_trace_store,
    get_raw_span,
    get_raw_trace,
    read_trace_records,
)
from haystack_traces_spark.transform.pipeline import (
    TraceProcessor,
    process_single,
    transform_traces,
)


class TraceEngine:
    """Holds the engine tables; every method is a lazy DataFrame plan.

    Construct from a flat spans DataFrame (batch) or attach pre-built
    parquet-backed tables (the streaming ingest writes those).
    """

    def __init__(
        self,
        spans: DataFrame,
        trace_store: DataFrame | None = None,
        trace_index: DataFrame | None = None,
        service_catalog: DataFrame | None = None,
        whitelist: WhitelistConfig = DEFAULT_WHITELIST,
        processor: TraceProcessor | None = None,
        extra_backends: list | None = None,
    ):
        from haystack_traces_spark.operators.field_values import build_service_catalog

        self.spans = spans
        self.whitelist = whitelist
        self.processor = processor or TraceProcessor()
        self.trace_store = (
            trace_store if trace_store is not None else build_trace_store(spans)
        )
        # additional trace backends (DataFrames or zero-arg callables) unioned
        # into every key lookup with per-backend recover-to-empty — the
        # reference's multi-backend reader config (GrpcTraceReaders.scala:52-66)
        self.extra_backends = list(extra_backends or [])
        self.trace_index = (
            trace_index
            if trace_index is not None
            else build_trace_index(spans, whitelist)
        )
        self.service_catalog = (
            service_catalog
            if service_catalog is not None
            else build_service_catalog(spans)
        )

    def _store(self) -> DataFrame:
        """The trace store every read sees: the primary plus any extra
        backends, each recovered to empty if unreachable (O5 union;
        GrpcTraceReaders.scala:52-66). Evaluated per read so a backend that
        dies between calls degrades that call, not the engine."""
        if not self.extra_backends:
            return self.trace_store
        dfs = [self.trace_store]
        for b in self.extra_backends:
            try:
                dfs.append(b() if callable(b) else b)
            except Exception:
                continue  # dead backend → empty contribution
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d, allowMissingColumns=True)
        return out

    # -- searches ----------------------------------------------------------
    def search_traces(
        self, req: search_ops.SearchRequest, processed: bool = True
    ) -> DataFrame:
        """Index→fetch→(optionally) per-trace pipeline; invalid traces are
        dropped and counted (TraceReader.scala:82-90)."""
        traces = search_ops.search_traces(
            self.trace_index, self._store(), req, self.whitelist
        )
        if not processed:
            return traces
        flat = traces.select(F.explode("spans").alias("s")).select("s.*")
        out = transform_traces(flat, self.processor)
        return out.groupBy("trace_id").agg(F.collect_list(F.struct("*")).alias("spans"))

    def search_trace_ids(self, req: search_ops.SearchRequest) -> DataFrame:
        return search_ops.search_trace_ids(self.trace_index, req, self.whitelist)

    # -- key lookups -------------------------------------------------------
    def get_trace(self, trace_id: str):
        """Processed single trace; raises InvalidTraceError on bad traces
        (fail-fast getTrace semantics, TraceReader.scala:44-51)."""
        rows = get_raw_trace(self._store(), trace_id).collect()
        if not rows:
            return []
        spans = [s.asDict(recursive=True) for s in rows[0]["spans"]]
        return process_single(trace_id, spans, self.processor)

    def get_raw_trace(self, trace_id: str) -> DataFrame:
        return get_raw_trace(self._store(), trace_id)

    def get_raw_traces(self, trace_ids: list[str]) -> DataFrame:
        return (
            read_trace_records(self._store(), trace_ids)
            .groupBy("trace_id")
            .agg(F.flatten(F.collect_list("spans")).alias("spans"))
        )

    def get_raw_span(self, trace_id: str, span_id: str) -> DataFrame:
        return get_raw_span(self._store(), trace_id, span_id)

    # -- aggregations ------------------------------------------------------
    def get_trace_counts(self, req: TraceCountsRequest) -> DataFrame:
        return trace_counts(self.trace_index, req, self.whitelist)

    def get_field_names(self) -> list[str]:
        return field_names(self.whitelist)

    def get_field_values(
        self, field_name: str, filters: list[Field] | None = None
    ) -> DataFrame:
        """Catalog fast path for the two cheap shapes
        (EsIndexedTraceStore.scala:104-122), else the index scan."""
        fname = field_name.lower()
        flt = filters or []
        if fname == "servicename" and not flt:
            return catalog_services(self.service_catalog)
        if (
            fname == "operationname"
            and len(flt) == 1
            and flt[0].name == "servicename"
            and flt[0].operator == "EQUAL"
        ):
            return catalog_operations(self.service_catalog, str(flt[0].value))
        return field_values(self.trace_index, fname, flt, self.whitelist)

    # -- graph -------------------------------------------------------------
    def get_trace_call_graph(self, trace_id: str) -> DataFrame:
        rows = get_raw_trace(self._store(), trace_id).collect()
        if not rows:
            spark = self.spans.sparkSession
            return trace_call_graph(
                spark.createDataFrame([], self.spans.schema)
            )
        spans = [s.asDict(recursive=True) for s in rows[0]["spans"]]
        processed = process_single(trace_id, spans, self.processor)
        spark = self.spans.sparkSession
        from haystack_traces_spark.schemas import SPAN

        return trace_call_graph(spark.createDataFrame(processed, SPAN))
