"""getFieldValues / getFieldNames + service catalog (A4/A5/A6, SURVEY.md §2.5).

Distinct values of one whitelisted/intrinsic field, optionally under
co-filters (FieldValuesQueryGenerator.scala:30-50). The reference caps terms
aggs at 1000 values (SpansIndexQueryGenerator.scala:167) and the
service/operation catalog at 10000 (ServiceMetadataQueryGenerator.scala:28).

The catalog fast path (EsIndexedTraceStore.scala:104-122): a services-list or
operations-of-one-service request is answered from the tiny
``service_catalog`` table instead of scanning the trace index.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from haystack_traces_spark.config import DEFAULT_WHITELIST, WhitelistConfig
from haystack_traces_spark.operators.expression import Field, group_predicate

FIELD_VALUES_LIMIT = 1000
CATALOG_LIMIT = 10000


def build_service_catalog(spans: DataFrame) -> DataFrame:
    """Distinct (service, operation) universe — A6
    (ServiceMetadataDocumentGenerator.scala:36-75). Maintained incrementally
    on the streaming path via per-batch anti-join append."""
    return (
        spans.filter((F.col("service_name") != "") & (F.col("operation_name") != ""))
        .select(
            F.lower("service_name").alias("servicename"),
            F.lower("operation_name").alias("operationname"),
        )
        .distinct()
    )


def merge_catalog_batch(existing: DataFrame, batch_spans: DataFrame) -> DataFrame:
    """New pairs this micro-batch = batch distinct anti-join catalog."""
    fresh = build_service_catalog(batch_spans)
    return fresh.join(existing, ["servicename", "operationname"], "left_anti")


def field_values(
    trace_index: DataFrame,
    field_name: str,
    filters: list[Field] | None = None,
    whitelist: WhitelistConfig = DEFAULT_WHITELIST,
    limit: int = FIELD_VALUES_LIMIT,
    order_by: str = "value",
) -> DataFrame:
    """→ ``value`` (string) column, distinct, sorted, capped; with
    ``order_by="count"`` additionally a ``n`` doc-count column.

    Co-filters restrict to span groups matching ALL filters, then the target
    field's values are collected from those groups — the filter-agg wrapping
    of the reference (SpansIndexQueryGenerator.scala:162-179).

    Ordering: ES terms aggs rank by doc count descending
    (SpansIndexQueryGenerator.scala:162-179) — ``order_by="count"`` matches
    that UX (count desc, value asc tiebreak, counts returned like an ES
    terms response). The default ``"value"`` keeps the
    deterministic-ascending cap used by the value-only endpoint.
    """
    field_name = field_name.lower()
    preds = [group_predicate(f, whitelist) for f in (filters or [])]

    groups = trace_index.select(F.explode("spans").alias("g")).select("g.*")
    for f, p in zip(filters or [], preds):
        groups = groups.filter(p(F.struct(*[F.col(c) for c in groups.columns])))

    if field_name in ("servicename", "operationname"):
        vals = groups.select(F.col(field_name).cast("string").alias("value"))
    else:
        # explode must be top-level in its projection (generators can't nest
        # inside expressions); cast in a second select
        vals = groups.select(F.explode(F.col(field_name)).alias("v")).select(
            F.col("v").cast("string").alias("value")
        )
    if order_by == "count":
        # doc count = number of (trace, service, operation) groups carrying
        # the value (whitelisted fields are per-group sets, so explode yields
        # one row per carrying group)
        return (
            vals.groupBy("value")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.col("n").desc(), F.col("value").asc())
            .limit(limit)
        )
    return vals.distinct().orderBy("value").limit(limit)


def field_cardinalities(
    trace_index: DataFrame,
    fields: tuple[str, ...] = ("servicename", "operationname"),
    exact: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """→ (field, n_values): distinct-value cardinality per queryable field —
    the terms-agg size metadata a UI uses to decide whether a field is
    enumerable (SpansIndexQueryGenerator.scala:162-179 sizes its terms agg
    from exactly this).

    ``exact=False`` swaps COUNT(DISTINCT) for ``approx_count_distinct``
    (HyperLogLog++) — the 100 TB path SURVEY §2.10 calls out: the sketch is
    map-side mergeable (constant bytes per partition instead of shuffling
    every distinct value), with ``rsd`` dialing the error. The default
    stays exact so the DuckDB oracle can hash-match."""
    groups = trace_index.select(F.explode("spans").alias("g")).select("g.*")
    parts = []
    for f in fields:
        f = f.lower()
        if f in ("servicename", "operationname"):
            v = groups.select(
                F.lit(f).alias("field"), F.col(f).cast("string").alias("value")
            )
        else:
            v = groups.select(
                F.lit(f).alias("field"), F.explode(F.col(f)).alias("v")
            ).select("field", F.col("v").cast("string").alias("value"))
        parts.append(v)
    long_df = parts[0]
    for p in parts[1:]:
        long_df = long_df.unionByName(p)
    agg = (
        F.count_distinct(F.col("value"))
        if exact
        else F.approx_count_distinct("value", rsd)
    )
    return (
        long_df.groupBy("field")
        .agg(agg.cast("long").alias("n_values"))
        .orderBy("field")
    )


def catalog_services(service_catalog: DataFrame, limit: int = CATALOG_LIMIT) -> DataFrame:
    return (
        service_catalog.select(F.col("servicename").alias("value"))
        .distinct()
        .orderBy("value")
        .limit(limit)
    )


def catalog_operations(
    service_catalog: DataFrame, service_name: str, limit: int = CATALOG_LIMIT
) -> DataFrame:
    return (
        service_catalog.filter(F.col("servicename") == service_name.lower())
        .select(F.col("operationname").alias("value"))
        .distinct()
        .orderBy("value")
        .limit(limit)
    )


def field_names(whitelist: WhitelistConfig = DEFAULT_WHITELIST) -> list[str]:
    """getFieldNames — the whitelist universe (EsIndexedTraceStore.scala:90-102)."""
    return ["servicename", "operationname", "starttime", "duration"] + whitelist.field_names()
