"""trace_index builder — the A1/A2/Q8 aggregation (SURVEY.md §2.5).

Produces one row per trace with per-(service, operation) span groups holding
*sets* of values, mirroring the reference's TraceIndexDoc
(commons/.../clients/es/document/TraceIndexDoc.scala:36-38; grouping at
indexer/.../writers/es/IndexDocumentGenerator.scala:52-101).

Scale notes (100 TB design point):
- Single wide shuffle on (trace_id, service, operation) does all set
  accumulation map-side-combinable; the trace-level re-group then shuffles
  the *pre-aggregated* groups (orders of magnitude smaller) on the prefix
  key trace_id.
- ``starttime`` and the partition columns (dt, hb) are top-level, so the
  mandatory time-range predicate prunes parquet files without touching the
  nested spans array (the reference's root-doc-starttime denormalization,
  reader base.conf:40, and 6h index bucketing, ElasticSearchWriter.scala:47-53).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from haystack_traces_spark.config import DEFAULT_WHITELIST, WhitelistConfig
from haystack_traces_spark.functions.span_funcs import (
    low_cardinality_duration,
    tag_value,
    truncate_to_second,
)

# 6-hour buckets, mirroring the reference's haystack-traces-{yyyy-MM-dd}-{hour/6}
# index naming (ElasticSearchWriter.scala:47-53).
HOURS_PER_BUCKET = 6


#: Prefix of the round-7 PROMOTED top-level columns (see
#: ``promote_whitelist``); a prefix keeps them clear of the root-doc
#: ``starttime`` and the nested field namespace.
PROMOTED_PREFIX = "wl_"


def build_trace_index(
    spans: DataFrame,
    whitelist: WhitelistConfig = DEFAULT_WHITELIST,
    root_duration_mode: str = "parent_empty",
    with_partition_cols: bool = False,
    promote_whitelist: bool | tuple[str, ...] = False,
) -> DataFrame:
    """spans → one index row per trace.

    Output schema:
      traceid string, starttime long (sec-truncated micros, min over spans),
      rootduration long, spans array<struct<servicename, operationname,
      starttime array<long>, duration array<long>, <wl-tag> array<typed>...>>

    root_duration_mode:
      'parent_empty'    — duration of the span whose parent_span_id == ''
                          (the evident intent)
      'reference_quirk' — constant 0: the reference compares
                          parentSpanId == null, never true for proto3 strings
                          (IndexDocumentGenerator.scala:56), so shipped
                          behavior is always 0.

    promote_whitelist (round 7, SURVEY §4's deferred promotion question,
    answered by measurement in SCALE.md §2): additionally store each
    queryable field's TRACE-WIDE distinct-value union as a top-level
    ``wl_<name>`` array column — True = the measured default set
    (servicename/operationname/duration + every enabled whitelist tag;
    starttime excluded, see inline note), or pass an explicit iterable
    of field names. Search predicates over these
    skip the nested spans walk, and a fully trace-level expression never
    projects the fat spans column at all — the scan reads only the slim
    unions (`search.py:search_trace_ids` picks this automatically). The
    unions are exact for trace-level EQUAL/range terms; span-level
    co-occurrence and NOT_EQUAL still verify against the nested groups.
    Write cost: one extra array_distinct per field over already-grouped
    sets — no extra shuffle."""
    has_tags = "tags" in spans.columns
    wl_aggs = []
    wl_names: list[str] = []
    if has_tags:
        for f in whitelist.enabled_fields():
            wl_aggs.append(
                F.collect_set(tag_value("tags", f.name, f.type)).alias(f.name)
            )
            wl_names.append(f.name)

    if root_duration_mode == "reference_quirk":
        root_dur = F.lit(None).cast("long")
    else:
        root_dur = F.when(F.col("parent_span_id") == "", F.col("duration"))

    # Q8: drop spans with empty service/operation (IndexDocumentGenerator.scala:72-74).
    groups = (
        spans.filter((F.col("service_name") != "") & (F.col("operation_name") != ""))
        .groupBy(
            F.col("trace_id"),
            F.lower("service_name").alias("servicename"),
            F.lower("operation_name").alias("operationname"),
        )
        .agg(
            F.collect_set(truncate_to_second("start_time")).alias("starttime_set"),
            F.collect_set(low_cardinality_duration("duration")).alias("duration_set"),
            F.min(truncate_to_second("start_time")).alias("_min_start"),
            F.max(root_dur).alias("_root_dur"),
            *wl_aggs,
        )
    )

    group_struct = F.struct(
        F.col("servicename"),
        F.col("operationname"),
        F.col("starttime_set").alias("starttime"),
        F.col("duration_set").alias("duration"),
        *[F.col(n) for n in wl_names],
    )

    promoted_aggs = []
    if promote_whitelist:
        if promote_whitelist is True:
            # measured default (SCALE.md §2): starttime is EXCLUDED — its
            # union is near-per-span distinct (23.7% of the 10x index file
            # for a field the time predicate already answers from the
            # top-level root-doc starttime); everything else is cheap
            # (service/operation/tags < 6% combined, duration ~17% and
            # carries the flagship range predicate)
            fields = ("servicename", "operationname", "duration", *wl_names)
        else:
            fields = tuple(f.lower() for f in promote_whitelist)
        set_col = {
            "servicename": "servicename",
            "operationname": "operationname",
            "starttime": "starttime_set",
            "duration": "duration_set",
        }
        for name in fields:
            src = set_col.get(name, name)
            agg = (
                F.collect_set(src)
                if name in ("servicename", "operationname")
                else F.array_distinct(F.flatten(F.collect_list(src)))
            )
            promoted_aggs.append(agg.alias(f"{PROMOTED_PREFIX}{name}"))

    idx = groups.groupBy(F.col("trace_id").alias("traceid")).agg(
        F.min("_min_start").alias("starttime"),
        F.coalesce(F.max("_root_dur"), F.lit(0)).alias("rootduration"),
        F.collect_list(group_struct).alias("spans"),
        *promoted_aggs,
    )

    if with_partition_cols:
        idx = _with_partition_cols(idx)
    return idx


def _with_partition_cols(idx: DataFrame) -> DataFrame:
    """Stamp the (dt, hb) time-bucket partition columns from starttime —
    the ONE definition of the bucketing scheme, shared by the build and
    by compact_trace_index (a drift between the two would silently write
    compacted rows into stale partitions)."""
    ts = F.timestamp_micros(F.col("starttime"))
    return idx.withColumn("dt", F.date_format(ts, "yyyy-MM-dd")).withColumn(
        "hb", (F.hour(ts) / HOURS_PER_BUCKET).cast("int")
    )


def write_trace_index(idx: DataFrame, path: str) -> None:
    """Persist partitioned by (dt, hb) so time-range predicates prune whole
    partitions — the Spark analog of the reference's hourly-bucketed ES index
    list (SpansIndexQueryGenerator.scala:181-215).

    Repartition on the partition keys first: without it every task writes a
    sliver into every (dt, hb) directory — task_count x partition_count tiny
    files, the classic small-file problem (at 100 TB, add a salt column to
    this repartition to get k appropriately-sized files per partition)."""
    idx.repartition("dt", "hb").write.mode("overwrite").partitionBy(
        "dt", "hb"
    ).parquet(path)


def upsert_trace_index(
    spark,
    path: str,
    new_spans: DataFrame,
    whitelist: WhitelistConfig = DEFAULT_WHITELIST,
) -> list[tuple[str, int]]:
    """Fold a NEW batch of spans into an EXISTING on-disk (dt, hb)
    partitioned index, rewriting ONLY the partitions the batch touches —
    the incremental maintenance path that keeps a 100 TB index current
    without the full rebuild ``write_trace_index`` implies. Returns the
    touched (dt, hb) list.

    Mechanics: build the batch's delta index (promoted wl_* columns
    auto-matched to whatever the on-disk index carries), collect its
    touched (dt, hb) buckets (bounded by the batch's time span), read
    ONLY those partitions of the existing index (partition-pruned scan),
    compact delta ∪ existing-touched PARTITION-LOCALLY, and write back
    under ``partitionOverwriteMode=dynamic`` so untouched partition
    directories are left byte-identical (pinned by test via file mtimes).

    Why compaction is partition-local (``compact_trace_index(
    partition_local=True)``): rows never change bucket, so (a) every
    partition that was read receives rows back and dynamic overwrite
    rewrites EXACTLY the touched set — a global compact could migrate a
    bucket's only rows into an earlier bucket, leaving the emptied
    bucket's stale file untouched on disk — and (b) every written row's
    bucket is by construction one that was read, so the overwrite can
    never clobber an unread partition.

    Contract matches the reference's duplicate tolerance: a trace with
    rows in MULTIPLE buckets keeps one row per bucket (the reader dedups
    at fetch, TraceMerger.scala:24-34); within a touched bucket
    duplicates are compacted away.
    """
    existing = spark.read.parquet(path)
    promoted_fields = tuple(
        c[len(PROMOTED_PREFIX):]
        for c in existing.columns
        if c.startswith(PROMOTED_PREFIX)
    )
    # fail LOUD if the batch cannot rebuild an on-disk promoted union
    # (no tags column, or the caller's whitelist no longer enables the
    # field) — a silent drop would downgrade the promoted table and the
    # union would fail later with an opaque column mismatch anyway
    producible = {"servicename", "operationname", "duration", "starttime"}
    if "tags" in new_spans.columns:
        producible |= {f.name for f in whitelist.enabled_fields()}
    missing = [f for f in promoted_fields if f not in producible]
    if missing:
        raise ValueError(
            f"upsert_trace_index: on-disk promoted fields {missing} cannot "
            "be built from this batch (spans have no tags column, or the "
            "whitelist does not enable them)"
        )
    delta = build_trace_index(
        new_spans,
        whitelist=whitelist,
        with_partition_cols=True,
        promote_whitelist=promoted_fields or False,
    ).persist()
    try:
        touched = [
            (r["dt"], r["hb"])
            for r in delta.select("dt", "hb").distinct().collect()
        ]
        keep = F.lit(False)
        for dt, hb in touched:
            keep = keep | ((F.col("dt") == dt) & (F.col("hb") == hb))
        # dt arrives as DATE from partition discovery; align with the
        # delta's string face so the union and the grouped keys agree
        aligned = existing.filter(keep).withColumn(
            "dt", F.col("dt").cast("string")
        )
        merged = compact_trace_index(
            aligned.unionByName(delta),
            whitelist=whitelist,
            partition_local=True,
        )
        mode_key = "spark.sql.sources.partitionOverwriteMode"
        prev = spark.conf.get(mode_key, "static")
        spark.conf.set(mode_key, "dynamic")
        try:
            merged.repartition("dt", "hb").write.mode(
                "overwrite"
            ).partitionBy("dt", "hb").parquet(path)
        finally:
            spark.conf.set(mode_key, prev)
    finally:
        delta.unpersist()
    return touched


def compact_trace_index(
    idx: DataFrame,
    whitelist: WhitelistConfig = DEFAULT_WHITELIST,
    partition_local: bool = False,
) -> DataFrame:
    """Merge duplicate per-trace index rows into one — incremental view
    maintenance for the streaming write path, where a trace reopened by a
    late span (T4) appends a SECOND index row for the same traceid (the
    analog of the reference's ES doc-per-hour-bucket duplicates,
    ElasticSearchWriter.scala:47-53; its reader dedups at fetch, ours can
    additionally compact the table offline).

    Group sets union via flatten + array_distinct (set semantics — the
    accumulation order inside a set is not part of the contract);
    trace-level starttime re-mins, rootduration re-maxes; (dt, hb)
    partition columns recompute from the merged starttime when present.
    One explode + two hash aggregations on the trace key — the same
    shuffle shape as the build itself, applied to index rows (orders of
    magnitude smaller than spans).

    Invariant (pinned by test): for any split A ∪ B of the span table,
    compact(build(A) ∪ build(B)) == build(A ∪ B) up to set order.

    ``partition_local``: group by (traceid, dt, hb) instead of traceid —
    rows never change bucket and only WITHIN-bucket duplicates merge
    (cross-bucket duplicates persist; the reader dedups at fetch, the
    reference's ES-duplicate contract). This is the upsert's mode: it
    guarantees every partition that contributed rows receives rows back,
    which dynamic partition overwrite needs to rewrite exactly the
    partitions it read.
    """
    group_fields = idx.schema["spans"].dataType.elementType.names
    wl_names = [
        f.name for f in whitelist.enabled_fields() if f.name in group_fields
    ]
    trace_keys = (
        ["traceid", "dt", "hb"] if partition_local else ["traceid"]
    )
    g = idx.select(
        *trace_keys, "starttime", "rootduration",
        F.explode("spans").alias("g"),
    )
    set_aggs = [
        F.array_distinct(F.flatten(F.collect_list(F.col(f"g.{c}")))).alias(c)
        for c in ("starttime", "duration", *wl_names)
    ]
    groups = g.groupBy(
        *trace_keys,
        F.col("g.servicename").alias("servicename"),
        F.col("g.operationname").alias("operationname"),
    ).agg(
        *set_aggs,
        F.min("starttime").alias("_min_start"),
        F.max("rootduration").alias("_root_dur"),
    )
    group_struct = F.struct(
        F.col("servicename"),
        F.col("operationname"),
        F.col("starttime"),
        F.col("duration"),
        *[F.col(n) for n in wl_names],
    )
    out = groups.groupBy(*trace_keys).agg(
        F.min("_min_start").alias("starttime"),
        F.max("_root_dur").alias("rootduration"),
        F.collect_list(group_struct).alias("spans"),
    )
    # a PROMOTED index (wl_<name> unions) compacts to a promoted index:
    # each union is rebuilt from the wl_ COLUMNS THEMSELVES (union of
    # per-row unions = the full union — set algebra, no whitelist or
    # group-field dependence, so compact cannot crash or silently drop a
    # tag the compactor's whitelist no longer lists, and there is no
    # second copy of the build's per-field agg dispatch to drift)
    promoted_cols = [
        c for c in idx.columns if c.startswith(PROMOTED_PREFIX)
    ]
    if promoted_cols:
        promoted = idx.groupBy(*trace_keys).agg(
            *[
                F.array_distinct(F.flatten(F.collect_list(c))).alias(c)
                for c in promoted_cols
            ]
        )
        out = out.join(promoted, trace_keys)
    if "dt" in idx.columns and not partition_local:
        out = _with_partition_cols(out)
    return out
