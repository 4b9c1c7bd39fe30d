"""events.parquet → spans mapping (FIXTURES.md §6).

The driver's synthetic ``events`` table is the volume source; each event row
is projected onto the span schema deterministically so that every engine
query has an exact DuckDB-oracle mirror:

    trace_id        = CAST(user_id AS STRING)        -- a user's events form a trace
    span_id         = CAST(event_id AS STRING)
    parent_span_id  = previous event of the same user (lag), '' for the first
    service_name    = event_type
    operation_name  = 'op_' || (props.k % 5)
    start_time      = epoch micros of ts
    duration        = floor(value * 1000) micros

``EVENT_SPANS_CTE`` is the DuckDB-SQL mirror of :func:`spans_from_events`;
the two MUST stay in lockstep — every oracle query in ``__spark_entry__``
prepends the CTE.

Note on ts: the projection adapts to how the parquet stores ``ts``.
Driver testdata has shipped it both as TIMESTAMP(NANOS) (older rounds —
``spark.sql.legacy.parquet.nanosAsLong`` makes Spark read raw nanos longs,
and ``ts DIV 1000`` drops the nano remainder exactly like DuckDB's
micro-precision timestamps) and as TIMESTAMP(MICROS)/TIMESTAMP_NTZ (current
rounds — ``unix_micros(ts)`` under the UTC session timezone equals DuckDB
``epoch_us(ts)``). :func:`_event_span_base` branches on the column dtype so
both layouts produce identical ``start_time`` micros.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# Shared DuckDB-SQL fragments of the events→span projection. Both oracle
# CTEs below are composed from these so the arithmetic exists exactly once
# on the SQL side, mirroring the single Spark-side _event_span_base().
_SQL_K = "CAST(json_extract_string(props, '$.k') AS BIGINT)"
_SQL_OP = f"'op_' || CAST({_SQL_K} % 5 AS VARCHAR)"
_SQL_BASE_COLS = f"""
    CAST(user_id AS VARCHAR) AS trace_id,
    CAST(event_id AS VARCHAR) AS span_id,
    COALESCE(CAST(LAG(event_id) OVER w AS VARCHAR), '') AS parent_span_id,
    event_type AS service_name,
    {_SQL_OP} AS operation_name,
    epoch_us(ts) AS start_time,
    CAST(FLOOR(value * 1000) AS BIGINT) AS duration"""
_SQL_WINDOW = "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"

# DuckDB mirror — prepended to every oracle SQL statement that queries spans.
EVENT_SPANS_CTE = f"""
WITH spans AS (
  SELECT {_SQL_BASE_COLS},
    {_SQL_K} AS errorcode
  FROM events
  {_SQL_WINDOW}
)
"""


# Client/server span-pair projection: each non-root event becomes TWO spans
# sharing one span_id — the server span (callee side, the event itself) and a
# client span recorded by the CALLER service (parent event's service), started
# `net` micros earlier and lasting 2*net micros longer (symmetric network
# hops). This drives the full merge pipeline (U2 log synthesis → U4 partial-
# span merge → network delta → aux tags) with exactly mirrorable arithmetic:
# the merged span inherits the server side, parent from the client, and
# networkDelta = clientDur - serverDur = 2*net (SpanMerger.scala:53-64,96-106).
# Root events stay single spans tagged span.kind=server so the U5 parent/child
# collapse is kind-blocked at the root (SpanMerger.scala:136-157).
EVENT_SPANS_CS_CTE = f"""
WITH ev AS (
  SELECT {_SQL_BASE_COLS},
    LAG(event_type) OVER w AS parent_service,
    'op_' || CAST((LAG({_SQL_K}) OVER w) % 5 AS VARCHAR) AS parent_operation,
    event_id % 97 + 1 AS net
  FROM events
  {_SQL_WINDOW}
), cs_spans AS (
  SELECT trace_id, span_id, parent_span_id, service_name, operation_name,
         start_time, duration
  FROM ev
  UNION ALL
  SELECT trace_id, span_id, parent_span_id,
         parent_service AS service_name, parent_operation AS operation_name,
         start_time - net AS start_time, duration + 2 * net AS duration
  FROM ev WHERE parent_span_id <> ''
)
"""


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in (names or TABLES)}


def _epoch_micros(events: DataFrame) -> F.Column:
    """Epoch-micros ``start_time`` from ``ts`` regardless of the parquet
    layout the driver generated (see module docstring): raw nanos longs →
    integer DIV 1000 (float division loses ULPs at 1.7e18-scale nanos,
    53-bit mantissa → off-by-1 µs); timestamp/timestamp_ntz → unix_micros
    under the UTC session timezone (== DuckDB epoch_us)."""
    ts_type = dict(events.dtypes)["ts"]
    if ts_type in ("bigint", "long"):
        return F.expr("CAST(ts AS LONG) DIV 1000")
    return F.unix_micros(F.col("ts").cast("timestamp"))


def _event_span_base(events: DataFrame) -> DataFrame:
    """The ONE events→span base projection (trace_id, span_id, parent,
    service, operation, start_time, duration + parent-side/net/_k extras)
    shared by BOTH Spark builders below. ``EVENT_SPANS_CTE`` and
    ``EVENT_SPANS_CS_CTE`` are its SQL mirrors — an edit here must be
    reflected there (and vice versa); keeping the arithmetic in one Spark
    function is what prevents the four copies from drifting.

    The lag() for parent columns partitions by user — at 100 TB this is a
    single window shuffle on the trace key, the same key every downstream
    trace-level operator groups on, so the exchange is reused by Catalyst.
    Unused extras are pruned by Catalyst for callers that don't select them.
    """
    # Materialize trace_id BEFORE the window and partition by the column
    # itself: the window's exchange is then HashPartitioning(trace_id), which
    # satisfies every downstream trace-level groupBy/agg clustering — the
    # store build, index build, and trace re-group all reuse this ONE shuffle
    # instead of re-shuffling on cast(user_id) (expression-identity matters
    # to Catalyst's exchange reuse, not semantic equality).
    events = events.withColumn("trace_id", F.col("user_id").cast("string"))
    w = Window.partitionBy("trace_id").orderBy("ts", "event_id")
    # ONE schema-typed parse of props (from_json) — measurably cheaper than
    # repeated get_json_object string extraction, same values
    k = F.from_json("props", "k BIGINT")["k"]
    op = F.concat(F.lit("op_"), (k % 5).cast("string"))
    return events.select(
        F.col("trace_id"),
        F.col("event_id").cast("string").alias("span_id"),
        F.coalesce(
            F.lag("event_id").over(w).cast("string"), F.lit("")
        ).alias("parent_span_id"),
        F.col("event_type").alias("service_name"),
        op.alias("operation_name"),
        F.lag("event_type").over(w).alias("parent_service"),
        F.lag(op).over(w).alias("parent_operation"),
        _epoch_micros(events).alias("start_time"),
        F.floor(F.col("value") * 1000).cast("long").alias("duration"),
        (F.col("event_id") % 97 + 1).cast("long").alias("net"),
        k.alias("_k"),
    )


def spans_from_events(events: DataFrame, with_tags: bool = True) -> DataFrame:
    """Project the events table onto the span schema (base projection +
    typed tags)."""
    out = _event_span_base(events)

    if with_tags:
        # Real typed-tag machinery: errorcode LONG from props.k, role STRING.
        # Oracle queries recompute from json instead (independent impl).
        out = out.withColumn(
            "tags",
            F.array(
                F.struct(
                    F.lit("errorcode").alias("key"),
                    F.lit("LONG").alias("vtype"),
                    F.lit(None).cast("string").alias("vstr"),
                    F.col("_k").alias("vlong"),
                    F.lit(None).cast("double").alias("vdouble"),
                    F.lit(None).cast("boolean").alias("vbool"),
                    F.lit(None).cast("binary").alias("vbytes"),
                ),
                F.struct(
                    F.lit("role").alias("key"),
                    F.lit("STRING").alias("vtype"),
                    F.lit("haystack").alias("vstr"),
                    F.lit(None).cast("long").alias("vlong"),
                    F.lit(None).cast("double").alias("vdouble"),
                    F.lit(None).cast("boolean").alias("vbool"),
                    F.lit(None).cast("binary").alias("vbytes"),
                ),
            ),
        ).withColumn("logs", F.expr("CAST(array() AS array<struct<timestamp:bigint,fields:array<struct<key:string,vstr:string>>>>)"))
    return out.select(
        "trace_id",
        "span_id",
        "parent_span_id",
        "service_name",
        "operation_name",
        "start_time",
        "duration",
        *( ["tags", "logs"] if with_tags else [] ),
    )


def _kind_tag(kind) -> F.Column:
    """tags array holding one span.kind STRING tag."""
    return F.array(
        F.struct(
            F.lit("span.kind").alias("key"),
            F.lit("STRING").alias("vtype"),
            kind.alias("vstr"),
            F.lit(None).cast("long").alias("vlong"),
            F.lit(None).cast("double").alias("vdouble"),
            F.lit(None).cast("boolean").alias("vbool"),
            F.lit(None).cast("binary").alias("vbytes"),
        )
    )


def spans_cs_from_events(events: DataFrame) -> DataFrame:
    """Client/server span-pair projection (DuckDB mirror: EVENT_SPANS_CS_CTE).

    Server span = the event itself, tagged span.kind=server; client span =
    the same span_id recorded by the parent event's service, started ``net``
    micros earlier with duration + 2*net, tagged span.kind=client. Root
    events emit only the server span. One window shuffle on trace_id (same
    exchange as every trace-level operator), then a narrow explode — no
    extra shuffle for the pair fan-out.
    """
    base = _event_span_base(events)
    server = F.struct(
        F.col("service_name").alias("service_name"),
        F.col("operation_name").alias("operation_name"),
        F.col("start_time").alias("start_time"),
        F.col("duration").alias("duration"),
        F.lit("server").alias("kind"),
    )
    client = F.struct(
        F.col("parent_service").alias("service_name"),
        F.col("parent_operation").alias("operation_name"),
        (F.col("start_time") - F.col("net")).alias("start_time"),
        (F.col("duration") + 2 * F.col("net")).alias("duration"),
        F.lit("client").alias("kind"),
    )
    sides = F.when(F.col("parent_span_id") == "", F.array(server)).otherwise(
        F.array(server, client)
    )
    return (
        base.select(
            "trace_id",
            "span_id",
            "parent_span_id",
            F.explode(sides).alias("s"),
        )
        .select(
            "trace_id",
            "span_id",
            "parent_span_id",
            F.col("s.service_name").alias("service_name"),
            F.col("s.operation_name").alias("operation_name"),
            F.col("s.start_time").alias("start_time"),
            F.col("s.duration").alias("duration"),
            _kind_tag(F.col("s.kind")).alias("tags"),
            F.expr(
                "CAST(array() AS array<struct<timestamp:bigint,"
                "fields:array<struct<key:string,vstr:string>>>>)"
            ).alias("logs"),
        )
    )
