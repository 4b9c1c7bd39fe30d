"""Scalar span/tag/time functions (SURVEY.md §2.9).

All pure Column expressions — JVM-side, codegen-friendly; no Python UDFs in
the hot path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

MICROS_PER_SECOND = 1_000_000
# Durations above this are truncated to whole seconds at index time
# (reference: IndexDocumentGenerator.scala:37,146-157).
LOW_CARDINALITY_DURATION_THRESHOLD = 20 * MICROS_PER_SECOND


def end_time(start: Column | str = "start_time", duration: Column | str = "duration") -> Column:
    """start + duration (reference: SpanUtils.scala:37-39)."""
    return F.col(start) + F.col(duration) if isinstance(start, str) else start + duration


def truncate_to_second(us: Column | str) -> Column:
    """micros → second-truncated micros (reference: IndexDocumentGenerator.scala:146-148).

    Integer DIV, not float division — float rounding is lossy above 2^53.
    """
    c = F.col(us) if isinstance(us, str) else us
    return (c - (c % MICROS_PER_SECOND)).cast("long")


def low_cardinality_duration(duration: Column | str = "duration") -> Column:
    """Truncate durations > 20 s to whole seconds (IndexDocumentGenerator.scala:37,153-157)."""
    c = F.col(duration) if isinstance(duration, str) else duration
    return F.when(c > LOW_CARDINALITY_DURATION_THRESHOLD, truncate_to_second(c)).otherwise(c)


# Declared whitelist type → Spark cast target
# (reference: WhitelistIndexFieldConfiguration.scala:38-45).
_WHITELIST_CAST = {
    "string": "string",
    "long": "long",
    "int": "long",
    "double": "double",
    "bool": "boolean",
}


def tag_struct_value_str(t: Column) -> Column:
    """Stringified value of ONE tag struct — the canonical 5-way vtype
    dispatch (STRING/LONG/DOUBLE/BOOL/BINARY), shared with
    :func:`tag_value`'s lambda body so a new vtype is added in one
    place. Unknown vtypes yield NULL."""
    return (
        F.when(t["vtype"] == "STRING", t["vstr"])
        .when(t["vtype"] == "LONG", t["vlong"].cast("string"))
        .when(t["vtype"] == "DOUBLE", t["vdouble"].cast("string"))
        .when(t["vtype"] == "BOOL", t["vbool"].cast("string"))
        .when(t["vtype"] == "BINARY", t["vbytes"].cast("string"))
    )


def tag_value(tags: Column | str, key: str, declared_type: str) -> Column:
    """Extract tag `key` from a tags array, coerced to the declared whitelist
    type; uncoercible values become NULL (→ dropped by collect_set), matching
    the reference's coerce-or-drop (IndexDocumentGenerator.scala:113-144).

    The typed union is resolved with a 5-way CASE on vtype, then try_cast to
    the declared type (covers e.g. STRING "404" → long 404; BINARY → utf8).

    Shape note: the CASE runs INSIDE a transform lambda over the (≤1-element)
    sliced match, so the filter subtree is evaluated once per row. The naive
    form — ``t = try_element_at(filter(...), 1)`` then referencing
    ``t["vtype"]``/``t["vstr"]``/… — copies the whole ArrayFilter subtree
    into every field reference (~11 copies), which both bloats the generated
    code (first-evaluation Janino compile was ~11 s for the index build at
    sf0.1; this shape is ~5 s cold / 0.6 s warm) and re-runs the filter per
    reference in interpreted fallback.
    """
    tags_c = F.col(tags) if isinstance(tags, str) else tags
    key_l = key.lower()
    # first match only (slice → ≤1 element), duplicate tag keys tolerated
    hit = F.slice(F.filter(tags_c, lambda t: F.lower(t["key"]) == key_l), 1, 1)
    conv = F.transform(hit, tag_struct_value_str)
    target = _WHITELIST_CAST[declared_type.lower()]
    return F.try_element_at(conv, F.lit(1)).try_cast(target)


def get_event_timestamp(logs: Column | str, event: str) -> Column:
    """Timestamp of the first log whose `event` field equals `event`
    (case-insensitive) — reference: SpanUtils.scala:29-35."""
    logs_c = F.col(logs) if isinstance(logs, str) else logs
    ev = event.lower()
    hit = F.filter(
        logs_c,
        lambda l: F.exists(
            l["fields"],
            lambda f: (F.lower(f["key"]) == "event") & (F.lower(f["vstr"]) == ev),
        ),
    )
    return F.try_element_at(hit, F.lit(1))["timestamp"]


def has_log_events(logs: Column | str, *events: str) -> Column:
    """True iff ALL given zipkin markers are present (SpanUtils.scala:57-69)."""
    cond = F.lit(True)
    for ev in events:
        cond = cond & get_event_timestamp(logs, ev).isNotNull()
    return cond


def span_kind(tags: Column | str = "tags", logs: Column | str = "logs") -> Column:
    """The span.kind tag when present, else inferred from zipkin markers:
    sr∧ss → 'server', cs∧cr → 'client', else NULL
    (reference: SpanUtils.scala:45-55)."""
    explicit = tag_value(tags, "span.kind", "string")
    return F.coalesce(
        explicit,
        F.when(has_log_events(logs, "sr", "ss"), F.lit("server")),
        F.when(has_log_events(logs, "cs", "cr"), F.lit("client")),
    )
