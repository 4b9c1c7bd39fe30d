from haystack_traces_spark.sources.events import (  # noqa: F401
    EVENT_SPANS_CTE,
    load_tables,
    spans_from_events,
)
