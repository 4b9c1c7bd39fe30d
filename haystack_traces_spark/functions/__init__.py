from haystack_traces_spark.functions.span_funcs import (  # noqa: F401
    end_time,
    low_cardinality_duration,
    tag_value,
    truncate_to_second,
)
