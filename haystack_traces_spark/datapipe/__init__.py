"""Large-scale training-data pipeline operators (driver north-star):
deduplication, similarity search, text analysis, multimodal columns.

Each operator is designed for the 100 TB path (shingle-join / LSH-bucket
candidate generation, never all-pairs at scale) and ships with a DuckDB
oracle mirror in ``datapipe.queries``.
"""

from haystack_traces_spark.datapipe.queries import bench_queries  # noqa: F401
