"""Bucketed table layout for the trace store / index pair.

`build_trace_store`'s docstring promises "at scale write bucketed by
trace_id so the search-phase semi-join and the re-group are co-located" —
this module is that write path. Both the store and the index hash-bucket
on the trace key with the same bucket count, so every downstream
(index ⋈ store) fetch join and per-trace re-group reads co-located
buckets and runs with NO shuffle exchange on either side (asserted by
`tests/test_plans.py::test_bucketed_store_index_join_is_exchange_free`).

This is the Spark-native analog of the reference's Cassandra
partition-key layout (trace_id as the row key — every read of one trace
touches one partition): the bucket function is Spark's own hash
partitioning, so Catalyst recognizes the layout and elides the exchange
instead of re-shuffling 100 TB to satisfy the join's distribution
requirement. Sorting within buckets by the key also elides the
sort-merge join's per-side sort.

Bucket count guidance at scale: pick buckets so one bucket of the STORE
fits an executor's read slice (~128-512 MB); both tables MUST use the
same count or Spark falls back to shuffling the mismatched side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    buckets: int = 8,
    key: str = "trace_id",
) -> None:
    """Write ``df`` as a bucketed+sorted external table (data under
    ``path``, metadata in the session catalog)."""
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .option("path", path)
        .format("parquet")
        .saveAsTable(name)
    )


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Catalog read — bucket metadata only survives through the table
    identifier (a raw parquet read of the same files loses the layout)."""
    return spark.table(name)
