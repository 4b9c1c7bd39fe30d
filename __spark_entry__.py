"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over haystack_traces_spark.entry_queries — the engine's query
registry (one entry per implemented SURVEY.md §2 operator) with DuckDB
oracle mirrors.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from haystack_traces_spark import entry_queries  # noqa: E402


def _ensure_confs(spark: SparkSession) -> None:
    from haystack_traces_spark.session import ship_package

    # the testdata stores TIMESTAMP(NANOS); Spark needs this to read it
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # pandas-UDF closures need the package on executor workers
    ship_package(spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ensure_confs(spark)
    return entry_queries.q_search_traces(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    base = entry_queries.queries()

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_confs(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in base.items()}


def oracle_sql() -> dict[str, str]:
    return entry_queries.oracle_sql()
