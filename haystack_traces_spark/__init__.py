"""haystack_traces_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ExpediaDotCom/haystack-traces.

Brand-new, Spark-first design (DataFrame/SQL + Structured Streaming), NOT a port:
the reference's ES+Cassandra+Kafka-consumer architecture is replaced by
Parquet-backed DataFrames, Catalyst planning, and `applyInPandas*` for the
per-trace tree logic that SQL cannot express.

Layers (see SURVEY.md §7):
  - ``sources``    — batch/streaming span sources; the events→spans mapping
  - ``functions``  — scalar span/tag/time functions (SURVEY §2.9)
  - ``operators``  — index build, predicate compiler, search/counts/field-values
  - ``transform``  — per-trace transformer chain U1-U11 + validators V1-V3
  - ``streaming``  — T1 sessionization (applyInPandasWithState), ingest topology
  - ``datapipe``   — large-scale training-data ops: dedup, similarity, text, multimodal
  - ``api``        — TraceEngine facade mirroring the reference's 9 gRPC endpoints
"""

__version__ = "0.1.0"

import os as _os

# BLAS pinning at package-import time: executor Python workers import this
# package (closure deserialization) BEFORE numpy loads, so the setting takes
# effect even under a driver session that didn't go through get_spark().
# N workers x M BLAS threads oversubscribes any host (see SCALE.md §5).
for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    _os.environ.setdefault(_v, "1")

from haystack_traces_spark.session import get_spark  # noqa: E402,F401
