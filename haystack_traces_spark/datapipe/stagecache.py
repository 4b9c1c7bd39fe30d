"""Per-session materialized-stage cache for composite registry queries.

Four registry composites (``leakage_safe_split``, ``dedup_report``,
``dup_pair_evidence``, ``contamination_by_source``) and the base entries
they compose (``dedup_ngram_jaccard``, ``dedup_clusters``,
``decontaminate``) share upstream stages — the shingle→ppjoin→Jaccard
pair pipeline, the label-propagation cluster map, the probe-shingle
verdicts. The registry contract keeps every query self-contained (the
driver runs each independently in a fresh process), which previously
meant each composite rebuilt the shared stage inline: ~8–10 s of the
125 s sf0.1 bench re-spent on identical work (VERDICT r4 #3).

:func:`shared_stage` is the production analog of "write the clusters
table once, read it everywhere": the first caller in a session builds and
materializes the stage; later callers reuse it. Keyed by
``(applicationId, sf_dir, stage name)`` so results can never leak across
sessions or scale factors, and the cached value is identical to what the
caller would have built — correctness is untouched, only repeat cost.

Materialization is ``localCheckpoint(eager=True)`` rather than
``session.materialize`` on purpose: bench/oracle loops call
``release_materialized()`` after every query, which would evict a
persist-based cache between the queries it exists to serve. A local
checkpoint stores the computed partitions outside that sweep and
truncates lineage, so downstream plans re-optimize from a flat scan. The
cached stages are all small derived tables (flagged pairs, cluster
members, per-doc verdicts — output-side, not corpus-side), so pinning
them for the session is bounded by design.
"""

from __future__ import annotations

import contextlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_cache: dict[tuple[str, str, str], DataFrame] = {}
_plan_view = False


@contextlib.contextmanager
def plan_view():
    """Build stages INLINE (no localCheckpoint, no cache) for the scope —
    plan-shape tests only. A checkpointed stage reads back as `Scan
    ExistingRDD`, which neuters any .explain() assertion on the pipeline
    underneath it (round-7 rule 18); inside this context the composed
    query's plan shows the real stage pipeline. Never use on the hot
    path: it defeats the sharing this module exists for."""
    global _plan_view
    _plan_view = True
    try:
        yield
    finally:
        _plan_view = False


def shared_stage(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Return the session-cached materialization of stage ``name`` for
    ``sf_dir``, building it with ``build()`` on first use. Stage-build
    cost appears in the bench ledger because bench.py forces every stage
    via :func:`haystack_traces_spark.datapipe.queries.shared_stages`
    BEFORE the per-query loop, timing each as its own ``stage:<name>``
    line (VERDICT r5 ask #4)."""
    if _plan_view:
        return build()
    key = (spark.sparkContext.applicationId, str(sf_dir), name)
    df = _cache.get(key)
    if df is None:
        df = build().localCheckpoint(eager=True)
        _cache[key] = df
    return df


def clear() -> int:
    """Drop every cached stage. Required whenever the files UNDER a
    cached sf_dir change (regenerated corpus, crafted test frames reusing
    a path): the key is (session, dir, stage) with no file-freshness
    check, so a rewritten directory would otherwise keep serving the
    pre-rewrite checkpoint while uncached queries scan the new data.
    Returns the number of entries dropped; the checkpointed blocks are
    freed by the JVM once unreferenced. Also invalidates the
    sf_dir-keyed driver-side oracle caches that share the same staleness
    hazard (the ivf_pq_residual codebook literals — ADVICE r5)."""
    n = len(_cache)
    _cache.clear()
    from haystack_traces_spark.datapipe import queries as _dpq

    _dpq._sql_ivf_pq_residual_for.cache_clear()
    return n
