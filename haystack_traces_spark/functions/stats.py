"""Cross-engine statistical expression builders.

The ONE Pearson-correlation-from-raw-sums construction (Spark Column +
DuckDB SQL fragment) shared by every operator that correlates two
measures (`service_latency_coupling`, `ppl_length_confound`, …).

Why not the engines' corr(): Spark returns NaN on zero variance while
DuckDB returns NULL — instant cross-engine divergence. The sum form
NULLIFs the denominator identically on both engines. Why the GREATEST
clamp: catastrophic cancellation in n·Σx² − (Σx)² can land a few ulps
NEGATIVE when the true variance is tiny relative to the magnitudes —
DuckDB hard-errors on sqrt(negative) ("Out of Range") while Spark emits
NaN, so both faces clamp at 0 (which then NULLIFs: a variance that
cancels to ≤ 0 is indistinguishable from zero variance at double
precision, and zero variance has no defined correlation).

Inputs must already be DOUBLE: BIGINT moment sums overflow at scale, and
DuckDB promotes to HUGEINT while Spark wraps.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def pearson_corr(x: Column, y: Column) -> Column:
    """6dp-rounded Pearson correlation AGGREGATE expression over double
    columns — usable directly inside ``groupBy(...).agg(...)``."""
    n = F.count(F.lit(1))
    sx, sy = F.sum(x), F.sum(y)
    cov = n * F.sum(x * y) - sx * sy
    varx = F.greatest(n * F.sum(x * x) - sx * sx, F.lit(0.0))
    vary = F.greatest(n * F.sum(y * y) - sy * sy, F.lit(0.0))
    return F.round(cov / F.nullif(F.sqrt(varx * vary), F.lit(0.0)), 6)


def pearson_corr_sql(x: str, y: str) -> str:
    """DuckDB mirror of :func:`pearson_corr` for the same double
    expressions ``x`` and ``y`` — drop into any grouped SELECT."""
    return (
        f"ROUND((COUNT(*) * SUM({x} * {y}) - SUM({x}) * SUM({y})) / "
        f"NULLIF(SQRT(GREATEST(COUNT(*) * SUM({x} * {x}) - SUM({x}) * SUM({x}), 0) "
        f"* GREATEST(COUNT(*) * SUM({y} * {y}) - SUM({y}) * SUM({y}), 0)), 0), 6)"
    )
