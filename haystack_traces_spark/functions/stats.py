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


def skew_kurt(x: Column) -> tuple[Column, Column]:
    """(skewness g1, EXCESS kurtosis g2) population-moment aggregate
    expressions over a double column — the shared builder for the
    distribution-shape operators (`span_duration_modality`). UNROUNDED
    (callers round once at the end, house rule). Central moments come
    from raw power sums (the only shuffle-free form); m2 is clamped at 0
    (same cancellation argument as pearson_corr) and NULLIFs every
    denominator, so a constant column yields NULL on both engines.

    CALLERS MUST ANCHOR ``x`` FIRST (subtract a per-group constant such
    as the group min — central moments are shift-invariant): raw power
    sums of large-magnitude low-CV inputs (epoch-scale values, steady
    ~1e6 µs latencies) cancel catastrophically — x⁴ exceeds 2^53
    exactness and m3/m4 come out as pure rounding noise that also
    diverges cross-engine. Review-found with durations ≈1e6 ± 2:
    unanchored g2 ≈ 1.5e9 vs the true −1.04. Anchoring makes the
    centered values small integers and the sums exact."""
    n = F.count(F.lit(1)).cast("double")
    mean = F.sum(x) / n
    ex2 = F.sum(x * x) / n
    ex3 = F.sum(x * x * x) / n
    ex4 = F.sum(x * x * x * x) / n
    m2 = F.greatest(ex2 - mean * mean, F.lit(0.0))
    m3 = ex3 - 3 * mean * ex2 + 2 * mean * mean * mean
    m4 = ex4 - 4 * mean * ex3 + 6 * mean * mean * ex2 - 3 * mean * mean * mean * mean
    g1 = m3 / F.nullif(F.pow(m2, F.lit(1.5)), F.lit(0.0))
    g2 = m4 / F.nullif(m2 * m2, F.lit(0.0)) - F.lit(3.0)
    return g1, g2


def skew_kurt_sql(x: str) -> tuple[str, str]:
    """DuckDB mirror of :func:`skew_kurt` for double expression ``x`` —
    two fragments to drop into a grouped SELECT."""
    n = "CAST(COUNT(*) AS DOUBLE)"
    mean = f"(SUM({x}) / {n})"
    ex2 = f"(SUM(({x}) * ({x})) / {n})"
    ex3 = f"(SUM(({x}) * ({x}) * ({x})) / {n})"
    ex4 = f"(SUM(({x}) * ({x}) * ({x}) * ({x})) / {n})"
    m2 = f"GREATEST({ex2} - {mean} * {mean}, 0)"
    m3 = f"({ex3} - 3 * {mean} * {ex2} + 2 * {mean} * {mean} * {mean})"
    m4 = (
        f"({ex4} - 4 * {mean} * {ex3} + 6 * {mean} * {mean} * {ex2}"
        f" - 3 * {mean} * {mean} * {mean} * {mean})"
    )
    g1 = f"({m3} / NULLIF(POWER({m2}, 1.5), 0))"
    g2 = f"({m4} / NULLIF({m2} * {m2}, 0) - 3)"
    return g1, g2


def round6_half_up(x: float | None) -> float | None:
    """HALF_UP 6dp rounding for DRIVER-SIDE Python floats that face a
    DuckDB/Spark ``ROUND(x, 6)`` oracle. Python's builtin ``round()`` is
    banker's rounding and flips against both engines on exact .5e-7
    boundaries (house rule 15, found by hypothesis in round 6) — any
    Python-computed value emitted into a createDataFrame result row must
    route through this instead."""
    if x is None:
        return None
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))
