"""Generic AS-OF join — the time-series staple Spark has no native
operator for (DuckDB/kdb/pandas `merge_asof` semantics): for every left
row, attach the latest right row of the same key whose timestamp is <=
the left timestamp.

Implementation is the UNION + WINDOW linearization, not an inequality
join: tag each side, union them, sort per KEY by (ts, side, order)
and carry the right side's values forward with last(ignorenulls) /
running max over an UNBOUNDED PRECEDING frame. One shuffle on the key —
the same cost as the sort-merge join Spark would run for an equi-join —
while a naive `l JOIN r ON key AND r.ts <= l.ts` explodes to the full
per-key cross product before aggregation. Running frames over a sorted
window are pipelined by Spark's WindowExec (no per-row re-scan), so the
whole operator is one exchange + one sort at any scale; a skewed key
(one user with the whole history) is bounded by that key's own row
count, the same exposure every per-key window in the repo has.

Ties: a right row AT the left row's timestamp matches (<= semantics) —
the union sorts right rows before left rows at equal ts. Multiple right
rows at one ts resolve to the last under ``right_order`` (deterministic,
mirroring the oracle's MAX aggregation).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    right_order: str | None = None,
) -> DataFrame:
    """→ every ``left`` row + ``value_cols`` from the latest ``right``
    row with the same ``on`` key and ``right_ts`` <= ``left_ts`` (NULLs
    when no prior right row exists).

    ``value_cols`` must exist on ``right`` and not collide with left
    column names. ``right_order`` breaks ties among right rows sharing
    one timestamp (defaults to ``right_ts``). Right rows with a NULL
    timestamp are dropped (pandas `merge_asof` parity — a row with no
    time cannot be "before" anything; carrying it would make it match
    universally because NULLs sort first).

    All ``value_cols`` travel in ONE carried struct, so the attached
    values always come from a single right row — per-column carries
    would resurrect older non-NULL values and stitch together a row
    that never existed."""
    reserved = {"_ts", "_side", "_ord", "_r", "_asof"}
    taken = (set(left.columns) | set(right.columns)) & reserved
    if taken:
        # left.select('*', alias...) would create duplicate names →
        # ambiguous-reference failures or silently wrong carried values
        # (mirrors interval_join's overlap guard — ADVICE r5)
        raise ValueError(
            f"asof_join reserves internal column names {sorted(reserved)}; "
            f"rename {sorted(taken)} before joining"
        )
    order = right_order or right_ts
    # left carries its own payload; right carries only key/ts/values
    val_struct = F.struct(*[F.col(c).alias(c) for c in value_cols])
    l_tag = left.select(
        "*",
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[order].dataType).alias("_ord"),
        F.lit(None).cast(
            right.select(val_struct.alias("_r")).schema["_r"].dataType
        ).alias("_r"),
    )
    r_tag = right.filter(F.col(right_ts).isNotNull()).select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(order).alias("_ord"),
        val_struct.alias("_r"),
    )
    # align schemas: left payload columns are NULL on the right side
    left_only = [c for c in l_tag.columns if c not in r_tag.columns]
    r_full = r_tag.select(
        "*",
        *[F.lit(None).cast(l_tag.schema[c].dataType).alias(c)
          for c in left_only],
    )
    unioned = l_tag.unionByName(r_full)
    w = (
        Window.partitionBy(*on)
        .orderBy("_ts", "_side", "_ord")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*", F.last("_r", ignorenulls=True).over(w).alias("_asof")
    )
    out_cols = [c for c in left.columns] + [
        F.col("_asof")[c].alias(c) for c in value_cols
    ]
    return carried.filter(F.col("_side") == 1).select(*out_cols)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket: int,
) -> DataFrame:
    """Range join — points into half-open [start, end) intervals of the
    same key — LINEARIZED: each interval explodes into the coarse time
    ``bucket``s it overlaps, each point maps to its own bucket, and the
    match becomes an EQUI-join on (key, bucket) plus an exact residual
    filter. The naive `p JOIN i ON key AND start <= ts < end` is a
    per-key cross product; this shape joins each point against only the
    intervals sharing its bucket.

    ``bucket`` tunes explode-factor vs selectivity: intervals produce
    ceil(len/bucket) rows (keep bucket within ~1-2 orders of magnitude
    of typical interval length). Degenerate intervals (end <= start) are
    dropped — half-open and empty. The two frames may share only the
    ``on`` columns (enforced — a silent overlap would make every
    downstream by-name reference ambiguous)."""
    overlap = (set(points.columns) & set(intervals.columns)) - set(on)
    if overlap:
        raise ValueError(
            f"points and intervals share non-key columns {sorted(overlap)}; "
            "rename or project them before interval_join"
        )
    valid = intervals.filter(F.col(end_col) > F.col(start_col))
    first_b = F.col(start_col) - F.col(start_col) % bucket
    last_b = (F.col(end_col) - 1) - (F.col(end_col) - 1) % bucket
    b_int = valid.withColumn(
        "_b", F.explode(F.sequence(first_b, last_b, F.lit(bucket)))
    )
    b_pts = points.withColumn(
        "_b", F.col(point_ts) - F.col(point_ts) % bucket
    )
    return (
        b_pts.join(b_int, [*on, "_b"])
        .filter(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) < F.col(end_col))
        )
        .drop("_b")
    )
