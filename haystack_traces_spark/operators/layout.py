"""Physical data layout for the span store: Morton/z-order write path.

`zorder_layout_plan` (entry_queries) PRICES the layout decision from a
zone-map simulation; this module SHIPS the winning layout — sort the
span table by the interleaved (time, service) Morton key and write it
range-partitioned so each output file covers a contiguous Morton range.
A min/max-skipping reader (parquet row-group stats, or a file manifest
built from the same zone maps) then prunes BOTH service- and
time-predicated scans, which is the measured receipt in SCALE.md §4.aa.

Scale shape: the keys are pure arithmetic off a 1-row min/max aggregate
and a broadcast service catalog (no global rank); `repartitionByRange`
samples the Morton key to place file boundaries — the only shuffle is
the range exchange the sort needs anyway.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

ZORDER_CELLS = 256  # per-dimension key cells (8 bits)
ZORDER_FILES = 64  # default output files


def morton_terms(div_op: str, cells: int = ZORDER_CELLS) -> str:
    """Bit-interleave of (tkey, skey) as pure integer arithmetic —
    ``div_op`` is the engine's integer-division token (Spark ``DIV``,
    DuckDB ``//``); multiplies by literal powers of two instead of
    shifts (F.shiftleft's numBits is Python-int-only, and the arithmetic
    form is engine-portable)."""
    bits = cells.bit_length() - 1
    return " + ".join(
        f"((tkey {div_op} {1 << i}) % 2) * {1 << (2 * i)}"
        f" + ((skey {div_op} {1 << i}) % 2) * {1 << (2 * i + 1)}"
        for i in range(bits)
    )


def with_morton_key(spans: DataFrame, cells: int = ZORDER_CELLS) -> DataFrame:
    """Adds (tkey, skey, morton) to a span frame: time normalized over
    the observed range, service ranks spread across the full cell range
    (both dimensions equal-width — see SCALE.md §4.aa for why a narrow
    service dimension degenerates the interleave to a time sort)."""
    # coalesce NULL service to '' BEFORE the catalog join: an equi-join
    # on a NULL key never matches and would silently drop the row from
    # a persistence path
    base = spans.withColumn(
        "_svc", F.lower(F.coalesce(F.col("service_name"), F.lit("")))
    )
    svc_dim = (
        base.select("_svc")
        .distinct()
        .withColumn("_rn", F.row_number().over(Window.orderBy("_svc")))
        .withColumn(
            "_nsvc", F.count(F.lit(1)).over(Window.partitionBy(F.lit(1)))
        )
        .select(
            "_svc",
            F.expr(f"CAST((_rn - 1) * {cells} DIV _nsvc AS BIGINT)").alias(
                "skey"
            ),
        )
    )
    trange = base.agg(
        F.min("start_time").alias("_tmin"), F.max("start_time").alias("_tmax")
    )
    return (
        base.join(F.broadcast(svc_dim), "_svc")
        .crossJoin(F.broadcast(trange))
        .withColumn(
            "tkey",
            F.expr(f"(start_time - _tmin) * {cells} DIV (_tmax - _tmin + 1)"),
        )
        .withColumn("morton", F.expr(morton_terms("DIV", cells)))
        .drop("_svc", "_tmin", "_tmax")
    )


def write_spans_zordered(
    spans: DataFrame,
    path: str,
    files: int = ZORDER_FILES,
    cells: int = ZORDER_CELLS,
) -> None:
    """Write the span table z-ordered: range-partition on the Morton key
    (one file per range, contiguous and non-overlapping — pinned by
    test) and sort within each file so parquet row-group min/max stats
    are tight. The written files realize the pruning the simulation
    measured: a reader filtering on service and/or time skips every file
    whose (tkey, skey) zone map misses the predicate."""
    keyed = with_morton_key(spans, cells)
    (
        keyed.repartitionByRange(files, "morton")
        .sortWithinPartitions("morton")
        .write.mode("overwrite")
        .parquet(path)
    )
