"""Cross-engine deterministic hashing + shingling primitives.

hash60(s) = first 15 hex digits of md5(s) as a 60-bit integer — identical in
Spark (`conv(substr(md5(s),1,15),16,10)`), DuckDB
(`CAST('0x'||substr(md5(s),1,15) AS BIGINT)`), and Python
(`int(md5(s).hexdigest()[:15], 16)`), which makes every sketch operator
(MinHash, SimHash, winnowing) oracle-checkable bit-for-bit.
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
from pyspark.sql import Column


def hash60(col: Column | str, seed: str = "") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    if seed:
        c = F.concat(F.lit(seed), c)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def hash60_sql(expr: str, seed: str = "") -> str:
    inner = f"'{seed}' || {expr}" if seed else expr
    return f"CAST(('0x' || substr(md5({inner}), 1, 15)) AS BIGINT)"


def hash60_py(s: str, seed: str = "") -> int:
    return int(hashlib.md5((seed + s).encode()).hexdigest()[:15], 16)


def word_shingles(text_col: Column | str, n: int = 3) -> Column:
    """Distinct space-joined word n-grams, in no particular order.

    Pure array expressions (JVM-side, codegen) — no UDF, no explode until
    the caller needs rows. Docs shorter than n words yield an EMPTY set:
    Spark's sequence(0, -1) counts DOWN ([0, -1]) rather than producing
    nothing, which would emit junk partial grams the DuckDB mirror
    (generate_series, empty when stop < start) never sees — the explicit
    size guard keeps both engines identical on short docs.
    """
    words = F.split(F.col(text_col) if isinstance(text_col, str) else text_col, " ")
    grams = F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - n),
            lambda i: F.concat_ws(" ", *[F.get(words, i + j) for j in range(n)]),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def word_shingles_sql(expr: str = "text", n: int = 3) -> str:
    """DuckDB mirror of word_shingles (1-indexed lists)."""
    parts = " || ' ' || ".join(f"w[i+{j}]" for j in range(n))
    return f"""
  SELECT doc_id, s FROM (
    SELECT doc_id, {parts} AS s
    FROM (SELECT doc_id, string_split({expr}, ' ') AS w FROM documents),
         UNNEST(generate_series(1, len(w) - {n - 1})) t(i)
  ) GROUP BY doc_id, s
"""


def ordered_word_shingles(text_col: Column | str, n: int = 3) -> Column:
    """Positional (non-distinct) shingles for winnowing. Same short-doc
    guard as word_shingles (descending-sequence pitfall)."""
    words = F.split(F.col(text_col) if isinstance(text_col, str) else text_col, " ")
    return F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - n),
            lambda i: F.concat_ws(" ", *[F.get(words, i + j) for j in range(n)]),
        ),
    ).otherwise(F.array().cast("array<string>"))
