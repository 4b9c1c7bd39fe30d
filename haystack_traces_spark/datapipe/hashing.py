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


def _gram_array(words: Column, n: int) -> Column:
    """Positional n-gram array, CSE-SAFE short-doc handling.

    Docs shorter than n words must yield an EMPTY array: Spark's
    sequence(0, -1) counts DOWN ([0, -1]) and would emit junk partial grams
    the DuckDB mirror (generate_series, empty when stop < start) never
    sees. The guard must NOT be a when()/if(): Catalyst's subexpression
    elimination refuses to hoist any tree containing a conditional, and
    winnowing references the gram-hash array inside a per-window-position
    lambda — with a conditional in the tree the whole array is re-evaluated
    per position (measured ~500x blowup). Instead the index sequence is
    clamped to [0] for short docs (unconditional) and the single resulting
    partial gram — the only gram that can have fewer than n words — is
    dropped by an unconditional higher-order filter."""
    idx = F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.get(words, i + j) for j in range(n)])
    )
    return F.filter(grams, lambda g: F.size(F.split(g, " ")) == n)


def word_shingles(text_col: Column | str, n: int = 3) -> Column:
    """Distinct space-joined word n-grams, in no particular order.

    Pure array expressions (JVM-side, codegen) — no UDF, no explode until
    the caller needs rows. Empty for docs shorter than n words (see
    _gram_array for why the guard is conditional-free).
    """
    words = F.split(F.col(text_col) if isinstance(text_col, str) else text_col, " ")
    return F.array_distinct(_gram_array(words, n))


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
    """Positional (non-distinct) shingles for winnowing. Empty for docs
    shorter than n words; conditional-free (see _gram_array)."""
    words = F.split(F.col(text_col) if isinstance(text_col, str) else text_col, " ")
    return _gram_array(words, n)
