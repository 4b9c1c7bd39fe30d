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


# ---- Spark F.hash mirror (Murmur3_x86_32) -------------------------------
# Pure-Python replica of Spark's Murmur3 column hash so a driver-side
# process WITHOUT a SparkSession (the ivf_pq_residual oracle generator)
# can reproduce the exact hash-ordered training sample the Spark operator
# draws. Pinned bit-for-bit against a live F.hash (negative and >32-bit
# ids included) by tests/test_functions.py::test_murmur3_mirror_matches_f_hash.

_M32 = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def _mix_k1(k1: int) -> int:
    k1 = (k1 * 0xCC9E2D51) & _M32
    k1 = _rotl32(k1, 15)
    return (k1 * 0x1B873593) & _M32


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl32(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _M32


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M32
    h1 ^= h1 >> 16
    return h1


def _to_signed32(x: int) -> int:
    x &= _M32
    return x - (1 << 32) if x >= (1 << 31) else x


def murmur3_int(value: int, seed: int) -> int:
    """Spark Murmur3_x86_32.hashInt: one 4-byte word."""
    h1 = _mix_h1(seed & _M32, _mix_k1(value & _M32))
    return _to_signed32(_fmix(h1, 4))


def murmur3_long(value: int, seed: int) -> int:
    """Spark Murmur3_x86_32.hashLong: low word then high word."""
    v = value & 0xFFFFFFFFFFFFFFFF
    h1 = _mix_h1(seed & _M32, _mix_k1(v & _M32))
    h1 = _mix_h1(h1, _mix_k1((v >> 32) & _M32))
    return _to_signed32(_fmix(h1, 8))


def spark_hash_long_int(long_val: int, int_val: int) -> int:
    """Mirror of ``F.hash(longCol, intLit)``: Spark folds the columns left
    to right from seed 42, each column's hash seeding the next."""
    return murmur3_int(int_val, murmur3_long(long_val, 42))


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
