"""Portable deterministic hashing for dedup / fingerprint / LSH operators.

Engine-independent convention so the Spark plans and the ANSI-SQL oracles
(DuckDB) compute bit-identical values:

    h60(s)  = int(md5(s).hexdigest()[:15], 16)        # 60-bit, non-negative
    mh_i(x) = (A[i] * (x % P) + B[i]) % P             # universal hash, P=2^31-1

``h60`` is expressible in both engines from built-ins only:

    Spark : CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT)
    DuckDB: CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)

All arithmetic stays inside signed 64-bit: x % P < 2^31 and A[i] < 2^31 so the
product is < 2^62. Everything here is a JVM column expression — no Python in
the hot path; at 100 TB the hashes ride inside WholeStageCodegen.

The reference has no content hashing (its dedup is id-equality,
SearchEngine.ts:224-227); these primitives power the training-data-pipeline
operators (exact/MinHash/SimHash dedup, fingerprinting) that a web-scale
corpus needs on top of the reference's surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Mersenne prime 2^31 - 1 — modulus of the universal-hash family.
P = 2_147_483_647

#: Fixed (a, b) parameters for the MinHash hash family, i = 0..15.
#: Deterministic, inlined verbatim into the DuckDB oracle SQL.
MINHASH_A = [(1_103_515_245 * (i + 1)) % P for i in range(16)]
MINHASH_B = [(12_345 + 987_654_321 * i) % P for i in range(16)]


def h60(c: Column) -> Column:
    """60-bit md5-based content hash of a string column (non-negative)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def h60_sql(expr: str) -> str:
    """The DuckDB-SQL twin of :func:`h60` over SQL expression ``expr``."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def minhash_col(hashes: Column, i: int) -> Column:
    """MinHash_i over an ``array<long>`` of h60 shingle hashes (null if empty)."""
    a, b = MINHASH_A[i], MINHASH_B[i]
    return F.array_min(
        F.transform(hashes, lambda x: (F.lit(a) * (x % F.lit(P)) + F.lit(b)) % F.lit(P))
    )


def minhash_sql(hashes_expr: str, i: int) -> str:
    """DuckDB twin of :func:`minhash_col` over a list-of-BIGINT expression."""
    a, b = MINHASH_A[i], MINHASH_B[i]
    return (f"list_min(list_transform({hashes_expr}, "
            f"x -> ({a} * (x % {P}) + {b}) % {P}))")


def shingles_col(tokens: Column, n: int = 3) -> Column:
    """n-gram token shingles (space-joined) of an ``array<string>`` column.

    0-based Spark array indexing; the SQL twin uses 1-based DuckDB indexing —
    both enumerate windows [i, i+n) in order. Empty array when len < n.
    """
    idx = F.sequence(F.lit(0), F.size(tokens) - F.lit(n))
    shingle = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(tokens, (i + F.lit(j) + F.lit(1)).cast("int"))
               for j in range(n)])
    return F.when(F.size(tokens) >= n, F.transform(idx, shingle)) \
            .otherwise(F.array().cast("array<string>"))


def shingles_sql(tokens_expr: str, n: int = 3) -> str:
    """DuckDB twin of :func:`shingles_col` (1-based list indexing)."""
    parts = " || ' ' || ".join(f"({tokens_expr})[i + {j}]" for j in range(n))
    return (f"CASE WHEN len({tokens_expr}) >= {n} THEN "
            f"list_transform(generate_series(1, len({tokens_expr}) - {n - 1}), "
            f"i -> {parts}) ELSE [] END")


# ---------------------------------------------------------------------------
# XXH64 (seed 42) — the exact hash behind Spark's built-in ``xxhash64``.
# Used for the index's term-bucket partitioning: the JVM side is one
# codegen'd xxhash64() call per posting row (vs ~10x costlier md5+conv for
# h60), and this pure-Python twin lets the driver / serving process compute
# a term's bucket with NO Spark job, preserving driver-side partition
# pruning. Bit-parity with F.xxhash64 is pinned by tests.
# ---------------------------------------------------------------------------

_M64 = (1 << 64) - 1
_XP1, _XP2, _XP3, _XP4, _XP5 = (0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F,
                                0x165667B19E3779F9, 0x85EBCA77C2B2AE63,
                                0x27D4EB2F165667C5)


def _xrotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _xround(acc: int, inp: int) -> int:
    return (_xrotl((acc + inp * _XP2) & _M64, 31) * _XP1) & _M64


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 of ``data`` as a SIGNED 64-bit int == Spark ``xxhash64`` on the
    same UTF-8 string (Spark's default seed is 42)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _XP1 + _XP2) & _M64
        v2 = (seed + _XP2) & _M64
        v3 = seed
        v4 = (seed - _XP1) & _M64
        while i + 32 <= n:
            v1 = _xround(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _xround(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _xround(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _xround(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_xrotl(v1, 1) + _xrotl(v2, 7)
             + _xrotl(v3, 12) + _xrotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ _xround(0, v)) * _XP1 + _XP4) & _M64
    else:
        h = (seed + _XP5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        h ^= _xround(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_xrotl(h, 27) * _XP1 + _XP4) & _M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _XP1) & _M64
        h = (_xrotl(h, 23) * _XP2 + _XP3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _XP5) & _M64
        h = (_xrotl(h, 11) * _XP1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _XP2) & _M64
    h ^= h >> 29
    h = (h * _XP3) & _M64
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def xxh64_str(s: str, seed: int = 42) -> int:
    return xxh64(s.encode("utf-8"), seed)
