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
