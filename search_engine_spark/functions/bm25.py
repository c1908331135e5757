"""Okapi BM25 as a native Spark column expression.

Formula per the reference scorer (BM25Scorer.ts:84-118), defaults k1=1.2,
b=0.75 (BM25Scorer.ts:64-65):

    idf   = ln((N - df + 0.5) / (df + 0.5) + 1)
    score = boost * idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

clamped at >= 0. The operation ORDER here is load-bearing: the pure-Python
oracle (oracle/pyref.py) and the DuckDB oracle SQL in __spark_entry__.py
spell the identical expression so double-precision results agree bitwise
(modulo libm ln ulp differences, absorbed by the 1e-9 test tolerance).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .. import B, K1


def bm25_score(tf: Column, df: Column, dl: Column,
               total_docs: float, avg_dl: float,
               k1: float = K1, b: float = B,
               boost: "float | Column" = 1.0) -> Column:
    """BM25 score column for one (term, doc) posting.

    ``total_docs`` and ``avg_dl`` are broadcast scalars (computed once at
    build time, stored in index meta) — no per-row join needed for them.
    ``boost`` is the field boost (BM25Scorer.ts:109-114): a scalar, or a
    Column for per-field boosts (a CASE over the ``field`` column).
    """
    avgdl = avg_dl or 1.0  # avgDocLength || 1 (BM25Scorer.ts:105)
    boost_col = boost if isinstance(boost, Column) else F.lit(float(boost))
    idf = F.log((F.lit(float(total_docs)) - df + F.lit(0.5)) / (df + F.lit(0.5)) + F.lit(1.0))
    num = tf.cast("double") * F.lit(k1 + 1.0)
    den = tf.cast("double") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (dl.cast("double") / F.lit(float(avgdl))))
    return F.greatest(F.lit(0.0), boost_col * idf * (num / den))


def bm25_score_py(tf: float, df: float, dl: float, total_docs: float,
                  avg_dl: float, k1: float = K1, b: float = B,
                  boost: float = 1.0) -> float:
    """Driver/oracle-side scalar twin of :func:`bm25_score` — identical
    operation order."""
    import math

    if df == 0 or tf < 0:
        return 0.0
    avgdl = avg_dl or 1.0
    idf = math.log((total_docs - df + 0.5) / (df + 0.5) + 1.0)
    num = tf * (k1 + 1.0)
    den = tf + k1 * ((1.0 - b) + b * (dl / avgdl))
    return max(0.0, boost * idf * (num / den))
