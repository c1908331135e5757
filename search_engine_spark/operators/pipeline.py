"""Corpus-cleaning pipeline: the canonical pretraining preprocessing pass.

Composes the pipeline operators into the standard web-corpus cleaning
recipe (c4/refinedweb-shaped): exact dedup → near-dup removal (MinHash-LSH)
→ quality floor → language filter. One declarative plan; each stage is the
oracle-verified operator from its own module, so the composition is exactly
as trustworthy as its parts.

Scale shape: exact dedup is one shuffle on the content hash; near-dup is
the linear LSH band join; quality/language are per-row expressions — the
whole pass is 3 shuffles regardless of corpus size. Near-dup removal keeps
the LOWER doc_id of each verified pair (survivor-of-pairs transitively:
a doc is dropped iff it is the b-side of any verified pair — the standard
greedy rule, deterministic because pairs are (min, max)-ordered).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import textstats
from . import dedup


def clean_corpus(docs: DataFrame, text_col: str = "text",
                 n_chars_col: str = "n_chars",
                 min_quality: float = 0.5, lang: str | None = "en",
                 neardup_threshold: float = 0.5) -> DataFrame:
    """(doc_id, quality, pred_lang, reason): per-doc keep/drop verdict.

    ``reason`` is '' for survivors, else the FIRST failing stage in the
    fixed order exact_dup → near_dup → quality → lang (deterministic).
    """
    exact = dedup.exact_duplicates(docs, text_col) \
        .select("doc_id", "is_dup")
    near_pairs = dedup.minhash_lsh_dedup(docs, text_col,
                                         threshold=neardup_threshold) \
        .select(F.col("b_id").alias("doc_id")).distinct() \
        .withColumn("near_dup", F.lit(1))
    stats = docs.select(
        "doc_id",
        textstats.quality_score(F.col(text_col), F.col(n_chars_col))
        .alias("quality"),
        textstats.lang_id(F.col(text_col)).alias("pred_lang"))

    out = (stats.join(exact, "doc_id")
           .join(near_pairs, "doc_id", "left")
           .withColumn("near_dup", F.coalesce("near_dup", F.lit(0))))
    reason = (F.when(F.col("is_dup") == 1, F.lit("exact_dup"))
              .when(F.col("near_dup") == 1, F.lit("near_dup"))
              .when(F.col("quality") < min_quality, F.lit("low_quality")))
    if lang is not None:
        reason = reason.when(F.col("pred_lang") != lang, F.lit("wrong_lang"))
    return out.select("doc_id", "quality", "pred_lang",
                      F.coalesce(reason, F.lit("")).alias("reason"))


def surviving_docs(docs: DataFrame, **kwargs) -> DataFrame:
    """The cleaned corpus: input rows whose verdict reason is ''."""
    verdict = clean_corpus(docs, **kwargs)
    keep = verdict.where(F.col("reason") == "").select("doc_id")
    return docs.join(keep, "doc_id", "semi")
