"""Deduplication operators for web-scale corpora.

The reference dedups only by document id (delete-if-exists on add,
SearchEngine.ts:224-227). A 100 TB training-data pipeline needs content-level
dedup; these operators provide the standard ladder, each as a declarative
DataFrame plan:

- **exact**: md5 content fingerprint, canonical doc = min(doc_id) per group.
  One hash + one shuffle on the fingerprint; at 10^12 docs the groupBy keys
  are unique-ish (little skew) and AQE coalesces the tail.
- **MinHash + LSH**: shingle -> h60 -> k universal hashes -> banded signature
  -> candidate pairs share a band -> verify by exact shingle Jaccard. The
  band join is the scale path: candidate generation is linear in corpus size
  (explode b bands per doc, shuffle on band key) instead of O(n^2); only
  verified candidates pay the set-intersection cost. Giant bands (boilerplate
  pages hashing to one band) are handled by a per-band member cap.
- **SimHash**: 16-bit locality-sensitive bit signature over the token set;
  near-dups differ in few bits. Build is one explode + groupBy with 16
  conditional sums — all JVM expressions.
- **n-gram Jaccard verify**: exact similarity on candidate pairs only.
- **embedding cosine near-dup**: see operators/similarity.py (LSH-bucketed).

All hashing uses the portable h60/universal-hash convention from
functions/hashing.py so ANSI-SQL oracles reproduce values bit-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..analysis.spark import tokens_for
from ..functions.hashing import h60, minhash_col, shingles_col
from ..functions.portable import round6


def normalized_tokens(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, toks): standard-analyzer tokens — dedup's canonical text form."""
    return docs.select("doc_id", tokens_for(F.col(text_col)).alias("toks"))


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, fingerprint, keep_id, is_dup): exact-content dedup assignment.

    ``keep_id`` = min doc_id sharing the md5 fingerprint; ``is_dup`` = 1 for
    rows that would be dropped. Window-min over the fingerprint — one shuffle.
    """
    fp = docs.select("doc_id", F.md5(F.col(text_col)).alias("fingerprint"))
    keep = fp.groupBy("fingerprint").agg(F.min("doc_id").alias("keep_id"))
    return (fp.join(keep, "fingerprint")
            .select("doc_id", "fingerprint", "keep_id",
                    (F.col("doc_id") != F.col("keep_id")).cast("int").alias("is_dup")))


def minhash_signatures(docs: DataFrame, text_col: str = "text",
                       k: int = 8, shingle_n: int = 3) -> DataFrame:
    """(doc_id, mh0..mh{k-1}): MinHash signature over n-token shingles.

    Shingling, hashing, and the k minima are all array expressions inside
    whole-stage codegen — zero Python, zero shuffle (per-row map only).
    """
    toks = normalized_tokens(docs, text_col)
    sh = toks.select(
        "doc_id",
        F.transform(shingles_col(F.col("toks"), shingle_n), h60).alias("hh"))
    cols = [minhash_col(F.col("hh"), i).alias(f"mh{i}") for i in range(k)]
    return sh.select("doc_id", *cols)


def lsh_candidate_pairs(sigs: DataFrame, n_bands: int = 4,
                        rows_per_band: int = 2,
                        max_band_size: int = 1000) -> DataFrame:
    """(a_id, b_id): distinct candidate pairs sharing >=1 MinHash band.

    Explodes each doc into ``n_bands`` (band_key) rows, self-joins on the
    key. ``max_band_size`` caps degenerate bands (empty/boilerplate docs all
    hashing to one band) so a single hot key cannot produce O(n^2) pairs —
    the standard guardrail at 10^12-doc scale; capped bands are dropped (the
    docs still pair through their other bands).
    """
    bands = None
    for j in range(n_bands):
        key = F.concat_ws(
            ":", F.lit(j),
            *[F.col(f"mh{j * rows_per_band + r}") for r in range(rows_per_band)])
        part = sigs.select(F.col("doc_id"), key.alias("band_key"))
        bands = part if bands is None else bands.unionByName(part)
    sized = bands.join(
        bands.groupBy("band_key").agg(F.count(F.lit(1)).alias("n")),
        "band_key").where(F.col("n") <= max_band_size).drop("n")
    a = sized.alias("a")
    b = sized.alias("b")
    return (a.join(b, (F.col("a.band_key") == F.col("b.band_key"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("a_id"),
                    F.col("b.doc_id").alias("b_id"))
            .distinct())


def jaccard_verify(pairs: DataFrame, docs: DataFrame, text_col: str = "text",
                   shingle_n: int = 3, threshold: float = 0.5) -> DataFrame:
    """(a_id, b_id, jaccard): exact shingle-set Jaccard on candidate pairs.

    Joins each side's distinct-shingle array onto the (small) pair set and
    intersects arrays per row — the expensive exact check runs only on LSH
    survivors, never on the full cross product.
    """
    sh = (normalized_tokens(docs, text_col)
          .select("doc_id",
                  F.array_distinct(shingles_col(F.col("toks"), shingle_n))
                  .alias("sh")))
    out = (pairs
           .join(sh.select(F.col("doc_id").alias("a_id"),
                           F.col("sh").alias("sh_a")), "a_id")
           .join(sh.select(F.col("doc_id").alias("b_id"),
                           F.col("sh").alias("sh_b")), "b_id"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return (out.select("a_id", "b_id", round6(jac).alias("jaccard"))
            .where(F.col("jaccard") >= threshold))


def minhash_lsh_dedup(docs: DataFrame, text_col: str = "text", k: int = 8,
                      shingle_n: int = 3, n_bands: int = 4,
                      threshold: float = 0.5) -> DataFrame:
    """End-to-end near-dup pairs: signatures -> banded candidates -> verify."""
    sigs = minhash_signatures(docs, text_col, k=k, shingle_n=shingle_n)
    pairs = lsh_candidate_pairs(sigs, n_bands=n_bands, rows_per_band=k // n_bands)
    return jaccard_verify(pairs, docs, text_col, shingle_n, threshold)


def simhash16(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash): 16-bit SimHash over the distinct token set.

    bit_j(doc) = 1 iff sum over tokens of (+1 if bit j of h60(token) else -1)
    is > 0. Implemented as explode -> groupBy(doc) with 16 conditional sums —
    map-side partial aggregation keeps the shuffle at one row per doc.
    Docs within small Hamming distance are near-duplicates.
    """
    tok = (normalized_tokens(docs, text_col)
           .select("doc_id",
                   F.explode(F.array_distinct("toks")).alias("term")))
    tok = tok.withColumn("h", h60(F.col("term")))
    bit = lambda j: F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1,  # noqa: E731
                           F.lit(1)).otherwise(F.lit(-1))
    aggs = [F.sum(bit(j)).alias(f"s{j}") for j in range(16)]
    per_doc = tok.groupBy("doc_id").agg(*aggs)
    sim = None
    for j in range(16):
        term = F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    all_docs = docs.select("doc_id")
    return (all_docs.join(per_doc, "doc_id", "left")
            .select("doc_id",
                    F.coalesce(sim, F.lit(0)).cast("long").alias("simhash")))
