"""Inverted-index build: pages/docs DataFrame → postings + stats tables.

Spark-first design (NOT a port of the reference's Map-of-Maps mutation):
postings are built **relationally** — tokenize (JVM expression) → posexplode
→ groupBy(field, term, doc_id) → (tf, sorted positions). The reference's
``addToken`` mutation loop (ShardedInvertedIndex.ts:195-262) collapses into
one shuffle with map-side partial aggregation; its doc-hash shards
(ShardedInvertedIndex.ts:101-133) become term-hash bucket partitions of the
output table so query-time term lookups prune to a single bucket instead of
fanning out to every shard.

Canonical indexing semantics (SURVEY.md §2.2 quirk note): single-pass,
mappings-driven analyzer per field, tf = number of token occurrences in the
field (== unique positions), dl = total tokens across all indexed fields of
the doc (SearchEngine.ts:237-239), positions are per-field token offsets.

Scale notes (100 TB / 10^12 docs):
- tokenize+posexplode+groupBy is embarrassingly parallel; the single shuffle
  keys on (field, term, doc_id) whose cardinality is ~total postings — no
  skew (doc_id spreads head terms).
- term_stats groupBy(field, term) IS head-term skewed, but it's a pure
  count aggregate: map-side partial aggregation reduces each partition to
  one row per term before the shuffle, so the reducer sees |vocab| rows.
- the output is written partitioned by ``bucket = xxhash64(field, term) % B``
  and sorted by (field, term, doc_id) within files: query-time term lookups
  prune to one bucket (partition pruning) and parquet min/max zone maps on
  the sorted ``term`` column skip most row groups within it.
"""

from __future__ import annotations

import json
import math
import os
import time
from dataclasses import dataclass, field as dc_field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..analysis.analyzers import FIELD_TYPE_ANALYZER
from ..analysis.spark import tokens_for

POSTINGS = "postings"
DOC_STATS = "doc_stats"
TERM_STATS = "term_stats"
META = "meta.json"
MANIFEST = "build_manifest"
RUNS = "runs"

#: bucket-function fingerprint written into meta and VALIDATED at load:
#: driver-side bucket pruning (bucket_of) and ServingIndex lookups compute
#: buckets in pure Python, so a layout built with a different hash would
#: silently prune to the WRONG partitions (empty postings, not a crash).
BUCKET_FN = "xxh64:42"


def write_meta(index_dir: str, meta: dict) -> None:
    """Atomic meta.json writer (tmp + os.replace). Every meta write in the
    package MUST go through this: the HTTP facade's reader threads load
    meta concurrently with mutators (catalog.stats on each /search), and a
    plain truncate-then-write exposes a torn/empty file mid-write — seen as
    a JSONDecodeError 500 under the lifecycle hammer test."""
    p = os.path.join(index_dir, META)
    with open(p + ".tmp", "w") as fh:
        json.dump(meta, fh, indent=1)
    os.replace(p + ".tmp", p)


def check_bucket_fn(meta: dict, where: str) -> None:
    """Refuse to serve an index whose bucket layout predates (or differs
    from) the current bucket hash — missing/legacy fingerprints would make
    bucket_of prune to wrong partitions and silently return empty postings."""
    bf = meta.get("bucket_fn")
    if bf != BUCKET_FN:
        raise ValueError(
            f"{where}: index bucket_fn={bf!r} does not match this engine's "
            f"{BUCKET_FN!r} — the layout was written with a different "
            "term-hash; rebuild the index (or re-run write_index) before "
            "querying, otherwise bucket pruning would silently miss postings")


@dataclass
class IndexConfig:
    """Index schema: which columns to index and how.

    ``fields`` maps column name -> reference field type (text | keyword |
    email | url | phone); the analyzer is routed per type exactly like
    SearchEngine.ts:939-954. Non-indexed columns (numbers, dates, geo) stay
    queryable on the docs table itself (range/geo scan semantics, SURVEY Q8/Q9).
    """

    id_col: str = "doc_id"
    fields: dict = dc_field(default_factory=lambda: {"text": "text"})
    n_buckets: int = 32
    positions: bool = True
    stopwords: tuple = ()
    #: opt-in index-time stemming (reference default OFF, Tokenizer.ts:97):
    #: a language code (any of the 28 reference-routed codes) stems every
    #: field with that stemmer; "auto" routes PER DOCUMENT by
    #: ``stem_lang_col`` (the corpus lang column — Stemmer.ts's language
    #: routing with the column as the detector); "detect" routes PER
    #: DOCUMENT by content via functions/textstats.lang_id — the
    #: Spark-native twin of Stemmer.ts autoDetectLanguage (which samples
    #: the text through LanguageDetector). 1:1 per token, so positions
    #: and dl are unchanged (analysis/stemmer.py).
    stem_lang: str | None = None
    stem_lang_col: str = "lang"
    #: per-field analyzer OVERRIDE of the type routing (the reference's
    #: Tokenizer.tokenize takes an analyzer name per call; SearchEngine
    #: routes by field type, SearchEngine.ts:939-954, but mappings may pin
    #: one — e.g. 'whitespace' to index non-ASCII scripts that the
    #: ASCII-\w standard chain would space out, Tokenizer.ts:176-192)
    analyzers: dict = dc_field(default_factory=dict)
    #: keyword fields auto-faceted on every search response when set
    #: (the reference's options.facetFields -> FacetEngine,
    #: SearchEngine.ts:76-101, calculated over the matched doc set at
    #: SearchEngine.ts:629-634)
    facet_fields: tuple = ()

    def __post_init__(self):
        # explicit-mappings validation (FieldType.ts whitelist): a typo'd
        # field type fails at config time, never silently defaults
        from ..analysis.mappings import validate_fields
        validate_fields(self.fields)
        from ..analysis.analyzers import ANALYZERS
        for f, a in (self.analyzers or {}).items():
            if f not in self.fields:
                raise ValueError(f"analyzer override for unmapped field {f!r}")
            if a not in ANALYZERS:
                raise ValueError(
                    f"unknown analyzer {a!r} for field {f!r}; "
                    f"must be one of: {', '.join(sorted(ANALYZERS))}")
        if self.stem_lang not in (None, "auto", "detect"):
            from ..analysis.stemmer import _stemmer_for
            _stemmer_for(self.stem_lang)  # fail fast on unknown language

    def analyzer_for(self, field: str) -> str:
        if field in (self.analyzers or {}):
            return self.analyzers[field]
        return FIELD_TYPE_ANALYZER.get(self.fields[field], "standard")


class InvertedIndex:
    """Handle on the built index tables + broadcastable collection stats."""

    def __init__(self, postings: DataFrame, doc_stats: DataFrame,
                 term_stats: DataFrame, total_docs: int, avg_dl: float,
                 config: IndexConfig):
        self.postings = postings
        self.doc_stats = doc_stats
        self.term_stats = term_stats
        self.total_docs = total_docs
        self.avg_dl = avg_dl
        self.config = config
        # set by delete.load_index_with_deletes when tombstones exist:
        # block-index readers must filter decoded postings against it
        self.tombstones: DataFrame | None = None

    @property
    def text_fields(self) -> list:
        """Fields that participate in ``field:'*'`` fan-out — all text-like
        indexed fields (QueryProcessor.ts:148-160 via MappingsManager)."""
        return [f for f, t in self.config.fields.items()
                if t in ("text", "keyword", "email", "url", "phone")]


def _is_array_field(docs: DataFrame, f: str) -> bool:
    # resolves dotted struct paths too (e.g. meta.tags -> array<string>)
    return docs.select(F.col(f)).schema[0].dataType.typeName() == "array"


def tokenize_to_rows(docs: DataFrame, config: IndexConfig,
                     with_dl: bool = False) -> DataFrame:
    """docs → one row per token occurrence: (doc_id, field, pos, term).

    ALL scalar fields tokenize in ONE source scan: per-field token arrays
    (JVM tokenizer expressions) are packed into (field, toks) structs,
    exploded, then posexploded — not one scan-branch per field unioned.
    Array fields keep their own element-explode branch. Catalyst prunes
    the scan to (id, indexed fields).

    Array<string> fields mirror the reference's per-element indexing
    (SearchEngine.ts:902-919): each element is tokenized with the standard
    analyzer and positions RESTART per element; addToken dedups positions, so
    tf = |unique positions| — replicated downstream via collect_set(pos).

    ``with_dl=True`` (all-scalar configs only — dl counts scalar fields,
    build_doc_stats) also emits ``_dl``: the doc's total token count,
    computed on the materialized token arrays BEFORE the explode — zero
    extra shuffle, zero re-tokenize. Riding dl on every posting row is
    what lets BM25 scoring and the block build skip the postings ⋈
    doc_stats join entirely (at 10^12 docs that join shuffles the
    corpus-sized doc_stats table per query). Ignored when the config has
    array fields (their branches explode before a doc-level sum exists).
    """
    def _needs_lang_col():
        if config.stem_lang == "auto" \
                and config.stem_lang_col not in docs.columns:
            raise ValueError(
                f"stem_lang='auto' needs the {config.stem_lang_col!r} "
                "column on the corpus (IndexConfig.stem_lang_col)")
        return config.stem_lang == "auto"

    all_array_fields = [f for f in config.fields if _is_array_field(docs, f)]
    all_scalar_fields = [f for f in config.fields if f not in all_array_fields]
    with_dl = with_dl and not all_array_fields

    # stem_lang='detect': detection is PER DOCUMENT over the PRE-stopword
    # token stream of all scalar fields concatenated — the reference's
    # per-document autoDetectLanguage (Stemmer.ts), not per (doc, field):
    # a configured stopword list would otherwise remove exactly the
    # detector's marker words first (biasing to 'en'), and short fields
    # (titles) would detect independently of the body. The one case where
    # per-field detection over the materialized _toks IS the same function
    # — a single scalar field with no stopwords — keeps the cheaper path
    # (no second tokenize of the text).
    detect_per_doc = (
        config.stem_lang == "detect" and all_scalar_fields
        and (len(all_scalar_fields) > 1 or bool(config.stopwords)
             or bool(all_array_fields)))
    if detect_per_doc:
        from ..functions.textstats import lang_id_tokens
        det_parts = [tokens_for(F.col(f), config.analyzer_for(f))
                     for f in all_scalar_fields]
        det_expr = lang_id_tokens(
            det_parts[0] if len(det_parts) == 1 else F.concat(*det_parts))
        # exprs valid over `docs` / carried as a named column downstream
        lang_src = [det_expr.alias("_detlang")]
        lang_extra = [F.col("_detlang")]
    elif _needs_lang_col():
        lang_src = [F.col(config.stem_lang_col)]
        lang_extra = [F.col(config.stem_lang_col)]
    else:
        lang_src = []
        lang_extra = []

    def _stem_projection(frame, extra=()):
        """Apply the configured stemming to the MATERIALIZED ``_toks``
        column (one extra Project). Detection ('detect') runs over the
        already-tokenized array (lang_id_tokens) so the analyzer chain is
        never re-evaluated per language. ``extra`` columns (e.g. the
        pre-computed ``_dl``) ride through — stemming is 1:1 per token,
        so counts computed pre-stem stay exact."""
        if not config.stem_lang:
            return frame
        if config.stem_lang == "auto":
            from ..analysis.stemmer import stem_tokens_by_lang
            stemmed = stem_tokens_by_lang(F.col("_toks"),
                                          F.col(config.stem_lang_col))
        elif config.stem_lang == "detect":
            from ..analysis.stemmer import stem_tokens_by_lang
            from ..functions.textstats import lang_id_tokens
            lang_col = (F.col("_detlang") if detect_per_doc
                        else lang_id_tokens(F.col("_toks")))
            stemmed = stem_tokens_by_lang(F.col("_toks"), lang_col)
        else:
            from ..analysis.stemmer import stem_tokens
            stemmed = stem_tokens(F.col("_toks"), config.stem_lang)
        return frame.select("doc_id", "field", stemmed.alias("_toks"),
                            *extra)

    parts = []
    scalar_fields = []
    for f in config.fields:
        if _is_array_field(docs, f):
            exploded = docs.select(F.col(config.id_col).alias("doc_id"),
                                   F.explode(f).alias("_elem"), *lang_src)
            tokenized = exploded.select(
                "doc_id",
                F.lit(f).alias("field"),
                tokens_for(F.col("_elem"), "standard",
                           stopwords=config.stopwords).alias("_toks"),
                *lang_extra)
            parts.append(
                _stem_projection(tokenized).select(
                    "doc_id", "field",
                    F.posexplode("_toks").alias("pos", "term")))
        else:
            scalar_fields.append(f)
    dl_extra = ("_dl",) if with_dl else ()

    def _with_dl_col(frame):
        # dl from the MATERIALIZED array (one extra Project, no
        # re-tokenize); size() is -1 for null arrays (build_doc_stats)
        n = F.size("_toks")
        return frame.withColumn(
            "_dl", F.when(n < 0, 0).otherwise(n).cast("long"))

    if len(scalar_fields) == 1:
        f = scalar_fields[0]
        # materialize the token array in a Project BEFORE the generator:
        # Generate consumes a plain attribute, so the analyzer chain runs
        # once inside whole-stage codegen (with subexpression
        # elimination) instead of inside the generator's input
        tokenized = docs.select(
            F.col(config.id_col).alias("doc_id"),
            F.lit(f).alias("field"),
            tokens_for(F.col(f), config.analyzer_for(f),
                       stopwords=config.stopwords).alias("_toks"),
            *lang_src)
        if with_dl:
            tokenized = _with_dl_col(tokenized)
        parts.append(
            _stem_projection(tokenized, dl_extra).select(
                "doc_id", "field", *dl_extra,
                F.posexplode("_toks").alias("pos", "term")))
    elif scalar_fields:
        # ONE source scan for ALL scalar fields: per-field token arrays are
        # packed into (field, toks) structs and exploded, instead of one
        # scan-branch per field unioned — at 100 TB that is a 1/N_fields
        # input-volume cut for multi-field indexes. Positions are still the
        # per-field posexplode indices, so downstream semantics (tf,
        # positions, dl) are byte-identical to the unioned plan.
        structs = [
            F.struct(
                F.lit(f).alias("field"),
                tokens_for(F.col(f), config.analyzer_for(f),
                           stopwords=config.stopwords).alias("toks"))
            for f in scalar_fields]
        if with_dl:
            # doc-level dl = Σ |toks| over the materialized struct array,
            # computed BEFORE the explode so every per-field row carries
            # the doc total (null field arrays count 0, build_doc_stats)
            fts = docs.select(F.col(config.id_col).alias("doc_id"),
                              F.array(*structs).alias("_fts"),
                              *lang_src)
            fts = fts.withColumn(
                "_dl", F.aggregate(
                    "_fts", F.lit(0).cast("long"),
                    lambda acc, x: acc + F.greatest(
                        F.size(x["toks"]), F.lit(0)).cast("long")))
            ft = fts.select("doc_id", F.explode("_fts").alias("_ft"),
                            "_dl", *lang_extra)
        else:
            ft = docs.select(F.col(config.id_col).alias("doc_id"),
                             F.explode(F.array(*structs)).alias("_ft"),
                             *lang_src)
        tokenized = ft.select("doc_id",
                              F.col("_ft.field").alias("field"),
                              F.col("_ft.toks").alias("_toks"),
                              *dl_extra,
                              *lang_extra)
        parts.append(
            _stem_projection(tokenized, dl_extra).select(
                "doc_id", "field", *dl_extra,
                F.posexplode("_toks").alias("pos", "term")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def build_postings(docs: DataFrame, config: IndexConfig,
                   with_dl: bool = False,
                   pre_bucket: bool = False) -> DataFrame:
    """(field, term, doc_id, tf, positions[, dl]) — the row-expanded posting
    table.

    tf = number of UNIQUE in-field positions (canonical semantics: the
    reference dedups positions in addToken, ShardedInvertedIndex.ts:219-224,
    and termFrequency returns positions.length). Scalar fields emit each
    position exactly once (posexplode indices), so count/collect_list match
    set semantics without the per-group hash-set; array fields RESTART
    positions per element (duplicates possible) and keep the dedup path.

    ``with_dl=True`` (all-scalar configs — tokenize_to_rows) adds ``dl``,
    the owning doc's total token count, to every posting row. It rides as
    a ``first()`` aggregate — NOT a grouping key: dl is constant per
    doc_id (so first() is deterministic), and an interleaved same-JVM A/B
    showed the extra 8-byte grouping key costs ~5-30% of the build while
    the first() variant is indistinguishable from the dl-less baseline.
    The payoff: the persisted postings are self-sufficient for BM25 —
    query scoring and the block build read (tf, dl) off the posting row
    instead of shuffling the corpus-sized doc_stats table per query (the
    block payloads already store exactly (doc_id, tf, dl) per posting,
    postings_codec). Array-field configs silently skip it (positions
    restart per element — no doc-level sum exists pre-explode) and keep
    the join path.

    ``pre_bucket=True`` — the persisted-build strategy — keys the SAME
    aggregation by ``(bucket, field, term, doc_id)`` over token rows
    already ``repartition(B, bucket)``-ed. Because ``bucket`` is a pure
    function of (field, term), every group lives entirely inside one
    bucket partition, and Catalyst recognizes HashPartitioning(bucket)
    as satisfying the aggregation's ClusteredDistribution (partitioning
    expressions ⊆ grouping keys) — so the whole build moves token rows
    across the wire ONCE: the two-exchange plan (groupBy shuffle +
    repartition-by-bucket shuffle) collapses into repartition → in-
    partition hash aggregate → in-partition sort → write. The output is
    row-identical and still one-file-per-bucket (O(buckets) files)."""
    rows = tokenize_to_rows(docs, config, with_dl=with_dl)
    has_dl = "_dl" in rows.columns
    if any(_is_array_field(docs, f) for f in config.fields):
        aggs = [F.size(F.collect_set("pos")).alias("tf")]
        if config.positions:
            aggs.append(F.sort_array(F.collect_set("pos")).alias("positions"))
    else:
        aggs = [F.count(F.lit(1)).cast("int").alias("tf")]
        if config.positions:
            aggs.append(F.sort_array(F.collect_list("pos")).alias("positions"))
    if has_dl:
        aggs.append(F.first("_dl").alias("dl"))
    if pre_bucket:
        return (rows.select("*", _bucket_col(config))
                .repartition(config.n_buckets, "bucket")
                .groupBy("bucket", "field", "term", "doc_id").agg(*aggs))
    return rows.groupBy("field", "term", "doc_id").agg(*aggs)


def build_doc_stats(docs: DataFrame, config: IndexConfig) -> DataFrame:
    """(doc_id, dl): dl = total token count across SCALAR indexed fields —
    the reference's allTokens only accumulates scalar-field tokens
    (SearchEngine.ts:894-898; array elements are indexed but not counted).
    Includes zero-token docs (docLengths is set for every added doc)."""
    dl = F.lit(0)
    for f in config.fields:
        if _is_array_field(docs, f):
            continue
        n = F.size(tokens_for(F.col(f), config.analyzer_for(f),
                              stopwords=config.stopwords))
        n = F.when(n < 0, 0).otherwise(n)  # size() is -1 for null arrays
        dl = dl + n
    return docs.select(F.col(config.id_col).alias("doc_id"),
                       dl.cast("long").alias("dl"))


def derive_doc_stats(docs: DataFrame, postings: DataFrame,
                     config: IndexConfig) -> DataFrame:
    """doc_stats recovered from a (written) postings table: dl = Σ tf over
    scalar indexed fields (== total token count; array-field tokens are
    indexed but not length-counted, SearchEngine.ts:894-898). Right-joined
    with the docs ids so zero-token docs keep dl=0."""
    scalar_fields = [f for f in config.fields if not _is_array_field(docs, f)]
    dl = (postings.where(F.col("field").isin(scalar_fields))
          .groupBy("doc_id").agg(F.sum("tf").alias("dl")))
    ids = docs.select(F.col(config.id_col).alias("doc_id"))
    return (ids.join(dl, "doc_id", "left")
            .select("doc_id", F.coalesce("dl", F.lit(0)).cast("long").alias("dl")))


def build_term_stats(postings: DataFrame) -> DataFrame:
    """(field, term, df). Head-term skew is absorbed by map-side partial
    aggregation (one row per term per map partition reaches the shuffle)."""
    return postings.groupBy("field", "term").agg(
        F.count(F.lit(1)).alias("df"))


def build_index(docs: DataFrame, config: IndexConfig) -> InvertedIndex:
    """Ephemeral (in-session) index build — used by tests and the
    correctness-gate queries at small SF. For persisted, resumable builds
    use :func:`write_index` / :func:`build_index_resumable`."""
    postings = build_postings(docs, config, with_dl=True)
    doc_stats = build_doc_stats(docs, config)
    stats = doc_stats.agg(F.count(F.lit(1)).alias("n"),
                          F.avg("dl").alias("avgdl")).collect()[0]
    term_stats = build_term_stats(postings)
    return InvertedIndex(postings, doc_stats, term_stats,
                         int(stats["n"]), float(stats["avgdl"] or 0.0), config)


def _bucket_col(config: IndexConfig):
    """Term-hash bucket: ``pmod(xxhash64(field:term), B)``.

    xxhash64 is Spark's cheapest codegen'd hash (one call per posting row —
    ~10x cheaper than the md5+conv chain h60 uses), and the pure-Python
    XXH64 twin (functions/hashing.xxh64_str, bit-parity-tested) lets the
    driver and the Spark-free serving process compute a term's bucket with
    NO job and push bucket IN-list predicates into the scan."""
    return F.pmod(F.xxhash64(F.concat_ws(":", F.col("field"), F.col("term"))),
                  F.lit(config.n_buckets)).cast("int").alias("bucket")


def _ds_bucket_col(n_buckets: int):
    """Doc-id-hash bucket for the doc_stats LAYOUT:
    ``pmod(xxhash64(cast(doc_id as string)), B)``.

    Purpose: O(batch) append dedup. ``POST /documents`` must check its ids
    against the existing corpus; an unpartitioned doc_stats makes that a
    full-table read per request (O(corpus) at 10^12 docs). Partitioning by
    id-hash lets the dedup prune to the batch's bucket directories —
    O(corpus × touched_buckets / B) read, where touched_buckets ≤ batch
    size (lsm.existing_ids_pruned; asserted via input_file_name in
    tests/test_incremental_snapshot.py). The id is string-canonicalized
    before hashing so int/long/string id corpora bucket identically and
    the pruning expression can be evaluated on any batch frame."""
    return F.pmod(F.xxhash64(F.col("doc_id").cast("string")),
                  F.lit(n_buckets)).cast("int").alias("ds_bucket")


def write_doc_stats(ds: DataFrame, index_dir: str, n_buckets: int,
                    observe=None) -> None:
    """Canonical doc_stats writer: (doc_id, dl) partitioned by the id-hash
    ``ds_bucket`` and doc_id-sorted within files (row-group min/max stats
    then prune point-id lookups within a bucket). One small shuffle —
    doc_stats is two columns per doc, ~1/1000th of the postings volume.
    Shared by the batch build, the resumable merge, the streaming finalize,
    and delete compaction so every path preserves the pruned layout."""
    out = (ds.select(F.col("doc_id"), F.col("dl"),
                     _ds_bucket_col(n_buckets))
           .repartition(n_buckets, "ds_bucket")
           .sortWithinPartitions("doc_id"))
    if observe is not None:
        out = out.observe(*observe)
    (out.write.mode("overwrite").partitionBy("ds_bucket")
     .parquet(os.path.join(index_dir, DOC_STATS)))


def assign_doc_ids(docs: DataFrame, key_col: str = "url",
                   deterministic: bool = False) -> DataFrame:
    """Add a dense-ish surrogate ``doc_id`` to a natural-key corpus.

    Doc-aligned posting blocks and delta compression need doc ids that are
    dense runs, not sparse hashes (a hash id makes every posting its own
    block). Two modes:

    - default: ``monotonically_increasing_id`` — no shuffle at any scale;
      ids are (partition << 33) + offset, i.e. dense WITHIN each input
      partition, which is exactly what doc-aligned blocks need. Ids depend
      on input partitioning, so rank tie-breaks are only stable for a fixed
      input layout.
    - ``deterministic=True``: global row_number ordered by ``key_col`` —
      fully reproducible ids at the cost of one global sort; use when
      rank-identity across runs/layouts matters more than build time.
    """
    from pyspark.sql import Window
    if deterministic:
        w = Window.orderBy(key_col)
        return docs.withColumn(
            "doc_id", (F.row_number().over(w) - 1).cast("long"))
    return docs.withColumn("doc_id", F.monotonically_increasing_id())


def bucket_of(field: str, term: str, n_buckets: int) -> int:
    """Pure-Python twin of :func:`_bucket_col` (pmod of signed xxhash64)."""
    from ..functions.hashing import xxh64_str
    return xxh64_str(f"{field}:{term}") % n_buckets


# ---------------------------------------------------------------------------
# Persisted layout (Iceberg-shaped over plain parquet: no Iceberg jars ship in
# this sandbox, so snapshot atomicity is approximated by staging dirs + a
# manifest; on a real cluster swap the writes for Iceberg `writeTo(...)` with
# bucket(term) partitioning and the manifest for snapshot summary metadata).
# ---------------------------------------------------------------------------

def write_index(docs: DataFrame, index_dir: str, config: IndexConfig) -> dict:
    """Single-shot persisted build. Returns build metrics.

    Layout: postings sorted (bucket, field, term, doc_id) within each
    task and written ``partitionBy(bucket)`` — ~one term-sorted file per
    bucket. Plan (round 5): token rows ``repartition(B, bucket)`` →
    in-partition hash aggregate keyed (bucket, field, term, doc_id) →
    in-partition sort → write. ONE exchange total: bucket is a function
    of (field, term), so hash-partitioning by bucket already co-locates
    every aggregation group and Catalyst plans no second shuffle
    (build_postings pre_bucket; plan shape pinned by
    tests/test_single_shuffle_build.py). Two rejected alternatives, both
    A/B-measured: (a) the round-2 local-sort + dynamic-writer variant —
    every reduce task spills files into every bucket dir (tasks × buckets
    files, 1,504 vs 32 at 100k docs, a metadata catastrophe at 10^12
    docs); (b) the round-1..4 two-exchange plan (groupBy shuffle, then
    repartition-by-bucket shuffle) — moves the aggregated postings over
    the wire twice (kept toggleable: SE_BUILD_TWO_SHUFFLE=1). Sizing
    note: aggregation parallelism equals B under this plan, so keep
    ``n_buckets`` ≥ the executor core count (at cluster scale B is
    hundreds+ for pruning reasons anyway; the bench's 32/32 is the floor).

    The corpus is tokenized exactly ONCE; doc_stats and term_stats are
    derived from the written postings table (column-pruned scans), and
    the collection stats ride those writes via observe().
    """
    from pyspark.sql import Observation
    spark = docs.sparkSession
    t0 = time.time()
    if os.environ.get("SE_BUILD_TWO_SHUFFLE") == "1":
        # legacy two-exchange plan, kept toggleable for interleaved A/Bs
        postings = build_postings(docs, config,
                                  with_dl=True).select("*",
                                                       _bucket_col(config))
        postings = postings.repartition(config.n_buckets, "bucket")
    else:
        postings = build_postings(docs, config, with_dl=True,
                                  pre_bucket=True)
    (postings
     .sortWithinPartitions("bucket", "field", "term", "doc_id")
     .write.mode("overwrite").partitionBy("bucket")
     .parquet(os.path.join(index_dir, POSTINGS)))

    # collection stats ride the stats-table WRITE jobs via observe() —
    # no separate re-read/aggregate jobs afterwards
    postings_r = spark.read.parquet(os.path.join(index_dir, POSTINGS))
    obs_ds = Observation("doc_stats")
    write_doc_stats(
        derive_doc_stats(docs, postings_r, config), index_dir,
        config.n_buckets,
        observe=(obs_ds, F.count(F.lit(1)).alias("n"),
                 F.avg("dl").alias("avgdl"), F.sum("dl").alias("dlsum")))
    stats = obs_ds.get

    obs_ts = Observation("term_stats")
    # dictionary files are written (field, term)-sorted WITHIN each
    # partition: every row group's term min/max then spans a tight
    # lexicographic slice, so prefix/wildcard dictionary scans
    # (StringStartsWith pushdown) skip most row groups instead of reading
    # the whole vocab — at web-scale vocabularies (~1e9 terms) that is
    # the difference between a point-ish read and a full table scan
    (build_term_stats(postings_r)
     .sortWithinPartitions("field", "term")
     .observe(obs_ts, F.sum("df").alias("npost"))
     .write.mode("overwrite").parquet(os.path.join(index_dir, TERM_STATS)))
    n_postings = int(obs_ts.get["npost"] or 0)
    elapsed = time.time() - t0
    meta = {
        "total_docs": int(stats["n"]),
        "avg_dl": float(stats["avgdl"] or 0.0),
        # exact long Σdl: lets lsm.append_docs update avg_dl additively
        # with NO drift vs a recompute (avg() == dl_sum/n for long dl)
        "dl_sum": int(stats["dlsum"] or 0),
        "n_postings": n_postings,
        "id_col": config.id_col,
        "fields": config.fields,
        "n_buckets": config.n_buckets,
        "positions": config.positions,
        "stem_lang": config.stem_lang,
        "stem_lang_col": config.stem_lang_col,
        "analyzers": config.analyzers,
        "facet_fields": list(config.facet_fields or []),
        "bucket_fn": BUCKET_FN,
        "ds_buckets": config.n_buckets,
        "build_seconds": elapsed,
        "docs_per_sec": int(stats["n"]) / elapsed if elapsed else None,
        "postings_per_sec": n_postings / elapsed if elapsed else None,
    }
    write_meta(index_dir, meta)
    return meta


def load_index(spark: SparkSession, index_dir: str) -> InvertedIndex:
    """Open a persisted index — the LSM read path: when committed,
    uncompacted append/stream RUNS exist (operators/lsm.append_docs,
    streaming ingest), queries are served over **base ∪ runs** without any
    merge job; compaction folds them in bucket-wise later. Collection
    stats come from meta, which the append path keeps additively exact."""
    with open(os.path.join(index_dir, META)) as fh:
        meta = json.load(fh)
    check_bucket_fn(meta, f"load_index({index_dir})")
    if not os.path.isdir(os.path.join(index_dir, POSTINGS)) or \
            not os.path.isdir(os.path.join(index_dir, DOC_STATS)) or \
            not os.path.isdir(os.path.join(index_dir, TERM_STATS)):
        # a compaction crashed mid table-swap: the staged/compact
        # dirs carry the committed state — finish the swap before reading
        from .delete import recover_interrupted_compaction
        recover_interrupted_compaction(index_dir)
    config = IndexConfig(id_col=meta["id_col"], fields=meta["fields"],
                         n_buckets=meta["n_buckets"],
                         positions=meta["positions"],
                         stem_lang=meta.get("stem_lang"),
                         stem_lang_col=meta.get("stem_lang_col", "lang"),
                         analyzers=meta.get("analyzers") or {})

    def _read(sub):
        p = os.path.join(index_dir, sub)
        return spark.read.parquet(p) if os.path.isdir(p) else None

    postings = _read(POSTINGS)
    doc_stats = _read(DOC_STATS)
    if doc_stats is not None:
        # the ds_bucket partition column is a dedup-pruning layout detail
        # (write_doc_stats) — consumers see the canonical (doc_id, dl)
        doc_stats = doc_stats.select("doc_id", "dl")
    term_stats = _read(TERM_STATS)
    from .lsm import accounted_runs, union_with_runs
    # ONE manifest scan feeds both the union and the lineage stamp — a run
    # committing concurrently is simply not unioned and not claimed
    acc = accounted_runs(index_dir)
    live = [e for e in acc if e.get("status") == "committed"]
    postings, doc_stats, term_stats = union_with_runs(
        spark, index_dir, config, postings, doc_stats, term_stats,
        runs=live)
    if postings is None:
        raise FileNotFoundError(
            f"no postings (base or committed runs) under {index_dir}")
    idx = InvertedIndex(postings, doc_stats, term_stats,
                        meta["total_docs"], meta["avg_dl"], config)
    # lineage for block snapshots: every run whose docs this handle can
    # see (unioned live + compacted-into-base) — write_blocks records it
    # so serving readers can detect staleness
    idx.includes_runs = sorted(e["run_path"] for e in acc)
    return idx


# ---------------------------------------------------------------------------
# Resumable chunked build: construction (per doc-chunk posting runs, each
# committed with a manifest entry carrying lineage + metrics) then merge
# (runs → term-bucket-partitioned global index). Chunks are disjoint in
# doc_id, so the merge is a pure repartition-by-term — the classic external
# posting-list merge, resumable at chunk grain (north_rule).
# ---------------------------------------------------------------------------

def _manifest_path(index_dir: str, chunk: int) -> str:
    return os.path.join(index_dir, MANIFEST, f"chunk-{chunk:05d}.json")


def completed_chunks(index_dir: str) -> set:
    mdir = os.path.join(index_dir, MANIFEST)
    if not os.path.isdir(mdir):
        return set()
    done = set()
    for name in os.listdir(mdir):
        if name.startswith("chunk-") and name.endswith(".json"):
            with open(os.path.join(mdir, name)) as fh:
                entry = json.load(fh)
            if entry.get("status") == "committed":
                done.add(entry["chunk"])
    return done


def build_index_resumable(docs: DataFrame, index_dir: str, config: IndexConfig,
                          n_chunks: int = 8, fail_after_chunk: int | None = None) -> dict:
    """Chunked, checkpoint-resumable persisted build.

    Phase 1 (construction): docs are split into ``n_chunks`` by doc-id hash;
    each chunk's postings run is written to ``runs/chunk=i`` and committed
    with a manifest entry (lineage: chunk predicate, row counts, timings).
    Already-committed chunks are skipped on resume.

    Phase 2 (merge): all runs are shuffle-merged into the final
    term-bucket-partitioned postings table + stats, then meta is written.

    ``fail_after_chunk`` injects a crash for the kill/resume tests.
    """
    spark = docs.sparkSession
    os.makedirs(os.path.join(index_dir, MANIFEST), exist_ok=True)
    done = completed_chunks(index_dir)
    t0 = time.time()
    chunk_hash = F.pmod(F.xxhash64(F.col(config.id_col).cast("string")),
                        F.lit(n_chunks)).cast("int")

    for i in range(n_chunks):
        if i in done:
            continue
        tc = time.time()
        chunk_docs = docs.where(chunk_hash == i)
        run_path = os.path.join(index_dir, RUNS, f"chunk={i}")
        postings = build_postings(chunk_docs, config, with_dl=True)
        postings.write.mode("overwrite").parquet(run_path)
        ds = build_doc_stats(chunk_docs, config)
        ds.write.mode("overwrite").parquet(
            os.path.join(index_dir, RUNS, f"doc_stats_chunk={i}"))
        n_docs = ds.count()
        entry = {
            "chunk": i, "status": "committed", "n_docs": n_docs,
            "predicate": f"xxhash64(cast({config.id_col} as string)) % {n_chunks} == {i}",
            "run_path": run_path, "seconds": time.time() - tc,
            "docs_per_sec": n_docs / max(time.time() - tc, 1e-9),
        }
        with open(_manifest_path(index_dir, i), "w") as fh:
            json.dump(entry, fh, indent=1)
        if fail_after_chunk is not None and i >= fail_after_chunk:
            raise RuntimeError(f"injected failure after chunk {i}")

    # Phase 2: merge runs -> global term-partitioned index.
    runs = spark.read.option("basePath", os.path.join(index_dir, RUNS)).parquet(
        *[os.path.join(index_dir, RUNS, f"chunk={i}") for i in range(n_chunks)])
    runs = runs.drop("chunk").withColumn("bucket", _bucket_col(config))
    (runs.repartition(config.n_buckets, "bucket")
     .sortWithinPartitions("field", "term", "doc_id")
     .write.mode("overwrite").partitionBy("bucket")
     .parquet(os.path.join(index_dir, POSTINGS)))

    all_ds = spark.read.parquet(
        *[os.path.join(index_dir, RUNS, f"doc_stats_chunk={i}") for i in range(n_chunks)])
    write_doc_stats(all_ds, index_dir, config.n_buckets)

    postings_r = spark.read.parquet(os.path.join(index_dir, POSTINGS))
    build_term_stats(postings_r).sortWithinPartitions(
        "field", "term").write.mode("overwrite").parquet(
        os.path.join(index_dir, TERM_STATS))

    ds = spark.read.parquet(os.path.join(index_dir, DOC_STATS))
    stats = ds.agg(F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl"),
                   F.sum("dl").alias("dlsum")).collect()[0]
    meta = {
        "total_docs": int(stats["n"]),
        "avg_dl": float(stats["avgdl"] or 0.0),
        "dl_sum": int(stats["dlsum"] or 0),
        "n_postings": postings_r.count(),
        "id_col": config.id_col, "fields": config.fields,
        "n_buckets": config.n_buckets, "positions": config.positions,
        "stem_lang": config.stem_lang,
        "stem_lang_col": config.stem_lang_col,
        "analyzers": config.analyzers,
        "facet_fields": list(config.facet_fields or []),
        "bucket_fn": BUCKET_FN,
        "ds_buckets": config.n_buckets,
        "n_chunks": n_chunks, "build_seconds": time.time() - t0,
    }
    write_meta(index_dir, meta)
    return meta
