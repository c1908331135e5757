"""Query-DSL → DataFrame plan compiler.

Implements the reference's OpenSearch-style DSL (QueryProcessor.ts:74-111
dispatch): match_all / term / match / bool(filter, must, should,
minimum_should_match, must_not) / range / prefix / wildcard / fuzzy /
geo_distance / phrase / match_phrase / nested, plus bare-string queries and
the phone-segmentation rewrite — compiled to declarative DataFrame plans so
Catalyst handles pushdown, pruning, and join strategy.

Canonical semantics (SURVEY.md §2.8 — the unit-tested component semantics,
not the reference's wiring bugs):

- ``term``: exact lookup of the LOWERCASED raw value in the field's token
  dictionary (QueryProcessor._normalize = toLowerCase, :663-666).
- ``match``: value analyzed with the field's index analyzer; multi-token
  values AND their tokens (the reference's string-query path,
  QueryParser.ts:23-43; its object-match path skips analysis — a wiring
  quirk we canonicalize away).
- ``fuzzy``: Levenshtein over the field dictionary, default fuzziness 2
  (observable default, SURVEY §2.3 Q6).
- ``wildcard``: glob with regex metachars ESCAPED and value lowercased
  (canonical per SURVEY Q5; the index path forgot both).
- ``phrase``: candidates = docs containing all phrase tokens in the field;
  accept iff the reference's greedy proximity loop
  (QueryProcessor.ts:579-661) accepts — reformulated over posting POSITIONS
  instead of re-tokenizing documents (same result, no doc-store scan).
- ``bool``: filter→must→should→must_not evaluation order
  (QueryProcessor.ts:239-296) including the empty-should edge case and
  "should replaces empty mandatory results" behavior;
  minimum_should_match generalized to count>=m (reference only does m=1).
- scoring: BM25 (k1=1.2, b=0.75) summed over the MATCHED dictionary terms of
  scoring-context leaves (must/should/top-level; filter and must_not do not
  score), tf = unique in-field positions, df per (field, term); tie-break
  score desc then doc_id asc (SURVEY §2.5 S3).

Scale design: every leaf resolves its matched dictionary terms against
``term_stats`` (the small vocab table), collects them driver-side when few
(the common case), and pushes them into the postings scan as IN-list
predicates — so a term lookup over a 100 TB index reads only the bucket
partitions and row groups containing those terms (sorted-term zone maps).
Expansions too large to collect fall back to a broadcast semi-join.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from .. import B, K1
from ..analysis import analyzers as pyan
from ..functions.bm25 import bm25_score
from ..operators.index_build import InvertedIndex

# Above this many expanded terms, skip driver-side collect and use a join.
COLLECT_TERMS_LIMIT = 20_000


@dataclass
class _Node:
    """Compiled clause: candidate doc set + scoring terms [(field, term)]."""

    cand: DataFrame          # single column: doc_id
    score_terms: list        # [(field, term)] matched dictionary terms
    score_terms_df: DataFrame | None = None  # fallback when too many to collect
    # candidate set == union of docs holding >=1 score term: lets _score skip
    # the membership join (single-leaf term/match fast path)
    cand_is_scored_union: bool = False


class SparkSearchEngine:
    """Search over a built :class:`InvertedIndex` + its source docs table."""

    def __init__(self, index: InvertedIndex, docs: DataFrame,
                 k1: float = K1, b: float = B, synonyms: dict | None = None,
                 field_boosts: dict | None = None):
        self.index = index
        self.docs = docs
        self.spark = docs.sparkSession
        self.id_col = index.config.id_col
        self.k1, self.b = k1, b
        self.synonyms = synonyms or {}
        # per-field score multipliers (BM25Scorer.ts:109-114 fieldBoosts)
        self.field_boosts = field_boosts or {}
        self._all_docs = index.doc_stats.select("doc_id")

    def _boost_col(self):
        if not self.field_boosts:
            return 1.0
        out = F.lit(1.0)
        for f, b in self.field_boosts.items():
            out = F.when(F.col("field") == f, F.lit(float(b))).otherwise(out)
        return out

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def search(self, query, size: int = 10, from_: int = 0) -> DataFrame:
        """Top-k: (doc_id, score) ordered by score desc, doc_id asc."""
        scored = self.search_scored(query)
        out = (scored.orderBy(F.desc("score"), F.asc("doc_id"))
               .offset(from_).limit(size))
        return out

    def search_scored(self, query) -> DataFrame:
        """All matching docs with scores, unpaginated: (doc_id, score)."""
        node = self._compile(self._rewrite(query), scoring=True)
        return self._score(node)

    def search_hits(self, query, size: int = 10, from_: int = 0) -> DataFrame:
        """Reference-shaped hits: the full source document enriched with its
        score (SearchEngine.ts:617-626 hit enrichment), ranked. The top-k is
        resolved FIRST (k rows), then a broadcast join fetches the documents
        — never a scan-join of the whole corpus."""
        top = self.search(query, size=size, from_=from_)
        return (self.docs.join(
                    F.broadcast(top),
                    self.docs[self.id_col] == top["doc_id"])
                .drop(top["doc_id"])
                .orderBy(F.desc("score"), F.asc(self.id_col)))

    def candidates(self, query) -> DataFrame:
        """Unscored membership semantics: DataFrame[doc_id]."""
        return self._compile(self._rewrite(query), scoring=False).cand

    def suggest(self, field: str, prefix: str, size: int = 10) -> DataFrame:
        """Autocomplete completions: dictionary terms with the prefix,
        ranked by document frequency (df desc, term asc) — the README's
        'prefix matching for autocomplete' as a first-class helper. A pure
        term_stats scan: no postings touched."""
        norm = str(prefix).lower()
        return (self._dictionary(self._fields_for(field))
                .where(F.col("term").startswith(norm))
                .select("term", "df")
                .orderBy(F.desc("df"), F.asc("term"))
                .limit(size))

    # ------------------------------------------------------------------
    # scoring
    # ------------------------------------------------------------------

    def _score(self, node: _Node) -> DataFrame:
        terms_df = None
        if node.score_terms:
            pairs = sorted(set(node.score_terms))
            terms_df = self.spark.createDataFrame(pairs, "field string, term string")
        if node.score_terms_df is not None:
            extra = node.score_terms_df.select("field", "term")
            terms_df = extra if terms_df is None else terms_df.unionByName(extra).distinct()
        if terms_df is None:
            return node.cand.withColumn("score", F.lit(0.0))

        # with an over-limit expansion frame present, the union terms_df is
        # authoritative — the literal IN-list alone would drop the
        # expansion's pairs from scoring (both lookups take the join path)
        lit = (node.score_terms or None) \
            if node.score_terms_df is None else None
        postings = self._postings_for(lit, terms_df)
        # term_stats is filtered to the QUERY's pairs before the broadcast:
        # broadcasting the whole dictionary works at sandbox scale but a
        # web-scale vocabulary (~1e9 terms) would OOM the driver — the
        # IN-list predicate also row-group-skips the (field, term)-sorted
        # term_stats files, so the lookup reads ~one row group
        scored_rows = postings.join(
            F.broadcast(self._term_stats_for(lit, terms_df)),
            ["field", "term"])
        if "dl" not in postings.columns:
            # pre-inline-dl postings layout: fetch dl the expensive way.
            # Post-round-4 indexes ride dl on every posting row
            # (build_postings with_dl), so scoring is join-free below —
            # at 10^12 docs this join would shuffle the corpus-sized
            # doc_stats table per query.
            scored_rows = scored_rows.join(self.index.doc_stats, "doc_id")
        scored_rows = scored_rows.withColumn("s", bm25_score(
            F.col("tf"), F.col("df"), F.col("dl"),
            self.index.total_docs, self.index.avg_dl, self.k1, self.b,
            boost=self._boost_col()))
        if (node.score_terms and len(set(node.score_terms)) == 1
                and node.score_terms_df is None):
            # single (field, term): exactly one posting row per doc — the
            # per-doc sum aggregate (and its shuffle) is a no-op; 0.0 + s
            # is bitwise s, so scores match the general path exactly
            per_doc = scored_rows.select("doc_id", F.col("s").alias("score"))
            if node.cand_is_scored_union:
                return per_doc
            return (node.cand.join(per_doc, "doc_id", "left")
                    .select("doc_id",
                            F.coalesce("score", F.lit(0.0)).alias("score")))
        # Deterministic float summation: sort each doc's per-term scores by
        # (field, term) before folding, so 8-core and 32-core runs (and the
        # oracle) agree bitwise — shuffle order must not leak into scores.
        per_doc = scored_rows.groupBy("doc_id").agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("field", "term", "s"))),
                F.lit(0.0),
                lambda acc, x: acc + x["s"],
            ).alias("score"))
        if node.cand_is_scored_union:
            # candidate set == scored-doc union: skip the membership join
            return per_doc.select("doc_id", "score")
        return (node.cand.join(per_doc, "doc_id", "left")
                .select("doc_id", F.coalesce("score", F.lit(0.0)).alias("score")))

    # ------------------------------------------------------------------
    # postings access with pushdown
    # ------------------------------------------------------------------

    def _postings_for(self, literal_terms, terms_df: DataFrame | None = None) -> DataFrame:
        """Postings rows for a set of (field, term) pairs.

        Literal pairs become IN-list predicates pushed into the parquet scan
        (bucket partition pruning + sorted-term row-group skipping). A
        non-literal expansion joins against the (small) matched-terms frame.
        """
        p = self.index.postings
        if literal_terms is not None and len(literal_terms) <= COLLECT_TERMS_LIMIT:
            pred = self._pairs_pred(literal_terms)
            if "bucket" in p.columns and self.index.config is not None:
                # partition pruning: bucket IN-list computed driver-side in
                # pure Python (portable h60 hash) — no Spark job needed
                from ..operators.index_build import bucket_of
                nb = self.index.config.n_buckets
                buckets = sorted({bucket_of(f, t, nb) for f, t in literal_terms})
                pred = pred & F.col("bucket").isin(buckets)
            return p.where(pred)
        assert terms_df is not None
        return p.join(F.broadcast(terms_df.select("field", "term")),
                      ["field", "term"])

    @staticmethod
    def _pairs_pred(literal_terms):
        """Per-field term IN-list predicate for a set of (field, term)
        pairs — pushed into parquet scans (row-group min/max skipping on
        the sorted ``term`` column)."""
        by_field: dict[str, list] = {}
        for f, t in literal_terms:
            by_field.setdefault(f, []).append(t)
        pred = None
        for f, toks in by_field.items():
            c = (F.col("field") == f) & F.col("term").isin(toks)
            pred = c if pred is None else (pred | c)
        return pred

    def _term_stats_for(self, literal_terms,
                        terms_df: DataFrame | None = None) -> DataFrame:
        """term_stats rows (df counts) for a set of (field, term) pairs —
        the same pushdown shapes as :meth:`_postings_for`, so the frame
        handed to ``F.broadcast`` in :meth:`_score` is query-sized, never
        vocabulary-sized."""
        ts = self.index.term_stats
        if literal_terms is not None \
                and len(literal_terms) <= COLLECT_TERMS_LIMIT:
            return ts.where(self._pairs_pred(literal_terms))
        assert terms_df is not None
        return ts.join(F.broadcast(terms_df.select("field", "term")),
                       ["field", "term"])

    # ------------------------------------------------------------------
    # query rewrites (front end)
    # ------------------------------------------------------------------

    def _rewrite(self, query):
        """Bare strings → DSL (QueryParser.ts:23-43 + phone rewrite
        QueryEngine.ts:1144-1165)."""
        if isinstance(query, str):
            s = query.strip()
            if not s:
                return {"match_all": {}}
            if re.fullmatch(r"[\d\s().+-]{7,}", s) and sum(c.isdigit() for c in s) >= 10:
                toks = pyan.phone(s)
                return {"bool": {"should": [
                    {"term": {"field": "*", "value": t}} for t in toks]}}
            words = s.split()
            if len(words) == 1:
                return {"match": {"field": "*", "value": words[0]}}
            return {"bool": {"must": [
                {"match": {"field": "*", "value": w}} for w in words]}}
        return query

    # ------------------------------------------------------------------
    # compiler
    # ------------------------------------------------------------------

    def _compile(self, q: dict, scoring: bool) -> _Node:
        if not q:
            return self._empty()
        if "match_all" in q:
            return _Node(self._all_docs, [])
        if "term" in q:
            f, v, fz = self._leaf_args(q["term"])
            return self._single_term(f, str(v).lower(), fz, scoring)
        if "match" in q:
            return self._match(q["match"], scoring)
        if "bool" in q:
            return self._bool(q["bool"], scoring)
        if "range" in q:
            return self._range(q["range"])
        if "prefix" in q:
            return self._expand(q["prefix"], "prefix", scoring)
        if "wildcard" in q:
            return self._expand(q["wildcard"], "wildcard", scoring)
        if "fuzzy" in q:
            f, v, fz = self._leaf_args(q["fuzzy"])
            fz = 2 if fz is None or fz == 0 else fz  # canonical default 2
            return self._single_term(f, str(v).lower(), fz, scoring)
        if "geo_distance" in q:
            return self._geo(q["geo_distance"])
        if "phrase" in q or "match_phrase" in q:
            return self._phrase(q.get("match_phrase") or q.get("phrase"), scoring)
        if "nested" in q:
            return self._nested(q["nested"], scoring)
        if "exists" in q:
            # emitted by the reference's query builder (SearchQuery.ts:306-311,
            # missing-field = must_not exists) though its processor never
            # dispatches it; semantics: field present and non-null
            f = q["exists"].get("field")
            if not f or not _schema_has_path(self.docs.schema, str(f)):
                # nonexistent field (incl. dotted paths resolved against the
                # schema) = no match, the reference's builder semantics —
                # never an AnalysisException at query time
                return self._empty()
            cand = self._live(self.docs.where(F.col(f).isNotNull())
                              .select(F.col(self.id_col).alias("doc_id")))
            return _Node(cand, [])
        return self._empty()

    def _empty(self) -> _Node:
        return _Node(self._all_docs.where(F.lit(False)), [])

    def _live(self, cand: DataFrame) -> DataFrame:
        """Docs-table candidates minus tombstones. Postings-resident
        operators inherit delete filtering from the merge-on-read index
        view (load_index_with_deletes), but range/geo/exists scan the RAW
        docs table — without this anti-join a deleted doc would keep
        matching pure docs-table queries (the reference physically removes
        docs, SearchEngine.ts:270-287). Broadcast (tombstones are bounded
        small); no-op when the index has no delete state.

        Two masks: ``dead_ids`` — tombstoned ids with NO surviving
        generation (an UPSERTED doc carries a tombstone but its newer run
        generation out-survives the barrier, so it is alive; raw
        ``tombstones`` would wrongly hide it) — and ``docs_tombstones``
        (physically purged ids whose rows survive in the immutable
        registered docs table — without this second anti-join,
        compact_deletes would RESURRECT deleted docs in range/geo/exists
        results). ``tombstones`` is the legacy fallback for handles built
        before the barrier layout (every tombstoned id was dead then)."""
        dead = getattr(self.index, "dead_ids", None)
        masks = [dead] if dead is not None else \
            [getattr(self.index, "tombstones", None)]
        masks.append(getattr(self.index, "docs_tombstones", None))
        for t in masks:
            if t is not None:
                cand = cand.join(
                    F.broadcast(t.select("doc_id").distinct()),
                    "doc_id", "anti")
        return cand

    @staticmethod
    def _leaf_args(body: dict):
        """Extract (field, value, fuzziness) from both DSL shapes:
        {field, value, fuzziness?} and {<field>: <value>|{query, fuzziness}}
        (QueryProcessor.ts:123-144, 209-237)."""
        if "field" in body and "value" in body:
            return body["field"], body["value"], body.get("fuzziness", 0)
        fuz = body.get("fuzziness", 0)
        for k, v in body.items():
            if k in ("fuzziness", "boost"):
                continue
            if isinstance(v, dict) and "query" in v:
                return k, v["query"], v.get("fuzziness", fuz)
            return k, v, fuz
        return None, None, 0

    # -- leaves ---------------------------------------------------------

    def _fields_for(self, field: str) -> list:
        return self.index.text_fields if field == "*" else [field]

    def _stem_query_tokens(self, tokens: list) -> list:
        """Index/query analyzer SYMMETRY for stemmed indexes: when the index
        was built with ``stem_lang``, query tokens must go through the same
        stemmer or surface forms ('tables', 'running') silently miss their
        indexed stems — Elasticsearch-style semantics and this engine's own
        standard-analyzer symmetry. Concrete codes stem directly; for
        ``auto``/``detect`` the query LANGUAGE is detected from the query
        tokens themselves (functions/textstats.lang_id_py — script ranges
        first, then Latin markers; short marker-free queries route to the
        English porter, the reference's unknown-code fallback,
        SnowballStemmer.ts:27-31)."""
        cfg = self.index.config
        sl = getattr(cfg, "stem_lang", None) if cfg is not None else None
        if not sl or not tokens:
            return tokens
        from ..analysis.stemmer import stem_word_routed
        if sl in ("auto", "detect"):
            from ..functions.textstats import lang_id_py
            lang = lang_id_py(tokens)
        else:
            lang = sl
        return [stem_word_routed(t, lang) for t in tokens]

    def _dictionary(self, fields: list) -> DataFrame:
        ts = self.index.term_stats
        return ts.where(F.col("field").isin(fields))

    def _single_term(self, field: str, norm_value: str, fuzziness: int,
                     scoring: bool, pre_stemmed: bool = False,
                     surface: str | None = None) -> _Node:
        """term/match/fuzzy core (QueryProcessor._processSingleTerm:146-207):
        exact or Levenshtein dictionary match + synonym expansion, then
        postings lookup.

        Exact lookups (fuzziness 0) skip the dictionary entirely: the
        (field, term) pairs are literals, so the postings IN-list + bucket
        predicate is built driver-side with NO Spark job — a nonexistent
        term just scans to empty. Only expansion queries (fuzzy/prefix/
        wildcard) pay the dictionary round-trip."""
        fields = self._fields_for(field)
        if fuzziness == 0:
            # S6 synonym hook: accepts a dict or a synonyms.SynonymEngine;
            # single-token synonyms extend the exact-term IN-list, multi-word
            # synonyms are analyzed and expanded as AND-of-tokens candidates.
            # Synonyms are looked up by the SURFACE form (callers that
            # pre-stem — _match — pass it via ``surface``), then every
            # final token (value + expansions) is stemmed for stemmed
            # indexes.
            values = [norm_value]
            multi: list = []
            for syn in self.synonyms.get(surface or norm_value, ()):
                toks = pyan.standard(str(syn).lower())
                if len(toks) > 1:
                    multi.append(self._stem_query_tokens(toks))
                else:
                    values.append(toks[0] if toks else str(syn).lower())
            if pre_stemmed:  # _match already stemmed the value itself
                if len(values) > 1:
                    values = [values[0]] + self._stem_query_tokens(values[1:])
            else:
                values = self._stem_query_tokens(values)
            pairs = [(f, v) for f in fields for v in values]
            cand = self._postings_for(pairs).select("doc_id")
            if len(pairs) > 1:
                cand = cand.distinct()
            if multi:
                all_pairs = list(pairs)
                for toks in multi:
                    mc = None
                    for t in toks:
                        tc = self._postings_for(
                            [(f, t) for f in fields]).select("doc_id")
                        if len(fields) > 1:
                            tc = tc.distinct()
                        mc = tc if mc is None else mc.join(tc, "doc_id", "semi")
                    cand = cand.unionByName(mc).distinct()
                    all_pairs += [(f, t) for f in fields for t in toks]
                # candidate set is NOT the scored-doc union here (multi-word
                # members hold ALL their tokens; the union is broader)
                return _Node(cand, all_pairs if scoring else [])
            return _Node(cand, pairs if scoring else [],
                         cand_is_scored_union=scoring)
        # fuzzy expansion runs against the (possibly stemmed) dictionary, so
        # the query value is stemmed first for symmetry with exact lookups
        if not pre_stemmed:
            norm_value = self._stem_query_tokens([norm_value])[0]
        matched = self._fuzzy_dictionary(fields, norm_value, fuzziness)
        return self._terms_to_node(matched, scoring)

    def _fuzzy_dictionary(self, fields: list, norm_value: str,
                          fuzziness: int) -> DataFrame:
        """Dictionary terms within edit distance ``fuzziness`` of the value.

        Pruned in two cheap stages before the O(len²) edit-distance runs:
        a token-length band (|len(term) − len(q)| ≤ fuzziness — a necessary
        condition for the distance) and the thresholded ``levenshtein`` that
        abandons a row as soon as the running distance exceeds the bound.
        On a web-scale vocabulary this cuts the candidate set by ~an order
        of magnitude before any full distance is computed (SURVEY §2.3 Q6).
        """
        qlen = len(norm_value)
        band = F.length(F.col("term")).between(qlen - fuzziness,
                                               qlen + fuzziness)
        # thresholded levenshtein returns -1 when the distance exceeds the
        # threshold — accept only [0, fuzziness]
        dist = F.levenshtein(F.col("term"), F.lit(norm_value), fuzziness)
        return (self._dictionary(fields)
                .where(band & dist.between(0, fuzziness)))

    def _terms_to_node(self, matched: DataFrame, scoring: bool) -> _Node:
        pairs_rows = matched.select("field", "term").limit(
            COLLECT_TERMS_LIMIT + 1).collect()
        if len(pairs_rows) <= COLLECT_TERMS_LIMIT:
            pairs = [(r["field"], r["term"]) for r in pairs_rows]
            if not pairs:
                return self._empty()
            cand = self._postings_for(pairs).select("doc_id")
            if len(pairs) > 1:  # single (field, term): doc_ids already unique
                cand = cand.distinct()
            return _Node(cand, pairs if scoring else [],
                         cand_is_scored_union=scoring)
        cand = self._postings_for(None, matched).select("doc_id").distinct()
        return _Node(cand, [], matched if scoring else None,
                     cand_is_scored_union=scoring)

    def _match(self, body: dict, scoring: bool) -> _Node:
        field, value, fz = self._leaf_args(body)
        if field is None or value is None:
            return self._empty()
        fields = self._fields_for(field)
        analyzer = (self.index.config.analyzer_for(fields[0])
                    if fields[0] in self.index.config.fields else "standard")
        tokens = pyan.analyze(str(value), analyzer)
        if not tokens:
            return self._empty()
        # stem HERE with the language detected over the WHOLE analyzed value
        # (per-token detection would route marker-free tokens of a detected
        # query — 'laufenden' in 'der die und laufenden' — to the porter)
        surfaces = list(tokens)  # pre-stem forms: the synonym-lookup keys
        tokens = self._stem_query_tokens(tokens)
        if len(tokens) == 1:
            return self._single_term(field, tokens[0], fz or 0, scoring,
                                     pre_stemmed=True, surface=surfaces[0])
        # multi-token: AND of tokens (string-query semantics, QueryParser.ts:33-42)
        nodes = [self._single_term(field, t, fz or 0, scoring,
                                   pre_stemmed=True, surface=s)
                 for t, s in zip(tokens, surfaces)]
        cand = nodes[0].cand
        for n in nodes[1:]:
            cand = cand.join(n.cand, "doc_id", "semi")
        terms = [p for n in nodes for p in n.score_terms]
        return _Node(cand, terms)

    def _expand(self, body: dict, kind: str, scoring: bool) -> _Node:
        field, value, _ = self._leaf_args(body)
        if field is None or value is None:
            return self._empty()
        fields = self._fields_for(field)
        norm = str(value).lower()
        if kind == "prefix":
            matched = self._dictionary(fields).where(
                F.col("term").startswith(norm))
        else:  # wildcard: escape metachars, * -> .*, ? -> . (canonical Q5)
            rx = "".join(".*" if ch == "*" else "." if ch == "?" else re.escape(ch)
                         for ch in norm)
            matched = self._dictionary(fields).where(
                F.col("term").rlike(f"^{rx}$"))
        return self._terms_to_node(matched, scoring)

    def _range(self, body: dict) -> _Node:
        field = body.get("field")
        # nonexistent field (schema-resolved, like _exists) = no match —
        # never an AnalysisException at query time
        if not field or not _schema_has_path(self.docs.schema, str(field)):
            return self._empty()
        col = F.col(field)
        pred = col.isNotNull()
        if "gte" in body:
            pred = pred & (col >= F.lit(body["gte"]))
        if "gt" in body:
            pred = pred & (col > F.lit(body["gt"]))
        if "lte" in body:
            pred = pred & (col <= F.lit(body["lte"]))
        if "lt" in body:
            pred = pred & (col < F.lit(body["lt"]))
        cand = self._live(self.docs.where(pred).select(
            F.col(self.id_col).alias("doc_id")))
        return _Node(cand, [])

    def _geo(self, body: dict) -> _Node:
        """geo_distance (QueryProcessor.ts:437-527): haversine R=6371e3 m;
        numeric distance = km; '5km'/'500m' strings; center {lat,lon} or
        [a,b] with the range heuristic."""
        field = body.get("field")
        params = geo_params(body)
        if field is None or params is None:
            return self._empty()
        clat, clon, meters = params

        dtype = dict(self.docs.dtypes).get(field, "")
        # missing field — or a struct without lat/lon leaves — matches
        # nothing (builder semantics, like _exists/_range), never an
        # AnalysisException
        if dtype.startswith("array"):
            pass
        elif not (_schema_has_path(self.docs.schema, f"{field}.lat")
                  and _schema_has_path(self.docs.schema, f"{field}.lon")):
            return self._empty()
        if dtype.startswith("array"):
            lat, lon = F.col(field)[0], F.col(field)[1]
        else:
            lat, lon = F.col(f"{field}.lat"), F.col(f"{field}.lon")
        dist_m = _haversine_m(F.lit(float(clat)), F.lit(float(clon)), lat, lon)
        cand = self._live(
            self.docs.where(lat.isNotNull() & (dist_m <= F.lit(meters)))
            .select(F.col(self.id_col).alias("doc_id")))
        return _Node(cand, [])

    def _phrase(self, body: dict, scoring: bool) -> _Node:
        field, value, fz = self._leaf_args(body)
        slop = int(body.get("slop", 0) or 0)
        fuzziness = int(body.get("fuzziness", 0) or 0)
        if field is None or value is None:
            return self._empty()
        tokens = pyan.standard(str(value))  # tokenizer.tokenize default
        # stems are 1:1 per token at index time, so positions are unchanged
        # and phrase proximity over stemmed tokens is exact
        tokens = self._stem_query_tokens(tokens)
        if not tokens:
            return self._empty()
        fields = self._fields_for(field)
        # positions per phrase token: for fuzzy, union the positions of every
        # dictionary term within the edit distance.
        pos_frames = []
        for j, tok in enumerate(tokens):
            if fuzziness == 0:
                pairs = [(f, tok) for f in fields]
                pf = self._postings_for(pairs)
                if len(pairs) == 1:
                    # positions are already sorted & unique per posting row —
                    # no explode/regroup needed for the single-field exact case
                    pf = pf.select("doc_id", F.col("positions").alias(f"pos{j}"))
                    pos_frames.append(pf)
                    continue
            else:
                matched = self._fuzzy_dictionary(fields, tok, fuzziness)
                pf = self._postings_for(None, matched)
            pf = (pf.select("doc_id", F.explode("positions").alias("p"))
                  .groupBy("doc_id")
                  .agg(F.sort_array(F.collect_set("p")).alias(f"pos{j}")))
            pos_frames.append(pf)
        joined = pos_frames[0]
        for pf in pos_frames[1:]:
            joined = joined.join(pf, "doc_id")
        if slop == 0 and fuzziness == 0:
            # exact phrase: greedy proximity with slop 0 accepts iff the
            # tokens appear at consecutive positions — an intersect chain
            # S_0 = pos0; S_j = (S_{j-1}+1) ∩ pos_j; accept iff S_n nonempty.
            # Pure JVM array expressions, no Python kernel.
            s = F.col("pos0")
            for j in range(1, len(tokens)):
                s = F.array_intersect(
                    F.transform(s, lambda p: p + F.lit(1)), F.col(f"pos{j}"))
            cand = joined.where(F.size(s) > 0).select("doc_id")
        else:
            arrays = F.array(*[F.col(f"pos{j}") for j in range(len(tokens))])
            ok = _phrase_match_udf(arrays, F.lit(slop), F.lit(fuzziness))
            cand = joined.where(ok).select("doc_id")
        terms = ([(f, t) for f in fields for t in tokens]
                 if scoring and fuzziness == 0 else [])
        return _Node(cand, terms)

    def _nested(self, body: dict, scoring: bool) -> _Node:
        """nested: rewrite inner query fields to path-prefixed columns
        (QueryEngine.ts:547-553, 1331-1339)."""
        path, inner = body.get("path"), body.get("query")
        if not path or not inner:
            return self._empty()

        def prefix_fields(q):
            if not isinstance(q, dict):
                return q
            out = {}
            for k, v in q.items():
                if k in ("bool",):
                    out[k] = {ck: [prefix_fields(c) for c in cv] if isinstance(cv, list) else cv
                              for ck, cv in v.items()}
                elif k in ("term", "match", "range", "prefix", "wildcard",
                           "fuzzy", "phrase", "match_phrase", "geo_distance"):
                    body2 = dict(v)
                    if "field" in body2 and not str(body2["field"]).startswith(path + "."):
                        body2["field"] = f"{path}.{body2['field']}"
                    out[k] = body2
                else:
                    out[k] = v
            return out

        return self._compile(prefix_fields(inner), scoring)

    # -- bool -----------------------------------------------------------

    def _bool(self, bq: dict, scoring: bool) -> _Node:
        must = bq.get("must") or []
        filt = bq.get("filter") or []
        should = bq.get("should") if isinstance(bq.get("should"), list) else (
            [bq["should"]] if bq.get("should") else None)
        must_not = bq.get("must_not") or []
        if not isinstance(must, list):
            must = [must]
        if not isinstance(filt, list):
            filt = [filt]
        if not isinstance(must_not, list):
            must_not = [must_not]

        # ES semantics: explicit empty should with no must/filter -> nothing
        if (should is not None and len(should) == 0
                and not must and not filt):
            return self._empty()

        results: DataFrame | None = None
        score_terms: list = []
        score_dfs: list = []  # children's over-limit expansion frames —
        # dropping them would silently un-score a >COLLECT_TERMS_LIMIT
        # wildcard/fuzzy expansion nested inside a bool clause

        for clause in filt:  # filters first, non-scoring
            node = self._compile(clause, scoring=False)
            results = node.cand if results is None else results.join(
                node.cand, "doc_id", "semi")

        for clause in must:
            node = self._compile(clause, scoring)
            score_terms += node.score_terms
            if node.score_terms_df is not None:
                score_dfs.append(node.score_terms_df.select("field", "term"))
            results = node.cand if results is None else results.join(
                node.cand, "doc_id", "semi")

        if should:
            nodes = [self._compile(c, scoring) for c in should]
            for n in nodes:
                score_terms += n.score_terms
                if n.score_terms_df is not None:
                    score_dfs.append(n.score_terms_df.select("field", "term"))
            tagged = None
            for i, n in enumerate(nodes):
                t = n.cand.select("doc_id", F.lit(i).alias("_clause"))
                tagged = t if tagged is None else tagged.unionByName(t)
            union = tagged.select("doc_id").distinct()
            msm = bq.get("minimum_should_match")
            if results is None:
                # no mandatory clauses: union of should wins
                results = union
            else:
                mand = results
                if msm:
                    # count of matching should clauses >= m (canonical B3;
                    # reference implements m==1 as plain intersection)
                    m = int(msm)
                    enough = (tagged.distinct().groupBy("doc_id")
                              .agg(F.count(F.lit(1)).alias("n"))
                              .where(F.col("n") >= m).select("doc_id"))
                    mand = mand.join(enough, "doc_id", "semi")
                # "should replaces EMPTY mandatory results"
                # (QueryProcessor.ts:276-278) folded into ONE plan: a 1-row
                # broadcast count of the pre-msm mandatory frame selects the
                # branch at execution time — no driver-side emptiness probe
                # job during compilation, and Catalyst's ReusedExchange
                # shares the mandatory subtree between the count and the
                # row branch. At 100 TB this saves a full posting-join pass
                # per should+must query.
                mc = results.agg(F.count(F.lit(1)).alias("_mc"))
                branched = (
                    mand.withColumn("_src", F.lit(0))
                    .unionByName(union.withColumn("_src", F.lit(1)))
                    .crossJoin(F.broadcast(mc)))
                results = (branched.where(
                    ((F.col("_mc") > 0) & (F.col("_src") == 0))
                    | ((F.col("_mc") == 0) & (F.col("_src") == 1)))
                    .select("doc_id"))

        for clause in must_not:
            node = self._compile(clause, scoring=False)
            if results is None:
                return self._empty()
            results = results.join(node.cand, "doc_id", "anti")

        if results is None:
            return self._empty()
        # pure-should-of-term-leaves: candidate set is exactly the union of
        # docs holding >=1 score term — scoring can skip the membership join
        pure_should = (not must and not filt and not must_not and should
                       and not bq.get("minimum_should_match")
                       and all(n.cand_is_scored_union for n in nodes))
        merged_df = None
        for d in score_dfs:
            merged_df = d if merged_df is None else merged_df.unionByName(d)
        return _Node(results.distinct(), score_terms, merged_df,
                     cand_is_scored_union=bool(pure_should) and scoring)


def _schema_has_path(schema, path: str) -> bool:
    """True iff ``path`` (dot-separated) resolves inside ``schema``."""
    from pyspark.sql.types import StructType
    cur = schema
    for part in str(path).split("."):
        if not isinstance(cur, StructType) or part not in cur.fieldNames():
            return False
        cur = cur[part].dataType
    return True


def geo_params(body: dict):
    """(center_lat, center_lon, meters) from a geo_distance body, or None
    when distance/center are missing — numeric distance = km, '5km'/'500m'
    strings, center as {lat,lon} or [a,b] with the range heuristic
    (QueryProcessor.ts:437-527). Shared by the Spark plan and the serving
    twin so both parse requests identically."""
    dist = body.get("distance")
    center = body.get("location") or body.get("center")
    if dist is None or center is None:
        return None
    if isinstance(dist, (int, float)):
        meters = float(dist) * 1000.0
    else:
        s = str(dist).strip().lower()
        if s.endswith("km"):
            meters = float(s[:-2]) * 1000.0
        elif s.endswith("m"):
            meters = float(s[:-1])
        else:
            meters = float(s) * 1000.0
    if isinstance(center, (list, tuple)):
        a, bb = center[0], center[1]
        clat, clon = (a, bb) if abs(a) <= 90 and abs(bb) <= 180 else (bb, a)
    else:
        clat, clon = center["lat"], center["lon"]
    return float(clat), float(clon), meters


def _haversine_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Haversine distance in meters, R=6371e3 (QueryProcessor.ts:514-527)."""
    phi1 = F.radians(lat1)
    phi2 = F.radians(lat2)
    dphi = F.radians(lat2 - lat1)
    dlmb = F.radians(lon2 - lon1)
    a = (F.sin(dphi / 2) * F.sin(dphi / 2)
         + F.cos(phi1) * F.cos(phi2) * F.sin(dlmb / 2) * F.sin(dlmb / 2))
    c = 2 * F.atan2(F.sqrt(a), F.sqrt(1 - a))
    return F.lit(6371e3) * c


def greedy_phrase_match(matches: list, slop: int, fuzziness: int) -> bool:
    """The reference's greedy proximity check
    (QueryProcessor._checkPhraseProximity:579-617 and the fuzzy variant
    :619-661) reformulated over per-token sorted position lists.

    ``matches[j]`` = positions where phrase token j occurs. For each
    candidate start i (only positions within slop before a first-token
    occurrence can matter), greedily take the earliest occurrence of each
    token inside the window [max(last+1, i+j), i+j+slop+fuzziness+1), then
    accept iff every token matched and max gap <= slop.
    """
    m = len(matches)
    if m == 0:
        return True
    if any(len(p) == 0 for p in matches):
        return False
    window_extra = slop + fuzziness
    starts = sorted({p - d for p in matches[0] for d in range(slop + 1) if p - d >= 0})
    for i in starts:
        last = i - 1
        max_gap = 0
        ok = True
        for j in range(m):
            lo = max(last + 1, i + j)
            hi = i + j + window_extra + 1  # exclusive
            found = None
            for p in matches[j]:  # sorted; earliest in window
                if p < lo:
                    continue
                if p >= hi:
                    break
                found = p
                break
            if found is None:
                ok = False
                break
            max_gap = max(max_gap, found - last - 1)
            last = found
        if ok and max_gap <= slop:
            return True
    return False


@F.pandas_udf(BooleanType())
def _phrase_match_udf(arrays: pd.Series, slop: pd.Series,
                      fuzziness: pd.Series) -> pd.Series:
    out = []
    for arr, s, fz in zip(arrays, slop, fuzziness):
        matches = [list(p) for p in arr]
        out.append(greedy_phrase_match(matches, int(s), int(fz)))
    return pd.Series(out)
