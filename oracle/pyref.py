"""Pinned pure-Python oracle implementing the CANONICAL reference semantics.

This is the ground truth for rank-identity tests (BASELINE.md §2): a direct,
dictionary-based implementation of the reference engine's component
semantics — indexing (SearchEngine.ts:871-934), query processing
(QueryProcessor.ts), BM25 (BM25Scorer.ts:84-118, k1=1.2 b=0.75), ranking and
tie-break (SearchEngine.ts:610-615 / QueryEngine.ts:224-235: score desc,
doc_id asc) — with the wiring bugs canonicalized per SURVEY.md §2.8.

It shares the analyzer implementations with the engine
(search_engine_spark.analysis.analyzers — themselves pinned against
node-generated golden vectors), but reimplements indexing, query evaluation
and scoring independently of Spark so the two paths only share tokenization.
"""

from __future__ import annotations

import math
import re

from search_engine_spark.analysis import analyzers as pyan
from search_engine_spark.analysis.analyzers import FIELD_TYPE_ANALYZER

K1, B = 1.2, 0.75


class OracleIndex:
    def __init__(self, fields: dict, id_col: str = "doc_id"):
        self.fields = fields  # field -> type
        self.id_col = id_col
        self.postings: dict = {}   # (field, term) -> {doc_id: sorted positions}
        self.doc_lengths: dict = {}
        self.docs: dict = {}

    @property
    def text_fields(self):
        return [f for f, t in self.fields.items()
                if t in ("text", "keyword", "email", "url", "phone")]

    def add(self, doc: dict):
        doc_id = doc[self.id_col]
        self.docs[doc_id] = doc
        dl = 0
        for field, ftype in self.fields.items():
            value = _get_path(doc, field)
            if value is None:
                continue
            if isinstance(value, list):
                # per-element standard tokenization, positions restart
                # (SearchEngine.ts:902-919); not counted in doc length
                for elem in value:
                    if isinstance(elem, str):
                        for pos, tok in enumerate(pyan.standard(elem)):
                            self._add_token(field, tok, doc_id, pos)
            elif isinstance(value, str):
                analyzer = FIELD_TYPE_ANALYZER.get(ftype, "standard")
                toks = pyan.analyze(value, analyzer)
                dl += len(toks)
                for pos, tok in enumerate(toks):
                    self._add_token(field, tok, doc_id, pos)
        self.doc_lengths[doc_id] = dl

    def _add_token(self, field, term, doc_id, pos):
        d = self.postings.setdefault((field, term), {})
        s = d.setdefault(doc_id, set())
        s.add(pos)

    # -- stats ----------------------------------------------------------
    @property
    def total_docs(self):
        return len(self.docs)

    @property
    def avg_dl(self):
        if not self.doc_lengths:
            return 0.0
        return sum(self.doc_lengths.values()) / len(self.doc_lengths)

    def df(self, field, term):
        return len(self.postings.get((field, term), {}))

    def tf(self, field, term, doc_id):
        return len(self.postings.get((field, term), {}).get(doc_id, ()))

    def positions(self, field, term, doc_id):
        return sorted(self.postings.get((field, term), {}).get(doc_id, ()))

    def field_terms(self, field):
        return {t for (f, t) in self.postings if f == field}

    def docs_for(self, field, term):
        return set(self.postings.get((field, term), {}))


def levenshtein(a: str, b: str) -> int:
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _get_path(doc, path):
    if path in doc:
        return doc[path]
    cur = doc
    for part in path.split("."):
        if not isinstance(cur, dict):
            return None
        cur = cur.get(part)
        if cur is None:
            return None
    return cur


class OracleEngine:
    def __init__(self, index: OracleIndex, k1: float = K1, b: float = B,
                 synonyms: dict | None = None):
        self.ix = index
        self.k1, self.b = k1, b
        self.synonyms = synonyms or {}

    # -- public ----------------------------------------------------------

    def search(self, query, size=10, from_=0):
        """Top-k [(doc_id, score)] — score desc, doc_id asc."""
        q = self._rewrite(query)
        cand, terms = self._execute(q, scoring=True)
        scores = self._score(cand, terms)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[from_: from_ + size]

    def candidates(self, query):
        q = self._rewrite(query)
        cand, _ = self._execute(q, scoring=False)
        return cand

    # -- scoring ----------------------------------------------------------

    def _score(self, cand, terms):
        out = {d: 0.0 for d in cand}
        N = self.ix.total_docs
        avgdl = self.ix.avg_dl or 1.0
        for field, term in sorted(set(terms)):
            df = self.ix.df(field, term)
            if df == 0:
                continue
            idf = math.log((N - df + 0.5) / (df + 0.5) + 1.0)
            for doc_id, positions in self.ix.postings[(field, term)].items():
                if doc_id not in out:
                    continue
                tf = len(positions)
                dl = self.ix.doc_lengths.get(doc_id, 0)
                num = tf * (self.k1 + 1.0)
                den = tf + self.k1 * ((1.0 - self.b) + self.b * (dl / avgdl))
                out[doc_id] += max(0.0, idf * (num / den))
        return out

    # -- rewrites ----------------------------------------------------------

    def _rewrite(self, query):
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

    # -- execution ----------------------------------------------------------

    def _execute(self, q, scoring):
        if not q:
            return set(), []
        if "match_all" in q:
            return set(self.ix.docs), []
        if "term" in q:
            f, v, fz = _leaf_args(q["term"])
            return self._single_term(f, str(v).lower(), fz, scoring)
        if "match" in q:
            return self._match(q["match"], scoring)
        if "bool" in q:
            return self._bool(q["bool"], scoring)
        if "range" in q:
            return self._range(q["range"]), []
        if "prefix" in q:
            return self._expand(q["prefix"], "prefix", scoring)
        if "wildcard" in q:
            return self._expand(q["wildcard"], "wildcard", scoring)
        if "fuzzy" in q:
            f, v, fz = _leaf_args(q["fuzzy"])
            fz = 2 if not fz else fz
            return self._single_term(f, str(v).lower(), fz, scoring)
        if "geo_distance" in q:
            return self._geo(q["geo_distance"]), []
        if "phrase" in q or "match_phrase" in q:
            return self._phrase(q.get("match_phrase") or q.get("phrase"), scoring)
        if "nested" in q:
            return self._nested(q["nested"], scoring)
        return set(), []

    def _fields_for(self, field):
        return self.ix.text_fields if field == "*" else [field]

    def _single_term(self, field, norm, fz, scoring):
        docs, terms = set(), []
        for f in self._fields_for(field):
            dict_terms = self.ix.field_terms(f)
            matched = set()
            if fz == 0:
                if norm in dict_terms:
                    matched.add(norm)
                for syn in self.synonyms.get(norm, ()):
                    s = str(syn).lower()
                    if s in dict_terms:
                        matched.add(s)
            else:
                for t in dict_terms:
                    if levenshtein(norm, t) <= fz:
                        matched.add(t)
            for t in matched:
                docs |= self.ix.docs_for(f, t)
                if scoring:
                    terms.append((f, t))
        return docs, terms

    def _match(self, body, scoring):
        field, value, fz = _leaf_args(body)
        if field is None or value is None:
            return set(), []
        fields = self._fields_for(field)
        ftype = self.ix.fields.get(fields[0], "text")
        analyzer = FIELD_TYPE_ANALYZER.get(ftype, "standard")
        tokens = pyan.analyze(str(value), analyzer)
        if not tokens:
            return set(), []
        docs, terms = None, []
        for tok in tokens:
            d, t = self._single_term(field, tok, fz or 0, scoring)
            terms += t
            docs = d if docs is None else (docs & d)
        return docs or set(), terms

    def _expand(self, body, kind, scoring):
        field, value, _ = _leaf_args(body)
        if field is None or value is None:
            return set(), []
        norm = str(value).lower()
        docs, terms = set(), []
        if kind == "wildcard":
            rx = re.compile("^" + "".join(
                ".*" if ch == "*" else "." if ch == "?" else re.escape(ch)
                for ch in norm) + "$")
        for f in self._fields_for(field):
            for t in self.ix.field_terms(f):
                hit = t.startswith(norm) if kind == "prefix" else bool(rx.match(t))
                if hit:
                    docs |= self.ix.docs_for(f, t)
                    if scoring:
                        terms.append((f, t))
        return docs, terms

    def _range(self, body):
        field = body.get("field")
        out = set()
        for doc_id, doc in self.ix.docs.items():
            v = _get_path(doc, field) if field else None
            if v is None:
                continue
            if "gte" in body and not v >= body["gte"]:
                continue
            if "gt" in body and not v > body["gt"]:
                continue
            if "lte" in body and not v <= body["lte"]:
                continue
            if "lt" in body and not v < body["lt"]:
                continue
            out.add(doc_id)
        return out

    def _geo(self, body):
        field, dist = body.get("field"), body.get("distance")
        center = body.get("location") or body.get("center")
        if field is None or dist is None or center is None:
            return set()
        if isinstance(dist, (int, float)):
            meters = float(dist) * 1000.0
        else:
            s = str(dist).strip().lower()
            meters = (float(s[:-2]) * 1000.0 if s.endswith("km")
                      else float(s[:-1]) if s.endswith("m")
                      else float(s) * 1000.0)
        if isinstance(center, (list, tuple)):
            a, b = center[0], center[1]
            clat, clon = (a, b) if abs(a) <= 90 and abs(b) <= 180 else (b, a)
        else:
            clat, clon = center["lat"], center["lon"]
        out = set()
        for doc_id, doc in self.ix.docs.items():
            gp = _get_path(doc, field)
            if gp is None:
                continue
            if isinstance(gp, (list, tuple)):
                a, b = gp[0], gp[1]
                lat, lon = (a, b) if abs(a) <= 90 and abs(b) <= 180 else (b, a)
            elif isinstance(gp, dict) and "lat" in gp and "lon" in gp:
                lat, lon = gp["lat"], gp["lon"]
            else:
                continue
            if _haversine_m(clat, clon, lat, lon) <= meters:
                out.add(doc_id)
        return out

    def _phrase(self, body, scoring):
        field, value, _ = _leaf_args(body)
        slop = int(body.get("slop", 0) or 0)
        fuzziness = int(body.get("fuzziness", 0) or 0)
        if field is None or value is None:
            return set(), []
        tokens = pyan.standard(str(value))
        if not tokens:
            return set(), []
        fields = self._fields_for(field)
        docs, terms = set(), []
        for f in fields:
            # per-token position sets (fuzzy: union over matching dict terms)
            per_tok = []
            for tok in tokens:
                if fuzziness == 0:
                    postings = {d: sorted(ps) for d, ps in
                                self.ix.postings.get((f, tok), {}).items()}
                else:
                    postings = {}
                    for t in self.ix.field_terms(f):
                        if levenshtein(tok, t) <= fuzziness:
                            for d, ps in self.ix.postings[(f, t)].items():
                                postings.setdefault(d, set()).update(ps)
                    postings = {d: sorted(ps) for d, ps in postings.items()}
                per_tok.append(postings)
            cand = set(per_tok[0])
            for p in per_tok[1:]:
                cand &= set(p)
            for d in cand:
                matches = [p[d] for p in per_tok]
                if greedy_phrase_match(matches, slop, fuzziness):
                    docs.add(d)
            if scoring and fuzziness == 0:
                terms += [(f, t) for t in tokens]
        return docs, terms

    def _nested(self, body, scoring):
        path, inner = body.get("path"), body.get("query")
        if not path or not inner:
            return set(), []

        def prefix_fields(q):
            if not isinstance(q, dict):
                return q
            out = {}
            for k, v in q.items():
                if k == "bool":
                    out[k] = {ck: [prefix_fields(c) for c in cv]
                              if isinstance(cv, list) else cv
                              for ck, cv in v.items()}
                elif k in ("term", "match", "range", "prefix", "wildcard",
                           "fuzzy", "phrase", "match_phrase", "geo_distance"):
                    b2 = dict(v)
                    if "field" in b2 and not str(b2["field"]).startswith(path + "."):
                        b2["field"] = f"{path}.{b2['field']}"
                    out[k] = b2
                else:
                    out[k] = v
            return out

        return self._execute(prefix_fields(inner), scoring)

    def _bool(self, bq, scoring):
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

        if should is not None and len(should) == 0 and not must and not filt:
            return set(), []

        results = None
        terms = []
        for clause in filt:
            d, _ = self._execute(clause, scoring=False)
            results = d if results is None else (results & d)
        for clause in must:
            d, t = self._execute(clause, scoring)
            terms += t
            results = d if results is None else (results & d)
        if should:
            per_clause = []
            for clause in should:
                d, t = self._execute(clause, scoring)
                terms += t
                per_clause.append(d)
            union = set().union(*per_clause)
            msm = bq.get("minimum_should_match")
            if results is None or len(results) == 0:
                results = union
            elif msm:
                m = int(msm)
                counts = {}
                for d in per_clause:
                    for doc in d:
                        counts[doc] = counts.get(doc, 0) + 1
                results = {doc for doc in results if counts.get(doc, 0) >= m}
        for clause in must_not:
            d, _ = self._execute(clause, scoring=False)
            if results is None:
                return set(), []
            results = results - d
        return (results or set()), terms


def _leaf_args(body):
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


def _haversine_m(lat1, lon1, lat2, lon2):
    R = 6371e3
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp = math.radians(lat2 - lat1)
    dl = math.radians(lon2 - lon1)
    a = (math.sin(dp / 2) ** 2
         + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2)
    return R * 2 * math.atan2(math.sqrt(a), math.sqrt(1 - a))


def greedy_phrase_match(matches, slop, fuzziness):
    """Identical algorithm to search_engine_spark.plans.dsl.greedy_phrase_match
    (kept separate so the oracle shares no Spark-side code)."""
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
            hi = i + j + window_extra + 1
            found = None
            for p in matches[j]:
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
