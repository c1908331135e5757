"""JSON aggregation surface — the reference's request-level aggregations.

The reference's ``SearchEngine.search`` accepts an ``aggregations`` object
in the request body and computes every agg over the MATCHED doc set (the
whole result set, not the page): SearchEngine.ts:541-560 routes the query
through the QueryEngine with aggregations attached, and
``_calculateAggregations`` (SearchEngine.ts:971-1100) dispatches on the agg
type — terms / histogram / date_histogram / range / nested / global /
filter — with FacetEngine.ts:184-400 supplying the bucket math and
response shapes.

This module is the Spark twin: :func:`compile_aggregations` takes the same
JSON config, the docs table, and the matched hit frame, and returns the
reference's response dict (plain JSON-able values, tiny — bucket counts,
not row data). Each agg is one scan of the hit-scoped docs frame (the hit
set joins broadcast; range aggs fold all their buckets into a single pass
of conditional sums), so the cost at 100 TB is bounded by the match scope,
never by |ranges| or |aggs| × corpus.

A numpy serving twin (``ServingIndex.aggregate``) answers the same config
in milliseconds off the doc-values sidecar; the key formatters here are
shared by both paths so their JSON output is identical (parity-tested).

Key conventions (deterministic; two documented deviations from JS):
- terms keys are stringified like the reference's ``String(val)`` except
  booleans render "true"/"false" in BOTH engines; count ties break
  key-ascending (JS object-insertion order is nondeterministic).
- date_histogram uses the reference's FIXED-millisecond intervals
  ('1s','1m','1h','1d','1w','1M'≈30d,'1y'≈365d — FacetEngine.ts:215-226),
  bucket key = ISO-8601 of floor(ms/interval)*interval. The calendar
  variant stays available as operators.aggregations.date_histogram_agg.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: FacetEngine.ts:215-226 — fixed-ms intervals, '1d' the fallback
DATE_INTERVALS_MS = {
    "1s": 1_000,
    "1m": 60_000,
    "1h": 3_600_000,
    "1d": 86_400_000,
    "1w": 604_800_000,
    "1M": 2_592_000_000,   # 30 d — the reference's approximate month
    "1y": 31_536_000_000,  # 365 d — the reference's approximate year
}

#: nested is Spark-only (struct/array columns never land in doc-values)
SERVABLE_AGGS = ("terms", "histogram", "date_histogram", "range",
                 "filter", "global")


# -- key formatters shared by the Spark path and the serving twin ----------

def key_str(v) -> str:
    """terms bucket key — String(val) except booleans follow the JS/Spark
    "true"/"false" rendering (Python's str(True) would diverge)."""
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def hist_key(b: float):
    """histogram keys stay NUMBERS (FacetEngine.ts:193-203); integral
    buckets render as ints so JSON says 100, not 100.0 (JS numbers make
    no such distinction)."""
    b = float(b)
    return int(b) if b.is_integer() else b


def iso_ms(ms: int) -> str:
    """JS Date.toISOString() twin for an epoch-millis bucket key."""
    t = dt.datetime.fromtimestamp(ms / 1000, tz=dt.timezone.utc)
    return t.strftime("%Y-%m-%dT%H:%M:%S.") + f"{ms % 1000:03d}Z"


def range_key(r: dict) -> str:
    """FacetEngine.ts:_generateRangeKey — "from-to" / "from-*" / "*-to" / "*"."""
    if r.get("key") is not None:
        return str(r["key"])
    lo, hi = r.get("from"), r.get("to")
    if lo is not None and hi is not None:
        return f"{lo}-{hi}"
    if lo is not None:
        return f"{lo}-*"
    if hi is not None:
        return f"*-{hi}"
    return "*"


def agg_fields(aggs: dict) -> set:
    """Every doc field an aggregation config touches (recursing into
    filter/global sub-aggs) — the serving path checks these against the
    doc-values sidecar before claiming the request."""
    out: set = set()
    for cfg in (aggs or {}).values():
        if not isinstance(cfg, dict):
            continue
        for kind in ("terms", "histogram", "date_histogram", "range"):
            body = cfg.get(kind)
            if isinstance(body, dict) and body.get("field"):
                out.add(body["field"])
        flt = cfg.get("filter")
        if isinstance(flt, dict):
            for pred in ("term", "match", "range"):
                body = flt.get(pred)
                if isinstance(body, dict) and body.get("field"):
                    out.add(body["field"])
            out |= agg_fields(cfg.get("aggs") or {})
        glb = cfg.get("global")
        if isinstance(glb, dict):
            out |= agg_fields(glb.get("aggs") or {})
        nst = cfg.get("nested")
        if isinstance(nst, dict):
            out.add(nst.get("path") or "")
    out.discard("")
    return out


def dv_requirements(aggs: dict) -> list:
    """(field, need) pairs the serving twin must satisfy from the
    doc-values sidecar — need ∈ {'terms','numeric','date','eq','match'}.
    terms/eq want str|int|bool kinds (float keys would render differently
    across engines), numeric wants int|float, date wants ms, match wants
    str (JS stringifies anything, but a timestamp's string form differs
    between engines — those requests stay on Spark)."""
    out: list = []
    for cfg in (aggs or {}).values():
        if not isinstance(cfg, dict):
            continue
        t = cfg.get("terms")
        if isinstance(t, dict) and t.get("field"):
            out.append((t["field"], "terms"))
        for kind in ("histogram", "range"):
            body = cfg.get(kind)
            if isinstance(body, dict) and body.get("field"):
                out.append((body["field"], "numeric"))
        dh = cfg.get("date_histogram")
        if isinstance(dh, dict) and dh.get("field"):
            out.append((dh["field"], "date"))
        flt = cfg.get("filter")
        if isinstance(flt, dict):
            if isinstance(flt.get("term"), dict) and flt["term"].get("field"):
                out.append((flt["term"]["field"], "eq"))
            if isinstance(flt.get("match"), dict) and flt["match"].get("field"):
                out.append((flt["match"]["field"], "match"))
            if isinstance(flt.get("range"), dict) and flt["range"].get("field"):
                out.append((flt["range"]["field"], "numeric"))
            out += dv_requirements(cfg.get("aggs") or {})
        glb = cfg.get("global")
        if isinstance(glb, dict):
            out += dv_requirements(glb.get("aggs") or {})
    return out


#: dv kinds acceptable per requirement (doc_values._dv_kind vocabulary)
DV_KINDS_FOR = {
    "terms": ("str", "int", "bool"),
    "eq": ("str", "int", "bool"),
    "numeric": ("int", "float"),
    "date": ("ms",),
    "match": ("str",),
}


def servable(aggs: dict) -> bool:
    """True when every agg in the config is a type the serving twin
    implements (nested needs struct columns → Spark only)."""
    for cfg in (aggs or {}).values():
        if not isinstance(cfg, dict):
            return False
        kinds = [k for k in cfg if k in SERVABLE_AGGS or k == "nested"]
        if not kinds or "nested" in cfg:
            return False
        flt = cfg.get("filter")
        if isinstance(flt, dict) and cfg.get("aggs"):
            if not servable(cfg["aggs"]):
                return False
        glb = cfg.get("global")
        if isinstance(glb, dict) and glb.get("aggs"):
            if not servable(glb["aggs"]):
                return False
    return True


def has_field(docs: DataFrame, name: str) -> bool:
    """True when ``name`` (top-level or one-level struct leaf) resolves
    against the docs schema — every compiled agg/facet checks this first,
    because an unresolved F.col would raise AnalysisException at run time
    where the reference's _getFieldValue just yields undefined (empty
    buckets / zero counts, SearchEngine.ts:989-996)."""
    if not name:
        return False
    from ..plans.dsl import _schema_has_path  # arbitrary-depth dot paths
    return _schema_has_path(docs.schema, str(name))


def _num_or_none(v):
    """float(v) or None — a non-numeric bound in a filter range matches
    NOTHING in the reference (NaN comparisons are false in JS), so callers
    turn it into lit(False) rather than a ValueError → 500."""
    try:
        return float(v)
    except (TypeError, ValueError):
        return None


def compile_facets(fields: list, docs: DataFrame,
                   hits: DataFrame | None,
                   id_col: str = "doc_id") -> dict:
    """FacetEngine.calculate (FacetEngine.ts:124-136): for each configured
    facet field, {value: count} over the matched doc set — every value
    with a nonzero count (the reference has no size cap; facet fields are
    keyword-typed, so cardinality is bounded by the domain). One
    hit-scoped scan per field."""
    scoped = _scoped(docs, hits, id_col)
    out: dict = {}
    for f in fields:
        if not has_field(docs, f):
            out[f] = {}  # unknown facet field = empty, never a crash
            continue
        rows = (scoped.where(F.col(f).isNotNull())
                .groupBy(F.col(f).alias("v"))
                .agg(F.count(F.lit(1)).alias("c")).collect())
        out[f] = {key_str(r["v"]): int(r["c"]) for r in rows}
    return out


# -- Spark path -------------------------------------------------------------

def _scoped(docs: DataFrame, hits: DataFrame | None,
            id_col: str) -> DataFrame:
    if hits is None:
        return docs
    h = hits.select(F.col(hits.columns[0]).alias(id_col)).distinct()
    return docs.join(F.broadcast(h), id_col, "semi")


def agg_size(body: dict) -> int:
    """terms-agg size with garbage tolerance (non-numeric/≤0 → 10)."""
    s = _num_or_none(body.get("size"))
    return int(s) if s and s > 0 else 10


def _terms(scoped: DataFrame, body: dict) -> dict:
    field, size = body["field"], agg_size(body)
    rows = (scoped.where(F.col(field).isNotNull())
            .groupBy(F.col(field).alias("v"))
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.desc("c"), F.asc(F.col("v").cast("string")))
            .limit(size).collect())
    return {"buckets": [{"key": key_str(r["v"]), "doc_count": int(r["c"])}
                        for r in rows]}


def _histogram(scoped: DataFrame, body: dict) -> dict:
    field = body["field"]
    interval = _num_or_none(body.get("interval"))
    if not interval or interval <= 0:  # garbage interval: no buckets
        return {"buckets": []}
    v = F.col(field).cast("double")  # typeof v === 'number' gate
    bucket = F.floor(v / F.lit(interval)) * F.lit(interval)
    # literal NaN values are excluded on BOTH paths: a NaN bucket key
    # cannot survive strict JSON (JS stringifies it to null), and every
    # JS range comparison on NaN is false anyway
    rows = (scoped.where(v.isNotNull() & ~F.isnan(v))
            .groupBy(bucket.cast("double").alias("b"))
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy("b").collect())
    return {"buckets": [{"key": hist_key(r["b"]), "doc_count": int(r["c"])}
                        for r in rows]}


def _date_histogram(scoped: DataFrame, body: dict) -> dict:
    field = body["field"]
    ims = DATE_INTERVALS_MS.get(str(body.get("interval")),
                                DATE_INTERVALS_MS["1d"])
    # try_cast: a non-date value is a NULL bucket-source (skipped), the
    # reference's isNaN(date) guard — ANSI cast would throw on e.g. a
    # date_histogram aimed at a string column
    ms = F.unix_millis(F.col(field).try_cast("timestamp"))
    # EXACT integer bucket: ms - pmod(ms, ims) == floor(ms/ims)*ims in
    # int64 (pmod is non-negative, so pre-1970 floors correctly too) —
    # no double-division rounding anywhere, matching the serving twin's
    # int64 floor-division bitwise by construction.
    bucket = (ms - F.pmod(ms, F.lit(ims))).cast("long")
    rows = (scoped.where(ms.isNotNull())
            .groupBy(bucket.alias("b"))
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy("b").collect())
    return {"buckets": [{"key": iso_ms(r["b"]),
                         "key_as_string": iso_ms(r["b"]),
                         "doc_count": int(r["c"])} for r in rows]}


def _ranges(scoped: DataFrame, body: dict) -> dict:
    """All range buckets in ONE conditional-sum pass (ranges may overlap,
    [from, to) semantics — FacetEngine.ts:_isValueInRange)."""
    field, ranges = body["field"], list(body.get("ranges") or [])
    if not ranges:
        return {"buckets": []}
    v = F.col(field).cast("double")
    sums = []
    for i, r in enumerate(ranges):
        pred = v.isNotNull() & ~F.isnan(v)  # NaN: every JS cmp is false
        lo = _num_or_none(r["from"]) if r.get("from") is not None else None
        hi = _num_or_none(r["to"]) if r.get("to") is not None else None
        if (r.get("from") is not None and lo is None) or \
                (r.get("to") is not None and hi is None):
            pred = F.lit(False)  # non-numeric bound: bucket counts 0 (JS)
        else:
            if lo is not None:
                pred = pred & (v >= F.lit(lo))
            if hi is not None:
                pred = pred & (v < F.lit(hi))
        sums.append(F.sum(F.when(pred, 1).otherwise(0))
                    .cast("long").alias(f"_r{i}"))
    row = scoped.agg(*sums).collect()[0]
    return {"buckets": [
        {"key": range_key(r), "from": r.get("from"), "to": r.get("to"),
         "doc_count": int(row[f"_r{i}"] or 0)}
        for i, r in enumerate(ranges)]}


def _filter_pred(flt: dict, docs: DataFrame):
    """Column predicate for a filter agg (SearchEngine.ts
    _applyFilterToDocuments): term strict-eq, match lowercase-contains,
    range gte/gt/lte/lt on numbers only. An unknown field matches nothing
    (doc[field] is undefined in the reference), never an
    AnalysisException."""
    for pred in ("term", "match", "range"):
        body = flt.get(pred)
        if isinstance(body, dict) and not has_field(docs,
                                                    body.get("field")):
            return F.lit(False)
    if "term" in flt:
        body = flt["term"]
        return F.col(body["field"]) == F.lit(body.get("value"))
    if "match" in flt:
        body = flt["match"]
        needle = str(body.get("value", "")).lower()
        col = F.lower(F.col(body["field"]).cast("string"))
        return col.isNotNull() & (F.instr(col, needle) > 0)
    if "range" in flt:
        body = flt["range"]
        v = F.col(body["field"]).cast("double")
        pred = v.isNotNull()  # typeof !== 'number' → excluded
        for op, cmp in (("gte", lambda b: v >= F.lit(b)),
                        ("gt", lambda b: v > F.lit(b)),
                        ("lte", lambda b: v <= F.lit(b)),
                        ("lt", lambda b: v < F.lit(b))):
            if body.get(op) is None:
                continue
            bound = _num_or_none(body[op])
            if bound is None:  # NaN comparison in JS: excludes everything
                return F.lit(False)
            pred = pred & cmp(bound)
        return pred
    return F.lit(True)


def _nested(scoped: DataFrame, body: dict, sub_aggs: dict,
            id_col: str) -> dict:
    """nested agg (FacetEngine.ts:301-325): doc_count = docs having the
    path; sub-terms address fields relative to the path. Arrays of structs
    explode (ES nested-doc semantics — the canonical reading of the
    reference's per-value counting)."""
    path = body.get("path")
    having = scoped.where(F.col(path).isNotNull())
    out = {"doc_count": int(having.count())}
    if not sub_aggs:
        return out
    dtype = dict(having.dtypes).get(path, "")
    if dtype.startswith("array"):
        inner = having.select(F.col(id_col), F.explode(path).alias("_n")) \
            .select(F.col(id_col), F.col("_n.*"))
    else:
        inner = having.select(F.col(id_col), F.col(f"{path}.*"))
    for name, cfg in sub_aggs.items():
        t = (cfg or {}).get("terms")
        if isinstance(t, dict) and t.get("field"):
            fld = t["field"]
            if fld.startswith(path + "."):
                fld = fld[len(path) + 1:]
            # sub-field resolved against the EXPLODED frame — an unknown
            # leaf is empty buckets (undefined in the reference), not an
            # AnalysisException
            out[name] = (_terms(inner, {**t, "field": fld})
                         if has_field(inner, fld) else {"buckets": []})
    return out


def compile_aggregations(aggs: dict, docs: DataFrame,
                         hits: DataFrame | None,
                         id_col: str = "doc_id",
                         tombstones: DataFrame | None = None) -> dict:
    """Evaluate a reference-shaped ``aggregations`` request over the
    matched doc set. ``hits`` is a 1-column frame of matched doc ids
    (None = global context); ``tombstones`` (DataFrame[doc_id], optional)
    is anti-joined out of GLOBAL scopes so deleted docs never count — the
    reference's idx.documents has them physically removed, and hit frames
    are already delete-filtered by the engine."""
    result: dict = {}
    if not aggs:
        return result
    scoped = _scoped(docs, hits, id_col)
    live = docs
    if tombstones is not None:
        t = tombstones.select(F.col(tombstones.columns[0]).alias(id_col))
        live = docs.join(F.broadcast(t), id_col, "anti")
    def _known(body) -> bool:
        return isinstance(body, dict) and has_field(docs, body.get("field"))

    for name, cfg in aggs.items():
        if not isinstance(cfg, dict):
            continue
        if isinstance(cfg.get("terms"), dict):
            result[name] = (_terms(scoped, cfg["terms"])
                            if _known(cfg["terms"]) else {"buckets": []})
        elif isinstance(cfg.get("histogram"), dict):
            result[name] = (_histogram(scoped, cfg["histogram"])
                            if _known(cfg["histogram"])
                            else {"buckets": []})
        elif isinstance(cfg.get("date_histogram"), dict):
            result[name] = (_date_histogram(scoped, cfg["date_histogram"])
                            if _known(cfg["date_histogram"])
                            else {"buckets": []})
        elif isinstance(cfg.get("range"), dict):
            body = cfg["range"]
            if _known(body):
                result[name] = _ranges(scoped, body)
            else:  # unknown field: every range present, zero counts
                result[name] = {"buckets": [
                    {"key": range_key(r), "from": r.get("from"),
                     "to": r.get("to"), "doc_count": 0}
                    for r in (body.get("ranges") or [])]}
        elif isinstance(cfg.get("nested"), dict):
            if has_field(docs, (cfg["nested"] or {}).get("path")):
                result[name] = _nested(scoped, cfg["nested"],
                                       cfg.get("aggs") or {}, id_col)
            else:
                result[name] = {"doc_count": 0}
        elif isinstance(cfg.get("global"), dict):
            # global ignores the query scope (SearchEngine.ts:1036-1050)
            entry = {"doc_count": int(live.count())}
            sub = cfg["global"].get("aggs") or {}
            if sub:
                entry.update(compile_aggregations(
                    sub, live, None, id_col=id_col))
            result[name] = entry
        elif isinstance(cfg.get("filter"), dict):
            filtered = scoped.where(_filter_pred(cfg["filter"], docs))
            entry = {"doc_count": int(filtered.count())}
            sub = cfg.get("aggs") or {}
            if sub:
                entry.update(compile_aggregations(
                    sub, filtered, None, id_col=id_col))
            result[name] = entry
    return result
