"""Thin HTTP facade over the catalog + serving layer (server.ts parity).

The reference's primary entry point is an Express app (server.ts:226-267
``POST /search/:indexName``) with request clamping
(PerformanceOptimizations.ts:183-213). This module provides the same
surface over the Spark engine as a stdlib ``http.server`` app — a facade,
not a serving architecture: heavy lifting stays in the engine/catalog, and
genuinely interactive deployments front the Spark-free ``ServingIndex``
(serving.py) instead.

Endpoints (request/response shapes mirror server.ts):
- ``GET  /``                         health + index listing
- ``POST /search/<index>``           body {query, from, size, aggregations}
- ``POST /index``                    body {indexName, docsPath, fields?}
- ``POST /index/<name>/documents``   body {documents: [...]} — LSM append
  (operators/lsm.append_docs: O(batch) run, no base rewrite;
  server.ts:353-385 shapes incl. duplicateCount by id)
- ``POST /index/<name>/snapshot``    block-index snapshot (write_blocks;
  server.ts:389-411)
- ``POST /index/<name>/flush``       compact live runs into the base
  (lsm.compact_runs; server.ts:415-438)
- ``GET  /performance``              process metrics
"""

from __future__ import annotations

import json
import logging
import os
import threading
import time
import traceback
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .catalog import IndexCatalog
from .operators.index_build import IndexConfig

log = logging.getLogger(__name__)

#: request clamps (PerformanceOptimizations.ts:183-213)
MAX_SIZE = 100
MAX_FROM = 10_000
MAX_AGG_TERMS = 50


def _int_or(v, default: int) -> int:
    """int(v) with the reference's garbage tolerance — a non-numeric
    size/from is the default, never a ValueError → 500."""
    try:
        return int(v)
    except (TypeError, ValueError):
        return default


def clamp_options(body: dict) -> dict:
    """size ≤ 100, from ≤ 10000, terms-agg size ≤ 50 — the reference's
    optimizeSearchOptions, applied before any work is scheduled."""
    size = _int_or(body.get("size") or 10, 10)
    if size <= 0:  # malformed-but-harmless, like the reference's clamps
        size = 10
    from_ = _int_or(body.get("from") or 0, 0)
    out = {"size": min(size, MAX_SIZE), "from": min(max(from_, 0), MAX_FROM)}
    aggs = body.get("aggregations") or body.get("aggs") or {}
    if not isinstance(aggs, dict):  # [] / scalar: ignore like Object.entries
        aggs = {}
    clamped_aggs = {}
    for name, cfg in aggs.items():
        if not isinstance(cfg, dict):  # null/number entry: drop, not 500
            continue
        cfg = dict(cfg)
        terms = cfg.get("terms")
        if isinstance(terms, dict) and \
                _int_or(terms.get("size") or 10, 10) > MAX_AGG_TERMS:
            cfg["terms"] = {**terms, "size": MAX_AGG_TERMS}
        clamped_aggs[name] = cfg
    out["aggregations"] = clamped_aggs
    return out


class _RWLock:
    """Reentrant-read / reentrant-write lock with writer preference.

    Many concurrent readers OR one writer; a pending writer blocks NEW
    readers (no flush starvation behind a steady query stream). A thread
    holding the write side may take the read side (mutators call shared
    helpers); read→write upgrade is refused (deadlock by construction)."""

    def __init__(self):
        self._cond = threading.Condition()
        self._readers: dict = {}       # thread ident -> depth
        self._writer = None            # thread ident
        self._wdepth = 0
        self._waiting = 0

    class _Guard:
        def __init__(self, lock, write):
            self._lock, self._write = lock, write

        def __enter__(self):
            (self._lock._acquire_write if self._write
             else self._lock._acquire_read)()
            return self

        def __exit__(self, *exc):
            (self._lock._release_write if self._write
             else self._lock._release_read)()
            return False

    def read_guard(self):
        return self._Guard(self, write=False)

    def write_guard(self):
        return self._Guard(self, write=True)

    def _acquire_read(self):
        me = threading.get_ident()
        with self._cond:
            if self._writer == me or me in self._readers:
                self._readers[me] = self._readers.get(me, 0) + 1
                return
            while self._writer is not None or self._waiting:
                self._cond.wait()
            self._readers[me] = 1

    def _release_read(self):
        me = threading.get_ident()
        with self._cond:
            self._readers[me] -= 1
            if not self._readers[me]:
                del self._readers[me]
                self._cond.notify_all()

    def _acquire_write(self):
        me = threading.get_ident()
        with self._cond:
            if self._writer == me:
                self._wdepth += 1
                return
            if me in self._readers:
                raise RuntimeError("read->write lock upgrade unsupported")
            self._waiting += 1
            try:
                while self._writer is not None or self._readers:
                    self._cond.wait()
            finally:
                self._waiting -= 1
            self._writer = me
            self._wdepth = 1

    def _release_write(self):
        with self._cond:
            self._wdepth -= 1
            if not self._wdepth:
                self._writer = None
                self._cond.notify_all()


class SearchService:
    """Catalog-backed search service the HTTP handler delegates to."""

    #: auto-persistence defaults (AutoPersistenceManager.ts:14-28 shape
    #: AND defaults: enabled === true means DEFAULT OFF, interval 30 s,
    #: batchSize 100). Here a "save" is the INCREMENTAL snapshot refresh
    #: (wand.refresh_blocks + doc_values.refresh_doc_values — O(appended
    #: batch)), so keeping the millisecond path warm after every
    #: ~batch_size appended docs is cheap by construction, unlike the
    #: reference's full saveSnapshot. jobs/serve.py enables it.
    AUTO_PERSIST_DEFAULTS = {
        "enabled": False, "save_on_add": True,
        "batch_size": 100, "interval": 30.0,
    }

    #: phrases whose RAREST token matches more than this corpus fraction
    #: are routed to the Spark path (serving._route_heavy_phrase)
    PHRASE_ROUTE_DF_RATIO = 0.10
    #: prefix/wildcard/fuzzy patterns expanding past this many dictionary
    #: terms are routed to the Spark path (degenerate '*a*' shapes)
    EXPANSION_ROUTE_MAX_TERMS = 512

    def __init__(self, spark: SparkSession, root: str,
                 auto_persist: dict | None = None):
        self.spark = spark
        self.catalog = IndexCatalog(spark, root)
        self._docs: dict = {}           # index name -> docs DataFrame
        self._queries = 0
        self._served_fast = 0           # answered off the block snapshot
        self._serving_cache: dict = {}  # name -> (state, ServingIndex|None)
        self._snap_busy: set = set()    # names mid-/snapshot block rewrite
        self._t0 = time.time()
        self.auto_persist = {**self.AUTO_PERSIST_DEFAULTS,
                             **(auto_persist or {})}
        self._auto_pending: dict = {}   # name -> docs appended since save
        self._auto_last: dict = {}      # name -> last auto-save time
        # ThreadingHTTPServer runs handlers concurrently: index MUTATIONS
        # (append/flush/snapshot) take the WRITE side of one RW lock;
        # SPARK-PATH searches take the READ side — a Spark plan lists
        # parquet files at construction and reads them at execution, so a
        # fold rewriting those directories mid-query makes totals flicker
        # (raw parquet has no snapshot isolation; caught by
        # tests/test_search_during_flush.py). The millisecond fast path
        # stays LOCK-FREE: it serves immutable snapshot artifacts behind
        # their own freshness guards (_snap_busy + staleness checks), so
        # read throughput is unaffected; only the seconds-scale Spark
        # fallback serializes against seconds-scale mutations — which is
        # the reference's effective behavior (single-threaded event loop).
        self._lock = _RWLock()
        self._mutate_lock = self._lock.write_guard()

    def create_index(self, name: str, docs_path: str,
                     fields: dict | None = None,
                     id_col: str = "doc_id", overwrite: bool = False,
                     facet_fields: list | None = None,
                     key_col: str | None = None) -> dict:
        """``key_col`` — a STRING-keyed corpus (the reference accepts any
        id type, QueryEngine.ts:137-149): the docs map through the
        persisted keymap (surrogate long ids, operators/keymap.py) and
        every later ``add_documents`` batch keyed on the same column
        upserts by key — the url-re-crawl lifecycle over HTTP."""
        docs = self.spark.read.parquet(docs_path)
        if key_col is not None:
            # pre-check existence so a refused create never leaves keymap
            # chunks behind in a dir catalog.create_index then rejects
            if self.catalog.index_exists(name) and not overwrite:
                raise ValueError(f"index {name!r} already exists")
            from .operators.keymap import build_keymap
            d = self.catalog._dir(name)
            os.makedirs(d, exist_ok=True)
            docs = build_keymap(docs, d, key_col=key_col)
            id_col = "doc_id"
        cfg = IndexConfig(id_col=id_col,
                          fields=fields or {"text": "text"},
                          facet_fields=tuple(facet_fields or ()))
        meta = self.catalog.create_index(name, docs, cfg,
                                         overwrite=overwrite)
        # persist the docs-table location so a RESTARTED service restores
        # the document store without an operator --register step (the
        # reference's snapshot restore brings documents back by itself,
        # SnapshotManager.ts restore path)
        from .operators.index_build import write_meta
        mp = os.path.join(self.catalog._dir(name), "meta.json")
        with open(mp) as fh:
            m = json.load(fh)
        m["docs_path"] = os.path.abspath(docs_path)
        if key_col is not None:
            m["key_col"] = key_col
        write_meta(self.catalog._dir(name), m)
        self._docs[name] = docs
        return meta

    def register_docs(self, name: str, docs) -> None:
        self._docs[name] = docs

    def _restore_docs(self, name: str):
        """Lazily re-register the docs table recorded at create_index —
        a fresh process serves an existing catalog with no explicit
        register_docs call. Returns None when the index predates the
        recorded path (register_docs stays available)."""
        meta = self.catalog.stats(name)
        path = meta.get("docs_path")
        if not path or not os.path.isdir(path):
            return None
        docs = self.spark.read.parquet(path)
        if meta.get("key_col"):
            # keyed index: the raw parquet has no surrogate ids — re-map
            # (every key is already in the chunks, so this resolves, it
            # never assigns)
            from .operators.keymap import map_keys
            docs = map_keys(docs, self.catalog._dir(name),
                            key_col=meta["key_col"])
        self._docs[name] = docs
        return docs

    def _docs_view(self, name: str):
        """Registered docs table ∪ persisted docs-runs (rows added via
        POST /documents) — the full document store the reference keeps in
        idx.documents. None when no docs table is registered. Cached per
        index state fingerprint (every append commits a new manifest
        entry, so the fingerprint always moves).

        Upsert semantics on id collision (delete → re-add): docs-run rows
        beat registered rows, later runs beat earlier ones — the window
        runs over the SMALL docs-runs union only; the registered table
        pays one broadcast anti-join against the run ids. Ids in the
        ``docs_tombstones`` mask (physically purged, registered row
        immutable) are filtered out entirely."""
        docs = self._docs.get(name)
        if docs is None:
            docs = self._restore_docs(name)
        if docs is None:
            return None
        ixdir = self.catalog._dir(name)
        dr = os.path.join(ixdir, "docs_runs")
        from .operators.lsm import dir_has_parquet
        chunks = sorted(
            (c for c in os.listdir(dr)
             if os.path.isdir(os.path.join(dr, c))
             and dir_has_parquet(os.path.join(dr, c))),
            key=lambda c: (int(c.rsplit("=", 1)[-1])
                           if c.rsplit("=", 1)[-1].isdigit() else -1, c)
        ) if os.path.isdir(dr) else []
        from .operators.delete import docs_tombstones_path
        if not chunks and docs_tombstones_path(ixdir) is None:
            return docs
        state = self.catalog._delete_state(name)
        cache = getattr(self, "_docs_view_cache", None)
        if cache is None:
            cache = self._docs_view_cache = {}
        hit = cache.get(name)
        if hit is not None and hit[0] == state:
            return hit[1]
        id_col = self._index_config(name).id_col
        view = docs
        if chunks:
            frames = [
                self.spark.read.parquet(os.path.join(dr, c))
                .withColumn("__gen", F.lit(i))
                for i, c in enumerate(chunks)]
            extra = frames[0]
            for f in frames[1:]:
                extra = extra.unionByName(f, allowMissingColumns=True)
            from pyspark.sql import Window
            w = Window.partitionBy(id_col).orderBy(F.desc("__gen"))
            extra = (extra.withColumn("__rn", F.row_number().over(w))
                     .where(F.col("__rn") == 1).drop("__gen", "__rn"))
            view = (docs.join(F.broadcast(extra.select(id_col)),
                              id_col, "anti")
                    .unionByName(extra, allowMissingColumns=True))
        from .operators.delete import load_docs_tombstones
        dt = load_docs_tombstones(self.spark, ixdir)
        if dt is not None:
            view = view.join(
                F.broadcast(dt.select(F.col("doc_id").cast(
                    view.schema[id_col].dataType).alias(id_col))),
                id_col, "anti")
        cache[name] = (state, view)
        return view

    def search(self, name: str, body: dict) -> dict:
        if not self.catalog.index_exists(name):
            raise KeyError(name)
        opts = clamp_options(body)
        docs = self._docs_view(name)
        if docs is None:
            raise RuntimeError(f"no docs table registered for index {name!r}")
        t0 = time.time()
        query = body.get("query") or {"match_all": {}}
        # millisecond fast path: inverted-index-resident queries are
        # answered straight off the block snapshot (the reference answers
        # its whole DSL in-process, server.ts <50 ms) — INCLUDING
        # aggregations when every agg type/field is servable from the
        # doc-values sidecar (serving.can_aggregate). Anything else — and
        # any index without a FRESH snapshot — falls through to the Spark
        # plan below.
        cfg = self._index_config(name)
        facet_fields = list(cfg.facet_fields or ())
        if isinstance(query, dict):
            srv = self._serving(name)
            agg_cfg = opts["aggregations"]
            if srv is not None and \
                    (not agg_cfg or srv.can_aggregate(agg_cfg)) and \
                    (not facet_fields or srv.can_facet(facet_fields)):
                try:
                    if agg_cfg or facet_fields:
                        r = srv.serve(query, k=opts["size"],
                                      from_=opts["from"],
                                      aggs=agg_cfg or None,
                                      facet_fields=facet_fields or None)
                        pairs, total = r["pairs"], r["total"]
                        fast_aggs, fast_facets = (r["aggregations"],
                                                  r["facets"])
                    else:
                        pairs, total = srv.search_with_total(
                            query, k=opts["size"], from_=opts["from"])
                        fast_aggs, fast_facets = {}, {}
                    # stored-document enrichment stays INSIDE the guarded
                    # block: a sidecar mid-rewrite must fall back to
                    # Spark, not 500
                    if pairs is not None:
                        stored = srv.enrich([d for d, _ in pairs])
                except ValueError as e:
                    if "serving surface" in str(e):
                        pairs = None  # docs-table op — expected fallback
                    else:
                        # damaged/raced snapshot artifact: drop the handle
                        # so the next request re-opens, answer via Spark,
                        # and SAY so — a silent permanent fallback hides a
                        # 100x latency regression from operators
                        self._serving_cache.pop(name, None)
                        log.warning("serving fast path failed for %r "
                                    "(falling back to Spark): %s", name, e)
                        pairs = None
                except Exception as e:
                    self._serving_cache.pop(name, None)
                    log.warning("serving fast path failed for %r "
                                "(falling back to Spark): %s", name, e)
                    pairs = None
                if pairs is not None:
                    self._queries += 1
                    self._served_fast += 1
                    # hits carry the stored document like the reference
                    # (SearchEngine.ts:619-627 spreads docData into each
                    # hit) — gathered from the doc-values sidecar above
                    return {
                        "hits": [{**fl, "doc_id": d, "score": s}
                                 for (d, s), fl in zip(pairs, stored)],
                        "total": total,
                        "from": opts["from"], "size": opts["size"],
                        "aggregations": fast_aggs, "facets": fast_facets,
                        "_performance": {
                            "queryTime":
                                f"{round((time.time() - t0) * 1000)}ms",
                            "servedBy": "blocks",
                        },
                    }
        with self._lock.read_guard():
            # re-resolve the docs view UNDER the lock: the cached
            # plan captured file listings that a flush committing
            # in between may have rewritten
            docs = self._docs_view(name)
            eng = self.catalog.engine(docs, name)
            # ONE compiled plan serves both hits and total: the scored frame is
            # persisted for the request, the count materializes it, and the
            # top-k sort-limit reads the cached rows — the candidate subtree
            # (postings joins, BM25) executes once per request instead of twice
            # (server.ts computes both from its single in-memory result set).
            scored = eng.search_scored(query).persist()
            try:
                total = scored.count()
                top = (scored.orderBy(F.desc("score"), F.asc("doc_id"))
                       .offset(opts["from"]).limit(opts["size"]))
                pairs = [(r["doc_id"], r["score"]) for r in top.collect()]
                aggregations, facets = {}, {}
                if opts["aggregations"]:
                    # the reference computes every agg over the MATCHED set
                    # (SearchEngine.ts:541-560) — the persisted scored frame
                    # already materialized it, so each agg is one scan of the
                    # hit-scoped docs, not a recompute of the query
                    from .operators.agg_compile import compile_aggregations
                    aggregations = compile_aggregations(
                        opts["aggregations"], docs, scored.select("doc_id"),
                        id_col=cfg.id_col,
                        tombstones=self._tombstones_frame(name))
                if facet_fields:
                    from .operators.agg_compile import compile_facets
                    facets = compile_facets(facet_fields, docs,
                                            scored.select("doc_id"),
                                            id_col=cfg.id_col)
            finally:
                scored.unpersist()
            # stored-document enrichment (SearchEngine.ts:619-627): the same
            # scalar columns the sidecar carries, pulled from the docs table
            # with a pushed-down IN over the page's ids
            from .operators.doc_values import enrich_rows, servable_fields
            stored = enrich_rows(docs, cfg.id_col, [d for d, _ in pairs],
                                 [f for f in servable_fields(docs, cfg.id_col)
                                  if "." not in f])
            hits = [{**stored.get(d, {}), "doc_id": d, "score": s}
                    for d, s in pairs]
        self._queries += 1
        return {
            "hits": hits, "total": total,
            "from": opts["from"], "size": opts["size"],
            "aggregations": aggregations, "facets": facets,
            "_performance": {
                "queryTime": f"{round((time.time() - t0) * 1000)}ms",
            },
        }

    def _serving(self, name: str):
        """ServingIndex over the index's block snapshot, cached per
        delete/append state fingerprint; None when no FRESH snapshot
        exists (no blocks yet, runs appended since write_blocks, or
        compact_deletes dropped the tombstone table) — callers fall back
        to the Spark path. POST /snapshot rebuilds and re-enables it.

        Searches stay lock-free, so a handle must never be built over (or
        cached across) a concurrent /snapshot rewrite of the blocks dir:
        ``_snap_busy`` brackets the rewrite, and any construction that
        overlaps it is discarded — that request just takes the Spark
        path."""
        if name in self._snap_busy:
            return None
        state = self.catalog._delete_state(name)
        cached = self._serving_cache.get(name)
        if cached is not None and cached[0] == state:
            return cached[1]
        from .serving import ServingIndex
        try:
            srv = ServingIndex(self.catalog._dir(name))
            # head×head phrases (seconds of position decode) belong on
            # the Spark path; typical phrases stay <50 ms on blocks
            srv.phrase_route_df_ratio = self.PHRASE_ROUTE_DF_RATIO
            srv.expansion_route_max_terms = self.EXPANSION_ROUTE_MAX_TERMS
        except (ValueError, FileNotFoundError):
            srv = None
        if name in self._snap_busy:
            return None  # overlapped a rewrite: don't trust, don't cache
        self._serving_cache[name] = (state, srv)
        return srv

    def _tombstones_frame(self, name: str):
        """DataFrame[doc_id] of DEAD docs (no surviving generation), or
        None — global agg scopes must not count deleted docs (the
        reference physically removes them from idx.documents), but an
        UPSERTED doc carries a tombstone AND a newer live generation, so
        the raw tombstone table would wrongly exclude it."""
        from .operators.delete import load_dead_ids
        return load_dead_ids(self.spark, self.catalog._dir(name))

    def _index_config(self, name: str) -> IndexConfig:
        """IndexConfig from the index meta, cached per meta.json mtime —
        the fast path reads this every request, and a ~2 ms response must
        not re-parse + re-validate config from disk each time. Appends/
        overwrites rewrite meta.json, so the mtime key invalidates."""
        import os
        mp = os.path.join(self.catalog._dir(name), "meta.json")
        try:
            mt = os.path.getmtime(mp)
        except OSError:
            mt = None
        cached = getattr(self, "_cfg_cache", None)
        if cached is None:
            cached = self._cfg_cache = {}
        hit = cached.get(name)
        if hit is not None and hit[0] == mt and mt is not None:
            return hit[1]
        cfg = self._index_config_uncached(name)
        cached[name] = (mt, cfg)
        return cfg

    def _index_config_uncached(self, name: str) -> IndexConfig:
        meta = self.catalog.stats(name)
        return IndexConfig(id_col=meta["id_col"], fields=meta["fields"],
                           n_buckets=meta["n_buckets"],
                           positions=meta["positions"],
                           stem_lang=meta.get("stem_lang"),
                           stem_lang_col=meta.get("stem_lang_col", "lang"),
                           analyzers=meta.get("analyzers") or {},
                           facet_fields=tuple(meta.get("facet_fields")
                                              or ()))

    def add_documents(self, name: str, documents: list) -> dict:
        """Reference ``add()`` semantics over HTTP (server.ts:353-385 →
        SearchWorker.ts:214-227 calls ``engine.add`` per doc, which
        REPLACES on an existing id, QueryEngine.ts:137-149): new ids
        append as an O(batch) LSM run, changed versions of live docs are
        replaced (lsm.upsert_docs: tombstone → purge → re-run), and
        byte-identical re-sends are dropped — the CRDT duplicate-operation
        analog (SharedMemoryWorkerPool.ts:1172-1177), so an idempotent
        retry never pays the replace path. The dedup/compare reads are
        O(batch's id-buckets) via the ds_bucket-pruned doc_stats layout
        plus an id-pushed-down docs-view probe, not O(corpus)."""
        if not self.catalog.index_exists(name):
            raise KeyError(name)
        from .operators.lsm import upsert_docs
        cfg = self._index_config(name)
        ixdir = self.catalog._dir(name)
        with self._mutate_lock:
            batch = self.spark.createDataFrame(documents)
            kc = self.catalog.stats(name).get("key_col")
            if kc:
                # keyed index: posted docs carry the natural key, not a
                # numeric id — map through the persisted keymap (re-seen
                # keys resolve, new keys assign under this mutate lock)
                from .operators.keymap import map_keys
                batch = map_keys(batch, ixdir, key_col=kc)
            batch = batch.dropDuplicates([cfg.id_col])
            # current stored values let identical re-sends short-circuit;
            # a disk-restored index with no registered docs table compares
            # nothing and replaces every collision (what the reference
            # does unconditionally)
            res = upsert_docs(batch, ixdir, cfg,
                              current=self._docs_view(name))
            n_fresh = res["added"] + res["replaced"]
            if res["entry"] is not None:
                # the appended docs' FIELD VALUES must stay reachable
                # too (the reference's idx.documents holds the full
                # doc): persist the batch as a docs-run so the Spark
                # path's aggregations/facets/enrichment — and the next
                # snapshot's sidecar — see these rows. Named by the
                # LSM run key so the INCREMENTAL sidecar refresh can
                # map an uncovered run to exactly its docs batch.
                # Written AFTER the append committed; a replaced doc's
                # OLD docs-run rows stay until compaction, but _docs_view
                # window-dedups to the latest run generation.
                import os
                res["batch"].write.mode("overwrite").parquet(os.path.join(
                    ixdir, "docs_runs", res["entry"]["chunk"]))
            meta = self.catalog.stats(name)
            # pending is counted UNDER the mutate lock, the same lock the
            # snapshot holds while reading the manifest and (at its end)
            # zeroing the counter — so every counted append is covered by
            # the snapshot that zeroes it, and no concurrent append's
            # count can be wiped (lock-free read-modify-write here raced
            # with snapshot's reset and lost appends' counts, leaving an
            # uncovered run with pending == 0: no trigger ever fired)
            if n_fresh and self.auto_persist.get("enabled"):
                self._auto_pending[name] = (
                    self._auto_pending.get(name, 0) + n_fresh)
        saved = self._check_auto_save(name)
        return {
            "message": f"Added {n_fresh} documents to index '{name}'",
            # addedCount counts every doc the engine (re-)indexed, like
            # the reference's per-doc add loop; replaced ids are broken
            # out so callers can see the upsert happened. duplicateCount
            # = identical re-sends + in-batch id dupes (dropped).
            "addedCount": n_fresh,
            "replacedCount": res["replaced"],
            "duplicateCount": len(documents) - n_fresh,
            "totalDocs": meta["total_docs"],
            # reference shape verbatim (server.ts:373-377 hardcodes
            # enabled: true and triggered = addedCount > 0); autoSaved
            # additionally reports whether the incremental snapshot
            # refresh actually ran for this batch
            "persistence": {"enabled": True,
                            "triggered": n_fresh > 0,
                            "autoSaved": saved},
        }

    def _check_auto_save(self, name: str) -> bool:
        """AutoPersistenceManager.checkAutoSave twin
        (AutoPersistenceManager.ts:62-71): trigger a save once
        ``batch_size`` appended docs accumulate (or ``interval`` seconds
        pass with work pending). The counting itself happens in
        add_documents under the mutate lock; with save_on_add off, the
        interval timer (maybe_auto_save) is the only trigger. The save
        here is the O(batch) incremental snapshot refresh, so the
        millisecond serving path stays warm without operator action. Runs
        OUTSIDE the mutate lock (snapshot re-acquires it). Returns True
        when a save ran."""
        ap = self.auto_persist
        if not ap.get("enabled"):
            return False
        pending = self._auto_pending.get(name, 0)
        if not ap.get("save_on_add") or pending <= 0:
            return False
        last = self._auto_last.get(name, self._t0)
        due = (pending >= int(ap.get("batch_size") or 100)
               or time.time() - last >= float(ap.get("interval") or 30.0))
        if not due:
            return False
        # a failing save must not turn a durably COMPLETED append into an
        # HTTP 500 (the appended run is committed either way; the
        # snapshot retries on the next add or interval tick) — mirror the
        # interval thread's guard in jobs/serve.py
        try:
            self.snapshot(name)
        except Exception:  # noqa: BLE001 — append success is the contract
            import logging
            logging.getLogger(__name__).exception(
                "auto-persist snapshot failed for %r (append unaffected)",
                name)
            return False
        return True

    def maybe_auto_save(self) -> list:
        """Interval tick (the reference's setInterval auto-save,
        AutoPersistenceManager.ts:30-38): refresh every index with pending
        appended docs. Call from a deployment timer (jobs/serve.py wires a
        daemon thread); returns the index names refreshed."""
        ap = self.auto_persist
        if not ap.get("enabled"):
            return []
        saved = []
        for name, pending in list(self._auto_pending.items()):
            if pending > 0 and time.time() - self._auto_last.get(
                    name, self._t0) >= float(ap.get("interval") or 30.0):
                # per-index isolation: one index whose refresh persistently
                # fails (damaged run dir, full disk) must not starve every
                # index after it in the dict on this and all future ticks
                try:
                    self.snapshot(name)
                except Exception:  # noqa: BLE001 — keep the tick going
                    import logging
                    logging.getLogger(__name__).exception(
                        "interval auto-persist failed for %r", name)
                    continue
                saved.append(name)
        return saved

    def snapshot(self, name: str) -> dict:
        """Block-index snapshot (server.ts:389-411) — INCREMENTAL since
        round 4: appended LSM runs become additive block/sidecar delta
        files (O(batch) — wand.refresh_blocks, doc_values.
        refresh_doc_values); the full rewrite only runs when there is no
        previous snapshot, after compact_deletes, or for runs already
        folded into the base (flush-then-snapshot)."""
        if not self.catalog.index_exists(name):
            raise KeyError(name)
        from .operators.wand import refresh_blocks
        ixdir = self.catalog._dir(name)
        with self._mutate_lock:
            # bracket the rewrite: lock-free searches must not build or
            # cache a ServingIndex over a half-written blocks dir
            self._snap_busy.add(name)
            try:
                metrics = refresh_blocks(self.spark, ixdir)
                # doc-values sidecar: every scalar column — keyword/
                # numeric/date metadata for serving-side aggregations AND
                # the text bodies for hit enrichment (the reference's RAM
                # doc store holds full documents; columns load lazily at
                # serve time, so an agg on `lang` never pays for `text`).
                # Same run lineage as the blocks → same freshness horizon.
                from .operators.doc_values import refresh_doc_values
                cfg = self._index_config(name)
                dv = refresh_doc_values(self.spark, ixdir,
                                        full_docs=self._docs_view(name),
                                        id_col=cfg.id_col)
                if dv:
                    metrics["doc_values_fields"] = sorted(dv["fields"])
                # bounded delta accumulation: bucket partitions that
                # collected too many delta files since the last pass are
                # rewritten into one term-sorted file each (file-level
                # union — content identical, cold-lookup footer reads
                # drop back to 1 per bucket). No-op listdir when nothing
                # qualifies.
                from .operators.doc_values import consolidate_doc_values
                from .operators.wand import consolidate_blocks
                thresh = int(self.auto_persist.get(
                    "consolidate_after") or 16)
                cons = consolidate_blocks(self.spark, ixdir,
                                          min_files=thresh)
                if cons.get("consolidated_buckets"):
                    metrics["consolidated"] = cons
                dvc = consolidate_doc_values(self.spark, ixdir,
                                             min_delta_files=thresh)
                if dvc.get("merged_files"):
                    metrics["dv_consolidated"] = dvc
                # document-store run batches: fold covered chunks into one
                # latest-generation chunk so the union view's plan and the
                # delete-compaction job count stay O(1) in appends
                from .operators.lsm import consolidate_docs_runs
                drc = consolidate_docs_runs(self.spark, ixdir,
                                            id_col=cfg.id_col,
                                            min_chunks=thresh)
                if drc.get("folded_chunks"):
                    metrics["docs_runs_folded"] = drc
                # keyed index: the key → surrogate-id map accrues one
                # chunk per batch with fresh keys — fold it under the
                # same cadence so lookups stay O(buckets), not O(batches)
                if self.catalog.stats(name).get("key_col"):
                    from .operators.keymap import consolidate_keymap
                    kmc = consolidate_keymap(self.spark, ixdir,
                                             min_chunks=thresh)
                    if kmc.get("folded"):
                        metrics["keymap_folded"] = kmc
            finally:
                self._snap_busy.discard(name)
            # reset UNDER the same lock appends count under: every counted
            # append was committed before this snapshot read the manifest
            # (the lock was held throughout), so zeroing here can never
            # wipe the count of a not-yet-covered append
            self._auto_pending[name] = 0
            self._auto_last[name] = time.time()
        # new snapshot under the same meta state: force a re-open so the
        # serving fast path picks up the rebuilt (fresh) blocks
        self._serving_cache.pop(name, None)
        return {
            "message": f"Snapshot saved for index '{name}'",
            "timestamp": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "indexName": name,
            "metrics": metrics,
        }

    def flush(self, name: str) -> dict:
        """Fold live LSM runs into the base buckets (server.ts:415-438)."""
        if not self.catalog.index_exists(name):
            raise KeyError(name)
        from .operators.lsm import compact_runs, live_runs
        ixdir = self.catalog._dir(name)
        with self._mutate_lock:
            n_runs = len(live_runs(ixdir))
            compact_runs(self.spark, ixdir)
        return {
            "message": f"Flushed index '{name}' successfully",
            "flushedWorkers": n_runs,
            "totalWorkers": n_runs,
            "persistenceSaved": True,
        }

    def health(self) -> dict:
        return {"status": "ok", "indices": self.catalog.list_indexes(),
                "uptime": time.time() - self._t0}

    def performance(self) -> dict:
        # auto-stopword candidates (StopwordsManager.ts's df/N detection,
        # read off already-open serving dictionaries — no Spark job):
        # exactly the head terms the phrase router deflects; operators can
        # promote them to index stopwords
        stopwords: dict = {}
        for name, cached in list(self._serving_cache.items()):
            srv = cached[1]
            if srv is None:
                continue
            try:
                cands = srv.stopword_candidates()
            except Exception:  # noqa: BLE001 — diagnostics must not 500
                continue
            if cands:
                stopwords[name] = {f: [{"term": t, "df": d}
                                       for t, d in pairs]
                                   for f, pairs in cands.items()}
        out = {"queries": self._queries,
               "served_by_blocks": self._served_fast,
               "uptime": time.time() - self._t0,
               "spark": {"app_id": self.spark.sparkContext.applicationId}}
        if stopwords:
            out["autoStopwordCandidates"] = stopwords
        return out


def make_server(service: SearchService, host: str = "127.0.0.1",
                port: int = 0) -> ThreadingHTTPServer:
    """ThreadingHTTPServer bound to ``service``; port 0 = ephemeral."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _body(self) -> dict:
            n = int(self.headers.get("Content-Length") or 0)
            if not n:
                return {}
            try:
                return json.loads(self.rfile.read(n) or b"{}")
            except json.JSONDecodeError:
                return {}

        def do_GET(self):
            if self.path == "/":
                self._json(200, service.health())
            elif self.path == "/performance":
                self._json(200, service.performance())
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            try:
                if self.path.startswith("/search/"):
                    name = self.path[len("/search/"):].strip("/")
                    try:
                        self._json(200, service.search(name, self._body()))
                    except KeyError:
                        self._json(404, {
                            "error": f"Index '{name}' not found"})
                elif self.path == "/index":
                    b = self._body()
                    meta = service.create_index(
                        b["indexName"], b["docsPath"],
                        fields=b.get("fields"),
                        id_col=b.get("idCol", "doc_id"),
                        overwrite=bool(b.get("overwrite")),
                        facet_fields=b.get("facetFields"),
                        key_col=b.get("keyCol"))
                    self._json(200, {"indexName": b["indexName"],
                                     "meta": meta})
                elif self.path.startswith("/index/"):
                    parts = self.path.strip("/").split("/")
                    if len(parts) != 3:
                        self._json(404, {"error": "not found"})
                        return
                    _, name, action = parts
                    try:
                        if action == "documents":
                            docs = self._body().get("documents")
                            if not isinstance(docs, list) or not docs:
                                self._json(400, {
                                    "error": "documents array is required"})
                                return
                            self._json(200, service.add_documents(name, docs))
                        elif action == "snapshot":
                            self._json(200, service.snapshot(name))
                        elif action == "flush":
                            self._json(200, service.flush(name))
                        else:
                            self._json(404, {"error": "not found"})
                    except KeyError:
                        self._json(404, {
                            "error": f"Index '{name}' not found"})
                else:
                    self._json(404, {"error": "not found"})
            except Exception:  # noqa: BLE001 — 500 like server.ts
                traceback.print_exc()
                self._json(500, {"error": "Internal server error"})

    return ThreadingHTTPServer((host, port), Handler)
