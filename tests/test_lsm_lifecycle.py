"""Adversarial LSM lifecycle coverage (round-4 verdict item #8):
append / snapshot / delete / flush / compact_deletes interleaved across
cycles, asserting the union view, block-snapshot freshness refusal, and
meta stats stay consistent at every step — plus a concurrent hammer
racing searches against the full mutation mix over HTTP."""

from __future__ import annotations

import json
import os
import threading

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.delete import (compact_deletes,
                                                  delete_docs)
from search_engine_spark.operators.index_build import load_index
from search_engine_spark.operators.lsm import compact_runs, live_runs
from search_engine_spark.serving import ServingIndex


def _mk_docs(spark, ids, tag="base"):
    rows = [(i, f"alpha shared {tag} tok{i % 7}", "en") for i in ids]
    return spark.createDataFrame(rows,
                                 "doc_id long, text string, lang string")


class TestLifecycleCycles:
    """Model-checked sequential lifecycle: a Python-side doc-set model is
    the oracle for every phase of every cycle."""

    @pytest.fixture()
    def service(self, spark, tmp_path):
        from search_engine_spark.server import SearchService
        docs = _mk_docs(spark, range(20))
        docs_path = str(tmp_path / "docs")
        docs.write.parquet(docs_path)
        svc = SearchService(spark, str(tmp_path / "root"))
        svc.create_index("life", docs_path, fields={"text": "text"})
        svc.snapshot("life")
        return svc

    def _check(self, svc, live_ids, where):
        ixdir = svc.catalog._dir("life")
        # Spark path truth
        res = svc.search("life", {"query": {"term": {
            "field": "text", "value": "alpha"}}, "size": 100})
        got = {h["doc_id"] for h in res["hits"]}
        assert res["total"] == len(live_ids), where
        assert got == set(sorted(live_ids)[:100]) or \
            got <= set(live_ids), where
        # meta stats stay additively exact
        with open(os.path.join(ixdir, "meta.json")) as fh:
            meta = json.load(fh)
        assert meta["total_docs"] == len(live_ids), where
        # every doc contributes 4 tokens ("alpha shared <tag> tokN")
        assert meta["dl_sum"] == 4 * len(live_ids), where

    def test_cycles(self, spark, service):
        svc = service
        ixdir = svc.catalog._dir("life")
        live = set(range(20))
        next_id = 100
        for cycle in range(3):
            where = f"cycle {cycle}"
            # -- append a batch -------------------------------------------
            batch = [{"doc_id": next_id + j,
                      "text": f"alpha shared c{cycle} tok{j % 7}",
                      "lang": "en"} for j in range(5)]
            out = svc.add_documents("life", batch)
            assert out["addedCount"] == 5, where
            live |= {next_id + j for j in range(5)}
            next_id += 10
            self._check(svc, live, where + " post-append")
            # stale snapshot must REFUSE to serve (missing the run)
            with pytest.raises(ValueError, match="STALE"):
                ServingIndex(ixdir)
            # -- incremental snapshot -> fast path fresh -------------------
            svc.snapshot("life")
            srv = ServingIndex(ixdir)
            _, total = srv.search_with_total({"match_all": {}}, k=1)
            assert total == len(live), where + " post-snapshot"
            fast = svc.search("life", {"query": {"match_all": {}},
                                       "size": 1})
            assert fast["_performance"].get("servedBy") == "blocks", where
            assert fast["total"] == len(live), where
            # -- delete one base + one appended doc ------------------------
            victims = [min(live), max(live)]
            delete_docs(spark, ixdir, victims)
            live -= set(victims)
            self._check(svc, live, where + " post-delete")
            # merge-on-read: snapshot still serves (tombstone-filtered)
            srv = ServingIndex(ixdir)
            _, total = srv.search_with_total({"match_all": {}}, k=1)
            assert total == len(live), where + " post-delete serving"
            # -- flush (compact runs into base buckets) --------------------
            svc.flush("life")
            assert live_runs(ixdir) == [], where
            self._check(svc, live, where + " post-flush")
            # compaction must NOT un-stale or break the snapshot
            srv = ServingIndex(ixdir)
            _, total = srv.search_with_total({"match_all": {}}, k=1)
            assert total == len(live), where + " post-flush serving"
            # -- physical delete compaction every other cycle --------------
            if cycle % 2 == 1:
                compact_deletes(spark, ixdir)
                # the delete-epoch bump must invalidate old blocks
                with pytest.raises(ValueError, match="STALE"):
                    ServingIndex(ixdir)
                svc.snapshot("life")  # full rebuild path
                self._check(svc, live, where + " post-compact-deletes")
                srv = ServingIndex(ixdir)
                _, total = srv.search_with_total({"match_all": {}}, k=1)
                assert total == len(live), where + " post-cd serving"
        # final: one more compact + reload round-trips everything
        compact_runs(spark, ixdir)
        idx = load_index(spark, ixdir)
        from search_engine_spark.operators.delete import \
            load_index_with_deletes
        idx = load_index_with_deletes(spark, ixdir)
        n = idx.doc_stats.count()
        assert n == len(live)


class TestLifecycleWithReadd(TestLifecycleCycles):
    """Cycles that interleave delete → RE-ADD in both delete states: while
    the id is still tombstoned (the new run's generation out-survives the
    barrier — O(batch), no rewrite) and after the physical purge (append
    unmasks the docs_tombstones entry). The Python doc-set model stays
    the oracle at every step."""

    def test_cycles(self, spark, service):
        svc = service
        ixdir = svc.catalog._dir("life")
        live = set(range(20))
        next_id = 100
        for cycle in range(3):
            where = f"readd cycle {cycle}"
            batch = [{"doc_id": next_id + j,
                      "text": f"alpha shared c{cycle} tok{j % 7}",
                      "lang": "en"} for j in range(4)]
            assert svc.add_documents("life", batch)["addedCount"] == 4
            live |= {next_id + j for j in range(4)}
            next_id += 10
            svc.snapshot("life")
            victims = [min(live), max(live)]
            delete_docs(spark, ixdir, victims)
            live -= set(victims)
            self._check(svc, live, where + " post-delete")

            # revive victim 0 while STILL tombstoned -> the new run's
            # generation out-survives the barrier; victim 1 stays masked
            out = svc.add_documents("life", [
                {"doc_id": victims[0],
                 "text": f"alpha shared re{cycle} tok3", "lang": "en"}])
            assert out["addedCount"] == 1 and out["duplicateCount"] == 0, \
                where
            live.add(victims[0])
            self._check(svc, live, where + " post-readd-tombstoned")
            # the revival run isn't covered by the old snapshot ->
            # blocks must refuse (stale includes_runs)
            with pytest.raises(ValueError, match="STALE"):
                ServingIndex(ixdir)

            # revive victim 1 (still tombstone-masked) the same way
            out = svc.add_documents("life", [
                {"doc_id": victims[1],
                 "text": f"alpha shared re{cycle} tok4", "lang": "en"}])
            assert out["addedCount"] == 1 and out["duplicateCount"] == 0, \
                where
            live.add(victims[1])
            self._check(svc, live, where + " post-readd-purged")

            # refresh the snapshot: fast path serves the revived docs
            svc.snapshot("life")
            srv = ServingIndex(ixdir)
            _, total = srv.search_with_total({"match_all": {}}, k=1)
            assert total == len(live), where + " post-snapshot serving"
            res = svc.search("life", {"query": {"term": {
                "field": "text", "value": f"re{cycle}"}}, "size": 10})
            assert sorted(h["doc_id"] for h in res["hits"]) == \
                sorted(victims), where + " revived membership"
            assert res["_performance"].get("servedBy") == "blocks", where

            svc.flush("life")
            assert live_runs(ixdir) == [], where
            self._check(svc, live, where + " post-flush")
        # both query paths agree with the model at the end
        idx = load_index(spark, ixdir)
        from search_engine_spark.operators.delete import \
            load_index_with_deletes
        idx = load_index_with_deletes(spark, ixdir)
        assert idx.doc_stats.count() == len(live)


def test_concurrent_mutation_hammer(spark, tmp_path):
    """Searches racing the FULL mutation mix (append → snapshot → flush,
    repeatedly) over HTTP: every response is 200 and every total equals a
    state the index legitimately passed through."""
    import queue
    import urllib.request

    from search_engine_spark.server import SearchService, make_server

    docs = _mk_docs(spark, range(30))
    docs_path = str(tmp_path / "docs")
    docs.write.parquet(docs_path)
    svc = SearchService(spark, str(tmp_path / "root"))
    svc.create_index("ham", docs_path, fields={"text": "text"})
    svc.snapshot("ham")
    httpd = make_server(svc)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"

    def post(path, payload):
        req = urllib.request.Request(
            base + path, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        try:
            with urllib.request.urlopen(req) as r:
                return r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:  # pragma: no cover
            return e.code, json.loads(e.read())

    errors: "queue.Queue" = queue.Queue()
    valid_totals = {30 + 2 * k for k in range(0, 7)}  # 6 appends × 2 docs
    stop = threading.Event()

    def searcher():
        body = {"query": {"term": {"field": "text", "value": "alpha"}},
                "size": 1}
        while not stop.is_set():
            try:
                code, res = post("/search/ham", body)
                if code != 200:
                    errors.put(("status", code))
                elif res["total"] not in valid_totals:
                    errors.put(("total", res["total"]))
            except Exception as e:  # noqa: BLE001
                errors.put(("exc", repr(e)))

    threads = [threading.Thread(target=searcher) for _ in range(3)]
    for t in threads:
        t.start()
    try:
        nid = 500
        for k in range(6):
            code, res = post("/index/ham/documents", {"documents": [
                {"doc_id": nid, "text": "alpha shared hot tok1",
                 "lang": "en"},
                {"doc_id": nid + 1, "text": "alpha shared hot tok2",
                 "lang": "en"}]})
            assert code == 200 and res["addedCount"] == 2
            nid += 10
            code, _ = post("/index/ham/snapshot", {})
            assert code == 200
            if k % 2 == 1:
                code, _ = post("/index/ham/flush", {})
                assert code == 200
    finally:
        stop.set()
        for t in threads:
            t.join()
        httpd.shutdown()
    assert errors.empty(), list(errors.queue)[:5]
    # the end state is exact on both paths
    res = svc.search("ham", {"query": {"match_all": {}}, "size": 1})
    assert res["total"] == 42
