"""Second round-4 review batch (concurrency + replay edges):

1. a null id in an append batch must not crash the bucket-pruned dedup
   (sorted() over a None ds_bucket raised TypeError; null ids never
   match the anti-join key, so they are simply always "fresh");
2. consolidate_doc_values replaying a crashed-pass marker with ZERO
   delta files left must clear the marker and no-op, not hand
   spark.read.parquet() an empty path list forever;
3. consolidate_blocks on an index whose blocks table was never built
   must no-op like its doc-values twin, not FileNotFoundError;
4. maybe_auto_save must isolate per-index failures — one index whose
   snapshot keeps raising cannot starve the indexes after it;
5. the auto-persist pending counter is kept under the mutate lock:
   appends counted before a snapshot reads the manifest are exactly the
   appends it covers, so the post-snapshot reset loses nothing;
6. merge_stream_runs is a compaction: it must bump compaction_seq (and
   keep delete_epoch) instead of resetting lifecycle markers, keeping
   refresh_blocks' crash-replay journal key unique per compaction.
"""

from __future__ import annotations

import json
import os

import pytest

from search_engine_spark.operators.index_build import (IndexConfig,
                                                       load_index,
                                                       write_index)
from search_engine_spark.operators.lsm import append_docs, existing_ids_pruned
from search_engine_spark.operators.wand import write_blocks

CFG = dict(id_col="doc_id", fields={"text": "text"}, n_buckets=8)


def _docs(spark, lo, hi, text="alpha beta gamma"):
    return spark.createDataFrame([(i, text) for i in range(lo, hi)],
                                 "doc_id long, text string")


@pytest.fixture()
def built(spark, tmp_path):
    ixdir = str(tmp_path / "ix")
    write_index(_docs(spark, 0, 30), ixdir, IndexConfig(**CFG))
    return ixdir


class TestNullIdDedup:
    """xxhash64(NULL) is the seed hash (not null), so a null id prunes to
    one ordinary bucket; the anti-join on a null key matches nothing, so
    the doc is always 'fresh' — same as the unpruned full scan treated it.
    These pin that a null id neither crashes the pruned path nor dedups
    away real collisions sharing the batch."""

    def test_null_id_batch_does_not_crash_pruned_dedup(self, spark, built):
        batch = spark.createDataFrame(
            [(5, "alpha"), (None, "beta"), (100, "gamma")],
            "doc_id long, text string")
        ids = existing_ids_pruned(spark, built, batch, "doc_id")
        got = {r["doc_id"] for r in ids.collect()}
        assert 5 in got            # real collision still caught
        assert None not in got     # the corpus has no null ids
        assert 100 not in got
        # and the null-id doc survives the dedup anti-join as "fresh"
        fresh = batch.join(ids, "doc_id", "anti")
        texts = {r["text"] for r in fresh.collect()}
        assert "beta" in texts and "gamma" in texts and "alpha" not in texts

    def test_all_null_id_batch(self, spark, built):
        batch = spark.createDataFrame([(None, "x")],
                                      "doc_id long, text string")
        ids = existing_ids_pruned(spark, built, batch, "doc_id")
        # prunes to the seed bucket only — a subset of the base, none null
        got = {r["doc_id"] for r in ids.collect()}
        assert None not in got and got <= set(range(30))
        assert batch.join(ids, "doc_id", "anti").count() == 1


class TestConsolidateReplayEdges:
    def test_dv_marker_with_no_deltas_is_cleared(self, spark, built):
        from search_engine_spark.operators.doc_values import (
            check_doc_values_fresh, consolidate_doc_values,
            load_doc_values_meta, write_doc_values)
        write_doc_values(_docs(spark, 0, 30), built, ["text"])
        marker = os.path.join(built, "dv_consolidating.json")
        with open(marker, "w") as fh:
            json.dump({"seq": 3}, fh)
        res = consolidate_doc_values(spark, built, min_delta_files=2)
        assert res == {"merged_files": 0}
        assert not os.path.isfile(marker)
        # marker gone → freshness check no longer vetoes the sidecar
        assert check_doc_values_fresh(built, load_doc_values_meta(built))

    def test_consolidate_blocks_without_blocks_table(self, spark, built):
        from search_engine_spark.operators.wand import consolidate_blocks
        res = consolidate_blocks(spark, built, min_files=2)
        assert res == {"consolidated_buckets": [], "files_removed": 0}


class TestAutoPersistIsolation:
    @pytest.fixture()
    def service(self, spark, tmp_path):
        from search_engine_spark.server import SearchService
        root = str(tmp_path / "root")
        src = os.path.join(root, "src")
        _docs(spark, 0, 20).write.parquet(src)
        svc = SearchService(
            spark, root,
            auto_persist={"enabled": True, "save_on_add": False,
                          "batch_size": 1, "interval": 0.001})
        for name in ("a", "b"):
            svc.create_index(name, src, fields={"text": "text"})
            svc.snapshot(name)
        return svc

    def test_one_failing_index_does_not_starve_the_rest(self, service,
                                                        monkeypatch):
        service.add_documents("a", [{"doc_id": 100, "text": "omega"}])
        service.add_documents("b", [{"doc_id": 100, "text": "omega"}])
        real = service.snapshot

        def flaky(name):
            if name == "a":
                raise RuntimeError("injected: index a is damaged")
            return real(name)

        monkeypatch.setattr(service, "snapshot", flaky)
        # dict order puts "a" first — "b" must still be saved
        assert service.maybe_auto_save() == ["b"]
        assert service._auto_pending.get("b") == 0
        assert service._auto_pending.get("a") == 1  # retried next tick

    def test_snapshot_resets_only_covered_counts(self, service):
        service.add_documents("a", [{"doc_id": 101, "text": "psi"}])
        assert service._auto_pending.get("a") == 1
        service.snapshot("a")
        assert service._auto_pending.get("a") == 0
        # appends after the snapshot count afresh
        service.add_documents("a", [{"doc_id": 102, "text": "chi"}])
        assert service._auto_pending.get("a") == 1


class TestStreamMergeLifecycleMarkers:
    def test_merge_bumps_compaction_seq_and_keeps_delete_epoch(
            self, spark, tmp_path):
        ixdir = str(tmp_path / "sx")
        cfg = IndexConfig(**CFG)
        # runs-only index (the streaming shape: no base POSTINGS yet)
        append_docs(_docs(spark, 0, 10), ixdir, cfg)
        append_docs(_docs(spark, 10, 20), ixdir, cfg)
        meta_p = os.path.join(ixdir, "meta.json")
        with open(meta_p) as fh:
            meta = json.load(fh)
        assert "compaction_seq" not in meta
        meta["delete_epoch"] = 7  # simulate a pre-merge delete compaction
        with open(meta_p, "w") as fh:
            json.dump(meta, fh)

        from search_engine_spark.streaming.ingest import merge_stream_runs
        merged = merge_stream_runs(spark, ixdir, cfg)
        assert merged["total_docs"] == 20
        with open(meta_p) as fh:
            meta = json.load(fh)
        assert meta["compaction_seq"] == 1
        assert meta["delete_epoch"] == 7
        # blocks built after the merge serve the merged corpus
        write_blocks(load_index(spark, ixdir), ixdir)
        from search_engine_spark.serving import ServingIndex
        srv = ServingIndex(ixdir)
        assert srv.search_with_total({"match_all": {}}, k=1)[1] == 20
