"""Regression tests for the round-3 self-review fixes.

Covers: synonym lookup by SURFACE form in the _match path on stemmed
indexes, analyzers surviving build_index_resumable meta, O_EXCL append-id
reservation (no concurrent-append collisions), compact_runs reclaiming
folded run dirs + replay idempotence, delete_docs validating the index
before writing tombstones, ProfileStore.compact crash-debris handling,
serving phrase field='*' resolution, and uint64 phrase keys (doc ids past
2^31 and past 2^32).
"""

from __future__ import annotations

import json
import os
import shutil
import threading

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.index_build import (MANIFEST, META,
                                                       IndexConfig,
                                                       build_index,
                                                       build_index_resumable,
                                                       load_index,
                                                       write_index)
from search_engine_spark.operators.lsm import (append_docs, compact_runs,
                                               live_runs)
from search_engine_spark.plans.dsl import SparkSearchEngine

CFG = dict(id_col="doc_id", fields={"text": "text"}, n_buckets=8)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


# ---------------------------------------------------------------- synonyms

class TestSynonymSurfaceFormOnStemmedIndex:
    def test_match_expands_surface_synonym(self, spark):
        docs = _docs(spark, [(1, "he was running fast", "en"),
                             (2, "she went jogging daily", "en"),
                             (3, "nothing relevant here", "en")])
        cfg = IndexConfig(stem_lang="en", **CFG)
        idx = build_index(docs, cfg)
        eng = SparkSearchEngine(idx, docs,
                                synonyms={"running": ["jogging"]})
        got = sorted(r["doc_id"] for r in eng.candidates(
            {"match": {"field": "text", "value": "running"}}).collect())
        # surface form 'running' must hit both its own stem ('run') and
        # the synonym's stem ('jog') — the lookup key is the SURFACE form
        assert got == [1, 2]

    def test_term_path_unchanged(self, spark):
        docs = _docs(spark, [(1, "running shoes", "en"),
                             (2, "jogging gear", "en")])
        cfg = IndexConfig(stem_lang="en", **CFG)
        idx = build_index(docs, cfg)
        eng = SparkSearchEngine(idx, docs,
                                synonyms={"running": ["jogging"]})
        got = sorted(r["doc_id"] for r in eng.candidates(
            {"term": {"field": "text", "value": "running"}}).collect())
        assert got == [1, 2]


# ------------------------------------------------------- resumable meta

def test_resumable_meta_keeps_analyzers(spark, tmp_path):
    docs = _docs(spark, [(i, f"alpha beta doc{i}", "en") for i in range(12)])
    ixdir = str(tmp_path / "ix")
    cfg = IndexConfig(analyzers={"text": "whitespace"}, **CFG)
    build_index_resumable(docs, ixdir, cfg, n_chunks=2)
    idx = load_index(spark, ixdir)
    assert idx.config.analyzers == {"text": "whitespace"}


# ------------------------------------------------------ append reservation

class TestAppendReservation:
    def test_reserved_placeholder_is_skipped(self, spark, tmp_path):
        ixdir = str(tmp_path / "ix")
        write_index(_docs(spark, [(1, "alpha", "en")]), ixdir,
                    IndexConfig(**CFG))
        mdir = os.path.join(ixdir, MANIFEST)
        os.makedirs(mdir, exist_ok=True)
        # an EMPTY reservation file (crash between create and write) must
        # neither break the manifest scan nor have its id reused
        open(os.path.join(mdir, "add-00000.json"), "w").close()
        entry = append_docs(_docs(spark, [(2, "beta", "en")]), ixdir,
                            IndexConfig(**CFG))
        assert entry["lineage"]["add_id"] == 1
        assert os.path.isfile(os.path.join(mdir, "add-00001.json"))
        # the crashed reservation is still not served
        assert all(e["lineage"]["add_id"] != 0 for e in live_runs(ixdir))

    def test_concurrent_appends_get_distinct_runs(self, spark, tmp_path):
        ixdir = str(tmp_path / "ix")
        write_index(_docs(spark, [(1, "alpha", "en")]), ixdir,
                    IndexConfig(**CFG))
        results, errors = [], []

        def add(lo):
            try:
                results.append(append_docs(
                    _docs(spark, [(lo + j, f"word{lo + j}", "en")
                                  for j in range(3)]),
                    ixdir, IndexConfig(**CFG)))
            except Exception as e:  # pragma: no cover
                errors.append(e)

        ts = [threading.Thread(target=add, args=(100,)),
              threading.Thread(target=add, args=(200,))]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errors
        ids = sorted(r["lineage"]["add_id"] for r in results)
        assert len(set(ids)) == 2, f"colliding add ids: {ids}"
        idx = load_index(spark, ixdir)
        assert idx.doc_stats.count() == 7  # 1 base + 3 + 3, none lost


# ------------------------------------------------- compaction lifecycle

class TestCompactLifecycle:
    def test_compact_reclaims_run_dirs(self, spark, tmp_path):
        ixdir = str(tmp_path / "ix")
        write_index(_docs(spark, [(i, f"alpha common{i % 3}", "en")
                                  for i in range(10)]),
                    ixdir, IndexConfig(**CFG))
        append_docs(_docs(spark, [(100 + i, f"beta common{i % 3}", "en")
                                  for i in range(5)]),
                    ixdir, IndexConfig(**CFG))
        runs = live_runs(ixdir)
        assert runs
        run_paths = [e["run_path"] for e in runs]
        compact_runs(spark, ixdir)
        for p in run_paths:
            assert not os.path.isdir(p), f"leaked postings run: {p}"
        assert live_runs(ixdir) == []
        idx = load_index(spark, ixdir)
        eng = SparkSearchEngine(idx, _docs(spark, [(0, "x", "en")]))
        got = eng.candidates(
            {"term": {"field": "text", "value": "beta"}}).count()
        assert got == 5

    def test_compact_replay_is_idempotent(self, spark, tmp_path):
        """Crash window: bucket overwrite + term_stats swap committed but
        the manifest flip (mark_compacted) lost — a replayed compaction
        must not double postings or dfs."""
        ixdir = str(tmp_path / "ix")
        write_index(_docs(spark, [(i, f"alpha common{i % 3}", "en")
                                  for i in range(10)]),
                    ixdir, IndexConfig(**CFG))
        append_docs(_docs(spark, [(100 + i, f"beta common{i % 3}", "en")
                                  for i in range(5)]),
                    ixdir, IndexConfig(**CFG))
        [entry] = live_runs(ixdir)
        backup = str(tmp_path / "run_backup")
        shutil.copytree(entry["run_path"], backup)
        compact_runs(spark, ixdir)

        def snap():
            idx = load_index(spark, ixdir)
            post = idx.postings.count()
            dfs = sorted(
                (r["field"], r["term"], r["df"])
                for r in idx.term_stats.select("field", "term", "df")
                .collect())
            return post, dfs, idx.total_docs

        before = snap()
        # simulate the crash replay: run dir restored, manifest entry
        # flipped back to committed (doc_stats run stays promoted — its
        # dir is gone, which the replay must tolerate)
        shutil.copytree(backup, entry["run_path"])
        mdir = os.path.join(ixdir, MANIFEST)
        for name in os.listdir(mdir):
            p = os.path.join(mdir, name)
            with open(p) as fh:
                e = json.load(fh)
            if e.get("chunk") == entry["chunk"]:
                e["status"] = "committed"
                with open(p, "w") as fh:
                    json.dump(e, fh)
        compact_runs(spark, ixdir)
        assert snap() == before


# -------------------------------------------------------- delete guard

def test_delete_on_missing_index_raises_before_tombstoning(spark, tmp_path):
    from search_engine_spark.operators.delete import TOMBSTONES, delete_docs
    bogus = str(tmp_path / "not_an_index")
    os.makedirs(bogus)
    with pytest.raises(FileNotFoundError):
        delete_docs(spark, bogus, [1, 2])
    assert not os.path.isdir(os.path.join(bogus, TOMBSTONES))


# ------------------------------------------------- profile store compact

def test_profile_compact_cleans_debris_and_preserves_counts(spark, tmp_path):
    from search_engine_spark.operators.personalization import ProfileStore
    root = str(tmp_path / "profiles")
    st = ProfileStore(spark, root)
    for _ in range(3):
        st.add_event("u1", 7)
    st.add_event("u1", 9)
    bucket = None
    for name in os.listdir(root):
        if name.startswith("ubucket="):
            bucket = os.path.join(root, name)
            break
    assert bucket
    # crash debris from an interrupted old-style fold
    debris = bucket + ".compact"
    os.makedirs(debris, exist_ok=True)
    open(os.path.join(debris, "part-junk.parquet"), "w").close()
    st.compact()
    assert not os.path.isdir(debris)
    assert st.get_boost("u1", 7) == 3
    assert st.get_boost("u1", 9) == 1
    st.compact()  # idempotent
    assert st.get_boost("u1", 7) == 3


# ---------------------------------------------------- serving phrase '*'

class TestServingPhraseFields:
    @pytest.fixture(scope="class")
    def single_field(self, spark, tmp_path_factory):
        from search_engine_spark.operators.wand import write_blocks
        from search_engine_spark.serving import ServingIndex
        ixdir = str(tmp_path_factory.mktemp("srvstar") / "ix")
        docs = _docs(spark, [(1, "quick brown fox", "en"),
                             (2, "brown quick fox", "en"),
                             (3, "quick red fox", "en")])
        write_index(docs, ixdir, IndexConfig(**CFG))
        write_blocks(load_index(spark, ixdir), ixdir)
        return ServingIndex(ixdir), docs

    def test_star_field_resolves(self, single_field):
        srv, _ = single_field
        got = srv.search({"match_phrase": {"field": "*",
                                           "value": "quick brown"}}, k=10)
        assert [d for d, _ in got] == [1]

    def test_multi_field_star_merges_positions(self, spark, tmp_path):
        # '*' over a multi-field index is now SERVED (was a ValueError):
        # positions union across fields like the DSL's per-doc collect_set,
        # so 'brown slow' spans text→body via the merged position lists
        from search_engine_spark.operators.wand import write_blocks
        from search_engine_spark.plans.dsl import SparkSearchEngine
        from search_engine_spark.serving import ServingIndex
        ixdir = str(tmp_path / "ix")
        docs = spark.createDataFrame(
            [(1, "quick brown", "slow green", "en"),
             (2, "quick red", "slow green", "en")],
            "doc_id long, text string, body string, lang string")
        cfg = IndexConfig(id_col="doc_id",
                          fields={"text": "text", "body": "text"},
                          n_buckets=8)
        write_index(docs, ixdir, cfg)
        idx = load_index(spark, ixdir)
        write_blocks(idx, ixdir)
        srv = ServingIndex(ixdir)
        eng = SparkSearchEngine(idx, docs)
        for value in ("quick brown", "brown slow", "quick slow"):
            q = {"match_phrase": {"field": "*", "value": value}}
            want = sorted(r["doc_id"]
                          for r in eng.candidates(q).collect())
            assert srv.phrase("*", value, members_only=True) == want, value


# -------------------------------------------------- large-doc-id phrases

class TestPhraseLargeDocIds:
    def _serve(self, spark, tmp_path, base):
        from search_engine_spark.operators.wand import write_blocks
        from search_engine_spark.serving import ServingIndex
        ixdir = str(tmp_path / "ix")
        docs = _docs(spark, [(base + 1, "quick brown fox", "en"),
                             (base + 2, "brown quick fox", "en"),
                             (base + 3, "quick brown shoe", "en")])
        write_index(docs, ixdir, IndexConfig(**CFG))
        write_blocks(load_index(spark, ixdir), ixdir)
        return ServingIndex(ixdir)

    def test_ids_past_2_31_vectorized(self, spark, tmp_path):
        base = (1 << 31) + 5  # past the old 31-bit cap, inside uint64 keys
        srv = self._serve(spark, tmp_path, base)
        got = srv.phrase("text", "quick brown", k=10)
        assert sorted(d for d, _ in got) == [base + 1, base + 3]

    def test_ids_past_2_32_greedy_fallback(self, spark, tmp_path):
        base = (1 << 33) + 5  # beyond key packing: per-doc greedy path
        srv = self._serve(spark, tmp_path, base)
        got = srv.phrase("text", "quick brown", k=10)
        assert sorted(d for d, _ in got) == [base + 1, base + 3]


# ------------------------------------------------ sorted dictionary files

def test_term_stats_files_are_term_sorted(spark, tmp_path):
    """Dictionary files must be (field, term)-sorted so parquet row-group
    min/max stats give prefix/wildcard scans tight lexicographic slices."""
    import pyarrow.parquet as pq
    from search_engine_spark.operators.index_build import TERM_STATS
    docs = _docs(spark, [(i, " ".join(f"w{(i * 7 + j) % 97}"
                                      for j in range(20)), "en")
                         for i in range(200)])
    ixdir = str(tmp_path / "ix")
    write_index(docs, ixdir, IndexConfig(**CFG))
    ts_dir = os.path.join(ixdir, TERM_STATS)
    checked = 0
    for name in os.listdir(ts_dir):
        if not name.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(ts_dir, name),
                          columns=["field", "term"])
        pairs = list(zip(t.column("field").to_pylist(),
                         t.column("term").to_pylist()))
        assert pairs == sorted(pairs), f"unsorted dictionary file {name}"
        checked += 1
    assert checked > 0
