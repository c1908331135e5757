"""Checkpoint-resumable build: kill after M of N chunks, resume, final index
must equal the single-shot build (SURVEY §5.2 item 5, north_rule resume)."""

import pytest

from search_engine_spark.operators.index_build import (IndexConfig,
                                                       build_index_resumable,
                                                       completed_chunks,
                                                       load_index,
                                                       write_index)
from search_engine_spark.sources.synth import synth_pages


@pytest.fixture(scope="module")
def pages(spark):
    return synth_pages(spark, 400).cache()


CFG = dict(id_col="doc_id", fields={"text": "text"}, n_buckets=4)


def _postings_set(ix):
    return {(r["field"], r["term"], r["doc_id"], r["tf"])
            for r in ix.postings.select("field", "term", "doc_id", "tf").collect()}


def test_kill_and_resume_equals_single_shot(tmp_path, spark, pages):
    single = str(tmp_path / "single")
    write_index(pages, single, IndexConfig(**CFG))

    resumable = str(tmp_path / "resumable")
    with pytest.raises(RuntimeError, match="injected failure"):
        build_index_resumable(pages, resumable, IndexConfig(**CFG),
                              n_chunks=4, fail_after_chunk=1)
    done = completed_chunks(resumable)
    assert done == {0, 1}  # chunks 0..1 committed before the crash

    meta = build_index_resumable(pages, resumable, IndexConfig(**CFG), n_chunks=4)
    assert completed_chunks(resumable) == {0, 1, 2, 3}

    a = load_index(spark, single)
    b = load_index(spark, resumable)
    assert a.total_docs == b.total_docs == meta["total_docs"]
    assert abs(a.avg_dl - b.avg_dl) < 1e-12
    assert _postings_set(a) == _postings_set(b)


def test_resume_skips_committed_chunks(tmp_path, spark, pages):
    d = str(tmp_path / "skip")
    with pytest.raises(RuntimeError):
        build_index_resumable(pages, d, IndexConfig(**CFG),
                              n_chunks=4, fail_after_chunk=2)
    import json
    import os
    # tamper a committed chunk's manifest mtime marker to prove it is not
    # rebuilt: record run seconds, resume, compare manifests unchanged
    mdir = os.path.join(d, "build_manifest")
    before = {f: json.load(open(os.path.join(mdir, f)))
              for f in os.listdir(mdir)}
    build_index_resumable(pages, d, IndexConfig(**CFG), n_chunks=4)
    after = {f: json.load(open(os.path.join(mdir, f)))
             for f in before}
    for f in before:
        assert before[f] == after[f]  # committed manifests untouched
