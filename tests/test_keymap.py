"""String-key (url) lifecycle via the keymap surrogate mapping.

A url-keyed Common-Crawl-style corpus takes the same O(batch)
upsert/delete path as a long-keyed one: keys map to surrogate long ids
exactly once (persisted, crash-reconciled high-water mark), and the
numeric tombstone lifecycle runs underneath. Members checks compare
against a DuckDB oracle over the post-mutation corpus."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.delete import load_index_with_deletes
from search_engine_spark.operators.index_build import (IndexConfig,
                                                       write_index)
from search_engine_spark.operators.keymap import (build_keymap,
                                                  delete_by_key, map_keys,
                                                  resolve_keys,
                                                  upsert_by_key)

CFG = IndexConfig(id_col="doc_id", fields={"text": "text"}, n_buckets=4)


def _corpus(spark, n=40):
    return spark.createDataFrame(
        [(f"https://site{i % 5}.test/p{i}",
          f"alpha common body{i} " + ("rare " if i % 7 == 0 else ""))
         for i in range(n)],
        "url string, text string")


def _members(spark, ixdir, term):
    """Live member KEYS holding ``term`` — via the index + keymap."""
    idx = load_index_with_deletes(spark, ixdir)
    ids = idx.postings.where((F.col("field") == "text")
                             & (F.col("term") == term)).select("doc_id")
    km = spark.read.parquet(
        *[os.path.join(ixdir, "keymap", c)
          for c in sorted(os.listdir(os.path.join(ixdir, "keymap")))
          if c.startswith("chunk-")])
    return sorted(r["key"] for r in
                  ids.join(km, "doc_id").select("key").collect())


def test_build_and_stable_mapping(spark, tmp_path):
    d = str(tmp_path / "ix")
    os.makedirs(d)
    docs = _corpus(spark)
    mapped = build_keymap(docs, d, key_col="url")
    assert mapped.count() == 40
    ids = {r["url"]: r["doc_id"] for r in mapped.collect()}
    assert sorted(ids.values()) == list(range(40))  # dense, key-ordered
    # re-mapping the same keys returns the SAME ids, assigns nothing new
    again = {r["url"]: r["doc_id"]
             for r in map_keys(docs, d, key_col="url").collect()}
    assert again == ids
    # a batch with 3 new keys extends from the high-water mark
    more = spark.createDataFrame(
        [(f"https://new.test/{i}", "fresh body") for i in range(3)],
        "url string, text string")
    m2 = map_keys(more, d, key_col="url")
    assert sorted(r["doc_id"] for r in m2.collect()) == [40, 41, 42]


def test_hwm_survives_meta_loss(spark, tmp_path):
    """Chunks are the truth: losing keymap_meta.json (crash between
    chunk rename and meta write) must not double-assign ids."""
    d = str(tmp_path / "ix")
    os.makedirs(d)
    build_keymap(_corpus(spark), d, key_col="url")
    os.remove(os.path.join(d, "keymap_meta.json"))
    more = spark.createDataFrame([("https://x.test/1", "b")],
                                 "url string, text string")
    m = map_keys(more, d, key_col="url").collect()
    assert m[0]["doc_id"] == 40


def test_string_key_upsert_delete_members_oracle(spark, tmp_path):
    """The VERDICT item-5 contract: upsert_docs/delete_docs on a
    url-keyed corpus, members hash-matched against a DuckDB rebuild of
    the post-mutation corpus."""
    d = str(tmp_path / "ix")
    os.makedirs(d)
    docs = _corpus(spark)
    mapped = build_keymap(docs, d, key_col="url")
    write_index(mapped, d, CFG)

    # upsert: re-crawl of every site0 page changes its body to carry
    # 'updated'; one brand-new url arrives in the same batch
    upd = docs.where(F.col("url").startswith("https://site0")) \
        .withColumn("text", F.concat(F.col("text"), F.lit(" updated")))
    new = spark.createDataFrame(
        [("https://site9.test/new", "alpha updated newcomer")],
        "url string, text string")
    out = upsert_by_key(upd.unionByName(new), d, CFG, key_col="url",
                        current=mapped)
    assert out["replaced"] == 8 and out["added"] == 1

    # delete: drop every site1 page by url
    meta = delete_by_key(spark, d, [f"https://site1.test/p{i}"
                                    for i in range(1, 40, 5)])
    assert meta["total_docs"] == 41 - 8

    got = _members(spark, d, "updated")
    # oracle: reproduce the post-mutation corpus in SQL
    con = duckdb.connect()
    rows = [(r["url"], r["text"]) for r in docs.collect()]
    con.execute("create table corpus(url varchar, text varchar)")
    con.executemany("insert into corpus values (?, ?)", rows)
    want = [r[0] for r in con.execute("""
        with mutated as (
          select url, text || ' updated' as text from corpus
          where url like 'https://site0%'
          union all
          select url, text from corpus where url not like 'https://site0%'
          union all
          select 'https://site9.test/new', 'alpha updated newcomer'
        )
        select url from mutated
        where url not like 'https://site1%'
          and list_contains(string_split(text, ' '), 'updated')
        order by url
    """).fetchall()]
    assert got == want and len(got) == 9

    # the re-crawled urls kept their surrogate ids (no remap on upsert)
    keys = spark.createDataFrame(
        [("https://site0.test/p0",)], "url string")
    rid = resolve_keys(spark, d, keys, key_col="url").collect()
    orig = {r["url"]: r["doc_id"] for r in mapped.collect()}
    assert rid[0]["doc_id"] == orig["https://site0.test/p0"]


def test_delete_unknown_key_is_noop(spark, tmp_path):
    d = str(tmp_path / "ix")
    os.makedirs(d)
    mapped = build_keymap(_corpus(spark), d, key_col="url")
    write_index(mapped, d, CFG)
    meta = delete_by_key(spark, d, ["https://never.seen/x"])
    assert meta["total_docs"] == 40

def test_keyed_delete_then_recrawl_revives(spark, tmp_path):
    """A url deleted by key revives when the page is re-crawled — the
    numeric barrier machinery under the mapping (re-add parity)."""
    d = str(tmp_path / "ix")
    os.makedirs(d)
    docs = _corpus(spark, 12)
    mapped = build_keymap(docs, d, key_col="url")
    write_index(mapped, d, CFG)
    url = "https://site2.test/p2"
    delete_by_key(spark, d, [url])
    assert url not in _members(spark, d, "alpha")
    orig = {r["url"]: r["doc_id"] for r in mapped.collect()}
    recrawl = spark.createDataFrame([(url, "alpha revived body")],
                                    "url string, text string")
    out = upsert_by_key(recrawl, d, CFG, key_col="url")
    assert out["added"] + out["replaced"] == 1
    assert url in _members(spark, d, "revived")
    # same surrogate id as before the delete
    rid = resolve_keys(
        spark, d, spark.createDataFrame([(url,)], "url string"),
        key_col="url").collect()[0]["doc_id"]
    assert rid == orig[url]


def test_keymap_random_sequences_invariants(spark, tmp_path, monkeypatch):
    """Randomized batches with overlapping keys: the map stays a
    BIJECTION, assigned ids stay dense 0..n-1, existing keys keep their
    ids across any batch order, and a meta loss (crash) between batches
    never double-assigns. The threshold is lowered so batches randomly
    land on BOTH assignment paths (key-order sort and distributed
    per-bucket) — the invariants must hold across the mix."""
    import random
    from search_engine_spark.operators import keymap as km
    monkeypatch.setattr(km, "KEY_ORDER_ASSIGN_MAX", 15)
    rng = random.Random(7)
    d = str(tmp_path / "ix")
    os.makedirs(d)
    universe = [f"https://u.test/{i}" for i in range(120)]
    seen: dict[str, int] = {}
    first = True
    for step in range(8):
        batch_keys = rng.sample(universe, rng.randint(1, 40))
        batch = spark.createDataFrame([(k, "body") for k in batch_keys],
                                      "url string, text string")
        if first:
            mapped = build_keymap(batch, d, key_col="url")
            first = False
        else:
            if step == 4:  # crash: lose the high-water-mark cache
                os.remove(os.path.join(d, "keymap_meta.json"))
            mapped = map_keys(batch, d, key_col="url")
        got = {r["url"]: r["doc_id"] for r in mapped.collect()}
        assert set(got) == set(batch_keys)
        for k, i in got.items():
            if k in seen:
                assert seen[k] == i, (k, seen[k], i)
            else:
                seen[k] = i
        ids = sorted(seen.values())
        assert ids == list(range(len(seen)))  # dense, no gaps, no dupes


def test_consolidate_keymap_bounds_chunks(spark, tmp_path):
    """Per-batch chunks fold into one; mappings unchanged; a crash that
    leaves duplicate rows across chunks is harmless (resolve dedupes)."""
    import shutil
    from search_engine_spark.operators.keymap import (_chunks,
                                                      consolidate_keymap)
    d = str(tmp_path / "ix")
    os.makedirs(d)
    all_keys = []
    for b in range(9):
        keys = [f"https://b{b}.test/{i}" for i in range(4)]
        all_keys += keys
        batch = spark.createDataFrame([(k, "body") for k in keys],
                                      "url string, text string")
        if b == 0:
            build_keymap(batch, d, key_col="url")
        else:
            map_keys(batch, d, key_col="url")
    assert len(_chunks(d)) == 9
    before = {r["key"]: r["doc_id"] for r in
              resolve_keys(spark, d,
                           spark.createDataFrame([(k,) for k in all_keys],
                                                 "url string"),
                           key_col="url").collect()}
    out = consolidate_keymap(spark, d, min_chunks=4)
    assert out["folded"] == 9 and len(_chunks(d)) == 1
    after = {r["key"]: r["doc_id"] for r in
             resolve_keys(spark, d,
                          spark.createDataFrame([(k,) for k in all_keys],
                                                "url string"),
                          key_col="url").collect()}
    assert after == before and len(after) == 36
    # simulate the consolidation crash: duplicate a chunk (same rows in
    # two files) — resolve must still return one row per key, and new
    # assignments must continue from the true high-water mark
    src = _chunks(d)[0]
    shutil.copytree(src, os.path.join(d, "keymap", "chunk-00099"))
    dup = resolve_keys(spark, d,
                       spark.createDataFrame([(all_keys[0],)],
                                             "url string"),
                       key_col="url").collect()
    assert len(dup) == 1
    more = spark.createDataFrame([("https://fresh.test/1", "b")],
                                 "url string, text string")
    m = map_keys(more, d, key_col="url").collect()
    assert m[0]["doc_id"] == 36


def test_null_keys_rejected(spark, tmp_path):
    """A NULL natural key has no identity — map_keys must fail loudly,
    not silently drop the row via the inner join."""
    d = str(tmp_path / "ix")
    os.makedirs(d)
    docs = spark.createDataFrame(
        [("https://a.test/1", "body"), (None, "orphan body")],
        "url string, text string")
    with pytest.raises(ValueError, match="NULL keys"):
        build_keymap(docs, d, key_col="url")


def test_build_idempotent_over_existing_map(spark, tmp_path):
    """build_keymap over existing chunks (a resumed --chunks build
    re-running it) extends via map_keys — same ids back, no meta reset,
    and a later batch still assigns from the true high-water mark."""
    d = str(tmp_path / "ix")
    os.makedirs(d)
    first = {r["url"]: r["doc_id"]
             for r in build_keymap(_corpus(spark), d, key_col="url")
             .collect()}
    again = {r["url"]: r["doc_id"]
             for r in build_keymap(_corpus(spark), d, key_col="url")
             .collect()}
    assert again == first
    more = spark.createDataFrame([("https://resumed.test/1", "b")],
                                 "url string, text string")
    m = map_keys(more, d, key_col="url").collect()
    assert m[0]["doc_id"] == 40


def test_jobs_keyed_build_and_upsert(spark, tmp_path, capsys):
    """spark-submit story end to end: build_index.py --key-col builds a
    url-keyed index with a persisted keymap; append_docs.py --key-col
    upserts a re-crawl batch by key."""
    import importlib
    import json as _json
    import sys
    sys.path.insert(0, "/root/repo")
    bi = importlib.import_module("jobs.build_index")
    ad = importlib.import_module("jobs.append_docs")

    src = str(tmp_path / "pages")
    ix = str(tmp_path / "ix")
    spark.createDataFrame(
        [(f"https://j.test/{i}", f"alpha body{i}") for i in range(20)],
        "url string, text string").write.parquet(src)
    bi.main(["--input", src, "--index", ix, "--fields", "text:text",
             "--key-col", "url", "--buckets", "4"])
    batch = str(tmp_path / "batch")
    spark.createDataFrame(
        [("https://j.test/5", "alpha freshcopy"),
         ("https://j.test/new", "alpha newdoc")],
        "url string, text string").write.parquet(batch)
    capsys.readouterr()
    ad.main(["--input", batch, "--index", ix, "--key-col", "url"])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"added": 1, "replaced": 1, "unchanged": 0}

    from search_engine_spark.operators.delete import load_index_with_deletes
    idx = load_index_with_deletes(spark, ix)
    assert idx.total_docs == 21
    assert idx.postings.where(F.col("term") == "freshcopy").count() == 1
    assert idx.postings.where(F.col("term") == "body5").count() == 0


def test_distributed_assignment_bijection(spark, tmp_path, monkeypatch):
    """Above KEY_ORDER_ASSIGN_MAX the assignment switches to the
    per-bucket distributed path: ids must stay a dense bijection from
    the high-water mark, stable on re-resolve, and later small batches
    continue from the true mark."""
    from search_engine_spark.operators import keymap as km
    monkeypatch.setattr(km, "KEY_ORDER_ASSIGN_MAX", 10)
    d = str(tmp_path / "ix")
    os.makedirs(d)
    docs = spark.createDataFrame(
        [(f"https://big.test/{i}", "b") for i in range(57)],
        "url string, text string")
    mapped = {r["url"]: r["doc_id"]
              for r in build_keymap(docs, d, key_col="url").collect()}
    assert sorted(mapped.values()) == list(range(57))  # dense bijection
    again = {r["url"]: r["doc_id"]
             for r in map_keys(docs, d, key_col="url").collect()}
    assert again == mapped  # stable: resolve, never reassign
    # a later small batch (key-order path) extends from the mark
    more = spark.createDataFrame([("https://big.test/extra", "b")],
                                 "url string, text string")
    assert map_keys(more, d, key_col="url").collect()[0]["doc_id"] == 57


def test_bulk_resolve_shuffle_join_path(spark, tmp_path, monkeypatch):
    """Above BROADCAST_KEYS_MAX resolve_keys switches to the plain
    shuffle join: same rows back, no broadcast of the batch."""
    from search_engine_spark.operators import keymap as km
    d = str(tmp_path / "ix")
    os.makedirs(d)
    docs = _corpus(spark)
    build_keymap(docs, d, key_col="url")
    probe = docs.select("url")
    small = {(r["key"], r["doc_id"]) for r in
             resolve_keys(spark, d, probe, key_col="url").collect()}
    monkeypatch.setattr(km, "BROADCAST_KEYS_MAX", 5)
    bulk = {(r["key"], r["doc_id"]) for r in
            resolve_keys(spark, d, probe, key_col="url").collect()}
    assert bulk == small and len(bulk) == 40
