"""Multi-index catalog: named indices under one root directory.

The reference engine manages multiple named in-memory indices with a
``default`` index (SearchEngine.ts:98-116, createIndex/listIndexes/
deleteIndex via the REST layer) and discovers persisted ones by scanning
``./.data/*/global-metadata.json`` (StreamingPersistence.ts:101-279). The
Spark counterpart is a directory-per-index layout; discovery = scanning for
committed ``meta.json`` files. On a real deployment this maps 1:1 to an
Iceberg namespace with one table set per index.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from .operators.index_build import META, IndexConfig, write_index
from .plans.dsl import SparkSearchEngine

DEFAULT_INDEX = "default"


class IndexCatalog:
    """Named persisted indices under ``root``; lazy engine handles."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._engines: dict = {}

    def _dir(self, name: str) -> str:
        if not name or "/" in name or name.startswith("."):
            raise ValueError(f"invalid index name: {name!r}")
        return os.path.join(self.root, name)

    def create_index(self, name: str, docs: DataFrame,
                     config: IndexConfig | None = None,
                     overwrite: bool = False) -> dict:
        """Build + persist a named index from a docs DataFrame."""
        d = self._dir(name)
        if os.path.exists(os.path.join(d, META)) and not overwrite:
            raise ValueError(f"index {name!r} already exists")
        meta = write_index(docs, d, config or IndexConfig())
        self._engines.pop(name, None)
        return meta

    def list_indexes(self) -> list:
        """Names of committed indices (meta.json present), sorted."""
        if not os.path.isdir(self.root):
            return []
        return sorted(
            n for n in os.listdir(self.root)
            if os.path.isfile(os.path.join(self.root, n, META)))

    def index_exists(self, name: str) -> bool:
        return os.path.isfile(os.path.join(self._dir(name), META))

    def delete_index(self, name: str) -> bool:
        d = self._dir(name)
        self._engines.pop(name, None)
        if os.path.isdir(d):
            shutil.rmtree(d)
            return True
        return False

    def stats(self, name: str) -> dict:
        with open(os.path.join(self._dir(name), META)) as fh:
            return json.load(fh)

    def _delete_state(self, name: str) -> tuple:
        """Fingerprint of the index's mutable state: meta mtime + tombstone
        file listing + LSM manifest listing. The cached engine binds its
        tombstone anti-join and run union at load time, so any delete OR
        append must invalidate the cache — the manifest listing catches
        appends even on filesystems whose mtime granularity would make two
        meta rewrites within one tick look identical (each append commits
        a NEW manifest file, so the listing always changes)."""
        d = self._dir(name)
        parts: list = []
        meta_path = os.path.join(d, META)
        if os.path.isfile(meta_path):
            parts.append(os.path.getmtime(meta_path))
        tomb_dir = os.path.join(d, "tombstones")
        if os.path.isdir(tomb_dir):
            parts.append(tuple(sorted(os.listdir(tomb_dir))))
        # barrier tombstones are ONE file swapped in place via os.replace
        # (delete._rewrite_tombstones) — the name never changes, so its
        # identity is (mtime_ns, size), like the docs_tombstones mask
        from .operators.delete import TOMBSTONES_FILE
        tf = os.path.join(d, TOMBSTONES_FILE)
        if os.path.isfile(tf):
            st = os.stat(tf)
            parts.append(("tb", st.st_mtime_ns, st.st_size))
        # re-add lifecycle state: the docs_tombstones mask is rewritten by
        # compact_deletes (fold) and append_docs (unmask), and docs_runs
        # files are purged by compact_deletes — every rewrite must move
        # the fingerprint. The mask is a single file swapped via
        # os.replace (same name), so its identity is (mtime_ns, size);
        # the legacy dir layout contributes its listing.
        from .operators.delete import docs_tombstones_path
        dt = docs_tombstones_path(d)
        if dt is not None:
            if os.path.isfile(dt):
                st = os.stat(dt)
                parts.append(("dt", st.st_mtime_ns, st.st_size))
            else:
                parts.append(tuple(sorted(os.listdir(dt))))
        dr_dir = os.path.join(d, "docs_runs")
        if os.path.isdir(dr_dir):
            parts.append(tuple(sorted(
                os.path.join(r, f)[len(dr_dir):]
                for r, _, fs in os.walk(dr_dir) for f in fs)))
        from .operators.index_build import MANIFEST
        man_dir = os.path.join(d, MANIFEST)
        if os.path.isdir(man_dir):
            parts.append(tuple(sorted(os.listdir(man_dir))))
        return tuple(parts)

    def delete_docs(self, name: str, doc_ids: list) -> dict:
        """Tombstone docs in a named index; pops the cached engine so the
        next query sees the post-delete view (SearchEngine.ts:265-283)."""
        from .operators.delete import delete_docs
        meta = delete_docs(self.spark, self._dir(name), doc_ids)
        self._engines.pop(name, None)
        return meta

    def engine(self, docs: DataFrame, name: str = DEFAULT_INDEX,
               **engine_kwargs) -> SparkSearchEngine:
        """Search engine over a named index (tombstone-aware load). The
        cache is keyed on the delete-state fingerprint: out-of-band
        delete_docs() calls on the same index dir invalidate it."""
        state = self._delete_state(name)
        cached = self._engines.get(name)
        if cached is None or cached[0] != state:
            from .operators.delete import load_index_with_deletes
            idx = load_index_with_deletes(self.spark, self._dir(name))
            self._engines[name] = (
                state, SparkSearchEngine(idx, docs, **engine_kwargs))
        return self._engines[name][1]

    def search(self, docs: DataFrame, query, name: str = DEFAULT_INDEX,
               size: int = 10, from_: int = 0) -> DataFrame:
        return self.engine(docs, name).search(query, size=size, from_=from_)
