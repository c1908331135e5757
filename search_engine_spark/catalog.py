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

    def engine(self, docs: DataFrame, name: str = DEFAULT_INDEX,
               **engine_kwargs) -> SparkSearchEngine:
        """Search engine over a named index (tombstone-aware load)."""
        if name not in self._engines:
            from .operators.delete import load_index_with_deletes
            idx = load_index_with_deletes(self.spark, self._dir(name))
            self._engines[name] = SparkSearchEngine(idx, docs, **engine_kwargs)
        return self._engines[name]

    def search(self, docs: DataFrame, query, name: str = DEFAULT_INDEX,
               size: int = 10, from_: int = 0) -> DataFrame:
        return self.engine(docs, name).search(query, size=size, from_=from_)
