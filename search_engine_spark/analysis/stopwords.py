"""Stopword management + auto-detection (SURVEY T12 / StopwordsManager).

Rebuilds the reference's StopwordsManager (infrastructure/
StopwordsManager.ts): a file-backed lowercased stopword set with
add/remove/has/clear and ``autoDetect`` — terms whose frequency reaches a
threshold become stopwords (StopwordsManager.ts:83-91, default threshold
0.5 meaning df/N ratio when fed document frequencies).

The Spark-native twin derives the detection input from the index's
``term_stats`` table instead of an in-memory frequency map:
``auto_stopwords`` is one column-pruned scan + a driver-side collect of the
(tiny) high-df tail — at 10^12 docs the candidate set is O(vocabulary above
threshold), a handful of rows. The detected set plugs into
``IndexConfig.stopwords`` for the next build, closing the loop the
reference closes in-process.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def auto_stopwords(term_stats: DataFrame, total_docs: int,
                   threshold: float = 0.5) -> DataFrame:
    """(term, df) of terms whose document-frequency ratio df/N >= threshold,
    over all fields (matching the reference's single frequency map). Sorted
    by term for determinism. A pure term_stats scan — no postings touched."""
    n = float(max(total_docs, 1))
    return (term_stats
            .groupBy("term").agg(F.max("df").alias("df"))
            .where(F.col("df").cast("double") / F.lit(n)
                   >= F.lit(float(threshold)))
            .select("term", "df")
            .orderBy("term"))


class StopwordsManager:
    """File-backed stopword set (StopwordsManager.ts parity)."""

    def __init__(self, file_path: str = "./stopwords.json",
                 threshold: float = 0.5, auto_save: bool = True):
        self.file_path = file_path
        self.threshold = threshold
        self.auto_save = auto_save
        self._words: set = set()
        self.load()

    def load(self) -> None:
        if os.path.isfile(self.file_path):
            try:
                with open(self.file_path) as fh:
                    content = fh.read()
                self._words.clear()
                if content.strip():
                    data = json.loads(content)
                    if isinstance(data, list):
                        self._words.update(str(w) for w in data)
            except (OSError, json.JSONDecodeError):
                self._words.clear()

    def save(self) -> None:
        if not self.auto_save:
            return
        try:
            with open(self.file_path, "w") as fh:
                json.dump(sorted(self._words), fh, indent=2)
        except OSError:
            pass

    def add(self, word: str) -> None:
        self._words.add(str(word).lower())
        self.save()

    def remove(self, word: str) -> bool:
        try:
            self._words.remove(str(word).lower())
        except KeyError:
            return False
        self.save()
        return True

    def has(self, word: str) -> bool:
        return str(word).lower() in self._words

    get = has  # reference aliases get() to membership

    def get_all(self) -> list:
        return sorted(self._words)

    def clear(self) -> None:
        self._words.clear()
        self.save()

    def size(self) -> int:
        return len(self._words)

    def auto_detect(self, term_stats: DataFrame, total_docs: int) -> list:
        """Detect + absorb high-df stopwords from a term_stats table.
        Returns the newly added terms (sorted)."""
        rows = auto_stopwords(term_stats, total_docs, self.threshold).collect()
        new = sorted(r["term"] for r in rows if r["term"] not in self._words)
        self._words.update(new)
        self.save()
        return new

    def as_config_tuple(self) -> tuple:
        """The shape IndexConfig.stopwords expects."""
        return tuple(sorted(self._words))
