"""Synonym management (SURVEY S6 / SynonymEngine parity).

Rebuilds the reference's SynonymEngine (domain/SynonymEngine.ts:27-73 load,
:95-120 add, :160-190 remove): a file-backed lowercased term → set-of-
synonyms map with add/get/has/remove/remove_key/clear/keys/size/stats and
JSON persistence. ``SparkSearchEngine`` accepts either a plain dict or a
SynonymEngine as its ``synonyms`` argument; multi-word synonym values are
analyzed and expanded as AND-of-tokens candidates (plans/dsl.py), which the
reference cannot do at all (its lookup is single-term only).

The map lives driver-side (synonym tables are tiny); expansion rides the
normal literal-pushdown path so a 100 TB index still reads only the
expanded terms' buckets.
"""

from __future__ import annotations

import json
import os


class SynonymEngine:
    """File-backed synonym map (SynonymEngine.ts parity)."""

    def __init__(self, file_path: str = "./synonyms.json",
                 auto_save: bool = True):
        if not file_path or not isinstance(file_path, str):
            raise ValueError("file_path must be a non-empty string")
        self.file_path = file_path
        self.auto_save = auto_save
        self._map: dict = {}
        self.load()

    # -- persistence --------------------------------------------------------

    def load(self) -> None:
        if not os.path.isfile(self.file_path):
            return
        try:
            with open(self.file_path) as fh:
                data = json.load(fh)
        except (OSError, json.JSONDecodeError):
            return  # continue with empty map, like the reference
        if not isinstance(data, dict):
            return
        self._map.clear()
        for key, values in data.items():
            if not isinstance(values, list):
                continue  # skip invalid entries (SynonymEngine.ts:55)
            vals = {str(v).lower() for v in values if isinstance(v, str)}
            if vals:
                self._map[str(key).lower()] = vals

    def save(self) -> None:
        if not self.auto_save:
            return
        with open(self.file_path, "w") as fh:
            json.dump({k: sorted(v) for k, v in sorted(self._map.items())},
                      fh, indent=2)

    # -- mutation ------------------------------------------------------------

    def add(self, key: str, value: str) -> None:
        if not key or not isinstance(key, str):
            raise ValueError("key must be a non-empty string")
        if not value or not isinstance(value, str):
            raise ValueError("value must be a non-empty string")
        self._map.setdefault(key.lower(), set()).add(value.lower())
        self.save()

    def remove(self, key: str, value: str) -> bool:
        if not key or not value:
            return False
        k = key.lower()
        vals = self._map.get(k)
        if vals is None or value.lower() not in vals:
            return False
        vals.remove(value.lower())
        if not vals:
            del self._map[k]
        self.save()
        return True

    def remove_key(self, key: str) -> bool:
        if not key or key.lower() not in self._map:
            return False
        del self._map[key.lower()]
        self.save()
        return True

    def clear(self) -> None:
        self._map.clear()
        self.save()

    # -- lookup --------------------------------------------------------------

    def get(self, key: str, default=()):  # dict-compatible signature
        if not key or not isinstance(key, str):
            return default
        vals = self._map.get(key.lower())
        return sorted(vals) if vals else default

    get_synonyms = get

    def has(self, key: str) -> bool:
        return bool(key) and isinstance(key, str) and key.lower() in self._map

    def is_enabled(self) -> bool:
        return bool(self._map)

    def keys(self) -> list:
        return sorted(self._map)

    def size(self) -> int:
        return len(self._map)

    def stats(self) -> dict:
        total = sum(len(v) for v in self._map.values())
        n = len(self._map)
        return {"total_keys": n, "total_synonyms": total,
                "average_synonyms_per_key": (total / n) if n else 0.0}
