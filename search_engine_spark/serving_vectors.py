"""Millisecond ANN serving over the persisted vector artifacts.

`operators/similarity.write_vectors` persists the embedding table
partitioned by hyperplane-LSH ``bucket=N/`` and/or IVF ``cell=N/`` dirs
plus the parameters that define the partitioning. The Spark readers
(`lsh_topk_persisted` / `ivf_topk_persisted`) probe driver-side and push
partition predicates; this module is their Spark-free twin — the vector
counterpart of serving.ServingIndex: a serving node needs pyarrow + numpy
+ the artifact dir, reads ONLY the probed partitions, and answers cosine
top-k in milliseconds.

BITWISE parity with the Spark path: similarity.dot is a LEFT FOLD in
index order over float32→double products (each product is exact — 24-bit
× 24-bit fits a 53-bit mantissa), which ``np.add.accumulate`` reproduces
exactly; division, sqrt, and the portable round6 are the same IEEE754
ops, so scores here equal the DataFrame path's bit for bit (tested).

Per-query work is O(vectors in the probed partitions) — the same
pruning property the cluster path scales on.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow.dataset as pads

from .functions.portable import SCALE
from .operators.similarity import (ANN_PARAMS, VECTORS, load_vector_params,
                                   probed_cells, query_bucket)


def _fold_sum(p: np.ndarray) -> np.ndarray:
    """Row-wise left-fold Σ p[i] — bitwise-identical to the Spark
    F.aggregate fold (the products fed in are float32-derived doubles,
    hence exact, so only the accumulation order matters and accumulate
    is sequential by definition)."""
    return np.add.accumulate(p, axis=1)[:, -1]


class ServingVectors:
    """Cosine top-k over the persisted LSH/IVF vector table, no Spark."""

    def __init__(self, out_dir: str):
        from collections import OrderedDict
        import threading
        self.out_dir = out_dir
        if not os.path.isfile(os.path.join(out_dir, ANN_PARAMS)):
            raise FileNotFoundError(
                f"no ANN params at {out_dir} — run write_vectors() first")
        self.params = load_vector_params(out_dir)
        self._ds = pads.dataset(os.path.join(out_dir, VECTORS),
                                format="parquet", partitioning="hive")
        self._part_cache: "OrderedDict" = OrderedDict()
        self._cache_lock = threading.Lock()
        self._cache_bytes = 0
        #: byte-bounded (not count-bounded): a 1M×768 corpus has few big
        #: partitions — counting entries would never evict anything
        self.cache_max_bytes = 1 << 30

    def _load_part(self, col: str, val: int, d: int):
        """(ids, matrix) for ONE bucket/cell partition, decoded once and
        LRU-cached — repeat probes of Zipfian query traffic must not
        re-read parquet per query (measured 125-890 ms/query uncached at
        200k vectors vs ~ms from the cache)."""
        key = (col, int(val), d)  # d in the key: a wrong-dim query after
        # warmup must re-hit the dimension guard, not broadcast garbage
        with self._cache_lock:
            hit = self._part_cache.get(key)
            if hit is not None:
                self._part_cache.move_to_end(key)
                return hit
        tbl = self._ds.to_table(filter=pads.field(col) == val,
                                columns=["vec_id", "embedding"])
        ids = np.asarray(tbl.column("vec_id"), dtype=np.int64)
        if ids.size == 0:
            entry = (ids, np.zeros((0, d), dtype=np.float32))
        else:
            emb = tbl.column("embedding").combine_chunks()
            # flatten() honors list offsets/slices (raw .values would not);
            # kept float32 — the on-disk width — so the resident cache is
            # half the float64 working size (the fold casts per query,
            # exactly, since float32→double is lossless)
            flat = np.asarray(emb.flatten(), dtype=np.float32)
            if flat.size != ids.size * d:
                raise ValueError(
                    f"embedding dimension mismatch vs query (query d={d}, "
                    f"{flat.size} values over {ids.size} rows)")
            entry = (ids, flat.reshape(-1, d))
        with self._cache_lock:
            if key not in self._part_cache:
                self._cache_bytes += entry[0].nbytes + entry[1].nbytes
            self._part_cache[key] = entry
            self._part_cache.move_to_end(key)
            while (self._cache_bytes > self.cache_max_bytes
                   and len(self._part_cache) > 1):
                _, (ei, em) = self._part_cache.popitem(last=False)
                self._cache_bytes -= ei.nbytes + em.nbytes
        return entry

    def _topk(self, parts: list, query_vec: list, k: int,
              exclude_id: int | None) -> list:
        d = len(query_vec)
        loaded = [self._load_part(col, val, d) for col, val in parts]
        loaded = [(i, m) for i, m in loaded if i.size]
        if not loaded:
            return []
        if len(loaded) == 1:
            ids, m32 = loaded[0]
        else:
            ids = np.concatenate([i for i, _ in loaded])
            m32 = np.vstack([x for _, x in loaded])
        m = m32.astype(np.float64)  # lossless, matches Spark's array cast
        q = np.asarray(query_vec, dtype=np.float64)
        qn = np.sqrt(np.add.accumulate(q * q)[-1])
        cos = _fold_sum(m * q[None, :]) / (np.sqrt(_fold_sum(m * m)) * qn)
        cos = np.floor(cos * SCALE + 0.5) / SCALE  # portable round6 twin
        if exclude_id is not None:
            keep = ids != exclude_id
            ids, cos = ids[keep], cos[keep]
        # Spark orderBy(desc) treats NaN as GREATEST (a zero-norm vector's
        # 0/0 ranks first there); np.lexsort would sink NaN last — map it
        # to +inf for the sort key so both paths rank identically
        sort_cos = np.where(np.isnan(cos), np.inf, cos)
        order = np.lexsort((ids, -sort_cos))[:k]
        return [(int(ids[i]), float(cos[i])) for i in order]

    def lsh_topk(self, query_vec: list, k: int = 10,
                 exclude_id: int | None = None) -> list:
        """[(vec_id, cos)] from ONLY the query's hyperplane bucket
        (lsh_topk_persisted twin; bucket computed in pure Python)."""
        if not self.params.get("planes"):
            raise ValueError("artifact was written without LSH planes")
        qb = query_bucket(query_vec, self.params["planes"])
        return self._topk([("bucket", qb)], query_vec, k, exclude_id)

    def ivf_topk(self, query_vec: list, k: int = 10, n_probe: int = 2,
                 exclude_id: int | None = None) -> list:
        """[(vec_id, cos)] from the ``n_probe`` nearest IVF cells
        (ivf_topk_persisted twin)."""
        if not self.params.get("centroids"):
            raise ValueError("artifact was written without IVF centroids")
        cells = probed_cells(query_vec, self.params["centroids"], n_probe)
        return self._topk([("cell", c) for c in cells], query_vec, k,
                          exclude_id)
