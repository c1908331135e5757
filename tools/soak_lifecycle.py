"""Randomized model-checked lifecycle soak.

The deterministic hammer (tests/test_lsm_lifecycle.py) walks one fixed
interleaving of the LSM lifecycle; this tool draws RANDOM op sequences —
append / upsert / identical re-send / delete / re-add / snapshot / flush
/ compact_deletes / consolidate — against a Python doc-set model that is
the oracle at every step, so any interleaving bug in the run/tombstone/
generation machinery surfaces as a model divergence with the full op
trace attached.

Invariants asserted after EVERY op:
  - Spark/routed path: match_all total == |live model|
  - meta.json counters stay additively exact (total_docs, dl_sum)
  - the block snapshot either REFUSES to load (staleness guard) or
    serves the correct match_all total — never a wrong answer
  - sampled per-doc generation tokens: the CURRENT generation of a live
    doc matches, its PREVIOUS generation and any dead doc do not

Usage:  python tools/soak_lifecycle.py [n_seeds] [n_ops]
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class InjectedCrash(Exception):
    """Raised by the fault injector at a randomly chosen file operation."""


class _FaultInjector:
    """Crash the process (by exception) at the K-th Python-side file
    mutation — os.replace / os.rename / shutil.move / os.remove are the
    orchestration calls every crash-replay contract in the engine is
    written against (atomic swaps, deterministic file installs, delta
    drops). Spark's own JVM writes are not interceptable and not the
    point: the replay logic lives in the Python glue."""

    TARGETS = [("os", "replace"), ("os", "rename"), ("os", "remove"),
               ("shutil", "move")]

    def __init__(self, k: int):
        self.k = k
        self.calls = 0
        self.saved: list = []

    def __enter__(self):
        import shutil as _sh
        mods = {"os": os, "shutil": _sh}

        def wrap(fn):
            def inner(*a, **kw):
                self.calls += 1
                if self.calls >= self.k:
                    raise InjectedCrash(
                        f"injected at file-op #{self.calls}")
                return fn(*a, **kw)
            return inner

        for mod, name in self.TARGETS:
            m = mods[mod]
            orig = getattr(m, name)
            self.saved.append((m, name, orig))
            setattr(m, name, wrap(orig))
        return self

    def __exit__(self, *exc):
        for m, name, orig in self.saved:
            setattr(m, name, orig)
        return False


def _text(doc_id: int, gen: int) -> str:
    # exactly 4 tokens so meta.dl_sum == 4 * |live|; u<id> is the per-doc
    # membership probe, v<id>x<gen> the per-generation probe
    return f"alpha shared u{doc_id} v{doc_id}x{gen}"


def _doc(doc_id: int, gen: int) -> dict:
    return {"doc_id": doc_id, "text": _text(doc_id, gen), "lang": "en"}


class Soak:
    def __init__(self, spark, root: str, seed: int, check_every: int = 1,
                 auto_persist: dict | None = None):
        from search_engine_spark.server import SearchService
        self.spark = spark
        self.rng = random.Random(seed)
        self.seed = seed
        self.trace: list[str] = []
        self.check_every = check_every
        self.live: dict[int, int] = {i: 0 for i in range(12)}  # id -> gen
        self.dead: dict[int, int] = {}  # id -> last gen (tombstoned/purged)
        self.next_id = 100
        docs = spark.createDataFrame(
            [_doc(i, 0) for i in sorted(self.live)],
            "doc_id long, text string, lang string")
        docs_path = os.path.join(root, "docs")
        docs.write.parquet(docs_path)
        self.svc_root = os.path.join(root, "ix")
        self.auto_persist = auto_persist
        self.svc = SearchService(spark, self.svc_root,
                                 auto_persist=auto_persist)
        self.svc.create_index("soak", docs_path, fields={"text": "text"})
        self.svc.snapshot("soak")
        self.ixdir = self.svc.catalog._dir("soak")

    # -- ops ---------------------------------------------------------------
    def op_append_new(self):
        k = self.rng.randint(1, 4)
        ids = list(range(self.next_id, self.next_id + k))
        self.next_id += k + self.rng.randint(0, 3)
        out = self.svc.add_documents("soak", [_doc(i, 0) for i in ids])
        assert out["addedCount"] == k, (out, ids)
        assert out["replacedCount"] == 0, out
        for i in ids:
            self.live[i] = 0

    def op_upsert_live(self):
        if not self.live:
            return
        ids = self.rng.sample(sorted(self.live), min(len(self.live),
                                                     self.rng.randint(1, 3)))
        out = self.svc.add_documents(
            "soak", [_doc(i, self.live[i] + 1) for i in ids])
        assert out["addedCount"] == len(ids), (out, ids)
        assert out["replacedCount"] == len(ids), (out, ids)
        for i in ids:
            self.live[i] += 1

    def op_resend_identical(self):
        if not self.live:
            return
        i = self.rng.choice(sorted(self.live))
        out = self.svc.add_documents("soak", [_doc(i, self.live[i])])
        assert out["addedCount"] == 0, (out, i)
        assert out["duplicateCount"] == 1, (out, i)

    def op_delete_live(self):
        from search_engine_spark.operators.delete import delete_docs
        if len(self.live) <= 2:
            return
        ids = self.rng.sample(sorted(self.live), self.rng.randint(1, 2))
        if self.rng.random() < 0.5:
            # frame-native path (round 5): the id set as a DataFrame —
            # same tombstone state must result as from the list form
            arg = self.spark.createDataFrame([(i,) for i in ids],
                                             "doc_id long")
        else:
            arg = ids
        delete_docs(self.spark, self.ixdir, arg)
        for i in ids:
            self.dead[i] = self.live.pop(i)

    def op_readd_dead(self):
        if not self.dead:
            return
        ids = self.rng.sample(sorted(self.dead), min(len(self.dead),
                                                     self.rng.randint(1, 2)))
        out = self.svc.add_documents(
            "soak", [_doc(i, self.dead[i] + 1) for i in ids])
        assert out["addedCount"] == len(ids), (out, ids)
        for i in ids:
            self.live[i] = self.dead.pop(i) + 1

    def op_snapshot(self):
        self.svc.snapshot("soak")

    def op_flush(self):
        self.svc.flush("soak")

    def op_compact_deletes(self):
        from search_engine_spark.operators.delete import compact_deletes
        compact_deletes(self.spark, self.ixdir)

    def op_consolidate(self):
        from search_engine_spark.operators.doc_values import \
            consolidate_doc_values
        from search_engine_spark.operators.lsm import consolidate_docs_runs
        from search_engine_spark.operators.wand import consolidate_blocks
        consolidate_blocks(self.spark, self.ixdir)
        consolidate_doc_values(self.spark, self.ixdir)
        consolidate_docs_runs(self.spark, self.ixdir, min_chunks=2)

    def op_restart(self):
        # process restart: a FRESH service over the same catalog root must
        # restore everything from disk (docs table via meta.docs_path,
        # runs/tombstones/snapshots via their artifacts) — no in-memory
        # state may be load-bearing
        from search_engine_spark.server import SearchService
        self.svc = SearchService(self.spark, self.svc_root,
                                 auto_persist=self.auto_persist)

    def _crashed(self, name: str):
        """Run a maintenance op with a crash injected at a random file
        operation, then REPLAY it to completion (every maintenance op
        documents replay-exactness), restarting the service in between —
        the state a real operator would be in after a mid-op process
        death. The per-step check then holds the replayed state to the
        same model as any other step."""
        k = self.rng.randint(1, 6)
        try:
            with _FaultInjector(k):
                getattr(self, f"op_{name}")()
            self.trace[-1] += "(nocrash)"
        except InjectedCrash:
            self.trace[-1] += f"(crash@{k})"
            self.op_restart()
            getattr(self, f"op_{name}")()  # replay

    def op_flush_crash(self):
        self._crashed("flush")

    def op_snapshot_crash(self):
        self._crashed("snapshot")

    def op_compact_deletes_crash(self):
        self._crashed("compact_deletes")

    def op_consolidate_crash(self):
        self._crashed("consolidate")

    OPS = [("append_new", 3), ("upsert_live", 3), ("resend_identical", 1),
           ("delete_live", 2), ("readd_dead", 2), ("snapshot", 3),
           ("flush", 2), ("compact_deletes", 1), ("consolidate", 1),
           ("restart", 1)]

    CRASH_OPS = [("flush_crash", 2), ("snapshot_crash", 2),
                 ("compact_deletes_crash", 1), ("consolidate_crash", 1)]

    # -- oracle ------------------------------------------------------------
    def check(self, where: str):
        import json

        from search_engine_spark.serving import ServingIndex
        ctx = f"seed={self.seed} {where} trace={self.trace[-6:]}"
        res = self.svc.search("soak", {"query": {"match_all": {}},
                                       "size": 1})
        assert res["total"] == len(self.live), \
            f"{ctx}: routed total {res['total']} != {len(self.live)}"
        with open(os.path.join(self.ixdir, "meta.json")) as fh:
            meta = json.load(fh)
        assert meta["total_docs"] == len(self.live), \
            f"{ctx}: meta.total_docs {meta['total_docs']} != {len(self.live)}"
        assert meta["dl_sum"] == 4 * len(self.live), \
            f"{ctx}: meta.dl_sum {meta['dl_sum']} != {4 * len(self.live)}"
        # the block snapshot may refuse (stale) but must never be wrong
        try:
            srv = ServingIndex(self.ixdir)
        except ValueError as e:
            assert "STALE" in str(e) or "consolidat" in str(e), f"{ctx}: {e}"
            srv = None
        if srv is not None:
            _, total = srv.search_with_total({"match_all": {}}, k=1)
            assert total == len(self.live), \
                f"{ctx}: serving total {total} != {len(self.live)}"
        # sampled membership + generation probes (routed path)
        if self.live:
            i = self.rng.choice(sorted(self.live))
            gen = self.live[i]
            got = self.svc.search("soak", {"query": {"term": {
                "field": "text", "value": f"v{i}x{gen}"}}, "size": 5})
            assert got["total"] == 1 and \
                got["hits"][0]["doc_id"] == i, \
                f"{ctx}: live doc {i} gen {gen} probe -> {got['total']}"
            # ABSOLUTE score correctness under mutation: the model knows
            # the exact BM25 inputs for a generation probe (df=1, tf=1,
            # dl=4, N=|live|, avg_dl=4) — drifted meta counters, stale
            # doc stats, or a serving/Spark scoring-parameter split all
            # surface here, on whichever path the router picked
            from search_engine_spark.functions.bm25 import bm25_score_py
            want = bm25_score_py(1, 1, 4, len(self.live), 4.0)
            score = got["hits"][0]["score"]
            assert abs(score - want) <= 1e-9 * max(abs(want), 1.0), \
                f"{ctx}: doc {i} score {score} != expected {want}"
            # stored-field enrichment must show the CURRENT generation's
            # body, not a stale sidecar row
            body = got["hits"][0].get("text")
            assert body == _text(i, gen), \
                f"{ctx}: doc {i} enriched body {body!r} != gen {gen}"
            # hit-scoped terms agg over the matched set must count 1
            agg = self.svc.search("soak", {
                "query": {"term": {"field": "text", "value": f"u{i}"}},
                "size": 0,
                "aggregations": {"langs": {"terms": {"field": "lang"}}}})
            buckets = agg["aggregations"]["langs"]["buckets"]
            assert [(b["key"], b["doc_count"]) for b in buckets] == \
                [("en", 1)], f"{ctx}: agg over doc {i} -> {buckets}"
            if gen > 0:
                old = self.svc.search("soak", {"query": {"term": {
                    "field": "text", "value": f"v{i}x{gen - 1}"}},
                    "size": 5})
                assert old["total"] == 0, \
                    f"{ctx}: doc {i} STALE gen {gen - 1} still matches"
        if self.dead:
            i = self.rng.choice(sorted(self.dead))
            got = self.svc.search("soak", {"query": {"term": {
                "field": "text", "value": f"u{i}"}}, "size": 5})
            assert got["total"] == 0, \
                f"{ctx}: dead doc {i} still matches ({got['total']})"

    def final_check(self):
        from search_engine_spark.operators.delete import \
            load_index_with_deletes
        from search_engine_spark.operators.lsm import compact_runs
        compact_runs(self.spark, self.ixdir)
        idx = load_index_with_deletes(self.spark, self.ixdir)
        n = idx.doc_stats.count()
        assert n == len(self.live), \
            f"seed={self.seed} final reload: {n} != {len(self.live)} " \
            f"trace={self.trace}"

    def run(self, n_ops: int, crashes: bool = False):
        ops = self.OPS + (self.CRASH_OPS if crashes else [])
        names = [n for n, w in ops for _ in range(w)]
        for step in range(n_ops):
            name = self.rng.choice(names)
            self.trace.append(name)
            getattr(self, f"op_{name}")()
            if (step + 1) % self.check_every == 0:
                self.check(f"step {step} after {name}")
        self.check("end")
        self.final_check()


def run_soak(spark, root: str, seed: int, n_ops: int = 25,
             check_every: int = 1, auto_persist: dict | None = None,
             crashes: bool = False) -> list[str]:
    s = Soak(spark, root, seed, check_every=check_every,
             auto_persist=auto_persist)
    s.run(n_ops, crashes=crashes)
    return s.trace


def main():
    import shutil
    import tempfile
    import time

    from search_engine_spark.session import get_spark
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_ops = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    spark = get_spark("soak", cores=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "8")), shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    auto = {"enabled": True, "batch_size": 3} \
        if os.environ.get("SOAK_AUTO_PERSIST") else None
    crashes = bool(os.environ.get("SOAK_CRASHES"))
    for seed in range(n_seeds):
        root = tempfile.mkdtemp(prefix=f"soak_{seed}_")
        t0 = time.time()
        try:
            trace = run_soak(spark, root, seed, n_ops, auto_persist=auto,
                             crashes=crashes)
        finally:
            shutil.rmtree(root, ignore_errors=True)
        print(f"seed {seed}: OK ({n_ops} ops, {time.time() - t0:.0f}s) "
              f"{' '.join(trace)}", flush=True)
    print(f"{n_seeds} seeds passed")
    spark.stop()


if __name__ == "__main__":
    main()
