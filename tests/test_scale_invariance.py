"""Scale invariance (SURVEY §5.2 item 6): identical top-k (docs AND bitwise
scores) at different core counts and shuffle-partition counts — guards
against the reference's D2 merge bug class (per-worker pagination without a
global re-sort) and against shuffle-order-dependent float summation."""

import json
import subprocess
import sys

CHILD = r"""
import json, sys
from pyspark.sql import functions as F
from search_engine_spark.session import get_spark
from search_engine_spark.sources.synth import synth_pages
from search_engine_spark.operators.index_build import IndexConfig, build_index
from search_engine_spark.plans.dsl import SparkSearchEngine

cores, shuffle = int(sys.argv[1]), int(sys.argv[2])
spark = get_spark(f"si{cores}", cores=cores, shuffle_partitions=shuffle)
spark.sparkContext.setLogLevel("ERROR")
pages = synth_pages(spark, 800).cache()
idx = build_index(pages, IndexConfig(id_col="doc_id", fields={"text": "text"},
                                     n_buckets=4))
eng = SparkSearchEngine(idx, pages)
out = {}
for name, q in [
    ("match", {"match": {"field": "text", "value": "za"}}),
    ("bool", {"bool": {"should": [
        {"term": {"field": "text", "value": "za"}},
        {"term": {"field": "text", "value": "ba"}}],
    }}),
]:
    rows = eng.search(q, size=10).collect()
    out[name] = [[int(r["doc_id"]), r["score"].hex()] for r in rows]
print("RESULT:" + json.dumps(out))
spark.stop()
"""


def _run(cores: int, shuffle: int) -> dict:
    r = subprocess.run([sys.executable, "-c", CHILD, str(cores), str(shuffle)],
                       capture_output=True, text=True, timeout=600, cwd=".")
    for line in r.stdout.splitlines():
        if line.startswith("RESULT:"):
            return json.loads(line[7:])
    raise AssertionError(f"child failed:\n{r.stdout[-1500:]}\n{r.stderr[-1500:]}")


def test_topk_invariant_across_cores_and_partitions():
    a = _run(2, 1)
    b = _run(8, 64)
    # exact doc ranks AND bitwise-identical scores (hex float compare)
    assert a == b
