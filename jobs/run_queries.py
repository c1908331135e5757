"""spark-submit entrypoint: run query-DSL searches against a built index.

    spark-submit --py-files se.zip jobs/run_queries.py \
        --index /data/index --docs /data/pages \
        --query '{"match": {"field": "text", "value": "spark"}}' \
        [--size 10] [--wand term1,term2] [--json]

Prints one JSON line per query: rank, doc_id, score, wall seconds.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--docs", required=True, help="parquet dir of the corpus")
    ap.add_argument("--query", action="append", default=[],
                    help="query DSL JSON (repeatable) or bare string")
    ap.add_argument("--wand", default=None,
                    help="comma list of terms: block-max WAND top-k instead")
    ap.add_argument("--field", default="text")
    ap.add_argument("--size", type=int, default=10)
    args = ap.parse_args(argv)

    from search_engine_spark.operators.index_build import load_index
    from search_engine_spark.plans.dsl import SparkSearchEngine

    spark = SparkSession.builder.appName("run-queries").getOrCreate()
    idx = load_index(spark, args.index)
    idx.term_stats = idx.term_stats.cache()
    docs = spark.read.parquet(args.docs)
    eng = SparkSearchEngine(idx, docs)

    for raw in args.query:
        try:
            q = json.loads(raw)
        except json.JSONDecodeError:
            q = raw
        t0 = time.time()
        rows = eng.search(q, size=args.size).collect()
        print(json.dumps({
            "query": q, "seconds": round(time.time() - t0, 3),
            "hits": [{"rank": i + 1, "doc_id": r["doc_id"],
                      "score": r["score"]} for i, r in enumerate(rows)],
        }))

    if args.wand:
        from search_engine_spark.operators.wand import load_blocks, wand_topk
        terms = args.wand.split(",")
        blocks = load_blocks(spark, args.index)
        t0 = time.time()
        rows = wand_topk(blocks, idx, args.field, terms, k=args.size).collect()
        print(json.dumps({
            "wand_terms": terms, "seconds": round(time.time() - t0, 3),
            "hits": [{"rank": i + 1, "doc_id": r["doc_id"],
                      "score": r["score"]} for i, r in enumerate(rows)],
        }))


if __name__ == "__main__":
    main()
