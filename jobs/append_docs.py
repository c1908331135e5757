"""spark-submit entrypoint: LSM-append a document batch to a built index.

    spark-submit --py-files se.zip jobs/append_docs.py \
        --input /data/new_batch --index /data/index [--compact]

O(batch) work: writes a committed posting run (operators/lsm.append_docs)
and reconciles the collection stats additively — the base index is never
rewritten. Queries (jobs/run_queries.py, serving after a snapshot) see the
batch immediately via the base ∪ runs read path. ``--compact`` folds live
runs into the base afterwards, touching only the affected bucket
partitions.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet dir of new docs")
    ap.add_argument("--index", required=True, help="existing index dir")
    ap.add_argument("--compact", action="store_true",
                    help="fold live runs into the base after appending")
    ap.add_argument("--extract-html", nargs="?", const="html",
                    default=None, metavar="HTML_COL",
                    help="fill null text from this binary html column "
                         "(same extractor as jobs/build_index.py)")
    ap.add_argument("--upsert", action="store_true",
                    help="replace colliding ids (lsm.upsert_docs) instead "
                         "of the collision-unsafe plain append")
    ap.add_argument("--key-col", default=None, metavar="KEY_COL",
                    help="batch is keyed by this natural-key column (e.g. "
                         "a url re-crawl): map through the index's "
                         "persisted keymap and UPSERT by key "
                         "(keymap.upsert_by_key) — requires an index "
                         "built with build_index.py --key-col")
    args = ap.parse_args(argv)

    from search_engine_spark.operators.index_build import META, IndexConfig
    from search_engine_spark.operators.lsm import append_docs, compact_runs

    spark = SparkSession.builder.appName("append-docs").getOrCreate()
    with open(os.path.join(args.index, META)) as fh:
        meta = json.load(fh)
    config = IndexConfig(id_col=meta["id_col"], fields=meta["fields"],
                         n_buckets=meta["n_buckets"],
                         positions=meta["positions"],
                         stem_lang=meta.get("stem_lang"),
                         stem_lang_col=meta.get("stem_lang_col", "lang"),
                         analyzers=meta.get("analyzers") or {})
    docs = spark.read.parquet(args.input)
    if args.extract_html:
        from search_engine_spark.sources.extract import with_extracted_text
        docs = with_extracted_text(docs, html_col=args.extract_html)
    if args.key_col:
        from search_engine_spark.operators.keymap import upsert_by_key
        res = upsert_by_key(docs, args.index, config, key_col=args.key_col)
        print(json.dumps({"added": res["added"],
                          "replaced": res["replaced"],
                          "unchanged": res["unchanged"]}))
    elif args.upsert:
        from search_engine_spark.operators.lsm import upsert_docs
        res = upsert_docs(docs, args.index, config)
        print(json.dumps({"added": res["added"],
                          "replaced": res["replaced"],
                          "unchanged": res["unchanged"]}))
    else:
        entry = append_docs(docs, args.index, config)
        print(json.dumps({"appended": entry["n_docs"],
                          "n_postings": entry["n_postings"],
                          "run": entry["run_path"],
                          "seconds": round(entry["seconds"], 2)}))
    if args.compact:
        meta2 = compact_runs(spark, args.index)
        print(json.dumps({"compacted_buckets":
                          meta2.get("compacted_buckets", [])}))
    # no spark.stop(): getOrCreate may have adopted a caller's session
    # (in-process tests); spark-submit tears the JVM down at exit anyway
    # — same contract as jobs/build_index.py


if __name__ == "__main__":
    main()
