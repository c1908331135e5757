"""spark-submit entrypoint: build (or resume) the inverted index.

    spark-submit --py-files se.zip jobs/build_index.py \
        --input /data/pages --index /data/index \
        [--fields text:text,title:text] [--buckets 512] \
        [--chunks 64] [--blocks] [--id-col doc_id | --assign-ids url]

Runs unchanged at any executor count: layout constants come from flags, not
from the cluster size; resume skips chunks whose manifest entries are
committed (kill-safe at chunk grain). Build metrics (docs/sec,
postings/sec, per-chunk lineage) land in the index's meta + manifest.

Package the library with ``zip -r se.zip search_engine_spark`` (pure
Python, no native deps) for --py-files distribution.
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
    ap.add_argument("--input", required=True, help="parquet dir of docs/pages")
    ap.add_argument("--index", required=True, help="output index dir")
    ap.add_argument("--fields", default="text:text",
                    help="comma list of col:type (type in text|keyword|email|url|phone)")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--assign-ids", default=None, metavar="KEY_COL",
                    help="derive dense doc ids from this natural key column")
    ap.add_argument("--key-col", default=None, metavar="KEY_COL",
                    help="like --assign-ids, but PERSIST the key -> id "
                         "mapping (operators/keymap.py) so later "
                         "upsert_by_key/delete_by_key batches keyed on "
                         "the same column (e.g. url re-crawls) hit the "
                         "O(batch) mutation path")
    ap.add_argument("--buckets", type=int, default=512)
    ap.add_argument("--chunks", type=int, default=0,
                    help=">0: resumable chunked build with this many chunks")
    ap.add_argument("--blocks", action="store_true",
                    help="also build the compressed WAND block index")
    ap.add_argument("--no-positions", action="store_true")
    ap.add_argument("--extract-html", nargs="?", const="html",
                    default=None, metavar="HTML_COL",
                    help="fill null text from this binary html column "
                         "(Arrow-batched extractor, map-only; byte-"
                         "identical to pre-extracted text per url)")
    args = ap.parse_args(argv)

    from search_engine_spark.operators.index_build import (
        IndexConfig, assign_doc_ids, build_index_resumable, load_index,
        write_index)

    spark = SparkSession.builder.appName("build-index").getOrCreate()
    docs = spark.read.parquet(args.input)
    if args.extract_html:
        from search_engine_spark.sources.extract import with_extracted_text
        docs = with_extracted_text(docs, html_col=args.extract_html)
    if args.assign_ids:
        docs = assign_doc_ids(docs, key_col=args.assign_ids)
    elif args.key_col:
        from search_engine_spark.operators.keymap import build_keymap
        os.makedirs(args.index, exist_ok=True)
        docs = build_keymap(docs, args.index, key_col=args.key_col)
    fields = dict(kv.split(":") for kv in args.fields.split(","))
    config = IndexConfig(id_col=args.id_col, fields=fields,
                         n_buckets=args.buckets,
                         positions=not args.no_positions)
    if args.chunks > 0:
        meta = build_index_resumable(docs, args.index, config,
                                     n_chunks=args.chunks)
    else:
        meta = write_index(docs, args.index, config)
    if args.blocks:
        from search_engine_spark.operators.wand import write_blocks
        write_blocks(load_index(spark, args.index), args.index)
        meta["blocks"] = True
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
