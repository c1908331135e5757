"""spark-submit entrypoint: corpus-cleaning pipeline.

    spark-submit --py-files se.zip jobs/clean_corpus.py \
        --input /data/pages --output /data/pages_clean \
        [--text-col text] [--min-quality 0.5] [--lang en]
        [--neardup-threshold 0.5] [--verdicts /data/verdicts]

Writes the surviving rows to --output and (optionally) the per-doc verdict
table (doc_id, quality, pred_lang, reason) to --verdicts. Prints one JSON
line of drop statistics.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--verdicts", default=None)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--n-chars-col", default="n_chars")
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument("--lang", default="en",
                    help="'-' disables the language filter")
    ap.add_argument("--neardup-threshold", type=float, default=0.5)
    args = ap.parse_args(argv)

    from search_engine_spark.operators.pipeline import clean_corpus

    spark = SparkSession.builder.appName("clean-corpus").getOrCreate()
    docs = spark.read.parquet(args.input)
    if args.n_chars_col not in docs.columns:
        docs = docs.withColumn(args.n_chars_col, F.length(args.text_col))
    verdict = clean_corpus(
        docs, text_col=args.text_col, n_chars_col=args.n_chars_col,
        min_quality=args.min_quality,
        lang=None if args.lang == "-" else args.lang,
        neardup_threshold=args.neardup_threshold).cache()
    if args.verdicts:
        verdict.write.mode("overwrite").parquet(args.verdicts)
    keep = verdict.where(F.col("reason") == "").select("doc_id")
    docs.join(keep, "doc_id", "semi") \
        .write.mode("overwrite").parquet(args.output)
    stats = {r["reason"] or "kept": r["n"] for r in
             verdict.groupBy("reason").agg(F.count(F.lit(1)).alias("n")).collect()}
    print(json.dumps({"input": args.input, "output": args.output,
                      "verdict_counts": stats}))


if __name__ == "__main__":
    main()
