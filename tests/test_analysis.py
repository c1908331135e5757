"""Tokenizer parity: golden vectors (node-executed JS semantics) vs the
pure-Python analyzers, the JVM-native column expressions, and the Arrow
pandas UDFs (SURVEY.md §5.2 item 1 — byte-identical invariant)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from search_engine_spark.analysis import analyzers as pyan
from search_engine_spark.analysis.spark import _NATIVE, tokens_udf

GOLDEN = json.load(open(os.path.join(os.path.dirname(__file__),
                                     "golden", "tokens.json")))


@pytest.mark.parametrize("analyzer", sorted(GOLDEN))
def test_python_analyzers_match_golden(analyzer):
    fn = pyan.ANALYZERS[analyzer]
    for case in GOLDEN[analyzer]:
        assert fn(case["input"]) == case["tokens"], repr(case["input"])


@pytest.mark.parametrize("analyzer", sorted(_NATIVE))
def test_jvm_native_analyzers_match_golden(spark, analyzer):
    cases = GOLDEN[analyzer]
    df = spark.createDataFrame([(c["input"],) for c in cases], "s string")
    got = [r["t"] for r in
           df.select(_NATIVE[analyzer](F.col("s")).alias("t")).collect()]
    for case, toks in zip(cases, got):
        assert toks == case["tokens"], f"{analyzer}: {case['input']!r}"


@pytest.mark.parametrize("analyzer", sorted(GOLDEN))
def test_pandas_udf_analyzers_match_golden(spark, analyzer):
    cases = GOLDEN[analyzer]
    df = spark.createDataFrame([(c["input"],) for c in cases], "s string")
    got = [r["t"] for r in
           df.select(tokens_udf(analyzer)(F.col("s")).alias("t")).collect()]
    for case, toks in zip(cases, got):
        assert toks == case["tokens"], f"{analyzer}: {case['input']!r}"


def test_null_and_empty_inputs(spark):
    df = spark.createDataFrame([(None,), ("",), ("   ",)], "s string")
    for analyzer, expr in _NATIVE.items():
        rows = df.select(expr(F.col("s")).alias("t")).collect()
        for r in rows:
            assert r["t"] == [], analyzer
