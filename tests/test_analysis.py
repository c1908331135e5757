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


def test_custom_analyzer_default():
    from search_engine_spark.analysis.analyzers import make_custom
    c = make_custom()
    assert c("Hello, World-Wide don't") == ["hello", "world", "wide", "don", "t"]
    # preserve flags are observable no-ops (reference quirk, Tokenizer.ts:449-472)
    c2 = make_custom(preserve_hyphens=True, preserve_apostrophes=True)
    assert c2("Hello, World-Wide don't") == c("Hello, World-Wide don't")


def test_custom_analyzer_options():
    from search_engine_spark.analysis.analyzers import make_custom
    assert make_custom(lowercase=False)("Big CAT") == ["Big", "CAT"]
    assert make_custom(min_length=3)("a bb ccc dddd") == ["ccc", "dddd"]
    assert make_custom(max_length=3)("a bb ccc dddd") == ["a", "bb", "ccc"]
    got = make_custom(custom_pattern=r"[a-z]+@[a-z]+")("x ab@cd ef gh@ij")
    assert got == ["ab@cd", "gh@ij"]
    stops = frozenset({"the"})
    assert make_custom()("the cat", stops) == ["cat"]
    assert make_custom(remove_stopwords=False)("the cat", stops) == ["the", "cat"]


def test_standard_jvm_randomized_parity(spark):
    """Randomized equivalence: the translate-based JVM chain must match the
    pure-Python reference-semantics analyzer on adversarial inputs
    (apostrophe rules, dot/hyphen runs, unicode, controls)."""
    import random
    from search_engine_spark.analysis import analyzers as pyan
    from search_engine_spark.analysis.spark import tokens_for
    from pyspark.sql import functions as F
    rng = random.Random(99)
    pieces = ["cat's", "cats'", "don't", "o'clock", "''", "'", "a'b'c",
              "x-y", "--", "a..b", "...", "3.14", "_id_", "Hello,World!",
              "café", " ", "　", "tab\there", "new\nline",
              "\x1fctl", "é", "ab", "a", "A'S", "mixed'CASE's"]
    rows = []
    for i in range(300):
        n = rng.randint(0, 12)
        rows.append((i, " ".join(rng.choice(pieces) for _ in range(n))))
    df = spark.createDataFrame(rows, "i long, t string")
    got = {r["i"]: list(r["toks"]) for r in
           df.select("i", tokens_for(F.col("t")).alias("toks")).collect()}
    for i, t in rows:
        assert got[i] == pyan.standard(t), (t, got[i], pyan.standard(t))
