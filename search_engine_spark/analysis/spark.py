"""Spark-side tokenization.

Two execution strategies, golden-tested to agree with each other and with the
node-generated vectors in ``tests/golden/tokens.json``:

1. **JVM-native column expressions** (``*_tokens_col``) for the analyzers
   whose semantics are a pure regex chain (standard/simple/whitespace/
   keyword/pattern). These stay inside WholeStageCodegen — no Python in the
   hot path at all. This is the default for index builds: at 100 TB the
   tokenizer dominates build cost, and built-in ``regexp_replace``/``split``/
   ``filter`` beat even Arrow-batched Python by a wide margin.

2. **Arrow-vectorized pandas UDFs** (``tokens_udf``) wrapping the pure-Python
   analyzers for the extraction-style analyzers (email/url/phone/advanced)
   that need finditer/URL-parsing logic. Batched via Arrow; never
   row-at-a-time Python UDFs.

JS-regex fidelity notes (reference Tokenizer.ts:176-243): Java and JS agree
that ``\\w``/``\\b`` are ASCII; JS ``\\s`` additionally matches Unicode
whitespace, emulated by a leading ``translate`` of those codepoints to a
space (see analyzers._JS_WS for why this is semantics-preserving).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from . import analyzers as pyan

# Unicode whitespace that JS \s matches but Java/Python ASCII \s does not.
_JS_WS_CHARS = "".join(
    chr(c) for c in [0x00A0, 0x1680, *range(0x2000, 0x200B), 0x2028, 0x2029,
                     0x202F, 0x205F, 0x3000, 0xFEFF, 0x000B]
)
_SPACES = " " * len(_JS_WS_CHARS)


def _js_ws(c: Column) -> Column:
    return F.translate(c, _JS_WS_CHARS, _SPACES)


def _nonempty(toks: Column) -> Column:
    return F.filter(toks, lambda t: t != F.lit(""))


def standard_tokens_col(c: Column) -> Column:
    """Standard analyzer as a JVM expression chain (Tokenizer.ts:176-192).

    Performance-equivalent rewrite of the literal chain (golden-vector
    parity tests pin every transformation):
    - the three apostrophe passes (contraction split, possessives) are
      identity when the text has no apostrophe — guarded behind a cheap
      ``instr`` so 95%+ of web text skips them;
    - the three strip passes (non-[\\w\\s\\-.] / dot runs / hyphen runs)
      fuse into ONE alternation — the character classes are disjoint, so
      sequential replacement == one left-to-right pass;
    - the length<=1 token filter becomes a regex erase of isolated
      single chars + direct \\s+ split — no interpreted higher-order
      ArrayFilter in the hot path, the whole chain stays in codegen.
    """
    x = F.lower(_js_ws(c))
    apos = F.regexp_replace(x, r"(\w+)'(\w+)", r"$1 $2")
    apos = F.regexp_replace(apos, r"(\w+)'s\b", r"$1")
    apos = F.regexp_replace(apos, r"(\w+)s'\b", r"$1s")
    x = F.when(F.instr(x, "'") > 0, apos).otherwise(x)
    x = F.regexp_replace(x, r"[^\w\s\-\.]|\.+|-+", " ")
    x = F.trim(F.regexp_replace(x, r"(?<=^|\s)\S(?=\s|$)", ""))
    # split("") == [""] — array_remove erases it without re-evaluating x
    toks = F.array_remove(F.split(x, r"\s+"), "")
    return (F.when(c.isNull(), F.array().cast("array<string>"))
            .otherwise(toks))


def simple_tokens_col(c: Column) -> Column:
    """Simple analyzer (Tokenizer.ts:197-206)."""
    x = F.lower(_js_ws(c))
    x = F.regexp_replace(x, r"[^\w\s]", " ")
    x = F.trim(F.regexp_replace(x, r"\s+", " "))
    toks = _nonempty(F.split(x, " "))
    return F.when(c.isNull(), F.array().cast("array<string>")).otherwise(toks)


def whitespace_tokens_col(c: Column) -> Column:
    """Whitespace analyzer (Tokenizer.ts:211-216): case-preserving."""
    toks = _nonempty(F.split(_js_ws(c), r"\s+"))
    return F.when(c.isNull(), F.array().cast("array<string>")).otherwise(toks)


def keyword_tokens_col(c: Column) -> Column:
    """Keyword analyzer (Tokenizer.ts:221-223): whole trimmed string.

    JS ``String.trim`` trims Unicode whitespace; Spark ``trim`` trims ASCII
    space only, so trim after the JS-whitespace translate + regex trim."""
    t = F.regexp_replace(F.regexp_replace(_js_ws(c), r"^\s+", ""), r"\s+$", "")
    return F.when(c.isNull() | (t == ""), F.array().cast("array<string>")) \
            .otherwise(F.array(t))


def pattern_tokens_col(c: Column) -> Column:
    """Pattern analyzer (Tokenizer.ts:228-243): \\b[\\w'-]+\\b words, len>1.

    Java's \\b is Unicode-aware even though its \\w is ASCII (unlike JS where
    both are ASCII), so the JS pattern is rewritten boundary-free: a maximal
    run of [\\w'-] that starts and ends with an ASCII word char — equivalent
    to the JS exec loop for left-to-right non-overlapping matching."""
    toks = F.regexp_extract_all(c, F.lit(r"[\w](?:[\w'-]*[\w])?"), 0)
    toks = F.transform(toks, F.lower)
    toks = F.filter(toks, lambda t: F.length(t) > 1)
    return F.when(c.isNull(), F.array().cast("array<string>")).otherwise(toks)


_NATIVE = {
    "standard": standard_tokens_col,
    "simple": simple_tokens_col,
    "whitespace": whitespace_tokens_col,
    "keyword": keyword_tokens_col,
    "pattern": pattern_tokens_col,
}


def tokens_udf(analyzer: str):
    """Arrow-batched pandas UDF for any analyzer (fallback / parity path)."""
    fn = pyan.ANALYZERS[analyzer]

    @F.pandas_udf(ArrayType(StringType()))
    def _tok(s: pd.Series) -> pd.Series:
        return s.map(lambda x: fn(x) if isinstance(x, str) else [])

    return _tok


def tokens_for(c: Column, analyzer: str = "standard",
               force_udf: bool = False, stopwords: tuple = ()) -> Column:
    """Tokenize a string column with the named analyzer.

    Uses the JVM-native expression when one exists (hot path), otherwise the
    Arrow pandas UDF. ``stopwords`` (default EMPTY — the reference ships no
    stopwords.json, StopwordsManager.ts:29-47) filters tokens after
    analysis; the whitespace analyzer checks the LOWERCASED token
    (Tokenizer.ts:211-216). Zero cost when empty.
    """
    if not force_udf and analyzer in _NATIVE:
        toks = _NATIVE[analyzer](c)
        if stopwords:
            stops = [str(s) for s in stopwords]
            if analyzer == "whitespace":
                toks = F.filter(toks, lambda t: ~F.lower(t).isin(stops))
            else:
                toks = F.filter(toks, lambda t: ~t.isin(stops))
        return toks
    if stopwords:
        fn = pyan.ANALYZERS[analyzer]
        stops = frozenset(str(s) for s in stopwords)

        @F.pandas_udf(ArrayType(StringType()))
        def _tok_sw(s: pd.Series) -> pd.Series:
            return s.map(lambda x: fn(x, stops) if isinstance(x, str) else [])

        return _tok_sw(c)
    return tokens_udf(analyzer)(c)
