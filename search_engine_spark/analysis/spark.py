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


#: ASCII chars the standard analyzer spaces out: everything that is neither
#: [A-Za-z0-9_] nor ASCII whitespace (\t\n\x0b\x0c\r space). Includes '.', '-',
#: apostrophe, and control chars — see standard_tokens_col for the proof that
#: per-char spacing reproduces the reference chain's token stream.
_ASCII_STRIP = "".join(
    chr(i) for i in range(0x80)
    if not (chr(i).isascii() and (chr(i).isalnum() or chr(i) == "_"))
    and chr(i) not in "\t\n\x0b\x0c\r "
)


def standard_tokens_col(c: Column) -> Column:
    """Standard analyzer as a JVM expression chain (Tokenizer.ts:176-192).

    Performance-equivalent rewrite of the literal regex chain — java regex
    passes are ~6x slower than ``translate``, and the chain's TOKEN-STREAM
    output (what the index sees) is provably identical under per-char
    mapping (golden-vector + randomized parity tests pin this):

    - every non-ASCII char maps to space: after the JS-whitespace translate,
      remaining non-ASCII is non-word non-space for JS regexes, so the
      ``[^\\w\\s\\-.]`` pass spaces it — done here with one cheap
      ``[^\\x00-\\x7F]`` class;
    - the three apostrophe passes reduce to ``' -> space``: rule 1 splits at
      the apostrophe (= spacing it); rule 2 ((\\w+)'s -> $1) is dead code
      after rule 1; rule 3 ((\\w+)s' -> $1s) deletes without spacing, which
      differs only in whitespace — invisible after the \\s+ split;
    - ALL remaining ASCII punctuation (including the later dot-run and
      hyphen-run passes — runs of spaces collapse in the split) maps to
      space via ONE ``translate``;
    - the length<=1 filter is an ArrayFilter over the split (cheaper than a
      lookaround-erase regex, and trivially order-preserving).
    """
    x = F.lower(_js_ws(c))
    x = F.regexp_replace(x, "[^\x00-\x7f]", " ")
    x = F.translate(x, _ASCII_STRIP, " " * len(_ASCII_STRIP))
    toks = F.filter(F.split(F.trim(x), r"\s+"), lambda t: F.length(t) > 1)
    return F.when(c.isNull(), F.array().cast("array<string>")).otherwise(toks)


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
