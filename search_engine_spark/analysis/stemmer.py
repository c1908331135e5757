"""Optional stemming filter (SURVEY T11).

The reference ships its Snowball stemmers but stemming is OFF by default
(Tokenizer.ts:97, src/index.ts:97), so no default-config behavior depends on
it. This module provides the same opt-in hook with ALL 28 reference-routed
stemmer codes implemented in pure Python: the English Porter stemmer below
(the Snowball "porter" variant the reference's en.js compiles — Porter 1980
plus its documented bli/logi/sion-tion departures) and the other 27
languages in analysis/snowball.py + snowball_ext.py, every one golden-pinned
against the reference's compiled stemmer output (tests/golden/snowball.json,
800 vectors/language). Unknown or null codes fall back to the English
porter — the reference's routing (SnowballStemmer.ts:27-31); see
``supported_langs()``. ``stem_tokens_by_lang`` routes per document by a
lang column (IndexConfig.stem_lang="auto").

Usage: ``stem_tokens(tokens_col, lang="en")`` wraps a token array column in
an Arrow pandas UDF (stemming is pure string work; vectorized per batch).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

_VOWELS = "aeiou"


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """m = number of VC sequences in [C](VC)^m[V]."""
    m, i, n = 0, 0, len(stem)
    while i < n and _is_cons(stem, i):
        i += 1
    while i < n:
        while i < n and not _is_cons(stem, i):
            i += 1
        if i >= n:
            break
        m += 1
        while i < n and _is_cons(stem, i):
            i += 1
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return (len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1))


def _cvc(w: str) -> bool:
    if len(w) < 3:
        return False
    return (_is_cons(w, len(w) - 3) and not _is_cons(w, len(w) - 2)
            and _is_cons(w, len(w) - 1) and w[-1] not in "wxy")


_STEP2 = [("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
          ("anci", "ance"), ("izer", "ize"), ("abli", "able"), ("alli", "al"),
          ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
          ("ation", "ate"), ("ator", "ate"), ("alism", "al"),
          ("iveness", "ive"), ("fulness", "ful"), ("ousness", "ous"),
          ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
          # Snowball porter departures (porter.sbl; present in the
          # reference's compiled en.js — golden-pinned):
          ("bli", "ble"), ("logi", "log")]
_STEP3 = [("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
          ("ical", "ic"), ("ful", ""), ("ness", "")]
_STEP4 = ["al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
          "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize"]


def porter_stem(word: str) -> str:
    """Porter English stemmer, Snowball-porter variant (matches the
    reference's en.js bit-for-bit on 7,135 golden vectors)."""
    w = word.lower()
    if len(w) <= 2:
        return w
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]
    # step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w, flag = w[:-2], True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w, flag = w[:-3], True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w += "e"
    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"
    # step 2
    for suf, rep in _STEP2:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break
    # step 3
    for suf, rep in _STEP3:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break
    # step 4 (Snowball-porter formulation: 'sion'/'tion' are whole
    # suffixes deleted when they lie in R2 ⟺ m(stem) > 1 — adoption →
    # adop, matching the reference's en.js, NOT the paper's *S/*T ION rule)
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 1:
                w = stem
            break
    else:
        if (w.endswith("tion") or w.endswith("sion")) \
                and _measure(w[:-4]) > 1:
            w = w[:-4]
    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem
    # step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


def _stemmer_for(lang: str):
    if lang in ("en", "english"):
        return porter_stem
    from .snowball import SNOWBALL
    fn = SNOWBALL.get(lang)
    if fn is None:
        raise NotImplementedError(
            f"no stemmer for lang={lang!r} (reference default is stemming "
            "OFF, Tokenizer.ts:97); all 28 reference-routed codes are "
            "built in — see supported_langs()")
    return fn


def stem_word(word: str, lang: str = "en") -> str:
    return _stemmer_for(lang)(word)


def stem_word_routed(word: str, lang: str | None) -> str:
    """Stem with the reference's lenient routing: unknown/None codes fall
    back to the English porter (SnowballStemmer.ts:27-31) instead of
    raising — the per-ROW twin of :func:`stem_tokens_by_lang`'s routing,
    used by the QUERY side for index/query analyzer symmetry."""
    from .snowball import SNOWBALL
    key = (lang or "").lower()
    fn = porter_stem if key in ("en", "english") \
        else SNOWBALL.get(key, porter_stem)
    return fn(word)


def stem_tokens(tokens: Column, lang: str = "en") -> Column:
    """Arrow-vectorized stemming filter over an array<string> column."""
    fn = _stemmer_for(lang)

    @F.pandas_udf(ArrayType(StringType()))
    def _stem(s: pd.Series) -> pd.Series:
        cache: dict = {}

        def one(toks):
            if toks is None:
                return []
            out = []
            for t in toks:
                if t not in cache:
                    cache[t] = fn(t)
                out.append(cache[t])
            return out
        return s.map(one)

    return _stem(tokens)


def supported_langs() -> tuple:
    from .snowball import SNOWBALL
    return ("en",) + tuple(sorted(k for k in SNOWBALL if len(k) == 2))


def stem_tokens_by_lang(tokens: Column, lang: Column) -> Column:
    """Per-ROW language-routed stemming over (array<string>, lang) columns —
    the Spark twin of the reference Stemmer's per-word language routing
    (Stemmer.ts:43-127 with autoDetectLanguage; here the corpus's ``lang``
    column IS the detection, matching the input schema's lang field).

    Tokens of docs in an UNSUPPORTED (or null) language route to the
    ENGLISH porter stemmer — exactly the reference's fallback
    (SnowballStemmer.ts:27-31 routes unknown codes to 'en';
    Stemmer.ts:18 defaults the language to 'en'). Cache is keyed
    (lang, token) per Arrow batch — a multilingual batch still pays
    each distinct token once."""

    @F.pandas_udf(ArrayType(StringType()))
    def _stem(s: pd.Series, lg: pd.Series) -> pd.Series:
        from .snowball import SNOWBALL
        cache: dict = {}
        out = []
        for toks, one_lang in zip(s, lg):
            if toks is None:
                out.append([])
                continue
            lang_key = (one_lang or "").lower()
            fn = porter_stem if lang_key in ("en", "english") \
                else SNOWBALL.get(lang_key, porter_stem)
            row = []
            for t in toks:
                k = (lang_key, t)
                if k not in cache:
                    cache[k] = fn(t)
                row.append(cache[k])
            out.append(row)
        return pd.Series(out)

    return _stem(tokens, lang)
