"""Pure-Python stemmers for the reference's remaining routed languages
(SURVEY T11): sk/uk/bg here to start, growing toward the full 28-code set of
``SnowballStemmer.ts:7-10``.

Implemented from the published algorithm sources each reference file cites
(Snowball specs at snowballstem.org, the Lucene light stemmers, the
ukstemmer regex algorithm) — NOT translated from the reference's bundled JS.
Behavior is pinned against golden vectors produced by EXECUTING the
reference's ``src/lib/stemmers/*.js`` with node on wide word lists
(tests/golden/snowball.json), so index-time stemming agrees with the
reference engine bit-for-bit, including its ports' quirks (e.g. bg.js
attempts in-place string mutation, a silent no-op on immutable JS strings,
so its "replace with X" rules actually only truncate — mirrored here).

Like the rest of the analysis chain these run inside Arrow-batched pandas
UDFs with a per-batch (lang, token) memo — pure string work, never
row-at-a-time Python in the Spark plan.
"""

from __future__ import annotations

import re

from .snowball import SNOWBALL

# ---------------------------------------------------------------------------
# Sanskrit (reference: light suffix stripper, sk.js)
# ---------------------------------------------------------------------------

# First match wins, in the reference's declaration order (all are length-2,
# so order only matters for identical suffixes — there are none).
_SK_SUFFIXES = ("aḥ", "āḥ", "iḥ", "īḥ", "uḥ", "ūḥ",
                "am", "ām", "im", "īm", "um", "ūm",
                "an", "ān", "in", "īn", "un", "ūn",
                "as", "ās", "is", "īs", "us", "ūs")


def sanskrit_stem(word: str) -> str:
    for suf in _SK_SUFFIXES:
        if word.endswith(suf):
            return word[:-len(suf)]
    return word


# ---------------------------------------------------------------------------
# Ukrainian (reference: ukstemmer regex algorithm, uk.js; Porter-style
# step structure over IAST regex suffix classes)
# ---------------------------------------------------------------------------

_UK_VOWEL = re.compile("[аеиоуюяіїє]")
_UK_PERFECTIVE = re.compile(r"(?:[иы]в(?:ши(?:сь)?)?|(?<=[ая])(?:в(?:ши(?:сь)?)?))$")
_UK_REFLEXIVE = re.compile("с[яьи]$")
_UK_ADJECTIVE = re.compile(
    "(?:[аеєуюя]|еє|ем|єє|ий|их|іх|ів|ій|ім|їй|ім|им|ими|іми|йми|ої|ою|ова|ове|ого|ому)$")
_UK_PARTICIPLE = re.compile("(?:[аіу]|ій|ий|им|ім|их|йми|ого|ому|ою)$")
_UK_VERB = re.compile(
    "(?:[еєую]|ав|али|ати|вши|ив|ити|ме|сь|ся|ши|учи|яти|ячи|ать|ять)$")
_UK_NOUN = re.compile(
    "(?:[аеєіїийоуыьюя]|ам|ах|ами|ев|еві|еи|ей|ем|ею|єм|єю|ів|їв|ий|ием|ию|ия"
    "|иям|иях|ов|ові|ой|ом|ою|ью|ья|ям|ями|ях)$")
_UK_DERIVATIONAL = re.compile(
    "[^аеиоуюяіїє][аеиоуюяіїє]+[^аеиоуюяіїє]+[аеиоуюяіїє].*(?<=о)сть?$")
_UK_STEP2 = re.compile("и$")
_UK_STEP3 = re.compile("ость$")
_UK_STEP41 = re.compile("ь$")
_UK_STEP42 = re.compile("ейше$")
_UK_STEP43 = re.compile("нн$")


def ukrainian_stem(word: str) -> str:
    # The reference finds the first vowel in the ORIGINAL (un-lowercased)
    # word with a lowercase vowel class, then stems the lowercased tail.
    m = _UK_VOWEL.search(word)
    if m is None:
        return word
    low = word.lower()
    head = low[:m.start() + 1]
    s = low[m.start() + 1:]
    if s == "":
        return word

    def sub(pat: re.Pattern, repl: str) -> bool:
        nonlocal s
        new = pat.sub(repl, s, count=1)
        changed = new != s
        s = new
        return changed

    # step 1
    if not sub(_UK_PERFECTIVE, ""):
        sub(_UK_REFLEXIVE, "")
        if sub(_UK_ADJECTIVE, ""):
            sub(_UK_PARTICIPLE, "")
        else:
            if not sub(_UK_VERB, ""):
                sub(_UK_NOUN, "")
    # step 2
    sub(_UK_STEP2, "")
    # step 3
    if _UK_DERIVATIONAL.search(s):
        sub(_UK_STEP3, "")
    # step 4
    if not sub(_UK_STEP41, ""):
        sub(_UK_STEP42, "")
        sub(_UK_STEP43, "н")
    return head + s


# ---------------------------------------------------------------------------
# Bulgarian (reference: Lucene light stemmer port, bg.js — Savoy's BUIR
# algorithm. The JS port assigns into immutable strings for its "replace
# with X" rules; under ES-module strict mode that THROWS, and the caller
# (SnowballStemmer.ts:44-49) falls back to the ORIGINAL word. So every rule
# with a character write returns the input unchanged — mirrored here via
# _BgWrite.)
# ---------------------------------------------------------------------------


class _BgWrite(Exception):
    """bg.js hit a string-write rule: reference returns the word unstemmed."""


def _bg_remove_article(s: str, ln: int) -> int:
    if ln > 6 and s[ln - 3:ln] == "ият":
        return ln - 3
    if ln > 5 and s[ln - 2:ln] in ("ът", "то", "те", "та", "ия"):
        return ln - 2
    if ln > 4 and s[ln - 2:ln] == "ят":
        return ln - 2
    return ln


def _bg_remove_plural(s: str, ln: int) -> int:
    if ln > 6:
        if s[ln - 4:ln] == "овци":
            return ln - 3
        if s[ln - 3:ln] == "ове":
            return ln - 3
        if s[ln - 3:ln] == "еве":
            raise _BgWrite        # "replace with й" write throws
    if ln > 5:
        if s[ln - 3:ln] == "ища":
            return ln - 3
        if s[ln - 2:ln] == "та":
            return ln - 2
        if s[ln - 2:ln] in ("ци", "зи"):
            raise _BgWrite        # "к"/"г" writes throw
        if s[ln - 3] == "е" and s[ln - 1] == "и":
            raise _BgWrite        # "я" write throws
    if ln > 4:
        if s[ln - 2:ln] == "си":
            raise _BgWrite        # "х" write throws
        if s[ln - 1] == "и":
            return ln - 1
    return ln


def bulgarian_stem(word: str) -> str:
    s = word
    ln = len(s)
    if ln < 4:
        return s
    if ln > 5 and s[ln - 3:ln] == "ища":
        return s[:ln - 3]
    try:
        ln = _bg_remove_article(s, ln)
        ln = _bg_remove_plural(s, ln)
        if ln > 3:
            if s[ln - 1] == "я":
                ln -= 1
            if s[ln - 1] in ("а", "о", "е"):
                ln -= 1
        if ln > 4 and s[ln - 2:ln] == "ен":
            raise _BgWrite        # "ен → н" write throws
        if ln > 5 and s[ln - 2] == "ъ":
            raise _BgWrite        # "ъN → N" write throws
    except _BgWrite:
        return word
    return s[:ln]


SNOWBALL.update({
    "sk": sanskrit_stem, "sanskrit": sanskrit_stem,
    "uk": ukrainian_stem, "ukrainian": ukrainian_stem,
    "bg": bulgarian_stem, "bulgarian": bulgarian_stem,
})


# ---------------------------------------------------------------------------
# Indonesian (Snowball indonesian algorithm — Asian/Williams/Tahaghoghi;
# reference ships it compiled as id.js. measure = vowel count, decremented
# per removal; every stage requires measure > 2.)
# ---------------------------------------------------------------------------

_ID_VOWELS = frozenset("aeiou")


def _id_suffix(w: str, t: int, s: int):
    """remove_suffix: backward among over kan/an/i with prefix-flag guards.
    Among fallback: a guarded 'kan' failure falls back to the shorter 'an'."""
    if w.endswith("kan"):
        if t not in (2, 3):
            return w[:-3], s - 1, True
        # among fallback to parent 'an' (guard: t != 1, true here)
        return w[:-2], s - 1, True
    if w.endswith("an"):
        if t != 1:
            return w[:-2], s - 1, True
        return w, s, False
    if w.endswith("i"):
        if t <= 2 and not (len(w) >= 2 and w[-2] == "s"):
            return w[:-1], s - 1, True
    return w, s, False


def _id_first_order(w: str, t: int, s: int):
    """remove_first_order_prefix (di/ke/me*/pe*/ter families).
    meny/peny require a following vowel (else fall back to men/pen);
    mem/pem restore 'p' before a vowel."""
    if w.startswith("di"):
        return w[2:], 1, s - 1, True
    if w.startswith("ke"):
        return w[2:], 3, s - 1, True
    if w.startswith("meny") and len(w) > 4 and w[4] in _ID_VOWELS:
        return "s" + w[4:], 1, s - 1, True
    if w.startswith("meng"):
        return w[4:], 1, s - 1, True
    if w.startswith("men"):
        return w[3:], 1, s - 1, True
    if w.startswith("mem"):
        if len(w) > 3 and w[3] in _ID_VOWELS:
            return "p" + w[3:], 1, s - 1, True
        return w[3:], 1, s - 1, True
    if w.startswith("me"):
        return w[2:], 1, s - 1, True
    if w.startswith("peny") and len(w) > 4 and w[4] in _ID_VOWELS:
        return "s" + w[4:], 3, s - 1, True
    if w.startswith("peng"):
        return w[4:], 3, s - 1, True
    if w.startswith("pen"):
        return w[3:], 3, s - 1, True
    if w.startswith("pem"):
        if len(w) > 3 and w[3] in _ID_VOWELS:
            return "p" + w[3:], 3, s - 1, True
        return w[3:], 3, s - 1, True
    if w.startswith("ter"):
        return w[3:], 1, s - 1, True
    return w, t, s, False


def _id_second_order(w: str, t: int, s: int):
    """remove_second_order_prefix (ber/bel/be+C+er, per/pel/pe).
    belajar/pelajar restore the 'ajar' root; pelajar leaves the flag."""
    if w.startswith("belajar"):
        return "ajar" + w[7:], 4, s - 1, True
    if w.startswith("ber"):
        return w[3:], 4, s - 1, True
    if w.startswith("be") and len(w) > 2 and w[2] not in _ID_VOWELS \
            and w[3:5] == "er":
        return w[2:], 4, s - 1, True
    if w.startswith("pelajar"):
        return "ajar" + w[7:], t, s - 1, True
    if w.startswith("per"):
        return w[3:], 2, s - 1, True
    if w.startswith("pe"):
        return w[2:], 2, s - 1, True
    return w, t, s, False


def indonesian_stem(word: str) -> str:
    w = word
    s = sum(1 for ch in w if ch in _ID_VOWELS)
    if s <= 2:
        return w
    t = 0
    for suf in ("kah", "lah", "pun"):       # remove_particle
        if w.endswith(suf):
            w = w[:-3]
            s -= 1
            break
    if s <= 2:
        return w
    for suf in ("nya", "ku", "mu"):         # remove_possessive_pronoun
        if w.endswith(suf):
            w = w[:-len(suf)]
            s -= 1
            break
    if s <= 2:
        return w
    w, t, s, matched = _id_first_order(w, t, s)
    if matched:
        if s > 2:
            w, s, suf_matched = _id_suffix(w, t, s)
            if suf_matched and s > 2:
                w, t, s, _ = _id_second_order(w, t, s)
    else:
        w, t, s, _ = _id_second_order(w, t, s)
        if s > 2:
            w, s, _ = _id_suffix(w, t, s)
    return w


SNOWBALL.update({"id": indonesian_stem, "indonesian": indonesian_stem})

# Reference-code aliases (SnowballStemmer.ts:7-10 routes 'se'/'dk' for
# Swedish/Danish; 'no' is shared).
SNOWBALL.setdefault("se", SNOWBALL["sv"])
SNOWBALL.setdefault("dk", SNOWBALL["da"])
