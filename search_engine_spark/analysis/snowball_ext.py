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

from .snowball import (SNOWBALL, _es_like_rv, _longest_in, _r1_r2,
                       _r_std)

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


# ---------------------------------------------------------------------------
# Romanian (Snowball romanian algorithm, pre-2015 revision: cedilla forms
# ş/ţ = U+015F/U+0163, no comma-below normalization — matching ro.js)
# ---------------------------------------------------------------------------

_RO_VOWELS = "aăâeiîou"


def _ro_prelude(w: str) -> str:
    # intervocalic u/i -> U/I; scanning resumes after each replacement
    out = list(w)
    i, n = 0, len(w)
    while i < n - 2:
        if out[i] in _RO_VOWELS and out[i + 1] in "ui" \
                and out[i + 2] in _RO_VOWELS:
            out[i + 1] = "U" if out[i + 1] == "u" else "I"
            i += 2
        else:
            i += 1
    return "".join(out)


# step 0 (R1): suffix -> replacement; None = delete; 'ile' additionally
# requires not being preceded by 'ab'
_RO_STEP0 = {"ul": None, "ului": None, "aua": "a",
             "ea": "e", "ele": "e", "elor": "e",
             "ii": "i", "iua": "i", "iei": "i", "iile": "i", "iilor": "i",
             "ilor": "i", "ile": "i", "atei": "at",
             "aţie": "aţi", "aţia": "aţi"}
_RO_STEP0_SUFS = sorted(_RO_STEP0, key=len, reverse=True)

# step 1 (R1, repeated): combining suffix -> shorter suffix
_RO_COMBO = {}
for _sufs, _rep in (
        (("abilitate", "abilitati", "abilităi", "abilităţi"), "abil"),
        (("ibilitate",), "ibil"),
        (("ivitate", "ivitati", "ivităi", "ivităţi"), "iv"),
        (("icala", "iciva", "icale", "icive", "icali", "icivi", "ical",
          "iciv", "icală", "icivă", "icitate", "icitati", "icităi",
          "icităţi", "icator", "icatori"), "ic"),
        (("ativa", "ative", "ativi", "ativ", "ativă", "aţiune", "atoare",
          "ator", "atori", "ătoare", "ător", "ători"), "at"),
        (("itiva", "itive", "itivi", "itiv", "itivă", "iţiune", "itoare",
          "itor", "itori"), "it")):
    for _s in _sufs:
        _RO_COMBO[_s] = _rep
_RO_COMBO_SUFS = sorted(_RO_COMBO, key=len, reverse=True)

# step 2 (R2): 1 = delete, "ist" = replace, "ţ" = iune/iuni rule
_RO_STEP2_DELETE = (
    "ica", "abila", "ibila", "oasa", "ata", "ita", "anta", "uta", "iva",
    "ic", "ice", "abile", "ibile", "oase", "ate", "itate", "ite", "ante",
    "ute", "ive", "ici", "abili", "ibili", "atori", "osi", "ati", "itati",
    "iti", "anti", "uti", "ivi", "ităi", "oşi", "ităţi", "abil", "ibil",
    "ator", "os", "at", "it", "ant", "ut", "iv",
    "ică", "abilă", "ibilă", "oasă", "ată", "ită", "antă", "ută", "ivă")
_RO_STEP2_IST = ("isme", "iste", "isti", "işti", "ism", "ista", "istă",
                 "ist")
_RO_STEP2_IUNE = ("iune", "iuni")
_RO_STEP2_SUFS = sorted(_RO_STEP2_DELETE + _RO_STEP2_IST + _RO_STEP2_IUNE,
                        key=len, reverse=True)

# step 3 (RV-limited): verb suffixes; True = needs preceding non-vowel/'u'
_RO_VERB = {}
for _s in ("ea", "ia", "esc", "ăsc", "ind", "ând", "are", "ere", "ire",
           "âre", "ase", "ise", "use", "âse", "eşte", "ăşte", "eze", "ai",
           "eai", "iai", "eşti", "ăşti", "ui", "ezi", "âi", "aşi", "aseşi",
           "iseşi", "useşi", "âseşi", "işi", "uşi", "âşi", "eaţi", "iaţi",
           "arăţi", "aserăţi", "iserăţi", "userăţi", "âserăţi", "irăţi",
           "urăţi", "ârăţi", "am", "eam", "iam", "asem", "isem", "usem",
           "âsem", "arăm", "aserăm", "iserăm", "userăm", "âserăm", "irăm",
           "urăm", "ârăm", "au", "eau", "iau", "indu", "ându", "ez",
           "ească", "ară", "aseră", "iseră", "useră", "âseră", "iră",
           "ură", "âră", "ează"):
    _RO_VERB[_s] = True
for _s in ("se", "sese", "sei", "seşi", "seseşi", "aţi", "eţi", "iţi",
           "âţi", "serăţi", "seserăţi", "em", "sesem", "im", "âm", "ăm",
           "serăm", "seserăm", "seră", "seseră"):
    _RO_VERB[_s] = False
_RO_VERB_SUFS = sorted(_RO_VERB, key=len, reverse=True)

_RO_FINAL_VOWELS = ("ie", "a", "e", "i", "ă")


def romanian_stem(word: str) -> str:  # noqa: C901 — mirrors the spec's steps
    w = _ro_prelude(word)
    rv = _es_like_rv_ro(w)
    r1, r2 = _r1_r2(w, _RO_VOWELS)

    # step 0
    for suf in _RO_STEP0_SUFS:
        if not w.endswith(suf):
            continue
        pos = len(w) - len(suf)
        if pos >= r1:
            if suf == "ile" and w.endswith("abile"):
                break  # 'ile' preceded by 'ab': condition fails, no change
            rep = _RO_STEP0[suf]
            w = w[:pos] + (rep or "")
        break

    removed = False
    # step 1: combining suffixes, repeated. Longest match is structural:
    # an out-of-R1 longest match fails the step with no shorter fallback.
    while True:
        replaced = False
        for suf in _RO_COMBO_SUFS:
            if w.endswith(suf):
                if len(w) - len(suf) >= r1:
                    w = w[:len(w) - len(suf)] + _RO_COMBO[suf]
                    removed = True
                    replaced = True
                break
        if not replaced:
            break

    # step 2: standard suffixes (R2)
    for suf in _RO_STEP2_SUFS:
        if not w.endswith(suf):
            continue
        pos = len(w) - len(suf)
        if pos >= r2:
            if suf in _RO_STEP2_IUNE:
                # the 'ţ' lookbehind is NOT R2-confined (no setlimit here)
                if w[pos - 1:pos] == "ţ":
                    w = w[:pos - 1] + "t"
                    removed = True
            elif suf in _RO_STEP2_IST:
                w = w[:pos] + "ist"
                removed = True
            else:
                w = w[:pos]
                removed = True
        break

    # step 3: verb suffixes, only if steps 1-2 removed nothing;
    # matching is CONFINED to RV (setlimit tomark pV)
    if not removed:
        suf = _longest_in(w, _RO_VERB_SUFS, rv)
        if suf is not None:
            pos = len(w) - len(suf)
            if _RO_VERB[suf]:
                if pos - 1 >= rv and (w[pos - 1] not in _RO_VOWELS
                                      or w[pos - 1] == "u"):
                    w = w[:pos]
            else:
                w = w[:pos]

    # step 4: final vowel (longest of a/e/i/ie/ă, bracket in RV)
    for suf in _RO_FINAL_VOWELS:
        if w.endswith(suf):
            if len(w) - len(suf) >= rv:
                w = w[:len(w) - len(suf)]
            break

    return w.replace("I", "i").replace("U", "u")


def _es_like_rv_ro(w: str) -> int:
    return _es_like_rv(w, _RO_VOWELS)


SNOWBALL.update({"ro": romanian_stem, "romanian": romanian_stem})


# ---------------------------------------------------------------------------
# Hungarian (Snowball hungarian algorithm)
# ---------------------------------------------------------------------------

_HU_VOWELS = "aáeéiíoóöőuúüű"
_HU_DIGRAPHS = ("dzs", "cs", "gy", "ly", "ny", "sz", "ty", "zs")
_HU_DOUBLES = sorted(("bb", "cc", "ccs", "dd", "ff", "gg", "ggy", "jj",
                      "kk", "ll", "lly", "mm", "nn", "nny", "pp", "rr",
                      "ss", "ssz", "tt", "tty", "vv", "zz", "zzs"),
                     key=len, reverse=True)

_HU_CASE = ("ba", "ra", "be", "re", "ig", "nak", "nek", "val", "vel", "ul",
            "nál", "nél", "ból", "ról", "tól", "ül", "ből", "ről", "től",
            "n", "an", "ban", "en", "ben", "képpen", "on", "ön", "képp",
            "kor", "t", "at", "et", "ként", "anként", "enként", "onként",
            "ot", "ért", "öt", "hez", "hoz", "höz", "vá", "vé")
_HU_CASE_SUFS = sorted(_HU_CASE, key=len, reverse=True)

# suffix -> None (delete) | replacement
_HU_SPECIAL = {"ánként": "a", "án": "a", "én": "e"}
_HU_OTHER = {"astul": None, "estül": None, "ástul": "a", "éstül": "e",
             "stul": None, "stül": None}
_HU_OWNED = {"é": None, "ké": None, "aké": None, "eké": None, "oké": None,
             "öké": None, "áké": "a", "éké": "e", "éé": "e",
             "éi": None, "áéi": "a", "ééi": "e"}
_HU_SING_OWNER = {
    "a": None, "ja": None, "d": None, "ad": None, "ed": None, "od": None,
    "öd": None, "ád": "a", "éd": "e", "e": None, "je": None, "nk": None,
    "unk": None, "ünk": None, "ánk": "a", "énk": "e", "uk": None,
    "juk": None, "ük": None, "jük": None, "ájuk": "a", "éjük": "e",
    "m": None, "am": None, "em": None, "om": None, "ám": "a", "ém": "e",
    "o": None, "á": "a", "é": "e"}
_HU_PLUR_OWNER = {
    "id": None, "aid": None, "jaid": None, "eid": None, "jeid": None,
    "áid": "a", "éid": "e", "i": None, "ai": None, "jai": None,
    "ei": None, "jei": None, "ái": "a", "éi": "e", "itek": None,
    "eitek": None, "jeitek": None, "éitek": "e", "ik": None, "aik": None,
    "jaik": None, "eik": None, "jeik": None, "áik": "a", "éik": "e",
    "ink": None, "aink": None, "jaink": None, "eink": None, "jeink": None,
    "áink": "a", "éink": "e", "aitok": None, "jaitok": None, "áitok": "a",
    "im": None, "aim": None, "jaim": None, "eim": None, "jeim": None,
    "áim": "a", "éim": "e"}
_HU_PLURAL = {"k": None, "ak": None, "ek": None, "ok": None, "ök": None,
              "ák": "a", "ék": "e"}

for _t in (_HU_SPECIAL, _HU_OTHER, _HU_OWNED, _HU_SING_OWNER,
           _HU_PLUR_OWNER, _HU_PLURAL):
    _t["__sufs__"] = sorted((k for k in _t if k != "__sufs__"),
                            key=len, reverse=True)


def _hu_r1(w: str) -> int:
    n = len(w)
    if not n:
        return n
    if w[0] in _HU_VOWELS:
        i = 0
        while i < n and w[i] in _HU_VOWELS:
            i += 1
        if i >= n:
            return n
        for d in _HU_DIGRAPHS:
            if w.startswith(d, i):
                return min(i + len(d), n)
        return i + 1
    i = 0
    while i < n and w[i] not in _HU_VOWELS:
        i += 1
    return min(i + 1, n)


def _hu_ends_double(w: str):
    for d in _HU_DOUBLES:
        if w.endswith(d):
            return d
    return None


def _hu_apply(w: str, table: dict, r1: int) -> str:
    """Longest structural match + R1 check, delete or replace; no fallback."""
    for suf in table["__sufs__"]:
        if w.endswith(suf):
            pos = len(w) - len(suf)
            if pos >= r1:
                return w[:pos] + (table[suf] or "")
            return w
    return w


def hungarian_stem(word: str) -> str:
    w = word
    r1 = _hu_r1(w)

    # step 1: instrumental case (al/el after double consonant, undouble)
    for suf in ("al", "el"):
        if w.endswith(suf):
            pos = len(w) - 2
            if pos >= r1 and _hu_ends_double(w[:pos]):
                w = w[:pos]
                w = w[:-2] + w[-1]    # undouble: drop 2nd-to-last char
            break

    # step 2: frequent cases, then final á/é -> a/e (v_ending, itself
    # R1-checked: a pre-R1 á/é survives unconverted)
    for suf in _HU_CASE_SUFS:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                w = w[:len(w) - len(suf)]
                if w.endswith("á") and len(w) - 1 >= r1:
                    w = w[:-1] + "a"
                elif w.endswith("é") and len(w) - 1 >= r1:
                    w = w[:-1] + "e"
            break

    w = _hu_apply(w, _HU_SPECIAL, r1)      # step 3
    w = _hu_apply(w, _HU_OTHER, r1)        # step 4

    # step 5: factive á/é after double consonant, undouble
    for suf in ("á", "é"):
        if w.endswith(suf):
            pos = len(w) - 1
            if pos >= r1 and _hu_ends_double(w[:pos]):
                w = w[:pos]
                w = w[:-2] + w[-1]
            break

    w = _hu_apply(w, _HU_OWNED, r1)        # step 6
    w = _hu_apply(w, _HU_SING_OWNER, r1)   # step 7
    w = _hu_apply(w, _HU_PLUR_OWNER, r1)   # step 8
    w = _hu_apply(w, _HU_PLURAL, r1)       # step 9
    return w


SNOWBALL.update({"hu": hungarian_stem, "hungarian": hungarian_stem})


# ---------------------------------------------------------------------------
# Finnish (Snowball finnish algorithm)
# ---------------------------------------------------------------------------

_FI_VOWELS = "aeiouyäö"          # V1
_FI_V2 = "aeiouäö"               # V1 minus y (for the Vi condition)
_FI_PARTICLE_END = _FI_VOWELS + "nt"
_FI_LONG = ("aa", "ee", "ii", "oo", "uu", "ää", "öö")
_FI_CONS = "bcdfghjklmnpqrstvwxz"

_FI_PARTICLES = ("kään", "kaan", "sti", "han", "kin", "hän", "pa", "ko",
                 "pä", "kö")
_FI_P2_AN = ("lla", "na", "ssa", "lta", "sta", "ta")
_FI_P2_AEN = ("llä", "nä", "ssä", "ltä", "stä", "tä")
_FI_P2_EN = ("lle", "ine")

# step-3 case endings: (suffix, kind) — kind: char = required preceding
# char; "VI"/"LV" = guard; "del" = plain delete; "n"/"aä" = special
_FI_CASES = [("seen", "LV"), ("siin", "VI"), ("tten", "VI"),
             ("den", "VI"), ("tta", "e"), ("ttä", "e"),
             ("han", "a"), ("hen", "e"), ("hin", "i"), ("hon", "o"),
             ("hän", "ä"), ("hön", "ö"),
             ("lla", "del"), ("ssa", "del"), ("lta", "del"), ("sta", "del"),
             ("llä", "del"), ("ssä", "del"), ("ltä", "del"), ("stä", "del"),
             ("lle", "del"), ("ine", "del"), ("ksi", "del"),
             ("na", "del"), ("ta", "del"), ("nä", "del"), ("tä", "del"),
             ("a", "aä"), ("ä", "aä"), ("n", "n")]
_FI_CASES.sort(key=lambda e: len(e[0]), reverse=True)

_FI_STEP4_COND = ("mma", "mpa", "mmi", "mpi", "mmä", "mpä")   # not after po
_FI_STEP4_DEL = ("imma", "impa", "immi", "impi", "immä", "impä",
                 "eja", "ejä")
_FI_STEP4 = sorted(_FI_STEP4_COND + _FI_STEP4_DEL, key=len, reverse=True)


def _fi_ends_lv(w: str) -> bool:
    return w[-2:] in _FI_LONG


def _fi_ends_vi(w: str) -> bool:
    return len(w) >= 2 and w[-1] == "i" and w[-2] in _FI_V2


def finnish_stem(word: str) -> str:  # noqa: C901 — mirrors the spec's steps
    w = word
    r1, r2 = _r1_r2(w, _FI_VOWELS)
    ending_removed = False

    # step 1: particles (match confined to R1; preceding-char check is not)
    suf = _longest_in(w, _FI_PARTICLES, r1)
    if suf == "sti":
        if len(w) - 3 >= r2:
            w = w[:-3]
    elif suf is not None:
        pos = len(w) - len(suf)
        if pos >= 1 and w[pos - 1] in _FI_PARTICLE_END:
            w = w[:pos]

    # step 2: possessives (R1-confined match)
    suf = _longest_in(w, ("nsa", "nsä", "mme", "nne", "ni", "si",
                          "an", "en", "än"), r1)
    if suf == "si":
        if not w[:-2].endswith("k"):
            w = w[:-2]
    elif suf == "ni":
        w = w[:-2]
        if w.endswith("kse"):
            w = w[:-1] + "i"
    elif suf in ("nsa", "nsä", "mme", "nne"):
        w = w[:-3]
    elif suf == "an":
        if any(w[:-2].endswith(p) for p in _FI_P2_AN):
            w = w[:-2]
    elif suf == "än":
        if any(w[:-2].endswith(p) for p in _FI_P2_AEN):
            w = w[:-2]
    elif suf == "en":
        if any(w[:-2].endswith(p) for p in _FI_P2_EN):
            w = w[:-2]

    # step 3: case endings (R1-confined; guard failure falls back to 'n')
    for suf, kind in _FI_CASES:
        if not w.endswith(suf) or len(w) - len(suf) < r1:
            continue
        pos = len(w) - len(suf)
        if kind == "LV":
            if not _fi_ends_lv(w[:pos]):
                continue            # among fallback (-> 'n')
            w = w[:pos]
            ending_removed = True
        elif kind == "VI":
            if not _fi_ends_vi(w[:pos]):
                continue
            w = w[:pos]
            ending_removed = True
        elif kind == "del":
            w = w[:pos]
            ending_removed = True
        elif kind == "n":
            stem = w[:pos]
            if _fi_ends_lv(stem) or stem.endswith("ie"):
                stem = stem[:-1]
            w = stem
            ending_removed = True
        elif kind == "aä":
            if len(suf) == 1 and pos >= 2 and w[pos - 1] in _FI_VOWELS \
                    and w[pos - 2] in _FI_CONS:
                w = w[:pos]
                ending_removed = True
        else:  # required preceding char (han/hen/... tta/ttä)
            if w[pos - 1:pos] == kind:
                w = w[:pos]
                ending_removed = True
        break

    # step 4: comparatives/superlatives (R2-confined)
    suf = _longest_in(w, _FI_STEP4, r2)
    if suf in _FI_STEP4_COND:
        if not w[:-len(suf)].endswith("po"):
            w = w[:-len(suf)]
    elif suf is not None:
        w = w[:-len(suf)]

    # step 5: plurals
    if ending_removed:
        suf = _longest_in(w, ("i", "j"), r1)
        if suf:
            w = w[:-1]
    else:
        # final 't' in R1 preceded by a vowel that is itself in R1
        if w.endswith("t") and len(w) - 1 >= r1 and len(w) >= 2 \
                and w[-2] in _FI_VOWELS and (len(w) - 1) > r1:
            w = w[:-1]
            suf = _longest_in(w, ("imma", "mma"), r2)
            if suf == "imma":
                w = w[:-4]
            elif suf == "mma" and not w[:-3].endswith("po"):
                w = w[:-3]

    # step 6: tidy
    # a) long vowel at end (R1-confined): shorten
    if len(w) - 2 >= r1 and _fi_ends_lv(w):
        w = w[:-1]
    # b) cons + {a,e,i,ä} at end, both in R1: drop the vowel
    if len(w) >= 2 and w[-1] in "aeiä" and len(w) - 1 >= r1 \
            and len(w) - 1 > r1 and w[-2] in _FI_CONS:
        w = w[:-1]
    # c) 'oj'/'uj': drop the j (both chars within R1)
    if w[-2:] in ("oj", "uj") and len(w) - 2 >= r1:
        w = w[:-1]
    # d) 'jo': drop the o (both chars within R1)
    if w.endswith("jo") and len(w) - 2 >= r1:
        w = w[:-1]
    # e) double consonant before trailing vowels (NOT R1-confined): undouble
    i = len(w)
    while i > 0 and w[i - 1] in _FI_VOWELS:
        i -= 1
    if i >= 2 and w[i - 1] in _FI_CONS and w[i - 2] == w[i - 1]:
        w = w[:i - 1] + w[i:]
    return w


SNOWBALL.update({"fi": finnish_stem, "finnish": finnish_stem})


# ---------------------------------------------------------------------------
# Hindi (Snowball hindi — Ramanathan & Rao lightweight stemmer: protect the
# first character, strip the longest of 132 suffixes; a few entries require
# a preceding Devanagari consonant, falling back to shorter entries)
# ---------------------------------------------------------------------------

_HI_PLAIN = (
    'आँ', 'ाँ', 'इयाँ', 'आइयाँ', 'ाइयाँ', 'ियाँ', 'आं', 'उआं', 'ुआं', 'ईं',
    'आईं', 'ाईं', 'एं', 'आएं', 'उएं', 'ाएं', 'अताएं', 'अनाएं', 'ुएं', 'ओं',
    'आओं', 'उओं', 'ाओं', 'अताओं', 'अनाओं', 'ुओं', 'ां', 'इयां', 'आइयां',
    'ाइयां', 'ियां', 'ीं', 'अतीं', 'आतीं', 'ातीं', 'ें', 'ों', 'इयों',
    'आइयों', 'ाइयों', 'ियों', 'अ', 'आ', 'इ', 'ई', 'आई', 'ाई', 'उ', 'ऊ',
    'ए', 'आए', 'इए', 'आइए', 'ाइए', 'ाए', 'िए', 'ओ', 'आओ', 'ाओ', 'अकर',
    'आकर', 'ाकर', 'ा', 'ऊंगा', 'आऊंगा', 'ाऊंगा', 'ूंगा', 'एगा', 'आएगा',
    'ाएगा', 'ेगा', 'अता', 'आता', 'ाता', 'अना', 'आना', 'ाना', 'आया', 'ाया',
    'ि', 'ी', 'ऊंगी', 'आऊंगी', 'ाऊंगी', 'एंगी', 'आएंगी', 'ाएंगी', 'ूंगी',
    'ेंगी', 'एगी', 'आएगी', 'ाएगी', 'ओगी', 'आओगी', 'ाओगी', 'ेगी', 'ोगी',
    'अती', 'आती', 'ाती', 'अनी', 'ु', 'ू', 'े', 'एंगे', 'आएंगे', 'ाएंगे',
    'ेंगे', 'ओगे', 'आओगे', 'ाओगे', 'ोगे', 'अते', 'आते', 'ाते', 'अने',
    'आने', 'ाने', 'ो', '्',
)
_HI_GUARDED = (
    'ताएं', 'नाएं', 'ताओं', 'नाओं', 'तीं', 'कर', 'ता', 'ना', 'ती', 'नी',
    'ते', 'ने',
)
_HI_CONSONANTS = frozenset(
    "कखगघङचछजझञटठडढणतथदधनऩपफबभमयरऱलळऴवशषसह़क़ख़ग़ज़ड़ढ़फ़य़")
_HI_ALL = sorted(set(_HI_PLAIN) | set(_HI_GUARDED), key=len, reverse=True)


def hindi_stem(word: str) -> str:
    if not word:
        return word
    w = word
    for suf in _HI_ALL:
        pos = len(w) - len(suf)
        if pos < 1 or not w.endswith(suf):
            continue
        if suf in _HI_GUARDED and not (
                pos >= 2 and w[pos - 1] in _HI_CONSONANTS):
            continue        # among guard fails -> fall back to shorter
        return w[:pos]
    return w


# ---------------------------------------------------------------------------
# Nepali (Snowball nepali: category-1 postpositions with the e-matra
# exception, then repeat {conditional nasal/matra removal, category-3 verb
# suffix removal})
# ---------------------------------------------------------------------------

_NP_CAT1 = (
    'लाइ', 'लाई', 'सँग', 'संग', 'मार्फत', 'रत', 'का', 'मा', 'द्वारा', 'कि',
    'पछि', 'की', 'ले', 'कै', 'सँगै', 'मै', 'को',
)
_NP_CAT1_COND = frozenset(['का', 'कि', 'की', 'कै', 'को'])
_NP_CAT1_SUFS = sorted(_NP_CAT1, key=len, reverse=True)
_NP_CAT3 = (
    'थिए', 'छ', 'इछ', 'एछ', 'िछ', 'ेछ', 'नेछ', 'हुनेछ', 'इन्छ', 'िन्छ',
    'हुन्छ', 'एका', 'इएका', 'िएका', 'ेका', 'नेका', 'दा', 'इदा', 'िदा',
    'देखि', 'माथि', 'एकी', 'इएकी', 'िएकी', 'ेकी', 'देखी', 'थी', 'दी', 'छु',
    'एछु', 'ेछु', 'नेछु', 'नु', 'हरु', 'हरू', 'छे', 'थे', 'ने', 'एकै',
    'ेकै', 'नेकै', 'दै', 'इदै', 'िदै', 'एको', 'इएको', 'िएको', 'ेको',
    'नेको', 'दो', 'इदो', 'िदो', 'यो', 'इयो', 'भयो', 'ियो', 'थियो', 'दियो',
    'थ्यो', 'छौ', 'इछौ', 'एछौ', 'िछौ', 'ेछौ', 'नेछौ', 'यौ', 'थियौ', 'छ्यौ',
    'थ्यौ', 'छन्', 'इछन्', 'एछन्', 'िछन्', 'ेछन्', 'नेछन्', 'लान्', 'छिन्',
    'थिन्', 'पर्', 'इस्', 'थिइस्', 'छस्', 'इछस्', 'एछस्', 'िछस्', 'ेछस्',
    'नेछस्', 'िस्', 'थिस्', 'छेस्', 'होस्',
)
_NP_CAT3_SUFS = sorted(_NP_CAT3, key=len, reverse=True)


def nepali_stem(word: str) -> str:
    w = word
    # category 1: postpositions; का-family kept when preceded by ए or े
    for suf in _NP_CAT1_SUFS:
        if w.endswith(suf):
            pos = len(w) - len(suf)
            if suf in _NP_CAT1_COND:
                if not (w.endswith("ए", 0, pos) or w.endswith("े", 0, pos)):
                    w = w[:pos]
            else:
                w = w[:pos]
            break
    while True:
        # conditional category 2: trailing nasal/matra after specific stems
        if w.endswith(("ँ", "ं")):
            if w[:-1].endswith(("यौ", "छौ", "नौ", "थे")):
                w = w[:-1]
        elif w.endswith("ै"):
            if w[:-1].endswith("त्र"):
                w = w[:-1]
        # category 3: verb suffixes — repeat while one strips
        for suf in _NP_CAT3_SUFS:
            if w.endswith(suf):
                w = w[:len(w) - len(suf)]
                break
        else:
            break
    return w


# ---------------------------------------------------------------------------
# Armenian (Snowball armenian: all matching confined to RV = after the
# first vowel; case endings additionally require R2; then verb, adjective,
# and noun suffix tables apply in sequence)
# ---------------------------------------------------------------------------

_AM_VOWELS = "աեէըիուօ"
_AM_ENDING = sorted((
    'սա', 'վա', 'ամբ', 'դ', 'անդ', 'ությանդ', 'վանդ', 'ոջդ', 'երդ', 'ներդ',
    'ուդ', 'ը', 'անը', 'ությանը', 'վանը', 'ոջը', 'երը', 'ները', 'ի', 'վի',
    'երի', 'ների', 'անում', 'երում', 'ներում', 'ն', 'ան', 'ության', 'վան',
    'ին', 'երին', 'ներին', 'ությանն', 'երն', 'ներն', 'ուն', 'ոջ',
    'ությանս', 'վանս', 'ոջս', 'ով', 'անով', 'վով', 'երով', 'ներով', 'եր',
    'ներ', 'ց', 'ից', 'վանից', 'ոջից', 'վից', 'երից', 'ներից', 'ցից', 'ոց',
    'ուց',
), key=len, reverse=True)
_AM_VERB = sorted((
    'ա', 'ացա', 'եցա', 'վե', 'ացրի', 'ացի', 'եցի', 'վեցի', 'ալ', 'ըալ',
    'անալ', 'ենալ', 'ացնալ', 'ել', 'ըել', 'նել', 'ցնել', 'եցնել', 'չել',
    'վել', 'ացվել', 'եցվել', 'տել', 'ատել', 'ոտել', 'կոտել', 'ված', 'ում',
    'վում', 'ան', 'ցան', 'ացան', 'ացրին', 'ացին', 'եցին', 'վեցին', 'ալիս',
    'ելիս', 'ավ', 'ացավ', 'եցավ', 'ալով', 'ելով', 'ար', 'ացար', 'եցար',
    'ացրիր', 'ացիր', 'եցիր', 'վեցիր', 'աց', 'եց', 'ացրեց', 'ալուց',
    'ելուց', 'ալու', 'ելու', 'աք', 'ցաք', 'ացաք', 'ացրիք', 'ացիք', 'եցիք',
    'վեցիք', 'անք', 'ցանք', 'ացանք', 'ացրինք', 'ացինք', 'եցինք', 'վեցինք',
), key=len, reverse=True)
_AM_ADJ = sorted((
    'րորդ', 'երորդ', 'ալի', 'ակի', 'որակ', 'եղ', 'ական', 'արան', 'են',
    'եկեն', 'երեն', 'որէն', 'ին', 'գին', 'ովին', 'լայն', 'վուն', 'պես',
    'իվ', 'ատ', 'ավետ', 'կոտ', 'բար',
), key=len, reverse=True)
_AM_NOUN = sorted((
    'որդ', 'ույթ', 'ուհի', 'ցի', 'իլ', 'ակ', 'յակ', 'անակ', 'իկ', 'ուկ',
    'ան', 'պան', 'ստան', 'արան', 'եղէն', 'յուն', 'ություն', 'ածո', 'իչ',
    'ուս', 'ուստ', 'գար', 'վոր', 'ավոր', 'ոց', 'անօց', 'ու', 'ք', 'չեք',
    'իք', 'ալիք', 'անիք', 'վածք', 'ույք', 'ենք', 'ոնք', 'ունք', 'մունք',
    'իչք', 'արք',
), key=len, reverse=True)


def _am_gopast(w: str, j: int, want_vowel: bool):
    """Snowball gopast: advance until ONE char matching the class is
    passed; None when the scan runs off the end."""
    n = len(w)
    while j < n and (w[j] in _AM_VOWELS) != want_vowel:
        j += 1
    return j + 1 if j < n else None


def armenian_stem(word: str) -> str:
    w = word
    n = len(w)
    # pV: after first vowel; p2: standard R2 continued from pV
    rv = p2 = n
    j = _am_gopast(w, 0, True)
    if j is not None:
        rv = j
        for want in (False, True, False):
            j = _am_gopast(w, j, want)
            if j is None:
                break
        else:
            p2 = j
    suf = _longest_in(w, _AM_ENDING, rv)
    if suf and len(w) - len(suf) >= p2:
        w = w[:len(w) - len(suf)]
    for table in (_AM_VERB, _AM_ADJ, _AM_NOUN):
        suf = _longest_in(w, table, rv)
        if suf:
            w = w[:len(w) - len(suf)]
    return w


SNOWBALL.update({
    "in": hindi_stem, "hi": hindi_stem, "hindi": hindi_stem,
    "np": nepali_stem, "ne": nepali_stem, "nepali": nepali_stem,
    "am": armenian_stem, "hy": armenian_stem, "armenian": armenian_stem,
})


# ---------------------------------------------------------------------------
# Irish (Snowball irish: initial-mutation prefix cleanup, then noun /
# derivational / verb suffix tables gated on pV / R1 / R2)
# ---------------------------------------------------------------------------

_IE_VOWELS = "aeiouáéíóú"

# prefix -> replacement ('' = delete); longest match at word start
_IE_PREFIXES = {"b'": "", "d'": "", "h-": "", "m'": "", "n-": "", "t-": "",
                "bhf": "f", "d'fh": "f", "fh": "f", "sh": "s", "ts": "s",
                "bh": "b", "mb": "b", "ch": "c", "gc": "c", "dh": "d",
                "nd": "d", "gh": "g", "ng": "g", "bp": "p", "ph": "p",
                "dt": "t", "th": "t", "mh": "m"}
_IE_PREFIX_SUFS = sorted(_IE_PREFIXES, key=len, reverse=True)

_IE_NOUN_R1 = ("íochta", "aíochta", "abh", "eabh", "ibh", "aibh", "amh",
               "eamh", "imh", "aimh", "íocht", "aíocht")
_IE_NOUN_R2 = ("ire", "aire", "irí", "airí")
_IE_NOUN = sorted(_IE_NOUN_R1 + _IE_NOUN_R2, key=len, reverse=True)

_IE_DERIV_R2 = ("achta", "eachta", "ach", "each", "acht", "eacht",
                "achtúil", "eachtúil")
_IE_DERIV_REP = {}
for _sufs, _rep in ((("arcachta", "arcacht", "arcachtaí"), "arc"),
                    (("gineach", "gineas", "ginis"), "gin"),
                    (("grafaíochta", "grafaíoch", "grafaíocht",
                      "grafaíochtaí"), "graf"),
                    (("patacha", "paite", "patach", "pataigh"), "paite"),
                    (("óideacha", "óideach", "óidigh"), "óid")):
    for _s in _sufs:
        _IE_DERIV_REP[_s] = _rep
_IE_DERIV = sorted(_IE_DERIV_R2 + tuple(_IE_DERIV_REP), key=len,
                   reverse=True)

_IE_VERB_PV = ("imid", "aimid", "ímid", "aímid", "faidh", "fidh")
_IE_VERB_R1 = ("adh", "eadh", "áil", "ain", "tear", "tar")
_IE_VERB = sorted(_IE_VERB_PV + _IE_VERB_R1, key=len, reverse=True)


def irish_stem(word: str) -> str:
    w = word
    for pre in _IE_PREFIX_SUFS:
        if w.startswith(pre):
            w = _IE_PREFIXES[pre] + w[len(pre):]
            break
    # pV = after first vowel; R1/R2 standard
    n = len(w)
    pv = r1 = r2 = n
    i = 0
    while i < n and w[i] not in _IE_VOWELS:
        i += 1
    if i < n:
        pv = i + 1
        r1 = _r_std(w, _IE_VOWELS)
        r2 = _r_std(w, _IE_VOWELS, r1)
    # noun suffixes
    for suf in _IE_NOUN:
        if w.endswith(suf):
            pos = len(w) - len(suf)
            bound = r1 if suf in _IE_NOUN_R1 else r2
            if pos >= bound:
                w = w[:pos]
            break
    # derivational suffixes
    for suf in _IE_DERIV:
        if w.endswith(suf):
            pos = len(w) - len(suf)
            if suf in _IE_DERIV_REP:
                w = w[:pos] + _IE_DERIV_REP[suf]
            elif pos >= r2:
                w = w[:pos]
            break
    # verb suffixes
    for suf in _IE_VERB:
        if w.endswith(suf):
            pos = len(w) - len(suf)
            bound = pv if suf in _IE_VERB_PV else r1
            if pos >= bound:
                w = w[:pos]
            break
    return w


SNOWBALL.update({"ie": irish_stem, "ga": irish_stem, "irish": irish_stem})


# ---------------------------------------------------------------------------
# Lithuanian (Snowball lithuanian: R1 skips a leading 'a' on 7+-letter
# words; conflict-fixup replacements, one noun/verb ending, repeated
# derivational endings, č/dž and gd fixups)
# ---------------------------------------------------------------------------

_LT_VOWELS = "aeiouyąėęįūų"

_LT_CONFLICT = {'ojime': 'ojimas', 'ėjime': 'ėjimas', 'avime': 'avimas', 'okate': 'okatė', 'aite': 'aitė', 'uote': 'uotė', 'asius': 'asys', 'okatės': 'okatė', 'aitės': 'aitė', 'uotės': 'uotė', 'esiu': 'esys'}
_LT_CONFLICT_SUFS = sorted(_LT_CONFLICT, key=len, reverse=True)

_LT_STEP1 = (
    'tumeisi', 'tumėmės', 'tumėtės', 'enimis', 'iuosna', 'siuosi',
    'telėti', 'terėti', 'tumeis', 'tumėme', 'tumėte', 'čiausi', 'enims',
    'eniui', 'enyje', 'enyse', 'eriai', 'erimi', 'erims', 'eryje', 'eryse',
    'iamės', 'iatės', 'iauti', 'inėti', 'iomis', 'iosna', 'iuose', 'iuosi',
    'iuoti', 'kimės', 'siesi', 'simės', 'sitės', 'tumei', 'tumėm', 'tumėt',
    'uosna', 'ėjosi', 'aisi', 'amės', 'asis', 'atės', 'ausi', 'auti',
    'eisi', 'enie', 'enio', 'enis', 'eniu', 'enti', 'enys', 'eria', 'erie',
    'erys', 'iais', 'iame', 'iams', 'iasi', 'iate', 'iaus', 'iems', 'iesi',
    'imis', 'imės', 'inti', 'ioje', 'ioms', 'iose', 'ioti', 'iuje', 'iumi',
    'iuos', 'kite', 'omis', 'omės', 'osna', 'otės', 'sime', 'site', 'tute',
    'tųsi', 'uisi', 'umis', 'uose', 'uosi', 'uoti', 'ysis', 'ysna', 'čiau',
    'ėmis', 'ėmės', 'ėsna', 'ėtės', 'ais', 'ame', 'ams', 'asi', 'ate',
    'aus', 'ens', 'enį', 'ers', 'erį', 'erų', 'esi', 'iai', 'iam', 'ias',
    'iat', 'iau', 'iem', 'ies', 'imi', 'ims', 'ion', 'ios', 'isi', 'ite',
    'iui', 'iun', 'ius', 'iąs', 'oje', 'ome', 'oms', 'ose', 'osi', 'ote',
    'oti', 'sim', 'sit', 'siu', 'tum', 'tųs', 'uje', 'umi', 'ums', 'uos',
    'usi', 'yje', 'yse', 'yti', 'ąsi', 'ėje', 'ėjo', 'ėme', 'ėms', 'ėse',
    'ėsi', 'ėte', 'ėti', 'ųsi', 'ai', 'am', 'an', 'as', 'at', 'au', 'ei',
    'es', 'ia', 'ie', 'im', 'io', 'is', 'it', 'iu', 'ią', 'ių', 'ki', 'oj',
    'om', 'on', 'os', 'ot', 'si', 'ti', 'ui', 'un', 'uo', 'us', 'ys', 'ąs',
    'ėj', 'ėm', 'ėn', 'ės', 'ėt', 'įs', 'ūs', 'a', 'e', 'i', 'k', 'o', 's',
    'u', 'y', 'ą', 'ė', 'ę', 'į', 'ų',
)

_LT_STEP2 = (
    'utėait', 'siant', 'uliuk', 'učiuk', 'iais', 'iant', 'iaus', 'iuoj',
    'iuos', 'iuot', 'ykšt', 'ykšč', 'zgan', 'ain', 'ais', 'ant', 'auj',
    'aus', 'dam', 'dav', 'esn', 'iaj', 'ias', 'iau', 'iej', 'ies', 'ing',
    'int', 'ioj', 'iok', 'iop', 'ios', 'iuk', 'iul', 'iąj', 'iąs', 'išk',
    'iųj', 'jam', 'uoj', 'uos', 'uot', 'ėję', 'aj', 'am', 'oj', 'ok', 'op',
    'os', 'ot', 'sv', 'yl', 'yt', 'ąj', 'ąs', 'ėj', 'ėl', 'ėt', 'ęs', 'šv',
    'ųj', 'ę',
)


def _lt_fix_chdz(w: str) -> str:
    if w.endswith("dž"):
        return w[:-2] + "d"
    if w.endswith("č"):
        return w[:-1] + "t"
    return w


def lithuanian_stem(word: str) -> str:
    w = word
    start = 1 if w.startswith("a") and len(w) > 6 else 0
    r1 = _r_std(w, _LT_VOWELS, start)

    for suf in _LT_CONFLICT_SUFS:       # fix_conflicts (unrestricted)
        if w.endswith(suf):
            w = w[:len(w) - len(suf)] + _LT_CONFLICT[suf]
            break
    suf = _longest_in(w, _LT_STEP1, r1)
    if suf:
        w = w[:len(w) - len(suf)]
    w = _lt_fix_chdz(w)
    while True:
        suf = _longest_in(w, _LT_STEP2, r1)
        if not suf:
            break
        w = w[:len(w) - len(suf)]
    w = _lt_fix_chdz(w)
    if w.endswith("gd"):
        w = w[:-1]
    return w


SNOWBALL.update({"lt": lithuanian_stem, "lithuanian": lithuanian_stem})


# ---------------------------------------------------------------------------
# Turkish (Snowball turkish — Çilden's algorithm: vowel-harmony-checked
# suffix chains over a backward cursor. _TrC models the cursor as a
# distance-from-end so restores stay coherent across mid-chain deletions.)
# ---------------------------------------------------------------------------

_TR_VOWELS = "aeıioöuü"
_TR_U = "ıiuü"
_TR_HARMONY = {"a": "aıou", "e": "eiöü", "ı": "aı", "i": "ei",
               "o": "ou", "ö": "öü", "u": "ou", "ü": "öü"}


def _tr_tab(*items):
    return tuple(sorted(items, key=len, reverse=True))


_TR_POSS = _tr_tab("m", "n", "miz", "niz", "muz", "nuz", "müz", "nüz",
                   "mız", "nız")
_TR_LARI = _tr_tab("leri", "ları")
_TR_NU = _tr_tab("ni", "nu", "nü", "nı")
_TR_NUN = _tr_tab("in", "un", "ün", "ın")
_TR_YA = _tr_tab("a", "e")
_TR_NA = _tr_tab("na", "ne")
_TR_DA = _tr_tab("da", "ta", "de", "te")
_TR_NDA = _tr_tab("nda", "nde")
_TR_DAN = _tr_tab("dan", "tan", "den", "ten")
_TR_NDAN = _tr_tab("ndan", "nden")
_TR_YLA = _tr_tab("la", "le")
_TR_NCA = _tr_tab("ca", "ce")
_TR_YUM = _tr_tab("im", "um", "üm", "ım")
_TR_SUN = _tr_tab("sin", "sun", "sün", "sın")
_TR_YUZ = _tr_tab("iz", "uz", "üz", "ız")
_TR_SUNUZ = _tr_tab("siniz", "sunuz", "sünüz", "sınız")
_TR_LAR = _tr_tab("lar", "ler")
_TR_NUZ = _tr_tab("niz", "nuz", "nüz", "nız")
_TR_DUR = _tr_tab("dir", "tir", "dur", "tur", "dür", "tür", "dır", "tır")
_TR_CASINA = _tr_tab("casına", "cesine")
_TR_YDU = _tr_tab("di", "ti", "dik", "tik", "duk", "tuk", "dük", "tük",
                  "dık", "tık", "dim", "tim", "dum", "tum", "düm", "tüm",
                  "dım", "tım", "din", "tin", "dun", "tun", "dün", "tün",
                  "dın", "tın", "du", "tu", "dü", "tü", "dı", "tı")
_TR_YSA = _tr_tab("sa", "se", "sak", "sek", "sam", "sem", "san", "sen")
_TR_YMUS = _tr_tab("miş", "muş", "müş", "mış")


class _TrC:
    """Backward cursor; ``dfe`` = distance from end, ``bend`` = bracket."""
    __slots__ = ("w", "dfe", "bend", "flag")

    def __init__(self, w):
        self.w = w
        self.dfe = 0
        self.bend = 0
        self.flag = True

    def pos(self):
        return len(self.w) - self.dfe

    def mark(self):
        self.bend = self.dfe

    def delete(self):
        p = self.pos()
        self.w = self.w[:p] + self.w[len(self.w) - self.bend:]
        self.dfe = self.bend

    def eq(self, s):
        p = self.pos()
        if p >= len(s) and self.w[p - len(s):p] == s:
            self.dfe += len(s)
            return True
        return False

    def among(self, table):
        p = self.pos()
        for s in table:
            if p >= len(s) and self.w[p - len(s):p] == s:
                self.dfe += len(s)
                return True
        return False


def _tr_harmony(t):
    """check_vowel_harmony: last vowel must have an earlier harmony mate."""
    w, p = t.w, t.pos()
    i = p
    while i > 0 and w[i - 1] not in _TR_VOWELS:
        i -= 1
    if i == 0:
        return False
    req = _TR_HARMONY[w[i - 1]]
    j = i - 1
    while j > 0 and w[j - 1] not in req:
        j -= 1
    return j > 0


def _tr_opt_letter(t, ch):
    """mark_suffix_with_optional_{n,s,y}_consonant."""
    w, p = t.w, t.pos()
    if p >= 1 and w[p - 1] == ch:
        if p >= 2 and w[p - 2] in _TR_VOWELS:
            t.dfe += 1
            return True
        return False
    return p >= 2 and w[p - 2] in _TR_VOWELS


def _tr_opt_u(t):
    """mark_suffix_with_optional_U_vowel."""
    w, p = t.w, t.pos()
    if p >= 1 and w[p - 1] in _TR_U:
        if p >= 2 and w[p - 2] not in _TR_VOWELS:
            t.dfe += 1
            return True
        return False
    return p >= 2 and w[p - 2] not in _TR_VOWELS


def _mk_poss(t):
    return t.among(_TR_POSS) and _tr_opt_u(t)


def _mk_su(t):
    if not _tr_harmony(t):
        return False
    p = t.pos()
    if p >= 1 and t.w[p - 1] in _TR_U:
        t.dfe += 1
        return _tr_opt_letter(t, "s")
    return False


def _mk_lari(t):
    return t.among(_TR_LARI)


def _mk_yum(t):
    return _tr_harmony(t) and t.among(_TR_YUM) and _tr_opt_letter(t, "y")


def _mk_sun(t):
    return _tr_harmony(t) and t.among(_TR_SUN)


def _mk_yuz(t):
    return _tr_harmony(t) and t.among(_TR_YUZ) and _tr_opt_letter(t, "y")


def _mk_lar(t):
    return _tr_harmony(t) and t.among(_TR_LAR)


def _mk_ydu(t):
    return _tr_harmony(t) and t.among(_TR_YDU) and _tr_opt_letter(t, "y")


def _mk_ysa(t):
    return t.among(_TR_YSA) and _tr_opt_letter(t, "y")


def _mk_ymus(t):
    return _tr_harmony(t) and t.among(_TR_YMUS) and _tr_opt_letter(t, "y")


def _mk_yken(t):
    return t.eq("ken") and _tr_opt_letter(t, "y")


def _mk_da(t):
    return _tr_harmony(t) and t.among(_TR_DA)


def _mk_nda(t):
    return _tr_harmony(t) and t.among(_TR_NDA)


def _mk_dan(t):
    return _tr_harmony(t) and t.among(_TR_DAN)


def _mk_ndan(t):
    return _tr_harmony(t) and t.among(_TR_NDAN)


def _mk_na(t):
    return _tr_harmony(t) and t.among(_TR_NA)


def _mk_nu(t):
    return _tr_harmony(t) and t.among(_TR_NU)


def _mk_nun(t):
    return _tr_harmony(t) and t.among(_TR_NUN) and _tr_opt_letter(t, "n")


def _mk_ya(t):
    return _tr_harmony(t) and t.among(_TR_YA) and _tr_opt_letter(t, "y")


def _mk_yla(t):
    return _tr_harmony(t) and t.among(_TR_YLA) and _tr_opt_letter(t, "y")


def _mk_nca(t):
    return _tr_harmony(t) and t.among(_TR_NCA) and _tr_opt_letter(t, "n")


def _mk_casina(t):
    return t.among(_TR_CASINA)


def _mk_sunuz(t):
    return t.among(_TR_SUNUZ)


def _mk_dur(t):
    return _tr_harmony(t) and t.among(_TR_DUR)


def _mk_nuz(t):
    return _tr_harmony(t) and t.among(_TR_NUZ)


def _mk_yu(t):
    if not _tr_harmony(t):
        return False
    p = t.pos()
    if p >= 1 and t.w[p - 1] in _TR_U:
        t.dfe += 1
        return _tr_opt_letter(t, "y")
    return False


def _tr_alt(t, *fns):
    save = t.dfe
    for fn in fns:
        t.dfe = save
        if fn(t):
            return True
    t.dfe = save
    return False


def _tr_poss_or_su(t):
    save = t.dfe
    if _mk_poss(t):
        return True
    t.dfe = save
    return _mk_su(t)


def _tr_opt_lar_ki(t):
    """try([mark_lAr] delete stem_suffix_chain_before_ki-else-restore)."""
    a = t.dfe
    t.mark()
    if _mk_lar(t):
        t.delete()
        if not _tr_ki(t):
            t.dfe = a
    else:
        t.dfe = a


def _tr_nominal(t):
    """stem_nominal_verb_suffixes (w() in the compiled reference)."""
    t.mark()
    t.flag = True
    a0 = t.dfe
    while True:
        if _tr_alt(t, _mk_ymus, _mk_ydu, _mk_ysa, _mk_yken):
            break
        t.dfe = a0
        if _mk_casina(t):
            _tr_alt(t, _mk_sunuz, _mk_lar, _mk_yum, _mk_sun, _mk_yuz)
            if _mk_ymus(t):
                break
        t.dfe = a0
        if _mk_lar(t):
            t.delete()
            a1 = t.dfe
            t.mark()
            if not _tr_alt(t, _mk_dur, _mk_ydu, _mk_ysa, _mk_ymus):
                t.dfe = a1
            t.flag = False
            break
        t.dfe = a0
        if _mk_nuz(t):
            if _tr_alt(t, _mk_ydu, _mk_ysa):
                break
        t.dfe = a0
        if _tr_alt(t, _mk_sunuz, _mk_yuz, _mk_sun, _mk_yum):
            t.delete()
            a1 = t.dfe
            t.mark()
            if not _mk_ymus(t):
                t.dfe = a1
            break
        t.dfe = a0
        if not _mk_dur(t):
            return                     # nothing matched: no delete at all
        t.delete()
        a1 = t.dfe
        t.mark()
        _tr_alt(t, _mk_sunuz, _mk_lar, _mk_yum, _mk_sun, _mk_yuz)
        if not _mk_ymus(t):
            t.dfe = a1
        break
    t.delete()


def _tr_ki(t):
    """stem_suffix_chain_before_ki (u() in the compiled reference)."""
    t.mark()
    if not t.eq("ki"):
        return False
    a0 = t.dfe
    if _mk_da(t):
        t.delete()
        a = t.dfe
        t.mark()
        b0 = t.dfe
        if _mk_lar(t):
            t.delete()
            a = t.dfe
            if not _tr_ki(t):
                t.dfe = a
            return True
        t.dfe = b0
        if _mk_poss(t):
            t.delete()
            _tr_opt_lar_ki(t)
        else:
            t.dfe = b0
        return True
    t.dfe = a0
    if _mk_nun(t):
        t.delete()
        a = t.dfe
        t.mark()
        b0 = t.dfe
        if _mk_lari(t):
            t.delete()
            return True
        t.dfe = b0
        t.mark()
        if _tr_poss_or_su(t):
            t.delete()
            _tr_opt_lar_ki(t)
            return True
        t.dfe = b0
        if not _tr_ki(t):
            t.dfe = a
        return True
    t.dfe = a0
    if not _mk_nda(t):
        return False
    b0 = t.dfe
    if _mk_lari(t):
        t.delete()
        return True
    t.dfe = b0
    if _mk_su(t):
        t.delete()
        _tr_opt_lar_ki(t)
        return True
    t.dfe = b0
    return _tr_ki(t)


def _tr_noun(t):  # noqa: C901 — mirrors the reference's branch structure
    """stem_noun_suffixes (y() in the compiled reference)."""
    a0 = t.dfe
    t.mark()
    if _mk_lar(t):                              # 1: lAr
        t.delete()
        a = t.dfe
        if not _tr_ki(t):
            t.dfe = a
        return
    t.dfe = a0
    t.mark()
    if _mk_nca(t):                              # 2: ncA
        t.delete()
        a = t.dfe
        b0 = t.dfe
        t.mark()
        if _mk_lari(t):
            t.delete()
            return
        t.dfe = b0
        t.mark()
        if _tr_poss_or_su(t):
            t.delete()
            _tr_opt_lar_ki(t)
            return
        t.dfe = b0
        t.mark()
        if _mk_lar(t):
            t.delete()
            if not _tr_ki(t):
                t.dfe = a
        else:
            t.dfe = a
        return
    t.dfe = a0
    t.mark()
    if _tr_alt(t, _mk_nda, _mk_na):             # 3: ndA | nA
        b0 = t.dfe
        if _mk_lari(t):
            t.delete()
            return
        t.dfe = b0
        if _mk_su(t):
            t.delete()
            _tr_opt_lar_ki(t)
            return
        t.dfe = b0
        if _tr_ki(t):
            return
    t.dfe = a0
    t.mark()
    if _tr_alt(t, _mk_ndan, _mk_nu):            # 4: ndAn | nU
        b0 = t.dfe
        if _mk_su(t):
            t.delete()
            _tr_opt_lar_ki(t)
            return
        t.dfe = b0
        if _mk_lari(t):                         # matched but NOT deleted
            return                              # (reference quirk)
    t.dfe = a0
    t.mark()
    if _mk_dan(t):                              # 5: DAn
        t.delete()
        a = t.dfe
        t.mark()
        b0 = t.dfe
        if _mk_poss(t):
            t.delete()
            _tr_opt_lar_ki(t)
            return
        t.dfe = b0
        if _mk_lar(t):
            t.delete()
            a = t.dfe
            if not _tr_ki(t):
                t.dfe = a
            return
        t.dfe = b0
        if not _tr_ki(t):
            t.dfe = a
        return
    t.dfe = a0
    t.mark()
    if _tr_alt(t, _mk_nun, _mk_yla):            # 6: nUn | ylA
        t.delete()
        a = t.dfe
        b0 = t.dfe
        t.mark()
        if _mk_lar(t):
            t.delete()
            if _tr_ki(t):
                return
        t.dfe = b0                              # lAr deletion (if any) stays
        t.mark()
        if _tr_poss_or_su(t):
            t.delete()
            _tr_opt_lar_ki(t)
            return
        t.dfe = b0
        if not _tr_ki(t):
            t.dfe = a
        return
    t.dfe = a0
    t.mark()
    if _mk_lari(t):                             # 7: lArI
        t.delete()
        return
    t.dfe = a0
    if _tr_ki(t):                               # 8: bare ki chain
        return
    t.dfe = a0
    t.mark()
    if _tr_alt(t, _mk_da, _mk_yu, _mk_ya):      # 9: DA | yU | yA
        t.delete()
        a = t.dfe
        t.mark()
        b1 = t.dfe
        if _mk_poss(t):
            t.delete()
            b2 = t.dfe
            t.mark()
            if not _mk_lar(t):
                t.dfe = b2
        else:
            t.dfe = b1
            if not _mk_lar(t):
                t.dfe = a
                return
        t.delete()
        t.mark()
        if not _tr_ki(t):
            t.dfe = a
        return
    t.dfe = a0
    t.mark()
    if not _tr_poss_or_su(t):                   # 10: possessives | sU
        return
    t.delete()
    _tr_opt_lar_ki(t)


def turkish_stem(word: str) -> str:
    w = word
    if sum(1 for ch in w if ch in _TR_VOWELS) < 2:
        return w                    # more_than_one_syllable fails
    t = _TrC(w)
    t.dfe = 0
    _tr_nominal(t)
    t.dfe = 0
    if not t.flag:
        return t.w                  # lAr verb branch: skip nouns + postlude
    _tr_noun(t)
    w = t.w
    if w in ("ad", "soyad"):        # is_reserved_word: skip postlude
        return w
    # append_U_to_stems_ending_with_d_or_g
    if w.endswith(("d", "g")):
        i = len(w)
        while i > 0 and w[i - 1] not in _TR_VOWELS:
            i -= 1
        if i > 0:
            v = w[i - 1]
            if v in "aı":
                w += "ı"
            elif v in "ei":
                w += "i"
            elif v in "ou":
                w += "u"
            else:
                w += "ü"
    # post_process_last_consonants
    if w.endswith("b"):
        w = w[:-1] + "p"
    elif w.endswith("c"):
        w = w[:-1] + "ç"
    elif w.endswith("d"):
        w = w[:-1] + "t"
    elif w.endswith("ğ"):
        w = w[:-1] + "k"
    return w


SNOWBALL.update({"tr": turkish_stem, "turkish": turkish_stem})
