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


# ---------------------------------------------------------------------------
# Serbian (Snowball serbian: Cyrillic-to-Latin transliteration, ije/je/dj
# prelude, syllabic-r-aware R1, one unrestricted replacement step, one huge
# R1-gated replacement step, and an R1-gated deletion step. Entries flagged
# True additionally require the word to be free of č/ć/đ/š/ž — the
# ASCII-approximation mode.)
# ---------------------------------------------------------------------------

_RS_CYR = {'а': 'a', 'б': 'b', 'в': 'v', 'г': 'g', 'д': 'd', 'е': 'e', 'ж': 'ž', 'з': 'z', 'и': 'i', 'к': 'k', 'л': 'l', 'м': 'm', 'н': 'n', 'о': 'o', 'п': 'p', 'р': 'r', 'с': 's', 'т': 't', 'у': 'u', 'ф': 'f', 'х': 'h', 'ц': 'c', 'ч': 'č', 'ш': 'š', 'ђ': 'đ', 'ј': 'j', 'љ': 'lj', 'њ': 'nj', 'ћ': 'ć', 'џ': 'dž'}
_RS_CONS = frozenset("bcdfghjklmnprstvzćčđšž")
_RS_SPECIAL = frozenset("ćčđšž")
_RS_VOWELS = frozenset("aeiou")

_RS_STEP1 = {
    'teticima': ('tetika', False), 'centara': ('centra', False),
    'kustava': ('kustva', False), 'tvenici': ('tvenik', False),
    'atcima': ('atka', False), 'avilan': ('avilni', False),
    'centar': ('centra', False), 'inzima': ('ing', False),
    'istara': ('istra', False), 'jacima': ('jak', False),
    'lozima': ('loga', False), 'metara': ('metra', False),
    'nicima': ('nik', False), 'nstava': ('nstva', False),
    'pesima': ('peh', False), 'pletan': ('pletni', False),
    'pravan': ('pravni', False), 'stavan': ('stavni', False),
    'tetici': ('tetika', False), 'ticima': ('tik', False),
    'utcima': ('utka', False), 'voljan': ('voljni', False),
    'zicima': ('zik', False), 'acaka': ('acka', True),
    'ajaca': ('ajca', False), 'ajaka': ('ajka', False),
    'alaca': ('alca', False), 'anaka': ('anki', False),
    'anata': ('anta', False), 'anjac': ('anjca', False),
    'antan': ('antni', False), 'ataka': ('atka', False),
    'ačaka': ('ačka', False), 'bilan': ('bilni', False),
    'bojci': ('bojka', False), 'cajan': ('cajni', True),
    'dusan': ('dusni', True), 'dušan': ('dušni', False),
    'ejaca': ('ejca', False), 'ekata': ('ekta', False),
    'elaca': ('elca', False), 'esama': ('esma', False),
    'eskan': ('eskna', False), 'etaka': ('etka', False),
    'gilan': ('gilni', False), 'istar': ('istra', False),
    'itaka': ('itka', False), 'izama': ('izma', False),
    'kusan': ('kusni', False), 'laran': ('larni', False),
    'ljaca': ('ljca', False), 'metar': ('metra', False),
    'nilan': ('nilni', False), 'njaca': ('njca', False),
    'ojaca': ('ojca', False), 'ojaka': ('ojka', False),
    'ojsci': ('ojska', False), 'olaca': ('olca', False),
    'otaka': ('otka', False), 'rilan': ('rilni', False),
    'silan': ('silni', False), 'sivan': ('sivni', False),
    'snici': ('snik', False), 'tetan': ('tetni', False),
    'tican': ('ticni', True), 'tilan': ('tilni', False),
    'tivan': ('tivni', False), 'tičan': ('tični', False),
    'utaka': ('utka', False), 'vojci': ('vojka', False),
    'čajan': ('čajni', False), 'čcima': ('čka', False),
    'acak': ('acka', True), 'ajac': ('ajca', False),
    'alac': ('alca', False), 'alan': ('alni', False),
    'aoca': ('alca', False), 'asan': ('asni', True),
    'atak': ('atka', False), 'atan': ('atni', False),
    'atci': ('atka', False), 'ačak': ('ačka', False),
    'ašan': ('ašni', False), 'baci': ('baci', False),
    'daba': ('dba', False), 'ejac': ('ejca', False),
    'ekat': ('ekta', False), 'elac': ('elca', False),
    'enat': ('enta', False), 'eran': ('erni', False),
    'esan': ('esni', False), 'etak': ('etka', False),
    'inzi': ('ing', False), 'itak': ('itka', False),
    'itci': ('itka', False), 'izam': ('izma', False),
    'jaci': ('jak', False), 'jebe': ('jebi', False),
    'kuse': ('kusi', False), 'ljac': ('ljca', False),
    'lozi': ('loga', False), 'maca': ('mca', False),
    'naca': ('nca', False), 'njac': ('njca', False),
    'ojac': ('ojca', False), 'olac': ('olca', False),
    'olce': ('olca', False), 'oscu': ('osti', True),
    'otak': ('otka', False), 'ozan': ('ozni', False),
    'ošću': ('osti', False), 'pesi': ('peh', False),
    'raca': ('rca', False), 'rave': ('ravi', False),
    'saca': ('sca', False), 'save': ('savi', True),
    'usak': ('uska', True), 'utak': ('utka', False),
    'utci': ('utka', False), 'ušak': ('uška', False),
    'vaca': ('vca', False), 'šaca': ('šca', False),
    'šave': ('šavi', False), 'mac': ('mca', False),
    'nac': ('nca', False), 'rac': ('rca', False), 'sac': ('sca', False),
    'vac': ('vca', False), 'čci': ('čka', False), 'šac': ('šca', False),
}
_RS_STEP1_SUFS = sorted(_RS_STEP1, key=len, reverse=True)
_RS_STEP2 = {
    'astadosmo': ('asta', False), 'astadoste': ('asta', False),
    'astajasmo': ('astaj', False), 'astajaste': ('astaj', False),
    'evitijega': ('evit', False), 'evitijemu': ('evit', False),
    'evitijima': ('evit', False), 'istadosmo': ('ista', False),
    'istadoste': ('ista', False), 'istajasmo': ('istaj', False),
    'istajaste': ('istaj', False), 'ostadosmo': ('osta', False),
    'ostadoste': ('osta', False), 'ostajasmo': ('ostaj', False),
    'ostajaste': ('ostaj', False), 'ovitijega': ('ovit', False),
    'ovitijemu': ('ovit', False), 'ovitijima': ('ovit', False),
    'anjijega': ('anj', False), 'anjijemu': ('anj', False),
    'anjijima': ('anj', False), 'astademo': ('asta', False),
    'astadete': ('asta', False), 'astadose': ('asta', True),
    'astadoše': ('asta', False), 'astajahu': ('astaj', False),
    'astajala': ('astaj', False), 'astajale': ('astaj', False),
    'astajali': ('astaj', False), 'astajalo': ('astaj', False),
    'astajase': ('astaj', True), 'astajati': ('astaj', False),
    'astajaše': ('astaj', False), 'astajemo': ('astaj', False),
    'astajete': ('astaj', False), 'astajuci': ('astaj', True),
    'astajući': ('astaj', False), 'astanemo': ('asta', False),
    'astanete': ('asta', False), 'astanila': ('asta', False),
    'astanimo': ('asta', False), 'astanite': ('asta', False),
    'astijega': ('ast', False), 'astijemu': ('ast', False),
    'astijima': ('ast', False), 'cajevima': ('caj', False),
    'enjijega': ('enj', False), 'enjijemu': ('enj', False),
    'enjijima': ('enj', False), 'evitijeg': ('evit', False),
    'evitijem': ('evit', False), 'evitijih': ('evit', False),
    'evitijim': ('evit', False), 'evitijoj': ('evit', False),
    'ganijama': ('ganij', False), 'ganijima': ('ganij', False),
    'istademo': ('ista', False), 'istadete': ('ista', False),
    'istadose': ('ista', True), 'istadoše': ('ista', False),
    'istajahu': ('istaj', False), 'istajala': ('istaj', False),
    'istajale': ('istaj', False), 'istajali': ('istaj', False),
    'istajalo': ('istaj', False), 'istajase': ('istaj', True),
    'istajati': ('istaj', False), 'istajaše': ('istaj', False),
    'istajemo': ('istaj', False), 'istajete': ('istaj', False),
    'istajuci': ('istaj', True), 'istajući': ('istaj', False),
    'istanemo': ('ista', False), 'istanete': ('ista', False),
    'istanila': ('ista', False), 'istanimo': ('ista', False),
    'istanite': ('ista', False), 'lajevima': ('laj', False),
    'lucujemo': ('luc', True), 'lucujete': ('luc', True),
    'lucujuci': ('luc', True), 'lučujemo': ('luč', False),
    'lučujete': ('luč', False), 'lučujući': ('luč', False),
    'manijama': ('manij', False), 'manijima': ('manij', False),
    'ostademo': ('osta', False), 'ostadete': ('osta', False),
    'ostadose': ('osta', True), 'ostadoše': ('osta', False),
    'ostajahu': ('ostaj', False), 'ostajala': ('ostaj', False),
    'ostajale': ('ostaj', False), 'ostajali': ('ostaj', False),
    'ostajalo': ('ostaj', False), 'ostajase': ('ostaj', True),
    'ostajati': ('ostaj', False), 'ostajaše': ('ostaj', False),
    'ostajemo': ('ostaj', False), 'ostajete': ('ostaj', False),
    'ostajuci': ('ostaj', True), 'ostajući': ('ostaj', False),
    'ostanemo': ('osta', False), 'ostanete': ('osta', False),
    'ostanila': ('osta', False), 'ostanimo': ('osta', False),
    'ostanite': ('osta', False), 'ovitijeg': ('ovit', False),
    'ovitijem': ('ovit', False), 'ovitijih': ('ovit', False),
    'ovitijim': ('ovit', False), 'ovitijoj': ('ovit', False),
    'panijama': ('panij', False), 'panijima': ('panij', False),
    'rajevima': ('raj', False), 'ranijama': ('ranij', False),
    'ranijima': ('ranij', False), 'snjijega': ('snj', True),
    'snjijemu': ('snj', True), 'snjijima': ('snj', True),
    'tanijama': ('tanij', False), 'tanijima': ('tanij', False),
    'ćajevima': ('ćaj', False), 'čajevima': ('čaj', False),
    'đajevima': ('đaj', False), 'šnjijega': ('šnj', False),
    'šnjijemu': ('šnj', False), 'šnjijima': ('šnj', False),
    'ajevima': ('aj', False), 'anjijeg': ('anj', False),
    'anjijem': ('anj', False), 'anjijih': ('anj', False),
    'anjijim': ('anj', False), 'anjijoj': ('anj', False),
    'astadem': ('asta', False), 'astades': ('asta', True),
    'astadeš': ('asta', False), 'astadoh': ('asta', False),
    'astajah': ('astaj', False), 'astajao': ('astaj', False),
    'astajat': ('astaj', False), 'astajem': ('astaj', False),
    'astajes': ('astaj', True), 'astaješ': ('astaj', False),
    'astajmo': ('astaj', False), 'astajte': ('astaj', False),
    'astanem': ('asta', False), 'astanes': ('asta', True),
    'astaneš': ('asta', False), 'astavsi': ('asta', True),
    'astavši': ('asta', False), 'astijeg': ('ast', False),
    'astijem': ('ast', False), 'astijih': ('ast', False),
    'astijim': ('ast', False), 'astijoj': ('ast', False),
    'atijega': ('at', False), 'atijemu': ('at', False),
    'atijima': ('at', False), 'avajuci': ('ava', True),
    'avajući': ('ava', False), 'avijega': ('av', False),
    'avijemu': ('av', False), 'avijima': ('av', False),
    'elijega': ('el', False), 'elijemu': ('el', False),
    'elijima': ('el', False), 'enjijeg': ('enj', False),
    'enjijem': ('enj', False), 'enjijih': ('enj', False),
    'enjijim': ('enj', False), 'enjijoj': ('enj', False),
    'evajuci': ('eva', True), 'evajući': ('eva', False),
    'evijega': ('ev', False), 'evijemu': ('ev', False),
    'evijima': ('ev', False), 'evitega': ('evit', False),
    'evitemu': ('evit', False), 'evitija': ('evit', False),
    'evitije': ('evit', False), 'evitiji': ('evit', False),
    'evitima': ('evit', False), 'evitoga': ('evit', False),
    'evitome': ('evit', False), 'evitomu': ('evit', False),
    'ganijom': ('ganij', False), 'ijalama': ('ijal', False),
    'ijalima': ('ijal', False), 'ikatima': ('ikat', False),
    'injasmo': ('inj', False), 'injaste': ('inj', False),
    'irajuci': ('ir', True), 'irajući': ('ir', False),
    'irujemo': ('ir', False), 'irujete': ('ir', False),
    'irujuci': ('ir', True), 'irujući': ('ir', False),
    'istadem': ('ista', False), 'istades': ('ista', True),
    'istadeš': ('ista', False), 'istadoh': ('ista', False),
    'istajah': ('istaj', False), 'istajao': ('istaj', False),
    'istajat': ('istaj', False), 'istajem': ('istaj', False),
    'istajes': ('istaj', True), 'istaješ': ('istaj', False),
    'istajmo': ('istaj', False), 'istajte': ('istaj', False),
    'istanem': ('ista', False), 'istanes': ('ista', True),
    'istaneš': ('ista', False), 'istavsi': ('ista', True),
    'istavši': ('ista', False), 'ivajuci': ('iva', True),
    'ivajući': ('iva', False), 'ivijega': ('iv', False),
    'ivijemu': ('iv', False), 'ivijima': ('iv', False),
    'jetismo': ('jeti', False), 'jetiste': ('jeti', False),
    'lucismo': ('luc', True), 'luciste': ('luc', True),
    'lucujem': ('luc', True), 'lucujes': ('luc', True),
    'lucujmo': ('luc', True), 'lucujte': ('luc', True),
    'lučismo': ('luč', False), 'lučiste': ('luč', False),
    'lučujem': ('luč', False), 'lučuješ': ('luč', False),
    'lučujmo': ('luč', False), 'lučujte': ('luč', False),
    'manijom': ('manij', False), 'olovima': ('olov', False),
    'onovima': ('on', False), 'osijega': ('os', True),
    'osijemu': ('os', True), 'osijima': ('os', True),
    'ostadem': ('osta', False), 'ostades': ('osta', True),
    'ostadeš': ('osta', False), 'ostadoh': ('osta', False),
    'ostajah': ('ostaj', False), 'ostajao': ('ostaj', False),
    'ostajat': ('ostaj', False), 'ostajem': ('ostaj', False),
    'ostajes': ('ostaj', True), 'ostaješ': ('ostaj', False),
    'ostajmo': ('ostaj', False), 'ostajte': ('ostaj', False),
    'ostanem': ('osta', False), 'ostanes': ('osta', True),
    'ostaneš': ('osta', False), 'ostavsi': ('osta', True),
    'ostavši': ('osta', False), 'ovijega': ('ov', False),
    'ovijemu': ('ov', False), 'ovijima': ('ov', False),
    'ovitega': ('ovit', False), 'ovitemu': ('ovit', False),
    'ovitija': ('ovit', False), 'ovitije': ('ovit', False),
    'ovitiji': ('ovit', False), 'ovitima': ('ovit', False),
    'ovitoga': ('ovit', False), 'ovitome': ('ovit', False),
    'ovitomu': ('ovit', False), 'ozilima': ('ozil', False),
    'ošijega': ('oš', False), 'ošijemu': ('oš', False),
    'ošijima': ('oš', False), 'panijom': ('panij', False),
    'ranijom': ('ranij', False), 'rarijem': ('rari', False),
    'rosismo': ('rosi', True), 'rosiste': ('rosi', True),
    'rosivsi': ('rosi', True), 'rošismo': ('roši', False),
    'rošiste': ('roši', False), 'rošivši': ('roši', False),
    'skijega': ('sk', False), 'skijemu': ('sk', False),
    'skijima': ('sk', False), 'snjijeg': ('snj', True),
    'snjijem': ('os', True), 'snjijih': ('snj', True),
    'snjijim': ('snj', True), 'snjijoj': ('snj', True),
    'tanijom': ('tanij', False), 'ugovima': ('ugov', False),
    'urajuci': ('ur', True), 'urajući': ('ur', False),
    'uvajuci': ('uva', True), 'uvajući': ('uva', False),
    'škijega': ('šk', False), 'škijemu': ('šk', False),
    'škijima': ('šk', False), 'šnjijeg': ('šnj', False),
    'šnjijem': ('šnj', False), 'šnjijih': ('šnj', False),
    'šnjijim': ('šnj', False), 'šnjijoj': ('šnj', False),
    'acasmo': ('aca', True), 'acaste': ('aca', True),
    'acavsi': ('aca', True), 'acismo': ('ac', True),
    'aciste': ('ac', True), 'aninom': ('an', False),
    'anjega': ('anj', False), 'anjemu': ('anj', False),
    'anjija': ('anj', False), 'anjije': ('anj', False),
    'anjiji': ('anj', False), 'anjiju': ('anj', False),
    'anjima': ('anj', False), 'anjoga': ('anj', False),
    'anjome': ('anj', False), 'anjomu': ('anj', False),
    'astade': ('asta', False), 'astadu': ('asta', False),
    'astaje': ('astaj', False), 'astaju': ('astaj', False),
    'astala': ('asta', False), 'astale': ('asta', False),
    'astali': ('asta', False), 'astalo': ('asta', False),
    'astane': ('asta', False), 'astanu': ('asta', False),
    'astati': ('asta', False), 'astega': ('ast', False),
    'astemo': ('as', False), 'astemu': ('ast', False),
    'astete': ('as', False), 'astija': ('ast', False),
    'astije': ('ast', False), 'astiji': ('ast', False),
    'astima': ('ast', False), 'astimo': ('as', False),
    'astite': ('as', False), 'astoga': ('ast', False),
    'astome': ('ast', False), 'astomu': ('ast', False),
    'astuci': ('as', True), 'astući': ('as', False),
    'atijeg': ('at', False), 'atijem': ('at', False),
    'atijih': ('at', False), 'atijim': ('at', False),
    'avajmo': ('ava', False), 'avajte': ('ava', False),
    'avasmo': ('ava', False), 'avaste': ('ava', False),
    'avijeg': ('av', False), 'avijem': ('av', False),
    'avijih': ('av', False), 'avijim': ('av', False),
    'avijoj': ('av', False), 'ačasmo': ('ača', False),
    'ačaste': ('ača', False), 'ačavši': ('ača', False),
    'ačismo': ('ač', False), 'ačiste': ('ač', False),
    'basama': ('bas', True), 'basima': ('bas', True),
    'bašama': ('baš', False), 'bašima': ('baš', False),
    'bijama': ('bij', False), 'bijima': ('bij', False),
    'cajama': ('caj', False), 'cajeva': ('caj', False),
    'cajeve': ('caj', False), 'cajevi': ('caj', False),
    'cajima': ('caj', False), 'cijama': ('cij', False),
    'cijima': ('cij', False), 'cinama': ('cin', True),
    'cinima': ('cin', True), 'cinoga': ('cin', True),
    'cinome': ('cin', True), 'cinomu': ('cin', True),
    'dijama': ('dij', False), 'dijima': ('dij', False),
    'elijeg': ('el', False), 'elijem': ('el', False),
    'elijih': ('el', False), 'elijim': ('el', False),
    'elijoj': ('el', False), 'enjega': ('enj', False),
    'enjemu': ('enj', False), 'enjija': ('enj', False),
    'enjije': ('enj', False), 'enjiji': ('enj', False),
    'enjiju': ('enj', False), 'enjima': ('enj', False),
    'enjoga': ('enj', False), 'enjome': ('enj', False),
    'enjomu': ('enj', False), 'estama': ('est', False),
    'estima': ('est', False), 'etavsi': ('et', True),
    'etavši': ('et', False), 'evajmo': ('eva', False),
    'evajte': ('eva', False), 'evasmo': ('eva', False),
    'evaste': ('eva', False), 'evijeg': ('ev', False),
    'evijem': ('ev', False), 'evijih': ('ev', False),
    'evijim': ('ev', False), 'evijoj': ('ev', False),
    'evitem': ('evit', False), 'evitih': ('evit', False),
    'evitim': ('evit', False), 'evitog': ('evit', False),
    'evitoj': ('evit', False), 'evitom': ('evit', False),
    'fijama': ('fij', False), 'fijima': ('fij', False),
    'ganija': ('ganij', False), 'ganije': ('ganij', False),
    'ganiji': ('ganij', False), 'ganiju': ('ganij', False),
    'gasama': ('gas', True), 'gasima': ('gas', True),
    'gašama': ('gaš', False), 'gašima': ('gaš', False),
    'gijama': ('gij', False), 'gijima': ('gij', False),
    'govima': ('g', False), 'ijalom': ('ijal', False),
    'ikatom': ('ikat', False), 'injahu': ('inj', False),
    'injala': ('inj', False), 'injale': ('inj', False),
    'injali': ('inj', False), 'injalo': ('inj', False),
    'injase': ('inj', True), 'injati': ('inj', False),
    'injaše': ('inj', False), 'injemo': ('inj', False),
    'injete': ('inj', False), 'irasmo': ('ir', False),
    'iraste': ('ir', False), 'iravsi': ('ir', True),
    'iravši': ('ir', False), 'irivat': ('ir', False),
    'irujem': ('ir', False), 'irujes': ('ir', True),
    'iruješ': ('ir', False), 'irujmo': ('ir', False),
    'irujte': ('ir', False), 'istade': ('ista', False),
    'istadu': ('ista', False), 'istaje': ('istaj', False),
    'istaju': ('istaj', False), 'istala': ('ista', False),
    'istale': ('ista', False), 'istali': ('ista', False),
    'istalo': ('ista', False), 'istama': ('ist', False),
    'istane': ('ista', False), 'istanu': ('ista', False),
    'istati': ('ista', False), 'istima': ('ist', False),
    'ivajmo': ('iva', False), 'ivajte': ('iva', False),
    'ivasmo': ('iva', False), 'ivaste': ('iva', False),
    'ivijeg': ('iv', False), 'ivijem': ('iv', False),
    'ivijih': ('iv', False), 'ivijim': ('iv', False),
    'ivijoj': ('iv', False), 'ištima': ('išt', False),
    'jasama': ('jas', True), 'jasima': ('jas', True),
    'jašama': ('jaš', False), 'jašima': ('jaš', False),
    'jetila': ('jeti', False), 'jetile': ('jeti', False),
    'jetili': ('jeti', False), 'jetilo': ('jeti', False),
    'jetimo': ('jeti', False), 'jetise': ('jeti', True),
    'jetite': ('jeti', False), 'jetiti': ('jeti', False),
    'jetiše': ('jeti', False), 'kasama': ('kas', True),
    'kasima': ('kas', True), 'kašama': ('kaš', False),
    'kašima': ('kaš', False), 'kijega': ('k', False),
    'kijemu': ('k', False), 'kijima': ('k', False),
    'kstama': ('kst', False), 'kstima': ('kst', False),
    'lajama': ('laj', False), 'lajeva': ('laj', False),
    'lajeve': ('laj', False), 'lajevi': ('laj', False),
    'lajima': ('laj', False), 'latima': ('lat', False),
    'lemama': ('lem', False), 'lemima': ('lem', False),
    'lijama': ('lij', False), 'lijima': ('lij', False),
    'logama': ('log', False), 'lovima': ('lov', False),
    'lucena': ('luc', True), 'lucene': ('luc', True),
    'luceni': ('luc', True), 'luceno': ('luc', True),
    'lucila': ('luc', True), 'lucile': ('luc', True),
    'lucili': ('luc', True), 'lucilo': ('luc', True),
    'lucimo': ('luc', True), 'lucise': ('luc', True),
    'lucite': ('luc', True), 'luciti': ('luc', True),
    'lucuje': ('luc', True), 'lucuju': ('luc', True),
    'lučena': ('luč', False), 'lučene': ('luč', False),
    'lučeni': ('luč', False), 'lučeno': ('luč', False),
    'lučila': ('luč', False), 'lučile': ('luč', False),
    'lučili': ('luč', False), 'lučilo': ('luč', False),
    'lučimo': ('luč', False), 'lučite': ('luč', False),
    'lučiti': ('luč', False), 'lučiše': ('luč', False),
    'lučuje': ('luč', False), 'lučuju': ('luč', False),
    'manija': ('manij', False), 'manije': ('manij', False),
    'maniji': ('manij', False), 'maniju': ('manij', False),
    'mijama': ('mij', False), 'mijima': ('mij', False),
    'movima': ('mov', False), 'nalama': ('nal', False),
    'nalima': ('nal', False), 'nasama': ('nas', True),
    'nasima': ('nas', True), 'našama': ('naš', False),
    'našima': ('naš', False), 'nijama': ('nij', False),
    'nijega': ('n', False), 'nijemu': ('n', False),
    'nijima': ('n', False), 'osijeg': ('os', True),
    'osijem': ('os', True), 'osijih': ('os', True),
    'osijim': ('os', True), 'osijoj': ('os', True),
    'ostade': ('osta', False), 'ostadu': ('osta', False),
    'ostaje': ('ostaj', False), 'ostaju': ('ostaj', False),
    'ostala': ('osta', False), 'ostale': ('osta', False),
    'ostali': ('osta', False), 'ostalo': ('osta', False),
    'ostama': ('ost', False), 'ostane': ('osta', False),
    'ostanu': ('osta', False), 'ostati': ('osta', False),
    'ostima': ('ost', False), 'otijem': ('oti', False),
    'ovasmo': ('ova', False), 'ovaste': ('ova', False),
    'ovijeg': ('ov', False), 'ovijem': ('ov', False),
    'ovijih': ('ov', False), 'ovijim': ('ov', False),
    'ovijoj': ('ov', False), 'ovitem': ('ovit', False),
    'ovitih': ('ovit', False), 'ovitim': ('ovit', False),
    'ovitog': ('ovit', False), 'ovitoj': ('ovit', False),
    'ovitom': ('ovit', False), 'ozilom': ('ozil', False),
    'ošijeg': ('oš', False), 'ošijem': ('oš', False),
    'ošijih': ('oš', False), 'ošijim': ('oš', False),
    'ošijoj': ('oš', False), 'panija': ('panij', False),
    'panije': ('panij', False), 'paniji': ('panij', False),
    'paniju': ('panij', False), 'pijama': ('pij', False),
    'pijima': ('pij', False), 'rajama': ('raj', False),
    'rajeva': ('raj', False), 'rajeve': ('raj', False),
    'rajevi': ('raj', False), 'rajima': ('raj', False),
    'ramama': ('ram', False), 'ranija': ('ranij', False),
    'ranije': ('ranij', False), 'raniji': ('ranij', False),
    'raniju': ('ranij', False), 'rarija': ('rari', False),
    'rariju': ('rari', False), 'rijama': ('rij', False),
    'rijima': ('rij', False), 'rosila': ('rosi', True),
    'rosile': ('rosi', True), 'rosili': ('rosi', True),
    'rosilo': ('rosi', True), 'rosimo': ('rosi', True),
    'rosise': ('rosi', True), 'rosite': ('rosi', True),
    'rositi': ('rosi', True), 'rošila': ('roši', False),
    'rošile': ('roši', False), 'rošili': ('roši', False),
    'rošilo': ('roši', False), 'rošimo': ('roši', False),
    'rošite': ('roši', False), 'rošiti': ('roši', False),
    'rošiše': ('roši', False), 'sijama': ('sij', False),
    'sijima': ('sij', False), 'skijeg': ('sk', False),
    'skijem': ('sk', False), 'skijih': ('sk', False),
    'skijim': ('sk', False), 'skijoj': ('sk', False),
    'snjega': ('snj', True), 'snjemu': ('snj', True),
    'snjija': ('snj', True), 'snjije': ('snj', True),
    'snjiji': ('snj', True), 'snjiju': ('snj', True),
    'snjima': ('snj', True), 'snjoga': ('snj', True),
    'snjome': ('snj', True), 'snjomu': ('snj', True),
    'stvima': ('stv', False), 'tanija': ('tanij', False),
    'tanije': ('tanij', False), 'taniji': ('tanij', False),
    'taniju': ('tanij', False), 'tasama': ('tas', True),
    'tasima': ('tas', True), 'tašama': ('taš', False),
    'tašima': ('taš', False), 'tijama': ('tij', False),
    'tijima': ('tij', False), 'urajmo': ('ur', False),
    'urajte': ('ur', False), 'urasmo': ('ur', False),
    'uraste': ('ur', False), 'uvajmo': ('uva', False),
    'uvajte': ('uva', False), 'uvasmo': ('uva', False),
    'uvaste': ('uva', False), 'vasama': ('vas', True),
    'vasima': ('vas', True), 'vašama': ('vaš', False),
    'vašima': ('vaš', False), 'zijama': ('zij', False),
    'zijima': ('zij', False), 'ćajama': ('ćaj', False),
    'ćajeva': ('ćaj', False), 'ćajeve': ('ćaj', False),
    'ćajevi': ('ćaj', False), 'ćajima': ('ćaj', False),
    'čajama': ('čaj', False), 'čajeva': ('čaj', False),
    'čajeve': ('čaj', False), 'čajevi': ('čaj', False),
    'čajima': ('čaj', False), 'činama': ('čin', False),
    'činima': ('čin', False), 'činoga': ('čin', False),
    'činome': ('čin', False), 'činomu': ('čin', False),
    'đajama': ('đaj', False), 'đajeva': ('đaj', False),
    'đajeve': ('đaj', False), 'đajevi': ('đaj', False),
    'đajima': ('đaj', False), 'škijeg': ('šk', False),
    'škijem': ('šk', False), 'škijih': ('šk', False),
    'škijim': ('šk', False), 'škijoj': ('šk', False),
    'šnjega': ('šnj', False), 'šnjemu': ('šnj', False),
    'šnjija': ('šnj', False), 'šnjije': ('šnj', False),
    'šnjiji': ('šnj', False), 'šnjiju': ('šnj', False),
    'šnjima': ('šnj', False), 'šnjoga': ('šnj', False),
    'šnjome': ('šnj', False), 'šnjomu': ('šnj', False),
    'štvima': ('štv', False), 'žijama': ('žij', False),
    'žijima': ('žij', False), 'acahu': ('aca', True),
    'acaju': ('aca', True), 'acala': ('aca', True),
    'acale': ('aca', True), 'acali': ('aca', True),
    'acalo': ('aca', True), 'acamo': ('aca', True),
    'acana': ('aca', True), 'acane': ('aca', True),
    'acani': ('aca', True), 'acano': ('aca', True),
    'acase': ('aca', True), 'acate': ('aca', True),
    'acati': ('aca', True), 'aceci': ('ac', True), 'acega': ('ac', True),
    'acemu': ('ac', True), 'acena': ('ac', True), 'acene': ('ac', True),
    'aceni': ('ac', True), 'aceno': ('ac', True), 'acila': ('ac', True),
    'acile': ('ac', True), 'acili': ('ac', True), 'acilo': ('ac', True),
    'acima': ('ac', True), 'acimo': ('ac', True), 'acise': ('ac', True),
    'acite': ('ac', True), 'aciti': ('ac', True), 'acoga': ('ac', True),
    'acome': ('ac', True), 'acomu': ('ac', True), 'ajama': ('aj', False),
    'ajeva': ('aj', False), 'ajeve': ('aj', False),
    'ajevi': ('aj', False), 'ajima': ('aj', False), 'ajuci': ('a', True),
    'ajući': ('a', False), 'alama': ('a', False), 'alima': ('a', False),
    'anega': ('an', False), 'anemu': ('an', False),
    'anima': ('an', False), 'anina': ('an', False),
    'anine': ('an', False), 'aninu': ('an', False),
    'anjeg': ('anj', False), 'anjem': ('anj', False),
    'anjih': ('anj', False), 'anjim': ('anj', False),
    'anjog': ('anj', False), 'anjoj': ('anj', False),
    'anjom': ('anj', False), 'arama': ('ar', False),
    'arima': ('ar', False), 'astao': ('asta', False),
    'astat': ('asta', False), 'astem': ('ast', False),
    'astes': ('as', True), 'asteš': ('as', False),
    'astih': ('ast', False), 'astim': ('ast', False),
    'astog': ('ast', False), 'astoj': ('ast', False),
    'astom': ('ast', False), 'atega': ('at', False),
    'atemu': ('at', False), 'atija': ('at', False),
    'atije': ('at', False), 'atiji': ('at', False),
    'atiju': ('at', False), 'atima': ('at', False),
    'atoga': ('at', False), 'atome': ('at', False),
    'atomu': ('at', False), 'avahu': ('ava', False),
    'avaju': ('ava', False), 'avala': ('ava', False),
    'avale': ('ava', False), 'avali': ('ava', False),
    'avalo': ('ava', False), 'avama': ('av', False),
    'avamo': ('ava', False), 'avana': ('ava', False),
    'avane': ('ava', False), 'avani': ('ava', False),
    'avano': ('ava', False), 'avase': ('ava', True),
    'avate': ('ava', False), 'avati': ('ava', False),
    'avaše': ('ava', False), 'avega': ('av', False),
    'avemu': ('av', False), 'avija': ('av', False),
    'avije': ('av', False), 'aviji': ('av', False),
    'aviju': ('av', False), 'avima': ('av', False),
    'avoga': ('av', False), 'avome': ('av', False),
    'avomu': ('av', False), 'aćega': ('ać', False),
    'aćemu': ('ać', False), 'aćima': ('ać', False),
    'aćoga': ('ać', False), 'aćome': ('ać', False),
    'aćomu': ('ać', False), 'ačahu': ('ača', False),
    'ačaju': ('ača', False), 'ačala': ('ača', False),
    'ačale': ('ača', False), 'ačali': ('ača', False),
    'ačalo': ('ača', False), 'ačamo': ('ača', False),
    'ačana': ('ača', False), 'ačane': ('ača', False),
    'ačani': ('ača', False), 'ačano': ('ača', False),
    'ačate': ('ača', False), 'ačati': ('ača', False),
    'ačaše': ('ača', False), 'ačena': ('ač', False),
    'ačene': ('ač', False), 'ačeni': ('ač', False),
    'ačeno': ('ač', False), 'ačeći': ('ač', False),
    'ačila': ('ač', False), 'ačile': ('ač', False),
    'ačili': ('ač', False), 'ačilo': ('ač', False),
    'ačimo': ('ač', False), 'ačite': ('ač', False),
    'ačiti': ('ač', False), 'ačiše': ('ač', False),
    'basem': ('bas', True), 'basom': ('bas', True),
    'bašem': ('baš', False), 'bašom': ('baš', False),
    'bijom': ('bij', False), 'cajem': ('caj', False),
    'cijom': ('cij', False), 'cinih': ('cin', True),
    'cinim': ('cin', True), 'cinog': ('cin', True),
    'cinoj': ('cin', True), 'cinom': ('cin', True),
    'dijom': ('dij', False), 'drama': ('dr', False),
    'drima': ('dr', False), 'ecega': ('ec', True), 'ecemu': ('ec', True),
    'ecima': ('ec', True), 'ecoga': ('ec', True), 'ecome': ('ec', True),
    'ecomu': ('ec', True), 'elama': ('e', False), 'elega': ('el', False),
    'elemu': ('el', False), 'elija': ('el', False),
    'elije': ('el', False), 'eliji': ('el', False),
    'eliju': ('el', False), 'elima': ('el', False),
    'eloga': ('el', False), 'elome': ('el', False),
    'elomu': ('el', False), 'enega': ('en', False),
    'enemu': ('en', False), 'enjeg': ('enj', False),
    'enjem': ('enj', False), 'enjih': ('enj', False),
    'enjim': ('enj', False), 'enjog': ('enj', False),
    'enjoj': ('enj', False), 'enjom': ('enj', False),
    'erama': ('er', False), 'erima': ('er', False),
    'esama': ('es', True), 'esima': ('es', False),
    'estom': ('est', False), 'etama': ('et', False),
    'etemo': ('et', False), 'etima': ('et', False),
    'etimo': ('et', False), 'etuci': ('et', True),
    'etući': ('et', False), 'evahu': ('eva', False),
    'evaju': ('eva', False), 'evala': ('eva', False),
    'evale': ('eva', False), 'evali': ('eva', False),
    'evalo': ('eva', False), 'evama': ('ev', False),
    'evamo': ('eva', False), 'evana': ('eva', False),
    'evane': ('eva', False), 'evani': ('eva', False),
    'evano': ('eva', False), 'evase': ('eva', True),
    'evate': ('eva', False), 'evati': ('eva', False),
    'evaše': ('eva', False), 'evega': ('ev', False),
    'evemu': ('ev', False), 'evija': ('ev', False),
    'evije': ('ev', False), 'eviji': ('ev', False),
    'eviju': ('ev', False), 'evima': ('ev', False),
    'evita': ('evit', False), 'evite': ('evit', False),
    'eviti': ('evit', False), 'evito': ('evit', False),
    'evitu': ('evit', False), 'evoga': ('ev', False),
    'evome': ('ev', False), 'evomu': ('ev', False),
    'ećega': ('eć', False), 'ećemu': ('eć', False),
    'ećima': ('eć', False), 'ećoga': ('eć', False),
    'ećome': ('eć', False), 'ećomu': ('eć', False),
    'ešama': ('eš', False), 'ešima': ('eš', False),
    'fijom': ('fij', False), 'gasem': ('gas', True),
    'gasom': ('gas', True), 'gašem': ('gaš', False),
    'gašom': ('gaš', False), 'gijom': ('gij', False),
    'ijala': ('ijal', False), 'ijale': ('ijal', False),
    'ijali': ('ijal', False), 'ijalo': ('ijal', False),
    'ijalu': ('ijal', False), 'ijemo': ('i', False),
    'ijete': ('i', False), 'ikata': ('ikat', False),
    'ikate': ('ikat', False), 'ikati': ('ikat', False),
    'ikato': ('ikat', False), 'ikatu': ('ikat', False),
    'ilama': ('i', False), 'ilima': ('i', False), 'inama': ('in', False),
    'inima': ('in', False), 'injah': ('inj', False),
    'injao': ('inj', False), 'injat': ('inj', False),
    'injem': ('inj', False), 'injes': ('inj', True),
    'inješ': ('inj', False), 'irahu': ('ir', False),
    'iraju': ('ir', False), 'irala': ('ir', False),
    'irale': ('ir', False), 'irali': ('ir', False),
    'iralo': ('ir', False), 'iramo': ('ir', False),
    'irase': ('ir', True), 'irate': ('ir', False),
    'irati': ('ir', False), 'iraše': ('ir', False),
    'iruje': ('ir', False), 'iruju': ('ir', False),
    'isama': ('is', True), 'isima': ('is', False),
    'istao': ('ista', False), 'istat': ('ista', False),
    'istem': ('ist', True), 'istom': ('ist', False),
    'ivahu': ('iva', False), 'ivaju': ('iva', False),
    'ivala': ('iva', False), 'ivale': ('iva', False),
    'ivali': ('iva', False), 'ivalo': ('iva', False),
    'ivama': ('iv', False), 'ivamo': ('iva', False),
    'ivana': ('iva', False), 'ivane': ('iva', False),
    'ivani': ('iva', False), 'ivano': ('iva', False),
    'ivase': ('iva', True), 'ivate': ('iva', False),
    'ivati': ('iva', False), 'ivaše': ('iva', False),
    'ivega': ('iv', False), 'ivemu': ('iv', False),
    'ivija': ('iv', False), 'ivije': ('iv', False),
    'iviji': ('iv', False), 'iviju': ('iv', False),
    'ivima': ('iv', False), 'ivoga': ('iv', False),
    'ivome': ('iv', False), 'ivomu': ('iv', False),
    'išama': ('iš', False), 'išima': ('iš', False),
    'ištem': ('išt', False), 'jasem': ('jas', True),
    'jasom': ('jas', True), 'jašem': ('jaš', False),
    'jašom': ('jaš', False), 'jetih': ('jeti', False),
    'jetim': ('jeti', False), 'jetio': ('jeti', False),
    'jetis': ('jeti', True), 'jetit': ('jeti', False),
    'jetiš': ('jeti', False), 'kasem': ('kas', True),
    'kasom': ('kas', True), 'kašem': ('kaš', False),
    'kašom': ('kaš', False), 'kijeg': ('k', False),
    'kijem': ('k', False), 'kijih': ('k', False), 'kijim': ('k', False),
    'kijoj': ('k', False), 'kstom': ('kst', False),
    'lajem': ('laj', False), 'latom': ('lat', False),
    'lemom': ('lem', False), 'lijem': ('li', False),
    'lijom': ('lij', False), 'logom': ('log', False),
    'lovom': ('lov', False), 'lucen': ('luc', True),
    'lucih': ('luc', True), 'lucim': ('luc', True),
    'lucio': ('luc', True), 'lucis': ('luc', True),
    'lucit': ('luc', True), 'lucuj': ('luc', True),
    'lučen': ('luč', False), 'lučih': ('luč', False),
    'lučim': ('luč', False), 'lučio': ('luč', False),
    'lučit': ('luč', False), 'lučiš': ('luč', False),
    'lučuj': ('luč', False), 'mijom': ('mij', False),
    'movom': ('mov', False), 'nalom': ('nal', False),
    'nasem': ('nas', True), 'nasom': ('nas', True),
    'našem': ('naš', False), 'našom': ('naš', False),
    'nijeg': ('n', False), 'nijem': ('n', False), 'nijih': ('n', False),
    'nijim': ('n', False), 'nijoj': ('n', False),
    'nijom': ('nij', False), 'nismo': ('ni', False),
    'niste': ('ni', False), 'nivsi': ('ni', True),
    'nivši': ('ni', False), 'nusmo': ('n', False), 'nuste': ('n', False),
    'nuvsi': ('n', True), 'nuvši': ('n', False), 'olima': ('ol', False),
    'olova': ('olov', False), 'olove': ('olov', False),
    'olovi': ('olov', False), 'onima': ('on', False),
    'onova': ('on', False), 'onove': ('on', False),
    'onovi': ('on', False), 'orama': ('or', False),
    'orima': ('or', False), 'osega': ('os', True), 'osemu': ('os', True),
    'osija': ('os', True), 'osije': ('os', True), 'osiji': ('os', True),
    'osiju': ('os', True), 'osima': ('os', True), 'osoga': ('os', True),
    'osome': ('os', True), 'osomu': ('os', True),
    'ostao': ('osta', False), 'ostat': ('osta', False),
    'ostom': ('ost', False), 'otija': ('oti', False),
    'otiju': ('oti', False), 'ovahu': ('ova', False),
    'ovala': ('ova', False), 'ovale': ('ova', False),
    'ovali': ('ova', False), 'ovalo': ('ova', False),
    'ovase': ('ova', True), 'ovati': ('ova', False),
    'ovaše': ('ova', False), 'ovega': ('ov', False),
    'ovemu': ('ov', False), 'ovija': ('ov', False),
    'ovije': ('ov', False), 'oviji': ('ov', False),
    'oviju': ('ov', False), 'ovima': ('ov', False),
    'ovita': ('ovit', False), 'ovite': ('ovit', False),
    'oviti': ('ovit', False), 'ovito': ('ovit', False),
    'ovitu': ('ovit', False), 'ovoga': ('ov', False),
    'ovome': ('ov', False), 'ovomu': ('ov', False),
    'ozila': ('ozil', False), 'ozile': ('ozil', False),
    'ozili': ('ozil', False), 'ozilu': ('ozil', False),
    'ošega': ('oš', False), 'ošemu': ('oš', False),
    'ošija': ('oš', False), 'ošije': ('oš', False),
    'ošiji': ('oš', False), 'ošiju': ('oš', False),
    'ošima': ('oš', False), 'ošoga': ('oš', False),
    'ošome': ('oš', False), 'ošomu': ('oš', False),
    'pijom': ('pij', False), 'rajem': ('raj', False),
    'ramom': ('ram', False), 'rario': ('rari', False),
    'rijom': ('rij', False), 'rosih': ('rosi', True),
    'rosim': ('rosi', True), 'rosio': ('rosi', True),
    'rosis': ('rosi', True), 'rosit': ('rosi', True),
    'roših': ('roši', False), 'rošim': ('roši', False),
    'rošio': ('roši', False), 'rošit': ('roši', False),
    'rošiš': ('roši', False), 'sijem': ('si', False),
    'sijom': ('sij', False), 'skega': ('sk', False),
    'skemu': ('sk', False), 'skija': ('sk', False),
    'skije': ('sk', False), 'skiji': ('sk', False),
    'skima': ('sk', False), 'skoga': ('sk', False),
    'skome': ('sk', False), 'skomu': ('sk', False),
    'snega': ('sn', True), 'snemu': ('sn', True), 'snjeg': ('snj', True),
    'snjem': ('snj', True), 'snjih': ('snj', True),
    'snjim': ('snj', True), 'snjog': ('snj', True),
    'snjoj': ('snj', True), 'snjom': ('snj', True),
    'stvom': ('stv', False), 'tajmo': ('ta', False),
    'tajte': ('ta', False), 'tasem': ('tas', True),
    'tasmo': ('ta', False), 'tasom': ('tas', True),
    'taste': ('ta', False), 'tavsi': ('ta', True),
    'tavši': ('ta', False), 'tašem': ('taš', False),
    'tašom': ('taš', False), 'tijom': ('tij', False),
    'ucega': ('uc', True), 'ucemu': ('uc', True), 'ucima': ('uc', True),
    'ucoga': ('uc', True), 'ucome': ('uc', True), 'ucomu': ('uc', True),
    'ugama': ('ug', False), 'ugova': ('ugov', False),
    'ugove': ('ugov', False), 'ugovi': ('ugov', False),
    'ujemo': ('uj', False), 'ujete': ('uj', False),
    'ujuci': ('uj', True), 'ujući': ('uj', False),
    'urahu': ('ur', False), 'uraju': ('ur', False),
    'urala': ('ur', False), 'urale': ('ur', False),
    'urali': ('ur', False), 'uralo': ('ur', False),
    'uramo': ('ur', False), 'urana': ('ur', False),
    'urane': ('ur', False), 'urani': ('ur', False),
    'urano': ('ur', False), 'urase': ('ur', True),
    'urate': ('ur', False), 'urati': ('ur', False),
    'uraše': ('ur', False), 'uvahu': ('uva', False),
    'uvaju': ('uva', False), 'uvala': ('uva', False),
    'uvale': ('uva', False), 'uvali': ('uva', False),
    'uvalo': ('uva', False), 'uvamo': ('uva', False),
    'uvana': ('uva', False), 'uvane': ('uva', False),
    'uvani': ('uva', False), 'uvano': ('uva', False),
    'uvase': ('uva', True), 'uvate': ('uva', False),
    'uvati': ('uva', False), 'uvaše': ('uva', False),
    'ućega': ('uć', False), 'ućemu': ('uć', False),
    'ućima': ('uć', False), 'ućoga': ('uć', False),
    'ućome': ('uć', False), 'ućomu': ('uć', False),
    'vasem': ('vas', True), 'vasom': ('vas', True),
    'vašem': ('vaš', False), 'vašom': ('vaš', False),
    'zijom': ('zij', False), 'ćajem': ('ćaj', False),
    'čajem': ('čaj', False), 'činih': ('čin', False),
    'činim': ('čin', False), 'činog': ('čin', False),
    'činoj': ('čin', False), 'činom': ('čin', False),
    'đajem': ('đaj', False), 'škega': ('šk', False),
    'škemu': ('šk', False), 'škija': ('šk', False),
    'škije': ('šk', False), 'škiji': ('šk', False),
    'škima': ('šk', False), 'škoga': ('šk', False),
    'škome': ('šk', False), 'škomu': ('šk', False),
    'šnega': ('šn', False), 'šnemu': ('šn', False),
    'šnjeg': ('šnj', False), 'šnjem': ('šnj', False),
    'šnjih': ('šnj', False), 'šnjim': ('šnj', False),
    'šnjog': ('šnj', False), 'šnjoj': ('šnj', False),
    'šnjom': ('šnj', False), 'štvom': ('štv', False),
    'žijom': ('žij', False), 'acah': ('aca', True),
    'acam': ('aca', True), 'acan': ('aca', True), 'acao': ('aca', True),
    'acas': ('aca', True), 'acat': ('aca', True), 'aceg': ('ac', True),
    'acem': ('ac', True), 'acen': ('ac', True), 'acih': ('ac', True),
    'acim': ('ac', True), 'acio': ('ac', True), 'acis': ('ac', True),
    'acit': ('ac', True), 'acog': ('ac', True), 'acoj': ('ac', True),
    'acom': ('ac', True), 'acuh': ('ac', True), 'ajem': ('a', False),
    'ajmo': ('a', False), 'ajte': ('a', False), 'aloj': ('a', False),
    'alom': ('a', False), 'aneg': ('an', False), 'anem': ('an', False),
    'anin': ('an', False), 'anja': ('anj', False),
    'anje': ('anj', False), 'anji': ('anj', False),
    'anjo': ('anj', False), 'anju': ('anj', False),
    'anom': ('an', False), 'arom': ('ar', False), 'asla': ('as', False),
    'asle': ('as', False), 'asli': ('as', False), 'aslo': ('as', False),
    'asmo': ('a', False), 'asta': ('ast', False), 'aste': ('ast', False),
    'asti': ('ast', False), 'asto': ('ast', False),
    'astu': ('ast', False), 'ateg': ('at', False), 'atem': ('at', False),
    'atih': ('at', False), 'atim': ('at', False), 'atog': ('at', False),
    'atoj': ('at', False), 'atom': ('at', False), 'avah': ('ava', False),
    'avaj': ('ava', False), 'avam': ('ava', False),
    'avan': ('ava', False), 'avao': ('ava', False),
    'avas': ('ava', True), 'avat': ('ava', False),
    'avav': ('ava', False), 'avaš': ('ava', False),
    'aveg': ('av', False), 'avem': ('av', False), 'avih': ('av', False),
    'avim': ('av', False), 'avog': ('av', False), 'avoj': ('av', False),
    'avom': ('av', False), 'avsi': ('a', True), 'avši': ('a', False),
    'aćeg': ('ać', False), 'aćem': ('ać', False), 'aćih': ('ać', False),
    'aćim': ('ać', False), 'aćog': ('ać', False), 'aćoj': ('ać', False),
    'aćom': ('ać', False), 'aćuh': ('ać', False), 'ačah': ('ača', False),
    'ačam': ('ača', False), 'ačan': ('ača', False),
    'ačao': ('ača', False), 'ačat': ('ača', False),
    'ačaš': ('ača', False), 'ačen': ('ač', False), 'ačih': ('ač', False),
    'ačim': ('ač', False), 'ačio': ('ač', False), 'ačit': ('ač', False),
    'ačiš': ('ač', False), 'basa': ('bas', True), 'base': ('bas', True),
    'basi': ('bas', True), 'basu': ('bas', True), 'baša': ('baš', False),
    'baše': ('baš', False), 'baši': ('baš', False),
    'bašu': ('baš', False), 'bija': ('bij', False),
    'bije': ('bij', False), 'biji': ('bij', False),
    'bijo': ('bij', False), 'biju': ('bij', False),
    'caja': ('caj', False), 'caje': ('caj', False),
    'caji': ('caj', False), 'caju': ('caj', False),
    'cija': ('cij', False), 'cije': ('cij', False),
    'ciji': ('cij', False), 'cijo': ('cij', False),
    'ciju': ('cij', False), 'cina': ('cin', True), 'cine': ('cin', True),
    'cini': ('cin', True), 'cino': ('cin', True), 'cinu': ('cin', True),
    'dija': ('dij', False), 'dije': ('dij', False),
    'diji': ('dij', False), 'dijo': ('dij', False),
    'diju': ('dij', False), 'drom': ('dr', False), 'eceg': ('ec', True),
    'ecem': ('ec', True), 'ecih': ('ec', True), 'ecim': ('ec', True),
    'ecog': ('ec', True), 'ecoj': ('ec', True), 'ecom': ('ec', True),
    'ecuh': ('ec', True), 'eleg': ('el', False), 'elem': ('el', False),
    'elih': ('el', False), 'elim': ('el', False), 'elog': ('el', False),
    'eloj': ('el', False), 'elom': ('el', False), 'eneg': ('en', False),
    'enem': ('en', False), 'enja': ('enj', False),
    'enje': ('enj', False), 'enji': ('enj', False),
    'enjo': ('enj', False), 'enju': ('enj', False),
    'erom': ('er', False), 'esem': ('es', True), 'esom': ('es', False),
    'esta': ('est', False), 'este': ('est', False),
    'esti': ('est', False), 'esto': ('est', False),
    'estu': ('est', False), 'etem': ('et', False), 'etes': ('et', True),
    'eteš': ('et', False), 'etom': ('et', False), 'evah': ('eva', False),
    'evaj': ('eva', False), 'evam': ('eva', False),
    'evan': ('eva', False), 'evao': ('eva', False),
    'evas': ('eva', True), 'evat': ('eva', False),
    'evav': ('eva', False), 'evaš': ('eva', False),
    'eveg': ('ev', False), 'evem': ('ev', False), 'evih': ('ev', False),
    'evim': ('ev', False), 'evog': ('ev', False), 'evoj': ('ev', False),
    'evom': ('ev', False), 'ećeg': ('eć', False), 'ećem': ('eć', False),
    'ećih': ('eć', False), 'ećim': ('eć', False), 'ećog': ('eć', False),
    'ećoj': ('eć', False), 'ećom': ('eć', False), 'ećuh': ('eć', False),
    'ešem': ('eš', False), 'ešom': ('eš', False), 'fija': ('fij', False),
    'fije': ('fij', False), 'fiji': ('fij', False),
    'fijo': ('fij', False), 'fiju': ('fij', False), 'gama': ('g', False),
    'gasa': ('gas', True), 'gase': ('gas', True), 'gasi': ('gas', True),
    'gasu': ('gas', True), 'gaša': ('gaš', False),
    'gaše': ('gaš', False), 'gaši': ('gaš', False),
    'gašu': ('gaš', False), 'gija': ('gij', False),
    'gije': ('gij', False), 'giji': ('gij', False),
    'gijo': ('gij', False), 'giju': ('gij', False), 'gova': ('g', False),
    'gove': ('g', False), 'govi': ('g', False), 'ieci': ('i', True),
    'ieći': ('i', False), 'ijem': ('i', False), 'ijes': ('i', True),
    'iješ': ('i', False), 'ijmo': ('i', False), 'ijte': ('i', False),
    'ilom': ('i', False), 'inom': ('in', False), 'irah': ('ir', False),
    'iral': ('ir', False), 'iram': ('ir', False), 'iran': ('ir', False),
    'irao': ('ir', False), 'iras': ('ir', True), 'irat': ('ir', False),
    'iraš': ('ir', False), 'iruj': ('ir', False), 'isem': ('is', True),
    'ismo': ('i', False), 'isom': ('is', False), 'ista': ('ist', False),
    'iste': ('ist', False), 'isti': ('ist', False),
    'isto': ('ist', False), 'istu': ('ist', False),
    'ivah': ('iva', False), 'ivaj': ('iva', False),
    'ivam': ('iva', False), 'ivan': ('iva', False),
    'ivao': ('iva', False), 'ivas': ('iva', True),
    'ivat': ('iva', False), 'ivav': ('iva', False),
    'ivaš': ('iva', False), 'iveg': ('iv', False), 'ivem': ('iv', False),
    'ivih': ('iv', False), 'ivim': ('iv', False), 'ivog': ('iv', False),
    'ivoj': ('iv', False), 'ivom': ('iv', False), 'ivsi': ('i', True),
    'ivši': ('i', False), 'išem': ('iš', False), 'išom': ('iš', False),
    'išta': ('išt', False), 'ište': ('išt', False),
    'ištu': ('išt', False), 'jasa': ('jas', True), 'jase': ('jas', True),
    'jasi': ('jas', True), 'jasu': ('jas', True), 'jaša': ('jaš', False),
    'jaše': ('jaš', False), 'jaši': ('jaš', False),
    'jašu': ('jaš', False), 'kasa': ('kas', True), 'kase': ('kas', True),
    'kasi': ('kas', True), 'kasu': ('kas', True), 'kaša': ('kaš', False),
    'kaše': ('kaš', False), 'kaši': ('kaš', False),
    'kašu': ('kaš', False), 'kega': ('k', False), 'kemu': ('k', False),
    'kija': ('k', False), 'kije': ('k', False), 'kiji': ('k', False),
    'kiju': ('k', False), 'kima': ('k', False), 'koga': ('k', False),
    'kome': ('k', False), 'komu': ('k', False), 'ksta': ('kst', False),
    'kste': ('kst', False), 'ksti': ('kst', False),
    'ksto': ('kst', False), 'kstu': ('kst', False),
    'laja': ('laj', False), 'laje': ('laj', False),
    'laji': ('laj', False), 'laju': ('laj', False),
    'lata': ('lat', False), 'late': ('lat', False),
    'lati': ('lat', False), 'lato': ('lat', False),
    'latu': ('lat', False), 'lema': ('lem', False),
    'leme': ('lem', False), 'lemi': ('lem', False),
    'lemo': ('lem', False), 'lemu': ('lem', False),
    'lija': ('li', False), 'lije': ('lij', False),
    'liji': ('lij', False), 'lijo': ('lij', False),
    'liju': ('li', False), 'loga': ('log', False),
    'loge': ('log', False), 'logu': ('log', False),
    'lova': ('lov', False), 'love': ('lov', False),
    'lovi': ('lov', False), 'lovu': ('lov', False),
    'luce': ('luc', True), 'luci': ('luc', True), 'luče': ('luč', False),
    'luči': ('luč', False), 'mija': ('mij', False),
    'mije': ('mij', False), 'miji': ('mij', False),
    'mijo': ('mij', False), 'miju': ('mij', False),
    'mova': ('mov', False), 'move': ('mov', False),
    'movi': ('mov', False), 'movu': ('mov', False),
    'nala': ('nal', False), 'nale': ('nal', False),
    'nali': ('nal', False), 'nalo': ('nal', False),
    'nalu': ('nal', False), 'nasa': ('nas', True), 'nase': ('nas', True),
    'nasi': ('nas', True), 'nasu': ('nas', True), 'naša': ('naš', False),
    'naše': ('naš', False), 'naši': ('naš', False),
    'našu': ('naš', False), 'nega': ('n', False), 'nemo': ('n', False),
    'nemu': ('n', False), 'nete': ('n', False), 'nija': ('n', False),
    'nije': ('n', False), 'niji': ('n', False), 'nijo': ('nij', False),
    'niju': ('n', False), 'nila': ('ni', False), 'nile': ('ni', False),
    'nili': ('ni', False), 'nilo': ('ni', False), 'nima': ('n', False),
    'nimo': ('n', False), 'nite': ('n', False), 'niti': ('ni', False),
    'noga': ('n', False), 'nome': ('n', False), 'nomu': ('n', False),
    'nuci': ('n', True), 'nula': ('n', False), 'nule': ('n', False),
    'nuli': ('n', False), 'nulo': ('n', False), 'nuta': ('n', False),
    'nuti': ('n', False), 'nuto': ('n', False), 'nući': ('n', False),
    'olom': ('ol', False), 'onom': ('on', False), 'orom': ('or', False),
    'oseg': ('os', True), 'osem': ('os', True), 'osih': ('os', True),
    'osim': ('os', True), 'osog': ('os', True), 'osoj': ('os', True),
    'osom': ('os', True), 'osta': ('ost', False), 'oste': ('ost', False),
    'osti': ('ost', False), 'osto': ('ost', False),
    'ostu': ('ost', False), 'otio': ('oti', False),
    'ovah': ('ova', False), 'ovao': ('ova', False),
    'ovat': ('ova', False), 'oveg': ('ov', False), 'ovih': ('ov', False),
    'ovim': ('ov', False), 'ovog': ('ov', False), 'ovoj': ('ov', False),
    'ovom': ('ov', False), 'ošeg': ('oš', False), 'ošem': ('oš', False),
    'oših': ('oš', False), 'ošim': ('oš', False), 'ošog': ('oš', False),
    'ošoj': ('oš', False), 'ošom': ('oš', False), 'pija': ('pij', False),
    'pije': ('pij', False), 'piji': ('pij', False),
    'pijo': ('pij', False), 'piju': ('pij', False),
    'raja': ('raj', False), 'raje': ('raj', False),
    'raji': ('raj', False), 'raju': ('raj', False),
    'rama': ('ram', False), 'rame': ('ram', False),
    'rami': ('ram', False), 'ramo': ('ram', False),
    'ramu': ('ram', False), 'rija': ('rij', False),
    'rije': ('rij', False), 'riji': ('rij', False),
    'rijo': ('rij', False), 'riju': ('rij', False),
    'sija': ('si', False), 'sije': ('sij', False),
    'siji': ('sij', False), 'sijo': ('sij', False),
    'siju': ('si', False), 'skem': ('sk', False), 'skih': ('sk', False),
    'skim': ('sk', False), 'skog': ('sk', False), 'skoj': ('sk', False),
    'skom': ('sk', False), 'sneg': ('sn', True), 'snem': ('sn', True),
    'snja': ('snj', True), 'snje': ('snj', True), 'snji': ('snj', True),
    'snjo': ('snj', True), 'snju': ('snj', True), 'stva': ('stv', False),
    'stvo': ('stv', False), 'stvu': ('stv', False),
    'taju': ('ta', False), 'tala': ('ta', False), 'tale': ('ta', False),
    'tali': ('ta', False), 'talo': ('ta', False), 'tamo': ('ta', False),
    'tana': ('ta', False), 'tane': ('ta', False), 'tani': ('ta', False),
    'tano': ('ta', False), 'tasa': ('tas', True), 'tase': ('tas', True),
    'tasi': ('tas', True), 'tasu': ('tas', True), 'tate': ('ta', False),
    'tati': ('ta', False), 'taša': ('taš', False),
    'taše': ('taš', False), 'taši': ('taš', False),
    'tašu': ('taš', False), 'tija': ('tij', False),
    'tije': ('tij', False), 'tiji': ('tij', False),
    'tijo': ('tij', False), 'tiju': ('tij', False), 'uceg': ('uc', True),
    'ucem': ('uc', True), 'ucih': ('uc', True), 'ucim': ('uc', True),
    'ucog': ('uc', True), 'ucoj': ('uc', True), 'ucom': ('uc', True),
    'ucuh': ('uc', True), 'ugom': ('ug', False), 'ujem': ('uj', False),
    'ujes': ('uj', True), 'uješ': ('uj', False), 'ujmo': ('uj', False),
    'urah': ('ur', False), 'uraj': ('ur', False), 'ural': ('ur', False),
    'uram': ('ur', False), 'uran': ('ur', False), 'urao': ('ur', False),
    'uras': ('ur', True), 'urat': ('ur', False), 'uraš': ('ur', False),
    'uvah': ('uva', False), 'uvaj': ('uva', False),
    'uvam': ('uva', False), 'uvan': ('uva', False),
    'uvao': ('uva', False), 'uvas': ('uva', True),
    'uvat': ('uva', False), 'uvav': ('uva', False),
    'uvaš': ('uva', False), 'ućeg': ('uć', False), 'ućem': ('uć', False),
    'ućih': ('uć', False), 'ućim': ('uć', False), 'ućog': ('uć', False),
    'ućoj': ('uć', False), 'ućom': ('uć', False), 'ućuh': ('uć', False),
    'vasa': ('vas', True), 'vase': ('vas', True), 'vasi': ('vas', True),
    'vasu': ('vas', True), 'vaša': ('vaš', False),
    'vaše': ('vaš', False), 'vaši': ('vaš', False),
    'vašu': ('vaš', False), 'zija': ('zij', False),
    'zije': ('zij', False), 'ziji': ('zij', False),
    'zijo': ('zij', False), 'ziju': ('zij', False),
    'ćaja': ('ćaj', False), 'ćaje': ('ćaj', False),
    'ćaji': ('ćaj', False), 'ćaju': ('ćaj', False),
    'čaja': ('čaj', False), 'čaje': ('čaj', False),
    'čaji': ('čaj', False), 'čaju': ('čaj', False),
    'čina': ('čin', False), 'čine': ('čin', False),
    'čini': ('čin', False), 'čino': ('čin', False),
    'činu': ('čin', False), 'đaja': ('đaj', False),
    'đaje': ('đaj', False), 'đaji': ('đaj', False),
    'đaju': ('đaj', False), 'škem': ('šk', False), 'ških': ('šk', False),
    'škim': ('šk', False), 'škog': ('šk', False), 'škoj': ('šk', False),
    'škom': ('šk', False), 'šneg': ('šn', False), 'šnem': ('šn', False),
    'šnja': ('šnj', False), 'šnje': ('šnj', False),
    'šnji': ('šnj', False), 'šnjo': ('šnj', False),
    'šnju': ('šnj', False), 'štva': ('štv', False),
    'štvo': ('štv', False), 'štvu': ('štv', False),
    'žija': ('žij', False), 'žije': ('žij', False),
    'žiji': ('žij', False), 'žijo': ('žij', False),
    'žiju': ('žij', False), 'aca': ('ac', True), 'ace': ('ac', True),
    'aci': ('ac', True), 'ahu': ('a', False), 'aja': ('aj', False),
    'aje': ('a', False), 'aji': ('aj', False), 'aju': ('a', False),
    'ala': ('a', False), 'ale': ('a', False), 'ali': ('a', False),
    'alo': ('a', False), 'alu': ('a', False), 'amo': ('a', False),
    'ana': ('an', False), 'ane': ('an', False), 'ani': ('an', False),
    'ano': ('a', False), 'anu': ('an', False), 'ara': ('ar', False),
    'are': ('ar', False), 'ari': ('ar', False), 'aru': ('ar', False),
    'ase': ('a', True), 'ata': ('at', False), 'ate': ('a', False),
    'ati': ('a', False), 'ato': ('at', False), 'atu': ('at', False),
    'ava': ('av', False), 'ave': ('av', False), 'avi': ('av', False),
    'avo': ('av', False), 'avu': ('av', False), 'aća': ('ać', False),
    'aće': ('ać', False), 'ače': ('ač', False), 'ači': ('ač', False),
    'aše': ('a', False), 'dra': ('dr', False), 'dre': ('dr', False),
    'dri': ('dr', False), 'dru': ('dr', False), 'eca': ('ec', True),
    'ece': ('ec', True), 'ela': ('el', False), 'ele': ('el', False),
    'eli': ('el', False), 'elo': ('el', False), 'elu': ('el', False),
    'emo': ('e', False), 'era': ('er', False), 'ere': ('er', False),
    'eri': ('er', False), 'eru': ('er', False), 'esa': ('es', False),
    'ese': ('es', False), 'esi': ('es', True), 'esu': ('es', False),
    'eta': ('et', False), 'ete': ('et', False), 'eti': ('et', False),
    'eto': ('et', False), 'etu': ('et', False), 'eva': ('ev', False),
    'eve': ('ev', False), 'evi': ('ev', False), 'evo': ('ev', False),
    'evu': ('ev', False), 'eća': ('eć', False), 'eće': ('eć', False),
    'eša': ('eš', False), 'eše': ('eš', False), 'eši': ('eš', False),
    'ešu': ('eš', False), 'gom': ('g', False), 'ije': ('i', False),
    'iju': ('i', False), 'ila': ('i', False), 'ile': ('i', False),
    'ili': ('i', False), 'ilo': ('i', False), 'ilu': ('i', False),
    'imo': ('i', False), 'ina': ('in', False), 'ine': ('in', False),
    'ini': ('in', False), 'ino': ('in', False), 'inu': ('in', False),
    'isa': ('is', False), 'ise': ('is', False), 'isi': ('is', True),
    'isu': ('is', False), 'ite': ('i', False), 'iti': ('i', False),
    'iva': ('iv', False), 'ive': ('iv', False), 'ivi': ('iv', False),
    'ivo': ('iv', False), 'ivu': ('iv', False), 'iša': ('iš', False),
    'iše': ('iš', False), 'iši': ('iš', False), 'išu': ('iš', False),
    'keg': ('k', False), 'kem': ('k', False), 'kih': ('k', False),
    'kim': ('k', False), 'kog': ('k', False), 'koj': ('k', False),
    'kom': ('k', False), 'kov': ('k', False), 'lio': ('li', False),
    'neg': ('n', False), 'nem': ('n', False), 'nes': ('n', True),
    'neš': ('n', False), 'nih': ('n', False), 'nim': ('n', False),
    'nio': ('ni', False), 'nis': ('ni', True), 'niš': ('ni', False),
    'nog': ('n', False), 'noj': ('n', False), 'nom': ('n', False),
    'nuo': ('n', False), 'nut': ('n', False), 'ola': ('ol', False),
    'ole': ('ol', False), 'oli': ('ol', False), 'olu': ('ol', False),
    'ona': ('on', False), 'one': ('on', False), 'oni': ('on', False),
    'onu': ('on', False), 'ora': ('or', False), 'ore': ('or', False),
    'ori': ('or', False), 'oru': ('or', False), 'osa': ('os', True),
    'ose': ('os', True), 'osi': ('os', True), 'osu': ('os', True),
    'ova': ('ov', False), 'ove': ('ov', False), 'ovi': ('ov', False),
    'ovo': ('ov', False), 'ovu': ('ov', False), 'oša': ('oš', False),
    'oše': ('oš', False), 'oši': ('oš', False), 'ošu': ('oš', False),
    'sio': ('si', False), 'ska': ('sk', False), 'ske': ('sk', False),
    'ski': ('sk', False), 'sko': ('sk', False), 'sku': ('sk', False),
    'tah': ('ta', False), 'taj': ('ta', False), 'tam': ('ta', False),
    'tan': ('ta', False), 'tao': ('ta', False), 'tas': ('ta', True),
    'tat': ('ta', False), 'taš': ('ta', False), 'uca': ('uc', True),
    'uce': ('uc', True), 'uga': ('ug', False), 'uge': ('ug', False),
    'ugi': ('ug', False), 'ugo': ('ug', False), 'ugu': ('ug', False),
    'uje': ('uj', False), 'uju': ('uj', False), 'uća': ('uć', False),
    'uće': ('uć', False), 'ška': ('šk', False), 'ške': ('šk', False),
    'ški': ('šk', False), 'ško': ('šk', False), 'šku': ('šk', False),
    'ah': ('a', False), 'aj': ('a', False), 'al': ('a', False),
    'am': ('a', False), 'an': ('a', False), 'ao': ('a', False),
    'as': ('a', True), 'at': ('a', False), 'aš': ('a', False),
    'el': ('e', False), 'em': ('e', False), 'es': ('e', True),
    'eš': ('e', False), 'ga': ('g', False), 'ge': ('g', False),
    'gi': ('g', False), 'go': ('g', False), 'gu': ('g', False),
    'ih': ('i', False), 'ij': ('i', False), 'il': ('i', False),
    'im': ('i', False), 'io': ('i', False), 'is': ('i', True),
    'it': ('i', False), 'iš': ('i', False), 'ka': ('k', False),
    'ke': ('k', False), 'ki': ('k', False), 'ko': ('k', False),
    'ku': ('k', False), 'na': ('n', False), 'ne': ('n', False),
    'ni': ('n', False), 'no': ('n', False), 'nu': ('n', False),
}
_RS_STEP2_SUFS = sorted(_RS_STEP2, key=len, reverse=True)
_RS_STEP3 = (
    'anim', 'anih', 'anoj', 'enoj', 'anog', 'enog', 'enim', 'enih',
    'enom', 'enu', 'ano', 'eni', 'ima', 'oga', 'ani', 'ost', 'eno',
    'ama', 'ena', 'og', 'om', 'e', 'a', 'u', 'i', 'o',
)


def _rs_prelude(w: str) -> str:
    w = "".join(_RS_CYR.get(ch, ch) for ch in w)
    for pat, plen in (("ije", 3), ("je", 2)):
        i = 0
        while i < len(w):
            if w[i] in _RS_CONS and w[i + 1:i + 1 + plen] == pat \
                    and i + 1 + plen < len(w) and w[i + 1 + plen] in _RS_CONS:
                w = w[:i + 1] + "e" + w[i + 1 + plen:]
            else:
                i += 1
    return w.replace("dj", "đ")


def _rs_r1(w: str) -> int:
    n = len(w)
    s = n
    i = 0
    while i < n and w[i] not in _RS_VOWELS:
        i += 1
    if i < n:
        s = i + 1
        if s < 2:
            # extend past the next non-vowel
            j = s
            while j < n and w[j] in _RS_VOWELS:
                j += 1
            if j < n:
                s = j + 1
    # syllabic r can start the region
    i = w.find("r")
    if i != -1:
        cur = i + 1
        ok = True
        if cur < 2:
            j = cur
            while j < n and w[j] == "r":
                j += 1
            if j < n:
                cur = j + 1
            else:
                ok = False
        if ok and s - cur > 1:
            s = cur
    return s


def serbian_stem(word: str) -> str:
    w = _rs_prelude(word)
    no_special = not any(ch in _RS_SPECIAL for ch in w)
    r1 = _rs_r1(w)
    # step 1: unrestricted replacements
    for suf in _RS_STEP1_SUFS:
        if w.endswith(suf):
            rep, need_flag = _RS_STEP1[suf]
            if not need_flag or no_special:
                w = w[:len(w) - len(suf)] + rep
            break
    # step 2: R1-gated replacements; else step 3: R1-gated deletion
    done2 = False
    for suf in _RS_STEP2_SUFS:
        if w.endswith(suf):
            pos = len(w) - len(suf)
            rep, need_flag = _RS_STEP2[suf]
            if pos >= r1 and (not need_flag or no_special):
                w = w[:pos] + rep
                done2 = True
            break
    if not done2:
        for suf in _RS_STEP3:
            if w.endswith(suf):
                if len(w) - len(suf) >= r1:
                    w = w[:len(w) - len(suf)]
                break
    return w


SNOWBALL.update({"rs": serbian_stem, "sr": serbian_stem,
                 "serbian": serbian_stem})


# ---------------------------------------------------------------------------
# Arabic (Snowball arabic: presentation-form/diacritic normalization,
# is_noun/is_verb/is_defined flags from the definite article, verb and noun
# suffix chains with whole-word length gates, prefix steps, hamza postlude)
# ---------------------------------------------------------------------------

_AR_DIACRITICS = "ـًٌٍَُِّْ"
_AR_DIGITS = {chr(0x660 + i): str(i) for i in range(10)}
# presentation forms FE80-FEFC -> canonical; generated from the Unicode
# Arabic Presentation Forms-B block structure
_AR_PRESENT = {}
for _base, _forms in (
        ("ء", "ﺀ"), ("آ", "ﺁﺂ"),
        ("أ", "ﺃﺄ"), ("ؤ", "ﺅﺆ"),
        ("إ", "ﺇﺈ"), ("ئ", "ﺉﺊﺋﺌ"),
        ("ا", "ﺍﺎ"), ("ب", "ﺏﺐﺑﺒ"),
        ("ة", "ﺓﺔ"), ("ت", "ﺕﺖﺗﺘ"),
        ("ث", "ﺙﺚﺛﺜ"),
        ("ج", "ﺝﺞﺟﺠ"),
        ("ح", "ﺡﺢﺣﺤ"),
        ("خ", "ﺥﺦﺧﺨ"),
        ("د", "ﺩﺪ"), ("ذ", "ﺫﺬ"),
        ("ر", "ﺭﺮ"), ("ز", "ﺯﺰ"),
        ("س", "ﺱﺲﺳﺴ"),
        ("ش", "ﺵﺶﺷﺸ"),
        ("ص", "ﺹﺺﺻﺼ"),
        ("ض", "ﺽﺾﺿﻀ"),
        ("ط", "ﻁﻂﻃﻄ"),
        ("ظ", "ﻅﻆﻇﻈ"),
        ("ع", "ﻉﻊﻋﻌ"),
        ("غ", "ﻍﻎﻏﻐ"),
        ("ف", "ﻑﻒﻓﻔ"),
        ("ق", "ﻕﻖﻗﻘ"),
        ("ك", "ﻙﻚﻛﻜ"),
        ("ل", "ﻝﻞﻟﻠ"),
        ("م", "ﻡﻢﻣﻤ"),
        ("ن", "ﻥﻦﻧﻨ"),
        ("ه", "ﻩﻪﻫﻬ"),
        ("و", "ﻭﻮ"), ("ى", "ﻯﻰ"),
        ("ي", "ﻱﻲﻳﻴ"),
        ("لآ", "ﻵﻶ"), ("لأ", "ﻷﻸ"),
        ("لإ", "ﻹﻺ"), ("لا", "ﻻﻼ")):
    for _f in _forms:
        _AR_PRESENT[_f] = _base


def _ar_normalize_pre(w: str) -> str:
    out = []
    for ch in w:
        if ch in _AR_DIACRITICS:
            continue
        out.append(_AR_DIGITS.get(ch) or _AR_PRESENT.get(ch) or ch)
    return "".join(out)


def _ar_normalize_post(w: str) -> str:
    if w and w[-1] in "آأؤإئ":
        w = w[:-1] + "ء"
    tr = {"آ": "ا", "أ": "ا", "إ": "ا",
          "ؤ": "و", "ئ": "ي"}
    return "".join(tr.get(ch, ch) for ch in w)


def _ar_suf_verb_obj(t):
    """t(): verb object pronoun, length-gated delete."""
    t.mark()
    for suf, need in (("كمو", 6), ("كما", 6),
                      ("هما", 6), ("نا", 5),
                      ("ها", 5), ("كم", 5),
                      ("هم", 5), ("كن", 5),
                      ("هن", 5), ("ني", 5),
                      ("ك", 4), ("ه", 4)):
        if t.eq(suf):
            if len(t.w) >= need:
                t.delete()
                return True
            t.dfe = t.bend
            return False
    return False


def _ar_suf_verb_2a(t):
    """s(): verb subject suffixes."""
    t.mark()
    for suf, need, strict in (("تما", 6, False),
                              ("تا", 5, False),
                              ("نا", 5, False),
                              ("ان", 5, True),
                              ("تن", 5, False),
                              ("ون", 5, True),
                              ("ين", 5, True),
                              ("ا", 4, False), ("ت", 4, False),
                              ("ن", 4, False), ("ي", 4, False)):
        if t.eq(suf):
            ln = len(t.w)
            ok = ln > need if strict else ln >= need
            if ok:
                t.delete()
                return True
            t.dfe = t.bend
            return False
    return False


def _ar_gated(t, entries):
    """Backward among of (suffix, min_len) -> delete; no fallback."""
    t.mark()
    for suf, need in entries:
        if t.eq(suf):
            if len(t.w) >= need:
                t.delete()
                return True
            t.dfe = t.bend
            return False
    return False


def _ar_suf_noun_pron(t):   # v()
    return _ar_gated(t, (("كما", 6), ("هما", 6),
                         ("نا", 5), ("ها", 5),
                         ("كم", 5), ("هم", 5),
                         ("هن", 5), ("ك", 4), ("ه", 4),
                         ("ي", 4)))


def _ar_suf_awi(t):         # b(): trailing alef/waw/yeh, len > 4
    return _ar_gated(t, (("ا", 5), ("و", 5), ("ي", 5)))


def _ar_suf_at(t):          # f(): feminine plural
    return _ar_gated(t, (("ات", 5),))


def _ar_suf_t(t):           # q()
    return _ar_gated(t, (("ت", 4),))


def _ar_suf_wa_tm(t):       # V table
    return _ar_gated(t, (("وا", 5), ("تم", 5)))


def _ar_suf_w_tmw(t):       # r()
    return _ar_gated(t, (("تمو", 6), ("و", 4)))


def arabic_stem(word: str) -> str:  # noqa: C901 — mirrors the spec's flow
    w = word
    # Checks_1 on the RAW word (before normalization)
    is_verb, is_noun, is_defined = True, True, False
    for pre, need in (("بال", 5), ("كال", 5),
                      ("ال", 4), ("لل", 4)):
        if w.startswith(pre):
            if len(w) >= need:
                is_noun, is_verb, is_defined = True, False, True
            break
    w = _ar_normalize_pre(w)
    t = _TrC(w)

    # ----- suffixes (backward) -----
    done = False
    verb_chain_done = False
    if is_verb:
        w0 = t.dfe
        got = False
        while _ar_suf_verb_obj(t):      # Suf_step1a, at least once
            got = True
        if got:
            s0 = t.dfe
            if _ar_suf_verb_2a(t):
                verb_chain_done = True
            else:
                t.dfe = s0
                if _ar_suf_w_tmw(t):
                    verb_chain_done = True
                else:
                    t.dfe = s0
                    if len(t.w) - t.dfe > 0:    # 'next'
                        verb_chain_done = True
        if not verb_chain_done:
            t.dfe = w0
            if _ar_suf_wa_tm(t):
                verb_chain_done = True
        if not verb_chain_done:
            t.dfe = w0
            verb_chain_done = _ar_suf_verb_2a(t)
        done = verb_chain_done
    if not done and is_noun:
        t.dfe = 0
        w0 = t.dfe
        y0 = t.dfe
        matched = False
        if _ar_gated(t, (("ة", 4),)):               # teh marbuta
            matched = True
        if not matched:
            t.dfe = y0
            if not is_defined and _ar_suf_noun_pron(t):
                g0 = t.dfe
                if _ar_suf_awi(t):
                    matched = True
                else:
                    t.dfe = g0
                    if _ar_suf_at(t):
                        matched = True
                    else:
                        t.dfe = g0
                        if _ar_suf_t(t):
                            matched = True
                        else:
                            t.dfe = g0
                            if len(t.w) - t.dfe > 0:    # 'next'
                                matched = True
                            # else: pronoun deletion persists, chain on
        if not matched:
            t.dfe = y0
            if _ar_gated(t, (("ن", 6),)):           # nun, len > 5
                g0 = t.dfe
                if _ar_suf_awi(t):
                    matched = True
                else:
                    t.dfe = g0
                    if _ar_suf_at(t):
                        matched = True
                    else:
                        t.dfe = g0
                        if _ar_suf_t(t):
                            matched = True
                        # else: nun deletion persists, chain on
        if not matched:
            t.dfe = y0
            if not is_defined and _ar_suf_awi(t):
                matched = True
        if not matched:
            t.dfe = y0
            if not _ar_suf_at(t):
                t.dfe = w0
        # trailing yeh ends the noun chain
        if _ar_gated(t, (("ي", 3),)):
            done = True
    if not done:
        t.dfe = 0
        t.mark()
        if t.eq("ى"):                               # alef maqsura -> yeh
            p0 = t.pos()
            t.w = t.w[:p0] + "ي" + t.w[len(t.w) - t.bend:]
            t.dfe = t.bend

    # ----- prefixes (forward; the cursor ADVANCES past replacements, so
    # each later step matches after the already-consumed prefix) -----
    w = t.w
    cur = 0
    for pre, rep in (("أآ", "آ"), ("أأ", "أ"),
                     ("أؤ", "أ"), ("أإ", "إ"),
                     ("أا", "ا")):
        if w.startswith(pre, cur):
            if len(w) > 3:
                w = w[:cur] + rep + w[cur + 2:]
                cur += 1
            break
    if w[cur:cur + 1] in ("ف", "و") and len(w) > 3 \
            and w[cur + 1:cur + 2] != "ا":
        w = w[:cur] + w[cur + 1:]
    done3 = False
    for pre, need in (("بال", 6), ("كال", 6),
                      ("ال", 5), ("لل", 5)):
        if w.startswith(pre, cur):
            if len(w) >= need:
                w = w[:cur] + w[cur + len(pre):]
                done3 = True
            break
    if not done3 and is_noun:
        if w.startswith("بب", cur):
            if len(w) > 3:
                w = w[:cur] + "ب" + w[cur + 2:]
                done3 = True
        elif w.startswith("با", cur):
            done3 = True                            # blocked: match, no-op
        elif w.startswith("كك", cur):
            if len(w) > 3:
                w = w[:cur] + "ك" + w[cur + 2:]
                done3 = True
        elif w.startswith("ب", cur):
            if len(w) > 3:
                w = w[:cur] + w[cur + 1:]
                done3 = True
    if not done3 and is_verb:
        for pre, rep in (("سأ", "أ"), ("ست", "ت"),
                         ("سن", "ن"), ("سي", "ي")):
            if w.startswith(pre, cur):
                if len(w) > 4:
                    w = w[:cur] + rep + w[cur + 2:]
                    cur += 1
                break
        for pre in ("تست", "نست", "يست"):
            if w.startswith(pre, cur):
                if len(w) > 4:
                    w = w[:cur] + "است" + w[cur + 3:]
                break
    return _ar_normalize_post(w)


SNOWBALL.update({"ar": arabic_stem, "arabic": arabic_stem})


# ---------------------------------------------------------------------------
# Tamil (Snowball tamil — Damodharan's algorithm: va-start and ending
# fixups, question/pronoun prefixes, plural/question/command/um/common/
# vetrumai/tense suffix chains with lookbehind guards)
# ---------------------------------------------------------------------------

_TA_VIRAMA = "்"
_TA_A0 = "கஙசஞதநபமயவ"          # grantha-initial consonants
_TA_IY = "ிீை"
_TA_HARD = "கசடதபற"
_TA_A6 = "யரலளழவ"
_TA_A7 = "ஙஞணநனம"
_TA_SIGNS = "ாிீுூெேை"          # dependent vowel signs
_TA_INDEP = "அஆஇஈஉஊஎஏஐஒஓஔ"    # independent vowels
_TA_PRON = "அஇஉ"


def _ta_fix_va_start(w: str) -> str:
    for pre, rep in (("வோ", "ஓ"), ("வொ", "ஒ"), ("வு", "உ"), ("வூ", "ஊ")):
        if w.startswith(pre):
            return rep + w[2:]
    return w


def _ta_fix_ending(w: str, found_vetrumai: bool):
    """One fix_ending pass; returns (new_w, matched)."""
    if len(w) <= 3:
        return w, False
    for suf in ("ந்த்", "ந்த", "ந்"):
        if w.endswith(suf):
            return w[:len(w) - len(suf)], True
    if w.endswith("ய்") and len(w) >= 3 and w[-3] in _TA_IY:
        return w[:-2], True
    for suf in ("ட்ப்", "ட்க்"):
        if w.endswith(suf):
            return w[:len(w) - len(suf)] + "ள்", True
    if w.endswith("ன்ற்"):
        return w[:-4] + "ல்", True
    if w.endswith("ற்க்"):
        return w[:-4] + "ல்", True
    if w.endswith("ட்ட்"):
        return w[:-4] + "டு", True
    if found_vetrumai and w.endswith("த்த்") \
            and w[-5:-4] != "ை":
        return w[:-4] + "ம்", True
    for suf in ("ுக்க்", "ுக்"):
        if w.endswith(suf):
            return w[:len(w) - len(suf)] + _TA_VIRAMA, True
    if len(w) >= 4 and w[-1] == _TA_VIRAMA and w[-2] in _TA_HARD \
            and w[-3] == _TA_VIRAMA and w[-4] in _TA_HARD:
        return w[:-4], True
    if len(w) >= 2 and w[-1] == _TA_VIRAMA and w[-2] in _TA_HARD:
        return w[:-2], True
    if len(w) >= 3 and w[-1] == _TA_VIRAMA \
            and (w[-2] in _TA_A6 or w[-2] in _TA_A7) \
            and w[-3] == _TA_VIRAMA:
        return w[:-3] + _TA_VIRAMA, True
    for suf in ("வ்", "ய", "வ"):
        if w.endswith(suf):
            return w[:len(w) - len(suf)], True
    if w.endswith("னு") and w[-3:-2] not in tuple(_TA_SIGNS):
        return w[:-2], True
    if w.endswith("ங்") and w[-3:-2] != "ை":
        return w[:-2] + "ம்", True
    if w.endswith("ங்"):
        return w[:-2], True
    if w and w[-1] == _TA_VIRAMA and len(w) >= 2 \
            and (w[-2] in _TA_SIGNS or w[-2] == _TA_VIRAMA):
        return w[:-1], True
    return w, False


def _ta_fix_endings(w: str, found_vetrumai: bool) -> str:
    while True:
        w, ok = _ta_fix_ending(w, found_vetrumai)
        if not ok:
            return w


def tamil_stem(word: str) -> str:  # noqa: C901 — mirrors the spec's steps
    w = word
    found_vetrumai = False
    w, _ = _ta_fix_ending(w, found_vetrumai)
    if len(w) <= 4:
        return w

    # remove_question_prefixes
    if len(w) >= 3 and w[0] == "எ" and w[1] in _TA_A0 \
            and w[2] == _TA_VIRAMA:
        w = _ta_fix_va_start(w[3:])

    # remove_pronoun_prefixes
    if len(w) >= 3 and w[0] in _TA_PRON and w[1] in _TA_A0 \
            and w[2] == _TA_VIRAMA:
        w = _ta_fix_va_start(w[3:])

    # remove_question_suffixes
    if len(w) > 4:
        if w[-1:] in ("ா", "ே", "ோ"):
            w = w[:-1] + _TA_VIRAMA
        w = _ta_fix_endings(w, found_vetrumai)

    # remove_um
    if len(w) > 4 and w.endswith("ும்"):
        w = w[:-3] + _TA_VIRAMA
        w, _ = _ta_fix_ending(w, found_vetrumai)

    # remove_common_word_endings
    if len(w) > 4:
        matched = False
        for suf in ("ுடன்", "ில்லை", "ிடம்", "ின்றி", "ாகி", "ாகிய",
                    "ென்று", "ுள்ள", "ுடைய", "ுடை", "ெனும்"):
            if w.endswith(suf):
                w = w[:len(w) - len(suf)] + _TA_VIRAMA
                matched = True
                break
        if not matched and w.endswith("ல்ல") \
                and w[-4:-3] not in tuple(_TA_SIGNS):
            w = w[:-3] + _TA_VIRAMA
            matched = True
        if not matched:
            for suf in ("ென", "ாகி"):
                if w.endswith(suf):
                    w = w[:len(w) - len(suf)] + _TA_VIRAMA
                    matched = True
                    break
        if not matched:
            for suf in sorted(("பட்ட", "பட்டண", "தான", "படிதான",
                               "குரிய", "படி", "பற்றி", "படு", "விடு",
                               "பட்டு", "விட்டு", "பட்டது", "ெல்லாம்"),
                              key=len, reverse=True):
                if w.endswith(suf):
                    w = w[:len(w) - len(suf)]
                    break
        w = _ta_fix_endings(w, found_vetrumai)

    # remove_vetrumai_urupukal
    if len(w) > 4:
        matched = False
        if w.endswith("னை"):
            w = w[:-2]
            matched = True
        if not matched:
            if w.endswith("ினை") and w[-4:-3] not in tuple(_TA_HARD):
                w = w[:-3] + _TA_VIRAMA
                matched = True
            elif w.endswith("ை") and not w.endswith("ினை") \
                    and w[-2:-1] not in tuple(_TA_HARD):
                w = w[:-1] + _TA_VIRAMA
                matched = True
            elif w.endswith("ை") and len(w) >= 3 \
                    and w[-2] in _TA_HARD and w[-3] == _TA_VIRAMA:
                w = w[:-1] + _TA_VIRAMA
                matched = True
        if not matched:
            for suf in ("ொடு", "ோடு", "ில்", "ிற்", "ின்று", "ிருந்து",
                        "வி" "ட", "ால்", "ுடை", "ாமல்", "ுள்"):
                if w.endswith(suf):
                    w = w[:len(w) - len(suf)] + _TA_VIRAMA
                    matched = True
                    break
            if not matched and w.endswith("ின்") and w[-4:-3] != "ம":
                w = w[:-3] + _TA_VIRAMA
                matched = True
            if not matched and len(w) >= 7 and w.endswith("ிடம்"):
                w = w[:-4] + _TA_VIRAMA
                matched = True
            if not matched and w.endswith("ல்") \
                    and w[-3:-2] not in tuple(_TA_SIGNS):
                w = w[:-2] + _TA_VIRAMA
                matched = True
        if not matched:
            for suf in ("கண்", "முன்", "மேல்", "மேற்", "கீழ்", "பின்"):
                if w.endswith(suf):
                    w = w[:len(w) - len(suf)]
                    matched = True
                    break
            if not matched and w.endswith("து") \
                    and w[-3:-2] not in tuple(_TA_SIGNS):
                w = w[:-2]
                matched = True
        if not matched and w.endswith("ீ"):
            w = w[:-1] + "ி"
            matched = True
        if matched:
            found_vetrumai = True
            if w.endswith("ின்"):
                w = w[:-3] + _TA_VIRAMA
            w = _ta_fix_endings(w, found_vetrumai)

    # remove_plural_suffix
    if len(w) > 4:
        if w.endswith("ுங்கள்") and w[-7:-6] not in tuple(_TA_HARD):
            w = w[:-6] + _TA_VIRAMA
        elif w.endswith("ற்கள்"):
            w = w[:-5] + "ல்"
        elif w.endswith("ட்கள்"):
            w = w[:-5] + "ள்"
        elif w.endswith("கள்"):
            w = w[:-3]

    # remove_command_suffixes
    if len(w) > 4 and w[-2:] in ("பி", "வி"):
        w = w[:-2]

    # remove_tense_suffixes
    found = True
    while found:
        w, found, found_vetrumai = _ta_tense_suffix(w, found_vetrumai)
    return w


def _ta_tense_suffix(w: str, found_vetrumai: bool):
    found = False
    if len(w) <= 4:
        return w, False, found_vetrumai
    matched = False
    for suf in ("கொண்டிர்", "படு"):
        if w.endswith(suf):
            w = w[:len(w) - len(suf)]
            found = matched = True
            break
    if not matched:
        for suf, guard in (
                ("மார்", None), ("மின்", None), ("னன்", None),
                ("னான்", None), ("னாள்", None), ("னார்", None),
                ("வன்", "indep"), ("னள்", None), ("வள்", None),
                ("னர்", None), ("வர்", None), ("ன", None), ("ப", None),
                ("க", None), ("த", None), ("ய", None), ("பன்", None),
                ("பள்", None), ("பர்", None), ("து", "signs"),
                ("ிற்று", None), ("பம்", None), ("னம்", None),
                ("தும்", None), ("றும்", None), ("கும்", None),
                ("னென்", None), ("னை", None), ("வை", None)):
            if w.endswith(suf):
                pre = w[len(w) - len(suf) - 1:len(w) - len(suf)]
                if guard == "indep" and pre in tuple(_TA_INDEP):
                    continue
                if guard == "signs" and pre in tuple(_TA_SIGNS):
                    continue
                w = w[:len(w) - len(suf)]
                found = matched = True
                break
    if not matched:
        for suf, guard in (
                ("ான்", "notcha"), ("ாள்", None), ("ார்", None),
                ("ேன்", None), ("ா", None), ("ாம்", None), ("ெம்", None),
                ("ேம்", None), ("ோம்", None), ("கும்", None),
                ("தும்", None), ("டும்", None), ("றும்", None),
                ("ாய்", None), ("னென்", None), ("னிர்", None),
                ("ீர்", None), ("ீயர்", None)):
            if w.endswith(suf):
                pre = w[len(w) - len(suf) - 1:len(w) - len(suf)]
                if guard == "notcha" and pre == "ச":
                    continue
                w = w[:len(w) - len(suf)] + _TA_VIRAMA
                found = matched = True
                break
    if not matched:
        for suf in ("கு", "து"):
            if w.endswith(suf) and w[-3:-2] == _TA_VIRAMA:
                w = w[:-2]
                found = True
                break
    for suf in ("ாநின்ற்", "கின்ற்", "ாநின்ற", "கின்ற", "கிற்", "கிற"):
        if w.endswith(suf):
            w = w[:len(w) - len(suf)]
            found = True
            break
    w = _ta_fix_endings(w, found_vetrumai)
    return w, found, found_vetrumai


SNOWBALL.update({"ta": tamil_stem, "tamil": tamil_stem})


# ---------------------------------------------------------------------------
# Greek (Snowball greek — Smirnov's adaptation of the Ntais algorithm.
# Implemented over a faithful backward-cursor state machine (_GrS) that
# reproduces the reference runtime's bracket semantics exactly, including
# stale-bracket slice failures that skip a step's exception block.)
# ---------------------------------------------------------------------------

_GR_LOWER = {'Ά': 'α', 'Έ': 'ε', 'Ή': 'η', 'Ί': 'ι', 'Ό': 'ο', 'Ύ': 'υ', 'Ώ': 'ω', 'ΐ': 'η', 'Α': 'α', 'Β': 'β', 'Γ': 'γ', 'Δ': 'δ', 'Ε': 'ε', 'Ζ': 'ζ', 'Η': 'η', 'Θ': 'θ', 'Ι': 'ι', 'Κ': 'κ', 'Λ': 'λ', 'Μ': 'μ', 'Ν': 'ν', 'Ξ': 'ξ', 'Ο': 'ο', 'Π': 'π', 'Ρ': 'ρ', 'Σ': 'σ', 'Τ': 'τ', 'Υ': 'υ', 'Φ': 'φ', 'Χ': 'χ', 'Ψ': 'ψ', 'Ω': 'ω', 'Ϊ': 'ι', 'Ϋ': 'υ', 'ά': 'α', 'έ': 'ε', 'ή': 'η', 'ί': 'ι', 'ΰ': 'υ', 'ς': 'σ', 'ϊ': 'η', 'ϋ': 'υ', 'ό': 'ο', 'ύ': 'υ', 'ώ': 'ω'}
_GR_STEP1_REP = {1: "φα", 2: "σκα", 3: "ολο", 4: "σο", 5: "τατο",
                 6: "κρε", 7: "περ", 8: "τερ", 9: "φω",
                 10: "καθεστ", 11: "γεγον"}
_GR_Z_REP = {1: "αγνωστ", 2: "ατομ", 3: "γνωστ", 4: "εθν",
             5: "εκλεκτ", 6: "σκεπτ", 7: "τοπ", 8: "αλεξανδρ",
             9: "βυζαντ", 10: "θεατρ"}
_GR_VOWELS = "αεηιουω"
_GR_T_n = (
    ('καθεστωτοσ', 10), ('καθεστωτων', 10), ('γεγονοτοσ', 11),
    ('γεγονοτων', 11), ('καθεστωτα', 10), ('γεγονοτα', 11),
    ('καθεστωσ', 10), ('τατογιου', 5), ('τατογιων', 5), ('γεγονοσ', 11),
    ('κρεατοσ', 6), ('κρεατων', 6), ('ολογιου', 3), ('ολογιων', 3),
    ('περατοσ', 7), ('περατων', 7), ('σκαγιου', 2), ('σκαγιων', 2),
    ('τατογια', 5), ('τερατοσ', 8), ('τερατων', 8), ('κρεατα', 6),
    ('ολογια', 3), ('περατα', 7), ('περατη', 7), ('σκαγια', 2),
    ('σογιου', 4), ('σογιων', 4), ('τερατα', 8), ('φαγιου', 1),
    ('φαγιων', 1), ('κρεασ', 6), ('περασ', 7), ('σογια', 4),
    ('τερασ', 8), ('φαγια', 1), ('φωτοσ', 9), ('φωτων', 9), ('φωτα', 9),
    ('φωσ', 9),
)
_GR_T_b = (
    ('ιζουμε', 1), ('ιζουνε', 1), ('ιζαμε', 1), ('ιζανε', 1),
    ('ιζατε', 1), ('ιζεισ', 1), ('ιζετε', 1), ('ιζουν', 1), ('ιζαν', 1),
    ('ιζει', 1), ('ιζεσ', 1), ('ιζα', 1), ('ιζε', 1), ('ιζω', 1),
)
_GR_T_v = (
    ('πιπερορ', 2), ('συναθρο', 1), ('αναμπα', 1), ('βαθυρι', 2),
    ('βολβορ', 2), ('γλυκορ', 2), ('γλυκυρ', 2), ('ξαναπα', 1),
    ('περιπα', 1), ('αμπαρ', 2), ('πολυρ', 2), ('αθρο', 1), ('βαρκ', 2),
    ('δανε', 1), ('εμπα', 1), ('κορν', 2), ('μαρκ', 2), ('αρρ', 2),
    ('γκρ', 2), ('επα', 1), ('ιμπ', 2), ('λου', 2), ('μαρ', 2),
    ('μπρ', 2), ('πα', 1), ('πρ', 2), ('β', 2), ('λ', 2), ('μ', 2),
    ('π', 2), ('ρ', 2),
)
_GR_T_q = (
    ('ωθηκαμε', 1), ('ωθηκανε', 1), ('ωθηκατε', 1), ('ωθηκαν', 1),
    ('ωθηκεσ', 1), ('ωθηκα', 1), ('ωθηκε', 1),
)
_GR_T_f = (
    ('αλ', 1), ('βι', 1), ('εν', 1), ('ζω', 1), ('λι', 1), ('υψ', 1),
    ('σ', 1), ('χ', 1),
)
_GR_T_s = (
    ('ισαμε', 1), ('ισανε', 1), ('ισατε', 1), ('ισαν', 1), ('ισεσ', 1),
    ('ισα', 1), ('ισε', 1),
)
_GR_T_t = (
    ('γιγαντοαφ', 2), ('δημοκρατ', 2), ('συναθρο', 1), ('χαρτοπα', 1),
    ('αναμπα', 1), ('απεκλε', 1), ('αποκλε', 1), ('εξαρχα', 1),
    ('εσωκλε', 1), ('μετεπε', 1), ('ξαναπα', 1), ('περιπα', 1),
    ('πουκαμ', 2), ('αθρο', 1), ('δανε', 1), ('εκλε', 1), ('εμπα', 1),
    ('γκε', 2), ('επα', 1), ('επε', 1), ('εσε', 1), ('κλε', 1),
    ('κομ', 2), ('λαρ', 2), ('ολο', 2), ('αν', 2), ('αφ', 2), ('γε', 2),
    ('γκ', 2), ('πε', 1), ('μ', 2), ('π', 2),
)
_GR_T_m = (
    ('ισουμε', 1), ('ισουνε', 1), ('ισεισ', 1), ('ισετε', 1),
    ('ισουν', 1), ('ισει', 1), ('ισω', 1),
)
_GR_T_r = (
    ('συναθρο', 1), ('χαρτοπα', 1), ('αναμπα', 1), ('απεκλε', 1),
    ('αποκλε', 1), ('εξαρχα', 1), ('εσωκλε', 1), ('μετεπε', 1),
    ('ξαναπα', 1), ('περιπα', 1), ('αθρο', 1), ('δανε', 1), ('εκλε', 1),
    ('εμπα', 1), ('επα', 1), ('επε', 1), ('εσε', 1), ('κλε', 1),
    ('πε', 1),
)
_GR_T_u = (
    ('ιστουσ', 1), ('ιστεσ', 1), ('ιστησ', 1), ('ιστοι', 1),
    ('ιστοσ', 1), ('ιστου', 1), ('ιστων', 1), ('ιστα', 1), ('ιστε', 1),
    ('ιστη', 1), ('ιστο', 1),
)
_GR_T_w = (
    ('συναθρο', 1), ('εσωκλε', 1), ('δανε', 1), ('ακτ', 2), ('αορ', 2),
    ('ασε', 1), ('ασχ', 2), ('ατα', 2), ('αχν', 2), ('αχτ', 2),
    ('γεμ', 2), ('γυρ', 2), ('εμπ', 2), ('ευπ', 2), ('εχθ', 2),
    ('ηφα', 2), ('καθ', 2), ('κακ', 2), ('κλε', 1), ('κυλ', 2),
    ('λυγ', 2), ('μακ', 2), ('μεγ', 2), ('πλε', 1), ('ταχ', 2),
    ('φιλ', 2), ('χωρ', 2), ('απ', 2), ('αρ', 2), ('ηδ', 2), ('κτ', 2),
    ('σε', 1), ('σκ', 2), ('σχ', 2), ('υψ', 2), ('φα', 2), ('χρ', 2),
    ('χτ', 2), ('μ', 2), ('π', 2),
)
_GR_T_e = (
    ('ισμουσ', 1), ('ισμοι', 1), ('ισμοσ', 1), ('ισμου', 1),
    ('ισμων', 1), ('ισμο', 1),
)
_GR_T_y = (
    ('αντιδανε', 2), ('μικροσε', 1), ('αποκλε', 1), ('μετασε', 1),
    ('εγκλε', 1), ('δανε', 2), ('σε', 1),
)
_GR_T_z = (
    ('αλεξανδριν', 8), ('αγνωστικ', 1), ('βυζαντιν', 9), ('εκλεκτικ', 5),
    ('γνωστικ', 3), ('θεατριν', 10), ('σκεπτικ', 6), ('ατομικ', 2),
    ('εθνικ', 4), ('τοπικ', 7),
)
_GR_T_Uh = (
    ('ουδακια', 1), ('αρακια', 1), ('ουδακι', 1), ('αρακι', 1),
)
_GR_T_Ua = (
    ('σ', 1), ('χ', 1),
)
_GR_T_Ue = (
    ('αρακια', 1), ('αρακι', 1), ('ιτσασ', 1), ('ιτσεσ', 1),
    ('ιτσων', 1), ('ακια', 1), ('ιτσα', 1), ('ακι', 1),
)
_GR_T_Ug = (
    ('τσεχοσλοβ', 1), ('ηγουμεν', 2), ('κατραπ', 1), ('μακρυν', 2),
    ('ναγκασ', 1), ('τριπολ', 2), ('αλισφ', 1), ('καπακ', 1),
    ('μουστ', 1), ('πατερ', 2), ('αμβρ', 1), ('ανθρ', 1), ('βαμβ', 1),
    ('γιαν', 2), ('καιμ', 1), ('καρδ', 2), ('κλιμ', 1), ('λαβρ', 1),
    ('λουλ', 1), ('σλοβ', 1), ('σπαν', 1), ('φαρμ', 1), ('βαλ', 2),
    ('κον', 1), ('κορ', 1), ('μαλ', 1), ('μερ', 1), ('νυφ', 2),
    ('σοκ', 1), ('τοσ', 2), ('φυλ', 1), ('βρ', 1), ('γλ', 2), ('πλ', 1),
    ('ρυ', 1), ('σκ', 1), ('σφ', 1), ('τζ', 1), ('β', 2), ('ζ', 2),
    ('κ', 1), ('π', 2), ('ρ', 1), ('σ', 1), ('φ', 1), ('χ', 1),
)
_GR_T_Un = (
    ('ιδιων', 1), ('ιδια', 1), ('ιδιο', 1),
)
_GR_T_x = (
    ('αιφν', 1), ('ολο', 1), ('ψαλ', 1), ('ιρ', 1),
)
_GR_T_Uo = (
    ('παιχν', 1), ('ε', 1),
)
_GR_T_Up = (
    ('ισκοσ', 1), ('ισκου', 1), ('ισκε', 1), ('ισκο', 1),
)
_GR_T_Um = (
    ('φραγκ', 1), ('οβελ', 1), ('λυκ', 1), ('μην', 1), ('ιβ', 1),
    ('δ', 1), ('ρ', 1),
)
_GR_T_Uq = (
    ('αδεσ', 1), ('αδων', 1),
)
_GR_T_Ut = (
    ('γιαγι', -1), ('μπαμπ', -1), ('νταντ', -1), ('πατερ', -1),
    ('πεθερ', -1), ('θει', -1), ('κυρ', -1), ('μαμ', -1), ('μαν', -1),
    ('οκ', -1),
)
_GR_T_Uu = (
    ('εδεσ', 1), ('εδων', 1),
)
_GR_T_Ur = (
    ('κρασπ', 1), ('γηπ', 1), ('δαπ', 1), ('εμπ', 1), ('μιλ', 1),
    ('ιπ', 1), ('οπ', 1), ('υπ', 1),
)
_GR_T_Us = (
    ('ουδεσ', 1), ('ουδων', 1),
)
_GR_T_Uv = (
    ('καλιακ', 1), ('πεταλ', 1), ('λουλ', 1), ('πλεξ', 1), ('τραγ', 1),
    ('αρκ', 1), ('βελ', 1), ('λιχ', 1), ('σκ', 1), ('σπ', 1), ('φε', 1),
    ('φλ', 1), ('φρ', 1), ('χν', 1), ('σ', 1),
)
_GR_T_Ui = (
    ('εων', 1), ('εωσ', 1),
)
_GR_T_Ud = (
    ('γαλ', 1), ('παρ', 1), ('ελ', 1), ('ιδ', 1), ('δ', 1), ('θ', 1),
    ('ν', 1), ('π', 1),
)
_GR_T_Ul = (
    ('ιου', 1), ('ιων', 1), ('ια', 1),
)
_GR_T_Uj = (
    ('ικου', 1), ('ικων', 1), ('ικα', 1), ('ικο', 1),
)
_GR_T_Uk = (
    ('αμμοχαλ', 1), ('μπαγιατ', 1), ('ποστελν', 1), ('συνομηλ', 1),
    ('καλλιν', 1), ('πικαντ', 1), ('πλιατσ', 1), ('πρωτοδ', 1),
    ('αντιδ', 1), ('καταδ', 1), ('συναδ', 1), ('φιλον', 1), ('φυλοδ', 1),
    ('αμαν', 1), ('ανηθ', 1), ('βρωμ', 1), ('εξωδ', 1), ('καλπ', 1),
    ('μουλ', 1), ('μπαν', 1), ('μπολ', 1), ('μποσ', 1), ('πετσ', 1),
    ('πιτσ', 1), ('σερτ', 1), ('τσαμ', 1), ('υποδ', 1), ('γερ', 1),
    ('ενδ', 1), ('νιτ', 1), ('ξικ', 1), ('φυσ', 1), ('χασ', 1),
    ('αδ', 1), ('αλ', 1), ('ηθ', 1),
)
_GR_T_DS = (
    ('ηθηκαμε', 1), ('ουσαμε', 1), ('αγαμε', 1), ('ηκαμε', 1),
    ('ησαμε', 1),
)
_GR_T_aa = (
    ('αποστ', 1), ('αναπ', 1), ('αποθ', 1), ('αποκ', 1), ('βουβ', 1),
    ('πικρ', 1), ('ξεθ', 1), ('ουλ', 1), ('πεθ', 1), ('ποτ', 1),
    ('σιχ', 1), ('χ', 1),
)
_GR_T_ca = (
    ('ιουντανε', 1), ('ηθηκανε', 1), ('ιοντανε', 1), ('ουντανε', 1),
    ('ιοτανε', 1), ('οντανε', 1), ('ουσανε', 1), ('αγανε', 1),
    ('ηκανε', 1), ('ησανε', 1), ('οτανε', 1),
)
_GR_T_ba = (
    ('τρ', 1), ('τσ', 1),
)
_GR_T_Uf = (
    ('καπνοβιομηχ', 1), ('μεγλοβιομηχ', 1), ('μικροβιομηχ', 1),
    ('χαμηλοδαπ', 1), ('αμερικαν', 1), ('μουσουλμ', 1), ('ξηροκλιβ', 1),
    ('ολιγοδαμ', 1), ('σαρακατσ', 1), ('φωτοστεφ', 1), ('βαθυγαλ', 1),
    ('δραδουμ', 1), ('καλπουζ', 1), ('καταγαλ', 1), ('κοιλαρφ', 1),
    ('πενταρφ', 1), ('πολυδαπ', 1), ('πολυμηχ', 1), ('τσαρλατ', 1),
    ('ψηλοταβ', 1), ('ατσιγγ', 1), ('βιομηχ', 1), ('βραχυκ', 1),
    ('καστελ', 1), ('κορμορ', 1), ('λουθηρ', 1), ('μωαμεθ', 1),
    ('ολογαλ', 1), ('περιτρ', 1), ('πορτολ', 1), ('πουριτ', 1),
    ('υπερηφ', 1), ('υποκοπ', 1), ('ψυχοπλ', 1), ('αθιγγ', 1),
    ('ανοργ', 1), ('βετερ', 1), ('βουλκ', 1), ('βραχμ', 1), ('ενοργ', 1),
    ('λαοπλ', 1), ('μαιντ', 1), ('πελεκ', 1), ('περηφ', 1), ('πολισ', 1),
    ('σουλτ', 1), ('τσιγγ', 1), ('αδαπ', 1), ('αμηχ', 1), ('ανικ', 1),
    ('απηγ', 1), ('απιθ', 1), ('βασκ', 1), ('διατ', 1), ('διαφ', 1),
    ('διπλ', 1), ('ζωντ', 1), ('καστ', 1), ('κλιβ', 1), ('νταβ', 1),
    ('πλατ', 1), ('στεγ', 1), ('στεφ', 1), ('τραγ', 1), ('τσαγ', 1),
    ('τσοπ', 1), ('βασ', 1), ('γαλ', 1), ('γερ', 1), ('δεκ', 1),
    ('θυσ', 1), ('κοπ', 1), ('λιβ', 1), ('λιχ', 1), ('μελ', 1),
    ('ορφ', 1), ('ουλ', 1), ('ουρ', 1), ('πιθ', 1), ('σιγ', 1),
    ('ταβ', 1), ('τετ', 1), ('αγ', 1), ('ερ', 1), ('ικ', 1), ('πλ', 1),
    ('σπ', 1), ('γ', 1), ('θ', 1), ('μ', 1), ('ν', 1), ('π', 1),
    ('σ', 1), ('φ', 1), ('χ', 1),
)
_GR_T_Uw = (
    ('ησετε', 1),
)
_GR_T_da = (
    ('υπερθ', 1), ('διαθ', 1), ('συνδ', 1), ('συνθ', 1), ('ωφελ', 1),
    ('αιν', 1), ('αιρ', 1), ('αρκ', 1), ('βαρ', 1), ('βολ', 1),
    ('εκθ', 1), ('ενδ', 1), ('ενθ', 1), ('ευθ', 1), ('ευρ', 1),
    ('καθ', 1), ('νετ', 1), ('πον', 1), ('πυρ', 1), ('ραθ', 1),
    ('ροθ', 1), ('ρον', 1), ('συν', 1), ('ταθ', 1), ('τιθ', 1),
    ('φορ', 1), ('χωρ', 1), ('βρ', 1), ('οδ', 1), ('σθ', 1), ('σχ', 1),
)
_GR_T_ea = (
    ('παρακαλ', 1), ('βαρον', 1), ('αβαρ', 1), ('εναρ', 1), ('θαρρ', 1),
    ('μπορ', 1), ('σερπ', 1), ('σκελ', 1), ('συρφ', 1), ('αβρ', 1),
    ('απλ', 1), ('βεν', 1), ('κοπ', 1), ('νιφ', 1), ('ντρ', 1),
    ('παγ', 1), ('τοκ', 1), ('αδ', 1), ('αθ', 1), ('αν', 1), ('εμ', 1),
    ('σκ', 1), ('δ', 1), ('θ', 1), ('υ', 1),
)
_GR_T_fa = (
    ('οντασ', 1), ('ωντασ', 1),
)
_GR_T_ga = (
    ('ιομαστε', 1), ('ομαστε', 1),
)
_GR_T_Uy = (
    ('αμεταμφ', 1), ('ακαταπ', 1), ('ασυμπ', 1), ('συμπ', 1), ('απ', 1),
    ('π', 1),
)
_GR_T_Uz = (
    ('παρακαλ', 1), ('εκτελ', 1), ('νισ', 1), ('προ', 1), ('αλ', 1),
    ('αρ', 1), ('ζ', 1), ('μ', 1), ('ξ', 1),
)
_GR_T_Ux = (
    ('ηθηκεσ', 1), ('ηθηκα', 1), ('ηθηκε', 1),
)
_GR_T_la = (
    ('ηκεσ', 1), ('ηκα', 1), ('ηκε', 1),
)
_GR_T_ja = (
    ('σκουλ', 1), ('ναρθ', 1), ('σκωλ', 1), ('πιθ', 1), ('οθ', 1),
    ('σφ', 1),
)
_GR_T_ka = (
    ('παρακαταθ', 1), ('προσθ', 1), ('διαθ', 1), ('συνθ', 1), ('θ', 1),
)
_GR_T_oa = (
    ('ουσεσ', 1), ('ουσα', 1), ('ουσε', 1),
)
_GR_T_ma = (
    ('μαντιλ', 1), ('πανταχ', 1), ('κυματ', 1), ('ποδαρ', 1),
    ('βλεπ', 1), ('μαλλ', 1), ('πρωτ', 1), ('φρυδ', 1), ('λαχ', 1),
    ('ληγ', 1), ('φαγ', 1), ('ομ', 1),
)
_GR_T_na = (
    ('δευτερευ', 1), ('ενδιαφερ', 1), ('καθαρευ', 1), ('υποτειν', 1),
    ('δεσποζ', 1), ('λαμπιδ', 1), ('φαρμακ', 1), ('αναρρ', 1),
    ('εκλιπ', 1), ('μεσαζ', 1), ('ανηκ', 1), ('βρομ', 1), ('αγκ', 1),
    ('αιθ', 1), ('λεχ', 1), ('μεδ', 1), ('πατ', 1), ('πλε', 1),
    ('τσα', 1), ('χαδ', 1), ('αμ', 1), ('δε', 1), ('λ', 1), ('μ', 1),
    ('ρ', 1),
)
_GR_T_sa = (
    ('ησου', 1), ('ησα', 1), ('ησε', 1),
)
_GR_T_ta = (
    ('δωδεκαν', 1), ('μεγαλον', 1), ('ερημον', 1), ('χερσον', 1),
    ('επταν', 1), ('ν', 1),
)
_GR_T_ra = (
    ('αγεσ', 1), ('αγα', 1), ('αγε', 1),
)
_GR_T_pa = (
    ('ναυλοχ', -1), ('σμην', 1), ('χορτ', 1), ('λοχ', 1), ('πελ', 1),
    ('ψοφ', -1), ('λλ', 1), ('οφ', 1), ('πρ', 1), ('ρπ', 1), ('σφ', 1),
    ('φρ', 1),
)
_GR_T_qa = (
    ('κροκαλοπ', 1), ('προσωποπ', 1), ('σιδηροπ', 1), ('αιμοστ', 1),
    ('αμαλλι', 1), ('δερβεν', 1), ('δροσοπ', 1), ('αβαστ', 1),
    ('ανυστ', 1), ('αρτιπ', 1), ('ασπαρ', 1), ('νομοτ', 1), ('ουλαμ', 1),
    ('πολυφ', 1), ('προστ', 1), ('αδηφ', 1), ('αειπ', 1), ('αμαλ', 1),
    ('ανυπ', 1), ('απερ', 1), ('αποτ', 1), ('αχαρ', 1), ('διατ', 1),
    ('επιτ', 1), ('νεοπ', 1), ('ολοπ', 1), ('ομοτ', 1), ('παμφ', 1),
    ('συμπ', 1), ('συντ', 1), ('υποτ', 1), ('ασπ', 1), ('ναυ', 1),
    ('ξεφ', 1), ('ουρ', 1), ('χαρ', 1), ('αφ', 1), ('εν', 1), ('τρ', 1),
    ('λ', 1), ('μ', 1), ('π', 1), ('ρ', 1), ('τ', 1),
)
_GR_T_ua = (
    ('ηστε', 1),
)
_GR_T_va = (
    ('κοινοχρ', 1), ('παλιμψ', 1), ('αειμν', 1), ('δυσχρ', 1),
    ('ευχρ', 1), ('απλ', 1), ('ασβ', 1), ('αχρ', 1), ('σβ', 1),
    ('χρ', 1),
)
_GR_T_wa = (
    ('ηθουνε', 1), ('ησουνε', 1), ('ουνε', 1),
)
_GR_T_xa = (
    ('στραβομουτσ', 1), ('κακομουτσ', 1), ('εξων', 1), ('σπι', 1),
    ('ν', 1), ('ρ', 1),
)
_GR_T_ya = (
    ('ηθουμε', 1), ('ησουμε', 1), ('ουμε', 1),
)
_GR_T_za = (
    ('αλλοσουσ', 1), ('παρασουσ', 1), ('ωριοπλ', 1), ('ασουσ', 1),
    ('αζ', 1), ('φ', 1), ('χ', 1),
)
_GR_T_Uaa = (
    ('ματοσ', 1), ('ματων', 1), ('ματα', 1),
)
_GR_T_Uba = (
    ('ιοντουσαν', 1), ('ιομασταν', 1), ('ιοσασταν', 1), ('ιουμαστε', 1),
    ('οντουσαν', 1), ('ηθηκατε', 1), ('ιεμαστε', 1), ('ιεσαστε', 1),
    ('ιομουνα', 1), ('ιοσαστε', 1), ('ιοσουνα', 1), ('ιουνται', 1),
    ('ιουνταν', 1), ('ομασταν', 1), ('οσασταν', 1), ('ουμαστε', 1),
    ('ηθειτε', 1), ('ηθηκαν', 1), ('ιομουν', 1), ('ιονταν', 1),
    ('ιοσουν', 1), ('ομουνα', 1), ('οσαστε', 1), ('οσουνα', 1),
    ('ουνται', 1), ('ουνταν', 1), ('ουσατε', 1), ('αγατε', 1),
    ('ηθεισ', 1), ('ηθουν', 1), ('ηκατε', 1), ('ησατε', 1), ('ησουν', 1),
    ('ιεμαι', 1), ('ιεσαι', 1), ('ιεται', 1), ('ιοταν', 1), ('ιουμα', 1),
    ('ομουν', 1), ('ονται', 1), ('ονταν', 1), ('οσουν', 1), ('ουμαι', 1),
    ('ουσαν', 1), ('αγαν', 1), ('αμαι', 1), ('ασαι', 1), ('αται', 1),
    ('ειτε', 1), ('εσαι', 1), ('εται', 1), ('ηδεσ', 1), ('ηδων', 1),
    ('ηθει', 1), ('ηκαν', 1), ('ησαν', 1), ('ησει', 1), ('ησεσ', 1),
    ('ομαι', 1), ('οταν', 1), ('αει', 1), ('εισ', 1), ('ηθω', 1),
    ('ησω', 1), ('ουν', 1), ('ουσ', 1), ('αν', 1), ('ασ', 1), ('αω', 1),
    ('ει', 1), ('εσ', 1), ('ησ', 1), ('οι', 1), ('οσ', 1), ('ου', 1),
    ('υσ', 1), ('ων', 1), ('α', 1), ('ε', 1), ('η', 1), ('ι', 1),
    ('ο', 1), ('υ', 1), ('ω', 1),
)
_GR_T_Uca = (
    ('εστατ', 1), ('εστερ', 1), ('οτατ', 1), ('οτερ', 1), ('υτατ', 1),
    ('υτερ', 1), ('ωτατ', 1), ('ωτερ', 1),
)


class _GrS:
    """Snowball backward-mode state: cursor/bra/ket with reference-exact
    slice guards (a failed guard aborts the enclosing step)."""
    __slots__ = ("j", "cursor", "a", "f", "c", "d", "B")

    def __init__(self, w):
        self.j = w
        self.a = len(w)
        self.cursor = len(w)
        self.f = 0
        self.c = 0
        self.d = len(w)
        self.B = True

    def g(self, s):                       # eq_s_b
        if self.cursor - self.f < len(s) \
                or self.j[self.cursor - len(s):self.cursor] != s:
            return False
        self.cursor -= len(s)
        return True

    def h(self, table):                   # find_among_b (longest-first)
        for s, res in table:
            if self.cursor - self.f >= len(s) \
                    and self.j[self.cursor - len(s):self.cursor] == s:
                self.cursor -= len(s)
                return res
        return 0

    def n(self, chars):                   # in_grouping_b
        if self.cursor <= self.f or self.j[self.cursor - 1] not in chars:
            return False
        self.cursor -= 1
        return True

    def _ok(self):
        return 0 <= self.c <= self.d <= self.a

    def _slice(self, k, l, s):
        delta = len(s) - (l - k)
        self.j = self.j[:k] + s + self.j[l:]
        self.a += delta
        if self.cursor >= l:
            self.cursor += delta
        elif self.cursor > k:
            self.cursor = k
        return delta

    def b(self, s):                       # slice_from
        if not self._ok():
            return False
        self._slice(self.c, self.d, s)
        return True

    def e(self):                          # slice_del
        return self.b("")

    def insert(self, s):
        delta = self._slice(self.cursor, self.cursor, s)
        if self.cursor - delta <= self.c:
            self.c += delta
        if self.cursor - delta <= self.d:
            self.d += delta

    def save(self):
        return self.a - self.cursor

    def restore(self, v):
        self.cursor = self.a - v

    def whole(self):
        return self.cursor <= self.f


def _gr_simple_step(st, main, exc, rep):
    """[among(main)] delete, unset B; ([] among(exc) atlimit <+ rep)."""
    v = st.save()
    st.d = st.cursor
    if st.h(main) != 0:
        st.c = st.cursor
        if st.e():
            st.B = False
            st.d = st.cursor
            st.c = st.cursor
            if st.h(exc) != 0 and st.whole():
                st.b(rep)
    st.restore(v)


def _gr_step5b(st):
    v0 = st.save()
    st.d = st.cursor
    if st.h(_GR_T_ca) != 0:
        st.c = st.cursor
        if not st.e():
            return
        st.B = False
        st.d = st.cursor
        st.c = st.cursor
        if st.h(_GR_T_ba) != 0 and st.whole():
            if not st.b("αγαν"):
                return
    st.restore(v0)
    st.d = st.cursor
    if st.g("ανε"):
        st.c = st.cursor
        if not st.e():
            return
        st.B = False
        v = st.save()
        st.d = st.cursor
        st.c = st.cursor
        if st.n("αεηιοω"):
            if not st.b("αν"):
                return
            return
        st.restore(v)
        st.d = st.cursor
        st.c = st.cursor
        if st.h(_GR_T_Uf) != 0 and st.whole():
            st.b("αν")


def _gr_step5d(st):
    v0 = st.save()
    st.d = st.cursor
    if st.h(_GR_T_Uw) != 0:
        st.c = st.cursor
        if not st.e():
            return
        st.B = False
    st.restore(v0)
    st.d = st.cursor
    if st.g("ετε"):
        st.c = st.cursor
        if not st.e():
            return
        st.B = False
        v = st.save()
        st.d = st.cursor
        st.c = st.cursor
        if st.n("αεηιοω"):
            if not st.b("ετ"):
                return
            return
        st.restore(v)
        st.d = st.cursor
        st.c = st.cursor
        if st.h(_GR_T_da) != 0:
            if not st.b("ετ"):
                return
            return
        st.restore(v)
        st.d = st.cursor
        st.c = st.cursor
        if st.h(_GR_T_ea) != 0 and st.whole():
            st.b("ετ")


def greek_stem(word: str) -> str:  # noqa: C901 — mirrors the spec's steps
    w = "".join(_GR_LOWER.get(ch, ch) for ch in word)
    if len(w) < 3:
        return w
    st = _GrS(w)

    # step 1: irregular stems
    st.d = st.cursor
    r = st.h(_GR_T_n)
    if r != 0:
        st.c = st.cursor
        if st.b(_GR_STEP1_REP[r]):
            st.B = False
    st.cursor = st.a

    # steps S1-S10
    v = st.save()
    st.d = st.cursor
    r = 0
    if st.h(_GR_T_b) != 0:
        st.c = st.cursor
        if st.e():
            st.B = False
            st.d = st.cursor
            st.c = st.cursor
            r = st.h(_GR_T_v)
            if r != 0 and st.whole():
                st.b("ι" if r == 1 else "ιζ")
    st.restore(v)
    _gr_simple_step(st, _GR_T_q, _GR_T_f, "ων")
    # S3 with the dead 'ισα' branch
    v = st.save()
    st.d = st.cursor
    if st.h(_GR_T_s) != 0:
        st.c = st.cursor
        if st.e():
            st.B = False
            v2 = st.save()
            skipped = False
            if st.g("ισα") and st.whole():
                st.b("ισ")      # stale bracket: fails, skipping exceptions
                skipped = True
            if not skipped:
                st.restore(v2)
                st.d = st.cursor
                st.c = st.cursor
                r = st.h(_GR_T_t)
                if r != 0 and st.whole():
                    st.b("ι" if r == 1 else "ισ")
    st.restore(v)
    _gr_simple_step(st, _GR_T_m, _GR_T_r, "ι")
    v = st.save()
    st.d = st.cursor
    if st.h(_GR_T_u) != 0:
        st.c = st.cursor
        if st.e():
            st.B = False
            st.d = st.cursor
            st.c = st.cursor
            r = st.h(_GR_T_w)
            if r != 0 and st.whole():
                st.b("ι" if r == 1 else "ιστ")
    st.restore(v)
    # S6: -ισμ-
    v = st.save()
    st.d = st.cursor
    if st.h(_GR_T_e) != 0:
        st.c = st.cursor
        if st.e():
            st.B = False
            v2 = st.save()
            st.d = st.cursor
            st.c = st.cursor
            r = st.h(_GR_T_y)
            done = False
            ok = True
            if r != 0 and st.whole():
                ok = st.b("ισμ" if r == 1 else "ι")
                done = True
            if ok and not done:
                st.restore(v2)
                st.d = st.cursor
                r = st.h(_GR_T_z)
                if r != 0:
                    st.c = st.cursor
                    st.b(_GR_Z_REP[r])
    st.restore(v)
    _gr_simple_step(st, _GR_T_Uh, _GR_T_Ua, "αρακ")
    # S8: -ακι-/-ιτσ-
    v = st.save()
    st.d = st.cursor
    if st.h(_GR_T_Ue) != 0:
        st.c = st.cursor
        if st.e():
            st.B = False
            v2 = st.save()
            st.d = st.cursor
            st.c = st.cursor
            r = st.h(_GR_T_Ug)
            done = False
            ok = True
            if r != 0 and st.whole():
                ok = st.b("ακ" if r == 1 else "ιτσ")
                done = True
            if ok and not done:
                st.restore(v2)
                st.d = st.cursor
                st.c = st.cursor
                if st.g("κορ"):
                    st.b("ιτσ")
    st.restore(v)
    # S9: -ιδ-
    v = st.save()
    st.d = st.cursor
    if st.h(_GR_T_Un) != 0:
        st.c = st.cursor
        if st.e():
            st.B = False
            v2 = st.save()
            st.d = st.cursor
            st.c = st.cursor
            done = False
            ok = True
            if st.h(_GR_T_x) != 0 and st.whole():
                ok = st.b("ιδ")
                done = True
            if ok and not done:
                st.restore(v2)
                st.d = st.cursor
                st.c = st.cursor
                if st.h(_GR_T_Uo) != 0:
                    st.b("ιδ")
    st.restore(v)
    _gr_simple_step(st, _GR_T_Up, _GR_T_Um, "ισκ")

    # step 2a: -αδ-
    v = st.save()
    st.d = st.cursor
    if st.h(_GR_T_Uq) != 0:
        st.c = st.cursor
        if st.e():
            v2 = st.save()
            if st.h(_GR_T_Ut) == 0:
                st.restore(v2)
                st.insert("αδ")
    st.restore(v)
    # step 2b: -εδ-
    v = st.save()
    st.d = st.cursor
    if st.h(_GR_T_Uu) != 0:
        st.c = st.cursor
        if st.e():
            st.d = st.cursor
            st.c = st.cursor
            if st.h(_GR_T_Ur) != 0:
                st.b("εδ")
    st.restore(v)
    # step 2c: -ουδ-
    v = st.save()
    st.d = st.cursor
    if st.h(_GR_T_Us) != 0:
        st.c = st.cursor
        if st.e():
            st.d = st.cursor
            st.c = st.cursor
            if st.h(_GR_T_Uv) != 0:
                st.b("ουδ")
    st.restore(v)
    # step 2d: -ε-
    _gr_simple_step(st, _GR_T_Ui, _GR_T_Ud, "ε")
    # step 3: -ι- after vowel
    v = st.save()
    st.d = st.cursor
    if st.h(_GR_T_Ul) != 0:
        st.c = st.cursor
        if st.e():
            st.B = False
            st.d = st.cursor
            st.c = st.cursor
            if st.n(_GR_VOWELS):
                st.b("ι")
    st.restore(v)
    # step 4: -ικ-
    v = st.save()
    st.d = st.cursor
    if st.h(_GR_T_Uj) != 0:
        st.c = st.cursor
        if st.e():
            st.B = False
            v2 = st.save()
            st.d = st.cursor
            st.c = st.cursor
            done = False
            ok = True
            if st.n(_GR_VOWELS):
                ok = st.b("ικ")
                done = True
            if ok and not done:
                st.restore(v2)
                st.d = st.cursor
                st.c = st.cursor
                if st.h(_GR_T_Uk) != 0 and st.whole():
                    st.b("ικ")
    st.restore(v)
    # step 5a: -αμ-
    v = st.save()
    while True:
        v2 = st.save()
        if st.g("αγαμε") and st.whole():
            if not st.b("αγαμ"):
                break           # stale-bracket skip of the whole step
        st.restore(v2)
        v2 = st.save()
        st.d = st.cursor
        if st.h(_GR_T_DS) != 0:
            st.c = st.cursor
            if not st.e():
                break
            st.B = False
        st.restore(v2)
        st.d = st.cursor
        if st.g("αμε"):
            st.c = st.cursor
            if st.e():
                st.B = False
                st.d = st.cursor
                st.c = st.cursor
                if st.h(_GR_T_aa) != 0 and st.whole():
                    st.b("αμ")
        break
    st.restore(v)
    # step 5b: -αν-
    v = st.save()
    _gr_step5b(st)
    st.restore(v)
    # step 5d: -ετ-
    v = st.save()
    _gr_step5d(st)
    st.restore(v)
    # step 5e: -οντ-
    v = st.save()
    st.d = st.cursor
    if st.h(_GR_T_fa) != 0:
        st.c = st.cursor
        if st.e():
            st.B = False
            v2 = st.save()
            st.d = st.cursor
            st.c = st.cursor
            done = False
            ok = True
            if st.g("αρχ") and st.whole():
                ok = st.b("οντ")
                done = True
            if ok and not done:
                st.restore(v2)
                st.d = st.cursor
                st.c = st.cursor
                if st.g("κρε"):
                    st.b("ωντ")
    st.restore(v)
    # step 5f: -ομαστ-
    v = st.save()
    st.d = st.cursor
    if st.h(_GR_T_ga) != 0:
        st.c = st.cursor
        if st.e():
            st.B = False
            st.d = st.cursor
            st.c = st.cursor
            if st.g("ον") and st.whole():
                st.b("ομαστ")
    st.restore(v)
    # step 5g: -ιεστ- / -εστ-
    v = st.save()
    while True:
        v2 = st.save()
        st.d = st.cursor
        if st.g("ιεστε"):
            st.c = st.cursor
            if not st.e():
                break
            st.B = False
            st.d = st.cursor
            st.c = st.cursor
            if st.h(_GR_T_Uy) != 0 and st.whole():
                if not st.b("ιεστ"):
                    break
        st.restore(v2)
        st.d = st.cursor
        if st.g("εστε"):
            st.c = st.cursor
            if st.e():
                st.B = False
                st.d = st.cursor
                st.c = st.cursor
                if st.h(_GR_T_Uz) != 0 and st.whole():
                    st.b("ιεστ")
        break
    st.restore(v)
    # step 6a: -ηθηκ- / -ηκ-
    v = st.save()
    while True:
        v2 = st.save()
        st.d = st.cursor
        if st.h(_GR_T_Ux) != 0:
            st.c = st.cursor
            if not st.e():
                break
            st.B = False
        st.restore(v2)
        st.d = st.cursor
        if st.h(_GR_T_la) != 0:
            st.c = st.cursor
            if st.e():
                st.B = False
                v3 = st.save()
                st.d = st.cursor
                st.c = st.cursor
                done = False
                ok = True
                if st.h(_GR_T_ja) != 0:
                    ok = st.b("ηκ")
                    done = True
                if ok and not done:
                    st.restore(v3)
                    st.d = st.cursor
                    st.c = st.cursor
                    if st.h(_GR_T_ka) != 0 and st.whole():
                        st.b("ηκ")
        break
    st.restore(v)
    # step 6b: -ουσ-
    v = st.save()
    st.d = st.cursor
    if st.h(_GR_T_oa) != 0:
        st.c = st.cursor
        if st.e():
            st.B = False
            v2 = st.save()
            st.d = st.cursor
            st.c = st.cursor
            done = False
            ok = True
            if st.h(_GR_T_ma) != 0:
                ok = st.b("ουσ")
                done = True
            if ok and not done:
                st.restore(v2)
                st.d = st.cursor
                st.c = st.cursor
                if st.h(_GR_T_na) != 0 and st.whole():
                    st.b("ουσ")
    st.restore(v)
    # step 6c: -ησ-
    _gr_simple_step(st, _GR_T_sa, _GR_T_ta, "ησ")
    # step 6d: -αγ-
    v = st.save()
    st.d = st.cursor
    if st.h(_GR_T_ra) != 0:
        st.c = st.cursor
        if st.e():
            st.B = False
            v2 = st.save()
            st.d = st.cursor
            st.c = st.cursor
            done = False
            ok = True
            if st.g("κολλ"):
                ok = st.b("αγ")
                done = True
            if ok and not done:
                st.restore(v2)
                v3 = st.save()
                st.d = st.cursor
                st.c = st.cursor
                r = st.h(_GR_T_pa)
                if r != 0:
                    if r == 1:
                        st.b("αγ")
                else:
                    st.restore(v3)
                    st.d = st.cursor
                    st.c = st.cursor
                    if st.h(_GR_T_qa) != 0 and st.whole():
                        st.b("αγ")
    st.restore(v)
    # step 6e/6f/6g
    _gr_simple_step(st, _GR_T_ua, _GR_T_va, "ηστ")
    _gr_simple_step(st, _GR_T_wa, _GR_T_xa, "ουν")
    _gr_simple_step(st, _GR_T_ya, _GR_T_za, "ουμ")
    # step 7: -μα- and long endings
    v = st.save()
    while True:
        v2 = st.save()
        st.d = st.cursor
        if st.h(_GR_T_Uaa) != 0:
            st.c = st.cursor
            if not st.b("μα"):
                break
        st.restore(v2)
        if st.B:
            st.d = st.cursor
            if st.h(_GR_T_Uba) != 0:
                st.c = st.cursor
                st.e()
        break
    st.restore(v)
    # step 8: comparatives/superlatives
    st.d = st.cursor
    if st.h(_GR_T_Uca) != 0:
        st.c = st.cursor
        st.e()
    return st.j


SNOWBALL.update({"gr": greek_stem, "el": greek_stem, "greek": greek_stem})
