"""Pure-Python Snowball stemmers: de/fr/es/pt/it/sv/no/da/nl/ru (SURVEY T11).

Implemented from the published Snowball algorithm descriptions
(snowballstem.org/algorithms/*/stemmer.html) — NOT
translated from the reference's generated JS (src/lib/stemmers/{de,fr,es}.js,
which is machine-compiled Snowball). Behavior is pinned against golden
vectors produced by executing the reference's stemmers on wide word lists
(tests/golden/stem_*.json), so index-time stemming here agrees with the
reference engine's output for these languages.

Like the English Porter stemmer (analysis/stemmer.py), these run inside
Arrow-batched pandas UDFs with a per-batch memo cache — pure string work,
vectorized per batch, never row-at-a-time.
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# shared region helpers (standard Snowball R1/R2/RV definitions)
# ---------------------------------------------------------------------------


def _r_std(word: str, vowels: str, start: int = 0) -> int:
    """Standard region start: position after the first non-vowel that
    follows a vowel, scanning from ``start``; len(word) if none."""
    n = len(word)
    i = start
    while i < n and word[i] not in vowels:
        i += 1
    while i < n and word[i] in vowels:
        i += 1
    return min(i + 1, n) if i < n else n


def _r1_r2(word: str, vowels: str) -> tuple:
    r1 = _r_std(word, vowels)
    r2 = _r_std(word, vowels, r1)
    return r1, r2



def _longest_in(w: str, sufs: list, limit: int) -> str | None:
    """Longest suffix of ``w`` (from ``sufs``, pre-sorted longest-first)
    whose start position is >= ``limit`` — Snowball's ``setlimit tomark pV
    for ([substring] among(...))``: the match itself is confined to the
    region, so a shorter in-region suffix beats a longer out-of-region one."""
    for suf in sufs:
        if w.endswith(suf) and len(w) - len(suf) >= limit:
            return suf
    return None


# ---------------------------------------------------------------------------
# German
# ---------------------------------------------------------------------------

_DE_VOWELS = "aeiouyäöü"
_DE_S_END = "bdfghklmnrt"
_DE_ST_END = "bdfghklmnt"


def _de_prelude(w: str) -> str:
    w = w.replace("ß", "ss")
    out = list(w)
    for i in range(1, len(out) - 1):
        if out[i] in "uy" and out[i - 1] in _DE_VOWELS \
                and out[i + 1] in _DE_VOWELS:
            out[i] = out[i].upper()
    return "".join(out)


def german_stem(word: str) -> str:
    """Snowball German stemmer."""
    w = _de_prelude(word.lower())
    r1, r2 = _r1_r2(w, _DE_VOWELS)
    r1 = max(r1, min(3, len(w)))  # region before R1 must hold >= 3 letters

    def in_r1(pos: int) -> bool:
        return pos >= r1

    def in_r2(pos: int) -> bool:
        return pos >= r2

    # step 1: longest of (a) em ern er, (b) e en es, (c) s (valid s-ending)
    for suf in ("ern", "em", "er", "en", "es", "e", "s"):
        if w.endswith(suf):
            pos = len(w) - len(suf)
            if suf in ("ern", "em", "er"):
                if in_r1(pos):
                    w = w[:pos]
            elif suf in ("e", "en", "es"):
                if in_r1(pos):
                    w = w[:pos]
                    if w.endswith("niss"):
                        w = w[:-1]
            else:  # s
                if in_r1(pos) and pos > 0 and w[pos - 1] in _DE_S_END:
                    w = w[:pos]
            break

    # step 2: longest of en er est | st (valid st-ending, >=3 letters before)
    for suf in ("est", "en", "er", "st"):
        if w.endswith(suf):
            pos = len(w) - len(suf)
            if suf == "st":
                if in_r1(pos) and pos > 3 and w[pos - 1] in _DE_ST_END:
                    w = w[:pos]
            else:
                if in_r1(pos):
                    w = w[:pos]
            break

    # step 3: d-suffixes
    for suf in ("isch", "lich", "heit", "keit", "end", "ung", "ig", "ik"):
        if w.endswith(suf):
            pos = len(w) - len(suf)
            if suf in ("end", "ung"):
                if in_r2(pos):
                    w = w[:pos]
                    if w.endswith("ig") and in_r2(len(w) - 2) \
                            and not w.endswith("eig"):
                        w = w[:-2]
            elif suf in ("ig", "ik", "isch"):
                if in_r2(pos) and not (pos > 0 and w[pos - 1] == "e"):
                    w = w[:pos]
            elif suf in ("lich", "heit"):
                if in_r2(pos):
                    w = w[:pos]
                    for pre in ("er", "en"):
                        if w.endswith(pre) and in_r1(len(w) - 2):
                            w = w[:-2]
                            break
            else:  # keit
                if in_r2(pos):
                    w = w[:pos]
                    for pre in ("lich", "ig"):
                        if w.endswith(pre) and in_r2(len(w) - len(pre)):
                            w = w[:-len(pre)]
                            break
            break

    # postlude: unmark U/Y, strip umlauts
    tbl = str.maketrans({"U": "u", "Y": "y", "ä": "a", "ö": "o", "ü": "u"})
    return w.translate(tbl)


# ---------------------------------------------------------------------------
# French
# ---------------------------------------------------------------------------

_FR_VOWELS = "aeiouyâàëéêèïîôûù"


def _fr_prelude(w: str) -> str:
    """Mark u/i between vowels and y next to a vowel as consonants (U/I/Y),
    u after q as U, and replace ë → He, ï → Hi (the revised-algorithm
    diaeresis marking; H is a consonant, restored in the postlude).

    Left-to-right single pass: the left context is the PROCESSED output
    (so the e of an He counts as a vowel), the right context the original."""
    out: list = []
    n = len(w)
    for i, c in enumerate(w):
        prev_v = bool(out) and out[-1] in _FR_VOWELS
        next_v = i + 1 < n and w[i + 1] in _FR_VOWELS
        if c == "u":
            if out and out[-1] == "q":
                out.append("U")
            elif prev_v and next_v:
                out.append("U")
            else:
                out.append("u")
        elif c == "i":
            out.append("I" if prev_v and next_v else "i")
        elif c == "y":
            out.append("Y" if prev_v or next_v else "y")
        elif c == "ë":
            out.extend("He")
        elif c == "ï":
            out.extend("Hi")
        else:
            out.append(c)
    return "".join(out)


def _fr_rv(w: str) -> int:
    n = len(w)
    if n >= 3 and w[0] in _FR_VOWELS and w[1] in _FR_VOWELS:
        return 3
    if w[:3] in ("par", "col", "tap"):
        return 3
    i = 1
    while i < n and w[i] not in _FR_VOWELS:
        i += 1
    return min(i + 1, n)


def french_stem(word: str) -> str:  # noqa: C901 — mirrors the spec's cases
    """Snowball French stemmer."""
    w = _fr_prelude(word.lower())
    rv = _fr_rv(w)
    r1, r2 = _r1_r2(w, _FR_VOWELS)

    def in_r2(pos):
        return pos >= r2

    def in_r1(pos):
        return pos >= r1

    def in_rv(pos):
        return pos >= rv

    orig = w
    step1_done = False        # a suffix was removed in step 1
    found_ment = False        # amment/emment/ment(s) was seen
    # step 1 — longest-suffix dispatch
    sufs = sorted([
        "ance", "iqUe", "isme", "able", "iste", "eux", "ances", "iqUes",
        "ismes", "ables", "istes", "atrice", "ateur", "ation", "atrices",
        "ateurs", "ations", "logie", "logies", "usion", "ution", "usions",
        "utions", "ence", "ences", "ement", "ements", "ité", "ités", "if",
        "ive", "ifs", "ives", "eaux", "aux", "euse", "euses", "issement",
        "issements", "amment", "emment", "ment", "ments",
    ], key=len, reverse=True)
    for suf in sufs:
        if not w.endswith(suf):
            continue
        pos = len(w) - len(suf)
        if suf in ("ance", "iqUe", "isme", "able", "iste", "eux",
                   "ances", "iqUes", "ismes", "ables", "istes"):
            if in_r2(pos):
                w = w[:pos]
                step1_done = True
        elif suf in ("atrice", "ateur", "ation",
                     "atrices", "ateurs", "ations"):
            if in_r2(pos):
                w = w[:pos]
                step1_done = True
                if w.endswith("ic"):
                    if in_r2(len(w) - 2):
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
        elif suf in ("logie", "logies"):
            if in_r2(pos):
                w = w[:pos] + "log"
                step1_done = True
        elif suf in ("usion", "ution", "usions", "utions"):
            if in_r2(pos):
                w = w[:pos] + "u"
                step1_done = True
        elif suf in ("ence", "ences"):
            if in_r2(pos):
                w = w[:pos] + "ent"
                step1_done = True
        elif suf in ("ement", "ements"):
            if in_rv(pos):
                w = w[:pos]
                step1_done = True
                if w.endswith("iv") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("at") and in_r2(len(w) - 2):
                        w = w[:-2]
                elif w.endswith("eus"):
                    p = len(w) - 3
                    if in_r2(p):
                        w = w[:p]
                    elif in_r1(p):
                        w = w[:p] + "eux"
                elif w.endswith("abl") and in_r2(len(w) - 3):
                    w = w[:-3]
                elif w.endswith("iqU") and in_r2(len(w) - 3):
                    w = w[:-3]
                elif w.endswith("ièr") and in_rv(len(w) - 3):
                    w = w[:-3] + "i"
                elif w.endswith("Ièr") and in_rv(len(w) - 3):
                    w = w[:-3] + "i"
        elif suf in ("ité", "ités"):
            if in_r2(pos):
                w = w[:pos]
                step1_done = True
                if w.endswith("abil"):
                    p = len(w) - 4
                    w = w[:p] if in_r2(p) else w[:p] + "abl"
                elif w.endswith("ic"):
                    p = len(w) - 2
                    w = w[:p] if in_r2(p) else w[:p] + "iqU"
                elif w.endswith("iv") and in_r2(len(w) - 2):
                    w = w[:-2]
        elif suf in ("if", "ive", "ifs", "ives"):
            if in_r2(pos):
                w = w[:pos]
                step1_done = True
                if w.endswith("at") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("ic"):
                        p = len(w) - 2
                        w = w[:p] if in_r2(p) else w[:p] + "iqU"
        elif suf == "eaux":
            w = w[:pos] + "eau"
            step1_done = True
        elif suf == "aux":
            if in_r1(pos):
                w = w[:pos] + "al"
                step1_done = True
        elif suf in ("euse", "euses"):
            if in_r2(pos):
                w = w[:pos]
                step1_done = True
            elif in_r1(pos):
                w = w[:pos] + "eux"
                step1_done = True
        elif suf in ("issement", "issements"):
            if in_r1(pos) and pos > 0 and w[pos - 1] not in _FR_VOWELS:
                w = w[:pos]
                step1_done = True
        elif suf == "amment":
            if in_rv(pos):
                w = w[:pos] + "ant"
                found_ment = True
        elif suf == "emment":
            if in_rv(pos):
                w = w[:pos] + "ent"
                found_ment = True
        elif suf in ("ment", "ments"):
            if pos > 0 and w[pos - 1] in _FR_VOWELS and in_rv(pos - 1):
                w = w[:pos]
                found_ment = True
        break

    # step 2a: verb suffixes beginning i — only if step 1 removed nothing,
    # or one of the *ment endings was involved
    do_2a = (not step1_done) or found_ment
    step2_done = False
    if do_2a:
        sufs2a = sorted([
            "îmes", "ît", "îtes", "i", "ie", "ies", "ir", "ira", "irai",
            "iraIent", "irais", "irait", "iras", "irent", "irez", "iriez",
            "irions", "irons", "iront", "is", "issaIent", "issais",
            "issait", "issant", "issante", "issantes", "issants", "isse",
            "issent", "isses", "issez", "issiez", "issions", "issons",
            "it"], key=len, reverse=True)
        suf = _longest_in(w, sufs2a, rv)
        if suf is not None:
            pos = len(w) - len(suf)
            # preceded by a true non-vowel: H (the mark of a ë/ï) doesn't
            # count — Hi is really the vowel ï
            if pos > 0 and w[pos - 1] not in _FR_VOWELS \
                    and w[pos - 1] != "H" and in_rv(pos - 1):
                w = w[:pos]
                step2_done = True
        # step 2b: only if 2a was tried but removed nothing
        if not step2_done:
            sufs2b = sorted([
                "ions", "é", "ée", "ées", "és", "èrent", "er", "era",
                "erai", "eraIent", "erais", "erait", "eras", "erez",
                "eriez", "erions", "erons", "eront", "ez", "iez", "âmes",
                "ât", "âtes", "a", "ai", "aIent", "ais", "ait", "ant",
                "ante", "antes", "ants", "as", "asse", "assent", "asses",
                "assiez", "assions"], key=len, reverse=True)
            suf = _longest_in(w, sufs2b, rv)
            if suf is not None:
                pos = len(w) - len(suf)
                if suf == "ions":
                    if in_r2(pos):
                        w = w[:pos]
                        step2_done = True
                elif suf in ("é", "ée", "ées", "és", "èrent", "er", "era",
                             "erai", "eraIent", "erais", "erait", "eras",
                             "erez", "eriez", "erions", "erons", "eront",
                             "ez", "iez"):
                    w = w[:pos]
                    step2_done = True
                else:
                    w = w[:pos]
                    step2_done = True
                    if w.endswith("e") and in_rv(len(w) - 1):
                        w = w[:-1]

    altered = w != orig
    if altered:
        # step 3
        if w.endswith("Y"):
            w = w[:-1] + "i"
        elif w.endswith("ç"):
            w = w[:-1] + "c"
    else:
        # step 4
        if w.endswith("s") and len(w) >= 2:
            p = w[-2]
            blocked = p in "aiouès" and not (
                p == "i" and len(w) >= 3 and w[-3] == "H")  # Hi (was ï)
            if not blocked:
                w = w[:-1]
        sufs4 = ("ière", "Ière", "ion", "ier", "Ier", "e")
        suf = _longest_in(w, list(sufs4), rv)
        if suf is not None:
            pos = len(w) - len(suf)
            if suf == "ion":
                if in_r2(pos) and pos > 0 and w[pos - 1] in "st" \
                        and in_rv(pos - 1):
                    w = w[:pos]
            elif suf in ("ier", "ière", "Ier", "Ière"):
                w = w[:pos] + "i"
            else:  # e
                w = w[:pos]

    # step 5: un-double
    for end in ("enn", "onn", "ett", "ell", "eill"):
        if w.endswith(end):
            w = w[:-1]
            break

    # step 6: un-accent — é/è followed only by non-vowels to the end
    # (marked I/U/Y are consonants for this test: not in the v grouping)
    i = len(w) - 1
    seen_nonvowel = False
    while i >= 0:
        c = w[i]
        if c in "éè":
            if seen_nonvowel:
                w = w[:i] + "e" + w[i + 1:]
            break
        if c in _FR_VOWELS:
            break
        seen_nonvowel = True
        i -= 1

    # postlude: unmark I/U/Y, restore He → ë / Hi → ï, drop stray H
    w = w.replace("He", "ë").replace("Hi", "ï").replace("H", "")
    return w.translate(str.maketrans({"I": "i", "U": "u", "Y": "y"}))


# ---------------------------------------------------------------------------
# Spanish
# ---------------------------------------------------------------------------

_ES_VOWELS = "aeiouáéíóúü"
_ES_UNACCENT = str.maketrans({"á": "a", "é": "e", "í": "i", "ó": "o",
                              "ú": "u"})


def _es_rv(w: str) -> int:
    n = len(w)
    if n < 3:
        return n
    if w[1] not in _ES_VOWELS:
        i = 2
        while i < n and w[i] not in _ES_VOWELS:
            i += 1
        return min(i + 1, n)
    if w[0] in _ES_VOWELS and w[1] in _ES_VOWELS:
        i = 2
        while i < n and w[i] in _ES_VOWELS:
            i += 1
        return min(i + 1, n)
    return 3


_ES_PRONOUNS = ("selas", "selos", "sela", "selo", "las", "les", "los",
                "nos", "me", "se", "la", "le", "lo")
_ES_PRON_PRE_A = ("iéndo", "ándo", "ár", "ér", "ír")
_ES_PRON_PRE_B = ("iendo", "ando", "ar", "er", "ir")


def spanish_stem(word: str) -> str:  # noqa: C901 — mirrors the spec's cases
    """Snowball Spanish stemmer."""
    w = word.lower()
    rv = _es_rv(w)
    r1, r2 = _r1_r2(w, _ES_VOWELS)

    def in_r1(pos):
        return pos >= r1

    def in_r2(pos):
        return pos >= r2

    def in_rv(pos):
        return pos >= rv

    # step 0: attached pronoun
    for pr in _ES_PRONOUNS:
        if not w.endswith(pr):
            continue
        base = len(w) - len(pr)
        stem = w[:base]
        done = False
        for pre in _ES_PRON_PRE_A:
            if stem.endswith(pre) and in_rv(len(stem) - len(pre)):
                w = stem.translate(_ES_UNACCENT)
                done = True
                break
        if not done:
            for pre in _ES_PRON_PRE_B:
                if stem.endswith(pre) and in_rv(len(stem) - len(pre)):
                    w = stem
                    done = True
                    break
        if not done and stem.endswith("yendo") \
                and stem[-6:-5] == "u" and in_rv(len(stem) - 5):
            w = stem
        break

    orig = w
    # step 1: standard suffix removal (longest match)
    sufs1 = sorted([
        "anza", "anzas", "ico", "ica", "icos", "icas", "ismo", "ismos",
        "able", "ables", "ible", "ibles", "ista", "istas", "oso", "osa",
        "osos", "osas", "amiento", "amientos", "imiento", "imientos",
        "adora", "ador", "ación", "adoras", "adores", "aciones", "ante",
        "antes", "ancia", "ancias", "logía", "logías", "ución", "uciones",
        "encia", "encias", "amente", "mente", "idad", "idades", "iva",
        "ivo", "ivas", "ivos"], key=len, reverse=True)
    for suf in sufs1:
        if not w.endswith(suf):
            continue
        pos = len(w) - len(suf)
        if suf in ("anza", "anzas", "ico", "ica", "icos", "icas", "ismo",
                   "ismos", "able", "ables", "ible", "ibles", "ista",
                   "istas", "oso", "osa", "osos", "osas", "amiento",
                   "amientos", "imiento", "imientos"):
            if in_r2(pos):
                w = w[:pos]
        elif suf in ("adora", "ador", "ación", "adoras", "adores",
                     "aciones", "ante", "antes", "ancia", "ancias"):
            if in_r2(pos):
                w = w[:pos]
                if w.endswith("ic") and in_r2(len(w) - 2):
                    w = w[:-2]
        elif suf in ("logía", "logías"):
            if in_r2(pos):
                w = w[:pos] + "log"
        elif suf in ("ución", "uciones"):
            if in_r2(pos):
                w = w[:pos] + "u"
        elif suf in ("encia", "encias"):
            if in_r2(pos):
                w = w[:pos] + "ente"
        elif suf == "amente":
            if in_r1(pos):
                w = w[:pos]
                if w.endswith("iv") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("at") and in_r2(len(w) - 2):
                        w = w[:-2]
                else:
                    for pre in ("os", "ic", "ad"):
                        if w.endswith(pre) and in_r2(len(w) - 2):
                            w = w[:-2]
                            break
        elif suf == "mente":
            if in_r2(pos):
                w = w[:pos]
                for pre in ("ante", "able", "ible"):
                    if w.endswith(pre) and in_r2(len(w) - 4):
                        w = w[:-4]
                        break
        elif suf in ("idad", "idades"):
            if in_r2(pos):
                w = w[:pos]
                for pre in ("abil", "ic", "iv"):
                    if w.endswith(pre) and in_r2(len(w) - len(pre)):
                        w = w[:-len(pre)]
                        break
        else:  # iva ivo ivas ivos
            if in_r2(pos):
                w = w[:pos]
                if w.endswith("at") and in_r2(len(w) - 2):
                    w = w[:-2]
        break

    if w == orig:
        # step 2a: verb suffixes beginning y (preceded by u)
        done2a = False
        sufs2a = sorted(["ya", "ye", "yan", "yen", "yeron", "yendo", "yo",
                         "yó", "yas", "yes", "yais", "yamos"],
                        key=len, reverse=True)
        suf = _longest_in(w, sufs2a, rv)
        if suf is not None:
            pos = len(w) - len(suf)
            if pos > 0 and w[pos - 1] == "u":  # the u need not be in RV
                w = w[:pos]
                done2a = True
        if not done2a:
            # step 2b: ONE longest-match over all verb suffixes; the
            # gu-undoubling applies only when the matched suffix is one of
            # en/es/éis/emos
            gu_group = {"en", "es", "éis", "emos"}
            sufs2b = sorted([
                "arían", "arías", "arán", "arás", "aríais", "aría",
                "aréis", "aríamos", "aremos", "ará", "aré", "erían",
                "erías", "erán", "erás", "eríais", "ería", "eréis",
                "eríamos", "eremos", "erá", "eré", "irían", "irías",
                "irán", "irás", "iríais", "iría", "iréis", "iríamos",
                "iremos", "irá", "iré", "aba", "ada", "ida", "ía",
                "ara", "iera", "ad", "ed", "id", "ase", "iese",
                "aste", "iste", "an", "aban", "ían", "aran", "ieran",
                "asen", "iesen", "aron", "ieron", "ado", "ido",
                "ando", "iendo", "ió", "ar", "er", "ir", "as",
                "abas", "adas", "idas", "ías", "aras", "ieras",
                "ases", "ieses", "ís", "áis", "abais", "íais",
                "arais", "ierais", "aseis", "ieseis", "asteis",
                "isteis", "ados", "idos", "amos", "ábamos", "íamos",
                "imos", "áramos", "iéramos", "iésemos", "ásemos",
                "en", "es", "éis", "emos"],
                key=len, reverse=True)
            suf = _longest_in(w, sufs2b, rv)
            if suf is not None:
                w = w[:len(w) - len(suf)]
                if suf in gu_group and w.endswith("gu"):
                    w = w[:-1]

    # step 3: residual suffix (match confined to RV)
    suf = _longest_in(w, ["os", "a", "o", "á", "í", "ó", "e", "é"], rv)
    if suf is not None:
        pos = len(w) - len(suf)
        w = w[:pos]
        if suf in ("e", "é") and w.endswith("gu") and in_rv(len(w) - 1):
            w = w[:-1]

    return w.translate(_ES_UNACCENT)


SNOWBALL = {"de": german_stem, "german": german_stem,
            "fr": french_stem, "french": french_stem,
            "es": spanish_stem, "spanish": spanish_stem}


# ---------------------------------------------------------------------------
# Portuguese
# ---------------------------------------------------------------------------

_PT_VOWELS = "aeiouáéíóúâêô"


def _pt_rv(w: str) -> int:
    return _es_like_rv(w, _PT_VOWELS)  # same scheme as Spanish


_PT_STEP2 = sorted([
    "ada", "ida", "ia", "aria", "eria", "iria", "ará", "ara", "erá", "era",
    "irá", "ava", "asse", "esse", "isse", "aste", "este", "iste", "ei",
    "arei", "erei", "irei", "am", "iam", "ariam", "eriam", "iriam", "aram",
    "eram", "iram", "avam", "em", "arem", "erem", "irem", "assem", "essem",
    "issem", "ado", "ido", "ando", "endo", "indo", "ara~o", "era~o",
    "ira~o", "ar", "er", "ir", "as", "adas", "idas", "ias", "arias",
    "erias", "irias", "arás", "aras", "erás", "eras", "irás", "avas", "es",
    "ardes", "erdes", "irdes", "ares", "eres", "ires", "asses", "esses",
    "isses", "astes", "estes", "istes", "is", "ais", "eis", "íeis",
    "aríeis", "eríeis", "iríeis", "áreis", "areis", "éreis", "ereis",
    "íreis", "ireis", "ásseis", "ésseis", "ísseis", "áveis", "ados",
    "idos", "ámos", "amos", "íamos", "aríamos", "eríamos", "iríamos",
    "áramos", "éramos", "íramos", "ávamos", "emos", "aremos", "eremos",
    "iremos", "ássemos", "êssemos", "íssemos", "imos", "armos", "ermos",
    "irmos", "eu", "iu", "ou", "ira", "iras"], key=len, reverse=True)


def portuguese_stem(word: str) -> str:  # noqa: C901 — mirrors the spec
    """Snowball Portuguese stemmer."""
    w = word.lower().replace("ã", "a~").replace("õ", "o~")
    rv = _pt_rv(w)
    r1, r2 = _r1_r2(w, _PT_VOWELS)

    def in_r1(pos):
        return pos >= r1

    def in_r2(pos):
        return pos >= r2

    def in_rv(pos):
        return pos >= rv

    orig = w
    # step 1: standard suffix removal (longest match, region per group)
    sufs1 = sorted([
        "eza", "ezas", "ico", "ica", "icos", "icas", "ismo", "ismos",
        "ável", "ível", "ista", "istas", "oso", "osa", "osos", "osas",
        "amento", "amentos", "imento", "imentos", "adora", "ador",
        "aça~o", "adoras", "adores", "aço~es", "ante", "antes", "ância",
        "logia", "logias", "uça~o", "uço~es", "ência", "ências",
        "amente", "mente", "idade", "idades", "iva", "ivo", "ivas",
        "ivos", "ira", "iras"], key=len, reverse=True)
    for suf in sufs1:
        if not w.endswith(suf):
            continue
        pos = len(w) - len(suf)
        if suf in ("logia", "logias"):
            if in_r2(pos):
                w = w[:pos] + "log"
        elif suf in ("uça~o", "uço~es"):
            if in_r2(pos):
                w = w[:pos] + "u"
        elif suf in ("ência", "ências"):
            if in_r2(pos):
                w = w[:pos] + "ente"
        elif suf == "amente":
            if in_r1(pos):
                w = w[:pos]
                if w.endswith("iv") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("at") and in_r2(len(w) - 2):
                        w = w[:-2]
                else:
                    for pre in ("os", "ic", "ad"):
                        if w.endswith(pre) and in_r2(len(w) - 2):
                            w = w[:-2]
                            break
        elif suf == "mente":
            if in_r2(pos):
                w = w[:pos]
                for pre in ("ante", "avel", "ível"):
                    if w.endswith(pre) and in_r2(len(w) - 4):
                        w = w[:-4]
                        break
        elif suf in ("idade", "idades"):
            if in_r2(pos):
                w = w[:pos]
                for pre in ("abil", "ic", "iv"):
                    if w.endswith(pre) and in_r2(len(w) - len(pre)):
                        w = w[:-len(pre)]
                        break
        elif suf in ("iva", "ivo", "ivas", "ivos"):
            if in_r2(pos):
                w = w[:pos]
                if w.endswith("at") and in_r2(len(w) - 2):
                    w = w[:-2]
        elif suf in ("ira", "iras"):
            if in_rv(pos) and pos > 0 and w[pos - 1] == "e":
                w = w[:pos] + "ir"
        else:
            if in_r2(pos):
                w = w[:pos]
        break

    # step 2: verb suffixes — only if step 1 removed nothing
    if w == orig:
        suf = _longest_in(w, _PT_STEP2, rv)
        if suf is not None:
            w = w[:len(w) - len(suf)]

    changed = w != orig
    if changed:
        # step 3: final i preceded by c
        if w.endswith("i") and in_rv(len(w) - 1) and len(w) >= 2 \
                and w[-2] == "c":
            w = w[:-1]
    else:
        # step 4: residual suffix
        suf = _longest_in(w, ["os", "a", "i", "o", "á", "í", "ó"], rv)
        if suf is not None:
            w = w[:len(w) - len(suf)]

    # step 5: residual form (always)
    if w and w[-1] in "eéê" and in_rv(len(w) - 1):
        w = w[:-1]
        if (w.endswith("gu") or w.endswith("ci")) and in_rv(len(w) - 1):
            w = w[:-1]
    elif w.endswith("ç"):
        w = w[:-1] + "c"

    return w.replace("a~", "ã").replace("o~", "õ")


# ---------------------------------------------------------------------------
# Italian
# ---------------------------------------------------------------------------

_IT_VOWELS = "aeiouàèìòù"
_IT_ACUTE = str.maketrans({"á": "à", "é": "è", "í": "ì", "ó": "ò", "ú": "ù"})

_IT_PRONOUNS = sorted([
    "ci", "gli", "la", "le", "li", "lo", "mi", "ne", "si", "ti", "vi",
    "sene", "gliela", "gliele", "glieli", "glielo", "gliene", "mela",
    "mele", "meli", "melo", "mene", "tela", "tele", "teli", "telo",
    "tene", "cela", "cele", "celi", "celo", "cene", "vela", "vele",
    "veli", "velo", "vene"], key=len, reverse=True)

_IT_STEP2 = sorted([
    "ammo", "ando", "ano", "are", "arono", "asse", "assero", "assi",
    "assimo", "ata", "ate", "ati", "ato", "ava", "avamo", "avano",
    "avate", "avi", "avo", "emmo", "enda", "ende", "endi", "endo",
    "erà", "erai", "eranno", "ere", "erebbe", "erebbero", "erei",
    "eremmo", "eremo", "ereste", "eresti", "erete", "erò", "erono",
    "essero", "ete", "eva", "evamo", "evano", "evate", "evi", "evo",
    "Yamo", "iamo", "immo", "irà", "irai", "iranno", "ire", "irebbe",
    "irebbero", "irei", "iremmo", "iremo", "ireste", "iresti", "irete",
    "irò", "irono", "isca", "iscano", "isce", "isci", "isco", "iscono",
    "issero", "ita", "ite", "iti", "ito", "iva", "ivamo", "ivano",
    "ivate", "ivi", "ivo", "ono", "uta", "ute", "uti", "uto", "ar",
    "ir"], key=len, reverse=True)


def _it_prelude(w: str) -> str:
    w = w.translate(_IT_ACUTE)
    out: list = []
    n = len(w)
    for i, c in enumerate(w):
        prev_v = bool(out) and out[-1] in _IT_VOWELS
        next_v = i + 1 < n and w[i + 1] in _IT_VOWELS
        if c == "u":
            if out and out[-1] == "q":
                out.append("U")
            elif prev_v and next_v:
                out.append("U")
            else:
                out.append("u")
        elif c == "i":
            out.append("I" if prev_v and next_v else "i")
        else:
            out.append(c)
    return "".join(out)


def italian_stem(word: str) -> str:  # noqa: C901 — mirrors the spec
    """Snowball Italian stemmer."""
    w = _it_prelude(word.lower())
    rv = _es_like_rv(w, _IT_VOWELS)
    r1, r2 = _r1_r2(w, _IT_VOWELS)

    def in_r1(pos):
        return pos >= r1

    def in_r2(pos):
        return pos >= r2

    def in_rv(pos):
        return pos >= rv

    # step 0: attached pronoun — after ando/endo (delete) or ar/er/ir (-> e)
    suf = _longest_in(w, _IT_PRONOUNS, rv)
    if suf is not None:
        base = len(w) - len(suf)
        stem = w[:base]
        for pre in ("ando", "endo"):
            if stem.endswith(pre) and in_rv(len(stem) - 4):
                w = stem
                break
        else:
            for pre in ("ar", "er", "ir"):
                if stem.endswith(pre) and in_rv(len(stem) - 2):
                    w = stem + "e"
                    break

    orig = w
    # step 1: standard suffixes
    sufs1 = sorted([
        "anza", "anze", "ico", "ica", "ici", "iche", "ichi", "ismo",
        "ismi", "abile", "abili", "ibile", "ibili", "ista", "iste",
        "isti", "istà", "istè", "istì", "oso", "osa", "osi", "ose",
        "mente", "atrice", "atrici", "ante", "anti", "azione", "azioni",
        "atore", "atori", "logia", "logie", "uzione", "uzioni", "usione",
        "usioni", "enza", "enze", "amento", "amenti", "imento", "imenti",
        "amente", "ità", "ivo", "iva", "ivi", "ive"],
        key=len, reverse=True)
    for suf in sufs1:
        if not w.endswith(suf):
            continue
        pos = len(w) - len(suf)
        if suf in ("azione", "azioni", "atore", "atori"):
            if in_r2(pos):
                w = w[:pos]
                if w.endswith("ic") and in_r2(len(w) - 2):
                    w = w[:-2]
        elif suf in ("logia", "logie"):
            if in_r2(pos):
                w = w[:pos] + "log"
        elif suf in ("uzione", "uzioni", "usione", "usioni"):
            if in_r2(pos):
                w = w[:pos] + "u"
        elif suf in ("enza", "enze"):
            if in_r2(pos):
                w = w[:pos] + "ente"
        elif suf in ("amento", "amenti", "imento", "imenti"):
            if in_rv(pos):
                w = w[:pos]
        elif suf == "amente":
            if in_r1(pos):
                w = w[:pos]
                if w.endswith("iv") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("at") and in_r2(len(w) - 2):
                        w = w[:-2]
                else:
                    for pre in ("os", "ic", "abil"):
                        if w.endswith(pre) and in_r2(len(w) - len(pre)):
                            w = w[:-len(pre)]
                            break
        elif suf == "ità":
            if in_r2(pos):
                w = w[:pos]
                for pre in ("abil", "ic", "iv"):
                    if w.endswith(pre) and in_r2(len(w) - len(pre)):
                        w = w[:-len(pre)]
                        break
        elif suf in ("ivo", "iva", "ivi", "ive"):
            if in_r2(pos):
                w = w[:pos]
                if w.endswith("at") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("ic") and in_r2(len(w) - 2):
                        w = w[:-2]
        else:
            if in_r2(pos):
                w = w[:pos]
        break

    # step 2: verb suffixes — only if step 1 removed nothing
    if w == orig:
        suf = _longest_in(w, _IT_STEP2, rv)
        if suf is not None:
            w = w[:len(w) - len(suf)]

    # step 3a: final vowel, then a preceding i
    if w and w[-1] in "aeioàèìò" and in_rv(len(w) - 1):
        w = w[:-1]
        if w.endswith("i") and in_rv(len(w) - 1):
            w = w[:-1]
    # step 3b: ch/gh -> c/g
    if (w.endswith("ch") or w.endswith("gh")) and in_rv(len(w) - 2):
        w = w[:-1]

    return w.translate(str.maketrans({"I": "i", "U": "u"}))


def _es_like_rv(w: str, vowels: str) -> int:
    """Spanish-style RV over an arbitrary vowel set (shared by it/pt/es)."""
    n = len(w)
    if n < 3:
        return n
    if w[1] not in vowels:
        i = 2
        while i < n and w[i] not in vowels:
            i += 1
        return min(i + 1, n)
    if w[0] in vowels and w[1] in vowels:
        i = 2
        while i < n and w[i] in vowels:
            i += 1
        return min(i + 1, n)
    return 3


SNOWBALL.update({"pt": portuguese_stem, "portuguese": portuguese_stem,
                 "it": italian_stem, "italian": italian_stem})


# ---------------------------------------------------------------------------
# Scandinavian trio (Swedish / Norwegian / Danish) — shared shape: R1 with
# the 3-letter minimum, one big a-suffix step, an st/undouble step, a small
# d-suffix step.
# ---------------------------------------------------------------------------

_SV_VOWELS = "aeiouyäåö"
_SV_S_END = "bcdfghjklmnoprtvy"
_SV_STEP1 = sorted([
    "a", "arna", "erna", "heterna", "orna", "ad", "e", "ade", "ande",
    "arne", "are", "aste", "en", "anden", "aren", "heten", "ern", "ar",
    "er", "heter", "or", "as", "arnas", "ernas", "ornas", "es", "ades",
    "andes", "ens", "arens", "hetens", "erns", "at", "andet", "het",
    "ast"], key=len, reverse=True)


def _r1_min3(w: str, vowels: str) -> int:
    r1 = _r_std(w, vowels)
    return max(r1, min(3, len(w)))


def swedish_stem(word: str) -> str:
    """Snowball Swedish stemmer."""
    w = word.lower()
    r1 = _r1_min3(w, _SV_VOWELS)

    # step 1: longest a-suffix in R1, or s after a valid s-ending
    suf = _longest_in(w, _SV_STEP1, r1)
    if suf is not None:
        w = w[:len(w) - len(suf)]
    elif w.endswith("s") and len(w) - 1 >= r1 and len(w) >= 2 \
            and w[-2] in _SV_S_END:
        w = w[:-1]

    # step 2: penultimate-consonant endings lose the last letter
    for end in ("dd", "gd", "nn", "dt", "gt", "kt", "tt"):
        if w.endswith(end) and len(w) - 2 >= r1:
            w = w[:-1]
            break

    # step 3: one R1-limited among — delete lig/ig/els,
    # fullt -> full, löst -> lös
    suf = _longest_in(w, ["fullt", "löst", "lig", "els", "ig"], r1)
    if suf in ("fullt", "löst"):
        w = w[:-1]
    elif suf is not None:
        w = w[:len(w) - len(suf)]
    return w


_NO_VOWELS = "aeiouyæåø"
_NO_S_END = "bcdfghjlmnoprtvyz"
_NO_STEP1 = sorted([
    "a", "e", "ede", "ande", "ende", "ane", "ene", "hetene", "en",
    "heten", "ar", "er", "heter", "as", "es", "edes", "endes", "enes",
    "hetenes", "ens", "hetens", "ers", "ets", "et", "het", "ast",
    "erte", "ert", "s"], key=len, reverse=True)


def norwegian_stem(word: str) -> str:
    """Snowball Norwegian stemmer."""
    w = word.lower()
    r1 = _r1_min3(w, _NO_VOWELS)

    suf = _longest_in(w, _NO_STEP1, r1)
    if suf is not None:
        pos = len(w) - len(suf)
        if suf == "s":
            # valid s-ending: the listed consonants, or k not after a vowel
            p = w[pos - 1] if pos > 0 else ""
            ok = p in _NO_S_END or (
                p == "k" and (pos < 2 or w[pos - 2] not in _NO_VOWELS))
            if ok:
                w = w[:pos]
        elif suf in ("erte", "ert"):
            w = w[:pos] + "er"
        else:
            w = w[:pos]

    # step 2: dt / vt lose the t
    if (w.endswith("dt") or w.endswith("vt")) and len(w) - 2 >= r1:
        w = w[:-1]

    # step 3
    suf = _longest_in(w, sorted(
        ["leg", "eleg", "ig", "eig", "lig", "elig", "els", "lov", "elov",
         "slov", "hetslov"], key=len, reverse=True), r1)
    if suf is not None:
        w = w[:len(w) - len(suf)]
    return w


_DA_VOWELS = "aeiouyæåø"
_DA_S_END = "abcdfghjklmnoprtvyzå"
_DA_STEP1 = sorted([
    "hed", "ethed", "ered", "e", "erede", "ende", "erende", "ene",
    "erne", "ere", "en", "heden", "eren", "er", "heder", "erer", "heds",
    "es", "endes", "erendes", "enes", "ernes", "eres", "ens", "hedens",
    "erens", "ers", "ets", "erets", "et", "eret"], key=len, reverse=True)


def danish_stem(word: str) -> str:
    """Snowball Danish stemmer."""
    w = word.lower()
    r1 = _r1_min3(w, _DA_VOWELS)

    suf = _longest_in(w, _DA_STEP1, r1)
    if suf is not None:
        w = w[:len(w) - len(suf)]
    elif w.endswith("s") and len(w) - 1 >= r1 and len(w) >= 2 \
            and w[-2] in _DA_S_END:
        w = w[:-1]

    def step2(v: str) -> str:
        for end in ("gd", "dt", "gt", "kt"):
            if v.endswith(end) and len(v) - 2 >= r1:
                return v[:-1]
        return v

    w = step2(w)

    # step 3
    if w.endswith("igst"):
        w = w[:-2]
    suf = _longest_in(w, sorted(["ig", "lig", "elig", "els", "løst"],
                                key=len, reverse=True), r1)
    if suf == "løst":
        w = w[:-1]
    elif suf is not None:
        w = w[:len(w) - len(suf)]
        w = step2(w)

    # step 4: undouble a final double consonant in R1
    if len(w) >= 2 and w[-1] == w[-2] and w[-1] not in _DA_VOWELS \
            and len(w) - 1 >= r1:
        w = w[:-1]
    return w


SNOWBALL.update({"sv": swedish_stem, "swedish": swedish_stem,
                 "no": norwegian_stem, "norwegian": norwegian_stem,
                 "da": danish_stem, "danish": danish_stem})


# ---------------------------------------------------------------------------
# Dutch
# ---------------------------------------------------------------------------

_NL_VOWELS = "aeiouyè"
_NL_UNACCENT = str.maketrans({"ä": "a", "ë": "e", "ï": "i", "ö": "o",
                              "ü": "u", "á": "a", "é": "e", "í": "i",
                              "ó": "o", "ú": "u"})


def _nl_prelude(w: str) -> str:
    w = w.translate(_NL_UNACCENT)
    out: list = []
    n = len(w)
    for i, c in enumerate(w):
        prev_v = bool(out) and out[-1] in _NL_VOWELS
        next_v = i + 1 < n and w[i + 1] in _NL_VOWELS
        if c == "y" and (i == 0 or prev_v):
            out.append("Y")
        elif c == "i" and prev_v and next_v:
            out.append("I")
        else:
            out.append(c)
    return "".join(out)


def _nl_undouble(w: str) -> str:
    return w[:-1] if w.endswith(("kk", "dd", "tt")) else w


def dutch_stem(word: str) -> str:  # noqa: C901 — mirrors the spec
    """Snowball Dutch stemmer."""
    w = _nl_prelude(word.lower())
    r1, r2 = _r1_r2(w, _NL_VOWELS)
    r1 = max(r1, min(3, len(w)))

    def in_r1(pos):
        return pos >= r1

    def in_r2(pos):
        return pos >= r2

    def valid_s(pos):
        return pos > 0 and w[pos - 1] not in _NL_VOWELS and w[pos - 1] != "j"

    def valid_en(v, pos):
        return (pos > 0 and v[pos - 1] not in _NL_VOWELS
                and v[:pos][-3:] != "gem")

    # step 1 (longest of heden | en ene | s se)
    for suf in ("heden", "ene", "en", "se", "s"):
        if not w.endswith(suf):
            continue
        pos = len(w) - len(suf)
        if suf == "heden":
            if in_r1(pos):
                w = w[:pos] + "heid"
        elif suf in ("en", "ene"):
            if in_r1(pos) and valid_en(w, pos):
                w = _nl_undouble(w[:pos])
        else:
            if in_r1(pos) and valid_s(pos):
                w = w[:pos]
        break

    # step 2: final e after a non-vowel
    e_removed = False
    if w.endswith("e") and in_r1(len(w) - 1) and len(w) >= 2 \
            and w[-2] not in _NL_VOWELS:
        w = _nl_undouble(w[:-1])
        e_removed = True

    # step 3a: heid (not after c), then a trailing en like step 1
    if w.endswith("heid") and in_r2(len(w) - 4) and len(w) >= 5 \
            and w[-5] != "c":
        w = w[:-4]
        if w.endswith("en") and in_r1(len(w) - 2) \
                and valid_en(w, len(w) - 2):
            w = _nl_undouble(w[:-2])

    # step 3b: d-suffixes (longest)
    for suf in ("lijk", "baar", "end", "ing", "bar", "ig"):
        if not w.endswith(suf):
            continue
        pos = len(w) - len(suf)
        if suf in ("end", "ing"):
            if in_r2(pos):
                w = w[:pos]
                if w.endswith("ig") and in_r2(len(w) - 2) \
                        and (len(w) < 3 or w[-3] != "e"):
                    w = w[:-2]
                else:
                    w = _nl_undouble(w)
        elif suf == "ig":
            if in_r2(pos) and not (pos > 0 and w[pos - 1] == "e"):
                w = w[:pos]
        elif suf == "lijk":
            if in_r2(pos):
                w = w[:pos]
                if w.endswith("e") and in_r1(len(w) - 1) and len(w) >= 2 \
                        and w[-2] not in _NL_VOWELS:
                    w = _nl_undouble(w[:-1])
        elif suf == "baar":
            if in_r2(pos):
                w = w[:pos]
        else:  # bar
            if in_r2(pos) and e_removed:
                w = w[:pos]
        break

    # step 4: undouble vowel in C V V D (D a non-vowel other than I)
    if len(w) >= 4:
        c, v1, v2, d = w[-4], w[-3], w[-2], w[-1]
        if (c not in _NL_VOWELS and d not in _NL_VOWELS and d != "I"
                and v1 == v2 and v1 in "aeou"):
            w = w[:-2] + w[-1]

    return w.translate(str.maketrans({"I": "i", "Y": "y"}))


# ---------------------------------------------------------------------------
# Russian
# ---------------------------------------------------------------------------

_RU_VOWELS = "аеиоуыэюя"

_RU_PGERUND_1 = sorted(["в", "вши", "вшись"], key=len, reverse=True)
_RU_PGERUND_2 = sorted(["ив", "ивши", "ившись", "ыв", "ывши", "ывшись"],
                       key=len, reverse=True)
_RU_ADJ = sorted(["ее", "ие", "ые", "ое", "ими", "ыми", "ей", "ий", "ый",
                  "ой", "ем", "им", "ым", "ом", "его", "ого", "ему",
                  "ому", "их", "ых", "ую", "юю", "ая", "яя", "ою", "ею"],
                 key=len, reverse=True)
_RU_PART_1 = sorted(["ем", "нн", "вш", "ющ", "щ"], key=len, reverse=True)
_RU_PART_2 = sorted(["ивш", "ывш", "ующ"], key=len, reverse=True)
_RU_VERB_1 = sorted(["ла", "на", "ете", "йте", "ли", "й", "л", "ем", "н",
                     "ло", "но", "ет", "ют", "ны", "ть", "ешь", "нно"],
                    key=len, reverse=True)
_RU_VERB_2 = sorted(["ила", "ыла", "ена", "ейте", "уйте", "ите", "или",
                     "ыли", "ей", "уй", "ил", "ыл", "им", "ым", "ен",
                     "ило", "ыло", "ено", "ят", "ует", "уют", "ит", "ыт",
                     "ены", "ить", "ыть", "ишь", "ую", "ю"],
                    key=len, reverse=True)
_RU_NOUN = sorted(["а", "ев", "ов", "ие", "ье", "е", "иями", "ями", "ами",
                   "еи", "ии", "и", "ией", "ей", "ой", "ий", "й", "иям",
                   "ям", "ием", "ем", "ам", "ом", "о", "у", "ах", "иях",
                   "ях", "ы", "ь", "ию", "ью", "ю", "ия", "ья", "я"],
                  key=len, reverse=True)


def _ru_rv(w: str) -> int:
    for i, c in enumerate(w):
        if c in _RU_VOWELS:
            return i + 1
    return len(w)


def _ru_del_grouped(w: str, g1: list, g2: list, rv: int):
    """Delete the longest group-2 suffix, or a group-1 suffix preceded by
    а/я (the а/я stays). Returns (new_word, deleted?)."""
    s2 = _longest_in(w, g2, rv)
    s1 = _longest_in(w, g1, rv)
    # Snowball among takes the longest matching pattern overall; group-1
    # patterns implicitly include the preceding а/я
    len2 = len(s2) if s2 else -1
    len1 = (len(s1) + 1) if s1 and len(w) - len(s1) > 0 \
        and w[len(w) - len(s1) - 1] in "ая" \
        and len(w) - len(s1) - 1 >= rv else -1
    if len2 < 0 and len1 < 0:
        return w, False
    if len2 >= len1:
        return w[:len(w) - len(s2)], True
    return w[:len(w) - len(s1)], True


def russian_stem(word: str) -> str:
    """Snowball Russian stemmer."""
    w = word.lower().replace("ё", "е")
    rv = _ru_rv(w)
    r1, r2 = _r1_r2(w, _RU_VOWELS)

    # step 1: perfective gerund, else (reflexive then adjectival|verb|noun)
    w2, done = _ru_del_grouped(w, _RU_PGERUND_1, _RU_PGERUND_2, rv)
    if done:
        w = w2
    else:
        suf = _longest_in(w, ["сь", "ся"], rv)
        if suf is not None:
            w = w[:len(w) - len(suf)]
        # adjectival: adjective, optionally preceded by a participle
        suf = _longest_in(w, _RU_ADJ, rv)
        if suf is not None:
            w = w[:len(w) - len(suf)]
            w2, _ = _ru_del_grouped(w, _RU_PART_1, _RU_PART_2, rv)
            w = w2
        else:
            w2, done = _ru_del_grouped(w, _RU_VERB_1, _RU_VERB_2, rv)
            if done:
                w = w2
            else:
                suf = _longest_in(w, _RU_NOUN, rv)
                if suf is not None:
                    w = w[:len(w) - len(suf)]

    # step 2: final и
    if w.endswith("и") and len(w) - 1 >= rv:
        w = w[:-1]

    # step 3: derivational (in R2)
    suf = _longest_in(w, ["ость", "ост"], max(rv, r2))
    if suf is not None:
        w = w[:len(w) - len(suf)]

    # step 4 — three ALTERNATIVES: undouble нн, OR superlative ейш(е)
    # (then undouble нн), OR delete a final ь
    if w.endswith("нн") and len(w) - 1 >= rv:
        w = w[:-1]
    else:
        suf = _longest_in(w, ["ейше", "ейш"], rv)
        if suf is not None:
            w = w[:len(w) - len(suf)]
            if w.endswith("нн") and len(w) - 1 >= rv:
                w = w[:-1]
        elif w.endswith("ь") and len(w) - 1 >= rv:
            w = w[:-1]
    return w


SNOWBALL.update({"nl": dutch_stem, "dutch": dutch_stem,
                 "ru": russian_stem, "russian": russian_stem})

from . import snowball_ext  # noqa: E402,F401  — registers sk/uk/bg/... routes
