"""Porter stemming (the original algorithm, Release 3) + the English
analyzer chain pieces.

Reference: lucene/analysis/common/src/java/org/apache/lucene/analysis/
en/PorterStemmer.java (the canonical Release-3 Java version of Porter
1980, used by PorterStemFilter.java:57 and therefore by
EnglishAnalyzer.java's chain) — including its two bounds fixes and its
documented departures from the paper ("bli"->"ble", "logi"->"log",
words of length <= 2 unchanged, PorterStemmer.java:476-480).

This is a fresh Python transcription of the ALGORITHM in string-slice
idiom (the Java works in-place over a char buffer); behavior is pinned
by tests/test_porter_shingle.py golden pairs from the published
vocabulary and by DuckDB stem() cross-checks on the corpus
vocabulary.
"""

from __future__ import annotations

__all__ = ["porter_stem", "stem_series", "ENGLISH_STOP_WORDS"]

# EnglishAnalyzer.ENGLISH_STOP_WORDS_SET / StandardAnalyzer's classic
# English stop list (EnglishAnalyzer.java:46-55) — public constants.
ENGLISH_STOP_WORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or "
    "such that the their then there these they this to was will with".split()
)

_VOWELS = frozenset("aeiou")


def _cons(w: str, i: int) -> bool:
    """cons(i) — 'y' is a consonant at 0, else the complement of its
    predecessor (PorterStemmer.java:110-120)."""
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        while True:  # iterative form of the Java recursion
            if i == 0:
                return True
            i -= 1
            c = w[i]
            if c in _VOWELS:
                return True
            if c != "y":
                return False
    return True


def _measure(stem: str) -> int:
    """m(): number of VC sequences in [C](VC)^m[V] (java :133-163)."""
    n = 0
    i = 0
    ln = len(stem)
    while i < ln and _cons(stem, i):
        i += 1
    while True:
        while i < ln and not _cons(stem, i):
            i += 1
        if i >= ln:
            return n
        n += 1
        while i < ln and _cons(stem, i):
            i += 1
        if i >= ln:
            return n


def _has_vowel(stem: str) -> bool:
    return any(not _cons(stem, i) for i in range(len(stem)))


def _doublec(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _cons(w, len(w) - 1)


def _cvc(w: str) -> bool:
    """consonant-vowel-consonant at the end, last not w/x/y — the
    "restore an e" test (java :186-196)."""
    if len(w) < 3:
        return False
    if not (_cons(w, len(w) - 1) and not _cons(w, len(w) - 2)
            and _cons(w, len(w) - 3)):
        return False
    return w[-1] not in "wxy"


def _r(w: str, suffix: str, repl: str) -> str:
    stem = w[: len(w) - len(suffix)]
    return stem + repl if _measure(stem) > 0 else w


def _step1(w: str) -> str:
    """Plurals and -ed/-ing (java step1, :243-266)."""
    if w.endswith("s"):
        if w.endswith("sses"):
            w = w[:-2]
        elif w.endswith("ies"):
            w = w[:-3] + "i"
        elif len(w) >= 2 and w[-2] != "s":
            w = w[:-1]
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        stem = None
        if w.endswith("ed") and _has_vowel(w[:-2]):
            stem = w[:-2]
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            stem = w[:-3]
        if stem is not None:
            w = stem
            if w.endswith(("at", "bl", "iz")):
                w = w + "e"
            elif _doublec(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w = w + "e"
    return w


def _step2(w: str) -> str:
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"
    return w


_STEP3 = (
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"), ("bli", "ble"), ("alli", "al"),
    ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
    ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
    ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"),
    ("biliti", "ble"), ("logi", "log"),
)

_STEP4 = (
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
)

_STEP5_SUFFIXES = (
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
)


def _table_step(w: str, table) -> str:
    """First longest-first matching suffix wins (the java switch on the
    penultimate char plus ordered ends() chains picks the same match:
    within each chain the listed suffixes are mutually non-nested
    except where ordered longest first)."""
    for suf, rep in sorted(table, key=lambda t: -len(t[0])):
        if w.endswith(suf):
            return _r(w, suf, rep)
    return w


def _step5(w: str) -> str:
    """-ant, -ence, ... stripped when m > 1 (java step5, :357-407);
    "ion" only after s/t."""
    for suf in sorted(_STEP5_SUFFIXES, key=len, reverse=True):
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            if suf == "ion" and not stem.endswith(("s", "t")):
                continue
            if _measure(stem) > 1:
                return stem
            return w
    return w


def _step6(w: str) -> str:
    """Final -e and -ll reduction (java step6, :411-421)."""
    if w.endswith("e"):
        a = _measure(w[:-1])
        if a > 1 or (a == 1 and not _cvc(w[:-1])):
            w = w[:-1]
    if w.endswith("ll") and _measure(w[:-1]) > 1:
        w = w[:-1]
    return w


def porter_stem(word: str) -> str:
    """Stem one lowercase word.  Words of length <= 2 are unchanged
    (java stem(int), :477-480)."""
    if len(word) <= 2:
        return word
    w = _step1(word)
    w = _step2(w)
    w = _table_step(w, _STEP3)
    w = _table_step(w, _STEP4)
    w = _step5(w)
    w = _step6(w)
    return w


def stem_series(terms):
    """Vectorized-by-vocabulary stemming of a pandas Series: each
    DISTINCT token is stemmed once (the per-batch analog of the
    reference filter's char-buffer reuse — token streams are
    Zipf-distributed, so the unique set is tiny next to the stream)."""
    uniq = terms.unique()
    lut = {t: porter_stem(t) for t in uniq}
    return terms.map(lut)
