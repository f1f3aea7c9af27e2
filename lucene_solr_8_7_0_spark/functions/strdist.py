"""Pluggable string distances for the spellchecker.

Reference: lucene/suggest/src/java/org/apache/lucene/search/spell/
StringDistance.java and its implementations — DirectSpellChecker
.setDistance swaps the ranking measure while candidate enumeration
stays the fuzzy (edit-distance) terms enum.  Ports are faithful to
the Java float arithmetic (float32 intermediates), asserted by the
classic published example values in tests.

* ``jaro_winkler`` — JaroWinklerDistance.java:76-117 (half-window
  matches, transpositions/2, common prefix; the Winkler bonus
  ``min(0.1, 1/maxlen) * prefix * (1-j)`` applies only when the Jaro
  score exceeds the 0.7 threshold).
* ``ngram_distance`` — NGramDistance.java:46-120 (the Kondrak 2005
  n-gram edit DP with zero-padded prefixes and prefix-match
  discounting; similarity = 1 - cost/maxlen).
"""

from __future__ import annotations

import numpy as np

__all__ = ["jaro_winkler", "ngram_distance"]


def jaro_winkler(s1: str, s2: str, threshold: float = 0.7) -> float:
    if not s1 or not s2:
        return 0.0
    if len(s1) > len(s2):
        mx, mn = s1, s2
    else:
        mx, mn = s2, s1
    rng = max(len(mx) // 2 - 1, 0)
    match_idx = [-1] * len(mn)
    match_flags = [False] * len(mx)
    matches = 0
    for mi, c1 in enumerate(mn):
        for xi in range(max(mi - rng, 0), min(mi + rng + 1, len(mx))):
            if not match_flags[xi] and c1 == mx[xi]:
                match_idx[mi] = xi
                match_flags[xi] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    ms1 = [mn[i] for i in range(len(mn)) if match_idx[i] != -1]
    ms2 = [mx[i] for i in range(len(mx)) if match_flags[i]]
    transpositions = sum(a != b for a, b in zip(ms1, ms2)) // 2
    prefix = 0
    for a, b in zip(s1, s2):
        if a != b:
            break
        prefix += 1
    m = np.float32(matches)
    j = np.float32(
        (m / np.float32(len(s1)) + m / np.float32(len(s2))
         + (m - np.float32(transpositions)) / m)
    ) / np.float32(3)
    if j < threshold:
        return float(j)
    bonus = (
        min(np.float32(0.1), np.float32(1) / np.float32(len(mx)))
        * np.float32(prefix) * (np.float32(1) - j)
    )
    return float(np.float32(j + bonus))


def ngram_distance(source: str, target: str, n: int = 2) -> float:
    sl, tl = len(source), len(target)
    if sl == 0 or tl == 0:
        return 1.0 if sl == tl else 0.0
    if sl < n or tl < n:
        cost = sum(
            source[i] == target[i] for i in range(min(sl, tl))
        )
        return float(np.float32(cost) / np.float32(max(sl, tl)))
    sa = ["\x00"] * (n - 1) + list(source)
    p = np.arange(sl + 1, dtype=np.float32)
    d = np.zeros(sl + 1, dtype=np.float32)
    for j in range(1, tl + 1):
        if j < n:
            t_j = ["\x00"] * (n - j) + list(target[:j])
        else:
            t_j = list(target[j - n:j])
        d[0] = np.float32(j)
        for i in range(1, sl + 1):
            cost = 0
            tn = n
            for ni in range(n):
                if sa[i - 1 + ni] != t_j[ni]:
                    cost += 1
                elif sa[i - 1 + ni] == "\x00":
                    tn -= 1
            ec = np.float32(cost) / np.float32(tn)
            d[i] = min(np.float32(d[i - 1] + 1), np.float32(p[i] + 1),
                       np.float32(p[i - 1] + ec))
        p, d = d, p
    return float(np.float32(1.0) - p[sl] / np.float32(max(tl, sl)))
