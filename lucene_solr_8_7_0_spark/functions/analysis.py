"""Analysis chain: StandardAnalyzer-equivalent tokenization, vectorized.

Re-expresses the reference pipeline StandardTokenizer -> LowerCaseFilter
(empty stop set — the StandardAnalyzer() default, StandardAnalyzer.java:51-53)
as batch operations over pandas/numpy for use inside Arrow UDFs.  There is
no per-row Python in the hot path: regex extraction, length filtering and
lowercasing run as pandas C-level string kernels over whole Arrow batches.

Tokenizer semantics (UAX#29 word break subset, validated against the
reference's golden cases in
lucene/core/src/test/.../standard/TestStandardAnalyzer.java):

* a token is a maximal run of word characters (letters, digits, ``_`` —
  ``_`` is ExtendNumLet and joins runs),
* ``.`` / U+2019 join two digits (MidNumLet, WB11/12: ``21.35``,
  ``216.239.63.104``) and two letters (WB6/7),
* ``,`` / ``;`` join digits only (MidNum: ``4,600`` joins,
  ``dogs,chase,cats`` splits),
* ``'`` / ``:`` join letters only (Single_Quote / MidLetter:
  ``O'Reilly``),
* everything else (``-``, ``/``, whitespace, …) breaks,
* CJK ideographs are emitted one-per-token,
* tokens longer than ``max_token_length`` (default 255,
  StandardAnalyzer.java:39) are dropped from the stream but still
  consume a position and do NOT count toward the field length
  (StandardTokenizer.java:152-175: the over-long token never reaches
  the indexing chain, so FieldInvertState.length is not incremented,
  while the position increment accumulates).

Position semantics: with the empty stop set, the position of the i-th
*scanned* token is i (0-based); dropped over-long tokens leave holes.
"""

from __future__ import annotations

import re
from typing import NamedTuple

import numpy as np
import pandas as pd

__all__ = [
    "TokenBatch",
    "analyze_batch",
    "jvm_token_array",
    "tokenize_text",
    "ANALYZERS",
]

_HAN = "⺀-⿿㐀-䶿一-鿿豈-﫿"
# Katakana (incl. phonetic extensions + halfwidth forms) has its own
# UAX#29 word-break class: runs of katakana form one token (WB13) and
# never join adjacent Latin (StandardTokenizerImpl KATAKANA type).
# The class is \p{WB:Katakana}: kana repeat marks 3031..3035, sound
# marks 309B..309C, 30A0..30FA + 30FC..30FF (U+30FB KATAKANA MIDDLE
# DOT is Word_Break=MidLetter, NOT Katakana \u2014 it must break katakana
# runs: '\u30a2\u30a2\u30fb\u30a4\u30a4' -> ['\u30a2\u30a2','\u30a4\u30a4']), phonetic extensions, and the
# halfwidth forms FF66..FF9F (incl. the FF9E..FF9F sound marks).
_KATA = (
    "\u3031-\u3035\u309b-\u309c\u30a0-\u30fa\u30fc-\u30ff"
    "\u31f0-\u31ff\uff66-\uff9f"
)
# Hiragana is emitted ONE CHARACTER PER TOKEN, like ideographs
# (StandardTokenizerImpl HIRAGANA type / TestStandardAnalyzer golden
# cases); Hangul stays an ALetter (joins like Latin) per UAX#29.
# Trimmed to Script:Hiragana (3041..3096 + 309D..309F): 3097..309C
# are unassigned or Script:Inherited/Common sound marks (the spacing
# marks 309B..309C belong to the Katakana word-break class above).
_HIRA = "\u3041-\u3096\u309d-\u309f"
_CJK = _HAN + _KATA + _HIRA
_W = rf"(?:(?![{_CJK}])\w)"  # word char excluding the CJK classes above

# Unit = word-char run; joiners per UAX#29 WB6/7 (letters), WB11/12
# (digits).  U+30FB KATAKANA MIDDLE DOT is MidLetter: it joins ALetter
# runs only (never katakana), exactly like ':'.
STANDARD_TOKEN_PATTERN = (
    rf"(?:[{_KATA}]+)"
    rf"|(?:[{_HAN}{_HIRA}])"
    rf"|(?:{_W}+"
    rf"(?:(?:(?<=\d)[.,;’](?=\d)|(?<=[^\W\d_])[.':’・](?=[^\W\d_]))"
    rf"{_W}+)*)"
)
STANDARD_TOKEN_RE = re.compile(STANDARD_TOKEN_PATTERN, re.UNICODE)

# "simple" analyzer: lowercase first, then extract [a-z0-9_]+ runs.
# Deliberately expressible in one line of ANSI SQL
# (regexp_extract_all(lower(text), '[a-z0-9_]+')) so that external SQL
# oracles (DuckDB) can replay it exactly.
SIMPLE_TOKEN_RE = re.compile(r"[a-z0-9_]+")

ANALYZERS = {"standard": "standard", "simple": "simple"}


def jvm_token_array(content_col: str, analyzer: str):
    """Tokenization as a JVM Column (array<string>) — whole-stage
    codegen, zero Python.  This is the hot-path tokenizer: Python
    workers pay the VM's serialized allocation path per batch, while
    the JVM regex scales across executor threads.

    Parity contract with analyze_batch (asserted by tests on golden +
    randomized corpora): 'simple' lowers then extracts [a-z0-9_]+;
    'standard' runs the same UAX#29-subset pattern under Java regex
    with (?U) (UNICODE_CHARACTER_CLASS makes \\w match Python's) and
    returns RAW (un-lowered) tokens — the caller lowercases AFTER the
    max-token-length filter, exactly like the Python chain measures
    length pre-lowercase."""
    from pyspark.sql import functions as F

    if analyzer == "simple":
        return F.regexp_extract_all(
            F.lower(F.col(content_col)), F.lit(SIMPLE_TOKEN_RE.pattern), F.lit(0)
        )
    if analyzer == "standard":
        return F.regexp_extract_all(
            F.col(content_col), F.lit("(?U)" + STANDARD_TOKEN_PATTERN), F.lit(0)
        )
    raise ValueError(f"unknown analyzer {analyzer!r}")


class TokenBatch(NamedTuple):
    """Flat, columnar view of the tokens of a batch of documents."""

    doc_idx: np.ndarray      # int64, index into the input batch, one per kept token
    terms: pd.Series         # str, analyzed (lowercased) kept tokens
    positions: np.ndarray    # int32, token position within its doc (holes at dropped tokens)
    doc_lengths: np.ndarray  # int64, per input doc: number of KEPT tokens (the norm length)


def _extract(texts: pd.Series, analyzer: str) -> pd.Series:
    texts = texts.fillna("")
    if analyzer == "simple":
        return texts.str.lower().str.findall(SIMPLE_TOKEN_RE)
    if analyzer == "standard":
        return texts.str.findall(STANDARD_TOKEN_RE)
    raise ValueError(f"unknown analyzer {analyzer!r}")


def analyze_batch(
    texts: pd.Series,
    analyzer: str = "standard",
    max_token_length: int = 255,
    stopwords=(),
) -> TokenBatch:
    """Tokenize a batch of documents into flat columnar token arrays.

    ``stopwords``: StopFilter with Lucene's position-hole semantics
    (StopFilter.java:28,106 via FilteringTokenFilter: the removed
    token's position increment accumulates onto the next kept token, so
    phrases never match "across" a stopword at slop 0); stopped tokens
    do not reach the indexing chain, so they don't count toward the
    field length.  Filtering runs AFTER LowerCaseFilter, matching
    StandardAnalyzer's chain order."""
    n = len(texts)
    token_lists = _extract(texts, analyzer)
    counts = token_lists.str.len().to_numpy(dtype=np.int64)
    total = int(counts.sum())
    if total == 0:
        return TokenBatch(
            np.empty(0, np.int64),
            pd.Series([], dtype=object),
            np.empty(0, np.int32),
            np.zeros(n, np.int64),
        )
    flat = pd.Series(
        [t for lst in token_lists for t in lst], dtype=object, copy=False
    )
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
    positions = (np.arange(total, dtype=np.int64) - np.repeat(offsets, counts)).astype(
        np.int32
    )
    # Over-long tokens: dropped, position-consuming, not length-counted.
    keep = (flat.str.len() <= max_token_length).to_numpy(dtype=bool)
    if analyzer == "standard":
        flat = flat.str.lower()
    if stopwords:
        keep &= ~flat.isin(frozenset(stopwords)).to_numpy(dtype=bool)
    if not keep.all():
        flat = flat[keep].reset_index(drop=True)
        doc_idx = doc_idx[keep]
        positions = positions[keep]
    doc_lengths = np.bincount(doc_idx, minlength=n).astype(np.int64)
    return TokenBatch(doc_idx, flat, positions, doc_lengths)


def tokenize_text(
    text: str, analyzer: str = "standard", max_token_length: int = 255,
    stopwords=(),
) -> list[str]:
    """Convenience scalar path (query analysis, tests)."""
    batch = analyze_batch(pd.Series([text]), analyzer, max_token_length, stopwords)
    return batch.terms.tolist()
