"""Float32-exact ClassicSimilarity (TF-IDF) scoring.

Reference: lucene/core/src/java/org/apache/lucene/search/similarities/
TFIDFSimilarity.java:515-553 + ClassicSimilarity.java:29-64 —
``tf = (float) sqrt(freq)`` (ClassicSimilarity.java:44-46), ``idf =
(float)(log((docCount+1)/(docFreq+1)) + 1)`` (:61-63), ``lengthNorm =
(float)(1/sqrt(numTerms))`` (:38-40), and the scorer's 256-entry norm
table over the SmallFloat-decoded lengths with the reference's
``normTable[0] = 1f / normTable[255]`` quirk (TFIDFSimilarity.java:
519-525).  ``score = tf(freq) * (boost * idf) * normTable[norm]``
(:548-551), every operation in float32 in the Java order, so ranks
(and their ties) are identical.

The same ``score(freqs, norm_bytes)`` interface as BM25Scorer lets the
classic scorer ride every kernel unchanged — including block-max
pruning: the competitive-impact frontier's dominance order (more freq,
shorter doc ==> higher score) holds for TF-IDF exactly as for BM25, so
the per-block max over the frontier is still a safe upper bound.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from .smallfloat import LENGTH_TABLE

__all__ = ["classic_idf", "TFIDFScorer"]


def classic_idf(doc_freq: int, doc_count: int) -> np.float32:
    """``(float)(log((docCount+1)/(docFreq+1)) + 1.0)``
    (ClassicSimilarity.java:61-63), computed in float64 then cast."""
    return np.float32(math.log((doc_count + 1) / float(doc_freq + 1)) + 1.0)


def _norm_table() -> np.ndarray:
    """float32[256]: normTable[i] = lengthNorm(byte4ToInt(i)) for i>=1,
    normTable[0] = 1/normTable[255] (TFIDFSimilarity.java:519-525)."""
    lengths = LENGTH_TABLE.astype(np.float64)
    table = np.zeros(256, dtype=np.float32)
    table[1:] = (1.0 / np.sqrt(lengths[1:])).astype(np.float32)
    table[0] = np.float32(np.float32(1.0) / table[255])
    return table


_NORM_TABLE = _norm_table()


@dataclass
class TFIDFScorer:
    """One bound classic-similarity scorer (TFIDFScorer SimScorer)."""

    weight: np.float32          # queryWeight = boost * idf (float32)
    norm_table: np.ndarray      # float32[256]

    @classmethod
    def create(cls, boost: float, idf_value: np.float32) -> "TFIDFScorer":
        weight = np.float32(np.float32(boost) * np.float32(idf_value))
        return cls(weight=weight, norm_table=_NORM_TABLE)

    def score(self, freqs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        """``raw = tf(freq) * queryWeight; raw * normTable[norm & 0xFF]``
        (TFIDFSimilarity.java:548-551), vectorized float32."""
        tf = np.sqrt(np.asarray(freqs, dtype=np.float64)).astype(np.float32)
        raw = (tf * self.weight).astype(np.float32)
        norm = self.norm_table[np.asarray(norm_bytes, dtype=np.int64) & 0xFF]
        return (raw * norm).astype(np.float32)

    def max_score(self, impacts: np.ndarray) -> np.float32:
        if impacts.size == 0:
            return np.float32(0.0)
        s = self.score(impacts[:, 0], impacts[:, 1])
        return np.float32(s.max())
