"""Float32-exact BM25 scoring, ported operation-for-operation.

Reference: lucene/core/src/java/org/apache/lucene/search/similarities/
BM25Similarity.java — idf (:69-72), avgFieldLength (:81-83), the
256-entry norm-inverse cache (:189-193) and the rewritten score form
``weight - weight / (1 + freq * 1/norm)`` (:222-235).  Every operation
is performed in numpy float32 in the same order as the Java code, so
scores are bit-identical and rank ties resolve identically.

Multi-clause accumulation: Lucene sums per-clause float scores in a
``double`` and casts the total to float (WANDScorer.java:466-474,
ConjunctionScorer / DisjunctionSumScorer) — mirrored here as a float64
sum cast to float32.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from .smallfloat import LENGTH_TABLE

__all__ = ["idf", "avg_field_length", "BM25Scorer", "sum_scores_f32"]


def idf(doc_freq: int, doc_count: int) -> np.float32:
    """``(float) log(1 + (docCount - docFreq + 0.5) / (docFreq + 0.5))``.

    Computed in float64 then cast, as in BM25Similarity.java:69-72.
    """
    return np.float32(math.log(1.0 + (doc_count - doc_freq + 0.5) / (doc_freq + 0.5)))


def avg_field_length(sum_total_term_freq: int, doc_count: int) -> np.float32:
    """``(float) (sumTotalTermFreq / (double) docCount)`` (:81-83)."""
    return np.float32(sum_total_term_freq / float(doc_count))


@dataclass
class BM25Scorer:
    """One bound (term|phrase) scorer == the reference's BM25Scorer SimScorer.

    ``cache[b] = 1f / (k1 * ((1 - b) + b * LENGTH_TABLE[b] / avgdl))``
    with every intermediate in float32 (BM25Similarity.java:189-193);
    ``weight = boost * idf`` in float32 (:218).
    """

    weight: np.float32
    cache: np.ndarray  # float32[256] norm-inverse table

    @classmethod
    def create(
        cls,
        boost: float,
        k1: float,
        b: float,
        idf_value: np.float32,
        avgdl: np.float32,
    ) -> "BM25Scorer":
        k1f = np.float32(k1)
        bf = np.float32(b)
        one = np.float32(1.0)
        cache = one / (k1f * ((one - bf) + bf * LENGTH_TABLE / np.float32(avgdl)))
        cache = cache.astype(np.float32)
        weight = np.float32(np.float32(boost) * np.float32(idf_value))
        return cls(weight=weight, cache=cache)

    def score(self, freqs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        """Vectorized ``weight - weight / (1 + freq * normInverse)`` (:233-234).

        ``freqs``: int/float array; ``norm_bytes``: unsigned 0..255 ints.
        Returns float32 scores.
        """
        norm_inv = self.cache[np.asarray(norm_bytes, dtype=np.int64) & 0xFF]
        f = np.asarray(freqs, dtype=np.float32)
        one = np.float32(1.0)
        return (self.weight - self.weight / (one + f * norm_inv)).astype(np.float32)

    def max_score(self, impacts: np.ndarray) -> np.float32:
        """Upper score bound from an (freq, norm) impact pair array (k,2).

        The per-block max is the max score over the competitive impact
        frontier — MaxScoreCache.computeMaxScore semantics.
        """
        if impacts.size == 0:
            return np.float32(0.0)
        s = self.score(impacts[:, 0], impacts[:, 1])
        return np.float32(s.max())


@dataclass
class BooleanSimScorer:
    """BooleanSimilarity (L/search/similarities/BooleanSimilarity.java:
    35-47): every match scores exactly the query boost — no tf, no
    idf, no length normalization."""

    weight: np.float32

    @classmethod
    def create(cls, boost: float) -> "BooleanSimScorer":
        return cls(weight=np.float32(boost))

    def score(self, freqs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        return np.full(len(np.asarray(freqs)), self.weight, dtype=np.float32)

    def max_score(self, impacts: np.ndarray) -> np.float32:
        return self.weight


def sum_scores_f32(per_clause: list[np.ndarray]) -> np.ndarray:
    """Sum aligned per-clause float32 score arrays the way Lucene does:
    accumulate in float64, cast the result to float32."""
    if len(per_clause) == 1:
        return per_clause[0].astype(np.float32)
    acc = np.zeros(len(per_clause[0]), dtype=np.float64)
    for s in per_clause:
        acc += s.astype(np.float64)
    return acc.astype(np.float32)
