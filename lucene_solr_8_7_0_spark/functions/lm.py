"""LMDirichletSimilarity — Bayesian-smoothed language-model scoring.

Reference: lucene/core/src/java/org/apache/lucene/search/similarities/
LMDirichletSimilarity.java:80-87 — ``score = boost * (log(1 + freq /
(mu * P)) + log(mu / (docLen + mu)))``, clamped at 0, computed in
DOUBLE and cast to float once (SimilarityBase.java:227-229), with
``P = (totalTermFreq + 1) / (sumTotalTermFreq + 1)`` — the default
collection model (LMSimilarity.java:154-156).  ``docLen`` is the
SmallFloat-decoded quantized length (SimilarityBase.getLengthValue).

Phrase/multi-term scoring follows SimilarityBase's MultiSimScorer
(SimilarityBase.java:209-232 via MultiSimilarity): one per-term scorer
each evaluated at the PHRASE frequency, summed — expressed here as
``SumScorer`` over the per-term LM scorers.

Block-max safety: the score is nondecreasing in freq and nonincreasing
in docLen, so the competitive-impact frontier's dominance order holds
and per-block maxima over the frontier remain safe upper bounds.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .smallfloat import LENGTH_TABLE

__all__ = [
    "LMDirichletScorer", "LMJelinekMercerScorer", "SumScorer",
    "make_lm_scorer", "DEFAULT_MU", "DEFAULT_LAMBDA",
]

DEFAULT_MU = 2000.0
DEFAULT_LAMBDA = 0.1  # LMJelinekMercerSimilarity title-query optimum


@dataclass
class LMDirichletScorer:
    boost: float
    mu: float
    p: float  # collection probability (ttf+1)/(sum_ttf+1), double

    @classmethod
    def create(cls, boost: float, ttf: int, sum_ttf: int,
               mu: float = DEFAULT_MU) -> "LMDirichletScorer":
        return cls(
            boost=float(boost), mu=float(mu),
            p=(ttf + 1.0) / (sum_ttf + 1.0),
        )

    def score(self, freqs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        dl = LENGTH_TABLE[
            np.asarray(norm_bytes, dtype=np.int64) & 0xFF
        ].astype(np.float64)
        f = np.asarray(freqs, dtype=np.float64)
        val = self.boost * (
            np.log1p(f / (self.mu * self.p)) + np.log(self.mu / (dl + self.mu))
        )
        return np.maximum(val, 0.0).astype(np.float32)

    def max_score(self, impacts: np.ndarray) -> np.float32:
        if impacts.size == 0:
            return np.float32(0.0)
        return np.float32(self.score(impacts[:, 0], impacts[:, 1]).max())


@dataclass
class LMJelinekMercerScorer:
    """LMJelinekMercerSimilarity.java:55-61 — ``score = boost *
    log(1 + ((1-λ) * freq / docLen) / (λ * P))`` with the same
    collection model P as Dirichlet; always >= 0 (no clamp in the
    reference either), double math cast to float32 once
    (SimilarityBase.BasicSimScorer.score:227-229).  Nondecreasing in
    freq / nonincreasing in docLen -> block-max safe like Dirichlet."""

    boost: float
    lam: float
    p: float  # collection probability (ttf+1)/(sum_ttf+1), double

    @classmethod
    def create(cls, boost: float, ttf: int, sum_ttf: int,
               lam: float = DEFAULT_LAMBDA) -> "LMJelinekMercerScorer":
        return cls(
            boost=float(boost), lam=float(lam),
            p=(ttf + 1.0) / (sum_ttf + 1.0),
        )

    def score(self, freqs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        dl = LENGTH_TABLE[
            np.asarray(norm_bytes, dtype=np.int64) & 0xFF
        ].astype(np.float64)
        f = np.asarray(freqs, dtype=np.float64)
        val = self.boost * np.log1p(
            ((1.0 - self.lam) * f / dl) / (self.lam * self.p)
        )
        return val.astype(np.float32)

    def max_score(self, impacts: np.ndarray) -> np.float32:
        if impacts.size == 0:
            return np.float32(0.0)
        return np.float32(self.score(impacts[:, 0], impacts[:, 1]).max())


def make_lm_scorer(similarity: str, boost: float, ttf: int, sum_ttf: int):
    """The LM-family factory shared by planner and oracle: both models
    consume the collection language model (ttf, sum_ttf)."""
    if similarity == "lmjelinekmercer":
        return LMJelinekMercerScorer.create(boost, ttf, sum_ttf)
    return LMDirichletScorer.create(boost, ttf, sum_ttf)


_LM_FAMILY = ("lmdirichlet", "lmjelinekmercer")


@dataclass
class SumScorer:
    """MultiSimScorer analog: per-term scorers summed at the shared
    (phrase) frequency.  Sub-scores are float32 like the reference's
    per-SimScorer floats; the sum accumulates in float64 and casts once
    (the engine's established multi-clause accumulation rule)."""

    subs: tuple

    def score(self, freqs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        acc = np.zeros(len(np.asarray(freqs)), dtype=np.float64)
        for s in self.subs:
            acc += s.score(freqs, norm_bytes).astype(np.float64)
        return acc.astype(np.float32)

    def max_score(self, impacts: np.ndarray) -> np.float32:
        if impacts.size == 0:
            return np.float32(0.0)
        return np.float32(self.score(impacts[:, 0], impacts[:, 1]).max())
