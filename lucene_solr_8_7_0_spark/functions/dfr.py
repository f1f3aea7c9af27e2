"""SimilarityBase family — DFR, IB, and DFI scoring models.

Reference: lucene/core/src/java/org/apache/lucene/search/similarities/
— SimilarityBase.java:215-231 (BasicSimScorer: double math over the
SmallFloat-decoded length, ONE float cast), fillBasicStats:176-188
(N = docCount, T = sumTotalTermFreq, avgfl = T / N in double),
DFRSimilarity.java (score = boost * basicModel(tfn, aeTimes1pTfn)),
IBSimilarity.java (score = boost * distribution(tfn, lambda)),
DFISimilarity.java (expected = (F+1)*docLen/(T+1); 0 when freq <=
expected; boost * log2(independence + 1)).

Components (each a literal transcription, file:line in the dispatch):
  basic models   BasicModelG/IF/In/Ine.java
  after effects  AfterEffectB.java ((F+2)/(n+1)), AfterEffectL.java (1)
  normalizations NormalizationH1/H2/H3/Z.java + "none"
  distributions  DistributionLL/SPL.java
  lambdas        LambdaDF/TTF.java (FLOAT-precision like the reference)
  independences  IndependenceChiSquared/Saturated/Standardized.java

The engine selects a model with a similarity STRING spec:
  "dfr"                 -> G : B : H2      (c=1)
  "dfr:IF:L:H1"         -> any {G,IF,IN,INE} : {B,L} : {H1,H2,H3,Z,NONE}
  "ib"                  -> SPL : DF : H2
  "ib:LL:TTF:H1"        -> any {LL,SPL} : {DF,TTF} : normalization
  "dfi"                 -> ChiSquared
  "dfi:saturated" / "dfi:standardized"
  "ax"                  -> F2EXP     (Axiomatic.java defaults
  "ax:f1exp|f1log|f2exp|f2log|f3exp|f3log"  s=0.25, queryLen=1, k=0.35)

Block-max safety: every component keeps the score nondecreasing in
freq (the reference rewrites each basic model to guarantee exactly
this, see BasicModelG.java comments) and nonincreasing in docLen, so
per-block maxima over the competitive-impact frontier remain safe
upper bounds — the same argument as the LM scorers (functions/lm.py).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from .smallfloat import LENGTH_TABLE

__all__ = ["SimilarityBaseScorer", "make_sb_scorer", "is_similarity_base"]

_LOG2 = math.log(2.0)


def _log2(x):
    return np.log(x) / _LOG2  # SimilarityBase.log2


# ---- normalizations: tfn(tf, len) ----

def _tfn(norm_name: str, tf, dl, avgfl: float, ttf: int, T: int):
    if norm_name == "h1":  # NormalizationH1: tf * c * (avgfl / fl)
        return tf * 1.0 * (avgfl / dl)
    if norm_name == "h2":  # NormalizationH2: tf * log2(1 + c*avgfl/fl)
        return tf * _log2(1.0 + 1.0 * avgfl / dl)
    if norm_name == "h3":  # NormalizationH3 (mu=800):
        # (tf + mu*((F+1)/(T+1))) / (fl + mu) * mu — F/T in FLOAT like
        # the reference's (totalTermFreq()+1F)/(numberOfFieldTokens()+1F)
        mu = 800.0
        model = np.float32(ttf + 1.0) / np.float32(T + 1.0)
        return (tf + mu * float(model)) / (dl + mu) * mu
    if norm_name == "z":  # NormalizationZ (z=0.30): tf * (avgfl/fl)^z
        return tf * np.power(avgfl / dl, 0.30000001192092896)  # 0.30F
    if norm_name == "none":  # Normalization.NoNormalization
        return tf
    raise ValueError(f"unknown normalization {norm_name!r}")


# ---- DFR basic models: score(tfn, aeTimes1pTfn) ----

def _basic_model(name: str, tfn, ae, N: int, df: int, ttf: int):
    if name == "g":  # BasicModelG.java:31-46
        F = ttf + 1.0
        lam = F / (N + F)
        A = math.log(lam + 1.0) / _LOG2
        B = math.log((1.0 + lam) / lam) / _LOG2
        return (B - (B - A) / (1.0 + tfn)) * ae
    if name == "if":  # BasicModelIF.java:30-41
        A = math.log(1.0 + (N + 1.0) / (ttf + 0.5)) / _LOG2
        return A * ae * (1.0 - 1.0 / (1.0 + tfn))
    if name == "in":  # BasicModelIn.java:29-40
        A = math.log((N + 1.0) / (df + 0.5)) / _LOG2
        return A * ae * (1.0 - 1.0 / (1.0 + tfn))
    if name == "ine":  # BasicModelIne.java:30-42
        ne = N * (1.0 - math.pow((N - 1.0) / float(N), ttf))
        A = math.log((N + 1.0) / (ne + 0.5)) / _LOG2
        return A * ae * (1.0 - 1.0 / (1.0 + tfn))
    raise ValueError(f"unknown basic model {name!r}")


def _after_effect(name: str, df: int, ttf: int) -> float:
    if name == "b":  # AfterEffectB: (F+1)/n with F=ttf+1, n=df+1
        return (ttf + 2.0) / (df + 1.0)
    if name == "l":  # AfterEffectL: 1
        return 1.0
    raise ValueError(f"unknown after effect {name!r}")


# ---- IB distributions / lambdas ----

def _ib_lambda(name: str, N: int, df: int, ttf: int) -> float:
    # LambdaDF/TTF compute in FLOAT and nudge away from exactly 1
    if name == "df":
        lam = np.float32((df + 1.0) / (N + 1.0))
        if lam == 1.0:
            lam = np.nextafter(lam, np.float32(0.0))
        return float(lam)
    if name == "ttf":
        lam = np.float32((ttf + 1.0) / (N + 1.0))
        if lam == 1.0:
            lam = np.nextafter(lam, np.float32(2.0))
        return float(lam)
    raise ValueError(f"unknown lambda {name!r}")


def _distribution(name: str, tfn, lam: float):
    if name == "ll":  # DistributionLL: -log(lambda / (tfn + lambda))
        return -np.log(lam / (tfn + lam))
    if name == "spl":  # DistributionSPL.java:30-53
        q = 1.0 - 1.0 / (tfn + 1.0)
        q = np.where(q == 1.0, np.nextafter(1.0, 0.0), q)
        pow_ = np.power(lam, q)
        # enforce pow != lambda (float rounding guard of the reference)
        bump = (np.nextafter(lam, 2.0) if lam < 1.0
                else np.nextafter(lam, 0.0))
        pow_ = np.where(pow_ == lam, bump, pow_)
        return -np.log((pow_ - lam) / (1.0 - lam))
    raise ValueError(f"unknown distribution {name!r}")


# ---- Axiomatic family (Axiomatic.java:104-113: score = max(0,
# boost * (tf * ln * tfln * idf - gamma)); defaults s=0.25f,
# queryLen=1, k=0.35f from the no-arg constructors) ----

_AX_S = 0.25
_AX_K = 0.3499999940395355  # 0.35f
_AX_QLEN = 1.0


def _axiomatic(variant: str, f, dl, avgfl: float, N: int, df: int):
    one = np.ones_like(f)
    if variant in ("f1exp", "f1log", "f3exp", "f3log"):
        tf = 1.0 + np.log(1.0 + np.log(f))  # AxiomaticF1EXP.tf:55-58
    else:
        tf = one
    if variant in ("f1exp", "f1log"):
        # AxiomaticF1EXP.ln: (avgfl + s) / (avgfl + dl * s)
        ln_ = (avgfl + _AX_S) / (avgfl + dl * _AX_S)
    else:
        ln_ = one
    if variant in ("f2exp", "f2log"):
        # AxiomaticF2EXP.tfln: freq / (freq + s + s * dl / avgfl)
        tfln = f / (f + _AX_S + _AX_S * dl / avgfl)
    else:
        tfln = one
    if variant.endswith("exp"):
        idf_ = math.pow((N + 1.0) / df, _AX_K) if df > 0 else math.inf
    else:
        idf_ = math.log((N + 1.0) / df) if df > 0 else math.inf
    if variant in ("f3exp", "f3log"):
        # AxiomaticF3EXP.gamma: (dl - queryLen) * s * queryLen / avgfl
        gamma = (dl - _AX_QLEN) * _AX_S * _AX_QLEN / avgfl
    else:
        gamma = 0.0
    return tf * ln_ * tfln * idf_ - gamma


def _independence(name: str, freq, expected):
    if name == "chisquared":
        return (freq - expected) * (freq - expected) / expected
    if name == "saturated":
        return (freq - expected) / expected
    if name == "standardized":
        return (freq - expected) / np.sqrt(expected)
    raise ValueError(f"unknown independence {name!r}")


@dataclass
class SimilarityBaseScorer:
    """One bound per-term SimScorer of the SimilarityBase family."""

    boost: float
    family: str  # "dfr" | "ib" | "dfi"
    parts: tuple  # family-specific component names (lowercase)
    n_docs: int
    sum_ttf: int
    avgfl: float
    df: int
    ttf: int

    def score(self, freqs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        dl = LENGTH_TABLE[
            np.asarray(norm_bytes, dtype=np.int64) & 0xFF
        ].astype(np.float64)
        f = np.asarray(freqs, dtype=np.float64)
        if self.family == "dfr":
            basic, ae, norm = self.parts
            tfn = _tfn(norm, f, dl, self.avgfl, self.ttf, self.sum_ttf)
            aev = _after_effect(ae, self.df, self.ttf)
            val = self.boost * _basic_model(
                basic, tfn, aev, self.n_docs, self.df, self.ttf
            )
        elif self.family == "ib":
            dist, lam_name, norm = self.parts
            tfn = _tfn(norm, f, dl, self.avgfl, self.ttf, self.sum_ttf)
            lam = _ib_lambda(lam_name, self.n_docs, self.df, self.ttf)
            val = self.boost * _distribution(dist, tfn, lam)
        elif self.family == "ax":
            (variant,) = self.parts
            raw = _axiomatic(variant, f, dl, self.avgfl, self.n_docs, self.df)
            # boost multiplies BEFORE the clamp (Axiomatic.java:110-112)
            val = np.maximum(0.0, raw * self.boost)
        else:  # dfi
            (indep,) = self.parts
            expected = (self.ttf + 1.0) * dl / (self.sum_ttf + 1.0)
            # the log only applies where freq > expected (measure > 0);
            # masked lanes may compute log of a non-positive value
            with np.errstate(invalid="ignore", divide="ignore"):
                measure = _independence(indep, f, expected)
                val = np.where(
                    f <= expected, 0.0, self.boost * _log2(measure + 1.0)
                )
        return np.asarray(val, dtype=np.float64).astype(np.float32)

    def max_score(self, impacts: np.ndarray) -> np.float32:
        if impacts.size == 0:
            return np.float32(0.0)
        return np.float32(self.score(impacts[:, 0], impacts[:, 1]).max())


_DEFAULTS = {
    "dfr": ("g", "b", "h2"),
    "ib": ("spl", "df", "h2"),
    "dfi": ("chisquared",),
    "ax": ("f2exp",),
}

_AX_VARIANTS = ("f1exp", "f1log", "f2exp", "f2log", "f3exp", "f3log")


def is_similarity_base(spec: str) -> bool:
    return spec.split(":", 1)[0] in _DEFAULTS


def make_sb_scorer(spec: str, boost: float, df: int, ttf: int,
                   doc_count: int, sum_ttf: int) -> SimilarityBaseScorer:
    """Parse a similarity spec ("dfr[:basic:ae:norm]", "ib[:dist:
    lambda:norm]", "dfi[:independence]") and bind term statistics the
    way fillBasicStats does (SimilarityBase.java:176-188)."""
    toks = [t.lower() for t in spec.split(":")]
    family, rest = toks[0], tuple(toks[1:])
    parts = rest or _DEFAULTS[family]
    if len(parts) != len(_DEFAULTS[family]):
        raise ValueError(f"bad similarity spec {spec!r}")
    if family == "ax" and parts[0] not in _AX_VARIANTS:
        raise ValueError(f"unknown axiomatic variant {parts[0]!r}")
    n = max(doc_count, 1)
    scorer = SimilarityBaseScorer(
        boost=float(boost), family=family, parts=parts,
        n_docs=n, sum_ttf=sum_ttf,
        avgfl=(sum_ttf / float(n)) if sum_ttf > 0 else 1.0,
        df=df, ttf=ttf,
    )
    scorer.score(np.array([1.0]), np.array([255]))  # validate components
    return scorer
