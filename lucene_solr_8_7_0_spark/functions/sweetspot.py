"""SweetSpotSimilarity + PerFieldSimilarityWrapper analogs.

SweetSpot (lucene/misc/src/java/org/apache/lucene/misc/
SweetSpotSimilarity.java:39-205) extends ClassicSimilarity with

* a *plateau* lengthNorm (:116-133)::

      1 / sqrt(steepness * (|x-min| + |x-max| - (max-min)) + 1)

  — every length in [min, max] norms to exactly 1.0, lengths outside
  degrade by sqrt; with min = max = 1, steep = 0.5 it degenerates to
  ClassicSimilarity's 1/sqrt(x).
* ``baselineTf`` (:158-165): ``freq <= min ? base :
  sqrt(freq + base^2 - min)`` with a hard 0 at freq 0 — degenerates to
  sqrt(freq) at base = min = 0.
* ``hyperbolicTf`` (:182-205): ``min + (max-min)/2 * (tanh_base(x -
  xoffset) + 1)`` — a hard ceiling at ``max``.

Like ClassicSimilarity, the norm BYTE on disk is just the SmallFloat-
encoded field length (TFIDFSimilarity.computeNorm), so the plateau is
purely a query-time norm-table swap: we rebuild the 256-entry table
(TFIDFSimilarity.java:519-525, including the ``normTable[0] =
1/normTable[255]`` quirk) from the SweetSpot lengthNorm and reuse the
whole Classic scoring chassis (functions/tfidf.py).

Block-max safety: the plateau norm is NOT monotone in document length
(short docs below ``ln_min`` score *lower* than plateau docs), so the
competitive-impact frontier — which keeps only (freq, shortest-doc)
pairs — is not a safe score bound here.  ``max_score`` therefore bounds
with the best possible norm over the WHOLE table at the frontier's max
freq: looser, never wrong, and the pruned kernels stay bitwise equal to
exhaustive scoring (asserted in tests/test_sweetspot.py).

PerFieldSimilarityWrapper (L/search/similarities/
PerFieldSimilarityWrapper.java:28-62) routes ``get(field)`` per scored
field.  This engine scores one postings field ("content" — metadata
fields are constant-score StringField/Point analogs), so the wrapper
resolves once at weight-binding time: spec ``perfield:content=X,
default=Y`` binds X's scorer chassis for the content field and keeps Y
as the default for any other (hypothetical) scored field.  Sub-spec
colons are spelled ``|`` (``perfield:content=dfr|in|l|h1,default=bm25``)
so the outer parser stays trivial.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from .smallfloat import LENGTH_TABLE

__all__ = [
    "is_sweetspot",
    "make_sweetspot_scorer",
    "resolve_per_field",
    "SweetSpotScorer",
]


def is_sweetspot(spec: str) -> bool:
    return spec == "sweetspot" or spec.startswith("sweetspot:")


def _parse(spec: str):
    """``sweetspot[:ln_min:ln_max:steep[:hyper | :tfb:<base>:<min>]]``.

    Defaults mirror the reference's field defaults
    (SweetSpotSimilarity.java:41-51): ln 1..1 steep 0.5, baseline tf
    base 0 min 0 (== ClassicSimilarity), hyperbolic 0..2 base 1.3
    xoffset 10.
    """
    parts = spec.split(":")
    if parts[0] != "sweetspot":
        raise ValueError(f"not a sweetspot spec: {spec!r}")
    ln_min, ln_max, steep = 1, 1, 0.5
    tf_mode = "baseline"
    tf_base, tf_min = 0.0, 0.0
    rest = parts[1:]
    if len(rest) >= 3:
        ln_min, ln_max, steep = int(rest[0]), int(rest[1]), float(rest[2])
        rest = rest[3:]
    elif rest:
        raise ValueError(f"sweetspot spec needs ln_min:ln_max:steep: {spec!r}")
    if rest:
        if rest[0] == "hyper" and len(rest) == 1:
            tf_mode = "hyper"
        elif rest[0] == "tfb" and len(rest) == 3:
            tf_base, tf_min = float(rest[1]), float(rest[2])
        else:
            raise ValueError(f"bad sweetspot tf suffix: {spec!r}")
    return ln_min, ln_max, steep, tf_mode, tf_base, tf_min


_TABLE_CACHE: dict[tuple, np.ndarray] = {}


def _norm_table(ln_min: int, ln_max: int, steep: float) -> np.ndarray:
    """float32[256]: table[i] = lengthNorm(byte4ToInt(i)) with the
    reference's table[0] = 1/table[255] quirk (TFIDFSimilarity.java:
    519-525; lengthNorm per SweetSpotSimilarity.java:116-133, float
    arithmetic inside, final float cast of the double sqrt)."""
    key = (ln_min, ln_max, steep)
    t = _TABLE_CACHE.get(key)
    if t is not None:
        return t
    lengths = LENGTH_TABLE.astype(np.float64)[1:]
    # s * (float)(|x-l| + |x-h| - (h-l)) + 1.0f  — the inner abs-sum is
    # integer-exact at these magnitudes; steep multiply in float32
    inner = (np.abs(lengths - ln_min) + np.abs(lengths - ln_max)
             - (ln_max - ln_min)).astype(np.float32)
    denom = (np.float32(steep) * inner).astype(np.float32) + np.float32(1.0)
    table = np.zeros(256, dtype=np.float32)
    table[1:] = (1.0 / np.sqrt(denom.astype(np.float64))).astype(np.float32)
    table[0] = np.float32(np.float32(1.0) / table[255])
    _TABLE_CACHE[key] = table
    return table


@dataclass
class SweetSpotScorer:
    """Classic-chassis scorer with SweetSpot tf + plateau norm table.

    score = tf(freq) * (boost * idf) * normTable[norm & 0xFF], float32
    in the Java order (TFIDFSimilarity.java:548-551)."""

    weight: np.float32
    norm_table: np.ndarray
    tf_mode: str
    tf_base: np.float32
    tf_min: np.float32

    @classmethod
    def create(cls, spec: str, boost: float, idf_value: np.float32):
        ln_min, ln_max, steep, tf_mode, tf_base, tf_min = _parse(spec)
        weight = np.float32(np.float32(boost) * np.float32(idf_value))
        return cls(weight=weight, norm_table=_norm_table(ln_min, ln_max, steep),
                   tf_mode=tf_mode, tf_base=np.float32(tf_base),
                   tf_min=np.float32(tf_min))

    # -- tf functions (SweetSpotSimilarity.java:158-205) --

    def _tf(self, freqs: np.ndarray) -> np.ndarray:
        f = np.asarray(freqs, dtype=np.float32)
        if self.tf_mode == "hyper":
            # all-double tanh form, final float cast; NaN (huge |x|
            # with base**x inf/inf) -> max  (:182-204)
            x = f.astype(np.float64) - 10.0
            bx = np.power(1.3, x)
            bnx = np.power(1.3, -x)
            with np.errstate(invalid="ignore"):
                res = 0.0 + (2.0 - 0.0) / 2.0 * ((bx - bnx) / (bx + bnx) + 1.0)
            out = res.astype(np.float32)
            out[np.isnan(out)] = np.float32(2.0)
            out[f == 0] = np.float32(0.0)
            return out
        # baselineTf: inner sum in float32, sqrt in double, cast back
        inner = (f + self.tf_base * self.tf_base - self.tf_min).astype(
            np.float32)
        out = np.sqrt(inner.astype(np.float64)).astype(np.float32)
        out = np.where(f <= self.tf_min, self.tf_base, out)
        out[f == 0] = np.float32(0.0)
        return out

    def score(self, freqs: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        raw = (self._tf(freqs) * self.weight).astype(np.float32)
        norm = self.norm_table[np.asarray(norm_bytes, dtype=np.int64) & 0xFF]
        return (raw * norm).astype(np.float32)

    def max_score(self, impacts: np.ndarray) -> np.float32:
        """Safe bound under a NON-monotone-in-length norm: the frontier
        only dominates on (freq up, length down), so score the max
        frontier freq against the best norm in the whole table."""
        if impacts.size == 0:
            return np.float32(0.0)
        max_freq = np.asarray(impacts[:, 0]).max()
        tf = self._tf(np.array([max_freq]))[0]
        best_norm = np.float32(self.norm_table.max())
        return np.float32(np.float32(tf * self.weight) * best_norm)


def make_sweetspot_scorer(spec: str, boost: float,
                          idf_value: np.float32) -> SweetSpotScorer:
    return SweetSpotScorer.create(spec, boost, idf_value)


def resolve_per_field(spec: str, field: str = "content") -> str:
    """PerFieldSimilarityWrapper.get(field) at weight-binding time:
    ``perfield:content=dfr|in|l|h1,default=bm25`` -> the entry for
    ``field``, else the ``default`` entry (required).  ``|`` stands for
    ``:`` inside sub-specs."""
    if not spec.startswith("perfield:"):
        return spec
    entries: dict[str, str] = {}
    for part in spec[len("perfield:"):].split(","):
        if not part:
            continue
        name, _, sub = part.partition("=")
        if not sub:
            raise ValueError(f"bad perfield entry {part!r} in {spec!r}")
        entries[name.strip()] = sub.strip().replace("|", ":")
    if field in entries:
        return entries[field]
    if "default" not in entries:
        raise ValueError(f"perfield spec has no default: {spec!r}")
    return entries["default"]
