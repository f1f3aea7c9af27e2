"""Competitive impacts: per-block (freq, norm) Pareto frontiers.

Reference: lucene/core/src/java/org/apache/lucene/codecs/
CompetitiveImpactAccumulator.java:71-144 — for each 128-doc postings
block, keep only the competitive (freq, norm) pairs: for every distinct
norm the max freq, then drop any pair dominated by a pair with a
smaller-or-equal norm and greater-or-equal freq.  Query-time block-max
scores (ImpactsDISI / MaxScoreCache, SURVEY.md §2.6) are the max BM25
score over this frontier.

Norm bytes are compared as unsigned 0..255 ints — int_to_byte4 is
monotonic in length, so a smaller byte is a shorter (better) document.
"""

from __future__ import annotations

import numpy as np

__all__ = ["competitive_impacts", "block_impacts", "max_scores_per_block"]


def competitive_impacts(freqs: np.ndarray, norms: np.ndarray) -> np.ndarray:
    """Pareto frontier of (freq, norm) pairs for one block.

    Returns int32[k, 2] sorted by norm asc (and freq strictly asc).
    """
    freqs = np.asarray(freqs, dtype=np.int64)
    norms = np.asarray(norms, dtype=np.int64) & 0xFF
    if freqs.size == 0:
        return np.empty((0, 2), dtype=np.int32)
    uniq_norms, inv = np.unique(norms, return_inverse=True)
    max_freq = np.zeros(len(uniq_norms), dtype=np.int64)
    np.maximum.at(max_freq, inv, freqs)
    # keep pairs whose freq strictly exceeds every smaller-norm freq
    prev_max = np.concatenate(([np.int64(-1)], np.maximum.accumulate(max_freq)[:-1]))
    keep = max_freq > prev_max
    out = np.stack([max_freq[keep], uniq_norms[keep]], axis=1)
    return out.astype(np.int32)


def block_impacts(
    freqs: np.ndarray, norms: np.ndarray, block_size: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-block frontiers for a full postings list.

    Returns (impacts_flat int32 interleaved (freq, norm) pairs,
    impacts_offsets int32[nb+1] pair-index boundaries per block).
    """
    n = len(freqs)
    parts: list[np.ndarray] = []
    offsets = [0]
    for start in range(0, max(n, 1), block_size):
        fr = competitive_impacts(freqs[start : start + block_size],
                                 norms[start : start + block_size])
        parts.append(fr.ravel())
        offsets.append(offsets[-1] + len(fr))
    flat = np.concatenate(parts) if parts else np.empty(0, dtype=np.int32)
    return flat.astype(np.int32), np.asarray(offsets, dtype=np.int32)


def max_scores_per_block(
    impacts_flat: np.ndarray, impacts_offsets: np.ndarray, scorer
) -> np.ndarray:
    """float32[nb] upper score bound per block (MaxScoreCache analog)."""
    pairs = np.asarray(impacts_flat, dtype=np.int64).reshape(-1, 2)
    nb = len(impacts_offsets) - 1
    if len(pairs) == 0:
        return np.zeros(nb, dtype=np.float32)
    scores = scorer.score(pairs[:, 0], pairs[:, 1])
    out = np.empty(nb, dtype=np.float32)
    for b in range(nb):
        s, e = int(impacts_offsets[b]), int(impacts_offsets[b + 1])
        out[b] = scores[s:e].max() if e > s else np.float32(0.0)
    return out
