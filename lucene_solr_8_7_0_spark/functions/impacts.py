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

__all__ = [
    "competitive_impacts",
    "block_impacts",
    "block_impacts_batched",
    "max_scores_per_block",
]


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


def block_impacts_batched(
    freqs: np.ndarray,
    norms: np.ndarray,
    starts: np.ndarray,
    block_size: int,
) -> tuple[list[np.ndarray], list[np.ndarray]]:
    """Per-block Pareto frontiers for T independent postings streams
    (``starts`` int64[T+1] boundaries), computed in one lexsort +
    segmented-scan pass instead of a Python loop per (term, block).
    Result per stream is identical to ``block_impacts``: (flat int32
    interleaved (freq, norm) pairs, int32[nb+1] pair-index offsets)."""
    freqs = np.asarray(freqs, dtype=np.int64)
    norms = np.asarray(norms, dtype=np.int64) & 0xFF
    starts = np.asarray(starts, dtype=np.int64)
    lens = np.diff(starts)
    T = len(lens)
    nb = np.maximum((lens + block_size - 1) // block_size, 1)
    blk_first = np.concatenate(([0], np.cumsum(nb)))
    B = int(nb.sum())
    off = np.arange(len(freqs)) - np.repeat(starts[:-1], lens)
    gblock = np.repeat(blk_first[:-1], lens) + off // block_size
    order = np.lexsort((freqs, norms, gblock))
    gb, nm, fr = gblock[order], norms[order], freqs[order]
    n = len(gb)
    if n:
        # max freq per (block, norm): last row of each run
        is_last = np.empty(n, dtype=bool)
        is_last[-1] = True
        is_last[:-1] = (gb[1:] != gb[:-1]) | (nm[1:] != nm[:-1])
        gb, nm, fr = gb[is_last], nm[is_last], fr[is_last]
        # Pareto keep: freq strictly above the running max of smaller
        # norms within the block; the block offset trick resets the
        # running max at every block boundary without a Python loop
        OFF = np.int64(1) << 40
        runmax = np.maximum.accumulate(fr + gb * OFF) - gb * OFF
        prev = np.empty(len(fr), dtype=np.int64)
        prev[0] = -1
        prev[1:] = runmax[:-1] - (gb[1:] - gb[:-1]) * OFF  # < 0 at block starts
        keep = fr > prev
        gb, nm, fr = gb[keep], nm[keep], fr[keep]
    counts = np.bincount(gb, minlength=B).astype(np.int64)
    pair_first = np.concatenate(([0], np.cumsum(counts)))
    flat_all = np.empty(2 * len(gb), dtype=np.int32)
    flat_all[0::2] = fr
    flat_all[1::2] = nm
    flats: list[np.ndarray] = []
    offsets: list[np.ndarray] = []
    for t in range(T):
        b0, b1 = blk_first[t], blk_first[t + 1]
        flats.append(flat_all[2 * pair_first[b0] : 2 * pair_first[b1]])
        offsets.append((pair_first[b0 : b1 + 1] - pair_first[b0]).astype(np.int32))
    return flats, offsets


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
