"""Impacts frontier tests vs brute force —
CompetitiveImpactAccumulator.java:97-118 semantics."""

import numpy as np

from lucene_solr_8_7_0_spark.functions.bm25 import BM25Scorer, avg_field_length, idf
from lucene_solr_8_7_0_spark.functions.impacts import (
    block_impacts,
    competitive_impacts,
    max_scores_per_block,
)


def brute_force_frontier(freqs, norms):
    pairs = sorted(set(zip(norms.tolist(), freqs.tolist())))
    best = {}
    for n, f in pairs:
        best[n] = max(best.get(n, -1), f)
    out, run = [], -1
    for n in sorted(best):
        if best[n] > run:
            out.append((best[n], n))
            run = best[n]
    return np.array(out, dtype=np.int32).reshape(-1, 2)


def test_frontier_vs_brute_force():
    rng = np.random.default_rng(3)
    for _ in range(50):
        k = int(rng.integers(1, 200))
        freqs = rng.integers(1, 50, size=k)
        norms = rng.integers(0, 256, size=k)
        got = competitive_impacts(freqs, norms)
        np.testing.assert_array_equal(got, brute_force_frontier(freqs, norms))


def test_frontier_dominance_property():
    # every (freq, norm) in the stream is dominated by a frontier pair
    rng = np.random.default_rng(9)
    freqs = rng.integers(1, 30, size=500)
    norms = rng.integers(0, 256, size=500)
    fr = competitive_impacts(freqs, norms)
    for f, n in zip(freqs, norms):
        assert any(ff >= f and nn <= n for ff, nn in fr)


def test_block_max_score_is_upper_bound():
    rng = np.random.default_rng(21)
    df = 1000
    freqs = rng.integers(1, 40, size=df).astype(np.int64)
    norms = rng.integers(1, 256, size=df).astype(np.int64)
    scorer = BM25Scorer.create(
        1.0, 1.2, 0.75, idf(df, 10_000), avg_field_length(500_000, 10_000)
    )
    flat, offsets = block_impacts(freqs, norms, 128)
    maxes = max_scores_per_block(flat, offsets, scorer)
    scores = scorer.score(freqs, norms)
    for b in range(len(offsets) - 1):
        blk = scores[b * 128 : (b + 1) * 128]
        assert maxes[b] >= blk.max()
        assert maxes[b] == blk.max()  # bound is tight: it's the frontier max
