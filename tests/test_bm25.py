"""BM25 float32 scorer tests — property strategy of
BaseSimilarityTestCase + TestBM25Similarity (scores finite/positive,
monotonic in freq, decreasing in norm), plus hand-computed goldens."""

import math

import numpy as np

from lucene_solr_8_7_0_spark.functions.bm25 import (
    BM25Scorer,
    avg_field_length,
    idf,
    sum_scores_f32,
)
from lucene_solr_8_7_0_spark.functions.smallfloat import LENGTH_TABLE, int_to_byte4


def test_idf_golden():
    # log(1 + (2 - 1 + 0.5) / (1 + 0.5)) == log(2)
    assert idf(1, 2) == np.float32(math.log(2.0))
    assert idf(0, 0) == np.float32(math.log(1 + 0.5 / 0.5))
    assert idf(10, 10) == np.float32(math.log(1 + 0.5 / 10.5))
    assert idf(1, 1_000_000) > idf(1000, 1_000_000) > idf(500_000, 1_000_000) > 0


def test_avgdl_float_of_long_division():
    assert avg_field_length(10, 4) == np.float32(2.5)
    # long/long would truncate; the reference divides as doubles then casts
    assert avg_field_length(7, 2) == np.float32(3.5)


def _scorer(boost=1.0, df=5, n=100, sttf=5000, k1=1.2, b=0.75):
    return BM25Scorer.create(boost, k1, b, idf(df, n), avg_field_length(sttf, n))


def test_score_exact_float32_form():
    sc = _scorer()
    norm_b = int_to_byte4(10)
    # replicate weight - weight/(1 + freq*normInv) in float32 by hand
    k1, b = np.float32(1.2), np.float32(0.75)
    avgdl = np.float32(5000 / 100.0)
    norm_inv = np.float32(1.0) / (
        k1 * ((np.float32(1.0) - b) + b * LENGTH_TABLE[norm_b] / avgdl)
    )
    w = sc.weight
    expected = np.float32(w - w / (np.float32(1.0) + np.float32(3.0) * norm_inv))
    got = sc.score(np.array([3.0]), np.array([norm_b]))
    assert got.dtype == np.float32
    assert got[0] == expected


def test_monotonic_in_freq_and_norm():
    sc = _scorer()
    freqs = np.arange(1, 200, dtype=np.float64)
    for length in [1, 5, 39, 100, 10_000]:
        nb = int_to_byte4(length)
        s = sc.score(freqs, np.full(len(freqs), nb))
        assert (np.diff(s) >= 0).all()
        assert (s > 0).all() and np.isfinite(s).all()
        assert (s < sc.weight).all()  # saturates below weight (k1+1 factor dropped in 8.x)
    # longer doc (bigger norm byte) never scores higher at same freq
    lengths = [int_to_byte4(x) for x in [1, 2, 10, 50, 1000, 100000]]
    s = sc.score(np.full(len(lengths), 5.0), np.array(lengths))
    assert (np.diff(s) <= 0).all()


def test_boost_scales_weight():
    s1 = _scorer(boost=1.0)
    s2 = _scorer(boost=2.0)
    assert s2.weight == np.float32(np.float32(2.0) * s1.weight / np.float32(1.0)) or (
        s2.weight == np.float32(2.0) * s1.weight
    )


def test_sum_scores_double_accumulate():
    a = np.array([0.1, 0.2], dtype=np.float32)
    b = np.array([0.3, 0.4], dtype=np.float32)
    got = sum_scores_f32([a, b])
    exp = (a.astype(np.float64) + b.astype(np.float64)).astype(np.float32)
    np.testing.assert_array_equal(got, exp)
    assert got.dtype == np.float32


def test_norm_zero_degenerate():
    # empty field -> length 0 -> norm byte 0 -> normInv = 1/(k1*(1-b+0))
    sc = _scorer()
    s = sc.score(np.array([1.0]), np.array([0]))
    assert np.isfinite(s[0]) and s[0] > 0


def test_lmdirichlet_scorer_formula():
    """LMDirichletScorer vs a literal transcription of
    LMDirichletSimilarity.score (double math, clamp at 0, one float
    cast)."""
    import math

    import numpy as np

    from lucene_solr_8_7_0_spark.functions.lm import (
        DEFAULT_MU,
        LMDirichletScorer,
        SumScorer,
    )
    from lucene_solr_8_7_0_spark.functions.smallfloat import LENGTH_TABLE

    ttf, sum_ttf, boost = 37, 10_000, 1.3
    sc = LMDirichletScorer.create(boost, ttf, sum_ttf)
    freqs = np.array([1, 2, 5, 100], dtype=np.int64)
    norms = np.array([10, 40, 200, 255], dtype=np.int64)
    got = sc.score(freqs, norms)
    p = (ttf + 1.0) / (sum_ttf + 1.0)
    for i in range(len(freqs)):
        dl = float(LENGTH_TABLE[norms[i]])
        exp = boost * (
            math.log(1 + freqs[i] / (DEFAULT_MU * p))
            + math.log(DEFAULT_MU / (dl + DEFAULT_MU))
        )
        exp = max(exp, 0.0)
        assert got[i] == np.float32(exp), i
    # a rare term in a long doc can clamp to exactly 0 (still a match)
    sc0 = LMDirichletScorer.create(1.0, 0, 10**9)
    assert sc0.score(np.array([1]), np.array([255]))[0] == np.float32(0.0)
    # SumScorer == sum of sub-scores in f64, cast once
    two = SumScorer((sc, sc))
    np.testing.assert_array_equal(
        two.score(freqs, norms),
        (got.astype(np.float64) * 2).astype(np.float32),
    )


def test_lmjelinekmercer_scorer_formula():
    """LMJelinekMercerScorer vs a literal transcription of
    LMJelinekMercerSimilarity.score (double math, one float cast;
    no clamp — log1p of a positive quantity)."""
    import math

    import numpy as np

    from lucene_solr_8_7_0_spark.functions.lm import (
        DEFAULT_LAMBDA,
        LMJelinekMercerScorer,
        make_lm_scorer,
    )
    from lucene_solr_8_7_0_spark.functions.smallfloat import LENGTH_TABLE

    ttf, sum_ttf, boost = 37, 10_000, 1.3
    sc = LMJelinekMercerScorer.create(boost, ttf, sum_ttf)
    freqs = np.array([1, 2, 5, 100], dtype=np.int64)
    norms = np.array([10, 40, 200, 255], dtype=np.int64)
    got = sc.score(freqs, norms)
    p = (ttf + 1.0) / (sum_ttf + 1.0)
    lam = DEFAULT_LAMBDA
    for i in range(len(freqs)):
        dl = float(LENGTH_TABLE[norms[i]])
        exp = boost * math.log(
            1 + ((1 - lam) * freqs[i] / dl) / (lam * p)
        )
        assert got[i] == np.float32(exp), i
        assert got[i] >= 0.0
    # factory dispatch
    assert isinstance(
        make_lm_scorer("lmjelinekmercer", 1.0, 1, 10),
        LMJelinekMercerScorer,
    )
    # block-max bound: max_score over the impact frontier dominates
    # every (freq<=f, norm>=n) combination
    imp = np.stack([freqs, norms], axis=1)
    assert sc.max_score(imp) >= got.max()


def test_similarity_base_formulas():
    """SimilarityBaseScorer vs inline transcriptions of DFRSimilarity /
    IBSimilarity / DFISimilarity component math (double, one f32 cast)."""
    import math

    import numpy as np

    from lucene_solr_8_7_0_spark.functions.dfr import (
        is_similarity_base,
        make_sb_scorer,
    )
    from lucene_solr_8_7_0_spark.functions.smallfloat import LENGTH_TABLE

    assert is_similarity_base("dfr") and is_similarity_base("ib:ll:df:h1")
    assert not is_similarity_base("bm25")

    N, T, df, ttf, boost = 1000, 50_000, 5, 37, 1.3
    avgfl = T / N
    freqs = np.array([1, 2, 5, 100], dtype=np.int64)
    norms = np.array([10, 40, 200, 255], dtype=np.int64)
    log2 = lambda x: math.log(x) / math.log(2.0)

    # DFR G:B:H2 (the "dfr" default)
    got = make_sb_scorer("dfr", boost, df, ttf, N, T).score(freqs, norms)
    for i in range(4):
        dl = float(LENGTH_TABLE[norms[i]])
        tfn = freqs[i] * log2(1 + avgfl / dl)           # NormalizationH2
        ae = (ttf + 2.0) / (df + 1.0)                   # AfterEffectB
        F = ttf + 1.0
        lam = F / (N + F)                               # BasicModelG
        A, B = log2(lam + 1), log2((1 + lam) / lam)
        exp = boost * ((B - (B - A) / (1 + tfn)) * ae)
        assert got[i] == np.float32(exp), i

    # DFR IN:L:H1
    got = make_sb_scorer("dfr:in:l:h1", boost, df, ttf, N, T).score(
        freqs, norms
    )
    for i in range(4):
        dl = float(LENGTH_TABLE[norms[i]])
        tfn = freqs[i] * 1.0 * (avgfl / dl)             # NormalizationH1
        A = log2((N + 1) / (df + 0.5))                  # BasicModelIn
        exp = boost * (A * 1.0 * (1 - 1 / (1 + tfn)))
        assert got[i] == np.float32(exp), i

    # IB LL:DF:H2
    got = make_sb_scorer("ib:ll:df:h2", boost, df, ttf, N, T).score(
        freqs, norms
    )
    lam = float(np.float32((df + 1.0) / (N + 1.0)))     # LambdaDF (float)
    for i in range(4):
        dl = float(LENGTH_TABLE[norms[i]])
        tfn = freqs[i] * log2(1 + avgfl / dl)
        exp = boost * (-math.log(lam / (tfn + lam)))    # DistributionLL
        assert got[i] == np.float32(exp), i

    # DFI chi-squared: zero at/below the expected frequency
    sc = make_sb_scorer("dfi", boost, df, ttf, N, T)
    got = sc.score(freqs, norms)
    for i in range(4):
        dl = float(LENGTH_TABLE[norms[i]])
        expected = (ttf + 1.0) * dl / (T + 1.0)
        if freqs[i] <= expected:
            exp = 0.0
        else:
            m = (freqs[i] - expected) ** 2 / expected
            exp = boost * log2(m + 1)
        assert got[i] == np.float32(exp), i
    # a very long doc pushes expected above freq -> exact 0, still a match
    assert sc.score(np.array([1]), np.array([255]))[0] >= 0.0

    # every spec family: finite, nondecreasing in freq (block-max safety)
    for spec in ["dfr:if:b:h3", "dfr:ine:b:z", "dfr:g:b:none",
                 "ib:spl:ttf:h1", "dfi:saturated", "dfi:standardized"]:
        sc = make_sb_scorer(spec, 1.0, df, ttf, N, T)
        f = sc.score(np.arange(1, 30), np.full(29, 100))
        assert np.all(np.isfinite(f)) and np.all(np.diff(f) >= -0.0), spec
    import pytest as _pytest

    with _pytest.raises(ValueError):
        make_sb_scorer("dfr:nope:b:h2", 1.0, df, ttf, N, T)
    with _pytest.raises(ValueError):
        make_sb_scorer("ib:ll:df", 1.0, df, ttf, N, T)


def test_axiomatic_formulas():
    """Axiomatic F1/F2/F3 EXP/LOG vs inline transcriptions
    (Axiomatic.java:104-113: boost multiplies before the 0-clamp)."""
    import math

    import numpy as np

    from lucene_solr_8_7_0_spark.functions.dfr import make_sb_scorer
    from lucene_solr_8_7_0_spark.functions.smallfloat import LENGTH_TABLE

    N, T, df, ttf, boost = 1000, 50_000, 5, 37, 1.3
    avgfl = T / N
    s, k, qlen = 0.25, 0.3499999940395355, 1.0
    freqs = np.array([1, 2, 5, 100], dtype=np.int64)
    norms = np.array([10, 40, 200, 255], dtype=np.int64)

    def expect(variant, f, dl):
        tf = (1 + math.log(1 + math.log(f))
              if variant in ("f1exp", "f1log", "f3exp", "f3log") else 1.0)
        ln_ = ((avgfl + s) / (avgfl + dl * s)
               if variant in ("f1exp", "f1log") else 1.0)
        tfln = (f / (f + s + s * dl / avgfl)
                if variant in ("f2exp", "f2log") else 1.0)
        idf = (math.pow((N + 1.0) / df, k) if variant.endswith("exp")
               else math.log((N + 1.0) / df))
        gamma = ((dl - qlen) * s * qlen / avgfl
                 if variant in ("f3exp", "f3log") else 0.0)
        return max(0.0, boost * (tf * ln_ * tfln * idf - gamma))

    for variant in ["f1exp", "f1log", "f2exp", "f2log", "f3exp", "f3log"]:
        got = make_sb_scorer(f"ax:{variant}", boost, df, ttf, N, T).score(
            freqs, norms
        )
        for i in range(4):
            dl = float(LENGTH_TABLE[norms[i]])
            assert got[i] == np.float32(expect(variant, freqs[i], dl)), (
                variant, i,
            )
    # default spec is F2EXP; F3 clamps long docs to exactly 0
    d = make_sb_scorer("ax", boost, df, ttf, N, T).score(freqs, norms)
    e = make_sb_scorer("ax:f2exp", boost, df, ttf, N, T).score(freqs, norms)
    np.testing.assert_array_equal(d, e)
    f3 = make_sb_scorer("ax:f3log", boost, df, ttf, N, T)
    assert f3.score(np.array([1]), np.array([255]))[0] == np.float32(0.0)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        make_sb_scorer("ax:nope", 1.0, df, ttf, N, T)
