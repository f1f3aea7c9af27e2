"""SweetSpotSimilarity + PerFieldSimilarityWrapper.

Formula goldens against the reference's closed forms
(lucene/misc/src/java/org/apache/lucene/misc/SweetSpotSimilarity.java;
the numbers mirror the reference's own TestSweetSpotSimilarity
expectations: plateau == 1.0 inside [min,max], symmetric sqrt falloff
outside, baselineTf constant below min, hyperbolic tf == 1.0 at the
xoffset midpoint and hard-capped at max), plus engine==oracle rank
identity through the pruned WAND path — the plateau norm is NOT
monotone in doc length, so this also exercises the whole-table
max_score bound (functions/sweetspot.py)."""

import math

import numpy as np
import pytest

from lucene_solr_8_7_0_spark.functions.smallfloat import (
    LENGTH_TABLE,
    int_to_byte4_np,
)
from lucene_solr_8_7_0_spark.functions.sweetspot import (
    SweetSpotScorer,
    _norm_table,
    resolve_per_field,
)
from lucene_solr_8_7_0_spark.functions.tfidf import TFIDFScorer
from lucene_solr_8_7_0_spark.plans import queries as Q
from lucene_solr_8_7_0_spark.plans.rewrite import rewrite
from lucene_solr_8_7_0_spark.functions.oracle import oracle_search


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    from lucene_solr_8_7_0_spark.config import EngineConfig
    from lucene_solr_8_7_0_spark.functions.oracle import build_oracle_index
    from lucene_solr_8_7_0_spark.operators.build import build_index
    from lucene_solr_8_7_0_spark.operators.search import IndexSearcher
    from lucene_solr_8_7_0_spark.sources.corpus import corpus_df

    d = str(tmp_path_factory.mktemp("idx_ss"))
    cfg = EngineConfig(segment_size=64)
    docs = corpus_df(spark, 300, seed=42)
    build_index(spark, docs, d, cfg)
    searcher = IndexSearcher(spark, d)
    corpus_pdf = (
        docs.join(
            spark.read.parquet(f"{d}/docs").select("repo", "path", "doc_id"),
            ["repo", "path"],
        )
        .select("doc_id", "content")
        .toPandas()
    )
    oi = build_oracle_index(corpus_pdf, cfg)
    return searcher, oi


def _length_norm(x, lo, hi, steep):
    """Java's precision order: int abs-sum -> float, float multiply and
    add, double sqrt, float cast (SweetSpotSimilarity.java:122-132)."""
    inner = np.float32(abs(x - lo) + abs(x - hi) - (hi - lo))
    denom = np.float32(np.float32(steep) * inner) + np.float32(1.0)
    return np.float32(1.0 / math.sqrt(float(denom)))


def test_plateau_length_norm_golden():
    """Norm table = lengthNorm(byte4ToInt(i)): 1.0 across the plateau,
    sqrt falloff outside, symmetric around it
    (SweetSpotSimilarity.java:116-133)."""
    table = _norm_table(3, 8, 0.5)
    for i in range(1, 256):
        length = int(LENGTH_TABLE[i])
        exp = np.float32(_length_norm(length, 3, 8, 0.5))
        assert table[i] == exp, (i, length)
    # plateau: every exactly-representable length in [3, 8] norms to 1
    for length in (3, 4, 5, 6, 7, 8):
        b = int(int_to_byte4_np(np.array([length]))[0]) & 0xFF
        assert table[b] == np.float32(1.0)
    # symmetric falloff: dist d below min == dist d above max
    assert table[int(int_to_byte4_np(np.array([1]))[0]) & 0xFF] == \
        table[int(int_to_byte4_np(np.array([10]))[0]) & 0xFF]
    # the reference's normTable[0] = 1/normTable[255] quirk
    assert table[0] == np.float32(np.float32(1.0) / table[255])


def test_baseline_tf_golden():
    """baselineTf (java:158-165): 0 at 0, constant ``base`` through
    ``min``, sqrt(freq + base^2 - min) above."""
    s = SweetSpotScorer.create("sweetspot:1:1:0.5:tfb:1.5:2", 1.0,
                               np.float32(1.0))
    tf = s._tf(np.array([0, 1, 2, 3, 9], dtype=np.int64))
    assert tf[0] == np.float32(0.0)
    assert tf[1] == np.float32(1.5)
    assert tf[2] == np.float32(1.5)
    assert tf[3] == np.float32(math.sqrt(np.float32(3 + 1.5 * 1.5 - 2)))
    assert tf[4] == np.float32(math.sqrt(np.float32(9 + 1.5 * 1.5 - 2)))


def test_hyperbolic_tf_golden():
    """hyperbolicTf (java:182-205): 0 at 0, exactly (max-min)/2 + min at
    the xoffset midpoint, hard-capped at max for huge freqs."""
    s = SweetSpotScorer.create("sweetspot:1:1:0.5:hyper", 1.0,
                               np.float32(1.0))
    tf = s._tf(np.array([0, 1, 10, 20, 10_000], dtype=np.int64))
    assert tf[0] == np.float32(0.0)
    assert tf[2] == np.float32(1.0)                       # midpoint
    exp1 = np.float32(math.tanh((1 - 10) * math.log(1.3)) + 1.0)
    np.testing.assert_allclose(tf[1], exp1, rtol=1e-6)
    exp20 = np.float32(math.tanh((20 - 10) * math.log(1.3)) + 1.0)
    np.testing.assert_allclose(tf[3], exp20, rtol=1e-6)
    assert tf[4] == np.float32(2.0)                       # NaN -> max cap
    assert np.all(tf <= np.float32(2.0))


def test_default_spec_degenerates_to_classic():
    """ln 1..1 steep 0.5 + tf base 0 min 0 == ClassicSimilarity exactly
    (java:104-106, 152-153) — bitwise identical scores."""
    rng = np.random.default_rng(7)
    freqs = rng.integers(1, 50, size=200)
    norms = rng.integers(0, 256, size=200)
    ss = SweetSpotScorer.create("sweetspot", 1.3, np.float32(2.71))
    cl = TFIDFScorer.create(1.3, np.float32(2.71))
    np.testing.assert_array_equal(ss.score(freqs, norms),
                                  cl.score(freqs, norms))


def test_max_score_bounds_every_impact():
    """The whole-table bound dominates every (freq, norm) pair the
    frontier could have summarized — the block-max safety invariant for
    the non-monotone plateau norm."""
    s = SweetSpotScorer.create("sweetspot:3:8:0.5", 1.0, np.float32(2.0))
    rng = np.random.default_rng(11)
    freqs = rng.integers(1, 40, size=500)
    norms = rng.integers(0, 256, size=500)
    impacts = np.stack([freqs, norms], axis=1)
    bound = s.max_score(impacts)
    assert np.all(s.score(freqs, norms) <= bound)


def test_resolve_per_field():
    assert resolve_per_field("bm25") == "bm25"
    spec = "perfield:content=dfr|in|l|h1,default=bm25"
    assert resolve_per_field(spec, "content") == "dfr:in:l:h1"
    assert resolve_per_field(spec, "title") == "bm25"
    with pytest.raises(ValueError):
        resolve_per_field("perfield:content=classic", "title")
    with pytest.raises(ValueError):
        resolve_per_field("perfield:garbage", "content")


@pytest.mark.parametrize("sim", [
    "sweetspot:3:8:0.5",
    "sweetspot:3:8:0.5:hyper",
    "sweetspot:2:6:0.3:tfb:1.5:2",
    "perfield:content=sweetspot|3|8|0.5,default=bm25",
])
def test_sweetspot_rank_identity(engine, sim):
    """Pruned engine == brute-force oracle, bitwise float32, across
    term/OR/AND/phrase/boost shapes; pruned == COMPLETE proves the
    loose max_score bound never cuts a competitive doc."""
    import dataclasses

    searcher, oi = engine
    oi_ss = dataclasses.replace(
        oi, cfg=dataclasses.replace(oi.cfg, similarity=sim)
    )
    queries = [
        Q.TermQuery("public"),
        Q.term_or(["public", "return", "import"], 1),
        Q.term_and(["public", "return"]),
        Q.PhraseQuery(("public", "return")),
        Q.BoostQuery(Q.TermQuery("public"), 2.0),
    ]
    for q in queries:
        td = searcher.search(q, k=10, total_hits_threshold=1, similarity=sim)
        exp = oracle_search(oi_ss, rewrite(q, searcher._term_lookup), k=10)
        assert td.doc_ids.tolist() == exp.doc_ids.tolist(), str(q)
        np.testing.assert_array_equal(td.scores, exp.scores, err_msg=str(q))
        full = searcher.search(q, k=10, score_mode="complete", similarity=sim)
        assert td.doc_ids.tolist() == full.doc_ids.tolist(), str(q)
        np.testing.assert_array_equal(td.scores, full.scores, err_msg=str(q))


def test_perfield_matches_direct_spec(engine):
    """The wrapper resolved for the scored field is indistinguishable
    from passing that similarity directly
    (PerFieldSimilarityWrapper.java:28-62)."""
    searcher, _ = engine
    q = Q.term_or(["public", "return"], 1)
    direct = searcher.search(q, k=10, similarity="sweetspot:3:8:0.5")
    wrapped = searcher.search(
        q, k=10,
        similarity="perfield:content=sweetspot|3|8|0.5,default=classic")
    assert direct.doc_ids.tolist() == wrapped.doc_ids.tolist()
    np.testing.assert_array_equal(direct.scores, wrapped.scores)
