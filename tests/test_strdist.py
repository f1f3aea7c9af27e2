"""Pluggable spellcheck distances: the reference's own golden values
(TestJaroWinklerDistance.java / TestNGramDistance.java) plus the
DirectSpellChecker.setDistance integration."""

import pytest

from lucene_solr_8_7_0_spark.functions.strdist import (
    jaro_winkler,
    ngram_distance,
)


def test_jaro_winkler_reference_goldens():
    assert jaro_winkler("al", "al") == 1.0
    assert 0.961 < jaro_winkler("martha", "marhta") < 0.962
    assert 0.832 < jaro_winkler("jones", "johnson") < 0.833
    assert 0.958 < jaro_winkler("abcvwxyz", "cabvwxyz") < 0.959
    assert 0.84 < jaro_winkler("dwayne", "duane") < 0.841
    assert 0.813 < jaro_winkler("dixon", "dicksonx") < 0.814
    assert jaro_winkler("fvie", "ten") == 0.0
    assert jaro_winkler("zac ephron", "zac efron") > jaro_winkler(
        "zac ephron", "kai ephron"
    )
    assert jaro_winkler("brittney spears", "britney spears") > jaro_winkler(
        "brittney spears", "brittney startzman"
    )


def test_ngram_distance_reference_goldens():
    # TestNGramDistance.testGetDistance2 (the n=2 defaults)
    cases = [
        ("al", "al", 1.0), ("a", "a", 1.0), ("b", "a", 0.0),
        ("a", "aa", 0.5),
        ("martha", "marhta", 0.6666), ("jones", "johnson", 0.4285),
        ("natural", "contrary", 0.25), ("abcvwxyz", "cabvwxyz", 0.625),
        ("dwayne", "duane", 0.5833), ("dixon", "dicksonx", 0.5),
        ("six", "ten", 0.0),
    ]
    for a, b, want in cases:
        assert ngram_distance(a, b) == pytest.approx(want, abs=1e-3), (a, b)
    assert ngram_distance("0012345678", "0012890678") == pytest.approx(
        ngram_distance("0012345678", "0072385698"), abs=1e-3
    )
    # testGetDistance1/3 spot values at other gram sizes
    assert ngram_distance("abcvwxyz", "cabvwxyz", n=1) == pytest.approx(
        0.75, abs=1e-3
    )
    assert ngram_distance("dixon", "dicksonx", n=3) == pytest.approx(
        0.4583, abs=1e-3
    )
    assert ngram_distance("martha", "marhta", n=3) == pytest.approx(
        0.7222, abs=1e-3
    )


def test_suggest_fuzzy_pluggable_distance(spark, tmp_path_factory):
    from lucene_solr_8_7_0_spark.config import EngineConfig
    from lucene_solr_8_7_0_spark.operators.build import build_index
    from lucene_solr_8_7_0_spark.operators.search import IndexSearcher
    from lucene_solr_8_7_0_spark.operators.suggest import suggest_fuzzy
    from lucene_solr_8_7_0_spark.sources.corpus import corpus_df

    d = str(tmp_path_factory.mktemp("sd_idx"))
    build_index(spark, corpus_df(spark, 120, seed=21), d,
                EngineConfig(segment_size=64))
    s = IndexSearcher(spark, d)
    td = s.termdict.toPandas()

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    base = "publc"
    for dist, fn in (("jaro_winkler", jaro_winkler),
                     ("ngram", ngram_distance)):
        got = suggest_fuzzy(s, base, k=5, distance=dist).toPandas()
        cand = td[(td["term"] != base)
                  & (td["term"].str.len().sub(len(base)).abs() <= 2)].copy()
        cand = cand[cand["term"].map(lambda t: lev(t, base)) <= 2]
        cand["sim"] = cand["term"].map(lambda t: round(fn(t, base), 6))
        exp = cand.sort_values(
            ["sim", "df", "term"], ascending=[False, False, True]
        ).head(5)
        assert got["term"].tolist() == exp["term"].tolist(), dist
        assert got["dist"].tolist() == exp["sim"].tolist(), dist
    with pytest.raises(ValueError):
        suggest_fuzzy(s, base, distance="nope")
