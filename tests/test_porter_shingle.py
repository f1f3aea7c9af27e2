"""Porter stemming + shingle + english analyzer chains.

References: lucene/analysis/common/.../en/PorterStemmer.java (the
Release-3 original algorithm), en/EnglishAnalyzer.java:105-112 (chain
order), shingle/ShingleFilter.java:44-87 (2-gram, outputUnigrams
false, " " separator).
"""

import pandas as pd
import pytest

from lucene_solr_8_7_0_spark.config import EngineConfig
from lucene_solr_8_7_0_spark.functions.analysis import (
    analyze_batch,
    tokenize_text,
)
from lucene_solr_8_7_0_spark.functions.porter import (
    ENGLISH_STOP_WORDS,
    porter_stem,
)

# Classic demonstration pairs from the published algorithm (Porter
# 1980 §§ step examples + the tartarus sample vocabulary).
GOLDEN = {
    "caresses": "caress", "ponies": "poni", "ties": "ti",
    "caress": "caress", "cats": "cat",
    "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "bled": "bled", "motoring": "motor", "sing": "sing",
    "conflated": "conflat", "troubled": "troubl", "sized": "size",
    "hopping": "hop", "tanned": "tan", "falling": "fall",
    "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file", "happy": "happi", "sky": "sky",
    "relational": "relat", "conditional": "condit",
    "rational": "ration", "valenci": "valenc", "hesitanci": "hesit",
    "digitizer": "digit", "conformabli": "conform",
    "radicalli": "radic", "differentli": "differ", "vileli": "vile",
    "analogousli": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper",
    "feudalism": "feudal", "decisiveness": "decis",
    "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit",
    "sensibiliti": "sensibl",
    "triplicate": "triplic", "formative": "form",
    "formalize": "formal", "electriciti": "electr",
    "electrical": "electr", "hopeful": "hope", "goodness": "good",
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens",
    "irritant": "irrit", "replacement": "replac",
    "adjustment": "adjust", "dependent": "depend",
    "adoption": "adopt", "communism": "commun",
    "activate": "activ", "angulariti": "angular",
    "homologous": "homolog", "effective": "effect",
    "bowdlerize": "bowdler", "probate": "probat", "rate": "rate",
    "cease": "ceas", "controll": "control", "roll": "roll",
    # departures & guards
    "logi": "logi", "bli": "bli",  # <= m0 stems untouched by step3
    "sky": "sky", "by": "by", "as": "as",  # length<=2 / no-vowel
    "joining": "join", "joined": "join", "queries": "queri",
    "tables": "tabl", "customer": "custom", "value": "valu",
}


def test_porter_goldens():
    bad = {w: (porter_stem(w), e) for w, e in GOLDEN.items()
           if porter_stem(w) != e}
    assert not bad, bad


def test_porter_short_words_unchanged():
    for w in ("a", "is", "be", "ox", ""):
        assert porter_stem(w) == w


def test_english_chain():
    """standard tokenize -> lower -> English stop set -> Porter."""
    toks = tokenize_text(
        "The Queries are JOINING tables into a hopeful plan", "english"
    )
    assert toks == ["queri", "join", "tabl", "hope", "plan"]
    # stop removal leaves position holes (phrase semantics preserved)
    tb = analyze_batch(pd.Series(["the joining of tables"]), "english")
    assert tb.terms.tolist() == ["join", "tabl"]
    assert tb.positions.tolist() == [1, 3]
    assert tb.doc_lengths.tolist() == [2]
    assert "the" in ENGLISH_STOP_WORDS and "of" in ENGLISH_STOP_WORDS


def test_shingle_chain():
    toks = tokenize_text("Big Data joins fast", "shingle")
    assert toks == ["big data", "data joins", "joins fast"]
    assert tokenize_text("solo", "shingle") == []
    assert tokenize_text("", "shingle") == []
    tb = analyze_batch(pd.Series(["x y z", ""]), "shingle")
    assert tb.terms.tolist() == ["x y", "y z"]
    assert tb.doc_lengths.tolist() == [2, 0]


def test_shingle_jvm_python_parity(spark):
    """The JVM zip_with shingler == the Python chain, token for token."""
    from lucene_solr_8_7_0_spark.functions.analysis import jvm_token_array

    texts = [
        "Big Data joins fast", "solo", "", "a b", "x  y\tz",
        "MiXeD CaSe_Token 123 foo_bar baz",
    ]
    pdf = pd.DataFrame({"content": texts})
    df = spark.createDataFrame(pdf)
    jvm = [r[0] for r in df.select(
        jvm_token_array("content", "shingle")
    ).collect()]
    py = [tokenize_text(t, "shingle") for t in texts]
    assert [list(x) for x in jvm] == py


def test_english_index_end_to_end(spark, tmp_path_factory):
    """Full build + search on the english analyzer: a TermQuery for a
    STEM matches docs containing any inflection; stopwords don't
    match; python backend is selected automatically."""
    from lucene_solr_8_7_0_spark.operators.build import build_index
    from lucene_solr_8_7_0_spark.operators.search import IndexSearcher
    from lucene_solr_8_7_0_spark.plans import queries as Q

    texts = [
        "joining tables quickly", "the joined table", "no match here",
        "query planning", "queries and plans", "the the the",
    ]
    rows = [("r", f"{i:03d}", "c", "t", t) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])
    )
    d = str(tmp_path_factory.mktemp("eng_idx"))
    res = build_index(
        spark, docs, d,
        EngineConfig(analyzer="english", segment_size=4), resume=False,
    )
    s = IndexSearcher(spark, d)
    hits = sorted(
        s.matches_df(Q.TermQuery("join")).toPandas()["doc_id"].tolist()
    )
    assert hits == [0, 1]
    assert s.matches_df(Q.TermQuery("the")).count() == 0
    q_hits = sorted(
        s.matches_df(Q.TermQuery("queri")).toPandas()["doc_id"].tolist()
    )
    assert q_hits == [3, 4]
    # doc 5 is all stopwords: indexed with length 0, matches nothing
    assert res.num_docs == 6


def test_shingle_index_end_to_end(spark, tmp_path_factory):
    from lucene_solr_8_7_0_spark.operators.build import build_index
    from lucene_solr_8_7_0_spark.operators.search import IndexSearcher
    from lucene_solr_8_7_0_spark.plans import queries as Q

    texts = ["big data wins", "data big inversion", "big and data"]
    rows = [("r", f"{i:03d}", "c", "t", t) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])
    )
    d = str(tmp_path_factory.mktemp("shingle_idx"))
    build_index(
        spark, docs, d,
        EngineConfig(analyzer="shingle", segment_size=4), resume=False,
    )
    s = IndexSearcher(spark, d)
    hits = sorted(
        s.matches_df(Q.TermQuery("big data")).toPandas()["doc_id"].tolist()
    )
    assert hits == [0]
