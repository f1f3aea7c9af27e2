"""NGram / EdgeNGram token filters.

References: lucene/analysis/common/src/java/org/apache/lucene/analysis/
ngram/NGramTokenFilter.java (DEFAULT_MIN_NGRAM_SIZE=1,
DEFAULT_MAX_NGRAM_SIZE=2, keepShortTerm=false) and
ngram/EdgeNGramTokenFilter.java.  The engine chains them after the
simple tokenizer; gram emission is size-major per token and gram
positions are array-order (bag-of-terms — documented engine semantics).
"""

import pandas as pd
import pytest

from lucene_solr_8_7_0_spark.config import EngineConfig
from lucene_solr_8_7_0_spark.functions.analysis import (
    _gram_spec,
    tokenize_text,
)


def test_gram_spec_parsing():
    assert _gram_spec("ngram") == (1, 2)
    assert _gram_spec("ngram:3") == (3, 3)
    assert _gram_spec("ngram:2:4") == (2, 4)
    assert _gram_spec("edge_ngram:2:10") == (2, 10)
    with pytest.raises(ValueError):
        _gram_spec("ngram:0:2")
    with pytest.raises(ValueError):
        _gram_spec("ngram:3:2")


def test_ngram_default():
    # per token: all 1-grams then all 2-grams (size-major)
    assert tokenize_text("abc de", "ngram") == [
        "a", "b", "c", "ab", "bc", "d", "e", "de"
    ]
    # lowercasing rides the simple tokenizer
    assert tokenize_text("AB", "ngram:2:2") == ["ab"]
    # tokens shorter than min emit nothing (keepShortTerm=false)
    assert tokenize_text("a abc", "ngram:2:3") == ["ab", "bc", "abc"]
    assert tokenize_text("", "ngram") == []


def test_edge_ngram():
    assert tokenize_text("hello my", "edge_ngram:2:5") == [
        "he", "hel", "hell", "hello", "my"
    ]
    # max caps the prefix lengths
    assert tokenize_text("hello", "edge_ngram:2:3") == ["he", "hel"]
    # short tokens drop entirely
    assert tokenize_text("a", "edge_ngram:2:4") == []


def test_gram_jvm_python_parity(spark):
    from lucene_solr_8_7_0_spark.functions.analysis import jvm_token_array

    texts = ["Foo bar", "", "a", "xyzzy plugh w", "ab_c9 D",
             "supercalifragilistic"]
    df = spark.createDataFrame(pd.DataFrame({"content": texts}))
    for analyzer in ("ngram", "ngram:2:3", "edge_ngram",
                     "edge_ngram:2:10", "edge_ngram:3:3"):
        jvm = [list(r[0]) for r in df.select(
            jvm_token_array("content", analyzer)
        ).collect()]
        py = [tokenize_text(t, analyzer) for t in texts]
        assert jvm == py, analyzer


def test_edge_ngram_index_end_to_end(spark, tmp_path_factory):
    """The autocomplete shape: index edge-grams, a bare TermQuery on a
    typed prefix matches every doc with a token extending it."""
    from lucene_solr_8_7_0_spark.operators.build import build_index
    from lucene_solr_8_7_0_spark.operators.search import IndexSearcher
    from lucene_solr_8_7_0_spark.plans import queries as Q

    texts = ["coffee house", "coffin maker", "tea house", "cof"]
    rows = [("r", f"{i:03d}", "c", "t", t) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])
    )
    d = str(tmp_path_factory.mktemp("edge_idx"))
    build_index(
        spark, docs, d,
        EngineConfig(analyzer="edge_ngram:2:8", index_positions=False,
                     segment_size=4),
        resume=False,
    )
    s = IndexSearcher(spark, d)
    assert s.cfg.analyzer == "edge_ngram:2:8"  # spec string persisted
    hits = lambda t: sorted(
        s.matches_df(Q.TermQuery(t)).toPandas()["doc_id"].tolist()
    )
    assert hits("cof") == [0, 1, 3]
    assert hits("coff") == [0, 1]
    assert hits("coffe") == [0]
    assert hits("hous") == [0, 2]
