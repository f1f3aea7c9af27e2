"""WhitespaceAnalyzer, KeywordAnalyzer, ASCIIFoldingFilter.

References: lucene/analysis/common/.../core/WhitespaceTokenizer.java,
core/KeywordTokenizer.java, miscellaneous/ASCIIFoldingFilter.java:57.
"""

import pandas as pd

from lucene_solr_8_7_0_spark.config import EngineConfig
from lucene_solr_8_7_0_spark.functions.analysis import (
    analyze_batch,
    ascii_fold,
    tokenize_text,
)


def test_whitespace_tokens():
    assert tokenize_text("Foo  Bar\tbaz\nQux", "whitespace") == [
        "Foo", "Bar", "baz", "Qux"
    ]
    # case-preserving, punctuation kept inside tokens
    assert tokenize_text("a.b,c d-e", "whitespace") == ["a.b,c", "d-e"]
    assert tokenize_text("", "whitespace") == []
    assert tokenize_text("  x ", "whitespace") == ["x"]
    # unicode whitespace splits too (Character.isWhitespace semantics)
    assert tokenize_text("a b", "whitespace") == ["a", "b"]


def test_keyword_tokens():
    assert tokenize_text("New York City", "keyword") == ["New York City"]
    assert tokenize_text("", "keyword") == []
    tb = analyze_batch(pd.Series(["id-42", None]), "keyword")
    assert tb.terms.tolist() == ["id-42"]
    assert tb.doc_lengths.tolist() == [1, 0]


def test_ascii_fold():
    assert ascii_fold("café") == "cafe"
    assert ascii_fold("naïve") == "naive"
    assert ascii_fold("Größe") == "Grosse"
    assert ascii_fold("œuvre") == "oeuvre"
    assert ascii_fold("Łódź") == "Lodz"
    assert ascii_fold("Ærø") == "AEro"
    assert ascii_fold("þorn") == "thorn"
    assert ascii_fold("plain") == "plain"
    # no ASCII equivalent -> unchanged
    assert ascii_fold("中文") == "中文"


def test_folding_in_chain():
    toks = tokenize_text(
        "Café NAÏVE Grüße", "standard", ascii_folding=True
    )
    assert toks == ["cafe", "naive", "grusse"]
    # folding happens before the stop filter so folded forms match
    # (whitespace tokenizer: the simple analyzer's [a-z0-9_]+ grammar
    # would split at the accent before the filter ever saw it)
    toks = tokenize_text(
        "thé the", "whitespace", stopwords=("the",), ascii_folding=True
    )
    assert toks == []


def test_whitespace_keyword_jvm_python_parity(spark):
    from lucene_solr_8_7_0_spark.functions.analysis import jvm_token_array

    texts = ["Foo  Bar\tbaz", "", "  x ", "a.b,c d-e", "one", "a b"]
    pdf = pd.DataFrame({"content": texts})
    df = spark.createDataFrame(pdf)
    for analyzer in ("whitespace", "keyword"):
        jvm = [list(r[0]) for r in df.select(
            jvm_token_array("content", analyzer)
        ).collect()]
        py = [tokenize_text(t, analyzer) for t in texts]
        assert jvm == py, analyzer


def test_folded_index_end_to_end(spark, tmp_path_factory):
    from lucene_solr_8_7_0_spark.operators.build import build_index
    from lucene_solr_8_7_0_spark.operators.search import IndexSearcher
    from lucene_solr_8_7_0_spark.plans import queries as Q

    texts = ["the café menu", "cafe prices", "tea house"]
    rows = [("r", f"{i:03d}", "c", "t", t) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])
    )
    d = str(tmp_path_factory.mktemp("fold_idx"))
    build_index(
        spark, docs, d,
        EngineConfig(analyzer="whitespace", ascii_folding=True,
                     segment_size=4),
        resume=False,
    )
    s = IndexSearcher(spark, d)
    assert s.cfg.ascii_folding is True  # persisted + reloaded
    hits = sorted(
        s.matches_df(Q.TermQuery("cafe")).toPandas()["doc_id"].tolist()
    )
    assert hits == [0, 1]
