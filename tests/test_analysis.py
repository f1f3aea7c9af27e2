"""Tokenizer tests pinned to the reference's golden cases
(lucene/core/src/test/.../standard/TestStandardAnalyzer.java:228-267)."""

import numpy as np
import pandas as pd

from lucene_solr_8_7_0_spark.functions.analysis import analyze_batch, tokenize_text


def toks(text, **kw):
    return tokenize_text(text, **kw)


def test_reference_golden_cases():
    # TestStandardAnalyzer assertions (lowercased by the analyzer chain)
    assert toks("B2B") == ["b2b"]
    assert toks("2B") == ["2b"]
    assert toks("some-dashed-phrase") == ["some", "dashed", "phrase"]
    assert toks("dogs,chase,cats") == ["dogs", "chase", "cats"]
    assert toks("ac/dc") == ["ac", "dc"]
    assert toks("O'Reilly") == ["o'reilly"]
    assert toks("O'Reilly's") == ["o'reilly's"]
    assert toks("21.35") == ["21.35"]
    assert toks("R2D2 C3PO") == ["r2d2", "c3po"]
    assert toks("216.239.63.104") == ["216.239.63.104"]
    assert toks("David has 5000 bones") == ["david", "has", "5000", "bones"]
    assert toks("C embedded developers wanted") == ["c", "embedded", "developers", "wanted"]
    assert toks("foo bar FOO BAR") == ["foo", "bar", "foo", "bar"]
    assert toks('"QUOTED" word') == ["quoted", "word"]
    assert toks("") == []
    assert toks(".") == []
    assert toks(" ") == []


def test_source_code_identifiers():
    assert toks("snake_case camelCase dotted.name") == [
        "snake_case",
        "camelcase",
        "dotted.name",
    ]
    assert toks("x=1; foo(bar, baz)") == ["x", "1", "foo", "bar", "baz"]
    # digit-letter boundary around '.': breaks (no UAX#29 rule joins them)
    assert toks("foo2.bar") == ["foo2", "bar"]


def test_max_token_length_skip_semantics():
    # over-long token: dropped, consumes a position, not counted in length
    long_tok = "x" * 256
    batch = analyze_batch(pd.Series([f"aa {long_tok} bb"]))
    assert batch.terms.tolist() == ["aa", "bb"]
    assert batch.positions.tolist() == [0, 2]  # position hole at 1
    assert batch.doc_lengths.tolist() == [2]
    # exactly 255 chars is kept
    tok255 = "y" * 255
    assert toks(f"a {tok255}") == ["a", tok255]


def test_positions_contiguous_without_stopwords():
    batch = analyze_batch(pd.Series(["one two three two"]))
    assert batch.positions.tolist() == [0, 1, 2, 3]
    assert batch.doc_lengths.tolist() == [4]


def test_batch_layout():
    batch = analyze_batch(pd.Series(["a b", "", "c"]))
    assert batch.doc_idx.tolist() == [0, 0, 2]
    assert batch.terms.tolist() == ["a", "b", "c"]
    assert batch.doc_lengths.tolist() == [2, 0, 1]


def test_simple_analyzer_sql_equivalent():
    batch = analyze_batch(
        pd.Series(["Foo.Bar BAZ_1 x-y"]), analyzer="simple"
    )
    # lower() then [a-z0-9_]+ runs: dot splits in simple mode
    assert batch.terms.tolist() == ["foo", "bar", "baz_1", "x", "y"]


def test_cjk_per_char():
    assert toks("我是中") == ["我", "是", "中"]


def test_null_safety():
    batch = analyze_batch(pd.Series([None, "a"]))
    assert batch.terms.tolist() == ["a"]
    assert batch.doc_lengths.tolist() == [0, 1]
