"""SimpleQueryParser — lucene/queryparser/.../simple/SimpleQueryParser.java.

The defining contract is graceful degradation: the parser NEVER throws;
malformed syntax is interpreted as literal text.
"""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_8_7_0_spark.plans import queries as Q
from lucene_solr_8_7_0_spark.plans.simpleparser import SimpleQueryParser


P = SimpleQueryParser()


def occurs(q):
    assert isinstance(q, Q.BooleanQuery)
    return [(c.occur, c.query) for c in q.clauses]


def test_terms_and_default_operator():
    assert P.parse("foo") == Q.TermQuery("foo")
    got = occurs(P.parse("foo bar"))
    assert got == [(Q.Occur.SHOULD, Q.TermQuery("foo")),
                   (Q.Occur.SHOULD, Q.TermQuery("bar"))]


def test_plus_is_and_and_binds_tighter_than_or():
    got = occurs(P.parse("foo + bar"))
    assert got == [(Q.Occur.MUST, Q.TermQuery("foo")),
                   (Q.Occur.MUST, Q.TermQuery("bar"))]
    # a | b + c  ==  a OR (b AND c)
    top = occurs(P.parse("a | b + c"))
    assert top[0] == (Q.Occur.SHOULD, Q.TermQuery("a"))
    assert occurs(top[1][1]) == [(Q.Occur.MUST, Q.TermQuery("b")),
                                 (Q.Occur.MUST, Q.TermQuery("c"))]


def test_negation_phrase_prefix_fuzzy():
    got = occurs(P.parse("foo -bar"))
    assert got == [(Q.Occur.SHOULD, Q.TermQuery("foo")),
                   (Q.Occur.MUST_NOT, Q.TermQuery("bar"))]
    assert P.parse('"foo bar"') == Q.PhraseQuery(("foo", "bar"))
    assert P.parse('"foo bar"~3') == Q.PhraseQuery(("foo", "bar"), slop=3)
    assert P.parse("foo*") == Q.PrefixQuery("foo")
    assert P.parse("foo~1") == Q.FuzzyQuery("foo", max_edits=1)
    assert P.parse("foo~") == Q.FuzzyQuery("foo", max_edits=2)


def test_grouping():
    # (a | b) + c : the group ANDs with c
    got = occurs(P.parse("(aa | bb) + cc"))
    assert got[1] == (Q.Occur.MUST, Q.TermQuery("cc"))
    assert got[0][0] is Q.Occur.MUST
    inner = occurs(got[0][1])
    assert [q.term for _, q in inner] == ["aa", "bb"]


def test_mid_token_hyphen_is_literal():
    # simple analyzer splits on '-', yielding a two-token phrase
    q = P.parse("state-of-the-art")
    assert q == Q.PhraseQuery(("state", "of", "the", "art"))


@pytest.mark.parametrize("broken", [
    '"unclosed phrase', "(unbalanced", "a )", ")(", "+ | -", "|||",
    "-", "+", '""', "()", "a + | b", "\\", "a\\", '"a b"~x',
])
def test_degrades_never_throws(broken):
    q = P.parse(broken)
    assert isinstance(q, Q.Query)


def test_unclosed_quote_runs_to_end():
    assert P.parse('"foo bar') == Q.PhraseQuery(("foo", "bar"))


def test_escape():
    # escaped operator chars are literal; simple analyzer then strips
    # non-word chars, so \+foo analyzes to the term foo
    assert P.parse(r"\+foo") == Q.TermQuery("foo")


@given(st.text(
    alphabet=st.sampled_from(list('ab +|-()"~*\\')), max_size=40,
))
@settings(max_examples=300, deadline=None)
def test_fuzz_never_throws(s):
    q = SimpleQueryParser().parse(s)
    assert isinstance(q, Q.Query)
