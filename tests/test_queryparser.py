"""Classic QueryParser: syntax -> IR golden trees
(queryparser/classic/QueryParserBase.java, QueryParser.jj)."""

from lucene_solr_8_7_0_spark.plans import queries as Q
from lucene_solr_8_7_0_spark.plans.queryparser import parse


def bq(*clauses, msm=0):
    b = Q.Builder()
    for occur, q in clauses:
        b.add(q, occur)
    return b.set_minimum_number_should_match(msm).build()


S, M, N, F_ = Q.Occur.SHOULD, Q.Occur.MUST, Q.Occur.MUST_NOT, Q.Occur.FILTER


def test_terms_and_prefixes():
    assert parse("data") == Q.TermQuery("data")
    assert parse("+a -b c") == bq(
        (M, Q.TermQuery("a")), (N, Q.TermQuery("b")), (S, Q.TermQuery("c"))
    )
    assert parse("NOT a b") == bq((N, Q.TermQuery("a")), (S, Q.TermQuery("b")))


def test_connectives_classic_semantics():
    # "a AND b OR c" -> +a +b c (AND retroactively requires the left
    # clause; OR leaves the next optional) — QueryParser.jj Conjunction
    assert parse("a AND b OR c") == bq(
        (M, Q.TermQuery("a")), (M, Q.TermQuery("b")), (S, Q.TermQuery("c"))
    )
    assert parse("a && b") == bq((M, Q.TermQuery("a")), (M, Q.TermQuery("b")))
    assert parse("a || b") == bq((S, Q.TermQuery("a")), (S, Q.TermQuery("b")))


def test_grouping_and_boost():
    inner = bq((S, Q.TermQuery("b")), (S, Q.TermQuery("c")))
    assert parse("+a +(b c)") == bq((M, Q.TermQuery("a")), (M, inner))
    assert parse("a (b c)^2") == bq(
        (S, Q.TermQuery("a")), (S, Q.BoostQuery(inner, 2.0))
    )
    assert parse("a^3") == Q.BoostQuery(Q.TermQuery("a"), 3.0)


def test_phrases_slop_fuzzy_wildcards():
    assert parse('"big data"') == Q.PhraseQuery(("big", "data"))
    assert parse('"big data"~2') == Q.PhraseQuery(("big", "data"), slop=2)
    assert parse("spark~") == Q.FuzzyQuery("spark", max_edits=2)
    assert parse("spark~1") == Q.FuzzyQuery("spark", max_edits=1)
    assert parse("spark~0") == Q.TermQuery("spark")
    assert parse("pre*") == Q.PrefixQuery("pre")
    assert parse("te?t") == Q.WildcardQuery("te?t")
    assert parse("a*b") == Q.WildcardQuery("a*b")
    assert parse("/ab[c]+/") == Q.RegexpQuery("ab[c]+")


def test_fields_and_ranges():
    assert parse("lang:de") == Q.FieldTermQuery("lang", "de")
    assert parse("content:data") == Q.TermQuery("data")  # default field
    assert parse("length:[60 TO 120]") == Q.PointRangeQuery(
        "length", 60.0, 120.0
    )
    assert parse("length:{60 TO *}") == Q.PointRangeQuery(
        "length", 60.0, None, include_lower=False, include_upper=False
    )
    assert parse("length:7") == Q.PointRangeQuery("length", 7.0, 7.0)
    assert parse("[data TO dz]") == Q.TermRangeQuery("data", "dz")
    assert parse("{data TO dz}") == Q.TermRangeQuery(
        "data", "dz", include_lower=False, include_upper=False
    )


def test_mixed_query():
    got = parse('+data +(join vector) -sca* +length:[60 TO 120] +lang:de')
    want = bq(
        (M, Q.TermQuery("data")),
        (M, bq((S, Q.TermQuery("join")), (S, Q.TermQuery("vector")))),
        (N, Q.PrefixQuery("sca")),
        (M, Q.PointRangeQuery("length", 60.0, 120.0)),
        (M, Q.FieldTermQuery("lang", "de")),
    )
    assert got == want


def test_empty_and_degenerate():
    assert parse("") == Q.MatchNoDocsQuery("empty query string")
    assert parse("   ") == Q.MatchNoDocsQuery("empty query string")
    assert parse("AND") == Q.MatchNoDocsQuery("empty query string")


def test_query_time_synonyms():
    """SynonymGraphFilter surface: a mapped term parses to a
    SynonymQuery over the group (blended-stats scoring downstream)."""
    from lucene_solr_8_7_0_spark.plans.queryparser import QueryParser

    p = QueryParser(synonyms={"quick": ["fast", "speedy"]})
    assert p.parse("quick") == Q.SynonymQuery(("quick", "fast", "speedy"))
    assert p.parse("+quick brown") == bq(
        (M, Q.SynonymQuery(("quick", "fast", "speedy"))),
        (S, Q.TermQuery("brown")),
    )
    # non-mapped terms, phrases and fields are untouched
    assert p.parse("brown") == Q.TermQuery("brown")
    assert p.parse('"quick brown"') == Q.PhraseQuery(("quick", "brown"))
    assert p.parse("lang:quick") == Q.FieldTermQuery("lang", "quick")


def test_fielded_phrase_is_keyword_equality():
    # field:"..." on a metadata (keyword/StringField) field compiles to
    # exact equality on the raw quoted text — never a silent
    # default-field phrase (round-4 fix)
    assert parse('lang:"de fr"') == Q.FieldTermQuery("lang", "de fr")
    assert parse('+a +lang:"de"') == bq(
        (M, Q.TermQuery("a")), (M, Q.FieldTermQuery("lang", "de"))
    )
    # default-field phrases still parse as PhraseQuery
    assert parse('content:"a b"') == Q.PhraseQuery(("a", "b"))


def test_fielded_regexp_rejected():
    import pytest

    with pytest.raises(ValueError, match="regexp on non-default field"):
        parse("lang:/d./")
    assert parse("content:/d./") == Q.RegexpQuery("d.")


def test_unterminated_quote_raises_valueerror():
    import pytest

    # round-5 fix: used to raise AttributeError (None.group) deep in
    # _parse_clause; the parser must surface its own error family
    with pytest.raises(ValueError, match="malformed phrase"):
        parse('lang:"unclosed')
    with pytest.raises(ValueError, match="malformed phrase"):
        parse('"unclosed')


def test_multiword_synonym_graph_shape():
    """A multi-word synonym parses to the QueryBuilder graph side-path
    shape (analyzeGraphBoolean + newGraphSynonymQuery): SHOULD of the
    original TermQuery and a slop-0 PhraseQuery per multi-token path;
    single-token alternatives stay TermQuery clauses."""
    from lucene_solr_8_7_0_spark.plans import queries as Q
    from lucene_solr_8_7_0_spark.plans.queryparser import QueryParser

    q = QueryParser(synonyms={"data": ["fast scan", "info"]}).parse("data")
    assert isinstance(q, Q.BooleanQuery)
    kinds = sorted(type(c.query).__name__ for c in q.clauses)
    assert kinds == ["PhraseQuery", "TermQuery", "TermQuery"]
    ph = [c.query for c in q.clauses if isinstance(c.query, Q.PhraseQuery)][0]
    assert ph.terms == ("fast", "scan") and ph.slop == 0
    assert all(c.occur == Q.Occur.SHOULD for c in q.clauses)
    # single-token-only synonyms keep the blended-stats SynonymQuery
    q2 = QueryParser(synonyms={"data": ["join"]}).parse("data")
    assert isinstance(q2, Q.SynonymQuery)
