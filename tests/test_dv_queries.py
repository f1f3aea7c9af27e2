"""Doc-values existence + bytes-range queries:
DocValuesFieldExistsQuery (L/search/DocValuesFieldExistsQuery.java)
and SortedSetDocValuesField.newSlowRangeQuery
(L/search/SortedSetDocValuesRangeQuery.java) analogs, verified against
pandas replays over docmeta."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lucene_solr_8_7_0_spark.config import EngineConfig
from lucene_solr_8_7_0_spark.operators.build import build_index
from lucene_solr_8_7_0_spark.operators.search import IndexSearcher
from lucene_solr_8_7_0_spark.plans import queries as Q
from lucene_solr_8_7_0_spark.sources.corpus import corpus_df


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dvqidx"))
    crc = F.crc32("path")
    docs = corpus_df(spark, 150, seed=13).withColumn(
        "stars", F.when(crc % 4 != 0, (crc % 50).cast("long"))
    ).withColumn(
        "tags",
        F.when(
            crc % 5 != 0,
            F.array(
                F.concat(F.lit("t"), (crc % 3).cast("string")),
                F.concat(F.lit("u"), (crc % 7).cast("string")),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    build_index(spark, docs, d, EngineConfig(segment_size=64))
    s = IndexSearcher(spark, d)
    meta = spark.read.parquet(s.docmeta_path).select(
        "doc_id", "stars", "tags", "lang"
    ).toPandas()
    return s, meta


def _hits(s, clause, must="public"):
    b = Q.Builder()
    b.add(Q.TermQuery(must), Q.Occur.MUST)
    b.add(clause, Q.Occur.FILTER)
    return set(s.matches_df(b.build()).toPandas()["doc_id"])


def test_field_exists_scalar(engine):
    s, meta = engine
    base = _hits(s, Q.MatchAllDocsQuery())
    got = _hits(s, Q.FieldExistsQuery("stars"))
    exp = base & set(meta[meta["stars"].notna()]["doc_id"])
    assert got == exp
    assert 0 < len(got) < len(base)  # nulls really exist


def test_field_exists_array_requires_nonempty(engine):
    s, meta = engine
    base = _hits(s, Q.MatchAllDocsQuery())
    got = _hits(s, Q.FieldExistsQuery("tags"))
    exp = base & set(
        meta[meta["tags"].map(lambda a: a is not None and len(a) > 0)]
        ["doc_id"]
    )
    assert got == exp
    assert 0 < len(got) < len(base)  # empty arrays really exist


def test_field_range_scalar_string(engine):
    s, meta = engine
    base = _hits(s, Q.MatchAllDocsQuery())
    for lo, hi, il, iu in [("de", "en", True, True),
                           ("de", "en", False, True),
                           (None, "en", True, False),
                           ("es", None, True, True)]:
        got = _hits(s, Q.FieldRangeQuery("lang", lo, hi, il, iu))
        lv = meta["lang"]
        m = pd.Series(True, index=meta.index)
        if lo is not None:
            m &= (lv >= lo) if il else (lv > lo)
        if hi is not None:
            m &= (lv <= hi) if iu else (lv < hi)
        exp = base & set(meta[m]["doc_id"])
        assert got == exp, (lo, hi, il, iu)


def test_field_range_array_any_value(engine):
    s, meta = engine
    base = _hits(s, Q.MatchAllDocsQuery())
    got = _hits(s, Q.FieldRangeQuery("tags", "u0", "u3"))
    exp = base & set(
        meta[meta["tags"].map(
            lambda a: a is not None and any("u0" <= v <= "u3" for v in a)
        )]["doc_id"]
    )
    assert got == exp
    assert len(got) > 0
