"""Numeric doc-values updates (IndexWriter.updateNumericDocValue
analog): metadata changes without reindex, latest generation wins,
every docmeta consumer sees the overlay, base files untouched."""

import os

import pytest

from lucene_solr_8_7_0_spark.config import EngineConfig
from lucene_solr_8_7_0_spark.operators.build import build_index
from lucene_solr_8_7_0_spark.operators.dvupdates import (
    read_dv_generation,
    update_numeric_docvalue,
)
from lucene_solr_8_7_0_spark.operators.search import IndexSearcher
from lucene_solr_8_7_0_spark.plans import queries as Q
from lucene_solr_8_7_0_spark.sources.corpus import corpus_df


@pytest.fixture()
def upd_idx(spark, tmpdir_path):
    docs = corpus_df(spark, 120, seed=11)
    build_index(spark, docs, tmpdir_path, EngineConfig(segment_size=64))
    return IndexSearcher(spark, tmpdir_path)


def test_update_numeric_docvalue(spark, upd_idx):
    s = upd_idx
    idx = s.index_dir
    pub = sorted(
        r["doc_id"] for r in s.matches_df(Q.TermQuery("public")).collect()
    )
    assert pub, "corpus should contain 'public'"
    base_files = sorted(os.listdir(os.path.join(idx, "docmeta")))

    n = update_numeric_docvalue(s, "public", "length", 5000.0)
    assert n == len(pub)
    assert read_dv_generation(idx) == 1

    # every point-range consumer sees the new value...
    got = sorted(
        r["doc_id"]
        for r in s.matches_df(
            Q.PointRangeQuery("length", 4000, 6000)
        ).collect()
    )
    assert got == pub
    # ...and the updated docs left their old range
    lo = s.matches_df(Q.PointRangeQuery("length", None, 3999)).collect()
    assert not set(pub) & {r["doc_id"] for r in lo}

    # sorted search reflects the overlay: the top by length desc are
    # exactly updated docs (5000 beats every organic length)
    top = s.search_sorted(
        Q.MatchAllDocsQuery(), [Q.SortField("length", reverse=True)],
        k=len(pub),
    ).collect()
    assert sorted(r["doc_id"] for r in top) == pub
    assert all(r["length"] == 5000 for r in top)

    # a second update wins by generation (latest value per doc)
    n2 = update_numeric_docvalue(s, "public", "length", 7000.0)
    assert n2 == n and read_dv_generation(idx) == 2
    assert s.matches_df(Q.PointRangeQuery("length", 4000, 6000)).count() == 0
    assert s.matches_df(Q.PointRangeQuery("length", 6500, 7500)).count() == len(pub)

    # the base docmeta parquet was never rewritten (merge-on-read)
    assert sorted(os.listdir(os.path.join(idx, "docmeta"))) == base_files

    # updating a non-existent field fails loudly, like the reference
    with pytest.raises(ValueError, match="existing numeric"):
        update_numeric_docvalue(s, "public", "nope_field", 1.0)
    # a term with no matches commits nothing
    g = read_dv_generation(idx)
    assert update_numeric_docvalue(s, "zzzzqqqq", "length", 1.0) == 0
    assert read_dv_generation(idx) == g


def test_checkindex_covers_dvupdates(spark, upd_idx):
    from lucene_solr_8_7_0_spark.operators.checkindex import check_index
    from lucene_solr_8_7_0_spark.operators.dvupdates import dv_updates_path

    s = upd_idx
    update_numeric_docvalue(s, "public", "length", 5000.0)
    assert check_index(spark, s.index_dir).count() == 0
    # corrupt: a dangling doc id and an unknown field
    spark.createDataFrame(
        [(10**9, "length", 1.0, 99), (1, "ghost_col", 2.0, 99)],
        "doc_id long, field string, value double, gen long",
    ).write.mode("append").parquet(dv_updates_path(s.index_dir))
    checks = {
        r["check"] for r in check_index(spark, s.index_dir).collect()
    }
    assert "dvupdates_dangling_doc" in checks
    assert "dvupdates_unknown_field" in checks
