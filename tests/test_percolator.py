"""MemoryIndex / percolator (streaming/percolator.py).

Parity contract: for every registered query shape, the percolator's
match set over a batch of rows == searching the COMMITTED index built
from the same rows (MemoryIndex.java:94-101 — the transient one-doc
index must accept exactly the docs the durable index would return).
Plus the real Structured-Streaming path: foreachBatch over a 4-file
stream appends the same matches the static batch produces.
"""

import os

import numpy as np
import pyspark.sql.functions as F
import pytest

from lucene_solr_8_7_0_spark.config import EngineConfig
from lucene_solr_8_7_0_spark.operators.build import build_index
from lucene_solr_8_7_0_spark.operators.search import IndexSearcher
from lucene_solr_8_7_0_spark.plans import queries as Q
from lucene_solr_8_7_0_spark.sources.corpus import corpus_df
from lucene_solr_8_7_0_spark.streaming.percolator import Percolator

N_FILES = 200


def _registered():
    b = Q.Builder()
    b.add(Q.TermQuery("public"), Q.Occur.MUST)
    b.add(Q.TermQuery("return"), Q.Occur.MUST)
    b.add(Q.TermQuery("import"), Q.Occur.MUST_NOT)
    msm = Q.Builder()
    msm.add(Q.TermQuery("public"), Q.Occur.SHOULD)
    msm.add(Q.TermQuery("static"), Q.Occur.SHOULD)
    msm.add(Q.TermQuery("void"), Q.Occur.SHOULD)
    msm.minimum_should_match = 2
    return {
        "term": Q.TermQuery("public"),
        "and_not": b.build(),
        "msm2": msm.build(),
        "phrase": Q.PhraseQuery(("public", "static")),
        "prefix": Q.PrefixQuery("sta"),
        "range": Q.PointRangeQuery("length", 40, 90),
        "never": Q.TermQuery("zzz_nonexistent_term"),
    }


@pytest.fixture(scope="module")
def corpus_and_index(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_perc"))
    cfg = EngineConfig(segment_size=64)
    docs = corpus_df(spark, N_FILES, seed=13)
    build_index(spark, docs, d, cfg)
    return docs, IndexSearcher(spark, d), cfg


def test_percolate_parity_vs_committed_index(spark, corpus_and_index):
    docs, searcher, cfg = corpus_and_index
    perc = Percolator(_registered(), cfg)
    got = (
        perc.percolate(docs)
        .groupBy("query_id")
        .agg(F.sort_array(F.collect_list(F.concat_ws("/", "repo", "path")))
             .alias("keys"))
        .toPandas()
        .set_index("query_id")["keys"]
        .to_dict()
    )
    meta = spark.read.parquet(searcher.docmeta_path).select(
        "doc_id", F.concat_ws("/", "repo", "path").alias("key")
    )
    for qid, q in _registered().items():
        exp = sorted(
            r["key"]
            for r in searcher.matches_df(q).join(meta, "doc_id").collect()
        )
        assert list(got.get(qid, [])) == exp, qid
    assert "never" not in got


def test_percolate_partitioning_invariance(spark, corpus_and_index):
    """Partition-local mini-indexes must not change the result: 1
    partition == 8 partitions (no cross-doc state leaks)."""
    docs, _, cfg = corpus_and_index
    perc = Percolator({"phrase": Q.PhraseQuery(("public", "static"))}, cfg)
    one = set(
        (r["repo"], r["path"])
        for r in perc.percolate(docs.coalesce(1)).collect()
    )
    many = set(
        (r["repo"], r["path"])
        for r in perc.percolate(docs.repartition(8)).collect()
    )
    assert one == many and len(one) > 0


def test_percolate_streaming(spark, corpus_and_index, tmpdir_path):
    """The foreachBatch sink: a 4-file stream percolated incrementally
    accumulates exactly the static batch's matches."""
    docs, _, cfg = corpus_and_index
    src = os.path.join(tmpdir_path, "src")
    out = os.path.join(tmpdir_path, "perc_out")
    docs.repartitionByRange(4, "path").write.parquet(src)
    regs = {"term": Q.TermQuery("public"),
            "phrase": Q.PhraseQuery(("public", "static"))}
    perc = Percolator(regs, cfg)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = perc.start(stream, out)
    q.awaitTermination()
    got = set(
        (r["query_id"], r["repo"], r["path"])
        for r in spark.read.parquet(os.path.join(out, "matches")).collect()
    )
    exp = set(
        (r["query_id"], r["repo"], r["path"])
        for r in perc.percolate(docs).collect()
    )
    assert got == exp and len(exp) > 0
