"""Connected-components clustering of near-duplicate pairs
(large-star/small-star alternation), the pair->cluster step of a
training-data dedup pipeline."""

import pandas as pd
import pytest

from lucene_solr_8_7_0_spark.operators.dedup import cluster_duplicates


def _clusters_of(spark, edges):
    df = spark.createDataFrame(
        pd.DataFrame(edges, columns=["doc_a", "doc_b"])
    )
    got = cluster_duplicates(df).collect()
    return {r["doc_id"]: r["cluster_id"] for r in got}


def _brute(edges):
    """Union-find ground truth with min-id representatives."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


@pytest.mark.parametrize("edges", [
    [(1, 2)],
    [(1, 2), (2, 3), (3, 4)],                      # chain
    [(10, 2), (2, 30), (5, 6)],                    # two components
    [(1, 2), (3, 4), (4, 1), (7, 8), (9, 8)],      # merge via later edge
    [(i, i + 1) for i in range(1, 40)],            # long chain (log rounds)
    [(100, 1), (100, 2), (100, 3), (2, 200)],      # star + tail
    [(5, 5), (1, 2), (2, 1)],                      # self loop + dup both ways
])
def test_cluster_duplicates_matches_union_find(spark, edges):
    got = _clusters_of(spark, edges)
    want = _brute(edges)
    assert got == want


def test_cluster_duplicates_empty(spark):
    df = spark.createDataFrame([], "doc_a bigint, doc_b bigint")
    assert cluster_duplicates(df).count() == 0


def test_cluster_duplicates_random(spark):
    import random

    rng = random.Random(7)
    edges = [(rng.randrange(300), rng.randrange(300)) for _ in range(180)]
    got = _clusters_of(spark, edges)
    assert got == _brute(edges)


def test_ngram_overlap_contamination(spark):
    from lucene_solr_8_7_0_spark.operators.dedup import (
        ngram_overlap_contamination,
    )

    base = " ".join(f"w{i}" for i in range(30))
    docs = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": [1, 2, 3],
            "text": [
                base,                                   # contains the bench gram
                base.replace("w5", "x5"),               # broken 13-gram run
                "totally different words only here",    # clean
            ],
        })
    )
    bench = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": [100],
            "text": [" ".join(f"w{i}" for i in range(2, 20))],  # 18 tokens
        })
    )
    got = {
        (r["doc_id"], r["bench_id"]): r["n_shared"]
        for r in ngram_overlap_contamination(docs, bench, n=13).collect()
    }
    # bench has 6 distinct 13-grams (w2..w7 starts); all 6 occur in
    # doc 1; doc 2 (w5 broken) keeps only the w6/w7-start grams
    assert got == {(1, 100): 6, (2, 100): 2}
    # a ubiquitous-gram cap of 0 drops everything (skew guard active)
    assert ngram_overlap_contamination(
        docs, bench, n=13, max_gram_df=0
    ).count() == 0
    # min_shared filters
    assert ngram_overlap_contamination(
        docs, bench, n=13, min_shared=7
    ).count() == 0
