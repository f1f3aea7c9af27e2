"""Product-quantization ANN: encode determinism, numpy replay of the
ADC path, and shortlist+re-rank recall against brute force."""

import numpy as np
import pandas as pd
import pytest

from lucene_solr_8_7_0_spark.operators.ann import (
    brute_force_topk,
    _quantize_rows,
)
from lucene_solr_8_7_0_spark.operators.pqann import (
    _codes_for,
    pq_codebook_from_ids,
    pq_encode,
    pq_topk,
    pq_train,
)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def _emb_pdf(emb):
    pdf = emb.toPandas()
    mat = np.asarray([np.asarray(v, np.float64) for v in pdf["embedding"]])
    return pdf["vec_id"].to_numpy(np.int64), mat


def test_pq_encode_matches_numpy(spark, emb):
    books = pq_codebook_from_ids(emb, ids=range(40, 56), m=8)
    assert books.shape == (8, 16, 8) and books.dtype.kind == "i"
    ids, mat = _emb_pdf(emb)
    exp = _codes_for(
        _quantize_rows(mat).astype(np.float64), books.astype(np.float64)
    )
    got = {
        r["vec_id"]: r["codes"] for r in pq_encode(emb, books).collect()
    }
    for i, vid in enumerate(ids):
        assert got[vid] == exp[i].tolist()


def test_pq_adc_matches_numpy(spark, emb):
    books = pq_codebook_from_ids(emb, ids=range(40, 56), m=8)
    ids, mat = _emb_pdf(emb)
    q = _quantize_rows(mat).astype(np.float64)
    codes = _codes_for(q, books.astype(np.float64))
    queries = pd.DataFrame({
        "query_id": ids[:5],
        "embedding": [mat[i].tolist() for i in range(5)],
    })
    got = pq_topk(emb, queries, books, k=5).toPandas()
    bf = books.astype(np.float64)
    for qi in range(5):
        luts = np.stack([
            ((q[qi, s * 8:(s + 1) * 8][None, :] - bf[s]) ** 2).sum(axis=1)
            for s in range(8)
        ])
        ad = luts[np.arange(8)[None, :], codes].sum(axis=1)
        mask = ids != ids[qi]
        order = np.lexsort((ids[mask], ad[mask]))[:5]
        exp_ids = ids[mask][order]
        g = got[got["query_id"] == ids[qi]].sort_values("rank")
        assert g["neighbor_id"].tolist() == exp_ids.tolist()
        np.testing.assert_allclose(
            g["adist"].to_numpy(), ad[mask][order]
        )


def test_pq_rerank_recall(spark, emb):
    books = pq_train(emb, m=8, k=16, iters=8, seed=7, sample_size=1000)
    queries = (
        emb.filter("vec_id < 20")
        .selectExpr("vec_id AS query_id", "embedding").toPandas()
    )
    exact = brute_force_topk(emb, queries, k=5).toPandas()
    approx = pq_topk(emb, queries, books, k=5, rerank=60).toPandas()
    hits = tot = 0
    for qid, g in exact.groupby("query_id"):
        want = set(g["neighbor_id"])
        have = set(approx[approx["query_id"] == qid]["neighbor_id"])
        hits += len(want & have)
        tot += len(want)
    recall = hits / tot
    assert recall >= 0.8, f"shortlist+rerank recall {recall:.2f}"
