"""Product-quantization ANN (PQ + asymmetric distance computation).

Public method: Jégou, Douze, Schmid — "Product Quantization for
Nearest Neighbor Search", IEEE TPAMI 2011: split the vector into m
subvectors, vector-quantize each subspace against its own k-entry
codebook (codes = m small ints per vector), and approximate the L2
distance query→vector as the sum over subspaces of the PRECOMPUTED
query-to-centroid distances of the vector's codes (the ADC lookup
table).  Complements the engine's LSH (bucketed) and IVF (partial
probe) scale paths: PQ compresses the vectors themselves (m bytes vs
4·dim), so a 100 TB embedding corpus scans its codes from memory-size
parquet while the exact vectors stay cold until a shortlist re-rank.

Two codebook modes, same kernels:

* ``pq_train`` — Lloyd's k-means per subspace over a bounded,
  seeded driver sample (float64; the quality path, recall
  pytest-asserted with shortlist re-rank),
* ``pq_codebook_from_ids`` — data-sampled centroids on the engine's
  fixed-point grid (floor(x·2^20), operators/ann.QUANT_SCALE): every
  assignment and ADC sum is then EXACT integer arithmetic, which is
  what lets the driver's DuckDB oracle replay the whole approximate
  path bit-for-bit (the same trick as ann.deterministic_planes).

Spark-first shape: encoding + per-partition partial top-k run in one
mapInPandas over the embeddings (numpy batch math, queries
broadcast); the global top-k is a per-query window over
partitions × k rows.  No all-pairs anything.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from .ann import QUANT_SCALE, _normalize, _quantize_rows

__all__ = [
    "pq_train",
    "pq_codebook_from_ids",
    "pq_encode",
    "pq_topk",
]


def _as_mat(series) -> np.ndarray:
    return np.asarray([np.asarray(v, np.float64) for v in series])


def pq_train(
    embeddings: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 10,
    seed: int = 42,
    sample_size: int = 2000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Lloyd-trained codebooks, (m, k, dim/m) float64.  The training
    sample is bounded, seeded and SORT-KEYED (first sample_size ids,
    like IVF), so a 100 TB corpus never feeds the driver more than
    ``sample_size`` rows and two runs train identical books."""
    pdf = (
        embeddings.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(sample_size)
        .toPandas()
    )
    mat = _as_mat(pdf[vec_col])
    dim = mat.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, k, sub), np.float64)
    for s in range(m):
        x = mat[:, s * sub:(s + 1) * sub]
        cent = x[rng.choice(len(x), size=k, replace=False)].copy()
        for _ in range(iters):
            d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            for c in range(k):
                mask = a == c
                if mask.any():
                    cent[c] = x[mask].mean(axis=0)
        books[s] = cent
    return books


def pq_codebook_from_ids(
    embeddings: DataFrame,
    ids,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Data-sampled fixed-point codebooks, (m, k, dim/m) int64 on the
    floor(x·2^20) grid — centroid c of EVERY subspace is the
    quantized subvector of the c-th sampled vector (deterministic,
    SQL-replayable)."""
    ids = [int(i) for i in ids]
    pdf = (
        embeddings.filter(F.col(id_col).isin(ids))
        .select(id_col, vec_col).toPandas()
        .set_index(id_col).loc[ids]
    )
    mat = _quantize_rows(_as_mat(pdf[vec_col]))
    dim = mat.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    return np.stack(
        [mat[:, s * sub:(s + 1) * sub] for s in range(m)]
    )  # (m, k, sub)


def _codes_for(mat: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(B, dim) -> (B, m) codes; ties break on the lower centroid."""
    m, _k, sub = books.shape
    out = np.empty((mat.shape[0], m), np.int64)
    for s in range(m):
        x = mat[:, s * sub:(s + 1) * sub]
        d2 = ((x[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
        out[:, s] = d2.argmin(axis=1)  # argmin = first minimum = low c
    return out


def pq_encode(
    embeddings: DataFrame,
    books: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, codes array<int>) — m small ints per vector."""
    spark = embeddings.sparkSession
    quant = books.dtype.kind == "i"
    bc = spark.sparkContext.broadcast(books)

    def enc(batches):
        bk = bc.value
        for pdf in batches:
            mat = _as_mat(pdf[vec_col])
            mat = _quantize_rows(mat).astype(np.float64) if quant else mat
            codes = _codes_for(mat, bk.astype(np.float64))
            yield pd.DataFrame({
                "vec_id": pdf[id_col].to_numpy(dtype=np.int64),
                "codes": [c.tolist() for c in codes],
            })

    return embeddings.select(id_col, vec_col).mapInPandas(
        enc, schema="vec_id bigint, codes array<int>"
    )


def pq_topk(
    embeddings: DataFrame,
    queries: pd.DataFrame,  # (query_id, embedding), small, broadcast
    books: np.ndarray,
    k: int = 5,
    rerank: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """ADC top-k: encode + lookup-table distance in ONE pass over the
    embeddings, per-partition partial top-k, then a per-query window.
    ``rerank > 0`` keeps a shortlist of that size and re-ranks it by
    EXACT cosine (the standard PQ shortlist + re-rank), returning the
    exact-cosine top-k of the shortlist.  Returns
    (query_id, rank, neighbor_id, adist)."""
    spark = embeddings.sparkSession
    quant = books.dtype.kind == "i"
    qids = queries["query_id"].to_numpy(dtype=np.int64)
    qmat = _as_mat(queries["embedding"])
    qmat_d = _quantize_rows(qmat).astype(np.float64) if quant else qmat
    m, kc, sub = books.shape
    # the ADC lookup tables: (Q, m, k) query-subvector -> centroid d2
    luts = np.empty((len(qids), m, kc), np.float64)
    bf = books.astype(np.float64)
    for s in range(m):
        qs = qmat_d[:, s * sub:(s + 1) * sub]
        luts[:, s, :] = (
            (qs[:, None, :] - bf[s][None, :, :]) ** 2
        ).sum(axis=2)
    shortlist = max(k, rerank)
    bc = spark.sparkContext.broadcast((qids, luts, books))

    def part(batches):
        qids_, luts_, bk = bc.value
        bkf = bk.astype(np.float64)
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = _as_mat(pdf[vec_col])
            matq = (
                _quantize_rows(mat).astype(np.float64) if quant else mat
            )
            codes = _codes_for(matq, bkf)
            out = []
            for qi in range(len(qids_)):
                ad = luts_[qi][np.arange(m)[None, :], codes].sum(axis=1)
                cand = np.arange(len(ids))
                if exclude_self:
                    cand = cand[ids != qids_[qi]]
                if len(cand) == 0:
                    continue
                order = np.lexsort((ids[cand], ad[cand]))[:shortlist]
                sel = cand[order]
                out.append(pd.DataFrame({
                    "query_id": qids_[qi],
                    "neighbor_id": ids[sel],
                    "adist": ad[sel],
                }))
            yield pd.concat(out) if out else pd.DataFrame(
                {"query_id": [], "neighbor_id": [], "adist": []}
            )

    partial = embeddings.select(id_col, vec_col).mapInPandas(
        part, schema="query_id bigint, neighbor_id bigint, adist double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("neighbor_id").asc()
    )
    short = (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= shortlist)
    )
    if not rerank:
        return short.filter(F.col("rank") <= k).select(
            "query_id", "rank", "neighbor_id", "adist"
        )
    # exact-cosine re-rank of the shortlist (broadcast both tiny sides)
    qn = _normalize(qmat)
    bcq = spark.sparkContext.broadcast((qids, qn))

    def exact(batches):
        qids_, qn_ = bcq.value
        lut = {int(q): i for i, q in enumerate(qids_)}
        for pdf in batches:
            mat = _normalize(_as_mat(pdf[vec_col]))
            qi = np.asarray([lut[int(q)] for q in pdf["query_id"]])
            cos = (qn_[qi] * mat).sum(axis=1)
            yield pd.DataFrame({
                "query_id": pdf["query_id"],
                "neighbor_id": pdf["neighbor_id"],
                "cosine": cos,
            })

    joined = short.join(
        embeddings.select(
            F.col(id_col).alias("neighbor_id"), vec_col
        ),
        "neighbor_id",
    ).select("query_id", "neighbor_id", vec_col)
    rer = joined.mapInPandas(
        exact, schema="query_id bigint, neighbor_id bigint, cosine double"
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        rer.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )
