"""Similarity search over embedding columns (array<float>).

* brute_force_topk — exact cosine top-k: numpy matmul per Arrow batch
  against a broadcast query matrix, partial top-k per partition, tiny
  final reduce.  The baseline and the verifier.
* lsh_topk — random-hyperplane LSH bucketing as the scale path:
  candidates only from matching buckets (with multi-probe by sign
  flips), exact cosine re-scoring on candidates.
* near_dup_pairs — cosine>=threshold pairs via LSH buckets (embedding
  near-duplicate detection for corpus curation).

The heavy math is matmul inside mapInPandas (Arrow batches, zero
per-row Python); shuffles key on bucket hashes (uniform by
construction of random hyperplanes).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F


def _normalize(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return mat / n


def brute_force_topk(
    embeddings: DataFrame,
    queries: pd.DataFrame,  # (query_id, embedding list) — small, broadcast
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Returns (query_id, rank, neighbor_id, cosine double)."""
    spark = embeddings.sparkSession
    qids = queries["query_id"].to_numpy(dtype=np.int64)
    qmat = _normalize(np.asarray([np.asarray(v, np.float64) for v in queries["embedding"]]))
    bc = spark.sparkContext.broadcast((qids, qmat))

    def part_topk(batches):
        qids_, qmat_ = bc.value
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = _normalize(
                np.asarray([np.asarray(v, np.float64) for v in pdf[vec_col]])
            )
            sims = qmat_ @ mat.T  # (Q, B)
            out = []
            for qi in range(len(qids_)):
                row = sims[qi]
                cand = np.arange(len(ids))
                if exclude_self:
                    cand = cand[ids != qids_[qi]]
                if len(cand) == 0:
                    continue
                # per-batch partial top-k: (cosine desc, id asc)
                order = np.lexsort((ids[cand], -row[cand]))[:k]
                sel = cand[order]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": qids_[qi],
                            "neighbor_id": ids[sel],
                            "cosine": row[sel],
                        }
                    )
                )
            yield pd.concat(out) if out else pd.DataFrame(
                {"query_id": [], "neighbor_id": [], "cosine": []}
            )

    partial = embeddings.select(id_col, vec_col).mapInPandas(
        part_topk, schema="query_id bigint, neighbor_id bigint, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def _planes_for(n_tables: int, n_planes: int, dim: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_planes, dim))


#: fixed-point scale for the SQL-replayable signature path: embeddings
#: are float32, so x * 2^20 is exact in float64 and floor() of it is an
#: unambiguous integer on every engine (power-of-two scaling never
#: rounds).  With |x| <= ~1 and plane components in [-1000, 1000], a
#: 64-dim dot product stays under 2^37 — exact in int64 AND in float64.
QUANT_SCALE = 1 << 20


def deterministic_planes(n_tables: int, n_planes: int, dim: int) -> np.ndarray:
    """Integer pseudo-random hyperplanes from a Knuth multiplicative
    hash over (table, plane, dim) — bit-replayable in ANSI SQL with
    int128 mod-mul, which is what lets the driver's DuckDB oracle
    hash-check the APPROXIMATE LSH path end-to-end (signatures, bucket
    join, multiprobe, re-rank) instead of a rows-only check.

    v[t,j,d] = ((t*73856093 + j*19349663 + d*83492791) * 2654435761
                mod 2^32) mod 2001 - 1000     (components in [-1000,1000])

    Quantized-projection sign LSH is the standard trick (the hash
    family only needs symmetric, independent-ish directions); the
    spatial-hash primes + Knuth constant give well-mixed components."""
    out = np.empty((n_tables, n_planes, dim), np.int64)
    for t in range(n_tables):
        for j in range(n_planes):
            for d in range(dim):
                h = t * 73856093 + j * 19349663 + d * 83492791
                out[t, j, d] = ((h * 2654435761) % 4294967296) % 2001 - 1000
    return out


def _quantize_rows(mat_f64: np.ndarray) -> np.ndarray:
    """floor(x * 2^20) as int64 — exact on both numpy and SQL sides."""
    return np.floor(mat_f64 * QUANT_SCALE).astype(np.int64)


def hyperplane_signatures(
    embeddings: DataFrame,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    n_tables: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: np.ndarray | None = None,
    quantize: bool = False,
) -> DataFrame:
    """Random-hyperplane (SimHash-for-vectors) bucket per row per table.

    Multi-table LSH: ``n_tables`` independent plane sets; a candidate
    only needs to collide in ONE table, which is what recovers recall
    on weakly-clustered data (classic (p1, p2)-sensitive LSH
    amplification).

    ``planes``: explicit plane tensor (n_tables, n_planes, dim) — pass
    :func:`deterministic_planes` for the SQL-replayable contract path.
    ``quantize``: project floor(x * 2^20) int64 rows instead of float64
    (exact integer dots; pair with integer planes)."""
    spark = embeddings.sparkSession
    if planes is None:
        planes = _planes_for(n_tables, n_planes, dim, seed)
    bc = spark.sparkContext.broadcast(planes)

    def sig(batches):
        pl = bc.value
        weights = 1 << np.arange(pl.shape[1], dtype=np.int64)
        for pdf in batches:
            mat = np.asarray([np.asarray(v, np.float64) for v in pdf[vec_col]])
            if quantize:
                mat = _quantize_rows(mat)
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            outs = []
            for t in range(pl.shape[0]):
                bits = (mat @ pl[t].T) > 0
                bucket = (bits.astype(np.int64) * weights[None, :]).sum(axis=1)
                outs.append(
                    pd.DataFrame(
                        {
                            "vec_id": ids,
                            "table": t,
                            "bucket": bucket,
                            "embedding": pdf[vec_col],
                        }
                    )
                )
            yield pd.concat(outs, ignore_index=True)

    return embeddings.select(id_col, vec_col).mapInPandas(
        sig,
        schema=f"vec_id bigint, table int, bucket bigint, {vec_col} array<float>",
    )


def lsh_topk(
    embeddings: DataFrame,
    queries: pd.DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    multiprobe: int = 1,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: np.ndarray | None = None,
    quantize: bool = False,
) -> DataFrame:
    """Approximate cosine top-k: probe each table's query bucket (plus
    buckets at hamming distance <= multiprobe), exact re-score the
    union of candidates.  Bucket join shuffles on (table, bucket) —
    uniform keys; the probe side is broadcast.

    ``planes``/``quantize``: see :func:`hyperplane_signatures` — with
    ``deterministic_planes`` + ``quantize=True`` the whole approximate
    path is exactly replayable in SQL (integer projections)."""
    spark = embeddings.sparkSession
    if planes is None:
        planes = _planes_for(n_tables, n_planes, dim, seed)
    sigs = hyperplane_signatures(
        embeddings, n_planes, dim, seed, n_tables, id_col, vec_col,
        planes=planes, quantize=quantize,
    )

    # query buckets with multi-probe expansion (driver side, tiny)
    weights = 1 << np.arange(n_planes, dtype=np.int64)
    probe_rows = []
    for _, r in queries.iterrows():
        v = np.asarray(r["embedding"], np.float64)
        if quantize:
            v = _quantize_rows(v[None, :])[0]
        for t in range(n_tables):
            bits = (planes[t] @ v) > 0
            base = int((bits.astype(np.int64) * weights).sum())
            buckets = {base}
            if multiprobe >= 1:
                for i in range(n_planes):
                    buckets.add(base ^ (1 << i))
            if multiprobe >= 2:
                for i in range(n_planes):
                    for j in range(i + 1, n_planes):
                        buckets.add(base ^ (1 << i) ^ (1 << j))
            for b in buckets:
                probe_rows.append(
                    (int(r["query_id"]), t, b, list(map(float, r["embedding"])))
                )
    probes = spark.createDataFrame(
        probe_rows,
        schema="query_id bigint, table int, bucket bigint, q_emb array<float>",
    )
    cand = sigs.join(F.broadcast(probes), ["table", "bucket"]).filter(
        F.col("vec_id") != F.col("query_id")
    )
    dot = F.aggregate(
        F.zip_with(vec_col, "q_emb", lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(
        F.aggregate(
            F.transform(c, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (dot / (norm(F.col(vec_col)) * norm(F.col("q_emb")))).alias("cosine"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def train_ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = 64,
    seed: int = 42,
    sample: int = 20_000,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """IVF coarse quantizer: Lloyd iterations on a deterministic sample.

    The sample is a bounded collect (`sample` rows picked by id stride,
    not data order), so training cost is independent of corpus size —
    the standard IVF shortcut; the distributed part is only the
    assignment pass.  Centroids live on the unit sphere (spherical
    k-means) because the metric is cosine."""
    n = embeddings.count()
    step = max(n // sample, 1)
    pdf = (
        embeddings.filter(F.col(id_col) % step == 0)
        .limit(sample)
        .select(vec_col)
        .toPandas()
    )
    mat = _normalize(np.asarray([np.asarray(v, np.float64) for v in pdf[vec_col]]))
    rng = np.random.default_rng(seed)
    k_eff = min(n_centroids, len(mat))
    cent = mat[rng.choice(len(mat), size=k_eff, replace=False)]
    for _ in range(iters):
        assign = np.argmax(mat @ cent.T, axis=1)
        for c in range(k_eff):
            members = mat[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def ivf_assign(
    embeddings: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cluster, embedding): nearest-centroid assignment, one
    matmul per Arrow batch against the broadcast codebook."""
    spark = embeddings.sparkSession
    bc = spark.sparkContext.broadcast(np.asarray(centroids, np.float64))

    def assign(batches):
        cent = bc.value
        for pdf in batches:
            mat = _normalize(
                np.asarray([np.asarray(v, np.float64) for v in pdf[vec_col]])
            )
            cl = np.argmax(mat @ cent.T, axis=1).astype(np.int32)
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(dtype=np.int64),
                    "cluster": cl,
                    "embedding": pdf[vec_col],
                }
            )

    return embeddings.select(id_col, vec_col).mapInPandas(
        assign, schema=f"vec_id bigint, cluster int, {vec_col} array<float>"
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: pd.DataFrame,
    k: int = 5,
    n_centroids: int = 64,
    n_probe: int = 8,
    seed: int = 42,
    centroids: np.ndarray | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate cosine top-k (the FAISS-IVF-flat shape): assign
    every vector to its nearest coarse centroid, probe each query's
    ``n_probe`` nearest clusters, exact-rescore the union.

    Scale shape: the assignment is a narrow map; the candidate join
    shuffles on `cluster` (bounded cardinality = n_centroids; at
    corpus scale use n_centroids ~ sqrt(N) so clusters stay balanced);
    the probe side is broadcast.  ``n_probe == n_centroids`` degrades
    gracefully to exact brute force (useful as a correctness check)."""
    spark = embeddings.sparkSession
    if centroids is None:
        centroids = train_ivf_centroids(
            embeddings, n_centroids, seed, id_col=id_col, vec_col=vec_col
        )
    assigned = ivf_assign(embeddings, centroids, id_col, vec_col)
    cent = np.asarray(centroids, np.float64)
    probe_rows = []
    for _, r in queries.iterrows():
        v = np.asarray(r["embedding"], np.float64)
        nv = v / (np.linalg.norm(v) or 1.0)
        order = np.argsort(-(cent @ nv))[: min(n_probe, len(cent))]
        for c in order:
            probe_rows.append(
                (int(r["query_id"]), int(c), list(map(float, r["embedding"])))
            )
    probes = spark.createDataFrame(
        probe_rows, schema="query_id bigint, cluster int, q_emb array<float>"
    )
    cand = assigned.join(F.broadcast(probes), ["cluster"]).filter(
        F.col("vec_id") != F.col("query_id")
    )
    dot = F.aggregate(
        F.zip_with(vec_col, "q_emb", lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(
        F.aggregate(
            F.transform(c, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (dot / (norm(F.col(vec_col)) * norm(F.col("q_emb")))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 12,
    dim: int = 64,
    seed: int = 42,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH bucket self-join.

    High-cosine pairs disagree on few hyperplanes, so with several
    independent tables they collide in at least one with overwhelming
    probability; candidates are exactly re-scored.

    ``max_bucket_size`` (default 1000) drops (table, bucket) groups
    larger than the cap before the self-join — a dense embedding
    cluster otherwise makes one reducer's join quadratic at scale
    (same skew guard as the MinHash LSH path)."""
    from .dedup import _cap_buckets

    sigs = hyperplane_signatures(
        embeddings, n_planes, dim, seed, n_tables, id_col, vec_col
    )
    sigs = _cap_buckets(sigs, ["table", "bucket"], max_bucket_size)
    a, b = sigs.alias("a"), sigs.alias("b")
    pairs = a.join(
        b,
        (F.col("a.table") == F.col("b.table"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    )
    dot = F.aggregate(
        F.zip_with(
            "a.embedding", "b.embedding",
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(
        F.aggregate(
            F.transform(c, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return (
        pairs.select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            (dot / (norm(F.col("a.embedding")) * norm(F.col("b.embedding")))).alias(
                "cosine"
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .distinct()
    )
