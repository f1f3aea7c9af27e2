"""Search-result clustering — the Solr clustering component surface.

Reference: solr/contrib/clustering/src/java/org/apache/solr/handler/
clustering/ClusteringComponent.java (+ the Carrot2 engine wiring):
cluster the RETURNED RESULT PAGE into labeled topical groups.  The
page is k-bounded by construction (the reference clusters the rows it
is about to return), so the vectorize + cluster step is driver-scale
on any corpus — the distributed work is the search itself and the
one pushed-down fetch of the page's stored text.

Algorithm (engine-defined, public building blocks): tf-idf vectors
over the page's own vocabulary (ln(1+tf) · ln(1 + N/df), L2
normalized — the classic SMART ltc weighting), seeded spherical
k-means, cluster labels = the top centroid-weight terms (the
Lingo/STC-style label surface without the Carrot2 dependency, which
is out of scope as a bundled third-party engine)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = ["cluster_search_results"]


def cluster_search_results(
    searcher,
    content_df: DataFrame,
    query,
    k_docs: int = 40,
    n_clusters: int = 4,
    n_label_terms: int = 3,
    max_terms: int = 500,
    iters: int = 10,
    seed: int = 42,
) -> pd.DataFrame:
    """Cluster the top ``k_docs`` hits of ``query``.

    ``content_df``: (doc_id, content) with ENGINE doc ids (stored
    fields live in the source table; the caller supplies the join,
    like every stored-field consumer).  Returns a pandas DataFrame
    (cluster, doc_id, rank, label) — rank is the hit's search rank,
    label the cluster's top centroid terms joined by '/'."""
    from ..functions.analysis import analyze_batch

    td = searcher.search(query, k=k_docs)
    ids = [int(d) for d in td.doc_ids]
    if not ids:
        return pd.DataFrame(
            columns=["cluster", "doc_id", "rank", "label"]
        )
    page = (
        content_df.filter(F.col("doc_id").isin(ids))
        .select("doc_id", "content")
        .toPandas()
        .set_index("doc_id")
        .loc[ids]
        .reset_index()
    )
    tb = analyze_batch(
        page["content"], searcher.cfg.analyzer,
        searcher.cfg.max_token_length, tuple(searcher.cfg.stopwords),
    )
    tf = (
        pd.DataFrame({"d": tb.doc_idx, "t": tb.terms.to_numpy()})
        .groupby(["d", "t"]).size().reset_index(name="f")
    )
    dfs = tf.groupby("t")["d"].nunique()
    vocab = dfs.sort_values(ascending=False).head(max_terms).index
    vmap = {t: i for i, t in enumerate(vocab)}
    tf = tf[tf["t"].isin(vmap)]
    n = len(page)
    mat = np.zeros((n, len(vmap)), np.float64)
    mat[tf["d"].to_numpy(), [vmap[t] for t in tf["t"]]] = np.log1p(
        tf["f"].to_numpy(dtype=np.float64)
    )
    idf = np.log(1.0 + n / dfs.loc[vocab].to_numpy(dtype=np.float64))
    mat *= idf
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mat /= norms
    k = min(n_clusters, n)
    rng = np.random.default_rng(seed)
    cent = mat[rng.choice(n, size=k, replace=False)].copy()
    assign = np.zeros(n, np.int64)
    for _ in range(iters):
        sims = mat @ cent.T
        assign = sims.argmax(axis=1)
        for c in range(k):
            mask = assign == c
            if mask.any():
                v = mat[mask].mean(axis=0)
                nv = np.linalg.norm(v)
                cent[c] = v / nv if nv > 0 else v
    labels = {}
    for c in range(k):
        top = np.argsort(-cent[c])[:n_label_terms]
        labels[c] = "/".join(vocab[i] for i in top if cent[c][i] > 0)
    return pd.DataFrame({
        "cluster": assign,
        "doc_id": page["doc_id"].to_numpy(),
        "rank": np.arange(1, n + 1),
        "label": [labels[int(c)] for c in assign],
    })
