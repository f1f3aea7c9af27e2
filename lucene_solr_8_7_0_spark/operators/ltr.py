"""Learning to Rank — the solr/contrib/ltr surface.

Reference: solr/contrib/ltr/src/java/org/apache/solr/ltr/
LTRScoringQuery.java (re-rank the top reRankDocs of a base query by a
feature-driven model), feature/{OriginalScoreFeature,FieldValueFeature,
FieldLengthFeature,ValueFeature,SolrFeature}.java,
norm/{IdentityNormalizer,MinMaxNormalizer,StandardNormalizer}.java,
model/LinearModel.java:118-123 (dot product of NORMALIZED feature
values) and model/MultipleAdditiveTreesModel.java (RegressionTreeNode
.score :172-186: value <= threshold -> left else right, thresholds
carry NODE_SPLIT_SLACK = 1e-6 :124,150-156; each tree's contribution
is weight * leaf :274-276; the model is the sum over trees).

Spark-first shape: the base query's COMPLETE scores produce a
k-bounded re-rank window (TakeOrderedAndProject, materialized once
like a first-pass TopDocs); feature extraction is ONE broadcast
docmeta join for all field features plus one broadcast-joined score
column per SolrFeature; the model — linear dot product or the whole
tree ensemble — compiles to a single whole-stage-codegen Column of
nested CASE/arithmetic, so scoring N candidate docs is one narrow
projection, never a per-doc UDF.  Model arithmetic runs in float64
(the reference uses float32; ranking rounds to 6 decimals, far above
the 1e-7-relative float32/float64 divergence, with doc-asc ties —
the engine's standard SQL-replay policy).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "OriginalScoreFeature", "FieldValueFeature", "FieldLengthFeature",
    "ValueFeature", "SolrFeature",
    "IdentityNormalizer", "MinMaxNormalizer", "StandardNormalizer",
    "LinearModel", "MultipleAdditiveTreesModel",
    "extract_features", "ltr_rerank",
]

NODE_SPLIT_SLACK = 1e-6  # MultipleAdditiveTreesModel.java:124


# ---- features ----


@dataclass(frozen=True)
class OriginalScoreFeature:
    """feature/OriginalScoreFeature.java: the base query's score."""


@dataclass(frozen=True)
class FieldValueFeature:
    """feature/FieldValueFeature.java: a stored/docvalues numeric
    field's value, ``default`` when missing."""

    field: str
    default: float = 0.0


@dataclass(frozen=True)
class FieldLengthFeature:
    """feature/FieldLengthFeature.java: the indexed field's length.
    The reference decodes the (lossy) norm byte; this engine keeps the
    EXACT length in docmeta, so the feature is exact — a documented
    improvement over the decoded approximation."""


@dataclass(frozen=True)
class ValueFeature:
    """feature/ValueFeature.java: a constant (or externally supplied)
    value."""

    value: float


@dataclass(frozen=True)
class SolrFeature:
    """feature/SolrFeature.java: the score of another engine query on
    the candidate doc; 0 when the query does not match (the
    reference's defaultValue)."""

    query: object
    default: float = 0.0


# ---- normalizers ----


@dataclass(frozen=True)
class IdentityNormalizer:
    def col(self, c):
        return c


@dataclass(frozen=True)
class MinMaxNormalizer:
    """norm/MinMaxNormalizer.java:86: (v - min) / (max - min)."""

    min: float
    max: float

    def col(self, c):
        return (c - F.lit(self.min)) / F.lit(self.max - self.min)


@dataclass(frozen=True)
class StandardNormalizer:
    """norm/StandardNormalizer.java: (v - avg) / std."""

    avg: float
    std: float

    def col(self, c):
        return (c - F.lit(self.avg)) / F.lit(self.std)


# ---- models ----


@dataclass(frozen=True)
class LinearModel:
    """model/LinearModel.java: score = sum_i w_i * norm_i(f_i)."""

    weights: tuple
    norms: tuple = ()

    def col(self, feats):
        norms = self.norms or tuple(
            IdentityNormalizer() for _ in self.weights
        )
        out = F.lit(0.0)
        for w, nz, c in zip(self.weights, norms, feats):
            out = out + F.lit(float(w)) * nz.col(c)
        return out


def _tree_col(node, feats):
    """node = ("leaf", value) | ("split", feat_idx, threshold, l, r);
    value <= threshold + NODE_SPLIT_SLACK goes left
    (RegressionTreeNode.score :182)."""
    kind = node[0]
    if kind == "leaf":
        return F.lit(float(node[1]))
    _, fi, thr, left, right = node
    return F.when(
        feats[fi] <= F.lit(float(thr) + NODE_SPLIT_SLACK),
        _tree_col(left, feats),
    ).otherwise(_tree_col(right, feats))


@dataclass(frozen=True)
class MultipleAdditiveTreesModel:
    """model/MultipleAdditiveTreesModel.java: sum over trees of
    weight * leaf value reached by threshold descent."""

    trees: tuple  # of (weight, node)
    norms: tuple = ()

    def col(self, feats):
        norms = self.norms or tuple(IdentityNormalizer() for _ in feats)
        nf = [nz.col(c) for nz, c in zip(norms, feats)]
        out = F.lit(0.0)
        for w, root in self.trees:
            out = out + F.lit(float(w)) * _tree_col(root, nf)
        return out


# ---- extraction + re-rank ----


def extract_features(
    searcher,
    query,
    features,
    window: int = 30,
    similarity: str | None = None,
) -> DataFrame:
    """The re-rank window of ``query`` with one double column per
    feature (f0..fn) — LTRScoringQuery's featureLogger view.  Window
    membership is decided on round(score, 4) with doc-asc ties (the
    engine's SQL-replay policy); field features ride ONE broadcast
    docmeta join; each SolrFeature adds one broadcast score join."""
    first = searcher.score_all_df(query, similarity=similarity).select(
        "doc_id", F.round(F.col("score").cast("double"), 4).alias("__s1")
    )
    cand_pdf = (
        first.orderBy(F.col("__s1").desc(), F.col("doc_id").asc())
        .limit(window).toPandas()
    )
    cand = searcher.spark.createDataFrame(
        cand_pdf, schema="doc_id bigint, __s1 double"
    )
    meta_fields = sorted({
        f.field for f in features if isinstance(f, FieldValueFeature)
    })
    need_length = any(isinstance(f, FieldLengthFeature) for f in features)
    if meta_fields or need_length:
        cols = ["doc_id"] + meta_fields + (
            ["length"] if need_length and "length" not in meta_fields else []
        )
        meta = searcher._docmeta().select(*cols)
        cand = cand.join(F.broadcast(meta), "doc_id", "left")
    out_cols = []
    for i, f in enumerate(features):
        name = f"f{i}"
        if isinstance(f, OriginalScoreFeature):
            c = F.col("__s1")
        elif isinstance(f, ValueFeature):
            c = F.lit(float(f.value))
        elif isinstance(f, FieldValueFeature):
            c = F.coalesce(
                F.col(f.field).cast("double"), F.lit(float(f.default))
            )
        elif isinstance(f, FieldLengthFeature):
            c = F.col("length").cast("double")
        elif isinstance(f, SolrFeature):
            sec = searcher.score_all_df(
                f.query, similarity=similarity
            ).select(
                "doc_id",
                F.round(F.col("score").cast("double"), 4).alias(name),
            )
            sec_win = sec.join(
                F.broadcast(cand.select("doc_id")), "doc_id"
            )
            cand = cand.join(F.broadcast(sec_win), "doc_id", "left")
            c = F.coalesce(F.col(name), F.lit(float(f.default)))
        else:
            raise TypeError(f"unknown feature {f!r}")
        out_cols.append(c.cast("double").alias(name))
    return cand.select("doc_id", F.col("__s1").alias("orig_score"), *out_cols)


def ltr_rerank(
    searcher,
    query,
    features,
    model,
    rerank_docs: int = 30,
    k: int = 10,
    similarity: str | None = None,
) -> DataFrame:
    """LTRScoringQuery: re-rank the top ``rerank_docs`` of ``query``
    by the model's score over the extracted features.  The model
    REPLACES the original score (LTRScoringQuery semantics).  Returns
    (rank, doc_id, ltr_score) for the top k, ordered by
    (round(model, 6) desc, doc asc)."""
    from pyspark.sql import Window

    feats_df = extract_features(
        searcher, query, features, window=rerank_docs,
        similarity=similarity,
    )
    fcols = [F.col(f"f{i}") for i in range(len(features))]
    scored = feats_df.select(
        "doc_id", F.round(model.col(fcols), 6).alias("ltr_score")
    )
    topk = scored.orderBy(
        F.col("ltr_score").desc(), F.col("doc_id").asc()
    ).limit(k)
    w = Window.orderBy(F.col("ltr_score").desc(), F.col("doc_id").asc())
    return (
        topk.withColumn("rank", F.row_number().over(w).cast("int"))
        .select("rank", "doc_id", "ltr_score")
        .orderBy("rank")
    )
