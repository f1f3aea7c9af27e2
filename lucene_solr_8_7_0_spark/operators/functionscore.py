"""FunctionScoreQuery — blend a document-field signal into ranking.

Reference: lucene/queries/src/java/org/apache/lucene/queries/function/
FunctionScoreQuery.java:47 — the query's score is replaced by a
DoubleValuesSource expression, most commonly
``boostByValue(query, DoubleValuesSource.fromLongField(f))`` (score =
query score x field value) or an additive blend; the function value is
computed per CANDIDATE document, after the wrapped query matched.

Spark-first shape: the wrapped query scores DISTRIBUTED (the engine's
COMPLETE bulk collector — every per-segment kernel emits its matches),
the field values join in from docmeta (a pushed-down two-column scan),
the blend is a JVM-codegen expression, and ``orderBy(...).limit(k)``
compiles to TakeOrderedAndProject: per-partition partial top-k + a
driver merge of ``partitions x k`` rows.  No node ever holds the full
hit set, which is the same work bound as the reference's per-candidate
DoubleValues evaluation — and the build-time column histogram
(colstats) caps the function's contribution (max field value), which
is exactly the bound an index-side WAND cutoff would use; with the
distributed TakeOrdered plan the cutoff is unnecessary for
correctness or scale, so scores stay exhaustive-exact.

Ties follow the engine's SQL-replay policy: the blended score is
rounded to 4 decimals and ties break by doc id asc, so the output is
total-ordered and a SQL oracle can replay it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["function_score_topk", "expression_score_topk"]


def _transform(col, transform: str):
    if transform == "log1p":
        return F.log(F.lit(1.0) + col.cast("double"))
    if transform == "identity":
        return col.cast("double")
    raise ValueError(f"unknown transform {transform!r}")


def function_score_topk(
    searcher,
    query,
    field: str | None = None,
    k: int = 10,
    combine: str = "multiply",
    weight: float = 1.0,
    transform: str = "log1p",
    similarity: str | None = None,
    func: str | None = None,
) -> DataFrame:
    """Top-k of ``query`` re-scored by a docmeta field signal.

    ``combine="multiply"``: score x (weight x f(field)) — the
    boostByValue product form; ``combine="sum"``: score + weight x
    f(field) — the additive blend.  ``transform`` shapes the raw field
    value (``log1p`` for length/recency-style signals, ``identity``
    for precomputed boosts).  Alternatively ``func`` is a Solr
    function-query string ("recip(n_chars,1,1000,1000)",
    ValueSourceParser.java dialect — plans/funcparser.py) evaluated
    over docmeta columns in the same whole-stage-codegen expression.
    Returns (rank, doc_id, fscore)."""
    from pyspark.sql import Window

    scored = searcher.score_all_df(query, similarity=similarity)
    if func is not None:
        from ..plans.funcparser import parse_func

        expr, fields = parse_func(func)
        meta = searcher._docmeta().select(
            "doc_id", *sorted(fields)
        )
        f_val = F.lit(float(weight)) * expr
    else:
        meta = searcher._docmeta().select(
            "doc_id", field
        )
        f_val = F.lit(float(weight)) * _transform(F.col(field), transform)
    base = F.col("score").cast("double")
    blended = base * f_val if combine == "multiply" else base + f_val
    hits = (
        scored.join(meta, "doc_id")
        .select("doc_id", F.round(blended, 4).alias("fscore"))
    )
    topk = hits.orderBy(F.col("fscore").desc(), F.col("doc_id").asc()).limit(k)
    w = Window.orderBy(F.col("fscore").desc(), F.col("doc_id").asc())
    return (
        topk.withColumn("rank", F.row_number().over(w).cast("int"))
        .select("rank", "doc_id", "fscore")
        .orderBy("rank")
    )


def expression_score_topk(
    searcher,
    query,
    jsexpr: str,
    k: int = 10,
    similarity: str | None = None,
    ascending: bool = False,
) -> DataFrame:
    """Top-k ranked by a lucene/expressions Javascript expression over
    ``_score`` and docmeta columns — the ExpressionRescorer /
    expression-Sort surface (lucene/expressions/.../Expression.java:
    30-55 sample usage; JavascriptCompiler compiles the same grammar
    to per-doc bytecode, here it compiles to ONE whole-stage-codegen
    Column via plans/exprparser.parse_js).  Same distributed
    TakeOrdered shape and round-4/doc-asc tie policy as
    function_score_topk.  ``ascending=True`` is the
    Expression-as-SortField form (Expression.getSortField(bindings,
    reverse) / ExpressionComparator — sorting by a compiled expression
    is the same plan with the order flipped).  Returns
    (rank, doc_id, fscore)."""
    from pyspark.sql import Window

    from ..plans.exprparser import parse_js

    expr, names = parse_js(jsexpr)
    fields = sorted(n for n in names if n != "_score")
    scored = searcher.score_all_df(query, similarity=similarity).withColumn(
        "_score", F.col("score").cast("double")
    )
    if fields:
        meta = searcher._docmeta().select(
            "doc_id", *fields
        )
        scored = scored.join(meta, "doc_id")
    hits = scored.select("doc_id", F.round(expr, 4).alias("fscore"))
    order = F.col("fscore").asc() if ascending else F.col("fscore").desc()
    topk = hits.orderBy(order, F.col("doc_id").asc()).limit(k)
    w = Window.orderBy(order, F.col("doc_id").asc())
    return (
        topk.withColumn("rank", F.row_number().over(w).cast("int"))
        .select("rank", "doc_id", "fscore")
        .orderBy("rank")
    )
