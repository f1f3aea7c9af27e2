"""Streaming expressions — Solr's TupleStream combinator algebra.

Reference: solr/solrj/src/java/org/apache/solr/client/solrj/io/stream/
— the /export + /stream surface a Solr user composes as
``rollup(search(...), over=..., sum(...))``.  Each decorator wraps a
tuple stream; the engine re-expresses every combinator as a
DataFrame transformation, which is the whole point of a Spark-first
rebuild: Solr built a push-based distributed dataflow on top of
sorted /export streams (worker collections, hash partitioning —
ParallelStream.java), and all of that machinery IS Spark's execution
model, so each stream maps to a one-line declarative plan and
Catalyst/AQE handle partitioning, spilling, and join strategy.

Combinator -> reference -> plan:

- search/export: CloudSolrStream.java / the /export handler — full
  sorted hit-set export with a field list; here: hit set ⨝ docmeta,
  projected and sorted (sort realized lazily; downstream combinators
  that don't need order let Catalyst drop it).
- select: SelectStream.java — projection + rename.
- unique: UniqueStream.java:46 — first tuple per over-key in stream
  order (row_number window, ties = stream sort).
- top: RankStream.java — top-k re-sort of any stream.
- merge: MergeStream.java:41 — union of streams, re-sorted on the
  merge sort (sorted-merge of sorted inputs == union + sort to
  Catalyst).
- rollup: RollupStream.java:44 / HashRollupStream.java — grouped
  aggregates (sum/min/max/avg/count) over bucket fields.
- innerJoin / leftOuterJoin / hashJoin: InnerJoinStream.java /
  LeftOuterJoinStream.java / HashJoinStream.java — equi-joins; the
  sorted-merge vs hash distinction is a physical concern Catalyst
  owns, so both spell the same logical join here.
- intersect / complement: IntersectStream.java / ComplementStream.java
  — leftsemi / leftanti on the over-keys.
- fetch: FetchStream.java — re-join extra stored fields by key.
- having: HavingStream.java — a post-filter.

Every combinator returns a DataFrame, so streams compose with
arbitrary Spark code — the analog of Solr's parallel SQL layer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "search_stream", "select_stream", "unique_stream", "top_stream",
    "merge_stream", "rollup_stream", "inner_join_stream",
    "left_outer_join_stream", "intersect_stream", "complement_stream",
    "fetch_stream", "having_stream", "knn_stream",
]


def _sort_exprs(sort: list[tuple[str, str]]) -> list[Column]:
    out = []
    for field, direction in sort:
        c = F.col(field)
        out.append(c.desc() if direction.lower().startswith("desc") else c.asc())
    return out


def search_stream(
    searcher, query, fl: list[str], sort: list[tuple[str, str]]
) -> DataFrame:
    """search(collection, q=..., fl=..., sort=..., qt=/export): the
    full hit set with the requested fields in the requested order.
    ``sort`` = [(field, "asc"|"desc"), ...]; doc_id tie-breaks so the
    stream is total-ordered like the export handler's docid tie."""
    meta_cols = ["doc_id"] + [c for c in fl if c != "doc_id"]
    meta = searcher._docmeta().select(*meta_cols)
    hits = searcher.matches_df(query).join(meta, "doc_id")
    return hits.orderBy(*_sort_exprs(sort), F.col("doc_id").asc())


def select_stream(stream: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """select(stream, "a as b", ...): projection + rename."""
    return stream.select(
        *[F.col(src).alias(dst) for src, dst in mapping.items()]
    )


def _tie(stream: DataFrame) -> list[Column]:
    # total-order tie-break like the export handler's docid tie; only
    # when the stream still carries the key
    return [F.col("doc_id").asc()] if "doc_id" in stream.columns else []


def unique_stream(
    stream: DataFrame, over: list[str], sort: list[tuple[str, str]]
) -> DataFrame:
    """unique(stream, over=...): first tuple per over-key in the
    stream's sort order (UniqueStream.java:46)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*over).orderBy(*_sort_exprs(sort), *_tie(stream))
    return (
        stream.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )


def top_stream(
    stream: DataFrame, k: int, sort: list[tuple[str, str]]
) -> DataFrame:
    """top(n=k, stream, sort=...): bounded re-sort (RankStream)."""
    return stream.orderBy(*_sort_exprs(sort), *_tie(stream)).limit(k)


def merge_stream(
    streams: list[DataFrame], on: list[tuple[str, str]]
) -> DataFrame:
    """merge(s1, s2, on=...): sorted merge of sorted streams — union
    by name + re-sort on the merge key (MergeStream.java:41)."""
    out = streams[0]
    for s in streams[1:]:
        out = out.unionByName(s)
    return out.orderBy(*_sort_exprs(on), *_tie(out))


def rollup_stream(
    stream: DataFrame, over: list[str], aggs: dict[str, str]
) -> DataFrame:
    """rollup(stream, over=..., sum(x), avg(y), ...): grouped
    aggregates (RollupStream.java:44).  ``aggs`` maps output column ->
    "fn(col)" with fn in sum/min/max/avg/count."""
    fns = {"sum": F.sum, "min": F.min, "max": F.max,
           "avg": F.avg, "count": F.count}
    cols = []
    for name, spec in aggs.items():
        fn, _, col = spec.partition("(")
        col = col.rstrip(")")
        if fn not in fns:
            raise ValueError(f"rollup: unknown aggregate {fn!r}")
        target = F.lit(1) if col == "*" else F.col(col)
        cols.append(fns[fn](target).alias(name))
    return stream.groupBy(*over).agg(*cols).orderBy(*over)


def inner_join_stream(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    """innerJoin/hashJoin(left, right, on=...): the sorted-merge vs
    hash distinction is physical — Catalyst/AQE choose."""
    return left.join(right, on, "inner")


def left_outer_join_stream(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    return left.join(right, on, "left")


def intersect_stream(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    """intersect(left, right, on=...): left tuples whose key appears
    in right (IntersectStream.java)."""
    return left.join(right.select(*on).distinct(), on, "leftsemi")


def complement_stream(left: DataFrame, right: DataFrame, on: list[str]) -> DataFrame:
    """complement(left, right, on=...): left tuples whose key does NOT
    appear in right (ComplementStream.java)."""
    return left.join(right.select(*on).distinct(), on, "leftanti")


def fetch_stream(
    searcher, stream: DataFrame, fl: list[str], on: str = "doc_id"
) -> DataFrame:
    """fetch(collection, stream, fl=..., on=...): re-join extra stored
    fields by key in batches (FetchStream.java) — one docmeta join."""
    meta = searcher._docmeta().select(
        on, *[c for c in fl if c != on]
    )
    return stream.join(meta, on, "left")


def having_stream(stream: DataFrame, predicate) -> DataFrame:
    """having(stream, booleanEvaluator): post-filter; ``predicate`` is
    a Spark Column or SQL string (HavingStream.java)."""
    return stream.filter(predicate)


def knn_stream(searcher, doc_id: int, k: int = 10, **mlt_params) -> DataFrame:
    """knn(collection, id=..., k=...): document-similarity search —
    the reference's KnnStream (KnnStream.java:56) is MoreLikeThis
    over the wire (its params ARE mlt params: mintf/mindf/maxqt...),
    so this wraps the engine's MLT operator: interesting terms of the
    source doc -> OR query -> BM25 top-k, source doc excluded like
    the component's false-positive filter."""
    from .morelikethis import more_like_this

    kw = {}
    for solr_name, eng_name in (
        ("mintf", "min_tf"), ("mindf", "min_df"), ("maxqt", "max_terms"),
    ):
        if solr_name in mlt_params:
            kw[eng_name] = mlt_params[solr_name]
    _, hits = more_like_this(searcher, doc_id, k=k + 1, **kw)
    return hits.filter(F.col("doc_id") != doc_id).limit(k)
