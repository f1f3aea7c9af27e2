"""JSON Facet API — the solr/core facet module's nested facet tree.

Reference: solr/core/src/java/org/apache/solr/search/facet/ —
FacetRequest/FacetField (terms facets with limit/mincount/missing,
FacetField.java:42), FacetQuery (query facets), and the agg value
sources (SumAgg/AvgAgg/MinMaxAgg/UniqueAgg/PercentileAgg under the
same package; CountAgg is implicit on every bucket).  A request is a
nested spec; the response is a nested bucket tree:

    json_facet(searcher, query, {
        "langs": {"type": "terms", "field": "lang", "limit": 5,
                  "facet": {"avg_len": "avg(n_chars)",
                            "tags": {"type": "terms", "field": "tags",
                                      "limit": 3}}},
        "long": {"type": "query", "q": PointRangeQuery(...)},
    })
    -> {"count": 123,
        "langs": {"buckets": [
            {"val": "java", "count": 70, "avg_len": 812.5,
             "tags": {"buckets": [{"val": "t0", "count": 31}, ...]}},
            ...]},
        "long": {"count": 17}}

Execution shape (the 100-TB story): ONE Spark aggregation per facet
NODE in the spec tree, never one per bucket — a nested terms facet at
depth d runs a single groupBy over the (parent..., child) grouping
prefix with a per-parent rank window bounded by the parent limits, so
the work is independent of bucket fan-out; only the final (bounded by
prod(limit_i)) bucket rows are collected to build the response, which
is exactly what the reference's FacetFieldProcessor streams back.
Terms buckets order by count desc then value asc (the default
``sort: "count desc"``); ``mincount`` (default 1, FacetField.java:42)
prunes before ranking; array (multi-valued SORTED_SET) fields facet
per value with distinct-doc counts.  Stats aggregate over each
bucket's domain in the SAME aggregation pass.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

__all__ = ["json_facet"]

_AGG_RE = re.compile(
    r"^(sum|avg|min|max|unique|percentile)\(([a-zA-Z0-9_]+)"
    r"(?:\s*,\s*([0-9.]+))?\)$"
)


def _agg_expr(spec: str):
    """Parse one agg value source ("avg(n_chars)", "unique(lang)",
    "percentile(n_chars,50)") into a Spark aggregate Column."""
    m = _AGG_RE.match(spec.strip())
    if m is None:
        raise ValueError(f"unsupported agg spec: {spec!r}")
    fn, col, arg = m.groups()
    if fn == "sum":
        return F.sum(col)
    if fn == "avg":
        return F.round(F.avg(col), 6)
    if fn == "min":
        return F.min(col)
    if fn == "max":
        return F.max(col)
    if fn == "unique":
        return F.countDistinct(col)
    pct = float(arg) / 100.0 if arg is not None else 0.5
    return F.round(F.expr(f"percentile({col}, {pct})"), 6)


def _is_facet_node(v) -> bool:
    return isinstance(v, dict)


def json_facet(searcher, query, spec: dict) -> dict:
    """Evaluate a JSON-facet spec over the query's hit-set domain and
    return the nested Solr-shaped response dict (see module doc)."""
    meta = searcher._docmeta()
    base = searcher.matches_df(query).join(meta, "doc_id")
    out = {"count": base.count()}
    for name, fspec in spec.items():
        out[name] = _facet_node(searcher, base, [], fspec)
    return out


def _facet_node(searcher, base, prefix_cols, fspec) -> dict:
    if fspec.get("type", "terms") == "query":
        dom = base.join(searcher.matches_df(fspec["q"]), "doc_id")
        node = {"count": dom.count()}
        for sub_name, sub in fspec.get("facet", {}).items():
            if _is_facet_node(sub):
                node[sub_name] = _facet_node(searcher, dom, [], sub)
            else:
                row = dom.agg(_agg_expr(sub).alias("v")).collect()[0]
                node[sub_name] = row["v"]
        return node
    return _terms_node(searcher, base, prefix_cols, fspec)


def _explode(df, field):
    from pyspark.sql.types import ArrayType

    if isinstance(df.schema[field].dataType, ArrayType):
        return df.withColumn(field, F.explode(field))
    return df


def _terms_node(searcher, base, prefix_cols, fspec) -> dict:
    """One terms facet node: a single aggregation over
    (prefix..., field), per-prefix rank window, bounded collect; then
    recursion for nested facet nodes with this field appended to the
    grouping prefix (still one aggregation per nested node)."""
    from pyspark.sql import Window

    field = fspec["field"]
    limit = int(fspec.get("limit", 10))
    mincount = int(fspec.get("mincount", 1))
    dom = _explode(base, field)

    stat_specs = {
        n: s for n, s in fspec.get("facet", {}).items()
        if not _is_facet_node(s)
    }
    sub_specs = {
        n: s for n, s in fspec.get("facet", {}).items() if _is_facet_node(s)
    }

    aggs = [F.countDistinct("doc_id").alias("count")] + [
        _agg_expr(s).alias(n) for n, s in stat_specs.items()
    ]
    grouped = dom.groupBy(*prefix_cols, field).agg(*aggs)
    if mincount > 0:
        grouped = grouped.filter(F.col("count") >= mincount)
    order = [F.col("count").desc(), F.col(field).asc()]
    if prefix_cols:
        w = Window.partitionBy(*prefix_cols).orderBy(*order)
        ranked = grouped.withColumn("_rk", F.row_number().over(w)).filter(
            F.col("_rk") <= limit
        )
        rows = ranked.collect()
    else:
        rows = grouped.orderBy(*order).limit(limit).collect()

    # nested nodes: ONE aggregation each over the extended prefix; the
    # child limits itself per parent bucket via its own rank window.
    # Restrict the child domain to the SURVIVING parent values first
    # (a tiny isin pushed into the scan) so a high-cardinality parent
    # never fans child work out beyond its own kept buckets.
    children = {}
    if sub_specs:
        kept_vals = sorted({r[field] for r in rows})
        dom_kept = dom.filter(F.col(field).isin(kept_vals))
        children = {
            n: _terms_node(searcher, dom_kept, prefix_cols + [field], s)
            for n, s in sub_specs.items()
        }

    def bucket_key(r):
        return tuple(r[c] for c in prefix_cols)

    buckets_by_prefix: dict = {}
    for r in sorted(rows, key=lambda r: (-r["count"], r[field])):
        b = {"val": r[field], "count": r["count"]}
        for n in stat_specs:
            b[n] = r[n]
        for n, child in children.items():
            b[n] = child["_by_prefix"].get(
                bucket_key(r) + (r[field],), {"buckets": []}
            )
        buckets_by_prefix.setdefault(bucket_key(r), []).append(b)

    if prefix_cols:
        # intermediate recursion level: hand the parent a prefix-keyed
        # view; the parent stitches per-bucket sub-trees
        return {
            "_by_prefix": {
                k: {"buckets": v} for k, v in buckets_by_prefix.items()
            }
        }
    return {"buckets": buckets_by_prefix.get((), [])}
