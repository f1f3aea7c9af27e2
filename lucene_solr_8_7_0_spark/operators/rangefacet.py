"""Range faceting with gaps — Solr's facet.range.

Reference: solr/core/src/java/org/apache/solr/request/SimpleFacets.java
``getFacetRangeCounts`` + solr/core/src/java/org/apache/solr/handler/
component/RangeFacetRequest.java (bucket generation :150-210) and
RangeFacetProcessor: buckets start at ``start`` and advance by ``gap``
until ``end`` (the last bucket may overshoot unless hardend=true, in
which case it is clipped to ``end``); the default FacetRangeInclude is
LOWER, so every bucket counts values in [lo, hi); the ``other`` counts
are before (< start), after (>= the actual end) and between
([start, actual end)).  Date gaps go through DateMathParser
(functions/datemath) — fixed-duration units and calendar MONTH/YEAR
gaps (month gaps require a month-aligned start, since the bucket index
is pure month arithmetic).

Spark-first shape: bucket BOUNDARIES are a handful of driver-side
values; the per-row work is one arithmetic bucket-index expression in
whole-stage codegen and ONE groupBy (map-side combined) — no
per-bucket filters, no join.  At 100 TB this is a single shuffle of
at most (#buckets + 2) rows per map task.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, functions as F

from ..functions.datemath import add_months, parse_date_math, parse_gap

__all__ = ["range_facet", "range_facet_date", "interval_facet",
           "parse_interval"]


def parse_interval(spec: str):
    """One facet.interval spec -> (lo, hi, lo_open, hi_open).

    Reference: solr/core/src/java/org/apache/solr/request/
    IntervalFacets.java:516-560 (FacetInterval constructor):
    ``[`` / ``(`` open or closed start, ``]`` / ``)`` end, ``*`` for
    unbounded, values comma-separated — e.g. ``[0,10)``, ``(20,*]``."""
    import re as _re

    m = _re.fullmatch(r"\s*([\[(])\s*([^,]+?)\s*,\s*([^,]+?)\s*([\])])\s*",
                      spec)
    if not m:
        raise ValueError(f"malformed interval {spec!r}")
    lo_open = m.group(1) == "("
    hi_open = m.group(4) == ")"
    lo = None if m.group(2) == "*" else float(m.group(2))
    hi = None if m.group(3) == "*" else float(m.group(3))
    if lo is not None and hi is not None and (
        lo > hi or (lo == hi and (lo_open or hi_open))
    ):
        raise ValueError(f"empty interval {spec!r}")
    return lo, hi, lo_open, hi_open


def interval_facet(
    df: DataFrame,
    col: str,
    intervals,
    labels=None,
) -> DataFrame:
    """Solr facet.interval (SimpleFacets.getFacetIntervalCounts /
    IntervalFacets.java): counts per arbitrary interval — intervals
    MAY overlap and need not cover the domain, so (unlike
    facet.range) each is its own conditional count, all computed in
    ONE aggregate over ONE scan (no per-interval pass, no explode).
    Returns (bucket, count) in the given interval order; empty
    intervals report 0 (the reference always returns every requested
    interval)."""
    parsed = [parse_interval(s) for s in intervals]
    labels = list(labels) if labels is not None else list(intervals)
    c = F.col(col)
    aggs = []
    for i, (lo, hi, lo_open, hi_open) in enumerate(parsed):
        cond = c.isNotNull()
        if lo is not None:
            cond = cond & ((c > lo) if lo_open else (c >= lo))
        if hi is not None:
            cond = cond & ((c < hi) if hi_open else (c <= hi))
        aggs.append(
            F.coalesce(F.sum(F.when(cond, 1)), F.lit(0)).alias(f"_i{i}")
        )
    row = df.agg(*aggs)
    out = row.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("_o"),
                    F.lit(labels[i]).alias("bucket"),
                    F.col(f"_i{i}").cast("long").alias("count"),
                )
                for i in range(len(parsed))
            ])
        ).alias("s")
    ).select("s._o", "s.bucket", "s.count").orderBy("_o").drop("_o")
    return out


def _bucket_rows(df, idx_col, labels, n):
    # ONE scan of the fact table: a single bucket-index aggregate
    # (map-side combined), then the 'between' row is DERIVED from the
    # tiny grouped frame — each in-range bucket row re-emits itself
    # under the between slot and a second (tiny) aggregate folds them.
    # Two branches over the base frame would re-scan it: Catalyst
    # pushes the branch filters below the aggregate, so the identical
    # exchanges never dedupe (measured — 4 scans in the union plan).
    counts = df.groupBy(idx_col.alias("__idx")).agg(
        F.count(F.lit(1)).alias("c")
    )
    in_range = (F.col("__idx") >= 0) & (F.col("__idx") < n)
    pair = counts.select(
        F.explode(
            F.array(
                F.struct(F.col("__idx").alias("_i"), F.col("c")),
                F.struct(
                    F.when(in_range, F.lit(n + 1).cast("long")).alias("_i"),
                    F.col("c"),
                ),
            )
        ).alias("s")
    ).select("s._i", "s.c").filter(F.col("_i").isNotNull())
    rows = pair.groupBy("_i").agg(F.sum("c").alias("count"))
    # element_at is 1-based; _i in [-1, n] -> label slot _i+2, and the
    # synthetic between slot n+1 lands on the appended label
    lab = F.array(*[F.lit(x) for x in labels + ["between"]])
    return (
        rows.select(
            F.element_at(lab, (F.col("_i") + F.lit(2)).cast("int")).alias(
                "bucket"
            ),
            "count",
            "_i",
        )
        .orderBy("_i")
        .drop("_i")
    )


def range_facet(
    df: DataFrame,
    col: str,
    start: float,
    end: float,
    gap: float,
    hardend: bool = False,
) -> DataFrame:
    """Numeric facet.range: (bucket, count) rows — one row per bucket
    (label = the bucket's start value, as Solr keys counts by range
    start) plus before/after/between.  Empty buckets are omitted (the
    mincount>0 presentation; Solr's default mincount=0 zero-fill is a
    driver-side cosmetic)."""
    if gap <= 0 or end <= start:
        raise ValueError("need start < end and a positive gap")
    n = int(-(-(end - start) // gap))  # ceil
    actual_end = end if hardend else start + n * gap
    bounds = [start + i * gap for i in range(n)]
    labels = (
        ["before"]
        + [str(int(b)) if float(b).is_integer() else str(b) for b in bounds]
        + ["after"]
    )
    c = F.col(col)
    idx = (
        F.when(c < start, F.lit(-1))
        .when(c >= actual_end, F.lit(n))
        .otherwise(F.floor((c - F.lit(start)) / F.lit(gap)))
    )
    return _bucket_rows(df.filter(c.isNotNull()), idx, labels, n)


def range_facet_date(
    df: DataFrame,
    col: str,
    start: str,
    end: str,
    gap: str,
    hardend: bool = False,
    now: datetime | None = None,
) -> DataFrame:
    """Date facet.range: start/end are DateMathParser expressions, gap
    is ``+N UNIT``.  Bucket labels are the bucket-start instants in
    Solr's canonical ISO form (yyyy-MM-dd'T'HH:mm:ss'Z')."""
    s_dt = parse_date_math(start, now)
    e_dt = parse_date_math(end, now)
    months, seconds = parse_gap(gap)
    if e_dt <= s_dt:
        raise ValueError("need start < end")
    bounds: list[datetime] = []
    if months:
        if (s_dt.day, s_dt.hour, s_dt.minute, s_dt.second,
                s_dt.microsecond) != (1, 0, 0, 0, 0):
            raise ValueError(
                "calendar-unit gaps need a month-aligned start "
                "(round with /MONTH or /YEAR)"
            )
        b = s_dt
        while b < e_dt:
            bounds.append(b)
            b = add_months(b, months)
        nxt = b
    else:
        from datetime import timedelta

        b = s_dt
        step = timedelta(seconds=seconds)
        while b < e_dt:
            bounds.append(b)
            b = b + step
        nxt = b
    n = len(bounds)
    actual_end = e_dt if hardend else nxt
    fmt = "%Y-%m-%dT%H:%M:%SZ"
    labels = ["before"] + [b.strftime(fmt) for b in bounds] + ["after"]
    c = F.col(col)
    if months:
        # month index arithmetic: both sides are month-aligned
        mdiff = (
            (F.year(c) - F.lit(s_dt.year)) * 12
            + (F.month(c) - F.lit(s_dt.month))
        )
        in_idx = F.floor(mdiff / F.lit(months))
    else:
        # both operands go through the SAME session-timezone epoch
        # conversion, so the difference is wall-clock-exact (Solr date
        # faceting is UTC; run the session in a DST-free zone)
        us = F.unix_micros(c.cast("timestamp"))
        s_us = F.unix_micros(F.lit(s_dt).cast("timestamp"))
        in_idx = F.floor((us - s_us) / F.lit(int(seconds * 1_000_000)))
    idx = (
        F.when(c < F.lit(s_dt), F.lit(-1))
        .when(c >= F.lit(actual_end), F.lit(n))
        .otherwise(in_idx)
    )
    return _bucket_rows(df.filter(c.isNotNull()), idx, labels, n)
