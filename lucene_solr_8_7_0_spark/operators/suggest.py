"""Suggest / completion — the lucene/suggest module surface.

Reference: lucene/suggest/src/java/org/apache/lucene/search/suggest/
(Lookup.java, analyzing/AnalyzingSuggester.java, fst-backed prefix
completion; spell/DirectSpellChecker.java for fuzzy "did you mean").
The reference ranks completions by a stored weight; the engine's
natural weight is document frequency from the term dictionary — the
same signal DirectSpellChecker uses (docFreq-ordered candidate
terms).

Spark-first shape: both lookups are ONE pushed-down termdict scan
(prefix -> StringStartsWith row-group pruning on the sorted term
column; fuzzy -> length band + JVM levenshtein) followed by
TakeOrderedAndProject — no shuffle, no driver-side term list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["suggest_prefix", "suggest_infix", "suggest_fuzzy"]


def suggest_prefix(searcher, prefix: str, k: int = 10) -> DataFrame:
    """Top-k completions of ``prefix`` ranked by (df desc, term asc) —
    the AnalyzingSuggester lookup with docFreq as weight.  Returns
    (rank, term, df)."""
    from pyspark.sql import Window

    top = (
        searcher.termdict.filter(F.col("term").startswith(prefix))
        .select("term", "df")
        .orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(k)
    )
    w = Window.orderBy(F.col("df").desc(), F.col("term").asc())
    return (
        top.withColumn("rank", F.row_number().over(w).cast("int"))
        .select("rank", "term", "df")
        .orderBy("rank")
    )


def suggest_infix(searcher, fragment: str, k: int = 10) -> DataFrame:
    """AnalyzingInfixSuggester-style lookup (lucene/suggest/.../
    analyzing/AnalyzingInfixSuggester.java:110-143: completions whose
    ANALYZED text contains the fragment anywhere, not only as a
    prefix; the reference indexes edge-grams of every token to make
    the match an index lookup).  The engine's dictionary is the
    termdict, so the lookup is one pushed-down scan with a JVM
    Contains filter — same physical shape as the wildcard rewrite —
    ranked by (df desc, term asc).  Returns (rank, term, df)."""
    from pyspark.sql import Window

    top = (
        searcher.termdict.filter(F.col("term").contains(fragment))
        .select("term", "df")
        .orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(k)
    )
    w = Window.orderBy(F.col("df").desc(), F.col("term").asc())
    return (
        top.withColumn("rank", F.row_number().over(w).cast("int"))
        .select("rank", "term", "df")
        .orderBy("rank")
    )


def suggest_fuzzy(
    searcher, term: str, k: int = 10, max_edits: int = 2
) -> DataFrame:
    """DirectSpellChecker-style "did you mean": dictionary terms within
    ``max_edits`` (length-banded + JVM levenshtein), ranked by
    (distance asc, df desc, term asc).  The queried term itself is
    excluded, like the spell checker's suggestSimilar.  Returns
    (rank, term, df, dist)."""
    from pyspark.sql import Window

    c = F.col("term")
    cand = (
        searcher.termdict.filter(
            (F.length("term") >= F.lit(len(term) - max_edits))
            & (F.length("term") <= F.lit(len(term) + max_edits))
            & (c != term)
        )
        .withColumn("dist", F.levenshtein(c, F.lit(term)))
        .filter(F.col("dist") <= max_edits)
        .select("term", "df", "dist")
    )
    order = [F.col("dist").asc(), F.col("df").desc(), F.col("term").asc()]
    top = cand.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return (
        top.withColumn("rank", F.row_number().over(w).cast("int"))
        .select("rank", "term", "df", "dist")
        .orderBy("rank")
    )
