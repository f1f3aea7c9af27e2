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

__all__ = ["suggest_prefix", "suggest_infix", "suggest_fuzzy",
           "collate_spellcheck", "suggest_word_breaks",
           "suggest_word_combinations",
           "build_freetext_model", "suggest_freetext", "FREETEXT_ALPHA"]


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
    searcher, term: str, k: int = 10, max_edits: int = 2,
    distance: str = "levenshtein",
) -> DataFrame:
    """DirectSpellChecker-style "did you mean": dictionary terms within
    ``max_edits`` (length-banded + JVM levenshtein), ranked by
    (distance asc, df desc, term asc).  The queried term itself is
    excluded, like the spell checker's suggestSimilar.  Returns
    (rank, term, df, dist).

    ``distance`` swaps the RANKING measure (DirectSpellChecker
    .setDistance — candidate enumeration stays the fuzzy terms enum):
    "levenshtein" (default, the int distance), "jaro_winkler"
    (JaroWinklerDistance.java) or "ngram" (NGramDistance.java) — the
    similarity measures rank by (sim desc, df desc, term asc) and
    ride the ``dist`` column as round(sim, 6)."""
    from pyspark.sql import Window

    c = F.col("term")
    cand = (
        searcher.termdict.filter(
            (F.length("term") >= F.lit(len(term) - max_edits))
            & (F.length("term") <= F.lit(len(term) + max_edits))
            & (c != term)
        )
        .withColumn("_ed", F.levenshtein(c, F.lit(term)))
        .filter(F.col("_ed") <= max_edits)
    )
    if distance == "levenshtein":
        cand = cand.select("term", "df", F.col("_ed").alias("dist"))
        order = [F.col("dist").asc(), F.col("df").desc(),
                 F.col("term").asc()]
    elif distance in ("jaro_winkler", "ngram"):
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        from ..functions.strdist import jaro_winkler, ngram_distance

        fn = jaro_winkler if distance == "jaro_winkler" else ngram_distance

        # NOTE: hints must reference the real class (a string
        # annotation would not resolve under deferred evaluation)
        def _sim(col: pd.Series) -> pd.Series:
            return col.map(lambda t: round(fn(t, term), 6))

        _sim.__annotations__ = {"col": pd.Series, "return": pd.Series}
        sim = pandas_udf(_sim, "double")

        cand = cand.select("term", "df", sim(c).alias("dist"))
        order = [F.col("dist").desc(), F.col("df").desc(),
                 F.col("term").asc()]
    else:
        raise ValueError(f"unknown distance {distance!r}")
    top = cand.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return (
        top.withColumn("rank", F.row_number().over(w).cast("int"))
        .select("rank", "term", "df", "dist")
        .orderBy("rank")
    )


def collate_spellcheck(
    searcher,
    terms: list[str],
    k: int = 5,
    max_collations: int = 1,
    max_tries: int = 10,
    max_edits: int = 2,
) -> DataFrame:
    """Spellcheck collation — solr/core/src/java/org/apache/solr/
    spelling/SpellCheckCollator.java:79-177 (collate): terms absent
    from the dictionary get DirectSpellChecker suggestions; candidate
    corrected queries ("possibilities", PossibilityIterator.java) are
    tried in suggestion-rank order, each VERIFIED by actually running
    the rewritten conjunction, and only combinations with hits survive
    (:123-158 — hit count recorded per collation).  Terms present in
    the dictionary are kept verbatim (rank-0 candidate).

    Spark-first shape: one termdict probe classifies the terms, one
    pushed-down fuzzy probe per misspelled term collects its k
    candidates, then at most ``max_tries`` distributed conjunction
    counts verify combinations (the reference likewise re-executes the
    query per try).  Combination order is rank-sum ascending with the
    candidate tuple as tie-break — PossibilityIterator's ranked queue.
    Returns (rank, collation, hits); empty when nothing is misspelled
    (the reference only collates when corrections exist)."""
    import heapq

    from ..plans.queries import term_and

    spark = searcher.spark
    out_schema = "rank int, collation string, hits bigint"
    dfs = searcher._term_stats(set(terms))
    if all(dfs.get(t, (0, 0))[0] > 0 for t in terms):
        return spark.createDataFrame([], out_schema)
    cands: list[list[tuple[int, str]]] = []
    for t in terms:
        if dfs.get(t, (0, 0))[0] > 0:
            cands.append([(0, t)])
            continue
        sugg = suggest_fuzzy(searcher, t, k=k, max_edits=max_edits).collect()
        if not sugg:
            # an uncorrectable term: no collation can match (:101-108)
            return spark.createDataFrame([], out_schema)
        cands.append([(r["rank"], r["term"]) for r in sugg])
    # ranked-possibility sweep: pop combinations by (rank sum, terms)
    heap = [(
        sum(c[0][0] for c in cands),
        tuple(c[0][1] for c in cands),
        (0,) * len(cands),
    )]
    seen = {(0,) * len(cands)}
    rows, tries = [], 0
    while heap and tries < max_tries and len(rows) < max_collations:
        _, combo, idx = heapq.heappop(heap)
        tries += 1
        hits = searcher.matches_df(term_and(list(combo))).count()
        if hits > 0:
            rows.append((len(rows) + 1, " ".join(combo), hits))
        for slot in range(len(cands)):
            nxt = list(idx)
            nxt[slot] += 1
            nxt = tuple(nxt)
            if nxt in seen or nxt[slot] >= len(cands[slot]):
                continue
            seen.add(nxt)
            heapq.heappush(heap, (
                sum(cands[s][i][0] for s, i in enumerate(nxt)),
                tuple(cands[s][i][1] for s, i in enumerate(nxt)),
                nxt,
            ))
    return spark.createDataFrame(rows, out_schema)


def suggest_word_breaks(
    searcher,
    word: str,
    k: int = 10,
    min_break_length: int = 1,
    min_freq: int = 1,
) -> DataFrame:
    """WordBreakSpellChecker.suggestWordBreaks — lucene/suggest/src/
    java/org/apache/lucene/search/spell/WordBreakSpellChecker.java:
    90-122 + generateBreakUpSuggestions :256-292: split a run-together
    word into TWO dictionary words (maxChanges=1, the default :37),
    each part >= minBreakWordLength chars (:35) with df >=
    minSuggestionFrequency (:34); SUGGEST_WHEN_NOT_IN_INDEX returns
    nothing when the input itself is indexed (:110-112); ranked
    NUM_CHANGES_THEN_MAX_FREQUENCY (:100, the default) — changes are
    constant here so the order is max(part df) desc, split position
    asc as the deterministic tie-break.

    Spark-first shape: the left parts are ONE pushed-down termdict
    scan (term is a prefix of ``word`` — at most len(word) rows), the
    right-part lookup is a broadcast hash join of that tiny set back
    against the termdict on exact term; no driver-side term list.
    Returns (rank, term "left right", df = max part df)."""
    from pyspark.sql import Window

    spark = searcher.spark
    out_schema = "rank int, term string, df bigint"
    if searcher._term_stats({word}).get(word, (0, 0))[0] > 0:
        return spark.createDataFrame([], out_schema)
    td = searcher.termdict
    lit_w = F.lit(word)
    lefts = (
        td.filter(
            (F.length("term") >= min_break_length)
            & (F.length("term") <= len(word) - min_break_length)
            & (lit_w.substr(F.lit(1), F.length("term")) == F.col("term"))
            & (F.col("df") >= min_freq)
        )
        .select(
            F.col("term").alias("left"),
            F.col("df").alias("df_l"),
            lit_w.substr(
                F.length("term") + F.lit(1), F.lit(len(word))
            ).alias("right"),
        )
    )
    cand = td.select(
        F.col("term").alias("right"), F.col("df").alias("df_r")
    ).filter(F.col("df_r") >= min_freq).join(F.broadcast(lefts), "right")
    order = [
        F.greatest("df_l", "df_r").desc(), F.length("left").asc(),
    ]
    top = cand.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return (
        top.withColumn("rank", F.row_number().over(w).cast("int"))
        .select(
            "rank",
            F.concat_ws(" ", "left", "right").alias("term"),
            F.greatest("df_l", "df_r").cast("bigint").alias("df"),
        )
        .orderBy("rank")
    )


def suggest_word_combinations(
    searcher,
    terms: list[str],
    k: int = 10,
    min_freq: int = 1,
) -> DataFrame:
    """WordBreakSpellChecker.suggestWordCombinations (:159-255):
    adjacent input terms (maxChanges=1 => pairs, :197) whose
    CONCATENATION is a dictionary word with df >= minSuggestionFrequency
    (:221); SUGGEST_WHEN_NOT_IN_INDEX requires at least one of the two
    parts to be absent from the index (minFreq == 0 gate, :219-220);
    ranked combinations-then-freq (:175 CombinationsThenFreqComparator)
    — combination count is constant 1 here, so combined df desc, pair
    position asc.  Returns (rank, term = combined word, df).

    Spark-first: the pair list is a tiny broadcast table joined against
    the termdict on the combined term — one hash join, no collect of
    the dictionary."""
    from pyspark.sql import Window

    spark = searcher.spark
    dfs = searcher._term_stats(set(terms))
    pairs = [
        (i, terms[i] + terms[i + 1])
        for i in range(len(terms) - 1)
        if min(dfs.get(terms[i], (0, 0))[0],
               dfs.get(terms[i + 1], (0, 0))[0]) == 0
    ]
    if not pairs:
        return spark.createDataFrame([], "rank int, term string, df bigint")
    pairs_df = spark.createDataFrame(pairs, "pos int, combined string")
    order = [F.col("df").desc(), F.col("pos").asc()]
    cand = (
        searcher.termdict.select(F.col("term").alias("combined"), "df")
        .filter(F.col("df") >= min_freq)
        .join(F.broadcast(pairs_df), "combined")
    )
    top = cand.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return (
        top.withColumn("rank", F.row_number().over(w).cast("int"))
        .select("rank", F.col("combined").alias("term"),
                F.col("df").cast("bigint").alias("df"))
        .orderBy("rank")
    )


# ---- FreeTextSuggester: n-gram language model with stupid backoff ----

FREETEXT_ALPHA = 0.4  # FreeTextSuggester.ALPHA


def build_freetext_model(
    docs,
    cfg,
    grams: int = 2,
    content_col: str = "content",
) -> DataFrame:
    """The FreeTextSuggester build: n-gram counts over the analyzed
    corpus, orders 1..grams.

    Reference: lucene/suggest/src/java/org/apache/lucene/search/
    suggest/analyzing/FreeTextSuggester.java:64-75 (class doc: "A
    free-text suggester that predicts the next token using an n-gram
    language model with stupid backoff", Brants et al. 2007 [public
    paper], default grams=2), :176-212 (build indexes ShingleFilter
    output and stores each gram's totalTermFreq as its weight;
    totTokens = sum of unigram counts).

    Returns (ord, ctx, token, cnt): ``ctx`` is the space-joined
    (ord-1)-token context ('' for unigrams), ``cnt`` the corpus count
    of the full gram.  Spark-first: tokenization + shingling are one
    JVM/Arrow map, the model is ONE groupBy over the exploded grams —
    partial aggregation makes the shuffle key (gram) carry map-side
    combined counts, the exact plan you'd run at 100 TB."""
    from ..functions.analysis import jvm_token_array

    toks = jvm_token_array(content_col, cfg.analyzer)
    if cfg.analyzer == "standard":
        toks = F.transform(
            F.filter(toks, lambda t: F.length(t) <= cfg.max_token_length),
            F.lower,
        )
    out = None
    base = docs.select(toks.alias("t"))
    def _gram_struct(n):
        # one-arg lambda for F.transform (pyspark introspects arity)
        def gram_struct(i):
            ctx = (
                F.array_join(F.slice("t", i + 1, n - 1), " ")
                if n > 1 else F.lit("")
            )
            return F.struct(
                ctx.alias("ctx"), F.element_at("t", i + n).alias("token")
            )
        return gram_struct

    for n in range(1, grams + 1):
        # positions 0..len-n; gram i = tokens[i : i+n]
        idx = F.when(
            F.size("t") >= n, F.sequence(F.lit(0), F.size("t") - n)
        ).otherwise(F.array().cast("array<int>"))
        g = base.select(
            F.explode(F.transform(idx, _gram_struct(n))).alias("g")
        ).select(
            F.lit(n).alias("ord"), F.col("g.ctx"), F.col("g.token")
        )
        out = g if out is None else out.unionByName(g)
    return out.groupBy("ord", "ctx", "token").agg(F.count("*").alias("cnt"))


def suggest_freetext(
    model: DataFrame,
    key: str,
    cfg,
    k: int = 10,
    grams: int = 2,
) -> DataFrame:
    """FreeTextSuggester.lookup (:404-510): split the key into a
    context + a last-token prefix (a trailing separator means the last
    token ENDED and the prefix is empty, :455-470); then from the
    highest gram order down, score completions of the prefix by
    ``backoff * count(gram) / count(context)`` — contextCount is the
    (g-1)-gram's own count, totTokens at order 1 (:540-551) — with
    backoff starting at 1.0 and multiplying by ALPHA=0.4 per order
    descended (:504); a token already suggested by a higher order is
    skipped (the ``seen`` set, :575-580).

    Declarative form: each order is one pushed-down filter of the
    model table; the cross-order dedup is an anti-join; ranking is
    (score desc, token asc), score rounded to 9.  Returns
    (rank, token, score)."""
    from pyspark.sql import Window

    from ..functions.analysis import SIMPLE_TOKEN_RE, tokenize_text

    sep_ended = bool(key) and not SIMPLE_TOKEN_RE.match(key[-1].lower())
    tokens = tokenize_text(key, cfg.analyzer, cfg.max_token_length,
                           tuple(cfg.stopwords))
    if sep_ended:
        context, prefix = tokens, ""
    else:
        if not tokens:
            raise ValueError("no tokens produced by analyzer")
        context, prefix = tokens[:-1], tokens[-1]

    spark = model.sparkSession
    tot = model.filter(F.col("ord") == 1).agg(F.sum("cnt")).collect()[0][0]
    levels = []
    backoff = 1.0
    for g in range(grams, 0, -1):
        ctx_toks = context[-(g - 1):] if g > 1 else []
        if g > 1 and len(context) < g - 1:
            backoff *= FREETEXT_ALPHA
            continue
        ctx = " ".join(ctx_toks)
        cand = model.filter(
            (F.col("ord") == g) & (F.col("ctx") == ctx)
            & F.col("token").startswith(prefix)
        )
        if g > 1:
            # contextCount = the (g-1)-gram's own count (:540-551)
            cctx = " ".join(ctx_toks[:-1])
            ctx_cnt = (
                model.filter(
                    (F.col("ord") == g - 1) & (F.col("ctx") == cctx)
                    & (F.col("token") == ctx_toks[-1])
                ).agg(F.sum("cnt")).collect()[0][0]
            )
            if not ctx_cnt:
                backoff *= FREETEXT_ALPHA
                continue
        else:
            ctx_cnt = tot
        levels.append(
            cand.select(
                F.lit(g).alias("lvl"), "token",
                (F.lit(backoff) * F.col("cnt") / F.lit(float(ctx_cnt)))
                .alias("score"),
            )
        )
        backoff *= FREETEXT_ALPHA
    if not levels:
        return spark.createDataFrame([], "rank int, token string, score double")
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    # higher order wins for a repeated token (the seen set)
    w = Window.partitionBy("token").orderBy(F.col("lvl").desc())
    dedup = out.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    rank_w = Window.orderBy(
        F.round("score", 9).desc(), F.col("token").asc()
    )
    return (
        dedup.withColumn("rank", F.row_number().over(rank_w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("rank", "token", F.round("score", 9).alias("score"))
        .orderBy("rank")
    )
