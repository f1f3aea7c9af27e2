"""Logical query rewrites — BooleanQuery.rewrite ported rule-for-rule.

Reference: lucene/core/src/java/org/apache/lucene/search/
BooleanQuery.java:235-460 plus the rewrite fixpoint in
IndexSearcher.java:674-683.  These rewrite OUR IR on the driver (plain
Python — they are above Catalyst, which only ever plans the postings
scan).

Multi-term queries (prefix/wildcard/regexp/fuzzy/range/set) rewrite to
term disjunctions by consulting the term dictionary, the analog of
MultiTermQuery's SCORING_BOOLEAN_REWRITE.
"""

from __future__ import annotations

import re

from .queries import (
    BooleanClause,
    DisjunctionMaxQuery,
    IndexOrDocValuesQuery,
    MultiPhraseQuery,
    MultiTermUnionQuery,
    SynonymQuery,
    BooleanQuery,
    BoostQuery,
    Builder,
    ConstantScoreQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    MatchNoDocsQuery,
    Occur,
    PhraseQuery,
    MultiDimPointRangeQuery,
    PointRangeQuery,
    PrefixQuery,
    Query,
    RegexpQuery,
    TermAutomatonQuery,
    TermInSetQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)

__all__ = ["rewrite", "rewrite_multi_term", "expand_terms", "term_predicate"]


def rewrite(query: Query, term_lookup=None) -> Query:
    """Fixpoint rewrite (IndexSearcher.java:674-683).

    ``term_lookup(pred) -> list[str]`` resolves multi-term queries from
    the term dictionary; None leaves them un-rewritten.
    """
    for _ in range(16):  # fixpoint with a safety bound
        new = _rewrite_once(query, term_lookup)
        if new == query:
            return new
        query = new
    return query


def _rewrite_once(q: Query, term_lookup) -> Query:
    if isinstance(q, BoostQuery):
        inner = _rewrite_once(q.query, term_lookup)
        if isinstance(inner, BoostQuery):  # collapse nested boosts
            return BoostQuery(inner.query, q.boost * inner.boost)
        if isinstance(inner, MatchNoDocsQuery):
            return inner
        if q.boost == 1.0:
            return inner
        return BoostQuery(inner, q.boost)
    if isinstance(q, ConstantScoreQuery):
        inner = _rewrite_once(q.query, term_lookup)
        if isinstance(inner, MatchNoDocsQuery):
            return inner
        if isinstance(inner, ConstantScoreQuery):
            return inner
        return ConstantScoreQuery(inner)
    if isinstance(q, (PrefixQuery, WildcardQuery, RegexpQuery, FuzzyQuery,
                      TermRangeQuery, TermInSetQuery)):
        return rewrite_multi_term(q, term_lookup)
    if isinstance(q, IndexOrDocValuesQuery):
        # unwrap to the point range, flagged dv-eligible: the searcher
        # picks the access path by cost at scorer-supplier time
        # (IndexOrDocValuesQuery.java:105-131)
        inner = _rewrite_once(q.index_query, term_lookup)
        if isinstance(inner, MatchNoDocsQuery):
            return inner
        from dataclasses import replace

        return replace(inner, dv=True)
    if isinstance(q, PointRangeQuery):
        if (
            q.lower is not None
            and q.upper is not None
            and (q.lower > q.upper
                 or (q.lower == q.upper
                     and not (q.include_lower and q.include_upper)))
        ):
            return MatchNoDocsQuery("empty point range")
        return q
    if isinstance(q, MultiDimPointRangeQuery):
        # any provably-empty dimension empties the whole box
        # (CELL_OUTSIDE_QUERY on that dim, PointRangeQuery.java:118)
        for _f, lo, hi, il, iu in q.dims:
            if (lo is not None and hi is not None
                    and (lo > hi or (lo == hi and not (il and iu)))):
                return MatchNoDocsQuery("empty point range dim")
        return q
    if isinstance(q, PhraseQuery):
        if len(q.terms) == 1:  # PhraseQuery.rewrite: single term unwraps
            return TermQuery(q.terms[0])
        return q
    if isinstance(q, TermAutomatonQuery):
        # TermAutomatonQuery.rewrite (TermAutomatonQuery.java:rewrite):
        # singleton -> TermQuery; each accepted label path becomes a
        # phrase with EXPLICIT slot positions (ANY labels skip a
        # position, exactly like the sausage rewrite's matchesAny);
        # several paths combine SHOULD
        path_qs = []
        for path in q.paths():
            terms = tuple(t for t in path if t is not None)
            if not terms:
                raise ValueError("all-ANY path is not supported")
            pos = tuple(i for i, t in enumerate(path) if t is not None)
            if len(terms) == 1 and len(path) == 1:
                path_qs.append(TermQuery(terms[0]))
            else:
                path_qs.append(PhraseQuery(terms, slot_positions=pos))
        if len(path_qs) == 1:
            return _rewrite_once(path_qs[0], term_lookup)
        b = Builder()
        for pq_ in path_qs:
            b.add(_rewrite_once(pq_, term_lookup), Occur.SHOULD)
        return b.build()
    if isinstance(q, MultiPhraseQuery):
        # MultiPhraseQuery.rewrite (:193-206): empty -> MatchNoDocs,
        # one position -> OR over its terms; otherwise unchanged
        if not q.positions:
            return MatchNoDocsQuery("empty MultiPhraseQuery")
        if len(q.positions) == 1:
            b = Builder()
            for t in q.positions[0]:
                b.add(TermQuery(t), Occur.SHOULD)
            return b.build()
        return q
    if isinstance(q, SynonymQuery):
        if len(q.terms) == 1:  # blended stats of one term == the term
            return TermQuery(q.terms[0])
        return q
    if isinstance(q, DisjunctionMaxQuery):
        subs = tuple(_rewrite_once(x, term_lookup) for x in q.queries)
        subs = tuple(x for x in subs if not isinstance(x, MatchNoDocsQuery))
        if not subs:
            return MatchNoDocsQuery("all DisMax disjuncts match nothing")
        if len(subs) == 1:  # DisjunctionMaxQuery.rewrite single unwrap
            return subs[0]
        return DisjunctionMaxQuery(subs, q.tie_breaker)
    if isinstance(q, BooleanQuery):
        return _rewrite_boolean(q, term_lookup)
    return q


def _rewrite_boolean(q: BooleanQuery, term_lookup) -> Query:
    # recurse into children first
    clauses = [
        BooleanClause(c.occur, _rewrite_once(c.query, term_lookup))
        for c in q.clauses
    ]
    msm = q.minimum_should_match

    # empty BQ -> MatchNoDocs (BooleanQuery.java:236-239)
    if not clauses:
        return MatchNoDocsQuery("empty BooleanQuery")

    # 1-clause MUST/FILTER/SHOULD unwrap (:241-261); FILTER keeps
    # constant-score semantics
    if len(clauses) == 1 and msm <= 1:
        c = clauses[0]
        if c.occur == Occur.MUST or (c.occur == Occur.SHOULD and msm <= 1):
            return c.query
        if c.occur == Occur.FILTER:
            return ConstantScoreQuery(c.query) if not isinstance(
                c.query, ConstantScoreQuery
            ) else c.query
        # single MUST_NOT matches nothing (no positive clause)
        if c.occur == Occur.MUST_NOT:
            return MatchNoDocsQuery("pure negation")

    groups = {o: [] for o in Occur}
    for c in clauses:
        groups[c.occur].append(c.query)

    # dedup FILTER & MUST_NOT clause sets (:285-304)
    groups[Occur.FILTER] = _dedup(groups[Occur.FILTER])
    groups[Occur.MUST_NOT] = _dedup(groups[Occur.MUST_NOT])

    # MUST ∩ MUST_NOT ≠ ∅ -> MatchNoDocs; MUST_NOT MatchAll -> MatchNoDocs (:306-316)
    pos = set(map(_key, groups[Occur.MUST] + groups[Occur.FILTER]))
    for n in groups[Occur.MUST_NOT]:
        if _key(n) in pos:
            return MatchNoDocsQuery("FILTER or MUST clause also in MUST_NOT")
        if isinstance(n, MatchAllDocsQuery):
            return MatchNoDocsQuery("MUST_NOT clause is MatchAllDocsQuery")

    # remove FILTER clauses already required by MUST; drop MatchAll FILTER
    # when other required clauses exist (:318-339)
    must_keys = set(map(_key, groups[Occur.MUST]))
    filters = [f for f in groups[Occur.FILTER] if _key(f) not in must_keys]
    if len(groups[Occur.MUST]) + len(filters) > 1 or groups[Occur.MUST]:
        filters = [f for f in filters if not isinstance(f, MatchAllDocsQuery)] or (
            filters if not groups[Occur.MUST] else []
        )
    groups = dict(groups)
    groups[Occur.FILTER] = filters

    # FILTER ∩ SHOULD -> MUST (scoring preserved) when msm == 0 (:341-367)
    if msm == 0 and groups[Occur.SHOULD] and groups[Occur.FILTER]:
        should_keys = set(map(_key, groups[Occur.SHOULD]))
        promoted = [f for f in groups[Occur.FILTER] if _key(f) in should_keys]
        if promoted:
            pk = set(map(_key, promoted))
            groups[Occur.FILTER] = [f for f in groups[Occur.FILTER] if _key(f) not in pk]
            groups[Occur.MUST] = groups[Occur.MUST] + [
                s for s in groups[Occur.SHOULD] if _key(s) in pk
            ]
            groups[Occur.SHOULD] = [
                s for s in groups[Occur.SHOULD] if _key(s) not in pk
            ]

    # dedup SHOULD / MUST summing boosts (:369-430).  SHOULD merging
    # only applies when minimumNumberShouldMatch <= 1: with msm >= 2 a
    # duplicated SHOULD clause counts twice toward msm, so merging
    # [a, a, b] to [a^2, b] would wrongly exclude docs matching only
    # 'a' (BooleanQuery.java:383-386 guards on the same condition).
    if msm <= 1:
        groups[Occur.SHOULD] = _dedup_sum_boosts(groups[Occur.SHOULD])
    groups[Occur.MUST] = _dedup_sum_boosts(groups[Occur.MUST])

    # drop MatchNoDocs SHOULD clauses; a required MatchNoDocs kills the query
    for o in (Occur.MUST, Occur.FILTER):
        if any(isinstance(x, MatchNoDocsQuery) for x in groups[o]):
            return MatchNoDocsQuery("required clause matches nothing")
    groups[Occur.SHOULD] = [
        s for s in groups[Occur.SHOULD] if not isinstance(s, MatchNoDocsQuery)
    ]
    groups[Occur.MUST_NOT] = [
        n for n in groups[Occur.MUST_NOT] if not isinstance(n, MatchNoDocsQuery)
    ]

    # SHOULD count below minimumShouldMatch -> nothing can match
    has_required = bool(groups[Occur.MUST] or groups[Occur.FILTER])
    effective_msm = max(msm, 0 if has_required else 1)
    if len(groups[Occur.SHOULD]) < effective_msm and (
        msm > 0 or not has_required
    ):
        if len(groups[Occur.SHOULD]) == 0 and has_required and msm == 0:
            pass
        elif len(groups[Occur.SHOULD]) < effective_msm:
            return MatchNoDocsQuery("fewer SHOULD clauses than minimumShouldMatch")

    b = Builder()
    for o in (Occur.MUST, Occur.FILTER, Occur.SHOULD, Occur.MUST_NOT):
        for sub in groups[o]:
            b.add(sub, o)
    b.set_minimum_number_should_match(msm)
    out = b.build()
    if not out.clauses:
        return MatchNoDocsQuery("no clauses left after rewrite")
    if len(out.clauses) == 1 and msm <= 1:
        c = out.clauses[0]
        if c.occur in (Occur.MUST, Occur.SHOULD):
            return c.query
        if c.occur == Occur.FILTER:
            return ConstantScoreQuery(c.query)
        return MatchNoDocsQuery("pure negation")
    return out


def _key(q: Query):
    return q  # frozen dataclasses hash/compare structurally


def _dedup(qs: list[Query]) -> list[Query]:
    seen, out = set(), []
    for q in qs:
        if _key(q) not in seen:
            seen.add(_key(q))
            out.append(q)
    return out


def _dedup_sum_boosts(qs: list[Query]) -> list[Query]:
    """Duplicate scoring clauses merge with summed boosts (:369-430)."""
    acc: dict = {}
    order: list = []
    for q in qs:
        base, boost = (q.query, q.boost) if isinstance(q, BoostQuery) else (q, 1.0)
        if base in acc:
            acc[base] += boost
        else:
            acc[base] = boost
            order.append(base)
    out = []
    for base in order:
        boost = acc[base]
        out.append(base if boost == 1.0 else BoostQuery(base, boost))
    return out


# ---------------- multi-term expansion ----------------


def term_predicate(q: Query):
    """The multi-term query's match predicate as a picklable
    ``str -> bool`` callable — the automaton shipped to the segment
    kernels for the distributed constant-score union (the compiled
    ByteRunAutomaton that MultiTermQuery hands each TermsEnum).
    Exactly the same semantics as expand_terms."""
    if isinstance(q, PrefixQuery):
        p = q.prefix
        return lambda t: t.startswith(p)
    if isinstance(q, WildcardQuery):
        pat = re.escape(q.pattern).replace(r"\*", ".*").replace(r"\?", ".")
        rx = re.compile(f"^{pat}$")
        return lambda t: rx.match(t) is not None
    if isinstance(q, RegexpQuery):
        rx = re.compile(f"^(?:{q.pattern})$")
        return lambda t: rx.match(t) is not None
    if isinstance(q, TermRangeQuery):
        lo, hi, il, iu = q.lower, q.upper, q.include_lower, q.include_upper

        def in_range(t: str) -> bool:
            if lo is not None and (t < lo or (t == lo and not il)):
                return False
            if hi is not None and (t > hi or (t == hi and not iu)):
                return False
            return True

        return in_range
    if isinstance(q, TermInSetQuery):
        s = frozenset(q.terms)
        return lambda t: t in s
    if isinstance(q, FuzzyQuery):
        base, k, plen = q.term, q.max_edits, q.prefix_length
        return lambda t: (
            t[:plen] == base[:plen] and _within_edits(base, t, k)
        )
    raise TypeError(type(q))


def expand_terms(q: Query, all_terms: list[str]) -> list[str]:
    """Resolve a multi-term query against a sorted term list."""
    if isinstance(q, PrefixQuery):
        return [t for t in all_terms if t.startswith(q.prefix)]
    if isinstance(q, WildcardQuery):
        pat = re.escape(q.pattern).replace(r"\*", ".*").replace(r"\?", ".")
        rx = re.compile(f"^{pat}$")
        return [t for t in all_terms if rx.match(t)]
    if isinstance(q, RegexpQuery):
        rx = re.compile(f"^(?:{q.pattern})$")
        return [t for t in all_terms if rx.match(t)]
    if isinstance(q, TermRangeQuery):
        lo, hi = q.lower, q.upper
        out = []
        for t in all_terms:
            if lo is not None and (t < lo or (t == lo and not q.include_lower)):
                continue
            if hi is not None and (t > hi or (t == hi and not q.include_upper)):
                continue
            out.append(t)
        return out
    if isinstance(q, TermInSetQuery):
        s = set(all_terms)
        return [t for t in q.terms if t in s]
    if isinstance(q, FuzzyQuery):
        return [
            t
            for t in all_terms
            if t[: q.prefix_length] == q.term[: q.prefix_length]
            and _within_edits(q.term, t, q.max_edits)
        ]
    raise TypeError(type(q))


def _within_edits(a: str, b: str, k: int) -> bool:
    """Banded Levenshtein <= k (FuzzyQuery's LevenshteinAutomata analog)."""
    if abs(len(a) - len(b)) > k:
        return False
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        lo = max(1, i - k)
        hi = min(len(b), i + k)
        if lo > 1:
            cur[lo - 1] = k + 1
        for j in range(lo, hi + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (ca != b[j - 1]),
            )
        if hi < len(b):
            for j in range(hi + 1, len(b) + 1):
                cur[j] = k + 1
        prev = cur
        if min(prev) > k:
            return False
    return prev[len(b)] <= k


def rewrite_multi_term(q: Query, term_lookup) -> Query:
    """MultiTermQuery rewrite (MultiTermQuery.java rewrite methods):

    * prefix/wildcard/regexp/range/set -> constant-score union over the
      matching terms' postings — CONSTANT_SCORE_REWRITE, the
      reference's DEFAULT for these types
      (MultiTermQueryConstantScoreWrapper builds one bitset, scores
      boost, and never throws TooManyClauses).  The expansion itself
      stays DISTRIBUTED (MultiTermUnionQuery): the driver only probes
      the term dict for the 0-match (-> MatchNoDocs) and 1-match
      (-> TermQuery, the wrapper's tiny-expansion unwrap) cases; with
      2+ matches the predicate ships to the scan + kernel and no term
      list is ever collected,
    * FuzzyQuery -> SHOULD-disjunction of TermQuerys with per-term BM25
      (the reference uses TopTermsBlendedFreqScoringRewrite — scored
      term expansion; we score ALL matching terms up to maxClauseCount
      rather than the top 50, then fall back to the distributed
      constant-score union).

    ``term_lookup(q)`` returns the matching terms when they are few
    enough to enumerate driver-side, or None meaning "many" — take the
    distributed union path."""
    if term_lookup is None:
        return q
    terms = term_lookup(q)
    if terms is None:
        return ConstantScoreQuery(MultiTermUnionQuery(q))
    if not terms:
        return MatchNoDocsQuery(f"no terms match {q}")
    if len(terms) == 1:
        return TermQuery(terms[0])
    if not isinstance(q, FuzzyQuery):
        return ConstantScoreQuery(MultiTermUnionQuery(q))
    b = Builder()
    for t in terms:
        b.add(TermQuery(t), Occur.SHOULD)
    return b.build()
