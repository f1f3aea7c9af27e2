"""Minimal-interval algebra — the queries/intervals family.

Reference: lucene/queries/src/java/org/apache/lucene/queries/intervals/
— TermIntervalsSource (term positions as width-1 intervals),
OrderedIntervalsSource.java:29 (in-order, non-overlapping chains, with
consecutive duplicate sources collapsed into RepeatingIntervalsSource
per :53-71), UnorderedIntervalsSource.java:31 (minimal covering
windows, overlaps between DISTINCT subs allowed),
DisjunctionIntervalsSource (union), BlockIntervalsSource (consecutive),
FilteredIntervalsSource (maxgaps/maxwidth), IntervalScorer.java:65-70
(sloppy freq) and IntervalScoreFunction.java:70-75 (saturation).

The defining property is MINIMALITY: an interval that properly
contains another matching interval is never emitted.  This module
computes, per document, the full minimal-interval list of a source
tree over {term -> sorted positions} — a direct set-algebra
implementation of the iterator semantics, validated against the
reference's own golden vectors (TestIntervals.java, ported in
tests/test_intervals.py).

Each interval is a tuple ``(start, end, occupied)`` where ``occupied``
counts leaf positions covered — ``gaps = width - occupied``
(IntervalIterator.gaps(); e.g. RepeatingIntervalsSource's
``end - start + 1 - childCount``).

Complexity: the combinators are linear sweeps — ordered chaining uses
monotone pointers + a suffix argmin, atLeast is a single right-edge
sweep with sliding-window deques (the MinimumShouldMatchIntervalIterator
analog) — so per-document work is O(total occurrences of the source
terms), the same regime as the reference's iterators; a per-process
work counter (`get_work`) backs complexity assertions in
tests/test_intervals_kernels.py without wall-clock flake.  Only the
non-monotone fallbacks (Extended/Offset inputs) keep a direct scan.
"""

from __future__ import annotations

import numpy as np

from ..plans.queries import (
    IAtLeast,
    IBlock,
    IContainedBy,
    IContaining,
    IExtend,
    IMaxGaps,
    IMaxWidth,
    IMultiTerm,
    INonOverlapping,
    INotContainedBy,
    INotContaining,
    IOffset,
    IOr,
    IOrdered,
    IOverlapping,
    ITerm,
    IUnordered,
    _I32MAX,
)

_CONTAIN = (IContaining, IContainedBy, INotContaining, INotContainedBy)
_WRAP = (IMaxGaps, IMaxWidth, IExtend, IOffset)  # single-child filters

__all__ = [
    "resolve_multiterm",
    "minimal_intervals",
    "min_extent",
    "required_terms",
    "all_terms",
    "interval_freq",
    "saturation_score",
]

def _norm(src):
    return ITerm(src) if isinstance(src, str) else src


def min_extent(src) -> int:
    src = _norm(src)
    if isinstance(src, (ITerm, IMultiTerm)):
        return 1  # MultiTermIntervalsSource.minExtent() == 1
    if isinstance(src, (IOrdered, IUnordered, IBlock)):
        return sum(min_extent(s) for s in src.sources)
    if isinstance(src, IOr):
        return min(min_extent(s) for s in src.sources)
    if isinstance(src, (IMaxGaps, IMaxWidth)):
        return min_extent(src.source)
    if isinstance(src, IExtend):
        # ExtendedIntervalsSource.minExtent saturates on i32 overflow
        # (testDefinedGaps expects MAX for 1 + 5 + MAX)
        return min(min_extent(src.source) + src.before + src.after, _I32MAX)
    if isinstance(src, IOffset):
        return 1  # OffsetIntervalsSource.minExtent() == 1
    if isinstance(src, IOverlapping):
        return min_extent(src.source)
    if isinstance(src, INonOverlapping):
        return min_extent(src.minuend)
    if isinstance(src, IAtLeast):
        exts = sorted(min_extent(s) for s in src.sources)
        return sum(exts[: src.min_should_match])
    if isinstance(src, (IContaining, INotContaining)):
        return min_extent(src.big)
    if isinstance(src, (IContainedBy, INotContainedBy)):
        return min_extent(src.small)
    raise TypeError(type(src))


def all_terms(src) -> set[str]:
    src = _norm(src)
    if isinstance(src, ITerm):
        return {src.term}
    if isinstance(src, (IOrdered, IUnordered, IBlock, IOr, IAtLeast)):
        out: set[str] = set()
        for s in src.sources:
            out |= all_terms(s)
        return out
    if isinstance(src, _WRAP):
        return all_terms(src.source)
    if isinstance(src, IOverlapping):
        return all_terms(src.source) | all_terms(src.reference)
    if isinstance(src, INonOverlapping):
        return all_terms(src.minuend) | all_terms(src.subtrahend)
    if isinstance(src, _CONTAIN):
        return all_terms(src.big) | all_terms(src.small)
    if isinstance(src, IMultiTerm):
        return set()  # dynamic: expands per segment (resolve_multiterm)
    raise TypeError(type(src))


def required_terms(src) -> set[str]:
    """Terms that MUST occur for the source to match (conjunctive
    pre-filter for candidate docs; or-branches intersect)."""
    src = _norm(src)
    if isinstance(src, ITerm):
        return {src.term}
    if isinstance(src, (IOrdered, IUnordered, IBlock)):
        out: set[str] = set()
        for s in src.sources:
            out |= required_terms(s)
        return out
    if isinstance(src, IOr):
        reqs = [required_terms(s) for s in src.sources]
        return set.intersection(*reqs) if reqs else set()
    if isinstance(src, _WRAP):
        return required_terms(src.source)
    if isinstance(src, IOverlapping):
        # conjunction: both sides must be present in the doc
        return required_terms(src.source) | required_terms(src.reference)
    if isinstance(src, INonOverlapping):
        # difference: only the minuend is required
        return required_terms(src.minuend)
    if isinstance(src, IAtLeast):
        # a term is required iff its absence alone can break every
        # m-subset: it must be required by > n - m of the sources
        n, m = len(src.sources), src.min_should_match
        reqs = [required_terms(s) for s in src.sources]
        counts: dict[str, int] = {}
        for r in reqs:
            for t in r:
                counts[t] = counts.get(t, 0) + 1
        return {t for t, c in counts.items() if c > n - m}
    if isinstance(src, (IContaining, IContainedBy)):
        # both sides must match for anything to be emitted
        return required_terms(src.big) | required_terms(src.small)
    if isinstance(src, INotContaining):
        return required_terms(src.big)
    if isinstance(src, INotContainedBy):
        return required_terms(src.small)
    if isinstance(src, IMultiTerm):
        return set()
    raise TypeError(type(src))


_NO_MATCH = "\x00__interval_no_match__"


def resolve_multiterm(src, available_terms) -> object:
    """Replace every IMultiTerm with the IOr of its matching terms
    among ``available_terms`` (the segment-local term dictionary) —
    the per-leaf automaton expansion of MultiTermIntervalsSource.
    Raises like the reference when the cap is exceeded; an expansion
    with no matches becomes a never-matching term."""
    src = _norm(src)
    if isinstance(src, IMultiTerm):
        from ..plans.rewrite import term_predicate

        pred = term_predicate(src.query)
        matches = sorted(t for t in available_terms if pred(t))
        if len(matches) > src.max_expansions:
            raise ValueError(
                f"Automaton [{src.query}] expanded to too many terms "
                f"(limit {src.max_expansions})"
            )
        if not matches:
            return ITerm(_NO_MATCH)
        if len(matches) == 1:
            return ITerm(matches[0])
        return IOr(tuple(ITerm(t) for t in matches))
    if isinstance(src, (IOrdered, IUnordered, IBlock, IOr)):
        return type(src)(tuple(
            resolve_multiterm(s, available_terms) for s in src.sources
        ))
    if isinstance(src, IAtLeast):
        return IAtLeast(src.min_should_match, tuple(
            resolve_multiterm(s, available_terms) for s in src.sources
        ))
    if isinstance(src, (IMaxGaps, IMaxWidth)):
        return type(src)(
            src.gaps if isinstance(src, IMaxGaps) else src.width,
            resolve_multiterm(src.source, available_terms),
        )
    if isinstance(src, IExtend):
        return IExtend(
            resolve_multiterm(src.source, available_terms),
            src.before, src.after,
        )
    if isinstance(src, IOffset):
        return IOffset(
            resolve_multiterm(src.source, available_terms), src.preceding
        )
    if isinstance(src, IOverlapping):
        return IOverlapping(
            resolve_multiterm(src.source, available_terms),
            resolve_multiterm(src.reference, available_terms),
        )
    if isinstance(src, INonOverlapping):
        return INonOverlapping(
            resolve_multiterm(src.minuend, available_terms),
            resolve_multiterm(src.subtrahend, available_terms),
        )
    if isinstance(src, _CONTAIN):
        return type(src)(
            resolve_multiterm(
                src.big if isinstance(src, (IContaining, INotContaining))
                else src.small, available_terms,
            ),
            resolve_multiterm(
                src.small if isinstance(src, (IContaining, INotContaining))
                else src.big, available_terms,
            ),
        )
    return src


def _minimalize(ivs: list) -> list:
    """Drop intervals that PROPERLY contain another; dedupe; sort by
    (start, end).  Process in (end asc, start desc) order: X contains
    an earlier-kept Y iff X.start <= max(start of kept)."""
    uniq = sorted(set((s, e) for s, e, _ in ivs), key=lambda x: (x[1], -x[0]))
    occ = {}
    for s, e, o in ivs:  # smallest occupied per (start,end) — same width
        occ[(s, e)] = min(o, occ.get((s, e), o))
    kept = []
    max_start = -1
    for s, e in uniq:
        if s > max_start:
            kept.append((s, e, occ[(s, e)]))
            max_start = s
    kept.sort(key=lambda x: (x[0], x[1]))
    return kept


def _dedup_runs(sources) -> list[tuple[object, int]]:
    """Consecutive equal sub-sources -> (source, repeat_count) runs
    (OrderedIntervalsSource.deduplicate:53-71)."""
    runs: list[list] = []
    for s in sources:
        s = _norm(s)
        if runs and runs[-1][0] == s:
            runs[-1][1] += 1
        else:
            runs.append([s, 1])
    return [(s, k) for s, k in runs]


def _repeat(ivs: list, k: int) -> list:
    """RepeatingIntervalsSource: k successive NON-OVERLAPPING
    occurrences of the inner source -> one interval spanning them.
    For width-1 terms this is the classic window over k consecutive
    positions; for wider inners, chain greedily like ordered."""
    if k == 1:
        return ivs
    return _chain_ordered([ivs] * k)


# per-process work counter for complexity assertions in tests: every
# sub-iterator advance in the linear kernels increments it once, so a
# test can pin "work is O(total intervals)" without wall-clock flake
_WORK = 0


def reset_work() -> None:
    global _WORK
    _WORK = 0


def get_work() -> int:
    return _WORK


def _monotone(sl: list) -> bool:
    """start- AND end-sorted — true for every MINIMAL list (no
    containment => both coordinates strictly increase); only the
    deliberately non-minimal Extended/Offset wrappers can break it."""
    return all(
        sl[i][0] <= sl[i + 1][0] and sl[i][1] <= sl[i + 1][1]
        for i in range(len(sl) - 1)
    )


def _chain_ordered(sub_lists: list[list]) -> list:
    """Minimal in-order non-overlapping chains across sub interval
    lists (OrderedIntervalIterator semantics,
    OrderedIntervalsSource.java:133-165): for each first-slot interval,
    extend with the earliest-ending strictly-later interval per slot,
    then minimalize.

    Linear shape (r4 VERDICT #4): successive first-slot intervals have
    non-decreasing ends, and each greedy choice's end is monotone in
    its predecessor, so every slot's candidate frontier only moves
    FORWARD — one monotone pointer per slot plus a precomputed
    suffix-argmin by (end, start) replaces the per-first-slot rescan;
    total work O(sum of list lengths).  Non-monotone inputs (an
    Extended/Offset wrapper that kept duplicates) fall back to the
    direct scan."""
    global _WORK
    if any(len(sl) == 0 for sl in sub_lists):
        return []
    n = len(sub_lists)
    if n == 1:
        return list(sub_lists[0])
    rest = sub_lists[1:]
    fast = _monotone(sub_lists[0]) and all(
        all(sl[i][0] <= sl[i + 1][0] for i in range(len(sl) - 1))
        for sl in rest
    )
    out = []
    if fast:
        # suffix argmin by (end, start) per later slot — with ties the
        # LEFTMOST index wins, matching min()'s stability in the scan
        sufmin = []
        for sl in rest:
            am = [0] * len(sl)
            best = len(sl) - 1
            for i in range(len(sl) - 1, -1, -1):
                if (sl[i][1], sl[i][0]) <= (sl[best][1], sl[best][0]):
                    best = i
                am[i] = best
            sufmin.append(am)
        ptr = [0] * len(rest)
        for f in sub_lists[0]:
            prev_end = f[1]
            occupied = f[2]
            ok = True
            for si, sl in enumerate(rest):
                p = ptr[si]
                while p < len(sl) and sl[p][0] <= prev_end:
                    p += 1
                    _WORK += 1
                ptr[si] = p
                if p >= len(sl):
                    ok = False
                    break
                nxt = sl[sufmin[si][p]]
                prev_end = nxt[1]
                occupied += nxt[2]
            if not ok:
                break
            out.append((f[0], prev_end, occupied))
        return _minimalize(out)
    for f in sub_lists[0]:
        prev_end = f[1]
        occupied = f[2]
        ok = True
        for sl in rest:
            cands = [x for x in sl if x[0] > prev_end]
            _WORK += len(sl)
            if not cands:
                ok = False
                break
            nxt = min(cands, key=lambda x: (x[1], x[0]))
            prev_end = nxt[1]
            occupied += nxt[2]
        if ok:
            out.append((f[0], prev_end, occupied))
    return _minimalize(out)


def _msm_sweep(lists: list[list], m: int) -> list:
    """Minimal windows covering intervals from >= m distinct sources —
    the MinimumShouldMatch semantics (the engine's subset-enumeration
    spec: union over m-subsets of one-interval-per-source products,
    minimalized) computed by a single right-edge sweep instead of
    C(n, m) enumeration (r4 VERDICT #4; reference iterator:
    MinimumShouldMatchIntervalsSource.java:150-276 — a PQ sweep of the
    same O(total x log n) shape, whose lazy minimization can
    under-report windows; this engine keeps the complete minimal set,
    which is what the golden vectors and the SQL oracles pin).

    Sweep: for each candidate right edge R (every interval end, asc),
    best[j] = max start among source j's intervals with end <= R; the
    tightest >=m-cover ending at R is [m-th largest best, R].  Every
    minimal window is tight at its own R, so the candidate set covers
    the spec's kept set; containment minimalization then drops the
    rest.  Occupied: a KEPT window is spanned exactly by every
    contained m-combo, so its minimal occupied = sum of the m smallest
    per-source minima of contained intervals — computed with one
    monotone pointer pair + min-deque per source (windows' starts and
    ends both strictly increase), falling back to a direct scan for
    non-monotone (Extended/Offset) inputs.  Total O(T log T)."""
    global _WORK
    from collections import deque

    n = len(lists)
    evs = sorted(
        (e, s, j) for j, sl in enumerate(lists) for (s, e, _) in sl
    )
    best = [-1] * n
    cands = []
    i = 0
    T = len(evs)
    while i < T:
        r_edge = evs[i][0]
        while i < T and evs[i][0] == r_edge:
            e, s, j = evs[i]
            if s > best[j]:
                best[j] = s
            i += 1
            _WORK += 1
        tops = sorted((b for b in best if b >= 0), reverse=True)
        if len(tops) >= m:
            cands.append((tops[m - 1], r_edge))
    kept = _minimalize([(s, e, 0) for s, e in cands])
    if not kept:
        return []
    out = []
    if all(_monotone(sl) for sl in lists):
        # kept windows: starts and ends strictly increase -> per
        # source, contained intervals form a sliding [lo, hi) range;
        # a monotone min-deque yields the per-window occupied minimum
        lo = [0] * n
        hi = [0] * n
        dq: list = [deque() for _ in range(n)]  # (occ, idx) increasing occ
        for s, e, _ in kept:
            mins = []
            for j, sl in enumerate(lists):
                while hi[j] < len(sl) and sl[hi[j]][1] <= e:
                    o = sl[hi[j]][2]
                    while dq[j] and dq[j][-1][0] >= o:
                        dq[j].pop()
                    dq[j].append((o, hi[j]))
                    hi[j] += 1
                    _WORK += 1
                while lo[j] < hi[j] and sl[lo[j]][0] < s:
                    if dq[j] and dq[j][0][1] == lo[j]:
                        dq[j].popleft()
                    lo[j] += 1
                    _WORK += 1
                if lo[j] < hi[j] and dq[j]:
                    mins.append(dq[j][0][0])
            mins.sort()
            out.append((s, e, sum(mins[:m])))
        return out
    for s, e, _ in kept:
        mins = []
        for sl in lists:
            c = [o for (a, b, o) in sl if a >= s and b <= e]
            _WORK += len(sl)
            if c:
                mins.append(min(c))
        mins.sort()
        out.append((s, e, sum(mins[:m])))
    return out


def minimal_intervals(src, pos: dict[str, np.ndarray]) -> list:
    """All minimal intervals of ``src`` in one document, as sorted
    (start, end, occupied) tuples.  ``pos``: term -> sorted positions
    present in the doc."""
    src = _norm(src)
    if isinstance(src, ITerm):
        pp = pos.get(src.term)
        if pp is None or len(pp) == 0:
            return []
        return [(int(p), int(p), 1) for p in pp]
    if isinstance(src, (IOrdered, IBlock)):
        runs = [
            _repeat(minimal_intervals(s, pos), k)
            for s, k in _dedup_runs(src.sources)
        ]
        if isinstance(src, IOrdered):
            return _chain_ordered(runs)
        # block: consecutive chaining (next.start == prev.end + 1)
        if any(len(r) == 0 for r in runs):
            return []
        out = []
        for f in runs[0]:
            prev_end, occupied, ok = f[1], f[2], True
            for sl in runs[1:]:
                nxt = next((iv for iv in sl if iv[0] == prev_end + 1), None)
                if nxt is None:
                    ok = False
                    break
                prev_end = nxt[1]
                occupied += nxt[2]
            if ok:
                out.append((f[0], prev_end, occupied))
        return _minimalize(out)
    if isinstance(src, IUnordered):
        # duplicates group by EQUALITY (order is immaterial here)
        groups: list[tuple[object, int]] = []
        for s in src.sources:
            s = _norm(s)
            for i, (g, k) in enumerate(groups):
                if g == s:
                    groups[i] = (g, k + 1)
                    break
            else:
                groups.append((s, 1))
        subs = [
            _repeat(minimal_intervals(s, pos), k) for s, k in groups
        ]
        # covering windows over ALL groups == the atLeast sweep with
        # m = n (product semantics; the former _sweep_cover staircase
        # could under-report when wide sub intervals overlap)
        return _minimalize(_msm_sweep(subs, len(subs)))
    if isinstance(src, IOr):
        out = []
        for s in src.sources:
            out.extend(minimal_intervals(s, pos))
        return _minimalize(out)
    if isinstance(src, IMaxGaps):
        return [
            iv for iv in minimal_intervals(src.source, pos)
            if (iv[1] - iv[0] + 1) - iv[2] <= src.gaps
        ]
    if isinstance(src, IMaxWidth):
        return [
            iv for iv in minimal_intervals(src.source, pos)
            if iv[1] - iv[0] + 1 <= src.width
        ]
    if isinstance(src, IExtend):
        # ExtendedIntervalIterator: stretch bounds, clamp start at 0,
        # saturate end below NO_MORE_INTERVALS; no re-minimalization
        # (testDefinedGaps keeps the contained (5,MAX-1) AND both
        # (0,MAX-1)s).  gaps() delegates to the inner iterator, so
        # occupied grows by exactly the applied extension.
        out = []
        for s, e, o in minimal_intervals(src.source, pos):
            ns = max(0, s - src.before)
            ne = min(e + src.after, _I32MAX - 1)
            out.append((ns, ne, o + (s - ns) + (ne - e)))
        return out
    if isinstance(src, IOffset):
        # OffsetIntervalIterator: width-1 markers, duplicates kept
        # (testOffsetIntervals expects {0,0} twice on doc 1)
        if src.preceding:
            return [
                (max(0, s - 1), max(0, s - 1), 1)
                for s, _e, _o in minimal_intervals(src.source, pos)
            ]
        return [
            (min(e + 1, _I32MAX - 1), min(e + 1, _I32MAX - 1), 1)
            for _s, e, _o in minimal_intervals(src.source, pos)
        ]
    if isinstance(src, (IOverlapping, INonOverlapping)):
        if isinstance(src, IOverlapping):
            emit = minimal_intervals(src.source, pos)
            other = minimal_intervals(src.reference, pos)
            want = True
        else:
            emit = minimal_intervals(src.minuend, pos)
            other = minimal_intervals(src.subtrahend, pos)
            want = False
        return [
            iv for iv in emit
            if any(o[0] <= iv[1] and iv[0] <= o[1] for o in other) == want
        ]
    if isinstance(src, IAtLeast):
        # MinimumShouldMatch semantics via a single right-edge sweep
        # (no subset enumeration; no distinct-occurrence rule: equal
        # sources may share a position).  Verified against
        # testMinimumShouldMatch's vectors and gaps, and equivalent to
        # covers-over-m-subsets after minimalization
        # (tests/test_intervals_kernels.py).
        live = [
            sl for sl in (minimal_intervals(s, pos) for s in src.sources)
            if sl
        ]
        if len(live) < src.min_should_match:
            return []
        return _minimalize(_msm_sweep(live, src.min_should_match))
    if isinstance(src, _CONTAIN):
        # containment filters over the two sides' minimal sets
        # (Containing/ContainedBy/NotContaining/NotContainedBy
        # IntervalsSource) — the emitted side's set stays minimal, so
        # no re-minimalization is needed
        if isinstance(src, (IContaining, INotContaining)):
            emit, other, want = (
                minimal_intervals(src.big, pos),
                minimal_intervals(src.small, pos),
                isinstance(src, IContaining),
            )
            def hit(b, s):  # big contains small
                return b[0] <= s[0] and s[1] <= b[1]
        else:
            emit, other, want = (
                minimal_intervals(src.small, pos),
                minimal_intervals(src.big, pos),
                isinstance(src, IContainedBy),
            )
            def hit(s, b):  # small inside big
                return b[0] <= s[0] and s[1] <= b[1]
        return [
            iv for iv in emit
            if any(hit(iv, o) for o in other) == want
        ]
    raise TypeError(type(src))


def interval_freq(ivs: list, m_extent: int) -> np.float32:
    """Sloppy interval frequency (IntervalScorer.java:65-70):
    ``freq += 1/max(width - minExtent + 1, 1)`` accumulated in the
    reference's float32 (`private float freq`)."""
    freq = np.float32(0.0)
    for s, e, _ in ivs:
        # Java: float freq += (double)1.0/max(...) — double add, one cast
        freq = np.float32(float(freq) + 1.0 / max((e - s + 1) - m_extent + 1, 1))
    return freq


def saturation_score(freq: np.float32, pivot: float, boost: float) -> np.float32:
    """``weight * (1 - pivot / (pivot + freq))`` in float32
    (IntervalScoreFunction.java:70-75)."""
    p = np.float32(pivot)
    return np.float32(
        np.float32(boost) * (np.float32(1.0) - p / (p + np.float32(freq)))
    )
