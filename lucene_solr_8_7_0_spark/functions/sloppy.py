"""Sloppy phrase matching — a faithful port of the reference's greedy
PhraseQueue traversal.

Reference: lucene/core/src/java/org/apache/lucene/search/
SloppyPhraseMatcher.java (nextMatch :164-196, advancePP :261-269,
advanceRpts :274-310, initPhrasePositions :350-384,
advanceRepeatGroups :405-446) and PhraseQueue.java:28-40 (ordering by
position, then offset, then ord).

Semantics preserved exactly, including the documented quirks: the
traversal always advances the least phrase position, so not every
slop-valid combination is counted ("a b c b a" scores differently for
"a b c"~4 vs "c b a"~4 — SloppyPhraseMatcher.java:38-54), and each
returned match contributes ``1 / (1 + matchLength)`` to the phrase
frequency (sloppyWeight :159-161).  The phrase freq is accumulated in
float32 like PhraseScorer's ``freq += matcher.sloppyWeight()``.

This matcher is inherently sequential per document (a priority-queue
walk with data-dependent advancement) — the reference is too — so it
runs as a per-candidate-doc Python loop strictly AFTER the vectorized
conjunction has narrowed candidates to docs containing every term.

Repetition support covers BOTH cases of the reference:

* repeated single terms at different phrase offsets (PhraseQuery
  "ho my my"~2) — groups by equal term, j-th repeat advanced j extra
  positions at init (advanceRepeatGroups case 1),
* multi-term repeats (the same term inside two different
  MultiPhraseQuery slots, hasMultiTermRpts): groups are CONNECTED
  COMPONENTS over slots sharing any repeating term (gatherRptGroups'
  bipartite term-union, :561-583 — "hidden collisions" like slots
  {A,B} / {B,C} group together even when the first doc shows them on
  different terms), and initialization resolves collisions iteratively
  by advancing the lesser pp (advanceRepeatGroups case 2, :415-432).
  Note the reference itself documents sloppy scoring with multi-term
  repeats as approximate (LUCENE-3821, the @Ignore'd
  testMultiSloppyWithRepeats); this port reproduces the shipped
  matcher's behavior, not the ignored ideal.
"""

from __future__ import annotations

import heapq

import numpy as np

__all__ = ["sloppy_phrase_freq"]


class _PPs:
    """PhrasePositions state for one document."""

    def __init__(self, pos_lists, offsets):
        self.n = len(pos_lists)
        self.lists = [
            np.asarray(p, dtype=np.int64) - offsets[i]
            for i, p in enumerate(pos_lists)
        ]
        self.offsets = offsets
        self.ptr = [0] * self.n
        self.pos = [int(self.lists[i][0]) for i in range(self.n)]
        self.end = 0  # set by caller after repeat-group advancement

    def next_position(self, i: int) -> bool:
        self.ptr[i] += 1
        if self.ptr[i] >= len(self.lists[i]):
            return False
        self.pos[i] = int(self.lists[i][self.ptr[i]])
        return True

    def advance_pp(self, i: int) -> bool:
        """advancePP: advance + maintain `end` (:261-269)."""
        if not self.next_position(i):
            return False
        if self.pos[i] > self.end:
            self.end = self.pos[i]
        return True

    def tp_pos(self, i: int) -> int:
        return self.pos[i] + self.offsets[i]


def sloppy_phrase_freq(
    pos_lists: list[np.ndarray],
    offsets: list[int],
    slop: int,
    group_keys: list | None = None,
) -> np.float32:
    """Phrase frequency of one document for a sloppy phrase.

    ``pos_lists[i]``: sorted term positions (tpPos domain) of clause i
    in this doc; ``offsets[i]``: the clause's phrase offset;
    ``group_keys[i]``: identity key for repetition detection (the term
    string for PhraseQuery; defaults to the clause index = no repeats).
    Returns float32 freq (0.0 = no match).
    """
    n = len(pos_lists)
    if n == 0 or any(len(p) == 0 for p in pos_lists):
        return np.float32(0.0)
    if n == 1:  # degenerate (rewrites unwrap single-term phrases)
        return np.float32(len(pos_lists[0]))
    pp = _PPs(pos_lists, offsets)

    # repetition groups.  Keys normalize to term SETS (a plain term is
    # a singleton); a term occurring in >= 2 slots is "repeating"
    # (repeatingTerms :548-559).  Groups are connected components of
    # slots over shared repeating terms (gatherRptGroups :520-546:
    # non-multi-term grouping by equal term is the special case where
    # every component is one term), sorted by phrase offset.
    keys = group_keys if group_keys is not None else list(range(n))
    key_sets = [
        k if isinstance(k, frozenset) else frozenset([k]) for k in keys
    ]
    term_count: dict = {}
    for ks in key_sets:
        for t in ks:
            term_count[t] = term_count.get(t, 0) + 1
    rpt_terms = {t for t, c in term_count.items() if c >= 2}
    rpt_pps = [i for i in range(n) if key_sets[i] & rpt_terms]
    has_multi_term_rpts = any(len(key_sets[i]) > 1 for i in rpt_pps)
    # union-find over repeating terms (unionTermGroups): slots sharing
    # any repeating term land in one group
    parent = {t: t for t in rpt_terms}

    def find(t):
        while parent[t] != t:
            parent[t] = parent[parent[t]]
            t = parent[t]
        return t

    for i in rpt_pps:
        ts = sorted(key_sets[i] & rpt_terms)
        for t in ts[1:]:
            parent[find(t)] = find(ts[0])
    by_root: dict = {}
    for i in rpt_pps:
        root = find(sorted(key_sets[i] & rpt_terms)[0])
        by_root.setdefault(root, []).append(i)
    rpt_groups = [
        sorted(g, key=lambda i: offsets[i])
        for g in by_root.values()
        if len(g) > 1
    ]
    rpt_group_of = [-1] * n
    rpt_ind = [-1] * n
    for gi, g in enumerate(rpt_groups):
        for j, i in enumerate(g):
            rpt_group_of[i] = gi
            rpt_ind[i] = j
    has_rpts = bool(rpt_groups)

    def _collide_in(g, i) -> int:
        """index-in-group of a pp colliding with i, or -1 (collide
        :324-334: same actual doc position within the group)."""
        tp = pp.tp_pos(i)
        for j in g:
            if j != i and pp.tp_pos(j) == tp:
                return rpt_ind[j]
        return -1

    # init: repeat groups start collision-free (advanceRepeatGroups).
    if has_rpts:
        if not has_multi_term_rpts:
            # case 1: the j-th repeat is advanced j extra positions
            for g in rpt_groups:
                for j in range(1, len(g)):
                    for _ in range(j):
                        if not pp.next_position(g[j]):
                            return np.float32(0.0)
        else:
            # case 2: some may not collide — resolve iteratively by
            # advancing the lesser of each colliding pair (:415-432)
            for g in rpt_groups:
                i = 0
                while i < len(g):
                    incr = 1
                    cur = g[i]
                    while True:
                        k = _collide_in(g, cur)
                        if k < 0:
                            break
                        a, b = cur, g[k]
                        if (pp.pos[b], offsets[b]) < (pp.pos[a], offsets[a]):
                            a = b  # lesser (:314-320)
                        if not pp.next_position(a):
                            return np.float32(0.0)
                        if rpt_ind[a] < i:  # "should not happen?"
                            incr = 0
                            break
                    i += incr
    pp.end = max(pp.pos)
    heap = [(pp.pos[i], offsets[i], i) for i in range(n)]
    heapq.heapify(heap)

    def advance_rpts(i: int) -> bool:
        """Resolve repeater collisions by advancing the lesser pp
        (:274-310).  The reference re-queues the touched in-queue pps;
        rebuilding the queue restores the identical total pop order
        (keys are unique by ord)."""
        if rpt_group_of[i] < 0:
            return True
        g = rpt_groups[rpt_group_of[i]]
        touched = False
        cur = i
        while True:
            other = -1
            for j in g:
                if j != cur and pp.tp_pos(j) == pp.tp_pos(cur):
                    other = j
                    break
            if other < 0:
                break
            a, b = cur, other
            if (pp.pos[b], offsets[b]) < (pp.pos[a], offsets[a]):
                a, b = b, a  # always advance the lesser (:314-320)
            if not pp.advance_pp(a):
                return False
            touched = True
            cur = a
        if touched:
            inq = [e[2] for e in heap]
            heap[:] = [(pp.pos[j], offsets[j], j) for j in inq]
            heapq.heapify(heap)
        return True

    freq = np.float32(0.0)
    positioned = True
    while positioned:
        # ---- nextMatch (:164-196) ----
        _, _, i = heapq.heappop(heap)
        match_length = pp.end - pp.pos[i]
        next_pos = heap[0][0]
        matched_now = False
        while True:
            if not pp.advance_pp(i):
                positioned = False
                break
            if has_rpts and not advance_rpts(i):
                positioned = False
                break
            if pp.pos[i] > next_pos:  # done minimizing this match
                heapq.heappush(heap, (pp.pos[i], offsets[i], i))
                if match_length <= slop:
                    matched_now = True
                    break
                _, _, i = heapq.heappop(heap)
                next_pos = heap[0][0]
                match_length = pp.end - pp.pos[i]
            else:
                match_length = min(match_length, pp.end - pp.pos[i])
        if matched_now or (not positioned and match_length <= slop):
            freq = np.float32(freq + np.float32(1.0 / (1.0 + match_length)))
    return freq
