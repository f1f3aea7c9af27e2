"""Minimal-interval algebra vs the reference's own golden vectors.

Docs and expected interval sets ported from
lucene/queries/src/test/org/apache/lucene/queries/intervals/
TestIntervals.java (field1_docs:62-70, field2_docs:76-84 and the
checkIntervals expectations of the cited test methods).  These pin the
behavior of Intervals.term / ordered (incl. duplicate collapsing) /
unordered (incl. repeats) / or / phrase / maxgaps and the gaps()
accounting — no Spark involved.
"""

import numpy as np
import pytest

from lucene_solr_8_7_0_spark.functions.analysis import analyze_batch
from lucene_solr_8_7_0_spark.functions.intervals import (
    interval_freq,
    min_extent,
    minimal_intervals,
    saturation_score,
)
from lucene_solr_8_7_0_spark.plans.queries import (
    IBlock,
    IMaxGaps,
    IMaxWidth,
    IOr,
    IOrdered,
    IUnordered,
)

FIELD1 = [
    "Nothing of interest to anyone here",
    "Pease porridge hot, pease porridge cold, pease porridge in the pot nine days old.  Some like it hot, some like it cold, some like it in the pot nine days old",
    "Pease porridge cold, pease porridge hot, pease porridge in the pot twelve days old.  Some like it cold, some like it hot, some like it in the fraggle",
    "Nor here, nowt hot going on in pease this one",
    "Pease porridge hot, pease porridge cold, pease porridge in the pot nine years old.  Some like it hot, some like it twelve",
    "Porridge is great",
]
FIELD2 = [
    "In Xanadu did Kubla Khan a stately pleasure dome decree",
    "Where Alph the sacred river ran through caverns measureless to man",
    "a b a c b a b c",
    "So thrice five miles of fertile ground",
    "Pease hot porridge porridge",
    "w1 w2 w3 w4 w1 w6 w3 w8 w4 w7 w1 w6",
]


def pos_maps(docs):
    import pandas as pd

    out = []
    for text in docs:
        tb = analyze_batch(pd.Series([text]), "standard")
        pm = {}
        for t, p in zip(tb.terms, tb.positions):
            pm.setdefault(t, []).append(int(p))
        out.append({t: np.asarray(v, np.int64) for t, v in pm.items()})
    return out


F1 = pos_maps(FIELD1)
F2 = pos_maps(FIELD2)


def ivs(src, pm):
    return [(s, e) for s, e, _ in minimal_intervals(src, pm)]


def pairs(flat):
    return [(flat[i], flat[i + 1]) for i in range(0, len(flat), 2)]


def check(src, maps, expected_per_doc):
    for d, exp in enumerate(expected_per_doc):
        assert ivs(src, maps[d]) == pairs(exp), f"doc {d}"


def test_term_intervals():
    # TestIntervals.testTermQueryIntervals
    check("porridge", F1, [
        [], [1, 1, 4, 4, 7, 7], [1, 1, 4, 4, 7, 7], [], [1, 1, 4, 4, 7, 7],
        [0, 0],
    ])


def test_ordered_near_intervals():
    # testOrderedNearIntervals
    src = IOrdered(("pease", "hot"))
    check(src, F1, [
        [], [0, 2, 6, 17], [3, 5, 6, 21], [], [0, 2, 6, 17], [],
    ])
    assert min_extent(src) == 2


def test_ordered_with_duplicates_and_gaps():
    # testOrderedNearWithDuplicates (consecutive duplicate sources
    # collapse to a repeat; gaps() counts uncovered positions)
    src = IOrdered(("pease", "pease", "porridge"))
    check(src, F1, [[], [0, 4, 3, 7], [0, 4, 3, 7], [], [0, 4, 3, 7], []])
    gaps = [
        (e - s + 1) - occ for s, e, occ in minimal_intervals(src, F1[1])
    ]
    assert gaps == [2, 2]  # assertGaps(source, 1, field1, {2, 2})


def test_phrase_intervals():
    # testPhraseIntervals
    src = IBlock(("pease", "porridge"))
    check(src, F1, [
        [], [0, 1, 3, 4, 6, 7], [0, 1, 3, 4, 6, 7], [],
        [0, 1, 3, 4, 6, 7], [],
    ])


def test_unordered_near_intervals():
    # testUnorderedNearIntervals (+ gaps {1, 0, 10} on doc 1)
    src = IUnordered(("pease", "hot"))
    check(src, F1, [
        [], [0, 2, 2, 3, 6, 17], [3, 5, 5, 6, 6, 21], [3, 7],
        [0, 2, 2, 3, 6, 17], [],
    ])
    gaps = [
        (e - s + 1) - occ for s, e, occ in minimal_intervals(src, F1[1])
    ]
    assert gaps == [1, 0, 10]


def test_unordered_with_repeats():
    # testUnorderedWithRepeats: duplicates need DISTINCT occurrences
    src = IUnordered(("pease", "pease", "hot"))
    check(src, F1, [
        [], [0, 3, 2, 6, 3, 17], [0, 5, 3, 6], [], [0, 3, 2, 6, 3, 17], [],
    ])


def test_unordered_with_repeats_and_maxgaps():
    # testUnorderedWithRepeatsAndMaxGaps
    src = IMaxGaps(2, IUnordered(("pease", "pease", "hot")))
    check(src, F1, [[], [0, 3, 2, 6], [3, 6], [], [0, 3, 2, 6], []])


def test_interval_disjunction():
    # testIntervalDisjunction
    src = IOr(("pease", "hot", "notmatching"))
    check(src, F1, [
        [], [0, 0, 2, 2, 3, 3, 6, 6, 17, 17],
        [0, 0, 3, 3, 5, 5, 6, 6, 21, 21], [3, 3, 7, 7],
        [0, 0, 2, 2, 3, 3, 6, 6, 17, 17], [],
    ])
    assert min_extent(src) == 1


def test_combination_disjunction_minimality():
    # testCombinationDisjunction: the (alph .. measureless) chain is
    # dropped because it properly contains (sacred .. measureless)
    src = IOrdered((IOr(("alph", "sacred")), "measureless"))
    check(src, F2, [[], [3, 8]])
    assert min_extent(src) == 2


def test_nesting():
    # testNesting: unordered with a nested or
    src = IUnordered(("pease", "porridge", IOr(("hot", "cold"))))
    exp = [0, 2, 1, 3, 2, 4, 3, 5, 4, 6, 5, 7, 6, 17]
    check(src, F1, [[], exp, exp, [], exp, []])
    assert min_extent(src) == 3
    gaps = [
        (e - s + 1) - occ for s, e, occ in minimal_intervals(src, F1[1])
    ]
    assert gaps == [0, 0, 0, 0, 0, 0, 9]


def test_interval_freq_and_saturation():
    # IntervalScorer: freq = sum 1/max(width - minExtent + 1, 1);
    # score = boost * (1 - pivot/(pivot + freq))
    src = IOrdered(("pease", "hot"))
    m = min_extent(src)
    iv = minimal_intervals(src, F1[1])  # widths 3 and 12
    freq = interval_freq(iv, m)
    exp = np.float32(np.float32(1.0 / 2.0) + 1.0 / 11.0)
    assert freq == exp
    s = saturation_score(freq, pivot=1.0, boost=2.0)
    assert s == np.float32(2.0 * (1.0 - 1.0 / (1.0 + float(freq))))


def test_randomized_kernel_vs_exhaustive_brute():
    """The iterator-style minimal-interval algorithms vs an independent
    exhaustive-combination implementation (oracle), on random docs and
    random source trees."""
    import random

    from lucene_solr_8_7_0_spark.functions.oracle import (
        brute_minimal_intervals,
    )

    rng = random.Random(23)
    vocab = ["a", "b", "c", "d"]
    for trial in range(250):
        doc = [rng.choice(vocab) for _ in range(rng.randint(4, 14))]
        pm = {}
        for i, t in enumerate(doc):
            pm.setdefault(t, []).append(i)
        pm = {t: np.asarray(v, np.int64) for t, v in pm.items()}

        def rand_term():
            return rng.choice(vocab)

        from lucene_solr_8_7_0_spark.plans.queries import (
            IAtLeast, IContainedBy, IContaining, INonOverlapping,
            INotContainedBy, INotContaining, IOverlapping,
            intervals_after, intervals_before, intervals_not_within,
            intervals_within,
        )

        def rand_src(depth):
            kinds = ["term", "ordered", "unordered", "or", "block",
                     "maxgaps", "maxwidth", "containing", "contained_by",
                     "not_containing", "not_contained_by", "overlapping",
                     "non_overlapping", "at_least", "within", "not_within",
                     "before", "after"]
            k = rng.choice(kinds if depth < 2 else ["term"])
            if k == "term":
                return rand_term()
            if k == "at_least":
                n = rng.randint(2, 4)
                subs = tuple(rand_src(depth + 1) for _ in range(n))
                return IAtLeast(rng.randint(1, n), subs)
            if k in ("within", "not_within"):
                a, b = rand_src(depth + 1), rand_src(depth + 1)
                p = rng.randint(0, 3)
                return (intervals_within(a, p, b) if k == "within"
                        else intervals_not_within(a, p, b))
            if k in ("before", "after"):
                a, b = rand_src(depth + 1), rand_src(depth + 1)
                return (intervals_before(a, b) if k == "before"
                        else intervals_after(a, b))
            if k in ("overlapping", "non_overlapping"):
                a, b = rand_src(depth + 1), rand_src(depth + 1)
                return (IOverlapping(a, b) if k == "overlapping"
                        else INonOverlapping(a, b))
            if k in ("ordered", "unordered", "or", "block"):
                n = rng.randint(2, 3)
                subs = tuple(rand_src(depth + 1) for _ in range(n))
                return {"ordered": IOrdered, "unordered": IUnordered,
                        "or": IOr, "block": IBlock}[k](subs)
            if k == "maxgaps":
                return IMaxGaps(rng.randint(0, 3), rand_src(depth + 1))
            if k == "maxwidth":
                return IMaxWidth(rng.randint(1, 6), rand_src(depth + 1))
            a, b = rand_src(depth + 1), rand_src(depth + 1)
            return {"containing": lambda: IContaining(a, b),
                    "contained_by": lambda: IContainedBy(a, b),
                    "not_containing": lambda: INotContaining(a, b),
                    "not_contained_by": lambda: INotContainedBy(a, b)}[k]()

        src = rand_src(0)
        got = minimal_intervals(src, pm)
        exp = brute_minimal_intervals(src, pm)
        assert got == exp, (doc, src, got, exp)


def test_containment_filters():
    # testContainedBy / testContaining / testNotContaining
    from lucene_solr_8_7_0_spark.plans.queries import (
        IContainedBy,
        IContaining,
        INotContaining,
    )

    src = IContainedBy("porridge", IOrdered(("pease", "cold")))
    check(src, F1, [
        [], [4, 4, 7, 7], [1, 1, 7, 7], [], [4, 4], [],
    ])
    src = IContaining(IOrdered(("pease", "cold")), "porridge")
    check(src, F1, [
        [], [3, 5, 6, 21], [0, 2, 6, 17], [], [3, 5], [],
    ])
    src = INotContaining(IOrdered(("porridge", "pease")), "hot")
    check(src, F1, [
        [], [4, 6], [1, 3], [], [4, 6], [],
    ])


def test_multiterm_prefix_and_wildcard():
    # testPrefix / testWildcard: automaton expansion over the doc's
    # vocabulary (resolution is per available-term set)
    from lucene_solr_8_7_0_spark.functions.intervals import (
        resolve_multiterm,
    )
    from lucene_solr_8_7_0_spark.plans.queries import (
        IMultiTerm,
        PrefixQuery,
        WildcardQuery,
    )

    def mt_ivs(node, pm):
        return [
            (s, e)
            for s, e, _ in minimal_intervals(
                resolve_multiterm(node, sorted(pm)), pm
            )
        ]

    pre = IMultiTerm(PrefixQuery("p"))
    exp = [
        [],
        [0, 0, 1, 1, 3, 3, 4, 4, 6, 6, 7, 7, 10, 10, 27, 27],
        [0, 0, 1, 1, 3, 3, 4, 4, 6, 6, 7, 7, 10, 10],
        [7, 7],
        [0, 0, 1, 1, 3, 3, 4, 4, 6, 6, 7, 7, 10, 10],
        [0, 0],
    ]
    for d in range(6):
        assert mt_ivs(pre, F1[d]) == pairs(exp[d]), d
    wc = IMultiTerm(WildcardQuery("?ot"))
    exp = [
        [], [2, 2, 10, 10, 17, 17, 27, 27], [5, 5, 10, 10, 21, 21],
        [3, 3], [2, 2, 10, 10, 17, 17], [],
    ]
    for d in range(6):
        assert mt_ivs(wc, F1[d]) == pairs(exp[d]), d
    # expansion cap: the reference throws beyond maxExpansions
    import pytest as _pytest

    with _pytest.raises(ValueError, match="too many terms"):
        resolve_multiterm(
            IMultiTerm(PrefixQuery("p"), max_expansions=2), sorted(F1[1])
        )
    # no matching terms -> never matches
    assert mt_ivs(IMultiTerm(PrefixQuery("qqq")), F1[1]) == []


def test_offset_intervals():
    # testOffsetIntervals: PRECEDING/FOLLOWING emit one width-1 marker
    # per inner interval, duplicates kept ({0,0} appears twice)
    from lucene_solr_8_7_0_spark.plans.queries import IOffset

    src = IUnordered(("pease", "porridge", IOr(("hot", "cold"))))
    exp1 = [0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5]
    check(IOffset(src, True), F1, [[], exp1, exp1, [], exp1, []])
    exp2 = [3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8, 18, 18]
    check(IOffset(src, False), F1, [[], exp2, exp2, [], exp2, []])


def test_minimum_should_match():
    # testMinimumShouldMatch: atLeast(3, porridge hot twelve nine pease)
    from lucene_solr_8_7_0_spark.plans.queries import IAtLeast

    src = IAtLeast(3, ("porridge", "hot", "twelve", "nine", "pease"))
    check(src, F1, [
        [],
        [0, 2, 1, 3, 2, 4, 6, 11, 7, 17],
        [3, 5, 4, 6, 5, 7, 6, 11, 7, 21],
        [],
        [0, 2, 1, 3, 2, 4, 6, 11, 7, 17, 11, 21],
        [],
    ])
    # assertGaps(source, 1, "field1", {0, 0, 0, 3, 8})
    got = minimal_intervals(src, F1[1])
    assert [(e - s + 1) - o for s, e, o in got] == [0, 0, 0, 3, 8]
    assert min_extent(src) == 3


def test_defined_gaps_extend():
    # testDefinedGaps: phrase(pease, extend(cold,1,1), porridge), and
    # extend(w1, 5, MAX) saturating without minimalization
    from lucene_solr_8_7_0_spark.plans.queries import IExtend

    src = IBlock(("pease", IExtend("cold", 1, 1), "porridge"))
    check(src, F1, [[], [3, 7], [0, 4], [], [3, 7], []])
    assert min_extent(src) == 5

    MAX = 2**31 - 1
    src = IExtend("w1", 5, MAX)
    check(src, F2, [
        [], [], [], [], [],
        [0, MAX - 1, 0, MAX - 1, 5, MAX - 1],
    ])
    assert min_extent(src) == MAX


def test_before_after_within():
    # testAfter / testBefore / testWithin
    from lucene_solr_8_7_0_spark.plans.queries import (
        intervals_after,
        intervals_before,
        intervals_within,
    )

    src = intervals_after("porridge", IOrdered(("pease", "cold")))
    check(src, F1, [[], [7, 7], [4, 4, 7, 7], [], [7, 7], []])
    assert min_extent(src) == 1

    src = intervals_before("cold", "twelve")
    check(src, F1, [[], [], [2, 2], [], [5, 5], []])
    assert min_extent(src) == 1

    src = intervals_within("hot", 6, IOr(("porridge", "fraggle")))
    check(src, F1, [[], [2, 2], [5, 5, 21, 21], [], [2, 2], []])
    assert min_extent(src) == 1


def test_overlapping_and_non_overlapping():
    # testOverlapping (+ its gaps vector); nonOverlapping == complement
    from lucene_solr_8_7_0_spark.plans.queries import (
        INonOverlapping,
        IOverlapping,
    )

    a = IUnordered(("hot", "porridge"))
    b = IUnordered(("cold", "pease"))
    src = IOverlapping(a, b)
    check(src, F1, [[], [2, 4, 7, 17], [5, 7, 7, 21], [], [2, 4], []])
    # assertGaps(source, 2, "field1", {1, 13})
    got = minimal_intervals(src, F1[2])
    assert [(e - s + 1) - o for s, e, o in got] == [1, 13]
    assert min_extent(src) == 2

    # the two filters partition the source's intervals per doc
    # overlapping/nonOverlapping partition the source's intervals
    # (when the reference is absent, overlapping=[] and neg=all)
    neg = INonOverlapping(a, b)
    for pm in F1:
        both = sorted(minimal_intervals(src, pm) + minimal_intervals(neg, pm))
        assert both == minimal_intervals(a, pm)


def test_unordered_no_overlaps_and_not_within():
    from lucene_solr_8_7_0_spark.plans.queries import (
        intervals_not_within,
        intervals_unordered_no_overlaps,
    )

    # or(ordered(a,b), ordered(b,a)): pease/hot on doc 1 — ordered
    # hits (0,2),(6,17); reversed hits (2,3)? hot@2 -> pease@3 = (2,3)
    src = intervals_unordered_no_overlaps("pease", "hot")
    got = ivs(src, F1[1])
    assert (2, 3) in got and got == sorted(got)

    # notWithin: hot at least 2 positions from every pease
    src = intervals_not_within("hot", 2, "pease")
    # doc1: pease@0,3,6 hot@2,17 -> hot@2 is within 2 of pease@0/3;
    # hot@17 is clear
    assert ivs(src, F1[1]) == [(17, 17)]
