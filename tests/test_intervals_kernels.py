"""Linear interval kernels (r5): the MinimumShouldMatchIntervalIterator
priority-queue sweep and the OrderedIntervalIterator linear advance,
checked for (a) equivalence with the r4 model implementations
(subset-enumeration / per-first-slot rescan — correct but
combinatorially shaped), (b) bounded work on adversarial
many-occurrence documents via the kernel work counter (not wall
clock).
"""

import random
from itertools import combinations

import pytest

from lucene_solr_8_7_0_spark.functions import intervals as iv
from lucene_solr_8_7_0_spark.plans.queries import (
    IAtLeast, IOrdered, ITerm,
)


# ---- model implementations (the r4 semantics, kept as oracles) ----

def model_chain_ordered(sub_lists):
    """Per-first-slot greedy rescan (r4 _chain_ordered)."""
    if any(len(sl) == 0 for sl in sub_lists):
        return []
    out = []
    for f in sub_lists[0]:
        prev_end = f[1]
        occupied = f[2]
        ok = True
        for sl in sub_lists[1:]:
            cands = [x for x in sl if x[0] > prev_end]
            if not cands:
                ok = False
                break
            nxt = min(cands, key=lambda x: (x[1], x[0]))
            prev_end = nxt[1]
            occupied += nxt[2]
        if ok:
            out.append((f[0], prev_end, occupied))
    return iv._minimalize(out)


def model_at_least(lists, m):
    """Full product over every m-subset, minimalized — mirrors the
    independent brute oracle (functions/oracle.py IAtLeast), which is
    the engine's semantic spec."""
    from itertools import product

    out = []
    for combo_lists in combinations(lists, m):
        for combo in product(*combo_lists):
            out.append((
                min(c[0] for c in combo),
                max(c[1] for c in combo),
                sum(c[2] for c in combo),
            ))
    return iv._minimalize(out)


def _rand_lists(rng, n_lists, max_ivs, max_pos, width=1):
    lists = []
    for _ in range(n_lists):
        k = rng.randint(1, max_ivs)
        starts = sorted(rng.sample(range(max_pos), k))
        lists.append([
            (s, s + (0 if width == 1 else rng.randint(0, width - 1)), 1)
            for s in starts
        ])
    return lists


# ---- atLeast: PQ sweep == subset enumeration -----------------------

@pytest.mark.parametrize("seed", range(40))
def test_msm_sweep_equals_subset_enumeration_terms(seed):
    rng = random.Random(seed)
    n = rng.randint(2, 6)
    m = rng.randint(2, n)
    lists = _rand_lists(rng, n, max_ivs=8, max_pos=40)
    new = iv._minimalize(iv._msm_sweep([list(s) for s in lists], m))
    old = model_at_least(lists, m)
    # width-1 term sources: occ is always m, so full-tuple equality
    assert new == old, (lists, m)


@pytest.mark.parametrize("seed", range(25))
def test_msm_sweep_equals_subset_enumeration_wide(seed):
    """Wider (nested-style) sub intervals, full-tuple equality: a kept
    window is spanned exactly by every contained m-combo, so the
    sweep's sum-of-m-smallest-minima occupied equals the enumeration's
    min-over-combos."""
    rng = random.Random(1000 + seed)
    n = rng.randint(2, 5)
    m = rng.randint(2, n)
    lists = _rand_lists(rng, n, max_ivs=6, max_pos=30, width=4)
    new = iv._minimalize(iv._msm_sweep([list(s) for s in lists], m))
    old = model_at_least(lists, m)
    assert new == old, (lists, m)


def test_msm_sweep_through_source_tree():
    """End-to-end through minimal_intervals on a real position map."""
    pos = {
        "a": [0, 10, 20],
        "b": [1, 11],
        "c": [5, 25],
        "d": [30],
    }
    src = IAtLeast(2, (ITerm("a"), ITerm("b"), ITerm("c"), ITerm("d")))
    got = iv.minimal_intervals(src, pos)
    lists = [[(p, p, 1) for p in pos[t]] for t in "abcd"]
    exp = model_at_least(lists, 2)
    assert got == exp


# ---- ordered: linear advance == per-first-slot rescan ---------------

@pytest.mark.parametrize("seed", range(40))
def test_chain_ordered_equals_model(seed):
    rng = random.Random(2000 + seed)
    n = rng.randint(2, 5)
    lists = _rand_lists(rng, n, max_ivs=8, max_pos=50)
    new = iv._chain_ordered([list(s) for s in lists])
    old = model_chain_ordered(lists)
    assert new == old, (lists,)


@pytest.mark.parametrize("seed", range(20))
def test_chain_ordered_equals_model_wide(seed):
    rng = random.Random(3000 + seed)
    n = rng.randint(2, 4)
    lists = _rand_lists(rng, n, max_ivs=6, max_pos=40, width=3)
    new = iv._chain_ordered([list(s) for s in lists])
    old = model_chain_ordered(lists)
    assert new == old, (lists,)


def test_chain_ordered_through_source_tree():
    pos = {"x": [0, 5, 9, 14], "y": [2, 7, 12], "z": [3, 8, 13]}
    src = IOrdered((ITerm("x"), ITerm("y"), ITerm("z")))
    got = iv.minimal_intervals(src, pos)
    lists = [[(p, p, 1) for p in pos[t]] for t in "xyz"]
    assert got == model_chain_ordered(lists)


# ---- adversarial docs: work must stay linear ------------------------

def test_ordered_work_linear_on_hot_repeated_terms():
    """The r4 shape rescanned later lists per first-slot interval
    (O(n1 * sum rest)); the port advances each sub monotonically, so
    total advances are bounded by the total interval count."""
    N = 2000
    lists = [
        [(p, p, 1) for p in range(0, 3 * N, 3)],
        [(p, p, 1) for p in range(1, 3 * N, 3)],
        [(p, p, 1) for p in range(2, 3 * N, 3)],
    ]
    total = sum(len(sl) for sl in lists)
    iv.reset_work()
    out = iv._chain_ordered(lists)
    assert len(out) == N
    assert iv.get_work() <= 2 * total + 10


def test_msm_work_linear_on_hot_repeated_terms():
    """C(n, m) enumeration with n=8 hot sources was 70 sweeps over the
    doc; the right-edge sweep touches each interval O(1) times (event
    scan + sliding-window pointers)."""
    N = 1000
    n, m = 8, 4
    lists = [
        [(p, p, 1) for p in range(i, n * N, n)] for i in range(n)
    ]
    total = sum(len(sl) for sl in lists)
    iv.reset_work()
    out = iv._msm_sweep([list(s) for s in lists], m)
    assert len(out) > 0
    assert iv.get_work() <= 4 * total + 10


def test_msm_emits_known_minimal_set():
    """Hand-checked: sources a@{0}, b@{1,5}, c@{9}, m=2 — minimal
    covers are (0,1) and (5,9)."""
    lists = [[(0, 0, 1)], [(1, 1, 1), (5, 5, 1)], [(9, 9, 1)]]
    got = iv._minimalize(iv._msm_sweep(lists, 2))
    assert got == [(0, 1, 2), (5, 9, 2)]
