"""Greedy matching mirror: conflict resolution optimality + behavior checks."""

import itertools

import numpy as np
import pytest

from lara_tpu.solver import matching_ref


def brute_force_min_cover(conflicts):
    """Min-total-weight set of interactions covering every conflict."""
    edges = sorted({e for c in conflicts for e in c})
    best = None
    for mask in range(1 << len(edges)):
        chosen = {edges[k] for k in range(len(edges)) if mask >> k & 1}
        if all(a in chosen or b in chosen for (a, b) in conflicts):
            weight = sum(-e[0] for e in chosen)
            if best is None or weight < best:
                best = weight
    return best or 0


@pytest.mark.parametrize("seed", range(20))
def test_solve_conflicts_is_optimal(seed):
    rng = np.random.default_rng(seed)
    n_edges = int(rng.integers(2, 6))
    # interactions over a small line universe to force shared endpoints
    edges = set()
    while len(edges) < n_edges:
        l1, l2 = sorted(rng.integers(0, 6, 2).tolist())
        if l1 != l2:
            edges.add((-2 * int(rng.integers(0, 50)), l1, l2))
    edges = sorted(edges)
    conflicts = [
        (a, b)
        for a, b in itertools.combinations(edges, 2)
        if matching_ref._has_conflict(a, b)
    ]
    eliminate, weight = matching_ref.solve_conflicts(conflicts)
    # covers every conflict
    for a, b in conflicts:
        assert a in eliminate or b in eliminate
    # eliminated weight equals the brute-force optimum
    assert weight == brute_force_min_cover(conflicts)
    assert weight == sum(-e[0] for e in eliminate)


def test_greedy_matching_simple_chain():
    # lines 0-1-2; interaction scores: (0,1)=5, (1,2)=5, (0,2)=2
    # queue entries (-2*score, l, r): (-10,0,1), (-10,1,2), (-4,0,2)
    # all three selected; conflicts: (01,12),(01,02),(12,02).
    # valid min-weight covers: {01,02} or {12,02}, weight 14 each; the
    # recursion's S-branch tie-break eliminates {12, 02} and keeps {01}.
    partners = [[(5, 1), (2, 2)], [(5, 2)], []]
    score, contacts = matching_ref.greedy_matching(partners, [0, 1, 2], 5)
    assert score == 10  # kept edge (0,1): 2 * 5
    assert contacts == {0: 1, 1: 0}


def test_greedy_matching_no_conflicts():
    partners = [[(7, 2)], [(3, 3)], [], []]
    score, contacts = matching_ref.greedy_matching(partners, [0, 1, 2, 3], 5)
    assert score == 2 * 7 + 2 * 3
    assert contacts == {0: 2, 2: 0, 1: 3, 3: 1}


def test_greedy_matching_blocked_by_accepted():
    # lookahead 1: heaviest edge (0,2) accepted first; (2,3) then blocked.
    partners = [[(9, 2)], [], [(5, 3)], []]
    score, contacts = matching_ref.greedy_matching(partners, [0, 1, 2, 3], 1)
    assert score == 18
    assert contacts == {0: 2, 2: 0}


def test_exact_matching_beats_greedy_on_augmenting_path():
    # path graph 0-1-2-3 with weights 5, 6, 5: greedy takes middle (12),
    # exact takes the two outer edges (10+10 = 20 > 12).
    partners = [[(5, 1)], [(6, 2)], [(5, 3)], []]
    exact_score, contacts = matching_ref.exact_matching(partners, [0, 1, 2, 3])
    assert exact_score == 20
    assert contacts[0] == 1 and contacts[2] == 3
    # reference quirk: every line pre-registered as own contact
    assert set(contacts) == {0, 1, 2, 3}

    # lookahead 5 sees the conflict structure and recovers the optimum too
    greedy_score, _ = matching_ref.greedy_matching(partners, [0, 1, 2, 3], 5)
    assert greedy_score == 20
    # lookahead 1 is myopic: takes the heavy middle edge, blocking both ends
    greedy1_score, _ = matching_ref.greedy_matching(partners, [0, 1, 2, 3], 1)
    assert greedy1_score == 12
