"""Gotoh oracle vs. brute-force alignment enumeration, and traceback
self-consistency."""

import itertools

import numpy as np
import pytest

from lara_tpu.solver import oracle

GO = -6 * 8192
GE = -2 * 8192


def brute_force_global(seq_a, seq_b, score_fn, go, ge):
    """Enumerate all global alignments; gap of length k costs go + (k-1)*ge."""
    from functools import lru_cache

    la, lb = len(seq_a), len(seq_b)

    @lru_cache(maxsize=None)
    def rec(i, j, state):
        # state: 0 start/match, 1 in-gap-A (consuming B), 2 in-gap-B
        if i == la and j == lb:
            return 0
        best = None
        if i < la and j < lb:
            cand = score_fn(i, j) + rec(i + 1, j + 1, 0)
            best = cand if best is None else max(best, cand)
        if j < lb:  # gap in A
            cost = ge if state == 1 else go
            cand = cost + rec(i, j + 1, 1)
            best = cand if best is None else max(best, cand)
        if i < la:  # gap in B
            cost = ge if state == 2 else go
            cand = cost + rec(i + 1, j, 2)
            best = cand if best is None else max(best, cand)
        return best

    return rec(0, 0, 0)


@pytest.mark.parametrize("seed", range(8))
def test_gotoh_matches_bruteforce(seed):
    rng = np.random.default_rng(seed)
    la = int(rng.integers(1, 7))
    lb = int(rng.integers(1, 7))
    seq_a = rng.integers(0, 5, la)
    seq_b = rng.integers(0, 5, lb)
    submat = rng.integers(-15000, 15000, (5, 5)).astype(np.int64)

    m, h, v = oracle.gotoh_matrices(seq_a, seq_b, submat, GO, GE)
    got = max(m[la, lb], h[la, lb], v[la, lb])
    want = brute_force_global(seq_a, seq_b, lambda i, j: int(submat[seq_a[i], seq_b[j]]),
                              GO, GE)
    assert got == want


@pytest.mark.parametrize("seed", range(8))
def test_align_pssm_matches_bruteforce_and_is_consistent(seed):
    rng = np.random.default_rng(100 + seed)
    la = int(rng.integers(1, 7))
    lb = int(rng.integers(1, 7))
    pssm = rng.integers(-40000, 40000, (la, lb)).astype(np.int64)

    score, lines, gaps_a, gaps_b = oracle.align_pssm(pssm, GO, GE)
    want = brute_force_global(range(la), range(lb), lambda i, j: int(pssm[i, j]), GO, GE)
    assert score == want

    # traceback consistency: sum of matched pssm cells + gap score == score
    gap_score = oracle.evaluate_lines(gaps_a, gaps_b, GO, GE)
    assert score == sum(int(pssm[a, b]) for (a, b) in lines) + gap_score

    # lines strictly increasing in both coordinates
    for (a1, b1), (a2, b2) in zip(lines, lines[1:]):
        assert a1 < a2 and b1 < b2

    # column flags describe a complete alignment
    assert sum(1 - g for g in gaps_a) == la
    assert sum(1 - g for g in gaps_b) == lb


def test_generate_edges_band():
    # identical sequences: the main diagonal must survive any filter
    seq = np.array([0, 1, 2, 3, 0, 1, 2, 3])
    from lara_tpu.scoring.ribosum import ribosum65n_fixed

    submat = ribosum65n_fixed().astype(np.int64)
    active, opt = oracle.generate_edges(seq, seq, submat, GO, GE, 0)
    assert all(active[i, i] for i in range(8))
    # subopt == 0 keeps only edges on optimal paths
    assert opt == sum(int(submat[c, c]) for c in seq)
    # wider threshold keeps at least as many edges
    active2, _ = oracle.generate_edges(seq, seq, submat, GO, GE, 40 * 8192)
    assert active2.sum() >= active.sum()


def test_evaluate_lines_gap_runs():
    # columns: A: x--xx, B: xxx-x  => A-gap run len2 (go+ge), B-gap run len1 (go)
    gaps_a = [0, 1, 1, 0, 0]
    gaps_b = [0, 0, 0, 1, 0]
    assert oracle.evaluate_lines(gaps_a, gaps_b, GO, GE) == GO + GE + GO
