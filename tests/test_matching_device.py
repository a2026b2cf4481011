"""Device greedy matching vs. the exact Python mirror (fuzz, incl. ties)."""

import numpy as np
import pytest

from lara_tpu.solver import matching_ref
from lara_tpu.solver.matching_device import greedy_matching_batch


def run_case(rng, n_lines, n_inter, lookahead, n_edges=64, tie_prone=True):
    """Build a random interaction set over `n_lines` line ids; compare."""
    lines = sorted(rng.choice(n_edges, size=n_lines, replace=False).tolist())
    inter = set()
    for _ in range(n_inter):
        a, b = rng.choice(n_lines, size=2, replace=False)
        l, m = min(lines[a], lines[b]), max(lines[a], lines[b])
        w = int(rng.integers(0, 6)) * 2 if tie_prone else int(rng.integers(0, 10000))
        inter.add((l, m, w))
    inter = sorted(inter)
    return lines, inter


@pytest.mark.parametrize("lookahead", [1, 2, 5])
@pytest.mark.parametrize("seed", range(6))
def test_device_matching_matches_mirror(seed, lookahead):
    rng = np.random.default_rng(seed * 10 + lookahead)
    n_edges = 64
    batch = 8
    dcap = 24

    w2 = np.zeros((batch, dcap), np.int32)
    l_e = np.zeros((batch, dcap), np.int32)
    m_e = np.zeros((batch, dcap), np.int32)
    cand = np.zeros((batch, dcap), bool)
    expected = []

    for k in range(batch):
        n_lines = int(rng.integers(2, 9))
        n_inter = int(rng.integers(0, dcap))
        lines, inter = run_case(rng, n_lines, n_inter, lookahead, n_edges)
        # mirror expects per-line partner lists with (score, partner), l < m
        partners = [[] for _ in lines]
        for (l, m, w) in inter:
            partners[lines.index(l)].append((w // 2, m))
        score, contacts = matching_ref.greedy_matching(partners, lines, lookahead)
        expected.append((score, contacts))
        for idx, (l, m, w) in enumerate(inter):
            w2[k, idx] = w
            l_e[k, idx] = l
            m_e[k, idx] = m
            cand[k, idx] = True

    out = greedy_matching_batch(w2, l_e, m_e, cand, lookahead, n_edges)
    for k in range(batch):
        score, contacts = expected[k]
        assert int(out.score[k]) == score, f"lane {k}"
        used = np.asarray(out.used_vertex[k])
        want_used = np.zeros(n_edges, bool)
        for v in contacts:
            want_used[v] = True
        np.testing.assert_array_equal(used, want_used, err_msg=f"lane {k}")


def test_device_matching_empty():
    out = greedy_matching_batch(
        np.zeros((3, 4), np.int32), np.zeros((3, 4), np.int32),
        np.zeros((3, 4), np.int32), np.zeros((3, 4), bool), 5, 16,
    )
    assert np.all(np.asarray(out.score) == 0)
    assert not np.asarray(out.used_vertex).any()


def test_device_matching_known_chain():
    # the hand-checked chain from test_matching.py
    w2 = np.array([[10, 10, 4]], np.int32)
    l_e = np.array([[0, 1, 0]], np.int32)
    m_e = np.array([[1, 2, 2]], np.int32)
    cand = np.ones((1, 3), bool)
    out = greedy_matching_batch(w2, l_e, m_e, cand, 5, 8)
    assert int(out.score[0]) == 10
    used = np.asarray(out.used_vertex[0])
    assert used[0] and used[1] and not used[2]


# ---------------------------------------------------------------------------
# rounds variant (presorted queue, per-line-slot state)
# ---------------------------------------------------------------------------

from lara_tpu.solver.matching_device import greedy_matching_rounds  # noqa: E402


def _queue_sorted(inter):
    return sorted(inter, key=lambda t: (-2 * t[2], t[0], t[1]))


@pytest.mark.parametrize("lookahead", [1, 2, 5])
@pytest.mark.parametrize("seed", range(8))
def test_rounds_matching_matches_mirror(seed, lookahead):
    rng = np.random.default_rng(seed * 100 + lookahead)
    n_edges = 64
    batch = 8
    dcap = 24
    lcap = 12

    w2 = np.zeros((batch, dcap), np.int32)
    l_e = np.zeros((batch, dcap), np.int32)
    m_e = np.zeros((batch, dcap), np.int32)
    cand = np.zeros((batch, dcap), bool)
    line_edges = np.full((batch, lcap), n_edges, np.int32)  # sentinel = ne
    expected = []

    for k in range(batch):
        n_lines = int(rng.integers(2, 9))
        n_inter = int(rng.integers(0, dcap))
        lines, inter = run_case(rng, n_lines, n_inter, lookahead, n_edges)
        partners = [[] for _ in lines]
        for (l, m, w) in inter:
            partners[lines.index(l)].append((w // 2, m))
        score, contacts = matching_ref.greedy_matching(partners, lines, lookahead)
        expected.append((score, contacts, lines))
        for slot, line in enumerate(lines):
            line_edges[k, slot] = line
        for idx, (l, m, w) in enumerate(_queue_sorted(inter)):
            w2[k, idx] = w
            l_e[k, idx] = l
            m_e[k, idx] = m
            cand[k, idx] = True

    qrank = np.broadcast_to(np.arange(dcap, dtype=np.int32), (batch, dcap)).copy()
    out = greedy_matching_rounds(
        w2, l_e, m_e, cand, line_edges, qrank, lookahead, n_edges)
    for k in range(batch):
        score, contacts, lines = expected[k]
        assert int(out.score[k]) == score, f"lane {k}"
        used = np.asarray(out.used_slot[k])
        want = np.zeros(lcap, bool)
        for v in contacts:
            want[lines.index(v)] = True
        np.testing.assert_array_equal(used, want, err_msg=f"lane {k}")


def test_rounds_matching_interleaved_invalid():
    # non-candidate entries interleaved in the array must be skipped
    inter = [(0, 1, 10), (1, 2, 8), (2, 3, 6)]
    entries = _queue_sorted(inter)
    w2 = np.array([[entries[0][2], 99, entries[1][2], entries[2][2], 0]], np.int32)
    l_e = np.array([[entries[0][0], 7, entries[1][0], entries[2][0], 0]], np.int32)
    m_e = np.array([[entries[0][1], 8, entries[1][1], entries[2][1], 0]], np.int32)
    cand = np.array([[True, False, True, True, False]])
    line_edges = np.arange(4, dtype=np.int32)[None, :]
    qrank = np.arange(5, dtype=np.int32)[None, :]
    out = greedy_matching_rounds(w2, l_e, m_e, cand, line_edges, qrank, 5, 16)
    # greedy takes (0,1)=10 then (2,3)=6
    assert int(out.score[0]) == 16
    np.testing.assert_array_equal(
        np.asarray(out.used_slot[0]), [True, True, True, True])


# ---------------------------------------------------------------------------
# compact variant (the production in-solver path): boundary fuzz incl. the
# >COMPACT_WIDTH fallback (VERDICT r1 "silent 512-candidate truncation")
# ---------------------------------------------------------------------------

from lara_tpu.solver.matching_device import (  # noqa: E402
    COMPACT_WIDTH,
    greedy_matching_compact,
)


def _build_compact_case(rng, n_cand_target, dcap, lookahead, n_lines=72,
                        n_edges=8192, lcap=80):
    """One lane with ~n_cand_target live candidates among n_lines lines."""
    lines = sorted(rng.choice(n_edges - 1, size=n_lines, replace=False).tolist())
    inter = set()
    attempts = 0
    while len(inter) < n_cand_target and attempts < 20 * n_cand_target:
        a, b = rng.choice(n_lines, size=2, replace=False)
        l, m = min(lines[a], lines[b]), max(lines[a], lines[b])
        inter.add((l, m, int(rng.integers(0, 6)) * 2))
        attempts += 1
    assert len(inter) == n_cand_target, "could not build enough interactions"
    inter = sorted(inter)

    partners = [[] for _ in lines]
    for (l, m, w) in inter:
        partners[lines.index(l)].append((w // 2, m))
    score, contacts = matching_ref.greedy_matching(partners, lines, lookahead)

    w2 = np.zeros(dcap, np.int32)
    l_e = np.zeros(dcap, np.int32)
    m_e = np.zeros(dcap, np.int32)
    cand = np.zeros(dcap, bool)
    qrank = np.arange(dcap, dtype=np.int32)
    # interleave the candidates among dead entries, preserving queue order
    slots = np.sort(rng.choice(dcap, size=len(inter), replace=False))
    order = _queue_sorted(inter)
    # qrank must rank entries in global queue order; dead entries keep their
    # positional rank (as device_driver builds it for padded entries)
    ranked = sorted(range(dcap), key=lambda s: s)
    for idx, (l, m, w) in enumerate(order):
        s = int(slots[idx])
        w2[s] = w
        l_e[s] = l
        m_e[s] = m
        cand[s] = True
    # rebuild qrank so candidate ranks follow queue order and all ranks unique
    qrank = np.full(dcap, -1, np.int32)
    qrank[slots] = np.arange(len(inter), dtype=np.int32)
    dead = qrank < 0
    qrank[dead] = np.arange(len(inter), dcap, dtype=np.int32)

    line_edges = np.full(lcap, n_edges, np.int32)
    line_edges[: len(lines)] = lines
    want_used = np.zeros(lcap, bool)
    for v in contacts:
        want_used[lines.index(v)] = True
    return (w2, l_e, m_e, cand, line_edges, qrank), (score, want_used)


@pytest.mark.parametrize("n_cand", [0, 37, COMPACT_WIDTH - 1, COMPACT_WIDTH,
                                    COMPACT_WIDTH + 1, 2000])
def test_compact_matching_boundary_counts(n_cand):
    """Bit-equality with the mirror across the COMPACT_WIDTH boundary."""
    rng = np.random.default_rng(n_cand + 3)
    dcap = 2304
    lookahead = 5
    n_edges = 8192
    (w2, l_e, m_e, cand, line_edges, qrank), (score, want_used) = \
        _build_compact_case(rng, n_cand, dcap, lookahead, n_edges=n_edges)
    out = greedy_matching_compact(
        w2[None], l_e[None], m_e[None], cand[None], line_edges[None],
        qrank[None], lookahead, n_edges)
    assert int(out.score[0]) == score
    np.testing.assert_array_equal(np.asarray(out.used_slot[0]), want_used)


@pytest.mark.parametrize("seed", range(4))
def test_compact_matching_mixed_batch(seed):
    """A batch mixing lanes below and above COMPACT_WIDTH (the lax.cond
    fallback must still reproduce every lane exactly)."""
    rng = np.random.default_rng(1000 + seed)
    dcap = 1536
    lookahead = 5
    n_edges = 8192
    counts = [20, COMPACT_WIDTH + 50, 300, 700]
    ins, outs = [], []
    for n_cand in counts:
        case, want = _build_compact_case(
            rng, n_cand, dcap, lookahead, n_edges=n_edges)
        ins.append(case)
        outs.append(want)
    stacked = [np.stack(x) for x in zip(*ins)]
    out = greedy_matching_compact(*stacked, lookahead, n_edges)
    for k, (score, want_used) in enumerate(outs):
        assert int(out.score[k]) == score, f"lane {k}"
        np.testing.assert_array_equal(
            np.asarray(out.used_slot[k]), want_used, err_msg=f"lane {k}")
