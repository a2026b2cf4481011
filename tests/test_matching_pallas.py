"""Pallas matching rounds kernel vs. the XLA rounds loop (interpret mode)."""

import numpy as np
import pytest

import jax.numpy as jnp

from lara_tpu.solver.matching_device import _rounds_loop
from lara_tpu.solver.matching_pallas import rounds_loop_pallas

from tests.test_matching_device import (  # noqa: F401
    _build_compact_case,
    _queue_sorted,
    run_case,
)
from lara_tpu.solver import matching_ref

I32 = np.int32


def _compact(w2, l_e, m_e, cand, qrank):
    """Host-side equivalent of the caller's compaction sort."""
    d = w2.shape[-1]
    keys = np.where(cand, qrank, d)
    order = np.argsort(keys, axis=-1, kind="stable")
    take = lambda x: np.take_along_axis(x, order, axis=-1)
    return take(l_e), take(m_e), take(w2), cand.sum(axis=-1).astype(I32)


@pytest.mark.parametrize("lookahead", [1, 2, 5])
@pytest.mark.parametrize("seed", range(4))
def test_kernel_matches_rounds_loop(seed, lookahead):
    rng = np.random.default_rng(seed * 37 + lookahead)
    n_edges = 256
    batch, dcap, lcap = 8, 32, 16
    w2 = np.zeros((batch, dcap), I32)
    l_e = np.zeros((batch, dcap), I32)
    m_e = np.zeros((batch, dcap), I32)
    cand = np.zeros((batch, dcap), bool)
    line_edges = np.full((batch, lcap), n_edges, I32)
    for k in range(batch):
        n_lines = int(rng.integers(2, 10))
        lines, inter = run_case(rng, n_lines, int(rng.integers(0, dcap)),
                                lookahead, n_edges)
        for slot, line in enumerate(lines[:lcap]):
            line_edges[k, slot] = line
        for idx, (l, m, w) in enumerate(_queue_sorted(inter)):
            w2[k, idx] = w
            l_e[k, idx] = l
            m_e[k, idx] = m
            cand[k, idx] = True
    qrank = np.broadcast_to(np.arange(dcap, dtype=I32), (batch, dcap)).copy()
    lq, mq, wq, n_cand = _compact(w2, l_e, m_e, cand, qrank)

    live = np.arange(dcap)[None, :] < n_cand[:, None]
    ref = _rounds_loop(jnp.asarray(lq), jnp.asarray(mq), jnp.asarray(wq),
                       jnp.asarray(live), jnp.asarray(line_edges),
                       jnp.asarray(n_cand), lookahead, dcap)
    score, used = rounds_loop_pallas(
        jnp.asarray(lq), jnp.asarray(mq), jnp.asarray(wq),
        jnp.asarray(live), jnp.asarray(line_edges), lookahead, dcap,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(score), np.asarray(ref.score))
    np.testing.assert_array_equal(np.asarray(used), np.asarray(ref.used_slot))


def test_kernel_large_queue_matches_mirror():
    """One lane with ~700 candidates: kernel == exact Python mirror."""
    rng = np.random.default_rng(11)
    dcap, lookahead, n_edges = 1024, 5, 8192
    (w2, l_e, m_e, cand, line_edges, qrank), (want_score, want_used) = \
        _build_compact_case(rng, 700, dcap, lookahead, n_edges=n_edges)
    lq, mq, wq, n_cand = _compact(w2[None], l_e[None], m_e[None], cand[None],
                                  qrank[None])
    live = np.arange(dcap)[None, :] < n_cand[:, None]
    score, used = rounds_loop_pallas(
        jnp.asarray(lq), jnp.asarray(mq), jnp.asarray(wq),
        jnp.asarray(live), jnp.asarray(line_edges[None]), lookahead, dcap,
        interpret=True)
    assert int(score[0]) == want_score
    np.testing.assert_array_equal(np.asarray(used[0]), want_used)


@pytest.mark.parametrize("seed", range(3))
def test_kernel_sparse_live_mask(seed):
    """Queue-ordered sparse live masks (the fused solver's calling shape):
    kernel == XLA rounds loop on the same uncompacted columns."""
    rng = np.random.default_rng(900 + seed)
    n_edges = 512
    batch, dcap, lcap = 4, 64, 16
    lq = np.zeros((batch, dcap), I32)
    mq = np.zeros((batch, dcap), I32)
    wq = np.zeros((batch, dcap), I32)
    live = np.zeros((batch, dcap), bool)
    line_edges = np.full((batch, lcap), n_edges, I32)
    for k in range(batch):
        n_lines = int(rng.integers(2, 10))
        lines, inter = run_case(rng, n_lines, int(rng.integers(0, dcap // 2)),
                                5, n_edges)
        for slot, line in enumerate(lines[:lcap]):
            line_edges[k, slot] = line
        slots = np.sort(rng.choice(dcap, size=len(inter), replace=False))
        for idx, (l, m, w) in enumerate(_queue_sorted(inter)):
            s = int(slots[idx])
            lq[k, s] = l
            mq[k, s] = m
            wq[k, s] = w
            live[k, s] = True
    n_cand = live.sum(axis=1).astype(I32)
    ref = _rounds_loop(jnp.asarray(lq), jnp.asarray(mq), jnp.asarray(wq),
                       jnp.asarray(live), jnp.asarray(line_edges),
                       jnp.asarray(n_cand), 5, dcap)
    score, used = rounds_loop_pallas(
        jnp.asarray(lq), jnp.asarray(mq), jnp.asarray(wq), jnp.asarray(live),
        jnp.asarray(line_edges), 5, dcap, interpret=True)
    np.testing.assert_array_equal(np.asarray(score), np.asarray(ref.score))
    np.testing.assert_array_equal(np.asarray(used), np.asarray(ref.used_slot))
