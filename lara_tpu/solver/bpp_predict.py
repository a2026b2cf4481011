"""Built-in base-pair probability prediction (McCaskill partition function).

The reference delegates structure prediction to ViennaRNA's ``pf_fold``
(``/root/reference/src/io.hpp:286-338``) and hard-exits when ViennaRNA is not
compiled in (``io.hpp:332-336``).  lara-tpu ships its own TPU-native
predictor instead, enabled with ``--predict builtin``: a McCaskill-style
partition function over canonical base pairs.

Design
------
* Production path: a vectorized NumPy inside+outside recursion in log space
  (:func:`_bpp_matrix_numpy`), one anti-diagonal / column of masked
  log-sum-exp reductions per step.  Structure prediction is *host-side
  input preprocessing* (exactly ViennaRNA's role in the reference --
  a CPU C library call per record, ``io.hpp:299-330``); it feeds the host
  model build, never the device hot loop, and a compile-free O(L^3) NumPy
  sweep (~ms per record) beats paying an XLA compile for it.
* Oracle path (kept for tests): ``logZ`` as a ``lax.scan`` with
  ``p(i,j) = d logZ / d logw[i,j]`` via ``jax.grad`` -- the outside
  recursion derived by autodiff instead of by hand.  The NumPy path is
  asserted against it (``tests/test_bpp_predict.py``).
* All arithmetic is log-space, so no rescaling tricks are needed.

Energy model: pair weights (GC=3kT, AU=2kT, GU=1kT, minimum hairpin loop of
3 unpaired bases -- ViennaRNA's TURN) plus a **helix stacking bonus**: a pair
(i, j) whose enclosed neighbour (i+1, j-1) is also paired gains ``STACK_KT``
(Turner-model stacks are worth ~3-5 kT at 37C).  Without stacking the
ensemble is far too flat -- a 76 nt tRNA gets ~60k pairs above the 0.003
dot-plot gate where RNAfold yields a few hundred -- which floods the solver's
dual tables; with it, stems dominate and lone pairs are suppressed, matching
the shape of real Turner-model dot plots.  This remains a simplification of
ViennaRNA; the downstream pipeline consumes the probabilities identically to
dot plots (``io.hpp:318-327``).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import numpy as np

MIN_HAIRPIN = 3  # unpaired bases enclosed by a hairpin pair (ViennaRNA TURN)
NEG = -1e30  # log-space "zero"
STACK_KT = 3.0  # stacking bonus (kT) for a pair enclosing another pair

#: log-Boltzmann pair weights in kT units, indexed by Rna5 codes (A C G U N).
_PAIR_LOGW = np.full((5, 5), NEG, dtype=np.float32)
for _a, _b, _w in ((0, 3, 2.0), (1, 2, 3.0), (2, 3, 1.0)):  # AU, CG, GU
    _PAIR_LOGW[_a, _b] = _w
    _PAIR_LOGW[_b, _a] = _w


def pair_log_weights(encoded: np.ndarray, pad_to: int | None = None) -> np.ndarray:
    """[L', L'] log-weight matrix for an Rna5-encoded sequence; entries are
    ``NEG`` for non-canonical pairs, pairs violating the hairpin minimum, and
    anything touching padding (padding therefore contributes factor 1 to Z)."""
    length = int(encoded.shape[0])
    padded = length if pad_to is None else int(pad_to)
    logw = np.full((padded, padded), NEG, dtype=np.float32)
    logw[:length, :length] = _PAIR_LOGW[np.ix_(encoded, encoded)]
    ii, jj = np.meshgrid(np.arange(padded), np.arange(padded), indexing="ij")
    logw[jj - ii <= MIN_HAIRPIN] = NEG
    return logw


@functools.cache
def _logz_grad_fn(length: int):
    """Compiled ``logw -> (logZ, d logZ / d logw)`` for a fixed padded L."""
    import jax
    import jax.numpy as jnp

    def _lse(a, b):
        m = jnp.maximum(a, b)
        m = jnp.maximum(m, NEG)  # keep -inf-ish values finite
        return m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m))

    def _lse_reduce(t, axis):
        m = jnp.maximum(jnp.max(t, axis=axis), NEG)
        return m + jnp.log(jnp.sum(jnp.exp(t - jnp.expand_dims(m, axis)), axis=axis))

    def logz(logw):
        n = length
        idx = jnp.arange(n)
        # logQ[i, j] = log partition of bases i..j; entries with j <= i are 0
        # (empty / single unpaired base => exactly one structure of weight 1).
        # Diagonals are filled in span order; unfilled cells are never read.
        log_q = jnp.zeros((n, n), jnp.float32)
        log_qb = jnp.full((n, n), NEG, jnp.float32)

        log_stack = jnp.float32(np.log(np.expm1(STACK_KT)))

        def step(carry, d):
            log_q, log_qb = carry
            j_idx = jnp.clip(idx + d, 0, n - 1)
            valid_i = idx + d <= n - 1
            # Qb(i, i+d) = w(i, i+d) * [Q(i+1, i+d-1)
            #                           + (e^STACK - 1) * Qb(i+1, i+d-1)]
            # -- structures whose enclosed neighbour is paired get the
            # stacking bonus; both lookups are span d-2, already filled
            inner_i = jnp.clip(idx + 1, 0, n - 1)
            inner_j = jnp.clip(idx + d - 1, 0, n - 1)
            content = log_q[inner_i, inner_j]
            content = jnp.where(d >= 2, content, 0.0)
            stacked = jnp.where(d >= 2, log_stack + log_qb[inner_i, inner_j],
                                NEG)
            qb_new = logw[idx, j_idx] + _lse(content, stacked)
            qb_new = jnp.where(valid_i, qb_new, NEG)
            log_qb = log_qb.at[idx, j_idx].set(
                jnp.where(valid_i, qb_new, log_qb[idx, j_idx])
            )
            # Q(i, j) = Q(i, j-1) + sum_k Q(i, k-1) * Qb(k, j), k in [i, j]
            # T[i, k] = logQ[i, k-1] + logQb[k, i+d]
            q_km1 = jnp.concatenate(
                [jnp.zeros((n, 1), jnp.float32), log_q[:, :-1]], axis=1
            )
            qb_cols = log_qb[:, j_idx]  # [k, i] = logQb[k, i+d]
            t = q_km1 + qb_cols.T
            k_ge_i = idx[None, :] >= idx[:, None]
            t = jnp.where(k_ge_i, t, NEG)
            paired = _lse_reduce(t, axis=1)
            q_new = _lse(log_q[idx, jnp.clip(idx + d - 1, 0, n - 1)], paired)
            log_q = log_q.at[idx, j_idx].set(
                jnp.where(valid_i, q_new, log_q[idx, j_idx])
            )
            return (log_q, log_qb), None

        (log_q, _), _ = jax.lax.scan(
            step, (log_q, log_qb), jnp.arange(1, n, dtype=jnp.int32)
        )
        return log_q[0, n - 1]

    return jax.jit(jax.value_and_grad(logz))


def _lse2(a, b):
    """Elementwise log(exp(a) + exp(b)) with NEG-safe maxima."""
    m = np.maximum(np.maximum(a, b), NEG)
    return m + np.log(np.exp(a - m) + np.exp(b - m))


def _lse_reduce(t, axis):
    m = np.maximum(t.max(axis=axis), NEG)
    with np.errstate(divide="ignore"):  # all-NEG rows reduce to -inf, fine
        return m + np.log(np.exp(t - np.expand_dims(m, axis)).sum(axis=axis))


def _bpp_matrix_numpy(logw: np.ndarray) -> np.ndarray:
    """Inside + outside McCaskill in log space (float64, vectorized).

    Same energy model as :func:`_logz_grad_fn`:
    ``Qb(i,j) = w(i,j) * [Q(i+1,j-1) + (e^STACK - 1) * Qb(i+1,j-1)]``,
    ``Q(i,j) = Q(i,j-1) + sum_k Q(i,k-1) * Qb(k,j)``.  The outside pass is
    the hand-derived adjoint of the inside recursion; the pair probability
    is ``p(i,j) = exp(adjQb(i,j) + logQb(i,j) - logZ)``.
    """
    n = logw.shape[0]
    logw = logw.astype(np.float64)
    logc = float(np.log(np.expm1(STACK_KT)))
    log_q = np.zeros((n, n))        # Q(i,j); cells with j <= i stay log(1)=0
    log_qb = np.full((n, n), NEG)

    idx = np.arange(n)
    for d in range(1, n):
        i = idx[: n - d]
        j = i + d
        if d >= 2:
            content = log_q[i + 1, j - 1]
            stacked = logc + log_qb[i + 1, j - 1]
        else:
            content = np.zeros(n - d)
            stacked = np.full(n - d, NEG)
        log_qb[i, j] = logw[i, j] + _lse2(content, stacked)
        # T[i, k] = Q(i, k-1) + Qb(k, j(i)), k in [i, j]
        q_km1 = np.concatenate(
            [np.zeros((n - d, 1)), log_q[: n - d, : n - 1]], axis=1)
        t = q_km1 + log_qb[:, j].T          # [n-d rows, n cols]
        k = idx[None, :]
        mask = (k >= i[:, None]) & (k <= j[:, None])
        t = np.where(mask, t, NEG)
        paired = _lse_reduce(t, axis=1)
        log_q[i, j] = _lse2(log_q[i, j - 1], paired)

    log_z = log_q[0, n - 1]

    # outside: reverse column sweep; adjQ(0, n-1) = log(1)
    adj_q = np.full((n, n), NEG)
    adj_qb = np.full((n, n), NEG)
    adj_q[0, n - 1] = 0.0
    # Q(i, k-1) with the empty case k == i -> log(1)
    q_km1_full = np.concatenate([np.zeros((n, 1)), log_q[:, : n - 1]], axis=1)
    # column n-1 first (pairs ending at the last base): only (d) applies
    t = adj_q[:, n - 1][:, None] + q_km1_full
    t = np.where(idx[:, None] <= idx[None, :], t, NEG)
    adj_qb[:, n - 1] = _lse_reduce(t, axis=0)
    for j in range(n - 2, -1, -1):
        # (a) from Q(i, j+1)'s unpaired-j+1 term
        acc = adj_q[:, j + 1].copy()
        # (b) from Q(i, j') sums with k-1 == j: adjQ(i,j) += sum_{j'>j}
        #     adjQ(i,j') * Qb(j+1, j')
        t = adj_q[:, j + 1:] + log_qb[j + 1, j + 1:][None, :]
        acc = _lse2(acc, _lse_reduce(t, axis=1))
        # (c) content term of Qb(i-1, j+1)
        c = np.full(n, NEG)
        c[1:] = adj_qb[: n - 1, j + 1] + logw[: n - 1, j + 1]
        adj_q[:, j] = _lse2(acc, c)
        if j >= 1:
            # (d) adjQb(k, j) += sum_{i <= k} adjQ(i, j) * Q(i, k-1)
            t = adj_q[:, j][:, None] + q_km1_full  # [i, k]
            t = np.where(idx[:, None] <= idx[None, :], t, NEG)
            accb = _lse_reduce(t, axis=0)
            # (e) stacking chain from Qb(k-1, j+1)
            e = np.full(n, NEG)
            e[1:] = adj_qb[: n - 1, j + 1] + logw[: n - 1, j + 1] + logc
            adj_qb[:, j] = _lse2(accb, e)

    probs = np.exp(np.clip(adj_qb + log_qb - log_z, -745.0, 0.0))
    probs[log_qb <= NEG / 2] = 0.0
    return probs


def basepair_probability_matrix(sequence: str) -> np.ndarray:
    """[L, L] symmetric base-pair probability matrix for one sequence."""
    from lara_tpu.scoring.ribosum import encode_rna5

    encoded = encode_rna5(sequence)
    length = int(encoded.shape[0])
    if length < MIN_HAIRPIN + 2:
        return np.zeros((length, length), np.float32)
    logw = pair_log_weights(encoded)
    probs = _bpp_matrix_numpy(logw)[:length, :length].astype(np.float32)
    probs = np.clip(probs + probs.T, 0.0, 1.0)  # upper-triangular input
    return probs


def basepair_probabilities(sequence: str) -> Dict[Tuple[int, int], float]:
    """Probabilities as a {(i, j): p} dict (i < j), analogous to ViennaRNA's
    ``bppm`` consumed at ``io.hpp:311-330``."""
    probs = basepair_probability_matrix(sequence)
    out: Dict[Tuple[int, int], float] = {}
    upper = np.triu_indices_from(probs, k=1)
    for i, j in zip(*upper):
        p = float(probs[i, j])
        if p > 0.0:
            out[(int(i), int(j))] = p
    return out
