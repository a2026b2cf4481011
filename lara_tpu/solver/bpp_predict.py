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

Energy model (round 4, "Turner-lite"): all stability comes from
**nearest-neighbour stacks** -- a pair (i, j) whose enclosed neighbour
(i+1, j-1) is also paired gains the Turner-2004 stack free energy for that
pair-type combination (in kT at 37C) -- plus a **terminal AU/GU penalty**
(0.45 kcal/mol per helix end closed by AU/UA/GU/UG) and the minimum
hairpin loop of 3 unpaired bases (ViennaRNA's TURN).  Bare pairs carry no
energy of their own (as in the real nearest-neighbour model).  The
Watson-Crick 4x4 stack table uses the published Turner 2004 values; stacks
involving wobble pairs use a simplified set (single-GU stacks -1.5,
GU-on-GU -0.2..-0.6 kcal/mol) -- documented approximations, not ViennaRNA
parity.  Round-4 motivation: the flat-energy round-3 model (uniform pair +
uniform stack bonuses) actively hurt alignment quality on hold-out
families; with the generator's true structures the structural term gained
+0.11 SPS over sequence-only, so the predictor was the bottleneck
(benchmark/RESULTS.md).  This remains a simplification of ViennaRNA (no
loop/dangle terms); the downstream pipeline consumes the probabilities
identically to dot plots (``io.hpp:318-327``).

Recursion with exact end penalties: with ``t(i,j)`` the terminal penalty
of pair (i, j) and ``S(i,j)`` the stack energy of (i, j) on (i+1, j-1),

    Qb(i,j) = w(i,j) * [ e^{-t(i,j)} * Q(i+1,j-1)
                         + (e^{S} - e^{-t(i,j)-t(i+1,j-1)}) * Qb(i+1,j-1) ]
    Q(i,j)  = Q(i,j-1) + sum_k Q(i,k-1) * Qb(k,j) * e^{-t(k,j)}

Q's helix entries carry the top-end penalty; Qb's content branch carries
the bottom-end penalty; the stacked branch replaces the double-counted
"inner pair via Q, both ends penalised" case with the stack bonus.  The
brute-force enumeration in ``tests/test_bpp_predict.py`` pins these
semantics exactly.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import numpy as np

MIN_HAIRPIN = 3  # unpaired bases enclosed by a hairpin pair (ViennaRNA TURN)
NEG = -1e30  # log-space "zero"
KT37 = 0.6163  # kcal/mol at 37C

#: canonical pair types by (5' base, 3' base) Rna5 rank: AU CG GC UA GU UG
PAIR_TYPES = ((0, 3), (1, 2), (2, 1), (3, 0), (2, 3), (3, 2))
_PTYPE = np.full((5, 5), -1, dtype=np.int32)
for _t, (_a, _b) in enumerate(PAIR_TYPES):
    _PTYPE[_a, _b] = _t

#: Turner 2004 stack dG37 (kcal/mol), [outer pair type, inner pair type]
#: for the stack 5'-X A ... B Y-3' with outer X.Y, inner A.B.  The WC 4x4
#: block is exact (10 published parameters + rotational symmetry
#: stack(p, q) == stack(rot q, rot p)); wobble-involving entries are the
#: simplified set described in the module docstring.
_GU = -1.5
_STACK_DG = np.array([
    #  AU     CG     GC     UA     GU     UG      (inner; rows = outer)
    [-0.93, -2.24, -2.08, -1.10,  _GU,   _GU],   # AU
    [-2.11, -3.26, -2.36, -2.08,  _GU,   _GU],   # CG
    [-2.35, -3.42, -3.26, -2.24,  _GU,   _GU],   # GC
    [-1.33, -2.35, -2.11, -0.93,  _GU,   _GU],   # UA
    [ _GU,   _GU,   _GU,   _GU,  -0.6,  -0.5],   # GU
    [ _GU,   _GU,   _GU,   _GU,  -0.2,  -0.6],   # UG
], dtype=np.float64)
#: stack energies in kT (positive = stabilising), floor at 0.15 kT
_STACK_KT_TAB = np.maximum(-_STACK_DG / KT37, 0.15)
#: terminal helix-end penalty in kT per AU/UA/GU/UG closing pair
_TERM_KT = np.array([0.73, 0.0, 0.0, 0.73, 0.73, 0.73], dtype=np.float64)


def pair_log_weights(encoded: np.ndarray, pad_to: int | None = None) -> np.ndarray:
    """[L', L'] log-weight matrix for an Rna5-encoded sequence: 0 for
    canonical pairs (stability lives in the stack terms), ``NEG`` for
    non-canonical pairs, pairs violating the hairpin minimum, and anything
    touching padding (padding therefore contributes factor 1 to Z)."""
    length = int(encoded.shape[0])
    padded = length if pad_to is None else int(pad_to)
    logw = np.full((padded, padded), NEG, dtype=np.float32)
    logw[:length, :length] = np.where(
        _PTYPE[np.ix_(encoded, encoded)] >= 0, 0.0, NEG)
    ii, jj = np.meshgrid(np.arange(padded), np.arange(padded), indexing="ij")
    logw[jj - ii <= MIN_HAIRPIN] = NEG
    return logw


def energy_terms(encoded: np.ndarray, pad_to: int | None = None):
    """(logw, logc, term) [L', L'] float32 matrices for the recursion.

    ``logc[i, j]`` = log(e^{S(i,j)} - e^{-t(i,j)-t(i+1,j-1)}) -- the
    stacked-branch coefficient (always positive under the 0.15 kT floor);
    ``term[i, j]`` = t(i, j), the terminal penalty of pair (i, j).
    Entries for non-canonical (i, j) are inert (logw is NEG there).
    """
    length = int(encoded.shape[0])
    padded = length if pad_to is None else int(pad_to)
    logw = pair_log_weights(encoded, pad_to=padded)
    pt = np.full((padded, padded), -1, np.int32)
    pt[:length, :length] = _PTYPE[np.ix_(encoded, encoded)]
    ptc = np.clip(pt, 0, len(PAIR_TYPES) - 1)
    term = np.where(pt >= 0, _TERM_KT[ptc], 0.0)
    # inner pair type at (i+1, j-1), shifted into place; borders inert
    pt_in = np.full((padded, padded), 0, np.int32)
    pt_in[:-1, 1:] = np.clip(pt[1:, :-1], 0, len(PAIR_TYPES) - 1)
    t_in = np.zeros((padded, padded))
    t_in[:-1, 1:] = np.where(pt[1:, :-1] >= 0, _TERM_KT[pt_in[:-1, 1:]], 0.0)
    s_kt = _STACK_KT_TAB[ptc, pt_in]
    logc = np.log(np.exp(s_kt) - np.exp(-(term + t_in)))
    return (logw, logc.astype(np.float32), term.astype(np.float32))


@functools.cache
def _logz_grad_fn(length: int):
    """Compiled ``(logw, logc, term) -> (logZ, d logZ / d logw)`` for a
    fixed padded L."""
    import jax
    import jax.numpy as jnp

    def _lse(a, b):
        m = jnp.maximum(a, b)
        m = jnp.maximum(m, NEG)  # keep -inf-ish values finite
        return m + jnp.log(jnp.exp(a - m) + jnp.exp(b - m))

    def _lse_reduce(t, axis):
        m = jnp.maximum(jnp.max(t, axis=axis), NEG)
        return m + jnp.log(jnp.sum(jnp.exp(t - jnp.expand_dims(m, axis)), axis=axis))

    def logz(logw, logc, term):
        n = length
        idx = jnp.arange(n)
        # logQ[i, j] = log partition of bases i..j; entries with j <= i are 0
        # (empty / single unpaired base => exactly one structure of weight 1).
        # Diagonals are filled in span order; unfilled cells are never read.
        log_q = jnp.zeros((n, n), jnp.float32)
        log_qb = jnp.full((n, n), NEG, jnp.float32)

        def step(carry, d):
            log_q, log_qb = carry
            j_idx = jnp.clip(idx + d, 0, n - 1)
            valid_i = idx + d <= n - 1
            # Qb(i, j) = w * [e^{-t(i,j)} * Q(i+1, j-1)
            #                 + (e^S - e^{-t(i,j)-t(in)}) * Qb(i+1, j-1)]
            # (see module docstring); both lookups are span d-2
            inner_i = jnp.clip(idx + 1, 0, n - 1)
            inner_j = jnp.clip(idx + d - 1, 0, n - 1)
            content = log_q[inner_i, inner_j] - term[idx, j_idx]
            content = jnp.where(d >= 2, content, -term[idx, j_idx])
            stacked = jnp.where(
                d >= 2, logc[idx, j_idx] + log_qb[inner_i, inner_j], NEG)
            qb_new = logw[idx, j_idx] + _lse(content, stacked)
            qb_new = jnp.where(valid_i, qb_new, NEG)
            log_qb = log_qb.at[idx, j_idx].set(
                jnp.where(valid_i, qb_new, log_qb[idx, j_idx])
            )
            # Q(i, j) = Q(i, j-1) + sum_k Q(i, k-1) * Qb(k, j) * e^{-t(k,j)}
            # T[i, k] = logQ[i, k-1] + logQb[k, i+d] - t(k, i+d)
            q_km1 = jnp.concatenate(
                [jnp.zeros((n, 1), jnp.float32), log_q[:, :-1]], axis=1
            )
            qb_cols = (log_qb - term)[:, j_idx]  # [k, i]
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

    return jax.jit(jax.value_and_grad(logz, argnums=0))


def _lse2(a, b):
    """Elementwise log(exp(a) + exp(b)) with NEG-safe maxima."""
    m = np.maximum(np.maximum(a, b), NEG)
    return m + np.log(np.exp(a - m) + np.exp(b - m))


def _lse_reduce(t, axis):
    m = np.maximum(t.max(axis=axis), NEG)
    with np.errstate(divide="ignore"):  # all-NEG rows reduce to -inf, fine
        return m + np.log(np.exp(t - np.expand_dims(m, axis)).sum(axis=axis))


def _bpp_matrix_numpy(logw: np.ndarray, logc: np.ndarray,
                      term: np.ndarray) -> np.ndarray:
    """Inside + outside McCaskill in log space (float64, vectorized).

    Same energy model as :func:`_logz_grad_fn` (module docstring).  The
    outside pass is the hand-derived adjoint of the inside recursion; the
    pair probability is ``p(i,j) = exp(adjQb(i,j) + logQb(i,j) - logZ)``.
    """
    n = logw.shape[0]
    logw = logw.astype(np.float64)
    logc = logc.astype(np.float64)
    term = term.astype(np.float64)
    log_q = np.zeros((n, n))        # Q(i,j); cells with j <= i stay log(1)=0
    log_qb = np.full((n, n), NEG)

    idx = np.arange(n)
    for d in range(1, n):
        i = idx[: n - d]
        j = i + d
        if d >= 2:
            content = log_q[i + 1, j - 1] - term[i, j]
            stacked = logc[i, j] + log_qb[i + 1, j - 1]
        else:
            content = -term[i, j]
            stacked = np.full(n - d, NEG)
        log_qb[i, j] = logw[i, j] + _lse2(content, stacked)
        # T[i, k] = Q(i, k-1) + Qb(k, j(i)) - t(k, j(i)), k in [i, j]
        q_km1 = np.concatenate(
            [np.zeros((n - d, 1)), log_q[: n - d, : n - 1]], axis=1)
        t = q_km1 + (log_qb - term)[:, j].T   # [n-d rows, n cols]
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
    adj_qb[:, n - 1] = _lse_reduce(t, axis=0) - term[:, n - 1]
    for j in range(n - 2, -1, -1):
        # (a) from Q(i, j+1)'s unpaired-j+1 term
        acc = adj_q[:, j + 1].copy()
        # (b) from Q(i, j') sums with k-1 == j: adjQ(i,j) += sum_{j'>j}
        #     adjQ(i,j') * Qb(j+1, j') * e^{-t(j+1, j')}
        t = adj_q[:, j + 1:] + (log_qb - term)[j + 1, j + 1:][None, :]
        acc = _lse2(acc, _lse_reduce(t, axis=1))
        # (c) content term of Qb(i-1, j+1), bottom-end penalty included
        c = np.full(n, NEG)
        c[1:] = adj_qb[: n - 1, j + 1] + logw[: n - 1, j + 1] \
            - term[: n - 1, j + 1]
        adj_q[:, j] = _lse2(acc, c)
        if j >= 1:
            # (d) adjQb(k, j) += sum_{i <= k} adjQ(i, j) * Q(i, k-1),
            #     with the top-end penalty e^{-t(k, j)}
            t = adj_q[:, j][:, None] + q_km1_full  # [i, k]
            t = np.where(idx[:, None] <= idx[None, :], t, NEG)
            accb = _lse_reduce(t, axis=0) - term[:, j]
            # (e) stacking chain from Qb(k-1, j+1)
            e = np.full(n, NEG)
            e[1:] = adj_qb[: n - 1, j + 1] + logw[: n - 1, j + 1] \
                + logc[: n - 1, j + 1]
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
    logw, logc, term = energy_terms(encoded)
    probs = _bpp_matrix_numpy(logw, logc, term)[:length, :length].astype(np.float32)
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
