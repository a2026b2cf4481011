"""Built-in base-pair probability prediction (McCaskill partition function).

The reference delegates structure prediction to ViennaRNA's ``pf_fold``
(``/root/reference/src/io.hpp:286-338``) and hard-exits when ViennaRNA is not
compiled in (``io.hpp:332-336``).  lara-tpu ships its own TPU-native
predictor instead, enabled with ``--predict builtin``: a McCaskill-style
partition function over canonical base pairs.

TPU-first design
----------------
* The inside recursion is a single ``lax.scan`` over span length ``d``; each
  step updates one anti-diagonal of the DP matrices with pure vector ops
  (one masked log-sum-exp of an [L, L] tile), so the O(L^3) work maps onto
  the VPU with no data-dependent control flow.
* Base-pair probabilities are NOT computed by hand-coding McCaskill's
  outside recursion.  Because ``logZ`` is a differentiable function of the
  per-pair log-Boltzmann weights, the expected pair indicator is exactly
  ``p(i,j) = d logZ / d logw[i,j]`` -- one ``jax.grad`` through the scan
  replaces the entire outside pass and is transparently fused by XLA.
* All arithmetic is log-space float32: magnitudes stay ~O(L * max|logw|),
  so no rescaling tricks are needed.

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


def basepair_probability_matrix(sequence: str) -> np.ndarray:
    """[L, L] symmetric base-pair probability matrix for one sequence."""
    from lara_tpu.scoring.ribosum import encode_rna5

    encoded = encode_rna5(sequence)
    length = int(encoded.shape[0])
    if length < MIN_HAIRPIN + 2:
        return np.zeros((length, length), np.float32)
    # bucket compile cache on padded length (padding is Z-neutral)
    padded = -(-length // 32) * 32
    logw = pair_log_weights(encoded, pad_to=padded)
    _, grad = _logz_grad_fn(padded)(logw)
    probs = np.asarray(grad, dtype=np.float32)[:length, :length]
    probs = np.clip(probs + probs.T, 0.0, 1.0)  # grad is upper-triangular
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
