"""The batched on-device subgradient solver.

One ``jax.lax.while_loop`` runs the *entire* Lagrangian loop for a batch of
pairwise problems: PSSM assembly (segment max over dual variables), the
wavefront alignment DP, subgradient extraction, greedy matching, bound
bookkeeping and dual updates.  Converged lanes freeze under masks; the loop
ends when every lane converged or exhausted its iterations -- the TPU-native
replacement for the reference's OpenMP work stealing + SIMD lane masking
(``/root/reference/src/subgradient_solver.hpp:206-331``, ``_simd.hpp``).

Numeric parity notes:
* all profits int32; duals int32 with float32 step arithmetic and
  trunc-toward-zero writeback (``subgradient_solver.hpp:265-271``),
* step size = stepFactor * float(bestUpper - bestLower) / float(#subgradient
  entries); the entry count is 2 x (number of inconsistent directed picks),
* convergence is exact bound equality or iteration exhaustion
  (``subgradient_solver.hpp:286``); epsilon is unused, as in the reference,
* ``dual_at_queue`` snapshots the dual values the PSSM last reflected, which
  is what linear-mode output weights must read (the reference skips
  ``updateScores`` on the terminating iteration).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from lara_tpu.ops import gotoh
from lara_tpu.solver.matching_device import greedy_matching_compact
from lara_tpu.types import INFINITY, PSSM_INIT

I32 = jnp.int32
F32 = jnp.float32
NEG_INF = jnp.int32(-int(INFINITY))


def _use_pallas() -> bool:
    """Mosaic wavefront kernel on TPU (LARA_NO_PALLAS=1 disables)."""
    import os

    if os.environ.get("LARA_NO_PALLAS"):
        return False
    return jax.default_backend() == "tpu"


def _align(pssm, la, lb, go, ge, la_max: int, lb_max: int):
    if _use_pallas():
        from lara_tpu.ops.gotoh_pallas import align_pssm_batch_pallas

        return align_pssm_batch_pallas(pssm, la, lb, go, ge, la_max, lb_max)
    return gotoh.align_pssm_batch(pssm, la, lb, go, ge, la_max, lb_max)


class BatchModel(NamedTuple):
    """Static per-batch problem data (padded).

    Dual arrays are edge-major (sorted by (l, m): one contiguous run per
    alignment edge); ``qrank`` is each entry's position in the static
    matching-queue order (see :mod:`lara_tpu.solver.interactions`).

    Invariant: every row of ``rev`` must be an involution of [0, D) --
    identity on padded/invalid entries -- because the solver applies it via
    a key sort (x[rev] == sort-by-rev for involutions).
    """

    seq_score: jax.Array   # [B, NE] int32 (flat la*lb grid padded to LA*LB)
    active: jax.Array      # [B, NE] bool
    dual_l: jax.Array      # [B, D] int32
    dual_m: jax.Array      # [B, D] int32
    sscore: jax.Array      # [B, D] int32
    rev: jax.Array         # [B, D] int32
    dvalid: jax.Array      # [B, D] bool
    qrank: jax.Array       # [B, D] int32
    la: jax.Array          # [B] int32
    lb: jax.Array          # [B] int32


def _shift_right(x: jax.Array, s: int, fill) -> jax.Array:
    return jnp.concatenate(
        [jnp.full((x.shape[0], s), fill, x.dtype), x[:, :-s]], axis=1)


def _shift_left(x: jax.Array, s: int, fill) -> jax.Array:
    return jnp.concatenate(
        [x[:, s:], jnp.full((x.shape[0], s), fill, x.dtype)], axis=1)


def _run_max_with_argmin(p: jax.Array, m: jax.Array, seg: jax.Array,
                         p_fill, m_fill):
    """One doubling pass over the pair monoid (max p, min m among max-p):
    returns (run max of ``p``, run min of ``m`` restricted to entries where
    ``p`` attains the run max).  Computes the reference's per-edge priority
    queue *top* -- best profit and its smallest partner id
    (``lagrange.hpp:121,305-309``) -- in a single sweep."""
    d = p.shape[1]

    def combine(p1, m1, p2, m2):
        pn = jnp.maximum(p1, p2)
        mn = jnp.minimum(jnp.where(p1 == pn, m1, m_fill),
                         jnp.where(p2 == pn, m2, m_fill))
        return pn, mn

    fp, fm, bp_, bm = p, m, p, m
    s = 1
    while s < d:
        same_r = _shift_right(seg, s, -1) == seg
        fp, fm = combine(
            fp, fm,
            jnp.where(same_r, _shift_right(fp, s, p_fill), p_fill),
            jnp.where(same_r, _shift_right(fm, s, m_fill), m_fill))
        same_l = _shift_left(seg, s, -1) == seg
        bp_, bm = combine(
            bp_, bm,
            jnp.where(same_l, _shift_left(bp_, s, p_fill), p_fill),
            jnp.where(same_l, _shift_left(bm, s, m_fill), m_fill))
        s *= 2
    return combine(fp, fm, bp_, bm)


class SolveConfig(NamedTuple):
    go: int
    ge: int
    num_iterations: int
    max_nondecr: int
    step_factor: float
    lookahead: int         # static: greedy matching lookahead


class BatchResult(NamedTuple):
    best_upper: jax.Array    # [B] int32
    best_lower: jax.Array    # [B] int32
    best_lines: jax.Array    # [B, LCAP, 2] int32
    best_nlines: jax.Array   # [B] int32
    best_matched: jax.Array  # [B, LCAP] bool
    dual_at_queue: jax.Array  # [B, D] int32
    iterations: jax.Array    # [B] int32


class _Carry(NamedTuple):
    dual: jax.Array
    dual_at_queue: jax.Array
    step_factor: jax.Array
    nondecr: jax.Array
    remaining: jax.Array
    lane_active: jax.Array
    best_lower: jax.Array
    best_upper: jax.Array
    best_score: jax.Array
    best_lines: jax.Array
    best_nlines: jax.Array
    best_matched: jax.Array
    iterations: jax.Array


def _init_carry(b: int, d: int, lcap: int, step_factor0, num_iterations: int) -> "_Carry":
    return _Carry(
        dual=jnp.zeros((b, d), I32),
        dual_at_queue=jnp.zeros((b, d), I32),
        step_factor=jnp.full((b,), step_factor0, F32),
        nondecr=jnp.zeros((b,), I32),
        remaining=jnp.full((b,), num_iterations, I32),
        lane_active=jnp.ones((b,), bool),
        best_lower=jnp.full((b,), NEG_INF, I32),
        best_upper=jnp.full((b,), -NEG_INF, I32),
        best_score=jnp.full((b,), NEG_INF, I32),
        best_lines=jnp.full((b, lcap, 2), -1, I32),
        best_nlines=jnp.zeros((b,), I32),
        best_matched=jnp.zeros((b, lcap), bool),
        iterations=jnp.zeros((b,), I32),
    )


def _result_of(final: "_Carry") -> BatchResult:
    return BatchResult(
        best_upper=final.best_upper,
        best_lower=final.best_lower,
        best_lines=final.best_lines,
        best_nlines=final.best_nlines,
        best_matched=final.best_matched,
        dual_at_queue=final.dual_at_queue,
        iterations=final.iterations,
    )


def solve_batch(
    model: BatchModel,
    go,
    ge,
    step_factor0,
    la_max: int,
    lb_max: int,
    num_iterations: int,
    max_nondecr: int,
    lookahead: int,
    chunk: int = 50,
) -> BatchResult:
    """Host-chunked fused solve: the device while_loop runs at most ``chunk``
    iterations per dispatch (long single dispatches trip RPC watchdogs on
    tunnel-attached TPUs); the carry stays on device between dispatches."""
    b, _ = model.seq_score.shape
    d = model.dual_l.shape[1]
    lcap = min(la_max, lb_max)
    carry = _init_carry(b, d, lcap, step_factor0, num_iterations)
    total = 0
    pending_flag = None  # any-lane-active flag of the PREVIOUS chunk
    while total < num_iterations:
        carry = solve_batch_chunk(
            model, carry, go, ge, la_max, lb_max,
            min(chunk, num_iterations - total), max_nondecr, lookahead,
        )
        total += chunk
        # read the flag one chunk late: the next dispatch is already queued
        # when the device->host sync happens, so the tunnel round trip
        # overlaps device compute instead of serialising every chunk
        if pending_flag is not None and not bool(pending_flag):
            break
        pending_flag = jnp.any(carry.lane_active) if total < num_iterations else None
    return _result_of(carry)


@functools.partial(
    jax.jit,
    static_argnames=("la_max", "lb_max", "max_steps", "max_nondecr", "lookahead"),
    donate_argnames=("carry",),
)
def solve_batch_chunk(
    model: BatchModel,
    carry: "_Carry",
    go,
    ge,
    la_max: int,
    lb_max: int,
    max_steps: int,
    max_nondecr: int,
    lookahead: int,
) -> "_Carry":
    """Up to ``max_steps`` fused iterations; resumable."""
    b, ne = model.seq_score.shape
    d = model.dual_l.shape[1]
    lcap = min(la_max, lb_max)
    go = I32(go)
    ge = I32(ge)

    lane = jnp.arange(b, dtype=I32)
    batch_offset = (lane * ne)[:, None]

    def take(arr2d, idx):
        return jnp.take_along_axis(arr2d, idx, axis=1)

    def body(state):
        steps, c = state
        act = c.lane_active
        dual_at_queue = jnp.where(act[:, None], c.dual, c.dual_at_queue)

        # ---- per-edge maxima: masked doubling over edge-major runs (the
        # priority-queue replacement; no grid round trips).  One pass yields
        # both the run max and its smallest partner id (queue top). ----
        profits = model.sscore + c.dual
        masked = jnp.where(model.dvalid, profits, NEG_INF)
        mpp_l, m_top_l = _run_max_with_argmin(
            masked, jnp.where(model.dvalid, model.dual_m, ne), model.dual_l,
            NEG_INF, I32(ne))
        is_top = model.dvalid & (profits == mpp_l)

        # ---- PSSM grid (the only scatter: D entries -> dense DP input) ----
        flat_idx = (model.dual_l + batch_offset).reshape(-1)
        mpp = jnp.full((b * ne,), NEG_INF, I32).at[flat_idx].max(
            masked.reshape(-1)).reshape(b, ne)
        pssm = jnp.where(
            model.active, model.seq_score + jnp.maximum(mpp, 0), I32(PSSM_INIT)
        ).reshape(b, la_max, lb_max)

        # ---- relaxed problem: wavefront DP + traceback ----
        tb = _align(pssm, model.la, model.lb, go, ge, la_max, lb_max)
        upper = tb.upper

        # ---- current solution: line slots (sentinel ne for invalid) ----
        k_idx = jnp.arange(lcap, dtype=I32)[None, :]
        line_valid = k_idx < tb.n_lines[:, None]
        line_edges = jnp.clip(tb.lines[:, :, 0] * lb_max + tb.lines[:, :, 1], 0, ne - 1)
        line_sel = jnp.where(line_valid, line_edges, ne)

        seq_part = jnp.sum(
            jnp.where(line_valid, take(model.seq_score, line_edges), 0), axis=1)

        # ---- membership of each entry's endpoints in the current lines:
        # fused compare-reduce against the <= LCAP line ids (no gather) ----
        l_in = jnp.any(model.dual_l[:, :, None] == line_sel[:, None, :], axis=2)
        m_in = jnp.any(model.dual_m[:, :, None] == line_sel[:, None, :], axis=2)

        # ---- subgradients (lagrange.hpp:343-374) ----
        # cycle(i) = pick(rev(i)) by symmetry (l_in[rev] = m_in, mpp_l[rev] =
        # mpp at dual_m, profits[rev] == its own run max).  rev is an
        # involution, so x[rev] == sort(x by key rev) -- a TPU sort costs
        # half of what an XLA gather does here
        pick = l_in & (mpp_l >= 0) & is_top
        _, pick_rev = jax.lax.sort(
            (model.rev, pick), dimension=1, num_keys=1)
        sg_pos = pick & ~pick_rev
        sg = sg_pos.astype(I32) - (pick_rev & ~pick).astype(I32)
        count = 2 * jnp.sum(sg_pos, axis=1).astype(I32)
        any_sg = count > 0

        # ---- consistent branch (lagrange.hpp:397-409) ----
        # top queue entry per edge: max profit, tie -> smallest partner id,
        # with the self entry at profit 0 / partner id == own edge id.
        tis_l = (mpp_l < 0) | ((mpp_l == 0) & (model.dual_l < m_top_l))
        contrib = l_in & ~tis_l & is_top & (model.dual_m == m_top_l)
        consistent_sum = jnp.sum(jnp.where(contrib, model.sscore, 0), axis=1)

        # per-line matched state (compare-reduce over entries, no scatter):
        # line k is matched iff its own top partner is real (top_not_self) or
        # some contributing entry points at it (matched_m)
        mpp_line = take(mpp, line_edges)
        m_top_line = jnp.min(
            jnp.where(
                is_top[:, None, :] & (model.dual_l[:, None, :] == line_sel[:, :, None]),
                model.dual_m[:, None, :], ne),
            axis=2)
        top_not_self_line = ~((mpp_line < 0) | ((mpp_line == 0) & (line_sel < m_top_line)))
        matched_m_line = jnp.any(
            contrib[:, None, :] & (model.dual_m[:, None, :] == line_sel[:, :, None]),
            axis=2)
        matched_cons_line = line_valid & (top_not_self_line | matched_m_line)

        # ---- matching branch (lagrange.hpp:380-395) ----
        cand = model.dvalid & l_in & m_in & (model.dual_l < model.dual_m) \
            & any_sg[:, None] & act[:, None]
        match_res = greedy_matching_compact(
            2 * model.sscore, model.dual_l, model.dual_m, cand, line_sel,
            model.qrank, lookahead, ne,
        )
        struct_part = jnp.where(any_sg, match_res.score, consistent_sum)

        lower = seq_part + struct_part + tb.gap_score

        # ---- best primal tracking (lagrange.hpp:416-421) ----
        better = act & (lower > c.best_score)
        line_matched = jnp.where(
            any_sg[:, None], match_res.used_slot, matched_cons_line
        ) & line_valid
        best_score = jnp.where(better, lower, c.best_score)
        best_lines = jnp.where(better[:, None, None], tb.lines, c.best_lines)
        best_nlines = jnp.where(better, tb.n_lines, c.best_nlines)
        best_matched = jnp.where(better[:, None], line_matched, c.best_matched)

        # ---- bound bookkeeping (subgradient_solver.hpp:247-263) ----
        improved_u = act & (upper < c.best_upper)
        improved_l = act & (lower > c.best_lower)
        best_upper = jnp.where(improved_u, upper, c.best_upper)
        best_lower = jnp.where(improved_l, lower, c.best_lower)
        nondecr = jnp.where(improved_u | improved_l, 0, c.nondecr)
        halve = act & (nondecr >= max_nondecr)
        step_factor = jnp.where(halve, c.step_factor / F32(2.0), c.step_factor)
        nondecr = jnp.where(act, jnp.where(halve, 0, nondecr + 1), c.nondecr)

        # ---- dual update (subgradient_solver.hpp:265-271) ----
        step = step_factor * (best_upper - best_lower).astype(F32) / \
            jnp.maximum(count, 1).astype(F32)
        upd = act[:, None] & (sg != 0)
        new_dual = (c.dual.astype(F32) - step[:, None] * sg.astype(F32)).astype(I32)
        dual = jnp.where(upd, new_dual, c.dual)

        remaining = jnp.where(act, c.remaining - 1, c.remaining)
        done_now = act & ((best_upper == best_lower) | (remaining == 0))

        return steps + 1, _Carry(
            dual=dual,
            dual_at_queue=dual_at_queue,
            step_factor=step_factor,
            nondecr=nondecr,
            remaining=remaining,
            lane_active=act & ~done_now,
            best_lower=best_lower,
            best_upper=best_upper,
            best_score=best_score,
            best_lines=best_lines,
            best_nlines=best_nlines,
            best_matched=best_matched,
            iterations=c.iterations + act.astype(I32),
        )

    def cond(state):
        steps, c = state
        return (steps < max_steps) & jnp.any(c.lane_active)

    _, final = jax.lax.while_loop(cond, body, (I32(0), carry))
    return final


def solve_batch_traced(
    model: BatchModel,
    go,
    ge,
    step_factor0,
    la_max: int,
    lb_max: int,
    num_iterations: int,
    max_nondecr: int,
    lookahead: int,
) -> BatchResult:
    """Fully-traced one-shot solve (for shard_map: the whole loop must live
    inside one traced program; per-device dispatches are short because each
    shard is small)."""
    b, _ = model.seq_score.shape
    d = model.dual_l.shape[1]
    lcap = min(la_max, lb_max)
    carry = _init_carry(b, d, lcap, step_factor0, num_iterations)
    final = solve_batch_chunk.__wrapped__(
        model, carry, go, ge, la_max, lb_max, num_iterations, max_nondecr,
        lookahead,
    )
    return _result_of(final)
