"""Greedy lookahead matching on device (JAX), bit-equal to the reference.

Re-implements ``computeGreedyMatching`` + ``solveConflicts``
(``/root/reference/src/matching.hpp:99-192``) as vectorized JAX control flow
so the whole subgradient loop can stay inside one ``lax.while_loop`` on TPU:

* the sorted interaction queue becomes a 3-key ``lax.sort`` (weight desc,
  lineL asc, lineR asc -- the ``std::set<Interaction>`` order),
* the monotone queue scan with lookahead selection becomes a while_loop with
  per-lane pointers (one queue entry per step; total steps bounded by the
  true per-lane candidate count, not the padded size),
* ``solveConflicts`` -- a recursive branch-and-prune search -- is evaluated
  by memoized subset enumeration (:func:`_solve_conflicts_enum`): every
  recursion state is a pure function of the remaining-conflict mask, which
  is always ``full & ~OR(touch[e] for e in eliminated)``, so the <= 2^lh
  distinct states are filled bottom-up (popcount-descending) in one static
  unrolled pass of [B]-vector ops -- no data-dependent control flow at all.
  Fuzzing showed no simple tie-break rule reproduces the recursion on exact
  weight ties (~0.2% of resolutions), so the recursion's exact branch
  structure is replayed per state.

All lanes of the batch run their own state machine under masks; lanes without
work finish immediately.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp

I32 = jnp.int32
# All weights fit int32 (2*structScore <= ~2^27; sums bounded by
# lines * 2^18 in practice, like the reference's int32 ScoreType).
I64 = jnp.int32


def _use_pallas() -> bool:
    """Mosaic rounds-loop kernel on TPU (LARA_NO_PALLAS=1 disables)."""
    import os

    if os.environ.get("LARA_NO_PALLAS"):
        return False
    return jax.default_backend() == "tpu"

def _conflict_tables(lh: int) -> Tuple[np.ndarray, np.ndarray]:
    """Static pair enumeration in reference order: (0,1),(0,2),..,(1,2),..."""
    cx, cy = [], []
    for x in range(lh):
        for y in range(x + 1, lh):
            cx.append(x)
            cy.append(y)
    return np.asarray(cx, np.int32), np.asarray(cy, np.int32)


def _solve_conflicts_enum(sel_l, sel_m, sel_w, sel_cnt, engaged, lh: int):
    """Vectorized ``solveConflicts`` via memoized subset enumeration.

    Inputs: selection slots [B, LH] (line ids l < m, weights w = 2*score) and
    per-lane live counts; ``engaged`` masks lanes that resolve this round.
    Returns ``elim`` [B, LH]-bit mask of eliminated slots.

    The recursion (``matching.hpp:99-141``) branches on the first remaining
    conflict, preferring to eliminate edgeS (the tuple-greater = lighter
    interaction; since the selection is in queue order, the higher slot
    index), exploring the edgeL branch only when the S branch is strictly
    heavier, with the equal-subtree prune.  Every recursive call's conflict
    list is the original list filtered by the eliminated-slot set E, so
    ``solve(mask(E))`` is memoized over the 2^lh subsets E, evaluated
    popcount-descending; each state is straight-line vector math over [B]
    (gathers into the [B, 2^lh] memo), replacing the former per-lane stack
    machine whose nested while_loop dominated the solver iteration.
    """
    b = sel_l.shape[0]
    n_conf = lh * (lh - 1) // 2
    if n_conf == 0:  # lookahead 1: a single selected edge never conflicts
        return jnp.zeros((b,), I32)
    cx_np, cy_np = _conflict_tables(lh)
    cx = jnp.asarray(cx_np)
    cy = jnp.asarray(cy_np)

    live = jnp.arange(lh, dtype=I32)[None, :] < sel_cnt[:, None]  # [B, LH]

    # conflict c active iff both slots live and they share a line endpoint
    def share(a_idx, b_idx):
        la_ = jnp.take_along_axis(sel_l, a_idx[None, :].repeat(b, 0), axis=1)
        ma_ = jnp.take_along_axis(sel_m, a_idx[None, :].repeat(b, 0), axis=1)
        lb_ = jnp.take_along_axis(sel_l, b_idx[None, :].repeat(b, 0), axis=1)
        mb_ = jnp.take_along_axis(sel_m, b_idx[None, :].repeat(b, 0), axis=1)
        return (la_ == lb_) | (la_ == mb_) | (ma_ == lb_) | (ma_ == mb_)

    both_live = jnp.take_along_axis(live, cx[None, :].repeat(b, 0), axis=1) & \
        jnp.take_along_axis(live, cy[None, :].repeat(b, 0), axis=1)
    conf_active = both_live & share(cx, cy)  # [B, C]

    conf_bits = jnp.left_shift(jnp.ones((), I32), jnp.arange(n_conf, dtype=I32))[None, :]
    full_mask = jnp.sum(jnp.where(conf_active, conf_bits, 0), axis=1).astype(I32)

    # touch[e] = bitmask of active conflicts involving slot e
    slot_ids = jnp.arange(lh, dtype=I32)[None, :, None]  # [1, LH, C]
    involves = (cx[None, None, :] == slot_ids) | (cy[None, None, :] == slot_ids)
    touch = jnp.sum(
        jnp.where(involves & conf_active[:, None, :], conf_bits[:, None, :], 0), axis=2
    ).astype(I32)  # [B, LH]

    n_sub = 1 << lh

    # remaining-conflict mask per elimination subset E:
    # mask(E) = full & ~OR(touch[e] for e in E), built by lowest-bit recursion
    mask_cols = [full_mask]
    for e_set in range(1, n_sub):
        low = (e_set & -e_set).bit_length() - 1
        mask_cols.append(mask_cols[e_set & (e_set - 1)] & ~touch[:, low])
    mask_e = jnp.stack(mask_cols, axis=1)  # [B, 2^lh]

    def lowest_bit_index(mask):
        # index of least-significant set bit (mask != 0); n_conf < 2^24 so
        # the float32 log2 is exact
        return jnp.int32(jnp.round(jnp.log2(jnp.float32(mask & -mask) + (mask == 0))))

    # first conflict per state and its S/L slots (S = higher slot: selection
    # is in queue order, so the higher slot is the tuple-greater = lighter)
    c0 = lowest_bit_index(mask_e)  # [B, 2^lh]
    c0c = jnp.clip(c0, 0, n_conf - 1)
    s_slot = cy[c0c]  # cy > cx by construction
    l_slot = cx[c0c]
    w_s = jnp.take_along_axis(sel_w, s_slot, axis=1).astype(I64)
    w_l = jnp.take_along_axis(sel_w, l_slot, axis=1).astype(I64)
    empty = mask_e == 0
    single = ~empty & ((mask_e & (mask_e - 1)) == 0)
    s_bit = jnp.left_shift(jnp.ones((), I32), s_slot)
    l_bit = jnp.left_shift(jnp.ones((), I32), l_slot)
    sub_s_idx = jnp.arange(n_sub, dtype=I32)[None, :] | s_bit
    sub_l_idx = jnp.arange(n_sub, dtype=I32)[None, :] | l_bit
    mask_after_s = jnp.take_along_axis(mask_e, sub_s_idx, axis=1)
    mask_after_l = jnp.take_along_axis(mask_e, sub_l_idx, axis=1)

    # memo over subsets, filled popcount-descending (supersets first); all
    # subsets of one popcount level are independent, so each level is one
    # vectorized slab: 4 gathers into the memo + fused elementwise math
    res_w = jnp.zeros((b, n_sub), I64)
    res_elim = jnp.zeros((b, n_sub), I32)
    by_level: dict = {}
    for e_set in range(n_sub - 1):  # full set: mask empty, memo already 0
        by_level.setdefault(bin(e_set).count("1"), []).append(e_set)
    for level in sorted(by_level, reverse=True):
        cols = np.asarray(by_level[level], np.int32)  # static
        sub_s = jnp.take_along_axis(res_w, sub_s_idx[:, cols], axis=1)
        sub_s_elim = jnp.take_along_axis(res_elim, sub_s_idx[:, cols], axis=1)
        sub_l = jnp.take_along_axis(res_w, sub_l_idx[:, cols], axis=1)
        sub_l_elim = jnp.take_along_axis(res_elim, sub_l_idx[:, cols], axis=1)
        weight_s = w_s[:, cols] + sub_s
        weight_l = w_l[:, cols] + sub_l
        # explore the L branch only when the S branch is strictly heavier and
        # the two filtered conflict lists differ (matching.hpp:121-133)
        explore = (weight_s > w_l[:, cols]) & \
            (mask_after_s[:, cols] != mask_after_l[:, cols])
        l_wins = explore & (weight_s > weight_l)
        val_w = jnp.where(
            empty[:, cols], I64(0),
            jnp.where(single[:, cols], w_s[:, cols],
                      jnp.where(l_wins, weight_l, weight_s)))
        val_elim = jnp.where(
            empty[:, cols], 0,
            jnp.where(single[:, cols], s_bit[:, cols],
                      jnp.where(l_wins, sub_l_elim | l_bit[:, cols],
                                sub_s_elim | s_bit[:, cols])))
        res_w = res_w.at[:, cols].set(val_w)
        res_elim = res_elim.at[:, cols].set(val_elim)

    return jnp.where(engaged, res_elim[:, 0], 0)  # [B] slot bitmask


class RoundsResult(NamedTuple):
    score: jax.Array      # [B] int32: sum of accepted 2*score weights
    used_slot: jax.Array  # [B, LCAP] bool: line slot is matched


@functools.partial(jax.jit, static_argnames=("lookahead", "ne"))
def greedy_matching_rounds(w2, l_edge, m_edge, cand, line_edges, qrank,
                           lookahead: int, ne: int) -> RoundsResult:
    """Round-vectorized greedy lookahead matching over edge-major arrays.

    The queue weight is the static structure score (``matching.hpp:149-151``;
    duals never enter), so the queue order is fixed per pair and arrives as
    the static rank array ``qrank`` (position of each entry in the sorted
    ``std::set`` order: weight desc, lineL asc, lineR asc) -- the per-call
    sort disappears and no array needs reordering at runtime.  The
    reference's entry-at-a-time scan collapses into *rounds*: contacts only
    ever grow, so between two conflict resolutions the "skip if endpoint
    already matched" predicate is constant -- the next ``lookahead``
    unblocked entries are the ``lh`` smallest live ranks, found with ``lh``
    masked min-reductions.  Entries passed over by the scan pointer stay
    dead (the reference's forward-only iterator).  The round body is
    gather/scatter-free on the wide arrays: selections are extracted with
    one-hot masked sums, endpoint blocking is updated by comparing the
    endpoint columns against the <= 2*lh newly matched edge ids, and the
    matched-endpoint set lives as one dense [B, NE] bitmap scattered with
    <= 2*lh indices per round.

    ``w2/l_edge/m_edge/cand/qrank`` are [B, D] edge-major; ``line_edges`` is
    [B, LCAP] (flat edge id per alignment line slot) used to read the
    matched state back per line slot; ``ne`` (static) is the edge-id space
    size (la_max * lb_max).
    """
    b, d = w2.shape
    lh = max(1, min(int(lookahead), 8))
    lane = jnp.arange(b, dtype=I32)

    n_cand = jnp.sum(cand, axis=1).astype(I32)
    lh_lane = jnp.minimum(I32(lh), n_cand)  # matching.hpp:153-156
    k_idx = jnp.arange(lh, dtype=I32)[None, :]

    class _St(NamedTuple):
        ptr: jax.Array      # [B] rank scan pointer (d = lane done)
        blocked: jax.Array  # [B, D] entry dead (not cand / endpoint matched)
        score: jax.Array    # [B] i32

    state = _St(
        ptr=jnp.zeros((b,), I32),
        blocked=~cand,
        score=jnp.zeros((b,), I32),
    )

    def cond(s):
        st, _used = s
        return jnp.any(st.ptr < d)

    def body(s):
        st, used = s
        engaged = st.ptr < d
        ok = ~st.blocked & (qrank >= st.ptr[:, None])

        # the next lh unblocked entries = the lh smallest live ranks;
        # extract each with a min-reduction + one-hot masked sums (ranks are
        # unique, so the one-hot selects exactly one entry)
        sel_l_ks, sel_m_ks, sel_w_ks, rank_ks = [], [], [], []
        last = jnp.full((b, 1), -1, I32)
        for _ in range(lh):
            r_k = jnp.min(jnp.where(ok & (qrank > last), qrank, d), axis=1,
                          keepdims=True)
            onehot = ok & (qrank == r_k)
            sel_l_ks.append(jnp.sum(jnp.where(onehot, l_edge, 0), axis=1))
            sel_m_ks.append(jnp.sum(jnp.where(onehot, m_edge, 0), axis=1))
            sel_w_ks.append(jnp.sum(jnp.where(onehot, w2, 0), axis=1))
            rank_ks.append(r_k[:, 0])
            last = r_k
        sel_l = jnp.stack(sel_l_ks, axis=1)  # [B, LH]
        sel_m = jnp.stack(sel_m_ks, axis=1)
        sel_w = jnp.stack(sel_w_ks, axis=1)
        sel_rank = jnp.stack(rank_ks, axis=1)
        valid_k = (sel_rank < d) & (k_idx < lh_lane[:, None])
        sel_cnt = jnp.sum(valid_k, axis=1).astype(I32)
        any_sel = sel_cnt > 0
        sel_l = jnp.where(valid_k, sel_l, 0)
        sel_m = jnp.where(valid_k, sel_m, 0)
        sel_w = jnp.where(valid_k, sel_w, 0)

        elim_mask = _solve_conflicts_enum(
            sel_l, sel_m, sel_w, sel_cnt, engaged & any_sel, lh)
        kept = (engaged & any_sel)[:, None] & valid_k & \
            (((elim_mask[:, None] >> k_idx) & 1) == 0)

        score = st.score + jnp.sum(jnp.where(kept, sel_w, 0), axis=1)

        # newly matched endpoints: block every entry sharing one (fused
        # comparisons, no gather/scatter on the wide arrays)
        blocked = st.blocked
        for k in range(lh):
            lk = sel_l[:, k : k + 1]
            mk = sel_m[:, k : k + 1]
            hit = (l_edge == lk) | (l_edge == mk) | (m_edge == lk) | (m_edge == mk)
            blocked = blocked | (kept[:, k : k + 1] & hit)

        # matched-endpoint bitmap: <= 2*lh writes per lane (sentinel col ne)
        used = used.at[lane[:, None], jnp.where(kept, sel_l, ne)].max(kept)
        used = used.at[lane[:, None], jnp.where(kept, sel_m, ne)].max(kept)

        # the scan stopped at the lh-th unblocked entry; a round that found
        # fewer exhausted the queue (the reference's scan pointer hit the
        # end), so the lane terminates after this resolution
        sel_end = jnp.max(jnp.where(valid_k, sel_rank, -1), axis=1)
        full_sel = any_sel & (sel_cnt >= lh_lane)
        new_ptr = jnp.where(full_sel, sel_end + 1, d)
        ptr = jnp.where(engaged, new_ptr, st.ptr)
        return _St(ptr=ptr, blocked=blocked, score=score), used

    used0 = jnp.zeros((b, ne + 1), bool)
    (final, used) = jax.lax.while_loop(cond, body, (state, used0))
    used_slot = jnp.take_along_axis(
        used, jnp.clip(line_edges, 0, ne), axis=1)
    return RoundsResult(score=final.score, used_slot=used_slot)


#: compact-queue width for the in-solver matching: the round loop's wide ops
#: are HBM-bandwidth-bound, so compacting the <= n_cand live candidates from
#: [B, D] to [B, COMPACT_WIDTH] queue-ordered columns cuts each round's
#: traffic by D/COMPACT_WIDTH; a lane with more candidates is rare
#: (candidates need BOTH endpoints among the current alignment lines) and
#: falls back to full width via lax.cond
COMPACT_WIDTH = 512


@functools.partial(jax.jit, static_argnames=("lookahead", "ne"))
def greedy_matching_compact(w2, l_edge, m_edge, cand, line_edges, qrank,
                            lookahead: int, ne: int) -> RoundsResult:
    """Greedy lookahead matching with sort-based candidate compaction.

    Same results as :func:`greedy_matching_rounds` (fuzz-tested equal), but
    restructured for the TPU memory system: one 4-operand ``lax.sort`` by
    ``where(cand, qrank, D)`` moves the live candidates to the first columns
    *in queue order* (sort is cheap in-loop on TPU; scatters/gathers are
    not), then the round loop runs on a ``[B, COMPACT_WIDTH]`` slice.
    Compact position = candidate rank, so selection order, conflict
    resolution and the scan-pointer death rule are reproduced exactly.
    """
    b, d = w2.shape
    cw = min(COMPACT_WIDTH, d)
    n_cand = jnp.sum(cand, axis=1).astype(I32)

    keys = jnp.where(cand, qrank, I32(d))
    _, lq, mq, wq = jax.lax.sort(
        (keys, l_edge, m_edge, w2), dimension=1, num_keys=1)

    def rounds(width: int):
        live = jnp.arange(width, dtype=I32)[None, :] < \
            jnp.minimum(n_cand, width)[:, None]
        if _use_pallas():
            from lara_tpu.solver.matching_pallas import rounds_loop_pallas

            score, used = rounds_loop_pallas(
                lq[:, :width], mq[:, :width], wq[:, :width], live,
                line_edges, lookahead, width)
            return RoundsResult(score=score, used_slot=used)
        return _rounds_loop(
            lq[:, :width], mq[:, :width], wq[:, :width], live, line_edges,
            n_cand, lookahead, width)

    if cw >= d:
        return rounds(d)
    # rare lanes with more live candidates than the compact width fall back
    # to the full-width loop (both branches traced; only one executes)
    return jax.lax.cond(
        jnp.any(n_cand > cw), lambda: rounds(d), lambda: rounds(cw))


def _rounds_loop(lq, mq, wq, live, line_edges, n_cand, lookahead: int,
                 width: int) -> RoundsResult:
    """Round loop over queue-ordered compacted columns (position == rank).

    Columns are in queue order, so the "next ``lh`` unblocked entries" are
    the first ``lh`` live columns at index >= the scan pointer -- extracted
    with one cumsum + one-hot masked sums instead of chained min-reductions.
    Matched state is tracked per line slot with value compares; the round
    body touches no gather/scatter at all.
    """
    b, _ = lq.shape
    lh = max(1, min(int(lookahead), 8))
    lh_lane = jnp.minimum(I32(lh), n_cand)  # matching.hpp:153-156
    k_idx = jnp.arange(lh, dtype=I32)[None, :]
    idx = jnp.arange(width, dtype=I32)[None, :]

    class _St(NamedTuple):
        ptr: jax.Array      # [B] scan pointer in compact rank space
        blocked: jax.Array  # [B, W] column dead (not live / endpoint matched)
        score: jax.Array    # [B] i32

    state = _St(
        ptr=jnp.zeros((b,), I32),
        blocked=~live,
        score=jnp.zeros((b,), I32),
    )

    def cond(s):
        st, _used = s
        return jnp.any(st.ptr < width)

    def body(s):
        st, used = s
        engaged = st.ptr < width
        ok = ~st.blocked & (idx >= st.ptr[:, None])
        srank = jnp.cumsum(ok.astype(I32), axis=1)
        navail = srank[:, -1]

        sel_l_ks, sel_m_ks, sel_w_ks, rank_ks = [], [], [], []
        for k in range(lh):
            onehot = ok & (srank == k + 1)
            sel_l_ks.append(jnp.sum(jnp.where(onehot, lq, 0), axis=1))
            sel_m_ks.append(jnp.sum(jnp.where(onehot, mq, 0), axis=1))
            sel_w_ks.append(jnp.sum(jnp.where(onehot, wq, 0), axis=1))
            rank_ks.append(jnp.where(
                navail > k, jnp.sum(jnp.where(onehot, idx, 0), axis=1),
                width))
        sel_l = jnp.stack(sel_l_ks, axis=1)  # [B, LH]
        sel_m = jnp.stack(sel_m_ks, axis=1)
        sel_w = jnp.stack(sel_w_ks, axis=1)
        sel_rank = jnp.stack(rank_ks, axis=1)
        valid_k = (sel_rank < width) & (k_idx < lh_lane[:, None])
        sel_cnt = jnp.sum(valid_k, axis=1).astype(I32)
        any_sel = sel_cnt > 0
        sel_l = jnp.where(valid_k, sel_l, 0)
        sel_m = jnp.where(valid_k, sel_m, 0)
        sel_w = jnp.where(valid_k, sel_w, 0)

        elim_mask = _solve_conflicts_enum(
            sel_l, sel_m, sel_w, sel_cnt, engaged & any_sel, lh)
        kept = (engaged & any_sel)[:, None] & valid_k & \
            (((elim_mask[:, None] >> k_idx) & 1) == 0)

        score = st.score + jnp.sum(jnp.where(kept, sel_w, 0), axis=1)

        # newly matched endpoints: block sharing columns and mark the line
        # slots they touch -- value compares only, no scatter
        blocked = st.blocked
        for k in range(lh):
            lk = sel_l[:, k : k + 1]
            mk = sel_m[:, k : k + 1]
            hit = (lq == lk) | (lq == mk) | (mq == lk) | (mq == mk)
            blocked = blocked | (kept[:, k : k + 1] & hit)
            used = used | (kept[:, k : k + 1]
                           & ((line_edges == lk) | (line_edges == mk)))

        sel_end = jnp.max(jnp.where(valid_k, sel_rank, -1), axis=1)
        full_sel = any_sel & (sel_cnt >= lh_lane)
        new_ptr = jnp.where(full_sel, sel_end + 1, width)
        ptr = jnp.where(engaged, new_ptr, st.ptr)
        return _St(ptr=ptr, blocked=blocked, score=score), used

    used0 = jnp.zeros(line_edges.shape, bool)
    (final, used_slot) = jax.lax.while_loop(cond, body, (state, used0))
    return RoundsResult(score=final.score, used_slot=used_slot)


class MatchingResult(NamedTuple):
    score: jax.Array        # [B] int64: sum of accepted 2*score weights
    used_vertex: jax.Array  # [B, NE] bool: matched line endpoints


@functools.partial(jax.jit, static_argnames=("lookahead", "n_edges"))
def greedy_matching_batch(w2, l_edge, m_edge, cand, lookahead: int, n_edges: int) -> MatchingResult:
    """Batched greedy lookahead matching.

    ``w2/l_edge/m_edge`` are [B, D] interaction candidates (weight=2*score,
    line ids with l < m), ``cand`` the validity mask.  ``n_edges`` sizes the
    dense vertex space for the contacts set.
    """
    b, d = w2.shape
    lh = max(1, min(int(lookahead), 8))

    big = jnp.iinfo(jnp.int32).max
    key_w = jnp.where(cand, -w2.astype(I32), big)
    key_l = jnp.where(cand, l_edge.astype(I32), big)
    key_m = jnp.where(cand, m_edge.astype(I32), big)
    sw, sl, sm = jax.lax.sort((key_w, key_l, key_m), dimension=1, num_keys=3)
    n_cand = jnp.sum(cand, axis=1).astype(I32)
    lh_lane = jnp.minimum(I32(lh), n_cand)

    lane = jnp.arange(b, dtype=I32)

    class _Lp(NamedTuple):
        ptr: jax.Array
        sel_cnt: jax.Array
        sel_l: jax.Array   # [B, LH]
        sel_m: jax.Array
        sel_w: jax.Array
        used: jax.Array    # [B, NE] bool
        score: jax.Array   # [B] i64

    state = _Lp(
        ptr=jnp.zeros((b,), I32),
        sel_cnt=jnp.zeros((b,), I32),
        sel_l=jnp.zeros((b, lh), I32),
        sel_m=jnp.zeros((b, lh), I32),
        sel_w=jnp.zeros((b, lh), I32),
        used=jnp.zeros((b, n_edges), bool),
        score=jnp.zeros((b,), I64),
    )

    def lane_done(s: _Lp):
        return (s.ptr >= n_cand) & (s.sel_cnt == 0)

    def cond(s: _Lp):
        return jnp.any(~lane_done(s))

    def body(s: _Lp) -> _Lp:
        done = lane_done(s)
        resolving = ~done & ((s.sel_cnt >= lh_lane) | ((s.ptr >= n_cand) & (s.sel_cnt > 0)))
        scanning = ~done & ~resolving

        # --- scan one queue entry ---
        p = jnp.clip(s.ptr, 0, d - 1)
        e_l = sl[lane, p]
        e_m = sm[lane, p]
        e_w = (-sw[lane, p]).astype(I32)
        el_c = jnp.clip(e_l, 0, n_edges - 1)
        em_c = jnp.clip(e_m, 0, n_edges - 1)
        blocked = s.used[lane, el_c] | s.used[lane, em_c]
        take = scanning & (s.ptr < n_cand) & ~blocked
        slot = jnp.clip(s.sel_cnt, 0, lh - 1)
        sel_l = s.sel_l.at[lane, slot].set(jnp.where(take, e_l, s.sel_l[lane, slot]))
        sel_m = s.sel_m.at[lane, slot].set(jnp.where(take, e_m, s.sel_m[lane, slot]))
        sel_w = s.sel_w.at[lane, slot].set(jnp.where(take, e_w, s.sel_w[lane, slot]))
        sel_cnt = s.sel_cnt + take.astype(I32)
        ptr = jnp.where(scanning, s.ptr + 1, s.ptr)

        # --- resolve conflicts for flagged lanes ---
        elim_mask = _solve_conflicts_enum(sel_l, sel_m, sel_w, sel_cnt, resolving, lh)

        k_idx = jnp.arange(lh, dtype=I32)[None, :]
        kept = resolving[:, None] & (k_idx < sel_cnt[:, None]) & \
            (((elim_mask[:, None] >> k_idx) & 1) == 0)
        # accept kept edges: mark endpoints used, add weights
        add = jnp.sum(jnp.where(kept, sel_w, 0).astype(I64), axis=1)
        score = s.score + add
        used = s.used
        l_cl = jnp.clip(sel_l, 0, n_edges - 1)
        m_cl = jnp.clip(sel_m, 0, n_edges - 1)
        used = used.at[lane[:, None], l_cl].max(kept)
        used = used.at[lane[:, None], m_cl].max(kept)
        sel_cnt = jnp.where(resolving, 0, sel_cnt)

        return _Lp(ptr=ptr, sel_cnt=sel_cnt, sel_l=sel_l, sel_m=sel_m,
                   sel_w=sel_w, used=used, score=score)

    final = jax.lax.while_loop(cond, body, state)
    return MatchingResult(score=final.score, used_vertex=final.used)


@functools.partial(jax.jit, static_argnames=("lookahead",))
def greedy_matching_queue(lq, mq, wq, live, line_edges,
                          lookahead: int) -> RoundsResult:
    """Greedy lookahead matching over statically queue-ordered columns.

    The caller pre-sorts the dual table by the static queue rank once per
    batch (the queue key never involves duals, ``matching.hpp:149-151``), so
    the per-iteration candidate set arrives as a ``live`` mask over the
    queue-ordered columns -- no per-iteration sort or compaction at all.
    """
    b, d = lq.shape
    n_cand = jnp.sum(live, axis=1).astype(I32)
    if _use_pallas():
        from lara_tpu.solver.matching_pallas import rounds_loop_pallas

        score, used = rounds_loop_pallas(
            lq, mq, wq, live, line_edges, lookahead, d)
        return RoundsResult(score=score, used_slot=used)
    return _rounds_loop(lq, mq, wq, live, line_edges, n_cand, lookahead, d)
