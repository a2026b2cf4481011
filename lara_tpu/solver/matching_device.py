"""Greedy lookahead matching on device (JAX), bit-equal to the reference.

Re-implements ``computeGreedyMatching`` + ``solveConflicts``
(``/root/reference/src/matching.hpp:99-192``) as vectorized JAX control flow
so the whole subgradient loop can stay inside one ``lax.while_loop`` on TPU:

* the sorted interaction queue becomes a 3-key ``lax.sort`` (weight desc,
  lineL asc, lineR asc -- the ``std::set<Interaction>`` order),
* the monotone queue scan with lookahead selection becomes a while_loop with
  per-lane pointers (one queue entry per step; total steps bounded by the
  true per-lane candidate count, not the padded size),
* ``solveConflicts`` -- a recursive branch-and-prune search -- runs as an
  explicit stack machine over conflict bitmasks.  Fuzzing showed no simple
  tie-break rule reproduces the recursion on exact weight ties (~0.2% of
  resolutions), so the recursion itself is executed: depth <= #conflicts+1,
  conflict sets are <=28-bit masks for lookahead <= 8.

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

# stack-machine modes
_CALL, _RET = 0, 1


def _conflict_tables(lh: int) -> Tuple[np.ndarray, np.ndarray]:
    """Static pair enumeration in reference order: (0,1),(0,2),..,(1,2),..."""
    cx, cy = [], []
    for x in range(lh):
        for y in range(x + 1, lh):
            cx.append(x)
            cy.append(y)
    return np.asarray(cx, np.int32), np.asarray(cy, np.int32)


def _solve_conflicts_machine(sel_l, sel_m, sel_w, sel_cnt, engaged, lh: int):
    """Vectorized ``solveConflicts`` stack machine.

    Inputs: selection slots [B, LH] (line ids l < m, weights w = 2*score) and
    per-lane live counts; ``engaged`` masks lanes that resolve this round.
    Returns ``elim`` [B, LH]-bit mask of eliminated slots.

    The recursion (``matching.hpp:99-141``) branches on the first remaining
    conflict, preferring to eliminate edgeS (the tuple-greater = lighter
    interaction; since the selection is in queue order, the higher slot
    index), exploring the edgeL branch only when the S branch is strictly
    heavier, with the equal-subtree prune.
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

    depth = n_conf + 2
    zeros_i = jnp.zeros((b, depth), I32)
    zeros_l = jnp.zeros((b, depth), I64)

    class _St(NamedTuple):
        active: jax.Array      # lanes still running the machine
        mode: jax.Array        # [B] CALL / RET
        arg_mask: jax.Array    # [B] CALL argument
        res_elim: jax.Array    # [B] return register: eliminate slot-mask
        res_w: jax.Array       # [B] return register: eliminated weight
        sp: jax.Array          # [B] stack pointer
        f_mask: jax.Array      # [B, depth]
        f_phase: jax.Array
        f_es: jax.Array
        f_el: jax.Array
        f_ws_edge: jax.Array   # [B, depth] i64
        f_wl_edge: jax.Array
        f_elim_s: jax.Array
        f_ws_tot: jax.Array
        f_rem_s: jax.Array

    st = _St(
        active=engaged,
        mode=jnp.zeros((b,), I32),
        arg_mask=full_mask,
        res_elim=jnp.zeros((b,), I32),
        res_w=jnp.zeros((b,), I64),
        sp=jnp.zeros((b,), I32),
        f_mask=zeros_i, f_phase=zeros_i, f_es=zeros_i, f_el=zeros_i,
        f_ws_edge=zeros_l, f_wl_edge=zeros_l, f_elim_s=zeros_i,
        f_ws_tot=zeros_l, f_rem_s=zeros_i,
    )

    lane = jnp.arange(b, dtype=I32)

    def lowest_bit_index(mask):
        # index of least-significant set bit (mask != 0)
        return jnp.int32(jnp.round(jnp.log2(jnp.float32(mask & -mask) + (mask == 0))))

    def popcount(mask):
        c = jnp.zeros_like(mask)
        m = mask
        for _ in range(n_conf):
            c = c + (m & 1)
            m = m >> 1
        return c

    def getw(slot):
        return jnp.take_along_axis(sel_w.astype(I64), slot[:, None], axis=1)[:, 0]

    def gett(slot):
        return jnp.take_along_axis(touch, slot[:, None], axis=1)[:, 0]

    def body(st: _St) -> _St:
        is_call = st.active & (st.mode == _CALL)
        is_ret = st.active & (st.mode == _RET)

        # ---- CALL ----
        mask = st.arg_mask
        empty = mask == 0
        c0 = lowest_bit_index(mask)
        x = cx[jnp.clip(c0, 0, n_conf - 1)]
        y = cy[jnp.clip(c0, 0, n_conf - 1)]
        e_s = jnp.maximum(x, y)  # higher slot = tuple-greater = lighter
        e_l = jnp.minimum(x, y)
        w_s = getw(e_s)
        w_l = getw(e_l)
        single = popcount(mask) == 1
        rem_s = mask & ~gett(e_s)

        # leaf returns
        leaf = empty | single
        leaf_elim = jnp.where(empty, 0, jnp.left_shift(jnp.ones((), I32), e_s))
        leaf_w = jnp.where(empty, I64(0), w_s)

        # push frame and recurse on rem_s
        do_push = is_call & ~leaf
        sp_idx = jnp.clip(st.sp, 0, depth - 1)

        def stk_set(arr, val):
            cur = arr[lane, sp_idx]
            return arr.at[lane, sp_idx].set(jnp.where(do_push, val, cur))

        f_mask = stk_set(st.f_mask, mask)
        f_phase = stk_set(st.f_phase, jnp.ones((b,), I32))
        f_es = stk_set(st.f_es, e_s)
        f_el = stk_set(st.f_el, e_l)
        f_ws_edge = stk_set(st.f_ws_edge, w_s)
        f_wl_edge = stk_set(st.f_wl_edge, w_l)
        f_rem_s = stk_set(st.f_rem_s, rem_s)

        call_sp = jnp.where(do_push, st.sp + 1, st.sp)
        call_mode = jnp.where(do_push, _CALL, _RET)
        call_arg = jnp.where(do_push, rem_s, st.arg_mask)
        call_res_elim = jnp.where(leaf, leaf_elim, st.res_elim)
        call_res_w = jnp.where(leaf, leaf_w, st.res_w)

        # ---- RET ----
        at_bottom = st.sp == 0
        fp = jnp.clip(st.sp - 1, 0, depth - 1)
        fr_mask = f_mask[lane, fp]
        fr_phase = f_phase[lane, fp]
        fr_es = f_es[lane, fp]
        fr_el = f_el[lane, fp]
        fr_ws_edge = f_ws_edge[lane, fp]
        fr_wl_edge = f_wl_edge[lane, fp]
        fr_elim_s = st.f_elim_s[lane, fp]
        fr_ws_tot = st.f_ws_tot[lane, fp]
        fr_rem_s = f_rem_s[lane, fp]

        # phase 1: child was the S branch
        ws_tot = fr_ws_edge + st.res_w
        rem_l = fr_mask & ~gett(fr_el)
        explore_l = (ws_tot > fr_wl_edge) & (fr_rem_s != rem_l)
        # finalize S now if not exploring L
        fin_s_elim = st.res_elim | jnp.left_shift(jnp.ones((), I32), fr_es)
        # phase 2: child was the L branch
        wl_tot = fr_wl_edge + st.res_w
        l_wins = fr_ws_tot > wl_tot
        fin2_elim = jnp.where(
            l_wins, st.res_elim | jnp.left_shift(jnp.ones((), I32), fr_el),
            fr_elim_s | jnp.left_shift(jnp.ones((), I32), fr_es),
        )
        fin2_w = jnp.where(l_wins, wl_tot, fr_ws_tot)

        in_p1 = is_ret & ~at_bottom & (fr_phase == 1)
        in_p2 = is_ret & ~at_bottom & (fr_phase == 2)

        # phase-1 lanes that explore L: update frame, call with rem_l
        upd = in_p1 & explore_l
        f_phase = f_phase.at[lane, fp].set(jnp.where(upd, 2, f_phase[lane, fp]))
        f_elim_s = st.f_elim_s.at[lane, fp].set(
            jnp.where(upd, st.res_elim, fr_elim_s))
        f_ws_tot = st.f_ws_tot.at[lane, fp].set(jnp.where(upd, ws_tot, fr_ws_tot))

        pop_p1 = in_p1 & ~explore_l
        pop_p2 = in_p2
        pops = pop_p1 | pop_p2

        ret_sp = jnp.where(pops, st.sp - 1, st.sp)
        ret_mode = jnp.where(upd, _CALL, _RET)
        ret_arg = jnp.where(upd, rem_l, st.arg_mask)
        ret_res_elim = jnp.where(pop_p1, fin_s_elim,
                                 jnp.where(pop_p2, fin2_elim, st.res_elim))
        ret_res_w = jnp.where(pop_p1, ws_tot, jnp.where(pop_p2, fin2_w, st.res_w))

        done_now = is_ret & at_bottom

        # merge CALL / RET lane updates
        new = _St(
            active=st.active & ~done_now,
            mode=jnp.where(is_call, call_mode, jnp.where(is_ret, ret_mode, st.mode)),
            arg_mask=jnp.where(is_call, call_arg, jnp.where(is_ret, ret_arg, st.arg_mask)),
            res_elim=jnp.where(is_call, call_res_elim,
                               jnp.where(is_ret, ret_res_elim, st.res_elim)),
            res_w=jnp.where(is_call, call_res_w,
                            jnp.where(is_ret, ret_res_w, st.res_w)),
            sp=jnp.where(is_call, call_sp, jnp.where(is_ret, ret_sp, st.sp)),
            f_mask=f_mask, f_phase=f_phase, f_es=f_es, f_el=f_el,
            f_ws_edge=f_ws_edge, f_wl_edge=f_wl_edge, f_elim_s=f_elim_s,
            f_ws_tot=f_ws_tot, f_rem_s=f_rem_s,
        )
        return new

    def cond(st: _St):
        return jnp.any(st.active)

    final = jax.lax.while_loop(cond, body, st)
    return final.res_elim  # [B] slot bitmask


class RoundsResult(NamedTuple):
    score: jax.Array      # [B] int32: sum of accepted 2*score weights
    used_slot: jax.Array  # [B, LCAP] bool: line slot is matched
    overflow: jax.Array   # [B] bool: candidate count exceeded the cap


@functools.partial(jax.jit, static_argnames=("lookahead", "lcap", "cap"))
def greedy_matching_rounds(w2, l_edge, m_edge, cand, slot_of,
                           lookahead: int, lcap: int, cap: int = 2048
                           ) -> RoundsResult:
    """Round-vectorized greedy lookahead matching over PRESORTED candidates.

    The queue weight is the static structure score (``matching.hpp:149-151``;
    duals never enter), so the model arrays arrive presorted in queue order
    (:func:`lara_tpu.solver.interactions.build_pair_model`) and the per-call
    sort disappears.  The reference's entry-at-a-time scan collapses into
    *rounds*: contacts only ever grow, so between two conflict resolutions
    the "skip if endpoint already matched" predicate is constant -- the next
    ``lookahead`` unblocked entries are found with one cumsum per round
    instead of one loop step per queue entry.  Entries passed over by the
    scan pointer stay dead (exactly the reference's forward-only iterator).

    ``w2/l_edge/m_edge/cand`` are [B, D] in queue order; ``slot_of`` is
    [B, NE+1] mapping edge ids to line slots (``lcap`` = invalid) so the
    matched-state array is per *line slot* (<= lcap), not per edge.
    """
    b, d = w2.shape
    lh = max(1, min(int(lookahead), 8))
    cap = min(cap, d)
    lane = jnp.arange(b, dtype=I32)
    ne1 = slot_of.shape[1]

    # --- compact candidates in queue order ---
    rank = jnp.cumsum(cand, axis=1, dtype=I32) - 1
    n_cand_full = jnp.sum(cand, axis=1).astype(I32)
    overflow = n_cand_full > cap
    n_cand = jnp.minimum(n_cand_full, cap)
    write = cand & (rank < cap)
    idx = jnp.where(write, rank, cap)

    def compact(vals, fill):
        out = jnp.full((b, cap + 1), fill, I32)
        out = out.at[lane[:, None], idx].set(jnp.where(write, vals.astype(I32), fill))
        return out[:, :cap]

    wc = compact(w2, 0)
    lc = compact(l_edge, 0)
    mc = compact(m_edge, 0)
    slc = jnp.take_along_axis(slot_of, jnp.clip(lc, 0, ne1 - 1), axis=1)
    smc = jnp.take_along_axis(slot_of, jnp.clip(mc, 0, ne1 - 1), axis=1)

    lh_lane = jnp.minimum(I32(lh), n_cand)  # matching.hpp:153-156
    pos = jnp.arange(cap, dtype=I32)[None, :]
    k_idx = jnp.arange(lh, dtype=I32)[None, :]

    class _St(NamedTuple):
        ptr: jax.Array    # [B]
        used: jax.Array   # [B, LCAP+1] bool (sentinel col lcap)
        score: jax.Array  # [B] i32

    state = _St(
        ptr=jnp.zeros((b,), I32),
        used=jnp.zeros((b, lcap + 1), bool),
        score=jnp.zeros((b,), I32),
    )

    def cond(s: _St):
        return jnp.any(s.ptr < n_cand)

    def body(s: _St) -> _St:
        engaged = s.ptr < n_cand
        blocked = jnp.take_along_axis(s.used, slc, axis=1) | \
            jnp.take_along_axis(s.used, smc, axis=1)
        ok = (pos >= s.ptr[:, None]) & (pos < n_cand[:, None]) & ~blocked
        r = jnp.cumsum(ok, axis=1, dtype=I32) - 1
        sel = ok & (r < lh_lane[:, None])
        sel_cnt = jnp.sum(sel, axis=1).astype(I32)
        any_sel = sel_cnt > 0

        # scatter the selection into lookahead slots (r < lh for selected)
        sslot = jnp.where(sel, r, lh)

        def gather_sel(vals):
            out = jnp.zeros((b, lh + 1), I32)
            out = out.at[lane[:, None], sslot].set(jnp.where(sel, vals, 0))
            return out[:, :lh]

        sel_l = gather_sel(lc)
        sel_m = gather_sel(mc)
        sel_w = gather_sel(wc)
        sel_sl = gather_sel(slc)
        sel_sm = gather_sel(smc)

        elim_mask = _solve_conflicts_machine(
            sel_l, sel_m, sel_w, sel_cnt, engaged & any_sel, lh)
        kept = (engaged & any_sel)[:, None] & (k_idx < sel_cnt[:, None]) & \
            (((elim_mask[:, None] >> k_idx) & 1) == 0)

        score = s.score + jnp.sum(jnp.where(kept, sel_w, 0), axis=1)
        used = s.used
        used = used.at[lane[:, None], jnp.where(kept, sel_sl, lcap)].max(kept)
        used = used.at[lane[:, None], jnp.where(kept, sel_sm, lcap)].max(kept)
        used = used.at[:, lcap].set(False)

        # the scan stopped at the lh-th unblocked entry (or the queue end)
        sel_end = jnp.max(jnp.where(sel, pos, -1), axis=1)
        full = sel_cnt >= lh_lane
        new_ptr = jnp.where(full, sel_end + 1, n_cand)
        ptr = jnp.where(engaged, new_ptr, s.ptr)
        return _St(ptr=ptr, used=used, score=score)

    final = jax.lax.while_loop(cond, body, state)
    return RoundsResult(score=final.score, used_slot=final.used[:, :lcap],
                        overflow=overflow)


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
        elim_mask = _solve_conflicts_machine(sel_l, sel_m, sel_w, sel_cnt, resolving, lh)

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
