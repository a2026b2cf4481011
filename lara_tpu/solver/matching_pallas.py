"""Pallas TPU kernel for the greedy lookahead matching rounds loop.

Same semantics as :func:`lara_tpu.solver.matching_device._rounds_loop` (the
exact replay of ``computeGreedyMatching`` + ``solveConflicts``,
``/root/reference/src/matching.hpp:99-192``), but the whole round state
machine -- queue scan, lookahead selection, memoized conflict-subset
enumeration, endpoint blocking -- runs inside one Mosaic kernel per batch
block.  The XLA formulation spends ~250 small dispatches per round on
[B, W]-wide ops whose fixed overhead dwarfs their bandwidth; in-kernel the
same math is straight-line VPU work on VMEM-resident tiles, and the
per-round cost collapses to microseconds.

Port notes (kept bit-equal to the XLA mirror, fuzz-tested in
``tests/test_matching_pallas.py``):

* the queue is compacted + queue-ordered by the caller (position == rank),
* cumsum over the live mask is a Hillis-Steele ladder of masked rolls,
* ``solveConflicts``'s recursion is replayed by the same popcount-descending
  subset memo as the XLA version; the dynamic ``E | s_bit`` memo reads
  unroll over the ``lh`` possible s-slots (static subset index per column),
* all per-selection state lives in [BB, 1] columns (python lists over the
  lookahead axis), so no dynamic indexing is required anywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _conflict_pairs(lh: int):
    pairs = []
    for x in range(lh):
        for y in range(x + 1, lh):
            pairs.append((x, y))
    return pairs


def matching_rounds_values(live, lq, mq, wq, line, lh: int):
    """The greedy-lookahead rounds state machine on in-kernel VALUES.

    ``live`` bool [BB, W] (queue-ordered candidate mask), ``lq/mq/wq`` int32
    [BB, W], ``line`` int32 [BB, S_pad] line-slot edge ids (any sentinel that
    never equals a real edge id for invalid slots).  Returns
    (score [BB, 1] int32, used [BB, S_pad] int32).  Factored out so the
    state machine can be embedded in other kernels as in-kernel values.
    """
    n_conf = lh * (lh - 1) // 2
    conf = _conflict_pairs(lh)
    n_sub = 1 << lh
    # subsets in popcount-descending fill order (full set excluded: memo 0)
    fill_order = sorted(range(n_sub - 1), key=lambda e: -bin(e).count("1"))

    bb, width = lq.shape
    s_pad = line.shape[1]
    col = jax.lax.broadcasted_iota(I32, (bb, width), dimension=1)
    ncand = jnp.sum(live.astype(I32), axis=1, keepdims=True)
    lh_lane = jnp.minimum(I32(lh), ncand)  # [BB, 1]


    def cumsum_w(x):
        # Hillis-Steele inclusive prefix sum along the width axis
        s = 1
        while s < width:
            x = x + jnp.where(col >= s, pltpu.roll(x, shift=s, axis=1), 0)
            s *= 2
        return x

    def body(state):
        ptr, blocked_i, score, used_i = state
        blocked = blocked_i != 0
        used = used_i != 0
        engaged = ptr < width                          # [BB, 1]
        ok = ~blocked & (col >= ptr)
        srank = cumsum_w(ok.astype(I32))
        navail = jnp.sum(ok.astype(I32), axis=1, keepdims=True)

        # ---- the next lh unblocked entries (position == rank) ----
        sel_l, sel_m, sel_w, sel_rank = [], [], [], []
        for k in range(lh):
            onehot = ok & (srank == k + 1)
            sel_l.append(jnp.sum(jnp.where(onehot, lq, 0), axis=1,
                                 keepdims=True))
            sel_m.append(jnp.sum(jnp.where(onehot, mq, 0), axis=1,
                                 keepdims=True))
            sel_w.append(jnp.sum(jnp.where(onehot, wq, 0), axis=1,
                                 keepdims=True))
            sel_rank.append(jnp.where(
                navail > k,
                jnp.sum(jnp.where(onehot, col, 0), axis=1, keepdims=True),
                I32(width)))
        valid_k = [(sel_rank[k] < width) & (k < lh_lane)
                   for k in range(lh)]
        sel_cnt = valid_k[0].astype(I32)
        for k in range(1, lh):
            sel_cnt = sel_cnt + valid_k[k].astype(I32)
        any_sel = sel_cnt > 0
        for k in range(lh):
            sel_l[k] = jnp.where(valid_k[k], sel_l[k], 0)
            sel_m[k] = jnp.where(valid_k[k], sel_m[k], 0)
            sel_w[k] = jnp.where(valid_k[k], sel_w[k], 0)

        # ---- solveConflicts replay: memoized subset enumeration ----
        # (matching.hpp:99-141 via matching_device._solve_conflicts_enum)
        engaged_sel = engaged & any_sel
        if n_conf == 0:
            elim = jnp.zeros((bb, 1), I32)
        else:
            conf_active = []
            for (x, y) in conf:
                both = (x < sel_cnt) & (y < sel_cnt)
                share = (sel_l[x] == sel_l[y]) | (sel_l[x] == sel_m[y]) \
                    | (sel_m[x] == sel_l[y]) | (sel_m[x] == sel_m[y])
                conf_active.append(both & share)
            full_mask = jnp.zeros((bb, 1), I32)
            for c, a in enumerate(conf_active):
                full_mask = full_mask | jnp.where(a, I32(1 << c), 0)
            touch = []
            for e in range(lh):
                t = jnp.zeros((bb, 1), I32)
                for c, (x, y) in enumerate(conf):
                    if x == e or y == e:
                        t = t | jnp.where(conf_active[c], I32(1 << c), 0)
                touch.append(t)
            # remaining-conflict mask per elimination subset
            mask_e = [full_mask]
            for e_set in range(1, n_sub):
                low = (e_set & -e_set).bit_length() - 1
                mask_e.append(mask_e[e_set & (e_set - 1)] & ~touch[low])
            # first conflict per subset and its S (higher slot) / L slots
            c0s, s_slots, l_slots = [], [], []
            for e_set in range(n_sub):
                m = mask_e[e_set]
                c0 = jnp.zeros((bb, 1), I32)
                # i32 0/1 accumulator: Mosaic cannot lower bool-dtype array
                # constants (i8 vectors) into the i1 mask domain
                found_i = jnp.zeros((bb, 1), I32)
                for c in range(n_conf):
                    hit = (found_i == 0) & ((m & (1 << c)) != 0)
                    c0 = jnp.where(hit, I32(c), c0)
                    found_i = found_i | hit.astype(I32)
                c0s.append(c0)
                s_slot = jnp.zeros((bb, 1), I32)
                l_slot = jnp.zeros((bb, 1), I32)
                for c, (x, y) in enumerate(conf):
                    is_c = c0 == c
                    s_slot = jnp.where(is_c, I32(y), s_slot)
                    l_slot = jnp.where(is_c, I32(x), l_slot)
                s_slots.append(s_slot)
                l_slots.append(l_slot)

            def pick_k(cols, slot):
                out = jnp.zeros((bb, 1), I32)
                for k in range(lh):
                    out = jnp.where(slot == k, cols[k], out)
                return out

            memo_w = [jnp.zeros((bb, 1), I32) for _ in range(n_sub)]
            memo_e = [jnp.zeros((bb, 1), I32) for _ in range(n_sub)]
            for e_set in fill_order:
                m = mask_e[e_set]
                empty = m == 0
                single = ~empty & ((m & (m - 1)) == 0)
                s_slot = s_slots[e_set]
                l_slot = l_slots[e_set]
                w_s = pick_k(sel_w, s_slot)
                w_l = pick_k(sel_w, l_slot)
                # memo reads at E | s_bit / E | l_bit: subset static,
                # bit dynamic over lh choices -> unrolled select
                sub_s_w = jnp.zeros((bb, 1), I32)
                sub_s_e = jnp.zeros((bb, 1), I32)
                sub_l_w = jnp.zeros((bb, 1), I32)
                sub_l_e = jnp.zeros((bb, 1), I32)
                ms_after = jnp.zeros((bb, 1), I32)
                ml_after = jnp.zeros((bb, 1), I32)
                for k in range(lh):
                    idx = e_set | (1 << k)
                    is_s = s_slot == k
                    is_l = l_slot == k
                    sub_s_w = jnp.where(is_s, memo_w[idx], sub_s_w)
                    sub_s_e = jnp.where(is_s, memo_e[idx], sub_s_e)
                    sub_l_w = jnp.where(is_l, memo_w[idx], sub_l_w)
                    sub_l_e = jnp.where(is_l, memo_e[idx], sub_l_e)
                    ms_after = jnp.where(is_s, mask_e[idx], ms_after)
                    ml_after = jnp.where(is_l, mask_e[idx], ml_after)
                weight_s = w_s + sub_s_w
                weight_l = w_l + sub_l_w
                explore = (weight_s > w_l) & (ms_after != ml_after)
                l_wins = explore & (weight_s > weight_l)
                s_bit = jnp.int32(1) << s_slot
                l_bit = jnp.int32(1) << l_slot
                val_w = jnp.where(
                    empty, I32(0),
                    jnp.where(single, w_s,
                              jnp.where(l_wins, weight_l, weight_s)))
                val_e = jnp.where(
                    empty, I32(0),
                    jnp.where(single, s_bit,
                              jnp.where(l_wins, sub_l_e | l_bit,
                                        sub_s_e | s_bit)))
                memo_w[e_set] = val_w
                memo_e[e_set] = val_e
            elim = jnp.where(engaged_sel, memo_e[0], 0)

        # ---- accept survivors; block endpoints; mark line slots ----
        score_add = jnp.zeros((bb, 1), I32)
        for k in range(lh):
            kept_k = engaged_sel & valid_k[k] & (((elim >> k) & 1) == 0)
            score_add = score_add + jnp.where(kept_k, sel_w[k], 0)
            hit = (lq == sel_l[k]) | (lq == sel_m[k]) \
                | (mq == sel_l[k]) | (mq == sel_m[k])
            blocked = blocked | (kept_k & hit)
            used = used | (kept_k
                           & ((line == sel_l[k]) | (line == sel_m[k])))
        score = score + score_add

        sel_end = jnp.full((bb, 1), -1, I32)
        for k in range(lh):
            sel_end = jnp.maximum(
                sel_end, jnp.where(valid_k[k], sel_rank[k], -1))
        full_sel = any_sel & (sel_cnt >= lh_lane)
        new_ptr = jnp.where(full_sel, sel_end + 1, I32(width))
        ptr = jnp.where(engaged, new_ptr, ptr)
        return ptr, blocked.astype(I32), score, used.astype(I32)

    def cond(state):
        ptr, _blocked, _score, _used = state
        return jnp.any(ptr < width)

    state0 = (
        jnp.zeros((bb, 1), I32),
        (~live).astype(I32),
        jnp.zeros((bb, 1), I32),
        jnp.zeros((bb, s_pad), I32),
    )
    _ptr, _blocked, score, used = jax.lax.while_loop(cond, body, state0)
    return score, used


def _make_kernel(lh: int, width: int, s_pad: int):
    def _kernel(live_ref, lq_ref, mq_ref, wq_ref, line_ref, score_ref,
                used_ref):
        score, used = matching_rounds_values(
            live_ref[...] != 0, lq_ref[...], mq_ref[...], wq_ref[...],
            line_ref[...], lh)
        score_ref[...] = score
        used_ref[...] = used

    return _kernel


@functools.partial(
    jax.jit, static_argnames=("lookahead", "width", "block_b", "interpret"))
def rounds_loop_pallas(lq, mq, wq, live, line_edges, lookahead: int,
                       width: int, block_b: int = 64,
                       interpret: bool = False):
    """Kernel-backed matching rounds loop over queue-ordered candidates.

    ``lq/mq/wq``: [B, W] queue-ordered candidate columns; ``live``: [B, W]
    bool mask of live candidates (any sparsity pattern -- position order is
    queue order); ``line_edges``: [B, S] flat edge id per line slot
    (sentinel >= ne for invalid).  Returns (score [B], used_slot [B, S]).
    """
    b, w = lq.shape
    assert w == width
    lh = max(1, min(int(lookahead), 8))
    s = line_edges.shape[1]
    wp = _round_up(width, 128)
    sp = _round_up(s, 128)
    # VMEM sizing: ~6 width-wide live tiles (lq/mq/wq/live + cumsum temps)
    # and ~3 slot-wide tiles per lane; keep the block under ~6 MB so wide
    # 16S-scale queues (W ~ 40k) compile instead of blowing the 16 MB limit
    vmem_lanes = max(1, (6 * 1024 * 1024) // (4 * (6 * wp + 3 * sp)))
    if vmem_lanes < block_b:
        block_b = max(8, 1 << (vmem_lanes.bit_length() - 1))
    bb = min(block_b, b)
    bp = _round_up(b, bb)

    def padb(x, fill):
        return jnp.pad(x, ((0, bp - b), (0, wp - w)), constant_values=fill)

    lq_p = padb(lq, 0)
    mq_p = padb(mq, 0)
    wq_p = padb(wq, 0)
    line_p = jnp.pad(line_edges, ((0, bp - b), (0, sp - s)),
                     constant_values=jnp.iinfo(jnp.int32).max)
    live_p = padb(live.astype(I32), 0)

    grid = (bp // bb,)
    score, used = pl.pallas_call(
        _make_kernel(lh, wp, sp),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bb, wp), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, wp), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, wp), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, wp), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, sp), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bb, 1), lambda g: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, sp), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, 1), jnp.int32),
            jax.ShapeDtypeStruct((bp, sp), jnp.int32),
        ],
        interpret=interpret,
    )(live_p, lq_p, mq_p, wq_p, line_p)

    return score[:b, 0], used[:b, :s].astype(bool)
