"""Fused post-DP bookkeeping Mosaic kernel for the batched subgradient
solver.

One Mosaic kernel replaces the XLA body's entire post-DP pipeline --
memberships, subgradients, consistent branch, greedy matching rounds,
bound bookkeeping and the float32 dual update -- leaving per iteration only
the scatter-max PSSM update, the wavefront DP pair (Mosaic kernels in
:mod:`lara_tpu.ops.gotoh_pallas`) and a handful of glue ops.

Per iteration: ``scatter-max PSSM -> DP forward -> DP traceback ->
bookkeeping kernel``.

Key re-designs vs :func:`device_solver.solve_batch_chunk` (same bit-exact
semantics, ``subgradient_solver.hpp:219-331``, ``lagrange.hpp:312-423``):

* **The rev-involution sort is gone.**  ``dual[rev[i]] == -dual[i]`` holds
  exactly: subgradients come in +/- pairs over mirror entries
  (``lagrange.hpp:356-363``), all lanes share one float32 step, float32
  negation is exact and int32 conversion truncates toward zero (an odd
  function); and ``sscore[rev[i]] == sscore[i]`` (contact weights are
  symmetric, ``interactions.py``).  The mirror entry's profit is therefore
  locally computable -- ``rprof = sscore - dual`` -- and "is the mirror a
  tied queue top" becomes a *slot join*: per line slot the bookkeeping
  kernel takes the masked max of its own profits over that edge's run (the
  reference's queue top, ``lagrange.hpp:305-309``) and
  ``pick_rev[i] = any_a(dual_m[i] == slot_edge[a] & rprof[i] == srun[a])``.
  ``pick`` itself uses the same join on ``dual_l``/``profits``, so neither
  the rev sort nor any cross-kernel run-max plumbing is needed.
* The exact-top scan (consistent branch), the line-membership joins, the
  greedy matching rounds (shared with :mod:`matching_pallas`), bound
  bookkeeping and the float32 dual update all run VMEM-resident inside the
  kernel.

(The PSSM placement itself is no longer a kernel at all: every dual
entry's position in the skewed DP input is loop-invariant, so the driver
performs one int32 scatter-max onto a hoisted base per iteration --
``device_solver.solve_batch_chunk``.)

Bit-equality with the XLA body is fuzzed in ``tests/test_mega.py``
(interpret mode on CPU) and gated on hardware by the bench parity oracles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lara_tpu.solver.matching_pallas import matching_rounds_values
from lara_tpu.types import INFINITY, PSSM_INIT

I32 = jnp.int32
F32 = jnp.float32
NEG_INF = np.int32(-int(INFINITY))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# in-kernel shifts (lane axis, non-circular with fill)
# ---------------------------------------------------------------------------

def _kshift_right(x, s: int, fill, col):
    """out[i] = x[i-s] (fill for i < s)."""
    return jnp.where(col < s, fill, pltpu.roll(x, shift=s, axis=1))


def _kshift_left(x, s: int, fill, col):
    """out[i] = x[i+s] (fill for i >= w-s)."""
    w = x.shape[-1]
    return jnp.where(col >= w - s, fill, pltpu.roll(x, shift=w - s, axis=1))


# ---------------------------------------------------------------------------
# kernel 2: whole post-DP bookkeeping + dual update
# ---------------------------------------------------------------------------

def _make_bookkeep_kernel(la_max: int, lb_max: int, ne: int, steps: int,
                          lh: int, d: int, cw: int, wp: int):
    neg_inf = int(NEG_INF)

    def _kernel(params_ref,
                dual_l_ref, dual_m_ref, sscore_ref, dvalid_ref, dual_ref,
                daq_ref, lq_ref, mq_ref, wq_ref, nc_ref,
                partner_ref, tbs_ref,
                sf_ref, nondecr_ref, remaining_ref, act_ref,
                bl_ref, bu_ref, bs_ref, bnl_ref, iters_ref,
                bpart_ref, bmatch_ref,
                dual_out, daq_out, sf_out, nondecr_out, remaining_out,
                act_out, bl_out, bu_out, bs_out, bnl_out, iters_out,
                bpart_out, bmatch_out):
        bb = dual_l_ref.shape[0]
        max_nondecr = params_ref[0, 0]
        col_d = jax.lax.broadcasted_iota(I32, (bb, d), dimension=1)
        col_cw = jax.lax.broadcasted_iota(I32, (bb, cw), dimension=1)
        col_wp = jax.lax.broadcasted_iota(I32, (bb, wp), dimension=1)

        dv = dvalid_ref[...] != 0
        dual_l = dual_l_ref[...]
        dual_m = dual_m_ref[...]
        sscore = sscore_ref[...]
        dual_in = dual_ref[...]
        act = act_ref[...] != 0                       # [BB, 1]
        partner = partner_ref[...]                    # [BB, WP]
        upper = tbs_ref[0]                            # [BB, 1]
        gap = tbs_ref[1]
        nlines = tbs_ref[2]
        seq_part = tbs_ref[3]
        lq = lq_ref[...]
        mq = mq_ref[...]

        daq_out[...] = jnp.where(act, dual_in, daq_ref[...])

        profits = jnp.where(dv, sscore + dual_in, neg_inf)
        # mirror entry's profit: dual[rev] == -dual, sscore[rev] == sscore
        rprof = jnp.where(dv, sscore - dual_in, neg_inf)

        slot_valid = partner >= 0
        slot_edge = jnp.where(slot_valid, col_wp * lb_max + partner, ne)

        # ---- fused slot joins: membership + tied-top picks (both dirs) ----
        # per slot a (a line edge), the run max of that edge's queue is a
        # masked max over the kernel's own profits -- the reference's
        # priority-queue top (lagrange.hpp:305-309); an entry is picked iff
        # its profit ties that max and the max is >= 0 (self-entry profit 0
        # outranks negative runs).  pick_rev uses the mirror profit
        # rprof = sscore - dual against the PARTNER edge's run max.
        # accumulators carry int32 0/1: Mosaic cannot lower bool-dtype array
        # constants (i8 vectors) into the i1 mask domain
        l_in_i = jnp.zeros((bb, d), I32)
        pick_i = jnp.zeros((bb, d), I32)
        pickrev_i = jnp.zeros((bb, d), I32)
        l_in_q_i = jnp.zeros((bb, cw), I32)
        m_in_q_i = jnp.zeros((bb, cw), I32)
        for a in range(la_max):
            se = slot_edge[:, a:a + 1]
            eq_l = dual_l == se
            eq_m = dual_m == se
            sr = jnp.max(jnp.where(eq_l, profits, neg_inf), axis=1,
                         keepdims=True)
            srok = sr >= 0
            l_in_i = l_in_i | eq_l.astype(I32)
            pick_i = pick_i | (eq_l & (profits == sr) & srok).astype(I32)
            pickrev_i = pickrev_i | (eq_m & (rprof == sr) & srok).astype(I32)
            l_in_q_i = l_in_q_i | (lq == se).astype(I32)
            m_in_q_i = m_in_q_i | (mq == se).astype(I32)
        l_in = (l_in_i != 0) & dv
        pick = (pick_i != 0) & dv
        pickrev = (pickrev_i != 0) & dv
        l_in_q = l_in_q_i != 0
        m_in_q = m_in_q_i != 0

        # ---- subgradients (lagrange.hpp:343-374) ----
        sg_pos = pick & ~pickrev
        sg = sg_pos.astype(I32) - (pickrev & ~pick).astype(I32)
        count = 2 * jnp.sum(sg_pos.astype(I32), axis=1, keepdims=True)
        any_sg = count > 0

        # ---- consistent branch (lagrange.hpp:397-409): exact-top scan ----
        fp, fi = profits, col_d
        bp_, bi = profits, col_d
        s = 1
        for _ in range(steps):
            same_r = _kshift_right(dual_l, s, -1, col_d) == dual_l
            same_l = _kshift_left(dual_l, s, -1, col_d) == dual_l
            cp = jnp.where(same_r, _kshift_right(fp, s, neg_inf, col_d),
                           neg_inf)
            ci = jnp.where(same_r, _kshift_right(fi, s, d, col_d), d)
            take1 = (fp > cp) | ((fp == cp) & (fi <= ci))
            fp = jnp.where(take1, fp, cp)
            fi = jnp.where(take1, fi, ci)
            cp = jnp.where(same_l, _kshift_left(bp_, s, neg_inf, col_d),
                           neg_inf)
            ci = jnp.where(same_l, _kshift_left(bi, s, d, col_d), d)
            take1 = (bp_ > cp) | ((bp_ == cp) & (bi <= ci))
            bp_ = jnp.where(take1, bp_, cp)
            bi = jnp.where(take1, bi, ci)
            s *= 2
        take1 = (fp > bp_) | ((fp == bp_) & (fi <= bi))
        run_idx = jnp.where(take1, fi, bi)
        is_top_exact = dv & (col_d == run_idx)
        tis = (profits < 0) | ((profits == 0) & (dual_l < dual_m))
        contrib = is_top_exact & l_in & ~tis
        consistent_sum = jnp.sum(jnp.where(contrib, sscore, 0), axis=1,
                                 keepdims=True)
        mc_i = jnp.zeros((bb, wp), I32)
        for a in range(la_max):
            se = slot_edge[:, a:a + 1]
            hit = jnp.any(contrib & ((dual_l == se) | (dual_m == se)),
                          axis=1, keepdims=True)
            mc_i = mc_i | ((col_wp == a) & hit).astype(I32)

        # ---- matching branch (lagrange.hpp:380-395), shared rounds body ----
        cand = (col_cw < nc_ref[...]) & l_in_q & m_in_q & any_sg & act
        mscore, used = matching_rounds_values(
            cand, lq, mq, wq_ref[...], slot_edge, lh)
        struct_part = jnp.where(any_sg, mscore, consistent_sum)
        lower = seq_part + struct_part + gap

        # ---- best primal tracking (lagrange.hpp:416-421) ----
        # (selects stay in int32: Mosaic cannot truncate i8 bool vectors
        # back into the i1 mask domain)
        better = act & (lower > bs_ref[...])
        sm_i = jnp.where(any_sg, used, mc_i)
        slot_matched_i = jnp.where(slot_valid, sm_i, 0)
        slot_matched_i = jnp.where(slot_matched_i != 0, 1, 0)
        bs_out[...] = jnp.where(better, lower, bs_ref[...])
        bpart_out[...] = jnp.where(better, partner, bpart_ref[...])
        bnl_out[...] = jnp.where(better, nlines, bnl_ref[...])
        bmatch_out[...] = jnp.where(better, slot_matched_i,
                                    bmatch_ref[...])

        # ---- bound bookkeeping (subgradient_solver.hpp:247-263) ----
        improved_u = act & (upper < bu_ref[...])
        improved_l = act & (lower > bl_ref[...])
        bu = jnp.where(improved_u, upper, bu_ref[...])
        bl = jnp.where(improved_l, lower, bl_ref[...])
        nondecr0 = jnp.where(improved_u | improved_l, 0, nondecr_ref[...])
        halve = act & (nondecr0 >= max_nondecr)
        sf = jnp.where(halve, sf_ref[...] / F32(2.0), sf_ref[...])
        nondecr_out[...] = jnp.where(
            act, jnp.where(halve, 0, nondecr0 + 1), nondecr_ref[...])
        sf_out[...] = sf
        bu_out[...] = bu
        bl_out[...] = bl

        # ---- dual update (subgradient_solver.hpp:265-271) ----
        step = sf * (bu - bl).astype(F32) / \
            jnp.maximum(count, 1).astype(F32)
        upd = act & (sg != 0)
        new_dual = (dual_in.astype(F32) - step * sg.astype(F32)).astype(I32)
        dual_out[...] = jnp.where(upd, new_dual, dual_in)

        remaining = jnp.where(act, remaining_ref[...] - 1, remaining_ref[...])
        remaining_out[...] = remaining
        done = act & ((bu == bl) | (remaining == 0))
        act_out[...] = (act & ~done).astype(I32)
        iters_out[...] = iters_ref[...] + act.astype(I32)

    return _kernel


def mega_bookkeep(args, *, la_max: int, lb_max: int, ne: int, steps: int,
                  lookahead: int, max_nondecr: int, interpret: bool = False):
    """One fused bookkeeping step.  ``args`` is the input tuple in kernel
    order (see ``_make_bookkeep_kernel``); all [B, 1]/[B, WP]/[B, D]/[B, CW]
    arrays int32 except ``sf`` (f32).  Returns the 13 outputs in order."""
    (dual_l, dual_m, sscore, dvalid_i, dual, daq, lq, mq, wq, nc,
     partner, tbs, sf, nondecr, remaining, act,
     bl, bu, bs, bnl, iters, bpart, bmatch) = args
    b, d = dual_l.shape
    cw = lq.shape[1]
    wp = partner.shape[1]
    lh = max(1, min(int(lookahead), 8))
    # empirical per-lane VMEM model fitted to Mosaic's measured scoped
    # allocations (it keeps far more live than the dataflow suggests):
    # 17.7 MB at bb=16/D=2048 and 18.8 MB at bb=8/D=5120 both fit
    # ~(480*d + 160*cw) bytes per lane; budget against a 13 MB ceiling
    # (the hard scoped-vmem limit is 16 MB)
    per_lane = 480 * d + 160 * cw + 64 * wp
    lane_budget = max(1, (13 * 1024 * 1024) // per_lane)
    bb = min(b, max(8, 1 << (lane_budget.bit_length() - 1)))
    # callers gate the mega path at d <= 3072 so bb=8 always fits
    bp = _round_up(b, bb)

    def pad(x, fill=0):
        if bp == b:
            return x
        return jnp.pad(x, ((0, bp - b), (0, 0)), constant_values=fill)

    def pad3(x):
        if bp == b:
            return x
        return jnp.pad(x, ((0, 0), (0, bp - b), (0, 0)))

    dspec = pl.BlockSpec((bb, d), lambda g: (g, 0), memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((bb, cw), lambda g: (g, 0), memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((bb, wp), lambda g: (g, 0), memory_space=pltpu.VMEM)
    lspec = pl.BlockSpec((bb, 1), lambda g: (g, 0), memory_space=pltpu.VMEM)
    tspec = pl.BlockSpec((4, bb, 1), lambda g: (0, g, 0),
                         memory_space=pltpu.VMEM)
    params = jnp.array([[max_nondecr, 0]], I32)

    outs = pl.pallas_call(
        _make_bookkeep_kernel(la_max, lb_max, ne, steps, lh, d, cw, wp),
        grid=(bp // bb,),
        in_specs=[
            pl.BlockSpec((1, 2), lambda g: (0, 0), memory_space=pltpu.SMEM),
            dspec, dspec, dspec, dspec, dspec, dspec,
            cspec, cspec, cspec, lspec,
            wspec, tspec,
            lspec, lspec, lspec, lspec,
            lspec, lspec, lspec, lspec, lspec,
            wspec, wspec,
        ],
        out_specs=[
            dspec, dspec, lspec, lspec, lspec, lspec, lspec, lspec, lspec,
            lspec, lspec, wspec, wspec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, d), jnp.int32),
            jax.ShapeDtypeStruct((bp, d), jnp.int32),
            jax.ShapeDtypeStruct((bp, 1), jnp.float32),
            jax.ShapeDtypeStruct((bp, 1), jnp.int32),
            jax.ShapeDtypeStruct((bp, 1), jnp.int32),
            jax.ShapeDtypeStruct((bp, 1), jnp.int32),
            jax.ShapeDtypeStruct((bp, 1), jnp.int32),
            jax.ShapeDtypeStruct((bp, 1), jnp.int32),
            jax.ShapeDtypeStruct((bp, 1), jnp.int32),
            jax.ShapeDtypeStruct((bp, 1), jnp.int32),
            jax.ShapeDtypeStruct((bp, 1), jnp.int32),
            jax.ShapeDtypeStruct((bp, wp), jnp.int32),
            jax.ShapeDtypeStruct((bp, wp), jnp.int32),
        ],
        interpret=interpret,
    )(params, pad(dual_l), pad(dual_m), pad(sscore), pad(dvalid_i),
      pad(dual), pad(daq), pad(lq), pad(mq), pad(wq), pad(nc),
      pad(partner, -1), pad3(tbs), pad(sf), pad(nondecr),
      pad(remaining), pad(act), pad(bl), pad(bu), pad(bs), pad(bnl),
      pad(iters), pad(bpart, -1), pad(bmatch))
    return tuple(o[:b] for o in outs)
