"""Pallas TPU kernel for the batched anti-diagonal Gotoh wavefront DP.

Same semantics as :func:`lara_tpu.ops.gotoh.gotoh_scan` (``emit='dirs'``) --
the per-iteration hot op (``subgradient_solver.hpp:223-225``) -- but as a
Mosaic kernel: the XLA ``lax.scan`` pays ~15us of loop overhead per
anti-diagonal for only a few KB of vector work, which dominates the solve
at tRNA scale.  Here the diagonal sweep is the *grid*:

* grid = (batch_blocks, num_diagonals); the diagonal axis is the fastest
  (sequential) dimension, so the M/H/V wavefronts live in VMEM scratch and
  persist across grid steps while Pallas double-buffers the per-diagonal
  skewed-score block HBM->VMEM.
* each grid step is pure VPU work on an int32 [BB, W] tile (W padded to a
  lane multiple), writing the packed traceback directions for that diagonal.
* the terminal cell (la, lb) of every lane is captured with a one-hot mask
  into scratch and reduced into the finals output on the last diagonal.

The traceback itself stays in XLA (:func:`lara_tpu.ops.gotoh.traceback`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lara_tpu.ops.gotoh import MAT, HOR, VER
from lara_tpu.types import PSSM_INIT

I32 = jnp.int32
NEG_INF = -1431655764  # python int: jnp scalars would be captured consts


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _make_kernel(dchunk: int):
    def _kernel(params_ref, skewed_ref, la_ref, lb_ref, dirs_ref, finals_ref,
                st_ref, fin_ref):
        """``dchunk`` anti-diagonal steps for one batch block per grid step
        (amortizes grid/DMA overhead over several tiny diagonal updates).

        st_ref: [6, BB, W] scratch -- M/H/V wavefronts at d-1 (rows 0-2) and
        d-2 (rows 3-5).  fin_ref: [3, BB, W] scratch -- one-hot captured
        terminal M/H/V values.
        """
        dblk = pl.program_id(1)
        num_blocks = pl.num_programs(1)
        go = params_ref[0, 0]
        ge = params_ref[0, 1]

        _, bb, w = skewed_ref.shape
        col = jax.lax.broadcasted_iota(I32, (bb, w), dimension=1)

        @pl.when(dblk == 0)
        def _init():
            st_ref[...] = jnp.full((6, bb, w), NEG_INF, I32)
            fin_ref[...] = jnp.full((3, bb, w), NEG_INF, I32)

        m1 = st_ref[0]
        h1 = st_ref[1]
        v1 = st_ref[2]
        m2 = st_ref[3]
        h2 = st_ref[4]
        v2 = st_ref[5]
        la = la_ref[...]  # [BB, 1]
        lb = lb_ref[...]
        fin0 = fin_ref[0]
        fin1 = fin_ref[1]
        fin2 = fin_ref[2]

        def shift(x):
            # offset +1 along the diagonal axis (i-1 lookup), NEG_INF fill
            return jnp.where(col == 0, NEG_INF, pltpu.roll(x, shift=1, axis=1))

        for t in range(dchunk):
            d = dblk * dchunk + t
            t_row = skewed_ref[t]

            # M from diagonal d-2 at i-1
            m2s, h2s, v2s = shift(m2), shift(h2), shift(v2)
            best_prev = jnp.maximum(jnp.maximum(m2s, h2s), v2s)
            m_new = best_prev + t_row
            mdir = jnp.where(m2s == best_prev, MAT,
                             jnp.where(h2s == best_prev, HOR, VER))

            # H from diagonal d-1 at same i (cell (i, j-1)); prefer extension
            hh, hm, hv = h1 + ge, m1 + go, v1 + go
            h_new = jnp.maximum(jnp.maximum(hh, hm), hv)
            hdir = jnp.where(hh == h_new, HOR, jnp.where(hm == h_new, MAT, VER))

            # V from diagonal d-1 at i-1 (cell (i-1, j)); prefer extension
            m1s, h1s, v1s = shift(m1), shift(h1), shift(v1)
            vv, vm, vh = v1s + ge, m1s + go, h1s + go
            v_new = jnp.maximum(jnp.maximum(vv, vm), vh)
            vdir = jnp.where(vv == v_new, VER, jnp.where(vm == v_new, MAT, HOR))

            # border overrides: cell (0, d) and cell (d, 0)
            bg = jnp.where(d == 0, I32(0), go + ge * (d - 1))
            top = col == 0
            left = col == d
            m_new = jnp.where(top | left, bg, m_new)
            h_new = jnp.where(top, jnp.where(d == 0, NEG_INF, bg),
                              jnp.where(left, NEG_INF, h_new))
            v_new = jnp.where(left, jnp.where(d == 0, NEG_INF, bg),
                              jnp.where(top, NEG_INF, v_new))

            # int8 direction codes (6 bits): the dirs tensor is written and
            # re-read every iteration, and the body is HBM-bound -- int8
            # quarters that traffic vs int32
            dirs_ref[t] = (mdir | (hdir << 2) | (vdir << 4)).astype(jnp.int8)

            # capture terminal cell (la, lb) on its diagonal
            sel = (col == la) & (d == la + lb)
            fin0 = jnp.where(sel, m_new, fin0)
            fin1 = jnp.where(sel, h_new, fin1)
            fin2 = jnp.where(sel, v_new, fin2)

            m2, h2, v2 = m1, h1, v1
            m1, h1, v1 = m_new, h_new, v_new

        st_ref[0] = m1
        st_ref[1] = h1
        st_ref[2] = v1
        st_ref[3] = m2
        st_ref[4] = h2
        st_ref[5] = v2
        fin_ref[0] = fin0
        fin_ref[1] = fin1
        fin_ref[2] = fin2

        @pl.when(dblk == num_blocks - 1)
        def _emit_finals():
            finals_ref[0] = jnp.max(fin0, axis=1, keepdims=True)
            finals_ref[1] = jnp.max(fin1, axis=1, keepdims=True)
            finals_ref[2] = jnp.max(fin2, axis=1, keepdims=True)

    return _kernel


def _make_traceback_kernel(dchunk: int, num_blocks: int):
    def _kernel(params_ref, dirs_ref, sseq_ref, finals_ref, la_ref, lb_ref,
                partner_ref, scalars_ref, st_ref, pa_ref):
        """Reverse diagonal sweep: each grid step walks ``dchunk`` diagonals
        of the traceback for one batch block.  The per-lane walker state is
        scalar-per-lane vectors ([BB, 1]); the current cell is addressed by
        comparing a column iota against the walker's ``i`` -- no dynamic
        indexing anywhere.  Matched lines are emitted as a dense partner map
        ``partner[a] = b`` (a = seq-A position), compacted to an ordered line
        list outside the kernel.  The per-line sequence-score sum (the lower
        bound's seq part, ``lagrange.hpp:376-378``) is accumulated in-kernel
        from the skewed seq-score stream (``sseq_ref``) -- a dense [B, LA,
        LB] reduce outside would re-read the whole grid per iteration.

        st_ref: [8, BB, 1] scratch -- cur_d, i, state, gap, cnt, upper, seq.
        pa_ref: [BB, W] scratch -- partner accumulator.
        """
        t = pl.program_id(1)
        go = params_ref[0, 0]
        ge = params_ref[0, 1]
        _, bb, w = dirs_ref.shape
        col = jax.lax.broadcasted_iota(I32, (bb, w), dimension=1)
        la = la_ref[...]
        lb = lb_ref[...]

        @pl.when(t == 0)
        def _init():
            fm = finals_ref[0]
            fh = finals_ref[1]
            fv = finals_ref[2]
            upper = jnp.maximum(jnp.maximum(fm, fh), fv)
            state0 = jnp.where(fm == upper, MAT, jnp.where(fh == upper, HOR, VER))
            st_ref[0] = la + lb          # cur_d
            st_ref[1] = la               # i
            st_ref[2] = state0
            st_ref[3] = jnp.zeros((bb, 1), I32)  # gap score
            st_ref[4] = jnp.zeros((bb, 1), I32)  # line count
            st_ref[5] = upper
            st_ref[6] = jnp.zeros((bb, 1), I32)  # seq-score sum over lines
            pa_ref[...] = jnp.full((bb, w), -1, I32)

        cur_d = st_ref[0]
        cur_i = st_ref[1]
        state = st_ref[2]
        gap = st_ref[3]
        cnt = st_ref[4]
        seq = st_ref[6]
        partner = pa_ref[...]

        dblk = num_blocks - 1 - t
        for s in reversed(range(dchunk)):
            d = dblk * dchunk + s
            cur_j = cur_d - cur_i
            act = (cur_d == d) & ((cur_i > 0) | (cur_j > 0))
            # border forcing (i==0 -> run left; j==0 -> run up)
            st_eff = jnp.where(cur_i == 0, HOR, jnp.where(cur_j == 0, VER, state))
            onehot = col == cur_i
            # one stacked reduce extracts the direction code and the seq
            # score of the current cell together (measured end-to-end
            # neutral vs two separate reduces -- kept for the smaller
            # kernel body, benchmark/PROFILE.md)
            picked = jnp.sum(
                jnp.where(onehot[None],
                          jnp.stack([dirs_ref[s].astype(I32), sseq_ref[s]]),
                          0), axis=2, keepdims=True)       # [2, BB, 1]
            code = picked[0]
            mdir = code & 3
            hdir = (code >> 2) & 3
            vdir = (code >> 4) & 3
            pred = jnp.where(st_eff == MAT, mdir,
                             jnp.where(st_eff == HOR, hdir, vdir))

            is_m = (st_eff == MAT) & act
            rec = (col == cur_i - 1) & is_m
            partner = jnp.where(rec, cur_j - 1, partner)
            cnt = cnt + is_m.astype(I32)
            seq = seq + jnp.where(is_m, picked[1], 0)

            gap_h = jnp.where(pred == HOR, ge, go)
            gap_v = jnp.where(pred == VER, ge, go)
            gap = gap + jnp.where(act & (st_eff == HOR), gap_h, 0) \
                      + jnp.where(act & (st_eff == VER), gap_v, 0)

            i_next = jnp.where(st_eff != HOR, cur_i - 1, cur_i)
            d_next = cur_d - 1 - (st_eff == MAT).astype(I32)
            cur_i = jnp.where(act, i_next, cur_i)
            cur_d = jnp.where(act, d_next, cur_d)
            state = jnp.where(act, pred, state)

        st_ref[0] = cur_d
        st_ref[1] = cur_i
        st_ref[2] = state
        st_ref[3] = gap
        st_ref[4] = cnt
        st_ref[6] = seq
        pa_ref[...] = partner

        @pl.when(t == num_blocks - 1)
        def _emit():
            partner_ref[...] = partner
            scalars_ref[0] = st_ref[5]  # upper
            scalars_ref[1] = gap
            scalars_ref[2] = cnt
            scalars_ref[3] = seq

    return _kernel


def _make_stream_kernel(dchunk: int, num_blocks: int, bb: int, wp: int,
                        single_block: bool):
    """Forward wavefront with the diagonal sweep as an IN-KERNEL fori loop.

    Round-4 finding (benchmark/PROFILE.md): the complete per-diagonal step
    body costs ~0.11 us in an in-kernel loop, but ~5 us as a Pallas grid
    step -- the sequential grid dimension pays enormous per-step overhead
    on this target.  So the grid is batch-blocks only; the kernel streams
    the skewed-score blocks HBM->VMEM itself with double-buffered async
    copies and writes the int8 direction blocks back the same way.
    """

    def _kernel(params_ref, la_ref, lb_ref, skewed_hbm, finals_ref, dirs_hbm,
                sk_buf, dirs_buf, in_sems, out_sems):
        g = pl.program_id(0)
        go = params_ref[0, 0]
        ge = params_ref[0, 1]
        col = jax.lax.broadcasted_iota(I32, (bb, wp), dimension=1)
        la = la_ref[...]
        lb = lb_ref[...]
        neg = jnp.full((bb, wp), NEG_INF, I32)

        def bslice(ref, blk):
            # single batch block: slicing the (tiled) batch dim by bb < 32
            # violates DMA tile alignment -- take the whole dim instead
            if single_block:
                return ref.at[pl.ds(blk * dchunk, dchunk)]
            return ref.at[pl.ds(blk * dchunk, dchunk), pl.ds(g * bb, bb), :]

        def load_dma(slot, blk):
            return pltpu.make_async_copy(
                bslice(skewed_hbm, blk), sk_buf.at[slot], in_sems.at[slot])

        def store_dma(slot, blk):
            return pltpu.make_async_copy(
                dirs_buf.at[slot], bslice(dirs_hbm, blk), out_sems.at[slot])

        load_dma(0, 0).start()

        def shift(x):
            return jnp.where(col == 0, NEG_INF,
                             pltpu.roll(x, shift=1, axis=1))

        def body(blk, st):
            m1, h1, v1, m2, h2, v2, f0, f1, f2 = st
            slot = jax.lax.rem(blk, 2)

            @pl.when(blk + 1 < num_blocks)
            def _():
                load_dma(1 - slot, blk + 1).start()

            @pl.when(blk >= 2)
            def _():
                store_dma(slot, blk - 2).wait()

            load_dma(slot, blk).wait()
            for t in range(dchunk):
                d = blk * dchunk + t
                t_row = sk_buf[slot, t]

                m2s, h2s, v2s = shift(m2), shift(h2), shift(v2)
                best_prev = jnp.maximum(jnp.maximum(m2s, h2s), v2s)
                m_new = best_prev + t_row
                mdir = jnp.where(m2s == best_prev, MAT,
                                 jnp.where(h2s == best_prev, HOR, VER))

                hh, hm, hv = h1 + ge, m1 + go, v1 + go
                h_new = jnp.maximum(jnp.maximum(hh, hm), hv)
                hdir = jnp.where(hh == h_new, HOR,
                                 jnp.where(hm == h_new, MAT, VER))

                m1s, h1s, v1s = shift(m1), shift(h1), shift(v1)
                vv, vm, vh = v1s + ge, m1s + go, h1s + go
                v_new = jnp.maximum(jnp.maximum(vv, vm), vh)
                vdir = jnp.where(vv == v_new, VER,
                                 jnp.where(vm == v_new, MAT, HOR))

                bg = jnp.where(d == 0, I32(0), go + ge * (d - 1))
                top = col == 0
                left = col == d
                m_new = jnp.where(top | left, bg, m_new)
                h_new = jnp.where(top, jnp.where(d == 0, NEG_INF, bg),
                                  jnp.where(left, NEG_INF, h_new))
                v_new = jnp.where(left, jnp.where(d == 0, NEG_INF, bg),
                                  jnp.where(top, NEG_INF, v_new))

                dirs_buf[slot, t] = (
                    mdir | (hdir << 2) | (vdir << 4)).astype(jnp.int8)

                sel = (col == la) & (d == la + lb)
                f0 = jnp.where(sel, m_new, f0)
                f1 = jnp.where(sel, h_new, f1)
                f2 = jnp.where(sel, v_new, f2)

                m2, h2, v2 = m1, h1, v1
                m1, h1, v1 = m_new, h_new, v_new

            store_dma(slot, blk).start()
            return (m1, h1, v1, m2, h2, v2, f0, f1, f2)

        st = jax.lax.fori_loop(
            0, num_blocks, body, (neg,) * 6 + (neg, neg, neg))
        f0, f1, f2 = st[6], st[7], st[8]
        store_dma((num_blocks - 1) % 2, num_blocks - 1).wait()
        if num_blocks >= 2:
            store_dma((num_blocks - 2) % 2, num_blocks - 2).wait()
        finals_ref[0] = jnp.max(f0, axis=1, keepdims=True)
        finals_ref[1] = jnp.max(f1, axis=1, keepdims=True)
        finals_ref[2] = jnp.max(f2, axis=1, keepdims=True)

    return _kernel


def _make_tb_stream_kernel(dchunk: int, num_blocks: int, bb: int, wp: int,
                           single_block: bool):
    """Traceback with the reverse diagonal sweep as an IN-KERNEL loop
    (same rationale as :func:`_make_stream_kernel`); streams the int8
    direction blocks and the skewed seq-score blocks HBM->VMEM."""

    def _kernel(params_ref, la_ref, lb_ref, finals_ref, dirs_hbm, sseq_hbm,
                partner_ref, scalars_ref, db_buf, sq_buf, d_sems, s_sems):
        g = pl.program_id(0)
        go = params_ref[0, 0]
        ge = params_ref[0, 1]
        col = jax.lax.broadcasted_iota(I32, (bb, wp), dimension=1)
        la = la_ref[...]
        lb = lb_ref[...]

        def bslice(ref, blk):
            if single_block:
                return ref.at[pl.ds(blk * dchunk, dchunk)]
            return ref.at[pl.ds(blk * dchunk, dchunk), pl.ds(g * bb, bb), :]

        def load_dirs(slot, blk):
            return pltpu.make_async_copy(
                bslice(dirs_hbm, blk), db_buf.at[slot], d_sems.at[slot])

        def load_sseq(slot, blk):
            return pltpu.make_async_copy(
                bslice(sseq_hbm, blk), sq_buf.at[slot], s_sems.at[slot])

        load_dirs(0, num_blocks - 1).start()
        load_sseq(0, num_blocks - 1).start()

        fm = finals_ref[0]
        fh = finals_ref[1]
        fv = finals_ref[2]
        upper = jnp.maximum(jnp.maximum(fm, fh), fv)
        state0 = jnp.where(fm == upper, MAT,
                           jnp.where(fh == upper, HOR, VER))
        zero = jnp.zeros((bb, 1), I32)

        def body(k, st):
            cur_d, cur_i, state, gap, cnt, seq, partner = st
            blk = num_blocks - 1 - k
            slot = jax.lax.rem(k, 2)

            @pl.when(k + 1 < num_blocks)
            def _():
                load_dirs(1 - slot, blk - 1).start()
                load_sseq(1 - slot, blk - 1).start()

            load_dirs(slot, blk).wait()
            load_sseq(slot, blk).wait()
            for s in reversed(range(dchunk)):
                d = blk * dchunk + s
                cur_j = cur_d - cur_i
                act = (cur_d == d) & ((cur_i > 0) | (cur_j > 0))
                st_eff = jnp.where(cur_i == 0, HOR,
                                   jnp.where(cur_j == 0, VER, state))
                onehot = col == cur_i
                picked = jnp.sum(
                    jnp.where(onehot[None],
                              jnp.stack([db_buf[slot, s].astype(I32),
                                         sq_buf[slot, s]]),
                              0), axis=2, keepdims=True)   # [2, BB, 1]
                code = picked[0]
                mdir = code & 3
                hdir = (code >> 2) & 3
                vdir = (code >> 4) & 3
                pred = jnp.where(st_eff == MAT, mdir,
                                 jnp.where(st_eff == HOR, hdir, vdir))

                is_m = (st_eff == MAT) & act
                rec = (col == cur_i - 1) & is_m
                partner = jnp.where(rec, cur_j - 1, partner)
                cnt = cnt + is_m.astype(I32)
                seq = seq + jnp.where(is_m, picked[1], 0)

                gap_h = jnp.where(pred == HOR, ge, go)
                gap_v = jnp.where(pred == VER, ge, go)
                gap = gap + jnp.where(act & (st_eff == HOR), gap_h, 0) \
                          + jnp.where(act & (st_eff == VER), gap_v, 0)

                i_next = jnp.where(st_eff != HOR, cur_i - 1, cur_i)
                d_next = cur_d - 1 - (st_eff == MAT).astype(I32)
                cur_i = jnp.where(act, i_next, cur_i)
                cur_d = jnp.where(act, d_next, cur_d)
                state = jnp.where(act, pred, state)
            return (cur_d, cur_i, state, gap, cnt, seq, partner)

        st = jax.lax.fori_loop(
            0, num_blocks, body,
            (la + lb, la, state0, zero, zero, zero,
             jnp.full((bb, wp), -1, I32)))
        _cd, _ci, _st, gap, cnt, seq, partner = st
        partner_ref[...] = partner
        scalars_ref[0] = upper
        scalars_ref[1] = gap
        scalars_ref[2] = cnt
        scalars_ref[3] = seq

    return _kernel


def _make_resident_kernel(dchunk: int, num_blocks: int, bb: int, wp: int):
    """Forward wavefront with the WHOLE diagonal extent VMEM-resident.

    The stream kernels pay a per-block DMA start/wait pair whose latency is
    comparable to the block's compute at bench widths; when the skewed
    scores + dirs for all diagonals fit VMEM (align_plan decides), reading
    rows by dynamic index from a resident block removes the DMA machinery
    entirely and runs every diagonal at the in-kernel fori step floor
    measured in benchmark/PROFILE.md round-4b.

    Structure mirrors :func:`_make_stream_kernel` exactly (fori over
    dchunk-sized blocks with the steps unrolled inside) minus the DMA:
    Mosaic's loop layout solver rejects several single-step-per-iteration
    formulations of this recurrence with an invalid replicated relayout,
    but accepts the stream kernel's proven shape.
    """

    def _kernel(params_ref, la_ref, lb_ref, skewed_ref, finals_ref, dirs_ref):
        go = params_ref[0, 0]
        ge = params_ref[0, 1]
        col = jax.lax.broadcasted_iota(I32, (bb, wp), dimension=1)
        la = la_ref[...]
        lb = lb_ref[...]
        neg = jnp.full((bb, wp), NEG_INF, I32)

        def shift(x):
            return jnp.where(col == 0, NEG_INF,
                             pltpu.roll(x, shift=1, axis=1))

        def body(blk, st):
            m1, h1, v1, m2, h2, v2, f0, f1, f2 = st
            for t in range(dchunk):
                d = blk * dchunk + t
                t_row = skewed_ref[d]

                m2s, h2s, v2s = shift(m2), shift(h2), shift(v2)
                best_prev = jnp.maximum(jnp.maximum(m2s, h2s), v2s)
                m_new = best_prev + t_row
                mdir = jnp.where(m2s == best_prev, MAT,
                                 jnp.where(h2s == best_prev, HOR, VER))

                hh, hm, hv = h1 + ge, m1 + go, v1 + go
                h_new = jnp.maximum(jnp.maximum(hh, hm), hv)
                hdir = jnp.where(hh == h_new, HOR,
                                 jnp.where(hm == h_new, MAT, VER))

                m1s, h1s, v1s = shift(m1), shift(h1), shift(v1)
                vv, vm, vh = v1s + ge, m1s + go, h1s + go
                v_new = jnp.maximum(jnp.maximum(vv, vm), vh)
                vdir = jnp.where(vv == v_new, VER,
                                 jnp.where(vm == v_new, MAT, HOR))

                bg = jnp.where(d == 0, I32(0), go + ge * (d - 1))
                top = col == 0
                left = col == d
                m_new = jnp.where(top | left, bg, m_new)
                h_new = jnp.where(top, jnp.where(d == 0, NEG_INF, bg),
                                  jnp.where(left, NEG_INF, h_new))
                v_new = jnp.where(left, jnp.where(d == 0, NEG_INF, bg),
                                  jnp.where(top, NEG_INF, v_new))

                dirs_ref[d] = (
                    mdir | (hdir << 2) | (vdir << 4)).astype(jnp.int8)

                sel = (col == la) & (d == la + lb)
                f0 = jnp.where(sel, m_new, f0)
                f1 = jnp.where(sel, h_new, f1)
                f2 = jnp.where(sel, v_new, f2)

                m2, h2, v2 = m1, h1, v1
                m1, h1, v1 = m_new, h_new, v_new
            return (m1, h1, v1, m2, h2, v2, f0, f1, f2)

        st = jax.lax.fori_loop(
            0, num_blocks, body, (neg,) * 6 + (neg, neg, neg))
        finals_ref[0] = jnp.max(st[6], axis=1, keepdims=True)
        finals_ref[1] = jnp.max(st[7], axis=1, keepdims=True)
        finals_ref[2] = jnp.max(st[8], axis=1, keepdims=True)

    return _kernel


def _make_tb_resident_kernel(num_steps: int, bb: int, wp: int):
    """Traceback over VMEM-resident dirs + seq-score blocks (see
    :func:`_make_resident_kernel`)."""

    def _kernel(params_ref, la_ref, lb_ref, finals_ref, dirs_ref, sseq_ref,
                partner_ref, scalars_ref):
        go = params_ref[0, 0]
        ge = params_ref[0, 1]
        col = jax.lax.broadcasted_iota(I32, (bb, wp), dimension=1)
        la = la_ref[...]
        lb = lb_ref[...]

        fm = finals_ref[0]
        fh = finals_ref[1]
        fv = finals_ref[2]
        upper = jnp.maximum(jnp.maximum(fm, fh), fv)
        state0 = jnp.where(fm == upper, MAT,
                           jnp.where(fh == upper, HOR, VER))
        zero = jnp.zeros((bb, 1), I32)

        def body(k, st):
            cur_d, cur_i, state, gap, cnt, seq, partner = st
            d = num_steps - 1 - k
            cur_j = cur_d - cur_i
            act = (cur_d == d) & ((cur_i > 0) | (cur_j > 0))
            st_eff = jnp.where(cur_i == 0, HOR,
                               jnp.where(cur_j == 0, VER, state))
            onehot = col == cur_i
            picked = jnp.sum(
                jnp.where(onehot[None],
                          jnp.stack([dirs_ref[d].astype(I32),
                                     sseq_ref[d]]),
                          0), axis=2, keepdims=True)   # [2, BB, 1]
            code = picked[0]
            mdir = code & 3
            hdir = (code >> 2) & 3
            vdir = (code >> 4) & 3
            pred = jnp.where(st_eff == MAT, mdir,
                             jnp.where(st_eff == HOR, hdir, vdir))

            is_m = (st_eff == MAT) & act
            rec = (col == cur_i - 1) & is_m
            partner = jnp.where(rec, cur_j - 1, partner)
            cnt = cnt + is_m.astype(I32)
            seq = seq + jnp.where(is_m, picked[1], 0)

            gap_h = jnp.where(pred == HOR, ge, go)
            gap_v = jnp.where(pred == VER, ge, go)
            gap = gap + jnp.where(act & (st_eff == HOR), gap_h, 0) \
                      + jnp.where(act & (st_eff == VER), gap_v, 0)

            i_next = jnp.where(st_eff != HOR, cur_i - 1, cur_i)
            d_next = cur_d - 1 - (st_eff == MAT).astype(I32)
            cur_i = jnp.where(act, i_next, cur_i)
            cur_d = jnp.where(act, d_next, cur_d)
            state = jnp.where(act, pred, state)
            return (cur_d, cur_i, state, gap, cnt, seq, partner)

        st = jax.lax.fori_loop(
            0, num_steps, body,
            (la + lb, la, state0, zero, zero, zero,
             jnp.full((bb, wp), -1, I32)))
        _cd, _ci, _st, gap, cnt, seq, partner = st
        partner_ref[...] = partner
        scalars_ref[0] = upper
        scalars_ref[1] = gap
        scalars_ref[2] = cnt
        scalars_ref[3] = seq

    return _kernel


def _use_stream() -> bool:
    """In-kernel diagonal streaming (LARA_DP_GRID=1 forces the legacy
    grid-stepped kernels)."""
    import os

    return not os.environ.get("LARA_DP_GRID")


@functools.partial(jax.jit, static_argnames=("block_b", "dchunk", "interpret"))
def gotoh_scan_pallas(skewed, la, lb, go, ge, block_b: int = 64,
                      dchunk: int = 8, interpret: bool = False):
    """Wavefront DP over pre-skewed scores.

    skewed: [D, B, W] int32 diagonal-major cell scores (gotoh.skew_scores).
    Returns (final_m, final_h, final_v [B] int32, dirs [Dp, B, W] int8 with
    Dp = D rounded up to ``dchunk``; rows beyond D are padding).
    """
    num_diag, b, width = skewed.shape
    bb = min(block_b, b)
    wp = _round_up(width, 128)
    bp = _round_up(b, bb)
    dp = _round_up(num_diag, dchunk)
    if wp != width or bp != b or dp != num_diag:
        skewed = jnp.pad(
            skewed, ((0, dp - num_diag), (0, bp - b), (0, wp - width)),
            constant_values=NEG_INF,
        )
    la2 = jnp.zeros((bp, 1), I32).at[:b, 0].set(la.astype(I32))
    lb2 = jnp.zeros((bp, 1), I32).at[:b, 0].set(lb.astype(I32))
    params = jnp.array([[go, ge]], I32)

    grid = (bp // bb, dp // dchunk)
    dirs, finals = pl.pallas_call(
        _make_kernel(dchunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2), lambda g, d: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((dchunk, bb, wp), lambda g, d: (d, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 1), lambda g, d: (g, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, 1), lambda g, d: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((dchunk, bb, wp), lambda g, d: (d, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, bb, 1), lambda g, d: (0, g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((dp, bp, wp), jnp.int8),
            jax.ShapeDtypeStruct((3, bp, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((6, bb, wp), jnp.int32),
            pltpu.VMEM((3, bb, wp), jnp.int32),
        ],
        interpret=interpret,
    )(params, skewed, la2, lb2)

    final_m = finals[0, :b, 0]
    final_h = finals[1, :b, 0]
    final_v = finals[2, :b, 0]
    return final_m, final_h, final_v, dirs[:, :b, :width]


def align_plan(b: int, la_max: int, lb_max: int, block_b: int = 64,
               dchunk: int = 8):
    """Static padding plan shared by the wavefront kernels and callers that
    pre-skew loop-invariant streams: (bb, bp, wp, dp, num_diag, dchunk).

    Invariant (TPU DMA tiling): when the plan is multi-block (bp > bb) the
    stream kernels DMA-slice the batch dim of the int8 dirs tensor at
    offsets of ``bb``, which must land on 32-sublane int8 tile boundaries —
    so bb must be >= 32 (a power-of-two >= 32 is always a multiple of 32).
    When the VMEM budget cannot fit 32 lanes at the requested dchunk,
    ``dchunk`` is halved until they fit (dchunk only amortizes per-block
    DMA overhead; 8..128 measured within noise at 16S scale, PROFILE.md) —
    callers MUST use the returned dchunk, not the one they passed in.
    """
    num_diag = la_max + lb_max + 1
    wp = _round_up(la_max + 1, 128)
    while True:
        # stream-kernel VMEM per lane: double-buffered skewed blocks
        # (2*dchunk*wp*4B) + dirs blocks (2*dchunk*wp*1B) + ~12 wavefront/
        # state rows (48B*wp); budget 10 MB of the 16 MB scoped limit
        vmem_cap = max(1, (10 * 1024 * 1024) // (wp * (10 * dchunk + 48)))
        eff = min(block_b, 1 << (vmem_cap.bit_length() - 1))
        # 8-lane floor: per the round-4 layout experiment a [8, W] wavefront
        # step costs the same as [1, W] (the VPU processes 8 sublanes either
        # way), so padding tiny batches to 8 lanes is compute-free
        bb = max(8, min(eff, b))
        bp = _round_up(b, bb)
        if bp == bb or bb >= 32 or dchunk <= 1:
            break
        dchunk = max(1, dchunk // 2)
    if bp > bb and bb < 32:
        # dchunk=1 still could not fund 32 lanes (only reachable for pairs
        # beyond ~5900 nt with batches > 32): accept exceeding the 10 MB
        # soft budget rather than a misaligned DMA (hard limit is 16 MB)
        bb = 32
        bp = _round_up(b, bb)
    dp = _round_up(num_diag, dchunk)
    # ---- VMEM-resident mode (LARA_DP_RESIDENT=1, experiments only): keep
    # skewed scores (4B) + dirs (1B) for ALL diagonals VMEM-resident and
    # skip the DMA streaming.  Measured round 5 (e2e iteration slope, bench
    # tRNA shape): the VMEM budget caps the resident block at 32 lanes, so
    # the batch runs in 4 sequential blocks and the extra block-visits cost
    # MORE than the DMA start/wait latency they save -- 0.74 (dchunk 8) /
    # 0.64 (dchunk 32) vs 0.58 ms/batch-iter for the stream kernels.  The
    # DMA-latency hypothesis for the production-vs-step-floor gap is
    # therefore falsified; streaming stays the default.
    import os

    resident = False
    if os.environ.get("LARA_DP_RESIDENT"):
        # BlockSpec operands are double-buffered across grid steps, so the
        # per-block budget is half the scoped VMEM minus state headroom
        cap = (11 * 1024 * 1024 // 2) // (wp * (5 * dp + 48))
        if cap >= 1:
            bb_r = 1 << (cap.bit_length() - 1)
            bb_r = min(bb_r, max(8, 1 << (max(block_b, 1).bit_length() - 1)))
            if bb_r >= 32 or _round_up(b, 8) <= bb_r:
                resident = True
                bb = max(8, min(bb_r, b))
                bp = _round_up(b, bb)
    return bb, bp, wp, dp, num_diag, dchunk, resident


def prepare_skewed_seq(seq_scores, la_max: int, lb_max: int,
                       block_b: int = 64, dchunk: int = 8):
    """Skew + pad a loop-invariant [B, LA, LB] stream (e.g. seq scores) into
    the traceback kernel's [dp, bp, wp] layout.  Hoist this OUT of iteration
    loops: XLA does not reliably hoist the skew gather at 16S scale (+11
    ms/iter measured), and it is loop-invariant by construction."""
    from lara_tpu.ops import gotoh

    b = seq_scores.shape[0]
    bb, bp, wp, dp, num_diag, dchunk, _res = align_plan(
        b, la_max, lb_max, block_b, dchunk)
    sseq = gotoh.skew_scores(seq_scores, 0)
    return jnp.pad(
        sseq, ((0, dp - num_diag), (0, bp - b), (0, wp - (la_max + 1))))


@functools.partial(
    jax.jit, static_argnames=("la_max", "lb_max", "block_b", "dchunk",
                              "interpret", "emit_lines")
)
def align_pssm_batch_pallas(pssm, la, lb, go, ge, la_max: int, lb_max: int,
                            block_b: int = 64, dchunk: int = 8,
                            interpret: bool = False, emit_lines: bool = True,
                            seq_scores=None, seq_scores_skewed=None,
                            pssm_skewed=None):
    """Pallas-backed drop-in for :func:`lara_tpu.ops.gotoh.align_pssm_batch`:
    forward wavefront kernel -> reverse-sweep traceback kernel -> line-list
    compaction (XLA sort).  Padded lanes have la = lb = 0 and trace nothing.

    ``emit_lines=False`` skips the ordered line-list compaction (the solver
    consumes the dense partner map directly); ``lines`` is then empty.
    ``seq_scores`` ([B, LA, LB] int32, loop-invariant) makes the traceback
    accumulate the per-line sequence-score sum in-kernel (``seq_part``);
    without it the traceback streams zeros and ``seq_part`` is 0.
    ``seq_scores_skewed`` is the pre-skewed/padded [dp, bp, wp] form from
    :func:`prepare_skewed_seq` -- pass it from iteration loops so the skew
    gather is not re-run per call.
    ``pssm_skewed``: the DP input already in the padded [dp, bp, wp] skewed
    layout (then ``pssm`` may be None) -- iteration loops build it with one
    scatter-max onto a hoisted base instead of a per-iteration skew gather.
    """
    from lara_tpu.ops import gotoh

    b = la.shape[0]
    lcap = min(la_max, lb_max)
    num_diag = la_max + lb_max + 1
    # VMEM-aware batch blocking shared with prepare_skewed_seq callers;
    # align_plan may reduce dchunk to keep multi-block DMA slices tile-
    # aligned — the returned dchunk shadows the argument from here on
    bb, bp, wp, dp, _, dchunk, resident = align_plan(
        b, la_max, lb_max, block_b, dchunk)
    if pssm_skewed is not None:
        skewed = pssm_skewed
        assert skewed.shape == (dp, bp, wp), (skewed.shape, (dp, bp, wp))
    else:
        skewed = gotoh.skew_scores(pssm, PSSM_INIT)
        skewed = jnp.pad(
            skewed,
            ((0, dp - num_diag), (0, bp - b), (0, wp - (la_max + 1))),
            constant_values=NEG_INF,
        )
    la_p = jnp.zeros((bp, 1), I32).at[:b, 0].set(la.astype(I32))
    lb_p = jnp.zeros((bp, 1), I32).at[:b, 0].set(lb.astype(I32))
    params = jnp.array([[go, ge]], I32)
    num_blocks = dp // dchunk
    grid = (bp // bb, num_blocks)
    stream = _use_stream()

    if stream and resident:
        lane_spec = pl.BlockSpec((bb, 1), lambda g: (g, 0),
                                 memory_space=pltpu.VMEM)
        finals, dirs = pl.pallas_call(
            _make_resident_kernel(dchunk, num_blocks, bb, wp),
            grid=(bp // bb,),
            in_specs=[
                pl.BlockSpec((1, 2), lambda g: (0, 0),
                             memory_space=pltpu.SMEM),
                lane_spec,
                lane_spec,
                pl.BlockSpec((dp, bb, wp), lambda g: (0, g, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((3, bb, 1), lambda g: (0, g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((dp, bb, wp), lambda g: (0, g, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((3, bp, 1), jnp.int32),
                jax.ShapeDtypeStruct((dp, bp, wp), jnp.int8),
            ],
            interpret=interpret,
        )(params, la_p, lb_p, skewed)
    elif stream:
        lane_spec = pl.BlockSpec((bb, 1), lambda g: (g, 0),
                                 memory_space=pltpu.VMEM)
        finals, dirs = pl.pallas_call(
            _make_stream_kernel(dchunk, num_blocks, bb, wp,
                                single_block=(bp == bb)),
            grid=(bp // bb,),
            in_specs=[
                pl.BlockSpec((1, 2), lambda g: (0, 0),
                             memory_space=pltpu.SMEM),
                lane_spec,
                lane_spec,
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec((3, bb, 1), lambda g: (0, g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((3, bp, 1), jnp.int32),
                jax.ShapeDtypeStruct((dp, bp, wp), jnp.int8),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, dchunk, bb, wp), jnp.int32),
                pltpu.VMEM((2, dchunk, bb, wp), jnp.int8),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(params, la_p, lb_p, skewed)
    else:
        dirs, finals = pl.pallas_call(
            _make_kernel(dchunk),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 2), lambda g, d: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((dchunk, bb, wp), lambda g, d: (d, g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb, 1), lambda g, d: (g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bb, 1), lambda g, d: (g, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((dchunk, bb, wp), lambda g, d: (d, g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, bb, 1), lambda g, d: (0, g, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((dp, bp, wp), jnp.int8),
                jax.ShapeDtypeStruct((3, bp, 1), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((6, bb, wp), jnp.int32),
                pltpu.VMEM((3, bb, wp), jnp.int32),
            ],
            interpret=interpret,
        )(params, skewed, la_p, lb_p)

    if seq_scores_skewed is not None:
        sseq = seq_scores_skewed
        assert sseq.shape == (dp, bp, wp), (sseq.shape, (dp, bp, wp))
        have_seq = True
    elif seq_scores is not None:
        sseq = gotoh.skew_scores(seq_scores, 0)
        sseq = jnp.pad(
            sseq,
            ((0, dp - num_diag), (0, bp - b), (0, wp - (la_max + 1))),
        )
        have_seq = True
    else:
        sseq = jnp.zeros((dp, bp, wp), I32)
        have_seq = False

    if stream and resident:
        lane_spec = pl.BlockSpec((bb, 1), lambda g: (g, 0),
                                 memory_space=pltpu.VMEM)
        partner, scalars = pl.pallas_call(
            _make_tb_resident_kernel(num_diag, bb, wp),
            grid=(bp // bb,),
            in_specs=[
                pl.BlockSpec((1, 2), lambda g: (0, 0),
                             memory_space=pltpu.SMEM),
                lane_spec,
                lane_spec,
                pl.BlockSpec((3, bb, 1), lambda g: (0, g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((dp, bb, wp), lambda g: (0, g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((dp, bb, wp), lambda g: (0, g, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((bb, wp), lambda g: (g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, bb, 1), lambda g: (0, g, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bp, wp), jnp.int32),
                jax.ShapeDtypeStruct((4, bp, 1), jnp.int32),
            ],
            interpret=interpret,
        )(params, la_p, lb_p, finals, dirs, sseq)
    elif stream:
        lane_spec = pl.BlockSpec((bb, 1), lambda g: (g, 0),
                                 memory_space=pltpu.VMEM)
        partner, scalars = pl.pallas_call(
            _make_tb_stream_kernel(dchunk, num_blocks, bb, wp,
                                   single_block=(bp == bb)),
            grid=(bp // bb,),
            in_specs=[
                pl.BlockSpec((1, 2), lambda g: (0, 0),
                             memory_space=pltpu.SMEM),
                lane_spec,
                lane_spec,
                pl.BlockSpec((3, bb, 1), lambda g: (0, g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec((bb, wp), lambda g: (g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, bb, 1), lambda g: (0, g, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bp, wp), jnp.int32),
                jax.ShapeDtypeStruct((4, bp, 1), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, dchunk, bb, wp), jnp.int8),
                pltpu.VMEM((2, dchunk, bb, wp), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=interpret,
        )(params, la_p, lb_p, finals, dirs, sseq)
    else:
        partner, scalars = pl.pallas_call(
            _make_traceback_kernel(dchunk, num_blocks),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 2), lambda g, t: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((dchunk, bb, wp),
                             lambda g, t: (num_blocks - 1 - t, g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((dchunk, bb, wp),
                             lambda g, t: (num_blocks - 1 - t, g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, bb, 1), lambda g, t: (0, g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bb, 1), lambda g, t: (g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bb, 1), lambda g, t: (g, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((bb, wp), lambda g, t: (g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((4, bb, 1), lambda g, t: (0, g, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bp, wp), jnp.int32),
                jax.ShapeDtypeStruct((4, bp, 1), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((8, bb, 1), jnp.int32),
                pltpu.VMEM((bb, wp), jnp.int32),
            ],
            interpret=interpret,
        )(params, dirs, sseq, finals, la_p, lb_p)

    partner = partner[:b, :la_max]  # partner[a] = b or -1, a ascending
    upper = scalars[0, :b, 0]
    gap_score = scalars[1, :b, 0]
    n_lines = scalars[2, :b, 0]
    seq_part = scalars[3, :b, 0] if have_seq else None
    if not emit_lines:
        lines = jnp.zeros((b, 0, 2), I32)
        return gotoh.Traceback(
            upper=upper, lines=lines, n_lines=n_lines, gap_score=gap_score,
            partner=partner, seq_part=seq_part,
        )
    # compact the dense partner map to an ordered line list
    valid = partner >= 0
    order = jnp.argsort(~valid, axis=1, stable=True)[:, :lcap]
    lines_a = jnp.take_along_axis(
        jnp.broadcast_to(jnp.arange(la_max, dtype=I32)[None, :], partner.shape),
        order, axis=1)
    lines_b = jnp.take_along_axis(partner, order, axis=1)
    k_idx = jnp.arange(lcap, dtype=I32)[None, :]
    keep = k_idx < n_lines[:, None]
    lines = jnp.stack(
        [jnp.where(keep, lines_a, -1), jnp.where(keep, lines_b, -1)], axis=-1
    )
    return gotoh.Traceback(
        upper=upper, lines=lines, n_lines=n_lines, gap_score=gap_score,
        partner=partner, seq_part=seq_part,
    )
