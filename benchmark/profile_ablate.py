"""Ablation timing of the real fused chunk: re-runs ``solve_batch_chunk``'s
body with individual stages stubbed out (semantics intentionally broken --
perf attribution only).  Used for kernel-level optimization work; not part
of the test suite.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "benchmark")


def run_variant(name, batch, params, go, ge, la_max, lb_max, bp, dcap,
                no_match=False, no_revsort=False, no_pssm_sort=False,
                no_align=False, no_members=False, no_pssm_matmul=False,
                no_seqpart=False, no_consistent=False, no_carrydaq=False,
                dcap_override=None, e_cap=1024):
    import functools

    import jax
    import jax.numpy as jnp

    from lara_tpu.solver import device_solver as ds
    from lara_tpu.solver.matching_device import greedy_matching_queue
    from lara_tpu.types import PSSM_INIT

    I32 = jnp.int32
    NEG_INF = ds.NEG_INF
    if dcap_override is not None and dcap_override < dcap:
        d2 = dcap_override
        batch = ds.BatchModel(
            seq_score=batch.seq_score, active=batch.active,
            dual_l=batch.dual_l[:, :d2], dual_m=batch.dual_m[:, :d2],
            sscore=batch.sscore[:, :d2],
            rev=jnp.minimum(batch.rev[:, :d2], d2 - 1),
            dvalid=batch.dvalid[:, :d2], qrank=batch.qrank[:, :d2],
            la=batch.la, lb=batch.lb)
        dcap = d2
    model = batch
    b, ne = model.seq_score.shape
    d = dcap
    steps = 4
    max_nondecr = int(params.max_nondecr_iterations)
    lookahead = int(params.matching)
    go = I32(go)
    ge = I32(ge)
    lane = jnp.arange(b, dtype=I32)

    @functools.partial(jax.jit, static_argnames=())
    def chunk(carry):
        same_masks = ds._same_segment_masks(model.dual_l, steps)
        iota_d = jnp.broadcast_to(jnp.arange(d, dtype=I32), (b, d))
        prev_l = jnp.concatenate(
            [jnp.full((b, 1), -1, I32), model.dual_l[:, :-1]], axis=1)
        is_start = model.dvalid & (model.dual_l != prev_l)
        n_starts = jnp.sum(is_start, axis=1).astype(I32)
        start_rank = jnp.cumsum(is_start.astype(I32), axis=1) - 1
        compact_key = jnp.where(is_start, start_rank, d + iota_d)
        _, cells_sorted = jax.lax.sort(
            (compact_key, model.dual_l), dimension=1, num_keys=1)
        iota_e = jnp.arange(e_cap, dtype=I32)[None, :]
        cells = jnp.where(iota_e < n_starts[:, None],
                          cells_sorted[:, :e_cap], ne)
        cell_a = cells // lb_max
        cell_b = cells - cell_a * lb_max
        cell_ok = cells < ne
        rowhot = ((cell_a[:, None, :] == jnp.arange(la_max, dtype=I32)[None, :, None])
                  & cell_ok[:, None, :]).astype(jnp.int8)
        colhot = ((cell_b[:, :, None] == jnp.arange(lb_max, dtype=I32)[None, None, :])
                  & cell_ok[:, :, None]).astype(jnp.int8)
        slot_base = (jnp.arange(la_max, dtype=I32) * lb_max)[None, :]
        cand_base = (model.dvalid & (model.dual_l < model.dual_m)).astype(I32)
        _, lq_s, mq_s, wq_s, candq_base = jax.lax.sort(
            (model.qrank, model.dual_l, model.dual_m, 2 * model.sscore,
             cand_base), dimension=1, num_keys=1)
        cw = max(1, d // 2)
        ckey = jnp.where(candq_base != 0, iota_d, d + iota_d)
        _, lq_c, mq_c, wq_c = jax.lax.sort(
            (ckey, lq_s, mq_s, wq_s), dimension=1, num_keys=1)
        lq_c = lq_c[:, :cw]
        mq_c = mq_c[:, :cw]
        wq_c = wq_c[:, :cw]
        nc_base = jnp.sum(candq_base, axis=1).astype(I32)
        iota_cw = jnp.arange(cw, dtype=I32)[None, :]

        def body(state):
            steps_done, c = state
            act = c.lane_active
            dual_at_queue = c.dual_at_queue if no_carrydaq else jnp.where(act[:, None], c.dual, c.dual_at_queue)
            profits = model.sscore + c.dual
            masked = jnp.where(model.dvalid, profits, NEG_INF)
            run_p, run_idx = ds._run_top(masked, iota_d, same_masks,
                                         NEG_INF, I32(d))
            is_top = model.dvalid & (profits == run_p)
            bonus = jnp.maximum(run_p, 0)
            if no_pssm_sort:
                vc = bonus[:, :e_cap]
            else:
                _, vc = jax.lax.sort(
                    (compact_key, bonus), dimension=1, num_keys=1)
                vc = vc[:, :e_cap]
            if no_pssm_matmul:
                placed = jnp.zeros((b, ne), I32) + vc[:, :1]
            else:
                colval = jnp.concatenate(
                    [colhot * ((vc >> s) & 0x7F).astype(jnp.int8)[:, :, None]
                     for s in (28, 21, 14, 7, 0)], axis=2)
                out = jnp.matmul(rowhot, colval, preferred_element_type=I32)
                placed = (out[:, :, :lb_max] << 28) \
                    | (out[:, :, lb_max:2 * lb_max] << 21) \
                    | (out[:, :, 2 * lb_max:3 * lb_max] << 14) \
                    | (out[:, :, 3 * lb_max:4 * lb_max] << 7) \
                    | out[:, :, 4 * lb_max:]
            placed = placed.reshape(b, ne)
            pssm = jnp.where(
                model.active, model.seq_score + placed,
                I32(PSSM_INIT)).reshape(b, la_max, lb_max)
            if no_align:
                partner = jnp.where(
                    jnp.arange(la_max, dtype=I32)[None, :] < model.lb[:, None],
                    jnp.arange(la_max, dtype=I32)[None, :], -1)
                upper = jnp.sum(pssm[:, 0, :], axis=1)
                gap_score = upper * 0
                n_lines = jnp.sum((partner >= 0).astype(I32), axis=1)
            else:
                tb = ds._align(pssm, model.la, model.lb, go, ge,
                               la_max, lb_max)
                partner, upper = tb.partner, tb.upper
                gap_score, n_lines = tb.gap_score, tb.n_lines
            slot_valid = partner >= 0
            slot_edge = jnp.where(slot_valid, slot_base + partner, ne)
            if no_seqpart:
                seq_part = jnp.sum(partner, axis=1)
            else:
                pmask = partner[:, :, None] == \
                    jnp.arange(lb_max, dtype=I32)[None, None, :]
                seq_part = jnp.sum(jnp.where(
                    pmask, model.seq_score.reshape(b, la_max, lb_max), 0),
                    axis=(1, 2))
            if no_members:
                l_in = model.dvalid
                l_in_q = jnp.ones((b, cw), bool)
                m_in_q = l_in_q
            else:
                l_in = jnp.any(
                    model.dual_l[:, :, None] == slot_edge[:, None, :], axis=2)
                l_in_q = jnp.any(
                    lq_c[:, :, None] == slot_edge[:, None, :], axis=2)
                m_in_q = jnp.any(
                    mq_c[:, :, None] == slot_edge[:, None, :], axis=2)
            pick = l_in & (run_p >= 0) & is_top
            if no_revsort:
                pick_rev = pick
            else:
                _, pick_rev = jax.lax.sort(
                    (model.rev, pick), dimension=1, num_keys=1)
            sg_pos = pick & ~pick_rev
            sg = sg_pos.astype(I32) - (pick_rev & ~pick).astype(I32)
            count = 2 * jnp.sum(sg_pos, axis=1).astype(I32)
            any_sg = count > 0
            if no_consistent:
                consistent_sum = jnp.sum(run_idx, axis=1)
                matched_cons_slot = slot_valid
            else:
                is_top_exact = model.dvalid & (iota_d == run_idx)
                tis_entry = (profits < 0) | ((profits == 0)
                                             & (model.dual_l < model.dual_m))
                contrib = is_top_exact & l_in & ~tis_entry
                consistent_sum = jnp.sum(jnp.where(contrib, model.sscore, 0),
                                         axis=1)
                matched_cons_slot = slot_valid & jnp.any(
                    contrib[:, :, None]
                    & ((model.dual_l[:, :, None] == slot_edge[:, None, :])
                       | (model.dual_m[:, :, None] == slot_edge[:, None, :])),
                    axis=1)
            if no_match:
                struct_part = consistent_sum
                used_slot = matched_cons_slot
            else:
                cand_q = (iota_cw < nc_base[:, None]) & l_in_q & m_in_q \
                    & any_sg[:, None] & act[:, None]
                match_res = greedy_matching_queue(
                    lq_c, mq_c, wq_c, cand_q, slot_edge, lookahead)
                struct_part = jnp.where(any_sg, match_res.score,
                                        consistent_sum)
                used_slot = match_res.used_slot
            lower = seq_part + struct_part + gap_score
            better = act & (lower > c.best_score)
            slot_matched = jnp.where(
                any_sg[:, None], used_slot, matched_cons_slot) & slot_valid
            best_score = jnp.where(better, lower, c.best_score)
            best_partner = jnp.where(better[:, None], partner, c.best_partner)
            best_nlines = jnp.where(better, n_lines, c.best_nlines)
            best_matched = jnp.where(better[:, None], slot_matched,
                                     c.best_matched)
            improved_u = act & (upper < c.best_upper)
            improved_l = act & (lower > c.best_lower)
            best_upper = jnp.where(improved_u, upper, c.best_upper)
            best_lower = jnp.where(improved_l, lower, c.best_lower)
            nondecr = jnp.where(improved_u | improved_l, 0, c.nondecr)
            halve = act & (nondecr >= max_nondecr)
            step_factor = jnp.where(halve, c.step_factor / jnp.float32(2.0),
                                    c.step_factor)
            nondecr = jnp.where(act, jnp.where(halve, 0, nondecr + 1),
                                c.nondecr)
            step = step_factor * (best_upper - best_lower).astype(jnp.float32) / \
                jnp.maximum(count, 1).astype(jnp.float32)
            upd = act[:, None] & (sg != 0)
            new_dual = (c.dual.astype(jnp.float32)
                        - step[:, None] * sg.astype(jnp.float32)).astype(I32)
            dual = jnp.where(upd, new_dual, c.dual)
            remaining = jnp.where(act, c.remaining - 1, c.remaining)
            # timing harness: fixed trip count -- broken-semantics variants
            # must not converge early or ms/iter is meaningless
            done_now = act & (remaining == 0)
            return steps_done + 1, ds._Carry(
                dual=dual, dual_at_queue=dual_at_queue,
                step_factor=step_factor, nondecr=nondecr,
                remaining=remaining, lane_active=act & ~done_now,
                best_lower=best_lower, best_upper=best_upper,
                best_score=best_score, best_partner=best_partner,
                best_nlines=best_nlines, best_matched=best_matched,
                iterations=c.iterations + act.astype(I32),
            )

        def cond(state):
            steps_done, c = state
            return (steps_done < 50) & jnp.any(c.lane_active)

        _, final = jax.lax.while_loop(cond, body, (I32(0), carry))
        return final

    import jax

    from lara_tpu.solver import device_solver as ds2

    carry = ds2._init_carry(bp, dcap, min(la_max, lb_max),
                            np.float32(params.step_size_factor), 10**9)
    c2 = chunk(carry)
    jax.block_until_ready(c2.dual)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        c3 = chunk(c2)
        jax.block_until_ready(c3.dual)
        times.append(time.perf_counter() - t0)
    print(f"{name:32s} {min(times)/50*1000:8.3f} ms/iter", flush=True)


def main():
    import sys as _sys

    from profile_chunk import build_batch

    scale = "16s" if "--16s" in _sys.argv else "trna"
    batch, params, go, ge, la_max, lb_max, bp, dcap = build_batch(scale)
    base = (batch, params, go, ge, la_max, lb_max, bp, dcap)
    # e_cap mirrors the production driver's choice per scale
    kw = dict(dcap_override=2048 if "--dcap2048" in _sys.argv else None,
              e_cap=2048 if scale == "16s" else 1024)
    run_variant("full (reimpl)", *base, **kw)
    run_variant("no matching kernel", *base, no_match=True, **kw)
    run_variant("no rev sort", *base, no_revsort=True, **kw)
    run_variant("no pssm sort", *base, no_pssm_sort=True, **kw)
    run_variant("no pssm matmul", *base, no_pssm_matmul=True, **kw)
    run_variant("no align", *base, no_align=True, **kw)
    run_variant("no membership compares", *base, no_members=True, **kw)
    run_variant("no seq_part", *base, no_seqpart=True, **kw)
    run_variant("no consistent", *base, no_consistent=True, **kw)
    run_variant("no dual_at_queue copy", *base, no_carrydaq=True, **kw)
    run_variant("no match+revsort+pssmsort", *base, no_match=True,
                no_revsort=True, no_pssm_sort=True, **kw)


if __name__ == "__main__":
    main()
