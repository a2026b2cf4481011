"""Microbenchmark the fused solver body stage by stage (bench-shaped input).

Each stage is timed as its own jitted 20-iteration lax.fori_loop (amortizes
dispatch) on the same shapes the real loop sees (B=128, D=3072, 96x96,
scan_steps=4, e_cap=1024).  Prints ms/iter per stage.  Used for kernel-level
optimization work; not part of the test suite.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "benchmark")


def main():
    import jax
    import jax.numpy as jnp

    from profile_chunk import build_batch
    from lara_tpu.solver import device_solver
    from lara_tpu.solver.matching_device import greedy_matching_queue
    from lara_tpu.types import PSSM_INIT

    batch, params, go, ge, la_max, lb_max, bp, dcap = build_batch()
    I32 = jnp.int32
    NEG_INF = device_solver.NEG_INF
    ne = la_max * lb_max
    model = batch
    b = bp
    d = dcap
    steps = 4
    e_cap = 1024
    lane = jnp.arange(b, dtype=I32)

    # ---- loop-invariant precomputation (mirrors solve_batch_chunk) ----
    same_masks = device_solver._same_segment_masks(model.dual_l, steps)
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
    cells = jnp.where(iota_e < n_starts[:, None], cells_sorted[:, :e_cap], ne)
    cell_a = cells // lb_max
    cell_b = cells - cell_a * lb_max
    cell_ok = cells < ne
    rowhot = ((cell_a[:, None, :] == jnp.arange(la_max, dtype=I32)[None, :, None])
              & cell_ok[:, None, :]).astype(jnp.float32)
    colhot = ((cell_b[:, :, None] == jnp.arange(lb_max, dtype=I32)[None, None, :])
              & cell_ok[:, :, None]).astype(jnp.float32)
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

    # representative per-iteration inputs: run one real body's worth
    dual = jnp.zeros((b, d), I32)
    profits = model.sscore + dual
    masked = jnp.where(model.dvalid, profits, NEG_INF)
    run_p, run_idx = device_solver._run_top(
        masked, iota_d, same_masks, NEG_INF, I32(d))
    bonus = jnp.maximum(run_p, 0)
    _, vc = jax.lax.sort((compact_key, bonus), dimension=1, num_keys=1)
    vc = vc[:, :e_cap]
    colval = jnp.concatenate(
        [colhot * (vc >> 16).astype(jnp.float32)[:, :, None],
         colhot * (vc & 0xFFFF).astype(jnp.float32)[:, :, None]], axis=2)
    out = jnp.matmul(rowhot, colval, precision=jax.lax.Precision.HIGHEST)
    placed = (out[:, :, :lb_max].astype(I32) << 16) | out[:, :, lb_max:].astype(I32)
    placed = placed.reshape(b, ne)
    pssm = jnp.where(model.active, model.seq_score + placed,
                     I32(PSSM_INIT)).reshape(b, la_max, lb_max)
    tb = device_solver._align(pssm, model.la, model.lb, I32(go), I32(ge),
                              la_max, lb_max)
    partner = jax.block_until_ready(tb.partner)
    slot_valid = partner >= 0
    slot_edge = jnp.where(slot_valid, slot_base + partner, ne)
    slot_edge = jax.block_until_ready(slot_edge)
    pssm = jax.block_until_ready(pssm)

    REPS = 200  # big enough to amortize the tunnel's per-dispatch RPC floor

    def timeit(name, fn, *args):
        f = jax.jit(lambda *a: jax.lax.fori_loop(
            0, REPS, lambda i, c: (fn(*a, c), )[0], jnp.int32(0)))
        r = f(*args)
        jax.block_until_ready(r)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*args))
            times.append(time.perf_counter() - t0)
        print(f"{name:40s} {min(times)/REPS*1000:8.3f} ms/iter", flush=True)

    def chk(x, c):
        return c + x.reshape(-1)[0].astype(jnp.int32)

    # 1. run-top capped segmented scan
    def s_runtop(masked, c):
        p, i = device_solver._run_top(masked + c, iota_d, same_masks,
                                      NEG_INF, I32(d))
        return chk(p, chk(i, c))
    timeit("run_top scan [B,D] x4", s_runtop, masked)

    # 2. PSSM: sort + MXU one-hot placement
    def s_pssm(run_p, c):
        bonus = jnp.maximum(run_p + c, 0)
        _, vc = jax.lax.sort((compact_key, bonus), dimension=1, num_keys=1)
        vc = vc[:, :e_cap]
        colval = jnp.concatenate(
            [colhot * (vc >> 16).astype(jnp.float32)[:, :, None],
             colhot * (vc & 0xFFFF).astype(jnp.float32)[:, :, None]], axis=2)
        out = jnp.matmul(rowhot, colval, precision=jax.lax.Precision.HIGHEST)
        placed = (out[:, :, :lb_max].astype(I32) << 16) \
            | out[:, :, lb_max:].astype(I32)
        return chk(placed, c)
    timeit("PSSM sort+MXU placement", s_pssm, run_p)

    # 3. wavefront DP + traceback (pallas)
    def s_align(pssm, c):
        tb = device_solver._align(pssm + c, model.la, model.lb, I32(go),
                                  I32(ge), la_max, lb_max)
        return chk(tb.partner, chk(tb.upper, c))
    timeit("wavefront DP + traceback", s_align, pssm)

    # 4. seq_part pmask reduce
    def s_seqpart(partner, c):
        pmask = (partner + c)[:, :, None] == \
            jnp.arange(lb_max, dtype=I32)[None, None, :]
        seq_part = jnp.sum(jnp.where(
            pmask, model.seq_score.reshape(b, la_max, lb_max), 0), axis=(1, 2))
        return chk(seq_part, c)
    timeit("seq_part pmask [B,LA,LB]", s_seqpart, partner)

    # 5. membership compares
    def s_member(slot_edge, c):
        se = slot_edge + c
        l_in = jnp.any(model.dual_l[:, :, None] == se[:, None, :], axis=2)
        return chk(l_in, c)
    timeit("l_in membership [B,D,S]", s_member, slot_edge)

    def s_member_q(slot_edge, c):
        se = slot_edge + c
        l_in_q = jnp.any(lq_c[:, :, None] == se[:, None, :], axis=2)
        m_in_q = jnp.any(mq_c[:, :, None] == se[:, None, :], axis=2)
        return chk(l_in_q, c) + chk(m_in_q, c)
    timeit("l_in_q+m_in_q membership [B,CW,S]", s_member_q, slot_edge)

    # 6. rev-involution sort
    def s_sort(masked, c):
        pick = model.dvalid & ((masked + c) > 0)
        _, pick_rev = jax.lax.sort((model.rev, pick), dimension=1, num_keys=1)
        return chk(pick_rev, c)
    timeit("rev sort [B,D]", s_sort, masked)

    # 7. consistent branch: entry-level + matched_cons_slot
    def s_cons(slot_edge, c):
        se = slot_edge + c
        l_in = jnp.any(model.dual_l[:, :, None] == se[:, None, :], axis=2)
        is_top_exact = model.dvalid & (iota_d == run_idx)
        tis_entry = (profits < 0) | ((profits == 0)
                                     & (model.dual_l < model.dual_m))
        contrib = is_top_exact & l_in & ~tis_entry
        consistent_sum = jnp.sum(jnp.where(contrib, model.sscore, 0), axis=1)
        matched_cons_slot = jnp.any(
            contrib[:, :, None]
            & ((model.dual_l[:, :, None] == se[:, None, :])
               | (model.dual_m[:, :, None] == se[:, None, :])), axis=1)
        return chk(matched_cons_slot, chk(consistent_sum, c))
    timeit("consistent branch (incl. l_in)", s_cons, slot_edge)

    # 8. matching kernel
    def s_match(slot_edge, c):
        se = slot_edge + c
        l_in_q = jnp.any(lq_c[:, :, None] == se[:, None, :], axis=2)
        m_in_q = jnp.any(mq_c[:, :, None] == se[:, None, :], axis=2)
        cand_q = (iota_cw < nc_base[:, None]) & l_in_q & m_in_q
        res = greedy_matching_queue(lq_c, mq_c, wq_c, cand_q, se, 5)
        return chk(res.used_slot, chk(res.score, c))
    timeit("matching kernel (incl. masks)", s_match, slot_edge)

    # 9. PSSM via scatter (the e_cap=0 fallback) -- is the sort+MXU worth it?
    start_dst = jnp.where(is_start, model.dual_l, ne)

    def s_pssm_scatter(run_p, c):
        placed = jnp.maximum(
            jnp.full((b, ne), NEG_INF, I32).at[
                lane[:, None], start_dst
            ].set(run_p + c, mode="drop", unique_indices=True), 0)
        return chk(placed, c)
    timeit("PSSM scatter fallback", s_pssm_scatter, run_p)

    # 10. rev sort with the key+payload packed into one int32
    rev_packed = model.rev * 2  # static; payload rides in bit 0

    def s_sort_packed(masked, c):
        pick = model.dvalid & ((masked + c) > 0)
        packed = rev_packed | pick.astype(I32)
        srt = jax.lax.sort(packed, dimension=1)
        return chk(srt & 1, c)
    timeit("rev sort packed 1-array", s_sort_packed, masked)

    # 11. PSSM compaction via precomputed static permutation + take_along
    perm = jnp.argsort(compact_key, axis=1)[:, :e_cap]

    def s_pssm_gather(run_p, c):
        vc = jnp.take_along_axis(jnp.maximum(run_p + c, 0), perm, axis=1)
        return chk(vc, c)
    timeit("PSSM compaction static gather", s_pssm_gather, run_p)

    # 12. full composite body (all stages chained, like the real loop)
    def s_full(dual0, c):
        dual = dual0 + c * 0
        profits = model.sscore + dual
        masked = jnp.where(model.dvalid, profits, NEG_INF)
        run_p, run_idx = device_solver._run_top(
            masked, iota_d, same_masks, NEG_INF, I32(d))
        bonus = jnp.maximum(run_p, 0)
        _, vc = jax.lax.sort((compact_key, bonus), dimension=1, num_keys=1)
        vc = vc[:, :e_cap]
        colval = jnp.concatenate(
            [colhot * (vc >> 16).astype(jnp.float32)[:, :, None],
             colhot * (vc & 0xFFFF).astype(jnp.float32)[:, :, None]], axis=2)
        out = jnp.matmul(rowhot, colval, precision=jax.lax.Precision.HIGHEST)
        placed = (out[:, :, :lb_max].astype(I32) << 16) \
            | out[:, :, lb_max:].astype(I32)
        pssm2 = jnp.where(model.active,
                          model.seq_score + placed.reshape(b, ne),
                          I32(PSSM_INIT)).reshape(b, la_max, lb_max)
        tb = device_solver._align(pssm2, model.la, model.lb, I32(go), I32(ge),
                                  la_max, lb_max)
        partner = tb.partner
        slot_valid = partner >= 0
        se = jnp.where(slot_valid, slot_base + partner, ne)
        pmask = partner[:, :, None] == \
            jnp.arange(lb_max, dtype=I32)[None, None, :]
        seq_part = jnp.sum(jnp.where(
            pmask, model.seq_score.reshape(b, la_max, lb_max), 0),
            axis=(1, 2))
        l_in = jnp.any(model.dual_l[:, :, None] == se[:, None, :], axis=2)
        l_in_q = jnp.any(lq_c[:, :, None] == se[:, None, :], axis=2)
        m_in_q = jnp.any(mq_c[:, :, None] == se[:, None, :], axis=2)
        pick = l_in & (run_p >= 0) & (model.dvalid & (profits == run_p))
        _, pick_rev = jax.lax.sort((model.rev, pick), dimension=1, num_keys=1)
        sg_pos = pick & ~pick_rev
        sg = sg_pos.astype(I32) - (pick_rev & ~pick).astype(I32)
        count = 2 * jnp.sum(sg_pos, axis=1).astype(I32)
        any_sg = count > 0
        is_top_exact = model.dvalid & (iota_d == run_idx)
        tis_entry = (profits < 0) | ((profits == 0)
                                     & (model.dual_l < model.dual_m))
        contrib = is_top_exact & l_in & ~tis_entry
        consistent_sum = jnp.sum(jnp.where(contrib, model.sscore, 0), axis=1)
        matched_cons_slot = slot_valid & jnp.any(
            contrib[:, :, None]
            & ((model.dual_l[:, :, None] == se[:, None, :])
               | (model.dual_m[:, :, None] == se[:, None, :])), axis=1)
        cand_q = (iota_cw < nc_base[:, None]) & l_in_q & m_in_q \
            & any_sg[:, None]
        res = greedy_matching_queue(lq_c, mq_c, wq_c, cand_q, se, 5)
        lower = seq_part + jnp.where(any_sg, res.score, consistent_sum) \
            + tb.gap_score
        new_dual = (dual.astype(jnp.float32)
                    - 0.5 * sg.astype(jnp.float32)).astype(I32)
        return chk(new_dual, chk(lower, chk(matched_cons_slot.astype(I32), c)))
    timeit("FULL body composite", s_full, dual)


if __name__ == "__main__":
    main()
