"""Microbenchmark the fused solver body stage by stage (bench-shaped input).

Each stage is timed as its own jitted 20-iteration lax.fori_loop (amortizes
dispatch) on the same shapes the real loop sees.  Prints ms/iter per stage.
Used for kernel-level optimization work; not part of the test suite.
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
    from lara_tpu.solver.matching_device import greedy_matching_compact
    from lara_tpu.ops import gotoh

    batch, params, go, ge, la_max, lb_max, bp, dcap = build_batch()
    I32 = jnp.int32
    NEG_INF = device_solver.NEG_INF
    ne = la_max * lb_max
    lcap = min(la_max, lb_max)
    model = batch
    b = bp
    d = dcap

    lane = jnp.arange(b, dtype=I32)
    batch_offset = (lane * ne)[:, None]

    dual = jnp.zeros((b, d), I32)
    profits = model.sscore + dual
    masked = jnp.where(model.dvalid, profits, NEG_INF)

    # representative lines: take the DP once
    flat_idx = (model.dual_l + batch_offset).reshape(-1)
    mpp = jnp.full((b * ne,), NEG_INF, I32).at[flat_idx].max(
        masked.reshape(-1)).reshape(b, ne)
    pssm = jnp.where(
        model.active, model.seq_score + jnp.maximum(mpp, 0),
        jnp.int32(device_solver.PSSM_INIT)).reshape(b, la_max, lb_max)
    tb = device_solver._align(pssm, model.la, model.lb, I32(go), I32(ge),
                              la_max, lb_max)
    k_idx = jnp.arange(lcap, dtype=I32)[None, :]
    line_valid = k_idx < tb.n_lines[:, None]
    line_edges = jnp.clip(tb.lines[:, :, 0] * lb_max + tb.lines[:, :, 1], 0, ne - 1)
    line_sel = jnp.where(line_valid, line_edges, ne)
    line_sel = jax.block_until_ready(line_sel)
    pssm = jax.block_until_ready(pssm)

    def timeit(name, fn, *args):
        f = jax.jit(lambda *a: jax.lax.fori_loop(
            0, 20, lambda i, c: (fn(*a, c), )[0], jnp.int32(0)))
        r = f(*args)
        jax.block_until_ready(r)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*args))
            times.append(time.perf_counter() - t0)
        print(f"{name:34s} {min(times)/20*1000:8.3f} ms/iter")

    def chk(x, c):
        return c + x.reshape(-1)[0].astype(jnp.int32)

    # 1. run max doubling scan
    def s_runmax(masked, c):
        mpp_l, m_top_l = device_solver._run_max_with_argmin(
            masked + c, jnp.where(model.dvalid, model.dual_m, ne),
            model.dual_l, NEG_INF, I32(ne))
        return chk(mpp_l, chk(m_top_l, c))
    timeit("run_max_with_argmin [B,D]", s_runmax, masked)

    # 2. scatter-max PSSM
    def s_scatter(masked, c):
        mpp = jnp.full((b * ne,), NEG_INF, I32).at[flat_idx].max(
            (masked + c).reshape(-1)).reshape(b, ne)
        return chk(mpp, c)
    timeit("PSSM scatter-max [B*NE]", s_scatter, masked)

    # 3. DP + traceback (pallas)
    def s_align(pssm, c):
        tb = device_solver._align(pssm + c, model.la, model.lb, I32(go),
                                  I32(ge), la_max, lb_max)
        return chk(tb.lines, chk(tb.upper, c))
    timeit("wavefront DP + traceback", s_align, pssm)

    # 4. line membership compares
    def s_member(line_sel, c):
        l_in = jnp.any(model.dual_l[:, :, None] == (line_sel + c)[:, None, :], axis=2)
        m_in = jnp.any(model.dual_m[:, :, None] == (line_sel + c)[:, None, :], axis=2)
        return chk(l_in, c) + chk(m_in, c)
    timeit("l_in/m_in membership [B,D,LCAP]", s_member, line_sel)

    # 5. rev-involution sort
    def s_sort(masked, c):
        pick = model.dvalid & ((masked + c) > 0)
        _, pick_rev = jax.lax.sort((model.rev, pick), dimension=1, num_keys=1)
        return chk(pick_rev, c)
    timeit("rev sort [B,D]", s_sort, masked)

    # 6. consistent-branch line reduces
    def s_consline(line_sel, c):
        mpp_line = jnp.take_along_axis(mpp, line_edges, axis=1)
        m_top_line = jnp.min(
            jnp.where(
                model.dvalid[:, None, :] &
                (model.dual_l[:, None, :] == (line_sel + c)[:, :, None]),
                model.dual_m[:, None, :], ne),
            axis=2)
        matched_m_line = jnp.any(
            model.dvalid[:, None, :] &
            (model.dual_m[:, None, :] == (line_sel + c)[:, :, None]),
            axis=2)
        return chk(m_top_line, c) + chk(matched_m_line, chk(mpp_line, c))
    timeit("consistent line reduces [B,LCAP,D]", s_consline, line_sel)

    # 7. greedy matching (compact)
    def s_match(line_sel, c):
        cand = model.dvalid & (model.dual_l < model.dual_m)
        res = greedy_matching_compact(
            2 * model.sscore, model.dual_l, model.dual_m, cand,
            line_sel + c, model.qrank, 5, ne)
        return chk(res.used_slot, chk(res.score, c))
    timeit("greedy matching compact", s_match, line_sel)


if __name__ == "__main__":
    main()
