"""Per-iteration cost of the fused mega path vs the XLA body (round 4).

Captures the real bench-batch model from the driver, then times:

* the XLA body (`solve_batch_chunk`) at pinned trip counts,
* the mega body (`solve_batch_chunk_mega`) at pinned trip counts,
* the DP pair in isolation (fori-loop amortized).

One config per process (benchmark/PROFILE.md measurement rules).
Run on the TPU:  python benchmark/profile_mega.py [--iters N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from lara_tpu.app import _apply_platform_env, enumerate_pairs
    from lara_tpu.params import Parameters
    from lara_tpu.solver import device_driver, device_solver

    _apply_platform_env()
    params = Parameters(in_file="<bench>")
    store = bench.make_family(n=16, length=72, seed=7)

    cap = {}
    orig = device_solver.solve_batch

    def capture(model, go, ge, sf0, la_max, lb_max, num_iterations,
                max_nondecr, lookahead, chunk=125, scan_steps=0, e_cap=0):
        cap.update(model=model, go=go, ge=ge, sf0=sf0, la_max=la_max,
                   lb_max=lb_max, max_nondecr=max_nondecr,
                   lookahead=lookahead, scan_steps=scan_steps, e_cap=e_cap,
                   num_iterations=num_iterations)
        return orig(model, go, ge, sf0, la_max, lb_max, num_iterations,
                    max_nondecr, lookahead, chunk, scan_steps, e_cap)

    device_solver.solve_batch = capture
    try:
        list(device_driver.solve_all(store, enumerate_pairs(store), params))
    finally:
        device_solver.solve_batch = orig
    m = cap["model"]
    b, ne = m.seq_score.shape
    d = m.dual_l.shape[1]
    print(f"batch: B={b} D={d} NE={ne} la={cap['la_max']} "
          f"scan_steps={cap['scan_steps']} e_cap={cap['e_cap']}")

    n_it = args.iters

    def timed(label, fn):
        fn()  # compile
        best = None
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            t = time.perf_counter() - t0
            best = t if best is None else min(best, t)
        print(f"{label}: {best * 1e3:.1f} ms total, "
              f"{best / n_it * 1e3:.3f} ms/iter")
        return best

    def fresh_carry():
        return device_solver._init_carry(
            b, d, cap["la_max"], cap["sf0"], 10 ** 9)

    def run_xla():
        c = device_solver.solve_batch_chunk(
            m, fresh_carry(), cap["go"], cap["ge"], cap["la_max"],
            cap["lb_max"], n_it, cap["max_nondecr"], cap["lookahead"],
            cap["scan_steps"], cap["e_cap"])
        return c.best_lower

    def run_mega():
        c = device_solver.solve_batch_chunk_mega(
            m, fresh_carry(), cap["go"], cap["ge"], cap["la_max"],
            cap["lb_max"], n_it, cap["max_nondecr"], cap["lookahead"],
            cap["scan_steps"])
        return c.best_lower

    t_xla = timed("XLA body", run_xla)
    t_mega = timed("mega body", run_mega)
    print(f"speedup: {t_xla / t_mega:.2f}x")

    # ---- isolated stages (fori-amortized) ----
    from lara_tpu.ops.gotoh_pallas import (align_pssm_batch_pallas,
                                           prepare_skewed_seq)

    dchunk = device_solver._align_dchunk(cap["la_max"], cap["lb_max"])
    dual0 = jnp.zeros((b, d), jnp.int32)
    sseq = prepare_skewed_seq(m.seq_score.reshape(b, cap["la_max"],
                                                  cap["lb_max"]),
                              cap["la_max"], cap["lb_max"], block_b=128,
                              dchunk=dchunk)

    @jax.jit
    def dp_only(dual0):
        def body(_, dual):
            pssm = (m.seq_score + dual[:, :1]).reshape(
                b, cap["la_max"], cap["lb_max"])
            tb = align_pssm_batch_pallas(
                pssm, m.la, m.lb, cap["go"], cap["ge"], cap["la_max"],
                cap["lb_max"], emit_lines=False, block_b=128, dchunk=dchunk,
                seq_scores_skewed=sseq)
            return dual + tb.upper[:, None] % 3
        return jax.lax.fori_loop(0, n_it, body, dual0)

    timed("  DP fwd+tb+skew only", lambda: dp_only(dual0))


if __name__ == "__main__":
    main()
