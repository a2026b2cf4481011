"""Measure the cost of the one-chunk-late convergence flag (verdict r3 #5).

``solve_batch`` reads the any-lane-active flag one chunk late so the
device->host flag transfer overlaps the next (already queued) dispatch
instead of serialising every chunk boundary (device_solver.py).  The cost
is one extra ``solve_batch_chunk`` dispatch per batch after all lanes have
converged -- but that dispatch's ``while_loop`` exits on its first cond
check (no active lanes), so the waste is launch + transfer overhead, NOT
125 iterations of compute.  This script measures both strategies on a
fast-converging batch (identical sequences: lanes converge in a few
iterations) and on the standard bench batch (no early convergence).

Run on the TPU:  python benchmark/profile_overrun.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def solve_sync(model, go, ge, sf0, la_max, lb_max, num_iterations,
               max_nondecr, lookahead, chunk, scan_steps, e_cap):
    """Synchronous-flag variant: read the flag every chunk boundary."""
    import jax.numpy as jnp

    from lara_tpu.solver import device_solver as ds

    b, _ = model.seq_score.shape
    d = model.dual_l.shape[1]
    carry = ds._init_carry(b, d, la_max, sf0, num_iterations)
    total = 0
    dispatches = 0
    while total < num_iterations:
        carry = ds.solve_batch_chunk(
            model, carry, go, ge, la_max, lb_max,
            min(chunk, num_iterations - total), max_nondecr, lookahead,
            scan_steps, e_cap)
        dispatches += 1
        total += chunk
        if total < num_iterations and not bool(jnp.any(carry.lane_active)):
            break
    return ds._result_of(carry), dispatches


def main():
    import jax

    import bench
    from lara_tpu.app import _apply_platform_env, enumerate_pairs
    from lara_tpu.params import Parameters
    from lara_tpu.solver import device_driver, device_solver

    _apply_platform_env()
    params = Parameters(in_file="<bench>")

    # Workload A: fast-converging (identical sequences, converge in ~2 iters)
    storeA = bench.make_family(n=16, length=72, seed=7)
    for r in storeA[1:]:
        r.sequence = storeA[0].sequence
        r.bpp_edges = list(storeA[0].bpp_edges)
    # Workload B: the standard bench family (most lanes run all 500 iters)
    storeB = bench.make_family(n=16, length=72, seed=7)

    orig_solve = device_solver.solve_batch
    captured = {}

    def capture_solve(model, go, ge, sf0, la_max, lb_max, num_iterations,
                      max_nondecr, lookahead, chunk=125, scan_steps=0,
                      e_cap=0):
        captured.update(model=model, go=go, ge=ge, sf0=sf0, la_max=la_max,
                        lb_max=lb_max, num_iterations=num_iterations,
                        max_nondecr=max_nondecr, lookahead=lookahead,
                        chunk=chunk, scan_steps=scan_steps, e_cap=e_cap)
        return orig_solve(model, go, ge, sf0, la_max, lb_max, num_iterations,
                          max_nondecr, lookahead, chunk, scan_steps, e_cap)

    for label, store in (("identical-seqs (fast converge)", storeA),
                         ("bench family (full depth)", storeB)):
        pairs = enumerate_pairs(store)
        device_solver.solve_batch = capture_solve
        try:
            list(device_driver.solve_all(store, pairs, params))  # warm+capture
        finally:
            device_solver.solve_batch = orig_solve
        m = captured

        def run(fn, reps=5):
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                res = fn()
                jax.block_until_ready(res[0] if isinstance(res, tuple)
                                      else res.best_lower)
                ts.append(time.perf_counter() - t0)
            return min(ts)

        t_pipe = run(lambda: orig_solve(
            m["model"], m["go"], m["ge"], m["sf0"], m["la_max"], m["lb_max"],
            m["num_iterations"], m["max_nondecr"], m["lookahead"], m["chunk"],
            m["scan_steps"], m["e_cap"]))
        t_sync = run(lambda: solve_sync(
            m["model"], m["go"], m["ge"], m["sf0"], m["la_max"], m["lb_max"],
            m["num_iterations"], m["max_nondecr"], m["lookahead"], m["chunk"],
            m["scan_steps"], m["e_cap"])[0])
        _, n_sync = solve_sync(
            m["model"], m["go"], m["ge"], m["sf0"], m["la_max"], m["lb_max"],
            m["num_iterations"], m["max_nondecr"], m["lookahead"], m["chunk"],
            m["scan_steps"], m["e_cap"])
        print(f"{label}: pipelined {t_pipe*1e3:.1f} ms | "
              f"synchronous {t_sync*1e3:.1f} ms ({n_sync} chunks) | "
              f"delta {(t_pipe-t_sync)*1e3:+.1f} ms")


if __name__ == "__main__":
    main()
