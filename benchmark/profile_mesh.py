"""Virtual-mesh scaling shape (round-4 verdict item 7).

Runs the SAME total pair workload through ``solve_batch_sharded`` on 1, 4
and 8 virtual CPU devices and records wall-clock, per-device lane counts
and pad-lane waste from the power-of-two batch rounding.  CPU-only (set
before jax import):

    python benchmark/profile_mesh.py

This gives shape-level evidence for the multi-chip scaling claim: the work
is embarrassingly parallel over lanes, so the interesting numbers are the
padding waste and the dispatch overhead per device, not FLOPs.  Absolute
CPU times do NOT transfer to TPU.
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    import jax

    import bench
    from lara_tpu.app import enumerate_pairs
    from lara_tpu.params import Parameters
    from lara_tpu.parallel import mesh as mesh_mod
    from lara_tpu.solver import device_driver, device_solver

    params = Parameters(in_file="<bench>", num_iterations=40)
    store = bench.make_family(n=10, length=48, seed=7)

    cap = {}
    orig = device_solver.solve_batch

    def capture(model, go, ge, sf0, la_max, lb_max, num_iterations,
                max_nondecr, lookahead, chunk=125, scan_steps=0, e_cap=0):
        cap.update(model=model, go=go, ge=ge, sf0=sf0, la_max=la_max,
                   lb_max=lb_max, num_iterations=num_iterations,
                   max_nondecr=max_nondecr, lookahead=lookahead,
                   scan_steps=scan_steps, e_cap=e_cap)
        return orig(model, go, ge, sf0, la_max, lb_max, num_iterations,
                    max_nondecr, lookahead, chunk, scan_steps, e_cap)

    device_solver.solve_batch = capture
    try:
        list(device_driver.solve_all(store, enumerate_pairs(store), params))
    finally:
        device_solver.solve_batch = orig
    m = cap["model"]
    b = m.seq_score.shape[0]
    n_real = len(enumerate_pairs(store))
    print(f"workload: {n_real} pairs, batch padded to B={b} lanes "
          f"({cap['la_max']}x{cap['lb_max']}, D={m.dual_l.shape[1]})")
    print("devices\tlanes/dev\tpad_lanes\twall_s\trel_speedup")

    from jax.sharding import Mesh

    all_dev = np.asarray(jax.devices())
    results = {}
    t1 = None
    for n_dev in (1, 4, 8):
        mesh = Mesh(all_dev[:n_dev], ("pairs",))
        pad = (-b) % n_dev

        def run():
            r = mesh_mod.solve_batch_sharded(
                m, cap["go"], cap["ge"], cap["sf0"], cap["la_max"],
                cap["lb_max"], cap["num_iterations"], cap["max_nondecr"],
                cap["lookahead"], mesh=mesh, scan_steps=cap["scan_steps"],
                e_cap=cap["e_cap"])
            jax.block_until_ready(r.best_lower)
            return r

        run()  # compile
        best = min(_timeit(run) for _ in range(3))
        ref = results.get(1, best)
        if n_dev == 1:
            t1 = best
        results[n_dev] = best
        print(f"{n_dev}\t{(b + pad) // n_dev}\t{pad}\t{best:.3f}\t"
              f"{t1 / best:.2f}x")


def _timeit(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
