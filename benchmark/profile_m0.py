"""Measure -m 0 (exact MWM, hybrid backend) vs -m 5 (fused greedy) on the
bench workload.  Records the throughput cost of exact matching -- the only
batched path whose matching runs on the host per iteration
(``matching.hpp:201-238`` parity).  Results go into benchmark/RESULTS.md.
"""
import sys
import time

sys.path.insert(0, ".")


def run(params, store, pairs, label):
    from lara_tpu.solver import device_driver

    warm = list(device_driver.solve_all(store, pairs, params))
    assert len(warm) == len(pairs)
    t0 = time.perf_counter()
    res = list(device_driver.solve_all(store, pairs, params))
    el = time.perf_counter() - t0
    iters = sum(r.iterations for r in res)
    print(f"{label:28s} {len(pairs)/el:8.2f} al/s   "
          f"({el:.2f}s, {iters} lane-iterations)", flush=True)
    return res


def main():
    import bench
    from lara_tpu.app import _apply_platform_env, enumerate_pairs
    from lara_tpu.params import Parameters

    _apply_platform_env()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    store = bench.make_family(n=n)
    pairs = enumerate_pairs(store)
    print(f"{len(pairs)} tRNA-scale pairs", flush=True)

    res5 = run(Parameters(in_file="<bench>", matching=5), store, pairs, "-m 5 (fused greedy)")
    res0 = run(Parameters(in_file="<bench>", matching=0), store, pairs, "-m 0 (hybrid exact MWM)")

    # exact matching gives a >= greedy lower bound per iteration; converged
    # scores may differ but must stay plausible -- report the comparison
    same = sum(1 for a, b in zip(res5, res0) if a.columns == b.columns)
    print(f"identical column sets: {same}/{len(pairs)} "
          f"(differences expected: the matching backend changes the primal)")


if __name__ == "__main__":
    main()
