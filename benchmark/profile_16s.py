"""Profile the 16S-scale (B=1, ~1530 nt) solve at different wavefront
``dchunk`` widths.

Usage: python benchmark/profile_16s.py [iters] [dchunk ...]

Runs the full driver path (edge filter -> model build -> fused solve) on the
bench 16S pair with a truncated iteration budget and prints end-to-end
ms/iteration per dchunk.  Used to pick ``_align_dchunk``'s long-pair value
(VERDICT r2 #4); not part of the test suite.
"""
import os
import sys
import time

sys.path.insert(0, ".")


def run(iters: int, dchunk: int):
    os.environ["LARA_DCHUNK"] = str(dchunk)
    import bench
    from lara_tpu.app import _apply_platform_env, enumerate_pairs
    from lara_tpu.params import Parameters
    from lara_tpu.solver import device_driver
    from lara_tpu.utils import timing

    _apply_platform_env()
    params = Parameters(in_file="<bench>", num_iterations=iters)
    store = bench.make_long_family(n=2)
    pairs = enumerate_pairs(store)
    list(device_driver.solve_all(store, pairs, params))  # warm/compile
    timing.reset()
    t0 = time.perf_counter()
    res = list(device_driver.solve_all(store, pairs, params))
    el = time.perf_counter() - t0
    it = sum(r.iterations for r in res)
    print(f"dchunk={dchunk:4d}  {el:7.2f}s total  {1e3 * el / max(it, 1):7.2f} ms/iter"
          f"  ({it} iters)", flush=True)
    for name, secs in timing.snapshot().items():
        print(f"    {name:28s} {secs:7.3f}s", flush=True)
    return el


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    chunks = [int(a) for a in sys.argv[2:]] or [32]
    if len(chunks) > 1:
        # dchunk is read at trace time inside solve_batch_chunk, which is
        # cached on shapes only -- a second in-process run reuses the first
        # program.  One process per dchunk keeps the sweep honest.
        sys.exit("one dchunk per process: run LARA_DCHUNK=N python "
                 "benchmark/profile_16s.py <iters> N separately")
    run(iters, chunks[0])


if __name__ == "__main__":
    main()
