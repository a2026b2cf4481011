"""Measure the single-bucket split pipeline on the 16S 28-pair batch.

Usage: python benchmark/profile_split.py [iters] [reps]

Runs the bench 16S-scale 28-pair family through the full driver path twice
per rep -- LARA_SPLIT_SINGLE=0 (one 28-pair chunk, no overlap) vs the
default split (two 14-pair chunks through the cross-chunk pipeline) -- and
prints wall + phase tables.  Used to decide whether the split stays the
default for long-pair single-bucket workloads; not part of the test suite.
"""
import os
import sys
import time

sys.path.insert(0, ".")


def run(store, pairs, params, label):
    from lara_tpu.solver import device_driver
    from lara_tpu.utils import timing

    timing.reset()
    t0 = time.perf_counter()
    res = list(device_driver.solve_all(store, pairs, params))
    el = time.perf_counter() - t0
    it = sum(r.iterations for r in res)
    print(f"{label:12s} {el:7.2f}s wall  {len(res)} pairs  {it} iters "
          f"({1e3 * el / max(it, 1):6.2f} ms/iter)", flush=True)
    for name, secs in timing.snapshot().items():
        print(f"    {name:28s} {secs:7.3f}s", flush=True)
    return el, res


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    import bench
    from lara_tpu.app import _apply_platform_env, enumerate_pairs
    from lara_tpu.params import Parameters

    _apply_platform_env()
    params = Parameters(in_file="<bench>", num_iterations=iters)
    store = bench.make_long_family(n=8, length=1530, seed=47)
    pairs = enumerate_pairs(store)

    # warm both shape classes (bp=32 unsplit, bp=16 split)
    for split in ("0", ""):
        os.environ["LARA_SPLIT_SINGLE"] = split
        run(store, pairs, params, f"warm split={split or 'on'}")

    best = {}
    results = {}
    for rep in range(reps):
        for split in ("0", ""):
            os.environ["LARA_SPLIT_SINGLE"] = split
            el, res = run(store, pairs, params, f"rep{rep} split={split or 'on'}")
            key = split or "on"
            best[key] = min(best.get(key, 1e9), el)
            results[key] = res

    # parity: the split must not change any result
    a, b = results.get("0"), results.get("on")
    if a and b:
        same = all(
            ra.seq_indices == rb.seq_indices and ra.best_lower == rb.best_lower
            and ra.best_upper == rb.best_upper
            and ra.iterations == rb.iterations and ra.columns == rb.columns
            for ra, rb in zip(sorted(a, key=lambda r: r.seq_indices),
                              sorted(b, key=lambda r: r.seq_indices)))
        print(f"parity split-vs-unsplit: {'OK' if same else 'MISMATCH'}",
              flush=True)
        if not same:
            sys.exit(1)
    print(f"best: unsplit {best.get('0', float('nan')):.2f}s  "
          f"split {best.get('on', float('nan')):.2f}s", flush=True)


if __name__ == "__main__":
    main()
