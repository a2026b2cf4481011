"""Benchmark: pairwise structural alignments per second on one chip.

Workload: an all-pairs solve over a synthetic tRNA-scale RNA family
(~72 nt, cloverleaf-like fixed structures with point mutations) -- the shape
of BRAliBase data-set1 used by the reference's benchmark protocol
(``/root/reference/benchmark/benchmark_tutorial.ipynb``), which publishes no
numbers of its own (BASELINE.md).

Metric: completed pairwise Lagrangian solves per second (device backend,
compile excluded via warm-up).  ``vs_baseline``: speedup over the scalar
NumPy reference mirror on the same host (the only runnable baseline in this
environment; the reference binary cannot be built -- empty vendored
submodules).

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def make_family(n=12, length=72, seed=7):
    """Point-mutated tRNA family with McCaskill base-pair-probability edges
    (the shape of the reference's RNAfold-dotplot inputs, ``io.hpp:202-284``):
    soft, partially conflicting partner candidates exercise the full
    subgradient loop, unlike a fixed consensus structure."""
    import math

    from lara_tpu.io.records import MIN_PROB, RnaRecord
    from lara_tpu.solver import bpp_predict

    rng = np.random.default_rng(seed)
    base = list(
        "GCGGAUUUAGCUCAGUUGGGAGAGCGCCAGACUGAAGAUCUGGAGGUCCUGUGUUCGAUCCACAGAAUUCGC"
    )[:length]
    records = []
    for k in range(n):
        seq = list(base)
        for _ in range(int(rng.integers(2, 7))):
            seq[int(rng.integers(0, length))] = "ACGU"[rng.integers(0, 4)]
        sequence = "".join(seq)
        probs = bpp_predict.basepair_probabilities(sequence)
        # keep peaked pairs only (p > 0.05): the builtin flat-energy ensemble
        # over-generates weak pairs relative to RNAfold's Turner-model dot
        # plots (~1-3 partners/position above threshold), and the benchmark
        # should reflect the reference protocol's input shape
        edges = [
            (i, j, math.log(p / MIN_PROB))
            for (i, j), p in sorted(probs.items())
            if p > 0.05
        ]
        records.append(RnaRecord(name=f"trna{k}", sequence=sequence, bpp_edges=edges))
    return records


def main():
    from lara_tpu.app import _apply_platform_env, enumerate_pairs
    from lara_tpu.params import Parameters
    from lara_tpu.solver import device_driver, reference_driver

    _apply_platform_env()  # persistent compile cache
    params = Parameters(in_file="<bench>")
    store = make_family(n=16)
    pairs = enumerate_pairs(store)

    # --- device backend (includes host model build; excludes compile) ---
    warm = list(device_driver.solve_all(store, pairs, params))
    assert len(warm) == len(pairs), "warm-up produced wrong result count"
    t0 = time.perf_counter()
    results = list(device_driver.solve_all(store, pairs, params))
    device_time = time.perf_counter() - t0
    assert len(results) == len(pairs)
    device_rate = len(pairs) / device_time

    # --- scalar baseline on a subset ---
    n_base = min(4, len(pairs))
    t0 = time.perf_counter()
    base_results = [
        reference_driver.solve_pair(store[ia], store[ib], params, (ia, ib))
        for (ia, ib) in pairs[:n_base]
    ]
    base_time = time.perf_counter() - t0
    base_rate = n_base / base_time

    # correctness gate: the benchmark number is only valid if the device
    # backend matches the scalar mirror bit-for-bit on the common subset
    for res_d, res_r in zip(results[:n_base], base_results):
        if (res_d.seq_indices == res_r.seq_indices
                and res_d.columns != res_r.columns):
            print("FATAL: device/reference mismatch on "
                  f"{res_d.seq_indices}", file=sys.stderr)
            sys.exit(1)

    print(json.dumps({
        "metric": "pairwise structural alignments/s (tRNA-scale all-pairs)",
        "value": round(device_rate, 3),
        "unit": "alignments/s",
        "vs_baseline": round(device_rate / base_rate, 3),
    }))


if __name__ == "__main__":
    main()
