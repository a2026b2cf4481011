"""Hybrid backend (device DP + native C++ bookkeeping) vs. the scalar mirror."""

import numpy as np
import pytest

from lara_tpu.app import enumerate_pairs
from lara_tpu.io.records import RnaRecord
from lara_tpu.params import Parameters


def _native_or_skip():
    from lara_tpu.native import NativeBuildError, lagrange

    try:
        lagrange._load()
    except NativeBuildError as exc:
        pytest.skip(f"no native toolchain: {exc}")


def make_family(n=4, length=40, seed=3, conflicting=True):
    rng = np.random.default_rng(seed)
    base = "".join("ACGU"[c] for c in rng.integers(0, 4, length))
    stem = [(i, length - 1 - i, 4.0) for i in range(6)]
    other = [(i, length // 2 + i, 3.0) for i in range(4, 10)]
    records = []
    for k in range(n):
        seq = list(base)
        for _ in range(4):
            seq[int(rng.integers(0, length))] = "ACGU"[rng.integers(0, 4)]
        edges = stem + (other if (conflicting and k % 2) else [])
        records.append(
            RnaRecord(name=f"s{k}", sequence="".join(seq),
                      bpp_edges=[(i, j, w) for (i, j, w) in edges])
        )
    return records


@pytest.mark.parametrize("kwargs", [
    dict(),
    dict(library_score_min=0, library_score_max=100,
         library_score_is_linear=True),
    dict(matching=2),
    dict(matching=0),   # exact MWM (blossom) inside the iteration loop
    dict(matching=12),  # deep lookahead beyond the fused path's cap
    dict(num_iterations=7),
])
def test_hybrid_matches_reference_driver(kwargs):
    _native_or_skip()
    from lara_tpu.solver import hybrid_driver, reference_driver

    records = make_family()
    params = Parameters(in_file="<test>", **kwargs)
    pairs = enumerate_pairs(records)

    hybrid = {r.seq_indices: r for r in
              hybrid_driver.solve_all(records, pairs, params)}
    for (ia, ib) in pairs:
        ref = reference_driver.solve_pair(records[ia], records[ib], params,
                                          (ia, ib))
        got = hybrid[ref.seq_indices]
        assert got.columns == ref.columns, (ia, ib)
        assert got.score == ref.score, (ia, ib)
        assert got.best_upper == ref.best_upper, (ia, ib)
        assert got.best_lower == ref.best_lower, (ia, ib)
        assert got.iterations == ref.iterations, (ia, ib)


def test_hybrid_work_stealing_more_pairs_than_lanes():
    _native_or_skip()
    from lara_tpu.solver import hybrid_driver, reference_driver

    records = make_family(n=6)
    params = Parameters(in_file="<test>", num_iterations=30)
    pairs = enumerate_pairs(records)
    results = list(hybrid_driver.solve_all(records, pairs, params,
                                           max_lanes=3))
    assert len(results) == len(pairs)
    by_idx = {r.seq_indices: r for r in results}
    # spot check two pairs against the mirror
    for (ia, ib) in pairs[:2]:
        ref = reference_driver.solve_pair(records[ia], records[ib], params,
                                          (ia, ib))
        assert by_idx[ref.seq_indices].columns == ref.columns


def test_fused_is_default_backend(monkeypatch):
    _native_or_skip()
    from lara_tpu.solver import device_driver

    monkeypatch.delenv("LARA_SOLVER", raising=False)
    assert device_driver._hybrid_available() is False
    monkeypatch.setenv("LARA_SOLVER", "fused")
    assert device_driver._hybrid_available() is False
    monkeypatch.setenv("LARA_SOLVER", "hybrid")
    assert device_driver._hybrid_available() is True
