"""Fused mega-kernel path vs the XLA iteration body: bit-identical.

The mega path (``device_solver.solve_batch_chunk_mega`` +
``mega_pallas``) re-derives the subgradient picks and the PSSM placement
by fundamentally different mechanisms (slot joins instead of the rev sort;
monotone butterfly routing instead of sort + one-hot matmul), so these
tests pin it against the XLA body end-to-end through the device driver
(Pallas interpret mode on CPU), plus a direct oracle test of the routing.
"""

import os

import numpy as np
import pytest

from lara_tpu.io.records import InputStorage
from lara_tpu.params import Parameters

from test_device_solver import write_family


def _solve(path, monkeypatch, mega: bool, **kw):
    import jax

    from lara_tpu.app import enumerate_pairs
    from lara_tpu.solver import device_driver

    # pin the driver to one device: the conftest's 8 virtual CPU devices
    # would route through the sharded (XLA solve_batch_traced) path, and the
    # mega path is the single-device fused chunk
    dev0 = jax.devices()[0]
    monkeypatch.setattr(jax, "local_devices", lambda *a, **k: [dev0])
    if mega:
        monkeypatch.setenv("LARA_MEGA_INTERPRET", "1")
        monkeypatch.delenv("LARA_NO_MEGA", raising=False)
    else:
        monkeypatch.setenv("LARA_NO_MEGA", "1")
        monkeypatch.delenv("LARA_MEGA_INTERPRET", raising=False)
    params = Parameters(in_file=path, **kw)
    store = InputStorage(in_file=path)
    pairs = enumerate_pairs(store)
    return list(device_driver.solve_all(store, pairs, params))


@pytest.mark.parametrize("seed,kw", [
    (3, {}),
    (11, {"num_iterations": 60}),
    (7, {"library_score_is_linear": True, "library_score_min": 0,
         "library_score_max": 100}),
])
def test_mega_matches_xla_body(tmp_path, monkeypatch, seed, kw):
    path = write_family(tmp_path, n=3, seed=seed)
    ref = _solve(path, monkeypatch, mega=False, **kw)
    got = _solve(path, monkeypatch, mega=True, **kw)
    assert len(ref) == len(got)
    for r, g in zip(ref, got):
        assert g.seq_indices == r.seq_indices
        assert g.iterations == r.iterations
        assert g.best_lower == r.best_lower
        assert g.best_upper == r.best_upper
        assert g.columns == r.columns
    if seed == 3:
        # pin the single-device driver (bit-packed upload + device-side
        # seq-score rebuild) against the scalar mirror: mega and the XLA
        # body share the upload path, so this catches a bug both would
        # reproduce identically
        from lara_tpu.io.records import InputStorage
        from lara_tpu.solver import reference_driver

        store = InputStorage(in_file=path)
        params = Parameters(in_file=path, **kw)
        for r in ref:
            ia, ib = r.seq_indices
            # mirror contract: rec_a is the longer sequence and seq_indices
            # name (rec_a, rec_b) in that order
            if len(store[ib].sequence) > len(store[ia].sequence):
                ia, ib = ib, ia
            mir = reference_driver.solve_pair(
                store[ia], store[ib], params, (ia, ib))
            assert r.columns == mir.columns
            assert r.best_lower == mir.best_lower
            assert r.best_upper == mir.best_upper


@pytest.mark.parametrize("la,lb,d", [
    (16, 24, 256),   # ew == ne
    (8, 16, 256),    # d > ne: the expansion workspace is wider than the grid
])
def test_route_controls_and_pssm_kernel_oracle(la, lb, d):
    """Random edge-major run structures through the butterfly routing vs a
    NumPy scatter oracle (placement semantics of lagrange.hpp:305-309)."""
    import jax.numpy as jnp

    from lara_tpu.solver import mega_pallas
    from lara_tpu.types import INFINITY, PSSM_INIT

    rng = np.random.default_rng(5)
    b = 3
    ne = la * lb
    neg = -int(INFINITY)
    dual_l = np.zeros((b, d), np.int32)
    dvalid = np.zeros((b, d), bool)
    sscore = rng.integers(-5000, 5000, (b, d)).astype(np.int32)
    dual = rng.integers(-3000, 3000, (b, d)).astype(np.int32)
    max_run = 1
    for k in range(b):
        n_entries = int(rng.integers(1, d))
        cells = np.sort(rng.choice(ne, size=rng.integers(1, min(ne, 96)),
                                   replace=False))
        runs = rng.integers(1, 9, size=len(cells))
        ids = np.repeat(cells, runs)[:n_entries]
        dual_l[k, :len(ids)] = ids
        dvalid[k, :len(ids)] = True
        dual[k, len(ids):] = 0
        if len(ids):
            max_run = max(max_run, int(np.unique(ids, return_counts=True)[1].max()))
    seq_score = rng.integers(-2000, 2000, (b, ne)).astype(np.int32)
    active = rng.random((b, ne)) < 0.7

    exp = np.full((b, ne), int(PSSM_INIT), np.int64)
    for k in range(b):
        mpp = np.full(ne, neg, np.int64)
        for i in range(d):
            if dvalid[k, i]:
                p = int(sscore[k, i]) + int(dual[k, i])
                mpp[dual_l[k, i]] = max(mpp[dual_l[k, i]], p)
        placed = np.where(mpp > neg, np.maximum(mpp, 0), 0)
        exp[k] = np.where(active[k], seq_score[k].astype(np.int64) + placed,
                          int(PSSM_INIT))

    ew = max(ne, d)
    cctrl, ectrl, covered = mega_pallas.build_route_controls(
        jnp.asarray(dual_l), jnp.asarray(dvalid), ne, ew)
    packed_d, packed_ne = mega_pallas.pack_pssm_inputs(
        jnp.asarray(dual_l), jnp.asarray(dvalid), cctrl, ectrl, covered,
        jnp.asarray(active), ne)
    steps = max(1, (max_run - 1).bit_length())
    pssm = mega_pallas.mega_pssm(
        packed_d, jnp.asarray(sscore), jnp.asarray(dual), packed_ne,
        jnp.asarray(seq_score), steps=steps, ne=ne, ew=ew, interpret=True)
    np.testing.assert_array_equal(np.asarray(pssm).astype(np.int64), exp)
