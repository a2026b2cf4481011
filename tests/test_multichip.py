"""Sharded multi-device execution on the 8-way virtual CPU mesh."""

import numpy as np
import pytest

import jax


def test_virtual_mesh_available():
    assert len(jax.devices()) == 8


def test_sharded_solver_matches_single_device(tmp_path):
    from tests.test_device_solver import run_backend, write_family

    path = write_family(tmp_path, n=5, seed=2)
    # run_backend('device') auto-uses the sharded path with 8 CPU devices;
    # the reference backend is the single-threaded oracle
    ref = run_backend(path, "reference", num_iterations=50)
    dev = run_backend(path, "device", num_iterations=50)
    assert dev == ref


def test_sharded_solver_pads_odd_batches():
    from lara_tpu.parallel import mesh as mesh_mod
    from lara_tpu.solver import device_solver

    b, ne, d = 3, 16, 4  # 3 lanes on an 8-device mesh -> pad to 8
    la = lb = 4
    model = device_solver.BatchModel(
        seq_score=np.zeros((b, ne), np.int32),
        active=np.zeros((b, ne), bool),
        dual_l=np.zeros((b, d), np.int32),
        dual_m=np.zeros((b, d), np.int32),
        sscore=np.zeros((b, d), np.int32),
        rev=np.broadcast_to(np.arange(d, dtype=np.int32), (b, d)).copy(),
        dvalid=np.zeros((b, d), bool),
        qrank=np.broadcast_to(np.arange(d, dtype=np.int32), (b, d)).copy(),
        la=np.full(b, la, np.int32),
        lb=np.full(b, lb, np.int32),
    )
    res = mesh_mod.solve_batch_sharded(
        model, -6 * 8192, -2 * 8192, 1.0, la, lb, 10, 5, 5
    )
    assert res.best_upper.shape == (b,)
    # empty problems converge immediately: all-gap alignment, equal bounds
    assert np.all(np.asarray(res.iterations) == 1)
    assert np.all(np.asarray(res.best_upper) == np.asarray(res.best_lower))
