"""Fused mega-kernel path vs the XLA iteration body: bit-identical.

The mega path (``device_solver.solve_batch_chunk_mega`` +
``mega_pallas``) re-derives the subgradient picks and the PSSM placement
by fundamentally different mechanisms (slot joins instead of the rev sort;
one scatter-max onto a hoisted skewed base instead of sort + one-hot
matmul + skew gather), so these tests pin it against the XLA body
end-to-end through the device driver (Pallas interpret mode on CPU; the
CPU XLA body uses the grid placement, so the comparison crosses both
placement implementations).
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


def test_scatter_pssm_long_pair_matches_mirror(tmp_path, monkeypatch):
    """The long-pair scatter-max PSSM path (ne > 16384) vs the mirror.

    Pallas interpret mode on CPU; a ~130 nt pair lands in the 192-bucket,
    which takes the scatter branch of the XLA body (the production path for
    300 nt / 16S scales)."""
    import jax

    import numpy as np

    from lara_tpu.app import enumerate_pairs
    from lara_tpu.solver import device_driver, reference_driver

    rng = np.random.default_rng(13)
    base = "".join("ACGU"[k] for k in rng.integers(0, 4, 130))
    seq2 = list(base)
    for _ in range(10):
        seq2[int(rng.integers(0, len(seq2)))] = "ACGU"[rng.integers(0, 4)]
    struct = ["."] * 130
    for k in range(8):
        struct[10 + k] = "("
        struct[80 - k] = ")"
    path = tmp_path / "long.dbn"
    path.write_text(f">a\n{base}\n{''.join(struct)}\n"
                    f">b\n{''.join(seq2)}\n{''.join(struct)}\n")

    dev0 = jax.devices()[0]
    monkeypatch.setattr(jax, "local_devices", lambda *a, **k: [dev0])
    monkeypatch.setenv("LARA_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("LARA_NO_MEGA", "1")
    params = Parameters(in_file=str(path), num_iterations=25)
    store = InputStorage(in_file=str(path))
    res = list(device_driver.solve_all(store, enumerate_pairs(store),
                                       params))[0]
    mir = reference_driver.solve_pair(store[0], store[1], params, (0, 1))
    assert res.columns == mir.columns
    assert res.best_lower == mir.best_lower
    assert res.best_upper == mir.best_upper
