"""Native C++ model builder vs. the NumPy mirror (bit-equality fuzz)."""

import math

import numpy as np
import pytest

from lara_tpu.io.records import RnaRecord
from lara_tpu.params import Parameters
from lara_tpu.scoring.ribosum import encode_rna5
from lara_tpu.solver import interactions


def _random_record(rng, name, length):
    seq = "".join("ACGU"[k] for k in rng.integers(0, 4, length))
    edges = []
    for _ in range(int(rng.integers(0, length))):
        i, j = sorted(rng.choice(length, 2, replace=False).tolist())
        if j - i < 4:
            continue
        p = float(rng.uniform(0.02, 0.95))
        edges.append((i, j, math.log(p / 0.003)))
    edges.sort()
    return RnaRecord(name=name, sequence=seq, bpp_edges=edges)


@pytest.mark.parametrize("seed", range(8))
def test_native_build_matches_numpy(seed):
    lib = interactions._native_build()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(seed)
    la = int(rng.integers(20, 80))
    lb = int(rng.integers(10, la + 1))
    rec_a = _random_record(rng, "a", la)
    rec_b = _random_record(rng, "b", lb)
    params = Parameters(in_file="<test>")
    # random-ish active mask incl. the full diagonal band
    active = rng.random((la, lb)) < 0.4
    for a in range(min(la, lb)):
        active[a, a] = True
    opt = 8192 * min(la, lb) // 2

    native = interactions.build_pair_model(rec_a, rec_b, params, active, opt)

    seq_a = encode_rna5(rec_a.sequence).astype(np.int32)
    seq_b = encode_rna5(rec_b.sequence).astype(np.int32)
    pa, wa = interactions.adjacency_arrays(rec_a, la, params.precise_bpp)
    pb, wb = interactions.adjacency_arrays(rec_b, lb, params.precise_bpp)
    mirror = interactions._build_pair_model_numpy(
        rec_a, rec_b, params, np.ascontiguousarray(active, bool),
        native.seq_score, seq_a, seq_b, pa, wa, pb, wb)

    np.testing.assert_array_equal(native.dual_l, mirror.dual_l)
    np.testing.assert_array_equal(native.dual_m, mirror.dual_m)
    np.testing.assert_array_equal(native.sscore, mirror.sscore)
    np.testing.assert_array_equal(native.rev, mirror.rev)
    np.testing.assert_array_equal(native.qperm, mirror.qperm)


def test_native_build_empty_active():
    lib = interactions._native_build()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(0)
    rec_a = _random_record(rng, "a", 30)
    rec_b = _random_record(rng, "b", 20)
    params = Parameters(in_file="<test>")
    model = interactions.build_pair_model(
        rec_a, rec_b, params, np.zeros((30, 20), bool), 8192)
    assert len(model.dual_l) == 0
