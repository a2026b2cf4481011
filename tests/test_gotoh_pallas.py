"""Pallas wavefront kernels vs. the XLA reference path (interpret mode).

On TPU hardware the same kernels compile via Mosaic and are verified
bit-identical by the perf harness; here the Pallas interpreter runs them on
CPU against :mod:`lara_tpu.ops.gotoh` on small shapes.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from lara_tpu.ops import gotoh  # noqa: E402
from lara_tpu.ops.gotoh_pallas import (  # noqa: E402
    align_pssm_batch_pallas,
    gotoh_scan_pallas,
)

GO, GE = np.int32(-49152), np.int32(-16384)


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(3)
    b, la_max, lb_max = 4, 12, 10
    pssm = jnp.asarray(rng.integers(-9000, 9000, (b, la_max, lb_max), dtype=np.int32))
    la = jnp.asarray(np.array([12, 7, 12, 2], np.int32))
    lb = jnp.asarray(np.array([10, 9, 1, 2], np.int32))
    return pssm, la, lb, la_max, lb_max


def test_scan_kernel_matches_xla(problem):
    pssm, la, lb, la_max, lb_max = problem
    skewed = gotoh.skew_scores(pssm, gotoh.NEG_INF)
    ref = gotoh.gotoh_scan(skewed, la, lb, GO, GE, la_max, emit="dirs")
    fm, fh, fv, dirs = gotoh_scan_pallas(
        skewed, la, lb, GO, GE, block_b=4, interpret=True
    )
    assert np.array_equal(np.asarray(fm), np.asarray(ref.final_m))
    assert np.array_equal(np.asarray(fh), np.asarray(ref.final_h))
    assert np.array_equal(np.asarray(fv), np.asarray(ref.final_v))
    d_ref = np.asarray(ref.aux).astype(np.int32)
    d_pal = np.asarray(dirs)
    lan, lbn = np.asarray(la), np.asarray(lb)
    for k in range(pssm.shape[0]):
        for d in range(lan[k] + lbn[k] + 1):
            for i in range(min(d, lan[k]) + 1):
                if d - i > lbn[k]:
                    continue
                assert d_ref[d, k, i] == d_pal[d, k, i], (k, d, i)


def test_align_path_matches_xla(problem):
    pssm, la, lb, la_max, lb_max = problem
    ref = gotoh.align_pssm_batch(pssm, la, lb, GO, GE, la_max, lb_max)
    pal = align_pssm_batch_pallas(
        pssm, la, lb, GO, GE, la_max, lb_max, block_b=4, interpret=True
    )
    assert np.array_equal(np.asarray(pal.upper), np.asarray(ref.upper))
    assert np.array_equal(np.asarray(pal.lines), np.asarray(ref.lines))
    assert np.array_equal(np.asarray(pal.n_lines), np.asarray(ref.n_lines))
    assert np.array_equal(np.asarray(pal.gap_score), np.asarray(ref.gap_score))


def test_traceback_seq_part_accumulation(problem):
    """In-kernel seq_part == dense reduce of seq scores over matched lines
    (the fused solver's lower-bound seq term, ``lagrange.hpp:376-378``)."""
    pssm, la, lb, la_max, lb_max = problem
    rng = np.random.default_rng(11)
    seq_scores = jnp.asarray(
        rng.integers(-5000, 5000, pssm.shape, dtype=np.int32))
    pal = align_pssm_batch_pallas(
        pssm, la, lb, GO, GE, la_max, lb_max, block_b=4, interpret=True,
        emit_lines=False, seq_scores=seq_scores)
    assert pal.seq_part is not None
    pmask = np.asarray(pal.partner)[:, :, None] == np.arange(lb_max)[None, None, :]
    want = np.sum(np.where(pmask, np.asarray(seq_scores), 0), axis=(1, 2))
    np.testing.assert_array_equal(np.asarray(pal.seq_part), want)


def test_traceback_seq_part_preskewed(problem):
    """Pre-skewed seq stream (prepare_skewed_seq) == in-call skew path."""
    from lara_tpu.ops.gotoh_pallas import prepare_skewed_seq

    pssm, la, lb, la_max, lb_max = problem
    rng = np.random.default_rng(12)
    seq_scores = jnp.asarray(
        rng.integers(-5000, 5000, pssm.shape, dtype=np.int32))
    ref = align_pssm_batch_pallas(
        pssm, la, lb, GO, GE, la_max, lb_max, block_b=4, interpret=True,
        emit_lines=False, seq_scores=seq_scores)
    sk = prepare_skewed_seq(seq_scores, la_max, lb_max, block_b=4)
    pal = align_pssm_batch_pallas(
        pssm, la, lb, GO, GE, la_max, lb_max, block_b=4, interpret=True,
        emit_lines=False, seq_scores_skewed=sk)
    np.testing.assert_array_equal(np.asarray(pal.seq_part),
                                  np.asarray(ref.seq_part))
    np.testing.assert_array_equal(np.asarray(pal.partner),
                                  np.asarray(ref.partner))


def test_align_path_stream_vs_resident(problem, monkeypatch):
    """The DMA-streaming (default) and the VMEM-resident (opt-in,
    LARA_DP_RESIDENT=1) kernel variants are exact drop-ins for each
    other."""
    pssm, la, lb, la_max, lb_max = problem
    from lara_tpu.ops.gotoh_pallas import align_plan

    monkeypatch.setenv("LARA_DP_RESIDENT", "1")
    plan = align_plan(int(pssm.shape[0]), la_max, lb_max, block_b=4)
    assert plan[-1], "small shapes should fit the resident variant"
    align_pssm_batch_pallas.clear_cache()
    res = align_pssm_batch_pallas(
        pssm, la, lb, GO, GE, la_max, lb_max, block_b=4, interpret=True
    )
    monkeypatch.delenv("LARA_DP_RESIDENT")
    align_pssm_batch_pallas.clear_cache()
    stream = align_pssm_batch_pallas(
        pssm, la, lb, GO, GE, la_max, lb_max, block_b=4, interpret=True
    )
    align_pssm_batch_pallas.clear_cache()
    for a, b2 in zip(res, stream):
        if a is None:
            assert b2 is None
            continue
        assert np.array_equal(np.asarray(a), np.asarray(b2))
