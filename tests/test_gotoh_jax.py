"""Batched JAX wavefront DP vs. the NumPy oracle (bit-exact, incl. ties)."""

import numpy as np
import pytest

from lara_tpu.ops import gotoh
from lara_tpu.solver import oracle
from lara_tpu.types import PSSM_INIT

GO = -6 * 8192
GE = -2 * 8192


def random_pssm(rng, la, lb, la_max, lb_max, tie_prone=False):
    full = np.full((la_max, lb_max), int(PSSM_INIT), dtype=np.int32)
    if tie_prone:
        # coarse values force frequent ties to exercise the tie policy
        vals = rng.integers(-4, 5, (la, lb)).astype(np.int64) * GE
    else:
        vals = rng.integers(-60000, 60000, (la, lb))
    # sprinkle inactive cells
    mask = rng.random((la, lb)) < 0.2
    vals = np.where(mask, int(PSSM_INIT), vals)
    full[:la, :lb] = vals
    return full


@pytest.mark.parametrize("tie_prone", [False, True])
def test_align_pssm_batch_matches_oracle(tie_prone):
    rng = np.random.default_rng(42 if tie_prone else 7)
    la_max, lb_max = 24, 20
    batch = 9
    las = rng.integers(1, la_max + 1, batch)
    lbs = rng.integers(1, lb_max + 1, batch)
    pssms = np.stack(
        [random_pssm(rng, las[k], lbs[k], la_max, lb_max, tie_prone) for k in range(batch)]
    )

    out = gotoh.align_pssm_batch(
        pssms, np.asarray(las), np.asarray(lbs), GO, GE, la_max, lb_max
    )
    for k in range(batch):
        score, lines, gaps_a, gaps_b = oracle.align_pssm(
            pssms[k][: las[k], : lbs[k]].astype(np.int64), GO, GE
        )
        gap_score = oracle.evaluate_lines(gaps_a, gaps_b, GO, GE)
        assert int(out.upper[k]) == score, f"lane {k} score"
        n = int(out.n_lines[k])
        got_lines = [tuple(x) for x in np.asarray(out.lines[k][:n])]
        assert got_lines == lines, f"lane {k} lines"
        assert int(out.gap_score[k]) == gap_score, f"lane {k} gap score"


def test_edge_filter_batch_matches_oracle():
    rng = np.random.default_rng(3)
    from lara_tpu.scoring.ribosum import ribosum65n_fixed

    submat = ribosum65n_fixed()
    la_max, lb_max = 18, 15
    batch = 6
    las = rng.integers(2, la_max + 1, batch)
    lbs = rng.integers(2, lb_max + 1, batch)
    # enforce la >= lb like the driver does
    for k in range(batch):
        if las[k] < lbs[k]:
            las[k], lbs[k] = lbs[k], las[k]
    lbs = np.minimum(lbs, lb_max)
    seq_a = rng.integers(0, 5, (batch, la_max))
    seq_b = rng.integers(0, 5, (batch, lb_max))
    subopt = 5 * 8192

    active, opt = gotoh.edge_filter_batch(
        seq_a, seq_b, np.asarray(las), np.asarray(lbs), submat, GO, GE, subopt,
        la_max, lb_max,
    )
    for k in range(batch):
        want_active, want_opt = oracle.generate_edges(
            seq_a[k][: las[k]], seq_b[k][: lbs[k]], submat.astype(np.int64),
            GO, GE, subopt,
        )
        assert int(opt[k]) == want_opt
        got = np.asarray(active[k][: las[k], : lbs[k]])
        np.testing.assert_array_equal(got, want_active)
        # padding region fully inactive
        assert not np.asarray(active[k])[las[k]:, :].any()
        assert not np.asarray(active[k])[:, lbs[k]:].any()


def test_single_cell_and_degenerate_shapes():
    pssm = np.full((1, 4, 4), int(PSSM_INIT), dtype=np.int32)
    pssm[0, 0, 0] = 100
    out = gotoh.align_pssm_batch(pssm, np.array([1]), np.array([1]), GO, GE, 4, 4)
    assert int(out.upper[0]) == 100
    assert int(out.n_lines[0]) == 1
    assert tuple(np.asarray(out.lines[0][0])) == (0, 0)
    assert int(out.gap_score[0]) == 0

    # 1 x n: either match + gaps or all gaps
    pssm2 = np.full((1, 4, 4), int(PSSM_INIT), dtype=np.int32)
    pssm2[0, 0, :] = [-100, 50, -100, -100]
    out2 = gotoh.align_pssm_batch(pssm2, np.array([1]), np.array([4]), GO, GE, 4, 4)
    score, lines, ga, gb = oracle.align_pssm(pssm2[0, :1, :4].astype(np.int64), GO, GE)
    assert int(out2.upper[0]) == score
    n = int(out2.n_lines[0])
    assert [tuple(x) for x in np.asarray(out2.lines[0][:n])] == lines


def test_edge_filter_skewed_words_matches_grid_path():
    """The gather-free skewed-space edge filter (one packed download +
    host strided-view unskew) is bit-identical to the grid formulation,
    including uneven per-lane lengths."""
    import numpy as np
    from lara_tpu.params import Parameters
    from lara_tpu.types import f2i

    rng = np.random.default_rng(23)
    params = Parameters(in_file="x")
    submat = np.asarray(params.score_matrix)
    go, ge = int(params.gap_open_int), int(params.gap_extend_int)
    subopt = int(f2i(40.0))
    for _ in range(4):
        b = int(rng.integers(1, 6))
        la_max = int(rng.integers(8, 40))
        lb_max = int(rng.integers(8, 40))
        seq_a = rng.integers(0, 4, (b, la_max)).astype(np.int32)
        seq_b = rng.integers(0, 4, (b, lb_max)).astype(np.int32)
        la = rng.integers(4, la_max + 1, b).astype(np.int32)
        lb = rng.integers(4, lb_max + 1, b).astype(np.int32)
        for k in range(b):
            seq_a[k, la[k]:] = 4
            seq_b[k, lb[k]:] = 4
        act_old, opt_old = gotoh.edge_filter_batch(
            seq_a, seq_b, la, lb, submat, go, ge, subopt, la_max, lb_max)
        packed = np.asarray(gotoh.edge_filter_skewed_words(
            seq_a, seq_b, la, lb, submat, go, ge, subopt, la_max, lb_max))
        act_new, opt_new = gotoh.unskew_active_words(packed, la_max, lb_max)
        assert np.array_equal(np.asarray(act_old), act_new)
        assert np.array_equal(np.asarray(opt_old), opt_new)
        # the reference's forward/backward-optimum invariant
        # (edge_filter.hpp:141): the suffix scan's (0,0) aggregate equals
        # the forward optimum -- both live in the packed artifact
        assert np.array_equal(opt_new, np.asarray(opt_old))
