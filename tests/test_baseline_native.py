"""Native C++ baseline solver vs the Python reference mirror.

The baseline (``lara_tpu/native/src/baseline.cpp``) is the project's honest
CPU performance anchor; these tests pin it bit-identical to
``reference_driver.solve_pair`` -- columns, bounds, and iteration counts --
on structured families at two scales, plus edge-filter equality against the
NumPy oracle (``edge_filter.hpp:131-158`` semantics).
"""

import math

import numpy as np
import pytest

from lara_tpu.io.records import MIN_PROB, RnaRecord
from lara_tpu.params import Parameters
from lara_tpu.scoring.ribosum import encode_rna5
from lara_tpu.solver import oracle, reference_driver
from lara_tpu.types import f2i

try:
    from lara_tpu.native import baseline

    baseline._load()
    HAVE_NATIVE = True
except Exception:  # no toolchain
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE, reason="no native toolchain")


def _family(n=4, length=60, seed=11):
    rng = np.random.default_rng(seed)
    base = list(
        "GCGGAUUUAGCUCAGUUGGGAGAGCGCCAGACUGAAGAUCUGGAGGUCCUGUGUUCGAUCCACAGAAUUCGC"
    )[:length]
    # hairpin stem edges with soft probabilities
    records = []
    for k in range(n):
        seq = list(base)
        for _ in range(int(rng.integers(2, 6))):
            seq[int(rng.integers(0, length))] = "ACGU"[rng.integers(0, 4)]
        edges = []
        for s in range(6):
            i, j = 4 + s, length - 5 - s
            p = float(rng.uniform(0.2, 0.9))
            edges.append((i, j, math.log(p / MIN_PROB)))
            if rng.random() < 0.5:
                p2 = float(rng.uniform(0.05, 0.2))
                edges.append((i, min(length - 1, j + 2), math.log(p2 / MIN_PROB)))
        edges.sort()
        records.append(
            RnaRecord(name=f"r{k}", sequence="".join(seq), bpp_edges=edges))
    return records


def test_edge_filter_matches_oracle():
    recs = _family(n=2, length=48, seed=3)
    params = Parameters(in_file="<t>")
    sa = encode_rna5(recs[0].sequence)
    sb = encode_rna5(recs[1].sequence)
    go, ge = int(params.gap_open_int), int(params.gap_extend_int)
    subopt = int(f2i(params.suboptimal_diff))
    act_o, opt_o = oracle.generate_edges(sa, sb, params.score_matrix, go, ge,
                                         subopt)
    act_n, opt_n = baseline.edge_filter(sa.astype(np.int32),
                                        sb.astype(np.int32),
                                        params.score_matrix, go, ge, subopt)
    assert opt_n == opt_o
    assert np.array_equal(act_n, act_o)


@pytest.mark.parametrize("matching", [5, 0])
def test_solve_pair_matches_mirror(matching):
    recs = _family(n=3, length=54, seed=17)
    params = Parameters(in_file="<t>", matching=matching, num_iterations=120)
    for (ia, ib) in [(0, 1), (0, 2), (1, 2)]:
        r_nat = baseline.solve_pair(recs[ia], recs[ib], params, (ia, ib))
        r_ref = reference_driver.solve_pair(recs[ia], recs[ib], params,
                                            (ia, ib))
        assert r_nat.columns == r_ref.columns
        assert r_nat.iterations == r_ref.iterations
        assert r_nat.best_lower == r_ref.best_lower
        assert r_nat.best_upper == r_ref.best_upper


def test_solve_pair_linear_libscore():
    recs = _family(n=2, length=50, seed=23)
    params = Parameters(in_file="<t>", library_score_is_linear=True,
                        num_iterations=80)
    r_nat = baseline.solve_pair(recs[0], recs[1], params, (0, 1))
    r_ref = reference_driver.solve_pair(recs[0], recs[1], params, (0, 1))
    assert r_nat.columns == r_ref.columns
    assert r_nat.best_lower == r_ref.best_lower


def test_solve_pair_full_depth_small():
    """Full 500-iteration budget on one pair: the long-trajectory dual path
    (step halving, tie handling) matches the mirror exactly."""
    recs = _family(n=2, length=40, seed=29)
    params = Parameters(in_file="<t>")
    r_nat = baseline.solve_pair(recs[0], recs[1], params, (0, 1))
    r_ref = reference_driver.solve_pair(recs[0], recs[1], params, (0, 1))
    assert r_nat.columns == r_ref.columns
    assert r_nat.iterations == r_ref.iterations
    assert (r_nat.best_lower, r_nat.best_upper) == \
        (r_ref.best_lower, r_ref.best_upper)
