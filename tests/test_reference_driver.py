"""End-to-end tests of the NumPy reference driver (the executable spec)."""

import numpy as np
import pytest

from lara_tpu.app import enumerate_pairs, run
from lara_tpu.io.records import InputStorage, RnaRecord
from lara_tpu.params import Parameters
from lara_tpu.solver import reference_driver


def make_params(**kw):
    return Parameters(**kw)


def identical_hairpins(tmp_path):
    path = tmp_path / "two.dbn"
    path.write_text(
        ">h1\nGGGGAAAACCCC\n((((....))))\n"
        ">h2\nGGGGAAAACCCC\n((((....))))\n"
    )
    return str(path)


def test_identical_pair_converges_first_iteration(tmp_path):
    store = InputStorage(in_file=identical_hairpins(tmp_path))
    params = make_params()
    result = reference_driver.solve_pair(store[0], store[1], params, (0, 1))
    assert result.iterations == 1
    assert result.best_upper == result.best_lower

    # hand-computed: seq scores 4*(G 6285 + A 11406 + C 6872) = 98252,
    # structure 8 paired lines * balance*(10+10)/2*8192 = 8 * 81920 = 655360
    assert result.best_lower == 98252 + 655360

    # 12 diagonal lines; stems weighted 1000, loop 500
    assert [c[:2] for c in result.columns] == [(i, i) for i in range(12)]
    weights = [c[2] for c in result.columns]
    assert weights == [1000] * 4 + [500] * 4 + [1000] * 4


def test_lib_output_golden(tmp_path, capsys):
    params = make_params(in_file=identical_hairpins(tmp_path), backend="reference")
    run(params)
    out = capsys.readouterr().out
    expected_rows = "\n".join(
        f"{i + 1} {i + 1} {w}" for i, w in enumerate([1000] * 4 + [500] * 4 + [1000] * 4)
    )
    assert out == (
        "! T-COFFEE_LIB_FORMAT_01\n"
        "2\n"
        "h1 12 GGGGAAAACCCC\n"
        "h2 12 GGGGAAAACCCC\n"
        "# 1 2\n"
        f"{expected_rows}\n"
        "! SEQ_1_TO_N\n"
    )


def test_pairs_output_score_formatting(tmp_path, capsys):
    params = make_params(
        in_file=identical_hairpins(tmp_path), backend="reference", out_format="pairs"
    )
    run(params)
    out = capsys.readouterr().out
    score = np.float32(98252 + 655360) / np.float32(8192.0)
    assert out == (
        f">h1 && h2 (score {float(score):g})\n"
        "GGGGAAAACCCC\nGGGGAAAACCCC\n"
    )


def mismatched_hairpins(tmp_path):
    path = tmp_path / "two.dbn"
    path.write_text(
        ">h1\nGGGCGAAAUCGCC\n(((((...)))))\n"
        ">h2\nGGCGAAAACGCCA\n((((....)))).\n"
    )
    return str(path)


def test_mismatched_pair_invariants(tmp_path):
    store = InputStorage(in_file=mismatched_hairpins(tmp_path))
    params = make_params(num_iterations=100)
    result = reference_driver.solve_pair(store[0], store[1], params, (0, 1))
    assert result.best_upper >= result.best_lower
    assert 1 <= result.iterations <= 100
    for (a, b, w) in result.columns:
        assert w in (500, 1000)
    # columns strictly increasing
    cols = [c[:2] for c in result.columns]
    assert all(a1 < a2 and b1 < b2 for (a1, b1), (a2, b2) in zip(cols, cols[1:]))

    # determinism
    result2 = reference_driver.solve_pair(store[0], store[1], params, (0, 1))
    assert result2.columns == result.columns
    assert result2.score == result.score


def test_pair_order_longer_first(tmp_path):
    path = tmp_path / "three.fa"
    path.write_text(">a\nGGGGAAAACCCCGG\n>b\nGGAACC\n>c\nGGGAAACCCC\n")
    from lara_tpu.io import readers

    store = readers.read_fasta(str(path))
    pairs = enumerate_pairs(store)
    # longer sequence first within each pair, pairs sorted longest-first
    assert pairs == [(0, 2), (0, 1), (2, 1)]


def test_swapped_indices_output_order(tmp_path):
    # shorter sequence first in the file: solver runs (1, 0) but output
    # columns must be reported under ordered indices (0, 1) with swapped
    # positions (lagrange.hpp:439-441,472-485)
    path = tmp_path / "two.dbn"
    path.write_text(
        ">short\nGGGAAACCC\n(((...)))\n"
        ">long\nGGGGAAAACCCC\n((((....))))\n"
    )
    store = InputStorage(in_file=str(path))
    params = make_params()
    result = reference_driver.solve_pair(store[1], store[0], params, (1, 0))
    assert result.seq_indices == (0, 1)
    for (a, b, _w) in result.columns:
        assert 0 <= a < 9 and 0 <= b < 12


def test_subgradient_path_runs(tmp_path):
    # conflicting structures force inconsistent picks and the matching branch
    path = tmp_path / "two.dbn"
    path.write_text(
        ">x\nGGGAAAGGGAAACCCAAACCC\n(((...(((...)))...)))\n"
        ">y\nGGGAAAGGGAAACCCAAACCC\n(((...)))...(((...)))\n"
    )
    store = InputStorage(in_file=str(path))
    params = make_params(num_iterations=200)
    result = reference_driver.solve_pair(store[0], store[1], params, (0, 1))
    assert result.best_upper >= result.best_lower
    assert result.iterations >= 1
