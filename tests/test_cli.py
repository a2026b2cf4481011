"""CLI surface tests: flag parsing parity and whole-program error paths
(``/root/reference/src/parameters.hpp:116-242``, ``src/lara.cpp:44-61``)."""

import numpy as np
import pytest

from lara_tpu import cli
from lara_tpu.params import parse_args
from lara_tpu.types import f2i


def test_all_reference_flags_parse(tmp_path):
    f = tmp_path / "in.dbn"
    f.write_text(">a\nGGAACC\n((..))\n>b\nGGAACC\n((..))\n")
    params = parse_args([
        "-v", "2", "-j", "4", "-i", str(f), "-w", str(tmp_path / "o.lib"),
        "-l", "10", "90", "-o", "pairs", "-n", "100", "-a", "7",
        "-f", "2.0", "-e", "0.5", "-m", "3", "-u", "25.0", "-b", "0.5",
        "-c", "1.5", "-p", "1", "-x", "-2.5", "-y", "-7.0",
    ])
    assert params.verbose == 2
    assert params.threads == 4
    assert params.out_format == "pairs"
    assert (params.library_score_min, params.library_score_max) == (10, 90)
    assert params.num_iterations == 100
    assert params.max_nondecr_iterations == 7
    assert params.step_size_factor == pytest.approx(2.0)
    assert params.matching == 3
    assert params.suboptimal_diff == pytest.approx(25.0)
    assert params.balance == pytest.approx(0.5)
    assert params.sequence_scale == pytest.approx(1.5)
    assert params.structure_scoring == 1
    # fixed-point conversion of gap costs (parameters.hpp:303-307)
    assert params.gap_extend_int == int(f2i(-2.5))
    assert params.gap_open_int == int(f2i(-7.0))


def test_balance_auto_parses_and_maps(tmp_path):
    f = tmp_path / "in.dbn"
    f.write_text(">a\nGGAACC\n((..))\n>b\nGGAACC\n((..))\n")
    p = parse_args(["-i", str(f), "-b", "auto"])
    assert p.balance_auto
    from lara_tpu.solver.interactions import effective_balance

    # identity-keyed weight: full weight on near-identical pairs, a light
    # structural touch at moderate identity, and more structural weight
    # again once the sequence signal degrades (measured optima per band,
    # benchmark/RESULTS.md)
    assert effective_balance(p, 0.95) == pytest.approx(1.0)   # ~identical
    assert effective_balance(p, 0.4) == pytest.approx(0.25)   # moderate id
    assert effective_balance(p, -0.2) == pytest.approx(0.5)   # diverged
    # plain float still routes through unchanged
    p2 = parse_args(["-i", str(f), "-b", "0.7"])
    assert not p2.balance_auto
    assert effective_balance(p2, 0.2) == pytest.approx(0.7)


def test_defaults_match_reference(tmp_path):
    f = tmp_path / "in.dbn"
    f.write_text(">a\nGGAACC\n((..))\n>b\nGGAACC\n((..))\n")
    p = parse_args(["-i", str(f)])
    # parameters.hpp defaults: n=500, a=50, f=1.0, e=0.01, m=5, u=40,
    # b=1 (balance), c=0 (seqscale, parameters.hpp:220), x=-2, y=-6,
    # libscore binary (0 0)
    assert p.num_iterations == 500
    assert p.max_nondecr_iterations == 50
    assert p.step_size_factor == pytest.approx(1.0)
    assert p.matching == 5
    assert p.suboptimal_diff == pytest.approx(40.0)
    assert p.gap_extend_int == int(f2i(-2.0))
    assert p.gap_open_int == int(f2i(-6.0))
    assert not p.library_score_is_linear


def test_missing_input_is_exit_1(capsys):
    rc = cli.main(["-i", "/nonexistent/file.dbn"])
    assert rc == 1
    assert "cannot be opened" in capsys.readouterr().err


def test_no_args_usage_exit():
    rc = cli.main([])
    assert rc != 0


def test_score_matrix_file(tmp_path):
    f = tmp_path / "in.dbn"
    f.write_text(">a\nGGAACC\n((..))\n>b\nGGAACC\n((..))\n")
    mat = tmp_path / "mat.txt"
    rows = ["# custom", "    A   C   G   U   N"]
    for i, row_name in enumerate("ACGUN"):
        rows.append(row_name + " " + " ".join(
            str(2 if i == j else -1) for j in range(5)))
    mat.write_text("\n".join(rows) + "\n")
    p = parse_args(["-i", str(f), "-s", str(mat)])
    m = np.asarray(p.score_matrix)
    assert m.shape == (5, 5)
    assert m[0, 0] == int(f2i(2.0))
    assert m[0, 1] == int(f2i(-1.0))


def test_prewarm_writes_no_output(tmp_path, capsys):
    """--prewarm runs the full solve (compiling every program for the
    input's shape classes into the persistent cache) but writes nothing."""
    f = tmp_path / "in.dbn"
    f.write_text(">a\nGGGCAAAAGCCC\n(((......)))\n"
                 ">b\nGGGCAAAUGCCC\n(((......)))\n")
    out = tmp_path / "o.lib"
    rc = cli.main(["-i", str(f), "--prewarm", "-w", str(out)])
    assert rc in (0, None)
    assert not out.exists()
    assert "T-COFFEE" not in capsys.readouterr().out
