"""Progressive consistency MSA from pairwise libraries."""

import io

import numpy as np
import pytest

from lara_tpu import msa


def make_lib(names, sequences, entries):
    return msa.Library(names=list(names), sequences=list(sequences),
                       entries=dict(entries))


def test_read_lib_roundtrip(tmp_path):
    text = (
        "! T-COFFEE_LIB_FORMAT_01\n"
        "2\n"
        "s1 4 ACGU\n"
        "s2 4 AGGU\n"
        "# 1 2\n"
        "1 1 1000\n"
        "2 2 500\n"
        "4 4 1000\n"
        "! SEQ_1_TO_N\n"
    )
    f = tmp_path / "x.lib"
    f.write_text(text)
    lib = msa.read_lib(str(f))
    assert lib.names == ["s1", "s2"]
    assert lib.sequences == ["ACGU", "AGGU"]
    assert lib.entries[(0, 1)] == [(0, 0, 1000.0), (1, 1, 500.0), (3, 3, 1000.0)]


def test_two_sequence_alignment_follows_library():
    # library says: align s1[0]-s2[0] and s1[3]-s2[2]; s2 is shorter
    lib = make_lib(
        ["a", "b"], ["ACGU", "AGU"],
        {(0, 1): [(0, 0, 1000.0), (2, 1, 800.0), (3, 2, 1000.0)]},
    )
    out = dict(msa.align(lib))
    assert out["a"] == "ACGU"
    assert out["b"] == "A-GU"


def test_three_sequences_consistency():
    # three identical-length sequences with consistent pairwise diagonals
    entries = {}
    for (i, j) in ((0, 1), (0, 2), (1, 2)):
        entries[(i, j)] = [(k, k, 1000.0) for k in range(4)]
    lib = make_lib(["a", "b", "c"], ["ACGU", "ACGU", "ACGU"], entries)
    out = dict(msa.align(lib))
    assert out == {"a": "ACGU", "b": "ACGU", "c": "ACGU"}


def test_gap_insertion_three_sequences():
    # b lacks the middle residue; library links around it
    entries = {
        (0, 1): [(0, 0, 1000.0), (1, 1, 1000.0), (3, 2, 1000.0)],
        (0, 2): [(k, k, 1000.0) for k in range(4)],
        (1, 2): [(0, 0, 1000.0), (1, 1, 1000.0), (2, 3, 1000.0)],
    }
    lib = make_lib(["a", "b", "c"], ["ACGU", "ACU", "ACGU"], entries)
    out = dict(msa.align(lib))
    assert out["a"] == "ACGU"
    assert out["c"] == "ACGU"
    assert out["b"] == "AC-U"


def test_alignment_is_valid_msa():
    rng = np.random.default_rng(0)
    seqs = ["".join("ACGU"[c] for c in rng.integers(0, 4, 30)) for _ in range(5)]
    entries = {}
    for i in range(5):
        for j in range(i + 1, 5):
            entries[(i, j)] = [(k, k, float(rng.integers(100, 1000)))
                               for k in range(0, 30, 2)]
    lib = make_lib([f"s{i}" for i in range(5)], seqs, entries)
    out = msa.align(lib)
    width = len(out[0][1])
    for name, gapped in out:
        assert len(gapped) == width
        assert gapped.replace("-", "") in seqs


def test_cli_roundtrip(tmp_path, capsys):
    text = (
        "! T-COFFEE_LIB_FORMAT_01\n"
        "2\n"
        "s1 4 ACGU\n"
        "s2 3 AGU\n"
        "# 1 2\n"
        "1 1 1000\n"
        "3 2 1000\n"
        "4 3 1000\n"
        "! SEQ_1_TO_N\n"
    )
    f = tmp_path / "x.lib"
    f.write_text(text)
    out_file = tmp_path / "out.fa"
    assert msa.main([str(f), "-o", str(out_file)]) == 0
    content = out_file.read_text()
    assert content.startswith(">s1\n")
    lines = content.strip().splitlines()
    assert len(lines[1]) == len(lines[3])


def test_end_to_end_with_solver(tmp_path):
    """lara-tpu --msa: solve + assemble in one run (reference backend)."""
    from lara_tpu.app import run
    from lara_tpu.params import Parameters

    fam = tmp_path / "fam.dbn"
    fam.write_text(
        ">h1\nGGGGAAAACCCC\n((((....))))\n"
        ">h2\nGGGCAAAAGCCC\n(((.(...))))\n"
        ">h3\nGGGGAAAACCCC\n((((....))))\n"
    )
    msa_out = tmp_path / "out.fa"
    params = Parameters(in_file=str(fam), backend="reference",
                        out_file=str(tmp_path / "out.lib"),
                        msa_file=str(msa_out))
    run(params)
    from lara_tpu import evaluate

    alignment = evaluate.read_msa(str(msa_out))
    assert len(alignment) == 3
    width = len(alignment[0][1])
    assert all(len(g) == width for _, g in alignment)
    # identical sequences h1/h3 must align residue-to-residue
    ungapped = {n: g for n, g in alignment}
    assert ungapped["h1"] == ungapped["h3"]
