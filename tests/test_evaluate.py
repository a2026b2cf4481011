"""MCC / SPS evaluation metrics."""

import math
import textwrap

import pytest

from lara_tpu import evaluate


@pytest.fixture
def ref_msa_file(tmp_path):
    f = tmp_path / "ref.fa"
    f.write_text(">s1\nGGGG-AAAACCCC\n>s2\nGGG-CAAAAGCC-\n")
    return str(f)


def test_read_aligned_fasta(ref_msa_file):
    msa = evaluate.read_msa(ref_msa_file)
    assert [name for name, _ in msa] == ["s1", "s2"]
    assert len(msa[0][1]) == len(msa[1][1]) == 13


def test_read_clustal(tmp_path):
    f = tmp_path / "test.aln"
    f.write_text(textwrap.dedent("""\
        CLUSTAL W (1.83) multiple sequence alignment

        s1    GGGGAAAA
        s2    GGG-AAAA
                 * ****

        s1    CCCC
        s2    CCC-
    """))
    msa = evaluate.read_msa(str(f))
    assert msa == [("s1", "GGGGAAAACCCC"), ("s2", "GGG-AAAACCC-")]


def test_ragged_msa_rejected(tmp_path):
    f = tmp_path / "bad.fa"
    f.write_text(">a\nACGU\n>b\nACG\n")
    with pytest.raises(ValueError):
        evaluate.read_msa(str(f))


def test_parse_structure():
    assert evaluate.parse_structure("((..))") == [(1, 4), (0, 5)]
    assert evaluate.parse_structure("....") == []
    with pytest.raises(ValueError):
        evaluate.parse_structure("((.")


def test_to_seq_pos():
    # column pairs across gaps drop out; positions are sequence coordinates
    pairs = evaluate.to_seq_pos("A-CG", [(0, 3), (1, 2)])
    assert pairs == [(0, 2)]


def test_mcc_identical_alignments_is_one(ref_msa_file):
    msa = evaluate.read_msa(ref_msa_file)
    pairs = [(0, 12), (1, 11), (2, 10)]
    value = evaluate.mcc_from_pairs(msa, pairs, msa, pairs)
    assert value == pytest.approx(1.0)


def test_mcc_disjoint_pairs_negative(ref_msa_file):
    msa = evaluate.read_msa(ref_msa_file)
    value = evaluate.mcc_from_pairs(msa, [(0, 12), (1, 11)], msa, [(2, 10), (3, 9)])
    assert value < 0.1


def test_mcc_zero_denominator_guard(ref_msa_file):
    msa = evaluate.read_msa(ref_msa_file)
    assert evaluate.mcc_from_pairs(msa, [], msa, []) == 0.0


def test_sps_identical(tmp_path, ref_msa_file):
    assert evaluate.sps(ref_msa_file, ref_msa_file) == pytest.approx(1.0)


def test_sps_partial(tmp_path):
    ref = tmp_path / "r.fa"
    ref.write_text(">a\nACGU\n>b\nACGU\n")
    test = tmp_path / "t.fa"
    test.write_text(">a\nACGU-\n>b\n-ACGU\n")
    # ref aligns (0,0),(1,1),(2,2),(3,3); test aligns (1,0),(2,1),(3,2)
    assert evaluate.sps(str(ref), str(test)) == pytest.approx(0.0)
    test2 = tmp_path / "t2.fa"
    test2.write_text(">a\nACGU\n>b\nACGU\n")
    assert evaluate.sps(str(ref), str(test2)) == pytest.approx(1.0)


def test_builtin_consensus_hairpin(tmp_path):
    f = tmp_path / "fam.fa"
    f.write_text(">a\nGGGGGAAAACCCCC\n>b\nGGGGGAAAACCCCC\n")
    msa, structure = evaluate.consensus_structure(str(f), mode="builtin")
    assert len(structure) == 14
    pairs = evaluate.parse_structure(structure)
    assert pairs, "expected consensus base pairs for a perfect hairpin"
    # stem pairs should be nested around the A-loop
    for (i, j) in pairs:
        assert i < 5 and j >= 9


def test_mcc_end_to_end_builtin(tmp_path):
    f = tmp_path / "fam.fa"
    f.write_text(">a\nGGGGGAAAACCCCC\n>b\nGGGGGAAAACCCCC\n")
    value = evaluate.mcc(str(f), str(f), consensus="builtin")
    assert value == pytest.approx(1.0)


def test_cli(tmp_path, capsys):
    f = tmp_path / "fam.fa"
    f.write_text(">a\nGGGGGAAAACCCCC\n>b\nGGGGGAAAACCCCC\n")
    assert evaluate.main(["sps", str(f), str(f)]) == 0
    out = capsys.readouterr().out.strip()
    assert out == "1.0000"
