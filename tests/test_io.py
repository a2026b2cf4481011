"""Parsers and writers."""

import io
import math

import pytest

from lara_tpu.io import readers, writers
from lara_tpu.io.records import InputStorage, LaraInputError, RnaRecord


def test_dot_bracket_roundtrip(tmp_path):
    path = tmp_path / "two.dbn"
    path.write_text(
        ">hairpin1\nGGGGAAAACCCC\n((((....))))\n"
        ">hairpin2\nGGGCAAAAGCCC\n(((......)))\n"
    )
    records = readers.read_rna_file(str(path))
    assert [r.name for r in records] == ["hairpin1", "hairpin2"]
    assert records[0].sequence == "GGGGAAAACCCC"
    assert records[0].fixed_edges == [(0, 11, 1.0), (1, 10, 1.0), (2, 9, 1.0), (3, 8, 1.0)]
    assert records[1].fixed_edges == [(0, 11, 1.0), (1, 10, 1.0), (2, 9, 1.0)]


def test_dbn_with_energy_and_pseudoknot(tmp_path):
    path = tmp_path / "pk.dbn"
    path.write_text(">pk\nGGGAAACCCAAA\n(((.AA))).aa (-3.50)\n")
    (rec,) = readers.read_rna_file(str(path))
    # letter families pair nested (stack semantics): Aa..Aa -> (4,11),(5,10)
    assert (4, 11, 1.0) in rec.fixed_edges and (5, 10, 1.0) in rec.fixed_edges


def test_fasta_normalisation(tmp_path):
    path = tmp_path / "s.fa"
    path.write_text(">s1 some description\nacgtACGT\nNRYK\n>s2\nUUUU\n")
    records = readers.read_rna_file(str(path))
    assert records[0].name == "s1 some description"
    # lowercase -> upper, T -> U, ambiguity -> N
    assert records[0].sequence == "ACGUACGUNNNN"
    assert records[1].sequence == "UUUU"


def test_connect_and_bpseq(tmp_path):
    ct = tmp_path / "t.ct"
    ct.write_text(
        "4 ENERGY = -1.0 tiny\n"
        "1 G 0 2 4 1\n2 A 1 3 0 2\n3 A 2 4 0 3\n4 C 3 0 1 4\n"
    )
    (rec,) = readers.read_rna_file(str(ct))
    assert rec.sequence == "GAAC"
    assert rec.fixed_edges == [(0, 3, 1.0)]

    bp = tmp_path / "t.bpseq"
    bp.write_text("# tinybp\n1 G 4\n2 A 0\n3 A 0\n4 C 1\n")
    (rec2,) = readers.read_rna_file(str(bp))
    assert rec2.name == "tinybp"
    assert rec2.fixed_edges == [(0, 3, 1.0)]


def test_stockholm_projection(tmp_path):
    sth = tmp_path / "t.sth"
    sth.write_text(
        "# STOCKHOLM 1.0\n"
        "seq1 GG-AACC\n"
        "seq2 GGCAACC\n"
        "#=GC SS_cons ((...))\n"
        "//\n"
    )
    records = readers.read_rna_file(str(sth))
    assert records[0].sequence == "GGAACC"
    assert records[1].sequence == "GGCAACC"
    # consensus pairs: (0,6) and (1,5) in column space
    assert records[1].fixed_edges == [(0, 6, 1.0), (1, 5, 1.0)]
    # seq1 has a gap in column 2; pair (1,5) maps to (1,4), (0,6)->(0,5)
    assert records[0].fixed_edges == [(0, 5, 1.0), (1, 4, 1.0)]


def test_dotplot(tmp_path):
    ps = tmp_path / "tiny_dp.ps"
    ps.write_text(
        "%!PS\n"
        "/sequence { (\\\n"
        "GGGAAA\\\n"
        "CCC\\\n"
        ") } def\n"
        "drawgrid\n"
        "1 9 0.95 ubox\n"
        "2 8 0.3 ubox\n"
        "3 7 0.04 ubox\n"
        "1 9 0.95 lbox\n"
    )
    rec = readers.read_dotplot(str(ps))
    assert rec.name == "tiny"
    assert rec.sequence == "GGGAAACCC"
    # 0.95^2 and 0.3^2 pass the 0.003 threshold; 0.04^2 = 0.0016 does not
    assert [(i, j) for (i, j, _) in rec.bpp_edges] == [(0, 8), (1, 7)]
    w = dict(((i, j), w) for (i, j, w) in rec.bpp_edges)
    assert math.isclose(w[(0, 8)], math.log(0.95 * 0.95 / 0.003))
    # lbox edges are dropped when ubox edges exist (single graph appended)
    assert rec.fixed_edges == []


def test_ebpseq_roundtrip(tmp_path):
    rec1 = RnaRecord(name="r1", sequence="GGAACC",
                     bpp_edges=[(0, 5, 0.9), (1, 4, 0.8)])
    rec2 = RnaRecord(name="r2", sequence="GAAC",
                     fixed_edges=[(0, 3, 1.0)])
    buf = io.StringIO()
    writers.write_ebpseq([rec1, rec2], buf)
    path = tmp_path / "t.ebpseq"
    path.write_text(buf.getvalue())
    records = readers.read_rna_file(str(path))
    assert [r.name for r in records] == ["r1", "r2"]
    assert records[0].bpp_edges == [(0, 5, 0.9), (1, 4, 0.8)]
    assert records[1].fixed_edges == [(0, 3, 1.0)]


def test_input_storage_fixed_weight_boost(tmp_path):
    path = tmp_path / "two.dbn"
    path.write_text(">a\nGGAACC\n((..))\n>b\nGGAACC\n((..))\n")
    store = InputStorage(in_file=str(path))
    # fixed-only records get their edge weights x10 (io.hpp:292-296)
    assert store[0].fixed_edges == [(0, 5, 10.0), (1, 4, 10.0)]


def test_input_storage_needs_two_sequences(tmp_path):
    path = tmp_path / "one.dbn"
    path.write_text(">a\nGGAACC\n((..))\n")
    with pytest.raises(LaraInputError):
        InputStorage(in_file=str(path))


def test_output_library_lib_format():
    recs = [RnaRecord(name="s1", sequence="GGAC"), RnaRecord(name="s2", sequence="GAC")]
    lib = writers.OutputLibrary(recs, "lib")
    lib.add_alignment((0, 1), [(0, 0, 1000), (2, 1, 500), (3, 2, 1000)], 12345)
    text = lib.to_string()
    assert text == (
        "! T-COFFEE_LIB_FORMAT_01\n"
        "2\n"
        "s1 4 GGAC\n"
        "s2 3 GAC\n"
        "# 1 2\n"
        "1 1 1000\n"
        "3 2 500\n"
        "4 3 1000\n"
        "! SEQ_1_TO_N\n"
    )


def test_output_library_pairs_and_fasta():
    recs = [RnaRecord(name="s1", sequence="GGAC"), RnaRecord(name="s2", sequence="GAC")]
    lib = writers.OutputLibrary(recs, "pairs")
    # columns: (0,0), (2,1), (3,2): G matched, G unmatched->gap, A, C
    lib.add_alignment((0, 1), [(0, 0, 1000), (2, 1, 500), (3, 2, 1000)], 8192)
    text = lib.to_string()
    assert text == ">s1 && s2 (score 1)\nGGAC\nG-AC\n"

    lib2 = writers.OutputLibrary(recs, "fasta")
    lib2.add_alignment((0, 1), [(0, 0, 1000), (2, 1, 500), (3, 2, 1000)], 8192)
    assert lib2.to_string() == ">s1\nGGAC\n>s2\nG-AC\n"


def test_output_sorted_and_deduplicated():
    recs = [RnaRecord(name=f"s{k}", sequence="GGAC") for k in range(3)]
    lib = writers.OutputLibrary(recs, "lib")
    lib.add_alignment((1, 2), [(0, 0, 1000)], 5)
    lib.add_alignment((0, 1), [(0, 0, 1000)], 7)
    lib.add_alignment((0, 1), [(0, 0, 1000)], 7)  # duplicate
    entries = lib.sorted_entries
    assert len(entries) == 2
    assert entries[0][0] == (0, 1) and entries[1][0] == (1, 2)


def test_read_embl(tmp_path):
    from lara_tpu.io import readers

    f = tmp_path / "two.embl"
    f.write_text(
        "ID   seq1; SV 1; linear; RNA; STD; UNC; 8 BP.\n"
        "DE   test record\n"
        "SQ   Sequence 8 BP;\n"
        "     ggggaaaa                                                        8\n"
        "//\n"
        "ID   seq2; SV 1; linear; RNA; STD; UNC; 4 BP.\n"
        "SQ   Sequence 4 BP;\n"
        "     accg                                                            4\n"
        "//\n"
    )
    records = readers.read_embl(str(f))
    assert [(r.name, r.sequence) for r in records] == [
        ("seq1", "GGGGAAAA"), ("seq2", "ACCG")]


def test_read_genbank(tmp_path):
    from lara_tpu.io import readers

    f = tmp_path / "two.gb"
    f.write_text(
        "LOCUS       seq1       8 bp    RNA     linear   UNC\n"
        "DEFINITION  test.\n"
        "ORIGIN\n"
        "        1 ggggaaaa\n"
        "//\n"
        "LOCUS       seq2       4 bp    RNA     linear   UNC\n"
        "ORIGIN\n"
        "        1 accg\n"
        "//\n"
    )
    records = readers.read_genbank(str(f))
    assert [(r.name, r.sequence) for r in records] == [
        ("seq1", "GGGGAAAA"), ("seq2", "ACCG")]


def test_read_raw(tmp_path):
    from lara_tpu.io import readers

    f = tmp_path / "seqs.raw"
    f.write_text("GGGGAAAA\nACCG\n")
    records = readers.read_raw(str(f))
    assert [r.sequence for r in records] == ["GGGGAAAA", "ACCG"]
    assert records[0].name == "sequence1"


def test_gzip_and_bzip2_inputs(tmp_path):
    """zlib/bzip2-compressed inputs are read transparently for every format
    (reference parity: CMakeLists.txt:115-117 links zlib/bzip2 into SeqAn)."""
    import bz2
    import gzip

    dbn = ">h1\nGGGGAAAACCCC\n((((....))))\n>h2\nGGGCAAAAGCCC\n(((......)))\n"
    gz_path = tmp_path / "two.dbn.gz"
    with gzip.open(gz_path, "wt") as handle:
        handle.write(dbn)
    records = readers.read_rna_file(str(gz_path))
    assert [r.name for r in records] == ["h1", "h2"]
    assert records[0].fixed_edges[0] == (0, 11, 1.0)

    fa = ">a\nGGGGAAAACCCC\n>b\nGGGCAAAAGCCC\n"
    bz_path = tmp_path / "two.fa.bz2"
    with bz2.open(bz_path, "wt") as handle:
        handle.write(fa)
    records = readers.read_rna_file(str(bz_path))
    assert [r.sequence for r in records] == ["GGGGAAAACCCC", "GGGCAAAAGCCC"]


def test_stockholm_wuss_pseudoknot_lowercase(tmp_path):
    """Pins the WUSS lowercase policy on an Rfam-seed-shaped SS_cons: in
    Rfam/Infernal WUSS, uppercase letters OPEN pseudoknot stems and the
    matching lowercase letters CLOSE them (``AAA...aaa``); the unpaired
    markers are ``.,:_-~``.  SeqAn 2.4's own behavior is unverifiable here
    (empty vendored submodule), so lara-tpu pins the Rfam semantics."""
    sth = tmp_path / "pk.sth"
    # shaped like an Rfam seed with a 2-bp pseudoknot crossing a stem
    sth.write_text(
        "# STOCKHOLM 1.0\n"
        "#=GF ID fake-pk\n"
        "s1 GGGCAAAAGCCCAAGG\n"
        "s2 GGGCAAAAGCCCAAGG\n"
        "#=GC SS_cons <<<<AA..>>>>,:aa\n"
        "//\n"
    )
    records = readers.read_rna_file(str(sth))
    edges = [(i, j) for (i, j, _w) in records[0].fixed_edges]
    # nested stem from <<<<...>>>>
    for pair in [(0, 11), (1, 10), (2, 9), (3, 8)]:
        assert pair in edges
    # pseudoknot stem AA...aa crossing it: stack semantics (5,14),(4,15)
    assert (4, 15) in edges and (5, 14) in edges
    # ',' and ':' columns are unpaired
    assert len(edges) == 6


def test_structureless_input_auto_predicts(tmp_path):
    """Default --predict builtin: plain fasta gets McCaskill bpp edges, the
    reference-with-ViennaRNA behavior (io.hpp:286-338)."""
    from lara_tpu.io.records import InputStorage, StructurePredictionRequired

    fa = tmp_path / "seqs.fa"
    fa.write_text(">s1\nGGGGAAAACCCC\n>s2\nGGGCAAAAGCCC\n")
    store = InputStorage(in_file=str(fa), predict_structures="builtin")
    assert all(r.bpp_edges for r in store)

    import pytest

    with pytest.raises(StructurePredictionRequired):
        InputStorage(in_file=str(fa), predict_structures="none")
