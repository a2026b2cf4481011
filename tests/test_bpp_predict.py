"""Built-in McCaskill predictor vs. brute-force structure enumeration.

``_loop_energy`` below is an INDEPENDENT implementation of the module
docstring's energy specification: it decomposes an explicit structure
into loops (hairpin / stack / bulge / internal / multiloop / exterior)
and sums the tabulated free energies directly -- no shared recursion
code with the predictor.  Enumerating every nested structure then pins
the partition function and every pair probability exactly.
"""

import math

import numpy as np
import pytest

from lara_tpu.solver import bpp_predict

_RANK = {"A": 0, "C": 1, "G": 2, "U": 3}
_PT = {pair: t for t, pair in enumerate(bpp_predict.PAIR_TYPES)}


def _ptype(seq, i, j):
    return _PT.get((_RANK[seq[i]], _RANK[seq[j]]), None)


def enumerate_structures(seq):
    """All nested secondary structures (min hairpin 3) as frozensets of pairs."""
    n = len(seq)
    cache = {}

    def rec(i, j):
        if (i, j) in cache:
            return cache[(i, j)]
        if j - i < 0:
            return [frozenset()]
        structures = []
        # base i unpaired
        for rest in rec(i + 1, j):
            structures.append(rest)
        # base i paired with some k
        for k in range(i + bpp_predict.MIN_HAIRPIN + 1, j + 1):
            if _ptype(seq, i, k) is None:
                continue
            for inner in rec(i + 1, k - 1):
                for outer in rec(k + 1, j):
                    structures.append(inner | outer | {(i, k)})
        cache[(i, j)] = structures
        return structures

    return rec(0, n - 1)


def _nesting(pairs):
    """(roots, children) of a non-crossing pair set."""
    children = {p: [] for p in pairs}
    roots = []
    stack = []
    for p in sorted(pairs):
        while stack and p[0] > stack[-1][1]:
            stack.pop()
        (children[stack[-1]] if stack else roots).append(p)
        stack.append(p)
    return roots, children


def _au(seq, i, j):
    return float(bpp_predict._TERM_AU[_ptype(seq, i, j)])


def _loop_energy(seq, pairs):
    """kcal/mol of one explicit structure by loop decomposition
    (independent implementation of the bpp_predict docstring spec)."""
    roots, children = _nesting(pairs)
    # exterior branches: AU penalty + the dangles=2 terminal-stacking proxy
    e = sum(_au(seq, i, j) + bpp_predict._EXT_STEM_DG for (i, j) in roots)
    for (i, j) in pairs:
        kids = children[(i, j)]
        if not kids:
            u = j - i - 1                              # hairpin
            if u <= 30:
                e += float(bpp_predict._HAIRPIN_DG[u - 3])
            else:
                e += float(bpp_predict._HAIRPIN_DG[-1]) \
                    + bpp_predict._LXC * math.log(u / 30.0)
            e += _au(seq, i, j)
            if u >= 4:
                e += float(bpp_predict._HP_MM_DG[
                    _RANK[seq[i + 1]], _RANK[seq[j - 1]]])
        elif len(kids) == 1:
            (k, l) = kids[0]
            d1, d2 = k - i - 1, j - l - 1
            total = d1 + d2
            po, pi = _ptype(seq, i, j), _ptype(seq, k, l)
            if total == 0:                             # stack
                e += float(bpp_predict._STACK_DG[po, pi])
            elif total == 1:                           # bulge of 1 + stack
                e += float(bpp_predict._BULGE_DG[0]) \
                    + float(bpp_predict._STACK_DG[po, pi])
            elif total > bpp_predict.MAXLOOP:
                return math.inf                        # outside the model
            elif d1 == 0 or d2 == 0:                   # bulge >= 2
                e += float(bpp_predict._BULGE_DG[total - 1]) \
                    + _au(seq, i, j) + _au(seq, k, l)
            else:                                      # internal loop
                if (d1, d2) == (1, 1):
                    e += bpp_predict._INT11_DG
                elif (d1, d2) in ((1, 2), (2, 1)):
                    e += bpp_predict._INT21_DG
                elif (d1, d2) == (2, 2):
                    e += bpp_predict._INT22_DG
                else:
                    e += float(bpp_predict._INTERNAL_DG[total - 4]) \
                        + min(bpp_predict._NINIO_MAX,
                              bpp_predict._NINIO * abs(d1 - d2))
                e += _au(seq, i, j) + _au(seq, k, l)
        else:                                          # multiloop
            e += bpp_predict._ML_CLOSING \
                + bpp_predict._ML_BRANCH * (len(kids) + 1) \
                + bpp_predict._EXT_STEM_DG * (len(kids) + 1) \
                + _au(seq, i, j) \
                + sum(_au(seq, k, l) for (k, l) in kids)
            u = (j - i - 1) - sum(l - k + 1 for (k, l) in kids)
            e += bpp_predict._ML_UNPAIRED * u
    return e


def brute_force(seq):
    """(pair -> probability, Z) over the full enumerated ensemble."""
    structures = enumerate_structures(seq)
    weights = [math.exp(-_loop_energy(seq, s) / bpp_predict.KT37)
               for s in structures]
    z = sum(weights)
    probs = {}
    for s, w in zip(structures, weights):
        for pair in s:
            probs[pair] = probs.get(pair, 0.0) + w / z
    return probs, z


SEQS = [
    "GGGCAAACGCCC",
    "GCAUCUAUGC",
    "AUAUAUAU",
    "GGGGAAAACCCC",
    "ACGUACGUACGUAC",
    "GGGAGGAAACCUCCC",          # bulges + internal loops
    "GGCAGGGAAACCCAAGGGAAACCCGCC",  # multiloop (two stems under a helix)
    "GCGGAAAUCAAGCUUCGAC",
]


@pytest.mark.parametrize("seq", SEQS)
def test_bpp_matches_brute_force(seq):
    expected, _ = brute_force(seq)
    probs = bpp_predict.basepair_probability_matrix(seq)
    n = len(seq)
    for i in range(n):
        for j in range(i + 1, n):
            want = expected.get((i, j), 0.0)
            assert probs[i, j] == pytest.approx(want, abs=1e-6), (i, j)


@pytest.mark.parametrize("seq", SEQS[:4] + SEQS[5:7])
def test_logz_matches_brute_force(seq):
    from lara_tpu.scoring.ribosum import encode_rna5

    _, z = brute_force(seq)
    _, logz = bpp_predict._log_partition_and_bpp(encode_rna5(seq))
    assert logz == pytest.approx(math.log(z), abs=1e-9)


def test_random_sequences_match_brute_force():
    rng = np.random.default_rng(11)
    for length in (10, 13, 16, 18):
        seq = "".join("ACGU"[k] for k in rng.integers(0, 4, length))
        expected, z = brute_force(seq)
        if z == 0.0:
            continue
        probs = bpp_predict.basepair_probability_matrix(seq)
        for (i, j), want in expected.items():
            assert probs[i, j] == pytest.approx(want, abs=1e-6), (seq, i, j)


def test_scale_invariance():
    """Two forced scale factors give identical probabilities -- pins the
    s^L bookkeeping of every recursion term."""
    from lara_tpu.scoring.ribosum import encode_rna5

    rng = np.random.default_rng(3)
    seq = "".join("ACGU"[k] for k in rng.integers(0, 4, 60))
    enc = encode_rna5(seq)
    p1, z1 = bpp_predict._inside_outside(enc, 0.25)
    p2, z2 = bpp_predict._inside_outside(enc, 1.30)
    assert z1 == pytest.approx(z2, abs=1e-8)
    assert np.abs(p1 - p2).max() < 1e-9


def test_long_sequence_rescale_path():
    """A 400nt sequence exercises the automatic scale-retry logic."""
    rng = np.random.default_rng(5)
    seq = "".join("ACGU"[k] for k in rng.integers(0, 4, 400))
    probs = bpp_predict.basepair_probability_matrix(seq)
    assert np.all(np.isfinite(probs))
    assert probs.min() >= 0.0 and probs.max() <= 1.0
    assert probs.max() > 0.05          # something pairs in 400 random nt
    # row marginals are probabilities of "base i is paired": bounded by 1
    assert probs.sum(axis=1).max() <= 1.0 + 1e-6


def test_short_sequence_no_pairs():
    probs = bpp_predict.basepair_probability_matrix("ACG")
    assert probs.shape == (3, 3)
    assert np.all(probs == 0.0)


def test_probability_dict_filters_zeros():
    probs = bpp_predict.basepair_probabilities("GGGGAAAACCCC")
    assert probs, "expected at least one base pair"
    assert all(0.0 < p <= 1.0 for p in probs.values())
    assert all(i < j for (i, j) in probs)
    # the innermost stem pair should be confidently present
    assert probs[(3, 8)] > 0.5


def test_predict_builtin_end_to_end(tmp_path):
    """--predict builtin feeds the full input pipeline (records.py path)."""
    from lara_tpu.io.records import InputStorage

    fasta = tmp_path / "two.fa"
    fasta.write_text(">a\nGGGGCAAAAGCCCC\n>b\nGGGCAAAAAGCCC\n")
    store = InputStorage(in_file=str(fasta), predict_structures="builtin")
    assert len(store) == 2
    for record in store:
        assert record.bpp_edges, record.name
        for (i, j, w) in record.bpp_edges:
            assert i < j


def test_parallel_prediction_matches_serial(tmp_path, monkeypatch):
    """-j parallelises the per-record builtin prediction over worker
    processes (io.hpp:88-89 role); results must be identical to the
    serial loop."""
    import numpy as np
    from lara_tpu.io import records as records_mod
    from lara_tpu.io.records import InputStorage

    rng = np.random.default_rng(17)
    seqs = ["".join("ACGU"[k] for k in rng.integers(0, 4, 60))
            for _ in range(6)]
    fa = tmp_path / "many.fa"
    fa.write_text("".join(f">s{i}\n{s}\n" for i, s in enumerate(seqs)))
    serial = InputStorage(in_file=str(fa), predict_structures="builtin")
    monkeypatch.setattr(records_mod, "PARALLEL_PREDICT_MIN_WORK", 0)
    parallel = InputStorage(in_file=str(fa), predict_structures="builtin",
                            threads=4)
    for a, b in zip(serial, parallel):
        assert a.bpp_edges == b.bpp_edges, a.name
