"""Built-in McCaskill predictor vs. brute-force structure enumeration."""

import itertools
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


def brute_force_bpp(seq):
    """Turner-lite model: per-stack energies + terminal AU/GU penalties at
    both helix ends; bare pairs carry no energy (bpp_predict docstring)."""
    structures = enumerate_structures(seq)
    weights = []
    for s in structures:
        logw = 0.0
        for (i, j) in s:
            p = _ptype(seq, i, j)
            if (i + 1, j - 1) in s:  # stacked on the enclosed pair
                logw += float(bpp_predict._STACK_KT_TAB[
                    p, _ptype(seq, i + 1, j - 1)])
            else:                    # helix bottom end
                logw -= float(bpp_predict._TERM_KT[p])
            if (i - 1, j + 1) not in s:  # helix top end
                logw -= float(bpp_predict._TERM_KT[p])
        weights.append(math.exp(logw))
    z = sum(weights)
    probs = {}
    for s, w in zip(structures, weights):
        for pair in s:
            probs[pair] = probs.get(pair, 0.0) + w / z
    return probs, z


@pytest.mark.parametrize("seq", [
    "GGGCAAACGCCC",
    "GCAUCUAUGC",
    "AUAUAUAU",
    "GGGGAAAACCCC",
    "ACGUACGUACGUAC",
])
def test_bpp_matches_brute_force(seq):
    expected, z = brute_force_bpp(seq)
    probs = bpp_predict.basepair_probability_matrix(seq)
    n = len(seq)
    for i in range(n):
        for j in range(i + 1, n):
            want = expected.get((i, j), 0.0)
            assert probs[i, j] == pytest.approx(want, abs=2e-4), (i, j)


def test_logz_matches_brute_force():
    seq = "GGGCAAACGCCC"
    _, z = brute_force_bpp(seq)
    from lara_tpu.scoring.ribosum import encode_rna5

    padded = -(-len(seq) // 32) * 32
    logw, logc, term = bpp_predict.energy_terms(encode_rna5(seq),
                                               pad_to=padded)
    logz, _ = bpp_predict._logz_grad_fn(padded)(logw, logc, term)
    assert float(logz) == pytest.approx(math.log(z), abs=1e-3)


def test_numpy_matches_autodiff_oracle():
    """The production NumPy inside-outside equals the jax.grad-through-scan
    oracle (the derivative identity p = dlogZ/dlogw)."""
    from lara_tpu.scoring.ribosum import encode_rna5

    rng = np.random.default_rng(7)
    for length in (12, 27):
        seq = "".join("ACGU"[k] for k in rng.integers(0, 4, length))
        enc = encode_rna5(seq)
        logw, logc, term = bpp_predict.energy_terms(enc, pad_to=32)
        _, grad = bpp_predict._logz_grad_fn(32)(logw, logc, term)
        g = np.asarray(grad)[:length, :length]
        p = bpp_predict._bpp_matrix_numpy(
            *bpp_predict.energy_terms(enc))[:length, :length]
        assert np.abs(p - g).max() < 2e-4


def test_short_sequence_no_pairs():
    probs = bpp_predict.basepair_probability_matrix("ACG")
    assert probs.shape == (3, 3)
    assert np.all(probs == 0.0)


def test_probability_dict_filters_zeros():
    probs = bpp_predict.basepair_probabilities("GGGGAAAACCCC")
    assert probs, "expected at least one base pair"
    assert all(0.0 < p <= 1.0 for p in probs.values())
    assert all(i < j for (i, j) in probs)
    # the outermost stem pair should be confidently present
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
