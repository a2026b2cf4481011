"""Built-in McCaskill predictor vs. brute-force structure enumeration."""

import itertools
import math

import numpy as np
import pytest

from lara_tpu.solver import bpp_predict

PAIR_W = {
    ("A", "U"): 2.0, ("U", "A"): 2.0,
    ("C", "G"): 3.0, ("G", "C"): 3.0,
    ("G", "U"): 1.0, ("U", "G"): 1.0,
}


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
            if (seq[i], seq[k]) not in PAIR_W:
                continue
            for inner in rec(i + 1, k - 1):
                for outer in rec(k + 1, j):
                    structures.append(inner | outer | {(i, k)})
        cache[(i, j)] = structures
        return structures

    return rec(0, n - 1)


def brute_force_bpp(seq):
    structures = enumerate_structures(seq)
    weights = []
    for s in structures:
        logw = sum(PAIR_W[(seq[i], seq[j])] for (i, j) in s)
        # helix stacking bonus: pair (i, j) whose enclosed neighbour
        # (i+1, j-1) is also in the structure
        logw += bpp_predict.STACK_KT * sum(
            1 for (i, j) in s if (i + 1, j - 1) in s)
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
    logw = bpp_predict.pair_log_weights(encode_rna5(seq), pad_to=padded)
    logz, _ = bpp_predict._logz_grad_fn(padded)(logw)
    assert float(logz) == pytest.approx(math.log(z), abs=1e-3)


def test_numpy_matches_autodiff_oracle():
    """The production NumPy inside-outside equals the jax.grad-through-scan
    oracle (the derivative identity p = dlogZ/dlogw)."""
    from lara_tpu.scoring.ribosum import encode_rna5

    rng = np.random.default_rng(7)
    for length in (12, 27):
        seq = "".join("ACGU"[k] for k in rng.integers(0, 4, length))
        enc = encode_rna5(seq)
        logw = bpp_predict.pair_log_weights(enc, pad_to=32)
        _, grad = bpp_predict._logz_grad_fn(32)(logw)
        g = np.asarray(grad)[:length, :length]
        p = bpp_predict._bpp_matrix_numpy(
            bpp_predict.pair_log_weights(enc))[:length, :length]
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
