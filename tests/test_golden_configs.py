"""Golden-fixture lock for the five BASELINE configs.

``tests/golden/`` holds committed inputs and frozen outputs generated once by
the scalar mirror (``tests/golden/make_golden.py``).  Locking BOTH backends
to these bytes turns the mirror from self-referential truth into a pinned
artifact: any change to either solver that alters output is caught here.

Configs (BASELINE.json):
  1. single short pair, fixed dot-bracket structures
  2. pairwise problems from base-pair probabilities (full Lagrangian loop)
  3. all-pairs family from Stockholm input
  4. long pair (16S-scale shape) with sparse dotplot-style bpp, truncated
     iterations (full-depth long runs are exercised on hardware by bench.py)
  5. pairs-format output
"""

import os

import pytest

from lara_tpu.app import run
from lara_tpu.params import Parameters

HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")

CONFIGS = [
    ("cfg1_pair.dbn", "cfg1.lib", {}),
    ("cfg2_bpp.ebpseq", "cfg2.lib", {"num_iterations": 100}),
    ("cfg3_family.sth", "cfg3.lib", {"num_iterations": 50}),
    ("cfg1_pair.dbn", "cfg5.pairs", {"out_format": "pairs"}),
]


def _run(in_name, backend, tmp_path, extra):
    out = tmp_path / f"out_{backend}_{in_name}.txt"
    params = Parameters(
        in_file=os.path.join(HERE, in_name),
        out_file=str(out),
        backend=backend,
        **extra,
    )
    run(params)
    return out.read_text()


@pytest.mark.parametrize("in_name,golden,extra", CONFIGS)
def test_reference_backend_matches_golden(in_name, golden, extra, tmp_path):
    expected = open(os.path.join(HERE, golden)).read()
    assert _run(in_name, "reference", tmp_path, extra) == expected


@pytest.mark.parametrize("in_name,golden,extra", CONFIGS)
def test_device_backend_matches_golden(in_name, golden, extra, tmp_path):
    expected = open(os.path.join(HERE, golden)).read()
    assert _run(in_name, "device", tmp_path, extra) == expected


@pytest.mark.slow
@pytest.mark.parametrize("backend", ["reference", "device"])
def test_long_pair_config4_matches_golden(backend, tmp_path):
    """16S-scale-shaped pair (1200 nt, sparse bpp), truncated iterations."""
    expected = open(os.path.join(HERE, "cfg4.lib")).read()
    got = _run("cfg4_long.ebpseq", backend, tmp_path,
               {"num_iterations": 3})
    assert got == expected
