"""Device backend vs. scalar reference mirror: bit-identical outputs."""

import numpy as np
import pytest

from lara_tpu.io.records import InputStorage
from lara_tpu.io.writers import OutputLibrary
from lara_tpu.params import Parameters
from lara_tpu.solver import interactions, reference_driver


def write_family(tmp_path, n=5, seed=0):
    """A small synthetic RNA family: related hairpins with noisy loops."""
    rng = np.random.default_rng(seed)
    base = "GGGCGCAAGCCUUAAGGCGCCC"
    struct = "((((((....))))..((..))"  # deliberately quirky, len 22
    base_struct = "(((((((......))))))).."
    lines = []
    for k in range(n):
        seq = list(base)
        # mutate a few loop positions
        for _ in range(rng.integers(1, 4)):
            pos = int(rng.integers(0, len(seq)))
            seq[pos] = "ACGU"[rng.integers(0, 4)]
        # occasionally shorten
        if k % 2 == 1:
            seq = seq[:-2]
            st = base_struct[: len(seq) - 2] + ".."
        else:
            st = base_struct
        st = st[: len(seq)]
        # repair unbalanced brackets after truncation
        opens = st.count("(") - st.count(")")
        if opens > 0:
            st = st.replace("(", ".", opens)
        lines.append(f">seq{k}\n{''.join(seq)}\n{st}")
    path = tmp_path / "family.dbn"
    path.write_text("\n".join(lines) + "\n")
    return str(path)


def run_backend(path, backend, **kw):
    params = Parameters(in_file=path, backend=backend, **kw)
    store = InputStorage(in_file=path)
    lib = OutputLibrary(store, params.out_format)
    from lara_tpu.app import enumerate_pairs

    pairs = enumerate_pairs(store)
    if backend == "reference":
        for (ia, ib) in pairs:
            res = reference_driver.solve_pair(store[ia], store[ib], params, (ia, ib))
            lib.add_alignment(res.seq_indices, res.columns, res.score)
    else:
        from lara_tpu.solver import device_driver

        for res in device_driver.solve_all(store, pairs, params):
            lib.add_alignment(res.seq_indices, res.columns, res.score)
    return lib.to_string()


def test_pair_model_matches_reference_build(tmp_path):
    path = write_family(tmp_path, n=3, seed=1)
    store = InputStorage(in_file=path)
    params = Parameters(in_file=path)
    state = reference_driver.build_lagrange(store[0], store[1], params)
    model = interactions.build_pair_model(
        store[0], store[1], params,
        np.asarray(state.active), _opt_score(store, params, 0, 1),
    )
    np.testing.assert_array_equal(model.seq_score, state.seq_score)
    # same dual set (order may differ between builders)
    ref_set = sorted(zip(state.dual_l.tolist(), state.dual_m.tolist(),
                         state.sscore.tolist()))
    got_set = sorted(zip(model.dual_l.tolist(), model.dual_m.tolist(),
                         model.sscore.tolist()))
    assert ref_set == got_set
    # rev is a consistent involution
    assert np.array_equal(model.dual_l[model.rev], model.dual_m)
    assert np.array_equal(model.rev[model.rev], np.arange(len(model.rev)))


def _opt_score(store, params, ia, ib):
    from lara_tpu.scoring.ribosum import encode_rna5
    from lara_tpu.solver import oracle
    from lara_tpu.types import f2i

    _active, opt = oracle.generate_edges(
        encode_rna5(store[ia].sequence), encode_rna5(store[ib].sequence),
        params.score_matrix, int(params.gap_open_int), int(params.gap_extend_int),
        int(f2i(params.suboptimal_diff)),
    )
    return opt


@pytest.mark.parametrize("seed", [0, 3])
def test_device_backend_matches_reference_lib(tmp_path, seed):
    path = write_family(tmp_path, n=4, seed=seed)
    ref = run_backend(path, "reference", num_iterations=60)
    dev = run_backend(path, "device", num_iterations=60)
    assert dev == ref


def test_device_backend_matches_reference_linear_libscore(tmp_path):
    path = write_family(tmp_path, n=3, seed=5)
    common = dict(num_iterations=60, library_score_min=0, library_score_max=100,
                  library_score_is_linear=True)
    ref = run_backend(path, "reference", **common)
    dev = run_backend(path, "device", **common)
    assert dev == ref


def test_device_backend_conflicting_structures(tmp_path):
    # forces the subgradient + matching path over many iterations
    path = tmp_path / "conflict.dbn"
    path.write_text(
        ">x\nGGGAAAGGGAAACCCAAACCC\n(((...(((...)))...)))\n"
        ">y\nGGGAAAGGGAAACCCAAACCC\n(((...)))...(((...)))\n"
        ">z\nGGGAAAGGGAAACCCAAACC\n((....((....))....))\n"
    )
    ref = run_backend(str(path), "reference", num_iterations=80)
    dev = run_backend(str(path), "device", num_iterations=80)
    assert dev == ref


def test_pipelined_chunks_match_serial(tmp_path, monkeypatch):
    """Mixed length classes produce multiple buckets; the cross-chunk
    pipeline (prepare k+1 while k solves in a background thread) must be
    byte-identical to the serial path."""
    path = tmp_path / "mixed.dbn"
    lines = []
    short = "GGGCGCAAGCCUUAAGGCGCCC"
    long_ = ("GGGCGCAAGCCUUAAGGCGCCCAAGGCUUAGCGGGCGCAAGCCUUAAGGCGCCCAAGGCUUAGC")
    st_s = "(((((((......))))))).."
    st_l = "(((((((......)))))))............(((((((......)))))))............"
    rng = np.random.default_rng(9)
    for k in range(3):
        seq = list(short)
        seq[int(rng.integers(0, len(seq)))] = "ACGU"[rng.integers(0, 4)]
        lines.append(f">s{k}\n{''.join(seq)}\n{st_s}")
    for k in range(3):
        seq = list(long_)
        seq[int(rng.integers(0, len(seq)))] = "ACGU"[rng.integers(0, 4)]
        lines.append(f">l{k}\n{''.join(seq)}\n{st_l}")
    # a third length class: with >2 tasks the pipeline's depth-2 window
    # drains mid-loop (downloads of chunk k while k+2 is being prepared)
    longer = long_ + "GGGCGCAAGCCUUAAGGCGCCCAAGGCUUAGC"
    st_x = st_l + "(((((((......)))))))............"[: len(longer) - len(st_l)]
    for k in range(2):
        seq = list(longer)
        seq[int(rng.integers(0, len(seq)))] = "ACGU"[rng.integers(0, 4)]
        lines.append(f">x{k}\n{''.join(seq)}\n{st_x}")
    path.write_text("\n".join(lines) + "\n")

    monkeypatch.setenv("LARA_NO_PIPELINE", "1")
    serial = run_backend(str(path), "device", num_iterations=40)
    monkeypatch.delenv("LARA_NO_PIPELINE")
    pipelined = run_backend(str(path), "device", num_iterations=40)
    assert pipelined == serial
    # sanity: this workload really is 3 buckets (the pipeline engaged and
    # its depth-2 window drained mid-loop)
    from lara_tpu.solver.device_driver import _pad_dim
    assert len({_pad_dim(len(short)), _pad_dim(len(long_)),
                _pad_dim(len(longer))}) == 3


def test_lane_refill_matches_serial(tmp_path, monkeypatch):
    """Chunk-boundary lane refill (converged lanes take waiting pairs,
    subgradient_solver.hpp:286-325) must be byte-identical to plain
    sequential chunking over the same bucket."""
    path = write_family(tmp_path, n=6, seed=13)  # 15 pairs in one bucket

    monkeypatch.setenv("LARA_MAX_BATCH", "4")    # force pairs > lanes
    monkeypatch.setenv("LARA_NO_REFILL", "1")
    serial = run_backend(path, "device", num_iterations=60)
    monkeypatch.delenv("LARA_NO_REFILL")
    monkeypatch.setenv("LARA_REFILL", "1")       # engage despite CPU mesh
    refill = run_backend(path, "device", num_iterations=60)
    assert refill == serial


def test_single_bucket_split_matches_unsplit(tmp_path, monkeypatch):
    """A single-bucket workload split into two pipelined chunks (so the host
    phases of half 2 hide behind half 1's device solve — the long-pair
    default) must be byte-identical to the one-chunk path."""
    path = write_family(tmp_path, n=5, seed=17)  # 10 pairs, one bucket

    monkeypatch.setenv("LARA_SPLIT_SINGLE", "0")
    unsplit = run_backend(path, "device", num_iterations=60)
    monkeypatch.setenv("LARA_SPLIT_SINGLE", "1")  # force despite short pairs
    split = run_backend(path, "device", num_iterations=60)
    assert split == unsplit


def test_scheduler_knobs_all_match_mirror(tmp_path, monkeypatch):
    """Capstone scheduler-equivalence check: every batching/pipelining
    configuration of the driver must produce the mirror's bytes on the same
    workload — the scheduler may only change WHEN work runs, never results
    (the reference's determinism property, io.hpp:352-383)."""
    path = write_family(tmp_path, n=5, seed=41)  # 10 pairs, one bucket
    ref = run_backend(path, "reference", num_iterations=50)

    configs = [
        {},                                            # default pipeline
        {"LARA_NO_PIPELINE": "1"},                     # serial chunks
        {"LARA_SPLIT_SINGLE": "1"},                    # forced bucket split
        {"LARA_MAX_BATCH": "3"},                       # chunking + pipeline
        {"LARA_MAX_BATCH": "4", "LARA_REFILL": "1"},   # lane refill
    ]
    for env in configs:
        for key, val in env.items():
            monkeypatch.setenv(key, val)
        assert run_backend(path, "device", num_iterations=50) == ref, env
        for key in env:
            monkeypatch.delenv(key)


def test_balance_auto_device_matches_mirror(tmp_path):
    """-b auto derives a per-pair balance from the edge-filter identity;
    the device path and the scalar mirror must agree bit-for-bit."""
    path = write_family(tmp_path, n=4, seed=21)
    common = dict(num_iterations=60, balance_auto=True)
    ref = run_backend(path, "reference", **common)
    dev = run_backend(path, "device", **common)
    assert dev == ref
