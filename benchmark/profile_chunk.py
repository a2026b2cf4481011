"""Profile one 50-iteration device-solver chunk on bench-shaped input.

Usage: python benchmark/profile_chunk.py  — prints ms/iteration for the
fused solver body on the tRNA-scale all-pairs batch (the bench workload).
Used for kernel-level optimization work; not part of the test suite.
"""
import sys
import time

import numpy as np


def build_batch(scale: str = "trna"):
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    import bench
    from lara_tpu.app import _apply_platform_env, enumerate_pairs
    from lara_tpu.params import Parameters
    from lara_tpu.scoring.ribosum import encode_rna5
    from lara_tpu.solver import device_solver, interactions
    from lara_tpu.ops import gotoh
    from lara_tpu.types import f2i

    _apply_platform_env()
    params = Parameters(in_file="<bench>")
    if scale == "16s":
        store = bench.make_long_family(n=2)
        la_max = lb_max = 1536
    else:
        store = bench.make_family(n=16)
        la_max = lb_max = 96
    pairs = enumerate_pairs(store)
    b = len(pairs)
    go, ge = int(params.gap_open_int), int(params.gap_extend_int)
    subopt = int(f2i(params.suboptimal_diff))
    seq_a = np.full((b, la_max), 4, np.int32)
    seq_b = np.full((b, lb_max), 4, np.int32)
    las = np.zeros(b, np.int32)
    lbs = np.zeros(b, np.int32)
    for k, (ia, ib) in enumerate(pairs):
        ea, eb = encode_rna5(store[ia].sequence), encode_rna5(store[ib].sequence)
        las[k], lbs[k] = len(ea), len(eb)
        seq_a[k, : len(ea)] = ea
        seq_b[k, : len(eb)] = eb
    active_dev, opt_dev = gotoh.edge_filter_batch(
        seq_a, seq_b, las, lbs, np.asarray(params.score_matrix), go, ge,
        subopt, la_max, lb_max)
    active_np, opt_np = np.asarray(active_dev), np.asarray(opt_dev)
    models = [
        interactions.build_pair_model(
            store[ia], store[ib], params, active_np[k, : las[k], : lbs[k]],
            int(opt_np[k]))
        for k, (ia, ib) in enumerate(pairs)
    ]
    dcap = 3072
    ne = la_max * lb_max
    bp = 1 if scale == "16s" else 128
    seq_score = np.zeros((bp, la_max, lb_max), np.int32)
    act = np.zeros((bp, la_max, lb_max), bool)
    dual_l = np.zeros((bp, dcap), np.int32)
    dual_m = np.zeros((bp, dcap), np.int32)
    sscore = np.zeros((bp, dcap), np.int32)
    rev = np.broadcast_to(np.arange(dcap, dtype=np.int32), (bp, dcap)).copy()
    dvalid = np.zeros((bp, dcap), bool)
    qrank = np.broadcast_to(np.arange(dcap, dtype=np.int32), (bp, dcap)).copy()
    for k, m in enumerate(models):
        seq_score[k, : m.la, : m.lb] = m.seq_score
        act[k, : m.la, : m.lb] = m.active
        d = len(m.dual_l)
        a_ids, b_ids = np.divmod(m.dual_l, m.lb)
        dual_l[k, :d] = a_ids * lb_max + b_ids
        a_ids, b_ids = np.divmod(m.dual_m, m.lb)
        dual_m[k, :d] = a_ids * lb_max + b_ids
        sscore[k, :d] = m.sscore
        rev[k, :d] = m.rev
        dvalid[k, :d] = True
        qrank[k, :d][m.qperm] = np.arange(d, dtype=np.int32)
    batch = device_solver.BatchModel(
        seq_score=jnp.asarray(seq_score.reshape(bp, ne)),
        active=jnp.asarray(act.reshape(bp, ne)),
        dual_l=jnp.asarray(dual_l), dual_m=jnp.asarray(dual_m),
        sscore=jnp.asarray(sscore), rev=jnp.asarray(rev),
        dvalid=jnp.asarray(dvalid), qrank=jnp.asarray(qrank),
        la=jnp.asarray(np.concatenate([las, np.ones(bp - b, np.int32)])),
        lb=jnp.asarray(np.concatenate([lbs, np.ones(bp - b, np.int32)])),
    )
    return batch, params, go, ge, la_max, lb_max, bp, dcap


def main():
    import jax
    from lara_tpu.solver import device_solver

    batch, params, go, ge, la_max, lb_max, bp, dcap = build_batch()
    carry = device_solver._init_carry(
        bp, dcap, min(la_max, lb_max), np.float32(params.step_size_factor), 500)

    def f(c):
        return device_solver.solve_batch_chunk(
            batch, c, go, ge, la_max, lb_max, 50,
            int(params.max_nondecr_iterations), int(params.matching), 4, 1024)

    c2 = f(carry)
    jax.block_until_ready(c2.dual)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        c2 = f(c2)
        jax.block_until_ready(c2.dual)
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"chunk(50): {best*1000:.1f} ms -> {best*20:.2f} ms/iter")


if __name__ == "__main__":
    main()
