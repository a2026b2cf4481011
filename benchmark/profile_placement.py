"""Microbenchmark PSSM-placement variants at production bench shapes
(B=128, D=2048, 96x96, e_cap=1024).  Arbitrates the per-iteration
compaction sort vs a sort-free full-width placement.  Used for kernel-level
optimization work; not part of the test suite.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "benchmark")


def main():
    import jax
    import jax.numpy as jnp

    from lara_tpu.solver import device_solver as ds

    I32 = jnp.int32
    NEG_INF = ds.NEG_INF
    rng = np.random.default_rng(0)
    b, d, la_max, lb_max = 128, 2048, 96, 96
    ne = la_max * lb_max
    e_cap = 1024

    # synthetic model with bench-like run structure: ~550 edges/lane,
    # run lengths 1..11
    dual_l = np.full((b, d), -1, np.int32)
    dvalid = np.zeros((b, d), bool)
    for k in range(b):
        pos = 0
        cells = np.sort(rng.choice(ne, 700, replace=False))
        for c in cells:
            run = int(rng.integers(1, 12))
            if pos + run > d - 16:
                break
            dual_l[k, pos:pos + run] = c
            dvalid[k, pos:pos + run] = True
            pos += run
    dual_l = jnp.asarray(dual_l)
    dvalid = jnp.asarray(dvalid)
    bonus0 = jnp.asarray(
        rng.integers(0, 60000, (b, d)).astype(np.int32))

    iota_d = jnp.broadcast_to(jnp.arange(d, dtype=I32), (b, d))
    prev_l = jnp.concatenate(
        [jnp.full((b, 1), -1, I32), dual_l[:, :-1]], axis=1)
    is_start = dvalid & (dual_l != prev_l)
    n_starts = jnp.sum(is_start, axis=1).astype(I32)
    start_rank = jnp.cumsum(is_start.astype(I32), axis=1) - 1
    compact_key = jnp.where(is_start, start_rank, d + iota_d)
    _, cells_sorted = jax.lax.sort(
        (compact_key, dual_l), dimension=1, num_keys=1)
    iota_e = jnp.arange(e_cap, dtype=I32)[None, :]
    cells = jnp.where(iota_e < n_starts[:, None], cells_sorted[:, :e_cap], ne)
    cell_a = cells // lb_max
    cell_b = cells - cell_a * lb_max
    cell_ok = cells < ne
    rowhot = ((cell_a[:, None, :] == jnp.arange(la_max, dtype=I32)[None, :, None])
              & cell_ok[:, None, :]).astype(jnp.int8)        # [B, LA, E]
    colhot = ((cell_b[:, :, None] == jnp.arange(lb_max, dtype=I32)[None, None, :])
              & cell_ok[:, :, None]).astype(jnp.int8)        # [B, E, LB]

    # full-width (sort-free) one-hot operands over D
    f_cell = jnp.where(is_start, dual_l, ne)
    f_a = f_cell // lb_max
    f_b = f_cell - f_a * lb_max
    f_ok = f_cell < ne
    rowhot_d = ((f_a[:, None, :] == jnp.arange(la_max, dtype=I32)[None, :, None])
                & f_ok[:, None, :]).astype(jnp.int8)         # [B, LA, D]
    colhot_d = ((f_b[:, :, None] == jnp.arange(lb_max, dtype=I32)[None, None, :])
                & f_ok[:, :, None]).astype(jnp.int8)         # [B, D, LB]

    rev = jnp.asarray(rng.permutation(d)[None, :].repeat(b, 0).astype(np.int32))
    rev_packed = rev * 2

    REPS = 200

    def timeit(name, fn, *args):
        f = jax.jit(lambda *a: jax.lax.fori_loop(
            0, REPS, lambda i, c: (fn(*a, c), )[0], jnp.int32(0)))
        r = f(*args)
        jax.block_until_ready(r)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*args))
            times.append(time.perf_counter() - t0)
        print(f"{name:44s} {min(times)/REPS*1000:8.3f} ms/iter", flush=True)

    def chk(x, c):
        return c + x.reshape(-1)[0].astype(jnp.int32)

    # 0. the compaction sort alone
    def s_sort(bonus, c):
        _, vc = jax.lax.sort((compact_key, bonus + c), dimension=1, num_keys=1)
        return chk(vc, c)
    timeit("compaction sort alone [B,D]", s_sort, bonus0)

    def place_int8(vc, rh, ch, width, c):
        colval = jnp.concatenate(
            [ch * ((vc >> s) & 0x7F).astype(jnp.int8)[:, :, None]
             for s in (28, 21, 14, 7, 0)], axis=2)
        out = jnp.matmul(rh, colval, preferred_element_type=I32)
        placed = (out[:, :, :width] << 28) \
            | (out[:, :, width:2 * width] << 21) \
            | (out[:, :, 2 * width:3 * width] << 14) \
            | (out[:, :, 3 * width:4 * width] << 7) \
            | out[:, :, 4 * width:]
        return chk(placed, c)

    # 1. production: sort + e_cap int8 limb matmul
    def s_prod(bonus, c):
        _, vc = jax.lax.sort((compact_key, bonus + c), dimension=1, num_keys=1)
        return place_int8(vc[:, :e_cap], rowhot, colhot, lb_max, c)
    timeit("production: sort + e_cap int8 matmul", s_prod, bonus0)

    # 2. sort-free: full-width D int8 limb matmul
    def s_full(bonus, c):
        vc = jnp.where(is_start, bonus + c, 0)
        return place_int8(vc, rowhot_d, colhot_d, lb_max, c)
    timeit("sort-free: D-wide int8 matmul", s_full, bonus0)

    # 3. rev sort 2-array vs packed
    def s_rev2(bonus, c):
        pick = dvalid & ((bonus + c) > 30000)
        _, pick_rev = jax.lax.sort((rev, pick), dimension=1, num_keys=1)
        return chk(pick_rev, c)
    timeit("rev sort 2-array", s_rev2, bonus0)

    def s_revp(bonus, c):
        pick = dvalid & ((bonus + c) > 30000)
        srt = jax.lax.sort(rev_packed | pick.astype(I32), dimension=1)
        return chk(srt & 1, c)
    timeit("rev sort packed", s_revp, bonus0)


if __name__ == "__main__":
    main()
