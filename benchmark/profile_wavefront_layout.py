"""Sublane-packed wavefront layout experiment (round-4 verdict item 2a).

Question: at B=1/16S scale the wavefront rows are [1, 1664] — 7/8 of every
VPU op's sublanes are wasted.  Would packing the wavefront into native
[8, W/8] tiles cut the measured ~5 µs per sequential diagonal visit?

Method: standalone Mosaic kernels running a long chain of DEPENDENT
wavefront-shaped steps (roll + max + where, the forward kernel's inner
dependency structure) in three layouts at equal element count, timed by
the steps-count slope inside ONE kernel call (robust to the tunnel's
unreliable dispatch timing):

* [1, 1664]  — the current B=1 row layout (7/8 sublane waste)
* [8, 256]   — sublane-packed (same 1664+pad elements, full tiles; the
               cross-row carry costs 2 extra ops per step)
* [8, 1664]  — B=8 batched rows (the production batched case)

If the per-step cost is layout-insensitive, the cost is per-unrolled-step
overhead (predication + addressing), not sublane waste, and the B=1
latency attack via layout is settled negative.

Run on the TPU:  python benchmark/profile_wavefront_layout.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from lara_tpu.app import _apply_platform_env

    _apply_platform_env()
    I32 = jnp.int32

    BLOCK = 64  # unrolled dependent steps per in-kernel fori iteration

    def make_chain(rows: int, cols: int, carry_rows: bool):
        """Kernel running reps x BLOCK dependent wavefront-style updates
        (reps arrives via SMEM, so one compiled kernel covers every trip
        count -- the steps-slope cancels launch/RTT noise, which dwarfs
        ms-scale kernels on the tunnel)."""

        def kern(reps_ref, x_ref, out_ref):
            col = jax.lax.broadcasted_iota(I32, (rows, cols), 1)

            def body(_, mh):
                m, h = mh
                for t in range(BLOCK):
                    ms = jnp.where(col == 0, -5,
                                   pltpu.roll(m, shift=1, axis=1))
                    if carry_rows:
                        # cross-row carry: lane 0 of row r takes the last
                        # lane of row r-1 (the packed layout's extra cost)
                        last = pltpu.roll(m[:, -1:], shift=1, axis=0)
                        ms = jnp.where(col == 0, last, ms)
                    best = jnp.maximum(ms, h)
                    m_new = best + (t & 3)
                    h = jnp.maximum(h + 1, m + (-2))
                    m = jnp.where(col == t % cols, -7, m_new)
                return m, h

            m = x_ref[...]
            m, h = jax.lax.fori_loop(0, reps_ref[0, 0], body, (m, m + 1))
            out_ref[...] = m + h

        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.int32),
        )

    def slope(rows, cols, carry_rows, lo=400, hi=3600, reps=3):
        x = jnp.ones((rows, cols), jnp.int32)
        f = jax.jit(make_chain(rows, cols, carry_rows))

        def t(n):
            r = jnp.array([[n]], jnp.int32)
            _ = np.asarray(f(r, x))[0, 0]  # warm + forced sync
            best = None
            for _ in range(reps):
                t0 = time.perf_counter()
                _ = np.asarray(f(r, x))[0, 0]
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            return best

        return (t(hi) - t(lo)) / ((hi - lo) * BLOCK)

    for label, rows, cols, carry in (
        ("[1, 1664] row layout (current B=1)", 1, 1664, False),
        ("[8, 256] sublane-packed (+carry ops)", 8, 256, True),
        ("[8, 1664] batched rows (B=8)", 8, 1664, False),
    ):
        per = slope(rows, cols, carry)
        print(f"{label}: {per*1e6:.2f} us/step", flush=True)


if __name__ == "__main__":
    main()
