"""Hybrid solver: batched device DP + native host bookkeeping + work stealing.

Each subgradient iteration splits across the hardware the way the work is
shaped (the reference's own CPU split, re-targeted):

* **device**: the batched structure-profit-augmented Gotoh DP + traceback
  (Pallas wavefront kernels on TPU) -- the O(L^2 * B) FLOPs,
* **host (C++)**: per-pair sparse bookkeeping -- priority-queue maxima,
  subgradients, greedy matching, dual updates, incremental PSSM refresh --
  touching only O(lines * partners) state (:mod:`lara_tpu.native.lagrange`),
* **work stealing**: a lane whose pair converges is refilled from the pending
  queue immediately (the reference's shared-iterator steal,
  ``subgradient_solver.hpp:298-307``), so the batch never idles on the
  convergence tail the way a fused masked ``while_loop`` does.

The dense [B, D] on-device formulation (:mod:`lara_tpu.solver.device_solver`)
remains the backend for multi-chip ``shard_map`` runs and for CPU testing;
on partner-heavy inputs (base-pair-probability dot plots) its per-iteration
gather/scatter cost scales with the padded dual dimension, while this path
stays proportional to the touched state.

Per-iteration host<->device traffic: the PSSM batch up ([B, LA, LB] int32,
written in place by C++ into one pinned buffer), the line lists down
([B, LCAP, 2] + three [B] vectors).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List, Sequence, Tuple

import numpy as np

from lara_tpu.params import Parameters
from lara_tpu.solver.reference_driver import PairResult
from lara_tpu.types import PSSM_INIT
from lara_tpu.utils import log


def solve_all(store, pairs: Sequence[Tuple[int, int]], params: Parameters,
              max_lanes: int = 512) -> Iterator[PairResult]:
    """Solve all pairs with bucketed batching + lane refill."""
    from lara_tpu.solver.device_driver import _pad_dim

    buckets: Dict[Tuple[int, int], List[Tuple[int, int]]] = {}
    for (ia, ib) in pairs:
        key = (_pad_dim(len(store[ia].sequence)), _pad_dim(len(store[ib].sequence)))
        buckets.setdefault(key, []).append((ia, ib))

    cell_budget = 128 * 1024 * 1024
    for (la_max, lb_max), bucket_pairs in sorted(buckets.items(), reverse=True):
        lanes = max(1, min(max_lanes, cell_budget // (la_max * lb_max)))
        yield from _solve_bucket(store, bucket_pairs, params, la_max, lb_max, lanes)


def _build_models(store, chunk, params, la_max, lb_max):
    import jax  # noqa: F401  (device selected lazily)

    from lara_tpu.ops import gotoh
    from lara_tpu.scoring.ribosum import encode_rna5
    from lara_tpu.solver import interactions
    from lara_tpu.types import f2i

    b = len(chunk)
    go, ge = int(params.gap_open_int), int(params.gap_extend_int)
    seq_a = np.full((b, la_max), 4, np.int32)
    seq_b = np.full((b, lb_max), 4, np.int32)
    las = np.zeros(b, np.int32)
    lbs = np.zeros(b, np.int32)
    for k, (ia, ib) in enumerate(chunk):
        ea = encode_rna5(store[ia].sequence)
        eb = encode_rna5(store[ib].sequence)
        las[k], lbs[k] = len(ea), len(eb)
        seq_a[k, : len(ea)] = ea
        seq_b[k, : len(eb)] = eb
    active_dev, opt_dev = gotoh.edge_filter_batch(
        seq_a, seq_b, las, lbs, np.asarray(params.score_matrix), go, ge,
        int(f2i(params.suboptimal_diff)), la_max, lb_max,
    )
    active_np = np.asarray(active_dev)
    opt_np = np.asarray(opt_dev)
    return [
        interactions.build_pair_model(
            store[ia], store[ib], params,
            active_np[k, : las[k], : lbs[k]], int(opt_np[k]),
        )
        for k, (ia, ib) in enumerate(chunk)
    ]


def _solve_bucket(store, bucket_pairs, params: Parameters,
                  la_max: int, lb_max: int, lanes: int) -> Iterator[PairResult]:
    import jax
    import jax.numpy as jnp

    from lara_tpu.native.lagrange import PairSolver
    from lara_tpu.solver.device_solver import _align

    lanes = min(lanes, len(bucket_pairs))
    log(2, f"     hybrid bucket: {len(bucket_pairs)} pairs, {lanes} lanes, "
           f"{la_max}x{lb_max}")
    go, ge = int(params.gap_open_int), int(params.gap_extend_int)
    lcap = min(la_max, lb_max)

    # model prefetch: build in chunks so lane refills rarely wait on the host
    pending = list(bucket_pairs)
    model_cache: List = []

    def refill_cache():
        nonlocal pending
        if not model_cache and pending:
            chunk = pending[:max(lanes, 64)]
            pending = pending[len(chunk):]
            models = _build_models(store, chunk, params, la_max, lb_max)
            model_cache.extend(zip(chunk, models))

    pssm = np.full((lanes, la_max, lb_max), int(PSSM_INIT), np.int32)
    slots: List = [None] * lanes  # (pair, PairSolver) or None
    las = np.ones(lanes, np.int32)
    lbs = np.ones(lanes, np.int32)
    lane_active = np.zeros(lanes, bool)

    def fill_lane(k: int) -> None:
        refill_cache()
        if not model_cache:
            return
        pair, model = model_cache.pop(0)
        pssm[k] = int(PSSM_INIT)
        solver = PairSolver(model, params, pssm[k])
        slots[k] = (pair, solver)
        las[k], lbs[k] = model.la, model.lb
        lane_active[k] = True

    for k in range(lanes):
        fill_lane(k)

    pool = ThreadPoolExecutor(max_workers=min(16, lanes))
    try:
        while lane_active.any():
            tb = _align(jnp.asarray(pssm), jnp.asarray(las), jnp.asarray(lbs),
                        np.int32(go), np.int32(ge), la_max, lb_max)
            lines = np.asarray(tb.lines)
            n_lines = np.asarray(tb.n_lines)
            gap = np.asarray(tb.gap_score)
            upper = np.asarray(tb.upper)

            def do_step(k: int) -> int:
                _pair, solver = slots[k]
                return solver.step(lines[k, : n_lines[k]], int(gap[k]),
                                   int(upper[k]))

            active_idx = [k for k in range(lanes) if lane_active[k]]
            statuses = list(pool.map(do_step, active_idx))
            for k, status in zip(active_idx, statuses):
                if status != 1:
                    continue
                (ia, ib), solver = slots[k]
                columns, best_lower, best_upper, iters = solver.result(params)
                solver.close()
                slots[k] = None
                lane_active[k] = False
                las[k] = lbs[k] = 1
                swap = ia > ib
                if swap:
                    columns = [(y, x, w) for (x, y, w) in columns]
                yield PairResult(
                    seq_indices=(min(ia, ib), max(ia, ib)),
                    columns=columns,
                    score=best_lower,
                    iterations=iters,
                    best_upper=best_upper,
                    best_lower=best_lower,
                )
                fill_lane(k)  # work stealing: refill immediately
    finally:
        pool.shutdown(wait=False)
        for slot in slots:
            if slot is not None:
                slot[1].close()
