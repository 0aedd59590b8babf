"""Measured CPU anchor for the bench's vs_baseline denominator.

The reference cannot be built in this container (Boost/CGAL absent with
zero egress — see BUILD_REFERENCE_LOG.md for the logged attempt), so the
closest obtainable measurement is THIS framework's own dense stage run
CPU-only at the identical bench workload: same scene construction, same
config, same 2-sweeps x 2-phases round as bench.py's timed region
(exact scoring routes through the XLA-CPU direct-bilinear backend — the
same cost terms the TPU path computes).

    python -m hcmvs_tpu.eval.cpu_anchor [--sizes 240x320,480x640]

Prints one JSON line per size:
    {"metric": "cpu_views_per_s", "h":..., "w":..., "value":...,
     "n_threads":...}

Interpretation: XLA:CPU parallelizes the whole-image tensor ops across
host threads, so views/s scales ~linearly with cores for this workload;
scale by (32 / n_threads) to compare against a 32-core-node estimate.
Ref workload unit: the per-depth-map TD_TIMER log the reference prints
(frame_main/libs/MVS/SceneDensify.cpp:1066-1070).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="240x320,480x640",
                    help="comma list of HxW")
    ap.add_argument("--n-views", type=int, default=4)
    ap.add_argument("--v-nbr", type=int, default=3)
    ap.add_argument("--rounds", type=int, default=2)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
    import bench
    from hcmvs_tpu.dense.scene_driver import phase_cfg, scene_sweeps

    n_threads = os.cpu_count() or 1
    for size in args.sizes.split(","):
        h, w = (int(t) for t in size.split("x"))
        state, scene, cfg = bench._build(args.n_views, h, w, args.v_nbr)

        def one_round(st):
            st = scene_sweeps(st, scene, phase_cfg(cfg, 0), 0,
                              cfg.estimation_iters, False)
            st = scene_sweeps(st, scene, phase_cfg(cfg, 1, True), 1,
                              cfg.estimation_iters, True)
            jax.block_until_ready(st.depth)
            return st

        state = one_round(state)            # compile + warmup
        per_round = []
        for _ in range(args.rounds):
            t0 = time.perf_counter()
            state = one_round(state)
            per_round.append(time.perf_counter() - t0)
        elapsed = min(per_round)
        print(json.dumps({
            "metric": "cpu_views_per_s", "h": h, "w": w,
            "value": round(args.n_views / elapsed, 4),
            "round_s": round(elapsed, 2),
            "n_threads": n_threads,
            "unit": f"views/s ({w}x{h}, {args.v_nbr} nbrs, 2 sweeps x 2 "
                    f"phases, XLA:CPU {n_threads} threads)"}), flush=True)


if __name__ == "__main__":
    main()
