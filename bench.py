"""Benchmark: views densified per second on the flagship dense pipeline.

Runs on the real TPU chip (do NOT override JAX_PLATFORMS here).  Prints one
JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload (mirrors the reference's per-depth-map measurement unit — the
TD_TIMER log at frame_main/libs/MVS/SceneDensify.cpp:1066-1070): N=6
reference views at 640x480, 4 neighbor views each, full HC schedule of
2 inner red/black PatchMatch sweeps x 2 external phases (photometric +
geometric w/ cross-view consistency), 36-sample adaptive ZNCC patches,
6-step annealed random refinement — i.e. one complete densification of
every view.  views/s = N_views * n_rounds / wall.

vs_baseline: the reference publishes no numbers (BASELINE.md) and its C++
tree cannot be built in this container (no OpenCV/CGAL/Boost dev libs), so
the baseline is an *estimate*: OpenMVS-family PatchMatch at 640x480, 3+
iterations, ~5 views runs at roughly 0.2 depth maps/s on a 32-core CPU
node.  Replace with a measured number when a reference build exists.

NOTE (load-bearing): on the axon tunnel, execution is DEFERRED until the
first device->host readback — block_until_ready is a no-op before that, so
naive timing measures dispatch, not compute.  We force the synchronous
(true) execution mode with one readback BEFORE the timed region
(see .claude/skills/verify/SKILL.md).
"""

import json
import sys
import time

import numpy as np

BASELINE_VIEWS_PER_S = 0.2  # estimated 32-core CPU reference (see docstring)


def main():
    # fallback ladder: the axon TPU worker is prone to crashing on large
    # workloads; report the largest size that completes
    for (n_views, h, w, v_nbr) in [(6, 480, 640, 4), (4, 240, 320, 3),
                                   (4, 96, 128, 3)]:
        try:
            _run(n_views, h, w, v_nbr)
            return
        except Exception as e:
            print(f"[bench] {h}x{w} failed: {type(e).__name__}; "
                  f"falling back", file=sys.stderr, flush=True)
    raise SystemExit("all bench sizes failed")


def _run(n_views, h, w, v_nbr):
    import jax
    import jax.numpy as jnp
    from hcmvs_tpu.core.camera import Camera
    from hcmvs_tpu.core.config import DenseConfig
    from hcmvs_tpu.dense.scene_driver import (SceneTensors, init_scene_state,
                                              scene_sweeps)
    from hcmvs_tpu.utils.synth import make_plane_scene
    sc = make_plane_scene(np.random.default_rng(0), h=h, w=w,
                          n_views=n_views)
    cams = Camera(K=jnp.stack([c.K for c in sc.cameras]),
                  R=jnp.stack([c.R for c in sc.cameras]),
                  C=jnp.stack([c.C for c in sc.cameras]))
    nbr = np.array([[j for j in range(n_views) if j != i][:v_nbr]
                    for i in range(n_views)], np.int32)
    scene = SceneTensors(
        gray=jnp.stack([jnp.asarray(im) for im in sc.images]),
        cams=cams, nbr_idx=jnp.asarray(nbr),
        nbr_valid=jnp.ones((n_views, v_nbr), bool),
        d_min=jnp.full((n_views,), sc.d_min, jnp.float32),
        d_max=jnp.full((n_views,), sc.d_max, jnp.float32))
    cfg = DenseConfig(adapt_half_window=5, patch_half_window=3, patch_step=2,
                      estimation_iters=2, random_iters=4,
                      use_optical_flow=0, use_geo_consistency=1,
                      use_part_consistency=1)

    state = init_scene_state(jax.random.PRNGKey(0), scene)

    def log(msg):
        print(f"[bench] {msg}", file=sys.stderr, flush=True)

    def one_round(state):
        state = scene_sweeps(state, scene, cfg, 0, cfg.estimation_iters,
                             False)
        state = scene_sweeps(state, scene, cfg, 1, cfg.estimation_iters,
                             True)
        return state

    # warmup / compile (also first real round), then force synchronous
    # execution with a readback so the timed region measures real compute
    t0 = time.perf_counter()
    state = one_round(state)
    log(f"dispatch {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    _ = np.asarray(state.depth)
    log(f"compile+warmup exec {time.perf_counter() - t0:.1f}s")

    n_rounds = 1
    t0 = time.perf_counter()
    for _ in range(n_rounds):
        state = one_round(state)
    _ = float(np.asarray(state.depth[0, 0, 0]))  # forces completion
    elapsed = time.perf_counter() - t0
    log(f"timed round {elapsed:.1f}s")

    views_per_s = n_views * n_rounds / elapsed
    print(json.dumps({
        "metric": "views_densified_per_s",
        "value": round(views_per_s, 3),
        "unit": f"views/s ({w}x{h}, {v_nbr} nbrs, 2 sweeps x 2 phases)",
        "vs_baseline": round(views_per_s / BASELINE_VIEWS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
