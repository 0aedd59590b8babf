"""The hierarchical-cross schedule: multi-level alternating-variant dense
reconstruction.

Replaces the reference's run.sh orchestration (ref: /root/reference/run.sh
— frame_main@resize3 -> restore@resize2 -> frame_main@resize2 ->
restore@resize1 -> frame_main@resize1, with `mv depthmap normalmap`
between stages) and the per-stage flag sets (data/*/resize*/run.py).

TPU-native re-design: the five separate OS processes + filesystem handoff
become one driver where each stage's output maps stay on device and are
upsampled into the next stage's initialization (variant A, "read-init";
ref: frame_main InitDepthMap SceneDensify.cpp:522-558) or attached as
cross-scale priors (variant B, "triangulate-init + cross-scale prior";
ref: restore/libs/MVS/SceneDensify.cpp:500-533 and the cross-scale
hypothesis injection restore/DepthMap.cpp:1527-1549 — here the previous
level's maps enter through the prior term, the functionally equivalent
channel).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from hcmvs_tpu.core.config import DenseConfig
from hcmvs_tpu.dense.scene_driver import (SceneState, SceneTensors,
                                          estimate_scene, finalize,
                                          init_scene_state, scene_sweeps)


@dataclasses.dataclass(frozen=True)
class Stage:
    """One hierarchical-cross stage (one run.py invocation analog)."""

    level: int           # resolution level (3 = coarsest)
    variant: str         # "A" (frame_main) | "B" (restore)
    cfg: DenseConfig


def default_schedule(base: DenseConfig) -> List[Stage]:
    """The 5-stage schedule of run.sh with each stage's flag profile
    (ref: data/frame_main/resize{3,2,1}/run.py, data/restore/resize{2,1}/
    run.py — frame_main stages run geometric consistency with read-init,
    restore stages triangulate-init without geo)."""
    a = base.replace(init_triangulate=0, use_geo_consistency=1,
                     photo2geo=1)
    b = base.replace(init_triangulate=1, use_geo_consistency=0,
                     photo2geo=99, use_semantic=True)
    return [
        Stage(level=3, variant="A", cfg=a),
        Stage(level=2, variant="B", cfg=b),
        Stage(level=2, variant="A", cfg=a),
        Stage(level=1, variant="B", cfg=b),
        Stage(level=1, variant="A",
              cfg=a.replace(use_semantic=True)),
    ]


def _resize_maps(depth: jax.Array, normal: jax.Array,
                 h: int, w: int) -> Tuple[jax.Array, jax.Array]:
    """Upsample (N, H0, W0) depth + (N, 3, H0, W0) normals to (h, w)."""
    n = depth.shape[0]
    d = jax.image.resize(depth, (n, h, w), method="bilinear")
    nm = jax.image.resize(normal, (n, 3, h, w), method="bilinear")
    nm = nm / jnp.maximum(jnp.linalg.norm(nm, axis=1, keepdims=True),
                          1e-9)
    return d, nm


def run_hierarchy(tensors_per_level: Dict[int, SceneTensors],
                  base_cfg: DenseConfig,
                  schedule: Optional[List[Stage]] = None,
                  key: Optional[jax.Array] = None,
                  checkpoint_dir: Optional[str] = None,
                  resume: bool = True,
                  verbose: bool = False) -> SceneState:
    """Run the alternating multi-level schedule.

    ``tensors_per_level`` maps resolution level -> SceneTensors at that
    level's image size (build once per level with
    pipeline.densify.build_scene_tensors on resized images).

    ``checkpoint_dir``: when set, each stage's output state is saved as an
    orbax checkpoint (sharding-aware — works across multi-host meshes),
    and ``resume`` restarts from the last completed stage.  This is the
    TPU-native replacement for run.sh's `mv depthmap normalmap` handoff
    (ref: /root/reference/run.sh:1-20) — same per-stage resumability, but
    the artifact is a sharded array checkpoint instead of loose .dmap
    files (which pipeline.densify still writes for interop).
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    schedule = schedule or default_schedule(base_cfg)
    state = None
    prev_maps = None     # (depth, normal) from the previous stage
    start_stage = 0
    mngr = None
    if checkpoint_dir is not None:
        import orbax.checkpoint as ocp
        mngr = ocp.CheckpointManager(os.path.abspath(checkpoint_dir))
        latest = mngr.latest_step() if resume else None
        if latest is not None and latest < len(schedule):
            restored = mngr.restore(latest)
            state = SceneState(
                depth=jnp.asarray(restored["depth"]),
                normal=jnp.asarray(restored["normal"]),
                cost=jnp.asarray(restored["cost"]),
                keys=jnp.asarray(restored["keys"]))
            prev_maps = (state.depth, state.normal)
            start_stage = latest + 1
            if verbose:
                print(f"[hierarchy] resumed after stage {latest}")
    for si, stage in enumerate(schedule):
        if si < start_stage:
            continue
        tensors = tensors_per_level[stage.level]
        n, h, w = tensors.gray.shape
        cfg = stage.cfg
        # per-stage key derived from the stage index (not a running
        # split) so a resumed run reproduces the uninterrupted one
        sub = jax.random.fold_in(key, si)
        if prev_maps is not None:
            d_up, n_up = _resize_maps(prev_maps[0], prev_maps[1], h, w)
            if stage.variant == "A":
                # read-init: previous maps ARE the starting hypotheses
                st0 = init_scene_state(sub, tensors)
                state = SceneState(
                    depth=jnp.where(d_up > 0, d_up, st0.depth),
                    normal=jnp.where((d_up > 0)[:, None], n_up, st0.normal),
                    cost=st0.cost, keys=st0.keys)
                state = _run_stage(state, tensors, cfg, verbose)
            else:
                # cross-scale prior: keep triangulate/seed init, feed the
                # previous level's depth through the prior channel
                tensors = dataclasses.replace(tensors, prior_depth=d_up)
                state = init_scene_state(sub, tensors)
                state = _run_stage(state, tensors, cfg, verbose)
        else:
            state = init_scene_state(sub, tensors)
            state = _run_stage(state, tensors, cfg, verbose)
        prev_maps = (state.depth, state.normal)
        if mngr is not None:
            import orbax.checkpoint as ocp
            mngr.save(si, args=ocp.args.StandardSave({
                "depth": state.depth, "normal": state.normal,
                "cost": state.cost, "keys": state.keys}))
            mngr.wait_until_finished()
        if verbose:
            print(f"[hierarchy] stage {si} (level {stage.level}, "
                  f"variant {stage.variant}) done")
    if mngr is not None:
        mngr.close()
    return state


def _run_stage(state: SceneState, tensors: SceneTensors, cfg: DenseConfig,
               verbose: bool) -> SceneState:
    from hcmvs_tpu.dense.scene_driver import optimize_maps
    n_ext = cfg.estimation_iters_external
    for it_ext in range(n_ext):
        phase = 1 if it_ext >= cfg.photo2geo else 0
        state = scene_sweeps(state, tensors, cfg, phase,
                             cfg.estimation_iters, phase >= 1)
        if cfg.optimize and it_ext in (1, 2):
            state = optimize_maps(state, tensors, cfg)
    return state
