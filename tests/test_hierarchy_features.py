"""Cross-scale hypothesis injection + hierarchy driver feature wiring.

Covers the restore-variant semantics (ref: restore/libs/MVS/
DepthMap.cpp:1527-1549 — upsampled previous-stage maps scored as a
candidate with a 0.1 bonus at the last inner x external iteration) and the
fused scene's FULL per-point view lists (ref: FuseDepthMaps,
frame_main/libs/MVS/SceneDensify.cpp:3265-3495).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _plane_tensors(n_views=3, h=48, w=64):
    from hcmvs_tpu.core.camera import Camera
    from hcmvs_tpu.dense.scene_driver import SceneTensors
    from hcmvs_tpu.utils.synth import make_plane_scene
    sc = make_plane_scene(np.random.default_rng(3), h=h, w=w,
                          n_views=n_views)
    cams = Camera(K=jnp.stack([c.K for c in sc.cameras]),
                  R=jnp.stack([c.R for c in sc.cameras]),
                  C=jnp.stack([c.C for c in sc.cameras]))
    v = n_views - 1
    nbr = np.array([[j for j in range(n_views) if j != i][:v]
                    for i in range(n_views)], np.int32)
    tensors = SceneTensors(
        gray=jnp.stack([jnp.asarray(im) for im in sc.images]),
        cams=cams, nbr_idx=jnp.asarray(nbr),
        nbr_valid=jnp.ones((n_views, v), bool),
        d_min=jnp.full((n_views,), sc.d_min, jnp.float32),
        d_max=jnp.full((n_views,), sc.d_max, jnp.float32))
    return sc, tensors


def test_cross_scale_injection_adopts_good_hypotheses():
    """Injecting near-GT maps at the final sweep must pull the depth to
    them (the 0.1 bonus makes a correct hypothesis strictly win over a
    random-init one)."""
    import dataclasses
    from hcmvs_tpu.core.config import DenseConfig
    from hcmvs_tpu.dense.scene_driver import init_scene_state, scene_sweeps
    from hcmvs_tpu.utils.synth import plane_depth_of_view
    sc, tensors = _plane_tensors()
    n, h, w = tensors.gray.shape
    # "previous level" maps: per-view GT depth of the slanted plane
    inj_d = jnp.stack([jnp.asarray(plane_depth_of_view(sc, i))
                       for i in range(n)])
    nrm = jnp.broadcast_to(
        jnp.asarray(sc.normal_gt, jnp.float32)[None, :, None, None],
        (n, 3, h, w))
    tensors = dataclasses.replace(tensors, inject_depth=inj_d,
                                  inject_normal=jnp.asarray(nrm))
    cfg = DenseConfig(adapt_half_window=4, patch_half_window=3,
                      patch_step=2, estimation_iters=1, random_iters=0,
                      use_optical_flow=0, use_geo_consistency=0,
                      propagate_half_window=0, explore_patch_step=0)
    state = init_scene_state(jax.random.PRNGKey(0), tensors)
    # no injection: random-ish init barely moves in one cheap sweep
    out0 = scene_sweeps(state, tensors, cfg, 0, 1, False, inject=False)
    out1 = scene_sweeps(state, tensors, cfg, 0, 1, False, inject=True)
    gt0 = np.asarray(sc.depth_gt)
    err0 = np.abs(np.asarray(out0.depth[0]) - gt0) / gt0
    err1 = np.abs(np.asarray(out1.depth[0]) - gt0) / gt0
    # injection should fix most pixels to (near) GT
    assert (err1 < 0.02).mean() > 0.9, (err1 < 0.02).mean()
    assert (err1 < 0.02).mean() > (err0 < 0.02).mean() + 0.2


def test_hierarchy_b_stage_wires_inject_and_priors(monkeypatch):
    """B stages must attach cross-scale inject maps AND compute semantic
    priors inside the stage loop (round-1 dropped both — VERDICT #3/#4)."""
    from hcmvs_tpu.core.config import DenseConfig
    from hcmvs_tpu.pipeline import hierarchy as H
    from hcmvs_tpu.dense import scene_driver as SD

    _, tensors = _plane_tensors()
    calls = []
    orig_sweeps = SD.scene_sweeps

    def spy_sweeps(state, scene, cfg, phase, n_iters, use_nbr,
                   inject=False):
        calls.append({"inject": inject,
                      "has_inject_maps": scene.inject_depth is not None,
                      "has_prior": scene.prior_depth is not None})
        return orig_sweeps(state, scene, cfg, phase, n_iters, use_nbr,
                           inject=inject)

    monkeypatch.setattr(H, "scene_sweeps", spy_sweeps)
    cfg = DenseConfig(adapt_half_window=4, patch_half_window=3,
                      patch_step=2, estimation_iters=1, random_iters=1,
                      estimation_iters_external=2, photo2geo=1,
                      use_optical_flow=0, use_geo_consistency=1,
                      optimize=0, explore_patch_step=0)
    a = cfg.replace(init_triangulate=0)
    b = cfg.replace(init_triangulate=1, use_geo_consistency=0,
                    photo2geo=99, use_semantic=True)
    sched = [H.Stage(level=1, variant="A", cfg=a),
             H.Stage(level=1, variant="B", cfg=b)]
    H.run_hierarchy({1: tensors}, cfg, schedule=sched)
    # stage A: 2 calls without inject; stage B: 2 calls, inject at last
    assert len(calls) == 4
    assert not any(c["inject"] for c in calls[:2])
    b_calls = calls[2:]
    assert all(c["has_inject_maps"] for c in b_calls)
    assert [c["inject"] for c in b_calls] == [False, True]
    # semantic priors computed at n_ext-2 == it 1 -> present in final call
    assert b_calls[-1]["has_prior"]


def test_fused_cloud_full_view_lists():
    """compact_point_cloud must emit ragged per-point view lists: owner
    first, then each agreeing neighbor with its confidence."""
    from hcmvs_tpu.core.config import DenseConfig
    from hcmvs_tpu.dense.fusion import (compact_point_cloud,
                                        fuse_point_cloud)
    from hcmvs_tpu.dense.scene_driver import init_scene_state
    from hcmvs_tpu.utils.synth import plane_depth_of_view
    sc, tensors = _plane_tensors()
    n, h, w = tensors.gray.shape
    # per-view GT depth everywhere -> strong cross-view agreement
    gt = jnp.stack([jnp.asarray(plane_depth_of_view(sc, i))
                    for i in range(n)])
    nrm = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, -1.0])[None, :, None, None], (n, 3, h, w))
    conf = jnp.full((n, h, w), 0.8)
    cfg = DenseConfig()
    priority = jnp.arange(n, dtype=jnp.float32)
    fused = fuse_point_cloud(gt, jnp.asarray(nrm), conf, tensors.cams,
                             tensors.nbr_idx, tensors.nbr_valid, priority,
                             cfg)
    cloud = compact_point_cloud(fused, nbr_idx=np.asarray(tensors.nbr_idx),
                                confs=np.asarray(conf))
    m = len(cloud["points"])
    assert m > 0
    counts = cloud["view_counts"]
    ids = cloud["view_ids"]
    confs_out = cloud["view_confs"]
    assert counts.sum() == len(ids) == len(confs_out)
    # every point lists its owner first
    offs = np.concatenate([[0], np.cumsum(counts)])
    np.testing.assert_array_equal(ids[offs[:-1]], cloud["owner_view"])
    # the depth maps agree everywhere on view 0's GT depth: points kept by
    # fusion must list > 1 view (multi-view vertices, not owner-only)
    assert counts.max() > 1
    assert (counts > 1).mean() > 0.5
    # neighbor entries carry the sampled confidences (~0.8 here)
    nbr_mask = np.ones(len(ids), bool)
    nbr_mask[offs[:-1]] = False
    if nbr_mask.any():
        assert np.all(confs_out[nbr_mask] > 0.1)
