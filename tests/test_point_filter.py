"""Tests for the visibility point-cloud filter
(ref: Scene::PointCloudFilter, SceneDensify.cpp:4189-4320)."""

import jax.numpy as jnp
import numpy as np

from hcmvs_tpu.core.camera import Camera
from hcmvs_tpu.dense.point_filter import filter_point_cloud

from synthetic import make_plane_scene


def _batched_cams(sc):
    return Camera(K=jnp.stack([c.K for c in sc.cameras]),
                  R=jnp.stack([c.R for c in sc.cameras]),
                  C=jnp.stack([c.C for c in sc.cameras]))


def test_floaters_removed_surface_kept():
    rng = np.random.default_rng(0)
    sc = make_plane_scene(rng, h=48, w=64, n_views=3)
    h, w = sc.images[0].shape
    cam0 = sc.cameras[0]
    # surface points: back-project ref-view GT depth on a grid
    ys, xs = np.mgrid[4:h - 4:6, 4:w - 4:6]
    d = sc.depth_gt[ys, xs]
    rays = np.linalg.inv(cam0.K) @ np.stack(
        [xs.ravel(), ys.ravel(), np.ones_like(xs).ravel()]).astype(float)
    surf = (cam0.R.T @ (rays * d.ravel())).T + cam0.C  # world points
    n_surf = len(surf)
    # floaters: halfway between camera 0 and the surface — free-space
    # violations for every view that observes the surface behind them
    float_pts = (cam0.C[None] + surf[:20]) * 0.5
    pts = np.concatenate([surf, float_pts]).astype(np.float32)
    # every point claims observation in all 3 views
    n = len(pts)
    counts = np.full(n, 3, np.int32)
    ids = np.tile(np.arange(3, dtype=np.uint32), n)
    keep = filter_point_cloud(pts, counts, ids, _batched_cams(sc), (h, w),
                              th_remove=-2)
    frac_surf = keep[:n_surf].mean()
    frac_float = keep[n_surf:].mean()
    assert frac_surf > 0.9, frac_surf
    assert frac_float < 0.2, frac_float
