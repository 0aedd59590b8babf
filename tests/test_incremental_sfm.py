import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hcmvs_tpu.sfm.incremental import (SfMConfig, compute_features_and_matches,
                                       incremental_sfm, sfm_from_matches,
                                       sfm_to_scene)
from hcmvs_tpu.utils.synth import make_ridge_scene

K_TEST = np.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1.0]])


def _synthetic_observations(rng, n_cams=5, n_pts=150, noise_px=0.4,
                            mismatch_frac=0.03):
    """Abstract GT scene: project random 3D structure into known cameras
    and emit per-image keypoints + pairwise matches, with noise and a few
    planted mismatches.  Exercises the track/registration/BA machinery
    without the feature front end (which has its own tests)."""
    from hcmvs_tpu.sfm.ba import rodrigues
    X = rng.uniform(-1.5, 1.5, (n_pts, 3)) * [1, 0.7, 0.5] + [0, 0, 5.0]
    cams = []
    for c in range(n_cams):
        rv = rng.normal(0, 0.02, 3)
        R = np.asarray(rodrigues(jnp.asarray(rv, jnp.float32)))
        C = np.array([(c - n_cams / 2) * 0.5, 0.05 * c, 0.02 * c])
        cams.append((R, C))
    xy, vis = [], []
    for (R, C) in cams:
        Xc = (X - C) @ R.T
        uv = (Xc @ np.asarray(K_TEST).T)
        uv = uv[:, :2] / uv[:, 2:3]
        ok = ((Xc[:, 2] > 0) & (uv[:, 0] > 5) & (uv[:, 0] < 315)
              & (uv[:, 1] > 5) & (uv[:, 1] < 235))
        xy.append((uv + rng.normal(0, noise_px, uv.shape)).astype(np.float32))
        vis.append(ok)
    # matches: keypoint index == point index; only covisible points
    pair_matches = {}
    for i in range(n_cams):
        for j in range(i + 1, n_cams):
            both = np.nonzero(vis[i] & vis[j])[0]
            pairs = np.stack([both, both], axis=1)
            # plant a few mismatches
            n_bad = max(1, int(len(pairs) * mismatch_frac))
            bad = rng.choice(len(pairs), n_bad, replace=False)
            pairs[bad, 1] = rng.choice(n_pts, n_bad)
            pair_matches[(i, j)] = pairs
    gt_C = np.stack([c[1] for c in cams])
    return xy, pair_matches, gt_C, X


def _umeyama_ate(gt_C, est_C):
    mu_g, mu_e = gt_C.mean(0), est_C.mean(0)
    Xg = gt_C - mu_g
    Xe = est_C - mu_e
    U, S, Vt = np.linalg.svd(Xe.T @ Xg)
    d = np.sign(np.linalg.det(U @ Vt))
    D = np.diag([1, 1, d])
    R = U @ D @ Vt
    scale = (S * np.diag(D)).sum() / (Xe ** 2).sum()
    return np.linalg.norm(scale * Xe @ R - Xg, axis=1), (scale, R, mu_g, mu_e)


def test_sfm_driver_recovers_trajectory():
    """Track building + init + PnP registration + BA on unbiased synthetic
    observations: ATE must reach the noise floor."""
    rng = np.random.default_rng(11)
    xy, pair_matches, gt_C, X_gt = _synthetic_observations(rng)
    cfg = SfMConfig(min_matches=20, min_pnp_inliers=10, ba_every=2)
    result = sfm_from_matches(xy, pair_matches, K_TEST, len(xy), cfg)
    assert len(result.poses) == len(xy)
    assert result.reproj_rms < 1.0
    est_C = np.stack([result.poses[i][1] for i in sorted(result.poses)])
    ate, _ = _umeyama_ate(gt_C, est_C)
    # baselines are 0.5; noise 0.4px at f=300 -> expect mm-level ATE
    # (bound at 2.6% of baseline: the LO-RANSAC PnP's wide-gate
    # selection shifts which marginal observations seed each pose by a
    # fraction of the noise floor run-to-run)
    assert ate.max() < 0.013


def test_sfm_driver_rejects_planted_mismatches():
    rng = np.random.default_rng(12)
    xy, pair_matches, gt_C, X_gt = _synthetic_observations(
        rng, mismatch_frac=0.15)
    cfg = SfMConfig(min_matches=20, min_pnp_inliers=10, ba_every=2)
    result = sfm_from_matches(xy, pair_matches, K_TEST, len(xy), cfg)
    assert len(result.poses) == len(xy)
    est_C = np.stack([result.poses[i][1] for i in sorted(result.poses)])
    ate, _ = _umeyama_ate(gt_C, est_C)
    assert ate.max() < 0.02


@pytest.fixture(scope="module")
def image_scene():
    rng = np.random.default_rng(7)
    return make_ridge_scene(rng, h=144, w=192, n_views=4, fx=180.0, z0=4.0,
                            spacing=0.25)


def test_incremental_sfm_from_images_smoke(image_scene):
    """Full image -> poses path: must register all views with sub-pixel
    reprojection error.  (Tight ATE bounds live in the driver test above:
    synthetic blob features carry viewpoint-correlated localization bias
    that two-view geometry cannot overcome — real detectors have the same
    failure mode on low-parallax pairs, which H/E model selection will
    address.)"""
    sc = image_scene
    K = np.array([[180.0, 0, 96], [0, 180.0, 72], [0, 0, 1.0]])
    cfg = SfMConfig(max_keypoints=512, min_matches=20, min_pnp_inliers=10,
                    ba_every=2)
    result = incremental_sfm(sc.images, K, cfg)
    assert len(result.poses) >= 3
    assert result.reproj_rms < 1.0
    assert len(result.points) > 80


def test_sfm_to_scene_roundtrip(image_scene, tmp_path):
    from hcmvs_tpu.io.mvs import read_mvs, write_mvs
    sc = image_scene
    K = np.array([[180.0, 0, 96], [0, 180.0, 72], [0, 0, 1.0]])
    cfg = SfMConfig(max_keypoints=512, min_matches=20, min_pnp_inliers=10)
    result = incremental_sfm(sc.images, K, cfg)
    reg = sorted(result.poses)
    scene = sfm_to_scene(result, K, [f"im{i:04d}.png" for i in range(4)],
                         192, 144)
    assert len(scene.images) == len(reg)
    assert len(scene.points) > 50
    path = str(tmp_path / "sfm_scene.mvs")
    write_mvs(path, scene)
    back = read_mvs(path)
    assert len(back.images) == len(reg)
    np.testing.assert_allclose(back.points, scene.points, rtol=1e-6)
    # poses must be recoverable through the Interface accessors
    R, C = back.pose_of(1)
    R2, C2 = result.poses[reg[1]]
    np.testing.assert_allclose(R, R2, atol=1e-6)


def test_incremental_sfm_50_images_bounded():
    """Scale gate for the vectorized track bookkeeping (the r2 version's
    per-match Python dict loops were O(N * pairs * matches) per
    registration — minutes-to-hours at this size): a 50-camera sweep
    along a textured plane registers nearly everything in bounded time."""
    import time
    from hcmvs_tpu.eval.pose_eval import ate
    from hcmvs_tpu.utils.synth import blob_texture_fn, make_plane_scene
    rng = np.random.default_rng(11)
    n = 50
    xs = np.linspace(-1.1, 1.1, n)
    positions = [(x, 0.02 * ((i * 7) % 5 - 2), 0.0)
                 for i, x in enumerate(xs)]
    sc = make_plane_scene(rng, h=96, w=128, n_views=n, fx=100.0,
                          slant=(0.2, 0.1),
                          texture_fn=blob_texture_fn(rng, extent=2.5,
                                                     n_blobs=900),
                          cam_positions=positions)
    K = np.asarray(sc.cameras[0].K)
    cfg = SfMConfig(max_keypoints=384, min_matches=20, min_pnp_inliers=10,
                    ba_every=10, final_ba_iters=12, n_octaves=1)
    t0 = time.time()
    res = incremental_sfm([im.astype(np.float32) for im in sc.images], K,
                          cfg)
    wall = time.time() - t0
    reg = sorted(res.poses)
    assert len(reg) >= 45, f"registered {len(reg)}/50 in {wall:.0f}s"
    gt_C = np.stack([np.asarray(sc.cameras[i].C) for i in reg])
    est_C = np.stack([res.poses[i][1] for i in reg])
    stats = ate(est_C, gt_C)
    # a planar corridor is SfM's degenerate case (every pair is
    # homography-ambiguous): the chain reconstructs internally consistent
    # (sub-px reprojection) but globally bendable — gate on registration
    # + internal consistency + a drift bound, not mm accuracy
    assert res.reproj_rms < 1.0, res.reproj_rms
    assert stats["rmse"] < 0.25 * 1.1, (stats, wall)   # <25% of half-span


@pytest.mark.slow
def test_incremental_sfm_200_images_bounded():
    """Order-of-magnitude scale gate (round 4): 200 cameras register in
    bounded time via windowed matching (match_window — the OpenMVG
    VIDEO_MODE analog, O(N k) pairs) + the geometric global-BA schedule
    (ba_growth — O(log N) bundles).  The reference frontend handles
    hundreds of images; this proves the vectorized bookkeeping holds an
    order of magnitude above the 50-image gate."""
    import time
    from hcmvs_tpu.utils.synth import blob_texture_fn, make_plane_scene
    rng = np.random.default_rng(12)
    n = 200
    xs = np.linspace(-2.2, 2.2, n)
    positions = [(x, 0.02 * ((i * 7) % 5 - 2), 0.0)
                 for i, x in enumerate(xs)]
    sc = make_plane_scene(rng, h=96, w=128, n_views=n, fx=100.0,
                          slant=(0.2, 0.1),
                          texture_fn=blob_texture_fn(rng, extent=4.5,
                                                     n_blobs=2600),
                          cam_positions=positions,
                          bounded_rotations=True)
    K = np.asarray(sc.cameras[0].K)
    cfg = SfMConfig(max_keypoints=384, min_matches=20, min_pnp_inliers=10,
                    final_ba_iters=10, n_octaves=1,
                    match_window=6, ba_growth=1.4)
    t0 = time.time()
    res = incremental_sfm([im.astype(np.float32) for im in sc.images], K,
                          cfg)
    wall = time.time() - t0
    reg = sorted(res.poses)
    assert len(reg) >= 180, f"registered {len(reg)}/200 in {wall:.0f}s"
    assert res.reproj_rms < 1.0, res.reproj_rms
    # bounded time: generous CI margin (measured ~4-6 min on the 2-core
    # host; the gate catches quadratic blowups, not constant factors)
    assert wall < 1500, f"200-image sweep took {wall:.0f}s"
