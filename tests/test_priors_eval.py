import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hcmvs_tpu.dense.priors import (fit_segment_planes, generate_priors,
                                    prior_depth_map, slic_superpixels)
from hcmvs_tpu.eval.compare import (compare_depth_maps, compare_normal_maps,
                                    point_cloud_fscore)


def test_slic_superpixels_segment_structure():
    # two-tone image: superpixels should not straddle the strong edge much
    img = np.zeros((64, 96), np.float32)
    img[:, 48:] = 1.0
    labels = np.asarray(slic_superpixels(jnp.asarray(img), grid_step=16))
    assert labels.shape == (64, 96)
    # each label's intensity variance should be small
    n = labels.max() + 1
    bad = 0
    for k in range(n):
        m = labels == k
        if m.sum() > 10 and img[m].std() > 0.3:
            bad += 1
    assert bad <= 2
    # labels cover a reasonable range
    assert n >= 12


def test_fit_segment_planes_recovers_plane():
    h, w = 48, 64
    yy, xx = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    # inverse depth is affine in pixels for a 3D plane
    inv_z = 0.002 * xx + 0.001 * yy + 0.2
    depth = (1.0 / inv_z).astype(np.float32)
    labels = jnp.zeros((h, w), jnp.int32)
    rays = jnp.zeros((3, h, w))
    planes, frac, cnt = fit_segment_planes(labels, jnp.asarray(depth),
                                           rays, 1)
    np.testing.assert_allclose(np.asarray(planes[0]),
                               [0.002, 0.001, 0.2], atol=1e-5)
    assert float(frac[0]) > 0.99
    pd = np.asarray(prior_depth_map(labels, planes, frac, cnt, 1))
    np.testing.assert_allclose(pd, depth, rtol=1e-4)


def test_generate_priors_rejects_noise():
    """Segments whose depths are pure noise should get no prior."""
    h, w = 64, 64
    rng = np.random.default_rng(0)
    gray = rng.random((h, w), dtype=np.float32)
    depth = rng.uniform(1, 10, (h, w)).astype(np.float32)
    rays = jnp.zeros((3, h, w))
    prior = np.asarray(generate_priors(jnp.asarray(gray),
                                       jnp.asarray(depth), rays))
    assert (prior > 0).mean() < 0.3


def test_compare_depth_maps():
    gt = np.full((32, 32), 4.0, np.float32)
    est = gt.copy()
    est[:8] = 0.0            # missing
    est[8:16] *= 1.005       # small error
    stats = compare_depth_maps(est, gt, threshold=0.01)
    assert stats["completeness"] == pytest.approx(0.75)
    assert stats["median_rel_err"] < 0.01
    assert stats["frac_error_gt_threshold"] < 0.05


def test_compare_normal_maps():
    n1 = np.zeros((3, 16, 16), np.float32)
    n1[2] = -1.0
    n2 = n1.copy()
    stats = compare_normal_maps(n1, n2)
    assert stats["median_angle_deg"] < 0.1
    assert stats["frac_below_10deg"] == 1.0


def test_point_cloud_fscore():
    rng = np.random.default_rng(1)
    gt = rng.uniform(0, 1, (500, 3))
    est = np.concatenate([gt[:400] + rng.normal(0, 0.001, (400, 3)),
                          rng.uniform(5, 6, (100, 3))])  # 20% outliers
    s = point_cloud_fscore(est, gt, threshold=0.01)
    assert s["precision"] == pytest.approx(0.8, abs=0.05)
    assert s["recall"] > 0.75
    assert 0.7 < s["fscore"] < 0.95


def test_ransac_segment_planes_recovers_plane():
    """RANSAC planes on a two-segment mask recover each segment's plane
    despite heavy outliers (ref: GenerateDepthPrior RANSAC path)."""
    import jax
    import jax.numpy as jnp
    from hcmvs_tpu.dense.priors import (prior_depth_map,
                                        ransac_segment_planes)
    rng = np.random.default_rng(0)
    h, w = 48, 64
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    # two inverse-depth-affine planes split left/right
    z_inv = np.where(xx < w / 2,
                     0.001 * xx + 0.002 * yy + 0.2,
                     -0.0005 * xx + 0.001 * yy + 0.35)
    depth = (1.0 / z_inv).astype(np.float32)
    # 30% gross outliers
    out = rng.random((h, w)) < 0.3
    depth_noisy = np.where(out, depth * rng.uniform(0.3, 3.0, (h, w)),
                           depth).astype(np.float32)
    labels = (xx >= w / 2).astype(np.int32)
    planes, frac, cnt = ransac_segment_planes(
        jax.random.PRNGKey(1), jnp.asarray(labels),
        jnp.asarray(depth_noisy), 2, n_hyps=128, epsilon=0.005)
    prior = prior_depth_map(jnp.asarray(labels), planes, frac, cnt, 2,
                            min_support=30, min_inlier_frac=0.5)
    prior = np.asarray(prior)
    valid = prior > 0
    assert valid.mean() > 0.9
    rel = np.abs(prior[valid] - depth[valid]) / depth[valid]
    assert np.median(rel) < 0.01


def test_semantic_prior_merge():
    """generate_priors with a semantic mask fills masked regions with the
    RANSAC plane (GenerateFinalPrior merge semantics)."""
    import jax
    import jax.numpy as jnp
    from hcmvs_tpu.dense.priors import generate_priors
    rng = np.random.default_rng(1)
    h, w = 48, 64
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    z_inv = 0.001 * xx + 0.002 * yy + 0.25
    depth = (1.0 / z_inv).astype(np.float32)
    gray = jnp.asarray(rng.random((h, w)), jnp.float32)
    rays = jnp.ones((3, h, w), jnp.float32)
    sem = np.zeros((h, w), np.int32)
    prior = generate_priors(gray, jnp.asarray(depth), rays,
                            semantic=jnp.asarray(sem),
                            n_semantic_labels=1,
                            key=jax.random.PRNGKey(2))
    prior = np.asarray(prior)
    valid = prior > 0
    assert valid.mean() > 0.9
    rel = np.abs(prior[valid] - depth[valid]) / depth[valid]
    assert np.median(rel) < 0.02


def test_merge_final_prior_semantics():
    """Two conflicting prior channels: the external (meanshift-analog)
    channel wins where nonzero, the superpixel channel fills its holes,
    both-zero stays zero (ref: GenerateFinalPrior per-pixel merge,
    SceneDensify.cpp:1129-1146)."""
    from hcmvs_tpu.dense.priors import merge_final_prior
    ext = jnp.asarray([[2.0, 0.0], [2.0, 0.0]])
    sup = jnp.asarray([[5.0, 5.0], [0.0, 0.0]])
    merged = np.asarray(merge_final_prior(ext, sup))
    # conflicting pixel: external wins
    assert merged[0, 0] == 2.0
    # external hole: superpixel fills
    assert merged[0, 1] == 5.0
    # external only
    assert merged[1, 0] == 2.0
    # both empty
    assert merged[1, 1] == 0.0


def test_compute_scene_priors_external_channel():
    """The scene-level prior pass merges the ingested external channel
    with the superpixel prior; with_super=False feeds it through alone."""
    import dataclasses
    from hcmvs_tpu.core.camera import Camera
    from hcmvs_tpu.dense.scene_driver import (SceneState, SceneTensors,
                                              compute_scene_priors)
    h, w = 32, 48
    n = 1
    K = np.array([[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1]])
    cams = Camera(K=jnp.asarray(K[None], jnp.float32),
                  R=jnp.tile(jnp.eye(3)[None], (n, 1, 1)),
                  C=jnp.zeros((n, 3)))
    depth = jnp.full((n, h, w), 4.0)
    ext = np.zeros((n, h, w), np.float32)
    ext[:, :, : w // 2] = 9.0          # left half carries an external prior
    scene = SceneTensors(gray=jnp.zeros((n, h, w)), cams=cams,
                         nbr_idx=jnp.zeros((n, 1), jnp.int32),
                         nbr_valid=jnp.ones((n, 1), bool),
                         d_min=jnp.ones(n), d_max=jnp.full(n, 10.0),
                         ext_prior_depth=jnp.asarray(ext))
    state = SceneState(depth=depth,
                       normal=jnp.tile(
                           jnp.array([0.0, 0.0, -1.0])[None, :, None, None],
                           (n, 1, h, w)),
                       cost=jnp.zeros((n, h, w)),
                       keys=jax.random.split(jax.random.PRNGKey(0), n))
    # external-only path
    s1 = compute_scene_priors(state, scene, with_super=False)
    assert np.array_equal(np.asarray(s1.prior_depth), ext)
    # merged path: external wins on the left half, superpixel plane fit
    # (flat depth=4) fills the right half
    s2 = compute_scene_priors(state, scene, with_super=True)
    p = np.asarray(s2.prior_depth)[0]
    assert np.allclose(p[:, : w // 2], 9.0)
    right = p[:, w // 2:]
    assert (right > 0).mean() > 0.5 and np.allclose(
        right[right > 0], 4.0, rtol=0.05)


def test_self_prior_gate():
    """Self-priors (SLIC planes on the solver's own depth, no real
    masks) are gated OFF by default — measured -0.21 on wide-FOV
    geometry (BASELINE r4); cfg.self_priors forces the old behavior and
    real semantic masks enable the full pass (VERDICT r4 #5)."""
    from hcmvs_tpu.core.camera import Camera
    from hcmvs_tpu.core.config import DenseConfig
    from hcmvs_tpu.dense.scene_driver import SceneTensors, want_prior_pass
    h, w, n = 16, 16, 1
    cams = Camera(K=jnp.tile(jnp.eye(3)[None], (n, 1, 1)),
                  R=jnp.tile(jnp.eye(3)[None], (n, 1, 1)),
                  C=jnp.zeros((n, 3)))
    base = dict(gray=jnp.zeros((n, h, w)), cams=cams,
                nbr_idx=jnp.zeros((n, 1), jnp.int32),
                nbr_valid=jnp.ones((n, 1), bool),
                d_min=jnp.ones(n), d_max=jnp.full(n, 10.0))
    scene = SceneTensors(**base)
    cfg = DenseConfig(use_semantic=True)
    # masks absent -> the pass is gated off
    assert not want_prior_pass(scene, cfg)
    # forced self-priors -> on
    assert want_prior_pass(scene, cfg.replace(self_priors=1))
    # real masks -> on
    scene_m = SceneTensors(**base, semantic=jnp.zeros((n, h, w),
                                                      jnp.int32))
    assert want_prior_pass(scene_m, cfg)
    # external channel activates the pass regardless of use_semantic
    scene_e = SceneTensors(**base, ext_prior_depth=jnp.ones((n, h, w)))
    assert want_prior_pass(scene_e, DenseConfig(use_semantic=False))
    # nothing special -> off
    assert not want_prior_pass(scene, DenseConfig())
