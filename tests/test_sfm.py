import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hcmvs_tpu.sfm.ba import (BAState, ba_cost, build_problem, rodrigues,
                              rotation_to_rvec, run_ba)
from hcmvs_tpu.sfm.features import detect_and_describe
from hcmvs_tpu.sfm.matching import match_descriptors
from hcmvs_tpu.sfm.two_view import (ransac_essential, recover_pose,
                                    sampson_distance, triangulate_midpoint)

from synthetic import _texture, _texture_params


def _make_image(rng, h=128, w=160):
    """Blob-rich test image: random Gaussian spots on a textured base —
    dense in DoG extrema (pure sinusoids are too sparse)."""
    params = _texture_params(rng, n_waves=30)
    v, u = np.meshgrid(np.arange(h) / 40.0, np.arange(w) / 40.0,
                       indexing="ij")
    img = 0.4 * _texture(np.stack([u, v], -1) * 6.0, params)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    for _ in range(60):
        cy, cx = rng.uniform(10, h - 10), rng.uniform(10, w - 10)
        s = rng.uniform(1.5, 4.0)
        a = rng.uniform(0.3, 0.7) * rng.choice([-1, 1])
        img = img + a * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2)
                               / (2 * s * s))
    img = img - img.min()
    return (img / img.max()).astype(np.float32)


def test_features_detect_and_match_shifted():
    rng = np.random.default_rng(0)
    img = _make_image(rng)
    kp_a = detect_and_describe(jnp.asarray(img), max_keypoints=256)
    assert float(kp_a.score[0]) > 0
    n_valid = int((kp_a.score > 0).sum())
    assert n_valid > 50
    # descriptors normalized
    norms = np.linalg.norm(np.asarray(kp_a.desc[:n_valid]), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)

    # shifted copy: matches should map (x, y) -> (x - 8, y - 5)
    dy, dx = 5, 8
    img_b = np.roll(np.roll(img, -dy, 0), -dx, 1)
    kp_b = detect_and_describe(jnp.asarray(img_b), max_keypoints=256)
    m = match_descriptors(kp_a.desc, kp_b.desc, kp_a.score > 0,
                          kp_b.score > 0)
    mi = np.asarray(m.idx)
    mv = np.asarray(m.valid)
    assert mv.sum() > 30
    xa = np.asarray(kp_a.xy)[mv]
    xb = np.asarray(kp_b.xy)[mi[mv]]
    shift = xa - xb
    med = np.median(shift, axis=0)
    np.testing.assert_allclose(med, [dx, dy], atol=1.0)
    # most matches consistent with the global shift
    frac = (np.abs(shift - [dx, dy]) < 1.5).all(1).mean()
    assert frac > 0.7


def test_features_match_under_3x_scale_change():
    """Octave pyramid coverage (ref: OpenMVG SIFT's octaves,
    MvgMvsPipeline.py:184-186): keypoints must match between an image and
    its 3x-downscaled copy — single-octave DoG (n_octaves=1) cannot, as
    no keypoint pair sees the same surface patch at the same blur."""
    import cv2
    from hcmvs_tpu.sfm.features import detect_and_describe_pyramid
    rng = np.random.default_rng(7)
    # blobs big enough to survive 3x downsampling (sigma 5-12px -> 1.7-4
    # in the small image, inside the DoG ladder's detectable band)
    h, w = 288, 384
    yy, xx = np.meshgrid(np.arange(h, dtype=np.float64),
                         np.arange(w, dtype=np.float64), indexing="ij")
    img = np.zeros((h, w))
    for _ in range(150):
        cy, cx = rng.uniform(20, h - 20), rng.uniform(20, w - 20)
        sb = rng.uniform(5.0, 12.0)
        a = rng.uniform(0.3, 0.7) * rng.choice([-1, 1])
        img = img + a * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2)
                               / (2 * sb * sb))
    img = ((img - img.min()) / np.ptp(img)).astype(np.float32)
    s = 3.0
    small = cv2.resize(img, (int(w / s), int(h / s)),
                       interpolation=cv2.INTER_AREA)
    kp_a = detect_and_describe_pyramid(jnp.asarray(img),
                                       max_keypoints=384, n_octaves=3)
    kp_b = detect_and_describe_pyramid(jnp.asarray(small),
                                       max_keypoints=384, n_octaves=3)
    m = match_descriptors(kp_a.desc, kp_b.desc, kp_a.score > 0,
                          kp_b.score > 0)
    mi = np.asarray(m.idx)
    mv = np.asarray(m.valid)
    xa = np.asarray(kp_a.xy)[mv]
    xb = np.asarray(kp_b.xy)[mi[mv]]
    err = np.linalg.norm(xa - xb * s, axis=1)
    good = (err < 3.0).sum()
    assert good > 20, (mv.sum(), good)
    # the correct-scale correspondence dominates the match set
    assert (err < 3.0).mean() > 0.5, (err < 3.0).mean()


def test_sfm_registers_dolly_zoom_views():
    """Incremental SfM across a 2x scale change: three lateral views at
    z~0 (well-conditioned init) plus a dolly chain to z=2.0 toward a
    plane at z~4 — the final view sees the scene 2x larger than view 0.
    All views must register (the multi-octave pyramid + sigma-scaled
    descriptors carry the cross-scale matches; r2's single-octave
    detector could not) with a tight trajectory."""
    from hcmvs_tpu.eval.pose_eval import ate
    from hcmvs_tpu.sfm.incremental import SfMConfig, incremental_sfm
    from hcmvs_tpu.utils.synth import blob_texture_fn, make_plane_scene
    rng = np.random.default_rng(3)
    positions = [(0.0, 0.0, 0.0), (-0.35, 0.04, 0.0), (0.35, 0.02, 0.05),
                 (0.1, 0.03, 1.0), (0.18, 0.05, 2.0)]
    sc = make_plane_scene(rng, h=192, w=256, n_views=5, fx=320.0,
                          slant=(0.15, 0.08),
                          texture_fn=blob_texture_fn(rng, n_blobs=2500,
                                                     extent=2.5),
                          cam_positions=positions)
    K = np.asarray(sc.cameras[0].K)
    res = incremental_sfm([im.astype(np.float32) for im in sc.images], K,
                          SfMConfig(max_keypoints=1024, min_matches=15,
                                    min_pnp_inliers=10, n_octaves=3,
                                    ba_every=2))
    assert len(res.poses) == 5, f"registered {sorted(res.poses)}"
    gt_C = np.stack([np.asarray(c.C) for c in sc.cameras])
    reg = sorted(res.poses)
    est_C = np.stack([res.poses[i][1] for i in reg])
    stats = ate(est_C, gt_C[reg])
    assert stats["rmse"] < 0.05 * 2.0, stats   # <5% of the dolly span


def _synth_two_view(rng, n=200, outlier_frac=0.2, noise=0.001):
    X = rng.uniform(-1, 1, (n, 3)) + [0, 0, 4.0]
    angle = 0.1
    R = np.array([[np.cos(angle), 0, np.sin(angle)], [0, 1, 0],
                  [-np.sin(angle), 0, np.cos(angle)]])
    t = np.array([0.5, 0.05, 0.02])
    t = t / np.linalg.norm(t)
    p0 = X[:, :2] / X[:, 2:3]
    X1 = X @ R.T + t
    p1 = X1[:, :2] / X1[:, 2:3]
    p0 += rng.normal(0, noise, p0.shape)
    p1 += rng.normal(0, noise, p1.shape)
    n_out = int(n * outlier_frac)
    p1[:n_out] = rng.uniform(-0.5, 0.5, (n_out, 2))
    return p0.astype(np.float32), p1.astype(np.float32), R, t, n_out


def test_ransac_essential_recovers_pose():
    rng = np.random.default_rng(1)
    p0, p1, R_gt, t_gt, n_out = _synth_two_view(rng)
    res = ransac_essential(jax.random.PRNGKey(0), jnp.asarray(p0),
                           jnp.asarray(p1), jnp.ones(len(p0), bool),
                           threshold=2e-5)
    assert int(res.n_inliers) > 0.7 * (len(p0) - n_out)
    # inliers should exclude the planted outliers
    inl = np.asarray(res.inliers)
    assert inl[:n_out].mean() < 0.1
    R = np.asarray(res.R)
    t = np.asarray(res.t)
    # rotation error (degrees)
    cos_r = (np.trace(R.T @ R_gt) - 1) / 2
    assert np.degrees(np.arccos(np.clip(cos_r, -1, 1))) < 1.0
    # translation direction error
    cos_t = abs(t @ t_gt)
    assert np.degrees(np.arccos(np.clip(cos_t, -1, 1))) < 2.0


def test_triangulation():
    rng = np.random.default_rng(2)
    p0, p1, R_gt, t_gt, _ = _synth_two_view(rng, n=50, outlier_frac=0.0,
                                            noise=0.0)
    X, z = triangulate_midpoint(jnp.asarray(R_gt, jnp.float32),
                                jnp.asarray(t_gt, jnp.float32),
                                jnp.asarray(p0), jnp.asarray(p1))
    # reproject
    X = np.asarray(X)
    reproj0 = X[:, :2] / X[:, 2:3]
    np.testing.assert_allclose(reproj0, p0, atol=1e-4)
    assert (np.asarray(z) > 0).all()


def _synth_ba(rng, n_cams=4, n_pts=60, noise_px=0.5):
    fx = 400.0
    K = np.array([[fx, 0, 160], [0, fx, 120], [0, 0, 1]])
    X = rng.uniform(-1, 1, (n_pts, 3)) + [0, 0, 5.0]
    rvecs, tvecs = [], []
    obs_cam, obs_pt, obs_uv = [], [], []
    for c in range(n_cams):
        rv = rng.normal(0, 0.03, 3)
        R = np.asarray(rodrigues(jnp.asarray(rv, jnp.float32)))
        C = np.array([c * 0.4 - 0.6, 0.0, 0.0])
        t = -R @ C
        rvecs.append(rv)
        tvecs.append(t)
        for p in range(n_pts):
            Xc = R @ X[p] + t
            uv = (K @ Xc)[:2] / Xc[2]
            if 0 <= uv[0] < 320 and 0 <= uv[1] < 240:
                obs_cam.append(c)
                obs_pt.append(p)
                obs_uv.append(uv + rng.normal(0, noise_px, 2))
    return (K, np.array(rvecs), np.array(tvecs), X,
            np.array(obs_cam), np.array(obs_pt), np.array(obs_uv))


def test_bundle_adjustment_converges():
    rng = np.random.default_rng(3)
    K, rvecs, tvecs, X, obs_cam, obs_pt, obs_uv = _synth_ba(rng)
    n_cams, n_pts = len(rvecs), len(X)
    problem = build_problem(np.tile(K[None], (n_cams, 1, 1)), obs_cam,
                            obs_pt, obs_uv, n_pts,
                            fixed_cams=[True] + [False] * (n_cams - 1))
    # perturb everything except the gauge camera
    rv_p = rvecs + rng.normal(0, 0.01, rvecs.shape) * \
        (np.arange(n_cams) > 0)[:, None]
    tv_p = tvecs + rng.normal(0, 0.05, tvecs.shape) * \
        (np.arange(n_cams) > 0)[:, None]
    X_p = X + rng.normal(0, 0.05, X.shape)
    state = BAState(rvecs=jnp.asarray(rv_p, jnp.float32),
                    tvecs=jnp.asarray(tv_p, jnp.float32),
                    points=jnp.asarray(X_p, jnp.float32))
    cost0 = float(ba_cost(problem, state))
    state, cost = run_ba(problem, state, n_iters=15)
    n_obs = len(obs_cam)
    rms = np.sqrt(cost / n_obs)
    assert cost < cost0 * 0.1
    assert rms < 1.0          # converged to ~noise level (0.5px)
    # pose error vs GT
    t_err = np.linalg.norm(np.asarray(state.tvecs) - tvecs, axis=1)
    assert t_err.max() < 0.02


def test_bundle_adjustment_cg_scales():
    """The matrix-free PCG Schur solver (solver="cg", forced) on a
    problem too big for dense assembly habits: 64 cams / 20k points /
    100k observations with NO per-point truncation, converging to the
    0.5px noise floor (ref analog: Ceres ITERATIVE_SCHUR inside
    openMVG_main_IncrementalSfM, MvgMvsPipeline.py:190-192)."""
    from hcmvs_tpu.eval.ba_bench import make_problem
    from hcmvs_tpu.sfm.ba import ba_cost, ba_step
    problem, state, m = make_problem(n_cams=64, n_pts=20_000,
                                     init_pt_noise=0.01)
    cost0 = float(ba_cost(problem, state))
    lam = 1e-3
    cost = cost0
    for _ in range(10):
        trial = ba_step(problem, state, jnp.float32(lam), solver="cg")
        c = float(ba_cost(problem, trial))
        if c < cost:
            state, cost, lam = trial, c, max(lam * 0.5, 1e-8)
        else:
            lam = min(lam * 4.0, 1e4)
    rms = np.sqrt(cost / m)
    assert rms < 1.0, (np.sqrt(cost0 / m), rms)


def test_rodrigues_roundtrip():
    rng = np.random.default_rng(4)
    for _ in range(5):
        rv = rng.normal(0, 0.5, 3)
        R = np.asarray(rodrigues(jnp.asarray(rv, jnp.float32)))
        rv2 = rotation_to_rvec(R)
        np.testing.assert_allclose(rv2, rv, atol=1e-4)
    # identity
    np.testing.assert_allclose(
        np.asarray(rodrigues(jnp.zeros(3))), np.eye(3), atol=1e-6)


def test_homography_model_selection():
    """AUTO model selection: a planar pair is explained by H (ratio ~1),
    a 3D pair is not (ratio << 1)."""
    import jax.numpy as jnp
    from hcmvs_tpu.sfm.two_view import ransac_essential, ransac_homography
    rng = np.random.default_rng(0)
    n = 120
    R, t = np.eye(3), np.array([0.4, 0.0, 0.0])

    def project_pair(X):
        p0 = X[:, :2] / X[:, 2:3]
        X1 = X @ R.T + t
        p1 = X1[:, :2] / X1[:, 2:3]
        return (jnp.asarray(p0, jnp.float32), jnp.asarray(p1, jnp.float32))

    planar = np.column_stack([rng.uniform(-1, 1, (n, 2)), np.full(n, 4.0)])
    deep = np.column_stack([rng.uniform(-1, 1, (n, 2)),
                            rng.uniform(3, 6, n)])
    ratios = []
    for X in (planar, deep):
        p0, p1 = project_pair(X)
        ok = jnp.ones(n, bool)
        e = ransac_essential(jax.random.PRNGKey(1), p0, p1, ok, 2e-5)
        h = ransac_homography(jax.random.PRNGKey(0), p0, p1, ok, 4e-5)
        ratios.append(int(h.n_inliers) / max(int(e.n_inliers), 1))
    assert ratios[0] > 0.9     # planar: homography explains everything
    assert ratios[1] < 0.5     # 3D: it cannot


def test_nfa_threshold_separates_noise_scales():
    """The a-contrario threshold adapts to the residual noise scale
    (ref: AutoEstimator.h:230 AC-RANSAC — no fixed threshold)."""
    from hcmvs_tpu.sfm.acransac import nfa_threshold
    rng = np.random.default_rng(0)
    for sigma in (1e-4, 1e-3):
        # 300 inliers at noise sigma, 100 uniform outliers
        d2 = np.concatenate([
            (rng.normal(0, sigma, 300)) ** 2,
            rng.uniform(0.3, 1.0, 100) ** 2]).astype(np.float32)
        log_nfa, thr2, k = nfa_threshold(
            jnp.asarray(d2), jnp.ones(400, bool), m=8)
        assert float(log_nfa) < 0                    # significant
        assert 250 <= int(k) <= 320                  # finds the inliers
        # threshold sits between the noise scale and the outlier scale
        assert sigma ** 2 * 0.5 < float(thr2) < 0.09
    # pure-noise control: nothing significant to find
    d2n = rng.uniform(0.1, 1.0, 400).astype(np.float32) ** 2
    log_nfa_n, _, _ = nfa_threshold(jnp.asarray(d2n),
                                    jnp.ones(400, bool), m=8)
    assert float(log_nfa_n) > float(log_nfa)


def test_ransac_essential_adaptive_across_noise():
    """AC-RANSAC mode recovers the pose at BOTH a low and a 10x-higher
    noise level with no threshold tuning — the fixed default (1e-5 sq
    Sampson) would reject most true inliers at the high-noise scale."""
    for noise, tol_deg in ((3e-4, 1.0), (3e-3, 6.0)):
        rng = np.random.default_rng(7)
        p0, p1, R_gt, t_gt, n_out = _synth_two_view(rng, noise=noise)
        res = ransac_essential(jax.random.PRNGKey(0), jnp.asarray(p0),
                               jnp.asarray(p1), jnp.ones(len(p0), bool),
                               adaptive=True)
        assert int(res.n_inliers) > 0.6 * (len(p0) - n_out), noise
        inl = np.asarray(res.inliers)
        assert inl[:n_out].mean() < 0.15
        R = np.asarray(res.R)
        t = np.asarray(res.t)
        cos_r = (np.trace(R.T @ R_gt) - 1) / 2
        assert np.degrees(np.arccos(np.clip(cos_r, -1, 1))) < tol_deg
        cos_t = abs(t @ t_gt)
        assert np.degrees(np.arccos(np.clip(cos_t, -1, 1))) < 3 * tol_deg
