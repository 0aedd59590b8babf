"""Real-photo frontend: EXIF intrinsics bootstrap + Brown radial
distortion (estimation in BA, undistortion for the MVS stages).

Reference analog: OpenMVG's SfMInit_ImageListing EXIF focal seeding
(frame_main/MvgMvsPipeline.py:181-183), radial-K3 refinement inside
IncrementalSfM (:190-192), undistorted export to .mvs (:208-210).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hcmvs_tpu.sfm.distortion import (distort_normalized,
                                      distort_points_px,
                                      estimate_distortion,
                                      refine_with_distortion,
                                      undistort_image,
                                      undistort_normalized,
                                      undistort_points_px)


K_TEST = np.array([[180.0, 0, 96.0], [0, 180.0, 72.0], [0, 0, 1.0]])


def _distort_images(images, K, k):
    """Synthesize distorted photos from ideal pinhole renders:
    D(p) = I(undistort(p)) so that undistort_image(D) == I."""
    h, w = images[0].shape
    yy, xx = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    uv = np.stack([xx, yy], -1).reshape(-1, 2)
    src = np.asarray(undistort_points_px(
        jnp.asarray(uv), jnp.asarray(K, jnp.float32),
        jnp.asarray(k, jnp.float32))).reshape(h, w, 2)
    x = np.clip(src[..., 0], 0, w - 1.001)
    y = np.clip(src[..., 1], 0, h - 1.001)
    x0 = x.astype(np.int64)
    y0 = y.astype(np.int64)
    fx = x - x0
    fy = y - y0
    out = []
    for im in images:
        d = ((im[y0, x0] * (1 - fx) + im[y0, x0 + 1] * fx) * (1 - fy)
             + (im[y0 + 1, x0] * (1 - fx) + im[y0 + 1, x0 + 1] * fx) * fy)
        out.append(d.astype(np.float32))
    return out


def test_distort_undistort_roundtrip():
    rng = np.random.default_rng(0)
    k = jnp.asarray([-0.2, 0.03, 0.0])
    xn = jnp.asarray(rng.uniform(-0.6, 0.6, (500, 2)), jnp.float32)
    xd = distort_normalized(xn, k)
    back = undistort_normalized(xd, k)
    assert float(jnp.abs(back - xn).max()) < 1e-5
    # pixel-space wrappers agree
    uv = rng.uniform(0, 190, (200, 2)).astype(np.float32)
    uu = undistort_points_px(distort_points_px(jnp.asarray(uv),
                                               jnp.asarray(K_TEST),
                                               k),
                             jnp.asarray(K_TEST), k)
    assert float(jnp.abs(uu - uv).max()) < 1e-3


def test_undistort_image_inverts_synthetic_distortion():
    rng = np.random.default_rng(1)
    img = rng.random((144, 192)).astype(np.float32)
    # smooth it so bilinear resampling error stays small
    from scipy.ndimage import gaussian_filter
    img = gaussian_filter(img, 2.0).astype(np.float32)
    k = np.array([-0.15, 0.0, 0.0], np.float32)
    dist = _distort_images([img], K_TEST, k)[0]
    rec = undistort_image(dist, K_TEST, k)
    # compare away from the border (distortion pulls in content from
    # outside the frame near edges)
    a = rec[30:-30, 30:-30]
    b = img[30:-30, 30:-30]
    assert np.abs(a - b).mean() < 0.01


def test_fit_k_recovers_coefficients():
    """Geometry-fixed GN half-step: exact projections + synthetic
    distortion -> coefficients recovered to float tolerance."""
    from hcmvs_tpu.sfm.distortion import _fit_k
    rng = np.random.default_rng(2)
    k_true = jnp.asarray([-0.18, 0.025, 0.0])
    xn = jnp.asarray(rng.uniform(-0.55, 0.55, (800, 2)), jnp.float32)
    xd = distort_normalized(xn, k_true)
    xd = xd + 1e-4 * rng.standard_normal(xd.shape).astype(np.float32)
    k = _fit_k(xn, xd, jnp.ones(800, bool), jnp.zeros(3), n_coeffs=2)
    assert abs(float(k[0]) + 0.18) < 0.01
    assert abs(float(k[1]) - 0.025) < 0.01
    assert float(k[2]) == 0.0


def test_distortion_golden_ridge():
    """The synthetic-distortion golden: render the ridge scene through
    k1 = -0.15, recover the model + poses within the undistorted-harness
    accuracy (the reference's step-0/BA/undistort chain end-to-end)."""
    from hcmvs_tpu.eval.pose_eval import ate
    from hcmvs_tpu.sfm.incremental import SfMConfig, incremental_sfm
    from hcmvs_tpu.utils.synth import make_ridge_scene

    rng = np.random.default_rng(3)
    sc = make_ridge_scene(rng, h=144, w=192, n_views=5, fx=180.0,
                          z0=4.0, spacing=0.25)
    k_true = np.array([-0.15, 0.0, 0.0], np.float32)
    distorted = _distort_images(
        [im.astype(np.float32) for im in sc.images], K_TEST, k_true)
    cfg = SfMConfig(max_keypoints=768, min_matches=20,
                    min_pnp_inliers=10, ba_every=2)
    result = incremental_sfm(distorted, K_TEST, cfg)
    assert len(result.poses) == 5
    rms_before = result.reproj_rms
    refined, k = refine_with_distortion(result, K_TEST, verbose=False)
    # the dominant coefficient is recovered with the right sign and
    # scale, and the bundle gets tighter
    assert -0.25 < float(k[0]) < -0.08, k
    assert refined.reproj_rms < rms_before
    assert refined.reproj_rms < 1.0
    # trajectory accuracy vs GT after similarity alignment.  Measured
    # behavior of this harness (narrow 5-view baselines): structure
    # absorbs most of the radial model, so k recovers to -0.20 for true
    # -0.15 (raw-space bundle RMS minimum is flat over [-0.20, -0.13])
    # and ATE is gauge-dominated at the 1e-2 level for ANY k — so the
    # gate is absolute (10% of the baseline spacing), not relative.
    gt_centers = np.stack([np.asarray(c.C) for c in sc.cameras])
    est_centers = np.stack([refined.poses[i][1]
                            for i in sorted(refined.poses)])
    stats = ate(est_centers, gt_centers)
    assert stats["rmse"] < 0.10 * 0.25
    # end-to-end image check: undistorting the synthetic photos with the
    # RECOVERED model must reduce the photometric error vs the ideal
    # pinhole render (the .mvs-export undistortion contract)
    rec = undistort_image(distorted[0], K_TEST, k)
    ideal = sc.images[0].astype(np.float32)
    sl = np.s_[24:-24, 24:-24]
    err_corr = np.abs(rec[sl] - ideal[sl]).mean()
    err_raw = np.abs(distorted[0][sl] - ideal[sl]).mean()
    assert err_corr < 0.5 * err_raw


def test_exif_focal_bootstrap(tmp_path):
    from PIL import Image
    from hcmvs_tpu.io.exif import (focal_from_exif,
                                   scene_intrinsics_from_photos)
    rng = np.random.default_rng(4)
    arr = (rng.random((48, 64)) * 255).astype(np.uint8)

    # FocalLengthIn35mmFilm path
    p35 = str(tmp_path / "f35.jpg")
    exif = Image.Exif()
    exif.get_ifd(0x8769)[41989] = 50
    Image.fromarray(arr).save(p35, exif=exif)
    f, src = focal_from_exif(p35, 640, 480)
    assert src == "exif35" and abs(f - 50 * 640 / 36.0) < 1e-6

    # FocalLength + sensor DB path
    pdb = str(tmp_path / "fdb.jpg")
    exif = Image.Exif()
    exif[271] = "Canon"
    exif[272] = "Canon EOS 5D Mark IV"
    exif.get_ifd(0x8769)[37386] = 35.0
    Image.fromarray(arr).save(pdb, exif=exif)
    f, src = focal_from_exif(pdb, 640, 480)
    assert src == "exif_db" and abs(f - 35.0 / 36.0 * 640) < 1e-6

    # no EXIF -> OpenMVG-style default
    pno = str(tmp_path / "plain.png")
    Image.fromarray(arr).save(pno)
    f, src = focal_from_exif(pno, 640, 480)
    assert src == "default" and f == pytest.approx(1.2 * 640)

    # scene-level median bootstrap
    K, src = scene_intrinsics_from_photos([p35, pdb, pno],
                                          [640] * 3, [480] * 3)
    assert src == "exif"
    assert K[0, 2] == 320 and K[1, 2] == 240
    assert min(35.0 / 36.0, 50 / 36.0) * 640 <= K[0, 0] \
        <= max(35.0 / 36.0, 50 / 36.0) * 640


def test_run_pipeline_photos_exif(tmp_path):
    """The images-directory entry point: EXIF focal bootstrap + SfM +
    dense from a folder of JPEGs, no K argument (the reference's step-0
    contract, MvgMvsPipeline.py:181-183)."""
    from PIL import Image
    from hcmvs_tpu.core.config import DenseConfig
    from hcmvs_tpu.pipeline.mvgmvs import run_pipeline_photos
    from hcmvs_tpu.utils.synth import make_ridge_scene

    rng = np.random.default_rng(6)
    sc = make_ridge_scene(rng, h=144, w=192, n_views=4, fx=180.0,
                          z0=4.0, spacing=0.25)
    img_dir = tmp_path / "photos"
    os.makedirs(img_dir)
    for i, im in enumerate(sc.images):
        arr = (np.clip(im, 0, 1) * 255).astype(np.uint8)
        exif = Image.Exif()
        # f35 = 180 * 36 / 192 -> focal_px bootstraps to the true 180
        exif.get_ifd(0x8769)[41989] = 33.75
        Image.fromarray(arr).save(str(img_dir / f"p{i:02d}.jpg"),
                                  quality=97, exif=exif)
    cfg = DenseConfig(estimation_iters=2, estimation_iters_external=2,
                      photo2geo=1, random_iters=3, use_optical_flow=0,
                      optimize=0, resolution_level=0, min_resolution=0,
                      use_semantic=False)
    out = run_pipeline_photos(str(img_dir), str(tmp_path / "out"),
                              dense_cfg=cfg, with_mesh=False,
                              with_texture=False,
                              estimate_distortion=False, verbose=False)
    assert abs(out["K"][0, 0] - 180.0) < 1e-6     # EXIF bootstrap exact
    assert len(out["sfm"].poses) == 4
    assert out["sfm"].reproj_rms < 1.0
    assert len(out["cloud"]["points"]) > 1000
    assert os.path.exists(str(tmp_path / "out" / "scene.mvs"))
