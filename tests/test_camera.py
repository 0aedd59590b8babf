import jax
import jax.numpy as jnp
import numpy as np

from hcmvs_tpu.core.camera import (Camera, apply_homography,
                                   fundamental_matrix, plane_homography,
                                   point_to_epiline_dist, relative_motion)


def make_camera(rng, fx=500.0, img=(640, 480)):
    angle = rng.uniform(-0.3, 0.3, 3)
    Rx = _rot(angle)
    C = rng.uniform(-1, 1, 3)
    K = np.array([[fx, 0, img[0] / 2], [0, fx, img[1] / 2], [0, 0, 1.0]])
    return Camera(K=jnp.asarray(K, jnp.float32),
                  R=jnp.asarray(Rx, jnp.float32),
                  C=jnp.asarray(C, jnp.float32))


def _rot(abc):
    a, b, c = abc
    Ra = np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)],
                   [0, np.sin(a), np.cos(a)]])
    Rb = np.array([[np.cos(b), 0, np.sin(b)], [0, 1, 0],
                   [-np.sin(b), 0, np.cos(b)]])
    Rc = np.array([[np.cos(c), -np.sin(c), 0],
                   [np.sin(c), np.cos(c), 0], [0, 0, 1]])
    return Ra @ Rb @ Rc


def test_project_backproject_roundtrip(rng):
    cam = make_camera(rng)
    X = jnp.asarray(rng.uniform(-1, 1, (50, 3)) + [0, 0, 5], jnp.float32)
    uv, depth = cam.project(X)
    X2 = cam.backproject(uv, depth)
    np.testing.assert_allclose(X2, X, atol=1e-3)


def test_k_inv(rng):
    cam = make_camera(rng)
    KKinv = cam.K @ cam.K_inv
    # fp32: cx/fx ~ 0.64 so the off-diagonal cancellation keeps ~1e-4 ulps
    np.testing.assert_allclose(KKinv, np.eye(3), atol=1e-4)


def test_world_cam_roundtrip(rng):
    cam = make_camera(rng)
    X = jnp.asarray(rng.uniform(-1, 1, (20, 3)), jnp.float32)
    np.testing.assert_allclose(cam.cam_to_world(cam.world_to_cam(X)), X,
                               atol=1e-4)


def test_projection_matrix(rng):
    cam = make_camera(rng)
    X = jnp.asarray(rng.uniform(-1, 1, (10, 3)) + [0, 0, 5], jnp.float32)
    Xh = jnp.concatenate([X, jnp.ones((10, 1))], axis=-1)
    x = jnp.einsum("ij,nj->ni", cam.P, Xh)
    uv = x[:, :2] / x[:, 2:3]
    uv2, _ = cam.project(X)
    np.testing.assert_allclose(uv, uv2, atol=1e-2)


def test_plane_homography_consistency(rng):
    """Points on the plane must map to the same pixel under H as under
    explicit reproject through 3D."""
    ref = make_camera(rng)
    src = make_camera(rng)
    # plane in ref camera coords through X0 with normal n
    n = np.array([0.2, -0.1, -1.0])
    n = n / np.linalg.norm(n)
    uv0 = jnp.asarray([[320.0, 240.0]], jnp.float32)
    depth0 = jnp.asarray([4.0], jnp.float32)
    X0c = ref.image_to_ray(uv0) * depth0[:, None]
    d_plane = jnp.sum(jnp.asarray(n, jnp.float32) * X0c, -1)

    H = plane_homography(ref, src, jnp.asarray(n, jnp.float32), d_plane)

    # sample some pixels, intersect ray with plane, project into src
    uv = jnp.asarray(rng.uniform(100, 400, (20, 2)), jnp.float32)
    ray = ref.image_to_ray(uv)
    depth = d_plane / jnp.einsum("j,nj->n", jnp.asarray(n, jnp.float32), ray)
    Xw = ref.cam_to_world(ray * depth[:, None])
    uv_src_gt, z = src.project(Xw)
    uv_src_h = apply_homography(H, uv)
    np.testing.assert_allclose(uv_src_h, uv_src_gt, rtol=1e-3, atol=0.5)


def test_fundamental_matrix_epipolar(rng):
    ref = make_camera(rng)
    src = make_camera(rng)
    F = fundamental_matrix(ref, src)
    X = jnp.asarray(rng.uniform(-1, 1, (30, 3)) + [0, 0, 6], jnp.float32)
    uv_r, _ = ref.project(X)
    uv_s, _ = src.project(X)
    d = point_to_epiline_dist(F, uv_r, uv_s)
    assert float(jnp.max(d)) < 0.1


def test_relative_motion(rng):
    ref = make_camera(rng)
    src = make_camera(rng)
    R_rel, t_rel = relative_motion(ref, src)
    X = jnp.asarray(rng.uniform(-1, 1, (10, 3)) + [0, 0, 5], jnp.float32)
    Xr = ref.world_to_cam(X)
    Xs = src.world_to_cam(X)
    Xs2 = jnp.einsum("ij,nj->ni", R_rel, Xr) + t_rel
    np.testing.assert_allclose(Xs2, Xs, atol=1e-3)


def test_batched_cameras(rng):
    cams = [make_camera(rng) for _ in range(4)]
    batched = Camera(K=jnp.stack([c.K for c in cams]),
                     R=jnp.stack([c.R for c in cams]),
                     C=jnp.stack([c.C for c in cams]))
    X = jnp.asarray(rng.uniform(-1, 1, 3) + [0, 0, 5], jnp.float32)
    uv, d = jax.vmap(lambda c: c.project(X))(batched)
    for i, c in enumerate(cams):
        uv_i, d_i = c.project(X)
        np.testing.assert_allclose(uv[i], uv_i, atol=1e-3)
