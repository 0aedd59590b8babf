import numpy as np

from hcmvs_tpu.io.colmap import (_qvec2rot, _rot2qvec, read_colmap_model,
                                 write_colmap_model)
from test_io import _make_scene


def test_quaternion_roundtrip(rng):
    for _ in range(5):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = _qvec2rot(q)
        # valid rotation
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
        q2 = _rot2qvec(R)
        if q2[0] < 0:
            q2 = -q2
        np.testing.assert_allclose(q2, q, atol=1e-8)


def test_colmap_model_roundtrip(tmp_path, rng):
    scene = _make_scene(rng, n_imgs=3, n_pts=12)
    # colmap cameras need explicit sizes
    scene.platforms[0].cameras[0].width = 640
    scene.platforms[0].cameras[0].height = 480
    scene.platforms[0].cameras[0].K = np.array(
        [[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    # give pose 1 a non-trivial rotation
    th = 0.3
    scene.platforms[0].poses[1].R = np.array(
        [[np.cos(th), 0, np.sin(th)], [0, 1, 0],
         [-np.sin(th), 0, np.cos(th)]])
    model_dir = str(tmp_path / "sparse")
    write_colmap_model(model_dir, scene)
    back = read_colmap_model(model_dir)
    assert len(back.images) == 3
    assert len(back.points) == 12
    K = back.platforms[0].cameras[0].K
    np.testing.assert_allclose(K[0, 0], 500.0)
    for i in range(3):
        R0, C0 = scene.pose_of(i)
        R1, C1 = back.pose_of(i)
        np.testing.assert_allclose(R1, R0, atol=1e-8)
        np.testing.assert_allclose(C1, C0, atol=1e-8)
    np.testing.assert_allclose(back.points, scene.points, atol=1e-6)
    np.testing.assert_array_equal(back.point_view_counts,
                                  scene.point_view_counts)
