import numpy as np

from hcmvs_tpu.io.dmap import DepthMapData, read_dmap, write_dmap
from hcmvs_tpu.io.mvs import (CameraIntrinsic, ImageRecord, Platform, Pose,
                              SceneMVS, read_mvs, write_mvs)
from hcmvs_tpu.io.ply import read_ply, write_ply_mesh, write_ply_points


def test_dmap_roundtrip(tmp_path, rng):
    h, w = 12, 17
    data = DepthMapData(
        depth=rng.uniform(1, 5, (h, w)).astype(np.float32),
        normal=rng.normal(size=(h, w, 3)).astype(np.float32),
        conf=rng.uniform(0, 1, (h, w)).astype(np.float32),
        K=np.diag([500.0, 500.0, 1.0]),
        R=np.eye(3),
        C=np.array([0.1, 0.2, 0.3]),
        d_min=1.0, d_max=5.0, image_size=(34, 24),
        image_name="img0001.jpg", view_ids=[0, 1, 2, 5])
    path = str(tmp_path / "depth0000.dmap")
    write_dmap(path, data)
    out = read_dmap(path)
    np.testing.assert_array_equal(out.depth, data.depth)
    np.testing.assert_array_equal(out.normal, data.normal)
    np.testing.assert_array_equal(out.conf, data.conf)
    np.testing.assert_array_equal(out.K, data.K)
    np.testing.assert_array_equal(out.R, data.R)
    np.testing.assert_array_equal(out.C, data.C)
    assert out.image_size == (34, 24)
    assert out.image_name == "img0001.jpg"
    assert list(out.view_ids) == [0, 1, 2, 5]
    assert out.d_min == 1.0 and out.d_max == 5.0


def test_dmap_depth_only(tmp_path, rng):
    data = DepthMapData(depth=rng.uniform(1, 2, (4, 6)).astype(np.float32),
                        K=np.eye(3), R=np.eye(3), C=np.zeros(3))
    path = str(tmp_path / "d.dmap")
    write_dmap(path, data)
    out = read_dmap(path)
    assert out.normal is None and out.conf is None
    np.testing.assert_array_equal(out.depth, data.depth)


def _make_scene(rng, n_imgs=3, n_pts=10):
    cam = CameraIntrinsic(
        name="cam0",
        K=np.array([[1.2, 0, 0.5], [0, 1.2, 0.4], [0, 0, 1.0]]),
        R=np.eye(3), C=np.zeros(3))
    plat = Platform(name="p0", cameras=[cam])
    for i in range(n_imgs):
        R = np.eye(3)
        C = np.array([i * 0.1, 0.0, 0.0])
        plat.poses.append(Pose(R=R, C=C))
    scene = SceneMVS(platforms=[plat])
    for i in range(n_imgs):
        scene.images.append(ImageRecord(
            name=f"images/im{i:04d}.jpg", platform_id=0, camera_id=0,
            pose_id=i, id=i))
    scene.points = rng.normal(size=(n_pts, 3)).astype(np.float32)
    counts = rng.integers(2, n_imgs + 1, n_pts).astype(np.int32)
    scene.point_view_counts = counts
    scene.point_view_ids = np.concatenate(
        [rng.choice(n_imgs, c, replace=False) for c in counts]).astype(
            np.uint32)
    scene.point_view_confs = rng.uniform(0, 1, counts.sum()).astype(
        np.float32)
    scene.point_colors = rng.integers(0, 255, (n_pts, 3)).astype(np.uint8)
    return scene


def test_mvs_roundtrip(tmp_path, rng):
    scene = _make_scene(rng)
    path = str(tmp_path / "scene.mvs")
    write_mvs(path, scene)
    out = read_mvs(path)
    assert len(out.platforms) == 1
    assert len(out.images) == 3
    assert out.images[1].name == "images/im0001.jpg"
    np.testing.assert_allclose(out.platforms[0].cameras[0].K,
                               scene.platforms[0].cameras[0].K)
    np.testing.assert_allclose(out.points, scene.points, rtol=1e-6)
    np.testing.assert_array_equal(out.point_view_counts,
                                  scene.point_view_counts)
    np.testing.assert_array_equal(out.point_view_ids, scene.point_view_ids)
    np.testing.assert_allclose(out.point_view_confs, scene.point_view_confs)
    np.testing.assert_array_equal(out.point_colors, scene.point_colors)


def test_mvs_pose_of(tmp_path, rng):
    scene = _make_scene(rng)
    R, C = scene.pose_of(2)
    np.testing.assert_allclose(R, np.eye(3))
    np.testing.assert_allclose(C, [0.2, 0, 0])


def test_mvs_full_k():
    cam = CameraIntrinsic(K=np.array([[1.0, 0, 0.5], [0, 1.0, 0.375],
                                      [0, 0, 1.0]]))
    K = cam.full_K(640, 480)
    np.testing.assert_allclose(K[0, 0], 640.0)
    np.testing.assert_allclose(K[0, 2], 320.0)
    np.testing.assert_allclose(K[1, 2], 240.0)


def test_ply_points_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(20, 3)).astype(np.float32)
    nrm = rng.normal(size=(20, 3)).astype(np.float32)
    col = rng.integers(0, 255, (20, 3)).astype(np.uint8)
    path = str(tmp_path / "cloud.ply")
    write_ply_points(path, pts, nrm, col)
    verts, extras = read_ply(path)
    np.testing.assert_allclose(verts, pts)
    np.testing.assert_allclose(extras["normals"], nrm)
    np.testing.assert_array_equal(extras["colors"], col)


def test_ply_mesh_roundtrip(tmp_path, rng):
    verts = rng.normal(size=(8, 3)).astype(np.float32)
    faces = np.array([[0, 1, 2], [2, 3, 4], [4, 5, 6]], np.int32)
    path = str(tmp_path / "mesh.ply")
    write_ply_mesh(path, verts, faces)
    v, extras = read_ply(path)
    np.testing.assert_allclose(v, verts)
    np.testing.assert_array_equal(extras["faces"], faces)


def test_config_from_cli():
    from hcmvs_tpu.core.config import DenseConfig, config_from_cli_flags
    # the canonical stage flags (ref: data/frame_main/resize2/run.py:36-78)
    flags = {"resolution-level": "2", "number-views": "10",
             "n-EstimationIters": "3", "n-EstimationIters-external": "4",
             "n-photo2geo": "1", "n-opticalflow": "1",
             "n-initTriangulate": "0", "n-photometric_flow": "0.26",
             "n-para_tapa": "0.26", "n-adapthalfwin": "7",
             "n-propagatehalfwin": "5", "n-propagatestep": "4"}
    cfg = config_from_cli_flags(flags)
    assert cfg.resolution_level == 2
    assert cfg.estimation_iters == 3
    assert cfg.estimation_iters_external == 4
    assert cfg.photo2geo == 1
    assert cfg.photometric_flow == 0.26
    assert cfg.adapt_half_window == 7
    assert hash(cfg) == hash(cfg.replace())


def test_viewer_html_export(tmp_path):
    """The offline viewer HTML embeds the geometry losslessly and leaves
    no unsubstituted template fields (ref capability: apps/Viewer — here
    an exported dependency-free WebGL orbit viewer)."""
    import base64
    import re
    from hcmvs_tpu.io.viewer import export_viewer_html
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((500, 3)).astype(np.float32)
    cols = rng.integers(0, 255, (500, 3)).astype(np.uint8)
    faces = rng.integers(0, 500, (300, 3)).astype(np.int32)
    path = tmp_path / "v.html"
    export_viewer_html(str(path), pts, colors=cols, faces=faces,
                       title="t")
    html = path.read_text()
    assert "%(" not in html          # all template fields substituted
    assert html.count("<script>") == 1

    def blob(name):
        m = re.search(rf'const {name} = "([^"]*)"', html)
        return base64.b64decode(m.group(1))

    p2 = np.frombuffer(blob("PTS_B64"), np.float32).reshape(-1, 3)
    np.testing.assert_array_equal(p2, pts)
    c2 = np.frombuffer(blob("COL_B64"), np.uint8).reshape(-1, 3)
    np.testing.assert_array_equal(c2, cols)
    f2 = np.frombuffer(blob("IDX_B64"), np.uint32).reshape(-1, 3)
    np.testing.assert_array_equal(f2, faces.astype(np.uint32))
    # braces balance in the embedded JS (cheap syntax smoke test)
    js = html.split("<script>")[1].split("</script>")[0]
    assert js.count("{") == js.count("}")
    assert js.count("(") == js.count(")")
