"""Round-trip tests for the scene/mesh format converters
(NVM / OpenMVG JSON / PhotoScan XML / OBJ)."""

import numpy as np
import pytest

from hcmvs_tpu.io.mvs import (CameraIntrinsic, ImageRecord, Platform, Pose,
                              SceneMVS)
from hcmvs_tpu.io.nvm import (quat_to_rot, read_nvm, rot_to_quat, write_nvm)
from hcmvs_tpu.io.obj import read_obj, write_obj
from hcmvs_tpu.io.openmvg import read_openmvg_json, write_openmvg_json
from hcmvs_tpu.io.photoscan import read_photoscan_xml, write_photoscan_xml


def _rand_rot(rng):
    q = rng.normal(size=4)
    return quat_to_rot(q / np.linalg.norm(q))


def _make_scene(rng, n_imgs=4, n_pts=20, center_pp=True):
    plat = Platform(name="test")
    scene = SceneMVS(platforms=[plat])
    w, h = 640, 480
    for i in range(n_imgs):
        f = 500.0 + 10 * i
        cx, cy = (w / 2.0, h / 2.0) if center_pp else (315.0, 245.0)
        K = np.array([[f, 0, cx], [0, f, cy], [0, 0, 1.0]])
        plat.cameras.append(CameraIntrinsic(
            name=f"c{i}", width=w, height=h, K=K, R=np.eye(3),
            C=np.zeros(3)))
        plat.poses.append(Pose(R=_rand_rot(rng), C=rng.normal(size=3)))
        scene.images.append(ImageRecord(name=f"im{i}.jpg", platform_id=0,
                                        camera_id=i, pose_id=i, id=i))
    scene.points = rng.normal(size=(n_pts, 3)).astype(np.float32)
    counts = rng.integers(2, n_imgs + 1, n_pts).astype(np.int32)
    ids = np.concatenate([rng.choice(n_imgs, c, replace=False)
                          for c in counts]).astype(np.uint32)
    scene.point_view_counts = counts
    scene.point_view_ids = ids
    scene.point_view_confs = np.ones(len(ids), np.float32)
    scene.point_colors = rng.integers(0, 255, (n_pts, 3)).astype(np.uint8)
    return scene


def _check_poses(a: SceneMVS, b: SceneMVS, atol=1e-5):
    assert len(a.images) == len(b.images)
    for i in range(len(a.images)):
        Ra, Ca = a.pose_of(i)
        Rb, Cb = b.pose_of(i)
        np.testing.assert_allclose(Ra, Rb, atol=atol)
        np.testing.assert_allclose(Ca, Cb, atol=atol)


def test_quat_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(20):
        R = _rand_rot(rng)
        np.testing.assert_allclose(quat_to_rot(rot_to_quat(R)), R,
                                   atol=1e-12)


def test_nvm_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    scene = _make_scene(rng)
    p = str(tmp_path / "model.nvm")
    write_nvm(p, scene)
    back = read_nvm(p, image_size=(640, 480))
    _check_poses(scene, back)
    np.testing.assert_allclose(back.points, scene.points, atol=1e-4)
    np.testing.assert_array_equal(back.point_view_counts,
                                  scene.point_view_counts)
    np.testing.assert_array_equal(back.point_view_ids, scene.point_view_ids)
    np.testing.assert_array_equal(back.point_colors, scene.point_colors)
    for i in range(4):
        K = back.platforms[0].cameras[i].K
        assert K[0, 0] == pytest.approx(500.0 + 10 * i)
        assert K[0, 2] == pytest.approx(320.0)


def test_openmvg_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    scene = _make_scene(rng, center_pp=False)
    p = str(tmp_path / "sfm_data.json")
    write_openmvg_json(p, scene)
    back = read_openmvg_json(p)
    _check_poses(scene, back)
    np.testing.assert_allclose(back.points, scene.points, atol=1e-5)
    np.testing.assert_array_equal(back.point_view_counts,
                                  scene.point_view_counts)
    K = back.platforms[0].cameras[back.images[0].camera_id].K
    assert K[0, 2] == pytest.approx(315.0)
    assert K[1, 2] == pytest.approx(245.0)


def test_photoscan_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    scene = _make_scene(rng, center_pp=False)
    p = str(tmp_path / "cameras.xml")
    write_photoscan_xml(p, scene)
    back = read_photoscan_xml(p)
    _check_poses(scene, back)
    # sensors become platforms
    K = back.platforms[back.images[2].platform_id].cameras[0].K
    assert K[0, 0] == pytest.approx(520.0)


def test_photoscan_center_offset_heuristic(tmp_path):
    """Metashape-style cx/cy offsets from center are detected."""
    xml = """<?xml version="1.0"?>
<document version="1.5.0"><chunk>
 <sensors><sensor id="0" label="s" type="frame">
  <calibration type="frame" class="adjusted">
   <resolution width="640" height="480"/>
   <f>500</f><cx>-3.5</cx><cy>2.25</cy>
  </calibration></sensor></sensors>
 <cameras><camera id="0" sensor_id="0" label="im0">
  <transform>1 0 0 0 0 1 0 0 0 0 1 5 0 0 0 1</transform>
 </camera></cameras>
</chunk></document>"""
    p = tmp_path / "m.xml"
    p.write_text(xml)
    sc = read_photoscan_xml(str(p))
    K = sc.platforms[0].cameras[0].K
    assert K[0, 2] == pytest.approx(320 - 3.5)
    assert K[1, 2] == pytest.approx(240 + 2.25)
    R, C = sc.pose_of(0)
    np.testing.assert_allclose(R, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(C, [0, 0, 5], atol=1e-12)


def test_obj_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    verts = rng.normal(size=(10, 3)).astype(np.float32)
    faces = rng.integers(0, 10, (7, 3)).astype(np.int32)
    tex = rng.random((6, 2)).astype(np.float32)
    ftex = rng.integers(0, 6, (7, 3)).astype(np.int32)
    p = str(tmp_path / "m.obj")
    write_obj(p, verts, faces, texcoords=tex, face_texcoords=ftex,
              material="mat0", mtllib="m.mtl")
    m = read_obj(p)
    np.testing.assert_allclose(m.vertices, verts, atol=1e-5)
    np.testing.assert_array_equal(m.faces, faces)
    np.testing.assert_allclose(m.texcoords, tex, atol=1e-5)
    np.testing.assert_array_equal(m.face_texcoords, ftex)
    assert m.material == "mat0" and m.mtllib == "m.mtl"


def test_obj_polygon_triangulation(tmp_path):
    p = tmp_path / "quad.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf 1 2 3 4\n")
    m = read_obj(str(p))
    assert m.faces.shape == (2, 3)
    np.testing.assert_array_equal(m.faces, [[0, 1, 2], [0, 2, 3]])
