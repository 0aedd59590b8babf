"""Byte-level `.mvs` interop against the C++ reference's Interface.h.

Compiles a small harness directly against the reference's standalone
serialization header (frame_main/libs/MVS/Interface.h) and checks both
directions:
  1. C++ writes a scene -> Python reads it (field-exact).
  2. Python re-writes it -> byte-identical to the C++ output.
Skipped when the reference tree or a C++ toolchain is unavailable.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

REF_INC = "/root/reference/frame_main/libs/MVS"

HARNESS = r"""
#include <cstdint>
#include <cstring>
#include <limits>
#include <algorithm>
#include <vector>
#include <string>
#include "Interface.h"
using namespace MVS;
int main(int argc, char** argv) {
    Interface s;
    Interface::Platform plat;
    plat.name = "p0";
    Interface::Platform::Camera cam;
    cam.name = "c0";
    cam.width = 640; cam.height = 480;
    double kv[9] = {500, 0, 320, 0, 510, 240, 0, 0, 1};
    double rv[9] = {1, 0, 0, 0, 1, 0, 0, 0, 1};
    for (int r = 0; r < 3; ++r) for (int c = 0; c < 3; ++c) {
        cam.K(r, c) = kv[r * 3 + c];
        cam.R(r, c) = rv[r * 3 + c];
    }
    cam.C = Interface::Pos3d(0.25, -0.5, 1.0);
    plat.cameras.push_back(cam);
    double pr[9] = {0, 1, 0, -1, 0, 0, 0, 0, 1};
    for (int i = 0; i < 3; ++i) {
        Interface::Platform::Pose pose;
        for (int r = 0; r < 3; ++r) for (int c = 0; c < 3; ++c)
            pose.R(r, c) = pr[r * 3 + c];
        pose.C = Interface::Pos3d(i * 0.1, 0.2, 0.3);
        plat.poses.push_back(pose);
    }
    s.platforms.push_back(plat);
    for (int i = 0; i < 3; ++i) {
        Interface::Image im;
        im.name = std::string("im") + char('0' + i) + ".jpg";
        im.platformID = 0; im.cameraID = 0; im.poseID = i; im.ID = i;
        s.images.push_back(im);
    }
    for (int p = 0; p < 5; ++p) {
        Interface::Vertex v;
        v.X = Interface::Pos3f(p * 0.5f, 1.0f, 2.0f + p);
        Interface::Vertex::View view;
        view.imageID = p % 3; view.confidence = 0.75f;
        v.views.push_back(view);
        view.imageID = (p + 1) % 3; view.confidence = 0.5f;
        v.views.push_back(view);
        s.vertices.push_back(v);
    }
    for (int p = 0; p < 5; ++p) {
        Interface::Normal n; n.n = Interface::Pos3f(0, 0, -1);
        s.verticesNormal.push_back(n);
        Interface::Color c; c.c = Interface::Col3(10 * p, 20, 30);
        s.verticesColor.push_back(c);
    }
    return ARCHIVE::SerializeSave(s, std::string(argv[1])) ? 0 : 1;
}
"""


def _have_toolchain():
    return (shutil.which("g++") is not None and os.path.isdir(REF_INC))


@pytest.mark.skipif(not _have_toolchain(),
                    reason="no g++ or reference tree")
def test_mvs_byte_interop(tmp_path):
    from hcmvs_tpu.io.mvs import read_mvs, write_mvs
    src = tmp_path / "harness.cpp"
    src.write_text(HARNESS)
    exe = tmp_path / "harness"
    subprocess.run(["g++", "-std=c++14", f"-I{REF_INC}", "-O1",
                    "-o", str(exe), str(src)],
                   check=True, capture_output=True, timeout=300)
    cpp_mvs = tmp_path / "cpp.mvs"
    subprocess.run([str(exe), str(cpp_mvs)], check=True, timeout=60)

    scene = read_mvs(str(cpp_mvs))
    assert len(scene.platforms) == 1
    cam = scene.platforms[0].cameras[0]
    assert (cam.width, cam.height) == (640, 480)
    assert cam.K[0, 0] == 500 and cam.K[1, 1] == 510
    np.testing.assert_allclose(cam.C, [0.25, -0.5, 1.0])
    assert len(scene.platforms[0].poses) == 3
    assert [im.name for im in scene.images] == ["im0.jpg", "im1.jpg",
                                                "im2.jpg"]
    assert len(scene.points) == 5
    np.testing.assert_array_equal(scene.point_view_counts, [2] * 5)
    assert scene.point_view_confs[0] == pytest.approx(0.75)
    np.testing.assert_allclose(scene.point_normals[0], [0, 0, -1])
    # Interface colors are BGR on disk; SceneMVS stores them as-is (BGR)
    assert scene.point_colors[1][0] == 10

    py_mvs = tmp_path / "py.mvs"
    write_mvs(str(py_mvs), scene)
    assert py_mvs.read_bytes() == cpp_mvs.read_bytes(), \
        "python writer is not byte-identical to the C++ reference"
