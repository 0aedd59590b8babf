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


# .dmap writer following the reference's ExportDepthDataRaw fwrite sequence
# (frame_main/libs/MVS/DepthMap.cpp:2781-2848), using the reference's
# HeaderDepthDataRaw struct (Interface.h:634) so layout/endianness come from
# the reference header itself.
DMAP_HARNESS = r"""
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <limits>
#include <algorithm>
#include <string>
#include <vector>
#include "Interface.h"
using namespace MVS;
int main(int argc, char** argv) {
    const int W = 8, H = 6;
    HeaderDepthDataRaw header;
    header.name = HeaderDepthDataRaw::HeaderDepthDataRawName();
    header.type = HeaderDepthDataRaw::HAS_DEPTH
                | HeaderDepthDataRaw::HAS_NORMAL
                | HeaderDepthDataRaw::HAS_CONF;
    header.imageWidth = 2 * W; header.imageHeight = 2 * H;
    header.depthWidth = W; header.depthHeight = H;
    header.dMin = 0.5f; header.dMax = 9.5f;
    FILE* f = fopen(argv[1], "wb");
    if (!f) return 2;
    fwrite(&header, sizeof(HeaderDepthDataRaw), 1, f);
    const std::string name("im0.jpg");
    const uint16_t n((uint16_t)name.size());
    fwrite(&n, sizeof(uint16_t), 1, f);
    fwrite(name.c_str(), 1, n, f);
    const uint32_t ids[3] = {0, 1, 2};
    const uint32_t nIDs = 3;
    fwrite(&nIDs, sizeof(uint32_t), 1, f);
    fwrite(ids, sizeof(uint32_t), nIDs, f);
    double K[9] = {100, 0, 4, 0, 110, 3, 0, 0, 1};
    double R[9] = {1, 0, 0, 0, 0, -1, 0, 1, 0};
    double C[3] = {0.25, -0.5, 1.0};
    fwrite(K, sizeof(double), 9, f);
    fwrite(R, sizeof(double), 9, f);
    fwrite(C, sizeof(double), 3, f);
    std::vector<float> depth(H * W), normal(H * W * 3), conf(H * W);
    for (int i = 0; i < H * W; ++i) {
        depth[i] = 1.0f + 0.125f * i;
        normal[3 * i] = 0; normal[3 * i + 1] = 0; normal[3 * i + 2] = -1;
        conf[i] = 0.5f + 0.001f * i;
    }
    fwrite(depth.data(), sizeof(float), H * W, f);
    fwrite(normal.data(), sizeof(float) * 3, H * W, f);
    fwrite(conf.data(), sizeof(float), H * W, f);
    fclose(f);
    return 0;
}
"""


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


@pytest.mark.skipif(not _have_toolchain(),
                    reason="no g++ or reference tree")
def test_dmap_byte_interop(tmp_path):
    """C++-written .dmap (via the reference's HeaderDepthDataRaw +
    ExportDepthDataRaw sequence) reads field-exact in Python, and the
    Python writer reproduces the bytes exactly (ref:
    frame_main/libs/MVS/DepthMap.cpp:2781-2929)."""
    from hcmvs_tpu.io.dmap import DepthMapData, read_dmap, write_dmap
    src = tmp_path / "dmap_harness.cpp"
    src.write_text(DMAP_HARNESS)
    exe = tmp_path / "dmap_harness"
    subprocess.run(["g++", "-std=c++14", f"-I{REF_INC}", "-O1",
                    "-o", str(exe), str(src)],
                   check=True, capture_output=True, timeout=300)
    cpp_dmap = tmp_path / "cpp.dmap"
    subprocess.run([str(exe), str(cpp_dmap)], check=True, timeout=60)

    d = read_dmap(str(cpp_dmap))
    assert d.depth.shape == (6, 8)
    assert d.image_size == (16, 12)
    assert d.image_name == "im0.jpg"
    assert list(d.view_ids) == [0, 1, 2]
    assert d.d_min == pytest.approx(0.5) and d.d_max == pytest.approx(9.5)
    assert d.K[0, 0] == 100 and d.K[1, 1] == 110 and d.K[1, 2] == 3
    assert d.R[1, 2] == -1 and d.R[2, 1] == 1
    np.testing.assert_allclose(d.C, [0.25, -0.5, 1.0])
    np.testing.assert_allclose(d.depth.ravel(),
                               1.0 + 0.125 * np.arange(48), rtol=1e-6)
    np.testing.assert_allclose(d.normal[0, 0], [0, 0, -1])
    assert d.conf[0, 1] == pytest.approx(0.501)

    py_dmap = tmp_path / "py.dmap"
    write_dmap(str(py_dmap), d)
    assert py_dmap.read_bytes() == cpp_dmap.read_bytes(), \
        "python .dmap writer is not byte-identical to the C++ reference"
