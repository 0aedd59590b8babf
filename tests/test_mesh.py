import numpy as np
import pytest

from hcmvs_tpu.mesh.delaunay import reconstruct_mesh
from hcmvs_tpu.mesh.mesh_ops import (clean_mesh, compute_vertex_normals,
                                     decimate_mesh, laplacian_smooth,
                                     remove_small_components)
from hcmvs_tpu.mesh.texture import (face_view_quality, label_faces,
                                    texture_mesh, write_textured_obj)


def _plane_cloud(rng, n=400, z=3.0, noise=0.01):
    """Noisy samples of the plane z=z0 seen from cameras above."""
    xy = rng.uniform(-1, 1, (n, 2))
    pts = np.column_stack([xy, np.full(n, z) + rng.normal(0, noise, n)])
    cams = np.array([[0.0, 0.0, 0.0], [0.5, 0.0, 0.0], [-0.5, 0.0, 0.0]])
    point_cam = rng.integers(0, 3, n)
    return pts.astype(np.float64), cams, point_cam


def test_reconstruct_plane_surface(rng):
    pts, cams, point_cam = _plane_cloud(rng)
    mesh = reconstruct_mesh(pts, cams, point_cam)
    assert len(mesh.faces) > 100
    # surface faces should lie near the z=3 plane
    face_z = mesh.vertices[mesh.faces].mean(1)[:, 2]
    frac_on_plane = (np.abs(face_z - 3.0) < 0.1).mean()
    assert frac_on_plane > 0.8
    # normals should predominantly face the cameras (-z)
    a = mesh.vertices[mesh.faces[:, 0]]
    b = mesh.vertices[mesh.faces[:, 1]]
    c = mesh.vertices[mesh.faces[:, 2]]
    nrm = np.cross(b - a, c - a)
    on_plane = np.abs(face_z - 3.0) < 0.1
    frac_up = (nrm[on_plane][:, 2] < 0).mean()
    assert frac_up > 0.7


def _grid_mesh(nx=10, ny=10, z=3.0):
    xs = np.linspace(-1, 1, nx)
    ys = np.linspace(-1, 1, ny)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    verts = np.column_stack([gx.ravel(), gy.ravel(),
                             np.full(nx * ny, z)]).astype(np.float32)
    faces = []
    for i in range(nx - 1):
        for j in range(ny - 1):
            a = i * ny + j
            # winding chosen so normals face -z (toward cameras at z=0)
            faces.append([a, a + 1, a + ny])
            faces.append([a + 1, a + ny + 1, a + ny])
    return verts, np.asarray(faces, np.int32)


def test_mesh_ops(rng):
    verts, faces = _grid_mesh()
    # add a tiny disconnected triangle far away
    extra_v = np.array([[10, 10, 10], [10.1, 10, 10], [10, 10.1, 10]],
                       np.float32)
    verts2 = np.concatenate([verts, extra_v])
    faces2 = np.concatenate([faces,
                             [[len(verts), len(verts) + 1, len(verts) + 2]]])
    v3, f3 = remove_small_components(verts2, faces2, min_faces=5)
    assert len(f3) == len(faces)
    assert len(v3) == len(verts)

    v4, f4 = decimate_mesh(verts, faces, 0.3)
    assert len(v4) < len(verts)
    assert len(f4) > 0
    # decimated mesh stays on the plane
    np.testing.assert_allclose(v4[:, 2], 3.0, atol=1e-5)

    noisy = verts + rng.normal(0, 0.02, verts.shape).astype(np.float32)
    sm = laplacian_smooth(noisy, faces, n_iters=5)
    assert sm[:, 2].std() < noisy[:, 2].std()

    n = compute_vertex_normals(verts, faces)
    assert np.abs(n[:, 2]).min() > 0.99

    cv, cf = clean_mesh(verts2, faces2, decimate=0.5,
                        min_component_faces=5)
    assert len(cf) > 0


def _views_for_texture():
    Ks = np.tile(np.array([[100.0, 0, 64], [0, 100.0, 48],
                           [0, 0, 1.0]])[None], (2, 1, 1))
    Rs = np.tile(np.eye(3)[None], (2, 1, 1))
    Cs = np.array([[0.0, 0, 0], [0.6, 0, 0]])
    img0 = np.full((96, 128, 3), 0.2, np.float32)
    img1 = np.full((96, 128, 3), 0.8, np.float32)
    return [img0, img1], Ks, Rs, Cs


def test_face_labeling_and_texture(tmp_path):
    verts, faces = _grid_mesh(8, 8, z=3.0)
    images, Ks, Rs, Cs = _views_for_texture()
    qual = face_view_quality(verts, faces, Ks, Rs, Cs,
                             [(128, 96), (128, 96)])
    assert (qual.max(1) > 0).mean() > 0.5
    labels = label_faces(faces, qual)
    assert (labels >= 0).sum() > 0
    tm = texture_mesh(verts, faces, images, Ks, Rs, Cs, atlas_size=256)
    assert tm.atlas.max() > 0           # something was sampled
    labeled = tm.labels >= 0
    assert (tm.uvs[labeled] >= 0).all() and (tm.uvs[labeled] <= 1).all()
    path = str(tmp_path / "mesh.obj")
    write_textured_obj(path, tm)
    txt = open(path).read()
    assert txt.count("\nv ") == len(verts)
    assert "mtllib" in txt
    import os
    assert os.path.exists(str(tmp_path / "mesh.png"))


def test_close_holes():
    """A grid mesh with a punched-out interior quad gets re-closed
    (ref: Mesh::CloseHole, Mesh.cpp:3156)."""
    from hcmvs_tpu.mesh.mesh_ops import close_holes
    n = 6
    ys, xs = np.mgrid[0:n, 0:n]
    verts = np.stack([xs.ravel(), ys.ravel(),
                      np.zeros(n * n)], 1).astype(np.float32)
    faces = []
    for y in range(n - 1):
        for x in range(n - 1):
            a = y * n + x
            faces.append([a, a + 1, a + n])
            faces.append([a + 1, a + n + 1, a + n])
    faces = np.asarray(faces, np.int32)
    # punch a hole: remove the 4 faces around vertex (2,2)-(3,3) quad
    hole = []
    for i, f in enumerate(faces):
        pts = verts[f][:, :2]
        if (pts[:, 0].min() >= 2 and pts[:, 0].max() <= 3
                and pts[:, 1].min() >= 2 and pts[:, 1].max() <= 3):
            hole.append(i)
    assert len(hole) == 2
    kept = np.delete(faces, hole, axis=0)
    v2, f2 = close_holes(verts, kept, max_hole_size=8)
    # hole closed: boundary edge count inside the mesh back to zero (the
    # outer rim stays open, it is longer than max_hole_size)
    from collections import Counter
    cnt = Counter()
    for f in f2:
        for k in range(3):
            e = (min(f[k], f[(k + 1) % 3]), max(f[k], f[(k + 1) % 3]))
            cnt[e] += 1
    boundary = [e for e, c in cnt.items() if c == 1]
    interior_boundary = [e for e in boundary
                         if not (verts[min(e, key=int)][0] in (0, n - 1))]
    # every boundary edge must lie on the outer rim
    for (a, b) in boundary:
        pa, pb = v2[a][:2], v2[b][:2]
        on_rim = (lambda p: p[0] in (0, n - 1) or p[1] in (0, n - 1))
        assert on_rim(pa) and on_rim(pb), (pa, pb)


def test_global_seam_leveling_reduces_seam():
    """Two views of a plane with a brightness offset: the per-chart
    offsets cancel the exposure difference."""
    from hcmvs_tpu.mesh.texture import global_seam_leveling
    rng = np.random.default_rng(0)
    # two triangles sharing an edge; each labeled to a different view
    verts = np.array([[0, 0, 5], [1, 0, 5], [0, 1, 5], [1, 1, 5]],
                     np.float64)
    faces = np.array([[0, 1, 2], [1, 3, 2]], np.int32)
    labels = np.array([0, 1])
    charts = [np.array([0]), np.array([1])]
    K = np.array([[50.0, 0, 32], [0, 50.0, 32], [0, 0, 1]])
    R = np.eye(3)
    C0 = np.zeros(3)
    img0 = np.full((64, 64, 3), 100, np.uint8)
    img1 = np.full((64, 64, 3), 140, np.uint8)  # +40 exposure offset
    off = global_seam_leveling(verts, faces, labels, charts,
                               [img0, img1], np.stack([K, K]),
                               np.stack([R, R]), np.stack([C0, C0]))
    # corrected seam difference ~ 0: (100 + o0) == (140 + o1)
    assert abs((100 + off[0, 0]) - (140 + off[1, 0])) < 1.0


def test_lbp_labeling_smooths_noise():
    """LBP on a strip of faces: one face with a weak preference for an
    odd view flips to its neighbors' label under the Potts prior."""
    from hcmvs_tpu.mesh.texture import label_faces_lbp
    # strip of 8 triangles sharing edges: vertices 0..9
    faces = np.array([[i, i + 1, i + 2] for i in range(8)], np.int32)
    qual = np.zeros((8, 2), np.float32)
    qual[:, 0] = 1.0
    qual[4, 0] = 0.45
    qual[4, 1] = 0.5    # slight lone preference for view 1
    labels = label_faces_lbp(faces, qual, smooth_weight=0.3)
    assert (labels == 0).all(), labels


def test_outlier_view_rejection():
    """A view observing a wrong (occluded) color gets zeroed."""
    from hcmvs_tpu.mesh.texture import reject_outlier_views
    verts = np.array([[0, 0, 5], [1, 0, 5], [0, 1, 5]], np.float64)
    faces = np.array([[0, 1, 2]], np.int32)
    K = np.array([[50.0, 0, 32], [0, 50.0, 32], [0, 0, 1]])
    R = np.eye(3)
    C = np.zeros(3)
    imgs = [np.full((64, 64), 100, np.uint8),
            np.full((64, 64), 102, np.uint8),
            np.full((64, 64), 200, np.uint8)]  # occluded view: wrong color
    qual = np.ones((1, 3), np.float32)
    out = reject_outlier_views(verts, faces, qual, imgs,
                               np.stack([K] * 3), np.stack([R] * 3),
                               np.stack([C] * 3))
    assert out[0, 0] > 0 and out[0, 1] > 0 and out[0, 2] == 0.0


def test_subdivide_and_sample_and_fix():
    from hcmvs_tpu.mesh.mesh_ops import (fix_non_manifold, sample_points,
                                         subdivide)
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]],
                     np.float32)
    faces = np.array([[0, 1, 2], [1, 3, 2]], np.int32)
    v2, f2 = subdivide(verts, faces)
    assert len(f2) == 8 and len(v2) == 4 + 5  # 5 unique edge midpoints
    pts, nrm = sample_points(v2, f2, 100)
    assert pts.shape == (100, 3)
    assert np.allclose(np.abs(nrm[:, 2]), 1.0)
    assert (pts[:, :2] >= -1e-6).all() and (pts[:, :2] <= 1 + 1e-6).all()
    # plant a duplicate + degenerate + non-manifold face
    bad = np.concatenate([faces, [[0, 1, 2], [0, 0, 1], [0, 1, 3]]])
    v3, f3 = fix_non_manifold(verts, bad)
    assert len(f3) <= 3


def test_rasterize_depth_plane():
    from hcmvs_tpu.mesh.mesh_ops import rasterize_depth
    # unit quad at z=4 filling the view center
    verts = np.array([[-1, -1, 4], [1, -1, 4], [-1, 1, 4], [1, 1, 4]],
                     np.float64)
    faces = np.array([[0, 1, 2], [1, 3, 2]], np.int32)
    K = np.array([[40.0, 0, 32], [0, 40.0, 24], [0, 0, 1]])
    d = rasterize_depth(verts, faces, K, np.eye(3), np.zeros(3), 48, 64)
    assert abs(d[24, 32] - 4.0) < 1e-6
    assert d[1, 1] == 0.0
    inner = d[20:28, 28:36]
    assert (np.abs(inner - 4.0) < 1e-6).all()


def _two_view_textured_scene():
    """Grid mesh on a textured z=4 plane; two laterally-offset views each
    cover only ~one half (forcing a chart seam down the middle), and
    view 1 carries a horizontal brightness gradient — a residual no
    global per-chart constant can cancel."""
    h, w = 96, 128
    K = np.array([[170.0, 0, w / 2], [0, 170.0, h / 2], [0, 0, 1.0]])
    Cs = np.stack([np.array([-0.75, 0.0, 0.0]),
                   np.array([0.75, 0.0, 0.0])])
    Rs = np.stack([np.eye(3), np.eye(3)])
    Ks = np.stack([K, K])

    def tex(x, y):
        return (0.5 + 0.25 * np.sin(5.1 * x + 3.3 * y)
                + 0.25 * np.sin(9.7 * x * y + 1.0)).astype(np.float32)

    imgs = []
    for v in range(2):
        vv, uu = np.meshgrid(np.arange(h, dtype=np.float64),
                             np.arange(w, dtype=np.float64), indexing="ij")
        ray = np.linalg.inv(K) @ np.stack(
            [uu.ravel(), vv.ravel(), np.ones(h * w)])
        t = 4.0 / ray[2]
        X = Cs[v][:, None] + ray * t
        img = tex(X[0].reshape(h, w), X[1].reshape(h, w))
        if v == 1:
            img = img + np.linspace(-0.15, 0.15, w)[None, :]
        imgs.append(np.clip(img, 0, 1).astype(np.float32))
    n = 10
    xs = np.linspace(-1.0, 1.0, n)
    X, Y = np.meshgrid(xs, xs)
    verts = np.stack([X.ravel(), Y.ravel(),
                      np.full(n * n, 4.0)], 1).astype(np.float64)
    faces = []
    for j in range(n - 1):
        for i in range(n - 1):
            a = j * n + i
            # wind toward the camera (normal -z): counter-clockwise in xy
            faces += [[a, a + n, a + 1], [a + 1, a + n, a + n + 1]]
    faces = np.asarray(faces, np.int32)
    return verts, faces, imgs, Ks, Rs, Cs


def _seam_error(tm, faces):
    """Mean atlas-color jump across chart-boundary edges."""
    from collections import defaultdict
    h, w = tm.atlas.shape[:2]

    def at(uv):
        x = int(np.clip(uv[0] * w, 0, w - 1))
        y = int(np.clip((1 - uv[1]) * h, 0, h - 1))
        return tm.atlas[y, x].astype(float)

    edge_face = {}
    diffs = []
    for fi, face in enumerate(faces):
        for k in range(3):
            a, b = face[k], face[(k + 1) % 3]
            e = (min(a, b), max(a, b))
            if e not in edge_face:
                edge_face[e] = (fi, k)
                continue
            fo, ko = edge_face[e]
            if tm.labels[fi] == tm.labels[fo] or tm.labels[fi] < 0 \
                    or tm.labels[fo] < 0:
                continue
            # midpoints of the shared edge in each face's chart
            uv_a = 0.5 * (tm.uvs[fi, k] + tm.uvs[fi, (k + 1) % 3])
            uv_b = 0.5 * (tm.uvs[fo, ko] + tm.uvs[fo, (ko + 1) % 3])
            diffs.append(np.abs(at(uv_a) - at(uv_b)).mean())
    return float(np.mean(diffs)) if diffs else 0.0


def test_local_seam_leveling_tightens_seams():
    """Local (seam-band) leveling must reduce the residual seam jump that
    the global per-chart constants cannot cancel (ref: SceneTexture.cpp
    local seam leveling)."""
    from hcmvs_tpu.mesh.texture import texture_mesh
    verts, faces, imgs, Ks, Rs, Cs = _two_view_textured_scene()
    tm_g = texture_mesh(verts, faces, imgs, Ks, Rs, Cs, atlas_size=512,
                        local_leveling=False)
    tm_l = texture_mesh(verts, faces, imgs, Ks, Rs, Cs, atlas_size=512,
                        local_leveling=True)
    # identical labeling -> comparable seams
    assert (tm_g.labels == tm_l.labels).all()
    e_g = _seam_error(tm_g, faces)
    e_l = _seam_error(tm_l, faces)
    if e_g > 2.0:    # only meaningful when there IS a seam residual
        assert e_l < e_g, (e_l, e_g)


def test_maxrects_utilization_beats_shelf():
    """The MaxRects packer (ref: RectsBinPack.cpp) must place at least as
    much chart area as the shelf heuristic."""
    from hcmvs_tpu.mesh.texture import texture_mesh
    verts, faces, imgs, Ks, Rs, Cs = _two_view_textured_scene()
    tm_m = texture_mesh(verts, faces, imgs, Ks, Rs, Cs, atlas_size=256,
                        packer="maxrects")
    tm_s = texture_mesh(verts, faces, imgs, Ks, Rs, Cs, atlas_size=256,
                        packer="shelf")
    assert tm_m.utilization >= tm_s.utilization, (tm_m.utilization,
                                                  tm_s.utilization)
    assert tm_m.utilization > 0


def test_maxrects_packer_dense():
    """Pure packer check: many mixed rects reach decent utilization and
    never overlap."""
    from hcmvs_tpu.mesh.texture import MaxRectsPacker
    rng = np.random.default_rng(0)
    p = MaxRectsPacker(256, 256)
    placed = []
    for _ in range(200):
        w, h = rng.integers(8, 60, 2)
        pos = p.insert(int(w), int(h))
        if pos is not None:
            placed.append((pos[0], pos[1], int(w), int(h)))
    # no overlaps
    grid = np.zeros((256, 256), np.int32)
    for (x, y, w, h) in placed:
        grid[y:y + h, x:x + w] += 1
    assert grid.max() == 1
    util = sum(w * h for (_, _, w, h) in placed) / 256.0 ** 2
    assert util > 0.75, util


def test_qem_decimation_preserves_sharp_features():
    """QEM edge collapse (ref: VCG quadric decimation) must keep sharp
    box edges that grid clustering rounds off — planar regions collapse
    losslessly."""
    from hcmvs_tpu.mesh.mesh_ops import decimate_mesh, sample_points

    def grid_patch(n, face_fn, off):
        xs = np.linspace(-1, 1, n)
        X, Y = np.meshgrid(xs, xs)
        V = face_fn(X.ravel(), Y.ravel())
        F = []
        for j in range(n - 1):
            for i in range(n - 1):
                a = j * n + i
                F += [[a, a + 1, a + n], [a + 1, a + n + 1, a + n]]
        return V, np.asarray(F, np.int32) + off

    n = 16
    parts_v, parts_f, off = [], [], 0
    for axis in range(3):
        for s in (-1.0, 1.0):
            def fn(x, y, axis=axis, s=s):
                out = np.zeros((len(x), 3))
                other = [k for k in range(3) if k != axis]
                out[:, other[0]] = x
                out[:, other[1]] = y
                out[:, axis] = s
                return out
            V, F = grid_patch(n, fn, off)
            parts_v.append(V)
            parts_f.append(F)
            off += len(V)
    V = np.concatenate(parts_v).astype(np.float32)
    F = np.concatenate(parts_f)

    def box_dist(p):
        q = np.abs(p)
        outside = np.maximum(q - 1.0, 0)
        d_out = np.linalg.norm(outside, axis=1)
        d_in = np.abs(q.max(1) - 1.0)
        return np.where((q <= 1.0).all(1), d_in, d_out)

    vq, fq = decimate_mesh(V, F, 0.15, method="qem")
    vc, fc = decimate_mesh(V, F, 0.15, method="cluster")
    sq, _ = sample_points(vq, fq, 8000)
    scl, _ = sample_points(vc, fc, 8000)
    eq = box_dist(sq)
    ec = box_dist(scl)
    assert len(vq) < 0.3 * len(V)
    assert eq.mean() < 1e-4, eq.mean()            # planar: lossless
    assert eq.mean() < ec.mean() * 0.5, (eq.mean(), ec.mean())


def test_trws_labeling_matches_or_beats_lbp():
    """The TRW-S texturing-solver option (ref: SceneTexture.cpp:65-88):
    on the noisy-strip MRF it reaches the same smoothed labeling as
    LBP, and by construction its Potts energy is never worse (the
    energy-based selection in label_faces_trws)."""
    from hcmvs_tpu.mesh.texture import (label_faces_lbp, label_faces_trws,
                                        labeling_energy)
    rng = np.random.default_rng(4)
    faces = np.array([[i, i + 1, i + 2] for i in range(24)], np.int32)
    qual = rng.uniform(0.2, 1.0, (24, 3)).astype(np.float32)
    qual[::2, 0] += 1.0                         # view 0 mostly dominant
    t = label_faces_trws(faces, qual, smooth_weight=0.4)
    l = label_faces_lbp(faces, qual, smooth_weight=0.4)
    assert labeling_energy(faces, qual, t, 0.4) <= \
        labeling_energy(faces, qual, l, 0.4) + 1e-6
    # the lone-flip case resolves identically
    qual2 = np.zeros((8, 2), np.float32)
    qual2[:, 0] = 1.0
    qual2[4, 0] = 0.45
    qual2[4, 1] = 0.5
    assert (label_faces_trws(faces[:8], qual2, smooth_weight=0.3)
            == 0).all()


def test_texture_mesh_solver_option():
    """texture_mesh accepts solver='trws' end-to-end."""
    from hcmvs_tpu.mesh.texture import texture_mesh
    K = np.array([[40.0, 0, 32], [0, 40.0, 32], [0, 0, 1]])
    R = np.eye(3)
    verts = np.array([[-0.3, -0.3, 4], [0.3, -0.3, 4], [0.3, 0.3, 4],
                      [-0.3, 0.3, 4]], np.float64)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    imgs = [np.full((64, 64), 120, np.uint8),
            np.full((64, 64), 121, np.uint8)]
    tm = texture_mesh(verts, faces, imgs, np.stack([K, K]),
                      np.stack([R, R]),
                      np.stack([np.zeros(3), np.array([0.1, 0, 0])]),
                      atlas_size=128, solver="trws")
    assert tm.atlas.shape == (128, 128, 3)
    assert tm.uvs.shape == (2, 3, 2)
