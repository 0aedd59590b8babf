"""Mesh texturing: face-view labeling, atlas packing, OBJ/MTL export.

Replaces the reference's SceneTexture pipeline
(ref: frame_main/libs/MVS/SceneTexture.cpp:1972 Scene::TextureMesh —
face-per-view MRF labeling solved with LBP, outlier rejection, seam
leveling, RectsBinPack atlas packing):

- Per-face data terms (projected area x viewing angle x in-bounds) are
  computed as one vectorized pass per view.
- The Potts MRF is solved with vectorized ICM sweeps (the LBP analog on a
  face adjacency graph; a jittable message-passing version is the planned
  upgrade).
- Charts (connected same-label face groups) are shelf-packed into a single
  texture atlas (ref: RectsBinPack.cpp MaxRects/Shelf heuristics), colors
  sampled from the winning view, and a global per-chart gain match stands
  in for seam leveling.
"""

from __future__ import annotations

import os
from typing import List, NamedTuple, Tuple

import numpy as np


class TexturedMesh(NamedTuple):
    vertices: np.ndarray      # (V, 3)
    faces: np.ndarray         # (F, 3)
    uvs: np.ndarray           # (F, 3, 2) per-corner atlas UVs in [0, 1]
    atlas: np.ndarray         # (A, A, 3) uint8
    labels: np.ndarray        # (F,) winning view per face (-1 = none)


def _project_np(K, R, C, X):
    Xc = (X - C) @ R.T
    z = Xc[:, 2]
    uv = Xc @ K.T
    with np.errstate(divide="ignore", invalid="ignore"):
        uv = uv[:, :2] / uv[:, 2:3]
    return uv, z


def face_view_quality(vertices: np.ndarray, faces: np.ndarray,
                      Ks: np.ndarray, Rs: np.ndarray, Cs: np.ndarray,
                      image_sizes: List[Tuple[int, int]]) -> np.ndarray:
    """(F, N) per-face per-view quality (0 = unusable).

    Quality = projected triangle area x facing term, zero when any corner
    projects outside the image or the face is back-facing (ref:
    SceneTexture.cpp data-cost construction).
    """
    n_views = len(Ks)
    f = len(faces)
    qual = np.zeros((f, n_views), np.float32)
    a = vertices[faces[:, 0]]
    b = vertices[faces[:, 1]]
    c = vertices[faces[:, 2]]
    face_n = np.cross(b - a, c - a)
    face_n /= np.maximum(np.linalg.norm(face_n, axis=1, keepdims=True),
                         1e-12)
    centroid = (a + b + c) / 3
    for v in range(n_views):
        w, h = image_sizes[v]
        uvs = []
        zs = []
        inb = np.ones(f, bool)
        for corner in (a, b, c):
            uv, z = _project_np(Ks[v], Rs[v], Cs[v], corner)
            uvs.append(uv)
            zs.append(z)
            inb &= ((uv[:, 0] >= 0) & (uv[:, 0] <= w - 1)
                    & (uv[:, 1] >= 0) & (uv[:, 1] <= h - 1) & (z > 0))
        # projected area
        e1 = uvs[1] - uvs[0]
        e2 = uvs[2] - uvs[0]
        area = 0.5 * np.abs(e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0])
        view_dir = centroid - Cs[v]
        view_dir /= np.maximum(np.linalg.norm(view_dir, axis=1,
                                              keepdims=True), 1e-12)
        facing = -np.sum(face_n * view_dir, axis=1)
        qual[:, v] = np.where(inb & (facing > 0.05), area * facing, 0.0)
    return qual


def _face_adjacency(faces: np.ndarray):
    """Padded face adjacency (F, D) with -1 fill + reverse slot index."""
    f = len(faces)
    edge_map = {}
    adj = [[] for _ in range(f)]
    for f_idx, face in enumerate(faces):
        for k in range(3):
            e = (min(face[k], face[(k + 1) % 3]),
                 max(face[k], face[(k + 1) % 3]))
            if e in edge_map:
                o = edge_map[e]
                adj[f_idx].append(o)
                adj[o].append(f_idx)
            else:
                edge_map[e] = f_idx
    max_deg = max((len(x) for x in adj), default=1)
    adj_arr = np.full((f, max_deg), -1, np.int32)
    for i, lst in enumerate(adj):
        adj_arr[i, :len(lst)] = lst
    # rev[f, d] = slot d' such that adj[adj[f, d], d'] == f
    rev = np.zeros((f, max_deg), np.int32)
    for i in range(f):
        for d, g in enumerate(adj_arr[i]):
            if g >= 0:
                rev[i, d] = int(np.nonzero(adj_arr[g] == i)[0][0])
    return adj_arr, rev


def label_faces_lbp(faces: np.ndarray, quality: np.ndarray,
                    smooth_weight: float = 0.3,
                    n_iters: int = 20) -> np.ndarray:
    """Potts-MRF face labeling via min-sum loopy belief propagation —
    the reference's default solver (ref: SceneTexture.cpp:65-88 LBP /
    frame_main/libs/Math/LBP.h), as a jittable synchronous message-passing
    scan over the padded face adjacency."""
    import jax
    import jax.numpy as jnp
    f, n_views = quality.shape
    if f == 0:
        return np.full(0, -1, np.int64)
    adj_arr, rev = _face_adjacency(faces)
    big = 1e6
    data = np.where(quality > 0, -quality / max(quality.max(), 1e-9), big)
    lam = smooth_weight
    valid = adj_arr >= 0
    adj_c = np.maximum(adj_arr, 0)

    @jax.jit
    def run(data, adj_c, rev, valid):
        d_max = adj_c.shape[1]
        M = jnp.zeros((f, d_max, n_views), jnp.float32)

        def step(M, _):
            h = data + M.sum(1)                           # (F, L) beliefs
            hx = h[:, None, :] - M                        # exclude sender
            m_out = jnp.minimum(hx, hx.min(-1, keepdims=True) + lam)
            m_out = m_out - m_out.min(-1, keepdims=True)
            # deliver: M_new[g, rev[f, d]] = m_out[f, d] for valid slots
            M_new = jnp.zeros_like(M)
            M_new = M_new.at[adj_c.reshape(-1),
                             rev.reshape(-1)].add(
                jnp.where(valid.reshape(-1)[:, None],
                          m_out.reshape(-1, n_views), 0.0))
            return M_new, None

        M, _ = jax.lax.scan(step, M, None, length=n_iters)
        return jnp.argmin(data + M.sum(1), axis=1)

    labels = np.asarray(run(jnp.asarray(data, jnp.float32),
                            jnp.asarray(adj_c), jnp.asarray(rev),
                            jnp.asarray(valid))).astype(np.int64)
    labels[quality.max(1) <= 0] = -1
    return labels


def reject_outlier_views(vertices: np.ndarray, faces: np.ndarray,
                         quality: np.ndarray, images: List[np.ndarray],
                         Ks, Rs, Cs, threshold: float = 6e-2) -> np.ndarray:
    """Zero the quality of (face, view) pairs whose observed color is an
    outlier against the face's cross-view median (ref: SceneTexture.cpp
    face-texture outlier rejection, --outlier-threshold 6e-2): occluders
    and specular views stop winning the labeling."""
    fq = quality.copy()
    n_views = quality.shape[1]
    cent = vertices[faces].mean(1)
    cols = np.full((len(faces), n_views), np.nan)
    for v in range(n_views):
        uv, z = _project_np(Ks[v], Rs[v], Cs[v], cent)
        img = images[v]
        h, w = img.shape[:2]
        ok = (quality[:, v] > 0) & (z > 0)
        x = np.clip(np.round(uv[:, 0]).astype(int), 0, w - 1)
        y = np.clip(np.round(uv[:, 1]).astype(int), 0, h - 1)
        c = img[y, x]
        if c.ndim == 2:
            c = c.mean(-1)
        if img.dtype == np.uint8:
            c = c / 255.0
        cols[:, v] = np.where(ok, c, np.nan)
    n_obs = (~np.isnan(cols)).sum(1)
    med = np.nanmedian(np.where(np.isnan(cols), np.nan, cols), axis=1)
    dev = np.abs(cols - med[:, None])
    with np.errstate(invalid="ignore"):
        out = dev > threshold
    # a median over < 3 observations cannot identify an outlier (with 2,
    # both views deviate from their midpoint equally)
    out[n_obs < 3] = False
    fq[np.nan_to_num(out, nan=False).astype(bool)] = 0.0
    return fq


def label_faces(faces: np.ndarray, quality: np.ndarray,
                smooth_weight: float = 0.3, n_iters: int = 8) -> np.ndarray:
    """Potts-MRF face labeling via vectorized ICM sweeps (the cheap
    fallback; label_faces_lbp is the reference-default LBP solver)."""
    f, n_views = quality.shape
    labels = np.argmax(quality, axis=1)
    labels[quality.max(1) <= 0] = -1
    if f == 0:
        return labels
    # face adjacency via shared edges
    edge_map = {}
    adj = [[] for _ in range(f)]
    for f_idx, face in enumerate(faces):
        for k in range(3):
            e = (min(face[k], face[(k + 1) % 3]),
                 max(face[k], face[(k + 1) % 3]))
            if e in edge_map:
                o = edge_map[e]
                adj[f_idx].append(o)
                adj[o].append(f_idx)
            else:
                edge_map[e] = f_idx
    max_deg = max((len(x) for x in adj), default=0)
    adj_arr = np.full((f, max_deg), -1, np.int64)
    for i, lst in enumerate(adj):
        adj_arr[i, :len(lst)] = lst

    data = -quality / max(quality.max(), 1e-9)     # lower is better
    scale = np.abs(data).mean() + 1e-9
    for _ in range(n_iters):
        nb_labels = np.where(adj_arr >= 0, labels[np.maximum(adj_arr, 0)],
                             -2)
        # cost per candidate label: data + potts disagreement with nbrs
        disagree = (nb_labels[:, :, None]
                    != np.arange(n_views)[None, None, :])
        valid_nb = (adj_arr >= 0)[:, :, None]
        potts = (disagree & valid_nb).sum(1) * smooth_weight * scale
        cost = data + potts
        cost[quality <= 0] = 1e9
        new_labels = np.argmin(cost, axis=1)
        new_labels[quality.max(1) <= 0] = -1
        if (new_labels == labels).all():
            break
        labels = new_labels
    return labels


def _charts(faces: np.ndarray, labels: np.ndarray) -> List[np.ndarray]:
    """Connected components of same-label faces."""
    f = len(faces)
    edge_map = {}
    parent = np.arange(f)

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for f_idx, face in enumerate(faces):
        for k in range(3):
            e = (min(face[k], face[(k + 1) % 3]),
                 max(face[k], face[(k + 1) % 3]))
            if e in edge_map:
                o = edge_map[e]
                if labels[o] == labels[f_idx] and labels[f_idx] >= 0:
                    a, b = find(o), find(f_idx)
                    if a != b:
                        parent[a] = b
            else:
                edge_map[e] = f_idx
    roots = np.array([find(i) for i in range(f)])
    charts = []
    for r in np.unique(roots):
        members = np.nonzero(roots == r)[0]
        if labels[members[0]] >= 0:
            charts.append(members)
    return charts


def _sample_color(img: np.ndarray, uv: np.ndarray) -> np.ndarray:
    """Nearest-pixel colors at (M, 2) uv; (M, 3) float in the image's
    native scale, out-of-bounds clamped."""
    h, w = img.shape[:2]
    x = np.clip(np.round(uv[:, 0]).astype(int), 0, w - 1)
    y = np.clip(np.round(uv[:, 1]).astype(int), 0, h - 1)
    c = img[y, x]
    if c.ndim == 1:
        c = np.repeat(c[:, None], 3, 1)
    return c.astype(np.float64)


def global_seam_leveling(vertices: np.ndarray, faces: np.ndarray,
                         labels: np.ndarray, charts: List[np.ndarray],
                         images: List[np.ndarray], Ks, Rs, Cs,
                         reg: float = 1e-3) -> np.ndarray:
    """Per-chart additive color offsets that minimize seam discontinuity
    (ref: SceneTexture.cpp global seam leveling — the reference solves
    per-vertex offsets; per-chart constants capture the dominant
    exposure/white-balance difference between views and keep the system
    tiny).  Returns (n_charts, 3) offsets in the images' native scale.
    """
    n_charts = len(charts)
    chart_of_face = np.full(len(faces), -1)
    for ci, members in enumerate(charts):
        chart_of_face[members] = ci
    # seam edges: mesh edges shared by faces of different charts
    edge_face = {}
    pair_diffs = {}
    for f_idx, face in enumerate(faces):
        ca = chart_of_face[f_idx]
        if ca < 0:
            continue
        for k in range(3):
            a, b = face[k], face[(k + 1) % 3]
            e = (min(a, b), max(a, b))
            if e in edge_face:
                o = edge_face[e]
                cb = chart_of_face[o]
                if cb >= 0 and cb != ca:
                    key = (min(ca, cb), max(ca, cb))
                    pair_diffs.setdefault(key, []).extend(e)
            else:
                edge_face[e] = f_idx
    if not pair_diffs:
        return np.zeros((n_charts, 3))
    # least squares: o_a - o_b = -(col_a - col_b) at each seam, per channel
    rows, rhs = [], []
    for (ca, cb), vids in pair_diffs.items():
        vids = np.unique(vids)
        va = labels[charts[ca][0]]
        vb = labels[charts[cb][0]]
        uva, za = _project_np(Ks[va], Rs[va], Cs[va], vertices[vids])
        uvb, zb = _project_np(Ks[vb], Rs[vb], Cs[vb], vertices[vids])
        col_a = _sample_color(images[va], uva)
        col_b = _sample_color(images[vb], uvb)
        d = (col_a - col_b).mean(0)
        r = np.zeros(n_charts)
        r[ca], r[cb] = 1.0, -1.0
        rows.append(r)
        rhs.append(-d)
    A = np.asarray(rows)
    B = np.asarray(rhs)                       # (E, 3)
    AtA = A.T @ A + reg * np.eye(n_charts)
    return np.linalg.solve(AtA, A.T @ B)      # (n_charts, 3)


def texture_mesh(vertices: np.ndarray, faces: np.ndarray,
                 images: List[np.ndarray], Ks: np.ndarray, Rs: np.ndarray,
                 Cs: np.ndarray, atlas_size: int = 1024,
                 padding: int = 2, seam_leveling: bool = True
                 ) -> TexturedMesh:
    """Full texturing pass: outlier-reject -> LBP label -> charts ->
    seam-level -> shelf-pack."""
    image_sizes = [(im.shape[1], im.shape[0]) for im in images]
    qual = face_view_quality(vertices, faces, Ks, Rs, Cs, image_sizes)
    qual = reject_outlier_views(vertices, faces, qual, images, Ks, Rs, Cs)
    labels = label_faces_lbp(faces, qual)
    charts = _charts(faces, labels)
    offsets = (global_seam_leveling(vertices, faces, labels, charts,
                                    images, Ks, Rs, Cs)
               if seam_leveling and charts else
               np.zeros((len(charts), 3)))

    atlas = np.zeros((atlas_size, atlas_size, 3), np.uint8)
    uvs = np.zeros((len(faces), 3, 2), np.float32)

    # compute each chart's projected bbox in its view
    chart_info = []
    for members in charts:
        v_idx = labels[members[0]]
        verts = np.unique(faces[members])
        uv, _ = _project_np(Ks[v_idx], Rs[v_idx], Cs[v_idx],
                            vertices[verts])
        lo = np.floor(uv.min(0)).astype(int)
        hi = np.ceil(uv.max(0)).astype(int) + 1
        w_img, h_img = image_sizes[v_idx]
        lo = np.clip(lo, 0, [w_img - 1, h_img - 1])
        hi = np.clip(hi, 1, [w_img, h_img])
        chart_info.append((members, v_idx, lo, hi))

    # shelf packing, tallest first (ref: RectsBinPack shelf heuristic)
    order = sorted(range(len(chart_info)),
                   key=lambda i: -(chart_info[i][3][1]
                                   - chart_info[i][2][1]))
    x_cur = padding
    y_cur = padding
    shelf_h = 0
    for ci in order:
        members, v_idx, lo, hi = chart_info[ci]
        cw = hi[0] - lo[0]
        ch = hi[1] - lo[1]
        # downscale chart if larger than the atlas
        scale = min(1.0, (atlas_size - 2 * padding) / max(cw, ch, 1))
        sw = max(1, int(cw * scale))
        sh = max(1, int(ch * scale))
        if x_cur + sw + padding > atlas_size:
            x_cur = padding
            y_cur += shelf_h + padding
            shelf_h = 0
        if y_cur + sh + padding > atlas_size:
            continue   # atlas full: faces keep uv 0 (degraded, not fatal)
        img = images[v_idx]
        patch = img[lo[1]:hi[1], lo[0]:hi[0]]
        if patch.ndim == 2:
            patch = np.repeat(patch[..., None], 3, -1)
        # seam leveling: per-chart color offset in the image's native scale
        patch = patch.astype(np.float64) + offsets[ci]
        if img.dtype != np.uint8:
            patch = patch * 255
        patch = np.clip(patch, 0, 255).astype(np.uint8)
        if scale != 1.0:
            import cv2
            patch = cv2.resize(patch, (sw, sh))
        atlas[y_cur:y_cur + sh, x_cur:x_cur + sw] = patch[:sh, :sw]
        # per-corner uvs
        for f_idx in members:
            uv_f, _ = _project_np(Ks[v_idx], Rs[v_idx], Cs[v_idx],
                                  vertices[faces[f_idx]])
            rel = (uv_f - lo) * scale
            uvs[f_idx, :, 0] = (x_cur + rel[:, 0]) / atlas_size
            uvs[f_idx, :, 1] = 1.0 - (y_cur + rel[:, 1]) / atlas_size
        x_cur += sw + padding
        shelf_h = max(shelf_h, sh)

    return TexturedMesh(vertices=vertices.astype(np.float32),
                        faces=faces.astype(np.int32), uvs=uvs,
                        atlas=atlas, labels=labels)


def write_textured_obj(path: str, tm: TexturedMesh) -> None:
    """OBJ + MTL + PNG atlas (ref: Mesh OBJ export, libs/IO/OBJ.cpp)."""
    base = os.path.splitext(path)[0]
    name = os.path.basename(base)
    import cv2
    cv2.imwrite(base + ".png", tm.atlas[..., ::-1])
    with open(base + ".mtl", "w") as f:
        f.write(f"newmtl textured\nKa 1 1 1\nKd 1 1 1\n"
                f"map_Kd {name}.png\n")
    with open(path, "w") as f:
        f.write(f"mtllib {name}.mtl\nusemtl textured\n")
        for v in tm.vertices:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for fi in range(len(tm.faces)):
            for c in range(3):
                u, vv = tm.uvs[fi, c]
                f.write(f"vt {u} {vv}\n")
        for fi, face in enumerate(tm.faces):
            t = 3 * fi
            f.write(f"f {face[0]+1}/{t+1} {face[1]+1}/{t+2} "
                    f"{face[2]+1}/{t+3}\n")
