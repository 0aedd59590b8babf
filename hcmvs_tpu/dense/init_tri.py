"""Dense depth initialization from sparse points via 2D Delaunay.

The reference's TriangulatePoints2DepthMap (ref:
frame_main/libs/MVS/DepthMap.cpp:1879-1938 — CGAL 2D Delaunay over the
sparse points' projections, barycentric depth interpolation across every
facet, optional image corners at robust depths, bAddCorners) — used by
InitDepthMap when initTriangulate is on (restore variant; frame_main's
read-init path loads previous-stage maps instead).

Host-side scipy (Qhull) like the rest of the irregular geometry; the
interpolation itself is vectorized over all pixels at once.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from scipy.spatial import Delaunay


def triangulate_init(uv: np.ndarray, depth: np.ndarray, h: int, w: int,
                     add_corners: bool = True
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Barycentric-interpolated dense depth from sparse projections.

    Args:
      uv: (P, 2) pixel coordinates of the sparse points in this view.
      depth: (P,) their camera depths.
      add_corners: include the 4 image corners at a robust (median of the
        nearest points) depth so the triangulation spans the whole image
        (ref: bAddCorners, DepthMap.cpp:1889-1911).

    Returns (depth_map (h, w) float32 with 0 where uncovered,
             mask (h, w) bool of covered pixels).
    """
    uv = np.asarray(uv, np.float64)
    depth = np.asarray(depth, np.float64)
    ok = (depth > 0) & np.isfinite(depth)
    uv, depth = uv[ok], depth[ok]
    if len(uv) < 3:
        return np.zeros((h, w), np.float32), np.zeros((h, w), bool)
    if add_corners:
        corners = np.array([[0, 0], [w - 1.0, 0], [0, h - 1.0],
                            [w - 1.0, h - 1.0]])
        extra = []
        for c in corners:
            d2 = np.sum((uv - c) ** 2, axis=1)
            near = np.argsort(d2)[:max(3, len(uv) // 20)]
            extra.append(np.median(depth[near]))
        uv = np.concatenate([uv, corners])
        depth = np.concatenate([depth, extra])
    try:
        tri = Delaunay(uv)
    except Exception:
        return np.zeros((h, w), np.float32), np.zeros((h, w), bool)
    ys, xs = np.mgrid[0:h, 0:w]
    q = np.stack([xs.ravel(), ys.ravel()], 1).astype(np.float64)
    simplex = tri.find_simplex(q)
    inside = simplex >= 0
    s = np.maximum(simplex, 0)
    # barycentric coordinates of each query in its simplex
    T = tri.transform[s]                       # (Q, 3, 2)
    r = q - T[:, 2]
    bary = np.einsum("qij,qj->qi", T[:, :2], r)
    b = np.concatenate([bary, 1.0 - bary.sum(1, keepdims=True)], 1)
    verts = tri.simplices[s]                   # (Q, 3)
    d = np.sum(b * depth[verts], axis=1)
    d = np.where(inside & (d > 0), d, 0.0)
    return d.reshape(h, w).astype(np.float32), inside.reshape(h, w)


def scene_triangulated_seeds(points: np.ndarray, view_counts: np.ndarray,
                             view_ids: np.ndarray, cams_np,
                             n_images: int, h: int, w: int,
                             add_corners: bool = True) -> np.ndarray:
    """(N, H, W) Delaunay-interpolated seed depth maps for every view —
    the full InitDepthMap(initTriangulate=1) analog (splat_sparse_depths
    is the cheap point-splat variant)."""
    offs = np.concatenate([[0], np.cumsum(view_counts)])
    seeds = np.zeros((n_images, h, w), np.float32)
    proj = [[] for _ in range(n_images)]
    dep = [[] for _ in range(n_images)]
    for p in range(len(points)):
        for i in view_ids[offs[p]:offs[p + 1]]:
            K, R, C = cams_np[int(i)]
            Xc = R @ (points[p] - C)
            if Xc[2] <= 0:
                continue
            pp = K @ Xc
            proj[int(i)].append(pp[:2] / pp[2])
            dep[int(i)].append(Xc[2])
    for i in range(n_images):
        if len(proj[i]) >= 3:
            seeds[i], _ = triangulate_init(np.asarray(proj[i]),
                                           np.asarray(dep[i]), h, w,
                                           add_corners)
    return seeds
