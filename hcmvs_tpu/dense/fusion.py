"""Cross-view depth filtering, gap interpolation, and point-cloud fusion.

TPU-first re-design of the reference's multi-view fusion stack:
- ``cross_view_filter`` — the consistency vote + fused-map computation the
  reference hides inside the hijacked RemoveSmallSegments
  (ref: frame_main/libs/MVS/SceneDensify.cpp:1953-2276) and FilterDepthMap
  (:3006-3259).
- ``gap_interpolate`` — row/column gap fill
  (ref: SceneDensify.cpp:2280-3001 GapInterpolation).
- ``fuse_point_cloud`` — depth maps -> world point cloud with per-point
  view support, weights, colors, normals
  (ref: SceneDensify.cpp:3265-3495 FuseDepthMaps, Conf2Weight :154-156).

The reference fuses sequentially, claiming pixels through a mutable
index map (first-processed image wins).  Here every view computes in
parallel and a deterministic ownership rule replaces the mutation: a pixel
emits its point only if no higher-priority view agrees with it (the
higher-priority view emits the merged point instead).

Layout: all per-pixel 3-vector fields are planes-first (3, H, W); normals
come in as (N, 3, H, W) — see dense/types.py LAYOUT RULE.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hcmvs_tpu.core.camera import Camera
from hcmvs_tpu.core.config import DenseConfig
from hcmvs_tpu.dense.types import (dot3, mat3_apply, mat3_apply_t,
                                   normalize3, pixel_rays)
from hcmvs_tpu.ops.sampling import bilinear_sample_xy


def conf_to_weight(conf: jax.Array, depth: jax.Array) -> jax.Array:
    """ref: SceneDensify.cpp:154-156."""
    return 1.0 / (jnp.maximum(1.0 - conf, 0.03)
                  * jnp.maximum(depth, 1e-6) ** 2)


def _cam_to_world(cam: Camera, Xc):
    Xw = mat3_apply_t(cam.R, Xc)
    return (Xw[0] + cam.C[0], Xw[1] + cam.C[1], Xw[2] + cam.C[2])


def _world_to_cam(cam: Camera, Xw):
    return mat3_apply(cam.R, (Xw[0] - cam.C[0], Xw[1] - cam.C[1],
                              Xw[2] - cam.C[2]))


def _project(cam: Camera, Xw):
    """World planes -> (u, v, z) planes in the camera."""
    Xc = _world_to_cam(cam, Xw)
    p = mat3_apply(cam.K, Xc)
    z = p[2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    return p[0] * inv_z, p[1] * inv_z, z


@partial(jax.jit, static_argnames=("cfg",))
def cross_view_filter(depths: jax.Array, normals: jax.Array,
                      confs: jax.Array, cams: Camera, nbr_idx: jax.Array,
                      nbr_valid: jax.Array, cfg: DenseConfig
                      ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Consistency filter + fused depth across views.

    Args: depths (N, H, W); normals (N, 3, H, W); confs (N, H, W); cams
    batched Camera (N); nbr_idx/nbr_valid (N, V).

    Returns (filtered_depth, fused_depth, support): depths with
    insufficient cross-view support zeroed; the support-weighted average
    depth (the analog of depthMap_fuse); and the supporting-view count.
    """
    n, h, w = depths.shape
    rays = jax.vmap(lambda c: pixel_rays(c.K_inv, h, w))(cams)

    def per_view(i):
        cam_i = jax.tree.map(lambda x: x[i], cams)
        depth_i = depths[i]
        r = rays[i]
        X_w = _cam_to_world(cam_i, (r[0] * depth_i, r[1] * depth_i,
                                    r[2] * depth_i))
        w0 = conf_to_weight(confs[i], depth_i)
        acc_d = depth_i * w0
        acc_w = w0
        support = jnp.zeros((h, w), jnp.int32)

        def body(k, carry):
            acc_d, acc_w, support = carry
            j = nbr_idx[i, k]
            cam_j = jax.tree.map(lambda x: x[j], cams)
            u_j, v_j, z_j = _project(cam_j, X_w)
            d_j, ok = bilinear_sample_xy(depths[j], u_j, v_j)
            c_j, _ = bilinear_sample_xy(confs[j], u_j, v_j)
            agree = (ok & (d_j > 0) & (z_j > 0)
                     & (jnp.abs(z_j - d_j)
                        < cfg.depth_diff_threshold * cfg.depth_weight * d_j))
            agree = agree & nbr_valid[i, k]
            # neighbor's own depth re-expressed in view i (for the fused map)
            scale = d_j / jnp.where(z_j <= 0, 1e9, z_j)
            w_j = conf_to_weight(c_j, d_j) * agree
            return (acc_d + depth_i * scale * w_j, acc_w + w_j,
                    support + agree.astype(jnp.int32))

        acc_d, acc_w, support = jax.lax.fori_loop(
            0, nbr_idx.shape[1], body, (acc_d, acc_w, support))
        fused = jnp.where(depth_i > 0, acc_d / jnp.maximum(acc_w, 1e-12), 0.)
        keep = (support + 1 >= cfg.min_views_filter) & (depth_i > 0)
        return jnp.where(keep, depth_i, 0.0), fused, support

    idx = jnp.arange(n)
    filt, fused, support = jax.lax.map(per_view, idx)
    return filt, fused, support


def _gap_fill_1d(depth_row: jax.Array, conf_row: jax.Array, gap: int,
                 thr: float) -> Tuple[jax.Array, jax.Array]:
    """Fill invalid runs up to ``gap`` pixels between similar valid depths
    by linear interpolation (one row; vmapped over rows/columns)."""
    w = depth_row.shape[0]
    idx = jnp.arange(w, dtype=jnp.float32)
    valid = depth_row > 0

    def scan_dir(xs, reverse):
        def step(carry, x):
            last_i, last_d, last_c = carry
            i, d, c, v = x
            new = (jnp.where(v, i, last_i), jnp.where(v, d, last_d),
                   jnp.where(v, c, last_c))
            return new, new
        init = (jnp.float32(-1e9) if not reverse else jnp.float32(1e9),
                jnp.float32(0.0), jnp.float32(0.0))
        _, out = jax.lax.scan(step, init, xs, reverse=reverse)
        return out

    xs = (idx, depth_row, conf_row, valid)
    li, ld, lc = scan_dir(xs, False)     # nearest valid on the left (incl self)
    ri, rd, rc = scan_dir(xs, True)      # nearest valid on the right
    span = ri - li
    similar = jnp.abs(ld - rd) < thr * jnp.maximum(ld, rd)
    fill = (~valid) & (span <= gap + 1) & (ld > 0) & (rd > 0) & similar
    t = (idx - li) / jnp.where(span == 0, 1.0, span)
    d_interp = ld * (1 - t) + rd * t
    c_interp = jnp.minimum(lc, rc)
    return (jnp.where(fill, d_interp, depth_row),
            jnp.where(fill, c_interp, conf_row))


@partial(jax.jit, static_argnames=("cfg",))
def gap_interpolate(depth: jax.Array, conf: jax.Array,
                    cfg: DenseConfig) -> Tuple[jax.Array, jax.Array]:
    """Row then column gap interpolation on one (H, W) depth map
    (ref: GapInterpolation SceneDensify.cpp:2295-2785; the
    gradient-guided re-propagation phase is handled by re-running
    PatchMatch sweeps on the filled maps)."""
    gap = cfg.ipol_gap_size
    thr = cfg.depth_diff_threshold * 2.0
    d, c = jax.vmap(_gap_fill_1d, in_axes=(0, 0, None, None))(
        depth, conf, gap, thr)
    d, c = jax.vmap(_gap_fill_1d, in_axes=(1, 1, None, None),
                    out_axes=1)(d, c, gap, thr)
    return d, c


@partial(jax.jit, static_argnames=("cfg", "with_colors"))
def fuse_point_cloud(depths: jax.Array, normals: jax.Array,
                     confs: jax.Array, cams: Camera, nbr_idx: jax.Array,
                     nbr_valid: jax.Array, priority: jax.Array,
                     cfg: DenseConfig,
                     colors: Optional[jax.Array] = None,
                     with_colors: bool = False):
    """Fuse per-view depth maps into a world point cloud.

    Args:
      depths (N, H, W); normals (N, 3, H, W) camera-space; confs
        (N, H, W); colors (N, H, W, 3) optional.
      priority: (N,) smaller = higher priority (the reference processes
        best-connected images first; SceneDensify.cpp:3290-3302).

    Returns dict of per-pixel arrays + ``keep`` mask; compact with
    ``compact_point_cloud`` on host.  Points are (N, 3, H, W) planes.
    """
    n, h, w = depths.shape
    nrm_err = float(np.cos(np.radians(cfg.normal_diff_threshold
                                      * cfg.normal_weight)))

    rays = jax.vmap(lambda c: pixel_rays(c.K_inv, h, w))(cams)

    def per_view(i):
        cam_i = jax.tree.map(lambda x: x[i], cams)
        depth_i = depths[i]
        valid = depth_i > 0
        r = rays[i]
        X_w = _cam_to_world(cam_i, (r[0] * depth_i, r[1] * depth_i,
                                    r[2] * depth_i))
        n_i = normals[i]
        n_w = mat3_apply_t(cam_i.R, (n_i[0], n_i[1], n_i[2]))
        w_i = conf_to_weight(confs[i], depth_i)
        accX = tuple(X_w[c] * w_i for c in range(3))
        accN = tuple(n_w[c] * w_i for c in range(3))
        accC = (tuple(colors[i][..., c] * w_i for c in range(3))
                if with_colors else
                (jnp.zeros((h, w)),) * 3)
        accW = w_i
        count = jnp.ones((h, w), jnp.int32)
        owned = jnp.zeros((h, w), bool)

        def body(k, carry):
            accX, accN, accC, accW, count, owned = carry
            j = nbr_idx[i, k]
            cam_j = jax.tree.map(lambda x: x[j], cams)
            u_j, v_j, z_j = _project(cam_j, X_w)
            d_j, ok = bilinear_sample_xy(depths[j],
                                         jnp.round(u_j), jnp.round(v_j))
            c_j, _ = bilinear_sample_xy(confs[j], jnp.round(u_j),
                                        jnp.round(v_j))
            n_j = tuple(bilinear_sample_xy(normals[j][c], jnp.round(u_j),
                                           jnp.round(v_j))[0]
                        for c in range(3))
            n_jw = mat3_apply_t(cam_j.R, n_j)
            agree = (ok & (d_j > 0) & (z_j > 0) & nbr_valid[i, k]
                     & (jnp.abs(z_j - d_j)
                        < cfg.depth_diff_threshold * cfg.depth_weight * d_j)
                     & (dot3(n_w, n_jw) > nrm_err))
            ray_j = mat3_apply(cam_j.K_inv, (u_j, v_j, jnp.ones_like(u_j)))
            X_j = _cam_to_world(cam_j, (ray_j[0] * d_j, ray_j[1] * d_j,
                                        ray_j[2] * d_j))
            w_j = conf_to_weight(c_j, d_j) * agree
            accX = tuple(accX[c] + X_j[c] * w_j for c in range(3))
            accN = tuple(accN[c] + n_jw[c] * w_j for c in range(3))
            if with_colors:
                col_j = tuple(bilinear_sample_xy(colors[j][..., c],
                                                 jnp.round(u_j),
                                                 jnp.round(v_j))[0]
                              for c in range(3))
                accC = tuple(accC[c] + col_j[c] * w_j for c in range(3))
            accW = accW + w_j
            count = count + agree.astype(jnp.int32)
            owned = owned | (agree & (priority[j] < priority[i]))
            return accX, accN, accC, accW, count, owned

        accX, accN, accC, accW, count, owned = jax.lax.fori_loop(
            0, nbr_idx.shape[1], body,
            (accX, accN, accC, accW, count, owned))
        keep = valid & (~owned) & (count >= cfg.min_views_fuse)
        inv_w = 1.0 / jnp.maximum(accW, 1e-12)
        pts = jnp.stack([accX[c] * inv_w for c in range(3)])
        nrm = jnp.stack(normalize3(tuple(accN[c] * inv_w for c in range(3))))
        col = jnp.stack([accC[c] * inv_w for c in range(3)])
        return pts, nrm, col, accW, count, keep

    pts, nrm, col, wts, count, keep = jax.lax.map(per_view, jnp.arange(n))
    return {"points": pts, "normals": nrm, "colors": col, "weights": wts,
            "support": count, "keep": keep}


def compact_point_cloud(fused: dict) -> dict:
    """Host-side compaction of the fused per-pixel arrays into (M, ...)."""
    keep = np.asarray(fused["keep"]).reshape(-1)
    out = {}
    for name in ("points", "normals", "colors"):
        arr = np.asarray(fused[name])            # (N, 3, H, W)
        arr = np.moveaxis(arr, 1, -1).reshape(-1, 3)
        out[name] = arr[keep]
    for name in ("weights", "support"):
        out[name] = np.asarray(fused[name]).reshape(-1)[keep]
    return out


def estimate_point_labels(points: np.ndarray, owner_view: np.ndarray,
                          semantic: np.ndarray, cams: "Camera"
                          ) -> np.ndarray:
    """Per-point semantic labels by projecting each fused point into its
    owner view's mask (ref: EstimatePointLabels,
    frame_main/libs/MVS/DepthMap.cpp:2165).  Host-side: runs once per
    scene on the compacted cloud.

    Args:
      points: (P, 3) world points.
      owner_view: (P,) view index that fused each point.
      semantic: (N, H, W) integer label maps.
      cams: batched Camera.
    Returns (P,) int32 labels (-1 where the projection misses).
    """
    import numpy as _np
    Ks = _np.asarray(cams.K)
    Rs = _np.asarray(cams.R)
    Cs = _np.asarray(cams.C)
    n, h, w = semantic.shape
    labels = _np.full(len(points), -1, _np.int32)
    for v in range(n):
        sel = owner_view == v
        if not sel.any():
            continue
        Xc = (points[sel] - Cs[v]) @ Rs[v].T
        z = Xc[:, 2]
        uv = Xc @ Ks[v].T
        with _np.errstate(divide="ignore", invalid="ignore"):
            x = _np.round(uv[:, 0] / uv[:, 2]).astype(int)
            y = _np.round(uv[:, 1] / uv[:, 2]).astype(int)
        ok = (z > 0) & (x >= 0) & (x < w) & (y >= 0) & (y < h)
        lab = _np.full(sel.sum(), -1, _np.int32)
        lab[ok] = semantic[v, y[ok], x[ok]]
        labels[sel] = lab
    return labels
