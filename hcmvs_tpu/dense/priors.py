"""Planar priors: superpixel segmentation + robust per-segment plane fits.

TPU-first re-design of the reference's prior stack
(ref: frame_main/libs/MVS/SceneDensify.cpp:4010-4090 LSC_superpixel,
:1171-1545 GenerateSuperDepthPrior, :1550-1950 GenerateDepthPrior,
:1079-1161 GenerateFinalPrior):

- Superpixels: SLIC-style local k-means, fully jittable — centers live on
  a coarse grid and each pixel competes only among its 3x3 neighboring
  centers, which maps to static shifted-array comparisons (the LSC library
  the reference vendors is a sequential CPU loop).
- Plane fits: the reference runs CGAL Efficient_RANSAC per segment; here
  every segment is fit simultaneously with IRLS (iteratively reweighted
  least squares, Tukey weights) over segment-sum moment matrices — the
  vmapped, static-shape replacement for ragged per-segment RANSAC.
- The prior depth map evaluates each pixel's segment plane at the pixel
  ray, masked to segments with enough support and inlier ratio — the
  analog of depthMapPrior consumed by the score blend
  (ref: DepthMap.cpp:940-955, dense/score.py prior_blend).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class SuperpixelResult(NamedTuple):
    labels: jax.Array    # (H, W) int32 superpixel id
    n_labels: int        # static: grid_h * grid_w


@partial(jax.jit, static_argnames=("grid_step", "n_iters", "m"))
def slic_superpixels(gray: jax.Array, grid_step: int = 16,
                     n_iters: int = 5, m: float = 0.1) -> jax.Array:
    """(H, W) -> (H, W) int32 labels; ~one superpixel per grid cell.

    ``m`` balances color vs spatial distance (SLIC compactness).
    """
    h, w = gray.shape
    gh = max(h // grid_step, 1)
    gw = max(w // grid_step, 1)
    sy = h / gh
    sx = w / gw

    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    # init centers at grid cell centers
    cy = (jnp.arange(gh, dtype=jnp.float32) + 0.5) * sy
    cx = (jnp.arange(gw, dtype=jnp.float32) + 0.5) * sx
    cyy, cxx = jnp.meshgrid(cy, cx, indexing="ij")
    # center intensity: sample image at center
    ci = gray[jnp.clip(cyy.astype(jnp.int32), 0, h - 1),
              jnp.clip(cxx.astype(jnp.int32), 0, w - 1)]
    centers = jnp.stack([cyy, cxx, ci])                   # (3, gh, gw)

    # each pixel's home cell
    py = jnp.clip((yy / sy).astype(jnp.int32), 0, gh - 1)
    px = jnp.clip((xx / sx).astype(jnp.int32), 0, gw - 1)

    inv_s2 = 1.0 / (sy * sx)
    inv_m2 = 1.0 / (m * m)

    def step(centers, _):
        best_d = jnp.full((h, w), jnp.inf)
        best_l = jnp.zeros((h, w), jnp.int32)
        cpad = jnp.pad(centers, ((0, 0), (1, 1), (1, 1)), mode="edge")
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                gy = jnp.clip(py + dy, -1, gh)
                gx = jnp.clip(px + dx, -1, gw)
                c_y = cpad[0, gy + 1, gx + 1]
                c_x = cpad[1, gy + 1, gx + 1]
                c_i = cpad[2, gy + 1, gx + 1]
                d = (((yy - c_y) ** 2 + (xx - c_x) ** 2) * inv_s2
                     + (gray - c_i) ** 2 * inv_m2)
                lbl = (jnp.clip(gy, 0, gh - 1) * gw
                       + jnp.clip(gx, 0, gw - 1))
                better = d < best_d
                best_d = jnp.where(better, d, best_d)
                best_l = jnp.where(better, lbl, best_l)
        # update centers by segment means
        n_seg = gh * gw
        flat = best_l.reshape(-1)
        ones = jnp.ones_like(flat, jnp.float32)
        cnt = jax.ops.segment_sum(ones, flat, n_seg)
        s_y = jax.ops.segment_sum(yy.reshape(-1), flat, n_seg)
        s_x = jax.ops.segment_sum(xx.reshape(-1), flat, n_seg)
        s_i = jax.ops.segment_sum(gray.reshape(-1), flat, n_seg)
        denom = jnp.maximum(cnt, 1.0)
        new_centers = jnp.stack([
            (s_y / denom).reshape(gh, gw),
            (s_x / denom).reshape(gh, gw),
            (s_i / denom).reshape(gh, gw)])
        keep = (cnt > 0).reshape(gh, gw)
        new_centers = jnp.where(keep[None], new_centers, centers)
        return new_centers, best_l

    centers, labels = jax.lax.scan(step, centers, None, length=n_iters)
    return labels[-1]


@partial(jax.jit, static_argnames=("n_labels", "n_irls"))
def fit_segment_planes(labels: jax.Array, depth: jax.Array,
                       rays: jax.Array, n_labels: int,
                       n_irls: int = 3, tukey_c: float = 0.02
                       ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Robust plane fit per segment on the 3D points of valid depths.

    Planes are in the depth-parameterization the prior consumes: for pixel
    ray r and plane (a, b, c): 1/depth = a*u + b*v + c with (u, v) = pixel
    coords — the standard inverse-depth-affine model of a 3D plane under a
    pinhole camera, which keeps the fit linear.

    Returns (planes (L, 3), inlier_frac (L,), count (L,)).
    """
    h, w = depth.shape
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    valid = (depth > 0).reshape(-1)
    flat = labels.reshape(-1)
    u = xx.reshape(-1)
    v = yy.reshape(-1)
    z = 1.0 / jnp.maximum(depth.reshape(-1), 1e-9)      # inverse depth
    wgt = valid.astype(jnp.float32)

    def solve(wgt):
        # weighted LS of z ~ a u + b v + c per segment
        A = jnp.stack([u, v, jnp.ones_like(u)], axis=-1)     # (P, 3)
        AtA = jnp.einsum("pi,pj->pij", A, A) * wgt[:, None, None]
        Atz = A * (z * wgt)[:, None]
        M = jax.ops.segment_sum(AtA.reshape(-1, 9), flat, n_labels)
        b = jax.ops.segment_sum(Atz, flat, n_labels)
        M = M.reshape(n_labels, 3, 3) + 1e-8 * jnp.eye(3)[None]
        return jnp.linalg.solve(M, b[..., None])[..., 0]     # (L, 3)

    planes = solve(wgt)
    for _ in range(n_irls):
        pred = (planes[flat, 0] * u + planes[flat, 1] * v
                + planes[flat, 2])
        r = (z - pred) / tukey_c
        tw = jnp.where(jnp.abs(r) < 1.0, (1 - r ** 2) ** 2, 0.0)
        planes = solve(wgt * tw)

    # inlier stats on the final fit
    pred = planes[flat, 0] * u + planes[flat, 1] * v + planes[flat, 2]
    inl = (jnp.abs(z - pred) < tukey_c) & valid
    cnt = jax.ops.segment_sum(wgt, flat, n_labels)
    icnt = jax.ops.segment_sum(inl.astype(jnp.float32), flat, n_labels)
    frac = icnt / jnp.maximum(cnt, 1.0)
    return planes, frac, cnt


@partial(jax.jit, static_argnames=("n_labels", "min_support",
                                   "min_inlier_frac"))
def prior_depth_map(labels: jax.Array, planes: jax.Array,
                    inlier_frac: jax.Array, count: jax.Array,
                    n_labels: int, min_support: int = 30,
                    min_inlier_frac: float = 0.6) -> jax.Array:
    """Evaluate each pixel's segment plane -> (H, W) prior depth (0 where
    the segment has no trustworthy plane) — the depthMapPrior analog."""
    h, w = labels.shape
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    p = planes[labels]                                  # (H, W, 3) small L
    inv_z = p[..., 0] * xx + p[..., 1] * yy + p[..., 2]
    depth = 1.0 / jnp.maximum(inv_z, 1e-6)
    ok = ((inlier_frac[labels] >= min_inlier_frac)
          & (count[labels] >= min_support) & (inv_z > 1e-6))
    return jnp.where(ok, depth, 0.0)


def generate_priors(gray: jax.Array, depth: jax.Array, rays: jax.Array,
                    grid_step: int = 16) -> jax.Array:
    """Full prior pass for one view (the GenerateSuperDepthPrior +
    GenerateFinalPrior analog): superpixels on the image, robust planes on
    the current depth, prior depth where planes are trustworthy."""
    h, w = gray.shape
    gh = max(h // grid_step, 1)
    gw = max(w // grid_step, 1)
    labels = slic_superpixels(gray, grid_step)
    planes, frac, cnt = fit_segment_planes(labels, depth, rays, gh * gw)
    return prior_depth_map(labels, planes, frac, cnt, gh * gw)
