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


@partial(jax.jit, static_argnames=("n_labels", "n_hyps", "radius"))
def ransac_segment_planes(key: jax.Array, labels: jax.Array,
                          depth: jax.Array, n_labels: int,
                          n_hyps: int = 64, radius: int = 12,
                          epsilon: float = 0.01
                          ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Static-shape RANSAC plane fit per segment (the vmapped replacement
    for the reference's CGAL Efficient_RANSAC in GenerateDepthPrior /
    GenerateSuperDepthPrior, SceneDensify.cpp:1171-1950; thresholds follow
    the fransacEpsilonMul family of flags).

    Sampling trick that keeps everything static-shape: each hypothesis
    draws one anchor pixel plus two pixels within ``radius`` of it — the
    triplet is valid iff all three share the anchor's segment and carry
    depth.  Each segment then keeps its best-scoring hypothesis (masked
    inlier counting + segment_max), so segments compete only over their
    own anchored hypotheses.

    Planes use the inverse-depth-affine parameterization of
    fit_segment_planes.  Returns (planes (L,3), inlier_frac (L,),
    count (L,)).
    """
    h, w = depth.shape
    flat_lbl = labels.reshape(-1)
    z_flat = 1.0 / jnp.maximum(depth.reshape(-1), 1e-9)
    valid_flat = depth.reshape(-1) > 0
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    u_flat = xx.reshape(-1)
    v_flat = yy.reshape(-1)

    k0, k1 = jax.random.split(key)
    anchor = jax.random.randint(k0, (n_hyps,), 0, h * w)
    offs = jax.random.randint(k1, (n_hyps, 2, 2), -radius, radius + 1)
    ay = anchor // w
    ax = anchor % w
    py = jnp.clip(ay[:, None] + offs[:, :, 0], 0, h - 1)
    px = jnp.clip(ax[:, None] + offs[:, :, 1], 0, w - 1)
    idx = jnp.concatenate([anchor[:, None], py * w + px], axis=1)  # (K,3)

    seg = flat_lbl[idx[:, 0]]
    same = ((flat_lbl[idx[:, 1]] == seg) & (flat_lbl[idx[:, 2]] == seg)
            & valid_flat[idx].all(axis=1))
    # plane through the 3 samples: [u v 1] p = 1/d
    A = jnp.stack([u_flat[idx], v_flat[idx],
                   jnp.ones_like(u_flat[idx])], axis=-1)       # (K, 3, 3)
    zz = z_flat[idx]                                            # (K, 3)
    det_ok = jnp.abs(jnp.linalg.det(A)) > 1e-6
    A_safe = jnp.where(det_ok[:, None, None], A, jnp.eye(3)[None])
    hyp_planes = jnp.linalg.solve(A_safe, zz[..., None])[..., 0]
    hyp_valid = same & det_ok

    # masked inlier counting: (K, P) residuals restricted to the segment
    pred = (hyp_planes[:, 0:1] * u_flat[None] + hyp_planes[:, 1:2]
            * v_flat[None] + hyp_planes[:, 2:3])                # (K, P)
    in_seg = (flat_lbl[None] == seg[:, None]) & valid_flat[None]
    inl = (jnp.abs(z_flat[None] - pred) < epsilon) & in_seg
    score = jnp.where(hyp_valid, inl.sum(axis=1), -1)           # (K,)

    # per-segment best hypothesis (segment_max + tie-break by match)
    best = jax.ops.segment_max(score, seg, n_labels)            # (L,)
    is_best = hyp_valid & (score == best[seg]) & (score > 0)
    # resolve ties: lowest hypothesis index wins
    hyp_ids = jnp.arange(n_hyps)
    win = jax.ops.segment_min(jnp.where(is_best, hyp_ids, n_hyps), seg,
                              n_labels)                         # (L,)
    has_plane = win < n_hyps
    planes = jnp.where(has_plane[:, None],
                       hyp_planes[jnp.minimum(win, n_hyps - 1)], 0.0)

    # stats of the winning plane over its segment
    pred_seg = (planes[flat_lbl, 0] * u_flat + planes[flat_lbl, 1] * v_flat
                + planes[flat_lbl, 2])
    inl_seg = (jnp.abs(z_flat - pred_seg) < epsilon) & valid_flat
    cnt = jax.ops.segment_sum(valid_flat.astype(jnp.float32), flat_lbl,
                              n_labels)
    icnt = jax.ops.segment_sum(inl_seg.astype(jnp.float32), flat_lbl,
                               n_labels)
    frac = jnp.where(has_plane, icnt / jnp.maximum(cnt, 1.0), 0.0)
    return planes, frac, cnt


def generate_priors(gray: jax.Array, depth: jax.Array, rays: jax.Array,
                    grid_step: int = 16,
                    semantic: "jax.Array | None" = None,
                    n_semantic_labels: int = 0,
                    key: "jax.Array | None" = None) -> jax.Array:
    """Full prior pass for one view (the GenerateSuperDepthPrior +
    GenerateDepthPrior + GenerateFinalPrior analog): superpixels on the
    image, robust planes on the current depth, prior depth where planes
    are trustworthy.  With a ``semantic`` label map (the reference's
    nUseSemantic mask path), RANSAC planes fit per semantic region are
    merged over the superpixel prior (semantic wins where valid — the
    GenerateFinalPrior merge, SceneDensify.cpp:1079-1161)."""
    h, w = gray.shape
    gh = max(h // grid_step, 1)
    gw = max(w // grid_step, 1)
    labels = slic_superpixels(gray, grid_step)
    planes, frac, cnt = fit_segment_planes(labels, depth, rays, gh * gw)
    prior = prior_depth_map(labels, planes, frac, cnt, gh * gw)
    if semantic is not None and n_semantic_labels > 0:
        if key is None:
            key = jax.random.PRNGKey(0)
        sp, sf, sc = ransac_segment_planes(key, semantic, depth,
                                           n_semantic_labels)
        sem_prior = prior_depth_map(semantic, sp, sf, sc,
                                    n_semantic_labels, min_support=100,
                                    min_inlier_frac=0.5)
        prior = jnp.where(sem_prior > 0, sem_prior, prior)
    return prior


def merge_final_prior(ext_prior: jax.Array,
                      super_prior: jax.Array) -> jax.Array:
    """GenerateFinalPrior merge of the externally-ingested (meanshift
    analog) prior channel with the superpixel/semantic prior channel
    (ref: SceneDensify.cpp:1129-1146): per pixel, both zero -> zero;
    external zero -> superpixel prior; external nonzero -> the external
    prior WINS (the reference's else-branch takes meanshiftpriors over
    superpriors whenever the meanshift value is nonzero)."""
    return jnp.where(ext_prior > 0, ext_prior,
                     jnp.where(super_prior > 0, super_prior, 0.0))
