"""Variational mesh refinement: photometric vertex optimization.

TPU-native analog of the reference's RefineMesh
(ref: frame_main/libs/MVS/SceneRefine.cpp:79-192 MeshRefine / :1300
Scene::RefineMesh and the CUDA twin SceneRefineCUDA.cpp:62-1944, whose
PTX kernel list — image warps, windowed ZNCC stats, photometric vertex
gradients, smoothness gradients, gradient combine — maps onto the jitted
stages here):

- Each vertex is scored by the ZNCC between small patches sampled around
  its projections into view pairs (the warp + windowed-stat kernels).
- The photometric gradient is taken along the vertex normal by finite
  differences (the reference accumulates per-pixel gradients onto
  vertices through the rasterization; the along-normal line search is the
  rasterization-free equivalent for vertex-resolution refinement).
- Occlusion handling: per scale, each view's z-buffered mesh depth
  (mesh_ops.rasterize_depth — the TRasterMesh analog) masks vertices whose
  projected depth disagrees with the rasterization, so back-side and
  occluded vertices stop receiving photometric gradients.
- A uniform-Laplacian regularizer stands in for the rigidity/elasticity
  term (ref: RefineMesh.cpp --regularity-weight), and the gradient steps
  run at multiple displacement scales (ref: --scales/--scale-step).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hcmvs_tpu.ops.sampling import bilinear_sample_xy


def _project(K, R, C, X):
    """(V, 3) world -> (u, v, z) arrays."""
    Xc = (X - C) @ R.T
    z = Xc[:, 2]
    u = (K[0, 0] * Xc[:, 0] + K[0, 2] * Xc[:, 2]) / jnp.where(
        jnp.abs(z) < 1e-9, 1e-9, z)
    v = (K[1, 1] * Xc[:, 1] + K[1, 2] * Xc[:, 2]) / jnp.where(
        jnp.abs(z) < 1e-9, 1e-9, z)
    return u, v, z


_PATCH = np.array([(dy, dx) for dy in (-2, -1, 0, 1, 2)
                   for dx in (-2, -1, 0, 1, 2)], np.float32)


def _vertex_zncc(img_a, img_b, ua, va, ub, vb):
    """ZNCC between 5x5 patches at (ua, va) in img_a and (ub, vb) in
    img_b, per vertex."""
    n = _PATCH.shape[0]
    sa = jnp.zeros_like(ua)
    sb = jnp.zeros_like(ua)
    saa = jnp.zeros_like(ua)
    sbb = jnp.zeros_like(ua)
    sab = jnp.zeros_like(ua)
    ok_all = jnp.ones_like(ua, bool)
    for dy, dx in _PATCH:
        a, ok1 = bilinear_sample_xy(img_a, ua + dx, va + dy)
        b, ok2 = bilinear_sample_xy(img_b, ub + dx, vb + dy)
        sa += a
        sb += b
        saa += a * a
        sbb += b * b
        sab += a * b
        ok_all &= ok1 & ok2
    ma = sa / n
    mb = sb / n
    cov = sab / n - ma * mb
    var_a = jnp.maximum(saa / n - ma * ma, 1e-10)
    var_b = jnp.maximum(sbb / n - mb * mb, 1e-10)
    z = cov / jnp.sqrt(var_a * var_b)
    return jnp.where(ok_all, jnp.clip(z, -1, 1), 0.0)


@partial(jax.jit, static_argnames=("n_iters",))
def refine_step(vertices: jax.Array, normals: jax.Array, edges: jax.Array,
                images: jax.Array, Ks: jax.Array, Rs: jax.Array,
                Cs: jax.Array, pair_a: jax.Array, pair_b: jax.Array,
                step: jax.Array, reg_weight: float = 0.2,
                n_iters: int = 5,
                raster_depth: "jax.Array | None" = None,
                occl_tol: float = 0.01) -> jax.Array:
    """``n_iters`` along-normal gradient steps at one displacement scale.

    pair_a/pair_b: (P,) view indices of the photometric pairs to score
    (the reference scores all overlapping image pairs; pass the best-k).
    raster_depth: optional (N_views, H, W) z-buffered mesh depths — a
    vertex only collects gradient from views where its projected depth
    matches the rasterization within ``occl_tol`` (relative).
    """
    from hcmvs_tpu.ops.sampling import nearest_sample_xy

    def visible(iv, u, v, z):
        ok = z > 0
        if raster_depth is not None:
            zr, okr = nearest_sample_xy(raster_depth[iv], jnp.round(u),
                                        jnp.round(v))
            # tolerance covers the finite-difference probe displacement
            # (the raster is of the unperturbed mesh) plus a relative band
            tol = 2.0 * step + occl_tol * jnp.maximum(z, 1e-9)
            ok = ok & okr & (zr > 0) & (jnp.abs(zr - z) < tol)
        return ok

    def photo_score(V):
        total = jnp.zeros(V.shape[0])
        cnt = jnp.zeros(V.shape[0])
        for p in range(pair_a.shape[0]):
            ia, ib = pair_a[p], pair_b[p]
            ua, va, za = _project(Ks[ia], Rs[ia], Cs[ia], V)
            ub, vb, zb = _project(Ks[ib], Rs[ib], Cs[ib], V)
            z = _vertex_zncc(images[ia], images[ib], ua, va, ub, vb)
            vis = visible(ia, ua, va, za) & visible(ib, ub, vb, zb)
            total += jnp.where(vis, z, 0.0)
            cnt += vis
        return total / jnp.maximum(cnt, 1.0)

    def body(_, V):
        # finite-difference photometric gradient along the normal
        s0 = photo_score(V)
        sp = photo_score(V + normals * step)
        sm = photo_score(V - normals * step)
        g = (sp - sm) / 2.0                    # d zncc / d (normal offset)
        move = jnp.clip(g, -1.0, 1.0) * step
        V = V + normals * move[:, None]
        # Laplacian regularization (rigidity/elasticity analog)
        acc = jnp.zeros_like(V)
        cnt = jnp.zeros(V.shape[0])
        acc = acc.at[edges[:, 0]].add(V[edges[:, 1]])
        acc = acc.at[edges[:, 1]].add(V[edges[:, 0]])
        cnt = cnt.at[edges[:, 0]].add(1.0)
        cnt = cnt.at[edges[:, 1]].add(1.0)
        lap = acc / jnp.maximum(cnt, 1.0)[:, None] - V
        return V + reg_weight * lap

    return jax.lax.fori_loop(0, n_iters, body, vertices)


def _box_sum(a: jax.Array, r: int = 2) -> jax.Array:
    """(H, W) separable (2r+1)^2 box sum via shifted adds."""
    out = a
    for axis in (0, 1):
        acc = out
        for d in range(1, r + 1):
            acc = acc + jnp.roll(out, d, axis) + jnp.roll(out, -d, axis)
        out = acc
    return out


@partial(jax.jit, static_argnames=("n_pairs",))
def raster_refine_grad(V: jax.Array, faces: jax.Array,
                       face_ids: jax.Array, barys: jax.Array,
                       raster_depth: jax.Array, images: jax.Array,
                       gx_all: jax.Array, gy_all: jax.Array,
                       Ks: jax.Array, Rs: jax.Array, Cs: jax.Array,
                       pair_a: jax.Array, pair_b: jax.Array,
                       n_pairs: int, occl_tol: float = 0.01
                       ) -> Tuple[jax.Array, jax.Array]:
    """Per-pixel rasterized photometric ZNCC gradient, scattered onto
    vertices via barycentrics (ref: the SceneRefineCUDA.cpp:62-1944
    kernel list — image warp, windowed mean/var/cov/ZNCC, ZNCC gradient,
    photometric vertex gradient scatter).

    For each pair (A, B): every A-pixel covered by a face carries the
    point X(p) = sum_k bary_k V[face_k]; warping B onto A through X gives
    W; the per-pixel d(ZNCC)/d(along-normal displacement) follows the
    chain through B's image gradient and projection Jacobian, and is
    scatter-added to the face's vertices with barycentric weights.
    Returns (grad (Nv,), weight (Nv,)) — positive gradient = move along
    +normal improves photo-consistency.
    """
    n_views, h, w = images.shape
    nv = V.shape[0]
    nf = faces.shape[0]
    npx = 25.0

    # Index-count restructure (round 4; TPU gathers cost per-INDEX, not
    # per-element — ops/sampling.py): the per-pixel traffic drops from
    # ~14 indices (fid->tri + 3x V rows + 4 bilinear samples + 6
    # scatter-adds) to 3 — one face-table gather, one 16-channel packed
    # B-tap gather, one face-packed scatter.  Measured on v5e at 640x480
    # x 8 views / 14 pairs: 0.387 -> 0.117 s/grad-iteration (3.3x; see
    # eval/refine_bench.py + BASELINE.md round 4).

    # per-face packed table (12, F): 3 vertices + unit normal — also
    # moves the cross/normalize off the per-pixel path
    Vf = V[faces]                                        # (F, 3, 3)
    nrm_f = jnp.cross(Vf[:, 1] - Vf[:, 0], Vf[:, 2] - Vf[:, 0])
    nrm_f = nrm_f / jnp.maximum(
        jnp.linalg.norm(nrm_f, axis=-1, keepdims=True), 1e-12)
    Pf = jnp.concatenate([Vf.reshape(nf, 9), nrm_f], axis=1).T  # (12, F)

    # per-view 2x2-tap-packed channels (n_views, 16, H*W): one gather
    # fetches the bilinear taps of image/raster-depth/gx/gy together
    def pack4(a):
        r = jnp.pad(a, ((0, 1), (0, 1)), mode="edge")
        return jnp.stack([r[:-1, :-1], r[:-1, 1:],
                          r[1:, :-1], r[1:, 1:]]).reshape(4, -1)

    packedB = jnp.concatenate(
        [jax.vmap(pack4)(images), jax.vmap(pack4)(raster_depth),
         jax.vmap(pack4)(gx_all), jax.vmap(pack4)(gy_all)],
        axis=1)                                          # (V, 16, H*W)

    grad = jnp.zeros((nv,))
    wsum = jnp.zeros((nv,))
    for p in range(n_pairs):
        ia, ib = pair_a[p], pair_b[p]
        fid = face_ids[ia]                               # (H, W)
        covered = fid >= 0
        fid0 = jnp.maximum(fid, 0)
        slab = jnp.take(Pf, fid0.reshape(-1), axis=1)    # (12, H*W)
        s = [slab[k].reshape(h, w) for k in range(12)]
        b0 = barys[ia][..., 0]
        b1 = barys[ia][..., 1]
        b2 = barys[ia][..., 2]
        # current-surface point per pixel (tracks V as it moves) —
        # scalar-expanded 3-vector math (planes-first LAYOUT RULE)
        Xp0 = b0 * s[0] + b1 * s[3] + b2 * s[6]
        Xp1 = b0 * s[1] + b1 * s[4] + b2 * s[7]
        Xp2 = b0 * s[2] + b1 * s[5] + b2 * s[8]
        n0, n1, n2 = s[9], s[10], s[11]
        # project into B
        K, R, C = Ks[ib], Rs[ib], Cs[ib]
        d0 = Xp0 - C[0]
        d1 = Xp1 - C[1]
        d2 = Xp2 - C[2]
        Xc0 = R[0, 0] * d0 + R[0, 1] * d1 + R[0, 2] * d2
        Xc1 = R[1, 0] * d0 + R[1, 1] * d1 + R[1, 2] * d2
        zb = R[2, 0] * d0 + R[2, 1] * d1 + R[2, 2] * d2
        inv_zb = 1.0 / jnp.where(jnp.abs(zb) < 1e-9, 1e-9, zb)
        ub = (K[0, 0] * Xc0 + K[0, 2] * zb) * inv_zb
        vb = (K[1, 1] * Xc1 + K[1, 2] * zb) * inv_zb

        # ONE gather for all four B channels' bilinear taps
        okb = (ub >= 0) & (vb >= 0) & (ub <= w - 1) & (vb <= h - 1)
        x0c = jnp.clip(jnp.floor(ub).astype(jnp.int32), 0, w - 2)
        y0c = jnp.clip(jnp.floor(vb).astype(jnp.int32), 0, h - 2)
        # fractions from the CLIPPED corner: a pixel landing exactly on
        # the last column/row (ub == w-1, admitted by okb) clips its
        # corner to w-2 and must lerp with fx=1, not the unclipped 0
        fx = ub - x0c
        fy = vb - y0c
        taps = jnp.take(packedB[ib], (y0c * w + x0c).reshape(-1),
                        axis=1).reshape(16, h, w)

        def lerp(t4):
            top = t4[0] * (1 - fx) + t4[1] * fx
            bot = t4[2] * (1 - fx) + t4[3] * fx
            return top * (1 - fy) + bot * fy

        Wimg = lerp(taps[0:4])
        zraster = lerp(taps[4:8])
        gxb = lerp(taps[8:12])
        gyb = lerp(taps[12:16])
        # occlusion in B: point must win B's z-buffer
        vis = (covered & okb & (zb > 0)
               & (jnp.abs(zraster - zb) < occl_tol * zb + 1e-6))
        visf = vis.astype(jnp.float32)

        # windowed ZNCC between A's image and the warp (5x5 box)
        Ia = images[ia]
        sA = _box_sum(Ia * visf) / jnp.maximum(_box_sum(visf), 1.0)
        sW = _box_sum(Wimg * visf) / jnp.maximum(_box_sum(visf), 1.0)
        Ac = (Ia - sA) * visf
        Wc = (Wimg - sW) * visf
        var_a = _box_sum(Ac * Ac) / npx
        var_w = _box_sum(Wc * Wc) / npx
        sig_a = jnp.sqrt(jnp.maximum(var_a, 1e-8))
        sig_w = jnp.sqrt(jnp.maximum(var_w, 1e-8))
        # normalized-residual gradient: minimizing the windowed NSSD
        # |Ac/sig_a - Wc/sig_w|^2 is ZNCC maximization (NSSD = 2 - 2 ZNCC)
        # and its descent direction r * dW/ddelta is far better
        # conditioned near the optimum than the analytic dZNCC/dW, whose
        # leading terms cancel as ZNCC -> 1 (the reference's CUDA kernel
        # accumulates the same residual-times-image-gradient form)
        dz_dw = (Ac / sig_a - Wc / sig_w) / (npx * sig_w)
        # d W / d delta: B-image gradient dotted with the projection
        # Jacobian applied to the surface normal
        dn0 = R[0, 0] * n0 + R[0, 1] * n1 + R[0, 2] * n2
        dn1 = R[1, 0] * n0 + R[1, 1] * n1 + R[1, 2] * n2
        dn2 = R[2, 0] * n0 + R[2, 1] * n1 + R[2, 2] * n2
        du = (K[0, 0] * dn0 - (ub - K[0, 2]) * dn2) * inv_zb
        dv = (K[1, 1] * dn1 - (vb - K[1, 2]) * dn2) * inv_zb
        g_pix = dz_dw * (gxb * du + gyb * dv) * visf

        # ONE face-packed scatter per pair (6-wide rows), unpacked to
        # vertices with an F-sized scatter afterwards
        vals = jnp.stack([g_pix * b0, g_pix * b1, g_pix * b2,
                          visf * b0, visf * b1, visf * b2],
                         axis=-1).reshape(-1, 6)         # (H*W, 6)
        facc = jnp.zeros((nf, 6)).at[fid0.reshape(-1)].add(vals)
        for k in range(3):
            grad = grad.at[faces[:, k]].add(facc[:, k])
            wsum = wsum.at[faces[:, k]].add(facc[:, 3 + k])
    return grad, wsum


def refine_mesh(vertices: np.ndarray, faces: np.ndarray,
                images: np.ndarray, Ks: np.ndarray, Rs: np.ndarray,
                Cs: np.ndarray, pairs: np.ndarray,
                scales: int = 3, scale_step: float = 0.5,
                base_step: float = None, reg_weight: float = 0.2,
                iters_per_scale: int = 10,
                occlusion: bool = True,
                gradient_mode: str = "raster") -> np.ndarray:
    """Multi-scale driver (ref: RefineMesh.cpp --scales 3 --scale-step
    0.5): displacement scale shrinks by ``scale_step`` per level.

    ``gradient_mode``:
      "raster" (default) — per-pixel rasterized ZNCC gradients scattered
        onto vertices via barycentrics (the reference's CUDA kernel
        pipeline; sub-vertex-resolution photometric evidence).
      "fd" — per-vertex finite-difference along-normal line search (the
        round-1 coarser fallback).
    With ``occlusion`` the mesh is z-buffer-rasterized into every view
    once per scale to mask occluded samples.
    """
    from hcmvs_tpu.mesh.mesh_ops import (compute_vertex_normals,
                                         rasterize_attributes,
                                         rasterize_depth)
    if base_step is None:
        # ~half the median edge length
        e = vertices[faces[:, 0]] - vertices[faces[:, 1]]
        base_step = 0.5 * float(np.median(np.linalg.norm(e, axis=1)))
    edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]],
                            faces[:, [2, 0]]]).astype(np.int32)
    V = jnp.asarray(vertices, jnp.float32)
    h, w = images[0].shape[:2]
    imgs = jnp.asarray(images)
    Ksj = jnp.asarray(Ks, jnp.float32)
    Rsj = jnp.asarray(Rs, jnp.float32)
    Csj = jnp.asarray(Cs, jnp.float32)
    if gradient_mode == "raster":
        # central-difference image gradients, once
        gx = jnp.stack([(jnp.roll(im, -1, 1) - jnp.roll(im, 1, 1)) * 0.5
                        for im in imgs])
        gy = jnp.stack([(jnp.roll(im, -1, 0) - jnp.roll(im, 1, 0)) * 0.5
                        for im in imgs])
    step = base_step
    faces_j = jnp.asarray(faces.astype(np.int32))
    edges_j = jnp.asarray(edges)
    for s in range(scales):
        V_np = np.asarray(V)
        normals = jnp.asarray(compute_vertex_normals(V_np, faces))
        if gradient_mode == "raster":
            rasters, fids, bars = [], [], []
            for i in range(len(images)):
                d, fi, ba = rasterize_attributes(
                    V_np.astype(np.float64), faces, Ks[i], Rs[i], Cs[i],
                    h, w)
                rasters.append(d)
                fids.append(fi)
                bars.append(ba)
            raster = jnp.asarray(np.stack(rasters))
            fid = jnp.asarray(np.stack(fids))
            bar = jnp.asarray(np.stack(bars))
            for it in range(iters_per_scale):
                g, wsum = raster_refine_grad(
                    V, faces_j, fid, bar, raster, imgs,
                    gx, gy, Ksj, Rsj, Csj,
                    jnp.asarray(pairs[:, 0]), jnp.asarray(pairs[:, 1]),
                    int(len(pairs)))
                gn = g / jnp.maximum(wsum, 1e-6)
                # annealed trust-region step: the raw ZNCC gradient has
                # image-dependent magnitude, so normalize by a robust
                # quantile (linear in gn below the cap — saturating
                # squashers turn small noisy gradients into full-size
                # random steps) and shrink the cap within the scale
                q = jnp.percentile(jnp.abs(gn[wsum > 1.0]), 90) + 1e-12
                cap = step * (0.8 ** it)
                move = jnp.clip(gn / q * cap, -cap, cap)
                V = V + normals * move[:, None]
                # Laplacian regularization (rigidity/elasticity analog)
                acc = jnp.zeros_like(V)
                cnt = jnp.zeros(V.shape[0])
                acc = acc.at[edges_j[:, 0]].add(V[edges_j[:, 1]])
                acc = acc.at[edges_j[:, 1]].add(V[edges_j[:, 0]])
                cnt = cnt.at[edges_j[:, 0]].add(1.0)
                cnt = cnt.at[edges_j[:, 1]].add(1.0)
                lap = acc / jnp.maximum(cnt, 1.0)[:, None] - V
                V = V + reg_weight * lap
        else:
            raster = None
            if occlusion:
                raster = jnp.asarray(np.stack([
                    rasterize_depth(V_np.astype(np.float64), faces,
                                    Ks[i], Rs[i], Cs[i], h, w)
                    for i in range(len(images))]))
            V = refine_step(V, normals, edges_j,
                            imgs, Ksj, Rsj, Csj,
                            jnp.asarray(pairs[:, 0]),
                            jnp.asarray(pairs[:, 1]),
                            jnp.asarray(step, jnp.float32), reg_weight,
                            iters_per_scale, raster_depth=raster)
        step *= scale_step
    return np.asarray(V)
