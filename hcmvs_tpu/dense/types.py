"""Pytree state and precomputed geometry for the PatchMatch engine.

TPU-native replacements for the reference's per-image working set
(ref: frame_main/libs/MVS/DepthMap.h:214-348 ``DepthData`` and
:412-444 ``ViewData`` homography constants).  The reference precomputes
per-view homography factors Hl/Hm/Hr so each pixel's plane homography is a
rank-1 update; we keep the same factorization — ``H p = A p + wv * (n.ray(p)
/ d_plane)`` — so per-pixel, per-candidate warps cost a handful of FMAs and
never materialize 3x3 matrices per pixel.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from hcmvs_tpu.core.camera import Camera, jnp_einsum, relative_motion, skew


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ViewGeometry:
    """Constants for one reference view against V neighbor (source) views."""

    A: jax.Array          # (V, 3, 3)  K_s R_rel K_r^-1  (infinite-depth part)
    wv: jax.Array         # (V, 3)     K_s t_rel          (parallax part)
    R_rel: jax.Array      # (V, 3, 3)  ref-cam -> src-cam rotation
    t_rel: jax.Array      # (V, 3)
    K_src: jax.Array      # (V, 3, 3)
    K_inv_src: jax.Array  # (V, 3, 3)
    F: jax.Array          # (V, 3, 3)  maps ref pixel -> src epiline
    K_ref: jax.Array      # (3, 3)
    K_inv_ref: jax.Array  # (3, 3)


def make_view_geometry(ref_cam: Camera, src_cams: Camera) -> ViewGeometry:
    """Precompute per-src-view warp constants (ref: DepthMap.h:412-444)."""
    R_rel, t_rel = relative_motion(ref_cam, src_cams)
    K_inv_ref = ref_cam.K_inv
    K_src = src_cams.K
    K_inv_src = src_cams.K_inv
    A = jnp_einsum("vij,vjk,kl->vil", K_src, R_rel, K_inv_ref)
    wv = jnp_einsum("vij,vj->vi", K_src, t_rel)
    E = jnp_einsum("vij,vjk->vik", skew(t_rel), R_rel)
    F = jnp_einsum("vji,vjk,kl->vil", K_inv_src, E, K_inv_ref)
    return ViewGeometry(A=A, wv=wv, R_rel=R_rel, t_rel=t_rel, K_src=K_src,
                        K_inv_src=K_inv_src, F=F, K_ref=ref_cam.K,
                        K_inv_ref=K_inv_ref)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PatchMatchState:
    """Per-pixel hypothesis state (the functional analog of the mutable
    depthMap/normalMap/confMap trio in DepthData)."""

    depth: jax.Array   # (H, W) f32; 0 marks invalid
    normal: jax.Array  # (H, W, 3) f32 unit, camera space, n . ray < 0
    cost: jax.Array    # (H, W) f32 aggregated score (0 best, 2 worst)
    key: jax.Array     # PRNG key driving this map's random refinement


def pixel_rays(K_inv: jax.Array, h: int, w: int) -> jax.Array:
    """(H, W, 3) camera rays with z == 1 for every pixel center."""
    v, u = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                        jnp.arange(w, dtype=jnp.float32), indexing="ij")
    ones = jnp.ones_like(u)
    p = jnp.stack([u, v, ones], axis=-1)
    return jnp_einsum("ij,hwj->hwi", K_inv, p)


def random_normals(key: jax.Array, rays: jax.Array) -> jax.Array:
    """Random unit normals facing the camera (n . ray < 0).

    Mirrors the reference's random plane init which draws normals in a cone
    around the viewing ray (ref: DepthMap.cpp random assignment using
    fRandomAngle1/2Range).
    """
    h, w, _ = rays.shape
    k1, k2 = jax.random.split(key)
    # polar sample around -ray with max tilt ~60 deg
    cos_t = jax.random.uniform(k1, (h, w), minval=0.5, maxval=1.0)
    phi = jax.random.uniform(k2, (h, w), minval=0.0, maxval=2 * jnp.pi)
    sin_t = jnp.sqrt(1.0 - cos_t ** 2)
    # build tangent frame around d = -normalize(ray)
    d = -rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)
    up = jnp.where(jnp.abs(d[..., 2:3]) < 0.9,
                   jnp.broadcast_to(jnp.array([0., 0., 1.]), d.shape),
                   jnp.broadcast_to(jnp.array([1., 0., 0.]), d.shape))
    t1 = jnp.cross(up, d)
    t1 = t1 / jnp.linalg.norm(t1, axis=-1, keepdims=True)
    t2 = jnp.cross(d, t1)
    n = (d * cos_t[..., None]
         + t1 * (sin_t * jnp.cos(phi))[..., None]
         + t2 * (sin_t * jnp.sin(phi))[..., None])
    return face_camera(n, rays)


def face_camera(n: jax.Array, rays: jax.Array) -> jax.Array:
    """Flip normals so n . ray <= 0 (pointing toward the camera)."""
    d = jnp.sum(n * rays, axis=-1, keepdims=True)
    return jnp.where(d > 0, -n, n)


def init_state(key: jax.Array, rays: jax.Array, d_min: float,
               d_max: float) -> PatchMatchState:
    """Random-plane initialization (ref: InitDepthMap's random fallback)."""
    h, w, _ = rays.shape
    k_d, k_n, k_s = jax.random.split(key, 3)
    depth = jax.random.uniform(k_d, (h, w), minval=d_min, maxval=d_max)
    normal = random_normals(k_n, rays)
    cost = jnp.full((h, w), 2.0, jnp.float32)
    return PatchMatchState(depth=depth.astype(jnp.float32),
                           normal=normal.astype(jnp.float32),
                           cost=cost, key=k_s)
