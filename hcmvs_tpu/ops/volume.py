"""Plane-sweep σ-volume tables: the exact-scoring gather engine.

The reference's hot op — per-pixel plane-homography patch warp + weighted
ZNCC (ref: frame_main/libs/MVS/DepthMap.cpp:522-595 ScorePixelImage) —
samples each source view at per-pixel, per-candidate, per-patch-offset
positions.  As XLA gathers those cost per-INDEX (~120M/s on the v5e
tunnel) and dominate the whole framework's runtime.

TPU-first redesign: every warp position lies on the pixel's epipolar
line, parameterized by the scalar

    s(p, delta) = (n . ray(p+delta)) / ((n . ray(p)) * depth(p))

in  warp(p, delta) = A.(p+delta) + wv * s  (the existing ViewGeometry
decomposition).  So per (ref, src) pair we resample the source ONCE along
every pixel's epipolar line at D uniform s-steps into a pixel-major table
``tab[q, j] = src(proj(A.q + wv * sigma_j))`` — and every exact score
sample becomes a 1-D lookup ``lerp(tab[p+delta], f(s))``.  The lookup
kernel maps onto Mosaic's lane-wise ``tpu.dynamic_gather`` (the only fast
gather on TPU: single-vreg, 128 lanes — hence D = 128), measured at
~45 G lookups/s vs ~120 M/s for XLA per-index gathers.

Semantics vs the reference: identical plane-homography geometry; the
source intensity is linearly interpolated between adjacent sigma planes
instead of bilinearly at the exact warp point.  With D chosen so adjacent
planes are ~1px apart along the epipolar segment the residual is below
image-noise level (validated by tests/test_volume.py parity + the ridge
golden gate).

In-image validity per sample is an *interval* in sigma (the epipolar ray
crosses each image border once), precomputed analytically per pixel —
the per-sample OOB test costs no gather.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas imported at module level for the kernels' program_id
    from jax.experimental import pallas as pl
except ImportError:  # pragma: no cover
    pl = None

from hcmvs_tpu.ops.sampling import bilinear_sample_xy

D_PLANES = 128          # sigma planes == gather lane count (vreg width)
TAB_DTYPE = jnp.uint16  # table storage encoding.  uint16 = fixed-point
                        # intensities (v * 65535): quantum 1.5e-5, far
                        # below image noise, at bf16's 2-byte footprint.
                        # bf16's ~2^-9 absolute quantum measurably
                        # blunted ZNCC discrimination at reference
                        # scale: 1280x960 fixed-FOV ridge scored 0.8521
                        # (bf16) vs 0.8968 (f32); u16 must match f32
                        # (quantum 30x finer than bf16) — measured
                        # number in BASELINE.md round 3.  jnp.float32 trades
                        # 2x table HBM for nothing over u16; Mosaic has
                        # no f16.
_CHUNK = 2048           # pixel rows per kernel block (measured sweet spot)


class VolumeTables(NamedTuple):
    """Per-(ref, src-view) sweep tables; leading dim V (then N at scene
    level via an outer vmap/stack)."""

    tab: jax.Array       # (V, P_pad, D) bf16 (intensities; the 2^-8
                         # relative rounding is below image noise and
                         # halves the dominant HBM tenant at scale —
                         # 1280x960 x 12 pairs: 7.5G f32 -> 3.75G).
                         # The kernel upcasts each VMEM tile to f32
                         # before the lane gather (Mosaic requires
                         # matching index/data bitwidths).
    sig0: jax.Array      # (V,) grid origin
    inv_dsig: jax.Array  # (V,) 1 / grid step
    sig_lo: jax.Array    # (V, H, W) valid-sigma interval (already shrunk
    sig_hi: jax.Array    # by one grid step for the lerp neighbor)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _encode_tab(x: jax.Array) -> jax.Array:
    """Encode intensities into the storage dtype (see TAB_DTYPE)."""
    if TAB_DTYPE == jnp.uint16:
        return jnp.round(jnp.clip(x, 0.0, 1.0) * 65535.0).astype(jnp.uint16)
    return x.astype(TAB_DTYPE)


def _decode_tab(x: jax.Array) -> jax.Array:
    """Upcast/decode a table tile to f32 (works inside Mosaic kernels:
    integer-to-float converts and multiplies are plain VPU ops)."""
    if x.dtype == jnp.uint16:
        # Mosaic has no direct u16->f32 cast; hop through int32
        return x.astype(jnp.int32).astype(jnp.float32) * (1.0 / 65535.0)
    return x.astype(jnp.float32)


def sigma_grid(d_min: jax.Array, d_max: jax.Array,
               margin: float = 1.35,
               n_planes: int = D_PLANES) -> Tuple[jax.Array, jax.Array]:
    """(sigma0, dsigma): uniform grid over the realizable s range.

    Hypotheses are clamped to [0.8*d_min, 1.2*d_max] by candidate
    validity; patch obliquity scales s by (n.ray(p+delta))/(n.ray(p)),
    bounded by ``margin`` for sane tilts.  Uniform s ~ uniform disparity
    along the epipolar line (exact for in-plane motion).

    ``n_planes``: total plane count (a multiple of the 128-lane chunk —
    at reference-class fixed-FOV resolutions the epipolar span exceeds
    128px, so 128 planes blur >1px between adjacent planes; see
    cfg.volume_planes).
    """
    s_min = 1.0 / (1.2 * margin * d_max)
    s_max = margin / (0.8 * d_min)
    dsig = (s_max - s_min) / (n_planes - 1)
    return s_min, dsig


def build_view_volume(A: jax.Array, wv: jax.Array, src_gray: jax.Array,
                      sig0: jax.Array, dsig: jax.Array, h: int, w: int,
                      build_step: int = 2, n_planes: int = D_PLANES
                      ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One (ref, src) pair's table: (P_pad, D) + the valid-sigma interval.

    The build is the one remaining per-index gather (bilinear warps per
    sigma plane) — amortized over every candidate x offset x sweep of the
    stage.  ``build_step``: sample every k-th sigma plane with gathers and
    reconstruct the skipped planes by Catmull-Rom interpolation ALONG THE
    LANE AXIS (pure elementwise — the epipolar intensity profile is
    smooth at <=1px/plane, so half-rate sampling + cubic reconstruction
    is visually lossless; measured equal golden accuracy, build cost /2).
    """
    v_, u_ = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    p0x = A[0, 0] * u_ + A[0, 1] * v_ + A[0, 2]
    p0y = A[1, 0] * u_ + A[1, 1] * v_ + A[1, 2]
    p0z = A[2, 0] * u_ + A[2, 1] * v_ + A[2, 2]
    hs, ws = src_gray.shape

    def plane(j):
        sig = sig0 + dsig * j
        phx = p0x + wv[0] * sig
        phy = p0y + wv[1] * sig
        phz = p0z + wv[2] * sig
        inv_z = 1.0 / jnp.where(jnp.abs(phz) < 1e-9, 1e-9, phz)
        val, _ = bilinear_sample_xy(src_gray, phx * inv_z, phy * inv_z)
        return val

    if build_step == 1:
        vol = jax.lax.map(plane, jnp.arange(n_planes, dtype=jnp.float32))
    else:
        # gather the coarse planes (include the last fine plane so the
        # grid endpoint is exact), then cubic-upsample along sigma
        n_coarse = (n_planes - 1) // build_step + 1
        coarse = jax.lax.map(
            plane, jnp.arange(n_coarse, dtype=jnp.float32) * build_step)
        cm1 = jnp.concatenate([coarse[:1], coarse[:-1]])
        cp1 = jnp.concatenate([coarse[1:], coarse[-1:]])
        cp2 = jnp.concatenate([coarse[2:], coarse[-1:], coarse[-1:]])
        planes = []
        for r in range(build_step):
            t = r / build_step
            if r == 0:
                planes.append(coarse)
                continue
            # Catmull-Rom weights at fraction t
            w0 = -0.5 * t + t * t - 0.5 * t ** 3
            w1 = 1.0 - 2.5 * t * t + 1.5 * t ** 3
            w2 = 0.5 * t + 2.0 * t * t - 1.5 * t ** 3
            w3 = -0.5 * t * t + 0.5 * t ** 3
            planes.append(w0 * cm1 + w1 * coarse + w2 * cp1 + w3 * cp2)
        vol = jnp.stack(planes, axis=1).reshape(
            n_coarse * build_step, h, w)[:n_planes]
    tab = _encode_tab(vol.reshape(n_planes, h * w).T)  # (P, D)
    p_pad = _round_up(h * w, _CHUNK)
    tab = jnp.pad(tab, ((0, p_pad - h * w), (0, 0)))

    # valid-sigma interval: each border is one linear constraint
    # a + b*sigma >= 0 (z>0 folded in); intersect analytically
    cons = (
        (p0z, wv[2]),                                          # z > 0
        (p0x, wv[0]),                                          # u >= 0
        ((ws - 1) * p0z - p0x, (ws - 1) * wv[2] - wv[0]),      # u <= W-1
        (p0y, wv[1]),                                          # v >= 0
        ((hs - 1) * p0z - p0y, (hs - 1) * wv[2] - wv[1]),      # v <= H-1
    )
    lo, hi = _intersect_sigma(cons, (h, w))
    # shrink by one step: the lerp also reads plane floor(f)+1
    return tab, lo + dsig, hi - dsig


def _intersect_sigma(cons, shape) -> Tuple[jax.Array, jax.Array]:
    """Intersect linear validity constraints a + b*sigma >= 0."""
    lo = jnp.full(shape, -jnp.inf)
    hi = jnp.full(shape, jnp.inf)
    eps = 1e-12
    for a, b in cons:
        root = -a / jnp.where(jnp.abs(b) < eps, eps, b)
        lo = jnp.where(b > eps, jnp.maximum(lo, root), lo)
        hi = jnp.where(b < -eps, jnp.minimum(hi, root), hi)
        # b ~ 0: constraint is constant; a < 0 -> never valid
        lo = jnp.where((jnp.abs(b) <= eps) & (a < 0), jnp.inf, lo)
    return lo, hi


def _lookup_kernel(tab_ref, f_ref, out_ref, *, s: int, n_chunks: int):
    """Gather+lerp: out[q, k] = lerp(tab[q, i0(f)], tab[q, i0+1], frac).

    One lane-wise dynamic_gather per 128-plane chunk serves both taps:
    indices are packed as [i0 | i0+1 | safe-pad] into exactly 128 lanes
    (Mosaic's gather is single-vreg and requires the index block to
    match the operand block's shape); with n_chunks > 1 each chunk's
    gather result is select-merged by index membership.
    """
    f = f_ref[...]                                     # (chunk, S)
    d = n_chunks * D_PLANES
    i0 = jnp.clip(jnp.floor(f), 0.0, d - 2.0)
    t = f - i0
    i0i = i0.astype(jnp.int32)
    chunk = f.shape[0]
    pad = D_PLANES - 2 * s
    tabf = _decode_tab(tab_ref[...])
    if n_chunks == 1:
        idx = jnp.concatenate(
            [i0i, i0i + 1,
             jnp.zeros((chunk, pad), jnp.int32)], axis=1)  # (chunk, D)
        g = jnp.take_along_axis(tabf, idx, axis=1)
        g0 = g[:, :s]
        g1 = g[:, s:2 * s]
    else:
        g0 = jnp.zeros((chunk, s), jnp.float32)
        g1 = jnp.zeros((chunk, s), jnp.float32)
        for c in range(n_chunks):
            r0 = i0i - c * D_PLANES
            r1 = r0 + 1
            idx = jnp.concatenate(
                [jnp.clip(r0, 0, D_PLANES - 1),
                 jnp.clip(r1, 0, D_PLANES - 1),
                 jnp.zeros((chunk, pad), jnp.int32)], axis=1)
            g = jnp.take_along_axis(
                tabf[:, c * D_PLANES:(c + 1) * D_PLANES], idx, axis=1)
            in0 = (r0 >= 0) & (r0 < D_PLANES)
            in1 = (r1 >= 0) & (r1 < D_PLANES)
            g0 = jnp.where(in0, g[:, :s], g0)
            g1 = jnp.where(in1, g[:, s:2 * s], g1)
    out_ref[...] = g0 + (g1 - g0) * t


@functools.partial(jax.jit, static_argnames=("interpret",))
def volume_lookup(tab: jax.Array, f: jax.Array,
                  interpret: bool = False) -> jax.Array:
    """Lerp-sample per-pixel tables: tab (P_pad, D), f (P_pad, S) ->
    (P_pad, S) values.  D is a multiple of 128; S must be <= 64 (both
    lerp taps of a chunk ride one gather)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    p_pad, d = tab.shape
    s = f.shape[1]
    n_chunks = d // D_PLANES
    assert d % D_PLANES == 0 and 2 * s <= D_PLANES
    block = _CHUNK if n_chunks <= 2 else _CHUNK // 2
    assert p_pad % block == 0
    grid = p_pad // block
    return pl.pallas_call(
        functools.partial(_lookup_kernel, s=s, n_chunks=n_chunks),
        grid=(grid,),
        in_specs=[pl.BlockSpec((block, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((block, s), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block, s), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p_pad, s), jnp.float32),
        interpret=interpret,
    )(tab, f)


F_PACK_SCALE = 64       # u16 fixed-point index encoding: quantum 1/64
                        # sigma plane (planes are ~1-3px apart along the
                        # epipolar line, so <=0.05px quantization — far
                        # below the build's own lerp residual); covers
                        # up to 1023 planes


def _lookup_multi_kernel(tab_ref, f_ref, *refs, c: int, n_chunks: int,
                         packed: bool, bounded: bool):
    """Multi-candidate gather+lerp: the in-kernel candidate loop.

    Like _lookup_kernel but serving C = K*S index columns (all K
    PatchMatch candidates' patch samples) against ONE resident table
    tile: the dominant HBM cost of exact scoring — reading the (P, 128)
    table — is paid once per block instead of once per candidate
    (ref workload: the ProcessPixel candidate loop,
    frame_main/libs/MVS/DepthMap.cpp:1050-1668, re-reads nothing).
    C must be a multiple of 64; each 64-column group packs both lerp
    taps into one 128-lane dynamic_gather.

    ``packed``: indices arrive u16 fixed-point (f * F_PACK_SCALE,
    pre-clipped to [0, D-1]) and values leave u16 on the table's raw
    0..65534 intensity scale — halving the dominant HBM panels
    (consumers decode with 1/65534).

    ``bounded`` (packed only): a bounds input follows f — (block, 128)
    u16 with the row's valid-index interval lo replicated in lanes
    0..63 and hi in lanes 64..127.  Out-of-interval (or sentinel-0xFFFF)
    lookups emit the sentinel 0xFFFF instead of a value, so consumers
    derive the validity mask from the value panel itself — no separate
    mask panel crosses HBM.
    """
    d = n_chunks * D_PLANES
    if bounded:
        bounds_ref, out_ref = refs
    else:
        (out_ref,) = refs
    if packed:
        fi = f_ref[...].astype(jnp.int32)              # u16 -> i32
        i0i = jnp.minimum(fi >> 6, d - 2)
        t = (fi - (i0i << 6)).astype(jnp.float32) * (1.0 / F_PACK_SCALE)
        # raw-scale decode (u16 -> i32 -> f32; Mosaic has no direct cast)
        traw = tab_ref[...]
        tabf = (traw.astype(jnp.int32).astype(jnp.float32)
                if traw.dtype == jnp.uint16
                else traw.astype(jnp.float32) * 65535.0)
    else:
        f = f_ref[...]                                 # (block, C)
        i0 = jnp.clip(jnp.floor(f), 0.0, d - 2.0)
        t = f - i0
        i0i = i0.astype(jnp.int32)
        tabf = _decode_tab(tab_ref[...])               # (block, D)
    if bounded:
        b = bounds_ref[...].astype(jnp.int32)          # (block, 128)
        lo_b = b[:, :64]
        hi_b = b[:, 64:]
    outs = []
    for g in range(c // 64):
        i0g = i0i[:, g * 64:(g + 1) * 64]
        i1g = i0g + 1
        if n_chunks == 1:
            r = jnp.take_along_axis(
                tabf, jnp.concatenate([i0g, i1g], axis=1), axis=1)
            g0 = r[:, :64]
            g1 = r[:, 64:]
        else:
            g0 = jnp.zeros(i0g.shape, jnp.float32)
            g1 = jnp.zeros(i0g.shape, jnp.float32)
            for ch in range(n_chunks):
                r0 = i0g - ch * D_PLANES
                r1 = r0 + 1
                idx = jnp.concatenate(
                    [jnp.clip(r0, 0, D_PLANES - 1),
                     jnp.clip(r1, 0, D_PLANES - 1)], axis=1)
                r = jnp.take_along_axis(
                    tabf[:, ch * D_PLANES:(ch + 1) * D_PLANES], idx,
                    axis=1)
                g0 = jnp.where((r0 >= 0) & (r0 < D_PLANES), r[:, :64], g0)
                g1 = jnp.where((r1 >= 0) & (r1 < D_PLANES), r[:, 64:], g1)
        lerped = g0 + (g1 - g0) * t[:, g * 64:(g + 1) * 64]
        if packed:
            li = jnp.round(lerped).astype(jnp.int32)
            if bounded:
                fg = fi[:, g * 64:(g + 1) * 64]
                ok = (fg >= lo_b) & (fg <= hi_b)
                li = jnp.where(ok, jnp.minimum(li, 65534), 65535)
            lerped = li.astype(jnp.uint16)
        outs.append(lerped)
    out_ref[...] = jnp.concatenate(outs, axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def volume_lookup_multi(tab: jax.Array, f: jax.Array, bounds=None,
                        interpret: bool = False) -> jax.Array:
    """Lerp-sample per-pixel tables at C index columns per row: tab
    (P_pad, D), f (P_pad, C) -> (P_pad, C).  C must be a multiple of 64
    (pad with zeros); D a multiple of 128.  One table-tile load serves
    all C columns — use this when scoring many candidates x offsets.

    f dtype selects the transfer encoding: float32 in -> float32 out
    (decoded intensities); uint16 in (fixed-point f * F_PACK_SCALE,
    pre-clipped to [0, D-1]) -> uint16 out (raw scale, clamped to
    65534).  ``bounds`` (packed only): (P_pad, 128) u16 per-row valid
    interval on the encoded scale — lo replicated in lanes 0..63, hi in
    64..127; out-of-interval lookups output the sentinel 0xFFFF."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    p_pad, d = tab.shape
    c = f.shape[1]
    n_chunks = d // D_PLANES
    packed = f.dtype == jnp.uint16
    bounded = bounds is not None
    assert d % D_PLANES == 0 and c % 64 == 0
    assert not bounded or packed
    # VMEM budget: in/out blocks are (block, C); keep the working set
    # (x2 for pallas double buffering) comfortably under the 16MB VMEM
    if c <= 128:
        block = _CHUNK
    elif c <= 256 or packed:
        block = _CHUNK // 2
    else:
        block = _CHUNK // 4
    assert p_pad % block == 0
    grid = p_pad // block
    out_dtype = jnp.uint16 if packed else jnp.float32
    in_specs = [pl.BlockSpec((block, d), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block, c), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    args = [tab, f]
    if bounded:
        in_specs.append(pl.BlockSpec((block, 128), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        args.append(bounds)
    return pl.pallas_call(
        functools.partial(_lookup_multi_kernel, c=c, n_chunks=n_chunks,
                          packed=packed, bounded=bounded),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p_pad, c), out_dtype),
        interpret=interpret,
    )(*args)


def volume_lookup_xla(tab: jax.Array, f: jax.Array) -> jax.Array:
    """Pure-XLA fallback (CPU tests / non-TPU backends)."""
    i0 = jnp.clip(jnp.floor(f), 0.0, tab.shape[1] - 2.0)
    t = f - i0
    i0i = i0.astype(jnp.int32)
    tab = _decode_tab(tab)
    g0 = jnp.take_along_axis(tab, i0i, axis=1)
    g1 = jnp.take_along_axis(tab, i0i + 1, axis=1)
    return g0 + (g1 - g0) * t


def build_volume_tables(geom, src_grays: jax.Array, d_min: jax.Array,
                        d_max: jax.Array,
                        n_chunks: int = 1) -> VolumeTables:
    """All neighbor views' tables for one reference view.

    ``geom`` is a dense.types.ViewGeometry (batched V); ``src_grays``
    (V, H, W).  Built once per stage — images and geometry are fixed
    across every sweep/candidate/external iteration.

    ``n_chunks``: sigma planes = n_chunks * 128 (cfg.volume_planes) —
    denser grids for reference-class fixed-FOV resolutions where one
    128-plane grid spans >1px per plane.
    """
    v, h, w = src_grays.shape
    n_planes = n_chunks * D_PLANES
    sig0, dsig = sigma_grid(d_min, d_max, n_planes=n_planes)

    def per_view(A, wv, src):
        return build_view_volume(A, wv, src, sig0, dsig, h, w,
                                 n_planes=n_planes)

    if h * w > 640 * 480:
        # large images: serialize the neighbor axis — the vmapped build
        # holds V pairs' multi-GB f32 plane stacks live at once, which
        # thrashes HBM at reference-scale sizes (measured 72s vs ~5s for
        # the serialized build at 1280x960)
        tab, lo, hi = jax.lax.map(
            lambda a: per_view(a[0], a[1], a[2]),
            (geom.A, geom.wv, src_grays))
    else:
        tab, lo, hi = jax.vmap(per_view)(geom.A, geom.wv, src_grays)
    return VolumeTables(tab=tab,
                        sig0=jnp.broadcast_to(sig0, (v,)),
                        inv_dsig=jnp.broadcast_to(1.0 / dsig, (v,)),
                        sig_lo=lo, sig_hi=hi)


# ---------------------------------------------------------------------------
# Rectified-frame table build (ops/rect_gather.py geometry): the per-plane
# bilinear-warp build above spends D/2 x H x W per-index gathers per pair
# (measured 4.5s per stage at 1280x960, charged ~22% of every bench round).
# In the rect frame every pixel's sigma-segment is a contiguous strided run
# of ONE row, so the whole table resolves from VMEM windows with lane
# gathers: the only per-index gather left is the one-time bilinear warp of
# the source into the rect frame (~2 x H x W per pair, ~30x fewer indices).
# Pixel order of the resulting tables is TILE-MAJOR (see to_volume_order);
# the scoring consumer uses the same order when the gate below is on.
# ---------------------------------------------------------------------------

_RG_ROW_HALVES = 11     # row band: 11 x 8 rows (the build's rect frame
                        # is 2x vertically oversampled, doubling per-tile
                        # row spreads vs rect_gather's lookup engine)
_RG_COL_HALVES = 2      # col window: 2 x 512 cols
_RG_Y_SCALE = 2.0       # cross-epipolar oversampling (see
                        # rect_frame_shape) — kills the row-lerp blur


def use_rect_volume_build(cfg, h: int, w: int) -> bool:
    """Whether stage tables are built through the rect-frame kernel
    (unaligned sizes are tile-padded internally; multi-chunk plane
    grids — cfg.volume_planes > 128 — use the per-plane warp build)."""
    del h, w
    if getattr(cfg, "volume_planes", 128) > D_PLANES:
        return False
    if cfg.volume_build == "rect":
        return True
    return (cfg.volume_build == "auto" and cfg.use_pallas
            and jax.default_backend() == "tpu")


def padded_hw(h: int, w: int) -> Tuple[int, int]:
    """Tile-aligned size the rect paths pad unaligned images to."""
    return _round_up(h, 8), _round_up(w, 128)


def to_volume_order(x: jax.Array, pad_value: float = 0.0) -> jax.Array:
    """(..., H, W) -> (..., P) in the rect build's pixel order:
    (8, 128) image tiles in raster order; within a tile, column-major
    octets (group g = tile column g, its 8 rows in order).  Unaligned
    images are zero-padded to the tile grid (P = padded pixel count)."""
    *lead, h, w = x.shape
    h8, w128 = padded_hw(h, w)
    if (h8, w128) != (h, w):
        x = jnp.pad(x, [(0, 0)] * len(lead) + [(0, h8 - h), (0, w128 - w)],
                    constant_values=pad_value)
    x = x.reshape(*lead, h8 // 8, 8, w128 // 128, 128)
    x = jnp.moveaxis(x, -3, -2)                   # (..., bh, bw, 8, 128)
    x = jnp.swapaxes(x, -1, -2)                   # (..., bh, bw, 128, 8)
    return x.reshape(*lead, h8 * w128)


def to_volume_order_multi(x: jax.Array) -> jax.Array:
    """(C, H, W) -> (P, C) in the rect build's pixel order.

    Layout-safe variant of ``to_volume_order(...).reshape(C, P).T`` for
    many channels at once: every intermediate keeps the (128-aligned) C
    axis minor, where the naive reorder materializes a (..., 128, 8)
    minor-8 tensor that TPU pads 16x (measured 9.4G for a 1.5G panel —
    the r5 batched-scoring OOM).  C should be a multiple of 128 for a
    pad-free layout (pad channels first)."""
    c, h, w = x.shape
    h8, w128 = padded_hw(h, w)
    x = jnp.moveaxis(x, 0, -1)                        # (H, W, C)
    x = jnp.pad(x, ((0, h8 - h), (0, w128 - w), (0, 0)))
    x = x.reshape(h8 // 8, 8, w128 // 128, 128, c)
    x = jnp.transpose(x, (0, 2, 3, 1, 4))             # (bh, bw, 128, 8, C)
    return x.reshape(h8 * w128, c)


def from_volume_order_multi(x: jax.Array, h: int, w: int) -> jax.Array:
    """Inverse of to_volume_order_multi: (P, C) -> (C, H, W)."""
    p, c = x.shape
    h8, w128 = padded_hw(h, w)
    x = x.reshape(h8 // 8, w128 // 128, 128, 8, c)
    x = jnp.transpose(x, (0, 3, 1, 2, 4))             # (bh, 8, bw, 128, C)
    x = x.reshape(h8, w128, c)[:h, :w]
    return jnp.moveaxis(x, -1, 0)


def from_volume_order(x: jax.Array, h: int, w: int) -> jax.Array:
    """Inverse of to_volume_order (drops the alignment padding)."""
    *lead, _ = x.shape
    h8, w128 = padded_hw(h, w)
    x = x.reshape(*lead, h8 // 8, w128 // 128, 128, 8)
    x = jnp.swapaxes(x, -1, -2)
    x = jnp.moveaxis(x, -2, -3)
    return x.reshape(*lead, h8, w128)[..., :h, :w]


def _rect_build_kernel(rb_ref, cb_ref, *refs):
    """One 8-pixel group (a tile column) x all 128 sigma planes.

    Fields arrive lanes-as-groups (blocks (8, 128): sublane = pixel,
    lane = group) and this step's group is extracted with a lane gather
    — Mosaic block shapes must keep their last two dims tile-aligned.
    Phase A: resolve + vertically lerp each pixel's rect row from the
    40-row band into ``aligned`` (8, 1024).  Phase B: each pixel's 128
    plane columns are an arithmetic progression in its aligned row —
    pack both lerp taps into one 1024-lane take_along_axis.
    """
    wins = refs[:_RG_ROW_HALVES * _RG_COL_HALVES]
    f_row, f_c0, f_k, out_ref = refs[_RG_ROW_HALVES * _RG_COL_HALVES:]
    g_id = pl.program_id(2)
    idxg = jnp.full((8, 128), g_id, jnp.int32)

    def pick(ref):   # (8, 128) all-lane-equal broadcast of group g_id
        return jnp.take_along_axis(ref[0, 0], idxg, axis=1)

    rowf = pick(f_row)
    c0w = pick(f_c0)
    kp = pick(f_k)
    r0 = jnp.floor(rowf)
    fr = rowf - r0                                        # (8, 128)
    r0i = r0.astype(jnp.int32)

    def wide(x):     # (8, 128) all-lane-equal -> (8, 1024)
        return jnp.concatenate([x] * 8, axis=1)

    aligned = jnp.zeros((8, 1024), jnp.float32)
    for g in range(_RG_ROW_HALVES):
        wrow = jnp.concatenate(
            [wins[g * _RG_COL_HALVES][0, 0, 0],
             wins[g * _RG_COL_HALVES + 1][0, 0, 0]], axis=1)  # (8, 1024)
        for wgt, ri in ((1.0 - fr, r0i), (fr, r0i + 1)):
            sel = ((ri >= 8 * g) & (ri < 8 * g + 8)).astype(jnp.float32)
            t = jnp.take_along_axis(
                wrow, wide(jnp.clip(ri - 8 * g, 0, 7)), axis=0)
            aligned = aligned + wide(wgt * sel) * t

    j = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1).astype(
        jnp.float32)
    base = c0w + kp * j                                   # window cols
    i0 = jnp.clip(jnp.floor(base), 0.0, 1022.0)
    fc = jnp.clip(base - i0, 0.0, 1.0)
    i0i = i0.astype(jnp.int32)
    i1i = i0i + 1
    # Mosaic's lane gather is single-vreg: resolve the 1024-col aligned
    # row chunk by chunk with per-chunk membership selects
    t0 = jnp.zeros((8, 128), jnp.float32)
    t1 = jnp.zeros((8, 128), jnp.float32)
    for cc in range(8):
        chunk = aligned[:, cc * 128:cc * 128 + 128]
        g0 = jnp.take_along_axis(chunk, jnp.clip(i0i - cc * 128, 0, 127),
                                 axis=1)
        g1 = jnp.take_along_axis(chunk, jnp.clip(i1i - cc * 128, 0, 127),
                                 axis=1)
        t0 = jnp.where(i0i // 128 == cc, g0, t0)
        t1 = jnp.where(i1i // 128 == cc, g1, t1)
    out_ref[0, 0, 0] = t0 * (1.0 - fc) + t1 * fc


def _rect_build_xla(win_src: jax.Array, rb: jax.Array, cb: jax.Array,
                    rowf: jax.Array, c0w_t: jax.Array, kp_t: jax.Array
                    ) -> jax.Array:
    """Pure-XLA replica of the kernel's exact semantics (CPU/tests).

    ``win_src`` (V, H_r, W_r); fields in group-major (V, T, 128, 8)."""
    v, t, _, _ = rowf.shape
    h_r, w_r = win_src.shape[1:]
    r0 = jnp.floor(rowf)                       # band-relative, like the
    fr = rowf - r0                             # kernel's f_row input
    r0b = r0.astype(jnp.int32)
    in_band0 = (r0b >= 0) & (r0b < 8 * _RG_ROW_HALVES)
    in_band1 = (r0b + 1 >= 0) & (r0b + 1 < 8 * _RG_ROW_HALVES)
    band_lo = rb[..., None, None] * 8
    r0i = jnp.clip(r0b + band_lo, 0, h_r - 1)
    r1i = jnp.clip(r0b + 1 + band_lo, 0, h_r - 1)
    j = jnp.arange(128, dtype=jnp.float32)
    base = (c0w_t[..., None] + kp_t[..., None] * j)         # (V,T,128,8,128)
    i0 = jnp.clip(jnp.floor(base), 0.0, 1022.0)
    fc = jnp.clip(base - i0, 0.0, 1.0)
    ci = i0.astype(jnp.int32) + cb[..., None, None, None] * 512
    ci0 = jnp.clip(ci, 0, w_r - 1)
    ci1 = jnp.clip(ci + 1, 0, w_r - 1)
    flat = win_src.reshape(v, h_r * w_r)

    def fetch(ri, ok_r, cidx):
        idx = (ri[..., None] * w_r + cidx).reshape(v, -1)
        vals = jnp.take_along_axis(flat, idx, axis=1)
        return vals.reshape(cidx.shape) * ok_r[..., None]
    v00 = fetch(r0i, in_band0.astype(jnp.float32), ci0)
    v01 = fetch(r0i, in_band0.astype(jnp.float32), ci1)
    v10 = fetch(r1i, in_band1.astype(jnp.float32), ci0)
    v11 = fetch(r1i, in_band1.astype(jnp.float32), ci1)
    top = v00 * (1 - fc) + v01 * fc
    bot = v10 * (1 - fc) + v11 * fc
    return top * (1 - fr[..., None]) + bot * fr[..., None]


def build_volume_tables_rect(geom, src_grays: jax.Array, d_min: jax.Array,
                             d_max: jax.Array,
                             interpret: bool = False,
                             warp_row_step: int = 2) -> VolumeTables:
    """Rect-frame table build for one reference view (all V pairs).

    Semantics: tab[p, j] = bilerp(rect_src, row(p), col(p, sigma_j))
    where rect_src is the bilinear warp of the source into the pair's
    rect frame — a once-per-stage resample replacing the per-plane warp
    gathers.  The valid-sigma interval additionally intersects the rect
    band/window coverage, so banding misses are EXACT invalidity, never
    silent zeros.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from hcmvs_tpu.ops.rect_gather import make_rect_geometry
    from hcmvs_tpu.ops.sampling import bicubic_sample_xy
    from hcmvs_tpu.dense.types import mat3_apply

    v, h, w = src_grays.shape
    h8, w128 = padded_hw(h, w)
    sig0, dsig = sigma_grid(d_min, d_max)
    rg = make_rect_geometry(geom, h, w, y_scale=_RG_Y_SCALE)
    h_r0, w_r0 = _rect_frame_rounded(h, w)
    n_bh, n_bw = h8 // 8, w128 // 128
    n_tiles = n_bh * n_bw

    # one-time Catmull-Rom warp into the rect frame (the only gathers
    # left; bicubic because a bilinear resample followed by the kernel's
    # bilerp visibly smears high-frequency texture — measured -0.10
    # ridge depth accuracy).  ``warp_row_step=2``: warp every other
    # CROSS-epipolar row exactly and reconstruct the skipped rows by
    # elementwise vertical Catmull-Rom — the rect frame is already 2x
    # vertically oversampled (_RG_Y_SCALE), so the half-rate rows sample
    # the source at ~1-row spacing and cubic reconstruction is below
    # noise (r5 measured: warp gathers were 73% of the build wall; tab
    # parity + golden gates unchanged).  Columns (the epipolar/sigma
    # direction) are always warped exactly.
    n_rows = h_r0 // warp_row_step
    rv, ru = jnp.meshgrid(
        jnp.arange(n_rows, dtype=jnp.float32) * warp_row_step,
        jnp.arange(w_r0, dtype=jnp.float32), indexing="ij")

    def warp(H_sr, src):
        px, py, pz = mat3_apply(H_sr, (ru, rv, jnp.ones_like(ru)))
        inv = 1.0 / jnp.where(jnp.abs(pz) < 1e-9, 1e-9, pz)
        # EDGE-CLAMP beyond the src footprint instead of zero-filling:
        # table entries just inside the valid-sigma border lerp their
        # rect neighbors, and a zero neighbor would bleed into valid
        # samples (measured: border rows lost ~0.7 of their intensity).
        # Validity is governed exactly by the sigma intervals, so
        # clamped values outside them are never consumed.
        x = jnp.clip(px * inv, 0.0, w - 1.0)
        y = jnp.clip(py * inv, 0.0, h - 1.0)
        out, _ = bicubic_sample_xy(src, jnp.where(pz > 1e-9, x, 0.0),
                                   jnp.where(pz > 1e-9, y, 0.0))
        return out

    rect_src = jax.vmap(warp)(rg.H_sr, src_grays)     # (V, H_r/k, W_r)
    if warp_row_step > 1:
        # vertical cubic reconstruction of the skipped rows (pure
        # elementwise, mirroring build_view_volume's build_step trick)
        cm1 = jnp.concatenate([rect_src[:, :1], rect_src[:, :-1]], axis=1)
        cp1 = jnp.concatenate([rect_src[:, 1:], rect_src[:, -1:]], axis=1)
        cp2 = jnp.concatenate([rect_src[:, 2:], rect_src[:, -1:],
                               rect_src[:, -1:]], axis=1)
        rows = []
        for r in range(warp_row_step):
            t = r / warp_row_step
            if r == 0:
                rows.append(rect_src)
                continue
            w0 = -0.5 * t + t * t - 0.5 * t ** 3
            w1 = 1.0 - 2.5 * t * t + 1.5 * t ** 3
            w2 = 0.5 * t + 2.0 * t * t - 1.5 * t ** 3
            w3 = -0.5 * t * t + 0.5 * t ** 3
            rows.append(w0 * cm1 + w1 * rect_src + w2 * cp1 + w3 * cp2)
        rect_src = jnp.stack(rows, axis=2).reshape(v, h_r0, w_r0)

    # per-pixel fields
    pv, pu = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")

    def fields(M, bx):
        ax, ay, az = mat3_apply(M, (pu, pv, jnp.ones_like(pu)))
        ok = az > 1e-9
        inv = 1.0 / jnp.where(ok, az, 1.0)
        rowf = jnp.where(ok, ay * inv, -1e9)
        c0 = jnp.where(ok, ax * inv, 1e9)
        k = jnp.where(ok, bx * inv, 0.0)
        return rowf, c0, k, ok

    rowf, c0, k, az_ok = jax.vmap(fields)(rg.M, rg.bx)

    # per-tile bases (stage-static): centered band / 1024-col window.
    # Alignment padding enters as NaN so it never moves a tile's window.
    def blocks(x, pad_value=jnp.nan):
        if (h8, w128) != (h, w):
            x = jnp.pad(x, ((0, 0), (0, h8 - h), (0, w128 - w)),
                        constant_values=pad_value)
        return jnp.moveaxis(x.reshape(v, n_bh, 8, n_bw, 128), 2, 3)

    rows_b = blocks(jnp.where(az_ok, rowf, jnp.nan))
    rmin = jnp.nanmin(rows_b, axis=(-1, -2))
    rmax = jnp.nanmax(rows_b, axis=(-1, -2))
    center = jnp.nan_to_num(0.5 * (rmin + rmax), nan=0.0)
    rb = jnp.clip((center // 8.0).astype(jnp.int32) - _RG_ROW_HALVES // 2,
                  0, h_r0 // 8 - _RG_ROW_HALVES).reshape(v, n_tiles)
    cA = blocks(jnp.where(az_ok, c0 + k * sig0, jnp.nan))
    cB = blocks(jnp.where(az_ok, c0 + k * (sig0 + dsig * (D_PLANES - 1)),
                          jnp.nan))
    cmin = jnp.minimum(jnp.nanmin(cA, axis=(-1, -2)),
                       jnp.nanmin(cB, axis=(-1, -2)))
    cmax = jnp.maximum(jnp.nanmax(cA, axis=(-1, -2)),
                       jnp.nanmax(cB, axis=(-1, -2)))
    ccen = jnp.nan_to_num(0.5 * (cmin + cmax), nan=0.0)
    cb = jnp.clip((ccen // 512.0).astype(jnp.int32) - 1, 0,
                  w_r0 // 512 - _RG_COL_HALVES).reshape(v, n_tiles)

    # group-major fields (group g = tile column g): (V, T, 128, 8);
    # padded pixels carry the invalid-row sentinel so the kernel zeros
    # their rows (their table entries are never consumed — the scoring
    # consumer pads/unpads with the same to_volume_order layout)
    def group_major(x, pad_value):
        xb = blocks(x, pad_value)                     # (V, bh, bw, 8, 128)
        return jnp.swapaxes(xb, -1, -2).reshape(v, n_tiles, 128, 8)

    rb_full = jnp.repeat(rb.reshape(v, n_tiles, 1, 1), 128, axis=2)
    cb_full = jnp.repeat(cb.reshape(v, n_tiles, 1, 1), 128, axis=2)
    rowf_g = group_major(rowf, -1e9) - 8.0 * rb_full
    c0w_g = (group_major(c0 + k * sig0, 0.0) - 512.0 * cb_full)
    kp_g = group_major(k * dsig, 0.0)

    if interpret or jax.default_backend() != "tpu":
        tabs = _rect_build_xla(rect_src, rb, cb, rowf_g, c0w_g, kp_g)
    else:
        win = rect_src.reshape(v, h_r0 // 8, 8, w_r0 // 512, 512)
        win = jnp.moveaxis(win, 2, 3)                 # (V, rh, ch, 8, 512)

        def wspec(i_r, i_c):
            return pl.BlockSpec(
                (1, 1, 1, 8, 512),
                lambda vg, tg, gg, rbr, cbr, i_r=i_r, i_c=i_c: (
                    vg, rbr[vg, tg] + i_r, cbr[vg, tg] + i_c, 0, 0),
                memory_space=pltpu.VMEM)

        fspec = pl.BlockSpec((1, 1, 8, 128),
                             lambda vg, tg, gg, rbr, cbr: (vg, tg, 0, 0),
                             memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(v, n_tiles, 128),
            in_specs=[wspec(i_r, i_c) for i_r in range(_RG_ROW_HALVES)
                      for i_c in range(_RG_COL_HALVES)]
            + [fspec, fspec, fspec],
            out_specs=pl.BlockSpec(
                (1, 1, 1, 8, 128),
                lambda vg, tg, gg, rbr, cbr: (vg, tg, gg, 0, 0)),
        )
        tabs = pl.pallas_call(
            _rect_build_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((v, n_tiles, 128, 8, 128),
                                           jnp.float32),
        )(rb, cb, *([win] * (_RG_ROW_HALVES * _RG_COL_HALVES)),
          jnp.swapaxes(rowf_g, -1, -2), jnp.swapaxes(c0w_g, -1, -2),
          jnp.swapaxes(kp_g, -1, -2))

    tab = _encode_tab(tabs.reshape(v, n_tiles * 1024, D_PLANES))
    p_pad = _round_up(n_tiles * 1024, _CHUNK)
    tab = jnp.pad(tab, ((0, 0), (0, p_pad - n_tiles * 1024), (0, 0)))

    # exact valid-sigma interval: original src-frame constraints PLUS the
    # rect frame / band / window coverage, so misses are invalid samples
    def interval(A, wv, rowf_v, c0_v, k_v, ok_v, rb_v, cb_v):
        p0x = A[0, 0] * pu + A[0, 1] * pv + A[0, 2]
        p0y = A[1, 0] * pu + A[1, 1] * pv + A[1, 2]
        p0z = A[2, 0] * pu + A[2, 1] * pv + A[2, 2]
        rbf = _expand_tiles(rb_v, n_bh, n_bw)[:h, :w].astype(
            jnp.float32) * 8.0
        cbf = _expand_tiles(cb_v, n_bh, n_bw)[:h, :w].astype(
            jnp.float32) * 512.0
        cons = (
            (p0z, wv[2]),
            (p0x, wv[0]),
            ((w - 1) * p0z - p0x, (w - 1) * wv[2] - wv[0]),
            (p0y, wv[1]),
            ((h - 1) * p0z - p0y, (h - 1) * wv[2] - wv[1]),
            # rect col window: 512*cb <= c0 + k*sigma <= 512*cb + 1022
            (c0_v - cbf, k_v),
            (cbf + 1022.0 - c0_v, -k_v),
        )
        lo, hi = _intersect_sigma(cons, (h, w))
        # binary validity: behind rect cam, or row outside the band
        row_ok = (ok_v & (rowf_v >= rbf)
                  & (rowf_v <= rbf + 8.0 * _RG_ROW_HALVES - 1.0)
                  & (rowf_v <= h_r0 - 1))
        lo = jnp.where(row_ok, lo, jnp.inf)
        return lo + dsig, hi - dsig

    lo, hi = jax.vmap(interval)(geom.A, geom.wv, rowf, c0, k, az_ok, rb,
                                cb)
    return VolumeTables(tab=tab,
                        sig0=jnp.broadcast_to(sig0, (v,)),
                        inv_dsig=jnp.broadcast_to(1.0 / dsig, (v,)),
                        sig_lo=lo, sig_hi=hi)


def _rect_frame_rounded(h: int, w: int) -> Tuple[int, int]:
    """rect_gather's frame at the build's vertical oversampling, rounded
    so its rows/cols block into the 8-row / 512-col windows."""
    from hcmvs_tpu.ops.rect_gather import rect_frame_shape
    h_r, w_r = rect_frame_shape(h, w, _RG_Y_SCALE)
    return _round_up(h_r, 8), _round_up(w_r, 512)


def _expand_tiles(x_t: jax.Array, n_bh: int, n_bw: int) -> jax.Array:
    """(T,) per-tile values -> (H, W) per-pixel broadcast."""
    x = x_t.reshape(n_bh, n_bw, 1, 1)
    x = jnp.broadcast_to(x, (n_bh, n_bw, 8, 128))
    return jnp.moveaxis(x, 2, 1).reshape(n_bh * 8, n_bw * 128)
