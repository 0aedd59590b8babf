"""Pallas TPU kernel for the weighted-ZNCC patch accumulation.

This is the hot op of the whole framework: PatchMatch scoring
(ref: frame_main/libs/MVS/DepthMap.cpp:522-595 ScorePixelImage) evaluates,
for every pixel, every candidate hypothesis and every source view, a
bilateral-weighted ZNCC over an adaptive patch window.  The XLA fallback
(dense/score.py photometric_scores_warped) materializes three (S, H, W)
offset stacks in HBM per view per candidate (S ~ 60 patch samples) and
scans over them — ~S x H x W x 12 bytes of HBM traffic per score call.

This kernel keeps the whole accumulation in VMEM: per (view, row-tile)
grid step it receives one haloed tile of the reference image, the
center-warped source image, and its validity mask (pre-sliced overlapping
row tiles, so every input uses standard VMEM blocking — vmap-compatible
and automatically double-buffered by the Pallas pipeline), then unrolls
the static patch offsets as shifted VMEM slices feeding the four running
sums (num / sum / sum-of-squares / sum-of-weights).  HBM traffic drops
from O(S * H * W) to O(H * W) per view — the kernel is VPU-bound (one exp
per sample for the bilateral weight), the speed-of-light for this op.

The math matches dense/score.py `_weights_traced` + the warped-mode scan
body exactly; tests/test_pallas_kernels.py checks parity in interpret
mode (CPU) against the XLA path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SIGMA_COLOR = 0.2  # ref: DepthMap.h:538 GetWeight sigmaColor


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(offs_ref, ref_t, warp_t, valid_t, tm_ref, nsq_ref, hw_ref,
            acc_ref, score_ref, var_ref, *, n_offsets, pad, tile_h, w):
    ref_c = ref_t[0, pad:pad + tile_h, pad:pad + w]
    tm = tm_ref[...]
    hw = hw_ref[...]
    inv_2hw2 = -0.5 / (hw * hw)
    inv_2sc2 = -1.0 / (2.0 * _SIGMA_COLOR ** 2)

    span_al, wp_al = ref_t.shape[1:]
    ref_full = ref_t[0]
    warp_full = warp_t[0, 0]
    valid_full = valid_t[0, 0]

    # fori_loop (not an unrolled Python loop) so only one iteration's
    # temporaries are live at a time — an unrolled 60-offset body blows the
    # 16MB scoped-vmem stack at production tile sizes.  The (dy, dx) shifts
    # are dynamic rotates (Mosaic vector loads require 8/128-aligned
    # dynamic starts, so pl.ds with arbitrary traced offsets won't lower);
    # |dy|,|dx| <= pad keeps the wrapped rows/cols outside the interior
    # slice, so the rotate is an exact shift.
    def body(k, carry):
        num, s1, sq1, sw = carry
        dy = offs_ref[k, 0]
        dx = offs_ref[k, 1]

        def shift2(a):
            a = pltpu.roll(a, (span_al - dy) % span_al, axis=0)
            a = pltpu.roll(a, (wp_al - dx) % wp_al, axis=1)
            return a[pad:pad + tile_h, pad:pad + w]

        v_d = shift2(ref_full)
        w_d = shift2(warp_full)
        ok = shift2(valid_full)
        dyf = dy.astype(jnp.float32)
        dxf = dx.astype(jnp.float32)
        w_color = (v_d - ref_c) ** 2 * inv_2sc2
        w_sp = (dyf * dyf + dxf * dxf) * inv_2hw2
        in_win = (jnp.maximum(jnp.abs(dyf), jnp.abs(dxf)) <= hw
                  ).astype(jnp.float32)
        wt = jnp.exp(w_color + w_sp) * in_win * ok
        return (num + wt * (v_d - tm) * w_d,
                s1 + wt * w_d,
                sq1 + wt * w_d * w_d,
                sw + wt)

    init = (acc_ref[0, 0], acc_ref[0, 1], acc_ref[0, 2], acc_ref[0, 3])
    num, s1, sq1, sw = jax.lax.fori_loop(0, n_offsets, body, init)

    var1 = sq1 - s1 * s1 / jnp.maximum(sw, 1e-12)
    denom = jnp.sqrt(jnp.maximum(nsq_ref[...] * var1, 1e-16))
    ncc = jnp.clip(num / denom, -1.0, 1.0)
    score_ref[0] = 1.0 - ncc
    var_ref[0] = var1


def _row_tiles(a: jax.Array, n_tiles: int, tile_h: int, span: int
               ) -> jax.Array:
    """Overlapping haloed row tiles along axis -2: (..., T, span, W).

    Materializes the 2*pad-row halo copies once per call — O(H*W) extra
    HBM traffic, which is what buys standard (vmap-friendly, auto-
    pipelined) VMEM blocking in the kernel.
    """
    if n_tiles == 1:
        return a[..., None, :, :]
    tiles = [jax.lax.slice_in_dim(a, t * tile_h, t * tile_h + span, axis=-2)
             for t in range(n_tiles)]
    return jnp.stack(tiles, axis=-3)


@functools.partial(jax.jit, static_argnames=("scan_offsets", "pad",
                                             "interpret"))
def zncc_warped_pallas(ref_pad: jax.Array, tm: jax.Array, nsq0: jax.Array,
                       warped_pad: jax.Array, valid_pad: jax.Array,
                       hw: jax.Array, acc: jax.Array,
                       scan_offsets: Tuple[Tuple[int, int], ...], pad: int,
                       interpret: bool = False
                       ) -> Tuple[jax.Array, jax.Array]:
    """Fused weighted-ZNCC accumulation over static patch offsets.

    Args:
      ref_pad:    (H+2p, W+2p) edge-padded reference gray image.
      tm:         (H, W) weighted patch mean of the reference.
      nsq0:       (H, W) weighted centered sum-of-squares of the reference.
      warped_pad: (V, H+2p, W+2p) per-view center-warped source images
                  (edge-padded).
      valid_pad:  (V, H+2p, W+2p) float32 validity of the warp samples
                  (zero-padded).
      hw:         (H, W) per-pixel adaptive half-window.
      acc:        (V, 4, H, W) initial (num, s1, sq1, sw) accumulators —
                  the exactly-warped window-corner contributions.
      scan_offsets: static (dy, dx) tuple; every |dy|,|dx| <= pad.
      pad:        static halo width.

    Returns:
      (score, var1), both (V, H, W): the 1-ZNCC cost (before robust
      masking) and the warped-patch variance (for the textureless test).
    """
    n_views, hp, wp = warped_pad.shape
    h, w = tm.shape
    assert hp == h + 2 * pad and wp == w + 2 * pad

    # pick a row tile: whole image when small, else ~128 rows
    tile_h = h if h <= 192 else 128
    h_pad = _round_up(h, tile_h)
    extra = h_pad - h
    if extra:
        ref_pad = jnp.pad(ref_pad, ((0, extra), (0, 0)), mode="edge")
        warped_pad = jnp.pad(warped_pad, ((0, 0), (0, extra), (0, 0)),
                             mode="edge")
        valid_pad = jnp.pad(valid_pad, ((0, 0), (0, extra), (0, 0)))
        tm = jnp.pad(tm, ((0, extra), (0, 0)))
        nsq0 = jnp.pad(nsq0, ((0, extra), (0, 0)))
        hw = jnp.pad(hw, ((0, extra), (0, 0)), mode="edge")
        acc = jnp.pad(acc, ((0, 0), (0, 0), (0, extra), (0, 0)))
    n_tiles = h_pad // tile_h
    span = tile_h + 2 * pad

    ref_tiles = _row_tiles(ref_pad, n_tiles, tile_h, span)      # (T,s,Wp)
    warp_tiles = _row_tiles(warped_pad, n_tiles, tile_h, span)  # (V,T,s,Wp)
    valid_tiles = _row_tiles(valid_pad, n_tiles, tile_h, span)
    offs = jnp.asarray(scan_offsets, jnp.int32)                 # (S, 2)

    # align the haloed tiles to the (8, 128) vreg grid: the kernel's
    # dynamic rotates only lower for aligned shapes; |shift| <= pad keeps
    # the alignment padding out of the interior slice
    span_al = _round_up(span, 8)
    wp_al = _round_up(wp, 128)
    tpad = ((0, span_al - span), (0, wp_al - wp))
    ref_tiles = jnp.pad(ref_tiles, ((0, 0),) + tpad)
    warp_tiles = jnp.pad(warp_tiles, ((0, 0), (0, 0)) + tpad)
    valid_tiles = jnp.pad(valid_tiles, ((0, 0), (0, 0)) + tpad)

    kernel = functools.partial(_kernel, n_offsets=len(scan_offsets),
                               pad=pad, tile_h=tile_h, w=w)
    grid = (n_views, n_tiles)
    out_shape = [jax.ShapeDtypeStruct((n_views, h_pad, w), jnp.float32),
                 jax.ShapeDtypeStruct((n_views, h_pad, w), jnp.float32)]
    vm = pltpu.VMEM
    score, var1 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # offsets table
            pl.BlockSpec((1, span_al, wp_al), lambda v, t: (t, 0, 0),
                         memory_space=vm),           # ref tile (haloed)
            pl.BlockSpec((1, 1, span_al, wp_al), lambda v, t: (v, t, 0, 0),
                         memory_space=vm),           # warped tile
            pl.BlockSpec((1, 1, span_al, wp_al), lambda v, t: (v, t, 0, 0),
                         memory_space=vm),           # valid tile
            pl.BlockSpec((tile_h, w), lambda v, t: (t, 0),
                         memory_space=vm),           # tm
            pl.BlockSpec((tile_h, w), lambda v, t: (t, 0),
                         memory_space=vm),           # nsq0
            pl.BlockSpec((tile_h, w), lambda v, t: (t, 0),
                         memory_space=vm),           # hw
            pl.BlockSpec((1, 4, tile_h, w), lambda v, t: (v, 0, t, 0),
                         memory_space=vm),           # acc
        ],
        out_specs=[
            pl.BlockSpec((1, tile_h, w), lambda v, t: (v, t, 0),
                         memory_space=vm),
            pl.BlockSpec((1, tile_h, w), lambda v, t: (v, t, 0),
                         memory_space=vm),
        ],
        out_shape=out_shape,
        interpret=interpret,
    )(offs, ref_tiles, warp_tiles, valid_tiles, tm, nsq0, hw, acc)
    if extra:
        score = score[:, :h]
        var1 = var1[:, :h]
    return score, var1
