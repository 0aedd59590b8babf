"""Parity tests for the Pallas TPU kernels (interpret mode on CPU).

The kernels must compute bit-comparable results to the pure-XLA fallback
paths they replace (dense/score.py warped-mode scan)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hcmvs_tpu.ops.pallas_zncc import zncc_warped_pallas, _SIGMA_COLOR


def _jnp_reference(ref_pad, tm, nsq0, warped_pad, valid_pad, hw, acc,
                   scan_offsets, pad):
    h, w = tm.shape

    def shifted(a, dy, dx):
        return a[..., pad + dy:pad + dy + h, pad + dx:pad + dx + w]

    ref_c = shifted(ref_pad, 0, 0)

    def per_view(w_pad, v_pad, acc_v):
        num, s1, sq1, sw = acc_v[0], acc_v[1], acc_v[2], acc_v[3]
        for dy, dx in scan_offsets:
            v_d = shifted(ref_pad, dy, dx)
            w_d = shifted(w_pad, dy, dx)
            ok = shifted(v_pad, dy, dx)
            w_color = (v_d - ref_c) ** 2 * (-1.0 / (2 * _SIGMA_COLOR ** 2))
            w_sp = (dy * dy + dx * dx) / (-2.0 * hw * hw)
            in_win = (max(abs(dy), abs(dx)) <= hw).astype(jnp.float32)
            wt = jnp.exp(w_color + w_sp) * in_win * ok
            num = num + wt * (v_d - tm) * w_d
            s1 = s1 + wt * w_d
            sq1 = sq1 + wt * w_d * w_d
            sw = sw + wt
        var1 = sq1 - s1 * s1 / jnp.maximum(sw, 1e-12)
        denom = jnp.sqrt(jnp.maximum(nsq0 * var1, 1e-16))
        return 1.0 - jnp.clip(num / denom, -1.0, 1.0), var1

    return jax.vmap(per_view)(warped_pad, valid_pad, acc)


@pytest.mark.parametrize("h,w,tile_split", [(24, 32, False), (40, 48, False)])
def test_zncc_warped_kernel_parity(h, w, tile_split):
    pad = 3
    rng = np.random.default_rng(0)
    n_views = 3
    offsets = [(dy, dx) for dy in range(-pad, pad + 1, 2)
               for dx in range(-pad, pad + 1, 2)]
    scan_offsets = tuple((dy, dx) for dy, dx in offsets
                         if not (abs(dy) == pad and abs(dx) == pad))

    ref_pad = jnp.asarray(rng.random((h + 2 * pad, w + 2 * pad)), jnp.float32)
    tm = jnp.asarray(rng.random((h, w)), jnp.float32)
    nsq0 = jnp.asarray(rng.random((h, w)) + 0.1, jnp.float32)
    warped_pad = jnp.asarray(rng.random((n_views, h + 2 * pad, w + 2 * pad)),
                             jnp.float32)
    valid_pad = jnp.asarray(
        rng.random((n_views, h + 2 * pad, w + 2 * pad)) > 0.1, jnp.float32)
    hw = jnp.asarray(rng.choice([2.0, 3.0], (h, w)), jnp.float32)
    acc = jnp.asarray(rng.random((n_views, 4, h, w)) * 0.1, jnp.float32)

    score_k, var_k = zncc_warped_pallas(ref_pad, tm, nsq0, warped_pad,
                                        valid_pad, hw, acc, scan_offsets,
                                        pad, interpret=True)
    score_r, var_r = _jnp_reference(ref_pad, tm, nsq0, warped_pad, valid_pad,
                                    hw, acc, scan_offsets, pad)
    np.testing.assert_allclose(score_k, score_r, rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(var_k, var_r, rtol=1e-4, atol=2e-4)


def test_zncc_warped_kernel_row_tiling():
    """H > 192 exercises the multi-tile grid path (tile_h=128 + padding)."""
    pad = 2
    h, w = 200, 64
    rng = np.random.default_rng(1)
    scan_offsets = ((0, 0), (-2, 1), (1, -2), (2, 2))
    ref_pad = jnp.asarray(rng.random((h + 4, w + 4)), jnp.float32)
    tm = jnp.asarray(rng.random((h, w)), jnp.float32)
    nsq0 = jnp.asarray(rng.random((h, w)) + 0.1, jnp.float32)
    warped_pad = jnp.asarray(rng.random((2, h + 4, w + 4)), jnp.float32)
    valid_pad = jnp.ones((2, h + 4, w + 4), jnp.float32)
    hw = jnp.full((h, w), 2.0, jnp.float32)
    acc = jnp.zeros((2, 4, h, w), jnp.float32)

    score_k, var_k = zncc_warped_pallas(ref_pad, tm, nsq0, warped_pad,
                                        valid_pad, hw, acc, scan_offsets,
                                        pad, interpret=True)
    score_r, var_r = _jnp_reference(ref_pad, tm, nsq0, warped_pad, valid_pad,
                                    hw, acc, scan_offsets, pad)
    assert score_k.shape == (2, h, w)
    np.testing.assert_allclose(score_k, score_r, rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(var_k, var_r, rtol=1e-4, atol=2e-4)
