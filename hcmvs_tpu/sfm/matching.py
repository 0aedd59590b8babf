"""Descriptor matching on the MXU.

Replaces OpenMVG's CPU matcher (ref: frame_main/MvgMvsPipeline.py:187-189
openMVG_main_ComputeMatches): a (K, 128) x (128, K) similarity matmul is
exactly what the systolic array is built for, followed by Lowe's ratio
test and mutual-best cross-checking — all dense ops, no trees/ANN needed
at on-device K.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class Matches(NamedTuple):
    idx: jax.Array     # (K,) best match in image B for each keypoint of A
    valid: jax.Array   # (K,) passed ratio + mutual check
    score: jax.Array   # (K,) cosine similarity of the best match


@partial(jax.jit, static_argnames=("ratio",))
def match_descriptors(desc_a: jax.Array, desc_b: jax.Array,
                      valid_a: jax.Array, valid_b: jax.Array,
                      ratio: float = 0.8) -> Matches:
    """Mutual-best ratio-test matching between two descriptor sets.

    desc_*: (K, 128) L2-normalized; valid_*: (K,) bool masks for padded
    keypoint slots.
    """
    sim = jnp.dot(desc_a, desc_b.T,
                  preferred_element_type=jnp.float32)       # (Ka, Kb)
    sim = jnp.where(valid_a[:, None] & valid_b[None, :], sim, -2.0)

    # top-2 per row for the ratio test (on distance: d^2 = 2 - 2 sim)
    top2, top2_idx = jax.lax.top_k(sim, 2)
    best = top2[:, 0]
    second = top2[:, 1]
    d1 = jnp.sqrt(jnp.maximum(2.0 - 2.0 * best, 0.0))
    d2 = jnp.sqrt(jnp.maximum(2.0 - 2.0 * second, 1e-12))
    ratio_ok = d1 < ratio * d2

    # mutual best
    best_b_for_a = top2_idx[:, 0]
    best_a_for_b = jnp.argmax(sim, axis=0)                  # (Kb,)
    mutual = best_a_for_b[best_b_for_a] == jnp.arange(sim.shape[0])

    valid = ratio_ok & mutual & valid_a & (best > -1.0)
    return Matches(idx=best_b_for_a, valid=valid, score=best)
