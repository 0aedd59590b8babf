"""Multi-chip sharding tests on a virtual 8-device CPU mesh.

The driver's dryrun_multichip covers compile+execute; these tests verify
that the sharded computation produces the SAME numbers as single-device
execution (GSPMD inserting collectives must not change semantics)."""

import os

import numpy as np
import pytest

# must be set before the first jax device query; conftest already forces
# the cpu platform
os.environ.setdefault("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax                                                   # noqa: E402
import jax.numpy as jnp                                      # noqa: E402

from hcmvs_tpu.core.camera import Camera                     # noqa: E402
from hcmvs_tpu.core.config import DenseConfig                # noqa: E402
from hcmvs_tpu.dense.scene_driver import (SceneTensors,      # noqa: E402
                                          init_scene_state, scene_sweeps)
from hcmvs_tpu.parallel.sharding import (make_device_mesh,   # noqa: E402
                                         shard_scene)

from synthetic import make_plane_scene                       # noqa: E402


def _tiny_scene(n_views=8, h=32, w=48):
    sc = make_plane_scene(np.random.default_rng(0), h=h, w=w,
                          n_views=n_views)
    cams = Camera(K=jnp.stack([c.K for c in sc.cameras]),
                  R=jnp.stack([c.R for c in sc.cameras]),
                  C=jnp.stack([c.C for c in sc.cameras]))
    v = 2
    nbr = np.array([[j for j in range(n_views) if j != i][:v]
                    for i in range(n_views)], np.int32)
    return SceneTensors(
        gray=jnp.stack([jnp.asarray(im) for im in sc.images]),
        cams=cams, nbr_idx=jnp.asarray(nbr),
        nbr_valid=jnp.ones((n_views, v), bool),
        d_min=jnp.full((n_views,), sc.d_min, jnp.float32),
        d_max=jnp.full((n_views,), sc.d_max, jnp.float32))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.parametrize("n_view,n_tile", [(8, 1), (4, 2)])
def test_sharded_sweeps_match_single_device(n_view, n_tile):
    """scene_sweeps under a (view, tile) mesh == unsharded execution."""
    scene = _tiny_scene()
    cfg = DenseConfig(adapt_half_window=3, patch_half_window=3,
                      patch_step=2, estimation_iters=1, random_iters=1,
                      use_optical_flow=0, use_geo_consistency=1,
                      use_part_consistency=0)
    state0 = init_scene_state(jax.random.PRNGKey(0), scene)

    ref = scene_sweeps(state0, scene, cfg, 0, 1, False)
    ref = scene_sweeps(ref, scene, cfg, 1, 1, True)

    mesh = make_device_mesh(n_view=n_view, n_tile=n_tile)
    scene_s, state_s = shard_scene(scene, state0, mesh)
    with jax.set_mesh(mesh):
        out = scene_sweeps(state_s, scene_s, cfg, 0, 1, False)
        out = scene_sweeps(out, scene_s, cfg, 1, 1, True)

    np.testing.assert_allclose(np.asarray(out.depth),
                               np.asarray(ref.depth), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.cost),
                               np.asarray(ref.cost), rtol=2e-3, atol=2e-3)
