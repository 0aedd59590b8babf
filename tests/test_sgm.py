import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hcmvs_tpu.core.camera import Camera
from hcmvs_tpu.dense.sgm import (census_transform, hamming_distance,
                                 sgm_aggregate, sgm_match)
from hcmvs_tpu.dense.types import make_view_geometry

from synthetic import make_plane_scene


def test_census_and_hamming():
    img = jnp.asarray(np.random.default_rng(0).random((16, 20),
                                                      dtype=np.float32))
    c = census_transform(img)
    assert c.dtype == jnp.uint32
    # identical images -> zero distance
    d = hamming_distance(c, c)
    assert float(d.max()) == 0.0
    # a shifted image has nonzero distance
    c2 = census_transform(jnp.roll(img, 3, axis=1))
    assert float(hamming_distance(c, c2).mean()) > 1.0


def test_sgm_aggregate_smooths():
    rng = np.random.default_rng(1)
    # noisy volume with a clear per-pixel winner at depth 5
    d, h, w = 16, 12, 18
    vol = rng.random((d, h, w)).astype(np.float32) * 2
    vol[5] -= 1.5
    agg = np.asarray(sgm_aggregate(jnp.asarray(vol)))
    assert (agg.argmin(0) == 5).mean() > 0.95


def test_sgm_recovers_plane_depth():
    sc = make_plane_scene(np.random.default_rng(3), h=48, w=64, n_views=2)
    cams = sc.cameras
    stack = Camera(K=cams[1].K[None], R=cams[1].R[None], C=cams[1].C[None])
    geom = make_view_geometry(cams[0], stack)
    depth, cost = sgm_match(geom, jnp.asarray(sc.images[0]),
                            jnp.asarray(sc.images[1]),
                            jnp.asarray(sc.d_min), jnp.asarray(sc.d_max),
                            n_depths=128)
    d = np.asarray(depth)
    interior = np.s_[8:-8, 8:-8]
    valid = d[interior] > 0
    rel = np.abs(d[interior] - sc.depth_gt[interior]) / sc.depth_gt[interior]
    assert valid.mean() > 0.7
    # SGM with fronto-parallel sweeps is the coarse path (the
    # reference uses it as a rough alternative mode); slanted
    # surfaces carry a window-level bias
    assert np.median(rel[valid]) < 0.05


def test_normals_from_depth_plane():
    """Depth-gradient normals on a slanted plane match the GT normal
    (ref: EstimateNormalMap, DepthMap.cpp:2272)."""
    import jax.numpy as jnp
    from hcmvs_tpu.ops.gradients import normals_from_depth
    from hcmvs_tpu.dense.types import pixel_rays
    from hcmvs_tpu.utils.synth import make_plane_scene
    sc = make_plane_scene(np.random.default_rng(2), h=48, w=64, n_views=2)
    K_inv = jnp.asarray(np.linalg.inv(sc.cameras[0].K), jnp.float32)
    rays = pixel_rays(K_inv, 48, 64)
    n = np.asarray(normals_from_depth(jnp.asarray(sc.depth_gt), rays))
    gt = sc.normal_gt / np.linalg.norm(sc.normal_gt)
    inner = n[:, 4:-4, 4:-4]
    cos = np.abs((inner * gt[:, None, None]).sum(0))
    assert np.median(cos) > 0.999


def test_sgm_scene_driver():
    """--fusion-mode -1 path: per-view SGM maps + normals over a scene."""
    import jax
    import jax.numpy as jnp
    from hcmvs_tpu.core.camera import Camera
    from hcmvs_tpu.dense.scene_driver import SceneTensors
    from hcmvs_tpu.dense.sgm import sgm_scene
    from hcmvs_tpu.utils.synth import make_plane_scene
    sc = make_plane_scene(np.random.default_rng(4), h=48, w=64, n_views=3)
    cams = Camera(K=jnp.stack([c.K for c in sc.cameras]),
                  R=jnp.stack([c.R for c in sc.cameras]),
                  C=jnp.stack([c.C for c in sc.cameras]))
    nbr = np.array([[j for j in range(3) if j != i][:2]
                    for i in range(3)], np.int32)
    scene = SceneTensors(
        gray=jnp.stack([jnp.asarray(im) for im in sc.images]),
        cams=cams, nbr_idx=jnp.asarray(nbr),
        nbr_valid=jnp.ones((3, 2), bool),
        d_min=jnp.full((3,), sc.d_min, jnp.float32),
        d_max=jnp.full((3,), sc.d_max, jnp.float32))
    depth, normal, conf = sgm_scene(scene, n_depths=48)
    d0 = np.asarray(depth[0])
    inner = np.s_[8:-8, 8:-8]
    valid = d0[inner] > 0
    rel = np.abs(d0[inner] - sc.depth_gt[inner]) / sc.depth_gt[inner]
    assert valid.mean() > 0.5
    assert np.median(rel[valid]) < 0.05


def test_sgm_multi_pair_beats_single_pair():
    """Multi-pair matching + fusion (ref: SemiGlobalMatcher.cpp:530 Match
    per pair, :739 Fuse) must beat the single-best-neighbor map on the
    non-planar ridge scene — the redundancy the method depends on."""
    import jax
    import jax.numpy as jnp
    from hcmvs_tpu.core.camera import Camera
    from hcmvs_tpu.dense.scene_driver import SceneTensors
    from hcmvs_tpu.dense.sgm import sgm_scene
    from hcmvs_tpu.utils.synth import make_ridge_scene
    sc = make_ridge_scene(np.random.default_rng(2), h=64, w=96, n_views=4,
                          spacing=0.25)
    n, v = 4, 3
    cams = Camera(K=jnp.stack([c.K for c in sc.cameras]),
                  R=jnp.stack([c.R for c in sc.cameras]),
                  C=jnp.stack([c.C for c in sc.cameras]))
    nbr = np.array([[j for j in range(n) if j != i][:v]
                    for i in range(n)], np.int32)
    scene = SceneTensors(
        gray=jnp.stack([jnp.asarray(im) for im in sc.images]),
        cams=cams, nbr_idx=jnp.asarray(nbr),
        nbr_valid=jnp.ones((n, v), bool),
        d_min=jnp.full((n,), float(sc.depth_gt.min()) * 0.7,
                       jnp.float32),
        d_max=jnp.full((n,), float(sc.depth_gt.max()) * 1.3,
                       jnp.float32))

    def err(n_pairs):
        depth, _, _ = sgm_scene(scene, n_depths=64, n_pairs=n_pairs)
        d0 = np.asarray(depth[0])
        inner = np.s_[8:-8, 8:-8]
        gt = sc.depth_gt[inner]
        d0 = d0[inner]
        val = d0 > 0
        rel = np.abs(d0 - gt) / gt
        return np.median(rel[val]), val.mean()

    e1, v1 = err(1)
    e3, v3 = err(3)
    # fused multi-pair: equal-or-better accuracy
    assert e3 <= e1 * 1.05, (e3, e1)
    assert v3 > 0.4, v3


def test_sgm_lr_check_kills_occlusion_ghosts():
    """Single-pair mode (--fusion-mode -1, one neighbor) has no fusion
    redundancy; the per-pair left-right cross-check must reject the
    occluded-region ghosts on the box scene (ref: the LR check inside
    SemiGlobalMatcher::Match, SemiGlobalMatcher.cpp:530)."""
    from hcmvs_tpu.core.camera import Camera
    from hcmvs_tpu.dense.scene_driver import SceneTensors
    from hcmvs_tpu.dense.sgm import sgm_scene
    from hcmvs_tpu.utils.synth import make_box_scene
    sc = make_box_scene(np.random.default_rng(5), h=64, w=96, n_views=2)
    n, v = 2, 1
    cams = Camera(K=jnp.stack([c.K for c in sc.cameras]),
                  R=jnp.stack([c.R for c in sc.cameras]),
                  C=jnp.stack([c.C for c in sc.cameras]))
    nbr = np.array([[1], [0]], np.int32)
    scene = SceneTensors(
        gray=jnp.stack([jnp.asarray(im) for im in sc.images]),
        cams=cams, nbr_idx=jnp.asarray(nbr),
        nbr_valid=jnp.ones((n, v), bool),
        d_min=jnp.full((n,), sc.d_min, jnp.float32),
        d_max=jnp.full((n,), sc.d_max, jnp.float32))

    # ground-truth occlusion mask: ref pixels whose GT point the source's
    # own GT depth disagrees with (something nearer blocks the view)
    from hcmvs_tpu.dense.sgm import lr_consistency
    from hcmvs_tpu.dense.types import make_view_geometry
    g01 = make_view_geometry(
        sc.cameras[0], Camera(K=sc.cameras[1].K[None],
                              R=sc.cameras[1].R[None],
                              C=sc.cameras[1].C[None]))
    occl = ~np.asarray(lr_consistency(
        g01, jnp.asarray(sc.depth_gts[0]), jnp.asarray(sc.depth_gts[1]),
        rel_thr=0.01))

    inner = np.s_[6:-6, 6:-6]

    def stats(lr):
        depth, _, _ = sgm_scene(scene, n_depths=64, n_pairs=1,
                                lr_check=lr)
        d0 = np.asarray(depth[0])
        gt = sc.depth_gts[0]
        val = d0 > 0
        ghost = val & (np.abs(d0 - gt) / gt > 0.05)
        g_rate = ghost[inner].sum() / max(val[inner].sum(), 1)
        occl_emit = (val & occl)[inner].mean()   # estimates in occlusion
        return g_rate, occl_emit, val[inner].mean()

    g_no, occ_no, v_no = stats(False)
    g_lr, occ_lr, v_lr = stats(True)
    # the check must stop emitting estimates in the occluded band and
    # cut the overall outlier fraction, while keeping most genuinely
    # consistent pixels
    assert occ_lr < occ_no * 0.35, (occ_no, occ_lr)
    assert g_lr < g_no * 0.75, (g_no, g_lr)
    assert v_lr > 0.5, v_lr
