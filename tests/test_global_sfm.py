"""Tests for the global SfM pipeline (rotation/translation averaging —
the GLOBAL preset analog, ref: MvgMvsPipeline.py:193-195)."""

import numpy as np
import pytest

from hcmvs_tpu.sfm.global_sfm import (global_sfm_from_matches,
                                      rotation_averaging,
                                      translation_averaging)
from hcmvs_tpu.sfm.incremental import SfMConfig

from test_incremental_sfm import (_synthetic_observations, _umeyama_ate,
                                  K_TEST)


def _rand_rot(rng, scale=1.0):
    from hcmvs_tpu.io.nvm import quat_to_rot
    q = np.array([1.0, *rng.normal(0, scale, 3)])
    return quat_to_rot(q / np.linalg.norm(q))


def test_rotation_averaging_exact_and_robust():
    rng = np.random.default_rng(0)
    n = 6
    R_gt = np.stack([np.eye(3)] + [_rand_rot(rng, 0.2) for _ in range(n - 1)])
    pairs, R_rel = [], []
    for i in range(n):
        for j in range(i + 1, n):
            pairs.append((i, j))
            R_rel.append(R_gt[j] @ R_gt[i].T)
    # corrupt one pair completely
    R_rel[3] = _rand_rot(rng, 1.0)
    R_est = rotation_averaging(n, pairs, R_rel)
    # compare up to the global gauge (R_0 = I in both)
    for i in range(n):
        err = np.linalg.norm(R_est[i] - R_gt[i] @ R_gt[0].T)
        assert err < 0.02, (i, err)


def test_translation_averaging_recovers_centers():
    rng = np.random.default_rng(1)
    n = 6
    R_gt = np.stack([_rand_rot(rng, 0.1) for _ in range(n)])
    C_gt = rng.normal(0, 1.0, (n, 3))
    pairs, t_rel = [], []
    for i in range(n):
        for j in range(i + 1, n):
            pairs.append((i, j))
            # t_ij maps cam_i->cam_j: t = -R_j (C_j - C_i) up to scale
            t = -R_gt[j] @ (C_gt[j] - C_gt[i])
            t_rel.append(t / np.linalg.norm(t) * rng.uniform(0.5, 2.0))
    C_est = translation_averaging(n, pairs, R_gt, t_rel)
    ate, _ = _umeyama_ate(C_gt, C_est)
    assert ate.max() < 0.02, ate


def test_global_sfm_recovers_trajectory():
    rng = np.random.default_rng(5)
    xy, pair_matches, gt_C, X_gt = _synthetic_observations(rng)
    cfg = SfMConfig(min_matches=20)
    result = global_sfm_from_matches(xy, pair_matches, K_TEST, len(xy), cfg)
    assert len(result.poses) == len(xy)
    assert result.reproj_rms < 1.5
    est_C = np.stack([result.poses[i][1] for i in sorted(result.poses)])
    ate, _ = _umeyama_ate(gt_C, est_C)
    assert ate.max() < 0.02, ate


def test_pose_eval_harness():
    """MvgOptimizeSfM analog: good poses -> sub-pixel frozen-pose RMS and
    tiny ATE; corrupted poses -> both degrade."""
    from hcmvs_tpu.eval.pose_eval import ate, structure_from_known_poses
    rng = np.random.default_rng(7)
    xy, pair_matches, gt_C, X_gt = _synthetic_observations(
        rng, mismatch_frac=0.0)
    cfg = SfMConfig(min_matches=20)
    res = global_sfm_from_matches(xy, pair_matches, K_TEST, len(xy), cfg)
    est_C = np.stack([res.poses[i][1] for i in sorted(res.poses)])
    stats = ate(est_C, gt_C)
    assert stats["rmse"] < 0.01
    rms = structure_from_known_poses(res, K_TEST)
    assert rms < 1.0
    # corrupt one pose: frozen-pose RMS must degrade
    bad = {k: (v[0], v[1] + (0.3 if k == 2 else 0.0)) for k, v in
           res.poses.items()}
    import dataclasses
    res_bad = dataclasses.replace(res, poses=bad)
    rms_bad = structure_from_known_poses(res_bad, K_TEST)
    assert rms_bad > 2 * rms
