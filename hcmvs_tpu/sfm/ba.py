"""Bundle adjustment: Gauss-Newton / LM with an explicit Schur complement.

Replaces the incremental BA inside OpenMVG (ref: MvgMvsPipeline.py:190-192
openMVG_main_IncrementalSfM, which uses Ceres on CPU).  TPU-first shape:

- Per-observation reprojection Jacobians come from ``jax.jacfwd`` of the
  single-observation residual, vmapped over all observations at once.
- The point blocks (3x3) are eliminated analytically; their contributions
  to the reduced camera system are accumulated with ``segment_sum`` /
  scatter-adds over a statically-padded per-point observation table — the
  distributed version replaces these with ``psum`` over point shards
  (SURVEY §2.3).
- The reduced (6C x 6C) system is solved densely with Cholesky: camera
  counts are tiny next to point counts, exactly why Schur wins.

All shapes are static: observations are padded to M slots with a validity
mask, per-point tables to T observations per point.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def rodrigues(rvec: jax.Array) -> jax.Array:
    """(3,) axis-angle -> (3, 3) rotation.

    Smooth (autodiff-safe) formulation: R = I + sinc(t) K + c(t) K^2 with
    the *unnormalized* skew — the normalized-axis form has a NaN gradient
    at rvec = 0 (d||v||/dv), which silently poisons Gauss-Newton steps
    that start at the identity.
    """
    t2 = jnp.sum(rvec ** 2)
    theta = jnp.sqrt(t2 + 1e-16)
    a = jnp.sin(theta) / theta
    b = (1.0 - jnp.cos(theta)) / (t2 + 1e-16)
    K = jnp.array([[0.0, -rvec[2], rvec[1]],
                   [rvec[2], 0.0, -rvec[0]],
                   [-rvec[1], rvec[0], 0.0]])
    return jnp.eye(3) + a * K + b * (K @ K)


def rotation_to_rvec(R: np.ndarray) -> np.ndarray:
    """Host-side inverse Rodrigues."""
    cos_t = np.clip((np.trace(R) - 1.0) / 2.0, -1.0, 1.0)
    theta = np.arccos(cos_t)
    if theta < 1e-8:
        return np.zeros(3)
    axis = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0],
                     R[1, 0] - R[0, 1]]) / (2.0 * np.sin(theta))
    return axis * theta


class BAProblem(NamedTuple):
    """Static-shape BA problem (host-assembled)."""

    K: jax.Array            # (C, 3, 3) fixed intrinsics
    obs_cam: jax.Array      # (M,) int32
    obs_pt: jax.Array       # (M,) int32
    obs_uv: jax.Array       # (M, 2)
    obs_valid: jax.Array    # (M,) bool
    pt_table: jax.Array     # (P, T) int32 indices into obs arrays
    pt_table_valid: jax.Array  # (P, T) bool
    fixed_cams: jax.Array   # (C,) bool — gauge fixing


class BAState(NamedTuple):
    rvecs: jax.Array        # (C, 3)
    tvecs: jax.Array        # (C, 3)  (world->cam: X_c = R X + t)
    points: jax.Array       # (P, 3)


def build_problem(K, obs_cam, obs_pt, obs_uv, n_points,
                  fixed_cams, max_obs_per_point: int = 16) -> BAProblem:
    """Host-side assembly of the padded observation tables."""
    obs_cam = np.asarray(obs_cam, np.int32)
    obs_pt = np.asarray(obs_pt, np.int32)
    obs_uv = np.asarray(obs_uv, np.float32)
    m = len(obs_cam)
    T = max_obs_per_point
    pt_table = np.zeros((n_points, T), np.int32)
    pt_valid = np.zeros((n_points, T), bool)
    counts = np.zeros(n_points, np.int32)
    for o in range(m):
        j = obs_pt[o]
        if counts[j] < T:
            pt_table[j, counts[j]] = o
            pt_valid[j, counts[j]] = True
            counts[j] += 1
    return BAProblem(
        K=jnp.asarray(K, jnp.float32),
        obs_cam=jnp.asarray(obs_cam), obs_pt=jnp.asarray(obs_pt),
        obs_uv=jnp.asarray(obs_uv),
        obs_valid=jnp.ones(m, bool),
        pt_table=jnp.asarray(pt_table),
        pt_table_valid=jnp.asarray(pt_valid),
        fixed_cams=jnp.asarray(np.asarray(fixed_cams, bool)))


def _residual_one(K, rvec, tvec, X, uv):
    R = rodrigues(rvec)
    Xc = R @ X + tvec
    z = jnp.where(jnp.abs(Xc[2]) < 1e-9, 1e-9, Xc[2])
    u = (K[0, 0] * Xc[0] + K[0, 1] * Xc[1]) / z + K[0, 2]
    v = K[1, 1] * Xc[1] / z + K[1, 2]
    return jnp.stack([u, v]) - uv


def _huber_weight(r2: jax.Array, delta: float) -> jax.Array:
    r = jnp.sqrt(jnp.maximum(r2, 1e-18))
    return jnp.where(r <= delta, 1.0, delta / r)


@partial(jax.jit, static_argnames=("huber_delta",))
def ba_cost(problem: BAProblem, state: BAState,
            huber_delta: float = 4.0) -> jax.Array:
    def res(o_cam, o_pt, o_uv):
        return _residual_one(problem.K[o_cam], state.rvecs[o_cam],
                             state.tvecs[o_cam], state.points[o_pt], o_uv)

    r = jax.vmap(res)(problem.obs_cam, problem.obs_pt, problem.obs_uv)
    r2 = jnp.sum(r ** 2, axis=-1)
    w = _huber_weight(r2, huber_delta)
    rho = jnp.where(jnp.sqrt(r2) <= huber_delta, r2,
                    2 * huber_delta * jnp.sqrt(r2) - huber_delta ** 2)
    return jnp.sum(rho * problem.obs_valid)


@partial(jax.jit, static_argnames=("huber_delta",))
def ba_step(problem: BAProblem, state: BAState, lam: jax.Array,
            huber_delta: float = 4.0) -> BAState:
    """One damped Gauss-Newton step via Schur elimination of the points."""
    C = state.rvecs.shape[0]
    P = state.points.shape[0]

    def res_jac(o_cam, o_pt, o_uv):
        def f(cam6, X):
            return _residual_one(problem.K[o_cam], cam6[:3], cam6[3:],
                                 X, o_uv)
        cam6 = jnp.concatenate([state.rvecs[o_cam], state.tvecs[o_cam]])
        X = state.points[o_pt]
        r = f(cam6, X)
        Jc, Jp = jax.jacfwd(f, argnums=(0, 1))(cam6, X)
        return r, Jc, Jp

    r, Jc, Jp = jax.vmap(res_jac)(problem.obs_cam, problem.obs_pt,
                                  problem.obs_uv)     # (M,2) (M,2,6) (M,2,3)
    w = _huber_weight(jnp.sum(r ** 2, -1), huber_delta)
    w = w * problem.obs_valid
    # zero out fixed cameras' jacobians (gauge)
    free = ~problem.fixed_cams[problem.obs_cam]
    Jc = Jc * free[:, None, None]

    wJc = Jc * w[:, None, None]
    wJp = Jp * w[:, None, None]
    U = jax.ops.segment_sum(jnp.einsum("mri,mrj->mij", wJc, Jc),
                            problem.obs_cam, C)        # (C, 6, 6)
    V = jax.ops.segment_sum(jnp.einsum("mri,mrj->mij", wJp, Jp),
                            problem.obs_pt, P)         # (P, 3, 3)
    Wm = jnp.einsum("mri,mrj->mij", wJc, Jp)           # (M, 6, 3)
    bc = -jax.ops.segment_sum(jnp.einsum("mri,mr->mi", wJc, r),
                              problem.obs_cam, C)      # (C, 6)
    bp = -jax.ops.segment_sum(jnp.einsum("mri,mr->mi", wJp, r),
                              problem.obs_pt, P)       # (P, 3)

    # damp + invert point blocks (LM: scale-aware diagonal damping)
    diagV = jnp.maximum(jax.vmap(jnp.diag)(V), 1e-6)    # (P, 3)
    V = V + lam * jax.vmap(jnp.diag)(diagV)
    V_inv = jnp.linalg.inv(V + 1e-9 * jnp.eye(3)[None])

    # Schur: S = U + lam*diag - sum_j W_aj V_j^-1 W_bj^T
    tbl = problem.pt_table                              # (P, T)
    tblv = problem.pt_table_valid
    W_j = Wm[tbl] * tblv[..., None, None]               # (P, T, 6, 3)
    cam_j = problem.obs_cam[tbl]                        # (P, T)
    WV = jnp.einsum("ptij,pjk->ptik", W_j, V_inv)       # (P, T, 6, 3)
    # pairwise contributions (P, T, T, 6, 6)
    contrib = jnp.einsum("ptik,pskj->ptsij", WV,
                         jnp.swapaxes(W_j, -1, -2))
    S = jnp.zeros((C, C, 6, 6))
    S = S.at[cam_j[:, :, None], cam_j[:, None, :]].add(-contrib)
    S = S.at[jnp.arange(C), jnp.arange(C)].add(U)
    # LM damping on the camera blocks
    diagU = jax.vmap(jnp.diag)(U)
    S = S.at[jnp.arange(C), jnp.arange(C)].add(
        lam * jax.vmap(jnp.diag)(jnp.maximum(diagU, 1e-6)))
    # fixed cameras: identity rows
    eye6 = jnp.eye(6)
    fixed = problem.fixed_cams
    S = jnp.where(fixed[:, None, None, None], 0.0, S)
    S = jnp.where(fixed[None, :, None, None], 0.0, S)
    S = S.at[jnp.arange(C), jnp.arange(C)].add(
        fixed[:, None, None] * eye6[None])

    # rhs_c' = bc - sum_j W V^-1 bp
    rhs_red = jnp.einsum("ptik,pk->pti", WV, bp)        # (P, T, 6)
    rhs_c = bc.at[cam_j.reshape(-1)].add(
        -rhs_red.reshape(-1, 6) * tblv.reshape(-1)[:, None])
    rhs_c = jnp.where(fixed[:, None], 0.0, rhs_c)

    # dense solve of the reduced system
    Sd = jnp.transpose(S, (0, 2, 1, 3)).reshape(6 * C, 6 * C)
    dc = jnp.linalg.solve(Sd + 1e-9 * jnp.eye(6 * C),
                          rhs_c.reshape(-1)).reshape(C, 6)

    # back-substitute points: dp_j = V^-1 (bp - sum_i W_ij^T dc_i)
    dc_obs = dc[problem.obs_cam]                        # (M, 6)
    Wt_dc = jnp.einsum("mij,mi->mj", Wm, dc_obs)        # (M, 3)
    acc = jax.ops.segment_sum(Wt_dc, problem.obs_pt, P)
    dp = jnp.einsum("pij,pj->pi", V_inv, bp - acc)

    return BAState(rvecs=state.rvecs + dc[:, :3],
                   tvecs=state.tvecs + dc[:, 3:],
                   points=state.points + dp)


def run_ba(problem: BAProblem, state: BAState, n_iters: int = 20,
           init_lambda: float = 1e-3, verbose: bool = False
           ) -> Tuple[BAState, float]:
    """LM driver (host loop; each trial step is one jitted program)."""
    lam = init_lambda
    cost = float(ba_cost(problem, state))
    for it in range(n_iters):
        trial = ba_step(problem, state, jnp.float32(lam))
        new_cost = float(ba_cost(problem, trial))
        if new_cost < cost:
            state = trial
            cost = new_cost
            lam = max(lam * 0.5, 1e-8)
        else:
            lam = min(lam * 4.0, 1e4)
        if verbose:
            print(f"[ba] iter {it} cost {cost:.4f} lam {lam:.1e}")
        if lam >= 1e4:
            break
    return state, cost
