"""End-to-end pipeline driver: images -> SfM -> dense -> mesh -> texture.

The analog of the reference's MvgMvsPipeline.py 16-step orchestration
(ref: frame_main/MvgMvsPipeline.py:180-229 — OpenMVG SfM steps 0-9, then
DensifyPointCloud / ReconstructMesh / RefineMesh / TextureMesh), with the
process-per-step + file handoff replaced by in-memory flow; `.mvs`/.dmap/
PLY/OBJ artifacts are still written at each stage boundary for interop
and resumability (the reference's own checkpoint style, SURVEY §5.4).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

import jax

from hcmvs_tpu.core.config import DenseConfig
from hcmvs_tpu.io.mvs import write_mvs
from hcmvs_tpu.io.ply import write_ply_mesh
from hcmvs_tpu.sfm.incremental import SfMConfig, incremental_sfm, \
    sfm_to_scene


def run_pipeline(images: List[np.ndarray], K: np.ndarray, out_dir: str,
                 sfm_cfg: Optional[SfMConfig] = None,
                 dense_cfg: Optional[DenseConfig] = None,
                 with_mesh: bool = True, with_texture: bool = True,
                 preset: str = "SEQUENTIAL", fusion_mode: int = 0,
                 verbose: bool = True) -> Dict:
    """Run the full reconstruction from grayscale images + intrinsics.

    ``preset``: "SEQUENTIAL" (incremental SfM) or "GLOBAL" (rotation +
    translation averaging) — the reference's MvgMvsPipeline presets
    (ref: MvgMvsPipeline.py:116-122).  ``fusion_mode``: 0 = PatchMatch
    densification; -1/-2 = the SGM stereo path (the MVS_SGM preset,
    MvgMvsPipeline.py:119 / SceneDensify.cpp:3899-3911).
    """
    os.makedirs(out_dir, exist_ok=True)
    dense_cfg = dense_cfg or DenseConfig()
    h, w = images[0].shape[:2]

    # --- SfM (steps 0-9) ---
    if preset.upper() == "GLOBAL":
        from hcmvs_tpu.sfm.global_sfm import global_sfm
        result = global_sfm(images, K, sfm_cfg, verbose=verbose)
    else:
        result = incremental_sfm(images, K, sfm_cfg, verbose=verbose)
    names = [f"im{i:04d}" for i in range(len(images))]
    scene = sfm_to_scene(result, K, names, w, h)
    scene_path = os.path.join(out_dir, "scene.mvs")
    write_mvs(scene_path, scene)

    # --- dense (step 10) ---
    from hcmvs_tpu.dense.fusion import compact_point_cloud, fuse_point_cloud
    from hcmvs_tpu.dense.scene_driver import estimate_scene, finalize
    from hcmvs_tpu.pipeline.densify import build_scene_tensors
    import jax.numpy as jnp
    reg = sorted(result.poses)
    grays = [images[i] for i in reg]
    tensors = build_scene_tensors(scene, grays, dense_cfg)
    if fusion_mode < 0:
        from hcmvs_tpu.dense.sgm import sgm_scene
        depth, normal, conf = sgm_scene(tensors)
    else:
        state = estimate_scene(jax.random.PRNGKey(0), tensors, dense_cfg,
                               verbose=verbose)
        depth, normal, conf = finalize(state, dense_cfg)
    priority = jnp.arange(len(reg), dtype=jnp.float32)
    fused = fuse_point_cloud(depth, normal, conf, tensors.cams,
                             tensors.nbr_idx, tensors.nbr_valid, priority,
                             dense_cfg)
    cloud = compact_point_cloud(fused)
    from hcmvs_tpu.io.ply import write_ply_points
    write_ply_points(os.path.join(out_dir, "scene_dense.ply"),
                     cloud["points"], cloud["normals"])
    out = {"sfm": result, "cloud": cloud, "depth": np.asarray(depth)}

    if with_mesh and len(cloud["points"]) >= 50:
        # --- mesh (steps 11-12) ---
        from hcmvs_tpu.mesh.delaunay import reconstruct_mesh
        from hcmvs_tpu.mesh.mesh_ops import clean_mesh
        keep = np.asarray(fused["keep"])
        owner = np.nonzero(keep.reshape(len(reg), -1))[0]
        centers = np.stack([result.poses[i][1] for i in reg])
        mesh = reconstruct_mesh(cloud["points"], centers, owner)
        mv, mf = clean_mesh(mesh.vertices, mesh.faces,
                            min_component_faces=10)
        write_ply_mesh(os.path.join(out_dir, "scene_mesh.ply"), mv, mf)
        out["mesh"] = (mv, mf)

        if with_texture and len(mf) > 0:
            # --- texture (step 13) ---
            from hcmvs_tpu.mesh.texture import texture_mesh, \
                write_textured_obj
            Ks = np.tile(K[None], (len(reg), 1, 1))
            Rs = np.stack([result.poses[i][0] for i in reg])
            tm = texture_mesh(mv, mf, grays, Ks, Rs, centers)
            write_textured_obj(os.path.join(out_dir,
                                            "scene_textured.obj"), tm)
            out["textured"] = tm
    return out
