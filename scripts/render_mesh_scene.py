"""Render the mesh-grade castle at full-HD with exact GT (CPU, f64).

Writes results/stress_cache/stress_1080x1920_mesh_v2.npz in the same
format as scripts/stress_fullhd.py's cache so the protocol scripts can
consume it (VERDICT r4 item 7: the figure-4-style protocol on mesh-grade
geometry; table in ACCURACY.md).
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

H, W = 1080, 1920
V = np.array([0.35, -0.15, 0.25])
WR = np.array([0.003, -0.002, 0.004])
GAMMA = 0.9


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from rs_sfm_tpu.data.dataset import true_depth_from_unprojection
    from rs_sfm_tpu.data.synthetic import (castle_mesh_scene,
                                           default_intrinsics, render_pair)
    from rs_sfm_tpu.flow.true_flow import true_flow

    path = os.path.join(REPO, "results", "stress_cache",
                        f"stress_{H}x{W}_mesh_v2.npz")
    if os.path.exists(path):
        print("exists:", path)
        return
    intr = default_intrinsics(H, W)
    pair = render_pair(castle_mesh_scene(dtype=jnp.float64), intr, H, W,
                       gamma=GAMMA, k=0.0, v=V, w=WR, dtype=jnp.float64)
    gt = true_flow(pair.frame1.rs_unproject, pair.frame2.poses_r,
                   pair.frame2.poses_t, intr)
    td = true_depth_from_unprojection(
        np.asarray(pair.frame1.rs_unproject),
        np.asarray(pair.frame1.poses_r),
        np.asarray(pair.frame1.poses_t))
    np.savez_compressed(
        path,
        i1=np.asarray(pair.frame1.rs_image, np.float32),
        i2=np.asarray(pair.frame2.rs_image, np.float32),
        gt_flow=np.asarray(gt, np.float32),
        mover=np.zeros((H, W), bool), v=V, w=WR,
        poses_r=np.asarray(pair.frame1.poses_r, np.float32),
        poses_t=np.asarray(pair.frame1.poses_t, np.float32),
        true_depth=np.asarray(td, np.float32))
    print("wrote", path)


if __name__ == "__main__":
    main()
