"""Render the adversarial flow-probe scenes (VERDICT r4 #8).

Two full-HD probes targeting the discrete-matching term's known failure
families (the reference's example-4 regime):

  reptex     castle geometry with STRICTLY PERIODIC wall texture
             (repetitive_scene): every period-shifted displacement is a
             perfect photometric match for the SSD matcher;
  bigmotion  clean castle at 1.7x the stress translation: median rigid
             displacement > 200 px (beyond the r3 probe regime).

Writes stress-cache-compatible npz files so scripts/flow_variants.py can
evaluate them with --scenes reptex,bigmotion.  CPU + f64 (render
precision), like stress_fullhd.py --phase render.
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

H, W = 1080, 1920
GAMMA = 0.9
V = np.array([0.35, -0.15, 0.25])
WR = np.array([0.003, -0.002, 0.004])


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from rs_sfm_tpu.data.dataset import true_depth_from_unprojection
    from rs_sfm_tpu.data.synthetic import (castle_scene, default_intrinsics,
                                           render_pair, repetitive_scene)
    from rs_sfm_tpu.flow.true_flow import true_flow

    intr = default_intrinsics(H, W)
    cache = os.path.join(REPO, "results", "stress_cache")
    os.makedirs(cache, exist_ok=True)

    jobs = {
        "reptex": (repetitive_scene(dtype=jnp.float64), V, WR),
        "bigmotion": (castle_scene(dtype=jnp.float64), V * 1.7, WR),
    }
    for name, (scene, v, w) in jobs.items():
        path = os.path.join(cache, f"stress_{H}x{W}_{name}_v2.npz")
        if os.path.exists(path):
            print("have", path)
            continue
        pair = render_pair(scene, intr, H, W, gamma=GAMMA, k=0.0, v=v,
                           w=w, dtype=jnp.float64)
        gt = true_flow(pair.frame1.rs_unproject, pair.frame2.poses_r,
                       pair.frame2.poses_t, intr)
        td = true_depth_from_unprojection(
            np.asarray(pair.frame1.rs_unproject),
            np.asarray(pair.frame1.poses_r),
            np.asarray(pair.frame1.poses_t))
        mover = pair.frame1.mover_mask
        np.savez_compressed(
            path,
            i1=np.asarray(pair.frame1.rs_image, np.float32),
            i2=np.asarray(pair.frame2.rs_image, np.float32),
            gt_flow=np.asarray(gt, np.float32),
            mover=(np.zeros((H, W), bool) if mover is None
                   else np.asarray(mover)),
            v=v, w=w,
            poses_r=np.asarray(pair.frame1.poses_r, np.float32),
            poses_t=np.asarray(pair.frame1.poses_t, np.float32),
            true_depth=np.asarray(td, np.float32))
        mags = np.linalg.norm(np.asarray(gt), axis=-1)
        mm = mags[mags > 0]
        print(f"[render] {name}: flow median {np.median(mm):.0f} px, "
              f"max {mm.max():.0f} px", flush=True)


if __name__ == "__main__":
    main()
