"""Pre-warm the persistent compilation cache for the tunneled TPU.

First-ever compiles of the flagship graphs take minutes over the
remote-compile tunnel (bench.py historically 10-18 min cold).  Every
entry point in the repo sets `jax_compilation_cache_dir=.jax_cache`, so
compiles persist across processes; this script simply compiles the
flagship graph set once so every later process — bench.py, the stress
scripts, the CLI — starts from a warm cache.  Run it once per
machine/toolchain change:

  PYTHONPATH=/root/repo:/root/.axon_site timeout 7200 \
      python scripts/prewarm.py

Cold-start after prewarm is dominated by cache deserialization
(measured in TPU_VALIDATION.md).
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _make_flow
    from rs_sfm_tpu.config import PipelineConfig
    from rs_sfm_tpu.flow.dense import DenseFlowConfig, flow_forward_backward
    from rs_sfm_tpu.geom.camera import Intrinsics
    from rs_sfm_tpu.geom.rspose import scanline_poses
    from rs_sfm_tpu.models import get_flow_preset
    from rs_sfm_tpu.rectify.backproject import backproject
    from rs_sfm_tpu.solver.pipeline import estimate_with_feedback

    h, w = 1080, 1920
    intr = Intrinsics(fx=1803.3, fy=1799.4, cx=945.3, cy=544.7)
    flow = jnp.asarray(_make_flow(h, w))
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0.1, 0.9, (h, w, 3)).astype(np.float32))

    jobs = []
    # Production flow presets (forward+backward+occlusion).
    for name, fc in [
        ("flow plain", DenseFlowConfig(warp_engine="pallas",
                                       sor_engine="pallas",
                                       backward_scale=2)),
        ("flow robust", get_flow_preset("robust", warp_engine="pallas",
                                        sor_engine="pallas")),
    ]:
        jobs.append((name, jax.jit(
            lambda a, b, c=fc: flow_forward_backward(a, b, c).flow.sum()),
            (img, img)))
    # Solver configurations (bench GT-flow path + the gated production
    # estimated-flow config incl. the model-feedback passes — keep these
    # in lockstep with bench.py / tests/test_fullhd_flow.py EST_CFG).
    for name, cfg in [
        ("solver bench", PipelineConfig(
            ransac_trials=256, ransac_chunk=32, refine_iterations=20,
            refine_rel_tol=0.0, refine_engine="pallas",
            ransac_engine="pallas")),
        ("solver production", PipelineConfig(
            ransac_trials=256, ransac_chunk=32, ransac_tol=0.02,
            refine_iterations=20, refine_rel_tol=0.0, refine_starts=4,
            refine_winnow_iters=8, depth_residual_px=2.0,
            refine_loss_delta_px=3.0, feedback_passes=2,
            feedback_mode="refine", feedback_refine_iterations=8,
            refine_engine="pallas", ransac_engine="pallas")),
    ]:
        def run(f, k, c=cfg):
            res = estimate_with_feedback(f, intr, 0.9, c, k)
            r, t = scanline_poses(res.v, res.w, res.k, h, 0.9,
                                  dtype=jnp.float32)
            rect = backproject(img, res.depth_map, r, t, intr)
            return res.v.sum() + rect.gs_image.sum()

        jobs.append((name, jax.jit(run),
                     (flow, jax.random.PRNGKey(0))))

    for name, fn, args in jobs:
        t0 = time.time()
        float(fn(*args))
        print(f"[prewarm] {name}: {time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
