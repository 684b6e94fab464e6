"""Evaluation harness (evaluateVelocities protocol)."""

import numpy as np
import jax
import jax.numpy as jnp

from rs_sfm_tpu.config import PipelineConfig
from rs_sfm_tpu.data.dataset import PairData, FrameData
from rs_sfm_tpu.data.synthetic import (castle_scene, default_intrinsics,
                                       render_pair)
from rs_sfm_tpu.eval.harness import evaluate_velocities

H = W = 64


def _pair_data():
    scene = castle_scene(dtype=jnp.float64)
    intr = default_intrinsics(H, W)
    pair = render_pair(scene, intr, H, W, gamma=0.9, k=0.0,
                       v=np.array([0.12, -0.05, 0.08]),
                       w=np.array([0.003, -0.002, 0.004]),
                       dtype=jnp.float64)

    def fd(fr):
        return FrameData(
            rs_image=np.asarray(fr.rs_image),
            gs_image=np.asarray(fr.gs_image), depth_image=None,
            poses_r=np.asarray(fr.poses_r), poses_t=np.asarray(fr.poses_t),
            rs_unproject=np.asarray(fr.rs_unproject),
            gs_unproject=np.asarray(fr.gs_unproject))

    return PairData(frame1=fd(pair.frame1), frame2=fd(pair.frame2),
                    intrinsics=intr, gamma=0.9, k=0.0,
                    v=np.asarray(pair.v), w=np.asarray(pair.w))


def test_evaluate_velocities(tmp_path):
    pair = _pair_data()
    cfg = PipelineConfig(ransac_trials=32, ransac_tol=0.01,
                         refine_iterations=20)
    errs = evaluate_velocities(pair, cfg, num_evaluations=2,
                               key=jax.random.PRNGKey(0),
                               image_path=str(tmp_path))
    assert errs.w.shape == (3, 2)
    assert errs.v.shape == (3, 2)
    assert errs.error_w < 1e-3
    assert errs.error_v < 0.02
    assert np.isfinite(errs.error_reproject)
    assert errs.error_reproject < 0.2
    assert (errs.num_inliers > 0.4 * H * W).all()
    # Depth-map artifacts written per run.
    assert (tmp_path / "depth_0.png").exists()
    assert (tmp_path / "depth_1.png").exists()
