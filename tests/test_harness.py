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


def _pair_data(size=None):
    h = w = size or H
    scene = castle_scene(dtype=jnp.float64)
    intr = default_intrinsics(h, w)
    pair = render_pair(scene, intr, h, w, gamma=0.9, k=0.0,
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


def test_evaluate_velocities_robust_flow_path(tmp_path):
    """flow_cfg + forward-backward occlusion masking reach the pipeline
    through the harness (round-1 gap: eval/harness.py dropped both)."""
    from rs_sfm_tpu.models import get_flow_preset

    pair = _pair_data(size=128)
    # Estimated flow at 128px is a low-SNR regime (mean flow ~2.8px, EPE
    # ~0.5px): more trials + a noise-matched tolerance are required for the
    # RANSAC winner to land in the right basin of the translation/rotation
    # ambiguity.
    cfg = PipelineConfig(ransac_trials=256, ransac_tol=0.005,
                         refine_iterations=20)
    flow_cfg = get_flow_preset("variational")
    errs = evaluate_velocities(pair, cfg, num_evaluations=1,
                               use_deep_flow=True,
                               flow_cfg=flow_cfg, use_occlusion_mask=True,
                               key=jax.random.PRNGKey(0))
    assert np.isfinite(errs.error_v) and np.isfinite(errs.error_w)
    # Dense flow (EPE ~0.5 px at 128px) must still recover the motion
    # direction; the FB-occlusion mask (~10% of pixels) caps inliers.
    assert errs.error_v < 0.25
    assert (errs.num_inliers > 0.2 * 128 * 128).all()
    assert (errs.num_inliers < 0.95 * 128 * 128).all()


def test_evaluate_velocities_pixel_mask():
    """An explicit pixel mask excludes pixels from estimation: masking the
    bottom half must still recover the motion (GT-flow path)."""
    pair = _pair_data()
    cfg = PipelineConfig(ransac_trials=32, ransac_tol=0.01,
                         refine_iterations=20)
    mask = np.zeros((H, W), bool)
    mask[: H // 2] = True
    errs = evaluate_velocities(pair, cfg, num_evaluations=1,
                               pixel_mask=mask,
                               key=jax.random.PRNGKey(0))
    assert errs.error_v < 0.05
    assert (errs.num_inliers <= mask.sum()).all()
