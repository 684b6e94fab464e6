"""Sliding-window video processing with fault isolation."""

import numpy as np
import jax
import jax.numpy as jnp

from rs_sfm_tpu.config import PipelineConfig
from rs_sfm_tpu.data.synthetic import (castle_scene, default_intrinsics,
                                       render_pair)
from rs_sfm_tpu.flow.true_flow import true_flow
from rs_sfm_tpu.video import accumulate_trajectory, estimate_video

H = W = 64
GAMMA = 0.9
V = np.array([0.12, -0.05, 0.08])
WR = np.array([0.003, -0.002, 0.004])


def _flows(n_pairs=3, poison=None):
    scene = castle_scene(dtype=jnp.float64)
    intr = default_intrinsics(H, W)
    pair = render_pair(scene, intr, H, W, gamma=GAMMA, k=0.0, v=V, w=WR,
                       dtype=jnp.float64)
    f = true_flow(pair.frame1.rs_unproject, pair.frame2.poses_r,
                  pair.frame2.poses_t, intr)
    flows = jnp.stack([f] * n_pairs)
    if poison is not None:
        flows = flows.at[poison].set(0.0)
    return flows, intr


def test_video_batch():
    flows, intr = _flows(3)
    cfg = PipelineConfig(ransac_trials=32, ransac_tol=0.01,
                         refine_iterations=20)
    res = estimate_video(flows, intr, GAMMA, cfg, jax.random.PRNGKey(0))
    assert bool(res.ok.all())
    v_unit = V / np.linalg.norm(V)
    for p in range(3):
        ang = np.arccos(np.clip(
            np.asarray(res.v[p]) @ v_unit / np.linalg.norm(res.v[p]), -1, 1))
        assert ang < 0.05


def test_video_fault_isolation():
    """A degenerate (zero-flow) pair must not poison the batch."""
    flows, intr = _flows(3, poison=1)
    cfg = PipelineConfig(ransac_trials=32, ransac_tol=0.01,
                         refine_iterations=20)
    res = estimate_video(flows, intr, GAMMA, cfg, jax.random.PRNGKey(0))
    ok = np.asarray(res.ok)
    assert ok[0] and ok[2] and not ok[1]
    assert np.isfinite(np.asarray(res.v)).all()
    np.testing.assert_array_equal(np.asarray(res.v[1]), 0.0)

    r, t = accumulate_trajectory(res, GAMMA, H)
    assert r.shape == (4, 3, 3) and t.shape == (4, 3)
    assert np.isfinite(np.asarray(r)).all()
    # Pose holds across the poisoned pair.
    np.testing.assert_allclose(np.asarray(r[2]), np.asarray(r[1]), atol=1e-12)
