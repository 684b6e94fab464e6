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


def test_video_checkpoint_resume(tmp_path):
    """Windows already checkpointed must be restored, not recomputed: the
    second call sees corrupted flows for window 0 but must return the
    original (checkpointed) result for it."""
    from rs_sfm_tpu.video_ckpt import process_video_checkpointed

    flows, intr = _flows(5)  # 5 pairs, window=2 -> 3 windows (last padded)
    cfg = PipelineConfig(ransac_trials=32, ransac_tol=0.01,
                         refine_iterations=10)
    ckpt = tmp_path / "ckpt"
    res1 = process_video_checkpointed(
        flows, intr, GAMMA, cfg, jax.random.PRNGKey(0),
        ckpt_dir=str(ckpt), window=2)
    assert res1.v.shape == (5, 3)
    assert bool(res1.ok.all())

    # Corrupt the first window's flows; resume must ignore it.
    flows2 = jnp.asarray(np.asarray(flows)).at[0].set(0.0)
    seen = []
    res2 = process_video_checkpointed(
        flows2, intr, GAMMA, cfg, jax.random.PRNGKey(0),
        ckpt_dir=str(ckpt), window=2,
        on_window=lambda wi, r: seen.append(wi))
    assert seen == [0, 1, 2]
    np.testing.assert_allclose(np.asarray(res2.v), np.asarray(res1.v))
    np.testing.assert_allclose(np.asarray(res2.ok), np.asarray(res1.ok))


def test_video_checkpoint_short_tail_window(tmp_path):
    """A tail window smaller than window/2 (5 pairs, window=4 -> tail has 1
    pair, pad=3 > tail size) must pad to the full static window shape; the
    round-1 `zeros_like(fw[:pad])` under-padded exactly this case."""
    from rs_sfm_tpu.video_ckpt import process_video_checkpointed

    flows, intr = _flows(5)
    cfg = PipelineConfig(ransac_trials=32, ransac_tol=0.01,
                         refine_iterations=10)
    res = process_video_checkpointed(
        flows, intr, GAMMA, cfg, jax.random.PRNGKey(0),
        ckpt_dir=str(tmp_path / "ckpt4"), window=4)
    assert res.v.shape == (5, 3)
    assert bool(res.ok.all())
    # The padded tail pair still recovers the true motion direction.
    v_unit = V / np.linalg.norm(V)
    ang = np.arccos(np.clip(
        np.asarray(res.v[4]) @ v_unit / np.linalg.norm(res.v[4]), -1, 1))
    assert ang < 0.05


def test_video_checkpoint_partial_resume(tmp_path):
    """A fresh directory computes everything; interrupting after window 0
    (simulated by a callback exception) resumes at window 1."""
    from rs_sfm_tpu.video_ckpt import process_video_checkpointed

    flows, intr = _flows(4)
    cfg = PipelineConfig(ransac_trials=32, ransac_tol=0.01,
                         refine_iterations=10)
    ckpt = tmp_path / "ckpt2"

    class Stop(Exception):
        pass

    def bomb(wi, r):
        if wi == 0:
            raise Stop()

    try:
        process_video_checkpointed(
            flows, intr, GAMMA, cfg, jax.random.PRNGKey(0),
            ckpt_dir=str(ckpt), window=2, on_window=bomb)
        raise AssertionError("expected Stop")
    except Stop:
        pass

    seen = []
    res = process_video_checkpointed(
        flows, intr, GAMMA, cfg, jax.random.PRNGKey(0),
        ckpt_dir=str(ckpt), window=2,
        on_window=lambda wi, r: seen.append(wi))
    assert seen == [0, 1]
    assert res.v.shape == (4, 3)
    assert bool(res.ok.all())


def test_video_checkpoint_motions_only(tmp_path):
    """save_depth=False: checkpoints carry motions only (orders of
    magnitude smaller), restore fills zero depth maps, and
    recompute_depth_maps reproduces the original depths EXACTLY from
    flow + stored motion (depth is closed-form given both)."""
    from rs_sfm_tpu.video_ckpt import (process_video_checkpointed,
                                       recompute_depth_maps)

    flows, intr = _flows(4)
    cfg = PipelineConfig(ransac_trials=32, ransac_tol=0.01,
                         refine_iterations=10)
    full = tmp_path / "full"
    lean = tmp_path / "lean"
    res_full = process_video_checkpointed(
        flows, intr, GAMMA, cfg, jax.random.PRNGKey(0),
        ckpt_dir=str(full), window=2, save_depth=True)
    res_lean = process_video_checkpointed(
        flows, intr, GAMMA, cfg, jax.random.PRNGKey(0),
        ckpt_dir=str(lean), window=2, save_depth=False)
    np.testing.assert_allclose(np.asarray(res_lean.v),
                               np.asarray(res_full.v))

    def du(p):
        return sum(f.stat().st_size for f in p.rglob("*") if f.is_file())

    assert du(lean) < 0.2 * du(full), (du(lean), du(full))

    # Resume from the lean checkpoints: depth comes back as zeros, then
    # recompute reproduces the full run's maps.
    res3 = process_video_checkpointed(
        flows, intr, GAMMA, cfg, jax.random.PRNGKey(0),
        ckpt_dir=str(lean), window=2, save_depth=False)
    assert float(np.abs(res3.depth_maps).sum()) == 0.0
    depths = recompute_depth_maps(np.asarray(flows), res3, intr, GAMMA,
                                  cfg)
    np.testing.assert_allclose(depths, np.asarray(res_full.depth_maps),
                               rtol=1e-5, atol=1e-5)
