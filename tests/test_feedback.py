"""Model-feedback occlusion masking / flow correction (flow/feedback.py).

Synthetic check of the smear-band mechanism: corrupt a band of an
otherwise exact RS flow field (the photoconsistent-but-wrong failure no
local detector catches), run the estimation, and verify the feedback pass
(a) flags the band as model-outlier, (b) replaces its flow with a
rigid-model prediction close to ground truth via inlier-anchored depth
inpainting.
"""

import numpy as np
import jax
import jax.numpy as jnp

from rs_sfm_tpu.config import PipelineConfig
from rs_sfm_tpu.flow.feedback import model_feedback
from rs_sfm_tpu.geom.camera import Intrinsics
from rs_sfm_tpu.solver.beta import get_alpha, get_alpha_k
from rs_sfm_tpu.solver.flow_model import predict_flow
from rs_sfm_tpu.solver.pipeline import estimate_from_flow

H, W, F = 96, 128, 110.0
GAMMA = 0.9


def _gt_flow(v, w, depth):
    intr = Intrinsics(fx=F, fy=F, cx=W / 2.0, cy=H / 2.0)
    ys, xs = np.meshgrid(np.arange(H, dtype=np.float64),
                         np.arange(W, dtype=np.float64), indexing="ij")
    coords = jnp.asarray(
        np.stack([(xs - intr.cx) / F, (ys - intr.cy) / F], -1).reshape(-1, 2),
        jnp.float32)
    rho = (1.0 / depth).reshape(-1)
    fl = jnp.zeros((H * W, 2), jnp.float32)
    for _ in range(6):
        a = jnp.asarray(get_alpha(fl[:, 1] * F, H, GAMMA), jnp.float32)
        ak = jnp.asarray(get_alpha_k(ys.reshape(-1), fl[:, 1] * F, H, GAMMA),
                         jnp.float32)
        fl = predict_flow(coords, rho, v, w, 0.0, a, ak)
    return intr, (fl * F).reshape(H, W, 2)


def test_feedback_recovers_corrupted_band():
    rng = np.random.default_rng(3)
    v = jnp.asarray([0.03, -0.01, 0.02], jnp.float32)
    w = jnp.asarray([0.002, -0.001, 0.003], jnp.float32)
    # Smooth depth so inpainting from neighbors is meaningful.
    base = rng.uniform(4.0, 8.0, (H // 8 + 1, W // 8 + 1))
    depth = jnp.asarray(
        np.kron(base, np.ones((8, 8)))[:H, :W], jnp.float32)
    intr, gt = _gt_flow(v, w, depth)

    # Corrupt a vertical band with a coherent wrong flow (smear analog).
    band = np.zeros((H, W), bool)
    band[:, 48:60] = True
    corrupted = np.asarray(gt).copy()
    corrupted[band] += np.asarray([6.0, -3.0], np.float32)
    corrupted = jnp.asarray(corrupted)

    cfg = PipelineConfig(ransac_trials=64, ransac_tol=0.01,
                         refine_iterations=20, refine_starts=2)
    res = estimate_from_flow(corrupted, intr, GAMMA, cfg,
                             jax.random.PRNGKey(0))
    fb = model_feedback(corrupted, jnp.zeros((H, W), bool), res, intr,
                        GAMMA, cfg)

    # The (6, -3) px corruption is nearly EPIPOLAR-CONSISTENT here (the
    # per-pixel free depth absorbs the along-A·v component), so the band
    # survives RANSAC as inliers at a wrong depth — the realistic smear
    # mechanism.  The depth-coherence peel must catch it.
    flagged = np.asarray(fb.outlier | fb.depth_outlier)
    assert flagged[band].mean() > 0.9, flagged[band].mean()
    assert flagged[~band].mean() < 0.1, flagged[~band].mean()

    epe_before = np.linalg.norm(np.asarray(corrupted) - np.asarray(gt),
                                axis=-1)
    epe_after = np.linalg.norm(np.asarray(fb.flow) - np.asarray(gt),
                               axis=-1)
    # The corrected band flow comes from the rigid model with inpainted
    # depth: sub-pixel instead of 6.7 px.
    assert epe_before[band].mean() > 6.0
    assert epe_after[band].mean() < 1.0, epe_after[band].mean()
    # Untouched pixels keep their flow.
    assert epe_after[~band].max() < 0.3


def test_estimate_with_feedback_config_pass():
    """cfg.feedback_passes (r5, VERDICT item 2): the config-level feedback
    pass must (a) equal the single pass when 0, (b) tighten the motion
    estimate on the corrupted-band scene in BOTH re-estimation modes, and
    (c) keep the warm-start "refine" mode's jit path working."""
    from rs_sfm_tpu.eval.metrics import translation_error
    from rs_sfm_tpu.solver.pipeline import estimate_with_feedback

    rng = np.random.default_rng(5)
    v = jnp.asarray([0.03, -0.01, 0.02], jnp.float32)
    w = jnp.asarray([0.002, -0.001, 0.003], jnp.float32)
    base = rng.uniform(4.0, 8.0, (H // 8 + 1, W // 8 + 1))
    depth = jnp.asarray(
        np.kron(base, np.ones((8, 8)))[:H, :W], jnp.float32)
    intr, gt = _gt_flow(v, w, depth)
    band = np.zeros((H, W), bool)
    band[:, 40:56] = True
    corrupted = np.asarray(gt).copy()
    corrupted[band] += np.asarray([6.0, -3.0], np.float32)
    corrupted = jnp.asarray(corrupted)

    base_cfg = dict(ransac_trials=64, ransac_tol=0.01,
                    refine_iterations=20, refine_starts=2,
                    refine_loss_delta_px=3.0)
    cfg0 = PipelineConfig(**base_cfg)
    key = jax.random.PRNGKey(0)
    res0 = estimate_with_feedback(corrupted, intr, GAMMA, cfg0, key)
    res0_direct = estimate_from_flow(corrupted, intr, GAMMA, cfg0, key)
    np.testing.assert_array_equal(np.asarray(res0.v),
                                  np.asarray(res0_direct.v))

    err0 = float(translation_error(res0.v, v))
    for mode in ("refine", "full"):
        cfg1 = PipelineConfig(**base_cfg, feedback_passes=1,
                              feedback_mode=mode)
        res1 = jax.jit(
            lambda f, k, c=cfg1: estimate_with_feedback(
                f, intr, GAMMA, c, k))(corrupted, key)
        err1 = float(translation_error(res1.v, v))
        # The corrupted band biases the first pass; the feedback pass
        # excludes it and must not be worse (and is measurably better
        # when the first-pass error is non-trivial).
        assert err1 <= err0 + 1e-4, (mode, err0, err1)
        assert err1 < 0.02, (mode, err1)


def test_feedback_revote_and_cost_levers():
    """Round-5 wrap-up levers (ROADMAP 1b / item 4):

      * top_v/top_w/top_k export: row 0 is the final model; multi-start
        estimation exposes the J winnow-stage refined candidates;
      * the basin re-vote + decimated inpainting + reduced warm-refine
        iterations must hold the corrupted-band accuracy of the full-cost
        configuration (they exist to cut cost / revisit selection, not to
        change converged results);
      * all three are jit-safe together (the production graph).
    """
    from rs_sfm_tpu.eval.metrics import translation_error
    from rs_sfm_tpu.solver.pipeline import estimate_with_feedback

    rng = np.random.default_rng(7)
    v = jnp.asarray([0.03, -0.01, 0.02], jnp.float32)
    w = jnp.asarray([0.002, -0.001, 0.003], jnp.float32)
    base = rng.uniform(4.0, 8.0, (H // 8 + 1, W // 8 + 1))
    depth = jnp.asarray(
        np.kron(base, np.ones((8, 8)))[:H, :W], jnp.float32)
    intr, gt = _gt_flow(v, w, depth)
    band = np.zeros((H, W), bool)
    band[:, 40:56] = True
    corrupted = np.asarray(gt).copy()
    corrupted[band] += np.asarray([6.0, -3.0], np.float32)
    corrupted = jnp.asarray(corrupted)

    base_cfg = dict(ransac_trials=64, ransac_tol=0.01,
                    refine_iterations=20, refine_starts=3,
                    refine_winnow_iters=8, refine_loss_delta_px=3.0)
    key = jax.random.PRNGKey(0)

    # Candidate export contract (single estimation, multi-start).
    res_ms = estimate_from_flow(corrupted, intr, GAMMA,
                                PipelineConfig(**base_cfg), key)
    assert res_ms.top_v.shape == (4, 3)   # final + J winnow-stage models
    assert res_ms.top_k.shape == (4,)
    np.testing.assert_array_equal(np.asarray(res_ms.top_v[0]),
                                  np.asarray(res_ms.v))

    slow = PipelineConfig(**base_cfg, feedback_passes=2,
                          feedback_mode="refine", feedback_revote=False,
                          feedback_fast_inpaint=False)
    fast = PipelineConfig(**base_cfg, feedback_passes=2,
                          feedback_mode="refine", feedback_revote=True,
                          feedback_fast_inpaint=True,
                          feedback_refine_iterations=8)
    res_slow = estimate_with_feedback(corrupted, intr, GAMMA, slow, key)
    res_fast = jax.jit(
        lambda f, k: estimate_with_feedback(f, intr, GAMMA, fast, k))(
            corrupted, key)
    err_slow = float(translation_error(res_slow.v, v))
    err_fast = float(translation_error(res_fast.v, v))
    assert err_fast < 0.02, err_fast
    assert err_fast <= err_slow + 5e-3, (err_slow, err_fast)
    # Warm path result exposes the single exported model.
    assert res_fast.top_v.shape[0] == 1
