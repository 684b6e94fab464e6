"""Pallas Schur-LM refinement vs the XLA reference (interpret mode, f32)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rs_sfm_tpu.solver.beta import get_alpha, get_alpha_k
from rs_sfm_tpu.solver.flow_model import predict_flow
from rs_sfm_tpu.solver.refine import refine
from rs_sfm_tpu.solver.refine_pallas import refine_pallas


def _problem(n=512, seed=0, k_true=0.3):
    rng = np.random.default_rng(seed)
    f = 500.0
    h = 600
    gamma = 0.9
    px = rng.uniform(0, 599, size=(n, 2))
    coords = jnp.asarray((px - 300.0) / f, jnp.float32)
    v = jnp.asarray([0.02, -0.01, 0.015], jnp.float32)
    w = jnp.asarray([0.004, -0.002, 0.008], jnp.float32)
    rho = jnp.asarray(1.0 / rng.uniform(3.0, 9.0, size=n), jnp.float32)
    alpha = jnp.asarray(
        get_alpha(rng.normal(scale=2.0, size=n), h, gamma), jnp.float32)
    alpha_k = jnp.asarray(
        get_alpha_k(px[:, 1], rng.normal(scale=2.0, size=n), h, gamma),
        jnp.float32)
    flow = predict_flow(coords, rho, v, w, k_true, alpha, alpha_k)
    noise = jnp.asarray(rng.normal(scale=2e-4, size=(n, 2)), jnp.float32)
    return coords, flow + noise, alpha, alpha_k, v, w, rho, k_true


def test_pallas_refine_perturbed_converges():
    """A farther init with weak damping (forces early LM rejections).

    On this gauge-near-singular system the f32 Schur assembly h_tt - S_h
    cancels catastrophically at small lambda, so the XLA-f32 and Pallas
    trajectories legitimately diverge step-to-step (even XLA-f32 is far
    from the f64 delta); what must hold is robust convergence through the
    rejection/re-damping cycle.  Exact rejection algebra is pinned by
    test_lm_step_rejection_reuses_saved_sums."""
    coords, flow, alpha, alpha_k, v, w, rho, k_true = _problem(seed=3)
    n = coords.shape[0]
    mask = jnp.ones(n, dtype=bool)
    v0 = v * 2.0 + 0.01
    w0 = w * 0.0
    k0 = jnp.float32(0.8)
    rho0 = rho * 2.0

    # Production damping: trajectories match the XLA reference tightly.
    a = refine(coords, flow, alpha, alpha_k, mask, v0, w0, k0, rho0,
               optimize_k=True, iterations=40, init_lambda=1e-6)
    b = refine_pallas(coords, flow, alpha, alpha_k, mask, v0, w0, k0, rho0,
                      optimize_k=True, iterations=40, init_lambda=1e-6,
                      interpret=True)
    np.testing.assert_allclose(np.asarray(b.cost), np.asarray(a.cost),
                               rtol=1e-3)
    va = np.asarray(a.v) / np.linalg.norm(a.v)
    vb = np.asarray(b.v) / np.linalg.norm(b.v)
    assert np.arccos(np.clip(abs(va @ vb), -1, 1)) < 2e-3

    # Under-damped start: must stay finite and make strong progress through
    # the rejection/re-damping cycle (trajectory equality is not defined in
    # f32 here).
    c = refine_pallas(coords, flow, alpha, alpha_k, mask, v0, w0, k0, rho0,
                      optimize_k=True, iterations=40, init_lambda=1e-7,
                      interpret=True)
    assert np.isfinite(float(c.cost))
    assert float(c.cost) < 0.05 * float(c.initial_cost)


def test_lm_step_rejection_reuses_saved_sums():
    """Force a rejection: theta must hold, lambda must quadruple, and the
    new delta must equal solving the SAVED sums under the new damping."""
    from rs_sfm_tpu.ops.pallas import refine_kernels as rk

    coords, flow, alpha, alpha_k, v, w, rho, k_true = _problem(n=rk.TILE,
                                                               seed=5)
    n = coords.shape[0]
    mask = jnp.ones(n, dtype=bool)

    def pack(rho0):
        px = jnp.stack([
            coords[:, 0], coords[:, 1], flow[:, 0], flow[:, 1],
            alpha, alpha_k, mask.astype(jnp.float32),
            jnp.zeros(n, jnp.float32)]).astype(jnp.float32)
        return px, jnp.asarray(rho0, jnp.float32)[None, :]

    px, rho_r = pack(rho)
    theta = jnp.concatenate([v, w, jnp.float32(k_true)[None]])
    lam = jnp.float32(1e-4)

    state = jnp.zeros(128, jnp.float32)
    state = state.at[0:7].set(theta).at[7:14].set(theta)
    state = state.at[rk._S_LAM].set(3.0 * lam)
    state = state.at[rk._S_COST].set(jnp.inf)
    state = state.at[rk._S_KKEEP].set(1.0)
    state = state.at[rk._S_ACCEPT].set(1.0)

    # Bootstrap at the true state: accepted, sums saved, delta solved at lam.
    s1, _, _ = rk.lm_iter(state, px, rho_r, rho_r, interpret=True)
    assert float(s1[rk._S_ACCEPT]) == 1.0
    cost_true = float(s1[rk._S_COST])
    sums_saved = np.asarray(s1[rk._S_SUMS:rk._S_SUMS + 71])

    # Hand the kernel a WORSE candidate: rejection must hold theta/cost/sums
    # and re-solve from the saved sums with lambda * 4.
    s1_bad = s1.at[rk._S_CAND:rk._S_CAND + 7].set(theta * 3.0 + 0.1)
    s2, _, _ = rk.lm_iter(s1_bad, px, rho_r, rho_r, interpret=True)
    assert float(s2[rk._S_ACCEPT]) == 0.0
    np.testing.assert_allclose(np.asarray(s2[0:7]), np.asarray(theta),
                               rtol=1e-6)
    np.testing.assert_allclose(float(s2[rk._S_COST]), cost_true, rtol=1e-6)
    np.testing.assert_allclose(float(s2[rk._S_LAM]), float(lam) * 4.0,
                               rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s2[rk._S_SUMS:rk._S_SUMS + 71]), sums_saved, rtol=1e-6)

    # Reference solve of the saved (lambda-independent) sums at lam' = 4 lam.
    lam_new = 4.0 * float(lam)
    scale = 1.0 / (1.0 + lam_new)
    h = np.zeros((7, 7))
    for r in range(7):
        for c in range(7):
            tri = int(rk._TRI_IDX[r, c])
            h[r, c] = sums_saved[tri] - sums_saved[36 + tri] * scale
        h[r, r] += lam_new * (sums_saved[int(rk._TRI_IDX[r, r])] + 1e-12)
    g = np.array([-(sums_saved[28 + r] - sums_saved[64 + r] * scale)
                  for r in range(7)])
    delta_ref = np.linalg.solve(h, g)
    np.testing.assert_allclose(
        np.asarray(s2[rk._S_DELTA:rk._S_DELTA + 7]), delta_ref,
        rtol=2e-4, atol=1e-8)


@pytest.mark.parametrize("optimize_k", [False, True])
def test_pallas_refine_matches_xla(optimize_k):
    coords, flow, alpha, alpha_k, v, w, rho, k_true = _problem()
    n = coords.shape[0]
    mask = jnp.ones(n, dtype=bool)
    # Perturbed init.
    v0 = v * 1.1 + 0.003
    w0 = w * 0.9
    k0 = jnp.float32(k_true if not optimize_k else 0.0)
    rho0 = rho * 1.2

    a = refine(coords, flow, alpha, alpha_k, mask, v0, w0, k0, rho0,
               optimize_k=optimize_k, iterations=25)
    b = refine_pallas(coords, flow, alpha, alpha_k, mask, v0, w0, k0, rho0,
                      optimize_k=optimize_k, iterations=25, interpret=True)
    np.testing.assert_allclose(np.asarray(b.cost), np.asarray(a.cost),
                               rtol=1e-3)
    # (v, rho) carry a free global scale gauge — compare directions.
    va = np.asarray(a.v) / np.linalg.norm(a.v)
    vb = np.asarray(b.v) / np.linalg.norm(b.v)
    assert np.arccos(np.clip(abs(va @ vb), -1, 1)) < 2e-3
    np.testing.assert_allclose(np.asarray(b.w), np.asarray(a.w),
                               rtol=5e-3, atol=2e-5)
    if optimize_k:
        assert abs(float(b.k) - float(a.k)) < 0.05
    # Both should have reduced the cost substantially.
    assert float(a.cost) < 0.5 * float(a.initial_cost)


def test_pallas_refine_multi_matches_per_start():
    """The J-start fused kernel must reproduce per-start single refinement
    exactly (same iteration semantics; the starts only share the pixel
    stream)."""
    coords, flow, alpha, alpha_k, v, w, rho, k_true = _problem(seed=5)
    n = coords.shape[0]
    rng = np.random.default_rng(7)
    j = 3
    masks = jnp.asarray(rng.uniform(size=(j, n)) > 0.2)
    v0 = jnp.asarray(np.asarray(v)[None] * np.asarray([[1.0], [1.4], [0.7]]),
                     jnp.float32)
    w0 = jnp.asarray(np.asarray(w)[None] * np.asarray([[1.0], [0.5], [1.5]]),
                     jnp.float32)
    k0 = jnp.asarray([0.3, 0.1, 0.6], jnp.float32)
    rho0 = jnp.asarray(np.asarray(rho)[None]
                       * rng.uniform(0.8, 1.2, size=(j, 1)), jnp.float32)

    from rs_sfm_tpu.solver.refine_pallas import refine_pallas_multi

    multi = refine_pallas_multi(
        coords, flow, alpha, alpha_k, masks, v0, w0, k0, rho0,
        optimize_k=True, iterations=12, interpret=True)
    for s in range(j):
        single = refine_pallas(
            coords, flow, alpha, alpha_k, masks[s], v0[s], w0[s], k0[s],
            rho0[s], optimize_k=True, iterations=12, interpret=True)
        np.testing.assert_allclose(np.asarray(multi.cost[s]),
                                   np.asarray(single.cost), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(multi.v[s]),
                                   np.asarray(single.v), rtol=1e-5,
                                   atol=1e-7)
        np.testing.assert_allclose(np.asarray(multi.w[s]),
                                   np.asarray(single.w), rtol=1e-5,
                                   atol=1e-7)
        np.testing.assert_allclose(np.asarray(multi.inv_depth[s]),
                                   np.asarray(single.inv_depth), rtol=1e-5,
                                   atol=1e-7)


def test_pipeline_multistart_batched_recovers_motion():
    """estimate_from_flow with refine_starts>1 (the batched multi-start
    path) still recovers the true motion on synthetic flow."""
    from rs_sfm_tpu.config import PipelineConfig
    from rs_sfm_tpu.geom.camera import Intrinsics
    from rs_sfm_tpu.solver.pipeline import estimate_from_flow
    from rs_sfm_tpu.eval.metrics import translation_error

    rng = np.random.default_rng(11)
    h, w_cols, f = 60, 80, 70.0
    intr = Intrinsics(fx=f, fy=f, cx=w_cols / 2.0, cy=h / 2.0)
    gamma = 0.9
    v_t = jnp.asarray([0.02, -0.01, 0.015], jnp.float32)
    w_t = jnp.asarray([0.003, -0.002, 0.004], jnp.float32)
    ys, xs = np.meshgrid(np.arange(h, dtype=np.float64),
                         np.arange(w_cols, dtype=np.float64), indexing="ij")
    coords = jnp.asarray(
        np.stack([(xs - intr.cx) / f, (ys - intr.cy) / f], -1).reshape(-1, 2),
        jnp.float32)
    depth = jnp.asarray(rng.uniform(4.0, 9.0, size=h * w_cols), jnp.float32)
    # alpha fixed point: flow depends on alpha, alpha on pixel flow_y.
    fl = jnp.zeros((h * w_cols, 2), jnp.float32)
    from rs_sfm_tpu.solver.beta import get_alpha, get_alpha_k
    from rs_sfm_tpu.solver.flow_model import predict_flow

    for _ in range(6):
        a = jnp.asarray(get_alpha(fl[:, 1] * f, h, gamma), jnp.float32)
        ak = jnp.asarray(get_alpha_k(ys.reshape(-1), fl[:, 1] * f, h, gamma),
                         jnp.float32)
        fl = predict_flow(coords, 1.0 / depth, v_t, w_t, 0.0, a, ak)
    flow_px = (fl * f).reshape(h, w_cols, 2)
    cfg = PipelineConfig(ransac_trials=64, ransac_tol=0.01,
                         refine_starts=4, refine_iterations=20)
    res = estimate_from_flow(flow_px, intr, gamma, cfg,
                             jax.random.PRNGKey(0))
    assert float(translation_error(res.v, v_t)) < 0.03
    assert float(jnp.linalg.norm(res.w - w_t)) < 1e-3


def test_pipeline_winnow_matches_full_multistart():
    """refine_winnow_iters: the 2-phase (J starts x few iters -> winner
    alone) schedule must land in the same basin as full J x 30 on a
    well-posed problem (basin ranking is stable long before LM
    convergence)."""
    from rs_sfm_tpu.config import PipelineConfig
    from rs_sfm_tpu.solver.pipeline import estimate_from_flow
    from tests.test_pallas_refine import _problem  # noqa: self-import ok

    import numpy as _np
    from rs_sfm_tpu.geom.camera import Intrinsics
    from rs_sfm_tpu.solver.beta import get_alpha, get_alpha_k
    from rs_sfm_tpu.solver.flow_model import predict_flow

    rng = _np.random.default_rng(17)
    h, w_cols, f = 60, 80, 70.0
    intr = Intrinsics(fx=f, fy=f, cx=w_cols / 2.0, cy=h / 2.0)
    v_t = jnp.asarray([0.02, -0.01, 0.015], jnp.float32)
    w_t = jnp.asarray([0.003, -0.002, 0.004], jnp.float32)
    ys, xs = _np.meshgrid(_np.arange(h, dtype=_np.float64),
                          _np.arange(w_cols, dtype=_np.float64),
                          indexing="ij")
    coords = jnp.asarray(_np.stack([(xs - intr.cx) / f, (ys - intr.cy) / f],
                                   -1).reshape(-1, 2), jnp.float32)
    depth = jnp.asarray(rng.uniform(4.0, 9.0, size=h * w_cols), jnp.float32)
    fl = jnp.zeros((h * w_cols, 2), jnp.float32)
    for _ in range(6):
        a = jnp.asarray(get_alpha(fl[:, 1] * f, h, 0.9), jnp.float32)
        ak = jnp.asarray(get_alpha_k(ys.reshape(-1), fl[:, 1] * f, h, 0.9),
                         jnp.float32)
        fl = predict_flow(coords, 1.0 / depth, v_t, w_t, 0.0, a, ak)
    flow_px = (fl * f).reshape(h, w_cols, 2)
    base = PipelineConfig(ransac_trials=64, ransac_tol=0.01,
                          refine_starts=4, refine_iterations=30)
    r_full = estimate_from_flow(flow_px, intr, 0.9, base,
                                jax.random.PRNGKey(0))
    r_win = estimate_from_flow(flow_px, intr, 0.9,
                               base.__class__(**{**base.__dict__,
                                                 "refine_winnow_iters": 8}),
                               jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(r_win.v), np.asarray(r_full.v),
                               rtol=0, atol=2e-4)
    np.testing.assert_allclose(np.asarray(r_win.w), np.asarray(r_full.w),
                               rtol=0, atol=1e-5)


def test_pallas_refine_huber_matches_xla():
    """Huber-IRLS objective: the fused kernel must track the XLA engine
    (same weights, same robust cost in the accept decisions)."""
    coords, flow, alpha, alpha_k, v, w, rho, k_true = _problem(seed=9)
    n = coords.shape[0]
    # Structured outliers: a block of pixels with a coherent wrong flow.
    flow = flow.at[:64].add(jnp.asarray([3e-3, -2e-3], jnp.float32))
    mask = jnp.ones(n, dtype=bool)
    v0 = v * 1.3
    w0 = w * 0.7
    k0 = jnp.float32(0.2)
    rho0 = rho * 1.1
    delta = 1e-3
    a = refine(coords, flow, alpha, alpha_k, mask, v0, w0, k0, rho0,
               optimize_k=True, iterations=25, loss_delta=delta)
    b = refine_pallas(coords, flow, alpha, alpha_k, mask, v0, w0, k0,
                      rho0, optimize_k=True, iterations=25,
                      loss_delta=delta, interpret=True)
    np.testing.assert_allclose(np.asarray(b.cost), np.asarray(a.cost),
                               rtol=1e-3)
    va = np.asarray(a.v) / np.linalg.norm(a.v)
    vb = np.asarray(b.v) / np.linalg.norm(b.v)
    np.testing.assert_allclose(np.abs(va @ vb), 1.0, atol=1e-5)
    # And the robust fit must beat L2 on the outlier-contaminated set:
    # compare against truth.
    l2 = refine(coords, flow, alpha, alpha_k, mask, v0, w0, k0, rho0,
                optimize_k=True, iterations=25)
    vt = np.asarray(v) / np.linalg.norm(np.asarray(v))
    ang = lambda x: np.arccos(np.clip(abs(
        (np.asarray(x) / np.linalg.norm(np.asarray(x))) @ vt), 0, 1))
    assert ang(a.v) <= ang(l2.v) + 1e-6, (ang(a.v), ang(l2.v))
