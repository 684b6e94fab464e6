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
