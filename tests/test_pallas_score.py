"""Pallas fused RANSAC scorer vs the XLA reference implementation.

Runs in Pallas interpret mode on CPU; the compiled path is exercised on the
real TPU by the benchmark.
"""

import numpy as np
import jax
import jax.numpy as jnp

from rs_sfm_tpu.ops.pallas.score import (pack_hyps, pack_pixels,
                                         score_hypotheses_pallas, TILE)
from rs_sfm_tpu.solver.ransac import _score_hypotheses


import pytest


@pytest.mark.parametrize("t", [16, 40])
def test_pallas_scorer_matches_xla(t):
    rng = np.random.default_rng(0)
    n = TILE * 2
    coords = jnp.asarray(rng.normal(scale=0.3, size=(n, 2)), jnp.float32)
    flow = jnp.asarray(rng.normal(scale=0.01, size=(n, 2)), jnp.float32)
    alpha = jnp.asarray(1.0 + rng.normal(scale=0.01, size=n), jnp.float32)
    alpha_k = jnp.asarray(0.5 + rng.normal(scale=0.05, size=n), jnp.float32)
    valid = jnp.asarray(rng.uniform(size=n) > 0.1)
    v = jnp.asarray(rng.normal(size=(t, 3)), jnp.float32)
    w = jnp.asarray(rng.normal(scale=0.01, size=(t, 3)), jnp.float32)
    k = jnp.asarray(rng.uniform(-0.5, 1.5, size=t), jnp.float32)

    tol = 0.05
    num_ref, err_ref, _, _ = _score_hypotheses(
        coords, flow, alpha, alpha_k, valid, v, w, k, tol)

    px = pack_pixels(coords, flow, alpha, alpha_k, valid)
    hy = pack_hyps(v, w, k)
    num_p, err_p = score_hypotheses_pallas(px, hy, tol, interpret=True)

    np.testing.assert_array_equal(np.asarray(num_p, np.int32),
                                  np.asarray(num_ref))
    np.testing.assert_allclose(np.asarray(err_p), np.asarray(err_ref),
                               rtol=1e-4, atol=1e-5)
