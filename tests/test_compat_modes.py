"""Reference-compatibility flags behave as documented."""

import numpy as np
import jax.numpy as jnp

from rs_sfm_tpu.geom.camera import Intrinsics, normalize_flow, space_to_plane
from rs_sfm_tpu.geom.rspose import relocate_poses, scanline_poses
from rs_sfm_tpu.solver.beta import get_alpha, get_alpha_k
from rs_sfm_tpu.solver.flow_model import predict_flow
from rs_sfm_tpu.solver.minimal import calculate_velocities


def test_fy_compat_reproduces_fx_bug():
    intr = Intrinsics(fx=500.0, fy=450.0, cx=320.0, cy=240.0)
    p = jnp.asarray([1.0, 2.0, 4.0])
    fixed = space_to_plane(p, intr)
    bug = space_to_plane(p, intr, use_fy=False)
    # x identical; y uses f_x in compat mode (src/rsframe.cc:639).
    assert float(fixed[0]) == float(bug[0])
    np.testing.assert_allclose(float(bug[1]), 2.0 / 4.0 * 500.0 + 240.0)
    np.testing.assert_allclose(float(fixed[1]), 2.0 / 4.0 * 450.0 + 240.0)


def test_gamma_scaled_flow_compat():
    intr = Intrinsics(fx=500.0, fy=500.0, cx=0.0, cy=0.0)
    flow_px = jnp.asarray([[10.0, -5.0]])
    ours = normalize_flow(flow_px, intr)
    ref = normalize_flow(flow_px, intr, gamma=0.8)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(ours) * 0.8)


def test_compat_negate_k_flips_sign():
    rng = np.random.default_rng(3)
    h = 600
    gamma = 0.9
    px = rng.uniform(50, 550, size=(9, 2))
    coords = jnp.asarray((px - 300.0) / 520.0)
    v = jnp.asarray([0.02, -0.01, 0.015])
    w = jnp.asarray([0.004, -0.002, 0.008])
    rho = 1.0 / jnp.asarray(rng.uniform(3.0, 9.0, size=9))
    k_true = 0.5
    alpha = jnp.ones(9)
    alpha_k = jnp.zeros(9)
    for _ in range(100):
        u = predict_flow(coords, rho, v, w, k_true, alpha, alpha_k)
        fpy = u[:, 1] * 520.0 / gamma
        alpha = get_alpha(fpy, h, gamma)
        alpha_k = get_alpha_k(jnp.asarray(px[:, 1]), fpy, h, gamma)
    _, _, k_math = calculate_velocities(coords, u, alpha, alpha_k, True)
    _, _, k_ref = calculate_velocities(coords, u, alpha, alpha_k, True,
                                       compat_negate_k=True)
    np.testing.assert_allclose(float(k_ref), -float(k_math), rtol=1e-9)


def test_relocate_skip_first_row_compat():
    v = jnp.asarray([0.1, -0.2, 0.3])
    w = jnp.asarray([0.01, 0.02, -0.01])
    r, t = scanline_poses(v, w, 0.0, 10, 0.9, dtype=jnp.float64)
    # Give scanline 0 a nontrivial absolute pose.
    t = t + jnp.asarray([1.0, 2.0, 3.0])
    r_fix, t_fix = relocate_poses(r, t)
    r_cmp, t_cmp = relocate_poses(r, t, skip_first_row=True)
    np.testing.assert_allclose(np.asarray(t_fix[0]), 0.0, atol=1e-15)
    # Compat mode leaves scanline 0 at its absolute pose (src/rsframe.cc:960).
    np.testing.assert_allclose(np.asarray(t_cmp[0]), np.asarray(t[0]))
    np.testing.assert_allclose(np.asarray(t_cmp[1:]), np.asarray(t_fix[1:]))
