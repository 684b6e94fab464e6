"""Differential RS flow model u = β(k)·(A(x)·v·ρ + B(x)·w) (report eq. 5-12).

With normalized coordinates x = (x, y), inverse depth ρ = 1/Z:

  A = [[1, 0, -x],            B = [[-x·y, 1+x², -y],
       [0, 1, -y]]                 [-(1+y²), x·y,  x]]

This is the prediction used for RANSAC inlier scoring
(src/minimal.cc:255-275) and — with opposite grouping of signs — the Ceres
residual (src/nonlinearRefinement.cc:32-52); both reduce to the identical
expression.  All functions broadcast elementwise over pixel batches.
"""

from __future__ import annotations

import jax.numpy as jnp

from rs_sfm_tpu.solver.beta import beta_factor


def flow_basis(coords):
    """A·v and B·w contraction helpers.

    Args:
      coords: (..., 2) normalized coordinates.

    Returns:
      (a, b): a (..., 2, 3) with a @ v = A v; b (..., 2, 3) with b @ w = B w.
    """
    x, y = coords[..., 0], coords[..., 1]
    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)
    a = jnp.stack(
        [
            jnp.stack([one, zero, -x], axis=-1),
            jnp.stack([zero, one, -y], axis=-1),
        ],
        axis=-2,
    )
    b = jnp.stack(
        [
            jnp.stack([-x * y, 1.0 + x * x, -y], axis=-1),
            jnp.stack([-(1.0 + y * y), x * y, x], axis=-1),
        ],
        axis=-2,
    )
    return a, b


def translational_flow(coords, v):
    """A(x)·v (..., 2): image motion per unit inverse depth."""
    x, y = coords[..., 0], coords[..., 1]
    vx, vy, vz = v[..., 0], v[..., 1], v[..., 2]
    return jnp.stack([vx - x * vz, vy - y * vz], axis=-1)


def rotational_flow(coords, w):
    """B(x)·w (..., 2): rotation-induced image motion."""
    x, y = coords[..., 0], coords[..., 1]
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    return jnp.stack(
        [
            -x * y * wx + (1.0 + x * x) * wy - y * wz,
            -(1.0 + y * y) * wx + x * y * wy + x * wz,
        ],
        axis=-1,
    )


def predict_flow(coords, inv_depth, v, w, k, alpha, alpha_k):
    """u_est = β(k)·(A·v·ρ + B·w) (src/minimal.cc:259-266)."""
    beta = beta_factor(alpha, alpha_k, k)
    trans = translational_flow(coords, v)
    rot = rotational_flow(coords, w)
    return beta[..., None] * (trans * inv_depth[..., None] + rot)


def flow_residual(coords, flow, inv_depth, v, w, k, alpha, alpha_k):
    """r = u_observed − u_est, the Ceres residual
    (src/nonlinearRefinement.cc:48-49)."""
    return flow - predict_flow(coords, inv_depth, v, w, k, alpha, alpha_k)
