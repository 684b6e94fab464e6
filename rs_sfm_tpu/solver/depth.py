"""Per-pixel inverse-depth estimation in closed form.

The reference solves this with Ceres: one AutoDiff residual block per pixel,
(v, w, k) frozen, DENSE_SCHUR (src/nonlinearRefinement.cc:109-180).  But the
residual  r(ρ) = u − β(A·v·ρ + B·w)  is *linear* in ρ, so the least-squares
optimum is closed form:

    ρ* = ⟨g, u − β·B·w⟩ / ⟨g, g⟩,    g = β·A·v

— the exact minimum Ceres iterates toward, obtained in a handful of fused
elementwise ops per pixel.  This turns the reference's dominant cost (one
Ceres solve over every pixel per RANSAC trial, ~20 s/trial at full-HD —
report.pdf §5.5) into a bandwidth-bound elementwise pass that runs for
thousands of hypotheses at once.
"""

from __future__ import annotations

import jax.numpy as jnp

from rs_sfm_tpu.solver.beta import beta_factor
from rs_sfm_tpu.solver.flow_model import rotational_flow, translational_flow


def estimate_inverse_depth(coords, flow, v, w, k, alpha, alpha_k):
    """Closed-form least-squares inverse depth per pixel.

    Args:
      coords: (..., 2) normalized coordinates.
      flow:   (..., 2) normalized (γ-scaled) flow.
      v, w:   (..., 3) (broadcast against pixel axes).
      k:      (...,) acceleration factor (broadcast).
      alpha, alpha_k: (...,) RS factors per pixel.

    Returns:
      (...,) inverse depths ρ*.  Pixels where the translational flow
      direction vanishes (‖β·A·v‖ → 0) return 0 — those pixels carry no
      depth information (the reference's Ceres leaves its ρ = 1 init there;
      such pixels score as outliers either way).
    """
    rho, _ = estimate_inverse_depth_info(coords, flow, v, w, k,
                                         alpha, alpha_k)
    return rho


def estimate_inverse_depth_info(coords, flow, v, w, k, alpha, alpha_k):
    """Like estimate_inverse_depth, but also returns the informative mask
    (True where ‖β·A·v‖ > 0, i.e. the pixel actually constrains ρ)."""
    beta = beta_factor(alpha, alpha_k, k)
    g = beta[..., None] * translational_flow(coords, v)  # (..., 2)
    rhs = flow - beta[..., None] * rotational_flow(coords, w)  # (..., 2)
    gg = jnp.sum(g * g, axis=-1)
    gr = jnp.sum(g * rhs, axis=-1)
    informative = gg != 0.0
    safe = jnp.where(informative, gg, jnp.ones_like(gg))
    return jnp.where(informative, gr / safe, jnp.zeros_like(gr)), informative
