"""Pallas-accelerated Schur-LM refinement driver.

Same objective, update rule, damping, and accept/reject logic as
solver.refine.refine, but each LM iteration runs as two fused Pallas kernels
(ops/pallas/refine_kernels.py) that read the packed pixel state once per
phase.  Float32 only (the TPU production path); the f64 XLA implementation
remains the parity reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rs_sfm_tpu.ops import linalg
from rs_sfm_tpu.ops.pallas.refine_kernels import TILE, lm_reduce, lm_update
from rs_sfm_tpu.solver.refine import RefineResult


def refine_pallas(
    coords,
    flow,
    alpha,
    alpha_k,
    mask,
    v0,
    w0,
    k0,
    rho0,
    *,
    optimize_k: bool,
    iterations: int = 50,
    init_lambda: float = 1e-6,
    rel_tol: float = 1e-8,
    interpret: bool = False,
) -> RefineResult:
    """Drop-in Pallas variant of solver.refine.refine (single device)."""
    n = coords.shape[0]
    pad = (-n) % TILE

    def p(x):
        return jnp.pad(jnp.asarray(x, jnp.float32), ((0, pad),))

    px = jnp.stack([
        p(coords[:, 0]), p(coords[:, 1]), p(flow[:, 0]), p(flow[:, 1]),
        p(alpha), p(alpha_k), p(mask.astype(jnp.float32)), p(rho0),
    ])
    k_keep = jnp.float32(1.0 if optimize_k else 0.0)

    def make_params(v, w, k, lam, delta=None):
        delta = jnp.zeros(7, jnp.float32) if delta is None else delta
        return jnp.concatenate([
            v, w, k[None], lam[None], k_keep[None], delta]).astype(jnp.float32)

    def step(state):
        i, px, v, w, k, lam, cost, done = state
        params = make_params(v, w, k, lam)
        h_tt, g_t, _, schur_h, schur_g = lm_reduce(px, params,
                                                   interpret=interpret)
        diag = jnp.diagonal(h_tt)
        h_aug = h_tt + jnp.diag(lam * (diag + 1e-12))
        h_aug = h_aug.at[6, 6].add(1.0 - k_keep)
        h_red = h_aug - schur_h
        g_red = g_t - schur_g
        delta = linalg.solve_pd_nopivot(h_red, -g_red)

        params_b = make_params(v, w, k, lam, delta)
        rho_new, cost_new = lm_update(px, params_b, interpret=interpret)

        accept = (cost_new < cost) & jnp.isfinite(cost_new)
        converged = accept & (cost - cost_new <= rel_tol * cost)
        v = jnp.where(accept, v + delta[:3], v)
        w = jnp.where(accept, w + delta[3:6], w)
        k = jnp.where(accept, k + delta[6], k)
        px = jnp.where(accept, px.at[7, :].set(rho_new), px)
        cost = jnp.where(accept, cost_new, cost)
        lam = jnp.where(accept, jnp.maximum(lam / 3.0, 1e-12),
                        lam * 4.0).astype(jnp.float32)
        return i + 1, px, v, w, k, lam, cost, done | converged

    v = jnp.asarray(v0, jnp.float32)
    w = jnp.asarray(w0, jnp.float32)
    k = jnp.asarray(k0, jnp.float32)
    lam = jnp.asarray(init_lambda, jnp.float32)
    # Initial cost from phase A (its cost slot is exact at delta = 0).
    _, _, cost0, _, _ = lm_reduce(px, make_params(v, w, k, lam),
                                  interpret=interpret)

    def cond(state):
        return (state[0] < iterations) & ~state[-1]

    init = (jnp.int32(0), px, v, w, k, lam, cost0, jnp.bool_(False))
    if rel_tol == 0.0:
        # Static trip count (no early stop): fori_loop compiles leaner.
        _, px, v, w, k, lam, cost, _ = jax.lax.fori_loop(
            0, iterations, lambda _, s: step(s), init)
    else:
        _, px, v, w, k, lam, cost, _ = jax.lax.while_loop(cond, step, init)
    rho = px[7, :n]
    return RefineResult(v=v, w=w, k=k, inv_depth=rho, cost=cost,
                        initial_cost=cost0)
