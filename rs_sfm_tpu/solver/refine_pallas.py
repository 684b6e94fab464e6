"""Pallas-accelerated Schur-LM refinement driver.

Same objective, update rule, damping, and accept/reject logic as
solver.refine.refine, but each LM iteration is exactly ONE fused Pallas
kernel (ops/pallas/refine_kernels.lm_iter): depth merge + back-substitution
+ reduction + accept/reject + lambda schedule + in-kernel scalar 7x7 solve.
The loop body contains no XLA ops at all — the whole LM state lives in a
128-float vector produced and consumed by the kernel.  This matters doubly
on remote-TPU runtimes where every extra sequential dispatch has a large
fixed cost.

The iteration is "pipelined": the kernel evaluates the PREVIOUS candidate's
cost (it must sweep the pixels anyway), decides acceptance, and solves for
the next delta in one pass; the reduction sums of the last accepted state
ride along in the state vector (lambda-independent form), so rejected steps
are free.  The sequence of evaluated points, accept decisions, and lambda
updates is identical to solver.refine.refine (the f64-capable parity
reference for Ceres' behavior, src/nonlinearRefinement.cc:183-252).

Float32 only (the TPU production path).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rs_sfm_tpu.ops.pallas.refine_kernels import (TILE, _S_ACCEPT, _S_COST,
                                                  _S_COST0, _S_DONE,
                                                  _S_KKEEP, _S_LAM,
                                                  _S_RELTOL, lm_iter,
                                                  lm_iter_multi)
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
    interpret: bool = None,
    loss_delta: float = 0.0,
) -> RefineResult:
    """Drop-in Pallas variant of solver.refine.refine (single device).

    loss_delta > 0 enables the Huber-IRLS objective (see
    solver/refine.py and refine_kernels._reduce_start).
    interpret None = auto (interpreter on CPU)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = coords.shape[0]
    pad = (-n) % TILE

    def p(x):
        return jnp.pad(jnp.asarray(x, jnp.float32), ((0, pad),))

    px = jnp.stack([
        p(coords[:, 0]), p(coords[:, 1]), p(flow[:, 0]), p(flow[:, 1]),
        p(alpha), p(alpha_k), p(mask.astype(jnp.float32)),
        jnp.zeros(n + pad, jnp.float32),
    ])
    rho = p(rho0)[None, :]  # (1, N_pad)

    theta0 = jnp.concatenate([
        jnp.asarray(v0, jnp.float32), jnp.asarray(w0, jnp.float32),
        jnp.asarray(k0, jnp.float32)[None]])
    state = jnp.zeros(128, jnp.float32)
    state = state.at[0:7].set(theta0).at[7:14].set(theta0)
    # The bootstrap sweep (active = 0: no back-substitution, delta = 0)
    # trivially "accepts" the initial state (cost_prev = inf), dividing
    # lambda by 3; seed 3x the target so the first real solve uses exactly
    # init_lambda.
    state = state.at[_S_LAM].set(3.0 * init_lambda)
    state = state.at[_S_COST].set(jnp.inf)
    state = state.at[_S_KKEEP].set(1.0 if optimize_k else 0.0)
    state = state.at[_S_ACCEPT].set(1.0)
    state = state.at[_S_RELTOL].set(rel_tol)

    def body(carry):
        state, rho_prev, rho_cand = carry
        return lm_iter(state, px, rho_prev, rho_cand, interpret=interpret,
                       loss_delta=loss_delta)

    # iterations + 1 sweeps: the bootstrap evaluates the initial state; each
    # later sweep performs one accept decision + solve.
    init = (state, rho, rho)
    if rel_tol == 0.0:
        # Static trip count (no early stop): fori_loop compiles leaner.
        state, rho_prev, rho_cand = jax.lax.fori_loop(
            0, iterations + 1, lambda _, c: body(c), init)
    else:
        def cond(c):
            i, state = c[0], c[1]
            return (i < iterations + 1) & (state[_S_DONE] < 0.5)

        def body_i(c):
            return (c[0] + 1,) + body(c[1:])

        _, state, rho_prev, rho_cand = jax.lax.while_loop(
            cond, body_i, (jnp.int32(0),) + init)

    accept = state[_S_ACCEPT] > 0.5
    rho_fin = jnp.where(accept, rho_cand, rho_prev)[0, :n]
    return RefineResult(v=state[0:3], w=state[3:6], k=state[6],
                        inv_depth=rho_fin, cost=state[_S_COST],
                        initial_cost=state[_S_COST0])


def refine_pallas_multi(
    coords,
    flow,
    alpha,
    alpha_k,
    masks,
    v0,
    w0,
    k0,
    rho0,
    *,
    optimize_k: bool,
    iterations: int = 50,
    init_lambda: float = 1e-6,
    rel_tol: float = 1e-8,
    interpret: bool = None,
    tile: int = None,
    loss_delta: float = 0.0,
) -> RefineResult:
    """J-start batched Pallas refinement (multi-start, solver.pipeline).

    The J LM problems share the pixel record (coords/flow/alpha) and
    differ only in (mask, theta0, rho0); the fused kernel
    (ops/pallas/refine_kernels.lm_iter_multi) streams the shared pixel
    planes ONCE per iteration for all starts, so J-start wall clock is
    the marginal VPU/MXU work, not J sequential refinements (VERDICT-r3
    weak item 6).

    Args:
      coords, flow: (N, 2); alpha, alpha_k: (N,) — shared.
      masks: (J, N) bool; v0, w0: (J, 3); k0: (J,); rho0: (J, N).

    Returns:
      RefineResult with leading J axis on every field.
    """
    from rs_sfm_tpu.ops.pallas.refine_kernels import TILE_MULTI

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if tile is None:
        tile = TILE_MULTI
    j, n = rho0.shape
    pad = (-n) % tile

    def p(x):
        return jnp.pad(jnp.asarray(x, jnp.float32), ((0, pad),))

    def pj(x):
        return jnp.pad(jnp.asarray(x, jnp.float32), ((0, 0), (0, pad)))

    px = jnp.stack([
        p(coords[:, 0]), p(coords[:, 1]), p(flow[:, 0]), p(flow[:, 1]),
        p(alpha), p(alpha_k),
        jnp.zeros(n + pad, jnp.float32), jnp.zeros(n + pad, jnp.float32),
    ])
    masks_f = pj(masks.astype(jnp.float32))
    rho = pj(rho0)

    theta0 = jnp.concatenate([
        jnp.asarray(v0, jnp.float32), jnp.asarray(w0, jnp.float32),
        jnp.asarray(k0, jnp.float32)[:, None]], axis=-1)  # (J, 7)
    state = jnp.zeros((j, 128), jnp.float32)
    state = state.at[:, 0:7].set(theta0).at[:, 7:14].set(theta0)
    state = state.at[:, _S_LAM].set(3.0 * init_lambda)
    state = state.at[:, _S_COST].set(jnp.inf)
    state = state.at[:, _S_KKEEP].set(1.0 if optimize_k else 0.0)
    state = state.at[:, _S_ACCEPT].set(1.0)
    state = state.at[:, _S_RELTOL].set(rel_tol)

    def body(carry):
        state, rho_prev, rho_cand = carry
        return lm_iter_multi(state, px, masks_f, rho_prev, rho_cand,
                             interpret=interpret, tile=tile,
                             loss_delta=loss_delta)

    init = (state, rho, rho)
    if rel_tol == 0.0:
        state, rho_prev, rho_cand = jax.lax.fori_loop(
            0, iterations + 1, lambda _, c: body(c), init)
    else:
        def cond(c):
            i, state = c[0], c[1]
            return (i < iterations + 1) & jnp.any(state[:, _S_DONE] < 0.5)

        def body_i(c):
            return (c[0] + 1,) + body(c[1:])

        _, state, rho_prev, rho_cand = jax.lax.while_loop(
            cond, body_i, (jnp.int32(0),) + init)

    accept = (state[:, _S_ACCEPT] > 0.5)[:, None]
    rho_fin = jnp.where(accept, rho_cand, rho_prev)[:, :n]
    return RefineResult(v=state[:, 0:3], w=state[:, 3:6], k=state[:, 6],
                        inv_depth=rho_fin, cost=state[:, _S_COST],
                        initial_cost=state[:, _S_COST0])


def refine_pallas_multi_sharded(
    coords,
    flow,
    alpha,
    alpha_k,
    masks,
    v0,
    w0,
    k0,
    rho0,
    *,
    axis_name: str,
    optimize_k: bool,
    iterations: int = 50,
    init_lambda: float = 1e-6,
    rel_tol: float = 1e-8,
    interpret: bool = None,
    tile: int = None,
    loss_delta: float = 0.0,
) -> RefineResult:
    """J-start fused LM under scanline-block sharding (shard_map body).

    The pixel sweep runs as the Pallas sums kernel on each shard's local
    block (ops/pallas/refine_kernels.lm_sums_multi), the 71-sum
    accumulators are psum'd across `axis_name` (one fused (J, 16·16 +
    8·8 + 128)-float collective per iteration — the "distributed Schur"
    obligation, SURVEY §2.4), and the accept/solve step runs replicated
    in plain JAX (refine_kernels.lm_decide — the exact vectorized mirror
    of the in-kernel decide).  Scalar outputs are replicated; inv_depth
    is the LOCAL block's rows.

    Shapes: coords/flow (N_loc, 2); alpha/alpha_k (N_loc,);
    masks/rho0 (J, N_loc); v0/w0 (J, 3); k0 (J,).
    """
    from rs_sfm_tpu.ops.pallas.refine_kernels import (TILE_MULTI, lm_decide,
                                                      lm_sums_multi)

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if tile is None:
        tile = TILE_MULTI
    j, n = rho0.shape
    # Local blocks can be smaller than the full-image tile.
    tile = min(tile, max(1024, 1 << (n - 1).bit_length()))
    pad = (-n) % tile

    def p(x):
        return jnp.pad(jnp.asarray(x, jnp.float32), ((0, pad),))

    def pj(x):
        return jnp.pad(jnp.asarray(x, jnp.float32), ((0, 0), (0, pad)))

    px = jnp.stack([
        p(coords[:, 0]), p(coords[:, 1]), p(flow[:, 0]), p(flow[:, 1]),
        p(alpha), p(alpha_k),
        jnp.zeros(n + pad, jnp.float32), jnp.zeros(n + pad, jnp.float32),
    ])
    masks_f = pj(masks.astype(jnp.float32))
    rho = pj(rho0)

    theta0 = jnp.concatenate([
        jnp.asarray(v0, jnp.float32), jnp.asarray(w0, jnp.float32),
        jnp.asarray(k0, jnp.float32)[:, None]], axis=-1)  # (J, 7)
    state = jnp.zeros((j, 128), jnp.float32)
    state = state.at[:, 0:7].set(theta0).at[:, 7:14].set(theta0)
    state = state.at[:, _S_LAM].set(3.0 * init_lambda)
    state = state.at[:, _S_COST].set(jnp.inf)
    state = state.at[:, _S_KKEEP].set(1.0 if optimize_k else 0.0)
    state = state.at[:, _S_ACCEPT].set(1.0)
    state = state.at[:, _S_RELTOL].set(rel_tol)

    def body(carry):
        state, rho_prev, rho_cand = carry
        rho_eff, rho_new, accj, accs, accv = lm_sums_multi(
            state, px, masks_f, rho_prev, rho_cand, interpret=interpret,
            tile=tile, loss_delta=loss_delta)
        # ONE fused collective: stack the three accumulators along lanes.
        packed = jnp.concatenate(
            [accj.reshape(j, 256), accs.reshape(j, 64), accv], axis=-1)
        packed = jax.lax.psum(packed, axis_name)
        accj_g = packed[:, 0:256].reshape(j, 16, 16)
        accs_g = packed[:, 256:320].reshape(j, 8, 8)
        accv_g = packed[:, 320:448]
        state = lm_decide(state, accj_g, accs_g, accv_g)
        return state, rho_eff, rho_new

    init = (state, rho, rho)
    if rel_tol == 0.0:
        state, rho_prev, rho_cand = jax.lax.fori_loop(
            0, iterations + 1, lambda _, c: body(c), init)
    else:
        def cond(c):
            i, state = c[0], c[1]
            return (i < iterations + 1) & jnp.any(state[:, _S_DONE] < 0.5)

        def body_i(c):
            return (c[0] + 1,) + body(c[1:])

        _, state, rho_prev, rho_cand = jax.lax.while_loop(
            cond, body_i, (jnp.int32(0),) + init)

    accept = (state[:, _S_ACCEPT] > 0.5)[:, None]
    rho_fin = jnp.where(accept, rho_cand, rho_prev)[:, :n]
    return RefineResult(v=state[:, 0:3], w=state[:, 3:6], k=state[:, 6],
                        inv_depth=rho_fin, cost=state[:, _S_COST],
                        initial_cost=state[:, _S_COST0])
