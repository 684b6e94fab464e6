"""Pallas TPU kernels for the Schur-LM refinement inner loop.

One LM iteration = ONE kernel sweep over the pixel tiles (`lm_iter`).  This
matters doubly on the target platform: the XLA implementation
(solver/refine.py) pays ~100 microscopic dispatched ops per iteration for
the 7x7 solve and bookkeeping, and the remote-TPU runtime adds a large
fixed cost to every extra sequential dispatch, so the whole iteration is
fused into a single pallas_call:

  1. depth merge: rho_eff = accept ? rho_cand : rho_prev;
  2. variable-projection depth update at the candidate motion:
     rho_new = rho_eff - g_rho / d  (exact per-pixel optimum — the
     residual is linear in rho);
  3. reduction of the 71 Schur/cost sums at the NEW candidate
     (theta_cand, rho_new).  The 56 Gram-matrix sums (triu of sum J^T J and
     of sum c c^T / d) run on the MXU: stack the masked Jacobian rows as
     M1 (16, TILE) (x-component rows then y-component rows) and the
     Schur-coupling rows as M2a/M2b (8, TILE, one side carrying 1/d); then
     M1 M1^T and M2a M2b^T give all pairwise sums in two small matmuls,
     accumulated in VMEM matrix accumulators across tiles.  This moves
     ~500 VPU flops/pixel onto the systolic array.  The 15 gradient/cost
     sums (sum J^T r, cost, sum c g_rho / d) stay on the VPU tree-sum
     path: near convergence they cancel almost completely against each
     other in the Schur assembly, and the MXU's sequential accumulation
     over the 4096-long contraction loses ~3 decimal digits there
     (measured: LM stalls at 30-50x the converged cost), while the
     positive-semidefinite Gram diagonals are insensitive;
  4. on the final tile: accept/reject decision, lambda schedule, Schur
     assembly, and an unrolled scalar-core Gauss-Jordan solve of the damped
     7x7 system, emitting the full next LM state.

The loop is in "pipelined accept" form: the candidate cost is evaluated by
the NEXT iteration's sweep (it must read the pixels anyway), and the
reduction sums of the last accepted state ride along in the state vector,
stored lambda-independently (sum c c^T / d instead of / d(1+lambda)) so a
rejected step reuses them exactly under the new damping — rejection costs
nothing.  The sequence of evaluated points, accept decisions, and lambda
updates is identical to the unfused formulation (and to solver/refine.py,
the f64-capable parity reference).

Packed pixel fields (rows of an (8, N) f32 array, N padded to TILE):
  0 x   1 y   2 ux   3 uy   4 alpha   5 alpha_k   6 mask   7 unused
The inverse depth rho is carried separately as (1, N) arrays (previous
accepted + current candidate) so the big pixel block is never rewritten.

State vector layout ((128,) f32, SMEM):
  [0:7)    theta_eff (v, w, k) — last accepted parameters
  [7:14)   theta_cand — candidate parameters (theta_eff + delta)
  [14]     lambda (damping used for the delta in [19:26))
  [15]     cost at theta_eff
  [16]     k_keep (1.0 = optimize k, 0.0 = frozen)
  [17]     accept flag of the last decision
  [18]     done flag (converged; sticky)
  [19:26)  delta theta
  [26]     rel_tol (convergence tolerance, copied through)
  [27]     active (0.0 on the bootstrap sweep: no back-substitution yet)
  [28]     initial cost (captured on the bootstrap sweep)
  [32:103) reduction sums at theta_eff (lambda-independent), offsets within:
           [0:28) triu sum J^T J   [28:35) sum J^T r   [35] cost
           [36:64) triu sum c c^T / d   [64:71) sum c g_rho / d

Reference: the joint refinement objective and DENSE_SCHUR structure follow
src/nonlinearRefinement.cc:183-252 (Ceres); the Schur elimination of the
per-pixel rho blocks is analytic here because the residual is linear in rho.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 4096  # measured best at full-HD (32768 was ~3% slower)

_TRIU = [(i, j) for i in range(7) for j in range(7) if i <= j]

# (7, 7) -> index into the 28-element packed upper triangle (symmetric).
_TRI_IDX = np.zeros((7, 7), np.int32)
for _n, (_i, _j) in enumerate(_TRIU):
    _TRI_IDX[_i, _j] = _TRI_IDX[_j, _i] = _n

# State-vector slots.
_S_THETA = 0
_S_CAND = 7
_S_LAM = 14
_S_COST = 15
_S_KKEEP = 16
_S_ACCEPT = 17
_S_DONE = 18
_S_DELTA = 19
_S_RELTOL = 26
_S_ACTIVE = 27
_S_COST0 = 28
_S_SUMS = 32
_N_SUMS = 71


def _pixel_terms(px_ref, rho, theta):
    """Common per-pixel quantities (all (TILE,) f32)."""
    x = px_ref[0, :]
    y = px_ref[1, :]
    ux = px_ref[2, :]
    uy = px_ref[3, :]
    alpha = px_ref[4, :]
    alpha_k = px_ref[5, :]
    m = px_ref[6, :]
    v0, v1, v2, w0, w1, w2, k = theta

    beta = (alpha + k * alpha_k) * (2.0 / (2.0 + k))
    dbeta = 2.0 * (2.0 * alpha_k - alpha) / ((2.0 + k) * (2.0 + k))
    ax = v0 - x * v2
    ay = v1 - y * v2
    bx = -x * y * w0 + (1.0 + x * x) * w1 - y * w2
    by = -(1.0 + y * y) * w0 + x * y * w1 + x * w2
    ex = ax * rho + bx
    ey = ay * rho + by
    rx = ux - beta * ex
    ry = uy - beta * ey
    return x, y, m, beta, dbeta, ax, ay, ex, ey, rx, ry


def _jacobian_rows(x, y, rho, beta, dbeta, ex, ey, k_keep):
    """Rows of dr/dtheta for both residual components (k column gated)."""
    zero = jnp.zeros_like(x)
    brho = beta * rho
    jx = (-brho, zero, brho * x,
          beta * x * y, -beta * (1.0 + x * x), beta * y,
          -dbeta * ex * k_keep)
    jy = (zero, -brho, brho * y,
          beta * (1.0 + y * y), -beta * x * y, -beta * x,
          -dbeta * ey * k_keep)
    return jx, jy


def _solve_7x8_scalar(h, b):
    """Unrolled scalar Gauss-Jordan with partial pivoting (7x7 system).

    h: 7x7 nested list of scalars; b: length-7 list.  Returns delta (list of
    7 scalars).  Partial pivoting matches the robustness of the XLA path's
    pivoted solve on weakly damped, near-gauge-singular systems (the
    reference leaves this to Ceres' dense Cholesky,
    src/nonlinearRefinement.cc:161).  ~1.5k scalar-core ops, once per
    LM iteration.
    """
    aug = [[h[r][c] for c in range(7)] + [b[r]] for r in range(7)]
    for kk in range(7):
        # Swap row kk with the largest-|column-kk| row below it, pairwise.
        for r in range(kk + 1, 7):
            swap = jnp.abs(aug[r][kk]) > jnp.abs(aug[kk][kk])
            for c in range(kk, 8):
                hi = jnp.where(swap, aug[r][c], aug[kk][c])
                lo = jnp.where(swap, aug[kk][c], aug[r][c])
                aug[kk][c] = hi
                aug[r][c] = lo
        piv = aug[kk][kk]
        safe = jnp.where(piv == 0.0, 1.0, piv)
        inv = jnp.where(piv == 0.0, 0.0, 1.0 / safe)
        for c in range(kk, 8):
            aug[kk][c] = aug[kk][c] * inv
        for r in range(7):
            if r == kk:
                continue
            f = aug[r][kk]
            for c in range(kk + 1, 8):
                aug[r][c] = aug[r][c] - f * aug[kk][c]
    return [aug[r][7] for r in range(7)]


def _iter_kernel(state_ref, px_ref, rho_prev_ref, rho_cand_ref,
                 out_ref, rho_eff_ref, rho_new_ref, accj_ref, accs_ref,
                 accv_ref, *, tiles: int):
    """One full LM iteration; see module docstring.

    state_ref: (128,) SMEM; px_ref: (8, TILE) VMEM;
    rho_prev/cand_ref: (1, TILE) VMEM inputs;
    out_ref: (128,) SMEM; rho_eff/new_ref: (1, TILE) VMEM outputs;
    accj_ref: (16, 128) / accs_ref: (8, 128) VMEM Gram accumulators,
    accv_ref: (1, 128) VMEM gradient/cost accumulator (all persist across
    grid steps; only the leading lanes are used).
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        accj_ref[:, :] = jnp.zeros((16, 128), jnp.float32)
        accs_ref[:, :] = jnp.zeros((8, 128), jnp.float32)
        accv_ref[0, :] = jnp.zeros((128,), jnp.float32)

    theta_cand = tuple(state_ref[_S_CAND + t] for t in range(7))
    k_keep = state_ref[_S_KKEEP]
    lam = state_ref[_S_LAM]
    accept = state_ref[_S_ACCEPT] > 0.5
    active = state_ref[_S_ACTIVE]

    # --- depth merge + variable projection at theta_cand ---
    # ρ is re-ELIMINATED exactly at the candidate motion (the residual is
    # linear in ρ, so the per-pixel optimum is one Newton step with the
    # UNDAMPED curvature: ρ* = ρ − g_ρ/d), mirroring solver/refine.py's
    # VarPro update — the GN ρ-update made the joint iteration crawl along
    # the k/(v,w,ρ) valley (~40x more iterations to the same optimum).
    rho_eff = jnp.where(accept, rho_cand_ref[0, :], rho_prev_ref[0, :])
    x, y, m, beta, dbeta, ax, ay, ex, ey, rx, ry = _pixel_terms(
        px_ref, rho_eff, theta_cand)
    jrx = -beta * ax
    jry = -beta * ay
    d0 = (jrx * jrx + jry * jry) * m
    informative = d0 > 0.0
    d_safe0 = jnp.where(informative, d0, jnp.ones_like(d0))
    g_rho = (jrx * rx + jry * ry) * m
    delta_rho = jnp.where(informative, -g_rho / d_safe0, jnp.float32(0.0))
    rho_new = rho_eff + delta_rho * m * active
    rho_eff_ref[0, :] = rho_eff
    rho_new_ref[0, :] = rho_new

    # --- reduction at the new candidate (theta_cand, rho_new) ---
    x, y, m, beta, dbeta, ax, ay, ex, ey, rx, ry = _pixel_terms(
        px_ref, rho_new, theta_cand)
    jx, jy = _jacobian_rows(x, y, rho_new, beta, dbeta, ex, ey, k_keep)
    jrx = -beta * ax
    jry = -beta * ay
    d = (jrx * jrx + jry * jry) * m
    informative = d > 0.0
    inv_d = jnp.where(informative, 1.0 / jnp.where(informative, d, 1.0),
                      0.0)
    g_rho = (jrx * rx + jry * ry) * m
    c = [(jx[t] * jrx + jy[t] * jry) * m for t in range(7)]

    # Gram reductions on the MXU (see module docstring).  Masked rows: m is
    # 0/1, so the m^2 inside each product equals the single m of the sums.
    # Rows 7/15 carry the residual components, giving J^T r and cost in the
    # same matmul — those entries are discarded in favor of the VPU path.
    m1 = jnp.concatenate(
        [(jx[t] * m)[None, :] for t in range(7)] + [(rx * m)[None, :]]
        + [(jy[t] * m)[None, :] for t in range(7)] + [(ry * m)[None, :]],
        axis=0)  # (16, TILE)
    m2a = jnp.concatenate(
        [(c[t] * inv_d)[None, :] for t in range(7)]
        + [(g_rho * inv_d)[None, :]], axis=0)  # (8, TILE)
    m2b = jnp.concatenate(
        [c[t][None, :] for t in range(7)] + [g_rho[None, :]],
        axis=0)  # (8, TILE)
    # Precision.HIGHEST forces full-f32 MXU passes (default would allow
    # bf16-truncated operands); the Gram sums feed the cancellation-prone
    # Schur assembly (sums[tri] - sums[36+tri]*s at small lambda), so the
    # truncation error would surface as LM stalls.  Hardware check:
    # scripts/tpu_validate.py compares the converged LM cost of this kernel
    # against the XLA (VPU) engine on the real chip (see its report in
    # TPU_VALIDATION.md).
    dn = (((1,), (1,)), ((), ()))
    g1 = jax.lax.dot_general(m1, m1, dn,
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)  # (16, 16)
    g2 = jax.lax.dot_general(m2a, m2b, dn,
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)  # (8, 8)
    accj_ref[:, 0:16] += g1
    accs_ref[:, 0:8] += g2

    # Cancellation-sensitive gradient/cost sums on the VPU tree-sum path.
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    accv = jnp.zeros((1, 128), jnp.float32)

    def put(acc, idx, val):
        return acc + jnp.where(lane == idx, val, jnp.float32(0.0))

    for t in range(7):
        accv = put(accv, 28 + t, jnp.sum((jx[t] * rx + jy[t] * ry) * m))
    accv = put(accv, 35, jnp.sum((rx * rx + ry * ry) * m))
    for t in range(7):
        accv = put(accv, 64 + t, jnp.sum(c[t] * g_rho * inv_d))
    accv_ref[0, :] += accv[0, :]

    # --- decide + solve on the last tile (scalar core) ---
    @pl.when(i == tiles - 1)
    def _decide_and_solve():
        accj = accj_ref[:, 0:16]
        jj = accj[0:8, 0:8] + accj[8:16, 8:16]  # x + y residual components
        ss = accs_ref[:, 0:8]
        acc_row = accv_ref[0, :]
        grad = [jnp.sum(jnp.where(lane[0, :] == j, acc_row, 0.0))
                for j in range(28, 36)] + [
                jnp.sum(jnp.where(lane[0, :] == j, acc_row, 0.0))
                for j in range(64, 71)]
        # Unpack into the state-vector sum layout: [0:28) triu J^T J,
        # [28:35) J^T r, [35] cost, [36:64) triu c c^T/d, [64:71) c g_rho/d.
        sums_cand = ([jj[r, s] for r, s in _TRIU]
                     + grad[0:8]
                     + [ss[r, s] for r, s in _TRIU]
                     + grad[8:15])
        cost_prev = state_ref[_S_COST]
        rel_tol = state_ref[_S_RELTOL]
        cost_cand = sums_cand[35]
        acc_ok = (cost_cand < cost_prev) & (cost_cand == cost_cand)
        prev_finite = jnp.abs(cost_prev) < jnp.float32(3.0e38)
        conv = acc_ok & prev_finite & (
            cost_prev - cost_cand <= rel_tol * cost_prev)
        done = (state_ref[_S_DONE] > 0.5) | conv

        sums = [jnp.where(acc_ok, sums_cand[j], state_ref[_S_SUMS + j])
                for j in range(_N_SUMS)]
        theta = [jnp.where(acc_ok, state_ref[_S_CAND + t],
                           state_ref[_S_THETA + t]) for t in range(7)]
        cost = jnp.where(acc_ok, cost_cand, cost_prev)
        lam_new = jnp.where(acc_ok, jnp.maximum(lam / 3.0, 1e-12),
                            lam * 4.0)

        # Schur-reduced damped system from the lambda-independent sums:
        #   H = Jt^T Jt + lam diag(..) + e66 (1-k_keep) - S_h / (1+lam)
        #   g = Jt^T r - S_g / (1+lam)
        s = 1.0 / (1.0 + lam_new)
        h = [[None] * 7 for _ in range(7)]
        for r in range(7):
            for cc in range(7):
                tri = int(_TRI_IDX[r, cc])
                h[r][cc] = sums[tri] - sums[36 + tri] * s
            h[r][r] = h[r][r] + lam_new * (sums[int(_TRI_IDX[r, r])]
                                           + 1e-12)
        h[6][6] = h[6][6] + (1.0 - k_keep)
        b = [-(sums[28 + r] - sums[64 + r] * s) for r in range(7)]
        new_delta = _solve_7x8_scalar(h, b)

        for t in range(7):
            out_ref[_S_THETA + t] = theta[t]
            out_ref[_S_CAND + t] = theta[t] + new_delta[t]
            out_ref[_S_DELTA + t] = new_delta[t]
        out_ref[_S_LAM] = lam_new
        out_ref[_S_COST] = cost
        out_ref[_S_KKEEP] = k_keep
        out_ref[_S_ACCEPT] = acc_ok.astype(jnp.float32)
        out_ref[_S_DONE] = done.astype(jnp.float32)
        out_ref[_S_RELTOL] = rel_tol
        out_ref[_S_ACTIVE] = 1.0
        out_ref[_S_COST0] = jnp.where(prev_finite, state_ref[_S_COST0],
                                      cost_cand)
        for j in range(_S_COST0 + 1, _S_SUMS):
            out_ref[j] = 0.0
        for j in range(_N_SUMS):
            out_ref[_S_SUMS + j] = sums[j]
        for j in range(_S_SUMS + _N_SUMS, 128):
            out_ref[j] = 0.0


@functools.partial(jax.jit, static_argnames=("interpret",))
def lm_iter(state, px, rho_prev, rho_cand, interpret: bool = False):
    """One fused LM iteration (merge + backsub + reduce + decide + solve).

    Args:
      state: (128,) f32 LM state (see module docstring).
      px: (8, N) f32 packed pixel fields, N a multiple of TILE.
      rho_prev, rho_cand: (1, N) f32 inverse-depth fields.

    Returns:
      (new_state (128,), rho_eff (1, N), rho_new (1, N)).
    """
    tiles = px.shape[1] // TILE
    return pl.pallas_call(
        functools.partial(_iter_kernel, tiles=tiles),
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((128,), jnp.float32),
            jax.ShapeDtypeStruct(rho_prev.shape, jnp.float32),
            jax.ShapeDtypeStruct(rho_prev.shape, jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((16, 128), jnp.float32),
                        pltpu.VMEM((8, 128), jnp.float32),
                        pltpu.VMEM((1, 128), jnp.float32)],
        interpret=interpret,
    )(state, px, rho_prev, rho_cand)
