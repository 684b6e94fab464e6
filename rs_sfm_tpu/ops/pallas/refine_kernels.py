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
                 accv_ref, *, tiles: int, loss_delta: float = 0.0):
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

    # Depth merge + VarPro update + MXU/VPU reductions (shared helper; the
    # Gram sums run on the MXU at Precision.HIGHEST — default precision
    # truncates operands toward bf16 and the cancellation-prone Schur
    # assembly `sums[tri] - sums[36+tri]*s` then stalls LM; hardware
    # parity pinned in TPU_VALIDATION.md §1).
    rho_eff, rho_new, g1, g2, accv = _reduce_start(
        px_ref, px_ref[6, :], rho_prev_ref[0, :], rho_cand_ref[0, :],
        theta_cand, k_keep, accept, active, loss_delta=loss_delta)
    rho_eff_ref[0, :] = rho_eff
    rho_new_ref[0, :] = rho_new
    accj_ref[:, 0:16] += g1
    accs_ref[:, 0:8] += g2
    accv_ref[0, :] += accv[0, :]

    # --- decide + solve on the last tile (scalar core) ---
    @pl.when(i == tiles - 1)
    def _decide():
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        writes = _decide_and_solve_start(
            lambda slot: state_ref[slot], accj_ref[:, 0:16],
            accs_ref[:, 0:8], accv_ref[0, :], lane[0, :], k_keep, lam)
        for slot, val in writes.items():
            out_ref[slot] = val


def _reduce_start(px_ref, m, rho_eff, rho_cand_row, theta_cand, k_keep,
                  accept, active, loss_delta: float = 0.0):
    """Per-start tile work shared by the single- and multi-start kernels:
    depth merge + VarPro update + Gram/gradient reductions at the new
    candidate.  Returns (rho_eff, rho_new, g1 (16,16), g2 (8,8),
    accv (1,128) lane-packed gradient/cost sums).

    loss_delta > 0: Huber loss on the per-pixel residual norm — the IRLS
    weight w = min(1, δ/‖r‖) at the evaluation point scales the masked
    sums (√(m·w) on the squared-Gram rows, m·w on single-factor sums) and
    the cost lane accumulates m·Huber(‖r‖) so accept/reject compares the
    robust objective; the per-pixel VarPro depth is weight-invariant.
    Matches solver/refine.py's IRLS formulation."""
    rho_eff = jnp.where(accept, rho_cand_row, rho_eff)
    # theta-dependent, rho-INDEPENDENT terms once (the kernel is VPU-bound
    # — measured r4; recomputing these for the VarPro pass and again for
    # the reduction pass was ~40% of the per-start flops).
    x = px_ref[0, :]
    y = px_ref[1, :]
    ux = px_ref[2, :]
    uy = px_ref[3, :]
    alpha = px_ref[4, :]
    alpha_k = px_ref[5, :]
    m_ = m
    v0, v1, v2, w0, w1, w2, k = theta_cand
    beta = (alpha + k * alpha_k) * (2.0 / (2.0 + k))
    dbeta = 2.0 * (2.0 * alpha_k - alpha) / ((2.0 + k) * (2.0 + k))
    ax = v0 - x * v2
    ay = v1 - y * v2
    bx = -x * y * w0 + (1.0 + x * x) * w1 - y * w2
    by = -(1.0 + y * y) * w0 + x * y * w1 + x * w2
    jrx = -beta * ax
    jry = -beta * ay
    d = (jrx * jrx + jry * jry) * m_
    informative = d > 0.0
    inv_d = jnp.where(informative,
                      1.0 / jnp.where(informative, d, 1.0), 0.0)

    # VarPro depth at theta_cand: residual at rho_eff -> one exact Newton
    # step (the residual is linear in rho; d is rho-independent).
    rx0 = ux - beta * (ax * rho_eff + bx)
    ry0 = uy - beta * (ay * rho_eff + by)
    g_rho0 = (jrx * rx0 + jry * ry0) * m_
    delta_rho = jnp.where(informative, -g_rho0 * inv_d, jnp.float32(0.0))
    # active = 0 on the bootstrap sweep: evaluate the INITIAL state (no
    # VarPro step yet), matching the original iteration semantics.
    rho_new = rho_eff + delta_rho * m_ * active

    # Reduction at (theta_cand, rho_new): only the rho-dependent pieces
    # are re-evaluated.
    ex = ax * rho_new + bx
    ey = ay * rho_new + by
    rx = ux - beta * ex
    ry = uy - beta * ey
    jx, jy = _jacobian_rows(x, y, rho_new, beta, dbeta, ex, ey, k_keep)
    g_rho = (jrx * rx + jry * ry) * m_
    c = [(jx[t] * jrx + jy[t] * jry) * m_ for t in range(7)]

    sq = rx * rx + ry * ry
    if loss_delta > 0.0:
        # IRLS weights at the evaluation point; the squared-Gram rows take
        # sqrt(w), single-factor sums take w.  The m2a/m2b split keeps the
        # Schur ratios single-power: m2a carries the UNWEIGHTED c/d while
        # m2b carries c*w, so (c*w)(c/d) = w * c^2/d.
        nrm = jnp.sqrt(sq + 1e-24)
        wl = jnp.minimum(jnp.float32(1.0), loss_delta / nrm)
        swl = jnp.sqrt(wl)
        cost_px = jnp.where(nrm <= loss_delta, sq,
                            2.0 * loss_delta * nrm
                            - loss_delta * loss_delta) * m_
    else:
        wl = jnp.float32(1.0)
        swl = jnp.float32(1.0)
        cost_px = sq * m_

    m1 = jnp.concatenate(
        [(jx[t] * m_ * swl)[None, :] for t in range(7)]
        + [(rx * m_ * swl)[None, :]]
        + [(jy[t] * m_ * swl)[None, :] for t in range(7)]
        + [(ry * m_ * swl)[None, :]],
        axis=0)
    m2a = jnp.concatenate(
        [(c[t] * inv_d)[None, :] for t in range(7)]
        + [(g_rho * inv_d)[None, :]], axis=0)
    m2b = jnp.concatenate(
        [(c[t] * wl)[None, :] for t in range(7)] + [(g_rho * wl)[None, :]],
        axis=0)
    dn = (((1,), (1,)), ((), ()))
    g1 = jax.lax.dot_general(m1, m1, dn,
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)
    g2 = jax.lax.dot_general(m2a, m2b, dn,
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.HIGHEST)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    accv = jnp.zeros((1, 128), jnp.float32)

    def put(acc, idx, val):
        return acc + jnp.where(lane == idx, val, jnp.float32(0.0))

    for t in range(7):
        accv = put(accv, 28 + t,
                   jnp.sum((jx[t] * rx + jy[t] * ry) * m_ * wl))
    accv = put(accv, 35, jnp.sum(cost_px))
    for t in range(7):
        accv = put(accv, 64 + t, jnp.sum(c[t] * wl * g_rho * inv_d))
    return rho_eff, rho_new, g1, g2, accv


def _decide_and_solve_start(sget, accj, accs, acc_row, lane_row,
                            k_keep, lam):
    """Accept/reject + lambda schedule + damped Schur solve for ONE start.

    sget: slot -> scalar read of this start's state vector (scalar SMEM
    loads — whole-row SMEM vector loads are not a supported Mosaic
    pattern).  Returns the 128-lane output state as {slot: value} writes.
    """
    jj = accj[0:8, 0:8] + accj[8:16, 8:16]
    ss = accs[:, 0:8]
    grad = [jnp.sum(jnp.where(lane_row == j, acc_row, 0.0))
            for j in range(28, 36)] + [
            jnp.sum(jnp.where(lane_row == j, acc_row, 0.0))
            for j in range(64, 71)]
    sums_cand = ([jj[r, s] for r, s in _TRIU]
                 + grad[0:8]
                 + [ss[r, s] for r, s in _TRIU]
                 + grad[8:15])
    cost_prev = sget(_S_COST)
    rel_tol = sget(_S_RELTOL)
    cost_cand = sums_cand[35]
    # A start whose done flag is already set is FROZEN: no further
    # accepts, lambda held.  Under rel_tol>0 the multi-start while_loop
    # runs until ALL starts converge; without the freeze an
    # already-converged start would keep stepping, diverging from the
    # single-start semantics (whose loop exits on done).
    was_done = sget(_S_DONE) > 0.5
    acc_ok = ((cost_cand < cost_prev) & (cost_cand == cost_cand)
              & ~was_done)
    prev_finite = jnp.abs(cost_prev) < jnp.float32(3.0e38)
    conv = acc_ok & prev_finite & (
        cost_prev - cost_cand <= rel_tol * cost_prev)
    done = was_done | conv

    sums = [jnp.where(acc_ok, sums_cand[j], sget(_S_SUMS + j))
            for j in range(_N_SUMS)]
    theta = [jnp.where(acc_ok, sget(_S_CAND + t),
                       sget(_S_THETA + t)) for t in range(7)]
    cost = jnp.where(acc_ok, cost_cand, cost_prev)
    lam_new = jnp.where(was_done, lam,
                        jnp.where(acc_ok, jnp.maximum(lam / 3.0, 1e-12),
                                  lam * 4.0))

    s = 1.0 / (1.0 + lam_new)
    h = [[None] * 7 for _ in range(7)]
    for r in range(7):
        for cc in range(7):
            tri = int(_TRI_IDX[r, cc])
            h[r][cc] = sums[tri] - sums[36 + tri] * s
        h[r][r] = h[r][r] + lam_new * (sums[int(_TRI_IDX[r, r])] + 1e-12)
    h[6][6] = h[6][6] + (1.0 - k_keep)
    b = [-(sums[28 + r] - sums[64 + r] * s) for r in range(7)]
    new_delta = _solve_7x8_scalar(h, b)

    writes = {}
    for t in range(7):
        writes[_S_THETA + t] = theta[t]
        writes[_S_CAND + t] = theta[t] + new_delta[t]
        writes[_S_DELTA + t] = new_delta[t]
    writes[_S_LAM] = lam_new
    writes[_S_COST] = cost
    writes[_S_KKEEP] = k_keep
    writes[_S_ACCEPT] = acc_ok.astype(jnp.float32)
    writes[_S_DONE] = done.astype(jnp.float32)
    writes[_S_RELTOL] = rel_tol
    writes[_S_ACTIVE] = 1.0
    writes[_S_COST0] = jnp.where(prev_finite, sget(_S_COST0), cost_cand)
    for j in range(_S_COST0 + 1, _S_SUMS):
        writes[j] = jnp.float32(0.0)
    for j in range(_N_SUMS):
        writes[_S_SUMS + j] = sums[j]
    for j in range(_S_SUMS + _N_SUMS, 128):
        writes[j] = jnp.float32(0.0)
    return writes


def _iter_kernel_multi(state_ref, px_ref, mask_ref, rho_prev_ref,
                       rho_cand_ref, out_ref, rho_eff_ref, rho_new_ref,
                       accj_ref, accs_ref, accv_ref, *, tiles: int,
                       nstarts: int, loss_delta: float = 0.0):
    """One LM iteration for J independent starts sharing the pixel stream.

    Multi-start refinement (solver/pipeline.py refine_starts > 1) runs J
    LM problems that differ only in (theta, rho, mask) — the pixel record
    (coords/flow/alpha) is identical.  Fusing the J starts into one kernel
    reads the 6 shared pixel planes from HBM ONCE per iteration instead of
    J times, and keeps one kernel dispatch per iteration regardless of J —
    the measured VERDICT-r3 cost of sequential multi-start (~J x the
    single-start wall clock) drops to the marginal VPU/MXU work.

    state_ref: (J, 128) SMEM; px_ref: (8, TILE) VMEM (rows 0-5 used);
    mask_ref/rho_*: (J, TILE) VMEM; accumulators sized J x the single-start
    shapes, indexed by start slice.
    """
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        accj_ref[:, :] = jnp.zeros((16 * nstarts, 128), jnp.float32)
        accs_ref[:, :] = jnp.zeros((8 * nstarts, 128), jnp.float32)
        accv_ref[:, :] = jnp.zeros((nstarts, 128), jnp.float32)

    for s_i in range(nstarts):
        theta_cand = tuple(state_ref[s_i, _S_CAND + t] for t in range(7))
        k_keep = state_ref[s_i, _S_KKEEP]
        accept = state_ref[s_i, _S_ACCEPT] > 0.5
        active = state_ref[s_i, _S_ACTIVE]
        m = mask_ref[s_i, :]
        rho_eff0 = rho_prev_ref[s_i, :]
        rho_eff, rho_new, g1, g2, accv = _reduce_start(
            px_ref, m, rho_eff0, rho_cand_ref[s_i, :], theta_cand, k_keep,
            accept, active, loss_delta=loss_delta)
        rho_eff_ref[s_i, :] = rho_eff
        rho_new_ref[s_i, :] = rho_new
        accj_ref[16 * s_i:16 * (s_i + 1), 0:16] += g1
        accs_ref[8 * s_i:8 * (s_i + 1), 0:8] += g2
        accv_ref[s_i, :] += accv[0, :]

    @pl.when(i == tiles - 1)
    def _decide_all():
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        for s_i in range(nstarts):
            writes = _decide_and_solve_start(
                lambda slot, s=s_i: state_ref[s, slot],
                accj_ref[16 * s_i:16 * (s_i + 1), 0:16],
                accs_ref[8 * s_i:8 * (s_i + 1), 0:8],
                accv_ref[s_i, :], lane[0, :],
                state_ref[s_i, _S_KKEEP], state_ref[s_i, _S_LAM])
            for slot, val in writes.items():
                out_ref[s_i, slot] = val


# Multi-start tile: larger than the single-start TILE — the J-start loop
# multiplies per-grid-step work, so amortizing the fixed per-step cost
# (DMA setup, revolving-buffer sync) over more pixels pays off; VMEM per
# step stays ~8 planes x tile x 4 B (~3 MB at 16384, double-buffered).
TILE_MULTI = 16384


@functools.partial(jax.jit,
                   static_argnames=("interpret", "tile", "loss_delta"))
def lm_iter_multi(state, px, masks, rho_prev, rho_cand,
                  interpret: bool = False, tile: int = TILE_MULTI,
                  loss_delta: float = 0.0):
    """One fused LM iteration for J starts (see _iter_kernel_multi).

    Args:
      state: (J, 128) f32 LM states.
      px: (8, N) f32 shared pixel fields (rows 0-5; row 6 mask unused
        here), N a multiple of `tile`.
      masks: (J, N) f32 per-start masks.
      rho_prev, rho_cand: (J, N) f32 inverse-depth fields.

    Returns:
      (new_state (J, 128), rho_eff (J, N), rho_new (J, N)).
    """
    j, n = rho_prev.shape
    tiles = n // tile
    return pl.pallas_call(
        functools.partial(_iter_kernel_multi, tiles=tiles, nstarts=j,
                          loss_delta=loss_delta),
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((j, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((j, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((j, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((j, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((j, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((j, 128), jnp.float32),
            jax.ShapeDtypeStruct((j, n), jnp.float32),
            jax.ShapeDtypeStruct((j, n), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((16 * j, 128), jnp.float32),
                        pltpu.VMEM((8 * j, 128), jnp.float32),
                        pltpu.VMEM((j, 128), jnp.float32)],
        interpret=interpret,
    )(state, px, masks, rho_prev, rho_cand)


@functools.partial(jax.jit, static_argnames=("interpret", "loss_delta"))
def lm_iter(state, px, rho_prev, rho_cand, interpret: bool = False,
            loss_delta: float = 0.0):
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
        functools.partial(_iter_kernel, tiles=tiles,
                          loss_delta=loss_delta),
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


# ---------------------------------------------------------------------------
# Sharded fused LM (VERDICT r4 item 5): the pixel sweep stays a Pallas
# kernel per shard (sums only — the per-pixel work IS the cost), the 71-sum
# accumulators are psum'd across the scanline-block axis, and the tiny
# accept/solve step runs once in plain JAX on the replicated sums.  The
# sequence of evaluated points, accept decisions, and lambda updates is
# IDENTICAL to the fused single-device kernel up to the float reassociation
# of partial-sum order (per-shard partials + psum vs sequential tiles).
# ---------------------------------------------------------------------------


def _sums_kernel_multi(state_ref, px_ref, mask_ref, rho_prev_ref,
                       rho_cand_ref, rho_eff_ref, rho_new_ref,
                       accj_ref, accs_ref, accv_ref, *,
                       nstarts: int, loss_delta: float = 0.0):
    """_iter_kernel_multi without the decide step: accumulators are
    OUTPUTS (constant-index blocks accumulated across the sequential
    grid), so the caller can psum them before deciding."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        accj_ref[:, :] = jnp.zeros((16 * nstarts, 128), jnp.float32)
        accs_ref[:, :] = jnp.zeros((8 * nstarts, 128), jnp.float32)
        accv_ref[:, :] = jnp.zeros((nstarts, 128), jnp.float32)

    for s_i in range(nstarts):
        theta_cand = tuple(state_ref[s_i, _S_CAND + t] for t in range(7))
        k_keep = state_ref[s_i, _S_KKEEP]
        accept = state_ref[s_i, _S_ACCEPT] > 0.5
        active = state_ref[s_i, _S_ACTIVE]
        m = mask_ref[s_i, :]
        rho_eff, rho_new, g1, g2, accv = _reduce_start(
            px_ref, m, rho_prev_ref[s_i, :], rho_cand_ref[s_i, :],
            theta_cand, k_keep, accept, active, loss_delta=loss_delta)
        rho_eff_ref[s_i, :] = rho_eff
        rho_new_ref[s_i, :] = rho_new
        accj_ref[16 * s_i:16 * (s_i + 1), 0:16] += g1
        accs_ref[8 * s_i:8 * (s_i + 1), 0:8] += g2
        accv_ref[s_i, :] += accv[0, :]


@functools.partial(jax.jit,
                   static_argnames=("interpret", "tile", "loss_delta"))
def lm_sums_multi(state, px, masks, rho_prev, rho_cand,
                  interpret: bool = False, tile: int = TILE_MULTI,
                  loss_delta: float = 0.0):
    """Pixel-sweep half of one LM iteration for J starts.

    Returns (rho_eff (J,N), rho_new (J,N), accj (J,16,16), accs (J,8,8),
    accv (J,128)) — the local reduction sums; psum them across the shard
    axis, then apply lm_decide to produce the next state.
    """
    j, n = rho_prev.shape
    tiles = n // tile
    rho_eff, rho_new, accj, accs, accv = pl.pallas_call(
        functools.partial(_sums_kernel_multi, nstarts=j,
                          loss_delta=loss_delta),
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((j, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((j, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((j, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((j, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((j, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16 * j, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * j, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((j, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((j, n), jnp.float32),
            jax.ShapeDtypeStruct((j, n), jnp.float32),
            jax.ShapeDtypeStruct((16 * j, 128), jnp.float32),
            jax.ShapeDtypeStruct((8 * j, 128), jnp.float32),
            jax.ShapeDtypeStruct((j, 128), jnp.float32),
        ),
        interpret=interpret,
    )(state, px, masks, rho_prev, rho_cand)
    return (rho_eff, rho_new,
            accj.reshape(j, 16, 128)[:, :, 0:16],
            accs.reshape(j, 8, 128)[:, :, 0:8], accv)


_TRI_I = np.asarray([i for i, _ in _TRIU], np.int32)
_TRI_J = np.asarray([j for _, j in _TRIU], np.int32)
# NOTE: numpy (not jnp) — this module is imported lazily inside jit
# traces (solver/pipeline _sharded_refine), where a module-level jnp
# constant would be created as a tracer and leak out of the trace.


def lm_decide(state, accj, accs, accv):
    """Accept/reject + lambda schedule + damped Schur solve, in plain JAX
    on the (psum'd) reduction sums — the exact vectorized mirror of the
    in-kernel _decide_and_solve_start (incl. the r5 done-freeze).

    Args:
      state: (J, 128) LM states; accj: (J, 16, 16); accs: (J, 8, 8);
      accv: (J, 128).

    Returns:
      new state (J, 128).
    """
    f32 = state.dtype
    jdim = state.shape[0]
    jj = accj[:, 0:8, 0:8] + accj[:, 8:16, 8:16]        # (J, 8, 8)
    triu_j = jj[:, _TRI_I, _TRI_J]                       # (J, 28)
    triu_s = accs[:, _TRI_I, _TRI_J]                     # (J, 28)
    sums_cand = jnp.concatenate(
        [triu_j, accv[:, 28:36], triu_s, accv[:, 64:71]], axis=1)  # (J,71)

    cost_prev = state[:, _S_COST]
    rel_tol = state[:, _S_RELTOL]
    k_keep = state[:, _S_KKEEP]
    lam = state[:, _S_LAM]
    cost_cand = sums_cand[:, 35]
    was_done = state[:, _S_DONE] > 0.5
    acc_ok = ((cost_cand < cost_prev) & (cost_cand == cost_cand)
              & ~was_done)
    prev_finite = jnp.abs(cost_prev) < jnp.float32(3.0e38)
    conv = acc_ok & prev_finite & (
        cost_prev - cost_cand <= rel_tol * cost_prev)
    done = was_done | conv

    sums_prev = state[:, _S_SUMS:_S_SUMS + _N_SUMS]
    sums = jnp.where(acc_ok[:, None], sums_cand, sums_prev)
    theta = jnp.where(acc_ok[:, None], state[:, _S_CAND:_S_CAND + 7],
                      state[:, _S_THETA:_S_THETA + 7])
    cost = jnp.where(acc_ok, cost_cand, cost_prev)
    lam_new = jnp.where(was_done, lam,
                        jnp.where(acc_ok, jnp.maximum(lam / 3.0, 1e-12),
                                  lam * 4.0))

    s = (1.0 / (1.0 + lam_new))[:, None, None]
    h = sums[:, _TRI_IDX] - sums[:, 36 + _TRI_IDX] * s    # (J, 7, 7)
    diag = lam_new[:, None] * (sums[:, _TRI_IDX[np.arange(7),
                                                np.arange(7)]] + 1e-12)
    h = h + jnp.eye(7, dtype=f32)[None] * diag[:, None, :]
    h = h.at[:, 6, 6].add(1.0 - k_keep)
    b = -(sums[:, 28:35] - sums[:, 64:71] * s[:, :, 0])
    from rs_sfm_tpu.ops.linalg import gauss_solve

    delta = jax.vmap(gauss_solve)(h, b)                   # (J, 7)

    new_state = jnp.zeros((jdim, 128), f32)
    new_state = new_state.at[:, _S_THETA:_S_THETA + 7].set(theta)
    new_state = new_state.at[:, _S_CAND:_S_CAND + 7].set(theta + delta)
    new_state = new_state.at[:, _S_DELTA:_S_DELTA + 7].set(delta)
    new_state = new_state.at[:, _S_LAM].set(lam_new)
    new_state = new_state.at[:, _S_COST].set(cost)
    new_state = new_state.at[:, _S_KKEEP].set(k_keep)
    new_state = new_state.at[:, _S_ACCEPT].set(acc_ok.astype(f32))
    new_state = new_state.at[:, _S_DONE].set(done.astype(f32))
    new_state = new_state.at[:, _S_RELTOL].set(rel_tol)
    new_state = new_state.at[:, _S_ACTIVE].set(1.0)
    new_state = new_state.at[:, _S_COST0].set(
        jnp.where(prev_finite, state[:, _S_COST0], cost_cand))
    new_state = new_state.at[:, _S_SUMS:_S_SUMS + _N_SUMS].set(sums)
    return new_state
