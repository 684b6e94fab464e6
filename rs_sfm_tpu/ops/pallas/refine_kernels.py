"""Pallas TPU kernels for the Schur-LM refinement inner loop.

Each LM iteration needs (a) the Schur-reduced 7x7 system assembled from
masked per-pixel reductions and (b) after solving for δθ, the per-pixel
depth back-substitution plus the candidate cost.  The XLA implementation
(solver/refine.py) pays several HBM passes and two K≈4M MXU Gram products
per iteration (~4 ms at full-HD); these kernels read the packed pixel state
exactly once per phase, keep everything in VMEM, and emit only tile-level
partials (phase A) or the updated depths + cost partial (phase B) —
~10x less HBM traffic per iteration.

Packed pixel state (rows of an (8, N) f32 array):
  0 x   1 y   2 ux   3 uy   4 alpha   5 alpha_k   6 mask   7 rho
Parameter vector (SMEM, (16,) f32):
  0..2 v   3..5 w   6 k   7 lambda   8 k_keep   9..15 delta_theta (phase B)

Phase A tile output layout ((1, 128) f32):
  [0:28)   upper triangle of Σ JθᵀJθ (row-major i<=j)
  [28:35)  Σ Jθᵀ r
  [35)     Σ m·|r|²   (current cost)
  [36:64)  upper triangle of Σ c cᵀ/d̃
  [64:71)  Σ c g_ρ/d̃
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 4096  # measured best at full-HD (32768 was ~3% slower)

_TRIU = [(i, j) for i in range(7) for j in range(7) if i <= j]


def _pixel_terms(px_ref, theta):
    """Common per-pixel quantities for both phases."""
    x = px_ref[0, :]
    y = px_ref[1, :]
    ux = px_ref[2, :]
    uy = px_ref[3, :]
    alpha = px_ref[4, :]
    alpha_k = px_ref[5, :]
    m = px_ref[6, :]
    rho = px_ref[7, :]
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
    return (x, y, alpha, alpha_k, m, rho, beta, dbeta, ax, ay, ex, ey,
            rx, ry)


def _jacobian_rows(x, y, rho, beta, dbeta, ex, ey):
    """Rows of ∂r/∂θ for both residual components: two 7-vectors of arrays."""
    zero = jnp.zeros_like(x)
    brho = beta * rho
    jx = (-brho, zero, brho * x,
          beta * x * y, -beta * (1.0 + x * x), beta * y,
          -dbeta * ex)
    jy = (zero, -brho, brho * y,
          beta * (1.0 + y * y), -beta * x * y, -beta * x,
          -dbeta * ey)
    return jx, jy


def _reduce_kernel(params_ref, px_ref, out_ref):
    theta = tuple(params_ref[i] for i in range(7))
    lam = params_ref[7]
    k_keep = params_ref[8]
    (x, y, _, _, m, rho, beta, dbeta, ax, ay, ex, ey, rx, ry) = _pixel_terms(
        px_ref, theta)
    jx, jy = _jacobian_rows(x, y, rho, beta, dbeta, ex, ey)
    # Frozen k: zero its Jacobian column.
    jx = jx[:6] + (jx[6] * k_keep,)
    jy = jy[:6] + (jy[6] * k_keep,)

    # ∂r/∂ρ = −β·A·v
    jrx = -beta * ax
    jry = -beta * ay
    d = (jrx * jrx + jry * jry) * m
    d_aug = d * (1.0 + lam)
    informative = d_aug > 0.0
    d_safe = jnp.where(informative, d_aug, jnp.ones_like(d_aug))
    inv_d = jnp.where(informative, 1.0 / d_safe, jnp.zeros_like(d_aug))
    g_rho = (jrx * rx + jry * ry) * m

    c = [None] * 7
    for i in range(7):
        c[i] = (jx[i] * jrx + jy[i] * jry) * m

    # Mosaic forbids scalar stores to VMEM: accumulate the 71 partials into
    # a (1, 128) row via one-hot lane masks and store it once.
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    acc = jnp.zeros((1, 128), jnp.float32)

    def put(acc, idx, val):
        return acc + jnp.where(lane == idx, val, jnp.float32(0.0))

    idx = 0
    for i, j in _TRIU:
        acc = put(acc, idx, jnp.sum((jx[i] * jx[j] + jy[i] * jy[j]) * m))
        idx += 1
    for i in range(7):
        acc = put(acc, 28 + i, jnp.sum((jx[i] * rx + jy[i] * ry) * m))
    acc = put(acc, 35, jnp.sum((rx * rx + ry * ry) * m))
    idx = 36
    for i, j in _TRIU:
        acc = put(acc, idx, jnp.sum(c[i] * c[j] * inv_d))
        idx += 1
    for i in range(7):
        acc = put(acc, 64 + i, jnp.sum(c[i] * g_rho * inv_d))
    out_ref[0, :, :] = acc


def _update_kernel(params_ref, px_ref, rho_ref, cost_ref):
    theta = tuple(params_ref[i] for i in range(7))
    lam = params_ref[7]
    k_keep = params_ref[8]
    dth = tuple(params_ref[9 + i] for i in range(7))
    (x, y, alpha, alpha_k, m, rho, beta, dbeta, ax, ay, ex, ey, rx, ry
     ) = _pixel_terms(px_ref, theta)
    jx, jy = _jacobian_rows(x, y, rho, beta, dbeta, ex, ey)
    jx = jx[:6] + (jx[6] * k_keep,)
    jy = jy[:6] + (jy[6] * k_keep,)

    jrx = -beta * ax
    jry = -beta * ay
    d = (jrx * jrx + jry * jry) * m
    d_aug = d * (1.0 + lam)
    informative = d_aug > 0.0
    d_safe = jnp.where(informative, d_aug, jnp.ones_like(d_aug))
    g_rho = (jrx * rx + jry * ry) * m

    c_dot_dth = jnp.zeros_like(x)
    for i in range(7):
        c_dot_dth = c_dot_dth + (jx[i] * jrx + jy[i] * jry) * m * dth[i]
    delta_rho = jnp.where(informative, -(g_rho + c_dot_dth) / d_safe,
                          jnp.float32(0.0))
    rho_new = rho + delta_rho * m
    rho_ref[0, 0, :] = rho_new

    # Candidate cost at (θ+δθ, ρ_new).
    v0 = theta[0] + dth[0]
    v1 = theta[1] + dth[1]
    v2 = theta[2] + dth[2]
    w0 = theta[3] + dth[3]
    w1 = theta[4] + dth[4]
    w2 = theta[5] + dth[5]
    k_new = theta[6] + dth[6]
    beta_n = (alpha + k_new * alpha_k) * (2.0 / (2.0 + k_new))
    ax_n = v0 - x * v2
    ay_n = v1 - y * v2
    bx_n = -x * y * w0 + (1.0 + x * x) * w1 - y * w2
    by_n = -(1.0 + y * y) * w0 + x * y * w1 + x * w2
    rx_n = px_ref[2, :] - beta_n * (ax_n * rho_new + bx_n)
    ry_n = px_ref[3, :] - beta_n * (ay_n * rho_new + by_n)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    cost_val = jnp.sum((rx_n * rx_n + ry_n * ry_n) * m)
    cost_ref[0, :, :] = jnp.where(lane == 0, cost_val, jnp.float32(0.0))


import numpy as np

# (7, 7) -> index into the 28-element packed upper triangle (symmetric).
_TRI_IDX = np.zeros((7, 7), np.int32)
for _n, (_i, _j) in enumerate(_TRIU):
    _TRI_IDX[_i, _j] = _TRI_IDX[_j, _i] = _n


def _unpack_tri(tri):
    """(28,) upper triangle -> (7, 7) symmetric (single gather)."""
    return tri[_TRI_IDX]


@functools.partial(jax.jit, static_argnames=("interpret",))
def lm_reduce(px, params, interpret: bool = False):
    """Phase A: tile partials -> (h_tt (7,7), g_t (7), cost (), schur_h (7,7),
    schur_g (7))."""
    tiles = px.shape[1] // TILE
    out = pl.pallas_call(
        _reduce_kernel,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tiles, 1, 128), jnp.float32),
        interpret=interpret,
    )(params, px)
    s = out.sum(axis=(0, 1))
    return (_unpack_tri(s[0:28]), s[28:35], s[35], _unpack_tri(s[36:64]),
            s[64:71])


@functools.partial(jax.jit, static_argnames=("interpret",))
def lm_update(px, params, interpret: bool = False):
    """Phase B: (rho_new (N,), candidate cost ())."""
    tiles = px.shape[1] // TILE
    rho_new, cost = pl.pallas_call(
        _update_kernel,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, TILE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((tiles, 1, TILE), jnp.float32),
            jax.ShapeDtypeStruct((tiles, 1, 128), jnp.float32),
        ),
        interpret=interpret,
    )(params, px)
    return rho_new.reshape(-1), cost[:, 0, 0].sum()
