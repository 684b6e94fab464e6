"""Fused RANSAC hypothesis scoring as a Pallas TPU kernel.

The scoring pass is the RANSAC hot loop: for every hypothesis (v, w, k) and
every pixel, compute the closed-form inverse depth, the predicted flow, the
residual norm, and accumulate (#inliers, inlier error).  The XLA version
(solver/ransac.py) streams (chunk, N) intermediates through HBM; this kernel
keeps a pixel tile resident in VMEM and sweeps hypothesis *blocks* over it,
so pixel data is read from HBM exactly once for the whole hypothesis batch —
the bandwidth-optimal schedule.

Vectorization: a block of HBLOCK hypotheses lives on the sublane axis and a
TILE-pixel tile on the lane axis; every arithmetic op is a full
(HBLOCK, TILE) VPU pass (hypothesis parameters broadcast as (HBLOCK, 1)
columns, pixel fields as (1, TILE) rows).  The per-block reduction is a
lane-axis sum to (HBLOCK,) — no scalar loops, no one-hot accumulation.

Layout: pixel fields are packed structure-of-arrays as (8, N): rows
[x, y, ux, uy, alpha, alpha_k, valid, unused], N padded to the tile size.
Hypotheses are (T, 8): [vx, vy, vz, wx, wy, wz, k, unused], T padded to
HBLOCK.  Output is (tiles, 2, T): per-tile [inlier count, inlier error] per
hypothesis, summed by the caller.

Reference semantics: inlier test ||u_est - u|| < tol with
u_est = beta (A v rho + B w) and the closed-form depth rho
(src/minimal.cc:255-275); error sum over inliers only (src/minimal.cc:278).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024    # pixels per grid step (lane axis)
HBLOCK = 128   # hypotheses per grid step (sublane axis; output-lane aligned)


def _score_kernel(hyp_ref, px_ref, out_ref, *, tol: float):
    """One (pixel tile) x (hypothesis block) pass.

    hyp_ref: (HBLOCK, 8) VMEM; px_ref: (8, TILE) VMEM;
    out_ref: (1, 2, HBLOCK) VMEM.
    """
    x = px_ref[0:1, :]        # (1, TILE)
    y = px_ref[1:2, :]
    ux = px_ref[2:3, :]
    uy = px_ref[3:4, :]
    alpha = px_ref[4:5, :]
    alpha_k = px_ref[5:6, :]
    valid = px_ref[6:7, :]

    vx = hyp_ref[:, 0:1]      # (HBLOCK, 1)
    vy = hyp_ref[:, 1:2]
    vz = hyp_ref[:, 2:3]
    wx = hyp_ref[:, 3:4]
    wy = hyp_ref[:, 4:5]
    wz = hyp_ref[:, 5:6]
    k = hyp_ref[:, 6:7]

    # All lines below are (HBLOCK, TILE) elementwise VPU work.
    beta = (alpha + k * alpha_k) * (2.0 / (2.0 + k))
    ax = vx - x * vz
    ay = vy - y * vz
    bx = -x * y * wx + (1.0 + x * x) * wy - y * wz
    by = -(1.0 + y * y) * wx + x * y * wy + x * wz
    gx = beta * ax
    gy = beta * ay
    rx = ux - beta * bx
    ry = uy - beta * by
    gg = gx * gx + gy * gy
    gr = gx * rx + gy * ry
    rho = jnp.where(gg == 0.0, 0.0, gr / jnp.where(gg == 0.0, 1.0, gg))
    ex = ux - beta * (ax * rho + bx)
    ey = uy - beta * (ay * rho + by)
    err = jnp.sqrt(ex * ex + ey * ey)
    inl = (err < tol) & (valid > 0.5)
    num = jnp.sum(inl.astype(jnp.float32), axis=1)             # (HBLOCK,)
    esum = jnp.sum(jnp.where(inl, err, jnp.float32(0.0)), axis=1)
    out_ref[0, :, :] = jnp.stack([num, esum], axis=0)          # (2, HBLOCK)


def score_hypotheses_pallas(pixels, hyps, tol: float, interpret=None):
    """Score all hypotheses against all pixels.

    Args:
      pixels: (8, N) f32 packed pixel fields (N multiple of TILE).
      hyps: (T, 8) f32 packed hypotheses (any T; padded internally).
      tol: inlier tolerance (static).
      interpret: None = auto (interpreter on CPU — tests and the
        shard_map CPU mesh; compiled Mosaic elsewhere).

    Returns:
      (num_inliers (T,) f32, inlier_error (T,) f32).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _score_hypotheses_pallas(pixels, hyps, tol, interpret)


@functools.partial(jax.jit, static_argnames=("tol", "interpret"))
def _score_hypotheses_pallas(pixels, hyps, tol: float, interpret: bool):
    _, n = pixels.shape
    t = hyps.shape[0]
    assert n % TILE == 0, n
    tiles = n // TILE
    pad = (-t) % HBLOCK
    if pad:
        hyps = jnp.concatenate([hyps, jnp.zeros((pad, 8), hyps.dtype)])
    hblocks = (t + pad) // HBLOCK

    # Grid order: hypothesis blocks innermost, so the pixel tile stays
    # VMEM-resident while all hypothesis blocks sweep over it.
    out = pl.pallas_call(
        functools.partial(_score_kernel, tol=tol),
        grid=(tiles, hblocks),
        in_specs=[
            pl.BlockSpec((HBLOCK, 8), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TILE), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, HBLOCK), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tiles, 2, hblocks * HBLOCK),
                                       jnp.float32),
        interpret=interpret,
    )(hyps, pixels)
    sums = out.sum(axis=0)  # (2, T_padded)
    return sums[0, :t], sums[1, :t]


def pack_pixels(coords, flow, alpha, alpha_k, valid):
    """(N,2)/(N,) arrays -> (8, N_padded) f32 with N padded to TILE."""
    n = coords.shape[0]
    pad = (-n) % TILE
    def p(x):
        x = jnp.asarray(x, jnp.float32)
        return jnp.pad(x, ((0, pad),))
    fields = jnp.stack([
        p(coords[:, 0]), p(coords[:, 1]), p(flow[:, 0]), p(flow[:, 1]),
        p(alpha), p(alpha_k), p(valid.astype(jnp.float32)),
        jnp.zeros(n + pad, jnp.float32),
    ])
    return fields


def pack_hyps(v, w, k):
    """(T,3),(T,3),(T,) -> (T, 8) f32."""
    t = v.shape[0]
    return jnp.concatenate([
        jnp.asarray(v, jnp.float32), jnp.asarray(w, jnp.float32),
        jnp.asarray(k, jnp.float32)[:, None],
        jnp.zeros((t, 1), jnp.float32)], axis=1)
