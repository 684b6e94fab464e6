"""Fused RANSAC hypothesis scoring as a Pallas TPU kernel.

The scoring pass is the RANSAC hot loop: for every hypothesis (v, w, k) and
every pixel, compute the closed-form inverse depth, the predicted flow, the
residual norm, and accumulate (#inliers, inlier error).  The XLA version
(solver/ransac.py) streams (chunk, N) intermediates through HBM; this kernel
keeps a pixel tile resident in VMEM and loops all hypotheses over it, so
pixel data is read from HBM exactly once for the whole hypothesis batch —
the bandwidth-optimal schedule.

Layout: pixel fields are packed structure-of-arrays as (8, N): rows
[x, y, ux, uy, alpha, alpha_k, valid, unused], N padded to the tile size.
Hypotheses are (T, 8): [vx, vy, vz, wx, wy, wz, k, unused].  Output is
(tiles, 2, T): per-tile [inlier count, inlier error] per hypothesis,
summed by the caller.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 16384  # pixels per grid step (8 fields x 16384 f32 = 512 KB in VMEM)


def _score_kernel(hyp_ref, px_ref, out_ref, *, tol: float, n_hyp: int):
    """One pixel tile vs all hypotheses.

    hyp_ref: (n_hyp, 8) VMEM; px_ref: (8, TILE) VMEM;
    out_ref: (2, n_hyp) VMEM.
    """
    x = px_ref[0, :]
    y = px_ref[1, :]
    ux = px_ref[2, :]
    uy = px_ref[3, :]
    alpha = px_ref[4, :]
    alpha_k = px_ref[5, :]
    valid = px_ref[6, :]
    lane = jax.lax.broadcasted_iota(jnp.int32, (2, n_hyp), 1)

    def body(h, acc):
        vx = hyp_ref[h, 0]
        vy = hyp_ref[h, 1]
        vz = hyp_ref[h, 2]
        wx = hyp_ref[h, 3]
        wy = hyp_ref[h, 4]
        wz = hyp_ref[h, 5]
        k = hyp_ref[h, 6]

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
        num = jnp.sum(inl.astype(jnp.float32))
        esum = jnp.sum(jnp.where(inl, err, jnp.float32(0.0)))
        # Mosaic forbids scalar stores: accumulate via a one-hot lane mask
        # (row 0 = counts, row 1 = error sums).
        row = jax.lax.broadcasted_iota(jnp.int32, (2, n_hyp), 0)
        upd = jnp.where(row == 0, num, esum)
        return acc + jnp.where(lane == h, upd, jnp.float32(0.0))

    acc = jax.lax.fori_loop(0, n_hyp, body,
                            jnp.zeros((2, n_hyp), jnp.float32))
    out_ref[0, :, :] = acc


@functools.partial(jax.jit, static_argnames=("tol", "interpret"))
def score_hypotheses_pallas(pixels, hyps, tol: float, interpret: bool = False):
    """Score all hypotheses against all pixels.

    Args:
      pixels: (8, N) f32 packed pixel fields (N multiple of TILE).
      hyps: (T, 8) f32 packed hypotheses.
      tol: inlier tolerance (static).

    Returns:
      (num_inliers (T,) f32, inlier_error (T,) f32).
    """
    _, n = pixels.shape
    n_hyp = hyps.shape[0]
    assert n % TILE == 0, n
    tiles = n // TILE

    out = pl.pallas_call(
        functools.partial(_score_kernel, tol=tol, n_hyp=n_hyp),
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((n_hyp, 8), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, n_hyp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tiles, 2, n_hyp), jnp.float32),
        interpret=interpret,
    )(hyps, pixels)
    sums = out.sum(axis=0)  # (2, T)
    return sums[0], sums[1]


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
