"""Fused 3x3 median filter kernel (flow post-smoothing).

The XLA formulation of flow/dense._median3 (9 edge-clamped shifts + a
19-comparator sorting network) measures 3.2 ms PER PLANE at full-HD on
the TPU — ~10x its HBM roofline, and with 2 planes x 3 warps per level it
was the single largest cost of the finest pyramid level (measured,
results/profile_r4c).  This kernel runs the same network on VMEM-resident
row blocks: one pass over HBM for any number of planes.

Boundary convention: edge-clamp (Neumann), identical to dense._shift2 —
enforced in-kernel by masking rolled neighbors with the GLOBAL row/column
index.  Shapes are arbitrary (edge-padded to lane/block multiples; pad
values never reach the interior through the 1-pixel stencil because the
masks stop propagation at the true edges).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH = 120  # interior rows per block


def _median_kernel(x_ref, out_ref, *, h_total: int, w_total: int,
                   nplanes: int):
    """x_ref: (1, P, TH+2, W) VMEM; out_ref: (1, P, TH, W)."""
    rows = x_ref.shape[2]
    cols = x_ref.shape[3]
    ys = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    gy = ys + pl.program_id(0) * TH - 1
    top = gy <= 0
    bot = gy >= h_total - 1
    lf = xs == 0
    rt = xs >= w_total - 1

    def _roll(z, shift, axis):
        return pltpu.roll(z, shift % z.shape[axis], axis)

    for p in range(nplanes):
        z = x_ref[0, p]
        up = jnp.where(top, z, _roll(z, 1, 0))
        dn = jnp.where(bot, z, _roll(z, -1, 0))

        def row3(r):
            le = jnp.where(lf, r, _roll(r, 1, 1))
            ri = jnp.where(rt, r, _roll(r, -1, 1))
            return le, r, ri

        v = list(row3(up) + row3(z) + row3(dn))

        def cas(a, b):
            return jnp.minimum(a, b), jnp.maximum(a, b)

        pairs = [(0, 1), (3, 4), (6, 7), (1, 2), (4, 5), (7, 8), (0, 1),
                 (3, 4), (6, 7), (0, 3), (5, 8), (4, 7), (3, 6), (1, 4),
                 (2, 5), (4, 7), (4, 2), (6, 4), (4, 2)]
        for a, b in pairs:
            v[a], v[b] = cas(v[a], v[b])
        out_ref[0, p] = v[4][1:1 + TH]


def supported(h: int, w: int) -> bool:
    return h >= 32 and w >= 64


def median3_planes(planes, *, interpret=None):
    """3x3 edge-clamped median of (P, H, W) planes in one fused pass."""
    p, h, w = planes.shape
    assert supported(h, w), (h, w)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    wp = (-w) % 128
    hp = (-h) % TH
    hh, ww = h + hp, w + wp
    x = planes
    if wp or hp:
        x = jnp.pad(x, ((0, 0), (0, hp), (0, wp)), mode="edge")
    nb = hh // TH
    # Overlapping row windows with a 1-row halo (wrap rows are masked by
    # the global-row conditions in-kernel).
    xp = jnp.concatenate([x[:, hh - 1:, :], x, x[:, :1, :]], axis=1)

    def grab(b):
        return jax.lax.dynamic_slice_in_dim(xp, b * TH, TH + 2, axis=1)

    blocks = jax.vmap(grab)(jnp.arange(nb))  # (NB, P, TH+2, W)
    out = pl.pallas_call(
        functools.partial(_median_kernel, h_total=h, w_total=w, nplanes=p),
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, p, TH + 2, ww), lambda b: (b, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, p, TH, ww), lambda b: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nb, p, TH, ww), planes.dtype),
        interpret=interpret,
    )(blocks)
    return out.transpose(1, 0, 2, 3).reshape(p, hh, ww)[:, :h, :w]
