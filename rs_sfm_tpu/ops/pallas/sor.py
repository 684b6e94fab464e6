"""Fused multi-sweep red-black SOR kernel for the variational flow solver.

The XLA formulation of the flow solver's inner loop (flow/dense.py
_level_solve) streams ~12 coefficient planes + (u, v) through HBM on EVERY
red-black sweep: at full-HD that is ~20 sweeps x 2 colors x ~14 planes x
8 MB of traffic per warp iteration, measuring as ~66 ms of the 122 ms
dense-flow budget.  This kernel runs SWEEPS_PER_CALL sweeps over a
VMEM-resident row block, so the planes are read from HBM once per K sweeps
instead of once per sweep.

Exactness (identical iteration semantics to the XLA loop):
  * the image is cut into row blocks with a halo of K = 2·sweeps rows on
    each side; the red-black dependence cone grows one row per COLOR (two
    per sweep: the second color reads the first color's fresh values), so
    after s in-VMEM sweeps every row further than 2s rows from the block
    edge equals what the global sweep would produce — writing only the
    interior TH rows reproduces the global iteration exactly;
  * boundary convention is Neumann (edge-clamped: the missing neighbor
    beyond an image edge is the edge pixel itself), matching
    flow/dense.py's `_shift`-based neighbor average; enforced in-kernel by
    masking the rolled neighbor with the GLOBAL row/column index, so halo
    rows beyond the first/last image row never influence the interior;
  * red-black order, over-relaxation, and lagged-diffusivity weights are
    the same expressions as flow/dense.py point_solve;
  * the checkerboard phase uses GLOBAL row parity: block b starts at
    global row b·TH − K with TH even and H even, so the local phase is
    (y + x + K) mod 2 for every block.

Shapes: any (H, W) with min size ~32x64 (smaller levels stay on the XLA
loop — see `supported`); the wrapper edge-pads columns to a lane multiple
and rows to a TH multiple, and the in-kernel Neumann masks at the TRUE
edges keep pad values out of the interior.  Census term must be off (its
24 extra planes do not fit VMEM).  Round-4 note: the earlier
W-multiple-of-128 restriction silently forced every non-finest pyramid
level (540x960, 270x480, ...) onto the XLA loop — the measured ~46 ms
pyramid tail of the full-HD flow budget (results/profile_r4.json).

Plane order in the packed (8, H, W) coefficient array:
  0 ix   1 iy   2 c    3 ixx  4 ixy  5 iyy  6 cgx  7 cgy
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH = 24              # interior rows per block (even; divides 1080)
# Sweeps fused per launch: halo = 2·sweeps rows per side.  (TH=24, K=4)
# keeps the (8+2-plane) block + vector temporaries comfortably under the
# 16 MB scoped-VMEM limit at W = 1920 in any surrounding-jit context
# ((40, 5) fit standalone but OOMed by ~0.3 MB composed under
# flow_forward_backward).
SWEEPS_PER_CALL = 4


def _sor_kernel(coef_ref, uv_ref, out_ref, *, sweeps: int, omega: float,
                lam: float, eps2: float, wbr: float, wgrad: float,
                h_total: int, w_total: int):
    """`sweeps` red-black SOR sweeps on one wrap-padded row block.

    coef_ref: (1, 8, TH+2K, W) VMEM; uv_ref: (1, 2, TH+2K, W) VMEM;
    out_ref: (1, 2, TH, W) VMEM (interior rows after the sweeps).
    h_total / w_total are the TRUE image dims: rows/columns beyond them
    are lane/sublane padding whose values never reach the true interior
    (the Neumann masks below stop propagation at the true edges).
    """
    k = 2 * sweeps  # halo rows (cone: one row per color, two per sweep)
    ix = coef_ref[0, 0]
    iy = coef_ref[0, 1]
    c = coef_ref[0, 2]
    ixx = coef_ref[0, 3]
    ixy = coef_ref[0, 4]
    iyy = coef_ref[0, 5]
    cgx = coef_ref[0, 6]
    cgy = coef_ref[0, 7]
    u = uv_ref[0, 0]
    v = uv_ref[0, 1]

    rows, cols = u.shape

    def _roll(x, shift, axis):
        # pltpu.roll requires non-negative shifts; rolls are circular.
        return pltpu.roll(x, shift % x.shape[axis], axis)

    ys = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    checker = ((ys + xs + k) % 2).astype(u.dtype)  # k even ⇒ global phase
    # Global row index of each window row (block b starts at b·TH − K).
    gy = ys + pl.program_id(0) * TH - k
    top = gy == 0
    bot = gy == h_total - 1
    lf = xs == 0
    rt = xs == w_total - 1

    def navg(z):
        # Neumann (edge-clamped) neighbor average on GLOBAL image edges;
        # interior block edges read true neighbor rows from the halo.
        up_n = jnp.where(top, z, _roll(z, 1, 0))
        dn_n = jnp.where(bot, z, _roll(z, -1, 0))
        lf_n = jnp.where(lf, z, _roll(z, 1, 1))
        rt_n = jnp.where(rt, z, _roll(z, -1, 1))
        return (up_n + dn_n + lf_n + rt_n) * 0.25

    for _ in range(sweeps):
        for color in (0.0, 1.0):
            # Lagged-diffusivity weights at the CURRENT (u, v) — exactly
            # flow/dense.py point_solve.
            r = ix * u + iy * v + c
            wd = wbr * jax.lax.rsqrt(r * r + eps2)
            rgx = cgx + ixx * u + ixy * v
            rgy = cgy + ixy * u + iyy * v
            wg = wgrad * jax.lax.rsqrt(rgx * rgx + rgy * rgy + eps2)

            ubar = navg(u)
            vbar = navg(v)
            a11 = lam + wd * ix * ix + wg * (ixx * ixx + ixy * ixy)
            a12 = wd * ix * iy + wg * (ixx * ixy + ixy * iyy)
            a22 = lam + wd * iy * iy + wg * (ixy * ixy + iyy * iyy)
            b1 = lam * ubar - wd * ix * c - wg * (ixx * cgx + ixy * cgy)
            b2 = lam * vbar - wd * iy * c - wg * (ixy * cgx + iyy * cgy)
            det = a11 * a22 - a12 * a12
            det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
            u_new = (a22 * b1 - a12 * b2) / det
            v_new = (a11 * b2 - a12 * b1) / det
            mask = jnp.where(checker == color, omega, 0.0)
            u = u + mask * (u_new - u)
            v = v + mask * (v_new - v)

    out_ref[0, 0] = u[k:k + TH]
    out_ref[0, 1] = v[k:k + TH]


def _window_rows(x, th: int, k: int):
    """(P, H, W) → (NB, P, th+2k, W) overlapping wrap-padded row blocks."""
    h = x.shape[-2]
    nb = h // th
    xp = jnp.concatenate([x[..., h - k:, :], x, x[..., :k, :]], axis=-2)

    def grab(b):
        return jax.lax.dynamic_slice_in_dim(xp, b * th, th + 2 * k, axis=-2)

    return jax.vmap(grab)(jnp.arange(nb))


def supported(h: int, w: int, census_weight: float) -> bool:
    """Arbitrary shapes are handled by edge-replicated padding (columns to
    a lane multiple, rows to a TH multiple; the in-kernel Neumann masks at
    the TRUE edges stop pad values from reaching the interior).  Tiny
    levels stay on the XLA loop — the padding overhead dominates there and
    the XLA sweeps are already cheap at those sizes."""
    return census_weight == 0.0 and h >= 32 and w >= 64


def sor_sweeps_pallas(coef, u, v, *, iters: int, omega: float, lam: float,
                      eps2: float, wbr: float, wgrad: float,
                      interpret=None):
    """Run `iters` red-black SOR sweeps (exact flow/dense.py semantics).

    Args:
      coef: (8, H, W) packed coefficient planes (see module docstring).
      u, v: (H, W) current flow components.

    Returns:
      (u, v) after the sweeps.
    """
    h, w = u.shape
    assert supported(h, w, 0.0), (h, w)
    if interpret is None:
        # Auto: Mosaic on TPU, interpreter on CPU (tests).
        interpret = jax.default_backend() == "cpu"

    # Edge-replicated padding to kernel-friendly shapes.  Pad rows/columns
    # sit beyond the true Neumann boundary: the kernel masks neighbor
    # reads at (h-1, w-1), so pad values never influence true pixels, and
    # the output is sliced back to (h, w).
    wp = (-w) % 128
    hp = (-h) % TH
    hh, ww = h + hp, w + wp
    if wp or hp:
        pad2 = ((0, hp), (0, wp))
        coef = jnp.pad(coef, ((0, 0),) + pad2, mode="edge")
        u = jnp.pad(u, pad2, mode="edge")
        v = jnp.pad(v, pad2, mode="edge")

    nb = hh // TH
    n_full, rem = divmod(iters, SWEEPS_PER_CALL)
    schedule = [SWEEPS_PER_CALL] * n_full + ([rem] if rem else [])

    for sweeps in schedule:
        halo = 2 * sweeps
        cb = _window_rows(coef, TH, halo)                 # (NB, 8, ·, W)
        uvb = _window_rows(jnp.stack([u, v]), TH, halo)   # (NB, 2, ·, W)
        call = pl.pallas_call(
            functools.partial(_sor_kernel, sweeps=sweeps, omega=omega,
                              lam=lam, eps2=eps2, wbr=wbr, wgrad=wgrad,
                              h_total=h, w_total=w),
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, 8, TH + 2 * halo, ww),
                             lambda b: (b, 0, 0, 0)),
                pl.BlockSpec((1, 2, TH + 2 * halo, ww),
                             lambda b: (b, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 2, TH, ww), lambda b: (b, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((nb, 2, TH, ww), u.dtype),
            interpret=interpret,
        )
        out = call(cb, uvb)
        u = out[:, 0].reshape(hh, ww)
        v = out[:, 1].reshape(hh, ww)
    return u[:h, :w], v[:h, :w]
