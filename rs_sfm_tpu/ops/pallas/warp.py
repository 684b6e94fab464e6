"""Fused Pallas bilinear-warp kernel for dense-flow warping.

Motivation: XLA lowers per-pixel gathers to a slow path on TPU — a single
full-HD bilinear warp costs ~85-110 ms regardless of formulation (4x 2D
gather, flat 1D gather, take_along_axis; measured, scripts/profile_warp.py)
and dominates dense_flow (3 warps/level).  This kernel removes the gather:

  * the flow field is smooth almost everywhere (it comes from coarse-level
    upsampling + small variational updates), so per output block the
    integer part of the displacement is nearly constant;
  * XLA pre-pass: per-block mean flow -> integer window origin per block;
  * kernel: one dynamic-slice DMA pulls the (block + 2R halo) input window
    HBM->VMEM, then bilinear interpolation is a static shift-select sum
      out = sum_{dy,dx} wy(dy)*wx(dx) * window[dy:dy+BH, dx:dx+BW]
    over (2R+2)^2 static slices — pure VPU, no gather;
  * pixels whose residual displacement (after removing the block offset)
    exceeds R are clamped to the window edge: they sample a slightly wrong
    location.  Those pixels sit on motion-discontinuity blocks, where the
    robust (Charbonnier) data term downweights them anyway.  For
    |residual| <= R the result is bit-exact vs the XLA reference warp,
    including image-border clamp semantics (edge-replicated padding).

Reference context: the warp implements the same resampling as the
variational solver's per-warp I2 alignment (flow/dense.py::_warp); the
reference's DeepFlow does this inside OpenCV (src/camera.cc:253-277).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


def _kernel(oy_ref, ox_ref, u_ref, v_ref, img_ref, out_ref, win, aligned,
            sem, *, bh, bw, wh, ww, dmax, h, w, pad):
    bi = pl.program_id(0)
    bj = pl.program_id(1)
    oy = oy_ref[bi, bj]
    ox = ox_ref[bi, bj]
    # DMA offsets must be tile-aligned (8 sublanes / 128 lanes): fetch from
    # the aligned-down origin and realign in VMEM with a dynamic roll.
    oy_al = (oy // 8) * 8
    ox_al = (ox // 128) * 128
    cp = pltpu.make_async_copy(
        img_ref.at[pl.ds(oy_al, wh), pl.ds(ox_al, ww)], win, sem)
    cp.start()

    dtype = out_ref.dtype
    r = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1)
    gy = (bi * bh + r).astype(dtype)
    gx = (bj * bw + c).astype(dtype)
    x = jnp.clip(gx + u_ref[:], 0.0, w - 1.0)
    y = jnp.clip(gy + v_ref[:], 0.0, h - 1.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    # Window-local corner slots relative to each output pixel's position;
    # pad = edge padding added to the image before the call.
    dyi = jnp.clip(y0.astype(jnp.int32) + pad - oy - r, 0, dmax - 2)
    dxi = jnp.clip(x0.astype(jnp.int32) + pad - ox - c, 0, dmax - 2)

    # Block-level bounds on the populated dy slots: a smooth-flow block
    # touches only a few of the dmax row slots; whole dy rows are skipped
    # via predication (branch overhead per section is the cost driver, so
    # only the outer loop is predicated — the inner dx loop runs straight).
    dyi_min = jnp.min(dyi)
    dyi_max = jnp.max(dyi) + 1  # +1: the fy corner sits one slot below

    out_ref[:] = jnp.zeros((bh, bw), dtype)
    cp.wait()
    aligned[:] = pltpu.roll(
        pltpu.roll(win[:], -(oy - oy_al), 0), -(ox - ox_al), 1)
    for dy in range(dmax):
        @pl.when((dy >= dyi_min) & (dy <= dyi_max))
        def _(dy=dy):
            wy = (jnp.where(dyi == dy, 1.0 - fy, 0.0)
                  + jnp.where(dyi == dy - 1, fy, 0.0))
            acc = jnp.zeros((bh, bw), dtype)
            for dx in range(dmax):
                wx = (jnp.where(dxi == dx, 1.0 - fx, 0.0)
                      + jnp.where(dxi == dx - 1, fx, 0.0))
                acc = acc + wx * aligned[dy:dy + bh, dx:dx + bw]
            out_ref[:] += wy * acc


def bilinear_warp(img, flow, *, radius: int = 6, block=(40, 128),
                  interpret=None):
    if interpret is None:
        # Interpreter on CPU (tests); compiled Mosaic elsewhere.
        interpret = jax.default_backend() == "cpu"
    return _bilinear_warp(img, flow, radius=radius, block=block,
                          interpret=interpret)


@functools.partial(jax.jit,
                   static_argnames=("radius", "block", "interpret"))
def _bilinear_warp(img, flow, *, radius: int, block,
                   interpret: bool):
    """Bilinear sample img at (x + flow), Pallas-fused (see module doc).

    Args:
      img: (H, W) float32 image.
      flow: (H, W, 2) pixel flow; flow[..., 0] = x, flow[..., 1] = y.
      radius: max residual displacement (px) captured exactly after the
        per-block integer offset is removed; larger residuals clamp.
      block: (BH, BW) output block — BH a multiple of 8, BW of 128 (TPU
        tiling); H, W are padded up to multiples.  (40, 128) divides the
        full-HD pyramid levels exactly.
      interpret: run in interpreter mode (CPU testing).

    Returns:
      (H, W) warped image; out-of-bounds samples clamp to the edge
      (identical semantics to flow.dense._warp).
    """
    h, w = img.shape
    bh, bw = block
    dtype = img.dtype
    nbi = _cdiv(h, bh)
    nbj = _cdiv(w, bw)
    hp, wp = nbi * bh, nbj * bw
    # Slots span [0, 2·radius+2] for a feasible block (spread ≤ 2·radius+1
    # plus midrange rounding), and the fx/fy corner sits one slot further.
    dmax = 2 * radius + 4

    # Window dims: hold block + slot halo + the realignment margin (up to
    # 7 sublanes / 127 lanes, the gap between a tile-aligned DMA origin and
    # the true window origin), AND have a power-of-two tile count — the
    # dynamic in-VMEM roll that undoes the alignment gap silently corrupts
    # data on non-power-of-two tile counts (measured on v5e).
    def _pow2_tiles(n, tile):
        m = tile
        while m < n:
            m *= 2
        return m

    wh = _pow2_tiles(bh + dmax + 8, 8)
    ww = _pow2_tiles(bw + dmax + 128, 128)
    # Pad by dmax on every side (edge-replicate): windows for any feasible
    # block (effective-displacement spread ≤ 2·radius+1) stay in-bounds
    # without origin clipping, and border clamps resolve to the true edge
    # pixel.  Bottom/right additionally absorb the block-alignment pad.
    pad = dmax

    u = flow[..., 0]
    v = flow[..., 1]
    # Per-block window origins from the effective (clip-applied, floored)
    # displacement midrange — robust at image borders, where coordinate
    # clamping compresses the displacement spread back into range.  Stats
    # are computed on the REAL grid, then edge-padded (padded rows/cols
    # must not distort a block's displacement range).
    ys = jnp.arange(h, dtype=dtype)[:, None]
    xs = jnp.arange(w, dtype=dtype)[None, :]
    dispx = jnp.floor(jnp.clip(xs + u, 0.0, w - 1.0)) - xs
    dispy = jnp.floor(jnp.clip(ys + v, 0.0, h - 1.0)) - ys
    # Range stats count only pixels whose target lies in-image: at borders
    # the coordinate clamp turns out-of-view flow into a displacement ramp
    # whose spread would blow the block's slot budget and corrupt its
    # in-bounds neighbors.  Out-of-view pixels themselves clamp to a wrong
    # in-window sample (documented lossy case).
    inb_x = ((xs + u >= 0.0) & (xs + u <= w - 1.0)).astype(dtype)
    inb_y = ((ys + v >= 0.0) & (ys + v <= h - 1.0)).astype(dtype)

    if (hp, wp) != (h, w):
        widths = ((0, hp - h), (0, wp - w))
        u = jnp.pad(u, widths, mode="edge")
        v = jnp.pad(v, widths, mode="edge")
        dispx = jnp.pad(dispx, widths, mode="edge")
        dispy = jnp.pad(dispy, widths, mode="edge")
        inb_x = jnp.pad(inb_x, widths, mode="edge")
        inb_y = jnp.pad(inb_y, widths, mode="edge")
    # Bottom/right absorb block-alignment padding plus a full window so the
    # origin clip below never engages for a feasible block.
    img_pad = jnp.pad(img, ((pad, pad + hp - h + wh),
                            (pad, pad + wp - w + ww)), mode="edge")
    himg, wimg = img_pad.shape

    big = jnp.asarray(1e9, dtype)

    def _midrange(d, m):
        blocks = d.reshape(nbi, bh, nbj, bw)
        mask = m.reshape(nbi, bh, nbj, bw) > 0.5
        lo = jnp.where(mask, blocks, big).min(axis=(1, 3))
        hi = jnp.where(mask, blocks, -big).max(axis=(1, 3))
        # Blocks with no in-bounds pixel fall back to unmasked stats.
        any_in = mask.any(axis=(1, 3))
        lo = jnp.where(any_in, lo, blocks.min(axis=(1, 3)))
        hi = jnp.where(any_in, hi, blocks.max(axis=(1, 3)))
        return jnp.round((lo + hi) * 0.5).astype(jnp.int32)

    bi_idx = jnp.arange(nbi, dtype=jnp.int32)[:, None]
    bj_idx = jnp.arange(nbj, dtype=jnp.int32)[None, :]
    off = pad - (radius + 1)
    oy = jnp.clip(bi_idx * bh + _midrange(dispy, inb_y) + off, 0, himg - wh)
    ox = jnp.clip(bj_idx * bw + _midrange(dispx, inb_x) + off, 0, wimg - ww)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nbi, nbj),
        in_specs=[
            pl.BlockSpec((bh, bw), lambda i, j, *_: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bh, bw), lambda i, j, *_: (i, j),
                         memory_space=pltpu.VMEM),
            # Keep the padded image in HBM: DMA supports arbitrary element
            # offsets there, while VMEM memref slicing requires 8-row
            # alignment the data-dependent window origins can't prove.
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((bh, bw), lambda i, j, *_: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((wh, ww), dtype),
            pltpu.VMEM((wh, ww), dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = functools.partial(_kernel, bh=bh, bw=bw, wh=wh, ww=ww,
                               dmax=dmax, h=h, w=w, pad=pad)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((hp, wp), dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(oy, ox, u, v, img_pad)
    return out[:h, :w]
