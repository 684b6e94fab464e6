"""Pallas z-buffered rectification splat (scatter-free, target-side search).

The rectification scatter (rectify/backproject.py) is the last XLA-scatter
op on the hot path: `buf.at[idx].min(packed)` over 2M pixels lowers to a
serialized scatter-min on TPU (~30 ms at full-HD, ~500x the HBM roofline
— results/tpu_validate.json).  This kernel removes the scatter by turning
the splat into a TARGET-SIDE search, the same blocked shift-select trick
as ops/pallas/warp.py:

  * XLA pre-pass: per TARGET block, estimate the source window that could
    splat into it — the (approximate) inverse displacement consensus,
    computed as the negated midrange of the forward displacement over the
    block's own coordinates (valid because the displacement field is
    smooth almost everywhere; sources whose displacement deviates from
    the block consensus by more than `radius` are missed and leave a
    crack, exactly the lossy case of the forward warp kernel, handled by
    rectify/crackfill.py and recorded in the `scattered` mask);
  * kernel: DMA the 6 source planes (target x, target y, target-camera
    depth, R, G, B) of the window into VMEM, then for each of the
    (2R+2)^2 static shifts test "does this source pixel round-project to
    ME, and is it nearer than my current winner?" — pure VPU compares and
    selects, no gather, no scatter;
  * conflict resolution: strictly nearer depth wins (exact f32 compare —
    finer than the packed engine's quantized depth); equal depths keep
    the first winner in the fixed shift order (deterministic).

Reference context: src/rsframe.cc:803-839 (backProject), whose
last-writer-wins scan order this replaces with a deterministic z-buffer,
like the XLA engines.

STATUS (measured, results/zbuffer_profile.json): on the realistic
full-HD castle scene this kernel TIES the packed XLA scatter (54.3 vs
53.0 ms) while missing ~5% of splats — RS rectification displacements
(130 px mean, 40+ px block spread at depth edges) defeat the
block-consensus window.  It remains the experimental engine
(`backproject(method="pallas")`); the production default stays "packed".
A decisive win requires binned source routing by target tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a, b):
    return -(-a // b)


def _pow2_tiles(n, tile):
    m = tile
    while m < n:
        m *= 2
    return m


def _kernel(oy_ref, ox_ref, plane_refs, out_refs, scratch, *, bh, bw,
            wh, ww, dmax, pad, n_planes):
    bi = pl.program_id(0)
    bj = pl.program_id(1)
    oy = oy_ref[bi, bj]
    ox = ox_ref[bi, bj]
    oy_al = (oy // 8) * 8
    ox_al = (ox // 128) * 128

    wins = scratch[:n_planes]
    aligned = scratch[n_planes:2 * n_planes]
    scratch_best = scratch[2 * n_planes:2 * n_planes + 4]
    sems = scratch[2 * n_planes + 4]
    cps = []
    for p in range(n_planes):
        cp = pltpu.make_async_copy(
            plane_refs[p].at[pl.ds(oy_al, wh), pl.ds(ox_al, ww)],
            wins[p], sems.at[p])
        cp.start()
        cps.append(cp)

    dtype = out_refs[0].dtype
    r = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1)
    # Global target coordinates of this block's pixels.
    gy = (bi * bh + r).astype(dtype)
    gx = (bj * bw + c).astype(dtype)

    for p in range(n_planes):
        cps[p].wait()
        aligned[p][:] = pltpu.roll(
            pltpu.roll(wins[p][:], -(oy - oy_al), 0), -(ox - ox_al), 1)

    big = jnp.asarray(3.0e38, dtype)
    best_d = scratch_best[0]
    best_d[:] = jnp.full((bh, bw), big, dtype)
    for ch in range(3):
        scratch_best[1 + ch][:] = jnp.zeros((bh, bw), dtype)

    # Row-slot predication (same trick as ops/pallas/warp.py): a source at
    # window row r_w targeting block-relative row t_rel is touched only at
    # slot dy = r_w - t_rel, so whole dy sections with no such source are
    # skipped — the loop cost tracks the ACTUAL displacement spread, not
    # the radius budget.
    rw = jax.lax.broadcasted_iota(jnp.int32, aligned[1].shape, 0)
    ty_all = aligned[1][:]
    t_rel = jnp.floor(ty_all + 0.5).astype(jnp.int32) - bi * bh
    inblock = ((t_rel >= 0) & (t_rel < bh) & (ty_all > -1.0e5))
    slot = rw - t_rel
    slot_min = jnp.min(jnp.where(inblock, slot, dmax))
    slot_max = jnp.max(jnp.where(inblock, slot, 0))

    for dy in range(dmax):
        @pl.when((dy >= slot_min) & (dy <= slot_max))
        def _(dy=dy):
            bd = best_d[:]
            br = [scratch_best[1 + ch][:] for ch in range(3)]
            for dx in range(dmax):
                tx = aligned[0][dy:dy + bh, dx:dx + bw]
                ty = aligned[1][dy:dy + bh, dx:dx + bw]
                d = aligned[2][dy:dy + bh, dx:dx + bw]
                # Reference rounding: int(t + 0.5) (src/rsframe.cc:831).
                hit = ((jnp.floor(tx + 0.5) == gx)
                       & (jnp.floor(ty + 0.5) == gy)
                       & (d < bd))
                bd = jnp.where(hit, d, bd)
                for ch in range(3):
                    col = aligned[3 + ch][dy:dy + bh, dx:dx + bw]
                    br[ch] = jnp.where(hit, col, br[ch])
            best_d[:] = bd
            for ch in range(3):
                scratch_best[1 + ch][:] = br[ch]

    scattered = best_d[:] < big
    for ch in range(3):
        out_refs[ch][:] = scratch_best[1 + ch][:]
    out_refs[3][:] = jnp.where(scattered, 1.0, 0.0).astype(dtype)


@functools.partial(jax.jit, static_argnames=("radius", "block",
                                             "interpret"))
def zbuffer_splat(target_x, target_y, depth, colors, *, radius: int = 12,
                  block=(40, 128), interpret=None):
    """Scatter-free z-buffered splat.

    Args:
      target_x, target_y: (H, W) float target coordinates per SOURCE pixel
        (non-finite or out-of-range = source does not splat).
      depth: (H, W) target-camera depth per source (inf = invalid).
      colors: (H, W, 3) float source colors.
      radius: residual budget (px) around the per-target-block inverse
        consensus; deviating sources are missed (cracks).
      block: (BH, BW) target block — BH multiple of 8, BW of 128.

    Returns:
      (gs_image (H, W, 3), scattered (H, W) bool).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    h, w = depth.shape
    bh, bw = block
    dtype = jnp.float32
    nbi = _cdiv(h, bh)
    nbj = _cdiv(w, bw)
    hp, wp = nbi * bh, nbj * bw
    dmax = 2 * radius + 4
    wh = _pow2_tiles(bh + dmax + 8, 8)
    ww = _pow2_tiles(bw + dmax + 128, 128)
    pad = dmax

    tx = target_x.astype(dtype)
    ty = target_y.astype(dtype)
    d = depth.astype(dtype)
    finite = jnp.isfinite(tx) & jnp.isfinite(ty) & jnp.isfinite(d)
    inb = (finite & (tx > -0.5) & (tx < w - 0.5)
           & (ty > -0.5) & (ty < h - 0.5))
    big = 3.0e38
    # Invalid sources: park the target far outside so no shift matches.
    tx = jnp.where(inb, tx, -1.0e6)
    ty = jnp.where(inb, ty, -1.0e6)
    d = jnp.where(inb, d, big)

    # Forward displacement of each source; the inverse consensus for a
    # target block is the negated midrange over the block's coordinates.
    ys = jnp.arange(h, dtype=dtype)[:, None]
    xs = jnp.arange(w, dtype=dtype)[None, :]
    dispx = jnp.where(inb, tx - xs, 0.0)
    dispy = jnp.where(inb, ty - ys, 0.0)
    inbf = inb.astype(dtype)

    planes = [tx, ty, d, colors[..., 0].astype(dtype),
              colors[..., 1].astype(dtype), colors[..., 2].astype(dtype)]
    if (hp, wp) != (h, w):
        widths = ((0, hp - h), (0, wp - w))
        pvals = [-1.0e6, -1.0e6, big, 0.0, 0.0, 0.0]
        planes = [jnp.pad(p, widths, constant_values=v)
                  for p, v in zip(planes, pvals)]
        dispx = jnp.pad(dispx, widths)
        dispy = jnp.pad(dispy, widths)
        inbf = jnp.pad(inbf, widths)
    pvals = [-1.0e6, -1.0e6, big, 0.0, 0.0, 0.0]
    planes = [jnp.pad(p, ((pad, pad + wh), (pad, pad + ww)),
                      constant_values=v)
              for p, v in zip(planes, pvals)]
    himg, wimg = planes[0].shape

    def _midrange(dd, m):
        blocks = dd.reshape(nbi, bh, nbj, bw)
        mask = m.reshape(nbi, bh, nbj, bw) > 0.5
        bigc = jnp.asarray(1e9, dtype)
        lo = jnp.where(mask, blocks, bigc).min(axis=(1, 3))
        hi = jnp.where(mask, blocks, -bigc).max(axis=(1, 3))
        any_in = mask.any(axis=(1, 3))
        lo = jnp.where(any_in, lo, 0.0)
        hi = jnp.where(any_in, hi, 0.0)
        return jnp.round((lo + hi) * 0.5).astype(jnp.int32)

    bi_idx = jnp.arange(nbi, dtype=jnp.int32)[:, None]
    bj_idx = jnp.arange(nbj, dtype=jnp.int32)[None, :]
    off = pad - (radius + 1)
    # Source-window origin for target block (bi,bj): its own coordinates
    # MINUS the local displacement consensus (approximate inverse).
    oy = jnp.clip(bi_idx * bh - _midrange(dispy, inbf) + off, 0, himg - wh)
    ox = jnp.clip(bj_idx * bw - _midrange(dispx, inbf) + off, 0, wimg - ww)

    n_planes = len(planes)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nbi, nbj),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * n_planes,
        out_specs=[pl.BlockSpec((bh, bw), lambda i, j, *_: (i, j),
                                memory_space=pltpu.VMEM)] * 4,
        scratch_shapes=(
            [pltpu.VMEM((wh, ww), dtype)] * (2 * n_planes)
            + [pltpu.VMEM((bh, bw), dtype)] * 4
            + [pltpu.SemaphoreType.DMA((n_planes,))]),
    )

    def kernel(oy_r, ox_r, *refs):
        plane_refs = refs[:n_planes]
        out_refs = refs[n_planes:n_planes + 4]
        scratch = refs[n_planes + 4:]
        _kernel(oy_r, ox_r, plane_refs, out_refs, list(scratch),
                bh=bh, bw=bw, wh=wh, ww=ww, dmax=dmax, pad=pad,
                n_planes=n_planes)

    outs = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((hp, wp), dtype)] * 4,
        grid_spec=grid_spec,
        interpret=interpret,
    )(oy, ox, *planes)
    gs = jnp.stack([o[:h, :w] for o in outs[:3]], axis=-1)
    scattered = outs[3][:h, :w] > 0.5
    return gs, scattered
