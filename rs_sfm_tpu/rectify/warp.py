"""Small-motion flow-based warping — the reference's alternative
rectification (RsFrame::smallMotionWrapping, src/rsframe.cc:881-949).

Instead of back-projecting through the depth map, each pixel is shifted by
the model-predicted flow u = β₁(i)·(A·v/Z + B·w) rounded to integer pixels.
Conflicts resolve like backproject (min-depth z-buffer).
"""

from __future__ import annotations

import jax.numpy as jnp

from rs_sfm_tpu.geom.camera import Intrinsics, normalize_coords, pixel_grid
from rs_sfm_tpu.geom.rspose import beta1
from rs_sfm_tpu.rectify.backproject import BackprojectResult, _is_void_color
from rs_sfm_tpu.solver.flow_model import rotational_flow, translational_flow


def small_motion_warp(image, depth_map, v, w, k, gamma,
                      intr: Intrinsics) -> BackprojectResult:
    """Warp the RS image to scanline-0 time by the differential flow model.

    Matches the reference semantics: per pixel at row i, displacement
    −β₁(i)·(A·v/Z + B·w) in normalized units scaled to pixels (moving each
    pixel back to the scanline-0 pose), nearest-integer target.
    """
    h, w_cols = depth_map.shape
    dtype = depth_map.dtype
    grid = pixel_grid(h, w_cols, dtype=dtype)
    coords = normalize_coords(grid, intr)
    b1 = beta1(grid[..., 1], h, gamma, k)

    safe_z = jnp.where(depth_map == 0.0, jnp.ones_like(depth_map), depth_map)
    rho = jnp.where(depth_map == 0.0, jnp.zeros_like(depth_map),
                    1.0 / safe_z)
    u = (translational_flow(coords, jnp.asarray(v, dtype)) * rho[..., None]
         + rotational_flow(coords, jnp.asarray(w, dtype))) * b1[..., None]
    du = -u * jnp.asarray([intr.fx, intr.fy], dtype)

    valid = (depth_map != 0.0) & ~_is_void_color(image)
    px = jnp.floor(grid[..., 0] + du[..., 0] + 0.5).astype(jnp.int32)
    py = jnp.floor(grid[..., 1] + du[..., 1] + 0.5).astype(jnp.int32)
    in_bounds = (px >= 0) & (px < w_cols) & (py >= 0) & (py < h)
    write = valid & in_bounds

    n = h * w_cols
    flat_idx = jnp.where(write, py * w_cols + px, n).reshape(-1)
    src_depth = jnp.where(write, depth_map, jnp.inf).reshape(-1)
    colors = image.reshape(n, 3)

    zbuf = jnp.full((n + 1,), jnp.inf, dtype=dtype)
    zbuf = zbuf.at[flat_idx].min(src_depth)
    is_winner = src_depth == zbuf[flat_idx]
    src_ids = jnp.arange(n, dtype=jnp.int32)
    winner_id = jnp.full((n + 1,), n, dtype=jnp.int32)
    winner_id = winner_id.at[flat_idx].min(jnp.where(is_winner, src_ids, n))
    final = (winner_id[flat_idx] == src_ids) & (flat_idx < n)

    gs_flat = jnp.zeros((n + 1, 3), dtype=image.dtype)
    gs_flat = gs_flat.at[jnp.where(final, flat_idx, n)].set(colors)
    scat_flat = jnp.zeros((n + 1,), dtype=bool)
    scat_flat = scat_flat.at[jnp.where(final, flat_idx, n)].set(True)

    zeros3 = jnp.zeros((h, w_cols, 3), dtype=dtype)
    return BackprojectResult(
        gs_image=gs_flat[:n].reshape(h, w_cols, 3),
        coords_3d=zeros3,  # this path does not produce 3D points
        valid=valid,
        scattered=scat_flat[:n].reshape(h, w_cols))
