"""Ground-truth flow from unprojection maps and per-scanline poses.

Replaces Camera::calculateTrueFlow (reference src/camera.cc:209-249) +
RsFrame::calculateImageCoordinatesRsFrame (src/rsframe.cc:740-768): for every
pixel of frame 1, take its ground-truth world point, project it into frame 2
under *every* scanline pose, and keep the scanline whose projected y best
matches its own index (the implicit RS projection).  The reference does this
as an O(H) loop per pixel (HOT LOOP A, ~O(H²W) scalar projections); here it
is a lax.scan over scanlines with all pixels projected at once — the same
FLOPs as one batched matmul sweep, no per-pixel branching.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from rs_sfm_tpu.geom.camera import Intrinsics, pixel_grid, space_to_plane


def true_flow(unproj1, poses2_r, poses2_t, intr: Intrinsics,
              use_fy: bool = True):
    """Exact RS→RS flow field, in pixels.

    Args:
      unproj1: (H, W, 3) frame-1 unprojection map (world coords; 0-norm rows
        mark void pixels).
      poses2_r: (H, 3, 3) frame-2 per-scanline world→camera rotations.
      poses2_t: (H, 3) frame-2 per-scanline translations.
      intr: pinhole intrinsics.
      use_fy: False reproduces the reference's f_x-for-y projection quirk
        (src/rsframe.cc:639).

    Returns:
      (H, W, 2) pixel flow.  Void pixels (zero world norm) get zero flow,
      as do pixels whose best projection lands exactly at (0,0) — both
      reference behaviors (src/camera.cc:231-240).
    """
    h, w_cols = unproj1.shape[:2]
    dtype = unproj1.dtype
    grid = pixel_grid(h, w_cols, dtype=dtype)

    def body(carry, pose):
        best_diff, best_pt = carry
        r_i, t_i, row = pose
        cam = jnp.einsum("ij,hwj->hwi", r_i, unproj1) + t_i  # (H, W, 3)
        pt = space_to_plane(cam, intr, use_fy=use_fy)        # (H, W, 2)
        diff = jnp.abs(pt[..., 1] - row)
        diff = jnp.where(jnp.isfinite(diff), diff, jnp.inf)
        closer = diff < best_diff
        best_pt = jnp.where(closer[..., None], pt, best_pt)
        best_diff = jnp.where(closer, diff, best_diff)
        return (best_diff, best_pt), None

    init = (jnp.full((h, w_cols), jnp.inf, dtype=dtype),
            jnp.zeros((h, w_cols, 2), dtype=dtype))
    rows = jnp.arange(h, dtype=dtype)
    (best_diff, best_pt), _ = jax.lax.scan(
        body, init, (poses2_r, poses2_t, rows))

    flow = best_pt - grid
    void = jnp.linalg.norm(unproj1, axis=-1) == 0.0
    # Reference quirk: a projected point at exactly (0, 0) also maps to zero
    # flow (src/camera.cc:235-237).
    degenerate = jnp.linalg.norm(best_pt, axis=-1) == 0.0
    no_hit = ~jnp.isfinite(best_diff)
    zero = void | degenerate | no_hit
    return jnp.where(zero[..., None], jnp.zeros_like(flow), flow)
