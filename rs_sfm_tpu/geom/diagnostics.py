"""Geometry self-diagnostics.

Camera::testProjection (reference src/camera.cc:374-408) round-trips every
pixel through the five transforms and *prints* them; here it is an
assertable metric.
"""

from __future__ import annotations

import jax.numpy as jnp

from rs_sfm_tpu.geom.camera import (Intrinsics, pixel_grid, plane_to_space,
                                    space_to_plane)
from rs_sfm_tpu.geom.rspose import camera_to_world, world_to_camera


def projection_roundtrip_error(rows, cols, intr: Intrinsics, poses_r,
                               poses_t, depth=None, dtype=jnp.float64):
    """Max pixel error of plane→space→world→camera→plane per scanline pose.

    Returns the maximum Euclidean pixel discrepancy over the grid — ~1e-9
    for exactly-invertible poses; grows with the non-orthogonality of
    first-order rotations if Rᵀ is used as the inverse.
    """
    grid = pixel_grid(rows, cols, dtype=dtype)
    z = (jnp.full((rows, cols), 5.0, dtype)
         if depth is None else jnp.asarray(depth, dtype))
    cam = plane_to_space(grid, z, intr)
    world = camera_to_world(cam, poses_r[:, None], poses_t[:, None])
    cam2 = world_to_camera(world, poses_r[:, None], poses_t[:, None])
    px = space_to_plane(cam2, intr)
    return jnp.max(jnp.linalg.norm(px - grid, axis=-1))
