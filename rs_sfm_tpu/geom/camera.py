"""Pinhole camera model on dense pixel batches.

Replaces RsFrame's camera model (reference src/rsframe.cc:629-683) with pure
functions over (..., 2)/(..., 3) arrays.  The reference's `spaceToPlane`
projects the y coordinate with f_x (src/rsframe.cc:639) — a latent bug that is
invisible on its square synthetic images where f_x == f_y.  Here the correct
f_y is used by default; pass use_fy=False to reproduce the reference bit-wise.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Intrinsics:
    """Pinhole intrinsics f_x, f_y, c_x, c_y (a 3x3 K matrix's free entries)."""

    fx: float
    fy: float
    cx: float
    cy: float

    @classmethod
    def from_matrix(cls, k) -> "Intrinsics":
        k = jnp.asarray(k)
        return cls(fx=float(k[0, 0]), fy=float(k[1, 1]),
                   cx=float(k[0, 2]), cy=float(k[1, 2]))

    def matrix(self, dtype=jnp.float32):
        return jnp.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=dtype,
        )


def space_to_plane(points, intr: Intrinsics, use_fy: bool = True):
    """Camera-frame 3D points (..., 3) -> pixel coordinates (..., 2).

    Mirrors reference spaceToPlane (src/rsframe.cc:629-642); use_fy=False
    reproduces its f_x-for-y quirk.
    """
    z = points[..., 2]
    x = points[..., 0] / z
    y = points[..., 1] / z
    fy = intr.fy if use_fy else intr.fx
    return jnp.stack([x * intr.fx + intr.cx, y * fy + intr.cy], axis=-1)


def plane_to_space(pixels, z, intr: Intrinsics):
    """Pixel coordinates (..., 2) + depth (...) -> camera-frame 3D (..., 3).

    Mirrors reference planeToSpace (src/rsframe.cc:646-665) with the depth
    supplied explicitly (the reference reads its depth-map member when the
    z argument is omitted).
    """
    x = (pixels[..., 0] - intr.cx) / intr.fx
    y = (pixels[..., 1] - intr.cy) / intr.fy
    ones = jnp.ones_like(x)
    return jnp.stack([x, y, ones], axis=-1) * z[..., None]


def normalize_coords(pixels, intr: Intrinsics):
    """Pixel coordinates (..., 2) -> normalized image-plane coordinates.

    Matches the flattening in the reference drivers (src/main.cc:424-427):
    x_n = (u - c_x)/f_x, y_n = (v - c_y)/f_y.
    """
    x = (pixels[..., 0] - intr.cx) / intr.fx
    y = (pixels[..., 1] - intr.cy) / intr.fy
    return jnp.stack([x, y], axis=-1)


def normalize_flow(flow_px, intr: Intrinsics, gamma=None):
    """Pixel flow (..., 2) -> normalized image-plane flow.

    The reference premultiplies by γ (src/main.cc:424-425: u = dx·γ/f),
    which silently makes its estimated velocities γ-scaled (w_est = γ·w_true;
    v is scale-ambiguous so it goes unnoticed) and degenerates at γ→0.  This
    framework does NOT scale by γ: with the α/β factors already encoding the
    per-scanline timing, un-scaled normalized flow yields (v, w) per frame
    interval, matching the generator ground truth exactly.  Pass gamma to
    reproduce the reference's unit convention.
    """
    scale = 1.0 if gamma is None else gamma
    return jnp.stack(
        [flow_px[..., 0] * scale / intr.fx, flow_px[..., 1] * scale / intr.fy],
        axis=-1,
    )


def pixel_grid(rows: int, cols: int, dtype=jnp.float32):
    """(rows, cols, 2) array of (x=col, y=row) pixel coordinates."""
    ys, xs = jnp.meshgrid(
        jnp.arange(rows, dtype=dtype), jnp.arange(cols, dtype=dtype), indexing="ij"
    )
    return jnp.stack([xs, ys], axis=-1)
