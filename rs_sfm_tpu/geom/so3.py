"""so(3) helpers: hat / vee maps and the first-order exponential.

The reference builds skew matrices inline everywhere (e.g.
src/rsframe.cc:782-786, src/minimal.cc:149-154) and uses the first-order
approximation R = I + θ ŵ of the exponential map for scanline poses
(src/rsframe.cc:794).  All functions broadcast over leading batch axes.
"""

from __future__ import annotations

import jax.numpy as jnp


def hat(w):
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix ŵ with ŵ x = w × x."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zero, -wz, wy], axis=-1),
            jnp.stack([wz, zero, -wx], axis=-1),
            jnp.stack([-wy, wx, zero], axis=-1),
        ],
        axis=-2,
    )


def vee(m):
    """(..., 3, 3) -> (..., 3): inverse of hat (reads the skew entries).

    Same component convention as the reference (src/minimal.cc:148-154):
    [m(2,1), m(0,2), m(1,0)].
    """
    return jnp.stack([m[..., 2, 1], m[..., 0, 2], m[..., 1, 0]], axis=-1)


def exp_first_order(w, scale=None):
    """First-order exponential map R ≈ I + scale·ŵ (reference src/rsframe.cc:794).

    Args:
      w: (..., 3) rotation-rate vector.
      scale: optional (...,) multiplier applied to ŵ.
    """
    m = hat(w)
    if scale is not None:
        m = m * scale[..., None, None]
    return jnp.eye(3, dtype=m.dtype) + m


def rot_x(angle):
    """Rotation about +X by `angle` (radians); broadcasts over batch."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(c), jnp.zeros_like(c)
    return jnp.stack(
        [
            jnp.stack([one, zero, zero], axis=-1),
            jnp.stack([zero, c, -s], axis=-1),
            jnp.stack([zero, s, c], axis=-1),
        ],
        axis=-2,
    )


def rot_y(angle):
    """Rotation about +Y by `angle` (radians)."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(c), jnp.zeros_like(c)
    return jnp.stack(
        [
            jnp.stack([c, zero, s], axis=-1),
            jnp.stack([zero, one, zero], axis=-1),
            jnp.stack([-s, zero, c], axis=-1),
        ],
        axis=-2,
    )


def rot_z(angle):
    """Rotation about +Z by `angle` (radians)."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(c), jnp.zeros_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, zero], axis=-1),
            jnp.stack([s, c, zero], axis=-1),
            jnp.stack([zero, zero, one], axis=-1),
        ],
        axis=-2,
    )
