"""Crack filling for scatter-rectified images.

Replaces Camera::interpolateCrackyImage (reference src/camera.cc:753-774):
black pixels (‖RGB‖ ≤ threshold) inside a "colorful area" — i.e. with
non-black 4-neighbors at distance `offset` — are replaced by the average of
those non-black neighbors.  Pure stencil ops (rolls + where), one fused
elementwise pass per application.
"""

from __future__ import annotations

import jax.numpy as jnp


def fill_cracks(image, offset: int = 1, black_threshold: float = 15.0,
                require_all_neighbors: bool = True):
    """Fill scatter cracks by neighbor averaging.

    Args:
      image: (H, W, 3) uint8 or float image (float treated as [0,1]).
      offset: neighbor distance (the reference calls offsets 1 then 2).
      black_threshold: ‖RGB‖ (uint8 scale) below which a pixel is "black"
        (src/camera.cc:700: norm ≤ 15).
      require_all_neighbors: the reference's isColorfulArea demands *all*
        four neighbors non-black (src/camera.cc:703-711); False relaxes to
        ≥1 non-black neighbor (fills image borders of the crack too).

    Returns:
      Image of the same dtype with cracks filled.
    """
    int_input = jnp.issubdtype(image.dtype, jnp.integer)
    img = image.astype(jnp.float32)
    scale = 1.0 if int_input else 255.0
    norm = jnp.linalg.norm(img * scale, axis=-1)
    is_black = norm <= black_threshold

    shifts = [(-offset, 0), (offset, 0), (0, -offset), (0, offset)]
    neigh_sum = jnp.zeros_like(img)
    neigh_cnt = jnp.zeros(img.shape[:2], dtype=jnp.float32)
    all_colorful = jnp.ones(img.shape[:2], dtype=bool)
    for dy, dx in shifts:
        sh = jnp.roll(img, shift=(dy, dx), axis=(0, 1))
        sh_black = jnp.roll(is_black, shift=(dy, dx), axis=(0, 1))
        neigh_sum = neigh_sum + jnp.where(sh_black[..., None], 0.0, sh)
        neigh_cnt = neigh_cnt + jnp.where(sh_black, 0.0, 1.0)
        all_colorful = all_colorful & ~sh_black

    eligible = is_black & (all_colorful if require_all_neighbors
                           else (neigh_cnt > 0))
    avg = neigh_sum / jnp.maximum(neigh_cnt, 1.0)[..., None]
    out = jnp.where(eligible[..., None], avg, img)
    return jnp.round(out).astype(image.dtype) if int_input else out.astype(
        image.dtype)
