"""Device mesh construction for the (pairs, pixels) layout."""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(pairs: int = 1, pixels: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a `(pairs, pixels)` mesh.

    Args:
      pairs: data-parallel axis size (independent frame pairs).
      pixels: model-parallel axis size (scanline-block/pixel sharding);
        defaults to using all remaining devices.
      devices: explicit device list (defaults to jax.devices()).

    Returns:
      jax.sharding.Mesh with axes ("pairs", "pixels").
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if pixels is None:
        if n % pairs:
            raise ValueError(f"{n} devices not divisible by pairs={pairs}")
        pixels = n // pairs
    if pairs * pixels > n:
        raise ValueError(
            f"mesh {pairs}x{pixels} needs {pairs * pixels} devices, have {n}")
    grid = np.asarray(devices[: pairs * pixels]).reshape(pairs, pixels)
    return Mesh(grid, ("pairs", "pixels"))
