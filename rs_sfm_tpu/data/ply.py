"""ASCII PLY point-cloud export (reference Camera::createPointCloud,
src/camera.cc:423-491): world coordinates + RS pixel colors.

Uses the native C++ writer when built (an order of magnitude faster for
full-HD clouds), with a pure-Python fallback.
"""

from __future__ import annotations

import numpy as np


def write_ply(path: str, points, colors, mask=None) -> int:
    """Write an ASCII PLY of the masked points.

    Args:
      path: output file.
      points: (..., 3) float world coordinates.
      colors: (..., 3) uint8 or unit-float RGB.
      mask: optional (...,) bool; default: points with nonzero norm.

    Returns:
      number of vertices written.
    """
    pts = np.asarray(points, dtype=np.float64).reshape(-1, 3)
    cols = np.asarray(colors).reshape(-1, 3)
    if cols.dtype != np.uint8:
        cols = np.clip(np.round(cols * 255.0), 0, 255).astype(np.uint8)
    if mask is None:
        m = np.linalg.norm(pts, axis=-1) > 0
    else:
        m = np.asarray(mask).reshape(-1)
    m = m & np.isfinite(pts).all(axis=-1)
    pts, cols = pts[m], cols[m]

    try:
        from rs_sfm_tpu.data import io_native

        if io_native.available():
            return io_native.write_ply(path, pts, cols)
    except Exception:
        pass

    n = pts.shape[0]
    header = (
        "ply\nformat ascii 1.0\n"
        f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "end_header\n")
    body = np.concatenate([pts, cols.astype(np.float64)], axis=1)
    with open(path, "w") as f:
        f.write(header)
        np.savetxt(f, body,
                   fmt="%.6f %.6f %.6f %d %d %d")
    return n
