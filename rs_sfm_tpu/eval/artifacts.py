"""Artifact writers matching the reference's output contract.

evaluateSingleRun writes optical_flow.png, optical_flow_arrow.png,
MinimalDepth.png, backprojection.png, point_cloud.ply and (synthetic only)
error/overlay images (reference src/main.cc:386-556); the sweep harness
writes per-run depth maps (src/errorMeasure.cpp:199-226).
"""

from __future__ import annotations

import os

import numpy as np


def imwrite(path, arr):
    import imageio.v3 as iio

    iio.imwrite(path, arr)


def depth_image(depth_map) -> np.ndarray:
    """8-bit depth visualization: 10 + 244·(z−z_min)/(z_max−z_min) on the
    nonzero pixels, 0 elsewhere (reference src/main.cc:481-509)."""
    d = np.asarray(depth_map, dtype=np.float64)
    m = d != 0
    out = np.zeros(d.shape, dtype=np.uint8)
    if m.any():
        z = d[m]
        z_min, z_max = z.min(), z.max()
        span = (z_max - z_min) or 1.0
        out[m] = np.clip(
            np.round(10.0 + 244.0 * (z[...] - z_min) / span), 0, 255
        ).astype(np.uint8)
    return out


def error_image(est_3d, true_3d, valid, max_norm: float = 3.0) -> np.ndarray:
    """8-bit heatmap of per-pixel 3D error, scaled by max_norm
    (reference Camera::createErrorImage, src/camera.cc:503-590)."""
    dist = np.linalg.norm(np.asarray(est_3d) - np.asarray(true_3d), axis=-1)
    dist = np.where(np.asarray(valid) & np.isfinite(dist), dist, 0.0)
    return np.clip(np.round(255.0 * dist / max_norm), 0, 255).astype(np.uint8)


def overlay_image(base, overlay, shift_channel: int = 0) -> np.ndarray:
    """Blue-deviation overlay: keep base, replace one channel with overlay's
    (reference createOverlayImage/shiftChannelBGR, src/camera.cc:777-839)."""
    out = np.asarray(base).copy()
    out[..., shift_channel] = np.asarray(overlay)[..., shift_channel]
    return out


def to_uint8(img) -> np.ndarray:
    img = np.asarray(img)
    if img.dtype == np.uint8:
        return img
    return np.clip(np.round(img * 255.0), 0, 255).astype(np.uint8)


def save_single_run_artifacts(out_dir, *, flow_px, rs_image, depth_map,
                              gs_image, coords_3d, valid):
    """Write the evaluateSingleRun artifact set."""
    from rs_sfm_tpu.data.ply import write_ply
    from rs_sfm_tpu.flow.viz import flow_arrows, flow_to_color

    os.makedirs(out_dir, exist_ok=True)
    imwrite(os.path.join(out_dir, "optical_flow.png"),
             flow_to_color(flow_px))
    imwrite(os.path.join(out_dir, "optical_flow_arrow.png"),
             flow_arrows(to_uint8(rs_image), np.asarray(flow_px)))
    imwrite(os.path.join(out_dir, "MinimalDepth.png"),
             depth_image(depth_map))
    imwrite(os.path.join(out_dir, "backprojection.png"),
             to_uint8(gs_image))
    write_ply(os.path.join(out_dir, "point_cloud.ply"),
              np.asarray(coords_3d), to_uint8(rs_image),
              mask=np.asarray(valid))
