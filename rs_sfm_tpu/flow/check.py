"""Flow self-checks: warp-based reconstruction error.

The reference's testFlow (src/main.cc:563-609) forward-warps frame-1 pixels
by rounded flow and eyeballs the diff against frame 2 via imshow; its
reconstructImageFromFlow (src/camera.cc:842-865) does the same warp.  Here
the check is an *assertable metric*: backward-warp frame 2 by the flow and
measure photometric error against frame 1.
"""

from __future__ import annotations

import jax.numpy as jnp

from rs_sfm_tpu.flow.dense import _warp


def reconstruct_from_flow(image2, flow_px):
    """Backward-warp image2 by the flow (bilinear): prediction of image1."""
    if image2.ndim == 3:
        chans = [_warp(image2[..., c], flow_px) for c in range(image2.shape[-1])]
        return jnp.stack(chans, axis=-1)
    return _warp(image2, flow_px)


def flow_consistency_error(image1, image2, flow_px, mask=None):
    """Mean absolute photometric error of the flow-warped reconstruction.

    Args:
      image1, image2: (H, W[, 3]) float images in [0, 1].
      flow_px: (H, W, 2) pixel flow from frame 1 to frame 2.
      mask: optional (H, W) bool region of interest.

    Returns:
      scalar mean |warp(image2, flow) − image1| over the mask.
    """
    rec = reconstruct_from_flow(image2, flow_px)
    err = jnp.abs(rec - image1)
    if err.ndim == 3:
        err = err.mean(axis=-1)
    if mask is None:
        return err.mean()
    m = mask.astype(err.dtype)
    return jnp.sum(err * m) / jnp.maximum(jnp.sum(m), 1.0)
