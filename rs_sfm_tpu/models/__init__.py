"""Dense optical-flow model presets.

The reference has exactly one interchangeable "model": the dense flow
estimator (OpenCV DeepFlow, src/camera.cc:253-277), with ground-truth
reprojection flow as its drop-in test double (src/camera.cc:209-249).  This
package keeps that seam explicit as a registry of named DenseFlowConfig
presets, selectable via `--flow-model` on the CLI and `flow_cfg` in the
evaluation harness:

  variational  pyramidal warping flow (DeepFlow-class; flow/dense.py)
  fast         low-iteration variational preset for previews/video
  robust       local-contrast-normalized data term (gain/offset-invariant)
               for real imagery with exposure/vignetting changes — the
               production robust preset (STRESS.md: passes the full-HD
               photometric + mover stress gates; fused-SOR compatible)
  census       ternary-census data term + structure-texture (experimental:
               measured UNRELIABLE at full-HD — the fixed soft-sign scale
               over-amplifies fine-scale noise; see STRESS.md — kept as
               the research seam for census-family terms)
"""

from __future__ import annotations

from typing import Dict

from rs_sfm_tpu.flow.dense import DenseFlowConfig

FLOW_PRESETS: Dict[str, DenseFlowConfig] = {
    "variational": DenseFlowConfig(),
    "fast": DenseFlowConfig(levels=4, warps=2, iters=24),
    "robust": DenseFlowConfig(lcn=0.05),
    "census": DenseFlowConfig(census_weight=1.0, struct_texture=0.9),
}


def get_flow_preset(name: str, **overrides) -> DenseFlowConfig:
    """Look up a flow preset by name, optionally overriding fields
    (e.g. ``get_flow_preset("robust", warp_engine="pallas")``)."""
    try:
        preset = FLOW_PRESETS[name]
    except KeyError:
        raise KeyError(
            f"unknown flow model {name!r}; known: {sorted(FLOW_PRESETS)}"
        ) from None
    return preset._replace(**overrides) if overrides else preset
