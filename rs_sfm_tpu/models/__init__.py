"""Dense optical-flow model families.

The reference has exactly one interchangeable "model": the dense flow
estimator (OpenCV DeepFlow, src/camera.cc:253-277), with ground-truth
reprojection flow as its drop-in test double (src/camera.cc:209-249).  This
package keeps that seam explicit as a registry of flow model families so
estimators can be swapped per dataset/quality target:

  variational  pyramidal warping flow (DeepFlow-class; flow/dense.py)
  fast         low-iteration variational preset for previews/video
  true         ground-truth reprojection flow (needs GT unprojection maps)
"""

from __future__ import annotations

from typing import Callable, Dict

from rs_sfm_tpu.flow.dense import DenseFlowConfig, dense_flow


def _variational(i1, i2):
    return dense_flow(i1, i2, DenseFlowConfig())


def _fast(i1, i2):
    return dense_flow(i1, i2, DenseFlowConfig(levels=4, warps=2, iters=24))


FLOW_MODELS: Dict[str, Callable] = {
    "variational": _variational,
    "fast": _fast,
}


def get_flow_model(name: str) -> Callable:
    try:
        return FLOW_MODELS[name]
    except KeyError:
        raise KeyError(
            f"unknown flow model {name!r}; known: {sorted(FLOW_MODELS)}"
        ) from None
