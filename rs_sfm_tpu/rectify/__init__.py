"""Rectification: RS → global-shutter re-rendering.

Replaces RsFrame::backProject / backProjectGs (reference
src/rsframe.cc:803-878) and Camera::interpolateCrackyImage
(src/camera.cc:753-774) with a z-buffered deterministic scatter and a
neighbor-average crack fill.
"""

from rs_sfm_tpu.rectify.backproject import backproject, BackprojectResult
from rs_sfm_tpu.rectify.crackfill import fill_cracks
