"""Optical flow: ground-truth reprojection flow and dense estimation.

  true_flow — exact flow from unprojection maps + per-scanline GT poses
              (the reference's parity workhorse, src/camera.cc:209-249);
  dense     — DeepFlow-class pyramidal variational flow in pure JAX
              (replaces cv::optflow::createOptFlow_DeepFlow,
              src/camera.cc:253-277).
"""

from rs_sfm_tpu.flow.dense import (DenseFlowConfig, FlowWithOcclusion,
                                   dense_flow, flow_forward_backward)
from rs_sfm_tpu.flow.true_flow import true_flow
