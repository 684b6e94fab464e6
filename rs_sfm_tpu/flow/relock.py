"""Periodic-texture global disambiguation: model-guided flow relock.

The reference's example-4 failure family (/root/reference/examples/
README.md:14): on repetitive texture every period-shifted displacement is
a perfect photometric match, the discrete matcher mislocks, the wrong
lock round-trips consistently (FB and photoconsistency both pass), and —
because a constant image-space offset over a planar region is itself
consistent with SOME rigid interpretation — the wrong-locked region can
out-vote the truth in RANSAC (measured on the full-HD reptex probe:
370 k inliers for a wrong model at err_v 1.97 rad, while an oracle
restricted to the 6.6 % of correct-flow pixels recovers err_v 0.0097).

The disambiguating signal the r5 measurement run pinned down:

  * the wrong lock is NOT epipolar-absorbable under the TRUE model
    (median best-depth residual 27.7 px vs 0.24 px for correct flow;
    only 2.4 % of wrong-locked pixels fall below 2 px) — so a correct
    model cleanly separates locks;
  * the discrete matcher KNOWS where it had no information: the exported
    `ambiguous` mask (best within 10 % of a >=2 px-away alternative at
    every searched scale, flow/dense.py FlowAux).

Two-pass scheme:
  1. flow + ambiguity; estimate the rigid model ONLY from unambiguous,
     FB-consistent pixels (the anchors: ground/roof/edges);
  2. predict the rigid-model flow everywhere from anchor-inpainted depth
     (flow/feedback.py machinery), and re-run the flow with that
     prediction as a PRIOR: discrete candidates' selection costs carry a
     multiplicative distance-to-prior penalty, so exact photometric ties
     resolve toward the model while confident matches are untouched.

Validated: tests/test_relock.py gates reptex median EPE < 4 px and
err_v < 0.1 rad (from 38.8 px / 1.98 rad), clean scene unchanged.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from rs_sfm_tpu.config import PipelineConfig
from rs_sfm_tpu.flow.dense import (DenseFlowConfig, FlowWithOcclusion,
                                   flow_forward_backward)
from rs_sfm_tpu.geom.camera import Intrinsics
from rs_sfm_tpu.solver.pipeline import (EstimationResult,
                                        estimate_with_feedback)


class RelockResult(NamedTuple):
    fb: FlowWithOcclusion        # second-pass flow product
    result: EstimationResult     # final estimation on the relocked flow
    first_pass: EstimationResult  # anchor-only estimation (pass 1)
    ambiguous_frac: jax.Array    # () fraction of pixels pass 1 found
    #                              ambiguous (the relock trigger signal)


def flow_with_relock(
    image1,
    image2,
    flow_cfg: DenseFlowConfig,
    intr: Intrinsics,
    gamma,
    cfg: PipelineConfig,
    key,
    *,
    trigger_frac: float = 0.25,
    force: bool = False,
) -> RelockResult:
    """Two-pass flow with rigid-model relock of ambiguous regions.

    Args:
      image1, image2: (H, W[, 3]) float frames in [0, 1].
      flow_cfg: dense-flow configuration (production preset).
      intr, gamma, cfg, key: estimation context.
      trigger_frac: run the second pass only when at least this fraction
        of pixels is discrete-ambiguous (host-side check on the pass-1
        product; clean scenes skip the second pass entirely).
      force: always run the second pass (tests/benchmarks).

    Returns:
      RelockResult.  When the trigger does not fire, `fb`/`result` are
      the pass-1 products (single-pass behavior, bit-identical).
    """
    from rs_sfm_tpu.flow.feedback import model_feedback

    fb1 = flow_forward_backward(image1, image2, flow_cfg)
    amb = fb1.ambiguous
    amb_frac = amb.mean()
    if not force and float(amb_frac) < trigger_frac:
        res1 = estimate_with_feedback(fb1.flow, intr, gamma, cfg, key,
                                      pixel_mask=~fb1.occlusion)
        return RelockResult(fb=fb1, result=res1, first_pass=res1,
                            ambiguous_frac=amb_frac)

    # GLOBAL PERIOD DISAMBIGUATION.  The wrong lock differs from the
    # truth by an integer number of image-space period vectors; the
    # period itself IS observable — it is the separation between the
    # discrete matcher's top-2 locks (fb1.alt_flow − fb1.flow) at the
    # ambiguous pixels.  Estimate the dominant period vector P̂ (masked
    # median of the sign-canonicalized separations), then score a small
    # family of globally shifted flows flow + n·P̂ (ambiguous pixels
    # only) by rigid consensus: the correct n inherits the wall
    # MAJORITY plus the anchors, so the lexicographic (inliers, error)
    # vote — the same two-stage selection the multi-start refinement
    # uses — picks it over the wrong-lock consensus that out-voted the
    # anchors in pass 1.
    from rs_sfm_tpu.solver.pipeline import estimate_from_flow

    sep = fb1.alt_flow - fb1.flow
    flip = jnp.sign(sep[..., 0] + 1e-6 * sep[..., 1])
    sep_c = sep * flip[..., None]
    nanmask = jnp.where(amb, 1.0, jnp.nan)
    p_hat = jnp.stack([jnp.nanmedian(sep_c[..., 0] * nanmask),
                       jnp.nanmedian(sep_c[..., 1] * nanmask)])

    import dataclasses

    score_cfg = dataclasses.replace(
        cfg, ransac_trials=min(cfg.ransac_trials, 128), refine_starts=1,
        refine_iterations=8, feedback_passes=0)
    best = None
    for n in (-2, -1, 0, 1, 2):
        flow_n = jnp.where(amb[..., None],
                           fb1.flow + float(n) * p_hat, fb1.flow)
        res_n = estimate_from_flow(flow_n, intr, gamma, score_cfg,
                                   jax.random.fold_in(key, 100 + n),
                                   pixel_mask=~fb1.occlusion)
        cand = (int(res_n.num_inliers), float(res_n.refine_cost), n,
                flow_n, res_n)
        if best is None or (cand[0], -cand[1]) > (best[0], -best[1]):
            best = cand
    n_win, flow_b, res1 = best[2], best[3], best[4]

    # Relock pass: the winning consensus model predicts flow everywhere
    # (anchor-inpainted depth, flow/feedback.py); re-run the flow with
    # that prediction as the discrete-stage PRIOR so per-pixel locks
    # snap to the model-consistent period (handles per-wall period
    # variation the global n cannot).
    fbk = model_feedback(flow_b, fb1.occlusion, res1, intr, gamma, cfg)
    prior = fbk.model_flow

    fb2 = flow_forward_backward(image1, image2, flow_cfg, prior=prior)
    res2 = estimate_with_feedback(
        fb2.flow, intr, gamma, cfg, jax.random.fold_in(key, 7),
        pixel_mask=~fb2.occlusion)
    return RelockResult(fb=fb2, result=res2, first_pass=res1,
                        ambiguous_frac=amb_frac)
