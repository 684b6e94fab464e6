"""Round-5 protocol: model-feedback config on the full-HD stress bed.

VERDICT-r4 items 2-3: promote the model-feedback pass into the gated
production config and gate the movers/stress scene + seed stability.
This script measures, per scene (castle_clean / castle_photo / stress)
and per candidate config, the 50-evaluation repetition protocol
(reference report §5.4) on the cached f64 renders:

  * r4prod   — the round-4 gated config (baseline row);
  * fb_refine — feedback_passes=1, warm-start refine mode (candidate);
  * fb_full   — feedback_passes=1, full re-estimation mode.

Writes results/stress_r5.json; tables go to STRESS.md and the winning
config becomes tests/test_fullhd_flow.py EST_CFG + bench.py e2e.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site timeout 7200 \
      python scripts/stress_r5.py
"""

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

H, W = 1080, 1920
GAMMA = 0.9
SCENES = ["castle_clean", "castle_photo", "stress", "mesh"]


def _path(cache, scene):
    return os.path.join(cache, f"stress_{H}x{W}_{scene}_v2.npz")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--evals", type=int, default=50)
    ap.add_argument("--cache", default=os.path.join(REPO, "results",
                                                    "stress_cache"))
    ap.add_argument("--out", default=os.path.join(REPO, "results",
                                                  "stress_r5.json"))
    ap.add_argument("--configs", default="",
                    help="comma-separated config subset (default: all)")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from rs_sfm_tpu.config import PipelineConfig
    from rs_sfm_tpu.data.dataset import FrameData, PairData
    from rs_sfm_tpu.data.synthetic import default_intrinsics
    from rs_sfm_tpu.eval.harness import evaluate_velocities_batched
    from rs_sfm_tpu.flow.dense import flow_forward_backward
    from rs_sfm_tpu.models import get_flow_preset

    intr = default_intrinsics(H, W)
    out = {"platform": jax.devices()[0].platform}
    if os.path.exists(args.out):
        with open(args.out) as f:
            prev = json.load(f)
        if prev.get("platform") == out["platform"]:
            out = prev

    def _write():
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)

    base = dict(ransac_trials=256, ransac_tol=0.02, refine_iterations=20,
                refine_starts=4, refine_winnow_iters=8, refine_rel_tol=0.0,
                depth_residual_px=2.0, refine_loss_delta_px=3.0)
    configs = {
        "r4prod": PipelineConfig(**base),
        "fb_refine": PipelineConfig(**base, feedback_passes=1,
                                    feedback_mode="refine",
                                    feedback_revote=False,
                                    feedback_fast_inpaint=False),
        # The mid-r5 production config (before the wrap-up levers).
        "fb2_refine": PipelineConfig(**base, feedback_passes=2,
                                     feedback_mode="refine",
                                     feedback_revote=False,
                                     feedback_fast_inpaint=False),
        # THE r5 FINAL production config (tests/test_fullhd_flow.py
        # EST_CFG): + 8-iteration warm-start feedback refines
        # (TPU_VALIDATION §9).  The recorded rows were measured with
        # feedback_revote=True, which changed NO evaluation (the vote is
        # circular — config.py note) and now defaults off; the rows
        # stand for the shipped config.
        "fb2_final": PipelineConfig(**base, feedback_passes=2,
                                    feedback_mode="refine",
                                    feedback_refine_iterations=8),
    }
    if args.configs:
        keep = set(args.configs.split(","))
        configs = {k: v for k, v in configs.items() if k in keep}

    # Flow preset per scene: what `--flow-model auto` picks (gated in
    # CI).  r5: the probe's occlusion trigger is off, so the
    # photometrically-clean mover scene gets the variational preset
    # (measured 2.1 vs 9.0 px median EPE — flow_matrix_r5.json).
    preset_of = {"castle_clean": "variational", "castle_photo": "robust",
                 "stress": "variational", "mesh": "variational"}

    fb_jit = {}
    for scene in SCENES:
        with np.load(_path(args.cache, scene)) as z:
            data = {k: z[k] for k in z.files}
        i1 = jnp.asarray(data["i1"])
        i2 = jnp.asarray(data["i2"])
        row = out.get(scene, {})
        pname = preset_of[scene]
        if pname not in fb_jit:
            cfgv = get_flow_preset(pname, warp_engine="pallas",
                                   sor_engine="pallas")
            fb_jit[pname] = jax.jit(
                lambda a, b, c=cfgv: flow_forward_backward(a, b, c))
        fb = fb_jit[pname](i1, i2)
        float(fb.flow.sum())
        pd = PairData(
            frame1=FrameData(
                rs_image=data["i1"], gs_image=None, depth_image=None,
                poses_r=data["poses_r"], poses_t=data["poses_t"],
                rs_unproject=None, gs_unproject=None),
            frame2=None, intrinsics=intr, gamma=GAMMA, k=0.0,
            v=data["v"], w=data["w"])
        for cname, cfg in configs.items():
            key = f"protocol_{cname}"
            if key in row:
                print(scene, key, "(cached)", flush=True)
                continue
            errs = evaluate_velocities_batched(
                pd, cfg, gamma=GAMMA, num_evaluations=args.evals,
                key=jax.random.PRNGKey(11), dtype=jnp.float32,
                flow_px=np.asarray(fb.flow),
                true_depth=data["true_depth"],
                pixel_mask=~fb.occlusion)
            ev = errs.error_v_vec
            row[key] = {
                "err_v_mean": errs.error_v,
                "err_v_med": float(np.median(ev)),
                "err_v_p90": float(np.percentile(ev, 90)),
                "err_v_p90_over_med": float(np.percentile(ev, 90)
                                            / max(np.median(ev), 1e-12)),
                "err_w_mean": errs.error_w,
                "err3d_mean": float(np.nanmean(errs.error_reproject_vec)),
                "depth_rmse_mean": float(np.nanmean(errs.depth_rmse_vec)),
                "evals": args.evals,
                "preset": pname,
            }
            out[scene] = row
            _write()
            print(scene, key, json.dumps(row[key]), flush=True)

    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
