"""Round-5 wrap-up probes: the feedback pass's cost levers on hardware.

ROADMAP item 4 named the feedback re-estimation (54.75 -> 99.26 ms for
one pass; the production config runs TWO) as the top e2e throughput
lever, with the multi-scale inpainting chain resize/blur-dominated.
This script measures, on the tunneled v5e with chained fold_in-perturbed
executions:

  * est_fb2_r5base   — the shipped r5 config (2 feedback passes,
                       full-res inpainting, 20-iter warm refines);
  * est_fb2_fastinp  — + decimated inpainting (feedback_fast_inpaint);
  * est_fb2_it8      — + 8-iteration warm-start feedback refines;
  * est_fb2_new      — decimated inpainting + 8-iter warm refines +
                       the basin re-vote (the round-5 final candidate);
  * est_fb2_revote   — re-vote alone on the r5 base (its marginal cost).

Writes results/profile_r6.json.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site timeout 5400 \
      python scripts/profile_r6.py
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "results", "profile_r6.json")


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from rs_sfm_tpu.config import PipelineConfig
    from rs_sfm_tpu.data.synthetic import default_intrinsics
    from rs_sfm_tpu.solver.pipeline import estimate_with_feedback
    from __graft_entry__ import _make_flow

    out = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            out = json.load(f)

    def save():
        with open(OUT, "w") as f:
            json.dump(out, f, indent=1)

    def t4(tag, fn, chain=4):
        if tag in out:
            print(f"{tag:28s} {out[tag]:8.2f} ms (cached)", flush=True)
            return out[tag]

        @jax.jit
        def run(key):
            def body(i, acc):
                return acc + fn(jax.random.fold_in(key, i))
            return jax.lax.fori_loop(0, chain, body, jnp.float32(0.0))

        t0 = time.perf_counter()
        float(run(jax.random.PRNGKey(0)))
        compile_s = time.perf_counter() - t0
        ts = []
        for r in range(3):
            t0 = time.perf_counter()
            float(run(jax.random.PRNGKey(r)))
            ts.append(time.perf_counter() - t0)
        ms = min(ts) / chain * 1e3
        out[tag] = round(ms, 2)
        out[tag + "_compile_s"] = round(compile_s, 1)
        save()
        print(f"{tag:28s} {ms:8.2f} ms   (compile {compile_s:.0f}s)",
              flush=True)
        return ms

    h, w = 1080, 1920
    intr = default_intrinsics(h, w)
    flow_dev = jnp.asarray(_make_flow(h, w))

    def cfg(**kw):
        base = dict(ransac_trials=256, ransac_chunk=32, ransac_tol=0.02,
                    refine_iterations=20, refine_rel_tol=0.0,
                    refine_starts=4, refine_winnow_iters=8,
                    depth_residual_px=2.0, refine_loss_delta_px=3.0,
                    feedback_passes=2, feedback_mode="refine",
                    refine_engine="pallas", ransac_engine="pallas")
        base.update(kw)
        return PipelineConfig(**base)

    variants = {
        "est_fb2_r5base": cfg(feedback_revote=False,
                              feedback_fast_inpaint=False),
        "est_fb2_fastinp": cfg(feedback_revote=False,
                               feedback_fast_inpaint=True),
        "est_fb2_it8": cfg(feedback_revote=False,
                           feedback_fast_inpaint=False,
                           feedback_refine_iterations=8),
        "est_fb2_new": cfg(feedback_revote=True,
                           feedback_fast_inpaint=True,
                           feedback_refine_iterations=8),
        "est_fb2_revote": cfg(feedback_revote=True,
                              feedback_fast_inpaint=False),
        "est_fb0": cfg(feedback_passes=0),
    }
    for tag, c in variants.items():
        t4(tag, lambda k, c=c: estimate_with_feedback(
            flow_dev, intr, 0.9, c, k).v.sum())

    print(json.dumps(out))


if __name__ == "__main__":
    main()
