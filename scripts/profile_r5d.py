"""Round-5 fourth-pass probes: adoption decisions on hardware.

  * dense-flow cost of the candidate production presets (wc6 coarse
    warps / radius-8 exact refine — the stress/photo quality levers from
    results/flow_matrix_r5.json) vs the r4 preset;
  * the sharded path on ONE chip with the r5 PALLAS engines
    (refine_pallas_multi_sharded + sharded Pallas scorer) vs the 251.5 ms
    XLA fallback and the 53.9 ms single-device bar (VERDICT item 5:
    within 1.5x);
  * multi-start winnow2 schedules (VERDICT item 10: 4-start <= 1.5x of
    single-start);
  * the config-level model-feedback pass's marginal cost (VERDICT item 2).

Writes results/profile_r5d.json.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "results", "profile_r5d.json")


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
    from rs_sfm_tpu.flow.dense import DenseFlowConfig, flow_forward_backward
    from rs_sfm_tpu.solver.pipeline import (estimate_from_flow,
                                            estimate_with_feedback)

    out = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            out = json.load(f)

    def save():
        with open(OUT, "w") as f:
            json.dump(out, f, indent=1)

    def t4(tag, fn, chain=4):
        if tag in out:
            print(f"{tag:44s} {out[tag]:8.2f} ms (cached)", flush=True)
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
        print(f"{tag:44s} {ms:8.2f} ms   (compile {compile_s:.0f}s)",
              flush=True)
        return ms

    h, w = 1080, 1920
    cache = os.path.join(REPO, "results", "stress_cache",
                         f"stress_{h}x{w}_castle_clean_v2.npz")
    with np.load(cache) as z:
        i1 = z["i1"]
        i2 = z["i2"]
    g1 = jnp.asarray(0.299 * i1[..., 0] + 0.587 * i1[..., 1]
                     + 0.114 * i1[..., 2])
    g2 = jnp.asarray(0.299 * i2[..., 0] + 0.587 * i2[..., 1]
                     + 0.114 * i2[..., 2])
    prod = DenseFlowConfig(warp_engine="pallas", sor_engine="pallas",
                           backward_scale=2)

    def eps_of(k):
        return 1e-6 * jax.random.uniform(k, ())

    # ---- candidate flow presets ----------------------------------------
    t4("r5d_fb_r4prod", lambda k: flow_forward_backward(
        g1 + eps_of(k), g2, prod).flow.sum())
    t4("r5d_fb_wc6", lambda k: flow_forward_backward(
        g1 + eps_of(k), g2, prod._replace(warps_coarse=6)).flow.sum())
    t4("r5d_fb_wc6r8", lambda k: flow_forward_backward(
        g1 + eps_of(k), g2, prod._replace(
            warps_coarse=6, refine_search_radius=8)).flow.sum())
    t4("r5d_fb_wc8", lambda k: flow_forward_backward(
        g1 + eps_of(k), g2, prod._replace(warps_coarse=8)).flow.sum())

    # ---- solver: winnow2 schedules (item 10) ---------------------------
    from __graft_entry__ import _make_flow

    intr = default_intrinsics(h, w)
    flow_dev = jnp.asarray(_make_flow(h, w))

    def solver_cfg(**kw):
        base = dict(ransac_trials=256, ransac_chunk=32, ransac_tol=0.02,
                    refine_iterations=20, refine_rel_tol=0.0,
                    depth_residual_px=2.0, refine_loss_delta_px=3.0,
                    refine_engine="pallas", ransac_engine="pallas")
        base.update(kw)
        return PipelineConfig(**base)

    t4("r5d_solver_starts1", lambda k: estimate_from_flow(
        flow_dev, intr, 0.9, solver_cfg(refine_starts=1), k).v.sum())
    t4("r5d_solver_s4_w8", lambda k: estimate_from_flow(
        flow_dev, intr, 0.9,
        solver_cfg(refine_starts=4, refine_winnow_iters=8), k).v.sum())
    t4("r5d_solver_s4_w6_w2_6", lambda k: estimate_from_flow(
        flow_dev, intr, 0.9,
        solver_cfg(refine_starts=4, refine_winnow_iters=6,
                   refine_winnow2_iters=6), k).v.sum())
    t4("r5d_solver_s4_w4_w2_4", lambda k: estimate_from_flow(
        flow_dev, intr, 0.9,
        solver_cfg(refine_starts=4, refine_winnow_iters=4,
                   refine_winnow2_iters=4), k).v.sum())

    # ---- model-feedback pass marginal cost (item 2) --------------------
    t4("r5d_est_feedback_refine", lambda k: estimate_with_feedback(
        flow_dev, intr, 0.9,
        solver_cfg(refine_starts=4, refine_winnow_iters=8,
                   feedback_passes=1, feedback_mode="refine"), k).v.sum())
    t4("r5d_est_feedback_full", lambda k: estimate_with_feedback(
        flow_dev, intr, 0.9,
        solver_cfg(refine_starts=4, refine_winnow_iters=8,
                   feedback_passes=1, feedback_mode="full"), k).v.sum())

    # ---- sharded path on ONE chip with the r5 Pallas engines -----------
    from rs_sfm_tpu.parallel.api import estimate_sharded

    mesh1 = jax.sharding.Mesh(np.array(jax.devices()[:1]), ("pixels",))
    sharded = estimate_sharded(
        mesh1, intr, 0.9,
        solver_cfg(refine_starts=4, refine_winnow_iters=8), )
    t4("r5d_sharded_1dev_pallas", lambda k: sharded(flow_dev, k).v.sum())

    print(json.dumps(out))


if __name__ == "__main__":
    main()
