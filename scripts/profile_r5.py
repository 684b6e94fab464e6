"""Round-5 profiling: per-stage roofline attribution of the e2e budget.

VERDICT-r4 item 1 asks for a table — per stage: measured ms, modeled
bytes/FLOPs, % of roofline, irreducible floor — plus the measurements
that decide where the fused finest-level residency pays.  Also baselines
for items 5 (sharded-path cost on one chip) and 10 (multi-start ratio).

Methodology: chained genuinely-varying executions per dispatch
(fold_in-derived epsilon; see TPU_VALIDATION.md §0), value-fetch synced.
Writes results/profile_r5.json.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "results", "profile_r5.json")

# v5e single-chip peaks (public spec): 197 bf16 TFLOP/s MXU, ~3.9 f32
# TFLOP/s VPU-class elementwise, 819 GB/s HBM.
HBM_GBPS = 819.0
VPU_TFLOPS = 3.9


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from rs_sfm_tpu.flow.dense import (DenseFlowConfig, dense_flow,
                                       flow_forward_backward)
    from rs_sfm_tpu.ops.pallas import sor as psor

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
        depth_np = z["true_depth"]
        vv = jnp.asarray(z["v"], jnp.float32)
        ww = jnp.asarray(z["w"], jnp.float32)
    g1 = jnp.asarray(0.299 * i1[..., 0] + 0.587 * i1[..., 1]
                     + 0.114 * i1[..., 2])
    g2 = jnp.asarray(0.299 * i2[..., 0] + 0.587 * i2[..., 1]
                     + 0.114 * i2[..., 2])
    prod = DenseFlowConfig(warp_engine="pallas", sor_engine="pallas")

    def eps_of(k):
        return 1e-6 * jax.random.uniform(k, ())

    # ---- headline stages ------------------------------------------------
    t4("r5_fb_prod_bs2", lambda k: flow_forward_backward(
        g1 + eps_of(k), g2, prod._replace(backward_scale=2)).flow.sum())
    t4("r5_fwd_prod", lambda k: dense_flow(g1 + eps_of(k), g2, prod).sum())
    t4("r5_fwd_finest_only", lambda k: dense_flow(
        g1 + eps_of(k), g2, prod._replace(
            levels=1, init_search_radius=0, refine_search_radius=0)).sum())
    t4("r5_fwd_no_discrete", lambda k: dense_flow(
        g1 + eps_of(k), g2, prod._replace(
            init_search_radius=0, refine_search_radius=0)).sum())
    t4("r5_fwd_warps2", lambda k: dense_flow(
        g1 + eps_of(k), g2, prod._replace(warps=2)).sum())
    t4("r5_fwd_iters12", lambda k: dense_flow(
        g1 + eps_of(k), g2, prod._replace(iters=12)).sum())

    # ---- finest-level sub-stages ---------------------------------------
    from rs_sfm_tpu.flow import dense as D
    from rs_sfm_tpu.ops.pallas.warp import bilinear_warp

    flow0 = jnp.zeros((h, w, 2), jnp.float32) + jnp.asarray(
        [12.0, -7.0], jnp.float32)

    t4("r5_warp_pallas_r16", lambda k: bilinear_warp(
        g2 + eps_of(k), flow0, radius=16).sum())

    def coef_of(i2w, fl):
        ix, iy = D._gradients(i2w)
        it = i2w - g1
        g1x, g1y = D._gradients(g1)
        g2x, g2y = D._gradients(i2w)
        gtx, gty = g2x - g1x, g2y - g1y
        ixx, ixy = D._gradients(g2x)
        _, iyy = D._gradients(g2y)
        u0 = fl[..., 0]
        v0 = fl[..., 1]
        c = it - ix * u0 - iy * v0
        cgx = gtx - ixx * u0 - ixy * v0
        cgy = gty - ixy * u0 - iyy * v0
        return jnp.stack([ix, iy, c, ixx, ixy, iyy, cgx, cgy])

    t4("r5_coef_only", lambda k: coef_of(g2 + eps_of(k), flow0).sum())

    coef = jax.jit(coef_of)(g2, flow0)
    coef = jax.device_put(np.asarray(coef))

    t4("r5_sor20_full", lambda k: psor.sor_sweeps_pallas(
        coef + eps_of(k), flow0[..., 0], flow0[..., 1], iters=20,
        omega=1.85, lam=0.08, eps2=1e-6, wbr=1.0, wgrad=0.7)[0].sum())
    t4("r5_sor4_chunk", lambda k: psor.sor_sweeps_pallas(
        coef + eps_of(k), flow0[..., 0], flow0[..., 1], iters=4,
        omega=1.85, lam=0.08, eps2=1e-6, wbr=1.0, wgrad=0.7)[0].sum())

    # The window-assembly cost alone (the vmapped overlapping dynamic
    # slices feeding each SOR chunk call): 10 planes, halo 8.
    def assemble(k):
        cb = psor._window_rows(coef + eps_of(k), psor.TH, 8)
        uvb = psor._window_rows(jnp.stack([flow0[..., 0], flow0[..., 1]]),
                                psor.TH, 8)
        return cb.sum() + uvb.sum()

    t4("r5_window_rows_10planes", assemble)

    from rs_sfm_tpu.ops.pallas import median as pmedian

    t4("r5_median_pallas_2planes", lambda k: pmedian.median3_planes(
        jnp.stack([flow0[..., 0] + eps_of(k), flow0[..., 1]])).sum())
    t4("r5_up2_plane", lambda k: D._up2(
        g2[::2, ::2] + eps_of(k)).sum())
    t4("r5_pyramid_build6", lambda k: sum(
        [x.sum() for x in _pyr(D, g1 + eps_of(k), 6)]))

    # ---- solver: production multi-start ratio (item 10 baseline) -------
    from __graft_entry__ import _make_flow
    from rs_sfm_tpu.config import PipelineConfig
    from rs_sfm_tpu.data.synthetic import default_intrinsics
    from rs_sfm_tpu.solver.pipeline import estimate_from_flow

    intr = default_intrinsics(h, w)
    flow_dev = jnp.asarray(_make_flow(h, w))

    def solver_fn(js, winnow=0):
        cfgj = PipelineConfig(ransac_trials=256, ransac_chunk=32,
                              ransac_tol=0.02, refine_iterations=20,
                              refine_rel_tol=0.0, refine_starts=js,
                              refine_winnow_iters=winnow,
                              depth_residual_px=2.0,
                              refine_loss_delta_px=3.0,
                              refine_engine="pallas",
                              ransac_engine="pallas")
        return lambda k: estimate_from_flow(flow_dev, intr, 0.9, cfgj,
                                            k).v.sum()

    t4("r5_solver_starts1", solver_fn(1))
    t4("r5_solver_starts4_winnow8", solver_fn(4, winnow=8))

    # ---- sharded path on ONE chip (item 5 baseline) --------------------
    # estimate_sharded forces the XLA engines today; its 1-device cost vs
    # the Pallas single-device path is the fallback premium.
    from rs_sfm_tpu.parallel.api import estimate_sharded

    mesh1 = jax.sharding.Mesh(np.array(jax.devices()[:1]), ("pixels",))
    cfgs = PipelineConfig(ransac_trials=256, ransac_chunk=32,
                          ransac_tol=0.02, refine_iterations=20,
                          refine_rel_tol=0.0, refine_starts=4,
                          refine_winnow_iters=8,
                          depth_residual_px=2.0,
                          refine_loss_delta_px=3.0)
    sharded = estimate_sharded(mesh1, intr, 0.9, cfgs)
    t4("r5_sharded_1dev_xla", lambda k: sharded(flow_dev, k).v.sum())

    # ---- derived roofline table ----------------------------------------
    px = h * w
    plane_mb = px * 4 / 1e6
    table = {}

    def entry(stage, ms, bytes_mb, flops_g, floor=""):
        if ms is None:
            return
        bw = bytes_mb / ms if ms else 0.0   # GB/s
        table[stage] = {
            "ms": round(ms, 2),
            "model_MB": round(bytes_mb, 1),
            "model_GFLOP": round(flops_g, 2),
            "hbm_frac": round(bw / HBM_GBPS, 4),
            "vpu_frac": round((flops_g / (ms / 1e3)) / (VPU_TFLOPS * 1e3),
                              4),
            "floor": floor,
        }

    # Models (per call): see PERF_NOTES in TPU_VALIDATION.md update.
    g = out.get
    entry("warp_r16", g("r5_warp_pallas_r16"),
          plane_mb * (2 + 2 + 1), 33 * 2 * px / 1e9,
          "shift-select: 33 shifted loads + selects per px")
    entry("coef", g("r5_coef_only"), plane_mb * (2 + 8), 40 * px / 1e9,
          "elementwise + 8 shifts")
    entry("sor20", g("r5_sor20_full"),
          5 * (10 * 1.67 + 2 + 10 + 2) * plane_mb,
          20 * 2 * 80 * px * 1.67 / 1e9,
          "5 chunk calls x (windowed read + write)")
    entry("median", g("r5_median_pallas_2planes"), plane_mb * 4,
          19 * 2 * px / 1e9, "19-comparator network")
    entry("window_rows", g("r5_window_rows_10planes"),
          plane_mb * 10 * 1.67 * 2, 0.0, "pure copy")
    out["roofline_table"] = table
    save()

    print(json.dumps(out))


def _pyr(D, x, levels):
    p = [x]
    for _ in range(levels - 1):
        p.append(D._downsample(p[-1]))
    return p


if __name__ == "__main__":
    main()
