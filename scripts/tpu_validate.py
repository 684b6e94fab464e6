"""On-hardware validation: Pallas-vs-XLA engine parity and accel-mode timing.

Run on the real TPU (f32).  Checks recorded in TPU_VALIDATION.md:

1. Fused Pallas Schur-LM engine vs the portable XLA engine on the same
   600px problem: converged cost and (v, w) agreement.  This pins the MXU
   Gram reduction's numerics on hardware (Precision.HIGHEST dot_generals,
   ops/pallas/refine_kernels.py) — interpret-mode CPU tests cannot
   exercise MXU rounding.
2. Constant-acceleration model (use_k) timing at 600px: pairs/s with the
   det-polynomial k estimation + all-roots scoring on device.
3. f32 k̂ on TPU vs f64 k̂ on CPU for the same rendered pairs (reads the
   figure-4 middle-sweep render cache; run scripts/figure4_protocol.py
   --phase render first).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site timeout 1800 \
      python scripts/tpu_validate.py
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CACHE = os.path.join(REPO, "results", "fig4_cache")


def main():
    import jax

    cache_dir = os.path.join(REPO, ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from rs_sfm_tpu.config import PipelineConfig
    from rs_sfm_tpu.data.synthetic import default_intrinsics
    from rs_sfm_tpu.solver.pipeline import estimate_from_flow

    print("platform:", jax.devices()[0].platform, flush=True)
    size = 600
    intr = default_intrinsics(size, size)
    out = {}

    def load(k):
        path = os.path.join(
            CACHE, f"render_{size}_g0.8_k{k:g}_v0.02_w0.000873.npz")
        with np.load(path) as z:
            return (jnp.asarray(z["flow_px"], jnp.float32), float(k))

    flow, _ = load(0.5)

    # --- 1. Pallas vs XLA refine engine on hardware ---
    res = {}
    for engine in ("xla", "pallas"):
        cfg = PipelineConfig(ransac_trials=64, ransac_tol=0.01,
                             refine_iterations=50, refine_rel_tol=0.0,
                             refine_engine=engine)
        fn = jax.jit(lambda f, k, c=cfg: estimate_from_flow(
            f, intr, 0.8, c, k))
        r = fn(flow, jax.random.PRNGKey(3))
        res[engine] = dict(cost=float(r.refine_cost),
                           v=np.asarray(r.v), w=np.asarray(r.w))
        print(f"refine[{engine}]: cost={res[engine]['cost']:.6e}", flush=True)
    rel_cost = abs(res["pallas"]["cost"] - res["xla"]["cost"]) / max(
        res["xla"]["cost"], 1e-30)
    dv = float(np.linalg.norm(res["pallas"]["v"] - res["xla"]["v"]))
    dw = float(np.linalg.norm(res["pallas"]["w"] - res["xla"]["w"]))
    out["refine_engine_parity"] = dict(rel_cost=rel_cost, dv=dv, dw=dw)
    print(f"engine parity: rel_cost={rel_cost:.2e} |dv|={dv:.2e} "
          f"|dw|={dw:.2e}", flush=True)

    # --- 2+3. accel-mode timing + f32 k-hat per true k ---
    cfg_k = PipelineConfig(ransac_trials=64, ransac_tol=0.01,
                           refine_iterations=50, refine_rel_tol=0.0,
                           use_acceleration=True,
                           refine_engine="pallas", ransac_engine="pallas")
    chain = 8

    @jax.jit
    def step_k(f, key):
        def body(i, acc):
            r = estimate_from_flow(f, intr, 0.8, cfg_k,
                                   jax.random.fold_in(key, i))
            return acc + r.v.sum() + r.k
        return jax.lax.fori_loop(0, chain, body, jnp.float32(0.0))

    float(step_k(flow, jax.random.PRNGKey(0)))  # compile
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        float(step_k(flow, jax.random.PRNGKey(i)))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times)) / chain
    out["accel_600px_pairs_per_s"] = round(1.0 / dt, 2)
    print(f"accel-mode 600px: {1.0/dt:.2f} pairs/s", flush=True)

    khats = {}
    cfg_once = PipelineConfig(ransac_trials=64, ransac_tol=0.01,
                              refine_iterations=50, refine_rel_tol=0.0,
                              use_acceleration=True,
                              # production accel setting: the multi-start
                              # rescoring is what rejects near-equal-cost
                              # basins on weakly-observable k problems
                              refine_starts=2)
    fn_once = jax.jit(lambda f, key: estimate_from_flow(
        f, intr, 0.8, cfg_once, key).k)
    for k_true in (0.0, 0.5, 1.0, 1.5):
        f, _ = load(k_true)
        khats[k_true] = float(fn_once(f, jax.random.PRNGKey(7)))
        print(f"k_true={k_true}: f32 TPU k_hat={khats[k_true]:+.4f}",
              flush=True)
    out["k_hat_f32_tpu"] = khats

    # --- 4. Pallas blocked warp vs XLA gather warp on hardware ---
    from rs_sfm_tpu.flow.dense import _warp
    from rs_sfm_tpu.ops.pallas.warp import bilinear_warp

    h, w = 1080, 1920
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    # Smooth in-budget flow field (residual ≤ radius after block
    # consensus): the kernel's exactness contract.
    fx = 40 * np.sin(ys / 300) + 25 * np.cos(xs / 400)
    fy = -30 * np.cos(ys / 350) + 10 * np.sin(xs / 500)
    flow_s = jnp.asarray(np.stack([fx, fy], -1))
    wx = jax.jit(_warp)(img, flow_s)
    wp = jax.jit(lambda a, b: bilinear_warp(a, b, radius=16))(img, flow_s)
    # Exactness contract = pixels whose target is in-view; out-of-view
    # pixels clamp to a window-local edge (separately documented lossy
    # case; the variational data term never trusts them anyway).
    inview = ((xs + fx >= 0) & (xs + fx <= w - 1)
              & (ys + fy >= 0) & (ys + fy <= h - 1))
    diff = np.abs(np.asarray(wx - wp))
    max_abs = float(diff[inview].max())
    out["warp_exactness_smooth"] = dict(
        max_abs_diff=max_abs, outview_frac=float(1 - inview.mean()),
        outview_max=float(diff[~inview].max()) if (~inview).any() else 0.0)
    print(f"warp exactness (smooth in-budget flow): max|diff|={max_abs:.3e}",
          flush=True)
    # Discontinuous flow (castle-like parallax step): report the error
    # quantiles + affected fraction of the documented lossy case.
    step = np.where(xs > w / 2, 60.0, 0.0).astype(np.float32)
    flow_d = jnp.asarray(np.stack([fx + step, fy], -1))
    wx2 = jax.jit(_warp)(img, flow_d)
    wp2 = jax.jit(lambda a, b: bilinear_warp(a, b, radius=16))(img, flow_d)
    d = np.abs(np.asarray(wx2 - wp2))
    out["warp_discontinuity"] = dict(
        frac_wrong=float((d > 1e-6).mean()),
        q999=float(np.quantile(d, 0.999)))
    print(f"warp discontinuity case: frac|diff|>1e-6 = "
          f"{out['warp_discontinuity']['frac_wrong']:.4f}", flush=True)

    # --- 5. Per-stage full-HD timings (roofline attribution) ---
    from __graft_entry__ import _make_flow
    from rs_sfm_tpu.geom.rspose import scanline_poses
    from rs_sfm_tpu.rectify.backproject import backproject
    from rs_sfm_tpu.solver.pipeline import prepare_flow_inputs
    from rs_sfm_tpu.solver.ransac import ransac
    from rs_sfm_tpu.solver.refine_pallas import refine_pallas

    intr_hd = default_intrinsics(h, w)
    cfg_hd = PipelineConfig(ransac_trials=256, ransac_chunk=32,
                            refine_iterations=50, refine_rel_tol=0.0,
                            refine_engine="pallas", ransac_engine="pallas")
    flow_hd = jnp.asarray(_make_flow(h, w))
    image_hd = jnp.asarray(rng.uniform(0.1, 0.9, (h, w, 3))
                           .astype(np.float32))

    def timeit(fn, *args, reps=5, chain=4):
        @jax.jit
        def k_times(*a):
            def body(i, acc):
                return acc + fn(*a, i)
            return jax.lax.fori_loop(0, chain, body, jnp.float32(0.0))

        float(k_times(*args))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(k_times(*args))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) / chain * 1e3  # ms

    coords, flow_n, alpha, alpha_k, valid = prepare_flow_inputs(
        flow_hd, intr_hd, 0.9, cfg_hd)

    def t_prepare(f, i):
        c, fn_, a, ak, v_ = prepare_flow_inputs(
            f + 1e-6 * i, intr_hd, 0.9, cfg_hd)
        return c.sum() + fn_.sum() + a.sum() + ak.sum()

    def t_ransac(_, i):
        rr = ransac(coords, flow_n, alpha, alpha_k, valid,
                    key=jax.random.fold_in(jax.random.PRNGKey(0), i),
                    use_k=False, trials=cfg_hd.ransac_trials,
                    tolerance=cfg_hd.ransac_tol, chunk=cfg_hd.ransac_chunk,
                    engine="pallas")
        return rr.v.sum() + rr.inv_depth.sum()

    rr0 = ransac(coords, flow_n, alpha, alpha_k, valid,
                 key=jax.random.PRNGKey(0), use_k=False,
                 trials=cfg_hd.ransac_trials, tolerance=cfg_hd.ransac_tol,
                 chunk=cfg_hd.ransac_chunk, engine="pallas")
    rr0 = jax.tree_util.tree_map(jnp.asarray, rr0)

    def t_refine(_, i):
        ref = refine_pallas(coords, flow_n, alpha, alpha_k,
                            rr0.inlier_mask, rr0.v + 1e-6 * i, rr0.w,
                            rr0.k, rr0.inv_depth, optimize_k=False,
                            iterations=cfg_hd.refine_iterations,
                            rel_tol=0.0)
        return ref.v.sum() + ref.inv_depth.sum()

    depth_map = jnp.where(rr0.inlier_mask, 1.0 / jnp.where(
        rr0.inv_depth == 0, 1.0, rr0.inv_depth), 0.0).reshape(h, w)

    def t_rectify(_, i):
        r_sl, t_sl = scanline_poses(rr0.v + 1e-6 * i, rr0.w, rr0.k, h, 0.9,
                                    dtype=jnp.float32)
        rect = backproject(image_hd, depth_map, r_sl, t_sl, intr_hd)
        return rect.gs_image.sum()

    stages = {}
    for name, fn in [("prepare", t_prepare), ("ransac_score", t_ransac),
                     ("refine_50it", t_refine), ("rectify", t_rectify)]:
        stages[name] = round(timeit(fn, flow_hd), 2)
        print(f"stage {name}: {stages[name]} ms", flush=True)
    out["fullhd_stage_ms"] = stages

    # --- 6. Double-buffered video dispatch overlap ---
    import tempfile

    from rs_sfm_tpu.video import estimate_video
    from rs_sfm_tpu.video_ckpt import process_video_checkpointed

    pairs = 8
    flows_np = np.stack([np.asarray(_make_flow(256, 256, seed=i))
                         for i in range(pairs)])
    cfg_v = PipelineConfig(ransac_trials=64, ransac_chunk=32,
                           refine_iterations=20, refine_rel_tol=0.0)
    intr_v = default_intrinsics(256, 256)

    # Warm the window graph once so both paths time execution, not compile.
    run_win = jax.jit(lambda f, k: estimate_video(
        f, intr_v, 0.9, cfg_v, k))
    float(run_win(jnp.asarray(flows_np[:2]),
                  jax.random.PRNGKey(9)).v.sum())

    with tempfile.TemporaryDirectory() as td:
        t0 = time.perf_counter()
        process_video_checkpointed(
            flows_np, intr_v, 0.9, cfg_v, jax.random.PRNGKey(0),
            ckpt_dir=td + "/a", window=2)
        t_db = time.perf_counter() - t0
    # Serial baseline: window-at-a-time with a sync between windows.
    t0 = time.perf_counter()
    for wi in range(pairs // 2):
        r = run_win(jnp.asarray(flows_np[wi * 2:wi * 2 + 2]),
                    jax.random.fold_in(jax.random.PRNGKey(0), wi))
        float(r.v.sum())
    t_serial = time.perf_counter() - t0
    out["video_double_buffer"] = dict(
        double_buffered_s=round(t_db, 3), serial_s=round(t_serial, 3))
    print(f"video 8 pairs: double-buffered {t_db:.3f}s (incl. checkpoint "
          f"writes) vs serial {t_serial:.3f}s", flush=True)

    with open(os.path.join(REPO, "results", "tpu_validate.json"), "w") as fp:
        json.dump(out, fp, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
