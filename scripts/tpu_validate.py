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
                              use_acceleration=True)
    fn_once = jax.jit(lambda f, key: estimate_from_flow(
        f, intr, 0.8, cfg_once, key).k)
    for k_true in (0.0, 0.5, 1.0, 1.5):
        f, _ = load(k_true)
        khats[k_true] = float(fn_once(f, jax.random.PRNGKey(7)))
        print(f"k_true={k_true}: f32 TPU k_hat={khats[k_true]:+.4f}",
              flush=True)
    out["k_hat_f32_tpu"] = khats

    with open(os.path.join(REPO, "results", "tpu_validate.json"), "w") as fp:
        json.dump(out, fp, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
