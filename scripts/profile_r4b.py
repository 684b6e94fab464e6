"""Round-4 second-pass probes: SOR level threshold + multi-start tile.

Fixes the first pass's methodological flaw (loop-body perturbation via
`x + 0.0*i` is foldable, so XLA may hoist the whole body out of the
chain loop) by deriving a genuine per-iteration epsilon from fold_in.
Writes results/profile_r4b.json.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "results", "profile_r4b.json")


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from rs_sfm_tpu.flow.dense import DenseFlowConfig, dense_flow, \
        flow_forward_backward
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
            print(f"{tag:44s} {out[tag]:8.1f} ms (cached)", flush=True)
            return

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
        print(f"{tag:44s} {ms:8.1f} ms   (compile {compile_s:.0f}s)",
              flush=True)

    h, w = 1080, 1920
    cache = os.path.join(REPO, "results", "stress_cache",
                         f"stress_{h}x{w}_castle_clean_v2.npz")
    with np.load(cache) as z:
        i1 = z["i1"]
        depth_np = z["true_depth"]
        vv = jnp.asarray(z["v"], jnp.float32)
        ww = jnp.asarray(z["w"], jnp.float32)
    g1 = jnp.asarray(0.299 * i1[..., 0] + 0.587 * i1[..., 1]
                     + 0.114 * i1[..., 2])
    g2 = jnp.roll(g1, (3, -5), (0, 1))
    prod = DenseFlowConfig(warp_engine="pallas", sor_engine="pallas")

    def eps_of(k):
        return 1e-6 * jax.random.uniform(k, ())

    orig_supported = psor.supported

    def with_min(min_dim):
        def supported(hh, wwid, cw):
            return cw == 0.0 and min(hh, wwid) >= min_dim
        return supported

    for tag, min_dim in (("r4b_fwd_min32", 0), ("r4b_fwd_min128", 128),
                         ("r4b_fwd_min500", 500),
                         ("r4b_fwd_finestonly", 1000)):
        psor.supported = orig_supported if min_dim == 0 else with_min(
            min_dim)
        try:
            t4(tag, lambda k: dense_flow(g1 + eps_of(k), g2, prod).sum())
        finally:
            psor.supported = orig_supported

    t4("r4b_fb_bs2", lambda k: flow_forward_backward(
        g1 + eps_of(k), g2, prod._replace(backward_scale=2)).flow.sum())

    # Multi-start solver: tile sweep.
    from __graft_entry__ import _make_flow
    from rs_sfm_tpu.config import PipelineConfig
    from rs_sfm_tpu.data.synthetic import default_intrinsics
    from rs_sfm_tpu.solver.pipeline import estimate_from_flow
    import rs_sfm_tpu.ops.pallas.refine_kernels as rk

    intr = default_intrinsics(h, w)
    flow_dev = jnp.asarray(_make_flow(h, w))

    def solver_fn(js):
        cfgj = PipelineConfig(ransac_trials=256, ransac_chunk=32,
                              ransac_tol=0.02, refine_iterations=30,
                              refine_rel_tol=0.0, refine_starts=js,
                              refine_engine="pallas",
                              ransac_engine="pallas")
        return lambda k: estimate_from_flow(flow_dev, intr, 0.9, cfgj,
                                            k).v.sum()

    t4("r4b_solver_starts1", solver_fn(1))
    for tile in (4096, 16384, 32768):
        rk.TILE_MULTI = tile
        try:
            t4(f"r4b_solver_starts4_t{tile}", solver_fn(4))
        finally:
            rk.TILE_MULTI = 16384
    t4("r4b_solver_starts2_t16384", solver_fn(2))

    # Rectify with packed24 under genuine perturbation.
    from rs_sfm_tpu.geom.rspose import scanline_poses
    from rs_sfm_tpu.rectify.backproject import backproject

    depth = jnp.asarray(depth_np)
    img = jnp.asarray(i1)
    r_sl, t_sl = scanline_poses(vv, ww, jnp.float32(0.0), h, 0.9,
                                dtype=jnp.float32)
    t4("r4b_backproject_packed24", lambda k: backproject(
        img, depth + eps_of(k), r_sl, t_sl, intr,
        method="packed24").gs_image.sum())
    t4("r4b_backproject_packed", lambda k: backproject(
        img, depth + eps_of(k), r_sl, t_sl, intr,
        method="packed").gs_image.sum())

    print(json.dumps(out))


if __name__ == "__main__":
    main()
