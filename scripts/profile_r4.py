"""Round-4 profiling: flow-stage breakdown + rectification-scatter scaling.

Two measurement families feeding the round-4 optimization targets
(VERDICT items 2-3):

  * dense-flow per-stage attribution at full-HD with the production
    engines (Pallas warp + fused SOR) — where do the ~96 ms of the e2e
    budget actually go (levels? warps? SOR? median? discrete search?);
  * rectification scatter: the packed z-buffer vs its raw building blocks
    (scatter-min alone, sort, gather) and vs source count — is the 30-53 ms
    bandwidth, op-lowering, or latency?

Writes results/profile_r4.json.  Value-fetch timing (tunnel-safe).
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "results", "profile_r4.json")


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

    out = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            out = json.load(f)

    def save():
        with open(OUT, "w") as f:
            json.dump(out, f, indent=1)

    def timeit(tag, fn, *args, reps=3):
        if tag in out:
            print(f"{tag:44s} {out[tag]:8.1f} ms (cached)", flush=True)
            return out[tag]
        t0 = time.perf_counter()
        r = fn(*args)
        float(np.asarray(r).ravel()[0].sum()
              if hasattr(r, "ravel") else jnp.asarray(r).sum())
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            r = fn(*args)
            float(jnp.asarray(r).sum())
            ts.append(time.perf_counter() - t0)
        ms = min(ts) * 1e3
        out[tag] = round(ms, 2)
        out[tag + "_compile_s"] = round(compile_s, 1)
        save()
        print(f"{tag:44s} {ms:8.1f} ms   (compile {compile_s:.0f}s)",
              flush=True)
        return ms

    h, w = 1080, 1920

    # Realistic imagery: the cached stress-scene render if present.
    cache = os.path.join(REPO, "results", "stress_cache",
                         f"stress_{h}x{w}_castle_clean_v2.npz")
    if os.path.exists(cache):
        with np.load(cache) as z:
            i1 = jnp.asarray(z["i1"])
            i2 = jnp.asarray(z["i2"])
    else:
        rng = np.random.default_rng(0)
        base = rng.uniform(0.1, 0.9, (h + 8, w + 8)).astype(np.float32)
        i1 = jnp.asarray(base[4:4 + h, 4:4 + w])
        i2 = jnp.asarray(base[2:2 + h, 6:6 + w])

    prod = DenseFlowConfig(warp_engine="pallas", sor_engine="pallas")

    def fb(cfg):
        return lambda: flow_forward_backward(i1, i2, cfg).flow

    def fwd(cfg):
        return lambda: dense_flow(i1, i2, cfg)

    timeit("fb_prod_bs2", fb(prod._replace(backward_scale=2)))
    timeit("fwd_prod", fwd(prod))
    timeit("fwd_median_off", fwd(prod._replace(median=False)))
    timeit("fwd_warps1", fwd(prod._replace(warps=1)))
    timeit("fwd_iters4", fwd(prod._replace(iters=4)))
    timeit("fwd_no_discrete", fwd(prod._replace(
        init_search_radius=0, refine_search_radius=0)))
    timeit("fwd_finest_only", fwd(prod._replace(
        levels=1, init_search_radius=0, refine_search_radius=0)))
    timeit("fwd_coarse_to_half", fwd(prod._replace(levels=5))
           if False else fwd(prod._replace(levels=6)))
    # Pyramid-only cost: 2 levels (finest + one coarse), no discrete.
    timeit("fwd_2levels", fwd(prod._replace(
        levels=2, init_search_radius=0, refine_search_radius=0)))
    timeit("fwd_xla_sor", fwd(prod._replace(sor_engine="xla")))

    # ---- sub-stage probes at full-HD -----------------------------------
    from rs_sfm_tpu.flow import dense as D
    from rs_sfm_tpu.ops.pallas import sor as psor
    from rs_sfm_tpu.ops.pallas.warp import bilinear_warp

    g1 = D._to_gray(i1)
    g2 = D._to_gray(i2)
    flow0 = jnp.zeros((h, w, 2), jnp.float32) + jnp.asarray(
        [12.0, -7.0], jnp.float32)

    timeit("warp_pallas_r16", jax.jit(
        lambda: bilinear_warp(g2, flow0, radius=16)))

    @jax.jit
    def coef_stage():
        i2w = bilinear_warp(g2, flow0, radius=16)
        ix, iy = D._gradients(i2w)
        it = i2w - g1
        g1x, g1y = D._gradients(g1)
        g2x, g2y = D._gradients(i2w)
        gtx, gty = g2x - g1x, g2y - g1y
        ixx, ixy = D._gradients(g2x)
        _, iyy = D._gradients(g2y)
        u0 = flow0[..., 0]
        v0 = flow0[..., 1]
        c = it - ix * u0 - iy * v0
        cgx = gtx - ixx * u0 - ixy * v0
        cgy = gty - ixy * u0 - iyy * v0
        return jnp.stack([ix, iy, c, ixx, ixy, iyy, cgx, cgy])

    timeit("warp_plus_coef", coef_stage)

    coef = coef_stage()
    coef = jax.device_put(np.asarray(coef))

    @jax.jit
    def sor20():
        return psor.sor_sweeps_pallas(
            coef, flow0[..., 0], flow0[..., 1], iters=20, omega=1.85,
            lam=0.08, eps2=1e-6, wbr=1.0, wgrad=0.7)[0]

    timeit("sor_pallas_20it", sor20)

    @jax.jit
    def med():
        return D._median3(flow0[..., 0])

    timeit("median3_one_plane", med)

    # ---- rectification scatter family ----------------------------------
    from rs_sfm_tpu.data.synthetic import default_intrinsics
    from rs_sfm_tpu.geom.rspose import scanline_poses
    from rs_sfm_tpu.rectify.backproject import backproject
    from __graft_entry__ import _make_flow

    intr = default_intrinsics(h, w)
    if os.path.exists(cache):
        with np.load(cache) as z:
            depth = jnp.asarray(z["true_depth"])
            vv = jnp.asarray(z["v"], jnp.float32)
            ww = jnp.asarray(z["w"], jnp.float32)
        img = i1 if i1.ndim == 3 else jnp.stack([i1, i1, i1], axis=-1)
    else:
        depth = jnp.asarray(
            5.0 + np.random.default_rng(1).uniform(0, 2, (h, w)),
            jnp.float32)
        vv = jnp.asarray([0.35, -0.15, 0.25], jnp.float32)
        ww = jnp.asarray([0.003, -0.002, 0.004], jnp.float32)
        img = jnp.stack([i1, i1, i1], axis=-1)
    r_sl, t_sl = scanline_poses(vv, ww, jnp.float32(0.0), h, 0.9,
                                dtype=jnp.float32)

    timeit("backproject_packed", lambda: backproject(
        img, depth, r_sl, t_sl, intr, method="packed").gs_image)

    # Raw building blocks with the real target distribution.
    def _targets():
        res = backproject(img, depth, r_sl, t_sl, intr, method="packed")
        return res  # recompute inside jit below instead

    from rs_sfm_tpu.geom.camera import pixel_grid, plane_to_space, \
        space_to_plane
    from rs_sfm_tpu.geom.rspose import camera_to_world, world_to_camera

    @jax.jit
    def _proj():
        grid = pixel_grid(h, w, dtype=jnp.float32)
        cam = plane_to_space(grid, depth, intr)
        world = camera_to_world(cam, r_sl[:, None], t_sl[:, None])
        cam0 = world_to_camera(world, r_sl[0], t_sl[0])
        pt = space_to_plane(cam0, intr)
        px = jnp.floor(pt[..., 0] + 0.5).astype(jnp.int32)
        py = jnp.floor(pt[..., 1] + 0.5).astype(jnp.int32)
        ok = (px >= 0) & (px < w) & (py >= 0) & (py < h)
        n = h * w
        fi = jnp.where(ok, py * w + px, n).reshape(-1)
        return fi, cam0[..., 2].reshape(-1)

    fi, dz = _proj()
    fi = jax.device_put(np.asarray(fi))
    packed_vals = jax.device_put(
        np.random.default_rng(2).integers(0, 2**30, h * w).astype(np.int32))

    n = h * w

    @jax.jit
    def scatter_min_only(fi, vals):
        buf = jnp.full((n + 1,), jnp.int32(2**31 - 1))
        return buf.at[fi].min(vals)[:n]

    timeit("scatter_min_2M", lambda: scatter_min_only(fi, packed_vals))

    # Source-count scaling: scatter the first n/2, n/4 entries only
    # (rest routed to the drop slot).
    for frac, tag in ((2, "scatter_min_1M"), (4, "scatter_min_0p5M")):
        keep = n // frac
        fi_sub = jnp.where(jnp.arange(n) < keep, fi, n)
        fi_sub = jax.device_put(np.asarray(fi_sub))
        timeit(tag, lambda fs=fi_sub: scatter_min_only(fs, packed_vals))

    # Row-local variant: how much faster is scatter when targets stay in
    # the source's neighborhood (bounded |ty - y|)?  Emulates binned
    # routing's post-rout local conflict resolution.
    fi_local = jax.device_put(np.asarray(
        (np.arange(n) + np.random.default_rng(3).integers(-64, 64, n))
        % n).astype(np.int32))
    timeit("scatter_min_2M_local", lambda: scatter_min_only(
        fi_local, packed_vals))

    @jax.jit
    def sort_only(vals):
        return jax.lax.sort(vals)

    timeit("sort_2M_int32", lambda: sort_only(packed_vals))

    @jax.jit
    def sort_pair(k, v):
        return jax.lax.sort((k, v), num_keys=1, is_stable=True)[0]

    timeit("sort_2M_kv", lambda: sort_pair(packed_vals, fi))

    colors = img.reshape(-1, 3)

    @jax.jit
    def gather_only(idx):
        return colors[jnp.clip(idx, 0, n - 1)]

    timeit("gather_2M_rgb", lambda: gather_only(fi))

    @jax.jit
    def cumsum_only(vals):
        return jnp.cumsum(vals)

    timeit("cumsum_2M", lambda: cumsum_only(packed_vals))

    # Histogram by target row (1080 bins) via scatter-add — binned-routing
    # prerequisite.
    rows_of_target = jax.device_put(np.asarray(
        np.minimum(np.asarray(fi) // w, h - 1), np.int32))

    @jax.jit
    def hist_rows(r):
        return jnp.zeros((h + 1,), jnp.int32).at[r].add(1)

    timeit("hist_1080bins", lambda: hist_rows(rows_of_target))

    # ---- round-4 optimization validation (post-change timings) ---------
    # Chained x4 inside one jit to amortize the ~25 ms tunnel round trip
    # (the family above established that floor; these numbers are
    # per-call with the dispatch amortized).
    def chain4(fn):
        @jax.jit
        def run():
            def body(i, acc):
                return acc + fn(i)
            return jax.lax.fori_loop(0, 4, body, jnp.float32(0.0))

        def timed():
            return run()
        return timed

    def t4(tag, fn):
        if tag in out:
            print(f"{tag:44s} {out[tag]:8.1f} ms (cached)", flush=True)
            return
        f = chain4(fn)
        t0 = time.perf_counter()
        float(f())
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(f())
            ts.append(time.perf_counter() - t0)
        ms = min(ts) / 4 * 1e3
        out[tag] = round(ms, 2)
        out[tag + "_compile_s"] = round(compile_s, 1)
        save()
        print(f"{tag:44s} {ms:8.1f} ms   (compile {compile_s:.0f}s)",
              flush=True)

    t4("r4_backproject_packed24", lambda i: backproject(
        img, depth + 0.0 * i, r_sl, t_sl, intr,
        method="packed24").gs_image.sum())
    t4("r4_backproject_packed", lambda i: backproject(
        img, depth + 0.0 * i, r_sl, t_sl, intr,
        method="packed").gs_image.sum())

    g1f = i1 if i1.ndim == 2 else (0.299 * i1[..., 0] + 0.587 * i1[..., 1]
                                   + 0.114 * i1[..., 2])
    g2f = i2 if i2.ndim == 2 else (0.299 * i2[..., 0] + 0.587 * i2[..., 1]
                                   + 0.114 * i2[..., 2])
    t4("r4_fwd_prod_sorall", lambda i: dense_flow(
        g1f + 0.0 * i, g2f, prod).sum())
    t4("r4_fb_prod_bs2_sorall", lambda i: flow_forward_backward(
        g1f + 0.0 * i, g2f, prod._replace(backward_scale=2)).flow.sum())

    # Multi-start refine cost: 1-start vs batched 4-start (VERDICT item 6:
    # target <= 1.5x).
    from rs_sfm_tpu.config import PipelineConfig
    from rs_sfm_tpu.solver.pipeline import estimate_from_flow

    flow_dev = jnp.asarray(_make_flow(h, w))
    for js in (1, 4):
        cfgj = PipelineConfig(ransac_trials=256, ransac_chunk=32,
                              ransac_tol=0.02, refine_iterations=30,
                              refine_rel_tol=0.0, refine_starts=js,
                              refine_engine="pallas",
                              ransac_engine="pallas")
        t4(f"r4_solver_starts{js}", lambda i, c=cfgj: estimate_from_flow(
            flow_dev, intr, 0.9, c,
            jax.random.fold_in(jax.random.PRNGKey(0), i)).v.sum())

    print(json.dumps(out))


if __name__ == "__main__":
    main()
