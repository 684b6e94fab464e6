"""Round-5 third-pass probes: where does a pyramid LEVEL's cost live?

profile_r5b showed per-level cost nearly resolution-independent
(levels2 - levels1 = +30 ms for a 1/4-pixel level).  These probes time
_level_solve standalone at every pyramid size with the production
engines, the conv-based downsample (ops/resample.py) against the
strided-slice original, and median on/off — to decide what to fuse or
reformulate.  Writes results/profile_r5c.json.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "results", "profile_r5c.json")


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from rs_sfm_tpu.flow import dense as D
    from rs_sfm_tpu.flow.dense import DenseFlowConfig, dense_flow
    from rs_sfm_tpu.ops import resample as R

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
    prod = DenseFlowConfig(warp_engine="pallas", sor_engine="pallas")

    def eps_of(k):
        return 1e-6 * jax.random.uniform(k, ())

    # ---- level_solve standalone per size -------------------------------
    planes = []
    a, b = g1, g2
    for _ in range(5):
        planes.append((jax.device_put(np.asarray(a)),
                       jax.device_put(np.asarray(b))))
        a, b = D._downsample(a), D._downsample(b)

    for p1, p2 in planes:
        hh, ww = p1.shape
        fl = jnp.zeros((hh, ww, 2), jnp.float32)
        t4(f"r5c_level_{hh}x{ww}", lambda k, p1=p1, p2=p2, fl=fl: (
            D._level_solve(p1 + eps_of(k), p2, fl, prod,
                           finest=True).sum()))
        t4(f"r5c_warp_{hh}x{ww}", lambda k, p2=p2, fl=fl: (
            D._warp_cfg(p2 + eps_of(k), fl, prod).sum()))

    # one-warp level (isolates per-warp fixed costs vs per-level)
    p1h, p2h = planes[1]
    flh = jnp.zeros((540, 960, 2), jnp.float32)
    t4("r5c_level_540_warps1", lambda k: D._level_solve(
        p1h + eps_of(k), p2h, flh, prod._replace(warps=1),
        finest=True).sum())
    t4("r5c_level_540_nomedian", lambda k: D._level_solve(
        p1h + eps_of(k), p2h, flh, prod._replace(median=False),
        finest=True).sum())
    t4("r5c_level_540_sorxla", lambda k: D._level_solve(
        p1h + eps_of(k), p2h, flh, prod._replace(sor_engine="xla"),
        finest=True).sum())
    t4("r5c_level_540_warpxla", lambda k: D._level_solve(
        p1h + eps_of(k), p2h, flh, prod._replace(warp_engine="xla"),
        finest=True).sum())

    # ---- downsample formulations ---------------------------------------
    t4("r5c_down_slice_1080", lambda k: D._downsample(
        g1 + eps_of(k)).sum())
    t4("r5c_down_conv_1080", lambda k: R.down2_blur(
        g1 + eps_of(k)).sum())
    t4("r5c_up2_conv_540", lambda k: R.up2(p1h + eps_of(k)).sum())

    # ---- whole-pipeline variants ---------------------------------------
    # Order matters: dense_flow's jit caches by (cfg, shape) WITHIN this
    # process, so the unpatched prod graph must be traced before the
    # monkeypatched one would otherwise shadow it (and vice versa) — give
    # the patched variant a distinct cfg (warp_radius bump is semantically
    # inert here) to force a separate trace.
    t4("r5c_fwd_prod_again", lambda k: dense_flow(
        g1 + eps_of(k), g2, prod).sum())
    t4("r5c_fwd_median_off", lambda k: dense_flow(
        g1 + eps_of(k), g2, prod._replace(median=False)).sum())

    orig_down = D._downsample
    orig_up2 = D._up2
    D._downsample = R.down2_blur
    D._up2 = R.up2
    try:
        t4("r5c_fwd_conv_resample", lambda k: dense_flow(
            g1 + eps_of(k), g2, prod._replace(warp_radius=17)).sum())
    finally:
        D._downsample = orig_down
        D._up2 = orig_up2

    print(json.dumps(out))


if __name__ == "__main__":
    main()
