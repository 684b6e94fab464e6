"""Round-5 second-pass probes: pyramid-tail attribution.

profile_r5 showed the finest level at ~35 ms of the ~79 ms forward pass —
the ~44 ms tail is the 5 coarse levels + upsampling + discrete search,
far above their pixel share (~1/3 of finest).  These probes pin it:

  * per-level marginal cost (levels=1..6);
  * _up2 formulations: interleave (current), jax.image.resize, Pallas
    (the standalone interleave measured 17 ms for ONE 540->1080 plane —
    ~500x its byte roofline; suspect sublane-relayout lowering);
  * discrete-search stages: scan (current) vs batched cost volume.

Writes results/profile_r5b.json.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "results", "profile_r5b.json")


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

    # ---- per-level marginals -------------------------------------------
    for lv in (1, 2, 3, 4, 6):
        t4(f"r5b_fwd_levels{lv}", lambda k, lv=lv: dense_flow(
            g1 + eps_of(k), g2, prod._replace(
                levels=lv,
                init_search_radius=(prod.init_search_radius if lv == 6
                                    else 0))).sum())

    # Full pyramid but NO upsample cost: monkeypatch _upsample_flow to
    # nearest repeat (cheap, wrong values — timing only).
    orig_up = D._upsample_flow

    def up_nearest(flow, shape):
        hh, ww = shape
        fh, fw = flow.shape[:2]
        o = jnp.repeat(jnp.repeat(flow, 2, axis=0), 2, axis=1)
        o = o[:hh, :ww]
        if o.shape[0] < hh or o.shape[1] < ww:
            o = jnp.pad(o, ((0, hh - o.shape[0]), (0, ww - o.shape[1]),
                            (0, 0)), mode="edge")
        return o * jnp.asarray([ww / fw, hh / fh], flow.dtype)

    D._upsample_flow = up_nearest
    try:
        t4("r5b_fwd_up_nearest", lambda k: dense_flow(
            g1 + eps_of(k), g2, prod).sum())
    finally:
        D._upsample_flow = orig_up

    def up_resize(flow, shape):
        hh, ww = shape
        fh, fw = flow.shape[:2]
        o = jax.image.resize(flow, (hh, ww, 2), method="bilinear")
        return o * jnp.asarray([ww / fw, hh / fh], flow.dtype)

    D._upsample_flow = up_resize
    try:
        t4("r5b_fwd_up_resize", lambda k: dense_flow(
            g1 + eps_of(k), g2, prod).sum())
    finally:
        D._upsample_flow = orig_up

    # ---- up2 standalone variants at 540x960 -> 1080x1920 ---------------
    half = g2[::2, ::2]
    half = jax.device_put(np.asarray(half))

    t4("r5b_up2_interleave", lambda k: D._up2(half + eps_of(k)).sum())
    t4("r5b_up2_resize", lambda k: jax.image.resize(
        half + eps_of(k), (1080, 1920), method="bilinear").sum())
    t4("r5b_up2_repeat_sel", lambda k: _up2_repeat(jnp, D,
                                                   half + eps_of(k)).sum())

    # ---- discrete search: scan vs where it matters ---------------------
    # Whole-pipeline with discrete stages off is already in profile_r5
    # (no_discrete ~= prod).  Directly probe the two stages standalone.
    q1 = jax.device_put(np.asarray(g1[::8, ::8]))   # 135x240
    q2 = jax.device_put(np.asarray(g2[::8, ::8]))
    t4("r5b_coarse_init_r8_135x240", lambda k: D._coarse_init(
        q1 + eps_of(k), q2, 8, prod).sum())
    fl0 = jnp.zeros((135, 240, 2), jnp.float32)
    t4("r5b_discrete_refine_r4_135x240", lambda k: D._discrete_refine(
        q1 + eps_of(k), q2, fl0, 4, prod).sum())

    # ---- median / misc fixed costs at coarse shapes --------------------
    from rs_sfm_tpu.ops.pallas import median as pmedian

    t4("r5b_median_540x960", lambda k: pmedian.median3_planes(
        jnp.stack([half + eps_of(k), half])).sum())

    print(json.dumps(out))


def _up2_repeat(jnp, D, x):
    """repeat + parity-select formulation of the exact _up2 stencil."""
    import jax

    def axis_up(z, axis):
        r = jnp.repeat(z, 2, axis=axis)
        n = r.shape[axis]
        idx = jax.lax.broadcasted_iota(jnp.int32, r.shape, axis)
        prev = D._shift(r, 1, axis)
        nxt = D._shift(r, -1, axis)
        return 0.75 * r + 0.25 * jnp.where(idx % 2 == 0, prev, nxt)

    return axis_up(axis_up(x, 0), 1)


if __name__ == "__main__":
    main()
