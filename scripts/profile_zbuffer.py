"""Time + cross-check the rectification engines on the TPU at full-HD.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site timeout 3600 \
      python scripts/profile_zbuffer.py
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from __graft_entry__ import _make_flow
    from rs_sfm_tpu.data.synthetic import default_intrinsics
    from rs_sfm_tpu.geom.rspose import scanline_poses
    from rs_sfm_tpu.rectify.backproject import backproject

    h, w = 1080, 1920
    intr = default_intrinsics(h, w)
    # Realistic scene: the cached full-HD castle render (true depth +
    # image + the stress motion) — the depth smoothness the inverse
    # consensus relies on is a property of real scenes, not noise.
    cache = os.path.join(REPO, "results", "stress_cache",
                         "stress_1080x1920_castle_clean_v2.npz")
    with np.load(cache) as z:
        img = jnp.asarray(z["i1"], jnp.float32)
        depth = jnp.asarray(z["true_depth"], jnp.float32)
    r_sl, t_sl = scanline_poses(
        jnp.asarray([0.35, -0.15, 0.25], jnp.float32),
        jnp.asarray([0.003, -0.002, 0.004], jnp.float32),
        jnp.float32(0.0), h, 0.9, dtype=jnp.float32)

    out = {}
    results = {}
    for method in ("packed", "scatter", "pallas"):
        fn = jax.jit(lambda i, d, m=method: backproject(
            i, d, r_sl, t_sl, intr, method=m))
        t0 = time.perf_counter()
        res = fn(img, depth)
        float(res.gs_image.sum())
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            res = fn(img, depth)
            float(res.gs_image.sum())
            ts.append(time.perf_counter() - t0)
        results[method] = res
        out[method] = dict(ms=round(min(ts) * 1e3, 2),
                           compile_s=round(compile_s, 1),
                           scattered_frac=float(res.scattered.mean()))
        print(method, json.dumps(out[method]), flush=True)

    a = np.asarray(results["packed"].gs_image)
    b = np.asarray(results["pallas"].gs_image)
    sa = np.asarray(results["packed"].scattered)
    sb = np.asarray(results["pallas"].scattered)
    both = sa & sb
    diff = np.abs(a - b).max(axis=-1)
    out["pallas_vs_packed"] = dict(
        scattered_agree=float((sa == sb).mean()),
        color_mismatch_frac=float((diff[both] > 1e-6).mean()),
        # packed quantizes depth (ties differ); exact-agreement is not
        # expected at conflicts, only at conflict-free pixels
    )
    print(json.dumps(out["pallas_vs_packed"]), flush=True)
    with open(os.path.join(REPO, "results", "zbuffer_profile.json"),
              "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
