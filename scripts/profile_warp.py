"""Benchmark bilinear-warp formulations at full-HD on the TPU.

The dense-flow profile shows ~86 ms per warp gather (dominating flow).
Candidates:
  1. current 4x 2D int-array gather
  2. flattened 1D gather (img.reshape(-1)[y0*w+x0])
  3. jax.scipy.ndimage.map_coordinates(order=1)
  4. 2-gather variant (gather (2,)-windows along x, lerp, then y)
"""

import os
import time

import numpy as np


def main():
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    h, w = 1080, 1920
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    flow = jnp.asarray(
        (rng.uniform(-30, 30, (h, w, 2)).astype(np.float32)))

    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")

    def coords(flow):
        x = jnp.clip(xs + flow[..., 0], 0.0, w - 1.0)
        y = jnp.clip(ys + flow[..., 1], 0.0, h - 1.0)
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        x1 = jnp.minimum(x0 + 1, w - 1)
        y1 = jnp.minimum(y0 + 1, h - 1)
        return x, y, x0, y0, x1, y1

    @jax.jit
    def warp_2d(img, flow):
        x, y, x0, y0, x1, y1 = coords(flow)
        fx = x - x0
        fy = y - y0
        v00 = img[y0, x0]
        v01 = img[y0, x1]
        v10 = img[y1, x0]
        v11 = img[y1, x1]
        return ((1 - fy) * ((1 - fx) * v00 + fx * v01)
                + fy * ((1 - fx) * v10 + fx * v11))

    @jax.jit
    def warp_flat(img, flow):
        x, y, x0, y0, x1, y1 = coords(flow)
        fx = x - x0
        fy = y - y0
        f = img.reshape(-1)
        v00 = f[y0 * w + x0]
        v01 = f[y0 * w + x1]
        v10 = f[y1 * w + x0]
        v11 = f[y1 * w + x1]
        return ((1 - fy) * ((1 - fx) * v00 + fx * v01)
                + fy * ((1 - fx) * v10 + fx * v11))

    @jax.jit
    def warp_mapcoords(img, flow):
        from jax.scipy.ndimage import map_coordinates
        x = jnp.clip(xs + flow[..., 0], 0.0, w - 1.0)
        y = jnp.clip(ys + flow[..., 1], 0.0, h - 1.0)
        return map_coordinates(img, [y, x], order=1, mode="nearest")

    @jax.jit
    def warp_rowcol(img, flow):
        # take_along_axis per axis (Catmull-Smith-ish 2-pass, approximate).
        x, y, x0, y0, x1, y1 = coords(flow)
        fx = x - x0
        fy = y - y0
        rx0 = jnp.take_along_axis(img, x0, axis=1)
        rx1 = jnp.take_along_axis(img, x1, axis=1)
        rowv = (1 - fx) * rx0 + fx * rx1
        cy0 = jnp.take_along_axis(rowv, y0, axis=0)
        cy1 = jnp.take_along_axis(rowv, y1, axis=0)
        return (1 - fy) * cy0 + fy * cy1

    def run(tag, fn):
        try:
            out = fn(img, flow)
            float(out.sum())
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                out = fn(img, flow)
                float(out.sum())
                ts.append(time.perf_counter() - t0)
            print(f"{tag:28s} {min(ts)*1e3:8.1f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"{tag:28s} FAILED: {type(e).__name__}: {e}")

    run("4x 2D gather (current)", warp_2d)
    run("4x flat 1D gather", warp_flat)
    run("map_coordinates o1", warp_mapcoords)
    run("take_along_axis 2-pass", warp_rowcol)


if __name__ == "__main__" and not os.environ.get("BENCH_PALLAS"):
    main()


def bench_pallas():
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from rs_sfm_tpu.ops.pallas.warp import bilinear_warp

    h, w = 1080, 1920
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    u = (25.0 * np.sin(ys / 600) + 3.0 * np.cos(xs / 900) - 7.3)
    v = (-20.0 * np.cos(ys / 700) + 2.5 * np.sin(xs / 800) + 4.8)
    flow = jnp.asarray(np.stack([u, v], -1).astype(np.float32))

    out = bilinear_warp(img, flow)
    float(out.sum())
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = bilinear_warp(img, flow)
        float(out.sum())
        ts.append(time.perf_counter() - t0)
    print(f"{'pallas blocked warp':28s} {min(ts)*1e3:8.1f} ms")
    # correctness on TPU vs XLA gather
    ref_x = jnp.clip(jnp.asarray(xs) + flow[..., 0], 0, w - 1.)
    ref_y = jnp.clip(jnp.asarray(ys) + flow[..., 1], 0, h - 1.)
    from jax.scipy.ndimage import map_coordinates
    ref = map_coordinates(img, [ref_y, ref_x], order=1, mode="nearest")
    print("max |pallas - xla| on TPU:",
          float(jnp.max(jnp.abs(out - ref))))


if __name__ == "__main__" and os.environ.get("BENCH_PALLAS"):
    bench_pallas()
