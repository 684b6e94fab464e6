"""Profile dense_flow stage costs at full-HD on the TPU.

Times full dense_flow and ablations (median off, fewer iters/warps, no
discrete stages) to localize where the 0.58 s goes before writing a
fused Pallas kernel.  Value-fetch timing (tunnel-safe).
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

    from rs_sfm_tpu.flow.dense import DenseFlowConfig, dense_flow

    h, w = 1080, 1920
    rng = np.random.default_rng(0)
    base = rng.uniform(0.1, 0.9, (h + 8, w + 8)).astype(np.float32)
    # Smooth a bit so the variational solver has real structure.
    i1 = jnp.asarray(base[4:4 + h, 4:4 + w])
    i2 = jnp.asarray(base[2:2 + h, 6:6 + w])

    def run(tag, cfg):
        f = dense_flow(i1, i2, cfg)
        float(f.sum())  # compile + sync
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            f = dense_flow(i1, i2, cfg)
            float(f.sum())
            ts.append(time.perf_counter() - t0)
        print(f"{tag:42s} {min(ts)*1e3:8.1f} ms")

    base_cfg = DenseFlowConfig()
    run("full (default)", base_cfg)
    run("median off", base_cfg._replace(median=False))
    run("iters=1 (SOR cost)", base_cfg._replace(iters=1))
    run("warps=1", base_cfg._replace(warps=1))
    run("no discrete (init/refine off)",
        base_cfg._replace(init_search_radius=0, refine_search_radius=0))
    run("levels=1 (full-res only)", base_cfg._replace(
        levels=1, init_search_radius=0, refine_search_radius=0))
    run("levels=1, median off", base_cfg._replace(
        levels=1, init_search_radius=0, refine_search_radius=0,
        median=False))
    run("levels=1, iters=1", base_cfg._replace(
        levels=1, init_search_radius=0, refine_search_radius=0, iters=1))
    run("levels=1, warps=1", base_cfg._replace(
        levels=1, init_search_radius=0, refine_search_radius=0, warps=1))
    run("gamma_grad=0 (no grad constancy)", base_cfg._replace(
        levels=1, init_search_radius=0, refine_search_radius=0,
        gamma_grad=0.0))

    # Production engine: Pallas blocked warp.
    pw = base_cfg._replace(warp_engine="pallas")
    run("pallas-warp full", pw)
    run("pallas-warp iters=1", pw._replace(iters=1))
    run("pallas-warp iters=40", pw._replace(iters=40))
    run("pallas-warp warps=1", pw._replace(warps=1))
    run("pallas-warp no discrete", pw._replace(
        init_search_radius=0, refine_search_radius=0))
    run("pallas-warp median off", pw._replace(median=False))

    # Fused multi-sweep SOR kernel (finest level) on top of the pallas warp.
    ps = pw._replace(sor_engine="pallas")
    run("pallas warp+sor full", ps)
    run("pallas warp+sor iters=40", ps._replace(iters=40))
    run("pallas warp+sor warps=1", ps._replace(warps=1))


if __name__ == "__main__" and not os.environ.get("FLOW_ENGINES"):
    main()


def flow_engines():
    import time
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from rs_sfm_tpu.flow.dense import DenseFlowConfig, dense_flow

    h, w = 1080, 1920
    rng = np.random.default_rng(0)
    base = rng.uniform(0.1, 0.9, (h + 8, w + 8)).astype(np.float32)
    i1 = jnp.asarray(base[4:4 + h, 4:4 + w])
    i2 = jnp.asarray(base[2:2 + h, 6:6 + w])

    for tag, cfg in [("xla", DenseFlowConfig(warp_engine="xla")),
                     ("pallas", DenseFlowConfig(warp_engine="pallas"))]:
        f = dense_flow(i1, i2, cfg)
        float(f.sum())
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            f = dense_flow(i1, i2, cfg)
            float(f.sum())
            ts.append(time.perf_counter() - t0)
        print(f"dense_flow full-HD [{tag:6s}] {min(ts)*1e3:8.1f} ms")


if __name__ == "__main__" and os.environ.get("FLOW_ENGINES"):
    flow_engines()
