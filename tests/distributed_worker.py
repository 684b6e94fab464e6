"""Worker program for the multi-process jax.distributed test.

Launched twice (process_id 0 and 1) by tests/test_distributed.py; each
process owns 4 virtual CPU devices, the global mesh spans 8.  Runs
estimate_sharded (shard_map path) and estimate_pairs_batched (GSPMD path)
on a deterministic synthetic pair and prints the results as JSON for the
parent to compare against the single-process reference.
"""

import json
import os
import sys

# Must be set before jax initializes any backend.
flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (
    flags + " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def main():
    coordinator = sys.argv[1]
    process_id = int(sys.argv[2])

    from rs_sfm_tpu.parallel.distributed import initialize

    initialize(coordinator=coordinator, num_processes=2,
               process_id=process_id)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from rs_sfm_tpu.config import PipelineConfig
    from rs_sfm_tpu.data.synthetic import (castle_scene, default_intrinsics,
                                           render_pair)
    from rs_sfm_tpu.flow.true_flow import true_flow
    from rs_sfm_tpu.parallel.api import (estimate_pairs_batched,
                                         estimate_sharded)

    h = w = 64
    scene = castle_scene(dtype=jnp.float64)
    intr = default_intrinsics(h, w)
    pair = render_pair(scene, intr, h, w, gamma=0.9, k=0.0,
                       v=np.array([0.12, -0.05, 0.08]),
                       w=np.array([0.003, -0.002, 0.004]),
                       dtype=jnp.float64)
    flow_host = np.asarray(true_flow(pair.frame1.rs_unproject,
                                     pair.frame2.poses_r,
                                     pair.frame2.poses_t, intr))
    cfg = PipelineConfig(ransac_trials=32, ransac_tol=0.01,
                         refine_iterations=10)

    devices = np.asarray(jax.devices()).reshape(2, 4)
    mesh = Mesh(devices, ("pairs", "pixels"))
    key = jax.random.PRNGKey(0)

    # --- shard_map path: rows sharded over the 4-device 'pixels' axis of
    # this process's row; the 'pairs' axis is outside the shard (size 2
    # crosses processes via the replicated global arrays).
    mesh_px = Mesh(np.asarray(jax.devices()).reshape(8), ("pixels",))
    run_sharded = estimate_sharded(mesh_px, intr, 0.9, cfg,
                                   pool_per_shard=256)
    flow_global = jax.make_array_from_callback(
        flow_host.shape,
        NamedSharding(mesh_px, P("pixels", None, None)),
        lambda idx: flow_host[idx])
    res_s = jax.jit(run_sharded)(flow_global, key)
    v_s, w_s = res_s.v, res_s.w

    # --- GSPMD path: 2 pairs sharded over ('pairs', 'pixels').
    batch_host = np.stack([flow_host, flow_host])
    run_b = estimate_pairs_batched(mesh, intr, 0.9, cfg)
    batch = jax.make_array_from_callback(
        batch_host.shape,
        NamedSharding(mesh, P("pairs", "pixels", None, None)),
        lambda idx: batch_host[idx])
    keys = jnp.stack([key, key])
    res = run_b(batch, keys)

    # Batched outputs are sharded over 'pairs' ACROSS processes; a plain
    # device_get cannot fetch non-addressable shards — gather them first.
    from jax.experimental import multihost_utils

    batched_v = np.asarray(multihost_utils.process_allgather(
        res.v, tiled=True)).reshape(2, 3)
    batched_num = np.asarray(multihost_utils.process_allgather(
        res.num_inliers, tiled=True)).reshape(2)

    out = {
        "process_id": process_id,
        "sharded_v": np.asarray(v_s).tolist(),
        "sharded_w": np.asarray(w_s).tolist(),
        "sharded_num": int(res_s.num_inliers),
        "batched_v": batched_v.tolist(),
        "batched_num": batched_num.tolist(),
    }
    print("RESULT " + json.dumps(out), flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
