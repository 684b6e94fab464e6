"""Sharded estimation entry points.

Two complementary paths:

  estimate_pairs_batched — GSPMD: vmap the jitted pipeline over a batch of
      frame pairs, shard the batch over `pairs` and image rows (scanline
      blocks) over `pixels`, and let XLA partition the elementwise pixel
      work and insert the collectives.  This is the idiomatic TPU path: the
      pipeline is reductions + elementwise ops, exactly what GSPMD
      propagates well.  Verified (scripts/check_gspmd_sharding.py, 8-device
      (2 pairs x 4 pixels) mesh, 256px/256 trials): the optimized module
      contains 8 all-reduces + 1 small all-gather + 1 collective-permute
      and NO pixel-scale all-gathers — XLA keeps the pixel axis sharded
      through the reshape/RANSAC/refine chain.

  estimate_sharded — explicit shard_map over scanline blocks for one pair:
      pixel arrays arrive pre-sharded, RANSAC hypotheses are generated from
      a globally shared stratified pixel pool (so 9-point samples span the
      whole image, not one block), scoring reduces votes in one psum, and
      the refinement's 7x7 Schur system aggregates with psum — the
      "distributed Schur" component named in BASELINE.json.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rs_sfm_tpu.config import PipelineConfig
from rs_sfm_tpu.geom.camera import Intrinsics
from rs_sfm_tpu.solver.depth import estimate_inverse_depth
from rs_sfm_tpu.solver.flow_model import predict_flow
from rs_sfm_tpu.solver.minimal import (calculate_velocities,
                                       calculate_velocities_all_k)
from rs_sfm_tpu.solver.pipeline import estimate_from_flow
from rs_sfm_tpu.solver.refine import refine


def estimate_pairs_batched(mesh: Mesh, intr: Intrinsics, gamma,
                           cfg: PipelineConfig):
    """Build a jitted batched estimator sharded over the mesh.

    Returns a function (flow_batch (B, H, W, 2), keys (B, 2)) ->
    EstimationResult with leading batch axis B; B must divide by the
    `pairs` axis size, H by the `pixels` axis size.
    """

    @jax.jit
    def run(flow_batch, keys):
        flow_batch = jax.lax.with_sharding_constraint(
            flow_batch,
            NamedSharding(mesh, P("pairs", "pixels", None, None)))
        return jax.vmap(
            lambda f, k: estimate_from_flow(f, intr, gamma, cfg, k)
        )(flow_batch, keys)

    return run


# ---------------------------------------------------------------------------
# Explicit shard_map path (scanline-block sharding of a single pair)
# ---------------------------------------------------------------------------


def _stratified_pool(coords, flow, alpha, alpha_k, valid, pool: int):
    """Pick `pool` pixels per shard, spread across the shard (stratified).

    Invalid slots keep valid=False so the sampler ignores them.
    """
    n = coords.shape[0]
    stride = max(n // pool, 1)
    idx = (jnp.arange(pool) * stride) % n
    return (coords[idx], flow[idx], alpha[idx], alpha_k[idx], valid[idx])


def estimate_sharded(mesh: Mesh, intr: Intrinsics, gamma,
                     cfg: PipelineConfig, *, pool_per_shard: int = 1024,
                     axis: str = "pixels"):
    """Build a shard_map'ped single-pair estimator over scanline blocks.

    The returned function takes (flow (H, W, 2), key) with H divisible by
    the `pixels` axis size and runs the full RANSAC + Schur-LM refinement
    with image rows sharded across devices:

      * per-shard flattening/normalization (local rows);
      * RANSAC sample pool: `pool_per_shard` stratified pixels shared
        across shards (scatter + psum → replicated-typed) — hypotheses are
        identical on every shard (same key), so the tiny 9-point solves are
        replicated, not communicated;
      * scoring/depth: local pixels; votes reduce in ONE psum of the
        (T, 2) vote table per RANSAC, not per hypothesis;
      * refinement: solver.refine with axis_name, whose pixel reductions
        (the 7x7 Schur system and gradient) become psums over ICI.

    Returns (v, w, k, depth_map (H, W), inlier_mask, num_inliers).
    """
    n_shards = mesh.shape[axis]
    use_k = cfg.use_acceleration and not cfg.use_global_shutter

    def body(flow_block, key, row0):
        # flow_block: (H/S, W, 2) local scanline block; row0: () global row
        # offset of this block.
        h_loc, w_cols = flow_block.shape[:2]
        dtype = flow_block.dtype
        # Local pixel grid with *global* row coordinates.
        ys = (jnp.arange(h_loc, dtype=dtype) + row0)[:, None]
        xs = jnp.arange(w_cols, dtype=dtype)[None, :]
        ys = jnp.broadcast_to(ys, (h_loc, w_cols))
        xs = jnp.broadcast_to(xs, (h_loc, w_cols))
        fpx = flow_block.reshape(-1, 2)
        coords = jnp.stack([(xs.reshape(-1) - intr.cx) / intr.fx,
                            (ys.reshape(-1) - intr.cy) / intr.fy], axis=-1)
        flow_n = jnp.stack([fpx[:, 0] / intr.fx, fpx[:, 1] / intr.fy], axis=-1)
        valid = jnp.sum(fpx * fpx, axis=-1) > cfg.flow_threshold
        rows_total = h_loc * n_shards
        alpha = 1.0 + gamma * fpx[:, 1] / rows_total
        part1 = gamma * ys.reshape(-1) / rows_total
        part2 = 1.0 + gamma * (ys.reshape(-1) + fpx[:, 1]) / rows_total
        alpha_k = 0.5 * (part2 * part2 - part1 * part1)
        if cfg.use_global_shutter:
            alpha = jnp.ones_like(alpha)

        # --- RANSAC over a globally shared stratified pool ---
        # Gather via place-local-block + psum instead of all_gather: a ring
        # all-reduce of the (n_shards*pool) array moves ~2x the bytes of an
        # all_gather, but the pool is O(KB) so either is negligible; the
        # win is that psum's output is *replicated-typed* under the
        # varying-axes analysis, so everything downstream (hypotheses, the
        # refined motion) is provably replicated and shard_map's out_specs
        # checking stays ON.
        pc, pf, pa, pak, pv = _stratified_pool(
            coords, flow_n, alpha, alpha_k, valid, pool_per_shard)
        slot = jax.lax.axis_index(axis) * pool_per_shard

        def share(x):
            full = jnp.zeros((n_shards * pool_per_shard,) + x.shape[1:],
                             x.dtype)
            full = jax.lax.dynamic_update_slice_in_dim(full, x, slot, 0)
            return jax.lax.psum(full, axis)

        pc, pf, pa, pak = share(pc), share(pf), share(pa), share(pak)
        pv = share(pv.astype(jnp.int32)) > 0

        counts = jnp.cumsum(pv.astype(jnp.int32))
        total = jnp.maximum(counts[-1], 1)
        u01 = jax.random.uniform(key, (cfg.ransac_trials, 9))
        targets = jnp.minimum(1 + jnp.floor(u01 * total).astype(jnp.int32),
                              total)
        sample = jnp.searchsorted(counts, targets, side="left")
        q9, u9 = pc[sample], pf[sample]
        a9, ak9 = pa[sample], pak[sample]
        if use_k:
            w_h, v_h, k_h, valid_h = calculate_velocities_all_k(q9, u9, a9, ak9)
            w_h = w_h.reshape(-1, 3)
            v_h = v_h.reshape(-1, 3)
            k_h = k_h.reshape(-1)
            valid_h = valid_h.reshape(-1)
            w_h = jnp.where(valid_h[:, None], w_h, 0.0)
            v_h = jnp.where(valid_h[:, None], v_h, 0.0)
        else:
            w_h, v_h, k_h = calculate_velocities(q9, u9, a9, ak9, False)
            valid_h = jnp.ones(w_h.shape[:1], dtype=bool)

        # Score hypotheses on local pixels in chunks (memory: chunk × N_loc
        # residual grid), accumulating LOCAL per-hypothesis votes; the
        # cross-shard reduction is ONE psum of the stacked (T, 2) vote
        # table after the scan — not two scalar psums per hypothesis, which
        # would serialize ~2·T collectives on real ICI.
        chunk = min(cfg.ransac_chunk, v_h.shape[0])
        pad = (-v_h.shape[0]) % chunk
        v_p = jnp.concatenate([v_h, jnp.zeros((pad, 3), v_h.dtype)])
        w_p = jnp.concatenate([w_h, jnp.zeros((pad, 3), w_h.dtype)])
        k_p = jnp.concatenate([k_h, jnp.zeros((pad,), k_h.dtype)])

        def score(carry, hyp):
            v_c, w_c, k_c = hyp  # (chunk, 3)/(chunk,)
            rho = estimate_inverse_depth(
                coords[None], flow_n[None], v_c[:, None], w_c[:, None],
                k_c[:, None], alpha[None], alpha_k[None])  # (chunk, N_loc)
            u_est = predict_flow(coords[None], rho, v_c[:, None],
                                 w_c[:, None], k_c[:, None], alpha[None],
                                 alpha_k[None])
            err = jnp.linalg.norm(u_est - flow_n[None], axis=-1)
            inl = (err < cfg.ransac_tol) & valid[None] & jnp.isfinite(err)
            num = jnp.sum(inl, axis=-1)
            ierr = jnp.sum(jnp.where(inl, err, 0.0), axis=-1)
            return carry, (num, ierr)

        _, (nums_loc, ierrs_loc) = jax.lax.scan(
            score, None,
            (v_p.reshape(-1, chunk, 3), w_p.reshape(-1, chunk, 3),
             k_p.reshape(-1, chunk)))
        t = v_h.shape[0]
        votes = jnp.stack([nums_loc.reshape(-1)[:t].astype(ierrs_loc.dtype),
                           ierrs_loc.reshape(-1)[:t]], axis=-1)  # (T, 2)
        votes = jax.lax.psum(votes, axis)  # ONE collective per RANSAC
        nums = votes[:, 0].astype(jnp.int32)
        ierrs = votes[:, 1]
        nums = jnp.where(valid_h, nums, -1)
        big = jnp.asarray(
            coords.shape[0] * n_shards * cfg.ransac_tol + 1.0, ierrs.dtype)
        scorev = nums.astype(ierrs.dtype) * big - jnp.where(
            jnp.isfinite(ierrs), ierrs, big)
        best = jnp.argmax(scorev)
        v_b, w_b, k_b = v_h[best], w_h[best], k_h[best]
        num_b = nums[best]

        rho = estimate_inverse_depth(coords, flow_n, v_b, w_b, k_b,
                                     alpha, alpha_k)
        u_est = predict_flow(coords, rho, v_b, w_b, k_b, alpha, alpha_k)
        err = jnp.linalg.norm(u_est - flow_n, axis=-1)
        inlier = (err < cfg.ransac_tol) & valid & jnp.isfinite(err)

        # --- Distributed-Schur refinement ---
        if cfg.use_refinement:
            ref = refine(coords, flow_n, alpha, alpha_k, inlier,
                         v_b, w_b, k_b, rho,
                         optimize_k=use_k,
                         iterations=cfg.refine_iterations,
                         axis_name=axis)
            v_f, w_f, k_f, rho = ref.v, ref.w, ref.k, ref.inv_depth
        else:
            v_f, w_f, k_f = v_b, w_b, k_b

        # Sign flip by global mean inlier depth.
        safe_rho = jnp.where(rho == 0.0, 1.0, rho)
        z = jnp.where(rho == 0.0, 0.0, 1.0 / safe_rho)
        m = inlier.astype(z.dtype)
        z_sum = jax.lax.psum(jnp.sum(z * m), axis)
        z_cnt = jnp.maximum(jax.lax.psum(jnp.sum(m), axis), 1.0)
        sign = jnp.where(z_sum / z_cnt < 0.0, -1.0, 1.0).astype(z.dtype)
        v_f = v_f * sign
        z = z * sign
        depth_map = jnp.where(inlier, z, 0.0).reshape(h_loc, w_cols)
        return (v_f, w_f, k_f, depth_map, inlier.reshape(h_loc, w_cols),
                num_b)

    def run(flow, key):
        h = flow.shape[0]
        row0 = (jnp.arange(n_shards) * (h // n_shards)).astype(flow.dtype)
        fn = jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(axis, None, None), P(), P(axis)),
            out_specs=(P(), P(), P(), P(axis, None), P(axis, None), P()),
        )
        return fn(flow, key, row0)

    return run
