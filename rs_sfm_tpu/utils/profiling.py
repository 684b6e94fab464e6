"""Profiling: wall-clock stage timers and jax.profiler trace helpers.

The reference's only instrumentation is Ceres' BriefReport printouts
(src/nonlinearRefinement.cc:165-169).  Here: a Timer that *synchronizes by
fetching a value* (required on remote-executed TPU platforms, where
block_until_ready can return early), per-stage timing of the pipeline, and
an easy on-ramp to jax.profiler traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import numpy as np

import jax
import jax.numpy as jnp


class Timer:
    """Accumulating wall-clock timer keyed by stage name."""

    def __init__(self):
        self.times: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.times[name] = self.times.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, float]:
        return dict(sorted(self.times.items(), key=lambda kv: -kv[1]))


def sync_fetch(x) -> float:
    """Force device execution by pulling a scalar to host.

    On tunneled/remote TPU platforms this is the only reliable barrier.
    """
    return float(jnp.asarray(x).sum())


def time_fn(fn: Callable, *args, iters: int = 5, warmup: int = 1) -> float:
    """Median wall time of fn(*args), synchronized by value fetch."""
    for _ in range(warmup):
        out = fn(*args)
        sync_fetch(jax.tree_util.tree_leaves(out)[0])
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        sync_fetch(jax.tree_util.tree_leaves(out)[0])
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view with tensorboard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def stage_timings(flow_px, intr, gamma, cfg, key, iters: int = 3):
    """Per-stage wall times of the estimation pipeline (jitted per stage).

    Returns {stage: seconds} for: prepare, ransac_solve+score, refine.
    Useful for identifying the chip-level bottleneck before kernel work.
    """
    from rs_sfm_tpu.solver.pipeline import prepare_flow_inputs
    from rs_sfm_tpu.solver.ransac import ransac
    from rs_sfm_tpu.solver.refine import refine

    use_k = cfg.use_acceleration and not cfg.use_global_shutter

    prep = jax.jit(lambda f: prepare_flow_inputs(f, intr, gamma, cfg))
    coords, flow_n, alpha, alpha_k, valid = prep(flow_px)

    def run_ransac(c, f, a, ak, vm, k):
        return ransac(c, f, a, ak, vm, key=k, use_k=use_k,
                      trials=cfg.ransac_trials, tolerance=cfg.ransac_tol,
                      chunk=cfg.ransac_chunk)

    ransac_j = jax.jit(run_ransac)
    rr = ransac_j(coords, flow_n, alpha, alpha_k, valid, key)

    refine_j = jax.jit(lambda *a: refine(
        *a, optimize_k=use_k, iterations=cfg.refine_iterations))

    out = {
        "prepare": time_fn(prep, flow_px, iters=iters),
        "ransac": time_fn(ransac_j, coords, flow_n, alpha, alpha_k, valid,
                          key, iters=iters),
        "refine": time_fn(
            refine_j, coords, flow_n, alpha, alpha_k, rr.inlier_mask,
            rr.v, rr.w, rr.k, rr.inv_depth, iters=iters),
    }
    return out
