"""Blocked Pallas bilinear warp vs the XLA gather reference.

Runs in interpreter mode on CPU (conftest forces cpu); the same kernel is
compiled by Mosaic on TPU, where compiled-vs-interpret equality was
verified on hardware (see ops/pallas/warp.py module doc).
"""

import numpy as np
import jax.numpy as jnp

from rs_sfm_tpu.flow.dense import DenseFlowConfig, _warp, dense_flow
from rs_sfm_tpu.ops.pallas.warp import bilinear_warp


def _smooth_flow(h, w, scale=1.0):
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    u = scale * (25.0 * np.sin(ys / 200) + 3.0 * np.cos(xs / 400) - 7.3)
    v = scale * (-20.0 * np.cos(ys / 300) + 2.5 * np.sin(xs / 350) + 4.8)
    return jnp.asarray(np.stack([u, v], -1).astype(np.float32))


def test_warp_matches_xla_smooth():
    rng = np.random.default_rng(0)
    for h, w in [(108, 480), (67, 121), (128, 128)]:
        img = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
        flow = _smooth_flow(h, w)
        out = np.asarray(bilinear_warp(img, flow))
        ref = np.asarray(_warp(img, flow))
        assert np.abs(out - ref).max() < 1e-5, (h, w)


def test_warp_matches_xla_constant_offsets():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 1, (80, 256)).astype(np.float32))
    for ux, vy in [(0.0, 0.0), (2.5, -1.25), (-3.7, 4.2), (0.5, 0.0)]:
        flow = jnp.stack([jnp.full((80, 256), ux),
                          jnp.full((80, 256), vy)], -1).astype(jnp.float32)
        out = np.asarray(bilinear_warp(img, flow))
        ref = np.asarray(_warp(img, flow))
        assert np.abs(out - ref).max() < 1e-5, (ux, vy)


def test_warp_out_of_bounds_bounded():
    """Infeasible blocks (flow far out of image) may sample inexactly but
    must stay bounded and in-range (documented lossy case)."""
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.uniform(0, 1, (80, 256)).astype(np.float32))
    flow = jnp.stack([jnp.full((80, 256), -600.0),
                      jnp.full((80, 256), 700.0)], -1)
    out = np.asarray(bilinear_warp(img, flow.astype(jnp.float32)))
    assert np.isfinite(out).all()
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_dense_flow_pallas_engine_quality():
    """dense_flow(warp_engine='pallas') must match the xla engine's flow
    (interior); the engines share everything except the warp kernel."""
    from rs_sfm_tpu.data.synthetic import (castle_scene, default_intrinsics,
                                           render_pair)

    h = w = 64
    scene = castle_scene(dtype=jnp.float64)
    intr = default_intrinsics(h, w)
    pair = render_pair(scene, intr, h, w, gamma=0.9, k=0.0,
                       v=np.array([0.1, -0.04, 0.0]), w=np.zeros(3),
                       dtype=jnp.float64)
    i1 = pair.frame1.rs_image.astype(jnp.float32)
    i2 = pair.frame2.rs_image.astype(jnp.float32)
    cfg_x = DenseFlowConfig(warp_engine="xla")
    cfg_p = DenseFlowConfig(warp_engine="pallas")
    fx = np.asarray(dense_flow(i1, i2, cfg_x))
    fp = np.asarray(dense_flow(i1, i2, cfg_p))
    d = np.linalg.norm(fx - fp, axis=-1)[6:-6, 6:-6]
    assert np.median(d) < 0.05, np.median(d)
