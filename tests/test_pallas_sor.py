"""Fused multi-sweep SOR kernel vs the XLA red-black loop.

The kernel (ops/pallas/sor.py) must reproduce the XLA engine's iteration
semantics exactly up to f32 elementwise rounding (it uses rsqrt where the
XLA path divides by sqrt): identical red-black order, torus boundaries,
lagged-diffusivity weights, and global checkerboard phase across row-block
boundaries.  Runs in interpret mode on CPU; compiled-vs-interpret equality
on hardware is covered by the TPU validation script.
"""

import numpy as np
import jax.numpy as jnp

from rs_sfm_tpu.flow.dense import DenseFlowConfig, dense_flow


def _pair(h, w, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0.1, 0.9, (h + 8, w + 8)).astype(np.float32)
    # Two separable 3-tap blurs give the variational solver real structure.
    for _ in range(2):
        for ax in (0, 1):
            base = (np.roll(base, 1, ax) + 2 * base
                    + np.roll(base, -1, ax)) / 4.0
    i1 = jnp.asarray(base[4:4 + h, 4:4 + w])
    i2 = jnp.asarray(base[2:2 + h, 6:6 + w])
    return i1, i2


def test_pallas_sor_matches_xla_loop():
    i1, i2 = _pair(120, 256)
    cfg = DenseFlowConfig(levels=1, init_search_radius=0,
                          refine_search_radius=0)
    fx = np.asarray(dense_flow(i1, i2, cfg))
    fp = np.asarray(dense_flow(i1, i2, cfg._replace(sor_engine="pallas")))
    # rsqrt-vs-division rounding compounds over 3 warps x 20 nonlinear
    # sweeps; anything beyond ~1e-3 px would indicate a semantic mismatch
    # (halo too small, wrong checkerboard phase, boundary convention).
    assert np.abs(fx - fp).max() < 1e-3, np.abs(fx - fp).max()
    # And the solver did real work: the flow field is finite and nonzero.
    assert np.isfinite(fp).all()
    assert np.abs(fp).max() > 0.1


def test_pallas_sor_partial_schedule_and_phase():
    """A sweep count not divisible by SWEEPS_PER_CALL exercises the tail
    launch; a different H exercises the block/parity bookkeeping."""
    i1, i2 = _pair(80, 128, seed=3)
    cfg = DenseFlowConfig(levels=1, init_search_radius=0,
                          refine_search_radius=0, iters=13, warps=2)
    fx = np.asarray(dense_flow(i1, i2, cfg))
    fp = np.asarray(dense_flow(i1, i2, cfg._replace(sor_engine="pallas")))
    assert np.abs(fx - fp).max() < 1e-3, np.abs(fx - fp).max()


def test_pallas_sor_odd_shapes_match_xla():
    """Arbitrary (non-lane-aligned) shapes — the r4 generalization that
    lets every pyramid level use the fused kernel — must still match the
    XLA loop exactly: the edge-replicated padding may not leak into the
    true interior.  135x240 is the real level-3 shape of a full-HD
    pyramid; 98x200 exercises odd rows AND columns."""
    for (h, w), seed in (((135, 240), 5), ((98, 200), 7)):
        i1, i2 = _pair(h, w, seed=seed)
        cfg = DenseFlowConfig(levels=1, init_search_radius=0,
                              refine_search_radius=0, iters=13, warps=2)
        fx = np.asarray(dense_flow(i1, i2, cfg))
        fp = np.asarray(dense_flow(i1, i2, cfg._replace(
            sor_engine="pallas")))
        assert np.abs(fx - fp).max() < 1e-3, ((h, w),
                                              np.abs(fx - fp).max())


def test_pallas_sor_fallback_on_tiny_shape():
    """Sub-threshold levels fall back to the XLA loop silently."""
    from rs_sfm_tpu.ops.pallas.sor import supported

    assert not supported(24, 48, 0.0)
    assert supported(135, 240, 0.0)
    i1, i2 = _pair(24, 48, seed=5)
    cfg = DenseFlowConfig(levels=1, init_search_radius=0,
                          refine_search_radius=0, sor_engine="pallas")
    f = np.asarray(dense_flow(i1, i2, cfg))
    assert np.isfinite(f).all()


def test_pallas_median_matches_xla():
    """ops/pallas/median.py must reproduce dense._median3 bit-exactly
    (same sorting network, same edge clamping) at aligned and odd
    shapes."""
    import jax.numpy as jnp
    from rs_sfm_tpu.flow.dense import _median3
    from rs_sfm_tpu.ops.pallas.median import median3_planes

    rng = np.random.default_rng(11)
    for h, w in ((120, 256), (135, 240), (98, 200)):
        x = jnp.asarray(rng.normal(size=(2, h, w)).astype(np.float32))
        ref = np.stack([np.asarray(_median3(x[0])),
                        np.asarray(_median3(x[1]))])
        out = np.asarray(median3_planes(x))
        np.testing.assert_array_equal(out, ref)
