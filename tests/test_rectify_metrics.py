"""Rectification and evaluation metrics against rendered ground truth."""

import numpy as np
import jax.numpy as jnp

from rs_sfm_tpu.data.synthetic import (castle_scene, default_intrinsics,
                                       render_pair)
from rs_sfm_tpu.eval.metrics import (mean_reprojection_error, rotation_error,
                                     translation_error)
from rs_sfm_tpu.geom.rspose import scanline_poses
from rs_sfm_tpu.rectify.backproject import backproject
from rs_sfm_tpu.rectify.crackfill import fill_cracks

H = W = 96
GAMMA = 0.9
V = np.array([0.12, -0.05, 0.08])
WROT = np.array([0.003, -0.002, 0.004])


def _pair():
    scene = castle_scene(dtype=jnp.float64)
    intr = default_intrinsics(H, W)
    return render_pair(scene, intr, H, W, gamma=GAMMA, k=0.0,
                       v=V, w=WROT, dtype=jnp.float64), intr


def test_backproject_reproduces_gs_image():
    pair, intr = _pair()
    f1 = pair.frame1
    r, t = scanline_poses(jnp.asarray(V), jnp.asarray(WROT), 0.0, H, GAMMA,
                          dtype=jnp.float64)
    res = backproject(f1.rs_image, f1.rs_depth, r, t, intr)
    gs = np.asarray(f1.gs_image)
    rect = np.asarray(res.gs_image)
    scattered = np.asarray(res.scattered)
    assert scattered.mean() > 0.5
    # Rectified colors should match the true GS render where scattered
    # (nearest-neighbor scatter of a smooth texture: small mean error).
    diff = np.abs(rect - gs)[scattered].mean()
    assert diff < 0.06, diff
    # Against doing nothing: RS image vs GS image is worse.
    base = np.abs(np.asarray(f1.rs_image) - gs)[scattered].mean()
    assert diff < base


def test_backproject_gs_mode_differs():
    pair, intr = _pair()
    f1 = pair.frame1
    r, t = scanline_poses(jnp.asarray(V), jnp.asarray(WROT), 0.0, H, GAMMA,
                          dtype=jnp.float64)
    res_rs = backproject(f1.rs_image, f1.rs_depth, r, t, intr)
    res_gs = backproject(f1.rs_image, f1.rs_depth, r, t, intr,
                         use_scanline_pose=False)
    gs = np.asarray(f1.gs_image)
    err_rs = np.abs(np.asarray(res_rs.gs_image) - gs)[
        np.asarray(res_rs.scattered)].mean()
    err_gs = np.abs(np.asarray(res_gs.gs_image) - gs)[
        np.asarray(res_gs.scattered)].mean()
    # The GS-assumption baseline cannot undo the RS warp.
    assert err_rs < err_gs


def test_mean_reprojection_error_zero_at_gt():
    pair, intr = _pair()
    f1 = pair.frame1
    r, t = scanline_poses(jnp.asarray(V), jnp.asarray(WROT), 0.0, H, GAMMA,
                          dtype=jnp.float64)
    res = backproject(f1.rs_image, f1.rs_depth, r, t, intr)
    err, scale, true3d = mean_reprojection_error(
        res.coords_3d, res.valid, f1.rs_depth, f1.poses_r, f1.poses_t, intr)
    # World frame == frame-1 scanline-0 camera frame, so relocation is a
    # no-op and GT-depth backprojection must land on the GT points.
    assert abs(float(scale) - 1.0) < 5e-3
    assert float(err) < 1e-2, float(err)


def test_rotation_translation_errors():
    # The reference's small-angle metric has an O(|w|²) floor even at the
    # exact answer ((I+ŵ)(I+ŵ)ᵀ = I − ŵ² ≠ I); reproduce that behavior.
    w = jnp.asarray([0.01, -0.02, 0.005], jnp.float64)
    assert float(rotation_error(w, w)) < float(jnp.sum(w * w)) * 2.0
    v = jnp.asarray([1.0, 0.0, 0.0], jnp.float64)
    v2 = jnp.asarray([0.0, 2.0, 0.0], jnp.float64)
    assert float(translation_error(v, v2)) == np.pi / 2
    assert float(translation_error(v, 3.0 * v)) < 1e-6


def test_crack_fill():
    img = np.full((16, 16, 3), 120, dtype=np.uint8)
    img[8, 8] = 0  # crack
    out = np.asarray(fill_cracks(jnp.asarray(img)))
    np.testing.assert_array_equal(out[8, 8], [120, 120, 120])
    # A black pixel inside a black region stays black.
    img2 = np.zeros((16, 16, 3), dtype=np.uint8)
    out2 = np.asarray(fill_cracks(jnp.asarray(img2)))
    assert (out2 == 0).all()


def test_backproject_sort_matches_scatter():
    """Sort-based and scatter-based z-buffers agree (up to quantized-depth
    ties, absent in this scene)."""
    pair, intr = _pair()
    f1 = pair.frame1
    r, t = scanline_poses(jnp.asarray(V), jnp.asarray(WROT), 0.0, H, GAMMA,
                          dtype=jnp.float64)
    a = backproject(f1.rs_image, f1.rs_depth, r, t, intr, method="sort")
    b = backproject(f1.rs_image, f1.rs_depth, r, t, intr, method="scatter")
    np.testing.assert_array_equal(np.asarray(a.scattered),
                                  np.asarray(b.scattered))
    sa = np.asarray(a.gs_image)
    sb = np.asarray(b.gs_image)
    mism = (np.abs(sa - sb).max(axis=-1) > 1e-6).mean()
    assert mism < 0.01, mism


def test_small_motion_warp():
    from rs_sfm_tpu.rectify.warp import small_motion_warp

    pair, intr = _pair()
    f1 = pair.frame1
    res = small_motion_warp(f1.rs_image, f1.rs_depth, V, WROT, 0.0, GAMMA,
                            intr)
    gs = np.asarray(f1.gs_image)
    warped = np.asarray(res.gs_image)
    scattered = np.asarray(res.scattered)
    assert scattered.mean() > 0.5
    err_warp = np.abs(warped - gs)[scattered].mean()
    err_base = np.abs(np.asarray(f1.rs_image) - gs)[scattered].mean()
    # The flow-model warp improves on doing nothing (it is the first-order
    # version of backproject).
    assert err_warp < err_base


def test_flow_consistency_check():
    from rs_sfm_tpu.flow.check import flow_consistency_error
    from rs_sfm_tpu.flow.true_flow import true_flow

    pair, intr = _pair()
    flow = true_flow(pair.frame1.rs_unproject, pair.frame2.poses_r,
                     pair.frame2.poses_t, intr)
    hit = pair.frame1.rs_depth > 0
    err_true = float(flow_consistency_error(
        pair.frame1.rs_image, pair.frame2.rs_image, flow, hit))
    err_zero = float(flow_consistency_error(
        pair.frame1.rs_image, pair.frame2.rs_image,
        jnp.zeros_like(flow), hit))
    assert err_true < 0.5 * err_zero
    assert err_true < 0.05


def test_backproject_packed_matches_scatter():
    pair, intr = _pair()
    f1 = pair.frame1
    r, t = scanline_poses(jnp.asarray(V), jnp.asarray(WROT), 0.0, H, GAMMA,
                          dtype=jnp.float64)
    a = backproject(f1.rs_image, f1.rs_depth, r, t, intr, method="packed")
    b = backproject(f1.rs_image, f1.rs_depth, r, t, intr, method="scatter")
    np.testing.assert_array_equal(np.asarray(a.scattered),
                                  np.asarray(b.scattered))
    mism = (np.abs(np.asarray(a.gs_image) - np.asarray(b.gs_image))
            .max(axis=-1) > 1e-6).mean()
    assert mism < 0.01, mism


def test_backproject_packed24_matches_scatter():
    """The gather-free packed24 engine (color rides in the scatter key)
    agrees with the exact-depth engine: identical hit mask, colors equal
    up to 8-bit quantization except at quantized-depth ties (<1%)."""
    pair, intr = _pair()
    f1 = pair.frame1
    r, t = scanline_poses(jnp.asarray(V), jnp.asarray(WROT), 0.0, H, GAMMA,
                          dtype=jnp.float64)
    a = backproject(f1.rs_image, f1.rs_depth, r, t, intr, method="packed24")
    b = backproject(f1.rs_image, f1.rs_depth, r, t, intr, method="scatter")
    np.testing.assert_array_equal(np.asarray(a.scattered),
                                  np.asarray(b.scattered))
    sa = np.asarray(a.gs_image, np.float64)
    sb = np.asarray(b.gs_image, np.float64)
    sc = np.asarray(a.scattered)
    # 8-bit color quantization bound where the same source wins.
    close = np.abs(sa - sb).max(axis=-1) <= (1.0 / 255.0 + 1e-9)
    mism = (~close & sc).mean()
    assert mism < 0.01, mism


def test_backproject_packed24_uint8_exact():
    """On uint8 sources with distinct depths the packed24 winner is the
    true front surface and colors are bit-exact."""
    h = w = 32
    rng = np.random.default_rng(0)
    img = rng.integers(2, 255, (h, w, 3)).astype(np.uint8)
    depth = jnp.asarray(4.0 + rng.uniform(0, 1, (h, w)), jnp.float32)
    intr_s = type(_pair()[1])(fx=40.0, fy=40.0, cx=16.0, cy=16.0)
    r = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (h, 1, 1))
    t = jnp.zeros((h, 3), jnp.float32)
    a = backproject(jnp.asarray(img), depth, r, t, intr_s,
                    method="packed24")
    b = backproject(jnp.asarray(img), depth, r, t, intr_s,
                    method="scatter")
    sc = np.asarray(a.scattered)
    np.testing.assert_array_equal(np.asarray(a.scattered),
                                  np.asarray(b.scattered))
    # Identity pose: every pixel maps to itself, colors must round-trip
    # exactly through the packed key.
    np.testing.assert_array_equal(np.asarray(a.gs_image)[sc], img[sc])


def test_backproject_packed24_white_far_pixels():
    """Advisor r4 HIGH regression: a saturated-white pixel in the farthest
    quantized-depth bin packs to (127<<24)|0xFFFFFF == the 0x7FFFFFFF
    scatter sentinel; without the sentinel clamp those pixels were
    silently dropped from the rectified image and valid mask (a white
    32x32 image lost 1023/1024 scattered pixels vs the scatter engine)."""
    h = w = 32
    img = np.full((h, w, 3), 255, np.uint8)
    rng = np.random.default_rng(1)
    depth = jnp.asarray(4.0 + rng.uniform(0, 1, (h, w)), jnp.float32)
    intr_s = type(_pair()[1])(fx=40.0, fy=40.0, cx=16.0, cy=16.0)
    r = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (h, 1, 1))
    t = jnp.zeros((h, 3), jnp.float32)
    a = backproject(jnp.asarray(img), depth, r, t, intr_s,
                    method="packed24")
    b = backproject(jnp.asarray(img), depth, r, t, intr_s,
                    method="scatter")
    np.testing.assert_array_equal(np.asarray(a.scattered),
                                  np.asarray(b.scattered))
    sc = np.asarray(a.scattered)
    assert sc.all()
    # The clamp may perturb the blue LSB of the one colliding combo only;
    # every other channel value must round-trip exactly.
    out = np.asarray(a.gs_image)
    assert (out[..., :2][sc] == 255).all()
    assert (out[..., 2][sc] >= 254).all()
