"""Dataset-contract round trip + native I/O parity."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from rs_sfm_tpu.data import io_native
from rs_sfm_tpu.data.dataset import (load_synthetic_pair, save_synthetic_pair,
                                     true_depth_from_unprojection)
from rs_sfm_tpu.data.ply import write_ply
from rs_sfm_tpu.data.synthetic import (castle_scene, default_intrinsics,
                                       render_pair)
from rs_sfm_tpu.data import intrinsics as intr_registry

H = W = 48


def _pair():
    scene = castle_scene(dtype=jnp.float64)
    intr = default_intrinsics(H, W)
    return render_pair(scene, intr, H, W, gamma=0.8, k=0.5,
                       v=np.array([0.1, 0.0, 0.05]),
                       w=np.array([0.0, 0.0, 0.002]), dtype=jnp.float64)


def test_save_load_roundtrip(tmp_path):
    pair = _pair()
    task_dir = str(tmp_path / "task1")
    prefix = save_synthetic_pair(pair, task_dir)
    assert os.path.exists(prefix + "1_rs.png")
    assert os.path.exists(prefix + "A.csv")
    loaded = load_synthetic_pair(task_dir)
    assert loaded.gamma == pytest.approx(0.8)
    assert loaded.k == pytest.approx(0.5)
    np.testing.assert_allclose(loaded.v, np.asarray(pair.v), atol=1e-9)
    np.testing.assert_allclose(
        loaded.frame1.poses_t, np.asarray(pair.frame1.poses_t), atol=1e-8)
    np.testing.assert_allclose(
        loaded.frame1.poses_r, np.asarray(pair.frame1.poses_r), atol=1e-8)
    np.testing.assert_allclose(
        loaded.frame2.rs_unproject, np.asarray(pair.frame2.rs_unproject),
        atol=1e-7)
    # Images round-trip through uint8.
    np.testing.assert_allclose(
        loaded.frame1.rs_image / 255.0, np.asarray(pair.frame1.rs_image),
        atol=1.0 / 255.0)
    # GT depth derivable from loaded data matches the renderer's.
    d = true_depth_from_unprojection(
        loaded.frame1.rs_unproject, loaded.frame1.poses_r,
        loaded.frame1.poses_t)
    np.testing.assert_allclose(d, np.asarray(pair.frame1.rs_depth),
                               atol=1e-5)


def test_native_csv_matches_numpy(tmp_path):
    if not io_native.available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(0)
    mat = rng.normal(size=(37, 23))
    path = str(tmp_path / "m.csv")
    np.savetxt(path, mat, delimiter=",", fmt="%.12g")
    got = io_native.read_csv_matrix(path)
    np.testing.assert_allclose(got, mat, rtol=1e-11)
    # Native writer round trip.
    path2 = str(tmp_path / "m2.csv")
    io_native.write_csv_matrix(path2, mat)
    np.testing.assert_allclose(np.loadtxt(path2, delimiter=","), mat,
                               rtol=1e-9)


def test_ply_writer(tmp_path):
    pts = np.array([[0.0, 1.0, 2.0], [3.0, 4.0, 5.0], [0.0, 0.0, 0.0]])
    cols = np.array([[255, 0, 0], [0, 255, 0], [9, 9, 9]], dtype=np.uint8)
    path = str(tmp_path / "cloud.ply")
    n = write_ply(path, pts, cols)  # zero-norm point masked out
    assert n == 2
    text = open(path).read()
    assert "element vertex 2" in text
    assert "3.000000 4.000000 5.000000 0 255 0" in text


def test_intrinsics_registry():
    k = intr_registry.get("galaxy")
    assert k.fx == pytest.approx(1492.41306997746)
    with pytest.raises(KeyError):
        intr_registry.get("nokia")
