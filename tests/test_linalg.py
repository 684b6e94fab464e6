"""ops.linalg against numpy references."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rs_sfm_tpu.ops import linalg


@pytest.mark.parametrize("n", [3, 6, 9])
def test_eigh_small_matches_numpy(n):
    rng = np.random.default_rng(0)
    a = rng.normal(size=(32, n, n))
    a = a + np.swapaxes(a, -1, -2)
    w, v = jax.jit(linalg.eigh_small)(jnp.asarray(a))
    w_np = np.linalg.eigvalsh(a)
    np.testing.assert_allclose(np.asarray(w), w_np, rtol=1e-10, atol=1e-10)
    # Eigenvector property: A v = v diag(w)
    av = np.einsum("bij,bjk->bik", a, np.asarray(v))
    vw = np.asarray(v) * np.asarray(w)[:, None, :]
    np.testing.assert_allclose(av, vw, atol=1e-8)


def test_null_vector():
    rng = np.random.default_rng(1)
    # Build 9x9 matrices with a known null vector.
    basis = rng.normal(size=(16, 8, 9))
    null = rng.normal(size=(16, 9))
    null /= np.linalg.norm(null, axis=-1, keepdims=True)
    # Orthogonalize rows against null, then Z has null as its null space.
    proj = basis - np.einsum("bij,bj->bi", basis, null)[..., None] * null[:, None, :]
    z = np.concatenate([proj, np.zeros((16, 1, 9))], axis=1)
    e = np.asarray(linalg.null_vector(jnp.asarray(z)))
    dots = np.abs(np.einsum("bi,bi->b", e, null))
    np.testing.assert_allclose(dots, 1.0, atol=1e-8)


@pytest.mark.parametrize("n", [3, 6, 7])
def test_gauss_det_solve_inv(n):
    rng = np.random.default_rng(2)
    a = rng.normal(size=(24, n, n))
    b = rng.normal(size=(24, n))
    det = np.asarray(linalg.gauss_det(jnp.asarray(a)))
    np.testing.assert_allclose(det, np.linalg.det(a), rtol=1e-9)
    x = np.asarray(linalg.gauss_solve(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(
        x, np.linalg.solve(a, b[..., None])[..., 0], rtol=1e-8, atol=1e-10)
    inv = np.asarray(linalg.gauss_inv(jnp.asarray(a)))
    np.testing.assert_allclose(inv, np.linalg.inv(a), rtol=1e-7, atol=1e-9)


@pytest.mark.parametrize("n", [5, 7])
def test_solve_pd_nopivot(n):
    rng = np.random.default_rng(3)
    m = rng.normal(size=(24, n, n))
    a = m @ np.swapaxes(m, -1, -2) + 0.1 * np.eye(n)
    b = rng.normal(size=(24, n))
    x = np.asarray(linalg.solve_pd_nopivot(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(
        x, np.linalg.solve(a, b[..., None])[..., 0], rtol=1e-8, atol=1e-10)
    bm = rng.normal(size=(24, n, 3))
    xm = np.asarray(linalg.solve_pd_nopivot(jnp.asarray(a), jnp.asarray(bm)))
    np.testing.assert_allclose(xm, np.linalg.solve(a, bm), rtol=1e-8,
                               atol=1e-10)


def test_gauss_det_singular():
    a = np.eye(4)[None].repeat(3, axis=0)
    a[1, 2, 2] = 0.0  # singular
    det = np.asarray(linalg.gauss_det(jnp.asarray(a)))
    np.testing.assert_allclose(det, [1.0, 0.0, 1.0], atol=1e-12)


def test_polyroots():
    rng = np.random.default_rng(3)
    roots_true = np.sort(rng.normal(size=(8, 6)), axis=-1)
    coeffs = np.stack([np.poly(r)[::-1] for r in roots_true])  # ascending
    re, im = linalg.polyroots(jnp.asarray(coeffs))
    re, im = np.asarray(re), np.asarray(im)
    assert np.abs(im).max() < 1e-7
    np.testing.assert_allclose(np.sort(re, axis=-1), roots_true, atol=1e-7)


def test_polyroots_complex_pairs():
    # (x² + 1)(x − 2)(x + 3) = roots ±i, 2, −3
    coeffs = np.array([np.poly([1j, -1j, 2.0, -3.0])[::-1].real])
    re, im = linalg.polyroots(jnp.asarray(coeffs))
    got = np.sort_complex(np.asarray(re)[0] + 1j * np.asarray(im)[0])
    want = np.sort_complex(np.array([1j, -1j, 2.0, -3.0]))
    np.testing.assert_allclose(got, want, atol=1e-8)
