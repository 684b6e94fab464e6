"""Pallas z-buffer splat vs the XLA scatter engines (interpret mode)."""

import numpy as np

import jax
import jax.numpy as jnp

from rs_sfm_tpu.ops.pallas.zbuffer import zbuffer_splat


def _reference_splat(tx, ty, d, colors):
    """Min-depth splat in plain numpy (exact float compares)."""
    h, w = d.shape
    gs = np.zeros((h, w, 3), np.float32)
    best = np.full((h, w), np.inf, np.float32)
    for i in range(h):
        for j in range(w):
            if not np.isfinite(d[i, j]):
                continue
            x = int(np.floor(tx[i, j] + 0.5))
            y = int(np.floor(ty[i, j] + 0.5))
            if 0 <= x < w and 0 <= y < h and d[i, j] < best[y, x]:
                best[y, x] = d[i, j]
                gs[y, x] = colors[i, j]
    return gs, np.isfinite(best)


def test_zbuffer_matches_reference_smooth():
    rng = np.random.default_rng(0)
    h, w = 24, 256
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    tx = xs + 2.0 * np.sin(ys / 7.0) + 1.5
    ty = ys + 1.5 * np.cos(xs / 31.0) - 1.0
    d = rng.uniform(1.0, 5.0, (h, w)).astype(np.float32)
    colors = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
    # A few invalid sources.
    d[::7, ::13] = np.inf

    gs, sc = zbuffer_splat(jnp.asarray(tx), jnp.asarray(ty),
                           jnp.asarray(d), jnp.asarray(colors),
                           radius=4, block=(8, 128), interpret=True)
    gs_ref, sc_ref = _reference_splat(tx, ty, d, colors)
    np.testing.assert_array_equal(np.asarray(sc), sc_ref)
    np.testing.assert_allclose(np.asarray(gs), gs_ref, atol=0)


def test_zbuffer_conflicts_min_depth_wins():
    """A local fold: a 3x6 patch of sources all rounds to one target;
    the minimum-depth source must win (exact f32 compare)."""
    h, w = 16, 128
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    tx = xs.copy()
    ty = ys.copy()  # identity elsewhere
    patch = (slice(4, 7), slice(40, 46))
    tx[patch] = 43.0
    ty[patch] = 5.0
    d = np.full((h, w), 2.0, np.float32)
    d[5, 44] = 0.5  # the unique fold minimum
    colors = np.zeros((h, w, 3), np.float32)
    colors[..., 0] = np.linspace(0, 1, w)[None, :]
    colors[5, 44] = (0.1, 0.7, 0.9)
    gs, sc = zbuffer_splat(jnp.asarray(tx), jnp.asarray(ty),
                           jnp.asarray(d), jnp.asarray(colors),
                           radius=4, block=(8, 128), interpret=True)
    gs = np.asarray(gs)
    assert np.asarray(sc)[5, 43]
    np.testing.assert_allclose(gs[5, 43], (0.1, 0.7, 0.9))
    # Identity region passes colors through.
    np.testing.assert_allclose(gs[12, 100], colors[12, 100])
