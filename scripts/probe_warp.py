"""Localize the compiled-warp in-view mismatch seen at radius 16.

Compares bilinear_warp vs the XLA gather warp on hardware across radii
and shapes; prints per-case in-view max|diff| and the row/col histogram
of mismatching pixels.
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    import jax.numpy as jnp

    from rs_sfm_tpu.flow.dense import _warp
    from rs_sfm_tpu.ops.pallas.warp import bilinear_warp

    rng = np.random.default_rng(0)
    for (h, w), radius, amp in [
        ((270, 512), 16, (10, 6, 7.5, 2.5)),
        ((1080, 1920), 6, (10, 6, 7.5, 2.5)),
        ((1080, 1920), 16, (10, 6, 7.5, 2.5)),
        ((1080, 1920), 16, (40, 25, 30, 10)),
    ]:
        img = jnp.asarray(rng.uniform(0, 1, (h, w)).astype(np.float32))
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
        a1, a2, a3, a4 = amp
        fx = a1 * np.sin(ys / 300) + a2 * np.cos(xs / 400)
        fy = -a3 * np.cos(ys / 350) + a4 * np.sin(xs / 500)
        flow = jnp.asarray(np.stack([fx, fy], -1))
        wx = jax.jit(_warp)(img, flow)
        wp = jax.jit(lambda a, b, r=radius: bilinear_warp(a, b, radius=r)
                     )(img, flow)
        inview = ((xs + fx >= 0) & (xs + fx <= w - 1)
                  & (ys + fy >= 0) & (ys + fy <= h - 1))
        diff = np.abs(np.asarray(wx - wp))
        bad = (diff > 1e-5) & inview
        print(f"h{h}x{w} r{radius} amp{a1}: inview max "
              f"{diff[inview].max():.2e} nbad {bad.sum()}", flush=True)
        if bad.any():
            ybad, xbad = np.nonzero(bad)
            print("   rows:", np.unique(ybad // 40)[:10],
                  " cols:", np.unique(xbad // 128)[:10],
                  " sample", ybad[:3], xbad[:3], flush=True)


if __name__ == "__main__":
    main()
