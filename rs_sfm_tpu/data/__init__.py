"""Data layer: synthetic RS renderer, dataset contract I/O, device placement.

Replaces the reference's L2 data plumbing (Camera CSV/PNG loaders,
src/camera.cc:99-206, src/rsframe.cc:58-553) and its offline MATLAB
generator (matlab_synthetic_data/) with:

  synthetic — a procedural JAX ray-cast renderer that produces RS frame
              pairs with *complete* ground truth (per-scanline poses,
              unprojection maps, depth, GS reference images) — fully
              jittable, no external renderer;
  dataset   — readers/writers for the reference's on-disk file contract
              ({1,2}_rs.png, *_rs_{t,r}.csv, *_unproject_{x,y,z}.csv,
              A.csv, ...), so datasets interchange with the reference;
  intrinsics— the named device-intrinsics registry (src/camera.cc:179-206).
"""

from rs_sfm_tpu.data.synthetic import (SyntheticPair, castle_scene,
                                       render_pair)
