"""Multi-host runtime initialization.

The reference has no distributed runtime at all (single process,
src/main.cc:133-142).  This framework scales across hosts with
jax.distributed: every host runs the same program, the mesh spans all
devices in the slice, and the collectives the solver emits (psum'd Schur
systems, RANSAC votes, metric reductions) ride ICI within a slice and DCN
across slices — there is no NCCL/MPI layer to manage.

Typical launch (one command per host):

    python -m rs_sfm_tpu.cli sweep --path ... \
        --coordinator host0:1234 --num-hosts 4 --host-id $ID

or rely on TPU pod metadata (no arguments needed on Cloud TPU).
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize the multi-host runtime (no-op when single-process).

    With no arguments, uses the environment/TPU-metadata autodetection.
    """
    if coordinator is None and num_processes is None:
        try:
            jax.distributed.initialize()
        except Exception:
            # Single-process environment (no coordinator discoverable).
            return
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id)


def global_mesh(pairs: Optional[int] = None):
    """(pairs, pixels) mesh over every device in the slice.

    Defaults to data-parallel over hosts (pairs = process count) with
    pixel/scanline sharding within each host's devices — DP crosses DCN,
    the latency-tolerant axis, while the chatty Schur/vote psums stay on
    ICI within a host.
    """
    from rs_sfm_tpu.parallel.mesh import make_mesh

    if pairs is None:
        pairs = max(jax.process_count(), 1)
    return make_mesh(pairs=pairs)
