"""Test configuration: force CPU with 8 virtual devices and enable x64.

Multi-chip sharding is tested on a virtual 8-device CPU mesh (the TPU-native
answer to testing multi-host behavior without a pod slice); numerical parity
tests run in float64 like the reference's double-precision Eigen/Ceres code.

Note: the ambient environment may preload jax and register a TPU PJRT
plugin via sitecustomize before this file runs, so platform selection must
go through jax.config (env vars would be read too late); XLA_FLAGS is still
honored because no backend has been initialized yet at conftest time.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
