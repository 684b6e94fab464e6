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

# A long pytest run compiles hundreds of CPU executables; LLVM's JIT creates
# several memory mappings per executable and the kernel default
# vm.max_map_count (65530) is low enough to fail mid-suite with
# "LLVM compilation error: Cannot allocate memory" → SIGSEGV.  Raise it when
# we can (tests run as root in CI); ignore failures elsewhere.
try:
    if os.environ.get("RS_SFM_NO_SYSCTL", "0") != "1":
        with open("/proc/sys/vm/max_map_count") as _f:
            _old_map_count = int(_f.read())
        if _old_map_count < 1_000_000:
            with open("/proc/sys/vm/max_map_count", "w") as _g:
                _g.write("1048576")
            # Host-wide kernel state: restore the previous value when the
            # test process exits (set RS_SFM_NO_SYSCTL=1 to skip entirely).
            import atexit

            def _restore(old=_old_map_count):
                try:
                    with open("/proc/sys/vm/max_map_count", "w") as f:
                        f.write(str(old))
                except OSError:
                    pass

            atexit.register(_restore)
except OSError:
    pass

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
