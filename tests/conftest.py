"""Test configuration: force CPU with an 8-device virtual mesh, enable x64.

Tests run on CPU so the suite is hermetic; multi-chip sharding tests use the
8 virtual host devices.  x64 is enabled so oracle comparisons can be done at
double precision; solver tests pin dtypes explicitly.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# jax may already have been imported by the environment's sitecustomize (which
# registers a TPU PJRT plugin and latches JAX_PLATFORMS); override via config.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
