"""Test configuration: force an 8-virtual-device CPU platform.

All tests run on CPU with XLA_FLAGS=--xla_force_host_platform_device_count=8
so mesh/sharding code paths are exercised without TPU hardware (the driver
separately dry-runs the multi-chip path). Pallas kernels run in interpreter
mode on CPU via impl="interpret".
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
