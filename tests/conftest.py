"""Test configuration: force an 8-virtual-device CPU platform.

All tests run on CPU with xla_force_host_platform_device_count=8 so
mesh/sharding code paths are exercised without TPU hardware (the driver
separately dry-runs the multi-chip path on the real chip). Pallas kernels
run in interpreter mode on CPU via impl="interpret".

NOTE: this environment auto-registers the ``axon`` TPU-tunnel PJRT plugin
via sitecustomize and pins jax's platform config programmatically, so the
JAX_PLATFORMS env var alone is NOT enough — the config update below is
what actually forces CPU.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# The suite's cost is XLA:CPU COMPILES of tiny programs, not compute —
# skipping the optimization passes cuts compile time ~25% on this
# single-core machine with no effect on correctness (both sides of every
# comparison compile under the same flag). Export
# JAX_DISABLE_MOST_OPTIMIZATIONS=0 to override. TPU behavior is
# unaffected (the verify skill drives changes compiled-on-TPU).
os.environ.setdefault("JAX_DISABLE_MOST_OPTIMIZATIONS", "1")
# Never persist XLA:CPU AOT executables from the suite: loading an entry
# whose compile-time CPU feature context differs is a SIGSEGV, not an
# error (core/compile_cache.py docstring; the JAX_PLATFORMS=cpu guard
# there also covers this, this is belt and braces for the test run).
os.environ["FORDE_COMPILE_CACHE"] = "0"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.device_count()
