"""Test configuration: force an 8-device virtual CPU mesh.

This mirrors how the reference would be tested on a fake multi-GPU backend:
all sharding/collective tests run against
``--xla_force_host_platform_device_count=8`` (SURVEY.md §4).

The host environment pins ``JAX_PLATFORMS=axon`` (single real TPU chip via a
tunnel) and a sitecustomize registers that backend at interpreter start, so
an env-var override is NOT enough — we must update the jax config after
import, before any backend is initialised. XLA_FLAGS, however, must be set
before the first jax import.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# XLA:CPU optimisation passes dominate test wall-time on the single-core CI
# host; disabling them is a pure compile-time win for correctness tests.
os.environ.setdefault("JAX_DISABLE_MOST_OPTIMIZATIONS", "1")
os.environ.setdefault("JAX_ENABLE_X64", "0")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must not touch the TPU tunnel"
assert len(jax.devices()) == 8, "expected the 8-device virtual CPU mesh"
