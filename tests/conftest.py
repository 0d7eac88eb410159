"""Test configuration: force an 8-device virtual CPU mesh before JAX imports.

This mirrors how the reference would be tested on a fake multi-GPU backend:
all sharding/collective tests run against
``--xla_force_host_platform_device_count=8`` (SURVEY.md §4).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep compile times sane on the single-core CI host: XLA:CPU optimization
# passes dominate test wall-time (a 9-conv train-mode forward took 320 s
# optimised vs 15 s without); numerics are unaffected for correctness tests.
os.environ.setdefault("JAX_DISABLE_MOST_OPTIMIZATIONS", "1")
os.environ.setdefault("JAX_ENABLE_X64", "0")
