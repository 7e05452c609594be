"""Test harness config: force CPU with 8 virtual devices BEFORE jax import.

Mirrors SURVEY.md §4's "multi-host without a cluster" strategy: sharding and
collective paths are unit-tested on a virtual 8-device CPU mesh
(``--xla_force_host_platform_device_count``); real-TPU numbers come from
``bench.py`` on hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config update
# after import does take effect (backends initialize lazily, so the XLA_FLAGS
# host-device-count set above is still honored).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
assert jax.device_count() == 8, "expected 8 virtual CPU devices"
