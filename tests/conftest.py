"""Test configuration: force an 8-device virtual CPU platform.

Multi-device sharding paths are exercised without TPU hardware
(SURVEY.md §4d). Must run before jax initializes its backends.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env var alone can lose to an externally-pinned platform plugin
# (JAX_PLATFORMS=axon in this image); the config update always wins.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.device_count() >= 8, (
    f"tests require the 8-device virtual CPU mesh, got {jax.devices()}"
)
