"""Test configuration: run everything on a virtual 8-device CPU mesh.

The environment pre-registers a remote TPU backend (JAX_PLATFORMS=axon via
sitecustomize) whose compile path goes over a network relay — far too slow
for unit tests, and it would burn real TPU time. Tests therefore force the
CPU backend with 8 virtual devices so multi-agent mesh sharding is exercised
without hardware. `jax.config.update` works even though jax was already
imported at interpreter boot, because backends initialize lazily at first
use; XLA_FLAGS must likewise be set before that first use.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
