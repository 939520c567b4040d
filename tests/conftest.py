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

import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _drop_jax_caches_between_modules():
    """Full-suite runs twice segfaulted inside an XLA:CPU
    `backend_compile_and_load` near the END of the suite (the last
    module's Pallas-interpret compile) while the same test passes
    standalone and at file scope — and the host had >100 GB free, so it
    is accumulated in-process compiler/executable state, not RSS
    pressure, that triggers the crash. Dropping the compilation caches at
    module boundaries empirically avoids that state; within a module,
    tests still share compiles."""
    yield
    jax.clear_caches()
    gc.collect()
