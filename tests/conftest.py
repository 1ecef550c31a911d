"""Test harness: run everything on CPU with 8 virtual devices.

Mesh/psum logic is tested without TPU hardware via
``--xla_force_host_platform_device_count=8`` (SURVEY.md §4); Pallas kernels are
tested in interpret mode. Must set env vars BEFORE jax import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
