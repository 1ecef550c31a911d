"""Test harness: run everything on CPU with 8 virtual devices.

Mesh/psum logic is tested without TPU hardware via
``--xla_force_host_platform_device_count=8`` (SURVEY.md §4); Pallas kernels are
tested in interpret mode.

The machine's axon sitecustomize pins jax to the remote TPU tunnel and wins
over the JAX_PLATFORMS env var, so we must override via jax.config AFTER
import (verified: env-only override still dispatches to TPU at ~90s/op).
XLA_FLAGS must still be set before the backend initializes.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.devices()
