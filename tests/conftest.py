"""Test environment: CPU backend with 8 virtual devices (for sharding tests)
and float64 enabled (for the oracle path).

NOTE: this machine's sitecustomize pre-imports jax and pins the platform to
the TPU tunnel, so the env var JAX_PLATFORMS is ignored; the platform must be
overridden via jax.config.update after import.  Pallas kernels run in
interpreter mode on CPU (handled inside the kernel module via backend
detection)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
