"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4's prescription: multi-chip behavior is validated with
``--xla_force_host_platform_device_count=8`` on the CPU backend, since only
one real TPU chip is available in CI.

The session environment force-registers a remote single-chip TPU platform
(axon) from sitecustomize and overrides JAX_PLATFORMS, so plain env vars
are not enough — we must override through jax.config before any backend
is initialized.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", (
    "tests must run on the virtual CPU mesh, got " + jax.default_backend()
)
assert jax.device_count() >= 8, "expected 8 virtual CPU devices"
