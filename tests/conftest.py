"""Test configuration: run everything on a virtual 8-device CPU mesh.

The axon sitecustomize registers the TPU backend at interpreter startup
(before conftest), ignoring JAX_PLATFORMS — so we force the platform via
jax.config, which takes effect because no backend has initialized yet.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
