"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real-TPU runs happen only in bench.py; tests must be hermetic and fast.
"""

import os

# Must be set before jax is imported anywhere. Note: this environment's
# TPU plugin ignores JAX_PLATFORMS; the legacy JAX_PLATFORM_NAME works.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
