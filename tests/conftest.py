"""Test config: run JAX on CPU with 8 virtual devices and f64 enabled.

Mirrors the reference's test strategy (SURVEY.md section 4): CPU-backend JAX
tests on toy fixtures; dense host kernels as oracle for device kernels;
virtual 8-device mesh for sharding tests.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_enable_x64", True)
