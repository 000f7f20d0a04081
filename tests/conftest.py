"""Test config: run JAX on CPU with 8 virtual devices and f64 enabled.

Mirrors the reference's test strategy (SURVEY.md section 4): CPU-backend JAX
tests on toy fixtures; dense host kernels as oracle for device kernels;
virtual 8-device mesh for sharding tests.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the ambient env may point at TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# env JAX_PLATFORMS is overridden by the ambient TPU (axon) plugin in this
# environment; the config update is what actually forces CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
