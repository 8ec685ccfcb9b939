"""Test configuration: CPU backend with 8 virtual devices + x64.

The reference implementation is all float64 (libcd uses double
throughout); parity tests run the JAX build in float64 on CPU, while
f32 tolerance tests exercise the TPU-default dtype.  Sharding tests use
the 8-device virtual CPU mesh.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
