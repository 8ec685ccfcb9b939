"""Test configuration: CPU backend with 8 virtual devices + x64.

The reference implementation is all float64 (libcd uses double
throughout); parity tests run the JAX build in float64 on CPU, while
f32 tolerance tests exercise the TPU-default dtype.  Sharding tests use
the 8-device virtual CPU mesh.

Note: this environment pre-imports jax via a sitecustomize hook, so
environment variables set here are too late — the backend must be
selected through jax.config before any backend initialization.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
