"""Test configuration: CPU backend, 8 virtual devices, f64 enabled.

Multi-device sharding logic is tested on a virtual CPU mesh
(xla_force_host_platform_device_count); numerical parity tests need f64
(the reference is all-double).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell presets axon (TPU tunnel)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Belt and suspenders: a pytest plugin may import jax before this conftest,
# capturing JAX_PLATFORMS=axon from the shell. Override via config too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
