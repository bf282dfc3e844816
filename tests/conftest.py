"""Test configuration: run on CPU with 8 virtual devices.

Pallas kernels run in interpreter mode off-TPU (see
`fa2_triton_tpu.utils.interpret_mode`); sharding tests use the 8 virtual CPU
devices. The axon TPU plugin ignores JAX_PLATFORMS, so the platform is forced
via jax.config before any backend is initialized.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
