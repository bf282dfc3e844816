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

# FA2_TEST_PLATFORM=tpu runs the suite against the real chip (compiled Mosaic
# kernels instead of interpret mode); default is the 8-virtual-device CPU.
if os.environ.get("FA2_TEST_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
