"""Third-party attention baselines for benchmarking.

Counterpart of the reference's `src/other_implementations/`
(`/root/reference/src/other_implementations/flex_attention.py`): the
reference compares its Triton kernel against `torch.nn.attention
.flex_attention`; on TPU the analogous third-party comparison points are

* `xla_attention`      — dense unfused attention lowered by XLA (the
  "PyTorch eager oracle" analog, and what most JAX users write by hand),
* `jax_flash_attention` — the official Pallas flash-attention kernel that
  ships with JAX (`jax.experimental.pallas.ops.tpu.flash_attention`).

Both take the same BSHD layout as `fa2_triton_tpu.flash_attn_func` so the
benchmark harness can swap kernels without re-laying-out data (the reference
does a layout transpose when switching to Flex, `benchmarks/utils.py:65-69`).
"""
from fa2_triton_tpu.other_implementations.baselines import (
    jax_flash_attention,
    xla_attention,
)

__all__ = ["xla_attention", "jax_flash_attention"]
