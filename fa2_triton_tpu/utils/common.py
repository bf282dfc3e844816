"""Shared numeric / shape helpers for the TPU flash-attention framework.

This plays the role of the host-side helpers in the reference
(`/root/reference/src/utils.py`), re-designed for JAX/XLA: instead of masked
per-element loads and host-side varlen packing, TPU kernels want aligned tiles,
so the helpers here are padding/alignment utilities used by the kernel callers.
"""
from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp

# log2(e): all kernels work in the base-2 exponent domain so the VPU can use
# exp2 directly. The stored logsumexp is therefore in log-base-2 units, the
# same contract as the reference (`src/forward/kernel.py:119`,
# `tests/test_logsumexp.py:74`).
LOG2E = 1.44269504088896340736

# Finite large-negative used to mask attention scores. Finite (not -inf) so
# `m - m` style subtractions can never produce NaN inside the online softmax.
MASK_VALUE = -0.98 * float(jnp.finfo(jnp.float32).max)
NEG_INF = float("-inf")


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up_to_multiple(x: int, m: int) -> int:
    return cdiv(x, m) * m


def next_power_of_2(x: int) -> int:
    return 1 if x <= 1 else 2 ** math.ceil(math.log2(x))


def pad_to_multiple(x: jax.Array, multiple: int, axis: int) -> jax.Array:
    """Zero-pad `x` along `axis` up to the next multiple of `multiple`."""
    size = x.shape[axis]
    target = round_up_to_multiple(size, multiple)
    if target == size:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - size)
    return jnp.pad(x, pad)


def default_softmax_scale(head_dim: int) -> float:
    """Default pre-softmax scale, matching `src/forward/caller.py:42`."""
    return 1.0 / math.sqrt(head_dim)


@lru_cache(maxsize=None)
def on_tpu() -> bool:
    return jax.devices()[0].platform == "tpu"


def interpret_mode() -> bool:
    """Pallas kernels run in interpreter mode off-TPU (CPU tests)."""
    return not on_tpu()


def dot_precision(*operands):
    """Matmul precision for kernel dots: fp32 operands must multiply at TRUE
    fp32 (TPU would otherwise use fast bf16-pass decomposition, ~1e-3 relative
    error — the fp32 path exists to validate against the fp32 oracle);
    bf16/fp16 operands keep the backend default (native MXU rate)."""
    if any(o.dtype == jnp.float32 for o in operands):
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.DEFAULT
