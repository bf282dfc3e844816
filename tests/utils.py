"""Test utilities: data generation and the FA-style relative comparator.

Same philosophy as the reference harness (`/root/reference/tests/utils.py`,
credited there to Dao-AILab/flash-attention): never compare a low-precision
kernel to fp32 truth with an absolute epsilon; instead require its error to be
at most k x the error of a *low-precision, op-reordered* pure-framework
implementation against that truth (k=2 for outputs, k=3 for grads, plus small
absolute biases), with the reference's dV escape hatch.
"""
from __future__ import annotations

import warnings
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

OUT_ERROR_MUL = 2.0
OUT_ERROR_BIAS = 5e-5
GRAD_ERROR_MUL = 3.0
GRAD_ERROR_BIAS = 1e-5
DV_SUM_WAIVER = 1e-4


def generate_test_data(
    batch_size: int,
    nheads_q: int,
    nheads_kv: int,
    seqlen_q: int,
    seqlen_k: int,
    head_dim: int,
    dtype=jnp.bfloat16,
    seed: int = 0,
) -> Tuple[jax.Array, ...]:
    """Seeded N(0, 0.5) Q, K, V, dO (reference `tests/utils.py:9-26`)."""
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.normal(0.0, 0.5, (batch_size, seqlen_q, nheads_q, head_dim)), dtype)
    k = jnp.asarray(rng.normal(0.0, 0.5, (batch_size, seqlen_k, nheads_kv, head_dim)), dtype)
    v = jnp.asarray(rng.normal(0.0, 0.5, (batch_size, seqlen_k, nheads_kv, head_dim)), dtype)
    do = jnp.asarray(rng.normal(0.0, 1.0, (batch_size, seqlen_q, nheads_q, head_dim)), dtype)
    return q, k, v, do


def generate_attention_mask(batch_size: int, seqlen: int, seed: int = 0) -> jax.Array:
    """Random right-padding mask with one guaranteed full sequence
    (reference `tests/utils.py:40-56`)."""
    rng = np.random.RandomState(seed + 1234)
    if seqlen == 1:
        return jnp.ones((batch_size, 1), bool)
    paddings = rng.randint(0, seqlen - 1, size=batch_size)
    paddings[rng.randint(0, batch_size)] = 0
    lens = seqlen - paddings
    return jnp.asarray(np.arange(seqlen)[None, :] < lens[:, None])


def max_diff(a, b) -> float:
    return float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))


def compare_results_fa(
    out, out_ref, out_pt,
    grads: Optional[Tuple] = None,       # ((dq,dk,dv), (refs), (pts)) or None
    out_error_mul: float = OUT_ERROR_MUL,
    out_error_bias: float = OUT_ERROR_BIAS,
    grad_error_mul: float = GRAD_ERROR_MUL,
    grad_error_bias: float = GRAD_ERROR_BIAS,
    verbose: bool = False,
):
    """Relative-tolerance comparison (reference `tests/utils.py:68-142`)."""
    out_err = max_diff(out, out_ref)
    pt_err = max_diff(out_pt, out_ref)
    if verbose:
        print(f"Output max diff: {out_err:.3e} (pt yardstick {pt_err:.3e})")
    assert out_err <= out_error_mul * pt_err + out_error_bias, (
        f"Output: {out_err:.3e} > {out_error_mul} * {pt_err:.3e} + {out_error_bias}"
    )
    if grads is None:
        return
    (dq, dk, dv), (dq_ref, dk_ref, dv_ref), (dq_pt, dk_pt, dv_pt) = grads
    for name, g, g_ref, g_pt in (
        ("dQ", dq, dq_ref, dq_pt),
        ("dK", dk, dk_ref, dk_pt),
    ):
        err, pt = max_diff(g, g_ref), max_diff(g_pt, g_ref)
        if verbose:
            print(f"{name} max diff: {err:.3e} (pt {pt:.3e})")
        assert err <= grad_error_mul * pt + grad_error_bias, (
            f"Gradient of {name}: {err:.3e} > {grad_error_mul} * {pt:.3e} + {grad_error_bias}"
        )
    dv_err, dv_pt_err = max_diff(dv, dv_ref), max_diff(dv_pt, dv_ref)
    if verbose:
        print(f"dV max diff: {dv_err:.3e} (pt {dv_pt_err:.3e})")
    if not dv_err <= grad_error_mul * dv_pt_err + grad_error_bias:
        # Reference's dV escape hatch (`tests/utils.py:135-140`).
        dv_sum = float(jnp.sum(jnp.abs(dv.astype(jnp.float32) - dv_ref.astype(jnp.float32))))
        if dv_sum < DV_SUM_WAIVER:
            warnings.warn(f"Small dV errors summing to {dv_sum}; moving on.", stacklevel=1)
        else:
            raise ArithmeticError(f"Gradient of V: sum err {dv_sum}")
