"""Whole-strip causal kernels (flash_fwd._fwd_causal_strip_kernel,
flash_bwd._bwd_causal_strip_kernel): the S > 2048 causal fast path.

The curated grids mostly run S <= 1024 (tri-square territory), so this file
pins the strip path explicitly: public-API parity vs the oracle at a
non-block-aligned S (padded tails -> dead-row lse sanitization), GQA, and
direct strip-vs-generic kernel equality including dropout and Sq != Sk.
"""
import jax
import jax.numpy as jnp
import pytest

# Strip kernels keep whole K/V strips resident, which only fits VMEM for
# 2-byte dtypes (f32 strips measured 17M+ scoped vs Mosaic's 16M limit) —
# the eligibility gates are dtype-aware, so these kernel-vs-kernel tests
# run in bf16 on every platform with bf16-rounding-scale tolerances (the
# routes share f32 accumulation; only the output stores round).
_DT = jnp.bfloat16
_TOL_O = 2e-2
_TOL_L = 1e-2
_TOL_G = 4e-2

from fa2_triton_tpu import flash_attn_func, flash_attn_reference
from fa2_triton_tpu.ops.flash_bwd import (
    bwd_causal_strip_ok,
    flash_attn_backward,
    flash_attn_backward_causal_strip,
)
from fa2_triton_tpu.ops.flash_fwd import causal_strip_ok, flash_attn_forward


def _err(a, b):
    return float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))


def test_public_api_engages_strip_path():
    """S=2560 causal pads to 3072: too long for tri-square, strip-eligible
    (incl. dead padded rows). Output and grads must match the oracle."""
    B, S, H, D = 1, 2560, 2, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (B, S, H, D), jnp.float32) * 0.5
    k = jax.random.normal(ks[1], (B, S, H, D), jnp.float32) * 0.5
    v = jax.random.normal(ks[2], (B, S, H, D), jnp.float32) * 0.5
    do = jax.random.normal(ks[3], (B, S, H, D), jnp.float32) * 0.5

    # The routing really is strip-eligible for this padded shape.
    assert causal_strip_ok(True, True, (-1, -1), None, False,
                           3072, 3072, S, S, head_dim=128)
    assert bwd_causal_strip_ok(True, True, (-1, -1), None, False, 0.0,
                               3072, 3072, S, S, head_dim=128)

    out, vjp = jax.vjp(
        lambda q, k, v: flash_attn_func(q, k, v, causal=True), q, k, v)
    ref, vjp_ref = jax.vjp(
        lambda q, k, v: flash_attn_reference(q, k, v, causal=True), q, k, v)
    assert _err(out, ref) < 2e-5
    for g, g_ref, name in zip(vjp(do), vjp_ref(do), ("dq", "dk", "dv")):
        assert _err(g, g_ref) < 5e-5, (name, _err(g, g_ref))


@pytest.mark.parametrize("sub,wide", [(512, 2), (256, 8)])
def test_strip_sub_wide_variants(sub, wide):
    """Non-default (sub, wide) geometries — what `bench.py --tune` sweeps
    and the autotune table can select — match the default config exactly."""
    from fa2_triton_tpu.ops.flash_fwd import flash_attn_forward_causal_strip

    B, H, S, D = 1, 2, 2048, 128
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(ks[0], (B, H, S, D), _DT) * 0.5
    k = jax.random.normal(ks[1], (B, H, S, D), _DT) * 0.5
    v = jax.random.normal(ks[2], (B, H, S, D), _DT) * 0.5
    lens = jnp.broadcast_to(jnp.array([[S, S]], jnp.int32), (B, 2))
    scal = jnp.array([[0, 0, 7, 0]], jnp.int32)
    kw = dict(softmax_scale=D ** -0.5, seqlen_q_real=S, seqlen_k_real=S)
    o1, l1 = flash_attn_forward_causal_strip(
        q, k, v, lens, scal, sub=sub, wide=wide, **kw)
    o2, l2 = flash_attn_forward_causal_strip(q, k, v, lens, scal, **kw)
    assert _err(o1, o2) < _TOL_O and _err(l1, l2) < _TOL_L


@pytest.mark.parametrize("dropout_p", [0.0, 0.2])
@pytest.mark.parametrize("shift_blocks", [0, 2])
def test_strip_matches_generic_kernels(dropout_p, shift_blocks):
    """Strip fwd/bwd vs the generic (zigzag / two-pass) kernels on aligned
    shapes, incl. GQA, dropout streams, and a static Sq < Sk shift."""
    B, Hq, Hkv, D = 1, 4, 2, 128
    Sk = 2048
    Sq = Sk - shift_blocks * 512
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    q = jax.random.normal(ks[0], (B, Hq, Sq, D), _DT) * 0.5
    k = jax.random.normal(ks[1], (B, Hkv, Sk, D), _DT) * 0.5
    v = jax.random.normal(ks[2], (B, Hkv, Sk, D), _DT) * 0.5
    do = jax.random.normal(ks[3], (B, Hq, Sq, D), _DT) * 0.5
    lens = jnp.broadcast_to(jnp.array([[Sq, Sk]], jnp.int32), (B, 2))
    scal = jnp.array([[0, 0, 7, 0]], jnp.int32)
    scale = D ** -0.5
    common = dict(causal=True, softmax_scale=scale, dropout_p=dropout_p,
                  seqlen_q_real=Sq, seqlen_k_real=Sk, static_skip=True)

    o1, l1 = flash_attn_forward(q, k, v, lens, scal, None,
                                causal_strip=True, tri_square=False, **common)
    o2, l2 = flash_attn_forward(q, k, v, lens, scal, None,
                                causal_strip=False, tri_square=False,
                                block_q=512, block_kv=512, unroll_kv=1,
                                **common)
    assert _err(o1, o2) < _TOL_O and _err(l1, l2) < _TOL_L

    g1 = flash_attn_backward_causal_strip(
        q, k, v, do, o1, l1, lens, scal, softmax_scale=scale,
        dropout_p=dropout_p, seqlen_q_real=Sq, seqlen_k_real=Sk)
    g2 = flash_attn_backward(
        q, k, v, do, o1, l1, lens, scal, None, block_q=512, block_kv=512,
        fused=False, **common)
    for a, b, name in zip(g1, g2, ("dq", "dk", "dv")):
        assert _err(a, b) < _TOL_G, (name, _err(a, b))
