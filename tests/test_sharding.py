"""Multi-device tests on the 8-virtual-CPU-device mesh: sharded results must
match single-device kernel results on the same data (SURVEY.md §4's
"sharded == single-device-gather numerics" rule)."""
import jax
import jax.numpy as jnp
import pytest

from fa2_triton_tpu import flash_attn_func
from fa2_triton_tpu.parallel import (
    make_mesh, make_ring_attention, make_tp_attention,
)
from tests.utils import generate_test_data

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4,
    reason="needs >= 4 devices (run on the virtual CPU mesh, tests/conftest.py)",
)


def _err(a, b):
    return float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))


@pytest.mark.parametrize("causal", [False, True])
def test_tp_dp_attention_matches_single_device(causal):
    mesh = make_mesh(data=2, model=2, seq=1)
    q, k, v, _ = generate_test_data(4, 8, 4, 128, 128, 64, jnp.float32)
    fn = make_tp_attention(mesh, causal=causal)
    out = fn(q, k, v)
    ref = flash_attn_func(q, k, v, causal=causal)
    assert _err(out, ref) < 1e-5


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_matches_single_device(causal):
    mesh = make_mesh(data=1, model=1, seq=4)
    q, k, v, _ = generate_test_data(2, 4, 4, 512, 512, 64, jnp.float32)
    fn = make_ring_attention(mesh, causal=causal)
    out = jax.jit(fn)(q, k, v)
    ref = flash_attn_func(q, k, v, causal=causal)
    assert _err(out, ref) < 2e-5


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_backward_matches_single_device(causal):
    """Ring bwd: dq local, (k, v, dk, dv) travel the ring — must equal the
    single-device custom_vjp gradients."""
    mesh = make_mesh(data=1, model=1, seq=4)
    q, k, v, do = generate_test_data(2, 4, 2, 512, 512, 64, jnp.float32)
    fn = make_ring_attention(mesh, causal=causal)

    out, vjp = jax.vjp(fn, q, k, v)
    dq, dk, dv = vjp(do)
    out_ref, vjp_ref = jax.vjp(
        lambda q, k, v: flash_attn_func(q, k, v, causal=causal), q, k, v
    )
    dq_ref, dk_ref, dv_ref = vjp_ref(do)
    assert _err(out, out_ref) < 2e-5
    assert _err(dq, dq_ref) < 2e-5, _err(dq, dq_ref)
    assert _err(dk, dk_ref) < 2e-5, _err(dk, dk_ref)
    assert _err(dv, dv_ref) < 2e-5, _err(dv, dv_ref)


def test_ring_attention_gqa_with_tp():
    mesh = make_mesh(data=1, model=2, seq=4)
    q, k, v, _ = generate_test_data(2, 8, 4, 512, 512, 64, jnp.float32)
    fn = make_ring_attention(mesh, causal=True)
    out = jax.jit(fn)(q, k, v)
    ref = flash_attn_func(q, k, v, causal=True)
    assert _err(out, ref) < 2e-5
