"""Sliding-window and softcap support IN THE KERNELS — the reference only has
these in its oracle (`src/reference_implementation.py:8-35,87-90`; declared
kernel TODOs at `tests/test_fwd_bwd.py:7-8` there)."""
import pytest

from tests.core import run_attention_case


@pytest.mark.parametrize("window_size", [(32, 0), (0, 16)])
def test_sliding_window(window_size):
    run_attention_case(2, 4, 2, 255, 255, 64, causal=False, window_size=window_size)


def test_sliding_window_causal():
    run_attention_case(2, 4, 2, 255, 255, 64, causal=True, window_size=(64, -1))


@pytest.mark.parametrize("softcap", [30.0, 5.0])
def test_softcap(softcap):
    run_attention_case(2, 4, 2, 128, 128, 64, causal=True, softcap=softcap)


def test_softcap_with_bias():
    run_attention_case(2, 4, 2, 128, 128, 64, causal=False, softcap=20.0, use_bias=True)


def test_softcap_causal_fast_path_shapes():
    """Regression: causal+softcap at tri/strip-eligible shapes once routed to
    the prescaled-q fast kernels, which silently DROP the tanh (the original
    softcap tests used S=128, below every fast path's alignment gate).
    run_attention_case's data is mild, so also pin the gates directly."""
    from fa2_triton_tpu.ops.flash_fwd import causal_strip_ok, tri_square_ok

    assert not tri_square_ok(True, True, (-1, -1), None, 256, 256, 256, 256,
                             head_dim=128, softcap=5.0)
    assert not causal_strip_ok(True, True, (-1, -1), None, False, 1024, 1024,
                               1024, 1024, head_dim=256, softcap=5.0)
    # tri-eligible shape (S=256 multiple of sub) with a biting softcap.
    run_attention_case(2, 4, 2, 256, 256, 128, causal=True, softcap=5.0)


def test_block_sizes_always_lane_aligned():
    """Regression: odd seqlens must never produce non-128-aligned blocks
    (4700/3000 once derived block_q=682 and crashed flash_attn_func)."""
    from fa2_triton_tpu.ops.tuning import choose_block_sizes

    for sq, sk in [(4700, 3000), (3000, 4700), (2900, 2900), (1, 1),
                   (130, 131), (8192, 640)]:
        for causal in (False, True):
            for bias in (False, True):
                bs = choose_block_sizes(sq, sk, 128, causal=causal,
                                        has_bias=bias)
                for v in (bs.block_q, bs.block_kv, bs.block_q_bwd,
                          bs.block_kv_bwd):
                    assert v % 128 == 0, (sq, sk, causal, bias, bs)


def test_decode_attention_odd_cache_extent():
    """Regression: S_max that is a multiple of 128 but not of the default
    block must shrink the block, not assert (e.g. S_max=6144)."""
    import jax.numpy as jnp
    import numpy as np
    from fa2_triton_tpu.ops.decode import decode_attention

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.normal(0, 0.5, (2, 4, 128)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 0.5, (2, 2, 640, 128)), jnp.float32)
    v = jnp.asarray(rng.normal(0, 0.5, (2, 2, 640, 128)), jnp.float32)
    lens = jnp.asarray([640, 200], jnp.int32)
    out = decode_attention(q, k, v, lens)  # 640 % 4096 != 0 -> shrink
    assert out.shape == (2, 4, 128)
    assert bool(jnp.all(jnp.isfinite(out)))


@pytest.mark.parametrize("window_size,causal", [
    ((256, 0), True),     # Mistral-style causal sliding window
    ((256, -1), False),   # left-only, non-causal
    ((192, 64), False),   # two-sided
])
def test_banded_window_kernel_parity(window_size, causal):
    """The banded grid (kv block = first(iq) + band step; blocks left of the
    window never enter the grid) must be numerically identical to the full
    grid: small blocks force several whole blocks OUTSIDE the window."""
    import jax
    import jax.numpy as jnp

    from fa2_triton_tpu.ops.flash_fwd import flash_attn_forward
    from tests.utils import generate_test_data

    B, Hq, Hkv, S, D = 2, 4, 2, 1024, 128
    q, k, v, _ = generate_test_data(B, Hq, Hkv, S, S, D, jnp.float32)
    qT, kT, vT = (jnp.swapaxes(x, 1, 2) for x in (q, k, v))
    lens = jnp.broadcast_to(jnp.array([[S, S]], jnp.int32), (B, 2))
    scal = jnp.array([[0, 0, 0, 0]], jnp.int32)

    def run(static_skip):
        # static_skip=False disables the band, giving the full-grid result.
        return flash_attn_forward(
            qT, kT, vT, lens, scal, None, causal=causal,
            softmax_scale=D ** -0.5, window=window_size,
            block_q=128, block_kv=128,
            seqlen_q_real=S, seqlen_k_real=S, static_skip=static_skip)

    o_band, lse_band = run(True)
    o_full, lse_full = run(False)
    assert float(jnp.max(jnp.abs(o_band - o_full))) < 1e-6
    fin = jnp.isfinite(lse_full)
    assert bool(jnp.all(fin == jnp.isfinite(lse_band)))
    assert float(jnp.max(jnp.abs(jnp.where(fin, lse_band - lse_full, 0.0)))) < 1e-5
