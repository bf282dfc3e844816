"""Divide-and-conquer causal schedule (flash_fwd._causal_split_forward):
S just past tri-square range decomposes into diagonal leaf triangles (one
batched launch) + dense below-diagonal rectangles at non-causal throughput,
merged with the associative online-softmax rule.

Kernel-level parity runs with a small forced leaf so the machinery (leaf
packing, rect offsets, merge, dropout/global-offset plumbing) is exercised
without S >= 4096 interpret-mode cost.
"""
import jax
import jax.numpy as jnp
import pytest

from fa2_triton_tpu.ops.flash_fwd import (
    causal_split_ok,
    causal_split_rects,
    flash_attn_forward,
    merge_softmax_partials,
    split_leaf_t,
)


def _mk(B, H, Hkv, S, D, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (B, H, S, D), jnp.float32) * 0.5
    k = jax.random.normal(ks[1], (B, Hkv, S, D), jnp.float32) * 0.5
    v = jax.random.normal(ks[2], (B, Hkv, S, D), jnp.float32) * 0.5
    return q, k, v


def _run_pair(q, k, v, lens, scal, sreal, leaf, dropout_p=0.0):
    common = dict(causal=True, softmax_scale=q.shape[-1] ** -0.5,
                  seqlen_q_real=sreal, seqlen_k_real=sreal, static_skip=True,
                  dropout_p=dropout_p, block_q=128, block_kv=128)
    o_ref, lse_ref = flash_attn_forward(
        q, k, v, lens, scal, None, tri_square=False, causal_split=False,
        zigzag=False, causal_strip=False, **common)
    o_sp, lse_sp = flash_attn_forward(
        q, k, v, lens, scal, None, tri_square=False, causal_split=True,
        split_leaf=leaf, **common)
    return (o_ref, lse_ref), (o_sp, lse_sp)


@pytest.mark.parametrize("n_leaves", [2, 3, 4])
def test_split_matches_generic(n_leaves):
    leaf = 128
    S = leaf * n_leaves
    B, H = 2, 2
    q, k, v = _mk(B, H, H, S, 128)
    lens = jnp.broadcast_to(jnp.array([[S, S]], jnp.int32), (B, 2))
    scal = jnp.array([[0, 0, 0, 0]], jnp.int32)
    (o_r, lse_r), (o_s, lse_s) = _run_pair(q, k, v, lens, scal, S, leaf)
    assert float(jnp.abs(o_s - o_r).max()) < 2e-5
    assert float(jnp.abs(lse_s - lse_r).max()) < 1e-3


def test_split_gqa_dropout_dead_tail():
    """GQA heads, padded dead tail rows (lse == -inf through the merge), and
    the dropout stream (global offsets must make leaf/rect streams identical
    to the single-kernel walk)."""
    leaf, S, sreal = 128, 512, 400
    B, H, Hkv = 2, 4, 2
    q, k, v = _mk(B, H, Hkv, S, 128, seed=1)
    lens = jnp.broadcast_to(jnp.array([[sreal, sreal]], jnp.int32), (B, 2))
    scal = jnp.array([[0, 0, 7, 0]], jnp.int32)
    (o_r, lse_r), (o_s, lse_s) = _run_pair(
        q, k, v, lens, scal, sreal, leaf, dropout_p=0.3)
    assert float(jnp.abs(o_s - o_r).max()) < 2e-5
    both = jnp.isfinite(lse_r) & jnp.isfinite(lse_s)
    assert bool(jnp.all((lse_s == -jnp.inf) == (lse_r == -jnp.inf)))
    assert float(jnp.where(both, jnp.abs(lse_s - lse_r), 0.0).max()) < 1e-3


def test_split_rect_plan():
    """The rect list tiles the strict lower block triangle exactly once."""
    for n in (2, 3, 4, 5, 8):
        cover = {}
        for (r0, c0, nr, nc) in causal_split_rects(n):
            for r in range(r0, r0 + nr):
                for c in range(c0, c0 + nc):
                    assert c < r, "rect crosses the diagonal"
                    key = (r, c)
                    assert key not in cover, "overlap"
                    cover[key] = True
        assert len(cover) == n * (n - 1) // 2


def test_split_gates():
    # default dispatch: exactly two leaves (bigger S: zigzag measured faster)
    assert causal_split_ok(True, True, (-1, -1), None, False, 0.0,
                           4096, 4096, 4096, 4096, 128)
    assert not causal_split_ok(True, True, (-1, -1), None, False, 0.0,
                               8192, 8192, 8192, 8192, 128)
    # explicit leaf override allows deeper splits
    assert causal_split_ok(True, True, (-1, -1), None, False, 0.0,
                           8192, 8192, 8192, 8192, 128, leaf_t=2048)
    # softcap/window/bias/varlen/shift disqualify
    assert not causal_split_ok(True, True, (-1, -1), None, False, 5.0,
                               4096, 4096, 4096, 4096, 128)
    assert not causal_split_ok(True, True, (64, -1), None, False, 0.0,
                               4096, 4096, 4096, 4096, 128)
    assert not causal_split_ok(True, True, (-1, -1), None, True, 0.0,
                               4096, 4096, 4096, 4096, 128)
    assert not causal_split_ok(True, True, (-1, -1), None, False, 0.0,
                               4096, 4096, 4000, 3968, 128)
    assert split_leaf_t(128) == 2048 and split_leaf_t(256) == 1024


def test_split_backward_matches_two_pass():
    """Backward split (diag leaves + rect launches, additive in f32) vs the
    two-pass kernels: GQA, dropout, LSE cotangent, dead tail rows."""
    from fa2_triton_tpu.ops.flash_bwd import (
        causal_split_bwd_ok, flash_attn_backward)

    leaf, S, sreal = 128, 512, 400
    B, H, Hkv, D = 2, 4, 2, 128
    q, k, v = _mk(B, H, Hkv, S, D, seed=3)
    ks = jax.random.split(jax.random.PRNGKey(4), 2)
    do = jax.random.normal(ks[0], (B, H, S, D), jnp.float32) * 0.5
    dlse = jax.random.normal(ks[1], (B, H, S, 1), jnp.float32) * 0.1
    lens = jnp.broadcast_to(jnp.array([[sreal, sreal]], jnp.int32), (B, 2))
    scal = jnp.array([[0, 0, 7, 0]], jnp.int32)
    common = dict(causal=True, softmax_scale=D ** -0.5, seqlen_q_real=sreal,
                  seqlen_k_real=sreal, static_skip=True, dropout_p=0.3)
    o, lse = flash_attn_forward(
        q, k, v, lens, scal, None, block_q=128, block_kv=128,
        tri_square=False, causal_split=False, zigzag=False,
        causal_strip=False, **common)
    dlse_m = jnp.where(jnp.isfinite(lse), dlse, 0.0)
    ref = flash_attn_backward(
        q, k, v, do, o, lse, lens, scal, None, block_q=128, block_kv=128,
        fused=False, dlse=dlse_m, **common)
    sp = flash_attn_backward(
        q, k, v, do, o, lse, lens, scal, None, block_q=128, block_kv=128,
        causal_split=True, split_leaf=leaf, dlse=dlse_m, **common)
    for name, a, b in zip(("dq", "dk", "dv"), sp, ref):
        assert float(jnp.abs(a - b).max()) < 5e-5, name
    # default bwd dispatch keeps the fused schedule (split is override-only
    # until the diag-leaf rate justifies it); the S=4096 D=128 strip-bwd
    # config that overflowed scoped VMEM by 4KB is gated out.
    assert not causal_split_bwd_ok(True, True, (-1, -1), None, False, 0.0,
                                   4096, 4096, 4096, 4096, 128, 1)
    from fa2_triton_tpu.ops.flash_bwd import bwd_causal_strip_ok
    assert not bwd_causal_strip_ok(True, True, (-1, -1), None, False, 0.0,
                                   4096, 4096, 4096, 4096, head_dim=128)
    assert bwd_causal_strip_ok(True, True, (-1, -1), None, False, 0.0,
                               3072, 3072, 2560, 2560, head_dim=128)


def test_merge_softmax_partials_identities():
    """Merging with a dead partial is the identity; merging equal halves
    doubles l (lse + 1 in base-2) and keeps o."""
    o = jnp.ones((1, 1, 4, 8), jnp.float32) * 0.5
    lse = jnp.full((1, 1, 4, 1), 2.0, jnp.float32)
    dead_o = jnp.zeros_like(o)
    dead_lse = jnp.full_like(lse, -jnp.inf)
    om, lm = merge_softmax_partials(o, lse, dead_o, dead_lse)
    assert float(jnp.abs(om - o).max()) < 1e-7
    assert float(jnp.abs(lm - lse).max()) < 1e-7
    om, lm = merge_softmax_partials(dead_o, dead_lse, o, lse)
    assert float(jnp.abs(om - o).max()) < 1e-7
    om, lm = merge_softmax_partials(o, lse, o, lse)
    assert float(jnp.abs(om - o).max()) < 1e-6
    assert float(jnp.abs(lm - (lse + 1.0)).max()) < 1e-6
    # both dead -> stays dead, no NaNs
    om, lm = merge_softmax_partials(dead_o, dead_lse, dead_o, dead_lse)
    assert bool(jnp.all(om == 0.0)) and bool(jnp.all(lm == -jnp.inf))
