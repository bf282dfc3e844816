"""Ring (sequence-parallel) attention for long context — fwd AND bwd.

New scale-out surface the reference lacks (SURVEY.md §5.7): the KV sequence
is sharded over the mesh's `seq` axis; each device computes its query shard
against the KV shard it currently holds while `ppermute` rotates K/V around
the ring, and the per-chunk partials are merged with the SAME associative
online-softmax rule the kernel uses internally
(`compute_row_blocks.py:71-101` in the reference is the mathematical
contract): each chunk returns a normalized output plus base-2 LSE, and

    m'   = max(m, lse_c)
    acc' = acc * exp2(m - m') + o_c * exp2(lse_c - m')
    l'   = l   * exp2(m - m') +        exp2(lse_c - m')

recovers the exact full-sequence softmax. Causal masking stays correct
because the kernel takes global (q_offset, kv_offset) positions, and
strictly-future chunks are skipped with lax.cond (their ppermute still runs,
keeping the ring in lockstep).

Backward (training): once the forward has the GLOBAL base-2 LSE per query
row, the FA2 recompute decomposes per chunk pair, so

  * dq_i accumulates locally over the KV chunks as they pass by, and
  * (k_j, v_j, dk_j, dv_j) travel the ring TOGETHER: every device adds its
    local (q_i, do_i, lse_i, delta_i) contribution to the resident chunk's
    dk/dv, and after n hops the accumulators arrive home complete —
    deterministic, no collective reductions beyond the ppermute ring.

Constraint: the local shard length must be a multiple of 128 (true for any
power-of-two ring over a lane-aligned global sequence) so padded rows never
alias the next shard's global positions.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from fa2_triton_tpu.ops.flash_bwd import flash_attn_backward
from fa2_triton_tpu.ops.flash_fwd import MASK_LOG2, flash_attn_forward
from fa2_triton_tpu.ops.tuning import choose_block_sizes
from fa2_triton_tpu.parallel.mesh import AXIS_DATA, AXIS_MODEL, AXIS_SEQ
from fa2_triton_tpu.utils import (
    LOG2E,
    default_softmax_scale,
    pad_to_multiple,
    round_up_to_multiple,
)


@dataclass(frozen=True)
class RingConfig:
    axis_name: str
    causal: bool
    softmax_scale: Optional[float]


def _merge(m, l, acc, o_c, lse_c):
    m_new = jnp.maximum(m, lse_c)
    w_old = jnp.exp2(m - m_new)
    w_c = jnp.exp2(lse_c - m_new)
    acc = acc * w_old + o_c.astype(jnp.float32) * w_c
    l = l * w_old + w_c
    return m_new, l, acc


def _to_bhsd(x):
    return jnp.transpose(x, (0, 2, 1, 3))


def _from_bhsd(x):
    return jnp.transpose(x, (0, 2, 1, 3))


def _scalars(q_off, kv_off):
    return jnp.concatenate(
        [q_off.reshape(1, 1), kv_off.reshape(1, 1), jnp.zeros((1, 2), jnp.int32)],
        axis=1,
    ).astype(jnp.int32)


def _ring_forward_impl(cfg: RingConfig, q, k, v):
    """Per-shard forward. Returns (out BSHD, lse [B, Hq, S_loc, 1] f32)."""
    B, S_loc, Hq, D = q.shape
    assert S_loc % 128 == 0, "ring shards must be lane-aligned (S_loc % 128 == 0)"
    n = jax.lax.axis_size(cfg.axis_name)
    idx = jax.lax.axis_index(cfg.axis_name)
    scale = cfg.softmax_scale if cfg.softmax_scale is not None else default_softmax_scale(D)

    Dp = round_up_to_multiple(D, 128)
    blocks = choose_block_sizes(S_loc, S_loc, Dp, causal=cfg.causal)
    bq, bkv = min(blocks.block_q, S_loc), min(blocks.block_kv, S_loc)
    qT = pad_to_multiple(_to_bhsd(q), 128, 3)
    kT = pad_to_multiple(_to_bhsd(k), 128, 3)
    vT = pad_to_multiple(_to_bhsd(v), 128, 3)
    # Hoist the scale*log2e fold out of the per-chunk loop (the launcher
    # would otherwise redo this elementwise pass once per ring hop).
    qT = (qT.astype(jnp.float32) * (scale * LOG2E)).astype(qT.dtype)

    S_tot = n * S_loc
    lens = jnp.broadcast_to(jnp.array([[S_tot, S_tot]], jnp.int32), (B, 2))
    q_off = idx * S_loc

    m = jnp.full((B, Hq, S_loc, 1), MASK_LOG2, jnp.float32)
    l = jnp.zeros((B, Hq, S_loc, 1), jnp.float32)
    acc = jnp.zeros((B, Hq, S_loc, Dp), jnp.float32)

    perm = [(i, (i + 1) % n) for i in range(n)]
    k_cur, v_cur = kT, vT
    for step in range(n):
        src = (idx - step) % n
        kv_off = src * S_loc

        def _chunk(ops):
            m, l, acc, k_c, v_c, kv_off = ops
            o_c, lse_c = flash_attn_forward(
                qT, k_c, v_c, lens, _scalars(q_off, kv_off), None,
                causal=cfg.causal, softmax_scale=scale,
                block_q=bq, block_kv=bkv,
                seqlen_q_real=S_loc, seqlen_k_real=S_loc,
                static_skip=False, varlen=False, q_prescaled=True,
            )
            return _merge(m, l, acc, o_c, lse_c)

        if cfg.causal:
            needed = kv_off <= q_off + S_loc - 1
            m, l, acc = jax.lax.cond(
                needed, _chunk, lambda ops: (ops[0], ops[1], ops[2]),
                (m, l, acc, k_cur, v_cur, kv_off),
            )
        else:
            m, l, acc = _chunk((m, l, acc, k_cur, v_cur, kv_off))

        if step != n - 1:
            k_cur = jax.lax.ppermute(k_cur, cfg.axis_name, perm)
            v_cur = jax.lax.ppermute(v_cur, cfg.axis_name, perm)

    l_inv = jnp.where(l > 0.0, 1.0 / l, 0.0)
    o = (acc * l_inv).astype(q.dtype)
    lse = m + jnp.log2(jnp.maximum(l, 0.0))  # -inf on dead rows
    out = _from_bhsd(o[:, :, :, :D])
    return out, lse


def _ring_backward_impl(cfg: RingConfig, q, k, v, out, lse, do):
    """Per-shard backward. dq stays local; (k, v, dk, dv) ride the ring."""
    B, S_loc, Hq, D = q.shape
    n = jax.lax.axis_size(cfg.axis_name)
    idx = jax.lax.axis_index(cfg.axis_name)
    scale = cfg.softmax_scale if cfg.softmax_scale is not None else default_softmax_scale(D)

    Dp = round_up_to_multiple(D, 128)
    blocks = choose_block_sizes(S_loc, S_loc, Dp, causal=cfg.causal)
    bq = min(blocks.block_q_bwd, S_loc)
    bkv = min(blocks.block_kv_bwd, S_loc)
    qT = pad_to_multiple(_to_bhsd(q), 128, 3)
    kT = pad_to_multiple(_to_bhsd(k), 128, 3)
    vT = pad_to_multiple(_to_bhsd(v), 128, 3)
    oT = pad_to_multiple(_to_bhsd(out), 128, 3)
    doT = pad_to_multiple(_to_bhsd(do), 128, 3)

    S_tot = n * S_loc
    lens = jnp.broadcast_to(jnp.array([[S_tot, S_tot]], jnp.int32), (B, 2))
    q_off = idx * S_loc

    dq = jnp.zeros_like(qT, jnp.float32)
    dk_t = jnp.zeros_like(kT, jnp.float32)
    dv_t = jnp.zeros_like(vT, jnp.float32)

    perm = [(i, (i + 1) % n) for i in range(n)]
    k_cur, v_cur = kT, vT
    for step in range(n):
        src = (idx - step) % n
        kv_off = src * S_loc

        def _chunk(ops):
            dq, dk_t, dv_t, k_c, v_c, kv_off = ops
            dq_c, dk_c, dv_c = flash_attn_backward(
                qT, k_c, v_c, doT, oT, lse, lens, _scalars(q_off, kv_off), None,
                causal=cfg.causal, softmax_scale=scale,
                block_q=bq, block_kv=bkv,
                seqlen_q_real=S_loc, seqlen_k_real=S_loc,
                static_skip=False,
            )
            return (dq + dq_c.astype(jnp.float32),
                    dk_t + dk_c.astype(jnp.float32),
                    dv_t + dv_c.astype(jnp.float32))

        if cfg.causal:
            needed = kv_off <= q_off + S_loc - 1
            dq, dk_t, dv_t = jax.lax.cond(
                needed, _chunk, lambda ops: (ops[0], ops[1], ops[2]),
                (dq, dk_t, dv_t, k_cur, v_cur, kv_off),
            )
        else:
            dq, dk_t, dv_t = _chunk((dq, dk_t, dv_t, k_cur, v_cur, kv_off))

        # Rotate the chunk AND its gradient accumulators together; after the
        # final hop they are home, complete.
        k_cur = jax.lax.ppermute(k_cur, cfg.axis_name, perm)
        v_cur = jax.lax.ppermute(v_cur, cfg.axis_name, perm)
        dk_t = jax.lax.ppermute(dk_t, cfg.axis_name, perm)
        dv_t = jax.lax.ppermute(dv_t, cfg.axis_name, perm)

    dq_out = _from_bhsd(dq[:, :, :, :D]).astype(q.dtype)
    dk_out = _from_bhsd(dk_t[:, :, :, :D]).astype(k.dtype)
    dv_out = _from_bhsd(dv_t[:, :, :, :D]).astype(v.dtype)
    return dq_out, dk_out, dv_out


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _ring_attn(cfg: RingConfig, q, k, v):
    out, _ = _ring_forward_impl(cfg, q, k, v)
    return out


def _ring_attn_fwd(cfg, q, k, v):
    out, lse = _ring_forward_impl(cfg, q, k, v)
    return out, (q, k, v, out, lse)


def _ring_attn_bwd(cfg, res, do):
    q, k, v, out, lse = res
    return _ring_backward_impl(cfg, q, k, v, out, lse, do)


_ring_attn.defvjp(_ring_attn_fwd, _ring_attn_bwd)


def ring_attention_local(
    q: jax.Array,   # [B, S_loc, Hq, D] local shard
    k: jax.Array,   # [B, S_loc, Hkv, D]
    v: jax.Array,
    *,
    axis_name: str,
    causal: bool,
    softmax_scale: Optional[float] = None,
    return_lse: bool = False,
):
    """Differentiable per-shard ring attention; run inside shard_map."""
    cfg = RingConfig(axis_name=axis_name, causal=causal, softmax_scale=softmax_scale)
    if return_lse:
        out, lse = _ring_forward_impl(cfg, q, k, v)
        return out, lse[:, :, :, 0]
    return _ring_attn(cfg, q, k, v)


def make_ring_attention(
    mesh: Mesh,
    *,
    causal: bool = False,
    softmax_scale: Optional[float] = None,
    seq_axis: str = AXIS_SEQ,
):
    """Returns differentiable fn(q, k, v) over GLOBAL [B, S, H, D] arrays
    sharded (data, seq, model, None)."""

    def local_fn(q, k, v):
        return ring_attention_local(
            q, k, v, axis_name=seq_axis, causal=causal,
            softmax_scale=softmax_scale,
        )

    spec = P(AXIS_DATA, seq_axis, AXIS_MODEL, None)
    return jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
