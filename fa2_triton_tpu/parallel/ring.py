"""Ring (sequence-parallel) attention for long context.

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

Forward / inference path. The training-grade ring backward (ring of q/do/
lse/delta against resident KV shards, reusing the dq/dkdv kernels per chunk
pair) lands with the distributed-training layer.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from fa2_triton_tpu.ops.flash_fwd import MASK_LOG2, flash_attn_forward
from fa2_triton_tpu.ops.tuning import choose_block_sizes
from fa2_triton_tpu.parallel.mesh import AXIS_DATA, AXIS_MODEL, AXIS_SEQ
from fa2_triton_tpu.utils import (
    default_softmax_scale,
    pad_to_multiple,
    round_up_to_multiple,
)


def _merge(m, l, acc, o_c, lse_c):
    m_new = jnp.maximum(m, lse_c)
    w_old = jnp.exp2(m - m_new)
    w_c = jnp.exp2(lse_c - m_new)
    acc = acc * w_old + o_c.astype(jnp.float32) * w_c
    l = l * w_old + w_c
    return m_new, l, acc


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
    """Per-shard body; must run inside shard_map over `axis_name`."""
    B, S_loc, Hq, D = q.shape
    Hkv = k.shape[2]
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    scale = softmax_scale if softmax_scale is not None else default_softmax_scale(D)

    Dp = round_up_to_multiple(D, 128)
    blocks = choose_block_sizes(S_loc, S_loc, Dp)
    bq, bkv = blocks.block_q, blocks.block_kv
    to_bhsd = lambda x: jnp.transpose(x, (0, 2, 1, 3))
    qT = pad_to_multiple(pad_to_multiple(to_bhsd(q), bq, 2), 128, 3)
    kT = pad_to_multiple(pad_to_multiple(to_bhsd(k), bkv, 2), 128, 3)
    vT = pad_to_multiple(pad_to_multiple(to_bhsd(v), bkv, 2), 128, 3)
    Sp = qT.shape[2]

    S_tot = n * S_loc
    lens = jnp.broadcast_to(jnp.array([[S_tot, S_tot]], jnp.int32), (B, 2))
    q_off = idx * S_loc

    m = jnp.full((B, Hq, Sp, 1), MASK_LOG2, jnp.float32)
    l = jnp.zeros((B, Hq, Sp, 1), jnp.float32)
    acc = jnp.zeros((B, Hq, Sp, Dp), jnp.float32)

    perm = [(i, (i + 1) % n) for i in range(n)]
    k_cur, v_cur = kT, vT
    for step in range(n):
        src = (idx - step) % n
        kv_off = src * S_loc
        scalars = jnp.concatenate(
            [q_off.reshape(1, 1), kv_off.reshape(1, 1),
             jnp.zeros((1, 2), jnp.int32)], axis=1
        ).astype(jnp.int32)

        def _chunk(operands):
            m, l, acc, k_c, v_c, scalars = operands
            o_c, lse_c = flash_attn_forward(
                qT, k_c, v_c, lens, scalars, None,
                causal=causal, softmax_scale=scale,
                block_q=bq, block_kv=bkv,
                seqlen_q_real=S_loc, seqlen_k_real=S_loc,
                static_skip=False, varlen=False,
            )
            return _merge(m, l, acc, o_c, lse_c)

        if causal:
            # Chunk is strictly in the future of every local query row iff
            # its first key position exceeds the last query position.
            needed = kv_off <= q_off + S_loc - 1
            m, l, acc = jax.lax.cond(
                needed, _chunk, lambda ops: (ops[0], ops[1], ops[2]),
                (m, l, acc, k_cur, v_cur, scalars),
            )
        else:
            m, l, acc = _chunk((m, l, acc, k_cur, v_cur, scalars))

        if step != n - 1:
            k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
            v_cur = jax.lax.ppermute(v_cur, axis_name, perm)

    l_inv = jnp.where(l > 0.0, 1.0 / l, 0.0)
    o = (acc * l_inv).astype(q.dtype)
    out = jnp.transpose(o[:, :, :S_loc, :D], (0, 2, 1, 3))
    if return_lse:
        lse = (m + jnp.log2(jnp.maximum(l, 0.0)))[:, :, :S_loc, 0]
        return out, lse
    return out


def make_ring_attention(
    mesh: Mesh,
    *,
    causal: bool = False,
    softmax_scale: Optional[float] = None,
    seq_axis: str = AXIS_SEQ,
):
    """Returns fn(q, k, v) over GLOBAL [B, S, H, D] arrays sharded
    (data, seq, model, None); sequence sharded over the ring axis."""

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
