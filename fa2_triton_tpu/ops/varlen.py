"""Packed (zero-waste) variable-length attention — work-list-driven kernels.

The reference physically packs right-padded batches into one [1, sum(len)]
sequence with cumulative-seqlen offsets so padded tokens cost nothing
(`/root/reference/src/utils.py:8-31`, `src/forward/caller.py:44-63`); its
Triton grid is sized to the max seqlen and idle programs exit early, which
is free on a GPU. On a TPU the grid is SEQUENTIAL — an idle step still
ticks the pipeline — so the idiomatic equivalent inverts the control flow:

* sequences are packed back-to-back, each padded to the block alignment
  (`pack_padded_batch`), with STATIC (host-known) cumulative offsets, like
  the standard fixed-token-budget sequence-packing used by TPU input
  pipelines;
* the host enumerates exactly the (q block, kv block) pairs that carry real
  work — causally-skipped and out-of-segment pairs never enter the grid —
  into a WORK LIST, prefetched to SMEM (`PrefetchScalarGridSpec`), which
  both the BlockSpec index maps and the kernel body read;
* the grid is (heads, n_steps): every step does real compute. Block-sparse
  schedules (splash-attention-style) fall out of the same mechanism.

Segment semantics per packed sequence match the dense kernels: causal
masking bottom-right-aligned on the true (unpadded) lengths, base-2 LSE,
padded tail rows zero-filled with lse = -inf.

Work-list row layout (int32, [n_steps, 8]):
  0: packed q block   1: packed kv block
  2: q row offset in segment        3: kv col offset in segment
  4: segment q_len    5: segment kv_len
  6: init flag (first kv step of this q block)
     + 2*final flag (last kv step) + 4*masked flag (tile needs edge/diag)
  7: unused
"""
from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fa2_triton_tpu.utils import (
    LOG2E,
    default_softmax_scale,
    dot_precision,
    interpret_mode,
    round_up_to_multiple,
)
from fa2_triton_tpu.utils.rng import counter_hash_uint32, dropout_threshold

MASK_LOG2 = -1e30
LANES = 128

F_INIT, F_FINAL, F_MASKED = 1, 2, 4


# ------------------------------ packing -----------------------------------

def pack_padded_batch(xs: Sequence[jax.Array], lens: Sequence[int],
                      align: int = 512):
    """Pack right-padded [B, S, ...] arrays into [1, T, ...] with each
    sequence start aligned to `align` (so kernel blocks never straddle a
    segment boundary). `lens` must be CONCRETE ints — packing layout is a
    host-side decision, exactly like the reference's `attention_pack`.

    Returns (packed list, seg_starts [B] np.int32, T)."""
    lens = [int(l) for l in lens]
    starts = np.cumsum([0] + [round_up_to_multiple(max(l, 1), align)
                              for l in lens[:-1]]).astype(np.int32)
    T = int(starts[-1]) + round_up_to_multiple(max(lens[-1], 1), align)
    packed = []
    for x in xs:
        B, S = x.shape[:2]
        out = jnp.zeros((1, T) + x.shape[2:], x.dtype)
        for b in range(B):
            out = jax.lax.dynamic_update_slice_in_dim(
                out, x[b:b + 1, :lens[b]], int(starts[b]), axis=1)
        packed.append(out)
    return packed, starts, T


def unpack_padded_batch(xp: jax.Array, seg_starts: np.ndarray,
                        lens: Sequence[int], seqlen: int) -> jax.Array:
    """Inverse of `pack_padded_batch` for one array: [1, T, ...] -> [B, S, ...]
    (padded tail positions zero-filled)."""
    B = len(lens)
    rows = []
    for b in range(B):
        row = jax.lax.dynamic_slice_in_dim(
            xp, int(seg_starts[b]), min(int(lens[b]), seqlen), axis=1)
        pad = seqlen - row.shape[1]
        if pad:
            row = jnp.pad(row, ((0, 0), (0, pad)) + ((0, 0),) * (xp.ndim - 2))
        rows.append(row)
    return jnp.concatenate(rows, axis=0)


# --------------------------- schedule builder -----------------------------

def _seg_extents(seg_starts, T: int):
    starts = [int(s) for s in seg_starts]
    return [b - a for a, b in zip(starts, starts[1:] + [int(T)])]

def _build_schedule(seg_starts, seg_exts, seg_qlens, seg_kvlens,
                    block_q, block_kv, causal, kv_major=False, group=1,
                    keep_block=None):
    """Host-side work list (see module docstring).

    `seg_exts` are each segment's PADDED extents (align-multiples tiling the
    packed stream): every output block in an extent gets at least one step
    so dead tails are zero-filled deterministically (padded positions must
    carry exact zeros — the packed cotangents feed straight into user
    arrays). kv_major=True emits the dk/dv ordering: consecutive steps share
    a kv block (iterating the GQA group inside it); init/final then refer to
    the kv block's accumulation.

    `keep_block(seg, jq, jk) -> bool` optionally filters (q block, kv block)
    pairs at BLOCK granularity (segment-local indices) — block-sparse
    attention: filtered pairs never enter the grid, and the softmax
    normalizes over the surviving blocks only. Rows/columns whose every
    pair is filtered zero-fill via the dummy masked step."""
    rows: List[List[int]] = []
    B = len(seg_qlens)
    for s in range(B):
        q0 = int(seg_starts[s])
        ext = int(seg_exts[s])
        qlen, kvlen = int(seg_qlens[s]), int(seg_kvlens[s])
        shift = kvlen - qlen
        nq = ext // block_q
        nkv = ext // block_kv
        live_q = [jq for jq in range(nq) if jq * block_q < qlen]
        if kv_major:
            for jk in range(nkv):
                kv_lo = jk * block_kv
                steps = []
                for g in range(group):
                    for jq in live_q:
                        q_lo = jq * block_q
                        if (causal and kv_lo < kvlen
                                and q_lo + block_q - 1 + shift < kv_lo):
                            continue  # entire q block above the diagonal
                        if kv_lo >= kvlen:
                            continue  # dead kv tail: zero-fill only
                        if (keep_block is not None
                                and not keep_block(s, jq, jk)):
                            continue  # block-sparse: filtered out
                        masked = (
                            kv_lo + block_kv > kvlen
                            or q_lo + block_q > qlen
                            or (causal
                                and kv_lo + block_kv - 1 > q_lo + shift)
                        )
                        steps.append([
                            (q0 + q_lo) // block_q, (q0 + kv_lo) // block_kv,
                            q_lo, kv_lo, qlen, kvlen,
                            F_MASKED * masked, g,
                        ])
                if not steps:
                    # Dead or fully-filtered kv block: one masked step whose
                    # compute contributes zero; the finalizer writes zeros.
                    # kvlen is clamped to kv_lo so every column of the block
                    # fails `col < kvlen` — a LIVE kv block that block-sparse
                    # filtered out must not pick up q-block-0's real ds/p.
                    steps = [[q0 // block_q, (q0 + kv_lo) // block_kv,
                              0, kv_lo, qlen, min(kvlen, kv_lo),
                              F_MASKED, 0]]
                steps[0][6] |= F_INIT
                steps[-1][6] |= F_FINAL
                rows += steps
        else:
            for jq in range(nq):
                q_lo = jq * block_q
                steps = []
                if q_lo < qlen:
                    for jk in range(nkv):
                        kv_lo = jk * block_kv
                        if kv_lo >= kvlen:
                            break
                        if causal and kv_lo > q_lo + block_q - 1 + shift:
                            break  # strictly-future kv blocks
                        if (keep_block is not None
                                and not keep_block(s, jq, jk)):
                            continue  # block-sparse: filtered out
                        masked = (
                            kv_lo + block_kv > kvlen
                            or (causal
                                and kv_lo + block_kv - 1 > q_lo + shift)
                        )
                        steps.append([
                            (q0 + q_lo) // block_q, (q0 + kv_lo) // block_kv,
                            q_lo, kv_lo, qlen, kvlen,
                            F_MASKED * masked, 0,
                        ])
                if not steps:
                    # Dead row block (padded tail / negative-shift causal)
                    # or a live one block-sparse filtered entirely: one
                    # masked step so the finalizer zero-fills it. qlen is
                    # clamped to q_lo so every row of the block fails
                    # `row < qlen` in the finalizer (o = 0, lse = -inf —
                    # which in turn zeroes the backward's p for these rows).
                    steps = [[(q0 + q_lo) // block_q, q0 // block_kv,
                              q_lo, 0, min(qlen, q_lo), kvlen,
                              F_MASKED, 0]]
                steps[0][6] |= F_INIT
                steps[-1][6] |= F_FINAL
                rows += steps
    return np.asarray(rows, np.int32)


# ------------------------------ forward -----------------------------------

def _packed_dropout_bits(work_ref, seed_ref, i, h_q, block_q, block_kv, T):
    """Keep-bits for one tile of the packed dropout stream.

    The stream is a CHAINED counter hash over the GLOBAL PACKED coordinates:
    hash(hash(hash(seed, h), row_packed), col_packed). Chaining (a PRF
    composition) rather than flattening `(h*T + row)*T + col` keeps streams
    distinct for ANY packed total — the flat uint32 form collides once
    Hq*T^2 wraps 2^32 (at T = 65536 every head would share one mask). The
    oracle regenerates the identical mask from the same composition
    (tests/test_varlen_packed.py)."""
    row_gp = (work_ref[i, 0] * block_q + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_kv), 0)).astype(jnp.uint32)
    col_gp = (work_ref[i, 1] * block_kv + jax.lax.broadcasted_iota(
        jnp.int32, (block_q, block_kv), 1)).astype(jnp.uint32)
    s_h = counter_hash_uint32(seed_ref[0].astype(jnp.uint32),
                              h_q.astype(jnp.uint32))
    return counter_hash_uint32(counter_hash_uint32(s_h, row_gp), col_gp)


def _varlen_fwd_kernel(
    work_ref,                 # [n_steps, 8] SMEM (prefetched)
    seed_ref,                 # [1] SMEM (prefetched) dropout seed
    q_ref, k_ref, v_ref,      # (1, 1, bq, D) / (1, 1, bkv, D)
    o_ref, lse_ref,
    m_scr, l_scr, acc_scr,
    *,
    causal: bool, block_q: int, block_kv: int,
    dropout_p: float = 0.0, T: int = 0,
):
    h, i = pl.program_id(0), pl.program_id(1)
    flags = work_ref[i, 6]
    q_lo = work_ref[i, 2]
    kv_lo = work_ref[i, 3]
    qlen = work_ref[i, 4]
    kvlen = work_ref[i, 5]
    shift = kvlen - qlen

    @pl.when((flags & F_INIT) != 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, MASK_LOG2)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    def _compute(masked):
        q = q_ref[0, 0]           # prescaled by scale*log2e
        k = k_ref[0, 0]
        s2 = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_precision(q, k),
        )
        if masked:
            row_g = q_lo + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 0)
            col_g = kv_lo + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 1)
            keep = col_g < kvlen
            if causal:
                keep = jnp.logical_and(keep, col_g <= row_g + shift)
            s2 = jnp.where(keep, s2, MASK_LOG2)
        m_prev = m_scr[...]
        m_new = jnp.maximum(m_prev,
                            jnp.max(s2, axis=-1, keepdims=True))
        alpha = jnp.exp2(m_prev[:, :1] - m_new[:, :1])
        m_scr[...] = m_new
        p = jnp.exp2(s2 - m_new[:, :1])
        l_scr[...] = l_scr[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        if dropout_p > 0.0:
            # Same convention as the dense kernels: l counts the full p
            # (true softmax normalizer / LSE), dropped entries only leave
            # the accumulator; the finalizer compensates by 1/(1-p).
            bits = _packed_dropout_bits(
                work_ref, seed_ref, i, h, block_q, block_kv, T)
            p = jnp.where(
                bits >= jnp.uint32(dropout_threshold(dropout_p)), p, 0.0)
        v = v_ref[0, 0]
        acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_precision(v),
        )

    pl.when((flags & F_MASKED) != 0)(functools.partial(_compute, True))
    pl.when((flags & F_MASKED) == 0)(functools.partial(_compute, False))

    @pl.when((flags & F_FINAL) != 0)
    def _finalize():
        m = m_scr[:, :1]
        l = l_scr[:, :1]
        l_inv = jnp.where(l > 0.0, 1.0 / l, 0.0)
        if dropout_p > 0.0:
            l_inv = l_inv / (1.0 - dropout_p)
        o = acc_scr[...] * l_inv
        row_g = q_lo + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
        valid = row_g < qlen
        if causal:
            valid = jnp.logical_and(valid, row_g + shift >= 0)
        o_ref[0, 0] = jnp.where(valid, o, 0.0).astype(o_ref.dtype)
        lse = m + jnp.log2(l)
        lse_ref[0, 0] = jnp.where(valid, lse, -jnp.inf).astype(lse_ref.dtype)


def flash_attn_varlen_forward(
    q, k, v,                    # [1, H, T, D] packed BHSD, D lane-padded
    seg_starts: np.ndarray,     # [B] static packed offsets (align-multiples)
    seg_qlens: Sequence[int], seg_kvlens: Sequence[int],
    *,
    causal: bool, softmax_scale: float,
    block_q: int = 512, block_kv: int = 512,
    dropout_p: float = 0.0, seed=0,
    q_prescaled: bool = False, keep_block=None,
    debug_interpret: Optional[bool] = None,
):
    _, Hq, T, D = q.shape
    Hkv = k.shape[1]
    group = Hq // Hkv
    assert T % block_q == 0 and T % block_kv == 0
    assert all(int(s) % max(block_q, block_kv) == 0 for s in seg_starts)
    if not q_prescaled:
        q = (q.astype(jnp.float32) * (softmax_scale * LOG2E)).astype(q.dtype)
    exts = _seg_extents(seg_starts, T)
    work = _build_schedule(seg_starts, exts, seg_qlens, seg_kvlens,
                           block_q, block_kv, causal,
                           keep_block=keep_block)
    interpret = interpret_mode() if debug_interpret is None else debug_interpret
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)

    def q_index(h, i, work_ref, seed_ref):
        return (0, h, work_ref[i, 0], 0)

    def kv_index(h, i, work_ref, seed_ref):
        return (0, h // group, work_ref[i, 1], 0)

    o, lse = pl.pallas_call(
        functools.partial(
            _varlen_fwd_kernel, causal=causal,
            block_q=block_q, block_kv=block_kv,
            dropout_p=dropout_p, T=T,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(Hq, work.shape[0]),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, D), q_index),
                pl.BlockSpec((1, 1, block_kv, D), kv_index),
                pl.BlockSpec((1, 1, block_kv, D), kv_index),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, block_q, D), q_index),
                pl.BlockSpec((1, 1, block_q, 1), q_index),
            ),
            scratch_shapes=[
                pltpu.VMEM((block_q, LANES), jnp.float32),
                pltpu.VMEM((block_q, LANES), jnp.float32),
                pltpu.VMEM((block_q, D), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, Hq, T, D), q.dtype),
            jax.ShapeDtypeStruct((1, Hq, T, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray(work), seed_arr, q, k, v)
    return o, lse


# ------------------------------ backward ----------------------------------

def _varlen_dq_kernel(
    work_ref,
    seed_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dq_ref,
    acc_scr,
    *,
    causal: bool, block_q: int, block_kv: int,
    dropout_p: float = 0.0, T: int = 0,
):
    h, i = pl.program_id(0), pl.program_id(1)
    flags = work_ref[i, 6]
    q_lo, kv_lo = work_ref[i, 2], work_ref[i, 3]
    qlen, kvlen = work_ref[i, 4], work_ref[i, 5]
    shift = kvlen - qlen

    @pl.when((flags & F_INIT) != 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    def _compute(masked):
        q = q_ref[0, 0]           # TRUE q; k carries the scale fold
        k = k_ref[0, 0]
        do = do_ref[0, 0]
        lse_row = lse_ref[0, 0]
        lse_row = jnp.where(jnp.isfinite(lse_row), lse_row, 1e30)
        s2 = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_precision(q, k),
        )
        if masked:
            row_g = q_lo + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 0)
            col_g = kv_lo + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 1)
            keep = col_g < kvlen
            if causal:
                keep = jnp.logical_and(keep, col_g <= row_g + shift)
            s2 = jnp.where(keep, s2, MASK_LOG2)
        p = jnp.exp2(s2 - lse_row)
        dp = jax.lax.dot_general(
            do, v_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_precision(do),
        )
        if dropout_p > 0.0:
            # Dense-kernel convention: dp is masked and 1/(1-p)-compensated
            # where kept (the dropped-probability paths see it).
            bits = _packed_dropout_bits(
                work_ref, seed_ref, i, h, block_q, block_kv, T)
            keep_d = bits >= jnp.uint32(dropout_threshold(dropout_p))
            dp = jnp.where(keep_d, dp * (1.0 / (1.0 - dropout_p)), 0.0)
        ds = p * (dp - delta_ref[0, 0])
        acc_scr[...] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_precision(k),
        )

    pl.when((flags & F_MASKED) != 0)(functools.partial(_compute, True))
    pl.when((flags & F_MASKED) == 0)(functools.partial(_compute, False))

    @pl.when((flags & F_FINAL) != 0)
    def _finalize():
        # q carried scale*log2e; ds @ k_true needs * scale -> net 1/log2e.
        dq_ref[0, 0] = (acc_scr[...] * (1.0 / LOG2E)).astype(dq_ref.dtype)


def _varlen_dkdv_kernel(
    work_ref,
    seed_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref,
    dk_scr, dv_scr,
    *,
    causal: bool, scale: float, block_q: int, block_kv: int,
    group: int = 1, dropout_p: float = 0.0, T: int = 0,
):
    hkv, i = pl.program_id(0), pl.program_id(1)
    flags = work_ref[i, 6]
    q_lo, kv_lo = work_ref[i, 2], work_ref[i, 3]
    qlen, kvlen = work_ref[i, 4], work_ref[i, 5]
    shift = kvlen - qlen

    @pl.when((flags & F_INIT) != 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    def _compute(masked):
        q = q_ref[0, 0]           # TRUE q; k carries the scale fold
        k = k_ref[0, 0]
        do = do_ref[0, 0]
        lse_row = lse_ref[0, 0]
        lse_row = jnp.where(jnp.isfinite(lse_row), lse_row, 1e30)
        s2 = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_precision(q, k),
        )
        if masked:
            row_g = q_lo + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 0)
            col_g = kv_lo + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_kv), 1)
            keep = jnp.logical_and(col_g < kvlen, row_g < qlen)
            if causal:
                keep = jnp.logical_and(keep, col_g <= row_g + shift)
            s2 = jnp.where(keep, s2, MASK_LOG2)
        p = jnp.exp2(s2 - lse_row)
        if masked:
            p = jnp.where(keep, p, 0.0)
        dp = jax.lax.dot_general(
            do, v_ref[0, 0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_precision(do),
        )
        p_dv = p
        if dropout_p > 0.0:
            h_q = hkv * group + work_ref[i, 7]
            bits = _packed_dropout_bits(
                work_ref, seed_ref, i, h_q, block_q, block_kv, T)
            keep_d = bits >= jnp.uint32(dropout_threshold(dropout_p))
            inv = 1.0 / (1.0 - dropout_p)
            p_dv = jnp.where(keep_d, p * inv, 0.0)
            dp = jnp.where(keep_d, dp * inv, 0.0)
        ds = p * (dp - delta_ref[0, 0])
        dv_scr[...] += jax.lax.dot_general(
            p_dv.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_precision(do),
        )
        dk_scr[...] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_precision(q),
        )

    pl.when((flags & F_MASKED) != 0)(functools.partial(_compute, True))
    pl.when((flags & F_MASKED) == 0)(functools.partial(_compute, False))

    @pl.when((flags & F_FINAL) != 0)
    def _finalize():
        dk_ref[0, 0] = (dk_scr[...] * scale).astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def flash_attn_varlen_backward(
    q, k, v, do, o, lse,        # packed BHSD / [1, H, T, 1]
    seg_starts, seg_qlens, seg_kvlens,
    *,
    causal: bool, softmax_scale: float,
    block_q: int = 512, block_kv: int = 512,
    dropout_p: float = 0.0, seed=0,
    dlse: Optional[jax.Array] = None, keep_block=None,
    debug_interpret: Optional[bool] = None,
):
    _, Hq, T, D = q.shape
    Hkv = k.shape[1]
    group = Hq // Hkv
    interpret = interpret_mode() if debug_interpret is None else debug_interpret
    # Both passes take TRUE q and PRESCALED k (k folds scale*log2e): then
    # s2 = q . k_p is in the exp2 domain, dq = (ds @ k_p) / log2e and
    # dk = (ds^T @ q) * scale come out with one constant multiply each.
    c = softmax_scale * LOG2E
    k_p = (k.astype(jnp.float32) * c).astype(k.dtype)
    delta = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1,
                    keepdims=True)
    if dlse is not None:
        safe = jnp.logical_and(jnp.isfinite(lse), jnp.isfinite(dlse))
        delta = delta - jnp.where(safe, dlse, 0.0) * LOG2E

    exts = _seg_extents(seg_starts, T)
    work_q = _build_schedule(seg_starts, exts, seg_qlens, seg_kvlens,
                             block_q, block_kv, causal,
                             keep_block=keep_block)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)

    def q_index(h, i, w, s):
        return (0, h, w[i, 0], 0)

    def kv_index(h, i, w, s):
        return (0, h // group, w[i, 1], 0)

    dq = pl.pallas_call(
        functools.partial(_varlen_dq_kernel, causal=causal,
                          block_q=block_q, block_kv=block_kv,
                          dropout_p=dropout_p, T=T),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(Hq, work_q.shape[0]),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, D), q_index),
                pl.BlockSpec((1, 1, block_kv, D), kv_index),
                pl.BlockSpec((1, 1, block_kv, D), kv_index),
                pl.BlockSpec((1, 1, block_q, D), q_index),
                pl.BlockSpec((1, 1, block_q, 1), q_index),
                pl.BlockSpec((1, 1, block_q, 1), q_index),
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, D), q_index),
            scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((1, Hq, T, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray(work_q), seed_arr, q, k_p, v, do, lse, delta)

    work_kv = _build_schedule(seg_starts, exts, seg_qlens, seg_kvlens,
                              block_q, block_kv, causal,
                              kv_major=True, group=group,
                              keep_block=keep_block)

    def q_index2(hkv, i, w, s):
        return (0, hkv * group + w[i, 7], w[i, 0], 0)

    def kv_index2(hkv, i, w, s):
        return (0, hkv, w[i, 1], 0)

    dk, dv = pl.pallas_call(
        functools.partial(_varlen_dkdv_kernel, causal=causal,
                          scale=softmax_scale,
                          block_q=block_q, block_kv=block_kv,
                          group=group, dropout_p=dropout_p, T=T),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(Hkv, work_kv.shape[0]),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, D), q_index2),
                pl.BlockSpec((1, 1, block_kv, D), kv_index2),
                pl.BlockSpec((1, 1, block_kv, D), kv_index2),
                pl.BlockSpec((1, 1, block_q, D), q_index2),
                pl.BlockSpec((1, 1, block_q, 1), q_index2),
                pl.BlockSpec((1, 1, block_q, 1), q_index2),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, block_kv, D), kv_index2),
                pl.BlockSpec((1, 1, block_kv, D), kv_index2),
            ),
            scratch_shapes=[
                pltpu.VMEM((block_kv, D), jnp.float32),
                pltpu.VMEM((block_kv, D), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, Hkv, T, D), k.dtype),
            jax.ShapeDtypeStruct((1, Hkv, T, D), v.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray(work_kv), seed_arr, q, k_p, v, do, lse, delta)
    return dq, dk, dv


# ---------------------------- public wrapper ------------------------------

def _mask_keep_fn(mask_bits):
    """Rebuild a keep_block callable from the hashable mask encoding
    (n_kv_blocks, per-q-block row bitmasks as ints) carried in the
    custom_vjp nondiff meta. None means dense (no filter)."""
    if mask_bits is None:
        return None
    _, rows = mask_bits

    def keep(s, jq, jk):
        return bool((rows[jq] >> jk) & 1)

    return keep


def encode_block_mask(block_mask) -> Tuple[int, Tuple[int, ...]]:
    """Encode a bool [n_q_blocks, n_kv_blocks] array as a hashable
    (n_kv_blocks, row-bitmask-ints) tuple for the custom_vjp meta."""
    m = np.asarray(block_mask, bool)
    assert m.ndim == 2, "block_mask must be [n_q_blocks, n_kv_blocks]"
    rows = tuple(int(sum(1 << j for j in range(m.shape[1]) if m[i, j]))
                 for i in range(m.shape[0]))
    return (int(m.shape[1]), rows)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _varlen_core(meta, q, k, v, seed):
    (o, lse), _ = _varlen_core_fwd(meta, q, k, v, seed)
    return o, lse


def _varlen_core_fwd(meta, q, k, v, seed):
    starts, qlens, kvlens, causal, scale, bq, bkv, dropout_p, mask = meta
    o, lse = flash_attn_varlen_forward(
        q, k, v, np.asarray(starts), qlens, kvlens,
        causal=causal, softmax_scale=scale, block_q=bq, block_kv=bkv,
        dropout_p=dropout_p, seed=seed, keep_block=_mask_keep_fn(mask))
    return (o, lse), (q, k, v, o, lse, seed)


def _varlen_core_bwd(meta, res, cot):
    starts, qlens, kvlens, causal, scale, bq, bkv, dropout_p, mask = meta
    q, k, v, o, lse, seed = res
    do, dlse = cot
    # dlse is the cotangent of the [1, H, T, 1] lse output — already shaped
    # like lse itself.
    dlse4 = jnp.where(jnp.isfinite(lse) & jnp.isfinite(dlse), dlse, 0.0)
    grads = flash_attn_varlen_backward(
        q, k, v, do, o, lse, np.asarray(starts), qlens, kvlens,
        causal=causal, softmax_scale=scale, block_q=bq, block_kv=bkv,
        dropout_p=dropout_p, seed=seed, dlse=dlse4,
        keep_block=_mask_keep_fn(mask))
    return grads + (np.zeros(seed.shape, dtype=jax.dtypes.float0),)


_varlen_core.defvjp(_varlen_core_fwd, _varlen_core_bwd)


def flash_attn_varlen_func(
    q: jax.Array,               # [T, Hq, D] or [1, T, Hq, D] packed tokens
    k: jax.Array,               # [T, Hkv, D]
    v: jax.Array,
    cu_seqlens: Sequence[int],  # [B+1] STATIC packed segment boundaries
    seqlens: Optional[Sequence[int]] = None,  # true lens (default: from cu)
    causal: bool = False,
    softmax_scale: Optional[float] = None,
    block_q: int = 512,
    block_kv: int = 512,
    return_lse: bool = False,
    dropout_p: float = 0.0,
    dropout_seed: Optional[int] = None,
    dropout_rng: Optional[jax.Array] = None,
):
    """Zero-waste varlen attention over a PACKED token stream — the
    reference's varlen mode (`src/forward/caller.py:44-63`) with the packing
    contract made explicit: segment boundaries are static host knowledge
    (fixed-token-budget packing, the standard TPU input-pipeline shape), so
    the kernel schedule contains exactly the blocks that carry real work —
    no idle grid steps for padding, unlike the lens-clamped
    `attention_mask` path which pays a fixed cost per skipped block.

    `cu_seqlens` are the ALIGNED segment starts (multiples of
    max(block_q, block_kv); see `pack_padded_batch`) plus the total T;
    `seqlens` give each segment's true length (defaults to the full
    aligned extent). Differentiable; segments attend only within
    themselves, causally if requested.
    """
    squeeze = q.ndim == 3
    if squeeze:
        q, k, v = (x[None] for x in (q, k, v))
    B = len(cu_seqlens) - 1
    starts = tuple(int(s) for s in cu_seqlens[:-1])
    T = int(cu_seqlens[-1])
    assert q.shape[1] == T, (q.shape, T)
    if seqlens is None:
        seqlens = [int(cu_seqlens[i + 1] - cu_seqlens[i]) for i in range(B)]
    seqlens = tuple(int(l) for l in seqlens)
    D = q.shape[-1]
    scale = (float(softmax_scale) if softmax_scale is not None
             else default_softmax_scale(D))
    align = max(block_q, block_kv)
    assert all(s % align == 0 for s in starts) and T % align == 0, (
        "packed segment starts must be aligned to max(block_q, block_kv); "
        "use pack_padded_batch")

    Dp = round_up_to_multiple(D, 128)
    out_dtype = q.dtype
    if q.dtype == jnp.float16:
        q, k, v = (x.astype(jnp.float32) for x in (q, k, v))

    def to_bhsd(x):
        x = jnp.transpose(x, (0, 2, 1, 3))
        if Dp != D:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, Dp - D)))
        return x

    if dropout_p > 0.0:
        if dropout_seed is not None:
            seed = jnp.asarray(dropout_seed, jnp.int32)
        elif dropout_rng is not None:
            seed = jax.random.randint(
                dropout_rng, (), 0, jnp.iinfo(jnp.int32).max, jnp.int32)
        else:
            raise ValueError(
                "dropout_p > 0 requires dropout_seed or dropout_rng "
                "(flash_attn_func's seed contract)."
            )
    else:
        seed = jnp.asarray(
            dropout_seed if dropout_seed is not None else 0, jnp.int32)

    meta = (starts, seqlens, seqlens, causal, scale, block_q, block_kv,
            float(dropout_p), None)
    o, lse = _varlen_core(meta, to_bhsd(q), to_bhsd(k), to_bhsd(v), seed)
    out = jnp.transpose(o[:, :, :, :D], (0, 2, 1, 3)).astype(out_dtype)
    if squeeze:
        out = out[0]
    if return_lse:
        return (out, lse[:, :, :, 0] if not squeeze else lse[0, :, :, 0])
    return out


def flash_attn_blocksparse_func(
    q: jax.Array,               # [B, S, Hq, D]
    k: jax.Array,               # [B, S, Hkv, D]
    v: jax.Array,
    block_mask,                 # STATIC bool [ceil(S/bq), ceil(S/bkv)]
    causal: bool = False,
    softmax_scale: Optional[float] = None,
    block_q: int = 512,
    block_kv: int = 512,
    return_lse: bool = False,
    dropout_p: float = 0.0,
    dropout_seed: Optional[int] = None,
    dropout_rng: Optional[jax.Array] = None,
):
    """Block-sparse attention (BigBird/Longformer/splash-style): softmax runs
    over exactly the (q block, kv block) pairs whose `block_mask` entry is
    True (intersected with the causal lower triangle when `causal`). The
    mask is STATIC host knowledge — like the reference's packing layout —
    so filtered pairs never enter the sequential TPU grid at all: the cost
    is proportional to the number of LIVE blocks, not S^2. Shares the
    work-list kernels with `flash_attn_varlen_func` (the reference's varlen
    machinery generalized: a varlen segment layout IS a block mask).

    q rows whose every block is masked out return zeros with lse = -inf and
    propagate zero gradients — same convention as fully-padded rows.
    Differentiable (fwd+bwd), deterministic, GQA via Hq % Hkv == 0.
    """
    B, S, Hq, D = q.shape
    Hkv = k.shape[2]
    assert k.shape == (B, S, Hkv, D) and v.shape == k.shape
    assert Hq % Hkv == 0
    align = max(block_q, block_kv)
    S_pad = round_up_to_multiple(S, align)
    m = np.asarray(block_mask, bool)
    nq_b, nkv_b = S_pad // block_q, S_pad // block_kv
    assert m.shape == (nq_b, nkv_b) or m.shape == (
        (S + block_q - 1) // block_q, (S + block_kv - 1) // block_kv), (
        f"block_mask {m.shape} != ({nq_b}, {nkv_b})")
    if m.shape != (nq_b, nkv_b):   # padded tail blocks: dead anyway
        mm = np.zeros((nq_b, nkv_b), bool)
        mm[:m.shape[0], :m.shape[1]] = m
        m = mm
    scale = (float(softmax_scale) if softmax_scale is not None
             else default_softmax_scale(D))

    out_dtype = q.dtype
    if q.dtype == jnp.float16:
        q, k, v = (x.astype(jnp.float32) for x in (q, k, v))
    Dp = round_up_to_multiple(D, 128)

    def pack(x):
        # [B, S, H, D] -> packed [1, H, B*S_pad, D] (consecutive segments)
        x = jnp.transpose(x, (0, 2, 1, 3))          # B H S D
        if S_pad != S:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, S_pad - S), (0, 0)))
        if Dp != D:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, Dp - D)))
        x = jnp.transpose(x, (1, 0, 2, 3))          # H B S D
        return x.reshape(1, x.shape[0], B * S_pad, Dp)

    if dropout_p > 0.0:
        if dropout_seed is not None:
            seed = jnp.asarray(dropout_seed, jnp.int32)
        elif dropout_rng is not None:
            seed = jax.random.randint(
                dropout_rng, (), 0, jnp.iinfo(jnp.int32).max, jnp.int32)
        else:
            raise ValueError(
                "dropout_p > 0 requires dropout_seed or dropout_rng "
                "(flash_attn_func's seed contract).")
    else:
        seed = jnp.asarray(
            dropout_seed if dropout_seed is not None else 0, jnp.int32)

    starts = tuple(b * S_pad for b in range(B))
    lens = (S,) * B
    meta = (starts, lens, lens, causal, scale, block_q, block_kv,
            float(dropout_p), encode_block_mask(m))
    o, lse = _varlen_core(meta, pack(q), pack(k), pack(v), seed)

    def unpack(x):
        # [1, H, B*S_pad, C] -> [B, S, H, C]
        H = x.shape[1]
        x = x.reshape(H, B, S_pad, x.shape[-1])[:, :, :S]
        return jnp.transpose(x, (1, 2, 0, 3))

    out = unpack(o)[..., :D].astype(out_dtype)
    if return_lse:
        return out, unpack(lse)[..., 0].transpose(0, 2, 1)
    return out
