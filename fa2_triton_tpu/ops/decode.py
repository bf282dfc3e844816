"""Single-step decode attention over (optionally quantized) KV caches.

The serving hot path: one new query token per sequence attends to that
sequence's KV-cache prefix. Decode is HBM-bandwidth-bound (the cost is
streaming the KV cache), so this kernel

* batches each KV head's whole GQA query-head group into the tile rows
  (the MXU tile is tiny but bandwidth is the roof),
* takes per-sequence lengths as a PREFETCHED SCALAR so the KV BlockSpec
  index map clamps past-the-end block indices — no DMA is issued beyond each
  sequence's actual KV length (continuous batching with ragged lengths reads
  only live bytes),
* dequantizes INT8/FP8 K/V tiles in VMEM, fusing dequant into the attention
  math. Scales live TRANSPOSED in HBM — [B, Hkv, 1, S_max] — so a block is a
  contiguous (1, block_kv) row vector that broadcasts along lanes onto the
  score columns: column scales commute with the QK^T contraction
  (qk[i,j]*s_j) and with PV ((p o s_v) @ v), so dequant costs two cheap
  row-vector multiplies and no relayouts. A [.., S, 1] layout would tile as
  (block_kv, 1) — 128x VMEM waste and scatter-DMA descriptors.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fa2_triton_tpu.utils import (
    LOG2E,
    dot_precision,
    default_softmax_scale,
    interpret_mode,
    pad_to_multiple,
    round_up_to_multiple,
)

MASK_LOG2 = -1e30

# fp8 KV caches are carried through the kernel as int8 BITS: Mosaic's layout
# and convert lowering for float8-typed buffers is ~10x slower than int8 on
# v5e (measured: 7.5 ms vs 0.77 ms for the same S=8192 decode step), while a
# same-width host bitcast is free. The in-kernel dequant below reconstructs
# bf16 from e4m3 bits with integer VPU ops — bit-exact vs
# `astype(bfloat16)` on all non-NaN e4m3 values (quantize_tensor never emits
# NaN), including denormals (value = mant * 2^-9) and signed zero.
_F8_KINDS = {}
try:
    _F8_KINDS[jnp.dtype(jnp.float8_e4m3fn)] = "e4m3"
except TypeError:  # pragma: no cover - ancient jax
    pass


def _dequant_e4m3_bits(i8, dtype):
    """int8 e4m3fn bit pattern -> float (exact, NaN-free inputs)."""
    i = i8.astype(jnp.int32) & 0xFF
    mag = jax.lax.bitwise_and(i, 0x7F)
    sign = jax.lax.shift_right_logical(i, 7)
    # Normals: bf16 exponent = e4m3 exponent - 7 + 127; mantissa 3 -> 7 bits.
    bits = (jax.lax.shift_left(mag, 4) + (120 << 7)) | jax.lax.shift_left(sign, 15)
    val = jax.lax.bitcast_convert_type(bits.astype(jnp.uint16), jnp.bfloat16)
    den = mag.astype(jnp.bfloat16) * jnp.bfloat16(2.0 ** -9)
    den = jnp.where(sign == 1, -den, den)
    return jnp.where(mag < 8, den, val).astype(dtype)


def _dequant(x, dtype, kind):
    return (_dequant_e4m3_bits(x, dtype) if kind == "e4m3"
            else x.astype(dtype))


def _decode_kernel(
    lens_ref,                    # prefetched [B] int32 (valid kv length)
    q_ref,                       # (1, 1, Gp, Dp) compute dtype
    k_ref,                       # (1, 1, bkv, Dp) qdtype or compute dtype
    v_ref,
    ks_ref,                      # (1, 1, 1, bkv) f32 — only when quantized
    vs_ref,
    o_ref,                       # (1, 1, Gp, Dp) compute dtype
    m_scr, l_scr, acc_scr,
    *,
    scale: float,
    block_kv: int,
    quantized: bool,
    window_left: int = -1,   # Mistral-style: attend to the last window_left+1
                             # positions only (-1 = full prefix)
    softcap: float = 0.0,    # Gemma2-style tanh score capping (0 = off)
    qkind: str = "int",      # "int" = astype dequant; "e4m3" = fp8 bits in
                             # an int8 buffer, integer-twiddle dequant
):
    b, h, ik = (pl.program_id(i) for i in range(3))
    kv_len = lens_ref[b]
    last = jnp.maximum((kv_len - 1) // block_kv, 0)
    if window_left >= 0:
        first = jnp.maximum((kv_len - 1 - window_left) // block_kv, 0)
    else:
        first = 0

    @pl.when(ik == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, MASK_LOG2)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(jnp.logical_and(first <= ik, ik <= last))
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        if quantized:
            k = _dequant(k, q.dtype, qkind)
        s2 = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=dot_precision(q, k),
        )
        if quantized:
            # Column scales commute with the contraction: qk[i,j] * s_k[j].
            s2 = s2 * ks_ref[0, 0]
        if softcap > 0.0:
            # Cap in NATURAL units (the oracle/FA2 convention:
            # cap * tanh(s * scale / cap)), then convert to log2 domain.
            s2 = softcap * jnp.tanh(s2 * (scale / softcap)) * LOG2E
        else:
            s2 = s2 * (scale * LOG2E)
        col = ik * block_kv + jax.lax.broadcasted_iota(
            jnp.int32, (q.shape[0], block_kv), 1
        )
        keep = col < kv_len
        if window_left >= 0:
            # The (single) query row sits at position kv_len - 1.
            keep = jnp.logical_and(keep, col >= kv_len - 1 - window_left)
        s2 = jnp.where(keep, s2, MASK_LOG2)
        m_prev = m_scr[...]
        m_new = jnp.maximum(m_prev, jnp.max(s2, axis=-1, keepdims=True))
        alpha = jnp.exp2(m_prev[:, :1] - m_new[:, :1])
        p = jnp.exp2(s2 - m_new[:, :1])
        m_scr[...] = m_new
        l_scr[...] = l_scr[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        v = v_ref[0, 0]
        if quantized:
            # Row scales of V fold into P: (p o s_v) @ v_q.
            p = p * vs_ref[0, 0]
            v = _dequant(v, q.dtype, qkind)
        acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot_general(
            p.astype(q.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_precision(v),
        )

    @pl.when(ik == last)
    def _finalize():
        l = l_scr[:, :1]
        o = acc_scr[...] * jnp.where(l > 0.0, 1.0 / l, 0.0)
        o_ref[0, 0] = o.astype(o_ref.dtype)


def _decode_kernel_noquant(lens_ref, q_ref, k_ref, v_ref, o_ref,
                           m_scr, l_scr, acc_scr, **kw):
    return _decode_kernel(lens_ref, q_ref, k_ref, v_ref, None, None,
                          o_ref, m_scr, l_scr, acc_scr, **kw)


def decode_attention(
    q: jax.Array,                 # [B, Hq, D] — one new token per sequence
    k_cache: jax.Array,           # [B, Hkv, S_max, D] (qdtype or compute dtype)
    v_cache: jax.Array,
    kv_lens: jax.Array,           # [B] int32 — valid tokens per sequence
    k_scale: Optional[jax.Array] = None,   # [B, Hkv, 1, S_max] f32 if quantized
    v_scale: Optional[jax.Array] = None,
    *,
    softmax_scale: Optional[float] = None,
    block_kv: int = 4096,
    window_left: int = -1,
    softcap: float = 0.0,
    debug_interpret: Optional[bool] = None,
) -> jax.Array:
    """Returns attention output [B, Hq, D]. Cache layout is BHSD with S_max
    a multiple of block_kv and D a multiple of 128 (allocate caches padded —
    see `runtime/kv_cache.py`); scales transposed [B, Hkv, 1, S_max].
    `window_left >= 0` = sliding-window decode: only the last window_left+1
    positions are attended (blocks before the window are never DMA'd)."""
    B, Hq, D = q.shape
    Hkv, S_max = k_cache.shape[1], k_cache.shape[2]
    group = Hq // Hkv
    assert Hq % Hkv == 0
    quantized = k_scale is not None
    scale = softmax_scale if softmax_scale is not None else default_softmax_scale(D)
    qkind = _F8_KINDS.get(k_cache.dtype, "int")
    if qkind != "int":
        # Same-width bitcast (free): the kernel reads fp8 BITS from an
        # int8-typed buffer — Mosaic's fp8 buffer handling is ~10x slower.
        k_cache = jax.lax.bitcast_convert_type(k_cache, jnp.int8)
        v_cache = jax.lax.bitcast_convert_type(v_cache, jnp.int8)

    # Shrink the block until it divides the cache extent (e.g. S_max=6144
    # with the 4096 default steps down to 3072) — callers with oddly padded
    # caches must not crash, they just get a smaller block.
    block_kv = min(block_kv, round_up_to_multiple(S_max, 128))
    while S_max % block_kv != 0:
        block_kv -= 128
    assert block_kv >= 128 and D % 128 == 0, (
        "allocate caches padded: S_max % 128 == 0, D % 128 == 0"
    )
    nkv = S_max // block_kv
    Gp = max(8, round_up_to_multiple(group, 8))

    # [B, Hq, D] -> [B, Hkv, Gp, D] (group-major rows per KV head).
    qg = q.reshape(B, Hkv, group, D)
    qg = pad_to_multiple(qg, Gp, 2)

    def _clamp(ik, lens_ref, b):
        last = jnp.maximum((lens_ref[b] - 1) // block_kv, 0)
        ik = jnp.minimum(ik, last)
        if window_left >= 0:
            first = jnp.maximum((lens_ref[b] - 1 - window_left) // block_kv, 0)
            ik = jnp.maximum(ik, first)
        return ik

    def kv_index(b, h, ik, lens_ref):
        return (b, h, _clamp(ik, lens_ref, b), 0)

    def scale_index(b, h, ik, lens_ref):
        return (b, h, 0, _clamp(ik, lens_ref, b))

    in_specs = [
        pl.BlockSpec((1, 1, Gp, D), lambda b, h, ik, lens: (b, h, 0, 0)),
        pl.BlockSpec((1, 1, block_kv, D), kv_index),
        pl.BlockSpec((1, 1, block_kv, D), kv_index),
    ]
    args = [qg, k_cache, v_cache]
    if quantized:
        assert k_scale.shape == (B, Hkv, 1, S_max), k_scale.shape
        in_specs += [
            pl.BlockSpec((1, 1, 1, block_kv), scale_index),
            pl.BlockSpec((1, 1, 1, block_kv), scale_index),
        ]
        args += [k_scale, v_scale]
        kernel_fn = _decode_kernel
    else:
        kernel_fn = _decode_kernel_noquant
    kernel_fn = functools.partial(kernel_fn, qkind=qkind)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Hkv, nkv),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, Gp, D), lambda b, h, ik, lens: (b, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((Gp, 128), jnp.float32),
            pltpu.VMEM((Gp, 128), jnp.float32),
            pltpu.VMEM((Gp, D), jnp.float32),
        ],
    )
    interpret = interpret_mode() if debug_interpret is None else debug_interpret
    o = pl.pallas_call(
        functools.partial(
            kernel_fn, scale=scale, block_kv=block_kv, quantized=quantized,
            window_left=window_left, softcap=softcap,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, Gp, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(kv_lens.astype(jnp.int32), *args)
    return o[:, :, :group, :].reshape(B, Hq, D)


# ------------------------- paged decode (block tables) --------------------

def _decode_kernel_paged(lens_ref, tables_ref, q_ref, k_ref, v_ref,
                         ks_ref, vs_ref, o_ref, m_scr, l_scr, acc_scr, **kw):
    # tables_ref is consumed by the BlockSpec index maps only.
    return _decode_kernel(lens_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
                          o_ref, m_scr, l_scr, acc_scr, **kw)


def _decode_kernel_paged_noquant(lens_ref, tables_ref, q_ref, k_ref, v_ref,
                                 o_ref, m_scr, l_scr, acc_scr, **kw):
    return _decode_kernel(lens_ref, q_ref, k_ref, v_ref, None, None,
                          o_ref, m_scr, l_scr, acc_scr, **kw)


def paged_decode_attention(
    q: jax.Array,                 # [B, Hq, D] — one new token per sequence
    k_pool: jax.Array,            # [n_pages, Hkv, page_size, D]
    v_pool: jax.Array,
    block_tables: jax.Array,      # [B, max_pages] int32 physical page ids
    kv_lens: jax.Array,           # [B] int32 — valid tokens per sequence
    k_scale: Optional[jax.Array] = None,   # [n_pages, Hkv, 1, page_size]
    v_scale: Optional[jax.Array] = None,
    *,
    softmax_scale: Optional[float] = None,
    window_left: int = -1,
    softcap: float = 0.0,
    debug_interpret: Optional[bool] = None,
) -> jax.Array:
    """Decode attention over a PAGED KV cache (vLLM-style block tables).

    Sequence position p of batch b lives at physical page
    `block_tables[b, p // page_size]`, row `p % page_size`. The page
    indirection happens in the BlockSpec index maps via a prefetched scalar
    table — the kernel body is byte-identical to the contiguous
    `decode_attention`; no gather materializes, each grid step DMAs exactly
    one live page, and pages past each sequence's length are never fetched
    (index clamped to the last live page, compute skipped).
    """
    B, Hq, D = q.shape
    n_pages, Hkv, page_size = k_pool.shape[0], k_pool.shape[1], k_pool.shape[2]
    max_pages = block_tables.shape[1]
    group = Hq // Hkv
    assert Hq % Hkv == 0 and D % 128 == 0 and page_size % 128 == 0
    quantized = k_scale is not None
    scale = softmax_scale if softmax_scale is not None else default_softmax_scale(D)
    qkind = _F8_KINDS.get(k_pool.dtype, "int")
    if qkind != "int":
        k_pool = jax.lax.bitcast_convert_type(k_pool, jnp.int8)
        v_pool = jax.lax.bitcast_convert_type(v_pool, jnp.int8)
    Gp = max(8, round_up_to_multiple(group, 8))

    qg = q.reshape(B, Hkv, group, D)
    qg = pad_to_multiple(qg, Gp, 2)

    def _clamp(ik, lens_ref, b):
        last = jnp.maximum((lens_ref[b] - 1) // page_size, 0)
        ik = jnp.minimum(ik, last)
        if window_left >= 0:
            first = jnp.maximum((lens_ref[b] - 1 - window_left) // page_size, 0)
            ik = jnp.maximum(ik, first)
        return ik

    def kv_index(b, h, ik, lens_ref, tables_ref):
        page = tables_ref[b, _clamp(ik, lens_ref, b)]
        return (page, h, 0, 0)

    in_specs = [
        pl.BlockSpec((1, 1, Gp, D), lambda b, h, ik, lens, tabs: (b, h, 0, 0)),
        pl.BlockSpec((1, 1, page_size, D), kv_index),
        pl.BlockSpec((1, 1, page_size, D), kv_index),
    ]
    args = [qg, k_pool, v_pool]
    if quantized:
        assert k_scale.shape == (n_pages, Hkv, 1, page_size), k_scale.shape

        def scale_index(b, h, ik, lens_ref, tables_ref):
            page = tables_ref[b, _clamp(ik, lens_ref, b)]
            return (page, h, 0, 0)

        in_specs += [
            pl.BlockSpec((1, 1, 1, page_size), scale_index),
            pl.BlockSpec((1, 1, 1, page_size), scale_index),
        ]
        args += [k_scale, v_scale]
        kernel_fn = _decode_kernel_paged
    else:
        kernel_fn = _decode_kernel_paged_noquant
    kernel_fn = functools.partial(kernel_fn, qkind=qkind)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, Hkv, max_pages),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, Gp, D), lambda b, h, ik, lens, tabs: (b, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((Gp, 128), jnp.float32),
            pltpu.VMEM((Gp, 128), jnp.float32),
            pltpu.VMEM((Gp, D), jnp.float32),
        ],
    )
    interpret = interpret_mode() if debug_interpret is None else debug_interpret
    o = pl.pallas_call(
        functools.partial(
            kernel_fn, scale=scale, block_kv=page_size, quantized=quantized,
            window_left=window_left, softcap=softcap,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hkv, Gp, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(kv_lens.astype(jnp.int32), block_tables.astype(jnp.int32), *args)
    return o[:, :, :group, :].reshape(B, Hq, D)
