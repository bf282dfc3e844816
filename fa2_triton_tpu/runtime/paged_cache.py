"""Paged KV-cache pool with block tables (vLLM-style) for serving.

Where `runtime/kv_cache.py` reserves max_seq per slot, the paged pool shares
physical pages among sequences: a slot holds only the pages its live tokens
need, so total cache memory scales with live tokens, not slots x max_seq.
The decode side is `ops/decode.py:paged_decode_attention` — page indirection
rides the BlockSpec index maps (scalar-prefetched tables), so only live pages
are ever DMA'd.

Page allocation is HOST control logic (free list + per-slot tables, mirrored
to a device array when they change); token writes are device scatters.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fa2_triton_tpu.ops.quant import quantize_tensor
from fa2_triton_tpu.utils import round_up_to_multiple


@dataclass(frozen=True)
class PagedCacheConfig:
    n_layers: int
    n_kv_heads: int
    head_dim: int                   # model head dim (pre-padding)
    page_size: int = 512            # tokens per page (lane-aligned)
    n_pages: int = 64               # physical pages in the shared pool
    n_slots: int = 8
    max_seq: int = 8192
    qdtype: Optional[Any] = None
    compute_dtype: Any = jnp.bfloat16

    @property
    def head_dim_padded(self) -> int:
        return round_up_to_multiple(self.head_dim, 128)

    @property
    def max_pages_per_slot(self) -> int:
        return -(-self.max_seq // self.page_size)


class PagedKVCache:
    """Shared page pool + per-slot block tables + free-list allocator."""

    def __init__(self, cfg: PagedCacheConfig):
        self.cfg = cfg
        shape = (cfg.n_pages, cfg.n_kv_heads, cfg.page_size, cfg.head_dim_padded)
        sshape = (cfg.n_pages, cfg.n_kv_heads, 1, cfg.page_size)
        vdtype = cfg.qdtype if cfg.qdtype is not None else cfg.compute_dtype
        self.pools: List[dict] = []
        for _ in range(cfg.n_layers):
            layer = {"k": jnp.zeros(shape, vdtype), "v": jnp.zeros(shape, vdtype)}
            if cfg.qdtype is not None:
                layer["k_scale"] = jnp.ones(sshape, jnp.float32)
                layer["v_scale"] = jnp.ones(sshape, jnp.float32)
            self.pools.append(layer)
        # Host-side control state. Page 0 is reserved as the clamp target for
        # unallocated table entries (never handed out).
        self._free: List[int] = list(range(cfg.n_pages - 1, 0, -1))
        self._tables = np.zeros((cfg.n_slots, cfg.max_pages_per_slot), np.int32)
        self._slot_pages: List[List[int]] = [[] for _ in range(cfg.n_slots)]
        self._tables_dev: Optional[jax.Array] = None

    # ------------------------- host allocation ---------------------------

    @property
    def free_pages(self) -> int:
        return len(self._free)

    def tables_device(self) -> jax.Array:
        if self._tables_dev is None:
            self._tables_dev = jnp.asarray(self._tables)
        return self._tables_dev

    def ensure_capacity(self, slot: int, n_tokens: int) -> None:
        """Allocate pages so `slot` can hold n_tokens; raises if pool full."""
        need = -(-n_tokens // self.cfg.page_size)
        assert need <= self.cfg.max_pages_per_slot, (n_tokens, "exceeds max_seq")
        pages = self._slot_pages[slot]
        while len(pages) < need:
            if not self._free:
                raise MemoryError("KV page pool exhausted")
            page = self._free.pop()
            self._tables[slot, len(pages)] = page
            pages.append(page)
            self._tables_dev = None

    def release(self, slot: int) -> None:
        """Return the slot's pages to the pool."""
        self._free.extend(reversed(self._slot_pages[slot]))
        self._slot_pages[slot] = []
        self._tables[slot] = 0
        self._tables_dev = None

    # ------------------------- device writes -----------------------------

    def write_tokens(
        self,
        layer_idx: int,
        new_k: jax.Array,     # [B, S_step, Hkv, D] — B == n_slots
        new_v: jax.Array,
        positions: jax.Array,  # [B] int32 — first token's seq position per slot
    ) -> None:
        """Scatter S_step new tokens per slot into the shared pool. Callers
        must have `ensure_capacity(slot, position + S_step)` first."""
        self.pools[layer_idx] = write_tokens_paged(
            self.pools[layer_idx], self.tables_device(), new_k, new_v,
            positions, self.cfg,
        )

    # ------------------------- decode read -------------------------------

    def attention(self, layer_idx: int, q: jax.Array, kv_lens: jax.Array,
                  softmax_scale: Optional[float] = None) -> jax.Array:
        """Paged decode attention for one layer; q [B, Hq, D] (padded D)."""
        from fa2_triton_tpu.ops.decode import paged_decode_attention

        pool = self.pools[layer_idx]
        return paged_decode_attention(
            q, pool["k"], pool["v"], self.tables_device(), kv_lens,
            pool.get("k_scale"), pool.get("v_scale"),
            softmax_scale=softmax_scale,
        )


def write_tokens_paged(
    pool: dict,
    tables: jax.Array,     # [n_slots, max_pages] int32
    new_k: jax.Array,      # [B, S_step, Hkv, D] — B == n_slots
    new_v: jax.Array,
    positions: jax.Array,  # [B] int32 — first token's seq position per slot
    cfg: PagedCacheConfig,
) -> dict:
    """Pure scatter of S_step new tokens per slot into the shared page pool
    (jit-friendly: pools/tables in, new pools out)."""
    B, S_step, Hkv, D = new_k.shape
    kT = jnp.transpose(new_k.astype(cfg.compute_dtype), (0, 2, 1, 3))
    vT = jnp.transpose(new_v.astype(cfg.compute_dtype), (0, 2, 1, 3))
    pad = cfg.head_dim_padded - D
    if pad:
        kT = jnp.pad(kT, ((0, 0), (0, 0), (0, 0), (0, pad)))
        vT = jnp.pad(vT, ((0, 0), (0, 0), (0, 0), (0, pad)))

    pos = positions[:, None] + jnp.arange(S_step, dtype=jnp.int32)[None, :]
    pages = jnp.take_along_axis(tables, pos // cfg.page_size, axis=1)  # [B, S]
    offs = pos % cfg.page_size

    out = dict(pool)
    flat = lambda x: x.reshape(-1, *x.shape[2:])
    p_f, o_f = pages.reshape(-1), offs.reshape(-1)
    # [B, H, S, Dp] -> token-major [B*S, H, Dp] for the scatter.
    k_tok = flat(jnp.transpose(kT, (0, 2, 1, 3)))
    v_tok = flat(jnp.transpose(vT, (0, 2, 1, 3)))
    if cfg.qdtype is not None:
        kq, ks = quantize_tensor(k_tok, cfg.qdtype)   # [N, H, Dp], [N, H, 1]
        vq, vs = quantize_tensor(v_tok, cfg.qdtype)
        out["k"] = pool["k"].at[p_f, :, o_f, :].set(kq)
        out["v"] = pool["v"].at[p_f, :, o_f, :].set(vq)
        out["k_scale"] = pool["k_scale"].at[p_f, :, 0, o_f].set(ks[..., 0])
        out["v_scale"] = pool["v_scale"].at[p_f, :, 0, o_f].set(vs[..., 0])
    else:
        out["k"] = pool["k"].at[p_f, :, o_f, :].set(k_tok)
        out["v"] = pool["v"].at[p_f, :, o_f, :].set(v_tok)
    return out
