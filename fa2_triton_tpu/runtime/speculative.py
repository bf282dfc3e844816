"""Greedy speculative decoding (draft-and-verify) on the KV-cache kernels.

A small draft model proposes `gamma` tokens autoregressively; the target
model verifies all of them in ONE cached forward over gamma+1 positions
(`flash_attn_with_kv_cache` exercises the forward kernel's global position
offsets, `ops/attention.py:275`). The longest proposal prefix matching the
target's greedy choices is accepted, plus the target's own next token — so
every round emits between 1 and gamma+1 tokens while costing one target
pass. **Output is exactly the target model's greedy decode** (verification
compares argmaxes), which the tests pin against the token-by-token path.

TPU economics: single-token decode is HBM-bound (the whole KV cache streams
per token), and a gamma+1-row verify pass streams the same bytes — so when
the draft is cheap and acceptance is decent, tokens/s approaches
(accepted+1)x the sequential rate. Rollback is free by construction: caches
are fixed buffers addressed by an explicit length, so rejecting tokens just
means not advancing `len` (stale rows are overwritten by the next write at
that position — the same contract the serving engine relies on).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp

from fa2_triton_tpu.models.llama import (
    LlamaConfig, forward_with_cache, init_kv_cache,
)
from fa2_triton_tpu.ops.attention import flash_attn_with_kv_cache
from fa2_triton_tpu.utils import next_power_of_2


def _cached_attn(q, ck, cv, kv_len):
    return flash_attn_with_kv_cache(q, ck, cv, kv_len)


@dataclass
class SpecStats:
    rounds: int = 0
    proposed: int = 0
    accepted: int = 0
    target_calls: int = 0       # verify passes (excl. prefill)
    draft_calls: int = 0
    emitted: int = 0

    @property
    def acceptance_rate(self) -> float:
        return self.accepted / self.proposed if self.proposed else 0.0

    @property
    def tokens_per_target_call(self) -> float:
        return self.emitted / self.target_calls if self.target_calls else 0.0


class SpeculativeDecoder:
    """Single-sequence greedy speculative decoding.

    `generate(prompt, max_new_tokens)` returns (tokens, SpecStats); the
    token stream equals the target model's greedy decode. Jitted widths are
    bounded: pow-2 prefill buckets, width-1 draft steps, width-(gamma+1)
    verify steps.
    """

    def __init__(
        self,
        target_params, target_cfg: LlamaConfig,
        draft_params, draft_cfg: LlamaConfig,
        gamma: int = 4,
        max_seq: int = 2048,
        eos_id: Optional[int] = None,
    ):
        assert gamma >= 1
        self.tp, self.tcfg = target_params, target_cfg
        self.dp, self.dcfg = draft_params, draft_cfg
        self.gamma = gamma
        self.max_seq = max_seq
        self.eos_id = eos_id
        self._jit_cache = {}

    def _step(self, width: int, cfg_tag: str):
        """Jitted cached forward for a fixed token width."""
        key = (width, cfg_tag)
        if key not in self._jit_cache:
            cfg = self.tcfg if cfg_tag == "t" else self.dcfg

            def f(params, tokens, caches, cache_len):
                logits, caches = forward_with_cache(
                    params, tokens, cfg, caches, cache_len, _cached_attn)
                return logits, caches

            self._jit_cache[key] = jax.jit(f, donate_argnums=(2,))
        return self._jit_cache[key]

    def generate(self, prompt: List[int], max_new_tokens: int):
        L = len(prompt)
        assert L + max_new_tokens + self.gamma + 1 <= self.max_seq
        t_caches = init_kv_cache(self.tcfg, 1, self.max_seq)
        d_caches = init_kv_cache(self.dcfg, 1, self.max_seq)
        stats = SpecStats()

        # Prefill both models on the (pow-2 padded) prompt.
        s_pad = max(64, next_power_of_2(L))
        padded = jnp.zeros((1, s_pad), jnp.int32).at[0, :L].set(
            jnp.asarray(prompt, jnp.int32))
        tl, t_caches = self._step(s_pad, "t")(
            self.tp, padded, t_caches, jnp.int32(0))
        dl, d_caches = self._step(s_pad, "d")(
            self.dp, padded, d_caches, jnp.int32(0))
        # Cache rows past L hold padding KV; lengths below never expose them.
        t_len = d_len = L
        last = int(jnp.argmax(tl[0, L - 1]))
        out = [last]

        draft1 = self._step(1, "d")
        verify = self._step(self.gamma + 1, "t")

        while len(out) < max_new_tokens and (
                self.eos_id is None or out[-1] != self.eos_id):
            # Draft proposes gamma tokens from the accepted state.
            proposals = []
            cur, dl_len = last, d_len
            for _ in range(self.gamma):
                dl, d_caches = draft1(
                    self.dp, jnp.asarray([[cur]], jnp.int32), d_caches,
                    jnp.int32(dl_len))
                cur = int(jnp.argmax(dl[0, 0]))
                proposals.append(cur)
                dl_len += 1
                stats.draft_calls += 1

            # Target verifies all proposals in one pass over gamma+1 rows.
            row = jnp.asarray([[last] + proposals], jnp.int32)
            tl, t_caches = verify(self.tp, row, t_caches, jnp.int32(t_len))
            greedy = [int(g) for g in jnp.argmax(tl[0], axis=-1)]
            stats.target_calls += 1
            stats.rounds += 1
            stats.proposed += self.gamma

            k = 0
            while k < self.gamma and proposals[k] == greedy[k]:
                k += 1
            stats.accepted += k
            new = proposals[:k] + [greedy[k]]
            if self.eos_id is not None and self.eos_id in new:
                new = new[: new.index(self.eos_id) + 1]
            new = new[: max_new_tokens - len(out)]
            out.extend(new)
            if k == self.gamma:
                # Full accept: the draft cache holds KV for
                # [last, d1..d_{gamma-1}] but not d_gamma (it was proposed,
                # never fed). Backfill it with one discarded draft step —
                # otherwise the claimed length covers a stale row and every
                # subsequent proposal round diverges.
                _, d_caches = draft1(
                    self.dp, jnp.asarray([[proposals[-1]]], jnp.int32),
                    d_caches, jnp.int32(dl_len))
                stats.draft_calls += 1
            # Advance to the accepted frontier; the target cache holds KV for
            # [last] + proposals — k+1 of those rows are now committed.
            t_len += k + 1
            d_len = t_len
            last = out[-1]

        stats.emitted = len(out)
        return out, stats


def greedy_reference(params, cfg: LlamaConfig, prompt: List[int],
                     max_new_tokens: int, max_seq: int = 2048,
                     eos_id: Optional[int] = None) -> List[int]:
    """Token-by-token greedy decode through the same cached path (the
    equivalence oracle for the speculative decoder)."""
    dec = SpeculativeDecoder(params, cfg, params, cfg, gamma=1,
                             max_seq=max_seq, eos_id=eos_id)
    caches = init_kv_cache(cfg, 1, max_seq)
    L = len(prompt)
    s_pad = max(64, next_power_of_2(L))
    padded = jnp.zeros((1, s_pad), jnp.int32).at[0, :L].set(
        jnp.asarray(prompt, jnp.int32))
    logits, caches = dec._step(s_pad, "t")(params, padded, caches,
                                           jnp.int32(0))
    cur = int(jnp.argmax(logits[0, L - 1]))
    out = [cur]
    step = dec._step(1, "t")
    n = L
    while len(out) < max_new_tokens and (eos_id is None or out[-1] != eos_id):
        logits, caches = step(params, jnp.asarray([[cur]], jnp.int32),
                              caches, jnp.int32(n))
        cur = int(jnp.argmax(logits[0, 0]))
        out.append(cur)
        n += 1
    return out
