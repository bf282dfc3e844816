"""Tune-on-miss: one-shot micro-sweep when the tuning table has no entry.

The reference's `triton.autotune` (`/root/reference/src/forward/kernel.py:35-53`)
covers ANY shape automatically because Triton recompiles per config at
runtime. The TPU analog is split: `bench.py --tune` sweeps the production
shapes offline, and — when `FA2_TUNE_ON_MISS=1` — this module closes the
remaining gap by sweeping a small candidate list the FIRST time an unswept
(chip, kind, head_dim, seqlen-bucket) key is dispatched, persisting the
winner so every later process skips the sweep.

The sweep runs eagerly on the current device (a few kernel compiles,
~1-3 min once per key) — acceptable for a one-time offline cost, which is
why it is opt-in via the env var rather than default-on for serving paths.
"""
from __future__ import annotations

import sys
from typing import Optional, Tuple

# Candidate lists per kind. Small on purpose: the goal is "never run a
# pathological config on a new chip", not an exhaustive search (use
# `bench.py --tune` for that).
_FWD_DENSE = ((512, 4096, 4), (512, 2048, 4), (256, 2048, 4), (256, 1024, 1))
_FWD_CAUSAL = ((512, 512, 1), (1024, 1024, 1), (256, 256, 1))
_BWD_DENSE = ((512, 4096, 1024, 2), (512, 2048, 512, 2), (256, 2048, 512, 2))
_BWD_CAUSAL = ((512, 4096, 512, 1), (512, 2048, 512, 1), (256, 2048, 256, 1))
_STRIP = ((512, 8), (512, 4), (1024, 4), (256, 8))


def _inputs(S: int, D: int, B: int = 2, H: int = 16):
    import jax
    import jax.numpy as jnp

    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (B, H, S, D), jnp.bfloat16) * 0.5
    k = jax.random.normal(ks[1], (B, H, S, D), jnp.bfloat16) * 0.5
    v = jax.random.normal(ks[2], (B, H, S, D), jnp.bfloat16) * 0.5
    do = jax.random.normal(ks[3], (B, H, S, D), jnp.bfloat16) * 0.5
    lens = jnp.broadcast_to(jnp.array([[S, S]], jnp.int32), (B, 2))
    scal = jnp.array([[0, 0, 0, 0]], jnp.int32)
    return q, k, v, do, lens, scal


def measure_config(kind: str, causal: bool, head_dim: int, seqlen: int,
                   config: Tuple[int, ...]) -> float:
    """Median per-call seconds of one kernel config on the current device.

    Raises on compile failure (VMEM overflow etc.) — callers treat that as
    "candidate ineligible".
    """
    import functools

    from fa2_triton_tpu.utils.benchmarking import device_time

    S, D = seqlen, head_dim
    q, k, v, do, lens, scal = _inputs(S, D)
    scale = D ** -0.5

    if kind == "fwd":
        from fa2_triton_tpu.ops.flash_fwd import flash_attn_forward

        bq, bkv, u = config
        return device_time(functools.partial(
            flash_attn_forward, lens=lens, scalars=scal, bias=None,
            causal=causal, softmax_scale=scale, block_q=min(bq, S),
            block_kv=min(bkv, S), unroll_kv=u,
            seqlen_q_real=S, seqlen_k_real=S, static_skip=True),
            q, k, v, iters=8)

    if kind in ("fused_bwd", "strip_fwd", "strip_bwd"):
        from fa2_triton_tpu.ops.flash_fwd import (
            flash_attn_forward, flash_attn_forward_causal_strip,
        )

        if kind == "strip_fwd":
            sub, wide = config
            return device_time(functools.partial(
                flash_attn_forward_causal_strip, lens=lens, scalars=scal,
                softmax_scale=scale, sub=sub, wide=wide,
                seqlen_q_real=S, seqlen_k_real=S), q, k, v, iters=8)

        o, lse = flash_attn_forward(
            q, k, v, lens, scal, None, causal=causal, softmax_scale=scale,
            seqlen_q_real=S, seqlen_k_real=S, static_skip=True)
        if kind == "fused_bwd":
            from fa2_triton_tpu.ops.flash_bwd import flash_attn_backward_fused

            bq, bkv, sub, u = config
            return device_time(functools.partial(
                flash_attn_backward_fused, lens=lens, scalars=scal,
                causal=causal, softmax_scale=scale, static_skip=True,
                block_q=min(bq, S), block_kv=min(bkv, S),
                sub_kv=min(sub, S), unroll=u,
                seqlen_q_real=S, seqlen_k_real=S),
                q, k, v, do, o, lse, iters=8)

        from fa2_triton_tpu.ops.flash_bwd import (
            flash_attn_backward_causal_strip,
        )

        sub, wide = config
        return device_time(functools.partial(
            flash_attn_backward_causal_strip, lens=lens, scalars=scal,
            softmax_scale=scale, sub=sub, wide=wide,
            seqlen_q_real=S, seqlen_k_real=S),
            q, k, v, do, o, lse, iters=8)

    raise ValueError(f"no micro-sweep recipe for kind {kind!r}")


def candidates(kind: str, causal: bool, head_dim: int,
               seqlen: int) -> Tuple[Tuple[int, ...], ...]:
    if kind == "fwd":
        return _FWD_CAUSAL if causal else _FWD_DENSE
    if kind == "fused_bwd":
        # f32 dk/dv strip scratch bounds block_kv (see tuning.choose_fused_bwd).
        bkv_max = 4 * 1024 * 1024 // (2 * 4 * max(head_dim, 128))
        base = _BWD_CAUSAL if causal else _BWD_DENSE
        return tuple((bq, min(bkv, bkv_max), min(sub, bkv_max), u)
                     for bq, bkv, sub, u in base)
    if kind in ("strip_fwd", "strip_bwd"):
        budget = 8192 * 128 if kind == "strip_fwd" else 4096 * 128
        if seqlen * head_dim > budget:
            return ()
        return tuple((sub, wide) for sub, wide in _STRIP
                     if seqlen % sub == 0 and seqlen >= 2 * sub)
    return ()  # diag/rect split pieces: fall back to the baked-in prior


def run_micro_sweep(kind: str, causal: bool, head_dim: int,
                    seqlen: int) -> Optional[Tuple[int, ...]]:
    """Sweep `candidates` on the current device; return the winner or None."""
    best, best_t = None, float("inf")
    for cfg in candidates(kind, causal, head_dim, seqlen):
        try:
            t = measure_config(kind, causal, head_dim, seqlen, cfg)
        except Exception as e:  # compile/VMEM failures: skip candidate
            print(f"fa2 tune-on-miss: {kind} S={seqlen} {cfg} failed: "
                  f"{str(e)[:80]}", file=sys.stderr)
            continue
        print(f"fa2 tune-on-miss: {kind} causal={causal} D={head_dim} "
              f"S={seqlen} {cfg}: {t * 1e3:.2f} ms", file=sys.stderr)
        if t < best_t:
            best, best_t = cfg, t
    return best
