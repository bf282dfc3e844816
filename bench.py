"""Benchmark driver — mirrors the reference protocol
(`/root/reference/benchmarks/targetted_bench.py`: B=4, H=32, S=4096, D=128,
fwd-only, median of repeated runs) on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is the speedup over XLA's native (dense, unfused) attention on
the same chip — the analog of the reference's "Pytorch" comparison kernel
(`benchmarks/utils.py:24`).

Usage:
  python bench.py                 # headline: fwd bf16 non-causal
  python bench.py --suite        # full table (fwd/bwd, causal, seqlens)
"""
from __future__ import annotations

import argparse
import functools
import json
import math
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _timeit(fn, *args, warmup=10, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(warmup - 1):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


def attention_flops(B, Hq, Sq, Sk, D, causal, fwd_and_bwd=False):
    # 2 matmuls fwd (QK^T and PV), 5 bwd; 2 flops per MAC.
    f = 4 * B * Hq * Sq * Sk * D
    if causal:
        f = f / 2
    return f * (1 + 2.5) if fwd_and_bwd else f


def make_inputs(B, Sq, Sk, Hq, Hkv, D, dtype, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (B, Sq, Hq, D), dtype) * 0.5
    k = jax.random.normal(ks[1], (B, Sk, Hkv, D), dtype) * 0.5
    v = jax.random.normal(ks[2], (B, Sk, Hkv, D), dtype) * 0.5
    return q, k, v


def xla_native_attention(q, k, v, causal):
    """Dense unfused attention — the 'Pytorch oracle' analog baseline."""
    B, Sq, Hq, D = q.shape
    Sk, Hkv = k.shape[1], k.shape[2]
    kr = jnp.repeat(k, Hq // Hkv, axis=2)
    vr = jnp.repeat(v, Hq // Hkv, axis=2)
    s = jnp.einsum("bthd,bshd->bhts", q * (1.0 / math.sqrt(D)), kr)
    if causal:
        mask = jnp.tril(jnp.ones((Sq, Sk), bool), k=Sk - Sq)
        s = jnp.where(mask, s, -jnp.inf)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum("bhts,bshd->bthd", p, vr)


def bench_config(B, Sq, Sk, Hq, Hkv, D, dtype, causal, mode="fwd",
                 include_baseline=True):
    from fa2_triton_tpu import flash_attn_func

    q, k, v = make_inputs(B, Sq, Sk, Hq, Hkv, D, dtype)

    if mode == "fwd":
        ours = jax.jit(functools.partial(flash_attn_func, causal=causal))
        base = jax.jit(functools.partial(xla_native_attention, causal=causal))
        t_ours = _timeit(ours, q, k, v)
        t_base = _timeit(base, q, k, v) if include_baseline else float("nan")
        flops = attention_flops(B, Hq, Sq, Sk, D, causal)
    else:
        do = jax.random.normal(jax.random.PRNGKey(7), q.shape, dtype)

        def grad_ours(q, k, v, do):
            out, vjp = jax.vjp(functools.partial(flash_attn_func, causal=causal), q, k, v)
            return out, vjp(do)

        def grad_base(q, k, v, do):
            out, vjp = jax.vjp(functools.partial(xla_native_attention, causal=causal), q, k, v)
            return out, vjp(do)

        t_ours = _timeit(jax.jit(grad_ours), q, k, v, do)
        t_base = _timeit(jax.jit(grad_base), q, k, v, do) if include_baseline else float("nan")
        flops = attention_flops(B, Hq, Sq, Sk, D, causal, fwd_and_bwd=True)

    return {
        "ms": t_ours * 1e3,
        "baseline_ms": t_base * 1e3,
        "tflops": flops / t_ours / 1e12,
        "baseline_tflops": flops / t_base / 1e12,
        "speedup": t_base / t_ours,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", action="store_true", help="run the full table")
    ap.add_argument("--causal", action="store_true")
    ap.add_argument("--mode", default="fwd", choices=["fwd", "fwdbwd"])
    ap.add_argument("--seqlen", type=int, default=4096)
    args = ap.parse_args()

    if args.suite:
        rows = []
        for causal in (False, True):
            for mode in ("fwd", "fwdbwd"):
                for S in (1024, 4096, 8192):
                    r = bench_config(4, S, S, 32, 32, 128, jnp.bfloat16, causal, mode)
                    rows.append((causal, mode, S, r))
                    print(f"causal={causal} {mode} S={S}: {r['ms']:.3f} ms "
                          f"{r['tflops']:.1f} TFLOP/s (baseline {r['baseline_ms']:.3f} ms, "
                          f"speedup {r['speedup']:.2f}x)", file=sys.stderr)

    # Headline (reference protocol): B=4 H=32 S=4096 D=128, fwd-only,
    # non-causal (`benchmarks/targetted_bench.py:11-19`), bf16 on TPU.
    r = bench_config(4, args.seqlen, args.seqlen, 32, 32, 128, jnp.bfloat16,
                     args.causal, args.mode)
    print(json.dumps({
        "metric": f"attn_{args.mode}_tflops_per_s_S{args.seqlen}"
                  + ("_causal" if args.causal else ""),
        "value": round(r["tflops"], 2),
        "unit": "TFLOP/s",
        "vs_baseline": round(r["speedup"], 3),
    }))


if __name__ == "__main__":
    main()
