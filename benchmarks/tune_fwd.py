"""Sweep production forward-kernel block sizes on TPU.

Usage: python benchmarks/tune_fwd.py [--causal] [--seqlen N]
Feeds `fa2_triton_tpu/ops/tuning.py`.
"""
from __future__ import annotations

import argparse
import functools
import sys

import jax.numpy as jnp

sys.path.insert(0, ".")

from bench import attention_flops, make_inputs  # noqa: E402
from fa2_triton_tpu import flash_attn_func  # noqa: E402
from fa2_triton_tpu.ops.tuning import BlockSizes  # noqa: E402
from fa2_triton_tpu.utils.benchmarking import device_time  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--causal", action="store_true")
    ap.add_argument("--seqlen", type=int, default=4096)
    ap.add_argument("--bias", action="store_true")
    ap.add_argument("--head-dim", type=int, default=128)
    ap.add_argument("--heads", type=int, default=32)
    args = ap.parse_args()

    B, S, H, D = 4, args.seqlen, args.heads, args.head_dim
    q, k, v = make_inputs(B, S, S, H, H, D, jnp.bfloat16)
    bias = None
    if args.bias:
        import jax
        bias = jax.random.normal(jax.random.PRNGKey(9), (1, 1, S, S),
                                 jnp.float32) * 0.1
    flops = attention_flops(B, H, S, S, D, args.causal)

    configs = []
    for bq in (256, 512, 1024, 2048):
        for bkv in (512, 1024, 2048, 4096, 8192):
            if bq * bkv > 1024 * 4096 or bkv > S or bq > S:
                continue
            for u in (1, 2, 4, 8):
                if bkv % (u * 128):
                    continue
                configs.append((bq, bkv, u))

    best = None
    for bq, bkv, u in configs:
        bs = BlockSizes(block_q=bq, block_kv=bkv, block_q_bwd=bq,
                        block_kv_bwd=bkv, unroll_kv=u)
        fn = functools.partial(flash_attn_func, attention_bias=bias,
                               causal=args.causal, block_sizes=bs)
        try:
            t = device_time(fn, q, k, v, iters=10)
        except Exception as e:
            print(f"bq={bq:5d} bkv={bkv:5d} u={u}: FAIL {str(e)[:80]}",
                  flush=True)
            continue
        tf = flops / t / 1e12
        print(f"bq={bq:5d} bkv={bkv:5d} u={u}: {t*1e3:7.3f} ms {tf:6.1f} TFLOP/s",
              flush=True)
        if best is None or tf > best[0]:
            best = (tf, bq, bkv, u)
    print("BEST:", best, flush=True)


if __name__ == "__main__":
    main()
