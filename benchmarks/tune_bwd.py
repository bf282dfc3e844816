"""Sweep production backward-kernel block sizes on TPU.

Usage: python benchmarks/tune_bwd.py [--causal] [--seqlen N]
"""
from __future__ import annotations

import argparse
import functools
import sys

import jax
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
    ap.add_argument("--head-dim", type=int, default=128)
    ap.add_argument("--heads", type=int, default=32)
    args = ap.parse_args()


    B, S, H, D = 4, args.seqlen, args.heads, args.head_dim
    q, k, v = make_inputs(B, S, S, H, H, D, jnp.bfloat16)
    do = jax.random.normal(jax.random.PRNGKey(7), q.shape, jnp.bfloat16)
    flops = attention_flops(B, H, S, S, D, args.causal, fwd_and_bwd=True)

    # Forward blocks pinned to the tuned optimum; sweep the backward.
    from fa2_triton_tpu.ops.tuning import choose_block_sizes
    _t = choose_block_sizes(S, S, D, causal=args.causal)
    fwd_bq, fwd_bkv = _t.block_q, _t.block_kv

    configs = []
    for bq in (256, 512, 1024):
        for bkv in (256, 512, 1024, 2048):
            if bq * bkv > 1024 * 1024 or bkv > S or bq > S:
                continue
            for u in (1, 2, 4):
                if bq % (u * 128) or bkv % (u * 128):
                    continue
                configs.append((bq, bkv, u))

    best = None
    for bq, bkv, u in configs:
        # fwd/bwd blocks must mutually divide for shared padding.
        if max(fwd_bq, bq) % min(fwd_bq, bq) or max(fwd_bkv, bkv) % min(fwd_bkv, bkv):
            continue
        bs = BlockSizes(block_q=fwd_bq, block_kv=fwd_bkv, block_q_bwd=bq,
                        block_kv_bwd=bkv, unroll_bwd=u)
        attn = functools.partial(flash_attn_func, causal=args.causal,
                                 block_sizes=bs)

        def fn(q, k, v, do):
            out, vjp = jax.vjp(attn, q, k, v)
            return (out,) + vjp(do)

        try:
            t = device_time(fn, q, k, v, do, iters=8)
        except Exception as e:
            print(f"bq={bq:5d} bkv={bkv:5d} u={u}: FAIL {str(e)[:80]}",
                  flush=True)
            continue
        tf = flops / t / 1e12
        print(f"bq={bq:5d} bkv={bkv:5d} u={u}: {t*1e3:7.3f} ms {tf:6.1f} TFLOP/s",
              flush=True)
        if best is None or tf > best[0]:
            best = (round(tf, 1), bq, bkv, u)
    print("BEST:", best, flush=True)


if __name__ == "__main__":
    main()
