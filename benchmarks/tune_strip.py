"""Sweep the whole-strip causal forward vs zigzag at one shape.
Usage: python benchmarks/tune_strip.py [--seqlen N]
"""
from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from fa2_triton_tpu.ops.flash_fwd import (
    flash_attn_forward, causal_strip_ok)
from fa2_triton_tpu.utils.benchmarking import device_time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seqlen", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--head-dim", type=int, default=128)
    args = ap.parse_args()
    B, H, S, D = args.batch, args.heads, args.seqlen, args.head_dim
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, H, S, D), jnp.bfloat16) * 0.5
    k = jax.random.normal(ks[1], (B, H, S, D), jnp.bfloat16) * 0.5
    v = jax.random.normal(ks[2], (B, H, S, D), jnp.bfloat16) * 0.5
    lens = jnp.broadcast_to(jnp.array([[S, S]], jnp.int32), (B, 2))
    scalars = jnp.array([[0, 0, 0, 0]], jnp.int32)
    flops = 4 * B * H * S * S * D * 0.5  # causal effective

    def report(name, fn):
        try:
            t = device_time(fn, q, k, v, iters=10)
        except Exception as e:
            print(f"  {name}: FAILED {str(e)[:160]}", flush=True)
            return
        print(f"  {name}: {t*1e3:.3f} ms {flops/t/1e12:.1f} TFLOP/s",
              flush=True)

    common = dict(causal=True, softmax_scale=D ** -0.5, seqlen_q_real=S,
                  seqlen_k_real=S, static_skip=True)

    from fa2_triton_tpu.ops.flash_fwd import flash_attn_forward_causal_strip
    for sub in (256, 512, 1024):
        if S % sub or S < 2 * sub:
            continue
        for wide in (1, 2, 4, 8):
            def strip(q, k, v, sub=sub, wide=wide):
                return flash_attn_forward_causal_strip(
                    q, k, v, lens, scalars, softmax_scale=D ** -0.5,
                    sub=sub, wide=wide, seqlen_q_real=S, seqlen_k_real=S)
            report(f"strip sub={sub} wide={wide}", strip)

    for bq in (512, 1024):
        for bkv in (512, 1024):
            if S % bq or S % bkv or S // bq < 2:
                continue
            for u in (1, 2):
                if (bkv // u) % 128:
                    continue

                def zz(q, k, v, bq=bq, bkv=bkv, u=u):
                    return flash_attn_forward(
                        q, k, v, lens, scalars, None, zigzag=True,
                        causal_strip=False, tri_square=False,
                        block_q=bq, block_kv=bkv, unroll_kv=u, **common)

                report(f"zigzag bq={bq} bkv={bkv} u={u}", zz)

    def auto(q, k, v):
        return flash_attn_forward(
            q, k, v, lens, scalars, None,
            block_q=512, block_kv=512, **common)

    report("auto-dispatch", auto)
    print("strip_ok:", causal_strip_ok(True, True, (-1, -1), None, False,
                                       S, S, S, S, D))


if __name__ == "__main__":
    main()
