"""Sweep the zigzag causal forward schedule vs the diag-split schedule.
Usage: python benchmarks/tune_zigzag.py [--seqlen N]
"""
from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from fa2_triton_tpu.ops.flash_fwd import flash_attn_forward
from fa2_triton_tpu.ops.tuning import choose_block_sizes
from fa2_triton_tpu.utils.benchmarking import device_time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seqlen", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--heads", type=int, default=32)
    args = ap.parse_args()
    B, H, S, D = args.batch, args.heads, args.seqlen, 128
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
            print(f"  {name}: FAILED {str(e)[:100]}", flush=True)
            return
        print(f"  {name}: {t*1e3:.3f} ms {flops/t/1e12:.1f} TFLOP/s",
              flush=True)

    blocks = choose_block_sizes(S, S, D, causal=True)
    common = dict(causal=True, softmax_scale=D ** -0.5, seqlen_q_real=S,
                  seqlen_k_real=S, static_skip=True)

    def table(q, k, v):
        return flash_attn_forward(
            q, k, v, lens, scalars, None, zigzag=False,
            block_q=blocks.block_q, block_kv=blocks.block_kv,
            unroll_kv=blocks.unroll_kv, **common)

    report(f"table diag-split ({blocks.block_q},{blocks.block_kv},"
           f"u{blocks.unroll_kv})", table)

    for bq in (256, 512, 1024):
        for bkv in (256, 512, 1024, 2048):
            if S % bq or S % bkv or S // bq < 2:
                continue
            for u in (1, 2, 4):
                if (bkv // u) % 128 or bkv // u < 128:
                    continue

                def zz(q, k, v, bq=bq, bkv=bkv, u=u):
                    return flash_attn_forward(
                        q, k, v, lens, scalars, None, zigzag=True,
                        block_q=bq, block_kv=bkv, unroll_kv=u, **common)

                report(f"zigzag bq={bq} bkv={bkv} u={u}", zz)


if __name__ == "__main__":
    main()
