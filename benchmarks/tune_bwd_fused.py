"""Sweep the fused single-launch backward (`flash_attn_backward_fused`)
block sizes on the real chip. Usage:
    python benchmarks/tune_bwd_fused.py [--causal] [--seqlen N]
Prints per-config bwd-only ms and the implied fwd+bwd TFLOP/s (fwd timed
once with the production table).
"""
from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")  # run from the repo root: python benchmarks/...

import jax
import jax.numpy as jnp

from fa2_triton_tpu.ops.flash_bwd import (
    flash_attn_backward, flash_attn_backward_fused,
)
from fa2_triton_tpu.ops.flash_fwd import flash_attn_forward
from fa2_triton_tpu.ops.tuning import choose_block_sizes
from fa2_triton_tpu.utils.benchmarking import device_time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--causal", action="store_true")
    ap.add_argument("--seqlen", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--head-dim", type=int, default=128)
    args = ap.parse_args()
    B, H, S, D = args.batch, args.heads, args.seqlen, args.head_dim
    causal = args.causal
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (B, H, S, D), jnp.bfloat16) * 0.5
    k = jax.random.normal(ks[1], (B, H, S, D), jnp.bfloat16) * 0.5
    v = jax.random.normal(ks[2], (B, H, S, D), jnp.bfloat16) * 0.5
    do = jax.random.normal(ks[3], (B, H, S, D), jnp.bfloat16)
    lens = jnp.broadcast_to(jnp.array([[S, S]], jnp.int32), (B, 2))
    scalars = jnp.array([[0, 0, 0, 0]], jnp.int32)
    scale = D ** -0.5

    blocks = choose_block_sizes(S, S, D, causal=causal)
    common = dict(causal=causal, softmax_scale=scale, seqlen_q_real=S,
                  seqlen_k_real=S, static_skip=True)

    def fwd(q, k, v):
        return flash_attn_forward(
            q, k, v, lens, scalars, None,
            block_q=blocks.block_q, block_kv=blocks.block_kv,
            unroll_kv=blocks.unroll_kv, **common)

    o, lse = fwd(q, k, v)
    t_fwd = device_time(fwd, q, k, v, iters=10)
    flops_f = 4 * B * H * S * S * D * (0.5 if causal else 1.0)
    print(f"fwd ({blocks.block_q},{blocks.block_kv}): {t_fwd*1e3:.3f} ms "
          f"{flops_f/t_fwd/1e12:.1f} TFLOP/s", flush=True)

    def report(name, fn):
        try:
            t = device_time(fn, q, k, v, do, o, lse, iters=8)
        except Exception as e:
            print(f"  {name}: FAILED {str(e)[:120]}", flush=True)
            return
        tf_bwd = 2.5 * flops_f / t / 1e12
        tf_tot = 3.5 * flops_f / (t + t_fwd) / 1e12
        print(f"  {name}: {t*1e3:.3f} ms bwd={tf_bwd:.1f} "
              f"fwd+bwd={tf_tot:.1f} TFLOP/s", flush=True)

    def two_pass(q, k, v, do, o, lse):
        return flash_attn_backward(
            q, k, v, do, o, lse, lens, scalars, None,
            block_q=blocks.block_q_bwd, block_kv=blocks.block_kv_bwd,
            unroll=blocks.unroll_bwd, **common)

    report(f"two-pass ({blocks.block_q_bwd},{blocks.block_kv_bwd},"
           f"u{blocks.unroll_bwd})", two_pass)

    for bq in (256, 512, 1024):
        for bkv in {min(2048, S), min(4096, S), S}:
            if S % bkv or S % bq:
                continue
            for sub in (256, 512, 1024):
                if bkv % sub:
                    continue
                for u in (1, 2):
                    for zz in ((False, True) if causal and bkv == S
                               else (False,)):
                        def fused(q, k, v, do, o, lse, bq=bq, bkv=bkv,
                                  sub=sub, u=u, zz=zz):
                            return flash_attn_backward_fused(
                                q, k, v, do, o, lse, lens, scalars,
                                block_q=bq, block_kv=bkv, sub_kv=sub,
                                unroll=u, zigzag=zz, **common)
                        report(f"fused bq={bq} bkv={bkv} sub={sub} u={u}"
                               + (" ZZ" if zz else ""), fused)


if __name__ == "__main__":
    main()
