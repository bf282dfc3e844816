"""Split-schedule causal sweep: diagonal-leaf and rect variants, fwd + bwd.

Measures the pieces of the divide-and-conquer causal schedule on the current
chip to pick defaults for `ops/tuning.py` / the dispatchers:

  * diag fwd/bwd leaf kernels: sub in {256, 512} x unroll x leaves_per_step
  * split fwd/bwd with leaf_t overrides (n = S/T in {2, 4})
  * the competing whole-path routes (zigzag, strip, fused) for context

Usage: python benchmarks/tune_split.py [--seqlen 4096] [--bwd]
"""
from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from bench import make_inputs  # noqa: E402
from fa2_triton_tpu.utils.benchmarking import device_time  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seqlen", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--head-dim", type=int, default=128)
    ap.add_argument("--bwd", action="store_true")
    ap.add_argument("--fwd", action="store_true")
    args = ap.parse_args()
    B, H, D, S = args.batch, args.heads, args.head_dim, args.seqlen
    do_fwd = args.fwd or not args.bwd
    do_bwd = args.bwd or not args.fwd

    from fa2_triton_tpu.ops.flash_fwd import (
        _causal_split_forward,
        flash_attn_forward,
        flash_attn_forward_causal_diag,
    )
    from fa2_triton_tpu.ops.flash_bwd import (
        _causal_split_backward,
        flash_attn_backward,
        flash_attn_backward_causal_diag,
    )
    from fa2_triton_tpu.utils import LOG2E

    q, k, v = make_inputs(B, S, S, H, H, D, jnp.bfloat16)
    qT, kT, vT = (jnp.transpose(x, (0, 2, 1, 3)) for x in (q, k, v))
    do = jax.random.normal(jax.random.PRNGKey(7), qT.shape, jnp.bfloat16)
    lens = jnp.broadcast_to(jnp.array([[S, S]], jnp.int32), (B, 2))
    scal = jnp.array([[0, 0, 0, 0]], jnp.int32)
    scale = D ** -0.5
    cflops = 4 * B * H * S * S * D / 2           # causal-effective
    bflops = cflops * 2.5

    def run(name, fn, *xs, iters=10, flops=cflops):
        try:
            t = device_time(fn, *xs, iters=iters)
        except Exception as e:
            print(f"  {name}: FAILED {str(e)[:100]}", flush=True)
            return None
        r = flops / t / 1e12
        print(f"  {name}: {r:.1f} TFLOP/s eff ({t*1e3:.2f} ms)", flush=True)
        return r

    if do_fwd:
        print(f"== causal fwd S={S} B={B} H={H} D={D} ==", flush=True)
        for route, kw in (
            ("split(default)", dict()),
            ("zigzag", dict(causal_split=False, causal_strip=False,
                            tri_square=False, block_q=1024, block_kv=1024,
                            unroll_kv=1)),
            ("strip", dict(causal_split=False, causal_strip=True,
                           tri_square=False)),
        ):
            run(f"route {route}",
                lambda q, k, v, kw=kw: flash_attn_forward(
                    q, k, v, lens, scal, None, causal=True,
                    softmax_scale=scale, seqlen_q_real=S, seqlen_k_real=S,
                    static_skip=True, **kw), qT, kT, vT)

        for T in (2048, 1024):
            if S % T or S // T < 2:
                continue
            run(f"split leaf_t={T}",
                lambda q, k, v, T=T: _causal_split_forward(
                    q, k, v, lens, scal, softmax_scale=scale,
                    seqlen_q_real=S, seqlen_k_real=S, leaf_t=T),
                qT, kT, vT)

        # Diagonal-leaves launch in isolation (half the causal FLOPs).
        for T in (2048, 1024):
            if S % T:
                continue
            dflops = 4 * B * H * (S // T) * T * T * D / 2 / 2
            for sub in (256, 512):
                if T % sub:
                    continue
                for u in (1, 2, 4):
                    if u > T // sub:
                        continue
                    for lps in (1, 2):
                        if (S // T) % lps or lps * T * D > 2048 * 128:
                            continue
                        run(f"diag_fwd T={T} sub={sub} u={u} lps={lps}",
                            lambda q, k, v, T=T, sub=sub, u=u, lps=lps:
                            flash_attn_forward_causal_diag(
                                q, k, v, lens, scal, T=T,
                                softmax_scale=scale, sub=sub, unroll=u,
                                leaves_per_step=lps,
                                seqlen_q_real=S, seqlen_k_real=S),
                            qT, kT, vT, flops=dflops)

    if do_bwd:
        print(f"== causal bwd S={S} B={B} H={H} D={D} ==", flush=True)
        o, lse = flash_attn_forward(
            qT, kT, vT, lens, scal, None, causal=True, softmax_scale=scale,
            seqlen_q_real=S, seqlen_k_real=S, static_skip=True)

        run("route default", lambda q, k, v, do, o, lse:
            flash_attn_backward(
                q, k, v, do, o, lse, lens, scal, None, causal=True,
                softmax_scale=scale, seqlen_q_real=S, seqlen_k_real=S,
                static_skip=True), qT, kT, vT, do, o, lse,
            iters=8, flops=bflops)

        for T in (2048, 1024):
            if S % T or S // T < 2:
                continue
            run(f"split_bwd leaf_t={T}",
                lambda q, k, v, do, o, lse, T=T: _causal_split_backward(
                    q, k, v, do, o, lse, lens, scal, softmax_scale=scale,
                    seqlen_q_real=S, seqlen_k_real=S, leaf_t=T),
                qT, kT, vT, do, o, lse, iters=8, flops=bflops)

        # Diag bwd leaves in isolation (half the causal bwd FLOPs).
        c = scale * LOG2E
        k_p = (kT.astype(jnp.float32) * c).astype(kT.dtype)
        delta = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32),
                        axis=-1, keepdims=True)
        for T in (2048, 1024):
            if S % T:
                continue
            dflops = 4 * B * H * (S // T) * T * T * D / 2 / 2 * 2.5
            for sub in (256, 512):
                if T % sub:
                    continue
                for lps in (1, 2):
                    if (S // T) % lps or lps * T * D > 2048 * 128:
                        continue
                    run(f"diag_bwd T={T} sub={sub} lps={lps}",
                        lambda q, k, v, do, lse, delta, T=T, sub=sub,
                        lps=lps: flash_attn_backward_causal_diag(
                            q, k, v, do, lse, delta, lens, scal, T=T,
                            softmax_scale=scale, sub=sub,
                            leaves_per_step=lps,
                            seqlen_q_real=S, seqlen_k_real=S),
                        qT, k_p, vT, do, lse, delta, iters=8, flops=dflops)


if __name__ == "__main__":
    main()
