"""Forward-kernel experiment lab: benchmark kernel body variants at the
headline config to guide tuning (not part of the library — results feed
`fa2_triton_tpu/ops/tuning.py` and kernel structure decisions).

Usage: python benchmarks/kernel_lab.py [--causal]
"""
from __future__ import annotations

import argparse
import functools
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from bench import make_inputs  # noqa: E402
from fa2_triton_tpu.utils.benchmarking import device_time  # noqa: E402

LOG2E = 1.4426950408889634
MASK_LOG2 = -1e30


def matmul_peak():
    """Calibrate the chip's practical bf16 MXU peak with a plain matmul."""
    n = 8192
    a = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (n, n), jnp.bfloat16)

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.bfloat16)

    t = device_time(mm, a, b, iters=10)
    return 2 * n**3 / t / 1e12


# --------------------------------------------------------------------------
# Variant kernels: all compute non-causal full attention on BHSD inputs
# padded to blocks; q is PRE-SCALED by scale*log2e on the host.
# --------------------------------------------------------------------------

def _kernel_base(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                 nkv, unroll):
    """unroll=1: current production structure. unroll>=2: split the KV tile
    into independent sub-chains so Mosaic can overlap MXU and VPU."""
    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, MASK_LOG2)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]
    bkv = k_ref.shape[2]
    sub = bkv // unroll
    ss = []
    for u in range(unroll):
        k = k_ref[0, 0, u * sub:(u + 1) * sub]
        ss.append(jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32))
    m_cur = functools.reduce(
        jnp.maximum, [jnp.max(s, axis=-1, keepdims=True) for s in ss])
    m_prev = m_scr[...]
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp2(m_prev[:, :1] - m_new[:, :1])
    lsum = None
    acc = acc_scr[...] * alpha
    for u in range(unroll):
        p = jnp.exp2(ss[u] - m_new[:, :1])
        lsum = jnp.sum(p, axis=-1, keepdims=True) if lsum is None else \
            lsum + jnp.sum(p, axis=-1, keepdims=True)
        v = v_ref[0, 0, u * sub:(u + 1) * sub]
        acc = acc + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    m_scr[...] = m_new
    l_scr[...] = l_scr[...] * alpha + lsum
    acc_scr[...] = acc

    @pl.when(ik == nkv - 1)
    def _():
        l = l_scr[:, :1]
        o_ref[0, 0] = (acc_scr[...] * (1.0 / l)).astype(o_ref.dtype)


def run_variant(q, k, v, *, bq, bkv, unroll, name):
    B, Hq, S, D = q.shape
    nq, nkv = S // bq, S // bkv
    kern = functools.partial(_kernel_base, nkv=nkv, unroll=unroll)

    def fwd(q, k, v):
        qs = (q * (D ** -0.5 * LOG2E)).astype(q.dtype)
        return pl.pallas_call(
            kern,
            grid=(B, Hq, nq, nkv),
            in_specs=[
                pl.BlockSpec((1, 1, bq, D), lambda b, h, i, j: (b, h, i, 0)),
                pl.BlockSpec((1, 1, bkv, D), lambda b, h, i, j: (b, h, j, 0)),
                pl.BlockSpec((1, 1, bkv, D), lambda b, h, i, j: (b, h, j, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, bq, D), lambda b, h, i, j: (b, h, i, 0)),
            out_shape=jax.ShapeDtypeStruct((B, Hq, S, D), q.dtype),
            scratch_shapes=[
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, D), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel",
                                     "arbitrary"),
            ),
        )(qs, k, v)

    flops = 4 * B * Hq * S * S * D
    # correctness spot-check vs xla
    from fa2_triton_tpu.other_implementations import xla_attention
    o = fwd(q, k, v)
    o_bshd = jnp.transpose(o, (0, 2, 1, 3))
    ref = xla_attention(*(jnp.transpose(x, (0, 2, 1, 3)) for x in (q, k, v)))
    err = float(jnp.max(jnp.abs(o_bshd.astype(jnp.float32) - ref.astype(jnp.float32))))
    t = device_time(fwd, q, k, v, iters=10)
    print(f"{name:34s} bq={bq:5d} bkv={bkv:5d} u={unroll}: "
          f"{t*1e3:7.3f} ms {flops/t/1e12:6.1f} TFLOP/s  maxerr={err:.2e}",
          flush=True)
    return flops / t / 1e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seqlen", type=int, default=4096)
    ap.add_argument("--peak", action="store_true")
    args = ap.parse_args()

    if args.peak:
        print(f"plain bf16 matmul peak: {matmul_peak():.1f} TFLOP/s", flush=True)

    B, S, H, D = 4, args.seqlen, 32, 128
    q, k, v = make_inputs(B, S, S, H, H, D, jnp.bfloat16)
    to_bhsd = lambda x: jnp.transpose(x, (0, 2, 1, 3))
    q, k, v = to_bhsd(q), to_bhsd(k), to_bhsd(v)

    for bq, bkv, unroll in [
        (1024, 1024, 1),
        (1024, 1024, 2),
        (512, 1024, 2),
        (512, 2048, 2),
        (512, 2048, 4),
        (1024, 2048, 2),
        (2048, 1024, 2),
        (512, 4096, 4),
        (256, 2048, 2),
    ]:
        try:
            run_variant(q, k, v, bq=bq, bkv=bkv, unroll=unroll,
                        name="prescaled")
        except Exception as e:
            print(f"bq={bq} bkv={bkv} u={unroll}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
