"""Static block-size selection for the Pallas attention kernels.

Plays the role of the reference's `triton.autotune` config lists + pruning
(`src/forward/kernel.py:35-59`, `src/backward/kernel.py:34-63`): on TPU the
grid is sequential and software-pipelined, so instead of a runtime autotune
sweep we keep a small static table keyed on (seqlen bucket, head_dim, dtype)
that is known to fit VMEM and keep the MXU fed. `bench.py --tune` can sweep
and override these.
"""
from __future__ import annotations

from dataclasses import dataclass

from fa2_triton_tpu.ops.autotune import lookup, warn_if_unswept
from fa2_triton_tpu.utils import round_up_to_multiple


@dataclass(frozen=True)
class BlockSizes:
    block_q: int
    block_kv: int
    # Backward passes use their own tiling.
    block_q_bwd: int
    block_kv_bwd: int
    # KV sub-tiles per forward block with independent MXU/VPU chains (the
    # kernel clamps to a lane-aligned divisor of block_kv).
    unroll_kv: int = 4
    # Sub-tiles per backward block (dq: KV split, dk/dv: Q split).
    unroll_bwd: int = 2

    def __post_init__(self):
        for v in (self.block_q, self.block_kv, self.block_q_bwd, self.block_kv_bwd):
            assert v % 128 == 0, "blocks must be lane-aligned (multiples of 128)"


def _waste_aware(seqlen: int, candidates, max_waste_frac: float = 0.125) -> int:
    """Largest candidate block whose pad-to-multiple waste stays small.

    Inputs are padded to a multiple of the block (`ops/attention.py`), and
    fully-padded blocks still burn MXU cycles, so a 4096 block on a 4100-long
    sequence would double the work. Candidates are powers of two, descending,
    which also keeps fwd/bwd blocks mutually divisible.
    """
    sp = round_up_to_multiple(max(seqlen, 1), 128)
    for cand in candidates:
        c = min(cand, sp)
        padded = round_up_to_multiple(sp, c)
        if padded - seqlen <= max(seqlen, 1) * max_waste_frac:
            return c
    return min(candidates[-1], sp)


def choose_block_sizes(seqlen_q: int, seqlen_k: int, head_dim_padded: int,
                       dtype_bits: int = 16, causal: bool = False,
                       has_bias: bool = False,
                       has_window: bool = False,
                       has_varlen: bool = False) -> BlockSizes:
    """Pick block sizes that fit comfortably in ~16MB VMEM with pipelining.

    Values from the v5e production-path sweeps at D=128
    (benchmarks/tune_fwd.py, tune_bwd_fused.py, tune_zigzag.py): forward
    non-causal peaks at (512, 4096) ~152 TFLOP/s (86% of the chip's
    practical matmul peak, benchmarks/kernel_lab.py --peak); causal S<=2048
    routes to the static-triangular kernel (89-98 TFLOP/s effective),
    S>=4096 to the zigzag schedule at (1024, 1024, u1) ~87; bias tiles
    (block_q x block_kv f32, double-buffered) force smaller blocks.
    """
    # Portability: the constants below are the v5e-swept prior; a persisted
    # per-chip table from `bench.py --tune` overrides them (ops/autotune.py).
    warn_if_unswept()
    # The swept tables (persisted and baked-in) assume 2-byte kernel I/O;
    # f32 I/O doubles every resident tile, so those configs overflow
    # Mosaic's 16M scoped-VMEM limit (measured: causal zigzag (1024, 1024,
    # u1) f32 at S=4096 -> 16.8M). Wide dtypes skip the lookup and get a
    # clamp at the end instead.
    if not (has_bias or has_window or has_varlen) and dtype_bits <= 16:
        ov = lookup("fwd", causal, head_dim_padded, max(seqlen_q, seqlen_k))
        if ov is not None:
            bq, bkv, u = ov
            bq = min(bq, round_up_to_multiple(max(seqlen_q, 1), 128))
            bkv = min(bkv, round_up_to_multiple(max(seqlen_k, 1), 128))
            if head_dim_padded <= 128:
                bq_b, bkv_b = (1024, 1024) if causal else (512, 2048)
                bq_b = min(bq_b, round_up_to_multiple(max(seqlen_q, 1), 128))
                bkv_b = min(bkv_b, round_up_to_multiple(max(seqlen_k, 1), 128))
                bq_b, bkv_b = _compatible(bq, bq_b), _compatible(bkv, bkv_b)
            else:
                bq_b = _divisor_block(bq, 256)
                bkv_b = _divisor_block(bkv, 256)
            return BlockSizes(block_q=bq, block_kv=bkv, block_q_bwd=bq_b,
                              block_kv_bwd=bkv_b, unroll_kv=u,
                              unroll_bwd=1 if causal else 2)
    # Budget shrinks as the (padded) head dim grows: acc/q/k/v tiles scale
    # linearly in head_dim, the s/p tile scales with block_q*block_kv.
    unroll_kv = 4
    # Swept per-chip variant entries (bench.py --tune sweeps bias/window
    # block choices at D=128) override the priors below.
    if dtype_bits <= 16 and not has_varlen and (has_bias or has_window):
        ov = lookup("fwd", causal, head_dim_padded,
                    max(seqlen_q, seqlen_k),
                    variant="bias" if has_bias else "window")
        if ov is not None:
            bq_v, bkv_v, u_v = ov
            bq_v = min(bq_v, round_up_to_multiple(max(seqlen_q, 1), 128))
            bkv_v = min(bkv_v, round_up_to_multiple(max(seqlen_k, 1), 128))
            return BlockSizes(block_q=bq_v, block_kv=bkv_v,
                              block_q_bwd=_divisor_block(bq_v, 512),
                              block_kv_bwd=_divisor_block(bkv_v, 512),
                              unroll_kv=u_v, unroll_bwd=1 if causal else 2)
    if head_dim_padded <= 128:
        if has_bias:
            bq, bkv = 512, _waste_aware(seqlen_k, (1024, 512, 256, 128))
        elif causal and has_window:
            # Window disables the zigzag/tri fast paths; the banded generic
            # schedule prefers wide KV strips.
            bq = _waste_aware(seqlen_q, (1024, 512, 256, 128))
            bkv = _waste_aware(seqlen_k, (2048, 1024, 512, 256, 128))
        elif causal:
            # Zigzag schedule (S >= 4096; shorter sequences bypass these via
            # the tri-square kernel): square aligned tiles so the diag mask
            # is the constant triangle, unroll 1.
            bq = _waste_aware(seqlen_q, (1024, 512, 256, 128))
            bkv = _waste_aware(seqlen_k, (1024, 512, 256, 128))
            unroll_kv = 1
        elif has_varlen:
            # Per-batch length clamping skips whole KV blocks; a whole-strip
            # block makes that all-or-nothing, so varlen batches trade a few
            # percent of peak (142 vs 152 TFLOP/s dense) for 1024-granular
            # skipping (bench.py --mode varlen: 1.66x at 50% padding for
            # this lens-clamp path; the packed work-list kernels in
            # ops/varlen.py measure 2.54x on the same batch).
            bkv = _waste_aware(seqlen_k, (1024, 512, 256, 128))
            bq = _waste_aware(seqlen_q, (512, 256, 128))
            if dtype_bits >= 32:
                bq, bkv = min(bq, 512), min(bkv, 512)
            return BlockSizes(block_q=bq, block_kv=bkv,
                              block_q_bwd=bq, block_kv_bwd=bkv,
                              unroll_kv=1, unroll_bwd=2)
        else:
            bkv = _waste_aware(seqlen_k, (4096, 2048, 1024, 512, 256, 128))
            # Keep the f32 score tile around 2M elements: (512, 4096),
            # (1024, 2048), (1024, 1024), ... The derived candidate must be
            # lane-aligned: _waste_aware can return non-power-of-2 bkv
            # (e.g. 3072 for seqlen 3000), so round down to a 128 multiple.
            bq_cand = max(128, min(1024, (512 * 4096) // bkv) // 128 * 128)
            bq = _waste_aware(seqlen_q, (bq_cand, 512, 256, 128))
            # Sub-tile unrolling only pays off on wide KV strips; at
            # (1024, 1024) it costs ~20% (v5e sweep: u1 142.6 vs u4 111.8).
            if bkv < 2048:
                unroll_kv = 1
    elif head_dim_padded <= 256:
        # v5e D=256 sweeps (benchmarks/tune_fwd.py --head-dim 256): the
        # bigger per-element MXU work beats D=128 — non-causal (256, 4096,
        # u8) 160 TFLOP/s; causal (1024, 1024, u2) zigzag 117 effective.
        if causal and not (has_bias or has_window):
            bq = _waste_aware(seqlen_q, (1024, 512, 256, 128))
            bkv = _waste_aware(seqlen_k, (1024, 512, 256, 128))
            unroll_kv = 2
        else:
            bq = 256
            bkv = _waste_aware(seqlen_k, (4096, 2048, 1024, 512, 256, 128))
            unroll_kv = 8
    else:
        bq, bkv = 128, 256
    if dtype_bits >= 32:
        # Halve the tile budget for f32 I/O (see the lookup note above):
        # causal keeps square (zigzag) tiles at 512; dense keeps a 2048-wide
        # strip with 1024-sub unrolled chains (~9M scoped, measured OK).
        bq = min(bq, 512)
        bkv = min(bkv, 512 if (causal or has_bias) else 2048)
        unroll_kv = min(unroll_kv, max(1, bkv // 1024))
    bq = min(bq, round_up_to_multiple(max(seqlen_q, 1), 128))
    bkv = min(bkv, round_up_to_multiple(max(seqlen_k, 1), 128))
    # Backward (v5e sweep, benchmarks/tune_bwd.py): (512, 2048, unroll 2)
    # non-causal ~127 fwd+bwd TFLOP/s, (1024, 1024, unroll 1) causal ~82.
    # Backward and forward blocks must mutually divide max(fwd, bwd) so one
    # padding serves both passes (all powers of two).
    if head_dim_padded <= 128:
        bq_b, bkv_b = (1024, 1024) if causal else (512, 2048)
        if dtype_bits >= 32:
            bq_b, bkv_b = 512, 512
        bq_b = min(bq_b, round_up_to_multiple(max(seqlen_q, 1), 128))
        bkv_b = min(bkv_b, round_up_to_multiple(max(seqlen_k, 1), 128))
        bq_b, bkv_b = _compatible(bq, bq_b), _compatible(bkv, bkv_b)
    else:
        bq_b = _divisor_block(bq, 256)
        bkv_b = _divisor_block(bkv, 256)
    return BlockSizes(block_q=bq, block_kv=bkv, block_q_bwd=bq_b,
                      block_kv_bwd=bkv_b, unroll_kv=unroll_kv,
                      unroll_bwd=1 if causal else 2)


def choose_fused_bwd(seqlen_q_pad: int, seqlen_k_pad: int,
                     head_dim_padded: int, causal: bool,
                     dtype_bytes: int = 2):
    """Config for the fused single-launch backward, or None to use the
    two-pass kernels. Values from the v5e sweeps (benchmarks/tune_bwd_fused.py,
    B=4 H=32 D=128 bf16): non-causal S=4096 -> (512, 4096, 1024, u2) 157
    TFLOP/s bwd-only (two-pass: 120); S=8192 -> 155-161 with 2-4 KV strips
    (dq partials are cheap); causal uses the zigzag schedule (auto in the
    launcher) with the same tiling.

    Returns (block_q, block_kv, sub_kv, unroll) or None.
    """
    if head_dim_padded > 256:
        return None  # unswept
    ov = lookup("fused_bwd", causal, head_dim_padded, seqlen_k_pad)
    if ov is not None:
        bq_o, bkv_o, sub_o, u_o = ov
        if (seqlen_q_pad % bq_o == 0 and seqlen_k_pad % bkv_o == 0
                and bkv_o % sub_o == 0):
            return bq_o, bkv_o, sub_o, u_o
    # KV strip: whole sequence when it fits the f32 dk/dv scratch budget
    # (2 * bkv * Dp * 4B <= 4MB -> 4096 at D=128, 2048 at D=256; the D=256
    # sweep confirms: fused (512, 2048, 512) = 148 TFLOP/s bwd vs 132
    # two-pass).
    bkv_max = 4 * 1024 * 1024 // (2 * 4 * head_dim_padded)
    if dtype_bytes >= 4:
        # f32 I/O doubles the resident q/do/k/v tiles; a (512, 3072, ...)
        # f32 launch measured 17.5M scoped VMEM vs Mosaic's 16M limit, and
        # (512, 2048, 512) f32 with two KV strips still lands 16.3M — so a
        # quarter of the bf16 strip budget.
        bkv_max //= 4
    if seqlen_k_pad <= bkv_max:
        bkv = seqlen_k_pad
    else:
        bkv = next((c for c in (4096, 2048, 1024)
                    if c <= bkv_max and seqlen_k_pad % c == 0), None)
        if bkv is None:
            return None
    bq = next((c for c in (512, 256, 128) if seqlen_q_pad % c == 0), None)
    if bq is None:
        return None
    # Intermediate (bq, sub) f32 tiles cap: bq*sub*Dp <= 2^26 elements*bytes
    # matches the observed compile envelope ((512,1024) OK at D=128, fails
    # at D=256 where (512,512)/(256,1024) are the best anyway).
    def _fits(c):
        return bkv % c == 0 and bq * c * head_dim_padded <= 1 << 26

    if causal:
        # sub == bq engages the zigzag schedule's constant-triangle mask
        # (v5e: S=4096 -> 114.5 effective vs 82 two-pass).
        sub = next((c for c in (bq, 512, 256, 128) if _fits(c)), None)
        u = 1
    else:
        # (512, strip, 1024, u2): 157 TFLOP/s bwd-only at S=4096 D=128;
        # (512, 2048, 512) 148 at D=256.
        sub = next((c for c in (1024, 512, 256, 128) if _fits(c)), None)
        u = 2
    if sub is None:
        return None
    return bq, bkv, sub, u


def _compatible(b_fwd: int, b_bwd: int) -> int:
    """Ensure min(fwd, bwd) divides max(fwd, bwd); fall back to b_fwd."""
    lo, hi = min(b_fwd, b_bwd), max(b_fwd, b_bwd)
    return b_bwd if hi % lo == 0 else b_fwd


def _divisor_block(block: int, cap: int) -> int:
    """Largest multiple-of-128 divisor of `block` that is <= cap."""
    if block <= cap:
        return block
    c = (cap // 128) * 128
    while c > 128 and block % c != 0:
        c -= 128
    return c
