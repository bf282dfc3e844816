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

from fa2_triton_tpu.utils import round_up_to_multiple


@dataclass(frozen=True)
class BlockSizes:
    block_q: int
    block_kv: int
    # Backward passes use their own tiling.
    block_q_bwd: int
    block_kv_bwd: int

    def __post_init__(self):
        for v in (self.block_q, self.block_kv, self.block_q_bwd, self.block_kv_bwd):
            assert v % 128 == 0, "blocks must be lane-aligned (multiples of 128)"


def choose_block_sizes(seqlen_q: int, seqlen_k: int, head_dim_padded: int,
                       dtype_bits: int = 16, causal: bool = False,
                       has_bias: bool = False) -> BlockSizes:
    """Pick block sizes that fit comfortably in ~16MB VMEM with pipelining.

    Values from the v5e sweep at S=4096 D=128 (see bench.py --tune):
    non-causal peaks at (1024, 1024) ~132 TFLOP/s, causal at (512, 2048)
    ~84 effective; bias tiles (block_q x block_kv f32, double-buffered) force
    smaller blocks.
    """
    # Budget shrinks as the (padded) head dim grows: acc/q/k/v tiles scale
    # linearly in head_dim, the s/p tile scales with block_q*block_kv.
    if head_dim_padded <= 128:
        if has_bias:
            bq, bkv = 512, 1024
        elif causal:
            bq, bkv = 512, 2048
        else:
            bq, bkv = 1024, 1024
    elif head_dim_padded <= 256:
        bq, bkv = 256, 512
    else:
        bq, bkv = 128, 256
    bq = min(bq, round_up_to_multiple(max(seqlen_q, 1), 128))
    bkv = min(bkv, round_up_to_multiple(max(seqlen_k, 1), 128))
    # Backward (v5e sweep): non-causal peaks at (512, 1024) ~81% MXU, causal
    # at (1024, 512). Backward blocks and forward blocks must mutually divide
    # max(fwd, bwd) so one padding serves both passes (all powers of two).
    if head_dim_padded <= 128:
        bq_b, bkv_b = (1024, 512) if causal else (512, 1024)
        bq_b = min(bq_b, round_up_to_multiple(max(seqlen_q, 1), 128))
        bkv_b = min(bkv_b, round_up_to_multiple(max(seqlen_k, 1), 128))
        bq_b, bkv_b = _compatible(bq, bq_b), _compatible(bkv, bkv_b)
    else:
        bq_b = _divisor_block(bq, 256)
        bkv_b = _divisor_block(bkv, 256)
    return BlockSizes(block_q=bq, block_kv=bkv, block_q_bwd=bq_b, block_kv_bwd=bkv_b)


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
