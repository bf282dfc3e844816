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
                       dtype_bits: int = 16) -> BlockSizes:
    """Pick block sizes that fit comfortably in ~16MB VMEM with pipelining."""
    # Budget shrinks as the (padded) head dim grows: acc/q/k/v tiles scale
    # linearly in head_dim, the s/p tile scales with block_q*block_kv.
    if head_dim_padded <= 128:
        bq, bkv = 512, 1024
    elif head_dim_padded <= 256:
        bq, bkv = 256, 512
    else:
        bq, bkv = 128, 256
    bq = min(bq, round_up_to_multiple(max(seqlen_q, 1), 128))
    bkv = min(bkv, round_up_to_multiple(max(seqlen_k, 1), 128))
    # Backward keeps two f32 accumulators (dk, dv) resident plus the s/p and
    # dp tiles, so tile more conservatively. Backward blocks must DIVIDE the
    # forward blocks so one padding serves both passes.
    bq_b = _divisor_block(bq, 256)
    bkv_b = _divisor_block(bkv, 512 if head_dim_padded <= 128 else 256)
    return BlockSizes(block_q=bq, block_kv=bkv, block_q_bwd=bq_b, block_kv_bwd=bkv_b)


def _divisor_block(block: int, cap: int) -> int:
    """Largest multiple-of-128 divisor of `block` that is <= cap."""
    if block <= cap:
        return block
    c = (cap // 128) * 128
    while c > 128 and block % c != 0:
        c -= 128
    return c
