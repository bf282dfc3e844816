"""Observability: profiler traces, roofline accounting, step timing.

The reference's observability is an env toggle + wall-clock helper
(SURVEY.md §5.1); the TPU-native equivalents are jax.profiler traces (view
in TensorBoard/XProf) and a roofline reporter that situates measured
throughput against chip ceilings.
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import Optional

import jax

# One chip detector for the whole package (autotune's normalized names:
# 'v4', 'v5e', 'v5p', 'v6e', 'cpu', ...).
from fa2_triton_tpu.ops.autotune import detect_chip

# Per-chip ceilings (bf16 FLOP/s, HBM bytes/s), from the public TPU
# datasheets. Extend as needed.
CHIP_SPECS = {
    "v5e": {"bf16_flops": 197e12, "hbm_bw": 819e9, "vmem_bytes": 128 << 20},
    "v5p": {"bf16_flops": 459e12, "hbm_bw": 2765e9, "vmem_bytes": 128 << 20},
    "v4": {"bf16_flops": 275e12, "hbm_bw": 1228e9, "vmem_bytes": 128 << 20},
    "v6e": {"bf16_flops": 918e12, "hbm_bw": 1638e9, "vmem_bytes": 128 << 20},
}


def chip_spec(chip: Optional[str] = None) -> dict:
    """Ceilings for `chip` (detected if None). Unknown chips fall back to
    v5e with a one-time warning rather than silently mis-scoring — the same
    contract as the tuning-table fallback (`ops/autotune.py`)."""
    c = chip or detect_chip()
    if c not in CHIP_SPECS:
        import warnings

        warnings.warn(
            f"no roofline specs for chip {c!r}; scoring against v5e ceilings")
        return CHIP_SPECS["v5e"]
    return CHIP_SPECS[c]


@contextlib.contextmanager
def profile_trace(logdir: str = "/tmp/fa2_trace"):
    """jax.profiler trace context; open the logdir with TensorBoard."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@dataclass
class RooflineReport:
    time_s: float
    flops: float
    bytes_moved: float
    chip: str

    @property
    def achieved_tflops(self) -> float:
        return self.flops / self.time_s / 1e12

    @property
    def achieved_gbps(self) -> float:
        return self.bytes_moved / self.time_s / 1e9

    @property
    def compute_bound(self) -> bool:
        spec = chip_spec(self.chip)
        return (self.flops / spec["bf16_flops"]) > (self.bytes_moved / spec["hbm_bw"])

    @property
    def utilization(self) -> float:
        """Fraction of the binding resource's ceiling achieved."""
        spec = chip_spec(self.chip)
        t_ideal = max(self.flops / spec["bf16_flops"],
                      self.bytes_moved / spec["hbm_bw"])
        return t_ideal / self.time_s

    def summary(self) -> str:
        bound = "compute" if self.compute_bound else "bandwidth"
        return (f"{self.achieved_tflops:.1f} TFLOP/s, {self.achieved_gbps:.0f} GB/s "
                f"({bound}-bound on {self.chip}; {self.utilization*100:.0f}% of roofline)")


def roofline(time_s: float, flops: float, bytes_moved: float,
             chip: Optional[str] = None) -> RooflineReport:
    return RooflineReport(time_s, flops, bytes_moved, chip or detect_chip())
