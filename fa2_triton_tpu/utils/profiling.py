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

# Per-chip ceilings (bf16 FLOP/s, HBM bytes/s). Extend as needed.
CHIP_SPECS = {
    "v5e": {"bf16_flops": 197e12, "hbm_bw": 819e9, "vmem_bytes": 128 << 20},
    "v5p": {"bf16_flops": 459e12, "hbm_bw": 2765e9, "vmem_bytes": 128 << 20},
    "v4": {"bf16_flops": 275e12, "hbm_bw": 1228e9, "vmem_bytes": 128 << 20},
}


def detect_chip() -> str:
    kind = jax.devices()[0].device_kind.lower()
    if "v5 lite" in kind or "v5e" in kind:
        return "v5e"
    if "v5" in kind:
        return "v5p"
    if "v4" in kind:
        return "v4"
    return "v5e"


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
        spec = CHIP_SPECS[self.chip]
        return (self.flops / spec["bf16_flops"]) > (self.bytes_moved / spec["hbm_bw"])

    @property
    def utilization(self) -> float:
        """Fraction of the binding resource's ceiling achieved."""
        spec = CHIP_SPECS[self.chip]
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
