"""Device-time measurement that survives high host<->device latency.

The axon TPU tunnel adds ~25ms fixed RPC latency per host sync, so per-call
wall-clock timing (the `triton.testing.do_bench` analog) is useless. Instead
we run N dependent iterations of the function inside ONE jitted
`lax.fori_loop` (each iteration feeds its output back into the first
argument, preventing elision) and difference two iteration counts to cancel
the fixed overhead.
"""
from __future__ import annotations

import time
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp


def _chained_loop(fn: Callable, n: int, args):
    """Run fn n times, mixing the output back into the first argument."""

    def body(i, carry):
        first, rest = carry[0], carry[1:]
        out = fn(first, *rest)
        # Mix ALL output leaves into the first arg so nothing is dead-code
        # eliminated (same shape/dtype required for the first leaf).
        leaves_out = jax.tree_util.tree_leaves(out)
        mixed = leaves_out[0].reshape(first.shape).astype(first.dtype)
        for leaf in leaves_out[1:]:
            mixed = mixed + jnp.sum(leaf).astype(first.dtype) * 1e-9
        return (mixed,) + rest

    return jax.lax.fori_loop(0, n, body, tuple(args))[0]


def device_time(fn: Callable, *args, iters: int = 20, warmup: bool = True,
                reps: int = 3, min_window: float = 0.06) -> float:
    """Median per-iteration device time (seconds) of fn(*args).

    fn's first output leaf must have the same size as its first argument
    (used to chain iterations). Most attention-shaped functions qualify; wrap
    otherwise.

    The differenced window (`iters` x per-iter time) must dominate the
    host<->device RPC jitter (~1-3 ms on the tunnel) or the result is noise
    — round-4 sweeps at S=1024 with iters=8 (~7 ms windows) reported
    above-hardware-peak rates. If the first measurement shows the window
    below `min_window` seconds, `iters` is scaled up (one extra compile)
    until the window clears it.
    """
    lo = jax.jit(partial(_chained_loop, fn, 2))

    def run(f):
        return float(jnp.sum(f(args).astype(jnp.float32)))

    def measure(hi, n):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            run(lo)
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            run(hi)
            t_hi = time.perf_counter() - t0
            ts.append((t_hi - t_lo) / n)
        ts.sort()
        return max(ts[len(ts) // 2], 1e-9)

    run(lo)  # compile + warm
    for _ in range(4):
        hi = jax.jit(partial(_chained_loop, fn, 2 + iters))
        run(hi)  # compile + warm
        t = measure(hi, iters)
        if t * iters >= min_window:
            return t
        # Window too small to trust: grow iters to clear min_window with
        # ~50% margin (cap the growth per attempt at 64x).
        iters = min(iters * 64,
                    max(iters + 1, int(1.5 * min_window / max(t, 1e-9))))
    return t
