"""Failure detection and crash-resumable training (SURVEY.md §5.3/§5.4).

The reference has no failure-handling story at all; a production TPU
training loop needs three things, provided here in idiomatic-JAX form:

* **step-level failure detection** — non-finite loss/grad detection ON
  DEVICE (one fused all-finite reduction, no host sync per tensor) with
  skip-and-continue semantics: a bad step contributes no update, mirroring
  standard large-scale recipes for transient numeric blowups;
* **device health check** — a cheap collective probe that verifies every
  mesh device still answers (catches wedged chips before a 30-min compile
  does);
* **auto-resume** — a `ResilientTrainer` wrapper that periodically
  checkpoints (orbax, `utils/checkpoint.py`) and restores the latest valid
  state on restart, so preemption costs at most `save_every` steps.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from fa2_triton_tpu.utils.checkpoint import CheckpointManager


def tree_allfinite(tree: Any) -> jax.Array:
    """Scalar bool: every leaf of the pytree is finite (device-side)."""
    leaves = [
        jnp.all(jnp.isfinite(x)) for x in jax.tree_util.tree_leaves(tree)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
    ]
    if not leaves:
        return jnp.bool_(True)
    return jnp.all(jnp.stack(leaves))


def guarded_update(params: Any, new_params: Any, ok: jax.Array) -> Any:
    """Select new_params where the step was healthy, else keep params.

    Both sides already exist on device; this is a cheap select, not a
    recompute — the standard skip-step recipe for transient NaN/inf.
    """
    return jax.tree_util.tree_map(
        lambda old, new: jnp.where(ok, new, old), params, new_params
    )


def make_guarded_step(step_fn: Callable) -> Callable:
    """Wrap `step_fn(state, batch) -> (new_state, loss)` so that non-finite
    losses or states roll the update back. Returns
    `(state, loss, ok)`; jit the result."""

    def guarded(state, batch):
        new_state, loss = step_fn(state, batch)
        ok = jnp.logical_and(
            jnp.isfinite(loss), tree_allfinite(new_state)
        )
        return guarded_update(state, new_state, ok), loss, ok

    return guarded


def make_guarded_multi_step(step_fn: Callable) -> Callable:
    """Scan the guarded step over a [K, ...]-stacked batch pytree.

    One host dispatch runs K optimizer steps on device — through a
    high-latency host link (the axon tunnel adds ~25-50 ms per dispatch)
    per-step dispatch costs ~35% of a 156M-model step, and a K=8 scan
    amortizes it to noise. Returns `(state, losses[K], oks[K])`.
    """
    guarded = make_guarded_step(step_fn)

    def multi(state, batches):
        def body(state, batch):
            state, loss, ok = guarded(state, batch)
            return state, (loss, ok)

        state, (losses, oks) = jax.lax.scan(body, state, batches)
        return state, losses, oks

    return multi


def devices_healthy(devices=None, timeout_s: float = 30.0) -> bool:
    """Probe that every device executes and returns a trivial program.

    With `devices=None` the probe runs in a SUBPROCESS bounded by
    `timeout_s`, so a wedged runtime surfaces as False instead of hanging
    the caller (some TPU runtimes crash when driven from a non-main
    thread, so a thread-based timeout is not safe). With explicit
    `devices`, the probe runs inline against those device objects (no
    timeout protection — they cannot cross a process boundary).
    """
    if devices is not None:
        try:
            for d in devices:
                x = jax.device_put(jnp.ones((8, 128), jnp.float32), d)
                if float(jnp.sum(x)) != 8 * 128:
                    return False
            return True
        except Exception:
            return False

    import subprocess
    import sys

    code = (
        "import jax, jax.numpy as jnp\n"
        "for d in jax.devices():\n"
        "    x = jax.device_put(jnp.ones((8, 128), jnp.float32), d)\n"
        "    assert float(jnp.sum(x)) == 8 * 128\n"
        "print('HEALTHY')\n"
    )
    try:
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True,
                             timeout=timeout_s)
        return "HEALTHY" in out.stdout
    except Exception:
        return False


@dataclass
class TrainerReport:
    steps_run: int = 0
    steps_skipped: int = 0
    resumed_from: Optional[int] = None
    last_loss: float = float("nan")


class ResilientTrainer:
    """Checkpointed, failure-tolerant training driver.

    step_fn(state, batch) -> (new_state, loss) — pure, jittable.
    The trainer jits a guarded version (non-finite steps are skipped),
    saves every `save_every` steps, and `.restore_or_init` resumes from the
    newest checkpoint if one exists.
    """

    def __init__(self, step_fn: Callable, ckpt_dir: str,
                 save_every: int = 100, max_to_keep: int = 3,
                 steps_per_call: int = 1):
        self._step = jax.jit(make_guarded_step(step_fn))
        self._multi = (jax.jit(make_guarded_multi_step(step_fn))
                       if steps_per_call > 1 else None)
        self._spc = max(1, steps_per_call)
        self._ckpt = CheckpointManager(ckpt_dir, max_to_keep=max_to_keep)
        self._save_every = save_every
        self.report = TrainerReport()

    def restore_or_init(self, init_state: Any) -> Tuple[Any, int]:
        """Resume from the latest checkpoint, else return init_state."""
        latest = self._ckpt.latest_step()
        if latest is None:
            return init_state, 0
        state = self._ckpt.restore(init_state, step=latest)
        self.report.resumed_from = latest
        return state, latest

    def run(self, state: Any, batches, start_step: int = 0,
            final_save: bool = True, stacked: bool = False) -> Any:
        """`stacked=True`: each item of `batches` is already a [K, ...]
        pytree (one host->device transfer per K steps — through a
        high-latency link, per-step transfers serialize against the
        dispatch and cost more than the stacking saves)."""
        step = start_step
        skips, last_loss = [], None
        pend = []

        def advance(new_state, n, skip_count, loss):
            # Keep skip/loss as device values — converting here would force
            # a host sync every dispatch and serialize against compute;
            # they are drained at the end of the run.
            nonlocal state, step, last_loss
            state = new_state
            prev, step = step, step + n
            self.report.steps_run += n
            skips.append(skip_count)
            last_loss = loss
            if step // self._save_every > prev // self._save_every:
                # Async save: the device->host transfer overlaps subsequent
                # steps (arrays are immutable, so the state being replaced
                # next step is safe to snapshot).
                self._ckpt.save(step, state, wait=False)

        def flush_pend():
            nonlocal pend
            if len(pend) == self._spc:
                # K steps per dispatch: one jitted scan over the stacked
                # batches (make_guarded_multi_step) amortizes the per-call
                # host-link latency.
                stacked = jax.tree_util.tree_map(
                    lambda *xs: jnp.stack(xs), *pend)
                new_state, losses, oks = self._multi(state, stacked)
                advance(new_state, len(pend),
                        jnp.sum(~oks).astype(jnp.int32), losses[-1])
            else:  # remainder tail: single steps (no extra compile of a
                # ragged scan length)
                for b in pend:
                    new_state, loss, ok = self._step(state, b)
                    advance(new_state, 1, (~ok).astype(jnp.int32), loss)
            pend = []

        for batch in batches:
            if stacked:
                assert self._multi is not None, \
                    "stacked batches need steps_per_call > 1"
                k = jax.tree_util.tree_leaves(batch)[0].shape[0]
                new_state, losses, oks = self._multi(state, batch)
                advance(new_state, k, jnp.sum(~oks).astype(jnp.int32),
                        losses[-1])
            elif self._multi is None:
                new_state, loss, ok = self._step(state, batch)
                advance(new_state, 1, (~ok).astype(jnp.int32), loss)
            else:
                pend.append(batch)
                if len(pend) == self._spc:
                    flush_pend()
        if pend:
            flush_pend()
        self.report.steps_skipped += int(sum(int(s) for s in skips))
        if last_loss is not None:
            self.report.last_loss = float(last_loss)
        if final_save:
            self._ckpt.save(step, state)
        return state

    def close(self):
        self._ckpt.close()
