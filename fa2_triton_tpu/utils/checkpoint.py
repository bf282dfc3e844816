"""Checkpoint / resume for training state (orbax-backed).

The reference has no persistence at all (SURVEY.md §5.4); a production
training loop needs crash-resumable state. This wraps orbax with a tiny
step-numbered layout: save(state, step), restore latest, and garbage-keep
the last N.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, step: int, state: Any, wait: bool = True):
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, abstract_state: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure/shardings of `abstract_state` (pass a
        pytree of like-shaped arrays, e.g. a freshly-initialized state).
        Shardings (mesh placement) of the given arrays are preserved, so a
        TP/DP-sharded train state restores sharded."""
        step = step if step is not None else self._mgr.latest_step()
        assert step is not None, "no checkpoint found"

        def as_abstract(x):
            x = jax.numpy.asarray(x)
            return jax.ShapeDtypeStruct(
                x.shape, x.dtype, sharding=getattr(x, "sharding", None)
            )

        ref = jax.tree.map(as_abstract, abstract_state)
        return self._mgr.restore(step, args=ocp.args.StandardRestore(ref))

    def close(self):
        self._mgr.close()
