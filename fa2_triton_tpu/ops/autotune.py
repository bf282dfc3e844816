"""Persisted per-chip tuning tables — the runtime-autotune analog.

The reference autotunes per shape at runtime via `triton.autotune`
(`/root/reference/src/forward/kernel.py:35-53`,
`src/backward/kernel.py:34-53`) with a seqlen-bucketed cache key
(`src/forward/caller.py:105-106`). A TPU grid is compiled ahead of time, so
runtime autotuning would recompile on the serving path; instead this module
makes the static tables in `ops/tuning.py` PORTABLE:

* the baked-in constants are the measured v5e prior;
* `bench.py --tune` sweeps the production shapes ON THE CURRENT CHIP and
  persists the winners to a JSON table keyed by
  (kind, causal, head_dim, seqlen bucket);
* `choose_block_sizes` / `choose_fused_bwd` consult the persisted table for
  the detected chip first and fall back to the v5e prior — with a one-time
  warning when running on a chip that has neither been swept nor matches
  the prior.

Table location: `$FA2_TUNING_DIR` (default `~/.cache/fa2_triton_tpu`) /
`tuning_<chip>.json`.
"""
from __future__ import annotations

import functools
import json
import os
import warnings
from pathlib import Path
from typing import Optional


def _tuning_dir() -> Path:
    return Path(os.environ.get(
        "FA2_TUNING_DIR", os.path.expanduser("~/.cache/fa2_triton_tpu")))


@functools.lru_cache(maxsize=None)
def detect_chip() -> str:
    """Normalized accelerator name ('v5e', 'v4', 'v5p', 'v6e', 'cpu', ...).

    Never initializes a backend implicitly at import time — call sites are
    host-level dispatch (not traced), where jax.devices() is already live.
    """
    try:
        import jax

        kind = jax.devices()[0].device_kind.lower()
    except Exception:  # no backend at all — tuning tables are moot
        return "unknown"
    # device_kind strings in the wild: 'TPU v4', 'TPU v5 lite', 'TPU v5e',
    # 'TPU v5p', 'TPU v6 lite', 'cpu', 'Tesla ...'.
    kind = kind.replace("tpu", "").strip()
    kind = kind.replace(" lite", "e").replace("lite", "e")
    kind = kind.replace(" ", "")
    return kind or "cpu"


def _bucket(seqlen: int) -> int:
    """Power-of-two seqlen bucket — the TPU analog of the reference's
    `max_seqlen // 128` autotune cache key coarsening."""
    b = 128
    while b < seqlen:
        b *= 2
    return b


def _key(kind: str, causal: bool, head_dim: int, seqlen: int,
         variant: str = "") -> str:
    tag = f"+{variant}" if variant else ""
    return f"{kind}{tag}:{int(causal)}:{head_dim}:{_bucket(seqlen)}"


@functools.lru_cache(maxsize=8)
def _load_table(chip: str) -> dict:
    """Shipped package table (fa2_triton_tpu/ops/tables/) overlaid by the
    user-cache table ($FA2_TUNING_DIR): `bench.py --tune` winners persist to
    the cache; chips swept at release time work out of the box."""
    table = {}
    shipped = Path(__file__).parent / "tables" / f"tuning_{chip}.json"
    for path in (shipped, _tuning_dir() / f"tuning_{chip}.json"):
        if path.exists():
            try:
                table.update(json.loads(path.read_text()))
            except (json.JSONDecodeError, OSError) as e:
                warnings.warn(f"ignoring unreadable tuning table {path}: {e}")
    return table


def lookup(kind: str, causal: bool, head_dim: int, seqlen: int,
           chip: Optional[str] = None, variant: str = "") -> Optional[tuple]:
    """Persisted override for a kernel config, or None.

    kind: 'fwd' -> (block_q, block_kv, unroll_kv);
          'fused_bwd' -> (block_q, block_kv, sub_kv, unroll);
          'strip_fwd'/'strip_bwd' -> (sub, wide).
    """
    if os.environ.get("FA2_DISABLE_TUNING_TABLE"):
        return None
    chip = chip or detect_chip()
    entry = _load_table(chip).get(_key(kind, causal, head_dim, seqlen,
                                       variant))
    if entry is None and not variant and os.environ.get("FA2_TUNE_ON_MISS"):
        entry = _tune_on_miss(kind, causal, head_dim, seqlen, chip)
    return tuple(entry) if entry is not None else None


# Pluggable micro-sweep runner (tests substitute a fake; None = real one).
_sweep_runner = None
_misses_in_progress: set = set()


def _tune_on_miss(kind: str, causal: bool, head_dim: int, seqlen: int,
                  chip: str):
    """`triton.autotune`'s on-first-use behavior, opt-in via
    FA2_TUNE_ON_MISS=1: sweep a small candidate list for this unswept
    (chip, kind, head_dim, seqlen-bucket) key ONCE on the current device and
    persist the winner (the reference autotunes at first launch per cache
    key, `/root/reference/src/forward/kernel.py:35-53`)."""
    if chip in ("cpu", "unknown"):
        return None  # interpret-mode timing would tune garbage
    key = _key(kind, causal, head_dim, seqlen)
    if key in _misses_in_progress:
        return None  # the sweep itself dispatches kernels — don't recurse
    _misses_in_progress.add(key)
    try:
        runner = _sweep_runner
        if runner is None:
            from fa2_triton_tpu.ops.microsweep import run_micro_sweep
            runner = run_micro_sweep
        best = runner(kind, causal, head_dim, _bucket(seqlen))
        if best is not None:
            record(kind, causal, head_dim, seqlen, tuple(best), chip=chip)
        return best
    finally:
        _misses_in_progress.discard(key)


def record(kind: str, causal: bool, head_dim: int, seqlen: int,
           config: tuple, chip: Optional[str] = None,
           variant: str = "") -> Path:
    """Persist a swept winner; returns the table path."""
    chip = chip or detect_chip()
    path = _tuning_dir() / f"tuning_{chip}.json"
    path.parent.mkdir(parents=True, exist_ok=True)
    table = dict(_load_table(chip))
    table[_key(kind, causal, head_dim, seqlen, variant)] = list(config)
    path.write_text(json.dumps(table, indent=1, sort_keys=True))
    _load_table.cache_clear()
    return path


_PRIOR_CHIP = "v5e"  # the chip the baked-in tables in tuning.py were swept on
_warned_chips: set = set()


def warn_if_unswept() -> None:
    """One-time warning when the block tables are a cross-chip guess."""
    chip = detect_chip()
    if chip in (_PRIOR_CHIP, "cpu", "unknown") or chip in _warned_chips:
        return
    if _load_table(chip):
        return  # has its own swept table
    _warned_chips.add(chip)
    warnings.warn(
        f"fa2_triton_tpu block-size tables were swept on {_PRIOR_CHIP}; "
        f"running on {chip} with unvalidated configs. Run "
        f"`python bench.py --tune` once to sweep and persist a "
        f"{chip}-specific table."
    )
