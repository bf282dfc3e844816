"""Device-mesh helpers.

The reference has no distributed layer at all (SURVEY.md §2.4); this is the
TPU-native scale-out surface: a named `jax.sharding.Mesh` with the canonical
axes
    data  — batch (DP)
    model — attention heads / MLP hidden (TP, rides ICI)
    seq   — sequence (ring/context parallelism)
and PartitionSpec builders for the model's parameter/activation pytrees.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_DATA = "data"
AXIS_MODEL = "model"
AXIS_SEQ = "seq"


def make_mesh(
    data: int = 1,
    model: int = 1,
    seq: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    need = data * model * seq
    assert len(devices) >= need, f"need {need} devices, have {len(devices)}"
    arr = np.array(devices[:need]).reshape(data, model, seq)
    return Mesh(arr, (AXIS_DATA, AXIS_MODEL, AXIS_SEQ))


def param_pspecs(params) -> dict:
    """PartitionSpecs for the LLaMA param pytree: TP over heads/hidden.

    wq/wk/wv shard output dim (heads) over `model`; wo shards input dim;
    w_gate/w_up shard hidden; w_down shards input hidden; embeddings/norms
    replicated.
    """
    def spec_for(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        table = {
            "wq": P(None, AXIS_MODEL),
            "wk": P(None, AXIS_MODEL),
            "wv": P(None, AXIS_MODEL),
            "wo": P(AXIS_MODEL, None),
            "w_gate": P(None, AXIS_MODEL),
            "w_up": P(None, AXIS_MODEL),
            "w_down": P(AXIS_MODEL, None),
            "embed": P(None, None),
            "lm_head": P(None, AXIS_MODEL),
        }
        return table.get(name, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params, mesh: Mesh):
    specs = param_pspecs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
