"""Device-mesh construction and sharding rules for scale-out serving.

The reference is single-process/single-GPU; its only parallel dimension is
batch-level concurrency (SURVEY.md §2.4). On TPU the natural scale-out is:

  * ``data`` axis — requests (batch slots + their recurrent states) are
    sharded across chips; decode is embarrassingly parallel per slot, XLA
    inserts no collectives on this axis;
  * ``model`` axis — optional tensor parallelism over the 78k-row vocab
    head/embedding (the only weight big enough to care), giving sharded
    logits reduced via ICI all-gather only at the sampling boundary.

Everything rides ``jax.sharding`` + jit: we only annotate placements and let
XLA emit the collectives.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_devices: Optional[int] = None, model_parallel: int = 1) -> Mesh:
    """Build a (data, model) mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if n_devices % model_parallel:
        raise ValueError(f"{n_devices} devices not divisible by model_parallel={model_parallel}")
    arr = np.array(devs[:n_devices]).reshape(n_devices // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def param_sharding(mesh: Mesh, params):
    """Placement rules: vocab-dim weights sharded over MODEL, rest replicated."""
    def rule(path, x):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if x.ndim >= 1 and ("emb" in name):
            return NamedSharding(mesh, P(MODEL_AXIS, None))       # [V, C]
        if x.ndim >= 1 and ("head" in name):
            return NamedSharding(mesh, P(None, MODEL_AXIS))       # [C, V]
        return NamedSharding(mesh, P())
    return jax.tree_util.tree_map_with_path(rule, params)


def state_sharding(mesh: Mesh, state):
    """Recurrent state [L, B, ...]: shard the batch dim over DATA."""
    def rule(x):
        spec = [None] * x.ndim
        if x.ndim >= 2:
            spec[1] = DATA_AXIS
        return NamedSharding(mesh, P(*spec))
    return jax.tree_util.tree_map(rule, state)


def batch_sharding(mesh: Mesh, ndim: int):
    """Per-request arrays [B, ...]: shard dim 0 over DATA."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def shard_params(mesh: Mesh, params):
    return jax.device_put(params, param_sharding(mesh, params))


def shard_state(mesh: Mesh, state):
    return jax.device_put(state, state_sharding(mesh, state))
