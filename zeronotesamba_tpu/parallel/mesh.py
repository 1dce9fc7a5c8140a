"""Device mesh + sharding rules.

The reference's entire distributed story is a manual 2-GPU model split
(pretext.py:24-25,197-200). The TPU-native replacement: one
``jax.sharding.Mesh`` with

- ``data``: batch-dim data parallelism (contrastive batches, song buckets);
- ``time``: sequence parallelism over the conv time axis for long audio —
  XLA/GSPMD inserts the halo exchanges for the time-dim convolutions
  automatically, collectives ride ICI.

Parameters are replicated (the model is ~3M params); gradients are psum-med
by jit from the sharded loss.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, time: int = 1, devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // time
    if data * time != len(devices):
        raise ValueError(f"mesh {data}x{time} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(data, time)
    return Mesh(arr, ("data", "time"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """(B, ...) arrays sharded over the data axis."""
    return NamedSharding(mesh, P("data"))


def spectrogram_sharding(mesh: Mesh) -> NamedSharding:
    """(B, F, T, C) model inputs: batch over data, time axis over time."""
    return NamedSharding(mesh, P("data", None, "time", None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Device-put arrays with batch-dim sharding."""
    sh = batch_sharding(mesh)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]
