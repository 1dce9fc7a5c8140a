"""Device mesh + sharding rules.

The reference's entire distributed story is a manual 2-GPU model split
(pretext.py:24-25,197-200). The TPU-native replacement: one
``jax.sharding.Mesh`` with

- ``data``: batch-dim data parallelism (contrastive batches, song buckets);
- ``time``: sequence parallelism over the conv time axis for long audio —
  XLA/GSPMD inserts the halo exchanges for the time-dim convolutions
  automatically, collectives ride ICI;
- ``model``: tensor parallelism over conv output channels (and the matching
  input-channel dim of the next conv) — GSPMD partitions the feature
  contractions and inserts the reduce-scatters. The network is small enough
  that ``model=1`` is the right default on real hardware; the axis exists so
  wider variants scale without code changes.

Parameters are replicated unless explicitly tp-sharded via
``shard_params_tp``; gradients are psum-med by jit from the sharded loss.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("data", "time", "model")


def make_mesh(
    data: Optional[int] = None, time: int = 1, model: int = 1, devices: Optional[Sequence] = None
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // (time * model)
    if data * time * model != len(devices):
        raise ValueError(f"mesh {data}x{time}x{model} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(data, time, model)
    return Mesh(arr, AXES)


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


def shard_params_tp(mesh: Mesh, params):
    """Tensor-parallel placement of a conv-net param tree over ``model``.

    Conv kernels are (kh, kw, cin, cout) in Flax NHWC; biases are (cout,).
    Shard the output-channel dim whenever it divides the axis size and leave
    everything else replicated — GSPMD then partitions each conv's channel
    contraction over the axis and inserts the collectives (the scaling path
    for wider encoders; replaces nothing in the reference, which has no TP).
    """
    n_model = mesh.shape["model"]
    rep = NamedSharding(mesh, P())

    def place(p):
        if n_model > 1 and p.ndim >= 1 and p.shape[-1] % n_model == 0:
            spec = P(*([None] * (p.ndim - 1)), "model")
            return jax.device_put(p, NamedSharding(mesh, spec))
        return jax.device_put(p, rep)

    return jax.tree.map(place, params)
