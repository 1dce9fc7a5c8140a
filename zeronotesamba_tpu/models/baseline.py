"""Böck-style supervised beat-activation baseline (TCN over the log-VQT).

The reference compares against madmom's pre-trained ``RNNBeatProcessor``
(zeroNoteSamba/measures.py:30,270-277 and the Böck columns of
results/supervised.xlsx) — a frozen third-party model this image cannot
ship. The TPU-native replacement is a small temporal convolutional network
in the style of Böck & Davies 2019 ("Temporal convolutional networks for
musical audio beat tracking"), built from the paper's architecture, not
madmom code, and trained on the same corpora as every other status:

- a 3-stage conv front-end pools the 96 VQT bins to 1 (16 filters, 3x3,
  frequency-only max pools 3/4/8 — mirroring the DSCNN pooling plan so both
  baselines see identical inputs);
- a stack of residual dilated 1-D conv blocks over time (kernel 5,
  dilations 1..128 => ~2.7 s receptive field at 62.5 fps, ELU, dropout);
- a 1x1 projection to per-frame beat logits.

It plugs into the supervised engine as ``status="bock"`` (same masked
logits-space BCE, DBN decode, metrics), giving the demo suite the Böck
comparison column that VERDICT.md round 1 flagged as missing.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

TCN_CHANNELS = 16
TCN_KERNEL = 5
TCN_DILATIONS: Sequence[int] = (1, 2, 4, 8, 16, 32, 64, 128)


class _TCNBlock(nn.Module):
    """Residual dilated conv block: (B, T, C) -> (B, T, C)."""

    dilation: int
    dropout_rate: float = 0.1
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        h = nn.Conv(
            features=TCN_CHANNELS,
            kernel_size=(TCN_KERNEL,),
            kernel_dilation=(self.dilation,),
            padding="SAME",
            dtype=self.compute_dtype,
            name="dilated",
        )(x)
        h = nn.elu(h)
        h = nn.Dropout(rate=self.dropout_rate, deterministic=not train)(h)
        h = nn.Conv(features=TCN_CHANNELS, kernel_size=(1,), dtype=self.compute_dtype, name="mix")(h)
        return nn.elu(x + h)


class BockTCN(nn.Module):
    """(B, 96, T, 1) log-VQT -> (B, T) beat activation.

    Same call surface as DSCNN (``__call__``/``logits``/``embed``) so the
    supervised engine, decoders, and measures drivers treat it uniformly.
    """

    dropout_rate: float = 0.1
    compute_dtype: Any = jnp.float32
    input_mean: float = -6.0
    input_std: float = 5.0

    POOLS = (3, 4, 8)  # 96 -> 32 -> 8 -> 1

    def setup(self):
        self.front = [
            nn.Conv(features=TCN_CHANNELS, kernel_size=(3, 3), padding="SAME",
                    dtype=self.compute_dtype, name=f"front{i + 1}")
            for i in range(len(self.POOLS))
        ]
        self.drop = nn.Dropout(rate=self.dropout_rate)
        self.blocks = [
            _TCNBlock(d, self.dropout_rate, self.compute_dtype, name=f"tcn_d{d}") for d in TCN_DILATIONS
        ]
        self.head = nn.Dense(1, name="head")

    def _embed(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        if x.ndim != 4:
            raise ValueError("BockTCN expects (B, freq, time, 1)")
        h = ((x - self.input_mean) / self.input_std).astype(self.compute_dtype)
        for conv, pool in zip(self.front, self.POOLS):
            h = conv(h)
            h = nn.max_pool(h, window_shape=(pool, 1), strides=(pool, 1))
            h = nn.elu(h)
            h = self.drop(h, deterministic=not train)
        h = jnp.squeeze(h, axis=1)  # (B, T, C)
        for block in self.blocks:
            h = block(h, train=train)
        return h.astype(jnp.float32)

    def logits(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        return self.head(self._embed(x, train))[..., 0]

    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        return jax.nn.sigmoid(self.logits(x, train=train))

    def embed(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        return self._embed(x, train)
