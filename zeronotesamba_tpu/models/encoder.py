"""Conv beat-tracking encoder family (Flax linen, NHWC, TPU-first).

Architecture parity with the reference models
(zeroNoteSamba/models/models.py:7-150):

- ``Encoder``        == ``_CNN``: 8 Conv2d layers over (freq=96, time=T),
  channels 1-64-64-128-128-256-256-128-128, odd kernels
  (3,11)(7,13)(5,15)(9,17)(3,19)(5,21)(1,23)(1,25) with SAME padding,
  frequency-only max-pools (3,1)/(4,1)/(8,1) after convs 2/4/6 (96 -> 1),
  ReLU + Dropout(0.1) after every conv. Output: (B, T, 128).
- ``BeatHead``       == the Conv1d(128->1, k=1) + Sigmoid head of ``DS_CNN``.
- ``DSCNN``          == ``DS_CNN``: encoder + head -> per-frame pulse (B, T).
- ``TwinPretext``    == ``Pretext_CNN``: independent anchor/positive DSCNNs.
- ``FusedDownstream``== ``Down_CNN``: elementwise max (or mean) fusion.

Layout is NHWC (B, F, T, C) — the TPU-native convolution layout — rather than
the reference's NCHW. Initialization defaults to He-normal (init='he'); the
torch Conv2d default scheme is available via init='torch' for strict parity
studies (see Encoder docstring for why it is not the default).
tests/test_models.py transplants weights into a torch replica to verify
forward parity.
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

CONV_SPECS: Sequence[Tuple[int, Tuple[int, int]]] = (
    (64, (3, 11)),
    (64, (7, 13)),
    (128, (5, 15)),
    (128, (9, 17)),
    (256, (3, 19)),
    (256, (5, 21)),
    (128, (1, 23)),
    (128, (1, 25)),
)
# Frequency pool window after conv index (0-based): 96 -> 32 -> 8 -> 1.
POOL_AFTER = {1: 3, 3: 4, 5: 8}
EMBED_DIM = 128


def _torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """torch.nn.Conv2d default weight init (kaiming_uniform with a=sqrt(5)).

    Flax HWIO shape (kh, kw, cin, cout); fan_in = kh*kw*cin. The torch default
    reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
    """
    fan_in = shape[0] * shape[1] * shape[2] if len(shape) == 4 else shape[0]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _torch_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Encoder(nn.Module):
    """The 8-conv trunk: (B, 96, T, 1) -> (B, T, 128).

    ``input_mean``/``input_std`` apply a FIXED affine standardization to the
    log-VQT input ((x - mean)/std). The reference feeds raw log magnitudes
    (range ~[-20.7, +2]), which collapses activations through the torch-init
    conv stack to ~1e-2 and makes optimization glacial; standardizing with
    constants chosen for the log-VQT distribution fixes trainability without
    any data-dependent state. Set mean=0, std=1 for raw reference behavior.
    """

    dropout_rate: float = 0.1
    compute_dtype: Any = jnp.float32  # set to jnp.bfloat16 for MXU-native convs
    input_mean: float = -6.0
    input_std: float = 5.0
    weight_init: str = "he"  # 'he' (trainable default) | 'torch' (reference parity)

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        if x.ndim != 4:
            raise ValueError("Encoder expects (B, freq, time, 1)")
        x = (x - self.input_mean) / self.input_std
        h = x.astype(self.compute_dtype)
        cin = x.shape[-1]
        for i, (cout, kern) in enumerate(CONV_SPECS):
            fan_in = kern[0] * kern[1] * cin
            if self.weight_init == "torch":
                # torch Conv2d default: activations shrink ~0.41x per layer
                # (0.41^8 ~ 1e-3 at the head) — the reference compensates with
                # ~3e5 tiny-lr steps; kept only for strict parity studies.
                k_init, b_init = _torch_conv_kernel_init, _torch_bias_init(fan_in)
            else:
                k_init, b_init = nn.initializers.he_normal(), nn.initializers.zeros_init()
            h = nn.Conv(
                features=cout,
                kernel_size=kern,
                padding="SAME",
                kernel_init=k_init,
                bias_init=b_init,
                dtype=self.compute_dtype,
                name=f"conv{i + 1}",
            )(h)
            if i in POOL_AFTER:
                w = POOL_AFTER[i]
                h = nn.max_pool(h, window_shape=(w, 1), strides=(w, 1))
            h = nn.relu(h)
            h = nn.Dropout(rate=self.dropout_rate, deterministic=not train)(h)
            cin = cout
        # (B, 1, T, 128) -> (B, T, 128)
        return jnp.squeeze(h, axis=1).astype(jnp.float32)


class BeatHead(nn.Module):
    """1x1 conv + sigmoid: (B, T, 128) -> (B, T) per-frame beat activation.

    ``logits`` exposes the pre-sigmoid values so training can use the
    numerically stable logits-space BCE (losses/bce.py) — probability-space
    BCE either freezes saturated units (clipped log) or overflows (1/p
    gradients), which is how the reference's torch BCELoss path can die too.
    """

    def setup(self):
        self.proj = nn.Dense(
            1,
            kernel_init=_torch_conv_kernel_init,
            bias_init=_torch_bias_init(EMBED_DIM),
        )

    def logits(self, emb: jnp.ndarray) -> jnp.ndarray:
        return self.proj(emb)[..., 0]

    def __call__(self, emb: jnp.ndarray) -> jnp.ndarray:
        return jax.nn.sigmoid(self.logits(emb))


class DSCNN(nn.Module):
    """Encoder + beat head (reference DS_CNN, models.py:77-103)."""

    dropout_rate: float = 0.1
    compute_dtype: Any = jnp.float32
    weight_init: str = "he"

    def setup(self):
        self.encoder = Encoder(self.dropout_rate, self.compute_dtype, weight_init=self.weight_init)
        self.head = BeatHead()

    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        return self.head(self.encoder(x, train=train))

    def logits(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        return self.head.logits(self.encoder(x, train=train))

    def embed(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        return self.encoder(x, train=train)


class TwinPretext(nn.Module):
    """Independent anchor/positive DSCNNs (reference Pretext_CNN, models.py:106-124)."""

    dropout_rate: float = 0.1
    compute_dtype: Any = jnp.float32
    weight_init: str = "he"

    def setup(self):
        self.anchor = DSCNN(self.dropout_rate, self.compute_dtype, weight_init=self.weight_init)
        self.postve = DSCNN(self.dropout_rate, self.compute_dtype, weight_init=self.weight_init)

    def __call__(self, anc, pos, *, train: bool = False):
        return self.anchor(anc, train=train), self.postve(pos, train=train)

    def logits(self, anc, pos, *, train: bool = False):
        return self.anchor.logits(anc, train=train), self.postve.logits(pos, train=train)


class FusedDownstream(nn.Module):
    """Twin network with max/mean stream fusion (reference Down_CNN, models.py:127-150)."""

    reduction: str = "max"
    dropout_rate: float = 0.1
    compute_dtype: Any = jnp.float32
    weight_init: str = "he"

    def setup(self):
        self.pretext = TwinPretext(self.dropout_rate, self.compute_dtype, weight_init=self.weight_init)

    def __call__(self, anc, pos, *, train: bool = False):
        anc_emb, pos_emb = self.pretext(anc, pos, train=train)
        if self.reduction == "mean":
            return (anc_emb + pos_emb) / 2.0
        return jnp.maximum(anc_emb, pos_emb)

    def logits(self, anc, pos, *, train: bool = False):
        """Per-stream logits; with max fusion sigmoid(max(la, lb)) equals the
        fused probability exactly (sigmoid is monotonic)."""
        return self.pretext.logits(anc, pos, train=train)
