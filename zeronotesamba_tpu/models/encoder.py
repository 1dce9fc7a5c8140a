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


def fold_conv_freq2(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
                    dtype=jnp.float32) -> jnp.ndarray:
    """SAME 2-D conv computed via frequency space-to-depth (fold factor 2).

    Numerically EQUAL (up to float reassociation) to
    ``conv_same(x, kernel) + bias`` for odd freq kernels and even freq extent:
    two adjacent freq rows fold into channels ((B,H,T,C) -> (B,H/2,T,2C)), and
    the (kh,kw,C,O) kernel is scattered into a zero-padded
    (2*((kh//2+1)//2)+1, kw, 2C, 2O) folded kernel whose block
    [p*C:(p+1)*C, q*O:(q+1)*O] at folded row offset dr holds original tap
    dh = 2*dr + p - q (zero where |dh| > kh//2). Folded SAME zero-padding
    covers exactly the rows the original SAME padding zeroed.

    Why: the MXU is a 128x128 systolic array — a 64-channel conv (encoder
    conv2, 7x13 64->64 @h96) leaves half the array idle (34.5% of peak,
    results/profile_train_step.json per_conv_bwd). Folding doubles both
    channel dims (128->full array) at the cost of the zero taps
    (kh=7 -> kh2=5: 5/7 * 2 = 1.43x FLOPs), a large net win when the
    unfolded layer runs below ~70% of peak. Same params, same outputs:
    checkpoints are interchangeable with the unfolded path
    (tests/test_models.py::test_freq_s2d_conv_matches_unfolded).
    """
    kh, kw, cin, cout = kernel.shape
    b, h, t, c = x.shape
    assert c == cin and kh % 2 == 1 and h % 2 == 0
    hw = kh // 2
    r = (hw + 1) // 2  # folded half-height
    kh2 = 2 * r + 1
    x2 = x.reshape(b, h // 2, 2, t, c).transpose(0, 1, 3, 2, 4).reshape(b, h // 2, t, 2 * c)
    w2 = jnp.zeros((kh2, kw, 2 * cin, 2 * cout), kernel.dtype)
    for dr in range(-r, r + 1):
        for p in (0, 1):
            for q in (0, 1):
                dh = 2 * dr + p - q
                if abs(dh) <= hw:
                    w2 = w2.at[dr + r, :, p * cin:(p + 1) * cin, q * cout:(q + 1) * cout].set(
                        kernel[dh + hw])
    y2 = jax.lax.conv_general_dilated(
        x2.astype(dtype), w2.astype(dtype), window_strides=(1, 1),
        padding=((r, r), (kw // 2, kw // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    # Unfold: folded channel q*cout+o at row rr is original row 2*rr+q.
    y = y2.reshape(b, h // 2, t, 2, cout).transpose(0, 1, 3, 2, 4).reshape(b, h, t, cout)
    return y + bias.astype(dtype)


class _FreqS2DConv(nn.Module):
    """Drop-in nn.Conv replacement running fold_conv_freq2; declares the SAME
    param tree (kernel/bias, unfolded shapes) as the nn.Conv it replaces."""

    features: int
    kernel_size: Tuple[int, int]
    kernel_init: Any
    bias_init: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        kernel = self.param("kernel", self.kernel_init, (kh, kw, x.shape[-1], self.features))
        bias = self.param("bias", self.bias_init, (self.features,))
        return fold_conv_freq2(x, kernel, bias, dtype=self.dtype)


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
    freq_s2d: Tuple[int, ...] = ()  # 0-based conv indices computed via the
    # exact frequency space-to-depth fold (fold_conv_freq2) — (1,) folds
    # conv2, the one sub-50%-of-peak heavy layer. Params and outputs are
    # unchanged; only the on-device schedule differs.

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
            if i in self.freq_s2d and h.shape[1] % 2 == 0 and kern[0] % 2 == 1:
                h = _FreqS2DConv(
                    features=cout, kernel_size=kern, kernel_init=k_init,
                    bias_init=b_init, dtype=self.compute_dtype, name=f"conv{i + 1}",
                )(h)
            else:
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
    freq_s2d: Tuple[int, ...] = ()

    def setup(self):
        self.encoder = Encoder(self.dropout_rate, self.compute_dtype,
                               weight_init=self.weight_init, freq_s2d=self.freq_s2d)
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
    freq_s2d: Tuple[int, ...] = ()

    def setup(self):
        self.anchor = DSCNN(self.dropout_rate, self.compute_dtype,
                            weight_init=self.weight_init, freq_s2d=self.freq_s2d)
        self.postve = DSCNN(self.dropout_rate, self.compute_dtype,
                            weight_init=self.weight_init, freq_s2d=self.freq_s2d)

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
    freq_s2d: Tuple[int, ...] = ()

    def setup(self):
        self.pretext = TwinPretext(self.dropout_rate, self.compute_dtype,
                                   weight_init=self.weight_init, freq_s2d=self.freq_s2d)

    def __call__(self, anc, pos, *, train: bool = False):
        anc_emb, pos_emb = self.pretext(anc, pos, train=train)
        if self.reduction == "mean":
            return (anc_emb + pos_emb) / 2.0
        return jnp.maximum(anc_emb, pos_emb)

    def logits(self, anc, pos, *, train: bool = False):
        """Per-stream logits; with max fusion sigmoid(max(la, lb)) equals the
        fused probability exactly (sigmoid is monotonic)."""
        return self.pretext.logits(anc, pos, train=train)
