"""Frame RMS energy (batched, jittable) — the stem-quality-gate primitive.

Mirrors the semantics of the reference's compute_rms
(zeroNoteSamba/processing/stem_check.py:8-19): frame length 2048, hop 512,
centered frames. Used by the pair-mining RMS gate (data/stems.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("frame_length", "hop"))
def frame_rms(y: jnp.ndarray, frame_length: int = 2048, hop: int = 512) -> jnp.ndarray:
    """(B, L) -> (B, 1 + L//hop) RMS per centered frame."""
    if y.ndim != 2:
        raise ValueError("frame_rms expects (batch, samples)")
    n_frames = 1 + y.shape[-1] // hop
    x = jnp.pad(y.astype(jnp.float32), ((0, 0), (frame_length // 2, frame_length // 2)))
    sq = (x * x)[:, None, :]
    kern = jnp.ones((1, 1, frame_length), dtype=jnp.float32) / frame_length
    mean_sq = jax.lax.conv_general_dilated(
        sq, kern, window_strides=(hop,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )[:, 0, :n_frames]
    return jnp.sqrt(mean_sq)


def frame_rms_host(y: np.ndarray, frame_length: int = 2048, hop: int = 512) -> np.ndarray:
    """Numpy single-signal RMS (same framing), for host-side ETL."""
    n_frames = 1 + len(y) // hop
    x = np.pad(np.asarray(y, dtype=np.float64), frame_length // 2)
    csum = np.concatenate([[0.0], np.cumsum(x * x)])
    starts = np.arange(n_frames) * hop
    energy = csum[starts + frame_length] - csum[starts]
    return np.sqrt(energy / frame_length)
