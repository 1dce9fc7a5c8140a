"""Harmonic/percussive source separation on TPU (median-filtering HPSS).

The reference delegates percussive-stem extraction to Spleeter (TensorFlow;
reference processing/source_separation.py:8-32), which is not available in
this environment. This module provides the framework's built-in separation
backend: Fitzgerald-style median-filter HPSS executed as a single XLA
program (STFT -> time/freq median masks -> iSTFT), fully batched.

Spleeter-quality stems remain importable from disk (data/separation.py);
HPSS is the self-contained fallback that keeps the full pretext pipeline
runnable end-to-end on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _stft(y: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """(B, L) -> (B, F, T) complex STFT, centered, periodic Hann."""
    pad = n_fft // 2
    ypad = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + y.shape[-1] // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    frames = ypad[:, idx]  # (B, T, n_fft)
    win = 0.5 - 0.5 * jnp.cos(2 * jnp.pi * jnp.arange(n_fft) / n_fft)
    spec = jnp.fft.rfft(frames * win, axis=-1)
    return jnp.swapaxes(spec, 1, 2)  # (B, F, T)


def _istft(spec: jnp.ndarray, n_fft: int, hop: int, length: int) -> jnp.ndarray:
    """(B, F, T) -> (B, length) overlap-add inverse with Hann synthesis."""
    frames = jnp.fft.irfft(jnp.swapaxes(spec, 1, 2), n_fft, axis=-1)  # (B, T, n_fft)
    win = 0.5 - 0.5 * jnp.cos(2 * jnp.pi * jnp.arange(n_fft) / n_fft)
    frames = frames * win
    n_frames = frames.shape[1]
    out_len = length + n_fft
    # Overlap-add via scatter-add on frame start offsets.
    idx = (jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]).reshape(-1)
    flat = frames.reshape(frames.shape[0], -1)
    sig = jnp.zeros((frames.shape[0], out_len)).at[:, idx].add(flat)
    norm = jnp.zeros(out_len).at[idx].add(jnp.tile(win * win, n_frames))
    sig = sig / jnp.maximum(norm, 1e-8)
    pad = n_fft // 2
    return sig[:, pad : pad + length]


def _median_filter_axis(x: jnp.ndarray, size: int, axis: int) -> jnp.ndarray:
    """Median filter along one axis via stacked shifts (size is static, odd)."""
    half = size // 2
    pads = [(0, 0)] * x.ndim
    pads[axis] = (half, half)
    xp = jnp.pad(x, pads, mode="edge")
    stack = jnp.stack([jax.lax.slice_in_dim(xp, i, i + x.shape[axis], axis=axis) for i in range(size)], axis=0)
    return jnp.median(stack, axis=0)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "kernel", "power"))
def hpss(
    y: jnp.ndarray, n_fft: int = 2048, hop: int = 512, kernel: int = 17, power: float = 2.0
):
    """(B, L) -> (harmonic, percussive) waveforms, both (B, L)."""
    if y.ndim != 2:
        raise ValueError("hpss expects (batch, samples)")
    y = y.astype(jnp.float32)
    spec = _stft(y, n_fft, hop)
    mag = jnp.abs(spec)
    harm = _median_filter_axis(mag, kernel, axis=2)  # smooth over time
    perc = _median_filter_axis(mag, kernel, axis=1)  # smooth over frequency
    hp = harm**power
    pp = perc**power
    denom = hp + pp + 1e-10
    mask_h = hp / denom
    mask_p = pp / denom
    length = y.shape[-1]
    h = _istft(spec * mask_h, n_fft, hop, length)
    p = _istft(spec * mask_p, n_fft, hop, length)
    return h, p


def hpss_host(y: np.ndarray, **kw):
    """Single-signal host wrapper: mono numpy -> (harmonic, percussive)."""
    h, p = hpss(jnp.asarray(y, dtype=jnp.float32)[None, :], **kw)
    return np.asarray(h[0]), np.asarray(p[0])
