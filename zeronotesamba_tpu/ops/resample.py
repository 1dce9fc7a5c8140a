"""Polyphase resampling — host (ETL) and on-device (JAX) paths.

Replaces the reference's librosa.load/librosa.resample usage
(zeroNoteSamba/processing/utilities.py:30-42, sample_script.py:28-29) with a
rational polyphase resampler. The device path is a single
``lax.conv_general_dilated`` with input dilation (upsampling) and output
stride (decimation), which XLA fuses and maps to the MXU.
"""

from __future__ import annotations

import functools
import math

import numpy as np


def _kaiser_lowpass(p: int, q: int, half_width: int = 32, beta: float = 9.0) -> np.ndarray:
    """Windowed-sinc lowpass for rational p/q resampling (gain p in passband)."""
    m = max(p, q)
    taps = 2 * half_width * m + 1
    n = np.arange(taps) - (taps - 1) / 2.0
    cutoff = 1.0 / m  # fraction of the upsampled Nyquist
    h = cutoff * np.sinc(cutoff * n) * np.kaiser(taps, beta)
    return (h * p / np.sum(h)).astype(np.float64)


def resample_poly_host(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Rational resampling on host (numpy upfirdn via scipy if available)."""
    if sr_in == sr_out:
        return np.asarray(x)
    g = math.gcd(sr_in, sr_out)
    p, q = sr_out // g, sr_in // g
    try:
        from scipy.signal import resample_poly

        return resample_poly(np.asarray(x, dtype=np.float64), p, q).astype(np.float32)
    except ImportError:  # pure-numpy fallback
        h = _kaiser_lowpass(p, q)
        up = np.zeros(len(x) * p)
        up[::p] = x
        pad = len(h) // 2
        uppad = np.pad(up, (pad, pad))
        full = np.convolve(uppad, h, mode="valid")
        return full[::q][: int(math.ceil(len(x) * p / q))].astype(np.float32)


@functools.lru_cache(maxsize=16)
def _device_filter(p: int, q: int):
    import jax.numpy as jnp

    return jnp.asarray(_kaiser_lowpass(p, q)[::-1].copy(), dtype=jnp.float32)[None, None, :]


def resample_jax(x, sr_in: int, sr_out: int):
    """Batched on-device rational resampling: (B, L) -> (B, ceil(L*p/q)).

    Implemented as one conv with lhs_dilation=p (zero-stuffing upsample) and
    window stride q (decimation) over a centered kaiser-sinc lowpass.
    """
    import jax
    import jax.numpy as jnp

    if sr_in == sr_out:
        return x
    g = math.gcd(sr_in, sr_out)
    p, q = sr_out // g, sr_in // g
    kern = _device_filter(p, q)
    taps = kern.shape[-1]
    half = taps // 2
    out_len = int(math.ceil(x.shape[-1] * p / q))
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32)[:, None, :],
        kern,
        window_strides=(q,),
        padding=[(half, half + q)],
        lhs_dilation=(p,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
    )
    return y[:, 0, :out_len]
