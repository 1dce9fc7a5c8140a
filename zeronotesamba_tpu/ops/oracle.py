"""Direct-form (full-rate) numpy VQT/CQT — test oracle and CPU baseline.

Evaluates the analytic filterbank defined in ops/filterbank.py exactly, with
no multi-rate decimation: every bin is correlated against the signal at the
full sample rate on the centered ``hop`` frame grid. This is the numerical
ground truth that the TPU multi-rate kernel (ops/vqt.py) is tested against,
and the CPU reference point for bench.py (standing in for the reference's
librosa front-end, zeroNoteSamba/processing/input_rep.py:11-57, which is not
installable in this environment).
"""

from __future__ import annotations

import math

import numpy as np

from zeronotesamba_tpu.ops.filterbank import XQTParams, analytic_kernel


def xqt_direct(y: np.ndarray, params: XQTParams | None = None) -> np.ndarray:
    """Direct full-rate XQT magnitude of a mono signal.

    Returns ``(n_bins, num_frames)`` float64 magnitudes (no log).
    """
    params = params or XQTParams()
    y = np.asarray(y, dtype=np.float64)
    if y.ndim != 1:
        raise ValueError("xqt_direct expects a mono 1D signal")

    freqs = params.bin_frequencies()
    lengths = params.filter_lengths()
    n_frames = params.num_frames(len(y))
    out = np.empty((params.n_bins, n_frames), dtype=np.float64)

    nmax = int(math.ceil(lengths.max()))
    pad = nmax // 2 + 1
    ypad = np.pad(y, (pad, pad + params.hop), mode="reflect")

    for k in range(params.n_bins):
        kern = analytic_kernel(freqs[k], lengths[k], params.sample_rate, math.sqrt(lengths[k]))
        n = len(kern)
        # Frame m is centered at sample m*hop of the original signal; the
        # kernel's center is at (n-1)/2.
        starts = np.arange(n_frames) * params.hop + pad - (n - 1) // 2
        idx = starts[:, None] + np.arange(n)[None, :]
        frames = ypad[idx]
        out[k] = np.abs(frames @ np.conj(kern))
    return out


def log_xqt_direct(y: np.ndarray, params: XQTParams | None = None) -> np.ndarray:
    """log(|XQT| + eps), the reference's generate_XQT output convention."""
    params = params or XQTParams()
    return np.log(xqt_direct(y, params) + params.log_eps)
