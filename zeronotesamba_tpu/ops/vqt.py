"""Batched multi-rate VQT/CQT on TPU (JAX/XLA).

TPU-first re-design of the reference's librosa front-end
(zeroNoteSamba/processing/input_rep.py:11-57):

- one octave per sample-rate halving: the 12 analysis kernels of each octave
  are evaluated at that octave's rate, where they are short (<=256 taps), so
  the whole transform is 8 strided convolutions + 7 decimations, all of which
  XLA lowers to MXU matmuls;
- everything is batched over ``(B, L)`` signals, jittable, static-shaped;
- magnitudes match the direct full-rate oracle (ops/oracle.py) to ~1e-3
  relative on analyzed bins (decimation-filter ripple + kernel discretization;
  see tests/test_vqt.py for the enforced tolerances).

Output convention: ``log(|X| + 1e-9)`` over 96 bins x (1 + L//256) frames at
62.5 fps, identical to the reference's generate_XQT.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from zeronotesamba_tpu.ops.filterbank import (
    XQTParams,
    halfband_decimation_filter,
    octave_kernel_bank,
)


@functools.lru_cache(maxsize=8)
def _conv_constants(params: XQTParams):
    """Host-side constants: analysis conv kernels + decimation kernel.

    ``lax.conv_general_dilated`` computes a cross-correlation, so using the
    conjugated (NOT reversed) bank — with each kernel's center pinned at
    window_len//2 — evaluates exactly the oracle's <signal, conj(kernel)>
    centered on every hop-grid sample.
    Shapes: (n_octaves, 2*bins_per_octave, 1, W) for (O, I, W) convs.
    """
    bank = np.conj(octave_kernel_bank(params))  # (n_oct, W, bins)
    cos_b = np.ascontiguousarray(bank.real.transpose(0, 2, 1))[:, :, None, :]
    sin_b = np.ascontiguousarray(bank.imag.transpose(0, 2, 1))[:, :, None, :]
    kern = np.concatenate([cos_b, sin_b], axis=1).astype(np.float32)  # (n_oct, 2*bins, 1, W)
    dec = halfband_decimation_filter().astype(np.float32)[None, None, ::-1]  # (1,1,taps)
    # Return numpy: jit traces embed these as constants; caching jnp arrays
    # created inside a trace would leak tracers.
    return kern, np.ascontiguousarray(dec)


def _reflect_pad_last(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    # jnp.pad(reflect) caps each application at length-1; iterate for short
    # signals (pad can exceed the signal length for sub-second clips).
    while pad > 0:
        step = min(pad, x.shape[-1] - 1)
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(step, step)], mode="reflect")
        pad -= step
    return x


def _strided_conv(x: jnp.ndarray, kern: jnp.ndarray, stride: int) -> jnp.ndarray:
    """(B, C, L) x (O, C, W) -> (B, O, T) VALID strided conv in f32."""
    return jax.lax.conv_general_dilated(
        x,
        kern,
        window_strides=(stride,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _decimate2(x: jnp.ndarray, dec_kern: jnp.ndarray) -> jnp.ndarray:
    """(B, 1, L) -> (B, 1, ceil(L/2)) zero-phase half-band decimation."""
    taps = dec_kern.shape[-1]
    length = x.shape[-1]
    xpad = _reflect_pad_last(x, taps // 2)
    if length % 2 == 1:  # keep output length ceil(L/2) with samples at even indices
        xpad = jnp.pad(xpad, ((0, 0), (0, 0), (0, 1)))
    return _strided_conv(xpad, dec_kern, 2)


@functools.partial(jax.jit, static_argnames=("params",))
def xqt_magnitude(y: jnp.ndarray, params: XQTParams = XQTParams()) -> jnp.ndarray:
    """Batched XQT magnitudes: (B, L) float -> (B, n_bins, 1 + L//hop)."""
    if y.ndim != 2:
        raise ValueError("xqt_magnitude expects (batch, samples)")
    kerns, dec_kern = _conv_constants(params)
    n_frames = params.num_frames(y.shape[-1])
    w = params.window_len
    bpo = params.bins_per_octave
    dec_max = params.n_octaves - 1
    # Reflect-pad ONCE at full rate so every octave analyzes the same
    # reflected signal as the direct-form oracle — per-octave reflection of a
    # decimated signal would diverge near the clip edges. The pad must cover
    # the lowest octave's half-window (w/2 samples at rate sr/2^dec_max) with
    # one spare sample per halving for ceil effects.
    pad = (w // 2 + 1) << dec_max

    x = _reflect_pad_last(y.astype(jnp.float32)[:, None, :], pad)
    octaves = []
    for j in range(params.n_octaves - 1, -1, -1):
        dec = params.n_octaves - 1 - j
        hop_j = params.hop >> dec
        pad_j = pad >> dec
        offset = pad_j - w // 2
        span = (n_frames - 1) * hop_j + w
        resp = _strided_conv(x[:, :, offset : offset + span], kerns[j], hop_j)  # (B, 2*bpo, T)
        mag = jnp.sqrt(resp[:, :bpo] ** 2 + resp[:, bpo:] ** 2 + 1e-30)
        octaves.append(mag)
        if j > 0:
            # optimization_barrier: REQUIRED for correctness on real TPUs.
            # When XLA fuses the whole multi-rate loop into one program, the
            # TPU backend miscompiles the composition (octaves at dec 1-5
            # read zeros for the last ~59 of 626 frames — magnitudes hit the
            # log floor; every op is correct in isolation, and CPU agrees
            # with the oracle). The barrier pins each decimation level as a
            # materialized value, which restores bit-parity with the CPU
            # path (measured max |dlog| 1.1e-4, pure f32 accumulation
            # noise). Cost: 7 tiny HBM round-trips, unmeasurable next to
            # the conv FLOPs.
            x = jax.lax.optimization_barrier(_decimate2(x, dec_kern))
    # octaves[0] is the top octave (bins 84..95); stack lowest-first.
    return jnp.concatenate(octaves[::-1], axis=1)


@functools.partial(jax.jit, static_argnames=("params",))
def log_xqt(y: jnp.ndarray, params: XQTParams = XQTParams()) -> jnp.ndarray:
    """Batched log-magnitude XQT: the model's input representation."""
    return jnp.log(xqt_magnitude(y, params) + params.log_eps)


def best_log_xqt(y: jnp.ndarray, params: XQTParams = XQTParams()) -> jnp.ndarray:
    """Fastest validated log-VQT for the current backend.

    On TPU the fused-cascade Pallas kernel measures 32 ms vs 56 ms for the
    XLA conv path at batch 48 x 10 s (tools/bench_probe), with parity to the
    CPU ground truth at ~1e-4; everywhere else (CPU tests, oracles) the XLA
    path runs natively. Override with ZNS_VQT_BACKEND=xla|pallas.
    """
    import os

    choice = os.environ.get("ZNS_VQT_BACKEND", "auto")
    on_tpu = jax.devices()[0].device_kind.startswith("TPU")
    if choice == "pallas" or (choice == "auto" and on_tpu and params.hop == 256):
        from zeronotesamba_tpu.ops.pallas.vqt_kernel import log_xqt_pallas

        return log_xqt_pallas(y, params, fused_cascade=True)
    return log_xqt(y, params)


def generate_xqt(signal: np.ndarray, sample_rate: int, mode: str) -> np.ndarray:
    """Reference-API-compatible front end (input_rep.generate_XQT parity).

    Accepts a mono numpy signal, returns ``(96, T)`` float32 log-magnitudes
    computed on the default JAX device (via the fastest validated path for
    that backend, see best_log_xqt).
    """
    if mode not in ("vqt", "cqt"):
        raise ValueError("Mode can only be vqt or cqt!")
    params = XQTParams(sample_rate=sample_rate, mode=mode)
    out = best_log_xqt(jnp.asarray(signal, dtype=jnp.float32)[None, :], params)
    return np.asarray(out[0], dtype=np.float32)
