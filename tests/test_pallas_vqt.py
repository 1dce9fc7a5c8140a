"""Fused Pallas VQT kernel vs the XLA conv path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zeronotesamba_tpu.ops.filterbank import XQTParams
from zeronotesamba_tpu.ops.pallas.vqt_kernel import log_xqt_pallas, octave_log_xqt_pallas, _banks_f32
from zeronotesamba_tpu.ops.vqt import log_xqt


def test_pallas_matches_xla_path(rng):
    p = XQTParams()
    y = jnp.asarray(rng.standard_normal((2, 48000)).astype(np.float32))
    ref = np.asarray(log_xqt(y, p))
    out = np.asarray(log_xqt_pallas(y, p, interpret=True))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=5e-4)


def test_octave_kernel_single(rng):
    p = XQTParams()
    banks = _banks_f32(p)
    hop, w = 256, 256
    n_frames = 200
    sig = jnp.asarray(rng.standard_normal((1, (n_frames - 1) * hop + w)).astype(np.float32))
    out = octave_log_xqt_pallas(
        sig, jnp.asarray(banks[7]), hop=hop, w=w, n_frames=n_frames, log_eps=p.log_eps, interpret=True
    )
    assert out.shape == (1, n_frames, 12)
    # Direct dense check for a handful of frames.
    bank = np.asarray(banks[7])  # (256, 128), first 24 cols live
    s = np.asarray(sig)[0]
    for m in [0, 77, 199]:
        frame = s[m * hop : m * hop + w]
        resp = frame @ bank[:, :24]
        mag = np.sqrt(resp[:12] ** 2 + resp[12:24] ** 2 + 1e-30)
        np.testing.assert_allclose(np.asarray(out)[0, m], np.log(mag + p.log_eps), atol=1e-4)
