"""Fused Pallas VQT kernel vs the XLA conv path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zeronotesamba_tpu.ops.filterbank import XQTParams
from zeronotesamba_tpu.ops.pallas.vqt_kernel import log_xqt_pallas, octave_log_xqt_pallas, _banks_f32
from zeronotesamba_tpu.ops.vqt import log_xqt


@pytest.mark.parametrize("mode", ["vqt", "cqt"])
@pytest.mark.parametrize("fused", [False, True])
def test_pallas_matches_xla_path(rng, mode, fused):
    """Both Pallas routes x both filterbank modes vs the XLA path — cqt
    shares hop=256 so best_log_xqt auto-routes it through the fused Pallas
    path on TPU (ADVICE r2: that route previously had no parity test)."""
    p = XQTParams(mode=mode)
    y = jnp.asarray(rng.standard_normal((2, 48000)).astype(np.float32))
    ref = np.asarray(log_xqt(y, p))
    out = np.asarray(log_xqt_pallas(y, p, interpret=True, fused_cascade=fused))
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


def test_fused_cascade_matches_xla_decimation(rng):
    """decimation_cascade_pallas levels == the XLA _decimate2 chain on every
    sample outside the documented edge-corruption margin."""
    from zeronotesamba_tpu.ops.pallas.vqt_kernel import decimation_cascade_pallas
    from zeronotesamba_tpu.ops.vqt import _conv_constants, _decimate2

    p = XQTParams()
    sig = jnp.asarray(rng.standard_normal((2, 256 * 40)).astype(np.float32))
    levels = decimation_cascade_pallas(sig, 3, interpret=True)
    _, dk = _conv_constants(p)
    dk = jnp.asarray(dk)
    x = sig[:, None, :]
    margin = 100  # > 2 * taps//2 accumulated edge depth
    for s in range(3):
        x = _decimate2(x, dk)
        ref = np.asarray(x[:, 0, :])
        got = np.asarray(levels[s])
        assert got.shape == ref.shape
        n = ref.shape[-1]
        np.testing.assert_allclose(got[:, margin : n - margin], ref[:, margin : n - margin], atol=1e-5)


def test_fused_cascade_pipeline_matches_xla(rng):
    """log_xqt_pallas(fused_cascade=True) == log_xqt on the full 96-bin VQT."""
    p = XQTParams()
    y = jnp.asarray(rng.standard_normal((2, 48000)).astype(np.float32))
    ref = np.asarray(log_xqt(y, p))
    out = np.asarray(log_xqt_pallas(y, p, interpret=True, fused_cascade=True))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=5e-4)


def test_cascade_vmem_level_cap():
    """The scoped-VMEM estimator caps fused depth for real clip lengths and
    is monotone in signal length (tpu_custom_call stack limit is 16 MB; a
    10 s clip at full 7-level depth measured 21.2 MB and failed to compile)."""
    from zeronotesamba_tpu.ops.pallas.vqt_kernel import _cascade_vmem_levels

    r_10s = 883  # ceil((160000 + 2*pad)/256) for the default XQTParams
    k = _cascade_vmem_levels(r_10s, 7)
    assert 1 <= k < 7
    assert _cascade_vmem_levels(80, 7) >= k  # shorter signal, same or deeper
    assert _cascade_vmem_levels(8 * r_10s, 7) <= k
    # Raising the budget must never reduce depth.
    assert _cascade_vmem_levels(r_10s, 7, budget_bytes=1 << 30) == 7


def test_fused_cascade_xla_chain_matches(rng):
    """The capped-depth path (Pallas prefix + XLA-chained deep levels) equals
    both the all-fused path and the plain XLA path."""
    from unittest import mock

    from zeronotesamba_tpu.ops.pallas import vqt_kernel as vk

    p = XQTParams()
    y = jnp.asarray(rng.standard_normal((1, 48000)).astype(np.float32))
    ref = np.asarray(log_xqt(y, p))
    # interpret mode normally fuses everything; force the capped path by
    # patching the estimator to 3 levels and dropping the interpret shortcut.
    with mock.patch.object(vk, "_cascade_vmem_levels", return_value=3):
        out = np.asarray(
            vk.log_xqt_pallas.__wrapped__(y, p, interpret=True, fused_cascade=True)
        )
    np.testing.assert_allclose(out, ref, atol=5e-4)
