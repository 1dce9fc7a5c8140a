"""VQT/CQT front-end: multi-rate TPU kernel vs direct full-rate oracle."""

import numpy as np
import pytest

from zeronotesamba_tpu.data.synthetic import click_track
from zeronotesamba_tpu.ops.filterbank import C0_HZ, XQTParams
from zeronotesamba_tpu.ops.oracle import log_xqt_direct, xqt_direct
from zeronotesamba_tpu.ops.vqt import generate_xqt, log_xqt, xqt_magnitude


def test_frame_grid_matches_reference_shape():
    # 10 s @ 16 kHz must produce 626 frames (reference bank shape, pretext.py:255-263)
    p = XQTParams()
    assert p.num_frames(160000) == 626
    assert p.n_bins == 96
    assert abs(p.fps - 62.5) < 1e-9
    assert abs(p.fmin - 16.351597831287414) < 1e-9


@pytest.mark.parametrize("mode", ["vqt", "cqt"])
def test_pure_tone_peaks_at_correct_bin(mode):
    p = XQTParams(mode=mode)
    sr = p.sample_rate
    for k in [5, 30, 60, 90]:
        f = C0_HZ * 2 ** (k / 12)
        t = np.arange(int(2.0 * sr)) / sr
        y = np.sin(2 * np.pi * f * t).astype(np.float32)
        mag = np.asarray(xqt_magnitude(y[None], p))[0]
        mid = mag[:, mag.shape[1] // 2]
        assert int(np.argmax(mid)) == k, f"mode={mode} bin {k} peaked at {np.argmax(mid)}"


@pytest.mark.parametrize("mode", ["vqt", "cqt"])
def test_multirate_matches_direct_oracle(mode, rng):
    p = XQTParams(mode=mode)
    sig, _ = click_track(3.0, 120.0, seed=3)
    direct = xqt_direct(sig, p)
    fast = np.asarray(xqt_magnitude(sig[None], p), dtype=np.float64)[0]
    assert fast.shape == direct.shape

    # Top octave runs at full rate with the oracle's exact kernels: the conv
    # must reproduce the direct form to float32 accumulation accuracy.
    top = slice(84, 96)
    scale = direct[top].max(axis=1, keepdims=True)
    assert (np.abs(fast[top] - direct[top]) / scale).max() < 1e-4

    # Lower octaves differ only by the information genuinely discarded by
    # decimation (kernel-sidelobe pickup of out-of-band content). Null-damped
    # relative error (cellwise relative error is meaningless at narrowband
    # envelope nulls).
    per_bin_max = direct.max(axis=1, keepdims=True)
    nerr = np.abs(fast - direct) / (direct + 0.01 * per_bin_max)
    assert np.quantile(nerr, 0.99) < 0.02, f"p99 {np.quantile(nerr, 0.99)}"
    assert nerr.max() < 0.10, f"max {nerr.max()}"

    # Log-domain agreement on energetic cells (what the CNN consumes).
    mask = direct > per_bin_max * 0.05
    dlog = np.abs(np.log(fast[mask] + p.log_eps) - np.log(direct[mask] + p.log_eps))
    assert dlog.mean() < 2e-3
    assert np.quantile(dlog, 0.99) < 0.02


def test_tone_magnitude_scaling_convention():
    # Unit sine at a bin center: |C| ~ sqrt(l_k)/2 under the documented convention.
    p = XQTParams(mode="cqt")
    k = 48
    f = C0_HZ * 2 ** (k / 12)
    lk = p.filter_lengths()[k]
    t = np.arange(4 * p.sample_rate) / p.sample_rate
    y = np.sin(2 * np.pi * f * t).astype(np.float32)
    mag = np.asarray(xqt_magnitude(y[None], p))[0]
    mid = mag[k, mag.shape[1] // 2]
    assert abs(mid - np.sqrt(lk) / 2) / (np.sqrt(lk) / 2) < 0.02


def test_generate_xqt_reference_api(rng):
    sig = rng.standard_normal(16000).astype(np.float32)
    out = generate_xqt(sig, 16000, "vqt")
    assert out.shape == (96, 63)
    assert out.dtype == np.float32
    with pytest.raises(ValueError):
        generate_xqt(sig, 16000, "stft")
    ref = log_xqt_direct(sig)
    mask = ref > np.log(1e-2)
    assert np.abs(out[mask] - ref[mask]).mean() < 0.02


def test_batched_consistency(rng):
    p = XQTParams()
    sigs = rng.standard_normal((3, 32000)).astype(np.float32)
    batched = np.asarray(log_xqt(sigs, p))
    for i in range(3):
        single = np.asarray(log_xqt(sigs[i : i + 1], p))[0]
        np.testing.assert_allclose(batched[i], single, rtol=0, atol=1e-4)


def test_no_log_floor_cells_on_noise():
    """Regression guard for the TPU whole-program fusion miscompile (fixed
    with optimization_barrier in xqt_magnitude): broadband noise excites
    every VQT bin, so NO cell may sit at the log floor log(eps) — the
    miscompile zeroed the last ~59 frames of octaves 2-6 on real TPUs.
    Runs on whatever backend the session uses; re-run on TPU after touching
    ops/vqt.py or the XLA/jax version (see .claude/skills/verify)."""
    import jax.numpy as jnp

    from zeronotesamba_tpu.ops.vqt import log_xqt

    rng = np.random.default_rng(11)
    y = jnp.asarray(rng.standard_normal((1, 160000)).astype(np.float32))
    out = np.asarray(log_xqt(y, XQTParams()))
    floor = np.log(1e-9)
    assert (out < floor + 1.0).sum() == 0, f"{(out < floor + 1.0).sum()} cells at the log floor"


def test_best_log_xqt_dispatch(monkeypatch):
    """best_log_xqt: XLA path on CPU by default; env override forces a path."""
    import jax.numpy as jnp

    from zeronotesamba_tpu.ops import vqt as vqt_mod

    y = jnp.zeros((1, 16000), jnp.float32)
    p = XQTParams()
    # auto on CPU -> the XLA path (bit-identical to log_xqt)
    monkeypatch.delenv("ZNS_VQT_BACKEND", raising=False)
    np.testing.assert_array_equal(
        np.asarray(vqt_mod.best_log_xqt(y, p)), np.asarray(vqt_mod.log_xqt(y, p))
    )
    # explicit xla override is honored regardless of backend
    monkeypatch.setenv("ZNS_VQT_BACKEND", "xla")
    np.testing.assert_array_equal(
        np.asarray(vqt_mod.best_log_xqt(y, p)), np.asarray(vqt_mod.log_xqt(y, p))
    )
