"""Resampling, RMS, and audio I/O tests."""

import numpy as np

from zeronotesamba_tpu.data import audio_io
from zeronotesamba_tpu.ops.resample import resample_jax, resample_poly_host
from zeronotesamba_tpu.ops.rms import frame_rms, frame_rms_host


def test_resample_host_tone():
    sr_in, sr_out = 44100, 16000
    t = np.arange(sr_in) / sr_in
    y = np.sin(2 * np.pi * 440.0 * t)
    z = resample_poly_host(y, sr_in, sr_out)
    assert abs(len(z) - sr_out) <= 2
    tt = np.arange(len(z)) / sr_out
    ref = np.sin(2 * np.pi * 440.0 * tt)
    err = np.abs(z[200:-200] - ref[200:-200])
    assert err.max() < 0.02


def test_resample_jax_matches_host():
    sr_in, sr_out = 44100, 16000
    rng = np.random.default_rng(0)
    # Band-limited random signal (below the target Nyquist).
    n = sr_in
    spec = np.zeros(n // 2 + 1, dtype=complex)
    keep = int(6000 / sr_in * n)
    spec[1:keep] = rng.standard_normal(keep - 1) + 1j * rng.standard_normal(keep - 1)
    y = np.fft.irfft(spec, n)
    y /= np.abs(y).max()
    host = resample_poly_host(y, sr_in, sr_out)
    dev = np.asarray(resample_jax(y[None].astype(np.float32), sr_in, sr_out))[0]
    m = min(len(host), len(dev))
    err = np.abs(host[500 : m - 500] - dev[500 : m - 500])
    assert err.max() < 5e-3, err.max()


def test_frame_rms_matches_host(rng):
    y = rng.standard_normal((2, 16000)).astype(np.float32)
    dev = np.asarray(frame_rms(y))
    for i in range(2):
        host = frame_rms_host(y[i])
        # Host pads with zeros (constant); device likewise.
        np.testing.assert_allclose(dev[i], host, atol=5e-4)
    assert dev.shape == (2, 1 + 16000 // 512)


def test_wav_roundtrip(tmp_path, rng):
    sig = rng.uniform(-0.9, 0.9, 8000).astype(np.float32)
    p16 = str(tmp_path / "a16.wav")
    pf32 = str(tmp_path / "af32.wav")
    audio_io.write_wav(p16, sig, 16000, dtype="int16")
    audio_io.write_wav(pf32, sig, 16000, dtype="float32")
    r16, sr16 = audio_io.read_wav(p16)
    rf32, srf32 = audio_io.read_wav(pf32)
    assert sr16 == srf32 == 16000
    assert np.abs(r16 - sig).max() < 1e-3
    np.testing.assert_allclose(rf32, sig, atol=1e-7)


def test_wav_stereo_and_mono_fold(tmp_path, rng):
    sig = np.stack([np.ones(1000) * 0.5, np.zeros(1000)], axis=1).astype(np.float32)
    p = str(tmp_path / "st.wav")
    audio_io.write_wav(p, sig, 22050)
    r, sr = audio_io.read_wav(p)
    assert r.shape == (1000, 2)
    mono = audio_io.convert_to_mono(r)
    np.testing.assert_allclose(mono, 0.25 * np.ones(1000), atol=1e-3)


def test_load_audio_resamples(tmp_path):
    sr_in = 44100
    t = np.arange(sr_in) / sr_in
    y = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = str(tmp_path / "t.wav")
    audio_io.write_wav(p, y, sr_in)
    z, sr = audio_io.load_audio(p, target_sr=16000)
    assert sr == 16000
    assert abs(len(z) - 16000) <= 2
