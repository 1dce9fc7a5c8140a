"""Beat decoder tests: DBN, Ellis DP, threshold — against known pulses."""

import numpy as np
import pytest

from zeronotesamba_tpu.decode import decode, threshold_beats
from zeronotesamba_tpu.decode.dbn import DBNBeatDecoderConfig, decode_beats
from zeronotesamba_tpu.decode.ellis import beat_track_dp, beat_track_signal, estimate_tempo
from zeronotesamba_tpu.data.synthetic import click_track
from zeronotesamba_tpu.metrics.beat import evaluate_beats, f_measure

FPS = 62.5


def synthetic_pulse(bpm, duration_s, fps=FPS, width=1, noise=0.02, phase_s=0.1, seed=0):
    """Model-like beat activation: peaks at beat frames, low noise elsewhere."""
    rng = np.random.default_rng(seed)
    n = int(duration_s * fps)
    act = np.abs(noise * rng.standard_normal(n))
    beats = np.arange(phase_s, duration_s - 0.2, 60.0 / bpm)
    for bt in beats:
        f = int(round(bt * fps))
        if 0 < f < n - 1:
            act[f] = 0.95
            act[f - 1] = max(act[f - 1], 0.5)
            act[f + 1] = max(act[f + 1], 0.5)
    return np.clip(act, 0, 1), beats


@pytest.mark.parametrize("bpm", [60, 100, 128, 180])
def test_dbn_clean_pulse(bpm):
    act, beats = synthetic_pulse(bpm, 30.0)
    est = decode_beats(act)
    f1 = f_measure(beats[beats >= 5], est[est >= 5])
    assert f1 > 0.95, f"bpm={bpm} f1={f1} nbeats={len(beats)} nest={len(est)}"


def test_dbn_noisy_pulse():
    rng = np.random.default_rng(3)
    act, beats = synthetic_pulse(120, 30.0, noise=0.15, seed=3)
    # Add distractor spikes
    for i in rng.integers(0, len(act), 20):
        act[i] = min(1.0, act[i] + 0.4)
    est = decode_beats(act)
    f1 = f_measure(beats[beats >= 5], est[est >= 5])
    assert f1 > 0.9, f1


def test_dbn_tempo_range_clamped():
    # 40 bpm is below min_bpm=55: the DBN must produce a faster (meter-related)
    # interpretation, i.e. intervals within the state space.
    act, _ = synthetic_pulse(40, 30.0)
    est = decode_beats(act)
    intervals = np.diff(est)
    assert len(est) > 10
    assert intervals.max() < 60.0 / 55.0 + 0.05
    assert intervals.min() > 60.0 / 215.0 - 0.05


def test_dbn_correct_false_wrap_beats():
    act, beats = synthetic_pulse(120, 20.0)
    cfg = DBNBeatDecoderConfig(correct=False)
    est = decode_beats(act, cfg)
    f1 = f_measure(beats[beats >= 5], est[est >= 5])
    assert f1 > 0.85, f1


def test_threshold_decoder_matches_reference_semantics():
    act = np.array([0.0, 0.1, 0.05, 0.2, 0.074, 0.076])
    est = threshold_beats(act, 0.075, fps=10.0)
    np.testing.assert_allclose(est, [0.1, 0.3, 0.5])


def test_estimate_tempo():
    act, _ = synthetic_pulse(120, 30.0)
    t = estimate_tempo(act, FPS)
    assert abs(t - 120) < 6 or abs(t - 60) < 3 or abs(t - 240) < 12


@pytest.mark.parametrize("bpm", [90, 120, 150])
def test_ellis_dp_on_pulse(bpm):
    act, beats = synthetic_pulse(bpm, 30.0)
    est = beat_track_dp(act, FPS)
    ref = beats[beats >= 5]
    e = est[est >= 5]
    f1 = f_measure(ref, e)
    assert f1 > 0.85, f"bpm={bpm} f1={f1} n_est={len(est)}"


def test_ellis_on_raw_audio_clicks():
    sig, beats = click_track(30.0, 120.0, accomp=True, seed=5)
    est = beat_track_signal(sig, sr=16000, hop=256)
    res = evaluate_beats(beats, est)
    assert res[0] > 0.8, f"f1={res[0]}"


def test_decode_dispatch():
    act, _ = synthetic_pulse(120, 10.0)
    for m in ("dbn", "librosa", "threshold"):
        out = decode(act, m)
        assert out.ndim == 1
    with pytest.raises(ValueError):
        decode(act, "nope")


def test_dbn_empty_and_constant():
    assert decode_beats(np.zeros(0)).size == 0
    est = decode_beats(np.full(600, 0.01))
    assert est.size >= 0  # must not crash on flat input
