"""Difficulty knobs of the synthetic generator (data/synthetic.py).

Pure-numpy checks (no JAX): the hardened demo corpora rest on these
semantics — annotations follow PLAYED (jittered/drifting) beats, ghosting
attenuates but never unannotates, the hat layer is phase-free, and the
clean defaults stay bit-stable for the DSP/decoder fixtures.
"""

import numpy as np

from zeronotesamba_tpu.data.synthetic import _beat_grid, click_track, percussive_pair


def test_defaults_are_clean_metronome():
    sig, beats = click_track(6.0, 120.0, seed=3)
    gaps = np.diff(beats)
    np.testing.assert_allclose(gaps, 0.5, atol=1e-9)  # metronomic
    sig2, beats2 = click_track(6.0, 120.0, seed=3)
    np.testing.assert_array_equal(sig, sig2)  # deterministic fixture


def test_drift_modulates_gaps_and_jitter_perturbs():
    rng = np.random.default_rng(0)
    t_drift = _beat_grid(24.0, 120.0, 0.1, rng, drift=0.06)
    gaps = np.diff(t_drift)
    assert gaps.min() < 0.5 * 0.97 and gaps.max() > 0.5 * 1.03
    assert np.all(gaps > 0)

    rng = np.random.default_rng(1)
    t_j = _beat_grid(24.0, 120.0, 0.1, rng, jitter_s=0.02)
    base = np.arange(0.1, 24.0 - 0.05, 0.5)[: len(t_j)]
    dev = np.abs(t_j - base)
    assert 0.005 < dev.mean() < 0.04  # ~N(0, 20ms) deviations
    assert np.all(np.diff(t_j) > 0)  # still sorted


def test_annotations_follow_played_hits():
    """The click energy must sit AT the (jittered) annotation, not the
    nominal grid — human annotators mark what was played."""
    sr = 16000
    sig, beats = click_track(8.0, 100.0, sr=sr, jitter_s=0.02, accomp=False,
                             noise=0.0, seed=7)
    env = np.abs(sig)
    for bt in beats:
        i = int(round(bt * sr))
        win = env[max(0, i - 80) : i + 400]
        assert win.max() > 0.1  # a hit is present within ±5 ms / +25 ms


def test_ghost_beats_attenuate_but_stay_annotated():
    sig0, beats0 = click_track(8.0, 120.0, accomp=False, noise=0.0, seed=5)
    sig1, beats1 = click_track(8.0, 120.0, accomp=False, noise=0.0, seed=5, drop_p=0.9)
    np.testing.assert_array_equal(beats0, beats1)  # annotation unchanged
    assert np.abs(sig1).sum() < 0.5 * np.abs(sig0).sum()  # but much quieter


def test_hat_layer_covers_on_beat_and_mid_slots():
    """offbeat>0 adds hits at beats AND midpoints (hats play through)."""
    sr = 16000
    sig, beats = click_track(8.0, 120.0, sr=sr, accomp=False, noise=0.0, seed=9,
                             click_freq=0.0,  # silent kick, default hit length
                             offbeat=1.0, offbeat_p=1.0, offbeat_freq=600.0)
    env = np.abs(sig)
    mids = beats[:-1] + 0.5 * np.diff(beats)
    for ts in (beats[1:-1], mids):
        hits = 0
        for t in ts:
            i = int(round(t * sr))
            if env[max(0, i - 40) : i + 250].max() > 0.05:
                hits += 1
        assert hits >= 0.9 * len(ts)


def test_offbeat_accent_louder_mids():
    sr = 16000
    # Small hat amplitude so the peak-normalization guard (|sig| <= 0.95)
    # never rescales either variant — the comparison must see raw amps.
    kw = dict(sr=sr, accomp=False, noise=0.0, seed=11, click_freq=0.0,
              offbeat=0.15, offbeat_p=1.0, offbeat_freq=600.0)
    sig_acc, beats = click_track(8.0, 120.0, offbeat_accent=2.5, **kw)
    sig_flat, _ = click_track(8.0, 120.0, offbeat_accent=1.0, **kw)
    mids = beats[:-1] + 0.5 * np.diff(beats)

    def energy_at(sig, ts):
        return float(np.mean([
            np.abs(sig[int(round(t * sr)) : int(round(t * sr)) + 300]).max() for t in ts
        ]))

    assert energy_at(sig_acc, mids) > 1.5 * energy_at(sig_flat, mids)
    np.testing.assert_allclose(energy_at(sig_acc, beats), energy_at(sig_flat, beats), rtol=0.05)


def test_percussive_pair_bleed_and_depth():
    kw = dict(seed=13, harmonics=5, click_freq=1200.0)
    a0, p0, b0 = percussive_pair(6.0, 120.0, **kw, bleed=0.0, noise=0.0)
    a1, p1, b1 = percussive_pair(6.0, 120.0, **kw, bleed=0.3, noise=0.0)
    np.testing.assert_array_equal(b0, b1)
    # Bleed mixes the percussive clicks into the anchor: correlation with
    # the clean percussive stem appears.
    corr0 = np.abs(np.dot(a0, p0)) / (np.linalg.norm(a0) * np.linalg.norm(p0))
    corr1 = np.abs(np.dot(a1, p0)) / (np.linalg.norm(a1) * np.linalg.norm(p0))
    # The percussive stem is sparse (~2% duty cycle) so even 0.3 bleed only
    # moves waveform cosine a few points — direction is what matters.
    assert corr1 > corr0 + 0.02
    # harm_depth=0 flattens the anchor's beat-rate AMPLITUDE ENVELOPE
    # (relative spread of the 50 ms frame-RMS series).
    af, _, _ = percussive_pair(6.0, 120.0, **kw, harm_depth=0.0, noise=0.0)
    am, _, _ = percussive_pair(6.0, 120.0, **kw, harm_depth=0.4, noise=0.0)

    def env_cv(x):
        w = 800
        r = np.sqrt(np.mean(x[: len(x) // w * w].reshape(-1, w) ** 2, axis=1))
        return float(np.std(r) / np.mean(r))

    assert env_cv(af) < 0.5 * env_cv(am)
