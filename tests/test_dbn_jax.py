"""On-device (lax.scan) DBN Viterbi vs the numpy reference implementation."""

import numpy as np
import pytest

from zeronotesamba_tpu.decode.dbn import DBNBeatDecoderConfig, decode_beats
from zeronotesamba_tpu.decode.dbn_jax import (
    decode_beats_batch_device,
    decode_beats_device,
    viterbi_path_device,
)
from zeronotesamba_tpu.metrics.beat import f_measure


def _pulse(bpm, dur=20.0, fps=62.5, seed=0):
    rng = np.random.default_rng(seed)
    n = int(dur * fps)
    act = np.abs(0.05 * rng.standard_normal(n))
    period = int(round(60.0 / bpm * fps))
    for f in range(5, n - 2, period):
        act[f] = 0.9
    return np.clip(act, 0, 1)


def test_device_path_matches_numpy():
    act = _pulse(125)
    cfg = DBNBeatDecoderConfig()
    ref = decode_beats(act, cfg, use_native=False)
    dev = decode_beats_device(act, cfg)
    np.testing.assert_allclose(dev, ref)


def test_device_path_matches_numpy_uncorrected():
    act = _pulse(90, seed=2)
    cfg = DBNBeatDecoderConfig(correct=False)
    ref = decode_beats(act, cfg, use_native=False)
    dev = decode_beats_device(act, cfg)
    np.testing.assert_allclose(dev, ref)


def test_batched_decode_metric_equivalent():
    cfg = DBNBeatDecoderConfig()
    acts, lengths, singles = [], [], []
    t_pad = int(20 * 62.5)
    for i, bpm in enumerate([80, 120, 160]):
        a = _pulse(bpm, dur=16.0 + 1.2 * i, seed=i)
        singles.append(decode_beats(a, cfg, use_native=False))
        lengths.append(len(a))
        acts.append(np.pad(a, (0, t_pad - len(a))))
    batched = decode_beats_batch_device(np.stack(acts), lengths, cfg)
    for single, batch in zip(singles, batched):
        # Per-song backtrack start makes batched decode exactly per-song.
        np.testing.assert_allclose(batch, single)
