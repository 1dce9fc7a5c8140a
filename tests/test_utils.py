"""Plotting and profiling utility smoke tests."""

import os

import numpy as np

import matplotlib

matplotlib.use("Agg")

from zeronotesamba_tpu.utils.plotting import plot_history, plot_pulse_over_waveform, plot_xqt
from zeronotesamba_tpu.utils.profiling import annotate, timer, timing_summary


def test_plot_xqt_and_pulse(tmp_path, rng):
    log_mag = rng.standard_normal((96, 200))
    plot_xqt(log_mag, save=str(tmp_path / "xqt.pdf"))
    assert os.path.exists(tmp_path / "xqt.pdf")

    sig = rng.standard_normal(16000).astype(np.float32)
    pulse = np.clip(np.abs(rng.standard_normal(63)), 0, 1)
    plot_pulse_over_waveform(sig, pulse, beat_times=np.array([0.2, 0.7]), save=str(tmp_path / "pulse.pdf"))
    assert os.path.exists(tmp_path / "pulse.pdf")


def test_plot_history(tmp_path):
    hist = {"train_loss": [3, 2, 1], "val_loss": [3, 2.5, 2], "val_pos": [0.5, 0.6, 0.7], "val_neg": [0.5, 0.4, 0.3]}
    plot_history(hist, str(tmp_path / "h"))
    assert os.path.exists(tmp_path / "h_loss.pdf")
    assert os.path.exists(tmp_path / "h_similarity.pdf")


def test_timers():
    with timer("unit_test_stage"):
        sum(range(1000))
    with annotate("unit_test_region"):
        pass
    s = timing_summary(reset=True)
    assert s["unit_test_stage"]["count"] == 1
    assert s["unit_test_stage"]["total_s"] >= 0
