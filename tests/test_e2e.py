"""End-to-end slice: audio file -> stems -> VQT -> model -> decode -> metrics.

The framework's minimum demo (SURVEY.md §7.2 step 4) plus a learning smoke
test: a vanilla model trained briefly on synthetic click tracks must beat
random on held-out clicks.
"""

import numpy as np
import pytest

import jax

from zeronotesamba_tpu.data import audio_io
from zeronotesamba_tpu.data.datasets import build_synthetic
from zeronotesamba_tpu.data.synthetic import click_track
from zeronotesamba_tpu.infer import BeatTracker
from zeronotesamba_tpu.metrics.beat import evaluate_beats
from zeronotesamba_tpu.train.supervised import StagedDataset, SupervisedConfig, init_state, run_epoch


def test_inference_pipeline_runs(tmp_path):
    sig, beats = click_track(8.0, 120.0, seed=11)
    path = str(tmp_path / "song.wav")
    audio_io.write_wav(path, sig, 16000)

    tracker = BeatTracker()
    res = tracker.track_file(path, separation="hpss", decoder="dbn")
    t = res.fused_pulse.shape[0]
    assert res.vqt.shape == (2, 96, t)
    assert res.anchor_pulse.shape == res.positive_pulse.shape == (t,)
    assert np.all((res.fused_pulse >= 0) & (res.fused_pulse <= 1))
    assert res.beat_times is not None


def test_trained_model_learns_beats():
    """Learning smoke on CPU: loss must leave the base-rate plateau and F1
    must beat the untrained model. (The full converge-to-F1=1.0 check runs
    on real TPU hardware — see .claude/skills/verify/SKILL.md — where 16
    songs reach held-out F1 1.000 by ~epoch 50.)"""
    train_ds = build_synthetic(n_songs=4, duration_s=4.0, seed=21, two_stream=False)
    test_ds = build_synthetic(n_songs=2, duration_s=4.0, seed=99, two_stream=False)

    cfg = SupervisedConfig(status="vanilla", lr=3e-4, batch_size=4, bucket_frames=64)
    state = init_state(cfg, train_ds[0], jax.random.PRNGKey(0))
    staged = StagedDataset(train_ds.records, cfg.bucket_frames)
    plan = staged.plan(train_ds.names, cfg.batch_size)
    staged_test = StagedDataset(test_ds.records, cfg.bucket_frames)
    test_plan = staged_test.plan(test_ds.names, 2)

    _, loss0, m0 = run_epoch(state, staged_test, test_plan, cfg, train=False, score=True)
    losses = []
    for epoch in range(20):
        state, loss, _ = run_epoch(state, staged, plan, cfg, train=True, epoch=epoch, score=False)
        losses.append(loss)
    _, loss1, m1 = run_epoch(state, staged_test, test_plan, cfg, train=False, score=True)
    assert losses[-1] < 0.8 * losses[0], losses
    assert loss1 < loss0
    assert m1[0] >= m0[0], (m0, m1)
