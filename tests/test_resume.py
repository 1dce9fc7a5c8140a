"""Pretext mid-run resume: interrupted training continues with optimizer state."""

import numpy as np

import jax

from zeronotesamba_tpu.experiments.pretext_driver import PretextRunConfig, train_pretext


def _bank(rng, n=4, t=128):
    base = rng.standard_normal((2, 96, t)).astype(np.float32)
    return np.stack([base + 0.2 * rng.standard_normal(base.shape).astype(np.float32) for _ in range(n)])


def test_pretext_resume_continues(tmp_path, rng):
    train_bank = _bank(rng, 2)
    val_bank = _bank(rng, 1)
    resume_dir = str(tmp_path / "resume")

    cfg1 = PretextRunConfig(num_epochs=2, batch_size=2, crop_frames=64, seed=3, resume_dir=resume_dir)
    _, hist1 = train_pretext(train_bank, val_bank, cfg1)
    assert len(hist1["val_loss"]) == 2

    # "Restart": same resume_dir, larger epoch budget — must continue at 2.
    cfg2 = PretextRunConfig(num_epochs=4, batch_size=2, crop_frames=64, seed=3, resume_dir=resume_dir)
    _, hist2 = train_pretext(train_bank, val_bank, cfg2)
    assert len(hist2["val_loss"]) == 2  # only epochs 2..3 ran in this process
