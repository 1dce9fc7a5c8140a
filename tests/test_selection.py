"""Beat-proxy pretext checkpoint selection plumbing (VERDICT r3 next #4)."""

import os

import numpy as np
import pytest

from zeronotesamba_tpu.data.datasets import build_synthetic
from zeronotesamba_tpu.experiments.pretext_driver import (
    PretextRunConfig,
    train_pretext,
    zero_shot_proxy_f1,
)


def test_proxy_selection_tracks_and_checkpoints_both(tmp_path):
    rng = np.random.default_rng(0)
    bank = rng.standard_normal((6, 2, 96, 64)).astype(np.float32)
    proxy = build_synthetic(2, 4.0, seed=5)
    ckpt = str(tmp_path / "ck")
    cfg = PretextRunConfig(
        task="zerons", num_epochs=2, batch_size=4, crop_frames=32,
        lr=1e-4, seed=0, checkpoint_path=ckpt,
        selection="proxy_f1", proxy_dataset=proxy, proxy_every=1,
        proxy_eval_method="threshold",
    )
    best, hist = train_pretext(bank[2:], bank[:2], cfg)
    assert len(hist["proxy_f1"]) == 2 and hist["proxy_epoch"] == [0, 1]
    assert all(0.0 <= f <= 1.0 for f in hist["proxy_f1"])
    # Selected (proxy) checkpoint at the base path, val-loss one alongside.
    assert os.path.exists(ckpt) and os.path.exists(ckpt + "_valsel")
    # The returned params reproduce the best proxy score.
    f1 = zero_shot_proxy_f1(proxy, best, eval_method="threshold")
    assert f1 == pytest.approx(max(hist["proxy_f1"]), abs=1e-6)


def test_proxy_selection_requires_dataset():
    cfg = PretextRunConfig(selection="proxy_f1", proxy_dataset=None, num_epochs=1)
    bank = np.zeros((4, 2, 96, 64), np.float32)
    with pytest.raises(ValueError, match="proxy_dataset"):
        train_pretext(bank[2:], bank[:2], cfg)
