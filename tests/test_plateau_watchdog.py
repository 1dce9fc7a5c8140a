"""Plateau watchdog: deadline-triggered reseed restarts (README limit (d)).

The demo-scale NT-Xent pretext can pin at the ln(batch_size)
constant-embedding attractor forever (measured: experiment seed 1 of the
demo grid, results/synthetic/summary_seed1.json). Escaping and
never-escaping runs are indistinguishable before the escape, so the guard
is a deadline: no val loss below ln(B) - margin within
``plateau_deadline`` epochs => reinit with seed + 1000*attempt and retry.
Reference parity note: the reference has no such guard (pretext.py trains a
fixed schedule and keeps best-val); plateau_deadline=0 restores that.
"""

import numpy as np

from zeronotesamba_tpu.experiments.pretext_driver import PretextRunConfig, train_pretext


def _bank(n=6, frames=64, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, 2, 96, frames)).astype(np.float32)


def test_watchdog_restarts_when_never_escaped():
    # margin=10 makes escape impossible (val loss can't go below ln(4)-10),
    # so every non-final attempt must be cut at the deadline and the final
    # attempt must run the full budget.
    bank = _bank()
    cfg = PretextRunConfig(
        task="zerons", num_epochs=3, batch_size=4, crop_frames=32,
        lr=1e-4, seed=0, plateau_deadline=1, plateau_margin=10.0,
        plateau_restarts=2,
    )
    _, hist = train_pretext(bank[2:], bank[:2], cfg)
    # 2 truncated attempts x 1 epoch + final attempt x 3 epochs = 5 epochs.
    assert len(hist["val_loss"]) == 5
    assert hist["restarts"] == [1, 2]


def test_watchdog_no_restart_when_escaped():
    # margin=-10 means ANY val loss counts as escaped at epoch 0, so the
    # deadline never fires and a single attempt runs the whole budget.
    bank = _bank()
    cfg = PretextRunConfig(
        task="zerons", num_epochs=2, batch_size=4, crop_frames=32,
        lr=1e-4, seed=0, plateau_deadline=1, plateau_margin=-10.0,
        plateau_restarts=2,
    )
    _, hist = train_pretext(bank[2:], bank[:2], cfg)
    assert len(hist["val_loss"]) == 2
    assert hist["restarts"] == []


def test_watchdog_disabled_is_reference_parity():
    bank = _bank()
    base = PretextRunConfig(task="zerons", num_epochs=2, batch_size=4,
                            crop_frames=32, lr=1e-4, seed=0)
    guarded = PretextRunConfig(task="zerons", num_epochs=2, batch_size=4,
                               crop_frames=32, lr=1e-4, seed=0,
                               plateau_deadline=2, plateau_margin=10.0,
                               plateau_restarts=0)
    _, h0 = train_pretext(bank[2:], bank[:2], base)
    # restarts=0 with a deadline set must still train identically (one
    # attempt, full budget).
    _, h1 = train_pretext(bank[2:], bank[:2], guarded)
    assert h0["val_loss"] == h1["val_loss"]
    assert h1["restarts"] == []


def test_driver_multistep_dispatch_trains():
    """steps_per_call>1 (scan dispatch) runs the same epoch budget: per-epoch
    history lengths match the single-dispatch run and every track still
    contributes (6 tracks / S=4 -> 2 padded scan programs per epoch)."""
    bank = _bank()
    single = PretextRunConfig(task="zerons", num_epochs=2, batch_size=4,
                              crop_frames=32, lr=1e-4, seed=0)
    multi = PretextRunConfig(task="zerons", num_epochs=2, batch_size=4,
                             crop_frames=32, lr=1e-4, seed=0, steps_per_call=4,
                             scan_unroll=True)
    _, h0 = train_pretext(bank[2:], bank[:2], single)
    _, h1 = train_pretext(bank[2:], bank[:2], multi)
    assert len(h1["val_loss"]) == len(h0["val_loss"]) == 2
    assert all(np.isfinite(v) for v in h1["train_loss"] + h1["val_loss"])


def test_watchdog_restart_uses_fresh_stream():
    # The restarted attempt must come from a different init: its first-epoch
    # val loss differs from attempt 0's first epoch (different PRNGKey).
    bank = _bank()
    cfg = PretextRunConfig(
        task="zerons", num_epochs=2, batch_size=4, crop_frames=32,
        lr=1e-4, seed=0, plateau_deadline=1, plateau_margin=10.0,
        plateau_restarts=1,
    )
    _, hist = train_pretext(bank[2:], bank[:2], cfg)
    assert len(hist["val_loss"]) == 3  # 1 truncated + 2 full
    assert hist["val_loss"][0] != hist["val_loss"][1]
