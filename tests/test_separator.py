"""Learned drum/rest separator: SI-SDR metric, training step, host API."""

import jax
import jax.numpy as jnp
import numpy as np

from zeronotesamba_tpu.train.separator import (
    CROP_LEN,
    SeparatorConfig,
    eval_si_sdr,
    init_separator_state,
    separate_learned,
    si_sdr,
    synth_bank,
    train_step,
)


def test_si_sdr_definition():
    g = np.random.default_rng(0)
    ref = jnp.asarray(g.standard_normal((2, 4000)).astype(np.float32))
    # Scale invariance: 0.3x the reference is a perfect estimate.
    perfect = float(jnp.mean(si_sdr(0.3 * ref, ref)))
    assert perfect > 60.0
    # Known SNR: est = ref + noise at 10 dB -> SI-SDR ~ 10 dB.
    noise = jnp.asarray(g.standard_normal((2, 4000)).astype(np.float32))
    noise = noise / jnp.linalg.norm(noise, axis=-1, keepdims=True) * jnp.linalg.norm(ref, axis=-1, keepdims=True)
    got = float(jnp.mean(si_sdr(ref + noise * 10 ** (-0.5), ref)))
    assert abs(got - 10.0) < 0.5


def test_separator_trains_and_separates():
    cfg = SeparatorConfig(steps=8, batch_size=2, lr=1e-3, seed=0)
    bank = synth_bank(2, 6.0, seed=3)
    assert bank.shape[1] == 3 and bank.shape[2] >= CROP_LEN
    state = init_separator_state(cfg, jax.random.PRNGKey(0))
    g = np.random.default_rng(1)
    losses = []
    for _ in range(cfg.steps):
        song = jnp.asarray(g.integers(0, 2, size=2, dtype=np.int32))
        offs = jnp.asarray(g.integers(0, bank.shape[-1] - CROP_LEN + 1, size=2, dtype=np.int32))
        state, loss = train_step(state, jnp.asarray(bank), song, offs)
        losses.append(float(loss))
    assert losses[-1] < losses[0]

    val = synth_bank(1, 4.0, seed=9)
    sd, sr_ = eval_si_sdr(state, jnp.asarray(val[:, 0]), jnp.asarray(val[:, 1]), jnp.asarray(val[:, 2]))
    assert np.isfinite(float(sd)) and np.isfinite(float(sr_))

    drums, rest = separate_learned(val[0, 0], state.params)
    assert drums.shape == rest.shape == val[0, 0].shape
    # Mask pair sums to ~the mixture (softmax masks partition the spec).
    recon = drums + rest
    err = np.linalg.norm(recon - val[0, 0]) / np.linalg.norm(val[0, 0])
    assert err < 0.15
