"""Böck-style TCN baseline: shapes, logits consistency, trainability."""

import jax
import jax.numpy as jnp
import numpy as np

from zeronotesamba_tpu.models.baseline import BockTCN, TCN_DILATIONS


def test_bock_tcn_shapes_and_logits():
    model = BockTCN()
    x = jnp.zeros((2, 96, 64, 1))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    probs = model.apply(params, x)
    logits = model.apply(params, x, method="logits")
    emb = model.apply(params, x, method="embed")
    assert probs.shape == (2, 64)
    assert logits.shape == (2, 64)
    assert emb.shape[:2] == (2, 64)
    np.testing.assert_allclose(np.asarray(jax.nn.sigmoid(logits)), np.asarray(probs), atol=1e-6)
    assert np.all(np.isfinite(np.asarray(probs)))


def test_bock_tcn_receptive_field_covers_beat_periods():
    # kernel 5 dilated blocks: RF = 1 + sum(4 * d) frames; must exceed one
    # 55 bpm beat period (68 frames at 62.5 fps) so the TCN can see a full
    # inter-beat interval.
    rf = 1 + sum(4 * d for d in TCN_DILATIONS)
    assert rf > 68


def test_bock_status_trains_one_step():
    from zeronotesamba_tpu.data.datasets import SongRecord
    from zeronotesamba_tpu.train.supervised import SupervisedConfig, init_state, train_step, eval_step

    t = 128
    cfg = SupervisedConfig(status="bock", lr=1e-3, bucket_frames=t)
    rec = SongRecord(
        name="x", vqt=np.zeros((1, 96, t), np.float32), pulse=np.zeros(t, np.float32),
        down_pulse=np.zeros(t, np.float32), beat_times=np.zeros(1), downbeat_times=np.zeros(0),
    )
    state = init_state(cfg, rec, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    vqt = jnp.asarray(rng.standard_normal((2, 1, 96, t)).astype(np.float32))
    pulse = jnp.asarray((rng.uniform(size=(2, t)) < 0.1).astype(np.float32))
    mask = jnp.ones((2, t), jnp.float32)
    loss0, _ = eval_step(state, vqt, pulse, mask, "bock")
    state, loss, out = train_step(state, vqt, pulse, mask, jax.random.PRNGKey(1), "bock")
    assert np.isfinite(float(loss))
    assert out.shape == (2, t)
    # a second step with the updated params still works (optimizer wired)
    state, loss2, _ = train_step(state, vqt, pulse, mask, jax.random.PRNGKey(2), "bock")
    assert np.isfinite(float(loss2))
