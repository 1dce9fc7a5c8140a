"""Mixed-precision training parity (VERDICT r3 next #3).

The bf16 path runs the conv stacks in bfloat16 on the MXU while params,
optimizer state, and both losses stay float32 (models/encoder.py casts the
trunk output back). These tests pin that flipping compute_dtype changes
numerics only at rounding scale — the loss TRAJECTORY over several update
steps must track the f32 run — so the bench's bf16 train rails measure the
same optimization process, just faster. Reference context: the reference
trains f32 end to end (pretext.py:175-592); bf16 training is a designed
improvement, not a parity feature.

bf16 rounding grows through 8 conv layers + a backward pass, so tolerances
are loose-but-meaningful: a broken cast (e.g. loss computed in bf16, or
params updated in bf16) shifts trajectories by >10x these bounds.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zeronotesamba_tpu.train.pretext import (
    PretextConfig,
    init_pretext_state,
    make_train_step,
    resolve_dtype,
)


def test_resolve_dtype():
    assert resolve_dtype("float32") == jnp.float32
    assert resolve_dtype("bfloat16") == jnp.bfloat16
    assert resolve_dtype(jnp.bfloat16) == jnp.bfloat16
    with pytest.raises(ValueError):
        resolve_dtype("fp8")


def _pretext_losses(dtype: str, n_steps: int = 4):
    cfg = PretextConfig(batch_size=4, crop_frames=32, dropout_rate=0.0,
                        lr=3e-4, compute_dtype=dtype)
    state = init_pretext_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg)
    rng = np.random.default_rng(1)
    losses = []
    for i in range(n_steps):
        batch = jnp.asarray(rng.standard_normal((4, 2, 96, 32)).astype(np.float32))
        state, loss, _, _ = step(state, batch, jax.random.PRNGKey(10 + i))
        losses.append(float(loss))
    return np.asarray(losses), state


def test_pretext_bf16_trajectory_matches_f32():
    l32, s32 = _pretext_losses("float32")
    l16, s16 = _pretext_losses("bfloat16")
    # Loss trajectories agree step by step within bf16 accumulation noise.
    np.testing.assert_allclose(l16, l32, rtol=0.05, atol=0.02)
    # And the runs actually trained (loss moved), so the comparison is live.
    assert abs(l32[-1] - l32[0]) > 1e-5
    # Trained params track too (same init; updates differ only by rounding).
    diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), s32.params, s16.params)
    assert max(jax.tree.leaves(diffs)) < 5e-2


def test_pretext_bf16_params_stay_f32():
    cfg = PretextConfig(batch_size=4, crop_frames=32, dropout_rate=0.0,
                        lr=3e-4, compute_dtype="bfloat16")
    state = init_pretext_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg)
    batch = jnp.zeros((4, 2, 96, 32))
    state, _, _, _ = step(state, batch, jax.random.PRNGKey(1))
    dtypes = {a.dtype for a in jax.tree.leaves(state.params)}
    assert dtypes == {jnp.dtype(jnp.float32)}


def _supervised_losses(dtype: str, n_steps: int = 4):
    from zeronotesamba_tpu.data.datasets import SongRecord
    from zeronotesamba_tpu.train.supervised import SupervisedConfig, init_state, train_step

    t = 64
    cfg = SupervisedConfig(status="vanilla", lr=1e-3, bucket_frames=t, compute_dtype=dtype)
    example = SongRecord(
        name="x", vqt=np.zeros((1, 96, t), np.float32),
        pulse=np.zeros(t, np.float32), down_pulse=np.zeros(t, np.float32),
        beat_times=np.zeros(1), downbeat_times=np.zeros(0),
    )
    state = init_state(cfg, example, jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    pulse = jnp.asarray((rng.random((2, t)) < 0.1).astype(np.float32))
    mask = jnp.ones((2, t))
    losses = []
    for i in range(n_steps):
        vqt = jnp.asarray(rng.standard_normal((2, 1, 96, t)).astype(np.float32))
        state, loss, _ = train_step(state, vqt, pulse, mask, jax.random.PRNGKey(20 + i), "vanilla")
        losses.append(float(loss))
    return np.asarray(losses)


def test_supervised_bf16_trajectory_matches_f32():
    l32 = _supervised_losses("float32")
    l16 = _supervised_losses("bfloat16")
    np.testing.assert_allclose(l16, l32, rtol=0.05, atol=0.02)
    assert abs(l32[-1] - l32[0]) > 1e-5
