"""Training engines: supervised bucketed BCE, pretext contrastive, checkpointing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zeronotesamba_tpu.data.datasets import build_synthetic
from zeronotesamba_tpu.parallel.mesh import make_mesh
from zeronotesamba_tpu.train.pretext import (
    PretextConfig,
    batches_from_bank,
    crop_shifts,
    init_pretext_state,
    make_eval_step,
    make_train_step,
)
from zeronotesamba_tpu.train.state import downstream_learning_rate
from zeronotesamba_tpu.train.supervised import (
    StagedDataset,
    SupervisedConfig,
    init_state,
    run_epoch,
)


@pytest.fixture(scope="module")
def tiny_ds():
    return build_synthetic(n_songs=4, duration_s=6.0, seed=3)


def test_lr_rules_match_reference():
    assert downstream_learning_rate("pretrained", "finetune", 1e-5) == pytest.approx(0.5 * 1e-5 * 10e-2)
    assert downstream_learning_rate("pretrained", "frozen", 1e-5) == 1e-5
    assert downstream_learning_rate("clmr", "finetune", 1e-5) == pytest.approx(0.5e-5)
    assert downstream_learning_rate("vanilla", "finetune", 1e-5) == 1e-5


def test_staged_dataset_padding_and_masking(tiny_ds):
    staged = StagedDataset(tiny_ds.records, bucket_frames=64)
    plan = staged.plan(tiny_ds.names, batch_size=2)
    assert sum(len(rows) for _, rows in plan) == 4
    t, rows = plan[0]
    bucket = staged.buckets[t]
    assert bucket.vqt.shape[-1] % 64 == 0
    nf = bucket.n_frames[rows[0]]
    mask = np.asarray(bucket.mask)[rows[0]]
    pulse = np.asarray(bucket.pulse)[rows[0]]
    assert mask[:nf].all() and not mask[nf:].any()
    assert pulse[nf:].sum() == 0


def test_supervised_train_step_decreases_loss(tiny_ds):
    cfg = SupervisedConfig(status="vanilla", lr=2e-4, batch_size=2, bucket_frames=64)
    state = init_state(cfg, tiny_ds[0], jax.random.PRNGKey(0))
    staged = StagedDataset(tiny_ds.records, 64)
    plan = staged.plan(tiny_ds.names, 2)
    losses = []
    for e in range(4):
        state, loss, _ = run_epoch(state, staged, plan, cfg, train=True, epoch=e, score=False)
        losses.append(loss)
    assert min(losses[-2:]) < losses[0], losses


def test_dropout_rng_impl_knob(tiny_ds):
    """rbg (TPU hardware RNG, the default — 42 ms/step cheaper than threefry
    on v5e) and threefry (pre-r5 parity streams) both train; the streams are
    genuinely different; dropout_key returns typed keys of the right impl."""
    from zeronotesamba_tpu.train.pretext import dropout_key

    assert "rbg" in str(dropout_key(0).dtype)
    assert "fry" in str(dropout_key(0, "threefry").dtype)
    staged = StagedDataset(tiny_ds.records, 64)
    plan = staged.plan(tiny_ds.names, 2)
    losses = {}
    for impl in ("rbg", "threefry"):
        cfg = SupervisedConfig(status="vanilla", lr=2e-4, batch_size=2, bucket_frames=64, rng_impl=impl)
        state = init_state(cfg, tiny_ds[0], jax.random.PRNGKey(0))
        state, loss, _ = run_epoch(state, staged, plan, cfg, train=True, epoch=0, score=False)
        assert np.isfinite(loss)
        losses[impl] = loss
    # same init, same data, different dropout streams -> different losses
    assert losses["rbg"] != losses["threefry"]


def test_supervised_pretrained_two_stream(tiny_ds):
    cfg = SupervisedConfig(status="pretrained", lr=1e-4, batch_size=2, bucket_frames=64)
    state = init_state(cfg, tiny_ds[0], jax.random.PRNGKey(1))
    staged = StagedDataset(tiny_ds.records, 64)
    plan = staged.plan(tiny_ds.names, 2)
    state, loss, metrics = run_epoch(state, staged, plan, cfg, train=True, epoch=0, score=True)
    assert np.isfinite(loss)
    assert metrics.shape == (6,)


def test_frozen_trunk_params_unchanged(tiny_ds):
    cfg = SupervisedConfig(status="pretrained", pre="frozen", lr=1e-3, batch_size=2, bucket_frames=64)
    state = init_state(cfg, tiny_ds[0], jax.random.PRNGKey(2))
    before = jax.tree.map(lambda x: x.copy(), state.params)
    staged = StagedDataset(tiny_ds.records, 64)
    plan = staged.plan(tiny_ds.names, 2)
    state, _, _ = run_epoch(state, staged, plan, cfg, train=True, epoch=0, score=False)

    def trunk_leaves(p):
        return p["params"]["pretext"]["anchor"]["encoder"]["conv1"]["kernel"]

    np.testing.assert_array_equal(np.asarray(trunk_leaves(state.params)), np.asarray(trunk_leaves(before)))
    # Head must have moved.
    h0 = np.asarray(before["params"]["pretext"]["anchor"]["head"]["proj"]["kernel"])
    h1 = np.asarray(state.params["params"]["pretext"]["anchor"]["head"]["proj"]["kernel"])
    assert not np.allclose(h0, h1)


def test_crop_shifts_shapes(rng):
    item = rng.standard_normal((2, 96, 626)).astype(np.float32)
    g = np.random.default_rng(0)
    crops = crop_shifts(item, 16, 313, g)
    assert crops.shape == (16, 2, 96, 313)


def test_pretext_step_runs_and_improves():
    cfg = PretextConfig(batch_size=8, crop_frames=64)
    state = init_pretext_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg)
    evalstep = make_eval_step(cfg)
    g = np.random.default_rng(0)
    # One synthetic "track": correlated anchor/positive with beat structure.
    base = g.standard_normal((2, 96, 256)).astype(np.float32)
    bank = np.stack([base + 0.1 * g.standard_normal(base.shape).astype(np.float32) for _ in range(4)])

    batch = next(batches_from_bank(bank, cfg, g))
    loss0, pc0, nc0 = evalstep(state, jnp.asarray(batch))
    rng = jax.random.PRNGKey(1)
    for i, batch in enumerate(batches_from_bank(np.tile(bank, (2, 1, 1, 1)), cfg, g)):
        state, loss, pc, nc = step(state, jnp.asarray(batch), jax.random.fold_in(rng, i))
    assert np.isfinite(float(loss))


def test_pretext_sharded_step_matches_unsharded():
    # dropout off: mask draws depend on the (local vs global) shard shape,
    # so exact sharded-vs-unsharded equality only holds without dropout.
    cfg = PretextConfig(batch_size=8, crop_frames=64, dropout_rate=0.0)
    state = init_pretext_state(cfg, jax.random.PRNGKey(0))
    g = np.random.default_rng(1)
    bank = g.standard_normal((1, 2, 96, 128)).astype(np.float32)
    batch = jnp.asarray(crop_shifts(bank[0], 8, 64, g))
    rng = jax.random.PRNGKey(7)

    step_local = make_train_step(cfg)
    mesh = make_mesh(data=8, time=1)
    step_sharded = make_train_step(cfg, mesh=mesh)

    s1, loss1, pc1, nc1 = step_local(state, batch, rng)
    s2, loss2, pc2, nc2 = step_sharded(state, batch, rng)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(float(pc1), float(pc2), rtol=1e-4, atol=1e-5)
    # Parameters after one step must agree (same grads up to f32 collectives).
    l1 = np.asarray(jax.tree.leaves(s1.params)[0])
    l2 = np.asarray(jax.tree.leaves(s2.params)[0])
    np.testing.assert_allclose(l1, l2, atol=5e-6)


def test_pretext_staged_step_matches_host_crops():
    """Device-side dynamic-slice cropping == host crop_shifts batches."""
    from zeronotesamba_tpu.train.pretext import make_staged_train_step

    cfg = PretextConfig(batch_size=4, crop_frames=64, dropout_rate=0.0)
    state = init_pretext_state(cfg, jax.random.PRNGKey(0))
    g = np.random.default_rng(2)
    bank = g.standard_normal((3, 2, 96, 128)).astype(np.float32)
    starts = np.array([0, 17, 33, 64], dtype=np.int32)
    track = 1
    batch = np.stack([bank[track][:, :, s : s + 64] for s in starts])
    rng = jax.random.PRNGKey(5)

    host_step = make_train_step(cfg)
    staged_step = make_staged_train_step(cfg)
    s1, loss1, pc1, nc1 = host_step(state, jnp.asarray(batch), rng)
    s2, loss2, pc2, nc2 = staged_step(state, jnp.asarray(bank), jnp.int32(track), jnp.asarray(starts), rng)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    l1 = np.asarray(jax.tree.leaves(s1.params)[0])
    l2 = np.asarray(jax.tree.leaves(s2.params)[0])
    np.testing.assert_allclose(l1, l2, atol=1e-6)


def test_pretext_multistep_scan_matches_sequential():
    """steps_per_call=S (one dispatched scan program) == S sequential
    single-step calls with dropout keys fold_in(rng, s) — the multi-step
    dispatch only amortizes the relay round-trip, never changes numerics.
    unroll=True because XLA:CPU executes convs inside a rolled while-loop
    ~50x slower (make_staged_train_step scan_unroll note); unroll only
    changes the loop lowering, not the math."""
    from zeronotesamba_tpu.train.pretext import make_staged_train_step

    cfg = PretextConfig(batch_size=2, crop_frames=32, dropout_rate=0.1)
    state = init_pretext_state(cfg, jax.random.PRNGKey(0))
    g = np.random.default_rng(4)
    bank = jnp.asarray(g.standard_normal((3, 2, 96, 64)).astype(np.float32))
    tracks = jnp.asarray(np.array([2, 0, 1], np.int32))
    starts = jnp.asarray(g.integers(0, 32, size=(3, 2)).astype(np.int32))
    rng = jax.random.key(9)

    multi = make_staged_train_step(cfg, steps_per_call=3, scan_unroll=True)
    s_multi, losses, pcs, ncs = multi(state, bank, tracks, starts, rng)
    assert losses.shape == (3,) and pcs.shape == (3,)

    single = make_staged_train_step(cfg)
    st, seq = state, []
    for s in range(3):
        st, loss, _, _ = single(st, bank, tracks[s], starts[s], jax.random.fold_in(rng, s))
        seq.append(float(loss))
    np.testing.assert_allclose(np.asarray(losses), np.asarray(seq), rtol=1e-5)
    l1 = np.asarray(jax.tree.leaves(s_multi.params)[0])
    l2 = np.asarray(jax.tree.leaves(st.params)[0])
    np.testing.assert_allclose(l1, l2, atol=1e-6)


def test_supervised_multistep_scan_matches_sequential(tiny_ds):
    """SupervisedConfig.steps_per_call=K (one dispatched scan program per K
    full batches, train/supervised.make_multistep_train_step) == the per-step
    path on the same plan: identical losses, metrics, and final params. The
    scan only amortizes the relay round-trip — keys come from the original
    plan index, so the two paths draw the same dropout masks. unroll=True for
    the CPU backend (SupervisedConfig.scan_unroll note)."""
    staged = StagedDataset(tiny_ds.records, 64)
    plan = staged.plan(tiny_ds.names, 2)
    assert len(plan) == 2 and all(len(rows) == 2 for _, rows in plan)

    results = {}
    for k in (1, 2):
        cfg = SupervisedConfig(status="vanilla", lr=2e-4, batch_size=2, bucket_frames=64,
                               steps_per_call=k, scan_unroll=True)
        state = init_state(cfg, tiny_ds[0], jax.random.PRNGKey(0))
        losses = []
        for e in range(2):
            state, loss, metrics = run_epoch(state, staged, plan, cfg, train=True, epoch=e, score=(e == 1))
            losses.append(loss)
        results[k] = (losses, metrics, np.asarray(jax.tree.leaves(state.params)[0]))

    np.testing.assert_allclose(results[2][0], results[1][0], rtol=1e-5)
    np.testing.assert_allclose(results[2][1], results[1][1], rtol=1e-6)
    np.testing.assert_allclose(results[2][2], results[1][2], atol=1e-6)


def test_supervised_multistep_ragged_tail(tiny_ds):
    """A plan whose tail batch is smaller than batch_size still trains with
    steps_per_call>1: the ragged tail falls back to the single step."""
    staged = StagedDataset(tiny_ds.records, 64)
    plan = staged.plan(tiny_ds.names[:3], 2)  # one full batch + one ragged
    assert sorted(len(rows) for _, rows in plan) == [1, 2]
    cfg = SupervisedConfig(status="vanilla", lr=2e-4, batch_size=2, bucket_frames=64,
                           steps_per_call=2, scan_unroll=True)
    state = init_state(cfg, tiny_ds[0], jax.random.PRNGKey(0))
    state, loss, _ = run_epoch(state, staged, plan, cfg, train=True, epoch=0, score=False)
    assert np.isfinite(loss)


def test_checkpoint_roundtrip(tmp_path, tiny_ds):
    from zeronotesamba_tpu.train.checkpoint import CheckpointManager, load_params, save_params

    cfg = SupervisedConfig(status="vanilla", lr=1e-4, batch_size=2, bucket_frames=64)
    state = init_state(cfg, tiny_ds[0], jax.random.PRNGKey(0))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(0, state)
    restored = mgr.restore(state)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(state.params)[0]), np.asarray(jax.tree.leaves(restored.params)[0])
    )
    mgr.close()

    save_params(str(tmp_path / "best"), state.params)
    params2 = load_params(str(tmp_path / "best"), state.params)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(state.params)[0]), np.asarray(jax.tree.leaves(params2)[0])
    )


def test_bce_pos_weight_semantics():
    """pos_weight=1 is exact logits-space BCE; w>1 is torch BCEWithLogitsLoss
    pos_weight semantics (hand-computed single-frame cases)."""
    from zeronotesamba_tpu.losses.bce import masked_bce, masked_bce_logits, masked_bce_twin_logits

    rng = np.random.default_rng(7)
    l = jnp.asarray(rng.standard_normal((2, 16)) * 3)
    t = jnp.asarray((rng.uniform(size=(2, 16)) < 0.2).astype(np.float32))
    m = jnp.asarray((rng.uniform(size=(2, 16)) < 0.9).astype(np.float32))
    np.testing.assert_allclose(
        float(masked_bce_logits(l, t, m, 1.0)), float(masked_bce(jax.nn.sigmoid(l), t, m)), rtol=1e-5
    )
    # l=0, t=1: loss = w * log 2 exactly.
    w = 8.0
    got = float(masked_bce_logits(jnp.zeros((1, 1)), jnp.ones((1, 1)), None, w))
    np.testing.assert_allclose(got, w * np.log(2.0), rtol=1e-6)
    # twin max fusion with pos_weight == logits BCE of the elementwise max.
    lb = l - 0.5
    np.testing.assert_allclose(
        float(masked_bce_twin_logits(l, lb, t, m, pos_weight=w)),
        float(masked_bce_logits(jnp.maximum(l, lb), t, m, w)),
        rtol=1e-6,
    )


def test_supervised_pos_weight_trains(tiny_ds):
    """run_epoch with pos_weight>1 still decreases the (weighted) loss."""
    cfg = SupervisedConfig(status="vanilla", lr=1e-3, batch_size=2, pos_weight=8.0)
    staged = StagedDataset(tiny_ds.records, cfg.bucket_frames)
    state = init_state(cfg, tiny_ds[0], jax.random.PRNGKey(0))
    plan = staged.plan(tiny_ds.names, cfg.batch_size)
    state, loss0, _ = run_epoch(state, staged, plan, cfg, train=True, epoch=0, score=False)
    for e in range(1, 4):
        state, loss, _ = run_epoch(state, staged, plan, cfg, train=True, epoch=e, score=False)
    assert np.isfinite(loss) and loss < loss0


def test_pretext_multi_track_accumulation_matches_mean_of_singles():
    """(k,) track_idx = mean loss/grad of the k single-track steps."""
    from zeronotesamba_tpu.train.pretext import make_staged_train_step

    cfg = PretextConfig(batch_size=4, crop_frames=64, dropout_rate=0.0)
    state = init_pretext_state(cfg, jax.random.PRNGKey(0))
    g = np.random.default_rng(3)
    bank = g.standard_normal((3, 2, 96, 128)).astype(np.float32)
    bank_dev = jnp.asarray(bank)
    tracks = np.array([0, 2], dtype=np.int32)
    starts = np.stack([np.array([0, 5, 11, 21], np.int32), np.array([3, 9, 40, 64], np.int32)])
    rng = jax.random.PRNGKey(7)

    step = make_staged_train_step(cfg)
    _, loss_acc, pc_acc, nc_acc = step(state, bank_dev, jnp.asarray(tracks), jnp.asarray(starts), rng)

    # Mean of the two single-track losses on the SAME params (dropout off,
    # so the per-track rng split is the only nondeterminism and unused).
    singles = []
    for t, st in zip(tracks, starts):
        _, loss1, pc1, nc1 = step(state, bank_dev, jnp.int32(t), jnp.asarray(st), rng)
        singles.append((float(loss1), float(pc1), float(nc1)))
    np.testing.assert_allclose(float(loss_acc), np.mean([s[0] for s in singles]), rtol=1e-5)
    np.testing.assert_allclose(float(pc_acc), np.mean([s[1] for s in singles]), rtol=1e-5)
    np.testing.assert_allclose(float(nc_acc), np.mean([s[2] for s in singles]), rtol=1e-5)
