"""Downstream supervised beat-tracking engine (device-resident, bucketed).

TPU-first redesign of the reference's per-song B=1 loop (epochs.py:8-187):

- songs are padded into length buckets and STAGED ON DEVICE ONCE as
  (N, S, 96, T) arrays — all subsequent epochs batch by device-side index
  gathers, so shuffling costs a few bytes of host->device traffic instead of
  re-uploading spectrograms (the HBM-residency rule; host links are slow);
- one jitted train step per bucket shape, masked logits-space BCE
  (losses/bce.py), batch sharded over the mesh's data axis when present;
- beat decoding + metric scoring (the reference runs madmom's DBN inside the
  train loop, epochs.py:83-91) happens on host from the batched outputs.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from zeronotesamba_tpu.data.datasets import SongRecord
from zeronotesamba_tpu.decode import decode as decode_beats_fn
from zeronotesamba_tpu.losses.bce import masked_bce_logits, masked_bce_twin_logits
from zeronotesamba_tpu.metrics.beat import evaluate_beats
from zeronotesamba_tpu.models.encoder import DSCNN, FusedDownstream
from zeronotesamba_tpu.train.state import TrainState, make_optimizer

FPS = 62.5
PAD_VALUE = float(np.log(1e-9))  # the log-VQT silence floor


@dataclasses.dataclass
class SupervisedConfig:
    status: str = "vanilla"  # vanilla | pretrained | clmr | bock
    pre: str = "finetune"  # finetune | frozen
    lr: float = 1e-5
    eval_method: str = "dbn"  # dbn | librosa | threshold
    batch_size: int = 8
    bucket_frames: int = 128  # pad T to multiples of this
    dropout_seed: int = 0
    pos_weight: float = 1.0  # positive-class BCE weight; 1.0 = reference
    # parity (plain BCELoss, loader.py:16), ~1/positive-rate removes the
    # all-zeros plateau attractor (losses/bce.py rationale)
    compute_dtype: str = "float32"  # float32 | bfloat16 — convs on the MXU in
    # this dtype, params/loss stay f32 (see PretextConfig.compute_dtype)
    rng_impl: str = "rbg"  # dropout key impl: rbg = TPU hardware RNG (the
    # ~10 per-step threefry dropout masks cost 42 ms of a 164 ms bf16 pretext
    # step — train/pretext.dropout_key docstring) | threefry = pre-r5 streams


def make_model(status: str, compute_dtype="float32"):
    from zeronotesamba_tpu.train.pretext import resolve_dtype

    dt = resolve_dtype(compute_dtype)
    if status == "pretrained":
        return FusedDownstream(compute_dtype=dt)
    if status == "bock":
        # Böck-style TCN comparison baseline (replaces the reference's madmom
        # RNNBeatProcessor mode, measures.py:270-277).
        from zeronotesamba_tpu.models.baseline import BockTCN

        return BockTCN(compute_dtype=dt)
    return DSCNN(compute_dtype=dt)


def init_state(cfg: SupervisedConfig, example: SongRecord, rng: jax.Array, params=None) -> TrainState:
    model = make_model(cfg.status, cfg.compute_dtype)
    t = _round_up(example.n_frames, cfg.bucket_frames)
    x = jnp.zeros((1, 96, t, 1))
    if params is None:
        init = jax.jit(model.init)  # eager init = one TPU program per op; jit it
        params = init(rng, x, x) if cfg.status == "pretrained" else init(rng, x)
    else:
        # Deep-copy: train_step donates the state, which would delete the
        # caller's buffers and break params reuse across folds/repeats.
        params = jax.tree.map(jnp.array, params)
    tx = make_optimizer(cfg.status, cfg.pre, cfg.lr)
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx)


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@dataclasses.dataclass
class Bucket:
    """Device-resident padded songs of one bucket length."""

    vqt: jnp.ndarray  # (N, S, 96, T)
    pulse: jnp.ndarray  # (N, T)
    mask: jnp.ndarray  # (N, T)
    names: List[str]
    n_frames: List[int]
    beat_times: List[np.ndarray]


class StagedDataset:
    """Bucketed song records staged on device once, indexed by song name.

    ``target="downbeat"`` supervises on the downbeat pulse instead (the
    reference builds both pulses, ballroom.py:198-221; beat is its default).
    """

    def __init__(self, records: Sequence[SongRecord], bucket_frames: int, target: str = "beat"):
        if target not in ("beat", "downbeat"):
            raise ValueError("target must be 'beat' or 'downbeat'")
        self.bucket_frames = bucket_frames
        self.target = target
        groups: Dict[int, List[SongRecord]] = {}
        for r in records:
            groups.setdefault(_round_up(r.n_frames, bucket_frames), []).append(r)
        self.buckets: Dict[int, Bucket] = {}
        self.location: Dict[str, Tuple[int, int]] = {}  # name -> (bucket_t, row)
        for t, recs in sorted(groups.items()):
            s = recs[0].vqt.shape[0]
            vqt = np.full((len(recs), s, 96, t), PAD_VALUE, dtype=np.float32)
            pulse = np.zeros((len(recs), t), dtype=np.float32)
            mask = np.zeros((len(recs), t), dtype=np.float32)
            for i, r in enumerate(recs):
                vqt[i, :, :, : r.n_frames] = r.vqt
                pulse[i, : r.n_frames] = r.pulse if target == "beat" else r.down_pulse
                mask[i, : r.n_frames] = 1.0
                self.location[r.name] = (t, i)
            times = [
                np.asarray(r.beat_times if target == "beat" else r.downbeat_times) for r in recs
            ]
            self.buckets[t] = Bucket(
                vqt=jnp.asarray(vqt),
                pulse=jnp.asarray(pulse),
                mask=jnp.asarray(mask),
                names=[r.name for r in recs],
                n_frames=[r.n_frames for r in recs],
                beat_times=times,
            )

    def plan(
        self,
        names: Sequence[str],
        batch_size: int,
        shuffle_rng: Optional[np.random.Generator] = None,
    ) -> List[Tuple[int, np.ndarray]]:
        """Batch plan over a subset of songs: list of (bucket_t, row indices)."""
        order = list(names)
        if shuffle_rng is not None:
            shuffle_rng.shuffle(order)
        per_bucket: Dict[int, List[int]] = {}
        for n in order:
            t, row = self.location[n]
            per_bucket.setdefault(t, []).append(row)
        plan = []
        for t, rows in sorted(per_bucket.items()):
            for i in range(0, len(rows), batch_size):
                plan.append((t, np.asarray(rows[i : i + batch_size], dtype=np.int32)))
        return plan


@partial(jax.jit, static_argnames=("status",), donate_argnums=(0,))
def train_step(state: TrainState, vqt, pulse, mask, dropout_rng, status: str, pos_weight=1.0):
    """Trains in logits space (losses/bce.py rationale); returns probability
    outputs for in-loop beat scoring like the reference (epochs.py:83-91).
    ``pos_weight`` is a traced scalar (no recompile across values)."""

    def loss_fn(params):
        if status == "pretrained":
            la, lb = state.apply_fn(
                params, vqt[:, 0, :, :, None], vqt[:, 1, :, :, None],
                train=True, rngs={"dropout": dropout_rng}, method="logits",
            )
            loss = masked_bce_twin_logits(la, lb, pulse, mask, reduction="max", pos_weight=pos_weight)
            out = jax.nn.sigmoid(jnp.maximum(la, lb))
        else:
            logits = state.apply_fn(
                params, vqt[:, 0, :, :, None], train=True, rngs={"dropout": dropout_rng}, method="logits"
            )
            loss = masked_bce_logits(logits, pulse, mask, pos_weight)
            out = jax.nn.sigmoid(logits)
        return loss, out

    (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    return state.apply_gradients(grads=grads), loss, out


@partial(jax.jit, static_argnames=("status",))
def eval_step(state: TrainState, vqt, pulse, mask, status: str, pos_weight=1.0):
    if status == "pretrained":
        la, lb = state.apply_fn(state.params, vqt[:, 0, :, :, None], vqt[:, 1, :, :, None], method="logits")
        loss = masked_bce_twin_logits(la, lb, pulse, mask, reduction="max", pos_weight=pos_weight)
        out = jax.nn.sigmoid(jnp.maximum(la, lb))
    else:
        logits = state.apply_fn(state.params, vqt[:, 0, :, :, None], method="logits")
        loss = masked_bce_logits(logits, pulse, mask, pos_weight)
        out = jax.nn.sigmoid(logits)
    return loss, out


@partial(jax.jit, donate_argnums=())
def _gather(arr: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(arr, idx, axis=0)


def run_epoch(
    state: TrainState,
    staged: StagedDataset,
    plan: List[Tuple[int, np.ndarray]],
    cfg: SupervisedConfig,
    *,
    train: bool,
    epoch: int = 0,
    score: bool = True,
) -> Tuple[TrainState, float, np.ndarray]:
    """One pass over a batch plan. Returns (state, mean loss, metric vec (6,))."""
    losses = []
    all_scores: List[Tuple[float, ...]] = []
    if train:
        from zeronotesamba_tpu.train.pretext import dropout_key

        base_key = dropout_key(cfg.dropout_seed, cfg.rng_impl)
    for i, (t, rows) in enumerate(plan):
        bucket = staged.buckets[t]
        idx = jnp.asarray(rows)
        vqt = _gather(bucket.vqt, idx)
        pulse = _gather(bucket.pulse, idx)
        mask = _gather(bucket.mask, idx)
        if train:
            rng = jax.random.fold_in(base_key, epoch * 100003 + i)
            state, loss, out = train_step(state, vqt, pulse, mask, rng, cfg.status, cfg.pos_weight)
        else:
            loss, out = eval_step(state, vqt, pulse, mask, cfg.status, cfg.pos_weight)
        losses.append(float(loss))
        if score:
            out_np = np.asarray(out)
            for b, row in enumerate(rows):
                act = out_np[b, : bucket.n_frames[row]]
                est = decode_beats_fn(act, cfg.eval_method, fps=FPS)
                all_scores.append(evaluate_beats(bucket.beat_times[row], est))
    metrics = np.mean(np.asarray(all_scores), axis=0) if all_scores else np.zeros(6)
    return state, float(np.mean(losses)) if losses else 0.0, metrics


