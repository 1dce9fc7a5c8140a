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
from functools import lru_cache, partial
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
    steps_per_call: int = 1  # >1 = dispatch K optimizer steps as ONE executed
    # scan program (make_multistep_train_step): amortizes the ~34 ms fixed
    # relay round-trip to 34/K ms per step. Numerically identical to K
    # sequential train_step calls (tests/test_train.py multistep parity);
    # only full-batch chunks within one bucket are scanned — ragged tails
    # fall back to the single step.
    scan_unroll: bool = False  # unroll the steps_per_call scan (CPU tests:
    # XLA:CPU runs convs in a rolled while-loop ~50x slower; numerics equal)
    freq_s2d: Tuple[int, ...] = ()  # conv indices via the exact frequency
    # space-to-depth fold (models/encoder.fold_conv_freq2); see PretextConfig


def make_model(status: str, compute_dtype="float32", freq_s2d: Tuple[int, ...] = ()):
    from zeronotesamba_tpu.train.pretext import resolve_dtype

    dt = resolve_dtype(compute_dtype)
    if status == "pretrained":
        return FusedDownstream(compute_dtype=dt, freq_s2d=tuple(freq_s2d))
    if status == "bock":
        # Böck-style TCN comparison baseline (replaces the reference's madmom
        # RNNBeatProcessor mode, measures.py:270-277).
        from zeronotesamba_tpu.models.baseline import BockTCN

        return BockTCN(compute_dtype=dt)
    return DSCNN(compute_dtype=dt, freq_s2d=tuple(freq_s2d))


def init_state(cfg: SupervisedConfig, example: SongRecord, rng: jax.Array, params=None) -> TrainState:
    model = make_model(cfg.status, cfg.compute_dtype, getattr(cfg, "freq_s2d", ()))
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


def _loss_and_out(apply_fn, params, vqt, pulse, mask, dropout_rng, status: str, pos_weight):
    """Masked logits-space BCE + probability outputs — the one loss used by
    train_step, eval_step (rng=None), and the multi-step scan body."""
    kwargs = {"method": "logits"}
    if dropout_rng is not None:
        kwargs.update(train=True, rngs={"dropout": dropout_rng})
    if status == "pretrained":
        la, lb = apply_fn(params, vqt[:, 0, :, :, None], vqt[:, 1, :, :, None], **kwargs)
        loss = masked_bce_twin_logits(la, lb, pulse, mask, reduction="max", pos_weight=pos_weight)
        out = jax.nn.sigmoid(jnp.maximum(la, lb))
    else:
        logits = apply_fn(params, vqt[:, 0, :, :, None], **kwargs)
        loss = masked_bce_logits(logits, pulse, mask, pos_weight)
        out = jax.nn.sigmoid(logits)
    return loss, out


@partial(jax.jit, static_argnames=("status",), donate_argnums=(0,))
def train_step(state: TrainState, vqt, pulse, mask, dropout_rng, status: str, pos_weight=1.0):
    """Trains in logits space (losses/bce.py rationale); returns probability
    outputs for in-loop beat scoring like the reference (epochs.py:83-91).
    ``pos_weight`` is a traced scalar (no recompile across values)."""

    def loss_fn(params):
        return _loss_and_out(state.apply_fn, params, vqt, pulse, mask, dropout_rng, status, pos_weight)

    (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    return state.apply_gradients(grads=grads), loss, out


@lru_cache(maxsize=None)
def make_multistep_train_step(status: str, scan_unroll=False):
    """K supervised optimizer steps as ONE executed program (lax.scan).

    The supervised analogue of train/pretext.make_staged_train_step's
    steps_per_call: the tunneled TPU runtime charges ~34 ms of fixed
    round-trip per execution (results/profile_train_step.json) — at the
    reference bucket shape (B=8, T=768) that is the entire gap between the
    gross bf16 train MFU (0.52) and the on-chip MFU net of overhead (0.68).
    Step k of the scan gathers rows ``idx[k]`` from the device-resident
    bucket arrays (the same jnp.take the per-step path uses) and consumes
    dropout key ``keys[k]``, so the scan is numerically identical to K
    sequential ``train_step`` calls on those gathers with those keys
    (tests/test_train.py::test_supervised_multistep_scan_matches_sequential).
    The reference has no analogue — its loop is one host-driven B=1 step per
    song (epochs.py:45-79). ``scan_unroll`` only changes the loop lowering
    (CPU tests unroll; see SupervisedConfig.scan_unroll), never the math.
    Cached by (status, scan_unroll) so run_epoch reuses one traced program.
    """

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, vqt_bank, pulse_bank, mask_bank, idx, keys, pos_weight=1.0):
        # idx: (K, B) int32 rows into the staged bucket; keys: (K,) dropout keys
        def body(st, xs):
            rows, key = xs
            vqt = jnp.take(vqt_bank, rows, axis=0)
            pulse = jnp.take(pulse_bank, rows, axis=0)
            mask = jnp.take(mask_bank, rows, axis=0)

            def loss_fn(params):
                return _loss_and_out(st.apply_fn, params, vqt, pulse, mask, key, status, pos_weight)

            (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(st.params)
            return st.apply_gradients(grads=grads), (loss, out)

        state, (losses, outs) = jax.lax.scan(body, state, (idx, keys), unroll=scan_unroll)
        return state, losses, outs

    return step


@partial(jax.jit, static_argnames=("status",))
def eval_step(state: TrainState, vqt, pulse, mask, status: str, pos_weight=1.0):
    return _loss_and_out(state.apply_fn, state.params, vqt, pulse, mask, None, status, pos_weight)


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
    k_call = max(1, int(getattr(cfg, "steps_per_call", 1))) if train else 1
    if train:
        from zeronotesamba_tpu.train.pretext import dropout_key

        base_key = dropout_key(cfg.dropout_seed, cfg.rng_impl)

    def score_batch(out_np: np.ndarray, rows: np.ndarray, bucket: Bucket) -> None:
        for b, row in enumerate(rows):
            act = out_np[b, : bucket.n_frames[row]]
            est = decode_beats_fn(act, cfg.eval_method, fps=FPS)
            all_scores.append(evaluate_beats(bucket.beat_times[row], est))

    i = 0
    while i < len(plan):
        t, rows = plan[i]
        bucket = staged.buckets[t]
        if k_call > 1:
            # Multi-step dispatch: scan exactly k_call consecutive full-size
            # batches from the SAME bucket as one executed program (exact-K
            # only, so at most two programs compile: the K-scan + the single
            # step for ragged tails / bucket boundaries). Keys use the
            # ORIGINAL plan index, so numerics match the per-step path.
            group = []
            while (i + len(group) < len(plan) and len(group) < k_call
                   and plan[i + len(group)][0] == t
                   and len(plan[i + len(group)][1]) == cfg.batch_size):
                group.append(plan[i + len(group)][1])
            if len(group) == k_call:
                idx = jnp.asarray(np.stack(group))
                offs = epoch * 100003 + i + jnp.arange(k_call)
                keys = jax.vmap(lambda o: jax.random.fold_in(base_key, o))(offs)
                mstep = make_multistep_train_step(cfg.status, cfg.scan_unroll)
                state, losses_k, outs = mstep(
                    state, bucket.vqt, bucket.pulse, bucket.mask, idx, keys, cfg.pos_weight)
                losses.extend(float(x) for x in np.asarray(losses_k))
                if score:
                    outs_np = np.asarray(outs)
                    for s, rws in enumerate(group):
                        score_batch(outs_np[s], rws, bucket)
                i += k_call
                continue
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
            score_batch(np.asarray(out), rows, bucket)
        i += 1
    metrics = np.mean(np.asarray(all_scores), axis=0) if all_scores else np.zeros(6)
    return state, float(np.mean(losses)) if losses else 0.0, metrics


