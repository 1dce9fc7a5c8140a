"""Self-supervised pretext experiment driver (pretext.py train_model equivalent).

Orchestrates bank building and contrastive training with the reference's
schedule shape (pretext.py:175-450): per epoch the train bank is shuffled and
consumed in chunks, each track yielding one batch of ``batch_size`` random
crops; validation shifts are FIXED at epoch 0 (pretext.py:284-292); the
best-validation params are checkpointed.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional

import jax
import numpy as np

from zeronotesamba_tpu.train.checkpoint import save_params
from zeronotesamba_tpu.train.pretext import (
    PretextConfig,
    crop_shifts,
    dropout_key,
    init_pretext_state,
    make_eval_step,
    make_staged_train_step,
    sample_shifts,
)
from zeronotesamba_tpu.utils.logging import get_logger

log = get_logger("experiments.pretext")


@dataclasses.dataclass
class PretextRunConfig:
    task: str = "zerons"
    num_epochs: int = 250
    batch_size: int = 16
    crop_frames: int = 313
    temperature: float = 0.25
    lr: float = None  # None = reference rules (train/state.pretext_optimizer)
    compute_dtype: str = "float32"  # float32 | bfloat16 mixed-precision convs
    # (train/pretext.PretextConfig.compute_dtype)
    tracks_per_step: int = 1  # >1 = accumulate k per-track NT-Xent batches
    # into one update (same per-track loss semantics; sqrt(k) less gradient
    # noise — the demo-scale plateau-escape lever, see make_staged_train_step)
    steps_per_call: int = 1  # >1 = dispatch S optimizer steps as ONE executed
    # program (lax.scan — amortizes the ~34 ms relay round-trip to 34/S ms;
    # make_staged_train_step steps_per_call). Numerically a different dropout/
    # shuffle stream than S single dispatches of the same updates only through
    # key handling, so committed artifacts keep the default 1; single-device
    # only (forced to 1 under a mesh).
    scan_unroll: bool = False  # unroll the steps_per_call scan (CPU-test/
    # debug knob: XLA:CPU runs convs inside a rolled while-loop ~50x slower;
    # TPU keeps the rolled loop)
    freq_s2d: tuple = ()  # conv indices computed via the exact frequency
    # space-to-depth fold (models/encoder.fold_conv_freq2) — (1,) folds
    # conv2; params and numerics unchanged, on-device schedule only
    seed: int = 0
    checkpoint_path: Optional[str] = None  # best-val params (reference
    # models/shift_pret_cnn_16.pth equivalent)
    # Checkpoint SELECTION (VERDICT r3 next #4). The reference selects on
    # NT-Xent validation loss (pretext.py:408-412), but on the demo corpora
    # zero-shot beat F1 is NON-MONOTONE in val loss (60 ep -> F1 0.73;
    # 150 ep -> better val loss but F1 0.35 — the pulse decays into shortcut
    # features). "proxy_f1" is the designed improvement: select on zero-shot
    # beat F1 over a small labeled proxy set, evaluated every
    # ``proxy_every`` epochs. Both candidates are checkpointed when
    # checkpoint_path is set (selected -> checkpoint_path, the other ->
    # checkpoint_path + "_valsel"/"_proxysel") so selections can be compared
    # from one training run (tools/run_selection_compare.py).
    selection: str = "val_loss"  # val_loss (reference parity) | proxy_f1
    proxy_dataset: Optional[object] = None  # BeatDataset; required for
    # proxy_f1 and optional (monitoring-only) under val_loss
    proxy_every: int = 5
    proxy_eval_method: str = "dbn"
    resume_dir: Optional[str] = None  # full-TrainState checkpoints: training
    # resumes mid-run with optimizer state (the reference can only save,
    # never resume — SURVEY §5)
    figures_path: Optional[str] = None  # loss/similarity PDFs every
    # figures_every epochs (reference pretext.py:418-448)
    figures_every: int = 5
    trace_dir: Optional[str] = None  # jax.profiler trace of the first epoch
    rng_impl: str = "rbg"  # dropout key impl: rbg = TPU hardware RNG (42 ms
    # faster per step, train/pretext.dropout_key) | threefry = pre-r5 streams
    # Plateau watchdog (README limit (d)). Demo-scale NT-Xent starts pinned
    # at the ln(batch_size) constant-embedding attractor and escape is a
    # stochastic threshold event: measured traces of escaping and
    # never-escaping runs are indistinguishable until the escape itself
    # (val = ln B, pos = neg = 0.999 in both through epoch ~40; seed 0
    # escapes at ~45-54 epochs on the 48-song bank, seed 1 never does —
    # results/synthetic/summary_seed1.json). The only robust detector is a
    # deadline: if val loss has not dropped below ln(batch_size) -
    # plateau_margin within plateau_deadline epochs of an attempt, reinit
    # params/optimizer/shuffle streams with seed + 1000*attempt and retry
    # (up to plateau_restarts extra attempts; the last attempt always runs
    # the full num_epochs). 0 disables (reference parity — the reference has
    # no such guard). Worst-case cost: restarts*deadline + num_epochs epochs.
    plateau_deadline: int = 0
    plateau_margin: float = 0.05
    plateau_restarts: int = 2


def build_bank_from_stem_root(
    stem_root: str,
    n_samples: int,
    *,
    clip_len_s: float = 10.0,
    sample_rate: int = 16000,
    lower_p: float = 0.3,
    upper_p: float = 1.0,
    seed: int = 0,
    mode: str = "vqt",
) -> np.ndarray:
    """Mine (N, 2, 96, T) VQT pairs from a new_data/-style stem directory
    (reference create_memory_bank, pretext.py:89-172)."""
    import random

    from zeronotesamba_tpu.data.separation import load_stem_dir
    from zeronotesamba_tpu.data.stems import fold_stems, mine_pair
    from zeronotesamba_tpu.ops.vqt import generate_xqt

    rng = random.Random(seed)
    track_ids = sorted(os.listdir(stem_root))
    rng.shuffle(track_ids)
    bank: List[np.ndarray] = []
    for tid in track_ids:
        if len(bank) >= n_samples:
            break
        tdir = os.path.join(stem_root, tid)
        try:
            stems = load_stem_dir(tdir, target_sr=sample_rate)
            anchor, positive = fold_stems(stems)
            if len(anchor) < clip_len_s * sample_rate + 2:
                continue  # reference deletes <10 s tracks (pretext.py:120-124)
            a, p = mine_pair(anchor, positive, clip_len_s=clip_len_s, sample_rate=sample_rate,
                             lower_p=lower_p, upper_p=upper_p, rng=rng)
            bank.append(np.stack([generate_xqt(a, sample_rate, mode), generate_xqt(p, sample_rate, mode)]))
        except (FileNotFoundError, ValueError) as e:
            log.warning("skipping %s: %s", tid, e)
    return np.stack(bank).astype(np.float32)


def zero_shot_proxy_f1(ds, pretext_params, *, batch_size: int = 8, eval_method: str = "dbn") -> float:
    """Zero-shot beat F1 of a (twin) pretext checkpoint over a labeled set —
    the beat-proxy selection metric (experiments/beat.py pre='validation'
    semantics, same as the demo grid's zero-shot arm)."""
    from zeronotesamba_tpu.experiments.beat import BeatExperimentConfig, run_beat_experiment

    fused = {"params": {"pretext": pretext_params["params"]}}
    res = run_beat_experiment(
        ds,
        BeatExperimentConfig(status="pretrained", pre="validation",
                             eval_method=eval_method, batch_size=batch_size),
        init_params=fused, progress=False,
    )
    return float(res[0].test_metrics[0])


def fixed_val_shifts(val_bank: np.ndarray, cfg: PretextConfig, seed: int) -> np.ndarray:
    """Pre-crop validation batches once (reference pretext.py:284-292)."""
    rng = np.random.default_rng(seed)
    return np.stack([crop_shifts(item, cfg.batch_size, cfg.crop_frames, rng) for item in val_bank])


def train_pretext(
    train_bank: np.ndarray,
    val_bank: np.ndarray,
    cfg: PretextRunConfig,
    *,
    mesh=None,
) -> "tuple":
    """Train; returns (best_params, history dict)."""
    import jax.numpy as jnp

    if cfg.selection not in ("val_loss", "proxy_f1"):
        raise ValueError(f"unknown selection {cfg.selection!r} (val_loss|proxy_f1)")
    if cfg.selection == "proxy_f1" and cfg.proxy_dataset is None:
        raise ValueError("selection='proxy_f1' requires proxy_dataset")
    if cfg.selection == "proxy_f1" and cfg.task != "zerons":
        raise ValueError("proxy_f1 selection needs the twin 'zerons' pretext")

    pcfg = PretextConfig(
        task=cfg.task, batch_size=cfg.batch_size, crop_frames=cfg.crop_frames,
        temperature=cfg.temperature, lr=cfg.lr, compute_dtype=cfg.compute_dtype,
        freq_s2d=tuple(cfg.freq_s2d),
    )
    state = init_pretext_state(pcfg, jax.random.PRNGKey(cfg.seed))
    s_call = max(1, int(cfg.steps_per_call)) if mesh is None else 1
    step = make_staged_train_step(pcfg, mesh=mesh, steps_per_call=s_call,
                                  scan_unroll=cfg.scan_unroll)
    eval_step = make_eval_step(pcfg)
    rng = np.random.default_rng(cfg.seed)
    # Stage both banks on device once; training batches are (track, shifts)
    # scalars and on-device slices (see make_staged_train_step). With a mesh
    # the bank is SHARDED over the data axis — each device holds N/d tracks
    # (tail-padded with duplicates so N divides evenly; those tracks are
    # oversampled by one shard's worth per epoch, the standard dp remainder
    # policy), which is what lets reference-scale banks (~13.8 GB f32,
    # pretext.py:255-263) fit a 16 GB-per-chip mesh at ~1.7 GB/device.
    n_shard = 1
    shard_size = len(train_bank)
    if mesh is None:
        bank_dev = jnp.asarray(train_bank)
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_shard = int(mesh.shape["data"])
        pad = (-len(train_bank)) % n_shard
        if pad:
            # Tile modularly rather than train_bank[:pad] — a bank smaller
            # than half the data axis needs pad > len(bank) rows (ADVICE r3).
            reps = np.take(train_bank, np.arange(pad) % len(train_bank), axis=0)
            padded = np.concatenate([train_bank, reps])
        else:
            padded = train_bank
        shard_size = len(padded) // n_shard
        bank_dev = jax.device_put(padded, NamedSharding(mesh, P("data")))
    val_batches = [jnp.asarray(vb) for vb in fixed_val_shifts(val_bank, pcfg, cfg.seed)]
    bank_frames = train_bank.shape[-1]

    best_val = np.inf
    best_params = state.params
    best_proxy = -np.inf
    best_proxy_params = state.params
    hist = {"train_loss": [], "val_loss": [], "train_pos": [], "train_neg": [], "val_pos": [], "val_neg": []}
    if cfg.proxy_dataset is not None:
        hist["proxy_epoch"], hist["proxy_f1"] = [], []
    key = dropout_key(cfg.seed + 1, cfg.rng_impl)
    start_epoch = 0
    mgr = None
    if cfg.resume_dir:
        from zeronotesamba_tpu.train.checkpoint import CheckpointManager

        mgr = CheckpointManager(cfg.resume_dir)
        latest = mgr.latest_step()
        if latest is not None:
            state = mgr.restore(state, latest)
            start_epoch = latest + 1
            log.info("resumed from epoch %d", latest)
    from zeronotesamba_tpu.utils.profiling import trace

    k = max(1, int(cfg.tracks_per_step))

    def epoch_updates() -> list:
        """Per-epoch track order as a list of per-update index arrays.

        Single device: global shuffle, scalar (k=1) or (k,) vector updates.
        Mesh: each device shuffles ITS local shard; one update = k local
        indices per device, laid out (d*k,) so shard_map's P('data') split
        hands device i rows [i*k, (i+1)*k) — track-parallel dp, every track
        seen once per epoch with no cross-device track motion.
        """
        if mesh is None:
            order = rng.permutation(len(train_bank))
            if k == 1:
                return list(order)
            pad = (-len(order)) % k
            if pad:
                order = np.concatenate([order, rng.choice(len(train_bank), size=pad)])
            return list(order.reshape(-1, k))
        perms = []
        padk = (-shard_size) % k
        for _ in range(n_shard):
            p_i = rng.permutation(shard_size)
            if padk:
                p_i = np.concatenate([p_i, rng.choice(shard_size, size=padk)])
            perms.append(p_i.reshape(-1, k))
        return list(np.stack(perms, axis=1).reshape(-1, n_shard * k))

    hist["restarts"] = []  # global-epoch indices where a watchdog reinit fired
    pinned_ln = float(np.log(cfg.batch_size))
    attempts = 1 + (int(cfg.plateau_restarts) if cfg.plateau_deadline else 0)
    for attempt in range(attempts):
        if attempt:
            log.warning(
                "plateau watchdog: val pinned near ln(B)=%.4f after %d epochs; "
                "reinitializing with seed %d (attempt %d/%d)",
                pinned_ln, cfg.plateau_deadline, cfg.seed + 1000 * attempt,
                attempt + 1, attempts)
            state = init_pretext_state(pcfg, jax.random.PRNGKey(cfg.seed + 1000 * attempt))
            rng = np.random.default_rng(cfg.seed + 1000 * attempt)
            key = dropout_key(cfg.seed + 1 + 1000 * attempt, cfg.rng_impl)
            hist["restarts"].append(len(hist["val_loss"]))
        a_start = start_epoch if attempt == 0 else 0
        escaped = False
        for epoch in range(a_start, cfg.num_epochs):
            tr_losses, tr_pos, tr_neg = [], [], []

            def starts_for(i):
                if np.ndim(i) > 0:
                    return np.stack([
                        sample_shifts(bank_frames, pcfg.batch_size, pcfg.crop_frames, rng) for _ in i
                    ])
                return sample_shifts(bank_frames, pcfg.batch_size, pcfg.crop_frames, rng)

            with trace(cfg.trace_dir if epoch == a_start and attempt == 0 else None):
                updates = epoch_updates()
                if s_call > 1:
                    # Multi-step dispatch: chunk the epoch's updates into
                    # scan programs of S steps; the remainder chunk is padded
                    # by resampling (same policy as the k-pad above).
                    pad = (-len(updates)) % s_call
                    for _ in range(pad):
                        updates.append(rng.choice(len(train_bank), size=(k,)) if k > 1
                                       else rng.integers(len(train_bank)))
                    for c in range(0, len(updates), s_call):
                        chunk = updates[c : c + s_call]
                        idx = jnp.asarray(np.asarray(chunk, np.int32))  # (S,) | (S,k)
                        starts = np.stack([starts_for(i) for i in chunk])
                        key, sub = jax.random.split(key)
                        state, losses, pcs, ncs = step(state, bank_dev, idx, jnp.asarray(starts), sub)
                        tr_losses.extend(np.asarray(losses, np.float64).tolist())
                        tr_pos.extend(np.asarray(pcs, np.float64).tolist())
                        tr_neg.extend(np.asarray(ncs, np.float64).tolist())
                else:
                    for i in updates:
                        starts = starts_for(i)
                        idx = jnp.asarray(np.asarray(i, np.int32)) if np.ndim(i) > 0 else jnp.int32(i)
                        key, sub = jax.random.split(key)
                        state, loss, pc, nc = step(state, bank_dev, idx, jnp.asarray(starts), sub)
                        tr_losses.append(float(loss)); tr_pos.append(float(pc)); tr_neg.append(float(nc))
            va_losses, va_pos, va_neg = [], [], []
            for vb in val_batches:
                loss, pc, nc = eval_step(state, vb)
                va_losses.append(float(loss)); va_pos.append(float(pc)); va_neg.append(float(nc))
            tr, va = float(np.mean(tr_losses)), float(np.mean(va_losses))
            hist["train_loss"].append(tr); hist["val_loss"].append(va)
            hist["train_pos"].append(float(np.mean(tr_pos))); hist["train_neg"].append(float(np.mean(tr_neg)))
            hist["val_pos"].append(float(np.mean(va_pos))); hist["val_neg"].append(float(np.mean(va_neg)))
            log.info("epoch %d: train=%.4f val=%.4f pos=%.3f neg=%.3f", epoch, tr, va,
                     hist["val_pos"][-1], hist["val_neg"][-1])
            if va < pinned_ln - cfg.plateau_margin:
                escaped = True
            if va < best_val:
                best_val = va
                best_params = jax.tree.map(lambda x: x.copy(), state.params)
                if cfg.checkpoint_path:
                    path = cfg.checkpoint_path if cfg.selection == "val_loss" else cfg.checkpoint_path + "_valsel"
                    save_params(path, best_params)
            if cfg.proxy_dataset is not None and (
                (epoch + 1) % cfg.proxy_every == 0 or epoch == cfg.num_epochs - 1
            ):
                pf1 = zero_shot_proxy_f1(cfg.proxy_dataset, state.params,
                                         eval_method=cfg.proxy_eval_method)
                hist["proxy_epoch"].append(epoch)
                hist["proxy_f1"].append(pf1)
                log.info("epoch %d: proxy zero-shot F1=%.3f (best %.3f)", epoch, pf1, max(best_proxy, pf1))
                if pf1 > best_proxy:
                    best_proxy = pf1
                    best_proxy_params = jax.tree.map(lambda x: x.copy(), state.params)
                    if cfg.checkpoint_path:
                        path = cfg.checkpoint_path if cfg.selection == "proxy_f1" else cfg.checkpoint_path + "_proxysel"
                        save_params(path, best_proxy_params)
            if mgr is not None:
                mgr.save(epoch, state, metrics={"val_loss": va})
            if cfg.figures_path and (epoch + 1) % cfg.figures_every == 0:
                from zeronotesamba_tpu.utils.plotting import plot_history

                plot_history(hist, cfg.figures_path)
            if (cfg.plateau_deadline and not escaped and attempt < attempts - 1
                    and epoch - a_start + 1 >= cfg.plateau_deadline):
                break
        if escaped or attempt == attempts - 1:
            break
    if mgr is not None:
        mgr.close()
    if cfg.selection == "proxy_f1":
        return best_proxy_params, hist
    return best_params, hist
