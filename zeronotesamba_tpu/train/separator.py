"""Training engine for the learned percussive/rest separator.

Replaces the capability the reference imports wholesale from Spleeter
(processing/source_separation.py:8-32) with a trainable TPU path: synthetic
stem mixtures (data/synthetic.percussive_pair — ground-truth stems are free)
are staged on device as waveforms, every train step crops random windows,
runs STFT + MaskNet + masked-magnitude L1 against the true stem magnitudes
entirely on device, and the evaluation metric is SI-SDR of the masked
waveforms vs the true stems (vs the HPSS baseline, ops/hpss.py).

The whole step is one XLA program: host traffic per step is a handful of
int32 crop offsets (the ~1 MB/s relay rule, CLAUDE.md).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from zeronotesamba_tpu.models.separator import HOP, N_BINS, N_FFT, MaskNet
from zeronotesamba_tpu.ops.hpss import _istft, _stft
from zeronotesamba_tpu.train.state import TrainState
from zeronotesamba_tpu.utils.logging import get_logger

log = get_logger("train.separator")

CROP_FRAMES = 256  # ~4.1 s at hop 256
CROP_LEN = (CROP_FRAMES - 1) * HOP


@dataclasses.dataclass
class SeparatorConfig:
    steps: int = 1500
    batch_size: int = 8
    lr: float = 3e-4
    seed: int = 0
    eval_every: int = 250
    checkpoint_path: Optional[str] = None


def _features(mix: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, L) waveform -> (complex spec (B, F, T), logmag input (B, 512, T, 1))."""
    spec = _stft(mix, N_FFT, HOP)
    logmag = jnp.log1p(jnp.abs(spec[:, :N_BINS, :]))
    return spec, logmag[..., None]


def apply_masks(spec: jnp.ndarray, masks: jnp.ndarray, length: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mask the mixture spec (mixture phase) and invert to waveforms.

    The Nyquist row rides the drum mask's top bin (negligible energy at 8 kHz
    for 16 kHz audio; keeping F=512 in the net is what makes it MXU-tileable).
    """
    full = jnp.concatenate([masks, masks[:, -1:, :, :]], axis=1)  # (B, F, T, 2)
    drums = _istft(spec * full[..., 0], N_FFT, HOP, length)
    rest = _istft(spec * full[..., 1], N_FFT, HOP, length)
    return drums, rest


def si_sdr(est: jnp.ndarray, ref: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Scale-invariant SDR in dB over the last axis (Le Roux et al. 2019)."""
    ref_energy = jnp.sum(ref * ref, axis=-1, keepdims=True)
    proj = jnp.sum(est * ref, axis=-1, keepdims=True) / (ref_energy + eps) * ref
    noise = est - proj
    ratio = jnp.sum(proj * proj, axis=-1) / (jnp.sum(noise * noise, axis=-1) + eps)
    return 10.0 * jnp.log10(ratio + eps)


def init_separator_state(cfg: SeparatorConfig, rng: jax.Array) -> TrainState:
    model = MaskNet()
    x = jnp.zeros((1, N_BINS, 32, 1))
    params = jax.jit(model.init)(rng, x)
    return TrainState.create(apply_fn=model.apply, params=params, tx=optax.adam(cfg.lr))


def _crop(bank: jnp.ndarray, song: jnp.ndarray, offs: jnp.ndarray) -> jnp.ndarray:
    """bank (N, S, L) -> (B, S, CROP_LEN) random windows, on device."""

    def one(si, oi):
        return jax.lax.dynamic_slice(bank, (si, 0, oi), (1, bank.shape[1], CROP_LEN))[0]

    return jax.vmap(one)(song, offs)


@jax.jit
def train_step(state: TrainState, bank: jnp.ndarray, song: jnp.ndarray, offs: jnp.ndarray):
    """bank rows are (mix, drums, rest) waveform triples."""
    crops = _crop(bank, song, offs)
    mix, drums_ref, rest_ref = crops[:, 0], crops[:, 1], crops[:, 2]
    spec, logmag = _features(mix)
    mag = jnp.abs(spec[:, :N_BINS, :])
    mag_d = jnp.abs(_stft(drums_ref, N_FFT, HOP)[:, :N_BINS, :])
    mag_r = jnp.abs(_stft(rest_ref, N_FFT, HOP)[:, :N_BINS, :])

    def loss_fn(params):
        masks = state.apply_fn(params, logmag)
        est_d = mag * masks[..., 0]
        est_r = mag * masks[..., 1]
        return jnp.mean(jnp.abs(est_d - mag_d)) + jnp.mean(jnp.abs(est_r - mag_r))

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    return state.apply_gradients(grads=grads), loss


@jax.jit
def eval_si_sdr(state: TrainState, mix: jnp.ndarray, drums_ref: jnp.ndarray, rest_ref: jnp.ndarray):
    """Mean SI-SDR (dB) of both masked stems on full-length signals."""
    spec, logmag = _features(mix)
    masks = state.apply_fn(state.params, logmag)
    drums, rest = apply_masks(spec, masks, mix.shape[-1])
    return jnp.mean(si_sdr(drums, drums_ref)), jnp.mean(si_sdr(rest, rest_ref))


# One module-level jitted apply: a per-call ``jax.jit(MaskNet().apply)``
# builds a fresh wrapper each time, re-tracing for every file in a track-dir
# sweep (ADVICE r3). MaskNet is stateless config, so one instance serves all.
_mask_apply = jax.jit(MaskNet().apply)


def separate_learned(signal: np.ndarray, params, batch_frames: int = 2048) -> Tuple[np.ndarray, np.ndarray]:
    """Full-length host API: mono waveform -> (drums, rest) via the mask net."""
    y = np.asarray(signal, dtype=np.float32)[None, :]
    spec, logmag = _features(jnp.asarray(y))
    masks = _mask_apply(params, logmag)
    drums, rest = apply_masks(spec, masks, y.shape[-1])
    return np.asarray(drums[0]), np.asarray(rest[0])


def synth_bank(n_songs: int, duration_s: float, seed: int, sr: int = 16000) -> np.ndarray:
    """(N, 3, L) rows of (mix, drums, rest) from the hardened synthetic preset.

    Difficulty knobs are drawn per song across the full demo range so the
    separator sees the same distribution the demo corpora are built from
    (experiments/demo_suite._build_corpus), minus stem bleed (targets must
    be the true stems).
    """
    from zeronotesamba_tpu.data.synthetic import percussive_pair

    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_songs):
        bpm = float(rng.uniform(60, 180))
        freq = float(np.exp(rng.uniform(np.log(550.0), np.log(2800.0))))
        rest, drums, _ = percussive_pair(
            duration_s, bpm, sr, seed=seed * 7919 + i, harmonics=5, click_freq=freq,
            jitter_s=float(rng.uniform(0.0, 0.025)), drift=float(rng.uniform(0.0, 0.06)),
            amp_sd=0.35, drop_p=0.12, offbeat=float(rng.uniform(0.0, 0.95)),
            harm_offbeat=0.35, noise=0.002,
        )
        mix = rest + drums
        rows.append(np.stack([mix, drums, rest]))
    return np.stack(rows).astype(np.float32)


def train_separator(
    cfg: SeparatorConfig,
    *,
    train_songs: int = 40,
    val_songs: int = 8,
    duration_s: float = 12.0,
) -> Tuple[dict, Dict[str, list]]:
    """Train on synthetic mixtures; returns (params, history with SI-SDR)."""
    bank = synth_bank(train_songs, duration_s, cfg.seed)
    val = synth_bank(val_songs, duration_s, cfg.seed + 999)
    bank_dev = jnp.asarray(bank)
    val_mix, val_drums, val_rest = (jnp.asarray(val[:, i]) for i in range(3))

    state = init_separator_state(cfg, jax.random.PRNGKey(cfg.seed))
    rng = np.random.default_rng(cfg.seed + 1)
    max_off = bank.shape[-1] - CROP_LEN
    hist: Dict[str, list] = {"loss": [], "si_sdr_drums": [], "si_sdr_rest": []}
    best = -np.inf
    best_params = state.params
    for it in range(cfg.steps):
        song = jnp.asarray(rng.integers(0, train_songs, size=cfg.batch_size, dtype=np.int32))
        offs = jnp.asarray(rng.integers(0, max_off + 1, size=cfg.batch_size, dtype=np.int32))
        state, loss = train_step(state, bank_dev, song, offs)
        if (it + 1) % cfg.eval_every == 0 or it == cfg.steps - 1:
            sd, sr_ = eval_si_sdr(state, val_mix, val_drums, val_rest)
            sd, sr_ = float(sd), float(sr_)
            hist["loss"].append(float(loss))
            hist["si_sdr_drums"].append(sd)
            hist["si_sdr_rest"].append(sr_)
            log.info("step %d: loss=%.4f si_sdr drums=%.2f dB rest=%.2f dB", it + 1, float(loss), sd, sr_)
            if sd + sr_ > best:
                best = sd + sr_
                best_params = jax.tree.map(lambda x: np.asarray(x), state.params)
    if cfg.checkpoint_path:
        from zeronotesamba_tpu.train.checkpoint import save_params

        save_params(cfg.checkpoint_path, best_params)
    return best_params, hist


def hpss_baseline_si_sdr(val: np.ndarray) -> Tuple[float, float]:
    """SI-SDR of the HPSS split on the same (mix, drums, rest) rows."""
    from zeronotesamba_tpu.ops.hpss import hpss

    mix = jnp.asarray(val[:, 0])
    h, p = hpss(mix)
    return (
        float(jnp.mean(si_sdr(p, jnp.asarray(val[:, 1])))),
        float(jnp.mean(si_sdr(h, jnp.asarray(val[:, 2])))),
    )
